"""Evidence renderers — the webtext analog of the reference's marked-up
PDF output (S11, internal/doclib/modify_pdf.go:105-198).

The reference draws yellow rectangles over matched text on copies of the
source pages; for a text corpus the same artifact is the document text
with the matched spans HIGHLIGHTED in context.  Two targets:

* HTML (`render_html`) — one self-contained page per query: result
  header (rank, doc_id, url, score) + one snippet per span with the
  match wrapped in ``<mark>``; everything escaped.
* ANSI (`render_ansi`) — the same layout for terminals, highlights via
  SGR codes.

Both render from a ``MatchSet`` (span char offsets produced by the
positional phrase join, query.py:best_phrases) plus the doc texts,
fetched through the SAME row-group-pruned read the hit→doc join uses
(BM25Index.fetch_doc_meta) — top-k-sized, never a corpus scan.  The
reference's defensive caps (≤100 pages / ≤100 rects, modify_pdf.go:65-96)
carry over via results.MAX_DOCS / MAX_SPANS_PER_DOC.
"""

from __future__ import annotations

import html as _html

from .query import BM25Index, MatchSet
from .results import MAX_DOCS, MAX_SPANS_PER_DOC

CONTEXT_CHARS = 60  # snippet context on each side of a span

_ANSI_HL = "\x1b[1;33m"
_ANSI_DIM = "\x1b[2m"
_ANSI_BOLD = "\x1b[1m"
_ANSI_OFF = "\x1b[0m"

_HTML_HEAD = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title><style>
body {{ font-family: sans-serif; max-width: 60em; margin: 2em auto; }}
.result {{ border-top: 1px solid #ccc; padding: 0.8em 0; }}
.head {{ color: #444; }} .score {{ color: #791; }}
.snippet {{ margin: 0.3em 0 0.3em 1.5em; color: #222; }}
mark {{ background: #ffe26a; }}
.url {{ color: #36c; font-size: 90%; }}
</style></head><body>
<h2>{title}</h2>
"""


def _snippets(text: str, spans: list[dict],
              context: int = CONTEXT_CHARS,
              max_spans: int = MAX_SPANS_PER_DOC):
    """Yield (before, match, after) context windows for each span.
    Overlapping windows are merged into the previous snippet's span set
    by simply skipping spans already covered — deterministic and cheap."""
    covered_to = -1
    n = len(text)
    for s in spans[:max_spans]:
        a, b = int(s["start"]), int(s["end"])
        if a < 0 or b > n or b <= a:
            continue
        if a <= covered_to:  # inside the previous window: already shown
            continue
        lo = max(0, a - context)
        hi = min(n, b + context)
        covered_to = hi
        before = ("…" if lo > 0 else "") + text[lo:a]
        after = text[b:hi] + ("…" if hi < n else "")
        yield before.replace("\n", " "), text[a:b].replace("\n", " "), \
            after.replace("\n", " ")


def _doc_texts(index: BM25Index, ms: MatchSet) -> dict[int, str]:
    ids = [m.doc_id for m in ms.matches]
    if not ids:
        return {}
    dtbl, has_text = index.fetch_doc_meta(ids, with_text=True)
    if not has_text:
        return {}
    return dict(zip(dtbl["doc_id"].to_pylist(), dtbl["text"].to_pylist()))


def render_html(query: str, ms: MatchSet,
                texts: dict[int, str] | None = None,
                index: BM25Index | None = None,
                max_docs: int = MAX_DOCS) -> str:
    """MatchSet → self-contained HTML evidence page.  ``texts`` maps
    doc_id → text; pass ``index`` instead to fetch them (top-k read)."""
    if texts is None:
        texts = _doc_texts(index, ms) if index is not None else {}
    esc = _html.escape
    parts = [_HTML_HEAD.format(title=esc(f"results: {query}"))]
    parts.append(
        f"<p>{ms.total_matches if ms.total_matches >= 0 else '?'} total "
        f"matches, showing top {min(len(ms.matches), max_docs)}</p>")
    for rank, m in enumerate(ms.matches[:max_docs], 1):
        parts.append('<div class="result">')
        parts.append(
            f'<div class="head">#{rank} doc <b>{m.doc_id}</b> '
            f'<span class="url">{esc(m.url or "")}</span> '
            f'<span class="score">score {m.score:.4f}</span></div>')
        text = texts.get(m.doc_id, "")
        if text and m.spans:
            for before, match, after in _snippets(text, m.spans):
                parts.append(
                    f'<div class="snippet">{esc(before)}'
                    f"<mark>{esc(match)}</mark>{esc(after)}</div>")
        elif m.lines:  # no text stored: fall back to matched lines
            for ln_no, line in zip(m.line_nums, m.lines):
                parts.append(
                    f'<div class="snippet">line {ln_no}: {esc(line)}</div>')
        elif m.fragment:
            parts.append(f'<div class="snippet">{esc(m.fragment)}</div>')
        parts.append("</div>")
    parts.append("</body></html>\n")
    return "\n".join(parts)


def render_ansi(query: str, ms: MatchSet,
                texts: dict[int, str] | None = None,
                index: BM25Index | None = None,
                max_docs: int = MAX_DOCS, color: bool = True) -> str:
    """MatchSet → terminal evidence listing (ANSI highlights; pass
    color=False for plain text — useful in tests and logs)."""
    if texts is None:
        texts = _doc_texts(index, ms) if index is not None else {}
    hl, dim, bold, off = ((_ANSI_HL, _ANSI_DIM, _ANSI_BOLD, _ANSI_OFF)
                          if color else ("", "", "", ""))
    out = [f"{bold}results: {query}{off} "
           f"({ms.total_matches if ms.total_matches >= 0 else '?'} matches)"]
    for rank, m in enumerate(ms.matches[:max_docs], 1):
        out.append(f"{bold}#{rank}{off} doc {m.doc_id} "
                   f"{dim}{m.url or ''}{off} score {m.score:.4f}")
        text = texts.get(m.doc_id, "")
        if text and m.spans:
            for before, match, after in _snippets(text, m.spans):
                out.append(f"    {dim}{before}{off}{hl}{match}{off}"
                           f"{dim}{after}{off}")
        elif m.lines:
            for ln_no, line in zip(m.line_nums, m.lines):
                out.append(f"    {dim}line {ln_no}:{off} {line}")
        elif m.fragment:
            out.append(f"    {m.fragment}")
    return "\n".join(out) + "\n"


def render_query_html(index: BM25Index, query: str, out_path: str,
                      max_results: int = 10) -> str:
    """Search + render + write — the one-call analog of the reference's
    MarkupPdfResults flow (save marked-up artifact next to the index,
    index_search.go:196-221).  Returns the path written."""
    ms = index.search(query, max_results=max_results, with_spans=True)
    html_text = render_html(query, ms, index=index)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(html_text)
    return out_path
