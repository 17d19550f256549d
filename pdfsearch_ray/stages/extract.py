"""HTML → text extraction stage (M2/M3 analog).

The reference's extractor is UniDoc's per-page text extraction wrapped in
a worker pool (internal/doclib/bleve_pdf.go:269-328, unidoc_glue.go:128-139).
The webtext analog: a deterministic, versioned HTML-to-text extractor run
as an actor-pool ``map_batches`` stage.  Per-row invariant (input_hint):
``extract(html) == text`` byte-identically per url — pinned by
EXTRACTOR_VERSION in the manifest and by tests against the fixture
corpus, whose generator (fixtures/gen.py) is the exact inverse.

Extraction rules (v1): text content of <title> and of each block-level
element (<p>, <div>, <li>, <h1>..<h6>, <br> boundaries), one per line,
joined with "\n"; entities unescaped; <script>/<style> dropped; empty
lines dropped except a fully-empty document stays "".
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

EXTRACTOR_VERSION = "html-lines-v1"

# HTMLParser's tagfind_tolerant name rule (stops at ws, '/', '>', NUL)
import re

_TAGNAME_RE = re.compile(r"[a-zA-Z][^\t\n\r\f />\x00]*")

_BLOCK_TAGS = {
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "title", "tr", "article", "section", "header", "footer", "blockquote",
    "pre",
}
_SKIP_TAGS = {"script", "style", "noscript"}


class _TextExtractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.lines: list[str] = []
        self._buf: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS or tag == "br":
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if not self._skip and data:
            self._buf.append(data)

    def _flush(self):
        if self._buf:
            line = "".join(self._buf)
            self._buf = []
            if line:
                self.lines.append(line)

    def text(self) -> str:
        self._flush()
        return "\n".join(self.lines)


def _extract_text_fast(s: str) -> str | None:
    """Single-pass scanner for the SIMPLE HTML subset (no comments /
    doctype / PIs / quoted attributes / CDATA / non-alpha tag starts).
    Returns None the moment the input leaves that subset — the caller
    falls back to the HTMLParser reference path, so the output is
    byte-identical to it by construction on the fast path and by
    delegation otherwise (property-tested in tests/test_extract_fast.py).
    ~4x less per-event Python than HTMLParser's regex state machine;
    extract is the worst-scaling stage at full node width."""
    from html import unescape

    lines: list[str] = []
    buf: list[str] = []
    skip = 0
    i = 0
    n = len(s)
    find = s.find
    while i < n:
        j = find("<", i)
        if j < 0:
            if not skip and i < n:
                chunk = s[i:]
                # unescape per DATA SEGMENT — HTMLParser's
                # convert_charrefs semantics (an entity never spans a
                # tag boundary, and a bare "&amp" before a tag resolves
                # within its own segment)
                buf.append(unescape(chunk) if "&" in chunk else chunk)
            break
        if j > i and not skip:
            chunk = s[i:j]
            buf.append(unescape(chunk) if "&" in chunk else chunk)
        k = find(">", j + 1)
        if k < 0:
            return None  # unterminated tag: let HTMLParser decide
        body = s[j + 1:k]
        if not body or "<" in body:
            return None
        c0 = body[0]
        if c0 == "/":
            m = _TAGNAME_RE.match(body, 1)
            if m is None:
                return None
            name = m.group().lower()
            closing = True
            startend = False
        else:
            m = _TAGNAME_RE.match(body)
            if m is None:
                return None  # comment/doctype/PI/stray '<'
            if '"' in body or "'" in body:
                return None  # quoted attrs may hide '>'
            if "/" in body[:-1]:
                return None  # mid-tag slash: HTMLParser may bail to data
            name = m.group().lower()
            closing = False
            # self-closing form <tag/> / <tag />: HTMLParser emits
            # startendtag = handle_starttag + handle_endtag.  For
            # _SKIP_TAGS that is a net-zero skip change; for block tags
            # the double flush is idempotent, so one flush below matches.
            startend = body.endswith("/")
            if name in ("script", "style"):
                # CDATA content elements: HTMLParser scans for the
                # matching close tag WITHOUT parsing interior '<'; out
                # of the simple subset
                return None
        if name in _SKIP_TAGS:
            if closing:
                skip = max(0, skip - 1)
            elif not startend:
                skip += 1
        elif (name in _BLOCK_TAGS or (name == "br" and not closing)):
            if buf:
                line = "".join(buf)
                buf = []
                if line:
                    lines.append(line)
        i = k + 1
    if buf:
        line = "".join(buf)
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_text(html_bytes: bytes, strict: bool = False) -> str:
    """Deterministic HTML→text.  Non-strict: errors yield "" and the row
    is skipped-and-counted (continueOnFailure, index_pdfs.go:108-113);
    strict: re-raise (ExposeErrors analog, index_search.go:190-194)."""
    try:
        s = html_bytes.decode("utf-8", errors="replace")
        out = _extract_text_fast(s)
        if out is not None:
            return out
        p = _TextExtractor()
        p.feed(s)
        p.close()
        return p.text()
    except Exception:
        if strict:
            raise
        return ""


class HtmlExtractor:
    """Actor-pool batch extractor: pages rows → EXTRACTED rows.

    doc_id assignment needs the caller to provide ``partition_id`` and
    ``row_offset`` columns (sources/pages_source.py does); doc_id =
    (partition_id << 32) | row — the "%04X.%d" docID generalization
    (bleve_pdf.go:57)."""

    def __init__(self, lang_allow: tuple[str, ...] | None = ("en",),
                 strict: bool = False):
        self.lang_allow = set(lang_allow) if lang_allow else None
        self.strict = strict
        # skip-and-count (continueOnFailure, index_pdfs.go:108-113):
        # cumulative per worker, and per-call in last_counts so the
        # partition marker/manifest can surface them (the reference
        # prints its skipped-file count; we persist ours)
        self.n_errors = 0
        self.last_counts: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import content_hash

        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.schema.names else [""] * len(urls)
        pids = batch["partition_id"].to_pylist()
        rows = batch["row_offset"].to_pylist()

        n_lang = n_empty = 0
        out = {"doc_id": [], "url": [], "hash": [], "text": [], "lang": []}
        for url, html, lang, pid, row in zip(urls, htmls, langs, pids, rows):
            if self.lang_allow is not None and lang not in self.lang_allow:
                n_lang += 1
                continue  # corpus filter (M12 CleanCorpus analog)
            text = extract_text(html, self.strict) if html else ""
            if not text:
                n_empty += 1
                self.n_errors += 1
                continue  # empty/error-page filter (bleve_pdf.go:309-312)
            out["doc_id"].append((pid << 32) | row)
            out["url"].append(url)
            out["hash"].append(content_hash(html))
            out["text"].append(text)
            out["lang"].append(lang)
        self.last_counts = {"lang_filtered": n_lang, "empty_or_error": n_empty}
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "url": pa.array(out["url"], type=pa.string()),
                "hash": pa.array(out["hash"], type=pa.string()),
                "text": pa.array(out["text"], type=pa.string()),
                "lang": pa.array(out["lang"], type=pa.string()),
            }
        )
