"""Query-results writer — the webtext replacement for the reference's
marked-up-PDF sink (S11, internal/doclib/modify_pdf.go:105-198): instead
of drawing rectangles on pages it writes {query, rank, doc_id, url,
score, spans, line info} rows, with the same defensive caps the
reference applies (≤100 pages, ≤100 rects/page — modify_pdf.go:65-96,
index_search.go:121-124) re-expressed as max_docs / max_spans_per_doc,
and the same one-entry-per-page dedup."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from .query import BM25Index, MatchSet

MAX_DOCS = 100            # cap analog of maxPages (modify_pdf.go:25-31)
MAX_SPANS_PER_DOC = 100   # cap analog of maxRects


def match_set_to_table(query: str, ms: MatchSet,
                       max_docs: int = MAX_DOCS,
                       max_spans_per_doc: int = MAX_SPANS_PER_DOC) -> pa.Table:
    rows = {"query": [], "rank": [], "doc_id": [], "url": [], "score": [],
            "spans": [], "line_nums": [], "lines": []}
    seen: set[int] = set()
    for rank, m in enumerate(ms.matches):
        if len(seen) >= max_docs:
            break
        if m.doc_id in seen:  # one entry per doc (sourceSet dedup analog)
            continue
        seen.add(m.doc_id)
        rows["query"].append(query)
        rows["rank"].append(rank)
        rows["doc_id"].append(m.doc_id)
        rows["url"].append(m.url)
        rows["score"].append(m.score)
        rows["spans"].append([
            {"start": s["start"], "end": s["end"], "score": s["score"]}
            for s in m.spans[:max_spans_per_doc]
        ])
        rows["line_nums"].append(m.line_nums[:max_spans_per_doc])
        rows["lines"].append(m.lines[:max_spans_per_doc])
    span_t = pa.list_(pa.struct([("start", pa.uint32()), ("end", pa.uint32()),
                                 ("score", pa.float64())]))
    return pa.table({
        "query": pa.array(rows["query"], type=pa.string()),
        "rank": pa.array(rows["rank"], type=pa.int32()),
        "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
        "url": pa.array(rows["url"], type=pa.string()),
        "score": pa.array(rows["score"], type=pa.float64()),
        "spans": pa.array(rows["spans"], type=span_t),
        "line_nums": pa.array(rows["line_nums"], type=pa.list_(pa.int32())),
        "lines": pa.array(rows["lines"], type=pa.list_(pa.string())),
    })


def run_query_set(
    index: BM25Index,
    queries: list[str],
    out_path: str | None = None,
    *,
    max_results: int = 10,
    apply_best: bool = True,
) -> pa.Table:
    """Run a query set; optionally persist results parquet (the artifact
    the reference copies into search.history/, index_search.go:196-221)."""
    tables = []
    for q in queries:
        ms = index.search(q, max_results=max_results, with_spans=True)
        if apply_best:
            ms = ms.best()
        tables.append(match_set_to_table(q, ms))
    out = pa.concat_tables(tables) if tables else match_set_to_table("", MatchSet())
    if out_path:
        pq.write_table(out, out_path)
    return out
