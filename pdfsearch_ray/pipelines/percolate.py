"""Percolator: match a STREAM of documents against a registry of
stored queries — the Elasticsearch percolate / Lucene Monitor (Luwak)
feature class, and the alerting primitive of a crawl pipeline ("tell
me when a page matching <query> arrives").

The reference searches documents with ad-hoc queries; the percolator
inverts that: queries are indexed once, documents stream through.
Semantics here: a stored query is a conjunctive (AND) bag of analyzed
terms; a document matches when its distinct-term set covers ALL the
query's terms (the matching core of ES percolation — its candidate
pre-filter plus verify collapse into one exact step for pure
conjunctions).

Scale shape — the part that matters at 10^12 docs/day:

* The query registry compiles to a tiny term→(query, required-count)
  inverted map, broadcast once via ``ray.put`` and read inside every
  ``map_batches`` task.  Documents NEVER shuffle; matching is one
  streaming pass (a pure map stage with output fan-out), so the
  operator composes with ingest (tail_append) at no extra exchange.
* The per-batch kernel is fully vectorized: ONE arrow regex split,
  ``pc.index_in`` against the registry vocabulary (tokens outside the
  stored vocabulary drop immediately — the batch never materializes a
  per-doc term set), np.unique over packed (row, term_id) codes for
  distinct-term semantics, then a bincount over packed (row, query)
  codes compared to each query's required count.
* Driver state is O(matches) (the gate collects pairs; a deployment
  writes them to a sink / notification bus instead).

The DuckDB oracle recomputes tokenization, the distinct-term sets and
the AND cover per stored query from raw text, so the broadcast map,
the vocabulary projection and the counting algebra are all under the
driver's value hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["percolate_matches", "percolate_sql", "PERC_QUERIES"]

# (query_id, stored query text) — analyzed with the simple analyzer at
# registration time, exactly like an indexed field would be.
PERC_QUERIES = (
    ("alert_data", "data"),                            # 1-term
    ("alert_window_merge", "window merge"),            # 2-term AND
    ("alert_customer_query", "customer query"),
    ("alert_stream_table_vector", "stream table vector"),  # 3-term AND
    ("alert_fast_scan_order", "fast scan order"),
    ("alert_never", "zzzunseenterm"),   # registered but never matched
)


def _registry():
    """Compile the stored queries: (vocab array, flattened term→query
    mapping arrays, per-query required counts, query ids).  Queries
    whose analyzed term set is empty are dropped (match nothing)."""
    from ..analysis.analyzer import analyze_simple

    qids, qterms = [], []
    for qid, text in sorted(PERC_QUERIES):
        terms = sorted(set(analyze_simple(text)))
        if terms:
            qids.append(qid)
            qterms.append(terms)
    vocab = sorted({t for ts in qterms for t in ts})
    tindex = {t: i for i, t in enumerate(vocab)}
    # mapping sorted by term_id: term_map[i] -> query_idx
    pairs = sorted((tindex[t], qi) for qi, ts in enumerate(qterms)
                   for t in ts)
    map_term = np.array([p[0] for p in pairs], dtype=np.int64)
    map_query = np.array([p[1] for p in pairs], dtype=np.int64)
    required = np.array([len(ts) for ts in qterms], dtype=np.int64)
    return vocab, map_term, map_query, required, qids


def percolate_matches(sf_dir: str) -> pa.Table:
    """Driver gate: (query_id, doc_id) pairs for every stored query a
    document satisfies, ordered (query_id, doc_id)."""
    import ray

    from ..functions.tables import read_parquet_nometa

    vocab, map_term, map_query, required, qids = _registry()
    nq = len(qids)
    ref = ray.put((pa.array(vocab, type=pa.string()),
                   map_term, map_query, required))

    def match(batch: pa.Table) -> pa.Table:
        vocab_arr, m_term, m_query, req = ray.get(ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), pattern="[^a-z0-9]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        parent = toks.value_parent_indices().to_numpy().astype(np.int64)
        tid = pc.index_in(flat, value_set=vocab_arr)
        hit = pc.is_valid(tid).to_numpy(zero_copy_only=False)
        # empty-string tokens can't be in the vocabulary, so `hit`
        # already excludes them
        rows, tids = parent[hit], tid.to_numpy(zero_copy_only=False)[hit].astype(np.int64)
        if not rows.size:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            })
        # distinct (row, term) pairs — AND semantics count each term once
        codes = np.unique(rows * len(vocab_arr) + tids)
        rows_u, tids_u = codes // len(vocab_arr), codes % len(vocab_arr)
        # expand term hits to (row, query) via the sorted term mapping
        lo = np.searchsorted(m_term, tids_u, side="left")
        hi = np.searchsorted(m_term, tids_u, side="right")
        reps = hi - lo
        rq_rows = np.repeat(rows_u, reps)
        # gather the mapping slice for every hit — vectorized
        # concat-of-ranges: arange(total) shifted per segment
        total = int(reps.sum())
        seg_starts = np.repeat(
            lo - np.concatenate(([0], np.cumsum(reps, dtype=np.int64)[:-1])),
            reps)
        idx = np.arange(total, dtype=np.int64) + seg_starts
        rq_query = m_query[idx]
        cnt = np.bincount(rq_rows * len(req) + rq_query,
                          minlength=int(batch.num_rows) * len(req))
        cnt = cnt.reshape(-1, len(req))
        row_idx, q_idx = np.nonzero(cnt == req[None, :])
        dids = batch["doc_id"].to_numpy()[row_idx]
        return pa.table({
            "query_id": pa.array(q_idx, type=pa.int64()),
            "doc_id": pa.array(dids.astype(np.int64), type=pa.int64()),
        })

    t = read_parquet_nometa(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(match, batch_format="pyarrow", batch_size=2048) \
        .to_pandas()
    from ..functions.tables import typed_pandas
    t = typed_pandas(t, {"query_id": "int64", "doc_id": "int64"})
    t = t.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    return pa.table({
        "query_id": pa.array([qids[i] for i in t["query_id"]],
                             type=pa.string()),
        "doc_id": pa.array(t["doc_id"].to_numpy(), type=pa.int64()),
    })


def percolate_sql(queries=PERC_QUERIES) -> str:
    """AND-cover oracle: distinct doc/term pairs from raw text, one
    HAVING-count select per registered query."""
    from ..analysis.analyzer import analyze_simple
    from .oracles import _sq

    parts = [
        "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+')) AS term FROM documents),",
        "tok AS (SELECT DISTINCT doc_id, term FROM toks "
        "WHERE term <> '')",
    ]
    selects = []
    for qid, text in sorted(queries):
        terms = sorted(set(analyze_simple(text)))
        if not terms:
            continue
        inlist = ", ".join(f"'{_sq(t)}'" for t in terms)
        selects.append(f"""
        SELECT '{_sq(qid)}' AS query_id, doc_id
        FROM tok WHERE term IN ({inlist})
        GROUP BY doc_id HAVING count(*) = {len(terms)}""")
    return "".join(parts) + (" UNION ALL ".join(selects)
                             + " ORDER BY query_id, doc_id")
