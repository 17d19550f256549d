"""IR retrieval-quality evaluation over the on-disk index.

The reference exposes search but never *measures* it; any team running
a fulltext engine (or ranking training data for an LLM retriever)
needs an evaluation harness: given queries and relevance judgments
(qrels), report where the relevant documents land in the ranking.
This module supplies that harness with DETERMINISTIC pseudo-qrels so
the whole evaluation sits under the driver's value hash: a document is
*relevant* to a query iff it contains EVERY query term (the classic
conjunctive-match pseudo-judgment; the same rule as the AND gate,
boolquery.score_terms_conjunctive).  Metrics are integer-exact —
no MAP/NDCG floats to flake the hash:

* ``n_relevant``      — qrel set size,
* ``first_rel_rank``  — rank of the first relevant document in the
  full OR-of-terms BM25 ranking (-1 when the qrel set is empty),
* ``hits_at_10/100``  — relevant documents inside the top 10 / 100.

Ranks use the suite-wide convention (6-dp-rounded score desc, doc_id
asc over EVERY matching doc), so ties resolve identically in the
engine and the DuckDB oracle, which recomputes tokenization, BM25 and
the qrel rule end-to-end from raw text.

Scale shape: the index side touches only the queried terms' posting
blocks (bucket + row-group pruned reads); per query the driver holds
one (ids, scores) pair of the matching-doc postings union — O(df) for
the fixed evaluation query set, never corpus-sized.  A million-query
eval would instead ship the qrels as a broadcast table and evaluate
inside ``map_batches`` over a query-partitioned dataset; the per-query
kernel below is exactly that task body.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["ir_eval", "ir_eval_sql", "IR_QUERIES", "IR_HITS_KS"]

# Mix of head terms (many matches, conjunction common) and a narrow
# conjunction so first_rel_rank/hits spread across the range.
IR_QUERIES = ("data processing pipeline", "stream window merge",
              "query performance", "fast scan merge", "information")
IR_HITS_KS = (10, 100)


def _eval_one(idx, q: str) -> tuple[int, int, int, int]:
    """(n_relevant, first_rel_rank, hits@10, hits@100) for one query —
    the per-task kernel of the at-scale shape described above."""
    from .boolquery import score_terms_conjunctive

    terms = idx.analyze(q)
    uniq = sorted(set(terms))
    idx._load_terms(uniq)
    ids, sc = idx._score(uniq)
    if ids.size == 0:
        return 0, -1, 0, 0
    sc = np.round(sc, 6)
    order = np.lexsort((ids.astype(np.int64), -sc))
    ranked = ids[order]
    rel_ids, _ = score_terms_conjunctive(idx, terms)
    if rel_ids.size == 0:
        return 0, -1, 0, 0
    pos = np.nonzero(np.isin(ranked, rel_ids, assume_unique=True))[0] + 1
    k10, k100 = IR_HITS_KS
    return (int(rel_ids.size), int(pos[0]),
            int((pos <= k10).sum()), int((pos <= k100).sum()))


def ir_eval(sf_dir: str) -> pa.Table:
    """Evaluate the fixed query set against the cached simple index."""
    from .expand import simple_index_cached
    from .query import BM25Index

    idx = BM25Index(simple_index_cached(sf_dir))
    rows = [(q, *_eval_one(idx, q)) for q in sorted(IR_QUERIES)]
    return pa.table({
        "query": pa.array([r[0] for r in rows], type=pa.string()),
        "n_relevant": pa.array([r[1] for r in rows], type=pa.int64()),
        "first_rel_rank": pa.array([r[2] for r in rows], type=pa.int64()),
        "hits_at_10": pa.array([r[3] for r in rows], type=pa.int64()),
        "hits_at_100": pa.array([r[4] for r in rows], type=pa.int64()),
    })


def ir_eval_sql(queries=IR_QUERIES, *, k1: float = 1.2,
                b: float = 0.75) -> str:
    """End-to-end oracle: the fulltext_simple_sql BM25 chain per query,
    a full ranking (row_number over ALL matching docs, rounded-score
    desc / doc_id asc), the conjunctive qrel rule as
    ``HAVING count(DISTINCT term) = n``, and the integer metrics."""
    from ..analysis.analyzer import analyze_simple
    from .oracles import _sq

    k10, k100 = IR_HITS_KS
    parts = [
        "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+')) AS term FROM documents),",
        "tok AS (SELECT * FROM toks WHERE term <> ''),",
        "dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),",
        "stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl)",
    ]
    selects = []
    for qi, q in enumerate(queries):
        terms = sorted(set(analyze_simple(q)))
        qvals = ", ".join(f"('{_sq(t)}')" for t in terms) or "('')"
        parts.append(f""",
        q{qi}(term) AS (VALUES {qvals}),
        tfs{qi} AS (
            SELECT t.doc_id, t.term, count(*) AS tf
            FROM tok t JOIN q{qi} USING (term) GROUP BY t.doc_id, t.term
        ),
        dfs{qi} AS (SELECT term, count(*) AS df FROM tfs{qi} GROUP BY term),
        sc{qi} AS (
            SELECT tfs{qi}.doc_id,
                   sum(ln(1 + (stats.n - dfs{qi}.df + 0.5) / (dfs{qi}.df + 0.5))
                       * tfs{qi}.tf / (tfs{qi}.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))
                   ) AS s
            FROM tfs{qi}
            CROSS JOIN stats
            JOIN dfs{qi} ON tfs{qi}.term = dfs{qi}.term
            JOIN dl ON tfs{qi}.doc_id = dl.doc_id
            GROUP BY tfs{qi}.doc_id
        ),
        rk{qi} AS (
            SELECT doc_id, row_number() OVER (
                ORDER BY round(s, 6) DESC, doc_id ASC) AS rank
            FROM sc{qi}
        ),
        rel{qi} AS (
            SELECT doc_id FROM tfs{qi}
            GROUP BY doc_id HAVING count(DISTINCT term) = {len(terms)}
        )""")
        selects.append(f"""
        SELECT '{_sq(q)}' AS query,
               (SELECT count(*) FROM rel{qi}) AS n_relevant,
               coalesce((SELECT min(rank) FROM rk{qi}
                         JOIN rel{qi} USING (doc_id)),
                        CAST(-1 AS BIGINT)) AS first_rel_rank,
               (SELECT count(*) FROM rk{qi} JOIN rel{qi} USING (doc_id)
                WHERE rank <= {k10}) AS hits_at_10,
               (SELECT count(*) FROM rk{qi} JOIN rel{qi} USING (doc_id)
                WHERE rank <= {k100}) AS hits_at_100""")
    return "".join(parts) + (" UNION ALL ".join(selects)
                             + " ORDER BY query")
