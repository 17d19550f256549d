"""Result diversification: Maximal Marginal Relevance (Carbonell &
Goldstein, SIGIR 1998) over the embeddings table.

MMR is the standard greedy relevance/novelty re-ranker every vector
search stack ships (Vespa/Weaviate "diversity", LangChain retrievers):
from a depth-N dense candidate list, repeatedly pick

    argmax_d  λ·sim(q, d)  −  (1−λ)·max_{s ∈ S} sim(d, s)

(vec_id-ascending ties; the max over the empty selected set S is 0,
so round 1 reduces to λ·relevance).  All similarities quantize to
integer micro-units (round(sim·10⁶)) BEFORE the greedy recursion, and
with λ = 0.7 the marginal is the EXACT integer ``7·r_e6 − 3·m_e6``
(units of 10⁻⁷) — a float ``0.7·r − 0.3·m`` over 6-dp-rounded inputs
lands on exact half-boundaries at the 7th digit, where numpy
(half-even) and DuckDB (half-away) disagree, so the blend must stay
in integers for the argmax cascade to be bit-stable.

Scale shape: candidate generation is the distributed broadcast-matmul
dense pass (``hybrid._dense_lists``, the ann_cosine_topk kernel —
per-batch exact-sim cutoff with a tie buffer, O(N·blocks) to the
driver); the MMR recursion itself is inherently a tiny O(K·N) driver
kernel over the N=20 candidates — the part that scales is retrieval,
not the rerank, exactly as in production systems.

Oracle: the chained-CTE argmax replay (the bpe_merges precedent) —
DuckDB recomputes the dense candidate window, all pairwise candidate
cosines, and EVERY greedy round as pick1..pickK CTEs where pick i
anti-joins the union of picks 1..i−1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "mmr_diversify",
    "mmr_diversify_sql",
    "MMR_QVECS",
    "MMR_N",
    "MMR_K",
    "MMR_LAMBDA",
]

MMR_QVECS = (0, 1, 2)
MMR_N = 20       # dense candidate depth
MMR_K = 10       # diversified list length
MMR_LAMBDA = 0.7


def _pairwise_sims(sf_dir: str, cand_ids: list[int]) -> tuple:
    """(sorted ids, integer micro-cosine matrix round(sim·10⁶)) for the
    union candidate set — a pushdown-filtered read of O(queries·N)
    vectors."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", sorted(cand_ids))])
    if t.num_rows == 0:              # empty corpus: no candidates
        return np.array([], dtype=np.int64), np.zeros((0, 0), dtype=np.int64)
    order = np.argsort(t["vec_id"].to_numpy())
    ids = t["vec_id"].to_numpy()[order].astype(np.int64)
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"].to_pylist()])[order]
    # dot / (|a|·|b|), NOT normalize-then-dot: matches the oracle's
    # expression order so the micro-unit rounding cannot knife-edge
    nrm = np.linalg.norm(m, axis=1)
    e6 = np.round((m @ m.T) / np.outer(nrm, nrm) * 1e6)
    return ids, e6.astype(np.int64)


def mmr_diversify(sf_dir: str) -> pa.Table:
    """Driver gate: per query vector, the K-step greedy MMR selection
    over its depth-N dense candidate list, with the picked round's
    marginal score as ``mmr_score``."""
    from .hybrid import _dense_lists

    cands = _dense_lists(sf_dir, MMR_QVECS, MMR_N)
    union_ids = sorted({int(v) for ids, _ in cands.values() for v in ids}
                       | {int(q) for q in MMR_QVECS})
    pid, P = _pairwise_sims(sf_dir, union_ids)
    out_q, out_v, out_s, out_r = [], [], [], []
    for qid in sorted(cands):
        ids, _r_list = cands[qid]
        if ids.size == 0:
            continue
        # candidate rows/cols in the union pairwise matrix; relevance r
        # re-read from the SAME dot/(|a||b|) matrix the novelty term
        # uses, so every rounded quantity shares one expression shape
        # with the oracle
        loc = np.searchsorted(pid, ids)
        qrow = int(np.searchsorted(pid, int(qid)))
        r = P[qrow, loc]                      # int64 micro-cosines
        lam_n = int(round(MMR_LAMBDA * 10))   # 7 / 3 integer blend
        sel: list[int] = []
        taken = np.zeros(ids.size, dtype=bool)
        for rank in range(1, min(MMR_K, ids.size) + 1):
            if sel:
                mx = P[np.ix_(loc, [loc[j] for j in sel])].max(axis=1)
            else:
                mx = np.zeros(ids.size, dtype=np.int64)
            val = lam_n * r - (10 - lam_n) * mx   # exact, units 1e-7
            # bounded sentinel: -int64.min would overflow under the
            # lexsort negation below (real vals are within ±1e8)
            val[taken] = -(10 ** 15)
            pick = np.lexsort((ids, -val))[0]
            sel.append(int(pick))
            taken[pick] = True
            out_q.append(int(qid))
            out_v.append(int(ids[pick]))
            out_s.append(int(val[pick]))
            out_r.append(rank)
    return pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "vec_id": pa.array(out_v, type=pa.int64()),
        "mmr_score_e7": pa.array(out_s, type=pa.int64()),
        "rank": pa.array(out_r, type=pa.int64()),
    })


def mmr_diversify_sql(qvecs=MMR_QVECS, *, n: int = MMR_N, k: int = MMR_K,
                      lam: float = MMR_LAMBDA) -> str:
    """Chained-CTE oracle: dense candidate window, pairwise candidate
    cosines, and k greedy argmax rounds — each round anti-joins the
    union of all prior picks and takes ``row_number() = 1`` per query
    on the 6-dp marginal score (vec_id ties)."""
    qlist = ", ".join(str(int(q)) for q in sorted(qvecs))
    lam_n = int(round(lam * 10))
    one_minus_n = 10 - lam_n
    # every multiply-referenced CTE is MATERIALIZED: the pick chain
    # references each prior stage several times, and DuckDB's default
    # inlining would otherwise multiply the parquet scans exponentially
    parts = [f"""
    WITH ev AS MATERIALIZED (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    nrm AS MATERIALIZED (
        SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM ev GROUP BY vec_id),
    qs AS (SELECT * FROM ev WHERE vec_id IN ({qlist})),
    sims AS (
        SELECT qs.vec_id AS query_id, ev.vec_id, sum(qs.v * ev.v) AS dot
        FROM qs JOIN ev ON qs.i = ev.i AND ev.vec_id <> qs.vec_id
        GROUP BY 1, 2
    ),
    cand AS MATERIALIZED (
        SELECT query_id, vec_id, r FROM (
            SELECT s.query_id, s.vec_id,
                   CAST(round(s.dot / (nq.nrm * nb.nrm) * 1000000)
                        AS BIGINT) AS r,
                   row_number() OVER (
                       PARTITION BY s.query_id
                       ORDER BY CAST(round(s.dot / (nq.nrm * nb.nrm)
                                           * 1000000) AS BIGINT) DESC,
                                s.vec_id ASC) AS rr
            FROM sims s
            JOIN nrm nq ON s.query_id = nq.vec_id
            JOIN nrm nb ON s.vec_id = nb.vec_id
        ) WHERE rr <= {n}
    ),
    cbe AS (
        SELECT c.query_id, ev.vec_id, ev.i, ev.v
        FROM ev JOIN cand c ON ev.vec_id = c.vec_id
    ),
    psim AS MATERIALIZED (
        SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
               CAST(round(sum(a.v * b.v) / (na.nrm * nb.nrm) * 1000000)
                    AS BIGINT) AS p
        FROM cbe a
        JOIN cbe b ON a.query_id = b.query_id AND a.i = b.i
        JOIN nrm na ON a.vec_id = na.vec_id
        JOIN nrm nb ON b.vec_id = nb.vec_id
        GROUP BY a.query_id, a.vec_id, b.vec_id, na.nrm, nb.nrm
    )"""]
    for i in range(1, k + 1):
        if i == 1:
            parts.append(f""",
    pick1 AS MATERIALIZED (
        SELECT query_id, vec_id, val AS mmr_score_e7, 1 AS rank FROM (
            SELECT query_id, vec_id, {lam_n} * r AS val,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY {lam_n} * r DESC, vec_id ASC
                   ) AS rr
            FROM cand
        ) WHERE rr = 1
    )""")
        else:
            # incremental selected-set chain (NOT a growing union of
            # every prior pick — that re-expands the whole recursion)
            prev = (f"SELECT query_id, vec_id FROM pick1" if i == 2 else
                    f"SELECT query_id, vec_id FROM selu{i - 1} "
                    f"UNION ALL SELECT query_id, vec_id FROM pick{i - 1}")
            parts.append(f""",
    selu{i} AS MATERIALIZED ({prev}),
    pick{i} AS MATERIALIZED (
        SELECT query_id, vec_id, val AS mmr_score_e7, {i} AS rank FROM (
            SELECT c.query_id, c.vec_id,
                   {lam_n} * c.r - {one_minus_n} * coalesce(mx.m, 0)
                       AS val,
                   row_number() OVER (
                       PARTITION BY c.query_id
                       ORDER BY {lam_n} * c.r
                                - {one_minus_n} * coalesce(mx.m, 0)
                                DESC, c.vec_id ASC
                   ) AS rr
            FROM cand c
            LEFT JOIN (
                SELECT p.query_id, p.va AS vec_id, max(p.p) AS m
                FROM psim p
                JOIN selu{i} s ON p.query_id = s.query_id
                              AND p.vb = s.vec_id
                GROUP BY 1, 2
            ) mx ON c.query_id = mx.query_id AND c.vec_id = mx.vec_id
            LEFT JOIN selu{i} t ON c.query_id = t.query_id
                               AND c.vec_id = t.vec_id
            WHERE t.vec_id IS NULL
        ) WHERE rr = 1
    )""")
    finals = " UNION ALL ".join(
        f"SELECT query_id, vec_id, mmr_score_e7, rank FROM pick{j}"
        for j in range(1, k + 1))
    return "".join(parts) + f" {finals} ORDER BY query_id, rank"
