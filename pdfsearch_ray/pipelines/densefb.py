"""Dense pseudo-relevance feedback: Rocchio in embedding space.

Rocchio (1971), applied to the dense-retrieval era (the
ANCE/ColBERT-PRF shape): retrieve top-k0 by cosine, move the query
vector toward the centroid of the feedback set,

    q' = α·q̂ + β·mean(d̂_i, i ∈ top-k0),     then re-retrieve with q̂'.

This is the embedding-space counterpart of the lexical RM3 gate
(`rm3_topk`): the two together cover PRF for both retriever families
the engine ships.  Beyond-reference (bleve has no dense path at all).

Distribution shape: both retrieval rounds are the `ann_cosine_topk`
brute pass — query matrix broadcast ONCE via ray.put, one numpy matmul
per Arrow batch, per-batch top-(k+buffer) partials, O(K·blocks) driver
merge.  The feedback fetch between rounds is a pushdown-filtered read
of exactly k0·NQ rows.  At scale round 2 reuses the IVF/LSH layouts
(`similarity.py`) unchanged — q' is just another query vector.

Oracle: DuckDB replays round-1 ranking, the feedback-set selection,
the normalized centroid blend, re-normalization and round-2 cosine
ranking from the raw embeddings table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["rocchio_dense_topk", "rocchio_sql",
           "ROCCHIO_NQ", "ROCCHIO_K0", "ROCCHIO_K",
           "ROCCHIO_ALPHA", "ROCCHIO_BETA"]

ROCCHIO_NQ = 5        # query vectors: vec_id < 5 (the ANN convention)
ROCCHIO_K0 = 10       # feedback depth
ROCCHIO_K = 10        # final depth
ROCCHIO_ALPHA = 1.0
ROCCHIO_BETA = 0.75


def _brute_topk(sf_dir: str, q_ids: np.ndarray, qn: np.ndarray,
                k: int):
    """Brute cosine top-k of every corpus vector (vec_id >= NQ)
    against the given normalized query matrix: broadcast once,
    per-batch matmul + buffered partial top-k, driver merge.
    Returns {query_id: (vec_ids, rounded_sims)} sorted by
    (sim desc, vec_id asc)."""
    import ray

    from ..functions.tables import read_parquet_nometa

    ref = ray.put((q_ids.astype(np.int64), qn))

    def sims(batch: pa.Table) -> pa.Table:
        q_ids_, qn_ = ray.get(ref)
        ids = batch["vec_id"].to_numpy()
        mask = ids >= ROCCHIO_NQ
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "sim": pa.array([], type=pa.float64()),
        })
        if not mask.any():
            return empty
        emb = batch["embedding"].combine_chunks()
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.chunk(0)
        flat = emb.flatten().to_numpy(
            zero_copy_only=False).astype(np.float64)
        dim = qn_.shape[1]
        m = flat.reshape(-1, dim)[mask]
        ids = ids[mask]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        s = mn @ qn_.T
        kk = min(k + 32, len(ids))
        out_q, out_v, out_s = [], [], []
        for j, qid in enumerate(q_ids_):
            col = s[:, j]
            top = (np.lexsort((ids, -col))[:kk]
                   if len(ids) > kk else np.arange(len(ids)))
            out_q += [int(qid)] * len(top)
            out_v += ids[top].tolist()
            out_s += col[top].tolist()
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "sim": pa.array(out_s, type=pa.float64()),
        })

    cand = (read_parquet_nometa(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
            .map_batches(sims, batch_format="pyarrow", batch_size=512)
            .to_pandas())
    out = {}
    for qid in q_ids.astype(np.int64):
        g = cand[cand["query_id"] == int(qid)]
        sim6 = np.round(g["sim"].to_numpy(), 6)
        vids = g["vec_id"].to_numpy()
        top = np.lexsort((vids, -sim6))[:k]
        out[int(qid)] = (vids[top].astype(np.int64), sim6[top])
    return out


def rocchio_dense_topk(sf_dir: str, *, alpha: float = ROCCHIO_ALPHA,
                       beta: float = ROCCHIO_BETA) -> pa.Table:
    """(query_id, vec_id, sim, rank) after one Rocchio feedback round.
    beta=0 degenerates to plain round-1 cosine ranking (pytest-pinned)."""
    import pyarrow.parquet as pq

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", ROCCHIO_NQ)])
    if qt.num_rows == 0:             # empty corpus: no query vectors
        return pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "sim": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64()),
        })
    q_ids = qt["vec_id"].to_numpy().astype(np.int64)
    qm = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qt["embedding"].to_pylist()])
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    r1 = _brute_topk(sf_dir, q_ids, qn, ROCCHIO_K0)

    need = sorted({int(v) for ids, _ in r1.values() for v in ids})
    ft = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", need)])
    fmap = {}
    for vid, emb in zip(ft["vec_id"].to_pylist(),
                        ft["embedding"].to_pylist()):
        e = np.asarray(emb, dtype=np.float64)
        fmap[int(vid)] = e / np.linalg.norm(e)

    q2 = np.empty_like(qn)
    for i, qid in enumerate(q_ids):
        ids, _ = r1[int(qid)]
        cent = np.mean([fmap[int(v)] for v in ids], axis=0)
        v = alpha * qn[i] + beta * cent
        q2[i] = v / np.linalg.norm(v)

    r2 = _brute_topk(sf_dir, q_ids, q2, ROCCHIO_K)
    out_q, out_v, out_s, out_r = [], [], [], []
    for qid in sorted(r2):
        ids, sims = r2[qid]
        out_q += [qid] * len(ids)
        out_v += ids.tolist()
        out_s += sims.tolist()
        out_r += list(range(1, len(ids) + 1))
    return pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "vec_id": pa.array(out_v, type=pa.int64()),
        "sim": pa.array(out_s, type=pa.float64()),
        "rank": pa.array(out_r, type=pa.int64()),
    })


def rocchio_sql(*, nq: int = ROCCHIO_NQ, k0: int = ROCCHIO_K0,
                k: int = ROCCHIO_K, alpha: float = ROCCHIO_ALPHA,
                beta: float = ROCCHIO_BETA) -> str:
    """Oracle: round-1 cosine ranking, the k0 feedback window, the
    normalized centroid blend, re-normalization and round-2 ranking."""
    return f"""
        WITH be AS (
            SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm
                  FROM be GROUP BY vec_id),
        r1d AS (
            SELECT q.vec_id AS query_id, d.vec_id, sum(q.v * d.v) AS dot
            FROM be q JOIN be d USING (j)
            WHERE q.vec_id < {nq} AND d.vec_id >= {nq}
            GROUP BY q.vec_id, d.vec_id
        ),
        r1 AS (
            SELECT r.query_id, r.vec_id,
                   round(r.dot / (nq_.nrm * nd.nrm), 6) AS sim
            FROM r1d r
            JOIN norms nq_ ON nq_.vec_id = r.query_id
            JOIN norms nd ON nd.vec_id = r.vec_id
        ),
        fb AS (
            SELECT query_id, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY sim DESC, vec_id ASC) AS rr
                FROM r1
            ) WHERE rr <= {k0}
        ),
        qprf AS (
            SELECT f.query_id, d.j,
                   {alpha} * any_value(qv.v / nq_.nrm)
                       + {beta} * avg(d.v / nd.nrm) AS v
            FROM fb f
            JOIN be d ON d.vec_id = f.vec_id
            JOIN norms nd ON nd.vec_id = f.vec_id
            JOIN be qv ON qv.vec_id = f.query_id AND qv.j = d.j
            JOIN norms nq_ ON nq_.vec_id = f.query_id
            GROUP BY f.query_id, d.j
        ),
        qn2 AS (SELECT query_id, sqrt(sum(v * v)) AS nrm
                FROM qprf GROUP BY query_id),
        r2d AS (
            SELECT p.query_id, d.vec_id, sum(p.v * d.v) AS dot
            FROM qprf p JOIN be d USING (j)
            WHERE d.vec_id >= {nq}
            GROUP BY p.query_id, d.vec_id
        ),
        sims2 AS (
            SELECT r.query_id, r.vec_id,
                   round(r.dot / (q2.nrm * nd.nrm), 6) AS sim
            FROM r2d r
            JOIN qn2 q2 ON q2.query_id = r.query_id
            JOIN norms nd ON nd.vec_id = r.vec_id
        )
        SELECT * FROM (
            SELECT query_id, vec_id, sim,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, vec_id ASC) AS rank
            FROM sims2
        ) WHERE rank <= {k}
        ORDER BY query_id, rank"""
