"""Similarity search over an embedding column (training-data addenda).

* Brute-force cosine top-k — pipelines/queries.py:ann_cosine_topk
  (broadcast query matrix, numpy matmul per batch, partial top-k, driver
  merge).  Exact; the correctness baseline.
* LSH-bucketed cosine top-k (this module) — the scale path: random
  hyperplane signatures partition vectors into buckets; a query probes
  its own bucket plus all hamming≤1 neighbors (multi-probe), brute-forces
  only the candidates.  Recall < 1 by design; tested against the
  brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    h = rng.normal(size=(dim, nbits))
    return h / np.linalg.norm(h, axis=0, keepdims=True)


def _signs(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes) > 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return bits.astype(np.int64) @ weights


class _BucketSigner:
    """Actor: embedding rows → (bucket, vec_id, embedding) rows."""

    def __init__(self, dim: int, nbits: int, seed: int, exclude_below: int):
        self.planes = _hyperplanes(dim, nbits, seed)
        self.exclude_below = exclude_below

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        emb = batch["embedding"].combine_chunks()
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.chunk(0)
        dim = self.planes.shape[0]
        m = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        mask = ids >= self.exclude_below
        ids, m = ids[mask], m[mask]
        buckets = _signs(m, self.planes)
        return pa.table({
            "bucket": pa.array(buckets, type=pa.int64()),
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": emb.take(pa.array(np.nonzero(mask)[0], type=pa.int32())),
        })


def ann_lsh_topk(
    sf_dir: str,
    *,
    num_queries: int = 5,
    k: int = 10,
    nbits: int = 8,
    seed: int = 42,
) -> pa.Table:
    """Approximate cosine top-k via hyperplane LSH + multi-probe.

    Build: one map_batches pass assigns every base vector a bucket.  The
    bucketed table is the persistent index at scale (groupby(bucket) →
    write partition per bucket); a query reads only its probe buckets.
    Here the bucketed Dataset stays in the object store and probing
    filters it per query batch.
    """
    import pyarrow.parquet as pq

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", num_queries)],
    )
    q_ids = qt["vec_id"].to_numpy()
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    dim = qm.shape[1]
    planes = _hyperplanes(dim, nbits, seed)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    q_buckets = _signs(qm, planes)
    # multi-probe: own bucket + flip each bit once
    probe_sets = []
    for qb in q_buckets:
        probes = {int(qb)}
        for b in range(nbits):
            probes.add(int(qb) ^ (1 << b))
        probe_sets.append(probes)
    all_probes = sorted(set().union(*probe_sets))

    bucketed = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        _BucketSigner,
        fn_constructor_kwargs=dict(dim=dim, nbits=nbits, seed=seed,
                                   exclude_below=num_queries),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    import pyarrow.compute as pc

    cand = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=pa.array(all_probes))),
        batch_format="pyarrow",
    ).to_arrow_refs()
    tables = [ray.get(r) for r in cand]
    tbl = pa.concat_tables([t for t in tables if t.num_rows]) if tables else None
    if tbl is None or tbl.num_rows == 0:
        return pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "sim": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64()),
        })
    c_ids = tbl["vec_id"].to_numpy()
    c_buckets = tbl["bucket"].to_numpy()
    emb = tbl["embedding"].combine_chunks()
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.chunk(0)
    cm = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
    cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)

    out_q, out_v, out_s, out_r = [], [], [], []
    for j, qid in enumerate(q_ids):
        probe = probe_sets[j]
        sel = np.array([b in probe for b in c_buckets])
        if not sel.any():
            continue
        sims = cn[sel] @ qn[j]
        ids = c_ids[sel]
        order = np.lexsort((ids, -np.round(sims, 6)))[:k]
        for r, oi in enumerate(order):
            out_q.append(int(qid))
            out_v.append(int(ids[oi]))
            out_s.append(float(round(sims[oi], 6)))
            out_r.append(r + 1)
    return pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "vec_id": pa.array(out_v, type=pa.int64()),
        "sim": pa.array(out_s, type=pa.float64()),
        "rank": pa.array(out_r, type=pa.int64()),
    })


# ---------------------------------------------------------------- IVF


def _kmeans(train: np.ndarray, n_clusters: int, iters: int,
            seed: int) -> np.ndarray:
    """Plain Lloyd k-means on a (small, sampled) training matrix —
    deterministic init by seeded choice; runs on the driver ("train on a
    sample, broadcast the model")."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(train.shape[0], size=min(n_clusters, train.shape[0]),
                     replace=False)
    cents = train[idx].copy()
    for _ in range(iters):
        sims = train @ cents.T  # rows normalized → cosine
        assign = np.argmax(sims, axis=1)
        for c in range(cents.shape[0]):
            members = train[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


class _IVFAssigner:
    """Actor: embedding rows → (cluster, vec_id, embedding); centroids
    fetched once per actor from the object store (broadcast)."""

    def __init__(self, cents_ref, dim: int, exclude_below: int):
        self.cents = ray.get(cents_ref)
        self.dim = dim
        self.exclude_below = exclude_below

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        emb = batch["embedding"].combine_chunks()
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.chunk(0)
        m = emb.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64).reshape(-1, self.dim)
        mask = ids >= self.exclude_below
        ids, m = ids[mask], m[mask]
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(mn @ self.cents.T, axis=1)
        return pa.table({
            "cluster": pa.array(assign, type=pa.int64()),
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": emb.take(
                pa.array(np.nonzero(mask)[0], type=pa.int32())),
        })


def ann_ivf_topk(
    sf_dir: str,
    *,
    num_queries: int = 5,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    train_rows: int = 2048,
    iters: int = 5,
    seed: int = 7,
) -> pa.Table:
    """Approximate cosine top-k via IVF (inverted file): k-means
    centroids trained on a sampled slice (driver), broadcast via
    ``ray.put``; one map_batches pass assigns every base vector its
    cluster (the persistent partition key at scale — write one partition
    per cluster); a query brute-forces only its ``n_probe`` nearest
    clusters.  Same output schema as ann_lsh_topk / ann_cosine_topk."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", num_queries)],
    )
    q_ids = qt["vec_id"].to_numpy()
    qm = np.stack([np.asarray(v, dtype=np.float64)
                   for v in qt["embedding"].to_pylist()])
    dim = qm.shape[1]
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    # deterministic training sample: first train_rows base vectors
    tt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", ">=", num_queries),
                 ("vec_id", "<", num_queries + train_rows)],
    )
    tm = np.stack([np.asarray(v, dtype=np.float64)
                   for v in tt["embedding"].to_pylist()])
    tm = tm / np.maximum(np.linalg.norm(tm, axis=1, keepdims=True), 1e-12)
    cents = _kmeans(tm, n_clusters, iters, seed)
    cents_ref = ray.put(cents)

    assigned = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        _IVFAssigner,
        fn_constructor_kwargs=dict(cents_ref=cents_ref, dim=dim,
                                   exclude_below=num_queries),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    probe_sets = []
    q_cents = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    for row in q_cents:
        probe_sets.append(set(int(c) for c in row))
    all_probes = sorted(set().union(*probe_sets))

    cand_refs = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["cluster"],
                                    value_set=pa.array(all_probes))),
        batch_format="pyarrow",
    ).to_arrow_refs()
    tables = [t for t in (ray.get(r) for r in cand_refs) if t.num_rows]
    if not tables:
        return pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "sim": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64()),
        })
    tbl = pa.concat_tables(tables)
    c_ids = tbl["vec_id"].to_numpy()
    c_clusters = tbl["cluster"].to_numpy()
    emb = tbl["embedding"].combine_chunks()
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.chunk(0)
    cm = emb.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64).reshape(-1, dim)
    cn = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-12)

    out_q, out_v, out_s, out_r = [], [], [], []
    for j, qid in enumerate(q_ids):
        in_probe = np.isin(c_clusters, list(probe_sets[j]))
        ids_j = c_ids[in_probe]
        sims = cn[in_probe] @ qn[j]
        sims6 = np.round(sims, 6)
        order = np.lexsort((ids_j, -sims6))[:k]
        for r, idx in enumerate(order, start=1):
            out_q.append(int(qid))
            out_v.append(int(ids_j[idx]))
            out_s.append(float(sims6[idx]))
            out_r.append(r)
    return pa.table({
        "query_id": pa.array(out_q, type=pa.int64()),
        "vec_id": pa.array(out_v, type=pa.int64()),
        "sim": pa.array(out_s, type=pa.float64()),
        "rank": pa.array(out_r, type=pa.int64()),
    })
