"""Rocchio dense PRF (pipelines/densefb.py) pins."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _brute_reference(sf_dir, k):
    """Driver-side exhaustive cosine ranking straight from parquet."""
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines.densefb import ROCCHIO_NQ

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"].to_pylist()])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qsel = ids < ROCCHIO_NQ
    out = {}
    for qi, qid in zip(np.flatnonzero(qsel), ids[qsel]):
        s = np.round(mn[~qsel] @ mn[qi], 6)
        did = ids[~qsel]
        top = np.lexsort((did, -s))[:k]
        out[int(qid)] = did[top].tolist()
    return out


def test_beta_zero_degenerates_to_round1(ray_session):
    from pdfsearch_ray.pipelines.densefb import (ROCCHIO_K,
                                                 rocchio_dense_topk)

    got = rocchio_dense_topk(SF, beta=0.0).to_pandas()
    ref = _brute_reference(SF, ROCCHIO_K)
    for qid, g in got.groupby("query_id"):
        assert g.sort_values("rank")["vec_id"].tolist() == ref[int(qid)]


def test_feedback_is_load_bearing(ray_session):
    """The default blend must actually change at least one query's
    ranking vs plain retrieval (else the operator is inert)."""
    from pdfsearch_ray.pipelines.densefb import rocchio_dense_topk

    base = rocchio_dense_topk(SF, beta=0.0).to_pandas()
    fb = rocchio_dense_topk(SF).to_pandas()
    changed = False
    for qid in sorted(set(base["query_id"])):
        a = base[base["query_id"] == qid].sort_values("rank")
        b = fb[fb["query_id"] == qid].sort_values("rank")
        if a["vec_id"].tolist() != b["vec_id"].tolist():
            changed = True
    assert changed
