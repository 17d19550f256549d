"""Banded-LSH embedding near-dup pairs vs the exact baseline: every
reported pair must appear in the exact all-pairs result with the same
6-dp cosine (no false positives — verification is exact), and recall on
HIGH-similarity planted near-dups must be substantial (banding theory:
P[collide in a band] = (1 - θ/π)^nbits, ~86% over 4×6-bit bands at
cos ≥ 0.95)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_lsh_pairs_subset_of_exact(ray_session):
    from pdfsearch_ray.pipelines.similarity import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    exact = embedding_dup_pairs(SF, threshold=0.4).to_pandas()
    lsh = embedding_dup_pairs_lsh(SF, threshold=0.4).to_pandas()
    exact_set = {(a, b): c for a, b, c in
                 zip(exact["vec_a"], exact["vec_b"], exact["cos"])}
    assert len(lsh) > 0
    for a, b, c in zip(lsh["vec_a"], lsh["vec_b"], lsh["cos"]):
        assert (a, b) in exact_set, (a, b)
        assert c == exact_set[(a, b)], (a, b)


def test_lsh_pairs_recall_on_planted_near_dups(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.similarity import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    rng = np.random.RandomState(123)
    dim = 64
    n_base = 400
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # plant 60 near-dups: tiny perturbations of the first 60 vectors
    dups = base[:60] + rng.normal(scale=0.04, size=(60, dim))
    vecs = np.vstack([base, dups]).astype(np.float32)
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(vecs), dtype=np.int32)),
    }), f"{d}/embeddings.parquet")

    exact = embedding_dup_pairs(d, threshold=0.9).to_pandas()
    lsh = embedding_dup_pairs_lsh(d, threshold=0.9).to_pandas()
    exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
    lsh_pairs = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert lsh_pairs <= exact_pairs  # exact verify: no false positives
    assert len(exact_pairs) >= 50  # the plant worked
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.6, recall  # banding theory predicts ~0.86 here
