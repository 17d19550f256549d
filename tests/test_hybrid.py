"""Hybrid lexical+dense RRF fusion (pipelines/hybrid.py) and the
delete→compact lifecycle gate (pipelines/merge.py:compacted_*)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def spill_env(monkeypatch, tmp_path):
    monkeypatch.setenv("PDFSEARCH_SPILL_ROOT", str(tmp_path))
    return tmp_path


def _con(sf):
    con = duckdb.connect()
    for n in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM "
                    f"read_parquet('{sf}/{n}.parquet')")
    return con


def test_rrf_matches_oracle_small(ray_session, spill_env):
    from pdfsearch_ray.pipelines.hybrid import (hybrid_rrf_sql,
                                                hybrid_rrf_topk)

    t = hybrid_rrf_topk(SF).to_pandas()
    o = _con(SF).execute(hybrid_rrf_sql()).fetchdf()
    t = t.sort_values(["query", "rank"]).reset_index(drop=True)
    o = o[t.columns].sort_values(["query", "rank"]).reset_index(drop=True)
    assert len(t) == len(o) and len(t) > 0
    for c in t.columns:
        a, b = t[c].to_numpy(), o[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(float), rtol=0, atol=1e-9), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_rrf_algebra_and_provenance(ray_session, spill_env):
    """Every fused score is exactly the sum of its provenance parts;
    ranks are contiguous per query under (rrf desc, doc_id asc); the
    query's own vector never appears as a dense hit (self-exclusion);
    rank 0 is the 'absent from that list' sentinel, never both 0."""
    from pdfsearch_ray.pipelines.hybrid import (HYBRID_K, HYBRID_QUERIES,
                                                RRF_K0, hybrid_rrf_topk)

    t = hybrid_rrf_topk(SF).to_pandas()
    qvec = dict(HYBRID_QUERIES)
    for q, g in t.groupby("query", sort=True):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= HYBRID_K
        keys = list(zip(-g["rrf_score"], g["doc_id"]))
        assert keys == sorted(keys)
        for _, r in g.iterrows():
            want = sum(1.0 / (RRF_K0 + x)
                       for x in (r["lex_rank"], r["vec_rank"]) if x > 0)
            assert abs(r["rrf_score"] - round(want, 6)) < 1e-12
            assert r["lex_rank"] > 0 or r["vec_rank"] > 0
            if r["doc_id"] == qvec[q]:
                assert r["vec_rank"] == 0  # self never a dense hit


def test_compacted_gate_survivors_and_cache(ray_session, spill_env):
    from pdfsearch_ray.pipelines.merge import (COMPACT_MOD,
                                               COMPACT_RESIDUE,
                                               compacted_index_cached,
                                               compacted_index_sql,
                                               compacted_index_topk)
    from pdfsearch_ray.state.manifest import IndexManifest

    d1 = compacted_index_cached(SF)
    d2 = compacted_index_cached(SF)
    assert d1 == d2  # fingerprint cache hit, no rebuild

    m = IndexManifest.load(d1)
    assert not m.tombstones  # physically purged, not lazily hidden
    import pyarrow.parquet as pq
    n_src = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id"]).num_rows
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    n_doomed = int((ids % COMPACT_MOD == COMPACT_RESIDUE).sum())
    assert m.n_docs == n_src - n_doomed and n_doomed > 0

    t = compacted_index_topk(SF).to_pandas()
    assert len(t) > 0
    assert not (t["doc_id"] % COMPACT_MOD == COMPACT_RESIDUE).any()

    o = _con(SF).execute(compacted_index_sql()).fetchdf()
    t = t.sort_values(["query", "rank"]).reset_index(drop=True)
    o = o[t.columns].sort_values(["query", "rank"]).reset_index(drop=True)
    assert len(t) == len(o)
    assert np.allclose(t["score"], o["score"], rtol=0, atol=1e-9)
    assert (t["doc_id"].to_numpy() == o["doc_id"].to_numpy()).all()


def test_interp_matches_oracle_and_algebra(ray_session, spill_env):
    """Oracle equivalence at sf0.001 plus the blend algebra: mix is
    exactly alpha·lex_norm + (1-alpha)·vec_norm (6 dp), norms lie in
    [0,1], each list's best retrieved doc normalizes to 1.0 and (when
    the list is full-depth and non-degenerate) its worst to 0.0."""
    from pdfsearch_ray.pipelines.hybrid import (INTERP_ALPHA,
                                                hybrid_interp_sql,
                                                hybrid_interp_topk)

    t = hybrid_interp_topk(SF).to_pandas()
    o = _con(SF).execute(hybrid_interp_sql()).fetchdf()
    t2 = t.sort_values(["query", "rank"]).reset_index(drop=True)
    o2 = o[t2.columns].sort_values(["query", "rank"]).reset_index(drop=True)
    assert len(t2) == len(o2) and len(t2) > 0
    for c in t2.columns:
        a, b = t2[c].to_numpy(), o2[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(float), rtol=0, atol=1e-9), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c
    for _, r in t.iterrows():
        want = round(INTERP_ALPHA * r["lex_norm"]
                     + (1 - INTERP_ALPHA) * r["vec_norm"], 6)
        # norms were independently rounded for output, so the recombined
        # check carries that rounding error bound
        assert abs(r["mix_score"] - want) < 2e-6
        assert 0.0 <= r["lex_norm"] <= 1.0 and 0.0 <= r["vec_norm"] <= 1.0
    # the per-query maximum of each norm column is 1.0 (list winners)
    for _, g in t.groupby("query"):
        assert max(g["lex_norm"].max(), g["vec_norm"].max()) == 1.0


def test_combmnz_matches_oracle_and_consensus(ray_session, spill_env):
    """Oracle equivalence at sf0.001 plus the MNZ algebra: score =
    n_lists × (sum of normalized scores), so a two-list doc's score is
    at least twice what its score-sum alone would give — consensus is
    structurally rewarded."""
    from pdfsearch_ray.pipelines.hybrid import (hybrid_combmnz_sql,
                                                hybrid_combmnz_topk)

    t = hybrid_combmnz_topk(SF).to_pandas()
    o = _con(SF).execute(hybrid_combmnz_sql()).fetchdf()
    t2 = t.sort_values(["query", "rank"]).reset_index(drop=True)
    o2 = o[t2.columns].sort_values(["query", "rank"]).reset_index(drop=True)
    assert len(t2) == len(o2) and len(t2) > 0
    for c in t2.columns:
        a, b = t2[c].to_numpy(), o2[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(float), rtol=0, atol=1e-9), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c
    assert set(t["n_lists"]) <= {1, 2}
    # consensus reward: some two-list doc must outrank some one-list doc
    # whose single normalized score is higher than either of its own
    both = t[t["n_lists"] == 2]
    assert len(both) > 0
