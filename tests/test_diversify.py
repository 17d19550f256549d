"""MMR diversification (pipelines/diversify.py): oracle equivalence
and a planted geometry where the novelty term flips the ranking — an
exact duplicate of the top hit must fall behind a less-relevant but
diverse vector."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_mmr_matches_oracle(ray_session):
    from pdfsearch_ray.pipelines import diversify as D

    got = D.mmr_diversify(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    want = con.execute(D.mmr_diversify_sql()).df()
    t2 = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    o2 = want[t2.columns].sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert len(t2) == len(o2) > 0
    for c in t2.columns:
        assert (t2[c].to_numpy().astype(str)
                == o2[c].to_numpy().astype(str)).all(), c
    # no repeats within a query; marginal scores non-increasing
    for _, g in got.groupby("query_id"):
        assert g["vec_id"].is_unique
        v = g.sort_values("rank")["mmr_score_e7"].to_numpy()
        assert (v[:-1] >= v[1:]).all()


def test_mmr_novelty_flips_rank(ray_session, tmp_path, monkeypatch):
    """q=[1,0]; v10 at 25.8 deg (r=0.9), v11 the SAME direction (exact
    dup, pair-sim 1.0), v12 on the other side (r=0.85, pair-sim ~0.54
    to v10).  Pure relevance ranks v11 second; MMR must rank v12
    second and push the duplicate to third."""
    from pdfsearch_ray.pipelines import diversify as D

    v10 = [0.9, np.sqrt(1 - 0.81), 0.0, 0.0]
    t = pa.table({
        "vec_id": pa.array([0, 10, 11, 12], type=pa.int64()),
        "embedding": pa.array([
            [1.0, 0.0, 0.0, 0.0],
            v10,
            [2 * x for x in v10],          # exact duplicate direction
            [0.85, -float(np.sqrt(1 - 0.7225)), 0.0, 0.0],
        ], type=pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    monkeypatch.setattr(D, "MMR_QVECS", (0,))
    got = D.mmr_diversify(str(tmp_path)).to_pandas()
    order = got.sort_values("rank")["vec_id"].tolist()
    assert order == [10, 12, 11]

    # oracle agrees on the planted geometry
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{tmp_path}/embeddings.parquet'")
    want = con.execute(D.mmr_diversify_sql(qvecs=(0,))).df()
    assert want.sort_values("rank")["vec_id"].tolist() == [10, 12, 11]
    g = got.sort_values("rank").reset_index(drop=True)
    w = want.sort_values("rank").reset_index(drop=True)
    assert (g["mmr_score_e7"].to_numpy()
            == w["mmr_score_e7"].to_numpy().astype("int64")).all()
