"""SemDeDup (within-cluster embedding prune) semantics:

* engine output matches the DuckDB oracle (shared centroids; DuckDB
  independently recomputes assignment, in-cluster rank, pairwise sims
  and the keep rule) at sf0.001;
* a planted EXACT duplicate pair (ids outside the k-means training
  window so the shared model is untouched) is dropped while its
  original survives and every other verdict is unchanged;
* eps > 1 keeps everything (cos rounds to at most 1.0).
"""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _run(sf_dir, **kw):
    from pdfsearch_ray.pipelines.similarity import semantic_dedup

    return (semantic_dedup(sf_dir, **kw).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))


def test_semantic_dedup_matches_oracle(ray_session):
    from pdfsearch_ray.pipelines import oracles

    eng = _run(SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{SF}/embeddings.parquet')")
    orc = con.sql(oracles.semantic_dedup_sql(SF)).df() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(eng) == 500
    assert eng["vec_id"].tolist() == orc["vec_id"].tolist()
    assert eng["cluster"].tolist() == orc["cluster"].tolist()
    assert eng["cent_sim"].tolist() == orc["cent_sim"].tolist()
    assert eng["keep"].tolist() == orc["keep"].tolist()
    assert not eng["keep"].all()          # the rule really fires
    assert eng["keep"].sum() > 250        # and doesn't nuke the corpus


def test_semantic_dedup_planted_exact_duplicates(ray_session, tmp_path):
    base = _run(SF)
    kept_ids = base.loc[base["keep"], "vec_id"].tolist()
    k = kept_ids[0]

    t = pq.read_table(f"{SF}/embeddings.parquet")
    emb_k = t["embedding"][t["vec_id"].to_pylist().index(k)]
    # duplicate ids ABOVE the 2048-row training window: centroids (and
    # therefore every original verdict) are provably unchanged — the
    # dups only append to the tail of their cluster's rank order
    extra = pa.table({
        "vec_id": pa.array([5000, 5001], type=t.schema.field("vec_id").type),
        "embedding": pa.array([emb_k.as_py(), emb_k.as_py()],
                              type=t.schema.field("embedding").type),
        "label": pa.array([0, 0], type=t.schema.field("label").type),
    })
    sf2 = tmp_path / "sf"
    sf2.mkdir()
    pq.write_table(pa.concat_tables([t, extra.select(t.column_names)]),
                   sf2 / "embeddings.parquet")

    out = _run(str(sf2))
    byid = out.set_index("vec_id")
    # exact copies of a kept vector: both dropped, the original stays
    assert bool(byid.loc[k, "keep"])
    assert not bool(byid.loc[5000, "keep"])
    assert not bool(byid.loc[5001, "keep"])
    # same cluster, identical centroid similarity
    assert (byid.loc[[k, 5000, 5001], "cluster"].nunique() == 1)
    assert (byid.loc[[k, 5000, 5001], "cent_sim"].nunique() == 1)
    # every pre-existing verdict is untouched
    merged = base.merge(out, on="vec_id", suffixes=("_a", "_b"))
    assert (merged["keep_a"] == merged["keep_b"]).all()
    assert (merged["cluster_a"] == merged["cluster_b"]).all()


def test_semantic_dedup_eps_above_one_keeps_all(ray_session):
    out = _run(SF, eps=1.01)
    assert out["keep"].all()
