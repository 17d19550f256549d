"""Pins for the session-13 gates: DFR PL2 scoring, geo k-NN, and
parent-child block join."""

import numpy as np

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- DFR

def test_pl2_tf_monotonic_at_fixed_length(ray_session):
    """PL2 property pin on a planted corpus: with dl and stats fixed,
    more occurrences of the query term score higher (the after-effect
    dampens but never inverts growth at web-scale lambda<1)."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os

    from pdfsearch_ray.pipelines.dfr import dfr_pl2_topk

    # same dl (8 tokens); tf(term 'zz') = 1, 2, 4; 13 padding docs keep
    # lambda = cf/N = 7/16 < 1 (the web regime — PL2 is deliberately
    # non-monotone once a term is MORE frequent than chance, lambda>1)
    docs = [
        "zz a b c d e f g",
        "zz zz b c d e f g",
        "zz zz zz zz d e f g",
    ] + ["a b c d e f g h"] * 13
    d = tempfile.mkdtemp(prefix="pl2_")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    }), os.path.join(d, "documents.parquet"))
    got = dfr_pl2_topk(d, queries=("zz",), k=10).to_pandas()
    got = got.sort_values("rank")
    assert got["doc_id"].tolist() == [2, 1, 0]  # tf 4 > 2 > 1
    assert (np.diff(got["score"].to_numpy()) < 0).all()


def test_pl2_length_normalization(ray_session):
    """Same tf, longer doc -> smaller tfn -> different score; the
    normalization-2 factor must be load-bearing."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os

    from pdfsearch_ray.pipelines.dfr import dfr_pl2_topk

    docs = [
        "zz a b c",                       # short
        "zz a b c d e f g h i j k l m",   # long, same tf=1
    ]
    d = tempfile.mkdtemp(prefix="pl2_")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    }), os.path.join(d, "documents.parquet"))
    got = dfr_pl2_topk(d, queries=("zz",), k=10).to_pandas()
    assert got["doc_id"].tolist()[0] == 0     # short doc wins
    s = got.set_index("doc_id")["score"]
    assert s[0] != s[1]


def test_pl2_oracle_match_small(ray_session):
    """Engine vs DuckDB oracle at sf0.001 (value-level)."""
    import duckdb

    from pdfsearch_ray.pipelines.dfr import dfr_pl2_sql, dfr_pl2_topk

    got = dfr_pl2_topk(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(dfr_pl2_sql()).fetchdf()
    g = got.sort_values(["query", "rank"]).reset_index(drop=True)
    w = want.sort_values(["query", "rank"]).reset_index(drop=True)
    assert g["doc_id"].tolist() == w["doc_id"].tolist()
    assert np.allclose(g["score"], w["score"], atol=0)


# ---------------------------------------------------------------- geo

def test_geo_coords_deterministic_and_in_range(ray_session):
    from pdfsearch_ray.pipelines.geo import _coords

    ids = np.arange(10_000, dtype=np.int64)
    lat, lon = _coords(ids)
    assert lat.min() >= -90_000_000 and lat.max() < 90_000_000
    assert lon.min() >= -180_000_000 and lon.max() < 180_000_000
    lat2, lon2 = _coords(ids)
    assert (lat == lat2).all() and (lon == lon2).all()


def test_geo_knn_matches_bruteforce(ray_session):
    """The distributed per-batch top-k merge must equal a full local
    argsort, including the longitude wraparound."""
    import duckdb

    from pdfsearch_ray.pipelines.geo import (
        GEO_K, GEO_POINTS, GEO_RADIUS_MICRO, _coords, geo_knn)

    got = geo_knn(SF).to_pandas()
    con = duckdb.connect()
    ids = con.execute(
        f"SELECT doc_id FROM '{SF}/documents.parquet'"
    ).fetchdf()["doc_id"].to_numpy()
    lat, lon = _coords(ids)
    r2 = GEO_RADIUS_MICRO * GEO_RADIUS_MICRO
    for pi, (plat, plon) in enumerate(GEO_POINTS):
        dlat = lat - plat
        adl = np.abs(lon - plon)
        dlon = np.minimum(adl, 360_000_000 - adl)
        d2 = dlat * dlat + dlon * dlon
        m = d2 <= r2
        order = np.lexsort((ids[m], d2[m]))[:GEO_K]
        want = ids[m][order].tolist()
        g = got[got["point_id"] == pi].sort_values("rank")
        assert g["doc_id"].tolist() == want, pi
        assert g["dist2"].tolist() == d2[m][order].tolist(), pi


def test_geo_wraparound_is_load_bearing(ray_session):
    """A point at lon +179.9° must see docs at -179.9° as near, not
    across the whole map."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os

    from pdfsearch_ray.pipelines.geo import _coords, geo_knn

    ids = np.arange(50_000, dtype=np.int64)
    lat, lon = _coords(ids)
    west = ids[(lon < -178_000_000)]          # near the antimeridian
    assert west.size > 0
    d = tempfile.mkdtemp(prefix="geo_")
    pq.write_table(pa.table({"doc_id": pa.array(west)}),
                   os.path.join(d, "documents.parquet"))
    wlat, _ = _coords(west)
    probe = (int(wlat[0]), 179_900_000)       # east side of the seam
    got = geo_knn(d, points=(probe,), k=5,
                  radius_micro=30_000_000).to_pandas()
    assert len(got) > 0                       # wraparound finds them
    assert int(got["dist2"].min()) < (10_000_000 ** 2) * 2


# ---------------------------------------------------------- block join

def test_blockjoin_parent_is_max_child_min_chunk(ray_session):
    """Planted corpus: the parent score must equal its best chunk's
    BM25 and best_chunk the smallest argmax index."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os

    from pdfsearch_ray.pipelines.blockjoin import blockjoin_topk

    # words_per_chunk=4 -> doc 0 has chunks (zz zz zz zz) and (a b c d):
    # chunk 0 dominates; doc 1 spreads zz across chunks -> weaker best
    docs = [
        "zz zz zz zz a b c d",
        "zz a b c zz d e f",
        "a b c d e f g h",
    ]
    d = tempfile.mkdtemp(prefix="bj_")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    }), os.path.join(d, "documents.parquet"))
    got = blockjoin_topk(d, queries=("zz",), k=10,
                         words_per_chunk=4).to_pandas()
    got = got.sort_values("rank")
    assert got["doc_id"].tolist() == [0, 1]
    assert got.iloc[0]["best_chunk"] == 0
    assert got.iloc[0]["score"] > got.iloc[1]["score"]


def test_blockjoin_one_chunk_degenerates_to_flat_bm25(ray_session):
    """With words_per_chunk larger than every doc, the chunk corpus IS
    the doc corpus — ranks must equal the flat bm25 scan's."""
    import duckdb

    from pdfsearch_ray.pipelines.blockjoin import (
        BJ_QUERIES, blockjoin_sql, blockjoin_topk)

    got = blockjoin_topk(SF, words_per_chunk=10_000).to_pandas()
    assert (got["best_chunk"] == 0).all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(
        blockjoin_sql(BJ_QUERIES, words_per_chunk=10_000)).fetchdf()
    g = got.sort_values(["query", "rank"]).reset_index(drop=True)
    w = want.sort_values(["query", "rank"]).reset_index(drop=True)
    assert g["doc_id"].tolist() == w["doc_id"].tolist()


def test_blockjoin_oracle_match_small(ray_session):
    import duckdb

    from pdfsearch_ray.pipelines.blockjoin import (
        blockjoin_sql, blockjoin_topk)

    got = blockjoin_topk(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(blockjoin_sql()).fetchdf()
    g = got.sort_values(["query", "rank"]).reset_index(drop=True)
    w = want.sort_values(["query", "rank"]).reset_index(drop=True)
    assert g["doc_id"].tolist() == w["doc_id"].tolist()
    assert g["best_chunk"].tolist() == w["best_chunk"].tolist()
    assert np.allclose(g["score"], w["score"], atol=0)


def test_geo_grid_counts_sum_to_corpus(ray_session):
    """With one giant cell the grid must count every doc; with the
    default cell size, top-k counts are exact vs a local recompute."""
    import duckdb

    from pdfsearch_ray.pipelines.geo import (
        GRID_CELL_MICRO, _coords, geo_grid)

    con = duckdb.connect()
    ids = con.execute(
        f"SELECT doc_id FROM '{SF}/documents.parquet'"
    ).fetchdf()["doc_id"].to_numpy()
    # a giant cell still splits at the (0,0) floor-division axes ->
    # exactly the 4 quadrants, and the counts must sum to the corpus
    one = geo_grid(SF, cell_micro=1_000_000_000, k=10).to_pandas()
    assert len(one) == 4 and int(one["n_docs"].sum()) == ids.size
    t = geo_grid(SF).to_pandas()
    lat, lon = _coords(ids)
    import collections

    want = collections.Counter(zip(lat // GRID_CELL_MICRO,
                                   lon // GRID_CELL_MICRO))
    for r in t.itertuples():
        assert want[(r.cell_lat, r.cell_lon)] == r.n_docs
