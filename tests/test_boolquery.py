"""Conjunctive BM25 and positional phrase counting
(pipelines/boolquery.py): oracle equivalence, AND-subset-of-OR,
and overlap semantics on a planted corpus (the property the hash
can't localize: positions really drive the count)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def test_and_matches_oracle(ray_session):
    from pdfsearch_ray.pipelines import boolquery as B

    got = B.bm25_and_topk(SF).to_pandas().reset_index(drop=True)
    want = _con().execute(B.bm25_and_sql()).df()
    assert len(got) == len(want) > 0
    assert (got["query"].values == want["query"].values).all()
    assert (got["doc_id"].values == want["doc_id"].astype("int64").values).all()
    assert np.allclose(got["score"], want["score"], atol=1e-9)


def test_phrase_matches_oracle(ray_session):
    from pdfsearch_ray.pipelines import boolquery as B

    got = B.phrase_match_counts(SF).to_pandas()
    want = _con().execute(B.phrase_match_sql()).df()
    assert got.values.tolist() == \
        want[got.columns].astype(got.dtypes).values.tolist()
    assert (got["n_matches"] >= got["n_docs"]).all()
    assert (got["n_docs"] > 0).any()


def test_and_subset_of_or_with_all_terms(ray_session):
    """Every AND hit appears in the OR candidate set with the same
    score, and its text truly contains every query term."""
    import pyarrow.parquet as pq

    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import boolquery as B
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(simple_index_cached(SF))
    texts = dict(zip(*[
        pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])[c].to_pylist()
        for c in ("doc_id", "text")]))
    for q in B.AND_QUERIES:
        terms = sorted(set(analyze_simple(q)))
        and_ids, and_sc = B.score_terms_conjunctive(idx, terms)
        or_ids, or_sc = idx.score_terms(terms)
        common, ia, ib = np.intersect1d(and_ids, or_ids,
                                        return_indices=True)
        assert common.size == and_ids.size  # AND ⊆ OR
        assert np.allclose(and_sc[ia], or_sc[ib], atol=1e-12)
        for d in and_ids[:20]:
            toks = set(analyze_simple(texts[int(d)]))
            assert set(terms) <= toks


def test_phrase_overlap_semantics(ray_session, tmp_path):
    """'data data data' holds TWO 'data data' occurrences — positions,
    not non-overlapping regex counts, drive n_matches."""
    import ray.data as rd

    from pdfsearch_ray.pipelines import boolquery as B
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.query import BM25Index

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["data data data", "x data data y", "nothing"],
                         type=pa.string()),
        "lang": pa.array(["en"] * 3, type=pa.string()),
    })
    d = str(tmp_path / "phrase_idx")
    build_index(rd.from_arrow(t), d, analyzer="simple", num_buckets=4)
    idx = BM25Index(d)
    n_docs, n_matches = B.phrase_counts_from_index(idx, ["data", "data"])
    assert (n_docs, n_matches) == (2, 3)
    n_docs, n_matches = B.phrase_counts_from_index(idx, ["data", "data", "data"])
    assert (n_docs, n_matches) == (1, 1)
    assert B.phrase_counts_from_index(idx, ["data", "zzz"]) == (0, 0)


def test_and_oov_term_empty(ray_session):
    from pdfsearch_ray.pipelines import boolquery as B
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(simple_index_cached(SF))
    ids, sc = B.score_terms_conjunctive(idx, ["fast", "zzznotaword"])
    assert ids.size == 0 and sc.size == 0


def test_near_matches_oracle(ray_session):
    from pdfsearch_ray.pipelines import boolquery as B

    got = B.near_match_counts(SF).to_pandas()
    want = _con().execute(B.near_match_sql()).df()
    assert got.values.tolist() == \
        want[got.columns].astype(got.dtypes).values.tolist()
    # a live pair and the planted dead pair both present
    assert (got["n_docs"] > 0).any()
    assert (got.loc[got["query"] == "big zzznope", "n_docs"] == 0).all()


def test_near_window_semantics(ray_session, tmp_path):
    """Window arithmetic on a planted doc: 'fast x y merge' has the pair
    at distance 3 (inside W=3); 'fast x y z merge' at 4 (outside)."""
    import pyarrow as pa

    import ray.data as rd

    from pdfsearch_ray.pipelines import boolquery as B
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.query import BM25Index

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["fast x y merge", "fast x y z merge",
                          "merge fast"], type=pa.string()),
        "lang": pa.array(["en"] * 3, type=pa.string()),
    })
    d = str(tmp_path / "near_idx")
    build_index(rd.from_arrow(t), d, analyzer="simple", num_buckets=4)
    idx = BM25Index(d)
    nd, npair = B.near_counts_from_index(idx, "fast", "merge", w=3)
    assert (nd, npair) == (2, 2)  # docs 0 and 2; doc 1 is out of window
    nd4, _ = B.near_counts_from_index(idx, "fast", "merge", w=4)
    assert nd4 == 3


def test_not_matches_oracle_and_excludes(ray_session):
    """Oracle equivalence plus the semantic core: no result doc
    contains any excluded term, and every result keeps its unfiltered
    OR score."""
    import pyarrow.parquet as pq

    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import boolquery as B
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    got = B.bm25_not_topk(SF).to_pandas()
    want = _con().execute(B.bm25_not_sql()).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        a, b = got[col].to_numpy(), want[col].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(float), atol=1e-9), col
        else:
            assert (a.astype(str) == b.astype(str)).all(), col

    texts = dict(zip(*[pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"])[c].to_pylist()
        for c in ("doc_id", "text")]))
    idx = BM25Index(simple_index_cached(SF))
    for (q, neg), grp in got.groupby(["query", "not_term"]):
        neg_set = set(analyze_simple(neg))
        ids, sc = idx.score_terms(sorted(set(analyze_simple(q))))
        full = dict(zip(ids.astype(np.int64).tolist(),
                        np.round(sc, 6).tolist()))
        for d, s in zip(grp["doc_id"], grp["score"]):
            assert not neg_set & set(analyze_simple(texts[d]))
            assert full[d] == s


def test_phrase_topk_oracle_and_tf_consistency(ray_session):
    """Ranked PhraseQuery: oracle equivalence at sf0.001; per-query tf
    totals agree with the counting gate; scores are monotone in rank."""
    import duckdb
    import numpy as np

    from pdfsearch_ray.pipelines.boolquery import (
        PHRASE_TOPK_QUERIES,
        phrase_counts_from_index,
        phrase_topk,
        phrase_topk_sql,
    )
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    sf = "/root/testdata/sf0.001"
    t = phrase_topk(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    o = con.execute(phrase_topk_sql()).fetchdf()
    t2 = t.sort_values(["query", "rank"]).reset_index(drop=True)
    o2 = o[t2.columns].sort_values(["query", "rank"]).reset_index(drop=True)
    assert len(t2) == len(o2) and len(t2) > 0
    for c in t2.columns:
        a, b = t2[c].to_numpy(), o2[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(float), rtol=0, atol=1e-9), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c

    idx = BM25Index(simple_index_cached(sf))
    for q, g in t.groupby("query"):
        assert (g["score"].to_numpy()[:-1]
                >= g["score"].to_numpy()[1:]).all()
        n_docs, n_matches = phrase_counts_from_index(
            idx, analyze_simple(q))
        # the gate's per-doc tfs are a subset (top-K) of the counting
        # gate's totals
        assert g["phrase_tf"].sum() <= n_matches
        assert len(g) <= n_docs


def test_sloppy_phrase_oracle(ray_session):
    """Proximity-ranked phrase: oracle equivalence at sf0.001; sloppy
    weights are positive multiples of SLOP_SCALE/SLOP_W."""
    import numpy as np

    from pdfsearch_ray.pipelines.boolquery import (
        SLOP_SCALE,
        SLOP_W,
        sloppy_phrase_sql,
        sloppy_phrase_topk,
    )

    got = sloppy_phrase_topk(SF).to_pandas()
    want = _con().execute(sloppy_phrase_sql()).df()
    t2 = got.sort_values(["query", "rank"]).reset_index(drop=True)
    o2 = want[t2.columns].sort_values(
        ["query", "rank"]).reset_index(drop=True)
    assert len(t2) == len(o2) > 0
    for c in t2.columns:
        a, b = t2[c].to_numpy(), o2[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(float), rtol=0, atol=1e-9), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c
    # every weight is a sum of {scale//d : d in 1..w} terms -> >= min
    assert (got["sloppy_tf_x12"] >= SLOP_SCALE // SLOP_W).all()


def test_sloppy_distance_weighting_drives_rank(ray_session, tmp_path):
    """Planted corpus: same terms, same dl, same df — the doc with the
    ADJACENT pair must outrank the doc with the distance-3 pair, and
    the weights must be exactly scale//1 vs scale//3."""
    import ray.data as rd

    from pdfsearch_ray.pipelines.boolquery import (
        SLOP_SCALE,
        sloppy_weights_from_index,
    )
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.query import BM25Index

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": ["alpha beta pad pad pad", "alpha pad pad beta pad"],
        "lang": ["en", "en"],
    })
    src = tmp_path / "docs.parquet"
    import pyarrow.parquet as pq
    pq.write_table(t, src)
    out = tmp_path / "idx"
    build_index(str(src), str(out), analyzer="simple", num_buckets=2)
    idx = BM25Index(str(out))
    docs, w = sloppy_weights_from_index(idx, "alpha", "beta")
    m = dict(zip(docs.astype(np.int64).tolist(), w.tolist()))
    assert m == {1: SLOP_SCALE // 1, 2: SLOP_SCALE // 3}
