"""Advanced disjunctive scoring (pipelines/scorequery.py): oracle
equivalence for msm / dismax / boosts, plus the degenerate-parameter
identities that pin the blend algebra to the plain OR/AND gates
(the property the driver hash can't localize)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def _idx():
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    return BM25Index(simple_index_cached(SF))


@pytest.mark.parametrize("gate,sql", [
    ("bm25_msm_topk", "bm25_msm_sql"),
    ("dismax_topk", "dismax_sql"),
    ("boosted_topk", "boosted_sql"),
])
def test_matches_oracle(ray_session, gate, sql):
    from pdfsearch_ray.pipelines import scorequery as S

    got = getattr(S, gate)(SF).to_pandas().reset_index(drop=True)
    want = _con().execute(getattr(S, sql)()).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert np.allclose(got[c], want[c], atol=1e-9), c
        else:
            assert (got[c].values ==
                    want[c].astype(got[c].dtype).values).all(), c


def test_msm_degenerates_to_or_and_and(ray_session):
    """m=1 keeps exactly the OR candidate set with OR scores; m=n keeps
    exactly the AND candidate set."""
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import scorequery as S
    from pdfsearch_ray.pipelines.boolquery import score_terms_conjunctive

    idx = _idx()
    terms = analyze_simple("fast scan merge")
    union, dense = S.aligned_contributions(S.per_term_scores(idx, terms))
    mat = np.stack(list(dense.values()))
    n_matched = (mat > 0).sum(axis=0)

    or_ids, or_sc = idx.score_terms(sorted(set(terms)))
    assert (union[n_matched >= 1] == or_ids).all()
    assert np.allclose(mat.sum(axis=0)[n_matched >= 1], or_sc)

    and_ids, and_sc = score_terms_conjunctive(idx, terms)
    keep = n_matched >= len(set(terms))
    assert (union[keep] == and_ids).all()  # intersect1d → sorted ids
    assert np.allclose(mat[:, keep].sum(axis=0), and_sc)


def test_dismax_tie_one_is_plain_sum(ray_session):
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import scorequery as S

    idx = _idx()
    terms = analyze_simple("table window query")
    union, dense = S.aligned_contributions(S.per_term_scores(idx, terms))
    mat = np.stack(list(dense.values()))
    best = mat.max(axis=0)
    blended = best + 1.0 * (mat.sum(axis=0) - best)
    assert np.allclose(blended, mat.sum(axis=0))
    # and with the real tie the blend is <= the sum, >= the max
    real = best + S.DISMAX_TIE * (mat.sum(axis=0) - best)
    assert (real <= mat.sum(axis=0) + 1e-12).all()
    assert (real >= best - 1e-12).all()


def test_boost_parse_and_identity(ray_session):
    from pdfsearch_ray.pipelines import scorequery as S

    b = S.parse_boost_query("fast^2 scan fast^0.5 hash^0")
    assert b == {"fast": 2.5, "scan": 1.0, "hash": 0.0}

    # all-ones boosts reproduce plain OR scores
    idx = _idx()
    terms = ["customer", "vector", "slow"]
    union, dense = S.aligned_contributions(S.per_term_scores(idx, terms))
    score = sum(dense.values())
    or_ids, or_sc = idx.score_terms(terms)
    assert (union == or_ids).all()
    assert np.allclose(score, or_sc)


def test_synonym_matches_oracle(ray_session):
    from pdfsearch_ray.pipelines import scorequery as S

    got = S.synonym_topk(SF).to_pandas().reset_index(drop=True)
    want = _con().execute(S.synonym_sql()).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert np.allclose(got[c], want[c], atol=1e-9), c
        else:
            assert (got[c].values ==
                    want[c].astype(got[c].dtype).values).all(), c


def test_synonym_singleton_groups_equal_plain_or(ray_session):
    """A query whose tokens are all outside the thesaurus scores
    identically to the plain disjunctive BM25 path."""
    from pdfsearch_ray.pipelines import scorequery as S

    idx = _idx()
    groups = S.query_synonym_groups("window scan table")
    assert all(len(g) == 1 for g in groups)
    ids, sc = S.score_synonym_groups(idx, groups)
    or_ids, or_sc = idx.score_terms([g[0] for g in groups])
    assert (ids == or_ids).all()
    # same formula, different kernel association order -> 1e-12, not ==
    assert np.allclose(sc, or_sc, rtol=0, atol=1e-12)


def test_synonym_blended_df_tames_rare_synonym(ray_session, tmp_path):
    """Planted corpus: 'fast' in docs 1..8, its synonym 'quick' only in
    doc 9, all docs the same length.  A plain OR rewrite gives doc 9
    the huge idf of the df=1 term and ranks it FIRST; the blended
    class df (9) scores all nine docs EQUALLY — the SynonymQuery
    property this gate exists for."""
    import pyarrow as pa
    import ray.data as rd

    from pdfsearch_ray.pipelines import scorequery as S
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.query import BM25Index

    rows = [{"doc_id": i, "text": "fast filler words here", "lang": "en"}
            for i in range(1, 9)]
    rows.append({"doc_id": 9, "text": "quick filler words here",
                 "lang": "en"})
    d = str(tmp_path / "syn")
    build_index(rd.from_arrow(pa.Table.from_pylist(rows)), d,
                analyzer="simple", lang_col="lang", num_buckets=4)
    idx = BM25Index(d)

    # plain OR rewrite: doc 9 strictly outranks every 'fast' doc
    or_ids, or_sc = idx.score_terms(["fast", "quick"])
    by_id = dict(zip(or_ids.astype(np.int64).tolist(), or_sc.tolist()))
    assert all(by_id[9] > by_id[i] for i in range(1, 9))

    # blended: one class, df=9 -> all nine docs tie exactly
    ids, sc = S.score_synonym_groups(idx, [("fast", "quick", "rapid")])
    assert ids.size == 9
    assert np.allclose(sc, sc[0], rtol=0, atol=1e-12)
    # and the common score is the hand formula at df=9, tf=1
    m = idx.manifest
    idf = np.log(1 + (m.n_docs - 9 + 0.5) / (9 + 0.5))
    wdl = 1.0 / (1.0 + m.k1 * (1 - m.b + m.b * 4.0 / m.avgdl))
    assert np.allclose(sc[0], idf * wdl)


def test_recency_boost_oracle_and_decay(ray_session):
    """Recency function_score: oracle equivalence at sf0.001; every
    boosted score equals the raw BM25 contribution times the decay
    weight of the doc's synthesized age."""
    import duckdb
    import numpy as np

    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.functions.hashing import mix64
    from pdfsearch_ray.pipelines import scorequery as SQ
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    sf = "/root/testdata/sf0.001"
    got = SQ.recency_boost_topk(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(SQ.recency_boost_sql()).df()
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

    # decay law: boosted == raw_bm25 * half/(half+age), age from mix64
    idx = BM25Index(simple_index_cached(sf))
    for q, g in got.groupby("query"):
        ids, sc = idx.score_terms(sorted(set(analyze_simple(q))))
        raw = dict(zip(ids.astype(np.int64).tolist(), sc.tolist()))
        for _, row in g.iterrows():
            # int() BEFORE the modulo: np.uint64 % python-int promotes
            # to float64 and mangles the high bits
            age = int(mix64(np.array([int(row["doc_id"])],
                                     dtype=np.uint64))[0]) % SQ.RECENCY_MOD
            assert age == row["age_days"]
            w = SQ.RECENCY_HALF / (SQ.RECENCY_HALF + float(age))
            assert abs(raw[int(row["doc_id"])] * w - row["score"]) < 1e-6
