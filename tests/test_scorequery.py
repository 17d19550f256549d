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
