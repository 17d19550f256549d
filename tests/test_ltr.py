"""Linear LTR re-rank (pipelines/ltr.py) pins."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_bm25_only_weights_degenerate_to_retrieval(ray_session):
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.ltr import LTR_K, LTR_QUERIES, \
        ltr_rerank_topk
    from pdfsearch_ray.pipelines.query import BM25Index

    got = ltr_rerank_topk(SF, w=(1.0, 0.0, 0.0)).to_pandas()
    idx = BM25Index(simple_index_cached(SF))
    for q in sorted(LTR_QUERIES):
        ids, sc = idx.score_terms(sorted(set(analyze_simple(q))))
        sc = np.round(sc, 6)
        ids64 = ids.astype(np.int64)
        want = ids64[np.lexsort((ids64, -sc))[:LTR_K]].tolist()
        g = got[got["query"] == q].sort_values("rank")
        assert g["doc_id"].tolist() == want, q


def test_feature_weights_are_load_bearing(ray_session):
    """Freshness and coverage must each change some ranking vs the
    bm25-only model — else the features are inert."""
    from pdfsearch_ray.pipelines.ltr import ltr_rerank_topk

    base = ltr_rerank_topk(SF, w=(1.0, 0.0, 0.0)).to_pandas()
    full = ltr_rerank_topk(SF).to_pandas()
    diff = False
    for q in sorted(set(base["query"])):
        a = base[base["query"] == q].sort_values("rank")["doc_id"]
        b = full[full["query"] == q].sort_values("rank")["doc_id"]
        if a.tolist() != b.tolist():
            diff = True
    assert diff
    # coverage feature alone orders by matched-term count first
    cov = ltr_rerank_topk(SF, w=(0.0, 0.0, 1.0)).to_pandas()
    for q, g in cov.groupby("query"):
        nm = g.sort_values("rank")["n_matched"].to_numpy()
        assert (np.diff(nm) <= 0).all(), q
