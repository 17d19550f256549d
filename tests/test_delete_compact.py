"""Tombstone deletes (bleve_pdf.go:166-175 remove() analog, Lucene lazy
semantics) and compact_index (scorch segment-merge analog)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001/documents.parquet"
Q = "data processing pipeline"


@pytest.fixture()
def built(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.build import build_index

    d = str(tmp_path / "idx")
    build_index(SF, d, num_buckets=8, analyzer="en", lang_col="lang")
    return d


def test_delete_excludes_hits_both_methods(built):
    from pdfsearch_ray.pipelines.build import delete_docs
    from pdfsearch_ray.pipelines.query import BM25Index

    before = BM25Index(built)
    ms0 = before.search(Q, max_results=5, with_spans=False)
    victims = [m.doc_id for m in ms0.matches[:2]]
    res = delete_docs(built, doc_ids=victims)
    assert res["n_new"] == 2

    idx = BM25Index(built)
    for method in ("taat", "maxscore"):
        ms = idx.search(Q, max_results=5, with_spans=False, method=method)
        got = [m.doc_id for m in ms.matches]
        assert not set(victims) & set(got), method
    # lazy semantics: surviving docs keep their pre-delete scores
    # (stats unchanged until compaction)
    surv = {m.doc_id: m.score for m in ms0.matches if m.doc_id not in victims}
    after = {m.doc_id: m.score
             for m in idx.search(Q, max_results=5, with_spans=False).matches}
    for did, s in surv.items():
        assert after[did] == s
    # exact path counts exclude tombstoned docs
    assert (idx.search(Q, max_results=5, with_spans=False).total_matches
            == ms0.total_matches - 2)


def test_delete_by_hash_and_idempotence(built):
    from pdfsearch_ray.pipelines.build import delete_docs
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(built)
    ms = idx.search(Q, max_results=1, with_spans=False)
    victim = ms.matches[0].doc_id
    h = (pq.read_table(f"{built}/docs", columns=["doc_id", "hash"])
         .filter(pq.filters_to_expression([("doc_id", "=", victim)]))
         ["hash"][0].as_py())
    res = delete_docs(built, hashes=[h])
    assert res["n_new"] == 1
    # deleting again is a no-op, not a second tombstone file
    res2 = delete_docs(built, hashes=[h], doc_ids=[victim])
    assert res2["n_new"] == 0 and res2["n_deleted_total"] == 1
    idx2 = BM25Index(built)
    assert victim not in [m.doc_id for m in
                          idx2.search(Q, max_results=5,
                                      with_spans=False).matches]


def test_compact_purges_and_matches_fresh_build(ray_session, tmp_path):
    """append + delete + compact == fresh single build over the
    surviving rows (bitwise scores, no segments, no tombstones)."""
    import ray.data as rd

    from pdfsearch_ray.pipelines.build import (
        append_index,
        build_index,
        compact_index,
        delete_docs,
    )
    from pdfsearch_ray.pipelines.query import BM25Index

    t = pq.read_table(SF)
    cut = int(t.num_rows * 0.6)
    inc = str(tmp_path / "inc")
    build_index(rd.from_arrow(t.slice(0, cut)), inc, num_buckets=8,
                analyzer="en", lang_col="lang")
    append_index(rd.from_arrow(t.slice(cut)), inc, lang_col="lang")

    idx = BM25Index(inc)
    victims = [m.doc_id for m in
               idx.search(Q, max_results=3, with_spans=False).matches]
    delete_docs(inc, doc_ids=victims)

    m_comp = compact_index(inc)
    assert m_comp.n_docs > 0

    surviving = t.filter(
        ~np.isin(t["doc_id"].to_numpy(), np.array(victims)))
    fresh = str(tmp_path / "fresh")
    build_index(rd.from_arrow(surviving), fresh, num_buckets=8,
                analyzer="en", lang_col="lang")

    a = BM25Index(fresh)
    b = BM25Index(inc)
    assert b.manifest.segments == []
    assert b.manifest.tombstones == []
    assert a.manifest.n_docs == b.manifest.n_docs
    assert a.manifest.avgdl == b.manifest.avgdl
    for q in (Q, "stream window", "merge", "zzz_nohit"):
        for method in ("taat", "maxscore"):
            x = a.search(q, max_results=10, with_spans=False, method=method)
            y = b.search(q, max_results=10, with_spans=False, method=method)
            assert [(m.doc_id, m.score) for m in x.matches] == [
                (m.doc_id, m.score) for m in y.matches], (q, method)


def test_deleted_content_can_be_reappended(built):
    """Delete then re-append the same content under a NEW doc_id — the
    known-hash skip must not treat tombstoned content as indexed."""
    import ray.data as rd

    from pdfsearch_ray.pipelines.build import append_index, delete_docs
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(built)
    victim = idx.search(Q, max_results=1, with_spans=False).matches[0]
    delete_docs(built, doc_ids=[victim.doc_id])

    docs = pq.read_table(f"{built}/docs", columns=["doc_id", "text", "lang"])
    row = docs.filter(
        pq.filters_to_expression([("doc_id", "=", victim.doc_id)]))
    new_id = int(pq.read_table(f"{built}/docs", columns=["doc_id"])
                 ["doc_id"].to_numpy().max()) + 1
    import pyarrow as pa

    readd = pa.table({
        "doc_id": pa.array([new_id], type=pa.int64()),
        "text": row["text"],
        "lang": row["lang"],
    })
    res = append_index(rd.from_arrow(readd), built, lang_col="lang")
    assert res["n_added"] == 1
    idx2 = BM25Index(built)
    got = [m.doc_id for m in idx2.search(Q, max_results=10,
                                         with_spans=False).matches]
    assert new_id in got and victim.doc_id not in got


def test_compact_recovers_interrupted_swap(built):
    """A crash between compact's two swap renames leaves only the .old
    tree; the next compact_index call must restore and complete."""
    import os
    import shutil

    from pdfsearch_ray.pipelines.build import compact_index
    from pdfsearch_ray.pipelines.query import BM25Index

    before = BM25Index(built).search(Q, max_results=5, with_spans=False)
    # simulate the crash window: index_dir moved away, tmp half-present
    os.rename(built, built + ".old")
    os.makedirs(built + ".compact.tmp/docs", exist_ok=True)
    m = compact_index(built)
    assert m.n_docs > 0
    assert not os.path.exists(built + ".old")
    after = BM25Index(built).search(Q, max_results=5, with_spans=False)
    assert [(x.doc_id, x.score) for x in before.matches] == [
        (x.doc_id, x.score) for x in after.matches]
    shutil.rmtree(built + ".compact.tmp", ignore_errors=True)
