"""Streaming micro-batch append (build.tail_append): each delta file
batch commits as an incremental segment; serving replicas keep the old
view until commit and pick up the new one on reload(); re-ingestion of
already-committed files is idempotent via the content-hash skip."""

import os

import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001/documents.parquet"
Q = "data processing pipeline"


def _write_delta(watch_dir, table, name):
    """Atomic landing: write tmp + rename (the documented contract)."""
    tmp = f"{watch_dir}/.{name}.tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, f"{watch_dir}/{name}")


def test_tail_append_commits_and_reload(ray_session, tmp_path):
    import ray
    import ray.data as rd

    from pdfsearch_ray.pipelines.build import build_index, tail_append
    from pdfsearch_ray.pipelines.engine import make_engine_pool
    from pdfsearch_ray.pipelines.query import BM25Index

    t = pq.read_table(SRC)
    c1, c2 = int(t.num_rows * 0.6), int(t.num_rows * 0.8)
    d = str(tmp_path / "idx")
    watch = str(tmp_path / "deltas")
    os.makedirs(watch)
    build_index(rd.from_arrow(t.slice(0, c1)), d, analyzer="en",
                num_buckets=8, lang_col="lang")

    pool = make_engine_pool(d, replicas=1)
    try:
        before = ray.get(pool[0].search.remote(Q, max_results=5,
                                               with_spans=False))

        # batch 1: no engines passed — the serving actor must keep the
        # OLD view until an explicit reload
        _write_delta(watch, t.slice(c1, c2 - c1), "delta-001.parquet")
        out1 = tail_append(d, watch, poll_sec=0.1, max_batches=1,
                           lang_col="lang")
        assert out1["commits"] == 1 and out1["n_added"] > 0
        stale = ray.get(pool[0].search.remote(Q, max_results=5,
                                              with_spans=False))
        assert [(m.doc_id, m.score) for m in stale.matches] == \
               [(m.doc_id, m.score) for m in before.matches]
        assert stale.total_matches == before.total_matches
        ray.get(pool[0].reload.remote())
        fresh = ray.get(pool[0].search.remote(Q, max_results=5,
                                              with_spans=False))
        local = BM25Index(d)
        want = local.search(Q, max_results=5, with_spans=False,
                            method="taat")
        assert [(m.doc_id, m.score) for m in fresh.matches] == \
               [(m.doc_id, m.score) for m in want.matches]
        assert fresh.total_matches == want.total_matches
        assert fresh.total_matches > before.total_matches

        # batch 2: tailer triggers the reload itself via engines=
        _write_delta(watch, t.slice(c2), "delta-002.parquet")
        out2 = tail_append(d, watch, poll_sec=0.1, max_batches=1,
                           lang_col="lang", engines=pool)
        assert out2["commits"] == 1 and out2["n_added"] > 0
        auto = ray.get(pool[0].search.remote(Q, max_results=5,
                                             with_spans=False))
        local2 = BM25Index(d)
        want2 = local2.search(Q, max_results=5, with_spans=False,
                              method="taat")
        assert [(m.doc_id, m.score) for m in auto.matches] == \
               [(m.doc_id, m.score) for m in want2.matches]

        # bitwise rebuild equivalence: appended index == from-scratch
        # build over the full corpus (same N/df/avgdl => same scores)
        d2 = str(tmp_path / "idx_full")
        build_index(SRC, d2, analyzer="en", num_buckets=8,
                    lang_col="lang")
        full = BM25Index(d2).search(Q, max_results=5, with_spans=False,
                                    method="taat")
        assert [(m.doc_id, m.score) for m in auto.matches] == \
               [(m.doc_id, m.score) for m in full.matches]
        assert auto.total_matches == full.total_matches

        # idempotency: wipe the tail state and re-run over the same
        # files — the content-hash skip must add zero docs
        os.remove(f"{d}/.tail_state.json")
        out3 = tail_append(d, watch, poll_sec=0.1, max_batches=1,
                           lang_col="lang")
        assert out3["commits"] == 1 and out3["n_added"] == 0
        n_before = local2.manifest.n_docs
        assert BM25Index(d).manifest.n_docs == n_before

        # idle exit with nothing new
        out4 = tail_append(d, watch, poll_sec=0.05, idle_exit_sec=0.15,
                           lang_col="lang")
        assert out4["commits"] == 0
    finally:
        for a in pool:
            ray.kill(a)


def test_tail_append_compact_every(ray_session, tmp_path):
    """compact_every folds accumulated segments back into a single base;
    post-compaction results stay identical to a from-scratch build and
    serving replicas see them after the tailer's reload."""
    import ray
    import ray.data as rd

    from pdfsearch_ray.pipelines.build import build_index, tail_append
    from pdfsearch_ray.pipelines.engine import make_engine_pool
    from pdfsearch_ray.pipelines.query import BM25Index
    from pdfsearch_ray.state.manifest import IndexManifest

    t = pq.read_table(SRC)
    c1, c2 = int(t.num_rows * 0.5), int(t.num_rows * 0.75)
    d = str(tmp_path / "idx")
    watch = str(tmp_path / "deltas")
    os.makedirs(watch)
    build_index(rd.from_arrow(t.slice(0, c1)), d, analyzer="en",
                num_buckets=8, lang_col="lang")
    pool = make_engine_pool(d, replicas=1)
    try:
        _write_delta(watch, t.slice(c1, c2 - c1), "d1.parquet")
        out1 = tail_append(d, watch, poll_sec=0.05, max_batches=1,
                           lang_col="lang", compact_every=2, engines=pool)
        assert out1["compactions"] == 0  # only 1 segment so far
        assert len([s for s in IndexManifest.load(d).segments
                    if s["name"] != "base"]) == 1

        _write_delta(watch, t.slice(c2), "d2.parquet")
        out2 = tail_append(d, watch, poll_sec=0.05, max_batches=1,
                           lang_col="lang", compact_every=2, engines=pool)
        assert out2["compactions"] == 1
        m = IndexManifest.load(d)
        assert [s for s in m.segments if s["name"] != "base"] == []
        assert not os.path.isdir(d + ".old")  # cleaned after reload

        # identical to a from-scratch build over the full corpus
        d2 = str(tmp_path / "full")
        build_index(SRC, d2, analyzer="en", num_buckets=8, lang_col="lang")
        got = ray.get(pool[0].search.remote(Q, max_results=5,
                                            with_spans=False))
        want = BM25Index(d2).search(Q, max_results=5, with_spans=False,
                                    method="taat")
        assert [(x.doc_id, x.score) for x in got.matches] == \
               [(x.doc_id, x.score) for x in want.matches]
        assert got.total_matches == want.total_matches
    finally:
        for a in pool:
            ray.kill(a)


def test_tail_append_idle_flushes_residual_batch(ray_session, tmp_path):
    """A pending batch smaller than min_files is flushed when the idle
    deadline arrives instead of being stranded (round-4 advice item)."""
    import ray.data as rd

    from pdfsearch_ray.pipelines.build import build_index, tail_append
    from pdfsearch_ray.pipelines.query import BM25Index

    t = pq.read_table(SRC)
    cut = int(t.num_rows * 0.8)
    d = str(tmp_path / "idx")
    watch = str(tmp_path / "deltas")
    os.makedirs(watch)
    build_index(rd.from_arrow(t.slice(0, cut)), d, analyzer="en",
                num_buckets=8, lang_col="lang")
    n0 = BM25Index(d).manifest.n_docs

    # ONE delta file with min_files=3: never reaches the batch floor,
    # must still commit at the idle deadline
    _write_delta(watch, t.slice(cut), "delta-001.parquet")
    out = tail_append(d, watch, poll_sec=0.05, idle_exit_sec=0.3,
                      min_files=3, lang_col="lang")
    assert out["commits"] == 1 and out["n_added"] > 0
    assert BM25Index(d).manifest.n_docs > n0
