"""QueryEngine actor pool must answer identically to a driver-side
BM25Index, keep state warm across calls, and preserve input order."""

SRC = "/root/testdata/sf0.001/documents.parquet"

QUERIES = ["data processing pipeline", "stream window", "query engine",
           "zzznope", "", "processing data"]


def test_engine_pool_matches_driver(ray_session, tmp_path):
    import ray

    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.engine import make_engine_pool, search_many
    from pdfsearch_ray.pipelines.query import BM25Index

    d = str(tmp_path / "idx")
    build_index(SRC, d, analyzer="en", num_buckets=8)
    local = BM25Index(d)
    expected = [local.search(q, max_results=10, with_spans=True)
                for q in QUERIES]

    pool = make_engine_pool(d, replicas=2)
    try:
        got = search_many(pool, QUERIES, max_results=10, with_spans=True)
        assert len(got) == len(QUERIES)
        for e, g, q in zip(expected, got, QUERIES):
            assert g.total_matches == e.total_matches, q
            assert [(m.doc_id, round(m.score, 12)) for m in g.matches] == \
                   [(m.doc_id, round(m.score, 12)) for m in e.matches], q
            assert [m.spans for m in g.matches] == [m.spans for m in e.matches]
        # warm() returns a growing term cache — state persists in-actor
        n1 = ray.get(pool[0].warm.remote(["engine"]))
        n2 = ray.get(pool[0].warm.remote(["engine", "window"]))
        assert n2 >= n1
    finally:
        for a in pool:
            ray.kill(a)


def test_search_many_ephemeral_pool(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.engine import search_many
    from pdfsearch_ray.pipelines.query import BM25Index

    d = str(tmp_path / "idx")
    build_index(SRC, d, analyzer="en", num_buckets=8)
    got = search_many(d, ["data", "engine"], replicas=1, max_results=5)
    local = BM25Index(d)
    for g, q in zip(got, ["data", "engine"]):
        e = local.search(q, max_results=5)
        assert [m.doc_id for m in g.matches] == [m.doc_id for m in e.matches]


def test_engine_reload_picks_up_append_and_delete(ray_session, tmp_path):
    """A serving actor reload() sees segments/tombstones committed after
    it was constructed."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from pdfsearch_ray.pipelines.build import (
        append_index,
        build_index,
        delete_docs,
    )
    from pdfsearch_ray.pipelines.engine import make_engine_pool
    from pdfsearch_ray.pipelines.query import BM25Index

    t = pq.read_table(SRC)
    cut = int(t.num_rows * 0.7)
    d = str(tmp_path / "idx")
    build_index(rd.from_arrow(t.slice(0, cut)), d, analyzer="en",
                num_buckets=8, lang_col="lang")
    pool = make_engine_pool(d, replicas=1)
    try:
        before = ray.get(pool[0].search.remote(
            "data processing pipeline", max_results=5, with_spans=False))
        append_index(rd.from_arrow(t.slice(cut)), d, lang_col="lang")
        victim = before.matches[0].doc_id
        delete_docs(d, doc_ids=[victim])
        # stale handle still serves the old view
        stale = ray.get(pool[0].search.remote(
            "data processing pipeline", max_results=5, with_spans=False))
        assert victim in [m.doc_id for m in stale.matches]
        ray.get(pool[0].reload.remote())
        fresh = ray.get(pool[0].search.remote(
            "data processing pipeline", max_results=5, with_spans=False))
        local = BM25Index(d)
        want = local.search("data processing pipeline", max_results=5,
                            with_spans=False)
        assert [(m.doc_id, m.score) for m in fresh.matches] == [
            (m.doc_id, m.score) for m in want.matches]
        assert victim not in [m.doc_id for m in fresh.matches]
    finally:
        for a in pool:
            ray.kill(a)


def test_sharded_engine_rank_identity_two_pool_sizes(ray_session, tmp_path):
    """Scatter-gather doc-range sharding must reproduce unsharded TAAT
    ranks, scores, spans AND exact total_matches at any shard count."""
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.engine import ShardedEngine, compute_doc_ranges
    from pdfsearch_ray.pipelines.query import BM25Index

    d = str(tmp_path / "idx")
    build_index(SRC, d, analyzer="en", num_buckets=8)
    local = BM25Index(d)
    expected = {q: local.search(q, max_results=10, with_spans=True,
                                method="taat") for q in QUERIES}
    for n_shards in (2, 5):
        ranges = compute_doc_ranges(d, n_shards)
        assert ranges[0][0] < 0 and ranges[-1][1] > (1 << 61)
        for (a, b), (c, e) in zip(ranges, ranges[1:]):
            assert b == c, "ranges must tile the id space"
        eng = ShardedEngine(d, n_shards=n_shards, num_cpus=0.25)
        try:
            for q in QUERIES:
                g = eng.search(q, max_results=10, with_spans=True)
                e = expected[q]
                assert g.total_matches == e.total_matches, (q, n_shards)
                assert [(m.doc_id, m.score) for m in g.matches] == \
                       [(m.doc_id, m.score) for m in e.matches], (q, n_shards)
                assert [m.spans for m in g.matches] == \
                       [m.spans for m in e.matches], (q, n_shards)
        finally:
            eng.shutdown()


def test_sharded_engine_sees_appended_segment(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from pdfsearch_ray.pipelines.build import append_index, build_index
    from pdfsearch_ray.pipelines.engine import ShardedEngine
    from pdfsearch_ray.pipelines.query import BM25Index

    t = pq.read_table(SRC)
    cut = int(t.num_rows * 0.6)
    d = str(tmp_path / "idx")
    build_index(rd.from_arrow(t.slice(0, cut)), d, analyzer="en",
                num_buckets=8, lang_col="lang")
    append_index(rd.from_arrow(t.slice(cut)), d, lang_col="lang")
    local = BM25Index(d)
    eng = ShardedEngine(d, n_shards=3, num_cpus=0.25)
    try:
        for q in ("data processing pipeline", "information"):
            e = local.search(q, max_results=10, method="taat")
            g = eng.search(q, max_results=10)
            assert g.total_matches == e.total_matches
            assert [(m.doc_id, m.score) for m in g.matches] == \
                   [(m.doc_id, m.score) for m in e.matches]
    finally:
        eng.shutdown()


def test_sharded_engine_respects_tombstones(ray_session, tmp_path):
    """Doc-range shards must exclude deleted docs exactly like the
    single-process TAAT path (the _score_range path filters the same
    tombstone set)."""
    from pdfsearch_ray.pipelines.build import build_index, delete_docs
    from pdfsearch_ray.pipelines.engine import ShardedEngine
    from pdfsearch_ray.pipelines.query import BM25Index

    d = str(tmp_path / "idx")
    build_index(SRC, d, analyzer="en", num_buckets=8)
    base = BM25Index(d).search("data processing pipeline",
                               max_results=5, with_spans=False)
    victim = base.matches[0].doc_id
    delete_docs(d, doc_ids=[victim])
    local = BM25Index(d)
    eng = ShardedEngine(d, n_shards=3, num_cpus=0.25)
    try:
        e = local.search("data processing pipeline", max_results=5,
                         with_spans=False, method="taat")
        g = eng.search("data processing pipeline", max_results=5,
                       with_spans=False)
        assert victim not in [m.doc_id for m in g.matches]
        assert [(m.doc_id, m.score) for m in g.matches] == \
               [(m.doc_id, m.score) for m in e.matches]
        assert g.total_matches == e.total_matches
    finally:
        eng.shutdown()


def test_sharded_search_many_order_and_identity(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.engine import ShardedEngine

    d = str(tmp_path / "idx")
    build_index(SRC, d, analyzer="en", num_buckets=8)
    eng = ShardedEngine(d, n_shards=2, num_cpus=0.25)
    try:
        batch = eng.search_many(list(QUERIES), max_results=10)
        assert len(batch) == len(QUERIES)
        for q, got in zip(QUERIES, batch):
            one = eng.search(q, max_results=10)
            assert got.total_matches == one.total_matches, q
            assert [(m.doc_id, m.score) for m in got.matches] == \
                   [(m.doc_id, m.score) for m in one.matches], q
            assert [m.spans for m in got.matches] == \
                   [m.spans for m in one.matches], q
    finally:
        eng.shutdown()
