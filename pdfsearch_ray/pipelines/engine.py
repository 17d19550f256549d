"""Distributed query serving: a pool of QueryEngine actors, each holding
a warm BM25Index handle (ST3 done properly — the reference reopens all
query-time state from disk per call and its author calls that slow,
bleve_pdf.go:482-484; here the manifest, footer indexes, posting/term
caches and doc row-group index live in actor memory across calls).

``search_many`` fans a query batch across the pool round-robin — the
single-node stand-in for a fleet of engine replicas behind a router;
at cluster scale the same actors are placed one-per-node against shared
index storage and the pool IS the serving tier.
"""

from __future__ import annotations

import ray

from .query import BM25Index, MatchSet


@ray.remote
class QueryEngine:
    """One serving replica: constructs the index handle once, then
    answers searches from warm caches.  dataclass results (MatchSet /
    Match) serialize as-is.

    A small LRU RESULT cache sits in front of the scorer (every
    production engine's request cache): keyed by (index version, query,
    kwargs), where version = the manifest's built_at — so entries can
    never survive a reload that picked up appended segments or
    tombstones (reload also drops the map outright to free memory).
    Identical repeated queries — the head of every real query
    distribution — skip scoring entirely."""

    def __init__(self, index_dir: str, *, result_cache_size: int = 256):
        from collections import OrderedDict

        self.idx = BM25Index(index_dir)
        self._rc: "OrderedDict[tuple, MatchSet]" = OrderedDict()
        self._rc_size = int(result_cache_size)
        self.cache_stats = {"hits": 0, "misses": 0}

    def search(self, query: str, **kwargs) -> MatchSet:
        key = (self.idx.manifest.built_at, query,
               tuple(sorted(kwargs.items())))
        hit = self._rc.get(key)
        if hit is not None:
            self._rc.move_to_end(key)
            self.cache_stats["hits"] += 1
            return hit
        self.cache_stats["misses"] += 1
        out = self.idx.search(query, **kwargs)
        self._rc[key] = out
        if len(self._rc) > self._rc_size:
            self._rc.popitem(last=False)
        return out

    def result_cache_stats(self) -> dict:
        return dict(self.cache_stats, size=len(self._rc))

    def warm(self, queries: list[str]) -> int:
        """Pre-load term caches for a query set; returns #terms cached."""
        for q in queries:
            self.idx.search(q, max_results=1, with_spans=False)
        return len(self.idx._term_cache)

    def reload(self) -> float:
        """Re-open the index handle — picks up appended segments and
        tombstones committed since construction (append/delete only
        ever ADD manifest-listed files, so a reload is always safe
        mid-serving).  Returns the manifest built_at.  The result
        cache is dropped: its version key already fences stale
        entries, clearing just returns the memory."""
        self.idx = BM25Index(self.idx.index_dir,
                             verify_checksums=self.idx.verify_checksums)
        self._rc.clear()
        return self.idx.manifest.built_at


@ray.remote
class ShardEngine:
    """One doc-range scoring shard for scatter-gather serving: holds a
    warm BM25Index handle OPENED WITH ITS DOC RANGE (round 4), so both
    the posting READS and the block decodes touch only row groups whose
    [first_doc, last_doc] span intersects the shard's slice — at scale
    each shard's IO is ∝ its share of the long posting lists, not the
    whole index.  df/idf stay global (a narrow term+n metadata read
    covers the pruned row groups), so scores remain bitwise-identical
    to unsharded TAAT."""

    def __init__(self, index_dir: str, lo: int, hi: int):
        self.idx = BM25Index(index_dir, doc_range=(int(lo), int(hi)))
        self.lo, self.hi = int(lo), int(hi)

    def topk(self, query: str, max_results: int):
        ids, sc, total = self.idx.topk_in_range(
            query, max_results, self.lo, self.hi)
        return ids, sc, total

    def warm(self, queries: list[str]) -> int:
        for q in queries:
            self.idx.topk_in_range(q, 1, self.lo, self.hi)
        return len(self.idx._term_cache)

    def io_stats(self) -> dict:
        return dict(self.idx.io_stats)


def compute_doc_ranges(index_dir: str, n_shards: int) -> list[tuple[int, int]]:
    """Split the index's docID space into ``n_shards`` contiguous ranges
    of ~equal row count, from docs parquet footer statistics (no data
    read).  Ranges cover all of int64 so appended segments with new id
    ranges still land in some shard."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from ..state.manifest import IndexManifest

    m = IndexManifest.load(index_dir)
    dirs = [index_dir] + [f"{index_dir}/segments/{s['name']}"
                          for s in m.segments if s["name"] != "base"]
    mins: list[tuple[int, int]] = []  # (rg_min_doc_id, rows)
    for d in dirs:
        for path in sorted(glob.glob(f"{d}/docs/*.parquet")):
            md = pq.ParquetFile(path).metadata
            idx = md.schema.to_arrow_schema().names.index("doc_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                lo = st.min if st is not None and st.min is not None else 0
                mins.append((int(lo), md.row_group(rg).num_rows))
    if not mins or n_shards <= 1:
        return [(-(1 << 62), 1 << 62)]
    mins.sort()
    rows = np.array([r for _, r in mins], dtype=np.int64)
    cum = np.cumsum(rows)
    total = int(cum[-1])
    bounds: list[int] = []
    for s in range(1, n_shards):
        target = total * s // n_shards
        j = int(np.searchsorted(cum, target))
        b = mins[min(j + 1, len(mins) - 1)][0]
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    edges = [-(1 << 62)] + bounds + [1 << 62]
    return [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]


class ShardedEngine:
    """Scatter-gather serving over doc-range shards (the reference's
    single bleve handle scaled out; SURVEY §2.6 T1 as a fan-out).

    Each query fans to every shard's ``topk_in_range`` (global idf —
    scores are bitwise-identical to unsharded TAAT, so the merged
    global top-k has identical ranks/scores; tested at 2 pool sizes in
    tests/test_engine_pool.py), then the driver lexsort-merges the
    K·shards candidates and hydrates only the final top-k through its
    own handle."""

    def __init__(self, index_dir: str, n_shards: int = 4,
                 num_cpus: float = 1.0):
        self.index_dir = index_dir
        self.ranges = compute_doc_ranges(index_dir, n_shards)
        self.shards = [
            ShardEngine.options(num_cpus=num_cpus).remote(index_dir, lo, hi)
            for lo, hi in self.ranges
        ]
        self._local = BM25Index(index_dir)  # hydration only (top-k reads)

    def warm(self, queries: list[str]) -> None:
        ray.get([s.warm.remote(queries) for s in self.shards])

    def search(self, query: str, max_results: int = 10,
               with_spans: bool = True) -> MatchSet:
        import time as _time

        import numpy as np

        t0 = _time.perf_counter()
        parts = ray.get([s.topk.remote(query, max_results)
                         for s in self.shards])
        ids = np.concatenate([p[0] for p in parts])
        sc = np.concatenate([p[1] for p in parts])
        total = sum(p[2] for p in parts)
        result = MatchSet()
        result.total_matches = int(total)
        if ids.size and max_results > 0:
            order = np.lexsort((ids, -sc))[:max_results]
            idx = self._local
            if idx.manifest.analyzer == "en":
                from .query import analyze_en

                q_terms = [tok.term for tok in analyze_en(query)]
            else:
                q_terms = idx.analyze(query)
            result.matches = idx._hydrate(q_terms, ids[order], sc[order],
                                          with_spans)
        result.search_duration = _time.perf_counter() - t0
        return result

    def search_many(self, queries: list[str], max_results: int = 10,
                    with_spans: bool = True) -> list[MatchSet]:
        """Batch scoring: ALL (query × shard) calls are in flight at
        once — per-query barriers would leave shards idle while the
        slowest one finishes; results return in input order."""
        import numpy as np

        refs = [[s.topk.remote(q, max_results) for s in self.shards]
                for q in queries]
        flat = ray.get([r for row in refs for r in row])
        n_sh = len(self.shards)
        out: list[MatchSet] = []
        for qi, q in enumerate(queries):
            parts = flat[qi * n_sh:(qi + 1) * n_sh]
            ids = np.concatenate([p[0] for p in parts])
            sc = np.concatenate([p[1] for p in parts])
            ms = MatchSet()
            ms.total_matches = int(sum(p[2] for p in parts))
            if ids.size and max_results > 0:
                order = np.lexsort((ids, -sc))[:max_results]
                idx = self._local
                if idx.manifest.analyzer == "en":
                    from .query import analyze_en

                    q_terms = [tok.term for tok in analyze_en(q)]
                else:
                    q_terms = idx.analyze(q)
                ms.matches = idx._hydrate(q_terms, ids[order], sc[order],
                                          with_spans)
            out.append(ms)
        return out

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def make_engine_pool(index_dir: str, replicas: int = 2,
                     num_cpus: float = 1.0) -> list:
    """Spin up ``replicas`` QueryEngine actors over one index dir."""
    return [
        QueryEngine.options(num_cpus=num_cpus).remote(index_dir)
        for _ in range(replicas)
    ]


def search_many(
    pool_or_index_dir,
    queries: list[str],
    *,
    replicas: int = 2,
    **search_kwargs,
) -> list[MatchSet]:
    """Score a query batch across an engine pool; results in input order.

    Pass either an existing pool from ``make_engine_pool`` (reuse across
    batches — the normal serving shape) or an index dir (ephemeral pool,
    torn down on return)."""
    own_pool = isinstance(pool_or_index_dir, str)
    pool = (make_engine_pool(pool_or_index_dir, replicas)
            if own_pool else pool_or_index_dir)
    try:
        refs = [
            pool[i % len(pool)].search.remote(q, **search_kwargs)
            for i, q in enumerate(queries)
        ]
        return ray.get(refs)
    finally:
        if own_pool:
            for a in pool:
                ray.kill(a)
