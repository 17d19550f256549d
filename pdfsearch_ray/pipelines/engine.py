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
    Match) serialize as-is."""

    def __init__(self, index_dir: str):
        self.idx = BM25Index(index_dir)

    def search(self, query: str, **kwargs) -> MatchSet:
        return self.idx.search(query, **kwargs)

    def warm(self, queries: list[str]) -> int:
        """Pre-load term caches for a query set; returns #terms cached."""
        for q in queries:
            self.idx.search(q, max_results=1, with_spans=False)
        return len(self.idx._term_cache)

    def reload(self) -> float:
        """Re-open the index handle — picks up appended segments and
        tombstones committed since construction (append/delete only
        ever ADD manifest-listed files, so a reload is always safe
        mid-serving).  Returns the manifest built_at."""
        self.idx = BM25Index(self.idx.index_dir,
                             verify_checksums=self.idx.verify_checksums)
        return self.idx.manifest.built_at


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
