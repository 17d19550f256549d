"""Path matching and deterministic work-order helpers (F8 + T4/T5 parity).

* ``common_suffix`` / ``longest_matching_suffix`` / ``FileFinder`` — the
  reference's fuzzy path matcher for relocated corpora
  (/root/reference/examples/cmd_utils/path_utils.go:173-226): find the
  stored path that best matches a moved file by longest common suffix,
  disambiguating duplicate basenames.

* ``fnv_shuffle`` — the reference's deterministic, correlation-free
  ordering (path_utils.go:104-127 ``Shuffle``): sort by FNV-1a hash of
  the key, ties (hash collisions) by the reversed string.  Used wherever
  a reproducible-but-uncorrelated-with-lexicographic order is needed
  (sampling, scheduling head randomization) WITHOUT ``random`` — the
  order is a pure function of the key set, so re-runs and resumes see
  the identical sequence.

* ``size_banded_order`` — the reference's work-queue balancing
  (path_utils.go:55-101): big items first (so the long tasks start
  early and can't become the last-wave straggler), small items last,
  with a deterministically shuffled head so several workers get a big
  item immediately instead of all big items landing on one.  The
  round-1 engine dropped this as "subsumed by salting" (SURVEY T4/T5);
  it is reinstated here for the EXTRACT schedule, where per-partition
  sizes are known from parquet footers and last-wave quantization is a
  measured scaling cost (BASELINE.md).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence, TypeVar

from .hashing import fnv1a64_str

T = TypeVar("T")


def common_suffix(s1: str, s2: str) -> int:
    """Number of characters in the common suffix of s1 and s2."""
    n = min(len(s1), len(s2))
    i = 0
    while i < n and s1[len(s1) - 1 - i] == s2[len(s2) - 1 - i]:
        i += 1
    return i


def longest_matching_suffix(s: str, candidates: Sequence[str]) -> str:
    """The candidate with the longest common suffix with ``s``.

    Candidates are pre-ordered by (length, lexicographic) so ties break
    deterministically toward the shortest/lexicographically-first
    candidate, matching path_utils.go:194-216 (stable sort + strict >)."""
    ordered = sorted(candidates, key=lambda c: (len(c), c))
    best_s, best_n = "", 0
    for c in ordered:
        n = common_suffix(c, s)
        if n > best_n:
            best_s, best_n = c, n
    return best_s


class FileFinder:
    """Map a (possibly relocated) path to the best match in a corpus.

    Exact-basename bucket first; among duplicate basenames the longest
    matching suffix wins (path_utils.go:146-190).  Returns "" when no
    file with that basename exists."""

    def __init__(self, path_list: Sequence[str]):
        self._name_paths: dict[str, list[str]] = {}
        for p in path_list:
            self._name_paths.setdefault(os.path.basename(p), []).append(p)

    def find(self, fullpath: str) -> str:
        paths = self._name_paths.get(os.path.basename(fullpath))
        if not paths:
            return ""
        if len(paths) > 1:
            return longest_matching_suffix(fullpath, paths)
        return paths[0]


def fnv_shuffle(items: Sequence[T], key: Callable[[T], str]) -> list[T]:
    """Deterministic shuffle: order by FNV-1a(key), hash ties by the
    reversed key string (path_utils.go:108-127)."""
    return sorted(items, key=lambda it: (fnv1a64_str(key(it)),
                                         key(it)[::-1]))


def size_banded_order(
    items: Sequence[T],
    size_of: Callable[[T], float],
    key: Callable[[T], str],
    *,
    big_size: float,
    small_size: float,
    head: int = 100,
) -> list[T]:
    """Big-first banding with a deterministically shuffled head.

    Mirrors path_utils.go:55-101: band items into big (> big_size),
    small (< small_size) and medium; order big + medium + small; then
    deterministically shuffle the first max(head, 4*|big|) items
    (capped at |items|/5) so the initial wave spreads big items across
    workers.  Band membership and the shuffle are pure functions of the
    item keys/sizes — resume-safe."""
    big = [it for it in items if size_of(it) > big_size]
    small = [it for it in items if size_of(it) < small_size]
    medium = [it for it in items
              if small_size <= size_of(it) <= big_size]
    ordered = big + medium + small
    if len(ordered) > head:
        n = max(head, 4 * len(big))
        n = min(n, len(ordered) // 5) if len(ordered) // 5 > 0 else n
        if n > 0:
            ordered = fnv_shuffle(ordered[:n], key) + ordered[n:]
    return ordered
