"""Small collection utilities, parity with the reference's
internal/utils/collections.go (D3/T6/D1): sorted-int set algebra,
min/max scan, first-occurrence uniques.  Vectorized over numpy; used by
tooling and result post-processing, not the hot pipeline."""

from __future__ import annotations

import numpy as np


def int_union(a, b) -> np.ndarray:
    return np.union1d(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64))


def int_intersection(a, b) -> np.ndarray:
    return np.intersect1d(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64))


def int_difference(a, b) -> np.ndarray:
    return np.setdiff1d(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64))


def int_symmetric_difference(a, b) -> np.ndarray:
    return np.setxor1d(np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64))


def min_max(values) -> tuple[int, int]:
    arr = np.asarray(values)
    if arr.size == 0:
        raise ValueError("min_max of empty sequence")
    return int(arr.min()), int(arr.max())


def string_uniques(values) -> list[str]:
    """Exact dedup preserving first-occurrence order (StringUniques,
    utils/collections.go:117-128)."""
    seen: set[str] = set()
    out: list[str] = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def truncate(text: str, n: int) -> str:
    """First-n-chars helper (truncate, search_pdfs.go:244-250)."""
    return text if len(text) <= n else text[:n]
