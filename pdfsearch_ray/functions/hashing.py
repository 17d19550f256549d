"""Deterministic hashes used for identity and partitioning.

* sha256-prefix content hash — doc identity, the rule of the reference's
  `createFileDesc` (internal/utils/file_utils.go:37-57, FileHashSize=10).
* FNV-1a — partition/salt keys, the reference's deterministic shuffle key
  (examples/cmd_utils/path_utils.go:129-135).  Never use Python's builtin
  ``hash`` for placement: it is process-salted and would break the
  deterministic doc_id / bucket assignment across workers.
"""

from __future__ import annotations

import hashlib

import numpy as np

FILE_HASH_SIZE = 10  # hex chars, matching FileHashSize (file_utils.go:37)

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = 0xFFFFFFFFFFFFFFFF


def content_hash(data: bytes) -> str:
    """sha256 hex digest truncated to FILE_HASH_SIZE chars."""
    return hashlib.sha256(data).hexdigest()[:FILE_HASH_SIZE]


def fnv1a64(data: bytes) -> int:
    h = _FNV_OFFSET
    for byte in data:
        h = ((h ^ byte) * _FNV_PRIME) & _MASK
    return h


def fnv1a64_str(s: str) -> int:
    return fnv1a64(s.encode("utf-8"))


# Vectorized 64-bit mix for integer ids (splitmix64 finalizer) — used to
# salt hot-term postings by doc_id without a Python loop.
def mix64(ids: np.ndarray) -> np.ndarray:
    x = ids.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))
