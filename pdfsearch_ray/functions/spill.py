"""Shuffle-spill directory placement.

Every disk-mediated exchange in the engine (hash_join buckets, the
dedup/tfidf/knn/session spills, ephemeral ANN index layouts, the
fulltext gate builds) materializes intermediate parquet under a work
dir that BOTH the writing and the reading tasks must reach.  On the
single-node sandbox a tempdir is fine; on a real multi-node cluster the
spill root must live on shared storage (NFS / object store mount) or
the per-bucket readers land on nodes that cannot see the writers'
files.

``spill_dir(prefix)`` is the single knob: it honors
``PDFSEARCH_SPILL_ROOT`` (e.g. ``/mnt/shared/spill``) and falls back to
the system tempdir.  The root is read per call, so a driver can set it
after import; cleanup stays the caller's responsibility exactly as with
``tempfile.mkdtemp``.
"""

from __future__ import annotations

import os
import tempfile

ENV_VAR = "PDFSEARCH_SPILL_ROOT"


def spill_dir(prefix: str) -> str:
    """Create and return a fresh spill work dir (mkdtemp semantics),
    under $PDFSEARCH_SPILL_ROOT when set (created if missing)."""
    root = os.environ.get(ENV_VAR)
    if root:
        os.makedirs(root, exist_ok=True)
        return tempfile.mkdtemp(prefix=prefix, dir=root)
    return tempfile.mkdtemp(prefix=prefix)
