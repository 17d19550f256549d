"""Small table/Dataset utilities shared by the pipelines."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def strip_schema_metadata(ds: rd.Dataset) -> rd.Dataset:
    """Drop schema-level metadata from every block, 1:1 (zero-copy).

    Parquet written by pandas carries a ``pandas`` schema-metadata dict;
    ``pyarrow.Schema`` with metadata is UNHASHABLE, which makes Ray's
    block-schema dedup fall back with a per-batch worker-side warning
    ("Failed to hash the schemas ...") every time blocks are concatenated
    into batches.  Stripping once at the read boundary (``batch_size=None``
    → block-by-block, no concat before the strip) keeps every downstream
    stage's schemas hashable and the logs quiet.
    """
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        batch_size=None,
    )
