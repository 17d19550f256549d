"""End-to-end corpus curation: the composite training-data pipeline.

The individual operators exist as first-class gate queries (exact
dedup, Gopher quality gate, stratified per-language sampling,
fixed-window chunking); this module composes them into the job a
training-data user actually runs over a raw documents corpus:

    read → exact dedup (min-doc_id per md5(text)) → Gopher filter
         → per-lang deterministic downsampling → fixed-window chunks
         → partitioned parquet + manifest

Every stage is a per-batch transform or a narrow shuffle the component
operators already proved at the 100 TB design point: the dedup shuffle
moves (hash, doc_id) only; quality and sampling fuse into the read;
chunking is a 1→N flat map whose cost is the output bytes.  The whole
composite is deterministic (content hashes + splitmix64 membership), so
it is SQL-expressible end-to-end — the driver gate checks the FULL
composition against DuckDB (``curated_chunks``), not just the pieces.

CLI: ``python -m pdfsearch_ray.jobs.curate_job --input docs.parquet
--out-dir /curated``.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa

import ray.data as rd

# defaults shared verbatim with the SQL oracle (see __ray_entry__)
CURATE_CHUNK_SIZE = 500
CURATE_CHUNK_STRIDE = 400


def _attach_md5(batch: pa.Table, text_col: str) -> pa.Table:
    # content identity = md5(text) hex — the exact_dedup gate's rule
    # (DuckDB md5(text)); hashing is inherently per-row
    hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
          for t in batch[text_col].to_pylist()]
    return batch.append_column("__chash", pa.array(hs, type=pa.string()))


def _strata_filter(batch: pa.Table, rates: dict, default_rate: float,
                   id_col: str, lang_col: str) -> pa.Table:
    from .build import _sample_mask

    ids = batch[id_col].to_numpy(zero_copy_only=False)
    langs = batch[lang_col].to_pylist()
    keep = np.zeros(len(ids), dtype=bool)
    for lang in set(langs):
        rate = rates.get(lang, default_rate)
        sel = np.asarray([la == lang for la in langs])
        keep[sel] = _sample_mask(ids[sel], rate)
    return batch.filter(pa.array(keep))


def _chunk_batch(batch: pa.Table, size: int, stride: int,
                 id_col: str, text_col: str, lang_col: str) -> pa.Table:
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    langs = batch[lang_col].to_pylist()
    n_chars = np.fromiter((len(x or "") for x in texts),
                          dtype=np.int64, count=len(texts))
    # chunk c covers [c·stride, c·stride+size); stop once the previous
    # chunk already reaches the end of the doc — a trailing window fully
    # contained in its predecessor duplicates tail text in the curated
    # output (round-4 advice).  k = 1 + ceil((len-size)/stride) for
    # len > size, else 1.
    n_chunks = np.where(
        n_chars == 0, 0,
        np.where(n_chars <= size, 1,
                 1 + (n_chars - size + stride - 1) // stride))
    out_ids: list[int] = []
    out_lang: list[str] = []
    out_cid: list[int] = []
    out_text: list[str] = []
    for did, lang, text, k in zip(ids, langs, texts, n_chunks):
        for c in range(int(k)):  # O(output bytes): the copy IS the output
            out_ids.append(int(did))
            out_lang.append(lang)
            out_cid.append(c)
            out_text.append(text[c * stride:c * stride + size])
    return pa.table({
        "doc_id": pa.array(out_ids, type=pa.int64()),
        "lang": pa.array(out_lang, type=pa.string()),
        "chunk_id": pa.array(out_cid, type=pa.int64()),
        "chunk_text": pa.array(out_text, type=pa.string()),
    })


def curate_chunks(
    source: str | list[str] | rd.Dataset,
    *,
    rates: dict | None = None,
    default_rate: float = 0.25,
    chunk_size: int = CURATE_CHUNK_SIZE,
    chunk_stride: int = CURATE_CHUNK_STRIDE,
    num_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    strip_boilerplate: bool = False,
    boiler_df_min: int | None = None,
    min_dsir_bits: int | None = None,
) -> rd.Dataset:
    """The curated-chunk Dataset (lazy): [boilerplate-line strip →]
    dedup → quality → [DSIR select →] sample → chunk.  Consume with
    write_parquet (curate_corpus) or collect at gate scale.

    ``strip_boilerplate=True`` prepends the CCNet line-level
    boilerplate removal (pipelines/webops.strip_boiler_lines) BEFORE
    the content-hash dedup, so corpus-wide boilerplate can neither
    mask real duplicates nor split real clusters.  Default off — the
    driver gate pins the historical 4-stage composition bitwise.

    ``min_dsir_bits`` (opt-in) inserts the DSIR importance-resampling
    selection (textstats.dsir_filter) between the quality gate and
    sampling — the Xie et al. 2023 stage order (select from the
    cleaned pool, then rebalance).  The models train on the gated
    stream itself, costing one extra upstream pass at gate scale
    (same trade as dedup_exact's double read, documented there)."""
    from functools import partial

    from .build import dedup_exact
    from .textstats import gopher_filter

    if isinstance(source, rd.Dataset):
        ds = source
    else:
        from ..functions.tables import read_parquet_nometa

        ds = read_parquet_nometa(source,
                                 columns=[id_col, text_col, lang_col])
    if strip_boilerplate:
        from .webops import LINE_DF_MIN, strip_boiler_lines

        ds = strip_boiler_lines(
            ds, boiler_df_min if boiler_df_min is not None
            else LINE_DF_MIN, text_col=text_col)
    ds = ds.map_batches(partial(_attach_md5, text_col=text_col),
                        batch_format="pyarrow")
    # dedup_exact consumes the hashed dataset twice (loser discovery,
    # then the anti-join filter), so the read+md5 run twice.  That is
    # the gate-scale trade; the at-scale build avoids it by fusing the
    # pair scan into the extract read (sources/pages_source.py) — a
    # 100 TB curation run should reuse that fused path or checkpoint
    # the hashed projection first.
    ds = dedup_exact(ds, hash_col="__chash", id_col=id_col,
                     num_buckets=num_buckets)
    ds = gopher_filter(ds)
    if min_dsir_bits is not None:
        from .textstats import dsir_filter

        ds = dsir_filter(ds, min_dsir_bits, text_col=text_col,
                         lang_col=lang_col)
    ds = ds.map_batches(
        partial(_strata_filter, rates=dict(rates or {}),
                default_rate=default_rate, id_col=id_col,
                lang_col=lang_col),
        batch_format="pyarrow")
    return ds.map_batches(
        partial(_chunk_batch, size=chunk_size, stride=chunk_stride,
                id_col=id_col, text_col=text_col, lang_col=lang_col),
        batch_format="pyarrow")


def curate_corpus(
    source: str | list[str] | rd.Dataset,
    out_dir: str,
    **kwargs,
) -> dict:
    """Run the curation pipeline and write chunk shards partitioned by
    language (resumable output layout: one directory per lang, manifest
    committed last).  Returns the manifest dict."""
    t0 = time.time()
    ds = curate_chunks(source, **kwargs)
    tmp = out_dir.rstrip("/") + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, partition_cols=["lang"])
    import glob

    import pyarrow.parquet as pq

    n_chunks = 0
    per_lang: dict[str, int] = {}
    for d in sorted(glob.glob(f"{tmp}/lang=*")):
        lang = os.path.basename(d).split("=", 1)[1]
        n = sum(pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(f"{d}/*.parquet"))
        per_lang[lang] = n
        n_chunks += n
    manifest = {
        "n_chunks": n_chunks,
        "per_lang": per_lang,
        "chunk_size": kwargs.get("chunk_size", CURATE_CHUNK_SIZE),
        "chunk_stride": kwargs.get("chunk_stride", CURATE_CHUNK_STRIDE),
        "rates": dict(kwargs.get("rates") or {}),
        "default_rate": kwargs.get("default_rate", 0.25),
        "sec_total": round(time.time() - t0, 3),
    }
    with open(f"{tmp}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    # the previous good output survives until the new run is complete:
    # remove it only now, at commit time, so a mid-run failure leaves
    # out_dir untouched (rmtree-then-run would destroy it up front)
    import shutil as _sh

    _sh.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)  # commit
    return manifest
