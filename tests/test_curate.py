"""Composite curation pipeline: stage semantics (dedup wins, gopher
gate, per-lang sampling, chunk windows), the partitioned output layout,
and determinism."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_curated_chunks_matches_reference(ray_session):
    """Single-process reference of the full composition equals the
    distributed pipeline."""
    import hashlib

    from pdfsearch_ray.pipelines.build import _sample_mask
    from pdfsearch_ray.pipelines.curate import (
        CURATE_CHUNK_SIZE,
        CURATE_CHUNK_STRIDE,
        curate_chunks,
    )
    from pdfsearch_ray.pipelines.queries import (
        STRATA_DEFAULT_RATE,
        STRATA_RATES,
    )
    from pdfsearch_ray.pipelines.textstats import (
        GOPHER_MAX_MEAN_WL,
        GOPHER_MAX_WORD_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_WL,
        GOPHER_MIN_WORDS,
    )

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    ids = t["doc_id"].to_numpy()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    # dedup: min doc_id per md5
    seen: dict[str, int] = {}
    for d, tx in sorted(zip(ids, texts)):
        h = hashlib.md5((tx or "").encode()).hexdigest()
        seen.setdefault(h, int(d))
    winners = set(seen.values())
    expect = []
    for d, tx, la in zip(ids, texts, langs):
        if int(d) not in winners:
            continue
        words = (tx or "").split(" ")
        nw, nc = len(words), len((tx or "").replace(" ", ""))
        mw = max(len(w) for w in words)
        if not (GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS
                and GOPHER_MIN_MEAN_WL * nw <= nc
                and nc <= GOPHER_MAX_MEAN_WL * nw
                and mw <= GOPHER_MAX_WORD_LEN):
            continue
        rate = STRATA_RATES.get(la, STRATA_DEFAULT_RATE)
        if not _sample_mask(np.asarray([d]), rate)[0]:
            continue
        n = len(tx or "")
        # no trailing window fully contained in its predecessor
        if n == 0:
            k = 0
        elif n <= CURATE_CHUNK_SIZE:
            k = 1
        else:
            k = 1 + -(-(n - CURATE_CHUNK_SIZE) // CURATE_CHUNK_STRIDE)
        for c in range(k):
            expect.append((int(d), la, c,
                           tx[c * CURATE_CHUNK_STRIDE:
                              c * CURATE_CHUNK_STRIDE + CURATE_CHUNK_SIZE]))
    got = curate_chunks(f"{SF}/documents.parquet", rates=STRATA_RATES,
                        default_rate=STRATA_DEFAULT_RATE).to_pandas()
    got_rows = sorted(zip(got["doc_id"], got["lang"], got["chunk_id"],
                          got["chunk_text"]))
    assert got_rows == sorted(expect)
    assert len(got_rows) > 0


def test_curate_corpus_layout_and_manifest(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.curate import curate_corpus
    from pdfsearch_ray.pipelines.queries import (
        STRATA_DEFAULT_RATE,
        STRATA_RATES,
    )

    out = str(tmp_path / "curated")
    m = curate_corpus(f"{SF}/documents.parquet", out,
                      rates=STRATA_RATES, default_rate=STRATA_DEFAULT_RATE)
    assert os.path.isfile(f"{out}/manifest.json")
    disk = json.load(open(f"{out}/manifest.json"))
    assert disk["n_chunks"] == m["n_chunks"] > 0
    langs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert langs and sum(m["per_lang"].values()) == m["n_chunks"]
    # the partitioned shards read back to exactly n_chunks rows
    total = 0
    for d in langs:
        t = pq.read_table(f"{out}/{d}")
        total += t.num_rows
        assert set(t.schema.names) >= {"doc_id", "chunk_id", "chunk_text"}
    assert total == m["n_chunks"]


def test_curate_min_dsir_bits_stage(ray_session):
    """Opt-in DSIR selection between quality gate and sampling: a
    threshold below every score is a no-op (bitwise-equal output); a
    high threshold strictly shrinks the output; surviving doc ids are
    a subset of the no-op run's."""
    from pdfsearch_ray.pipelines.curate import curate_chunks

    def run(**kw):
        return (curate_chunks(f"{SF}/documents.parquet", **kw)
                .to_pandas()
                .sort_values(["doc_id", "chunk_id"])
                .reset_index(drop=True))

    base = run()
    noop = run(min_dsir_bits=-(10 ** 9))
    assert base.equals(noop)

    # corpus dsir_bits span ~[-17, 9]; 0 sits at the ~75th percentile,
    # so the stage really selects without emptying the stream
    tight = run(min_dsir_bits=0)
    assert 0 < len(tight) < len(base)
    assert set(tight["doc_id"]) <= set(base["doc_id"])
