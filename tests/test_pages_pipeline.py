"""Fixture-corpus pipeline tests: byte-identical extraction (input_hint
invariant), planted-phrase ground truth (bleve_mem_test.go pattern),
exact dedup, and checkpoint resume."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from pdfsearch_ray.fixtures.gen import (
    PLANTED_PHRASES,
    generate_pages,
    write_pages,
)
from pdfsearch_ray.stages.extract import extract_text

N_ROWS = 400


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    write_pages(d, N_ROWS, rows_per_file=100, row_group_size=50)
    return d


def test_extraction_byte_identical(corpus_dir):
    """extract(html) == text for every row — the per-url invariant."""
    tbl = generate_pages(N_ROWS)
    for url, html, text in zip(
        tbl["url"].to_pylist(), tbl["html"].to_pylist(), tbl["text"].to_pylist()
    ):
        assert extract_text(html) == text, url


def test_corpus_has_edge_rows():
    tbl = generate_pages(N_ROWS)
    texts = tbl["text"].to_pylist()
    assert any(t == "" for t in texts), "empty docs planted"
    assert texts[100] == texts[99], "duplicate content planted"
    assert any(len(t) >= 100_000 for t in texts), "long doc planted"
    langs = set(tbl["lang"].to_pylist())
    assert {"en", "de", "fr", ""} <= langs


@pytest.fixture(scope="module")
def built(ray_session, corpus_dir, tmp_path_factory):
    from pdfsearch_ray.pipelines.build import build_from_pages

    index_dir = str(tmp_path_factory.mktemp("pages_idx"))
    manifest = build_from_pages(
        corpus_dir, index_dir, num_buckets=16, analyzer="en",
        tokenize_concurrency=(1, 2), extract_concurrency=(1, 2),
    )
    return index_dir, manifest


def test_extract_checkpoints(built, corpus_dir):
    index_dir, manifest = built
    parts = sorted(glob.glob(f"{index_dir}/extracted/part-*.parquet"))
    markers = sorted(glob.glob(f"{index_dir}/extracted/_partitions/*.json"))
    n_parts = len(list_row_groups(corpus_dir))
    assert len(parts) == len(markers) == n_parts
    with open(markers[0]) as f:
        info = json.load(f)
    assert {"rows_in", "rows_out", "doc_id_sum", "extractor_version"} <= set(info)


def list_row_groups(corpus_dir):
    out = []
    for f in sorted(glob.glob(f"{corpus_dir}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        out += [(f, rg) for rg in range(md.num_row_groups)]
    return out


def test_doc_ids_deterministic(built):
    index_dir, _ = built
    tbl = pq.read_table(f"{index_dir}/docs", columns=["doc_id", "url"])
    ids = tbl["doc_id"].to_pylist()
    assert len(ids) == len(set(ids))
    # doc_id encodes (partition, row): partition fits the corpus layout
    for did in ids:
        assert 0 <= (did >> 32) < 8
        assert 0 <= (did & 0xFFFFFFFF) < 50


def test_dedup_dropped_duplicates(built):
    index_dir, _ = built
    docs = pq.read_table(f"{index_dir}/docs", columns=["hash"])
    hashes = docs["hash"].to_pylist()
    assert len(hashes) == len(set(hashes)), "content-hash dedup kept one per hash"


def test_planted_phrases_found(built):
    """Every planted phrase must hit docs that contain it; top hit spans
    align with the phrase (ground-truth pattern of bleve_mem_test.go:44-62)."""
    from pdfsearch_ray.pipelines.query import BM25Index

    index_dir, _ = built
    idx = BM25Index(index_dir)
    docs = pq.read_table(f"{index_dir}/docs", columns=["doc_id", "text"])
    text_by_id = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    for phrase_q in PLANTED_PHRASES:
        ms = idx.search(phrase_q, max_results=10)
        assert ms.total_matches > 0, phrase_q
        best = ms.best()
        assert best.matches, phrase_q
        # at least one best-span should land on an occurrence of the
        # planted phrase: the span text (the non-stopword core the analyzer
        # keeps, e.g. "person" for "be the person who") must be inside the
        # phrase, and the phrase must occur around the span
        found = False
        for m in best.matches:
            text = text_by_id[m.doc_id]
            for s in m.spans:
                span_text = text[s["start"] : s["end"]].lower()
                lo = max(0, s["start"] - len(phrase_q) - 5)
                hi = s["end"] + len(phrase_q) + 5
                if span_text and span_text in phrase_q.lower() or \
                        phrase_q.lower() in text[lo:hi].lower():
                    found = True
        assert found, phrase_q


def test_stopword_and_oov_queries(built):
    from pdfsearch_ray.pipelines.query import BM25Index

    index_dir, _ = built
    idx = BM25Index(index_dir)
    assert idx.search("the and of to").total_matches == 0
    assert idx.search("zzxqv unknownterm").total_matches == 0


def test_resume_skips_completed(ray_session, corpus_dir, built, tmp_path):
    """Second extract run must skip all partitions (resume contract)."""
    from pdfsearch_ray.sources.pages_source import extract_pages

    index_dir, _ = built
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{index_dir}/extracted/part-*.parquet")
    }
    summary = extract_pages(corpus_dir, f"{index_dir}/extracted", resume=True)
    assert summary["skipped"] == summary["partitions"]
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{index_dir}/extracted/part-*.parquet")
    }
    assert before == after, "no partition rewritten on resume"


def test_partial_resume(ray_session, corpus_dir, tmp_path):
    """Delete one marker → exactly that partition re-extracts, identically."""
    from pdfsearch_ray.sources.pages_source import extract_pages

    out = str(tmp_path / "ext")
    extract_pages(corpus_dir, out, concurrency=(1, 2))
    victim_marker = sorted(glob.glob(f"{out}/_partitions/*.json"))[3]
    victim_part = sorted(glob.glob(f"{out}/part-*.parquet"))[3]
    orig = pq.read_table(victim_part)
    os.remove(victim_marker)
    summary = extract_pages(corpus_dir, out, concurrency=(1, 2))
    assert summary["partitions"] - summary["skipped"] == 1
    assert pq.read_table(victim_part).equals(orig), "re-extraction is deterministic"
