"""Build invariants: duplicate-doc_id audit (J2 CheckConsistency analog,
bleve_pdf.go:177-223), poison-row skip-and-count lineage
(index_pdfs.go:108-113), strict mode, and the per-worker utilization
report (index_pdfs.go:253-291)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from pdfsearch_ray.pipelines.build import (
    BuildConsistencyError,
    build_index,
    duplicate_doc_ids,
)
from pdfsearch_ray.sources.pages_source import extract_pages


def _corpus(ids):
    n = len(ids)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array([f"alpha beta gamma delta {i}" for i in range(n)]),
    })


def test_duplicate_doc_ids_detected(ray_session):
    dups = duplicate_doc_ids(rd.from_arrow(_corpus([1, 2, 3, 2, 5, 1, 1])))
    assert dups.tolist() == [1, 2]
    clean = duplicate_doc_ids(rd.from_arrow(_corpus([1, 2, 3, 4])))
    assert clean.size == 0


def test_build_audit_rejects_duplicate_ids(ray_session, tmp_path):
    src = rd.from_arrow(_corpus([7, 8, 9, 8]))
    with pytest.raises(BuildConsistencyError, match="duplicate doc_id"):
        build_index(src, str(tmp_path / "idx"), analyzer="simple",
                    audit_unique=True)
    # same corpus with unique ids builds fine under the audit
    m = build_index(rd.from_arrow(_corpus([7, 8, 9, 10])),
                    str(tmp_path / "idx2"), analyzer="simple",
                    audit_unique=True)
    assert m.n_docs == 4


@pytest.fixture()
def poison_corpus(tmp_path):
    """4 pages: 2 good, 1 empty-html (poison → extracts to ''), 1 wrong
    language."""
    t = pa.table({
        "url": pa.array([f"https://x.test/{i}" for i in range(4)]),
        "warc_ts": pa.array([0] * 4, type=pa.timestamp("us")),
        "html": pa.array([
            b"<html><p>good page one content</p></html>",
            b"<html><p>good page two content</p></html>",
            b"",  # poison: empty payload → no text → skip-and-count
            b"<html><p>bonne page en francais</p></html>",
        ], type=pa.large_binary()),
        "text": pa.array(["good page one content", "good page two content",
                          "", "bonne page en francais"]),
        "lang": pa.array(["en", "en", "en", "fr"]),
    })
    path = str(tmp_path / "pages.parquet")
    pq.write_table(t, path, row_group_size=4)
    return path


def test_extract_skip_counters_and_worker_report(ray_session, poison_corpus,
                                                 tmp_path):
    out = str(tmp_path / "extracted")
    summary = extract_pages(poison_corpus, out, lang_allow=("en",),
                            resume=False)
    assert summary["rows_in"] == 4
    assert summary["rows_out"] == 2
    assert summary["lang_filtered"] == 1
    assert summary["empty_or_error"] == 1
    profs = summary["worker_profiles"]
    assert profs and profs[0]["docs"] == 2 and profs[0]["partitions"] == 1
    assert 0.0 <= profs[0]["idle_frac"] <= 1.0
    # counters also persisted in the per-partition marker (lineage)
    import glob
    import json

    markers = sorted(glob.glob(f"{out}/_partitions/*.json"))
    assert markers
    m = json.load(open(markers[0]))
    assert m["lang_filtered"] == 1 and m["empty_or_error"] == 1
