"""Frozen golden query set (SURVEY §7.1): top-k doc_ids, scores and
total-match counts snapshotted once (tests/golden/bm25_sf0001.json) and
asserted rank-identically on every build — the rebuild's version of the
reference freezing exact expected hit sets
(internal/doclib/bleve_mem_test.go:44-62).

If scoring semantics ever change INTENTIONALLY, regenerate the file and
say so in the commit; an unintentional diff here is a rank-identity
regression."""

import json
from pathlib import Path

GOLDEN = json.loads(
    (Path(__file__).parent / "golden" / "bm25_sf0001.json").read_text()
)


def test_golden_rank_identity(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.query import BM25Index

    cfg = GOLDEN["build"]
    d = str(tmp_path / "idx")
    build_index(cfg["source"], d, analyzer=cfg["analyzer"],
                lang_col=cfg["lang_col"], num_buckets=cfg["num_buckets"])
    idx = BM25Index(d)
    for q, expect in GOLDEN["queries"].items():
        for method in ("taat", "maxscore"):
            ms = idx.search(q, max_results=10, method=method)
            got = [[m.doc_id, round(m.score, 12)] for m in ms.matches]
            assert got == expect["topk"], (q, method)
            if method == "taat":
                assert ms.total_matches == expect["total_matches"], q
