"""Property tests: federated scoring over ARBITRARY corpus splits must
equal single-index scoring over the union; the percolator must agree
with a brute-force Python matcher on random corpora."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

WORDS = ("data stream window merge table scan sort vector customer "
         "query fast slow index shard filter order small the").split()


def _random_docs(rng: random.Random, n: int) -> list[str]:
    return [" ".join(rng.choices(WORDS, k=rng.randint(3, 30)))
            for _ in range(n)]


@pytest.mark.parametrize("seed", [7, 23])
def test_federated_random_split_equals_single_index(ray_session,
                                                    tmp_path, seed,
                                                    monkeypatch):
    """Split a random corpus into 3 UNEVEN parts, build one index per
    part, federated-score a multi-term query across them, and compare
    against score_terms over one index of the whole corpus: same docs,
    same scores (float addition order differs → 1e-9 tolerance, far
    below the 6-dp gate rounding)."""
    monkeypatch.setenv("PDFSEARCH_SPILL_ROOT", str(tmp_path / "spill"))
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.merge import federated_score_terms
    from pdfsearch_ray.pipelines.query import BM25Index

    rng = random.Random(seed)
    n = 90
    texts = _random_docs(rng, n)
    parts = [rng.choice([0, 0, 1, 2]) for _ in range(n)]  # uneven
    docs = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n, type=pa.string()),
    })
    full = tmp_path / "full.parquet"
    pq.write_table(docs, str(full))
    handles = []
    for p in (0, 1, 2):
        rows = [i for i in range(n) if parts[i] == p]
        sub = docs.take(pa.array(rows, type=pa.int64()))
        f = tmp_path / f"part{p}.parquet"
        pq.write_table(sub, str(f))
        d = str(tmp_path / f"idx{p}")
        build_index(str(f), d, analyzer="simple", lang_col="lang",
                    num_buckets=4, sample_rate=1.0)
        handles.append(BM25Index(d))
    dfull = str(tmp_path / "idxfull")
    build_index(str(full), dfull, analyzer="simple", lang_col="lang",
                num_buckets=4, sample_rate=1.0)
    ref = BM25Index(dfull)

    for q in ("data stream window", "customer query", "vector"):
        terms = sorted(set(analyze_simple(q)))
        ids_f, sc_f = federated_score_terms(handles, terms)
        ids_r, sc_r = ref.score_terms(terms)
        order = np.argsort(ids_r.astype(np.int64))
        ids_r = ids_r.astype(np.int64)[order]
        sc_r = sc_r[order]
        assert (ids_f == ids_r).all(), q
        assert np.allclose(sc_f, sc_r, rtol=0, atol=1e-9), q


@pytest.mark.parametrize("seed", [3, 11, 42])
def test_percolate_fuzz_vs_bruteforce(ray_session, tmp_path, seed,
                                      monkeypatch):
    """Random corpora + random conjunctive registries: the vectorized
    percolator must exactly match a set-cover brute force."""
    import pdfsearch_ray.pipelines.percolate as perc
    from pdfsearch_ray.analysis.analyzer import analyze_simple

    rng = random.Random(seed)
    n = 60
    texts = _random_docs(rng, n)
    docs = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    registry = tuple(
        (f"q{i}", " ".join(rng.sample(WORDS, rng.randint(1, 4))))
        for i in range(6))
    monkeypatch.setattr(perc, "PERC_QUERIES", registry)
    t = perc.percolate_matches(str(tmp_path)).to_pandas()
    got = set(zip(t["query_id"], t["doc_id"]))
    want = set()
    for qid, text in registry:
        need = set(analyze_simple(text))
        if not need:
            continue
        for i, doc in enumerate(texts):
            if need <= set(analyze_simple(doc)):
                want.add((qid, i))
    assert got == want
