"""Dedup suite tests: exact Jaccard oracle agreement, MinHash-LSH finds
planted near-dups, SimHash hamming pairs, cluster correctness."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pdfsearch_ray.analysis.analyzer import analyze_simple
from pdfsearch_ray.pipelines.dedup import (
    MinHashSigner,
    _word_ngrams,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
    simhash_fingerprints,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the engineers "
    "measure throughput in documents per second and latency in milliseconds "
    "shuffle stages move blocks between workers while map stages stay local"
)


def _corpus():
    # 0: base; 1: exact copy; 2: one word changed; 3: half the text;
    # 4-9: unrelated
    texts = [
        BASE,
        BASE,
        BASE.replace("lazy", "sleepy"),
        BASE[: len(BASE) // 2],
        "completely different content about databases and storage engines",
        "another unrelated document mentioning search ranking and scoring",
        "short",
        "",
        "compression trades cpu for bytes and caching trades memory for time",
        "correctness comes first performance comes second but both must ship",
    ]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })


def brute_jaccard(ta: str, tb: str, n=3) -> float:
    sa = _word_ngrams(analyze_simple(ta), n)
    sb = _word_ngrams(analyze_simple(tb), n)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture()
def docs_ds(ray_session):
    return rd.from_arrow(_corpus())


def test_ngram_jaccard_exact(docs_ds):
    got = ngram_jaccard_pairs(docs_ds, n=3, threshold=0.3).to_pandas()
    texts = _corpus()["text"].to_pylist()
    expected = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            j = brute_jaccard(texts[a], texts[b])
            if j >= 0.3:
                expected.append((a, b, round(j, 6)))
    got_set = {(r.doc_a, r.doc_b, r.jaccard) for r in got.itertuples()}
    assert got_set == set(expected)
    assert (0, 1, 1.0) in got_set  # exact copy
    assert any(a == 0 and b == 2 for a, b, _ in got_set)  # one-word edit


def test_minhash_signature_estimates_jaccard():
    b = MinHashSigner(num_perm=256)
    s1 = b.signature(BASE)
    s2 = b.signature(BASE.replace("lazy", "sleepy"))
    est = float((s1 == s2).mean())
    true = brute_jaccard(BASE, BASE.replace("lazy", "sleepy"))
    assert abs(est - true) < 0.15
    assert float((b.signature(BASE) == b.signature(BASE)).mean()) == 1.0


def test_minhash_lsh_dedup_finds_planted(docs_ds):
    out = minhash_lsh_dedup(docs_ds, threshold=0.5).to_pandas()
    by_doc = dict(zip(out["doc_id"], out["keep_id"]))
    # 0,1,2 form a near-dup cluster with representative 0
    assert by_doc.get(0) == 0 and by_doc.get(1) == 0 and by_doc.get(2) == 0
    # unrelated docs are not clustered with 0
    for d in (4, 5, 8, 9):
        assert by_doc.get(d, d) != 0 or d == 0


def test_simhash_pairs(docs_ds):
    fps = simhash_fingerprints(docs_ds).to_pandas()
    assert len(fps) == 10
    fp = dict(zip(fps["doc_id"], fps["simhash"]))
    assert fp[0] == fp[1]  # identical docs, identical fingerprints
    pairs = simhash_dup_pairs(docs_ds, max_hamming=6).to_pandas()
    pset = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 1) in pset
    ham = dict(((a, b), h) for a, b, h in
               zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"]))
    assert ham[(0, 1)] == 0


def test_exact_dedup_stage(ray_session):
    from pdfsearch_ray.pipelines.build import dedup_exact

    tbl = pa.table({
        "doc_id": pa.array([3, 1, 2, 5], type=pa.int64()),
        "hash": pa.array(["a", "a", "b", "b"], type=pa.string()),
    })
    out = dedup_exact(rd.from_arrow(tbl)).to_pandas().sort_values("hash")
    assert out["doc_id"].tolist() == [1, 2]


def test_chunk_dedup_drops_cross_doc_segments(ray_session):
    from pdfsearch_ray.pipelines.dedup import chunk_dedup

    seg = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 words
    other = "one two three four five six seven eight"      # exactly 8 words
    texts = [
        seg + " " + other,        # doc 0: owns both segments
        seg + " tail words",      # doc 1: dup of seg + short final (kept)
        other,                    # doc 2: dup of other -> fully dropped
        "unique words only here", # doc 3: single short chunk, kept
        "",                       # doc 4: empty -> one short chunk ('')
        seg + " " + seg,          # doc 5: within-doc dup of seg (both lose to doc 0)
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    out = chunk_dedup(docs).to_pandas().set_index("doc_id").sort_index()

    assert out.loc[0, "text_dedup"] == seg + " " + other
    assert out.loc[0, "n_dropped"] == 0
    # doc 1: seg dropped (doc 0 wins), short tail kept
    assert out.loc[1, "text_dedup"] == "tail words"
    assert (out.loc[1, "n_kept"], out.loc[1, "n_dropped"]) == (1, 1)
    # doc 2: its only chunk is a full-length dup -> empty result
    assert out.loc[2, "text_dedup"] == ""
    assert (out.loc[2, "n_kept"], out.loc[2, "n_dropped"]) == (0, 1)
    # short chunks never dedup
    assert out.loc[3, "text_dedup"] == "unique words only here"
    assert out.loc[4, "text_dedup"] == ""
    assert out.loc[4, "n_kept"] == 1  # the single empty short chunk survives
    # within-doc duplicate: both copies lose to doc 0's earlier copy
    assert out.loc[5, "text_dedup"] == ""
    assert out.loc[5, "n_dropped"] == 2


def test_chunk_dedup_winner_is_min_doc_then_idx(ray_session):
    from pdfsearch_ray.pipelines.dedup import chunk_dedup

    seg = "w1 w2 w3 w4 w5 w6 w7 w8"
    pad = "p1 p2 p3 p4 p5 p6 p7 p8"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([7, 3], type=pa.int64()),
        # doc 3 has seg at chunk_idx 1; doc 7 at chunk_idx 0 — the
        # winner is doc 3 (min doc_id) even though its index is larger
        "text": pa.array([seg, pad + " " + seg], type=pa.string()),
    }))
    out = chunk_dedup(docs).to_pandas().set_index("doc_id")
    assert out.loc[3, "text_dedup"] == pad + " " + seg
    assert out.loc[7, "text_dedup"] == ""
    assert out.loc[7, "n_dropped"] == 1


# --------------------------------------------------- source overlap


def _w8(seed: str) -> str:
    """A full 8-word segment built from a distinctive seed word."""
    return " ".join(f"{seed}{i}" for i in range(8))


def test_source_overlap_planted(ray_session):
    from pdfsearch_ray.pipelines.dedup import source_overlap

    shared_ab = _w8("ab")      # in A and B
    shared_abc = _w8("abc")    # in A, B and C
    only_a, only_b, only_c = _w8("xa"), _w8("xb"), _w8("xc")
    docs = pa.table({
        "source": pa.array(["A", "A", "B", "B", "C"], type=pa.string()),
        "text": pa.array([
            # A repeats shared_ab twice across docs: distinct-count = 1
            shared_ab + " " + only_a,
            shared_ab + " " + shared_abc,
            shared_ab + " " + only_b,
            shared_abc + " short tail",  # short tail never participates
            shared_abc + " " + only_c,
        ], type=pa.string()),
    })
    out = source_overlap(rd.from_arrow(docs)).to_pandas()
    got = {(r.source_a, r.source_b): (r.n_shared, r.n_chunks_a,
                                      r.n_chunks_b, r.jaccard_bp)
           for r in out.itertuples()}
    # A = {ab, xa, abc}, B = {ab, abc, xb}, C = {abc, xc}
    assert got[("A", "B")] == (2, 3, 3, 10000 * 2 // 4)
    assert got[("A", "C")] == (1, 3, 2, 10000 * 1 // 4)
    assert got[("B", "C")] == (1, 3, 2, 10000 * 1 // 4)
    assert len(got) == 3


def test_source_overlap_no_overlap_is_empty(ray_session):
    from pdfsearch_ray.pipelines.dedup import source_overlap

    docs = pa.table({
        "source": pa.array(["A", "B"], type=pa.string()),
        "text": pa.array([_w8("pa"), _w8("pb")], type=pa.string()),
    })
    out = source_overlap(rd.from_arrow(docs))
    assert out.num_rows == 0
    assert out.column_names == ["source_a", "source_b", "n_shared",
                                "n_chunks_a", "n_chunks_b", "jaccard_bp"]


# ------------------------------------------------ decontamination


def test_gram_keys_match_brute_ngrams(ray_session):
    """The rolling 2x64-bit keys give exactly the per-doc distinct
    n-gram counts of a brute string n-gram set, and windows never
    cross doc boundaries."""
    from pdfsearch_ray.pipelines.dedup import _gram_keys

    texts = [
        "a b c d e f g",          # 4 distinct 4-grams
        "a b c d a b c d a b c d",  # repeats collapse: 5 distinct
        "x y z",                  # shorter than n: none
        "",                       # empty: none
        "a a a a a a",            # one distinct gram
    ]
    n = 4
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = _gram_keys(batch, n)
    got = {}
    for d in out["doc_id"].to_pylist():
        got[d] = got.get(d, 0) + 1
    for i, t in enumerate(texts):
        ws = t.split(" ")
        brute = {" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)}
        assert got.get(i, 0) == len(brute), (i, t)
    # cross-doc windows must not exist: doc 0 x doc 1 share no gram
    # with the planted distinct alphabets of docs 2-4
    keys = set(zip(out["g1"].to_pylist(), out["g2"].to_pylist()))
    assert len(keys) <= out.num_rows


def test_decontaminate_planted(ray_session):
    from pdfsearch_ray.pipelines.build import _sample_mask
    from pdfsearch_ray.pipelines.dedup import decontaminate

    rate = 0.08
    ids = np.arange(200, dtype=np.int64)
    mask = _sample_mask(ids, rate)
    bench_id = int(ids[mask][0])
    clean_ids = ids[~mask]
    hit_id, miss_id = int(clean_ids[0]), int(clean_ids[1])
    span = " ".join(f"w{i}" for i in range(13))      # exactly 13 words
    texts = {
        bench_id: span + " benchtail one two three",
        hit_id: "lead in words " + span,             # shares the span
        miss_id: " ".join(f"u{i}" for i in range(20)),
    }
    docs = pa.table({
        "doc_id": pa.array(sorted(texts), type=pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)],
                         type=pa.string()),
    })
    out = decontaminate(rd.from_arrow(docs), n=13, bench_rate=rate) \
        .to_pandas()
    assert out["doc_id"].tolist() == [hit_id]
    assert out["n_hit_grams"].tolist() == [1]


# ------------------------------------------------ keep-best representative


def test_keep_best_dedup_picks_fullest_member(ray_session):
    """The cluster representative is the member with the most tokens
    (NOT the min doc_id), tie-break lowest id."""
    from pdfsearch_ray.pipelines.dedup import keep_best_dedup

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "across the wide green field near the old stone bridge")
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 10, 11], type=pa.int64()),
        "text": pa.array([
            base,                                    # truncated variant
            base + " every single day without fail", # fullest — must win
            base + " every single day",              # middle
            "completely unrelated text about astronomy and telescopes",
            "another unique document mentioning sailing and harbors",
        ], type=pa.string()),
    })
    out = keep_best_dedup(rd.from_arrow(docs), threshold=0.5)
    assert out.column_names == ["cluster_id", "best_id", "n_members",
                                "best_n_tokens"]
    rows = out.to_pylist()
    assert len(rows) == 1                   # one cluster, singletons absent
    (c,) = rows
    assert c["cluster_id"] == 1             # min-label
    assert c["best_id"] == 2                # fullest member, not min id
    assert c["n_members"] == 3
    assert c["best_n_tokens"] == len((base + " every single day without fail").split())


def test_keep_best_dedup_no_clusters_is_empty(ray_session):
    from pdfsearch_ray.pipelines.dedup import keep_best_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine ten",
        ], type=pa.string()),
    })
    out = keep_best_dedup(rd.from_arrow(docs), threshold=0.5)
    assert out.num_rows == 0
    assert out.column_names == ["cluster_id", "best_id", "n_members",
                                "best_n_tokens"]


def test_affine_mod61_matches_object_int_reference():
    """The uint64-limb (x·a+b) mod 2^61-1 kernel is bit-identical to
    exact Python-int arithmetic across the full uint64 input range."""
    from pdfsearch_ray.pipelines.dedup import (
        _MERSENNE,
        _affine_mod61,
        _minhash_sig,
        _perm_params,
    )

    rng = np.random.RandomState(7)
    x = np.concatenate([
        rng.randint(0, 1 << 62, size=500).astype(np.uint64),
        np.array([0, 1, _MERSENNE - 1, _MERSENNE, _MERSENNE + 1,
                  (1 << 64) - 1, 1 << 63], dtype=np.uint64),
    ])
    a, b = _perm_params(16)
    for k in range(a.size):
        got = _affine_mod61(x, a[k], b[k])
        want = np.array(
            [(int(xi) * int(a[k]) + int(b[k])) % _MERSENNE for xi in x],
            dtype=np.uint64)
        assert (got == want).all()
    # and the per-doc signature path agrees with the object-int formula
    sig = _minhash_sig(x, a, b)
    want_sig = np.array([
        min((int(xi) * int(a[k]) + int(b[k])) % _MERSENNE for xi in x)
        for k in range(a.size)], dtype=np.uint64)
    assert (sig == want_sig).all()
