"""BPE tokenizer training (pipelines/bpe.py, round 5): greedy-merge
semantics vs a pure-Python Sennrich-style reference, multi-char merge
chains, the word-length cap, the DuckDB oracle, and edge cases."""

from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pdfsearch_ray.pipelines import bpe

SF = "/root/testdata/sf0.001"


def _ref_bpe(words: Counter, n_merges: int):
    """Pure-Python BPE: overlapping pair counts, (count DESC, pair ASC)
    argmax, greedy left-to-right merge — the published algorithm."""
    segs = {w: tuple(w) for w in words}
    out = []
    for k in range(1, n_merges + 1):
        cnt = Counter()
        for w, f in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((k, a, b, c))
        for w, s in segs.items():
            new, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            segs[w] = tuple(new)
    return out, segs


def _write_docs(tmp_path, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }), tmp_path / "documents.parquet")
    return str(tmp_path)


def _rows(t: pa.Table):
    return list(zip(t["step"].to_pylist(), t["lhs"].to_pylist(),
                    t["rhs"].to_pylist(), t["pair_count"].to_pylist()))


def test_replace_is_greedy_left_to_right():
    """The paren representation makes literal replace exact greedy BPE:
    runs merge non-overlapping from the left."""
    seg = pa.array(["(a)(a)(a)", "(a)(a)(a)(a)(a)", "(x)(a)(a)(y)"])
    out = pc.replace_substring(seg, pattern="(a)(a)",
                               replacement="(aa)").to_pylist()
    assert out == ["(aa)(a)", "(aa)(aa)(a)", "(x)(aa)(y)"]


def test_pair_partial_counts_overlapping_pairs():
    """get_stats counts EVERY adjacent position: 'aaa' (freq 2) has
    pair (a,a) twice per occurrence → 4."""
    t = pa.table({"word": ["aaa"], "freq": pa.array([2], pa.int64()),
                  "seg": ["(a)(a)(a)"]})
    p = bpe._pair_partial(t)
    assert p.to_pylist() == [{"pair": "(a)(a)", "n": 4}]


def test_bpe_matches_python_reference_planted(ray_session, tmp_path):
    """Planted corpus exercising runs (odd/even repeat counts), ties,
    and merged-symbol reuse; engine == the published algorithm."""
    texts = [
        "aaa aaaa ab ab ab abc abc abc abc",
        "banana bandana cabana",
        "zz zz zz zz zz zz zz",
        "abc abab ababab aaa",
    ] * 3
    sf = _write_docs(tmp_path, texts)
    words = Counter(w for x in texts for w in x.split())
    ref, _ = _ref_bpe(words, bpe.BPE_MERGES)
    assert _rows(bpe.bpe_merges(sf)) == ref


def test_bpe_multichar_merge_chain(ray_session, tmp_path):
    """A corpus dominated by one long word forces merges of already-
    merged symbols (lhs or rhs longer than one char)."""
    texts = ["toktok toktok toktok toktok toktok"] * 8
    sf = _write_docs(tmp_path, texts)
    words = Counter(w for x in texts for w in x.split())
    ref, _ = _ref_bpe(words, bpe.BPE_MERGES)
    got = _rows(bpe.bpe_merges(sf))
    assert got == ref
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got)


def test_bpe_word_length_cap(ray_session, tmp_path):
    """Words longer than BPE_MAX_WORD_LEN are dropped before counting
    (engine and oracle share the cap)."""
    long_word = "qj" * 40  # 80 chars, only source of the (q,j) pair
    texts = [f"{long_word} hello hello world world"] * 5
    sf = _write_docs(tmp_path, texts)
    got = _rows(bpe.bpe_merges(sf))
    assert got and all(
        not (l == "q" and r == "j") for _, l, r, _ in got)
    words = Counter(
        w for x in texts for w in x.split()
        if len(w) <= bpe.BPE_MAX_WORD_LEN)
    ref, _ = _ref_bpe(words, bpe.BPE_MERGES)
    assert got == ref


def test_bpe_counts_nonincreasing_and_oracle(ray_session):
    """Selected pair counts are non-increasing (a new pair's count is
    bounded by the merge that created its symbol); engine == DuckDB on
    the sf0.001 corpus."""
    t = bpe.bpe_merges(SF)
    counts = t["pair_count"].to_pylist()
    assert len(counts) == bpe.BPE_MERGES
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    o = con.sql(bpe.bpe_merges_sql()).fetchall()
    assert [tuple(r) for r in o] == _rows(t)


def test_bpe_empty_corpus(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [])
    t = bpe.bpe_merges(sf)
    assert t.num_rows == 0
    assert t.column_names == ["step", "lhs", "rhs", "pair_count"]
    ts = bpe.bpe_token_stats(sf)
    assert ts.num_rows == 0
    assert ts.column_names == ["token", "total_count"]


def test_bpe_token_stats_matches_reference(ray_session, tmp_path):
    """Applying the learned merges: token counts equal the python
    reference's final segmentations rolled up by word frequency, and
    a merged (multi-char) token reaches the top-K."""
    texts = ["toktok toktok tik tok tik"] * 6
    sf = _write_docs(tmp_path, texts)
    words = Counter(w for x in texts for w in x.split())
    _, segs = _ref_bpe(words, bpe.BPE_MERGES)
    cnt = Counter()
    for w, f in words.items():
        for s in segs[w]:
            cnt[s] += f
    ref = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    ref = ref[:bpe.BPE_TOPK]
    t = bpe.bpe_token_stats(sf)
    got = list(zip(t["token"].to_pylist(),
                   t["total_count"].to_pylist()))
    assert got == ref
    assert any(len(tok) > 1 for tok, _ in got)
