"""Sampling, grouped top-k and the simple-analyzer engine projection."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_corpus_sample_deterministic_subset(ray_session):
    from pdfsearch_ray.pipelines.queries import SAMPLE_RATE, corpus_sample

    a = corpus_sample(SF).to_pandas().sort_values("doc_id")
    b = corpus_sample(SF).to_pandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()  # reproducible
    n_total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    frac = len(a) / n_total
    assert 0.5 * SAMPLE_RATE < frac < 1.5 * SAMPLE_RATE
    # membership is the engine's own mask
    from pdfsearch_ray.pipelines.build import _sample_mask

    ids = np.arange(n_total, dtype=np.uint64)
    expect = ids[_sample_mask(ids, SAMPLE_RATE)]
    assert a["doc_id"].tolist() == expect.astype("int64").tolist()


def test_top_docs_per_lang_matches_duckdb(ray_session):
    from pdfsearch_ray.pipelines.queries import (
        TOP_PER_LANG_K,
        top_docs_per_lang,
    )

    got = top_docs_per_lang(SF).to_pandas()
    want = duckdb.sql(f"""
        SELECT lang, doc_id, n_chars, rank FROM (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC) AS rank
            FROM read_parquet('{SF}/documents.parquet')
        ) WHERE rank <= {TOP_PER_LANG_K}
        ORDER BY lang, rank
    """).df()
    got = got.sort_values(["lang", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()


def test_fulltext_topk_simple_matches_sql_oracle(ray_session):
    """The engine path vs the DuckDB BM25 recomputation at sf0.001 —
    the same comparison the driver gate runs at sf0.01."""
    from pdfsearch_ray.pipelines.oracles import fulltext_simple_sql
    from pdfsearch_ray.pipelines.queries import (
        FT_SIMPLE_K,
        FT_SIMPLE_QUERIES,
        fulltext_topk_simple,
    )

    got = fulltext_topk_simple(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(
        fulltext_simple_sql(FT_SIMPLE_QUERIES, k=FT_SIMPLE_K)).df()
    con.close()
    got = got.sort_values(["query", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == pytest.approx(want["score"].tolist(),
                                                  abs=2e-6)
    assert got["rank"].tolist() == want["rank"].tolist()


def test_doc_length_quantiles_matches_duckdb(ray_session):
    from pdfsearch_ray.pipelines.queries import doc_length_quantiles

    got = doc_length_quantiles(SF).to_pandas().sort_values("p")
    want = duckdb.sql(f"""
        SELECT 0.5 AS p, quantile_disc(n_chars, 0.5) AS v
        FROM read_parquet('{SF}/documents.parquet')
        UNION ALL SELECT 0.9, quantile_disc(n_chars, 0.9)
        FROM read_parquet('{SF}/documents.parquet')
        UNION ALL SELECT 0.99, quantile_disc(n_chars, 0.99)
        FROM read_parquet('{SF}/documents.parquet')
        UNION ALL SELECT 0.999, quantile_disc(n_chars, 0.999)
        FROM read_parquet('{SF}/documents.parquet')
    """).df().sort_values("p")
    assert got["n_chars"].tolist() == want["v"].astype("int64").tolist()


def test_stratified_sample_deterministic_and_per_lang(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines.build import _sample_mask
    from pdfsearch_ray.pipelines.queries import (
        STRATA_DEFAULT_RATE,
        STRATA_RATES,
        stratified_sample,
    )

    n = 2000
    rng = np.random.default_rng(7)
    langs = rng.choice(["en", "de", "fr", "es"], size=n)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array(["w " * 5] * n),
        "lang": pa.array(langs),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(np.full(n, 10), type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")

    out = stratified_sample(str(tmp_path)).to_pandas()
    out2 = stratified_sample(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True))

    # exact membership: keep iff _sample_mask(doc_id, rate[lang])
    for lang in ("en", "de", "fr", "es"):
        rate = STRATA_RATES.get(lang, STRATA_DEFAULT_RATE)
        ids = np.arange(n)[langs == lang]
        expect = set(ids[_sample_mask(ids, rate)])
        got = set(out[out["lang"] == lang]["doc_id"])
        assert got == expect, lang


def test_repetition_stats_flags_planted_doc(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines.queries import repetition_stats

    texts = [
        "a b a b a b a b a b",            # 'a b' bigram dominates -> flag
        "one two three four five six",    # all distinct -> no flag
        "solo",                           # no bigrams at all
        "",                               # empty text -> one empty word
        "x  y  x  y",                     # double spaces -> empty words
        "tail space ",                    # trailing space -> empty word
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = (repetition_stats(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    # doc 0: 9 bigrams, 'a b' x5 'b a' x4; 8 trigrams, 'a b a' x4
    assert (out.loc[0, ["n_bigrams", "max_bigram_count",
                        "n_trigrams", "max_trigram_count",
                        "repetitive"]].tolist() == [9, 5, 8, 4, 1])
    assert out.loc[1, "repetitive"] == 0
    assert out.loc[1, "max_bigram_count"] == 1
    assert (out.loc[2, ["n_bigrams", "max_bigram_count", "n_trigrams",
                        "max_trigram_count", "repetitive"]].tolist()
            == [0, 0, 0, 0, 0])

    # brute-force cross-check of every row (covers empty words from
    # double/trailing spaces and the empty document)
    from collections import Counter
    for i, text in enumerate(texts):
        w = text.split(" ")
        bi = Counter(zip(w, w[1:]))
        tri = Counter(zip(w, w[1:], w[2:]))
        nb, mb = max(len(w) - 1, 0), max(bi.values(), default=0)
        nt, mt = max(len(w) - 2, 0), max(tri.values(), default=0)
        rep = int((mb >= 2 and mb * 5 > nb) or (mt >= 2 and mt * 10 > nt))
        assert (out.loc[i, ["n_bigrams", "max_bigram_count", "n_trigrams",
                            "max_trigram_count", "repetitive"]].tolist()
                == [nb, mb, nt, mt, rep]), text


def test_temperature_mix_rebalances_and_is_deterministic(ray_session):
    """alpha=0.5 mixing: a source's KEPT share of the budget must sit
    between its raw char share and the uniform share (that is what
    temperature < 1 means), sampling is a pure function of
    (doc_id, source), and the oracle agrees."""
    from pdfsearch_ray.pipelines import oracles
    from pdfsearch_ray.pipelines.queries import temperature_mix

    a = temperature_mix(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = temperature_mix(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert a.equals(b)  # rerun-identical, no seed plumbing

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    o = con.sql(oracles.temperature_mix_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(o[a.columns])

    # the weights themselves encode the rebalancing: under a concave
    # (alpha<1) transform the smallest source's share of the budget
    # RISES above its raw char share and the largest source's FALLS
    # below it (power-mean compression) — checked in exact integer
    # cross-multiplication, no float division
    import math

    stats = con.sql("SELECT source, count(*) n, sum(n_chars) tc "
                    "FROM documents GROUP BY source").df()
    w = {s: math.isqrt(int(tc)) for s, tc in zip(stats.source, stats.tc)}
    tc_of = {s: int(tc) for s, tc in zip(stats.source, stats.tc)}
    sum_w, sum_tc = sum(w.values()), sum(tc_of.values())
    hi = max(tc_of, key=tc_of.get)
    lo = min(tc_of, key=tc_of.get)
    assert tc_of[lo] < tc_of[hi]  # the corpus really is skewed
    assert w[lo] * sum_tc >= tc_of[lo] * sum_w   # lo share up-weighted
    assert w[hi] * sum_tc <= tc_of[hi] * sum_w   # hi share down-weighted


def test_sequence_pack_matches_oracle_and_is_contiguous(ray_session):
    """Two-phase distributed prefix scan == one SQL window cumsum, and
    the packed layout is gapless: each doc starts exactly where the
    previous one ends."""
    import numpy as np

    from pdfsearch_ray.pipelines import queries as q

    got = q.sequence_pack(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = con.sql(q.sequence_pack_sql()).df()
    assert got.equals(want.astype(got.dtypes.to_dict()))

    L = q.SEQ_PACK_LEN
    start = got["first_seq"].to_numpy() * L + \
        got["offset_in_seq"].to_numpy()
    nt = got["n_tokens"].to_numpy()
    assert start[0] == 0
    assert (start[1:] == start[:-1] + nt[:-1]).all()     # gapless
    assert ((got["last_seq"] > got["first_seq"]) ==
            got["crosses"]).all()
    assert got["crosses"].any()                          # L=512 < docs


def test_sequence_pack_bucket_width_invariance(ray_session):
    """The scan's bucket width is an execution knob, not a semantic
    one: a 7-doc bucket (odd boundaries, many buckets) must reproduce
    the default layout bit-for-bit."""
    from pdfsearch_ray.pipelines import queries as q

    base = q.sequence_pack(SF).to_pandas()
    old = q.SEQ_PACK_BUCKET_DOCS
    q.SEQ_PACK_BUCKET_DOCS = 7
    try:
        narrow = q.sequence_pack(SF).to_pandas()
    finally:
        q.SEQ_PACK_BUCKET_DOCS = old
    assert base.equals(narrow)


def test_sequence_pack_hand_layout(ray_session, tmp_path):
    """Hand-checked tiny layout at L=5: a crossing doc, an aligned
    doc, a zero-token doc, a doc starting mid-sequence."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines import queries as q

    rows = {
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "a b c d e f g",   # 7 tokens: seqs 0-1, crosses
            "",                 # 0 tokens at offset 7->no row movement
            "h i j",            # 3 tokens: fills seq 1 (7..9)
            "k l m n",          # 4 tokens: 10..13 -> seq 2, no cross
        ]),
    }
    pq.write_table(pa.table(rows), tmp_path / "documents.parquet")
    old = q.SEQ_PACK_LEN
    q.SEQ_PACK_LEN = 5
    try:
        got = q.sequence_pack(str(tmp_path)).to_pandas()
    finally:
        q.SEQ_PACK_LEN = old
    assert got["n_tokens"].tolist() == [7, 0, 3, 4]
    assert got["first_seq"].tolist() == [0, 1, 1, 2]
    assert got["last_seq"].tolist() == [1, 1, 1, 2]
    assert got["offset_in_seq"].tolist() == [0, 2, 2, 0]
    assert got["crosses"].tolist() == [True, False, False, False]
