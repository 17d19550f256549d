"""Distributed HLL sketch (pipelines/sketches.py, round 5): estimator
accuracy at real cardinalities, partial-merge associativity, and the
gate query against its DuckDB oracle."""

import duckdb
import numpy as np

from pdfsearch_ray.pipelines import sketches as sk

SF = "/root/testdata/sf0.001"


def test_hll_estimator_accuracy_large():
    """~2^P=4096 registers give ~1.6% standard error; assert within 5%
    at three cardinalities spanning the linear-counting handoff."""
    for n in (500, 20_000, 300_000):
        hashes = sk._hash_u64([f"tok-{i}-x" for i in range(n)])
        reg, rho = sk.hll_partial(hashes)
        est = sk.hll_estimate(reg, rho)
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_partial_merge_associative():
    """Merging per-batch partials by register max == one-shot sketch."""
    toks = [f"w{i}" for i in range(50_000)]
    h = sk._hash_u64(toks)
    reg_a, rho_a = sk.hll_partial(h[:17_000])
    reg_b, rho_b = sk.hll_partial(h[17_000:])
    merged = np.zeros(sk.HLL_M, dtype=np.int64)
    np.maximum.at(merged, reg_a, rho_a)
    np.maximum.at(merged, reg_b, rho_b)
    reg_1, rho_1 = sk.hll_partial(h)
    one = np.zeros(sk.HLL_M, dtype=np.int64)
    one[reg_1] = rho_1
    assert np.array_equal(merged, one)


def test_vocab_sketch_matches_oracle(ray_session):
    t = sk.vocab_hll_sketch(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    o = con.sql(sk.vocab_hll_sketch_sql()).df().reset_index(drop=True)
    assert len(t) > 0
    assert t.equals(o.astype(t.dtypes.to_dict()))
    # the estimate folded from the gated registers matches the exact
    # distinct-token count (linear-counting regime at this vocab size)
    est = sk.hll_estimate(t["reg"].to_numpy(), t["max_rho"].to_numpy())
    exact = con.sql(
        "SELECT count(DISTINCT term) FROM (SELECT unnest("
        "regexp_split_to_array(lower(text),'[^a-z0-9]+')) AS term "
        "FROM documents) WHERE term <> ''").fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_cms_matches_oracle_and_bounds(ray_session):
    t = sk.term_cms_sketch(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    o = con.sql(sk.term_cms_sketch_sql()).df().reset_index(drop=True)
    assert t.equals(o.astype(t.dtypes.to_dict()))
    # CMS invariants vs exact counts: estimate >= truth (always), and
    # equal here because 31-term vocab has no collisions to speak of
    sketch = {(int(r), int(c)): int(n)
              for r, c, n in zip(t["row"], t["col"], t["n"])}
    tf = dict(con.sql(
        "SELECT term, count(*) FROM (SELECT unnest("
        "regexp_split_to_array(lower(text),'[^a-z0-9]+')) AS term "
        "FROM documents) WHERE term <> '' GROUP BY term").fetchall())
    for term, true_n in tf.items():
        assert sk.cms_query(sketch, term) >= true_n
    # each row's cells sum to the total token count (mass conservation)
    total = sum(tf.values())
    sums = t.groupby("row")["n"].sum()
    assert (sums == total).all()


def test_cms_heavy_hitters_synthetic():
    """Zipf stream of 50k distinct terms: the CMS point query bounds
    every count above and recovers the exact top-10 heavy hitters."""
    rng = np.random.RandomState(3)
    terms = [f"t{i}" for i in range(50_000)]
    counts = (1_000_000 / (np.arange(1, 50_001) ** 1.2)).astype(np.int64)
    counts = np.maximum(counts, 1)
    part = sk.cms_partial(terms, counts)
    sketch = {(int(r), int(c)): int(n) for r, c, n in
              zip(part["row"].to_pylist(), part["col"].to_pylist(),
                  part["n"].to_pylist())}
    total = int(counts.sum())
    eps_bound = 2.0 * np.e * total / sk.CMS_W  # loose 2x cushion
    for i in list(range(10)) + [499, 4999, 49_999]:
        est = sk.cms_query(sketch, terms[i])
        assert est >= counts[i]
        assert est <= counts[i] + eps_bound
    # top-10 by estimate == top-10 by truth (heads dominate collisions)
    est_all = {t_: sk.cms_query(sketch, t_) for t_ in terms[:200]}
    top_est = sorted(est_all, key=lambda k: -est_all[k])[:10]
    assert set(top_est) == {f"t{i}" for i in range(10)}


def test_bloom_kernel_no_false_negatives():
    keys = [f"doc {i} content words" for i in range(2000)]
    pos = sk.bloom_positions(sk._hash_u64(keys))
    assert pos.shape == (2000, sk.BLOOM_K)
    assert pos.min() >= 0 and pos.max() < sk.BLOOM_M
    words = np.zeros(sk.BLOOM_M // 64, dtype=np.uint64)
    p = pos.ravel()
    np.bitwise_or.at(words, p // 64,
                     np.uint64(1) << (p % 64).astype(np.uint64))
    # every inserted key IS a member (Bloom guarantee: no false negs)
    assert sk.bloom_member(words, keys).all()
    # fp rate on fresh keys stays near theory ((fill)^K)
    fresh = [f"other {i}" for i in range(5000)]
    fp = sk.bloom_member(words, fresh).mean()
    fill = np.unpackbits(words.view(np.uint8)).mean()
    assert fp <= max(4 * fill ** sk.BLOOM_K, 1e-3)


def test_bloom_snapshot_dedup_semantics(ray_session):
    import duckdb
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    t = sk.bloom_snapshot_dedup(sf).to_pandas()
    # brute-force expectation: member iff key text is in the snapshot
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    snap = d[d.doc_id % 2 == 0]
    stext = set(snap["text"])
    by_id = dict(zip(d.doc_id, d.text))
    exp = []
    for did in sorted(d.doc_id[d.doc_id % 2 == 1]):
        key = by_id.get(did - 1, by_id[did]) \
            if did % sk.BLOOM_DUP_MOD == 0 else by_id[did]
        exp.append(int(key in stext))
    assert t["member"].tolist() == exp  # no fp at this fill (1e-11)
    assert sum(exp) > 0                 # planted dups exist and flag
    # oracle parity at this sf too
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    o = con.sql(sk.bloom_snapshot_dedup_sql()).df()
    assert t["member"].tolist() == o["member"].astype(int).tolist()
