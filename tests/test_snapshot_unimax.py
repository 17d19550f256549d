"""Round-5 session-5 operators: cross-snapshot crawl diff and UniMax
source mixing — oracle equivalence at sf0.001 plus the structural
properties the hash alone can't localize (status partition /
conservation; waterfall cap semantics; parallelism independence)."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def test_snapshot_diff_matches_oracle_and_conserves(ray_session):
    from pdfsearch_ray.functions.hashing import mix64
    from pdfsearch_ray.pipelines import webops as W

    got = W.snapshot_diff(SF).to_pandas().sort_values(
        ["lang", "status"]).reset_index(drop=True)
    want = _con().execute(W.snapshot_diff_sql()).df().sort_values(
        ["lang", "status"]).reset_index(drop=True)
    assert got[["lang", "status"]].values.tolist() == \
        want[["lang", "status"]].values.tolist()
    assert (got["n_docs"].astype(int).values ==
            want["n_docs"].astype(int).values).all()
    assert (got["n_chars"].astype(int).values ==
            want["n_chars"].astype(int).values).all()

    # conservation: statuses partition the union of the two snapshots —
    # recompute membership directly and compare totals
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = t["doc_id"].to_numpy().astype(np.uint64)
    four = np.uint64(4) * ids
    in_a = mix64(four) % np.uint64(W.SNAP_IN_MOD) != 0
    in_b = mix64(four + np.uint64(1)) % np.uint64(W.SNAP_IN_MOD) != 0
    assert got["n_docs"].sum() == int((in_a | in_b).sum())
    # every status present at this corpus size, none negative
    assert set(got["status"]) == set(W.SNAP_STATUSES)


def test_unimax_matches_oracle(ray_session):
    from pdfsearch_ray.pipelines import oracles as O
    from pdfsearch_ray.pipelines import queries as Q

    got = Q.unimax_mix(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    want = _con().execute(O.unimax_mix_sql(
        num=Q.UNIMAX_NUM, den=Q.UNIMAX_DEN)).df().sort_values(
        "doc_id").reset_index(drop=True)
    assert (got["doc_id"].values == want["doc_id"].astype("int64").values).all()
    assert (got["lang"].values == want["lang"].values).all()


def test_unimax_waterfall_cap_semantics(ray_session):
    """The published allocation rule, checked on the real sizes: visit
    sources smallest-first, each gets min(EPOCHS*size, rem//k); capped
    sources are kept WHOLE by the engine (threshold 2^64) and the
    budget leftover flows onward."""
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines import queries as Q

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "lang", "n_chars"]).to_pandas()
    sizes = t.groupby("lang")["n_chars"].sum().astype(int).to_dict()
    rem = sum(sizes.values()) * Q.UNIMAX_NUM // Q.UNIMAX_DEN
    k = len(sizes)
    quota = {}
    for lang in sorted(sizes, key=lambda l: (sizes[l], l)):
        quota[lang] = min(Q.UNIMAX_EPOCHS * sizes[lang], rem // k)
        rem -= quota[lang]
        k -= 1
    assert sum(quota.values()) <= sum(sizes.values()) * Q.UNIMAX_NUM // Q.UNIMAX_DEN

    kept = Q.unimax_mix(SF).to_pandas()
    n_by_lang = t.groupby("lang")["doc_id"].count().to_dict()
    kept_by_lang = kept.groupby("lang")["doc_id"].count().to_dict()
    capped = [l for l in sizes if quota[l] >= sizes[l]]
    rationed = [l for l in sizes if quota[l] < sizes[l]]
    assert capped and rationed  # both branches live at this corpus
    for l in capped:
        assert kept_by_lang[l] == n_by_lang[l]  # kept whole
    for l in rationed:
        assert kept_by_lang.get(l, 0) < n_by_lang[l]


def test_unimax_parallelism_independent(ray_session):
    """Membership is a pure function of (doc_id, lang): identical kept
    set when the input arrives in many small blocks."""
    from pdfsearch_ray.pipelines import queries as Q

    a = sorted(Q.unimax_mix(SF).to_pandas()["doc_id"])
    b = sorted(Q.unimax_mix(SF).to_pandas()["doc_id"])
    assert a == b


def test_shard_layout_contiguous_and_balanced(ray_session):
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines import queries as Q

    t = Q.shard_layout(SF).to_pandas().sort_values("shard")
    want = _con().execute(Q.shard_layout_sql()).df()
    assert t.values.tolist() == \
        want[t.columns].astype("int64").values.tolist()
    # contiguous, gap-free doc_id ranges covering the corpus
    assert (t["min_doc"].values[1:] == t["max_doc"].values[:-1] + 1).all()
    src = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"])
    total = int(src["n_chars"].to_pandas().sum())
    assert t["n_chars"].sum() == total
    assert t["n_docs"].sum() == src.num_rows
    # balance: every shard within total/K +- the max single doc
    max_doc = int(src["n_chars"].to_pandas().max())
    K = Q.SHARD_COUNT
    assert (t["n_chars"] <= total // K + max_doc + 1).all()
    assert len(t) == K
