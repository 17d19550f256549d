"""Pins for match_phrase_prefix and filtered vector search."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_phrase_prefix_full_term_degenerates_to_phrase(ray_session):
    """A prefix that exactly equals one dictionary term must reproduce
    the exact PhraseQuery ranking for that phrase."""
    from pdfsearch_ray.pipelines.boolquery import (
        phrase_prefix_topk, phrase_topk)

    # 'fast scan' is a PHRASE_TOPK_QUERIES member; 'scan' is a full
    # dictionary term and no other term starts with 'scan'
    pp = phrase_prefix_topk(SF, queries=("fast scan",)).to_pandas()
    pt = phrase_topk(SF).to_pandas()
    want = pt[pt["query"] == "fast scan"].sort_values("rank")
    got = pp.sort_values("rank")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["phrase_tf"].tolist() == want["phrase_tf"].tolist()
    assert np.allclose(got["score"], want["score"], atol=0)


def test_phrase_prefix_oov_prefix_yields_no_rows(ray_session):
    from pdfsearch_ray.pipelines.boolquery import phrase_prefix_topk

    pp = phrase_prefix_topk(SF, queries=("data zzzqx",)).to_pandas()
    assert len(pp) == 0


def test_phrase_prefix_expansion_sums_tf(ray_session):
    """Planted corpus: 'aa b' must match both 'aa bb' and 'aa bc' and
    sum their occurrence counts per doc."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines.boolquery import phrase_prefix_topk

    docs = [
        "aa bb x aa bc y aa bb",        # tf = 2 (bb) + 1 (bc) = 3
        "aa bb z z z z z z",            # tf = 1
        "bb aa z aa cc",                # no match ('cc' not 'b*')
    ]
    d = tempfile.mkdtemp(prefix="pp_")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(["en"] * len(docs)),
    }), os.path.join(d, "documents.parquet"))
    t = phrase_prefix_topk(d, queries=("aa b",)).to_pandas()
    got = dict(zip(t["doc_id"], t["phrase_tf"]))
    assert got == {0: 3, 1: 1}


def test_ann_filtered_results_all_satisfy_predicate(ray_session):
    """Every hit must share its query's label (pre-filter semantics),
    and ranks within the filtered pool must match a brute-force
    recompute."""
    import duckdb

    from pdfsearch_ray.pipelines.queries import (
        ANN_NUM_QUERIES, ann_filtered)

    t = ann_filtered(SF).to_pandas()
    con = duckdb.connect()
    lab = con.execute(
        f"SELECT vec_id, label FROM '{SF}/embeddings.parquet'"
    ).fetchdf().set_index("vec_id")["label"]
    for r in t.itertuples():
        assert lab[r.vec_id] == lab[r.query_id], r
        assert r.vec_id >= ANN_NUM_QUERIES
    # filtered top-1 sim can never exceed the unfiltered top-1
    from pdfsearch_ray.pipelines.queries import ann_cosine_topk

    full = ann_cosine_topk(SF).to_pandas()
    for qid in t["query_id"].unique():
        f1 = t[(t["query_id"] == qid) & (t["rank"] == 1)]["sim"].iloc[0]
        u1 = full[(full["query_id"] == qid)
                  & (full["rank"] == 1)]["sim"].iloc[0]
        assert f1 <= u1 + 1e-12
