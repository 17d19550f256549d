"""BM25F multi-field ranking (pipelines/fields.py): oracle
equivalence, and a planted corpus proving the title-field weight is
load-bearing (same term, same dl — title placement must outrank body
placement) including the exact title/body boundary position."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_bm25f_matches_oracle(ray_session):
    from pdfsearch_ray.pipelines import fields as F

    got = F.bm25f_topk(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(F.bm25f_topk_sql()).df()
    t2 = got.sort_values(["query", "rank"]).reset_index(drop=True)
    o2 = want[t2.columns].sort_values(
        ["query", "rank"]).reset_index(drop=True)
    assert len(t2) == len(o2) > 0
    for c in t2.columns:
        a, b = t2[c].to_numpy(), o2[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(float), rtol=0, atol=1e-9), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_title_weight_drives_rank(ray_session, tmp_path, monkeypatch):
    """Three 12-token docs, one 'alpha' each: at title position 0, at
    the LAST title slot (0-based 7), and at the first body slot
    (0-based 8).  Title hits must tie each other and outrank the body
    hit; the boundary sits exactly at BM25F_TITLE_LEN."""
    from pdfsearch_ray.pipelines import fields as F

    pad = ["p%d" % i for i in range(12)]
    mk = lambda at: " ".join(
        ["alpha" if i == at else pad[i] for i in range(12)])
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": [mk(0), mk(F.BM25F_TITLE_LEN - 1), mk(F.BM25F_TITLE_LEN)],
        "lang": ["en"] * 3,
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    monkeypatch.setattr(F, "BM25F_QUERIES", ("alpha",))
    got = F.bm25f_topk(str(tmp_path)).to_pandas()
    assert len(got) == 3
    by_doc = got.set_index("doc_id")
    # both title placements score identically, body placement lower
    assert by_doc.loc[1, "score"] == by_doc.loc[2, "score"]
    assert by_doc.loc[1, "score"] > by_doc.loc[3, "score"]
    assert sorted(got.loc[got["rank"] <= 2, "doc_id"]) == [1, 2]

    # and the oracle agrees on the planted corpus
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet'")
    want = con.execute(F.bm25f_topk_sql(queries=("alpha",))).df()
    w2 = want.sort_values("rank").reset_index(drop=True)
    g2 = got.sort_values("rank").reset_index(drop=True)
    assert (g2["doc_id"].values == w2["doc_id"].astype("int64").values).all()
    assert np.allclose(g2["score"], w2["score"], atol=1e-9)
