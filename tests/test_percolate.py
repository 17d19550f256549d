"""Percolator (stored-query matching, pipelines/percolate.py)."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_percolate_matches_oracle_small(ray_session):
    from pdfsearch_ray.pipelines.percolate import (percolate_matches,
                                                   percolate_sql)

    t = percolate_matches(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    o = con.execute(percolate_sql()).fetchdf()
    assert len(t) == len(o) and len(t) > 0
    assert (t["query_id"].to_numpy() == o["query_id"].to_numpy()).all()
    assert (t["doc_id"].to_numpy() == o["doc_id"].to_numpy()).all()
    # the registered-but-unmatchable alert never fires
    assert "alert_never" not in set(t["query_id"])


def test_percolate_and_semantics_planted(ray_session, tmp_path,
                                         monkeypatch):
    """AND semantics on a planted corpus: full cover matches, partial
    cover doesn't, repeated terms count once, case/punct normalize."""
    import pdfsearch_ray.pipelines.percolate as perc

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "Stream TABLE vector stream stream",   # all 3 (dups, case)
            "stream table only here",              # 2 of 3 -> no match
            "vector, table; stream!",              # punct split -> match
            "nothing relevant",
        ], type=pa.string()),
    })
    d = tmp_path / "documents.parquet"
    pq.write_table(docs, str(d))
    monkeypatch.setattr(
        perc, "PERC_QUERIES",
        (("alert_stv", "stream table vector"),
         ("alert_str", "stream")))
    t = perc.percolate_matches(str(tmp_path)).to_pandas()
    got = {(r["query_id"], r["doc_id"]) for _, r in t.iterrows()}
    assert got == {("alert_stv", 0), ("alert_stv", 2),
                   ("alert_str", 0), ("alert_str", 1), ("alert_str", 2)}
