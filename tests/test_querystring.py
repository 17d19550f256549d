"""Query-string parser + executor (pipelines/querystring.py)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_parser_planted():
    from pdfsearch_ray.pipelines.querystring import parse_query_string

    p = parse_query_string('data +filter -dup "fast scan" merge^2.5 merge')
    assert p["terms"]["data"] == ["should", 1.0]
    assert p["terms"]["filter"] == ["must", 1.0]
    assert p["terms"]["dup"] == ["must_not", 1.0]
    # repeated clauses sum boosts (Lucene rule)
    assert p["terms"]["merge"] == ["should", 3.5]
    assert p["phrases"][("fast", "scan")] == ["should", 1.0]
    # a must/must_not prefix on any repetition wins over should
    p2 = parse_query_string("big +big")
    assert p2["terms"]["big"] == ["must", 2.0]
    # boosted phrase with prefix
    p3 = parse_query_string('-"slow merge"^2')
    assert p3["phrases"][("slow", "merge")] == ["must_not", 2.0]
    # single-word "phrase" degrades to a term clause
    p4 = parse_query_string('"table"')
    assert p4["terms"]["table"] == ["should", 1.0]
    assert not p4["phrases"]


def test_querystring_matches_oracle_and_semantics(ray_session):
    """Full DuckDB replay at sf0.001 (the driver checks sf0.01) — this
    also regression-covers the mixed-decode-handle bug: queries that
    share terms with an earlier query's PHRASE clause must still score
    with real idf (the first implementation returned idf=1.0-scaled
    contributions for such terms)."""
    from pdfsearch_ray.pipelines.querystring import (QS_QUERIES,
                                                     querystring_sql,
                                                     querystring_topk)

    got = (querystring_topk(SF).to_pandas()
           .sort_values(["query", "rank"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(querystring_sql()).fetchdf()
    want = (want[got.columns].sort_values(["query", "rank"])
            .reset_index(drop=True))
    assert len(got) == len(want) and len(got) > 0
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["score"], want["score"], rtol=0, atol=1e-9)
    # semantics spot-checks from raw text
    text_of = dict(con.execute(
        "SELECT doc_id, lower(text) FROM documents").fetchall())
    for _, r in got.iterrows():
        txt = text_of[r["doc_id"]]
        q = r["query"]
        if "+filter" in q:
            assert "filter" in txt
        if "-dup" in q:
            assert "dup" not in txt.replace("dup", "dup")  # presence check below
    # must_not truly excludes: no result doc for the -dup query has dup
    import re

    g = got[got["query"] == 'data +filter -dup "fast scan"']
    for d in g["doc_id"]:
        toks = re.split(r"[^a-z0-9]+", text_of[d])
        assert "dup" not in toks
        assert "filter" in toks
