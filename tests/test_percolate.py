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


def test_significant_terms_oracle_and_planted(ray_session, tmp_path,
                                              monkeypatch):
    """Oracle equivalence at sf0.001, plus a planted-lift check: a term
    appearing ONLY inside the foreground must outrank every
    corpus-uniform term (its lift is N/n_fg, the maximum)."""
    import numpy as np

    from pdfsearch_ray.pipelines.sigterms import (significant_terms,
                                                  significant_terms_sql)

    t = significant_terms(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    o = con.execute(significant_terms_sql()).fetchdf()
    t2 = t.sort_values(["query", "rank"]).reset_index(drop=True)
    o2 = o[t2.columns].sort_values(["query", "rank"]).reset_index(drop=True)
    assert len(t2) == len(o2) and len(t2) > 0
    for c in t2.columns:
        a, b = t2[c].to_numpy(), o2[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b.astype(float), rtol=0, atol=1e-9), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c
    # lift is maximal (= N / n_fg) exactly when bg_df == fg_df, i.e.
    # the term lives ONLY in the foreground
    for _, r in t.iterrows():
        assert r["fg_df"] <= r["bg_df"]
        assert r["lift"] > 0


def test_significant_terms_planted_exclusive(ray_session, tmp_path,
                                             monkeypatch):
    """Plant a corpus where 'zebra' occurs only in docs matching the
    query: it must rank first with lift == N / n_fg exactly."""
    import numpy as np
    import pdfsearch_ray.pipelines.sigterms as sig
    import pdfsearch_ray.pipelines.expand as expand

    n, n_fg = 40, 10
    texts = []
    for i in range(n):
        if i < n_fg:
            texts.append("anchor zebra filler" + f" pad{i % 3}")
        else:
            texts.append("plain filler words" + f" pad{i % 3}")
    docs = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * n, type=pa.string()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    monkeypatch.setenv("PDFSEARCH_SPILL_ROOT", str(tmp_path / "spill"))
    monkeypatch.setattr(sig, "SIG_QUERIES", ("anchor",))
    monkeypatch.setattr(sig, "SIG_MIN_FG", 2)
    t = sig.significant_terms(str(tmp_path)).to_pandas()
    assert t.iloc[0]["term"] == "zebra"
    assert abs(t.iloc[0]["lift"] - round(n / n_fg, 6)) < 1e-9
    # corpus-uniform fillers sit at lift 1.0
    filler = t[t["term"] == "filler"]
    assert len(filler) == 1 and abs(filler.iloc[0]["lift"] - 1.0) < 1e-9
