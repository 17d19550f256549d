"""Snippet best-window (pipelines/snippets.py) + clarity QPP
(pipelines/qpp.py) planted pins."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _mk_corpus(tmp_path):
    f = "x"  # filler token, never a query term
    docs = [
        # all three terms adjacent: best window = 3 terms at pos 1
        (1, "data stream filter"),
        # data@1, stream@8 inside one W=8 window, filter far away:
        # best window = 2 terms at pos 1
        (2, " ".join(["data"] + [f] * 6 + ["stream"] + [f] * 10
                     + ["filter"])),
        # two 2-term windows (data@1,stream@2) and (stream@12,filter@13):
        # equal count -> LEFTMOST start wins
        (3, " ".join(["data", "stream"] + [f] * 9
                     + ["stream", "filter"])),
        # single lonely term: 1-term window
        (4, " ".join([f] * 5 + ["filter"] + [f] * 5)),
        (5, " ".join([f] * 8)),   # no query terms at all
    ]
    t = pa.table({
        "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
        "text": pa.array([s for _, s in docs], type=pa.string()),
        "lang": pa.array(["en"] * len(docs), type=pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_snippet_best_window_planted(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.snippets import snippet_windows

    out = snippet_windows(_mk_corpus(tmp_path)).to_pandas()
    g = out[out["query"] == "data stream filter"].set_index("doc_id")
    assert g.loc[1, "win_terms"] == 3 and g.loc[1, "win_start"] == 1
    assert g.loc[2, "win_terms"] == 2 and g.loc[2, "win_start"] == 1
    # tie broken leftmost
    assert g.loc[3, "win_terms"] == 2 and g.loc[3, "win_start"] == 1
    assert g.loc[4, "win_terms"] == 1 and g.loc[4, "win_start"] == 6
    assert 5 not in g.index
    # ranking: (win_terms desc, doc asc)
    assert g.sort_values("rank").index.tolist() == [1, 2, 3, 4]


def test_snippet_matches_oracle_on_corpus(ray_session):
    """Full-fidelity replay at sf0.001 (the driver checks sf0.01)."""
    import duckdb

    from pdfsearch_ray.pipelines.snippets import snippet_sql, \
        snippet_windows

    got = (snippet_windows(SF).to_pandas()
           .sort_values(["query", "rank"]).reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = con.sql(snippet_sql()).df().reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["win_start"].tolist() == want["win_start"].tolist()
    assert got["win_terms"].tolist() == want["win_terms"].tolist()


def test_clarity_rare_query_is_most_focused(ray_session):
    from pdfsearch_ray.pipelines.qpp import query_clarity

    out = query_clarity(SF).to_pandas().set_index("query")
    # every query retrieves a full feedback set on this corpus
    assert (out["n_feedback"] == 10).all()
    # clarity is positive (it's a KL divergence)
    assert (out["clarity"] > 0).all()
    # the rare focused term beats every head/stopword-ish query
    assert out.loc["dup", "clarity"] == out["clarity"].max()


def test_ndcg_bounds_and_single_term_perfection(ray_session):
    """nDCG ∈ [0,1]; a single-term query's grades are uniform so its
    BM25 top-10 is trivially ideal (nDCG == 1); multi-term queries on
    this corpus are imperfect (< 1 for at least one)."""
    from pdfsearch_ray.pipelines.ireval import ndcg_eval

    out = ndcg_eval(SF).to_pandas().set_index("query")
    assert ((out["ndcg10"] >= 0) & (out["ndcg10"] <= 1 + 1e-9)).all()
    assert (out["dcg10"] <= out["idcg10"] + 1e-9).all()
    # "information" is OOV in the synthetic vocab: all-zero row
    z = out.loc["information"]
    assert (z[["dcg10", "idcg10", "ndcg10"]] == 0).all()
    assert z["n_graded"] == 0
    # matched queries: the ratio column is consistent with its parts,
    # and raw-tf-mass grades make BM25 imperfect EVERYWHERE it matches
    # (the discriminative-metric property the gate's docstring claims)
    m = out[out["n_graded"] > 0]
    assert len(m) >= 3
    for _, r in m.iterrows():
        assert abs(r["ndcg10"]
                   - round(r["dcg10"] / r["idcg10"], 6)) <= 2e-6
    assert (m["ndcg10"] < 1.0).all()
    assert (m["ndcg10"] > 0.2).all()   # but far from random either
