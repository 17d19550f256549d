"""Result-shaping search features (pipelines/searchx.py): oracle
equivalence on sf0.001 plus the structural invariants — facet counts
partition the match set, MLT never returns its seed, and the
search-after cursor reproduces the rank-sliced page exactly."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def test_searchx_match_oracles(ray_session):
    from pdfsearch_ray.pipelines import searchx as X

    for fn, sql in ((X.facet_counts, X.facet_counts_sql()),
                    (X.mlt_topk, X.mlt_topk_sql()),
                    (X.search_after, X.search_after_sql()),
                    (X.filtered_topk, X.filtered_topk_sql()),
                    (X.field_sorted_topk, X.field_sorted_topk_sql())):
        got = fn(SF).to_pandas()
        want = _con().execute(sql).df()
        assert len(got) == len(want) > 0, fn.__name__
        for col in got.columns:
            a, b = got[col].to_numpy(), want[col].to_numpy()
            if a.dtype.kind == "f":
                assert np.allclose(a, b.astype(float), atol=1e-9), (fn.__name__, col)
            else:
                assert (a.astype(str) == b.astype(str)).all(), (fn.__name__, col)


def test_facets_partition_match_set(ray_session):
    """Per query, the facet counts sum to the OR match-set size and the
    per-facet best_score never exceeds the global best."""
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as X
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(simple_index_cached(SF))
    t = X.facet_counts(SF).to_pandas()
    for q, grp in t.groupby("query"):
        ids, sc = idx.score_terms(sorted(set(analyze_simple(q))))
        assert grp["n_docs"].sum() == ids.size
        assert grp["best_score"].max() == np.round(sc, 6).max()


def test_mlt_excludes_seed_and_is_ranked(ray_session):
    from pdfsearch_ray.pipelines import searchx as X

    t = X.mlt_topk(SF).to_pandas()
    assert (t["seed_doc"] != t["doc_id"]).all()
    for _, grp in t.groupby("seed_doc"):
        s = grp.sort_values("rank")
        assert (np.diff(s["score"].to_numpy()) <= 1e-12).all()
        assert list(s["rank"]) == list(range(1, len(s) + 1))


def test_filtered_is_score_preserving_subset(ray_session):
    """Every filtered hit has the filter's lang (checked against the
    raw docs) and carries the SAME score it has in the unfiltered
    ranking — filtering restricts candidates, never re-weights."""
    import pyarrow.parquet as pq

    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as X
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    langs = dict(zip(*[pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang"])[c].to_pylist()
        for c in ("doc_id", "lang")]))
    idx = BM25Index(simple_index_cached(SF))
    t = X.filtered_topk(SF).to_pandas()
    assert len(t) > 0
    flt_of = dict(X.FILTER_QUERIES)
    for (q, f), grp in t.groupby(["query", "lang"]):
        assert flt_of[q] == f
        ids, sc = idx.score_terms(sorted(set(analyze_simple(q))))
        full = dict(zip(ids.astype(np.int64).tolist(),
                        np.round(sc, 6).tolist()))
        for d, s in zip(grp["doc_id"], grp["score"]):
            assert langs[d] == f
            assert full[d] == s


def test_field_sort_orders_by_n_chars(ray_session):
    from pdfsearch_ray.pipelines import searchx as X

    t = X.field_sorted_topk(SF).to_pandas()
    assert len(t) > 0
    for _, grp in t.groupby("query"):
        s = grp.sort_values("rank")
        nc = s["n_chars"].to_numpy()
        assert (np.diff(nc) <= 0).all()


def test_search_after_cursor_matches_rank_slice(ray_session):
    """Page 2 from the cursor predicate equals ranks K+1..2K of one
    global ranking computed independently."""
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as X
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(simple_index_cached(SF))
    t = X.search_after(SF).to_pandas()
    for q, grp in t.groupby("query"):
        ids, sc = idx.score_terms(sorted(set(analyze_simple(q))))
        sc6 = np.round(sc, 6)
        order = np.lexsort((ids.astype(np.int64), -sc6))
        full_ids = ids[order].astype(np.int64)
        got = grp.sort_values("rank")
        n = len(got)
        assert got["doc_id"].to_numpy().tolist() == full_ids[:n].tolist()
        p2 = got[got["page"] == 2]
        if len(p2):
            assert p2["rank"].min() == X.SA_K + 1


def test_spell_and_pmi_match_oracles(ray_session):
    from pdfsearch_ray.pipelines import searchx as X

    for fn, sql in ((X.spell_suggest, X.spell_suggest_sql()),
                    (X.related_terms, X.related_terms_sql())):
        got = fn(SF).to_pandas()
        want = _con().execute(sql).df()
        assert len(got) == len(want) > 0, fn.__name__
        for col in got.columns:
            a, b = got[col].to_numpy(), want[col].to_numpy()
            if a.dtype.kind == "f":
                assert np.allclose(a, b.astype(float), atol=1e-9), col
            else:
                assert (a.astype(str) == b.astype(str)).all(), (fn.__name__, col)


def test_spell_exact_hit_wins_and_oov_drops(ray_session):
    """An in-dictionary input suggests itself (distance 0 beats any df);
    an input with no distance<=1 neighbour emits no row."""
    from pdfsearch_ray.pipelines import searchx as X

    t = X.spell_suggest(SF).to_pandas().set_index("input")
    assert t.loc["fast", "suggestion"] == "fast"
    assert "zzzq" not in t.index
    assert (t["df"] > 0).all()


def test_pmi_counts_are_bounded_and_recomputable(ray_session):
    """co <= min(df_target, df_term); pmi recomputes from (co, dfs, N)."""
    import pyarrow.parquet as pq

    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as X

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    term_sets = {d: set(analyze_simple(t or "")) for d, t in
                 zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())}
    n = sum(1 for s in term_sets.values() if s)
    t = X.related_terms(SF).to_pandas()
    assert len(t) > 0
    for row in t.itertuples():
        dfx = sum(1 for s in term_sets.values() if row.target in s)
        dfy = sum(1 for s in term_sets.values() if row.term in s)
        co = sum(1 for s in term_sets.values()
                 if row.target in s and row.term in s)
        assert co == row.co >= X.PMI_MIN_CO
        assert co <= min(dfx, dfy)
        assert abs(row.pmi - round(np.log((co * n) / (dfx * dfy)), 6)) < 1e-9


def test_collapse_and_range_match_oracles(ray_session):
    from pdfsearch_ray.pipelines import searchx as X

    for fn, sql in ((X.collapse_topk, X.collapse_topk_sql()),
                    (X.range_facets, X.range_facets_sql())):
        got = fn(SF).to_pandas()
        want = _con().execute(sql).df()
        assert len(got) == len(want) > 0, fn.__name__
        for col in got.columns:
            a, b = got[col].to_numpy(), want[col].to_numpy()
            if a.dtype.kind == "f":
                assert np.allclose(a, b.astype(float), atol=1e-9), (fn.__name__, col)
            else:
                assert (a.astype(str) == b.astype(str)).all(), (fn.__name__, col)


def test_collapse_one_winner_per_source_and_argmax(ray_session):
    """Per query: sources are distinct, every returned doc is its
    source's (score desc, doc_id asc) argmax over the full OR match
    set, and the collapsed ranking is the winners' score order."""
    import pyarrow.dataset as pds

    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as X
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(simple_index_cached(SF))
    cat = pds.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id", "source"])
    src_of = dict(zip(cat["doc_id"].to_pylist(), cat["source"].to_pylist()))

    df = X.collapse_topk(SF).to_pandas()
    for q, grp in df.groupby("query"):
        assert grp["source"].is_unique
        assert (grp["score"].values[:-1] >= grp["score"].values[1:]).all()
        ids, sc = idx.score_terms(sorted(set(analyze_simple(q))))
        sc6 = np.round(sc, 6)
        for _, row in grp.iterrows():
            members = [(s, int(i)) for i, s in zip(
                ids.astype(np.int64), sc6) if src_of[int(i)] == row["source"]]
            best = max(members, key=lambda t: (t[0], -t[1]))
            assert (row["doc_id"], round(row["score"], 6)) == (
                best[1], round(best[0], 6))


def test_range_facets_partition_match_set(ray_session):
    """Band counts sum to the OR match-set size per query (the bands
    cover [0, inf) so nothing can fall outside)."""
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as X
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(simple_index_cached(SF))
    df = X.range_facets(SF).to_pandas()
    for q, grp in df.groupby("query"):
        ids, _ = idx.score_terms(sorted(set(analyze_simple(q))))
        assert grp["n_docs"].sum() == ids.size


def test_explain_and_stats_match_oracles(ray_session):
    from pdfsearch_ray.pipelines import searchx as X

    for fn, sql in ((X.explain_scores, X.explain_scores_sql()),
                    (X.index_stats, X.index_stats_sql())):
        got = fn(SF).to_pandas()
        want = _con().execute(sql).df()
        assert len(got) == len(want) > 0, fn.__name__
        for col in got.columns:
            a, b = got[col].to_numpy(), want[col].to_numpy()
            if a.dtype.kind == "f":
                assert np.allclose(a, b.astype(float), atol=1e-9), (fn.__name__, col)
            else:
                assert (a.astype(str) == b.astype(str)).all(), (fn.__name__, col)


def test_explain_parts_sum_to_score(ray_session):
    """Per (query, doc): the per-term contributions sum to the doc's
    BM25 score on the plain ranking — the Explain invariant."""
    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as X
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    idx = BM25Index(simple_index_cached(SF))
    df = X.explain_scores(SF).to_pandas()
    assert df["rank"].max() == X.EXPLAIN_TOP
    for (q, d), grp in df.groupby(["query", "doc_id"]):
        ids, sc = idx.score_terms(sorted(set(analyze_simple(q))))
        s = float(sc[ids.astype(np.int64) == d][0])
        assert abs(grp["score_part"].sum() - s) < 5e-6, (q, d)


def test_term_vectors_oracle_and_positions(ray_session):
    """Term vectors: oracle equivalence at sf0.001; tf sums to dl per
    doc; first_pos of the doc's opening token is 1."""
    import duckdb
    import numpy as np

    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as S

    sf = "/root/testdata/sf0.001"
    got = S.term_vectors(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(S.term_vectors_sql()).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert (got[c].to_numpy().astype(str)
                == want[c].to_numpy().astype(str)).all(), c
    # per doc: one term has first_pos == 1 (the opening token), and
    # the tf sum equals the analyzed token count
    import pyarrow.parquet as pq

    texts = dict(zip(*[
        pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])[c].to_pylist()
        for c in ("doc_id", "text")]))
    for did, g in got.groupby("doc_id"):
        toks = analyze_simple(texts[int(did)])
        assert g["tf"].sum() == len(toks)
        assert (g["first_pos"] == 1).sum() == 1
        assert g.loc[g["first_pos"] == 1, "term"].iloc[0] == toks[0]


def test_phrase_suggest_oracle_and_correction(ray_session):
    """Phrase suggester: oracle equivalence; every suggestion's count
    equals the positional phrase probe; suggestions are within edit 1
    of the inputs per position."""
    import duckdb

    from pdfsearch_ray.analysis.analyzer import analyze_simple
    from pdfsearch_ray.pipelines import searchx as S
    from pdfsearch_ray.pipelines.boolquery import phrase_counts_from_index
    from pdfsearch_ray.pipelines.expand import simple_index_cached
    from pdfsearch_ray.pipelines.query import BM25Index

    sf = "/root/testdata/sf0.001"
    got = S.phrase_suggest(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = con.execute(S.phrase_suggest_sql()).df()
    t2 = got.sort_values(["query", "rank"]).reset_index(drop=True)
    o2 = want[t2.columns].sort_values(
        ["query", "rank"]).reset_index(drop=True)
    assert len(t2) == len(o2) > 0
    for c in t2.columns:
        assert (t2[c].to_numpy().astype(str)
                == o2[c].to_numpy().astype(str)).all(), c

    def ed1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        # simple DP-free check via deletion alignment
        import itertools

        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b = b, a
        return any(a == b[:i] + b[i + 1:] for i in range(len(b)))

    idx = BM25Index(simple_index_cached(sf))
    for _, row in got.iterrows():
        q1, q2 = analyze_simple(row["query"])[:2]
        s1, s2 = row["suggestion"].split(" ")
        assert ed1(q1, s1) and ed1(q2, s2)
        _nd, nm = phrase_counts_from_index(idx, [s1, s2])
        assert nm == row["n_matches"]
