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
