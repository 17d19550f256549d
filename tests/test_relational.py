"""Relational pipelines over the TPC-H-ish tables vs DuckDB."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("lineitem", "orders", "customer", "nation")


@pytest.fixture()
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    yield c
    c.close()


def test_pricing_summary_matches_duckdb(ray_session, con):
    from pdfsearch_ray.pipelines.relational import pricing_summary

    got = pricing_summary(SF).to_pandas()
    want = con.execute("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS sum_base_price_cents,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round((1 - l_discount) * 100) AS BIGINT))
                   AS BIGINT) AS sum_disc_price_e4,
               round(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                     / count(*), 6) AS avg_qty,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59.999999'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """).df()
    got = got.sort_values(["l_returnflag", "l_linestatus"]).reset_index(
        drop=True)
    want = want.reset_index(drop=True)
    # integer money units: EXACT equality, no approx
    for col in ("n_rows", "sum_qty", "sum_base_price_cents",
                "sum_disc_price_e4"):
        assert got[col].tolist() == want[col].tolist(), col
    assert got["avg_qty"].tolist() == want["avg_qty"].tolist()


def test_orders_by_nation_matches_duckdb(ray_session, con):
    from pdfsearch_ray.pipelines.relational import orders_by_nation

    got = orders_by_nation(SF).to_pandas().reset_index(drop=True)
    want = con.execute("""
        SELECT n.n_name, count(*) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                   AS BIGINT) AS revenue_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name
    """).df().reset_index(drop=True)
    assert got["n_name"].tolist() == want["n_name"].tolist()
    assert got["n_orders"].tolist() == want["n_orders"].tolist()
    assert got["revenue_cents"].tolist() == want["revenue_cents"].tolist()


def test_region_part_revenue_matches_duckdb(ray_session, con):
    import duckdb as _d

    from pdfsearch_ray.pipelines.relational import region_part_revenue

    c = _d.connect()
    for t in ("lineitem", "part", "supplier", "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    got = region_part_revenue(SF).to_pandas().reset_index(drop=True)
    want = c.execute("""
        SELECT r.r_name,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                   AS BIGINT) AS revenue_e4,
               count(*) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size < 20
        GROUP BY r.r_name ORDER BY r.r_name
    """).df().reset_index(drop=True)
    c.close()
    assert got["r_name"].tolist() == want["r_name"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()
    assert got["revenue_e4"].tolist() == want["revenue_e4"].tolist()
