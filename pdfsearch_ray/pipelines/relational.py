"""Relational pipelines over the TPC-H-ish tables — the generic
aggregate/join capability of the engine, exercised on the full testdata
table set (lineitem / orders / customer / nation) and value-checked
against DuckDB.

Scale shapes on display:
* ``pricing_summary`` — the classic combiner: each batch pre-aggregates
  to one row per (returnflag, linestatus) before the groupby, so the
  shuffle moves O(groups × blocks) rows (groups = 6 here) instead of
  the table.  Derived columns (averages) are computed AFTER the global
  sums, exactly as SQL's ``avg`` decomposes into sum/count.
* ``orders_by_nation`` — the two join regimes in one pipeline: a
  distributed hash equi-join (bucket-partitioned spill, per-bucket
  Acero join — functions/joins.py) for the big⋈medium side
  (orders ⋈ customer) and a broadcast map-join (``ray.put`` once, dict
  lookup inside map_batches) for the tiny dimension (nation, 25 rows).

Money aggregation is EXACT integer arithmetic: the synthetic prices
carry 2 decimals and discounts 2 decimals, so sums are computed over
integer cents (and cent×percent = 1e-4-dollar units for discounted
revenue).  Integer sums are order-independent and rounding-mode-free,
so the driver's exact value-hash can never flake on a half-cent
boundary or a numpy-half-even vs DuckDB-half-away tie — float sums
rounded to N decimals can (summation-order noise ~1e-3 at 1e9
magnitude sits exactly at the 2-decimal boundary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

PRICING_CUTOFF = "1998-09-02"  # l_shipdate <= cutoff (Q1 shape)


def _group_sum_i64(inv: np.ndarray, values: np.ndarray,
                   n: int) -> np.ndarray:
    """Exact int64 grouped sum.  ``np.bincount`` converts weights to
    float64, which stays exact only while a per-group per-batch sum is
    below 2^53 (~9e6 rows of 1e9-unit values); ``np.add.at`` accumulates
    in int64, so exactness holds at any batch size."""
    out = np.zeros(n, dtype=np.int64)
    np.add.at(out, inv, values.astype(np.int64, copy=False))
    return out


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    from ..functions.tables import read_parquet_nometa

    return read_parquet_nometa(
        f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) over lineitem
    rows shipped on/before the cutoff — sums, averages and row count."""
    cutoff = np.datetime64(PRICING_CUTOFF + "T23:59:59.999999")

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship <= cutoff
        if not keep.any():
            return pa.table({
                "l_returnflag": pa.array([], type=pa.string()),
                "l_linestatus": pa.array([], type=pa.string()),
                "sum_qty": pa.array([], type=pa.int64()),
                "sum_base_price_cents": pa.array([], type=pa.int64()),
                "sum_disc_price_e4": pa.array([], type=pa.int64()),
                "n_rows": pa.array([], type=pa.int64()),
            })
        flag = np.asarray(t["l_returnflag"].to_pylist())[keep]
        status = np.asarray(t["l_linestatus"].to_pylist())[keep]
        qty = np.round(t["l_quantity"].to_numpy()[keep]).astype(np.int64)
        cents = np.round(
            t["l_extendedprice"].to_numpy()[keep] * 100).astype(np.int64)
        pct = np.round(
            (1.0 - t["l_discount"].to_numpy()[keep]) * 100).astype(np.int64)
        combo = np.char.add(np.char.add(flag, "|"), status)
        uniq, inv = np.unique(combo, return_inverse=True)
        n = uniq.size
        return pa.table({
            "l_returnflag": pa.array([u.split("|")[0] for u in uniq]),
            "l_linestatus": pa.array([u.split("|")[1] for u in uniq]),
            "sum_qty": pa.array(_group_sum_i64(inv, qty, n)),
            "sum_base_price_cents": pa.array(
                _group_sum_i64(inv, cents, n)),
            "sum_disc_price_e4": pa.array(
                _group_sum_i64(inv, cents * pct, n)),
            "n_rows": pa.array(
                np.bincount(inv, minlength=n).astype(np.int64)),
        })

    agg = (
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        # blocks are ≤ |groups| rows post-combiner; see region_part_revenue
        .repartition(1)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                   Sum("sum_base_price_cents",
                       alias_name="sum_base_price_cents"),
                   Sum("sum_disc_price_e4",
                       alias_name="sum_disc_price_e4"),
                   Sum("n_rows", alias_name="n_rows"))
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
    )
    # avg from identical integer inputs: both engines divide the same
    # two ints in float64, so the quotient (and its rounding) match
    return pa.table({
        "l_returnflag": pa.array(agg["l_returnflag"].tolist()),
        "l_linestatus": pa.array(agg["l_linestatus"].tolist()),
        "sum_qty": pa.array(agg["sum_qty"].astype("int64").tolist(),
                            type=pa.int64()),
        "sum_base_price_cents": pa.array(
            agg["sum_base_price_cents"].astype("int64").tolist(),
            type=pa.int64()),
        "sum_disc_price_e4": pa.array(
            agg["sum_disc_price_e4"].astype("int64").tolist(),
            type=pa.int64()),
        "avg_qty": pa.array(np.round(
            agg["sum_qty"].to_numpy() / agg["n_rows"].to_numpy(), 6)),
        "n_rows": pa.array(agg["n_rows"].astype("int64").tolist(),
                           type=pa.int64()),
    })


def orders_by_nation(sf_dir: str) -> pa.Table:
    """Orders per customer nation: orders ⋈ customer via the
    distributed hash join, then nation resolved by broadcast lookup;
    group by nation name with count + rounded revenue sum."""
    import ray

    from ..functions.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = hash_join(orders, cust, left_on="o_custkey",
                       right_on="c_custkey", num_buckets=8)

    import pyarrow.parquet as pq

    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_name"])
    nmap_ref = ray.put(dict(zip(nt["n_nationkey"].to_pylist(),
                                nt["n_name"].to_pylist())))

    def tag(t: pa.Table) -> pa.Table:
        # combiner: resolve nation AND pre-aggregate per batch, so the
        # groupby shuffle moves O(|nations| × blocks) rows, not the
        # joined fact table
        nmap = ray.get(nmap_ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        names = np.asarray([nmap[int(k)] for k in nk], dtype=object) \
            if nk.size else np.asarray([], dtype=object)
        uniq, inv = np.unique(names, return_inverse=True)
        n = uniq.size
        return pa.table({
            "n_name": pa.array(uniq.tolist(), type=pa.string()),
            "n_orders": pa.array(
                np.bincount(inv, minlength=n).astype(np.int64)),
            "price_cents": pa.array(_group_sum_i64(inv, cents, n)),
        })

    out = (
        joined.map_batches(tag, batch_format="pyarrow")
        .repartition(1)  # ≤ |nations| rows per block post-combiner
        .groupby("n_name")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("price_cents", alias_name="revenue_cents"))
        .to_pandas()
        .sort_values("n_name")
    )
    return pa.table({
        "n_name": pa.array(out["n_name"].tolist(), type=pa.string()),
        "n_orders": pa.array(out["n_orders"].astype("int64").tolist(),
                             type=pa.int64()),
        "revenue_cents": pa.array(
            out["revenue_cents"].astype("int64").tolist(),
            type=pa.int64()),
    })


PART_SIZE_MAX = 20  # p_size < threshold (Q2/Q9-ish selective dim filter)


def region_part_revenue(sf_dir: str) -> pa.Table:
    """Revenue per supplier region for small parts — the Q9-ish
    multi-dimension star join done the at-scale way: the FACT table
    (lineitem) never shuffles.  part (filter → keep-set), supplier →
    nation → region (two-hop key map) are all broadcast once via
    ``ray.put``; one map_batches pass filters fact rows on the part
    keep-set, maps suppkey → region name and pre-aggregates per batch;
    the final groupby moves O(regions × blocks) rows."""
    import ray

    import pyarrow.parquet as pq

    pt = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_size"])
    keep_parts = pt.filter(
        pc.less(pt["p_size"], PART_SIZE_MAX))["p_partkey"].to_numpy()
    st = pq.read_table(f"{sf_dir}/supplier.parquet",
                       columns=["s_suppkey", "s_nationkey"])
    nt = pq.read_table(f"{sf_dir}/nation.parquet",
                       columns=["n_nationkey", "n_regionkey"])
    rt = pq.read_table(f"{sf_dir}/region.parquet",
                       columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nt["n_nationkey"].to_pylist(),
                   nt["n_regionkey"].to_pylist()))
    r2n = dict(zip(rt["r_regionkey"].to_pylist(), rt["r_name"].to_pylist()))
    supp_region = {int(s): r2n[n2r[int(n)]]
                   for s, n in zip(st["s_suppkey"].to_pylist(),
                                   st["s_nationkey"].to_pylist())}
    bc = ray.put((np.sort(keep_parts), supp_region))

    def partial(t: pa.Table) -> pa.Table:
        parts_sorted, s2r = ray.get(bc)
        pk = t["l_partkey"].to_numpy()
        pos = np.searchsorted(parts_sorted, pk)
        pos = np.minimum(pos, parts_sorted.size - 1)
        keep = parts_sorted[pos] == pk if parts_sorted.size else \
            np.zeros(pk.size, dtype=bool)
        if not keep.any():
            return pa.table({
                "r_name": pa.array([], type=pa.string()),
                "revenue_e4": pa.array([], type=pa.int64()),
                "n_items": pa.array([], type=pa.int64()),
            })
        sk = t["l_suppkey"].to_numpy()[keep]
        cents = np.round(
            t["l_extendedprice"].to_numpy()[keep] * 100).astype(np.int64)
        pct = np.round(
            (1.0 - t["l_discount"].to_numpy()[keep]) * 100).astype(np.int64)
        rnames = np.asarray([s2r[int(s)] for s in sk])
        uniq, inv = np.unique(rnames, return_inverse=True)
        return pa.table({
            "r_name": pa.array(uniq.tolist(), type=pa.string()),
            "revenue_e4": pa.array(
                _group_sum_i64(inv, cents * pct, uniq.size)),
            "n_items": pa.array(
                np.bincount(inv, minlength=uniq.size).astype(np.int64)),
        })

    out = (
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        # each block is ≤ |regions| rows after the combiner — coalesce
        # to one block so the aggregate has no empty reduce partitions
        # (empty partitions emit schema-less blocks Ray warns about)
        .repartition(1)
        .groupby("r_name")
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                   Sum("n_items", alias_name="n_items"))
        .to_pandas()
        .sort_values("r_name")
    )
    return pa.table({
        "r_name": pa.array(out["r_name"].tolist(), type=pa.string()),
        "revenue_e4": pa.array(out["revenue_e4"].astype("int64").tolist(),
                               type=pa.int64()),
        "n_items": pa.array(out["n_items"].astype("int64").tolist(),
                            type=pa.int64()),
    })
