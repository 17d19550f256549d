"""Geo nearest-neighbor search: radius filter + k-NN over synthetic
per-document coordinates (the geo_distance / geo_point operator family
of Lucene/ES, over a corpus with no native geo column).

Coordinates synthesize deterministically from the doc id — the
recency_boost/ltr mix64 convention, so the DuckDB oracle reproduces
them in HUGEINT limbs:

    h   = mix64(doc_id)                      (splitmix64 finalizer)
    lat = (h mod 2^32) mod 180e6 - 90e6      (integer microdegrees)
    lon = (h >> 32)    mod 360e6 - 180e6

The distance metric is INTEGER planar squared distance in microdegrees
with longitude wraparound — ``dlat² + min(|dlon|, 360e6-|dlon|)²`` —
chosen over haversine deliberately: the gate's value hash needs
bit-exact agreement between numpy and DuckDB, and int64 arithmetic is
exact where libm trig is only ulp-close.  The operator SHAPE (bounding
filter + distance sort + top-k per query point) is the real thing; the
metric is the determinism contract, documented here.

Scale shape: pure per-batch map — each batch computes its own
distances and emits its local top-k per query point (narrow rows);
the driver merge sees O(k · blocks · n_queries).  No shuffle, no
materialization; at 100 TB this is a single streaming pass.  A real
deployment would add an S2/geohash cell prefilter as a pushdown
predicate — the cell id is one more integer column, same pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["geo_knn", "geo_knn_sql", "GEO_POINTS", "GEO_K",
           "GEO_RADIUS_MICRO", "geo_bounds", "geo_bounds_sql"]

# fixed query points (lat, lon in integer microdegrees)
GEO_POINTS = ((37_770_000, -122_420_000),     # SF
              (51_500_000, -120_000),         # London
              (-33_870_000, 151_210_000))     # Sydney
GEO_K = 20
GEO_RADIUS_MICRO = 60_000_000                 # 60 degrees

_MOD_LAT = 180_000_000
_MOD_LON = 360_000_000
_WRAP = 360_000_000


def _coords(ids: np.ndarray):
    from ..functions.hashing import mix64

    h = mix64(ids.astype(np.uint64))
    lat = ((h & np.uint64(0xFFFFFFFF)) % np.uint64(_MOD_LAT)
           ).astype(np.int64) - (_MOD_LAT // 2)
    lon = ((h >> np.uint64(32)) % np.uint64(_MOD_LON)
           ).astype(np.int64) - (_MOD_LON // 2)
    return lat, lon


def geo_knn(sf_dir: str, *, points=GEO_POINTS, k: int = GEO_K,
            radius_micro: int = GEO_RADIUS_MICRO) -> pa.Table:
    """Per query point: the k nearest documents within the radius,
    (dist2 asc, doc_id asc), integer-exact."""
    from ..functions.tables import read_parquet_nometa

    r2 = int(radius_micro) * int(radius_micro)

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        lat, lon = _coords(ids)
        out_p, out_d, out_dist = [], [], []
        for pi, (plat, plon) in enumerate(points):
            dlat = lat - plat
            adl = np.abs(lon - plon)
            dlon = np.minimum(adl, _WRAP - adl)
            d2 = dlat * dlat + dlon * dlon
            m = d2 <= r2
            mi, md = ids[m], d2[m]
            top = np.lexsort((mi, md))[:k]
            out_p.extend([pi] * top.size)
            out_d.extend(mi[top].tolist())
            out_dist.extend(md[top].tolist())
        return pa.table({
            "point_id": pa.array(out_p, type=pa.int64()),
            "doc_id": pa.array(out_d, type=pa.int64()),
            "dist2": pa.array(out_dist, type=pa.int64()),
        })

    cand = read_parquet_nometa(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
    ).map_batches(
        local_topk, batch_format="pyarrow", batch_size=4096,
    ).to_pandas()

    out_p, out_d, out_dist, out_r = [], [], [], []
    if cand.empty or "point_id" not in cand.columns:
        # empty corpus: the empty Dataset drops the schema
        cand = cand.reindex(columns=["point_id", "doc_id", "dist2"])
    for pi in range(len(points)):
        g = cand[cand["point_id"] == pi]
        g = g.sort_values(["dist2", "doc_id"], kind="mergesort").head(k)
        out_p.extend([pi] * len(g))
        out_d.extend(g["doc_id"].tolist())
        out_dist.extend(g["dist2"].tolist())
        out_r.extend(range(1, len(g) + 1))
    return pa.table({
        "point_id": pa.array(out_p, type=pa.int64()),
        "doc_id": pa.array(out_d, type=pa.int64()),
        "dist2": pa.array(out_dist, type=pa.int64()),
        "rank": pa.array(out_r, type=pa.int64()),
    })


def geo_knn_sql(*, points=GEO_POINTS, k: int = GEO_K,
                radius_micro: int = GEO_RADIUS_MICRO) -> str:
    """Oracle: the splitmix64 finalizer in HUGEINT limbs (sample_sql
    convention), the same integer coordinate synth, wraparound squared
    distance and ROW_NUMBER top-k."""
    U32, U64 = 1 << 32, 1 << 64
    C1, C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mulmod(x: str, c: int) -> str:
        ch, cl = c >> 32, c % U32
        return (f"((({x} % {U32}) * {cl} + "
                f"((({x} % {U32}) * {ch} + ({x} >> 32) * {cl}) % {U32})"
                f" * {U32}) % {U64})")

    r2 = int(radius_micro) * int(radius_micro)
    half_lat, half_lon = _MOD_LAT // 2, _MOD_LON // 2
    pvals = ", ".join(f"({pi}, {plat}, {plon})"
                      for pi, (plat, plon) in enumerate(points))
    return f"""
        WITH m0 AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS x
                    FROM documents),
        m1 AS (SELECT doc_id, {mulmod('xor(x, x >> 30)', C1)} AS x FROM m0),
        m2 AS (SELECT doc_id, {mulmod('xor(x, x >> 27)', C2)} AS x FROM m1),
        m3 AS (SELECT doc_id, xor(x, x >> 31) AS x FROM m2),
        geo AS (
            SELECT doc_id,
                   CAST((x % {U32}) % {_MOD_LAT} AS BIGINT)
                       - {half_lat} AS lat,
                   CAST((x >> 32) % {_MOD_LON} AS BIGINT)
                       - {half_lon} AS lon
            FROM m3
        ),
        pts(point_id, plat, plon) AS (VALUES {pvals}),
        d AS (
            SELECT pts.point_id, geo.doc_id,
                   (geo.lat - pts.plat) * (geo.lat - pts.plat)
                   + least(abs(geo.lon - pts.plon),
                           {_WRAP} - abs(geo.lon - pts.plon))
                     * least(abs(geo.lon - pts.plon),
                             {_WRAP} - abs(geo.lon - pts.plon)) AS dist2
            FROM geo CROSS JOIN pts
        )
        SELECT point_id, doc_id, dist2, rank FROM (
            SELECT point_id, doc_id, dist2,
                   row_number() OVER (
                       PARTITION BY point_id
                       ORDER BY dist2 ASC, doc_id ASC) AS rank
            FROM d WHERE dist2 <= {r2}
        ) WHERE rank <= {k}
        ORDER BY point_id, rank
    """


GRID_CELL_MICRO = 10_000_000          # 10-degree cells
GRID_TOPK = 50


def geo_grid(sf_dir: str, *, cell_micro: int = GRID_CELL_MICRO,
             k: int = GRID_TOPK) -> pa.Table:
    """Geo grid aggregation (the geohash_grid / geotile_grid facet):
    doc counts per fixed lat/lon cell, top-k cells by (count desc,
    cell asc).  Cells are integer floor-division buckets of the same
    synthesized microdegree coordinates as geo_knn, so the oracle
    replays them exactly.

    Scale shape: per-batch (cell, count) combiner → one tiny groupby →
    distributed top-k cut; the shuffle moves O(occupied cells × blocks)
    rows."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..functions.tables import read_parquet_nometa

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        lat, lon = _coords(ids)
        cell = ((lat // cell_micro) * np.int64(1 << 32)
                + (lon // cell_micro + (1 << 16)))
        uniq, counts = np.unique(cell, return_counts=True)
        return pa.table({
            "cell": pa.array(uniq, type=pa.int64()),
            "n_docs": pa.array(counts.astype(np.int64),
                               type=pa.int64()),
        })

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        df = t.to_pandas().sort_values(
            ["n_docs", "cell"], ascending=[False, True],
            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (
        read_parquet_nometa(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if agg.empty or "n_docs" not in agg.columns:
        return pa.table({
            "cell_lat": pa.array([], type=pa.int64()),
            "cell_lon": pa.array([], type=pa.int64()),
            "n_docs": pa.array([], type=pa.int64()),
        })
    agg = agg.sort_values(["n_docs", "cell"], ascending=[False, True],
                          kind="mergesort").head(k)
    cells = agg["cell"].to_numpy()
    return pa.table({
        "cell_lat": pa.array(cells >> np.int64(32), type=pa.int64()),
        "cell_lon": pa.array((cells & np.int64(0xFFFFFFFF))
                             - (1 << 16), type=pa.int64()),
        "n_docs": pa.array(agg["n_docs"].astype("int64").tolist(),
                           type=pa.int64()),
    })


def geo_grid_sql(*, cell_micro: int = GRID_CELL_MICRO,
                 k: int = GRID_TOPK) -> str:
    """Oracle: same coordinate synth, floor-division cells (DuckDB's
    // on integers floors toward -inf for positive divisors like
    numpy's), count + top-k."""
    U32, U64 = 1 << 32, 1 << 64
    C1, C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mulmod(x: str, c: int) -> str:
        ch, cl = c >> 32, c % U32
        return (f"((({x} % {U32}) * {cl} + "
                f"((({x} % {U32}) * {ch} + ({x} >> 32) * {cl}) % {U32})"
                f" * {U32}) % {U64})")

    half_lat, half_lon = _MOD_LAT // 2, _MOD_LON // 2
    return f"""
        WITH m0 AS (SELECT doc_id, CAST(doc_id AS HUGEINT) AS x
                    FROM documents),
        m1 AS (SELECT doc_id, {mulmod('xor(x, x >> 30)', C1)} AS x FROM m0),
        m2 AS (SELECT doc_id, {mulmod('xor(x, x >> 27)', C2)} AS x FROM m1),
        m3 AS (SELECT doc_id, xor(x, x >> 31) AS x FROM m2),
        geo AS (
            SELECT CAST((x % {U32}) % {_MOD_LAT} AS BIGINT)
                       - {half_lat} AS lat,
                   CAST((x >> 32) % {_MOD_LON} AS BIGINT)
                       - {half_lon} AS lon
            FROM m3
        )
        SELECT CAST(floor(lat / {cell_micro}.0) AS BIGINT) AS cell_lat,
               CAST(floor(lon / {cell_micro}.0) AS BIGINT) AS cell_lon,
               count(*) AS n_docs
        FROM geo
        GROUP BY cell_lat, cell_lon
        ORDER BY n_docs DESC,
                 cell_lat * {1 << 32}
                   + (cell_lon + {1 << 16}) ASC
        LIMIT {k}
    """


def geo_bounds(sf_dir: str) -> pa.Table:
    """geo_bounds + geo_centroid — the ES spatial summary aggregations,
    per language bucket: bounding box (min/max lat/lon) and integer
    centroid (floor(sum/n) microdegrees, exact on both sides).  Scale
    shape: per-batch (lang → n, mins, maxes, sums) combiner → one
    langs-sized groupby; sums of microdegrees stay far inside int64
    (1.8e8 × 10^10 docs ≈ 2e18)."""
    from ray.data.aggregate import Max, Min, Sum

    from ..functions.tables import read_parquet_nometa, typed_pandas

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _coords(ids)
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        uniq, inv = np.unique(langs, return_inverse=True)
        n = uniq.size
        mins_lat = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        maxs_lat = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        mins_lon = mins_lat.copy()
        maxs_lon = maxs_lat.copy()
        np.minimum.at(mins_lat, inv, lat)
        np.maximum.at(maxs_lat, inv, lat)
        np.minimum.at(mins_lon, inv, lon)
        np.maximum.at(maxs_lon, inv, lon)
        sum_lat = np.zeros(n, dtype=np.int64)
        sum_lon = np.zeros(n, dtype=np.int64)
        np.add.at(sum_lat, inv, lat)
        np.add.at(sum_lon, inv, lon)
        return pa.table({
            "lang": pa.array(uniq.tolist(), type=pa.string()),
            "n_docs": pa.array(np.bincount(inv, minlength=n)
                               .astype(np.int64)),
            "min_lat": pa.array(mins_lat), "max_lat": pa.array(maxs_lat),
            "min_lon": pa.array(mins_lon), "max_lon": pa.array(maxs_lon),
            "sum_lat": pa.array(sum_lat), "sum_lon": pa.array(sum_lon),
        })

    agg = typed_pandas(
        read_parquet_nometa(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Min("min_lat", alias_name="min_lat"),
                   Max("max_lat", alias_name="max_lat"),
                   Min("min_lon", alias_name="min_lon"),
                   Max("max_lon", alias_name="max_lon"),
                   Sum("sum_lat", alias_name="sum_lat"),
                   Sum("sum_lon", alias_name="sum_lon")),
        {"lang": "object", "n_docs": "int64", "min_lat": "int64",
         "max_lat": "int64", "min_lon": "int64", "max_lon": "int64",
         "sum_lat": "int64", "sum_lon": "int64"}).sort_values("lang")
    n = agg["n_docs"].to_numpy().astype(np.int64)
    cols = {"lang": pa.array(agg["lang"].tolist(), type=pa.string()),
            "n_docs": pa.array(n, type=pa.int64())}
    for c in ("min_lat", "max_lat", "min_lon", "max_lon"):
        cols[c] = pa.array(agg[c].astype("int64"), type=pa.int64())
    # centroid divides TRUNCATING toward zero — DuckDB's integer `//`
    # truncates where numpy's floors, and sums go negative
    nn = np.maximum(n, 1)
    for c, s_col in (("ctr_lat", "sum_lat"), ("ctr_lon", "sum_lon")):
        s = agg[s_col].to_numpy().astype(np.int64)
        cols[c] = pa.array(np.sign(s) * (np.abs(s) // nn),
                           type=pa.int64())
    return pa.table(cols)


def geo_bounds_sql() -> str:
    """Oracle: the mix64 coordinate synth (geo_grid_sql limbs) + plain
    min/max/floor-div-centroid per lang."""
    U32, U64 = 1 << 32, 1 << 64
    C1, C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def mulmod(x: str, c: int) -> str:
        ch, cl = c >> 32, c % U32
        return (f"((({x} % {U32}) * {cl} + "
                f"((({x} % {U32}) * {ch} + ({x} >> 32) * {cl}) % {U32})"
                f" * {U32}) % {U64})")

    half_lat, half_lon = _MOD_LAT // 2, _MOD_LON // 2
    return f"""
        WITH m0 AS (SELECT doc_id, lang, CAST(doc_id AS HUGEINT) AS x
                    FROM documents),
        m1 AS (SELECT doc_id, lang, {mulmod('xor(x, x >> 30)', C1)} AS x
               FROM m0),
        m2 AS (SELECT doc_id, lang, {mulmod('xor(x, x >> 27)', C2)} AS x
               FROM m1),
        m3 AS (SELECT doc_id, lang, xor(x, x >> 31) AS x FROM m2),
        geo AS (
            SELECT lang,
                   CAST((x % {U32}) % {_MOD_LAT} AS BIGINT)
                       - {half_lat} AS lat,
                   CAST((x >> 32) % {_MOD_LON} AS BIGINT)
                       - {half_lon} AS lon
            FROM m3
        )
        SELECT lang, count(*) AS n_docs,
               min(lat) AS min_lat, max(lat) AS max_lat,
               min(lon) AS min_lon, max(lon) AS max_lon,
               CAST(sum(lat) // count(*) AS BIGINT) AS ctr_lat,
               CAST(sum(lon) // count(*) AS BIGINT) AS ctr_lon
        FROM geo GROUP BY lang ORDER BY lang
    """
