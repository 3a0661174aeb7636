"""Cell-index correctness: tile/hex/cell assignment vs independent numpy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.functions import cells, exprs


def _axial_round_numpy(x, y, size):
    """Independent numpy hex assignment (nearest-center, cube rounding)."""
    qf = (np.float64(0.5773502691896258) * x - y / 3.0) / size
    rf = y * 2.0 / 3.0 / size
    yf = -qf - rf
    rx, ry, rz = np.floor(qf + 0.5), np.floor(yf + 0.5), np.floor(rf + 0.5)
    dx, dy, dz = np.abs(rx - qf), np.abs(ry - yf), np.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = rz.copy()
    r = np.where(fix_x | fix_y, rz, -rx - ry)
    return q.astype(np.int64), r.astype(np.int64)


def test_hex_is_nearest_center(spark):
    """Hex assignment must equal brute-force nearest hex center
    (reference semantics: Scripts/HexBinning.groovy:202 kd-tree 1-NN)."""
    rng = np.random.default_rng(7)
    x = rng.random(2000) * 360.0
    y = rng.random(2000) * 180.0
    q, r = _axial_round_numpy(x, y, exprs.HEX_SIZE)
    # brute force: centers of the 5x5 axial neighborhood, pick closest
    s = exprs.HEX_SIZE
    sqrt3 = np.sqrt(3.0)
    best_q, best_r = q.copy(), r.copy()
    best_d = np.full(len(x), np.inf)
    for dq in range(-2, 3):
        for dr in range(-2, 3):
            cq, cr = q + dq, r + dr
            cx = s * sqrt3 * (cq + cr / 2.0)
            cy = s * 1.5 * cr
            d = (cx - x) ** 2 + (cy - y) ** 2
            better = d < best_d - 1e-12
            best_q = np.where(better, cq, best_q)
            best_r = np.where(better, cr, best_r)
            best_d = np.minimum(best_d, d)
    assert np.array_equal(best_q, q)
    assert np.array_equal(best_r, r)


def test_spark_hex_matches_numpy(spark):
    df = spark.range(0, 3000).selectExpr(
        "id as doc_id",
        f"{exprs.lon_expr('id')} as lon",
        f"{exprs.lat_expr('id')} as lat",
    )
    out = cells.with_hex(df).select("lon", "lat", "hex_q", "hex_r").toPandas()
    q, r = _axial_round_numpy(out["lon"].to_numpy(), out["lat"].to_numpy(), exprs.HEX_SIZE)
    assert np.array_equal(out["hex_q"].to_numpy(), q)
    assert np.array_equal(out["hex_r"].to_numpy(), r)


def test_tile_matches_numpy(spark):
    df = spark.range(0, 3000).selectExpr(
        f"{exprs.lon_expr('id')} as lon", f"{exprs.lat_expr('id')} as lat"
    )
    out = cells.with_tile(df).toPandas()
    tx = np.floor(out["lon"].to_numpy() / exprs.TILE_SIZE).astype(np.int64)
    ty = np.floor(out["lat"].to_numpy() / exprs.TILE_SIZE).astype(np.int64)
    assert np.array_equal(out["tile_x"].to_numpy(), tx)
    assert np.array_equal(out["tile_id"].to_numpy(), ty * exprs.TILE_COLS + tx)


def test_cell_hierarchy_parent_child(spark):
    """Every res9 cell's points share one res8 parent; res8 -> res7 likewise."""
    df = spark.range(0, 5000).selectExpr(
        f"{exprs.lon_expr('id')} as lon", f"{exprs.lat_expr('id')} as lat"
    )
    out = cells.with_cells(df)
    bad = (
        out.groupBy("cell9")
        .agg(F.countDistinct("cell8").alias("p8"), F.countDistinct("cell7").alias("p7"))
        .where((F.col("p8") > 1) | (F.col("p7") > 1))
        .count()
    )
    assert bad == 0


def test_geocode_skew(spark):
    """~80% of points must land in the 5 hot boxes (FIXTURES.md skew)."""
    df = spark.range(0, 20000).selectExpr(f"{exprs.lon_expr('id')} as lon")
    n_hot = df.where("lon >= 30.0 and (lon - floor(lon / 72.0) * 72.0) between 30.0 and 31.5").count()
    assert 0.75 <= n_hot / 20000 <= 0.85
