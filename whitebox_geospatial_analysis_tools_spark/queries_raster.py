"""Raster query registry entries + DuckDB oracles.

The synthetic raster is deterministic and DYADIC-valued (operators/raster.py
cell_value_sql), so sums/means/moments are exact in both engines and results
compare bit-for-bit; only transcendental outputs (slope/hillshade) round to
6 decimals.  Oracles compute over the exploded (row, col, value) relational
view built from the same shared formula via DuckDB ``range()``.

Raster ops covered (SURVEY.md §2):
  stats/histogram        — ImageAverage/Total/StdDev, Histogram (§2.4)
  map/zip algebra        — MathTools family + RasterCalculator fusion (§2.8)
  focal mean/min/max/
  range/stddev/total     — Filter* sliding windows (§2.5)
  slope / hillshade      — 3x3 terrain derivatives (§2.5)
  downsample             — Aggregate (§2.4)
  reclass                — Reclass (§2.2)
  minmax contrast        — ContrastStretch family (§2.13)
  two-band index         — NDVI-shape band arithmetic (§2.13)
  raster -> points       — RasterToVectorPoints (§2.10)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import queries as Q
from .operators import raster as R
from .functions.exprs import A, C, M
from .operators.raster import NODATA, cell_value_sql

ROWS, COLS = 240, 360
_ND = R.NODATA

_VAL = cell_value_sql("r.r", "c.c", 0, COLS)
_VAL1 = cell_value_sql("r.r", "c.c", 1, COLS)

_RAS = (
    f"ras AS (SELECT r.r AS row, c.c AS col, {_VAL} AS value "
    f"FROM range(0, {ROWS}) r(r), range(0, {COLS}) c(c))"
)
_RAS2 = (
    f"ras2 AS (SELECT r.r AS row, c.c AS col, {_VAL1} AS value "
    f"FROM range(0, {ROWS}) r(r), range(0, {COLS}) c(c))"
)
_NDF = f"value != {R.NODATA!r}e0"


def _dem(spark, band: int = 0):
    return R.synth_raster(spark, ROWS, COLS, band=band)


FROWS, FCOLS = 120, 180
_FVAL = cell_value_sql("r.r", "c.c", 0, FCOLS)
_RASF = (
    f"ras AS (SELECT r.r AS row, c.c AS col, {_FVAL} AS value "
    f"FROM range(0, {FROWS}) r(r), range(0, {FCOLS}) c(c))"
)


def _demf(spark):
    return R.synth_raster(spark, FROWS, FCOLS)



# -- whole-raster stats (§2.4) ------------------------------------------------
@Q.register(
    "raster_stats",
    f"WITH {_RAS} SELECT COUNT(*) AS n, "
    "CAST(ROUND(SUM(value) / COUNT(*), 6) AS DOUBLE) AS mean_val, "
    "MIN(value) AS min_val, MAX(value) AS max_val, "
    "CAST(ROUND(SQRT((SUM(value * value) - SUM(value) * SUM(value) / COUNT(*)) "
    "/ (COUNT(*) - 1)), 6) AS DOUBLE) AS stddev_val "
    f"FROM ras WHERE {_NDF}",
)
def q_raster_stats(spark, sf):
    return R.raster_stats(_dem(spark))


@Q.register(
    "raster_histogram",
    f"WITH {_RAS} SELECT CAST(FLOOR(value / 20e0) AS BIGINT) AS bin, COUNT(*) AS n "
    f"FROM ras WHERE {_NDF} GROUP BY 1 ORDER BY 1",
)
def q_raster_histogram(spark, sf):
    cells = R.explode_cells(_dem(spark))
    return (
        cells.where(F.col("value") != _ND)
        .groupBy(F.expr("CAST(FLOOR(value / 20e0) AS BIGINT)").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bin")
    )


# -- raster algebra (§2.8): fused unary expression ---------------------------
@Q.register(
    "raster_algebra",
    f"WITH {_RAS} SELECT row, col, "
    f"CASE WHEN value = {R.NODATA!r}e0 THEN {R.NODATA!r}e0 "
    "ELSE value * 2e0 + 100e0 END AS value "
    "FROM ras ORDER BY row, col",
)
def q_raster_algebra(spark, sf):
    out = R.map_algebra(_dem(spark), "v * 2e0 + 100e0")
    return R.explode_cells(out).orderBy("row", "col")


@Q.register(
    "raster_zip_add",
    f"WITH {_RAS}, {_RAS2} SELECT a.row, a.col, "
    f"CASE WHEN a.value = {R.NODATA!r}e0 OR b.value = {R.NODATA!r}e0 "
    f"THEN {R.NODATA!r}e0 ELSE a.value + b.value END AS value "
    "FROM ras a JOIN ras2 b USING (row, col) ORDER BY a.row, a.col",
)
def q_raster_zip_add(spark, sf):
    out = R.zip_algebra(_dem(spark, 0), _dem(spark, 1), "x + y")
    return R.explode_cells(out).orderBy("row", "col")


# -- focal windows (§2.5) -----------------------------------------------------
_NBR = (
    "nbr AS (SELECT a.row AS row, a.col AS col, a.value AS av, b.value AS bv "
    "FROM ras a JOIN ras b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
    "AND b.col BETWEEN a.col - 1 AND a.col + 1 "
    f"WHERE a.value != {R.NODATA!r}e0)"
)


@Q.register(
    "focal_mean",
    f"WITH {_RASF}, {_NBR} SELECT row, col, "
    f"SUM(CASE WHEN bv = {R.NODATA!r}e0 THEN 0e0 ELSE bv END) "
    f"/ COUNT(*) FILTER (bv != {R.NODATA!r}e0) AS value "
    f"FROM nbr GROUP BY 1, 2 HAVING COUNT(*) FILTER (bv != {R.NODATA!r}e0) > 0 "
    "ORDER BY row, col",
)
def q_focal_mean(spark, sf):
    out = R.focal(_demf(spark), "mean")
    return (
        R.explode_cells(out).where(F.col("value") != _ND).orderBy("row", "col")
    )


@Q.register(
    "focal_stats",
    f"WITH {_RASF}, {_NBR}, live AS (SELECT row, col, bv FROM nbr WHERE bv != {R.NODATA!r}e0) "
    "SELECT row, col, MIN(bv) AS min_v, MAX(bv) AS max_v, "
    "MAX(bv) - MIN(bv) AS range_v, SUM(bv) AS total_v, "
    "CASE WHEN COUNT(*) < 2 THEN NULL ELSE "
    "SQRT((SUM(bv * bv) - SUM(bv) * SUM(bv) / COUNT(*)) / (COUNT(*) - 1)) END AS std_v "
    "FROM live GROUP BY 1, 2 ORDER BY row, col",
)
def q_focal_stats(spark, sf):
    dem = _demf(spark)
    parts = {s: R.explode_cells(R.focal(dem, s), f"{s}_v") for s in
             ("min", "max", "range", "total", "stddev")}
    out = parts["min"]
    for s in ("max", "range", "total"):
        out = out.join(parts[s], ["row", "col"])
    std = parts["stddev"].withColumnRenamed("stddev_v", "std_v")
    out = out.join(std, ["row", "col"])
    out = out.where(F.col("min_v") != _ND).withColumn(
        "std_v", F.when(F.col("std_v") == _ND, None).otherwise(F.col("std_v"))
    )
    return out.orderBy("row", "col")


_SLOPE_SQL = (
    "DEGREES(ATAN(SQRT("
    "POW((ne + 2e0 * ev + se - nw - 2e0 * wv - sw) / 8e0, 2) + "
    "POW((sw + 2e0 * ss + se - nw - 2e0 * nn - ne) / 8e0, 2))))"
)
_W9 = (
    "w9 AS (SELECT a.row AS row, a.col AS col, a.value AS cv, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col - 1 THEN b.value END) AS nw, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col     THEN b.value END) AS nn, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col + 1 THEN b.value END) AS ne, "
    "MAX(CASE WHEN b.row = a.row     AND b.col = a.col - 1 THEN b.value END) AS wv, "
    "MAX(CASE WHEN b.row = a.row     AND b.col = a.col + 1 THEN b.value END) AS ev, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col - 1 THEN b.value END) AS sw, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col     THEN b.value END) AS ss, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col + 1 THEN b.value END) AS se "
    "FROM ras a JOIN ras b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
    "AND b.col BETWEEN a.col - 1 AND a.col + 1 "
    "GROUP BY 1, 2, 3)"
)


@Q.register(
    "slope",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    f"(FLOOR(({_SLOPE_SQL}) * 1e6 + 0.5e0) / 1e6) AS value FROM w9 "
    f"WHERE cv != {R.NODATA!r}e0 AND {R.NODATA!r}e0 NOT IN (nw, nn, ne, wv, ev, sw, ss, se) "
    "AND nw IS NOT NULL AND nn IS NOT NULL AND ne IS NOT NULL AND wv IS NOT NULL "
    "AND ev IS NOT NULL AND sw IS NOT NULL AND ss IS NOT NULL AND se IS NOT NULL "
    "ORDER BY row, col",
)
def q_slope(spark, sf):
    out = R.focal(_demf(spark), "slope")
    return (
        R.explode_cells(out).where(F.col("value") != _ND).orderBy("row", "col")
    )


# -- downsample (§2.4 Aggregate) ---------------------------------------------
@Q.register(
    "raster_downsample",
    f"WITH {_RAS} SELECT CAST(FLOOR(row / 4e0) AS BIGINT) AS brow, "
    "CAST(FLOOR(col / 4e0) AS BIGINT) AS bcol, "
    "CAST(ROUND(AVG(value), 6) AS DOUBLE) AS mean_val, COUNT(*) AS n "
    f"FROM ras WHERE {_NDF} GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_raster_downsample(spark, sf):
    return R.downsample(_dem(spark), 4).orderBy("brow", "bcol")


# -- reclass (§2.2) -----------------------------------------------------------
@Q.register(
    "raster_reclass",
    f"WITH {_RAS} SELECT CASE WHEN value < 50e0 THEN 1 WHEN value < 100e0 THEN 2 "
    "WHEN value < 150e0 THEN 3 ELSE 4 END AS cls, COUNT(*) AS n "
    f"FROM ras WHERE {_NDF} GROUP BY 1 ORDER BY 1",
)
def q_raster_reclass(spark, sf):
    out = R.map_algebra(
        _dem(spark),
        "CASE WHEN v < 50e0 THEN 1e0 WHEN v < 100e0 THEN 2e0 "
        "WHEN v < 150e0 THEN 3e0 ELSE 4e0 END",
    )
    return (
        R.explode_cells(out).where(F.col("value") != _ND)
        .groupBy(F.col("value").cast("int").alias("cls"))
        .agg(F.count(F.lit(1)).alias("n")).orderBy("cls")
    )


# -- min-max contrast stretch (§2.13) ----------------------------------------
@Q.register(
    "contrast_stretch",
    f"WITH {_RAS}, mm AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM ras WHERE {_NDF}) "
    "SELECT row, col, (value - lo) / (hi - lo) * 255e0 AS value "
    f"FROM ras, mm WHERE {_NDF} ORDER BY row, col",
)
def q_contrast_stretch(spark, sf):
    dem = _dem(spark)
    cells = R.explode_cells(dem).where(F.col("value") != _ND)
    mm = cells.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return (
        cells.crossJoin(F.broadcast(mm))
        .select(
            "row", "col",
            ((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255e0).alias("value"),
        )
        .orderBy("row", "col")
    )


# -- two-band normalized difference (§2.13 NDVI shape) ------------------------
@Q.register(
    "band_index",
    f"WITH {_RAS}, {_RAS2} SELECT a.row, a.col, "
    "(a.value - b.value) / (a.value + b.value) AS value "
    "FROM ras a JOIN ras2 b USING (row, col) "
    f"WHERE a.value != {R.NODATA!r}e0 AND b.value != {R.NODATA!r}e0 "
    "AND a.value + b.value != 0e0 ORDER BY a.row, a.col",
)
def q_band_index(spark, sf):
    out = R.zip_algebra(
        _dem(spark, 0), _dem(spark, 1),
        f"CASE WHEN x + y = 0e0 THEN {R.NODATA!r}e0 ELSE (x - y) / (x + y) END",
    )
    return (
        R.explode_cells(out).where(F.col("value") != _ND).orderBy("row", "col")
    )


# -- raster -> vector points (§2.10) ------------------------------------------
@Q.register(
    "raster_to_points",
    f"WITH {_RAS} SELECT row, col, value FROM ras WHERE {_NDF} AND value > 150e0 "
    "ORDER BY row, col",
)
def q_raster_to_points(spark, sf):
    cells = R.explode_cells(_dem(spark))
    return (
        cells.where((F.col("value") != _ND) & (F.col("value") > 150e0))
        .orderBy("row", "col")
    )


# -- clump: connected-component labeling (§2.4; Clump.java) -------------------
_CROWS, _CCOLS = 60, 90
_CVAL = cell_value_sql("r.r", "c.c", 0, _CCOLS)
_CBASE = (
    f"cells AS (SELECT r.r AS row, c.c AS col, {_CVAL} AS v "
    f"FROM range(0, {_CROWS}) r(r), range(0, {_CCOLS}) c(c)), "
    f"base AS (SELECT row, col, CAST(FLOOR(v / 50e0) AS BIGINT) AS cls, "
    f"row * {_CCOLS} + col AS id FROM cells WHERE v != {NODATA!r}e0), "
    "adj AS (SELECT a.id AS id, b.id AS nid FROM base a JOIN base b "
    "ON a.cls = b.cls AND ABS(a.row - b.row) + ABS(a.col - b.col) <= 1), "
    "reach(id, rid) AS (SELECT id, id FROM base UNION "
    "SELECT r.id, a.nid FROM reach r JOIN adj a ON a.id = r.rid), "
    "lab AS (SELECT id, MIN(rid) AS label FROM reach GROUP BY 1)"
)


@Q.register(
    "clump_sizes",
    f"WITH RECURSIVE {_CBASE} "
    "SELECT b.cls, l.label, COUNT(*) AS n_cells FROM base b JOIN lab l USING (id) "
    "GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_clump_sizes(spark, sf):
    from .operators.clump import clump_sizes

    cells = (
        R.explode_cells(R.synth_raster(spark, _CROWS, _CCOLS))
        .where(F.col("value") != _ND)
        .select("row", "col", F.expr("CAST(FLOOR(value / 50e0) AS BIGINT)").alias("cls"))
    )
    return clump_sizes(cells, _CCOLS).orderBy("cls", "label")


# -- histogram equalization (§2.13; HistogramEqualization.java) ---------------
@Q.register(
    "hist_equalize",
    f"WITH {_RAS}, live AS (SELECT * FROM ras WHERE {_NDF}), "
    "hist AS (SELECT CAST(FLOOR(value) AS BIGINT) AS bin, COUNT(*) AS n FROM live GROUP BY 1), "
    "cdf AS (SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum, "
    "(SELECT SUM(n) FROM hist) AS total FROM hist), "
    "lut AS (SELECT bin, CAST(FLOOR(cum * 255e0 / total) AS BIGINT) AS eq FROM cdf) "
    "SELECT l.eq, COUNT(*) AS n FROM live v JOIN lut l "
    "ON CAST(FLOOR(v.value) AS BIGINT) = l.bin GROUP BY 1 ORDER BY 1",
)
def q_hist_equalize(spark, sf):
    from pyspark.sql import Window

    live = R.explode_cells(_dem(spark)).where(F.col("value") != _ND)
    hist = live.groupBy(
        F.expr("CAST(FLOOR(value) AS BIGINT)").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    total = hist.agg(F.sum("n").alias("t"))
    lut = (
        hist.withColumn("cum", F.sum("n").over(w))
        .crossJoin(F.broadcast(total))
        .select("bin", F.expr("CAST(FLOOR(cum * 255e0 / t) AS BIGINT)").alias("eq"))
    )
    return (
        live.withColumn("bin", F.expr("CAST(FLOOR(value) AS BIGINT)"))
        .join(F.broadcast(lut), "bin")
        .groupBy("eq").agg(F.count(F.lit(1)).alias("n")).orderBy("eq")
    )


# -- vector lines -> raster cells (§2.10; VectorLinesToRaster.java) -----------
_NLINES, _LSTEPS = 24, 256
# deterministic endpoints from the LCG chain (dyadic-free; pure arithmetic)
_LX1 = f"((({{i}} * {A} + {C}) % {M}) % 360000) / 1000e0"
_LY1 = f"(((({{i}} + 7) * {A} + {C}) % {M}) % 180000) / 1000e0"
_LX2 = f"(((({{i}} + 13) * {A} + {C}) % {M}) % 360000) / 1000e0"
_LY2 = f"(((({{i}} + 29) * {A} + {C}) % {M}) % 180000) / 1000e0"


@Q.register(
    "lines_to_raster",
    f"""WITH lines AS (SELECT t.i AS line_id,
  {_LX1.format(i='t.i')} AS x1, {_LY1.format(i='t.i')} AS y1,
  {_LX2.format(i='t.i')} AS x2, {_LY2.format(i='t.i')} AS y2
  FROM range(0, {_NLINES}) t(i)),
steps AS (SELECT line_id, x1, y1, x2, y2, unnest(generate_series(0, {_LSTEPS})) AS s FROM lines),
cells AS (SELECT DISTINCT line_id,
  CAST(FLOOR((x1 + s * (x2 - x1) / {_LSTEPS}e0) / 6e0) AS BIGINT) AS cx,
  CAST(FLOOR((y1 + s * (y2 - y1) / {_LSTEPS}e0) / 6e0) AS BIGINT) AS cy
  FROM steps)
SELECT line_id, COUNT(*) AS n_cells, MIN(cy * 60 + cx) AS min_cell, MAX(cy * 60 + cx) AS max_cell
FROM cells GROUP BY 1 ORDER BY 1""",
)
def q_lines_to_raster(spark, sf):
    x1, y1 = _LX1.format(i="id"), _LY1.format(i="id")
    x2, y2 = _LX2.format(i="id"), _LY2.format(i="id")
    lines = spark.range(_NLINES).select(
        F.col("id").alias("line_id"),
        F.expr(x1).alias("x1"), F.expr(y1).alias("y1"),
        F.expr(x2).alias("x2"), F.expr(y2).alias("y2"),
    )
    cells = (
        lines.withColumn("s", F.explode(F.sequence(F.lit(0), F.lit(_LSTEPS))))
        .select(
            "line_id",
            F.expr(f"CAST(FLOOR((x1 + s * (x2 - x1) / {_LSTEPS}e0) / 6e0) AS BIGINT)").alias("cx"),
            F.expr(f"CAST(FLOOR((y1 + s * (y2 - y1) / {_LSTEPS}e0) / 6e0) AS BIGINT)").alias("cy"),
        )
        .distinct()
    )
    return (
        cells.groupBy("line_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.min(F.col("cy") * 60 + F.col("cx")).alias("min_cell"),
            F.max(F.col("cy") * 60 + F.col("cx")).alias("max_cell"),
        )
        .orderBy("line_id")
    )


# -- mosaic of two rasters with priority resolve (§2.7; Mosaic.java) ----------
@Q.register(
    "mosaic",
    f"WITH {_RAS}, {_RAS2} SELECT COUNT(*) AS n, "
    "CAST(ROUND(SUM(CASE WHEN a.value != " + f"{NODATA!r}e0 THEN a.value ELSE b.value END), 6) AS DOUBLE) AS total "
    "FROM ras a JOIN ras2 b USING (row, col) "
    f"WHERE a.value != {NODATA!r}e0 OR b.value != {NODATA!r}e0",
)
def q_mosaic(spark, sf):
    merged = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "a").join(
        R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "b"), ["row", "col"]
    )
    return (
        merged.where((F.col("a") != _ND) | (F.col("b") != _ND))
        .select(F.when(F.col("a") != _ND, F.col("a")).otherwise(F.col("b")).alias("v"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 6).cast("double").alias("total"))
    )


# -- cross-stack highest position (§2.5; HighestPosition.groovy) --------------
@Q.register(
    "highest_position",
    f"WITH {_RAS}, {_RAS2} SELECT "
    f"CASE WHEN a.value = {NODATA!r}e0 OR b.value = {NODATA!r}e0 THEN -1 "
    "WHEN a.value >= b.value THEN 0 ELSE 1 END AS pos, COUNT(*) AS n "
    "FROM ras a JOIN ras2 b USING (row, col) GROUP BY 1 ORDER BY 1",
)
def q_highest_position(spark, sf):
    merged = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "a").join(
        R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "b"), ["row", "col"]
    )
    return (
        merged.select(
            F.when((F.col("a") == _ND) | (F.col("b") == _ND), -1)
            .when(F.col("a") >= F.col("b"), 0)
            .otherwise(1)
            .alias("pos")
        )
        .groupBy("pos").agg(F.count(F.lit(1)).alias("n")).orderBy("pos")
    )


# -- hydrology slice (§2.12): D8 pointer, flow accumulation, streams ----------
_HROWS, _HCOLS = 60, 90
_HVAL = cell_value_sql("r.r", "c.c", 0, _HCOLS)
_SQ2 = "1.4142135623730951e0"
_HYD_BASE = (
    f"cells AS (SELECT r.r AS row, c.c AS col, {_HVAL} AS v "
    f"FROM range(0, {_HROWS}) r(r), range(0, {_HCOLS}) c(c)), "
    f"live AS (SELECT row, col, NULLIF(v, {NODATA!r}e0) AS v FROM cells), "
    "w9 AS (SELECT a.row, a.col, a.v AS cv, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col - 1 THEN b.v END) AS n0, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col     THEN b.v END) AS n1, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col + 1 THEN b.v END) AS n2, "
    "MAX(CASE WHEN b.row = a.row     AND b.col = a.col - 1 THEN b.v END) AS n3, "
    "MAX(CASE WHEN b.row = a.row     AND b.col = a.col + 1 THEN b.v END) AS n4, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col - 1 THEN b.v END) AS n5, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col     THEN b.v END) AS n6, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col + 1 THEN b.v END) AS n7 "
    "FROM live a JOIN live b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
    "AND b.col BETWEEN a.col - 1 AND a.col + 1 AND b.v IS NOT NULL "
    "WHERE a.v IS NOT NULL GROUP BY 1, 2, 3), "
    "rates AS (SELECT row, col, "
    f"COALESCE((cv - n0) / {_SQ2}, -1e30) AS r0, COALESCE(cv - n1, -1e30) AS r1, "
    f"COALESCE((cv - n2) / {_SQ2}, -1e30) AS r2, COALESCE(cv - n3, -1e30) AS r3, "
    f"COALESCE(cv - n4, -1e30) AS r4, COALESCE((cv - n5) / {_SQ2}, -1e30) AS r5, "
    f"COALESCE(cv - n6, -1e30) AS r6, COALESCE((cv - n7) / {_SQ2}, -1e30) AS r7 "
    "FROM w9), "
    "d8 AS (SELECT row, col, CASE "
    "WHEN GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) <= 0e0 THEN 0 "
    "WHEN r0 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 1 "
    "WHEN r1 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 2 "
    "WHEN r2 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 4 "
    "WHEN r3 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 8 "
    "WHEN r4 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 16 "
    "WHEN r5 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 32 "
    "WHEN r6 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 64 "
    "ELSE 128 END AS code FROM rates)"
)
_HYD_EDGES = (
    "edges AS (SELECT row * 1000000 + col AS id, "
    "(row + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1 "
    "WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END) * 1000000 + "
    "(col + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 1 "
    "WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END) AS nid "
    "FROM d8 WHERE code > 0), "
    "reach(id, nid) AS (SELECT id, nid FROM edges UNION "
    "SELECT r.id, e.nid FROM reach r JOIN edges e ON e.id = r.nid), "
    "acc AS (SELECT d.row, d.col, 1 + COALESCE(c.n_up, 0) AS accum FROM d8 d "
    "LEFT JOIN (SELECT nid, COUNT(*) AS n_up FROM reach GROUP BY 1) c "
    "ON d.row * 1000000 + d.col = c.nid)"
)


def _hydem(spark):
    return R.synth_raster(spark, _HROWS, _HCOLS)


@Q.register(
    "flow_d8",
    f"WITH {_HYD_BASE} SELECT row, col, CAST(code AS BIGINT) AS code FROM d8 ORDER BY row, col",
)
def q_flow_d8(spark, sf):
    from .operators.hydro import flow_pointer_d8

    return flow_pointer_d8(_hydem(spark)).orderBy("row", "col")


@Q.register(
    "flow_accum",
    f"WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES} "
    "SELECT row, col, CAST(accum AS BIGINT) AS accum FROM acc ORDER BY row, col",
)
def q_flow_accum(spark, sf):
    from .operators.hydro import flow_accum, flow_pointer_d8

    return (
        flow_accum(flow_pointer_d8(_hydem(spark)))
        .select("row", "col", F.col("accum").cast("long").alias("accum"))
        .orderBy("row", "col")
    )


@Q.register(
    "extract_streams",
    f"WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES} "
    "SELECT row, col, CAST(accum AS BIGINT) AS accum FROM acc WHERE accum >= 20 "
    "ORDER BY row, col",
)
def q_extract_streams(spark, sf):
    from .operators.hydro import extract_streams, flow_pointer_d8

    return (
        extract_streams(flow_pointer_d8(_hydem(spark)), 20)
        .select("row", "col", F.col("accum").cast("long").alias("accum"))
        .orderBy("row", "col")
    )


# -- profile along a transect (§2.5/2.6; Scripts/Profile.groovy) --------------
@Q.register(
    "profile",
    f"WITH {_RAS}, samp AS (SELECT t.i AS step, 10 + t.i AS row, 20 + 2 * t.i AS col "
    "FROM range(0, 100) t(i)) "
    "SELECT s.step, r.value, r.value - LAG(r.value) OVER (ORDER BY s.step) AS dz "
    f"FROM samp s JOIN ras r ON r.row = s.row AND r.col = s.col "
    f"WHERE r.value != {NODATA!r}e0 ORDER BY s.step",
)
def q_profile(spark, sf):
    from pyspark.sql import Window

    samp = spark.range(100).select(
        F.col("id").alias("step"),
        (10 + F.col("id")).alias("row"),
        (20 + 2 * F.col("id")).alias("col"),
    )
    cells = R.explode_cells(_dem(spark))
    j = samp.join(cells, ["row", "col"]).where(F.col("value") != _ND)
    w = Window.orderBy("step")
    return (
        j.select("step", "value", (F.col("value") - F.lag("value").over(w)).alias("dz"))
        .orderBy("step")
    )


# -- zonal stats with a RASTER zone layer (§2.3 raster-raster alignment) ------
@Q.register(
    "zonal_raster",
    f"WITH {_RAS}, {_RAS2} SELECT CAST(FLOOR(b.value / 30e0) AS BIGINT) AS zone, "
    "COUNT(*) AS n, CAST(ROUND(SUM(a.value) / COUNT(*), 6) AS DOUBLE) AS mean_val, "
    "MIN(a.value) AS min_val, MAX(a.value) AS max_val "
    "FROM ras a JOIN ras2 b USING (row, col) "
    f"WHERE a.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0 "
    "GROUP BY 1 ORDER BY 1",
)
def q_zonal_raster(spark, sf):
    a = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "a")
    b = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "b")
    j = a.join(b, ["row", "col"]).where((F.col("a") != _ND) & (F.col("b") != _ND))
    return (
        j.groupBy(F.expr("CAST(FLOOR(b / 30e0) AS BIGINT)").alias("zone"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("a") / F.count(F.lit(1)), 6).cast("double").alias("mean_val"),
            F.min("a").alias("min_val"),
            F.max("a").alias("max_val"),
        )
        .orderBy("zone")
    )


# -- raster buffer: cells within distance d of target cells (§2.11) -----------
@Q.register(
    "raster_buffer",
    f"""WITH ras AS (SELECT r.r AS row, c.c AS col,
  {cell_value_sql('r.r', 'c.c', 0, 90)} AS value FROM range(0, 60) r(r), range(0, 90) c(c)),
tgt AS (SELECT row AS trow, col AS tcol FROM ras WHERE value > 140e0),
hit AS (SELECT DISTINCT a.row, a.col FROM ras a JOIN tgt t
  ON (a.row - t.trow) * (a.row - t.trow) + (a.col - t.tcol) * (a.col - t.tcol) <= 25
  WHERE a.value != {NODATA!r}e0)
SELECT COUNT(*) AS n_buffer FROM hit""",
)
def q_raster_buffer(spark, sf):
    """Bounded ring join: each target explodes to its <=81-cell disk (radius
    5) and equi-joins live cells on (row, col).  The target set grows with
    the raster, so the previous cells x targets broadcast crossJoin was an
    O(n^2) product at scale (VERDICT r2 wrong #2); this plan is O(targets *
    disk_size) with a plain shuffled semi-join."""
    cells = R.explode_cells(R.synth_raster(spark, 60, 90))
    tgt = cells.where(F.col("value") > 140.0).select(
        F.col("row").alias("trow"), F.col("col").alias("tcol")
    )
    disk = (
        tgt.withColumn("_dr", F.explode(F.sequence(F.lit(-5), F.lit(5))))
        .withColumn("_dc", F.explode(F.sequence(F.lit(-5), F.lit(5))))
        .where(
            F.col("_dr") * F.col("_dr") + F.col("_dc") * F.col("_dc") <= 25
        )
        .select(
            (F.col("trow") + F.col("_dr")).alias("row"),
            (F.col("tcol") + F.col("_dc")).alias("col"),
        )
        .distinct()
    )
    live = cells.where(F.col("value") != _ND)
    hit = live.join(disk, ["row", "col"], "left_semi")
    return hit.agg(F.count(F.lit(1)).alias("n_buffer"))


# -- nearest-neighbor resample 2x upscale (§2.13; Resample.java:185-309) ------
@Q.register(
    "resample_nn",
    f"WITH {_RAS} SELECT u.r AS urow, u.c AS ucol, r.value "
    f"FROM (SELECT a.a AS r, b.b AS c FROM range(0, 120) a(a), range(0, 120) b(b)) u "
    "JOIN ras r ON r.row = u.r // 2 AND r.col = u.c // 2 "
    "ORDER BY urow, ucol",
)
def q_resample_nn(spark, sf):
    up = spark.range(120).selectExpr("id AS urow").crossJoin(
        spark.range(120).selectExpr("id AS ucol")
    )
    cells = R.explode_cells(_dem(spark))
    return (
        up.join(
            cells,
            (F.col("row") == (F.col("urow") / 2).cast("long"))
            & (F.col("col") == (F.col("ucol") / 2).cast("long")),
        )
        .select("urow", "ucol", "value")
        .orderBy("urow", "ucol")
    )


# -- focal median (FilterMedian.java) and aspect (Aspect.java) ----------------
@Q.register(
    "focal_median",
    f"WITH {_RASF}, {_NBR} SELECT row, col, "
    f"MEDIAN(bv) FILTER (bv != {NODATA!r}e0) AS value "
    f"FROM nbr GROUP BY 1, 2 HAVING COUNT(*) FILTER (bv != {NODATA!r}e0) > 0 "
    "ORDER BY row, col",
)
def q_focal_median(spark, sf):
    out = R.focal(_demf(spark), "median")
    return R.explode_cells(out).where(F.col("value") != _ND).orderBy("row", "col")


_ASPECT_SQL = (
    "CASE WHEN DEGREES(ATAN2((sw + 2e0 * ss + se - nw - 2e0 * nn - ne) / 8e0, "
    "-((ne + 2e0 * ev + se - nw - 2e0 * wv - sw) / 8e0))) < 0e0 "
    "THEN DEGREES(ATAN2((sw + 2e0 * ss + se - nw - 2e0 * nn - ne) / 8e0, "
    "-((ne + 2e0 * ev + se - nw - 2e0 * wv - sw) / 8e0))) + 360e0 "
    "ELSE DEGREES(ATAN2((sw + 2e0 * ss + se - nw - 2e0 * nn - ne) / 8e0, "
    "-((ne + 2e0 * ev + se - nw - 2e0 * wv - sw) / 8e0))) END"
)


@Q.register(
    "aspect",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    f"(FLOOR(({_ASPECT_SQL}) * 1e6 + 0.5e0) / 1e6) AS value FROM w9 "
    f"WHERE cv != {NODATA!r}e0 AND {NODATA!r}e0 NOT IN (nw, nn, ne, wv, ev, sw, ss, se) "
    "AND nw IS NOT NULL AND nn IS NOT NULL AND ne IS NOT NULL AND wv IS NOT NULL "
    "AND ev IS NOT NULL AND sw IS NOT NULL AND ss IS NOT NULL AND se IS NOT NULL "
    "ORDER BY row, col",
)
def q_aspect(spark, sf):
    out = R.focal(_demf(spark), "aspect")
    return R.explode_cells(out).where(F.col("value") != _ND).orderBy("row", "col")


# -- watershed labeling (§2.12; Watershed.java) -------------------------------
@Q.register(
    "watershed_sizes",
    f"WITH RECURSIVE {_HYD_BASE}, "
    "edges AS (SELECT row * 1000000 + col AS id, "
    "(row + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1 "
    "WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END) * 1000000 + "
    "(col + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 1 "
    "WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END) AS nid "
    "FROM d8 WHERE code > 0), "
    "terminals AS (SELECT row * 1000000 + col AS id FROM d8 WHERE code = 0), "
    "walk(id, cur) AS (SELECT id, id FROM (SELECT row * 1000000 + col AS id FROM d8) "
    "UNION SELECT w.id, e.nid FROM walk w JOIN edges e ON e.id = w.cur), "
    "root AS (SELECT w.id, w.cur AS ws FROM walk w JOIN terminals t ON w.cur = t.id) "
    "SELECT ws, COUNT(*) AS n_cells FROM root GROUP BY 1 ORDER BY 1",
)
def q_watershed_sizes(spark, sf):
    from .operators.hydro import flow_pointer_d8, watershed

    ws = watershed(flow_pointer_d8(_hydem(spark)))
    return ws.groupBy("ws").agg(F.count(F.lit(1)).alias("n_cells")).orderBy("ws")


# -- Sobel edge magnitude (FilterSobel.java) ----------------------------------
_SOBEL_SQL = (
    "SQRT(POW(ne + 2e0 * ev + se - nw - 2e0 * wv - sw, 2) + "
    "POW(sw + 2e0 * ss + se - nw - 2e0 * nn - ne, 2))"
)


@Q.register(
    "sobel",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    f"(FLOOR(({_SOBEL_SQL}) * 1e6 + 0.5e0) / 1e6) AS value FROM w9 "
    f"WHERE cv != {NODATA!r}e0 AND {NODATA!r}e0 NOT IN (nw, nn, ne, wv, ev, sw, ss, se) "
    "AND nw IS NOT NULL AND nn IS NOT NULL AND ne IS NOT NULL AND wv IS NOT NULL "
    "AND ev IS NOT NULL AND sw IS NOT NULL AND ss IS NOT NULL AND se IS NOT NULL "
    "ORDER BY row, col",
)
def q_sobel(spark, sf):
    out = R.focal(_demf(spark), "sobel")
    return R.explode_cells(out).where(F.col("value") != _ND).orderBy("row", "col")


# -- weighted overlay (§2.7; WeightedSum.java / WeightedOverlay.java) ---------
@Q.register(
    "weighted_overlay",
    f"WITH {_RAS}, {_RAS2} SELECT COUNT(*) AS n, "
    "CAST(ROUND(SUM(0.75e0 * a.value + 0.25e0 * b.value), 6) AS DOUBLE) AS total, "
    "MIN(0.75e0 * a.value + 0.25e0 * b.value) AS min_v, "
    "MAX(0.75e0 * a.value + 0.25e0 * b.value) AS max_v "
    "FROM ras a JOIN ras2 b USING (row, col) "
    f"WHERE a.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0",
)
def q_weighted_overlay(spark, sf):
    out = R.zip_algebra(_dem(spark, 0), _dem(spark, 1), "0.75e0 * x + 0.25e0 * y")
    cells = R.explode_cells(out).where(F.col("value") != _ND)
    return cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).cast("double").alias("total"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


# -- raster cross-tabulation (§2.4; CrossTabulation.java:228-268) -------------
@Q.register(
    "raster_crosstab",
    f"WITH {_RAS}, {_RAS2} SELECT CAST(FLOOR(a.value / 50e0) AS BIGINT) AS c1, "
    "CAST(FLOOR(b.value / 50e0) AS BIGINT) AS c2, COUNT(*) AS n "
    "FROM ras a JOIN ras2 b USING (row, col) "
    f"WHERE a.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0 "
    "GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_raster_crosstab(spark, sf):
    a = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "a")
    b = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "b")
    j = a.join(b, ["row", "col"]).where((F.col("a") != _ND) & (F.col("b") != _ND))
    return (
        j.groupBy(
            F.expr("CAST(FLOOR(a / 50e0) AS BIGINT)").alias("c1"),
            F.expr("CAST(FLOOR(b / 50e0) AS BIGINT)").alias("c2"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c1", "c2")
    )


# -- trend surface: OLS plane fit z = a + b x + c y (§2.9; TrendSurface.java) -
_TS_SUMS = (
    "s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(lon) AS sx, SUM(lat) AS sy, "
    "SUM(val) AS sz, SUM(lon * lon) AS sxx, SUM(lon * lat) AS sxy, "
    "SUM(lat * lat) AS syy, SUM(lon * val) AS sxz, SUM(lat * val) AS syz FROM pts)"
)
_TS_DET = "(n * (sxx * syy - sxy * sxy) - sx * (sx * syy - sxy * sy) + sy * (sx * sxy - sxx * sy))"
_TS_A = "(sz * (sxx * syy - sxy * sxy) - sx * (sxz * syy - sxy * syz) + sy * (sxz * sxy - sxx * syz))"
_TS_B = "(n * (sxz * syy - sxy * syz) - sz * (sx * syy - sxy * sy) + sy * (sx * syz - sxz * sy))"
_TS_C = "(n * (sxx * syz - sxz * sxy) - sx * (sx * syz - sxz * sy) + sz * (sx * sxy - sxx * sy))"


@Q.register(
    "trend_surface",
    f"WITH {Q.pts_cte()}, {_TS_SUMS} "
    f"SELECT CAST(ROUND({_TS_A} / {_TS_DET}, 4) AS DOUBLE) AS a, "
    f"CAST(ROUND({_TS_B} / {_TS_DET}, 4) AS DOUBLE) AS b, "
    f"CAST(ROUND({_TS_C} / {_TS_DET}, 4) AS DOUBLE) AS c FROM s",
)
def q_trend_surface(spark, sf):
    pts = Q._points(spark, sf)
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("lon").alias("sx"), F.sum("lat").alias("sy"), F.sum("val").alias("sz"),
        F.sum(F.col("lon") * F.col("lon")).alias("sxx"),
        F.sum(F.col("lon") * F.col("lat")).alias("sxy"),
        F.sum(F.col("lat") * F.col("lat")).alias("syy"),
        F.sum(F.col("lon") * F.col("val")).alias("sxz"),
        F.sum(F.col("lat") * F.col("val")).alias("syz"),
    )
    return s.selectExpr(
        f"CAST(ROUND({_TS_A} / {_TS_DET}, 4) AS DOUBLE) AS a",
        f"CAST(ROUND({_TS_B} / {_TS_DET}, 4) AS DOUBLE) AS b",
        f"CAST(ROUND({_TS_C} / {_TS_DET}, 4) AS DOUBLE) AS c",
    )


# -- quadratic trend surface: z = c00 + c10 u + c01 v + c20 u^2 + c11 uv
# + c02 v^2 (§2.9; TrendSurface.java polyOrder=2 path — the reference builds
# the Vandermonde normal equations and dense-solves them,
# TerrainAnalysisTools/src/plugins/TrendSurface.java:216-268).  Coordinates
# normalize to u=(lon-180)/180, v=(lat-90)/90 so the 6x6 normal matrix stays
# O(n)-conditioned — raw degree-4 power sums of magnitudes up to 360 would
# amplify last-ulp sum-order noise past the round-4 grid.  The pivot-free
# Gaussian elimination runs as ONE shared SQL text on both engines (fixed
# IEEE op sequence, the kriging policy); pivoting is safe because the matrix
# is the Gram matrix of 6 independent monomials over >6 distinct points,
# hence positive-definite.  Coefficients are reported in the normalized
# (u, v) basis (exactly descalable by the caller).
_TS2_EXP = [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2)]


def _ts2_sql(src: str) -> str:
    def mono(p: int, q: int) -> str:
        f = ["u"] * p + ["v"] * q
        return " * ".join(f) if f else "1e0"

    pows = sorted({(pi + pj, qi + qj) for pi, qi in _TS2_EXP for pj, qj in _TS2_EXP})
    sums = ["CAST(COUNT(*) AS DOUBLE) AS s0_0"] + [
        f"SUM({mono(p, q)}) AS s{p}_{q}" for p, q in pows if (p, q) != (0, 0)
    ] + [f"SUM({mono(p, q)} * w) AS t{p}_{q}" for p, q in _TS2_EXP]
    init = [
        f"s{_TS2_EXP[i][0] + _TS2_EXP[j][0]}_{_TS2_EXP[i][1] + _TS2_EXP[j][1]} AS a{i}_{j}"
        for i in range(6) for j in range(6)
    ] + [f"t{p}_{q} AS b{i}" for i, (p, q) in enumerate(_TS2_EXP)]
    ctes = [
        f"ts2p AS (SELECT ((lon - 180e0) / 180e0) AS u, "
        f"((lat - 90e0) / 90e0) AS v, val AS w FROM {src})",
        f"ts2s AS (SELECT {', '.join(sums)} FROM ts2p)",
        f"ts2m0 AS (SELECT {', '.join(init)} FROM ts2s)",
    ]
    m = 6
    for ks in range(m - 1):
        sel = []
        for i in range(m):
            for j in range(m):
                if i > ks and j >= ks:
                    sel.append(
                        f"a{i}_{j} - (a{i}_{ks} / a{ks}_{ks}) * a{ks}_{j} AS a{i}_{j}"
                    )
                else:
                    sel.append(f"a{i}_{j}")
            sel.append(
                f"b{i} - (a{i}_{ks} / a{ks}_{ks}) * b{ks} AS b{i}"
                if i > ks else f"b{i}"
            )
        ctes.append(f"ts2m{ks + 1} AS (SELECT {', '.join(sel)} FROM ts2m{ks})")
    ctes.append("ts2x5 AS (SELECT *, b5 / a5_5 AS x5 FROM ts2m5)")
    for i in range(4, -1, -1):
        terms = "".join(f" - a{i}_{j} * x{j}" for j in range(i + 1, 6))
        ctes.append(
            f"ts2x{i} AS (SELECT *, (b{i}{terms}) / a{i}_{i} AS x{i} FROM ts2x{i + 1})"
        )
    names = ["c00", "c10", "c01", "c20", "c11", "c02"]
    out = ", ".join(f"(FLOOR(x{i} * 1e4 + 0.5e0) / 1e4) AS {names[i]}" for i in range(6))
    return ", ".join(ctes) + f" SELECT {out} FROM ts2x0"


@Q.register("trend_surface2", f"WITH {Q.pts_cte()}, {_ts2_sql('pts')}")
def q_trend_surface2(spark, sf):
    Q._points(spark, sf).createOrReplaceTempView("ts2_pts")
    return spark.sql(f"WITH {_ts2_sql('ts2_pts')}")


# -- hillshade (TerrainAnalysisTools/src/plugins/Hillshade.java) --------------
_FX = "((ne + 2e0 * ev + se - nw - 2e0 * wv - sw) / 8e0)"
_FY = "((sw + 2e0 * ss + se - nw - 2e0 * nn - ne) / 8e0)"
_HS_SQL = (
    f"(SIN(RADIANS(30e0)) * COS(ATAN(SQRT({_FX} * {_FX} + {_FY} * {_FY}))) "
    f"+ COS(RADIANS(30e0)) * SIN(ATAN(SQRT({_FX} * {_FX} + {_FY} * {_FY}))) "
    f"* COS(RADIANS(315e0) - ATAN2(-{_FX}, {_FY})))"
)


@Q.register(
    "hillshade",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    f"(FLOOR(({_HS_SQL}) * 1e6 + 0.5e0) / 1e6) AS value FROM w9 "
    f"WHERE cv != {NODATA!r}e0 AND {NODATA!r}e0 NOT IN (nw, nn, ne, wv, ev, sw, ss, se) "
    "AND nw IS NOT NULL AND nn IS NOT NULL AND ne IS NOT NULL AND wv IS NOT NULL "
    "AND ev IS NOT NULL AND sw IS NOT NULL AND ss IS NOT NULL AND se IS NOT NULL "
    "ORDER BY row, col",
)
def q_hillshade(spark, sf):
    out = R.focal(_demf(spark), "hillshade")
    return R.explode_cells(out).where(F.col("value") != _ND).orderBy("row", "col")


# -- two-image histogram matching (§2.13; TwoImageHistogramMatching.java) -----
# A's integer-bin CDF is mapped onto B's bin whose CDF quantile is the
# smallest >= A's (classic LUT remap); all-integer counts -> exact.
@Q.register(
    "hist_match",
    f"WITH {_RAS}, {_RAS2}, "
    f"la AS (SELECT CAST(FLOOR(value) AS BIGINT) AS bin FROM ras WHERE {_NDF}), "
    f"lb AS (SELECT CAST(FLOOR(value) AS BIGINT) AS bin FROM ras2 WHERE value != {NODATA!r}e0), "
    "ca AS (SELECT bin, CAST(SUM(COUNT(*)) OVER (ORDER BY bin) AS DOUBLE) "
    "/ (SELECT COUNT(*) FROM la) AS q FROM la GROUP BY bin), "
    "cb AS (SELECT bin, CAST(SUM(COUNT(*)) OVER (ORDER BY bin) AS DOUBLE) "
    "/ (SELECT COUNT(*) FROM lb) AS q FROM lb GROUP BY bin), "
    "lut AS (SELECT ca.bin AS abin, MIN(cb.bin) AS mapped FROM ca JOIN cb "
    "ON cb.q >= ca.q GROUP BY 1) "
    "SELECT l.mapped, COUNT(*) AS n FROM la a JOIN lut l ON a.bin = l.abin "
    "GROUP BY 1 ORDER BY 1",
)
def q_hist_match(spark, sf):
    from pyspark.sql import Window

    def cdf(cells):
        h = cells.groupBy(F.expr("CAST(FLOOR(value) AS BIGINT)").alias("bin")).agg(
            F.count(F.lit(1)).alias("n")
        )
        t = h.agg(F.sum("n").alias("t"))
        w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        return (
            h.withColumn("cum", F.sum("n").over(w))
            .crossJoin(F.broadcast(t))
            .select("bin", (F.col("cum").cast("double") / F.col("t")).alias("q"))
        )

    la = R.explode_cells(_dem(spark, 0)).where(F.col("value") != _ND)
    lb = R.explode_cells(_dem(spark, 1)).where(F.col("value") != _ND)
    ca, cb = cdf(la), cdf(lb)
    lut = (
        ca.alias("a").join(F.broadcast(cb.alias("b")), F.col("b.q") >= F.col("a.q"))
        .groupBy(F.col("a.bin").alias("abin"))
        .agg(F.min("b.bin").alias("mapped"))
    )
    return (
        la.withColumn("bin", F.expr("CAST(FLOOR(value) AS BIGINT)"))
        .join(F.broadcast(lut), F.col("bin") == F.col("abin"))
        .groupBy("mapped").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("mapped")
    )


# -- percent of stack greater than threshold (Scripts/PercentGreaterThan.groovy)
@Q.register(
    "percent_greater",
    f"WITH {_RAS}, {_RAS2} SELECT "
    "(CASE WHEN a.value > 100e0 THEN 50e0 ELSE 0e0 END "
    "+ CASE WHEN b.value > 100e0 THEN 50e0 ELSE 0e0 END) AS pct, COUNT(*) AS n "
    "FROM ras a JOIN ras2 b USING (row, col) "
    f"WHERE a.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0 GROUP BY 1 ORDER BY 1",
)
def q_percent_greater(spark, sf):
    out = R.zip_algebra(
        _dem(spark, 0), _dem(spark, 1),
        "CASE WHEN x > 100e0 THEN 50e0 ELSE 0e0 END + CASE WHEN y > 100e0 THEN 50e0 ELSE 0e0 END",
    )
    return (
        R.explode_cells(out).where(F.col("value") != _ND)
        .groupBy(F.col("value").alias("pct")).agg(F.count(F.lit(1)).alias("n"))
        .orderBy("pct")
    )


# -- raster-to-raster OLS regression (ImageRegression.java:237-264) -----------
@Q.register(
    "raster_regression",
    f"WITH {_RAS}, {_RAS2}, j AS (SELECT a.value AS x, b.value AS y "
    "FROM ras a JOIN ras2 b USING (row, col) "
    f"WHERE a.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0) "
    "SELECT CAST(ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) "
    "/ (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6) AS DOUBLE) AS slope_b, "
    "CAST(ROUND((SUM(y) - (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) "
    "/ (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) * SUM(x)) / COUNT(*), 6) AS DOUBLE) AS intercept_a, "
    "COUNT(*) AS n FROM j",
)
def q_raster_regression(spark, sf):
    a = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "x")
    b = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "y")
    j = a.join(b, ["row", "col"]).where((F.col("x") != _ND) & (F.col("y") != _ND))
    n = F.count(F.lit(1))
    sb = (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    return j.agg(
        F.round(sb, 6).cast("double").alias("slope_b"),
        F.round((F.sum("y") - sb * F.sum("x")) / n, 6).cast("double").alias("intercept_a"),
        n.alias("n"),
    )


# -- change vector analysis (§2.13; ChangeVectorAnalysis.java) ----------------
# two dates x two bands; change magnitude per cell + 4-quadrant direction code.
# The two bands per date are INDEPENDENT synthetic bands (0/2 = date1,
# 1/3 = date2) so all four direction quadrants are genuinely exercised.
_VAL2 = cell_value_sql("r.r", "c.c", 2, COLS)
_VAL3 = cell_value_sql("r.r", "c.c", 3, COLS)
_RAS3 = (
    f"ras3 AS (SELECT r.r AS row, c.c AS col, {_VAL2} AS value "
    f"FROM range(0, {ROWS}) r(r), range(0, {COLS}) c(c))"
)
_RAS4 = (
    f"ras4 AS (SELECT r.r AS row, c.c AS col, {_VAL3} AS value "
    f"FROM range(0, {ROWS}) r(r), range(0, {COLS}) c(c))"
)


@Q.register(
    "change_vector",
    f"WITH {_RAS}, {_RAS2}, {_RAS3}, {_RAS4} SELECT "
    "(CASE WHEN b1.value >= a1.value THEN 1 ELSE 0 END "
    "+ CASE WHEN b2.value >= a2.value THEN 2 ELSE 0 END) AS quad, "
    "COUNT(*) AS n, "
    "CAST(ROUND(SUM(SQRT(POW(b1.value - a1.value, 2) + POW(b2.value - a2.value, 2))), 4) AS DOUBLE) AS total_mag "
    "FROM ras a1 JOIN ras2 b1 USING (row, col) JOIN ras3 a2 USING (row, col) "
    "JOIN ras4 b2 USING (row, col) "
    f"WHERE a1.value != {NODATA!r}e0 AND b1.value != {NODATA!r}e0 "
    f"AND a2.value != {NODATA!r}e0 AND b2.value != {NODATA!r}e0 "
    "GROUP BY 1 ORDER BY 1",
)
def q_change_vector(spark, sf):
    a1 = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "a1")
    b1 = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "b1")
    a2 = R.explode_cells(_dem(spark, 2)).withColumnRenamed("value", "a2")
    b2 = R.explode_cells(_dem(spark, 3)).withColumnRenamed("value", "b2")
    j = (
        a1.join(b1, ["row", "col"]).join(a2, ["row", "col"]).join(b2, ["row", "col"])
        .where((F.col("a1") != _ND) & (F.col("b1") != _ND)
               & (F.col("a2") != _ND) & (F.col("b2") != _ND))
    )
    quad = (
        F.when(F.col("b1") >= F.col("a1"), 1).otherwise(0)
        + F.when(F.col("b2") >= F.col("a2"), 2).otherwise(0)
    )
    mag = F.sqrt(
        F.pow(F.col("b1") - F.col("a1"), 2) + F.pow(F.col("b2") - F.col("a2"), 2)
    )
    return (
        j.groupBy(quad.alias("quad"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(mag), 4).cast("double").alias("total_mag"))
        .orderBy("quad")
    )


# -- Rho8 stochastic pointer (§2.12; FlowPointerRho8.java, Fairfield &
# Leymarie 1991): diagonal drop rates divide by (2 - rho), rho = per-cell
# deterministic LCG (the engine's determinization of the reference's RNG).
_RHO8_EXPR = (
    "(CAST(((row * 1000003 + col) * 2654435761 + 987654321) % 2147483648 "
    "AS DOUBLE) / 2147483648e0)"
)
_RHO8_BASE = (
    _HYD_BASE[:_HYD_BASE.index("rates AS (")]
    + f"rho9 AS (SELECT *, {_RHO8_EXPR} AS rho FROM w9), "
    "rates AS (SELECT row, col, "
    "COALESCE((cv - n0) / (2e0 - rho), -1e30) AS r0, COALESCE(cv - n1, -1e30) AS r1, "
    "COALESCE((cv - n2) / (2e0 - rho), -1e30) AS r2, COALESCE(cv - n3, -1e30) AS r3, "
    "COALESCE(cv - n4, -1e30) AS r4, COALESCE((cv - n5) / (2e0 - rho), -1e30) AS r5, "
    "COALESCE(cv - n6, -1e30) AS r6, COALESCE((cv - n7) / (2e0 - rho), -1e30) AS r7 "
    "FROM rho9), "
    + _HYD_BASE[_HYD_BASE.index("d8 AS ("):]
)


@Q.register(
    "flow_rho8",
    f"WITH {_RHO8_BASE} SELECT row, col, CAST(code AS BIGINT) AS code FROM d8 ORDER BY row, col",
)
def q_flow_rho8(spark, sf):
    from .operators.hydro import flow_pointer_rho8

    return flow_pointer_rho8(_hydem(spark)).orderBy("row", "col")


# -- SnapPourPoints (§2.3/§2.12; SnapPourPoints.java:407): arg-max window ----
_SNAP_PP = [(0, 10, 20), (1, 30, 45), (2, 50, 70)]
_SNAP_R = 3


@Q.register(
    "snap_pour",
    f"WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES} "
    "SELECT pp_id, row AS srow, col AS scol, CAST(accum AS BIGINT) AS accum FROM ("
    "SELECT p.pp_id, a.row, a.col, a.accum, "
    "ROW_NUMBER() OVER (PARTITION BY p.pp_id ORDER BY a.accum DESC, a.row, a.col) AS rn "
    f"FROM (VALUES {', '.join(f'({i},{r},{c})' for i, r, c in _SNAP_PP)}) p(pp_id, r, c) "
    f"JOIN acc a ON a.row BETWEEN p.r - {_SNAP_R} AND p.r + {_SNAP_R} "
    f"AND a.col BETWEEN p.c - {_SNAP_R} AND p.c + {_SNAP_R}"
    ") WHERE rn = 1 ORDER BY pp_id",
)
def q_snap_pour(spark, sf):
    from .operators.hydro import flow_accum, flow_pointer_d8, snap_pour_points

    acc = flow_accum(flow_pointer_d8(_hydem(spark))).select(
        "row", "col", F.col("accum").cast("long").alias("accum")
    )
    pour = spark.createDataFrame(_SNAP_PP, "pp_id long, row long, col long")
    return snap_pour_points(pour, acc, radius=_SNAP_R)


# -- stream link labeling (StreamNetworkAnalysisTools StreamLinkID.java) ------
# stream cells (accum >= 5) labeled into 8-connected links
@Q.register(
    "stream_links",
    f"WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES}, "
    "stream AS (SELECT row, col FROM acc WHERE accum >= 5), "
    "sbase AS (SELECT row, col, row * 1000000 + col AS id FROM stream), "
    "sadj AS (SELECT a.id AS id, b.id AS nid FROM sbase a JOIN sbase b "
    "ON ABS(a.row - b.row) <= 1 AND ABS(a.col - b.col) <= 1), "
    "sreach(id, rid) AS (SELECT id, id FROM sbase UNION "
    "SELECT r.id, a.nid FROM sreach r JOIN sadj a ON a.id = r.rid), "
    "slab AS (SELECT id, MIN(rid) AS label FROM sreach GROUP BY 1) "
    "SELECT label, COUNT(*) AS n_cells FROM slab GROUP BY 1 ORDER BY 1",
)
def q_stream_links(spark, sf):
    from .operators.clump import clump
    from .operators.hydro import flow_accum, flow_pointer_d8

    acc = flow_accum(flow_pointer_d8(_hydem(spark)))
    stream = acc.where(F.col("accum") >= 5).select("row", "col", F.lit(1).alias("cls"))
    return (
        clump(stream, 1_000_000, connectivity=8)
        .groupBy("label").agg(F.count(F.lit(1)).alias("n_cells"))
        .orderBy("label")
    )


# -- depression filling (§2.12; FillDepressions.java priority flood) ----------
# minimax fixpoint: filled(c) = max(dem(c), min over 8-paths to an open cell
# of the path max).  Oracle: Jacobi relaxation to the same fixpoint via a
# recursive CTE (monotone from +inf; K bounded below by the longest minimax
# geodesic on this grid — convergence asserted by the engine match itself).
# Values are dyadic max/min selections — EXACT, no rounding policy needed.
_DROWS, _DCOLS, _DK = 40, 60, 80
_DVAL = cell_value_sql("r.r", "c.c", 0, _DCOLS)


@Q.register(
    "fill_depressions",
    f"""WITH RECURSIVE
rasd AS (SELECT r.r AS row, c.c AS col, {_DVAL} AS value
         FROM range(0, {_DROWS}) r(r), range(0, {_DCOLS}) c(c)),
live AS (SELECT row, col, value AS dem FROM rasd WHERE value != {NODATA!r}e0),
offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)) t(dr, dc)),
base AS (SELECT a.row, a.col, a.dem,
  (a.row = 0 OR a.row = {_DROWS - 1} OR a.col = 0 OR a.col = {_DCOLS - 1} OR EXISTS (
     SELECT 1 FROM offs o JOIN rasd n ON n.row = a.row + o.dr AND n.col = a.col + o.dc
     WHERE n.value = {NODATA!r}e0)) AS s
  FROM live a),
fill(it, row, col, f) AS (
  SELECT 0, row, col, CASE WHEN s THEN dem ELSE 1e18 END FROM base
  UNION ALL
  SELECT f.it + 1, b.row, b.col,
    CASE WHEN b.s THEN b.dem ELSE GREATEST(b.dem, MIN(f.f)) END
  FROM fill f JOIN offs o ON TRUE
  JOIN base b ON b.row = f.row + o.dr AND b.col = f.col + o.dc
  WHERE f.it < {_DK}
  GROUP BY f.it, b.row, b.col, b.dem, b.s
)
SELECT b.row, b.col, COALESCE(l.f, b.dem) AS filled
FROM base b LEFT JOIN (SELECT row, col, f FROM fill WHERE it = {_DK}) l
USING (row, col) ORDER BY b.row, b.col""",
)
def q_fill_depressions(spark, sf):
    from .operators.hydro import fill_depressions

    cells = (
        R.explode_cells(R.synth_raster(spark, _DROWS, _DCOLS))
        .where(F.col("value") != _ND)
        .withColumnRenamed("value", "dem")
    )
    return fill_depressions(cells, _DROWS, _DCOLS, tile=16).orderBy("row", "col")


# BreachDepressions (§2.12; HydroTools/src/plugins/BreachDepressions.java):
# constrained-window breach conditioning.  The oracle runs on a crater DEM
# engineered so each pit's bounded-Dijkstra optimum is PROVABLY one straight
# 2-step breach (pit -> cheapest trench-adjacent rim -> trench): the plane
# descends 1/16 per column so no plane cell within the 8-step window reaches
# p - k*eps, every rim carve costs ~8 vs ~4 for any extra detour cell, the 3
# candidate rims share a column (same base) with distinct dyadic jitters, and
# the trench itself is a target-less pit that stays put.  The closed-form
# carve (argmin of 3 jitters, value p - eps) is exact SQL; the operator under
# test is the real general kernel (tests/test_breach.py keeps the organic DEM
# + sequential numpy oracle + tile-invariance / drains properties).
_BROWS, _BCOLS = 40, 64
_B_EPS = 2.0 ** -12
# shared DEM text ({r}/{c} = row/col column names); all values dyadic.
# KR/KC = crater indices: floor((r|c)/12) is constant over each crater's
# local cells (row offsets 5..7, col offsets 5..8 stay inside one block).
_B_KR = "CAST(FLOOR(({r}) / 12e0) AS BIGINT)"
_B_KC = "CAST(FLOOR(({c}) / 12e0) AS BIGINT)"
_B_DEM = (
    "CASE "
    f"WHEN ({{r}}) % 12 = 6 AND ({{c}}) % 12 = 6 THEN 196e0 - {_B_KC} * 0.75e0 "   # pit: B0 - 4
    f"WHEN ({{r}}) % 12 = 6 AND ({{c}}) % 12 = 8 THEN 192e0 - {_B_KC} * 0.75e0 "   # trench: B0 - 8
    "WHEN ({r}) % 12 BETWEEN 5 AND 7 AND ({c}) % 12 BETWEEN 5 AND 7 "
    f"THEN 204e0 - {_B_KC} * 0.75e0 "
    "   + CAST(((({r}) % 12 - 5) * 3 + (({c}) % 12 - 5) "
    f"      + 7 * ({_B_KR} * 5 + {_B_KC})) % 9 AS DOUBLE) / 16e0 "                  # rim: B0 + 4 + jit
    "ELSE 200e0 - CAST(({c}) AS DOUBLE) / 16e0 END"
)
# B0 = 200 - c0/16 with c0 = 12*kc + 6 -> 200 - 0.375 - 0.75*kc; the pit/
# trench/rim arms above fold the 0.375 into the constant (only relative
# levels matter: plane stays >= p + 3 everywhere within the search window).


@Q.register(
    "breach_depressions",
    f"WITH g AS (SELECT r.r AS row, c.c AS col, "
    + _B_DEM.format(r="r.r", c="c.c")
    + f" AS dem FROM range(0, {_BROWS}) r(r), range(0, {_BCOLS}) c(c)), "
    f"cr AS (SELECT kr.k AS kr, kc.k AS kc FROM range(0, {(_BROWS - 7) // 12 + 1}) kr(k), "
    f"range(0, {(_BCOLS - 9) // 12 + 1}) kc(k)), "
    "jt AS (SELECT kr * 12 + 6 AS r0, kc * 12 + 6 AS c0, kc, "
    "((2 + 7 * (kr * 5 + kc)) % 9) AS j2, ((5 + 7 * (kr * 5 + kc)) % 9) AS j5, "
    "((8 + 7 * (kr * 5 + kc)) % 9) AS j8 FROM cr), "
    "cv AS (SELECT r0 + CASE WHEN j2 <= j5 AND j2 <= j8 THEN -1 "
    "WHEN j5 <= j8 THEN 0 ELSE 1 END AS row, c0 + 1 AS col, "
    f"196e0 - kc * 0.75e0 - {_B_EPS!r}e0 AS carved FROM jt "
    # the flat plane makes (r0, c0-2) a pit too (east wall = rim, equal
    # neighbors N/S): its optimum is the eps-cost path over equal ground
    # (r0,c0-2) -> carve (r0-1,c0-2) -> target (r0-2,c0-1), unique by the
    # lexicographic (cost, steps, row, col) tuple
    "UNION ALL SELECT r0 - 1 AS row, c0 - 2 AS col, "
    f"199.75e0 - kc * 0.75e0 - {_B_EPS!r}e0 AS carved FROM jt) "
    "SELECT g.row, g.col, COALESCE(cv.carved, g.dem) AS breached FROM g "
    "LEFT JOIN cv ON cv.row = g.row AND cv.col = g.col ORDER BY g.row, g.col",
)
def q_breach_depressions(spark, sf):
    from .operators.hydro import breach_depressions

    cells = (
        spark.range(_BROWS * _BCOLS)
        .select(
            (F.col("id") / _BCOLS).cast("long").alias("row"),
            (F.col("id") % _BCOLS).alias("col"),
        )
        .select("row", "col", F.expr(_B_DEM.format(r="row", c="col")).alias("dem"))
    )
    return breach_depressions(cells, tile=16).orderBy("row", "col")


# -- stream network measures (§2.12; StreamOrder/Magnitude/LinkLength/
# FindMainStem) — link DAG orders via K unrolled Jacobi stages (monotone,
# converge at DAG depth), main stem via K unrolled upstream-walk stages.
_SQ2L = "1.4142135623730951e0"
_OM_K = 80
_MS_K = 100


def _stream_net_sql(threshold: int = 5, acc_iters: int = 200,
                    lab_iters: int = 250) -> str:
    """Stream-network oracle CTEs over a `d8` pointer CTE.

    Accumulation and link CC use ITERATION-COUNTER Jacobi recursions
    (O(cells x rounds) UNION ALL rows) rather than transitive-closure pair
    sets — the closure form is O(sum path^2) and stalls DuckDB on DEMs with
    long drainage paths.  acc converges at the longest flow path; link
    labels at the link diameter; both bounds asserted by the engine match.
    """
    dr_case = ("CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 "
               "WHEN 2 THEN -1 WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 "
               "WHEN 6 THEN 1 ELSE 1 END")
    dc_case = ("CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 "
               "WHEN 2 THEN 1 WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 "
               "WHEN 6 THEN 0 ELSE 1 END")
    parts = [
        # cell flow edges + self-edges (the self-edge keeps source cells in
        # every aggregation round)
        f"fedge AS MATERIALIZED (SELECT row, col, row + {dr_case} AS nr, "
        f"col + {dc_case} AS nc, 0 AS selfe FROM d8 WHERE code > 0 "
        "UNION ALL SELECT row, col, row, col, 1 FROM d8)",
        "accit(it, row, col, a) AS (SELECT 0, row, col, CAST(1 AS BIGINT) FROM d8 "
        "UNION ALL SELECT u.it + 1, e.nr, e.nc, "
        "CAST(1 + COALESCE(SUM(CASE WHEN e.selfe = 0 THEN u.a END), 0) AS BIGINT) "
        "FROM accit u JOIN fedge e ON e.row = u.row AND e.col = u.col "
        f"WHERE u.it < {acc_iters} GROUP BY 1, 2, 3)",
        f"acc AS MATERIALIZED (SELECT row, col, a AS accum FROM accit WHERE it = {acc_iters})",
        f"stream AS MATERIALIZED (SELECT row, col FROM acc WHERE accum >= {threshold})",
        f"sd AS MATERIALIZED (SELECT s.row, s.col, s.row + {dr_case} AS nr, "
        f"s.col + {dc_case} AS nc "
        "FROM stream s JOIN d8 d USING (row, col) WHERE d.code > 0)",
        "sedge AS MATERIALIZED (SELECT e.* FROM sd e JOIN stream t ON t.row = e.nr AND t.col = e.nc)",
        "junc AS MATERIALIZED (SELECT nr, nc FROM sedge GROUP BY 1, 2 HAVING COUNT(*) >= 2)",
        "kept AS MATERIALIZED (SELECT e.* FROM sedge e LEFT JOIN junc j ON j.nr = e.nr AND j.nc = e.nc WHERE j.nr IS NULL)",
        "cut AS MATERIALIZED (SELECT e.* FROM sedge e JOIN junc j ON j.nr = e.nr AND j.nc = e.nc)",
        "snode AS MATERIALIZED (SELECT row * 1000000 + col AS id FROM stream)",
        # symmetric kept edges + self-edges for min-label propagation
        "symp AS MATERIALIZED (SELECT row * 1000000 + col AS id, nr * 1000000 + nc AS nid FROM kept "
        "UNION ALL SELECT nr * 1000000 + nc, row * 1000000 + col FROM kept "
        "UNION ALL SELECT id, id FROM snode)",
        "labit(it, id, lab) AS (SELECT 0, id, id FROM snode "
        "UNION ALL SELECT u.it + 1, e.nid, MIN(u.lab) "
        "FROM labit u JOIN symp e ON e.id = u.id "
        f"WHERE u.it < {lab_iters} GROUP BY 1, 2)",
        f"slab AS MATERIALIZED (SELECT id, lab AS link FROM labit WHERE it = {lab_iters})",
        "links AS MATERIALIZED (SELECT DISTINCT link FROM slab)",
        "ldag AS MATERIALIZED (SELECT DISTINCT u.link AS up, v.link AS dn FROM cut c "
        "JOIN slab u ON u.id = c.row * 1000000 + c.col "
        "JOIN slab v ON v.id = c.nr * 1000000 + c.nc)",
        "om0 AS MATERIALIZED (SELECT link, 1 AS ord, CAST(1 AS BIGINT) AS mag FROM links)",
    ]
    for k in range(_OM_K):
        p, c = f"om{k}", f"om{k + 1}"
        parts.append(
            f"{c}_mx AS MATERIALIZED (SELECT d.dn AS link, MAX(o.ord) AS mx, "
            f"CAST(SUM(o.mag) AS BIGINT) AS smag FROM ldag d "
            f"JOIN {p} o ON o.link = d.up GROUP BY 1)"
        )
        parts.append(
            f"{c}_tie AS MATERIALIZED (SELECT d.dn AS link, COUNT(*) AS n_mx FROM ldag d "
            f"JOIN {p} o ON o.link = d.up JOIN {c}_mx m ON m.link = d.dn "
            "AND o.ord = m.mx GROUP BY 1)"
        )
        parts.append(
            f"{c} AS MATERIALIZED (SELECT l.link, "
            "CASE WHEN m.mx IS NULL THEN 1 WHEN t.n_mx >= 2 THEN m.mx + 1 "
            "ELSE m.mx END AS ord, COALESCE(m.smag, 1) AS mag "
            f"FROM links l LEFT JOIN {c}_mx m USING (link) "
            f"LEFT JOIN {c}_tie t USING (link))"
        )
    fin = f"om{_OM_K}"
    parts.append(
        "b1 AS MATERIALIZED (SELECT dn, up FROM (SELECT d.dn, d.up, "
        "ROW_NUMBER() OVER (PARTITION BY d.dn ORDER BY o.mag DESC, d.up ASC) AS rn "
        f"FROM ldag d JOIN {fin} o ON o.link = d.up) WHERE rn = 1)"
    )
    parts.append(
        "ms0 AS MATERIALIZED (SELECT link FROM links WHERE link NOT IN (SELECT up FROM ldag))"
    )
    for k in range(_MS_K):
        # NOTE: DuckDB 1.0 degrades UNION to ALL-semantics for
        # non-recursive CTEs inside a WITH RECURSIVE block — dedup must be
        # an explicit DISTINCT
        parts.append(
            f"ms{k + 1} AS MATERIALIZED (SELECT DISTINCT link FROM "
            f"(SELECT link FROM ms{k} UNION ALL "
            f"SELECT b.up FROM ms{k} m JOIN b1 b ON b.dn = m.link))"
        )
    parts.append(
        "lstat AS MATERIALIZED (SELECT link, COUNT(*) AS n_cells FROM slab GROUP BY 1)"
    )
    parts.append(
        "llen AS MATERIALIZED (SELECT s.link, SUM(CASE WHEN k.row != k.nr AND k.col != k.nc "
        f"THEN {_SQ2L} ELSE 1e0 END) AS len FROM kept k "
        "JOIN slab s ON s.id = k.row * 1000000 + k.col GROUP BY 1)"
    )
    return ", ".join(parts)


# stream_order runs on a deterministic TWO-VALLEY DEM (pure integer /
# abs / least arithmetic — identical text in both engines, no libm): two
# valley floors converge downslope, so the network has real confluences and
# the Strahler/Shreve/main-stem logic is genuinely exercised (orders 1-3),
# unlike the noise DEM whose streams are junction-free fragments.
_VROWS, _VCOLS = 80, 60
_VT = 20  # stream threshold on the valley DEM
VALLEY_VAL = (
    "(0.25e0 * (79 - ({row})) "
    "+ 2e0 * LEAST(ABS(({col}) - (20 + CAST(FLOOR(({row}) / 4e0) AS BIGINT))), "
    "ABS(({col}) - (50 - CAST(FLOOR(({row}) / 4e0) AS BIGINT)))) "
    f"+ ((((({{row}}) * {_VCOLS} + ({{col}})) * {A}) % {M}) % 1024) / 2048e0)"
)
_VVAL = VALLEY_VAL.format(row="r.r", col="c.c")
_VHYD_BASE = (
    f"cells AS (SELECT r.r AS row, c.c AS col, {_VVAL} AS v "
    f"FROM range(0, {_VROWS}) r(r), range(0, {_VCOLS}) c(c)), "
    "live AS (SELECT row, col, v FROM cells), "
    "w9 AS (SELECT a.row, a.col, a.v AS cv, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col - 1 THEN b.v END) AS n0, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col     THEN b.v END) AS n1, "
    "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col + 1 THEN b.v END) AS n2, "
    "MAX(CASE WHEN b.row = a.row     AND b.col = a.col - 1 THEN b.v END) AS n3, "
    "MAX(CASE WHEN b.row = a.row     AND b.col = a.col + 1 THEN b.v END) AS n4, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col - 1 THEN b.v END) AS n5, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col     THEN b.v END) AS n6, "
    "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col + 1 THEN b.v END) AS n7 "
    "FROM live a JOIN live b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
    "AND b.col BETWEEN a.col - 1 AND a.col + 1 "
    "GROUP BY 1, 2, 3), "
    "rates AS (SELECT row, col, "
    f"COALESCE((cv - n0) / {_SQ2}, -1e30) AS r0, COALESCE(cv - n1, -1e30) AS r1, "
    f"COALESCE((cv - n2) / {_SQ2}, -1e30) AS r2, COALESCE(cv - n3, -1e30) AS r3, "
    f"COALESCE(cv - n4, -1e30) AS r4, COALESCE((cv - n5) / {_SQ2}, -1e30) AS r5, "
    f"COALESCE(cv - n6, -1e30) AS r6, COALESCE((cv - n7) / {_SQ2}, -1e30) AS r7 "
    "FROM w9), "
    "d8 AS (SELECT row, col, CASE "
    "WHEN GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) <= 0e0 THEN 0 "
    "WHEN r0 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 1 "
    "WHEN r1 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 2 "
    "WHEN r2 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 4 "
    "WHEN r3 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 8 "
    "WHEN r4 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 16 "
    "WHEN r5 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 32 "
    "WHEN r6 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 64 "
    "ELSE 128 END AS code FROM rates)"
)


@Q.register(
    "stream_order",
    f"WITH RECURSIVE {_VHYD_BASE}, {_stream_net_sql(_VT)} "
    f"SELECT l.link, o.ord AS strahler, o.mag AS magnitude, s.n_cells, "
    "CAST(ROUND(COALESCE(e.len, 0e0), 6) AS DOUBLE) AS length, "
    f"l.link IN (SELECT link FROM ms{_MS_K}) AS main_stem "
    f"FROM links l JOIN om{_OM_K} o USING (link) JOIN lstat s USING (link) "
    "LEFT JOIN llen e USING (link) ORDER BY l.link",
)
def q_stream_order(spark, sf):
    from .operators.hydro import flow_pointer_d8, stream_network

    dem = R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL)
    return stream_network(flow_pointer_d8(dem), _VT)


# -- extended focal family (§2.5: FilterOlympic/Gaussian/Laplacian/Majority/
# Diversity, ElevationPercentile, TRI, PlanCurv/ProfCurv/TotalCurv,
# DeviationFromMeanElevation) — all branches of the one halo-strip stencil
# runner (operators/raster.py focal).
_NBR2 = (
    "nbr2 AS (SELECT a.row AS row, a.col AS col, a.value AS av, b.value AS bv, "
    "(b.row = a.row AND b.col = a.col) AS is_c "
    "FROM ras a JOIN ras b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
    "AND b.col BETWEEN a.col - 1 AND a.col + 1 "
    f"WHERE a.value != {NODATA!r}e0)"
)


def _explode_focal(spark, stat, value_cast=None):
    out = R.explode_cells(R.focal(_demf(spark), stat))
    out = out.where(F.col("value") != _ND)
    if value_cast:
        out = out.withColumn("value", F.col("value").cast(value_cast))
    return out.orderBy("row", "col")


@Q.register(
    "focal_olympic",
    f"WITH {_RASF}, {_NBR2}, live AS (SELECT row, col, bv FROM nbr2 WHERE bv != {NODATA!r}e0) "
    "SELECT row, col, (SUM(bv) - MIN(bv) - MAX(bv)) / (COUNT(*) - 2) AS value "
    "FROM live GROUP BY 1, 2 HAVING COUNT(*) >= 3 ORDER BY row, col",
)
def q_focal_olympic(spark, sf):
    return _explode_focal(spark, "olympic")


# -- k-nearest-mean filter (§2.5 adaptive family; ImageProcessingTools/src/
# plugins/FilterKNearestMean.java:170-357): mean of the 5 window cells whose
# values sit nearest the center value — tie-break (|dv|, value, slot) shared
# verbatim between the tile kernel and this ROW_NUMBER oracle.
@Q.register(
    "focal_knearest",
    f"WITH {_RASF}, "
    "nbrk AS (SELECT a.row, a.col, a.value AS av, b.value AS bv, "
    "(b.row - a.row + 1) * 3 + (b.col - a.col + 1) AS slot "
    "FROM ras a JOIN ras b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
    "AND b.col BETWEEN a.col - 1 AND a.col + 1 "
    f"WHERE a.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0), "
    "rk AS (SELECT row, col, bv, ROW_NUMBER() OVER (PARTITION BY row, col "
    "ORDER BY ABS(bv - av), bv, slot) AS rn FROM nbrk) "
    "SELECT row, col, SUM(bv) / COUNT(*) AS value FROM rk WHERE rn <= 5 "
    "GROUP BY 1, 2 ORDER BY row, col",
)
def q_focal_knearest(spark, sf):
    return _explode_focal(spark, "knearest")


@Q.register(
    "focal_tri",
    f"WITH {_RASF}, {_NBR2}, nb AS (SELECT row, col, bv FROM nbr2 "
    f"WHERE bv != {NODATA!r}e0 AND NOT is_c) "
    "SELECT n.row, n.col, SUM(ABS(n.bv - a.value)) / COUNT(*) AS value "
    "FROM nb n JOIN ras a ON a.row = n.row AND a.col = n.col "
    "GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_focal_tri(spark, sf):
    return _explode_focal(spark, "tri")


@Q.register(
    "elev_percentile",
    f"WITH {_RASF}, {_NBR2} SELECT row, col, "
    f"CAST(SUM(CASE WHEN bv != {NODATA!r}e0 AND bv < av THEN 1 ELSE 0 END) AS DOUBLE) "
    f"/ COUNT(*) FILTER (bv != {NODATA!r}e0) AS value "
    "FROM nbr2 GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_elev_percentile(spark, sf):
    return _explode_focal(spark, "percentile")


@Q.register(
    "focal_majority",
    f"WITH {_RASF}, {_NBR2}, "
    f"mj AS (SELECT row, col, CAST(FLOOR(bv) AS BIGINT) AS fv, COUNT(*) AS n "
    f"FROM nbr2 WHERE bv != {NODATA!r}e0 GROUP BY 1, 2, 3), "
    "sel AS (SELECT row, col, fv, ROW_NUMBER() OVER (PARTITION BY row, col "
    "ORDER BY n DESC, fv ASC) AS rn FROM mj) "
    "SELECT row, col, fv AS value FROM sel WHERE rn = 1 ORDER BY row, col",
)
def q_focal_majority(spark, sf):
    return _explode_focal(spark, "majority", "bigint")


@Q.register(
    "focal_diversity",
    f"WITH {_RASF}, {_NBR2} SELECT row, col, "
    f"CAST(COUNT(DISTINCT CAST(FLOOR(bv) AS BIGINT)) FILTER (bv != {NODATA!r}e0) AS BIGINT) AS value "
    "FROM nbr2 GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_focal_diversity(spark, sf):
    return _explode_focal(spark, "diversity", "bigint")


_FULLW = (
    f"WHERE cv != {R.NODATA!r}e0 AND {R.NODATA!r}e0 NOT IN (nw, nn, ne, wv, ev, sw, ss, se) "
    "AND nw IS NOT NULL AND nn IS NOT NULL AND ne IS NOT NULL AND wv IS NOT NULL "
    "AND ev IS NOT NULL AND sw IS NOT NULL AND ss IS NOT NULL AND se IS NOT NULL "
)


@Q.register(
    "focal_gaussian",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    "(FLOOR(((nw + 2e0 * nn + ne + 2e0 * wv + 4e0 * cv + 2e0 * ev + sw + 2e0 * ss + se) "
    "/ 16e0) * 1e6 + 0.5e0) / 1e6) AS value FROM w9 "
    f"{_FULLW} ORDER BY row, col",
)
def q_focal_gaussian(spark, sf):
    return _explode_focal(spark, "gaussian")


@Q.register(
    "focal_laplacian",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    "(FLOOR((4e0 * cv - nn - ss - wv - ev) * 1e6 + 0.5e0) / 1e6) AS value FROM w9 "
    f"{_FULLW} ORDER BY row, col",
)
def q_focal_laplacian(spark, sf):
    return _explode_focal(spark, "laplacian")


# -- remaining fixed convolutions (§2.5; FilterPrewitt/Emboss/HighPass/
# LineDetection) — same halo-strip stencil runner, shared 3x3 kernel text.
@Q.register(
    "focal_prewitt",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    "(FLOOR(SQRT((ne + ev + se - nw - wv - sw) * (ne + ev + se - nw - wv - sw) "
    "+ (sw + ss + se - nw - nn - ne) * (sw + ss + se - nw - nn - ne)) * 1e6 + 0.5e0) / 1e6) AS value "
    f"FROM w9 {_FULLW} ORDER BY row, col",
)
def q_focal_prewitt(spark, sf):
    return _explode_focal(spark, "prewitt")


@Q.register(
    "focal_emboss",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    "(FLOOR((- nw - nn - wv + ev + ss + se) * 1e6 + 0.5e0) / 1e6) AS value "
    f"FROM w9 {_FULLW} ORDER BY row, col",
)
def q_focal_emboss(spark, sf):
    return _explode_focal(spark, "emboss")


@Q.register(
    "focal_highpass",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    "(FLOOR((8e0 * cv - (nw + nn + ne + wv + ev + sw + ss + se)) * 1e6 + 0.5e0) / 1e6) AS value "
    f"FROM w9 {_FULLW} ORDER BY row, col",
)
def q_focal_highpass(spark, sf):
    return _explode_focal(spark, "highpass")


_LD_RING = "(nw + nn + ne + wv + ev + sw + ss + se)"
_LD = (
    f"GREATEST(3e0 * (wv + cv + ev) - ({_LD_RING} + cv), "
    f"3e0 * (nn + cv + ss) - ({_LD_RING} + cv), "
    f"3e0 * (nw + cv + se) - ({_LD_RING} + cv), "
    f"3e0 * (ne + cv + sw) - ({_LD_RING} + cv))"
)


@Q.register(
    "focal_linedet",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    f"(FLOOR(({_LD}) * 1e6 + 0.5e0) / 1e6) AS value "
    f"FROM w9 {_FULLW} ORDER BY row, col",
)
def q_focal_linedet(spark, sf):
    return _explode_focal(spark, "linedet")


# Zevenbergen-Thorne coefficients over the unit-cell 3x3 window
_ZT = (
    "zt AS (SELECT row, col, "
    "((wv + ev) / 2e0 - cv) AS dq, ((nn + ss) / 2e0 - cv) AS eq, "
    "(- nw + ne + sw - se) / 4e0 AS fq, "
    "(- wv + ev) / 2e0 AS gq, (nn - ss) / 2e0 AS hq "
    f"FROM w9 {_FULLW})"
)


@Q.register(
    "curv_plan",
    f"WITH {_RASF}, {_W9}, {_ZT} SELECT row, col, "
    "(FLOOR((CASE WHEN gq * gq + hq * hq = 0e0 THEN 0e0 "
    "ELSE 2e0 * (dq * hq * hq + eq * gq * gq - fq * gq * hq) / (gq * gq + hq * hq) END) "
    "* 1e6 + 0.5e0) / 1e6) AS value FROM zt ORDER BY row, col",
)
def q_curv_plan(spark, sf):
    return _explode_focal(spark, "curv_plan")


@Q.register(
    "curv_profile",
    f"WITH {_RASF}, {_W9}, {_ZT} SELECT row, col, "
    "(FLOOR((CASE WHEN gq * gq + hq * hq = 0e0 THEN 0e0 "
    "ELSE -2e0 * (dq * gq * gq + eq * hq * hq + fq * gq * hq) / (gq * gq + hq * hq) END) "
    "* 1e6 + 0.5e0) / 1e6) AS value FROM zt ORDER BY row, col",
)
def q_curv_profile(spark, sf):
    return _explode_focal(spark, "curv_profile")


@Q.register(
    "curv_total",
    f"WITH {_RASF}, {_W9}, {_ZT} SELECT row, col, "
    "(FLOOR((-2e0 * (dq + eq)) * 1e6 + 0.5e0) / 1e6) AS value FROM zt ORDER BY row, col",
)
def q_curv_total(spark, sf):
    return _explode_focal(spark, "curv_total")


@Q.register(
    "deviation_from_mean",
    f"""WITH {_RASF}, {_NBR2}, live AS (SELECT row, col, bv FROM nbr2 WHERE bv != {NODATA!r}e0),
st AS (
  SELECT row, col, SUM(bv) / COUNT(*) AS m,
    CASE WHEN COUNT(*) < 2 THEN NULL ELSE
    SQRT((SUM(bv * bv) - SUM(bv) * SUM(bv) / COUNT(*)) / (COUNT(*) - 1)) END AS sd
  FROM live GROUP BY 1, 2
)
SELECT s.row, s.col,
  CAST(ROUND((a.value - s.m) / s.sd, 6) AS DOUBLE) AS value
FROM st s JOIN ras a ON a.row = s.row AND a.col = s.col
WHERE s.sd IS NOT NULL AND s.sd > 0e0 ORDER BY s.row, s.col""",
)
def q_deviation_from_mean(spark, sf):
    """DeviationFromMeanElevation: (z - focal_mean) / focal_std —
    composition of two stencil passes + a cell join."""
    dem = _demf(spark)
    m = R.explode_cells(R.focal(dem, "mean"), "m")
    sd = R.explode_cells(R.focal(dem, "stddev"), "sd")
    z = R.explode_cells(dem).where(F.col("value") != _ND)
    return (
        z.join(m, ["row", "col"]).join(sd, ["row", "col"])
        .where((F.col("sd") != _ND) & (F.col("sd") > 0))
        .select(
            "row", "col",
            F.round((F.col("value") - F.col("m")) / F.col("sd"), 6)
            .cast("double").alias("value"),
        )
        .orderBy("row", "col")
    )


# -- wetness index (§2.5/2.12; WetnessIndex.java): ln(a / tan(slope)) --------
# composition of flow accumulation and the slope stencil; transcendental
# output -> round(6) on both sides (libm ulp policy).
@Q.register(
    "wetness_index",
    f"""WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES},
slp AS (
  SELECT row, col,
    (FLOOR(DEGREES(ATAN(SQRT(
      POW((n2 - n0 + 2e0 * (n4 - n3) + n7 - n5) / 8e0, 2) +
      POW((n5 - n0 + 2e0 * (n6 - n1) + n7 - n2) / 8e0, 2)))) * 1e6 + 0.5e0) / 1e6) AS slope_deg
  FROM w9
  WHERE cv IS NOT NULL AND n0 IS NOT NULL AND n1 IS NOT NULL AND n2 IS NOT NULL
    AND n3 IS NOT NULL AND n4 IS NOT NULL AND n5 IS NOT NULL AND n6 IS NOT NULL
    AND n7 IS NOT NULL
)
SELECT s.row, s.col,
  CAST(ROUND(LN(CAST(a.accum AS DOUBLE) / TAN(RADIANS(s.slope_deg))), 6) AS DOUBLE) AS wetness
FROM slp s JOIN acc a ON a.row = s.row AND a.col = s.col
WHERE s.slope_deg > 0e0 ORDER BY s.row, s.col""",
)
def q_wetness_index(spark, sf):
    from .operators.hydro import flow_accum, flow_pointer_d8

    dem = _hydem(spark)
    acc = flow_accum(flow_pointer_d8(dem))
    slp = R.explode_cells(R.focal(dem, "slope"), "slope_deg").where(
        F.col("slope_deg") != _ND
    )
    return (
        slp.join(acc, ["row", "col"], "inner")
        .where(F.col("slope_deg") > 0)
        .select(
            "row", "col",
            F.round(
                F.log(F.col("accum").cast("double")
                      / F.tan(F.radians("slope_deg"))), 6
            ).cast("double").alias("wetness"),
        )
        .orderBy("row", "col")
    )


# -- raster -> vector polygons (§2.10; RasterToVectorPolygons.java:217-445) ---
# patch summary is oracle-checked (labels + perimeter from a neighbor join);
# the traced rings themselves are verified by the exact signed-area == cell
# count property test (tests/test_vectorize.py).
@Q.register(
    "raster_to_polygons",
    f"WITH RECURSIVE {_CBASE}, "
    "nbr4 AS (SELECT a.id AS id, COUNT(*) AS nsame FROM base a JOIN base b "
    "ON b.cls = a.cls AND ABS(a.row - b.row) + ABS(a.col - b.col) = 1 GROUP BY 1), "
    "segs AS (SELECT b.id, l.label, 4 - COALESCE(n.nsame, 0) AS nseg "
    "FROM base b JOIN lab l USING (id) LEFT JOIN nbr4 n ON n.id = b.id) "
    "SELECT label, COUNT(*) AS n_cells, CAST(SUM(nseg) AS BIGINT) AS n_segments "
    "FROM segs GROUP BY 1 ORDER BY 1",
)
def q_raster_to_polygons(spark, sf):
    from .operators.vectorize import patch_stats

    cells = (
        R.explode_cells(R.synth_raster(spark, _CROWS, _CCOLS))
        .where(F.col("value") != _ND)
        .select("row", "col", F.expr("CAST(FLOOR(value / 50e0) AS BIGINT)").alias("cls"))
    )
    return patch_stats(cells, _CCOLS)


# -- bilinear 2x resample (§2.13; Resample.java:185-309 bilinear branch) ------
# source sample position (u + 0.5)/2 - 0.5 -> dyadic weights {0.25, 0.75};
# products/sums of dyadic values are exact, no rounding policy needed.
_BL = (
    "up AS (SELECT a.a AS urow, b.b AS ucol FROM range(1, 118) a(a), range(1, 118) b(b)), "
    "bl AS (SELECT urow, ucol, "
    "CAST(FLOOR((urow + 0.5e0) / 2e0 - 0.5e0) AS BIGINT) AS r0, "
    "((urow + 0.5e0) / 2e0 - 0.5e0) - CAST(FLOOR((urow + 0.5e0) / 2e0 - 0.5e0) AS BIGINT) AS fr, "
    "CAST(FLOOR((ucol + 0.5e0) / 2e0 - 0.5e0) AS BIGINT) AS c0, "
    "((ucol + 0.5e0) / 2e0 - 0.5e0) - CAST(FLOOR((ucol + 0.5e0) / 2e0 - 0.5e0) AS BIGINT) AS fc "
    "FROM up)"
)


@Q.register(
    "resample_bilinear",
    f"WITH {_RAS}, {_BL} SELECT b.urow, b.ucol, "
    "(1e0 - b.fr) * (1e0 - b.fc) * v00.value + (1e0 - b.fr) * b.fc * v01.value "
    "+ b.fr * (1e0 - b.fc) * v10.value + b.fr * b.fc * v11.value AS value "
    "FROM bl b "
    "JOIN ras v00 ON v00.row = b.r0 AND v00.col = b.c0 "
    "JOIN ras v01 ON v01.row = b.r0 AND v01.col = b.c0 + 1 "
    "JOIN ras v10 ON v10.row = b.r0 + 1 AND v10.col = b.c0 "
    "JOIN ras v11 ON v11.row = b.r0 + 1 AND v11.col = b.c0 + 1 "
    f"WHERE {NODATA!r}e0 NOT IN (v00.value, v01.value, v10.value, v11.value) "
    "ORDER BY b.urow, b.ucol",
)
def q_resample_bilinear(spark, sf):
    cells = R.explode_cells(_dem(spark))
    up = (
        spark.range(1, 118).selectExpr("id AS urow")
        .crossJoin(spark.range(1, 118).selectExpr("id AS ucol"))
        .selectExpr(
            "urow", "ucol",
            "CAST(FLOOR((urow + 0.5e0) / 2e0 - 0.5e0) AS BIGINT) AS r0",
            "((urow + 0.5e0) / 2e0 - 0.5e0) - CAST(FLOOR((urow + 0.5e0) / 2e0 - 0.5e0) AS BIGINT) AS fr",
            "CAST(FLOOR((ucol + 0.5e0) / 2e0 - 0.5e0) AS BIGINT) AS c0",
            "((ucol + 0.5e0) / 2e0 - 0.5e0) - CAST(FLOOR((ucol + 0.5e0) / 2e0 - 0.5e0) AS BIGINT) AS fc",
        )
    )
    def src(name, dr, dc):
        return cells.select(
            (F.col("row") - dr).alias("r0"), (F.col("col") - dc).alias("c0"),
            F.col("value").alias(name),
        )
    j = (
        up.join(src("v00", 0, 0), ["r0", "c0"])
        .join(src("v01", 0, 1), ["r0", "c0"])
        .join(src("v10", 1, 0), ["r0", "c0"])
        .join(src("v11", 1, 1), ["r0", "c0"])
        .where((F.col("v00") != _ND) & (F.col("v01") != _ND)
               & (F.col("v10") != _ND) & (F.col("v11") != _ND))
    )
    return j.select(
        "urow", "ucol",
        ((1 - F.col("fr")) * (1 - F.col("fc")) * F.col("v00")
         + (1 - F.col("fr")) * F.col("fc") * F.col("v01")
         + F.col("fr") * (1 - F.col("fc")) * F.col("v10")
         + F.col("fr") * F.col("fc") * F.col("v11")).alias("value"),
    ).orderBy("urow", "ucol")


# -- cubic-convolution 2x resample (§2.13; Resample.java:185-309 cubic) -------
# Keys kernel a = -0.5 at the two dyadic sample fractions {0.25, 0.75}:
# all 4-tap weights are exact dyadic constants, so like the bilinear path
# the interpolation is EXACT (no rounding policy needed).
_CU_W = {
    0.25: (-0.0703125, 0.8671875, 0.2265625, -0.0234375),
    0.75: (-0.0234375, 0.2265625, 0.8671875, -0.0703125),
}
_CU_FRAC = (
    "CAST(FLOOR(({u} + 0.5e0) / 2e0 - 0.5e0) AS BIGINT)",
    "(({u} + 0.5e0) / 2e0 - 0.5e0) - CAST(FLOOR(({u} + 0.5e0) / 2e0 - 0.5e0) AS BIGINT)",
)


def _cu_w(frac_col: str, k: int) -> str:
    return (f"(CASE WHEN {frac_col} = 0.25e0 THEN {_CU_W[0.25][k]!r}e0 "
            f"ELSE {_CU_W[0.75][k]!r}e0 END)")


def _cu_value_expr(vfmt: str) -> str:
    terms = [
        f"{_cu_w('fr', i)} * {_cu_w('fc', j)} * {vfmt.format(i=i, j=j)}"
        for i in range(4) for j in range(4)
    ]
    return " + ".join(terms)


@Q.register(
    "resample_cubic",
    f"WITH {_RAS}, "
    "up AS (SELECT a.a AS urow, b.b AS ucol FROM range(4, 230) a(a), range(4, 230) b(b)), "
    f"cu AS (SELECT urow, ucol, {_CU_FRAC[0].format(u='urow')} AS r0, "
    f"{_CU_FRAC[1].format(u='urow')} AS fr, "
    f"{_CU_FRAC[0].format(u='ucol')} AS c0, {_CU_FRAC[1].format(u='ucol')} AS fc FROM up) "
    f"SELECT b.urow, b.ucol, {_cu_value_expr('v{i}{j}.value')} AS value FROM cu b "
    + " ".join(
        f"JOIN ras v{i}{j} ON v{i}{j}.row = b.r0 + {i - 1} AND v{i}{j}.col = b.c0 + {j - 1}"
        for i in range(4) for j in range(4)
    )
    + " WHERE "
    + " AND ".join(
        f"v{i}{j}.value != {NODATA!r}e0" for i in range(4) for j in range(4)
    )
    + " ORDER BY b.urow, b.ucol",
)
def q_resample_cubic(spark, sf):
    cells = R.explode_cells(_dem(spark))
    up = (
        spark.range(4, 230).selectExpr("id AS urow")
        .crossJoin(spark.range(4, 230).selectExpr("id AS ucol"))
        .selectExpr(
            "urow", "ucol",
            f"{_CU_FRAC[0].format(u='urow')} AS r0",
            f"{_CU_FRAC[1].format(u='urow')} AS fr",
            f"{_CU_FRAC[0].format(u='ucol')} AS c0",
            f"{_CU_FRAC[1].format(u='ucol')} AS fc",
        )
    )
    j = up
    conds = []
    for i in range(4):
        for jj in range(4):
            s = cells.select(
                (F.col("row") - (i - 1)).alias("r0"),
                (F.col("col") - (jj - 1)).alias("c0"),
                F.col("value").alias(f"_v{i}{jj}"),
            )
            j = j.join(s, ["r0", "c0"])
            conds.append(F.col(f"_v{i}{jj}") != _ND)
    w = conds[0]
    for c in conds[1:]:
        w = w & c
    return j.where(w).select(
        "urow", "ucol",
        F.expr(_cu_value_expr("_v{i}{j}")).alias("value"),
    ).orderBy("urow", "ucol")


# -- binary morphology (§2.5 LineThinning family base ops: erode/dilate) ------
# indicator = value > 100; erode = min over the available 3x3 window,
# dilate = max (FilterMin/FilterMax over a binary image).
@Q.register(
    "morphology",
    f"WITH {_RASF}, {_NBR2} SELECT row, col, "
    f"CAST(MIN(CASE WHEN bv > 100e0 THEN 1 ELSE 0 END) FILTER (bv != {NODATA!r}e0) AS BIGINT) AS erode, "
    f"CAST(MAX(CASE WHEN bv > 100e0 THEN 1 ELSE 0 END) FILTER (bv != {NODATA!r}e0) AS BIGINT) AS dilate "
    "FROM nbr2 GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_morphology(spark, sf):
    ind = R.map_algebra(_demf(spark), "CASE WHEN v > 100e0 THEN 1e0 ELSE 0e0 END")
    er = R.explode_cells(R.focal(ind, "min"), "erode")
    di = R.explode_cells(R.focal(ind, "max"), "dilate")
    return (
        er.join(di, ["row", "col"])
        .where(F.col("erode") != _ND)
        .select("row", "col",
                F.col("erode").cast("bigint").alias("erode"),
                F.col("dilate").cast("bigint").alias("dilate"))
        .orderBy("row", "col")
    )


# -- stddev contrast stretch (§2.13; ContrastEnhancement stddev mode) ---------
@Q.register(
    "stretch_stddev",
    f"""WITH {_RAS}, m AS (
  SELECT SUM(value) / COUNT(*) AS mu,
    SQRT((SUM(value * value) - SUM(value) * SUM(value) / COUNT(*)) / (COUNT(*) - 1)) AS sd
  FROM ras WHERE {_NDF})
SELECT row, col, CAST(ROUND(
  LEAST(GREATEST((value - (mu - 2e0 * sd)) / (4e0 * sd), 0e0), 1e0) * 255e0, 6) AS DOUBLE) AS value
FROM ras, m WHERE {_NDF} ORDER BY row, col""",
)
def q_stretch_stddev(spark, sf):
    cells = R.explode_cells(_dem(spark)).where(F.col("value") != _ND)
    m = cells.agg(
        (F.sum("value") / F.count(F.lit(1))).alias("mu"),
        F.expr(
            "SQRT((SUM(value * value) - SUM(value) * SUM(value) / COUNT(*)) / (COUNT(*) - 1))"
        ).alias("sd"),
    )
    v = F.least(
        F.greatest((F.col("value") - (F.col("mu") - 2 * F.col("sd"))) / (4 * F.col("sd")),
                   F.lit(0.0)), F.lit(1.0)
    ) * 255.0
    return (
        cells.crossJoin(F.broadcast(m))
        .select("row", "col", F.round(v, 6).cast("double").alias("value"))
        .orderBy("row", "col")
    )


# -- percentile contrast stretch (§2.13; PercentageContrastStretch.java) ------
@Q.register(
    "stretch_percentile",
    f"""WITH {_RAS}, live AS (SELECT * FROM ras WHERE {_NDF}), m AS (
  SELECT QUANTILE_CONT(value, 0.05e0) AS lo, QUANTILE_CONT(value, 0.95e0) AS hi FROM live)
SELECT row, col, CAST(ROUND(
  LEAST(GREATEST((value - lo) / (hi - lo), 0e0), 1e0) * 255e0, 6) AS DOUBLE) AS value
FROM live, m ORDER BY row, col""",
)
def q_stretch_percentile(spark, sf):
    cells = R.explode_cells(_dem(spark)).where(F.col("value") != _ND)
    m = cells.agg(
        F.expr("percentile(value, 0.05e0)").alias("lo"),
        F.expr("percentile(value, 0.95e0)").alias("hi"),
    )
    v = F.least(
        F.greatest((F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")),
                   F.lit(0.0)), F.lit(1.0)
    ) * 255.0
    return (
        cells.crossJoin(F.broadcast(m))
        .select("row", "col", F.round(v, 6).cast("double").alias("value"))
        .orderBy("row", "col")
    )


# -- Gaussian contrast stretch (§2.13; GaussianContrastStretch.java:366):
# rank-normalize through the inverse normal CDF (Acklam probit, pure
# arithmetic — stats.probit_sql) at the mid-rank ecdf position.  The ecdf
# window runs over DISTINCT values (bounded by value-range / 2^-10 grid).
def _gauss_stretch_sql() -> str:
    from .operators.stats import probit_sql

    p = "((CAST(cum AS DOUBLE) - 0.5e0 * cnt) / tot)"
    return f"""WITH {_RAS}, live AS (SELECT * FROM ras WHERE value != {NODATA!r}e0),
hb AS (SELECT value AS bin, COUNT(*) AS cnt FROM live GROUP BY 1),
ct AS (SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
  (SELECT SUM(cnt) FROM hb) AS tot FROM hb)
SELECT l.row, l.col, (FLOOR({probit_sql(p)} * 1e6 + 0.5e0) / 1e6) AS z
FROM live l JOIN ct ON ct.bin = l.value ORDER BY l.row, l.col"""


@Q.register("stretch_gaussian", _gauss_stretch_sql())
def q_stretch_gaussian(spark, sf):
    from .operators.stats import probit_sql
    from pyspark.sql import Window

    cells = R.explode_cells(_dem(spark)).where(F.col("value") != _ND)
    hb = cells.groupBy(F.col("value").alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = hb.agg(F.sum("cnt").alias("tot"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    ct = (
        hb.crossJoin(F.broadcast(total))
        .withColumn("cum", F.sum("cnt").over(w))
    )
    p = "((CAST(cum AS DOUBLE) - 0.5e0 * cnt) / tot)"
    return (
        cells.join(ct, F.col("value") == F.col("bin"), "inner")
        .select(
            "row", "col",
            F.expr(f"FLOOR({probit_sql(p)} * 1e6 + 0.5e0) / 1e6").alias("z"),
        )
        .orderBy("row", "col")
    )


# -- sigmoidal contrast stretch (§2.13; SigmoidalContrastStretch.java:251) ----
_SIG = "(1e0 / (1e0 + EXP(-({x}))))"
_SIG_EXPR = (
    f"(({_SIG.format(x='4e0 * ((value - l) / (h - l) - 0.5e0)')} "
    f"- {_SIG.format(x='-(4e0 * 0.5e0)')}) "
    f"/ ({_SIG.format(x='4e0 * 0.5e0')} - {_SIG.format(x='-(4e0 * 0.5e0)')}))"
)


@Q.register(
    "stretch_sigmoidal",
    f"""WITH {_RAS}, live AS (SELECT * FROM ras WHERE value != {NODATA!r}e0),
m AS (SELECT MIN(value) AS l, MAX(value) AS h FROM live)
SELECT row, col,
  (FLOOR({_SIG_EXPR} * 255e0 * 1e6 + 0.5e0) / 1e6) AS value
FROM live, m ORDER BY row, col""",
)
def q_stretch_sigmoidal(spark, sf):
    cells = R.explode_cells(_dem(spark)).where(F.col("value") != _ND)
    m = cells.agg(F.min("value").alias("l"), F.max("value").alias("h"))
    return (
        cells.crossJoin(F.broadcast(m))
        .select(
            "row", "col",
            F.expr(f"FLOOR({_SIG_EXPR} * 255e0 * 1e6 + 0.5e0) / 1e6").alias("value"),
        )
        .orderBy("row", "col")
    )


# -- BCET balance contrast enhancement (§2.13; Guo 1991 parabola mapping
# min->0, mean->110, max->255 from the exact integer-free dyadic moments) -----
_BCET_B = (
    "((h * h * 110e0 - s * 255e0 + l * l * 145e0) "
    "/ (2e0 * (h * 110e0 - e * 255e0 + l * 145e0)))"
)
_BCET_Y = (
    f"(255e0 / ((h - l) * (h + l - 2e0 * {_BCET_B}))) "
    f"* ((value - {_BCET_B}) * (value - {_BCET_B}) - (l - {_BCET_B}) * (l - {_BCET_B}))"
)


@Q.register(
    "stretch_bcet",
    f"""WITH {_RAS}, live AS (SELECT * FROM ras WHERE value != {NODATA!r}e0),
m AS (SELECT MIN(value) AS l, MAX(value) AS h,
      SUM(value) / COUNT(*) AS e, SUM(value * value) / COUNT(*) AS s FROM live)
SELECT row, col, (FLOOR(({_BCET_Y}) * 1e6 + 0.5e0) / 1e6) AS value
FROM live, m ORDER BY row, col""",
)
def q_stretch_bcet(spark, sf):
    """BCET: y = a(x-b)^2 + c with the parabola pinned at (min, 0),
    (mean, 110), (max, 255).  The dyadic synthetic raster keeps SUM(v) and
    SUM(v*v) exact regardless of aggregation order, so b/a/c derive
    bit-identically cross-engine; round(6) absorbs the division chain."""
    cells = R.explode_cells(_dem(spark)).where(F.col("value") != _ND)
    m = cells.agg(
        F.min("value").alias("l"), F.max("value").alias("h"),
        (F.sum("value") / F.count(F.lit(1))).alias("e"),
        (F.sum(F.col("value") * F.col("value")) / F.count(F.lit(1))).alias("s"),
    )
    return (
        cells.crossJoin(F.broadcast(m))
        .select(
            "row", "col",
            F.expr(f"FLOOR(({_BCET_Y}) * 1e6 + 0.5e0) / 1e6").alias("value"),
        )
        .orderBy("row", "col")
    )


# -- fill missing-data holes (§2.5; FillMissingDataHoles.java): nodata cells
# take the mean of their valid 3x3 neighbors (single pass; dyadic-exact) ----
@Q.register(
    "fill_holes",
    f"""WITH {_RASF},
holes AS (SELECT row, col FROM ras WHERE value = {NODATA!r}e0),
nb AS (
  SELECT h.row, h.col, b.value AS bv
  FROM holes h JOIN ras b ON b.row BETWEEN h.row - 1 AND h.row + 1
   AND b.col BETWEEN h.col - 1 AND h.col + 1
  WHERE b.value != {NODATA!r}e0
)
SELECT row, col, SUM(bv) / COUNT(*) AS value FROM nb GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_fill_holes(spark, sf):
    cells = R.explode_cells(_demf(spark))
    holes = cells.where(F.col("value") == _ND).select("row", "col")
    offs = F.array(*[
        F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
        for dr in (-1, 0, 1) for dc in (-1, 0, 1)
    ])
    probe = (
        holes.withColumn("_o", F.explode(offs))
        .select("row", "col",
                (F.col("row") + F.col("_o.dr")).alias("nr"),
                (F.col("col") + F.col("_o.dc")).alias("nc"))
    )
    valid = cells.where(F.col("value") != _ND).select(
        F.col("row").alias("nr"), F.col("col").alias("nc"), F.col("value").alias("bv")
    )
    return (
        probe.join(valid, ["nr", "nc"], "inner")
        .groupBy("row", "col")
        .agg((F.sum("bv") / F.count(F.lit(1))).alias("value"))
        .orderBy("row", "col")
    )


# -- flip image (§2.13; FlipImage.java vertical flip) -------------------------
@Q.register(
    "flip_image",
    f"WITH {_RASF} SELECT ({FROWS - 1} - row) AS row, col, value FROM ras "
    "ORDER BY 1, 2",
)
def q_flip_image(spark, sf):
    return (
        R.explode_cells(_demf(spark))
        .select((F.lit(FROWS - 1) - F.col("row")).alias("row"), "col", "value")
        .orderBy("row", "col")
    )


# -- contour crossings (§2.10; Contour.java vertex extraction) ----------------
# a contour at level L crosses a 4-neighbor cell edge iff the endpoint values
# straddle L; the interpolated crossing offset t = (L - a)/(b - a) is each
# contour-polyline vertex.  Per level: vertex count + exact offset sum
# (dyadic ratio -> deterministic; round 6 for the division).
@Q.register(
    "contour_crossings",
    f"""WITH {_RASF}, live AS (SELECT * FROM ras WHERE {_NDF}),
e AS (
  SELECT a.value AS av, b.value AS bv FROM live a JOIN live b
  ON (b.row = a.row AND b.col = a.col + 1) OR (b.row = a.row + 1 AND b.col = a.col)
),
lv AS (SELECT * FROM (VALUES (50e0), (100e0), (150e0)) t(lev))
SELECT CAST(lev AS DOUBLE) AS level, COUNT(*) AS n_vertices,
  CAST(ROUND(SUM((lev - av) / (bv - av)), 6) AS DOUBLE) AS t_sum
FROM e JOIN lv ON (av < lev) != (bv < lev)
GROUP BY 1 ORDER BY 1""",
)
def q_contour_crossings(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    right = live.select(
        F.col("row"), (F.col("col") - 1).alias("col"), F.col("value").alias("bv")
    )
    down = live.select(
        (F.col("row") - 1).alias("row"), F.col("col"), F.col("value").alias("bv")
    )
    e = (
        live.join(right, ["row", "col"], "inner")
        .unionByName(live.join(down, ["row", "col"], "inner"))
        .select(F.col("value").alias("av"), "bv")
    )
    lv = spark.createDataFrame([(50.0,), (100.0,), (150.0,)], "lev double")
    return (
        e.crossJoin(F.broadcast(lv))
        .where((F.col("av") < F.col("lev")) != (F.col("bv") < F.col("lev")))
        .groupBy(F.col("lev").cast("double").alias("level"))
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.round(F.sum((F.col("lev") - F.col("av")) / (F.col("bv") - F.col("av"))), 6)
            .cast("double").alias("t_sum"),
        )
        .orderBy("level")
    )


# -- contour polyline assembly (§2.10; Contour.java isoline stitching) --------
# marching-squares segments per 2x2 block (shared case->segment VALUES map),
# stitched into polylines on the doubled grid; per level: segment count,
# line count, closed-loop count, summed Euclidean length.
def _contour_lines_sql() -> str:
    from .operators.vectorize import ms_segmap_values

    idm = 1_000_000
    return f"""WITH RECURSIVE {_RASF}, live AS (SELECT * FROM ras WHERE {_NDF}),
clv AS (SELECT * FROM (VALUES (50e0), (100e0), (150e0)) t(lev)),
blk AS (SELECT a.row, a.col, lev,
  (CASE WHEN a.value < lev THEN 1 ELSE 0 END)
  + 2 * (CASE WHEN b01.value < lev THEN 1 ELSE 0 END)
  + 4 * (CASE WHEN b10.value < lev THEN 1 ELSE 0 END)
  + 8 * (CASE WHEN b11.value < lev THEN 1 ELSE 0 END) AS b
  FROM live a
  JOIN live b01 ON b01.row = a.row AND b01.col = a.col + 1
  JOIN live b10 ON b10.row = a.row + 1 AND b10.col = a.col
  JOIN live b11 ON b11.row = a.row + 1 AND b11.col = a.col + 1
  CROSS JOIN clv),
sm AS (SELECT * FROM {ms_segmap_values()} t(b, dy1, dx1, dy2, dx2)),
segs AS MATERIALIZED (SELECT lev, 2 * row + dy1 AS y1, 2 * col + dx1 AS x1,
  2 * row + dy2 AS y2, 2 * col + dx2 AS x2 FROM blk JOIN sm USING (b)),
hp AS (SELECT lev, 2 * a.row AS py, 2 * a.col + 1 AS px,
  a.col + (lev - a.value) / (b.value - a.value) AS cx, CAST(a.row AS DOUBLE) AS cy
  FROM live a JOIN live b ON b.row = a.row AND b.col = a.col + 1 CROSS JOIN clv
  WHERE (a.value < lev) != (b.value < lev)),
vp AS (SELECT lev, 2 * a.row + 1 AS py, 2 * a.col AS px,
  CAST(a.col AS DOUBLE) AS cx, a.row + (lev - a.value) / (b.value - a.value) AS cy
  FROM live a JOIN live b ON b.row = a.row + 1 AND b.col = a.col CROSS JOIN clv
  WHERE (a.value < lev) != (b.value < lev)),
cpts AS MATERIALIZED (SELECT * FROM hp UNION ALL SELECT * FROM vp),
endp AS MATERIALIZED (SELECT lev, y1 * {idm} + x1 AS id FROM segs
  UNION ALL SELECT lev, y2 * {idm} + x2 FROM segs),
vert AS MATERIALIZED (SELECT DISTINCT lev, id FROM endp),
adjs AS MATERIALIZED (SELECT lev, y1 * {idm} + x1 AS id, y2 * {idm} + x2 AS nid FROM segs
  UNION ALL SELECT lev, y2 * {idm} + x2, y1 * {idm} + x1 FROM segs),
reach(lev, id, rid) AS (SELECT lev, id, id FROM vert UNION
  SELECT r.lev, r.id, a.nid FROM reach r JOIN adjs a ON a.lev = r.lev AND a.id = r.rid),
lab AS (SELECT lev, id, MIN(rid) AS label FROM reach GROUP BY 1, 2),
deg AS (SELECT lev, id, COUNT(*) AS d FROM endp GROUP BY 1, 2),
comp AS (SELECT l.lev, l.label, SUM(CASE WHEN d.d = 1 THEN 1 ELSE 0 END) AS n_deg1
  FROM lab l JOIN deg d ON d.lev = l.lev AND d.id = l.id GROUP BY 1, 2),
slen AS (SELECT s.lev,
  SQRT((p1.cx - p2.cx) * (p1.cx - p2.cx) + (p1.cy - p2.cy) * (p1.cy - p2.cy)) AS sl
  FROM segs s
  JOIN cpts p1 ON p1.lev = s.lev AND p1.py = s.y1 AND p1.px = s.x1
  JOIN cpts p2 ON p2.lev = s.lev AND p2.py = s.y2 AND p2.px = s.x2),
agg1 AS (SELECT lev, COUNT(*) AS n_segments,
  CAST(ROUND(COALESCE(SUM(sl), 0e0), 4) AS DOUBLE) AS total_length FROM slen GROUP BY 1),
agg2 AS (SELECT lev, COUNT(*) AS n_lines,
  CAST(SUM(CASE WHEN n_deg1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed
  FROM comp GROUP BY 1)
SELECT CAST(a.lev AS DOUBLE) AS level, n_segments, n_lines, n_closed, total_length
FROM agg1 a JOIN agg2 USING (lev) ORDER BY 1"""


@Q.register("contour_lines", _contour_lines_sql())
def q_contour_lines(spark, sf):
    from .operators.vectorize import contour_line_stats

    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    return contour_line_stats(live, (50.0, 100.0, 150.0))


# -- feathered mosaic (§2.7; MosaicWithFeathering.java, 1027): linear
# distance-to-seam weights blend the overlap zone ----------------------------
@Q.register(
    "mosaic_feather",
    f"""WITH {_RAS}, {_RAS2},
ja AS (SELECT row, col, value FROM ras WHERE col < 240 AND value != {NODATA!r}e0),
jb AS (SELECT row, col, value FROM ras2 WHERE col >= 120 AND value != {NODATA!r}e0),
m AS (
  SELECT COALESCE(a.row, b.row) AS row, COALESCE(a.col, b.col) AS col,
    CASE WHEN a.value IS NULL THEN b.value
         WHEN b.value IS NULL THEN a.value
         ELSE ((240e0 - COALESCE(a.col, b.col)) / 120e0) * a.value
            + (1e0 - (240e0 - COALESCE(a.col, b.col)) / 120e0) * b.value END AS v
  FROM ja a FULL OUTER JOIN jb b ON a.row = b.row AND a.col = b.col
)
SELECT COUNT(*) AS n, CAST(ROUND(SUM(v), 4) AS DOUBLE) AS total FROM m""",
)
def q_mosaic_feather(spark, sf):
    a = (
        R.explode_cells(_dem(spark, 0)).where((F.col("col") < 240) & (F.col("value") != _ND))
        .withColumnRenamed("value", "av")
    )
    b = (
        R.explode_cells(_dem(spark, 1)).where((F.col("col") >= 120) & (F.col("value") != _ND))
        .withColumnRenamed("value", "bv")
    )
    m = a.join(b, ["row", "col"], "full_outer")
    wa = (240.0 - F.col("col")) / 120.0
    v = (
        F.when(F.col("av").isNull(), F.col("bv"))
        .when(F.col("bv").isNull(), F.col("av"))
        .otherwise(wa * F.col("av") + (1 - wa) * F.col("bv"))
    )
    return m.select(v.alias("v")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 4).cast("double").alias("total"),
    )


# -- cost-distance accumulation (§2.11; CostAccumulation.java, 635) -----------
# least accumulated cost from source cells, step = avg(cell costs) * dist.
# Oracle: Jacobi relaxation to the same shortest-path fixpoint (path sums
# accumulate in path order in both engines).
_CDK = 120


@Q.register(
    "cost_distance",
    f"""WITH RECURSIVE
rasd AS (SELECT r.r AS row, c.c AS col, {_DVAL} AS value
         FROM range(0, {_DROWS}) r(r), range(0, {_DCOLS}) c(c)),
live AS (SELECT row, col, value / 16e0 AS cost, value > 95e0 AS src
         FROM rasd WHERE value != {NODATA!r}e0),
offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)) t(dr, dc)),
ce AS (
  SELECT a.row, a.col, b.row AS nr, b.col AS nc,
    (a.cost + b.cost) / 2e0 * CASE WHEN a.row != b.row AND a.col != b.col
      THEN 1.4142135623730951e0 ELSE 1e0 END AS step
  FROM live a JOIN offs o ON TRUE
  JOIN live b ON b.row = a.row + o.dr AND b.col = a.col + o.dc
  UNION ALL SELECT row, col, row, col, 0e0 FROM live
),
it(it, row, col, f) AS (
  SELECT 0, row, col, CASE WHEN src THEN 0e0 ELSE 1e18 END FROM live
  UNION ALL
  SELECT u.it + 1, e.nr, e.nc, MIN(u.f + e.step)
  FROM it u JOIN ce e ON e.row = u.row AND e.col = u.col
  WHERE u.it < {_CDK} GROUP BY 1, 2, 3
)
SELECT row, col, CAST(ROUND(f, 6) AS DOUBLE) AS cdist
FROM it WHERE it = {_CDK} AND f < 1e17 ORDER BY row, col""",
)
def q_cost_distance(spark, sf):
    from .operators.cost import cost_distance

    cells = (
        R.explode_cells(R.synth_raster(spark, _DROWS, _DCOLS))
        .where(F.col("value") != _ND)
        .select(
            "row", "col",
            (F.col("value") / 16.0).alias("cost"),
            (F.col("value") > 95.0).alias("is_src"),
        )
    )
    out = cost_distance(cells, tile=16)
    return (
        out.where(F.col("cdist") < 1e17)
        .select("row", "col", F.round("cdist", 6).cast("double").alias("cdist"))
        .orderBy("row", "col")
    )


@Q.register(
    "cost_allocation",
    f"""WITH RECURSIVE
rasd AS (SELECT r.r AS row, c.c AS col, {_DVAL} AS value
         FROM range(0, {_DROWS}) r(r), range(0, {_DCOLS}) c(c)),
live AS (SELECT row, col, value / 16e0 AS cost, value > 95e0 AS src
         FROM rasd WHERE value != {NODATA!r}e0),
offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)) t(dr, dc)),
ce AS (
  SELECT a.row, a.col, b.row AS nr, b.col AS nc,
    (a.cost + b.cost) / 2e0 * CASE WHEN a.row != b.row AND a.col != b.col
      THEN 1.4142135623730951e0 ELSE 1e0 END AS step
  FROM live a JOIN offs o ON TRUE
  JOIN live b ON b.row = a.row + o.dr AND b.col = a.col + o.dc
  UNION ALL SELECT row, col, row, col, 0e0 FROM live
),
ita(it, row, col, f, s) AS (
  SELECT 0, row, col, CASE WHEN src THEN 0e0 ELSE 1e18 END,
         CASE WHEN src THEN row * 1000000 + col ELSE 4611686018427387904 END
  FROM live
  UNION ALL
  SELECT u.it + 1, e.nr, e.nc,
    (MIN({{'f': u.f + e.step, 's': u.s}})).f,
    (MIN({{'f': u.f + e.step, 's': u.s}})).s
  FROM ita u JOIN ce e ON e.row = u.row AND e.col = u.col
  WHERE u.it < {_CDK} GROUP BY 1, 2, 3
)
SELECT row, col, CAST(s AS BIGINT) AS alloc
FROM ita WHERE it = {_CDK} AND f < 1e17 ORDER BY row, col""",
)
def q_cost_allocation(spark, sf):
    from .operators.cost import cost_allocation

    cells = (
        R.explode_cells(R.synth_raster(spark, _DROWS, _DCOLS))
        .where(F.col("value") != _ND)
        .select(
            "row", "col",
            (F.col("value") / 16.0).alias("cost"),
            (F.col("value") > 95.0).alias("is_src"),
        )
    )
    out = cost_allocation(cells, tile=16)
    return (
        out.where(F.col("cdist") < 1e17)
        .select("row", "col", "alloc")
        .orderBy("row", "col")
    )


# -- least-cost pathway back-trace (§2.11; CostPathway.java:277) --------------
_CP_DESTS = [(0, 0), (39, 59)]
_CP_CE = f"""rasd AS (SELECT r.r AS row, c.c AS col, {_DVAL} AS value
         FROM range(0, {_DROWS}) r(r), range(0, {_DCOLS}) c(c)),
live AS (SELECT row, col, value / 16e0 AS cost, value > 158e0 AS src
         FROM rasd WHERE value != {NODATA!r}e0),
offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)) t(dr, dc)),
ce AS (
  SELECT a.row, a.col, b.row AS nr, b.col AS nc,
    (a.cost + b.cost) / 2e0 * CASE WHEN a.row != b.row AND a.col != b.col
      THEN 1.4142135623730951e0 ELSE 1e0 END AS step
  FROM live a JOIN offs o ON TRUE
  JOIN live b ON b.row = a.row + o.dr AND b.col = a.col + o.dc
  UNION ALL SELECT row, col, row, col, 0e0 FROM live
),
it(it, row, col, f) AS (
  SELECT 0, row, col, CASE WHEN src THEN 0e0 ELSE 1e18 END FROM live
  UNION ALL
  SELECT u.it + 1, e.nr, e.nc, MIN(u.f + e.step)
  FROM it u JOIN ce e ON e.row = u.row AND e.col = u.col
  WHERE u.it < {_CDK} GROUP BY 1, 2, 3
)"""


@Q.register(
    "cost_pathway",
    f"""WITH RECURSIVE {_CP_CE},
fin AS MATERIALIZED (SELECT row, col, f FROM it WHERE it = {_CDK}),
prd AS MATERIALIZED (
  SELECT c.row, c.col, c.f,
    (MIN({{'d': n.f + e.step, 'r': n.row, 'c': n.col}})).r AS pr,
    (MIN({{'d': n.f + e.step, 'r': n.row, 'c': n.col}})).c AS pc
  FROM fin c JOIN ce e ON e.nr = c.row AND e.nc = c.col
    AND NOT (e.row = c.row AND e.col = c.col)
  JOIN fin n ON n.row = e.row AND n.col = e.col
  GROUP BY 1, 2, 3),
wlk(it, row, col) AS (
  SELECT 0, d.r, d.c FROM (VALUES {', '.join(f'({r},{c})' for r, c in _CP_DESTS)}) d(r, c)
  UNION ALL
  SELECT w.it + 1, p.pr, p.pc FROM wlk w JOIN prd p ON p.row = w.row AND p.col = w.col
  WHERE w.it < 400 AND p.f > 0e0
)
SELECT DISTINCT row, col FROM wlk ORDER BY 1, 2""",
)
def q_cost_pathway(spark, sf):
    from .operators.cost import cost_pathway

    cells = (
        R.explode_cells(R.synth_raster(spark, _DROWS, _DCOLS))
        .where(F.col("value") != _ND)
        .select(
            "row", "col",
            (F.col("value") / 16.0).alias("cost"),
            (F.col("value") > 158.0).alias("is_src"),
        )
    )
    dests = spark.createDataFrame(_CP_DESTS, "row long, col long")
    return cost_pathway(cells, dests, tile=16)


# -- horizon angle, east azimuth (§2.11; HorizonAngle.java / Viewshed family) -
@Q.register(
    "horizon_angle",
    f"WITH {_RASF}, live AS (SELECT * FROM ras WHERE {_NDF}) "
    "SELECT a.row, a.col, "
    "(FLOOR(DEGREES(ATAN(MAX((b.value - a.value) / (b.col - a.col)))) * 1e6 + 0.5e0) / 1e6) AS horizon_deg "
    "FROM live a JOIN live b ON b.row = a.row AND b.col > a.col "
    "GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_horizon_angle(spark, sf):
    """Per-row scan kernel: max elevation-angle toward the east horizon —
    one applyInPandas per raster row (the distributed form of the
    reference's per-profile scan).

    O(n) right-to-left upper-hull stack (VERDICT r3 next-round #3; was an
    O(n^2) per-i suffix slice): the max slope from the leftmost point of a
    point set is exactly the slope of its upper-hull edge, so each cell's
    answer is the slope to the adjacent hull vertex at insertion time.
    Pops use the exact cross-product test (dyadic z, integer cols ->
    products exact in double), and the emitted value is the same
    correctly-rounded division the brute max would pick, so the SQL
    oracle's MAX over all pairs matches bit-for-bit.  ~48 ms per 1e5-col
    row vs ~minutes for the suffix-slice form."""
    import numpy as np
    import pandas as pd

    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("col")
        xs = pdf["col"].to_numpy(dtype="float64").tolist()
        zs = pdf["value"].to_numpy().tolist()
        n = len(zs)
        if n < 2:
            return pd.DataFrame(columns=["row", "col", "horizon_deg"]).astype(
                {"row": "int64", "col": "int64", "horizon_deg": "float64"})
        hx = [0.0] * n
        hz = [0.0] * n
        mx = [0.0] * (n - 1)
        hx[0] = xs[n - 1]
        hz[0] = zs[n - 1]
        m = 1
        for i in range(n - 2, -1, -1):
            x0 = xs[i]
            z0 = zs[i]
            while m >= 2:
                x1 = hx[m - 1]
                z1 = hz[m - 1]
                if (z1 - z0) * (hx[m - 2] - x0) <= (hz[m - 2] - z0) * (x1 - x0):
                    m -= 1
                else:
                    break
            mx[i] = (hz[m - 1] - z0) / (hx[m - 1] - x0)
            hx[m] = x0
            hz[m] = z0
            m += 1
        deg = np.degrees(np.arctan(np.array(mx)))
        return pd.DataFrame({
            "row": np.full(n - 1, int(key[0]), dtype="int64"),
            "col": np.asarray(xs[: n - 1], dtype="int64"),
            "horizon_deg": np.floor(deg * 1e6 + 0.5) / 1e6,
        })

    return (
        live.groupBy("row")
        .applyInPandas(kernel, "row long, col long, horizon_deg double")
        .orderBy("row", "col")
    )


# -- subbasins / hillslopes (§2.12; Subbasins.java:389, Hillslopes.java:525) --
# GREATEST guards log2 against pit rows (code = 0); pit targets are never
# consumed (every use filters code > 0)
_DRC = ("CASE CAST(log2(GREATEST(code, 1)) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 "
        "WHEN 2 THEN -1 WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 "
        "WHEN 6 THEN 1 ELSE 1 END")
_DCC = ("CASE CAST(log2(GREATEST(code, 1)) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 "
        "WHEN 2 THEN 1 WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 "
        "WHEN 6 THEN 0 ELSE 1 END")
_SB_K = 200


def _sb_chase_sql(known_cte: str, k: int = _SB_K) -> str:
    """Terminal chase: t(c) = own id at `known_cte` cells, -1 at pits,
    inherited from the D8 target otherwise — iteration-counter recursion
    (each cell is reached exactly once, at its path distance)."""
    return f"""tgtv AS MATERIALIZED (SELECT row, col, code,
  row + {_DRC} AS nr, col + {_DCC} AS nc FROM d8),
sbit(it, row, col, t) AS (
  SELECT 0, g.row, g.col,
    CASE WHEN s.row IS NOT NULL THEN g.row * 1000000 + g.col ELSE -1 END
  FROM tgtv g LEFT JOIN {known_cte} s ON s.row = g.row AND s.col = g.col
  WHERE s.row IS NOT NULL OR g.code = 0
  UNION ALL
  SELECT u.it + 1, e.row, e.col, u.t
  FROM sbit u JOIN tgtv e ON e.nr = u.row AND e.nc = u.col
  LEFT JOIN {known_cte} s2 ON s2.row = e.row AND s2.col = e.col
  WHERE u.it < {k} AND s2.row IS NULL AND e.code > 0
),
term AS (SELECT row, col, MAX(t) AS t FROM sbit GROUP BY 1, 2)"""


@Q.register(
    "subbasins",
    f"WITH RECURSIVE {_VHYD_BASE}, {_stream_net_sql(_VT)}, "
    + _sb_chase_sql("stream")
    + " SELECT t2.row, t2.col, COALESCE(sl.link, -1) AS sub "
    "FROM term t2 LEFT JOIN slab sl ON sl.id = t2.t ORDER BY 1, 2",
)
def q_subbasins(spark, sf):
    from .operators.hydro import flow_pointer_d8, subbasins

    dem = R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL)
    return subbasins(flow_pointer_d8(dem), _VT).orderBy("row", "col")


@Q.register(
    "hillslopes",
    f"""WITH RECURSIVE {_VHYD_BASE}, {_stream_net_sql(_VT)},
tgt0 AS MATERIALIZED (SELECT row, col, code,
  row + {_DRC} AS nr, col + {_DCC} AS nc FROM d8),
entry AS MATERIALIZED (
  SELECT e.row, e.col, e.nr, e.nc FROM tgt0 e
  LEFT JOIN stream s ON s.row = e.row AND s.col = e.col
  JOIN stream t ON t.row = e.nr AND t.col = e.nc
  WHERE s.row IS NULL AND e.code > 0),
sdirs AS (SELECT g.row, g.col,
  CASE WHEN g.code > 0 THEN g.nr - g.row END AS sdr,
  CASE WHEN g.code > 0 THEN g.nc - g.col END AS sdc
  FROM tgt0 g JOIN stream s ON s.row = g.row AND s.col = g.col),
ehs AS MATERIALIZED (SELECT e.row * 1000000 + e.col AS id,
  sl.link * 3 + CASE WHEN COALESCE(
    d.sdr * (e.nc - e.col) - d.sdc * (e.nr - e.row), 0) > 0 THEN 1 ELSE 0 END AS hs
  FROM entry e
  LEFT JOIN sdirs d ON d.row = e.nr AND d.col = e.nc
  JOIN slab sl ON sl.id = e.nr * 1000000 + e.nc),
{_sb_chase_sql("entry")}
SELECT * FROM (
  SELECT t2.row, t2.col, COALESCE(h.hs, -1) AS hs
  FROM term t2 LEFT JOIN ehs h ON h.id = t2.t
  LEFT JOIN stream st ON st.row = t2.row AND st.col = t2.col
  WHERE st.row IS NULL
  UNION ALL
  SELECT s.row, s.col, sl.link * 3 + 2 AS hs
  FROM stream s JOIN slab sl ON sl.id = s.row * 1000000 + s.col
) ORDER BY row, col""",
)
def q_hillslopes(spark, sf):
    from .operators.hydro import flow_pointer_d8, hillslopes

    dem = R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL)
    return hillslopes(flow_pointer_d8(dem), _VT).orderBy("row", "col")


# -- isobasin (§2.12; HydroTools/src/plugins/Isobasin.java:434,
# deterministic crossing form — see operators/hydro.isobasin): outlets are
# the accumulation-crossing cells for the target size; basins are the
# absorbing-set watershed of those outlets, trunk/pit cells -1.
_IB_T = 150


def _acc_sql(acc_iters: int = 200) -> str:
    """Lean D8 accumulation CTEs (fedge/accit/acc) over a `d8` CTE — the
    accumulation slice of _stream_net_sql without the link machinery."""
    return (
        f"fedge AS MATERIALIZED (SELECT row, col, row + {_DRC} AS nr, "
        f"col + {_DCC} AS nc, 0 AS selfe FROM d8 WHERE code > 0 "
        "UNION ALL SELECT row, col, row, col, 1 FROM d8), "
        "accit(it, row, col, a) AS (SELECT 0, row, col, CAST(1 AS BIGINT) FROM d8 "
        "UNION ALL SELECT u.it + 1, e.nr, e.nc, "
        "CAST(1 + COALESCE(SUM(CASE WHEN e.selfe = 0 THEN u.a END), 0) AS BIGINT) "
        "FROM accit u JOIN fedge e ON e.row = u.row AND e.col = u.col "
        f"WHERE u.it < {acc_iters} GROUP BY 1, 2, 3), "
        f"acc AS MATERIALIZED (SELECT row, col, a AS accum FROM accit WHERE it = {acc_iters})"
    )


@Q.register(
    "isobasin",
    f"WITH RECURSIVE {_VHYD_BASE}, {_acc_sql()}, "
    "upn AS (SELECT e.nr AS row, e.nc AS col, MAX(a.accum) AS upmax "
    "FROM fedge e JOIN acc a ON a.row = e.row AND a.col = e.col "
    "WHERE e.selfe = 0 GROUP BY 1, 2), "
    "obasin AS MATERIALIZED (SELECT a.row, a.col FROM acc a "
    "LEFT JOIN upn u ON u.row = a.row AND u.col = a.col "
    f"WHERE a.accum >= {_IB_T} AND COALESCE(u.upmax, 0) < {_IB_T}), "
    + _sb_chase_sql("obasin")
    + " SELECT t2.row, t2.col, t2.t AS basin FROM term t2 ORDER BY 1, 2",
)
def q_isobasin(spark, sf):
    from .operators.hydro import flow_pointer_d8, isobasin

    dem = R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL)
    return isobasin(flow_pointer_d8(dem), _IB_T).orderBy("row", "col")


# -- Strahler-order basins (§2.12; HydroTools/src/plugins/
# StrahlerOrderBasins.java:393): every cell labeled with the Strahler order
# of the stream link whose subbasin drains it (-1 off-network / pit cells).
# Pure composition: the subbasin chase joined to the per-link order table —
# one extra broadcast join over the link table on top of `subbasins`.
@Q.register(
    "strahler_basins",
    f"WITH RECURSIVE {_VHYD_BASE}, {_stream_net_sql(_VT)}, "
    + _sb_chase_sql("stream")
    + f" SELECT t2.row, t2.col, COALESCE(o.ord, -1) AS strahler "
    f"FROM term t2 LEFT JOIN slab sl ON sl.id = t2.t "
    f"LEFT JOIN om{_OM_K} o ON o.link = sl.link ORDER BY 1, 2",
)
def q_strahler_basins(spark, sf):
    from .operators.hydro import flow_pointer_d8, stream_network, subbasins

    dem = R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL)
    ptr = flow_pointer_d8(dem)
    sub = subbasins(ptr, _VT)
    order = stream_network(ptr, _VT).select(
        F.col("link").alias("sub"), F.col("strahler").alias("_ord")
    )
    return (
        sub.join(F.broadcast(order), ["sub"], "left")
        .select("row", "col", F.coalesce("_ord", F.lit(-1)).alias("strahler"))
        .orderBy("row", "col")
    )


# -- stream link slope (§2.12; StreamLinkSlope.java:396): per junction-cut
# link, elevation range along the link / link length -------------------------
@Q.register(
    "stream_link_slope",
    f"WITH RECURSIVE {_VHYD_BASE}, {_stream_net_sql(_VT)}, "
    "sl_len AS (SELECT u.link, SUM(CASE WHEN k.row != k.nr AND k.col != k.nc "
    f"THEN {_SQ2} ELSE 1e0 END) AS len "
    "FROM kept k JOIN slab u ON u.id = k.row * 1000000 + k.col GROUP BY 1), "
    "sl_elev AS (SELECT u.link, MAX(c.v) AS vmax, MIN(c.v) AS vmin "
    "FROM slab u JOIN cells c ON u.id = c.row * 1000000 + c.col GROUP BY 1) "
    "SELECT e.link, CAST(CASE WHEN l.len IS NULL OR l.len = 0e0 THEN 0e0 "
    "ELSE FLOOR(((e.vmax - e.vmin) / l.len) * 1e6 + 0.5e0) / 1e6 END AS DOUBLE) AS link_slope "
    "FROM sl_elev e LEFT JOIN sl_len l USING (link) ORDER BY e.link",
)
def q_stream_link_slope(spark, sf):
    from .operators.hydro import flow_pointer_d8, stream_link_slope

    dem = R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL)
    cells = R.explode_cells(dem).withColumnRenamed("value", "v")
    return stream_link_slope(flow_pointer_d8(dem), cells, _VT)


# -- full viewshed (§2.11; TerrainAnalysisTools/src/plugins/Viewshed.java) ----
# Exact R3 line-of-sight on the valley DEM from a fixed viewpoint: a target
# is visible iff no intermediate ray sample (bilinear terrain at k/K of the
# way, K = chebyshev distance) subtends a larger elevation angle — compared
# cross-multiplied so both engines evaluate the identical IEEE expression.
# All Catalyst (explode + four corner equi-joins); the brute per-target plan
# IS the oracle algorithm at test scale; the documented 100x scale path is
# the reference's wavefront sweep with per-ray running maxima.
_VS_R, _VS_C, _VS_H = 40, 30, 2.0
_VS_PR = f"{_VS_R}e0 + CAST(k * (row - {_VS_R}) AS DOUBLE) / kk"
_VS_PC = f"{_VS_C}e0 + CAST(k * (col - {_VS_C}) AS DOUBLE) / kk"
_VS_ZS = (
    "(1e0 - fr) * (1e0 - fc) * z00v + (1e0 - fr) * fc * z01v "
    "+ fr * (1e0 - fc) * z10v + fr * fc * z11v"
)
_VS_BLK = "(zs - zv) * kk > (zt - zv) * k"


@Q.register(
    "viewshed",
    f"""WITH vras AS (SELECT r.r AS row, c.c AS col, {VALLEY_VAL.format(row='r.r', col='c.c')} AS value
  FROM range(0, {_VROWS}) r(r), range(0, {_VCOLS}) c(c)),
vz AS (SELECT value + {_VS_H!r}e0 AS zv FROM vras WHERE row = {_VS_R} AND col = {_VS_C}),
tgt AS (SELECT row, col, value AS zt,
        GREATEST(ABS(row - {_VS_R}), ABS(col - {_VS_C})) AS kk
  FROM vras WHERE NOT (row = {_VS_R} AND col = {_VS_C})),
smp AS (SELECT row, col, zt, kk, s.k, {_VS_PR} AS pr, {_VS_PC} AS pc
  FROM tgt JOIN range(1, {max(_VROWS, _VCOLS)}) s(k) ON s.k < kk),
bil AS (SELECT row, col, zt, kk, k,
        CAST(FLOOR(pr) AS BIGINT) AS r0, pr - CAST(FLOOR(pr) AS BIGINT) AS fr,
        CAST(FLOOR(pc) AS BIGINT) AS c0, pc - CAST(FLOOR(pc) AS BIGINT) AS fc
  FROM smp),
zsam AS (SELECT b.row, b.col, b.zt, b.kk, b.k,
        COALESCE(z00.value, 0e0) AS z00v, COALESCE(z01.value, 0e0) AS z01v,
        COALESCE(z10.value, 0e0) AS z10v, COALESCE(z11.value, 0e0) AS z11v,
        b.fr, b.fc
  FROM bil b
  LEFT JOIN vras z00 ON z00.row = b.r0 AND z00.col = b.c0
  LEFT JOIN vras z01 ON z01.row = b.r0 AND z01.col = b.c0 + 1
  LEFT JOIN vras z10 ON z10.row = b.r0 + 1 AND z10.col = b.c0
  LEFT JOIN vras z11 ON z11.row = b.r0 + 1 AND z11.col = b.c0 + 1),
zval AS (SELECT row, col, zt, kk, k, {_VS_ZS} AS zs, (SELECT zv FROM vz) AS zv FROM zsam),
blk AS (SELECT row, col, BOOL_OR({_VS_BLK}) AS b FROM zval GROUP BY 1, 2)
SELECT t.row, t.col, COALESCE(b.b, FALSE) = FALSE AS visible
FROM tgt t LEFT JOIN blk b USING (row, col) ORDER BY 1, 2""",
)
def q_viewshed(spark, sf):
    dem = R.explode_cells(R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL))
    at_vp = (F.col("row") == _VS_R) & (F.col("col") == _VS_C)
    vz = dem.where(at_vp).select((F.col("value") + F.lit(_VS_H)).alias("zv"))
    tgt = dem.where(~at_vp).select(
        "row", "col", F.col("value").alias("zt"),
        F.greatest(
            F.abs(F.col("row") - _VS_R), F.abs(F.col("col") - _VS_C)
        ).alias("kk"),
    )
    smp = (
        tgt.withColumn(
            "k",
            F.explode(
                F.when(F.col("kk") > 1, F.sequence(F.lit(1), F.col("kk") - 1))
                .otherwise(F.array())
            ),
        )
        .withColumn("pr", F.expr(_VS_PR))
        .withColumn("pc", F.expr(_VS_PC))
        .select(
            "row", "col", "zt", "kk", "k",
            F.expr("CAST(FLOOR(pr) AS BIGINT)").alias("r0"),
            F.expr("pr - CAST(FLOOR(pr) AS BIGINT)").alias("fr"),
            F.expr("CAST(FLOOR(pc) AS BIGINT)").alias("c0"),
            F.expr("pc - CAST(FLOOR(pc) AS BIGINT)").alias("fc"),
        )
    )

    def corner(name, dr, dc):
        z = dem.select(
            (F.col("row") - dr).alias("_jr"), (F.col("col") - dc).alias("_jc"),
            F.col("value").alias(f"{name}_raw"),
        )
        return z

    j = smp
    for name, dr, dc in (("z00", 0, 0), ("z01", 0, 1), ("z10", 1, 0), ("z11", 1, 1)):
        j = j.join(
            corner(name, dr, dc),
            (F.col("r0") == F.col("_jr")) & (F.col("c0") == F.col("_jc")),
            "left",
        ).withColumn(f"{name}v", F.coalesce(f"{name}_raw", F.lit(0.0))) \
         .drop("_jr", "_jc", f"{name}_raw")
    zval = (
        j.withColumn("zs", F.expr(_VS_ZS))
        .crossJoin(F.broadcast(vz))
    )
    blk = zval.groupBy("row", "col").agg(
        F.expr(f"BOOL_OR({_VS_BLK})").alias("b")
    )
    return (
        tgt.join(blk, ["row", "col"], "left")
        .select("row", "col", F.expr("COALESCE(b, FALSE) = FALSE").alias("visible"))
        .orderBy("row", "col")
    )


# -- visibility index (§2.11; TerrainAnalysisTools/src/plugins/
# VisibilityIndex.java:1029 — per-cell fraction of a viewpoint grid that sees
# the cell; the reference runs one viewshed per resampled-grid station on a
# thread pool, here the station axis is just one more join key so all nine
# viewsheds evaluate in a single distributed pass).  Same exact R3
# cross-multiplied LOS kernel as `viewshed`; the index is an integer count
# divided once (bit-exact both engines).  100x path: per-station wavefront
# sweeps with running max gradient, stations partitioned across executors.
_VI_VPS = [(v, 10 + 30 * (v // 3), 10 + 20 * (v % 3)) for v in range(9)]
_VI_PR = "CAST(vr AS DOUBLE) + CAST(k * (row - vr) AS DOUBLE) / kk"
_VI_PC = "CAST(vc AS DOUBLE) + CAST(k * (col - vc) AS DOUBLE) / kk"


@Q.register(
    "visibility_index",
    f"""WITH vras AS (SELECT r.r AS row, c.c AS col, {VALLEY_VAL.format(row='r.r', col='c.c')} AS value
  FROM range(0, {_VROWS}) r(r), range(0, {_VCOLS}) c(c)),
vp AS (SELECT * FROM (VALUES {', '.join(f'({v}, {vr}, {vc})' for v, vr, vc in _VI_VPS)}) t(vid, vr, vc)),
vpz AS (SELECT vid, vr, vc, value + {_VS_H!r}e0 AS zv FROM vp JOIN vras ON row = vr AND col = vc),
tgt AS (SELECT t.row, t.col, t.value AS zt, p.vid, p.vr, p.vc, p.zv,
        GREATEST(ABS(t.row - p.vr), ABS(t.col - p.vc)) AS kk
  FROM vras t CROSS JOIN vpz p WHERE NOT (t.row = p.vr AND t.col = p.vc)),
smp AS (SELECT row, col, vid, zt, zv, kk, s.k, {_VI_PR} AS pr, {_VI_PC} AS pc
  FROM tgt JOIN range(1, {max(_VROWS, _VCOLS)}) s(k) ON s.k < kk),
bil AS (SELECT row, col, vid, zt, zv, kk, k,
        CAST(FLOOR(pr) AS BIGINT) AS r0, pr - CAST(FLOOR(pr) AS BIGINT) AS fr,
        CAST(FLOOR(pc) AS BIGINT) AS c0, pc - CAST(FLOOR(pc) AS BIGINT) AS fc
  FROM smp),
zsam AS (SELECT b.row, b.col, b.vid, b.zt, b.zv, b.kk, b.k,
        COALESCE(z00.value, 0e0) AS z00v, COALESCE(z01.value, 0e0) AS z01v,
        COALESCE(z10.value, 0e0) AS z10v, COALESCE(z11.value, 0e0) AS z11v,
        b.fr, b.fc
  FROM bil b
  LEFT JOIN vras z00 ON z00.row = b.r0 AND z00.col = b.c0
  LEFT JOIN vras z01 ON z01.row = b.r0 AND z01.col = b.c0 + 1
  LEFT JOIN vras z10 ON z10.row = b.r0 + 1 AND z10.col = b.c0
  LEFT JOIN vras z11 ON z11.row = b.r0 + 1 AND z11.col = b.c0 + 1),
blk AS (SELECT row, col, vid, BOOL_OR({_VS_BLK.replace('zs', f'({_VS_ZS})')}) AS b
  FROM zsam GROUP BY 1, 2, 3),
vis AS (SELECT t.row, t.col, t.vid, COALESCE(b.b, FALSE) = FALSE AS visible
  FROM tgt t LEFT JOIN blk b USING (row, col, vid))
SELECT row, col, CAST(SUM(CASE WHEN visible THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS vis_index
FROM vis GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_visibility_index(spark, sf):
    dem = R.explode_cells(R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL))
    vp = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"({v}, {vr}, {vc})" for v, vr, vc in _VI_VPS)
        + " AS t(vid, vr, vc)"
    )
    vpz = vp.join(
        dem.select(F.col("row").alias("vr"), F.col("col").alias("vc"),
                   (F.col("value") + F.lit(_VS_H)).alias("zv")),
        ["vr", "vc"],
    )
    tgt = (
        dem.crossJoin(F.broadcast(vpz))
        .where(~((F.col("row") == F.col("vr")) & (F.col("col") == F.col("vc"))))
        .select(
            "row", "col", F.col("value").alias("zt"), "vid", "vr", "vc", "zv",
            F.greatest(
                F.abs(F.col("row") - F.col("vr")),
                F.abs(F.col("col") - F.col("vc")),
            ).alias("kk"),
        )
    )
    smp = (
        tgt.withColumn(
            "k",
            F.explode(
                F.when(F.col("kk") > 1, F.sequence(F.lit(1), F.col("kk") - 1))
                .otherwise(F.array())
            ),
        )
        .withColumn("pr", F.expr(_VI_PR))
        .withColumn("pc", F.expr(_VI_PC))
        .select(
            "row", "col", "vid", "zt", "zv", "kk", "k",
            F.expr("CAST(FLOOR(pr) AS BIGINT)").alias("r0"),
            F.expr("pr - CAST(FLOOR(pr) AS BIGINT)").alias("fr"),
            F.expr("CAST(FLOOR(pc) AS BIGINT)").alias("c0"),
            F.expr("pc - CAST(FLOOR(pc) AS BIGINT)").alias("fc"),
        )
    )
    j = smp
    for name, dr, dc in (("z00", 0, 0), ("z01", 0, 1), ("z10", 1, 0), ("z11", 1, 1)):
        z = dem.select(
            (F.col("row") - dr).alias("_jr"), (F.col("col") - dc).alias("_jc"),
            F.col("value").alias(f"{name}_raw"),
        )
        j = j.join(
            z,
            (F.col("r0") == F.col("_jr")) & (F.col("c0") == F.col("_jc")),
            "left",
        ).withColumn(f"{name}v", F.coalesce(f"{name}_raw", F.lit(0.0))) \
         .drop("_jr", "_jc", f"{name}_raw")
    blk = (
        j.withColumn("zs", F.expr(_VS_ZS))
        .groupBy("row", "col", "vid")
        .agg(F.expr(f"BOOL_OR({_VS_BLK})").alias("b"))
    )
    vis = tgt.join(blk, ["row", "col", "vid"], "left").select(
        "row", "col", F.expr("COALESCE(b, FALSE) = FALSE").alias("visible")
    )
    return (
        vis.groupBy("row", "col")
        .agg(
            (F.sum(F.when(F.col("visible"), 1).otherwise(0)).cast("double")
             / F.count(F.lit(1))).alias("vis_index")
        )
        .orderBy("row", "col")
    )


# -- edge-preserving sigma filter (§2.5; FilterLeeSigma family) ---------------
@Q.register(
    "focal_sigma",
    f"WITH {_RASF}, {_NBR2}, live AS (SELECT row, col, av, bv FROM nbr2 "
    f"WHERE bv != {NODATA!r}e0 AND ABS(bv - av) <= 20e0) "
    "SELECT row, col, SUM(bv) / COUNT(*) AS value "
    "FROM live GROUP BY 1, 2 ORDER BY row, col",
)
def q_focal_sigma(spark, sf):
    return _explode_focal(spark, "sigma")


# -- Brovey pan-sharpen (§2.13; PanSharpening.java Brovey transform) ----------
# R' = pan * R / (R + G + B) over three synthetic bands + a pan band.
@Q.register(
    "pan_sharpen",
    f"""WITH {_RAS}, {_RAS2}, {_RAS3}, {_RAS4}
SELECT r.row, r.col,
  CAST(ROUND(p.value * r.value / (r.value + g.value + b.value), 6) AS DOUBLE) AS r_sharp,
  CAST(ROUND(p.value * g.value / (r.value + g.value + b.value), 6) AS DOUBLE) AS g_sharp,
  CAST(ROUND(p.value * b.value / (r.value + g.value + b.value), 6) AS DOUBLE) AS b_sharp
FROM ras r JOIN ras2 g USING (row, col) JOIN ras3 b USING (row, col)
JOIN ras4 p USING (row, col)
WHERE r.value != {NODATA!r}e0 AND g.value != {NODATA!r}e0
  AND b.value != {NODATA!r}e0 AND p.value != {NODATA!r}e0
ORDER BY r.row, r.col""",
)
def q_pan_sharpen(spark, sf):
    r = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "r")
    g = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "g")
    b = R.explode_cells(_dem(spark, 2)).withColumnRenamed("value", "b")
    p = R.explode_cells(_dem(spark, 3)).withColumnRenamed("value", "p")
    j = (
        r.join(g, ["row", "col"]).join(b, ["row", "col"]).join(p, ["row", "col"])
        .where((F.col("r") != _ND) & (F.col("g") != _ND)
               & (F.col("b") != _ND) & (F.col("p") != _ND))
    )
    tot = F.col("r") + F.col("g") + F.col("b")
    return j.select(
        "row", "col",
        F.round(F.col("p") * F.col("r") / tot, 6).cast("double").alias("r_sharp"),
        F.round(F.col("p") * F.col("g") / tot, 6).cast("double").alias("g_sharp"),
        F.round(F.col("p") * F.col("b") / tot, 6).cast("double").alias("b_sharp"),
    ).orderBy("row", "col")


# -- FD8 multiple-flow-direction accumulation (§2.12; FlowAccumFD8.java) ------
# fractional downslope mass splitting (Freeman p=1); oracle = Jacobi
# relaxation of a(c) = 1 + sum w(u->c) a(u) (converges at DAG depth);
# parent-sum association differs between engines -> round(4).
_F8K = 100
_F8_DIRS = [(-1, -1, "s0"), (-1, 0, "s1"), (-1, 1, "s2"), (0, -1, "s3"),
            (0, 1, "s4"), (1, -1, "s5"), (1, 0, "s6"), (1, 1, "s7")]


def _fd8_oracle() -> str:
    sq2 = "1.4142135623730951e0"
    nmap = {
        "s0": ("n0", sq2), "s1": ("n1", "1e0"), "s2": ("n2", sq2),
        "s3": ("n3", "1e0"), "s4": ("n4", "1e0"),
        "s5": ("n5", sq2), "s6": ("n6", "1e0"), "s7": ("n7", sq2),
    }
    svals = ", ".join(
        f"CASE WHEN {n} IS NULL THEN 0e0 ELSE GREATEST((cv - {n}) / {d}, 0e0) END AS {s}"
        for s, (n, d) in nmap.items()
    )
    stot = " + ".join(s for s, _ in nmap.items())
    edges = " UNION ALL ".join(
        f"SELECT row, col, row + {dr} AS nr, col + {dc} AS nc, "
        f"CASE WHEN tot > 0e0 THEN {s} / tot ELSE 0e0 END AS w "
        f"FROM sw WHERE tot > 0e0 AND {s} > 0e0"
        for dr, dc, s in _F8_DIRS
    )
    return (
        f"rasf8 AS (SELECT r.r AS row, c.c AS col, {_DVAL} AS value "
        f"FROM range(0, {_DROWS}) r(r), range(0, {_DCOLS}) c(c)), "
        f"livef8 AS (SELECT row, col, NULLIF(value, {NODATA!r}e0) AS v FROM rasf8), "
        "w9f8 AS (SELECT a.row, a.col, a.v AS cv, "
        "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col - 1 THEN b.v END) AS n0, "
        "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col     THEN b.v END) AS n1, "
        "MAX(CASE WHEN b.row = a.row - 1 AND b.col = a.col + 1 THEN b.v END) AS n2, "
        "MAX(CASE WHEN b.row = a.row     AND b.col = a.col - 1 THEN b.v END) AS n3, "
        "MAX(CASE WHEN b.row = a.row     AND b.col = a.col + 1 THEN b.v END) AS n4, "
        "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col - 1 THEN b.v END) AS n5, "
        "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col     THEN b.v END) AS n6, "
        "MAX(CASE WHEN b.row = a.row + 1 AND b.col = a.col + 1 THEN b.v END) AS n7 "
        "FROM livef8 a JOIN livef8 b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
        "AND b.col BETWEEN a.col - 1 AND a.col + 1 AND b.v IS NOT NULL "
        "WHERE a.v IS NOT NULL GROUP BY 1, 2, 3), "
        f"swpre AS (SELECT row, col, {svals} FROM w9f8), "
        f"sw AS (SELECT *, {stot} AS tot FROM swpre), "
        f"wef8 AS MATERIALIZED ({edges}), "
        "eplus AS MATERIALIZED (SELECT row, col, nr, nc, w FROM wef8 "
        "UNION ALL SELECT row, col, row, col, -1e0 FROM sw), "
        "accf8(it, row, col, a) AS (SELECT 0, row, col, 1e0 FROM sw "
        "UNION ALL SELECT u.it + 1, e.nr, e.nc, "
        "1e0 + COALESCE(SUM(CASE WHEN e.w >= 0e0 THEN e.w * u.a END), 0e0) "
        "FROM accf8 u JOIN eplus e ON e.row = u.row AND e.col = u.col "
        f"WHERE u.it < {_F8K} GROUP BY 1, 2, 3)"
    )


@Q.register(
    "fd8_accum",
    f"WITH RECURSIVE {_fd8_oracle()} "
    f"SELECT row, col, CAST(ROUND(a, 4) AS DOUBLE) AS accum "
    f"FROM accf8 WHERE it = {_F8K} ORDER BY row, col",
)
def q_fd8_accum(spark, sf):
    from .operators.hydro import fd8_accum

    dem = R.synth_raster(spark, _DROWS, _DCOLS)
    return fd8_accum(dem, tile=30).orderBy("row", "col")


# -- RGB -> HSI color transform (§2.13; RgbToIhs.java) ------------------------
# standard intensity/saturation/hue formulas over three synthetic bands;
# acos is transcendental -> half-up round(6) on both sides.
_HSI_NUM = "(0.5e0 * ((r.value - g.value) + (r.value - b.value)))"
_HSI_DEN = ("SQRT((r.value - g.value) * (r.value - g.value) "
            "+ (r.value - b.value) * (g.value - b.value))")


@Q.register(
    "rgb_to_hsi",
    f"""WITH {_RAS}, {_RAS2}, ras3 AS (SELECT r.r AS row, c.c AS col, {_VAL2} AS value
FROM range(0, {ROWS}) r(r), range(0, {COLS}) c(c))
SELECT r.row, r.col,
  (FLOOR(((r.value + g.value + b.value) / 3e0) * 1e6 + 0.5e0) / 1e6) AS i,
  (FLOOR((1e0 - 3e0 * LEAST(r.value, g.value, b.value) / (r.value + g.value + b.value)) * 1e6 + 0.5e0) / 1e6) AS s,
  (FLOOR((CASE WHEN {_HSI_DEN} = 0e0 THEN 0e0
    WHEN b.value > g.value THEN 360e0 - DEGREES(ACOS(LEAST(GREATEST({_HSI_NUM} / {_HSI_DEN}, -1e0), 1e0)))
    ELSE DEGREES(ACOS(LEAST(GREATEST({_HSI_NUM} / {_HSI_DEN}, -1e0), 1e0))) END) * 1e6 + 0.5e0) / 1e6) AS h
FROM ras r JOIN ras2 g USING (row, col) JOIN ras3 b USING (row, col)
WHERE r.value != {NODATA!r}e0 AND g.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0
ORDER BY r.row, r.col""",
)
def q_rgb_to_hsi(spark, sf):
    r = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "rv")
    g = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "gv")
    b = R.explode_cells(_dem(spark, 2)).withColumnRenamed("value", "bv")
    j = (
        r.join(g, ["row", "col"]).join(b, ["row", "col"])
        .where((F.col("rv") != _ND) & (F.col("gv") != _ND) & (F.col("bv") != _ND))
    )
    num = "(0.5e0 * ((rv - gv) + (rv - bv)))"
    den = "SQRT((rv - gv) * (rv - gv) + (rv - bv) * (gv - bv))"
    rnd6 = "FLOOR(({}) * 1e6 + 0.5e0) / 1e6"
    return j.select(
        "row", "col",
        F.expr(rnd6.format("(rv + gv + bv) / 3e0")).alias("i"),
        F.expr(rnd6.format("1e0 - 3e0 * LEAST(rv, gv, bv) / (rv + gv + bv)")).alias("s"),
        F.expr(rnd6.format(
            f"CASE WHEN {den} = 0e0 THEN 0e0 "
            f"WHEN bv > gv THEN 360e0 - DEGREES(ACOS(LEAST(GREATEST({num} / {den}, -1e0), 1e0))) "
            f"ELSE DEGREES(ACOS(LEAST(GREATEST({num} / {den}, -1e0), 1e0))) END"
        )).alias("h"),
    ).orderBy("row", "col")


# -- IHS -> RGB inverse transform (§2.13; IhsToRgb.java): the sector-based
# inverse of the rgb_to_hsi formulas, exercised as a roundtrip over the three
# synthetic bands (unrounded i/s/h in, rounded rgb out).
def _ihs_inv_exprs() -> dict:
    def leg(hh):
        return f"i * (1e0 + s * COS(RADIANS({hh})) / COS(RADIANS(60e0 - ({hh}))))"

    lo = "i * (1e0 - s)"
    a_r, a_b = leg("h"), lo
    a_g = f"3e0 * i - (({a_r}) + ({a_b}))"
    b_g, b_r = leg("h - 120e0"), lo
    b_b = f"3e0 * i - (({b_r}) + ({b_g}))"
    c_b, c_g = leg("h - 240e0"), lo
    c_r = f"3e0 * i - (({c_g}) + ({c_b}))"
    pick = (
        "CASE WHEN h < 120e0 THEN ({a}) WHEN h < 240e0 THEN ({b}) ELSE ({c}) END"
    )
    return {
        "r2": pick.format(a=a_r, b=b_r, c=c_r),
        "g2": pick.format(a=a_g, b=b_g, c=c_g),
        "b2": pick.format(a=a_b, b=b_b, c=c_b),
    }


_HSI_NUM2 = "(0.5e0 * ((rv - gv) + (rv - bv)))"
_HSI_DEN2 = "SQRT((rv - gv) * (rv - gv) + (rv - bv) * (gv - bv))"
_HSI_FWD = {
    "i": "(rv + gv + bv) / 3e0",
    "s": "1e0 - 3e0 * LEAST(rv, gv, bv) / (rv + gv + bv)",
    "h": (
        f"CASE WHEN {_HSI_DEN2} = 0e0 THEN 0e0 "
        f"WHEN bv > gv THEN 360e0 - DEGREES(ACOS(LEAST(GREATEST({_HSI_NUM2} / {_HSI_DEN2}, -1e0), 1e0))) "
        f"ELSE DEGREES(ACOS(LEAST(GREATEST({_HSI_NUM2} / {_HSI_DEN2}, -1e0), 1e0))) END"
    ),
}


@Q.register(
    "hsi_to_rgb",
    f"""WITH {_RAS}, {_RAS2}, ras3 AS (SELECT r.r AS row, c.c AS col, {_VAL2} AS value
FROM range(0, {ROWS}) r(r), range(0, {COLS}) c(c)),
hsix AS (SELECT r.row, r.col, {_HSI_FWD['i']} AS i, {_HSI_FWD['s']} AS s, {_HSI_FWD['h']} AS h
FROM (SELECT row, col, value AS rv FROM ras) r
JOIN (SELECT row, col, value AS gv FROM ras2) g USING (row, col)
JOIN (SELECT row, col, value AS bv FROM ras3) b USING (row, col)
WHERE rv != {NODATA!r}e0 AND gv != {NODATA!r}e0 AND bv != {NODATA!r}e0)
SELECT row, col,
  (FLOOR(({_ihs_inv_exprs()['r2']}) * 1e6 + 0.5e0) / 1e6) AS r2,
  (FLOOR(({_ihs_inv_exprs()['g2']}) * 1e6 + 0.5e0) / 1e6) AS g2,
  (FLOOR(({_ihs_inv_exprs()['b2']}) * 1e6 + 0.5e0) / 1e6) AS b2
FROM hsix ORDER BY row, col""",
)
def q_hsi_to_rgb(spark, sf):
    r = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "rv")
    g = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "gv")
    b = R.explode_cells(_dem(spark, 2)).withColumnRenamed("value", "bv")
    j = (
        r.join(g, ["row", "col"]).join(b, ["row", "col"])
        .where((F.col("rv") != _ND) & (F.col("gv") != _ND) & (F.col("bv") != _ND))
        .select(
            "row", "col",
            *[F.expr(e).alias(k) for k, e in _HSI_FWD.items()],
        )
    )
    inv = _ihs_inv_exprs()
    return j.select(
        "row", "col",
        *[
            F.expr(f"FLOOR(({e}) * 1e6 + 0.5e0) / 1e6").alias(k)
            for k, e in inv.items()
        ],
    ).orderBy("row", "col")


# -- IHS pan-sharpen (§2.13; PanSharpening.java IHS mode): transform RGB to
# IHS, substitute the intensity with the panchromatic band, inverse-transform
# back — pure composition of the shared _HSI_FWD / _ihs_inv_exprs fragments
# (Brovey mode is `pan_sharpen`).
@Q.register(
    "pan_sharpen_ihs",
    f"""WITH {_RAS}, {_RAS2}, ras3 AS (SELECT r.r AS row, c.c AS col, {_VAL2} AS value
FROM range(0, {ROWS}) r(r), range(0, {COLS}) c(c)), {_RAS4},
hsix AS (SELECT r.row, r.col, p.pv AS i, {_HSI_FWD['s']} AS s, {_HSI_FWD['h']} AS h
FROM (SELECT row, col, value AS rv FROM ras) r
JOIN (SELECT row, col, value AS gv FROM ras2) g USING (row, col)
JOIN (SELECT row, col, value AS bv FROM ras3) b USING (row, col)
JOIN (SELECT row, col, value AS pv FROM ras4) p USING (row, col)
WHERE rv != {NODATA!r}e0 AND gv != {NODATA!r}e0 AND bv != {NODATA!r}e0
  AND pv != {NODATA!r}e0)
SELECT row, col,
  (FLOOR(({_ihs_inv_exprs()['r2']}) * 1e6 + 0.5e0) / 1e6) AS r_sharp,
  (FLOOR(({_ihs_inv_exprs()['g2']}) * 1e6 + 0.5e0) / 1e6) AS g_sharp,
  (FLOOR(({_ihs_inv_exprs()['b2']}) * 1e6 + 0.5e0) / 1e6) AS b_sharp
FROM hsix ORDER BY row, col""",
)
def q_pan_sharpen_ihs(spark, sf):
    r = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "rv")
    g = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "gv")
    b = R.explode_cells(_dem(spark, 2)).withColumnRenamed("value", "bv")
    p = R.explode_cells(_dem(spark, 3)).withColumnRenamed("value", "pv")
    j = (
        r.join(g, ["row", "col"]).join(b, ["row", "col"]).join(p, ["row", "col"])
        .where(
            (F.col("rv") != _ND) & (F.col("gv") != _ND)
            & (F.col("bv") != _ND) & (F.col("pv") != _ND)
        )
        .select(
            "row", "col",
            F.col("pv").alias("i"),
            F.expr(_HSI_FWD["s"]).alias("s"),
            F.expr(_HSI_FWD["h"]).alias("h"),
        )
    )
    inv = _ihs_inv_exprs()
    return j.select(
        "row", "col",
        F.expr(f"FLOOR(({inv['r2']}) * 1e6 + 0.5e0) / 1e6").alias("r_sharp"),
        F.expr(f"FLOOR(({inv['g2']}) * 1e6 + 0.5e0) / 1e6").alias("g_sharp"),
        F.expr(f"FLOOR(({inv['b2']}) * 1e6 + 0.5e0) / 1e6").alias("b_sharp"),
    ).orderBy("row", "col")


# Tarboton 8-facet angle/slope SQL, parameterized by the 9-cell window CTE
_DINF_SQL_FACETS = [
    ("n4", "n2", 0, 1), ("n1", "n2", 1, -1), ("n1", "n0", 1, 1),
    ("n3", "n0", 2, -1), ("n3", "n5", 2, 1), ("n6", "n5", 3, -1),
    ("n6", "n7", 3, 1), ("n4", "n7", 4, -1),
]


def _dinf_facets_parts(src: str, emit_r: bool = False) -> tuple[str, str, str]:
    """(fct select body, max-slope expr, angle CASE) over window CTE `src`.
    emit_r additionally projects the clamped within-facet angles r0..r7
    (needed by the MDInf weight split)."""
    sq2 = "1.4142135623730951e0"
    cols = []
    for k, (e1, e2, ac, af) in enumerate(_DINF_SQL_FACETS):
        s1, s2 = f"(cv - {e1})", f"({e1} - {e2})"
        rr = f"ATAN2({s2}, {s1})"
        r = f"(CASE WHEN {rr} < 0e0 THEN 0e0 WHEN {rr} > PI() / 4e0 THEN PI() / 4e0 ELSE {rr} END)"
        s = (f"(CASE WHEN {rr} < 0e0 THEN {s1} "
             f"WHEN {rr} > PI() / 4e0 THEN (cv - {e2}) / {sq2} "
             f"ELSE SQRT({s1} * {s1} + {s2} * {s2}) END)")
        cols.append(f"{s} AS s{k}")
        cols.append(f"({af} * {r} + {ac} * PI() / 2e0) AS a{k}")
        if emit_r:
            cols.append(f"{r} AS r{k}")
    mx = "GREATEST(" + ", ".join(f"s{k}" for k in range(8)) + ")"
    angle_case = "CASE WHEN " + f"{mx} <= 0e0 THEN -1e0 " + " ".join(
        f"WHEN s{k} = {mx} THEN a{k}" for k in range(8)
    ) + " END"
    body = (
        "SELECT row, col, " + ", ".join(cols) + f" FROM {src} "
        "WHERE cv IS NOT NULL AND n0 IS NOT NULL AND n1 IS NOT NULL "
        "AND n2 IS NOT NULL AND n3 IS NOT NULL AND n4 IS NOT NULL "
        "AND n5 IS NOT NULL AND n6 IS NOT NULL AND n7 IS NOT NULL"
    )
    return body, mx, angle_case


# -- D-infinity accumulation (§2.12; FlowAccumDinf.java:490) ------------------
# Tarboton angle (rounded as in flow_dinf) -> two-direction weight split
# (shared SQL, hydro.dinf_ws_exprs) -> the same Jacobi accumulation as FD8.
def _dinf_accum_oracle() -> str:
    from .operators.hydro import D8_OFFS, dinf_ws_exprs

    base = _fd8_oracle()
    prefix = base[: base.index("swpre")]  # rasf8, livef8, w9f8 CTEs
    facet_cols, mx, angle_case = _dinf_facets_parts("w9f8")
    wcols = ", ".join(
        f"{e} AS w{k}" for k, e in enumerate(dinf_ws_exprs())
    )
    edges = " UNION ALL ".join(
        f"SELECT row, col, row + {dr} AS nr, col + {dc} AS nc, w{k} AS w "
        f"FROM dws WHERE w{k} > 0e0"
        for k, (dr, dc, _) in enumerate(D8_OFFS)
    )
    return (
        prefix
        + f"fctd AS ({facet_cols}), "
        f"dang AS (SELECT row, col, (FLOOR(({angle_case}) * 1e6 + 0.5e0) / 1e6) AS angle FROM fctd), "
        f"dws AS MATERIALIZED (SELECT row, col, {wcols} FROM dang), "
        f"wedd AS MATERIALIZED ({edges}), "
        "wedi AS MATERIALIZED (SELECT e.* FROM wedd e JOIN dws t ON t.row = e.nr AND t.col = e.nc), "
        "eplusd AS MATERIALIZED (SELECT row, col, nr, nc, w FROM wedi "
        "UNION ALL SELECT row, col, row, col, -1e0 FROM dws), "
        "accdi(it, row, col, a) AS (SELECT 0, row, col, 1e0 FROM dws "
        "UNION ALL SELECT u.it + 1, e.nr, e.nc, "
        "1e0 + COALESCE(SUM(CASE WHEN e.w >= 0e0 THEN e.w * u.a END), 0e0) "
        "FROM accdi u JOIN eplusd e ON e.row = u.row AND e.col = u.col "
        f"WHERE u.it < {_F8K} GROUP BY 1, 2, 3)"
    )


@Q.register(
    "dinf_accum",
    f"WITH RECURSIVE {_dinf_accum_oracle()} "
    f"SELECT row, col, CAST(ROUND(a, 4) AS DOUBLE) AS accum "
    f"FROM accdi WHERE it = {_F8K} ORDER BY row, col",
)
def q_dinf_accum(spark, sf):
    from .operators.hydro import dinf_accum

    dem = R.synth_raster(spark, _DROWS, _DCOLS)
    return dinf_accum(dem, tile=30).orderBy("row", "col")


# -- MD-infinity accumulation (§2.12; GeasyTools FlowAccumMDInf.java:631) -----
# all positive-slope facets contribute, split by the (quantized) within-facet
# angle; the same Jacobi accumulation as FD8/D-infinity.
def _mdinf_ws_sqls() -> list:
    dirs_terms: dict = {d: [] for d in range(8)}
    for k, (e1, e2, ac, af) in enumerate(_DINF_SQL_FACETS):
        sk = f"(CASE WHEN s{k} > 0e0 THEN s{k} ELSE 0e0 END)"
        rq = f"(FLOOR(r{k} * 1e6 + 0.5e0) / 1e6)"
        dirs_terms[int(e1[1:])].append((k, f"{sk} * (1e0 - {rq} / (PI() / 4e0))"))
        dirs_terms[int(e2[1:])].append((k, f"{sk} * ({rq} / (PI() / 4e0))"))
    tot = " + ".join(
        f"(CASE WHEN s{k} > 0e0 THEN s{k} ELSE 0e0 END)" for k in range(8)
    )
    return [
        "(CASE WHEN (" + tot + ") > 0e0 THEN ("
        + " + ".join(t for _, t in sorted(dirs_terms[d]))
        + ") / (" + tot + ") ELSE 0e0 END)"
        for d in range(8)
    ]


def _mdinf_accum_oracle() -> str:
    from .operators.hydro import D8_OFFS

    base = _fd8_oracle()
    prefix = base[: base.index("swpre")]
    facet_cols, _mx, _ac = _dinf_facets_parts("w9f8", emit_r=True)
    wcols = ", ".join(f"{e} AS w{k}" for k, e in enumerate(_mdinf_ws_sqls()))
    edges = " UNION ALL ".join(
        f"SELECT row, col, row + {dr} AS nr, col + {dc} AS nc, w{k} AS w "
        f"FROM mws WHERE w{k} > 0e0"
        for k, (dr, dc, _) in enumerate(D8_OFFS)
    )
    return (
        prefix
        + f"fctm AS ({facet_cols}), "
        f"mws AS MATERIALIZED (SELECT row, col, {wcols} FROM fctm), "
        f"wedm AS MATERIALIZED ({edges}), "
        "wemi AS MATERIALIZED (SELECT e.* FROM wedm e JOIN mws t ON t.row = e.nr AND t.col = e.nc), "
        "eplusm AS MATERIALIZED (SELECT row, col, nr, nc, w FROM wemi "
        "UNION ALL SELECT row, col, row, col, -1e0 FROM mws), "
        "accmd(it, row, col, a) AS (SELECT 0, row, col, 1e0 FROM mws "
        "UNION ALL SELECT u.it + 1, e.nr, e.nc, "
        "1e0 + COALESCE(SUM(CASE WHEN e.w >= 0e0 THEN e.w * u.a END), 0e0) "
        "FROM accmd u JOIN eplusm e ON e.row = u.row AND e.col = u.col "
        f"WHERE u.it < {_F8K} GROUP BY 1, 2, 3)"
    )


@Q.register(
    "mdinf_accum",
    f"WITH RECURSIVE {_mdinf_accum_oracle()} "
    f"SELECT row, col, CAST(ROUND(a, 4) AS DOUBLE) AS accum "
    f"FROM accmd WHERE it = {_F8K} ORDER BY row, col",
)
def q_mdinf_accum(spark, sf):
    from .operators.hydro import mdinf_accum

    dem = R.synth_raster(spark, _DROWS, _DCOLS)
    return mdinf_accum(dem, tile=30).orderBy("row", "col")


# -- D-infinity flow pointer (§2.12; FlowPointerDinf.java, Tarboton 1997) -----
def _dinf_oracle_select() -> str:
    body, mx, angle_case = _dinf_facets_parts("w9")
    return (
        f"fct AS ({body}) "
        f"SELECT row, col, (FLOOR(({angle_case}) * 1e6 + 0.5e0) / 1e6) AS angle, "
        f"(FLOOR((CASE WHEN {mx} <= 0e0 THEN 0e0 ELSE {mx} END) * 1e6 + 0.5e0) / 1e6) AS slope "
        "FROM fct ORDER BY row, col"
    )


@Q.register(
    "flow_dinf",
    f"WITH {_HYD_BASE}, {_dinf_oracle_select()}",
)
def q_flow_dinf(spark, sf):
    from .operators.hydro import flow_pointer_dinf

    return flow_pointer_dinf(_hydem(spark)).orderBy("row", "col")


# -- downslope flow-path length (§2.12; DownslopeFlowpathLength.java) ---------
# distance along the D8 path to the terminal pit; oracle iterates
# d_{k+1}(c) = step(c) + d_k(target(c)) (pits: zero-step self edges) to the
# exact fixpoint; engine accumulates via weighted pointer jumping -> last-ulp
# association differs, round(6).
_FPK = 80


@Q.register(
    "flowpath_length",
    f"""WITH RECURSIVE {_HYD_BASE},
fe AS (SELECT row, col,
  row + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1
       WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END AS nr,
  col + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 1
       WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END AS nc,
  CASE CAST(log2(code) AS INT) WHEN 0 THEN 1.4142135623730951e0 WHEN 2 THEN 1.4142135623730951e0
       WHEN 5 THEN 1.4142135623730951e0 WHEN 7 THEN 1.4142135623730951e0 ELSE 1e0 END AS step
  FROM d8 WHERE code > 0
  UNION ALL SELECT row, col, row, col, 0e0 FROM d8 WHERE code = 0),
fp(it, row, col, d) AS (
  SELECT 0, row, col, 0e0 FROM d8
  UNION ALL
  SELECT u.it + 1, f.row, f.col, f.step + u.d
  FROM fp u JOIN fe f ON f.nr = u.row AND f.nc = u.col
  WHERE u.it < {_FPK}
)
SELECT row, col, CAST(ROUND(d, 6) AS DOUBLE) AS fp_len
FROM fp WHERE it = {_FPK} ORDER BY row, col""",
)
def q_flowpath_length(spark, sf):
    from .operators.hydro import flow_pointer_d8, flowpath_length

    return flowpath_length(flow_pointer_d8(_hydem(spark))).orderBy("row", "col")


# -- average upslope flow-path length (§2.12; AverageUpslopeFlowpathLength
# .java): mean over strictly-upslope cells of their path length down to this
# cell; 0 where nothing drains in.  Identity avg = (ΣD_up − N·D)/N with D =
# downslope flow-path length (paths merge, so pathlen(u→c) = D(u) − D(c));
# ΣD_up is an exact integer-weighted accumulation of the micro-scaled D
# field through the unchanged counting kernel (operators/hydro.
# weighted_flow_accum: ext = w0 − 1).
@Q.register(
    "avg_upslope_length",
    f"""WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES},
fe AS (SELECT row, col,
  row + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1
       WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END AS nr,
  col + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 1
       WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END AS nc,
  CASE CAST(log2(code) AS INT) WHEN 0 THEN 1.4142135623730951e0 WHEN 2 THEN 1.4142135623730951e0
       WHEN 5 THEN 1.4142135623730951e0 WHEN 7 THEN 1.4142135623730951e0 ELSE 1e0 END AS step
  FROM d8 WHERE code > 0
  UNION ALL SELECT row, col, row, col, 0e0 FROM d8 WHERE code = 0),
fp(it, row, col, d) AS (
  SELECT 0, row, col, 0e0 FROM d8
  UNION ALL
  SELECT u.it + 1, f.row, f.col, f.step + u.d
  FROM fp u JOIN fe f ON f.nr = u.row AND f.nc = u.col
  WHERE u.it < {_FPK}
),
fpl AS MATERIALIZED (SELECT row, col, row * 1000000 + col AS id,
  CAST(FLOOR(ROUND(d, 6) * 1e6 + 0.5e0) AS BIGINT) AS dm
  FROM fp WHERE it = {_FPK}),
wsu AS (SELECT r.nid, SUM(f.dm) AS wsum FROM reach r JOIN fpl f ON f.id = r.id GROUP BY 1)
SELECT d.row, d.col, CAST(CASE WHEN a.accum > 1 THEN
  FLOOR(CAST(COALESCE(w.wsum, 0) - (a.accum - 1) * f.dm AS DOUBLE)
        / CAST(a.accum - 1 AS DOUBLE) + 0.5e0) / 1e6
  ELSE 0e0 END AS DOUBLE) AS avg_len
FROM d8 d
JOIN fpl f ON f.row = d.row AND f.col = d.col
JOIN acc a ON a.row = d.row AND a.col = d.col
LEFT JOIN wsu w ON w.nid = d.row * 1000000 + d.col
ORDER BY d.row, d.col""",
)
def q_avg_upslope_length(spark, sf):
    from .operators.hydro import avg_upslope_length, flow_pointer_d8

    return avg_upslope_length(flow_pointer_d8(_hydem(spark))).orderBy("row", "col")


# -- upslope (longest) flow-path length (§2.12; UpslopeFlowpathLength.java) ---
@Q.register(
    "upslope_length",
    f"""WITH RECURSIVE {_HYD_BASE},
feu AS (SELECT row, col,
  row + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1
       WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END AS nr,
  col + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 1
       WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END AS nc,
  CASE CAST(log2(code) AS INT) WHEN 0 THEN 1.4142135623730951e0 WHEN 2 THEN 1.4142135623730951e0
       WHEN 5 THEN 1.4142135623730951e0 WHEN 7 THEN 1.4142135623730951e0 ELSE 1e0 END AS step
  FROM d8 WHERE code > 0
  UNION ALL SELECT row, col, row, col, 0e0 FROM d8),
upl(it, row, col, u) AS (
  SELECT 0, row, col, 0e0 FROM d8
  UNION ALL
  SELECT x.it + 1, f.nr, f.nc, MAX(x.u + f.step)
  FROM upl x JOIN feu f ON f.row = x.row AND f.col = x.col
  WHERE x.it < {_FPK} GROUP BY 1, 2, 3
)
SELECT row, col, CAST(ROUND(u, 6) AS DOUBLE) AS up_len
FROM upl WHERE it = {_FPK} ORDER BY row, col""",
)
def q_upslope_length(spark, sf):
    from .operators.hydro import flow_pointer_d8, upslope_max_length

    return upslope_max_length(flow_pointer_d8(_hydem(spark))).orderBy("row", "col")


# -- Zhang-Suen line thinning (§2.5; LineThinning.java) -----------------------
# fixed 8 sub-iteration pairs on both sides (past convergence for these
# shapes); deletion decisions via a shared 256-entry neighborhood-mask LUT.
_ZS_PAIRS = 8


def _zs_oracle() -> str:
    from .operators.vectorize import _ZS_OFFS, _zs_luts

    lut1, lut2 = _zs_luts()
    offs_vals = ", ".join(
        f"({dr}, {dc}, {1 << k})" for k, (dr, dc) in enumerate(_ZS_OFFS)
    )
    parts = [
        f"zoffs AS (SELECT * FROM (VALUES {offs_vals}) o(dr, dc, bit))",
        "zs0 AS MATERIALIZED (SELECT row, col FROM ras WHERE value > 100e0 "
        f"AND value != {NODATA!r}e0)",
    ]
    for i in range(_ZS_PAIRS * 2):
        lut = lut1 if i % 2 == 0 else lut2
        lut_lit = "[" + ", ".join(str(v) for v in lut) + "]"
        parts.append(
            f"zpr{i} AS (SELECT s.row - o.dr AS row, s.col - o.dc AS col, o.bit "
            f"FROM zs{i} s CROSS JOIN zoffs o)"
        )
        parts.append(
            f"zmk{i} AS MATERIALIZED (SELECT s.row, s.col, "
            f"COALESCE(SUM(p.bit), 0) AS m FROM zs{i} s "
            f"LEFT JOIN zpr{i} p ON p.row = s.row AND p.col = s.col GROUP BY 1, 2)"
        )
        parts.append(
            f"zs{i + 1} AS MATERIALIZED (SELECT row, col FROM zmk{i} "
            f"WHERE list_extract({lut_lit}, CAST(m AS INT) + 1) = 0)"
        )
    return ", ".join(parts)


@Q.register(
    "line_thinning",
    f"WITH {_RASF}, {_zs_oracle()} "
    f"SELECT row, col FROM zs{_ZS_PAIRS * 2} ORDER BY row, col",
)
def q_line_thinning(spark, sf):
    from .operators.vectorize import line_thinning

    cells = (
        R.explode_cells(_demf(spark))
        .where((F.col("value") > 100.0) & (F.col("value") != _ND))
        .select("row", "col")
    )
    return line_thinning(cells, pairs=_ZS_PAIRS).orderBy("row", "col")


# -- raster -> vector lines (§2.10; RasterToVectorLines.java:217-520) ---------
# polyline features from the thinned skeleton: junction cells (degree >= 3)
# cut the chain, remaining components are simple paths / loops.  The traced
# vertex ORDER is property-tested (tests/test_vectorize.py); the oracle
# checks the per-line structure: cell count, step-length sum, endpoints.
@Q.register(
    "raster_to_lines",
    f"""WITH RECURSIVE {_RASF}, {_zs_oracle()},
lc AS MATERIALIZED (SELECT row, col FROM zs{_ZS_PAIRS * 2}),
cand AS (
  SELECT a.row, a.col, b.row AS nr, b.col AS nc
  FROM lc a JOIN lc b ON (b.row = a.row AND b.col = a.col + 1)
                      OR (b.row = a.row + 1 AND b.col = a.col)
  UNION ALL
  SELECT a.row, a.col, b.row, b.col
  FROM lc a JOIN lc b ON b.row = a.row + 1 AND (b.col = a.col + 1 OR b.col = a.col - 1)
  WHERE NOT EXISTS (SELECT 1 FROM lc x WHERE x.row = a.row + 1 AND x.col = a.col)
    AND NOT EXISTS (SELECT 1 FROM lc x WHERE x.row = a.row AND x.col = b.col)
),
ed AS MATERIALIZED (SELECT * FROM cand UNION ALL SELECT nr, nc, row, col FROM cand),
degt AS (SELECT row, col, COUNT(*) AS d FROM ed GROUP BY 1, 2),
junc AS MATERIALIZED (SELECT row, col FROM degt WHERE d >= 3),
kept AS MATERIALIZED (SELECT e.* FROM ed e
  WHERE NOT EXISTS (SELECT 1 FROM junc j WHERE j.row = e.row AND j.col = e.col)
    AND NOT EXISTS (SELECT 1 FROM junc j WHERE j.row = e.nr AND j.col = e.nc)),
base AS MATERIALIZED (SELECT row, col, row * 1000000 + col AS id FROM lc),
adjk AS (SELECT (row * 1000000 + col) AS id, (nr * 1000000 + nc) AS nid FROM kept),
reach(id, rid) AS (SELECT id, id FROM base UNION
  SELECT r.id, a.nid FROM reach r JOIN adjk a ON a.id = r.rid),
lab AS (SELECT id, MIN(rid) AS label FROM reach GROUP BY 1),
bl AS MATERIALIZED (SELECT b.row, b.col, b.id, l.label FROM base b JOIN lab l USING (id)),
ncl AS (SELECT label, COUNT(*) AS n_cells FROM bl GROUP BY 1),
kept1 AS (SELECT * FROM kept WHERE row < nr OR (row = nr AND col < nc)),
len AS (SELECT l.label, CAST(ROUND(SUM(CASE WHEN k.row != k.nr AND k.col != k.nc
  THEN 1.4142135623730951e0 ELSE 1e0 END), 6) AS DOUBLE) AS length
  FROM kept1 k JOIN bl l ON l.row = k.row AND l.col = k.col GROUP BY 1),
kdeg AS (SELECT row, col, COUNT(*) AS kd FROM kept GROUP BY 1, 2),
ends AS (SELECT l.label, MIN(l.id) AS end1, MAX(l.id) AS end2
  FROM bl l LEFT JOIN kdeg d ON d.row = l.row AND d.col = l.col
  WHERE COALESCE(d.kd, 0) <= 1 GROUP BY 1)
SELECT n.label AS line_id, n.n_cells, COALESCE(e.length, 0e0) AS length,
       COALESCE(s.end1, -1) AS end1, COALESCE(s.end2, -1) AS end2
FROM ncl n LEFT JOIN len e USING (label) LEFT JOIN ends s USING (label)
ORDER BY line_id""",
)
def q_raster_to_lines(spark, sf):
    from .operators.vectorize import line_thinning, raster_to_lines

    cells = (
        R.explode_cells(_demf(spark))
        .where((F.col("value") > 100.0) & (F.col("value") != _ND))
        .select("row", "col")
    )
    return raster_to_lines(line_thinning(cells, pairs=_ZS_PAIRS))


@Q.register(
    "remove_spurs",
    f"""WITH RECURSIVE {_RASF}, {_zs_oracle()},
rs0 AS MATERIALIZED (SELECT row, col FROM zs{_ZS_PAIRS * 2}),
rsp0 AS (SELECT a.row, a.col, COUNT(*) AS d FROM rs0 a JOIN rs0 b
  ON NOT (a.row = b.row AND a.col = b.col)
  AND ABS(a.row - b.row) <= 1 AND ABS(a.col - b.col) <= 1 GROUP BY 1, 2),
rs1 AS MATERIALIZED (SELECT r.row, r.col FROM rs0 r JOIN rsp0 d USING (row, col) WHERE d.d >= 2),
rsp1 AS (SELECT a.row, a.col, COUNT(*) AS d FROM rs1 a JOIN rs1 b
  ON NOT (a.row = b.row AND a.col = b.col)
  AND ABS(a.row - b.row) <= 1 AND ABS(a.col - b.col) <= 1 GROUP BY 1, 2),
rs2 AS (SELECT r.row, r.col FROM rs1 r JOIN rsp1 d USING (row, col) WHERE d.d >= 2)
SELECT row, col FROM rs2 ORDER BY row, col""",
)
def q_remove_spurs(spark, sf):
    from .operators.vectorize import line_thinning, remove_spurs

    cells = (
        R.explode_cells(_demf(spark))
        .where((F.col("value") > 100.0) & (F.col("value") != _ND))
        .select("row", "col")
    )
    return remove_spurs(
        line_thinning(cells, pairs=_ZS_PAIRS), passes=2
    ).orderBy("row", "col")


# -- thicken raster line (§2.5 morphology triple; Scripts/
# ThickenRasterLine.groovy): fill the elbow of every diagonal step so the
# skeleton becomes 4-connected — completes LineThinning / RemoveSpurs /
# Thicken.  One 4-offset probe + bitmask aggregation (see operators/
# vectorize.thicken_line).
@Q.register(
    "thicken_line",
    f"""WITH {_RASF}, {_zs_oracle()},
tl0 AS MATERIALIZED (SELECT row, col FROM zs{_ZS_PAIRS * 2}),
tprobe AS (SELECT s.row + o.dr AS row, s.col + o.dc AS col, o.bit
  FROM tl0 s CROSS JOIN (VALUES (1, 0, 1), (0, -1, 2), (-1, 0, 4), (0, 1, 8)) o(dr, dc, bit)),
tmask AS (SELECT row, col, SUM(bit) AS m FROM tprobe GROUP BY 1, 2),
tfill AS (SELECT m.row, m.col FROM tmask m
  WHERE ((m & 3) = 3 OR (m & 6) = 6 OR (m & 12) = 12 OR (m & 9) = 9)
    AND NOT EXISTS (SELECT 1 FROM tl0 t WHERE t.row = m.row AND t.col = m.col))
SELECT row, col FROM tl0 UNION ALL SELECT row, col FROM tfill ORDER BY row, col""",
)
def q_thicken_line(spark, sf):
    from .operators.vectorize import line_thinning, thicken_line

    cells = (
        R.explode_cells(_demf(spark))
        .where((F.col("value") > 100.0) & (F.col("value") != _ND))
        .select("row", "col")
    )
    return thicken_line(line_thinning(cells, pairs=_ZS_PAIRS)).orderBy("row", "col")



# ===========================================================================
# round-3 terrain composites (TerrainAnalysisTools family)
# ===========================================================================

# -- tangential curvature (§2.5; TangentialCurv.java:270): the plan-curvature
# numerator normalized by the surface metric sqrt(1 + p).
@Q.register(
    "tangential_curv",
    f"WITH {_RASF}, {_W9}, {_ZT} SELECT row, col, "
    "(FLOOR((CASE WHEN gq * gq + hq * hq = 0e0 THEN 0e0 "
    "ELSE 2e0 * (dq * hq * hq + eq * gq * gq - fq * gq * hq) "
    "/ ((gq * gq + hq * hq) * SQRT(1e0 + (gq * gq + hq * hq))) END) "
    "* 1e6 + 0.5e0) / 1e6) AS value FROM zt ORDER BY row, col",
)
def q_tangential_curv(spark, sf):
    return _explode_focal(spark, "curv_tang")


# -- up/downslope neighbor counts (§2.5/2.12; NumDownslopeNeighbours.java,
# NumUpslopeNeighbours.java): strict comparisons — exact integers.
@Q.register(
    "num_neighbours",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    "CAST(((CASE WHEN nw < cv THEN 1 ELSE 0 END) + (CASE WHEN nn < cv THEN 1 ELSE 0 END) + "
    "(CASE WHEN ne < cv THEN 1 ELSE 0 END) + (CASE WHEN wv < cv THEN 1 ELSE 0 END) + "
    "(CASE WHEN ev < cv THEN 1 ELSE 0 END) + (CASE WHEN sw < cv THEN 1 ELSE 0 END) + "
    "(CASE WHEN ss < cv THEN 1 ELSE 0 END) + (CASE WHEN se < cv THEN 1 ELSE 0 END)) AS DOUBLE) AS n_down, "
    "CAST(((CASE WHEN nw > cv THEN 1 ELSE 0 END) + (CASE WHEN nn > cv THEN 1 ELSE 0 END) + "
    "(CASE WHEN ne > cv THEN 1 ELSE 0 END) + (CASE WHEN wv > cv THEN 1 ELSE 0 END) + "
    "(CASE WHEN ev > cv THEN 1 ELSE 0 END) + (CASE WHEN sw > cv THEN 1 ELSE 0 END) + "
    "(CASE WHEN ss > cv THEN 1 ELSE 0 END) + (CASE WHEN se > cv THEN 1 ELSE 0 END)) AS DOUBLE) AS n_up "
    f"FROM w9 {_FULLW} ORDER BY row, col",
)
def q_num_neighbours(spark, sf):
    dn = R.explode_cells(R.focal(_demf(spark), "ndn"), "n_down")
    up = R.explode_cells(R.focal(_demf(spark), "nun"), "n_up")
    return (
        dn.join(up, ["row", "col"])
        .where((F.col("n_down") != _ND) & (F.col("n_up") != _ND))
        .select("row", "col", "n_down", "n_up")
        .orderBy("row", "col")
    )


# -- max downslope elevation change (§2.5; MaxDownslopeElevationChange.java):
# z - min 8-neighbor; the focal kernel applies the shared round-6 idiom to
# every terrain-branch output, so the oracle rounds identically.
@Q.register(
    "max_downslope_change",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    "(FLOOR((cv - LEAST(nw, nn, ne, wv, ev, sw, ss, se)) * 1e6 + 0.5e0) / 1e6) AS value "
    f"FROM w9 {_FULLW} ORDER BY row, col",
)
def q_max_downslope_change(spark, sf):
    return _explode_focal(spark, "maxdrop")


# -- relative aspect (§2.5; RelativeAspect.java): angular distance of the
# aspect from azimuth 90° (east), folded to [0, 180].  Computed FROM the
# round-6 aspect so both engines branch on identical inputs; the fold is a
# conditional add/subtract — exact.
_REL_D = "(CASE WHEN value - 90e0 < 0e0 THEN value - 90e0 + 360e0 ELSE value - 90e0 END)"


@Q.register(
    "relative_aspect",
    f"WITH {_RASF}, {_W9}, asp AS (SELECT row, col, "
    f"(FLOOR(({_ASPECT_SQL}) * 1e6 + 0.5e0) / 1e6) AS value FROM w9 {_FULLW}) "
    f"SELECT row, col, LEAST({_REL_D}, 360e0 - {_REL_D}) AS value "
    "FROM asp ORDER BY row, col",
)
def q_relative_aspect(spark, sf):
    asp = _explode_focal(spark, "aspect")
    return asp.select(
        "row", "col",
        F.expr(f"LEAST({_REL_D}, 360e0 - {_REL_D})").alias("value"),
    ).orderBy("row", "col")


# -- relative stream power index (§2.12; RelativeStreamPowerIndex.java:251):
# SCA^p * tan(slope), p = 1 — the wetness_index composition with a different
# closing formula.
@Q.register(
    "stream_power",
    f"""WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES},
slp AS (
  SELECT row, col,
    (FLOOR(DEGREES(ATAN(SQRT(
      POW((n2 - n0 + 2e0 * (n4 - n3) + n7 - n5) / 8e0, 2) +
      POW((n5 - n0 + 2e0 * (n6 - n1) + n7 - n2) / 8e0, 2)))) * 1e6 + 0.5e0) / 1e6) AS slope_deg
  FROM w9
  WHERE cv IS NOT NULL AND n0 IS NOT NULL AND n1 IS NOT NULL AND n2 IS NOT NULL
    AND n3 IS NOT NULL AND n4 IS NOT NULL AND n5 IS NOT NULL AND n6 IS NOT NULL
    AND n7 IS NOT NULL
)
SELECT s.row, s.col,
  CAST(ROUND(CAST(a.accum AS DOUBLE) * TAN(RADIANS(s.slope_deg)), 6) AS DOUBLE) AS value
FROM slp s JOIN acc a ON a.row = s.row AND a.col = s.col
WHERE s.slope_deg > 0e0 ORDER BY s.row, s.col""",
)
def q_stream_power(spark, sf):
    from .operators.hydro import flow_accum, flow_pointer_d8

    dem = _hydem(spark)
    acc = flow_accum(flow_pointer_d8(dem))
    slp = R.explode_cells(R.focal(dem, "slope"), "slope_deg").where(
        F.col("slope_deg") != _ND
    )
    return (
        slp.join(acc, ["row", "col"], "inner")
        .where(F.col("slope_deg") > 0)
        .select(
            "row", "col",
            F.round(
                F.col("accum").cast("double") * F.tan(F.radians("slope_deg")), 6
            ).cast("double").alias("value"),
        )
        .orderBy("row", "col")
    )


# -- sediment transport index (§2.12; SedimentTransportIndex.java:253-254):
# (m+1) * (SCA/22.13)^m * (sin(slope)/0.0896)^n with the reference's
# canonical m = 0.4, n = 1.3.  POW is correctly-rounded libm on both engines;
# round(6) absorbs the last-ulp risk.
@Q.register(
    "sediment_transport",
    f"""WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES},
slp AS (
  SELECT row, col,
    (FLOOR(DEGREES(ATAN(SQRT(
      POW((n2 - n0 + 2e0 * (n4 - n3) + n7 - n5) / 8e0, 2) +
      POW((n5 - n0 + 2e0 * (n6 - n1) + n7 - n2) / 8e0, 2)))) * 1e6 + 0.5e0) / 1e6) AS slope_deg
  FROM w9
  WHERE cv IS NOT NULL AND n0 IS NOT NULL AND n1 IS NOT NULL AND n2 IS NOT NULL
    AND n3 IS NOT NULL AND n4 IS NOT NULL AND n5 IS NOT NULL AND n6 IS NOT NULL
    AND n7 IS NOT NULL
)
SELECT s.row, s.col,
  CAST(ROUND(1.4e0 * POW(CAST(a.accum AS DOUBLE) / 22.13e0, 0.4e0)
    * POW(SIN(RADIANS(s.slope_deg)) / 0.0896e0, 1.3e0), 6) AS DOUBLE) AS value
FROM slp s JOIN acc a ON a.row = s.row AND a.col = s.col
WHERE s.slope_deg > 0e0 ORDER BY s.row, s.col""",
)
def q_sediment_transport(spark, sf):
    from .operators.hydro import flow_accum, flow_pointer_d8

    dem = _hydem(spark)
    acc = flow_accum(flow_pointer_d8(dem))
    slp = R.explode_cells(R.focal(dem, "slope"), "slope_deg").where(
        F.col("slope_deg") != _ND
    )
    return (
        slp.join(acc, ["row", "col"], "inner")
        .where(F.col("slope_deg") > 0)
        .select(
            "row", "col",
            F.round(
                F.lit(1.4) * F.pow(F.col("accum").cast("double") / 22.13, 0.4)
                * F.pow(F.sin(F.radians("slope_deg")) / 0.0896, 1.3), 6
            ).cast("double").alias("value"),
        )
        .orderBy("row", "col")
    )


# -- Pennock landform classification (§2.5;
# Pennocks_Landform_Classification.java:299-330): 7 classes from profile /
# plan curvature and slope thresholds (prof ±0.1, plan 0, slope 3°).  The
# CASE branches run on the ROUND-6 kernel outputs so both engines classify
# identical inputs; class codes follow the reference (1=CFS .. 7=Level).
_PEN_SLOPE = f"(FLOOR(({_SLOPE_SQL}) * 1e6 + 0.5e0) / 1e6)"
_PEN_CASE = (
    "CASE WHEN prof < -0.1e0 AND plan <= 0e0 AND slope_d > 3e0 THEN 1 "
    "WHEN prof < -0.1e0 AND plan > 0e0 AND slope_d > 3e0 THEN 2 "
    "WHEN prof > 0.1e0 AND plan <= 0e0 AND slope_d > 3e0 THEN 3 "
    "WHEN prof > 0.1e0 AND plan > 0e0 AND slope_d > 3e0 THEN 4 "
    "WHEN prof >= -0.1e0 AND prof < 0.1e0 AND slope_d > 3e0 AND plan <= 0e0 THEN 5 "
    "WHEN prof >= -0.1e0 AND prof < 0.1e0 AND slope_d > 3e0 AND plan > 0e0 THEN 6 "
    "WHEN slope_d <= 3e0 THEN 7 END"
)


@Q.register(
    "pennock_landform",
    f"WITH {_RASF}, {_W9}, {_ZT}, "
    f"slp AS (SELECT row, col, {_PEN_SLOPE} AS slope_d FROM w9 {_FULLW}), "
    "cur AS (SELECT row, col, "
    "(FLOOR((CASE WHEN gq * gq + hq * hq = 0e0 THEN 0e0 "
    "ELSE 2e0 * (dq * hq * hq + eq * gq * gq - fq * gq * hq) / (gq * gq + hq * hq) END) "
    "* 1e6 + 0.5e0) / 1e6) AS plan, "
    "(FLOOR((CASE WHEN gq * gq + hq * hq = 0e0 THEN 0e0 "
    "ELSE -2e0 * (dq * gq * gq + eq * hq * hq + fq * gq * hq) / (gq * gq + hq * hq) END) "
    "* 1e6 + 0.5e0) / 1e6) AS prof FROM zt) "
    f"SELECT s.row, s.col, CAST({_PEN_CASE} AS BIGINT) AS landclass "
    "FROM slp s JOIN cur c ON c.row = s.row AND c.col = s.col "
    "ORDER BY s.row, s.col",
)
def q_pennock_landform(spark, sf):
    dem = _demf(spark)
    slp = R.explode_cells(R.focal(dem, "slope"), "slope_d").where(F.col("slope_d") != _ND)
    pln = R.explode_cells(R.focal(dem, "curv_plan"), "plan").where(F.col("plan") != _ND)
    prf = R.explode_cells(R.focal(dem, "curv_profile"), "prof").where(F.col("prof") != _ND)
    return (
        slp.join(pln, ["row", "col"]).join(prf, ["row", "col"])
        .select("row", "col",
                F.expr(_PEN_CASE.replace("slope_d", "slope_d")).cast("bigint").alias("landclass"))
        .orderBy("row", "col")
    )


# -- elevation relative to min/max (§2.5; ElevRelativeToMinMax.java):
# (z - zmin) / (zmax - zmin) against the GLOBAL raster extrema — the
# broadcast-scalar plan (two-row agg joined in, no collect).
@Q.register(
    "elev_rel_minmax",
    f"WITH {_RAS}, mm AS (SELECT MIN(value) AS zmin, MAX(value) AS zmax "
    f"FROM ras WHERE {_NDF}) "
    "SELECT row, col, CAST(ROUND((value - zmin) / (zmax - zmin), 6) AS DOUBLE) AS value "
    f"FROM ras, mm WHERE {_NDF} ORDER BY row, col",
)
def q_elev_rel_minmax(spark, sf):
    cells = R.explode_cells(_dem(spark)).where(F.col("value") != _ND)
    mm = cells.agg(F.min("value").alias("zmin"), F.max("value").alias("zmax"))
    return (
        cells.crossJoin(F.broadcast(mm))
        .select(
            "row", "col",
            F.round((F.col("value") - F.col("zmin"))
                    / (F.col("zmax") - F.col("zmin")), 6)
            .cast("double").alias("value"),
        )
        .orderBy("row", "col")
    )


# -- ridge cells (§2.5; FindRidges.java:196-215): cell is a ridge when its
# N-S neighbor pair OR its E-W pair are BOTH strictly lower.  Exact
# comparisons; full-window cells only (matching the stencil contract).
@Q.register(
    "find_ridges",
    f"WITH {_RASF}, {_W9} SELECT row, col, CAST(1 AS BIGINT) AS ridge "
    f"FROM w9 {_FULLW} AND ((nn < cv AND ss < cv) OR (wv < cv AND ev < cv)) "
    "ORDER BY row, col",
)
def q_find_ridges(spark, sf):
    out = _explode_focal(spark, "ridge")
    return (
        out.where(F.col("value") == 1.0)
        .select("row", "col", F.lit(1).cast("bigint").alias("ridge"))
        .orderBy("row", "col")
    )


# -- fetch analysis (§2.5; FetchAnalysis.java:311-383, east azimuth):
# distance to the first upwind cell whose elevation exceeds
# z + dist * heightIncrement (0.05); unobstructed profiles take the
# NEGATIVE distance to the grid edge, as the reference does.
@Q.register(
    "fetch_analysis",
    f"WITH {_RASF}, live AS (SELECT * FROM ras WHERE {_NDF}), "
    "mx AS (SELECT row, MAX(col) AS cmax FROM live GROUP BY 1), "
    "f AS (SELECT a.row, a.col, "
    "MIN(CASE WHEN b.value >= a.value + (b.col - a.col) * 0.05e0 "
    "THEN b.col - a.col END) AS hit "
    "FROM live a JOIN live b ON b.row = a.row AND b.col > a.col GROUP BY 1, 2) "
    "SELECT l.row, l.col, "
    "CAST(COALESCE(f.hit, -(m.cmax - l.col)) AS DOUBLE) AS fetch_dist "
    "FROM live l LEFT JOIN f ON f.row = l.row AND f.col = l.col "
    "JOIN mx m ON m.row = l.row WHERE l.col < m.cmax ORDER BY l.row, l.col",
)
def q_fetch_analysis(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    mx = live.groupBy("row").agg(F.max("col").alias("cmax"))
    b = live.select(F.col("row").alias("row"), F.col("col").alias("bcol"),
                    F.col("value").alias("bv"))
    hits = (
        live.join(b, "row")
        .where(F.col("bcol") > F.col("col"))
        .groupBy("row", "col")
        .agg(F.expr(
            "MIN(CASE WHEN bv >= value + (bcol - col) * 0.05e0 "
            "THEN bcol - col END)").alias("hit"))
    )
    return (
        live.join(hits, ["row", "col"], "left")
        .join(mx, "row")
        .where(F.col("col") < F.col("cmax"))
        .select(
            "row", "col",
            F.coalesce(F.col("hit"), -(F.col("cmax") - F.col("col")))
            .cast("double").alias("fetch_dist"),
        )
        .orderBy("row", "col")
    )


# -- directional relief (§2.5; DirectionalRelief.java, east azimuth): mean
# elevation difference between the cell and ALL cells along the azimuth
# ray: z - avg(z_east).  Suffix average is sum/count of dyadic cells —
# round(6) absorbs the division.
@Q.register(
    "directional_relief",
    f"WITH {_RASF}, live AS (SELECT * FROM ras WHERE {_NDF}) "
    "SELECT a.row, a.col, "
    "CAST(ROUND(a.value - SUM(b.value) / COUNT(*), 6) AS DOUBLE) AS relief "
    "FROM live a JOIN live b ON b.row = a.row AND b.col > a.col "
    "GROUP BY 1, 2, a.value ORDER BY 1, 2",
)
def q_directional_relief(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    b = live.select(F.col("row").alias("row"), F.col("col").alias("bcol"),
                    F.col("value").alias("bv"))
    return (
        live.join(b, "row")
        .where(F.col("bcol") > F.col("col"))
        .groupBy("row", "col", "value")
        .agg((F.sum("bv") / F.count(F.lit(1))).alias("_m"))
        .select(
            "row", "col",
            F.round(F.col("value") - F.col("_m"), 6).cast("double").alias("relief"),
        )
        .orderBy("row", "col")
    )


# -- elevation relative to watershed min/max (§2.12;
# ElevRelativeToWatershedMinMax.java): (z - ws_min) / (ws_max - ws_min)
# with the extrema taken over each cell's watershed — the watershed labels
# composed with a per-label extrema groupBy (single-cell basins -> 0).
@Q.register(
    "elev_rel_watershed",
    f"WITH RECURSIVE {_HYD_BASE}, "
    "edges AS (SELECT row * 1000000 + col AS id, "
    "(row + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1 "
    "WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END) * 1000000 + "
    "(col + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 1 "
    "WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END) AS nid "
    "FROM d8 WHERE code > 0), "
    "terminals AS (SELECT row * 1000000 + col AS id FROM d8 WHERE code = 0), "
    "walk(id, cur) AS (SELECT id, id FROM (SELECT row * 1000000 + col AS id FROM d8) "
    "UNION SELECT w.id, e.nid FROM walk w JOIN edges e ON e.id = w.cur), "
    "root AS (SELECT w.id, w.cur AS ws FROM walk w JOIN terminals t ON w.cur = t.id), "
    "zc AS (SELECT r.id, r.ws, l.v AS z FROM root r "
    "JOIN live l ON l.row * 1000000 + l.col = r.id WHERE l.v IS NOT NULL), "
    "ext AS (SELECT ws, MIN(z) AS zmin, MAX(z) AS zmax FROM zc GROUP BY 1) "
    "SELECT CAST(FLOOR(zc.id / 1000000) AS BIGINT) AS row, "
    "CAST(zc.id % 1000000 AS BIGINT) AS col, "
    "CAST(CASE WHEN e.zmax = e.zmin THEN 0e0 "
    "ELSE ROUND((zc.z - e.zmin) / (e.zmax - e.zmin), 6) END AS DOUBLE) AS value "
    "FROM zc JOIN ext e USING (ws) ORDER BY row, col",
)
def q_elev_rel_watershed(spark, sf):
    from .operators.hydro import flow_pointer_d8, watershed

    dem = _hydem(spark)
    ws = watershed(flow_pointer_d8(dem))
    z = R.explode_cells(dem).where(F.col("value") != _ND)
    wz = ws.join(z, ["row", "col"])
    ext = wz.groupBy("ws").agg(F.min("value").alias("zmin"),
                               F.max("value").alias("zmax"))
    return (
        wz.join(ext, "ws")
        .select(
            "row", "col",
            F.when(F.col("zmax") == F.col("zmin"), F.lit(0.0))
            .otherwise(F.round((F.col("value") - F.col("zmin"))
                               / (F.col("zmax") - F.col("zmin")), 6)
                       .cast("double")).alias("value"),
        )
        .orderBy("row", "col")
    )


# -- composed 3x3 convolutions (§2.5/§2.13: FilterDoG.java, FilterLoG.java) ---
# DoG/LoG with only 1-cell halos: the wide Gaussian is the 3x3 binomial
# applied twice (5x5 effective support), so both filters are compositions of
# the existing halo-strip stencil runner — two focal passes, each a single
# strip exchange, no new shuffle shape.  Each pass rounds half-up to 6
# decimals (the shared float policy), replicated in the oracle's g1 CTE.
_G3 = "(nw + 2e0 * nn + ne + 2e0 * wv + 4e0 * cv + 2e0 * ev + sw + 2e0 * ss + se) / 16e0"


def _w9_over(src: str, out: str) -> str:
    """The _W9 window fragment re-targeted at another CTE's (row,col,value)."""
    return (_W9.replace("w9 AS", f"{out} AS")
               .replace("FROM ras a JOIN ras b", f"FROM {src} a JOIN {src} b"))


_G1_CTE = (
    f"g1 AS (SELECT row, col, (FLOOR(({_G3}) * 1e6 + 0.5e0) / 1e6) AS value "
    f"FROM w9 {_FULLW})"
)
_FULLW2 = (
    "WHERE nw IS NOT NULL AND nn IS NOT NULL AND ne IS NOT NULL AND wv IS NOT NULL "
    "AND ev IS NOT NULL AND sw IS NOT NULL AND ss IS NOT NULL AND se IS NOT NULL "
)


@Q.register(
    "focal_dog",
    f"WITH {_RASF}, {_W9}, {_G1_CTE}, {_w9_over('g1', 'w9b')} "
    f"SELECT row, col, (cv - (FLOOR(({_G3}) * 1e6 + 0.5e0) / 1e6)) AS value "
    f"FROM w9b {_FULLW2} ORDER BY row, col",
)
def q_focal_dog(spark, sf):
    g1 = R.focal(_demf(spark), "gaussian")
    g2 = R.focal(g1, "gaussian")
    a = R.explode_cells(g1, "g1v")
    b = R.explode_cells(g2, "g2v")
    return (
        a.join(b, ["row", "col"])
        .where((F.col("g1v") != _ND) & (F.col("g2v") != _ND))
        .select("row", "col", (F.col("g1v") - F.col("g2v")).alias("value"))
        .orderBy("row", "col")
    )


@Q.register(
    "focal_log",
    f"WITH {_RASF}, {_W9}, {_G1_CTE}, {_w9_over('g1', 'w9b')} "
    "SELECT row, col, (FLOOR((4e0 * cv - nn - ss - wv - ev) * 1e6 + 0.5e0) / 1e6) AS value "
    f"FROM w9b {_FULLW2} ORDER BY row, col",
)
def q_focal_log(spark, sf):
    g1 = R.focal(_demf(spark), "gaussian")
    out = R.explode_cells(R.focal(g1, "laplacian"))
    return out.where(F.col("value") != _ND).orderBy("row", "col")


# -- morphological opening / closing (§2.5; ClosingFilter.java,
# OpeningFilter.java) — erode/dilate composition over the binary indicator,
# same available-window min/max semantics as `morphology`.
_IND_CTE = (
    "ind AS (SELECT row, col, CASE WHEN value > 100e0 THEN 1e0 ELSE 0e0 END AS value "
    f"FROM ras WHERE value != {NODATA!r}e0)"
)


def _minmax_cte(src: str, out: str, agg: str) -> str:
    return (
        f"{out} AS (SELECT a.row AS row, a.col AS col, {agg}(b.value) AS value "
        f"FROM {src} a JOIN {src} b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
        "AND b.col BETWEEN a.col - 1 AND a.col + 1 GROUP BY 1, 2)"
    )


@Q.register(
    "morph_open",
    f"WITH {_RASF}, {_IND_CTE}, {_minmax_cte('ind', 'er', 'MIN')}, "
    f"{_minmax_cte('er', 'op', 'MAX')} "
    "SELECT row, col, CAST(value AS BIGINT) AS value FROM op ORDER BY row, col",
)
def q_morph_open(spark, sf):
    ind = R.map_algebra(_demf(spark), "CASE WHEN v > 100e0 THEN 1e0 ELSE 0e0 END")
    out = R.explode_cells(R.focal(R.focal(ind, "min"), "max"))
    return (
        out.where(F.col("value") != _ND)
        .select("row", "col", F.col("value").cast("bigint").alias("value"))
        .orderBy("row", "col")
    )


@Q.register(
    "morph_close",
    f"WITH {_RASF}, {_IND_CTE}, {_minmax_cte('ind', 'di', 'MAX')}, "
    f"{_minmax_cte('di', 'cl', 'MIN')} "
    "SELECT row, col, CAST(value AS BIGINT) AS value FROM cl ORDER BY row, col",
)
def q_morph_close(spark, sf):
    ind = R.map_algebra(_demf(spark), "CASE WHEN v > 100e0 THEN 1e0 ELSE 0e0 END")
    out = R.explode_cells(R.focal(R.focal(ind, "max"), "min"))
    return (
        out.where(F.col("value") != _ND)
        .select("row", "col", F.col("value").cast("bigint").alias("value"))
        .orderBy("row", "col")
    )


# -- conservative smoothing (§2.5; FilterConservativeSmoothing.java:170-213) --
@Q.register(
    "focal_conservative",
    f"WITH {_RASF}, {_NBR2}, nb AS (SELECT row, col, av, bv FROM nbr2 "
    f"WHERE NOT is_c AND bv != {NODATA!r}e0) "
    "SELECT row, col, CASE WHEN MAX(av) > MAX(bv) THEN MAX(bv) "
    "WHEN MAX(av) < MIN(bv) THEN MIN(bv) ELSE MAX(av) END AS value "
    "FROM nb GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_focal_conservative(spark, sf):
    return _explode_focal(spark, "conservative")


# -- difference from mean elevation (§2.5;
# DifferenceFromMeanElevation.java:175-198): z - 3x3 window mean -------------
@Q.register(
    "diff_from_mean",
    f"WITH {_RASF}, {_NBR2} SELECT row, col, "
    f"(MAX(av) - (SUM(bv) FILTER (bv != {NODATA!r}e0)) "
    f"/ (COUNT(*) FILTER (bv != {NODATA!r}e0))) AS value "
    "FROM nbr2 GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_diff_from_mean(spark, sf):
    return _explode_focal(spark, "difffrommean")


# -- elevation above the draining pit (§2.12; ElevAbovePit.java:162-218) ------
# z - z(pit): the D8 walk terminal is each basin's pit; composition of the
# watershed labeling (tile-Kahn + condensed graph) with one equi-join back
# onto the elevation table keyed by the pit id — both sides shuffle on ws,
# no driver work beyond what watershed already does.
_WS_WALK = (
    "edges AS (SELECT row * 1000000 + col AS id, "
    "(row + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1 "
    "WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END) * 1000000 + "
    "(col + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 1 "
    "WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END) AS nid "
    "FROM d8 WHERE code > 0), "
    "terminals AS (SELECT row * 1000000 + col AS id FROM d8 WHERE code = 0), "
    "walk(id, cur) AS (SELECT id, id FROM (SELECT row * 1000000 + col AS id FROM d8) "
    "UNION SELECT w.id, e.nid FROM walk w JOIN edges e ON e.id = w.cur), "
    "root AS (SELECT w.id, w.cur AS ws FROM walk w JOIN terminals t ON w.cur = t.id)"
)


@Q.register(
    "elev_above_pit",
    f"WITH RECURSIVE {_HYD_BASE}, {_WS_WALK}, "
    "zc AS (SELECT r.id, r.ws, l.v AS z FROM root r "
    "JOIN live l ON l.row * 1000000 + l.col = r.id WHERE l.v IS NOT NULL), "
    "zp AS (SELECT l2.row * 1000000 + l2.col AS ws, l2.v AS zpit FROM live l2 "
    "WHERE l2.v IS NOT NULL) "
    "SELECT CAST(FLOOR(zc.id / 1000000) AS BIGINT) AS row, "
    "CAST(zc.id % 1000000 AS BIGINT) AS col, "
    "(zc.z - p.zpit) AS value "
    "FROM zc JOIN zp p USING (ws) ORDER BY row, col",
)
def q_elev_above_pit(spark, sf):
    from .operators.hydro import flow_pointer_d8, watershed

    dem = _hydem(spark)
    ws = watershed(flow_pointer_d8(dem))
    z = R.explode_cells(dem).where(F.col("value") != _ND)
    wz = ws.join(z, ["row", "col"])
    zp = z.select((F.col("row") * 1000000 + F.col("col")).alias("ws"),
                  F.col("value").alias("zpit"))
    return (
        wz.join(zp, "ws")
        .select("row", "col", (F.col("value") - F.col("zpit")).alias("value"))
        .orderBy("row", "col")
    )


# -- raster patch statistics (§2.4 patch-shape family over clump labels:
# GISTools RadiusOfGyration.java, LinearityIndex.java, PatchOrientation.java,
# EdgeProportion.java) — per-patch aggregates over the connected-component
# labeling; one clump pass + Catalyst-only moment aggregations (integer cell
# coords -> exact sums; only the final transcendental/ordered outputs round).
def _patch_cells(spark):
    from .operators.clump import clump

    cells = (
        R.explode_cells(R.synth_raster(spark, _CROWS, _CCOLS))
        .where(F.col("value") != _ND)
        .select("row", "col",
                F.expr("CAST(FLOOR(value / 50e0) AS BIGINT)").alias("cls"))
    )
    return clump(cells, _CCOLS)


@Q.register(
    "radius_gyration",
    f"WITH RECURSIVE {_CBASE}, "
    "pc AS (SELECT b.cls, l.label, b.row, b.col FROM base b JOIN lab l USING (id)), "
    "cent AS (SELECT cls, label, SUM(col) / COUNT(*) AS cx, "
    "SUM(row) / COUNT(*) AS cy, COUNT(*) AS n FROM pc GROUP BY 1, 2) "
    "SELECT p.cls, p.label, CAST(ROUND(SUM(SQRT((p.col - c.cx) * (p.col - c.cx) "
    "+ (p.row - c.cy) * (p.row - c.cy))) / MAX(c.n), 6) AS DOUBLE) AS gyradius "
    "FROM pc p JOIN cent c ON c.cls = p.cls AND c.label = p.label "
    "GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_radius_gyration(spark, sf):
    """RadiusOfGyration.java:245-296: mean distance of patch cells from the
    patch centroid (integer coord sums exact; ordered sqrt-sum rounds 6)."""
    pc = _patch_cells(spark)
    cent = pc.groupBy("cls", "label").agg(
        (F.sum("col") / F.count(F.lit(1))).alias("cx"),
        (F.sum("row") / F.count(F.lit(1))).alias("cy"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        pc.join(cent, ["cls", "label"])
        .groupBy("cls", "label")
        .agg(F.round(
            F.sum(F.sqrt((F.col("col") - F.col("cx")) * (F.col("col") - F.col("cx"))
                         + (F.col("row") - F.col("cy")) * (F.col("row") - F.col("cy"))))
            / F.max("n"), 6).cast("double").alias("gyradius"))
        .orderBy("cls", "label")
    )


_PATCH_MOM = (
    "mom AS (SELECT cls, label, COUNT(*) AS n, SUM(col) AS sx, SUM(row) AS sy, "
    "SUM(col * row) AS sxy, SUM(col * col) AS sxx, SUM(row * row) AS syy "
    "FROM pc GROUP BY 1, 2)"
)
# central second moments (translation-invariant, so raw coords match the
# reference's min-offset coords exactly on integer sums)
_SXXC = "(sxx - CAST(sx AS DOUBLE) * sx / n)"
_SYYC = "(syy - CAST(sy AS DOUBLE) * sy / n)"
_SXYC = "(sxy - CAST(sx AS DOUBLE) * sy / n)"


@Q.register(
    "linearity_index",
    f"WITH RECURSIVE {_CBASE}, "
    "pc AS (SELECT b.cls, l.label, b.row, b.col FROM base b JOIN lab l USING (id)), "
    f"{_PATCH_MOM} "
    "SELECT cls, label, CAST(CASE WHEN n > 1 AND {sxx} * {syy} > 0e0 THEN "
    "ROUND(({sxy} / SQRT({sxx} * {syy})) * ({sxy} / SQRT({sxx} * {syy})), 6) "
    "ELSE 0e0 END AS DOUBLE) AS linearity "
    "FROM mom ORDER BY cls, label".format(sxx=_SXXC, syy=_SYYC, sxy=_SXYC),
)
def q_linearity_index(spark, sf):
    """LinearityIndex.java:280-321: r-squared of the patch-cell col~row
    regression (0 for single-cell or degenerate patches)."""
    pc = _patch_cells(spark)
    mom = pc.groupBy("cls", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("col").alias("sx"),
        F.sum("row").alias("sy"),
        F.sum(F.col("col") * F.col("row")).alias("sxy"),
        F.sum(F.col("col") * F.col("col")).alias("sxx"),
        F.sum(F.col("row") * F.col("row")).alias("syy"),
    )
    expr = (
        "CAST(CASE WHEN n > 1 AND {sxx} * {syy} > 0e0 THEN "
        "ROUND(({sxy} / SQRT({sxx} * {syy})) * ({sxy} / SQRT({sxx} * {syy})), 6) "
        "ELSE 0e0 END AS DOUBLE)"
    ).format(sxx=_SXXC, syy=_SYYC, sxy=_SXYC)
    return mom.select("cls", "label", F.expr(expr).alias("linearity")) \
              .orderBy("cls", "label")


@Q.register(
    "patch_orientation",
    f"WITH RECURSIVE {_CBASE}, "
    "pc AS (SELECT b.cls, l.label, b.row, b.col FROM base b JOIN lab l USING (id)), "
    f"{_PATCH_MOM} "
    "SELECT cls, label, CAST(CASE WHEN n > 1 AND {sxx} > 0e0 THEN "
    "FLOOR((90e0 - DEGREES(ATAN(-({sxy}) / ({sxx})))) * 1e6 + 0.5e0) / 1e6 "
    "ELSE 0e0 END AS DOUBLE) AS orientation "
    "FROM mom ORDER BY cls, label".format(sxx=_SXXC, sxy=_SXYC),
)
def q_patch_orientation(spark, sf):
    """PatchOrientation.java:280-301 (raster regression form): long-axis
    orientation 90 - atan(-Sxy/Sxx) degrees; 0 for degenerate patches."""
    pc = _patch_cells(spark)
    mom = pc.groupBy("cls", "label").agg(
        F.count(F.lit(1)).alias("n"), F.sum("col").alias("sx"),
        F.sum("row").alias("sy"),
        F.sum(F.col("col") * F.col("row")).alias("sxy"),
        F.sum(F.col("col") * F.col("col")).alias("sxx"),
    )
    expr = (
        "CAST(CASE WHEN n > 1 AND {sxx} > 0e0 THEN "
        "FLOOR((90e0 - DEGREES(ATAN(-({sxy}) / ({sxx})))) * 1e6 + 0.5e0) / 1e6 "
        "ELSE 0e0 END AS DOUBLE)"
    ).format(sxx=_SXXC, sxy=_SXYC)
    return mom.select("cls", "label", F.expr(expr).alias("orientation")) \
              .orderBy("cls", "label")


@Q.register(
    "edge_proportion",
    f"WITH RECURSIVE {_CBASE}, "
    "pc AS (SELECT b.cls, l.label, b.row, b.col, b.id FROM base b JOIN lab l USING (id)), "
    "edge AS (SELECT p.cls, p.label, p.id, "
    "MAX(CASE WHEN q.id IS NULL OR ql.label != p.label THEN 1 ELSE 0 END) AS is_edge "
    "FROM pc p CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)) o(dr, dc) "
    f"LEFT JOIN base q ON q.row = p.row + o.dr AND q.col = p.col + o.dc "
    "LEFT JOIN lab ql ON ql.id = q.id "
    "GROUP BY 1, 2, 3) "
    "SELECT cls, label, CAST(SUM(is_edge) AS DOUBLE) / COUNT(*) AS edge_prop "
    "FROM edge GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_edge_proportion(spark, sf):
    """EdgeProportion.java:213-248: fraction of patch cells with any
    8-neighbor outside the patch (off-grid / nodata neighbors count)."""
    pc = _patch_cells(spark)
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    o = F.explode(F.array(*[
        F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc")) for dr, dc in offs
    ])).alias("_o")
    probes = pc.select("cls", "label", "row", "col", o).select(
        "cls", "label", "row", "col",
        (F.col("row") + F.col("_o.dr")).alias("nr"),
        (F.col("col") + F.col("_o.dc")).alias("nc"),
    )
    nb = pc.select(F.col("row").alias("nr"), F.col("col").alias("nc"),
                   F.col("label").alias("nlabel"))
    edge = (
        probes.join(nb, ["nr", "nc"], "left")
        .groupBy("cls", "label", "row", "col")
        .agg(F.max(
            F.when(F.col("nlabel").isNull()
                   | (F.col("nlabel") != F.col("label")), 1).otherwise(0)
        ).alias("is_edge"))
    )
    return (
        edge.groupBy("cls", "label")
        .agg((F.sum("is_edge").cast("double") / F.count(F.lit(1))).alias("edge_prop"))
        .orderBy("cls", "label")
    )


# -- random field / random sample (§2.6 row 69; StatsTools RandomField.java
# / RandomSample.java) -- the reference fills a raster with java.util.Random
# draws; the engine's determinization is the shared integer LCG chain
# (functions/exprs.py), so both engines generate the IDENTICAL field and the
# sample is reproducible (the published tools' own outputs are not).
_RF_KEY = "(row * 1000003 + col)"
_RF_U = f"((({_RF_KEY} * {A} % {M}) + {C}) * {A}) % {M}"
_RF_EXPR = f"(CAST({_RF_U} AS DOUBLE) / {M}e0)"
_RS_N = 97


@Q.register(
    "random_field",
    f"WITH {_RASF} SELECT row, col, {_RF_EXPR} AS u FROM ras "
    "ORDER BY row, col",
)
def q_random_field(spark, sf):
    return (
        R.explode_cells(_demf(spark))
        .select("row", "col", F.expr(_RF_EXPR).alias("u"))
        .orderBy("row", "col")
    )


@Q.register(
    "random_sample",
    f"WITH {_RASF}, fld AS (SELECT row, col, {_RF_EXPR} AS u FROM ras), "
    f"pick AS (SELECT * FROM fld ORDER BY u, row, col LIMIT {_RS_N}) "
    "SELECT row, col, u FROM pick ORDER BY row, col",
)
def q_random_sample(spark, sf):
    # orderBy().limit() compiles to TakeOrderedAndProject — a distributed
    # top-k (per-partition heads + driver merge), not a global sort
    fld = (
        R.explode_cells(_demf(spark))
        .select("row", "col", F.expr(_RF_EXPR).alias("u"))
    )
    return fld.orderBy("u", "row", "col").limit(_RS_N).orderBy("row", "col")


# -- ChangeDataScale / ChangeDataType (§2.2 row 21; GISTools
# ChangeDataScale.java, ChangeDataType.java): linear rescale with nodata
# pass-through plus the integer-type conversion (half-up).  Scale 0.25 keeps
# the dyadic cell values exact; the int cast shares the floor(x+0.5) idiom.
@Q.register(
    "change_data_scale",
    f"WITH {_RASF} SELECT row, col, value * 0.25e0 + 100e0 AS scaled, "
    "CAST(FLOOR(value * 0.25e0 + 100e0 + 0.5e0) AS BIGINT) AS as_int "
    f"FROM ras WHERE {_NDF} ORDER BY row, col",
)
def q_change_data_scale(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    return live.select(
        "row", "col",
        (F.col("value") * 0.25 + 100.0).alias("scaled"),
        F.floor(F.col("value") * 0.25 + 100.0 + 0.5).cast("long").alias("as_int"),
    ).orderBy("row", "col")


# -- ClipRasterToPolygon / Erase as named tools (§2.3 row 34, §2.7 row 74;
# GISTools ClipRasterToPolygon.java, Erase.java): keep (or blank) the cells
# whose CENTER falls inside the polygon layer — the reference's
# cell-center-in-polygon rule (VectorPolygonsToRaster.java:400-470 even-odd
# crossings).  Cell centers map onto the polygon extent exactly
# (lon = 2*col+1, lat = 1.5*row+0.75 — dyadic), and the big side routes
# through the broadcast classified cell index (pip_semi), never a shuffle.
_CLIP_CELLS = (
    f"cells AS (SELECT row, col, value, CAST(2 * col + 1 AS DOUBLE) AS lon, "
    f"1.5e0 * row + 0.75e0 AS lat FROM ras WHERE {_NDF})"
)
_CLIP_PIP = """
clip_pp AS (
  SELECT p.row, p.col, e.poly_id,
    SUM(CASE WHEN ((e.y1 > p.lat) != (e.y2 > p.lat))
             AND (p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1)
        THEN 1 ELSE 0 END) % 2 AS pp
  FROM cells p JOIN edges e ON TRUE
  GROUP BY 1, 2, 3
),
clip_raw AS (SELECT row, col, MAX(pp) AS par FROM clip_pp GROUP BY 1, 2)"""


def _clip_cells_df(spark):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    return live.select(
        "row", "col", "value",
        (2.0 * F.col("col") + 1.0).alias("lon"),
        (1.5 * F.col("row") + 0.75).alias("lat"),
        (F.col("row") * FCOLS + F.col("col")).alias("_cid"),
        F.lit(0).cast("long").alias("tile_id"),  # pip_join projects tile_id
    )


def _q_clip_raster(spark, negate: bool):
    from .operators.spatial_join import pip_semi

    kept = pip_semi(_clip_cells_df(spark), spark, "_cid", negate=negate)
    return kept.select("row", "col", "value").orderBy("row", "col")


from . import queries as _QQ  # noqa: E402  (edges_cte for the clip oracles)


@Q.register(
    "clip_raster_to_polygon",
    f"WITH {_RASF}, {_CLIP_CELLS}, {_QQ.edges_cte()}, {_CLIP_PIP} "
    "SELECT c.row, c.col, c.value FROM cells c JOIN clip_raw r "
    "ON r.row = c.row AND r.col = c.col WHERE r.par = 1 ORDER BY 1, 2",
)
def q_clip_raster_to_polygon(spark, sf):
    return _q_clip_raster(spark, negate=False)


@Q.register(
    "erase_raster",
    f"WITH {_RASF}, {_CLIP_CELLS}, {_QQ.edges_cte()}, {_CLIP_PIP} "
    "SELECT c.row, c.col, c.value FROM cells c JOIN clip_raw r "
    "ON r.row = c.row AND r.col = c.col WHERE r.par = 0 ORDER BY 1, 2",
)
def q_erase_raster(spark, sf):
    return _q_clip_raster(spark, negate=True)


# -- edge-preserving (bilateral) smoothing (§2.5 row 59;
# FilterEdgePreservingSmoothing.java:235-290): normalized distance x
# intensity Gaussian weights, sigma_d = 1 / sigma_i = 10.  Transcendental
# weights -> shared half-up round(6); the 9-term weighted sums agree to
# well under 1e-6 across engines.
@Q.register(
    "focal_bilateral",
    f"WITH {_RASF}, nbrb AS (SELECT a.row, a.col, a.value AS av, b.value AS bv, "
    "b.row - a.row AS dr, b.col - a.col AS dc "
    "FROM ras a JOIN ras b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
    "AND b.col BETWEEN a.col - 1 AND a.col + 1 "
    f"WHERE a.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0), "
    "wt AS (SELECT row, col, bv, EXP(-(dr * dr + dc * dc) / 2e0) * "
    "EXP(-((bv - av) * (bv - av)) / 200e0) AS w FROM nbrb) "
    "SELECT row, col, FLOOR(SUM(w * bv) / SUM(w) * 1e6 + 0.5e0) / 1e6 AS value "
    "FROM wt GROUP BY 1, 2 ORDER BY row, col",
)
def q_focal_bilateral(spark, sf):
    return _explode_focal(spark, "bilateral")


# -- RGB colour composite (§2.13 row 113; ImageProcessingTools
# CreateColourComposite.java:279-300): per-band min-max stretch to 0..255
# (truncating int cast, clamped) packed as (255<<24)|(b<<16)|(g<<8)|r.
# Per-band extrema are broadcast scalars (one partial-agg exchange each);
# the pack is pure integer arithmetic.
# explicit FLOOR: the reference truncates via (int) cast; a bare CAST
# truncates in Spark but ROUNDS in DuckDB
_CC_CH = ("CAST(FLOOR(({v} - {lo}) / ({hi} - {lo}) * 255e0) AS BIGINT)")


def _cc_clamp(x: str) -> str:
    return f"LEAST(GREATEST({x}, 0), 255)"


@Q.register(
    "colour_composite",
    f"""WITH {_RAS}, {_RAS2}, {_RAS3},
j AS (SELECT r.row, r.col, r.value AS rv, g.value AS gv, b.value AS bv
      FROM ras r JOIN ras2 g USING (row, col) JOIN ras3 b USING (row, col)
      WHERE r.value != {NODATA!r}e0 AND g.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0),
mm AS (SELECT MIN(rv) AS rlo, MAX(rv) AS rhi, MIN(gv) AS glo, MAX(gv) AS ghi,
       MIN(bv) AS blo, MAX(bv) AS bhi FROM j)
SELECT row, col, 4278190080 + {_cc_clamp(_CC_CH.format(v='bv', lo='blo', hi='bhi'))} * 65536
  + {_cc_clamp(_CC_CH.format(v='gv', lo='glo', hi='ghi'))} * 256
  + {_cc_clamp(_CC_CH.format(v='rv', lo='rlo', hi='rhi'))} AS argb
FROM j, mm ORDER BY row, col""",
)
def q_colour_composite(spark, sf):
    r = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "rv")
    g = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "gv")
    b = R.explode_cells(_dem(spark, 2)).withColumnRenamed("value", "bv")
    j = (
        r.join(g, ["row", "col"]).join(b, ["row", "col"])
        .where((F.col("rv") != _ND) & (F.col("gv") != _ND) & (F.col("bv") != _ND))
    )
    mm = j.agg(
        F.min("rv").alias("rlo"), F.max("rv").alias("rhi"),
        F.min("gv").alias("glo"), F.max("gv").alias("ghi"),
        F.min("bv").alias("blo"), F.max("bv").alias("bhi"),
    )
    ch = lambda v, lo, hi: F.expr(_cc_clamp(_CC_CH.format(v=v, lo=lo, hi=hi)))
    return (
        j.crossJoin(F.broadcast(mm))
        .select(
            "row", "col",
            (F.lit(4278190080) + ch("bv", "blo", "bhi") * 65536
             + ch("gv", "glo", "ghi") * 256 + ch("rv", "rlo", "rhi")).alias("argb"),
        )
        .orderBy("row", "col")
    )


# -- MinDownslopeElevationChange (§2.5; TerrainAnalysisTools
# MinDownslopeElevationChange.java:240-266): the drop along the GENTLEST
# non-negative downslope direction (slope = drop / distance); 0 when the
# cell has no downslope neighbor.  Tie-break = the reference's scan order
# NE,E,SE,S,SW,W,NW,N, realized as a first-match CASE cascade here and a
# first-occurrence argmin in the tile kernel.
_MDC_SQ2 = "1.4142135623730951e0"
_MDC_S = {
    "ne": f"(cv - ne) / {_MDC_SQ2}", "ev": "(cv - ev)",
    "se": f"(cv - se) / {_MDC_SQ2}", "ss": "(cv - ss)",
    "sw": f"(cv - sw) / {_MDC_SQ2}", "wv": "(cv - wv)",
    "nw": f"(cv - nw) / {_MDC_SQ2}", "nn": "(cv - nn)",
}
_MDC_DEFS = ", ".join(
    f"CASE WHEN {e} >= 0e0 THEN {e} END AS s_{n}" for n, e in _MDC_S.items()
)
_MDC_PICK = (
    "CASE WHEN m IS NULL THEN 0e0 "
    + " ".join(f"WHEN s_{n} = m THEN cv - {n}" for n in _MDC_S)
    + " END"
)


@Q.register(
    "min_downslope_change",
    f"WITH {_RASF}, {_W9}, sl AS (SELECT row, col, cv, nw, nn, ne, wv, ev, sw, ss, se, "
    f"{_MDC_DEFS} FROM w9 {_FULLW}), "
    "mm AS (SELECT *, LEAST(s_ne, s_ev, s_se, s_ss, s_sw, s_wv, s_nw, s_nn) AS m FROM sl) "
    f"SELECT row, col, (FLOOR(({_MDC_PICK}) * 1e6 + 0.5e0) / 1e6) AS value "
    "FROM mm ORDER BY row, col",
)
def q_min_downslope_change(spark, sf):
    return _explode_focal(spark, "mindrop")


# -- small named HydroTools: FillPits / FindNoFlowCells /
# NumInflowingNeighbours / FindParallelFlow / BurnStreams /
# JensonSnapPourPoints -----------------------------------------------------
_FP_EPS = "2.44140625e-4"  # 2^-12, dyadic (determinizes FillPits aSmallValue)
_D8_OUT = (
    "CASE WHEN {dr} = -1 AND {dc} = -1 THEN 1 WHEN {dr} = -1 AND {dc} = 0 THEN 2 "
    "WHEN {dr} = -1 AND {dc} = 1 THEN 4 WHEN {dr} = 0 AND {dc} = -1 THEN 8 "
    "WHEN {dr} = 0 AND {dc} = 1 THEN 16 WHEN {dr} = 1 AND {dc} = -1 THEN 32 "
    "WHEN {dr} = 1 AND {dc} = 0 THEN 64 ELSE 128 END"
)
_D8_TGT_DR = ("CASE WHEN code IN (1, 2, 4) THEN -1 WHEN code IN (8, 16) THEN 0 "
              "ELSE 1 END")
_D8_TGT_DC = ("CASE WHEN code IN (1, 8, 32) THEN -1 WHEN code IN (2, 64) THEN 0 "
              "ELSE 1 END")


# FillPits.java:208-230: raise each single-cell pit (every PRESENT neighbor
# strictly higher) to its lowest neighbor + eps; everything else unchanged.
@Q.register(
    "fill_pits",
    f"WITH {_HYD_BASE} SELECT row, col, "
    "CASE WHEN LEAST(n0, n1, n2, n3, n4, n5, n6, n7) > cv "
    f"THEN LEAST(n0, n1, n2, n3, n4, n5, n6, n7) + {_FP_EPS} ELSE cv END AS filled "
    "FROM w9 ORDER BY row, col",
)
def q_fill_pits(spark, sf):
    cells = R.explode_cells(_hydem(spark)).where(F.col("value") != _ND)
    mn = (
        R.explode_cells(R.focal(_hydem(spark), "minnbr"))
        .where(F.col("value") != _ND)
        .withColumnRenamed("value", "mn")
    )
    return (
        cells.join(mn, ["row", "col"], "left")
        .select(
            "row", "col",
            F.expr(f"CASE WHEN mn > value THEN mn + {_FP_EPS} "
                   "ELSE value END").alias("filled"),
        )
        .orderBy("row", "col")
    )


# FindNoFlowCells.java: cells whose D8 pointer is 0 (pits/flats)
@Q.register(
    "find_noflow",
    f"WITH {_HYD_BASE} SELECT row, col FROM d8 WHERE code = 0 ORDER BY row, col",
)
def q_find_noflow(spark, sf):
    from .operators.hydro import flow_pointer_d8

    return (
        flow_pointer_d8(_hydem(spark))
        .where(F.col("code") == 0).select("row", "col").orderBy("row", "col")
    )


# NumInflowingNeighbours.java: count of 8-neighbors whose pointer targets
# the cell — a groupBy on the DECODED pointer target (one shuffle on the
# target key; no neighborhood join at all)
@Q.register(
    "num_inflowing",
    f"WITH {_HYD_BASE}, tg AS (SELECT row + {_D8_TGT_DR} AS trow, "
    f"col + {_D8_TGT_DC} AS tcol FROM d8 WHERE code > 0), "
    "cnt AS (SELECT trow, tcol, COUNT(*) AS n FROM tg GROUP BY 1, 2) "
    "SELECT d.row, d.col, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_inflow "
    "FROM d8 d LEFT JOIN cnt c ON c.trow = d.row AND c.tcol = d.col "
    "ORDER BY d.row, d.col",
)
def q_num_inflowing(spark, sf):
    from .operators.hydro import flow_pointer_d8

    ptr = flow_pointer_d8(_hydem(spark))
    tg = ptr.where(F.col("code") > 0).select(
        (F.col("row") + F.expr(_D8_TGT_DR)).alias("trow"),
        (F.col("col") + F.expr(_D8_TGT_DC)).alias("tcol"),
    )
    cnt = tg.groupBy("trow", "tcol").agg(F.count(F.lit(1)).alias("n"))
    return (
        ptr.join(cnt, (F.col("trow") == F.col("row")) & (F.col("tcol") == F.col("col")), "left")
        .select("row", "col", F.coalesce("n", F.lit(0)).cast("long").alias("n_inflow"))
        .orderBy("row", "col")
    )


# FindParallelFlow.java:230-255: a cell flows parallel when some neighbor
# (that is neither its downslope target nor an inflowing cell) carries the
# SAME pointer code
_PF_OUT = _D8_OUT.format(dr="(b.row - a.row)", dc="(b.col - a.col)")
_PF_IN = _D8_OUT.format(dr="(a.row - b.row)", dc="(a.col - b.col)")


@Q.register(
    "find_parallel_flow",
    f"WITH {_HYD_BASE}, pf AS (SELECT a.row, a.col, "
    f"MAX(CASE WHEN b.code = a.code AND a.code != {_PF_OUT} "
    f"AND a.code != {_PF_IN} THEN 1 ELSE 0 END) AS parallel "
    "FROM d8 a JOIN d8 b ON b.row BETWEEN a.row - 1 AND a.row + 1 "
    "AND b.col BETWEEN a.col - 1 AND a.col + 1 "
    "AND NOT (b.row = a.row AND b.col = a.col) GROUP BY 1, 2) "
    "SELECT d.row, d.col, CAST(COALESCE(p.parallel, 0) AS INT) AS parallel "
    "FROM d8 d LEFT JOIN pf p ON p.row = d.row AND p.col = d.col "
    "ORDER BY d.row, d.col",
)
def q_find_parallel_flow(spark, sf):
    from .operators.hydro import flow_pointer_d8

    a = flow_pointer_d8(_hydem(spark)).alias("a")
    b = flow_pointer_d8(_hydem(spark)).alias("b")
    pf = (
        a.join(
            b,
            F.expr("b.row BETWEEN a.row - 1 AND a.row + 1 "
                   "AND b.col BETWEEN a.col - 1 AND a.col + 1 "
                   "AND NOT (b.row = a.row AND b.col = a.col)"),
        )
        .groupBy(F.col("a.row").alias("row"), F.col("a.col").alias("col"))
        .agg(F.max(F.expr(
            f"CASE WHEN b.code = a.code AND a.code != {_PF_OUT} "
            f"AND a.code != {_PF_IN} THEN 1 ELSE 0 END")).alias("parallel"))
    )
    return (
        flow_pointer_d8(_hydem(spark))
        .join(pf, ["row", "col"], "left")
        .select("row", "col",
                F.coalesce("parallel", F.lit(0)).cast("int").alias("parallel"))
        .orderBy("row", "col")
    )


# BurnStreams.java semantics (stream-cell DEM decrement; streams = the
# engine's accumulation >= 20 mask, depth = 8, both dyadic)
@Q.register(
    "burn_streams",
    f"WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES} "
    "SELECT c.row, c.col, CASE WHEN a.accum >= 20 THEN c.v - 8e0 ELSE c.v END AS burned "
    "FROM live c JOIN acc a ON a.row = c.row AND a.col = c.col "
    "WHERE c.v IS NOT NULL ORDER BY c.row, c.col",
)
def q_burn_streams(spark, sf):
    from .operators.hydro import flow_accum, flow_pointer_d8

    cells = R.explode_cells(_hydem(spark)).where(F.col("value") != _ND)
    acc = flow_accum(flow_pointer_d8(_hydem(spark)))
    return (
        cells.join(acc, ["row", "col"])
        .select(
            "row", "col",
            F.expr("CASE WHEN accum >= 20 THEN value - 8e0 ELSE value END")
            .alias("burned"),
        )
        .orderBy("row", "col")
    )


# JensonSnapPourPoints.java: snap each outlet to the NEAREST stream cell
# within the radius (min squared distance; (row, col) tie-break).  Radius 12
# (vs snap_pour's 3): the Jenson variant is meant to reach the stream network
_JSNAP_R = 12
@Q.register(
    "jenson_snap",
    f"WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES} "
    "SELECT pp_id, row AS srow, col AS scol FROM ("
    "SELECT p.pp_id, a.row, a.col, "
    "ROW_NUMBER() OVER (PARTITION BY p.pp_id ORDER BY "
    "(a.row - p.r) * (a.row - p.r) + (a.col - p.c) * (a.col - p.c), a.row, a.col) AS rn "
    f"FROM (VALUES {', '.join(f'({i},{r},{c})' for i, r, c in _SNAP_PP)}) p(pp_id, r, c) "
    f"JOIN acc a ON a.accum >= 10 AND a.row BETWEEN p.r - {_JSNAP_R} AND p.r + {_JSNAP_R} "
    f"AND a.col BETWEEN p.c - {_JSNAP_R} AND p.c + {_JSNAP_R}"
    ") WHERE rn = 1 ORDER BY pp_id",
)
def q_jenson_snap(spark, sf):
    from pyspark.sql import Window

    from .operators.hydro import flow_accum, flow_pointer_d8

    acc = flow_accum(flow_pointer_d8(_hydem(spark)))
    stream = acc.where(F.col("accum") >= 10).select("row", "col")
    pour = spark.createDataFrame(_SNAP_PP, "pp_id long, r long, c long")
    cand = pour.join(
        stream,
        (F.col("row").between(F.col("r") - _JSNAP_R, F.col("r") + _JSNAP_R))
        & (F.col("col").between(F.col("c") - _JSNAP_R, F.col("c") + _JSNAP_R)),
    )
    d2 = (F.col("row") - F.col("r")) ** 2 + (F.col("col") - F.col("c")) ** 2
    rn = F.row_number().over(
        Window.partitionBy("pp_id").orderBy(d2.asc(), "row", "col")
    )
    return (
        cand.withColumn("rn", rn).where(F.col("rn") == 1)
        .select("pp_id", F.col("row").alias("srow"), F.col("col").alias("scol"))
        .orderBy("pp_id")
    )


# -- FuzzyMembership (StatsTools FuzzyMembership.java:275-295, sigmoidal
# model): cos^2 ramp between thresholds p1<p2<=p3<p4.  Transcendental ->
# shared half-up round(6).
_FZ_P = (120.0, 150.0, 180.0, 210.0)


def _fuzzy_expr(v: str) -> str:
    p1, p2, p3, p4 = _FZ_P
    hp = "1.5707963267948966e0"  # pi/2
    r1, r2 = p2 - p1, p4 - p3
    return (
        f"CASE WHEN {v} <= {p1}e0 THEN 0e0 "
        f"WHEN {v} < {p2}e0 THEN FLOOR((1e0 - COS(({v} - {p1}e0) / {r1}e0 * {hp}) "
        f"* COS(({v} - {p1}e0) / {r1}e0 * {hp})) * 1e6 + 0.5e0) / 1e6 "
        f"WHEN {v} <= {p3}e0 THEN 1e0 "
        f"WHEN {v} < {p4}e0 THEN FLOOR(COS(({v} - {p3}e0) / {r2}e0 * {hp}) "
        f"* COS(({v} - {p3}e0) / {r2}e0 * {hp}) * 1e6 + 0.5e0) / 1e6 "
        "ELSE 0e0 END"
    )


@Q.register(
    "fuzzy_membership",
    f"WITH {_RASF} SELECT row, col, {_fuzzy_expr('value')} AS membership "
    f"FROM ras WHERE {_NDF} ORDER BY row, col",
)
def q_fuzzy_membership(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    return live.select(
        "row", "col", F.expr(_fuzzy_expr("value")).alias("membership")
    ).orderBy("row", "col")


# -- CompareImagesForDifferences (StatsTools
# CompareImagesForDifferences.java:328-334): paired-sample t statistic of
# two bands — the exact moment formulas from the reference, computed on
# milli-quantized integer sums (exact) with one final rounded division.
@Q.register(
    "compare_images",
    f"""WITH {_RAS}, {_RAS2},
d AS (SELECT CAST(ROUND(a.value * 1e3) AS BIGINT) AS z1,
             CAST(ROUND(b.value * 1e3) AS BIGINT) AS z2
      FROM ras a JOIN ras2 b USING (row, col)
      WHERE a.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0),
m AS (SELECT COUNT(*) AS n, CAST(SUM(z1 - z2) AS BIGINT) AS s,
      CAST(SUM((z1 - z2) * (z1 - z2)) AS BIGINT) AS s2 FROM d)
SELECT n, FLOOR((CAST(s AS DOUBLE) / n) / 
  SQRT((n * CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / (n * (n - 1e0)) / n)
  * 1e6 + 0.5e0) / 1e6 AS t_stat FROM m""",
)
def q_compare_images(spark, sf):
    a = R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "v1")
    b = R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "v2")
    d = (
        a.join(b, ["row", "col"])
        .where((F.col("v1") != _ND) & (F.col("v2") != _ND))
        .select(
            (F.round(F.col("v1") * 1e3).cast("long")
             - F.round(F.col("v2") * 1e3).cast("long")).alias("dz"),
        )
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dz").cast("long").alias("s"),
        F.sum(F.col("dz") * F.col("dz")).cast("long").alias("s2"),
    )
    t = (F.col("s").cast("double") / F.col("n")) / F.sqrt(
        (F.col("n") * F.col("s2").cast("double")
         - F.col("s").cast("double") * F.col("s").cast("double"))
        / (F.col("n") * (F.col("n") - F.lit(1.0))) / F.col("n")
    )
    return m.select(
        "n", (F.floor(t * 1e6 + 0.5) / 1e6).alias("t_stat")
    )


# -- SplitColourComposite (ImageProcessingTools SplitColourComposite.java):
# unpack the ARGB composite back into r/g/b channels (pure integer ops;
# the exact inverse of colour_composite's pack)
@Q.register(
    "split_composite",
    f"""WITH {_RAS}, {_RAS2}, {_RAS3},
j AS (SELECT r.row, r.col, r.value AS rv, g.value AS gv, b.value AS bv
      FROM ras r JOIN ras2 g USING (row, col) JOIN ras3 b USING (row, col)
      WHERE r.value != {NODATA!r}e0 AND g.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0),
mm AS (SELECT MIN(rv) AS rlo, MAX(rv) AS rhi, MIN(gv) AS glo, MAX(gv) AS ghi,
       MIN(bv) AS blo, MAX(bv) AS bhi FROM j),
pk AS (SELECT row, col, 4278190080 + {_cc_clamp(_CC_CH.format(v='bv', lo='blo', hi='bhi'))} * 65536
  + {_cc_clamp(_CC_CH.format(v='gv', lo='glo', hi='ghi'))} * 256
  + {_cc_clamp(_CC_CH.format(v='rv', lo='rlo', hi='rhi'))} AS argb FROM j, mm)
SELECT row, col, argb % 256 AS r8, CAST(FLOOR(argb / 256e0) AS BIGINT) % 256 AS g8,
  CAST(FLOOR(argb / 65536e0) AS BIGINT) % 256 AS b8
FROM pk ORDER BY row, col""",
)
def q_split_composite(spark, sf):
    from . import queries as _Qr  # registry holds the plain fn

    comp = _Qr.all_queries()["colour_composite"](spark, sf)
    return comp.select(
        "row", "col",
        (F.col("argb") % 256).alias("r8"),
        (F.floor(F.col("argb") / 256.0).cast("long") % 256).alias("g8"),
        (F.floor(F.col("argb") / 65536.0).cast("long") % 256).alias("b8"),
    ).orderBy("row", "col")


# -- D8 mass flux (§2.12; HydroTools MassFluxD8.java:255-300): loading 1,
# deterministic dyadic efficiency/absorption surfaces, clamped transfer.
# Oracle = iteration-counter Jacobi (fd8 pattern) with the same transfer
# formula; round(4) for cross-engine sum association.
_MF_EFF = "CAST(8 + (({r}) + ({c})) % 8 AS DOUBLE) / 16e0"
_MF_ABS = "CAST((({r}) * 3 + ({c})) % 4 AS DOUBLE) / 4e0"
_MF_K = 250


def _mass_flux_oracle() -> str:
    dr = ("CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 "
          "WHEN 2 THEN -1 WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 "
          "WHEN 6 THEN 1 ELSE 1 END")
    dc = ("CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 "
          "WHEN 2 THEN 1 WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 "
          "WHEN 6 THEN 0 ELSE 1 END")
    xfer = (
        "GREATEST((u.a - " + _MF_ABS.format(r="u.row", c="u.col") + ") * ("
        + _MF_EFF.format(r="u.row", c="u.col") + "), 0e0)"
    )
    return (
        f"medges AS MATERIALIZED (SELECT e.row, e.col, e.nr, e.nc, 1 AS w FROM "
        f"(SELECT row, col, row + {dr} AS nr, col + {dc} AS nc FROM d8 WHERE code > 0) e "
        "JOIN d8 t ON t.row = e.nr AND t.col = e.nc "
        "UNION ALL SELECT row, col, row, col, -1 FROM d8), "
        "massit(it, row, col, a) AS (SELECT 0, row, col, 1e0 FROM d8 "
        "UNION ALL SELECT u.it + 1, e.nr, e.nc, "
        f"1e0 + COALESCE(SUM(CASE WHEN e.w = 1 THEN {xfer} END), 0e0) "
        "FROM massit u JOIN medges e ON e.row = u.row AND e.col = u.col "
        f"WHERE u.it < {_MF_K} GROUP BY 1, 2, 3)"
    )


@Q.register(
    "mass_flux",
    f"WITH RECURSIVE {_HYD_BASE}, {_mass_flux_oracle()} "
    "SELECT row, col, CAST(ROUND(a, 4) AS DOUBLE) AS flux "
    f"FROM massit WHERE it = {_MF_K} ORDER BY row, col",
)
def q_mass_flux(spark, sf):
    from .operators.hydro import flow_pointer_d8, mass_flux_d8

    ptr = flow_pointer_d8(_hydem(spark))
    cells = ptr.select(
        "row", "col", "code",
        F.lit(1.0).alias("load"),
        F.expr(_MF_EFF.format(r="row", c="col")).alias("eff"),
        F.expr(_MF_ABS.format(r="row", c="col")).alias("absorp"),
    )
    # tile=32 -> 2x3 tile graph, ~3 exchange rounds (invariance tested)
    return mass_flux_d8(cells, tile=32).orderBy("row", "col")


# -- downslope index (§2.12; DownslopeIndex.java:262-309 tangent mode,
# Hjerdt et al. 2004): d / (flow-path length to the point d below the
# start), pro-rata last cell, (zSt - zEnd)/L at pit/edge terminations.
# Spark side = binary lifting (log-round equi-joins); oracle = sequential
# one-step-per-iteration walker — same arithmetic, round(6) for the
# length-sum association difference.
_DSI_D = 4.0
_DSI_K = 300
_DSI_SQ2 = "1.4142135623730951e0"


def _dsi_oracle() -> str:
    nr = "u.cr + " + _D8_TGT_DR.replace("code", "p.code")
    nc = "u.cc + " + _D8_TGT_DC.replace("code", "p.code")
    ln = f"CASE WHEN p.code IN (1, 4, 32, 128) THEN {_DSI_SQ2} ELSE 1e0 END"
    d = f"{_DSI_D!r}e0"
    term_val = "CASE WHEN u.fl > 0e0 THEN (u.zst - u.cz) / u.fl END"
    part_val = (f"{d} / (u.fl + ({ln}) * (u.cz - (u.zst - {d})) "
                "/ (u.cz - nz.v))")
    return (
        "dsd8 AS MATERIALIZED (SELECT row, col, code FROM d8), "
        "dslive AS MATERIALIZED (SELECT row, col, v FROM live WHERE v IS NOT NULL), "
        "dsit(it, srow, scol, zst, cr, cc, cz, fl, val, done) AS ("
        "SELECT 0, d.row, d.col, l.v, d.row, d.col, l.v, 0e0, "
        "CAST(NULL AS DOUBLE), 0 FROM dsd8 d JOIN dslive l "
        "ON l.row = d.row AND l.col = d.col WHERE d.code > 0 "
        "UNION ALL SELECT u.it + 1, u.srow, u.scol, u.zst, "
        f"CASE WHEN u.done = 1 OR p.code = 0 OR u.zst - nz.v >= {d} THEN u.cr ELSE {nr} END, "
        f"CASE WHEN u.done = 1 OR p.code = 0 OR u.zst - nz.v >= {d} THEN u.cc ELSE {nc} END, "
        f"CASE WHEN u.done = 1 OR p.code = 0 OR u.zst - nz.v >= {d} THEN u.cz ELSE nz.v END, "
        f"CASE WHEN u.done = 1 OR p.code = 0 OR u.zst - nz.v >= {d} THEN u.fl ELSE u.fl + ({ln}) END, "
        "CASE WHEN u.done = 1 THEN u.val "
        f"WHEN p.code = 0 THEN {term_val} "
        f"WHEN u.zst - nz.v >= {d} THEN {part_val} END, "
        f"CASE WHEN u.done = 1 OR p.code = 0 OR u.zst - nz.v >= {d} THEN 1 ELSE 0 END "
        "FROM dsit u "
        "LEFT JOIN dsd8 p ON p.row = u.cr AND p.col = u.cc "
        f"LEFT JOIN dslive nz ON nz.row = u.cr + {_D8_TGT_DR.replace('code', 'p.code')} "
        f"AND nz.col = u.cc + {_D8_TGT_DC.replace('code', 'p.code')} "
        f"WHERE u.it < {_DSI_K})"
    )


@Q.register(
    "downslope_index",
    f"WITH RECURSIVE {_HYD_BASE}, {_dsi_oracle()} "
    "SELECT srow AS row, scol AS col, CAST(ROUND(val, 6) AS DOUBLE) AS di "
    f"FROM dsit WHERE it = {_DSI_K} AND val IS NOT NULL ORDER BY row, col",
)
def q_downslope_index(spark, sf):
    from .operators.hydro import downslope_index, flow_pointer_d8

    ptr = flow_pointer_d8(_hydem(spark))
    z = R.explode_cells(_hydem(spark)).where(F.col("value") != _ND) \
        .withColumnRenamed("value", "z")
    cells = ptr.join(z, ["row", "col"])
    return downslope_index(cells, d=_DSI_D).orderBy("row", "col")


# -- DirectDecorrelationStretch (ImageProcessingTools
# DirectDecorrelationStretch.java:240-284, k = 0.5): per-pixel achromatic
# subtraction r' = trunc(r - k*min(r,g,b)) clamped to [0,255], repacked as
# ARGB — applied to the engine's colour composite (pure integer ops).
def _dds_ch(ch: str) -> str:
    return (f"LEAST(GREATEST(CAST(FLOOR({ch} - 0.5e0 * mn) AS BIGINT), 0), 255)")


@Q.register(
    "dds_stretch",
    f"""WITH {_RAS}, {_RAS2}, {_RAS3},
j AS (SELECT r.row, r.col, r.value AS rv, g.value AS gv, b.value AS bv
      FROM ras r JOIN ras2 g USING (row, col) JOIN ras3 b USING (row, col)
      WHERE r.value != {NODATA!r}e0 AND g.value != {NODATA!r}e0 AND b.value != {NODATA!r}e0),
mm AS (SELECT MIN(rv) AS rlo, MAX(rv) AS rhi, MIN(gv) AS glo, MAX(gv) AS ghi,
       MIN(bv) AS blo, MAX(bv) AS bhi FROM j),
pk AS (SELECT row, col, {_cc_clamp(_CC_CH.format(v='rv', lo='rlo', hi='rhi'))} AS r8,
       {_cc_clamp(_CC_CH.format(v='gv', lo='glo', hi='ghi'))} AS g8,
       {_cc_clamp(_CC_CH.format(v='bv', lo='blo', hi='bhi'))} AS b8 FROM j, mm),
dm AS (SELECT row, col, r8, g8, b8, LEAST(r8, g8, b8) AS mn FROM pk)
SELECT row, col, 4278190080 + {_dds_ch('b8')} * 65536 + {_dds_ch('g8')} * 256
  + {_dds_ch('r8')} AS argb
FROM dm ORDER BY row, col""",
)
def q_dds_stretch(spark, sf):
    comp = Q.all_queries()["colour_composite"](spark, sf)
    unpack = comp.select(
        "row", "col",
        (F.col("argb") % 256).alias("r8"),
        (F.floor(F.col("argb") / 256.0).cast("long") % 256).alias("g8"),
        (F.floor(F.col("argb") / 65536.0).cast("long") % 256).alias("b8"),
    ).withColumn("mn", F.least("r8", "g8", "b8"))
    return unpack.select(
        "row", "col",
        (F.lit(4278190080) + F.expr(_dds_ch("b8")) * 65536
         + F.expr(_dds_ch("g8")) * 256 + F.expr(_dds_ch("r8"))).alias("argb"),
    ).orderBy("row", "col")


# -- ExtractValleysPeuckerAndDouglas (StreamNetworkAnalysisTools
# ExtractValleysPeuckerAndDouglas.java): mark the highest cell of every
# 2x2 window; valleys = never-marked cells.  Tie-break = first max in the
# window scan order (slot = 2*(row offset) + col offset).
@Q.register(
    "extract_valleys_pd",
    f"WITH {_RASF}, live AS (SELECT row, col, value FROM ras WHERE {_NDF}), "
    "blk AS (SELECT b.r AS br, b.c AS bc, l.row, l.col, l.value, "
    "(l.row - b.r) * 2 + (l.col - b.c) AS slot "
    f"FROM (SELECT r.r, c.c FROM range(0, {FROWS - 1}) r(r), range(0, {FCOLS - 1}) c(c)) b "
    "JOIN live l ON l.row BETWEEN b.r AND b.r + 1 AND l.col BETWEEN b.c AND b.c + 1), "
    "mk AS (SELECT br, bc, row, col, ROW_NUMBER() OVER (PARTITION BY br, bc "
    "ORDER BY value DESC, slot) AS rn, COUNT(*) OVER (PARTITION BY br, bc) AS nc "
    "FROM blk), "
    "marked AS (SELECT DISTINCT row, col FROM mk WHERE rn = 1 AND nc = 4) "
    "SELECT l.row, l.col, CASE WHEN m.row IS NULL THEN 1 ELSE 0 END AS valley "
    "FROM live l LEFT JOIN marked m ON m.row = l.row AND m.col = l.col "
    "ORDER BY l.row, l.col",
)
def q_extract_valleys_pd(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    from pyspark.sql import Window

    # each live cell belongs to <= 4 2x2 blocks; explode the block ids it
    # joins (pure Catalyst), window-rank inside each block
    blk = live.select(
        "row", "col", "value",
        F.explode(F.expr(
            "filter(array(struct(row - 1 AS br, col - 1 AS bc), "
            "struct(row - 1 AS br, col AS bc), "
            "struct(row AS br, col - 1 AS bc), struct(row AS br, col AS bc)), "
            f"b -> b.br >= 0 AND b.bc >= 0 AND b.br < {FROWS - 1} AND b.bc < {FCOLS - 1})"
        )).alias("b"),
    ).select("row", "col", "value", "b.br", "b.bc")
    slot = (F.col("row") - F.col("br")) * 2 + (F.col("col") - F.col("bc"))
    w = Window.partitionBy("br", "bc")
    mk = blk.select(
        "row", "col",
        F.row_number().over(w.orderBy(F.col("value").desc(), slot.asc())).alias("rn"),
        F.count(F.lit(1)).over(w).alias("nc"),
    )
    marked = mk.where((F.col("rn") == 1) & (F.col("nc") == 4)) \
        .select("row", "col").distinct()
    return (
        live.join(marked.withColumn("_m", F.lit(1)), ["row", "col"], "left")
        .select("row", "col",
                F.when(F.col("_m").isNull(), 1).otherwise(0).alias("valley"))
        .orderBy("row", "col")
    )


# -- FindPatchOrClassEdgeCells (GISTools FindPatchOrClassEdgeCells.java,
# class mode): cells whose 4-neighborhood contains a different class or
# leaves the grid/nodata.
@Q.register(
    "find_edge_cells",
    f"WITH {_RASF}, cls AS (SELECT row, col, CAST(FLOOR(value / 50e0) AS BIGINT) AS c "
    f"FROM ras WHERE {_NDF}), "
    "nb AS (SELECT a.row, a.col, a.c, "
    "MAX(CASE WHEN b.c IS NULL OR b.c != a.c THEN 1 ELSE 0 END) AS edge "
    "FROM cls a JOIN (VALUES (-1, 0), (1, 0), (0, -1), (0, 1)) o(dr, dc) ON TRUE "
    "LEFT JOIN cls b ON b.row = a.row + o.dr AND b.col = a.col + o.dc "
    "GROUP BY 1, 2, 3) "
    "SELECT row, col, c AS cls, CAST(edge AS INT) AS edge FROM nb ORDER BY row, col",
)
def q_find_edge_cells(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    cls = live.select(
        "row", "col", F.expr("CAST(FLOOR(value / 50e0) AS BIGINT)").alias("c")
    )
    offs = F.expr(
        "explode(array(struct(-1 AS dr, 0 AS dc), struct(1 AS dr, 0 AS dc), "
        "struct(0 AS dr, -1 AS dc), struct(0 AS dr, 1 AS dc)))"
    )
    probes = cls.select("row", "col", "c", offs.alias("o")).select(
        "row", "col", "c",
        (F.col("row") + F.col("o.dr")).alias("nr"),
        (F.col("col") + F.col("o.dc")).alias("nc"),
    )
    nbc = cls.select(F.col("row").alias("nr"), F.col("col").alias("nc"),
                     F.col("c").alias("bc"))
    return (
        probes.join(nbc, ["nr", "nc"], "left")
        .groupBy("row", "col", "c")
        .agg(F.max(F.expr("CASE WHEN bc IS NULL OR bc != c THEN 1 ELSE 0 END"))
             .cast("int").alias("edge"))
        .select("row", "col", F.col("c").alias("cls"), "edge")
        .orderBy("row", "col")
    )


# -- RemoveShortStreams (§2.12; StreamNetworkAnalysisTools
# RemoveShortStreams.java:274-355): drop junction-cut links shorter than
# min_len (3 cells here); output = surviving stream cells with their link.
@Q.register(
    "remove_short_streams",
    f"WITH RECURSIVE {_VHYD_BASE}, {_stream_net_sql(_VT)}, "
    "rs_len AS (SELECT u.link, SUM(CASE WHEN k.row != k.nr AND k.col != k.nc "
    f"THEN {_SQ2L} ELSE 1e0 END) AS len "
    "FROM kept k JOIN slab u ON u.id = k.row * 1000000 + k.col GROUP BY 1), "
    "surv AS (SELECT link FROM rs_len WHERE len >= 3e0) "
    "SELECT CAST(FLOOR(u.id / 1000000e0) AS BIGINT) AS row, "
    "u.id % 1000000 AS col, u.link "
    "FROM slab u JOIN surv s ON s.link = u.link ORDER BY row, col",
)
def q_remove_short_streams(spark, sf):
    from .operators.hydro import flow_pointer_d8, remove_short_streams

    dem = R.synth_raster(spark, _VROWS, _VCOLS, value_sql=VALLEY_VAL)
    return (
        remove_short_streams(flow_pointer_d8(dem), threshold=_VT, min_len=3.0)
        .orderBy("row", "col")
    )


# -- ExtractValleysJohnstonAndRosenfeld (StreamNetworkAnalysisTools
# ExtractValleysJohnstonAndRosenfeld.java:195-215): valley when the N-S
# pair OR the E-W pair are BOTH strictly higher (the dual of FindRidges).
@Q.register(
    "extract_valleys_jr",
    f"WITH {_RASF}, {_W9} SELECT row, col, "
    "CASE WHEN (nn IS NOT NULL AND ss IS NOT NULL AND nn > cv AND ss > cv) "
    "OR (wv IS NOT NULL AND ev IS NOT NULL AND wv > cv AND ev > cv) "
    "THEN 1 ELSE 0 END AS valley "
    f"FROM w9 WHERE cv != {R.NODATA!r}e0 ORDER BY row, col",
)
def q_extract_valleys_jr(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    nb = {}
    for name, (dr, dc) in {"nn": (-1, 0), "ss": (1, 0), "wv": (0, -1),
                           "ev": (0, 1)}.items():
        nb[name] = live.select(
            (F.col("row") - dr).alias("row"), (F.col("col") - dc).alias("col"),
            F.col("value").alias(name),
        )
    out = live
    for name, df in nb.items():
        out = out.join(df, ["row", "col"], "left")
    return out.select(
        "row", "col",
        F.expr(
            "CASE WHEN (nn IS NOT NULL AND ss IS NOT NULL AND nn > value AND ss > value) "
            "OR (wv IS NOT NULL AND ev IS NOT NULL AND wv > value AND ev > value) "
            "THEN 1 ELSE 0 END"
        ).alias("valley"),
    ).orderBy("row", "col")


# -- AverageSlopeToDivide (§2.12; AverageSlopeToDivide.java:296-385):
# atan((mean upslope-divide elevation - z) / mean divide flowpath length),
# degrees, 0 with no upslope divide.  Strict-upslope sums via the reach
# closure; micro-integer weights; single trailing atan (round 6).
@Q.register(
    "avg_slope_to_divide",
    f"""WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES},
fe2 AS (SELECT row, col,
  row + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN -1 WHEN 2 THEN -1
       WHEN 3 THEN 0 WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 1 ELSE 1 END AS nr,
  col + CASE CAST(log2(code) AS INT) WHEN 0 THEN -1 WHEN 1 THEN 0 WHEN 2 THEN 1
       WHEN 3 THEN -1 WHEN 4 THEN 1 WHEN 5 THEN -1 WHEN 6 THEN 0 ELSE 1 END AS nc,
  CASE CAST(log2(code) AS INT) WHEN 0 THEN 1.4142135623730951e0 WHEN 2 THEN 1.4142135623730951e0
       WHEN 5 THEN 1.4142135623730951e0 WHEN 7 THEN 1.4142135623730951e0 ELSE 1e0 END AS step
  FROM d8 WHERE code > 0
  UNION ALL SELECT row, col, row, col, 0e0 FROM d8 WHERE code = 0),
fp(it, row, col, d) AS (
  SELECT 0, row, col, 0e0 FROM d8
  UNION ALL
  SELECT u.it + 1, f.row, f.col, f.step + u.d
  FROM fp u JOIN fe2 f ON f.nr = u.row AND f.nc = u.col
  WHERE u.it < {_FPK}
),
cellw AS MATERIALIZED (SELECT p.row, p.col, p.row * 1000000 + p.col AS id, l.v,
  CASE WHEN it.nr IS NULL THEN 1 ELSE 0 END AS isdiv,
  CAST(FLOOR(l.v * 1e6 + 0.5e0) AS BIGINT) AS zm,
  CAST(FLOOR(ROUND(f.d, 6) * 1e6 + 0.5e0) AS BIGINT) AS dm
  FROM d8 p JOIN live l ON l.row = p.row AND l.col = p.col
  JOIN (SELECT row, col, d FROM fp WHERE it = {_FPK}) f
    ON f.row = p.row AND f.col = p.col
  LEFT JOIN (SELECT DISTINCT nr, nc FROM fe2 WHERE step > 0e0) it
    ON it.nr = p.row AND it.nc = p.col
  WHERE l.v IS NOT NULL),
wsum AS (SELECT r.nid, CAST(SUM(f.isdiv) AS BIGINT) AS n_div,
  CAST(SUM(f.isdiv * f.zm) AS BIGINT) AS e_sum,
  CAST(SUM(f.isdiv * f.dm) AS BIGINT) AS sd_sum
  FROM reach r JOIN cellw f ON f.id = r.id GROUP BY 1)
SELECT c.row, c.col, CAST(CASE WHEN COALESCE(w.n_div, 0) > 0 THEN
  FLOOR(DEGREES(ATAN(((CAST(w.e_sum AS DOUBLE) / w.n_div) / 1e6 - c.v)
  / ((CAST(w.sd_sum - w.n_div * c.dm AS DOUBLE) / w.n_div) / 1e6)))
  * 1e6 + 0.5e0) / 1e6 ELSE 0e0 END AS DOUBLE) AS asd
FROM cellw c LEFT JOIN wsum w ON w.nid = c.id
ORDER BY c.row, c.col""",
)
def q_avg_slope_to_divide(spark, sf):
    from .operators.hydro import avg_slope_to_divide, flow_pointer_d8

    cells = R.explode_cells(_hydem(spark)).where(F.col("value") != _ND) \
        .withColumnRenamed("value", "v")
    return avg_slope_to_divide(flow_pointer_d8(_hydem(spark)), cells) \
        .orderBy("row", "col")


# -- StreamLinkClassification (§2.12; StreamNetworkAnalysisTools
# StreamLinkClassification.java:280-345): the reference's head-walk with
# saturate-at-2 marking is order-independent in its FINAL state — a cell's
# value is min(2, #channel heads upstream) — so the engine computes it as
# one integer-weighted accumulation of head indicators; node overrides:
# outlet (pointer 0) = 5, source node = 3, junction (>= 2 stream inflows)
# = 4.  Exterior links stay 1, interior 2.
_SLC_T = 10


@Q.register(
    "stream_link_class",
    f"""WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES},
st AS MATERIALIZED (SELECT row, col FROM acc WHERE accum >= {_SLC_T}),
sin AS (SELECT e.nid, COUNT(*) AS n_in FROM edges e
  JOIN st s ON s.row * 1000000 + s.col = e.id
  JOIN st t ON t.row * 1000000 + t.col = e.nid GROUP BY 1),
hd AS (SELECT s.row, s.col, s.row * 1000000 + s.col AS id,
  CASE WHEN i.n_in IS NULL THEN 1 ELSE 0 END AS ishead
  FROM st s LEFT JOIN sin i ON i.nid = s.row * 1000000 + s.col),
hup AS (SELECT r.nid, CAST(SUM(h.ishead) AS BIGINT) AS nh FROM reach r
  JOIN hd h ON h.id = r.id GROUP BY 1)
SELECT h.row, h.col, CAST(CASE
  WHEN d.code = 0 THEN 5
  WHEN h.ishead = 1 THEN 3
  WHEN COALESCE(i.n_in, 0) >= 2 THEN 4
  ELSE LEAST(2, h.ishead + COALESCE(u.nh, 0)) END AS INT) AS class
FROM hd h
JOIN d8 d ON d.row = h.row AND d.col = h.col
LEFT JOIN sin i ON i.nid = h.id
LEFT JOIN hup u ON u.nid = h.id
ORDER BY h.row, h.col""",
)
def q_stream_link_class(spark, sf):
    from .operators.hydro import (
        flow_accum, flow_pointer_d8, weighted_flow_accum,
    )

    ptr = flow_pointer_d8(_hydem(spark))
    acc = flow_accum(ptr)
    stream = acc.where(F.col("accum") >= _SLC_T).select("row", "col")
    tgt = ptr.where(F.col("code") > 0).select(
        (F.col("row") + F.expr(_D8_TGT_DR)).alias("row"),
        (F.col("col") + F.expr(_D8_TGT_DC)).alias("col"),
        F.col("row").alias("srow"), F.col("col").alias("scol"),
    )
    sin = (
        tgt.join(stream, ["row", "col"], "left_semi")
        .join(stream.select(F.col("row").alias("srow"), F.col("col").alias("scol")),
              ["srow", "scol"], "left_semi")
        .groupBy("row", "col").agg(F.count(F.lit(1)).alias("n_in"))
    )
    hd = stream.join(sin, ["row", "col"], "left").select(
        "row", "col",
        F.when(F.col("n_in").isNull(), 1).otherwise(0).alias("ishead"),
        F.coalesce("n_in", F.lit(0)).alias("n_in"),
    )
    w = ptr.select("row", "col").join(
        hd.select("row", "col", F.col("ishead").cast("long").alias("w0")),
        ["row", "col"], "left",
    ).select("row", "col", F.coalesce("w0", F.lit(0)).alias("w0"))
    H = weighted_flow_accum(ptr, w)
    cls = (
        hd.join(ptr.select("row", "col", "code"), ["row", "col"])
        .join(H, ["row", "col"])
        .select(
            "row", "col",
            F.expr(
                "CAST(CASE WHEN code = 0 THEN 5 WHEN ishead = 1 THEN 3 "
                "WHEN n_in >= 2 THEN 4 ELSE LEAST(2, waccum) END AS INT)"
            ).alias("class"),
        )
    )
    return cls.orderBy("row", "col")


# -- BreachPits (§2.12; HydroTools BreachPits.java:164-230): for each pit
# (no strictly-lower 8-neighbor, full window), every ring-2 cell lower
# than the pit writes (z + z2)/2 into the ring-1 cell between them; the
# reference's sequential overwrites resolve to "last write wins", made
# order-independent here by ranking writes on (pit row, pit col, i) DESC.
_BP_OFFS = [  # (i, dx2, dy2, bdx, bdy) — breachcell maps ring-2 slot i to ring-1
    (0, 2, -2, 1, -1), (1, 2, -1, 1, -1), (2, 2, 0, 1, 0), (3, 2, 1, 1, 0),
    (4, 2, 2, 1, 1), (5, 1, 2, 1, 1), (6, 0, 2, 0, 1), (7, -1, 2, -1, 1),
    (8, -2, 2, -1, 1), (9, -2, 1, -1, 1), (10, -2, 0, -1, 0),
    (11, -2, -1, -1, 0), (12, -2, -2, -1, -1), (13, -1, -2, -1, -1),
    (14, 0, -2, 0, -1), (15, 1, -2, 1, -1),
]
_BP_VALS = ", ".join(f"({i},{a},{b},{c},{d})" for i, a, b, c, d in _BP_OFFS)


@Q.register(
    "breach_pits",
    f"""WITH {_HYD_BASE},
pits AS (SELECT row, col, cv FROM w9
  WHERE n0 IS NOT NULL AND n1 IS NOT NULL AND n2 IS NOT NULL AND n3 IS NOT NULL
    AND n4 IS NOT NULL AND n5 IS NOT NULL AND n6 IS NOT NULL AND n7 IS NOT NULL
    AND LEAST(n0, n1, n2, n3, n4, n5, n6, n7) >= cv),
wr AS (SELECT p.row + o.bdy AS row, p.col + o.bdx AS col,
  (p.cv + l.v) / 2e0 AS bv,
  ROW_NUMBER() OVER (PARTITION BY p.row + o.bdy, p.col + o.bdx
    ORDER BY p.row DESC, p.col DESC, o.i DESC) AS rn
  FROM pits p JOIN (VALUES {_BP_VALS}) o(i, dx2, dy2, bdx, bdy) ON TRUE
  JOIN live l ON l.row = p.row + o.dy2 AND l.col = p.col + o.dx2
  WHERE l.v IS NOT NULL AND l.v < p.cv)
SELECT c.row, c.col, COALESCE(w.bv, c.v) AS breached
FROM live c LEFT JOIN (SELECT row, col, bv FROM wr WHERE rn = 1) w
  ON w.row = c.row AND w.col = c.col
WHERE c.v IS NOT NULL ORDER BY c.row, c.col""",
)
def q_breach_pits(spark, sf):
    from pyspark.sql import Window

    live = R.explode_cells(_hydem(spark)).where(F.col("value") != _ND) \
        .withColumnRenamed("value", "v")
    # full-window pit test: all 8 neighbors present (inner joins) and none
    # strictly lower
    pits = live
    for k, (dr, dc) in enumerate([(-1, -1), (-1, 0), (-1, 1), (0, -1),
                                  (0, 1), (1, -1), (1, 0), (1, 1)]):
        t = live.select((F.col("row") - dr).alias("row"),
                        (F.col("col") - dc).alias("col"),
                        F.col("v").alias(f"n{k}"))
        pits = pits.join(t, ["row", "col"], "inner")
    pits = pits.where(F.expr(
        "LEAST(n0, n1, n2, n3, n4, n5, n6, n7) >= v"
    )).select("row", "col", F.col("v").alias("cv"))
    offs = spark.createDataFrame(_BP_OFFS, "i int, dx2 int, dy2 int, bdx int, bdy int")
    r2 = live.select(F.col("row").alias("r2r"), F.col("col").alias("r2c"),
                     F.col("v").alias("z2"))
    wr = (
        pits.crossJoin(F.broadcast(offs))
        .join(r2, (F.col("r2r") == F.col("row") + F.col("dy2"))
              & (F.col("r2c") == F.col("col") + F.col("dx2")))
        .where(F.col("z2") < F.col("cv"))
        .select(
            (F.col("row") + F.col("bdy")).alias("trow"),
            (F.col("col") + F.col("bdx")).alias("tcol"),
            ((F.col("cv") + F.col("z2")) / 2.0).alias("bv"),
            F.col("row").alias("prow"), F.col("col").alias("pcol"), "i",
        )
    )
    w = Window.partitionBy("trow", "tcol").orderBy(
        F.col("prow").desc(), F.col("pcol").desc(), F.col("i").desc()
    )
    best = wr.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1) \
        .select(F.col("trow").alias("row"), F.col("tcol").alias("col"), "bv")
    return (
        live.join(best, ["row", "col"], "left")
        .select("row", "col", F.coalesce("bv", "v").alias("breached"))
        .orderBy("row", "col")
    )


# -- CrispnessIndex (StatsTools CrispnessIndex.java:230-270) over the
# engine's fuzzy-membership image: C = sum((z - avg)^2) /
# ((total*(1-avg))^2 + avg^2*(N - total)).  Membership values are round-6
# quantized, so micro-integer moments make every sum exact; the final
# expression is one shared deterministic formula.
_CRISP_OUT = (
    "CAST(ROUND((CAST(s2 AS DOUBLE) / 1e12 - (CAST(s1 AS DOUBLE) / 1e6) "
    "* (CAST(s1 AS DOUBLE) / 1e6) / n) / "
    "((CAST(s1 AS DOUBLE) / 1e6 * (1e0 - CAST(s1 AS DOUBLE) / 1e6 / n)) "
    "* (CAST(s1 AS DOUBLE) / 1e6 * (1e0 - CAST(s1 AS DOUBLE) / 1e6 / n)) "
    "+ (CAST(s1 AS DOUBLE) / 1e6 / n) * (CAST(s1 AS DOUBLE) / 1e6 / n) "
    "* (n - CAST(s1 AS DOUBLE) / 1e6)), 6) AS DOUBLE)"
)


@Q.register(
    "crispness_index",
    f"WITH {_RASF}, fz AS (SELECT CAST(FLOOR(({_fuzzy_expr('value')}) * 1e6 + 0.5e0) AS BIGINT) AS zm "
    f"FROM ras WHERE {_NDF}), "
    "m AS (SELECT COUNT(*) AS n, CAST(SUM(zm) AS BIGINT) AS s1, "
    "CAST(SUM(zm * zm) AS BIGINT) AS s2 FROM fz) "
    f"SELECT n, {_CRISP_OUT} AS crispness FROM m",
)
def q_crispness_index(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    fz = live.select(
        F.floor(F.expr(_fuzzy_expr("value")) * 1e6 + 0.5).cast("long").alias("zm")
    )
    m = fz.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("zm").cast("long").alias("s1"),
        F.sum(F.col("zm") * F.col("zm")).cast("long").alias("s2"),
    )
    return m.select("n", F.expr(_CRISP_OUT).alias("crispness"))


# -- FilterLocalContrastEnhancement (ImageProcessingTools
# FilterLocalContrastEnhancement.java:300-325): over the elliptical (here
# plus-shaped, 3x3/ellipse) window, yij = alpha*globalMean +
# (1-alpha)*localMean + (z - localMean)*(sigma0/(sigma + 1)); alpha = 0.5,
# sigma0 = 16, population sigma.  Dyadic sums + deterministic sqrt/div ->
# no rounding.
@Q.register(
    "local_contrast",
    f"""WITH {_RASF}, live AS (SELECT row, col, value FROM ras WHERE {_NDF}),
gm AS (SELECT SUM(value) / COUNT(*) AS g FROM live),
w5 AS (SELECT a.row, a.col, a.value AS z, COUNT(*) AS n,
  SUM(b.value) AS s1, SUM(b.value * b.value) AS s2
  FROM live a JOIN live b ON ABS(b.row - a.row) + ABS(b.col - a.col) <= 1
  GROUP BY 1, 2, 3),
st AS (SELECT row, col, z, n, s1 / n AS lm,
  SQRT(s2 / n - (s1 / n) * (s1 / n)) AS sd FROM w5 WHERE s2 / n - (s1 / n) * (s1 / n) > 0e0)
SELECT row, col,
  0.5e0 * g + 0.5e0 * lm + (z - lm) * (16e0 / (sd + 1e0)) AS value
FROM st, gm ORDER BY row, col""",
)
def q_local_contrast(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    gm = live.agg((F.sum("value") / F.count(F.lit(1))).alias("g"))
    b = live.select(F.col("row").alias("br"), F.col("col").alias("bc"),
                    F.col("value").alias("bv"))
    w5 = (
        live.join(b, (F.abs(F.col("br") - F.col("row"))
                      + F.abs(F.col("bc") - F.col("col"))) <= 1)
        .groupBy("row", "col", "value")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bv").alias("s1"),
             F.sum(F.col("bv") * F.col("bv")).alias("s2"))
    )
    var = F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
    st = w5.where(var > 0).select(
        "row", "col", F.col("value").alias("z"),
        (F.col("s1") / F.col("n")).alias("lm"),
        F.sqrt(var).alias("sd"),
    )
    return (
        st.crossJoin(F.broadcast(gm))
        .select(
            "row", "col",
            (0.5 * F.col("g") + 0.5 * F.col("lm")
             + (F.col("z") - F.col("lm")) * (16.0 / (F.col("sd") + 1.0))).alias("value"),
        )
        .orderBy("row", "col")
    )


# -- ImageRectification (§2.13; ImageProcessingTools
# ImageRectification.java — affine georegistration resample): inverse-map
# each output cell through a dyadic affine (rotation-like shear matrix
# [[.75,.25],[-.25,.75]] + translation) and nearest-neighbor sample; all
# arithmetic dyadic-exact, NN rounding = shared half-up floor.
_AR_SR = ("CAST(FLOOR(0.75e0 * row + 0.25e0 * col + 4e0 + 0.5e0) AS BIGINT)")
_AR_SC = ("CAST(FLOOR(-0.25e0 * row + 0.75e0 * col + 8e0 + 0.5e0) AS BIGINT)")


@Q.register(
    "image_rectify",
    f"WITH {_RASF}, src AS (SELECT row, col, value FROM ras WHERE {_NDF}), "
    f"m AS (SELECT row, col, {_AR_SR} AS sr, {_AR_SC} AS sc "
    f"FROM ras WHERE {_NDF}) "
    "SELECT m.row, m.col, s.value FROM m JOIN src s "
    "ON s.row = m.sr AND s.col = m.sc ORDER BY m.row, m.col",
)
def q_image_rectify(spark, sf):
    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    m = live.select(
        "row", "col",
        F.expr(_AR_SR).alias("sr"), F.expr(_AR_SC).alias("sc"),
    )
    src = live.select(F.col("row").alias("sr"), F.col("col").alias("sc"),
                      "value")
    return m.join(src, ["sr", "sc"]).select("row", "col", "value") \
        .orderBy("row", "col")


# -- StochasticDepressionAnalysis (§2.12; TerrainAnalysisTools
# StochasticDepressionAnalysis.java): pdep = fraction of noise realizations
# in which the cell sits in a depression (filled > dem).  The reference's
# Monte-Carlo draws determinize to K = 3 LCG noise fields; noise =
# u/2^31*4 is DYADIC (power-of-two divisor), so dem+noise stays exact, the
# minimax fill fixpoint is exact, and the depression flag is
# deterministic.  Output = integer depression count over the K fields.
_SDA_K = 3


def _sda_noise(k: int, r: str = "row", c: str = "col") -> str:
    # reduce the key mod 2^31 BEFORE the Knuth multiply: the raw key is
    # ~3e11 and * A would overflow int64 (Spark ANSI errors; DuckDB widens
    # to int128 — silently diverging)
    key = f"(((({r}) * 1000003 + ({c})) * 7919 + {k}) % {M})"
    u = f"((({key}) * {A} % {M}) + {C}) * {A} % {M}"
    return f"(CAST({u} AS DOUBLE) / {M}e0 * 4e0)"


def _sda_oracle() -> str:
    blocks = [
        f"""rasd AS (SELECT r.r AS row, c.c AS col, {_DVAL} AS value
         FROM range(0, {_DROWS}) r(r), range(0, {_DCOLS}) c(c)),
offs AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)) t(dr, dc))"""
    ]
    unions = []
    for k in range(_SDA_K):
        blocks.append(
            f"""base{k} AS MATERIALIZED (SELECT a.row, a.col,
  a.value + {_sda_noise(k, 'a.row', 'a.col')} AS dem,
  (a.row = 0 OR a.row = {_DROWS - 1} OR a.col = 0 OR a.col = {_DCOLS - 1} OR EXISTS (
     SELECT 1 FROM offs o JOIN rasd n ON n.row = a.row + o.dr AND n.col = a.col + o.dc
     WHERE n.value = {NODATA!r}e0)) AS s
  FROM rasd a WHERE a.value != {NODATA!r}e0),
fill{k}(it, row, col, f) AS (
  SELECT 0, row, col, CASE WHEN s THEN dem ELSE 1e18 END FROM base{k}
  UNION ALL
  SELECT f.it + 1, b.row, b.col,
    CASE WHEN b.s THEN b.dem ELSE GREATEST(b.dem, MIN(f.f)) END
  FROM fill{k} f JOIN offs o ON TRUE
  JOIN base{k} b ON b.row = f.row + o.dr AND b.col = f.col + o.dc
  WHERE f.it < {_DK}
  GROUP BY f.it, b.row, b.col, b.dem, b.s
)"""
        )
        unions.append(
            f"SELECT b.row, b.col, CASE WHEN COALESCE(l.f, b.dem) > b.dem "
            f"THEN 1 ELSE 0 END AS dep FROM base{k} b "
            f"LEFT JOIN (SELECT row, col, f FROM fill{k} WHERE it = {_DK}) l "
            "USING (row, col)"
        )
    return (
        "WITH RECURSIVE " + ", ".join(blocks)
        + ", alldep AS (" + " UNION ALL ".join(unions) + ") "
        "SELECT row, col, CAST(SUM(dep) AS BIGINT) AS n_dep "
        "FROM alldep GROUP BY 1, 2 ORDER BY 1, 2"
    )


@Q.register("stochastic_depressions", _sda_oracle())
def q_stochastic_depressions(spark, sf):
    from .operators.hydro import fill_depressions

    base = (
        R.explode_cells(R.synth_raster(spark, _DROWS, _DCOLS))
        .where(F.col("value") != _ND)
    )
    parts = []
    for k in range(_SDA_K):
        noisy = base.select(
            "row", "col",
            (F.col("value") + F.expr(_sda_noise(k))).alias("dem"),
        )
        filled = fill_depressions(noisy, _DROWS, _DCOLS, tile=16)
        parts.append(
            noisy.join(filled, ["row", "col"])
            .select("row", "col",
                    F.expr("CASE WHEN filled > dem THEN 1 ELSE 0 END").alias("dep"))
            .localCheckpoint()
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy("row", "col").agg(F.sum("dep").cast("long").alias("n_dep"))
        .orderBy("row", "col")
    )


# -- elevation above stream + downslope distance to stream (§2.12;
# GeasyTools ElevAboveCreek.java — HAND): stream-restricted binary lifting
# on the Spark side; sequential walker oracle (stop at the first stream
# cell).  hand is dyadic-exact; dist rounds 6.
_EAS_T = 10
_EAS_K = 300


def _eas_oracle() -> str:
    nr = "u.cr + " + _D8_TGT_DR.replace("code", "p.code")
    nc = "u.cc + " + _D8_TGT_DC.replace("code", "p.code")
    ln = f"CASE WHEN p.code IN (1, 4, 32, 128) THEN {_DSI_SQ2} ELSE 1e0 END"
    return (
        f"std AS MATERIALIZED (SELECT row, col FROM acc WHERE accum >= {_EAS_T}), "
        "esd8 AS MATERIALIZED (SELECT row, col, code FROM d8), "
        "eslive AS MATERIALIZED (SELECT l.row, l.col, l.v, "
        "CASE WHEN s.row IS NOT NULL THEN 1 ELSE 0 END AS st FROM live l "
        "LEFT JOIN std s ON s.row = l.row AND s.col = l.col WHERE l.v IS NOT NULL), "
        "easit(it, srow, scol, zst, cr, cc, fl, done) AS ("
        "SELECT 0, row, col, v, row, col, 0e0, 0 FROM eslive WHERE st = 0 "
        "UNION ALL SELECT u.it + 1, u.srow, u.scol, u.zst, "
        f"CASE WHEN u.done = 1 OR p.code = 0 THEN u.cr ELSE {nr} END, "
        f"CASE WHEN u.done = 1 OR p.code = 0 THEN u.cc ELSE {nc} END, "
        f"CASE WHEN u.done = 1 OR p.code = 0 THEN u.fl ELSE u.fl + ({ln}) END, "
        "CASE WHEN u.done = 1 OR p.code = 0 THEN u.done "
        "WHEN nz.st = 1 THEN 1 ELSE 0 END "
        "FROM easit u "
        "LEFT JOIN esd8 p ON p.row = u.cr AND p.col = u.cc "
        f"LEFT JOIN eslive nz ON nz.row = u.cr + {_D8_TGT_DR.replace('code', 'p.code')} "
        f"AND nz.col = u.cc + {_D8_TGT_DC.replace('code', 'p.code')} "
        f"WHERE u.it < {_EAS_K})"
    )


@Q.register(
    "elev_above_stream",
    f"WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES}, {_eas_oracle()} "
    "SELECT srow AS row, scol AS col, "
    "CAST(ROUND(fl, 6) AS DOUBLE) AS dist_to_stream, "
    "zst - l.v AS hand "
    f"FROM easit e JOIN eslive l ON l.row = e.cr AND l.col = e.cc "
    f"WHERE e.it = {_EAS_K} AND e.done = 1 "
    "UNION ALL SELECT row, col, 0e0, 0e0 FROM eslive WHERE st = 1 "
    "ORDER BY row, col",
)
def q_elev_above_stream(spark, sf):
    from .operators.hydro import flow_accum, flow_pointer_d8, stream_relief

    ptr = flow_pointer_d8(_hydem(spark))
    acc = flow_accum(ptr)
    stream = acc.where(F.col("accum") >= _EAS_T).select("row", "col")
    z = R.explode_cells(_hydem(spark)).where(F.col("value") != _ND) \
        .withColumnRenamed("value", "z")
    cells = ptr.join(z, ["row", "col"])
    return stream_relief(cells, stream).orderBy("row", "col")


# -- MedianUpstreamArea (§2.12; GeasyTools MedianUpstreamArea.java:300-460):
# per creek cell, the median of the upslope-area values over all upstream
# creek cells (self-inclusive); creek directions are steepest descent among
# strictly-lower creek neighbors, first scan-order index (N,NW,W,SW,S,SE,E,NE)
# winning ties.  Spark = doubling closure over the creek forest (O(log path)
# self-joins); oracle = recursive-CTE closure + MEDIAN.  Median of integer
# counts is dyadic (x or x.5) -> exact cross-engine, no rounding.
_MUA_T = 10
_MUA_CI = (
    "CASE WHEN b.col - a.col = 0 AND b.row - a.row = -1 THEN 0 "
    "WHEN b.col - a.col = -1 AND b.row - a.row = -1 THEN 1 "
    "WHEN b.col - a.col = -1 AND b.row - a.row = 0 THEN 2 "
    "WHEN b.col - a.col = -1 AND b.row - a.row = 1 THEN 3 "
    "WHEN b.col - a.col = 0 AND b.row - a.row = 1 THEN 4 "
    "WHEN b.col - a.col = 1 AND b.row - a.row = 1 THEN 5 "
    "WHEN b.col - a.col = 1 AND b.row - a.row = 0 THEN 6 "
    "ELSE 7 END"
)


@Q.register(
    "median_upstream_area",
    f"""WITH RECURSIVE {_HYD_BASE}, {_HYD_EDGES},
ck AS MATERIALIZED (SELECT a.row, a.col, l.v AS z, CAST(a.accum AS DOUBLE) AS ua
  FROM acc a JOIN live l ON l.row = a.row AND l.col = a.col
  WHERE a.accum >= {_MUA_T}),
cnb AS (SELECT a.row AS ur, a.col AS uc, b.row AS xr, b.col AS xc,
  (a.z - b.z) / (CASE WHEN a.row <> b.row AND a.col <> b.col
    THEN 1.4142135623730951e0 ELSE 1e0 END) AS slope, {_MUA_CI} AS ci
  FROM ck a JOIN ck b ON b.row BETWEEN a.row - 1 AND a.row + 1
    AND b.col BETWEEN a.col - 1 AND a.col + 1
    AND NOT (b.row = a.row AND b.col = a.col)
  WHERE b.z < a.z),
ced AS MATERIALIZED (SELECT ur, uc, xr, xc FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY ur, uc
    ORDER BY slope DESC, ci ASC) AS rn FROM cnb) t WHERE rn = 1),
cup(ur, uc, xr, xc) AS (SELECT ur, uc, xr, xc FROM ced UNION
  SELECT u.ur, u.uc, e.xr, e.xc FROM cup u
  JOIN ced e ON e.ur = u.xr AND e.uc = u.xc),
allp AS (SELECT row AS ur, col AS uc, row AS xr, col AS xc FROM ck
  UNION ALL SELECT ur, uc, xr, xc FROM cup)
SELECT p.xr AS row, p.xc AS col, MEDIAN(k.ua) AS mua
FROM allp p JOIN ck k ON k.row = p.ur AND k.col = p.uc
GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_median_upstream_area(spark, sf):
    from .operators.hydro import (
        flow_accum, flow_pointer_d8, median_upstream_area,
    )

    ptr = flow_pointer_d8(_hydem(spark))
    acc = flow_accum(ptr)
    z = R.explode_cells(_hydem(spark)).where(F.col("value") != _ND) \
        .withColumnRenamed("value", "z")
    return median_upstream_area(z, acc, threshold=_MUA_T).orderBy("row", "col")


# -- BranchLength (§2.12; TerrainAnalysisTools BranchLength.java:246-420):
# per adjacent pair (E/SE/S/SW), both flowpaths trace to their FIRST common
# cell; each side's candidate = its along-path distance to the meet (full
# path length when terminals differ); cell output = MAX over its pairs.
# Spark = binary-lifting lowest-common-descendant (O(log path) joins);
# oracle = recursive path closure with distance + argmin-common.  Round(6)
# for the lifted-vs-sequential length association.
@Q.register(
    "branch_length",
    f"""WITH RECURSIVE {_HYD_BASE},
bed AS (SELECT row, col, row + {_D8_TGT_DR} AS nr, col + {_D8_TGT_DC} AS nc,
  CASE WHEN code IN (1, 4, 32, 128) THEN 1.4142135623730951e0 ELSE 1e0 END AS sl
  FROM d8 WHERE code > 0),
pc(row, col, cr, cc, dist) AS (SELECT row, col, row, col, 0e0 FROM d8
  UNION ALL SELECT p.row, p.col, e.nr, e.nc, p.dist + e.sl
  FROM pc p JOIN bed e ON e.row = p.cr AND e.col = p.cc),
pl AS (SELECT row, col, MAX(dist) AS plen FROM pc GROUP BY 1, 2),
prs AS MATERIALIZED (SELECT a.row AS ar, a.col AS ac,
  a.row + o.dr AS br, a.col + o.dc AS bc
  FROM d8 a JOIN (VALUES (0, 1), (1, 1), (1, 0), (1, -1)) o(dr, dc) ON TRUE
  JOIN d8 b ON b.row = a.row + o.dr AND b.col = a.col + o.dc),
cm AS (SELECT pr.ar, pr.ac, pr.br, pr.bc, ca.dist AS da, cb.dist AS db,
  ROW_NUMBER() OVER (PARTITION BY pr.ar, pr.ac, pr.br, pr.bc
    ORDER BY ca.dist ASC) AS rn
  FROM prs pr JOIN pc ca ON ca.row = pr.ar AND ca.col = pr.ac
  JOIN pc cb ON cb.row = pr.br AND cb.col = pr.bc
    AND cb.cr = ca.cr AND cb.cc = ca.cc),
meet AS MATERIALIZED (SELECT ar, ac, br, bc, da, db FROM cm WHERE rn = 1),
nm AS (SELECT pr.ar, pr.ac, pr.br, pr.bc, la.plen AS da, lb.plen AS db
  FROM prs pr LEFT JOIN meet m ON m.ar = pr.ar AND m.ac = pr.ac
    AND m.br = pr.br AND m.bc = pr.bc
  JOIN pl la ON la.row = pr.ar AND la.col = pr.ac
  JOIN pl lb ON lb.row = pr.br AND lb.col = pr.bc
  WHERE m.ar IS NULL),
co AS (SELECT ar AS row, ac AS col, da AS bl FROM meet
  UNION ALL SELECT br, bc, db FROM meet
  UNION ALL SELECT ar, ac, da FROM nm
  UNION ALL SELECT br, bc, db FROM nm)
SELECT row, col, CAST(ROUND(MAX(bl), 6) AS DOUBLE) AS bl
FROM co GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_branch_length(spark, sf):
    from .operators.hydro import branch_length, flow_pointer_d8

    return branch_length(flow_pointer_d8(_hydem(spark))).orderBy("row", "col")


# -- exposure towards a wind flux (§2.5; TerrainAnalysisTools
# ExposureTowardsWindFlux.java:262-283, slope/aspect/horizon-angle mode):
# exposure = cos(slope)*sin(HA) + sin(slope)*cos(HA)*cos(relAspect), all
# angles from the engine's round-6 degree kernels (slope, aspect, east
# horizon angle) so both engines branch on identical inputs; relAspect =
# angular distance of the aspect from the east azimuth folded to [0, 180]
# (the relative_aspect fold).  Cells without an eastern horizon sample
# (last column of each row) are omitted, mirroring the HA raster extent.
@Q.register(
    "wind_exposure",
    f"""WITH {_RASF}, {_W9}, live AS (SELECT * FROM ras WHERE {_NDF}),
slp AS (SELECT row, col, (FLOOR(({_SLOPE_SQL}) * 1e6 + 0.5e0) / 1e6) AS sd
  FROM w9 {_FULLW}),
asp AS (SELECT row, col, (FLOOR(({_ASPECT_SQL}) * 1e6 + 0.5e0) / 1e6) AS value
  FROM w9 {_FULLW}),
ra AS (SELECT row, col, LEAST({_REL_D}, 360e0 - {_REL_D}) AS rd FROM asp),
ha AS (SELECT a.row, a.col,
  (FLOOR(DEGREES(ATAN(MAX((b.value - a.value) / (b.col - a.col)))) * 1e6 + 0.5e0) / 1e6) AS hd
  FROM live a JOIN live b ON b.row = a.row AND b.col > a.col GROUP BY 1, 2)
SELECT s.row, s.col,
  (FLOOR((COS(RADIANS(s.sd)) * SIN(RADIANS(h.hd))
    + SIN(RADIANS(s.sd)) * COS(RADIANS(h.hd)) * COS(RADIANS(r.rd)))
    * 1e6 + 0.5e0) / 1e6) AS value
FROM slp s JOIN ra r ON r.row = s.row AND r.col = s.col
JOIN ha h ON h.row = s.row AND h.col = s.col
ORDER BY 1, 2""",
)
def q_wind_exposure(spark, sf):
    slp = _explode_focal(spark, "slope").withColumnRenamed("value", "sd")
    asp = _explode_focal(spark, "aspect")
    ra = asp.select(
        "row", "col",
        F.expr(f"LEAST({_REL_D}, 360e0 - {_REL_D})").alias("rd"),
    )
    ha = q_horizon_angle(spark, sf).withColumnRenamed("horizon_deg", "hd")
    return (
        slp.join(ra, ["row", "col"]).join(ha, ["row", "col"])
        .select(
            "row", "col",
            F.expr(
                "FLOOR((COS(RADIANS(sd)) * SIN(RADIANS(hd)) "
                "+ SIN(RADIANS(sd)) * COS(RADIANS(hd)) * COS(RADIANS(rd))) "
                "* 1e6 + 0.5e0) / 1e6"
            ).alias("value"),
        )
        .orderBy("row", "col")
    )


# -- ExtractValleysLowerQuartile (§2.12; StreamNetworkAnalysisTools
# ExtractValleysLowerQuartile.java:244-263, filter_size=3): cell = 1 iff
# z <= the (n/4)-th smallest valid window value (0-indexed, n = valid
# count; the reference's circular filterShape mask is dead code — the
# window is the full square).  Exact integer/order-statistic compare, no
# rounding.
@Q.register(
    "extract_valleys_lq",
    f"WITH {_RASF}, {_NBR2} SELECT row, col, "
    "CASE WHEN av <= (LIST(bv ORDER BY bv) FILTER (bv != -32768e0))"
    "[CAST(FLOOR(COUNT(*) FILTER (bv != -32768e0) / 4) AS INT) + 1] "
    "THEN 1e0 ELSE 0e0 END AS value "
    f"FROM nbr2 WHERE bv IS NOT NULL GROUP BY row, col, av "
    "HAVING COUNT(*) FILTER (bv != -32768e0) > 0 ORDER BY row, col",
)
def q_extract_valleys_lq(spark, sf):
    return _explode_focal(spark, "valley_lq")


# -- FilterAdaptive (§2.5; ImageProcessingTools FilterAdaptive.java:258-288):
# replace the center with the 8-neighbor mean iff |z - mean| > 1.5 sigma
# (population); sigma <= 0 resolves to the mean on both of the reference's
# ratio branches (inf -> replace, NaN -> keep == mean); needs n > 2 valid
# neighbors.  Sums of <= 8 dyadic values are exact -> no rounding.
@Q.register(
    "filter_adaptive",
    f"""WITH {_RASF},
nbx AS (SELECT a.row, a.col, a.value AS av, b.value AS bv
  FROM ras a JOIN ras b ON b.row BETWEEN a.row - 1 AND a.row + 1
    AND b.col BETWEEN a.col - 1 AND a.col + 1
    AND NOT (b.row = a.row AND b.col = a.col)
  WHERE a.value != {R.NODATA!r}e0),
ag AS (SELECT row, col, av,
  COUNT(*) FILTER (bv != {R.NODATA!r}e0) AS n,
  SUM(bv) FILTER (bv != {R.NODATA!r}e0) AS s,
  SUM(bv * bv) FILTER (bv != {R.NODATA!r}e0) AS s2
  FROM nbx GROUP BY 1, 2, 3
  HAVING COUNT(*) FILTER (bv != {R.NODATA!r}e0) > 2)
SELECT row, col, CASE
  WHEN s2 / n - (s / n) * (s / n) <= 0e0 THEN s / n
  WHEN ABS(av - s / n) > 1.5e0 * SQRT(s2 / n - (s / n) * (s / n)) THEN s / n
  ELSE av END AS value
FROM ag ORDER BY row, col""",
)
def q_filter_adaptive(spark, sf):
    return _explode_focal(spark, "adaptive")


# -- OSAVI (§2.13; ImageProcessingTools OSAVI.java:218-230): the
# soil-adjusted NDVI variant (NIR - red) / (NIR + red + 0.16); the
# reference's zero guard tests NIR + red (not the shifted denominator).
@Q.register(
    "osavi",
    f"WITH {_RAS}, {_RAS2} SELECT a.row, a.col, "
    "(a.value - b.value) / (a.value + b.value + 16e-2) AS value "
    "FROM ras a JOIN ras2 b USING (row, col) "
    f"WHERE a.value != {R.NODATA!r}e0 AND b.value != {R.NODATA!r}e0 "
    "AND a.value + b.value != 0e0 ORDER BY a.row, a.col",
)
def q_osavi(spark, sf):
    out = R.zip_algebra(
        _dem(spark, 0), _dem(spark, 1),
        f"CASE WHEN x + y = 0e0 THEN {R.NODATA!r}e0 "
        "ELSE (x - y) / (x + y + 16e-2) END",
    )
    return (
        R.explode_cells(out).where(F.col("value") != _ND).orderBy("row", "col")
    )


# -- Min/MaxAbsOverlay (§2.7; GISTools MaxAbsOverlay.java:208-232 and the
# Min/Max siblings): per cell across the stack, the FIRST band whose
# |z| (resp. z) is strictly extreme wins — strict compares preserve the
# earliest band on ties; nodata bands are skipped per cell.  Three-band
# stack; exact compares, no rounding.
_MAXABS_PICK = (
    "CASE WHEN {b} IS NOT NULL AND ({v} IS NULL OR {b} * {b} > {v} * {v}) "
    "THEN {b} ELSE {v} END"
)


@Q.register(
    "max_abs_overlay",
    f"""WITH {_RAS}, {_RAS2}, {_RAS3},
st AS (SELECT a.row, a.col,
  NULLIF(a.value, {R.NODATA!r}e0) AS v0,
  NULLIF(b.value, {R.NODATA!r}e0) AS v1,
  NULLIF(c.value, {R.NODATA!r}e0) AS v2
  FROM ras a JOIN ras2 b USING (row, col) JOIN ras3 c USING (row, col)),
p1 AS (SELECT row, col, v1, v2, {_MAXABS_PICK.format(b='v0', v='CAST(NULL AS DOUBLE)')} AS pk FROM st),
p2 AS (SELECT row, col, v2, {_MAXABS_PICK.format(b='v1', v='pk')} AS pk FROM p1),
p3 AS (SELECT row, col, {_MAXABS_PICK.format(b='v2', v='pk')} AS pk FROM p2)
SELECT row, col, pk AS value FROM p3 WHERE pk IS NOT NULL ORDER BY row, col""",
)
def q_max_abs_overlay(spark, sf):
    m = (
        R.explode_cells(_dem(spark, 0)).withColumnRenamed("value", "a")
        .join(R.explode_cells(_dem(spark, 1)).withColumnRenamed("value", "b"),
              ["row", "col"])
        .join(R.explode_cells(_dem(spark, 2)).withColumnRenamed("value", "c"),
              ["row", "col"])
        .select(
            "row", "col",
            F.expr(f"NULLIF(a, {R.NODATA!r}e0)").alias("v0"),
            F.expr(f"NULLIF(b, {R.NODATA!r}e0)").alias("v1"),
            F.expr(f"NULLIF(c, {R.NODATA!r}e0)").alias("v2"),
        )
    )
    pick0 = _MAXABS_PICK.format(b="v0", v="CAST(NULL AS DOUBLE)")
    pick1 = _MAXABS_PICK.format(b="v1", v=f"({pick0})")
    pick2 = _MAXABS_PICK.format(b="v2", v=f"({pick1})")
    return (
        m.select("row", "col", F.expr(pick2).alias("value"))
        .where(F.col("value").isNotNull())
        .orderBy("row", "col")
    )


# -- MassFluxDinf (§2.12; GeasyTools MassFluxDinf.java:300-390): D-infinity
# proportional mass transport flux(c) = load(c) + sum w(u->c) * eff(u) *
# (flux(u) - absorp(u)) — the reference applies NO zero clamp (unlike the
# D8 variant), so the transport is affine-linear and the engine runs it
# through the fd8 two-pass condensed border solve.  Same dyadic eff/absorp
# surfaces as mass_flux; oracle = Jacobi with the affine transfer over the
# Dinf weight edges; round(4).
def _mfdinf_oracle() -> str:
    base = _dinf_accum_oracle()
    prefix = base[: base.index("accdi(")]
    ef = _MF_EFF.format(r="f.row", c="f.col")
    ab = _MF_ABS.format(r="f.row", c="f.col")
    return (
        prefix
        + "accmf(it, row, col, a) AS (SELECT 0, row, col, 1e0 FROM dws "
        "UNION ALL SELECT u.it + 1, e.nr, e.nc, "
        f"1e0 + COALESCE(SUM(CASE WHEN e.w >= 0e0 THEN e.w * ({ef}) * (u.a - ({ab})) END), 0e0) "
        "FROM accmf u JOIN eplusd e ON e.row = u.row AND e.col = u.col "
        "JOIN dws f ON f.row = u.row AND f.col = u.col "
        f"WHERE u.it < {_F8K} GROUP BY 1, 2, 3)"
    )


@Q.register(
    "mass_flux_dinf",
    f"WITH RECURSIVE {_mfdinf_oracle()} "
    "SELECT row, col, CAST(ROUND(a, 4) AS DOUBLE) AS flux "
    f"FROM accmf WHERE it = {_F8K} ORDER BY row, col",
)
def q_mass_flux_dinf(spark, sf):
    from .operators.hydro import mass_flux_dinf

    dem = R.synth_raster(spark, _DROWS, _DCOLS)
    cells = R.explode_cells(dem).where(F.col("value") != _ND)
    fields = cells.select(
        "row", "col",
        F.lit(1.0).alias("load"),
        F.expr(_MF_EFF.format(r="row", c="col")).alias("eff"),
        F.expr(_MF_ABS.format(r="row", c="col")).alias("absorp"),
    )
    return mass_flux_dinf(dem, fields, tile=30).orderBy("row", "col")


# -- WallWatershed (§2.12; HydroTools WallWatershed.java:255-280, raster
# mode): watershed cells with ANY of the 8 neighbor positions holding a
# DIFFERENT label (off-grid / nodata count as different) get dem +
# increment; the reference leaves interior watershed cells at the
# output's nodata init (only the walls and the outside survive — here
# every live cell is in some watershed, so the result is the wall set).
_WW_INC = "100e0"


@Q.register(
    "wall_watershed",
    f"""WITH RECURSIVE {_HYD_BASE},
edges AS (SELECT row * 1000000 + col AS id,
  (row + {_DRC.replace('code', 'code')}) * 1000000 +
  (col + {_DCC.replace('code', 'code')}) AS nid FROM d8 WHERE code > 0),
terminals AS (SELECT row * 1000000 + col AS id FROM d8 WHERE code = 0),
walk(id, cur) AS (SELECT id, id FROM (SELECT row * 1000000 + col AS id FROM d8)
  UNION SELECT w.id, e.nid FROM walk w JOIN edges e ON e.id = w.cur),
root AS (SELECT w.id, w.cur AS ws FROM walk w JOIN terminals t ON w.cur = t.id),
wsl AS MATERIALIZED (SELECT CAST(FLOOR(r.id / 1000000) AS BIGINT) AS row,
  CAST(r.id % 1000000 AS BIGINT) AS col, r.ws
  FROM root r JOIN live l ON l.row * 1000000 + l.col = r.id
  WHERE l.v IS NOT NULL),
cnt AS (SELECT a.row, a.col, COUNT(b.row) AS nsame
  FROM wsl a LEFT JOIN wsl b ON b.row BETWEEN a.row - 1 AND a.row + 1
    AND b.col BETWEEN a.col - 1 AND a.col + 1
    AND NOT (b.row = a.row AND b.col = a.col) AND b.ws = a.ws
  GROUP BY 1, 2)
SELECT c.row, c.col, l.v + {_WW_INC} AS walled
FROM cnt c JOIN live l ON l.row = c.row AND l.col = c.col
WHERE c.nsame < 8 ORDER BY 1, 2""",
)
def q_wall_watershed(spark, sf):
    from .operators.hydro import flow_pointer_d8, watershed

    dem = _hydem(spark)
    ws = watershed(flow_pointer_d8(dem))
    offs = ", ".join(f"struct({dr}L AS dr, {dc}L AS dc)"
                     for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                     if not (dr == 0 and dc == 0))
    a = ws.select("row", "col", "ws",
                  F.expr(f"explode(array({offs}))").alias("_o")) \
        .select("row", "col", "ws",
                (F.col("row") + F.col("_o.dr")).alias("nrow"),
                (F.col("col") + F.col("_o.dc")).alias("ncol"))
    b = ws.select(F.col("row").alias("nrow"), F.col("col").alias("ncol"),
                  F.col("ws").alias("nws"))
    nsame = (
        a.join(b, ["nrow", "ncol"], "left")
        .groupBy("row", "col")
        .agg(F.count(F.when(F.col("nws") == F.col("ws"), 1)).alias("nsame"))
    )
    z = R.explode_cells(dem).where(F.col("value") != _ND)
    return (
        nsame.where(F.col("nsame") < 8)
        .join(z, ["row", "col"])
        .select("row", "col", F.expr(f"value + {_WW_INC}").alias("walled"))
        .orderBy("row", "col")
    )


# -- ConvertNoDataToZero (§2.2; ConversionTools ConvertNoDataToZero.java):
# nodata cells become 0, everything else passes through — full-extent
# output (the one raster query that does NOT filter nodata).
@Q.register(
    "nodata_to_zero",
    f"WITH {_RAS} SELECT row, col, "
    f"CASE WHEN value = {R.NODATA!r}e0 THEN 0e0 ELSE value END AS value "
    "FROM ras ORDER BY row, col",
)
def q_nodata_to_zero(spark, sf):
    # map_algebra's nodata passthrough is exactly what this tool REMOVES,
    # so the lambda applies to the raw values array directly
    out = _dem(spark).withColumn(
        "values",
        F.expr(f"transform(values, v -> CASE WHEN v = {R.NODATA!r}e0 "
               "THEN 0e0 ELSE v END)"),
    )
    return R.explode_cells(out).orderBy("row", "col")


# -- TurningBands random-field simulation (§2.13; RasterCreation
# TurningBands.java:258-395, standard mode, LCG-determinized like
# stochastic_depressions): K band lines between random edge points; a 1D
# LCG noise process filtered by the moving triangular gradient (w * sum
# m*T[j+h+m], zeros past the band end per the reference's unfilled tail);
# every cell adds the band value at the truncated distance from the band
# start to its perpendicular projection (the reference's own minus-sign
# projection frame, mirrored verbatim); output = mean over the K bands.
# ALL noise and line constants are derived in Python at query-build time
# and embedded as identical literals in both plans, so the per-cell
# arithmetic (one sqrt + clamps per band) is bit-deterministic — no
# rounding anywhere.
_TB_K = 6
_TB_H = 5  # filterHalfSize


def _tb_lit(v: float) -> str:
    s = repr(float(v))
    return s if "e" in s or "inf" in s or "nan" in s else s + "e0"


def _tb_constants():
    import math

    diag = int(math.sqrt(ROWS * ROWS + COLS * COLS))
    h = _TB_H
    fs = 2 * h + 1
    w = math.sqrt(36.0 / (h * (h + 1) * fs))
    s = 987654321
    out = []

    def nxt():
        nonlocal s
        s = (s * 1103515245 + 12345) % (2 ** 31)
        return s

    for _ in range(_TB_K):
        T = [0.0] * (diag + 2 * h)
        for j in range(diag):
            T[j] = 2.0 * (nxt() / 2.0 ** 31) - 1.0
        y = [w * sum(m * T[j + h + m] for m in range(-h, h + 1))
             for j in range(diag)]
        e1 = nxt() % 4
        e2 = e1
        while e2 == e1:
            e2 = nxt() % 4

        def edge_pt(e):
            u = nxt() / 2.0 ** 31
            if e == 0:
                return 0.0, u * (ROWS - 1)
            if e == 1:
                return u * (COLS - 1), 0.0
            if e == 2:
                return float(COLS - 1), u * (ROWS - 1)
            return u * (COLS - 1), float(ROWS - 1)

        p1x, p1y = edge_pt(e1)
        p2x, p2y = edge_pt(e2)
        while p1x == p2x or p1y == p2y:
            p2x, p2y = edge_pt(e2)
        ls = (p2y - p1y) / (p2x - p1x)
        li = p1y - ls * p1x
        ps = -1.0 / ls
        sd = ls - ps
        corners = []
        for (rr, cc) in ((0, 0), (0, COLS), (ROWS, 0), (ROWS, COLS)):
            pi = rr - ps * cc
            cx = (pi - li) / sd
            cy = ls * cx - li  # reference's own minus-sign frame
            corners.append((cx, cy))
        sx, sy = min(corners, key=lambda c: c[1])
        out.append((y, ls, li, ps, sd, sx, sy, diag))
    return out


def _tb_cell_expr(r: str, c: str, elem: str) -> str:
    """Shared per-cell formula text; `elem` formats (list_literal, idx)."""
    terms = []
    for (y, ls, li, ps, sd, sx, sy, diag) in _tb_constants():
        ix = f"((({r}) - {_tb_lit(ps)} * ({c}) - {_tb_lit(li)}) / {_tb_lit(sd)})"
        iy = f"({_tb_lit(ls)} * {ix} - {_tb_lit(li)})"
        p = (f"LEAST(GREATEST(CAST(FLOOR(SQRT(({ix} - {_tb_lit(sx)}) * "
             f"({ix} - {_tb_lit(sx)}) + ({iy} - {_tb_lit(sy)}) * "
             f"({iy} - {_tb_lit(sy)}))) AS INT), 0), {diag - 1})")
        lst = ", ".join(_tb_lit(v) for v in y)
        terms.append(elem.format(lst=lst, idx=f"{p} + 1"))
    return "(" + " + ".join(terms) + f") / {_TB_K}e0"


@Q.register(
    "turning_bands",
    f"WITH {_RAS} SELECT row, col, "
    + _tb_cell_expr("row", "col", "([{lst}])[{idx}]")
    + f" AS value FROM ras WHERE {_NDF} ORDER BY row, col",
)
def q_turning_bands(spark, sf):
    cells = R.explode_cells(_dem(spark)).where(F.col("value") != _ND)
    expr = _tb_cell_expr("row", "col", "element_at(array({lst}), {idx})")
    return cells.select("row", "col", F.expr(expr).alias("value")) \
        .orderBy("row", "col")


# -- DownslopeIndex_Radius (§2.12; GeasyTools DownslopeIndex_Radius.java:
# 300-360, tangent mode): expanding Chebyshev-ring search for the nearest
# cell with elevation drop > d; the loop stops at the FIRST ring containing
# a qualifying cell and takes that ring's min Euclidean distance (strict <
# with i-then-j scan order on ties — mirrored as the rank key), so a
# diagonal ring-r cell can beat a nearer ring-(r+1) cell, per reference.
# Output = heightDiff / distance; cells <= global_min + d are skipped.
_DIR_D = "4e0"
_DIR_R = 6


def _dir_offsets():
    out = []
    for r in range(1, _DIR_R + 1):
        for i in range(-r, r + 1):          # i = column offset (outer loop)
            for j in range(-r, r + 1):      # j = row offset (inner loop)
                if abs(i) > r - 1 or abs(j) > r - 1:
                    out.append((i, j, r))
    return out


_DIR_VALS = ", ".join(f"({i}, {j}, {r})" for i, j, r in _dir_offsets())


@Q.register(
    "downslope_index_radius",
    f"""WITH {_RASF}, live AS MATERIALIZED (SELECT * FROM ras WHERE {_NDF}),
mn AS (SELECT MIN(value) AS zmin FROM live),
probes AS MATERIALIZED (
  -- PLAIN-column neighbor keys first: joining live b on a.row + o.j
  -- expressions sends DuckDB into a nested-loop plan (3.6M x 21.6k);
  -- materializing the shifted keys keeps it a hash join
  SELECT a.row, a.col, a.value, o.ring, o.i, o.j,
    SQRT(CAST(o.i * o.i + o.j * o.j AS DOUBLE)) AS dist,
    a.row + o.j AS nrow, a.col + o.i AS ncol
  FROM live a JOIN (VALUES {_DIR_VALS}) o(i, j, ring) ON TRUE
  JOIN mn ON a.value > mn.zmin + {_DIR_D}),
cand AS (SELECT p.row, p.col, p.ring, p.i, p.j, p.dist,
  p.value - b.value AS hd
  FROM probes p JOIN live b ON b.row = p.nrow AND b.col = p.ncol
  WHERE p.value - b.value > {_DIR_D}),
rk AS (SELECT row, col, hd / dist AS di,
  ROW_NUMBER() OVER (PARTITION BY row, col
    ORDER BY ring, dist, i, j) AS rn FROM cand)
SELECT row, col, di FROM rk WHERE rn = 1 ORDER BY row, col""",
)
def q_downslope_index_radius(spark, sf):
    from pyspark.sql import Window

    live = R.explode_cells(_demf(spark)).where(F.col("value") != _ND)
    zmin = live.agg(F.min("value").alias("zmin"))
    # offsets as a broadcast TABLE, not a 168-struct literal array: a big
    # generator literal blows codegen into interpreted stragglers, while a
    # broadcast-hash join stays whole-stage
    import math

    offs = spark.createDataFrame(
        [(i, j, r, float(math.sqrt(i * i + j * j)))
         for i, j, r in _dir_offsets()],
        "i long, j long, ring int, dist double",
    )
    a = live.crossJoin(F.broadcast(offs)).select(
        "row", "col", "value", "i", "j", "ring", "dist",
        (F.col("row") + F.col("j")).alias("nrow"),
        (F.col("col") + F.col("i")).alias("ncol"),
    )
    b = live.select(F.col("row").alias("nrow"), F.col("col").alias("ncol"),
                    F.col("value").alias("nv"))
    cand = (
        a.join(b, ["nrow", "ncol"])
        .crossJoin(F.broadcast(zmin))
        .where((F.col("value") > F.col("zmin") + F.expr(_DIR_D))
               & (F.col("value") - F.col("nv") > F.expr(_DIR_D)))
        .select("row", "col", "ring", "i", "j", "dist",
                (F.col("value") - F.col("nv")).alias("hd"))
    )
    w = Window.partitionBy("row", "col").orderBy("ring", "dist", "i", "j")
    return (
        cand.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
        .select("row", "col", (F.col("hd") / F.col("dist")).alias("di"))
        .orderBy("row", "col")
    )


# -- StreamHeadsMDInf (§2.12; WhiteboxGIS StreamHeadsMDInf.java:330-540):
# MDInf accumulation runs while a <= T; a crossing cell becomes a creek
# cell — area capped at T, exactly T forwarded along its single D8
# direction, receiver marked creek-fed (and always crosses).  head =
# crossing cell that is NOT creek-fed.  Truncation changes the downstream
# field, so the dynamics are simulated on both engines: Spark = iterative
# tile exchange with in-tile Kahn + cycle relaxation; oracle = Jacobi with
# the same per-cell mode switch over the mdinf weight edges plus the D8
# creek edges.
_SH_T = "30e0"


def _stream_heads_oracle() -> str:
    base = _mdinf_accum_oracle()
    prefix = base[: base.index("accmd(")]
    # d8 steepest pointer on the f8 fixture (same kernel text as _HYD_BASE)
    sq2 = "1.4142135623730951e0"
    rates = (
        f"COALESCE((cv - n0) / {sq2}, -1e30) AS r0, COALESCE(cv - n1, -1e30) AS r1, "
        f"COALESCE((cv - n2) / {sq2}, -1e30) AS r2, COALESCE(cv - n3, -1e30) AS r3, "
        f"COALESCE(cv - n4, -1e30) AS r4, COALESCE((cv - n5) / {sq2}, -1e30) AS r5, "
        f"COALESCE(cv - n6, -1e30) AS r6, COALESCE((cv - n7) / {sq2}, -1e30) AS r7"
    )
    code = (
        "CASE WHEN GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) <= 0e0 THEN 0 "
        "WHEN r0 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 1 "
        "WHEN r1 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 2 "
        "WHEN r2 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 4 "
        "WHEN r3 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 8 "
        "WHEN r4 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 16 "
        "WHEN r5 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 32 "
        "WHEN r6 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 64 "
        "ELSE 128 END"
    )
    return (
        prefix
        + f"ratf8 AS (SELECT row, col, {rates} FROM w9f8), "
        f"d8f8 AS (SELECT row, col, {code} AS code FROM ratf8), "
        f"d8t AS MATERIALIZED (SELECT d.row, d.col, "
        f"d.row + {_D8_TGT_DR.replace('code', 'd.code')} AS tr, "
        f"d.col + {_D8_TGT_DC.replace('code', 'd.code')} AS tc "
        "FROM d8f8 d WHERE d.code > 0), "
        "shedge AS MATERIALIZED ("
        "SELECT row, col, nr, nc, w, 0 AS isd8 FROM wemi "
        "UNION ALL SELECT t.row, t.col, t.tr, t.tc, 0e0, 1 FROM d8t t "
        "JOIN mws m ON m.row = t.tr AND m.col = t.tc "
        "UNION ALL SELECT row, col, row, col, -1e0, 0 FROM mws), "
        "shit(it, row, col, a) AS (SELECT 0, row, col, 1e0 FROM mws "
        "UNION ALL SELECT u.it + 1, e.nr, e.nc, "
        "1e0 + COALESCE(SUM(CASE WHEN e.w = -1e0 AND e.isd8 = 0 THEN NULL "
        f"WHEN u.a <= {_SH_T} THEN CASE WHEN e.isd8 = 0 THEN e.w * u.a END "
        f"ELSE CASE WHEN e.isd8 = 1 THEN {_SH_T} END END), 0e0) "
        "FROM shit u JOIN shedge e ON e.row = u.row AND e.col = u.col "
        f"WHERE u.it < {_F8K} GROUP BY 1, 2, 3), "
        f"finsh AS MATERIALIZED (SELECT row, col, a FROM shit WHERE it = {_F8K}), "
        "fedt AS (SELECT DISTINCT t.tr AS row, t.tc AS col FROM d8t t "
        f"JOIN finsh f ON f.row = t.row AND f.col = t.col AND f.a > {_SH_T})"
    )


@Q.register(
    "stream_heads_mdinf",
    f"WITH RECURSIVE {_stream_heads_oracle()} "
    f"SELECT f.row, f.col, CAST(CASE WHEN f.a > {_SH_T} AND fd.row IS NULL "
    "THEN 1 ELSE 0 END AS INT) AS head "
    "FROM finsh f LEFT JOIN fedt fd ON fd.row = f.row AND fd.col = f.col "
    "ORDER BY f.row, f.col",
)
def q_stream_heads_mdinf(spark, sf):
    from .operators.hydro import stream_heads_mdinf

    dem = R.synth_raster(spark, _DROWS, _DCOLS)
    return stream_heads_mdinf(dem, threshold=30.0, tile=30) \
        .orderBy("row", "col")


# -- SIDE_MDInf (§2.12; WhiteboxGIS SIDE_MDInf.java:270-540): per STREAM
# cell, lateral inflow split by bank side.  total = (1 - T) base + T per
# upstream stream link (D8-steepest into the cell) + accum(u) * mdinf
# weight for every adjacent NON-stream contributor u; each non-stream
# contribution lands LEFT or RIGHT of the stream via integer cross-product
# tests of (inflow vector, stream D8 vector, tributary vectors) — all-same
# tributary verdicts pick the side, disagreement / no tributary / pit /
# head-on inflow split half-half (reference's UNKNOWN).  All side tests
# are integer-exact; accum is the round-4 MDInf accumulation on both
# engines; final sums (<= 8 items) round to 6.
_SD_T = "8e0"
# side verdict per (inflow, tributary): 1 = right, 0 = left — the
# reference's zcpA/zcpB/zcpC chain, pure integer cross products
_SD_SIDE = (
    "CASE WHEN (fx * s1y - fy * s1x) * (fx * t2y - fy * t2x) > 0 "
    "THEN CASE WHEN fx * t2y - fy * t2x > 0 THEN 1 ELSE 0 END "
    "ELSE CASE WHEN s1x * t2y - s1y * t2x > 0 THEN 1 ELSE 0 END END"
)


def _sd_d8f8_sql() -> str:
    sq2 = "1.4142135623730951e0"
    rates = (
        f"COALESCE((cv - n0) / {sq2}, -1e30) AS r0, COALESCE(cv - n1, -1e30) AS r1, "
        f"COALESCE((cv - n2) / {sq2}, -1e30) AS r2, COALESCE(cv - n3, -1e30) AS r3, "
        f"COALESCE(cv - n4, -1e30) AS r4, COALESCE((cv - n5) / {sq2}, -1e30) AS r5, "
        f"COALESCE(cv - n6, -1e30) AS r6, COALESCE((cv - n7) / {sq2}, -1e30) AS r7"
    )
    code = (
        "CASE WHEN GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) <= 0e0 THEN 0 "
        "WHEN r0 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 1 "
        "WHEN r1 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 2 "
        "WHEN r2 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 4 "
        "WHEN r3 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 8 "
        "WHEN r4 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 16 "
        "WHEN r5 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 32 "
        "WHEN r6 = GREATEST(r0,r1,r2,r3,r4,r5,r6,r7) THEN 64 "
        "ELSE 128 END"
    )
    return (
        f"ratf8 AS (SELECT row, col, {rates} FROM w9f8), "
        f"d8f8 AS MATERIALIZED (SELECT row, col, {code} AS code, "
        f"{_D8_TGT_DR} AS sdr, {_D8_TGT_DC} AS sdc FROM ratf8)"
    )


def _side_mdinf_oracle() -> str:
    base = _mdinf_accum_oracle()
    prefix = base[: base.index("wedm")]  # keep rasf8..mws; rebuild edges
    return (
        prefix
        + _sd_d8f8_sql() + ", "
        + base[base.index("wedm"):]      # wedm/wemi/eplusm/accmd unchanged
        + f""",
av AS MATERIALIZED (SELECT row, col, CAST(ROUND(a, 4) AS DOUBLE) AS accum
  FROM accmd WHERE it = {_F8K}),
st AS MATERIALIZED (SELECT row, col FROM av WHERE accum >= {_SD_T}),
sinfo AS (SELECT s.row, s.col, d.code, d.sdr AS s1y, d.sdc AS s1x
  FROM st s JOIN d8f8 d ON d.row = s.row AND d.col = s.col),
trib AS (SELECT d.row + d.sdr AS row, d.col + d.sdc AS col,
  d.sdr AS t2y, d.sdc AS t2x
  FROM st u JOIN d8f8 d ON d.row = u.row AND d.col = u.col AND d.code > 0
  JOIN st s2 ON s2.row = d.row + d.sdr AND s2.col = d.col + d.sdc),
ssc AS (SELECT t.row, t.col, COUNT(*) * {_SD_T} AS c FROM trib t GROUP BY 1, 2),
nsp AS (SELECT e.nr AS row, e.nc AS col, a.accum * e.w AS contrib,
  e.nc - e.col AS fx, e.nr - e.row AS fy
  FROM wemi e JOIN st s ON s.row = e.nr AND s.col = e.nc
  JOIN av a ON a.row = e.row AND a.col = e.col
  LEFT JOIN st us ON us.row = e.row AND us.col = e.col
  WHERE us.row IS NULL),
tv AS (SELECT p.row, p.col, p.fx, p.fy,
  COUNT(*) AS ntr, MIN({_SD_SIDE}) AS smin, MAX({_SD_SIDE}) AS smax
  FROM nsp p JOIN sinfo si ON si.row = p.row AND si.col = p.col
  JOIN trib t ON t.row = p.row AND t.col = p.col
  GROUP BY 1, 2, 3, 4),
cls AS (SELECT p.row, p.col, p.contrib,
  CASE WHEN si.code = 0 THEN 2
       WHEN p.fx = -si.s1x AND p.fy = -si.s1y THEN 2
       WHEN v.ntr IS NULL OR v.smin != v.smax THEN 2
       WHEN v.smin = 1 THEN 1 ELSE 0 END AS side
  FROM nsp p JOIN sinfo si ON si.row = p.row AND si.col = p.col
  LEFT JOIN tv v ON v.row = p.row AND v.col = p.col
    AND v.fx = p.fx AND v.fy = p.fy),
agg AS (SELECT row, col,
  SUM(contrib) AS ctot,
  SUM(CASE WHEN side = 1 THEN contrib WHEN side = 2 THEN contrib / 2e0
      ELSE 0e0 END) AS cr,
  SUM(CASE WHEN side = 0 THEN contrib WHEN side = 2 THEN contrib / 2e0
      ELSE 0e0 END) AS cl
  FROM cls GROUP BY 1, 2)
SELECT s.row, s.col,
  CAST(ROUND(1e0 - {_SD_T} + COALESCE(c.c, 0e0) + COALESCE(g.ctot, 0e0), 6) AS DOUBLE) AS total,
  CAST(ROUND((1e0 - {_SD_T}) / 2e0 + COALESCE(c.c, 0e0) / 2e0 + COALESCE(g.cr, 0e0), 6) AS DOUBLE) AS bank_r,
  CAST(ROUND((1e0 - {_SD_T}) / 2e0 + COALESCE(c.c, 0e0) / 2e0 + COALESCE(g.cl, 0e0), 6) AS DOUBLE) AS bank_l
FROM st s LEFT JOIN ssc c ON c.row = s.row AND c.col = s.col
LEFT JOIN agg g ON g.row = s.row AND g.col = s.col
ORDER BY s.row, s.col"""
    )


@Q.register("side_mdinf", f"WITH RECURSIVE {_side_mdinf_oracle()}")
def q_side_mdinf(spark, sf):
    from .operators.hydro import (
        D8_OFFS, flow_pointer_d8, mdinf_accum, mdinf_weights,
    )

    dem = R.synth_raster(spark, _DROWS, _DCOLS)
    acc = mdinf_accum(dem, tile=30)          # round-4 accum, both engines
    st = acc.where(F.col("accum") >= F.expr(_SD_T)).select("row", "col")
    d8 = flow_pointer_d8(dem).select(
        "row", "col", "code",
        F.expr(_D8_TGT_DR).alias("sdr"), F.expr(_D8_TGT_DC).alias("sdc"),
    )
    sinfo = st.join(d8, ["row", "col"]).select(
        "row", "col", "code", F.col("sdr").alias("s1y"), F.col("sdc").alias("s1x"),
    )
    # upstream stream links: T each into the receiving stream cell
    trib = (
        st.join(d8, ["row", "col"]).where(F.col("code") > 0)
        .select((F.col("row") + F.col("sdr")).alias("row"),
                (F.col("col") + F.col("sdc")).alias("col"),
                F.col("sdr").alias("t2y"), F.col("sdc").alias("t2x"))
        .join(st, ["row", "col"], "left_semi")
    )
    ssc = trib.groupBy("row", "col").agg(
        (F.count(F.lit(1)) * F.expr(_SD_T)).alias("c"))
    # non-stream adjacent contributors: accum * mdinf weight into the cell
    wexp = mdinf_weights(dem).select(
        "row", "col", F.posexplode("ws").alias("j", "w")).where(F.col("w") > 0)
    offs = ", ".join(f"({j}, {dr}, {dc})" for j, (dr, dc, _) in enumerate(D8_OFFS))
    om = spark.createDataFrame(
        [(j, dr, dc) for j, (dr, dc, _) in enumerate(D8_OFFS)],
        "j int, odr long, odc long")
    nsp = (
        wexp.join(F.broadcast(om), "j")
        .select(F.col("row").alias("urow"), F.col("col").alias("ucol"), "w",
                (F.col("row") + F.col("odr")).alias("row"),
                (F.col("col") + F.col("odc")).alias("col"),
                F.col("odc").alias("fx"), F.col("odr").alias("fy"))
        .join(st, ["row", "col"], "left_semi")
        .join(st.select(F.col("row").alias("urow"), F.col("col").alias("ucol")),
              ["urow", "ucol"], "left_anti")
        .join(acc.select(F.col("row").alias("urow"), F.col("col").alias("ucol"),
                         "accum"), ["urow", "ucol"])
        .select("row", "col", "fx", "fy",
                (F.col("accum") * F.col("w")).alias("contrib"))
    )
    tv = (
        nsp.join(sinfo, ["row", "col"])
        .join(trib, ["row", "col"])
        .groupBy("row", "col", "fx", "fy")
        .agg(F.count(F.lit(1)).alias("ntr"),
             F.expr(f"MIN({_SD_SIDE})").alias("smin"),
             F.expr(f"MAX({_SD_SIDE})").alias("smax"))
    )
    cls = (
        nsp.join(sinfo, ["row", "col"])
        .join(tv, ["row", "col", "fx", "fy"], "left")
        .select("row", "col", "contrib", F.expr(
            "CASE WHEN code = 0 THEN 2 "
            "WHEN fx = -s1x AND fy = -s1y THEN 2 "
            "WHEN ntr IS NULL OR smin != smax THEN 2 "
            "WHEN smin = 1 THEN 1 ELSE 0 END").alias("side"))
    )
    agg = cls.groupBy("row", "col").agg(
        F.sum("contrib").alias("ctot"),
        F.expr("SUM(CASE WHEN side = 1 THEN contrib "
               "WHEN side = 2 THEN contrib / 2e0 ELSE 0e0 END)").alias("cr"),
        F.expr("SUM(CASE WHEN side = 0 THEN contrib "
               "WHEN side = 2 THEN contrib / 2e0 ELSE 0e0 END)").alias("cl"),
    )
    return (
        st.join(ssc, ["row", "col"], "left").join(agg, ["row", "col"], "left")
        .select(
            "row", "col",
            F.expr(f"CAST(ROUND(1e0 - {_SD_T} + COALESCE(c, 0e0) "
                   "+ COALESCE(ctot, 0e0), 6) AS DOUBLE)").alias("total"),
            F.expr(f"CAST(ROUND((1e0 - {_SD_T}) / 2e0 + COALESCE(c, 0e0) / 2e0 "
                   "+ COALESCE(cr, 0e0), 6) AS DOUBLE)").alias("bank_r"),
            F.expr(f"CAST(ROUND((1e0 - {_SD_T}) / 2e0 + COALESCE(c, 0e0) / 2e0 "
                   "+ COALESCE(cl, 0e0), 6) AS DOUBLE)").alias("bank_l"),
        )
        .orderBy("row", "col")
    )


# -- whole-raster CRS reprojection (§2.2; ConversionTools/src/plugins/
# CoordinateSystemTransformation.java:55 — the full-grid UTM<->LL remap with
# NN/bilinear resampling, VERDICT r3 missing #2).  Source = the fine LL grid
# (_RASF georeferenced lon = 30 + (col+0.5)*0.0125, lat = 41.5 - (row+0.5)*
# 0.0125); target = a 100x100 UTM grid (zone cm 33E).  Each target center
# inverse-transforms through the shared crs.INV_STAGES fragments, the
# fractional source position quantizes to 1e-6 BEFORE FLOOR (so a libm ulp
# can never flip the chosen source cell), then NN picks one cell and
# bilinear blends the 2x2 window — target cells whose window leaves the
# source grid (or touches nodata) drop identically in both engines.
from .functions import crs as _crs  # noqa: E402

_RP_LON0, _RP_DLON = "30e0", "0.0125e0"
_RP_LAT0, _RP_DLAT = "41.5e0", "0.0125e0"
_RP_TRC = 100
_RP_TGT_COLS = (
    "270000e0 + (tc + 0.5e0) * 1500e0 AS easting, "
    "4580000e0 - (tr + 0.5e0) * 1400e0 AS northing, "
    "RADIANS(33e0) AS lam0"
)
_RP_PX = (f"FLOOR(((DEGREES(lam2) - {_RP_LON0}) / {_RP_DLON} - 0.5e0) "
          "* 1e6 + 0.5e0) / 1e6")
_RP_PY = (f"FLOOR((({_RP_LAT0} - DEGREES(phi2)) / {_RP_DLAT} - 0.5e0) "
          "* 1e6 + 0.5e0) / 1e6")
_RP_BIL = ("(1e0 - fr) * (1e0 - fc) * v00 + (1e0 - fr) * fc * v01 "
           "+ fr * (1e0 - fc) * v10 + fr * fc * v11")


def _rp_idx_sql() -> str:
    base = (f"SELECT a.tr, b.tc, {_RP_TGT_COLS} "
            f"FROM range(0, {_RP_TRC}) a(tr), range(0, {_RP_TRC}) b(tc)")
    ctes, last = _crs.stages_sql(base, "rp_base", _crs.INV_STAGES, "rp")
    return (f"{ctes}, rp_pos AS (SELECT tr, tc, {_RP_PX} AS px, {_RP_PY} AS py "
            f"FROM {last}), "
            "rp_idx AS (SELECT tr, tc, "
            "CAST(FLOOR(px) AS BIGINT) AS c0, px - CAST(FLOOR(px) AS BIGINT) AS fc, "
            "CAST(FLOOR(py) AS BIGINT) AS r0, py - CAST(FLOOR(py) AS BIGINT) AS fr, "
            "CAST(FLOOR(px + 0.5e0) AS BIGINT) AS cn, "
            "CAST(FLOOR(py + 0.5e0) AS BIGINT) AS rn FROM rp_pos)")


def _rp_idx_df(spark):
    tgt = (
        spark.range(_RP_TRC).selectExpr("id AS tr")
        .crossJoin(spark.range(_RP_TRC).selectExpr("id AS tc"))
        .selectExpr("tr", "tc", *_RP_TGT_COLS.split(", "))
    )
    pos = _crs.apply_stages(tgt, _crs.INV_STAGES).selectExpr(
        "tr", "tc", f"{_RP_PX} AS px", f"{_RP_PY} AS py")
    return pos.selectExpr(
        "tr", "tc",
        "CAST(FLOOR(px) AS BIGINT) AS c0",
        "px - CAST(FLOOR(px) AS BIGINT) AS fc",
        "CAST(FLOOR(py) AS BIGINT) AS r0",
        "py - CAST(FLOOR(py) AS BIGINT) AS fr",
        "CAST(FLOOR(px + 0.5e0) AS BIGINT) AS cn",
        "CAST(FLOOR(py + 0.5e0) AS BIGINT) AS rn",
    )


@Q.register(
    "reproject_nn",
    f"WITH {_RASF}, {_rp_idx_sql()} "
    "SELECT i.tr, i.tc, v.value FROM rp_idx i "
    "JOIN ras v ON v.row = i.rn AND v.col = i.cn "
    f"WHERE v.value != {NODATA!r}e0 ORDER BY i.tr, i.tc",
)
def q_reproject_nn(spark, sf):
    cells = R.explode_cells(_demf(spark))
    idx = _rp_idx_df(spark)
    return (
        idx.join(cells, (F.col("row") == F.col("rn")) & (F.col("col") == F.col("cn")))
        .where(F.col("value") != _ND)
        .select("tr", "tc", "value")
        .orderBy("tr", "tc")
    )


@Q.register(
    "reproject_raster",
    f"WITH {_RASF}, {_rp_idx_sql()} "
    f"SELECT i.tr, i.tc, FLOOR(({_RP_BIL.replace('v00', 'v00.value').replace('v01', 'v01.value').replace('v10', 'v10.value').replace('v11', 'v11.value')}) * 1e6 + 0.5e0) / 1e6 AS value "
    "FROM rp_idx i "
    "JOIN ras v00 ON v00.row = i.r0 AND v00.col = i.c0 "
    "JOIN ras v01 ON v01.row = i.r0 AND v01.col = i.c0 + 1 "
    "JOIN ras v10 ON v10.row = i.r0 + 1 AND v10.col = i.c0 "
    "JOIN ras v11 ON v11.row = i.r0 + 1 AND v11.col = i.c0 + 1 "
    f"WHERE {NODATA!r}e0 NOT IN (v00.value, v01.value, v10.value, v11.value) "
    "ORDER BY i.tr, i.tc",
)
def q_reproject_raster(spark, sf):
    cells = R.explode_cells(_demf(spark))
    idx = _rp_idx_df(spark)

    def src(name, dr, dc):
        return cells.select(
            (F.col("row") - dr).alias("r0"), (F.col("col") - dc).alias("c0"),
            F.col("value").alias(name),
        )

    j = (
        idx.join(src("v00", 0, 0), ["r0", "c0"])
        .join(src("v01", 0, 1), ["r0", "c0"])
        .join(src("v10", 1, 0), ["r0", "c0"])
        .join(src("v11", 1, 1), ["r0", "c0"])
        .where((F.col("v00") != _ND) & (F.col("v01") != _ND)
               & (F.col("v10") != _ND) & (F.col("v11") != _ND))
    )
    return j.select(
        "tr", "tc",
        F.expr(f"FLOOR(({_RP_BIL}) * 1e6 + 0.5e0) / 1e6").alias("value"),
    ).orderBy("tr", "tc")


# -- generic n-band stack statistics (§2.5 cross-stack family generalized;
# numberStacks, WhiteboxRasterBase.java:280-283 — VERDICT r3 missing #3) -----
_SK_BANDS = 5


def _sk_stk_sql() -> str:
    parts = [
        (f"SELECT CAST({b} AS BIGINT) AS band, r.r AS row, c.c AS col, "
         f"{cell_value_sql('r.r', 'c.c', b, COLS)} AS value "
         f"FROM range(0, {ROWS}) r(r), range(0, {COLS}) c(c)")
        for b in range(_SK_BANDS)
    ]
    return "stk AS (" + " UNION ALL ".join(parts) + ")"


@Q.register(
    "stack_stats",
    f"""WITH {_sk_stk_sql()},
live AS (SELECT * FROM stk WHERE {_NDF}),
e AS (SELECT row, col, band, value,
  MAX(value) OVER (PARTITION BY row, col) AS _mx,
  MIN(value) OVER (PARTITION BY row, col) AS _mn,
  MAX(ABS(value)) OVER (PARTITION BY row, col) AS _ma,
  MAX(CASE WHEN band = 0 THEN value END) OVER (PARTITION BY row, col) AS _rv
FROM live)
SELECT row, col, {', '.join(f'{sql.format(ref=0)} AS {name}' for name, sql in R.STACK_AGGS.items())}
FROM e GROUP BY row, col ORDER BY row, col""",
)
def q_stack_stats(spark, sf):
    stk = None
    for b in range(_SK_BANDS):
        part = R.explode_cells(R.synth_raster(spark, ROWS, COLS, band=b)) \
            .select(F.lit(b).cast("long").alias("band"), "row", "col", "value")
        stk = part if stk is None else stk.unionByName(part)
    live = stk.where(F.col("value") != _ND)
    return R.stack_stats(live, ref_band=0)
