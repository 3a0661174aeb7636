"""Focal / window raster queries (SURVEY.md §2.5) — split from queries_raster.py (pure move, round 5)."""


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




from .queries_raster import (  # noqa: F401 — shared fragments (pure move)
    _ASPECT_SQL,
    _HYD_BASE,
    _HYD_EDGES,
    _SLOPE_SQL,
    _W9,
    _ZS_PAIRS,
    _hydem,
    _zs_oracle,
    q_horizon_angle,
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
