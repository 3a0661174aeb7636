"""Image-processing raster queries (SURVEY.md §2.13) — split from queries_raster.py (pure move, round 5)."""


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
    _RAS3,
    _RAS4,
    _VAL2,
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


