"""Relational / statistics query registry entries + DuckDB oracles.

Covers the reference's attribute-table and statistics tool surface over the
driver's TPC-H-ish tables.  Money/measure columns are fixed-decimal, so the
integer-moment policy (operators/stats.py) makes every aggregate exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import queries as Q
from .operators import stats


# -- filters / predicates (IsolateVectorFeaturesByAttribute) -------------------
@Q.register(
    "isolate_by_attribute",
    "SELECT doc_id FROM documents WHERE lang = 'en' AND n_chars > 400 ORDER BY doc_id",
)
def q_isolate(spark, sf):
    # n_chars > 400 keeps the match non-vacuous at every driver sf (64 of 218
    # 'en' docs at sf0.01) — the r4 predicate (> 800) selected zero rows, so
    # the green oracle row only proved both engines return empty.
    return (
        spark.read.parquet(f"{sf}/documents.parquet")
        .where((F.col("lang") == "en") & (F.col("n_chars") > 400))
        .select("doc_id")
        .orderBy("doc_id")
    )


# -- reclass -------------------------------------------------------------------
_RECLASS_SQL = (
    "CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 25 THEN 'medium' "
    "WHEN p_size < 40 THEN 'large' ELSE 'xl' END"
)


@Q.register(
    "reclass",
    f"SELECT {_RECLASS_SQL} AS class, COUNT(*) AS n FROM part GROUP BY 1 ORDER BY 1",
)
def q_reclass(spark, sf):
    df = spark.read.parquet(f"{sf}/part.parquet")
    out = stats.reclass(df, "p_size", [10, 25, 40], ["small", "medium", "large", "xl"])
    return out.groupBy("class").agg(F.count(F.lit(1)).alias("n")).orderBy("class")


# -- histogram / crosstab / unique ----------------------------------------------
@Q.register(
    "histogram",
    "SELECT CAST(floor(value / 25.0e0) AS BIGINT) AS bin, COUNT(*) AS n "
    "FROM events GROUP BY 1 ORDER BY 1",
)
def q_histogram(spark, sf):
    return stats.histogram(spark.read.parquet(f"{sf}/events.parquet"), "value", 25.0)


@Q.register(
    "crosstab",
    "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_crosstab(spark, sf):
    return stats.crosstab(spark.read.parquet(f"{sf}/lineitem.parquet"), "l_returnflag", "l_linestatus")


@Q.register(
    "unique_values",
    "SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY 1",
)
def q_unique(spark, sf):
    return stats.unique_values(spark.read.parquet(f"{sf}/orders.parquet"), "o_orderpriority")


# -- whole-table stats (ImageAverage/Total/StdDev/NumberOfGridCells) ------------
@Q.register(
    "table_stats",
    """WITH d AS (SELECT CAST(round(l_quantity * 100e0) AS BIGINT) AS c FROM lineitem),
g AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sum_c,
       CAST(SUM(c * c) AS BIGINT) AS sumsq_c, MIN(c) AS min_c, MAX(c) AS max_c FROM d)
SELECT n, CAST(sum_c AS DOUBLE) / n / 100 AS mean, CAST(min_c AS DOUBLE) / 100 AS vmin,
       CAST(max_c AS DOUBLE) / 100 AS vmax,
       sqrt((CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * sum_c / n) / (n - 1)) / 100e0 AS vstd
FROM g""",
)
def q_table_stats(spark, sf):
    return stats.table_stats(spark.read.parquet(f"{sf}/lineitem.parquet"), "l_quantity")


# -- correlation / regression ----------------------------------------------------
@Q.register(
    "regression",
    """WITH g AS (
  SELECT COUNT(*) AS n, SUM(l_quantity) AS sx, SUM(l_extendedprice) AS sy,
         SUM(l_quantity * l_extendedprice) AS sxy, SUM(l_quantity * l_quantity) AS sxx,
         SUM(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem)
SELECT n, ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
       ROUND((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
FROM g""",
)
def q_regression(spark, sf):
    return stats.regression(
        spark.read.parquet(f"{sf}/lineitem.parquet"), "l_quantity", "l_extendedprice"
    )


# -- joins -----------------------------------------------------------------------
@Q.register(
    "join_tables",
    "SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders FROM customer c "
    "LEFT JOIN orders o ON c.c_custkey = o.o_custkey GROUP BY 1 ORDER BY 1",
)
def q_join_tables(spark, sf):
    c = spark.read.parquet(f"{sf}/customer.parquet").select("c_custkey")
    o = spark.read.parquet(f"{sf}/orders.parquet").select("o_custkey", "o_orderkey")
    return (
        stats.join_tables(c, o, c["c_custkey"] == o["o_custkey"], "left", broadcast=False)
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@Q.register(
    "revenue_by_nation",
    """WITH li AS (
  SELECT l_orderkey, CAST(round(l_extendedprice * (1e0 - l_discount) * 10000e0) AS BIGINT) AS rev4
  FROM lineitem)
SELECT n.n_name, COUNT(*) AS n_items,
       CAST(SUM(li.rev4) AS BIGINT) AS rev4_sum,
       CAST(CAST(SUM(li.rev4) AS BIGINT) AS DOUBLE) / 10000e0 AS revenue
FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1""",
)
def q_revenue_by_nation(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey",
        F.expr("CAST(round(l_extendedprice * (1e0 - l_discount) * 10000e0) AS BIGINT)").alias("rev4"),
    )
    o = spark.read.parquet(f"{sf}/orders.parquet").select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{sf}/customer.parquet").select("c_custkey", "c_nationkey")
    n = spark.read.parquet(f"{sf}/nation.parquet")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev4").alias("rev4_sum"),
            (F.sum("rev4").cast("double") / 10000.0).alias("revenue"),
        )
        .orderBy("n_name")
    )


@Q.register(
    "pricing_summary",
    """WITH d AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100e0) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100e0) AS BIGINT) AS price_c,
         CAST(round(l_extendedprice * (1e0 - l_discount) * 10000e0) AS BIGINT) AS disc4
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00')
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
       CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
       CAST(SUM(disc4) AS BIGINT) AS sum_disc4,
       CAST(CAST(SUM(qty_c) AS BIGINT) AS DOUBLE) / COUNT(*) / 100e0 AS avg_qty
FROM d GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_pricing_summary(spark, sf):
    d = spark.read.parquet(f"{sf}/lineitem.parquet").where(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp")
    ).select(
        "l_returnflag", "l_linestatus",
        F.expr("CAST(round(l_quantity * 100e0) AS BIGINT)").alias("qty_c"),
        F.expr("CAST(round(l_extendedprice * 100e0) AS BIGINT)").alias("price_c"),
        F.expr("CAST(round(l_extendedprice * (1e0 - l_discount) * 10000e0) AS BIGINT)").alias("disc4"),
    )
    return (
        d.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qty_c").alias("sum_qty_c"),
            F.sum("price_c").alias("sum_price_c"),
            F.sum("disc4").alias("sum_disc4"),
            F.expr("CAST(SUM(qty_c) AS DOUBLE) / COUNT(*) / 100e0").alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# -- windows ----------------------------------------------------------------------
@Q.register(
    "window_topk",
    """SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk <= 3 ORDER BY o_custkey, rnk""",
)
def q_window_topk(spark, sf):
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
        .orderBy("o_custkey", "rnk")
    )


@Q.register(
    "window_lag",
    """SELECT event_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events ORDER BY event_id""",
)
def q_window_lag(spark, sf):
    from pyspark.sql import Window

    e = spark.read.parquet(f"{sf}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        # parquet ts is TIMESTAMP_NTZ; session tz is pinned to UTC so the cast
        # is deterministic (and the lag difference cancels any offset anyway)
        e.withColumn("us", F.expr("unix_micros(cast(ts as timestamp))"))
        .withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .select("event_id", "gap_us")
        .orderBy("event_id")
    )


@Q.register(
    "running_total",
    """SELECT event_id,
       CAST(SUM(CAST(round(value * 100e0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
FROM events ORDER BY event_id""",
)
def q_running_total(spark, sf):
    from pyspark.sql import Window

    e = spark.read.parquet(f"{sf}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.withColumn("cents", F.expr("CAST(round(value * 100e0) AS BIGINT)"))
        .withColumn("cum_cents", F.sum("cents").over(w))
        .select("event_id", "cum_cents")
        .orderBy("event_id")
    )


@Q.register(
    "quantile_bins",
    """SELECT event_id, CAST(ntile(4) OVER (ORDER BY value, event_id) AS BIGINT) AS quartile
FROM events ORDER BY event_id""",
)
def q_quantile_bins(spark, sf):
    return stats.quantile_bins(spark.read.parquet(f"{sf}/events.parquet"), "event_id", "value")


# -- z-scores / cdf / kappa --------------------------------------------------------
@Q.register(
    "zscores",
    """WITH d AS (SELECT event_id, CAST(round(value * 100e0) AS BIGINT) AS c FROM events),
m AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sum_c,
      CAST(SUM(c * c) AS BIGINT) AS sumsq_c FROM d)
SELECT event_id, ROUND((c - CAST(sum_c AS DOUBLE) / n) /
  sqrt((CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * sum_c / n) / (n - 1)), 6) AS z
FROM d, m ORDER BY event_id""",
)
def q_zscores(spark, sf):
    return stats.zscores(spark.read.parquet(f"{sf}/events.parquet"), "event_id", "value")


def _ks_oracle() -> str:
    mu = "(CAST(s1 AS DOUBLE) / nn / 100e0)"
    sd = "(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nn) / (nn - 1)) / 100e0)"
    z = f"((CAST(bin AS DOUBLE) / 100e0 - {mu}) / {sd})"
    phi = stats.phi_sql(z)
    gap = (
        f"GREATEST(ABS(CAST(cum AS DOUBLE) / nn - {phi}), "
        f"ABS({phi} - CAST(cum - n AS DOUBLE) / nn))"
    )
    return f"""WITH b AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS bin FROM events),
h AS (SELECT bin, COUNT(*) AS n FROM b GROUP BY 1),
m AS (SELECT CAST(SUM(bin * n) AS BIGINT) AS s1,
      CAST(SUM(bin * bin * n) AS BIGINT) AS s2, CAST(SUM(n) AS BIGINT) AS nn FROM h),
c AS (SELECT bin, n, SUM(n) OVER (ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h)
SELECT nn AS n, FLOOR(MAX({gap}) * 1e6 + 0.5e0) / 1e6 AS d
FROM c, m GROUP BY nn"""


@Q.register("ks_normality", _ks_oracle())
def q_ks_normality(spark, sf):
    """TestForNormality.java: one-sample K-S statistic vs the fitted normal."""
    return stats.ks_normality(spark.read.parquet(f"{sf}/events.parquet"), "value")


@Q.register(
    "cdf",
    """WITH h AS (SELECT CAST(floor(value / 25.0e0) AS BIGINT) AS bin, COUNT(*) AS n
                 FROM events GROUP BY 1)
SELECT bin, n, CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cum_n,
       CAST(CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS DOUBLE)
         / (SELECT COUNT(*) FROM events) AS cdf
FROM h ORDER BY bin""",
)
def q_cdf(spark, sf):
    return stats.cdf(spark.read.parquet(f"{sf}/events.parquet"), "value", 25.0)


@Q.register(
    "kappa",
    f"""WITH d AS (SELECT {Q.exprs.u1('doc_id')} % 4 AS ca, {Q.exprs.u2('doc_id')} % 4 AS cb FROM documents),
ct AS (SELECT ca, cb, COUNT(*) AS n FROM d GROUP BY 1, 2),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM ct),
po AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS po_num FROM ct WHERE ca = cb),
pe AS (SELECT CAST(COALESCE(SUM(ra.na * rb.nb), 0) AS BIGINT) AS pe_num FROM
  (SELECT ca, CAST(SUM(n) AS BIGINT) AS na FROM ct GROUP BY 1) ra
  JOIN (SELECT cb, CAST(SUM(n) AS BIGINT) AS nb FROM ct GROUP BY 1) rb ON ra.ca = rb.cb)
SELECT t.n, po.po_num, pe.pe_num,
  round((CAST(po_num AS DOUBLE) / n - CAST(pe_num AS DOUBLE) / n / n) /
        (1e0 - CAST(pe_num AS DOUBLE) / n / n), 6) AS kappa
FROM t, po, pe""",
)
def q_kappa(spark, sf):
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.expr(f"{Q.exprs.u1('doc_id')} % 4").alias("ca"),
        F.expr(f"{Q.exprs.u2('doc_id')} % 4").alias("cb"),
    )
    return stats.kappa(d, "ca", "cb")


# -- set ops (Append/MergeShapefiles = unionByName) ---------------------------------
@Q.register(
    "append_union",
    """WITH u AS (
  SELECT c_nationkey AS nationkey, CAST(round(c_acctbal * 100e0) AS BIGINT) AS bal_c FROM customer
  UNION ALL
  SELECT s_nationkey, CAST(round(s_acctbal * 100e0) AS BIGINT) FROM supplier)
SELECT nationkey, COUNT(*) AS n, CAST(SUM(bal_c) AS BIGINT) AS bal_c_sum
FROM u GROUP BY 1 ORDER BY 1""",
)
def q_append_union(spark, sf):
    c = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_nationkey").alias("nationkey"),
        F.expr("CAST(round(c_acctbal * 100e0) AS BIGINT)").alias("bal_c"),
    )
    s = spark.read.parquet(f"{sf}/supplier.parquet").select(
        F.col("s_nationkey").alias("nationkey"),
        F.expr("CAST(round(s_acctbal * 100e0) AS BIGINT)").alias("bal_c"),
    )
    return (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bal_c").alias("bal_c_sum"))
        .orderBy("nationkey")
    )


# -- medoid --------------------------------------------------------------------------
@Q.register(
    "medoid",
    f"""WITH {Q.pts_cte()},
m AS (SELECT ROUND(AVG(lon), 6) AS cx, ROUND(AVG(lat), 6) AS cy FROM pts),
d AS (SELECT doc_id, (lon - cx) * (lon - cx) + (lat - cy) * (lat - cy) AS d2 FROM pts, m)
SELECT doc_id FROM d ORDER BY d2, doc_id LIMIT 1""",
)
def q_medoid(spark, sf):
    return stats.medoid(Q._points(spark, sf), "doc_id")


# -- PCA (§2.4; PrincipalComponentAnalysis.java:273-329) -----------------------
# distributed exact-integer covariance moments + closed-form 2x2 eigen (the
# eigen step is Catalyst-side AND SQL-expressible, so the oracle verifies
# loadings and scores, not just the covariance).  Shared fragments:
# operators/stats.py PCA_COV / PCA_OUT.
_PCA_MOM = (
    "mom AS (SELECT COUNT(*) AS n, "
    "CAST(SUM(CAST(round(l_quantity * 100e0) AS BIGINT)) AS BIGINT) AS sx, "
    "CAST(SUM(CAST(round(l_extendedprice * 100e0) AS BIGINT)) AS BIGINT) AS sy, "
    "CAST(SUM(CAST(round(l_quantity * 100e0) AS BIGINT) * CAST(round(l_quantity * 100e0) AS BIGINT)) AS BIGINT) AS sxx, "
    "CAST(SUM(CAST(round(l_extendedprice * 100e0) AS BIGINT) * CAST(round(l_extendedprice * 100e0) AS BIGINT)) AS BIGINT) AS syy, "
    "CAST(SUM(CAST(round(l_quantity * 100e0) AS BIGINT) * CAST(round(l_extendedprice * 100e0) AS BIGINT)) AS BIGINT) AS sxy "
    "FROM lineitem)"
)


def _pca_cov_cte() -> str:
    cov = ", ".join(f"{e} AS {k}" for k, e in stats.PCA_COV.items())
    return f"cov AS (SELECT {cov} FROM mom)"


@Q.register(
    "pca_components",
    f"WITH {_PCA_MOM}, {_pca_cov_cte()} SELECT "
    + ", ".join(
        f"CAST(ROUND({e}, 6) AS DOUBLE) AS {k}" for k, e in stats.PCA_OUT.items()
    )
    + " FROM cov",
)
def q_pca_components(spark, sf):
    df = spark.read.parquet(f"{sf}/lineitem.parquet")
    return stats.pca2_components(df, "l_quantity", "l_extendedprice")


@Q.register(
    "pca_scores",
    f"WITH {_PCA_MOM}, {_pca_cov_cte()}, "
    "ld AS (SELECT (SELECT CAST(sx AS DOUBLE) / n / 100 FROM mom) AS mx, "
    "(SELECT CAST(sy AS DOUBLE) / n / 100 FROM mom) AS my, "
    f"{stats.PCA_OUT['v1x']} AS v1x, {stats.PCA_OUT['v1y']} AS v1y FROM cov) "
    "SELECT l.l_orderkey, l.l_linenumber, "
    "CAST(ROUND((l.l_quantity - d.mx) * d.v1x + (l.l_extendedprice - d.my) * d.v1y, 6) AS DOUBLE) AS score1, "
    "CAST(ROUND(-(l.l_quantity - d.mx) * d.v1y + (l.l_extendedprice - d.my) * d.v1x, 6) AS DOUBLE) AS score2 "
    "FROM lineitem l CROSS JOIN ld d ORDER BY l.l_orderkey, l.l_linenumber",
)
def q_pca_scores(spark, sf):
    df = spark.read.parquet(f"{sf}/lineitem.parquet")
    return stats.pca2_scores(
        df, "l_quantity", "l_extendedprice", ["l_orderkey", "l_linenumber"]
    )


# -- MergeTableWithCsv as a named tool (§2.3 row 26; Scripts
# MergeTableWithCsv.groovy): append CSV columns onto an attribute table by
# key.  The Spark side exercises the REAL csv parse path — the nation table
# is serialized to CSV lines and re-parsed with from_csv before the
# broadcast merge — so a garbled parse would mismatch the oracle, which
# reads the same columns straight from parquet.
@Q.register(
    "merge_table_csv",
    "SELECT c.c_custkey, c.c_name, n.n_name AS nation, n.n_regionkey AS regionkey "
    "FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey "
    "ORDER BY c.c_custkey",
)
def q_merge_table_csv(spark, sf):
    cust = spark.read.parquet(f"{sf}/customer.parquet").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    csv_lines = spark.read.parquet(f"{sf}/nation.parquet").select(
        F.concat_ws(",", "n_nationkey", "n_name", "n_regionkey").alias("line")
    )
    parsed = csv_lines.select(
        F.from_csv("line", "nk long, nation string, regionkey long").alias("r")
    ).select("r.*")
    return (
        cust.join(F.broadcast(parsed), cust["c_nationkey"] == parsed["nk"])
        .select("c_custkey", "c_name", "nation", "regionkey")
        .orderBy("c_custkey")
    )


# -- inverse PCA (§2.13; InversePrincipalComponentAnalysis.java):
# reconstruct the bands from the complete score set (orthogonal rotation
# back through the loadings).  The oracle checks the round trip lands
# EXACTLY on the raw inputs after round(6) — reconstruction error is
# O(1e-10) against values with 2-decimal resolution.
@Q.register(
    "inverse_pca",
    "SELECT l_orderkey, l_linenumber, "
    "CAST(ROUND(l_quantity, 6) AS DOUBLE) AS x_rec, "
    "CAST(ROUND(l_extendedprice, 6) AS DOUBLE) AS y_rec "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber",
)
def q_inverse_pca(spark, sf):
    df = spark.read.parquet(f"{sf}/lineitem.parquet")
    return stats.pca2_inverse(
        df, "l_quantity", "l_extendedprice", ["l_orderkey", "l_linenumber"]
    )
