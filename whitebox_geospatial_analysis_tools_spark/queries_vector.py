"""Vector-layer + spatial-statistics query registry entries.

Covers (SURVEY.md §2): Area/Perimeter/Centroid/Compactness per feature
(§2.4 patch metrics), Dissolve-by-attribute (§2.7), within-distance spatial
predicate (§2.2/2.3), Moran's I spatial autocorrelation
(ImageAutocorrelation, §2.4), k-means assignment step
(kMeansClassification, §2.13), attribute correlation matrix
(CorrelationForAttributes, §2.4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import queries as Q
from .functions import exprs as _X
from .operators import raster as R
from .operators import vector as V
from .operators.raster import cell_value_sql
from .sources.polygons import bbox_sql_values, vertices_sql_values

_PTS = f"WITH {Q.pts_cte()}"

# vertex table with the closing edge: LEAD wraps via COALESCE to vertex 0
_VTX = (
    f"vtx AS (SELECT * FROM {vertices_sql_values()} t(poly_id, ring, vi, nv, x, y)), "
    "seg AS (SELECT poly_id, ring, vi, x, y, "
    "COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS x2, "
    "COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS y2 "
    "FROM vtx WINDOW w AS (PARTITION BY poly_id, ring ORDER BY vi "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))"
)

_RING_AGG = (
    "rings AS (SELECT poly_id, ring, SUM(x * y2 - x2 * y) / 2e0 AS signed_area, "
    "SUM(SQRT((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y))) AS perim, "
    "SUM((x + x2) * (x * y2 - x2 * y)) AS cxs, "
    "SUM((y + y2) * (x * y2 - x2 * y)) AS cys "
    "FROM seg GROUP BY 1, 2)"
)


@Q.register(
    "feature_metrics",
    f"WITH {_VTX}, {_RING_AGG}, "
    "per AS (SELECT poly_id, "
    "SUM(CASE WHEN ring = 0 THEN ABS(signed_area) ELSE -ABS(signed_area) END) AS area, "
    "SUM(perim) AS perimeter, "
    "MAX(CASE WHEN ring = 0 THEN cxs / (6e0 * signed_area) END) AS cx, "
    "MAX(CASE WHEN ring = 0 THEN cys / (6e0 * signed_area) END) AS cy "
    "FROM rings GROUP BY 1) "
    "SELECT p.poly_id, b.category, CAST(ROUND(area, 6) AS DOUBLE) AS area, "
    "CAST(ROUND(perimeter, 6) AS DOUBLE) AS perimeter, "
    "CAST(ROUND(cx, 6) AS DOUBLE) AS cx, CAST(ROUND(cy, 6) AS DOUBLE) AS cy, "
    "CAST(ROUND(perimeter * perimeter / (4e0 * 3.141592653589793e0 * area), 6) AS DOUBLE) AS compactness "
    f"FROM per p JOIN {bbox_sql_values()} "
    "b(poly_id, category, xmin, ymin, xmax, ymax) USING (poly_id) ORDER BY p.poly_id",
)
def q_feature_metrics(spark, sf):
    return V.feature_metrics(spark).orderBy("poly_id")


# -- extended patch-shape metrics (§2.4; the PatchShapeTools 12-metric family:
# PerimeterAreaRatio.java, ShapeComplexityIndex, FractalDimension.java,
# RelatedCircumscribingCircle family).  Derived from the ROUNDED per-feature
# area/perimeter so both engines transform identical inputs; round(6) absorbs
# the LN/SQRT transcendentals.
_PM = {
    "par": "(perimeter / area)",
    "shape_index": "(perimeter / (2e0 * SQRT(PI() * area)))",
    "frac_dim": "(2e0 * LN(0.25e0 * perimeter) / LN(area))",
    "circularity": "(4e0 * PI() * area / (perimeter * perimeter))",
}


@Q.register(
    "patch_metrics",
    f"WITH {_VTX}, {_RING_AGG}, "
    "per AS (SELECT poly_id, "
    "SUM(CASE WHEN ring = 0 THEN ABS(signed_area) ELSE -ABS(signed_area) END) AS rawa, "
    "SUM(perim) AS rawp FROM rings GROUP BY 1), "
    "r6 AS (SELECT poly_id, CAST(ROUND(rawa, 6) AS DOUBLE) AS area, "
    "CAST(ROUND(rawp, 6) AS DOUBLE) AS perimeter FROM per) "
    "SELECT poly_id, "
    + ", ".join(
        f"(FLOOR({e} * 1e6 + 0.5e0) / 1e6) AS {k}" for k, e in _PM.items()
    )
    + " FROM r6 ORDER BY poly_id",
)
def q_patch_metrics(spark, sf):
    base = V.feature_metrics(spark).select("poly_id", "area", "perimeter")
    return base.select(
        "poly_id",
        *[
            F.expr(f"FLOOR({e} * 1e6 + 0.5e0) / 1e6").alias(k)
            for k, e in _PM.items()
        ],
    ).orderBy("poly_id")


@Q.register(
    "dissolve_stats",
    f"WITH {_VTX}, {_RING_AGG}, "
    "per AS (SELECT poly_id, "
    "SUM(CASE WHEN ring = 0 THEN ABS(signed_area) ELSE -ABS(signed_area) END) AS area, "
    "SUM(perim) AS perimeter FROM rings GROUP BY 1) "
    "SELECT b.category, COUNT(*) AS n_features, "
    "CAST(ROUND(SUM(ROUND(area, 6)), 6) AS DOUBLE) AS total_area, "
    "CAST(ROUND(SUM(ROUND(perimeter, 6)), 6) AS DOUBLE) AS total_perimeter "
    f"FROM per p JOIN {bbox_sql_values()} "
    "b(poly_id, category, xmin, ymin, xmax, ymax) USING (poly_id) "
    "GROUP BY 1 ORDER BY 1",
)
def q_dissolve_stats(spark, sf):
    return V.dissolve_stats(spark)


# -- geometric dissolve / Fuse (§2.4/§2.7; Scripts/Dissolve.groovy:81-202,
# VectorTools/src/plugins/Fuse.java): union of TOUCHING same-key parcels.
# Parcel layer = 4x4-cell blocks keyed by an LCG of the block id; same-key
# adjacent blocks dissolve into polyominoes (with hole rings).  Ring counts
# are oracled via the Euler characteristic of each component's cell complex:
# rings = shells + holes = 2 - (V - E + F).
_DG_N, _DG_B, _DG_K = 48, 4, 5
_DG_BC = _DG_N // _DG_B
_DG_GRP = (
    f"(((CAST(FLOOR(row / {_DG_B}e0) AS BIGINT) * {_DG_BC} "
    f"+ CAST(FLOOR(col / {_DG_B}e0) AS BIGINT)) * {_X.A} + {_X.C}) % {_X.M}) % {_DG_K}"
)


@Q.register(
    "dissolve_geom",
    f"""WITH RECURSIVE cells AS (SELECT r.r AS row, c.c AS col
  FROM range(0, {_DG_N}) r(r), range(0, {_DG_N}) c(c)),
base AS MATERIALIZED (SELECT row, col, {_DG_GRP} AS grp, row * {_DG_N} + col AS id FROM cells),
adj AS (SELECT a.id AS id, b.id AS nid FROM base a JOIN base b
  ON a.grp = b.grp AND ABS(a.row - b.row) + ABS(a.col - b.col) <= 1),
reach(id, rid) AS (SELECT id, id FROM base UNION
  SELECT r.id, a.nid FROM reach r JOIN adj a ON a.id = r.rid),
lab AS (SELECT id, MIN(rid) AS label FROM reach GROUP BY 1),
bl AS MATERIALIZED (SELECT b.row, b.col, b.grp, l.label FROM base b JOIN lab l USING (id)),
nbr4 AS (SELECT a.row, a.col, COUNT(*) AS nsame FROM bl a JOIN bl b
  ON b.label = a.label AND ABS(a.row - b.row) + ABS(a.col - b.col) = 1 GROUP BY 1, 2),
segc AS (SELECT bl.label, 4 - COALESCE(n.nsame, 0) AS nseg
  FROM bl LEFT JOIN nbr4 n ON n.row = bl.row AND n.col = bl.col),
co AS (SELECT DISTINCT label, col + o.dx AS x, row + o.dy AS y
  FROM bl, (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) o(dx, dy)),
ed AS (SELECT DISTINCT label, x, y, o FROM (
  SELECT label, col AS x, row AS y, 0 AS o FROM bl
  UNION ALL SELECT label, col, row + 1, 0 FROM bl
  UNION ALL SELECT label, col, row, 1 FROM bl
  UNION ALL SELECT label, col + 1, row, 1 FROM bl) u),
comp AS MATERIALIZED (SELECT label, MIN(grp) AS grp, COUNT(*) AS f FROM bl GROUP BY 1),
vv AS (SELECT label, COUNT(*) AS v FROM co GROUP BY 1),
ee AS (SELECT label, COUNT(*) AS e FROM ed GROUP BY 1),
rg AS (SELECT c.label, 2 - (v.v - e.e + c.f) AS n_rings
  FROM comp c JOIN vv v USING (label) JOIN ee e USING (label)),
pe AS (SELECT label, CAST(SUM(nseg) AS BIGINT) AS nseg FROM segc GROUP BY 1)
SELECT c.grp, COUNT(*) AS n_polys, CAST(SUM(c.f) AS BIGINT) AS area,
       CAST(SUM(r.n_rings) AS BIGINT) AS n_rings, CAST(SUM(pe.nseg) AS BIGINT) AS perimeter
FROM comp c JOIN rg r USING (label) JOIN pe USING (label)
GROUP BY 1 ORDER BY 1""",
)
def q_dissolve_geom(spark, sf):
    from .operators.vectorize import dissolve_geometric

    g = spark.range(_DG_N).selectExpr("id AS row").crossJoin(
        spark.range(_DG_N).selectExpr("id AS col")
    )
    cells = g.select("row", "col", F.expr(_DG_GRP).alias("grp"))
    return dissolve_geometric(cells, _DG_N)


@Q.register(
    "within_distance",
    f"{_PTS}, {Q.edges_cte()} "
    f"SELECT doc_id, CAST(ROUND(SQRT(MIN({V.SEG_D2_SQL.replace('lon', 'p.lon').replace('lat', 'p.lat')})), 6) AS DOUBLE) AS boundary_dist "
    "FROM pts p CROSS JOIN edges "
    "GROUP BY 1 HAVING MIN("
    + V.SEG_D2_SQL.replace("lon", "p.lon").replace("lat", "p.lat")
    + ") <= 4e0 ORDER BY doc_id",
)
def q_within_distance(spark, sf):
    return V.points_within_distance(Q._points(spark, sf), spark, 2.0).orderBy("doc_id")


# -- Moran's I on the synthetic raster (rook weights) -------------------------
_RROWS, _RCOLS = 120, 180
_RVAL = cell_value_sql("r.r", "c.c", 0, _RCOLS)
_MRAS = (
    f"ras AS (SELECT r.r AS row, c.c AS col, {_RVAL} AS value "
    f"FROM range(0, {_RROWS}) r(r), range(0, {_RCOLS}) c(c)), "
    f"live AS (SELECT row, col, value FROM ras WHERE value != {R.NODATA!r}e0), "
    "m AS (SELECT SUM(value) / COUNT(*) AS mu, COUNT(*) AS n FROM live), "
    "pairs AS (SELECT (a.value - m.mu) * (b.value - m.mu) AS zz "
    "FROM live a JOIN live b ON (ABS(a.row - b.row) + ABS(a.col - b.col)) = 1, m), "
    "wsum AS (SELECT COUNT(*) AS w, SUM(zz) AS num FROM pairs), "
    "dsum AS (SELECT SUM((value - m.mu) * (value - m.mu)) AS den FROM live, m)"
)


@Q.register(
    "morans_i",
    f"WITH {_MRAS} SELECT CAST(ROUND(m.n * wsum.num / (wsum.w * dsum.den), 6) AS DOUBLE) AS morans_i, "
    "wsum.w AS w_pairs FROM m, wsum, dsum",
)
def q_morans_i(spark, sf):
    cells = R.explode_cells(R.synth_raster(spark, _RROWS, _RCOLS)).where(
        F.col("value") != R.NODATA
    )
    m = cells.agg(
        (F.sum("value") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    )
    a = cells.select(F.col("row").alias("ar"), F.col("col").alias("ac"), F.col("value").alias("av"))
    b = cells.select(F.col("row").alias("br"), F.col("col").alias("bc"), F.col("value").alias("bv"))
    pairs = a.join(
        b, (F.abs(F.col("ar") - F.col("br")) + F.abs(F.col("ac") - F.col("bc"))) == 1
    ).crossJoin(F.broadcast(m))
    wsum = pairs.agg(
        F.count(F.lit(1)).alias("w"),
        F.sum((F.col("av") - F.col("mu")) * (F.col("bv") - F.col("mu"))).alias("num"),
    )
    dsum = cells.crossJoin(F.broadcast(m)).agg(
        F.sum((F.col("value") - F.col("mu")) * (F.col("value") - F.col("mu"))).alias("den"),
        F.first("n").alias("n"),
    )
    return (
        wsum.crossJoin(dsum)
        .select(
            F.round(F.col("n") * F.col("num") / (F.col("w") * F.col("den")), 6)
            .cast("double").alias("morans_i"),
            F.col("w").alias("w_pairs"),
        )
    )


# -- one Lloyd step of k-means over the point layer (§2.13) -------------------
_SEEDS = [(60.0, 40.0), (200.0, 41.0), (320.0, 42.0), (180.0, 120.0)]
_SEED_SQL = ", ".join(f"({i}, {x!r}, {y!r})" for i, (x, y) in enumerate(_SEEDS))


@Q.register(
    "kmeans_step",
    f"{_PTS}, seeds AS (SELECT * FROM (VALUES {_SEED_SQL}) s(sid, sx, sy)), "
    "assigned AS (SELECT doc_id, lon, lat, sid, "
    "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY "
    "(lon - sx) * (lon - sx) + (lat - sy) * (lat - sy), sid) AS rn "
    "FROM pts CROSS JOIN seeds) "
    "SELECT sid, COUNT(*) AS n, "
    "CAST(ROUND(SUM(lon) / COUNT(*), 6) AS DOUBLE) AS new_cx, "
    "CAST(ROUND(SUM(lat) / COUNT(*), 6) AS DOUBLE) AS new_cy "
    "FROM assigned WHERE rn = 1 GROUP BY 1 ORDER BY 1",
)
def q_kmeans_step(spark, sf):
    from pyspark.sql import Window

    pts = Q._points(spark, sf)
    seeds = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(_SEEDS)], "sid int, sx double, sy double"
    )
    d2 = (F.col("lon") - F.col("sx")) ** 2 + (F.col("lat") - F.col("sy")) ** 2
    w = Window.partitionBy("doc_id").orderBy(d2.asc(), F.col("sid").asc())
    assigned = (
        pts.crossJoin(F.broadcast(seeds))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return (
        assigned.groupBy("sid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("lon") / F.count(F.lit(1)), 6).cast("double").alias("new_cx"),
            F.round(F.sum("lat") / F.count(F.lit(1)), 6).cast("double").alias("new_cy"),
        )
        .orderBy("sid")
    )


# -- attribute correlation matrix (CorrelationForAttributes) ------------------
def _corr_sql(x: str, y: str) -> str:
    return (
        f"ROUND((COUNT(*) * SUM({x} * {y}) - SUM({x}) * SUM({y})) / "
        f"(SQRT(COUNT(*) * SUM({x} * {x}) - SUM({x}) * SUM({x})) * "
        f"SQRT(COUNT(*) * SUM({y} * {y}) - SUM({y}) * SUM({y}))), 4)"
    )


@Q.register(
    "attr_correlation",
    "SELECT "
    f"CAST({_corr_sql('l_quantity', 'l_extendedprice')} AS DOUBLE) AS r_qty_price, "
    f"CAST({_corr_sql('l_quantity', 'l_discount')} AS DOUBLE) AS r_qty_disc, "
    f"CAST({_corr_sql('l_extendedprice', 'l_discount')} AS DOUBLE) AS r_price_disc "
    "FROM lineitem",
)
def q_attr_correlation(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")

    def corr(x, y):
        n = F.count(F.lit(1))
        num = n * F.sum(F.col(x) * F.col(y)) - F.sum(x) * F.sum(y)
        den = F.sqrt(n * F.sum(F.col(x) * F.col(x)) - F.sum(x) * F.sum(x)) * F.sqrt(
            n * F.sum(F.col(y) * F.col(y)) - F.sum(y) * F.sum(y)
        )
        return F.round(num / den, 4).cast("double")

    return li.agg(
        corr("l_quantity", "l_extendedprice").alias("r_qty_price"),
        corr("l_quantity", "l_discount").alias("r_qty_disc"),
        corr("l_extendedprice", "l_discount").alias("r_price_disc"),
    )


# -- elongation ratio per feature (GISTools ElongationRatio.java, bbox form) --
@Q.register(
    "elongation",
    f"SELECT poly_id, category, "
    "CAST(ROUND(1e0 - LEAST(xmax - xmin, ymax - ymin) / GREATEST(xmax - xmin, ymax - ymin), 6) AS DOUBLE) AS elongation "
    f"FROM {bbox_sql_values()} b(poly_id, category, xmin, ymin, xmax, ymax) ORDER BY poly_id",
)
def q_elongation(spark, sf):
    from .sources.polygons import polygons_df

    df = polygons_df(spark)
    w = F.col("bbox.xmax") - F.col("bbox.xmin")
    h = F.col("bbox.ymax") - F.col("bbox.ymin")
    return df.select(
        "poly_id", "category",
        F.round(F.lit(1.0) - F.least(w, h) / F.greatest(w, h), 6)
        .cast("double").alias("elongation"),
    ).orderBy("poly_id")


# ---------------------------------------------------------------------------
# polygon-polygon boolean overlay (§2.7: Intersect / Clip / Difference /
# Union — VectorTools Intersect.java:291-299, Clip.java:267,455,
# Difference.java:332-334, Union.java:294-295).  Engine: Sutherland-Hodgman
# convex clipping kernel (operators/overlay.py).  Oracle: the SAME algorithm
# unrolled as 6 chained SQL clip stages (clip layer = hexagons, fixed 6
# edges), identical formulas/branches -> identical vertices; areas round via
# the shared half-up idiom (sum-order-dependent only).
# ---------------------------------------------------------------------------
def _sh_oracle_ctes() -> str:
    from .sources.polygons import clip_edges_sql_values

    parts = [
        f"sv AS (SELECT * FROM {vertices_sql_values()} t(poly_id, ring, vi, nv, x, y))",
        f"ce AS (SELECT * FROM {clip_edges_sql_values()} t(clip_id, k, ax, ay, bx, by))",
        "s0 AS (SELECT v.poly_id, c.clip_id, v.ring, v.vi AS seq, v.x, v.y "
        "FROM sv v CROSS JOIN (SELECT DISTINCT clip_id FROM ce) c)",
    ]
    for k in range(6):
        prev, cur = f"s{k}", f"s{k + 1}"
        parts.append(
            f"{cur}_e AS (SELECT s.poly_id, s.clip_id, s.ring, s.seq, s.x, s.y, "
            "COALESCE(LEAD(s.x) OVER w, FIRST_VALUE(s.x) OVER w) AS qx, "
            "COALESCE(LEAD(s.y) OVER w, FIRST_VALUE(s.y) OVER w) AS qy, "
            f"e.ax, e.ay, e.bx, e.by FROM {prev} s "
            f"JOIN ce e ON e.clip_id = s.clip_id AND e.k = {k} "
            "WINDOW w AS (PARTITION BY s.poly_id, s.clip_id, s.ring ORDER BY s.seq "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))"
        )
        parts.append(
            f"{cur}_d AS (SELECT *, "
            "(bx - ax) * (y - ay) - (by - ay) * (x - ax) AS dp, "
            "(bx - ax) * (qy - ay) - (by - ay) * (qx - ax) AS dq "
            f"FROM {cur}_e)"
        )
        parts.append(
            f"{cur} AS (SELECT poly_id, clip_id, ring, "
            "ROW_NUMBER() OVER (PARTITION BY poly_id, clip_id, ring ORDER BY ord) - 1 AS seq, "
            "x, y FROM ("
            "SELECT poly_id, clip_id, ring, seq * 2 AS ord, "
            "x + (dp / (dp - dq)) * (qx - x) AS x, "
            "y + (dp / (dp - dq)) * (qy - y) AS y "
            f"FROM {cur}_d WHERE (dq >= 0e0 AND dp < 0e0) OR (dq < 0e0 AND dp >= 0e0) "
            "UNION ALL "
            f"SELECT poly_id, clip_id, ring, seq * 2 + 1, qx, qy FROM {cur}_d "
            "WHERE dq >= 0e0))"
        )
    parts.append(
        "s_fin AS (SELECT poly_id, clip_id, ring, seq, x, y, "
        "COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS qx, "
        "COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS qy "
        "FROM s6 WINDOW w AS (PARTITION BY poly_id, clip_id, ring ORDER BY seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))"
    )
    parts.append(
        "ring_area AS (SELECT poly_id, clip_id, ring, COUNT(*) AS nv, "
        "SUM(x * qy - qx * y) / 2e0 AS a FROM s_fin GROUP BY 1, 2, 3)"
    )
    parts.append(
        "pair_area AS (SELECT poly_id, clip_id, CAST(SUM(nv) AS BIGINT) AS n_vertices, "
        "SUM(CASE WHEN ring = 0 THEN a ELSE -a END) AS raw_area "
        "FROM ring_area GROUP BY 1, 2)"
    )
    return ", ".join(parts)


_SUBJ_AREA_CTE = (
    f"{_VTX}, sr AS (SELECT poly_id, ring, SUM(x * y2 - x2 * y) / 2e0 AS a "
    "FROM seg GROUP BY 1, 2), "
    "subj_area AS (SELECT poly_id, SUM(CASE WHEN ring = 0 THEN a ELSE -a END) AS sa "
    "FROM sr GROUP BY 1)"
)


@Q.register(
    "intersect_area",
    f"WITH {_sh_oracle_ctes()} "
    "SELECT poly_id, clip_id, n_vertices, "
    "FLOOR(raw_area * 1e6 + 0.5e0) / 1e6 AS area "
    "FROM pair_area WHERE raw_area > 1e-9 ORDER BY poly_id, clip_id",
)
def q_intersect_area(spark, sf):
    from .operators.overlay import intersect_areas

    return intersect_areas(spark).orderBy("poly_id", "clip_id")


@Q.register(
    "clip_pairs",
    f"WITH {_sh_oracle_ctes()} "
    "SELECT poly_id, clip_id FROM pair_area WHERE raw_area > 1e-9 "
    "ORDER BY poly_id, clip_id",
)
def q_clip_pairs(spark, sf):
    from .operators.overlay import intersect_areas

    return intersect_areas(spark).select("poly_id", "clip_id").orderBy("poly_id", "clip_id")


@Q.register(
    "difference_area",
    f"WITH {_sh_oracle_ctes()}, {_SUBJ_AREA_CTE}, "
    "inter AS (SELECT poly_id, SUM(raw_area) AS ia FROM pair_area GROUP BY 1) "
    "SELECT s.poly_id, FLOOR((s.sa - COALESCE(i.ia, 0e0)) * 1e6 + 0.5e0) / 1e6 AS area "
    "FROM subj_area s LEFT JOIN inter i USING (poly_id) ORDER BY s.poly_id",
)
def q_difference_area(spark, sf):
    from .operators.overlay import difference_areas

    return difference_areas(spark)


# ---------------------------------------------------------------------------
# general (CONCAVE-clip) overlay: star clip layer decomposed into fan
# triangles (sources/polygons.py) — the SAME staged SH oracle, 3 stages per
# triangle, areas summed over the fan (disjoint convex parts are additive).
# ---------------------------------------------------------------------------
def _sh_tri_ctes() -> str:
    from .sources.polygons import concave_tri_edges_sql_values

    parts = [
        f"sv AS (SELECT * FROM {vertices_sql_values()} t(poly_id, ring, vi, nv, x, y))",
        f"te AS (SELECT * FROM {concave_tri_edges_sql_values()} t(clip_id, tri, k, ax, ay, bx, by))",
        "t0 AS (SELECT v.poly_id, c.clip_id, c.tri, v.ring, v.vi AS seq, v.x, v.y "
        "FROM sv v CROSS JOIN (SELECT DISTINCT clip_id, tri FROM te) c)",
    ]
    for k in range(3):
        prev, cur = f"t{k}", f"t{k + 1}"
        parts.append(
            f"{cur}_e AS (SELECT s.poly_id, s.clip_id, s.tri, s.ring, s.seq, s.x, s.y, "
            "COALESCE(LEAD(s.x) OVER w, FIRST_VALUE(s.x) OVER w) AS qx, "
            "COALESCE(LEAD(s.y) OVER w, FIRST_VALUE(s.y) OVER w) AS qy, "
            f"e.ax, e.ay, e.bx, e.by FROM {prev} s "
            f"JOIN te e ON e.clip_id = s.clip_id AND e.tri = s.tri AND e.k = {k} "
            "WINDOW w AS (PARTITION BY s.poly_id, s.clip_id, s.tri, s.ring ORDER BY s.seq "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))"
        )
        parts.append(
            f"{cur}_d AS (SELECT *, "
            "(bx - ax) * (y - ay) - (by - ay) * (x - ax) AS dp, "
            "(bx - ax) * (qy - ay) - (by - ay) * (qx - ax) AS dq "
            f"FROM {cur}_e)"
        )
        parts.append(
            f"{cur} AS (SELECT poly_id, clip_id, tri, ring, "
            "ROW_NUMBER() OVER (PARTITION BY poly_id, clip_id, tri, ring ORDER BY ord) - 1 AS seq, "
            "x, y FROM ("
            "SELECT poly_id, clip_id, tri, ring, seq * 2 AS ord, "
            "x + (dp / (dp - dq)) * (qx - x) AS x, "
            "y + (dp / (dp - dq)) * (qy - y) AS y "
            f"FROM {cur}_d WHERE (dq >= 0e0 AND dp < 0e0) OR (dq < 0e0 AND dp >= 0e0) "
            "UNION ALL "
            f"SELECT poly_id, clip_id, tri, ring, seq * 2 + 1, qx, qy FROM {cur}_d "
            "WHERE dq >= 0e0))"
        )
    parts.append(
        "t_fin AS (SELECT poly_id, clip_id, tri, ring, seq, x, y, "
        "COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS qx, "
        "COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS qy "
        "FROM t3 WINDOW w AS (PARTITION BY poly_id, clip_id, tri, ring ORDER BY seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))"
    )
    parts.append(
        "tri_area AS (SELECT poly_id, clip_id, tri, ring, COUNT(*) AS nv, "
        "SUM(x * qy - qx * y) / 2e0 AS a FROM t_fin GROUP BY 1, 2, 3, 4)"
    )
    parts.append(
        "cpair AS (SELECT poly_id, clip_id, CAST(SUM(nv) AS BIGINT) AS n_vertices, "
        "SUM(CASE WHEN ring = 0 THEN a ELSE -a END) AS raw_area "
        "FROM tri_area GROUP BY 1, 2)"
    )
    return ", ".join(parts)


@Q.register(
    "concave_intersect_area",
    f"WITH {_sh_tri_ctes()} "
    "SELECT poly_id, clip_id, n_vertices, "
    "FLOOR(raw_area * 1e6 + 0.5e0) / 1e6 AS area "
    "FROM cpair WHERE raw_area > 1e-9 ORDER BY poly_id, clip_id",
)
def q_concave_intersect_area(spark, sf):
    from .operators.overlay import concave_intersect_areas

    return concave_intersect_areas(spark).orderBy("poly_id", "clip_id")


def _sym_diff_sql() -> str:
    from .sources.polygons import (
        concave_bbox_sql_values, concave_boundary_edges_sql_values,
    )

    return (
        f"WITH {_sh_tri_ctes()}, {_SUBJ_AREA_CTE}, "
        f"cb AS (SELECT * FROM {concave_bbox_sql_values()} t(clip_id, cxmin, cymin, cxmax, cymax)), "
        f"be AS (SELECT * FROM {concave_boundary_edges_sql_values()} t(clip_id, ax, ay, bx, by)), "
        "star_a AS (SELECT clip_id, SUM(ax * by - bx * ay) / 2e0 AS ca FROM be GROUP BY 1), "
        f"sb AS (SELECT poly_id, xmin, ymin, xmax, ymax FROM {bbox_sql_values()} "
        "t(poly_id, category, xmin, ymin, xmax, ymax)), "
        "cand AS (SELECT s.poly_id, c.clip_id FROM sb s JOIN cb c "
        "ON s.xmin <= c.cxmax AND s.xmax >= c.cxmin AND s.ymin <= c.cymax AND s.ymax >= c.cymin) "
        "SELECT d.poly_id, d.clip_id, "
        "FLOOR((sa.sa + st.ca - 2e0 * COALESCE(p.raw_area, 0e0)) * 1e6 + 0.5e0) / 1e6 AS area "
        "FROM cand d JOIN subj_area sa ON sa.poly_id = d.poly_id "
        "JOIN star_a st ON st.clip_id = d.clip_id "
        "LEFT JOIN cpair p ON p.poly_id = d.poly_id AND p.clip_id = d.clip_id "
        "ORDER BY d.poly_id, d.clip_id"
    )


@Q.register("sym_difference_area", _sym_diff_sql())
def q_sym_difference_area(spark, sf):
    from .operators.overlay import sym_difference_areas

    return sym_difference_areas(spark)


# -- polygon x polygon spatial predicates (§2.2;
# IsolateVectorFeaturesByLocation.java:240-261 predicate modes over two
# polygon layers): classification from the SH pair areas — disjoint /
# overlaps / contains / within (area tolerance 1e-9, shared).
@Q.register(
    "spatial_predicates",
    f"WITH {_sh_oracle_ctes()}, {_SUBJ_AREA_CTE}, "
    "clip_a AS (SELECT clip_id, SUM(ax * by - bx * ay) / 2e0 AS ca FROM ce GROUP BY 1), "
    f"sb AS (SELECT poly_id, xmin, ymin, xmax, ymax FROM {bbox_sql_values()} "
    "t(poly_id, category, xmin, ymin, xmax, ymax)), "
    "cbb AS (SELECT clip_id, MIN(ax) AS cxmin, MIN(ay) AS cymin, "
    "MAX(ax) AS cxmax, MAX(ay) AS cymax FROM ce GROUP BY 1), "
    "cand AS (SELECT s.poly_id, c.clip_id FROM sb s JOIN cbb c "
    "ON s.xmin <= c.cxmax AND s.xmax >= c.cxmin AND s.ymin <= c.cymax AND s.ymax >= c.cymin) "
    "SELECT d.poly_id, d.clip_id, "
    "CASE WHEN COALESCE(p.raw_area, 0e0) <= 1e-9 THEN 'disjoint' "
    "WHEN c.ca - p.raw_area <= 1e-9 THEN 'contains' "
    "WHEN s.sa - p.raw_area <= 1e-9 THEN 'within' "
    "ELSE 'overlaps' END AS predicate "
    "FROM cand d JOIN subj_area s ON s.poly_id = d.poly_id "
    "JOIN clip_a c ON c.clip_id = d.clip_id "
    "LEFT JOIN pair_area p ON p.poly_id = d.poly_id AND p.clip_id = d.clip_id "
    "ORDER BY d.poly_id, d.clip_id",
)
def q_spatial_predicates(spark, sf):
    from .operators.overlay import (
        _candidate_pairs, _pair_raw_areas, clip_areas, subject_areas,
    )

    raw = _pair_raw_areas(spark)
    cand = _candidate_pairs(spark).select("poly_id", "clip_id")
    sa = subject_areas(spark)
    ca = clip_areas(spark)
    pred = (
        F.when(F.coalesce(F.col("_raw"), F.lit(0.0)) <= 1e-9, F.lit("disjoint"))
        .when(F.col("_ca") - F.col("_raw") <= 1e-9, F.lit("contains"))
        .when(F.col("_sa") - F.col("_raw") <= 1e-9, F.lit("within"))
        .otherwise(F.lit("overlaps"))
    )
    return (
        cand.join(raw, ["poly_id", "clip_id"], "left")
        .join(F.broadcast(sa), "poly_id")
        .join(F.broadcast(ca), "clip_id")
        .select("poly_id", "clip_id", pred.alias("predicate"))
        .orderBy("poly_id", "clip_id")
    )


# -- GML export (§2.1; ExportGML.java:315): polygon geometry serialized as
# GML 2 with FIXED-POINT micro-degree coordinates (integer strings, so both
# engines render byte-identical text — float formatting differs otherwise).
def _gml_c(x: str) -> str:
    return f"CAST(CAST(ROUND({x} * 1e6) AS BIGINT) AS STRING)"


@Q.register(
    "gml_export",
    f"WITH {_VTX}, "
    "rc AS (SELECT poly_id, ring, "
    "STRING_AGG(CAST(CAST(ROUND(x * 1e6) AS BIGINT) AS VARCHAR) || ',' || "
    "CAST(CAST(ROUND(y * 1e6) AS BIGINT) AS VARCHAR), ' ' ORDER BY vi) AS coords "
    "FROM vtx GROUP BY 1, 2), "
    "rs AS (SELECT poly_id, STRING_AGG(CASE WHEN ring = 0 "
    "THEN '<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>' || coords || "
    "'</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>' "
    "ELSE '<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>' || coords || "
    "'</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>' END, '' ORDER BY ring) AS body "
    "FROM rc GROUP BY 1) "
    "SELECT poly_id, '<gml:Polygon>' || body || '</gml:Polygon>' AS gml "
    "FROM rs ORDER BY poly_id",
)
def q_gml_export(spark, sf):
    from .sources.polygons import polygons_df

    df = polygons_df(spark)
    ring_str = (
        "array_join(transform(r, p -> concat("
        f"{_gml_c('p[0]')}, ',', {_gml_c('p[1]')})), ' ')"
    )
    body = (
        "array_join(transform(rings, (r, i) -> CASE WHEN i = 0 "
        f"THEN concat('<gml:outerBoundaryIs><gml:LinearRing><gml:coordinates>', {ring_str}, "
        "'</gml:coordinates></gml:LinearRing></gml:outerBoundaryIs>') "
        f"ELSE concat('<gml:innerBoundaryIs><gml:LinearRing><gml:coordinates>', {ring_str}, "
        "'</gml:coordinates></gml:LinearRing></gml:innerBoundaryIs>') END), '')"
    )
    return df.select(
        "poly_id",
        F.expr(f"concat('<gml:Polygon>', {body}, '</gml:Polygon>')").alias("gml"),
    ).orderBy("poly_id")


@Q.register(
    "union_area",
    f"WITH {_sh_oracle_ctes()}, {_SUBJ_AREA_CTE}, "
    "clip_a AS (SELECT SUM(a) AS ca FROM ("
    "SELECT clip_id, SUM(ax * by - bx * ay) / 2e0 AS a FROM ce GROUP BY 1)), "
    "tot AS (SELECT (SELECT SUM(sa) FROM subj_area) AS s, "
    "(SELECT ca FROM clip_a) AS c, "
    "(SELECT COALESCE(SUM(raw_area), 0e0) FROM pair_area) AS i) "
    "SELECT FLOOR((s + c - i) * 1e6 + 0.5e0) / 1e6 AS area FROM tot",
)
def q_union_area(spark, sf):
    from .operators.overlay import union_area

    return union_area(spark)


# -- WKT export (§2.1; ExportWellKnownText.java) ------------------------------
# POLYGON((...)) text with rings closed (first vertex repeated) and %.6f
# coordinates — built entirely with Catalyst array/string functions.
@Q.register(
    "wkt_export",
    f"WITH vtx AS (SELECT * FROM {vertices_sql_values()} t(poly_id, ring, vi, nv, x, y)), "
    "ringtxt AS (SELECT poly_id, ring, "
    "'(' || STRING_AGG(printf('%.6f %.6f', x, y), ', ' ORDER BY vi) || ', ' || "
    "MIN(CASE WHEN vi = 0 THEN printf('%.6f %.6f', x, y) END) || ')' AS t "
    "FROM vtx GROUP BY 1, 2) "
    "SELECT poly_id, 'POLYGON(' || STRING_AGG(t, ', ' ORDER BY ring) || ')' AS wkt "
    "FROM ringtxt GROUP BY 1 ORDER BY poly_id",
)
def q_wkt_export(spark, sf):
    from .sources.polygons import polygons_df

    df = polygons_df(spark)
    ring_txt = (
        "transform(rings, ring -> concat('(', "
        "array_join(transform(ring, p -> format_string('%.6f %.6f', p[0], p[1])), ', '), "
        "', ', format_string('%.6f %.6f', ring[0][0], ring[0][1]), ')'))"
    )
    return df.select(
        "poly_id",
        F.expr(f"concat('POLYGON(', array_join({ring_txt}, ', '), ')')").alias("wkt"),
    ).orderBy("poly_id")


# -- vector buffer (§2.11; BufferVector.java:359): circular point buffers as
# 16-gon polygons (the standard segmented-circle buffer approximation) -------
_BUF_R = "2.5e0"
_BUF_SEGS = 16


@Q.register(
    "buffer_points",
    f"""WITH {Q.pts_cte().replace('{{sf}}', '')},
q AS (SELECT doc_id, lon, lat FROM pts WHERE doc_id % 211 = 0),
k AS (SELECT * FROM range(0, {_BUF_SEGS}) t(i)),
v AS (
  SELECT q.doc_id,
    q.lon + {_BUF_R} * COS(2e0 * PI() * k.i / {_BUF_SEGS}e0) AS x,
    q.lat + {_BUF_R} * SIN(2e0 * PI() * k.i / {_BUF_SEGS}e0) AS y,
    k.i FROM q CROSS JOIN k
),
e AS (SELECT doc_id, x, y,
  LEAD(x) OVER w AS x2, LEAD(y) OVER w AS y2,
  FIRST_VALUE(x) OVER w AS fx, FIRST_VALUE(y) OVER w AS fy
  FROM v WINDOW w AS (PARTITION BY doc_id ORDER BY i
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
SELECT doc_id, CAST({_BUF_SEGS} AS BIGINT) AS n_vertices,
  CAST(ROUND(SUM(x * COALESCE(y2, fy) - COALESCE(x2, fx) * y) / 2e0, 6) AS DOUBLE) AS buf_area
FROM e GROUP BY 1 ORDER BY doc_id""",
)
def q_buffer_points(spark, sf):
    pts = Q._points(spark, sf).where(F.col("doc_id") % 211 == 0)
    v = (
        pts.select("doc_id", "lon", "lat")
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(_BUF_SEGS - 1))))
        .selectExpr(
            "doc_id", "i",
            f"lon + {_BUF_R} * COS(2e0 * PI() * i / {_BUF_SEGS}e0) AS x",
            f"lat + {_BUF_R} * SIN(2e0 * PI() * i / {_BUF_SEGS}e0) AS y",
        )
    )
    shoelace = F.expr(
        "aggregate(sequence(0, size(vs) - 1), 0e0, (a, j) -> "
        "a + vs[j].x * vs[(j + 1) % size(vs)].y - vs[(j + 1) % size(vs)].x * vs[j].y)"
    ) / 2.0
    return (
        v.groupBy("doc_id")
        .agg(F.expr("array_sort(collect_list(struct(i, x, y)))").alias("vs"))
        .select(
            "doc_id",
            F.lit(_BUF_SEGS).cast("bigint").alias("n_vertices"),
            F.round(shoelace, 6).cast("double").alias("buf_area"),
        )
        .orderBy("doc_id")
    )


# -- full k-means loop (§2.13; kMeansClassification.java): 3 deterministic
# Lloyd iterations — centroids round(6) BETWEEN iterations on both sides so
# every assignment decision compares identical doubles ---------------------
_KM_ITERS = 3


def _km_oracle() -> str:
    parts = [
        f"seeds0 AS (SELECT * FROM (VALUES {_SEED_SQL}) s(sid, sx, sy))",
    ]
    prev = "seeds0"
    for it in range(_KM_ITERS):
        a, c = f"asg{it}", f"seeds{it + 1}"
        parts.append(
            f"{a} AS (SELECT doc_id, lon, lat, sid FROM ("
            "SELECT p.doc_id, p.lon, p.lat, s.sid, "
            "ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY "
            "(p.lon - s.sx) * (p.lon - s.sx) + (p.lat - s.sy) * (p.lat - s.sy), s.sid) AS rn "
            f"FROM pts p CROSS JOIN {prev} s) WHERE rn = 1)"
        )
        parts.append(
            f"{c} AS (SELECT sid, ROUND(SUM(lon) / COUNT(*), 6) AS sx, "
            f"ROUND(SUM(lat) / COUNT(*), 6) AS sy, COUNT(*) AS n FROM {a} GROUP BY 1)"
        )
        prev = c
    return ", ".join(parts)


def _lloyd_rounds(spark, pts, cents, iters):
    out = None
    for _ in range(iters):
        d2 = (F.col("lon") - F.col("sx")) * (F.col("lon") - F.col("sx")) + (
            F.col("lat") - F.col("sy")
        ) * (F.col("lat") - F.col("sy"))
        assigned = (
            pts.crossJoin(F.broadcast(cents))
            .select("doc_id", "lon", "lat", d2.alias("_d2"), "sid")
            .groupBy("doc_id", "lon", "lat")
            .agg(F.expr("min_by(sid, struct(_d2, sid))").alias("sid"))
        )
        out = assigned.groupBy("sid").agg(
            F.round(F.sum("lon") / F.count(F.lit(1)), 6).alias("sx"),
            F.round(F.sum("lat") / F.count(F.lit(1)), 6).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
        cents = out.select("sid", "sx", "sy")
    return out, cents, assigned


# ISODATA thresholds (ISODATA.java merge/split passes): tuned so BOTH passes
# trigger on the synthetic layer (closest seeds3 pair d2 ~ 17.6k; widest
# cluster sd ~ 62) — the decision arithmetic is shared verbatim with the SQL.
_ISO_MERGE_D2 = 20000.0
_ISO_SPLIT_SD = 40.0


def _r6(x: float) -> float:
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6



@Q.register(
    "kmeans_iterated",
    f"{_PTS}, {_km_oracle()} "
    f"SELECT sid, n, CAST(sx AS DOUBLE) AS cx, CAST(sy AS DOUBLE) AS cy "
    f"FROM seeds{_KM_ITERS} ORDER BY sid",
)
def q_kmeans_iterated(spark, sf):
    pts = Q._points(spark, sf).select("doc_id", "lon", "lat")
    cents = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(_SEEDS)], "sid int, sx double, sy double"
    )
    out = None
    for _ in range(_KM_ITERS):
        d2 = (F.col("lon") - F.col("sx")) * (F.col("lon") - F.col("sx")) + (
            F.col("lat") - F.col("sy")
        ) * (F.col("lat") - F.col("sy"))
        assigned = (
            pts.crossJoin(F.broadcast(cents))
            .select("doc_id", "lon", "lat", d2.alias("_d2"), "sid")
            .groupBy("doc_id", "lon", "lat")
            .agg(F.expr("min_by(sid, struct(_d2, sid))").alias("sid"))
        )
        out = assigned.groupBy("sid").agg(
            F.round(F.sum("lon") / F.count(F.lit(1)), 6).alias("sx"),
            F.round(F.sum("lat") / F.count(F.lit(1)), 6).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
        cents = out.select("sid", "sx", "sy")
    return out.select(
        "sid", "n",
        F.col("sx").cast("double").alias("cx"),
        F.col("sy").cast("double").alias("cy"),
    ).orderBy("sid")


def _iso_asg_sql(cent: str, name: str) -> str:
    return (
        f"{name} AS (SELECT doc_id, lon, lat, sid FROM ("
        "SELECT p.doc_id, p.lon, p.lat, s.sid, "
        "ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY "
        "(p.lon - s.sx) * (p.lon - s.sx) + (p.lat - s.sy) * (p.lat - s.sy), s.sid) AS rn "
        f"FROM pts p CROSS JOIN {cent} s) WHERE rn = 1)"
    )


def _isodata_oracle() -> str:
    S = f"seeds{_KM_ITERS}"
    md, sd = f"{_ISO_MERGE_D2!r}e0", f"{_ISO_SPLIT_SD!r}e0"
    xm = "CAST(ROUND(lon * 1000e0) AS BIGINT)"
    ym = "CAST(ROUND(lat * 1000e0) AS BIGINT)"
    return f"""{_km_oracle()},
prm AS (SELECT a.sid AS s1, b.sid AS s2, a.n AS n1, b.n AS n2,
  a.sx AS x1, a.sy AS y1, b.sx AS x2, b.sy AS y2,
  (a.sx - b.sx) * (a.sx - b.sx) + (a.sy - b.sy) * (a.sy - b.sy) AS d2
  FROM {S} a JOIN {S} b ON b.sid > a.sid),
mb AS (SELECT * FROM prm ORDER BY d2, s1, s2 LIMIT 1),
mrg AS (SELECT s.sid, s.sx, s.sy FROM {S} s, mb
        WHERE mb.d2 >= {md} OR (s.sid != mb.s1 AND s.sid != mb.s2)
  UNION ALL
  SELECT s1, FLOOR((n1 * x1 + n2 * x2) / (n1 + n2) * 1e6 + 0.5e0) / 1e6,
         FLOOR((n1 * y1 + n2 * y2) / (n1 + n2) * 1e6 + 0.5e0) / 1e6
  FROM mb WHERE d2 < {md}),
{_iso_asg_sql('mrg', 'asgm')},
istat AS (SELECT sid, COUNT(*) AS n,
  CAST(SUM({xm}) AS BIGINT) AS sxm, CAST(SUM({xm} * {xm}) AS BIGINT) AS sxxm,
  CAST(SUM({ym}) AS BIGINT) AS sym, CAST(SUM({ym} * {ym}) AS BIGINT) AS syym
  FROM asgm GROUP BY 1),
isd AS (SELECT sid,
  SQRT((CAST(sxxm AS DOUBLE) - CAST(sxm AS DOUBLE) * sxm / n) / n) / 1000e0 AS sdx,
  SQRT((CAST(syym AS DOUBLE) - CAST(sym AS DOUBLE) * sym / n) / n) / 1000e0 AS sdy
  FROM istat),
sb AS (SELECT d.sid, m.sx AS scx, m.sy AS scy, GREATEST(sdx, sdy) AS s, sdx >= sdy AS ax
  FROM isd d JOIN mrg m USING (sid) ORDER BY GREATEST(sdx, sdy) DESC, d.sid LIMIT 1),
spl AS (SELECT m.sid, m.sx, m.sy FROM mrg m, sb WHERE sb.s <= {sd} OR m.sid != sb.sid
  UNION ALL SELECT sid,
    CASE WHEN ax THEN FLOOR((scx - s / 2e0) * 1e6 + 0.5e0) / 1e6 ELSE scx END,
    CASE WHEN ax THEN scy ELSE FLOOR((scy - s / 2e0) * 1e6 + 0.5e0) / 1e6 END
    FROM sb WHERE s > {sd}
  UNION ALL SELECT (SELECT MAX(sid) + 1 FROM mrg),
    CASE WHEN ax THEN FLOOR((scx + s / 2e0) * 1e6 + 0.5e0) / 1e6 ELSE scx END,
    CASE WHEN ax THEN scy ELSE FLOOR((scy + s / 2e0) * 1e6 + 0.5e0) / 1e6 END
    FROM sb WHERE s > {sd}),
{_iso_asg_sql('spl', 'asgf')},
fin AS (SELECT sid, ROUND(SUM(lon) / COUNT(*), 6) AS sx,
        ROUND(SUM(lat) / COUNT(*), 6) AS sy, COUNT(*) AS n FROM asgf GROUP BY 1)
SELECT sid, n, CAST(sx AS DOUBLE) AS cx, CAST(sy AS DOUBLE) AS cy FROM fin ORDER BY sid"""


@Q.register("isodata", f"{_PTS}, {_isodata_oracle()}")
def q_isodata(spark, sf):
    """ISODATA (§2.13; ISODATA.java:577): iterated k-means plus one MERGE
    pass (closest centroid pair under the distance threshold collapses to
    the size-weighted mean) and one SPLIT pass (the widest cluster, by
    population stddev from exact milli moments, splits +-sd/2 along its
    wider axis), then a final Lloyd update.  All decision arithmetic is the
    identical IEEE chain the oracle SQL evaluates."""
    import math

    pts = Q._points(spark, sf).select("doc_id", "lon", "lat")
    seeds = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(_SEEDS)], "sid int, sx double, sy double"
    )
    out, cents, _ = _lloyd_rounds(spark, pts, seeds, _KM_ITERS)
    rows = {int(r["sid"]): (float(r["sx"]), float(r["sy"]), int(r["n"]))
            for r in out.collect()}
    sids = sorted(rows)
    best = None
    for i, s1 in enumerate(sids):
        for s2 in sids[i + 1:]:
            x1, y1, n1 = rows[s1]
            x2, y2, n2 = rows[s2]
            d2 = (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
            cand = (d2, s1, s2)
            if best is None or cand < best:
                best = cand
    merged = {s: (rows[s][0], rows[s][1]) for s in sids}
    if best is not None and best[0] < _ISO_MERGE_D2:
        _, s1, s2 = best
        x1, y1, n1 = rows[s1]
        x2, y2, n2 = rows[s2]
        merged[s1] = (
            _r6((n1 * x1 + n2 * x2) / (n1 + n2)),
            _r6((n1 * y1 + n2 * y2) / (n1 + n2)),
        )
        del merged[s2]
    cents2 = spark.createDataFrame(
        [(s, x, y) for s, (x, y) in sorted(merged.items())],
        "sid int, sx double, sy double",
    )
    d2e = (F.col("lon") - F.col("sx")) * (F.col("lon") - F.col("sx")) + (
        F.col("lat") - F.col("sy")
    ) * (F.col("lat") - F.col("sy"))
    asgm = (
        pts.crossJoin(F.broadcast(cents2))
        .select("doc_id", "lon", "lat", d2e.alias("_d2"), "sid")
        .groupBy("doc_id", "lon", "lat")
        .agg(F.expr("min_by(sid, struct(_d2, sid))").alias("sid"))
    )
    xm = F.round(F.col("lon") * 1000.0).cast("long")
    ym = F.round(F.col("lat") * 1000.0).cast("long")
    stats = asgm.groupBy("sid").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xm).alias("sxm"), F.sum(xm * xm).alias("sxxm"),
        F.sum(ym).alias("sym"), F.sum(ym * ym).alias("syym"),
    ).collect()
    pick = None
    for r in stats:
        n = int(r["n"])
        sdx = math.sqrt((float(r["sxxm"]) - float(r["sxm"]) * r["sxm"] / n) / n) / 1000.0
        sdy = math.sqrt((float(r["syym"]) - float(r["sym"]) * r["sym"] / n) / n) / 1000.0
        s = max(sdx, sdy)
        cand = (-s, int(r["sid"]), sdx >= sdy)
        if pick is None or cand < pick:
            pick = cand
    final = dict(merged)
    if pick is not None and -pick[0] > _ISO_SPLIT_SD:
        s, sid, ax = -pick[0], pick[1], pick[2]
        cx, cy = merged[sid]
        nsid = max(merged) + 1
        if ax:
            final[sid] = (_r6(cx - s / 2.0), cy)
            final[nsid] = (_r6(cx + s / 2.0), cy)
        else:
            final[sid] = (cx, _r6(cy - s / 2.0))
            final[nsid] = (cx, _r6(cy + s / 2.0))
    cents3 = spark.createDataFrame(
        [(s, x, y) for s, (x, y) in sorted(final.items())],
        "sid int, sx double, sy double",
    )
    out2, _, _ = _lloyd_rounds(spark, pts, cents3, 1)
    return out2.select(
        "sid", "n",
        F.col("sx").cast("double").alias("cx"),
        F.col("sy").cast("double").alias("cy"),
    ).orderBy("sid")


# -- line x polygon spatial predicates (§2.2; the "crosses" / "are completely
# within" / "does not intersect" modes of
# IsolateVectorFeaturesByLocation.java:240-261 applied to a line layer
# against the convex clip hexagons).  Cyrus-Beck parametric clipping: the
# inside t-interval of each segment against each CCW hexagon comes from
# conditional MIN/MAX aggregates over the 6 edges — pure +,-,*,/ both
# engines, and the clipped in-polygon LENGTH falls out of the interval.
def _line_pred_sql() -> str:
    from .operators.overlay import (
        LINE_LEN, LINE_PRED, LINE_S0, LINE_S1, LINE_TIN, LINE_TOUT,
    )
    from .queries_raster import _LSTEPS as _UNUSED  # noqa: F401  (module load order)
    from .queries_raster import _LX1, _LX2, _LY1, _LY2, _NLINES
    from .sources.polygons import clip_edges_sql_values

    return (
        f"WITH raw AS (SELECT t.i AS line_id, "
        f"{_LX1.format(i='t.i')} AS x1, {_LY1.format(i='t.i')} AS y1, "
        f"{_LX2.format(i='t.i')} AS x2, {_LY2.format(i='t.i')} AS y2 "
        f"FROM range(0, {_NLINES}) t(i)), "
        # midpoint-shrunk copies (scale 1/64) so the 'within' class is
        # populated: short segments land entirely inside a hexagon.
        f"lines AS (SELECT line_id, x1, y1, x2, y2 FROM raw UNION ALL "
        f"SELECT line_id + {_NLINES}, "
        "(x1 + x2) / 2e0 + (x1 - (x1 + x2) / 2e0) / 64e0, "
        "(y1 + y2) / 2e0 + (y1 - (y1 + y2) / 2e0) / 64e0, "
        "(x1 + x2) / 2e0 + (x2 - (x1 + x2) / 2e0) / 64e0, "
        "(y1 + y2) / 2e0 + (y2 - (y1 + y2) / 2e0) / 64e0 FROM raw), "
        f"ce AS (SELECT * FROM {clip_edges_sql_values()} t(clip_id, k, ax, ay, bx, by)), "
        "cbb AS (SELECT clip_id, MIN(ax) AS cxmin, MIN(ay) AS cymin, "
        "MAX(ax) AS cxmax, MAX(ay) AS cymax FROM ce GROUP BY 1), "
        "cand AS (SELECT l.line_id, c.clip_id, l.x1, l.y1, l.x2, l.y2 "
        "FROM lines l JOIN cbb c ON LEAST(l.x1, l.x2) <= c.cxmax "
        "AND GREATEST(l.x1, l.x2) >= c.cxmin AND LEAST(l.y1, l.y2) <= c.cymax "
        "AND GREATEST(l.y1, l.y2) >= c.cymin), "
        "ed AS (SELECT d.line_id, d.clip_id, d.x1, d.y1, d.x2, d.y2, "
        f"{LINE_S0} AS s0, ({LINE_S1} - {LINE_S0}) AS den "
        "FROM cand d JOIN ce USING (clip_id)), "
        "agg AS (SELECT line_id, clip_id, x1, y1, x2, y2, "
        "MAX(CASE WHEN den > 0e0 THEN (0e0 - s0) / den END) AS _tin, "
        "MIN(CASE WHEN den < 0e0 THEN (0e0 - s0) / den END) AS _tout, "
        "MAX(CASE WHEN den = 0e0 AND s0 < 0e0 THEN 1 ELSE 0 END) AS _bad "
        "FROM ed GROUP BY 1, 2, 3, 4, 5, 6), "
        "tt AS (SELECT line_id, clip_id, x1, y1, x2, y2, _bad, "
        f"{LINE_TIN} AS tin, {LINE_TOUT} AS tout FROM agg) "
        f"SELECT line_id, clip_id, {LINE_PRED} AS predicate, "
        f"{LINE_LEN} AS inside_len FROM tt ORDER BY line_id, clip_id"
    )


@Q.register("line_clip_predicates", _line_pred_sql())
def q_line_clip_predicates(spark, sf):
    from .operators.overlay import line_clip_predicates
    from .queries_raster import _LX1, _LX2, _LY1, _LY2, _NLINES

    raw = spark.range(_NLINES).select(
        F.col("id").alias("line_id"),
        F.expr(_LX1.format(i="id")).alias("x1"),
        F.expr(_LY1.format(i="id")).alias("y1"),
        F.expr(_LX2.format(i="id")).alias("x2"),
        F.expr(_LY2.format(i="id")).alias("y2"),
    )
    shrunk = raw.select(
        (F.col("line_id") + _NLINES).alias("line_id"),
        F.expr("(x1 + x2) / 2e0 + (x1 - (x1 + x2) / 2e0) / 64e0").alias("x1"),
        F.expr("(y1 + y2) / 2e0 + (y1 - (y1 + y2) / 2e0) / 64e0").alias("y1"),
        F.expr("(x1 + x2) / 2e0 + (x2 - (x1 + x2) / 2e0) / 64e0").alias("x2"),
        F.expr("(y1 + y2) / 2e0 + (y2 - (y1 + y2) / 2e0) / 64e0").alias("y2"),
    )
    return line_clip_predicates(spark, raw.unionAll(shrunk))


# -- hole proportion (§2.4 patch-shape family; GISTools
# HoleProportion.java:344-348: 1 - netArea/grossArea = holeArea/grossArea,
# 0 for hole-free features) — per-ring Catalyst lambdas over the polygon
# layer, no shuffle beyond the source scan.
@Q.register(
    "hole_proportion",
    f"WITH {_VTX}, {_RING_AGG}, "
    "per AS (SELECT poly_id, "
    "SUM(CASE WHEN ring = 0 THEN ABS(signed_area) ELSE 0e0 END) AS gross, "
    "SUM(CASE WHEN ring != 0 THEN ABS(signed_area) ELSE 0e0 END) AS holes "
    "FROM rings GROUP BY 1) "
    "SELECT poly_id, CAST(CASE WHEN holes > 0e0 THEN "
    "FLOOR((holes / gross) * 1e6 + 0.5e0) / 1e6 ELSE 0e0 END AS DOUBLE) AS hole_prop "
    "FROM per ORDER BY poly_id",
)
def q_hole_proportion(spark, sf):
    from .operators.vector import _RING_CROSS
    from .sources.polygons import polygons_df

    df = polygons_df(spark).withColumn(
        "_areas", F.expr(f"transform(rings, r -> abs({_RING_CROSS}) / 2e0)")
    )
    return (
        df.select(
            "poly_id",
            F.col("_areas")[0].alias("gross"),
            F.expr("aggregate(slice(_areas, 2, size(_areas) - 1), 0e0, (a, v) -> a + v)")
            .alias("holes"),
        )
        .select(
            "poly_id",
            F.expr(
                "CAST(CASE WHEN holes > 0e0 THEN "
                "FLOOR((holes / gross) * 1e6 + 0.5e0) / 1e6 ELSE 0e0 END AS DOUBLE)"
            ).alias("hole_prop"),
        )
        .orderBy("poly_id")
    )


# -- polygon -> polyline conversion (§2.10; VectorTools/src/plugins/
# PolygonsToLines.java:90-308: every polygon ring becomes one polyline
# feature whose vertices are the ring's, closed back to the start).  Output
# is the per-line structural record: vertex count, closed length, start
# vertex.  Pure Catalyst ring lambdas — no shuffle beyond the layer scan.
@Q.register(
    "polygons_to_lines",
    f"WITH {_VTX}, {_RING_AGG}, "
    "v0 AS (SELECT poly_id, ring, nv, x AS x0, y AS y0 FROM vtx WHERE vi = 0) "
    "SELECT v.poly_id, v.ring AS line_ring, v.nv AS n_vertices, "
    "CAST(ROUND(r.perim, 6) AS DOUBLE) AS length, v.x0, v.y0 "
    "FROM v0 v JOIN rings r ON r.poly_id = v.poly_id AND r.ring = v.ring "
    "ORDER BY 1, 2",
)
def q_polygons_to_lines(spark, sf):
    from .operators.vector import _RING_PERIM
    from .sources.polygons import polygons_df

    df = polygons_df(spark).select(
        "poly_id", F.posexplode("rings").alias("line_ring", "r")
    )
    return df.select(
        "poly_id", "line_ring",
        F.expr("size(r)").alias("n_vertices"),
        F.round(F.expr(_RING_PERIM), 6).cast("double").alias("length"),
        F.expr("r[0][0]").alias("x0"),
        F.expr("r[0][1]").alias("y0"),
    ).orderBy("poly_id", "line_ring")


# -- polyline -> polygon conversion (§2.10; Scripts/LinesToPolygons.groovy):
# close each polyline back to its start vertex and measure the resulting
# polygon — signed shoelace area and winding orientation.  The ring
# polylines of the layer are the input features (the inverse of
# polygons_to_lines above).
@Q.register(
    "lines_to_polygons",
    f"WITH {_VTX}, {_RING_AGG} "
    "SELECT poly_id, ring AS line_ring, "
    "CAST(ROUND(ABS(signed_area), 6) AS DOUBLE) AS area, "
    "signed_area > 0e0 AS is_ccw "
    "FROM rings ORDER BY 1, 2",
)
def q_lines_to_polygons(spark, sf):
    from .operators.vector import _RING_CROSS
    from .sources.polygons import polygons_df

    df = polygons_df(spark).select(
        "poly_id", F.posexplode("rings").alias("line_ring", "r")
    )
    return df.select(
        "poly_id", "line_ring",
        F.round(F.expr(f"abs(({_RING_CROSS}) / 2e0)"), 6).cast("double").alias("area"),
        F.expr(f"({_RING_CROSS}) / 2e0 > 0e0").alias("is_ccw"),
    ).orderBy("poly_id", "line_ring")


# -- full location-predicate set over parcel pairs (§2.2 row 17;
# IsolateVectorFeaturesByLocation.java:240-261 — adds touches / covers-flush
# / equals / within-a-distance to the SH-area predicate family).  Oracle
# splices the operator's own fragment texts; everything is integer
# arithmetic, exact on both engines.
def _location_pred_sql() -> str:
    from .operators.overlay import (
        PAIR_AREAS, PAIR_COLLINEAR, PAIR_CONTACT, PAIR_D1, PAIR_D2, PAIR_D3,
        PAIR_D4, PAIR_GAP2, PAIR_PRED, _TAU,
    )
    from .sources.parcels import parcels_sql_values

    return (
        f"WITH pc AS (SELECT * FROM {parcels_sql_values()} "
        "t(pid, xmin, ymin, xmax, ymax)), "
        "ed AS (SELECT pid, xmin AS x1, ymin AS y1, xmax AS x2, ymin AS y2 FROM pc "
        "UNION ALL SELECT pid, xmax, ymin, xmax, ymax FROM pc "
        "UNION ALL SELECT pid, xmax, ymax, xmin, ymax FROM pc "
        "UNION ALL SELECT pid, xmin, ymax, xmin, ymin FROM pc), "
        "cand AS (SELECT a.pid AS pa, b.pid AS pb, "
        "a.xmin AS axmin, a.ymin AS aymin, a.xmax AS axmax, a.ymax AS aymax, "
        "b.xmin AS bxmin, b.ymin AS bymin, b.xmax AS bxmax, b.ymax AS bymax "
        "FROM pc a JOIN pc b ON a.pid < b.pid "
        f"AND a.xmin - {_TAU} <= b.xmax AND a.xmax + {_TAU} >= b.xmin "
        f"AND a.ymin - {_TAU} <= b.ymax AND a.ymax + {_TAU} >= b.ymin), "
        "ep AS (SELECT c.pa, c.pb, "
        "ea.x1 AS ax1, ea.y1 AS ay1, ea.x2 AS ax2, ea.y2 AS ay2, "
        "eb.x1 AS bx1, eb.y1 AS by1, eb.x2 AS bx2, eb.y2 AS by2 "
        "FROM cand c JOIN ed ea ON ea.pid = c.pa JOIN ed eb ON eb.pid = c.pb), "
        f"dd AS (SELECT *, {PAIR_D1} AS d1, {PAIR_D2} AS d2, "
        f"{PAIR_D3} AS d3, {PAIR_D4} AS d4 FROM ep), "
        f"fl AS (SELECT pa, pb, MAX(CASE WHEN {PAIR_CONTACT} THEN 1 ELSE 0 END) AS anyc, "
        f"MAX(CASE WHEN {PAIR_COLLINEAR} THEN 1 ELSE 0 END) AS anyo "
        "FROM dd GROUP BY 1, 2), "
        f"cls AS (SELECT c.*, f.anyc, f.anyo, {PAIR_AREAS} AS areai, "
        f"{PAIR_GAP2} AS gap2 FROM cand c JOIN fl f ON f.pa = c.pa AND f.pb = c.pb) "
        f"SELECT CAST(pa AS BIGINT) AS pid_a, CAST(pb AS BIGINT) AS pid_b, "
        f"{PAIR_PRED} AS predicate, "
        "CAST(CASE WHEN areai > 0 OR anyc = 1 THEN 1 ELSE 0 END AS INT) AS intersects, "
        f"CAST(CASE WHEN gap2 <= {_TAU * _TAU} THEN 1 ELSE 0 END AS INT) AS within_dist "
        "FROM cls ORDER BY pid_a, pid_b"
    )


@Q.register("location_predicates", _location_pred_sql())
def q_location_predicates(spark, sf):
    from .operators.overlay import location_predicates

    return location_predicates(spark)


# -- convex hull + minimum bounding box (§2.4/§2.7;
# MinimumConvexHull.java / MinimumBoundingBox.java): hull by the set-based
# support test, MBB by join-formulated rotating calipers.
_CH_V = (
    f"chv AS (SELECT poly_id, vi, x, y FROM {vertices_sql_values()} "
    "t(poly_id, ring, vi, nv, x, y) WHERE ring = 0)"
)
_CH_HE = (
    "he AS (SELECT a.poly_id, a.vi AS ai, b.vi AS bi, a.x AS ax, a.y AS ay, "
    "b.x AS bx, b.y AS by FROM chv a JOIN chv b "
    "ON b.poly_id = a.poly_id AND b.vi != a.vi "
    "JOIN chv w ON w.poly_id = a.poly_id "
    "GROUP BY 1, 2, 3, 4, 5, 6, 7 "
    "HAVING MIN((b.x - a.x) * (w.y - a.y) - (b.y - a.y) * (w.x - a.x)) >= 0)"
)


@Q.register(
    "convex_hull",
    f"WITH {_CH_V}, {_CH_HE} "
    "SELECT poly_id, COUNT(*) AS n_hull, "
    "CAST(ROUND(SUM(ax * by - bx * ay) / 2e0, 6) AS DOUBLE) AS hull_area, "
    "CAST(ROUND(SUM(SQRT((bx - ax) * (bx - ax) + (by - ay) * (by - ay))), 6) AS DOUBLE) AS hull_perim "
    "FROM he GROUP BY 1 ORDER BY 1",
)
def q_convex_hull(spark, sf):
    from .operators.vector import convex_hull_metrics

    return convex_hull_metrics(spark)


@Q.register(
    "min_bounding_box",
    f"WITH {_CH_V}, {_CH_HE}, "
    "ext AS (SELECT h.poly_id, h.ax, h.ay, h.bx, h.by, "
    "MAX((w.x - h.ax) * (h.bx - h.ax) + (w.y - h.ay) * (h.by - h.ay)) AS smax, "
    "MIN((w.x - h.ax) * (h.bx - h.ax) + (w.y - h.ay) * (h.by - h.ay)) AS smin, "
    "MAX((h.bx - h.ax) * (w.y - h.ay) - (h.by - h.ay) * (w.x - h.ax)) AS tmax, "
    "MIN((h.bx - h.ax) * (w.y - h.ay) - (h.by - h.ay) * (w.x - h.ax)) AS tmin "
    "FROM he h JOIN chv w ON w.poly_id = h.poly_id GROUP BY 1, 2, 3, 4, 5) "
    "SELECT poly_id, CAST(ROUND(MIN((smax - smin) * (tmax - tmin) / "
    "((bx - ax) * (bx - ax) + (by - ay) * (by - ay))), 6) AS DOUBLE) AS mbb_area "
    "FROM ext GROUP BY 1 ORDER BY 1",
)
def q_min_bounding_box(spark, sf):
    from .operators.vector import minimum_bounding_box

    return minimum_bounding_box(spark)


# -- small named VectorTools: ExtractNodes / RemovePolygonHoles /
# LayerFootprint / Smooth ----------------------------------------------------
@Q.register(
    "extract_nodes",
    f"WITH vtx AS (SELECT poly_id, ring, vi, x, y FROM {vertices_sql_values()} "
    "t(poly_id, ring, vi, nv, x, y)) "
    "SELECT poly_id, ring, vi, x, y FROM vtx ORDER BY poly_id, ring, vi",
)
def q_extract_nodes(spark, sf):
    from .sources.polygons import polygons_df

    return polygons_df(spark).select(
        "poly_id", F.posexplode("rings").alias("ring", "r")
    ).select(
        "poly_id", "ring", F.posexplode("r").alias("vi", "p")
    ).select(
        "poly_id", "ring", "vi",
        F.expr("p[0]").alias("x"), F.expr("p[1]").alias("y"),
    ).orderBy("poly_id", "ring", "vi")


@Q.register(
    "remove_polygon_holes",
    f"WITH vtx AS (SELECT poly_id, ring, vi, x, y FROM {vertices_sql_values()} "
    "t(poly_id, ring, vi, nv, x, y)) "
    "SELECT poly_id, COUNT(*) AS n_shell_vertices FROM vtx WHERE ring = 0 "
    "GROUP BY 1 ORDER BY 1",
)
def q_remove_polygon_holes(spark, sf):
    from .sources.polygons import polygons_df

    return (
        polygons_df(spark)
        .select("poly_id", F.expr("size(rings[0])").alias("n_shell_vertices")
                .cast("long"))
        .orderBy("poly_id")
    )


@Q.register(
    "layer_footprint",
    f"WITH vtx AS (SELECT poly_id, ring, vi, x, y FROM {vertices_sql_values()} "
    "t(poly_id, ring, vi, nv, x, y)) "
    "SELECT MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax, "
    "CAST(COUNT(DISTINCT poly_id) AS BIGINT) AS n_features FROM vtx",
)
def q_layer_footprint(spark, sf):
    from .sources.polygons import polygons_df

    v = polygons_df(spark).select(
        "poly_id", F.explode("rings").alias("r")
    ).select("poly_id", F.explode("r").alias("p")).select(
        "poly_id", F.expr("p[0]").alias("x"), F.expr("p[1]").alias("y")
    )
    return v.agg(
        F.min("x").alias("xmin"), F.min("y").alias("ymin"),
        F.max("x").alias("xmax"), F.max("y").alias("ymax"),
        F.countDistinct("poly_id").alias("n_features"),
    )


# Smooth.java: 3-point moving average along each ring with wraparound;
# the mean is written as ONE shared expression text so both engines run
# the identical float op sequence (no rounding needed).
@Q.register(
    "smooth_vector",
    f"WITH vtx AS (SELECT poly_id, ring, vi, nv, x, y FROM {vertices_sql_values()} "
    "t(poly_id, ring, vi, nv, x, y)), "
    "sm AS (SELECT poly_id, ring, vi, "
    "COALESCE(LAG(x) OVER w, LAST_VALUE(x) OVER w2) AS px, "
    "COALESCE(LAG(y) OVER w, LAST_VALUE(y) OVER w2) AS py, x, y, "
    "COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w2) AS nx, "
    "COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w2) AS ny "
    "FROM vtx WINDOW w AS (PARTITION BY poly_id, ring ORDER BY vi), "
    "w2 AS (PARTITION BY poly_id, ring ORDER BY vi "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) "
    "SELECT poly_id, ring, vi, ((px + x) + nx) / 3e0 AS sx, "
    "((py + y) + ny) / 3e0 AS sy FROM sm ORDER BY poly_id, ring, vi",
)
def q_smooth_vector(spark, sf):
    from pyspark.sql import Window

    from .sources.polygons import polygons_df

    vtx = polygons_df(spark).select(
        "poly_id", F.posexplode("rings").alias("ring", "r")
    ).select("poly_id", "ring", F.posexplode("r").alias("vi", "p")).select(
        "poly_id", "ring", "vi",
        F.expr("p[0]").alias("x"), F.expr("p[1]").alias("y"),
    )
    w = Window.partitionBy("poly_id", "ring").orderBy("vi")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    px = F.coalesce(F.lag("x").over(w), F.last("x").over(w2))
    py = F.coalesce(F.lag("y").over(w), F.last("y").over(w2))
    nx = F.coalesce(F.lead("x").over(w), F.first("x").over(w2))
    ny = F.coalesce(F.lead("y").over(w), F.first("y").over(w2))
    return vtx.select(
        "poly_id", "ring", "vi",
        ((px + F.col("x")) + nx).alias("_sx"),
        ((py + F.col("y")) + ny).alias("_sy"),
    ).select(
        "poly_id", "ring", "vi",
        (F.col("_sx") / 3.0).alias("sx"), (F.col("_sy") / 3.0).alias("sy"),
    ).orderBy("poly_id", "ring", "vi")


# -- ModifiedKMeans (§2.13; ImageProcessingTools ModifiedKMeans.java:301-370):
# k-means plus removal of classes below the minimum allowable size, with
# the orphaned points reassigned to the surviving centroids (min size 50
# drops the smallest synthetic cluster, n = 44).
_MKM_MIN = 50


@Q.register(
    "modified_kmeans",
    f"{_PTS}, {_km_oracle()}, "
    f"surv AS (SELECT sid, sx, sy FROM seeds{_KM_ITERS} WHERE n >= {_MKM_MIN}), "
    + _iso_asg_sql("surv", "masg")
    + " SELECT sid, COUNT(*) AS n, "
    "CAST(ROUND(SUM(lon) / COUNT(*), 6) AS DOUBLE) AS cx, "
    "CAST(ROUND(SUM(lat) / COUNT(*), 6) AS DOUBLE) AS cy "
    "FROM masg GROUP BY 1 ORDER BY 1",
)
def q_modified_kmeans(spark, sf):
    pts = Q._points(spark, sf).select("doc_id", "lon", "lat")
    cents = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(_SEEDS)], "sid int, sx double, sy double"
    )
    out, cents, _ = _lloyd_rounds(spark, pts, cents, _KM_ITERS)
    surv = out.where(F.col("n") >= _MKM_MIN).select("sid", "sx", "sy")
    d2 = (F.col("lon") - F.col("sx")) * (F.col("lon") - F.col("sx")) + (
        F.col("lat") - F.col("sy")
    ) * (F.col("lat") - F.col("sy"))
    masg = (
        pts.crossJoin(F.broadcast(surv))
        .select("doc_id", "lon", "lat", d2.alias("_d2"), "sid")
        .groupBy("doc_id", "lon", "lat")
        .agg(F.expr("min_by(sid, struct(_d2, sid))").alias("sid"))
    )
    return (
        masg.groupBy("sid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("lon") / F.count(F.lit(1)), 6).cast("double").alias("cx"),
            F.round(F.sum("lat") / F.count(F.lit(1)), 6).cast("double").alias("cy"),
        )
        .orderBy("sid")
    )


# -- Douglas-Peucker polygon simplification (§2.7 VectorTools
# SimplifyLineOrPolygon.java): deterministic anchors (0, floor(n/2)),
# 4 unrolled set-based rounds, shared squared-distance expression.
_DP_TOL2 = "4e0"
_DP_D2 = (
    "((b.x - a.x) * (g.y - a.y) - (b.y - a.y) * (g.x - a.x)) * "
    "((b.x - a.x) * (g.y - a.y) - (b.y - a.y) * (g.x - a.x)) / "
    "((b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y))"
)


def _dp_oracle(rounds: int = 12) -> str:
    parts = [
        f"chv2 AS (SELECT poly_id, vi, nv, x, y FROM {vertices_sql_values()} "
        "t(poly_id, ring, vi, nv, x, y) WHERE ring = 0)",
        "k0 AS MATERIALIZED (SELECT poly_id, vi, nv, x, y, "
        "(vi = 0 OR vi = CAST(FLOOR(nv / 2e0) AS BIGINT)) AS kept FROM chv2)",
    ]
    for r in range(rounds):
        parts.append(
            f"g{r} AS MATERIALIZED (SELECT *, "
            "MAX(CASE WHEN kept THEN vi END) OVER (PARTITION BY poly_id ORDER BY vi "
            "ROWS UNBOUNDED PRECEDING) AS pa, "
            "COALESCE(MIN(CASE WHEN kept THEN vi END) OVER (PARTITION BY poly_id "
            "ORDER BY vi ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), nv) AS pb "
            f"FROM k{r})"
        )
        parts.append(
            f"cand{r} AS (SELECT g.poly_id, g.vi, {_DP_D2} AS d2, "
            "ROW_NUMBER() OVER (PARTITION BY g.poly_id, g.pa "
            f"ORDER BY {_DP_D2} DESC, g.vi) AS rn "
            f"FROM g{r} g JOIN k{r} a ON a.poly_id = g.poly_id AND a.vi = g.pa "
            f"JOIN k{r} b ON b.poly_id = g.poly_id AND b.vi = g.pb % g.nv "
            "WHERE NOT g.kept)"
        )
        parts.append(
            f"k{r + 1} AS MATERIALIZED (SELECT k.poly_id, k.vi, k.nv, k.x, k.y, "
            "k.kept OR c.vi IS NOT NULL AS kept "
            f"FROM k{r} k LEFT JOIN (SELECT poly_id, vi FROM cand{r} "
            f"WHERE rn = 1 AND d2 > {_DP_TOL2}) c "
            "ON c.poly_id = k.poly_id AND c.vi = k.vi)"
        )
    return (
        "WITH " + ", ".join(parts)
        + f" SELECT poly_id, vi, x, y FROM k{rounds} WHERE kept "
        "ORDER BY poly_id, vi"
    )


@Q.register("simplify_polygon", _dp_oracle())
def q_simplify_polygon(spark, sf):
    from .operators.vector import simplify_rings

    return simplify_rings(spark).orderBy("poly_id", "vi")


# -- GroupPolygonsByOrientation (VectorTools
# GroupPolygonsByOrientation.java): long-axis orientation from the shell
# vertex regression (the patch_orientation formula on vector vertices),
# rounded 6 then binned into four 45-degree classes.
_GPO_OR = (
    "CASE WHEN sxx - sx * sx / n > 0e0 THEN "
    "FLOOR((90e0 - DEGREES(ATAN(-(sxy - sx * sy / n) / (sxx - sx * sx / n)))) "
    "* 1e6 + 0.5e0) / 1e6 ELSE 0e0 END"
)


@Q.register(
    "group_by_orientation",
    f"WITH chv AS (SELECT poly_id, vi, x, y FROM {vertices_sql_values()} "
    "t(poly_id, ring, vi, nv, x, y) WHERE ring = 0), "
    "mom AS (SELECT poly_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, "
    "SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM chv GROUP BY 1), "
    f"oc AS (SELECT poly_id, CAST(FLOOR(({_GPO_OR}) / 45e0) AS BIGINT) AS oclass FROM mom) "
    "SELECT oclass, COUNT(*) AS n_polys FROM oc GROUP BY 1 ORDER BY 1",
)
def q_group_by_orientation(spark, sf):
    from .operators.vector import shell_vertices

    v = shell_vertices(spark)
    mom = v.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    oc = mom.select(
        "poly_id",
        F.expr(f"CAST(FLOOR(({_GPO_OR}) / 45e0) AS BIGINT)").alias("oclass"),
    )
    return oc.groupBy("oclass").agg(F.count(F.lit(1)).alias("n_polys")) \
             .orderBy("oclass")


# -- VectorCleaning (VectorTools VectorCleaning.java): snap vertices to a
# dyadic lattice (0.25) and drop consecutive duplicates; reports per-poly
# vertex counts before/after (exact integer arithmetic after snapping).
@Q.register(
    "vector_cleaning",
    f"WITH vtx AS (SELECT poly_id, ring, vi, x, y FROM {vertices_sql_values()} "
    "t(poly_id, ring, vi, nv, x, y)), "
    "qz AS (SELECT poly_id, ring, vi, "
    "FLOOR(x * 4e0 + 0.5e0) AS qx, FLOOR(y * 4e0 + 0.5e0) AS qy FROM vtx), "
    "dl AS (SELECT poly_id, ring, vi, qx, qy, "
    "LAG(qx) OVER w AS px, LAG(qy) OVER w AS py "
    "FROM qz WINDOW w AS (PARTITION BY poly_id, ring ORDER BY vi)) "
    "SELECT poly_id, COUNT(*) AS n_before, "
    "CAST(SUM(CASE WHEN px IS NULL OR qx != px OR qy != py THEN 1 ELSE 0 END) AS BIGINT) AS n_after "
    "FROM dl GROUP BY 1 ORDER BY 1",
)
def q_vector_cleaning(spark, sf):
    from pyspark.sql import Window

    from .sources.polygons import polygons_df

    vtx = polygons_df(spark).select(
        "poly_id", F.posexplode("rings").alias("ring", "r")
    ).select("poly_id", "ring", F.posexplode("r").alias("vi", "p")).select(
        "poly_id", "ring", "vi",
        F.floor(F.expr("p[0]") * 4.0 + 0.5).alias("qx"),
        F.floor(F.expr("p[1]") * 4.0 + 0.5).alias("qy"),
    )
    w = Window.partitionBy("poly_id", "ring").orderBy("vi")
    dl = vtx.select(
        "poly_id", "qx", "qy",
        F.lag("qx").over(w).alias("px"), F.lag("qy").over(w).alias("py"),
    )
    return dl.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(F.expr(
            "CASE WHEN px IS NULL OR qx != px OR qy != py THEN 1 ELSE 0 END"
        )).cast("long").alias("n_after"),
    ).orderBy("poly_id")


# -- RemovePolygonNecks (§2.7 vector cleaning; VectorTools
# RemovePolygonNecks.java:262-420): per shell vertex, collect the vertex
# INDICES within `R` of it; if the index range wraps the ring seam
# (range == nv - 1) indices below nv/2 shift up by nv; a vertex is KEPT
# when the max gap between consecutive sorted indices >= G (its spatial
# neighborhood contains two separated runs of the ring — a neck).  Kept
# vertices emit as maximal index runs (necklines); non-terminal single-
# vertex runs are discarded, the run reaching the last vertex flushes at
# any length (reference's lineLength/terminal-flush behavior).  All index
# math integer-exact; the distance test is one exact double compare.
_PN_R2 = "144e0"
_PN_G = 3


@Q.register(
    "remove_polygon_necks",
    f"""WITH chv2 AS (SELECT poly_id, vi, nv, x, y FROM {vertices_sql_values()}
  t(poly_id, ring, vi, nv, x, y) WHERE ring = 0),
pr AS (SELECT a.poly_id, a.vi AS ci, a.nv, b.vi AS k
  FROM chv2 a JOIN chv2 b ON b.poly_id = a.poly_id
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_PN_R2}),
mm AS (SELECT poly_id, ci, nv, k,
  MAX(k) OVER w - MIN(k) OVER w AS rng
  FROM pr WINDOW w AS (PARTITION BY poly_id, ci)),
ad AS (SELECT poly_id, ci, nv,
  CASE WHEN rng = nv - 1 AND k < FLOOR(nv / 2e0) THEN k + nv ELSE k END AS kadj
  FROM mm),
gp AS (SELECT poly_id, ci, nv,
  kadj - LAG(kadj) OVER (PARTITION BY poly_id, ci ORDER BY kadj) AS gap
  FROM ad),
mg AS (SELECT poly_id, ci, nv, MAX(gap) AS maxgap FROM gp GROUP BY 1, 2, 3),
kept AS (SELECT poly_id, ci, nv FROM mg WHERE maxgap >= {_PN_G}),
seg AS (SELECT poly_id, ci, nv,
  ci - ROW_NUMBER() OVER (PARTITION BY poly_id ORDER BY ci) AS sid FROM kept),
runs AS (SELECT poly_id, CAST(MIN(ci) AS BIGINT) AS seg_start,
  COUNT(*) AS n_vertices, MAX(ci) AS mx, MAX(nv) AS nv
  FROM seg GROUP BY poly_id, sid)
SELECT poly_id, seg_start, n_vertices FROM runs
WHERE n_vertices >= 2 OR mx = nv - 1 ORDER BY 1, 2""",
)
def q_remove_polygon_necks(spark, sf):
    from pyspark.sql import Window

    from .operators.vector import shell_vertices

    v = shell_vertices(spark)
    nv = v.groupBy("poly_id").agg((F.max("vi") + 1).alias("nv"))
    a = v.join(nv, "poly_id")
    b = v.select(F.col("poly_id"), F.col("vi").alias("k"),
                 F.col("x").alias("bx"), F.col("y").alias("by"))
    pr = a.join(b, "poly_id").where(F.expr(
        f"(x - bx) * (x - bx) + (y - by) * (y - by) <= {_PN_R2}"
    )).select("poly_id", F.col("vi").alias("ci"), "nv", "k")
    wc = Window.partitionBy("poly_id", "ci")
    mm = pr.withColumn("rng", F.max("k").over(wc) - F.min("k").over(wc))
    ad = mm.select(
        "poly_id", "ci", "nv",
        F.expr("CASE WHEN rng = nv - 1 AND k < FLOOR(nv / 2e0) "
               "THEN k + nv ELSE k END").alias("kadj"),
    )
    wg = Window.partitionBy("poly_id", "ci").orderBy("kadj")
    gp = ad.withColumn("gap", F.col("kadj") - F.lag("kadj").over(wg))
    mg = gp.groupBy("poly_id", "ci", "nv").agg(F.max("gap").alias("maxgap"))
    kept = mg.where(F.col("maxgap") >= _PN_G)
    ws = Window.partitionBy("poly_id").orderBy("ci")
    seg = kept.withColumn("sid", F.col("ci") - F.row_number().over(ws))
    runs = seg.groupBy("poly_id", "sid").agg(
        F.min("ci").cast("long").alias("seg_start"),
        F.count(F.lit(1)).alias("n_vertices"),
        F.max("ci").alias("mx"), F.max("nv").alias("nv"),
    )
    return (
        runs.where((F.col("n_vertices") >= 2) | (F.col("mx") == F.col("nv") - 1))
        .select("poly_id", "seg_start", "n_vertices")
        .orderBy("poly_id", "seg_start")
    )


# -- FindPolygonChains (§2.4 vector analysis; VectorTools
# FindPolygonChains.java:200-520): group elongated polygons that line up
# end-to-end into chains.  Deviations from the reference, documented per
# survey policy: the minimum box comes from the EXACT rotating-calipers
# kernel (the reference brute-rotates in 0.5-degree steps); the chain
# endpoints are the extreme vertex projections onto the box's long axis
# (the reference picks box-corner key points nearest the axis tips); and
# the handshake is the ORDER-INDEPENDENT mutual-nearest match (the
# reference's scan-order exclusion can only differ when a point's best
# partner was already consumed — a race on input order, not a geometric
# property).  The reference's candidate test is kept verbatim: d1 < d2,
# d1 < d3, and the span test d4 > tmp2 + (tmp3 - tmp2)/2 built from the
# two long-axis lengths.  Chains = connected components over the linked
# polygon pairs, labeled by min poly_id.
_FC_EL = "15e-2"     # elongation threshold (1 - short/long)
_FC_R2 = "400e0"     # endpoint search radius^2

_FC_S = "(w.x - h.ax) * (h.bx - h.ax) + (w.y - h.ay) * (h.by - h.ay)"
_FC_T = "(h.bx - h.ax) * (w.y - h.ay) - (h.by - h.ay) * (w.x - h.ax)"
_FC_SAD = (
    "LEAST(plen, qlen) + SQRT(d1)"  # tmp1
)


def _fc_oracle() -> str:
    return f"""{_CH_V}, {_CH_HE},
ext AS (SELECT h.poly_id, h.ax, h.ay, h.bx, h.by,
  MAX({_FC_S}) AS smax, MIN({_FC_S}) AS smin,
  MAX({_FC_T}) AS tmax, MIN({_FC_T}) AS tmin,
  SQRT((h.bx - h.ax) * (h.bx - h.ax) + (h.by - h.ay) * (h.by - h.ay)) AS el
  FROM he h JOIN chv w ON w.poly_id = h.poly_id
  GROUP BY 1, 2, 3, 4, 5),
best AS (SELECT * FROM (SELECT *,
  ROW_NUMBER() OVER (PARTITION BY poly_id
    ORDER BY (smax - smin) * (tmax - tmin) / (el * el), ax, ay, bx, by) AS rn
  FROM ext) t WHERE rn = 1),
axes AS (SELECT poly_id, ax, ay, bx, by, el,
  (smax - smin) / el AS ldir, (tmax - tmin) / el AS lnorm FROM best),
elo AS (SELECT *, GREATEST(ldir, lnorm) AS laxis FROM axes
  WHERE 1e0 - LEAST(ldir, lnorm) / GREATEST(ldir, lnorm) > {_FC_EL}),
prj AS (SELECT e.poly_id, w.vi, w.x, w.y, e.laxis,
  CASE WHEN e.ldir >= e.lnorm THEN ({_FC_S.replace('h.', 'e.')}) / e.el
       ELSE ({_FC_T.replace('h.', 'e.')}) / e.el END AS pr
  FROM elo e JOIN chv w ON w.poly_id = e.poly_id),
epA AS (SELECT poly_id, x, y, laxis FROM (SELECT *,
  ROW_NUMBER() OVER (PARTITION BY poly_id ORDER BY pr DESC, vi) AS rn
  FROM prj) t WHERE rn = 1),
epB AS (SELECT poly_id, x, y, laxis FROM (SELECT *,
  ROW_NUMBER() OVER (PARTITION BY poly_id ORDER BY pr ASC, vi) AS rn
  FROM prj) t WHERE rn = 1),
eps AS (SELECT a.poly_id, 1 AS e, a.x, a.y, b.x AS ox, b.y AS oy,
  a.laxis AS plen FROM epA a JOIN epB b ON b.poly_id = a.poly_id
  UNION ALL SELECT a.poly_id, 2, b.x, b.y, a.x, a.y, a.laxis
  FROM epA a JOIN epB b ON b.poly_id = a.poly_id),
cnd AS (SELECT p.poly_id AS pp, p.e AS pe, q.poly_id AS qp, q.e AS qe,
  (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d1,
  p.plen, q.plen AS qlen,
  (q.x - p.ox) * (q.x - p.ox) + (q.y - p.oy) * (q.y - p.oy) AS d2,
  (q.ox - p.x) * (q.ox - p.x) + (q.oy - p.y) * (q.oy - p.y) AS d3,
  SQRT((q.ox - p.ox) * (q.ox - p.ox) + (q.oy - p.oy) * (q.oy - p.oy)) AS d4
  FROM eps p JOIN eps q ON q.poly_id != p.poly_id),
ok AS (SELECT * FROM cnd
  WHERE d1 <= {_FC_R2} AND d1 < d2 AND d1 < d3 AND d4 >
    SQRT(({_FC_SAD}) * ({_FC_SAD}) + GREATEST(plen, qlen) * GREATEST(plen, qlen))
    + (SQRT(d1) + plen + qlen
       - SQRT(({_FC_SAD}) * ({_FC_SAD}) + GREATEST(plen, qlen) * GREATEST(plen, qlen))) * 5e-1),
pick AS (SELECT * FROM (SELECT *,
  ROW_NUMBER() OVER (PARTITION BY pp, pe ORDER BY d1, qp, qe) AS rn
  FROM ok) t WHERE rn = 1),
lnk AS (SELECT a.pp, a.qp FROM pick a JOIN pick b
  ON b.pp = a.qp AND b.pe = a.qe AND b.qp = a.pp AND b.qe = a.pe)
"""


@Q.register(
    "find_polygon_chains",
    f"""WITH RECURSIVE {_fc_oracle()},
cc(id, rid) AS (SELECT pp, pp FROM lnk UNION
  SELECT c.id, l.qp FROM cc c JOIN lnk l ON l.pp = c.rid),
grp AS (SELECT id AS poly_id, MIN(rid) AS chain FROM cc GROUP BY 1)
SELECT g.poly_id, CAST(g.chain AS BIGINT) AS chain,
  CAST(COUNT(*) OVER (PARTITION BY g.chain) AS BIGINT) AS n_chain
FROM grp g ORDER BY 1""",
)
def q_find_polygon_chains(spark, sf):
    from pyspark.sql import Window

    from .operators.vector import convex_hull_edges, shell_vertices

    he = convex_hull_edges(spark)
    w = shell_vertices(spark).select(
        "poly_id", "vi", F.col("x").alias("wx"), F.col("y").alias("wy"))
    s = F.expr("(wx - ax) * (bx - ax) + (wy - ay) * (by - ay)")
    t = F.expr("(bx - ax) * (wy - ay) - (by - ay) * (wx - ax)")
    ext = (
        he.join(w, "poly_id")
        .groupBy("poly_id", "ax", "ay", "bx", "by")
        .agg(F.max(s).alias("smax"), F.min(s).alias("smin"),
             F.max(t).alias("tmax"), F.min(t).alias("tmin"))
        .withColumn("el", F.expr(
            "SQRT((bx - ax) * (bx - ax) + (by - ay) * (by - ay))"))
    )
    wb = Window.partitionBy("poly_id").orderBy(
        F.expr("(smax - smin) * (tmax - tmin) / (el * el)"),
        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"))
    best = ext.withColumn("rn", F.row_number().over(wb)).where("rn = 1")
    axes = best.select(
        "poly_id", "ax", "ay", "bx", "by", "el",
        F.expr("(smax - smin) / el").alias("ldir"),
        F.expr("(tmax - tmin) / el").alias("lnorm"),
    )
    elo = axes.where(F.expr(
        f"1e0 - LEAST(ldir, lnorm) / GREATEST(ldir, lnorm) > {_FC_EL}"
    )).withColumn("laxis", F.expr("GREATEST(ldir, lnorm)"))
    prj = elo.join(w, "poly_id").select(
        "poly_id", "vi", F.col("wx").alias("x"), F.col("wy").alias("y"), "laxis",
        F.expr(
            "CASE WHEN ldir >= lnorm THEN "
            "((wx - ax) * (bx - ax) + (wy - ay) * (by - ay)) / el "
            "ELSE ((bx - ax) * (wy - ay) - (by - ay) * (wx - ax)) / el END"
        ).alias("pr"),
    )
    wA = Window.partitionBy("poly_id").orderBy(F.col("pr").desc(), F.col("vi"))
    wB = Window.partitionBy("poly_id").orderBy(F.col("pr").asc(), F.col("vi"))
    epA = prj.withColumn("rn", F.row_number().over(wA)).where("rn = 1") \
        .select("poly_id", "x", "y", "laxis")
    epB = prj.withColumn("rn", F.row_number().over(wB)).where("rn = 1") \
        .select("poly_id", F.col("x").alias("bxx"), F.col("y").alias("byy"))
    eps = (
        epA.join(epB, "poly_id")
        .select("poly_id", F.lit(1).alias("e"), "x", "y",
                F.col("bxx").alias("ox"), F.col("byy").alias("oy"),
                F.col("laxis").alias("plen"))
        .unionByName(
            epA.join(epB, "poly_id")
            .select("poly_id", F.lit(2).alias("e"),
                    F.col("bxx").alias("x"), F.col("byy").alias("y"),
                    F.col("x").alias("ox"), F.col("y").alias("oy"),
                    F.col("laxis").alias("plen")))
    )
    # cell-bucket candidate prefilter (the KdTree role in
    # FindPolygonChains.java): endpoints within radius sqrt(_FC_R2)=20 of
    # each other differ by at most one 20-unit grid cell per axis, so the
    # exact d1 test only needs the 3x3 neighbor buckets — an equi-join on
    # (gx, gy), never the layer^2 theta-join.
    q = eps.select(F.col("poly_id").alias("qp"), F.col("e").alias("qe"),
                   F.col("x").alias("qx"), F.col("y").alias("qy"),
                   F.col("ox").alias("qox"), F.col("oy").alias("qoy"),
                   F.col("plen").alias("qlen"),
                   F.floor(F.col("x") / 20).alias("gx"),
                   F.floor(F.col("y") / 20).alias("gy"))
    nbr = spark.range(9).select(
        (F.col("id") % 3 - 1).alias("dgx"),
        (F.floor(F.col("id") / 3) - 1).alias("dgy"))
    p_side = (
        eps.withColumnRenamed("poly_id", "pp").withColumnRenamed("e", "pe")
        .crossJoin(F.broadcast(nbr))
        .select("pp", "pe", "x", "y", "ox", "oy", "plen",
                (F.floor(F.col("x") / 20) + F.col("dgx")).alias("gx"),
                (F.floor(F.col("y") / 20) + F.col("dgy")).alias("gy"))
    )
    cnd = p_side \
        .join(q, ["gx", "gy"]).where(F.col("qp") != F.col("pp")).select(
            "pp", "pe", "qp", "qe", "plen", "qlen",
            F.expr("(x - qx) * (x - qx) + (y - qy) * (y - qy)").alias("d1"),
            F.expr("(qx - ox) * (qx - ox) + (qy - oy) * (qy - oy)").alias("d2"),
            F.expr("(qox - x) * (qox - x) + (qoy - y) * (qoy - y)").alias("d3"),
            F.expr("SQRT((qox - ox) * (qox - ox) + (qoy - oy) * (qoy - oy))").alias("d4"),
        )
    sad = ("SQRT((LEAST(plen, qlen) + SQRT(d1)) * (LEAST(plen, qlen) + SQRT(d1)) "
           "+ GREATEST(plen, qlen) * GREATEST(plen, qlen))")
    ok = cnd.where(F.expr(
        f"d1 <= {_FC_R2} AND d1 < d2 AND d1 < d3 AND d4 > {sad} "
        f"+ (SQRT(d1) + plen + qlen - {sad}) * 5e-1"))
    wp = Window.partitionBy("pp", "pe").orderBy("d1", "qp", "qe")
    pick = ok.withColumn("rn", F.row_number().over(wp)).where("rn = 1") \
        .select("pp", "pe", "qp", "qe").localCheckpoint()
    lnk = pick.alias("a").join(
        pick.alias("b"),
        (F.col("b.pp") == F.col("a.qp")) & (F.col("b.pe") == F.col("a.qe"))
        & (F.col("b.qp") == F.col("a.pp")) & (F.col("b.qe") == F.col("a.pe")),
    ).select(F.col("a.pp").alias("pp"), F.col("a.qp").alias("qp"))
    # hook + shortcut min-label closure (condense.merge_labels) — log-round
    # label doubling that raises on non-convergence instead of silently
    # mislabeling long chains (the exact web-scale failure of one-hop rounds)
    from .operators.condense import merge_labels

    lab = merge_labels(
        lnk.select(F.col("pp").alias("plabel"), F.col("qp").alias("nplabel"))
    ).select(F.col("plabel").alias("poly_id"), F.col("glabel").alias("chain"))
    wn = Window.partitionBy("chain")
    return lab.select(
        "poly_id", F.col("chain").cast("long").alias("chain"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_chain"),
    ).orderBy("poly_id")
