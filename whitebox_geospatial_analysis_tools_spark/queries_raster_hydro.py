"""Hydrology raster queries (SURVEY.md §2.12) — split from queries_raster.py (pure move, round 5)."""


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
    _D8_TGT_DC,
    _D8_TGT_DR,
    _DINF_SQL_FACETS,
    _HYD_BASE,
    _HYD_EDGES,
    _SQ2,
    _dinf_facets_parts,
    _hydem,
)
from .queries_raster_focal import (  # noqa: F401 — shared fragments (pure move)
    _NBR2,
    _explode_focal,
)

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


