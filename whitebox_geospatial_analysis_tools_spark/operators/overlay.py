"""Vector overlay: polygon-polygon boolean operations via convex clipping.

Reference semantics (SURVEY.md §2.7, VectorTools):
  Intersect    VectorTools/src/plugins/Intersect.java:291-299
  Clip         VectorTools/src/plugins/Clip.java:267,455
  Difference   VectorTools/src/plugins/Difference.java:332-334
  Union        VectorTools/src/plugins/Union.java:294-295
(there all delegated to JTS overlay; here a from-scratch Sutherland-Hodgman
clipping kernel — public-domain computational geometry, no geometry lib).

Model: subject layer = the multi-ring star polygons (shells + even-odd
holes); clip layer = pairwise-DISJOINT convex hexagons (sources/polygons.py
make_clip_layer).  Sutherland-Hodgman clips any simple ring against a convex
polygon exactly; even-odd area of a clipped subject = area(shell ∩ clip) -
Σ area(hole ∩ clip).  Because clips are disjoint:
  difference(subject \\ clips) area = area(subject) - Σ_k area(subject ∩ clip_k)
  union area = Σ area(subject) + Σ area(clip) - Σ area(subject ∩ clip)
so all four boolean overlays are exactly derivable from the one kernel.

Physical shape: both layers are dimension-sized (the broadcast side of every
join in this engine); candidate pairs come from a bbox equi-prefilter and
the clipping runs as ONE Arrow-batched mapInPandas over the pair rows — the
geometry kernel is per-pair numpy, never touched by the big fact side.

Float contract: the kernel's inside test, intersection point, and shoelace
formulas are written in exactly the operation order the DuckDB oracle SQL
uses (queries_vector.py), so branch decisions and vertex counts match
bit-for-bit; areas (sum-order-dependent) round via the shared half-up
floor(x*1e6+0.5)/1e6 idiom.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.polygons import (
    concave_triangles, make_clip_layer, make_concave_clip_layer,
    make_polygon_layer,
)


def sh_clip(ring: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland-Hodgman: clip a simple ring against a CCW convex polygon.

    Emission rule per directed subject edge p->q against clip edge a->b
    (inside = left of a->b): crossing -> emit intersection; q inside ->
    emit q.  Matches the staged SQL oracle exactly (same formulas, same
    branch predicates)."""
    pts = np.asarray(ring, dtype=np.float64)
    m = len(clip)
    for k in range(m):
        if len(pts) == 0:
            break
        ax, ay = float(clip[k, 0]), float(clip[k, 1])
        bx, by = float(clip[(k + 1) % m, 0]), float(clip[(k + 1) % m, 1])
        out: list[tuple[float, float]] = []
        n = len(pts)
        px, py = pts[:, 0], pts[:, 1]
        qx, qy = np.roll(px, -1), np.roll(py, -1)
        dp = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        dq = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        for i in range(n):
            crossing = (dq[i] >= 0.0 and dp[i] < 0.0) or (dq[i] < 0.0 and dp[i] >= 0.0)
            if crossing:
                t = dp[i] / (dp[i] - dq[i])
                out.append((px[i] + t * (qx[i] - px[i]), py[i] + t * (qy[i] - py[i])))
            if dq[i] >= 0.0:
                out.append((qx[i], qy[i]))
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    return pts


def _shoelace_seq(pts: np.ndarray) -> float:
    """Signed shoelace in vertex order (CCW positive)."""
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    qx, qy = np.roll(x, -1), np.roll(y, -1)
    return float(np.sum(x * qy - qx * y) / 2.0)


def _round6(x: float) -> float:
    return float(np.floor(x * 1e6 + 0.5) / 1e6)


def _subjects_df(spark: SparkSession) -> DataFrame:
    layer = make_polygon_layer()
    rows = [
        (
            int(layer.poly_id[i]),
            [[[float(x), float(y)] for x, y in ring] for ring in layer.rings[i]],
            [float(v) for v in layer.bbox[i]],
        )
        for i in range(layer.n)
    ]
    return spark.createDataFrame(
        rows, "poly_id long, rings array<array<array<double>>>, bbox array<double>"
    )


def _clips_df(spark: SparkSession) -> DataFrame:
    layer = make_clip_layer()
    rows = [
        (
            int(layer.poly_id[i]),
            [[float(x), float(y)] for x, y in layer.rings[i][0]],
            [float(v) for v in layer.bbox[i]],
        )
        for i in range(layer.n)
    ]
    return spark.createDataFrame(
        rows, "clip_id long, clip_ring array<array<double>>, cbbox array<double>"
    )


def _candidate_pairs(spark: SparkSession) -> DataFrame:
    """bbox-overlap prefilter (broadcast nested-loop over two tiny layers)."""
    s = _subjects_df(spark)
    c = _clips_df(spark)
    return s.join(
        F.broadcast(c),
        (F.expr("bbox[0] <= cbbox[2]") & F.expr("bbox[2] >= cbbox[0]")
         & F.expr("bbox[1] <= cbbox[3]") & F.expr("bbox[3] >= cbbox[1]")),
        "inner",
    )


def intersect_areas(spark: SparkSession) -> DataFrame:
    """(poly_id, clip_id, n_vertices, area): even-odd area of each
    subject ∩ clip pair with positive area (Intersect/Clip output measure).

    n_vertices counts every emitted clipped-ring vertex (shells + holes) —
    a structural check on the clipping itself, not just the area."""
    pairs = _candidate_pairs(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                clip = np.asarray([[p[0], p[1]] for p in r.clip_ring])
                nv = 0
                raw = 0.0
                for ri, ring in enumerate(r.rings):
                    pts = sh_clip(np.asarray([[p[0], p[1]] for p in ring]), clip)
                    nv += len(pts)
                    a = _shoelace_seq(pts)
                    raw += a if ri == 0 else -a
                if raw > 1e-9:
                    out.append((r.poly_id, r.clip_id, nv, _round6(raw), raw))
            yield pd.DataFrame(
                out, columns=["poly_id", "clip_id", "n_vertices", "area", "_raw"]
            )

    return pairs.mapInPandas(
        kernel,
        "poly_id long, clip_id long, n_vertices long, area double, _raw double",
    ).drop("_raw")


def _pair_raw_areas(spark: SparkSession) -> DataFrame:
    """(poly_id, clip_id, _raw): unfiltered raw intersection areas (for the
    difference/union derivations, which subtract ALL intersection mass)."""
    pairs = _candidate_pairs(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                clip = np.asarray([[p[0], p[1]] for p in r.clip_ring])
                raw = 0.0
                for ri, ring in enumerate(r.rings):
                    a = _shoelace_seq(
                        sh_clip(np.asarray([[p[0], p[1]] for p in ring]), clip)
                    )
                    raw += a if ri == 0 else -a
                out.append((r.poly_id, r.clip_id, raw))
            yield pd.DataFrame(out, columns=["poly_id", "clip_id", "_raw"])

    return pairs.mapInPandas(kernel, "poly_id long, clip_id long, _raw double")


def subject_areas(spark: SparkSession) -> DataFrame:
    """(poly_id, _sa): even-odd area (shell - holes) per subject polygon."""
    s = _subjects_df(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                sa = 0.0
                for ri, ring in enumerate(r.rings):
                    a = _shoelace_seq(np.asarray([[p[0], p[1]] for p in ring]))
                    sa += a if ri == 0 else -a
                out.append((r.poly_id, sa))
            yield pd.DataFrame(out, columns=["poly_id", "_sa"])

    return s.mapInPandas(kernel, "poly_id long, _sa double")


def clip_areas(spark: SparkSession) -> DataFrame:
    c = _clips_df(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (r.clip_id,
                 _shoelace_seq(np.asarray([[p[0], p[1]] for p in r.clip_ring])))
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(out, columns=["clip_id", "_ca"])

    return c.mapInPandas(kernel, "clip_id long, _ca double")


def difference_areas(spark: SparkSession) -> DataFrame:
    """(poly_id, area): area of subject minus ALL clip polygons — exact via
    disjoint clips (Difference.java semantics, area measure)."""
    sa = subject_areas(spark)
    inter = _pair_raw_areas(spark).groupBy("poly_id").agg(
        F.sum("_raw").alias("_ia")
    )
    return (
        sa.join(inter, "poly_id", "left")
        .select(
            "poly_id",
            F.expr("FLOOR((_sa - COALESCE(_ia, 0e0)) * 1e6 + 0.5e0) / 1e6").alias("area"),
        )
        .orderBy("poly_id")
    )


# ---------------------------------------------------------------------------
# general (concave-clip) overlay via convex decomposition
# ---------------------------------------------------------------------------
# The reference's JTS overlay (Intersect.java:291-299,
# SymmetricDifference.java:281-323) handles arbitrary polygon x polygon.
# Here the concave clip layer is star-shaped, so the fan from each star's
# center is an exact disjoint convex decomposition; overlay measures against
# a concave clip = sum of the SH kernel over its triangles.  Decomposition is
# layer prep (small side, done once); the pair stream stays one Arrow-batched
# mapInPandas — the same data-parallel shape as the convex path, with no
# stateful Greiner-Hormann traversal to distribute.


def _concave_df(spark: SparkSession) -> DataFrame:
    layer = make_concave_clip_layer()
    tris: dict[int, list] = {}
    for cid, _t, tri in concave_triangles():
        tris.setdefault(cid, []).append([[float(x), float(y)] for x, y in tri])
    rows = [
        (
            int(layer.poly_id[i]),
            tris[int(layer.poly_id[i])],
            [[float(x), float(y)] for x, y in layer.rings[i][0]],
            [float(v) for v in layer.bbox[i]],
        )
        for i in range(layer.n)
    ]
    return spark.createDataFrame(
        rows,
        "clip_id long, tris array<array<array<double>>>, "
        "boundary array<array<double>>, cbbox array<double>",
    )


def _concave_pairs(spark: SparkSession) -> DataFrame:
    s = _subjects_df(spark)
    c = _concave_df(spark)
    return s.join(
        F.broadcast(c),
        (F.expr("bbox[0] <= cbbox[2]") & F.expr("bbox[2] >= cbbox[0]")
         & F.expr("bbox[1] <= cbbox[3]") & F.expr("bbox[3] >= cbbox[1]")),
        "inner",
    )


def _concave_pair_raw(spark: SparkSession) -> DataFrame:
    """(poly_id, clip_id, n_vertices, _raw): even-odd intersection area of
    each bbox-candidate subject x star pair, summed over fan triangles in
    (ring, triangle) order."""
    pairs = _concave_pairs(spark)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                nv = 0
                raw = 0.0
                for ri, ring in enumerate(r.rings):
                    rv = np.asarray([[p[0], p[1]] for p in ring])
                    for tri in r.tris:
                        pts = sh_clip(rv, np.asarray([[p[0], p[1]] for p in tri]))
                        nv += len(pts)
                        a = _shoelace_seq(pts)
                        raw += a if ri == 0 else -a
                out.append((r.poly_id, r.clip_id, nv, raw))
            yield pd.DataFrame(out, columns=["poly_id", "clip_id", "n_vertices", "_raw"])

    return pairs.mapInPandas(
        kernel, "poly_id long, clip_id long, n_vertices long, _raw double"
    )


def concave_intersect_areas(spark: SparkSession) -> DataFrame:
    """(poly_id, clip_id, n_vertices, area): positive-area subject ∩ star
    pairs (general-overlay Intersect measure, concave clip side)."""
    raw = _concave_pair_raw(spark)
    return (
        raw.where(F.col("_raw") > 1e-9)
        .select(
            "poly_id", "clip_id", "n_vertices",
            F.expr("FLOOR(_raw * 1e6 + 0.5e0) / 1e6").alias("area"),
        )
    )


def sym_difference_areas(spark: SparkSession) -> DataFrame:
    """(poly_id, clip_id, area): |subject Δ star| = |A| + |B| - 2|A ∩ B| per
    bbox-candidate pair (SymmetricDifference.java:281-323 area measure,
    concave clip side)."""
    raw = _concave_pair_raw(spark)
    sa = subject_areas(spark)
    c = _concave_df(spark)

    def ckernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (r.clip_id,
                 _shoelace_seq(np.asarray([[p[0], p[1]] for p in r.boundary])))
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(out, columns=["clip_id", "_ca"])

    ca = c.mapInPandas(ckernel, "clip_id long, _ca double")
    return (
        raw.join(F.broadcast(sa), "poly_id")
        .join(F.broadcast(ca), "clip_id")
        .select(
            "poly_id", "clip_id",
            F.expr("FLOOR((_sa + _ca - 2e0 * _raw) * 1e6 + 0.5e0) / 1e6").alias("area"),
        )
        .orderBy("poly_id", "clip_id")
    )


def union_area(spark: SparkSession) -> DataFrame:
    """1-row (area): |subjects ∪ clips| by inclusion-exclusion (geometric
    Union, area measure; exact because clips are pairwise disjoint)."""
    sa = subject_areas(spark).agg(F.sum("_sa").alias("_s"))
    ca = clip_areas(spark).agg(F.sum("_ca").alias("_c"))
    ia = _pair_raw_areas(spark).agg(F.coalesce(F.sum("_raw"), F.lit(0.0)).alias("_i"))
    return (
        sa.crossJoin(ca).crossJoin(ia)
        .select(F.expr("FLOOR((_s + _c - _i) * 1e6 + 0.5e0) / 1e6").alias("area"))
    )


# ---------------------------------------------------------------------------
# line x convex-polygon predicates (Cyrus-Beck parametric clipping)
# ---------------------------------------------------------------------------
# Shared SQL fragments (spliced verbatim into the DuckDB oracle by
# queries_vector.py): per clip edge a->b (CCW, inside = left), the signed
# side values of the segment endpoints are linear in the segment parameter t,
# so the inside interval is [max entering t, min leaving t] — the classic
# Cyrus-Beck formulation (reference predicate modes:
# VectorTools/src/plugins/IsolateVectorFeaturesByLocation.java:240-261
# "crosses" / "are completely within" / "does not intersect" over JTS).
# Only +,-,*,/ and comparisons: IEEE-identical across engines.
LINE_S0 = "((bx - ax) * (y1 - ay) - (by - ay) * (x1 - ax))"
LINE_S1 = "((bx - ax) * (y2 - ay) - (by - ay) * (x2 - ax))"
LINE_TIN = ("CASE WHEN _tin IS NULL THEN 0e0 WHEN _tin < 0e0 THEN 0e0 "
            "ELSE _tin END")
LINE_TOUT = ("CASE WHEN _tout IS NULL THEN 1e0 WHEN _tout > 1e0 THEN 1e0 "
             "ELSE _tout END")
LINE_PRED = ("CASE WHEN _bad = 1 OR tin >= tout THEN 'disjoint' "
             "WHEN tin = 0e0 AND tout = 1e0 THEN 'within' "
             "ELSE 'crosses' END")
LINE_LEN = ("CASE WHEN _bad = 1 OR tin >= tout THEN 0e0 ELSE "
            "FLOOR(SQRT((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) "
            "* (tout - tin) * 1e6 + 0.5e0) / 1e6 END")


def clip_edges_df(spark: SparkSession) -> DataFrame:
    """Directed CCW hexagon edges (clip_id, k, ax, ay, bx, by) — the
    dimension-sized broadcast side of every line-predicate join."""
    layer = make_clip_layer()
    rows = []
    for i in range(layer.n):
        ring = layer.rings[i][0]
        nxt = np.roll(ring, -1, axis=0)
        for k in range(len(ring)):
            rows.append((int(layer.poly_id[i]), k,
                         float(ring[k, 0]), float(ring[k, 1]),
                         float(nxt[k, 0]), float(nxt[k, 1])))
    return spark.createDataFrame(
        rows, "clip_id long, k int, ax double, ay double, bx double, by double"
    )


def line_clip_predicates(spark: SparkSession, lines: DataFrame) -> DataFrame:
    """Classify each bbox-candidate (line, convex clip) pair as
    crosses / within / disjoint and compute the exact in-polygon clipped
    length, via a Cyrus-Beck t-interval computed with conditional
    aggregates over the 6 broadcast edges.

    lines: (line_id, x1, y1, x2, y2).  Physical shape: the line table is
    the fact side and never shuffles on data — one broadcast-hash join to
    the ~1 KB edge table, a partial-aggregatable groupBy on
    (line_id, clip_id), zero Python.
    """
    ce = clip_edges_df(spark)
    cbb = ce.groupBy("clip_id").agg(
        F.min("ax").alias("cxmin"), F.min("ay").alias("cymin"),
        F.max("ax").alias("cxmax"), F.max("ay").alias("cymax"),
    )
    cand = lines.join(
        F.broadcast(cbb),
        (F.least("x1", "x2") <= F.col("cxmax"))
        & (F.greatest("x1", "x2") >= F.col("cxmin"))
        & (F.least("y1", "y2") <= F.col("cymax"))
        & (F.greatest("y1", "y2") >= F.col("cymin")),
    ).select("line_id", "clip_id", "x1", "y1", "x2", "y2")
    e = cand.join(F.broadcast(ce), "clip_id").select(
        "line_id", "clip_id", "x1", "y1", "x2", "y2",
        F.expr(LINE_S0).alias("s0"),
        F.expr(f"({LINE_S1} - {LINE_S0})").alias("den"),
    )
    agg = e.groupBy("line_id", "clip_id", "x1", "y1", "x2", "y2").agg(
        F.expr("MAX(CASE WHEN den > 0e0 THEN (0e0 - s0) / den END)").alias("_tin"),
        F.expr("MIN(CASE WHEN den < 0e0 THEN (0e0 - s0) / den END)").alias("_tout"),
        F.expr("MAX(CASE WHEN den = 0e0 AND s0 < 0e0 THEN 1 ELSE 0 END)").alias("_bad"),
    )
    return (
        agg.select(
            "line_id", "clip_id", "x1", "y1", "x2", "y2", "_bad",
            F.expr(LINE_TIN).alias("tin"),
            F.expr(LINE_TOUT).alias("tout"),
        )
        .select(
            "line_id", "clip_id",
            F.expr(LINE_PRED).alias("predicate"),
            F.expr(LINE_LEN).alias("inside_len"),
        )
        .orderBy("line_id", "clip_id")
    )


# ---------------------------------------------------------------------------
# full location-predicate set over parcel pairs (touches / covers / distance)
# ---------------------------------------------------------------------------
# Completes the reference's 11 IsolateVectorFeaturesByLocation modes
# (VectorTools/src/plugins/IsolateVectorFeaturesByLocation.java:240-261):
# spatial_predicates already classifies disjoint/overlaps/contains/within
# from Sutherland-Hodgman pair areas, and line_clip_predicates handles
# crosses/within for lines — what neither can see is BOUNDARY-ONLY contact
# ("touches", and the covers/coveredBy flush-boundary cases) plus the
# "are within a distance of" mode.  This operator adds those via general
# segment-orientation contact tests (exact integer cross products on the
# parcel fixture), aggregated per candidate pair.
#
# Shared SQL fragments: spliced verbatim into the DuckDB oracle.  Edge pair
# columns are (ax1, ay1, ax2, ay2) for parcel A's edge and (bx1 .. by2) for
# parcel B's; everything is integer arithmetic -> exact on both engines.
PAIR_D1 = "((bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1))"
PAIR_D2 = "((bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1))"
PAIR_D3 = "((ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1))"
PAIR_D4 = "((ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1))"
# segment-segment contact: proper crossing, or an endpoint collinear with
# and inside the other segment's bbox (covers endpoint/vertex touches)
PAIR_CONTACT = (
    "(((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) "
    " AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))) "
    "OR (d1 = 0 AND ax1 BETWEEN LEAST(bx1, bx2) AND GREATEST(bx1, bx2) "
    "    AND ay1 BETWEEN LEAST(by1, by2) AND GREATEST(by1, by2)) "
    "OR (d2 = 0 AND ax2 BETWEEN LEAST(bx1, bx2) AND GREATEST(bx1, bx2) "
    "    AND ay2 BETWEEN LEAST(by1, by2) AND GREATEST(by1, by2)) "
    "OR (d3 = 0 AND bx1 BETWEEN LEAST(ax1, ax2) AND GREATEST(ax1, ax2) "
    "    AND by1 BETWEEN LEAST(ay1, ay2) AND GREATEST(ay1, ay2)) "
    "OR (d4 = 0 AND bx2 BETWEEN LEAST(ax1, ax2) AND GREATEST(ax1, ax2) "
    "    AND by2 BETWEEN LEAST(ay1, ay2) AND GREATEST(ay1, ay2))"
)
# collinear segments sharing a POSITIVE-length stretch (1-D boundary overlap
# = JTS touches along an edge when interiors are disjoint); d1 = d2 = 0
# forces the carrier lines to coincide, so a positive overlap in either
# axis projection is a positive shared length
PAIR_COLLINEAR = (
    "d1 = 0 AND d2 = 0 AND ("
    "LEAST(GREATEST(ax1, ax2), GREATEST(bx1, bx2)) > "
    "GREATEST(LEAST(ax1, ax2), LEAST(bx1, bx2)) "
    "OR LEAST(GREATEST(ay1, ay2), GREATEST(by1, by2)) > "
    "GREATEST(LEAST(ay1, ay2), LEAST(by1, by2)))"
)
# per-pair interior overlap (axis-aligned parcels ARE their bboxes; the
# general convex case routes through the SH pair-area path instead)
PAIR_AREAS = (
    "GREATEST(0, LEAST(axmax, bxmax) - GREATEST(axmin, bxmin)) * "
    "GREATEST(0, LEAST(aymax, bymax) - GREATEST(aymin, bymin))"
)
PAIR_GAP2 = (
    "GREATEST(0, GREATEST(axmin - bxmax, bxmin - axmax)) * "
    "GREATEST(0, GREATEST(axmin - bxmax, bxmin - axmax)) + "
    "GREATEST(0, GREATEST(aymin - bymax, bymin - aymax)) * "
    "GREATEST(0, GREATEST(aymin - bymax, bymin - aymax))"
)
PAIR_PRED = (
    "CASE WHEN axmin = bxmin AND aymin = bymin AND axmax = bxmax "
    "AND aymax = bymax THEN 'equals' "
    "WHEN areai > 0 AND areai = (bxmax - bxmin) * (bymax - bymin) "
    "THEN 'contains' "
    "WHEN areai > 0 AND areai = (axmax - axmin) * (aymax - aymin) "
    "THEN 'within' "
    "WHEN areai > 0 THEN 'overlaps' "
    "WHEN anyo = 1 THEN 'touches_edge' "
    "WHEN anyc = 1 THEN 'touches_point' "
    "ELSE 'disjoint' END"
)

_LAT = 16   # lattice cell size (>= max expanded parcel extent)
_TAU = 4    # "within a distance of" threshold


def _parcel_edges(pc: DataFrame, prefix: str) -> DataFrame:
    """Parcel boundary as 4 directed segments (pure Catalyst explode)."""
    p = prefix
    seg = "explode(array(" + ", ".join(
        f"struct({a} AS {p}x1, {b} AS {p}y1, {c} AS {p}x2, {d} AS {p}y2)"
        for a, b, c, d in [
            ("xmin", "ymin", "xmax", "ymin"),
            ("xmax", "ymin", "xmax", "ymax"),
            ("xmax", "ymax", "xmin", "ymax"),
            ("xmin", "ymax", "xmin", "ymin"),
        ]
    ) + "))"
    return pc.select(F.col("pid").alias(f"p{p}"), F.expr(seg).alias("_s")) \
             .select(f"p{p}", "_s.*")


def location_predicates(spark: SparkSession) -> DataFrame:
    """Classify every near-candidate parcel pair with the full predicate set
    (equals / contains / within / overlaps / touches_edge / touches_point /
    disjoint) plus the intersects and within-distance(tau) modes.

    Physical shape for two BIG layers: candidate pairing is a lattice-cell
    equi-join (each parcel's tau-expanded bbox explodes to the <=4 covering
    cells of a grid sized past the max feature extent — the same cover-cell
    discipline as the PIP index), never a cross join; contact testing joins
    each pair to its 4+4 boundary segments and aggregates two MAX flags
    (map-side combinable); everything stays in whole-stage codegen."""
    from ..sources.parcels import parcels_df

    pc = parcels_df(spark)
    cell = pc.select(
        "pid", "ymin", "ymax",
        F.expr(f"explode(sequence(CAST(FLOOR((xmin - {_TAU}) / {_LAT}) AS BIGINT), "
               f"CAST(FLOOR((xmax + {_TAU}) / {_LAT}) AS BIGINT)))").alias("cx"),
    ).select(
        "pid", "cx",
        F.expr(f"explode(sequence(CAST(FLOOR((ymin - {_TAU}) / {_LAT}) AS BIGINT), "
               f"CAST(FLOOR((ymax + {_TAU}) / {_LAT}) AS BIGINT)))").alias("cy"),
    )
    a = cell.alias("a").join(cell.alias("b"), ["cx", "cy"]) \
        .where(F.col("a.pid") < F.col("b.pid")) \
        .select(F.col("a.pid").alias("pa"), F.col("b.pid").alias("pb")) \
        .distinct()
    pa_box = pc.select(F.col("pid").alias("pa"),
                       F.col("xmin").alias("axmin"), F.col("ymin").alias("aymin"),
                       F.col("xmax").alias("axmax"), F.col("ymax").alias("aymax"))
    pb_box = pc.select(F.col("pid").alias("pb"),
                       F.col("xmin").alias("bxmin"), F.col("ymin").alias("bymin"),
                       F.col("xmax").alias("bxmax"), F.col("ymax").alias("bymax"))
    cand = (
        a.join(pa_box, "pa").join(pb_box, "pb")
        .where(F.expr(
            f"axmin - {_TAU} <= bxmax AND axmax + {_TAU} >= bxmin "
            f"AND aymin - {_TAU} <= bymax AND aymax + {_TAU} >= bymin"
        ))
    )
    ea = _parcel_edges(pc, "a")
    eb = _parcel_edges(pc, "b")
    flags = (
        cand.select("pa", "pb")
        .join(ea, "pa").join(eb, "pb")
        .select(
            "pa", "pb",
            F.expr(PAIR_D1).alias("d1"), F.expr(PAIR_D2).alias("d2"),
            F.expr(PAIR_D3).alias("d3"), F.expr(PAIR_D4).alias("d4"),
            "ax1", "ay1", "ax2", "ay2", "bx1", "by1", "bx2", "by2",
        )
        .groupBy("pa", "pb")
        .agg(
            F.expr(f"MAX(CASE WHEN {PAIR_CONTACT} THEN 1 ELSE 0 END)").alias("anyc"),
            F.expr(f"MAX(CASE WHEN {PAIR_COLLINEAR} THEN 1 ELSE 0 END)").alias("anyo"),
        )
    )
    return (
        cand.join(flags, ["pa", "pb"])
        .select(
            F.col("pa").alias("pid_a"), F.col("pb").alias("pid_b"),
            F.expr(PAIR_AREAS).cast("long").alias("areai"),
            F.expr(PAIR_GAP2).cast("long").alias("gap2"),
            "axmin", "aymin", "axmax", "aymax",
            "bxmin", "bymin", "bxmax", "bymax", "anyc", "anyo",
        )
        .select(
            "pid_a", "pid_b",
            F.expr(PAIR_PRED).alias("predicate"),
            F.expr("CASE WHEN areai > 0 OR anyc = 1 THEN 1 ELSE 0 END")
            .cast("int").alias("intersects"),
            F.expr(f"CASE WHEN gap2 <= {_TAU * _TAU} THEN 1 ELSE 0 END")
            .cast("int").alias("within_dist"),
        )
        .orderBy("pid_a", "pid_b")
    )
