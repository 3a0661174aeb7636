"""Property tests for the round-3 geometry operators (hull / MBB / DP /
location predicates) against independent numpy/scipy-free checks."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_hull_contains_all_vertices(spark):
    """Every shell vertex lies inside-or-on its polygon's hull (support
    test applied back against the reported hull edges)."""
    from whitebox_geospatial_analysis_tools_spark.operators.vector import (
        convex_hull_edges, shell_vertices,
    )

    he = convex_hull_edges(spark).toPandas()
    v = shell_vertices(spark).toPandas()
    for pid, grp in he.groupby("poly_id"):
        pts = v[v.poly_id == pid]
        for _, e in grp.iterrows():
            cross = (e.bx - e.ax) * (pts.y - e.ay) - (e.by - e.ay) * (pts.x - e.ax)
            assert (cross >= -1e-9).all(), f"vertex right of hull edge (poly {pid})"


def test_hull_area_vs_shoelace(spark):
    """Hull area >= polygon shell area (hull contains the shell) and the
    hull edge set closes (sum of edge vectors == 0)."""
    from whitebox_geospatial_analysis_tools_spark.operators.vector import (
        convex_hull_edges, convex_hull_metrics,
    )
    from whitebox_geospatial_analysis_tools_spark.sources.polygons import (
        make_polygon_layer,
    )

    layer = make_polygon_layer()
    hull = convex_hull_metrics(spark).toPandas().set_index("poly_id")
    he = convex_hull_edges(spark).toPandas()
    for i in range(layer.n):
        pid = int(layer.poly_id[i])
        shell = layer.rings[i][0]
        nxt = np.roll(shell, -1, axis=0)
        area = abs(np.sum(shell[:, 0] * nxt[:, 1] - nxt[:, 0] * shell[:, 1]) / 2)
        assert hull.loc[pid, "hull_area"] >= area - 1e-6
        g = he[he.poly_id == pid]
        assert abs((g.bx - g.ax).sum()) < 1e-9 and abs((g.by - g.ay).sum()) < 1e-9


def test_mbb_bounds_hull(spark):
    """The rotated minimum bounding box is at least the hull area and at
    most the axis-aligned bbox area."""
    from whitebox_geospatial_analysis_tools_spark.operators.vector import (
        convex_hull_metrics, minimum_bounding_box, shell_vertices,
    )

    hull = convex_hull_metrics(spark).toPandas().set_index("poly_id")
    mbb = minimum_bounding_box(spark).toPandas().set_index("poly_id")
    v = shell_vertices(spark).toPandas()
    for pid in mbb.index:
        pts = v[v.poly_id == pid]
        aabb = (pts.x.max() - pts.x.min()) * (pts.y.max() - pts.y.min())
        assert hull.loc[pid, "hull_area"] - 1e-6 <= mbb.loc[pid, "mbb_area"] \
            <= aabb + 1e-6


def test_simplify_preserves_anchors_and_tolerance(spark):
    """DP keeps both anchors and every DROPPED vertex is within tol of the
    kept chain (the Douglas-Peucker contract)."""
    from whitebox_geospatial_analysis_tools_spark.operators.vector import (
        shell_vertices, simplify_rings,
    )

    tol = 2.0
    kept = simplify_rings(spark, tol=tol).toPandas()
    v = shell_vertices(spark).toPandas()
    for pid, grp in v.groupby("poly_id"):
        k = kept[kept.poly_id == pid].sort_values("vi")
        n = len(grp)
        assert 0 in set(k.vi) and (n // 2) in set(k.vi)
        kv = list(k.vi) + [n]  # wrap gap back to vertex 0
        pts = grp.set_index("vi")
        for a, b in zip(kv[:-1], kv[1:]):
            ax, ay = pts.loc[a, ["x", "y"]]
            bx, by = pts.loc[b % n, ["x", "y"]]
            for w in range(a + 1, b):
                wx, wy = pts.loc[w, ["x", "y"]]
                num = abs((bx - ax) * (wy - ay) - (by - ay) * (wx - ax))
                den = np.hypot(bx - ax, by - ay)
                assert num / den <= tol + 1e-9, (pid, a, b, w)


def test_location_predicates_symmetry(spark):
    """contains/within orient consistently and touches pairs never report
    positive interior overlap."""
    from whitebox_geospatial_analysis_tools_spark.operators.overlay import (
        location_predicates,
    )
    from whitebox_geospatial_analysis_tools_spark.sources.parcels import (
        make_parcels,
    )

    df = location_predicates(spark).toPandas()
    rect = {p: (a, b, c, d) for p, a, b, c, d in make_parcels()}

    def area_i(pa, pb):
        a, b = rect[pa], rect[pb]
        w = min(a[2], b[2]) - max(a[0], b[0])
        h = min(a[3], b[3]) - max(a[1], b[1])
        return max(0, w) * max(0, h)

    for _, r in df.iterrows():
        ai = area_i(r.pid_a, r.pid_b)
        if r.predicate.startswith("touches") or r.predicate == "disjoint":
            assert ai == 0
        if r.predicate == "contains":
            xa, ya, Xa, Ya = rect[r.pid_a]
            xb, yb, Xb, Yb = rect[r.pid_b]
            assert xa <= xb and ya <= yb and Xa >= Xb and Ya >= Yb
        if r.predicate == "within":
            xa, ya, Xa, Ya = rect[r.pid_a]
            xb, yb, Xb, Yb = rect[r.pid_b]
            assert xb <= xa and yb <= ya and Xb >= Xa and Yb >= Ya


def test_lifting_level_invariance(spark):
    """downslope_index and stream_relief results do not depend on the
    (sufficient) number of lifting levels."""
    from whitebox_geospatial_analysis_tools_spark.operators import raster as R
    from whitebox_geospatial_analysis_tools_spark.operators.hydro import (
        downslope_index, flow_pointer_d8,
    )

    dem = R.synth_raster(spark, 40, 60)
    ptr = flow_pointer_d8(dem)
    z = (
        R.explode_cells(dem)
        .where(F.col("value") != R.NODATA)
        .withColumnRenamed("value", "z")
    )
    cells = ptr.join(z, ["row", "col"])
    a = downslope_index(cells, levels=8).toPandas() \
        .sort_values(["row", "col"]).reset_index(drop=True)
    b = downslope_index(cells, levels=11).toPandas() \
        .sort_values(["row", "col"]).reset_index(drop=True)
    assert a.equals(b)
