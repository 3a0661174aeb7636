"""Property-based tests (SURVEY.md §5.4): classification/ray-cast
consistency on random points, and partition-count invariance of the
flagship join."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.functions.geometry import (
    PipIndex, classified_cells,
)

SIZE = 2.0 / 3.0
COLS = 540
_IDX = PipIndex()
_CELLS = None


def _cells():
    global _CELLS
    if _CELLS is None:
        interior, boundary = {}, {}
        for cid, pid, inter in classified_cells(SIZE, COLS):
            (interior if inter else boundary).setdefault(cid, set()).add(pid)
        _CELLS = (interior, boundary)
    return _CELLS


@settings(max_examples=300, deadline=None)
@given(
    lon=st.floats(min_value=0.0, max_value=359.999, allow_nan=False),
    lat=st.floats(min_value=0.0, max_value=179.999, allow_nan=False),
)
def test_classified_cells_consistent_with_raycast(lon, lat):
    """Interior-cell membership must imply exact containment; containment
    must imply the point's cell is covered (interior or boundary)."""
    interior, boundary = _cells()
    cid = int(np.floor(lat / SIZE)) * COLS + int(np.floor(lon / SIZE))
    contained = set(map(int, _IDX.contains_all(np.array([lon]), np.array([lat]))[0]))
    for pid in interior.get(cid, ()):
        assert pid in contained, (lon, lat, pid, "interior cell but not contained")
    # every containing polygon must cover this cell one way or the other
    covered = interior.get(cid, set()) | boundary.get(cid, set())
    assert contained <= covered, (lon, lat, contained - covered)
    # interior and boundary classification never overlaps for one polygon
    assert not (interior.get(cid, set()) & boundary.get(cid, set()))


def test_pip_counts_partition_invariant(spark):
    """The flagship result is identical whatever the source partitioning
    (north rule: join output invariant to partition count / salting)."""
    from whitebox_geospatial_analysis_tools_spark.operators.spatial_join import pip_counts
    from whitebox_geospatial_analysis_tools_spark.sources.pages import points_from_documents

    pts = points_from_documents(spark, "/root/testdata/sf0.001")
    a = {(r.poly_id, r.n_pages) for r in pip_counts(pts.repartition(3), spark).collect()}
    b = {(r.poly_id, r.n_pages) for r in pip_counts(pts.repartition(17), spark).collect()}
    c = {(r.poly_id, r.n_pages) for r in pip_counts(pts.coalesce(1), spark).collect()}
    assert a == b == c and a


def test_salted_counts_equal_plain(spark):
    from whitebox_geospatial_analysis_tools_spark.operators.skew import salted_counts
    from whitebox_geospatial_analysis_tools_spark.sources.pages import points_from_documents

    pts = points_from_documents(spark, "/root/testdata/sf0.001")
    plain = {(r.tile_id, r.n) for r in
             pts.groupBy("tile_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {(r.tile_id, r.n) for r in salted_counts(pts, nsalt=7).collect()}
    assert plain == salted
