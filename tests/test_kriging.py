"""Ordinary-kriging properties: unbiasedness (weights sum to 1, checked via
constant-field reproduction) and exact interpolation at sample sites."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.functions import exprs
from whitebox_geospatial_analysis_tools_spark.operators.zonal import (
    kriging_at_cell_centers,
)
from whitebox_geospatial_analysis_tools_spark.sources.pages import (
    points_from_documents,
)

SF = "/root/testdata/sf0.001"


def test_constant_field_reproduced(spark):
    """If every sample has the same value, any weights summing to 1 must
    reproduce it exactly — the unbiasedness constraint made observable."""
    pts = points_from_documents(spark, SF).withColumn("val", F.lit(7.25))
    out = kriging_at_cell_centers(pts).toPandas()
    assert len(out) > 10
    assert np.allclose(out["krig"].to_numpy(), 7.25, atol=1e-6)


def test_exact_interpolation_at_site(spark):
    """A center coinciding with a sample point must return that sample's
    value (gamma(0) = 0 pins the estimate)."""
    pts = points_from_documents(spark, SF)
    one = pts.limit(1).collect()[0]
    # move one point exactly onto its tile center
    cx = (one["tile_x"] + 0.5) * exprs.TILE_SIZE
    cy = (one["tile_y"] + 0.5) * exprs.TILE_SIZE
    moved = pts.withColumn(
        "lon", F.when(F.col("doc_id") == one["doc_id"], F.lit(float(cx))).otherwise(F.col("lon"))
    ).withColumn(
        "lat", F.when(F.col("doc_id") == one["doc_id"], F.lit(float(cy))).otherwise(F.col("lat"))
    )
    out = kriging_at_cell_centers(moved).toPandas()
    got = out[out.tile_id == one["tile_id"]]["krig"]
    assert len(got) == 1
    assert abs(float(got.iloc[0]) - one["val"]) < 1e-4
