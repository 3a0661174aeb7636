"""UTM transform accuracy: forward+inverse round-trip vs the ORIGINAL
coordinates (the oracle comparison only proves engine==oracle; this proves
the series itself is accurate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.functions import crs
from whitebox_geospatial_analysis_tools_spark.sources.pages import points_from_documents

SF = "/root/testdata/sf0.001"


def test_utm_roundtrip_accuracy(spark):
    pts = points_from_documents(spark, SF).where(F.expr("ABS(lat - 90e0) <= 80e0"))
    base = pts.select(
        "doc_id", "lon", "lat",
        F.expr("RADIANS(lon - 180e0)").alias("lam"),
        F.expr("RADIANS(lat - 90e0)").alias("phi"),
        F.expr(
            "RADIANS(CAST((CAST(FLOOR(lon / 6e0) AS BIGINT) + 1) * 6 - 183 AS DOUBLE))"
        ).alias("lam0"),
    )
    out = crs.apply_stages(base, crs.FWD_STAGES + crs.INV_STAGES)
    err = out.select(
        F.max(F.abs(F.degrees("lam2") + 180.0 - F.col("lon"))).alias("elon"),
        F.max(F.abs(F.degrees("phi2") + 90.0 - F.col("lat"))).alias("elat"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert err["n"] > 10
    assert err["elon"] < 1e-6 and err["elat"] < 1e-6, dict(err.asDict())
