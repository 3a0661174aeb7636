"""Ring-tracing correctness: signed areas of a patch's rings (shell CW,
holes CCW under the directed-edge convention) sum exactly to -cell_count —
an exact structural oracle for the vectorize step."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.operators import raster as R
from whitebox_geospatial_analysis_tools_spark.operators.clump import clump
from whitebox_geospatial_analysis_tools_spark.operators.vectorize import trace_rings


def test_trace_rings_area_property(spark):
    cells = (
        R.explode_cells(R.synth_raster(spark, 60, 90))
        .where(F.col("value") != R.NODATA)
        .select("row", "col",
                F.expr("CAST(FLOOR(value / 50e0) AS BIGINT)").alias("cls"))
    )
    lab = clump(cells, 90).persist()
    sizes = {
        int(r["label"]): int(r["n"])
        for r in lab.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rings = trace_rings(lab).toPandas()
    assert set(rings["label"]) == set(sizes)
    per = rings.groupby("label")["signed_area"].sum()
    for label, a in per.items():
        assert -a == sizes[label], (label, a, sizes[label])
    # every ring is a simple closed loop: >= 4 vertices, integer corners
    assert (rings["n_vertices"] >= 4).all()
    # verts string round-trips to n_vertices points
    for _, r in rings.sample(min(50, len(rings)), random_state=0).iterrows():
        pts = r["verts"].split(" ")
        assert len(pts) == r["n_vertices"]
    lab.unpersist()


def test_trace_rings_hole(spark):
    # 5x5 block with a center hole: one shell + one hole ring
    rows = [(r, c, 1) for r in range(5) for c in range(5) if not (r == 2 and c == 2)]
    cells = spark.createDataFrame(rows, "row long, col long, cls long")
    lab = clump(cells, 5)
    rings = trace_rings(lab).toPandas()
    assert len(rings) == 2
    areas = sorted(rings["signed_area"])
    assert areas[0] == -25.0 and areas[1] == 1.0  # shell CW, hole CCW
