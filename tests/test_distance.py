"""Block-pyramid nearest-target: exactness vs numpy brute force and
block-size invariance."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.operators import raster as R
from whitebox_geospatial_analysis_tools_spark.operators.distance import nearest_target


def _layers(spark, rows=60, cols=90, thresh=110.0):
    cells = R.explode_cells(R.synth_raster(spark, rows, cols))
    tgt = cells.where(F.col("value") > thresh).select(
        F.col("row").alias("trow"), F.col("col").alias("tcol")
    )
    live = cells.where(F.col("value") != R.NODATA)
    return live, tgt


def test_nearest_target_exact_vs_brute(spark):
    live, tgt = _layers(spark)
    got = nearest_target(live, tgt).toPandas().sort_values(["row", "col"])
    t = tgt.toPandas()
    trc = np.stack([t["trow"].to_numpy(), t["tcol"].to_numpy()], axis=1)
    assert len(trc) > 0
    lp = live.select("row", "col").toPandas()
    assert len(got) == len(lp)
    # brute-force oracle with the same (d2, trow, tcol) tie-break
    rr = got["row"].to_numpy()[:, None]
    cc = got["col"].to_numpy()[:, None]
    d2 = (rr - trc[None, :, 0]) ** 2 + (cc - trc[None, :, 1]) ** 2
    # lexicographic min over (d2, trow, tcol)
    key = d2 * 10**12 + trc[None, :, 0] * 10**6 + trc[None, :, 1]
    best = key.argmin(axis=1)
    assert np.array_equal(got["d2"].to_numpy(), d2[np.arange(len(rr)), best])
    assert np.array_equal(got["trow"].to_numpy(), trc[best, 0])
    assert np.array_equal(got["tcol"].to_numpy(), trc[best, 1])


def test_nearest_target_block_invariance(spark):
    live, tgt = _layers(spark)
    a = nearest_target(live, tgt, block=8).toPandas().sort_values(
        ["row", "col"]).reset_index(drop=True)
    b = nearest_target(live, tgt, block=32).toPandas().sort_values(
        ["row", "col"]).reset_index(drop=True)
    assert a.equals(b)
