"""kNN join vs brute force; zonal stats vs pandas groupby (SURVEY.md §5)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.operators.knn import knn_join
from whitebox_geospatial_analysis_tools_spark.operators.zonal import points_to_raster, zonal_stats
from whitebox_geospatial_analysis_tools_spark.sources.pages import points_from_documents

SF = "/root/testdata/sf0.001"
K = 4


def test_knn_matches_bruteforce(spark):
    pts = points_from_documents(spark, SF)
    q = pts.where(F.col("doc_id") % 41 == 0).select(
        F.col("doc_id").alias("q_id"), "lon", "lat", "tile_x", "tile_y"
    )
    p = pts.select(F.col("doc_id").alias("p_id"), "lon", "lat", "tile_id")
    got = (
        knn_join(q, p, k=K)
        .select("q_id", "p_id", "rnk")
        .toPandas()
        .sort_values(["q_id", "rnk"])
        .reset_index(drop=True)
    )

    pdf = pts.select("doc_id", "lon", "lat").toPandas()
    x, y, ids = pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), pdf["doc_id"].to_numpy()
    rows = []
    for qi in ids[ids % 41 == 0]:
        qx, qy = x[ids == qi][0], y[ids == qi][0]
        d2 = (x - qx) ** 2 + (y - qy) ** 2
        mask = ids != qi
        order = np.lexsort((ids[mask], d2[mask]))
        for rnk, j in enumerate(order[:K], start=1):
            rows.append((int(qi), int(ids[mask][j]), rnk))
    want = pd.DataFrame(rows, columns=["q_id", "p_id", "rnk"]).sort_values(
        ["q_id", "rnk"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_zonal_stats_vs_pandas(spark):
    pts = points_from_documents(spark, SF)
    got = zonal_stats(pts).toPandas().set_index("tile_id")
    pdf = pts.select("tile_id", "val").toPandas()
    g = pdf.groupby("tile_id")["val"]
    assert np.array_equal(got["n"].to_numpy(), g.count().to_numpy())
    np.testing.assert_allclose(got["mean"], g.mean(), rtol=1e-9)
    np.testing.assert_allclose(got["vmin"], g.min(), rtol=0)
    np.testing.assert_allclose(got["vmax"], g.max(), rtol=0)
    std = g.std(ddof=1)
    both = ~(got["vstd"].isna().to_numpy() | std.isna().to_numpy())
    np.testing.assert_allclose(got["vstd"].to_numpy()[both], std.to_numpy()[both], rtol=1e-9)


def test_points_to_raster_policies(spark):
    pts = points_from_documents(spark, SF)
    got = points_to_raster(pts).toPandas().set_index("tile_id")
    pdf = pts.select("doc_id", "tile_id", "val").toPandas().sort_values("doc_id")
    g = pdf.groupby("tile_id")["val"]
    np.testing.assert_allclose(got["vfirst"], g.first(), rtol=0)  # min doc_id order
    np.testing.assert_allclose(got["vlast"], g.last(), rtol=0)
    np.testing.assert_allclose(got["vrange"], g.max() - g.min(), rtol=0)
    np.testing.assert_allclose(
        got["vmean"], g.sum() / g.count(), rtol=1e-9
    )
