"""End-to-end north-star pipeline compositions.

flagship(spark, sf_dir): pages-as-points -> deterministic geocode -> tile +
hierarchical cell assignment -> broadcast polygon cell-index join -> exact
even-odd ray-cast refinement -> per-polygon counts.  This is the single query
the whole architecture is judged on (BASELINE.md benchmark definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cells import with_cells
from ..operators.spatial_join import pip_counts, pip_join
from ..sources.pages import geocoded_pages, points_from_documents


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = points_from_documents(spark, sf_dir)
    return pip_counts(pts, spark)


def flagship_synthetic(spark: SparkSession, n_pages: int) -> DataFrame:
    """Same pipeline over the synthetic url-keyed pages table (bench path):
    geocode(xxhash64(url)) -> cells -> PIP join -> counts + tile assignment."""
    pts = geocoded_pages(spark, n_pages)
    pairs = pip_join(pts.withColumn("doc_id", F.abs(F.xxhash64("url"))), spark,
                     keep=("url",))
    return pairs.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n_pages"))


def tile_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page tile + res 7-9 cell assignment table (the second north-star
    output: 'per-tile cell assignments')."""
    pts = with_cells(points_from_documents(spark, sf_dir))
    return pts.select("doc_id", "tile_id", "cell7", "cell8", "cell9")
