"""Spatial joins: point-in-polygon (the north-star join), spatial predicates.

Semantics from the reference:
  - containment = even-odd ray crossing
    (ConversionTools/src/plugins/VectorPolygonsToRaster.java:400-470)
  - spatial semi/anti filtering
    (VectorTools/src/plugins/IsolateVectorFeaturesByLocation.java:240-737)

Physical design for 10^12 rows (NOT the reference's nested loop):
  1. points carry a grid cell id (narrow map, codegen, no shuffle);
  2. the polygon layer is tiny -> its covering-cell index is a BROADCAST map
     (cell_id -> candidate poly_id);  the join is map-side, zero shuffle of
     the big side;
  3. a bbox prefilter (plain Column predicate, codegen) drops most candidate
     pairs before Python is ever involved;
  4. exact even-odd refinement runs as ONE Arrow-batched pandas_udf over the
     surviving pairs (the only Python in the pipeline).

The aggregate (counts per polygon) is a partial-aggregated groupBy over ~100
keys — negligible shuffle.  Skewed hot cells don't skew this join (broadcast
side is replicated); they matter for the later tile aggregations, which AQE
handles (salting helpers in operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import exprs
from ..functions.geometry import covering_cells, make_pip_refine_udf
from ..sources.polygons import make_polygon_layer, polygons_df


def polygon_cell_index(spark: SparkSession, size: float = exprs.TILE_SIZE,
                       cols: int = exprs.TILE_COLS) -> DataFrame:
    """Small (cell_id, poly_id, bbox) candidate map — the broadcast side."""
    layer = make_polygon_layer()
    pairs = covering_cells(size, cols, layer)
    bbox = {int(p): tuple(map(float, b)) for p, b in zip(layer.poly_id, layer.bbox)}
    rows = [(c, p, *bbox[p]) for c, p in pairs]
    return spark.createDataFrame(
        rows, "cell_id long, poly_id long, xmin double, ymin double, xmax double, ymax double"
    )


def pip_join(points: DataFrame, spark: SparkSession, *,
             keep: tuple[str, ...] = (), how: str = "inner") -> DataFrame:
    """Exact point-in-polygon join: points(lon,lat,tile_id) x polygon layer.

    Returns one row per (point, containing polygon).  ``how='left'`` keeps
    unmatched points with null poly_id (spatial left join); 'inner' default.
    """
    idx = polygon_cell_index(spark)
    cand = points.join(
        F.broadcast(idx), points["tile_id"] == idx["cell_id"], "inner"
    ).where(
        (F.col("lon") >= F.col("xmin")) & (F.col("lon") <= F.col("xmax"))
        & (F.col("lat") >= F.col("ymin")) & (F.col("lat") <= F.col("ymax"))
    )
    pip = make_pip_refine_udf()
    hits = cand.where(pip(F.col("lon"), F.col("lat"), F.col("poly_id")))
    out_cols = list(keep) + ["lon", "lat", "tile_id", "poly_id"]
    hits = hits.select(*[F.col(c) for c in dict.fromkeys(out_cols)])
    if how == "inner":
        return hits
    if how == "left":
        return points.join(hits.select(*keep, "poly_id"), list(keep), "left")
    raise ValueError(f"unsupported how={how!r}")


def pip_counts(points: DataFrame, spark: SparkSession, key: str = "doc_id") -> DataFrame:
    """Per-polygon page counts — the flagship north-star aggregate."""
    return (
        pip_join(points, spark, keep=(key,))
        .groupBy("poly_id")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .orderBy("poly_id")
    )


def pip_semi(points: DataFrame, spark: SparkSession, key: str, negate: bool = False) -> DataFrame:
    """IsolateVectorFeaturesByLocation intersects / not-intersects:
    keep points that fall in (or out of) ANY polygon — spatial semi/anti join."""
    hits = pip_join(points, spark, keep=(key,)).select(key).distinct()
    return points.join(hits, key, "left_anti" if negate else "left_semi")
