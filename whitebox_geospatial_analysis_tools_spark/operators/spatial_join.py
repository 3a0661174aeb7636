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
from ..functions.geometry import classified_cells, covering_cells, make_pip_refine_udf
from ..sources.polygons import make_polygon_layer, polygons_df

# refinement-index resolution: res-9 cells (2/3 deg).  Small enough that most
# matched points land in interior cells (pure-JVM containment), big enough
# that the classified index stays a few-MB broadcast at 100 polygons.
_REFINE_RES = 9


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


def classified_cell_index(spark: SparkSession, res: int = _REFINE_RES) -> DataFrame:
    """(cell_id, poly_id, interior, edges) broadcast index at res-`res` cells.

    interior=true rows resolve containment outright; boundary rows carry the
    polygon's full edge list as an array<struct<x1,y1,x2,y2>> so the exact
    even-odd ray-cast runs as a Catalyst ``aggregate()`` lambda — whole-stage
    codegen, no Python, no shuffle.  Interior rows carry an empty array.
    """
    # keyed on applicationId (stable per SparkSession lifetime) — id()-based
    # keys can alias after stop()+new session in one process (bench --scaling)
    app_id = spark.sparkContext.applicationId
    key = (app_id, res)
    hit = _INDEX_CACHE.get(key)
    if hit is not None:
        return hit
    for stale in [k for k in _INDEX_CACHE if k[0] != app_id]:
        _INDEX_CACHE.pop(stale)  # entries of stopped sessions: dead persists
    size = {7: 6.0, 8: 2.0, 9: 2.0 / 3.0}[res]
    cols = int(round(360.0 / size))
    layer = make_polygon_layer()
    edges_of: dict[int, list] = {}
    for p, x1, y1, x2, y2 in zip(layer.edge_poly, layer.x1, layer.y1, layer.x2, layer.y2):
        edges_of.setdefault(int(p), []).append(
            (float(x1), float(y1), float(x2), float(y2))
        )
    rows = [
        (c, p, i, [] if i else edges_of[p])
        for c, p, i in classified_cells(size, cols, layer)
    ]
    df = spark.createDataFrame(
        rows,
        "cell_id long, poly_id long, interior boolean, "
        "edges array<struct<x1: double, y1: double, x2: double, y2: double>>",
    ).persist()
    df.count()  # materialize once: repeated queries re-broadcast from the
    # cached JVM relation instead of re-serializing 43k rows from Python
    _INDEX_CACHE[key] = df
    return df


_INDEX_CACHE: dict = {}


# even-odd crossing count as a Catalyst higher-order function — the exact
# float expression of VectorPolygonsToRaster.java:400-445, identical to the
# numpy kernel (geometry._crossings) and the DuckDB oracle SQL.
_PARITY = (
    "((aggregate(edges, 0, (acc, e) -> acc + (CASE WHEN ((e.y1 > lat) != (e.y2 > lat))"
    " AND (lon < (e.x2 - e.x1) * (lat - e.y1) / (e.y2 - e.y1) + e.x1)"
    " THEN 1 ELSE 0 END)) % 2) = 1)"
)


def pip_join(points: DataFrame, spark: SparkSession, *,
             keep: tuple[str, ...] = (), how: str = "inner") -> DataFrame:
    """Exact point-in-polygon join: points(lon,lat) x polygon layer.

    Physical shape (the 100 TB design): ONE broadcast equi-join on the res-9
    cell id against the classified (interior/boundary) polygon index, then a
    single codegen filter ``interior OR odd(crossings)`` where the crossing
    count is a Catalyst array-aggregate over the broadcast edge list.  The
    big side is touched once, never shuffled, and never crosses into Python
    (the vectorized numpy ray-cast kernel remains in functions/geometry.py
    as the oracle for tests).  Skewed hot cells cost nothing here: the build
    side is replicated, so no key-based repartitioning of points occurs.

    Returns one row per (point, containing polygon).  ``how='left'`` keeps
    unmatched points with null poly_id (spatial left join); 'inner' default.
    """
    idx = classified_cell_index(spark)
    cell9 = F.expr(exprs.cell_expr("lon", "lat", _REFINE_RES))
    pts = points.withColumn("_c9", cell9)
    cand = pts.join(F.broadcast(idx), pts["_c9"] == idx["cell_id"], "inner")
    out_cols = [F.col(c) for c in dict.fromkeys(list(keep) + ["lon", "lat", "tile_id", "poly_id"])]
    hits = cand.where(F.col("interior") | F.expr(_PARITY)).select(*out_cols)
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
