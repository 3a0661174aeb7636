"""kNN join via k-ring expansion (the distributed kd-tree replacement).

Reference: WhiteboxAPI/src/whitebox/structures/KdTree.java:438-455
(`nearestNeighbor(location, k)`) used by InterpolationIDW.java:547-561 and
Scripts/NearestNeighbourAnalysis.groovy:233.  A kd-tree is a single-machine
pointer structure; distributed, proximity becomes an equi-join key: queries
fan out to their k-ring of grid cells, join points on cell id, then a window
ranks by distance.

Correctness bound: with Chebyshev ring radius R on cells of size s, every
point within distance (R) * s of the query is guaranteed captured.  A result
rank k whose distance exceeds R*s could in principle lose to an uncaptured
point, so rows with kth_dist > R*s are ESCALATED: those queries re-run
against a wider ring (doubling), iterated until sound.  At web scale the
first pass answers ~all queries (one broadcastable residual join per round).

Deterministic tie-break: (dist2, point_id) total order — the reference's
kd-tree order is insertion-dependent (KdTree.java:455+), ours is pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import exprs
from ..functions.cells import explode_k_ring


def knn_join(queries: DataFrame, points: DataFrame, k: int = 5, *,
             q_key: str = "q_id", p_key: str = "p_id",
             radius: int = 1, max_rounds: int = 8,
             cell_size: float = exprs.TILE_SIZE) -> DataFrame:
    """k nearest points for each query row.

    queries: (q_key, lon, lat, tile_x, tile_y); points: (p_key, lon, lat, tile_id).
    Returns (q_key, p_key, dist2, rnk) with rnk in 1..k.
    """
    pts = points.select(
        F.col(p_key), F.col("tile_id").alias("p_tile"),
        F.col("lon").alias("p_lon"), F.col("lat").alias("p_lat"),
    )
    remaining = queries.select(q_key, "lon", "lat", "tile_x", "tile_y")
    results = None
    r = radius
    for _ in range(max_rounds):
        cand = explode_k_ring(remaining, r).join(
            pts, F.col("nbr_tile_id") == F.col("p_tile"), "inner"
        )
        cand = cand.where(F.col(q_key) != F.col(p_key)).withColumn(
            "dist2",
            (F.col("lon") - F.col("p_lon")) * (F.col("lon") - F.col("p_lon"))
            + (F.col("lat") - F.col("p_lat")) * (F.col("lat") - F.col("p_lat")),
        )
        w = Window.partitionBy(q_key).orderBy("dist2", p_key)
        topk = cand.withColumn(
            "rnk", F.row_number().over(w).cast("long")  # match ANSI ROW_NUMBER type
        ).where(F.col("rnk") <= k)
        # soundness: kth distance must be covered by the ring
        bound = float(r * cell_size) ** 2
        agg = topk.groupBy(q_key).agg(
            F.max("dist2").alias("kth_d2"), F.count(F.lit(1)).alias("n_found")
        )
        # strict < : a point at distance exactly R*s could sit just outside the ring
        ok_keys = agg.where((F.col("n_found") >= k) & (F.col("kth_d2") < bound)).select(q_key)
        solved = topk.join(F.broadcast(ok_keys), q_key, "left_semi").select(
            q_key, p_key, "dist2", "rnk"
        )
        results = solved if results is None else results.unionByName(solved)
        remaining = remaining.join(ok_keys, q_key, "left_anti")
        if not remaining.take(1):
            break
        r *= 2
    else:
        raise RuntimeError("knn_join did not converge; raise max_rounds")
    return results


def nn_distances(points: DataFrame, key: str = "doc_id", modulus: int = 173) -> DataFrame:
    """NearestNeighbourAnalysis (Scripts/NearestNeighbourAnalysis.groovy:233):
    1-NN distance per query point (the z-test vs CSR expectation is a trivial
    driver-side step over the mean).  Evaluated over a deterministic modulus
    sample of query points (RandomSample semantics,
    StatsTools/src/plugins/RandomSample.java) against the FULL layer."""
    q = points.where(F.col(key) % modulus == 0).select(
        F.col(key).alias("q_id"), "lon", "lat", "tile_x", "tile_y"
    )
    p = points.select(F.col(key).alias("p_id"), "lon", "lat", "tile_id")
    nn = knn_join(q, p, k=1)
    return nn.select("q_id", F.sqrt("dist2").alias("nn_dist"))
