"""Skew handling: salted two-phase aggregation + adaptive cell subdivision.

The geocode has built-in skew (~80% of pages land in 5 dense "urban" hot
boxes — functions/exprs.py), mirroring the north star's hot-cell problem.
Two structural remedies, both plain DataFrame logic (SURVEY.md §4.2 — no
Catalyst extension needed; AQE's skew-join split covers the join side):

1. ``salted_counts``: per-cell aggregation as groupBy(cell, salt) partial
   then groupBy(cell) merge, so one hot cell's rows spread over ``nsalt``
   reducers instead of one straggler.  Results are exactly those of the
   plain groupBy (addition is associative on longs).

2. ``adaptive_cells``: cells whose count exceeds a threshold recursively
   re-key to the next resolution (res 7 -> 8 -> 9), so downstream per-cell
   work is bounded: the output is a mixed-resolution cell id set whose
   leaves each hold <= threshold points (unless already at max res).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import exprs


def salted_counts(points: DataFrame, key: str = "tile_id", nsalt: int = 16) -> DataFrame:
    """Per-key counts via salt-partialed aggregation (straggler-free)."""
    return (
        points.withColumn("_salt", F.pmod(F.xxhash64("lon", "lat"), F.lit(nsalt)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").cast("long").alias("n"))
    )


def adaptive_cells(points: DataFrame, threshold: int) -> DataFrame:
    """Mixed-resolution cell assignment: subdivide hot cells res 7 -> 8 -> 9.

    Returns (res, cell, n) where every res-7/res-8 row has n <= threshold
    and res-9 rows are the leaves of cells still hot at res 8 (res 9 is the
    max index resolution; its rows may exceed threshold).  Deterministic:
    depends only on counts, not partitioning.
    """
    out = None
    df = points
    for res in (7, 8):
        cell = F.expr(exprs.cell_expr("lon", "lat", res))
        counts = df.groupBy(cell.alias("cell")).agg(F.count(F.lit(1)).alias("n"))
        cold = counts.where(F.col("n") <= threshold).select(
            F.lit(res).alias("res"), "cell", "n"
        )
        out = cold if out is None else out.unionByName(cold)
        hot = counts.where(F.col("n") > threshold).select("cell")
        # only points inside hot parents descend to the next resolution
        df = df.join(
            F.broadcast(hot.withColumnRenamed("cell", "_hot")),
            cell == F.col("_hot"), "inner",
        ).drop("_hot")
    leaf = df.groupBy(
        F.expr(exprs.cell_expr("lon", "lat", 9)).alias("cell")
    ).agg(F.count(F.lit(1)).alias("n")).select(F.lit(9).alias("res"), "cell", "n")
    return out.unionByName(leaf)
