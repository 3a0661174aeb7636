"""Clump: connected-component labeling of same-class raster regions.

Reference: WhiteboxAPI/src/whitebox/algorithms/Clump.java:131-206 (recursive
flood fill + relabel merge) wrapped by GISTools/src/plugins/Clump.java —
inherently sequential there.  Distributed formulation: iterative min-label
propagation over the cell adjacency (rook/4-connectivity), the standard
Spark pattern for iterative grid-graph ops (SURVEY.md §2.12).  The
adjacency edge list is built ONCE as an equi-join on exploded neighbor
coordinates (no theta-join); each round is then one equi-join + groupBy-min
plus a pointer-jumping hop (label := label(label)) so rounds grow
O(log diameter) rather than O(diameter).

Labels are the minimum flat cell id (row * cols + col) of the component —
deterministic, partitioning-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFS4 = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]
_OFFS8 = _OFFS4 + [(-1, -1), (-1, 1), (1, -1), (1, 1)]


def clump(cells: DataFrame, cols: int, *, connectivity: int = 4,
          max_rounds: int = 40) -> DataFrame:
    """cells: (row, col, cls) — non-nodata cells with a class value.

    Returns (row, col, cls, label) with label = min flat id in the
    4- or 8-connected same-class component (GISTools/Clump.java supports
    both connectivities).
    """
    base = cells.select(
        "row", "col", "cls", (F.col("row") * cols + F.col("col")).alias("id")
    ).persist()
    offs_list = _OFFS8 if connectivity == 8 else _OFFS4
    offs = F.array(*[
        F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc")) for dr, dc in offs_list
    ])
    probe = (
        base.withColumn("_o", F.explode(offs))
        .select(
            "id", "cls",
            (F.col("row") + F.col("_o.dr")).alias("nr"),
            (F.col("col") + F.col("_o.dc")).alias("nc"),
        )
    )
    tgt = base.select(
        F.col("row").alias("nr"), F.col("col").alias("nc"),
        F.col("cls").alias("ncls"), F.col("id").alias("nid"),
    )
    edges = (
        probe.join(tgt, ["nr", "nc"], "inner")
        .where(F.col("cls") == F.col("ncls"))
        .select("id", "nid")
        .persist()
    )
    lbl = base.select("id", F.col("id").alias("label")).persist()
    for _ in range(max_rounds):
        nl = edges.join(
            lbl.select(F.col("id").alias("nid"), F.col("label").alias("nlabel")), "nid"
        ).groupBy("id").agg(F.min("nlabel").alias("label"))
        ptr = nl.select(F.col("id").alias("pid"), F.col("label").alias("plabel"))
        jumped = (
            nl.join(ptr, nl["label"] == ptr["pid"], "left")
            .select("id", F.coalesce(F.least("label", "plabel"), F.col("label")).alias("label"))
            .persist()
        )
        changed = (
            jumped.join(lbl.withColumnRenamed("label", "old"), "id")
            .where(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        old = lbl
        lbl = jumped
        old.unpersist()
        if changed == 0:
            break
    else:
        raise RuntimeError("clump did not converge; raise max_rounds")
    out = base.join(lbl, "id").select("row", "col", "cls", "label")
    edges.unpersist()
    return out


def clump_sizes(cells: DataFrame, cols: int) -> DataFrame:
    """Per-component size table (Area.java per-patch analogue, cell counts)."""
    return (
        clump(cells, cols)
        .groupBy("cls", "label")
        .agg(F.count(F.lit(1)).alias("n_cells"))
    )
