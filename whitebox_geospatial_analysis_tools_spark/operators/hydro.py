"""Hydrology slice: D8 flow pointer, flow accumulation, stream extraction.

Reference semantics (SURVEY.md §2.12):
  FlowPointerD8   HydroTools/src/plugins/FlowPointerD8.java (307) — each
                  cell points to the steepest-descent neighbor of 8, drop
                  divided by distance (diagonals /sqrt(2)); power-of-two
                  direction codes, decoded log2 (FlowAccumD8.java:291-293).
  FlowAccumD8     HydroTools/src/plugins/FlowAccumD8.java (416) — number of
                  cells draining through each cell (incl. itself), computed
                  there by sequential upstream-count scheduling.
  ExtractStreams  StreamNetworkAnalysisTools/src/plugins/ExtractStreams.java
                  (283) — accumulation >= threshold.

Distributed formulation: the pointer raster is one focal stencil; the
accumulation is the size of each cell's ANCESTOR set in the pointer forest,
computed by TRANSITIVE-CLOSURE DOUBLING — log2(longest path) self-joins
instead of the reference's O(path) sequential peeling, the textbook Spark
shape for pointer-graph aggregation.  Direction codes here are 2^j over the
fixed neighbor order (NW,N,NE,W,E,SW,S,SE); j differs from the reference's
rosette layout but the induced forest is identical up to that relabeling
(tie-break: first maximum in the fixed order, mirroring the reference's
scan-order tie behavior).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .raster import NODATA, _halo_contributions

_SQRT2 = 1.4142135623730951
# neighbor order NW N NE W E SW S SE -> (dr, dc, dist)
D8_OFFS = [
    (-1, -1, _SQRT2), (-1, 0, 1.0), (-1, 1, _SQRT2),
    (0, -1, 1.0), (0, 1, 1.0),
    (1, -1, _SQRT2), (1, 0, 1.0), (1, 1, _SQRT2),
]


def flow_pointer_d8(tiles: DataFrame) -> DataFrame:
    """(row, col, code): code = 2^j toward the steepest positive drop-rate
    neighbor, 0 for pits/flats, nodata cells omitted."""
    schema = "row long, col long, code long"

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        trow, tcol = int(key[0]), int(key[1])
        center = pdf[(pdf.tile_row == trow) & (pdf.tile_col == tcol)]
        if center.empty:
            return pd.DataFrame({
                "row": pd.Series([], dtype="int64"),
                "col": pd.Series([], dtype="int64"),
                "code": pd.Series([], dtype="int64"),
            })
        c = center.iloc[0]
        h, w = int(c.h), int(c.w)
        pad = np.full((h + 2, w + 2), np.nan)
        for r in pdf.itertuples():
            vals = np.asarray(r.values, dtype=np.float64).reshape(int(r.h), int(r.w))
            vals = np.where(vals == NODATA, np.nan, vals)
            dr, dc = int(r.tile_row) - trow, int(r.tile_col) - tcol
            if dr == 0 and dc == 0:
                pad[1:h + 1, 1:w + 1] = vals
            elif dr == -1 and dc == 0:
                pad[0, 1:w + 1] = vals[-1, :w]
            elif dr == 1 and dc == 0:
                pad[h + 1, 1:w + 1] = vals[0, :w]
            elif dr == 0 and dc == -1:
                pad[1:h + 1, 0] = vals[:h, -1]
            elif dr == 0 and dc == 1:
                pad[1:h + 1, w + 1] = vals[:h, 0]
            elif dr == -1 and dc == -1:
                pad[0, 0] = vals[-1, -1]
            elif dr == -1 and dc == 1:
                pad[0, w + 1] = vals[-1, 0]
            elif dr == 1 and dc == -1:
                pad[h + 1, 0] = vals[0, -1]
            elif dr == 1 and dc == 1:
                pad[h + 1, w + 1] = vals[0, 0]
        centerv = pad[1:h + 1, 1:w + 1]
        best_rate = np.full((h, w), 0.0)
        best_j = np.full((h, w), -1)
        for j, (dr, dc, dist) in enumerate(D8_OFFS):
            nb = pad[1 + dr:1 + dr + h, 1 + dc:1 + dc + w]
            with np.errstate(invalid="ignore"):
                rate = (centerv - nb) / dist
            rate = np.where(np.isnan(rate), -np.inf, rate)
            take = rate > best_rate  # strict >: first max in order wins ties
            best_rate = np.where(take, rate, best_rate)
            best_j = np.where(take, j, best_j)
        code = np.where(best_j >= 0, 2 ** np.maximum(best_j, 0), 0)
        valid = ~np.isnan(centerv)
        rows, cols_ = np.nonzero(valid)
        return pd.DataFrame({
            "row": int(c.row0) + rows,
            "col": int(c.col0) + cols_,
            "code": code[rows, cols_].astype(np.int64),
        })

    contrib = _halo_contributions(tiles)
    return contrib.groupBy("dst_row", "dst_col").applyInPandas(kernel, schema)


def pointer_edges(pointers: DataFrame) -> DataFrame:
    """(id, nid): flat-id edge per cell toward its D8 target (code>0)."""
    j = F.expr("CAST(log2(code) AS INT)")
    dr = F.expr("element_at(array(-1,-1,-1,0,0,1,1,1), CAST(log2(code) AS INT) + 1)")
    dc = F.expr("element_at(array(-1,0,1,-1,1,-1,0,1), CAST(log2(code) AS INT) + 1)")
    return (
        pointers.where(F.col("code") > 0)
        .select(
            (F.col("row") * F.lit(1_000_000) + F.col("col")).alias("id"),
            ((F.col("row") + dr) * F.lit(1_000_000) + (F.col("col") + dc)).alias("nid"),
        )
    )


def flow_accum(pointers: DataFrame, *, max_doublings: int = 12) -> DataFrame:
    """(row, col, accum): cells draining through each cell, incl. itself.

    Ancestor-set sizes via transitive-closure doubling: closure_{k+1} =
    closure_k UNION (closure_k JOIN closure_k) — log2(longest path) rounds.
    """
    ids = pointers.select(
        "row", "col", (F.col("row") * F.lit(1_000_000) + F.col("col")).alias("id")
    )
    closure = pointer_edges(pointers).persist()
    for _ in range(max_doublings):
        hop = closure.alias("a").join(
            closure.alias("b"), F.col("a.nid") == F.col("b.id"), "inner"
        ).select(F.col("a.id").alias("id"), F.col("b.nid").alias("nid"))
        new = closure.unionByName(hop).distinct().persist()
        grew = new.count() > closure.count()
        closure.unpersist()
        closure = new
        if not grew:
            break
    else:
        raise RuntimeError("flow_accum closure did not converge")
    counts = closure.groupBy("nid").agg(F.count(F.lit(1)).alias("n_up"))
    out = (
        ids.join(counts, ids["id"] == counts["nid"], "left")
        .select("row", "col", (F.coalesce("n_up", F.lit(0)) + 1).alias("accum"))
    )
    return out


def extract_streams(pointers: DataFrame, threshold: int) -> DataFrame:
    """Stream cells: accumulation >= threshold (ExtractStreams.java)."""
    return flow_accum(pointers).where(F.col("accum") >= threshold)


def watershed(pointers: DataFrame, *, max_doublings: int = 12) -> DataFrame:
    """(row, col, ws): watershed label = flat id of the terminal (pit/flat,
    code 0) each cell drains to (Watershed.java semantics over D8 paths).

    Pointer doubling on the successor map (terminals map to themselves):
    ptr := ptr(ptr) until fixpoint — log2(longest path) rounds.
    """
    ids = pointers.select(
        "row", "col", (F.col("row") * F.lit(1_000_000) + F.col("col")).alias("id"), "code"
    )
    nxt = pointer_edges(pointers).unionByName(
        ids.where(F.col("code") == 0).select("id", F.col("id").alias("nid"))
    ).persist()
    for _ in range(max_doublings):
        hop = nxt.alias("a").join(
            nxt.alias("b"), F.col("a.nid") == F.col("b.id"), "inner"
        ).select(F.col("a.id").alias("id"), F.col("b.nid").alias("nid"))
        changed = (
            hop.alias("h").join(nxt.alias("o"), F.col("h.id") == F.col("o.id"))
            .where(F.col("h.nid") != F.col("o.nid")).limit(1).count()
        )
        old = nxt
        nxt = hop.persist()
        old.unpersist()
        if changed == 0:
            break
    else:
        raise RuntimeError("watershed pointer-doubling did not converge")
    return ids.join(nxt, "id").select("row", "col", F.col("nid").alias("ws"))
