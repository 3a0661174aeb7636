"""Raster -> vector polygons (the vectorize side of §2.10).

Reference: ConversionTools/src/plugins/RasterToVectorPolygons.java:217-445 —
equal-valued 4-connected patches traced into boundary rings (shells + hole
rings, even-odd).

Distributed formulation:
  1. patch labels via the 2-pass tile clump (operators/clump.py);
  2. the BOUNDARY SEGMENT TABLE is pure Catalyst: one row per cell edge
     whose 4-neighbor has a different label (or is missing) — an equi-join
     on shifted coordinates, no Python;
  3. ring assembly traces each patch's segment set into closed rings in one
     ``applyInPandas`` per label (directed-edge convention keeps the patch
     interior on a fixed side, so shells and holes come out with opposite
     orientations and the signed areas sum EXACTLY to the patch cell count
     — the self-verifying property tests rely on this).  Per-patch segment
     sets are perimeter-sized; at extreme patch sizes the documented scale
     path is per-tile tracing + border-segment stitching.

Corner coordinates: x = col, y = row (y increases downward), so a unit cell
(r, c) spans [c, c+1] x [r, r+1].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clump import clump

# directed boundary edges per missing 4-neighbor (interior kept on a fixed
# side; see module docstring):    (dr, dc) missing ->  start,  end
#   top    (-1, 0): (c+1, r) -> (c, r)
#   bottom ( 1, 0): (c, r+1) -> (c+1, r+1)
#   left   ( 0,-1): (c, r)   -> (c, r+1)
#   right  ( 0, 1): (c+1, r+1) -> (c+1, r)
_EDGE_DEFS = [
    (-1, 0, "col + 1", "row", "col", "row"),
    (1, 0, "col", "row + 1", "col + 1", "row + 1"),
    (0, -1, "col", "row", "col", "row + 1"),
    (0, 1, "col + 1", "row + 1", "col + 1", "row"),
]


def boundary_segments(lab: DataFrame) -> DataFrame:
    """(label, x1, y1, x2, y2): directed boundary edges of every patch.

    lab: (row, col, label).  One shifted-coordinate equi-join per direction,
    unioned — all Catalyst."""
    t = lab.select("row", "col", "label")
    parts = []
    for dr, dc, sx, sy, ex, ey in _EDGE_DEFS:
        nbr = t.select(
            (F.col("row") - dr).alias("row"), (F.col("col") - dc).alias("col"),
            F.col("label").alias("_nl"),
        )
        parts.append(
            t.join(nbr, ["row", "col"], "left")
            .where(F.col("_nl").isNull() | (F.col("_nl") != F.col("label")))
            .select(
                "label",
                F.expr(sx).cast("long").alias("x1"), F.expr(sy).cast("long").alias("y1"),
                F.expr(ex).cast("long").alias("x2"), F.expr(ey).cast("long").alias("y2"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def patch_stats(cells: DataFrame, cols: int) -> DataFrame:
    """(label, n_cells, n_segments): the vectorize summary —
    n_segments is the patch perimeter in cell-edge units."""
    lab = clump(cells, cols)
    segs = boundary_segments(lab)
    nseg = segs.groupBy("label").agg(F.count(F.lit(1)).alias("n_segments"))
    ncell = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_cells"))
    return ncell.join(nseg, "label", "inner").orderBy("label")


_RING_SCHEMA = "label long, ring int, n_vertices int, signed_area double, verts string"


def trace_rings(lab: DataFrame) -> DataFrame:
    """Assemble each patch's boundary segments into closed rings.

    Returns (label, ring, n_vertices, signed_area, verts) where verts is the
    'x,y x,y ...' corner sequence after collinear-run merging, rotated so the
    lexicographically smallest vertex leads.  With the directed-edge
    convention, shells trace clockwise (negative shoelace in y-down coords)
    and holes counterclockwise, so -sum(signed_area) over a patch's rings ==
    its cell count exactly."""
    segs = boundary_segments(lab)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        label = int(key[0])
        # outgoing edge map: start corner -> list of (end corner)
        outs: dict[tuple[int, int], list[tuple[int, int]]] = {}
        for x1, y1, x2, y2 in zip(pdf["x1"], pdf["y1"], pdf["x2"], pdf["y2"]):
            outs.setdefault((int(x1), int(y1)), []).append((int(x2), int(y2)))
        for v in outs.values():
            v.sort()
        used: set[tuple[tuple[int, int], tuple[int, int]]] = set()
        rows = []
        ring_i = 0
        starts = sorted(outs)
        for s in starts:
            for e0 in outs[s]:
                if (s, e0) in used:
                    continue
                # walk a ring; at 4-valent corners prefer the sharpest right
                # turn (keeps diagonally-touching patches as separate rings)
                ring = [s]
                cur, prv = e0, s
                used.add((s, e0))
                while cur != s:
                    ring.append(cur)
                    cands = [e for e in outs.get(cur, []) if (cur, e) not in used]
                    if not cands:
                        break  # defensive: malformed input
                    if len(cands) > 1:
                        din = (cur[0] - prv[0], cur[1] - prv[1])

                        def turn(e):
                            d = (e[0] - cur[0], e[1] - cur[1])
                            # cross>0 = left turn in y-down coords; prefer
                            # right turns (cross<0) first
                            return din[0] * d[1] - din[1] * d[0]

                        cands.sort(key=turn)
                    nxt = cands[0]
                    used.add((cur, nxt))
                    prv, cur = cur, nxt
                # merge collinear runs
                m = []
                n = len(ring)
                for i in range(n):
                    a, b, c = ring[i - 1], ring[i], ring[(i + 1) % n]
                    if (b[0] - a[0]) * (c[1] - b[1]) != (b[1] - a[1]) * (c[0] - b[0]):
                        m.append(b)
                # rotate to smallest vertex
                j = m.index(min(m))
                m = m[j:] + m[:j]
                x = np.array([p[0] for p in m], dtype=np.float64)
                y = np.array([p[1] for p in m], dtype=np.float64)
                area = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) / 2.0)
                rows.append((
                    label, ring_i, len(m), area,
                    " ".join(f"{p[0]},{p[1]}" for p in m),
                ))
                ring_i += 1
        return pd.DataFrame(
            rows, columns=["label", "ring", "n_vertices", "signed_area", "verts"]
        )

    return segs.groupBy("label").applyInPandas(kernel, _RING_SCHEMA)


def raster_to_polygons(cells: DataFrame, cols: int) -> DataFrame:
    """Full vectorize: patch labels -> traced rings."""
    return trace_rings(clump(cells, cols))


def dissolve_geometric(cells: DataFrame, cols: int) -> DataFrame:
    """Geometric Dissolve / Fuse (Scripts/Dissolve.groovy:81-202 union via
    buffer(0); VectorTools/src/plugins/Fuse.java): union of TOUCHING
    same-key polygons, not just the attribute rollup.

    cells: (row, col, grp) — the parcel layer decomposed to unit cells
    (each parcel an axis-aligned polygon of cells; the decomposition is the
    layer contract, the same way the engine rasterizes vector layers).
    Union of touching parcels = 4-connected components per key (the 2-pass
    tile clump) with boundary rings assembled by trace_rings.

    Returns per key: (grp, n_polys, area, n_rings, perimeter) —
      n_polys   dissolved (multi)polygon part count,
      area      exact union area (cell count; overlaps collapse by clump),
      n_rings   shell + hole rings over all parts (hole-preserving union,
                cross-checked by the oracle's Euler-characteristic count
                rings = 2 - (V - E + F) per component),
      perimeter boundary length in cell-edge units.
    """
    lab = clump(cells.select("row", "col", F.col("grp").alias("cls")), cols)
    rings = trace_rings(lab)
    comp_rings = rings.groupBy("label").agg(F.count(F.lit(1)).alias("n_rings"))
    segs = boundary_segments(lab).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_seg")
    )
    comp = lab.groupBy("cls", "label").agg(F.count(F.lit(1)).alias("n_cells"))
    j = comp.join(comp_rings, "label").join(segs, "label")
    return (
        j.groupBy(F.col("cls").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_polys"),
            F.sum("n_cells").alias("area"),
            F.sum("n_rings").alias("n_rings"),
            F.sum("n_seg").alias("perimeter"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# Zhang-Suen line thinning (skeletonization)
# ---------------------------------------------------------------------------
# neighborhood bit order k=0..7: N, NE, E, SE, S, SW, W, NW (classic p2..p9)
_ZS_OFFS = [(-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1)]


def _zs_luts() -> tuple[list[int], list[int]]:
    """Deletion lookup tables over the 8-bit neighborhood mask for the two
    Zhang-Suen sub-iterations (the conditions depend only on the mask)."""
    lut1, lut2 = [], []
    for m in range(256):
        p = [(m >> k) & 1 for k in range(8)]  # p2..p9
        b = sum(p)
        a = sum(1 for k in range(8) if p[k] == 0 and p[(k + 1) % 8] == 1)
        base = 2 <= b <= 6 and a == 1
        # sub-iteration 1: p2*p4*p6 == 0 and p4*p6*p8 == 0  (N,E,S / E,S,W)
        d1 = base and (p[0] * p[2] * p[4] == 0) and (p[2] * p[4] * p[6] == 0)
        # sub-iteration 2: p2*p4*p8 == 0 and p2*p6*p8 == 0  (N,E,W / N,S,W)
        d2 = base and (p[0] * p[2] * p[6] == 0) and (p[0] * p[4] * p[6] == 0)
        lut1.append(1 if d1 else 0)
        lut2.append(1 if d2 else 0)
    return lut1, lut2


def line_thinning(cells: DataFrame, *, pairs: int = 8) -> DataFrame:
    """LineThinning.java (Zhang-Suen skeletonization) over a binary cell set
    (row, col): a FIXED number of sub-iteration pairs (both engine and
    oracle run the same count, past convergence for the test shapes).

    Each sub-iteration is two narrow shuffles: an 8-offset exploded
    self-join builds every cell's neighborhood bitmask, and a 256-entry
    broadcast LUT decides deletion — all Catalyst, no Python."""
    lut1, lut2 = _zs_luts()
    offs = F.array(*[
        F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"), F.lit(1 << k).alias("bit"))
        for k, (dr, dc) in enumerate(_ZS_OFFS)
    ])
    s = cells.select("row", "col")
    for i in range(pairs * 2):
        lut = lut1 if i % 2 == 0 else lut2
        lut_arr = F.array(*[F.lit(v) for v in lut])
        probe = (
            s.withColumn("_o", F.explode(offs))
            .select(
                (F.col("row") - F.col("_o.dr")).alias("row"),
                (F.col("col") - F.col("_o.dc")).alias("col"),
                F.col("_o.bit").alias("bit"),
            )
        )
        mask = probe.groupBy("row", "col").agg(F.sum("bit").alias("_m"))
        s = (
            s.join(mask, ["row", "col"], "left")
            .withColumn("_m", F.coalesce("_m", F.lit(0)))
            .where(F.element_at(lut_arr, F.col("_m").cast("int") + 1) == 0)
            .select("row", "col")
        )
        if i % 4 == 3:
            s = s.localCheckpoint()  # bound the 16-stage lineage
    return s
