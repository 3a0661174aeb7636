"""Vectorized geometry kernels (pure numpy — the engine's only Python hot path).

Even-odd ray-cast point-in-polygon, reproducing the reference's scanline
crossing rule (ConversionTools/src/plugins/VectorPolygonsToRaster.java:400-470:
crossings at ``xPrime = x1 + (rowY - y1)/(y2 - y1) * (x2 - x1)``, alternate
spans filled; holes are additional rings whose crossings flip parity).  The
exact float expression here is mirrored verbatim in the DuckDB oracle SQL so
both engines agree bit-for-bit.

All kernels are batch-vectorized (numpy over Arrow batches); never per-row
Python (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources.polygons import PolygonLayer, make_polygon_layer


# ---------------------------------------------------------------------------
# even-odd crossing test
# ---------------------------------------------------------------------------
def _crossings(px, py, x1, y1, x2, y2):
    """Count ray crossings: px,py (N,1) vs edges (1,E) -> (N,) int."""
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    hit = cond & (px < xi)
    return hit.sum(axis=1)


class PipIndex:
    """Edge table grouped by polygon for fast per-polygon batched refinement."""

    def __init__(self, layer: PolygonLayer | None = None):
        layer = layer or make_polygon_layer()
        order = np.argsort(layer.edge_poly, kind="stable")
        self.poly = layer.edge_poly[order]
        self.x1 = layer.x1[order]
        self.y1 = layer.y1[order]
        self.x2 = layer.x2[order]
        self.y2 = layer.y2[order]
        self.uniq, self.start = np.unique(self.poly, return_index=True)
        self.end = np.append(self.start[1:], len(self.poly))
        self.slice_of = {int(p): (int(s), int(e)) for p, s, e in zip(self.uniq, self.start, self.end)}

    def contains_pairs(self, px: np.ndarray, py: np.ndarray, poly_id: np.ndarray) -> np.ndarray:
        """Vectorized refine for candidate (point, polygon) pairs.

        Groups the batch by polygon, then does one broadcasted crossing count
        per polygon present — O(points_in_group x edges_of_poly).
        """
        out = np.zeros(len(px), dtype=bool)
        if len(px) == 0:
            return out
        order = np.argsort(poly_id, kind="stable")
        sp = poly_id[order]
        bounds = np.flatnonzero(np.diff(sp)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(sp)]])
        for s, e in zip(starts, ends):
            pid = int(sp[s])
            sl = self.slice_of.get(pid)
            if sl is None:
                continue
            a, b = sl
            idx = order[s:e]
            cr = _crossings(
                px[idx][:, None],
                py[idx][:, None],
                self.x1[None, a:b],
                self.y1[None, a:b],
                self.x2[None, a:b],
                self.y2[None, a:b],
            )
            out[idx] = (cr % 2) == 1
        return out

    def contains_all(self, px: np.ndarray, py: np.ndarray) -> list[np.ndarray]:
        """Brute-force oracle: for each point, array of containing poly ids."""
        res = []
        for x, y in zip(px, py):
            cr = _crossings(
                np.asarray([[x]]), np.asarray([[y]]),
                self.x1[None, :], self.y1[None, :], self.x2[None, :], self.y2[None, :],
            )
            # count per polygon via bincount on edge hits
            hits = ((self.y1 > y) != (self.y2 > y))
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = (self.x2 - self.x1) * (y - self.y1) / (self.y2 - self.y1) + self.x1
            hits = hits & (x < xi)
            cnt = np.bincount(self.poly[hits], minlength=int(self.uniq.max()) + 1)
            res.append(np.flatnonzero(cnt % 2 == 1))
            del cr
        return res


def make_pip_refine_udf(layer: PolygonLayer | None = None):
    """pandas_udf (px, py, poly_id) -> bool, Arrow-batched, JVM<->numpy only."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Build the index lazily on each executor (tiny layer; cached per process)
    state: dict = {}

    @F.pandas_udf(T.BooleanType())
    def pip_contains(px: pd.Series, py: pd.Series, poly_id: pd.Series) -> pd.Series:
        if "idx" not in state:
            state["idx"] = PipIndex(layer)
        m = state["idx"].contains_pairs(
            px.to_numpy(np.float64), py.to_numpy(np.float64), poly_id.to_numpy(np.int64)
        )
        return pd.Series(m)

    return pip_contains


# ---------------------------------------------------------------------------
# covering cells: polygon bbox -> list of candidate cell ids (driver-side;
# the polygon layer is the SMALL broadcast side). Conservative: bbox cover.
# ---------------------------------------------------------------------------
def covering_cells(size: float, cols: int, layer: PolygonLayer | None = None):
    """Yield (cell_id, poly_id) for every grid cell intersecting each bbox."""
    layer = layer or make_polygon_layer()
    pairs = []
    for i in range(layer.n):
        xmin, ymin, xmax, ymax = layer.bbox[i]
        cx0, cx1 = int(np.floor(xmin / size)), int(np.floor(xmax / size))
        cy0, cy1 = int(np.floor(ymin / size)), int(np.floor(ymax / size))
        pid = int(layer.poly_id[i])
        for cy in range(cy0, cy1 + 1):
            for cx in range(cx0, cx1 + 1):
                pairs.append((cy * cols + cx, pid))
    return pairs


# ---------------------------------------------------------------------------
# shape metrics (GISTools Area/Perimeter/Centroid semantics on vector rings)
# ---------------------------------------------------------------------------
def shoelace_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(np.sum(x * y2 - x2 * y) / 2.0)


def perimeter(ring: np.ndarray) -> float:
    d = np.roll(ring, -1, axis=0) - ring
    return float(np.sum(np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)))


def centroid(ring: np.ndarray) -> tuple[float, float]:
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = x * y2 - x2 * y
    a = np.sum(cross) / 2.0
    cx = float(np.sum((x + x2) * cross) / (6.0 * a))
    cy = float(np.sum((y + y2) * cross) / (6.0 * a))
    return cx, cy
