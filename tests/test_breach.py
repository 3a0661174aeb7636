"""BreachDepressions: distributed tile kernel vs an independent sequential
numpy oracle, tile-size invariance, and the drains property."""

from __future__ import annotations

import heapq

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_hydro_scale import synth_values
from whitebox_geospatial_analysis_tools_spark.operators import raster as R
from whitebox_geospatial_analysis_tools_spark.operators.hydro import (
    BREACH_EPS, breach_depressions,
)

OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def breach_np(dem: np.ndarray, max_length: int = 8,
              eps: float = BREACH_EPS) -> np.ndarray:
    """Sequential global oracle: same pit definition, bounded Dijkstra
    (cost = total carve depth, tie steps then row/col), min-merged carves."""
    h, w = dem.shape
    valid = ~np.isnan(dem)
    carv: dict[tuple[int, int], float] = {}
    for pr in range(h):
        for pc in range(w):
            if not valid[pr, pc]:
                continue
            nbs = [(pr + dr, pc + dc) for dr, dc in OFFS]
            if any(not (0 <= r < h and 0 <= c < w) or not valid[r, c]
                   for r, c in nbs):
                continue  # drains off-grid / into nodata
            p = dem[pr, pc]
            if any(dem[r, c] < p for r, c in nbs):
                continue
            best = {(pr, pc): (0.0, 0)}
            pred: dict = {}
            tpred = None
            heap = [(0.0, 0, pr, pc)]
            target = None
            while heap:
                cost, steps, r, c = heapq.heappop(heap)
                if best.get((r, c), (np.inf, 0)) < (cost, steps):
                    continue
                if target is not None and (cost, steps) >= target[:2]:
                    break
                if steps >= max_length:
                    continue
                for dr, dc in OFFS:
                    nr, nc = r + dr, c + dc
                    if not (0 <= nr < h and 0 <= nc < w) or not valid[nr, nc]:
                        continue
                    need = p - (steps + 1) * eps
                    if dem[nr, nc] < need:
                        cand = (cost, steps + 1, nr, nc)
                        if target is None or cand < target:
                            target = cand
                            tpred = (r, c)
                        continue
                    ncost = cost + (dem[nr, nc] - need)
                    prevb = best.get((nr, nc))
                    if prevb is None or (ncost, steps + 1) < prevb:
                        best[(nr, nc)] = (ncost, steps + 1)
                        pred[(nr, nc)] = (r, c)
                        heapq.heappush(heap, (ncost, steps + 1, nr, nc))
            if target is None:
                continue
            path = [(target[2], target[3])]
            cur = tpred
            while cur != (pr, pc):
                path.append(cur)
                cur = pred[cur]
            path.reverse()
            for k, (r, c) in enumerate(path[:-1], start=1):
                v = p - k * eps
                if (r, c) not in carv or v < carv[(r, c)]:
                    carv[(r, c)] = v
    out = dem.copy()
    for (r, c), v in carv.items():
        out[r, c] = min(out[r, c], v)
    return out


ROWS, COLS = 96, 128


@pytest.fixture(scope="module")
def dem_cells(spark):
    return (
        R.explode_cells(R.synth_raster(spark, ROWS, COLS))
        .where(F.col("value") != R.NODATA)
        .withColumnRenamed("value", "dem")
        .persist()
    )


def _grid(pdf, col):
    g = np.full((ROWS, COLS), np.nan)
    g[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf[col].to_numpy()
    return g


def test_breach_matches_numpy_oracle(spark, dem_cells):
    dem = synth_values(ROWS, COLS)
    want = breach_np(dem)
    got = _grid(breach_depressions(dem_cells, tile=32).toPandas(), "breached")
    m = ~np.isnan(dem)
    assert np.array_equal(got[m], want[m])


def test_breach_tile_invariance(spark, dem_cells):
    a = _grid(breach_depressions(dem_cells, tile=32).toPandas(), "breached")
    b = _grid(breach_depressions(dem_cells, tile=256).toPandas(), "breached")
    m = ~np.isnan(a)
    assert np.array_equal(a[m], b[m])


def test_breach_drains(spark):
    """Plane DEM with dug single-cell pits: every pit is breachable within
    the window, so the breached DEM has NO interior pits under flow_d8."""
    rows, cols = 40, 40
    plane = "(0.25e0 * ({row}) + 0.125e0 * ({col}) "
    pits = [(10, 10), (20, 25), (30, 7)]
    # shallow pits: the plane drops 0.25/row toward row 0, so lower ground
    # sits 3 steps upslope-row-wise — well inside the max_length window
    dig = " + ".join(
        f"(CASE WHEN ({{row}}) = {r} AND ({{col}}) = {c} THEN -0.5e0 ELSE 0e0 END)"
        for r, c in pits
    )
    vsql = plane + f"+ {dig})"
    cells = (
        R.explode_cells(R.synth_raster(spark, rows, cols, value_sql=vsql))
        .withColumnRenamed("value", "dem")
    )
    pdf = breach_depressions(cells, tile=32).toPandas()
    g = np.full((rows, cols), np.nan)
    g[pdf["row"].to_numpy(), pdf["col"].to_numpy()] = pdf["breached"].to_numpy()
    # D8-pit test (flow_pointer_d8 semantics: pit = no strictly lower
    # neighbor): no interior cell may be a pit after breaching
    pad = np.pad(g, 1, constant_values=np.nan)
    any_lower = np.zeros((rows, cols), dtype=bool)
    for dr, dc in OFFS:
        nb = pad[1 + dr:1 + dr + rows, 1 + dc:1 + dc + cols]
        with np.errstate(invalid="ignore"):
            any_lower |= nb < g
    assert any_lower[1:-1, 1:-1].all()
    # and the original DEM did have pits there
    assert len(pits) == 3
