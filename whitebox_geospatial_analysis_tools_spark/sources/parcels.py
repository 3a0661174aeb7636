"""Deterministic axis-aligned parcel layer for the full location-predicate set.

Mirrors the fixture role of the reference's IsolateVectorFeaturesByLocation
test layers (VectorTools/src/plugins/IsolateVectorFeaturesByLocation.java:240-261
— the 11 predicate modes: intersect / notIntersect / within / contains /
notContain / covers / coveredBy / crosses / touches / notTouch / distance).
The layer is constructed so every boundary-contact class actually occurs:

- a strip of edge-adjacent parcels (touches along a shared edge),
- a staggered second row whose corners meet the strip (touches at a point),
- partial overlaps across the two rows,
- nested parcels (contains / within, including boundary-flush covers cases),
- one exact duplicate (equals),
- separated parcels at small gaps (disjoint, with/without the distance mode).

All coordinates are small integers, so every cross product, overlap area and
gap distance-squared below is EXACT in both engines (no float policy needed).
"""

from __future__ import annotations

from functools import lru_cache

# (pid, xmin, ymin, xmax, ymax) — integers
_PARCELS: list[tuple[int, int, int, int, int]] = []


def _build() -> list[tuple[int, int, int, int, int]]:
    out: list[tuple[int, int, int, int, int]] = []
    pid = 0
    # row A: 8 edge-adjacent 4x4 parcels along y in [0, 4]
    for i in range(8):
        out.append((pid, 4 * i, 0, 4 * i + 4, 4))
        pid += 1
    # row B: staggered 4x4 parcels at y in [4, 8] offset by 4 -> every row-A
    # junction corner (4i+4, 4) is a row-B corner too (touch at a point for
    # diagonal neighbours, shared edge for the vertically adjacent pair)
    for i in range(7):
        out.append((pid, 4 * i + 4, 4, 4 * i + 8, 8))
        pid += 1
    # overlappers: 4x4 parcels straddling rows A/B (proper interior overlap)
    for i in range(4):
        out.append((pid, 8 * i + 2, 2, 8 * i + 6, 6))
        pid += 1
    # nested: big parcel + strictly-interior child + boundary-flush child;
    # the last group lists the child FIRST so the ordered pair (a < b)
    # exercises 'within' as well as 'contains'
    for k in range(3):
        x0 = 40 + 10 * k
        group = [
            (x0, 0, x0 + 8, 8),      # parent
            (x0 + 2, 2, x0 + 6, 6),  # strict interior
            (x0, 3, x0 + 4, 7),      # flush to parent's west edge
        ]
        if k == 2:
            group = group[::-1]
        for g in group:
            out.append((pid, *g))
            pid += 1
    # equals: duplicate of parcel 3's rectangle
    out.append((pid, 12, 0, 16, 4)); pid += 1
    # disjoint with gaps 1 and 3 from the nearest strip parcel (y gap)
    out.append((pid, 0, 5, 3, 7)); pid += 1    # gap 1 above parcel 0
    out.append((pid, 0, 7, 3, 9)); pid += 1    # gap 3 above parcel 0
    # far-away parcel (outside every candidate window) ...
    out.append((pid, 200, 200, 204, 204)); pid += 1
    # ... except for a diagonal neighbour at axis gaps (3, 3): a candidate
    # (each axis gap <= tau) whose Euclidean gap^2 = 18 > tau^2 — exercises
    # within_dist = 0
    out.append((pid, 207, 207, 211, 211)); pid += 1
    return out


@lru_cache(maxsize=1)
def make_parcels() -> list[tuple[int, int, int, int, int]]:
    return _build()


def parcels_sql_values() -> str:
    rows = ", ".join(
        f"({p},{a},{b},{c},{d})" for p, a, b, c, d in make_parcels()
    )
    return f"(VALUES {rows})"


def parcels_df(spark):
    return spark.createDataFrame(
        make_parcels(), "pid long, xmin long, ymin long, xmax long, ymax long"
    )
