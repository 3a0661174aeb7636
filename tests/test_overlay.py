"""Property tests for the Sutherland-Hodgman clipping kernel (pure numpy)."""

from __future__ import annotations

import numpy as np
import pytest

from whitebox_geospatial_analysis_tools_spark.operators.overlay import (
    _shoelace_seq, sh_clip,
)
from whitebox_geospatial_analysis_tools_spark.sources.polygons import (
    make_clip_layer, make_polygon_layer,
)

SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])


def hexagon(cx, cy, r):
    ang = np.arange(6) * (np.pi / 3.0)
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


def test_identity_when_inside():
    inner = np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0]])
    out = sh_clip(inner, SQUARE)
    assert abs(_shoelace_seq(out) - 4.0) < 1e-12


def test_disjoint_empty():
    far = np.array([[100.0, 100.0], [101.0, 100.0], [101.0, 101.0]])
    assert len(sh_clip(far, SQUARE)) == 0


def test_half_overlap_rect():
    rect = np.array([[5.0, 0.0], [15.0, 0.0], [15.0, 10.0], [5.0, 10.0]])
    out = sh_clip(rect, SQUARE)
    assert abs(_shoelace_seq(out) - 50.0) < 1e-9


def test_clip_bounded_by_operands():
    subj = make_polygon_layer()
    clips = make_clip_layer()
    checked = 0
    for i in range(subj.n):
        shell = subj.rings[i][0]
        sa = _shoelace_seq(shell)
        for j in range(clips.n):
            clip = clips.rings[j][0]
            out = sh_clip(shell, clip)
            a = _shoelace_seq(out)
            ca = _shoelace_seq(clip)
            assert a >= -1e-9
            assert a <= min(sa, ca) + 1e-9
            if a > 1e-9:
                checked += 1
                # every clipped vertex lies inside (or on) the convex clip
                m = len(clip)
                for k in range(m):
                    ax, ay = clip[k]
                    bx, by = clip[(k + 1) % m]
                    d = (bx - ax) * (out[:, 1] - ay) - (by - ay) * (out[:, 0] - ax)
                    assert (d >= -1e-7).all()
    assert checked > 20  # the layers genuinely overlap


def test_even_odd_hole_subtraction():
    """Subject with a hole clipped by a clip containing both: even-odd
    area = shell - hole."""
    shell = SQUARE
    hole = np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0]])
    clip = hexagon(5.0, 5.0, 20.0)  # contains the whole subject
    a = _shoelace_seq(sh_clip(shell, clip)) - _shoelace_seq(sh_clip(hole, clip))
    assert abs(a - (100.0 - 16.0)) < 1e-9


def test_hole_partial_clip():
    """Clip window overlapping shell and hole: even-odd area matches a
    fine-grid parity count within grid tolerance."""
    shell = SQUARE
    hole = np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0]])
    clip = hexagon(6.0, 6.0, 5.0)
    a = _shoelace_seq(sh_clip(shell, clip)) - _shoelace_seq(sh_clip(hole, clip))
    # Monte-Carlo-free parity oracle: dense grid point-in-polygon counting
    g = 400
    xs = np.linspace(-2, 14, g)
    ys = np.linspace(-2, 14, g)
    gx, gy = np.meshgrid(xs, ys)

    def inside(ring, px, py):
        cnt = np.zeros(px.shape, dtype=int)
        n = len(ring)
        for k in range(n):
            x1, y1 = ring[k]
            x2, y2 = ring[(k + 1) % n]
            cond = (y1 > py) != (y2 > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xi = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            cnt += (cond & (px < xi)).astype(int)
        return cnt % 2 == 1

    mask = (
        inside(shell, gx, gy) & ~inside(hole, gx, gy) & inside(clip, gx, gy)
    )
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    approx = mask.sum() * cell
    assert abs(a - approx) < 1.0  # grid-resolution tolerance


def test_concave_fan_decomposition():
    """The star fan is an exact disjoint convex decomposition: triangle
    areas sum to the star's shoelace area, every triangle is CCW, and
    pairwise triangle intersections (within a star) have zero area."""
    import numpy as np

    from whitebox_geospatial_analysis_tools_spark.operators.overlay import (
        _shoelace_seq, sh_clip,
    )
    from whitebox_geospatial_analysis_tools_spark.sources.polygons import (
        concave_triangles, make_concave_clip_layer,
    )

    layer = make_concave_clip_layer()
    tris: dict[int, list] = {}
    for cid, _t, tri in concave_triangles():
        tris.setdefault(cid, []).append(tri)
    for i in range(layer.n):
        cid = int(layer.poly_id[i])
        star = layer.rings[i][0]
        star_area = _shoelace_seq(star)
        assert star_area > 0  # CCW boundary
        parts = tris[cid]
        areas = [_shoelace_seq(t) for t in parts]
        assert all(a > 0 for a in areas)  # CCW triangles
        assert abs(sum(areas) - star_area) < 1e-9 * max(1.0, star_area)
        for a in range(len(parts)):
            for b in range(a + 1, len(parts)):
                inter = _shoelace_seq(sh_clip(parts[a], parts[b]))
                assert abs(inter) < 1e-9


def test_line_clip_interval_matches_dense_sampling():
    """Cyrus-Beck t-interval vs dense point-in-convex sampling: the inside
    fraction and the predicate class agree for every (line, hexagon) pair."""
    rng = np.random.default_rng(7)
    clips = make_clip_layer()
    ts = (np.arange(4001) + 0.5) / 4001.0  # open midpoints, avoids boundary hits
    lines = rng.uniform([0, 0, 0, 0], [360, 180, 360, 180], size=(60, 4))
    # short lines so 'within' occurs
    mids = np.column_stack([(lines[:, 0] + lines[:, 2]) / 2, (lines[:, 1] + lines[:, 3]) / 2])
    short = np.column_stack([
        mids[:, 0] + (lines[:, 0] - mids[:, 0]) / 64,
        mids[:, 1] + (lines[:, 1] - mids[:, 1]) / 64,
        mids[:, 0] + (lines[:, 2] - mids[:, 0]) / 64,
        mids[:, 1] + (lines[:, 3] - mids[:, 1]) / 64,
    ])
    saw = set()
    for x1, y1, x2, y2 in np.vstack([lines, short]):
        for i in range(clips.n):
            ring = clips.rings[i][0]
            nxt = np.roll(ring, -1, axis=0)
            ax, ay, bx, by = ring[:, 0], ring[:, 1], nxt[:, 0], nxt[:, 1]
            s0 = (bx - ax) * (y1 - ay) - (by - ay) * (x1 - ax)
            s1 = (bx - ax) * (y2 - ay) - (by - ay) * (x2 - ax)
            den = s1 - s0
            bad = np.any((den == 0) & (s0 < 0))
            lo = (-s0 / den)[den > 0]
            hi = (-s0 / den)[den < 0]
            tin = max(0.0, lo.max()) if len(lo) else 0.0
            tout = min(1.0, hi.min()) if len(hi) else 1.0
            frac = 0.0 if (bad or tin >= tout) else tout - tin
            # dense sampling ground truth
            px = x1 + ts * (x2 - x1)
            py = y1 + ts * (y2 - y1)
            inside = np.ones(len(ts), dtype=bool)
            for k in range(6):
                inside &= (bx[k] - ax[k]) * (py - ay[k]) - (by[k] - ay[k]) * (px - ax[k]) >= 0
            sfrac = inside.mean()
            assert abs(frac - sfrac) < 2e-3, (frac, sfrac)
            if frac <= 0:
                saw.add("disjoint")
                assert sfrac == 0
            elif tin == 0.0 and tout == 1.0:
                saw.add("within")
                assert sfrac == 1.0
            else:
                saw.add("crosses")
                assert 0 < sfrac < 1
    assert saw == {"disjoint", "within", "crosses"}
