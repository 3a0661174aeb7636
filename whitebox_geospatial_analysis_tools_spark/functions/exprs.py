"""Shared deterministic SQL expression fragments.

Single source of truth for every formula that must produce BIT-IDENTICAL
results in Spark (via ``F.expr``) and in the DuckDB oracle (spliced into SQL
text).  Only operations with fully-deterministic IEEE-754 semantics are used
(integer mul/add/mod, double +,-,*,/, floor, abs, sqrt, CASE) so the two
engines agree to the last ulp.

The geocode mirrors the reference's "pages are geocoded to point features"
north-star step; the hash is a Knuth multiplicative LCG on an integer key
(for oracle-checkable queries the key is ``doc_id``; the production path in
:mod:`..sources.pages` geocodes ``xxhash64(url)`` — same downstream math).

Skew is built in on purpose: ~80% of points land in 5 small "urban" hot
boxes (FIXTURES.md §1) so salting / AQE-skew handling is exercised.

Reference semantics mirrored here:
  - tile assignment  = floor((x-x0)/size) grid arithmetic
    (reference: WhiteboxGIS/resources/plugins/Scripts/TileLasFile.groovy:166-196)
  - hex assignment   = nearest hex center; the reference does a kd-tree 1-NN over
    generated centers (Scripts/HexBinning.groovy:202); we use the closed-form
    axial/cube rounding, which is the same nearest-center function.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# integer LCG hash chain (all intermediates < 2^63, no overflow in either engine)
# ---------------------------------------------------------------------------
def D(x: float) -> str:
    """Render a float as a literal both Spark and DuckDB parse as DOUBLE.

    Plain decimal literals (``1000.0``) are DECIMAL in Spark SQL — silently
    truncating every downstream computation to 6-decimal scale — so every
    shared formula uses exponent notation, which is DOUBLE in both engines.
    (repr already emits an exponent for |x| < 1e-4 / >= 1e16 — appending
    ``e0`` there would produce invalid SQL, so only append when absent.)
    """
    r = repr(float(x))
    return r if "e" in r or "E" in r else r + "e0"


M = 2147483648  # 2^31
A = 2654435761  # Knuth multiplicative constant
C = 987654321


def u1(key: str) -> str:
    return f"(({key}) * {A} % {M})"


def u2(key: str) -> str:
    return f"((({u1(key)} + {C}) * {A}) % {M})"


def u3(key: str) -> str:
    return f"((({u2(key)} + {C}) * {A}) % {M})"


# ---------------------------------------------------------------------------
# geocode: key -> (lon in [0,360), lat in [0,180)) with 5 hot boxes (skew)
# ---------------------------------------------------------------------------
def lon_expr(key: str) -> str:
    _u1, _u3 = u1(key), u3(key)
    return (
        f"(CASE WHEN {_u3} % 10 < 8 "
        f"THEN ({_u3} % 5) * 72e0 + 30e0 + ({_u1} % 1048576) / 1048576e0 * 1.5e0 "
        f"ELSE {_u1} / {M}e0 * 360e0 END)"
    )


def lat_expr(key: str) -> str:
    _u2, _u3 = u2(key), u3(key)
    return (
        f"(CASE WHEN {_u3} % 10 < 8 "
        f"THEN 40e0 + ({_u2} % 1048576) / 1048576e0 * 1.5e0 "
        f"ELSE {_u2} / {M}e0 * 180e0 END)"
    )


# column-factored variants (Spark side): same formulas over precomputed
# _u1/_u2/_u3 attribute columns, so codegen evaluates each chain link once.
def u2_from(u1col: str) -> str:
    return f"((({u1col} + {C}) * {A}) % {M})"


def u3_from(u2col: str) -> str:
    return f"((({u2col} + {C}) * {A}) % {M})"


def lon_from(u1col: str, u3col: str) -> str:
    return (
        f"(CASE WHEN {u3col} % 10 < 8 "
        f"THEN ({u3col} % 5) * 72e0 + 30e0 + ({u1col} % 1048576) / 1048576e0 * 1.5e0 "
        f"ELSE {u1col} / {M}e0 * 360e0 END)"
    )


def lat_from(u2col: str, u3col: str) -> str:
    return (
        f"(CASE WHEN {u3col} % 10 < 8 "
        f"THEN 40e0 + ({u2col} % 1048576) / 1048576e0 * 1.5e0 "
        f"ELSE {u2col} / {M}e0 * 180e0 END)"
    )


def value_expr(key: str) -> str:
    """Deterministic double value column in [0, 1000) with 3 exact decimals."""
    return f"(({u3(key)} % 1000000) / 1000e0)"


# ---------------------------------------------------------------------------
# square tile grid (TileLasFile.groovy:166-196 semantics: tile = row*cols+col)
# ---------------------------------------------------------------------------
TILE_SIZE = 6.0
TILE_COLS = 60  # 360 / 6
TILE_ROWS = 30  # 180 / 6


def tile_x_expr(lon: str) -> str:
    return f"CAST(floor(({lon}) / {D(TILE_SIZE)}) AS BIGINT)"


def tile_y_expr(lat: str) -> str:
    return f"CAST(floor(({lat}) / {D(TILE_SIZE)}) AS BIGINT)"


def tile_id_expr(lon: str, lat: str) -> str:
    return f"({tile_y_expr(lat)} * {TILE_COLS} + {tile_x_expr(lon)})"


# ---------------------------------------------------------------------------
# pointy-top hexagonal cells, axial (q, r), closed-form cube rounding.
# Rounding is floor(x+0.5) (half-up) in BOTH engines — never round(), whose
# tie behavior differs between Spark (HALF_UP), DuckDB (HALF_AWAY) and numpy
# (HALF_EVEN).
# ---------------------------------------------------------------------------
HEX_SIZE = 4.0
SQRT3_3 = "0.5773502691896258e0"  # 1/sqrt(3)


def _hex_frac(x: str, y: str) -> tuple[str, str]:
    qf = f"(({SQRT3_3} * ({x}) - ({y}) / 3e0) / {D(HEX_SIZE)})"
    rf = f"(({y}) * 2e0 / 3e0 / {D(HEX_SIZE)})"
    return qf, rf


def hex_q_expr(x: str, y: str) -> str:
    qf, rf = _hex_frac(x, y)
    return _cube_round_q(qf, rf)


def hex_r_expr(x: str, y: str) -> str:
    qf, rf = _hex_frac(x, y)
    return _cube_round_r(qf, rf)


def _rounded_parts(qf: str, rf: str) -> tuple[str, str, str, str, str, str]:
    yf = f"(-({qf}) - ({rf}))"
    rx = f"CAST(floor({qf} + 0.5e0) AS BIGINT)"
    ry = f"CAST(floor({yf} + 0.5e0) AS BIGINT)"
    rz = f"CAST(floor({rf} + 0.5e0) AS BIGINT)"
    dx = f"abs({rx} - {qf})"
    dy = f"abs({ry} - {yf})"
    dz = f"abs({rz} - {rf})"
    return rx, ry, rz, dx, dy, dz


def _cube_round_q(qf: str, rf: str) -> str:
    rx, ry, rz, dx, dy, dz = _rounded_parts(qf, rf)
    return f"(CASE WHEN {dx} > {dy} AND {dx} > {dz} THEN -{ry} - {rz} ELSE {rx} END)"


def _cube_round_r(qf: str, rf: str) -> str:
    rx, ry, rz, dx, dy, dz = _rounded_parts(qf, rf)
    return (
        f"(CASE WHEN {dx} > {dy} AND {dx} > {dz} THEN {rz} "
        f"WHEN {dy} > {dz} THEN {rz} "
        f"ELSE -{rx} - {ry} END)"
    )


# ---------------------------------------------------------------------------
# hierarchical cells: res 7/8/9 analogue — parent tile at 3x coarser size.
# child(res r+1) size = size(r)/3 so each parent has exactly 9 children
# (square grid analogue of H3's aperture-7; aperture-9 keeps floor math exact).
# ---------------------------------------------------------------------------
def cell_expr(lon: str, lat: str, res: int) -> str:
    """Square hierarchical cell id at res 7/8/9. res 7 = 6°, 8 = 2°, 9 = 2/3°."""
    size = {7: 6.0, 8: 2.0, 9: 2.0 / 3.0}[res]
    cols = int(round(360.0 / size))
    cx = f"CAST(floor(({lon}) / {D(size)}) AS BIGINT)"
    cy = f"CAST(floor(({lat}) / {D(size)}) AS BIGINT)"
    return f"({cy} * {cols} + {cx})"
