"""Coordinate system transformation: geographic (WGS84) <-> UTM.

Reference: ConversionTools/src/plugins/CoordinateSystemTransformation.java:55
(1809 LoC) and whitebox/georeference/LL2UTM.java — standard Transverse
Mercator series (public formulas, Snyder 1987 / USGS PP-1395).

Engineering shape: every stage is a named SQL TEXT FRAGMENT over previously
computed columns, evaluated with ``F.expr`` on the Spark side and spliced
into chained CTEs in the DuckDB oracle — identical operation order, so the
engines agree to libm ulps; outputs round to 4 decimals of a metre
(easting/northing) and 6 decimals of a degree (round-trip), far above the
ulp noise.  Staged columns also keep each generated Janino method small
(the geocode codegen lesson from round 1).
"""

from __future__ import annotations

# WGS84
_A = "6378137e0"
_F = "(1e0 / 298.257223563e0)"
E2 = f"({_F} * (2e0 - {_F}))"
EP2 = f"({E2} / (1e0 - {E2}))"
K0 = "0.9996e0"

# ---------------------------------------------------------------------------
# forward: columns (lam, phi, lam0) in radians -> (easting, northing)
# ---------------------------------------------------------------------------
FWD_STAGE1 = {
    "nn_": f"({_A} / SQRT(1e0 - {E2} * SIN(phi) * SIN(phi)))",
    "t_": "(TAN(phi) * TAN(phi))",
    "c_": f"({EP2} * COS(phi) * COS(phi))",
    "aa_": "((lam - lam0) * COS(phi))",
    "m_": (
        f"({_A} * ((1e0 - {E2} / 4e0 - 3e0 * {E2} * {E2} / 64e0 "
        f"- 5e0 * {E2} * {E2} * {E2} / 256e0) * phi "
        f"- (3e0 * {E2} / 8e0 + 3e0 * {E2} * {E2} / 32e0 "
        f"+ 45e0 * {E2} * {E2} * {E2} / 1024e0) * SIN(2e0 * phi) "
        f"+ (15e0 * {E2} * {E2} / 256e0 + 45e0 * {E2} * {E2} * {E2} / 1024e0) * SIN(4e0 * phi) "
        f"- (35e0 * {E2} * {E2} * {E2} / 3072e0) * SIN(6e0 * phi)))"
    ),
}
FWD_STAGE2 = {
    "easting": (
        f"({K0} * nn_ * (aa_ + (1e0 - t_ + c_) * aa_ * aa_ * aa_ / 6e0 "
        f"+ (5e0 - 18e0 * t_ + t_ * t_ + 72e0 * c_ - 58e0 * {EP2}) "
        "* aa_ * aa_ * aa_ * aa_ * aa_ / 120e0) + 500000e0)"
    ),
    "northing": (
        f"({K0} * (m_ + nn_ * TAN(phi) * (aa_ * aa_ / 2e0 "
        "+ (5e0 - t_ + 9e0 * c_ + 4e0 * c_ * c_) * aa_ * aa_ * aa_ * aa_ / 24e0 "
        f"+ (61e0 - 58e0 * t_ + t_ * t_ + 600e0 * c_ - 330e0 * {EP2}) "
        "* aa_ * aa_ * aa_ * aa_ * aa_ * aa_ / 720e0)))"
    ),
}

# ---------------------------------------------------------------------------
# inverse: columns (easting, northing, lam0) -> (lam2, phi2) in radians
# ---------------------------------------------------------------------------
_E1 = f"((1e0 - SQRT(1e0 - {E2})) / (1e0 + SQRT(1e0 - {E2})))"
INV_STAGE1 = {
    "mu_": (
        f"((northing / {K0}) / ({_A} * (1e0 - {E2} / 4e0 "
        f"- 3e0 * {E2} * {E2} / 64e0 - 5e0 * {E2} * {E2} * {E2} / 256e0)))"
    ),
}
INV_STAGE2 = {
    "phi1_": (
        f"(mu_ + (3e0 * {_E1} / 2e0 - 27e0 * {_E1} * {_E1} * {_E1} / 32e0) * SIN(2e0 * mu_) "
        f"+ (21e0 * {_E1} * {_E1} / 16e0 - 55e0 * {_E1} * {_E1} * {_E1} * {_E1} / 32e0) * SIN(4e0 * mu_) "
        f"+ (151e0 * {_E1} * {_E1} * {_E1} / 96e0) * SIN(6e0 * mu_) "
        f"+ (1097e0 * {_E1} * {_E1} * {_E1} * {_E1} / 512e0) * SIN(8e0 * mu_))"
    ),
}
INV_STAGE3 = {
    "c1_": f"({EP2} * COS(phi1_) * COS(phi1_))",
    "t1_": "(TAN(phi1_) * TAN(phi1_))",
    "n1_": f"({_A} / SQRT(1e0 - {E2} * SIN(phi1_) * SIN(phi1_)))",
    "r1_": (
        f"({_A} * (1e0 - {E2}) / POW(1e0 - {E2} * SIN(phi1_) * SIN(phi1_), 1.5e0))"
    ),
}
INV_STAGE4 = {
    "d_": f"((easting - 500000e0) / (n1_ * {K0}))",
}
INV_STAGE5 = {
    "phi2": (
        "(phi1_ - (n1_ * TAN(phi1_) / r1_) * (d_ * d_ / 2e0 "
        f"- (5e0 + 3e0 * t1_ + 10e0 * c1_ - 4e0 * c1_ * c1_ - 9e0 * {EP2}) "
        "* d_ * d_ * d_ * d_ / 24e0 "
        f"+ (61e0 + 90e0 * t1_ + 298e0 * c1_ + 45e0 * t1_ * t1_ "
        f"- 252e0 * {EP2} - 3e0 * c1_ * c1_) "
        "* d_ * d_ * d_ * d_ * d_ * d_ / 720e0))"
    ),
    "lam2": (
        "(lam0 + (d_ - (1e0 + 2e0 * t1_ + c1_) * d_ * d_ * d_ / 6e0 "
        f"+ (5e0 - 2e0 * c1_ + 28e0 * t1_ - 3e0 * c1_ * c1_ + 8e0 * {EP2} "
        "+ 24e0 * t1_ * t1_) * d_ * d_ * d_ * d_ * d_ / 120e0) / COS(phi1_))"
    ),
}

FWD_STAGES = [FWD_STAGE1, FWD_STAGE2]
INV_STAGES = [INV_STAGE1, INV_STAGE2, INV_STAGE3, INV_STAGE4, INV_STAGE5]


def apply_stages(df, stages):
    """Spark side: evaluate each stage's fragments as new columns."""
    from pyspark.sql import functions as F

    for stage in stages:
        df = df.select("*", *[F.expr(e).alias(k) for k, e in stage.items()])
    return df


def stages_sql(base_cte: str, base_name: str, stages, prefix: str) -> str:
    """Oracle side: the same fragments as chained CTEs."""
    parts = [f"{base_name} AS ({base_cte})"]
    prev = base_name
    for i, stage in enumerate(stages):
        cur = f"{prefix}{i}"
        cols = ", ".join(f"{e} AS {k}" for k, e in stage.items())
        parts.append(f"{cur} AS (SELECT *, {cols} FROM {prev})")
        prev = cur
    return ", ".join(parts), prev


__all__ = [
    "FWD_STAGES", "INV_STAGES", "apply_stages", "stages_sql",
]
