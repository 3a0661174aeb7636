"""Cell-index Column helpers — all JVM-side Catalyst expressions, zero UDFs.

Wraps :mod:`.exprs` (the shared Spark/DuckDB formula strings) into DataFrame
helpers.  The reference builds kd-trees for nearest-center hex assignment
(Scripts/HexBinning.groovy:202) and tile grids by floor arithmetic
(Scripts/TileLasFile.groovy:166-196); here both are closed-form column math,
so cell assignment is a narrow map stage with whole-stage codegen — no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import exprs


def with_geocode(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Deterministic geocode key -> (lon, lat) with built-in hot-cell skew.

    The LCG chain is factored through real intermediate columns (_u1/_u2/_u3)
    rather than inlined macro text: textual inlining duplicates the whole
    subtree into every consumer, ballooning the single generated Java method
    past janino's 64KB limit — Spark then silently drops to interpreted mode
    for the ENTIRE stage (observed: no WholeStageCodegen span, ~4x slower and
    GC-bound).  As separate non-cheap aliases referenced multiple times,
    CollapseProject keeps them; codegen computes each once per row.  The
    DuckDB oracle keeps the equivalent fully-inlined formula (exprs.py) —
    identical math, all-integer intermediates, so results stay bit-identical.
    """
    df = df.withColumn("_u1", F.expr(exprs.u1(key)))
    df = df.withColumn("_u2", F.expr(exprs.u2_from("_u1")))
    df = df.withColumn("_u3", F.expr(exprs.u3_from("_u2")))
    return df.withColumns(
        {
            "lon": F.expr(exprs.lon_from("_u1", "_u3")),
            "lat": F.expr(exprs.lat_from("_u2", "_u3")),
        }
    ).drop("_u1", "_u2", "_u3")


def with_url_geocode(df: DataFrame, url: str = "url") -> DataFrame:
    """Production geocode: xxhash64(url) -> nonneg key -> same LCG chain.

    xxhash64 is a JVM built-in; downstream math identical to the doc_id path.
    """
    df = df.withColumn("_gkey", F.expr(f"abs(xxhash64({url})) % {exprs.M}"))
    return with_geocode(df, key="_gkey").drop("_gkey")


def with_tile(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    return df.withColumns(
        {
            "tile_x": F.expr(exprs.tile_x_expr(lon)),
            "tile_y": F.expr(exprs.tile_y_expr(lat)),
            "tile_id": F.expr(exprs.tile_id_expr(lon, lat)),
        }
    )


def with_hex(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    return df.withColumns(
        {
            "hex_q": F.expr(exprs.hex_q_expr(lon, lat)),
            "hex_r": F.expr(exprs.hex_r_expr(lon, lat)),
        }
    )


def with_cells(df: DataFrame, lon: str = "lon", lat: str = "lat") -> DataFrame:
    """Hierarchical res 7-9 cells (parent/child by construction: 9 children)."""
    return df.withColumns(
        {f"cell{r}": F.expr(exprs.cell_expr(lon, lat, r)) for r in (7, 8, 9)}
    )


def ring_offsets(radius: int) -> list[tuple[int, int]]:
    """All (dx, dy) within Chebyshev distance `radius` (the square k-ring)."""
    return [
        (dx, dy)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
    ]


def explode_k_ring(df: DataFrame, radius: int, tx: str = "tile_x", ty: str = "tile_y",
                   cols: int = exprs.TILE_COLS, rows: int = exprs.TILE_ROWS) -> DataFrame:
    """Expand each row to its k-ring of neighbor cells (candidate generation).

    The reference answers kNN with an in-memory kd-tree
    (WhiteboxAPI/src/whitebox/structures/KdTree.java:438-455); distributed,
    the k-ring expansion turns proximity into an equi-join key: each query
    row fans out to (2r+1)^2 neighbor cells, then joins on cell id.
    Off-grid neighbor coordinates are dropped (they would alias onto valid
    row-major ids otherwise).
    """
    offs = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in ring_offsets(radius)]
    )
    nx = F.col(tx) + F.col("_off.dx")
    ny = F.col(ty) + F.col("_off.dy")
    return (
        df.withColumn("_off", F.explode(offs))
        .where((nx >= 0) & (nx < cols) & (ny >= 0) & (ny < rows))
        .withColumn("nbr_tile_id", ny * cols + nx)
        .drop("_off")
    )
