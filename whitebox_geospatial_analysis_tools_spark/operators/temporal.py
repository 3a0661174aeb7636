"""Temporal joins the reference lacks but a web-scale pipeline needs.

SURVEY.md §2.3 notes the reference has no as-of/interval joins; the engine
brief lists them as first-class custom operators.  Both are implemented as
compositions of existing DataFrame ops (no UDFs):

  asof_join   union-tag-window: tag left/right rows, union, per-key window
              ordered by (ts, tag) carrying last_value(right) forward —
              one shuffle by key, no range explosion, the standard
              distributed as-of shape.
  range_join  small bucket table broadcast + BETWEEN predicate join
              (Catalyst turns broadcast+range into a nested-loop over the
              tiny side — no shuffle of the big side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *, key: str, ts: str,
              right_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each left row: columns of the LATEST right row with
    right.ts <= left.ts and same key (strictly-ordered tie-break: right
    rows at the same ts sort before left, so equal timestamps match)."""
    l = left.withColumn("_tag", F.lit(1))
    r = right.select(
        key, ts, *[F.col(c).alias(c + suffix) for c in right_cols]
    ).withColumn("_tag", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        # final right-value sort keys: right rows sharing (key, ts) would
        # otherwise carry forward a nondeterministic value; ascending + last()
        # = the LARGEST right value wins, matching the oracle's
        # ORDER BY ts DESC, value DESC ... rn = 1 tie-break
        .orderBy(F.col(ts).asc(), F.col("_tag").asc(),
                 *[F.col(c + suffix).asc_nulls_first() for c in right_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_cols:
        u = u.withColumn(
            c + suffix, F.last(F.col(c + suffix), ignorenulls=True).over(w)
        )
    return u.where(F.col("_tag") == 1).drop("_tag")


def range_join(facts: DataFrame, buckets: DataFrame, value_col: str,
               lo: str = "lo", hi: str = "hi") -> DataFrame:
    """facts x broadcast(buckets) on lo <= value < hi."""
    return facts.join(
        F.broadcast(buckets),
        (F.col(value_col) >= F.col(lo)) & (F.col(value_col) < F.col(hi)),
        "inner",
    )
