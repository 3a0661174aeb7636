"""Bounded lifetime for persisted mid-plan intermediates.

Operators that ``persist()`` a DataFrame inside a returned lazy plan (kNN
pass-1 candidates, etc.) cannot unpersist it before the caller materializes
the result.  They register it here instead; the next call into the same
operator family — or an explicit :func:`release` — unpersists prior scratch
for the live Spark application, so executor storage does not accumulate
across a long multi-query session.  Keys are applicationIds (stable tokens),
never Python object ids, so a stop()+restart cycle in one process cannot
alias entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCRATCH: dict[str, list[DataFrame]] = {}


def track(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for deferred release."""
    _SCRATCH.setdefault(spark.sparkContext.applicationId, []).append(df)
    return df


def release(spark: SparkSession) -> None:
    """Unpersist all tracked scratch (live app), drop dead-app entries."""
    app = spark.sparkContext.applicationId
    for df in _SCRATCH.pop(app, []):
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    for k in [k for k in _SCRATCH if k != app]:
        _SCRATCH.pop(k)
