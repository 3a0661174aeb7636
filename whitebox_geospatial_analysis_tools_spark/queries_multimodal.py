"""Multimodal + events query registry entries.

media_features / media_frames exercise the binary-payload mapInPandas
plumbing (operators/multimodal.py) with deterministic stub decode — the
oracle reproduces the byte-length-derived features in SQL, so the whole
binary Arrow path is value-checked, not just smoke-checked.

Events queries cover time-windowed aggregation, sessionization (gap rule
over lag windows) and JSON property extraction over the driver-provided
``events`` table.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import queries as Q
from .functions.exprs import A, C, M
from .operators import multimodal as MM

_N_MEDIA = 400

# payload = 'HDR' + (32 + (id*37)%200) repeated chars -> length 35 + (id*37)%200
_MEDIA_CTE = (
    f"media AS (SELECT t.i AS media_id, "
    f"list_extract(['image','image','image','audio','video'], CAST(1 + t.i % 5 AS INT)) AS kind, "
    f"35 + (t.i * 37) % 200 AS plen FROM range(0, {_N_MEDIA}) t(i)), "
    f"feat AS (SELECT media_id, kind, (plen * {A} + {C}) % {M} AS u FROM media)"
)


@Q.register(
    "media_features",
    f"WITH {_MEDIA_CTE} SELECT media_id, kind, "
    "CAST(16 + u % 512 AS INT) AS width, "
    "CAST(16 + (u // 512) % 512 AS INT) AS height, "
    "(u % 100000) / 1000e0 AS mean_val FROM feat ORDER BY media_id",
)
def q_media_features(spark, sf):
    return MM.decode_features(MM.synth_media(spark, _N_MEDIA)).orderBy("media_id")


@Q.register(
    "media_frames",
    f"WITH {_MEDIA_CTE} SELECT media_id, CAST(f.j AS INT) AS frame_idx, "
    "f.j * 16 AS byte_offset FROM media, "
    "LATERAL (SELECT unnest(generate_series(0, plen // 16 - 1, 10)) AS j) f "
    "WHERE kind = 'video' ORDER BY media_id, frame_idx",
)
def q_media_frames(spark, sf):
    return (
        MM.frame_sample(MM.synth_media(spark, _N_MEDIA), every_n=10)
        .orderBy("media_id", "frame_idx")
    )


# -- events table -------------------------------------------------------------
@Q.register(
    "events_hourly",
    "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, COUNT(*) AS n, "
    "CAST(ROUND(SUM(value), 6) AS DOUBLE) AS total_value "
    "FROM events GROUP BY 1, 2 ORDER BY 1, 2",
)
def q_events_hourly(spark, sf):
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return (
        ev.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts").cast("timestamp")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).cast("double").alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


@Q.register(
    "sessionize",
    "WITH g AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
    "OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    "THEN 1 ELSE 0 END AS new_s FROM events) "
    "SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events "
    "FROM g GROUP BY 1 ORDER BY 1",
)
def q_sessionize(spark, sf):
    ev = spark.read.parquet(f"{sf}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                > 1800 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    return (
        g.groupBy("user_id")
        .agg(F.sum("new_s").cast("long").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


@Q.register(
    "json_props",
    "SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n "
    "FROM events GROUP BY 1 ORDER BY 1",
)
def q_json_props(spark, sf):
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return (
        ev.groupBy(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )
