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
from .operators.raster import cell_value_sql as _cvs
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


# -- as-of join: latest prior 'login'-class event per event (§custom ops) -----
@Q.register(
    "asof_join",
    "WITH logins AS (SELECT user_id, ts, event_id AS login_id FROM events "
    "WHERE event_type = 'view'), "
    "j AS (SELECT e.event_id, e.user_id, e.ts, l.login_id, "
    "ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY l.ts DESC, l.login_id DESC) AS rn "
    "FROM events e JOIN logins l ON l.user_id = e.user_id AND l.ts <= e.ts) "
    "SELECT event_id, user_id, login_id AS login_id_asof FROM j WHERE rn = 1 "
    "ORDER BY event_id",
)
def q_asof_join(spark, sf):
    from .operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf}/events.parquet")
    logins = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("login_id")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"), logins,
        key="user_id", ts="ts", right_cols=["login_id"],
    )
    return (
        out.where(F.col("login_id_asof").isNotNull())
        .select("event_id", "user_id", "login_id_asof")
        .orderBy("event_id")
    )


# -- broadcast range join: value -> bucket label ------------------------------
_BUCKETS = [(0.0, 5.0, "low"), (5.0, 20.0, "mid"), (20.0, 1e9, "high")]
_BUCKET_SQL = ", ".join(
    f"(CAST({lo!r} AS DOUBLE), CAST({hi!r} AS DOUBLE), '{lab}')" for lo, hi, lab in _BUCKETS
)


@Q.register(
    "range_join_buckets",
    f"WITH b AS (SELECT * FROM (VALUES {_BUCKET_SQL}) t(lo, hi, lab)) "
    "SELECT b.lab, COUNT(*) AS n, CAST(ROUND(SUM(e.value), 6) AS DOUBLE) AS total "
    "FROM events e JOIN b ON e.value >= b.lo AND e.value < b.hi "
    "GROUP BY 1 ORDER BY 1",
)
def q_range_join_buckets(spark, sf):
    from .operators.temporal import range_join

    ev = spark.read.parquet(f"{sf}/events.parquet")
    b = spark.createDataFrame(_BUCKETS, "lo double, hi double, lab string")
    return (
        range_join(ev, b, "value")
        .groupBy("lab")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 6).cast("double").alias("total"))
        .orderBy("lab")
    )


# -- point probe into the tile raster (ExtractValuesAtXYCoords, §2.2) ---------
@Q.register(
    "point_probe",
    f"WITH {Q.pts_cte()}, ras AS (SELECT r.r AS row, c.c AS col, "
    f"{_cvs('r.r', 'c.c', 0, 360)} AS value FROM range(0, 180) r(r), range(0, 360) c(c)) "
    "SELECT p.doc_id, r.value AS probe_val FROM pts p "
    "JOIN ras r ON r.row = CAST(FLOOR(p.lat) AS BIGINT) "
    "AND r.col = CAST(FLOOR(p.lon) AS BIGINT) "
    "ORDER BY p.doc_id",
)
def q_point_probe(spark, sf):
    """Probe each point into the tile-array raster: compute the point's
    (tile_row, tile_col, offset), equi-join the tile table, element_at into
    the values array — no cell explosion (the at-scale probe path)."""
    from .operators import raster as R2

    tiles = R2.synth_raster(spark, 180, 360)
    pts = Q._points(spark, sf).select(
        "doc_id",
        F.expr("CAST(FLOOR(lat) AS BIGINT)").alias("prow"),
        F.expr("CAST(FLOOR(lon) AS BIGINT)").alias("pcol"),
    )
    t = tiles.select(
        "row0", "col0", "h", "w", "values",
        (F.col("row0") / R2.TILE).cast("long").alias("trow"),
        (F.col("col0") / R2.TILE).cast("long").alias("tcol"),
    )
    j = pts.withColumn("trow", (F.col("prow") / R2.TILE).cast("long")).withColumn(
        "tcol", (F.col("pcol") / R2.TILE).cast("long")
    ).join(t, ["trow", "tcol"])
    return (
        j.select(
            "doc_id",
            F.expr(
                "element_at(values, CAST((prow - row0) * w + (pcol - col0) + 1 AS INT))"
            ).alias("probe_val"),
        )
        .orderBy("doc_id")
    )
