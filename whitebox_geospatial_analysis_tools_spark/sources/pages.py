"""Pages table (the north-star input shape) + point layers.

``input_hint`` schema: (url string, warc_ts timestamp, html binary,
text string, lang string).  Synthesized deterministically with pure Column
expressions over ``spark.range`` — JVM-side, seed-free and reproducible at any
scale (the 100 TB design: generation/ingestion is a narrow map, no shuffle).

``html`` and ``text`` are opaque pass-through columns — the engine never
casts or re-encodes them (byte-identical per-url invariant, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells, exprs

_LANGS = "array('en','en','en','en','en','en','de','fr','es','other')"
_WORDS = (
    "array('the','quick','brown','fox','jumps','over','lazy','dog','spark','tile',"
    "'join','cell','page','crawl','text','index','query','shuffle','broadcast','hex')"
)


def synth_pages(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic pages table of exactly the input_hint shape."""
    df = spark.range(0, n, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    h = f"(abs(xxhash64(cast(id as string))) % {exprs.M})"
    return df.select(
        F.expr("concat('https://host', id % 1000, '.example/p/', id)").alias("url"),
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0, id % 31536000)").alias("warc_ts"),
        F.expr("cast(concat('<html><body>', repeat('x', 16 + id % 64), '</body></html>') as binary)").alias("html"),
        F.expr(
            f"concat_ws(' ', transform(sequence(0, 19 + {h} % 30), "
            f"j -> element_at({_WORDS}, cast(1 + (({h} + j * 2654435761) % 20) as int))))"
        ).alias("text"),
        F.expr(f"element_at({_LANGS}, cast(1 + {h} % 10 as int))").alias("lang"),
    )


def geocoded_pages(spark: SparkSession, n: int) -> DataFrame:
    """pages + (lon, lat) + hierarchical cells + tile — the pipeline head."""
    return cells.with_cells(cells.with_tile(cells.with_url_geocode(synth_pages(spark, n))))


def points_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-testdata documents as a point layer (oracle-checkable geocode).

    Geocode key is ``doc_id`` (integer LCG — exprs.py), so the DuckDB oracle
    can reproduce lon/lat bit-identically in SQL.
    """
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = cells.with_geocode(df, key="doc_id")
    df = df.withColumn("val", F.expr(exprs.value_expr("doc_id")))
    return cells.with_tile(df)
