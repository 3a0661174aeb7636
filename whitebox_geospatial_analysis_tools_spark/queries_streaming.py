"""Driver-facing registry entries for the STREAMING surface (§2.15).

VERDICT r3 next-round #9: the streaming operators were pytest-only; these
entries run the real Structured Streaming plans (file source ->
Trigger.AvailableNow -> memory sink, the bounded stand-in documented in
streaming/ingest.py) and compare the drained sink against a batch-semantics
DuckDB oracle.  Determinism notes per query:

- streaming_dedup: WHICH duplicate row survives dropDuplicatesWithinWatermark
  depends on partition order, but the surviving content-hash SET does not —
  the registered output is the hash set.  The source is split into several
  files with maxFilesPerTrigger=2, so the state genuinely crosses
  micro-batches (the watermark never evicts within the bounded run).
- streaming_near_dup: bucket-first is min(doc_id) within a micro-batch, so
  the run uses a single batch (all files in one trigger) to make dup_of the
  global bucket minimum = the batch-LSH semantics; cross-batch first-seen
  behavior stays covered by tests/test_streaming.py.
- streaming_tile_counts: watermarked 1-hour windowed counts; final counts in
  complete mode are batch-equal regardless of batch split.

Each run stages the documents table into a fresh temp dir (the file-source
stand-in for Iceberg/Kafka) and uses a fresh checkpoint dir — availableNow
is exactly-once per checkpoint, so a reused checkpoint would drain nothing.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from . import queries as Q
from .functions import cells
from .streaming import ingest

# deterministic synthetic event time: epoch base + 37 s per doc id
_TS0 = "2026-01-01 00:00:00"
_TS_SPARK = f"timestampadd(SECOND, doc_id * 37, TIMESTAMP '{_TS0}')"
_TS_DUCK = f"TIMESTAMP '{_TS0}' + (doc_id * 37) * INTERVAL 1 SECOND"

from .queries_text import _SHINGLE_CTE  # the one shingle definition


def _stage(spark, sf, n_files: int):
    """Write (doc_id, text) to a fresh temp dir as the file-source input."""
    src = tempfile.mkdtemp(prefix="strm_src_")
    ckpt = tempfile.mkdtemp(prefix="strm_ckpt_")
    (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .repartition(n_files)
        .write.mode("overwrite").parquet(src)
    )
    return src, ckpt


def _drain(df, ckpt: str, name: str, mode: str) -> None:
    spark = df.sparkSession
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@Q.register(
    "streaming_dedup",
    "SELECT DISTINCT md5(text) AS content_hash FROM documents ORDER BY 1",
)
def q_streaming_dedup(spark, sf):
    """Exact streaming dedup: the survivors' content-hash set equals the
    batch DISTINCT md5(text) — state crosses micro-batches (4 files, 2 per
    trigger; the 1 h watermark never evicts inside the bounded run)."""
    src, ckpt = _stage(spark, sf, n_files=4)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2).parquet(src)
        .withColumn("warc_ts", F.expr(_TS_SPARK))
    )
    deduped = ingest.streaming_dedup(stream)
    _drain(deduped.select("content_hash"), ckpt, "strm_dedup_sink", "append")
    return spark.table("strm_dedup_sink").select("content_hash") \
        .distinct().orderBy("content_hash")


@Q.register(
    "streaming_near_dup",
    f"""WITH {_SHINGLE_CTE},
b AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(band)),
hh AS (SELECT doc_id, band, md5(band || ':' || shingle) AS h FROM sh, b),
sig AS (SELECT doc_id, band, MIN(h) AS minh FROM hh GROUP BY 1, 2),
f AS (SELECT band, minh, MIN(doc_id) AS dup_of FROM sig GROUP BY 1, 2)
SELECT s.band, s.minh, s.doc_id, f.dup_of
FROM sig s JOIN f ON s.band = f.band AND s.minh = f.minh
WHERE s.doc_id != f.dup_of ORDER BY 1, 2, 3""",
)
def q_streaming_near_dup(spark, sf):
    """Streaming minhash-LSH near-dup flags (applyInPandasWithState keyed
    by bucket) == the batch bucket-join: every non-first bucket occupant is
    flagged against the bucket min.  Single trigger so the in-batch first
    pick (min doc_id) is the global bucket minimum — deterministic;
    cross-batch state is pytest-covered (test_streaming)."""
    src, ckpt = _stage(spark, sf, n_files=2)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .withColumn("warc_ts", F.expr(_TS_SPARK))
    )
    flagged = ingest.streaming_near_dup(stream)
    _drain(flagged, ckpt, "strm_neardup_sink", "update")
    return spark.table("strm_neardup_sink") \
        .select("band", "minh", "doc_id", "dup_of") \
        .orderBy("band", "minh", "doc_id")


@Q.register(
    "streaming_tile_counts",
    f"""WITH {Q.pts_cte()}
SELECT strftime(date_trunc('hour', {_TS_DUCK}), '%Y-%m-%d %H:%M:%S') AS win_start,
  tile_id, COUNT(*) AS n_pages
FROM pts GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_streaming_tile_counts(spark, sf):
    """Watermarked 1-hour windowed tile counts over the stream == the batch
    hour-truncated grouping (complete-mode final state)."""
    src, ckpt = _stage(spark, sf, n_files=4)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 2).parquet(src)
        .withColumn("warc_ts", F.expr(_TS_SPARK))
    )
    pts = cells.with_tile(cells.with_geocode(stream, key="doc_id"))
    counts = ingest.windowed_tile_counts(pts)
    _drain(counts, ckpt, "strm_tiles_sink", "complete")
    return (
        spark.table("strm_tiles_sink")
        .select(
            F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "tile_id", "n_pages",
        )
        .orderBy("win_start", "tile_id")
    )


from .operators.textops import PARA_BLOCK as _PB


@Q.register(
    "streaming_paragraph_dedup",
    f"""WITH wrd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bl AS (SELECT doc_id, w, unnest(generate_series(0, (len(w) - 1) // {_PB})) AS idx FROM wrd),
blk AS (SELECT doc_id, idx,
        md5(array_to_string(list_slice(w, idx * {_PB} + 1, idx * {_PB} + {_PB}), ' ')) AS h
        FROM bl),
r AS (SELECT doc_id, CAST(idx AS INT) AS idx, h,
      ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn,
      FIRST_VALUE(doc_id) OVER (PARTITION BY h ORDER BY doc_id, idx) AS dup_of_doc,
      CAST(FIRST_VALUE(idx) OVER (PARTITION BY h ORDER BY doc_id, idx) AS INT) AS dup_of_idx
      FROM blk)
SELECT h, doc_id, idx, dup_of_doc, dup_of_idx
FROM r WHERE rn > 1 ORDER BY h, doc_id, idx""",
)
def q_streaming_paragraph_dedup(spark, sf):
    """Streaming CCNet paragraph dedup (cross-batch first-seen block state)
    == the batch first-occurrence rule: single trigger so the in-batch min
    (doc_id, idx) is the global first occurrence — deterministic;
    cross-batch state is pytest-covered (test_streaming)."""
    src, ckpt = _stage(spark, sf, n_files=2)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .withColumn("warc_ts", F.expr(_TS_SPARK))
    )
    flagged = ingest.streaming_paragraph_dedup(stream)
    _drain(flagged, ckpt, "strm_paradedup_sink", "update")
    return spark.table("strm_paradedup_sink") \
        .select("h", "doc_id", "idx", "dup_of_doc", "dup_of_idx") \
        .orderBy("h", "doc_id", "idx")


from .queries_text import _QC_SQL as _QCS, _REP_SQL as _REPS


@Q.register(
    "streaming_corpus_filter",
    f"""WITH g AS (SELECT d.doc_id, d.text FROM documents d
  JOIN ({_REPS}) r USING (doc_id)
  JOIN ({_QCS}) qc USING (doc_id)
  WHERE qc.score > -0.05e0 AND r.dup_trigram_frac <= 0.2e0
    AND r.distinct_word_ratio >= 0.3e0),
wrd AS (SELECT doc_id, string_split(text, ' ') AS w FROM g),
bl AS (SELECT doc_id, w, unnest(generate_series(0, (len(w) - 1) // {_PB})) AS idx FROM wrd),
blk AS (SELECT doc_id, idx,
        md5(array_to_string(list_slice(w, idx * {_PB} + 1, idx * {_PB} + {_PB}), ' ')) AS h
        FROM bl),
r2 AS (SELECT doc_id, CAST(idx AS INT) AS idx, h,
       ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn FROM blk)
SELECT h, doc_id, idx FROM r2 WHERE rn = 1 ORDER BY h, doc_id, idx""",
)
def q_streaming_corpus_filter(spark, sf):
    """The full streaming training-data filter (per-row classifier +
    repetition gates, then cross-batch first-seen block dedup) == the batch
    chain: gate predicates are bitwise-identical HOF re-expressions of the
    corpus_filter2 stages, and with a single trigger the in-batch first
    pick (min (doc_id, idx)) is the global first occurrence.  Cross-batch
    state is pytest-covered (test_streaming)."""
    src, ckpt = _stage(spark, sf, n_files=2)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .withColumn("warc_ts", F.expr(_TS_SPARK))
    )
    kept = ingest.streaming_corpus_filter(stream)
    _drain(kept, ckpt, "strm_cf_sink", "update")
    return spark.table("strm_cf_sink") \
        .select("h", "doc_id", "idx").orderBy("h", "doc_id", "idx")
