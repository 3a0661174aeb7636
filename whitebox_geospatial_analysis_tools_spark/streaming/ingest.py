"""Structured Streaming ingestion of the pages table.

The reference is a batch desktop tool (SURVEY.md §2.15 — no streaming
operators exist), so this surface is defined by the north star instead:
pages arrive continuously, are geocoded and cell-assigned with the SAME
Catalyst column expressions as the batch path (streaming-safe: narrow maps),
and feed watermarked windowed aggregations keyed by tile/cell.

At production scale the source is `readStream.format("iceberg")` (or Kafka)
and the sink `writeStream.toTable(...)` with checkpointing; here the tested
path uses a parquet directory source with Trigger.AvailableNow — identical
plan, bounded run, exactly-once per checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cells

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(spark: SparkSession, src_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream of pages rows (the Iceberg/Kafka stand-in)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def geocode_stream(pages: DataFrame) -> DataFrame:
    """Streaming geocode + tile/cell assignment — identical expressions to
    the batch path (functions/cells.py), so batch and stream results match
    row-for-row on the same input."""
    return cells.with_cells(cells.with_tile(cells.with_url_geocode(pages)))


def windowed_tile_counts(points: DataFrame, *, window: str = "1 hour",
                         watermark: str = "30 minutes") -> DataFrame:
    """Per-(event-time window, tile) page counts with late-data handling."""
    return (
        points.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("tile_id"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(F.col("win.start").alias("win_start"), "tile_id", "n_pages")
    )


def run_available_now(stream_df: DataFrame, checkpoint_dir: str,
                      sink_table: str) -> None:
    """Drain everything currently in the source into an in-memory sink table
    (complete mode), then stop — the bounded test/verification path."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stateful_tile_totals(points: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running per-tile
    page totals maintained across micro-batches — the engine-brief's
    'custom stateful operators' surface.  State = one BIGINT per tile; each
    trigger emits the updated cumulative count (update output mode).

    The same shape carries any cross-batch streaming state (first-seen
    dedup, per-key quotas, sessionization carry-over) at 10^12-row scale:
    state is partitioned by key, checkpointed with the query, and never
    collected to the driver."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"tile_id": [key[0]], "n_total": [total]})

    return (
        points.groupBy("tile_id")
        .applyInPandasWithState(
            fn,
            "tile_id long, n_total long",
            "n_total long",
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_update_mode(stream_df: DataFrame, checkpoint_dir: str,
                    sink_table: str) -> None:
    """Drain the source through an update-mode memory sink (stateful ops)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_dedup(pages: DataFrame, *, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on content hash (the webtext-pipeline front
    door): md5(text) within the event-time watermark via
    dropDuplicatesWithinWatermark — state for a hash is kept only one
    watermark interval, so state size is bounded by the duplicate horizon,
    not the stream length.  Batch-side twin: operators/textops.py
    dedup_exact (same hash expression), so a backfill and the live stream
    agree on survivors."""
    hashed = pages.withColumn("content_hash", F.md5(F.col("text")))
    return (
        hashed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def minhash_band_rows(pages: DataFrame, *, bands: int = 4) -> DataFrame:
    """(doc_id, warc_ts, band, minh): per-ROW minhash band signatures —
    array_min over the in-row shingle array, no explode/groupBy, so the
    expression is legal in a streaming plan and costs zero shuffle.  The
    salt scheme (md5(band || ':' || shingle)) is byte-identical to the
    batch twin operators/textops.minhash_signatures, so a live stream and
    a batch backfill land in the SAME buckets."""
    from ..operators.textops import SHINGLE_EXPR

    sh = (
        pages.withColumn("w", F.split("text", " "))
        .where(F.expr("size(w) >= 3"))
        .withColumn("_sh", F.expr(SHINGLE_EXPR))
    )
    sig = F.array(*[
        F.expr(f"array_min(transform(_sh, s -> md5(concat('{b}:', s))))")
        for b in range(bands)
    ])
    return sh.select(
        "doc_id", "warc_ts",
        F.posexplode(sig).alias("band", "minh"),
    )


def streaming_near_dup(pages: DataFrame, *, bands: int = 4) -> DataFrame:
    """Streaming NEAR-dup detection: minhash-LSH buckets with cross-batch
    first-seen state (applyInPandasWithState keyed by (band, minh)).  A
    document colliding with an earlier document in ANY band is emitted
    with dup_of = that bucket's first occupant; state is one BIGINT per
    occupied bucket, partitioned by key and checkpointed with the query —
    the streaming twin of the batch lsh_candidate_pairs path.  In-batch
    first pick is min(doc_id) (deterministic under replay)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    rows = minhash_band_rows(pages, bands=bands)

    def fn(key, pdf_iter, state):
        first = state.get[0] if state.exists else None
        docs = []
        for pdf in pdf_iter:
            docs.extend(int(d) for d in pdf["doc_id"])
        if not docs:
            return
        if first is None:
            first = min(docs)
            state.update((first,))
        yield pd.DataFrame({
            "band": [int(key[0])] * len(docs),
            "minh": [str(key[1])] * len(docs),
            "doc_id": docs,
            "dup_of": [first] * len(docs),
        })

    return (
        rows.groupBy("band", "minh")
        .applyInPandasWithState(
            fn,
            "band int, minh string, doc_id long, dup_of long",
            "first long",
            "update",
            GroupStateTimeout.NoTimeout,
        )
        .where(F.col("doc_id") != F.col("dup_of"))
    )


def paragraph_block_rows(pages: DataFrame, *, block: int | None = None) -> DataFrame:
    """(doc_id, warc_ts, idx, h): per-row fixed-block split + md5 — in-row
    transform only (no groupBy), legal in a streaming plan, zero shuffle;
    byte-identical to the batch twin operators/textops.paragraph_dedup
    (block defaults to textops.PARA_BLOCK — one constant, both surfaces)."""
    from ..operators.textops import PARA_BLOCK

    block = PARA_BLOCK if block is None else block
    return (
        pages.withColumn("w", F.split("text", " "))
        .select(
            "doc_id", "warc_ts",
            F.posexplode(F.expr(
                f"transform(sequence(0, (size(w) - 1) DIV {block}), "
                f"i -> array_join(slice(w, i * {block} + 1, {block}), ' '))"
            )).alias("idx", "blk"),
        )
        .select("doc_id", "warc_ts", "idx", F.md5("blk").alias("h"))
    )


def streaming_paragraph_dedup(pages: DataFrame, *, block: int | None = None,
                              state_ttl: str | None = None) -> DataFrame:
    """Streaming CCNet paragraph dedup: cross-batch first-seen state per
    block hash (applyInPandasWithState keyed by h).  A block whose hash was
    first seen in an EARLIER micro-batch (or earlier in (doc_id, idx) order
    within this batch) is emitted as a duplicate against that first
    occurrence; state is one (doc_id, idx) pair per distinct block hash —
    the streaming twin of the batch first-occurrence window rule.

    State bound: first-seen-EVER semantics (state_ttl=None) keeps one entry
    per distinct block hash forever — exact CCNet dedup, but state grows
    with unique corpus content.  Pass state_ttl (e.g. "30 days") to bound
    state to the duplicate horizon via event-time timeout: a block hash
    idle past the TTL is evicted and a later recurrence counts as first
    again (the same horizon tradeoff streaming_dedup makes with
    dropDuplicatesWithinWatermark)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    rows = paragraph_block_rows(pages, block=block)
    if state_ttl is not None:
        rows = rows.withWatermark("warc_ts", state_ttl)
        ttl_ms = int(pd.Timedelta(state_ttl).value // 1_000_000)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        ttl_ms = None
        timeout = GroupStateTimeout.NoTimeout

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        first = tuple(state.get) if state.exists else None
        occ = []
        max_ts = None
        for pdf in pdf_iter:
            occ.extend(zip((int(d) for d in pdf["doc_id"]),
                           (int(i) for i in pdf["idx"])))
            if ttl_ms is not None and len(pdf):
                m = pdf["warc_ts"].max()
                max_ts = m if max_ts is None else max(max_ts, m)
        if not occ:
            return
        if first is None:
            first = min(occ)
            state.update(first)
        if ttl_ms is not None and max_ts is not None:
            state.setTimeoutTimestamp(int(pd.Timestamp(max_ts).value
                                          // 1_000_000) + ttl_ms)
        yield pd.DataFrame({
            "h": [str(key[0])] * len(occ),
            "doc_id": [d for d, _ in occ],
            "idx": [i for _, i in occ],
            "dup_of_doc": [first[0]] * len(occ),
            "dup_of_idx": [first[1]] * len(occ),
        })

    return (
        rows.groupBy("h")
        .applyInPandasWithState(
            fn,
            "h string, doc_id long, idx int, dup_of_doc long, dup_of_idx int",
            "first_doc long, first_idx int",
            "update",
            timeout,
        )
        .where((F.col("doc_id") != F.col("dup_of_doc"))
               | (F.col("idx") != F.col("dup_of_idx")))
    )


# -- streaming corpus filter: the batch training-data filter chain on the
# streaming surface (VERDICT r4 next-round #8) ---------------------------------
# gate constants shared with the batch corpus_filter2 registry entry
CF_SCORE_FLOOR = "-0.05e0"   # classifier score floor
CF_DUP3_MAX = "0.2e0"        # max duplicated-trigram char fraction
CF_DWR_MIN = "0.3e0"         # min distinct-word ratio


def corpus_gate_columns(pages: DataFrame) -> DataFrame:
    """Per-row (zero-shuffle, streaming-legal) gate metrics: hashed-linear
    classifier score, duplicated-trigram char fraction, distinct-word
    ratio — higher-order-function re-expressions of the batch operators
    (quality_classifier's hash agg, repetition_metrics' explode agg).  The
    numerators are exact BIGINTs and the single double division is the same
    op, so the per-row values equal the batch values BITWISE — the
    streaming gates and the batch gates admit identical documents.

    A streaming plan allows only one stateful operator, so the gates cannot
    be shuffle aggregations; docs here are bounded web-page texts, making
    the O(words^2) in-array trigram count cheap and map-only."""
    from ..operators import textops

    th = textops.TOKEN_HASH.replace("tok", "t")
    return (
        pages
        .withColumn("w", F.split("text", " "))
        .withColumn("toks", F.expr("filter(w, t -> length(t) > 0)"))
        .withColumn("grams3", F.expr(textops._ngram_expr(3)))
        .withColumn("logit_sum", F.expr(
            f"aggregate(toks, CAST(0 AS BIGINT), "
            f"(acc, t) -> acc + (({th} * 48271) % 2147483648 - 1073741824))"))
        .withColumn("score", F.expr(
            "IF(size(toks) = 0, -1e9, "
            "CAST(logit_sum AS DOUBLE) / size(toks) / 1073741824e0)"))
        .withColumn("dupchars", F.expr(
            "aggregate(transform(array_distinct(grams3), "
            "g -> CASE WHEN size(filter(grams3, x -> x = g)) >= 2 "
            "THEN CAST(size(filter(grams3, x -> x = g)) * length(g) AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (a, v) -> a + v)"))
        .withColumn("dup_trigram_frac", F.expr(
            "IF(length(text) = 0, 0e0, CAST(dupchars AS DOUBLE) / length(text))"))
        .withColumn("distinct_word_ratio", F.expr(
            "CAST(size(array_distinct(w)) AS DOUBLE) / size(w)"))
    )


def streaming_corpus_filter(pages: DataFrame, *, block: int | None = None,
                            state_ttl: str | None = None) -> DataFrame:
    """The end-to-end streaming training-data filter: per-row quality gates
    (classifier floor + Gopher repetition gates, corpus_gate_columns) over
    the incoming pages, then cross-batch first-seen paragraph-block dedup —
    the output is the KEPT corpus as (h, doc_id, idx) block rows: exactly
    one surviving occurrence per distinct block hash among gate-passing
    documents.

    One declarative streaming plan: stateless map gates -> per-row block
    split (paragraph_block_rows, zero shuffle) -> ONE stateful operator
    (applyInPandasWithState keyed by block hash).  State is one (doc_id,
    idx) pair per distinct KEPT block hash; pass state_ttl (e.g. "30 days")
    to bound it to the duplicate horizon via event-time timeout, the same
    contract as streaming_paragraph_dedup."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gated = corpus_gate_columns(pages).where(F.expr(
        f"size(toks) > 0 AND score > {CF_SCORE_FLOOR} "
        f"AND dup_trigram_frac <= {CF_DUP3_MAX} "
        f"AND distinct_word_ratio >= {CF_DWR_MIN}"
    )).select("doc_id", "warc_ts", "text")
    rows = paragraph_block_rows(gated, block=block)
    if state_ttl is not None:
        rows = rows.withWatermark("warc_ts", state_ttl)
        ttl_ms = int(pd.Timedelta(state_ttl).value // 1_000_000)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        ttl_ms = None
        timeout = GroupStateTimeout.NoTimeout

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            return
        occ = []
        max_ts = None
        for pdf in pdf_iter:
            occ.extend(zip((int(d) for d in pdf["doc_id"]),
                           (int(i) for i in pdf["idx"])))
            if ttl_ms is not None and len(pdf):
                m = pdf["warc_ts"].max()
                max_ts = m if max_ts is None else max(max_ts, m)
        if not occ:
            return
        already = state.exists
        if not already:
            first = min(occ)
            state.update(first)
        if ttl_ms is not None and max_ts is not None:
            state.setTimeoutTimestamp(int(pd.Timestamp(max_ts).value
                                          // 1_000_000) + ttl_ms)
        if already:
            return  # hash claimed in an earlier batch: every occurrence drops
        yield pd.DataFrame({
            "h": [str(key[0])],
            "doc_id": [first[0]],
            "idx": [first[1]],
        })

    return (
        rows.groupBy("h")
        .applyInPandasWithState(
            fn,
            "h string, doc_id long, idx int",
            "first_doc long, first_idx int",
            "update",
            timeout,
        )
    )
