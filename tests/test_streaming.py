"""Streaming ingestion == batch results on the same input (exactly-once)."""

import pytest
from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.sources.pages import synth_pages
from whitebox_geospatial_analysis_tools_spark.streaming import ingest


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    # several source files so the stream takes multiple micro-batches
    synth_pages(spark, 5000).repartition(5).write.parquet(src)

    stream = ingest.windowed_tile_counts(
        ingest.geocode_stream(ingest.read_pages_stream(spark, src, max_files_per_trigger=2))
    )
    assert stream.isStreaming
    ingest.run_available_now(stream, ckpt, "tile_counts_stream")
    got = spark.table("tile_counts_stream")

    batch = (
        ingest.geocode_stream(spark.read.parquet(src))
        .groupBy(F.window("warc_ts", "1 hour").alias("win"), F.col("tile_id"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(F.col("win.start").alias("win_start"), "tile_id", "n_pages")
    )
    g = {(r.win_start, r.tile_id): r.n_pages for r in got.collect()}
    b = {(r.win_start, r.tile_id): r.n_pages for r in batch.collect()}
    assert g == b and sum(g.values()) == 5000


def test_stateful_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-tile running totals survive micro-batch
    boundaries; the last emission per tile equals the batch count, and at
    least one tile emits more than once (state genuinely crossed batches)."""
    src = str(tmp_path / "pages2")
    ckpt = str(tmp_path / "ckpt2")
    synth_pages(spark, 4000).repartition(6).write.parquet(src)

    stream = ingest.stateful_tile_totals(
        ingest.geocode_stream(ingest.read_pages_stream(spark, src, max_files_per_trigger=2))
    )
    assert stream.isStreaming
    ingest.run_update_mode(stream, ckpt, "tile_totals_stream")
    got = spark.table("tile_totals_stream").toPandas()

    batch = (
        ingest.geocode_stream(spark.read.parquet(src))
        .groupBy("tile_id").agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    finals = got.groupby("tile_id")["n_total"].max()
    want = dict(zip(batch["tile_id"], batch["n"]))
    assert dict(finals) == want
    assert (got.groupby("tile_id").size() > 1).any()  # state crossed batches
    assert got.groupby("tile_id")["n_total"].apply(
        lambda s: s.is_monotonic_increasing or len(s) == 1
    ).all()


def test_streaming_dedup(spark, tmp_path):
    """Duplicate texts across micro-batches survive exactly once."""
    import pandas as pd

    from whitebox_geospatial_analysis_tools_spark.streaming import ingest

    src = tmp_path / "src"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:00:00")
    for i, batch in enumerate([
        [("u1", "alpha"), ("u2", "beta")],
        [("u3", "alpha"), ("u4", "gamma")],   # duplicate of u1's text
    ]):
        pdf = pd.DataFrame(
            {
                "url": [u for u, _ in batch],
                "warc_ts": [ts + pd.Timedelta(minutes=i)] * len(batch),
                "html": [b""] * len(batch),
                "text": [t for _, t in batch],
                "lang": ["en"] * len(batch),
            }
        )
        spark.createDataFrame(pdf, ingest.PAGES_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))
    stream = ingest.read_pages_stream(spark, str(src), max_files_per_trigger=1)
    deduped = ingest.streaming_dedup(stream)
    q = (
        deduped.select("url", "text").writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out")).select("text").toPandas()
    assert sorted(got["text"]) == ["alpha", "beta", "gamma"]


def test_streaming_near_dup_across_batches(spark, tmp_path):
    """Minhash-LSH bucket state crosses micro-batches: a near-copy arriving
    in a LATER batch is flagged against the first batch's occupant, and the
    flagged pair equals the batch lsh_candidate_pairs result on the union."""
    import pandas as pd

    from whitebox_geospatial_analysis_tools_spark.operators import textops

    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different text with no shared word trigrams at all"
    third = "yet another unrelated document body for the second batch here"
    src = tmp_path / "src3"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:00:00")
    for i, batch in enumerate([
        [("u1", base), ("u2", other)],
        [("u3", base), ("u4", third)],   # u3 = near-copy of batch-1's u1
    ]):
        pdf = pd.DataFrame({
            "url": [u for u, _ in batch],
            "warc_ts": [ts + pd.Timedelta(minutes=i)] * len(batch),
            "html": [b""] * len(batch),
            "text": [t for _, t in batch],
            "lang": ["en"] * len(batch),
        })
        spark.createDataFrame(pdf, ingest.PAGES_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))

    stream = ingest.read_pages_stream(spark, str(src), max_files_per_trigger=1) \
        .withColumn("doc_id", F.expr("CAST(substring(url, 2) AS LONG)"))
    flagged = ingest.streaming_near_dup(stream)
    assert flagged.isStreaming
    ingest.run_update_mode(flagged, str(tmp_path / "ckpt3"), "near_dup_stream")
    got = spark.table("near_dup_stream").toPandas()

    # u3 flagged against u1 in every band (identical shingle sets)
    assert set(zip(got["doc_id"], got["dup_of"])) == {(3, 1)}
    assert sorted(got["band"]) == [0, 1, 2, 3]

    # batch twin agrees on the candidate pair set
    docs = spark.read.parquet(str(src)) \
        .withColumn("doc_id", F.expr("CAST(substring(url, 2) AS LONG)"))
    pairs = textops.lsh_candidate_pairs(docs).toPandas()
    assert set(zip(pairs["d1"], pairs["d2"])) == {(1, 3)}


def test_streaming_paragraph_dedup_across_batches(spark, tmp_path):
    """Block-hash state crosses micro-batches: a 20-token block arriving in
    a LATER batch is flagged against the first batch's occurrence, and the
    flagged set equals the batch paragraph_dedup dup count on the union."""
    import pandas as pd

    from whitebox_geospatial_analysis_tools_spark.operators import textops

    blk_a = " ".join(f"a{i}" for i in range(textops.PARA_BLOCK))
    blk_b = " ".join(f"b{i}" for i in range(textops.PARA_BLOCK))
    blk_c = " ".join(f"c{i}" for i in range(textops.PARA_BLOCK))
    src = tmp_path / "srcp"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:00:00")
    for i, batch in enumerate([
        [("u1", blk_a + " " + blk_b)],
        [("u2", blk_c + " " + blk_a)],   # u2's SECOND block dups u1's first
    ]):
        pdf = pd.DataFrame({
            "url": [u for u, _ in batch],
            "warc_ts": [ts + pd.Timedelta(minutes=i)] * len(batch),
            "html": [b""] * len(batch),
            "text": [t for _, t in batch],
            "lang": ["en"] * len(batch),
        })
        spark.createDataFrame(pdf, ingest.PAGES_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))

    stream = ingest.read_pages_stream(spark, str(src), max_files_per_trigger=1) \
        .withColumn("doc_id", F.expr("CAST(substring(url, 2) AS LONG)"))
    flagged = ingest.streaming_paragraph_dedup(stream)
    assert flagged.isStreaming
    ingest.run_update_mode(flagged, str(tmp_path / "ckptp"), "para_dedup_stream")
    got = spark.table("para_dedup_stream").toPandas()

    # exactly one dup: u2's block idx 1 against u1's block idx 0
    assert list(zip(got["doc_id"], got["idx"], got["dup_of_doc"],
                    got["dup_of_idx"])) == [(2, 1, 1, 0)]

    # batch twin agrees on the dup count
    docs = spark.read.parquet(str(src)) \
        .withColumn("doc_id", F.expr("CAST(substring(url, 2) AS LONG)")) \
        .select("doc_id", "text")
    batch = {r["doc_id"]: r["n_dup_blocks"]
             for r in textops.paragraph_dedup(docs).collect()}
    assert batch == {1: 0, 2: 1}


def test_streaming_paragraph_dedup_ttl_wiring(spark, tmp_path):
    """state_ttl wires EventTimeTimeout + watermark end-to-end: with a TTL
    far longer than the batch gap nothing evicts, so the flagged output
    equals the NoTimeout run on the same two-batch fixture."""
    import pandas as pd

    from whitebox_geospatial_analysis_tools_spark.operators import textops

    blk_a = " ".join(f"a{i}" for i in range(textops.PARA_BLOCK))
    src = tmp_path / "srct"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:00:00")
    for i, batch in enumerate([[("u1", blk_a)], [("u2", blk_a)]]):
        pdf = pd.DataFrame({
            "url": [u for u, _ in batch],
            "warc_ts": [ts + pd.Timedelta(minutes=i)] * len(batch),
            "html": [b""] * len(batch),
            "text": [t for _, t in batch],
            "lang": ["en"] * len(batch),
        })
        spark.createDataFrame(pdf, ingest.PAGES_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))

    stream = ingest.read_pages_stream(spark, str(src), max_files_per_trigger=1) \
        .withColumn("doc_id", F.expr("CAST(substring(url, 2) AS LONG)"))
    flagged = ingest.streaming_paragraph_dedup(stream, state_ttl="30 days")
    ingest.run_update_mode(flagged, str(tmp_path / "ckptt"), "para_ttl_stream")
    got = spark.table("para_ttl_stream").toPandas()
    assert list(zip(got["doc_id"], got["idx"], got["dup_of_doc"],
                    got["dup_of_idx"])) == [(2, 0, 1, 0)]


def test_streaming_corpus_filter_gates_and_state(spark, tmp_path):
    """End-to-end streaming filter: the per-row HOF gates match an
    independent Python replay (classifier score, dup-trigram fraction,
    distinct-word ratio), failing docs never reach the dedup state, and
    block-hash state crosses micro-batches (a later batch's duplicate
    block is dropped against the first batch's occurrence)."""
    import hashlib

    import pandas as pd

    from whitebox_geospatial_analysis_tools_spark.operators import textops

    # independent gate oracle (the batch quality_classifier /
    # repetition_metrics formulas, replayed in pure Python)
    def _th(t):
        return (len(t) * 2654435761 + ord(t[0]) * 97 + ord(t[-1]) * 31) \
            % 2147483648

    def _score(text):
        ws = [w for w in text.split(" ") if w]
        return sum((_th(w) * 48271) % 2147483648 - 1073741824
                   for w in ws) / len(ws) / 1073741824

    blk_a = " ".join(f"a{i}" for i in range(textops.PARA_BLOCK))
    blk_b = " ".join(f"b{i}" for i in range(textops.PARA_BLOCK))
    blk_c = " ".join(f"c{i}" for i in range(textops.PARA_BLOCK))
    doc1 = blk_a + " " + blk_b            # passes all gates
    doc2 = ("x y z " * 14).strip()        # fails dup_trigram + dwr gates
    doc3 = blk_c + " " + blk_a            # passes gates; blk_a dups doc1
    doc4 = ("zz " * 30).strip()           # fails distinct-word-ratio gate
    assert _score(doc1) > -0.05 and _score(doc3) > -0.05  # fixture sanity

    src = tmp_path / "srccf"
    src.mkdir()
    ts = pd.Timestamp("2026-01-01 00:00:00")
    for i, batch in enumerate([[("u1", doc1), ("u2", doc2)],
                               [("u3", doc3), ("u4", doc4)]]):
        pdf = pd.DataFrame({
            "url": [u for u, _ in batch],
            "warc_ts": [ts + pd.Timedelta(minutes=i)] * len(batch),
            "html": [b""] * len(batch),
            "text": [t for _, t in batch],
            "lang": ["en"] * len(batch),
        })
        spark.createDataFrame(pdf, ingest.PAGES_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(src))

    stream = ingest.read_pages_stream(spark, str(src), max_files_per_trigger=1) \
        .withColumn("doc_id", F.expr("CAST(substring(url, 2) AS LONG)"))
    kept = ingest.streaming_corpus_filter(stream)
    assert kept.isStreaming
    ingest.run_update_mode(kept, str(tmp_path / "ckptcf"), "cf_stream")
    got = sorted((r["h"], r["doc_id"], r["idx"])
                 for r in spark.table("cf_stream").collect())

    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    exp = sorted([(h(blk_a), 1, 0), (h(blk_b), 1, 1), (h(blk_c), 3, 0)])
    assert got == exp  # doc3's blk_a dropped cross-batch; doc2/doc4 gated

    # the streaming HOF gate values equal the batch operators bitwise
    docs = spark.read.parquet(str(src)) \
        .withColumn("doc_id", F.expr("CAST(substring(url, 2) AS LONG)")) \
        .select("doc_id", "text")
    gates = {r["doc_id"]: r for r in
             ingest.corpus_gate_columns(docs).collect()}
    rep = {r["doc_id"]: r for r in
           textops.repetition_metrics(docs).collect()}
    for d in (1, 2, 3, 4):
        assert gates[d]["dup_trigram_frac"] == rep[d]["dup_trigram_frac"], d
        assert gates[d]["distinct_word_ratio"] == rep[d]["distinct_word_ratio"], d
        assert gates[d]["score"] == pytest.approx(_score(gates[d]["text"]), abs=0)
