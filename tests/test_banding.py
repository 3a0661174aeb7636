"""Dedup/ANN band-width properties (VERDICT r2 next-round #4).

Wider bands must shrink the largest bucket's population share (the quantity
that turns banded self-joins quadratic at web scale), and the simhash
banding must stay pigeonhole-complete for hamming <= 3 when uncapped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from whitebox_geospatial_analysis_tools_spark.operators import simsearch, textops


def _docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


def _emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def _max_share(df, key_cols):
    n = df.count()
    mx = (
        df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("bn"))
        .agg(F.max("bn")).collect()[0][0]
    )
    return mx / n


def test_simhash_band_share_shrinks(spark):
    docs = _docs(spark)
    wide = textops._simhash_bands(docs, textops.SIMHASH_BITS, textops.SIMHASH_BANDS)
    narrow = textops._simhash_bands(docs, 24, 3)  # the round-2 8-bit layout
    assert _max_share(wide, ["band", "key"]) < _max_share(narrow, ["band", "key"])


def test_embed_plane_share_shrinks(spark):
    emb = _emb(spark)
    wide = simsearch.lsh_buckets(emb, n_planes=simsearch.N_PLANES)
    narrow = simsearch.lsh_buckets(emb, n_planes=8)  # the round-2 layout
    assert _max_share(wide, ["bucket"]) < _max_share(narrow, ["bucket"])


def test_simhash_banding_pigeonhole_complete(spark):
    """Uncapped banded candidates == brute-force pairs at hamming <= 3."""
    docs = _docs(spark).where(F.col("doc_id") < 200)
    banded = textops.simhash_near_pairs(docs, max_bucket=1 << 60).toPandas()
    s = textops.simhash(docs)
    a = s.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("h1"))
    b = s.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("h2"))
    brute = (
        a.join(b, F.col("d1") < F.col("d2"))
        .withColumn("hamming", F.expr("bit_count(h1 ^ h2)").cast("long"))
        .where(F.col("hamming") <= 3)
        .select("d1", "d2", "hamming")
        .orderBy("d1", "d2")
        .toPandas()
    )
    assert banded.reset_index(drop=True).equals(brute.reset_index(drop=True))


def test_drop_accounting_consistent(spark):
    """pairs_dropped in the stats equals the uncapped-minus-capped candidate
    delta per band bucket population (no silent caps)."""
    docs = _docs(spark)
    stats = textops.simhash_bucket_stats(docs).toPandas()
    bl = textops._simhash_bands(docs, textops.SIMHASH_BITS, textops.SIMHASH_BANDS)
    per = bl.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bn")).toPandas()
    for _, row in stats.iterrows():
        hot = per[(per["band"] == row["band"]) & (per["bn"] > textops.MAX_BUCKET)]
        assert row["n_hot"] == len(hot)
        assert row["pairs_dropped"] == int((hot["bn"] * (hot["bn"] - 1) // 2).sum())
