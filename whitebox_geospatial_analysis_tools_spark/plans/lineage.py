"""Per-partition lineage, metrics, and resumable checkpointed writes.

North-rule requirement: "each partition writes lineage records and row/byte
metrics ... so jobs resume from the last committed checkpoint".

With an Iceberg catalog this is one ``df.writeTo(t).append()`` per batch —
the lineage rows ride in the same transaction and resume reads the snapshot
log.  This sandbox has no Iceberg jar, so the equivalent is built on the
parquet layout the same way Iceberg's manifest list works:

  out/
    data/pkey=<k>/...parquet     <- partitioned data files
    _lineage/batch-<k0>-<k1>.parquet  <- manifest: one row per logical
                                         partition committed by that batch

A batch is committed IFF its manifest file exists (manifest written strictly
after the data write returns); a crash between data and manifest leaves
orphan data dirs that the next run simply overwrites (dynamic partition
overwrite -> idempotent).  Resume = set-difference of requested partition
keys against the committed manifest union — the "anti-join committed
partition ids" plan from SURVEY.md §7.7.

Lineage row schema:
  pkey bigint        — logical partition key (e.g. tile_y band)
  n_rows bigint      — rows written for that partition
  n_bytes bigint     — bytes on disk for that partition dir
  wall_ms bigint     — wall time of the batch that wrote it
  batch_id string    — "<k0>-<k1>" (ordered, deterministic)
  input_desc string  — free-form input provenance
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_DIR = "_lineage"
DATA_DIR = "data"


def committed_keys(spark: SparkSession, out_dir: str) -> set[int]:
    ldir = os.path.join(out_dir, LINEAGE_DIR)
    if not os.path.isdir(ldir) or not any(
        f.endswith(".parquet") for f in os.listdir(ldir)
    ):
        return set()
    rows = spark.read.parquet(ldir).select("pkey").collect()
    return {r.pkey for r in rows}


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, LINEAGE_DIR))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def run_resumable(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    pkey_col: str,
    all_keys: list[int],
    *,
    batch_size: int = 8,
    input_desc: str = "",
) -> dict:
    """Write ``df`` partitioned by ``pkey_col``, committing lineage per batch.

    Already-committed partition keys are skipped entirely (their source rows
    are never recomputed — the filter prunes them at the scan).  Returns a
    summary dict {written_keys, skipped_keys, batches}.
    """
    os.makedirs(os.path.join(out_dir, LINEAGE_DIR), exist_ok=True)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = committed_keys(spark, out_dir)
    todo = sorted(set(all_keys) - done)
    data_path = os.path.join(out_dir, DATA_DIR)
    batches = 0
    for i in range(0, len(todo), batch_size):
        keys = todo[i:i + batch_size]
        t0 = time.time()
        part = df.where(F.col(pkey_col).isin([int(k) for k in keys]))
        part.write.mode("overwrite").partitionBy(pkey_col).parquet(data_path)
        wall_ms = int((time.time() - t0) * 1000)
        counts = {
            r[pkey_col]: r["cnt"]
            for r in spark.read.parquet(data_path)
            .where(F.col(pkey_col).isin([int(k) for k in keys]))
            .groupBy(pkey_col).agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        batch_id = f"{keys[0]}-{keys[-1]}"
        rows = [
            (
                int(k),
                int(counts.get(k, 0)),
                _dir_bytes(os.path.join(data_path, f"{pkey_col}={k}")),
                wall_ms,
                batch_id,
                input_desc,
            )
            for k in keys
        ]
        manifest = spark.createDataFrame(
            rows,
            "pkey long, n_rows long, n_bytes long, wall_ms long, "
            "batch_id string, input_desc string",
        )
        # manifest written AFTER the data commit: its existence IS the commit
        manifest.coalesce(1).write.mode("append").parquet(
            os.path.join(out_dir, LINEAGE_DIR)
        )
        batches += 1
    return {"written_keys": todo, "skipped_keys": sorted(done), "batches": batches}
