"""CSV table import/export (§2.1 ImportCSV/ExportTable): Spark's native
csv source round-trips the attribute-table shape losslessly with an
explicit schema (header + typed columns)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip(spark):
    src = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(500)
    )
    d = tempfile.mkdtemp(prefix="wgs_csv_")
    try:
        src.write.mode("overwrite").option("header", True).csv(d)
        back = (
            spark.read.option("header", True)
            .schema("doc_id long, lang string, n_chars long")
            .csv(d)
            .orderBy("doc_id")
        )
        a = src.toPandas().reset_index(drop=True)
        b = back.toPandas().reset_index(drop=True)
        assert a.equals(b)
    finally:
        shutil.rmtree(d, ignore_errors=True)
