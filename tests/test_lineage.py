"""Resume-from-checkpoint semantics: kill after partial commit, re-run,
assert identical final table and no duplicate lineage rows (SURVEY.md §5.5)."""

import os

import pytest
from pyspark.sql import functions as F

from whitebox_geospatial_analysis_tools_spark.plans import lineage as L
from whitebox_geospatial_analysis_tools_spark.sources.pages import points_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def pts(spark):
    return points_from_documents(spark, SF).select("doc_id", "tile_id", "lon", "lat", "tile_y")


def _keys(pts):
    return [r.tile_y for r in pts.select("tile_y").distinct().collect()]


def test_resume_after_partial_commit(spark, pts, tmp_path):
    out = str(tmp_path / "job")
    keys = sorted(_keys(pts))
    assert len(keys) >= 3

    # simulated crash: only the first batch of 2 keys commits
    r1 = L.run_resumable(spark, pts, out, "tile_y", keys[:2], batch_size=2)
    assert r1["written_keys"] == keys[:2] and r1["batches"] == 1

    # resumed run over the FULL key set: committed keys are skipped
    r2 = L.run_resumable(spark, pts, out, "tile_y", keys, batch_size=2)
    assert r2["skipped_keys"] == keys[:2]
    assert r2["written_keys"] == keys[2:]

    # final table identical to a one-shot write
    got = spark.read.parquet(os.path.join(out, L.DATA_DIR))
    assert got.count() == pts.count()
    assert (
        got.select(F.sum("doc_id")).collect()[0][0]
        == pts.select(F.sum("doc_id")).collect()[0][0]
    )

    # lineage: exactly one row per key, counts match, bytes > 0
    lin = L.read_lineage(spark, out).toPandas()
    assert sorted(lin.pkey) == keys
    assert lin.pkey.is_unique
    want = {r.tile_y: r.cnt for r in pts.groupBy("tile_y").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert {int(r.pkey): int(r.n_rows) for _, r in lin.iterrows()} == want
    assert (lin.n_bytes > 0).all()

    # idempotent third run: nothing left to do
    r3 = L.run_resumable(spark, pts, out, "tile_y", keys, batch_size=2)
    assert r3["written_keys"] == [] and r3["batches"] == 0
    assert L.read_lineage(spark, out).count() == len(keys)


def test_north_star_end_to_end(spark, tmp_path):
    """Full pipeline: geocode -> cells -> PIP left join -> lineage-committed
    partitioned write -> per-polygon counts; counts must equal the direct
    pip_counts query."""
    from whitebox_geospatial_analysis_tools_spark.plans.pipeline import run_north_star
    from whitebox_geospatial_analysis_tools_spark.operators.spatial_join import pip_counts
    from whitebox_geospatial_analysis_tools_spark.sources.pages import points_from_documents

    res = run_north_star(spark, SF, str(tmp_path / "ns"))
    want = {
        (r.poly_id, r.n_pages)
        for r in pip_counts(points_from_documents(spark, SF), spark).collect()
    }
    assert set(res["counts"]) == want and want
    assert res["summary"]["written_keys"]
    lin = L.read_lineage(spark, str(tmp_path / "ns"))
    assert lin.count() == len(res["summary"]["written_keys"])
