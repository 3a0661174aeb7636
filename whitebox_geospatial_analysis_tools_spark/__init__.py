"""whitebox_geospatial_analysis_tools_spark — a PySpark-native spatial analysis engine.

A brand-new, Spark-first engine with the query/data-processing capabilities of
WhiteBox GAT (reference: maduhu/whitebox-geospatial-analysis-tools, studied at
/root/reference — semantics only, no code reuse).  The reference's single-JVM,
file-per-operator plugin model (WhiteboxAPI/src/whitebox/interfaces/WhiteboxPlugin.java:24-72)
is replaced by lazy DataFrame composition: every operator takes DataFrames and
returns a DataFrame; Catalyst + AQE pick the physical plan.

Subpackages
-----------
sources    — deterministic synthetic fixtures (pages/polygons/points/raster tiles)
functions  — cell index math (tile/hex), geometry kernels (ray-cast PIP), text fns
operators  — spatial join, kNN, zonal stats, hexbin, points→raster, raster algebra,
             focal stencils, dedup/similarity, relational stats
plans      — end-to-end pipelines (the north-star flagship)
streaming  — Structured Streaming ingestion surface
"""

__version__ = "0.1.0"
