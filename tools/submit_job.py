"""spark-submit entrypoint demonstrating the north-rule deployment shape:

    cd /root/repo && zip -qr /tmp/wgs.zip whitebox_geospatial_analysis_tools_spark
    spark-submit --master 'local[8]' --py-files /tmp/wgs.zip \
        tools/submit_job.py /root/testdata/sf0.001

The package ships as a plain zip on the executors' PYTHONPATH (no native
deps, no build step); the driver script only imports and declares the plan.
On a real cluster the identical command with --master yarn/k8s and N vs 4N
executors is the two-cluster-size scaling run (BENCH/BASELINE.md evidences
the sandbox stand-in: local[8] vs local[32]).
"""

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("wgs-submit-demo").getOrCreate()

    from whitebox_geospatial_analysis_tools_spark import queries as Q

    qs = Q.all_queries()
    t0 = time.time()
    n_pip = qs["pip_counts"](spark, sf).count()
    n_tile = qs["tile_assign"](spark, sf).count()
    print(json.dumps({
        "metric": "submit_demo",
        "sf": sf,
        "pip_count_rows": n_pip,
        "tile_assign_rows": n_tile,
        "wall_s": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
