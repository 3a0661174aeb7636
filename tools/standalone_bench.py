"""Real-executor-boundary bench: a local Spark STANDALONE cluster.

VERDICT r4 next-round #4: every bench number so far is local[*] — one JVM,
no serialization, no network exchange.  This tool stands up a real
standalone cluster on this box (master + W worker JVMs x 8 cores, each
executor its own JVM) and runs the flagship ladder plus the
shuffle-heaviest headline queries through spark-submit --py-files, so the
"no N-dependent serial stage" scaling argument is exercised with real
broadcast serialization and socket shuffle exchange.

    python tools/standalone_bench.py            # 1-worker and 4-worker legs
    python tools/standalone_bench.py --workers 4   # one leg only

The N -> 4N legs (1x8 vs 4x8 separate worker JVMs on the same input) are
the closest this sandbox gets to the north rule's two-cluster-size run;
efficiency = thr_4w / (4 * thr_1w).  Prints one JSON line; results are
recorded in BENCH/BASELINE.md next to the local[*] ladder.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import urllib.request
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.path.dirname(os.path.abspath(pyspark.__file__))
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
SPARK_SUBMIT = os.path.join(SPARK_HOME, "bin", "spark-submit")
MASTER_PORT, MASTER_UI = 7077, 8091
MASTER_URL = f"spark://127.0.0.1:{MASTER_PORT}"
LOG_DIR = "/tmp/wgs-standalone"

ENV = dict(
    os.environ,
    SPARK_LOCAL_IP="127.0.0.1",
    PYSPARK_PYTHON=sys.executable,
    PYSPARK_DRIVER_PYTHON=sys.executable,
)


def _build_zip() -> str:
    path = os.path.join(LOG_DIR, "wgs.zip")
    pkg = os.path.join(REPO, "whitebox_geospatial_analysis_tools_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def _spawn(args: list[str], log: str) -> subprocess.Popen:
    out = open(os.path.join(LOG_DIR, log), "w")
    return subprocess.Popen(
        [SPARK_CLASS, *args], env=ENV, stdout=out, stderr=subprocess.STDOUT)


def _master_state() -> dict:
    with urllib.request.urlopen(
            f"http://127.0.0.1:{MASTER_UI}/json/", timeout=5) as r:
        return json.load(r)


def _wait(pred, what: str, timeout: float = 60.0) -> dict:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            st = _master_state()
            if pred(st):
                return st
        except OSError:
            pass
        time.sleep(1.0)
    raise RuntimeError(f"timed out waiting for {what}")


class Cluster:
    """Master + W workers, each a separate JVM via spark-class."""

    def __init__(self) -> None:
        self.master: subprocess.Popen | None = None
        self.workers: list[subprocess.Popen] = []

    def start_master(self) -> None:
        self.master = _spawn(
            ["org.apache.spark.deploy.master.Master", "--host", "127.0.0.1",
             "--port", str(MASTER_PORT), "--webui-port", str(MASTER_UI)],
            "master.log")
        _wait(lambda s: s.get("status") == "ALIVE", "master ALIVE")

    def set_workers(self, n: int, cores: int, mem: str) -> None:
        for p in self.workers:
            p.terminate()
        for p in self.workers:
            p.wait(timeout=30)
        self.workers = []
        _wait(lambda s: s["aliveworkers"] == 0, "workers to drain", 90)
        for i in range(n):
            wd = os.path.join(LOG_DIR, f"worker-{i}")
            os.makedirs(wd, exist_ok=True)
            self.workers.append(_spawn(
                ["org.apache.spark.deploy.worker.Worker", MASTER_URL,
                 "--host", "127.0.0.1", "--cores", str(cores),
                 "--memory", mem, "--webui-port", str(8101 + i),
                 "--work-dir", wd],
                f"worker-{i}.log"))
        _wait(lambda s: s["aliveworkers"] == n, f"{n} workers", 90)

    def stop(self) -> None:
        for p in self.workers + ([self.master] if self.master else []):
            p.terminate()
        for p in self.workers + ([self.master] if self.master else []):
            try:
                p.wait(timeout=30)
            except subprocess.TimeoutExpired:
                p.kill()


def submit(zip_path: str, n_workers: int, cores: int, n_pages: int,
           sf: str, queries: str, para_docs: int) -> dict:
    cmd = [
        SPARK_SUBMIT, "--master", MASTER_URL,
        "--py-files", zip_path,
        "--conf", f"spark.cores.max={n_workers * cores}",
        "--conf", f"spark.executor.cores={cores}",
        "--conf", "spark.executor.memory=16g",
        "--conf", "spark.driver.memory=8g",
        # Each executor JVM must size its GC/JIT thread pools for ITS core
        # share, not the host's: without this, 4 co-located 8-core executors
        # each spawn ~23 parallel G1 threads (sized for 32 CPUs) and every
        # young-gen pause oversubscribes the box 3x.  Measured on the 2M-doc
        # paragraph_dedup leg: 37.1 s -> 11.6 s wall, stage GC 60 s -> 18 s.
        # (YARN/k8s get this from cgroups; bare standalone does not.)
        "--conf", ("spark.executor.extraJavaOptions="
                   f"-XX:ActiveProcessorCount={cores}"),
        # schedule only after every executor registers, so the first (warm)
        # job runs at full parallelism and warms codegen on ALL executors
        "--conf", "spark.scheduler.minRegisteredResourcesRatio=1.0",
        "--conf", "spark.scheduler.maxRegisteredResourcesWaitingTime=30s",
        os.path.join(REPO, "tools", "standalone_job.py"),
        "--n-pages", str(n_pages), "--sf", sf, "--queries", queries,
        "--para-docs", str(para_docs),
    ]
    r = subprocess.run(cmd, env=ENV, capture_output=True, text=True,
                       timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("WGS_RESULT "):
            return json.loads(line[len("WGS_RESULT "):])
    sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:] + "\n")
    raise RuntimeError(f"no WGS_RESULT line (exit {r.returncode})")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, nargs="*", default=[1, 4],
                    help="worker-JVM counts to ladder (8 cores each)")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-pages", type=int, default=512_000_000)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--queries",
                    default="find_polygon_chains,dedup_clusters,mass_flux")
    ap.add_argument("--para-docs", type=int, default=0)
    args = ap.parse_args()

    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)
    zip_path = _build_zip()

    cluster = Cluster()
    legs = {}
    try:
        cluster.start_master()
        for w in args.workers:
            cluster.set_workers(w, args.cores, "24g")
            legs[f"{w}x{args.cores}"] = submit(
                zip_path, w, args.cores, args.n_pages, args.sf, args.queries,
                args.para_docs)
    finally:
        cluster.stop()

    out = {"metric": "standalone_ladder", "legs": legs}
    if len(args.workers) >= 2:
        lo, hi = min(args.workers), max(args.workers)
        lo_leg, hi_leg = legs[f"{lo}x{args.cores}"], legs[f"{hi}x{args.cores}"]
        out["scaling_legs"] = f"{lo}x{args.cores} -> {hi}x{args.cores} workers"
        if args.n_pages > 0:
            t_lo = lo_leg["flagship_pages_per_sec"]
            t_hi = hi_leg["flagship_pages_per_sec"]
            out["scaling_efficiency"] = round(t_hi / ((hi / lo) * t_lo), 3)
        if args.para_docs > 0:
            # throughput ratio: wall_lo / wall_hi speedup over worker ratio
            out["para_scaling_efficiency"] = round(
                lo_leg["para_wall_s"] / hi_leg["para_wall_s"] / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
