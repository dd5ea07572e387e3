"""Scaling-efficiency evidence runner (BASELINE.md protocol).

Runs the full pipeline at two parallelism levels (N and 4N cores),
INTERLEAVED over several rounds, and reports the per-level minimum —
the honest estimate of engine cost on a host with noisy neighbours.
Each level runs in a fresh JVM pinned to exactly that many cores
(taskset) so a "small cluster" cannot borrow idle cores for GC/OS
work the way bare local[N] does.

    python scaling_bench.py            # N=8 vs 4N=32, 3 rounds
    python scaling_bench.py 4 3        # N=4 vs 4N=16, 3 rounds

Prints one JSON line with per-level seconds/turns-per-sec and the
efficiency (T_4N / T_N) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r'''
import os, sys, time, shutil
os.environ.setdefault("SPARK_LOCAL_IP","127.0.0.1")
cpus = sys.argv[1]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(max(int(cpus),8)))
         .config("spark.sql.adaptive.enabled","true")
         .config("spark.sql.execution.arrow.pyspark.enabled","true")
         .config("spark.driver.memory","40g")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from universal_pdf_extractor_spark.stages.pipeline import run_pipeline
tr = spark.read.parquet(sys.argv[3])
warm = run_pipeline(tr.where("conv_id like '%00'"))
for df in warm.values(): df.write.format("noop").mode("overwrite").save()
# best-of-2 timed runs inside one JVM: the first full-size run still
# pays JIT/page-cache warmup that a long-lived production job would
# not; min measures engine cost, matching bench.py's protocol
best = float("inf")
for _ in range(2):
    shutil.rmtree("/tmp/updf_scaling_out", ignore_errors=True)
    t0 = time.perf_counter()
    out = run_pipeline(tr, persist=True)
    cached = [out.pop(k) for k in list(out) if k.startswith("_")]
    for name, df in out.items():
        df.write.mode("overwrite").parquet(f"/tmp/updf_scaling_out/{name}")
    for c in cached: c.unpersist()
    best = min(best, time.perf_counter()-t0)
print(f"SCALING_SEC {best:.3f}", flush=True)
spark.stop()
'''


def run_level(cores: int, corpus: str) -> float:
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", RUNNER,
           str(cores), "x", corpus]
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_SEC"):
            return float(line.split()[1])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def _burn(k):
    s = 0
    for i in range(k):
        s += i * i
    return s


def _burn_bw(_):
    import time as _t

    import numpy as np
    a = np.empty(50_000_000, dtype=np.uint8)
    b = np.ones(50_000_000, dtype=np.uint8)
    t0 = _t.perf_counter()
    n = 0
    while _t.perf_counter() - t0 < 3.0:
        a[:] = b
        b[:] = a
        n += 2
    return n * 0.05  # GB copied


def hardware_control(n: int) -> dict:
    """Two ideal-parallel controls bracketing any real workload on
    this host:

    - compute-bound (cache-resident integer burn): the ceiling for
      CPU-limited work — all-core turbo vs few-core turbo.
    - bandwidth-bound (50MB numpy copies): the ceiling for
      memory-limited work.  This host's aggregate copy bandwidth
      FALLS when going from N to 4N processes (shared/throttled
      memory bus), so bandwidth-heavy phases scale NEGATIVELY no
      matter the engine.

    A string/Arrow analytics pipeline sits between the two; its
    efficiency must be read against this bracket, not against 1.0."""
    import multiprocessing as mp
    import time

    burn = _burn
    out = {}
    bw = {}
    for procs in (n, 4 * n):
        with mp.Pool(procs) as pool:
            t0 = time.perf_counter()
            pool.map(burn, [3_000_000] * (procs * 16))
            out[procs] = (procs * 16) / (time.perf_counter() - t0)
        with mp.Pool(procs) as pool:
            t0 = time.perf_counter()
            gb = sum(pool.map(_burn_bw, range(procs)))
            bw[procs] = gb / (time.perf_counter() - t0)
    return {"control_speedup": round(out[4 * n] / out[n], 3),
            "control_efficiency": round(out[4 * n] / out[n] / 4, 3),
            "bandwidth_gbps_n": round(bw[n], 1),
            "bandwidth_gbps_4n": round(bw[4 * n], 1),
            "bandwidth_control_speedup": round(bw[4 * n] / bw[n], 3),
            "bandwidth_control_efficiency": round(bw[4 * n] / bw[n] / 4, 3)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    corpus = os.environ.get("SPARK_GRAFT_CORPUS",
                            "/tmp/updf_spark_bench/transcripts_sf0.1")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        raise SystemExit(f"corpus missing: run bench.py once to materialize {corpus}")
    levels = {n: [], 4 * n: []}
    for _ in range(rounds):
        for cores in (4 * n, n):  # big first: equal cache warmth
            levels[cores].append(run_level(cores, corpus))
            print(f"round sample cores={cores} sec={levels[cores][-1]:.2f}",
                  file=sys.stderr, flush=True)
    import pyarrow.parquet as pq  # count turns without a Spark session
    n_turns = sum(pq.read_metadata(os.path.join(corpus, f)).num_rows
                  for f in os.listdir(corpus) if f.endswith(".parquet"))
    t_small = min(levels[n])
    t_big = min(levels[4 * n])
    tps_small = n_turns / t_small
    tps_big = n_turns / t_big
    control = hardware_control(n)
    print(json.dumps({
        **control,
        "n_cores": n, "n4_cores": 4 * n, "rounds": rounds, "turns": n_turns,
        "sec_n": round(t_small, 2), "sec_4n": round(t_big, 2),
        "turns_per_sec_n": round(tps_small, 1),
        "turns_per_sec_4n": round(tps_big, 1),
        "speedup": round(tps_big / tps_small, 3),
        "efficiency": round(tps_big / tps_small / 4, 3),
        "samples": {str(k): [round(v, 2) for v in vs] for k, vs in levels.items()},
    }))


if __name__ == "__main__":
    main()
