"""Recorded tuning sweep for the 8->32 scaling pair (round-2/3 verdict
item): sweep spark.sql.shuffle.partitions and Arrow maxRecordsPerBatch
at both levels, fresh taskset-pinned JVM per config, best-of-2 timed
full-pipeline runs per JVM, 32-core and 8-core configs interleaved.

    python tuning_sweep.py            # writes one JSON line to stdout

The tuned-pair efficiency is best32(tuned)/best8(tuned)/4 — both
levels get their own best config, so tuning cannot inflate the ratio
by de-tuning the small side.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r'''
import os, sys, time, shutil
os.environ.setdefault("SPARK_LOCAL_IP","127.0.0.1")
cpus, shuffle, arrow = sys.argv[1], sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", shuffle)
         .config("spark.sql.adaptive.enabled","true")
         .config("spark.sql.execution.arrow.pyspark.enabled","true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", arrow)
         .config("spark.driver.memory","40g")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from universal_pdf_extractor_spark.stages.pipeline import run_pipeline
tr = spark.read.parquet(sys.argv[4])
warm = run_pipeline(tr.where("conv_id like '%00'"))
for df in warm.values(): df.write.format("noop").mode("overwrite").save()
best = float("inf")
for _ in range(2):
    shutil.rmtree("/tmp/updf_sweep_out", ignore_errors=True)
    t0 = time.perf_counter()
    out = run_pipeline(tr, persist=True)
    cached = [out.pop(k) for k in list(out) if k.startswith("_")]
    for name, df in out.items():
        df.write.mode("overwrite").parquet(f"/tmp/updf_sweep_out/{name}")
    for c in cached: c.unpersist()
    best = min(best, time.perf_counter()-t0)
print(f"SWEEP_SEC {best:.3f}", flush=True)
spark.stop()
'''


def run_cfg(cores: int, shuffle: int, arrow: int, corpus: str) -> float:
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", RUNNER,
           str(cores), str(shuffle), str(arrow), corpus]
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in out.stdout.splitlines():
        if line.startswith("SWEEP_SEC"):
            return float(line.split()[1])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    corpus = os.environ.get("SPARK_GRAFT_CORPUS",
                            "/tmp/updf_spark_bench/transcripts_sf0.1")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        raise SystemExit(f"corpus missing: run bench.py once to materialize {corpus}")
    cfgs32 = [(32, 32, 10000), (32, 64, 10000), (32, 128, 10000),
              (32, 64, 20000), (32, 64, 2000)]
    cfgs8 = [(8, 8, 10000), (8, 16, 10000), (8, 32, 10000)]
    # interleave levels so both see comparable host windows
    order = []
    for i in range(max(len(cfgs32), len(cfgs8))):
        if i < len(cfgs32):
            order.append(cfgs32[i])
        if i < len(cfgs8):
            order.append(cfgs8[i])
    results = []
    for cores, shuffle, arrow in order:
        sec = run_cfg(cores, shuffle, arrow, corpus)
        results.append({"cores": cores, "shuffle_partitions": shuffle,
                        "arrow_batch": arrow, "sec": round(sec, 2)})
        print(f"cfg cores={cores} shuffle={shuffle} arrow={arrow} sec={sec:.2f}",
              file=sys.stderr, flush=True)
    import pyarrow.parquet as pq
    n_turns = sum(pq.read_metadata(os.path.join(corpus, f)).num_rows
                  for f in os.listdir(corpus) if f.endswith(".parquet"))
    best32 = min((r for r in results if r["cores"] == 32),
                 key=lambda r: r["sec"])
    best8 = min((r for r in results if r["cores"] == 8),
                key=lambda r: r["sec"])
    eff = (n_turns / best32["sec"]) / (n_turns / best8["sec"]) / 4
    print(json.dumps({
        "turns": n_turns,
        "results": results,
        "best_32": best32, "best_8": best8,
        "tuned_pair_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
