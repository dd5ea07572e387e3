"""Dump .explain("formatted") for declared queries into plans/r06/.

Usage: python plans/dump_plans.py <suffix> [query ...]
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from universal_pdf_extractor_spark import entry_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "r06")

DEFAULT = [
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "amount_parse_roundtrip", "text_repetition_scores",
    "text_quality_scores", "text_pii_scan", "boilerplate_strip_docs",
    "ann_ivf_topk", "ann_cosine_topk",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = (SparkSession.builder.master("local[4]")
             .appName("plan-dump")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    registry = entry_queries.queries()

    for name in names:
        if name == "pipeline_e2e":
            from universal_pdf_extractor_spark.stages.pipeline import run_pipeline
            transcripts = spark.read.parquet(
                f"/tmp/updf_spark_bench/transcripts_sf{entry_queries.sf_from_dir(SF_DIR)}")
            outs = run_pipeline(transcripts)
            for oname in ("turns", "records"):
                buf = io.StringIO()
                with redirect_stdout(buf):
                    outs[oname].explain("formatted")
                path = os.path.join(OUT_DIR, f"pipeline_{oname}_{suffix}.txt")
                with open(path, "w") as f:
                    f.write(buf.getvalue())
                print("wrote", path)
            continue
        df = registry[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
