"""Per-partition lineage manifests + exact resume.

The job splits the conversation key space into ``n_groups`` hash
buckets (pmod(xxhash64(conv_id), n)) and processes one bucket group
at a time: filter -> pipeline -> write outputs under
``<out>/<table>/bucket_group=<g>/`` -> commit a manifest JSON with
input/output row counts and an order-insensitive XOR checksum per
output table.  A re-run skips every group whose manifest is already
committed — exact resume, mirroring the reference's
delete-before-rewrite idempotency + per-document status machine
(orchestrator.py:184-205, models/enums.py:15-25) at dataset scale.

The manifest is committed AFTER the data writes succeed (write to a
temp name, atomic rename), so a crash mid-group leaves no manifest
and the group is redone idempotently (mode=overwrite per group dir).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

MANIFEST_DIR = "_manifests"


def bucket_of(conv_id_col, n_groups: int):
    return F.pmod(F.xxhash64(conv_id_col), F.lit(n_groups))


def checksum(df: DataFrame) -> int:
    """Order-insensitive 64-bit checksum over all columns."""
    h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    agg = df.select(h.alias("h")).agg(
        F.coalesce(F.expr("bit_xor(h)"), F.lit(0)).alias("x"))
    return int(agg.first()["x"])


def manifest_path(out_dir: str, group: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"group_{group:05d}.json")


def committed_groups(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("group_") and name.endswith(".json"):
            out.add(int(name[len("group_"):-len(".json")]))
    return out


def commit_manifest(out_dir: str, group: int, payload: dict) -> None:
    path = manifest_path(out_dir, group)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, sort_keys=True)
    os.replace(tmp, path)  # atomic commit


def run_with_resume(transcripts: DataFrame,
                    out_dir: str,
                    n_groups: int = 8,
                    run_pipeline_fn=None,
                    tables: Optional[list[str]] = None,
                    with_checksums: bool = True) -> dict:
    """Process bucket groups not yet committed; return a run summary.

    Each group is an independent, idempotent unit of work: outputs are
    overwritten per group directory and the manifest is the commit
    marker.  n_groups controls both resume granularity and how much of
    the corpus a single failure costs.
    """
    if run_pipeline_fn is None:
        from ..stages.pipeline import run_pipeline as run_pipeline_fn
    tables = tables or ["turns", "records", "segments", "conversations"]

    done = committed_groups(out_dir)
    summary = {"n_groups": n_groups, "skipped": sorted(done), "processed": []}

    bucketed = transcripts.withColumn("_grp", bucket_of(F.col("conv_id"), n_groups))

    for g in range(n_groups):
        if g in done:
            continue
        t0 = time.perf_counter()
        part = bucketed.where(F.col("_grp") == g).drop("_grp")
        outputs = run_pipeline_fn(part, persist=True)
        cached = [outputs.pop(k) for k in list(outputs) if k.startswith("_")]
        input_rows = part.count()
        meta: dict = {"group": g, "input_rows": input_rows, "outputs": {}}
        for name in tables:
            df = outputs[name]
            path = os.path.join(out_dir, name, f"bucket_group={g}")
            df.write.mode("overwrite").parquet(path)
            entry = {"rows": spark_count_parquet(df.sparkSession, path)}
            if with_checksums:
                entry["xor64"] = checksum(df.sparkSession.read.parquet(path))
            meta["outputs"][name] = entry
        for c in cached:
            c.unpersist()
        meta["duration_sec"] = round(time.perf_counter() - t0, 3)
        commit_manifest(out_dir, g, meta)
        summary["processed"].append(g)
    return summary


def spark_count_parquet(spark, path: str) -> int:
    return spark.read.parquet(path).count()
