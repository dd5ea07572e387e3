"""Checkpoint/lineage manifests + exact resume (io/manifest.py)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from universal_pdf_extractor_spark.io.fixtures import generate_transcripts
from universal_pdf_extractor_spark.io.manifest import (
    PIPELINE_VERSION,
    committed_groups,
    latest_run,
    manifest_path,
    run_history,
    run_with_resume,
)
from universal_pdf_extractor_spark.schemas import TRANSCRIPTS_SCHEMA

N_GROUPS = 4


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = generate_transcripts(24)
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)


def test_full_run_then_exact_resume(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume_out"))

    s1 = run_with_resume(corpus, out, n_groups=N_GROUPS)
    assert s1["processed"] == list(range(N_GROUPS))
    assert committed_groups(out) == set(range(N_GROUPS))

    turns_all = spark.read.parquet(os.path.join(out, "turns")).count()
    assert turns_all == corpus.count()

    # manifests carry lineage metrics + run identity
    with open(manifest_path(out, 0)) as fh:
        m = json.load(fh)
    assert m["input_rows"] > 0
    assert set(m["outputs"]) == {"turns", "records", "segments",
                                  "conversations", "detected_tables"}
    assert all("rows" in v and "xor64" in v for v in m["outputs"].values())
    assert m["run_id"] == s1["run_id"]
    assert m["pipeline_version"] == PIPELINE_VERSION
    # usage/cost events analogue: per-engine row counts + duration
    assert sum(m["engine_events"]["turns_by_path"].values()) == m["input_rows"]
    assert set(m["engine_events"]["turns_by_path"]) <= {"TEXT", "TOOL", "EMPTY"}
    assert set(m["engine_events"]["records_by_parser"]) <= \
        {"column_path", "text_grid_table", "delim_table", "row_pattern",
         "delim_table_rescue", "row_pattern_rescue"}
    assert m["duration_sec"] > 0

    # outputs carry the run_id column; registry reconstructs is_latest
    turns_df = spark.read.parquet(os.path.join(out, "turns"))
    assert set(turns_df.select("run_id").distinct().toPandas()["run_id"]) \
        == {s1["run_id"]}
    reg = latest_run(out)
    assert reg["run_id"] == s1["run_id"]
    assert reg["engine_versions"]["engine"] == PIPELINE_VERSION

    # simulate a crash that lost group 2: drop its manifest + outputs
    os.remove(manifest_path(out, 2))
    for table in ("turns", "records", "segments", "conversations",
                  "detected_tables"):
        shutil.rmtree(os.path.join(out, table, "bucket_group=2"), ignore_errors=True)

    s2 = run_with_resume(corpus, out, n_groups=N_GROUPS)
    assert s2["processed"] == [2]
    assert sorted(s2["skipped"]) == [0, 1, 3]

    # after resume the dataset is whole again and group 2 carries the
    # NEW run's identity (reprocessing history reconstructable)
    assert spark.read.parquet(os.path.join(out, "turns")).count() == turns_all
    with open(manifest_path(out, 2)) as fh:
        m2 = json.load(fh)
    assert m2["outputs"]["turns"]["rows"] > 0
    assert m2["run_id"] == s2["run_id"] != s1["run_id"]
    assert [r["run_id"] for r in run_history(out)] == [s1["run_id"], s2["run_id"]]
    assert latest_run(out)["run_id"] == s2["run_id"]


def test_noop_when_all_committed(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume_out2"))
    run_with_resume(corpus, out, n_groups=2)
    s = run_with_resume(corpus, out, n_groups=2)
    assert s["processed"] == []
    assert sorted(s["skipped"]) == [0, 1]


def test_noop_resume_keeps_writing_run_latest(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume_out3"))
    s1 = run_with_resume(corpus, out, n_groups=2)
    s2 = run_with_resume(corpus, out, n_groups=2)  # no-op resume
    assert s2["processed"] == []
    # both runs are in the registry, but is_latest reconstruction must
    # point at the run whose run_id actually appears on output rows
    assert [r["run_id"] for r in run_history(out)] == [s1["run_id"], s2["run_id"]]
    assert latest_run(out)["run_id"] == s1["run_id"]
