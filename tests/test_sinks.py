"""Output sinks: bucketed layout + CSV export with signed amounts."""

from __future__ import annotations

import glob
import os

import pytest

from universal_pdf_extractor_spark.io.fixtures import generate_transcripts
from universal_pdf_extractor_spark.io.sinks import export_records_csv, write_outputs
from universal_pdf_extractor_spark.schemas import TRANSCRIPTS_SCHEMA
from universal_pdf_extractor_spark.stages.pipeline import run_pipeline


@pytest.fixture(scope="module")
def outputs(spark):
    pdf = generate_transcripts(16)
    sdf = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    return run_pipeline(sdf)


def test_bucketed_write_roundtrip(spark, outputs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sink"))
    write_outputs(outputs, out, n_buckets=4)
    turns = spark.read.parquet(os.path.join(out, "turns"))
    assert turns.count() == outputs["turns"].count()
    buckets = {os.path.basename(p) for p in
               glob.glob(os.path.join(out, "turns", "bucket=*"))}
    assert len(buckets) >= 2  # hash spread across bucket dirs
    # bucket column is partition metadata, data columns preserved
    assert "clean_text" in turns.columns


def test_csv_export_signed_amounts(spark, outputs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("csv"))
    export_records_csv(outputs["records"], outputs["conversations"], out)
    df = spark.read.option("header", True).csv(out)
    rows = df.collect()
    assert rows
    for r in rows:
        if r.direction == "DEBIT" and r.signed_amount is not None:
            assert float(r.signed_amount) <= 0
        if r.direction == "CREDIT" and r.signed_amount is not None:
            assert float(r.signed_amount) >= 0
