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


def test_xlsx_style_columns_decisions(spark):
    """S12 styled export: signed amounts, exact comma-grouped pound
    rendering, direction-keyed font colors (api/documents.py:650-731),
    DD/MM/YYYY dates."""
    from datetime import date
    from decimal import Decimal

    import pandas as pd

    from universal_pdf_extractor_spark.io.sinks import (
        XLSX_CREDIT_COLOR,
        XLSX_DEBIT_COLOR,
        xlsx_style_columns,
    )

    rec = spark.createDataFrame(pd.DataFrame({
        "amount": [Decimal("1234567.89"), Decimal("0.05"), Decimal("10.00")],
        "direction": ["DEBIT", "CREDIT", "UNKNOWN"],
        "posted_date": [date(2024, 2, 1), None, date(2024, 12, 31)],
    }))
    out = xlsx_style_columns(rec).toPandas()
    assert list(out["amount_display"]) == ["-£1,234,567.89", "£0.05", "£10.00"]
    assert list(out["signed_amount"].astype(str)) \
        == ["-1234567.89", "0.05", "10.00"]
    assert out.loc[0, "font_color"] == XLSX_DEBIT_COLOR
    assert out.loc[1, "font_color"] == XLSX_CREDIT_COLOR
    assert out.loc[2, "font_color"] is None
    assert out.loc[0, "date_display"] == "01/02/2024"
    assert out.loc[1, "date_display"] is None
    assert out.loc[2, "date_display"] == "31/12/2024"
    assert (out["number_format"]
            == '£#,##0.00;[Red]-£#,##0.00;"-"').all()


def test_xlsx_export_stub_raises_without_openpyxl(spark):
    from datetime import date
    from decimal import Decimal

    import pandas as pd
    import pytest as _pytest

    from universal_pdf_extractor_spark.io.sinks import export_records_xlsx

    rec = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"], "segment_index": [0], "row_index": [0],
        "amount": [Decimal("1.00")], "direction": ["DEBIT"],
        "posted_date": [date(2024, 1, 1)]}))
    conv = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"], "doc_family": ["bank_statement"],
        "provider": ["x"]}))
    try:
        import openpyxl  # noqa: F401
        _pytest.skip("openpyxl present; stub path not reachable")
    except ImportError:
        pass
    with _pytest.raises(NotImplementedError):
        export_records_xlsx(rec, conv, "/tmp/never_written.xlsx")
