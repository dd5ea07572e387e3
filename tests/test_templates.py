"""Template store: versioning, latest-wins selection, persistence
(templates/template_versions analogue, tables.py:426-491)."""

from __future__ import annotations

import os

import pytest

from universal_pdf_extractor_spark.io.templates import (
    build_template_store,
    latest_template_versions,
    match_to_templates,
    read_template_store,
    write_template_store,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_store_versioning(spark, docs):
    store = build_template_store(docs, versions_per_template=2)
    pdf = store.toPandas()
    # every provider has at most 2 versions, numbered from 1
    per = pdf.groupby("template_name")["version_number"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all()
    assert (per["max"] <= 2).all()
    assert (per["count"] == per["max"]).all()  # contiguous versions
    assert (pdf["sample_count"] >= pdf["version_number"]).all()
    assert pdf["is_active"].all()

    latest = latest_template_versions(store).toPandas()
    assert len(latest) == pdf["template_name"].nunique()
    exp_latest = pdf.groupby("template_name")["version_number"].max()
    got_latest = latest.set_index("template_name")["version_number"]
    assert got_latest.sort_index().equals(exp_latest.sort_index())


def test_match_uses_latest_version(spark, docs):
    store = build_template_store(docs, versions_per_template=2)
    matches = match_to_templates(docs, store).toPandas()
    assert len(matches) > 0
    assert (matches["score"] >= 0.5).all()
    # matched_version is always the template's newest version
    latest = latest_template_versions(store).toPandas() \
        .set_index("template_name")["version_number"]
    for r in matches.itertuples():
        assert r.matched_version == latest[r.template_name]
    # every document that IS a latest-fingerprint source must achieve
    # a perfect score (jaccard 1 against its own token set; a tie with
    # another provider's identical synthetic text is fine)
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("source").orderBy("doc_id")
    fp_docs = (docs.withColumn("v", F.row_number().over(w)).where("v <= 2")
               .groupBy("source").agg(F.max_by("doc_id", "v").alias("doc_id"))
               .toPandas())
    by_doc = matches.set_index("doc_id")["score"]
    for r in fp_docs.itertuples():
        assert by_doc.get(r.doc_id) == pd.Series([1.0]).iloc[0], r


def test_store_roundtrip(spark, docs, tmp_path):
    store = build_template_store(docs)
    path = str(tmp_path / "templates")
    write_template_store(store, path)
    back = read_template_store(spark, path)
    assert back.count() == store.count()
    assert set(back.columns) == set(store.columns)
    # quirks/column_mapping survive the round trip
    row = back.where("version_number = 1").first()
    assert isinstance(row.column_mapping, list)
    assert row.quirks == {}
