"""Multimodal binary-column plumbing: schema, batch shape, feature
math (datapipe/multimodal.py).  The decode step is a documented stub
(no codec libs in this container); everything around it is real."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from universal_pdf_extractor_spark.datapipe.multimodal import (
    FEATURE_SCHEMA,
    _decode_stub,
    extract_features,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=64)


def test_feature_schema_and_counts(spark, media):
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    pdf = feats.toPandas()
    assert len(pdf) == 64
    assert set(pdf["kind"]) == {"image", "audio", "video"}
    # payloads are sha2-hex strings cast to binary -> 64 bytes
    assert (pdf["frames_sampled"] == 8).all()
    assert (pdf["n_bytes"] == 64).all()


def test_feature_values_match_per_item_reference(spark, media):
    """The batched matrix math must equal an independent per-item
    recomputation (decode -> sample -> mean/std) and real sha256."""
    rows = media.select("media_id", "kind", "payload").toPandas()
    feats = extract_features(spark.createDataFrame(
        rows, schema=media.select("media_id", "kind", "payload").schema)) \
        .toPandas().set_index("media_id")
    for r in rows.itertuples():
        data = bytes(r.payload)
        f = feats.loc[r.media_id]
        assert f["content_sha256"] == hashlib.sha256(data).hexdigest()
        frames = sample_frames(_decode_stub(data, r.kind), 8)
        assert f["feat_mean"] == pytest.approx(float(frames.mean()), abs=1e-7)
        assert f["feat_std"] == pytest.approx(float(frames.std()), abs=1e-7)


def test_empty_and_short_payloads(spark):
    pdf = pd.DataFrame({
        "media_id": np.array([1, 2, 3], dtype="int64"),
        "kind": ["image", "audio", "video"],
        "payload": [b"", None, b"abc"],  # empty / null / shorter than n_frames
    })
    from pyspark.sql.types import (BinaryType, LongType, StringType,
                                   StructField, StructType)
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
    ])
    feats = extract_features(spark.createDataFrame(pdf, schema=schema)) \
        .toPandas().set_index("media_id")
    assert feats.loc[1, "frames_sampled"] == 0
    assert pd.isna(feats.loc[1, "feat_mean"])
    assert feats.loc[2, "n_bytes"] == 0
    assert feats.loc[2, "content_sha256"] == hashlib.sha256(b"").hexdigest()
    assert feats.loc[3, "frames_sampled"] == 3  # short signal: all samples
    assert feats.loc[3, "feat_mean"] == pytest.approx(
        float(_decode_stub(b"abc", "video").mean()), abs=1e-7)
