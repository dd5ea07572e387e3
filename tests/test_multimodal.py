"""Multimodal binary-column processing: real BMP/WAV codecs, schema,
batch shape, exact-integer feature math (datapipe/multimodal.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from universal_pdf_extractor_spark.datapipe.multimodal import (
    AUDIO_N,
    FEATURE_SCHEMA,
    IMG_H,
    IMG_W,
    decode_bmp,
    decode_media,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    media_pixels,
    media_samples,
    sample_frames,
    synthetic_media,
)


class TestCodecs:
    def test_bmp_roundtrip(self):
        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(px))
        assert np.array_equal(out, px)

    def test_bmp_golden_2x2(self):
        """Hand-checked byte layout: bottom-up BGR rows with 2-byte
        padding (2*3=6 bytes -> stride 8)."""
        px = np.array([[[1, 2, 3], [4, 5, 6]],
                       [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8)
        raw = encode_bmp(px)
        assert raw[:2] == b"BM"
        offset = int.from_bytes(raw[10:14], "little")
        assert offset == 54
        # first stored row is the BOTTOM image row, BGR order
        assert list(raw[54:60]) == [9, 8, 7, 12, 11, 10]
        assert raw[60:62] == b"\x00\x00"                  # padding
        assert list(raw[62:68]) == [3, 2, 1, 6, 5, 4]
        assert np.array_equal(decode_bmp(raw), px)

    def test_wav_roundtrip_and_golden(self):
        s = np.array([0, 1, -1, 32767, -32768], dtype=np.int16)
        raw = encode_wav(s)
        assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
        assert np.array_equal(decode_wav(raw), s)
        # PCM16 little-endian: 32767 -> ff 7f
        assert raw[-4:-2] == b"\xff\x7f"

    def test_malformed_payloads_fail_soft(self):
        assert decode_bmp(b"not a bmp") is None
        assert decode_wav(b"RIFFxxxx") is None
        assert decode_media(b"", "image") is None
        assert decode_media(None, "audio") is None
        # truncated BMP (header promises more pixel data than present)
        good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
        assert decode_bmp(good[:-5]) is None


class TestSampling:
    def test_integer_index_sampling(self):
        sig = np.arange(100, dtype=np.int64)
        fr = sample_frames(sig, 8)
        assert list(fr) == [(k * 99) // 7 for k in range(8)]

    def test_short_signals(self):
        assert list(sample_frames(np.array([5, 6, 7]), 8)) == [5, 6, 7]
        assert list(sample_frames(np.array([5]), 8)) == [5]
        assert len(sample_frames(np.zeros(0, dtype=np.int64), 8)) == 0


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=36)


def test_feature_schema_and_decode_values(spark, media):
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    pdf = feats.toPandas().set_index("media_id")
    assert len(pdf) == 36
    assert set(pdf["kind"]) == {"image", "audio", "video"}
    for mid, f in pdf.iterrows():
        if f["kind"] == "audio":
            sig = media_samples(mid).astype(np.int64)
            assert pd.isna(f["width"]) and pd.isna(f["height"])
            assert f["n_samples"] == AUDIO_N
        else:
            sig = media_pixels(mid).reshape(-1).astype(np.int64)
            assert (f["width"], f["height"]) == (IMG_W, IMG_H)
        assert f["signal_sum"] == sig.sum()
        assert f["frame_sum"] == sample_frames(sig, 8).sum()
        assert f["frames_sampled"] == 8


def test_sha256_matches_payload(spark, media):
    rows = media.select("media_id", "payload").toPandas()
    feats = extract_features(media).toPandas().set_index("media_id")
    for r in rows.itertuples():
        assert feats.loc[r.media_id, "content_sha256"] == \
            hashlib.sha256(bytes(r.payload)).hexdigest()


def test_empty_and_garbage_payloads(spark):
    pdf = pd.DataFrame({
        "media_id": np.array([1, 2, 3], dtype="int64"),
        "kind": ["image", "audio", "video"],
        "payload": [b"", None, b"garbage bytes"],
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
    assert (feats["frames_sampled"] == 0).all()
    assert feats["signal_sum"].isna().all()
    assert feats.loc[2, "n_bytes"] == 0
    assert feats.loc[2, "content_sha256"] == hashlib.sha256(b"").hexdigest()
    assert feats.loc[3, "n_bytes"] == 13
