"""Raster preprocessing path (SURVEY §2.7: S2 render + R1-R4).

Mirrors the reference's renderer semantics (renderer.py:78-242):
rotation only at conf > 0.5, deskew only at 0.5 < |angle| < 15, the
confidence-keyed enhancement ladder with its exact thresholds, and
enhancement skipped at mean confidence >= 0.85.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from universal_pdf_extractor_spark.datapipe.multimodal import decode_bmp
from universal_pdf_extractor_spark.datapipe.raster import (
    PAGES_SCHEMA,
    PREPROC_SCHEMA,
    adaptive_threshold_gaussian,
    apply_enhancement,
    clahe,
    detect_orientation,
    detect_skew_milli,
    fix_orientation,
    fix_skew,
    morph_open,
    otsu_threshold,
    page_params,
    preprocess_page_array,
    preprocess_pages,
    render_page,
    render_pages,
    shear,
    synth_upright,
    unshear,
)


def _page(seed=7, w=256, h=192):
    return synth_upright(seed, w, h)


class TestShear:
    def test_roundtrip_exact_within_margins(self):
        img = _page()
        for milli in (-14750, -5000, -750, 750, 5000, 14750):
            assert np.array_equal(unshear(shear(img, milli), milli), img)

    def test_zero_is_identity(self):
        img = _page()
        assert np.array_equal(shear(img, 0), img)


class TestOrientation:
    @pytest.mark.parametrize("k", [0, 1, 2, 3])
    def test_detects_all_four_rotations_with_confidence(self, k):
        img = _page()
        rotated = np.rot90(img, k)
        rot_deg, conf = detect_orientation(rotated)
        assert rot_deg == 90 * k
        assert conf > 0.5                      # renderer.py:90 gate passes
        assert np.array_equal(fix_orientation(rotated, rot_deg), img)


class TestSkew:
    def test_detects_synthesised_angle_exactly(self):
        img = _page()
        for milli in (-12000, -3250, 1500, 9750):
            assert detect_skew_milli(shear(img, milli)) == milli

    def test_prefix_run_accumulation_matches_scatter_add(self):
        """The r6 prefix-sum/run-difference rewrite of the shear search
        must reproduce the naive per-pixel scatter-add bit-exactly
        (all summands are integer-valued float64, so every grouping is
        exact) — including the var() argmax and its tie-breaks."""
        import math

        from universal_pdf_extractor_spark.datapipe.raster import (
            SKEW_MAX_MILLI,
            SKEW_STEP_MILLI,
        )

        def naive(gray):
            ink = (255.0 - gray.astype(np.float64))
            h, w = ink.shape
            prof = ink.T
            keep = prof.any(axis=1)
            prof = prof[keep]
            xs = (np.arange(w) - w // 2)[keep]
            m = int(math.tan(math.radians(SKEW_MAX_MILLI / 1000.0)) * (w // 2)) + 2
            best_var, best_milli = -1.0, 0
            order = sorted(range(-SKEW_MAX_MILLI, SKEW_MAX_MILLI + 1,
                                 SKEW_STEP_MILLI),
                           key=lambda mi: (abs(mi), mi < 0))
            base = np.arange(h)[None, :]
            flat = prof.ravel()
            size = h + 2 * m
            for milli in order:
                t = math.tan(math.radians(milli / 1000.0))
                d = np.rint(t * xs).astype(np.int64)
                idx = (base + (m - d)[:, None]).ravel()
                acc = np.bincount(idx, weights=flat, minlength=size)
                var = acc[m:m + h].var()
                if var > best_var:
                    best_var, best_milli = var, milli
            return best_milli

        img = _page(w=160, h=120)
        rng = np.random.default_rng(11)
        cases = [shear(img, milli) for milli in (-9000, -750, 0, 4250)]
        cases.append(rng.integers(0, 256, size=(90, 70), dtype=np.uint8))
        cases.append(np.full((60, 40), 255, dtype=np.uint8))  # blank
        for gray in cases:
            assert detect_skew_milli(gray) == naive(gray)

    def test_bilateral_lut_matches_per_pixel_exp(self):
        """r6 LUT rewrite of the bilateral range weight: pixel diffs
        are integer-valued, so exp's input domain is exactly 256
        values — checked exhaustively (a complete proof for any
        image), plus whole-image equality against the per-pixel
        expression on a rendered and a noise page."""
        import math

        from universal_pdf_extractor_spark.datapipe.raster import bilateral

        def naive(gray, d=9, sigma_color=75.0, sigma_space=75.0):
            r = d // 2
            img = gray.astype(np.float64)
            pad = np.pad(img, r, mode="edge")
            h, w = img.shape
            num = np.zeros((h, w))
            den = np.zeros((h, w))
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    sw = math.exp(-(dx * dx + dy * dy)
                                  / (2 * sigma_space ** 2))
                    nb = pad[r + dy:r + dy + h, r + dx:r + dx + w]
                    rw = np.exp(-((nb - img) ** 2)
                                / (2 * sigma_color ** 2)) * sw
                    num += rw * nb
                    den += rw
            return np.clip(np.rint(num / den), 0, 255).astype(np.uint8)

        # exhaustive domain: vectorized exp over the 256-value LUT
        # input equals the scalar-shaped evaluation per value
        ks = np.arange(256, dtype=np.float64)
        lut = np.exp(-(ks ** 2) / (2 * 75.0 ** 2))
        for k in range(256):
            v = np.exp(np.array([-(float(k) ** 2) / (2 * 75.0 ** 2)]))[0]
            assert lut[k] == v, k

        img = _page(w=120, h=90)
        rng = np.random.default_rng(23)
        noise = rng.integers(0, 256, size=(80, 60), dtype=np.uint8)
        for gray in (img, noise):
            assert np.array_equal(bilateral(gray), naive(gray))

    def test_correction_gate_boundaries(self):
        """renderer.py:141: correct only when 0.5 < |angle| < 15 —
        both boundaries are strict."""
        img = _page()
        for milli, applied in ((0, False), (500, False), (750, True),
                               (14750, True), (15000, False)):
            m = preprocess_page_array(shear(img, milli), 0.9)
            assert m["skew_milli"] == milli
            assert m["skew_applied"] is applied


class TestEnhancement:
    def test_profile_ladder_thresholds(self):
        """renderer.py:180-210: A >=0.85, B >=0.70, C >=0.50, else D."""
        img = _page()
        for conf, profile in ((0.9, "A_mild_contrast"),
                              (0.85, "A_mild_contrast"),
                              (0.84, "B_adaptive_threshold"),
                              (0.70, "B_adaptive_threshold"),
                              (0.69, "C_denoise_sharpen"),
                              (0.50, "C_denoise_sharpen"),
                              (0.49, "D_high_contrast")):
            _, got = apply_enhancement(img, conf)
            assert got == profile, conf

    def test_preprocess_skips_enhancement_at_high_confidence(self):
        """renderer.py:239-240: profile A is reachable only by calling
        apply_enhancement directly; the R4 pipeline skips at >=0.85."""
        m = preprocess_page_array(_page(), 0.9)
        assert m["profile"] == "none"
        m = preprocess_page_array(_page(), 0.80)
        assert m["profile"] == "B_adaptive_threshold"

    def test_threshold_outputs_are_binary(self):
        img = _page()
        for out in (adaptive_threshold_gaussian(img),
                    otsu_threshold(img),
                    apply_enhancement(img, 0.75)[0],
                    apply_enhancement(img, 0.6)[0],
                    apply_enhancement(img, 0.3)[0]):
            assert set(np.unique(out)).issubset({0, 255})

    def test_clahe_preserves_shape_and_range(self):
        img = _page()
        out = clahe(img, 2.0)
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_morph_open_removes_isolated_speck(self):
        img = np.full((32, 32), 255, dtype=np.uint8)
        img[10, 10] = 0                       # 1-px dark speck
        img[20:23, 5:25] = 0                  # 3-px-thick bar survives
        opened = 255 - morph_open(255 - img)  # open on ink
        assert opened[10, 10] == 255
        assert (opened[21, 6:24] == 0).all()


class TestRenderAndDetectRoundtrip:
    def test_ground_truth_recovered_from_pixels(self):
        for seed in (3, 1009, 777777, 123456789012):
            payload, p = render_page(seed)
            gray = decode_bmp(payload)[:, :, 0]
            m = preprocess_page_array(gray, p["conf_micros"] / 1e6)
            assert m["orientation_detected"] == p["rot_deg"]
            assert m["rotation_applied"] is (p["rot_deg"] != 0)
            assert m["skew_milli"] == p["skew_milli"]
            assert (m["width"], m["height"]) == (p["base_w"], p["base_h"])

    def test_render_is_deterministic(self):
        a, _ = render_page(42)
        b, _ = render_page(42)
        assert hashlib.sha256(a).hexdigest() == hashlib.sha256(b).hexdigest()

    def test_degenerate_quarter_degree_never_synthesised(self):
        from universal_pdf_extractor_spark.datapipe.raster import SKEW_STEP_MILLI
        assert all(abs(page_params(s)["skew_milli"]) != SKEW_STEP_MILLI
                   for s in range(2000))


class TestTableExtraction:
    """S7 raster tiers: ruling-line (lattice) + whitespace-gap
    (stream) table detection — the north-star's two heuristics."""

    def test_ground_truth_recovered_across_seeds(self):
        from universal_pdf_extractor_spark.datapipe.raster import (
            detect_table,
            synth_table_page,
        )
        modes = set()
        for seed in range(300):
            img, p = synth_table_page(seed)
            m = detect_table(img)
            assert m["mode"] == p["mode"], seed
            assert (m["n_rows"], m["n_cols"]) == (p["n_rows"], p["n_cols"]), seed
            assert m["bbox"] == p["bbox"], seed
            assert m["n_cells_filled"] == p["n_cells_filled"], seed
            modes.add(p["mode"])
        assert modes == {"lattice", "stream"}

    def test_lattice_requires_full_span_rules(self):
        """A stream page's solid cell blocks must never trip the
        ruling-line probe (the 0.95-span test)."""
        from universal_pdf_extractor_spark.datapipe.raster import (
            detect_table,
            synth_table_page,
            table_params,
        )
        checked = 0
        for seed in range(300):
            if table_params(seed)["mode"] != "stream":
                continue
            img, _ = synth_table_page(seed)
            assert detect_table(img)["mode"] == "stream", seed
            checked += 1
        assert checked > 50

    def test_blank_page_yields_nulls(self):
        from universal_pdf_extractor_spark.datapipe.raster import detect_table
        m = detect_table(np.full((64, 64), 255, dtype=np.uint8))
        assert m["mode"] is None and m["n_rows"] is None

    def test_spark_stage_matches_local_kernel(self, spark):
        from universal_pdf_extractor_spark.datapipe.raster import (
            detect_table,
            extract_tables,
            render_table_pages,
        )
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [f"t{i}" for i in range(10)]}))
        pages = render_table_pages(docs)
        pp = pages.toPandas().set_index("doc_id")
        out = extract_tables(pages).toPandas().set_index("doc_id")
        for doc_id, row in pp.iterrows():
            m = detect_table(decode_bmp(bytes(row["payload"]))[:, :, 0])
            got = out.loc[doc_id]
            assert got["mode"] == m["mode"] == row["gt_mode"], doc_id
            assert got["n_rows"] == m["n_rows"] == row["gt_rows"], doc_id
            assert got["n_cols"] == m["n_cols"] == row["gt_cols"], doc_id
            assert (got["bbox_x0"], got["bbox_y0"],
                    got["bbox_x1"], got["bbox_y1"]) == m["bbox"], doc_id
            assert got["n_cells_filled"] == m["n_cells_filled"] \
                == row["gt_filled"], doc_id


class TestComposedDeskewTable:
    """R2 ∘ S7 composition: sheared table pages must round-trip
    through detect-shear → correct → detect-table to the canonical
    ground truth."""

    def test_composition_recovers_ground_truth(self):
        import hashlib as _hl

        from universal_pdf_extractor_spark.datapipe.raster import (
            RS_A,
            SKEW_STEP_MILLI,
            SKEWED_TBL_MAX_MILLI,
            canonical_skew_milli,
            detect_skew_milli,
            detect_table,
            fix_skew,
            shear,
            synth_table_page,
        )
        applied = 0
        for i in range(120):
            seed = int.from_bytes(
                _hl.md5(f"doc{i:05d}".encode()).digest()[:6], "big")
            img, p = synth_table_page(seed)
            steps = SKEWED_TBL_MAX_MILLI // SKEW_STEP_MILLI
            milli = ((seed * RS_A) % (2 * steps + 1) - steps) * SKEW_STEP_MILLI
            if milli != 0:
                milli = canonical_skew_milli(img, milli)
            if abs(milli) <= 500:
                milli = 0
            sheared = shear(img, milli) if milli else img
            det = detect_skew_milli(sheared)
            assert det == milli, i
            g = fix_skew(sheared, det) if 500 < abs(det) < 15000 else sheared
            m = detect_table(g)
            assert (m["mode"], m["n_rows"], m["n_cols"], m["bbox"],
                    m["n_cells_filled"]) \
                == (p["mode"], p["n_rows"], p["n_cols"], p["bbox"],
                    p["n_cells_filled"]), i
            applied += milli != 0
        assert applied > 60            # the skewed branch dominates

    def test_spark_composed_stage(self, spark):
        from universal_pdf_extractor_spark.datapipe.raster import (
            deskew_and_extract,
            render_skewed_table_pages,
        )
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [f"s{i}" for i in range(12)]}))
        pages = render_skewed_table_pages(docs)
        gt = pages.toPandas().set_index("doc_id")
        out = deskew_and_extract(pages).toPandas().set_index("doc_id")
        for doc_id, row in gt.iterrows():
            got = out.loc[doc_id]
            assert got["skew_milli"] == row["gt_skew_milli"], doc_id
            assert got["skew_applied"] == row["gt_skew_applied"], doc_id
            assert got["mode"] == row["gt_mode"], doc_id
            assert got["n_rows"] == row["gt_rows"], doc_id
            assert got["n_cells_filled"] == row["gt_filled"], doc_id
            assert (got["bbox_x0"], got["bbox_y0"]) \
                == (row["gt_x0"], row["gt_y0"]), doc_id


class TestSparkStages:
    def test_render_preprocess_matches_local_kernels(self, spark):
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [f"doc{i}" for i in range(12)]}))
        pages = render_pages(docs)
        assert [f.name for f in pages.schema.fields] \
            == [f.name for f in PAGES_SCHEMA.fields]
        pp = pages.toPandas().set_index("doc_id")
        out = preprocess_pages(pages).toPandas().set_index("doc_id")
        assert [f.name for f in PREPROC_SCHEMA.fields][1:] \
            == list(out.columns)
        for doc_id, row in pp.iterrows():
            gray = decode_bmp(bytes(row["payload"]))[:, :, 0]
            m = preprocess_page_array(gray, int(row["conf_micros"]) / 1e6)
            got = out.loc[doc_id]
            for col in ("width", "height", "orientation_detected",
                        "orientation_conf_milli", "rotation_applied",
                        "skew_milli", "skew_applied", "profile",
                        "out_sha256", "ink_ratio_micros"):
                assert got[col] == m[col], (doc_id, col)
            # detection recovered the stored ground truth
            assert got["orientation_detected"] == row["rot_deg"]
            assert got["skew_milli"] == row["skew_milli"]

    def test_malformed_payload_fails_soft(self, spark):
        pdf = pd.DataFrame({"doc_id": ["bad"], "payload": [b"not a bmp"],
                            "conf_micros": [900000]})
        out = preprocess_pages(spark.createDataFrame(pdf)).toPandas().iloc[0]
        assert out["profile"] is None and pd.isna(out["orientation_detected"])
