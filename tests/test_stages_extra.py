"""Tests for multimodal stages, ensemble vote-merge, isotonic calibration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocr_pipeline_ray.functions import calibration
from ocr_pipeline_ray.stages import multimodal
from ocr_pipeline_ray.stages.ensemble import ensemble_merge, vote_merge_tokens


class TestMultimodal:
    def test_decode_media_stage(self, small_corpus):
        media = rd.read_parquet(f"{small_corpus}/media")
        out = media.map_batches(multimodal.DecodeMedia, batch_size=64,
                                concurrency=2, batch_format="pyarrow").to_pandas()
        assert "payload" not in out.columns  # payload dropped immediately
        assert set(out["decoded_kind"]) <= {"page", "digital", "blank",
                                            "corrupt", "oversize"}
        pages = out[out["decoded_kind"].isin(["page", "digital"])]
        assert (pages["n_lines"] > 0).all()
        assert pages["decode_ok"].all()
        assert not out[out["decoded_kind"] == "corrupt"]["decode_ok"].any()

    def test_media_features_stage(self, small_corpus):
        media = rd.read_parquet(f"{small_corpus}/media")
        out = media.map_batches(multimodal.MediaFeatures, batch_size=64,
                                concurrency=2, batch_format="pyarrow").to_pandas()
        dims = {len(f) for f in out["features"]}
        assert dims == {multimodal.MediaFeatures.FEATURE_DIM}

    def test_frame_sample_explodes(self, small_corpus):
        media = rd.read_parquet(f"{small_corpus}/media")
        out = media.map_batches(multimodal.FrameSample, batch_size=64,
                                concurrency=2, batch_format="pyarrow",
                                fn_constructor_kwargs={"every_k": 2}).to_pandas()
        assert len(out) > 0
        assert (out["frame_index"] % 2 == 0).all()

    def test_real_codec_is_gated(self):
        with pytest.raises(NotImplementedError):
            multimodal._decode_real_image(b"\x89PNG\r\n")


class TestEnsemble:
    def _tokens(self):
        # 2 engines, 2 true tokens; engine B misreads token 2 with low conf
        return pd.DataFrame([
            {"doc_id": "d1", "engine": "A", "text": "299", "conf": 0.9,
             "x1": 0, "y1": 0, "x2": 10, "y2": 10},
            {"doc_id": "d1", "engine": "B", "text": "299", "conf": 0.8,
             "x1": 1, "y1": 1, "x2": 10, "y2": 10},
            {"doc_id": "d1", "engine": "A", "text": "kWh", "conf": 0.9,
             "x1": 20, "y1": 0, "x2": 30, "y2": 10},
            {"doc_id": "d1", "engine": "B", "text": "kWb", "conf": 0.3,
             "x1": 20, "y1": 0, "x2": 30, "y2": 10},
        ])

    def test_vote_merge_prefers_agreement(self):
        out = vote_merge_tokens(self._tokens(), n_engines=2)
        assert list(out["text"]) == ["299", "kWh"]
        assert list(out["votes"]) == [2, 2]

    def test_ensemble_merge_dataset(self):
        ds = rd.from_pandas(self._tokens())
        out = ensemble_merge(ds, n_engines=2).to_pandas()
        assert list(out["text"]) == ["299", "kWh"]
        assert (out["doc_id"] == "d1").all()

    def test_merge_is_input_order_invariant(self):
        t = self._tokens()
        shuffled = t.sample(frac=1.0, random_state=3).reset_index(drop=True)
        a = vote_merge_tokens(t, 2)
        b = vote_merge_tokens(shuffled, 2)
        pd.testing.assert_frame_equal(a, b)


class TestCalibration:
    def test_pav_monotone_and_interp(self):
        rng = np.random.RandomState(0)
        raw = rng.rand(200)
        correct = (rng.rand(200) < raw).astype(float)  # accuracy ~ raw conf
        kx, ky = calibration.fit_isotonic(raw, correct)
        assert np.all(np.diff(ky) >= -1e-12)  # monotone
        cal = calibration.apply_calibration(kx, ky, np.array([0.1, 0.5, 0.9]))
        assert cal[0] <= cal[1] <= cal[2]

    def test_threshold_inversion(self):
        kx = np.linspace(0, 1, 50)
        ky = kx.copy()  # identity calibration
        thr = calibration.threshold_for_accuracy(kx, ky, target=0.85)
        assert thr == pytest.approx(0.85, abs=1e-3)
        assert calibration.threshold_for_accuracy(kx, ky, 1.5) is None

    def test_min_samples_enforced(self):
        with pytest.raises(ValueError):
            calibration.fit_isotonic(np.ones(5), np.ones(5))
