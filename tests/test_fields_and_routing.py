"""Field extraction per doc (A4/F12) + quality-tier routing (R3/F15)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
import ray.data as rd

from ocr_pipeline_ray.pipelines.extract import (build_media_lookup,
                                                extract_fields_per_doc,
                                                extract_spans)
from ocr_pipeline_ray.stages import multimodal


@pytest.fixture(scope="module")
def fields_df(small_corpus):
    docs = rd.read_parquet(f"{small_corpus}/documents_spans")
    ref = build_media_lookup(f"{small_corpus}/media")
    spans = extract_spans(docs, media_lookup_ref=ref)
    return extract_fields_per_doc(spans).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_fields_schema_and_validity(fields_df):
    assert {"electricity_kwh", "carbon_kgco2e", "conf_electricity",
            "conf_carbon", "status", "doc_digest"} <= set(fields_df.columns)
    assert len(fields_df) == 60  # one row per doc
    # extracted values respect the generator's ranges (F9 validity)
    kwh = fields_df["electricity_kwh"].dropna()
    assert len(kwh) > 0
    # statuses from the F9 validator vocabulary
    assert set(fields_df["status"]) <= {"success", "partial", "failed"}
    # field confidences: 0 when absent, (0, 0.99] when present
    present = fields_df["electricity_kwh"].notna()
    assert (fields_df.loc[present, "conf_electricity"] > 0).all()
    assert (fields_df.loc[present, "conf_electricity"] <= 0.99).all()
    assert (fields_df.loc[~present, "conf_electricity"] == 0).all()


def test_aux_fields_present_in_corpus(fields_df):
    """F7 completion: the generator emits billing period / readings /
    peak demand / water lines, and the extractors find them."""
    for col in ("water_m3", "billing_start", "billing_end",
                "current_reading", "previous_reading", "peak_demand_kw"):
        assert col in fields_df.columns
        assert fields_df[col].notna().sum() > 0, f"{col} never extracted"


def test_kie_and_correction_loop_recover_degraded_fields():
    """F10/F11: fields the regex bank alone misses are recovered by the
    contextual scorer and the correction loop."""
    from ocr_pipeline_ray.functions.regex_banks import (_bank_pass,
                                                        extract_fields)

    # bank misses (no kWh unit anywhere) → KIE elects from context
    t1 = "monthly electricity usage was 2990 this period"
    assert _bank_pass(t1)["electricity_kwh"] is None
    assert extract_fields(t1)["electricity_kwh"] == 2990
    # fully-corrupted number (no digit witness) → aggressive last chance
    t2 = "Electricity lZOS kWh"
    assert _bank_pass(t2)["electricity_kwh"] is None
    assert extract_fields(t2)["electricity_kwh"] == 1205
    # F11: raw (un-fixed) text re-extracted after numerical correction
    t3 = "Total Consumption Z99O kWh"
    assert _bank_pass(t3)["electricity_kwh"] is None
    assert extract_fields(t3)["electricity_kwh"] == 2990


def test_doc_digest_matches_sha256_of_text(small_corpus, fields_df):
    docs = rd.read_parquet(f"{small_corpus}/documents_spans")
    ref = build_media_lookup(f"{small_corpus}/media")
    spans = extract_spans(docs, media_lookup_ref=ref).to_pandas()
    one = fields_df.iloc[0]
    g = spans[spans["doc_id"] == one["doc_id"]].sort_values("order")
    expected = hashlib.sha256("\n".join(g["text"]).encode()).hexdigest()
    assert one["doc_digest"] == expected


def test_quality_route_tiers(small_corpus):
    media = rd.read_parquet(f"{small_corpus}/media")
    out = media.map_batches(multimodal.quality_route,
                            batch_format="pyarrow").to_pandas()
    assert set(out["quality_tier"]) <= {"high", "medium", "low", "very_low"}
    # blank/corrupt payloads must route to the heaviest strategy
    bad = out[out["media_kind"].isin(["blank", "corrupt"])]
    assert (bad["quality_tier"] == "very_low").all()
    assert (bad["strategy"] == "full_preprocess+tesseract").all()
    # real pages score higher than blanks
    pages = out[out["media_kind"] == "page_png"]
    assert pages["quality_score"].mean() > bad["quality_score"].mean()
    # deterministic: same input → same routing
    out2 = media.map_batches(multimodal.quality_route,
                             batch_format="pyarrow").to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_ref").reset_index(drop=True),
        out2.sort_values("media_ref").reset_index(drop=True))
