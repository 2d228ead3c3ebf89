"""North-rule gate: engine span sequences == oracle golden spans,
exactly, on (kind, text, media_ref, order) — plus conf/status parity."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from ocr_pipeline_ray.pipelines.extract import build_media_lookup, extract_spans
from tests.oracle.golden import golden_spans

N_DOCS, SEED, SKEW = 60, 42, 120


@pytest.fixture(scope="module")
def golden_df():
    df = pd.DataFrame(golden_spans(SEED, N_DOCS, SKEW))
    return df.sort_values(["doc_id", "order"]).reset_index(drop=True)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["doc_id", "order"]).reset_index(drop=True)
    df["order"] = df["order"].astype("int64")
    return df


def _assert_matches_golden(out_df: pd.DataFrame, golden_df: pd.DataFrame):
    out = _normalize(out_df)
    gold = _normalize(golden_df)
    assert len(out) == len(gold)
    for col in ["doc_id", "order", "kind", "text", "media_ref", "status"]:
        pd.testing.assert_series_equal(out[col], gold[col], check_names=False)
    assert (out["conf"] - gold["conf"]).abs().max() < 1e-9


def test_broadcast_path_matches_golden(small_corpus, golden_df):
    docs = rd.read_parquet(f"{small_corpus}/documents_spans")
    ref = build_media_lookup(f"{small_corpus}/media")
    out = extract_spans(docs, media_lookup_ref=ref).to_pandas()
    _assert_matches_golden(out, golden_df)


def test_join_path_matches_golden(small_corpus, golden_df):
    docs = rd.read_parquet(f"{small_corpus}/documents_spans")
    media = rd.read_parquet(f"{small_corpus}/media")
    out = extract_spans(docs, media_ds=media, join_partitions=8).to_pandas()
    _assert_matches_golden(out, golden_df)
