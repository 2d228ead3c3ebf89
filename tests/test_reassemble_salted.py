"""Two-phase salted reassembly must be byte-identical to the unsalted
path (skew handling changes physical execution, never results)."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ocr_pipeline_ray.stages.explode import explode_spans
from ocr_pipeline_ray.stages.classify import classify_spans
from ocr_pipeline_ray.stages.ocr import OcrStage
from ocr_pipeline_ray.stages.reassemble import reassemble, reassemble_salted
from ocr_pipeline_ray.pipelines.extract import build_media_lookup


def _pre_reassembly(small_corpus):
    docs = rd.read_parquet(f"{small_corpus}/documents_spans")
    ref = build_media_lookup(f"{small_corpus}/media")
    ds = docs.map_batches(explode_spans, batch_format="pyarrow")
    ds = ds.map_batches(classify_spans, batch_format="pyarrow")
    # ensemble + cascade + final status all run inside the OCR pool
    return ds.map_batches(OcrStage, batch_format="pyarrow", concurrency=2,
                          fn_constructor_kwargs={"media_lookup_ref": ref})


def test_salted_equals_unsalted(small_corpus):
    plain = reassemble(_pre_reassembly(small_corpus)).to_pandas()
    salted = reassemble_salted(_pre_reassembly(small_corpus),
                               salt_buckets=4).to_pandas()
    key = ["doc_id", "order"]
    plain = plain.sort_values(key).reset_index(drop=True)
    salted = salted.sort_values(key).reset_index(drop=True)[plain.columns]
    pd.testing.assert_frame_equal(plain, salted)
