"""Flagship pixel-path gate (VERDICT r4 #8): the extraction cascade
must exercise the REAL P5-P8 kernels on corpus data, not only in the
bank queries.

Three claims, each tested:
1. the generated corpus carries raster-bitmap pages in EVERY pixel
   degradation class (so the flagship cannot dodge the kernels);
2. for degraded raster pages the naive read (fixed threshold for the
   contrast class, Otsu-alone for the rest) gets the text WRONG while
   the strategy-routed restore reads it back exactly — i.e. the
   kernels are necessary and sufficient on flagship inputs, and the
   router picks the matching kernel per class;
3. the flagship ``extract_spans`` output contains ``restored`` rows
   whose text equals the construction truth (byte parity with the
   golden oracle is separately gated in test_extract_golden.py).
"""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from ocr_pipeline_ray.sources.synth import gen_doc
from ocr_pipeline_ray.stages import media_stub, pixels

N_SCAN_DOCS = 120
SEED = 42

_EXPECT_STRATEGY = {
    "pixel_low_contrast": "equalize+binarize",
    "pixel_noise": "bilateral+binarize",
    "pixel_blur": "sharpen+binarize",
    "pixel_dropout": "binarize+close",
    "none": "binarize",
}


@pytest.fixture(scope="module")
def raster_rows():
    rows = []
    for i in range(N_SCAN_DOCS):
        _, media = gen_doc(SEED, i, 120)
        for m in media:
            if m["media_kind"] == "page_raster":
                deg = (m["degradations"][0]["type"] if m["degradations"]
                       else "none")
                rows.append((deg, m))
    return rows


def test_corpus_contains_all_pixel_degradation_classes(raster_rows):
    found = {deg for deg, _ in raster_rows}
    assert found == set(_EXPECT_STRATEGY), found


def test_router_picks_matching_kernel_per_class(raster_rows):
    for deg, m in raster_rows:
        img = media_stub.decode_raster(m["payload"])
        assert pixels.route_strategy(img) == _EXPECT_STRATEGY[deg], \
            (deg, m["media_ref"])


def test_degraded_pages_defeat_naive_read_and_recover_restored(raster_rows):
    naive_wrong = {d: 0 for d in _EXPECT_STRATEGY}
    totals = {d: 0 for d in _EXPECT_STRATEGY}
    for deg, m in raster_rows:
        img = media_stub.decode_raster(m["payload"])
        truth = [t["text"] for t in m["truth_lines"]]
        # class-matched naive baseline: the washed-out class is exactly
        # the one Otsu repairs, so its naive read is a FIXED threshold
        naive_mask = (pixels.binarize(img, 128)
                      if deg == "pixel_low_contrast"
                      else pixels.binarize(img))
        naive = pixels.read_lines(naive_mask)
        restored, strategy = pixels.restore_and_read(img)
        totals[deg] += 1
        if naive != truth:
            naive_wrong[deg] += 1
        # sufficiency is exact per page: the flagship's read IS this
        assert restored == truth, (deg, m["media_ref"], strategy)
    for deg in _EXPECT_STRATEGY:
        if deg == "none":
            assert naive_wrong[deg] == 0  # clean pages read raw
            continue
        # necessity in aggregate: the degradations are tuned so the
        # naive read fails on (nearly) every page; a rare lucky page
        # is tolerated, a readable class is not
        assert totals[deg] > 0
        assert naive_wrong[deg] >= 0.7 * totals[deg], \
            (deg, naive_wrong[deg], totals[deg])


def test_flagship_extract_emits_restored_rows(small_corpus):
    from ocr_pipeline_ray.pipelines.extract import (build_media_lookup,
                                                    extract_spans)

    docs = rd.read_parquet(f"{small_corpus}/documents_spans")
    ref = build_media_lookup(f"{small_corpus}/media")
    out = extract_spans(docs, media_lookup_ref=ref).to_pandas()
    restored = out[out["cascade"] == "restored"]
    assert len(restored) > 0
    assert (restored["kind"] == "media").all()
    assert (restored["status"] == "ok").all()

    # every restored row's text equals the construction truth after the
    # standard canonicalization — the pixel kernels really ran and won
    truth_by_ref: dict[str, str] = {}
    for i in range(60):
        _, media = gen_doc(SEED, i, 120)
        for m in media:
            if m["media_kind"] == "page_raster" and m["degradations"]:
                from ocr_pipeline_ray.functions.charfix import fix_text
                truth_by_ref[m["media_ref"]] = fix_text(
                    "\n".join(t["text"] for t in m["truth_lines"]))
    got = dict(zip(restored["media_ref"], restored["text"]))
    assert set(got) == set(truth_by_ref)
    assert got == truth_by_ref
