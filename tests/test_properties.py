"""Property-based tests (hypothesis) for the deterministic kernels —
invariants no example table can cover: idempotence, symmetry, bounds,
permutation-invariance, round-trip."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_pipeline_ray.functions import charfix, confidence, geometry
from ocr_pipeline_ray.functions import textstats as ts
from ocr_pipeline_ray.stages import media_stub

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200)
_words = st.lists(st.text(alphabet="abcdefg123", min_size=1, max_size=8),
                  max_size=30)


@settings(max_examples=200, deadline=None)
@given(_text)
def test_fix_text_idempotent(s):
    once = charfix.fix_text(s)
    assert charfix.fix_text(once) == once


@settings(max_examples=200, deadline=None)
@given(_text)
def test_fix_text_preserves_whitespace_shape(s):
    # corrections never add/remove whitespace → token counts stable
    assert len(charfix.fix_text(s).split(" ")) == len(s.split(" "))


@settings(max_examples=100, deadline=None)
@given(_words, _words)
def test_jaccard_bounds_and_symmetry(a, b):
    j = ts.jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == ts.jaccard(b, a)
    # self-similarity is 1.0 except the no-evidence (empty-set) case
    assert ts.jaccard(a, a) == (1.0 if a else 0.0)


@settings(max_examples=50, deadline=None)
@given(_words)
def test_minhash_is_shingle_order_invariant(words):
    sh = list(dict.fromkeys(words))
    if not sh:
        return
    rev = list(reversed(sh))
    assert ts.minhash_signature(sh) == ts.minhash_signature(rev)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=1.0), max_size=50))
def test_geomean_bounds(confs):
    g = confidence.geomean_confidence(np.array(confs))
    assert 0.0 <= g <= 1.0
    if confs:
        assert g >= 1e-3 - 1e-12  # floor applies when non-empty


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 500), st.integers(0, 500)),
                min_size=1, max_size=40))
def test_xy_cut_is_a_permutation(points):
    xs = np.array([p[0] for p in points])
    ys = np.array([p[1] for p in points])
    order = geometry.xy_cut_order(xs, ys)
    assert sorted(order.tolist()) == list(range(len(points)))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(_text, st.integers(0, 1000), st.integers(0, 1000)),
                max_size=10),
       st.integers(0, 2**31 - 1))
def test_page_roundtrip(lines, seed):
    payload = media_stub.encode_page(lines, seed)
    assert media_stub.classify_payload(payload) == "page"
    assert media_stub.decode_page(payload) == lines


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1))
def test_hamming_metric(a, b):
    d = ts.hamming64(a, b)
    assert 0 <= d <= 64
    assert d == ts.hamming64(b, a)
    assert ts.hamming64(a, a) == 0


# P4 dewarp invariant: for any page whose true baselines sit on a
# ≥24 px grid with per-line jitter below the cluster gap, dewarping
# restores the construction reading order exactly (row-major), no
# matter where the jitter lands relative to XY-cut band boundaries.
@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=3, max_value=8),            # rows
    st.integers(min_value=1, max_value=2),            # columns
    st.integers(min_value=24, max_value=60),          # true grid
    st.data(),
)
def test_dewarp_restores_grid_reading_order(n_rows, n_cols, grid, data):
    from ocr_pipeline_ray.functions.geometry import xy_cut_order
    from ocr_pipeline_ray.stages.multimodal import _dewarp_lines

    jitter_max = min(14, grid - 16)  # stay below the cluster-gap bound
    lines = []
    expect = []
    for r in range(n_rows):
        for c in range(n_cols):
            j = data.draw(st.integers(min_value=0, max_value=jitter_max))
            text = f"r{r}c{c}"
            lines.append((text, c * 250, r * grid + j))
            expect.append(text)
    snapped, _changed = _dewarp_lines(lines)
    xs = np.array([x for _, x, _ in snapped])
    ys = np.array([y for _, _, y in snapped])
    order = xy_cut_order(xs, ys)
    assert [snapped[i][0] for i in order] == expect
