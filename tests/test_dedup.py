"""Dedup-family invariants beyond the oracle gate: SimHash band
completeness (pigeonhole) and brute-force agreement at sf0.001."""

from __future__ import annotations

import numpy as np

from ocr_pipeline_ray.functions import textstats as ts
from ocr_pipeline_ray.pipelines import dedup

SF_DIR = "/root/testdata/sf0.001"


def _bands(h: int) -> set[str]:
    out = set()
    for b, (off, width) in enumerate(zip(dedup._SIMHASH_BAND_OFFSETS,
                                         dedup._SIMHASH_BAND_WIDTHS)):
        out.add(f"{b}:{(h >> off) & ((1 << width) - 1):02x}")
    return out


def test_simhash_bands_complete_for_max_hamming():
    """Any pair at Hamming distance <= SIMHASH_MAX_HAMMING must share a
    band (the pigeonhole guarantee the bucket groupby relies on)."""
    rng = np.random.RandomState(7)
    for _ in range(500):
        a = int(rng.randint(0, 2**63, dtype=np.int64))
        flips = rng.choice(64, size=rng.randint(0, dedup.SIMHASH_MAX_HAMMING + 1),
                           replace=False)
        b = a
        for f in flips:
            b ^= 1 << int(f)
        assert ts.hamming64(a, b) <= dedup.SIMHASH_MAX_HAMMING
        assert _bands(a) & _bands(b), f"no shared band at d={ts.hamming64(a, b)}"


def test_simhash_near_dups_equals_brute_force(ray_session):
    """The banded pipeline finds exactly the brute-force pair set."""
    got = dedup.simhash_near_dups(SF_DIR)

    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    ids += [i + dedup.DUP_OFFSET for i in ids if i < dedup.N_DUP_DOCS]
    texts += ["dup " + x for i, x in zip(t["doc_id"].to_pylist(),
                                         t["text"].to_pylist())
              if i < dedup.N_DUP_DOCS]
    sigs = {i: ts.simhash64(x.split(" ")) for i, x in zip(ids, texts)}
    expected = set()
    srt = sorted(ids)
    for i in range(len(srt)):
        for j in range(i + 1, len(srt)):
            if ts.hamming64(sigs[srt[i]], sigs[srt[j]]) <= dedup.SIMHASH_MAX_HAMMING:
                expected.add((srt[i], srt[j]))
    assert set(zip(got["doc_a"], got["doc_b"])) == expected


def test_lsh_band_ints_collide_iff_band_rows_equal():
    sig_a = ts.minhash_signature(["a b c", "b c d", "c d e"])
    sig_b = ts.minhash_signature(["a b c", "b c d", "c d e", "x y z"])
    ia, ib = ts.lsh_band_ints(sig_a), ts.lsh_band_ints(sig_b)
    # identical signatures collide on every band; near ones on some
    assert ts.lsh_band_ints(sig_a) == ia
    assert set(ia) & set(ib)
    # distinct band indexes are mixed into the key → 32 distinct keys
    assert len(set(ia)) == 32
