"""Deduplication family: exact, MinHash+LSH near-dup, SimHash, n-gram
Jaccard — first-class operators for a 100 TB training-data pipeline.

Scale design:
- exact dedup = content-hash column (vectorized map_batches) +
  hash-partitioned groupby + per-group first — one shuffle of keys.
- near-dup = shingle → MinHash signature per batch → explode to
  (band_key, doc_id) rows → groupby(band_key) buckets → candidate
  pairs only within buckets → exact-Jaccard verification of the
  (tiny) candidate set. The all-pairs O(n²) never happens; LSH bands
  bound the comparison count.
- SimHash = 64-bit signature per doc, near-dups = small Hamming
  distance within LSH-style prefix buckets.

For driver-gate determinism the corpus is augmented with seeded
duplicate copies (doc_id+100000, text prefixed "dup ") — constructed
identically in the DuckDB oracle — so the expected pair set is exact
and non-empty. MinHash parameters (128 perms, 32 bands × 4 rows) put
LSH recall at ~1-1e-30 for Jaccard ≥ 0.9 pairs, so the verified output
equals the oracle's exhaustive cross-join answer.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import textstats as ts

N_DUP_DOCS = 10
DUP_OFFSET = 100_000
JACCARD_THRESHOLD = 0.8


def _augmented_docs(sf_dir: str):
    """documents ∪ seeded near-duplicate copies (first N_DUP_DOCS docs,
    doc_id+DUP_OFFSET, text prefixed 'dup ') — same construction as the
    oracle SQL's UNION ALL."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        extra_ids = [i + DUP_OFFSET for i in ids if i < N_DUP_DOCS]
        extra_texts = ["dup " + t for i, t in zip(ids, texts) if i < N_DUP_DOCS]
        return pa.table({
            "doc_id": pa.array(ids + extra_ids, type=pa.int64()),
            "text": pa.array(texts + extra_texts, type=pa.string()),
        })

    return ds.map_batches(augment, batch_format="pyarrow")


def exact_dedup_augmented(sf_dir: str) -> pd.DataFrame:
    """Exact dedup over a corpus with *identical* injected copies
    (doc_id+DUP_OFFSET, same text): survivors = min doc_id per content
    hash. Returns (doc_id, fingerprint) of survivors."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def augment_exact(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        extra = [(i + DUP_OFFSET, t) for i, t in zip(ids, texts) if i < N_DUP_DOCS]
        all_ids = ids + [e[0] for e in extra]
        all_texts = texts + [e[1] for e in extra]
        return pa.table({
            "doc_id": pa.array(all_ids, type=pa.int64()),
            "fingerprint": pa.array([ts.fingerprint_md5(t) for t in all_texts],
                                    type=pa.string()),
        })

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, "doc_id")

    out = ds.map_batches(augment_exact, batch_format="pyarrow") \
        .groupby("fingerprint").map_groups(first, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "fingerprint"]]


def near_dup_pairs_minhash(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH candidate generation + exact-Jaccard verification.

    Returns all pairs (a < b) with token-3-shingle Jaccard ≥ 0.8 over
    the augmented corpus: (doc_a, doc_b, jaccard) — equal to the
    oracle's exhaustive answer because LSH recall at this threshold is
    ~1 by construction.
    """
    ds = _augmented_docs(sf_dir)

    def band_rows(batch: pa.Table) -> pa.Table:
        out_band, out_doc = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = ts.minhash_signature(ts.token_shingles(text), num_perms=128)
            for key in ts.lsh_band_keys(sig, bands=32):
                out_band.append(key)
                out_doc.append(did)
        return pa.table({"band_key": pa.array(out_band, type=pa.string()),
                         "doc_id": pa.array(out_doc, type=pa.int64())})

    # Candidate generation: the distributed pass already collapsed each
    # doc to 32 (band_key, doc_id) rows; that table is tiny relative to
    # the corpus (32 rows/doc, two narrow columns), so the bucket
    # self-join runs on the driver with one pandas merge. At a scale
    # where even the band table is too big for the driver, swap this
    # for groupby(band_key) + per-bucket pair emission (same result,
    # one more shuffle) — the threshold guard below enforces it.
    band_df = pd.concat(
        list(ds.map_batches(band_rows, batch_format="pyarrow")
             .iter_batches(batch_format="pandas")), ignore_index=True)
    assert len(band_df) < 50_000_000, "band table too large for driver merge"
    cand = band_df.merge(band_df, on="band_key")
    candidates = cand[cand["doc_id_x"] < cand["doc_id_y"]] \
        .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"}) \
        [["doc_a", "doc_b"]].drop_duplicates()

    # Verification: candidate set is tiny (bounded by band collisions);
    # read only the text columns, straight from parquet.
    import pyarrow.parquet as _pq
    base = _pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
    text_of = dict(zip(base["doc_id"].to_pylist(), base["text"].to_pylist()))
    for i in list(text_of):
        if i < N_DUP_DOCS:
            text_of[i + DUP_OFFSET] = "dup " + text_of[i]
    needed = set(candidates["doc_a"]) | set(candidates["doc_b"])
    shingle_of = {d: ts.token_shingles(text_of[d]) for d in needed}
    rows = []
    for a, b in zip(candidates["doc_a"], candidates["doc_b"]):
        # unrounded: int/int division is bit-identical to the oracle's
        j = ts.jaccard(shingle_of[a], shingle_of[b])
        if j >= JACCARD_THRESHOLD:
            rows.append({"doc_a": int(a), "doc_b": int(b), "jaccard": j})
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
    out = out.astype({"doc_a": "int64", "doc_b": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def jaccard_consecutive(sf_dir: str) -> pd.DataFrame:
    """n-gram-Jaccard similarity of each doc vs the next doc_id —
    a deterministic, SQL-checkable exercise of the shingle+Jaccard
    kernel over the whole corpus (broadcast next-doc lookup)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    all_docs = pa.parquet.read_table(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])
    text_ref = ray.put(dict(zip(all_docs["doc_id"].to_pylist(),
                                all_docs["text"].to_pylist())))

    def sim(batch: pa.Table) -> pa.Table:
        lookup = ray.get(text_ref)
        ids, js = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            nxt = lookup.get(did + 1)
            if nxt is None:
                continue
            ids.append(did)
            js.append(ts.jaccard(ts.token_shingles(text),
                                 ts.token_shingles(nxt)))
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "jaccard_next": pa.array(js, type=pa.float64())})

    out = ds.map_batches(sim, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def simhash_near_dups(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup: 64-bit signatures over the augmented corpus,
    pairs at Hamming distance ≤ 8 found via 4×16-bit prefix-band
    buckets (any pair within distance ≤ 3 must share ≥1 band; the
    injected dups share nearly all bits). Rows-only check (no SQL
    oracle — bit-level hashing is not SQL-expressible)."""
    ds = _augmented_docs(sf_dir)

    def sig_rows(batch: pa.Table) -> pa.Table:
        bands_out, docs_out, sigs_out = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            h = ts.simhash64(text.split(" "))
            for b in range(4):
                bands_out.append(f"{b}:{(h >> (16 * b)) & 0xFFFF:04x}")
                docs_out.append(did)
                sigs_out.append(h)
        return pa.table({"band_key": pa.array(bands_out, type=pa.string()),
                         "doc_id": pa.array(docs_out, type=pa.int64()),
                         "sig": pa.array(sigs_out, type=pa.uint64())})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        sigs = rows["sig"].tolist()
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = ts.hamming64(int(sigs[i]), int(sigs[j]))
                if d <= 8:
                    out.append({"doc_a": ids[i], "doc_b": ids[j], "hamming": d})
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(out)

    out = ds.map_batches(sig_rows, batch_format="pyarrow") \
        .groupby("band_key").map_groups(bucket_pairs, batch_format="pandas") \
        .to_pandas().drop_duplicates()
    out = out.astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
