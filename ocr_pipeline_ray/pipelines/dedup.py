"""Deduplication family: exact, MinHash+LSH near-dup, SimHash, n-gram
Jaccard — first-class operators for a 100 TB training-data pipeline.

Scale design (every stage distributed; nothing corpus-sized touches the
driver):
- exact dedup = content-hash column (vectorized map_batches) +
  hash-partitioned groupby + per-group first — one shuffle of keys.
- MinHash near-dup = shingle → MinHash signature per batch → explode to
  (band_key:int64, doc_id) rows → ``groupby(band_key)`` buckets →
  candidate pairs emitted *inside each bucket task* → exact-Jaccard
  verification of the (tiny, collision-bounded) candidate set, whose
  texts are fetched with a broadcast semi-join (``pc.is_in`` filter on
  a second corpus scan — only candidate docs' shingles ever
  materialize). The all-pairs O(n²) never happens; the band table never
  leaves the cluster.
- SimHash = 64-bit signature per doc; 9 prefix bands (widths 8+7×8 =
  64) so by pigeonhole ANY pair at Hamming distance ≤ 8 shares at
  least one clean band → bucket groupby finds all of them.

For driver-gate determinism the corpus is augmented with seeded
duplicate copies (doc_id+100000, text prefixed "dup ") — constructed
identically in the DuckDB oracle — so the expected pair set is exact
and non-empty. MinHash parameters (128 perms, 32 bands × 4 rows) put
LSH recall at ~1-1e-30 for Jaccard ≥ 0.9 pairs, so the verified output
equals the oracle's exhaustive cross-join answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import textstats as ts

N_DUP_DOCS = 10
DUP_OFFSET = 100_000
JACCARD_THRESHOLD = 0.8

# Guard, not a sizing assumption: the *candidate pair* set is bounded by
# real near-dups + band collisions (≪ corpus; the band table itself stays
# distributed). If a pathological corpus trips this, raise the LSH band
# rows-per-band (fewer collisions) or verify pairs fully distributed.
MAX_DRIVER_PAIRS = 5_000_000


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
    hash. Returns (doc_id, fingerprint) of survivors.

    This is the DESIGNATED exact-dedup operator for the 100 TB story,
    so its shuffle is the engine-standard shape: ``crc32(fingerprint)
    % num_buckets`` (bounded int64 key) + ONE vectorized
    ``groupby(fingerprint).min`` pass per bucket — never a raw utf8
    ``groupby`` whose mostly-singleton string groups pay Ray's
    per-group overhead plus a utf8 sort (the simhash fix,
    dedup.py:120-137, applied to its own family)."""
    import zlib

    from .relational import reduce_buckets

    num_buckets = reduce_buckets(sf_dir, "documents")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def augment_exact(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        extra = [(i + DUP_OFFSET, t) for i, t in zip(ids, texts) if i < N_DUP_DOCS]
        all_ids = ids + [e[0] for e in extra]
        fps = [ts.fingerprint_md5(t) for t in
               texts + [e[1] for e in extra]]
        return pa.table({
            "doc_id": pa.array(all_ids, type=pa.int64()),
            "fingerprint": pa.array(fps, type=pa.string()),
            "bucket": pa.array(
                [zlib.crc32(f.encode()) % num_buckets for f in fps],
                type=pa.int64()),
        })

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("fingerprint", as_index=False) \
            .agg(doc_id=("doc_id", "min"))

    out = ds.map_batches(augment_exact, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_dedup, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)[["doc_id", "fingerprint"]]


def near_dup_pairs_minhash(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH candidate generation + exact-Jaccard verification,
    fully distributed.

    Stages:
    1. per batch: shingle → 128-perm MinHash → 32 (band_key, doc_id)
       rows per doc (band_key is an int64 fold — int shuffle keys are
       far cheaper than utf8 for Ray's sort-based groupby). Docs with
       no shingles are skipped: they carry no similarity evidence and
       would otherwise all share the zero signature.
    2. ``groupby(band_key)`` → candidate pairs emitted per bucket task
       (the band table is never concatenated on the driver).
    3. the deduplicated pair list (tiny, collision-bounded — guarded by
       ``MAX_DRIVER_PAIRS``) is hash-bucketed and broadcast; a second
       corpus scan emits each candidate doc's shingle set INTO every
       verify bucket whose pairs reference it (``pc.is_in`` filter +
       per-doc bucket fanout) — candidate shingles flow scan-task →
       bucket task and never concatenate on the driver (on a high-dup
       corpus candidates ≈ corpus, so a driver concat would be a
       corpus-sized materialization).
    4. exact Jaccard per pair INSIDE each verify-bucket task (int/int
       division — bit-identical to the oracle), threshold, sort; only
       the verified (output-sized) pairs reach the driver.

    Returns all pairs (a < b) with token-3-shingle Jaccard ≥ 0.8 over
    the augmented corpus: (doc_a, doc_b, jaccard) — equal to the
    oracle's exhaustive answer because LSH recall at this threshold is
    ~1 by construction.
    """
    num_buckets = 64  # coarse shuffle key: bounded groups, one
    # vectorized pass per bucket (a raw groupby(band_key) would pay
    # per-group overhead on millions of singleton buckets)

    def band_rows(batch: pa.Table) -> pa.Table:
        out_band, out_doc = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            shingles = ts.token_shingles(text)
            if not shingles:
                continue
            sig = ts.minhash_signature(shingles, num_perms=128)
            out_band.extend(ts.lsh_band_ints(sig, bands=32))
            out_doc.extend([did] * 32)
        band = np.asarray(out_band, dtype=np.int64)
        return pa.table({"band_key": pa.array(band, type=pa.int64()),
                         "doc_id": pa.array(out_doc, type=pa.int64()),
                         "bucket": pa.array(band % num_buckets,
                                            type=pa.int64())})

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # only band keys shared by >1 doc can produce candidates
        g = g[g.duplicated("band_key", keep=False)]
        a, b = [], []
        for _, sub in g.groupby("band_key", sort=False):
            ids = sorted(set(sub["doc_id"].tolist()))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
        return pd.DataFrame({"doc_a": pd.Series(a, dtype="int64"),
                             "doc_b": pd.Series(b, dtype="int64")})

    pairs = _augmented_docs(sf_dir) \
        .map_batches(band_rows, batch_format="pyarrow") \
        .groupby("bucket").map_groups(emit_pairs, batch_format="pandas") \
        .to_pandas()
    assert len(pairs) <= MAX_DRIVER_PAIRS, "candidate pairs exceed driver guard"
    pairs = pairs.drop_duplicates().reset_index(drop=True)
    if pairs.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})

    # Bucketed distributed verification: pairs are hash-bucketed (tiny
    # table — broadcast), candidate docs' shingle sets flow from the
    # second scan straight into the verify buckets that need them.
    n_vbuckets = max(8, len(pairs) // 1024 + 1)
    pairs = pairs.assign(
        vbucket=(pairs["doc_a"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(32))
        .astype(np.int64) % n_vbuckets)
    doc_buckets: dict[int, set[int]] = {}
    for a, b, v in zip(pairs["doc_a"], pairs["doc_b"], pairs["vbucket"]):
        doc_buckets.setdefault(int(a), set()).add(int(v))
        doc_buckets.setdefault(int(b), set()).add(int(v))
    cand_ids = pa.array(sorted(doc_buckets), type=pa.int64())
    pairs_ref = ray.put(pairs)
    fanout_ref = ray.put({d: sorted(v) for d, v in doc_buckets.items()})

    def emit_shingles(batch: pa.Table) -> pa.Table:
        fanout = ray.get(fanout_ref)
        hit = batch.filter(pc.is_in(batch["doc_id"], value_set=cand_ids))
        out_b, out_d, out_s = [], [], []
        for did, text in zip(hit["doc_id"].to_pylist(),
                             hit["text"].to_pylist()):
            sh = sorted(ts.token_shingles(text))
            for v in fanout[did]:
                out_b.append(v)
                out_d.append(did)
                out_s.append(sh)
        return pa.table({"vbucket": pa.array(out_b, type=pa.int64()),
                         "doc_id": pa.array(out_d, type=pa.int64()),
                         "shingles": pa.array(out_s,
                                              type=pa.list_(pa.string()))})

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mine = ray.get(pairs_ref)
        mine = mine[mine["vbucket"] == g["vbucket"].iloc[0]]
        sh = {int(d): set(s) for d, s in zip(g["doc_id"], g["shingles"])}
        out_a, out_b, out_j = [], [], []
        for a, b in zip(mine["doc_a"], mine["doc_b"]):
            # unrounded: int/int division is bit-identical to the oracle's
            jac = ts.jaccard(sh[int(a)], sh[int(b)])
            if jac >= JACCARD_THRESHOLD:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(jac)
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64"),
                             "jaccard": pd.Series(out_j, dtype="float64")})

    out = _augmented_docs(sf_dir) \
        .map_batches(emit_shingles, batch_format="pyarrow") \
        .groupby("vbucket").map_groups(verify_bucket, batch_format="pandas") \
        .to_pandas()
    out = out.astype({"doc_a": "int64", "doc_b": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def jaccard_consecutive(sf_dir: str) -> pd.DataFrame:
    """n-gram-Jaccard similarity of each doc vs the next doc_id — a
    deterministic, SQL-checkable exercise of the shingle+Jaccard kernel
    over the whole corpus.

    The next-doc text arrives via a hash-partitioned ``Dataset.join``
    on ``doc_id == next.doc_id - 1`` (the right side is the same scan
    with a shifted key) — NOT a whole-corpus broadcast dict, which at
    100 TB would ship the full text column to every task."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def shift_key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "prev_id": pc.subtract(batch["doc_id"], pa.scalar(1, pa.int64())),
            "next_text": batch["text"],
        })

    nxt = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"]) \
        .map_batches(shift_key, batch_format="pyarrow")
    from .relational import _join_partitions
    joined = docs.join(nxt, join_type="inner",
                       num_partitions=_join_partitions(sf_dir, "documents",
                                                       "documents"),
                       on=("doc_id",), right_on=("prev_id",),
                       aggregator_ray_remote_args={"num_cpus": 0.1})

    def sim(batch: pa.Table) -> pa.Table:
        js = [ts.jaccard(ts.token_shingles(a), ts.token_shingles(b))
              for a, b in zip(batch["text"].to_pylist(),
                              batch["next_text"].to_pylist())]
        return pa.table({"doc_id": batch["doc_id"],
                         "jaccard_next": pa.array(js, type=pa.float64())})

    out = joined.map_batches(sim, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# SimHash prefix bands: widths 8+7×8 = 64 bits in 9 bands. Pigeonhole:
# a pair at Hamming distance ≤ 8 differs in at most 8 bands, so at
# least one of the 9 bands is identical → the bucket groupby finds
# every such pair (the guarantee matches the distance threshold below).
_SIMHASH_BAND_OFFSETS = (0, 8, 15, 22, 29, 36, 43, 50, 57)
_SIMHASH_BAND_WIDTHS = (8, 7, 7, 7, 7, 7, 7, 7, 7)
SIMHASH_MAX_HAMMING = 8


def simhash_near_dups(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """SimHash near-dup: 64-bit signatures over the augmented corpus,
    pairs at Hamming distance ≤ 8 found via 9 prefix bands (widths
    8+7×8; pigeonhole ⇒ complete for d ≤ 8 — see band constants).

    Shuffle shape (the minhash pattern, dedup.py:120-137): band keys
    are int64 folds ``(band << 8) | bits`` — never utf8 — coarsened to
    ``band_key % num_buckets`` so the groupby sees ≤ num_buckets
    bounded groups (one vectorized pandas pass per bucket) instead of
    ~9n mostly-singleton string groups, and the per-batch band
    explosion is a numpy broadcast, not a per-doc loop. Rows-only
    check (no SQL oracle — bit-level hashing is not SQL-expressible);
    completeness vs a brute-force oracle is asserted in tests."""
    ds = _augmented_docs(sf_dir)

    offs = np.asarray(_SIMHASH_BAND_OFFSETS, dtype=np.uint64)
    masks = (np.uint64(1) << np.asarray(_SIMHASH_BAND_WIDTHS,
                                        dtype=np.uint64)) - np.uint64(1)
    band_ids = np.arange(len(offs), dtype=np.uint64)

    def sig_rows(batch: pa.Table) -> pa.Table:
        dids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        texts = batch["text"].to_pylist()
        # the signature itself is per-doc token hashing (like minhash);
        # everything after it is vectorized
        sigs = np.fromiter((ts.simhash64(t.split(" ")) for t in texts),
                           dtype=np.uint64, count=len(texts))
        bits = (sigs[:, None] >> offs[None, :]) & masks[None, :]
        keys = ((band_ids[None, :] << np.uint64(8)) | bits) \
            .ravel().astype(np.int64)
        n_bands = len(offs)
        return pa.table({
            "band_key": pa.array(keys, type=pa.int64()),
            "doc_id": pa.array(np.repeat(dids, n_bands), type=pa.int64()),
            "sig": pa.array(np.repeat(sigs, n_bands), type=pa.uint64()),
            "bucket": pa.array(keys % num_buckets, type=pa.int64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # only band keys shared by >1 doc can produce candidates
        g = g[g.duplicated("band_key", keep=False)]
        out = []
        for _, sub in g.groupby("band_key", sort=False):
            rows = sub.drop_duplicates("doc_id").sort_values("doc_id")
            ids = rows["doc_id"].tolist()
            sigs = rows["sig"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = ts.hamming64(int(sigs[i]), int(sigs[j]))
                    if d <= SIMHASH_MAX_HAMMING:
                        out.append({"doc_a": ids[i], "doc_b": ids[j],
                                    "hamming": d})
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame(out)

    out = ds.map_batches(sig_rows, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas") \
        .to_pandas().drop_duplicates()
    out = out.astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def dedup_clusters(sf_dir: str, max_rounds: int = 16) -> pd.DataFrame:
    """Connected-components clustering of the minhash near-dup pair
    graph — the step a dedup pipeline runs AFTER pair generation:
    group transitively-linked docs, pick one survivor per component.
    Returns (doc_id, cluster_id, is_survivor) for every doc that
    appears in at least one near-dup pair, where ``cluster_id`` is the
    minimum doc_id of the component and the survivor is that doc.

    This is the engine's FIXPOINT-OPERATOR pattern (iterative
    algorithms the reference has no counterpart for): distributed
    min-label propagation entirely in Dataset ops — each round joins
    the label table across the (bidirectional) edge table
    (hash-partitioned ``Dataset.join``), reduces with a
    ``groupby(node).min(label)``, and re-materializes the label table
    INTO THE OBJECT STORE (``materialize()`` here is the iterative-
    algorithm state handoff, node-set sized and distributed — not a
    driver pull; branching an unmaterialized Dataset would re-execute
    the whole lineage per consumer). The fixpoint test exploits
    monotonicity: labels only ever decrease, so the label SUM is
    strictly decreasing until convergence — one cheap ``sum()``
    aggregate per round instead of an old-vs-new join. Each round also
    POINTER-JUMPS (labels joined to themselves on label=node pull in
    the label's own label), so convergence is O(log diameter) rounds
    on adversarial chains, not O(diameter) — pytest drives a 100-node
    path graph through in 8 rounds, where single-step propagation
    would need 99.

    The pair list itself is produced by the distributed
    ``near_dup_pairs_minhash`` (output-sized, ``MAX_DRIVER_PAIRS``-
    guarded); at corpus-scale pair volumes the verify buckets would
    hand their pair blocks straight to this propagation as a Dataset,
    skipping the driver hop. Oracle: DuckDB recursive-CTE transitive
    closure over the same pair SQL.
    """
    from .relational import _join_partitions

    pairs = near_dup_pairs_minhash(sf_dir)
    if not len(pairs):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64"),
                             "is_survivor": pd.Series([], dtype="int64")})
    n_parts = _join_partitions(sf_dir, "documents", "documents")
    return _propagate_components(pairs, n_parts, max_rounds)


def _propagate_components(pairs: pd.DataFrame, n_parts: int,
                          max_rounds: int = 16) -> pd.DataFrame:
    """The propagation core (see ``dedup_clusters``): (doc_a, doc_b)
    pair frame → (doc_id, cluster_id, is_survivor), min-label fixpoint
    in Dataset ops. Split out so tests can drive it with adversarial
    edge shapes (chains needing diameter rounds, not just the shallow
    near-dup components)."""
    src = pd.concat([pairs["doc_a"], pairs["doc_b"]], ignore_index=True)
    dst = pd.concat([pairs["doc_b"], pairs["doc_a"]], ignore_index=True)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64())}))
    nodes = np.sort(src.unique())
    # the joins here are NODE-SET-sized, so the partition count must
    # scale with |nodes|, floored so every partition averages >=32
    # rows: Ray 2.49's hash-shuffle aggregator builds a partition that
    # received zero rows WITHOUT a schema, and pyarrow's join then
    # fails on the missing key field (measured: 10 nodes over 8
    # partitions reproduces it; at >=32 rows/partition the
    # empty-partition probability is ~(1-1/p)^(32p) — negligible)
    n_parts = max(1, min(n_parts, len(nodes) // 32))
    labels = rd.from_arrow(pa.table({
        "node": pa.array(nodes, type=pa.int64()),
        "label": pa.array(nodes, type=pa.int64())})).materialize()
    prev_sum = int(nodes.sum())

    def as_msg(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["dst"], "label": batch["label"]})

    for _ in range(max_rounds):
        msgs = edges.join(labels, join_type="inner",
                          num_partitions=n_parts,
                          on=("src",), right_on=("node",),
                          aggregator_ray_remote_args={"num_cpus": 0.1}) \
            .map_batches(as_msg, batch_format="pyarrow")
        # pointer jump: (node, label) x (node'=label, label') ->
        # (node, label') — halves remaining chain depth every round
        jump = labels.join(
            labels.map_batches(lambda t: pa.table(
                {"jnode": t["node"], "jlabel": t["label"]}),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=n_parts,
            on=("label",), right_on=("jnode",),
            aggregator_ray_remote_args={"num_cpus": 0.1}) \
            .map_batches(lambda t: pa.table(
                {"node": t["node"], "label": t["jlabel"]}),
                batch_format="pyarrow")
        labels = labels.union(msgs).union(jump) \
            .groupby("node").min("label") \
            .map_batches(lambda t: pa.table({
                "node": t["node"],
                "label": pc.cast(t["min(label)"], pa.int64())}),
                batch_format="pyarrow") \
            .materialize()
        cur_sum = int(labels.sum("label"))
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = labels.to_pandas().rename(
        columns={"node": "doc_id", "label": "cluster_id"})
    out = out.astype({"doc_id": "int64", "cluster_id": "int64"})
    out["is_survivor"] = (out["doc_id"] == out["cluster_id"]).astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)
