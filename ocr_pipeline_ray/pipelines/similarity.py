"""Similarity search over the ``embeddings`` table (list<float> column).

- brute-force cosine top-k: the baseline — numpy matmul per batch
  against a broadcast query vector (predicate-pushdown read of ONE
  row, ``ray.put`` once, read in every task), per-batch top-k then a
  tiny global top-k. No shuffle, nothing corpus-sized on the driver.
- embedding near-dup: IVF-cell-bucketed candidate generation — every
  vector is assigned to its ``n_assign`` nearest coarse cells
  (broadcast centroid matrix, one matmul per batch) and pairs are
  emitted ONLY inside each cell's ``map_groups`` task. No all-pairs
  scan, no corpus-matrix broadcast; the partitioning assumption is
  that near-dup pairs co-assign to at least one cell (guaranteed for
  the ≥0.999-cosine regime: such pairs' centroid similarities are
  near-identical, so multi-assign overlaps; asserted against the
  exhaustive answer in tests).

All cosine math is float64 on both sides (the DuckDB oracle casts to
DOUBLE[]) so rounded values hash identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

N_COPY_VECS = 5
COPY_OFFSET = 10_000
COSINE_DUP_THRESHOLD = 0.999


def _emb_np(col) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix via Arrow flatten —
    no per-row Python objects (``to_pylist`` built n × dim PyFloats in
    every hot kernel). float32→float64 widening is exact, so results
    are bit-identical to the old path."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _query_unit(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Unit-normalized query vector via a predicate-pushdown read of
    exactly one row — never the whole embeddings table on the driver."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", vec_id)])
    q = np.asarray(t["embedding"].to_pylist()[0], dtype=np.float64)
    return q / np.linalg.norm(q)


def knn_brute_force(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k by cosine similarity to the vec_id=0 embedding (query vector
    broadcast once; per-batch partial top-k; deterministic ordering by
    (rounded sim desc, vec_id asc))."""
    q_ref = ray.put(_query_unit(sf_dir))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        vid = batch["vec_id"].to_numpy().astype(np.int64)
        m = _emb_np(batch["embedding"])
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ qv) / np.where(norms > 0, norms, 1.0)
        mask = vid != 0
        vid, sims = vid[mask], np.round(sims[mask], 6)
        order = np.lexsort((vid, -sims))[:k]
        return pa.table({"vec_id": pa.array(vid[order], type=pa.int64()),
                         "cosine_sim": pa.array(sims[order], type=pa.float64())})

    out = ds.map_batches(topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    out = out.sort_values(["cosine_sim", "vec_id"],
                          ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def embedding_centroid_mass(sf_dir: str) -> pd.DataFrame:
    """Per label: count + mean of per-vector element sums (a scalar
    centroid statistic that stays SQL-checkable)."""
    from ..stages.agg import partial_merge

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["label", "embedding"])

    def mass(batch: pa.Table) -> pa.Table:
        # per-vector sum quantized to int64 micro-units: numpy's pairwise
        # summation and DuckDB's sequential list_sum agree to within an
        # ulp, and the quantized integers (then an exact int sum) are
        # order-independent across engines
        m = _emb_np(batch["embedding"])
        vs_i = np.floor(m.sum(axis=1) * 1e6 + 0.5).astype(np.int64)
        return pa.table({"label": batch["label"],
                         "vs_i": pa.array(vs_i, type=pa.int64())})

    def mass_partial(batch: pa.Table) -> pa.Table:
        t = mass(batch)
        g = t.to_pandas().groupby("label", as_index=False).agg(
            n_vecs=("vs_i", "size"), vs_i=("vs_i", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata()

    # cardinality: label — small fixed label set, bounded
    out = partial_merge(ds, mass_partial, keys=["label"],
                        agg_spec={"n_vecs": ("n_vecs", "sum"),
                                  "vs_i": ("vs_i", "sum")})
    out["n_vecs"] = out["n_vecs"].astype("int64")
    out["avg_vec_sum"] = (out["vs_i"] / 1e6) / out["n_vecs"].astype("float64")
    out["label"] = out["label"].astype("int32")
    out = out[["label", "n_vecs", "avg_vec_sum"]]
    return out.sort_values("label").reset_index(drop=True)


def embedding_near_dup_pairs(sf_dir: str, n_cells: int = 16,
                             n_assign: int = 2,
                             train_sample: int = 2048) -> pd.DataFrame:
    """Cosine near-dup pairs over the corpus augmented with exact copies
    of the first N_COPY_VECS vectors (vec_id+COPY_OFFSET), via
    IVF-CELL-BUCKETED candidate generation (the 100 TB shape — the
    previous version broadcast the full unit matrix and scanned all n²
    pairs):

    1. TRAIN (driver, small): spherical k-means coarse quantizer on a
       ``train_sample`` prefix (same step as ivf_topk);
    2. ASSIGN (distributed): each batch normalizes its vectors, adds
       the seeded copies, and emits one (cell, vec_id, unit-vector)
       row per ``n_assign`` nearest cells — multi-assign makes a
       ≥0.999-cosine pair share at least one cell (near-identical
       vectors have near-identical centroid similarities; exact
       copies share ALL cells);
    3. ``groupby(cell)`` → pairwise cosine WITHIN each cell task only
       (O(Σ|cell|²), never O(n²)); cross-cell duplicates of a pair
       are dropped after the (tiny) pair set reaches the driver.

    Matches the oracle's exhaustive cross join (equality vs the
    brute-force answer asserted in tests/test_similarity.py). Scale
    note: n_cells should grow ~√n so cells stay bounded; skewed cells
    would need a split-and-mirror salt."""
    sample_unit, _ids = _sample_unit(sf_dir, train_sample)
    centroids = _train_coarse_quantizer(sample_unit, n_cells)
    cent_ref = ray.put(centroids)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def assign_cells(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        vid = batch["vec_id"].to_numpy().astype(np.int64)
        m = _emb_np(batch["embedding"])
        copy_mask = vid < N_COPY_VECS
        vid = np.concatenate([vid, vid[copy_mask] + COPY_OFFSET])
        m = np.vstack([m, m[copy_mask]])
        norms = np.linalg.norm(m, axis=1)
        unit = m / np.where(norms > 0, norms, 1.0)[:, None]
        top = np.argsort(-(unit @ cents.T), axis=1)[:, :n_assign]
        ids_out = np.repeat(vid, n_assign)
        units_out = np.repeat(unit, n_assign, axis=0)
        return pa.table({
            "cell": pa.array(top.ravel().astype(np.int64), type=pa.int64()),
            "vec_id": pa.array(ids_out, type=pa.int64()),
            "unit": pa.array(list(units_out),
                             type=pa.list_(pa.float64())),
        })

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id")
        ids = g["vec_id"].to_numpy()
        unit = np.vstack(g["unit"].to_numpy())
        sims = unit @ unit.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= COSINE_DUP_THRESHOLD
        a, b = ids[iu[hit]], ids[ju[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({
            "vec_a": pd.Series(lo, dtype="int64"),
            "vec_b": pd.Series(hi, dtype="int64"),
            "cosine_sim": np.round(sims[iu[hit], ju[hit]], 4),
        })

    out = ds.map_batches(assign_cells, batch_format="pyarrow",
                         batch_size=4096) \
        .groupby("cell").map_groups(cell_pairs, batch_format="pandas") \
        .to_pandas()
    out = out.drop_duplicates(["vec_a", "vec_b"])
    out = out.astype({"vec_a": "int64", "vec_b": "int64"})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def _sample_unit(sf_dir: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """First ``n`` embeddings, unit-normalized (quantizer training
    sample — a bounded prefix read, not the full table)."""
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=n,
                                 columns=["vec_id", "embedding"]))
    sample = np.asarray(first["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(sample, axis=1)
    unit = sample / np.where(norms > 0, norms, 1.0)[:, None]
    ids = np.asarray(first["vec_id"].to_pylist(), dtype=np.int64)
    return unit, ids


def _train_coarse_quantizer(sample_unit: np.ndarray, n_cells: int,
                            iters: int = 5) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side SAMPLE (the
    standard IVF training step: the quantizer is trained on a small
    sample, never the full corpus). Strided init, fixed iteration
    count, empty cells keep their previous centroid."""
    stride = max(1, len(sample_unit) // n_cells)
    centroids = sample_unit[::stride][:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(sample_unit @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample_unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centroids[c] = m / n
    return centroids


def ivf_topk(sf_dir: str, k: int = 10, n_cells: int = 16, n_probe: int = 4,
             train_sample: int = 2048) -> pd.DataFrame:
    """IVF ANN, the 100 TB scale path for knn_brute_force:

    1. TRAIN (driver, small): spherical k-means coarse quantizer on the
       first ``train_sample`` vectors;
    2. ASSIGN + PROBE (distributed): every batch normalizes its
       vectors, assigns them to their nearest centroid (broadcast
       centroid matrix, one matmul) and keeps only rows in the
       ``n_probe`` cells nearest the query — the full corpus is never
       loaded on the driver;
    3. per-batch top-k over the probed subset → tiny global top-k.

    Results are approximate → rows-only driver check; recall vs brute
    force is asserted in tests."""
    sample_unit, sample_ids = _sample_unit(sf_dir, train_sample)
    centroids = _train_coarse_quantizer(sample_unit, n_cells)

    if 0 in sample_ids:
        q = sample_unit[sample_ids == 0][0]
    else:  # query vector outside the training sample: targeted read
        q = _query_unit(sf_dir)
    probe_cells = np.argsort(-(centroids @ q))[:n_probe]
    ref = ray.put((q, centroids, np.asarray(sorted(probe_cells))))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def probe_topk(batch: pa.Table) -> pa.Table:
        qv, cents, cells = ray.get(ref)
        vid = batch["vec_id"].to_numpy().astype(np.int64)
        m = _emb_np(batch["embedding"])
        n = np.linalg.norm(m, axis=1)
        unit = m / np.where(n > 0, n, 1.0)[:, None]
        assign = np.argmax(unit @ cents.T, axis=1)
        mask = np.isin(assign, cells) & (vid != 0)
        vid, unit = vid[mask], unit[mask]
        sims = np.round(unit @ qv, 6)
        order = np.lexsort((vid, -sims))[:k]
        return pa.table({"vec_id": pa.array(vid[order], type=pa.int64()),
                         "cosine_sim": pa.array(sims[order], type=pa.float64())})

    out = ds.map_batches(probe_topk, batch_format="pyarrow",
                         batch_size=4096).to_pandas()
    out = out.sort_values(["cosine_sim", "vec_id"], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)
