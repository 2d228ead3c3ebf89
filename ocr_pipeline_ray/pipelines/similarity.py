"""Similarity search over the ``embeddings`` table (list<float> column).

- brute-force cosine top-k: the baseline — numpy matmul per batch
  against a broadcast query vector/matrix (``ray.put`` once, read in
  every task), per-batch top-k then a tiny global top-k. No shuffle.
- embedding near-dup: all pairs above a cosine threshold via the same
  broadcast-matrix pattern (each batch of rows × the full matrix);
  the O(n²) work is sharded across batches. The scale path is an
  IVF/LSH-bucketed variant (ivf_topk below) that probes only the
  nearest coarse cells.

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


def _emb_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def knn_brute_force(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k by cosine similarity to the vec_id=0 embedding (query vector
    broadcast once; per-batch partial top-k; deterministic ordering by
    (rounded sim desc, vec_id asc))."""
    ids, mat = _emb_matrix(sf_dir)
    q = mat[ids == 0][0]
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        vid = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
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
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
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


def embedding_near_dup_pairs(sf_dir: str) -> pd.DataFrame:
    """Cosine near-dup pairs over the corpus augmented with exact copies
    of the first N_COPY_VECS vectors (vec_id+COPY_OFFSET) — broadcast
    full matrix, shard the pair scan across batches, keep (a < b,
    cosine ≥ 0.999). Matches the oracle's exhaustive cross join."""
    ids, mat = _emb_matrix(sf_dir)
    copy_mask = ids < N_COPY_VECS
    aug_ids = np.concatenate([ids, ids[copy_mask] + COPY_OFFSET])
    aug_mat = np.vstack([mat, mat[copy_mask]])
    norms = np.linalg.norm(aug_mat, axis=1)
    unit = aug_mat / np.where(norms > 0, norms, 1.0)[:, None]
    ref = ray.put((aug_ids, unit))

    ds = rd.from_arrow(pa.table({"vec_id": pa.array(aug_ids, type=pa.int64()),
                                 "row": pa.array(range(len(aug_ids)),
                                                 type=pa.int64())}))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_unit = ray.get(ref)
        rows = np.asarray(batch["row"].to_pylist(), dtype=np.int64)
        sims = all_unit[rows] @ all_unit.T  # (batch, n)
        out_a, out_b, out_s = [], [], []
        for bi, r in enumerate(rows):
            hits = np.where(sims[bi] >= COSINE_DUP_THRESHOLD)[0]
            for h in hits:
                if all_ids[r] < all_ids[h]:
                    out_a.append(all_ids[r])
                    out_b.append(all_ids[h])
                    out_s.append(round(float(sims[bi, h]), 4))
        return pa.table({"vec_a": pa.array(out_a, type=pa.int64()),
                         "vec_b": pa.array(out_b, type=pa.int64()),
                         "cosine_sim": pa.array(out_s, type=pa.float64())})

    out = ds.map_batches(pairs, batch_format="pyarrow", batch_size=512).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


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
    import pyarrow.parquet as _pq

    pf = _pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=train_sample,
                                 columns=["vec_id", "embedding"]))
    sample = np.asarray(first["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(sample, axis=1)
    sample_unit = sample / np.where(norms > 0, norms, 1.0)[:, None]
    centroids = _train_coarse_quantizer(sample_unit, n_cells)

    sample_ids = np.asarray(first["vec_id"].to_pylist(), dtype=np.int64)
    if 0 in sample_ids:
        q = sample_unit[sample_ids == 0][0]
    else:  # query vector outside the training sample: targeted read
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "=", 0)])
        qv = np.asarray(t["embedding"].to_pylist()[0], dtype=np.float64)
        q = qv / np.linalg.norm(qv)
    probe_cells = np.argsort(-(centroids @ q))[:n_probe]
    ref = ray.put((q, centroids, np.asarray(sorted(probe_cells))))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def probe_topk(batch: pa.Table) -> pa.Table:
        qv, cents, cells = ray.get(ref)
        vid = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        m = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
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
