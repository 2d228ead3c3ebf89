"""Similarity-search invariants: IVF recall vs brute force, and the
trained coarse quantizer's determinism."""

from __future__ import annotations

import numpy as np

from ocr_pipeline_ray.pipelines import similarity

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_brute_force(ray_session):
    exact = similarity.knn_brute_force(SF_DIR, k=10)
    approx = similarity.ivf_topk(SF_DIR, k=10, n_cells=16, n_probe=4)
    assert len(approx) == 10
    recall = len(set(approx["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.5, f"IVF recall {recall} too low"
    # every approx hit's similarity must be a real (exact) similarity —
    # IVF never fabricates scores, it only prunes candidates
    exact_all = similarity.knn_brute_force(SF_DIR, k=10_000)
    sim_of = dict(zip(exact_all["vec_id"], exact_all["cosine_sim"]))
    for _, row in approx.iterrows():
        assert abs(sim_of[row["vec_id"]] - row["cosine_sim"]) < 1e-9


def test_coarse_quantizer_deterministic():
    rng = np.random.RandomState(3)
    sample = rng.randn(256, 16)
    sample /= np.linalg.norm(sample, axis=1)[:, None]
    a = similarity._train_coarse_quantizer(sample, 8)
    b = similarity._train_coarse_quantizer(sample, 8)
    assert np.array_equal(a, b)
    assert a.shape == (8, 16)
    # centroids stay unit-normalized
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
