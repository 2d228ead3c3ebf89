"""Training-mix sampler gates: budget compliance, greedy maximality,
determinism (pipelines/sampling.py — the distributed prefix-sum)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ocr_pipeline_ray.pipelines.sampling import (BUDGET_DEN, BUDGET_NUM,
                                                 HASH_K, HASH_MOD,
                                                 training_mix_sample)

SF = "/root/testdata/sf0.001"


def _truth_frame():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "lang", "text"]).to_pandas()
    t["n_tokens"] = t["text"].str.split(" ").str.len()
    t["h"] = (t["doc_id"].astype(np.int64) * HASH_K) % HASH_MOD
    return t


def test_budget_compliance_and_greedy_maximality(ray_session):
    out = training_mix_sample(SF)
    truth = _truth_frame()
    budgets = {g: (int(s) * BUDGET_NUM) // BUDGET_DEN
               for g, s in truth.groupby("lang")["n_tokens"].sum().items()}
    assert set(out["lang"]) <= set(budgets)
    picked = set(out["doc_id"])
    for lang, grp in truth.sort_values(["h", "doc_id"]).groupby("lang"):
        sel = grp[grp["doc_id"].isin(picked)]
        total = int(sel["n_tokens"].sum())
        # within budget...
        assert total <= budgets[lang], lang
        # ...selection is exactly the maximal hash-order prefix: every
        # selected doc precedes every rejected one UNLESS the rejected
        # doc is the first overflow point (greedy prefix rule)
        cum = grp["n_tokens"].cumsum()
        expect = set(grp.loc[cum <= budgets[lang], "doc_id"])
        assert set(sel["doc_id"]) == expect, lang
    # token counts carried through unchanged
    m = out.merge(truth[["doc_id", "n_tokens"]], on="doc_id",
                  suffixes=("", "_t"))
    assert (m["n_tokens"] == m["n_tokens_t"]).all()


def test_deterministic_across_runs(ray_session):
    a = training_mix_sample(SF)
    b = training_mix_sample(SF)
    pd.testing.assert_frame_equal(a, b)
