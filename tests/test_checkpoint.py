"""Checkpoint/resume: killed-run semantics, commit markers, lineage."""

from __future__ import annotations

import os

import pandas as pd
import pytest
import ray.data as rd

from ocr_pipeline_ray.state import checkpoint


@pytest.fixture(scope="module")
def out_dirs(tmp_path_factory):
    return tmp_path_factory.mktemp("ckpt")


def _read_all(out_dir: str) -> pd.DataFrame:
    import glob
    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    df = rd.read_parquet(files).to_pandas()
    return df.sort_values(["doc_id", "order"]).reset_index(drop=True)


def test_partitioned_run_resume_and_equality(small_corpus, out_dirs):
    full_dir = str(out_dirs / "full")
    resumed_dir = str(out_dirs / "resumed")

    # one-shot run
    r1 = checkpoint.run_partitioned(small_corpus, full_dir, num_parts=4)
    assert sorted(r1["completed"]) == [0, 1, 2, 3]

    # "killed" run: only partitions 0 and 1 committed...
    r_partial = checkpoint.run_partitioned(small_corpus, resumed_dir, num_parts=4)
    # simulate the kill retroactively: delete partitions 2,3 commits
    for pid in (2, 3):
        import shutil
        shutil.rmtree(os.path.join(resumed_dir, f"part={pid}"))
    # ...resume: 0,1 skipped, 2,3 recomputed
    r2 = checkpoint.run_partitioned(small_corpus, resumed_dir, num_parts=4)
    assert sorted(r2["skipped"]) == [0, 1]
    assert sorted(r2["completed"]) == [2, 3]

    # resumed output equals the one-shot output exactly
    pd.testing.assert_frame_equal(_read_all(full_dir), _read_all(resumed_dir))

    # idempotent re-run: everything skipped
    r3 = checkpoint.run_partitioned(small_corpus, resumed_dir, num_parts=4)
    assert sorted(r3["skipped"]) == [0, 1, 2, 3]


def test_lineage_records(small_corpus, out_dirs):
    out = str(out_dirs / "lineage")
    checkpoint.run_partitioned(small_corpus, out, num_parts=2)
    recs = checkpoint.read_lineage(out)
    assert len(recs) == 2
    for r in recs:
        assert r["n_spans"] > 0 and r["n_docs"] > 0
        assert sum(r["conf_histogram"].values()) == r["n_spans"]
        assert set(r["kind_counts"]) <= {"text", "media"}
        assert r["wall_seconds"] > 0
    # partition assignment is disjoint + complete over docs
    total_docs = sum(r["n_docs"] for r in recs)
    docs = rd.read_parquet(f"{small_corpus}/documents_spans").count()
    assert total_docs == docs
