"""Partition-committed output layout with lineage records and resume.

The north rule requires a killed ``ray job submit`` run to resume from
the last committed partition, with per-partition lineage + extraction
metrics — the reference has *no* checkpointing (SURVEY §3 state
inventory: a killed run loses everything), so this is new design:

- input documents are assigned to ``num_parts`` partitions by a STABLE
  hash of ``doc_id`` (crc32 — never Python ``hash()``, which is
  per-process randomized);
- each partition runs the full extraction pipeline and writes parquet
  + ``_lineage.json`` (counts by status, docs, spans, confidence
  histogram, wall time) + the ``_SUCCESS`` marker into a TEMP dir that
  is then atomically renamed to ``part={pid}/`` — data and commit
  marker appear together, so no kill window can expose an uncommitted
  partition;
- resume = re-invoke with the same args: partitions whose marker
  exists are skipped, everything else recomputes. Output readers MUST
  filter to partitions containing ``_SUCCESS`` (glob
  ``part=*/_SUCCESS`` then read that partition's ``*.parquet``).

At 100 TB the partition count is sized so one partition's spans fit
comfortably in the cluster's object store (e.g. 4096 partitions of
~25 GB); partitions are the retry/resume unit, blocks inside a
partition stream as usual.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib

import numpy as np
import pyarrow as pa

from ..pipelines.extract import (build_media_lookup, extract_spans,
                                 extract_spans_hybrid)


def _part_of(doc_id: str, num_parts: int) -> int:
    return zlib.crc32(doc_id.encode()) % num_parts


def partition_filter(num_parts: int, pid: int):
    def fn(batch: pa.Table) -> pa.Table:
        mask = [_part_of(d, num_parts) == pid
                for d in batch["doc_id"].to_pylist()]
        return batch.filter(pa.array(mask))
    return fn


def _lineage_record(spans_df, pid: int, wall_s: float) -> dict:
    conf = spans_df["conf"].to_numpy()
    hist, edges = np.histogram(conf, bins=10, range=(0.0, 1.0))
    return {
        "partition": pid,
        "n_docs": int(spans_df["doc_id"].nunique()),
        "n_spans": int(len(spans_df)),
        "status_counts": {k: int(v) for k, v in
                          spans_df["status"].value_counts().items()},
        "kind_counts": {k: int(v) for k, v in
                        spans_df["kind"].value_counts().items()},
        "conf_histogram": {f"{edges[i]:.1f}-{edges[i+1]:.1f}": int(hist[i])
                           for i in range(len(hist))},
        "wall_seconds": round(wall_s, 3),
        "committed_at_epoch": time.time(),
    }


def run_partitioned(corpus_dir: str, out_dir: str, num_parts: int = 8) -> dict:
    """Run the flagship pipeline partition-by-partition with commit
    markers; safe to re-invoke after a kill (completed partitions are
    skipped). Returns {"completed": [...], "skipped": [...]}."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    media_ref = build_media_lookup(os.path.join(corpus_dir, "media"))
    completed, skipped = [], []
    for pid in range(num_parts):
        part_dir = os.path.join(out_dir, f"part={pid}")
        marker = os.path.join(part_dir, "_SUCCESS")
        if os.path.exists(marker):
            skipped.append(pid)
            continue
        t0 = time.time()
        docs = rd.read_parquet(os.path.join(corpus_dir, "documents_spans"))
        docs = docs.map_batches(partition_filter(num_parts, pid),
                                batch_format="pyarrow")
        # hybrid path: byte-identical to extract_spans (tested), no
        # shuffle for ordinary docs → a partition is one map pass
        spans = extract_spans_hybrid(docs, media_lookup_ref=media_ref)
        tmp_dir = os.path.join(out_dir, f"_tmp_part={pid}")
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)  # stale temp from a killed run
        spans.write_parquet(tmp_dir)
        # lineage from the committed files (read-back = what readers see)
        spans_df = rd.read_parquet(tmp_dir).to_pandas()
        # marker + lineage are written INTO the temp dir BEFORE the
        # atomic rename, so data and commit marker appear together: a
        # kill in any window leaves either no part dir or a complete
        # one, and readers that filter on _SUCCESS (as documented)
        # never observe a half-published partition.
        with open(os.path.join(tmp_dir, "_lineage.json"), "w") as f:
            json.dump(_lineage_record(spans_df, pid, time.time() - t0), f)
        with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
            f.write("ok")
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)
        completed.append(pid)
    return {"completed": completed, "skipped": skipped}


def read_lineage(out_dir: str) -> list[dict]:
    recs = []
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name, "_lineage.json")
        if os.path.exists(p):
            with open(p) as f:
                recs.append(json.load(f))
    return recs
