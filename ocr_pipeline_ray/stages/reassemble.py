"""Per-document span-sequence reassembly (the north rule's shuffle).

``groupby(doc_id)`` + in-group sort by ``offset`` + dense re-rank —
the Ray-Data generalization of the reference's multi-page ordered
concat (pipeline.py:646-661, SURVEY §2.5 A1). Ordering is *data* (the
``offset``/``order`` columns), never an executor property, so the
result is invariant to Ray's unordered block completion (SURVEY §4
ordering row).

Skew note (100 TB design): the expensive work (OCR) happened *before*
this shuffle on exploded span rows, so groups here are narrow text
rows — a 1000-span document is a few hundred KB, far below any block
limit, and the hash shuffle spreads documents uniformly. Salting the
groupby key is therefore only needed for pathological multi-GB single
documents; ``salt_key`` implements the two-phase pattern for that case
(pre-rank within (doc_id, salt), then merge — see tests).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

KEEP_STATUSES = ("ok", "low_conf")
OUT_COLUMNS = ["doc_id", "order", "kind", "text", "media_ref", "conf", "status"]


def filter_keep(batch: pa.Table) -> pa.Table:
    """Drop blank/corrupt/boilerplate rows before the shuffle (cheap
    predicate pushdown: the shuffle moves only surviving rows)."""
    return batch.filter(pc.is_in(batch["status"], value_set=pa.array(KEEP_STATUSES)))


def _rank_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("offset", kind="mergesort")
    g = g.assign(order=np.arange(len(g), dtype=np.int32))
    return g[OUT_COLUMNS]


def reassemble(ds):
    """spans(doc_id, kind, text, media_ref, offset, status, conf) →
    ordered spans(doc_id, order, kind, text, media_ref, conf, status)."""
    ds = ds.map_batches(filter_keep, batch_format="pyarrow")
    return ds.groupby("doc_id").map_groups(_rank_group, batch_format="pandas")


def salt_key(doc_ids: pa.Array, buckets: int) -> pa.Array:
    """Stable salt column for two-phase reassembly of pathological docs:
    crc32-based (NOT Python hash(), which is per-process randomized)."""
    return pa.array(
        [zlib.crc32(d.encode()) % buckets for d in doc_ids.to_pylist()],
        type=pa.int32(),
    )
