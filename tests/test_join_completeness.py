"""Reductions downstream of ``Dataset.join`` must be KEY-complete, not
block-complete (r2 verdict finding #1 / ADVICE low #3).

Ray 2.49's hash-shuffle join happens to emit one block per partition,
but that is an undocumented implementation detail (upstream carries a
"TODO break down blocks to target size"); a per-block sum/top-k/
distinct silently under-counts any key whose rows land in two blocks.
These tests feed the bucketed reduction helpers deliberately
FRAGMENTED datasets — the same key scattered across many blocks, the
worst case a block-splitting join could ever produce — and require
exact answers; the q3 end-to-end test additionally shrinks
``DataContext.target_max_block_size`` so any size-based block split
Ray performs is actually exercised.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocr_pipeline_ray.pipelines.relational import (bucketed_distinct_count,
                                                   bucketed_sum_topk)

SF_DIR = "/root/testdata/sf0.001"


def test_topk_sums_keys_split_across_blocks(ray_session):
    # 50 keys; each key's revenue arrives as 8 partial rows living in 8
    # DIFFERENT blocks. A per-block top-k would rank single fragments.
    rng = np.random.RandomState(7)
    keys = np.arange(50, dtype=np.int64)
    frags = rng.randint(1, 1000, size=(8, 50)).astype(np.int64)
    dates = (pd.Timestamp("1995-01-01")
             + pd.to_timedelta(keys % 7, unit="D"))
    tables = [pa.table({"l_orderkey": pa.array(keys),
                        "o_orderdate": pa.array(dates),
                        "rev_i": pa.array(frags[f])})
              for f in range(8)]
    out = bucketed_sum_topk(rd.from_arrow(tables), key="l_orderkey",
                            carry="o_orderdate", val="rev_i", k=10)
    totals = frags.sum(axis=0)
    expect = pd.DataFrame({"l_orderkey": keys, "rev_i": totals}) \
        .sort_values(["rev_i", "l_orderkey"], ascending=[False, True]).head(10)
    got = out.sort_values(["rev_i", "l_orderkey"],
                          ascending=[False, True]).head(10)
    assert got["l_orderkey"].tolist() == expect["l_orderkey"].tolist()
    assert got["rev_i"].tolist() == expect["rev_i"].tolist()
    # sanity: fragments alone could never reach the true totals
    assert frags.max() < totals.min()


def test_distinct_count_keys_repeated_across_blocks(ray_session):
    # every key appears in 6 different blocks; EXISTS semantics must
    # count it once (a per-block dedup + sum counts it 6 times)
    keys = np.arange(40, dtype=np.int64)
    prios = ["P1" if k % 2 == 0 else "P2" for k in keys]
    tables = [pa.table({"l_orderkey": pa.array(keys),
                        "o_orderpriority": pa.array(prios)})
              for _ in range(6)]
    out = bucketed_distinct_count(rd.from_arrow(tables), key="l_orderkey",
                                  by="o_orderpriority")
    assert dict(zip(out["o_orderpriority"], out["n"])) == {"P1": 20, "P2": 20}


def test_q3_and_late_shipment_exact_under_tiny_blocks(ray_session):
    """End-to-end: the flagship join queries stay hash-exact when every
    size-based block split Ray can perform is forced (64 KiB target)."""
    import __ray_entry__ as entrymod
    from ocr_pipeline_ray.pipelines.relational import (
        late_shipment_order_priority, q3_top_revenue_orders)
    from ray.data import DataContext

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracles = entrymod.oracle_sql()
    duck_q3 = con.sql(oracles["q3_top_revenue_orders"]).df()
    duck_late = con.sql(oracles["late_shipment_order_priority"]).df()

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 64 * 1024
    try:
        got_q3 = q3_top_revenue_orders(SF_DIR)
        got_late = late_shipment_order_priority(SF_DIR)
    finally:
        ctx.target_max_block_size = old

    pd.testing.assert_frame_equal(
        got_q3.reset_index(drop=True), duck_q3.reset_index(drop=True),
        check_dtype=False)
    pd.testing.assert_frame_equal(
        got_late.reset_index(drop=True), duck_late.reset_index(drop=True),
        check_dtype=False)
