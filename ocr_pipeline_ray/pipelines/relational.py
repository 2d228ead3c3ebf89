"""Relational operator suite over the TPC-H-ish testdata tables.

Demonstrates the engine's general query capabilities — grouped
aggregation with partial pre-aggregation, broadcast hash joins,
semi/anti joins via broadcast key sets, sort/top-k, distinct — each
expressed Ray-Data-first and paired with a DuckDB oracle in
``__ray_entry__.oracle_sql`` (the driver's correctness gate).

Scale notes (100 TB design):
- every read prunes columns (``columns=[...]``) and pushes filters
  into the parquet scan where possible;
- fact-side aggregations pre-aggregate per batch inside
  ``map_batches`` before the (small) final ``groupby`` — the shuffle
  moves one row per (key, batch), not per input row;
- dimension sides (customer, orders subsets, key sets) are broadcast
  via ``ray.put`` once and read per actor/task, never re-shipped per
  batch and never shuffled.

Float policy: every aggregate that leaves this module is rounded
(ROUND in the oracle SQL, np.round here) so distributed summation
order cannot flip the value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _lineitem(sf_dir: str, columns: list[str], filter_expr=None):
    return rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=columns,
                           filter=filter_expr)


# --- q1: pricing summary (grouped agg with partial pre-aggregation) ---

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Per (returnflag, linestatus): sums/avgs/counts, TPC-H Q1 shape."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax"]
    ds = _lineitem(sf_dir, cols)

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), t["l_tax"]))
        t = t.append_column("disc_price", disc_price)
        t = t.append_column("charge", charge)
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_charge", alias_name="sum_charge"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("count_order", alias_name="count_order"),
    ).to_pandas()
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(4)
    out["avg_price"] = (out["sum_base_price"] / out["count_order"]).round(4)
    out["avg_disc"] = (out["sum_disc"] / out["count_order"]).round(4)
    out = out.drop(columns=["sum_disc"])
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"]:
        out[c] = out[c].round(2)
    out["count_order"] = out["count_order"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# --- q3: broadcast-join shipping priority ---

def q3_top_revenue_orders(sf_dir: str) -> pd.DataFrame:
    """BUILDING-segment customers ⋈ orders ⋈ lineitem → top-10 revenue.

    Both dimension sides are small after filtering → broadcast pattern:
    ray.put once, look up inside map_batches (no shuffle join)."""
    cust = pa.parquet.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    building = set(
        cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"].to_pylist())
    orders = pa.parquet.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    omask = pc.is_in(orders["o_custkey"], value_set=pa.array(list(building), type=pa.int64()))
    orders_b = orders.filter(omask)
    odate = dict(zip(orders_b["o_orderkey"].to_pylist(),
                     orders_b["o_orderdate"].to_pylist()))
    odate_ref = ray.put(odate)

    ds = _lineitem(sf_dir, ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        lookup = ray.get(odate_ref)
        keys = t["l_orderkey"].to_numpy()
        mask = np.fromiter((k in lookup for k in keys), dtype=bool, count=len(keys))
        t = t.filter(pa.array(mask))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        df = pa.table({"l_orderkey": t["l_orderkey"], "revenue": rev}).to_pandas()
        g = df.groupby("l_orderkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_order = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("l_orderkey").aggregate(Sum("revenue", alias_name="revenue")) \
        .to_pandas()
    per_order["revenue"] = per_order["revenue"].round(2)
    per_order["o_orderdate"] = per_order["l_orderkey"].map(odate)
    top = per_order.sort_values(["revenue", "l_orderkey"],
                                ascending=[False, True]).head(10)
    return top[["l_orderkey", "o_orderdate", "revenue"]].reset_index(drop=True)


# --- q5: nation revenue via broadcast dimension chain ---

def q5_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """region→nation→customer→orders dimension chain broadcast onto the
    lineitem fact scan; revenue grouped by nation name."""
    nation = pa.parquet.read_table(f"{sf_dir}/nation.parquet")
    cust = pa.parquet.read_table(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_nationkey"])
    orders = pa.parquet.read_table(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    nation_name = dict(zip(nation["n_nationkey"].to_pylist(),
                           nation["n_name"].to_pylist()))
    cust_nation = dict(zip(cust["c_custkey"].to_pylist(),
                           cust["c_nationkey"].to_pylist()))
    order_nation = {
        ok: cust_nation[ck]
        for ok, ck in zip(orders["o_orderkey"].to_pylist(),
                          orders["o_custkey"].to_pylist())
        if ck in cust_nation
    }
    lookup_ref = ray.put(order_nation)

    ds = _lineitem(sf_dir, ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        keys = t["l_orderkey"].to_numpy()
        nk = np.fromiter((lookup.get(k, -1) for k in keys), dtype=np.int64,
                         count=len(keys))
        rev = (t["l_extendedprice"].to_numpy()
               * (1.0 - t["l_discount"].to_numpy()))
        df = pd.DataFrame({"n_nationkey": nk, "revenue": rev})
        df = df[df["n_nationkey"] >= 0]
        g = df.groupby("n_nationkey", as_index=False)["revenue"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("n_nationkey").aggregate(Sum("revenue", alias_name="revenue")) \
        .to_pandas()
    out["n_name"] = out["n_nationkey"].map(nation_name)
    out["revenue"] = out["revenue"].round(2)
    return out[["n_name", "revenue"]].sort_values("n_name").reset_index(drop=True)


# --- q6: forecast revenue (filter + global sum) ---

def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    ds = _lineitem(
        sf_dir, ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
        filter_expr=(
            (pads.field("l_shipdate") >= pa.scalar(pd.Timestamp("1995-01-01")))
            & (pads.field("l_shipdate") < pa.scalar(pd.Timestamp("1996-01-01")))
            & (pads.field("l_discount") >= 0.03)
            & (pads.field("l_discount") <= 0.07)
            & (pads.field("l_quantity") < 24)
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py() or 0.0
        return pa.table({"revenue": pa.array([rev], type=pa.float64())})

    total = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .aggregate(Sum("revenue", alias_name="revenue"))
    return pd.DataFrame([{"revenue": round(total["revenue"], 2)}])


# --- top-k / sort ---

def top10_orders_by_price(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_totalprice"])
    # per-batch top-k, then a tiny global top-k — no full sort shuffle
    def topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = ds.map_batches(topk, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = out.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(10)
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out.reset_index(drop=True)


# --- grouped aggregate over a dimension table ---

def customer_segment_stats(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_mktsegment", "c_acctbal"])
    out = ds.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers"),
        Mean("c_acctbal", alias_name="avg_acctbal"),
        Min("c_acctbal", alias_name="min_acctbal"),
        Max("c_acctbal", alias_name="max_acctbal"),
    ).to_pandas()
    out["avg_acctbal"] = out["avg_acctbal"].round(4)
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# --- semi-join via broadcast key set ---

def late_shipment_order_priority(sf_dir: str) -> pd.DataFrame:
    """Orders with ≥1 lineitem shipped >60 days after order date,
    counted per priority. Semi-join: the qualifying key set is built on
    the fact scan, broadcast, then applied to orders."""
    orders = pa.parquet.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    odate_ref = ray.put(dict(zip(orders["o_orderkey"].to_pylist(),
                                 orders["o_orderdate"].to_pylist())))

    ds = _lineitem(sf_dir, ["l_orderkey", "l_shipdate"])

    def qualifying(t: pa.Table) -> pa.Table:
        lookup = ray.get(odate_ref)
        keys = t["l_orderkey"].to_pylist()
        ships = t["l_shipdate"].to_pylist()
        late = {k for k, s in zip(keys, ships)
                if k in lookup and (s - lookup[k]).days > 60}
        return pa.table({"o_orderkey": pa.array(sorted(late), type=pa.int64())})

    late_keys = set()
    for b in ds.map_batches(qualifying, batch_format="pyarrow",
                            batch_size=65536).iter_batches(batch_format="pyarrow"):
        late_keys.update(b["o_orderkey"].to_pylist())

    df = orders.to_pandas()
    df = df[df["o_orderkey"].isin(late_keys)]
    out = df.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("o_orderkey", "size"))
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# --- anti-join via broadcast key set ---

def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    orders = pa.parquet.read_table(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    with_orders = ray.put(set(orders["o_custkey"].to_pylist()))
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(with_orders)
        mask = [k not in keys for k in t["c_custkey"].to_pylist()]
        return t.filter(pa.array(mask))

    out = ds.map_batches(anti, batch_format="pyarrow") \
        .groupby("c_mktsegment").aggregate(Count(alias_name="n_customers")) \
        .to_pandas()
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# --- distinct ---

def distinct_part_types(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_type"])
    vals = sorted(ds.unique("p_type"))
    return pd.DataFrame({"p_type": vals})


# --- part stats (plain groupby, no pre-agg needed: small table) ---

def part_brand_stats(sf_dir: str) -> pd.DataFrame:
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_brand", "p_retailprice", "p_size"])
    out = ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Mean("p_retailprice", alias_name="avg_price"),
        Max("p_size", alias_name="max_size"),
    ).to_pandas()
    out["avg_price"] = out["avg_price"].round(4)
    out["n_parts"] = out["n_parts"].astype("int64")
    out["max_size"] = out["max_size"].astype("int32")
    return out.sort_values("p_brand").reset_index(drop=True)
