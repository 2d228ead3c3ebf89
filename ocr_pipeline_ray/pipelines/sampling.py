"""Training-mix sampling: token-budget document selection per stratum.

The data-mixing step of a training-data pipeline: from each language
stratum, select documents in a DETERMINISTIC pseudo-random order (a
multiplicative hash of doc_id — reproducible across runs and engines,
unlike an RNG) until the stratum's token budget is met. The selection
rule is greedy-prefix: a document is kept iff the running token total
up to and including it (in hash order) does not exceed the budget.

Scale shape — a distributed PREFIX SUM, not a per-stratum collect:

1. one narrow pass computes (doc_id, lang, n_tokens, h) per row and
   the per-stratum token totals (a bounded ``|langs|``-sized reduce;
   budget = 30% of each stratum, in exact integer arithmetic);
2. ``sort(lang, h, doc_id)`` puts every stratum's rows in selection
   order across blocks;
3. per-block token subtotals flow back as SCALARS (one int per block —
   the driver holds block refs and |blocks| numbers, never rows), the
   driver computes each block's exclusive starting offset per lang —
   the classic two-phase parallel prefix sum;
4. one task per block filters its rows against (offset + local
   cumsum) ≤ budget, in parallel, handing back Arrow refs.

Raw Ray tasks appear only in step 4 (the documented last-resort case:
the operator needs each block paired with ITS ordered offset, which
``map_batches`` cannot express — blocks carry no order identity).
Partitioning assumption: the step-2 sort co-locates and orders each
stratum's rows; offsets are exact because block order is the sort
order. Everything driver-side is bounded by the block count.

Oracle: the same selection as one SQL window —
``sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id)`` with
``cum <= budget`` — hash, budget and cumsum all in exact int64 on
both sides, so the driver gate is hash-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

# Knuth's multiplicative hash constant: deterministic, SQL-expressible
# (doc_id * K) % 2^32 — products stay far under 2^63 for any real
# doc_id, so int64 arithmetic is exact in numpy AND DuckDB.
HASH_K = 2654435761
HASH_MOD = 2**32
# budget = 30% of each stratum's tokens, computed as (total*3)//10 in
# INTEGER arithmetic — a float 0.3*total disagrees with SQL's decimal
# 0.3 at e.g. total=10 (2.999… vs 3.0), so floats never touch this.
BUDGET_NUM, BUDGET_DEN = 3, 10


def _doc_tokens(batch: pa.Table) -> pa.Table:
    """(doc_id, lang, n_tokens, h): whitespace token count (the same
    definition as text.doc_token_stats) + the selection-order hash."""
    ids = batch["doc_id"].to_pylist()
    n_tok = [len(t.split(" ")) for t in batch["text"].to_pylist()]
    h = (np.asarray(ids, dtype=np.int64) * HASH_K) % HASH_MOD
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "lang": batch["lang"],
        "n_tokens": pa.array(n_tok, type=pa.int64()),
        "h": pa.array(h, type=pa.int64()),
    })


@ray.remote
def _block_lang_sums(block) -> dict[str, int]:
    """Per-(block, lang) token subtotal — one tiny dict per block."""
    df = block.to_pandas() if not isinstance(block, pd.DataFrame) else block
    return df.groupby("lang")["n_tokens"].sum().astype(int).to_dict()


@ray.remote
def _select_block(block, offsets: dict[str, int], budgets: dict[str, int]):
    """Keep this block's rows whose (stratum offset + local running
    token total) stays within the stratum budget. Rows are already in
    global (lang, h, doc_id) order, so offset + local cumsum IS the
    global cumsum."""
    df = block.to_pandas() if not isinstance(block, pd.DataFrame) else block
    cum = df.groupby("lang")["n_tokens"].cumsum() \
        + df["lang"].map(lambda g: offsets.get(g, 0))
    keep = df[cum <= df["lang"].map(lambda g: budgets.get(g, 0))]
    return pa.Table.from_pandas(
        keep[["doc_id", "lang", "n_tokens"]], preserve_index=False)


def training_mix_sample(sf_dir: str) -> pd.DataFrame:
    """Token-budget stratified sample over the documents table →
    (doc_id, lang, n_tokens) of the selected mix, sorted by doc_id."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"]) \
        .map_batches(_doc_tokens, batch_format="pyarrow")

    from ray.data.aggregate import Sum
    totals = docs.groupby("lang").aggregate(
        Sum("n_tokens", alias_name="total")).to_pandas()  # |langs| rows
    budgets = {r["lang"]: (int(r["total"]) * BUDGET_NUM) // BUDGET_DEN
               for _, r in totals.iterrows()}

    block_refs = docs.sort(["lang", "h", "doc_id"]).to_arrow_refs()
    sums = ray.get([_block_lang_sums.remote(ref) for ref in block_refs])

    # exclusive prefix offsets per stratum, in block (= sort) order
    offsets: list[dict[str, int]] = []
    running: dict[str, int] = {}
    for s in sums:
        offsets.append(dict(running))
        for lang, n in s.items():
            running[lang] = running.get(lang, 0) + n

    # selected blocks stay in the object store as refs; the Dataset
    # wraps them and only the gate's to_pandas is output-sized (a
    # production run would write_parquet from here instead)
    picked_refs = [_select_block.remote(ref, off, budgets)
                   for ref, off in zip(block_refs, offsets)]
    out = rd.from_arrow_refs(picked_refs).to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "lang": pd.Series([], dtype="object"),
                            "n_tokens": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)
