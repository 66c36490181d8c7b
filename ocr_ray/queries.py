"""Driver-facing query catalog (SURVEY.md §2 coverage + training-data ops).

Each entry: name -> callable(sf_dir) returning a Dataset / DataFrame /
pyarrow Table, with a matching ANSI-SQL oracle in ORACLE_SQL where the
operator is SQL-expressible (the driver diffs them via DuckDB at
sf=0.01). Column names match the SQL aliases exactly.

Determinism policy for float outputs (why the oracle hashes match
bit-for-bit, not just approximately):
- sums of DECIMAL-QUANTA columns (prices, discounts, revenues) are
  computed in exact integers — cents, basis points, or micro-dollars
  (``_micro_revenue``) — and emitted as the same exact integer divided
  by the same power of ten on both sides; rounded float sums of
  4-decimal quanta land EXACTLY on half-cent boundaries where pandas'
  half-even and SQL ROUND's half-away disagree (observed live);
- ratios of exact integers (averages, rates, growth) are emitted
  UNROUNDED — the same two integers divide to the same double on both
  sides;
- genuinely real-valued outputs (correlations, stddevs, cosines,
  centroids) are rounded identically on both sides; their values hit a
  rounding boundary only by measure-zero coincidence, unlike quanta
  sums which are constructed to;
- values that feed a PREDICATE or an ORDER are never rounded floats —
  integer cross-multiplication (``nation_spend_outliers``) or exact
  integer sort keys (``revenue_topk``, ``shipping_priority``).

Scale notes are in each docstring: the point is not the sf0.01 result
but that the same plan holds at 100 TB (partial aggregation before
shuffles, broadcast small sides, bucketed hash joins, banded LSH
instead of all-pairs).
"""
from __future__ import annotations

import hashlib
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from .functions import bloom as BLOOM
from .functions import hashing as H
from .functions import quantile as QU
from .functions import sketch as SK
from .functions import textstats as TS

# candidate-pair self-joins hash their (huge-cardinality) key space into
# _pair_buckets() shuffle partitions; each partition does one vectorized
# merge


def _cpus(default: int = 32) -> int:
    """Cluster CPU count — the single source of truth for every
    cluster-proportional width in this module. ``default`` is returned
    when Ray isn't up (or hasn't registered CPUs yet): shuffle widths
    want the optimistic 32, fixed actor pools want a CONSERVATIVE value
    so a degenerate reading can't oversize a pool into the
    stacked-fixed-pool executor deadlock."""
    if not ray.is_initialized():
        return default
    return int(ray.cluster_resources().get("CPU", default))


def _pair_buckets() -> int:
    """Shuffle width for bucketed combines / joins / sessionization:
    proportional to the cluster (next power of two >= 2x cluster CPUs,
    like _stitch_partitions in pipelines/extraction.py) with a floor of
    64, so per-bucket map_groups memory stays ~corpus/(2*CPUs) as the
    cluster grows instead of corpus/64. Power of two so mask bucketing
    (``key & (B-1)``) and modulo bucketing agree."""
    return max(64, 1 << int(np.ceil(np.log2(max(1, 2 * _cpus())))))

# --------------------------------------------------------------- helpers


def _read(sf_dir: str, table: str, columns: list[str] | None = None,
          **kwargs) -> ray.data.Dataset:
    """Pruned read: always column-pruned; pass ``filter=pc.field(...)``
    to additionally push a row filter into the parquet scan (row-group
    stats pruning + Arrow-side evaluation, nothing reaches Python)."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns, **kwargs
    )


def _round_away(x, nd: int = 6):
    """ROUND-half-AWAY-from-zero at nd decimals — DuckDB ROUND's tie
    rule, which Python round()/np.round (half-even) silently disagree
    with on exact dyadic ties (e.g. 1/128 at nd=6). Mirrors the
    floor(|x|*10^nd + 0.5) formulation so both engines produce the
    identical double at EVERY input, ties included. Scalar or ndarray."""
    scale = 10.0 ** nd
    ax = np.floor(np.abs(x) * scale + 0.5) / scale
    return np.where(np.signbit(x), -ax, ax) if isinstance(
        x, np.ndarray) else float(-ax if x < 0 else ax)


def _round_cols(df: pd.DataFrame, cols: dict[str, int]) -> pd.DataFrame:
    for c, nd in cols.items():
        df[c] = df[c].astype(float).round(nd)
    return df


def _micro_revenue(t: pa.Table) -> pa.ChunkedArray:
    """Line-item revenue ext*(1-disc) as EXACT integer micro-dollars
    (cents x basis points). ext and disc are 2/4-decimal quanta, so
    float revenue sums land exactly on half-cent rounding boundaries
    and a ROUND(sum, 2) output ties between pandas' half-even and SQL's
    half-away (observed live on this data) — integer arithmetic with a
    final /1e6 on both sides is bit-identical instead. Rounding mode
    half_towards_infinity matches SQL ROUND for these positive values.
    Sums must stay int64 END-TO-END (overflow only at 9.2e18 micro =
    $9.2T per group) — per-group sums at sf0.1 already reach 67% of
    2^53, so letting the column pass through float64 (e.g. by unioning
    with a NULL placeholder) would break exactness at ~1.5x that scale;
    final int64 -> DOUBLE outputs divide group totals < 2^53 so the
    HUGEINT->DOUBLE conversion on the SQL side is exact too. SQL mirror:
    ``SUM(CAST(ROUND(ext*100) AS BIGINT) *
    (10000 - CAST(ROUND(disc*10000) AS BIGINT))) / 1000000.0``."""
    cents = pc.cast(
        pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0)),
                 round_mode="half_towards_infinity"), pa.int64())
    bp = pc.cast(
        pc.round(pc.multiply(t["l_discount"], pa.scalar(10000.0)),
                 round_mode="half_towards_infinity"), pa.int64())
    return pc.multiply(cents, pc.subtract(pa.scalar(10000, pa.int64()), bp))


def _micro_revenue_np(ext: np.ndarray, disc: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`_micro_revenue` for pandas-format stages.
    np.floor(x + 0.5) is half-UP, which equals half-away-from-zero (SQL
    ROUND / the pyarrow kernel's half_towards_infinity) only because
    prices and discounts are non-negative — keep both implementations
    in this one place so they can't drift."""
    cents = np.floor(ext * 100.0 + 0.5).astype(np.int64)
    bp = np.floor(disc * 10000.0 + 0.5).astype(np.int64)
    return cents * (10000 - bp)


def _bucketed_combine(
    parts: ray.data.Dataset,
    keys: list[str],
    agg: dict[str, str],
    *,
    buckets: int | None = None,
    round_cols: dict[str, int] | None = None,
    topk: tuple[int, list[str], list[bool]] | None = None,
    prune: "callable | None" = None,
) -> pd.DataFrame:
    """Cluster-side final combine for HIGH-cardinality grouped partials:
    hash ``keys[0]`` into ``buckets`` shuffle partitions and run one
    vectorized pandas combine per bucket — never one pandas group per
    distinct key (~0.4 ms each) and never a driver-side reduce whose
    memory is O(distinct keys). ``topk=(n, cols, ascending)`` prunes
    each bucket to its local top-n (the global top-n is a subset of the
    union of per-bucket top-ns), bounding what reaches the driver;
    ``prune`` is the general form — an arbitrary per-bucket
    DataFrame -> DataFrame reducer applied after the groupby (callers
    with a union-of-criteria prune pass this instead of forking the
    bucketing machinery)."""
    if buckets is None:
        buckets = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # deterministic cross-process hash (fixed siphash key — no
        # PYTHONHASHSEED dependence)
        h = pd.util.hash_pandas_object(df[keys[0]], index=False).to_numpy()
        return df.assign(_b=(h % buckets).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="_b").groupby(keys, as_index=False).agg(
            **{c: (c, f) for c, f in agg.items()}
        )
        if round_cols:
            for c, nd in round_cols.items():
                out[c] = out[c].astype(float).round(nd)
        if topk is not None:
            n, cols, asc = topk
            out = out.sort_values(cols, ascending=asc).head(n)
        if prune is not None:
            out = prune(out)
        return out

    return (
        parts.map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )


def _partial_group_sum(ds: ray.data.Dataset, keys: list[str], sums: dict[str, str],
                       counts: str | None = None, *, distributed: bool = False,
                       round_cols: dict[str, int] | None = None,
                       topk: tuple[int, list[str], list[bool]] | None = None) -> pd.DataFrame:
    """Scalable grouped sum: partial per-batch aggregation inside
    map_batches (one row per key per batch), then a final combine.
    ``distributed=False`` (provably tiny key spaces only — a handful of
    flags/segments) combines on the driver; ``distributed=True`` routes
    through :func:`_bucketed_combine` so the combine shuffles in the
    cluster and the driver only receives the (possibly top-k-pruned)
    result rows."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False).agg(
            **{out: (src, "sum") for out, src in sums.items()},
            **({counts: (keys[0], "size")} if counts else {}),
        )
        return g

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    agg = {out: "sum" for out in sums}
    if counts:
        agg[counts] = "sum"
    if distributed:
        return _bucketed_combine(parts, keys, agg, round_cols=round_cols, topk=topk)
    out = parts.to_pandas().groupby(keys, as_index=False).agg(agg)
    if round_cols:
        for c, nd in round_cols.items():
            out[c] = out[c].astype(float).round(nd)
    return out


# --------------------------------------------------------------- relational

def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan -> partial per-batch agg -> small
    final combine. Column pruning at the read; no full-row shuffle."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1999-01-01"))))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            # quantities are integral and prices 2-decimal, so integer
            # quantities / cents / micro-dollars make every sum exact.
            # The safe cast is a deliberate contract: a non-integral
            # quantity raises loudly here rather than silently rounding
            # away from what SQL SUM(l_quantity) would compute
            "qty": pc.cast(t["l_quantity"], pa.int64()),
            "cents": pc.cast(
                pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0)),
                         round_mode="half_towards_infinity"), pa.int64()),
            "micro": _micro_revenue(t),
        })

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = _partial_group_sum(
        ds, ["l_returnflag", "l_linestatus"],
        {"sum_qty": "qty", "sum_base_price": "cents", "sum_disc_price": "micro"},
        counts="n",
    )
    # exact integers divided by exact integers / powers of ten: the
    # same bits on both sides, no rounding step anywhere
    out["avg_qty"] = out["sum_qty"] / out["n"]
    out["sum_qty"] = out["sum_qty"].astype("int64")
    out["sum_base_price"] = out["sum_base_price"].astype("int64") / 100.0
    out["sum_disc_price"] = out["sum_disc_price"].astype("int64") / 1000000.0
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
         AS sum_base_price,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
         / 1000000.0 AS sum_disc_price,
       SUM(l_quantity) * 1.0 / COUNT(*) AS avg_qty,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-01-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_topk(sf_dir: str):
    """Top-10 orders by revenue: partial per-key sums, then combine +
    global top-k (sort on the SMALL aggregated set, never the raw rows)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        # exact integer micro-dollars: the top-k ORDER is decided on
        # exact integers, so the cut can't flip with summation order
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": _micro_revenue(t)})

    # distributed combine + per-bucket top-10: the driver receives at
    # most buckets*10 candidate rows, never one row per orderkey
    agg = _partial_group_sum(
        ds.map_batches(prep, batch_format="pyarrow"), ["l_orderkey"], {"revenue": "rev"},
        distributed=True,
        topk=(10, ["revenue", "l_orderkey"], [False, True]),
    )
    top = agg.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    top["revenue"] = top["revenue"].astype("int64") / 1000000.0
    return top.reset_index(drop=True)


SQL_REVENUE_TOPK = """
SELECT l_orderkey,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
         / 1000000.0 AS revenue
FROM lineitem GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_order_priority_revenue(sf_dir: str):
    """Bucketed hash join lineitem |><| orders: both sides get
    bucket = key % B, tagged, unioned, then per-bucket pandas merge in
    map_groups — the explicit partitioned join pattern (no broadcast,
    both sides large at scale; shuffle width proportional to the
    cluster via _pair_buckets)."""
    B = _pair_buckets()
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def li_prep(t: pa.Table) -> pa.Table:
        # combiner BEFORE the shuffle: ~4 line items share an orderkey,
        # so partial (sum, count) per key shrinks the exchange ~4x.
        # Revenue in EXACT integer micro-dollars (see _micro_revenue):
        # ext*(1-disc) values are 4-decimal quanta whose float sums land
        # exactly on half-cents, so a rounded-sum output would tie
        # between pandas half-even and SQL half-away.
        partial = (
            pa.table({"key": t["l_orderkey"], "rev": _micro_revenue(t)})
            .group_by("key")
            .aggregate([("rev", "sum"), ("rev", "count")])
        )
        key = partial["key"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "rev": partial["rev_sum"],
            "n": pc.cast(partial["rev_count"], pa.int64()),
            "o_orderpriority": pa.nulls(partial.num_rows, pa.string()),
            "side": pa.array(["l"] * partial.num_rows),
        })

    def o_prep(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"]
        # 0 sentinels, NOT nulls: Arrow int64-with-nulls converts to
        # pandas float64 for the whole unioned column, which silently
        # caps the "exact integer" guarantee at 2^53 (the side tag
        # already distinguishes the rows)
        zeros = pa.array(np.zeros(t.num_rows, dtype=np.int64))
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "rev": zeros,
            "n": zeros,
            "o_orderpriority": t["o_orderpriority"],
            "side": pa.array(["o"] * t.num_rows),
        })

    both = li.map_batches(li_prep, batch_format="pyarrow").union(
        orders.map_batches(o_prep, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "l"][["key", "rev", "n"]]
        right = g[g["side"] == "o"][["key", "o_orderpriority"]]
        j = left.merge(right, on="key", how="inner")
        return j.groupby("o_orderpriority", as_index=False).agg(
            revenue=("rev", "sum"), n_items=("n", "sum")
        )

    parts = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas").to_pandas()
    out = parts.groupby("o_orderpriority", as_index=False).agg(
        revenue=("revenue", "sum"), n_items=("n_items", "sum")
    )
    # integer micro-dollars (exact in float64 below 2^53) / 1e6: the
    # same exact integer divides on both sides — no rounding step
    out["revenue"] = out["revenue"].astype("int64") / 1000000.0
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_ORDER_PRIORITY_REVENUE = """
SELECT o_orderpriority,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
         / 1000000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (customer |><| orders |><| lineitem, top-10 by
    revenue): a MULTI-JOIN pipeline composed from the catalog's
    primitives, fully cluster-side — TWO bounded bucketed hash joins
    (shuffle 1 keyed on custkey for the customer semi-join, shuffle 2
    keyed on orderkey for the revenue join), lineitem revenue
    pre-aggregated per orderkey per batch BEFORE its shuffle, per-bucket
    top-10 pruning so the driver sees at most buckets*10 rows. At TPC-H
    scale the BUILDING keyset is ~1/5 of ALL customers — never
    broadcastable at 100 TB, hence the bucketed semi-join rather than a
    ray.put keyset."""
    B = _pair_buckets()
    cutoff = pd.Timestamp("1995-03-15")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def c_prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df.loc[df["c_mktsegment"] == "BUILDING", "c_custkey"].astype("int64")
        return pd.DataFrame({"bucket": k % B, "ckey": k,
                             "o_orderkey": np.int64(-1),
                             "o_orderdate": pd.Timestamp("1970-01-01"),
                             "side": "c"})

    # date predicates pushed into the parquet scans (row-group stats
    # pruning + Arrow-side evaluation); the pandas-side filter is kept
    # as the exact semantic statement
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=pc.less(pc.field("o_orderdate"), pa.scalar(cutoff)))

    def o_semi_prep(df: pd.DataFrame) -> pd.DataFrame:
        kept = df[df["o_orderdate"] < cutoff]
        ck = kept["o_custkey"].astype("int64")
        return pd.DataFrame({"bucket": ck % B, "ckey": ck,
                             "o_orderkey": kept["o_orderkey"].astype("int64"),
                             "o_orderdate": kept["o_orderdate"], "side": "o"})

    def semi_join(g: pd.DataFrame) -> pd.DataFrame:
        keys = g.loc[g["side"] == "c", "ckey"]
        o = g[g["side"] == "o"]
        kept = o[o["ckey"].isin(set(keys))]
        return pd.DataFrame({"o_orderkey": kept["o_orderkey"],
                             "o_orderdate": kept["o_orderdate"]})

    bldg_orders = cust.map_batches(c_prep, batch_format="pandas", batch_size=65536) \
        .union(orders.map_batches(o_semi_prep, batch_format="pandas", batch_size=65536)) \
        .groupby("bucket").map_groups(semi_join, batch_format="pandas")

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].astype("int64")
        return pd.DataFrame({"bucket": k % B, "key": k, "rev": np.int64(0),
                             "o_orderdate": df["o_orderdate"], "side": "o"})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
               filter=pc.greater(pc.field("l_shipdate"), pa.scalar(cutoff)))

    def li_prep(df: pd.DataFrame) -> pd.DataFrame:
        kept = df[df["l_shipdate"] > cutoff]
        # exact integer micro-dollars (see _micro_revenue): the top-k
        # order is decided on exact integers, immune to sum order
        rev = _micro_revenue_np(kept["l_extendedprice"].to_numpy(),
                                kept["l_discount"].to_numpy())
        partial = pd.DataFrame({"key": kept["l_orderkey"].astype("int64"),
                                "rev": rev}) \
            .groupby("key", as_index=False)["rev"].sum()
        return pd.DataFrame({"bucket": partial["key"] % B, "key": partial["key"],
                             "rev": partial["rev"],
                             # sentinel (never read on the l side): an all-NaT
                             # column makes cross-block concat dtype-unstable
                             "o_orderdate": pd.Timestamp("1970-01-01"),
                             "side": "l"})

    both = bldg_orders.map_batches(o_prep, batch_format="pandas", batch_size=65536).union(
        li.map_batches(li_prep, batch_format="pandas", batch_size=65536)
    )

    def join_topk(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == "o"][["key", "o_orderdate"]]
        l = g[g["side"] == "l"].groupby("key", as_index=False)["rev"].sum()
        j = o.merge(l, on="key", how="inner")
        j = j.sort_values(["rev", "key"], ascending=[False, True]).head(10)
        return pd.DataFrame({"l_orderkey": j["key"].astype("int64"),
                             "revenue": j["rev"].astype("int64"),
                             "o_orderdate": j["o_orderdate"]})

    parts = both.groupby("bucket").map_groups(join_topk, batch_format="pandas").to_pandas()
    top = parts.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    top["revenue"] = top["revenue"].astype("int64") / 1000000.0
    return top.reset_index(drop=True)


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
         / 1000000.0 AS revenue,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_mktsegment_stats(sf_dir: str, _broadcast_max: int | None = None):
    """Broadcast join WITH a size guard (same planner decision as
    q_large_part_items): the customer dim is probed with a
    ``limit(budget+1)`` read; within budget it is ray.put ONCE and read
    inside each task (never re-shipped per batch) while orders stream
    through a stateless map_batches doing a dict lookup + partial agg.
    Past the budget — a dim is only "small" until it isn't — the query
    falls back to a bucketed hash join: per-batch orders partials
    (one row per custkey per batch) and customer rows shuffle by
    ``custkey % B``, each bucket maps custkey -> segment and pre-sums,
    and the driver combines O(B x segments) partial rows. Nothing
    driver-side scales with the dim."""
    budget = _BROADCAST_MAX_KEYS if _broadcast_max is None else _broadcast_max
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    probe = cust_ds.limit(budget + 1).to_pandas()
    if len(probe) <= budget:
        lookup_ref = ray.put(dict(zip(probe["c_custkey"], probe["c_mktsegment"])))

        def agg(batch: pd.DataFrame) -> pd.DataFrame:
            lookup = ray.get(lookup_ref)
            batch["c_mktsegment"] = batch["o_custkey"].map(lookup)
            return batch.groupby("c_mktsegment", as_index=False).agg(
                n_orders=("o_totalprice", "size"), total_price=("o_totalprice", "sum")
            )

        parts = orders.map_batches(agg, batch_format="pandas",
                                   batch_size=65536).to_pandas()
    else:
        B = _pair_buckets()

        def c_prep(df: pd.DataFrame) -> pd.DataFrame:
            k = df["c_custkey"].astype("int64")
            return pd.DataFrame({"bucket": k % B, "key": k,
                                 "seg": df["c_mktsegment"],
                                 "n_orders": np.int64(0), "total_price": 0.0,
                                 "side": "c"})

        def o_prep(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("o_custkey", as_index=False).agg(
                n_orders=("o_totalprice", "size"),
                total_price=("o_totalprice", "sum"))
            k = g["o_custkey"].astype("int64")
            return pd.DataFrame({"bucket": k % B, "key": k, "seg": "",
                                 "n_orders": g["n_orders"].astype("int64"),
                                 "total_price": g["total_price"], "side": "o"})

        def join_seg(g: pd.DataFrame) -> pd.DataFrame:
            seg = dict(zip(g.loc[g["side"] == "c", "key"],
                           g.loc[g["side"] == "c", "seg"]))
            o = g[g["side"] == "o"]
            return pd.DataFrame({
                "c_mktsegment": o["key"].map(seg),
                "n_orders": o["n_orders"], "total_price": o["total_price"],
            }).groupby("c_mktsegment", as_index=False).agg(
                n_orders=("n_orders", "sum"), total_price=("total_price", "sum"))

        parts = cust_ds.map_batches(c_prep, batch_format="pandas", batch_size=65536) \
            .union(orders.map_batches(o_prep, batch_format="pandas", batch_size=65536)) \
            .groupby("bucket").map_groups(join_seg, batch_format="pandas") \
            .to_pandas()

    out = parts.groupby("c_mktsegment", as_index=False).agg(
        n_orders=("n_orders", "sum"), total_price=("total_price", "sum")
    )
    out = _round_cols(out, {"total_price": 2})
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


SQL_MKTSEGMENT_STATS = """
SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# broadcast-semi-join guard: a keyset bigger than this is not "a small
# side" — ~16 MB of int64 keys per task is the budget; past it the same
# query switches to the bucketed semi-join (the planner decision a
# dim-size statistic would drive)
_BROADCAST_MAX_KEYS = 2_000_000


def q_large_part_items(sf_dir: str, _broadcast_max: int | None = None):
    """SEMI-join lineitem against the big-part keyset, with a SIZE
    GUARD: the filtered dim is collected with a limit probe; if it fits
    the broadcast budget it is ray.put once and probed per batch (no
    shuffle at all); past the budget the query falls back to the
    bucketed semi-join (the shipping_priority pattern — two bounded
    shuffles, nothing driver-side scales with the dim). The filter on
    p_size is pushed into the parquet scan."""
    budget = _BROADCAST_MAX_KEYS if _broadcast_max is None else _broadcast_max
    parts = _read(sf_dir, "part", ["p_partkey"],
                  filter=pc.greater_equal(pc.field("p_size"), 40))
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"])

    probe = parts.limit(budget + 1).to_pandas()
    if len(probe) <= budget:
        keyset_ref = ray.put(set(probe["p_partkey"]))

        def filt(batch: pd.DataFrame) -> pd.DataFrame:
            keyset = ray.get(keyset_ref)
            kept = batch[batch["l_partkey"].isin(keyset)]
            return kept.groupby("l_returnflag", as_index=False) \
                       .agg(n_items=("l_partkey", "size"))

        parts_df = li.map_batches(filt, batch_format="pandas", batch_size=65536) \
                     .to_pandas()
    else:
        B = _pair_buckets()

        def k_prep(df: pd.DataFrame) -> pd.DataFrame:
            k = df["p_partkey"].astype("int64")
            return pd.DataFrame({"bucket": k % B, "key": k,
                                 "l_returnflag": "", "side": "k"})

        def li_prep(df: pd.DataFrame) -> pd.DataFrame:
            k = df["l_partkey"].astype("int64")
            return pd.DataFrame({"bucket": k % B, "key": k,
                                 "l_returnflag": df["l_returnflag"], "side": "l"})

        def semi_count(g: pd.DataFrame) -> pd.DataFrame:
            keys = set(g.loc[g["side"] == "k", "key"])
            kept = g[(g["side"] == "l") & g["key"].isin(keys)]
            return kept.groupby("l_returnflag", as_index=False) \
                       .agg(n_items=("key", "size"))

        parts_df = parts.map_batches(k_prep, batch_format="pandas", batch_size=65536) \
            .union(li.map_batches(li_prep, batch_format="pandas", batch_size=65536)) \
            .groupby("bucket").map_groups(semi_count, batch_format="pandas") \
            .to_pandas()

    out = parts_df.groupby("l_returnflag", as_index=False).agg(n_items=("n_items", "sum"))
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


SQL_LARGE_PART_ITEMS = """
SELECT l_returnflag, COUNT(*) AS n_items
FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
GROUP BY l_returnflag
"""


def q_distinct_flags(sf_dir: str):
    """Distinct over low-cardinality keys = partial distinct per batch,
    tiny final distinct (never a full shuffle)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    parts = ds.map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas", batch_size=65536
    ).to_pandas()
    return parts.drop_duplicates().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_DISTINCT_FLAGS = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q_wide_orders(sf_dir: str):
    """Star-join denormalization — the ETL materialization every
    warehouse runs nightly: orders widened with customer name/segment
    and nation name into one analytical table, returned as a LIVE
    Dataset (``write_parquet`` on it IS the 100 TB path; nothing
    order-scale ever sits on the driver).

    Join strategy by dimension size, the star-schema discipline:
    - customer (corpus-proportional) joins via ONE custkey-bucketed
      shuffle — fact rows and their dimension rows co-locate, each
      bucket merges vectorized;
    - nation (catalog-bounded, 25 rows) joins as an in-task lookup —
      the dim is read once per task from its single tiny parquet (no
      shuffle, no broadcast round-trip needed at this size; a bigger
      small-dim would use the ray.put + _BROADCAST_MAX_KEYS probe the
      other joins use).
    The nation map rides the CUSTOMER side before the shuffle, so the
    second join costs zero extra exchanges — exactly one all-to-all
    for a 3-table star."""
    B = _pair_buckets()
    nat = pd.read_parquet(f"{sf_dir}/nation.parquet",
                          columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    nref = ray.put(nmap)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"])

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_custkey"].astype("int64")
        return pd.DataFrame({
            "_b": k % B, "key": k, "side": "o",
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "o_totalprice": df["o_totalprice"],
            "c_name": "", "c_mktsegment": "", "n_name": "",
        })

    def c_prep(df: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(nref)
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({
            "_b": k % B, "key": k, "side": "c",
            "o_orderkey": np.int64(-1), "o_totalprice": 0.0,
            "c_name": df["c_name"],
            "c_mktsegment": df["c_mktsegment"],
            "n_name": df["c_nationkey"].astype("int64").map(nm),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == "o",
                  ["key", "o_orderkey", "o_totalprice"]]
        c = g.loc[g["side"] == "c",
                  ["key", "c_name", "c_mktsegment", "n_name"]]
        m = o.merge(c, on="key")
        return pd.DataFrame({
            "o_orderkey": m["o_orderkey"].astype("int64"),
            "c_name": m["c_name"], "c_mktsegment": m["c_mktsegment"],
            "n_name": m["n_name"],
            "o_totalprice": m["o_totalprice"],
        })

    return (orders.map_batches(o_prep, batch_format="pandas",
                               batch_size=65536)
            .union(cust.map_batches(c_prep, batch_format="pandas",
                                    batch_size=65536))
            .groupby("_b").map_groups(join_bucket, batch_format="pandas"))


SQL_WIDE_ORDERS = """
SELECT o_orderkey, c_name, c_mktsegment, n_name, o_totalprice
FROM orders
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
"""


def q_dow_seasonality(sf_dir: str):
    """Day-of-week seasonality indices of order volume and value — the
    multiplicative seasonal profile a forecaster divides out before
    trend fitting (and the changepoint/anomaly rows' natural
    companion): per weekday, orders count and exact cents total, plus
    the index = day's mean order value / overall mean order value.
    Map-side exact integer partials over a 7-key space, zero shuffle;
    the two means are the same integer ratios on both sides and the
    index is ONE mirrored float division of those divisions, round-6.
    Weekday key is pinned to pandas' Monday=0 convention via the
    oracle's ISODOW-1 (DuckDB's dayofweek starts at Sunday=0 — the
    explicit mapping keeps the OUTPUT keys identical, unlike
    cramers_v where permutation invariance made it moot)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"dow": df["o_orderdate"].dt.dayofweek
                          .astype("int64"),
                          "n": np.int64(1), "cents": c})
        return g.groupby("dow", as_index=False).sum()

    agg = (ds.map_batches(partial, batch_format="pandas",
                          batch_size=65536).to_pandas()
           .groupby("dow", as_index=False).sum())
    n_tot = int(agg["n"].sum())
    c_tot = sum(int(v) for v in agg["cents"])
    gmean = float(c_tot) / n_tot
    n = agg["n"].to_numpy(np.int64)
    cents = agg["cents"].to_numpy(np.int64).astype(np.float64)
    out = pd.DataFrame({
        "dow": agg["dow"].astype("int64"),
        "n_orders": agg["n"].astype("int64"),
        "cents": agg["cents"].astype("int64"),
        "index_value": _round_away((cents / n) / gmean, 6),
    })
    return out.sort_values("dow").reset_index(drop=True)


SQL_DOW_SEASONALITY = """
WITH d AS (
  SELECT CAST(isodow(o_orderdate) - 1 AS BIGINT) AS dow,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
), s AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(c) AS BIGINT) AS cents
  FROM d GROUP BY dow
), g AS (
  SELECT CAST(SUM(cents) AS DOUBLE) / SUM(n_orders) AS gmean FROM s
)
SELECT dow, n_orders, cents,
       ROUND((CAST(cents AS DOUBLE) / n_orders) / g.gmean, 6)
         AS index_value
FROM s CROSS JOIN g
"""


def q_revenue_anomalies(sf_dir: str):
    """Rolling z-score anomaly scan over the daily revenue series —
    the ops-monitoring primitive (which days broke pattern?): a day is
    anomalous when its total deviates from the trailing 7-day window
    (strictly prior days) by more than 2 sample standard deviations.
    ALL corpus-scale work is the per-day exact integer (n, cents,
    cents^2-free) fold from one streamed scan; the rolling pass runs on
    the driver over the bounded DAY GRID (the changepoint discipline —
    O(days), never O(rows)).

    Exactness: window mean/std are computed from exact integer daily
    totals via the same float expression as the oracle (window SUM of
    BIGINT, not SQL's AVG/STDDEV aggregates, whose internal
    accumulation differs); the z threshold compares the ROUNDED z so
    both sides flag identical days. Days with fewer than 7 prior days
    or zero window variance are excluded identically (HAVING
    mirror)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    epoch = pd.Timestamp("1995-01-01")
    W, Z = 7, 2.0

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["o_orderdate"] - epoch).dt.days.astype("int64")
        c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": d, "cents": c})
        return g.groupby("day", as_index=False).sum()

    daily = (ds.map_batches(partial, batch_format="pandas",
                            batch_size=65536).to_pandas()
             .groupby("day", as_index=False)["cents"].sum()
             .sort_values("day").reset_index(drop=True))
    days = daily["day"].to_numpy(np.int64)
    cents = [int(v) for v in daily["cents"]]
    rows = []
    for i in range(len(days)):
        # trailing window = the W prior OBSERVED days (gaps skipped on
        # both sides: the oracle's ROWS window does the same)
        if i < W:
            continue
        win = cents[i - W:i]
        s1, s2 = sum(win), sum(v * v for v in win)
        mean = float(s1) / W
        var = (float(s2) - float(s1) * float(s1) / W) / (W - 1)
        if var <= 0:
            continue
        z = (float(cents[i]) - mean) / np.sqrt(var)
        if abs(round(z, 6)) > Z:
            rows.append((int(days[i]), cents[i], round(z, 6)))
    out = pd.DataFrame(rows, columns=["day", "day_cents", "z"])
    for c in ("day", "day_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


SQL_REVENUE_ANOMALIES = """
WITH d AS (
  SELECT CAST(DATEDIFF('day', TIMESTAMP '1995-01-01',
                       o_orderdate) AS BIGINT) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), w AS (
  SELECT day, cents,
         SUM(cents) OVER win AS s1,
         SUM(cents * cents) OVER win AS s2,
         COUNT(*) OVER win AS k
  FROM d
  WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT day, cents,
         ROUND((CAST(cents AS DOUBLE) - CAST(s1 AS DOUBLE) / 7)
               / sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7)
                      / 6), 6) AS z
  FROM w
  WHERE k = 7
    AND (CAST(s2 AS DOUBLE)
         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7) / 6 > 0
)
SELECT day, CAST(cents AS BIGINT) AS day_cents, z
FROM z WHERE abs(z) > 2.0
"""


def q_data_contract(sf_dir: str):
    """Data-contract gate — the multi-invariant quality check a
    pipeline runs before promoting a snapshot: each rule is one
    pruned streamed scan emitting only (checked, violations) integer
    partials (zero shuffle, O(rules) driver state), and the snapshot
    'passes' when every rule's ok flag is TRUE. Rules span tables and
    invariant kinds: positivity, domain range, derived-column
    consistency (n_chars must equal length(text) — the check that
    catches a broken ingest writer), and a pinned categorical domain.
    Violation COUNTS (not just flags) are the exact comparison surface,
    so the oracle red-flags an engine that miscounts even when both
    agree the rule failed."""
    LANGS = {"de", "en", "es", "fr", "zh"}
    rules = []

    def count_rule(name, table, cols, viol_fn):
        ds = _read(sf_dir, table, cols)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            v = viol_fn(df)
            return pd.DataFrame({"n": [np.int64(len(df))],
                                 "bad": [np.int64(int(v.sum()))]})

        t = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas().sum()
        rules.append((name, int(t["n"]), int(t["bad"])))

    count_rule("orders_price_positive", "orders", ["o_totalprice"],
               lambda df: ~(df["o_totalprice"] > 0))
    count_rule("orders_date_in_range", "orders", ["o_orderdate"],
               lambda df: ~df["o_orderdate"].between(
                   pd.Timestamp("1990-01-01"), pd.Timestamp("2005-12-31")))
    count_rule("documents_nchars_consistent", "documents",
               ["n_chars", "text"],
               lambda df: df["n_chars"].astype("int64")
               != df["text"].str.len().astype("int64"))
    count_rule("documents_lang_in_domain", "documents", ["lang"],
               lambda df: ~df["lang"].isin(LANGS))
    count_rule("events_value_nonnegative", "events", ["value"],
               lambda df: ~(df["value"] >= 0))
    out = pd.DataFrame(rules, columns=["rule", "n_checked",
                                       "n_violations"])
    for c in ("n_checked", "n_violations"):
        out[c] = out[c].astype("int64")
    out["ok"] = out["n_violations"] == 0
    return out.sort_values("rule").reset_index(drop=True)


SQL_DATA_CONTRACT = """
WITH u AS (
  SELECT 'orders_price_positive' AS rule,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
              AS BIGINT) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'orders_date_in_range', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1990-01-01'
                       AND TIMESTAMP '2005-12-31' THEN 0 ELSE 1 END)
              AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'documents_nchars_consistent', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END)
              AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'documents_lang_in_domain', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN lang IN ('de','en','es','fr','zh')
                       THEN 0 ELSE 1 END) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'events_value_nonnegative', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN value >= 0 THEN 0 ELSE 1 END) AS BIGINT)
  FROM events
)
SELECT rule, n_checked, n_violations, n_violations = 0 AS ok FROM u
"""


def q_encoding_audit(sf_dir: str):
    """Delta-varint encoding audit over the sorted distinct orderkey
    sequence — the column-encoding decision quantified (dense sorted
    int64 keys compress ~10x under delta+varint; this row measures the
    EXACT byte counts so the 'should this column be delta-encoded'
    choice is data-driven, the zorder_layout sibling for encodings).

    Distributed sorted adjacency without a global sort: keys
    range-partition monotonically into W contiguous buckets (bucket =
    key * W // (max+1), from one tiny min/max pass), each bucket sorts
    its own distinct keys and emits (n, varint byte sum, min, max) —
    the W-1 boundary deltas between adjacent buckets' max/min are
    stitched by the driver from O(W) numbers. Convention on both
    sides: the first value's delta is the value itself (vs 0); varint
    length = 7-bit groups via the same CASE thresholds. All exact
    integers; ratio is one mirrored division."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    W = max(8, _cpus())
    ext = ds.map_batches(
        lambda df: pd.DataFrame({"lo": [df["l_orderkey"].min()],
                                 "hi": [df["l_orderkey"].max()]}),
        batch_format="pandas").to_pandas()
    hi = int(ext["hi"].max())

    _TH = [128 ** k for k in range(1, 10)]

    def vbytes(d: np.ndarray) -> np.ndarray:
        b = np.ones(len(d), dtype=np.int64)
        for t in _TH:
            b += (d >= t).astype(np.int64)
        return b

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].drop_duplicates().astype("int64")
        return pd.DataFrame({"k": k, "_b": (k * W // (hi + 1))
                             .astype("int64")})

    def bucket_enc(g: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(g["k"].unique())
        d = np.diff(k)
        return pd.DataFrame({
            "_b": [int(g["_b"].iloc[0])], "n": [len(k)],
            "inner_bytes": [int(vbytes(d).sum()) if len(d) else 0],
            "kmin": [int(k[0])], "kmax": [int(k[-1])],
        })

    parts = (ds.map_batches(tag, batch_format="pandas",
                            batch_size=65536)
             .groupby("_b").map_groups(bucket_enc,
                                       batch_format="pandas")
             .to_pandas().sort_values("_b").reset_index(drop=True))
    n = int(parts["n"].sum())
    total = int(parts["inner_bytes"].sum())
    prev_max = 0  # first value's delta = the value itself
    for _, r in parts.iterrows():
        delta = np.array([int(r["kmin"]) - prev_max], dtype=np.int64)
        total += int(vbytes(delta)[0])
        prev_max = int(r["kmax"])
    raw = 8 * n
    return pd.DataFrame({
        "n_values": pd.Series([n], dtype="int64"),
        "raw_bytes": pd.Series([raw], dtype="int64"),
        "varint_bytes": pd.Series([total], dtype="int64"),
        "ratio": [round(total / float(raw), 6)],
    })


SQL_ENCODING_AUDIT = """
WITH k AS (
  SELECT DISTINCT l_orderkey AS k FROM lineitem
), d AS (
  SELECT k - COALESCE(lag(k) OVER (ORDER BY k), 0) AS delta FROM k
), b AS (
  SELECT CASE
           WHEN delta < 128 THEN 1
           WHEN delta < 16384 THEN 2
           WHEN delta < 2097152 THEN 3
           WHEN delta < 268435456 THEN 4
           WHEN delta < 34359738368 THEN 5
           WHEN delta < 4398046511104 THEN 6
           WHEN delta < 562949953421312 THEN 7
           WHEN delta < 72057594037927936 THEN 8
           ELSE 9
         END AS nb
  FROM d
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM k) AS n_values,
       (SELECT CAST(8 * COUNT(*) AS BIGINT) FROM k) AS raw_bytes,
       CAST(SUM(nb) AS BIGINT) AS varint_bytes,
       ROUND(CAST(SUM(nb) AS DOUBLE)
             / (SELECT 8.0 * COUNT(*) FROM k), 6) AS ratio
FROM b
"""


def q_target_encoding(sf_dir: str):
    """Smoothed target encoding — the categorical feature-engineering
    primitive (replace a category with its smoothed target mean so
    rare categories shrink toward the global mean instead of
    memorizing noise): enc(c) = (sum_c + m * global_mean) / (n_c + m)
    with m = 100, target = price cents, categories = order priority.
    One streamed scan emits per-category exact integer (n, sum cents)
    partials; the driver folds O(categories) rows. The global mean and
    every encoding are the SAME float expression over exact integers
    on both sides (global_mean division first, then the smoothing
    formula — mirrored order), round-6 dollars."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    M = 100.0

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"grp": df["o_orderpriority"],
                          "n": np.int64(1), "s": c})
        return g.groupby("grp", as_index=False).sum()

    parts = (ds.map_batches(partial, batch_format="pandas",
                            batch_size=65536).to_pandas()
             .groupby("grp", as_index=False).sum())
    n_tot = int(parts["n"].sum())
    s_tot = sum(int(v) for v in parts["s"])
    gmean = float(s_tot) / n_tot
    rows = []
    for _, r in parts.iterrows():
        n, s = int(r["n"]), int(r["s"])
        enc = (float(s) + M * gmean) / (n + M)
        rows.append((r["grp"], n, round(enc / 100.0, 6)))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n",
                                      "encoded_dollars"])
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_TARGET_ENCODING = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), s AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sc
  FROM c GROUP BY o_orderpriority
), g AS (
  SELECT CAST(SUM(sc) AS DOUBLE) / SUM(n) AS gmean FROM s
)
SELECT o_orderpriority, n,
       ROUND(((CAST(sc AS DOUBLE) + 100.0 * g.gmean) / (n + 100.0))
             / 100.0, 6) AS encoded_dollars
FROM s CROSS JOIN g
"""


def q_key_gaps(sf_dir: str):
    """Dense-sequence gap detection over distinct orderkeys — the
    data-integrity scan behind 'did the loader drop a shard?' (a dense
    surrogate-key column with a 40k-wide hole names the missing batch
    directly). Same monotone range-bucket machinery as
    :func:`q_encoding_audit`: each bucket reports its internal gap
    stats plus (min, max), and the W-1 boundary deltas stitch on the
    driver — exact integers throughout, no global sort. Output: the
    number of gaps (delta > 1 between sorted neighbors), the widest
    gap's size and start key, and the total missing count
    (range span minus distinct)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    W = max(8, _cpus())
    ext = ds.map_batches(
        lambda df: pd.DataFrame({"hi": [df["l_orderkey"].max()]}),
        batch_format="pandas").to_pandas()
    hi = int(ext["hi"].max())

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].drop_duplicates().astype("int64")
        return pd.DataFrame({"k": k, "_b": (k * W // (hi + 1))
                             .astype("int64")})

    def bucket_gaps(g: pd.DataFrame) -> pd.DataFrame:
        k = np.sort(g["k"].unique())
        d = np.diff(k)
        gaps = d[d > 1]
        widest = int(gaps.max()) - 1 if len(gaps) else 0
        wstart = int(k[:-1][d == (widest + 1)][0]) if widest else -1
        return pd.DataFrame({
            "_b": [int(g["_b"].iloc[0])], "n": [len(k)],
            "n_gaps": [int(len(gaps))],
            "widest": [widest], "wstart": [wstart],
            "kmin": [int(k[0])], "kmax": [int(k[-1])],
        })

    parts = (ds.map_batches(tag, batch_format="pandas",
                            batch_size=65536)
             .groupby("_b").map_groups(bucket_gaps,
                                       batch_format="pandas")
             .to_pandas().sort_values("_b").reset_index(drop=True))
    n = int(parts["n"].sum())
    n_gaps = int(parts["n_gaps"].sum())
    # candidate widest gaps: each bucket's (max gap, earliest start)
    # plus every boundary gap; global pick = (gap DESC, start ASC) —
    # sound because a bucket reports ITS max, and any gap tying the
    # global max is its own bucket's max too
    cands = [(int(r["widest"]), int(r["wstart"]))
             for _, r in parts.iterrows() if int(r["widest"]) > 0]
    prev_max = None
    for _, r in parts.iterrows():
        if prev_max is not None:
            d = int(r["kmin"]) - prev_max
            if d > 1:
                n_gaps += 1
                cands.append((d - 1, prev_max))
        prev_max = int(r["kmax"])
    widest, wstart = (max(cands, key=lambda c: (c[0], -c[1]))
                      if cands else (0, -1))
    kmin = int(parts["kmin"].iloc[0])
    kmax = int(parts["kmax"].iloc[-1])
    missing = (kmax - kmin + 1) - n
    return pd.DataFrame({
        "n_distinct": pd.Series([n], dtype="int64"),
        "n_gaps": pd.Series([n_gaps], dtype="int64"),
        "widest_gap": pd.Series([widest], dtype="int64"),
        "gap_after_key": pd.Series([wstart], dtype="int64"),
        "n_missing": pd.Series([missing], dtype="int64"),
    })


SQL_KEY_GAPS = """
WITH k AS (
  SELECT DISTINCT l_orderkey AS k FROM lineitem
), d AS (
  SELECT k, lag(k) OVER (ORDER BY k) AS pk FROM k
), g AS (
  SELECT pk AS start_key, k - pk - 1 AS gap
  FROM d WHERE pk IS NOT NULL AND k - pk > 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM k) AS n_distinct,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS widest_gap,
       CAST(COALESCE((SELECT start_key FROM g
                      ORDER BY gap DESC, start_key LIMIT 1), -1)
            AS BIGINT) AS gap_after_key,
       (SELECT CAST(MAX(k) - MIN(k) + 1 - COUNT(*) AS BIGINT) FROM k)
         AS n_missing
FROM g
"""


def q_rle_audit(sf_dir: str):
    """Run-length sortedness audit — the third layout lever (with
    Z-order and delta-varint): how well would o_orderpriority
    RLE-compress under the table's natural (o_orderdate, o_orderkey)
    order, vs the n_distinct-run floor a priority-clustered layout
    achieves? runs/rows near 1 says the column is unsorted noise in
    this layout (dictionary-encode it); near 0 says RLE wins.

    Distributed ordered adjacency without a global sort: rows map to
    the monotone composite m = day * 2^32 + orderkey and
    range-partition into W contiguous buckets; each bucket sorts its
    own rows and emits (rows, internal transitions, first/last
    priority); the driver stitches W-1 boundary comparisons. Exact
    integers; the ratio is one mirrored division."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"])
    W = max(8, _cpus())
    epoch = pd.Timestamp("1995-01-01")

    def mkey(df: pd.DataFrame) -> pd.Series:
        day = (df["o_orderdate"] - epoch).dt.days.astype("int64")
        k = df["o_orderkey"].astype("int64")
        # envelope: orderkey bits must not overflow into the day field
        # — a violation would silently reorder vs the oracle's
        # (date, key) sort, so raise instead (the sibling-guard rule)
        if len(k) and int(k.max()) >= 2 ** 32:
            raise AssertionError(
                "rle_audit: o_orderkey >= 2^32 breaks the composite "
                "sort key — widen the key layout")
        return day * (2 ** 32) + k

    ext = ds.map_batches(
        lambda df: pd.DataFrame({"hi": [mkey(df).max()]}),
        batch_format="pandas").to_pandas()
    hi = int(ext["hi"].max())

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        m = mkey(df)
        return pd.DataFrame({"m": m, "p": df["o_orderpriority"],
                             "_b": (m * W // (hi + 1)).astype("int64")})

    def bucket_runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("m")
        p = g["p"].to_numpy()
        trans = int((p[1:] != p[:-1]).sum()) if len(p) > 1 else 0
        return pd.DataFrame({
            "_b": [int(g["_b"].iloc[0])], "n": [len(p)],
            "trans": [trans], "first": [p[0]], "last": [p[-1]],
            # catalog-bounded distinct VALUES ride along so the floor
            # needs no second table scan
            "dvals": ["\x1f".join(sorted(pd.unique(p)))],
        })

    parts = (ds.map_batches(tag, batch_format="pandas",
                            batch_size=65536)
             .groupby("_b").map_groups(bucket_runs,
                                       batch_format="pandas")
             .to_pandas().sort_values("_b").reset_index(drop=True))
    n = int(parts["n"].sum())
    trans = int(parts["trans"].sum())
    prev_last = None
    for _, r in parts.iterrows():
        if prev_last is not None and r["first"] != prev_last:
            trans += 1
        prev_last = r["last"]
    runs = trans + 1
    dvals = len(set().union(
        *(set(v.split("\x1f")) for v in parts["dvals"] if v)))
    return pd.DataFrame({
        "n_rows": pd.Series([n], dtype="int64"),
        "runs_date_order": pd.Series([runs], dtype="int64"),
        "runs_floor": pd.Series([int(dvals)], dtype="int64"),
        "rle_ratio": [round(runs / float(n), 6)],
    })


SQL_RLE_AUDIT = """
WITH o AS (
  SELECT o_orderpriority AS p,
         lag(o_orderpriority) OVER (
           ORDER BY o_orderdate, o_orderkey) AS pp
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(1 + SUM(CASE WHEN pp IS NOT NULL AND p <> pp
                         THEN 1 ELSE 0 END) AS BIGINT)
         AS runs_date_order,
       (SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
        FROM orders) AS runs_floor,
       ROUND(CAST(1 + SUM(CASE WHEN pp IS NOT NULL AND p <> pp
                               THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS rle_ratio
FROM o
"""


_ZORDER_FILES = 64
_ZORDER_BITS = 8


def _morton_sql(qc: str, qd: str) -> str:
    """Generate the bit-interleave expression for two _ZORDER_BITS-bit
    ints (the SQL twin of the numpy interleave in q_zorder_layout)."""
    terms = []
    for i in range(_ZORDER_BITS):
        terms.append(f"((({qc} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({qd} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def q_zorder_layout(sf_dir: str):
    """Z-order (Morton) data-layout audit — quantifies the 'prune at
    the read' lever: the same orders rows are carved into
    ``_ZORDER_FILES`` equal chunks under (a) plain date sort and (b)
    Morton interleave of 8-bit-quantized (custkey, day); per file the
    (min, max) zone-map of BOTH columns is taken and the expected
    fraction of files a uniform point predicate touches is
    sum(spans) / (files * range). Date sort prunes date predicates
    perfectly but leaves custkey zone maps useless; Z-order trades a
    little date locality for pruning on BOTH columns — the layout
    decision this audit feeds.

    Exactness/shape: quantizers are data-driven integer expressions
    over exact MIN/MAX (one tiny partial-fold pass); file id =
    floor(rank * F / N) with rank = cum_before(key) + within-key index
    under the (key, o_orderkey) total order — NOT SQL's NTILE, whose
    remainder rule differs; both sides use the same floor formula. The
    within-key index needs a by-key shuffle (a key lives in one
    bucket); cum_before comes from the key histogram, whose distinct
    count is BOUNDED (day range / 2^16 Morton codes), the
    curriculum_buckets discipline. Per-file zone maps fold as O(files)
    partials. Two bounded shuffles per layout, integer-exact
    throughout; the fracs are one mirrored division."""
    F, BITS = _ZORDER_FILES, _ZORDER_BITS
    B = _pair_buckets()
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate"])
    epoch = pd.Timestamp("1995-01-01")

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "c": df["o_custkey"].astype("int64"),
            "day": (df["o_orderdate"] - epoch).dt.days.astype("int64"),
        })

    # materialized: consumed by the extent fold AND the keyed expansion
    rows = ds.map_batches(base, batch_format="pandas",
                          batch_size=65536).materialize()

    ext = rows.map_batches(
        lambda df: pd.DataFrame({
            "cmin": [df["c"].min()], "cmax": [df["c"].max()],
            "dmin": [df["day"].min()], "dmax": [df["day"].max()],
            "n": [np.int64(len(df))]}),
        batch_format="pandas").to_pandas()
    cmin, cmax = int(ext["cmin"].min()), int(ext["cmax"].max())
    dmin, dmax = int(ext["dmin"].min()), int(ext["dmax"].max())
    N = int(ext["n"].sum())

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        qc = (df["c"].to_numpy() - cmin) * 256 // (cmax - cmin + 1)
        qd = (df["day"].to_numpy() - dmin) * 256 // (dmax - dmin + 1)
        mkey = np.zeros(len(df), dtype=np.int64)
        for i in range(BITS):
            mkey |= ((qc >> i) & 1) << (2 * i + 1)
            mkey |= ((qd >> i) & 1) << (2 * i)
        out = []
        for layout, key in (("date_sort", df["day"].to_numpy()),
                            ("zorder", mkey)):
            out.append(pd.DataFrame({
                "layout": layout, "key": key,
                "o_orderkey": df["o_orderkey"], "c": df["c"],
                "day": df["day"],
                "_b": (key % B).astype("int64"),
            }))
        return pd.concat(out, ignore_index=True)

    # materialized: the key-histogram fold and the zone-map shuffle
    # both consume it — lazy re-execution would double the 2x-row
    # layout expansion
    tagged = rows.map_batches(keyed, batch_format="pandas",
                              batch_size=65536).materialize()

    # key histogram -> exclusive cumulative offsets per layout (distinct
    # keys bounded by day range / 2^16 Morton codes — never corpus)
    hist = (tagged.map_batches(
        lambda df: df.groupby(["layout", "key"], as_index=False).size(),
        batch_format="pandas").to_pandas()
        .groupby(["layout", "key"], as_index=False)["size"].sum())
    frames = []
    for layout, sub in hist.groupby("layout"):
        sub = sub.sort_values("key")
        cum = np.concatenate([[0], np.cumsum(sub["size"].to_numpy())[:-1]])
        frames.append(pd.DataFrame({
            "layout": layout, "key": sub["key"].to_numpy(),
            "off": cum.astype(np.int64)}))
    off_ref = ray.put(pd.concat(frames, ignore_index=True))

    def zone_maps(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized within-key sequencing: one sort, group-start
        # flags, running-max of start indices — no per-key Python
        g = g.sort_values(["layout", "key", "o_orderkey"]) \
             .reset_index(drop=True)
        new = ((g["layout"] != g["layout"].shift())
               | (g["key"] != g["key"].shift())).to_numpy()
        gi = np.arange(len(g), dtype=np.int64)
        within = gi - np.maximum.accumulate(np.where(new, gi, 0))
        g = g.assign(_w=within).merge(ray.get(off_ref),
                                      on=["layout", "key"])
        rank = g["off"].to_numpy() + g["_w"].to_numpy()
        g = g.assign(f=rank * F // N)
        return g.groupby(["layout", "f"], as_index=False).agg(
            dlo=("day", "min"), dhi=("day", "max"),
            clo=("c", "min"), chi=("c", "max"))

    zm = (tagged.groupby("_b").map_groups(zone_maps,
                                          batch_format="pandas")
          .to_pandas()
          .groupby(["layout", "f"], as_index=False).agg(
              dlo=("dlo", "min"), dhi=("dhi", "max"),
              clo=("clo", "min"), chi=("chi", "max")))
    out = []
    for layout, sub in zm.groupby("layout"):
        dspan = int((sub["dhi"] - sub["dlo"] + 1).sum())
        cspan = int((sub["chi"] - sub["clo"] + 1).sum())
        out.append((layout, dspan, cspan,
                    round(dspan / (float(F) * (dmax - dmin + 1)), 6),
                    round(cspan / (float(F) * (cmax - cmin + 1)), 6)))
    res = pd.DataFrame(out, columns=["layout", "day_span_sum",
                                     "cust_span_sum", "day_touch_frac",
                                     "cust_touch_frac"])
    for col in ("day_span_sum", "cust_span_sum"):
        res[col] = res[col].astype("int64")
    return res.sort_values("layout").reset_index(drop=True)


SQL_ZORDER_LAYOUT = f"""
WITH b AS (
  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS c,
         CAST(DATEDIFF('day', TIMESTAMP '1995-01-01',
                       o_orderdate) AS BIGINT) AS day
  FROM orders
), r AS (
  SELECT MIN(c) AS cmin, MAX(c) AS cmax, MIN(day) AS dmin,
         MAX(day) AS dmax, COUNT(*) AS n
  FROM b
), q AS (
  SELECT o_orderkey, c, day, cmin, cmax, dmin, dmax, n,
         (c - cmin) * 256 // (cmax - cmin + 1) AS qc,
         (day - dmin) * 256 // (dmax - dmin + 1) AS qd
  FROM b CROSS JOIN r
), m AS (
  SELECT *, {_morton_sql('qc', 'qd')} AS mkey FROM q
), fa AS (
  SELECT 'date_sort' AS layout, c, day, cmin, cmax, dmin, dmax,
         ((row_number() OVER (ORDER BY day, o_orderkey) - 1) * {_ZORDER_FILES})
           // n AS f
  FROM m
  UNION ALL
  SELECT 'zorder', c, day, cmin, cmax, dmin, dmax,
         ((row_number() OVER (ORDER BY mkey, o_orderkey) - 1) * {_ZORDER_FILES})
           // n AS f
  FROM m
), zm AS (
  SELECT layout, f, MIN(day) AS dlo, MAX(day) AS dhi,
         MIN(c) AS clo, MAX(c) AS chi,
         MIN(cmin) AS cmin, MIN(cmax) AS cmax,
         MIN(dmin) AS dmin, MIN(dmax) AS dmax
  FROM fa GROUP BY layout, f
)
SELECT layout,
       CAST(SUM(dhi - dlo + 1) AS BIGINT) AS day_span_sum,
       CAST(SUM(chi - clo + 1) AS BIGINT) AS cust_span_sum,
       ROUND(CAST(SUM(dhi - dlo + 1) AS DOUBLE)
             / ({_ZORDER_FILES}.0 * (MIN(dmax) - MIN(dmin) + 1)), 6)
         AS day_touch_frac,
       ROUND(CAST(SUM(chi - clo + 1) AS DOUBLE)
             / ({_ZORDER_FILES}.0 * (MIN(cmax) - MIN(cmin) + 1)), 6)
         AS cust_touch_frac
FROM zm GROUP BY layout
"""


def q_shard_rebalance(sf_dir: str):
    """Shard-rebalance audit for growing a cluster 12 -> 13 shards —
    the partitioning-policy decision quantified: naive ``key % S``
    re-homes ~12/13 of the corpus (every shard's residues reshuffle),
    while a CONSISTENT-HASH ring (8 virtual nodes per shard) moves only
    ~1/13 — at 100 TB that is the difference between re-shipping the
    corpus and topping up one shard. Both assignments are computed
    per doc and compared; output is the exact moved counts.

    Determinism without bigint hex parsing: ring and doc positions are
    md5 HEX STRINGS — fixed-width hex compares lexicographically
    exactly as the number it encodes, so both engines do plain string
    comparison. Shape: the two rings (96/104 entries) are built
    in-task (catalog-sized); per batch one vectorized searchsorted per
    ring; O(1) count partials to the driver. Zero shuffle."""
    S1, S2, V = 12, 13, 8
    ds = _read(sf_dir, "documents", ["doc_id"])

    def ring(s_count: int):
        entries = sorted(
            (hashlib.md5(f"{s}:{v}".encode()).hexdigest(), s)
            for s in range(s_count) for v in range(V))
        return (np.array([e[0] for e in entries]),
                np.array([e[1] for e in entries], dtype=np.int64))

    r1_pos, r1_shard = ring(S1)
    r2_pos, r2_shard = ring(S2)

    def assign(pos: np.ndarray, rpos, rshard) -> np.ndarray:
        # successor on the ring: first vnode hash STRICTLY greater,
        # wrapping to the smallest
        idx = np.searchsorted(rpos, pos, side="right")
        return rshard[np.where(idx == len(rpos), 0, idx)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        pos = np.array([hashlib.md5(str(i).encode()).hexdigest()
                        for i in ids])
        c1 = assign(pos, r1_pos, r1_shard)
        c2 = assign(pos, r2_pos, r2_shard)
        k = ids.to_numpy()
        return pd.DataFrame({
            "n": [np.int64(len(ids))],
            "moved_ring": [np.int64((c1 != c2).sum())],
            "moved_mod": [np.int64((k % S1 != k % S2).sum())],
        })

    tot = ds.map_batches(partial, batch_format="pandas",
                         batch_size=8192).to_pandas().sum()
    n = int(tot["n"])
    return pd.DataFrame({
        "n_docs": pd.Series([n], dtype="int64"),
        "moved_ring": pd.Series([int(tot["moved_ring"])], dtype="int64"),
        "moved_mod": pd.Series([int(tot["moved_mod"])], dtype="int64"),
        "ring_share": [round(int(tot["moved_ring"]) / float(n), 6)],
        "mod_share": [round(int(tot["moved_mod"]) / float(n), 6)],
    })


SQL_SHARD_REBALANCE = """
WITH r1 AS (
  SELECT s, md5(s || ':' || v) AS pos
  FROM generate_series(0, 11) AS t1(s),
       generate_series(0, 7) AS t2(v)
), r2 AS (
  SELECT s, md5(s || ':' || v) AS pos
  FROM generate_series(0, 12) AS t1(s),
       generate_series(0, 7) AS t2(v)
), d AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS pos FROM documents
), a1 AS (
  SELECT d.doc_id,
         COALESCE(arg_min(r.s, r.pos) FILTER (WHERE r.pos > d.pos),
                  arg_min(r.s, r.pos)) AS shard
  FROM d CROSS JOIN r1 r GROUP BY d.doc_id
), a2 AS (
  SELECT d.doc_id,
         COALESCE(arg_min(r.s, r.pos) FILTER (WHERE r.pos > d.pos),
                  arg_min(r.s, r.pos)) AS shard
  FROM d CROSS JOIN r2 r GROUP BY d.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN a1.shard <> a2.shard THEN 1 ELSE 0 END)
            AS BIGINT) AS moved_ring,
       CAST(SUM(CASE WHEN a1.doc_id % 12 <> a1.doc_id % 13
                     THEN 1 ELSE 0 END) AS BIGINT) AS moved_mod,
       ROUND(CAST(SUM(CASE WHEN a1.shard <> a2.shard THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS ring_share,
       ROUND(CAST(SUM(CASE WHEN a1.doc_id % 12 <> a1.doc_id % 13
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS mod_share
FROM a1 JOIN a2 USING (doc_id)
"""


def q_incremental_agg(sf_dir: str):
    """Incremental view maintenance — the nightly-ETL contract: the
    per-event-type aggregate for the full month is produced by MERGING
    a 'base' aggregate (events before the last calendar day) with a
    'delta' aggregate (the last day only), never rescanning base rows
    together with delta rows; a self-gating ``ivm_ok`` flag asserts the
    merged result is IDENTICAL to a full recompute (a red row if merge
    logic ever drifts). Both legs are one filtered streamed scan with
    the filter pushed into the parquet read on the Ray side; counts and
    cent-sums are exact int64, so merge = integer addition and equality
    is bit-exact. The shape that matters at 100 TB: the base aggregate
    is a tiny persisted artifact and each day's update touches ONLY the
    delta partition."""
    cutoff = pd.Timestamp("2024-01-30")

    def agg_of(flt) -> pd.DataFrame:
        ds = _read(sf_dir, "events", ["event_type", "ts", "value"],
                   filter=flt)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = np.floor(df["value"].to_numpy(np.float64) * 100.0
                         + 0.5).astype(np.int64)
            g = pd.DataFrame({"event_type": df["event_type"],
                              "n": np.int64(1), "cents": c})
            return g.groupby("event_type", as_index=False).sum()

        out = (ds.map_batches(partial, batch_format="pandas",
                              batch_size=65536).to_pandas()
               .groupby("event_type", as_index=False).sum())
        return out

    base = agg_of(pc.field("ts") < cutoff.to_datetime64())
    delta = agg_of(pc.field("ts") >= cutoff.to_datetime64())
    merged = (pd.concat([base, delta], ignore_index=True)
              .groupby("event_type", as_index=False).sum())
    full = agg_of(None)
    chk = merged.merge(full, on="event_type", how="outer",
                       suffixes=("", "_f"))
    ok = bool(((chk["n"] == chk["n_f"])
               & (chk["cents"] == chk["cents_f"])).all()
              and not chk.isna().any().any())
    if not ok:
        raise AssertionError("incremental_agg: merge != full recompute")
    merged["n"] = merged["n"].astype("int64")
    merged["cents"] = merged["cents"].astype("int64")
    merged["ivm_ok"] = True
    return merged.sort_values("event_type").reset_index(drop=True)


SQL_INCREMENTAL_AGG = """
WITH base AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events WHERE ts < TIMESTAMP '2024-01-30' GROUP BY event_type
), delta AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events WHERE ts >= TIMESTAMP '2024-01-30' GROUP BY event_type
), u AS (
  SELECT * FROM base UNION ALL SELECT * FROM delta
)
SELECT event_type, CAST(SUM(n) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents, TRUE AS ivm_ok
FROM u GROUP BY event_type
"""


def q_lang_text_stats(sf_dir: str):
    """Per-language lexical profile: total tokens, DISTINCT tokens
    (vocabulary), type-token ratio and mean word length — the
    language-quality panel a multilingual curation run reports (a
    lang whose TTR collapses is template spam; word length shifts
    flag lang-ID errors). Totals and character sums are map-side
    exact integers; the vocabulary count needs ONE by-token bucketed
    shuffle of DISTINCT (token, lang) partials (a token-lang pair
    lives in one bucket, so bucket counts are global). Ratios are
    mirrored two-integer divisions, round-6."""
    ds = _read(sf_dir, "documents", ["lang", "text"])
    B = _pair_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+")
        e = pd.DataFrame({"lang": df["lang"], "tok": toks}).explode("tok") \
            .dropna(subset=["tok"])
        tot = e.groupby("lang", as_index=False).agg(
            n_tokens=("tok", "size"))
        tot["n_chars"] = e.assign(l=e["tok"].str.len()) \
            .groupby("lang")["l"].sum().reindex(tot["lang"]).to_numpy()
        d = e.drop_duplicates(["lang", "tok"])
        h = pd.util.hash_pandas_object(d["tok"], index=False).to_numpy()
        dd = d.assign(_b=(h % B).astype("int64"))
        tot["kind"] = "t"
        dd = dd.assign(kind="d", n_tokens=np.int64(0),
                       n_chars=np.int64(0))
        return pd.concat([
            tot.assign(tok="", _b=np.int64(-1)),
            dd[["lang", "n_tokens", "n_chars", "kind", "tok", "_b"]],
        ], ignore_index=True)

    raw = ds.map_batches(partial, batch_format="pandas",
                         batch_size=8192).materialize()
    totals = (raw.filter(expr="kind == 't'").to_pandas()
              .groupby("lang", as_index=False).agg(
                  n_tokens=("n_tokens", "sum"),
                  n_chars=("n_chars", "sum")))

    def vocab_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["lang", "tok"])
        out = d.groupby("lang", as_index=False).size() \
            .rename(columns={"size": "v"})
        out["v"] = out["v"].astype("int64")
        return out

    vocab = (raw.filter(expr="kind == 'd'")
             .groupby("_b").map_groups(vocab_bucket,
                                       batch_format="pandas")
             .to_pandas().groupby("lang", as_index=False)["v"].sum())
    m = totals.merge(vocab, on="lang")
    nt = m["n_tokens"].to_numpy(np.int64)
    out = pd.DataFrame({
        "lang": m["lang"],
        "n_tokens": nt,
        "n_vocab": m["v"].astype("int64"),
        "ttr": _round_away(m["v"].to_numpy(np.int64)
                           / nt.astype(np.float64), 6),
        "mean_word_len": _round_away(
            m["n_chars"].to_numpy(np.int64) / nt.astype(np.float64), 6),
    })
    return out.sort_values("lang").reset_index(drop=True)


SQL_LANG_TEXT_STATS = """
WITH t AS (
  SELECT lang,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
), s AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(length(tok)) AS BIGINT) AS n_chars,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_vocab
  FROM t GROUP BY lang
)
SELECT lang, n_tokens, n_vocab,
       ROUND(CAST(n_vocab AS DOUBLE) / n_tokens, 6) AS ttr,
       ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS mean_word_len
FROM s
"""


def q_lang_rollup(sf_dir: str):
    """Top-3 languages + an OTHER bucket — the long-tail rollup every
    corpus report leads with (a 200-language table is unreadable; the
    head plus a faithful remainder is the standard cut). One streamed
    scan folds per-batch (lang, n) partials (distinct langs are
    catalog-bounded); the driver ranks by (n DESC, lang) — determinism
    ties included — and collapses the tail into OTHER whose count is
    the exact integer remainder. share is the same two-integer ratio
    both sides, round-6. rnk orders the report (OTHER pinned last)."""
    ds = _read(sf_dir, "documents", ["lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lang", as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    c = (ds.map_batches(partial, batch_format="pandas",
                        batch_size=65536).to_pandas()
         .groupby("lang", as_index=False)["n"].sum()
         .sort_values(["n", "lang"], ascending=[False, True])
         .reset_index(drop=True))
    total = int(c["n"].sum())
    head = c.head(3)
    rows = [(str(r["lang"]), i + 1, int(r["n"]))
            for i, (_, r) in enumerate(head.iterrows())]
    tail_n = total - int(head["n"].sum())
    if tail_n > 0:
        rows.append(("OTHER", 4, tail_n))
    out = pd.DataFrame(rows, columns=["lang", "rnk", "n_docs"])
    out["rnk"] = out["rnk"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    out["share"] = np.round(
        out["n_docs"].to_numpy(np.float64) / np.float64(total), 6)
    return out


SQL_LANG_ROLLUP = """
WITH c AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
), r AS (
  SELECT lang, n,
         row_number() OVER (ORDER BY n DESC, lang) AS rk
  FROM c
), t AS (SELECT SUM(n) AS total FROM c),
u AS (
  SELECT lang, CAST(rk AS BIGINT) AS rnk, n FROM r WHERE rk <= 3
  UNION ALL
  SELECT 'OTHER', CAST(4 AS BIGINT), SUM(n) FROM r WHERE rk > 3
  HAVING SUM(n) > 0
)
SELECT u.lang, u.rnk, CAST(u.n AS BIGINT) AS n_docs,
       ROUND(CAST(u.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share
FROM u CROSS JOIN t
"""


def q_source_lang_tvd(sf_dir: str):
    """Per-source language-mix drift as EXACT total variation distance
    from the corpus mixture — the curation monitor that flags a feed
    whose language profile diverged (mis-routed crawl, broken lang-ID).
    TVD(s) = 1/2 sum_l |n_s(l)/N_s - n(l)/N| is computed with the
    common-denominator trick: the integer numerator
    sum_l |n_s(l)*N - n(l)*N_s| is EXACT on both sides (Python big-ints
    / HUGEINT — the cross products pass int64 at web scale), divided
    once by 2*N_s*N for the reported round-6 float. Missing
    (source, lang) cells contribute n(l)*N_s exactly (the full lang set
    is crossed in on both sides).

    Shape: pure map-side — per-batch (source, lang, n) partials; the
    driver folds O(sources x langs) tiny rows (both cardinalities are
    catalog-bounded, not corpus-bounded). Zero shuffle."""
    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["source", "lang"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    c = (ds.map_batches(partial, batch_format="pandas",
                        batch_size=65536).to_pandas()
         .groupby(["source", "lang"], as_index=False)["n"].sum())
    piv = c.pivot_table(index="source", columns="lang", values="n",
                        fill_value=0, aggfunc="sum")
    nl = {l: int(piv[l].sum()) for l in piv.columns}
    nn = sum(nl.values())
    rows = []
    for src in piv.index:
        ns = int(piv.loc[src].sum())
        num = sum(abs(int(piv.loc[src, l]) * nn - nl[l] * ns)
                  for l in piv.columns)
        if num >= 2**63:
            raise AssertionError("source_lang_tvd: numerator exceeds "
                                 "BIGINT — emit (num, denom) split")
        rows.append((src, ns, num,
                     round(num / (2.0 * float(ns) * float(nn)), 6)))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "tvd_num",
                                      "tvd"])
    for col in ("n_docs", "tvd_num"):
        out[col] = out[col].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


SQL_SOURCE_LANG_TVD = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS HUGEINT) AS n
  FROM documents GROUP BY source, lang
), l AS (
  SELECT lang, SUM(n) AS nl FROM c GROUP BY lang
), s AS (
  SELECT source, SUM(n) AS ns FROM c GROUP BY source
), t AS (
  SELECT SUM(n) AS nn FROM c
)
SELECT s.source,
       CAST(s.ns AS BIGINT) AS n_docs,
       CAST(SUM(abs(COALESCE(c.n, 0) * t.nn - l.nl * s.ns)) AS BIGINT)
         AS tvd_num,
       ROUND(CAST(SUM(abs(COALESCE(c.n, 0) * t.nn - l.nl * s.ns))
                  AS DOUBLE)
             / (2.0 * CAST(s.ns AS DOUBLE) * CAST(t.nn AS DOUBLE)), 6)
         AS tvd
FROM s CROSS JOIN l CROSS JOIN t
LEFT JOIN c ON c.source = s.source AND c.lang = l.lang
GROUP BY s.source, s.ns, t.nn
"""


def q_degree_spend_corr(sf_dir: str):
    """Graph x relational composition: does a customer's supplier
    DEGREE (distinct suppliers, from the shared :func:`_cs_pairs` edge
    builder) correlate with their total spend? The cross-domain join a
    real platform runs constantly (graph feature -> tabular metric),
    demonstrating that the graph family's edge machinery composes with
    the join machinery. ONE custkey-bucketed shuffle co-locates degree
    partials with spend partials; each bucket joins vectorized and
    emits SIX integer moment partials (the value_hour_corr shape);
    Pearson r is one mirrored float expression over Python-big-int
    folded sums, round-6. A per-bucket 2^62 mass guard raises before
    int64 partials could wrap."""
    B = _pair_buckets()
    W = max(8, _cpus())
    pairs = _cs_pairs(sf_dir, B, W)

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["c"] // 2).astype("int64")
        out = pd.DataFrame({"key": c}).groupby(
            "key", as_index=False).size().rename(columns={"size": "v"})
        out["v"] = out["v"].astype("int64")
        return out.assign(_b=out["key"] % B, side="d")

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def spend_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                         + 0.5).astype(np.int64)
        out = pd.DataFrame({"key": df["o_custkey"].astype("int64"),
                            "v": cents}).groupby(
            "key", as_index=False)["v"].sum()
        return out.assign(_b=out["key"] % B, side="s")

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        d = g.loc[g["side"] == "d"].groupby("key",
                                            as_index=False)["v"].sum() \
            .rename(columns={"v": "x"})
        s = g.loc[g["side"] == "s"].groupby("key",
                                            as_index=False)["v"].sum() \
            .rename(columns={"v": "y"})
        m = d.merge(s, on="key")
        x = m["x"].to_numpy(np.int64)
        y = m["y"].to_numpy(np.int64)
        parts = {"n": len(m), "sx": int(x.sum()), "sy": int(y.sum()),
                 "sxx": int((x * x).sum()), "syy": 0,
                 "sxy": int((x * y).sum())}
        # y^2 via object dtype: spend^2 passes int64 at modest scale
        parts["syy"] = int((y.astype(object) ** 2).sum())
        if abs(parts["sxy"]) >= 2**62:
            raise AssertionError(
                "degree_spend_corr: bucket moment mass near int64 — "
                "shrink buckets or split accumulation")
        return pd.DataFrame({k: [v] for k, v in parts.items()})

    parts = (pairs.map_batches(deg_partial, batch_format="pandas")
             .union(orders.map_batches(spend_partial,
                                       batch_format="pandas",
                                       batch_size=65536))
             .groupby("_b").map_groups(moments, batch_format="pandas")
             .to_pandas())
    n = int(parts["n"].sum())
    sx = sum(int(v) for v in parts["sx"])
    sy = sum(int(v) for v in parts["sy"])
    sxx = sum(int(v) for v in parts["sxx"])
    syy = sum(int(v) for v in parts["syy"])
    sxy = sum(int(v) for v in parts["sxy"])
    nf = float(n)
    cov = float(sxy) - float(sx) * float(sy) / nf
    vx = float(sxx) - float(sx) * float(sx) / nf
    vy = float(syy) - float(sy) * float(sy) / nf
    r = cov / np.sqrt(vx * vy)
    return pd.DataFrame({
        "n_customers": pd.Series([n], dtype="int64"),
        "corr_degree_spend": [_round_away(float(r), 6)],
    })


SQL_DEGREE_SPEND_CORR = """
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), deg AS (
  SELECT c, CAST(COUNT(*) AS HUGEINT) AS x FROM pairs GROUP BY c
), sp AS (
  SELECT o_custkey AS c,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
              AS HUGEINT) AS y
  FROM orders GROUP BY o_custkey
), j AS (
  SELECT x, y FROM deg JOIN sp USING (c)
), m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_customers,
       ROUND((sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
         AS corr_degree_spend
FROM m
"""


def q_mcnemar_test(sf_dir: str):
    """McNemar's test on paired binary outcomes — did the set of users
    who PURCHASE change between the two month halves? Only the
    discordant cells matter (b = purchased first half only, c = second
    half only); chi2 = (b - c)^2 / (b + c). The paired-binary cell of
    the inference family (sign_test is its paired-numeric sibling).
    Counts are exact integers from ONE user-bucketed pass (per user a
    vectorized any-purchase flag per half); chi2 is one mirrored
    division, round-6. Users with no events in a half count as
    not-purchasing in that half (both sides)."""
    cutoff = pd.Timestamp("2024-01-16")
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return pd.DataFrame({
            "u": u,
            "first_buy": ((df["event_type"] == "purchase")
                          & (df["ts"] < cutoff)).astype("int64"),
            "second_buy": ((df["event_type"] == "purchase")
                           & (df["ts"] >= cutoff)).astype("int64"),
            "_b": u % B,
        })

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("u").agg(a=("first_buy", "max"),
                                 b=("second_buy", "max"))
        return pd.DataFrame({
            "b_only": [int(((agg["a"] == 1) & (agg["b"] == 0)).sum())],
            "c_only": [int(((agg["a"] == 0) & (agg["b"] == 1)).sum())],
            "both": [int(((agg["a"] == 1) & (agg["b"] == 1)).sum())],
            "neither": [int(((agg["a"] == 0) & (agg["b"] == 0)).sum())],
        })

    tot = (ds.map_batches(add_bucket, batch_format="pandas",
                          batch_size=65536)
           .groupby("_b").map_groups(cells, batch_format="pandas")
           .to_pandas().sum())
    b, c = int(tot["b_only"]), int(tot["c_only"])
    chi2 = (float((b - c) * (b - c)) / (b + c)) if (b + c) else 0.0
    return pd.DataFrame({
        "n_first_only": pd.Series([b], dtype="int64"),
        "n_second_only": pd.Series([c], dtype="int64"),
        "n_both": pd.Series([int(tot["both"])], dtype="int64"),
        "n_neither": pd.Series([int(tot["neither"])], dtype="int64"),
        "chi2": [_round_away(chi2, 6)],
    })


SQL_MCNEMAR_TEST = """
WITH p AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase'
                  AND ts < TIMESTAMP '2024-01-16'
                  THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN event_type = 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16'
                  THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id
), s AS (
  SELECT CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS bo,
         CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS co,
         CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS nn
  FROM p
)
SELECT bo AS n_first_only, co AS n_second_only, nb AS n_both,
       nn AS n_neither,
       CASE WHEN bo + co = 0 THEN 0.0
            ELSE ROUND(CAST((bo - co) * (bo - co) AS DOUBLE)
                       / (bo + co), 6) END AS chi2
FROM s
"""


def q_sign_test(sf_dir: str):
    """Paired sign test — did per-user spend RISE from the first half
    of the month to the second? The paired complement of the unpaired
    Welch/Mann-Whitney rows: each user is their own control, so
    between-user variance cancels. Per user the exact cent totals of
    both halves pair up (users active in only one half are excluded —
    no pair); k = #(second > first), ties dropped (the classic sign
    test), z = (k - n/2) / sqrt(n/4) under the null, one mirrored
    float expression over exact integers, round-6.

    Shape: ONE user-bucketed shuffle; per bucket a vectorized pivot
    gives every user's two totals; O(1) integer partials out."""
    cutoff = pd.Timestamp("2024-01-16")
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        c = np.floor(df["value"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        half = np.where(df["ts"].to_numpy() < cutoff.to_datetime64(),
                        "a", "b")
        return pd.DataFrame({"u": u, "h": half, "c": c, "_b": u % B})

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["u", "h"], as_index=False)["c"].sum()
        piv = agg.pivot_table(index="u", columns="h", values="c")
        if "a" not in piv or "b" not in piv:
            return pd.DataFrame({"n_pairs": [0], "k_up": [0],
                                 "n_ties": [0]})
        both = piv.dropna()
        a = both["a"].to_numpy(np.int64)
        b = both["b"].to_numpy(np.int64)
        return pd.DataFrame({
            "n_pairs": [int((a != b).sum())],
            "k_up": [int((b > a).sum())],
            "n_ties": [int((a == b).sum())],
        })

    tot = (ds.map_batches(add_bucket, batch_format="pandas",
                          batch_size=65536)
           .groupby("_b").map_groups(pair_bucket, batch_format="pandas")
           .to_pandas().sum())
    n, k, ties = int(tot["n_pairs"]), int(tot["k_up"]), int(tot["n_ties"])
    z = (float(k) - n / 2.0) / np.sqrt(n / 4.0)
    return pd.DataFrame({
        "n_pairs": pd.Series([n], dtype="int64"),
        "k_up": pd.Series([k], dtype="int64"),
        "n_ties": pd.Series([ties], dtype="int64"),
        "z_stat": [_round_away(float(z), 6)],
    })


SQL_SIGN_TEST = """
WITH h AS (
  SELECT user_id,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END
           AS half,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
), p AS (
  SELECT user_id,
         SUM(CASE WHEN half = 'a' THEN c END) AS ca,
         SUM(CASE WHEN half = 'b' THEN c END) AS cb
  FROM h GROUP BY user_id
  HAVING SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) > 0
     AND SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) > 0
), s AS (
  SELECT CAST(SUM(CASE WHEN ca <> cb THEN 1 ELSE 0 END) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN cb > ca THEN 1 ELSE 0 END) AS BIGINT) AS k,
         CAST(SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
           AS ties
  FROM p
)
SELECT n AS n_pairs, k AS k_up, ties AS n_ties,
       ROUND((CAST(k AS DOUBLE) - n / 2.0) / sqrt(n / 4.0), 6) AS z_stat
FROM s
"""


def q_arrival_rates(sf_dir: str):
    """Per-event-type arrival-rate estimate from per-user streams: the
    exponential-MLE mean inter-arrival (and its reciprocal rate) over
    every user's consecutive same-type event gaps — the traffic-model
    statistic behind capacity planning and synthetic-load generation.
    Gaps are whole-second boundary counts (floor both endpoints — the
    session_stats convention), summed as EXACT integers; the mean is
    ONE division of two integers per type, round-6.

    Shape: the user-bucket shuffle; each bucket computes every user's
    per-type diffs in one vectorized sort+shift pass and emits
    O(types) integer partials; the driver folds buckets x types tiny
    rows. Types with no gaps anywhere are absent on both sides."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return df.assign(_b=u % B)

    def gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        sec = g["ts"].dt.floor("s")
        same = (g["user_id"].eq(g["user_id"].shift())
                & g["event_type"].eq(g["event_type"].shift()))
        d = (sec - sec.shift()).dt.total_seconds()
        out = pd.DataFrame({
            "event_type": g["event_type"][same],
            "n_gaps": np.int64(1),
            "gap_sec": d[same].astype("int64"),
        })
        return out.groupby("event_type", as_index=False).sum()

    parts = (ds.map_batches(add_bucket, batch_format="pandas")
             .groupby("_b").map_groups(gaps_bucket,
                                       batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("event_type", as_index=False).agg(
        n_gaps=("n_gaps", "sum"), gap_sec=("gap_sec", "sum"))
    for c in ("n_gaps", "gap_sec"):
        agg[c] = agg[c].astype("int64")
    agg["mean_gap_sec"] = _round_away(
        agg["gap_sec"].to_numpy(np.float64)
        / agg["n_gaps"].to_numpy(np.int64), 6)
    return agg.sort_values("event_type").reset_index(drop=True)


SQL_ARRIVAL_RATES = """
WITH g AS (
  SELECT event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id), ts) AS d
  FROM events
)
SELECT event_type,
       CAST(COUNT(d) AS BIGINT) AS n_gaps,
       CAST(SUM(d) AS BIGINT) AS gap_sec,
       ROUND(CAST(SUM(d) AS DOUBLE) / COUNT(d), 6) AS mean_gap_sec
FROM g WHERE d IS NOT NULL
GROUP BY event_type
"""


def q_ooo_inversions(sf_dir: str):
    """Out-of-order accounting — the watermark/late-data statistic a
    streaming ingester needs: within each user's stream, how many PAIRS
    arrive inverted (later event_id but earlier timestamp)? event_id is
    the arrival sequence, ts the event time; inversions = pairs (i, j)
    with event_id_i < event_id_j but ts_i > ts_j. Zero inversions means
    per-user arrival order is already time order (no reorder buffer
    needed); the share calibrates watermark slack.

    Shape: the user-bucket shuffle; per user the exact inversion count
    is one vectorized upper-triangle comparison. Per-user streams are
    assumed session-bounded (<= ~4k events — documented cap, a raise
    not a wrong answer, and the O(n log n) BIT variant is the noted
    upgrade path if a corpus breaks it); pair totals are exact ints.
    Users with < 2 events emit n_pairs = 0 rows on both sides."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return df.assign(_b=u % B)

    def inv_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"])
        rows = []
        for uid, sub in g.groupby("user_id"):
            n = len(sub)
            if n > 4096:
                raise AssertionError(
                    "ooo_inversions: per-user stream exceeds the "
                    "documented 4k pairwise cap — switch to the BIT "
                    "merge-count variant")
            ts = sub["ts"].to_numpy()
            # rows are in arrival (event_id) order; an inversion is a
            # later arrival with an EARLIER timestamp
            inv = int((ts[:, None] > ts[None, :])[
                np.triu_indices(n, k=1)].sum()) if n > 1 else 0
            rows.append((int(uid), n * (n - 1) // 2, inv))
        out = pd.DataFrame(rows, columns=["user_id", "n_pairs",
                                          "n_inversions"])
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    out = (ds.map_batches(add_bucket, batch_format="pandas")
           .groupby("_b").map_groups(inv_bucket, batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


SQL_OOO_INVERSIONS = """
WITH u AS (SELECT DISTINCT user_id FROM events),
p AS (
  SELECT a.user_id, COUNT(*) AS inv
  FROM events a JOIN events b
    ON a.user_id = b.user_id AND a.event_id < b.event_id
   AND a.ts > b.ts
  GROUP BY a.user_id
), n AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
)
SELECT CAST(u.user_id AS BIGINT) AS user_id,
       CAST(n.cnt * (n.cnt - 1) // 2 AS BIGINT) AS n_pairs,
       CAST(COALESCE(p.inv, 0) AS BIGINT) AS n_inversions
FROM u JOIN n USING (user_id) LEFT JOIN p USING (user_id)
"""


def q_user_autocorr(sf_dir: str):
    """Per-user lag-1 autocorrelation of event values — the
    behavioral-regularity / bot-detection signal (a scripted client's
    values repeat, phi -> 1; organic traffic decorrelates). For each
    user's value series under the (ts, event_id) total order, the
    lag-1 Pearson correlation of (x_t, x_{t+1}) pairs, computed from
    EXACT integer cents moments (n, Sa, Sb, Saa, Sbb, Sab over the
    shifted pair frame).

    Shape: the one-shuffle user-bucket idiom — users hash into
    ``_pair_buckets()`` groups, each bucket sorts thousands of users in
    ONE vectorized pass and builds every user's shifted pairs with a
    single boundary-safe shift; per-user moments come out of a C-level
    grouped agg. Moments stay int64 (cents^2 <= ~3.1e9 x per-user
    event counts — guard raises at 2^53); the correlation is ONE float
    expression over six exact ints, mirrored operation-for-operation,
    round-6. Users with < 3 events or zero variance on either side are
    excluded on BOTH sides (the SQL HAVING mirrors the mask)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return df.assign(_b=u % B)

    def corr_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        c = np.floor(g["value"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        u = g["user_id"].to_numpy()
        same = u[1:] == u[:-1]
        a, b = c[:-1][same], c[1:][same]
        pf = pd.DataFrame({
            "user_id": u[1:][same], "n": np.int64(1),
            "sa": a, "sb": b, "saa": a * a, "sbb": b * b, "sab": a * b,
        }).groupby("user_id", as_index=False).sum()
        for col in ("saa", "sbb", "sab"):
            if len(pf) and int(pf[col].abs().max()) >= 2**53:
                raise AssertionError(
                    "user_autocorr: moments exceed the float64-exact "
                    "envelope — switch to big-int columns")
        n = pf["n"].to_numpy(np.float64)
        sa = pf["sa"].to_numpy(np.float64)
        sb = pf["sb"].to_numpy(np.float64)
        va = pf["saa"].to_numpy(np.float64) - sa * sa / n
        vb = pf["sbb"].to_numpy(np.float64) - sb * sb / n
        cov = pf["sab"].to_numpy(np.float64) - sa * sb / n
        keep = (n >= 2) & (va > 0) & (vb > 0)
        out = pd.DataFrame({
            "user_id": pf["user_id"].astype("int64")[keep],
            "n_pairs": pf["n"].astype("int64")[keep],
            "phi": np.round(cov[keep] / np.sqrt(va[keep] * vb[keep]), 6),
        })
        return out

    out = (ds.map_batches(add_bucket, batch_format="pandas")
           .groupby("_b").map_groups(corr_bucket, batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USER_AUTOCORR = """
WITH p AS (
  SELECT user_id,
         lag(CAST(ROUND(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS a,
         CAST(ROUND(value * 100) AS BIGINT) AS b
  FROM events
), m AS (
  SELECT user_id,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(a) AS DOUBLE) AS sa, CAST(SUM(b) AS DOUBLE) AS sb,
         CAST(SUM(a * a) AS DOUBLE) AS saa,
         CAST(SUM(b * b) AS DOUBLE) AS sbb,
         CAST(SUM(a * b) AS DOUBLE) AS sab
  FROM p WHERE a IS NOT NULL
  GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND((sab - sa * sb / n)
             / sqrt((saa - sa * sa / n) * (sbb - sb * sb / n)), 6) AS phi
FROM m
WHERE n >= 2 AND saa - sa * sa / n > 0 AND sbb - sb * sb / n > 0
"""


def q_wilson_conversion(sf_dir: str):
    """Per-segment conversion rate (share of customers with >= 1
    order) with the Wilson 95% score interval — the uncertainty-aware
    dashboard row (a 3-customer segment at 100% must NOT outrank a
    10k-customer segment at 90%; the Wilson lower bound is the
    standard fix, and ranking by it is exactly the sort emitted here).

    Shape: orders reduce to distinct custkeys (per-batch distinct
    partials, a key lives in one bucket); ONE bucketed shuffle
    co-locates them with the customer rows and per-bucket vectorized
    isin emits O(segments) (n, k) partials; the driver folds a handful
    of integers. The interval is a closed-form float expression over
    two exact ints, mirrored operation-for-operation with z pinned to
    1.96 on both sides; round-6 output."""
    B = _pair_buckets()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_custkey"].drop_duplicates().astype("int64")
        return pd.DataFrame({"_b": k % B, "key": k, "seg": "",
                             "side": "o"})

    def c_prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({"_b": k % B, "key": k,
                             "seg": df["c_mktsegment"], "side": "c"})

    def seg_counts(g: pd.DataFrame) -> pd.DataFrame:
        active = set(g.loc[g["side"] == "o", "key"].to_numpy())
        c = g.loc[g["side"] == "c"]
        out = pd.DataFrame({
            "seg": c["seg"],
            "n": np.int64(1),
            "k": c["key"].isin(active).astype("int64"),
        }).groupby("seg", as_index=False).sum()
        return out

    parts = (orders.map_batches(o_prep, batch_format="pandas",
                                batch_size=65536)
             .union(cust.map_batches(c_prep, batch_format="pandas",
                                     batch_size=65536))
             .groupby("_b").map_groups(seg_counts, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("seg", as_index=False).agg(n=("n", "sum"),
                                                   k=("k", "sum"))
    z = 1.96
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    k = agg["k"].to_numpy(np.int64).astype(np.float64)
    p = k / n
    z2 = z * z
    # float-op order mirrors the oracle exactly: (numerator -+ z*sqrt)
    # THEN one division — term-wise division would drift a ulp
    num = p + z2 / (2.0 * n)
    rad = z * np.sqrt(p * (1.0 - p) / n + z2 / (4.0 * (n * n)))
    den = 1.0 + z2 / n
    out = pd.DataFrame({
        "c_mktsegment": agg["seg"],
        "n_customers": agg["n"].astype("int64"),
        "n_active": agg["k"].astype("int64"),
        "rate": np.round(p, 6),
        "wilson_lo": np.round((num - rad) / den, 6),
        "wilson_hi": np.round((num + rad) / den, 6),
    })
    return out.sort_values("c_mktsegment").reset_index(drop=True)


SQL_WILSON_CONVERSION = """
WITH a AS (
  SELECT DISTINCT o_custkey AS k FROM orders
), s AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN a.k IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           AS k
  FROM customer LEFT JOIN a ON a.k = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       CAST(n AS BIGINT) AS n_customers,
       CAST(k AS BIGINT) AS n_active,
       ROUND(k / n, 6) AS rate,
       ROUND(((k / n + 1.96 * 1.96 / (2.0 * n))
              - 1.96 * sqrt((k / n) * (1.0 - k / n) / n
                            + 1.96 * 1.96 / (4.0 * (n * n))))
             / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lo,
       ROUND(((k / n + 1.96 * 1.96 / (2.0 * n))
              + 1.96 * sqrt((k / n) * (1.0 - k / n) / n
                            + 1.96 * 1.96 / (4.0 * (n * n))))
             / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
FROM s
"""


def q_customers_no_orders(sf_dir: str):
    """Anti-join (customers with no HIGH-VALUE order, > 400k) with a
    BLOOM-FILTER pruning pass in front of the bucketed exact join — the
    100TB anti-join shape:

    1. Build: one map_batches pass over orders emits per-batch partial
       bitmaps over the filtered keys (functions/bloom.py); the
       order-independent OR-combine leaves the driver holding only the
       O(bits) filter (~1.2 bytes/key at 1% fpp), broadcast once.
    2. Prune: customers stream through the filter. Bloom-NEGATIVE keys
       definitely have no qualifying order — they are final output and
       never shuffle. Only the bloom-positive sliver (true hits + fpp)
       pays the bucketed exact anti-join against the order keys.

    Cost model: a few row-group-pruned single-column scans replace
    shuffling the probe side's full keyset — columnar scans are the
    cheap resource, the all-to-all exchange is the scarce one, and the
    exchange now carries ~hit_rate + 1% of the probe side. Exactness is
    unaffected (no false negatives; positives are exact-checked),
    pinned by the unchanged SQL oracle + a planted-fpp unit test."""
    B = _pair_buckets()
    cust = _read(sf_dir, "customer", ["c_custkey"])
    # the price predicate is pushed into the parquet scan (row-group
    # stats pruning, Arrow-side evaluation) for every pass below
    hi_orders = _read(sf_dir, "orders", ["o_custkey"],
                      filter=pc.field("o_totalprice") > 400_000)

    # -- build the filter over qualifying order keys (cluster-side) --
    # size from the FILTERED key count (one pruned single-column pass):
    # every map_batches task ships a full m_bits bitmap regardless of
    # its key count, so sizing from the raw table row count would
    # multiply the whole bitmap exchange by the inverse selectivity
    n_hint = hi_orders.count()
    if n_hint == 0:
        # no qualifying orders: every customer is a bloom-negative
        return cust.to_pandas().astype({"c_custkey": "int64"}) \
            .sort_values("c_custkey").reset_index(drop=True)
    m_bits, k_hashes = BLOOM.bloom_params(n_hint, fpp=0.01)

    def o_bitmap(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["o_custkey"].astype("int64").to_numpy()
        return pd.DataFrame(
            {"words": [BLOOM.bloom_partial(keys, m_bits, k_hashes).tobytes()]})

    # streaming OR: the driver folds partial bitmaps as they arrive and
    # holds only the accumulator + one incoming partial (O(bits)), never
    # all n_batches bitmaps at once
    bitmaps = hi_orders.map_batches(o_bitmap, batch_format="pandas")
    bloom_ref = ray.put(BLOOM.bloom_or(
        w for b in bitmaps.iter_batches(batch_format="pandas")
        for w in b["words"]))

    # -- negatives bypass the shuffle entirely --
    def c_negatives(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64").to_numpy()
        hit = BLOOM.bloom_might_contain(ray.get(bloom_ref), k, k_hashes)
        return pd.DataFrame({"c_custkey": k[~hit]})

    kept = cust.map_batches(c_negatives, batch_format="pandas").to_pandas()

    # -- positives (true hits + fpp sliver) take the exact bucketed join --
    def c_positives(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64").to_numpy()
        hit = BLOOM.bloom_might_contain(ray.get(bloom_ref), k, k_hashes)
        k = k[hit]
        return pd.DataFrame({"key": k, "side": "c", "bucket": k % B})

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        # pre-shrink the build side to distinct keys per batch
        k = df["o_custkey"].astype("int64").drop_duplicates()
        return pd.DataFrame({"key": k, "side": "o", "bucket": k % B})

    both = cust.map_batches(c_positives, batch_format="pandas").union(
        hi_orders.map_batches(o_prep, batch_format="pandas")
    )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["side"] == "c", "key"]
        right = g.loc[g["side"] == "o", "key"]
        out = left[~left.isin(right)]
        return pd.DataFrame({"c_custkey": out.to_numpy(dtype=np.int64)})

    fp = both.groupby("bucket").map_groups(anti, batch_format="pandas").to_pandas()
    out = pd.concat([kept, fp], ignore_index=True)
    return out.sort_values("c_custkey").reset_index(drop=True)


SQL_CUSTOMERS_NO_ORDERS = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


def q_top_orders_per_segment(sf_dir: str, _broadcast_max: int | None = None):
    """Per-group top-k (top-3 orders by price per market segment), with
    the SAME broadcast-budget guard as q_mktsegment_stats: the customer
    dim is probed with ``limit(budget+1)``; within budget it is ray.put
    ONCE and each batch keeps only its LOCAL top-3 per segment before
    the tiny final combine (the grouped-top-k analogue of revenue_topk's
    pruning). Past the budget the query falls back to a bucketed hash
    join: orders are pre-pruned per batch to the local top-3 PER CUSTKEY
    (a correct superset — a segment's top-3 orders contain at most 3
    orders of any one custkey), both sides shuffle by ``custkey % B``,
    each bucket attaches segments and keeps its top-3 per segment, and
    the driver combines O(B x segments x 3) rows. Nothing driver-side
    scales with the dim."""
    budget = _BROADCAST_MAX_KEYS if _broadcast_max is None else _broadcast_max
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    probe = cust_ds.limit(budget + 1).to_pandas()
    if len(probe) <= budget:
        lookup_ref = ray.put(dict(zip(probe["c_custkey"], probe["c_mktsegment"])))

        def local_topk(df: pd.DataFrame) -> pd.DataFrame:
            lookup = ray.get(lookup_ref)
            df = df.assign(c_mktsegment=df["o_custkey"].map(lookup))
            df = df.sort_values(["o_totalprice", "o_orderkey"],
                                ascending=[False, True])
            return df.groupby("c_mktsegment", as_index=False).head(3)[
                ["c_mktsegment", "o_orderkey", "o_totalprice"]
            ]

        parts = orders.map_batches(local_topk, batch_format="pandas",
                                   batch_size=65536).to_pandas()
    else:
        B = _pair_buckets()

        def c_prep(df: pd.DataFrame) -> pd.DataFrame:
            k = df["c_custkey"].astype("int64")
            return pd.DataFrame({"bucket": k % B, "key": k,
                                 "seg": df["c_mktsegment"],
                                 "o_orderkey": np.int64(-1),
                                 "o_totalprice": 0.0, "side": "c"})

        def o_prep(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["o_totalprice", "o_orderkey"],
                                ascending=[False, True])
            df = df.groupby("o_custkey", as_index=False).head(3)
            k = df["o_custkey"].astype("int64")
            return pd.DataFrame({"bucket": k % B, "key": k, "seg": "",
                                 "o_orderkey": df["o_orderkey"].astype("int64"),
                                 "o_totalprice": df["o_totalprice"],
                                 "side": "o"})

        def join_topk(g: pd.DataFrame) -> pd.DataFrame:
            seg = dict(zip(g.loc[g["side"] == "c", "key"],
                           g.loc[g["side"] == "c", "seg"]))
            o = g[g["side"] == "o"]
            out = pd.DataFrame({
                "c_mktsegment": o["key"].map(seg),
                "o_orderkey": o["o_orderkey"],
                "o_totalprice": o["o_totalprice"],
            }).sort_values(["o_totalprice", "o_orderkey"],
                           ascending=[False, True])
            return out.groupby("c_mktsegment", as_index=False).head(3)

        parts = cust_ds.map_batches(c_prep, batch_format="pandas",
                                    batch_size=65536) \
            .union(orders.map_batches(o_prep, batch_format="pandas",
                                      batch_size=65536)) \
            .groupby("bucket").map_groups(join_topk, batch_format="pandas") \
            .to_pandas()

    parts = parts.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
    top = parts.groupby("c_mktsegment", as_index=False).head(3).copy()
    top["rank"] = top.groupby("c_mktsegment").cumcount() + 1
    top["o_totalprice"] = top["o_totalprice"].round(2)
    top = top.astype({"o_orderkey": "int64", "rank": "int64"})
    return top.sort_values(["c_mktsegment", "rank"]).reset_index(drop=True)


SQL_TOP_ORDERS_PER_SEGMENT = """
SELECT c_mktsegment, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rank <= 3
"""


def q_median_prices(sf_dir: str):
    """Exact distributed median of o_totalprice (lower median), PER
    order priority plus a global 'ALL' row, in one shared algorithm:
    iterative histogram narrowing — each pass is one map_batches
    emitting per-group 512-bin partial histograms over that group's
    current [lo, hi) range; the driver holds one (lo, hi, rank) triple
    per group (O(groups) state, the global median is just one more
    group) and narrows until every group's candidate bin is small,
    then one filtered pass collects the survivors. O(passes) scans for
    ALL groups together — no per-group full sort, no join, no global
    sort, no full materialization.

    Fused into the FIRST stats pass: a mergeable quantile summary
    (functions/quantile.py) of the global price column — the
    SINGLE-pass 100 TB quantile path for when even O(passes) scans are
    too many. Each batch emits one compact weighted summary row; the
    driver folds them binary-counter-style while streaming
    ``iter_batches`` (O(k log batches) driver state, same shape as the
    Bloom build's streaming OR). Self-gating oracle: the summary's
    median interval (guaranteed by its explicit rank-error budget to
    bracket the true median) must contain the exact histogram-narrowed
    median — asserted in-query, surfaced as the constant ``qsketch_ok``
    column the SQL oracle also emits."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    BINS = 512
    QK = 1024

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority")["o_totalprice"]
        out = g.agg(n="count", lo="min", hi="max").reset_index()
        v = df["o_totalprice"]
        out.loc[len(out)] = ["ALL", len(v), v.min(), v.max()]
        out["qs"] = None
        qvals, qwts, qerr, qn = QU.qsummary(v.to_numpy(), k=QK)
        out.loc[len(out)] = ["__QS__", 0, np.nan, np.nan, np.concatenate(
            [[qerr, float(qn)], qvals, qwts]).tobytes()]
        return out

    stat_rows: list[pd.DataFrame] = []

    def _summaries():
        stream = ds.map_batches(stats, batch_format="pandas", batch_size=65536)
        for b in stream.iter_batches(batch_format="pandas"):
            qs_mask = b["o_orderpriority"] == "__QS__"
            stat_rows.append(b.loc[~qs_mask].drop(columns="qs"))
            for buf in b.loc[qs_mask, "qs"]:
                arr = np.frombuffer(buf, dtype=np.float64)
                m = (len(arr) - 2) // 2
                yield arr[2:2 + m], arr[2 + m:], float(arr[0]), int(arr[1])

    summary = QU.qfold(_summaries(), k=QK)
    parts = pd.concat(stat_rows, ignore_index=True)
    agg = parts.groupby("o_orderpriority").agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    state: dict[str, list] = {}
    for grp, row in agg.iterrows():
        state[grp] = [float(row["lo"]), float(np.nextafter(row["hi"], np.inf)),
                      int((row["n"] + 1) // 2), False]  # lo, hi, rank, done

    for _ in range(6):
        open_groups = {g: (s[0], s[1]) for g, s in state.items() if not s[3]}
        if not open_groups:
            break
        bounds_ref = ray.put(open_groups)

        def hist(df: pd.DataFrame) -> pd.DataFrame:
            b = ray.get(bounds_ref)
            rows = []
            groups = list(df.groupby("o_orderpriority")) + [("ALL", df)]
            for grp, sub in groups:
                if grp not in b:
                    continue
                lo, hi = b[grp]
                v = sub["o_totalprice"].to_numpy()
                v = v[(v >= lo) & (v < hi)]
                h, _ = np.histogram(v, bins=np.linspace(lo, hi, BINS + 1))
                rows.append((grp, h.astype(np.int64).tobytes()))
            return pd.DataFrame(rows, columns=["grp", "h"]) if rows else \
                pd.DataFrame({"grp": pd.Series([], dtype="object"),
                              "h": pd.Series([], dtype="object")})

        hp = ds.map_batches(hist, batch_format="pandas", batch_size=65536).to_pandas()
        for grp in open_groups:
            total = np.zeros(BINS, dtype=np.int64)
            for buf in hp.loc[hp["grp"] == grp, "h"]:
                total += np.frombuffer(buf, dtype=np.int64)
            lo, hi, rank, _ = state[grp]
            edges = np.linspace(lo, hi, BINS + 1)
            cum = np.cumsum(total)
            bin_i = int(np.searchsorted(cum, rank))
            rank -= int(cum[bin_i - 1]) if bin_i else 0
            done = bool(total[bin_i] <= 100_000)
            state[grp] = [float(edges[bin_i]), float(edges[bin_i + 1]), rank, done]

    ranges_ref = ray.put({g: (s[0], s[1]) for g, s in state.items()})

    def in_range(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ranges_ref)
        keep = []
        groups = list(df.groupby("o_orderpriority")) + [("ALL", df)]
        for grp, sub in groups:
            lo, hi = b[grp]
            v = sub["o_totalprice"]
            kept = sub[(v >= lo) & (v < hi)][["o_orderpriority", "o_totalprice"]]
            kept = kept.assign(grp=grp)
            keep.append(kept)
        return pd.concat(keep, ignore_index=True) if keep else \
            pd.DataFrame({"o_orderpriority": pd.Series([], dtype="object"),
                          "o_totalprice": pd.Series([], dtype="float64"),
                          "grp": pd.Series([], dtype="object")})

    vals = ds.map_batches(in_range, batch_format="pandas").to_pandas()
    rows = []
    exact_all = None
    for grp, s in sorted(state.items()):
        v = np.sort(vals.loc[vals["grp"] == grp, "o_totalprice"].to_numpy())
        exact = float(v[s[2] - 1])
        if grp == "ALL":
            exact_all = exact
        rows.append((grp, round(exact, 2)))
    # gate the single-pass summary against the exact path: its median
    # interval carries a proven rank-error budget, so containment can
    # only fail on an implementation bug — which should go red here
    n_all = int(agg.loc["ALL", "n"])
    qlo, qhi = QU.quantile_interval(summary, (n_all + 1) // 2)
    if not (qlo - 1e-9 <= exact_all <= qhi + 1e-9):
        raise AssertionError(
            f"qsketch_ok: exact median {exact_all} outside the quantile "
            f"summary interval [{qlo}, {qhi}] (err={summary[2]:.1f})")
    out = pd.DataFrame(rows, columns=["o_orderpriority", "median_price"])
    out["qsketch_ok"] = True
    return out


SQL_MEDIAN_PRICES = """
WITH per AS (
  SELECT o_orderpriority, ROUND(v, 2) AS median_price, TRUE AS qsketch_ok FROM (
    SELECT o_orderpriority, o_totalprice AS v,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM orders
  ) WHERE rn = (n + 1) // 2
), allr AS (
  SELECT 'ALL' AS o_orderpriority, ROUND(v, 2) AS median_price, TRUE AS qsketch_ok FROM (
    SELECT o_totalprice AS v,
           row_number() OVER (ORDER BY o_totalprice) AS rn,
           COUNT(*) OVER () AS n
    FROM orders
  ) WHERE rn = (n + 1) // 2
)
SELECT * FROM per UNION ALL SELECT * FROM allr
"""


# --------------------------------------------------------------- events

def q_event_type_stats(sf_dir: str):
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = _partial_group_sum(ds, ["event_type"], {"sum_value": "value"}, counts="n_events")
    out["avg_value"] = out["sum_value"] / out["n_events"]
    out = _round_cols(out, {"sum_value": 2, "avg_value": 6})
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


SQL_EVENT_TYPE_STATS = """
SELECT event_type, ROUND(SUM(value), 2) AS sum_value,
       ROUND(SUM(value) / COUNT(*), 6) AS avg_value, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_value_hour_corr(sf_dir: str):
    """Pearson correlation of event value vs hour-of-day in ONE
    streaming pass: each batch emits the 6 raw moments (n, Sx, Sy, Sxx,
    Syy, Sxy); the driver combines 6 numbers per batch — the
    textbook single-pass statistic, zero shuffle."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["value"].to_numpy(dtype=np.float64)
        y = df["ts"].dt.hour.to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "n": [len(x)], "sx": [x.sum()], "sy": [y.sum()],
            "sxx": [(x * x).sum()], "syy": [(y * y).sum()], "sxy": [(x * y).sum()],
        })

    m = ds.map_batches(moments, batch_format="pandas", batch_size=65536).to_pandas().sum()
    n = m["n"]
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    corr = cov / np.sqrt(vx * vy)
    return pd.DataFrame({"corr_value_hour": [round(float(corr), 4)]})


SQL_VALUE_HOUR_CORR = """
SELECT ROUND(corr(value, CAST(EXTRACT(hour FROM ts) AS DOUBLE)), 4)
         AS corr_value_hour
FROM events
"""


def q_price_skewness(sf_dir: str):
    """Per-priority price skewness (population g1) from exact integer
    raw moments — the third-moment statistic that needs the HI/LO
    SPLIT-ACCUMULATION pattern the second-moment queries only gesture
    at: cents^3 reaches ~1.25e23, so a direct int64 batch sum wraps
    around 75 rows. Each batch instead splits c = q*1e4 + r and sums
    the seven binomial components (q^3, q^2 r, q r^2, r^3, q^2, qr,
    r^2 — each bounded ~1e17 per 65k-row batch, inside int64 with
    margin); the driver reassembles S2 and S3 with Python big-ints, so
    the moments are EXACT at any corpus size while the oracle's
    HUGEINT SUM(c*c*c) is exact natively. One streamed scan, zero
    shuffle, O(groups) driver state; g1 is one mirrored float
    expression (libm pow both sides), round-6."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        q, r = c // 10_000, c % 10_000
        g = pd.DataFrame({
            "grp": df["o_orderpriority"], "n": np.int64(1), "s1": c,
            "q2": q * q, "qr": q * r, "r2": r * r,
            "q3": q * q * q, "q2r": q * q * r, "qr2": q * r * r,
            "r3": r * r * r,
        })
        return g.groupby("grp", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    rows = []
    for grp, sub in parts.groupby("grp"):
        tot = {c: sum(int(v) for v in sub[c]) for c in sub.columns
               if c != "grp"}
        n = tot["n"]
        s1 = tot["s1"]
        s2 = tot["q2"] * 10**8 + 2 * tot["qr"] * 10**4 + tot["r2"]
        s3 = (tot["q3"] * 10**12 + 3 * tot["q2r"] * 10**8
              + 3 * tot["qr2"] * 10**4 + tot["r3"])
        m = float(s1) / n
        v = float(s2) / n - m ** 2.0
        g1 = ((float(s3) / n - 3.0 * m * (float(s2) / n) + 2.0 * m ** 3.0)
              / v ** 1.5)
        rows.append((grp, n, round(g1, 6)))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n", "skew_g1"])
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_PRICE_SKEWNESS = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS HUGEINT) AS c
  FROM orders
), s AS (
  SELECT o_orderpriority, COUNT(*) AS n, SUM(c) AS s1,
         SUM(c * c) AS s2, SUM(c * c * c) AS s3
  FROM c GROUP BY o_orderpriority
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
       ROUND((CAST(s3 AS DOUBLE) / n
              - 3.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
              + 2.0 * POWER(CAST(s1 AS DOUBLE) / n, 3.0))
             / POWER(CAST(s2 AS DOUBLE) / n
                     - POWER(CAST(s1 AS DOUBLE) / n, 2.0), 1.5), 6)
         AS skew_g1
FROM s
"""


def q_revenue_changepoint(sf_dir: str):
    """Single changepoint in mean order value over time (piecewise-
    constant model) — the monitoring primitive behind 'when did this
    metric shift?': order months are candidate boundaries; for each
    boundary b the model fits one mean before and one after, and the
    chosen b minimizes SSE_left + SSE_right. Classic offline CUSUM /
    binary-segmentation step.

    Distributed shape: ONE streamed scan emits per-MONTH integer
    sufficient statistics (n, sum cents, and sum cents^2 via the hi/lo
    split — cents^2 wraps int64 in under a hundred rows, the
    price_skewness discipline); the driver folds O(months) rows and
    sweeps prefix sums — candidate enumeration is over the TIME GRID,
    never the data. Each side's SSE uses A = n*Syy - Sy^2 (EXACT via
    Python big-ints / HUGEINT); the only floats are the final per-side
    divisions, mirrored operation-for-operation, and the argmin tie
    breaks on the smaller month on both sides. Output: boundary month,
    per-side means (round-6) and the total SSE (round-4)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"]
        m = (d.dt.year.to_numpy(np.int64) * 12
             + (d.dt.month.to_numpy(np.int64) - 1))
        c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        q, r = c // 10_000, c % 10_000
        g = pd.DataFrame({"m": m, "n": np.int64(1), "sy": c,
                          "q2": q * q, "qr": q * r, "r2": r * r})
        return g.groupby("m", as_index=False).sum()

    parts = (ds.map_batches(partial, batch_format="pandas",
                            batch_size=65536).to_pandas()
             .groupby("m", as_index=False).sum().sort_values("m")
             .reset_index(drop=True))
    months = parts["m"].astype(int).tolist()
    n_m = [int(v) for v in parts["n"]]
    sy_m = [int(v) for v in parts["sy"]]
    syy_m = [int(q2) * 10**8 + 2 * int(qr) * 10**4 + int(r2)
             for q2, qr, r2 in zip(parts["q2"], parts["qr"], parts["r2"])]
    N, SY, SYY = sum(n_m), sum(sy_m), sum(syy_m)
    best = None
    nl = yl = yyl = 0
    for i in range(len(months) - 1):
        nl += n_m[i]; yl += sy_m[i]; yyl += syy_m[i]
        nr, yr, yyr = N - nl, SY - yl, SYY - yyl
        sse = (float(nl * yyl - yl * yl) / nl
               + float(nr * yyr - yr * yr) / nr)
        key = (sse, months[i])
        if best is None or key < best[0]:
            best = (key, nl, yl, nr, yr)
    (sse, bm), nl, yl, nr, yr = best
    return pd.DataFrame({
        "break_month": pd.Series([bm], dtype="int64"),
        "n_before": pd.Series([nl], dtype="int64"),
        "n_after": pd.Series([nr], dtype="int64"),
        "mean_before": [round(float(yl) / nl / 100.0, 6)],
        "mean_after": [round(float(yr) / nr / 100.0, 6)],
        "sse": [round(sse, 4)],
    })


SQL_REVENUE_CHANGEPOINT = """
WITH c AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS HUGEINT) AS y
  FROM orders
), mo AS (
  SELECT m, CAST(COUNT(*) AS HUGEINT) AS n, SUM(y) AS sy,
         SUM(y * y) AS syy
  FROM c GROUP BY m
), pre AS (
  SELECT m,
         SUM(n) OVER w AS nl, SUM(sy) OVER w AS yl,
         SUM(syy) OVER w AS yyl,
         (SELECT SUM(n) FROM mo) AS nt,
         (SELECT SUM(sy) FROM mo) AS yt,
         (SELECT SUM(syy) FROM mo) AS yyt
  FROM mo WINDOW w AS (ORDER BY m ROWS UNBOUNDED PRECEDING)
), cand AS (
  SELECT m, nl, yl, nt - nl AS nr, yt - yl AS yr,
         CAST(nl * yyl - yl * yl AS DOUBLE) / CAST(nl AS DOUBLE)
         + CAST((nt - nl) * (yyt - yyl) - (yt - yl) * (yt - yl)
                AS DOUBLE) / CAST(nt - nl AS DOUBLE) AS sse
  FROM pre WHERE nl < nt
)
SELECT CAST(m AS BIGINT) AS break_month,
       CAST(nl AS BIGINT) AS n_before,
       CAST(nr AS BIGINT) AS n_after,
       ROUND(CAST(yl AS DOUBLE) / CAST(nl AS DOUBLE) / 100.0, 6)
         AS mean_before,
       ROUND(CAST(yr AS DOUBLE) / CAST(nr AS DOUBLE) / 100.0, 6)
         AS mean_after,
       ROUND(sse, 4) AS sse
FROM cand ORDER BY sse, m LIMIT 1
"""


def q_theilsen_trend(sf_dir: str):
    """Theil–Sen robust trend of monthly mean order value — the
    outlier-immune slope estimator (median of all pairwise
    month-to-month slopes; up to ~29% contaminated months cannot move
    it, unlike :func:`q_price_trend_ols`). Distributed shape: the ONLY
    corpus-scale work is the per-month (n, sum-cents) integer partials
    from one streamed scan; the driver enumerates pairs over the TIME
    GRID (months^2/2 — dozens of months, thousands of pairs, O(grid)
    not O(data)). Slopes are the same float expression over exact
    integers on both sides; the median interpolation deliberately
    mirrors DuckDB's quantile_cont formula lo + (hi-lo)*0.5 (numpy's
    (lo+hi)/2 differs in the last ulp); round-6 output in
    dollars/month."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"]
        m = (d.dt.year.to_numpy(np.int64) * 12
             + (d.dt.month.to_numpy(np.int64) - 1))
        c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"m": m, "n": np.int64(1), "sy": c})
        return g.groupby("m", as_index=False).sum()

    mo = (ds.map_batches(partial, batch_format="pandas",
                         batch_size=65536).to_pandas()
          .groupby("m", as_index=False).sum().sort_values("m")
          .reset_index(drop=True))
    m = mo["m"].to_numpy(np.int64)
    mean = mo["sy"].to_numpy(np.float64) / mo["n"].to_numpy(np.int64)
    iu, ju = np.triu_indices(len(m), k=1)
    slopes = np.sort((mean[ju] - mean[iu])
                     / (m[ju] - m[iu]).astype(np.float64))
    k = len(slopes)
    h = (k - 1) * 0.5
    lo, hi = slopes[int(np.floor(h))], slopes[int(np.ceil(h))]
    med = lo + (hi - lo) * 0.5  # quantile_cont's exact interpolation
    return pd.DataFrame({
        "n_months": pd.Series([len(m)], dtype="int64"),
        "n_pairs": pd.Series([k], dtype="int64"),
        "slope_dollars_per_month": [round(float(med) / 100.0, 6)],
    })


SQL_THEILSEN_TREND = """
WITH mo AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / COUNT(*) AS mean
  FROM orders GROUP BY 1
), p AS (
  SELECT (b.mean - a.mean) / CAST(b.m - a.m AS DOUBLE) AS slope
  FROM mo a JOIN mo b ON a.m < b.m
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM mo) AS n_months,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(quantile_cont(slope, 0.5) / 100.0, 6)
         AS slope_dollars_per_month
FROM p
"""


def q_geomean_prices(sf_dir: str):
    """Per-priority geometric mean price via the fixed-point-log trick
    (the dsir_weights discipline): each row contributes L(c) =
    floor(ln(cents) * 1e9) — an INTEGER — so group sums are exact
    int64 on both sides and the comparison surface is the integer
    ``gm_fixed``, not an accumulated float (a float ln-sum would be
    order-dependent; the geometric mean is the multiplicative-scale
    average a pipeline uses for heavy-tailed prices). ln runs through
    libm's scalar log (math.log == DuckDB LN bit-for-bit — verified;
    numpy's vectorized log is NOT bit-identical) applied to per-batch
    DISTINCT cents only, so the Python-loop cost is bounded by batch
    cardinality, not rows. One streamed scan, zero shuffle; the
    readable gm_dollars is one mirrored exp of the exact integer."""
    import math

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        if len(c) and int(c.min()) <= 0:
            raise AssertionError("geomean_prices: nonpositive cents")
        uniq, inv = np.unique(c, return_inverse=True)
        lq = np.array([math.floor(math.log(float(v)) * 1e9)
                       for v in uniq], dtype=np.int64)
        g = pd.DataFrame({"grp": df["o_orderpriority"],
                          "n": np.int64(1), "s": lq[inv]})
        return g.groupby("grp", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    rows = []
    for grp, sub in parts.groupby("grp"):
        n = int(sub["n"].sum())
        s = sum(int(v) for v in sub["s"])
        if abs(s) >= 2**53:
            raise AssertionError(
                "geomean_prices: gm_fixed exceeds the float64-exact "
                "envelope — emit (s, n) and defer the exp")
        gm = math.exp(float(s) / n / 1e9) / 100.0
        rows.append((grp, n, s, round(gm, 4)))
    out = pd.DataFrame(rows, columns=["o_orderpriority", "n", "gm_fixed",
                                      "gm_dollars"])
    for c in ("n", "gm_fixed"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_GEOMEAN_PRICES = """
WITH c AS (
  SELECT o_orderpriority,
         CAST(FLOOR(LN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) * 1e9)
              AS BIGINT) AS l
  FROM orders
), s AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(l) AS BIGINT) AS gm_fixed
  FROM c GROUP BY o_orderpriority
)
SELECT o_orderpriority, n, gm_fixed,
       ROUND(EXP(CAST(gm_fixed AS DOUBLE) / n / 1e9) / 100.0, 4)
         AS gm_dollars
FROM s
"""


def q_price_stddev_by_priority(sf_dir: str):
    """Sample stddev of o_totalprice per priority via Chan et al.'s
    parallel variance combine: each batch emits (n, mean, M2) per
    group; partials merge pairwise with the numerically stable update
    (no raw sum-of-squares cancellation). The scalable shape for
    second-moment statistics over grouped data."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for grp, sub in df.groupby("o_orderpriority"):
            v = sub["o_totalprice"].to_numpy(dtype=np.float64)
            mean = v.mean()
            rows.append((grp, len(v), mean, float(((v - mean) ** 2).sum())))
        return pd.DataFrame(rows, columns=["grp", "n", "mean", "m2"])

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    out = []
    for grp, sub in parts.groupby("grp"):
        n, mean, m2 = 0.0, 0.0, 0.0
        for _, r in sub.iterrows():
            nb, mb, m2b = float(r["n"]), float(r["mean"]), float(r["m2"])
            delta = mb - mean
            tot = n + nb
            m2 = m2 + m2b + delta * delta * n * nb / tot
            mean = mean + delta * nb / tot
            n = tot
        out.append((grp, round(float(np.sqrt(m2 / (n - 1))), 2)))
    df = pd.DataFrame(out, columns=["o_orderpriority", "stddev_price"])
    return df.sort_values("o_orderpriority").reset_index(drop=True)


SQL_PRICE_STDDEV_BY_PRIORITY = """
SELECT o_orderpriority, ROUND(stddev_samp(o_totalprice), 2) AS stddev_price
FROM orders GROUP BY o_orderpriority
"""


def q_price_histogram(sf_dir: str):
    """Fixed-bin histogram of o_totalprice (16 bins of 40k, last bin
    open): one partial histogram vector per batch, summed on the
    driver — the O(bins) distributed histogram with zero shuffle."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        b = np.minimum((df["o_totalprice"].to_numpy() // 40_000).astype(np.int64), 15)
        h = np.bincount(b, minlength=16)
        return pd.DataFrame({"h": [h.astype(np.int64).tobytes()]})

    parts = ds.map_batches(hist, batch_format="pandas", batch_size=65536).to_pandas()
    total = np.zeros(16, dtype=np.int64)
    for buf in parts["h"]:
        total += np.frombuffer(buf, dtype=np.int64)
    out = pd.DataFrame({"bin": np.arange(16, dtype=np.int64),
                        "n_orders": total})
    return out[out["n_orders"] > 0].reset_index(drop=True)  # SQL GROUP BY omits empty bins


SQL_PRICE_HISTOGRAM = """
SELECT CAST(LEAST(FLOOR(o_totalprice / 40000), 15) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY bin
"""


def q_hourly_user_windows(sf_dir: str):
    """Tumbling 1h event-time windows per user: the window key is
    computed IN the batch (floor ts), then it's a plain grouped agg —
    the streaming-shaped workload pattern from the Ray guide."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_window(df: pd.DataFrame) -> pd.DataFrame:
        df["window_start"] = df["ts"].dt.floor("h")
        return df[["user_id", "window_start", "value"]]

    # user_id x hour is high-cardinality: combine in the cluster
    # (bucketed on user_id — all windows of a user co-locate)
    out = _partial_group_sum(
        ds.map_batches(add_window, batch_format="pandas"),
        ["user_id", "window_start"], {"sum_value": "value"}, counts="n_events",
        distributed=True, round_cols={"sum_value": 4},
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values(["user_id", "window_start"]).reset_index(drop=True)


SQL_HOURLY_USER_WINDOWS = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       ROUND(SUM(value), 4) AS sum_value, COUNT(*) AS n_events
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


def q_sliding_user_windows(sf_dir: str):
    """SLIDING 3-hour event-time windows (step 1h) per user — the
    windowed-aggregate shape Ray Data lacks natively, built WITHOUT a
    per-row window loop: per-batch tumbling hourly partials (the
    hourly_user_windows kernel), each partial row exploded to the 3
    window starts it covers (vectorized concat), then one bucketed
    combine keyed on user_id. Work is O(events + 3*hourly_partials);
    the shuffle carries only pre-aggregated partials, never raw
    events."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hr=df["ts"].dt.floor("h"))
        g = df.groupby(["user_id", "hr"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        reps = pd.concat(
            [g.assign(window_start=g["hr"] - pd.Timedelta(hours=k)) for k in range(3)],
            ignore_index=True,
        )
        reps["user_id"] = reps["user_id"].astype("int64")
        return reps[["user_id", "window_start", "n_events", "sum_value"]]

    out = _bucketed_combine(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["user_id", "window_start"],
        {"n_events": "sum", "sum_value": "sum"},
        round_cols={"sum_value": 4},
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["user_id"] = out["user_id"].astype("int64")
    return out.sort_values(["user_id", "window_start"]).reset_index(drop=True)


SQL_SLIDING_USER_WINDOWS = """
WITH h AS (
  SELECT user_id, date_trunc('hour', ts) AS hr,
         COUNT(*) AS n, SUM(value) AS v
  FROM events GROUP BY user_id, date_trunc('hour', ts)
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       hr - k * INTERVAL 1 HOUR AS window_start,
       CAST(SUM(n) AS BIGINT) AS n_events,
       ROUND(SUM(v), 4) AS sum_value
FROM h, range(3) t(k)
GROUP BY user_id, window_start
"""



def q_session_stats(sf_dir: str):
    """Session windows (gap > 30 min) per user, per-session aggregates
    (gaps-and-islands: session = run of events with gaps <= 30 min).
    Users are hashed into bucket groups (one pandas group per USER
    costs ~0.4 ms each — at millions of users that is the shuffle-side
    bottleneck, so each bucket handles thousands of users in ONE
    vectorized pass): session index via per-user cumulative sum of
    break flags, then a C-level grouped agg. Ordering is established
    inside the bucket, never globally (SURVEY.md §4.3). The
    windowed-aggregate shape Ray Data lacks natively; per-user session
    counts are its trivial max-over-session_idx projection."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return pd.DataFrame({"user_id": u, "ts": df["ts"], "_b": u % B})

    def stats_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = (new_user | (g["ts"].diff() > pd.Timedelta(minutes=30))).astype("int64")
        g = g.assign(session_idx=brk.groupby(g["user_id"]).cumsum())
        out = g.groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("ts", "size"), t0=("ts", "min"), t1=("ts", "max")
        )
        # date_diff('second', ...) semantics: whole-second boundary
        # crossings, i.e. floor both endpoints to seconds first
        out["duration_sec"] = (
            (out["t1"].dt.floor("s") - out["t0"].dt.floor("s"))
            .dt.total_seconds().astype("int64")
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "session_idx", "n_events", "duration_sec"]]

    out = ds.map_batches(add_bucket, batch_format="pandas") \
            .groupby("_b").map_groups(stats_bucket, batch_format="pandas").to_pandas()
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


SQL_SESSION_STATS = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM d
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
FROM s GROUP BY user_id, session_idx
"""


def q_abandonment_rate(sf_dir: str):
    """Session abandonment — the conversion-health metric: of sessions
    that contain a 'view', what share end WITHOUT a 'purchase', broken
    out by the weekday the session started (Monday=0, the
    dow_seasonality convention)? Same gap>30min sessions; per bucket
    the vectorized sessionize pass reduces each session to three
    booleans/keys (has_view, has_purchase, start dow) and O(7) integer
    partials leave. The rate is one mirrored division, round-6."""
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return df.assign(_b=u % B)

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = (new_user
               | (g["ts"].diff() > pd.Timedelta(minutes=30))).astype("int64")
        g = g.assign(sid=brk.cumsum())
        agg = g.groupby("sid").agg(
            view=("event_type", lambda s: int((s == "view").any())),
            buy=("event_type", lambda s: int((s == "purchase").any())),
            t0=("ts", "min"))
        agg["dow"] = agg["t0"].dt.dayofweek.astype("int64")
        v = agg.loc[agg["view"] == 1]
        out = v.assign(n=np.int64(1),
                       aband=(v["buy"] == 0).astype("int64")) \
            .groupby("dow", as_index=False).agg(
                n_view_sessions=("n", "sum"),
                n_abandoned=("aband", "sum"))
        return out

    parts = (ds.map_batches(add_bucket, batch_format="pandas")
             .groupby("_b").map_groups(sess, batch_format="pandas")
             .to_pandas()
             .groupby("dow", as_index=False).agg(
                 n_view_sessions=("n_view_sessions", "sum"),
                 n_abandoned=("n_abandoned", "sum")))
    for c in ("dow", "n_view_sessions", "n_abandoned"):
        parts[c] = parts[c].astype("int64")
    parts["abandon_rate"] = _round_away(
        parts["n_abandoned"].to_numpy(np.int64)
        / parts["n_view_sessions"].to_numpy(np.float64), 6)
    return parts.sort_values("dow").reset_index(drop=True)


SQL_ABANDONMENT_RATE = """
WITH d AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
), a AS (
  SELECT user_id, sid,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b,
         CAST(isodow(MIN(ts)) - 1 AS BIGINT) AS dow
  FROM s GROUP BY user_id, sid
)
SELECT dow,
       CAST(COUNT(*) AS BIGINT) AS n_view_sessions,
       CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_abandoned,
       ROUND(CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS abandon_rate
FROM a WHERE v = 1
GROUP BY dow
"""


def q_session_entry_exit(sf_dir: str):
    """Session landing/exit analysis — which event type OPENS a session
    and which CLOSES it (the funnel designer's first question): top-10
    (entry, exit) pairs by session count over the same gap>30min
    sessions as q_session_stats, under the (ts, event_id) total order.
    ONE user-bucketed shuffle; each bucket sessionizes thousands of
    users in the vectorized sort+cumsum pass and takes first/last rows
    per session with a C-level grouped head/tail; O(types^2) partials
    fold driver-side. Exact counts, deterministic (n DESC, entry,
    exit) cut ties included."""
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return df.assign(_b=u % B)

    def entry_exit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = (new_user
               | (g["ts"].diff() > pd.Timedelta(minutes=30))).astype("int64")
        g = g.assign(sid=brk.cumsum())  # bucket-global session id
        f = g.groupby("sid")["event_type"].first()
        l = g.groupby("sid")["event_type"].last()
        out = pd.DataFrame({"entry": f, "exit": l}) \
            .groupby(["entry", "exit"], as_index=False).size() \
            .rename(columns={"size": "n_sessions"})
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    parts = (ds.map_batches(add_bucket, batch_format="pandas")
             .groupby("_b").map_groups(entry_exit, batch_format="pandas")
             .to_pandas()
             .groupby(["entry", "exit"], as_index=False)["n_sessions"]
             .sum())
    parts["n_sessions"] = parts["n_sessions"].astype("int64")
    return parts.sort_values(["n_sessions", "entry", "exit"],
                             ascending=[False, True, True]) \
        .head(10).reset_index(drop=True)


SQL_SESSION_ENTRY_EXIT = """
WITH d AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
), fe AS (
  SELECT user_id, sid,
         first_value(event_type) OVER ses AS entry,
         last_value(event_type) OVER
           (PARTITION BY user_id, sid ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS exit
  FROM s WINDOW ses AS (PARTITION BY user_id, sid
                        ORDER BY ts, event_id)
), u AS (
  SELECT DISTINCT user_id, sid, entry, exit FROM fe
)
SELECT entry, exit, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM u GROUP BY entry, exit
ORDER BY n_sessions DESC, entry, exit LIMIT 10
"""


def q_max_concurrency(sf_dir: str):
    """Peak concurrent sessions (and the earliest instant it occurs) —
    the sweep-line / interval-overlap statistic (capacity planning,
    rate-limit sizing): sessions are the same gap>30min windows as
    :func:`q_session_stats`; concurrency at instant t counts sessions
    with t0 <= t <= t1. The classic answer is a GLOBAL ordered prefix
    sum over +-1 endpoint deltas — un-Ray-shaped — so it runs as the
    distributed prefix decomposition instead:

    - shuffle 1 (by user bucket): vectorized sessionization, each
      session emits two endpoint rows (t0,+1), (t1,-1) — intervals are
      never split, a session spanning bins is carried by the offset
      fold below;
    - shuffle 2 (by UTC-day bin): each bin sorts its own endpoints
      under the total order (t, d DESC) — starts before ends at the
      same instant, so touching sessions count as overlapping — and
      emits THREE numbers: its delta total, its local running max, and
      the earliest t attaining it;
    - driver fold, O(days) rows in bin order: offset_b = sum of earlier
      totals; global max = max(offset_b + local_max_b); the earliest
      qualifying bin's recorded argmax is the global argmax (earlier
      bins never reach the global max by construction).

    Exactness: pure integer deltas; at equal (t,d) the cumulative-sum
    MULTISET of values is order-invariant (within a +1 run the max is
    the run's last row, within a -1 run its first), so (max, earliest
    t) is deterministic on both sides even where SQL peer order is
    not."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return pd.DataFrame({"user_id": u, "ts": df["ts"], "_b": u % B})

    def endpoints_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = (new_user
               | (g["ts"].diff() > pd.Timedelta(minutes=30))).astype("int64")
        g = g.assign(session_idx=brk.groupby(g["user_id"]).cumsum())
        iv = g.groupby(["user_id", "session_idx"], as_index=False).agg(
            t0=("ts", "min"), t1=("ts", "max"))
        t = pd.concat([iv["t0"], iv["t1"]], ignore_index=True)
        d = np.concatenate([np.ones(len(iv), dtype=np.int64),
                            -np.ones(len(iv), dtype=np.int64)])
        micros = t.astype("datetime64[us]").astype("int64").to_numpy()
        return pd.DataFrame({"bin": micros // (86_400 * 1_000_000),
                             "t": t, "d": d})

    def bin_sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "d"], ascending=[True, False])
        c = g["d"].cumsum().to_numpy()
        m = int(c.max())
        at = g["t"].to_numpy()[int(np.argmax(c == m))]
        return pd.DataFrame({"bin": [int(g["bin"].iloc[0])],
                             "total": [int(g["d"].sum())],
                             "local_max": [m], "at": [at]})

    bins = (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_b").map_groups(endpoints_bucket,
                                      batch_format="pandas")
            .groupby("bin").map_groups(bin_sweep, batch_format="pandas")
            .to_pandas()).sort_values("bin").reset_index(drop=True)
    offset, gmax, gat = 0, None, None
    for _, r in bins.iterrows():
        peak = offset + int(r["local_max"])
        if gmax is None or peak > gmax:
            gmax, gat = peak, r["at"]
        offset += int(r["total"])
    return pd.DataFrame({"max_concurrent": pd.Series([gmax], dtype="int64"),
                         "at_ts": [pd.Timestamp(gat)]})


SQL_MAX_CONCURRENCY = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END
           AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM d
), iv AS (
  SELECT user_id, session_idx, MIN(ts) AS t0, MAX(ts) AS t1
  FROM s GROUP BY user_id, session_idx
), ep AS (
  SELECT t0 AS t, 1 AS dd FROM iv
  UNION ALL
  SELECT t1 AS t, -1 AS dd FROM iv
), r AS (
  SELECT t, SUM(dd) OVER (ORDER BY t, dd DESC
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM ep
)
SELECT CAST(c AS BIGINT) AS max_concurrent, t AS at_ts
FROM r ORDER BY c DESC, t LIMIT 1
"""


def q_value_locf(sf_dir: str):
    """Last-observation-carried-forward imputation — the time-series
    backfill every feature pipeline needs: 'view' events don't report a
    trusted value (the deterministic masking rule, applied identically
    on both sides), so each masked row imputes the SAME user's most
    recent unmasked value under the (ts, event_id) total order; masked
    rows with no prior observation stay missing. Output is the per-user
    imputation audit (masked / imputed counts and the exact imputed
    mass) for users with at least one masked row.

    Shape: users hash into ``_pair_buckets()`` groups (a user lives in
    ONE bucket, so bucket-local LOCF is that user's global LOCF); each
    bucket forward-fills thousands of users in one vectorized pass —
    sort, NaN-mask, ``groupby(user).ffill()`` — then a C-level grouped
    agg; the driver never sees event rows. Values are quantized to
    exact integer cents BEFORE the fill (they ride the float column
    losslessly: cents < 2^53), so ``sum_imputed_cents`` is an exact
    int64 on both sides — no float-accumulation surface."""
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type", "value"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return df.assign(_b=u % B)

    def locf_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        masked = g["event_type"].eq("view")
        cents = np.floor(g["value"].to_numpy(np.float64) * 100.0 + 0.5)
        obs = pd.Series(np.where(masked.to_numpy(), np.nan, cents),
                        index=g.index)
        filled = obs.groupby(g["user_id"]).ffill()
        imputed = masked & filled.notna()
        out = pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "n_masked": masked.astype("int64"),
            "n_imputed": imputed.astype("int64"),
            "sum_imputed_cents": np.where(
                imputed.to_numpy(), filled.fillna(0).to_numpy(), 0.0),
        }).groupby("user_id", as_index=False).sum()
        out = out[out["n_masked"] > 0]
        out["sum_imputed_cents"] = out["sum_imputed_cents"].astype("int64")
        for c in ("n_masked", "n_imputed"):
            out[c] = out[c].astype("int64")
        return out

    out = (ds.map_batches(add_bucket, batch_format="pandas")
           .groupby("_b").map_groups(locf_bucket, batch_format="pandas")
           .to_pandas())
    return out.sort_values("user_id").reset_index(drop=True)


SQL_VALUE_LOCF = """
WITH b AS (
  SELECT user_id, ts, event_id,
         event_type = 'view' AS masked,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
), f AS (
  SELECT user_id, masked,
         last_value(CASE WHEN NOT masked THEN cents END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS filled
  FROM b
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
         AS n_masked,
       CAST(SUM(CASE WHEN masked AND filled IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
       CAST(COALESCE(SUM(CASE WHEN masked THEN filled END), 0) AS BIGINT)
         AS sum_imputed_cents
FROM f GROUP BY user_id
HAVING SUM(CASE WHEN masked THEN 1 ELSE 0 END) > 0
"""


def q_welch_ttest(sf_dir: str):
    """Welch two-sample t-test (purchase vs signup event values) — the
    A/B-significance statistic, computed from EXACT integer sufficient
    statistics: one streamed scan emits per-group int64 partials
    (n, sum_cents, sum_cents^2), the driver folds O(batches) tiny rows
    with Python ints, and t plus the Welch–Satterthwaite df come out of
    one closed-form float evaluation. Zero shuffle, O(1) driver state —
    the two-sample-inference shape at any corpus size.

    Exactness envelope: cents <= ~5.6e4 so cents^2 <= ~3.2e9 and even
    sf100-scale totals stay under 2^53 — every input to the final float
    expression is float64-EXACT on both sides, and the expression is
    mirrored operation-for-operation in the oracle; round-6 absorbs the
    (sub-ulp) division-order slack. A batch-mass guard raises before
    int64 could wrap."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    A, Bt = "purchase", "signup"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for grp in (A, Bt):
            v = df.loc[df["event_type"] == grp, "value"].to_numpy(np.float64)
            c = np.floor(v * 100.0 + 0.5).astype(np.int64)
            if len(c) and float(np.abs(c).max()) ** 2 * len(c) >= 2**62:
                raise AssertionError(
                    "welch_ttest: batch cents^2 mass near int64 — "
                    "switch to hi/lo split accumulation")
            rows.append((grp, len(c), int(c.sum()), int((c * c).sum())))
        return pd.DataFrame(rows, columns=["grp", "n", "sx", "sxx"])

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    stats = {}
    for grp, sub in parts.groupby("grp"):
        n = int(sub["n"].sum())
        sx = sum(int(v) for v in sub["sx"])
        sxx = sum(int(v) for v in sub["sxx"])
        if max(sx, sxx) >= 2**53:
            raise AssertionError(
                "welch_ttest: totals exceed the float64-exact envelope — "
                "switch the final expression to Fraction arithmetic")
        stats[grp] = (n, sx, sxx)
    (n1i, sx1i, sxx1i), (n2i, sx2i, sxx2i) = stats[A], stats[Bt]
    # evaluate the final expression in float64 in the SAME operation
    # order as the oracle (all inputs are float64-exact integers)
    n1, sx1, sxx1 = float(n1i), float(sx1i), float(sxx1i)
    n2, sx2, sxx2 = float(n2i), float(sx2i), float(sxx2i)
    m1, m2 = sx1 / n1, sx2 / n2
    v1 = (sxx1 - sx1 * sx1 / n1) / (n1 - 1)
    v2 = (sxx2 - sx2 * sx2 / n2) / (n2 - 1)
    a, b = v1 / n1, v2 / n2
    t = (m1 - m2) / np.sqrt(a + b)
    df_w = (a + b) ** 2 / (a * a / (n1 - 1) + b * b / (n2 - 1))
    return pd.DataFrame({
        "n_a": pd.Series([n1i], dtype="int64"),
        "n_b": pd.Series([n2i], dtype="int64"),
        "t_stat": [round(float(t), 6)],
        "df_welch": [round(float(df_w), 6)],
    })


SQL_WELCH_TTEST = """
WITH c AS (
  SELECT event_type AS grp,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'signup')
), s AS (
  SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(cents) AS DOUBLE) AS sx,
         CAST(SUM(cents * cents) AS DOUBLE) AS sxx
  FROM c GROUP BY grp
), w AS (
  SELECT
    (SELECT n FROM s WHERE grp = 'purchase') AS n1,
    (SELECT sx FROM s WHERE grp = 'purchase') AS sx1,
    (SELECT sxx FROM s WHERE grp = 'purchase') AS sxx1,
    (SELECT n FROM s WHERE grp = 'signup') AS n2,
    (SELECT sx FROM s WHERE grp = 'signup') AS sx2,
    (SELECT sxx FROM s WHERE grp = 'signup') AS sxx2
), e AS (
  SELECT n1, n2,
         ((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1 AS a,
         ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2 AS b,
         sx1 / n1 - sx2 / n2 AS md
  FROM w
)
SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
       ROUND(md / sqrt(a + b), 6) AS t_stat,
       ROUND((a + b) * (a + b)
             / (a * a / (n1 - 1) + b * b / (n2 - 1)), 6) AS df_welch
FROM e
"""


def q_customer_highvalue_counts(sf_dir: str):
    """LEFT OUTER join shape (every customer, count of >400k orders,
    zeros included): bucketed — the order side pre-aggregates per key
    per batch BEFORE the shuffle, each bucket fills missing keys with
    0. Neither side broadcast. The >400k predicate is pushed into the
    order scan (row-group stats pruning)."""
    B = _pair_buckets()
    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"],
                   filter=pc.greater(pc.field("o_totalprice"), pa.scalar(400_000.0)))

    def c_prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({"key": k, "n": np.int64(0), "side": "c", "bucket": k % B})

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        big = df.loc[df["o_totalprice"] > 400_000, "o_custkey"].astype("int64")
        c = big.value_counts()
        return pd.DataFrame({"key": c.index.to_numpy(), "n": c.to_numpy().astype(np.int64),
                             "side": "o", "bucket": c.index.to_numpy() % B})

    both = cust.map_batches(c_prep, batch_format="pandas").union(
        orders.map_batches(o_prep, batch_format="pandas")
    )

    def leftjoin(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["side"] == "c", ["key"]]
        right = g[g["side"] == "o"].groupby("key", as_index=False)["n"].sum()
        j = left.merge(right, on="key", how="left").fillna({"n": 0})
        return pd.DataFrame({"c_custkey": j["key"].astype("int64"),
                             "n_big": j["n"].astype("int64")})

    out = both.groupby("bucket").map_groups(leftjoin, batch_format="pandas").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


SQL_CUSTOMER_HIGHVALUE_COUNTS = """
SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(COUNT(o_custkey) AS BIGINT) AS n_big
FROM customer LEFT JOIN orders
  ON o_custkey = c_custkey AND o_totalprice > 400000
GROUP BY c_custkey
"""


# --------------------------------------------------------------- documents

def q_dedup_exact(sf_dir: str):
    """Exact dedup: content hash in map_batches, keep min doc_id per
    hash. Partial min per batch -> tiny final min (hash-partition +
    per-group first at scale)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def hash_and_min(df: pd.DataFrame) -> pd.DataFrame:
        df["h"] = [hashlib.md5(t.encode()).hexdigest() for t in df["text"]]
        return df.groupby("h", as_index=False).agg(doc_id=("doc_id", "min"))

    parts = ds.map_batches(hash_and_min, batch_format="pandas", batch_size=8192)
    # one row per distinct md5 = corpus cardinality: the combine must
    # shuffle in the cluster, not reduce in driver memory
    out = _bucketed_combine(parts, ["h"], {"doc_id": "min"})
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


SQL_DEDUP_EXACT = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY md5(text)
"""


def q_dup_rate_by_source(sf_dir: str):
    """Per-source duplication audit — the curation dashboard row that
    tells you WHICH feed is polluting the corpus (a crawl source with a
    40% duplicate share gets throttled, not just deduped). A doc is a
    duplicate occurrence when its exact text hash appears more than
    once CORPUS-WIDE (all occurrences count, cross-source collisions
    included on both sides).

    Shape: per-batch (hash, source, n) partials collapse repeated texts
    map-side; ONE by-hash bucketed shuffle (a hash lives in one bucket,
    so bucket-local totals are global); inside each bucket the per-hash
    total joins back to the (hash, source) rows vectorized and only
    O(sources) partial counters leave; the driver folds buckets x
    sources tiny rows. dup_share is the ratio of the SAME two integers
    on both sides (one float division, no accumulation)."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            h=[hashlib.md5(t.encode()).hexdigest() for t in df["text"]])
        out = df.groupby(["h", "source"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    def bucket_audit(g: pd.DataFrame) -> pd.DataFrame:
        # g arrives (h, source)-aggregated; a hash lives entirely in
        # this bucket, so the per-hash total here is the GLOBAL total
        tot = g.groupby("h")["n"].transform("sum")
        g = g.assign(dup=np.where(tot.to_numpy() > 1,
                                  g["n"].to_numpy(), 0))
        return g.groupby("source", as_index=False).agg(
            n_docs=("n", "sum"), n_dup_docs=("dup", "sum"))

    parts = _bucketed_combine(
        ds.map_batches(partial, batch_format="pandas", batch_size=8192),
        ["h", "source"], {"n": "sum"},
        prune=bucket_audit)
    out = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_dup_docs=("n_dup_docs", "sum"))
    for c in ("n_docs", "n_dup_docs"):
        out[c] = out[c].astype("int64")
    out["dup_share"] = out["n_dup_docs"].to_numpy(np.float64) \
        / out["n_docs"].to_numpy(np.int64)
    return out.sort_values("source").reset_index(drop=True)


SQL_DUP_RATE_BY_SOURCE = """
WITH d AS (
  SELECT source, md5(text) AS h FROM documents
), hc AS (
  SELECT h, COUNT(*) AS tot FROM d GROUP BY h
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN hc.tot > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(SUM(CASE WHEN hc.tot > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_share
FROM d JOIN hc USING (h)
GROUP BY d.source
"""


def q_mannwhitney_u(sf_dir: str):
    """Mann–Whitney U rank-sum test (purchase vs signup values) — the
    NONPARAMETRIC two-sample significance test (no normality
    assumption), the robust sibling of :func:`q_welch_ttest`. The
    textbook computation needs global ranks with tie averaging — an
    all-to-all sort — but ranks only depend on the per-distinct-value
    histogram, so it runs as: one streamed scan emitting per-batch
    (cents, n_a, n_b) partials; one tiny fold over DISTINCT CENTS
    (bounded by the value range — ~56k here, <= 1M for any
    fixed-decimal range — NOT by corpus size, the curriculum_buckets
    discipline); then an exact integer sweep in value order.

    Tie-averaged ranks are half-integers, so the sweep carries 2*R1 =
    sum_v n_a(v) * (2*cum_before(v) + n_v + 1) — EXACT int64 on both
    sides (Python big-int fold; HUGEINT window mirror) — and emits
    two_u = 2*R1 - n1*(n1+1) as a BIGINT. The normal-approximation z
    with the tie-corrected variance is the one rounded float, mirrored
    operation-for-operation."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    A, Bt = "purchase", "signup"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["event_type"].isin([A, Bt])]
        c = np.floor(sub["value"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"cents": c,
                          "is_a": (sub["event_type"] == A).to_numpy()})
        out = g.groupby(["cents", "is_a"], as_index=False).size()
        return pd.DataFrame({
            "cents": out["cents"],
            "n_a": np.where(out["is_a"], out["size"], 0).astype("int64"),
            "n_b": np.where(out["is_a"], 0, out["size"]).astype("int64"),
        })

    hist = (ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
            .groupby("cents", as_index=False).agg(
                n_a=("n_a", "sum"), n_b=("n_b", "sum"))
            .sort_values("cents").reset_index(drop=True))
    # the sweep runs in PYTHON BIG-INTS (object dtype): 2*R1 ~ n^2 and
    # tie_sum ~ n^3 blow past int64 long before the histogram itself
    # stops fitting on the driver
    na = hist["n_a"].to_numpy(np.int64).astype(object)
    nb = hist["n_b"].to_numpy(np.int64).astype(object)
    nv = na + nb
    n1, n2 = int(na.sum()), int(nb.sum())
    n = n1 + n2
    cum_before = np.concatenate([[0], np.cumsum(nv)[:-1]])
    two_r1 = int((na * (2 * cum_before + nv + 1)).sum())
    two_u = two_r1 - n1 * (n1 + 1)
    if abs(two_u) >= 2**63:
        raise AssertionError("mannwhitney_u: two_u exceeds BIGINT")
    # tie-corrected variance: var = n1*n2/12 * ((n+1) - sum(t^3-t)/(n(n-1)))
    tie_sum = int((nv ** 3 - nv).sum())
    mu2 = float(n1) * float(n2)  # 2*mean(U) numerator pieces, float-exact
    var = mu2 / 12.0 * ((n + 1) - tie_sum / (float(n) * (n - 1)))
    z = (two_u / 2.0 - mu2 / 2.0) / np.sqrt(var)
    return pd.DataFrame({
        "n_a": pd.Series([n1], dtype="int64"),
        "n_b": pd.Series([n2], dtype="int64"),
        "two_u": pd.Series([two_u], dtype="int64"),
        "z_stat": [round(float(z), 6)],
    })


SQL_MANNWHITNEY_U = """
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         event_type = 'purchase' AS is_a
  FROM events WHERE event_type IN ('purchase', 'signup')
), h AS (
  SELECT cents,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS HUGEINT) AS na,
         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS HUGEINT) AS nb
  FROM c GROUP BY cents
), sw AS (
  SELECT na, nb, na + nb AS nv,
         COALESCE(SUM(na + nb) OVER (ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM h
), agg AS (
  SELECT SUM(na) AS n1, SUM(nb) AS n2,
         SUM(na * (2 * cum_before + nv + 1)) AS two_r1,
         SUM(nv * nv * nv - nv) AS tie_sum
  FROM sw
), e AS (
  SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u,
         CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) AS mu2,
         CAST(n1 + n2 AS DOUBLE) AS n,
         CAST(tie_sum AS DOUBLE) AS ties
  FROM agg
)
SELECT n1 AS n_a, n2 AS n_b, two_u,
       ROUND((two_u / 2.0 - mu2 / 2.0)
             / sqrt(mu2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))), 6)
         AS z_stat
FROM e
"""


def q_ks_test(sf_dir: str):
    """Exact two-sample Kolmogorov–Smirnov statistic (purchase vs
    signup value distributions) — the distribution-shift detector that
    sees SHAPE differences the rank tests miss. Same distributed
    sufficient statistic as :func:`q_mannwhitney_u`: a per-distinct-
    cents histogram (bounded by the value RANGE, not the corpus), then
    D = max_v |F_a(v) - F_b(v)| computed exactly as the INTEGER
    d_num = max |cum_a(v) * n_b - cum_b(v) * n_a| with denominator
    n_a * n_b — no float enters the max, so the argmax and the
    statistic are bit-deterministic on both sides; the reported d_stat
    is the one final rounded division of the same two integers."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    A, Bt = "purchase", "signup"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df.loc[df["event_type"].isin([A, Bt])]
        c = np.floor(sub["value"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"cents": c,
                          "is_a": (sub["event_type"] == A).to_numpy()})
        out = g.groupby(["cents", "is_a"], as_index=False).size()
        return pd.DataFrame({
            "cents": out["cents"],
            "n_a": np.where(out["is_a"], out["size"], 0).astype("int64"),
            "n_b": np.where(out["is_a"], 0, out["size"]).astype("int64"),
        })

    hist = (ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
            .groupby("cents", as_index=False).agg(
                n_a=("n_a", "sum"), n_b=("n_b", "sum"))
            .sort_values("cents").reset_index(drop=True))
    # big-int sweep: cum * n products pass 2^63 at web-scale counts
    ca = np.cumsum(hist["n_a"].to_numpy(np.int64).astype(object))
    cb = np.cumsum(hist["n_b"].to_numpy(np.int64).astype(object))
    n1, n2 = int(ca[-1]), int(cb[-1])
    d_num = int(max(abs(ca * n2 - cb * n1)))
    if d_num >= 2**63:
        raise AssertionError("ks_test: d_num exceeds BIGINT")
    return pd.DataFrame({
        "n_a": pd.Series([n1], dtype="int64"),
        "n_b": pd.Series([n2], dtype="int64"),
        "d_num": pd.Series([d_num], dtype="int64"),
        "d_stat": [round(d_num / (float(n1) * float(n2)), 6)],
    })


SQL_KS_TEST = """
WITH c AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         event_type = 'purchase' AS is_a
  FROM events WHERE event_type IN ('purchase', 'signup')
), h AS (
  SELECT cents,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS HUGEINT) AS na,
         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS HUGEINT) AS nb
  FROM c GROUP BY cents
), sw AS (
  SELECT SUM(na) OVER w AS ca, SUM(nb) OVER w AS cb
  FROM h WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)
), t AS (
  SELECT (SELECT SUM(na) FROM h) AS n1, (SELECT SUM(nb) FROM h) AS n2
), m AS (
  SELECT MAX(abs(ca * (SELECT n2 FROM t) - cb * (SELECT n1 FROM t)))
           AS d_num
  FROM sw
)
SELECT CAST(t.n1 AS BIGINT) AS n_a, CAST(t.n2 AS BIGINT) AS n_b,
       CAST(m.d_num AS BIGINT) AS d_num,
       ROUND(CAST(m.d_num AS DOUBLE)
             / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)), 6) AS d_stat
FROM m, t
"""


def q_als_user_factors(sf_dir: str):
    """One ALS half-step of a rank-2 matrix factorization (implicit
    recommender over the user x event_type interaction matrix) — the
    distributed-linear-solve shape: item factors held FIXED (two
    deterministic md5-digit components per event_type, so both engines
    derive identical integers with no RNG or weight file), each user's
    least-squares system (lambda*I + sum q_t q_t^T) x = sum q_t r_ut is
    solved in closed form. Ratings r_ut are exact summed cents.

    The 2x2 solve is EXACT RATIONAL arithmetic — x = adj(A) b / det(A)
    with every entry an integer (lambda = 1 keeps A positive-definite,
    det >= 1 by Cauchy–Schwarz) — emitted as truncating micro-unit
    division: Fraction trunc-toward-zero here, HUGEINT ``//`` in the
    oracle, bit-identical. No float enters at any point.

    Shape: ONE user-bucketed shuffle (per batch: (user,item,cents)
    partial sums; a user lives in one bucket, so bucket-local normal
    equations are global); the 5-row item-factor table is computed
    inline per task (O(items), cheaper than a broadcast round-trip);
    per-bucket work is one vectorized grouped sum + row-wise integer
    math. Driver sees only the per-user factor rows."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    B = _pair_buckets()
    LAM = 1

    def qvec(et: str) -> tuple[int, int]:
        h = hashlib.md5(et.encode()).hexdigest()
        return int(h[0], 16) + 1, int(h[1], 16) + 1

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["value"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                          "event_type": df["event_type"], "r": c})
        out = g.groupby(["user_id", "event_type"], as_index=False)["r"].sum()
        out["_b"] = out["user_id"] % B
        return out

    def solve_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "event_type"], as_index=False)["r"].sum()
        qs = {et: qvec(et) for et in g["event_type"].unique()}
        q1 = g["event_type"].map(lambda e: qs[e][0]).to_numpy(np.int64)
        q2 = g["event_type"].map(lambda e: qs[e][1]).to_numpy(np.int64)
        r = g["r"].to_numpy(np.int64)
        agg = pd.DataFrame({
            "user_id": g["user_id"],
            "a11": q1 * q1, "a12": q1 * q2, "a22": q2 * q2,
            "b1": q1 * r, "b2": q2 * r,
        }).groupby("user_id", as_index=False).sum()
        # elementwise big-int math on object arrays (products pass 2^63
        # at web-scale rating masses); trunc-toward-zero division via
        # sign(n) * (|n| // det) with det > 0 — the HUGEINT // twin
        a11 = agg["a11"].to_numpy(np.int64).astype(object) + LAM
        a12 = agg["a12"].to_numpy(np.int64).astype(object)
        a22 = agg["a22"].to_numpy(np.int64).astype(object) + LAM
        b1 = agg["b1"].to_numpy(np.int64).astype(object)
        b2 = agg["b2"].to_numpy(np.int64).astype(object)
        det = a11 * a22 - a12 * a12
        out = {"user_id": agg["user_id"].astype("int64")}
        for col, num in (("x1_micro", (a22 * b1 - a12 * b2) * 1_000_000),
                         ("x2_micro", (a11 * b2 - a12 * b1) * 1_000_000)):
            q = abs(num) // det
            x = np.where(num < 0, -q, q)
            if len(x) and int(max(abs(v) for v in x)) >= 2**63:
                raise AssertionError(
                    "als_user_factors: factor exceeds BIGINT — rescale")
            out[col] = x.astype(np.int64)
        return pd.DataFrame(out)

    out = (ds.map_batches(partial, batch_format="pandas",
                          batch_size=65536)
           .groupby("_b").map_groups(solve_bucket, batch_format="pandas")
           .to_pandas())
    for c in ("user_id", "x1_micro", "x2_micro"):
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


SQL_ALS_USER_FACTORS = """
WITH r AS (
  SELECT user_id, event_type,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS HUGEINT) AS r
  FROM events GROUP BY user_id, event_type
), qf AS (
  SELECT event_type,
         CAST(strpos('0123456789abcdef',
                     substr(md5(event_type), 1, 1)) AS HUGEINT) AS q1,
         CAST(strpos('0123456789abcdef',
                     substr(md5(event_type), 2, 1)) AS HUGEINT) AS q2
  FROM (SELECT DISTINCT event_type FROM events)
), ne AS (
  SELECT user_id,
         1 + SUM(q1 * q1) AS a11, SUM(q1 * q2) AS a12,
         1 + SUM(q2 * q2) AS a22,
         SUM(q1 * r) AS b1, SUM(q2 * r) AS b2
  FROM r JOIN qf USING (event_type)
  GROUP BY user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(((a22 * b1 - a12 * b2) * 1000000)
            // (a11 * a22 - a12 * a12) AS BIGINT) AS x1_micro,
       CAST(((a11 * b2 - a12 * b1) * 1000000)
            // (a11 * a22 - a12 * a12) AS BIGINT) AS x2_micro
FROM ne
"""


def q_dataset_splits(sf_dir: str):
    """Deterministic corpus carving, one streamed pass, per-doc grain:
    train/val/test split assignment (hash-range on md5(text): 13/16
    train, 2/16 val, 1/16 test) AND the ~25% eval-sample flag (md5
    first hex in 0..3) — the reproducible idioms for carving a 100TB
    corpus (same hash everywhere, no RNG state, stable across cluster
    sizes/reruns, unlike random_sample). No shuffle; the per-doc
    assignment rows ARE the result."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    TRAIN = set("0123456789abc")
    VAL = set("de")
    SAMPLE = set("0123")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(t.encode()).hexdigest()[0] for t in df["text"]]
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "lang": df["lang"].to_numpy(),
            "split": ["train" if c in TRAIN else ("val" if c in VAL else "test")
                      for c in h],
            "in_sample": [c in SAMPLE for c in h],
        })

    # the per-doc assignment rows ARE the result: return the Dataset
    # (the consumer writes/streams it; nothing materializes driver-side)
    return ds.map_batches(f, batch_format="pandas")


SQL_DATASET_SPLITS = """
SELECT doc_id, lang,
       CASE WHEN substr(md5(text), 1, 1) IN ('d','e') THEN 'val'
            WHEN substr(md5(text), 1, 1) = 'f' THEN 'test'
            ELSE 'train' END AS split,
       substr(md5(text), 1, 1) IN ('0','1','2','3') AS in_sample
FROM documents
"""


def q_rare_token_postings(sf_dir: str):
    """Inverted-index posting stats for rare word BIGRAMS (document
    frequency 2..50): each batch emits per-bigram partial
    (df, min_doc, max_doc) over its DISTINCT (bigram, doc) pairs — a
    doc lives in exactly one batch, so partial dfs sum exactly; the
    bucketed combine applies the HAVING filter inside the bucket so the
    driver never sees the full phrase vocabulary."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B = _pair_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+")
        ids = df["doc_id"].astype("int64").to_numpy()
        rows_doc, rows_bg = [], []
        for d, tt in zip(ids, toks):
            seen = {f"{a} {b}" for a, b in zip(tt, tt[1:])}
            rows_doc.extend([d] * len(seen))
            rows_bg.extend(seen)
        pairs = pd.DataFrame({"doc_id": rows_doc, "bigram": rows_bg})
        g = pairs.groupby("bigram", as_index=False).agg(
            df_=("doc_id", "size"), min_doc=("doc_id", "min"), max_doc=("doc_id", "max")
        )
        h = pd.util.hash_pandas_object(g["bigram"], index=False).to_numpy()
        return g.assign(_b=(h % B).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bigram", as_index=False).agg(
            df_=("df_", "sum"), min_doc=("min_doc", "min"), max_doc=("max_doc", "max")
        )
        out = out[(out["df_"] >= 2) & (out["df_"] <= 50)]
        return out.astype({"df_": "int64", "min_doc": "int64", "max_doc": "int64"})

    out = ds.map_batches(partial, batch_format="pandas", batch_size=8192) \
            .groupby("_b").map_groups(combine, batch_format="pandas").to_pandas()
    out = out.rename(columns={"df_": "df"})[["bigram", "df", "min_doc", "max_doc"]]
    return out.sort_values("bigram").reset_index(drop=True)


SQL_RARE_TOKEN_POSTINGS = """
SELECT bigram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
)
GROUP BY bigram HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND 50
"""


def q_ingest_validation(sf_dir: str):
    """Ingest validation gate (S1-S3/T6): deterministic synthetic
    payloads (magic bytes + sizes + filenames derived from doc_id)
    stream through the tagged-rows validate stage — size cap, magic
    sniff, filename sanitizing, no per-row failures — then grouped
    counts by (detected_type, valid, reject_reason). The SQL oracle
    reproduces the modular payload rules."""
    from .sources.validate import validate_payload_batch

    ds = _read(sf_dir, "documents", ["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        payloads, names = [], []
        for d in t.column("doc_id").to_pylist():
            if d % 50 == 0:
                p = b"\x89PNG\r\n\x1a\n" + b"\0" * 8192  # over the cap
            elif d % 5 == 0:
                p = b"\x89PNG\r\n\x1a\n" + b"data"
            elif d % 5 == 1:
                p = b"\xff\xd8\xff" + b"data"
            elif d % 5 == 2:
                p = b"%PDF-1.4 data"
            elif d % 5 == 3:
                p = b"zzzz-not-a-known-magic"
            else:
                p = b""
            payloads.append(p)
            names.append("../evil.png" if d % 7 == 0 else f"doc{d}.bin")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "payload": pa.array(payloads, pa.binary()),
            "filename": pa.array(names, pa.string()),
        })

    val = ds.map_batches(gen, batch_format="pyarrow").map_batches(
        lambda t: validate_payload_batch(t, filename_col="filename", max_bytes=4096),
        batch_format="pyarrow",
    )

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(detected_type=df["detected_type"].fillna(""))
        g = df.groupby(["detected_type", "valid", "reject_reason"], as_index=False)
        return g.size().rename(columns={"size": "n"})

    parts = val.map_batches(counts, batch_format="pandas").to_pandas()
    out = parts.groupby(["detected_type", "valid", "reject_reason"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["detected_type", "valid", "reject_reason"]).reset_index(drop=True)


SQL_INGEST_VALIDATION = """
WITH d AS (
  SELECT CASE WHEN doc_id % 50 = 0 THEN ''
              WHEN doc_id % 5 = 0 THEN 'png'
              WHEN doc_id % 5 = 1 THEN 'jpeg'
              WHEN doc_id % 5 = 2 THEN 'pdf'
              ELSE '' END AS detected_type,
         CASE WHEN doc_id % 50 = 0 THEN 'too_large'
              WHEN doc_id % 5 = 4 THEN 'empty'
              WHEN doc_id % 5 = 3 THEN 'unknown_type'
              WHEN doc_id % 7 = 0 THEN 'bad_filename'
              ELSE '' END AS reject_reason
  FROM documents
)
SELECT detected_type, reject_reason = '' AS valid, reject_reason,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d GROUP BY detected_type, reject_reason
"""


def q_self_bleu(sf_dir: str):
    """Self-BLEU-2 over a deterministic 50-doc sample — the corpus
    DIVERSITY metric (high self-overlap = templated/mode-collapsed
    text; the complement of the dedup family's near-duplicate hunt):
    for every ordered pair (a, b) of sample docs, the bigram precision
    |distinct bigrams(a) AND distinct bigrams(b)| / |distinct
    bigrams(a)|, averaged. The sample (doc_id < 50) is the documented
    sample-scale kernel — the metric is an O(sample^2) statistic by
    definition, the corpus-scale work is only the filter-pushed read +
    per-doc bigram-set extraction; at 10^12 docs the sample stays 50.

    Exactness: intersections and per-doc bigram counts are exact
    integers; the average of the 2450 ratio terms is a float sum whose
    term order matches neither engine exactly, but ~1e-13 slack dies in
    round-6 (the label_centroids argument)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filter=pc.field("doc_id") < 50)

    def bigram_sets(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, txt in zip(df["doc_id"], df["text"]):
            toks = str(txt).lower().split()
            bgs = sorted({f"{a} {b}" for a, b in zip(toks, toks[1:])})
            rows.append((int(did), "\x1f".join(bgs), len(bgs)))
        return pd.DataFrame(rows, columns=["doc_id", "bgs", "n_bg"])

    docs = ds.map_batches(bigram_sets, batch_format="pandas") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    sets = [set(b.split("\x1f")) if b else set() for b in docs["bgs"]]
    n = len(sets)
    terms = []
    for i in range(n):
        if not sets[i]:
            continue
        for j in range(n):
            # j must also have bigrams: the oracle's pair table only
            # contains bigram-bearing docs on both sides
            if i != j and sets[j]:
                terms.append(len(sets[i] & sets[j]) / float(len(sets[i])))
    val = _round_away(float(np.sum(np.array(terms, dtype=np.float64)))
                      / len(terms), 6) if terms else 0.0
    return pd.DataFrame({
        "n_docs": pd.Series([n], dtype="int64"),
        "n_pairs": pd.Series([len(terms)], dtype="int64"),
        "self_bleu2": [val],
    })


SQL_SELF_BLEU = r"""
WITH s AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents WHERE doc_id < 50
), bg AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS b
  FROM (SELECT doc_id, string_split(nt, ' ') AS t
        FROM s WHERE length(nt) > 0),
       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
), nb AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT) AS x
  FROM bg a JOIN bg b ON a.b = b.b AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pairs AS (
  SELECT na.doc_id AS da, nbd.doc_id AS db,
         CAST(COALESCE(i.x, 0) AS DOUBLE) / na.n AS p
  FROM nb na JOIN nb nbd ON na.doc_id <> nbd.doc_id
  LEFT JOIN inter i ON i.da = na.doc_id AND i.db = nbd.doc_id
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       COALESCE(ROUND(SUM(p) / COUNT(*), 6), 0.0) AS self_bleu2
FROM pairs
"""


def q_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve — the tokenizer-size decision chart:
    what fraction of ALL token occurrences does the top-k vocabulary
    cover, at k = 1, 2, 4, ... 4096? (Zipf makes this curve steep; the
    knee picks the vocab size.) Counts fold through the bucketed
    combine with a per-bucket top-4096 prune (the global top-4096 is a
    subset of the union of bucket top-4096s) PLUS a per-bucket total
    sentinel so the denominator is the exact FULL occurrence mass, not
    the pruned head's. Ranks use the deterministic (cf DESC, token)
    order, ties included; shares are the same two-integer division
    both sides, round-6."""
    ds = _read(sf_dir, "documents", ["text"])
    KS = [2 ** i for i in range(13)]  # 1 .. 4096

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+") \
            .explode().dropna()
        c = toks.value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(),
                             "cf": c.to_numpy().astype(np.int64)})

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        total = int(g["cf"].sum())
        top = g.sort_values(["cf", "token"],
                            ascending=[False, True]).head(4096).copy()
        top["total"] = np.int64(0)
        sentinel = pd.DataFrame({"token": [""], "cf": [np.int64(0)],
                                 "total": [np.int64(total)]})
        return pd.concat([top, sentinel], ignore_index=True)

    rows = _bucketed_combine(
        ds.map_batches(counts, batch_format="pandas", batch_size=8192),
        ["token"], {"cf": "sum"}, prune=prune)
    total = int(rows["total"].sum())
    head = rows.loc[rows["token"] != ""] \
        .sort_values(["cf", "token"], ascending=[False, True]) \
        .head(4096).reset_index(drop=True)
    cum = np.cumsum(head["cf"].to_numpy(np.int64))
    out = []
    for k in KS:
        covered = int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
        out.append((k, covered,
                    _round_away(covered / float(total), 6)))
    res = pd.DataFrame(out, columns=["k", "covered_tokens", "share"])
    for c in ("k", "covered_tokens"):
        res[c] = res[c].astype("int64")
    return res


SQL_VOCAB_COVERAGE = """
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
), c AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cf FROM t GROUP BY token
), r AS (
  SELECT cf, row_number() OVER (ORDER BY cf DESC, token) AS rk,
         SUM(cf) OVER (ORDER BY cf DESC, token
                       ROWS UNBOUNDED PRECEDING) AS cum
  FROM c
), tot AS (SELECT SUM(cf) AS total FROM c),
ks AS (SELECT unnest([1,2,4,8,16,32,64,128,256,512,1024,2048,4096]) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(COALESCE(MAX(r.cum), 0) AS BIGINT) AS covered_tokens,
       ROUND(CAST(COALESCE(MAX(r.cum), 0) AS DOUBLE)
             / (SELECT CAST(total AS DOUBLE) FROM tot), 6) AS share
FROM ks LEFT JOIN r ON r.rk <= ks.k
GROUP BY ks.k
"""


_MIX_SLOTS = 64


def q_mixing_schedule(sf_dir: str):
    """Deterministic data-mixing schedule — the ORDER a trainer reads
    sources in so that every prefix of the stream matches the target
    mixture (stride scheduling / smooth weighted round-robin, the
    standard alternative to RNG interleaving: reproducible across
    cluster sizes and resumable from any slot). Source s with weight
    n_s (its doc count) emits ticks (2k+1)/(2 n_s); the first
    ``_MIX_SLOTS`` events by (tick, source) are the schedule.

    Shape: weights are one map-side fold; the schedule itself is
    O(sources x slots) driver work — the whole point is that the
    SCHEDULE is tiny while the data it orders is not. Ticks are the
    same two-integer division on both sides and ties break on the
    source name, so the slot sequence is bit-deterministic."""
    ds = _read(sf_dir, "documents", ["source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("source", as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return out

    w = (ds.map_batches(partial, batch_format="pandas",
                        batch_size=65536).to_pandas()
         .groupby("source", as_index=False)["n"].sum())
    ticks = []
    for _, r in w.iterrows():
        n = int(r["n"])
        for k in range(_MIX_SLOTS):
            ticks.append(((2 * k + 1) / (2.0 * n), str(r["source"])))
    ticks.sort()
    picked = [s for _, s in ticks[:_MIX_SLOTS]]
    out = pd.DataFrame({
        "slot": np.arange(1, len(picked) + 1, dtype=np.int64),
        "source": pd.Series(picked, dtype="object"),
    })
    return out


SQL_MIXING_SCHEDULE = """
WITH w AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY source
), t AS (
  SELECT source, (2 * k + 1) / (2.0 * n) AS tick
  FROM w, LATERAL (SELECT unnest(generate_series(0, {S} - 1)) AS k)
), r AS (
  SELECT source,
         row_number() OVER (ORDER BY tick, source) AS slot
  FROM t
)
SELECT CAST(slot AS BIGINT) AS slot, source
FROM r WHERE slot <= {S}
""".replace("{S}", str(_MIX_SLOTS))


def q_noise_distribution(sf_dir: str):
    """word2vec negative-sampling noise table: the unigram distribution
    raised to 3/4 (Mikolov's smoothing — lifts rare words, damps the
    head) over the top-20 tokens, with exact integer counts and the
    smoothed probability as ROUND(pow(cf, 0.75) / total, 6). The
    denominator is the 3/4-power mass of the FULL vocabulary (not just
    the head), accumulated as one mirrored SUM over per-token doubles —
    term order differs between engines but the ~1e-15 slack dies in
    round-6 (the label_centroids argument). Counts fold through the
    standard bucketed combine; the driver holds the head plus one
    scalar mass."""
    ds = _read(sf_dir, "documents", ["text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+") \
            .explode().dropna()
        c = toks.value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(),
                             "cf": c.to_numpy().astype(np.int64)})

    # full-vocabulary combine WITHOUT a top-k prune: the smoothed mass
    # needs every token's cf^0.75; the per-bucket prune emits the
    # bucket's partial mass alongside its top rows
    def prune(g: pd.DataFrame) -> pd.DataFrame:
        mass = float(np.power(g["cf"].to_numpy(np.float64), 0.75).sum())
        top = g.sort_values(["cf", "token"],
                            ascending=[False, True]).head(20)
        out = top.copy()
        out["mass"] = 0.0
        sentinel = pd.DataFrame({"token": [""], "cf": [np.int64(0)],
                                 "mass": [mass]})
        return pd.concat([out, sentinel], ignore_index=True)

    rowsdf = _bucketed_combine(
        ds.map_batches(counts, batch_format="pandas", batch_size=8192),
        ["token"], {"cf": "sum"}, prune=prune)
    mass = float(rowsdf["mass"].sum())
    head = rowsdf.loc[rowsdf["token"] != ""] \
        .sort_values(["cf", "token"], ascending=[False, True]).head(20)
    cf = head["cf"].to_numpy(np.int64)
    return pd.DataFrame({
        "token": head["token"].to_numpy(),
        "cf": cf,
        "noise_p": np.round(np.power(cf.astype(np.float64), 0.75)
                            / mass, 6),
    }).reset_index(drop=True)


SQL_NOISE_DISTRIBUTION = """
WITH t AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
), c AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cf FROM t GROUP BY token
), m AS (
  SELECT SUM(POWER(CAST(cf AS DOUBLE), 0.75)) AS mass FROM c
)
SELECT token, cf,
       ROUND(POWER(CAST(cf AS DOUBLE), 0.75) / m.mass, 6) AS noise_p
FROM c CROSS JOIN m
ORDER BY cf DESC, token LIMIT 20
"""


def q_token_burstiness(sf_dir: str):
    """Token burstiness (Church–Gale): for the top-20 tokens by corpus
    frequency, cf / df — the mean occurrences per CONTAINING document.
    Near 1.0 the token spreads evenly (function-word-like); high values
    mark topical/bursty terms that cluster in few documents — the
    statistic separating stopword-ish noise from content terms when
    building filter lists. ONE pass emits fused per-batch partials of
    BOTH counts (cf via value_counts, df via per-doc distinct — a doc
    lives in one batch row, so both are batch-exact); one bucketed
    combine with a per-bucket top-20-by-cf prune bounds what reaches
    the driver. burstiness is the same two-integer ratio both sides,
    round-6."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+") \
            .explode().dropna()
        cf = toks.value_counts()
        dfc = (pd.DataFrame({"d": toks.index, "t": toks.to_numpy()})
               .drop_duplicates()["t"].value_counts())
        out = pd.DataFrame({"token": cf.index.to_numpy(),
                            "cf": cf.to_numpy().astype(np.int64)})
        out["df"] = out["token"].map(dfc).astype("int64")
        return out

    top = _bucketed_combine(
        ds.map_batches(partial, batch_format="pandas", batch_size=8192),
        ["token"], {"cf": "sum", "df": "sum"},
        topk=(20, ["cf", "token"], [False, True]))
    top = top.sort_values(["cf", "token"], ascending=[False, True]) \
        .head(20).reset_index(drop=True)
    for c in ("cf", "df"):
        top[c] = top[c].astype("int64")
    top["burstiness"] = np.round(
        top["cf"].to_numpy(np.float64) / top["df"].to_numpy(np.int64), 6)
    return top


SQL_TOKEN_BURSTINESS = """
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
           AS token
  FROM documents
), s AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS cf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM t GROUP BY token
)
SELECT token, cf, df,
       ROUND(CAST(cf AS DOUBLE) / df, 6) AS burstiness
FROM s ORDER BY cf DESC, token LIMIT 20
"""


def q_top_tokens(sf_dir: str):
    """Corpus-wide token frequency top-20: per-batch partial counts
    (value_counts inside map_batches) -> cluster-side bucketed combine
    with per-bucket top-20 pruning — the driver receives at most
    buckets*20 candidate rows, never the full vocabulary.

    Fused into the SAME pass: a mergeable SpaceSaving heavy-hitters
    summary (functions/sketch.py — Agarwal et al., PODS 2012), the
    100 TB path for when even the pruned exact combine is too wide
    (vocabulary ~ corpus size). Each batch tags its exact partial rows
    with the truncated-summary columns (``lo`` = count if the token made
    the batch's top-64 else 0, ``es`` = the batch's truncation bound eps
    on kept rows) plus ONE eps sentinel row (token ``""`` — impossible
    for the ``[a-z0-9]+`` tokenizer), so one bucketed combine yields,
    per token, the exact count AND the summary bounds
    ``[lower, lower + total_eps - eps_seen]`` that provably contain it.
    At true 100 TB scale the exact columns are dropped and ONLY the
    truncated summary rows (64/batch) shuffle.

    Self-gating oracle: asserts in-query (a raise = red driver row)
    that every exact top-20 count sits inside its summary bounds, that
    each top-20 token's upper bound reaches the 20th-largest lower
    bound (candidate-set membership), and that the SpaceSaving
    guarantee holds (count > total_eps => the token survived in some
    batch's summary); surfaced as the constant ``hh_bounds_ok`` column
    the SQL oracle also emits."""
    ds = _read(sf_dir, "documents", ["text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"[a-z0-9]+").explode().dropna()
        c = toks.value_counts()
        summ = SK.topk_summarize_counts(c, m=64)
        eps = int(summ["eps"].iloc[0]) if len(summ) else 0
        # summ is by construction the descending head of c, so the kept
        # mask is positional — no hash-set membership over the vocab
        kept = np.arange(len(c)) < len(summ)
        out = pd.DataFrame({
            "token": c.index.to_numpy(),
            "n": c.to_numpy().astype(np.int64),
            "lo": np.where(kept, c.to_numpy(), 0).astype(np.int64),
            "es": np.where(kept, eps, 0).astype(np.int64),
        })
        sentinel = pd.DataFrame({"token": [""], "n": [0], "lo": [0], "es": [eps]})
        return pd.concat([out, sentinel.astype(out.dtypes)], ignore_index=True)

    parts = ds.map_batches(counts, batch_format="pandas", batch_size=8192)

    def prune(out: pd.DataFrame) -> pd.DataFrame:
        # union prune: bucket-local top-20 by exact count (the result
        # rows), top-20 by summary lower bound (so the global 20th-
        # largest lower is computable exactly), and the eps sentinel
        by_n = out.sort_values(["n", "token"], ascending=[False, True]).head(20)
        by_lo = out.sort_values(["lo", "token"], ascending=[False, True]).head(20)
        keep = pd.concat([by_n, by_lo, out[out["token"] == ""]])
        return keep[~keep.index.duplicated()]

    agg = _bucketed_combine(parts, ["token"],
                            {"n": "sum", "lo": "sum", "es": "sum"}, prune=prune)
    total_eps = int(agg.loc[agg["token"] == "", "es"].sum())
    real = agg[agg["token"] != ""].copy()
    real["upper"] = real["lo"] + (total_eps - real["es"])
    kth_lower = int(real["lo"].nlargest(20).iloc[-1]) if len(real) >= 20 else 0
    top = real.sort_values(["n", "token"], ascending=[False, True]).head(20)
    bad = top[(top["n"] < top["lo"]) | (top["n"] > top["upper"])
              | (top["upper"] < kth_lower)
              | ((top["n"] > total_eps) & (top["lo"] <= 0))]
    if len(bad):
        raise AssertionError(
            f"hh_bounds_ok: {len(bad)} top-20 tokens violate SpaceSaving "
            f"bounds (total_eps={total_eps}, kth_lower={kth_lower}): "
            f"{bad['token'].tolist()[:5]}")
    top = top[["token", "n"]].reset_index(drop=True)
    top["n"] = top["n"].astype("int64")
    top["hh_bounds_ok"] = True
    return top


SQL_TOP_TOKENS = """
SELECT token, CAST(COUNT(*) AS BIGINT) AS n, TRUE AS hh_bounds_ok FROM (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents
) GROUP BY token ORDER BY n DESC, token LIMIT 20
"""


def q_dedup_keep_best(sf_dir: str):
    """Keep-best-per-group selection (the dedup family's argmax
    variant: one representative doc per source, highest n_chars,
    doc_id as tie-break): each batch keeps its LOCAL best row per
    group, the final combine picks among ≤ groups×batches candidates —
    same pruning idea as the grouped top-k."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def local_best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return df.groupby("source", as_index=False).head(1)

    parts = ds.map_batches(local_best, batch_format="pandas", batch_size=65536).to_pandas()
    parts = parts.sort_values(["n_chars", "doc_id"], ascending=[False, True])
    best = parts.groupby("source", as_index=False).head(1)
    best = best.astype({"doc_id": "int64", "n_chars": "int64"})
    return best[["source", "doc_id", "n_chars"]].sort_values("source").reset_index(drop=True)


SQL_DEDUP_KEEP_BEST = """
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


def q_text_quality(sf_dir: str):
    """Per-doc text analysis in ONE streamed pass: token count (the
    BPE-ish regex tokenizer) + quality-score components (length /
    whitespace words / punctuation) — the text-quality column set a
    training-data pipeline attaches before filtering. One map_batches,
    no shuffle; the per-doc rows ARE the result."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        q = TS.quality_columns(df["text"])
        q.insert(0, "n_tokens", TS.token_count(df["text"]))
        q.insert(0, "doc_id", df["doc_id"].astype("int64"))
        return q

    return ds.map_batches(f, batch_format="pandas")


SQL_TEXT_QUALITY = """
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_q,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
       CAST(length(text) - length(replace(text, '.', '')) AS BIGINT) AS n_periods
FROM documents
"""


def q_char_entropy(sf_dir: str):
    """Per-doc character Shannon entropy (nats) — the garbled-text /
    binary-junk filter a curation pipeline runs right after extraction
    (mojibake, base64 blobs and key-mash have entropy profiles far from
    prose; repeated-character spam sits near zero). Computed as
    H = ln(n) - (sum_c n_c ln n_c)/n from EXACT per-doc character
    counts: one map-side pass — the batch's texts are flattened into a
    single char array (C-level), doc ids ride along via np.repeat, and
    one grouped value_counts yields every doc's histogram; no shuffle,
    per-doc rows stream out. The ln-sum's term order differs between
    pandas and SQL but each doc has <= alphabet-size terms, so the
    round-6 output absorbs the ulp slack; the low_entropy flag compares
    the ROUNDED value so both sides branch identically."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("").tolist()
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        keep = lens > 0
        ids = df["doc_id"].astype("int64").to_numpy()
        chars = np.array(list("".join(texts)), dtype=object)
        did = np.repeat(ids, lens)
        cc = pd.DataFrame({"doc_id": did, "c": chars}) \
            .groupby(["doc_id", "c"], as_index=False).size()
        nc = cc["size"].to_numpy(np.float64)
        cc["term"] = nc * np.log(nc)
        agg = cc.groupby("doc_id", as_index=False).agg(
            n_chars=("size", "sum"), s=("term", "sum"))
        n = agg["n_chars"].to_numpy(np.float64)
        h = np.round(np.log(n) - agg["s"].to_numpy(np.float64) / n, 6)
        out = pd.DataFrame({
            "doc_id": agg["doc_id"].astype("int64"),
            "n_chars": agg["n_chars"].astype("int64"),
            "h_char": h,
            "low_entropy": h < 2.0,
        })
        # empty docs: defined as H = 0 and low (no char rows exist)
        empty = ids[~keep]
        if len(empty):
            out = pd.concat([out, pd.DataFrame({
                "doc_id": empty, "n_chars": np.int64(0),
                "h_char": 0.0, "low_entropy": True})], ignore_index=True)
        return out

    return ds.map_batches(f, batch_format="pandas", batch_size=8192)


SQL_CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM documents WHERE length(text) > 0
), hist AS (
  SELECT doc_id, c, CAST(COUNT(*) AS DOUBLE) AS nc
  FROM ch GROUP BY doc_id, c
), ent AS (
  SELECT doc_id, CAST(SUM(nc) AS BIGINT) AS n_chars,
         ROUND(ln(SUM(nc)) - SUM(nc * ln(nc)) / SUM(nc), 6) AS h_char
  FROM hist GROUP BY doc_id
)
SELECT doc_id, n_chars, h_char, h_char < 2.0 AS low_entropy FROM ent
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT), 0.0, TRUE
FROM documents WHERE length(text) = 0
"""


def q_fingerprints(sf_dir: str):
    """Per-doc profile: winnowing fingerprints (rolling-hash sketch)
    + language-ID heuristic (stopword profiles) in one streamed pass.
    HARD SQL row (upgraded from rows-only, the self-gating pattern):
    ``lang_pred`` and ``n_grams`` are recomputed independently by the
    oracle (the lang-ID heuristic is pure set arithmetic over
    whitespace tokens — fully SQL-expressible); the winnowing sketch
    itself is hash-valued, so its STRUCTURAL invariants are asserted
    in-query against the SQL-derivable gram count G = len(norm) - 4:

      G == 0  -> no fingerprints;  0 < G <= window -> exactly 1;
      G > window -> 1 <= n_fp <= G - window + 1  (one min per sliding
      window, consecutive windows share minima, uniqueing only shrinks)

    plus min <= max, surfaced as the ``fp_bounds_ok`` constant. Exact
    fingerprint VALUES stay pinned in tests/test_hashing.py."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            fp = H.winnow_fingerprints(text)
            t = " ".join(text.lower().split())
            g = len(t) - 4 if len(t) >= 5 else 0
            if g == 0:
                ok = fp.size == 0
            elif g <= 8:
                ok = fp.size == 1
            else:
                ok = 1 <= fp.size <= g - 7
            ok = ok and (fp.size == 0 or int(fp.min()) <= int(fp.max()))
            if not ok:
                raise AssertionError(
                    f"winnowing bounds violated for doc {doc_id}: "
                    f"n_fp={fp.size}, n_grams={g}"
                )
            rows.append((int(doc_id), g))
        out = pd.DataFrame(rows, columns=["doc_id", "n_grams"])
        out["lang_pred"] = TS.lang_id_batch(df["text"]).to_numpy()
        out["fp_bounds_ok"] = True
        return out

    return ds.map_batches(f, batch_format="pandas")


# exact SQL mirror of q_fingerprints: gram count of the normalized
# text, the full lang-ID heuristic (CJK ratio -> stopword-profile
# argmax with the Python tie order en > es > de > fr -> 'und'), and
# the gate constant
SQL_FINGERPRINTS = r"""
WITH feats AS (
  SELECT doc_id,
         length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS L,
         len(regexp_extract_all(text, '[一-鿿㐀-䶿]')) AS cjk,
         length(text) AS rawlen,
         list_distinct(string_split_regex(lower(text), '\s+')) AS ws
  FROM documents
),
scored AS (
  SELECT doc_id, L, cjk, rawlen,
         len(list_intersect(ws, ['the','a','of','and','to','in','is'])) AS e,
         len(list_intersect(ws, ['el','la','de','que','y','en','un'])) AS s,
         len(list_intersect(ws, ['der','die','und','das','ist','ein','zu'])) AS d,
         len(list_intersect(ws, ['le','la','de','et','un','est','les'])) AS f
  FROM feats
)
SELECT doc_id,
       CAST(CASE WHEN L >= 5 THEN L - 4 ELSE 0 END AS BIGINT) AS n_grams,
       CASE
         WHEN rawlen > 0
              AND CAST(cjk AS DOUBLE) / GREATEST(rawlen, 1) > 0.2 THEN 'zh'
         WHEN GREATEST(e, s, d, f) = 0 THEN 'und'
         WHEN e >= s AND e >= d AND e >= f THEN 'en'
         WHEN s >= d AND s >= f THEN 'es'
         WHEN d >= f THEN 'de'
         ELSE 'fr'
       END AS lang_pred,
       TRUE AS fp_bounds_ok
FROM scored
"""


def q_repetition_filter(sf_dir: str):
    """Gopher-style repetition quality filter (Rae et al. 2021, table
    A1 — public paper): per-doc duplicate-token and duplicate-bigram
    statistics plus an integer-arithmetic ``keep`` rule:

      keep = n_tokens >= 5
             AND top_token_n * 8  <= n_tokens     (<= 12.5% one token)
             AND (n_bigrams = 0 OR
                  top_bigram_n * 16 <= n_bigrams) (<= 6.25% one bigram)

    All outputs are exact integers / booleans so the DuckDB mirror is a
    hard value oracle. One streamed map_batches, no shuffle; the kernel
    is pandas explode + groupby-shift (no per-row Python loop). At
    100 TB this is a pure map stage — the filter column rides along and
    a downstream ``filter`` prunes before any expensive op."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ids = df["doc_id"].astype("int64")
        toks = df["text"].str.lower().str.split()
        n_tok = toks.str.len().fillna(0).astype("int64")
        e = toks.explode().dropna()  # index = batch row, repeated
        tc = e.groupby([e.index, e]).size()
        top_tok = tc.groupby(level=0).max()
        n_dist = tc.groupby(level=0).size()
        nxt = e.groupby(level=0).shift(-1)
        bg = (e + " " + nxt).dropna()
        bc = bg.groupby([bg.index, bg]).size()
        top_bg = bc.groupby(level=0).max()
        n_bg = bg.groupby(level=0).size()
        idx = df.index
        out = pd.DataFrame({
            "doc_id": ids,
            "n_tokens": n_tok,
            "n_distinct_tokens":
                n_dist.reindex(idx).fillna(0).astype("int64"),
            "top_token_n": top_tok.reindex(idx).fillna(0).astype("int64"),
            "n_bigrams": n_bg.reindex(idx).fillna(0).astype("int64"),
            "top_bigram_n": top_bg.reindex(idx).fillna(0).astype("int64"),
        })
        out["keep"] = (
            (out["n_tokens"] >= 5)
            & (out["top_token_n"] * 8 <= out["n_tokens"])
            & ((out["n_bigrams"] == 0)
               | (out["top_bigram_n"] * 16 <= out["n_bigrams"]))
        )
        return out

    return ds.map_batches(f, batch_format="pandas")


# exact SQL mirror: same whitespace tokenization (the '\s+' literal is
# widened to the Python-str.split() class by the _PYWS block below),
# bigrams via list comprehension over the token array, same integer
# keep rule
SQL_REPETITION_FILTER = r"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
t AS (
  SELECT doc_id,
         CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS toks
  FROM norm
),
tokc AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
  GROUP BY doc_id, tok
),
toka AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct_tokens,
         max(c) AS top_token_n
  FROM tokc GROUP BY doc_id
),
bigc AS (
  SELECT doc_id, bg, count(*) AS c
  FROM (SELECT doc_id,
               unnest([toks[i] || ' ' || toks[i + 1]
                       for i in generate_series(1, len(toks) - 1)]) AS bg
        FROM t WHERE len(toks) >= 2)
  GROUP BY doc_id, bg
),
biga AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_n
  FROM bigc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_distinct_tokens, 0) AS BIGINT) AS n_distinct_tokens,
       CAST(COALESCE(a.top_token_n, 0) AS BIGINT) AS top_token_n,
       CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(b.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       (COALESCE(a.n_tokens, 0) >= 5
        AND COALESCE(a.top_token_n, 0) * 8 <= COALESCE(a.n_tokens, 0)
        AND (COALESCE(b.n_bigrams, 0) = 0
             OR COALESCE(b.top_bigram_n, 0) * 16
                <= COALESCE(b.n_bigrams, 0))) AS keep
FROM documents d
LEFT JOIN toka a USING (doc_id)
LEFT JOIN biga b USING (doc_id)
"""


_EVAL_MOD = 97  # deterministic "benchmark" membership: doc_id % 97 == 0


def _trigram_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Distinct lowercased whitespace-token 3-grams per document as
    (doc_id, gram) rows. Pandas explode + per-doc shift — no per-row
    Python loop. ``df`` must carry a fresh RangeIndex (callers reset).
    Real decontamination uses 13-grams (GPT-3 appendix C, public); 3
    here because the synthetic docs are only ~50 tokens."""
    toks = df["text"].str.lower().str.split()
    e = toks.explode().dropna()
    g = e.groupby(level=0)
    tri = (e + " " + g.shift(-1) + " " + g.shift(-2)).dropna()
    if tri.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "gram": pd.Series([], dtype="object")})
    ids = df["doc_id"].astype("int64")
    out = pd.DataFrame({"doc_id": ids.reindex(tri.index).to_numpy(),
                        "gram": tri.to_numpy()})
    return out.drop_duplicates()


def q_decontamination(sf_dir: str, _broadcast_max: int | None = None):
    """Benchmark decontamination: flag every training document sharing
    a token 3-gram with the eval set (docs with doc_id % 97 == 0 stand
    in for the benchmark suite). The eval side is SMALL BY NATURE —
    benchmark suites are MBs against a 100 TB corpus — so the scale
    path is: distinct eval grams collected once, ``ray.put`` once, and
    the whole corpus streams through one stateless map_batches doing a
    vectorized set probe (the same shape the public GPT-3/Llama decon
    procedures describe). The broadcast is still GUARDED like every
    other small side in this catalog (limit(budget+1) probe); past the
    budget it falls back to two bounded shuffles: distinct (doc, gram)
    rows and eval grams hash-bucketed by gram, per-bucket hit counts,
    then a per-doc combine bucketed by doc_id. Nothing driver-side
    scales with the corpus on either path."""
    budget = _BROADCAST_MAX_KEYS if _broadcast_max is None else _broadcast_max
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cols = ["doc_id", "is_eval", "n_grams", "n_hits", "contaminated"]

    def eval_grams(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % _EVAL_MOD == 0].reset_index(drop=True)
        return _trigram_frame(df)[["gram"]].drop_duplicates()

    evg = ds.map_batches(eval_grams, batch_format="pandas", batch_size=65536)
    probe = evg.limit(budget + 1).to_pandas()
    if len(probe) <= budget:
        ev_ref = ray.put(frozenset(probe["gram"]))

        def score(df: pd.DataFrame) -> pd.DataFrame:
            df = df.reset_index(drop=True)
            ev = ray.get(ev_ref)
            gf = _trigram_frame(df)
            per = pd.DataFrame({
                "doc_id": gf["doc_id"],
                "hit": gf["gram"].isin(ev),
            }).groupby("doc_id").agg(n_grams=("hit", "size"),
                                     n_hits=("hit", "sum"))
            out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
            out = out.merge(per, left_on="doc_id", right_index=True,
                            how="left").fillna(0)
            out["n_grams"] = out["n_grams"].astype("int64")
            out["n_hits"] = out["n_hits"].astype("int64")
            out["is_eval"] = out["doc_id"] % _EVAL_MOD == 0
            out["contaminated"] = (~out["is_eval"]) & (out["n_hits"] > 0)
            return out[cols]

        return ds.map_batches(score, batch_format="pandas", batch_size=65536)

    # fallback: the "eval set" stopped being small — bucketed hash join
    B = _pair_buckets()

    def _bucketed(gf: pd.DataFrame, side: str, doc: bool) -> pd.DataFrame:
        h = pd.util.hash_array(gf["gram"].to_numpy(dtype=object)) % B
        return pd.DataFrame({
            "bucket": h.astype("int64"),
            "gram": gf["gram"].astype(object),
            "doc_id": (gf["doc_id"].astype("int64") if doc
                       else np.full(len(gf), -1, dtype=np.int64)),
            "side": side,
        })

    def c_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _bucketed(_trigram_frame(df.reset_index(drop=True)), "c", True)

    def e_rows(df: pd.DataFrame) -> pd.DataFrame:
        return _bucketed(eval_grams(df), "e", False)

    def hits(g: pd.DataFrame) -> pd.DataFrame:
        ev = set(g.loc[g["side"] == "e", "gram"])
        c = g[g["side"] == "c"]
        out = pd.DataFrame({
            "doc_id": c["doc_id"].astype("int64"),
            "hit": c["gram"].isin(ev),
        }).groupby("doc_id", as_index=False).agg(n_grams=("hit", "size"),
                                                 n_hits=("hit", "sum"))
        out["n_grams"] = out["n_grams"].astype("int64")
        out["n_hits"] = out["n_hits"].astype("int64")
        out["b2"] = out["doc_id"] % B
        return out

    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        z = np.zeros(len(df), dtype=np.int64)
        return pd.DataFrame({"doc_id": ids, "n_grams": z, "n_hits": z,
                             "b2": ids % B})

    parts = ds.map_batches(c_rows, batch_format="pandas", batch_size=65536) \
        .union(ds.map_batches(e_rows, batch_format="pandas", batch_size=65536)) \
        .groupby("bucket").map_groups(hits, batch_format="pandas")
    base = _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(zeros, batch_format="pandas", batch_size=65536)

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_grams=("n_grams", "sum"), n_hits=("n_hits", "sum"))
        out["n_grams"] = out["n_grams"].astype("int64")
        out["n_hits"] = out["n_hits"].astype("int64")
        out["is_eval"] = out["doc_id"] % _EVAL_MOD == 0
        out["contaminated"] = (~out["is_eval"]) & (out["n_hits"] > 0)
        return out[cols]

    return parts.union(base).groupby("b2").map_groups(
        comb, batch_format="pandas")


# exact SQL mirror: same lowercase + Python-whitespace tokenization
# (the '\s+' literal is widened by the _PYWS block below), 3-grams via
# inclusive list slicing, DISTINCT per doc on both sides, hit = string
# equality against the distinct eval-gram set
SQL_DECONTAMINATION = r"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
t AS (
  SELECT doc_id,
         CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS toks
  FROM norm
),
g AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest([array_to_string(toks[i:i+2], ' ')
                   for i in generate_series(1, len(toks) - 2)]) AS gram
    FROM t WHERE len(toks) >= 3)
),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
h AS (
  SELECT g.doc_id, count(*) AS n_grams, count(ev.gram) AS n_hits
  FROM g LEFT JOIN ev USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       d.doc_id % 97 = 0 AS is_eval,
       CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       (d.doc_id % 97 <> 0 AND COALESCE(h.n_hits, 0) > 0) AS contaminated
FROM documents d LEFT JOIN h USING (doc_id)
"""


_SHARD_TOKENS = 2000  # target tokens per output shard


def _parquet_col_max(path: str, col: str) -> int:
    """Max of an integer column from parquet row-group statistics —
    metadata only, no data pages read."""
    md = pq.ParquetFile(path).metadata
    j = next(i for i in range(md.num_columns)
             if md.row_group(0).column(i).path_in_schema == col)
    return max(md.row_group(rg).column(j).statistics.max
               for rg in range(md.num_row_groups))


def q_shard_packing(sf_dir: str):
    """Token-balanced output sharding: assign every document to a
    training shard so shards hold ~_SHARD_TOKENS tokens each, in
    doc_id order — i.e. ``shard = floor(prefix_sum_before(n_tokens) /
    target)``, a GLOBAL ordered prefix sum, the op a shard writer needs
    so no output file is 100x another (the resume granularity promise).
    Distributed two-pass shape: docs map to contiguous doc_id ranges
    (cluster-proportional bucket count); pass 1 computes per-range
    token subtotals (one tiny row per range), the driver folds the
    O(ranges) exclusive offsets — at 10^12 docs the fold itself would
    be two-level, same arithmetic — and pass 2 shuffles ONCE by range,
    sorting + cumsum only inside each range with its offset added. The
    narrow (doc_id, n_tokens, range) projection is materialized so the
    text is tokenized exactly once. All-integer outputs -> hard oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    W = _pair_buckets()
    max_id = _parquet_col_max(os.path.join(sf_dir, "documents.parquet"),
                              "doc_id")
    R = max(1, -(-(int(max_id) + 1) // (4 * W)))  # ceil div

    def tok_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        ids = df["doc_id"].astype("int64")
        n = df["text"].str.split().str.len().fillna(0).astype("int64")
        return pd.DataFrame({"doc_id": ids, "n_tokens": n,
                             "bucket": ids // R})

    tok = ds.map_batches(tok_rows, batch_format="pandas",
                         batch_size=65536).materialize()
    sums = _partial_group_sum(tok, ["bucket"], {"tot": "n_tokens"})
    sums = sums.sort_values("bucket").reset_index(drop=True)
    cum = np.cumsum(sums["tot"].to_numpy(dtype=np.int64))
    offs = dict(zip(sums["bucket"].astype(int),
                    np.concatenate(([0], cum[:-1])).astype(np.int64)))
    offs_ref = ray.put(offs)

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        off = ray.get(offs_ref)[int(g["bucket"].iloc[0])]
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        before = off + np.cumsum(n) - n
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                             "n_tokens": g["n_tokens"].astype("int64"),
                             "shard": (before // _SHARD_TOKENS)})

    return tok.groupby("bucket").map_groups(pack, batch_format="pandas")


# exact SQL mirror: same whitespace token count (the '\s+' literal is
# widened by the _PYWS block below), SQL window prefix sum, same
# integer floor division
SQL_SHARD_PACKING = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS nt
  FROM documents
),
t AS (
  SELECT doc_id,
         CASE WHEN length(nt) = 0 THEN 0
              ELSE len(string_split(nt, ' ')) END AS n_tokens
  FROM norm
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 2000 AS BIGINT) AS shard
FROM t
"""


def q_lang_temperature_sample(sf_dir: str):
    """Temperature-style resampling toward language balance: per-lang
    integer rates ``rate = ceil(count_lang / min_count)`` computed from
    one tiny partial-count aggregate (key space = languages), broadcast
    once, then the corpus streams through a stateless hash-Bernoulli
    filter (same Knuth multiplicative hash as orders_stratified_sample,
    identical in numpy and ANSI SQL) keeping ~1-in-rate of each
    language — head languages downsampled toward the smallest, the
    standard multilingual rebalance (Conneau & Lample's temperature
    sampling, public). No RNG state, reproducible across cluster sizes
    / resumes; nothing driver-side scales with the corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", as_index=False).size()
        return g.rename(columns={"size": "n"})

    counts = ds.map_batches(cnt, batch_format="pandas", batch_size=65536) \
        .to_pandas().groupby("lang", as_index=False)["n"].sum()
    mn = int(counts["n"].min())
    rates = {l: (int(n) + mn - 1) // mn
             for l, n in zip(counts["lang"], counts["n"])}
    rates_ref = ray.put(rates)
    M = np.uint64(2654435761)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(rates_ref)
        k = df["doc_id"].to_numpy(dtype=np.uint64)
        h = ((k % np.uint64(2**31)) * M) % np.uint64(2**32)
        rate = df["lang"].map(r).to_numpy(dtype=np.uint64)
        keep = h % rate == 0
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64"),
                            "lang": df["lang"],
                            "rate": rate.astype(np.int64)})
        return out[keep]

    return ds.map_batches(pick, batch_format="pandas", batch_size=65536)


# exact SQL mirror: integer ceil-division rates from the same grouped
# counts, same 32-bit multiplicative hash (products stay inside BIGINT
# because the key is pre-reduced mod 2^31)
SQL_LANG_TEMPERATURE_SAMPLE = """
WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
m AS (SELECT MIN(n) AS mn FROM c),
r AS (SELECT lang, CAST((n + mn - 1) // mn AS BIGINT) AS rate FROM c, m)
SELECT d.doc_id, d.lang, r.rate
FROM documents d JOIN r USING (lang)
WHERE (((d.doc_id % 2147483648) * 2654435761) % 4294967296) % r.rate = 0
"""


def _token_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Lowercased whitespace-token OCCURRENCE rows per document as
    (doc_id, token) — one row per token instance, unlike
    :func:`_trigram_frame` which dedups. Pandas explode, no per-row
    Python loop. ``df`` must carry a fresh RangeIndex (callers reset)."""
    e = df["text"].str.lower().str.split().explode().dropna()
    if e.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "token": pd.Series([], dtype="object")})
    ids = df["doc_id"].astype("int64")
    return pd.DataFrame({"doc_id": ids.reindex(e.index).to_numpy(),
                         "token": e.to_numpy()})


def q_corpus_familiarity(sf_dir: str, _broadcast_max: int | None = None):
    """Unigram-LM familiarity scoring, the integer-exact core of a
    KenLM-style quality filter (CCNet, public): per document the sum
    over its token occurrences of that token's GLOBAL corpus count —
    high = boilerplate-like, low = rare-vocabulary text — plus token /
    distinct-token counts. Two-pass shape: pass 1 builds the unigram
    table as per-batch partial counts folded through one bounded
    by-token-hash combine (so the limit(budget+1) probe sees DISTINCT
    vocabulary rows, not batches x partials); when the vocabulary fits
    the broadcast budget it is ``ray.put`` once and the corpus streams
    through one stateless vectorized map scan. Past the budget — web-scale
    vocabularies ARE corpus-sized — it falls back to two bounded
    shuffles: token-occurrence rows hash-bucketed by token (counts and
    scores inside each bucket; a token lives in exactly one bucket so
    bucket-local counts ARE global), then a per-doc combine bucketed
    by doc_id. Docs with zero tokens emit no row (SQL inner join)."""
    budget = _BROADCAST_MAX_KEYS if _broadcast_max is None else _broadcast_max
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cols = ["doc_id", "n_tokens", "n_distinct", "familiarity"]

    B = _pair_buckets()

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        g = t.groupby("token", as_index=False).size()
        g = g.rename(columns={"size": "n"})
        h = pd.util.hash_array(g["token"].to_numpy(dtype=object)) % B
        g["bucket"] = h.astype("int64")
        return g

    def combine_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", as_index=False)["n"].sum()

    # probe the COMBINED unigram table (== distinct vocab rows — probing
    # the per-batch partials instead would overcount by batches× and
    # push large-but-broadcastable vocabularies into the fallback)
    counts = ds.map_batches(partial_counts, batch_format="pandas",
                            batch_size=65536) \
        .groupby("bucket").map_groups(combine_counts,
                                      batch_format="pandas")
    probe = counts.limit(budget + 1).to_pandas()
    if len(probe) <= budget:
        cnt_ref = ray.put(probe.set_index("token")["n"])

        def score(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cnt_ref)
            t = _token_frame(df.reset_index(drop=True))
            if t.empty:
                return pd.DataFrame({k: pd.Series([], dtype="int64")
                                     for k in cols})
            t["c"] = t["token"].map(c).astype("int64")
            out = t.groupby("doc_id", as_index=False).agg(
                n_tokens=("token", "size"),
                n_distinct=("token", "nunique"),
                familiarity=("c", "sum"))
            for k in cols:
                out[k] = out[k].astype("int64")
            return out[cols]

        return ds.map_batches(score, batch_format="pandas", batch_size=65536)

    # fallback: vocabulary ~ corpus — bucketed count-and-score
    def occ_rows(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        h = pd.util.hash_array(t["token"].to_numpy(dtype=object)) % B
        t["bucket"] = h.astype("int64")
        return t

    def bucket_score(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("token")["token"].transform("size")
        out = pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                            "token": g["token"],
                            "c": c.to_numpy(dtype=np.int64)})
        r = out.groupby("doc_id", as_index=False).agg(
            n_tokens=("c", "size"), n_distinct=("token", "nunique"),
            familiarity=("c", "sum"))
        for k in cols:
            r[k] = r[k].astype("int64")
        r["b2"] = r["doc_id"] % B
        return r

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_tokens=("n_tokens", "sum"), n_distinct=("n_distinct", "sum"),
            familiarity=("familiarity", "sum"))
        for k in cols:
            out[k] = out[k].astype("int64")
        return out[cols]

    return ds.map_batches(occ_rows, batch_format="pandas",
                          batch_size=65536) \
        .groupby("bucket").map_groups(bucket_score, batch_format="pandas") \
        .groupby("b2").map_groups(comb, batch_format="pandas")


# exact SQL mirror: same lowercase + Python-whitespace tokenization
# (the '\s+' literal is widened by the _PYWS block below), global
# unigram counts joined back per occurrence, all-integer aggregates
SQL_CORPUS_FAMILIARITY = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(string_split(nt, ' ')) AS w
  FROM norm WHERE length(nt) > 0
),
gc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT t.w) AS BIGINT) AS n_distinct,
       CAST(SUM(gc.c) AS BIGINT) AS familiarity
FROM tok t JOIN gc USING (w)
GROUP BY t.doc_id
"""


def q_vocab_growth(sf_dir: str, _broadcast_max: int | None = None):
    """Heaps-law vocabulary-growth profile: per document (in doc_id
    order) how many NEW tokens it introduces — global first occurrence
    lands here — and the running vocabulary size, the curve a corpus
    curator reads to decide when more data stops adding vocabulary.
    Shape: per-batch partial (token, min doc_id) rows -> ONE bounded
    shuffle bucketed by token hash (bucket-local min IS the global min)
    emitting a (first_doc, n_new) histogram partial per bucket. The
    histogram (<= vocabulary rows, NOT corpus rows) is probed with the
    catalog-standard limit(budget+1) guard: within budget the driver
    folds it and broadcasts the sorted cumulative curve so the final
    pass is a stateless searchsorted — no second shuffle. Past the
    budget (web-scale vocabularies) it switches to shard_packing's
    range-bucket two-pass prefix sum: per-doc_id-range n_new subtotals
    (one tiny row per range) fold into O(ranges) exclusive offsets on
    the driver, and ONE shuffle co-locates each range's histogram slice
    with its documents, where an intra-range cumsum + searchsorted
    finishes the curve — nothing driver-side scales with the corpus."""
    budget = _BROADCAST_MAX_KEYS if _broadcast_max is None else _broadcast_max
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B = _pair_buckets()

    def first_seen(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        g = t.groupby("token", as_index=False)["doc_id"].min()
        h = pd.util.hash_array(g["token"].to_numpy(dtype=object)) % B
        g["bucket"] = h.astype("int64")
        return g

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("token", as_index=False)["doc_id"].min()
        h = fd.groupby("doc_id", as_index=False).size()
        h = h.rename(columns={"doc_id": "first_doc", "size": "n_new"})
        h["n_new"] = h["n_new"].astype("int64")
        return h

    hist = ds.map_batches(first_seen, batch_format="pandas",
                          batch_size=65536) \
        .groupby("bucket").map_groups(bucket_hist, batch_format="pandas") \
        .materialize()
    probe = hist.limit(budget + 1).to_pandas()
    if len(probe) <= budget:
        # the probe holds the whole histogram: fold + broadcast the curve
        hp = probe.groupby("first_doc", as_index=False)["n_new"].sum() \
            .sort_values("first_doc").reset_index(drop=True)
        fd_sorted = hp["first_doc"].to_numpy(dtype=np.int64)
        nn_arr = hp["n_new"].to_numpy(dtype=np.int64)
        # two compact int64 arrays broadcast; n_new recovers by the
        # searchsorted-equality trick instead of a per-row dict lookup
        curve_ref = ray.put((fd_sorted, np.cumsum(nn_arr), nn_arr))

        def emit(df: pd.DataFrame) -> pd.DataFrame:
            fds, cum, nna = ray.get(curve_ref)
            ids = df["doc_id"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(fds, ids, side="right")
            if cum.size:
                prev = np.maximum(pos - 1, 0)
                vocab = np.where(pos > 0, cum[prev], 0)
                n_new = np.where((pos > 0) & (fds[prev] == ids),
                                 nna[prev], 0)
            else:  # token-less corpus: nothing enters the vocabulary
                vocab = np.zeros(len(ids), dtype=np.int64)
                n_new = vocab
            return pd.DataFrame({"doc_id": ids,
                                 "n_new_tokens": n_new.astype(np.int64),
                                 "vocab_size": vocab.astype(np.int64)})

        return _read(sf_dir, "documents", ["doc_id"]) \
            .map_batches(emit, batch_format="pandas", batch_size=65536)

    # fallback: histogram ~ corpus — range-bucket two-pass prefix sum
    max_id = _parquet_col_max(os.path.join(sf_dir, "documents.parquet"),
                              "doc_id")
    R = max(1, -(-(int(max_id) + 1) // (4 * B)))  # ceil div

    def hist_rows(h: pd.DataFrame) -> pd.DataFrame:
        h = h.copy()
        h["rng"] = h["first_doc"] // R
        return h

    ranged = hist.map_batches(hist_rows, batch_format="pandas",
                              batch_size=65536).materialize()
    sums = _partial_group_sum(ranged, ["rng"], {"tot": "n_new"})
    sums = sums.sort_values("rng").reset_index(drop=True)
    cum = np.cumsum(sums["tot"].to_numpy(dtype=np.int64))
    offs = dict(zip(sums["rng"].astype(int),
                    np.concatenate(([0], cum[:-1])).astype(np.int64)))
    # ranges with no new tokens are absent from `offs`; their offset is
    # the running total at the nearest preceding present range
    rng_sorted = sums["rng"].to_numpy(dtype=np.int64)
    offs_ref = ray.put((offs, rng_sorted, cum))

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        return pd.DataFrame({"first_doc": ids, "n_new": np.int64(0),
                             "rng": ids // R, "is_doc": True})

    def hist_side(h: pd.DataFrame) -> pd.DataFrame:
        h = h.copy()
        h["is_doc"] = False
        return h

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        offs_d, rngs, cums = ray.get(offs_ref)
        r = int(g["rng"].iloc[0])
        if r in offs_d:
            off = offs_d[r]
        else:
            p = np.searchsorted(rngs, r, side="left")
            off = int(cums[p - 1]) if p > 0 else 0
        h = g.loc[~g["is_doc"]].groupby("first_doc", as_index=False)[
            "n_new"].sum().sort_values("first_doc")
        fds = h["first_doc"].to_numpy(dtype=np.int64)
        nna = h["n_new"].to_numpy(dtype=np.int64)
        hc = off + np.cumsum(nna)
        d = g.loc[g["is_doc"]]
        ids = d["first_doc"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(fds, ids, side="right")
        if hc.size:
            prev = np.maximum(pos - 1, 0)
            vocab = np.where(pos > 0, hc[prev], off)
            n_new = np.where((pos > 0) & (fds[prev] == ids), nna[prev], 0)
        else:
            vocab = np.full(len(ids), off, dtype=np.int64)
            n_new = np.zeros(len(ids), dtype=np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "n_new_tokens": np.asarray(n_new, dtype=np.int64),
            "vocab_size": np.asarray(vocab, dtype=np.int64)})

    both = _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(doc_rows, batch_format="pandas", batch_size=65536) \
        .union(ranged.map_batches(hist_side, batch_format="pandas",
                                  batch_size=65536))
    return both.groupby("rng").map_groups(finish, batch_format="pandas")


# exact SQL mirror: first occurrence = MIN(doc_id) per token, running
# vocabulary = ordered window sum of the per-doc new-token histogram
SQL_VOCAB_GROWTH = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(string_split(nt, ' ')) AS w
  FROM norm WHERE length(nt) > 0
),
fd AS (SELECT w, MIN(doc_id) AS doc_id FROM tok GROUP BY w),
nn AS (SELECT doc_id, COUNT(*) AS n_new FROM fd GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(nn.n_new, 0) AS BIGINT) AS n_new_tokens,
       CAST(SUM(COALESCE(nn.n_new, 0))
              OVER (ORDER BY d.doc_id) AS BIGINT) AS vocab_size
FROM documents d LEFT JOIN nn USING (doc_id)
"""


def q_ngram_novelty(sf_dir: str):
    """Per-document n-gram novelty: of a document's distinct token
    3-grams, how many occur for the FIRST time in the corpus (global
    min doc_id lands on this doc) — the novelty/duplication-attribution
    signal data curators use to rank near-duplicate-heavy sources.
    Fully distributed, nothing driver-side: distinct (doc, gram) rows
    hash-bucketed by gram (a gram lives in exactly one bucket, so the
    bucket-local min doc_id IS the global first occurrence), per-doc
    partials re-bucketed by doc_id for the combine — two bounded
    shuffles, the decontamination-fallback shape. Docs with < 3 tokens
    emit zero rows on the gram side and are restored by the zero-row
    union (SQL LEFT JOIN)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B = _pair_buckets()
    cols = ["doc_id", "n_grams", "n_new"]

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        gf = _trigram_frame(df.reset_index(drop=True))
        h = pd.util.hash_array(gf["gram"].to_numpy(dtype=object)) % B
        gf["bucket"] = h.astype("int64")
        return gf

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("gram")["doc_id"].transform("min")
        out = pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                            "new": (fd == g["doc_id"]).to_numpy()})
        r = out.groupby("doc_id", as_index=False).agg(
            n_grams=("new", "size"), n_new=("new", "sum"))
        r["n_grams"] = r["n_grams"].astype("int64")
        r["n_new"] = r["n_new"].astype("int64")
        r["b2"] = r["doc_id"] % B
        return r

    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        z = np.zeros(len(df), dtype=np.int64)
        return pd.DataFrame({"doc_id": ids, "n_grams": z, "n_new": z,
                             "b2": ids % B})

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_grams=("n_grams", "sum"), n_new=("n_new", "sum"))
        out["n_grams"] = out["n_grams"].astype("int64")
        out["n_new"] = out["n_new"].astype("int64")
        return out[cols]

    parts = ds.map_batches(rows, batch_format="pandas", batch_size=65536) \
        .groupby("bucket").map_groups(attribute, batch_format="pandas")
    base = _read(sf_dir, "documents", ["doc_id"]) \
        .map_batches(zeros, batch_format="pandas", batch_size=65536)
    return parts.union(base).groupby("b2").map_groups(
        comb, batch_format="pandas")


# exact SQL mirror: decontamination's distinct per-doc 3-gram CTE,
# first occurrence = MIN(doc_id) per gram, novelty = grams whose min
# lands on this doc
SQL_NGRAM_NOVELTY = r"""
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
t AS (
  SELECT doc_id,
         CASE WHEN length(nt) = 0 THEN CAST([] AS VARCHAR[])
              ELSE string_split(nt, ' ') END AS toks
  FROM norm
),
g AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest([array_to_string(toks[i:i+2], ' ')
                   for i in generate_series(1, len(toks) - 2)]) AS gram
    FROM t WHERE len(toks) >= 3)
),
fd AS (SELECT gram, MIN(doc_id) AS fdoc FROM g GROUP BY gram),
h AS (
  SELECT g.doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN f.fdoc = g.doc_id THEN 1 ELSE 0 END) AS n_new
  FROM g JOIN fd f USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_new, 0) AS BIGINT) AS n_new
FROM documents d LEFT JOIN h USING (doc_id)
"""


def q_snapshot_diff(sf_dir: str):
    """Dataset-version diff (CDC between snapshots): classify every
    order key as added / deleted / changed between a 'previous' and a
    'current' snapshot and emit ONLY the changes with both versions'
    values — the primitive a 100 TB curation loop runs after every
    refresh to re-process just the delta. The two snapshots derive
    deterministically from the one fixture table (previous = keys not
    % 11, price bumped one cent on % 13 keys; current = keys not % 17)
    so the diff is reproducible and the SQL mirror exact. Shape: two
    pruned projected reads -> per-batch (key, side, cents) rows -> ONE
    bounded hash-bucketed shuffle whose reducer pivots each key's <= 2
    rows into a status — a distributed full-outer hash compare, neither
    snapshot ever materializes off-cluster. Prices compare as exact
    integer cents (the _micro_revenue exactness rule); -1 marks the
    absent side."""
    B = _pair_buckets()
    cols = ["o_orderkey", "status", "prev_cents", "cur_cents"]

    def side_rows(side: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            k = df["o_orderkey"].to_numpy(dtype=np.int64)
            cents = np.round(
                df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0
            ).astype(np.int64)
            if side == "prev":
                keep = k % 11 != 0
                cents = cents + (k % 13 == 0)
            else:
                keep = k % 17 != 0
            return pd.DataFrame({
                "o_orderkey": k[keep],
                "cents": cents[keep],
                "is_cur": np.full(int(keep.sum()), side == "cur"),
                "bucket": k[keep] % B,
            })
        return f

    def rd() -> ray.data.Dataset:
        return _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    both = rd().map_batches(side_rows("prev"), batch_format="pandas",
                            batch_size=65536) \
        .union(rd().map_batches(side_rows("cur"), batch_format="pandas",
                                batch_size=65536))

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        p = g.loc[~g["is_cur"]].set_index("o_orderkey")["cents"]
        c = g.loc[g["is_cur"]].set_index("o_orderkey")["cents"]
        m = p.to_frame("prev_cents").join(c.to_frame("cur_cents"),
                                          how="outer")
        status = np.where(
            m["prev_cents"].isna(), "added",
            np.where(m["cur_cents"].isna(), "deleted",
                     np.where(m["prev_cents"] != m["cur_cents"],
                              "changed", "unchanged")))
        m["status"] = status
        m = m[m["status"] != "unchanged"].reset_index()
        m["prev_cents"] = m["prev_cents"].fillna(-1).astype("int64")
        m["cur_cents"] = m["cur_cents"].fillna(-1).astype("int64")
        m["o_orderkey"] = m["o_orderkey"].astype("int64")
        return m[cols]

    return both.groupby("bucket").map_groups(diff, batch_format="pandas")


# exact SQL mirror: the same two derived snapshots full-outer joined on
# the key, integer-cent comparison, unchanged rows dropped
SQL_SNAPSHOT_DIFF = """
WITH prev AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT)
           + CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS cents
  FROM orders WHERE o_orderkey % 11 <> 0
),
cur AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 17 <> 0
)
SELECT o_orderkey,
       CASE WHEN p.cents IS NULL THEN 'added'
            WHEN c.cents IS NULL THEN 'deleted'
            ELSE 'changed' END AS status,
       COALESCE(p.cents, -1) AS prev_cents,
       COALESCE(c.cents, -1) AS cur_cents
FROM prev p FULL OUTER JOIN cur c USING (o_orderkey)
WHERE p.cents IS NULL OR c.cents IS NULL OR p.cents <> c.cents
"""


def q_retention_cohorts(sf_dir: str):
    """Cohort retention analysis: users grouped by first-active day
    (their cohort), counted per day-offset they come back — the
    engagement matrix behind every retention curve. Shape: per-batch
    distinct (user, day) activity rows hash-bucketed by user (a user's
    rows co-locate, so the bucket-local min day IS the cohort and the
    per-(cohort, offset) counts are disjoint across buckets), then the
    driver folds only the per-bucket partial counts — the final key
    space is calendar-bounded (days x offsets, NOT user- or
    event-scaled), so the fold is scale-safe by nature. All-integer
    counts + timestamp cohorts -> hard oracle."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    B = _pair_buckets()

    def act_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                          "day": df["ts"].dt.floor("D")}).drop_duplicates()
        d["bucket"] = d["user_id"] % B
        return d

    def cohort_counts(g: pd.DataFrame) -> pd.DataFrame:
        # batch-level dedup is per-batch only: finish it here
        g = g[["user_id", "day"]].drop_duplicates()
        first = g.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame({
            "cohort_day": first,
            "day_offset": (g["day"] - first).dt.days.astype("int64"),
        })
        r = out.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return r.rename(columns={"size": "n_users"})

    parts = ds.map_batches(act_rows, batch_format="pandas",
                           batch_size=65536) \
        .groupby("bucket").map_groups(cohort_counts, batch_format="pandas")
    out = parts.to_pandas().groupby(["cohort_day", "day_offset"],
                                    as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype("int64")
    return out


# exact SQL mirror: distinct (user, day) activity, cohort = MIN(day)
# per user, one count per (cohort, offset) cell
SQL_RETENTION_COHORTS = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day
  FROM events
),
fst AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
SELECT f.cohort_day,
       CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM act a JOIN fst f USING (user_id)
GROUP BY 1, 2
"""


def q_conversion_attribution(sf_dir: str):
    """Last-touch conversion attribution: every purchase event joined
    to the most recent STRICTLY-PRIOR click by the same user within a
    1-hour lookback — the per-user as-of join marketing attribution
    runs at event-stream scale. Shape: one pruned + row-filtered read
    of just the two event types, hash-bucketed by user (a user's whole
    timeline co-locates), then a vectorized ``pd.merge_asof`` per
    bucket — no per-row Python, no driver materialization; unmatched
    purchases carry the -1 sentinel. Gaps are exact integer
    microseconds so the row is a hard value oracle."""
    B = _pair_buckets()
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                  "event_type"],
               filter=pc.field("event_type").isin(["purchase", "click"]))
    cols = ["purchase_id", "user_id", "click_id", "gap_us"]

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        df["bucket"] = df["user_id"].astype("int64") % B
        return df

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        # sort by (ts, event_id): merge_asof takes the LAST row among
        # equal timestamps, which then matches the SQL mirror's
        # ORDER BY c.ts DESC, c.event_id DESC tie-break
        p = g.loc[g["event_type"] == "purchase",
                  ["event_id", "user_id", "ts"]] \
            .sort_values(["ts", "event_id"]) \
            .rename(columns={"event_id": "purchase_id"})
        c = g.loc[g["event_type"] == "click",
                  ["event_id", "user_id", "ts"]] \
            .sort_values(["ts", "event_id"]) \
            .rename(columns={"event_id": "click_id"})
        m = pd.merge_asof(p, c, on="ts", by="user_id",
                          direction="backward",
                          tolerance=pd.Timedelta(hours=1),
                          allow_exact_matches=False,
                          suffixes=("", "_c"))
        # merge_asof keeps the purchase ts; recover the click ts via id
        cts = c.set_index("click_id")["ts"]
        gap = (m["ts"] - m["click_id"].map(cts)).dt.total_seconds()
        out = pd.DataFrame({
            "purchase_id": m["purchase_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "click_id": m["click_id"].fillna(-1).astype("int64"),
            "gap_us": np.round(gap.fillna(-1e-6).to_numpy()
                               * 1e6).astype(np.int64),
        })
        return out[cols]

    return ds.map_batches(tag, batch_format="pandas", batch_size=65536) \
        .groupby("bucket").map_groups(attribute, batch_format="pandas")


# exact SQL mirror: strict-prior 1-hour-lookback as-of via windowed
# row_number, microsecond-exact gaps, -1 sentinels for no-touch
SQL_CONVERSION_ATTRIBUTION = """
WITH p AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'click'),
j AS (
  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         date_diff('microsecond', c.ts, p.ts) AS gap_us,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
       AND c.ts < p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
)
SELECT p.event_id AS purchase_id, p.user_id,
       CAST(COALESCE(j.click_id, -1) AS BIGINT) AS click_id,
       CAST(COALESCE(j.gap_us, -1) AS BIGINT) AS gap_us
FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
  ON p.event_id = j.purchase_id
"""


_SAMPLE_K = 5  # docs kept per source by the hash-priority sample


def q_source_hash_sample(sf_dir: str):
    """Exact-k-per-group deterministic sample: the _SAMPLE_K documents
    per source with the smallest md5(doc_id) priority — the
    reservoir-sample replacement that needs no RNG state, returns the
    SAME rows at any cluster size / batch split / resume, and never
    over- or under-shoots k (unlike Bernoulli sampling). Shape:
    per-batch local prune to k rows per source (so at most k x batches
    rows shuffle, not the corpus), then ONE shuffle keyed by source
    for the final top-k + rank. The md5-of-decimal-string priority is
    recomputed bit-identically by the SQL mirror."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        out = pd.DataFrame({
            "source": df["source"],
            "doc_id": df["doc_id"].astype("int64"),
            "h": [hashlib.md5(str(int(d)).encode()).hexdigest()
                  for d in df["doc_id"]],
        })
        return out.sort_values(["source", "h", "doc_id"]) \
            .groupby("source", as_index=False).head(_SAMPLE_K)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"]).head(_SAMPLE_K) \
            .reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["source", "doc_id", "rnk"]]

    return ds.map_batches(local_topk, batch_format="pandas",
                          batch_size=65536) \
        .groupby("source").map_groups(final_topk, batch_format="pandas")


# exact SQL mirror: same md5-of-decimal-string priority, same
# (hash, doc_id) tie-break, same k
SQL_SOURCE_HASH_SAMPLE = """
SELECT source, doc_id,
       CAST(row_number() OVER (
         PARTITION BY source
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rnk
FROM documents
QUALIFY rnk <= 5
"""


def _cand_minhash_lsh(ds: ray.data.Dataset, B: int) -> ray.data.Dataset:
    """MinHash-LSH candidate pairs (a < b): signatures -> (band_key,
    doc_id) rows -> bucketed band groupby -> within-band pairs. Banding
    keeps candidate generation O(n); per-doc Python is ONLY the gram
    hashing (string -> hash array) — signatures batch through one
    reduceat pass, band keys and the (doc, band) fan-out are single
    vectorized emissions."""

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        shingles = [H.shingle_hashes(t) for t in df["text"]]
        # sub-k texts have no shingles: banding their sentinel signature
        # would pair every tiny doc with every other (jaccard(∅,∅)=1) —
        # they simply can't near-dup by shingles
        keep = np.array([s.size > 0 for s in shingles], dtype=bool)
        if not keep.any():
            return pd.DataFrame({"band_key": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "bucket": pd.Series([], dtype="int64")})
        doc_ids = df["doc_id"].to_numpy(dtype=np.int64)[keep]
        sig_mat = H.minhash_signatures_batch([s for s in shingles if s.size])
        keys = H.band_keys_batch(sig_mat)  # (n_docs, bands)
        out = pd.DataFrame({
            "band_key": keys.ravel(),
            "doc_id": np.repeat(doc_ids, keys.shape[1]),
        })
        # bounded shuffle width: millions of band keys hash into B
        # partitions, so the groupby has B vectorized groups instead of
        # one tiny pandas group per distinct key
        out["bucket"] = out["band_key"].to_numpy() & (B - 1)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="band_key")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m[["doc_id_x", "doc_id_y"]].drop_duplicates()
        return out.rename(columns={"doc_id_x": "a", "doc_id_y": "b"}) if len(out) else \
            pd.DataFrame({"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")})

    return ds.map_batches(sigs, batch_format="pandas") \
             .groupby("bucket").map_groups(pairs, batch_format="pandas")


# per-task byte budget for _exact_shingle_pairs' doc x gram matrix:
# 256 MB float32. Never trips at the oracle sfs (sf0.1's largest band
# is 3,914 docs x ~2,041 saturated synthetic vocab = 32 MB); on a real
# corpus it bounds the quadratic kernel instead of OOMing one task.
_SHINGLE_MATMUL_BYTES = 256 * 1024 * 1024


def _exact_shingle_pairs(ds: ray.data.Dataset, t: float = 0.5) -> pd.DataFrame:
    """EXACT similarity self-join (char-5-shingle Jaccard >= t) as a
    banded dense-matmul kernel:

    - J(A,B) <= min/max of the set sizes, so J >= t forces the gram
      counts within 1/t of each other; with t >= 0.5 that means
      floor(log2(|A|)) and floor(log2(|B|)) differ by at most 1.
      Emitting every doc to its own log2-size band AND the next one
      therefore co-locates EVERY qualifying pair — exact coverage, no
      tuning (same-band pairs meet twice and dedupe at the end).
    - per band group: one boolean doc x gram matrix over the group's
      own vocabulary (np.unique + searchsorted), ONE matmul for all
      pairwise intersection counts, jaccard as the unrounded float64
      ratio of exact ints — bit-identical to an SQL oracle's i/u.
      Gram identity is the FULL 64-bit hash (shingle_hashes64): within
      a 32-bit space, birthday collisions inside ~10^3-gram docs would
      perturb counts vs the string-set oracle.

    Scale contract (documented per the custom-operator rule): the
    matmul is quadratic in the band population — this kernel is the
    VERIFICATION anchor (run at oracle/sample scale, like
    embedding_similar_pairs' broadcast matmul); MinHash-LSH banding is
    the 10^12-doc path, and q_dedup_minhash gates one with the other."""

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        grams = [H.shingle_hashes64(s) for s in df["text"]]
        doc = df["doc_id"].to_numpy(np.int64)
        sizes = np.array([g.size for g in grams], dtype=np.int64)
        keep = sizes > 0  # gramless docs can't reach J >= t > 0
        if not keep.any():
            return pd.DataFrame({"band": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64"),
                                 "grams": pd.Series([], dtype=object)})
        band = np.floor(np.log2(sizes[keep])).astype(np.int64)
        blobs = [g.tobytes() for g, s in zip(grams, sizes) if s > 0]
        return pd.DataFrame({
            "band": np.concatenate([band, band + 1]),
            "doc_id": np.concatenate([doc[keep], doc[keep]]),
            "n": np.concatenate([sizes[keep], sizes[keep]]),
            "grams": blobs + blobs,
        })

    _EMPTY = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                           "b": pd.Series([], dtype="int64"),
                           "jaccard": pd.Series([], dtype="float64")})

    def exact(g: pd.DataFrame, arrs: list, vocab: np.ndarray) -> pd.DataFrame:
        m = np.zeros((len(g), vocab.size), dtype=np.float32)
        for i, a in enumerate(arrs):
            m[i, np.searchsorted(vocab, a)] = 1.0
        # intersection counts exact in float32 (< 2^24), division in
        # float64 — the correctly rounded int ratio the oracle computes
        inter = (m @ m.T).astype(np.float64)
        sizes = g["n"].to_numpy(np.float64)
        union = sizes[:, None] + sizes[None, :] - inter
        jac = inter / union  # union >= 1: every doc here has grams
        ids = g["doc_id"].to_numpy(np.int64)
        ai, bi = np.nonzero(np.triu(jac >= t, k=1))
        if not ai.size:
            return _EMPTY
        a, b = ids[ai], ids[bi]
        swap = a > b
        return pd.DataFrame({"a": np.where(swap, b, a),
                             "b": np.where(swap, a, b),
                             "jaccard": jac[ai, bi]})

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _EMPTY
        arrs = [np.frombuffer(b, dtype=np.uint64) for b in g["grams"]]
        vocab = np.unique(np.concatenate(arrs))
        # budget BOTH live allocations — the doc x gram incidence matrix
        # (rows*vocab*4) and the doc x doc inter/union/jac results
        # (~rows^2*32 peak) coexist through the matmul, so the gate is
        # on their SUM; a band of many short docs blows the pair term
        # long before the matrix term
        mat_bytes = len(g) * vocab.size * 4
        pair_bytes = len(g) * len(g) * 32
        if mat_bytes + pair_bytes <= _SHINGLE_MATMUL_BYTES:
            return exact(g, arrs, vocab)
        # ONE-SHOT sub-split, never recursive (re-splitting can yield
        # an identical frame -> infinite recursion) — the q_dedup_ngram
        # _NGRAM_BLOCK_CAP pattern, byte-based because vocab (unbounded
        # on real corpora, saturated on the synthetic one) is a memory
        # axis here. POSITIONAL split of the doc_id-sorted band (not a
        # hash split: structured id sets can collide into one hash
        # bucket, un-bounding it) — every bucket is exactly
        # <= ceil(rows/nsub), so with nsub sized against HALF the
        # budget per term, each sub-task's mat+pair stays under the
        # cap. Pairs split across sub-blocks are missed BY DESIGN past
        # the cap (the anchor kernel's documented sample-scale
        # contract; never trips at the oracle sfs, where exactness is
        # asserted).
        half = _SHINGLE_MATMUL_BYTES // 2
        nsub = max(
            -(-mat_bytes // half),
            int(np.ceil(np.sqrt(pair_bytes / half))),
        )
        order = np.argsort(g["doc_id"].to_numpy(np.int64), kind="stable")
        out = []
        for idx in np.array_split(order, nsub):
            if idx.size < 2:
                continue
            sarrs = [arrs[i] for i in idx]
            sub = exact(g.iloc[idx], sarrs,
                        np.unique(np.concatenate(sarrs)))
            if len(sub):
                out.append(sub)
        return pd.concat(out, ignore_index=True) if out else _EMPTY

    out = ds.map_batches(band_rows, batch_format="pandas") \
            .groupby("band").map_groups(block_pairs, batch_format="pandas") \
            .to_pandas()
    if out.empty:
        # a gramless corpus (every text < 5 normalized chars) produces
        # zero band rows and a SCHEMA-LESS empty frame from map_groups —
        # drop_duplicates(["a","b"]) would KeyError on it
        return _EMPTY.copy()
    # same-band pairs meet in bands b and b+1 with identical values
    out = out.drop_duplicates(["a", "b"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# LSH recall floor asserted in-query: 16 bands x 4 rows collide with
# prob 1-(1-J^4)^16 (~0.65 at J=0.5, ~0.99 at J=0.7), so corpora whose
# near-dups sit just above the 0.5 threshold legitimately band-miss
# some pairs — the bound is the gate between "expected banding miss"
# and "broken banding". Set WELL below the ~0.645 worst-case expected
# recall: with few pairs the binomial dispersion around 0.645 is wide
# (10 pairs at J~0.5 -> P(recall < 0.6) ~ 25%), so a floor at 0.6
# would fire on correctly-working banding; 0.5 keeps ~4-sigma margin
# while still catching a broken banding path (recall ~ 0)
_MINHASH_RECALL_FLOOR = 0.5


def q_dedup_minhash(sf_dir: str):
    """Near-dup pairs (exact char-5-shingle Jaccard >= 0.5) with the
    MinHash-LSH scale path gated in-query — the
    embedding_similar_pairs pattern, upgraded from rows-only to a HARD
    SQL row:

    - the EXACT pair set comes from the banded-matmul similarity
      self-join (_exact_shingle_pairs — provably full coverage via the
      log2-size band argument) and anchors the output values; the SQL
      oracle recomputes it as all-pairs distinct-5-gram jaccard;
    - the MinHash-LSH banding path (_cand_minhash_lsh — the 10^12-doc
      route, O(n) candidates, bounded shuffles) runs on the same
      input, and the query asserts its candidate set covers at least
      _MINHASH_RECALL_FLOOR of the exact pairs, surfaced as the
      ``lsh_recall_ok`` constant the oracle also emits. At 10^12 docs
      only the LSH path runs (this gate runs on a sampled partition);
      candidates found by banding are verified against the exact
      kernel's pair set rather than re-verified by a text join."""
    B = _pair_buckets()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    exact = _exact_shingle_pairs(ds, t=0.5)
    lsh_cand = _cand_minhash_lsh(ds, B).to_pandas()

    if len(exact):
        exact_keys = set(map(tuple, exact[["a", "b"]].to_numpy()))
        lsh_keys = set(map(tuple, lsh_cand[["a", "b"]].to_numpy()))
        recall = len(exact_keys & lsh_keys) / len(exact_keys)
        if recall < _MINHASH_RECALL_FLOOR:
            raise AssertionError(
                f"MinHash-LSH candidate recall {recall:.3f} below the "
                f"{_MINHASH_RECALL_FLOOR} floor vs the exact pair set"
            )
    out = exact.copy()
    out["lsh_recall_ok"] = True
    return out.reset_index(drop=True)


# exact SQL mirror of q_dedup_minhash's anchor: all-pairs jaccard over
# distinct character 5-shingles of the whitespace-normalized lowercased
# text, unrounded int-ratio values, plus the gate constant
SQL_DEDUP_MINHASH = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN length(t) < 5 THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(range(1, length(t) - 3),
                     i -> substr(t, i, 5)))
         END AS gs
  FROM norm
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.gs, y.gs)) AS i,
         len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs)) AS u
  FROM grams x JOIN grams y ON x.doc_id < y.doc_id
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(i AS DOUBLE) / CAST(u AS DOUBLE) AS jaccard,
       TRUE AS lsh_recall_ok
FROM cand WHERE u > 0 AND CAST(i AS DOUBLE) / CAST(u AS DOUBLE) >= 0.5
"""


def q_dedup_simhash(sf_dir: str):
    """Near-dup via 64-bit SimHash, Hamming <= 6, blocked on 16-bit
    chunks (a pair within distance 6 shares at least one of 4 exact
    16-bit blocks... pigeonhole over 4 blocks holds for <=3 differing
    blocks; distance<=6 can touch at most 3 blocks only if spread —
    conservative recall blocking, standard practice). HARD SQL row:
    the token hash is md5-derived (functions/hashing.py) precisely so
    the oracle recomputes the identical signatures, block collisions
    AND hamming distances in pure SQL — the sketch, the LSH blocking
    and the distance filter are all value-checked, not just gated."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B = _pair_buckets()

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        # whole-batch vectorized signatures + block-key fan-out
        s = H.simhash64_batch(list(df["text"]))
        doc = df["doc_id"].to_numpy(dtype=np.int64)
        blk = np.arange(4, dtype=np.uint64)
        keys = (blk[None, :] << np.uint64(16)) | (
            (s[:, None] >> (np.uint64(16) * blk[None, :])) & np.uint64(0xFFFF)
        )
        out = pd.DataFrame({
            "block_key": keys.ravel().astype(np.int64),
            "doc_id": np.repeat(doc, 4),
            "sim": np.repeat(s, 4),
        })
        out["bucket"] = out["block_key"].to_numpy() & (B - 1)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="block_key")
        m = m[m["doc_id_x"] < m["doc_id_y"]].drop_duplicates(["doc_id_x", "doc_id_y"])
        if not len(m):
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")})
        # vectorized popcount of sim_x ^ sim_y via uint8 view
        x = m["sim_x"].to_numpy(dtype=np.uint64) ^ m["sim_y"].to_numpy(dtype=np.uint64)
        d = np.unpackbits(x.view(np.uint8)).reshape(len(m), 8 * 8).sum(axis=1)
        m = m.assign(hamming=d.astype(np.int64))
        m = m[m["hamming"] <= 6]
        return m.rename(columns={"doc_id_x": "a", "doc_id_y": "b"})[["a", "b", "hamming"]]

    out = ds.map_batches(sigs, batch_format="pandas") \
            .groupby("bucket").map_groups(pairs, batch_format="pandas").to_pandas()
    return out.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)


# exact SQL mirror of q_dedup_simhash: same md5-derived token hashes,
# same +-1 bit voting, same 4x16-bit block candidate join, same
# bit_count(xor) <= 6 filter — every value is recomputed independently
SQL_DEDUP_SIMHASH = r"""
WITH toks AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok),1,16)) AS UBIGINT) AS h
  FROM (SELECT doc_id, UNNEST(string_split_regex(lower(text), '\s+')) AS tok
        FROM documents)
  WHERE tok <> ''
),
bits AS (
  SELECT doc_id, b,
         SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS acc
  FROM toks CROSS JOIN (SELECT UNNEST(range(64)) AS b)
  GROUP BY doc_id, b
),
sims AS (
  SELECT d.doc_id,
         COALESCE(SUM(CASE WHEN s.acc > 0 THEN (1::UBIGINT << s.b)
                           ELSE 0::UBIGINT END), 0::UBIGINT) AS sim
  FROM documents d LEFT JOIN bits s ON d.doc_id = s.doc_id
  GROUP BY d.doc_id
),
blocks AS (
  SELECT doc_id, sim, blk, ((sim >> (16*blk)) & 65535) AS bk
  FROM sims CROSS JOIN (SELECT UNNEST(range(4)) AS blk)
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.sim AS sa, y.sim AS sb
  FROM blocks x JOIN blocks y
    ON x.blk = y.blk AND x.bk = y.bk AND x.doc_id < y.doc_id
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 6
"""


# --------------------------------------------------------------- embeddings

def _emb_matrix(sf_dir: str):
    """Full-table driver materialization — used ONLY by the exact
    all-pairs variant (embedding_similar_pairs), whose broadcast side is
    the whole matrix by design (IVF/LSH are the 100TB paths)."""
    df = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def _query_vectors(sf_dir: str, max_id: int = 8):
    """Query-side read with row-group filter pushdown: only the handful
    of query rows ever leave storage (never the full embeddings table).
    Returns (qids sorted asc, row-normalized float64 matrix)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < max_id,
    )
    df = ds.to_pandas().sort_values("vec_id")
    ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def _normed_batch(df: pd.DataFrame) -> np.ndarray:
    m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _grouped_topk(cands: ray.data.Dataset, k: int = 5) -> pd.DataFrame:
    """Final per-query rerank as a grouped Ray stage over candidate rows
    (qid, vec_id, sim): sort rounded-sim desc / vec_id asc inside the
    group, emit ranks 1..k. nq groups, each tiny."""

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame({
            "qid": g["qid"].to_numpy(),
            "vec_id": g["vec_id"].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
        })

    out = cands.groupby("qid").map_groups(topk, batch_format="pandas").to_pandas()
    out = out.astype({"qid": "int64", "vec_id": "int64", "rank": "int64"})
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)


def q_knn_bruteforce(sf_dir: str):
    """Brute-force cosine top-5 for query vectors (vec_id < 8): query
    matrix read via filtered pushdown + broadcast once; each data batch
    does one matmul and keeps only its LOCAL top-5 per query (the global
    top-5 is a subset of the per-batch top-5 union), so candidate volume
    is 5*nq per batch instead of nq per data row. Deterministic
    tie-break (rounded sim desc, vec_id asc)."""
    qids, qnorm = _query_vectors(sf_dir)
    q_ref = ray.put((qids, qnorm))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qn = ray.get(q_ref)
        m = _normed_batch(df)
        sims = np.round(m @ qn.T, 9)  # (batch, nq)
        vids = df["vec_id"].to_numpy()
        k = min(5, len(vids))
        qcol, vcol, scol = [], [], []
        for j, qid in enumerate(qids_):
            order = np.lexsort((vids, -sims[:, j]))[:k]
            qcol.append(np.full(k, qid, dtype=np.int64))
            vcol.append(vids[order].astype(np.int64))
            scol.append(sims[order, j])
        return pd.DataFrame({"qid": np.concatenate(qcol),
                             "vec_id": np.concatenate(vcol),
                             "sim": np.concatenate(scol)})

    cands = ds.map_batches(score, batch_format="pandas", batch_size=4096)
    return _grouped_topk(cands, 5)


SQL_KNN_BRUTEFORCE = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT q.qid, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 9) AS sim
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
  FROM s
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""


_EXACT_PAIR_CACHE: dict[str, tuple] = {}


def _memo_key(sf_dir: str, table: str, with_session: bool = False) -> tuple:
    """Memoization fingerprint for per-sf_dir caches: a cheap stat
    fingerprint (name, size, mtime_ns per file) so a rewritten input at
    the same path misses instead of serving stale results. With
    ``with_session`` the current Ray (node id, job id) pair joins the
    key — caches holding object-store refs (materialized Datasets) die
    with their owning job. NEITHER id alone suffices: the job id
    restarts at 01000000 after every local shutdown/init cycle
    (verified empirically), and the node id is stable across
    re-connects to one long-lived external cluster while the old job's
    refs are already dead; the pair covers both."""
    root = os.path.realpath(sf_dir)
    path = root if root.endswith(".parquet") else os.path.join(
        root, f"{table}.parquet")
    try:
        if os.path.isdir(path):
            stats = tuple(
                (f, (s := os.stat(os.path.join(path, f))).st_size,
                 s.st_mtime_ns)
                for f in sorted(os.listdir(path)))
        else:
            s = os.stat(path)
            stats = ((table, s.st_size, s.st_mtime_ns),)
    except OSError:
        stats = ()
    key = (root, stats)
    if with_session:
        if ray.is_initialized():
            ctx = ray.get_runtime_context()
            key += (ctx.get_node_id(), ctx.get_job_id())
        else:
            key += (None, None)
    return key


def _memo_get(cache: dict, sf_dir: str, table: str, build,
              with_session: bool = False):
    """Fingerprint-checked memoization keyed by RESOLVED root: at most
    one live entry per input directory, so a long-lived driver that
    rewrites its input (or re-inits Ray) evicts the stale entry instead
    of growing the dict — and, for Dataset caches, instead of pinning
    dead-session blocks in the object store."""
    root = os.path.realpath(sf_dir)
    key = _memo_key(sf_dir, table, with_session=with_session)
    hit = cache.get(root)
    if hit is None or hit[0] != key:
        cache[root] = (key, build())
    return cache[root][1]


def _exact_pair_ds(sf_dir: str):
    """Exact embedding near-dup pair Dataset (cosine >= 0.32): block
    matmul against the broadcast normalized matrix, one (a < b, cos)
    row per qualifying pair, emitted where the data lives. Shared by
    q_embedding_similar_pairs (the pair listing) and q_dedup_clusters
    (the edge source for connected components) — MEMOIZED per sf_dir
    (the _BF_EXACT_CACHE pattern) as a materialized Dataset, so a full
    catalog run pays the O(n^2/B) all-pairs kernel once, not twice.
    The key carries an input-stat fingerprint and the Ray node id, so a
    rewritten input or a new Ray session rebuilds instead of serving
    stale rows / dead object refs."""
    return _memo_get(_EXACT_PAIR_CACHE, sf_dir, "embeddings",
                     lambda: _exact_pair_ds_build(sf_dir).materialize(),
                     with_session=True)


def _exact_pair_ds_build(sf_dir: str):
    ids_all, mat_all = _emb_matrix(sf_dir)
    normed = mat_all / np.linalg.norm(mat_all, axis=1, keepdims=True)
    ref = ray.put((ids_all, normed))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        ids_, all_n = ray.get(ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ all_n.T
        vids = df["vec_id"].to_numpy()
        rows = []
        for i in range(len(vids)):
            for j in np.nonzero(np.round(sims[i], 6) >= 0.32)[0]:
                a, b = int(vids[i]), int(ids_[j])
                if a < b:
                    rows.append((a, b, round(float(sims[i, j]), 6)))
        return pd.DataFrame(rows, columns=["a", "b", "cos_sim"]) if rows else pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "cos_sim": pd.Series([], dtype="float64")})

    return ds.map_batches(block, batch_format="pandas", batch_size=2048)


def q_embedding_similar_pairs(sf_dir: str):
    """Embedding near-dup pairs (cosine >= 0.32), exact + LSH in ONE
    self-gating row: the exact block-matmul path (broadcast matrix,
    O(n*n/B) vectorized matmuls) produces the SQL-checkable pair rows;
    the LSH-bucketed scale path (_lsh_similar_pairs — hyperplane bucket
    codes, within-bucket cosine, no broadcast, no all-pairs) runs on
    the same input and is asserted IN-QUERY to be a subset of the exact
    pairs, surfaced as the constant ``lsh_subset_ok`` column the oracle
    can check (the approx_distinct_orderkeys pattern). At 100TB only
    the LSH path runs — the exact kernel is the verification tool."""
    out = _exact_pair_ds(sf_dir).to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    lsh = _lsh_similar_pairs(ds, threshold=0.32)
    exact_keys = set(map(tuple, out[["a", "b"]].to_numpy()))
    lsh_keys = set(map(tuple, lsh[["a", "b"]].to_numpy()))
    if not lsh_keys <= exact_keys:
        raise AssertionError(
            f"LSH path emitted {len(lsh_keys - exact_keys)} pairs the exact "
            "kernel did not — bucketing must never invent similarity"
        )
    out["lsh_subset_ok"] = True
    return out


SQL_EMBEDDING_SIMILAR_PAIRS = """
SELECT CAST(a.vec_id AS BIGINT) AS a, CAST(b.vec_id AS BIGINT) AS b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim,
       TRUE AS lsh_subset_ok
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.32
"""


def q_dedup_clusters(sf_dir: str):
    """Connected components over the near-dup pair graph -> one
    (vec_id, cluster_id=min id in component) row per node: the step a
    dedup pipeline needs AFTER pair finding (transitive closure picks
    one keeper per cluster; pairs alone over-delete A-B, B-C corpora).

    Distributed hash-to-min (Rastogi et al. 2013, "Finding Connected
    Components in Map-Reduce"): the state is a (k, v) membership table
    ("v is in k's cluster view"), seeded with self rows + both edge
    directions. One round = ONE bucketed shuffle: group by k, take
    m = min of the view, send the whole view to m and m to the whole
    view. Cluster views collapse doubly-exponentially — a depth-d
    component converges in ~log2(d)+2 rounds (the sf graph, depth ~14,
    takes 4-5), each round touching O(state) rows; the corpus itself
    never shuffles, only the pair graph (tiny relative: only near-dup
    members appear). State is materialized per round (stops lazy
    re-execution) and convergence is a cluster-side content-fingerprint
    fixpoint probe (count + order-independent xor/sum of per-row mixed
    hashes — a plain (count, sum) pair can collide across successive
    symmetric states). Known caveat at 10^12 scale, documented per the
    custom-operator contract: the root of a giant component
    accumulates O(component) rows — the small-star/large-star variant
    bounds that; row counts here stay O(edges). Hard SQL oracle:
    DuckDB recursive-CTE transitive closure."""
    edges_src = _exact_pair_ds(sf_dir)
    B = _pair_buckets()

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy(dtype=np.int64)
        b = df["b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"k": np.concatenate([a, b, a, b]),
                             "v": np.concatenate([b, a, a, b])})

    state = edges_src.map_batches(seed, batch_format="pandas").materialize()
    if state.count() == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "cluster_id": pd.Series([], dtype="int64")})

    def h2m(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        m = g.groupby("k")["v"].transform("min").to_numpy(np.int64)
        # min -> every member, every member -> min (vectorized emit)
        out = np.unique(
            np.stack([np.concatenate([m, v]), np.concatenate([v, m])], axis=1),
            axis=0)
        return pd.DataFrame({"k": out[:, 0], "v": out[:, 1]})

    def fp_batch(df: pd.DataFrame) -> pd.DataFrame:
        # one row per batch: (rows, xor, wrapped sum) of mixed row
        # hashes — order/partition-independent, content-sensitive
        k = df["k"].to_numpy(np.int64).view(np.uint64)
        v = df["v"].to_numpy(np.int64).view(np.uint64)
        h = H._mix64(k * np.uint64(0x9E3779B97F4A7C15) ^ v)
        return pd.DataFrame({
            "n": [np.int64(len(df))],
            "x": [np.bitwise_xor.reduce(h, initial=np.uint64(0))
                    .astype(np.int64)],
            "s": [h.sum(dtype=np.uint64).astype(np.int64)],
        })

    def fingerprint(ds_state) -> tuple:
        parts = ds_state.map_batches(fp_batch, batch_format="pandas").to_pandas()
        x = np.bitwise_xor.reduce(
            parts["x"].to_numpy(np.int64).view(np.uint64), initial=np.uint64(0))
        s = parts["s"].to_numpy(np.int64).view(np.uint64).sum(dtype=np.uint64)
        return (int(parts["n"].sum()), int(x), int(s))

    prev = None
    for _round in range(30):
        state = state.map_batches(
            lambda df: df.assign(_b=df["k"] % B), batch_format="pandas"
        ).groupby("_b").map_groups(h2m, batch_format="pandas").materialize()
        probe = fingerprint(state)
        if probe == prev:
            break
        prev = probe
    else:
        raise AssertionError("hash-to-min did not converge in 30 rounds")

    def local_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False)["v"].min()

    labels = state.map_batches(local_min, batch_format="pandas") \
        .groupby("k").min("v").to_pandas()
    labels.columns = ["vec_id", "cluster_id"]
    return labels.astype("int64").sort_values("vec_id").reset_index(drop=True)


SQL_DEDUP_CLUSTERS = """
WITH RECURSIVE
pairs AS (
  SELECT CAST(a.vec_id AS BIGINT) AS a, CAST(b.vec_id AS BIGINT) AS b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.32
),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs),
walk(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT u, u FROM edges
  UNION
  SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u
)
SELECT u AS vec_id, MIN(v) AS cluster_id FROM walk GROUP BY u
"""


def _lsh_similar_pairs(ds: ray.data.Dataset, threshold: float, tables: int = 6,
                       bits: int = 7, seed: int = 99, dim: int = 64) -> pd.DataFrame:
    """Scale path for embedding near-dup pairs: hyperplane bucket codes
    per vector (tables x bits, seeded planes broadcast once), vectors
    shuffled by (table, code) bucket, exact cosine pairs WITHIN each
    bucket only — candidate volume ~ sum of bucket^2 instead of n^2.
    Recall is by design concentrated on true near-dups (cos 0.9 ->
    ~92% with 6x7-bit tables; mid-similarity pairs mostly don't
    collide) — the exact block-matmul variant remains the mid-range
    tool. Deterministic; tested with planted near-dup vectors."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((tables, bits, dim))
    ref = ray.put(planes)
    B = _pair_buckets()

    def code(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(ref)
        m = _normed_batch(df)
        bts = np.einsum("tpd,nd->ntp", p, m) > 0
        codes = (bts << np.arange(bits)).sum(axis=2).astype(np.int64)  # (n, tables)
        key = (np.arange(tables, dtype=np.int64)[None, :] << bits) | codes
        vids = df["vec_id"].to_numpy(dtype=np.int64)
        flat_key = key.ravel()
        return pd.DataFrame({
            "key": flat_key,
            "sb": flat_key % B,
            "vec_id": np.repeat(vids, tables),
            "emb": list(np.repeat(m, tables, axis=0)),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "cos_sim": pd.Series([], dtype="float64")})
        out = []
        for _, sub in g.groupby("key"):
            if len(sub) < 2:
                continue
            sub = sub.drop_duplicates("vec_id")
            if len(sub) < 2:
                continue
            m = np.stack([np.asarray(e) for e in sub["emb"]])
            sims = np.round(m @ m.T, 6)
            ids = sub["vec_id"].to_numpy()
            ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
            if not ai.size:
                continue
            a, b = ids[ai], ids[bi]
            swap = a > b
            out.append(pd.DataFrame({"a": np.where(swap, b, a).astype(np.int64),
                                     "b": np.where(swap, a, b).astype(np.int64),
                                     "cos_sim": sims[ai, bi]}))
        return pd.concat(out, ignore_index=True) if out else empty

    res = ds.map_batches(code, batch_format="pandas", batch_size=2048) \
            .groupby("sb").map_groups(pairs, batch_format="pandas").to_pandas()
    if not len(res):
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cos_sim": pd.Series([], dtype="float64")})
    res = res[["a", "b", "cos_sim"]].drop_duplicates(["a", "b"])
    return res.sort_values(["a", "b"]).reset_index(drop=True)


_BF_EXACT_CACHE: dict[str, tuple] = {}


def _ann_recall_gate(sf_dir: str, ann: pd.DataFrame, bound: float,
                     flag_col: str) -> pd.DataFrame:
    """Self-gating oracle for ANN rows (the approx_distinct pattern):
    compute the EXACT top-k with the in-cluster brute-force kernel,
    assert the ANN result's average per-query recall against it, and
    return the exact rows plus a constant boolean the SQL oracle can
    also emit — the exact kernel anchors the value hash, the recall
    assertion (a raise on violation = a red driver row) gates the
    approximate path. At 100TB the gate runs on a sampled query set;
    here the query set is already tiny.

    The exact kernel is memoized per sf_dir (driver-side nq*5-row
    frame): a full catalog run gates three ANN rows and would
    otherwise rerun the full-corpus brute-force scan for each. The key
    carries an input-stat fingerprint (no session id needed — the
    cached value is a plain DataFrame, not object-store refs)."""
    exact = _memo_get(_BF_EXACT_CACHE, sf_dir, "embeddings",
                      lambda: q_knn_bruteforce(sf_dir)).copy()
    ex = exact.groupby("qid")["vec_id"].apply(set)
    an = ann.groupby("qid")["vec_id"].apply(set)
    recalls = [len(ex[q] & an.get(q, set())) / len(ex[q]) for q in ex.index]
    avg = sum(recalls) / len(recalls)
    if avg < bound:
        raise AssertionError(
            f"{flag_col}: average ANN recall {avg:.3f} below the {bound} gate"
        )
    exact[flag_col] = True
    return exact


def _knn_lsh_ann(sf_dir: str):
    """ANN via random-hyperplane LSH: 8 tables x 8 planes, multi-probe
    over all hamming-1 buckets (9 probes/table). Fully distributed: the
    seeded planes + per-query probe buckets are broadcast via ray.put
    ONCE; each data batch computes its own bucket codes + probe matches
    + candidate sims inside map_batches; the rerank is a grouped Ray
    stage. Nothing touches the driver except the nq*5 result rows.
    Hard-oracle row via the self-gating recall gate (_ann_recall_gate):
    measured avg recall ~0.72-0.78 across sf0.001-0.1, gated at 0.5;
    per-query recall additionally asserted in unit tests."""
    rng = np.random.default_rng(1234)
    planes = rng.standard_normal((8, 8, 64))  # tables x planes x dim

    def bucket(m):  # (n,64) -> (n, tables) uint8 bucket codes
        bits = np.einsum("tpd,nd->ntp", planes, m) > 0
        return (bits << np.arange(8)).sum(axis=2)

    qids, qmat = _query_vectors(sf_dir)
    probe_masks = np.concatenate([[0], 1 << np.arange(8)])  # exact + hamming-1
    # (nq, probes, tables) probe bucket codes — tiny, broadcast once
    probes = bucket(qmat)[:, None, :] ^ probe_masks[None, :, None]
    ref = ray.put((planes, qids, qmat, probes))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        planes_, qids_, qn, probes_ = ray.get(ref)
        m = _normed_batch(df)
        bits = np.einsum("tpd,nd->ntp", planes_, m) > 0
        b = (bits << np.arange(8)).sum(axis=2)  # (n, tables)
        # candidate (vector, query) iff any (table, probe) bucket match
        match = (b[:, None, None, :] == probes_[None, :, :, :]).any(axis=(2, 3))
        ni, qi = np.nonzero(match)
        sims = np.round(np.einsum("ij,ij->i", m[ni], qn[qi]), 9)
        vids = df["vec_id"].to_numpy()
        return pd.DataFrame({"qid": qids_[qi].astype(np.int64),
                             "vec_id": vids[ni].astype(np.int64),
                             "sim": sims})

    cands = ds.map_batches(candidates, batch_format="pandas", batch_size=4096)
    return _grouped_topk(cands, 5)


def _knn_int8_ann(sf_dir: str) -> pd.DataFrame:
    """Scalar-int8-quantized ANN: per-dimension (min, max) from one
    tiny stats fold, every vector stored as uint8 codes (8x memory /
    object-store reduction at 10^12 vectors — the storage decision this
    variant demonstrates), search = dequantize-per-batch + the same
    local-top-5 matmul prune as brute force. Queries quantize through
    the SAME codec so ranking error is symmetric."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ext = ds.map_batches(
        lambda df: pd.DataFrame(
            {"lo": [np.stack(df["embedding"].to_numpy()).min(axis=0)],
             "hi": [np.stack(df["embedding"].to_numpy()).max(axis=0)]}),
        batch_format="pandas").to_pandas()
    lo = np.stack(ext["lo"].to_numpy()).min(axis=0).astype(np.float64)
    hi = np.stack(ext["hi"].to_numpy()).max(axis=0).astype(np.float64)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)

    def quant(m: np.ndarray) -> np.ndarray:
        codes = np.clip(np.round((m - lo) / scale), 0, 255)
        return lo + codes * scale  # dequantized reconstruction

    # RAW query rows (filter pushdown), quantized through the same
    # raw-space codec as the data side, normalized after reconstruction
    qdf = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") < 8).to_pandas().sort_values("vec_id")
    qids = qdf["vec_id"].to_numpy()
    qd = quant(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    qd = qd / np.linalg.norm(qd, axis=1, keepdims=True)
    q_ref = ray.put((qids, qd, lo, scale))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qdq, lo_, scale_ = ray.get(q_ref)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        codes = np.clip(np.round((m - lo_) / scale_), 0, 255)
        md = lo_ + codes * scale_
        md = md / np.linalg.norm(md, axis=1, keepdims=True)
        sims = np.round(md @ qdq.T, 9)
        vids = df["vec_id"].to_numpy()
        k = min(5, len(vids))
        qcol, vcol, scol = [], [], []
        for j, qid in enumerate(qids_):
            order = np.lexsort((vids, -sims[:, j]))[:k]
            qcol.append(np.full(k, qid, dtype=np.int64))
            vcol.append(vids[order].astype(np.int64))
            scol.append(sims[order, j])
        return pd.DataFrame({"qid": np.concatenate(qcol),
                             "vec_id": np.concatenate(vcol),
                             "sim": np.concatenate(scol)})

    cands = ds.map_batches(score, batch_format="pandas", batch_size=4096)
    return _grouped_topk(cands, 5)


def q_knn_int8(sf_dir: str):
    """Catalog surface for the int8 scalar-quantized ANN wrapped in the
    self-gating recall oracle (the knn_lsh pattern): the quantized
    search runs in full, its avg recall vs the exact kernel is asserted
    in-query (8-bit reconstruction is tight, so the bound is higher
    than the LSH row's), and the SQL-checkable exact rows + constant
    flag are what the driver hashes."""
    return _ann_recall_gate(sf_dir, _knn_int8_ann(sf_dir), 0.8,
                            "int8_recall_ok")


SQL_KNN_INT8 = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT q.qid, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 9) AS sim
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
  FROM s
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, TRUE AS int8_recall_ok
FROM r WHERE rank <= 5
"""


def q_knn_lsh(sf_dir: str):
    """Catalog surface for the LSH ANN (_knn_lsh_ann) wrapped in the
    self-gating recall oracle (_ann_recall_gate): the ANN path runs in
    full, its avg recall vs the exact kernel is asserted in-query, and
    the SQL-checkable exact rows + constant flag are what the driver
    hashes. Old-vs-new ANN row equality stays pinned in unit tests."""
    return _ann_recall_gate(sf_dir, _knn_lsh_ann(sf_dir), 0.5, "lsh_recall_ok")


SQL_KNN_LSH = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT q.qid, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 9) AS sim
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
  FROM s
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, TRUE AS lsh_recall_ok
FROM r WHERE rank <= 5
"""


# --------------------------------------------------------------- extraction

_EXTRACTION_CACHE: dict[str, tuple] = {}


def _sf_tag_and_docs(sf_dir: str) -> tuple[str, int]:
    """Stable scratch tag + size for synthetic-corpus queries: the tag
    is crc32 of the RESOLVED corpus dir plus the process id (two
    different corpus dirs never collide on shared /tmp state, and two
    CONCURRENT driver processes on the same corpus don't rmtree each
    other's scratch), the size comes from the documents table's parquet
    metadata (no 'sf<number>' basename parsing — any directory name
    works)."""
    import pyarrow.dataset as pads

    _prune_dead_scratch()
    tag = format(zlib.crc32(os.path.abspath(sf_dir).encode()), "08x") + f"-{os.getpid()}"
    n_rows = pads.dataset(os.path.join(sf_dir, "documents.parquet")).count_rows()
    return tag, n_rows


_SCRATCH_ROOTS = ("/tmp/ocr_ray_spans", "/tmp/ocr_ray_corpus", "/tmp/ocr_ray_ckpt_out")
_PRUNED = False


def _prune_dead_scratch() -> None:
    """pid-suffixed scratch isolates concurrent drivers but would
    accumulate forever (each process only ever rmtree's its own tag);
    once per process, sweep sibling dirs that are BOTH aged past a
    grace window AND owned by a dead pid — the age guard protects live
    drivers a pid probe can't see (shared /tmp across pid namespaces).
    The 24h hard cap applies ONLY when the liveness probe is
    inconclusive (EPERM / foreign pid namespace): a conclusive "alive"
    always wins, so a long-running driver's scratch is never reclaimed
    out from under it (its cache reads also refresh mtime — see
    _extraction_diag)."""
    global _PRUNED
    if _PRUNED:
        return
    _PRUNED = True
    import shutil
    import time as _time

    now = _time.time()
    for root in _SCRATCH_ROOTS:
        try:
            entries = os.listdir(root)
        except OSError:
            continue
        for name in entries:
            pid_part = name.rsplit("-", 1)[-1]
            if not pid_part.isdigit() or pid_part == str(os.getpid()):
                continue
            path = os.path.join(root, name)
            try:
                age = now - os.path.getmtime(path)
            except OSError:
                continue
            if age < 600:
                continue  # grace window: never touch fresh scratch
            try:
                os.kill(int(pid_part), 0)
                dead = False  # conclusively alive — never reclaim
            except ProcessLookupError:
                dead = True
            except (OSError, OverflowError, ValueError):
                # EPERM / foreign pid namespace / absurd suffix: the
                # probe can't decide — reclaim only past the 24h cap
                dead = age > 86_400
            if dead:
                shutil.rmtree(path, ignore_errors=True)


def _extraction_diag(sf_dir: str) -> ray.data.Dataset:
    """Run the flagship pipeline ONCE per sf_dir over the interleaved
    view of the documents table and write a compact per-span DIAGNOSTIC
    table — (doc_id, offset, kind, n_chars, n_page_markers, confidence),
    lengths/counts computed in the cluster with Arrow kernels — to
    parquet under /tmp. Each extraction_* gate is then a cheap Ray
    aggregate over that table; the driver never materializes the full
    extraction output (span text/media payloads never leave the
    cluster)."""
    def _build() -> str:
        import shutil

        from .pipelines.extraction import build_extraction
        from .stages.interleave import docs_to_interleaved
        from .stages.prepare import explode_docs

        docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
        interleaved = docs.map_batches(docs_to_interleaved, batch_format="pyarrow")

        def explode_diag(t: pa.Table) -> pa.Table:
            # same vectorized Arrow explode kernel stage 1 uses, plus
            # the doc-level confidence repeated onto each span row
            rows = explode_docs(t)
            spans = t.column("spans").combine_chunks()
            if isinstance(spans, pa.ChunkedArray):
                spans = spans.combine_chunks()
            parent = pc.list_parent_indices(spans)
            text = rows.column("text")
            return pa.table({
                "doc_id": rows.column("doc_id"),
                "offset": pc.cast(rows.column("offset"), pa.int32()),
                "kind": rows.column("kind"),
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_page_markers": pc.cast(
                    pc.count_substring(text, "=== Page "), pa.int64()),
                "confidence": pc.take(t.column("confidence"), parent),
            })

        tag, _ = _sf_tag_and_docs(sf_dir)
        out_dir = f"/tmp/ocr_ray_spans/{tag}"
        shutil.rmtree(out_dir, ignore_errors=True)
        build_extraction(interleaved).map_batches(
            explode_diag, batch_format="pyarrow"
        ).write_parquet(out_dir)
        return out_dir

    # fingerprinted like the other per-sf_dir caches: a rewritten
    # documents.parquet at the same path rebuilds the diagnostic table
    # instead of false-greening the extraction gates from stale spans
    out_dir = _memo_get(_EXTRACTION_CACHE, sf_dir, "documents", _build)
    # refresh mtime on every read so a long-running driver's scratch
    # stays inside _prune_dead_scratch's grace window even when a
    # sibling process can't probe this pid
    try:
        os.utime(out_dir)
    except OSError:
        pass
    return ray.data.read_parquet(out_dir)


def _diag_gate(sf_dir: str, kind: str, col: str, out_col: str) -> pd.DataFrame:
    """Shared gate shape: filter one span kind, project (doc_id, metric)
    — both run cluster-side; the driver receives only the result rows."""
    ds = _extraction_diag(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("kind"), kind))
        return pa.table({"doc_id": sel.column("doc_id"),
                         out_col: sel.column(col)})

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_extraction_span_counts(sf_dir: str):
    """End-to-end flagship gate: span counts by kind after full
    extraction (partial counts per batch, O(kinds) rows to the driver);
    the SQL oracle reproduces the deterministic interleave rules
    (stages/interleave.py) with modular arithmetic."""
    ds = _extraction_diag(sf_dir)
    parts = ds.map_batches(
        lambda df: df.groupby("kind", as_index=False).size(),
        batch_format="pandas",
    ).to_pandas()
    out = parts.groupby("kind", as_index=False)["size"].sum() \
               .rename(columns={"size": "n_spans"})
    out["n_spans"] = out["n_spans"].astype("int64")
    return out.sort_values("kind").reset_index(drop=True)


SQL_EXTRACTION_SPAN_COUNTS = """
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_spans FROM (
  SELECT 'text' AS kind FROM documents
  UNION ALL SELECT 'html' FROM documents WHERE doc_id % 7 = 0
  UNION ALL SELECT 'image' FROM documents WHERE doc_id % 10 = 0
  UNION ALL SELECT 'pdf' FROM documents WHERE doc_id % 25 = 0
) GROUP BY kind
"""


def q_extraction_text_identity(sf_dir: str):
    """Text spans must survive extraction byte-identical: compare char
    counts per doc against the raw table (lengths computed cluster-side
    in the diagnostic table)."""
    return _diag_gate(sf_dir, "text", "n_chars", "extracted_chars")


SQL_EXTRACTION_TEXT_IDENTITY = """
SELECT printf('tdoc-%08d', doc_id) AS doc_id,
       CAST(length(text) AS BIGINT) AS extracted_chars
FROM documents
"""


def q_extraction_ocr_roundtrip(sf_dir: str):
    """OCR path gate: every synthetic image span must decode back to its
    exact payload (the first 160 chars of the source text) through the
    full degrade -> preprocess -> split -> decode -> merge pipeline."""
    return _diag_gate(sf_dir, "image", "n_chars", "ocr_chars")


SQL_EXTRACTION_OCR_ROUNDTRIP = """
SELECT printf('tdoc-%08d', doc_id) AS doc_id,
       CAST(length(substr(text, 1, 160)) AS BIGINT) AS ocr_chars
FROM documents WHERE doc_id % 10 = 0
"""


def q_extraction_html_strip(sf_dir: str):
    """HTML boilerplate gate: stripped content of the deterministic
    wrapper = trimmed first 120 chars of the source text."""
    return _diag_gate(sf_dir, "html", "n_chars", "stripped_chars")


SQL_EXTRACTION_HTML_STRIP = """
-- mirrors strip_boilerplate's _clean: collapse whitespace runs, trim;
-- blocks under min_text_chars=20 are dropped entirely (-> 0 chars)
SELECT doc_id,
       CAST(CASE WHEN l < 20 THEN 0 ELSE l END AS BIGINT) AS stripped_chars
FROM (
  SELECT printf('tdoc-%08d', doc_id) AS doc_id,
         length(trim(regexp_replace(substr(text, 1, 120), '\\s+', ' ', 'g'))) AS l
  FROM documents WHERE doc_id % 7 = 0
)
"""


def q_extraction_pdf_pages(sf_dir: str):
    """PDF fan-out/stitch gate: page-marker count in the stitched span
    equals the deterministic page count (1 + doc_id % 3)."""
    return _diag_gate(sf_dir, "pdf", "n_page_markers", "n_pages")


SQL_EXTRACTION_PDF_PAGES = """
SELECT printf('tdoc-%08d', doc_id) AS doc_id,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_pages
FROM documents WHERE doc_id % 25 = 0
"""


def q_extraction_confidence(sf_dir: str):
    """Confidence plumbing gate: the doc-level min over per-unit engine
    confidences (c/(c+1) of CRC-verified chars) must match the oracle's
    closed form for image docs. pdf docs are excluded here (their page
    text length isn't SQL-expressible) — the pipeline-vs-oracle pytest
    covers them."""
    ds = _extraction_diag(sf_dir)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df[["doc_id", "confidence"]].drop_duplicates("doc_id")
        ids = t["doc_id"].str.slice(5).astype(int)
        t = t[(ids % 10 == 0) & (ids % 25 != 0)].copy()
        t["confidence"] = t["confidence"].astype(float).round(6)
        return t

    # per-batch filter + dedupe in the cluster; the driver dedupes only
    # block boundaries of the (already 1-row-per-selected-doc) result
    out = ds.map_batches(f, batch_format="pandas").to_pandas() \
            .drop_duplicates("doc_id")
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_EXTRACTION_CONFIDENCE = """
SELECT printf('tdoc-%08d', doc_id) AS doc_id,
       ROUND(length(substr(text, 1, 160)) /
             (length(substr(text, 1, 160)) + 1.0), 6) AS confidence
FROM documents WHERE doc_id % 10 = 0 AND doc_id % 25 <> 0
"""


def q_pdf_metadata(sf_dir: str):
    """S5 gate: per-pdf-span metadata (page count + info-dict fields)
    extracted by the stateless pdf_metadata_batch stage; the SQL oracle
    reproduces the deterministic interleave rules."""
    from .stages.interleave import docs_to_interleaved
    from .stages.pdfmeta import pdf_metadata_batch

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])
    out = (
        docs.map_batches(docs_to_interleaved, batch_format="pyarrow")
        .map_batches(pdf_metadata_batch, batch_format="pyarrow")
        .to_pandas()
    )
    out = out[["doc_id", "n_pages", "title", "author"]]
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_PDF_METADATA = """
SELECT printf('tdoc-%08d', doc_id) AS doc_id,
       CAST(1 + doc_id % 3 AS BIGINT) AS n_pages,
       'Synthetic PDF ' || printf('tdoc-%08d', doc_id) AS title,
       'synth' AS author
FROM documents WHERE doc_id % 25 = 0
"""


def q_extraction_checkpointed(sf_dir: str):
    """Checkpoint/resume gate (north rule: resumable with per-partition
    lineage + metrics): run the partitioned checkpointed extraction over
    a small synthetic corpus, then call it AGAIN — the second run must
    skip every partition at the read. Hard SQL row (upgraded from
    rows-only, the approx_distinct self-gating pattern): the corpus is
    sized from the documents table (max(24, n//12)), so the oracle
    independently recomputes total_rows from COUNT(*), while every
    resume / manifest / lineage / throughput invariant is asserted
    in-query (a violation raises = red driver row) and surfaced as a
    SQL-checkable constant boolean. Per-partition manifest detail stays
    pinned in tests/test_checkpoint.py."""
    import json

    from .state.checkpoint import run_checkpointed
    from .synth.corpus import write_corpus

    tag, n_rows = _sf_tag_and_docs(sf_dir)
    n_docs = max(24, n_rows // 12)
    in_dir = f"/tmp/ocr_ray_corpus/ckpt_q_{tag}"
    out_dir = f"/tmp/ocr_ray_ckpt_out/q_{tag}"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    write_corpus(in_dir, n_docs, seed=11, heavy_frac=0.0, n_files=4)

    first = run_checkpointed(in_dir, out_dir, num_partitions=4)
    second = run_checkpointed(in_dir, out_dir, num_partitions=4)
    assert second["processed_partitions"] == [], "resume must skip done partitions"
    assert sorted(second["skipped_partitions"]) == [0, 1, 2, 3]

    with open(os.path.join(out_dir, "_manifest.json")) as fh:
        manifest = json.load(fh)
    recs = [rec for _, rec in sorted(manifest["partitions"].items(),
                                     key=lambda kv: int(kv[0]))]
    n_done = sum(rec["status"] == "done" for rec in recs)
    lineage_ok = all(rec["lineage"]["engine"] and rec["lineage"]["engine_config_crc"]
                     for rec in recs)
    throughput_ok = all(rec["docs_per_sec"] > 0 for rec in recs)
    total_rows = sum(int(rec["rows"]) for rec in recs)
    assert len(recs) == n_done == 4, "all partitions must finish"
    assert lineage_ok, "every partition must record engine lineage"
    assert throughput_ok, "every partition must record docs/sec"
    assert total_rows == first["rows"] == n_docs
    return pd.DataFrame({
        "n_partitions": [len(recs)],
        "total_rows": [total_rows],
        "n_done": [n_done],
        "resume_skipped_all": [True],
        "lineage_ok": [lineage_ok],
        "throughput_ok": [throughput_ok],
    })


SQL_EXTRACTION_CHECKPOINTED = """
SELECT CAST(4 AS BIGINT) AS n_partitions,
       CAST(GREATEST(24, COUNT(*) // 12) AS BIGINT) AS total_rows,
       CAST(4 AS BIGINT) AS n_done,
       TRUE AS resume_skipped_all,
       TRUE AS lineage_ok,
       TRUE AS throughput_ok
FROM documents
"""


def q_extraction_synth_corpus(sf_dir: str):
    """Flagship pipeline over the native synthetic interleaved corpus,
    upgraded from rows-only to a HARD SQL row (the self-gating
    pattern): the Ray pipeline's output is compared IN-QUERY against
    the pure-Python reference extractor (pipelines/oracle.py) under
    the north rule's per-row invariant — span-sequence equality on
    (kind, text, media_ref, order) per doc_id — and any violation
    raises (= a red driver row). The surfaced columns are independently
    SQL-derivable: n_docs is recomputed by the oracle from COUNT(*) of
    the documents table (the corpus is sized max(30, n//16) from it),
    spans_match_oracle is the gate constant. The corpus is SMALL BY
    DESIGN (it is the verification unit, like embedding_similar_pairs'
    exact kernel), so the driver-side span comparison is bounded; the
    full-scale pipeline is benched by bench.py and gate-checked by the
    extraction_* oracle family."""
    from .pipelines.extraction import run_extraction
    from .pipelines.oracle import extract_corpus
    from .synth.corpus import write_corpus

    tag, n_rows = _sf_tag_and_docs(sf_dir)
    n_docs = max(30, n_rows // 16)
    out_dir = f"/tmp/ocr_ray_corpus/q_{tag}"
    write_corpus(out_dir, n_docs, seed=42, heavy_frac=0.01, n_files=8)

    def seq(spans) -> list:
        return [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in sorted(spans, key=lambda s: s["offset"])]

    got = {r["doc_id"]: seq(r["spans"])
           for r in run_extraction(out_dir).to_pandas().to_dict("records")}
    import pyarrow.dataset as pads
    docs = pads.dataset(out_dir, format="parquet").to_table().to_pylist()
    expected = {d["doc_id"]: seq(d["spans"]) for d in extract_corpus(docs)}
    if set(got) != set(expected):
        raise AssertionError(
            f"doc_id sets differ: ray={len(got)} oracle={len(expected)}"
        )
    bad = [k for k in expected if got[k] != expected[k]]
    if bad:
        raise AssertionError(
            f"span-sequence mismatch vs the pure-Python oracle for "
            f"{len(bad)} docs (first: {bad[0]})"
        )
    return pd.DataFrame({"n_docs": [np.int64(n_docs)],
                         "spans_match_oracle": [True]})


SQL_EXTRACTION_SYNTH_CORPUS = """
SELECT CAST(GREATEST(30, COUNT(*) // 16) AS BIGINT) AS n_docs,
       TRUE AS spans_match_oracle
FROM documents
"""


# --------------------------------------------------------------- joins / set ops / sort

def q_asof_last_order(sf_dir: str):
    """As-of join (events -> most recent order at/before the event):
    both sides tagged + unioned, the key space hashed into bucket
    groups, ordered and ffilled per user INSIDE the bucket — the
    merge-asof shape Ray Data lacks natively (SURVEY.md §2.8). At 100TB
    the bucketed groupby is the one shuffle; both inputs are pruned to
    the join columns at the read."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": df["user_id"].astype("int64"),
                             "t": df["ts"],
                             "event_id": df["event_id"].astype("int64"),
                             "is_order": False})

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": df["o_custkey"].astype("int64"),
                             "t": df["o_orderdate"],
                             "event_id": np.int64(-1),
                             "is_order": True})

    both = ev.map_batches(tag_events, batch_format="pandas").union(
        od.map_batches(tag_orders, batch_format="pandas")
    )
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # bucket the key space: one pandas group per USER costs ~0.4 ms
        # each at shuffle time; a bucket holds thousands of users and
        # the scan below is a single vectorized pass
        return df.assign(_b=df["k"] % B)

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # orders sort BEFORE events at equal t so a same-timestamp order
        # is visible to the event's ffill — matching the oracle's
        # inclusive `e.ts >= o.o_orderdate` asof condition; the ffill is
        # per-user via a C-level groupby, never a Python per-user loop
        g = g.sort_values(["k", "t", "is_order"], ascending=[True, True, False])
        last_order = g["t"].where(g["is_order"]).groupby(g["k"]).ffill()
        evr = ~g["is_order"]
        days = (g.loc[evr, "t"].dt.normalize() - last_order[evr].dt.normalize()).dt.days
        out = pd.DataFrame({"event_id": g.loc[evr, "event_id"],
                            "user_id": g.loc[evr, "k"],
                            "days_since_order": days})
        return out.dropna(subset=["days_since_order"]).astype(
            {"event_id": "int64", "user_id": "int64", "days_since_order": "int64"})

    out = both.map_batches(add_bucket, batch_format="pandas") \
              .groupby("_b").map_groups(asof_bucket, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


SQL_ASOF_LAST_ORDER = """
SELECT e.event_id, CAST(e.user_id AS BIGINT) AS user_id,
       CAST(date_diff('day', o.o_orderdate, CAST(e.ts AS DATE)) AS BIGINT)
         AS days_since_order
FROM events e ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_range_join_events(sf_dir: str):
    """Interval (range) join Ray Data lacks natively: for every error
    event, count the SAME user's click events within +/-1 hour — the
    `ON key equal AND ts BETWEEN lo AND hi` shape (SURVEY.md §2.8's
    as-of sibling). Both sides are pruned at the read with a pushed
    event_type filter; the key space hashes into bucket groups (ONE
    shuffle of the filtered rows); inside a bucket the window count is
    two vectorized searchsorted calls over a composite (dense user
    rank, click-time rank) key — no per-user loop, no per-row loop.

    Partitioning assumption (documented per the custom-operator
    contract): a user's rows co-locate via the hash bucket; window
    width is bounded (2h), so bucket skew is bounded by the hottest
    user's row count, the same salting levers as the premerge apply."""
    H = 3_600_000_000  # one hour in microseconds
    err = _read(sf_dir, "events", ["event_id", "ts", "user_id"],
                filter=pc.field("event_type") == "error")
    clk = _read(sf_dir, "events", ["ts", "user_id"],
                filter=pc.field("event_type") == "click")

    def _us(ts: pd.Series) -> pd.Series:
        # pin microseconds regardless of the arrow->pandas resolution
        # (datetime64[ns] would silently shrink the window 1000x)
        return ts.astype("datetime64[us]").astype("int64")

    def tag_err(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": df["user_id"].astype("int64"),
                             "t": _us(df["ts"]),
                             "event_id": df["event_id"].astype("int64")})

    def tag_clk(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": df["user_id"].astype("int64"),
                             "t": _us(df["ts"]),
                             "event_id": np.int64(-1)})

    both = err.map_batches(tag_err, batch_format="pandas").union(
        clk.map_batches(tag_clk, batch_format="pandas"))
    B = _pair_buckets()

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_err = (g["event_id"] >= 0).to_numpy()
        users = np.unique(g["k"].to_numpy(np.int64))
        rank = np.searchsorted(users, g["k"].to_numpy(np.int64))
        t = g["t"].to_numpy(np.int64)
        # Composite key over (user rank, click-time RANK) — ranks, not
        # raw times, so the multiplier is O(bucket rows) and the key
        # cannot overflow int64 until a single bucket holds ~3e9 rows
        # (which would not fit a worker anyway). A click time x lies in
        # [t-H, t+H] iff its left-rank in the sorted click times lies in
        # [left-rank(t-H), right-rank(t+H)) — duplicate-safe.
        cvals = np.sort(t[~is_err])
        mult = np.int64(len(cvals) + 1)
        if len(users) and int(users.size) * int(mult) >= 2**62:
            raise AssertionError(
                "range-join bucket too large for the int64 rank "
                "composite — raise the bucket count")
        ck = np.sort(rank[~is_err] * mult
                     + np.searchsorted(cvals, t[~is_err], side="left"))
        eu = rank[is_err]
        et = t[is_err]
        lo = eu * mult + np.searchsorted(cvals, et - H, side="left")
        hi = eu * mult + np.searchsorted(cvals, et + H, side="right")
        n = np.searchsorted(ck, hi, side="left") - \
            np.searchsorted(ck, lo, side="left")
        return pd.DataFrame({
            "event_id": g.loc[is_err, "event_id"].to_numpy(np.int64),
            "user_id": g.loc[is_err, "k"].to_numpy(np.int64),
            "n_nearby_clicks": n.astype(np.int64),
        })

    out = both.map_batches(lambda df: df.assign(_b=df["k"] % B),
                           batch_format="pandas") \
              .groupby("_b").map_groups(count_bucket, batch_format="pandas") \
              .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


SQL_RANGE_JOIN_EVENTS = """
SELECT e.event_id, CAST(e.user_id AS BIGINT) AS user_id,
       CAST(COUNT(c.event_id) AS BIGINT) AS n_nearby_clicks
FROM events e LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND c.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts + INTERVAL 1 HOUR
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id
"""


def q_party_nation_counts(sf_dir: str):
    """Set op + broadcast join: customers UNION ALL suppliers counted
    per nation, nation names joined from a driver-read broadcast dict
    (ray.put once, read per batch — never a shuffle for a 25-row side)."""
    import pyarrow.parquet as pq

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    names_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))

    cust = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda df: pd.DataFrame({"k": df["c_nationkey"].astype("int64")}),
        batch_format="pandas")
    supp = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda df: pd.DataFrame({"k": df["s_nationkey"].astype("int64")}),
        batch_format="pandas")

    def partial_count(df: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(names_ref)
        out = df.groupby("k", as_index=False).size()
        out["n_name"] = out["k"].map(names)
        return out[["n_name", "size"]]

    parts = cust.union(supp).map_batches(partial_count, batch_format="pandas").to_pandas()
    out = parts.groupby("n_name", as_index=False)["size"].sum() \
               .rename(columns={"size": "n_parties"})
    out["n_parties"] = out["n_parties"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


SQL_PARTY_NATION_COUNTS = """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_parties
FROM (SELECT c_nationkey AS k FROM customer
      UNION ALL SELECT s_nationkey FROM supplier) p
JOIN nation ON n_nationkey = p.k
GROUP BY n_name
"""


def q_top_orders(sf_dir: str):
    """Global sort + limit: Ray's range-partitioned distributed sort,
    deterministic tie-break on the key. The only stage that touches
    every row; columns pruned at the read."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(100)
    df = top.to_pandas()
    df["o_totalprice"] = df["o_totalprice"].round(2)
    return df.astype({"o_orderkey": "int64", "o_custkey": "int64"})


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# quadratic-block bound for dedup_ngram: a block past this many docs is
# split by a secondary doc_id hash (cap^2-bounded gram matrices even on
# near-uniform-length corpora)
_NGRAM_BLOCK_CAP = 512


def _ngram_block_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Exact word-3-gram Jaccard >= 0.3 over ONE (sub-)block: boolean
    doc x gram matrix, intersections via a single matmul."""
    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
    if len(g) < 2:
        return empty
    gram_sets = [TS.word_ngrams(t, 3) for t in g["text"]]
    vocab: dict[str, int] = {}
    for s in gram_sets:
        for ng in s:
            vocab.setdefault(ng, len(vocab))
    if not vocab:
        return empty
    m = np.zeros((len(g), len(vocab)), dtype=np.float32)
    for i, s in enumerate(gram_sets):
        for ng in s:
            m[i, vocab[ng]] = 1.0
    # intersections are exact integer counts in float32 (< 2^24 grams);
    # the DIVISION happens in float64 so jaccard is the correctly
    # rounded ratio of two ints — bit-identical to SQL i/u, emitted
    # UNROUNDED per the module determinism policy (rounding a ratio
    # that feeds a >= comparison invites half-even/half-away ties)
    inter = (m @ m.T).astype(np.float64)
    sizes = m.sum(axis=1, dtype=np.float64)
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(invalid="ignore"):
        jac = np.where(union > 0, inter / union, 0.0)
    ids = g["doc_id"].to_numpy()
    ai, bi = np.nonzero(np.triu(jac >= 0.3, k=1))
    if not ai.size:
        return empty
    a, b = ids[ai], ids[bi]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return pd.DataFrame({"a": a2.astype("int64"), "b": b2.astype("int64"),
                         "jaccard": jac[ai, bi]})


def q_dedup_ngram(sf_dir: str):
    """Exact word-3-gram Jaccard >= 0.3 within length-bucket blocks
    (each doc emitted to its bucket AND the next, so pairs within 32
    chars of length always co-locate): one boolean doc x gram matrix
    per block, intersections via a single matmul — no per-pair Python.
    Quadratic within a block, so blocks are ROW-CAPPED: a block past
    _NGRAM_BLOCK_CAP docs (a near-uniform-length corpus — truncated or
    padded training data — collapses every doc into a handful of
    blocks) is split by a secondary doc_id hash into sub-blocks under
    the cap, bounding the gram matrix at cap^2 regardless of corpus
    shape. Pairs split across sub-blocks are missed BY DESIGN (recall
    trade documented here): this is the exact-verification variant;
    MinHash-LSH (dedup_minhash) is the 100TB path. HARD SQL row: the
    oracle recomputes the gram sets, the |block diff| <= 1 blocking AND
    the unrounded int-ratio jaccard values in pure SQL — exact whenever
    no block exceeds _NGRAM_BLOCK_CAP (true at the driver's oracle sf;
    past the cap the sub-split recall trade applies). Recall vs
    minhash's strong pairs additionally asserted in unit tests."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def add_block(df: pd.DataFrame) -> pd.DataFrame:
        b = (df["n_chars"] // 32).astype("int64")
        lo = df[["doc_id", "text"]].assign(block=b)
        hi = df[["doc_id", "text"]].assign(block=b + 1)
        return pd.concat([lo, hi], ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) <= _NGRAM_BLOCK_CAP:
            return _ngram_block_pairs(g)
        # one-shot split (never recursive): a multiplicative mix of
        # doc_id spreads any id pattern near-uniformly over nsub
        # sub-blocks, so each gram matrix is ~cap^2 bounded
        nsub = -(-len(g) // _NGRAM_BLOCK_CAP)
        mixed = (g["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        sub_key = mixed % np.uint64(nsub)
        out = [sub_pairs for s in range(nsub)
               if len(sub_pairs := _ngram_block_pairs(g[sub_key == s]))]
        return pd.concat(out, ignore_index=True) if out else _ngram_block_pairs(g.head(0))

    out = ds.map_batches(add_block, batch_format="pandas") \
            .groupby("block").map_groups(pairs, batch_format="pandas").to_pandas()
    # same-bucket pairs meet twice (block b and b+1): dedupe
    out = out.drop_duplicates(["a", "b"])
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# exact SQL mirror of q_dedup_ngram: same [a-z0-9]+ token stream, same
# word-3-gram sets (sub-3-token docs yield the whole stream as one
# gram), same |block diff| <= 1 length blocking, same unrounded i/u
# jaccard — exact when no block exceeds _NGRAM_BLOCK_CAP
SQL_DEDUP_NGRAM = r"""
WITH toks AS (
  SELECT doc_id, n_chars // 32 AS block,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
  FROM documents
),
grams AS (
  SELECT doc_id, block,
         CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
              ELSE list_distinct(list_transform(range(1, len(tk) - 1),
                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
         END AS gs
  FROM toks
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.gs, y.gs)) AS i,
         len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs)) AS u
  FROM grams x JOIN grams y
    ON x.doc_id < y.doc_id AND abs(x.block - y.block) <= 1
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(i AS DOUBLE) / CAST(u AS DOUBLE) AS jaccard
FROM cand WHERE u > 0 AND CAST(i AS DOUBLE) / CAST(u AS DOUBLE) >= 0.3
"""


def _ivf_train(sf_dir: str, nlist: int = 8, iters: int = 5) -> np.ndarray:
    """Distributed deterministic k-means coarse quantizer: seeded init
    rows fetched via filtered read (vec_id == row position in the
    table); each Lloyd iteration is a map_batches pass emitting per-list
    partial (sum, count) — the driver only ever holds the nlist x dim
    centroid matrix, never the data."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()  # parquet metadata, no scan
    rng = np.random.default_rng(7)
    init_ids = rng.choice(n, nlist, replace=False)
    init_df = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id").isin(init_ids),
    ).to_pandas().set_index("vec_id").loc[init_ids]
    cent = np.stack(init_df["embedding"].to_numpy()).astype(np.float64)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            m = _normed_batch(df)
            a = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            return pd.DataFrame({"sums": [sums.tobytes()], "counts": [counts.tobytes()]})

        parts = ds.map_batches(partial, batch_format="pandas", batch_size=4096).to_pandas()
        sums = np.zeros_like(cent)
        counts = np.zeros(nlist, dtype=np.int64)
        for sb, cb in zip(parts["sums"], parts["counts"]):
            sums += np.frombuffer(sb, dtype=np.float64).reshape(cent.shape)
            counts += np.frombuffer(cb, dtype=np.int64)
        for ci in range(nlist):
            if counts[ci]:
                v = sums[ci] / counts[ci]
                cent[ci] = v / np.linalg.norm(v)
    return cent


def _knn_ivf_ann(sf_dir: str):
    """ANN via IVF: distributed k-means coarse quantizer (_ivf_train),
    nprobe=3 lists per query, exact rerank inside the probed lists. The
    scale shape: centroids + per-query probed-list masks broadcast via
    ray.put once; list assignment is a map_batches matmul; each query's
    candidate sims are computed where the data lives, and the final
    rerank is a grouped Ray stage. Recall + old-vs-new equality
    asserted in unit tests; the catalog surface (q_knn_ivf) adds the
    self-gating recall oracle."""
    nlist, nprobe = 8, 3
    cent = _ivf_train(sf_dir, nlist)
    qids, qmat = _query_vectors(sf_dir)
    # (nlist, nq) bool: is list l probed by query q — tiny, broadcast
    order = np.argsort(-(cent @ qmat.T), axis=0)  # lists ranked per query
    probed = np.zeros((nlist, len(qids)), dtype=bool)
    probed[order[:nprobe], np.arange(len(qids))] = True
    ref = ray.put((cent, qids, qmat, probed))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        cent_, qids_, qn, probed_ = ray.get(ref)
        m = _normed_batch(df)
        a = np.argmax(m @ cent_.T, axis=1)  # list assignment per vector
        match = probed_[a]  # (n, nq): vector in a probed list of query q
        ni, qi = np.nonzero(match)
        sims = np.round(np.einsum("ij,ij->i", m[ni], qn[qi]), 9)
        vids = df["vec_id"].to_numpy()
        return pd.DataFrame({"qid": qids_[qi].astype(np.int64),
                             "vec_id": vids[ni].astype(np.int64),
                             "sim": sims})

    cands = ds.map_batches(candidates, batch_format="pandas", batch_size=4096)
    return _grouped_topk(cands, 5)


def q_knn_ivf(sf_dir: str):
    """Catalog surface for the IVF ANN (_knn_ivf_ann) wrapped in the
    self-gating recall oracle: measured avg recall ~0.72-0.78 across
    sf0.001-0.1 at nprobe=3/nlist=8, gated at 0.5."""
    return _ann_recall_gate(sf_dir, _knn_ivf_ann(sf_dir), 0.5, "ivf_recall_ok")


SQL_KNN_IVF = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT q.qid, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 9) AS sim
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
  FROM s
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, TRUE AS ivf_recall_ok
FROM r WHERE rank <= 5
"""


def _knn_ivfpq_ann(sf_dir: str, shortlist: int = 50):
    """ANN via IVF-PQ (Jegou et al. 2011), the memory-scale composition
    (functions/pq.py + _ivf_train):

      coarse quantizer (distributed k-means)
      -> residual PQ codebooks (pq_train_distributed: one map_batches
         partial-(sum,count) pass per Lloyd iteration over the residual
         stage; the driver holds only the (m, k, dsub) tensor)
      -> per-batch encode to uint8 codes + ADC scoring: approx
         dot(q, x) = dot(q, centroid[a]) + LUT-gather over the residual
         codes (dot is linear, so ONE (m, k) LUT per query serves every
         list — no decompression)
      -> local per-query ADC top-``shortlist`` among probed-list
         vectors, exact rerank of just those rows
      -> grouped global top-5.

    Deterministic end to end: seeded coarse init (filtered read by
    vec_id), seeded PQ init (256 scattered rows via filtered read,
    residualized driver-side — O(256 x dim)), fixed tie-breaks. At
    100TB the codes table is built once as a dataset job
    (functions.pq.build_pq_index) and queries touch 8 B/vector."""
    from .functions import pq as PQ

    # m=16 x k=64 on 64-dim residuals (4-dim subspaces, 16 B/vector =
    # 32x compression): measured avg recall 0.725/0.75 at sf0.001/0.1 —
    # equal to plain IVF, i.e. the ADC shortlist loses ~nothing and the
    # coarse probing is the binding constraint (the right regime)
    nlist, nprobe, m_sub, k_codes = 8, 3, 16, 64
    cent = _ivf_train(sf_dir, nlist)
    qids, qmat = _query_vectors(sf_dir)
    nq = len(qids)
    order = np.argsort(-(cent @ qmat.T), axis=0)
    probed = np.zeros((nlist, nq), dtype=bool)
    probed[order[:nprobe], np.arange(nq)] = True
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # deterministic scattered PQ init: 256 seeded rows fetched by id,
    # residualized against their coarse centroid on the driver
    n = ds.count()  # parquet metadata, no scan
    rng = np.random.default_rng(17)
    init_ids = rng.choice(n, min(256, n), replace=False)
    init_df = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id").isin(init_ids),
    ).to_pandas().set_index("vec_id").loc[init_ids]  # pin seeded order:
    # the filtered read's row order depends on Ray block layout
    init_m = np.stack(init_df["embedding"].to_numpy()).astype(np.float64)
    init_m /= np.linalg.norm(init_m, axis=1, keepdims=True)
    init_resid = init_m - cent[np.argmax(init_m @ cent.T, axis=1)]
    init_cb = PQ._init_codebooks(init_resid, m_sub, k_codes, seed=13)

    cent_ref = ray.put(cent)

    def residuals(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cent_ref)
        m = _normed_batch(df)
        return pd.DataFrame({"embedding": list(m - c[np.argmax(m @ c.T, axis=1)])})

    resid_ds = ds.map_batches(residuals, batch_format="pandas", batch_size=4096)
    cb = PQ.pq_train_distributed(resid_ds, m=m_sub, k=k_codes, iters=4,
                                 init=init_cb)

    # one (m, k) LUT per query + per-(query, list) coarse dot — tiny
    luts = np.einsum("qmd,mkd->qmk", qmat.reshape(nq, m_sub, -1), cb)
    qcent = qmat @ cent.T  # (nq, nlist)
    ref = ray.put((cent, cb, qids, qmat, probed, luts, qcent))

    def candidates(df: pd.DataFrame) -> pd.DataFrame:
        cent_, cb_, qids_, qn, probed_, luts_, qcent_ = ray.get(ref)
        m = _normed_batch(df)
        a = np.argmax(m @ cent_.T, axis=1)
        codes = PQ.pq_encode(m - cent_[a], cb_)  # (n, m_sub) uint8
        adc = qcent_[:, a].copy()  # (nq, n): coarse term
        for j in range(codes.shape[1]):
            adc += luts_[:, j, codes[:, j]]
        vids = df["vec_id"].to_numpy()
        qcol, vcol, scol = [], [], []
        for q in range(len(qids_)):
            idx = np.nonzero(probed_[a, q])[0]
            if not idx.size:
                continue
            keep = idx[np.argsort(-adc[q, idx])[:shortlist]]
            sims = np.round(m[keep] @ qn[q], 9)  # exact rerank, coded pruning
            qcol.append(np.full(keep.size, qids_[q], dtype=np.int64))
            vcol.append(vids[keep].astype(np.int64))
            scol.append(sims)
        if not qcol:
            return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        return pd.DataFrame({"qid": np.concatenate(qcol),
                             "vec_id": np.concatenate(vcol),
                             "sim": np.concatenate(scol)})

    cands = ds.map_batches(candidates, batch_format="pandas", batch_size=4096)
    return _grouped_topk(cands, 5)


def q_knn_ivfpq(sf_dir: str):
    """Catalog surface for IVF-PQ wrapped in the self-gating recall
    oracle: the full coded path (coarse lists + distributed-PQ residual
    codes + ADC shortlist + exact rerank) runs and its avg recall vs
    the exact top-5 is asserted in-query; the SQL-checkable exact rows
    + constant flag anchor the driver's value hash."""
    return _ann_recall_gate(sf_dir, _knn_ivfpq_ann(sf_dir), 0.5, "ivfpq_recall_ok")


SQL_KNN_IVFPQ = """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT q.qid, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 9) AS sim
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
  FROM s
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, TRUE AS ivfpq_recall_ok
FROM r WHERE rank <= 5
"""


# --------------------------------------------------------------- multimodal

def _media_payloads(sf_dir: str):
    """Deterministic fake media: every 5th doc gets a 6-frame 32x48
    uint8 'video' payload seeded by doc_id (binary column + metadata —
    the multimodal column convention, stages/multimodal.py)."""
    from .stages import multimodal as MM

    ds = _read(sf_dir, "documents", ["doc_id"])

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[df["doc_id"] % 5 == 0]
        payloads = []
        for d in sel["doc_id"]:
            rng = np.random.default_rng(1000 + int(d))
            payloads.append(
                MM.encode_frames(rng.integers(0, 256, (6, 32, 48), dtype=np.uint8)))
        return pd.DataFrame({"media_id": sel["doc_id"].astype("int64"),
                             "payload": payloads})

    return ds.map_batches(gen, batch_format="pandas")


def _media_pool() -> int:
    """Actor-pool size for multimodal stages: never reserve so many
    CPUs that stacked fixed pools starve the upstream read (a 2+2 pool
    chain on a 4-CPU cluster deadlocks the streaming executor)."""
    return max(1, _cpus(default=4) // 8)


def q_approx_distinct_orderkeys(sf_dir: str):
    """Approximate COUNT(DISTINCT l_orderkey) via HyperLogLog (4096
    registers, ~1.6% error): each batch emits one register array, the
    tiny final reduce is an elementwise max — distinct-counting with NO
    shuffle of the keys, the only viable shape at 100TB. For the
    correctness gate the EXACT distinct count is also computed the
    scalable way (per-batch unique -> bucketed per-bucket nunique ->
    O(buckets) sum) and the HLL estimate is asserted within its
    published tolerance — both columns are SQL-checkable, so the
    sketch gets a hard oracle row instead of rows-only."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey"])

    def regs(df: pd.DataFrame) -> pd.DataFrame:
        r = H.hll_registers(df["l_orderkey"].to_numpy(dtype=np.uint64))
        return pd.DataFrame({"regs": [r.tobytes()]})

    parts = ds.map_batches(regs, batch_format="pandas", batch_size=65536).to_pandas()
    merged = np.zeros(4096, dtype=np.uint8)
    for b in parts["regs"]:
        merged = H.hll_merge(merged, np.frombuffer(b, dtype=np.uint8))
    approx = int(round(H.hll_estimate(merged)))

    B = _pair_buckets()

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].unique()
        return pd.DataFrame({"k": k, "_b": k % B})

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [g["k"].nunique()]})

    counts = ds.map_batches(uniq, batch_format="pandas", batch_size=65536) \
               .groupby("_b").map_groups(bucket_count, batch_format="pandas").to_pandas()
    exact = int(counts["n"].sum())
    return pd.DataFrame({"exact_distinct": [exact],
                         "within_tol": [abs(approx - exact) <= 0.05 * exact]})


SQL_APPROX_DISTINCT_ORDERKEYS = """
SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
       TRUE AS within_tol
FROM lineitem
"""


def q_hll_overlap(sf_dir: str):
    """Sketch set algebra — the audience-overlap question (how many
    users were active BOTH in the first half of the month AND the
    second?) answered entirely from mergeable HLL register arrays:
    |A∩B| = est(A) + est(B) - est(A∪B), where the union sketch is the
    elementwise register max — the ONLY way to intersect distincts at
    10^12 scale without shuffling keys. Each leg's registers fold from
    per-batch partials of a FILTER-pushed scan (no second read of the
    other half's rows).

    Hard-oracle discipline (the approx_distinct pattern): the exact
    per-leg / union / intersection counts are also computed the
    scalable way (per-batch unique tagged by leg -> one by-key bucketed
    shuffle where a key's two leg flags meet -> O(buckets) partials),
    and the THREE sketch estimates are asserted within tolerance
    in-query (inclusion-exclusion compounds the per-sketch 1.6% error,
    so the intersection gate is proportionally wider). The
    SQL-checkable exact integers + constant flag are what the driver
    hashes."""
    cutoff = pd.Timestamp("2024-01-16")

    def leg_regs(flt) -> np.ndarray:
        ds = _read(sf_dir, "events", ["user_id", "ts"], filter=flt)

        def regs(df: pd.DataFrame) -> pd.DataFrame:
            r = H.hll_registers(df["user_id"].to_numpy(dtype=np.uint64))
            return pd.DataFrame({"regs": [r.tobytes()]})

        parts = ds.map_batches(regs, batch_format="pandas",
                               batch_size=65536).to_pandas()
        merged = np.zeros(4096, dtype=np.uint8)
        for b in parts["regs"]:
            merged = H.hll_merge(merged, np.frombuffer(b, dtype=np.uint8))
        return merged

    ra = leg_regs(pc.field("ts") < cutoff.to_datetime64())
    rb = leg_regs(pc.field("ts") >= cutoff.to_datetime64())
    ea = H.hll_estimate(ra)
    eb = H.hll_estimate(rb)
    eu = H.hll_estimate(H.hll_merge(ra, rb))
    ei = ea + eb - eu

    # exact legs/union/intersection via ONE bucketed pass over tagged
    # distinct (user, leg) partials — a user's two flags meet in its
    # bucket, so bucket-local set ops are global
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    B = _pair_buckets()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        leg = np.where(df["ts"].to_numpy() < cutoff.to_datetime64(),
                       "a", "b")
        out = pd.DataFrame({"u": u, "leg": leg}).drop_duplicates()
        return out.assign(_b=out["u"] % B)

    def bucket_sets(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["u", "leg"])
        piv = g.assign(one=1).pivot_table(index="u", columns="leg",
                                          values="one", fill_value=0)
        a = piv["a"].to_numpy() if "a" in piv else np.zeros(len(piv))
        b = piv["b"].to_numpy() if "b" in piv else np.zeros(len(piv))
        return pd.DataFrame({
            "n_a": [int(a.sum())], "n_b": [int(b.sum())],
            "n_union": [len(piv)], "n_both": [int(((a > 0) & (b > 0)).sum())],
        })

    tot = (ds.map_batches(tag, batch_format="pandas", batch_size=65536)
           .groupby("_b").map_groups(bucket_sets, batch_format="pandas")
           .to_pandas().sum())
    n_a, n_b = int(tot["n_a"]), int(tot["n_b"])
    n_union, n_both = int(tot["n_union"]), int(tot["n_both"])
    for est, exact, tol, what in ((ea, n_a, 0.05, "A"),
                                  (eb, n_b, 0.05, "B"),
                                  (eu, n_union, 0.05, "union"),
                                  (ei, n_both, 0.15, "intersection")):
        if exact > 0 and abs(est - exact) > tol * max(exact, 1):
            raise AssertionError(
                f"hll_overlap: {what} estimate {est:.0f} outside the "
                f"{tol:.0%} gate vs exact {exact}")
    return pd.DataFrame({
        "n_first_half": pd.Series([n_a], dtype="int64"),
        "n_second_half": pd.Series([n_b], dtype="int64"),
        "n_union": pd.Series([n_union], dtype="int64"),
        "n_both": pd.Series([n_both], dtype="int64"),
        "sketch_ok": [True],
    })


SQL_HLL_OVERLAP = """
WITH a AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts < TIMESTAMP '2024-01-16'
), b AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-16'
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_first_half,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_second_half,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT user_id FROM a UNION SELECT user_id FROM b))
         AS n_union,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT user_id FROM a INTERSECT SELECT user_id FROM b))
         AS n_both,
       TRUE AS sketch_ok
"""


def q_multimodal_image_stats(sf_dir: str):
    """Binary-payload decode + per-image features + resize as ONE
    streamed chain of actor-pool stages (warm setup in __init__, small
    batch_size for MB-scale rows): original-frame stats (payload kept
    on the row) -> 48x32 nearest-neighbour resize (payload in, payload
    out, same container) -> resized-frame stats under the r_ prefix —
    one row per media_id with both column sets, ONE scan of the
    payloads, no driver-side merge. Deterministic output; rows-only
    driver check."""
    from .stages import multimodal as MM

    conc = _media_pool()
    kw = dict(batch_format="pyarrow", batch_size=MM.MEDIA_BATCH_SIZE)
    # stats stages hold no warm state -> plain task-pool instances;
    # only the resize keeps the fixed actor pool. Stacking three FIXED
    # pools would reserve every CPU on small clusters and starve the
    # read (the streaming-executor deadlock documented in the repo
    # verify notes).
    out = (
        _media_payloads(sf_dir)
        .map_batches(MM.ImageStats(keep_payload=True), **kw)
        .map_batches(MM.ImageResize,
                     fn_constructor_kwargs={"target_h": 48, "target_w": 32,
                                            "dims_cols": False},
                     concurrency=conc, **kw)
        .map_batches(MM.ImageStats(prefix="r_"), **kw)
        .to_pandas()
    )
    assert (out["r_height"] == 48).all() and (out["r_width"] == 32).all()
    return out.sort_values("media_id").reset_index(drop=True)


def q_multimodal_audio_features(sf_dir: str):
    """Audio payload path: every 7th doc gets a deterministic synthetic
    PCM clip (seeded sine + noise, doc-dependent frequency/length);
    AudioFeatures extracts duration/RMS/zero-crossing-rate in an actor
    stage. Rows-only; determinism + feature sanity in unit tests."""
    from .stages import multimodal as MM

    ds = _read(sf_dir, "documents", ["doc_id"])

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[df["doc_id"] % 7 == 0]
        payloads = []
        for d in sel["doc_id"]:
            d = int(d)
            rng = np.random.default_rng(2000 + d)
            n = 4000 + (d % 5) * 1000
            f = 100.0 + (d % 13) * 25.0
            t = np.arange(n) / 16_000.0
            x = 0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.standard_normal(n)
            payloads.append(MM.encode_pcm((x * 32767).astype(np.int16)))
        return pd.DataFrame({"media_id": sel["doc_id"].astype("int64"),
                             "payload": payloads})

    out = ds.map_batches(gen, batch_format="pandas").map_batches(
        MM.AudioFeatures, batch_format="pyarrow",
        batch_size=MM.MEDIA_BATCH_SIZE, concurrency=_media_pool(),
    ).to_pandas()
    return out.sort_values("media_id").reset_index(drop=True)


def q_multimodal_frame_sample(sf_dir: str):
    """Frame sampling fan-out (1 video row -> ceil(6/4)=2 frame rows)
    through the FrameSampler actor stage — the media analogue of the
    pdf page fan-out. Deterministic; rows-only driver check."""
    from .stages import multimodal as MM

    conc = _media_pool()
    out = _media_payloads(sf_dir).map_batches(
        MM.FrameSampler, batch_format="pyarrow",
        batch_size=MM.MEDIA_BATCH_SIZE, concurrency=conc,
    )
    stats = out.map_batches(
        MM.ImageStats, batch_format="pyarrow",
        batch_size=MM.MEDIA_BATCH_SIZE, concurrency=conc,
    ).to_pandas()
    return stats.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def q_multimodal_features(sf_dir: str):
    """The three multimodal actor-stage pipelines (image stats+resize
    chain, audio feature extraction, video frame-sample fan-out) as ONE
    catalog row in long format: (kind, media_id, frame_idx, feature,
    value) — each sub-pipeline keeps its own wide schema internally
    (q_multimodal_image_stats / _audio_features / _frame_sample, still
    individually pinned in unit tests) and is melted to the common
    shape here. Deterministic synthetic payloads; rows-only driver
    check (binary decode stays env-gated, stages/multimodal.py)."""
    frames = []
    for kind, fn in (("image", q_multimodal_image_stats),
                     ("audio", q_multimodal_audio_features),
                     ("frame", q_multimodal_frame_sample)):
        df = fn(sf_dir)
        id_vars = ["media_id"] + (["frame_idx"] if "frame_idx" in df else [])
        keep = id_vars + [c for c in df.select_dtypes(include=[np.number]).columns
                          if c not in id_vars]
        num = df[keep].melt(id_vars=id_vars, var_name="feature", value_name="value")
        if "frame_idx" not in num:
            num["frame_idx"] = np.int64(-1)
        num["kind"] = kind
        frames.append(num[["kind", "media_id", "frame_idx", "feature", "value"]])
    out = pd.concat(frames, ignore_index=True).astype(
        {"media_id": "int64", "frame_idx": "int64", "value": "float64"})
    return out.sort_values(["kind", "media_id", "frame_idx", "feature"]) \
              .reset_index(drop=True)


# --------------------------------------------------------------- window functions / OLAP


def q_user_event_gaps(sf_dir: str):
    """Per-key LAG window: inter-event gaps per user — the distributed
    shape of SQL's ``ts - LAG(ts) OVER (PARTITION BY user ORDER BY
    ts)``. Users are hashed into _pair_buckets() shuffle partitions
    (same rationale as q_session_stats: one pandas group per USER is
    the shuffle-side bottleneck at millions of users; each bucket diffs
    thousands of users in ONE vectorized sort+shift pass). The gap
    multiset is invariant to tie order among equal timestamps, so both
    sides only need ORDER BY ts. Raw events shuffle exactly once,
    bucketed; output is O(users with >= 2 events)."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return pd.DataFrame({"user_id": u, "ts": df["ts"], "_b": u % B})

    def gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        same_user = g["user_id"].eq(g["user_id"].shift())
        # date_diff('second', ...) semantics: whole-second boundary
        # crossings (floor both endpoints first), as in q_session_stats
        gap = g["ts"].dt.floor("s").diff().dt.total_seconds().where(same_user)
        per = pd.DataFrame({"user_id": g["user_id"], "gap": gap}).dropna()
        out = per.groupby("user_id", as_index=False).agg(
            n_gaps=("gap", "size"), avg_gap_sec=("gap", "mean"),
            max_gap_sec=("gap", "max"))
        return pd.DataFrame({
            "user_id": out["user_id"].astype("int64"),
            "n_gaps": out["n_gaps"].astype("int64"),
            # integer-second gaps sum exactly in float64, so the mean is
            # bit-identical to the oracle's AVG(BIGINT) — emitted
            # UNROUNDED: with ~2^k gaps per user the mean often lands
            # exactly on a 4-decimal midpoint, where pandas (half-even)
            # and SQL ROUND (half-away) disagree
            "avg_gap_sec": out["avg_gap_sec"].astype(float),
            "max_gap_sec": out["max_gap_sec"].astype("int64"),
        })

    out = ds.map_batches(add_bucket, batch_format="pandas") \
            .groupby("_b").map_groups(gaps_bucket, batch_format="pandas").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


SQL_USER_EVENT_GAPS = """
WITH g AS (
  SELECT user_id,
         date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) AS gap
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       AVG(gap) AS avg_gap_sec,
       CAST(MAX(gap) AS BIGINT) AS max_gap_sec
FROM g WHERE gap IS NOT NULL GROUP BY user_id
"""


def q_ranked_orders(sf_dir: str):
    """Per-key ROW_NUMBER window: top-3 orders per customer by price
    with an explicit rank column. Every batch first prunes to its LOCAL
    per-customer top-3 (the global top-3 per key is a subset of the
    union of per-batch top-3s), so the shuffle carries <= 3 rows per
    (customer, batch) instead of the whole order table; the bucketed
    map_groups then ranks thousands of customers per bucket in one
    vectorized sort + cumcount. Rank is made total by breaking price
    ties on orderkey — required for a deterministic distributed window
    (an unordered tie would make the result shuffle-dependent)."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    B = _pair_buckets()
    ORDER = ["o_custkey", "o_totalprice", "o_orderkey"]
    ASC = [True, False, True]

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ORDER, ascending=ASC)
        df = df.groupby("o_custkey", sort=False).head(3)
        return df.assign(_b=df["o_custkey"].astype("int64") % B)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_b").sort_values(ORDER, ascending=ASC)
        rnk = g.groupby("o_custkey", sort=False).cumcount() + 1
        g = g.assign(rnk=rnk)[rnk <= 3]
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].astype("int64"),
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "o_totalprice": g["o_totalprice"].astype(float).round(2),
            "rnk": g["rnk"].astype("int64"),
        })

    out = ds.map_batches(local_top, batch_format="pandas") \
            .groupby("_b").map_groups(rank_bucket, batch_format="pandas").to_pandas()
    return out.sort_values(["o_custkey", "rnk"]).reset_index(drop=True)


SQL_RANKED_ORDERS = """
SELECT * FROM (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(o_orderkey AS BIGINT) AS o_orderkey,
         ROUND(o_totalprice, 2) AS o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def q_cumulative_revenue(sf_dir: str):
    """Running total over the date axis (SQL ``SUM(..) OVER (ORDER BY
    date)``) — the distributed prefix-sum shape: per-batch partial sums
    per date, bucketed combine to ONE row per date, then the cumulative
    sum runs over the O(distinct dates) aggregate — bounded, because a
    date axis grows with calendar time, not data volume (~2.4k rows
    here and still ~10k at 100 TB) — never over raw orders. Money is
    folded in integer cents so the 2,400-step running sum is exact (no
    float summation-order drift vs the oracle)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
    daily = _partial_group_sum(ds, ["o_orderdate"], {"rev": "o_totalprice"},
                               distributed=True)
    daily = daily.sort_values("o_orderdate").reset_index(drop=True)
    cents = np.round(daily["rev"].to_numpy(dtype=float) * 100).astype(np.int64)
    return pd.DataFrame({
        "o_orderdate": daily["o_orderdate"],
        "day_cents": cents,
        "cum_cents": np.cumsum(cents),
    })


SQL_CUMULATIVE_REVENUE = """
WITH d AS (
  SELECT o_orderdate,
         CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS day_cents
  FROM orders GROUP BY o_orderdate
)
SELECT o_orderdate, day_cents,
       CAST(SUM(day_cents) OVER (ORDER BY o_orderdate
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM d
"""


def q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): the base aggregate
    is computed distributed (per-batch partials over a provably tiny
    key space, _partial_group_sum), and every rollup level is DERIVED
    from the base rows — one scan of the raw table, subtotals cost
    O(groups). That is the only rollup shape that holds at 100 TB
    (never one scan per grouping set). Rolled-up dimensions use the
    'ALL' sentinel on both sides (the real domain is single chars)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_extendedprice"])
    base = _partial_group_sum(ds, ["l_returnflag", "l_linestatus"],
                              {"rev": "l_extendedprice"}, counts="n_items")
    lvl1 = base.groupby("l_returnflag", as_index=False).agg(
        rev=("rev", "sum"), n_items=("n_items", "sum"))
    lvl1["l_linestatus"] = "ALL"
    total = pd.DataFrame({"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
                          "rev": [base["rev"].sum()],
                          "n_items": [base["n_items"].sum()]})
    out = pd.concat([base, lvl1, total], ignore_index=True)
    out["rev"] = out["rev"].astype(float).round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "rev", "n_items"]] \
        .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_ROLLUP_REVENUE = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       ROUND(SUM(l_extendedprice), 2) AS rev,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_pivot_priority_by_segment(sf_dir: str):
    """PIVOT (cross-tab): order counts per market segment spread into
    one column per priority. Shape: per-batch partial counts per
    (custkey, priority) BEFORE the shuffle, one bucketed hash join with
    the customer dim (neither side broadcast), per-bucket reduce to
    (segment, priority) partials, then a tiny driver pivot. The wide
    layout is produced from an O(segments x priorities) aggregate —
    never by re-scanning the fact table once per pivot column."""
    B = _pair_buckets()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["o_custkey", "o_orderpriority"], as_index=False).size()
        k = g["o_custkey"].astype("int64")
        return pd.DataFrame({"key": k, "pri": g["o_orderpriority"],
                             "n": g["size"].astype("int64"),
                             "seg": "", "side": "o", "_b": k % B})

    def c_prep(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame({"key": k, "pri": "", "n": np.int64(0),
                             "seg": df["c_mktsegment"], "side": "c", "_b": k % B})

    both = orders.map_batches(o_prep, batch_format="pandas").union(
        cust.map_batches(c_prep, batch_format="pandas"))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["side"] == "o", ["key", "pri", "n"]]
        right = g.loc[g["side"] == "c", ["key", "seg"]]
        j = left.merge(right, on="key", how="inner")
        return j.groupby(["seg", "pri"], as_index=False)["n"].sum()

    parts = both.groupby("_b").map_groups(join_bucket, batch_format="pandas") \
                .to_pandas()
    agg = parts.groupby(["seg", "pri"], as_index=False)["n"].sum()
    wide = agg.pivot(index="seg", columns="pri", values="n") \
              .fillna(0).astype("int64").rename_axis(columns=None)
    colmap = {"1-URGENT": "n_urgent", "2-HIGH": "n_high",
              "3-MEDIUM": "n_medium", "4-NOT SPECIFIED": "n_notspec",
              "5-LOW": "n_low"}
    wide = wide.rename(columns=colmap).reset_index() \
               .rename(columns={"seg": "c_mktsegment"})
    cols = ["c_mktsegment", "n_urgent", "n_high", "n_medium", "n_notspec",
            "n_low"]
    for c in cols[1:]:
        if c not in wide:
            wide[c] = np.int64(0)
    return wide[cols].sort_values("c_mktsegment").reset_index(drop=True)


SQL_PIVOT_PRIORITY_BY_SEGMENT = """
SELECT c_mktsegment,
  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_props_field_stats(sf_dir: str):
    """Semi-structured field extraction: ``events.props`` holds a JSON
    string ('{"k": 87}'); the k field is pulled out with ONE
    compiled-regex vectorized pass per batch (pandas ``str.extract``,
    C regex engine — never ``json.loads`` per row in a hot path) and
    aggregated per event_type with the usual partial-then-combine.
    Integer sums stay exact in float64, so the mean is bit-identical
    to the oracle's AVG. Pure map-side: no shuffle of raw rows, the
    driver sees O(event_types) partials."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False),
            errors="coerce")
        # documented numeric envelope, enforced on BOTH sides: |k| must
        # be float64-exact (<= 2^53). The Python path extracts through
        # float64, so anything larger is lossy here even when it still
        # fits BIGINT — the oracle applies the same cutoff below so the
        # two sides NULL the same rows instead of silently diverging
        k = k.where(k.abs() <= np.float64(2**53))
        valid = k.notna()
        # sums accumulate in int64 (NaN rows masked to 0 and counted
        # separately), not float64: a float64 running sum can exceed
        # 2^53 and pick up order-dependent rounding even when every
        # VALUE is within the envelope, while the oracle's AVG over
        # BIGINT sums exactly. int64 itself wraps at 2^63, so the batch
        # is guarded too (sum of |k| bounded with 2x margin) — a wrap
        # raises instead of silently diverging
        if valid.any() and float(k.abs().sum()) >= float(2**62):
            raise AssertionError(
                "props_field_stats: batch |k| mass >= 2^62 — int64 partial "
                "sums could wrap; shrink batch_size or switch the query to "
                "hi/lo split accumulation"
            )
        return pd.DataFrame({
            "event_type": df["event_type"],
            "n_k": valid.astype("int64"),
            "sum_k": k.fillna(0).astype("int64"),
            "max_k": k,
        }).groupby("event_type", as_index=False) \
            .agg(n=("n_k", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max"))

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    # driver combine over O(event_types x batches) partials: Python-int
    # (arbitrary-precision) sums, so partial int64 sums can never wrap
    # silently in the fold
    out = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"),
        sum_k=("sum_k", lambda s: sum(int(v) for v in s)),
        max_k=("max_k", "max"))
    # rows without a "k" field coerce to NaN and drop out of n/sum/max;
    # an event_type with NO match anywhere would leave max_k=NaN, so it
    # is excluded on both sides (HAVING COUNT(k) > 0 in the oracle)
    out = out[out["n"] > 0]
    # total-sum envelope (the _micro_revenue discipline): the mean is
    # emitted through float64, so the TOTAL must be float64-exact too —
    # past this, emit (sum_k, n) columns instead of avg_k on both sides
    bad = out[[abs(int(v)) > 2**53 for v in out["sum_k"]]]
    if len(bad):
        raise AssertionError(
            f"props_field_stats: per-group sum_k exceeds the 2^53 float64 "
            f"envelope for {list(bad['event_type'])} — avg_k can no longer "
            "be emitted bit-exactly; switch the query to (sum_k, n) output"
        )
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n": out["n"].astype("int64"),
        # unrounded: exact integer sums make the mean bit-identical to
        # SQL AVG, and rounding would reintroduce the half-even vs
        # half-away midpoint mismatch (see q_user_event_gaps)
        "avg_k": out["sum_k"].astype("float64") / out["n"].astype("int64"),
        "max_k": out["max_k"].astype("int64"),
    }).sort_values("event_type").reset_index(drop=True)


SQL_PROPS_FIELD_STATS = """
WITH raw AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k0
  FROM events
), e AS (
  -- same float64-exact envelope the Python side enforces (|k| <= 2^53)
  SELECT event_type,
         CASE WHEN ABS(k0) <= 9007199254740992 THEN k0 END AS k
  FROM raw
)
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n,
       AVG(k) AS avg_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM e GROUP BY event_type
HAVING COUNT(k) > 0
"""


def q_orders_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: Bernoulli-by-hash with a
    per-stratum rate (1-in-5 of urgent orders, 1-in-20 of the rest)
    using a 32-bit multiplicative Knuth hash computed identically in
    numpy and ANSI SQL. Sampling becomes a pure stateless map_batches
    filter — no RNG state, no shuffle, and the sample is reproducible
    across cluster sizes, block layouts and checkpoint resumes (the
    property a 100 TB re-runnable pipeline needs; ds.random_sample()
    gives none of it). The key is pre-reduced mod 2^31 so the product
    stays inside BIGINT for the SQL side at any key scale."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderpriority", "o_totalprice"])
    M = np.uint64(2654435761)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(dtype=np.uint64)
        h = ((k % np.uint64(2**31)) * M) % np.uint64(2**32)
        urgent = (df["o_orderpriority"] == "1-URGENT").to_numpy()
        rate = np.where(urgent, np.uint64(5), np.uint64(20))
        out = df.loc[h % rate == 0,
                     ["o_orderkey", "o_orderpriority", "o_totalprice"]].copy()
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        out["o_totalprice"] = out["o_totalprice"].astype(float).round(2)
        return out

    out = ds.map_batches(pick, batch_format="pandas",
                         batch_size=65536).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


SQL_ORDERS_STRATIFIED_SAMPLE = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderpriority,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE (((o_orderkey % 2147483648) * 2654435761) % 4294967296)
      % (CASE WHEN o_orderpriority = '1-URGENT' THEN 5 ELSE 20 END) = 0
"""


def q_tfidf_top_terms(sf_dir: str):
    """TF-IDF relevance scoring: top-3 terms per document by
    tf * ln(N/df). Two bounded shuffles: (1) BY TERM — each (doc, term)
    tf row is unique, so a term's document frequency is just its
    bucket-local row count; df computation and score assignment happen
    in ONE map_groups with no separate join, and each bucket prunes to
    its per-doc local top-3 (the global top-3 is a subset of the union
    of per-bucket top-3s) before (2) BY DOC ranks the survivors. The
    per-bucket state is O(postings/B); the corpus count N comes from
    parquet metadata. Scores only ORDER the rows (rounded to 9 decimals
    on both sides so a 1-ulp ln() difference cannot flip a rank); the
    emitted columns are the integer-exact (tf, df, rank), with ties
    broken on term so the ranking is total."""
    import pyarrow.dataset as pads
    N = pads.dataset(os.path.join(sf_dir, "documents.parquet")).count_rows()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B = _pair_buckets()

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks_per = [TS.TOKEN_RE.findall(t.lower()) for t in df["text"]]
        lens = np.fromiter((len(t) for t in toks_per), dtype=np.int64,
                           count=len(toks_per))
        if int(lens.sum()) == 0:
            # dtypes must match the non-empty branch (int64 doc ids):
            # an object-typed empty frame becomes an Arrow null column
            # and can fail block-schema unification in the shuffle
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "term": pd.Series([], dtype="object"),
                                 "tf": pd.Series([], dtype="int64"),
                                 "_bt": pd.Series([], dtype="int64")})
        docs = np.repeat(df["doc_id"].to_numpy(), lens)
        terms = np.concatenate([np.asarray(t, dtype=object)
                                for t in toks_per if t])
        out = pd.DataFrame({"doc_id": docs, "term": terms}) \
            .groupby(["doc_id", "term"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        out["tf"] = out["tf"].astype("int64")
        h = pd.util.hash_pandas_object(out["term"], index=False).to_numpy()
        return out.assign(_bt=(h % B).astype("int64"))

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dfv = g.groupby("term")["term"].transform("size").to_numpy()
        score = np.round(g["tf"].to_numpy(dtype=float)
                         * np.log(N / dfv.astype(float)), 9)
        out = g.drop(columns="_bt").assign(df=dfv.astype("int64"),
                                           score=score)
        out = out.sort_values(["doc_id", "score", "term"],
                              ascending=[True, False, True])
        out = out.groupby("doc_id", sort=False).head(3)
        h = pd.util.hash_pandas_object(out["doc_id"], index=False).to_numpy()
        return out.assign(_bd=(h % B).astype("int64"))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="_bd").sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True])
        rnk = g.groupby("doc_id", sort=False).cumcount() + 1
        g = g.assign(rnk=rnk)[rnk <= 3]
        return pd.DataFrame({
            "doc_id": g["doc_id"],
            "term": g["term"],
            "tf": g["tf"].astype("int64"),
            "df": g["df"].astype("int64"),
            "rnk": g["rnk"].astype("int64"),
        })

    out = ds.map_batches(tf_rows, batch_format="pandas", batch_size=4096) \
            .groupby("_bt").map_groups(score_bucket, batch_format="pandas") \
            .groupby("_bd").map_groups(rank_bucket, batch_format="pandas") \
            .to_pandas()
    return out.sort_values(["doc_id", "rnk"]).reset_index(drop=True)


def q_profile_orders(sf_dir: str):
    """Dataset profiling: per-column row count, null count, EXACT
    distinct count, min and max over the orders numerics — the schema
    summary every ingestion pipeline runs before training. One scan:
    each batch emits O(cols) partial stat rows plus its per-column
    unique values (hash-bucketed by (col, value) so the exact distinct
    count shuffles deduplicated values, never raw rows — same shape as
    approx_distinct's exact gate); count/null/min/max fold on the
    driver at O(cols x batches). At 100 TB the HLL sketch
    (approx_distinct_orderkeys) is the cheaper distinct path; this is
    the exact-profile variant."""
    COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
    ds = _read(sf_dir, "orders", COLS)
    B = _pair_buckets()

    # TRULY one scan: a single map_batches emits BOTH kinds of partial
    # rows (a lazy Dataset consumed by two separate passes would
    # re-execute the read — the lazy double-execution pitfall). Stat
    # rows ride the same shuffle, keyed to their column's home bucket.
    def profile_batch(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in COLS:
            v = df[c]
            # float64 repr is injective, so distinct-of-repr ==
            # distinct-of-value (the strings never cross to the oracle)
            u = pd.Series(v.dropna().unique()).astype(str)
            h = pd.util.hash_pandas_object(c + "\x1f" + u, index=False)
            frames.append(pd.DataFrame({
                "col": c, "kind": "u", "val": u,
                "n": np.int64(0), "n_null": np.int64(0),
                "mn": np.nan, "mx": np.nan,
                "_b": (h.to_numpy() % B).astype("int64")}))
            frames.append(pd.DataFrame({
                "col": [c], "kind": ["s"], "val": [""],
                "n": [np.int64(len(v))],
                "n_null": [np.int64(v.isna().sum())],
                "mn": [float(v.min())], "mx": [float(v.max())],
                "_b": [np.int64(zlib.crc32(c.encode()) % B)]}))
        return pd.concat(frames, ignore_index=True)

    def bucket_reduce(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        u = g.loc[g["kind"] == "u"]
        if len(u):
            nd = u.groupby("col", as_index=False)["val"].nunique() \
                  .rename(columns={"val": "nd"})
            outs.append(nd.assign(kind="u", n=np.int64(0),
                                  n_null=np.int64(0), mn=np.nan, mx=np.nan))
        s = g.loc[g["kind"] == "s"]
        if len(s):
            st = s.groupby("col", as_index=False).agg(
                n=("n", "sum"), n_null=("n_null", "sum"),
                mn=("mn", "min"), mx=("mx", "max"))
            outs.append(st.assign(kind="s", nd=np.int64(0)))
        cols = ["col", "kind", "nd", "n", "n_null", "mn", "mx"]
        return pd.concat(outs, ignore_index=True)[cols]

    parts = (ds.map_batches(profile_batch, batch_format="pandas",
                            batch_size=65536)
             .groupby("_b").map_groups(bucket_reduce, batch_format="pandas")
             .to_pandas())
    agg = parts.loc[parts["kind"] == "s"].groupby("col", as_index=False).agg(
        n=("n", "sum"), n_null=("n_null", "sum"),
        mn=("mn", "min"), mx=("mx", "max"))
    nd = parts.loc[parts["kind"] == "u"].groupby(
        "col", as_index=False)["nd"].sum()
    # LEFT merge: an all-null column has no unique rows at all but the
    # oracle still reports it with n_distinct = 0
    out = agg.merge(nd, on="col", how="left")
    out["nd"] = out["nd"].fillna(0)
    return pd.DataFrame({
        "col": out["col"],
        "n": out["n"].astype("int64"),
        "n_null": out["n_null"].astype("int64"),
        "n_distinct": out["nd"].astype("int64"),
        "mn": out["mn"].astype(float),
        "mx": out["mx"].astype(float),
    }).sort_values("col").reset_index(drop=True)


SQL_PROFILE_ORDERS = """
SELECT 'o_custkey' AS col, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_custkey) AS DOUBLE) AS mn,
       CAST(MAX(o_custkey) AS DOUBLE) AS mx
FROM orders
UNION ALL
SELECT 'o_orderkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
       CAST(MIN(o_orderkey) AS DOUBLE), CAST(MAX(o_orderkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
FROM orders
"""


SQL_TFIDF_TOP_TERMS = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ROUND(tf.tf * LN((SELECT COUNT(*) FROM documents) * 1.0
                                     / df.df), 9) DESC,
                    tf.term) AS rnk
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rnk AS BIGINT) AS rnk
FROM scored WHERE rnk <= 3
"""


# ------------------------------------------------- advanced relational

def q_event_funnel(sf_dir: str):
    """Sequential-pattern (funnel) aggregate over the event stream:
    "did the user ever VIEW before a later PURCHASE?". The naive plan is
    an EXISTS self-join (O(views x purchases) pairs per user); this one
    uses the identity exists(view.ts < purchase.ts) <=> min(view ts) <
    max(purchase ts), so the whole funnel is a per-batch partial
    (user, min_view, max_purchase) aggregate + one bucketed combine
    whose per-bucket reducer collapses straight to counts — raw events
    never shuffle, the driver receives O(buckets) rows, and no pairwise
    join is ever formed. The event-type predicate is pushed into the
    parquet scan."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"],
               filter=pc.field("event_type").isin(["view", "purchase"]))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df.loc[df["event_type"] == "view"].groupby(
            "user_id", as_index=False).agg(min_view=("ts", "min"))
        p = df.loc[df["event_type"] == "purchase"].groupby(
            "user_id", as_index=False).agg(max_purchase=("ts", "max"))
        return v.merge(p, on="user_id", how="outer")

    def to_counts(g: pd.DataFrame) -> pd.DataFrame:
        # NaT comparisons are False, so converted needs no extra mask
        conv = g["min_view"] < g["max_purchase"]
        return pd.DataFrame({
            "n_viewers": [int(g["min_view"].notna().sum())],
            "n_purchasers": [int(g["max_purchase"].notna().sum())],
            "n_converted": [int(conv.sum())],
        })

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    per_bucket = _bucketed_combine(
        parts, ["user_id"], {"min_view": "min", "max_purchase": "max"},
        prune=to_counts)
    out = per_bucket.sum().to_frame().T
    nv = float(out.loc[0, "n_viewers"])
    # zero viewers -> NULL rate, matching SQL's NULL division semantics.
    # UNROUNDED exact integer division: both sides divide the same two
    # integers as doubles, so the bits match with no rounding-tie risk
    # (round() is half-to-even, SQL ROUND is half-away — a dyadic ratio
    # like 1/32 = .03125 would hash-mismatch if either side rounded).
    out["conversion_rate"] = (
        float(out.loc[0, "n_converted"]) / nv if nv else np.nan)
    for c in ["n_viewers", "n_purchasers", "n_converted"]:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SQL_EVENT_FUNNEL = """
WITH agg AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS min_view,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS max_purchase
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY user_id
)
SELECT CAST(COUNT(min_view) AS BIGINT) AS n_viewers,
       CAST(COUNT(max_purchase) AS BIGINT) AS n_purchasers,
       CAST(COUNT(CASE WHEN min_view < max_purchase THEN 1 END) AS BIGINT)
         AS n_converted,
       COUNT(CASE WHEN min_view < max_purchase THEN 1 END) * 1.0
         / COUNT(min_view) AS conversion_rate
FROM agg
"""


def q_nation_spend_outliers(sf_dir: str):
    """Join-back-to-group-aggregate pattern: customers whose lifetime
    spend exceeds 2x their NATION's average customer spend. Plan:
    (1) per-custkey spend = per-batch partials + bucketed combine,
    joined against the customer dim (custkey -> nationkey) INSIDE the
    same custkey-bucketed shuffle (tagged union, one exchange);
    (2) the per-customer dataset is materialized once (it is ~#customers
    rows — orders compressed by custkey — and is consumed twice);
    (3) nation averages are a per-batch partial + driver combine over
    25 nations, broadcast back via ray.put;
    (4) outlier filter + per-nation counts are another single partial
    pass. Driver state: O(nations). Prices are converted to INTEGER
    CENTS at the read (each o_totalprice is an exact cent quantity), so
    spend sums are exact int64 and the outlier predicate is the
    integer cross-multiplication spend_cents * n_nation >
    2 * total_cents_nation — no float rounding anywhere near a
    comparison, so summation order can never flip a borderline row
    (pandas' half-to-even vs SQL ROUND's half-away-from-zero disagree
    on exact half-cents, which matters the moment a rounded value feeds
    a predicate instead of just the output hash)."""
    B = _pair_buckets()
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def o_prep(t: pa.Table) -> pa.Table:
        # half_towards_infinity == SQL ROUND's half-away-from-zero for
        # these all-positive prices (pyarrow defaults to half-to-even,
        # which would diverge on an exact half-cent like 4000.125)
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        partial = (pa.table({"key": t["o_custkey"], "spend": cents})
                   .group_by("key").aggregate([("spend", "sum")]))
        key = partial["key"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "spend": pc.cast(partial["spend_sum"], pa.float64()),
            "nationkey": pa.nulls(partial.num_rows, pa.int64()),
        })

    def c_prep(t: pa.Table) -> pa.Table:
        key = t["c_custkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "spend": pa.nulls(t.num_rows, pa.float64()),
            "nationkey": pc.cast(t["c_nationkey"], pa.int64()),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dim = g.loc[g["nationkey"].notna(), ["key", "nationkey"]]
        spend = g.loc[g["nationkey"].isna()].groupby("key", as_index=False)[
            "spend"].sum()
        out = spend.merge(dim, on="key")  # inner: customers with orders
        # integer cents riding a float64 column are exact below 2^53
        out["spend"] = out["spend"].astype("int64")
        out["nationkey"] = out["nationkey"].astype("int64")
        return out[["key", "nationkey", "spend"]]

    percust = (
        orders.map_batches(o_prep, batch_format="pyarrow")
        .union(cust.map_batches(c_prep, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .materialize()
    )

    def nav_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("nationkey", as_index=False).agg(
            s=("spend", "sum"), n=("spend", "size"))

    nav = percust.map_batches(nav_partial, batch_format="pandas").to_pandas() \
        .groupby("nationkey", as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
    # predicate as integer cross-multiplication: spend * n > 2 * total
    nav_tbl = nav[["nationkey", "s", "n"]].astype("int64")
    thresholds = ray.put(nav_tbl)

    def outlier_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(ray.get(thresholds), on="nationkey")  # vectorized lookup
        hit = m.loc[m["spend"] * m["n"] > 2 * m["s"]]
        return hit.groupby("nationkey", as_index=False).agg(
            n_outliers=("key", "size"), max_spend=("spend", "max"))

    hits = percust.map_batches(outlier_partial, batch_format="pandas").to_pandas()
    hits = hits.groupby("nationkey", as_index=False).agg(
        n_outliers=("n_outliers", "sum"), max_spend=("max_spend", "max"))
    names = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = hits.merge(names, left_on="nationkey", right_on="n_nationkey")
    nav["avg_spend_cents"] = (nav["s"] // nav["n"]).astype("int64")
    out = out.merge(nav[["nationkey", "avg_spend_cents"]], on="nationkey")
    out["n_outliers"] = out["n_outliers"].astype("int64")
    # exact integer cents -> deterministic double on both sides
    out["max_spend"] = out["max_spend"].astype("int64") / 100.0
    return out[["n_name", "n_outliers", "max_spend", "avg_spend_cents"]] \
        .sort_values("n_name").reset_index(drop=True)


SQL_NATION_SPEND_OUTLIERS = """
WITH spend AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS spend_cents
  FROM orders GROUP BY o_custkey
), j AS (
  SELECT c_nationkey, spend_cents
  FROM spend JOIN customer ON c_custkey = o_custkey
), nav AS (
  SELECT c_nationkey, SUM(spend_cents) AS s, COUNT(*) AS n
  FROM j GROUP BY c_nationkey
)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_outliers,
       MAX(spend_cents) / 100.0 AS max_spend,
       CAST(MIN(s // n) AS BIGINT) AS avg_spend_cents
FROM j
JOIN nav USING (c_nationkey)
JOIN nation ON n_nationkey = c_nationkey
WHERE spend_cents * n > 2 * s
GROUP BY n_name
"""


def q_lost_customers(sf_dir: str):
    """Set-difference (EXCEPT) + join-back: customers who ordered in
    1996 but not in 1997, counted per market segment. Both order scans
    push their date window into the parquet read; each side emits
    per-batch DISTINCT custkeys (combiner), the difference and the
    segment lookup happen in ONE custkey-bucketed shuffle (three-way
    tagged union: side A keys, side B keys, customer dim), and each
    bucket collapses to per-segment partial counts — the driver only
    ever sees O(buckets x segments) rows."""
    B = _pair_buckets()

    def side(year: int, tag: str):
        lo = pd.Timestamp(f"{year}-01-01")
        hi = pd.Timestamp(f"{year + 1}-01-01")
        ds = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate") >= lo)
                          & (pc.field("o_orderdate") < hi))

        def prep(t: pa.Table) -> pa.Table:
            key = t["o_custkey"].combine_chunks().unique()
            return pa.table({
                "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
                "key": key,
                "side": pa.array([tag] * len(key)),
                "seg": pa.nulls(len(key), pa.string()),
            })

        return ds.map_batches(prep, batch_format="pyarrow")

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def c_prep(t: pa.Table) -> pa.Table:
        key = t["c_custkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "side": pa.array(["dim"] * t.num_rows),
            "seg": t["c_mktsegment"],
        })

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g.loc[g["side"] == "a", "key"].to_numpy(np.int64)
        b = g.loc[g["side"] == "b", "key"].to_numpy(np.int64)
        lost = np.setdiff1d(a, b)  # vectorized: this is the reduce hot path
        dim = g.loc[g["side"] == "dim"]
        hit = dim.loc[dim["key"].isin(lost)]
        return hit.groupby("seg", as_index=False).agg(n_lost=("key", "size"))

    parts = (
        side(1996, "a").union(side(1997, "b"))
        .union(cust.map_batches(c_prep, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(diff_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("seg", as_index=False).agg(n_lost=("n_lost", "sum"))
    out["n_lost"] = out["n_lost"].astype("int64")
    return out.rename(columns={"seg": "c_mktsegment"}) \
        .sort_values("c_mktsegment").reset_index(drop=True)


SQL_LOST_CUSTOMERS = """
WITH lost AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_lost
FROM lost JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q_nation_top_suppliers(sf_dir: str):
    """Ordered collect (array_agg/string_agg equivalent): per nation,
    the comma-joined names of its top-3 suppliers by account balance.
    Per-batch local top-3 per nation (the global top-3 is a subset of
    the union of local top-3s), bucketed combine keyed by nationkey
    re-prunes, and only O(nations x 3) rows reach the driver, where the
    ordered string join and the 25-row nation-name lookup happen."""

    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_name", "s_acctbal"])

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["s_acctbal", "s_name"], ascending=[False, True])
                  .groupby("s_nationkey", as_index=False).head(3))

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        return (g.drop(columns="_b")
                 .sort_values(["s_acctbal", "s_name"], ascending=[False, True])
                 .groupby("s_nationkey", as_index=False).head(3))

    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_b=(df["s_nationkey"].to_numpy() % B).astype("int64"))

    top = (
        sup.map_batches(local_top, batch_format="pandas", batch_size=65536)
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(bucket_top, batch_format="pandas")
        .to_pandas()
    )
    top = top.sort_values(["s_acctbal", "s_name"], ascending=[False, True])
    agg = top.groupby("s_nationkey", as_index=False).agg(
        top_suppliers=("s_name", ",".join), best_acctbal=("s_acctbal", "max"))
    agg["best_acctbal"] = agg["best_acctbal"].round(2)
    names = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(names, left_on="s_nationkey", right_on="n_nationkey")
    return out[["n_name", "top_suppliers", "best_acctbal"]] \
        .sort_values("n_name").reset_index(drop=True)


SQL_NATION_TOP_SUPPLIERS = """
WITH ranked AS (
  SELECT s_nationkey, s_name, s_acctbal,
         row_number() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal DESC, s_name) AS rn
  FROM supplier
)
SELECT n_name,
       string_agg(s_name, ',' ORDER BY rn) AS top_suppliers,
       ROUND(MAX(s_acctbal), 2) AS best_acctbal
FROM ranked JOIN nation ON n_nationkey = s_nationkey
WHERE rn <= 3
GROUP BY n_name
"""


def q_group_percentiles(sf_dir: str):
    """Exact multi-quantile per group (p25/p50/p75/p90 of events.value
    per event_type) by SIMULTANEOUS histogram narrowing: the driver
    holds one (lo, hi, rank) triple per (group, quantile) — O(groups x
    quantiles) state — and each pass is ONE map_batches emitting a
    512-bin partial histogram per still-open (group, quantile) range.
    Every percentile of every group narrows in the same scan, so the
    total cost stays O(passes) full scans no matter how many quantiles
    are requested — no per-group sort, no global sort, no
    materialization. Rank = ceil(q*n) (lower percentile), matching the
    SQL row_number oracle exactly, so values are bit-identical (they
    are actual data values, never interpolations)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    BINS = 512
    QS = [0.25, 0.5, 0.75, 0.9]

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type")["value"].agg(
            n="count", lo="min", hi="max").reset_index()

    parts = ds.map_batches(stats, batch_format="pandas",
                           batch_size=65536).to_pandas()
    agg = parts.groupby("event_type").agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    state: dict[tuple, list] = {}
    for grp, row in agg.iterrows():
        for q in QS:
            rank = int(np.ceil(q * row["n"]))
            state[(grp, q)] = [float(row["lo"]),
                               float(np.nextafter(row["hi"], np.inf)),
                               rank, False]

    for _ in range(6):
        open_keys = {k: (s[0], s[1]) for k, s in state.items() if not s[3]}
        if not open_keys:
            break
        # dedupe identical (grp, lo, hi) ranges — in pass 1 every
        # quantile of a group shares the full range, so ONE histogram
        # serves all of them (Qx less pass-1 CPU and shuffle volume)
        uniq: dict[tuple, list] = {}
        for (grp, q), (lo, hi) in open_keys.items():
            uniq.setdefault((grp, lo, hi), []).append(q)
        by_grp: dict[str, list] = {}
        range_qs: dict[tuple, list] = {}
        for uid, ((grp, lo, hi), qs) in enumerate(uniq.items()):
            by_grp.setdefault(grp, []).append((uid, lo, hi))
            range_qs[(grp, uid)] = qs
        bounds_ref = ray.put(by_grp)

        def hist(df: pd.DataFrame) -> pd.DataFrame:
            b = ray.get(bounds_ref)
            rows = []
            for grp, sub in df.groupby("event_type"):
                if grp not in b:
                    continue
                v_all = sub["value"].to_numpy()
                for uid, lo, hi in b[grp]:
                    v = v_all[(v_all >= lo) & (v_all < hi)]
                    h, _ = np.histogram(v, bins=np.linspace(lo, hi, BINS + 1))
                    rows.append((grp, uid, h.astype(np.int64).tobytes()))
            return pd.DataFrame(rows, columns=["grp", "uid", "h"]) if rows else \
                pd.DataFrame({"grp": pd.Series([], dtype="object"),
                              "uid": pd.Series([], dtype="int64"),
                              "h": pd.Series([], dtype="object")})

        hp = ds.map_batches(hist, batch_format="pandas",
                            batch_size=65536).to_pandas()
        for (grp, uid), qs in range_qs.items():
            total = np.zeros(BINS, dtype=np.int64)
            sel = (hp["grp"] == grp) & (hp["uid"] == uid)
            for buf in hp.loc[sel, "h"]:
                total += np.frombuffer(buf, dtype=np.int64)
            cum = np.cumsum(total)
            for q in qs:  # same histogram, each quantile's own rank
                lo, hi, rank, _ = state[(grp, q)]
                edges = np.linspace(lo, hi, BINS + 1)
                bin_i = int(np.searchsorted(cum, rank))
                new_rank = rank - (int(cum[bin_i - 1]) if bin_i else 0)
                done = bool(total[bin_i] <= 100_000)
                state[(grp, q)] = [float(edges[bin_i]),
                                   float(edges[bin_i + 1]), new_rank, done]

    ranges_ref = ray.put({k: (s[0], s[1]) for k, s in state.items()})

    def in_range(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ranges_ref)
        keep = []
        for grp, sub in df.groupby("event_type"):
            v = sub["value"].to_numpy()
            for q in QS:
                lo, hi = b[(grp, q)]
                kept = v[(v >= lo) & (v < hi)]
                keep.append(pd.DataFrame(
                    {"grp": grp, "q": q, "value": kept}))
        return pd.concat(keep, ignore_index=True) if keep else \
            pd.DataFrame({"grp": pd.Series([], dtype="object"),
                          "q": pd.Series([], dtype="float64"),
                          "value": pd.Series([], dtype="float64")})

    vals = ds.map_batches(in_range, batch_format="pandas").to_pandas()
    rows = []
    for (grp, q), s in sorted(state.items()):
        sel = (vals["grp"] == grp) & (vals["q"] == q)
        v = np.sort(vals.loc[sel, "value"].to_numpy())
        # UNROUNDED data value: a 4-decimal round would expose the
        # half-even (pandas) vs half-away (SQL ROUND) midpoint
        # divergence; the compare protocol rounds floats identically
        rows.append((grp, q, float(v[s[2] - 1])))
    return pd.DataFrame(rows, columns=["event_type", "q", "pctl_value"])


SQL_GROUP_PERCENTILES = """
WITH qs AS (SELECT unnest([0.25, 0.5, 0.75, 0.9]) AS q),
ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, q, value AS pctl_value
FROM ranked JOIN qs ON rn = CAST(CEIL(q * n) AS BIGINT)
"""


def q_price_quartile_stats(sf_dir: str):
    """Quantile-bucketed aggregation (NTILE-by-value shape): compute the
    EXACT global price quartile boundaries (q1/q2/q3 of o_totalprice,
    rank = ceil(q*n), same histogram-narrowing machinery as
    group_percentiles — O(passes) scans, O(quantiles) driver state),
    broadcast the three boundary VALUES, then one more pass assigns each
    order its quartile and partially aggregates count/revenue per
    bucket. Value-based bucketing (v <= boundary) rather than
    row-number NTILE so ties land deterministically on both sides —
    boundaries are actual data values, never interpolations, so the
    bucket predicate is bit-exact in SQL too."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])
    BINS = 512
    QS = [0.25, 0.5, 0.75]

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_totalprice"]
        return pd.DataFrame({"n": [len(v)], "lo": [v.min()], "hi": [v.max()]})

    parts = ds.map_batches(stats, batch_format="pandas",
                           batch_size=65536).to_pandas()
    n_all = int(parts["n"].sum())
    state: dict[float, list] = {}
    for q in QS:
        state[q] = [float(parts["lo"].min()),
                    float(np.nextafter(parts["hi"].max(), np.inf)),
                    int(np.ceil(q * n_all)), False]

    for _ in range(6):
        open_qs = {q: (s[0], s[1]) for q, s in state.items() if not s[3]}
        if not open_qs:
            break
        # one histogram per unique (lo, hi) — in pass 1 all three
        # quartiles share the full range
        uniq: dict[tuple, list] = {}
        for q, rng in open_qs.items():
            uniq.setdefault(rng, []).append(q)
        ranges = {uid: rng for uid, rng in enumerate(uniq)}
        range_qs = {uid: uniq[rng] for uid, rng in ranges.items()}
        bounds_ref = ray.put(ranges)

        def hist(df: pd.DataFrame) -> pd.DataFrame:
            b = ray.get(bounds_ref)
            v_all = df["o_totalprice"].to_numpy()
            rows = []
            for uid, (lo, hi) in b.items():
                v = v_all[(v_all >= lo) & (v_all < hi)]
                h, _ = np.histogram(v, bins=np.linspace(lo, hi, BINS + 1))
                rows.append((uid, h.astype(np.int64).tobytes()))
            return pd.DataFrame(rows, columns=["uid", "h"])

        hp = ds.map_batches(hist, batch_format="pandas",
                            batch_size=65536).to_pandas()
        for uid, qs in range_qs.items():
            total = np.zeros(BINS, dtype=np.int64)
            for buf in hp.loc[hp["uid"] == uid, "h"]:
                total += np.frombuffer(buf, dtype=np.int64)
            cum = np.cumsum(total)
            for q in qs:
                lo, hi, rank, _ = state[q]
                edges = np.linspace(lo, hi, BINS + 1)
                bin_i = int(np.searchsorted(cum, rank))
                new_rank = rank - (int(cum[bin_i - 1]) if bin_i else 0)
                state[q] = [float(edges[bin_i]), float(edges[bin_i + 1]),
                            new_rank, bool(total[bin_i] <= 100_000)]

    ranges_ref = ray.put({q: (s[0], s[1]) for q, s in state.items()})

    def in_range(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ranges_ref)
        v_all = df["o_totalprice"].to_numpy()
        rows = []
        for q, (lo, hi) in b.items():
            rows.append(pd.DataFrame(
                {"q": q, "value": v_all[(v_all >= lo) & (v_all < hi)]}))
        return pd.concat(rows, ignore_index=True)

    vals = ds.map_batches(in_range, batch_format="pandas").to_pandas()
    bounds = []
    for q in QS:
        v = np.sort(vals.loc[vals["q"] == q, "value"].to_numpy())
        bounds.append(float(v[state[q][2] - 1]))
    b1, b2, b3 = bounds  # actual data values -> exact comparisons

    def bucket_agg(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_totalprice"].to_numpy()
        quart = np.select([v <= b1, v <= b2, v <= b3], [1, 2, 3], default=4)
        return pd.DataFrame({"quartile": quart, "v": v}).groupby(
            "quartile", as_index=False).agg(n=("v", "size"), rev=("v", "sum"))

    agg = ds.map_batches(bucket_agg, batch_format="pandas",
                         batch_size=65536).to_pandas()
    out = agg.groupby("quartile", as_index=False).agg(
        n=("n", "sum"), rev=("rev", "sum"))
    out["rev"] = out["rev"].round(2)
    out["n"] = out["n"].astype("int64")
    out["quartile"] = out["quartile"].astype("int64")
    return out.sort_values("quartile").reset_index(drop=True)


SQL_PRICE_QUARTILE_STATS = """
WITH ranked AS (
  SELECT o_totalprice AS v,
         row_number() OVER (ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
), b AS (
  SELECT MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN v END) AS b1,
         MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN v END) AS b2,
         MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN v END) AS b3
  FROM ranked
)
SELECT CASE WHEN o_totalprice <= b1 THEN 1
            WHEN o_totalprice <= b2 THEN 2
            WHEN o_totalprice <= b3 THEN 3
            ELSE 4 END AS quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS rev
FROM orders, b
GROUP BY 1
"""


def q_monthly_revenue_growth(sf_dir: str):
    """Time-series resample + growth: monthly order revenue with
    month-over-month growth. One pyarrow pass does the cents conversion
    (half_towards_infinity — matches SQL ROUND for positive prices),
    the month floor (``floor_temporal``) and a per-batch partial sum;
    the driver combines O(months) rows and computes the LAG growth as
    an exact-integer difference divided as doubles — the same two
    integers divide on both sides, so the bits match with no rounding
    anywhere."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        month = pc.floor_temporal(t["o_orderdate"], unit="month")
        return (pa.table({"m": month, "c": cents})
                .group_by("m").aggregate([("c", "sum")]))

    parts = ds.map_batches(prep, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("m", as_index=False)["c_sum"].sum().sort_values("m") \
               .reset_index(drop=True)
    c = agg["c_sum"].to_numpy(np.int64)
    growth = np.full(len(c), np.nan)
    if len(c) > 1:
        growth[1:] = (c[1:] - c[:-1]) / c[:-1].astype(np.float64)
    return pd.DataFrame({"month": agg["m"], "revenue": c / 100.0,
                         "growth": growth})


SQL_MONTHLY_REVENUE_GROWTH = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
  FROM orders GROUP BY 1
)
SELECT month, c / 100.0 AS revenue,
       (c - LAG(c) OVER (ORDER BY month)) * 1.0
         / LAG(c) OVER (ORDER BY month) AS growth
FROM m
"""


def q_local_supplier_revenue(sf_dir: str, _broadcast_max: int | None = None):
    """TPC-H Q5 shape: revenue per nation from 1996 orders where the
    SUPPLIER is in the CUSTOMER's nation — a star-schema join across
    four tables with a correlation predicate. Plan: (1) orders (date
    window pushed into the scan) resolve their customer's nation in one
    custkey-bucketed shuffle; (2) lineitem resolves its supplier's
    nation via the guarded broadcast (probe + bucketed fallback, the
    q_large_part_items pattern — supplier is the smallest dim) and
    partially aggregates revenue per (orderkey, s_nation) BEFORE the
    exchange; (3) both streams meet in one orderkey-bucketed shuffle
    where the c_nation == s_nation filter and per-nation partials
    happen; the driver combines O(nations) rows. Two bounded bucketed
    shuffles total (three in the fallback), nothing driver-side scales
    with any fact table.

    Revenue is computed in EXACT integer micro-dollars
    (cents x basis-points: ext and disc are 2- and 4-decimal
    quantities, so ext*(1-disc) sums land exactly on half-cents and
    ROUND(...,2) ties ~10% of the time between pandas half-even and SQL
    half-away — observed live). The output divides the same exact
    integer by 1e6 on both sides: bit-identical, no rounding step."""
    budget = _BROADCAST_MAX_KEYS if _broadcast_max is None else _broadcast_max
    B = _pair_buckets()
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate") >= lo)
                          & (pc.field("o_orderdate") < hi))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    # ---- stage 1: orderkey -> customer nation (custkey-bucketed join)
    def o_prep(t: pa.Table) -> pa.Table:
        key = t["o_custkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key, "okey": t["o_orderkey"],
            "nat": pa.nulls(t.num_rows, pa.int64()),
        })

    def c_prep(t: pa.Table) -> pa.Table:
        key = t["c_custkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key, "okey": pa.nulls(t.num_rows, pa.int64()),
            "nat": pc.cast(t["c_nationkey"], pa.int64()),
        })

    def cust_join(g: pd.DataFrame) -> pd.DataFrame:
        dim = g.loc[g["nat"].notna(), ["key", "nat"]]
        fact = g.loc[g["nat"].isna(), ["key", "okey"]]
        m = fact.merge(dim, on="key")
        okey = m["okey"].to_numpy(np.int64)
        # rev placeholder stays int64 (0, not NaN): a float placeholder
        # would promote the l-side's exact integer micro-dollars to
        # float64 through the union, losing exactness past 2^53
        return pd.DataFrame({
            "bucket2": (okey & (B - 1)).astype("int32"), "okey": okey,
            "nat": m["nat"].to_numpy(np.int64), "rev": np.int64(0),
            "side": "o"})

    o_nat = (orders.map_batches(o_prep, batch_format="pyarrow")
             .union(cust.map_batches(c_prep, batch_format="pyarrow"))
             .groupby("bucket").map_groups(cust_join, batch_format="pandas"))

    # ---- stage 2: lineitem revenue partials keyed (orderkey, s_nation)
    def li_partial(df: pd.DataFrame, snat: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(snat, left_on="l_suppkey", right_on="s_suppkey")
        m["rev"] = _micro_revenue_np(m["l_extendedprice"].to_numpy(),
                                     m["l_discount"].to_numpy())
        p = m.groupby(["l_orderkey", "s_nationkey"], as_index=False)["rev"].sum()
        okey = p["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket2": (okey & (B - 1)).astype("int32"), "okey": okey,
            "nat": p["s_nationkey"].to_numpy(np.int64),
            "rev": p["rev"].to_numpy(), "side": "l"})

    probe = sup.limit(budget + 1).to_pandas()
    if len(probe) <= budget:
        snat_ref = ray.put(probe)
        l_nat = li.map_batches(
            lambda df: li_partial(df, ray.get(snat_ref)),
            batch_format="pandas", batch_size=65536)
    else:
        # bucketed suppkey join first (third bounded shuffle)
        # both sides emit the SAME column order: Ray warns on unions
        # whose blocks disagree on schema order, and only pandas'
        # name-alignment keeps it working today
        def s_prep(df: pd.DataFrame) -> pd.DataFrame:
            k = df["s_suppkey"].astype("int64")
            return pd.DataFrame({"bucket": (k % B).astype("int32"),
                                 "l_suppkey": k, "l_orderkey": np.int64(-1),
                                 "l_extendedprice": np.nan,
                                 "l_discount": df["s_nationkey"].astype("float64"),
                                 "side": "s"})

        def l_prep(df: pd.DataFrame) -> pd.DataFrame:
            k = df["l_suppkey"].astype("int64")
            return df.assign(bucket=(k % B).astype("int32"), side="l")[
                ["bucket", "l_suppkey", "l_orderkey",
                 "l_extendedprice", "l_discount", "side"]]

        def sup_join(g: pd.DataFrame) -> pd.DataFrame:
            dim = g.loc[g["side"] == "s", ["l_suppkey", "l_discount"]] \
                   .rename(columns={"l_suppkey": "s_suppkey",
                                    "l_discount": "s_nationkey"})
            dim["s_nationkey"] = dim["s_nationkey"].astype("int64")
            fact = g.loc[g["side"] == "l"]
            return li_partial(fact, dim)

        l_nat = (li.map_batches(l_prep, batch_format="pandas", batch_size=65536)
                 .union(sup.map_batches(s_prep, batch_format="pandas"))
                 .groupby("bucket").map_groups(sup_join, batch_format="pandas"))

    # ---- stage 3: correlate c_nation == s_nation per orderkey
    def correlate(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == "o", ["okey", "nat"]]
        l = g.loc[g["side"] == "l", ["okey", "nat", "rev"]]
        m = l.merge(o, on=["okey", "nat"])  # equal nation AND same order
        return m.groupby("nat", as_index=False)["rev"].sum()

    parts = (o_nat.union(l_nat).repartition(max(8, _cpus()))
             .groupby("bucket2").map_groups(correlate, batch_format="pandas")
             .to_pandas())
    agg = parts.groupby("nat", as_index=False)["rev"].sum()
    names = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = agg.merge(names, left_on="nat", right_on="n_nationkey")
    # same exact integer / same power of ten on both sides -> same bits
    out["revenue"] = out["rev"].astype("int64") / 1000000.0
    return out[["n_name", "revenue"]].sort_values("n_name") \
        .reset_index(drop=True)


SQL_LOCAL_SUPPLIER_REVENUE = """
SELECT n_name,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
         / 1000000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_centroid_split_drift(sf_dir: str):
    """Per-label centroid drift between the two vec_id-parity halves of
    the corpus — the embedding-health check run after any resharding or
    re-embedding job (halves of an i.i.d. corpus must agree; a label
    whose halves disagree marks an embedding-version mix or a skewed
    shard). Same blob-riding (sum-vector, count) partials as
    :func:`q_label_centroids`, one per (label, half) per batch; the
    driver folds O(labels x 2 x dim) state and emits the L2 distance
    between the two ROUND-6 centroids (rounding BEFORE the distance
    makes both engines consume identical inputs; the 64-term sum-order
    slack dies in the final round-6)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        half = (df["vec_id"].astype("int64") % 2).to_numpy()
        rows = []
        for (lab, h), sub in df.assign(_h=half).groupby(["label", "_h"]):
            m = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
            rows.append((int(lab), int(h), m.sum(axis=0).tobytes(),
                         len(sub)))
        return pd.DataFrame(rows, columns=["label", "h", "s", "n"])

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=8192).to_pandas()
    cents, counts = {}, {}
    for (lab, h), sub in parts.groupby(["label", "h"]):
        s = np.sum([np.frombuffer(b, dtype=np.float64)
                    for b in sub["s"]], axis=0)
        n = int(sub["n"].sum())
        cents[(int(lab), int(h))] = (s / n).round(6)
        counts[(int(lab), int(h))] = n
    rows = []
    for lab in sorted({k[0] for k in cents}):
        if (lab, 0) not in cents or (lab, 1) not in cents:
            continue
        d = cents[(lab, 0)] - cents[(lab, 1)]
        rows.append((lab, counts[(lab, 0)], counts[(lab, 1)],
                     round(float(np.sqrt(np.sum(d * d))), 6)))
    out = pd.DataFrame(rows, columns=["label", "n_even", "n_odd",
                                      "drift"])
    for c in ("label", "n_even", "n_odd"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SQL_CENTROID_SPLIT_DRIFT = """
WITH e AS (
  SELECT label, vec_id % 2 AS h, unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
), c AS (
  SELECT label, h, dim, ROUND(AVG(v), 6) AS centroid,
         COUNT(*) AS nv
  FROM e GROUP BY label, h, dim
), n AS (
  SELECT label, vec_id % 2 AS h, CAST(COUNT(*) AS BIGINT) AS n
  FROM embeddings GROUP BY label, vec_id % 2
), d AS (
  SELECT a.label,
         ROUND(sqrt(SUM((a.centroid - b.centroid)
                        * (a.centroid - b.centroid))), 6) AS drift
  FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim
   AND a.h = 0 AND b.h = 1
  GROUP BY a.label
)
SELECT CAST(d.label AS BIGINT) AS label,
       ne.n AS n_even, no.n AS n_odd, d.drift
FROM d JOIN n ne ON ne.label = d.label AND ne.h = 0
       JOIN n no ON no.label = d.label AND no.h = 1
"""


def q_label_centroids(sf_dir: str):
    """Vector aggregate over the embedding column: per-label centroid
    (the building block for k-means init, class prototypes, and
    per-source drift monitoring). Each batch emits ONE (sum-vector,
    count) partial per label — numpy float64 accumulation over the
    stacked float32 vectors, the vector riding the shuffle as a single
    binary blob — and the driver folds O(labels x dim) state, never
    rows. Output long-format (label, dim, centroid) so the SQL oracle
    can unnest and AVG the same elements.

    Rounding-risk note: unlike the revenue queries (whose 2/4-decimal
    quanta make sums land EXACTLY on rounding boundaries), centroids of
    arbitrary float32 noise hit a 0.5e-6 boundary only by measure-zero
    coincidence — relative sum-order error ~1e-15 on ~1e-2 magnitudes
    gives a per-element collision probability ~1e-11 over a FIXED
    labels x dim = 640 grid (independent of corpus size), so round(6)
    on both sides is safe here."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lab, sub in df.groupby("label"):
            m = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
            rows.append((lab, m.sum(axis=0).tobytes(), len(sub)))
        return pd.DataFrame(rows, columns=["label", "s", "n"])

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=8192).to_pandas()
    out_rows = []
    for lab, sub in parts.groupby("label"):
        s = np.sum([np.frombuffer(b, dtype=np.float64) for b in sub["s"]],
                   axis=0)
        c = (s / int(sub["n"].sum())).round(6)
        out_rows.extend((int(lab), i + 1, v) for i, v in enumerate(c))
    out = pd.DataFrame(out_rows, columns=["label", "dim", "centroid"])
    out["dim"] = out["dim"].astype("int64")
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


SQL_LABEL_CENTROIDS = """
WITH e AS (
  SELECT label, unnest(embedding)::DOUBLE AS v,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
)
SELECT label, CAST(dim AS BIGINT) AS dim, ROUND(AVG(v), 6) AS centroid
FROM e GROUP BY label, dim
"""


def q_event_minute_gaps(sf_dir: str):
    """Calendar-spine gap fill: which MINUTES of 2024-01-15 saw zero
    events — the missing-time-bucket detection every time-series
    pipeline needs before resampling (an aggregate over observed data
    can't see what isn't there). The fact scan is one pushed-down
    distinct-buckets pass (O(minutes) rows per batch); the 1440-minute
    spine lives on the DRIVER (O(spine), never shuffled) and the
    anti-join against observed minutes is an index difference. Output:
    per hour, the number of silent minutes and the first one."""
    lo, hi = pd.Timestamp("2024-01-15"), pd.Timestamp("2024-01-16")
    ds = _read(sf_dir, "events", ["ts"],
               filter=(pc.field("ts") >= lo) & (pc.field("ts") < hi))

    def minutes(t: pa.Table) -> pa.Table:
        m = pc.floor_temporal(t["ts"], unit="minute")
        return pa.table({"m": m}).group_by("m").aggregate([])  # distinct

    seen = ds.map_batches(minutes, batch_format="pyarrow").to_pandas()
    seen_m = pd.to_datetime(seen["m"].unique())
    spine = pd.date_range(lo, hi - pd.Timedelta(minutes=1), freq="min")
    missing = spine.difference(seen_m)
    if len(missing) == 0:
        return pd.DataFrame({"hour": pd.Series([], dtype="datetime64[us]"),
                             "n_gap_minutes": pd.Series([], dtype="int64"),
                             "first_gap": pd.Series([], dtype="datetime64[us]")})
    m = pd.DataFrame({"hour": missing.floor("h"), "first_gap": missing})
    out = m.groupby("hour", as_index=False).agg(
        n_gap_minutes=("first_gap", "size"), first_gap=("first_gap", "min"))
    out["n_gap_minutes"] = out["n_gap_minutes"].astype("int64")
    return out[["hour", "n_gap_minutes", "first_gap"]] \
        .sort_values("hour").reset_index(drop=True)


SQL_EVENT_MINUTE_GAPS = """
WITH spine AS (
  SELECT CAST(m AS TIMESTAMP) AS minute
  FROM generate_series(TIMESTAMP '2024-01-15 00:00:00',
                       TIMESTAMP '2024-01-15 23:59:00',
                       INTERVAL 1 MINUTE) t(m)
), seen AS (
  SELECT DISTINCT date_trunc('minute', ts) AS minute
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
)
SELECT date_trunc('hour', minute) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_gap_minutes,
       MIN(minute) AS first_gap
FROM spine ANTI JOIN seen USING (minute)
GROUP BY 1
"""


def q_segment_revenue_share(sf_dir: str):
    """Percent-of-total window (ratio to the grand total): each market
    segment's share of total order revenue. One custkey-bucketed join
    (orders partially pre-aggregated to exact integer cents per
    custkey before the exchange), per-bucket collapse to per-segment
    partials, O(segments) driver combine — the grand total is derived
    from the same per-segment exact integers, so share = seg/total is
    the SAME two integers dividing on both sides (no rounding, no
    second scan for the denominator)."""
    B = _pair_buckets()
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def o_prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)),
                     round_mode="half_towards_infinity"), pa.int64())
        partial = (pa.table({"key": t["o_custkey"], "cents": cents})
                   .group_by("key").aggregate([("cents", "sum")]))
        key = partial["key"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "cents": partial["cents_sum"],
            "seg": pa.nulls(partial.num_rows, pa.string()),
        })

    def c_prep(t: pa.Table) -> pa.Table:
        key = t["c_custkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "cents": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "seg": t["c_mktsegment"],
        })

    def seg_partial(g: pd.DataFrame) -> pd.DataFrame:
        dim = g.loc[g["seg"].notna(), ["key", "seg"]]
        fact = g.loc[g["seg"].isna()].groupby("key", as_index=False)[
            "cents"].sum()
        j = fact.merge(dim, on="key")
        return j.groupby("seg", as_index=False)["cents"].sum()

    parts = (orders.map_batches(o_prep, batch_format="pyarrow")
             .union(cust.map_batches(c_prep, batch_format="pyarrow"))
             .groupby("bucket").map_groups(seg_partial, batch_format="pandas")
             .to_pandas())
    out = parts.groupby("seg", as_index=False)["cents"].sum()
    out["cents"] = out["cents"].astype("int64")
    total = int(out["cents"].sum())
    out["revenue"] = out["cents"] / 100.0
    out["share"] = out["cents"] / np.float64(total)
    return out.rename(columns={"seg": "c_mktsegment"})[
        ["c_mktsegment", "revenue", "share"]] \
        .sort_values("c_mktsegment").reset_index(drop=True)


SQL_SEGMENT_REVENUE_SHARE = """
WITH seg AS (
  SELECT c_mktsegment,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       cents / 100.0 AS revenue,
       cents * 1.0 / (SELECT SUM(cents) FROM seg) AS share
FROM seg
"""


def q_corpus_prep(sf_dir: str):
    """The composed training-data-prep pipeline as ONE catalog entry:
    quality gate -> exact-dedup keeper selection -> split carving ->
    per-split corpus accounting, reusing the exact kernels of
    `text_quality` (tokenizer), `dedup_exact` (md5 keeper) and
    `dataset_splits` (hash-range carving). Pass 1 is one streamed
    map_batches that hashes, tokenizes, carves and quality-flags each
    doc and collapses to per-(hash) partials (a doc's duplicates share
    text, hence token count AND split — groups never straddle splits);
    the only shuffle is the hash-bucketed combine, whose per-bucket
    reducer immediately collapses to per-split counters, so the driver
    receives O(buckets x splits) rows. Output: per split, docs seen /
    docs passing quality / dedup keepers among them / total keeper
    tokens — the numbers a corpus-carving run reports."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(t.encode()).hexdigest() for t in df["text"]]
        first = pd.Series([x[0] for x in h])
        split = np.where(first.isin(["d", "e"]), "val",
                         np.where(first == "f", "test", "train"))
        tok = TS.token_count(df["text"])
        tmp = pd.DataFrame({"h": h, "split": split, "tok": tok,
                            "ok": (tok >= 30).astype(int)})
        return tmp.groupby("h", as_index=False).agg(
            split=("split", "first"), tok=("tok", "first"),
            n_docs=("ok", "size"), n_ok=("ok", "sum"))

    def to_split_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(
            n_kept=(g["n_ok"] > 0).astype(int),
            kept_tokens=np.where(g["n_ok"] > 0, g["tok"], 0))
        return g.groupby("split", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_quality=("n_ok", "sum"),
            n_kept=("n_kept", "sum"), kept_tokens=("kept_tokens", "sum"))

    parts = ds.map_batches(pass1, batch_format="pandas", batch_size=8192)
    per_bucket = _bucketed_combine(
        parts, ["h"],
        {"split": "first", "tok": "first", "n_docs": "sum", "n_ok": "sum"},
        prune=to_split_counts)
    out = per_bucket.groupby("split", as_index=False).agg(
        n_docs=("n_docs", "sum"), n_quality=("n_quality", "sum"),
        n_kept=("n_kept", "sum"), kept_tokens=("kept_tokens", "sum"))
    for c in ["n_docs", "n_quality", "n_kept", "kept_tokens"]:
        out[c] = out[c].astype("int64")
    return out.sort_values("split").reset_index(drop=True)


SQL_CORPUS_PREP = """
WITH q AS (
  SELECT md5(text) AS h,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
         CASE WHEN substr(md5(text), 1, 1) IN ('d','e') THEN 'val'
              WHEN substr(md5(text), 1, 1) = 'f' THEN 'test'
              ELSE 'train' END AS split
  FROM documents
), per_hash AS (
  SELECT h, MIN(split) AS split, MIN(tok) AS tok, COUNT(*) AS n_docs,
         SUM(CASE WHEN tok >= 30 THEN 1 ELSE 0 END) AS n_ok
  FROM q GROUP BY h
)
SELECT split,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(n_ok) AS BIGINT) AS n_quality,
       CAST(SUM(CASE WHEN n_ok > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN n_ok > 0 THEN tok ELSE 0 END) AS BIGINT)
         AS kept_tokens
FROM per_hash GROUP BY split
"""


# single source of truth for both the Ray loop and the generated SQL —
# a drift between them would desynchronize the oracle silently
_PAGERANK_ITERS = 4
_PAGERANK_DAMPING = 0.85


def _cs_pairs(sf_dir: str, B: int, W: int,
              counted: bool = False) -> ray.data.Dataset:
    """Shared edge builder for every graph operator over the
    customer–supplier bipartite graph (pagerank / ppr / BFS /
    Bellman-Ford / HITS — one implementation, five consumers): the
    DISTINCT node-encoded pairs (c = custkey*2, s = suppkey*2+1 — int64
    shuffle keys) from orders |><| lineitem via ONE orderkey-bucketed
    join with per-bucket combiners, then a pair-bucketed global
    distinct. ``counted=True`` additionally carries n = the pair's
    DISTINCT order count (disjoint orderkey buckets make the partial
    nunique sums exact). Lazy — callers decide where to materialize.
    Columns: (pb, c, s[, n])."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def o_prep(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "val": pc.cast(t["o_custkey"], pa.int64()),
            "side": pa.array(["o"] * t.num_rows),
        })

    def l_prep(t: pa.Table) -> pa.Table:
        d = (pa.table({"key": t["l_orderkey"], "val": t["l_suppkey"]})
             .group_by(["key", "val"]).aggregate([]))
        key = d["key"]
        return pa.table({
            "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int32()),
            "key": key,
            "val": pc.cast(d["val"], pa.int64()),
            "side": pa.array(["l"] * d.num_rows),
        })

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == "o", ["key", "val"]].rename(
            columns={"val": "cust"})
        l = g.loc[g["side"] == "l", ["key", "val"]].rename(
            columns={"val": "supp"})
        m = o.merge(l, on="key")
        if counted:
            p = m.groupby(["cust", "supp"], as_index=False) \
                .agg(n=("key", "nunique"))
        else:
            p = m[["cust", "supp"]].drop_duplicates()
        c = (p["cust"].to_numpy() * 2).astype(np.int64)
        s = (p["supp"].to_numpy() * 2 + 1).astype(np.int64)
        pb = ((c * np.int64(1000003)) ^ s) & (B - 1)
        out = {"pb": pb.astype("int32"), "c": c, "s": s}
        if counted:
            out["n"] = p["n"].to_numpy(np.int64)
        return pd.DataFrame(out)

    def pair_distinct(g: pd.DataFrame) -> pd.DataFrame:
        if counted:
            return g.groupby(["pb", "c", "s"], as_index=False)["n"].sum()
        return g.drop_duplicates(["c", "s"])[["pb", "c", "s"]]

    return (orders.map_batches(o_prep, batch_format="pyarrow")
            .union(li.map_batches(l_prep, batch_format="pyarrow"))
            .repartition(W)
            .groupby("bucket").map_groups(join_bucket,
                                          batch_format="pandas")
            .repartition(W)
            .groupby("pb").map_groups(pair_distinct,
                                      batch_format="pandas"))


def _both_dir_edges(pairs: ray.data.Dataset, B: int) -> ray.data.Dataset:
    """Undirected view of :func:`_cs_pairs`: every pair emitted in both
    directions, bucketed by src — the layout pagerank / ppr / BFS
    consume. Lazy."""
    def emit(df: pd.DataFrame) -> pd.DataFrame:
        src = np.concatenate([df["c"].to_numpy(), df["s"].to_numpy()])
        dst = np.concatenate([df["s"].to_numpy(), df["c"].to_numpy()])
        return pd.DataFrame({"bucket": (src & (B - 1)).astype("int32"),
                             "src": src, "dst": dst})

    return pairs.map_batches(emit, batch_format="pandas")


def _pagerank_sql(k: int) -> str:
    """Generate the iterative-CTE oracle for k power iterations (the
    SQL mirror of q_pagerank's loop — one CTE per iteration)."""
    d = _PAGERANK_DAMPING
    # repr() keeps full double precision — ':.2f' would silently
    # truncate a tuned damping (e.g. 0.875) and desynchronize the oracle
    iters = []
    for i in range(1, k + 1):
        iters.append(f"""r{i} AS (
  SELECT e.dst AS node,
         {(1 - d)!r} / (SELECT n FROM nn) + {d!r} * SUM(r.pr / dg.d) AS pr
  FROM edges e
  JOIN r{i - 1} r ON r.node = e.src
  JOIN deg dg ON dg.node = e.src
  GROUP BY e.dst
)""")
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), deg AS (
  SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src
), nn AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
{','.join(iters)}
SELECT CASE WHEN node % 2 = 0 THEN 'C' ELSE 'S' END AS node_type,
       CAST(node // 2 AS BIGINT) AS key,
       ROUND(pr * (SELECT n FROM nn), 6) AS pr
FROM r{k}
ORDER BY pr DESC, node_type, key
LIMIT 10
"""


def _ppr_sql(k: int) -> str:
    """Generate the iterative-CTE oracle for k personalized-PageRank
    iterations (teleport mass concentrated on the seed node)."""
    d = _PAGERANK_DAMPING
    iters = []
    for i in range(1, k + 1):
        iters.append(f"""r{i} AS (
  SELECT e.dst AS node,
         CASE WHEN e.dst = (SELECT node FROM seed)
              THEN {(1 - d)!r} ELSE 0.0 END
         + {d!r} * SUM(r.pr / dg.d) AS pr
  FROM edges e
  JOIN r{i - 1} r ON r.node = e.src
  JOIN deg dg ON dg.node = e.src
  GROUP BY e.dst
)""")
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), deg AS (
  SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src
), seed AS (SELECT MIN(node) AS node FROM deg WHERE node % 2 = 0),
r0 AS (
  SELECT node, CASE WHEN node = (SELECT node FROM seed)
                    THEN 1.0 ELSE 0.0 END AS pr
  FROM deg
),
{','.join(iters)}
SELECT CASE WHEN node % 2 = 0 THEN 'C' ELSE 'S' END AS node_type,
       CAST(node // 2 AS BIGINT) AS key,
       ROUND(pr, 6) AS pr
FROM r{k}
ORDER BY pr DESC, node_type, key
LIMIT 10
"""


def q_ppr_seed(sf_dir: str):
    """Personalized PageRank from the smallest customer node — graph
    proximity as a RECOMMENDATION score ('suppliers/customers in this
    entity's orbit'), the seeded-teleport variant of :func:`q_pagerank`
    and the classic random-walk-with-restart primitive. Identical
    distributed machinery (edges materialized once in static taggings,
    two bounded bucketed shuffles per iteration, coalesced unions, the
    driver holds one seed id); the ONLY differences are the initial
    vector (all mass at the seed) and the teleport term landing on the
    seed alone — mass stays concentrated near the seed, so top-10 ranks
    read as proximity. Same round-6 float-parity envelope the pagerank
    oracle established."""
    B = _pair_buckets()
    W = max(8, _cpus())
    D, K = _PAGERANK_DAMPING, _PAGERANK_ITERS
    # shared edge builder (one implementation, five graph consumers)
    edges = _both_dir_edges(_cs_pairs(sf_dir, B, W), B) \
        .repartition(W).materialize()

    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("src", as_index=False).agg(deg=("dst", "size")) \
                .rename(columns={"src": "node"})

    deg = edges.groupby("bucket").map_groups(
        deg_bucket, batch_format="pandas").materialize()
    mins = deg.map_batches(
        lambda df: pd.DataFrame(
            {"m": [df.loc[df["node"] % 2 == 0, "node"].min()]}),
        batch_format="pandas").to_pandas()
    seed = int(np.nanmin(mins["m"].to_numpy(np.float64)))

    ranks = deg.map_batches(
        lambda df: df.assign(
            pr=np.where(df["node"].to_numpy() == seed, 1.0, 0.0)),
        batch_format="pandas").materialize()

    def e_tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bucket": df["bucket"], "node": df["src"],
                             "dst": df["dst"], "val": np.nan,
                             "side": "e"})

    def r_tag(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy()
        return pd.DataFrame({"bucket": (node & (B - 1)).astype("int32"),
                             "node": node, "dst": np.int64(-1),
                             "val": df["pr"].to_numpy()
                             / df["deg"].to_numpy(),
                             "side": "r"})

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        w = g.loc[g["side"] == "r", ["node", "val"]]
        e = g.loc[g["side"] == "e", ["node", "dst"]]
        m = e.merge(w, on="node")
        out = m.groupby("dst", as_index=False)["val"].sum()
        dst = out["dst"].to_numpy()
        return pd.DataFrame({"bucket2": (dst & (B - 1)).astype("int32"),
                             "node": dst, "val": out["val"].to_numpy(),
                             "side": "c"})

    def d_tag(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy()
        return pd.DataFrame({"bucket2": (node & (B - 1)).astype("int32"),
                             "node": node,
                             "val": df["deg"].to_numpy().astype("float64"),
                             "side": "d"})

    def update(g: pd.DataFrame) -> pd.DataFrame:
        c = g.loc[g["side"] == "c"].groupby("node",
                                            as_index=False)["val"].sum()
        d_ = g.loc[g["side"] == "d", ["node", "val"]].rename(
            columns={"val": "deg"})
        m = d_.merge(c, on="node", how="left")
        m["val"] = m["val"].fillna(0.0)
        m["pr"] = np.where(m["node"].to_numpy() == seed, 1.0 - D, 0.0) \
            + D * m["val"].to_numpy()
        m["deg"] = m["deg"].astype("int64")
        return m[["node", "pr", "deg"]]

    edges_t = edges.map_batches(e_tag, batch_format="pandas") \
                   .repartition(W).materialize()
    deg_t = deg.map_batches(d_tag, batch_format="pandas") \
               .repartition(W).materialize()
    del edges, deg

    for _ in range(K):
        parts = (
            edges_t.union(ranks.map_batches(r_tag, batch_format="pandas"))
            .groupby("bucket").map_groups(contrib, batch_format="pandas")
        )
        ranks = (
            parts.union(deg_t)
            .repartition(W)
            .groupby("bucket2").map_groups(update, batch_format="pandas")
            .materialize()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy()
        out = pd.DataFrame({
            "node_type": np.where(node % 2 == 0, "C", "S"),
            "key": (node // 2).astype("int64"),
            "pr": df["pr"].to_numpy().round(6),
        })
        return out.sort_values(["pr", "node_type", "key"],
                               ascending=[False, True, True]).head(10)

    top = ranks.map_batches(finalize, batch_format="pandas").to_pandas()
    return top.sort_values(["pr", "node_type", "key"],
                           ascending=[False, True, True]) \
              .head(10).reset_index(drop=True)


SQL_PPR_SEED = _ppr_sql(_PAGERANK_ITERS)


def q_pagerank(sf_dir: str):
    """Distributed PageRank (4 power iterations, damping 0.85) over the
    undirected customer–supplier bipartite graph induced by
    orders |><| lineitem (node ids: custkey*2 / suppkey*2+1 — integers
    so every shuffle keys on int64, never strings). The iterative-
    algorithm-on-Ray-Data shape:

    - edge build: orderkey-bucketed join with per-bucket distinct
      (combiner), then a pair-bucketed GLOBAL distinct that emits both
      directions; the edge dataset is materialized ONCE and re-read by
      every iteration (never recomputed through the lazy graph);
    - degrees ride with the rank rows, so each iteration is exactly two
      bounded bucketed shuffles: (1) src-bucket join ranks x edges with
      per-bucket PARTIAL contribution sums, (2) dst-bucket combine +
      rank update (ranks materialized per iteration — O(nodes) rows in
      the object store, never on the driver);
    - driver state: the node count N — one scalar.

    Undirected ⇒ no dangling nodes and every node receives mass, so no
    driver-side dangling-mass redistribution is needed. Output: top-10
    nodes by N-normalized rank, pruned per-batch under the SAME
    (rounded pr, node_type, key) total order the SQL oracle uses, so
    the union of local top-10s provably contains the global top-10.

    Block-count discipline: every union is coalesced (metadata-only
    ``repartition``, no all-to-all) to a cluster-proportional width
    before its groupby — Ray's sort fans out into #input-blocks
    partitions, so WITHOUT the coalesce each iteration's output block
    count compounds (96 -> 288 blocks in 4 iterations measured) and
    per-iteration wall time grows ~7x."""
    B = _pair_buckets()
    W = max(8, _cpus())  # physical blocks per shuffle stage
    D, K = _PAGERANK_DAMPING, _PAGERANK_ITERS
    # shared edge builder (one implementation, five graph consumers)
    edges = _both_dir_edges(_cs_pairs(sf_dir, B, W), B) \
        .repartition(W).materialize()

    def deg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("src", as_index=False).agg(deg=("dst", "size")) \
                .rename(columns={"src": "node"})

    deg = edges.groupby("bucket").map_groups(
        deg_bucket, batch_format="pandas").materialize()
    N = deg.count()
    base = (1.0 - D) / N

    ranks = deg.map_batches(
        lambda df: df.assign(pr=1.0 / N), batch_format="pandas").materialize()

    def e_tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bucket": df["bucket"], "node": df["src"],
                             "dst": df["dst"], "val": np.nan, "side": "e"})

    def r_tag(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy()
        return pd.DataFrame({"bucket": (node & (B - 1)).astype("int32"),
                             "node": node, "dst": np.int64(-1),
                             "val": df["pr"].to_numpy() / df["deg"].to_numpy(),
                             "side": "r"})

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        w = g.loc[g["side"] == "r", ["node", "val"]]
        e = g.loc[g["side"] == "e", ["node", "dst"]]
        m = e.merge(w, on="node")  # node == src here
        out = m.groupby("dst", as_index=False)["val"].sum()  # partial by dst
        dst = out["dst"].to_numpy()
        return pd.DataFrame({"bucket2": (dst & (B - 1)).astype("int32"),
                             "node": dst, "val": out["val"].to_numpy(),
                             "side": "c"})

    def d_tag(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy()
        return pd.DataFrame({"bucket2": (node & (B - 1)).astype("int32"),
                             "node": node,
                             "val": df["deg"].to_numpy().astype("float64"),
                             "side": "d"})

    def update(g: pd.DataFrame) -> pd.DataFrame:
        c = g.loc[g["side"] == "c"].groupby("node", as_index=False)["val"].sum()
        d_ = g.loc[g["side"] == "d", ["node", "val"]].rename(columns={"val": "deg"})
        m = d_.merge(c, on="node", how="left")
        m["val"] = m["val"].fillna(0.0)
        m["pr"] = base + D * m["val"]
        m["deg"] = m["deg"].astype("int64")
        return m[["node", "pr", "deg"]]

    # the tagged forms depend only on the static graph — materialize
    # them ONCE instead of re-running the tagging maps every iteration,
    # and release the untagged originals so the object store holds one
    # copy of the edge set, not two, across all K iterations. The edge
    # side is also COALESCED TO W HERE, outside the loop: the old
    # per-iteration `union(...).repartition(W)` rewrote the (dominant)
    # edge blocks K times just to keep block counts flat — coalescing
    # the static side once and leaving the small rank side at its
    # natural W blocks gives the same flat 2W-block shuffle input with
    # one less all-to-all-shaped step per iteration
    edges_t = edges.map_batches(e_tag, batch_format="pandas") \
                   .repartition(W).materialize()
    deg_t = deg.map_batches(d_tag, batch_format="pandas") \
               .repartition(W).materialize()
    del edges, deg

    for _ in range(K):
        # ranks is W blocks (update's sort input is repartitioned to W
        # below), so the union is a stable 2W blocks every iteration —
        # block counts cannot compound
        parts = (
            edges_t.union(ranks.map_batches(r_tag, batch_format="pandas"))
            .groupby("bucket").map_groups(contrib, batch_format="pandas")
        )
        ranks = (
            parts.union(deg_t)
            .repartition(W)
            .groupby("bucket2").map_groups(update, batch_format="pandas")
            .materialize()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        node = df["node"].to_numpy()
        out = pd.DataFrame({
            "node_type": np.where(node % 2 == 0, "C", "S"),
            "key": (node // 2).astype("int64"),
            "pr": (df["pr"].to_numpy() * N).round(6),
        })
        return out.sort_values(["pr", "node_type", "key"],
                               ascending=[False, True, True]).head(10)

    top = ranks.map_batches(finalize, batch_format="pandas").to_pandas()
    return top.sort_values(["pr", "node_type", "key"],
                           ascending=[False, True, True]) \
              .head(10).reset_index(drop=True)


SQL_PAGERANK = _pagerank_sql(_PAGERANK_ITERS)


# single source of truth for the Ray loop AND the generated SQL oracle
_HITS_ROUNDS = 2


def _hits_sql(r: int) -> str:
    """Generate the iterative-CTE oracle for r full HITS rounds."""
    iters = []
    prev_h = "h0"
    for i in range(1, r + 1):
        iters.append(f"""a{i} AS (
  SELECT p.s AS node, SUM(h.score) AS score
  FROM pairs p JOIN {prev_h} h ON h.node = p.c GROUP BY p.s
), h{i} AS (
  SELECT p.c AS node, SUM(a.score) AS score
  FROM pairs p JOIN a{i} a ON a.node = p.s GROUP BY p.c
)""")
        prev_h = f"h{i}"
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
h0 AS (
  SELECT DISTINCT c AS node, CAST(1 AS HUGEINT) AS score FROM pairs
),
{','.join(iters)}
SELECT * FROM (
  SELECT 'A' AS node_type, CAST(node AS BIGINT) AS key,
         CAST(score AS BIGINT) AS score
  FROM a{r} ORDER BY score DESC, node LIMIT 10
)
UNION ALL
SELECT * FROM (
  SELECT 'H' AS node_type, CAST(node AS BIGINT) AS key,
         CAST(score AS BIGINT) AS score
  FROM h{r} ORDER BY score DESC, node LIMIT 10
)
"""


_BF_HOPS = 3


def _cheapest_sql(k: int) -> str:
    """Generate the bounded min-plus oracle: enumerate walks up to k
    hops from the seed with summed integer edge costs, MIN per node."""
    hops = []
    prev = "w0"
    for i in range(1, k + 1):
        hops.append(f"""w{i} AS (
  SELECT e.dst AS node, MIN(p.cost + e.cost) AS cost
  FROM edges e JOIN {prev} p ON p.node = e.src
  GROUP BY e.dst
)""")
        prev = f"w{i}"
    lvls = ",\n".join(hops)
    unions = "\nUNION ALL\n".join(
        f"SELECT node, cost FROM w{i}" for i in range(k + 1))
    return f"""
WITH pairs AS (
  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_suppkey
), edges AS (
  SELECT c AS src, s AS dst, 10000 // n AS cost FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst, 10000 // n AS cost FROM pairs
), seed AS (SELECT MIN(src) AS node FROM edges WHERE src % 2 = 0),
w0 AS (SELECT node, CAST(0 AS BIGINT) AS cost FROM seed),
{lvls},
alllv AS ({unions}),
m AS (SELECT node, MIN(cost) AS cost FROM alllv GROUP BY node)
SELECT CAST((node - 1) // 2 AS BIGINT) AS suppkey,
       CAST(cost AS BIGINT) AS cost
FROM m WHERE node % 2 = 1
ORDER BY cost, suppkey LIMIT 10
"""


def q_cheapest_suppliers(sf_dir: str):
    """Bounded Bellman–Ford (min-plus relaxation) — weighted shortest
    paths from the smallest customer over the customer–supplier graph,
    edge cost 10000 // n_orders (stronger trading ties are cheaper):
    the 10 'closest' suppliers within ``_BF_HOPS`` hops. Completes the
    graph-algorithm family with the MIN-PLUS SEMIRING shape (pagerank
    is sum-times, BFS is reach, this is min-plus): each round is the
    SAME two bounded shuffles, but the combine is MIN instead of SUM —
    distances are exact integers end to end, so the comparison is
    bit-exact with the generated walk-enumeration oracle (sound
    because hops are bounded).

    Distributed shape: weighted distinct edges built once via the
    orderkey-bucketed join (per-(c,s) DISTINCT order counts fold in the
    pair-bucketed stage), materialized bucketed by src; the distance
    vector is a Dataset, updated per round by (1) src-bucket join +
    per-bucket MIN partial by dst, (2) dst-bucket MIN combine with the
    previous distances. Driver holds only the loop counter; the top-10
    cut prunes per block before one tiny driver sort."""
    B = _pair_buckets()
    W = max(8, _cpus())
    def edge_emit(df: pd.DataFrame) -> pd.DataFrame:
        cost = (10_000 // df["n"].to_numpy(np.int64)).astype(np.int64)
        src_ = np.concatenate([df["c"].to_numpy(), df["s"].to_numpy()])
        dst = np.concatenate([df["s"].to_numpy(), df["c"].to_numpy()])
        w = np.concatenate([cost, cost])
        return pd.DataFrame({"bucket": (src_ & (B - 1)).astype("int32"),
                             "src": src_, "dst": dst, "cost": w,
                             "side": "e"})

    # shared edge builder with per-pair distinct-order counts
    edges = (_cs_pairs(sf_dir, B, W, counted=True)
             .map_batches(edge_emit, batch_format="pandas")
             .repartition(W).materialize())
    mins = edges.map_batches(
        lambda df: pd.DataFrame(
            {"m": [df.loc[df["src"] % 2 == 0, "src"].min()]}),
        batch_format="pandas").to_pandas()
    seed = int(np.nanmin(mins["m"].to_numpy(np.float64)))

    def dist_frame(nodes, costs) -> pd.DataFrame:
        nodes = np.asarray(nodes, dtype=np.int64)
        return pd.DataFrame({"bucket": (nodes & (B - 1)).astype("int32"),
                             "src": nodes, "dst": np.int64(-1),
                             "cost": np.asarray(costs, dtype=np.int64),
                             "side": "d"})

    dist = ray.data.from_pandas(dist_frame([seed], [0]))
    for _ in range(_BF_HOPS):
        def relax(g: pd.DataFrame) -> pd.DataFrame:
            d = g.loc[g["side"] == "d", ["src", "cost"]] \
                .groupby("src", as_index=False)["cost"].min()
            e = g.loc[g["side"] == "e", ["src", "dst", "cost"]]
            m = e.merge(d, on="src", suffixes=("_e", "_d"))
            if m.empty:
                return dist_frame([], [])
            m["cost"] = m["cost_e"] + m["cost_d"]
            out = m.groupby("dst", as_index=False)["cost"].min()
            return dist_frame(out["dst"].to_numpy(),
                              out["cost"].to_numpy())

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("src", as_index=False)["cost"].min()
            return dist_frame(out["src"].to_numpy(),
                              out["cost"].to_numpy())

        relaxed = (edges.union(dist)
                   .groupby("bucket").map_groups(relax,
                                                 batch_format="pandas"))
        dist = (relaxed.union(dist).repartition(W)
                .groupby("bucket").map_groups(combine,
                                              batch_format="pandas")
                .materialize())

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.loc[df["src"] % 2 == 1]
        out = pd.DataFrame({"suppkey": (s["src"] - 1) // 2,
                            "cost": s["cost"]})
        return out.sort_values(["cost", "suppkey"]).head(10)

    out = dist.map_batches(topk, batch_format="pandas").to_pandas()
    out = out.sort_values(["cost", "suppkey"]).head(10) \
        .reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


SQL_CHEAPEST_SUPPLIERS = _cheapest_sql(_BF_HOPS)


_BFS_DEPTH = 3


def _bfs_sql(k: int) -> str:
    """Generate the bounded-depth BFS oracle: enumerate walks up to k
    hops from the seed, take MIN(level) per node, count per level (one
    CTE per hop — no recursive visited-set semantics needed)."""
    hops = []
    prev = "l0"
    for i in range(1, k + 1):
        hops.append(f"""l{i} AS (
  SELECT DISTINCT e.dst AS node FROM edges e
  JOIN {prev} p ON p.node = e.src
)""")
        prev = f"l{i}"
    lvls = ",\n".join(hops)
    unions = "\nUNION ALL\n".join(
        f"SELECT node, {i} AS lvl FROM l{i}" for i in range(k + 1))
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), seed AS (
  SELECT MIN(src) AS node FROM edges WHERE src % 2 = 0
), l0 AS (SELECT node FROM seed),
{lvls},
alllv AS ({unions}),
m AS (SELECT node, MIN(lvl) AS lvl FROM alllv GROUP BY node)
SELECT CAST(lvl AS BIGINT) AS lvl, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM m GROUP BY lvl
"""


def q_bfs_levels(sf_dir: str):
    """Bounded-depth BFS from the smallest customer node over the
    undirected customer–supplier graph — the frontier-expansion shape
    (reachability, blast-radius, '2 hops of this entity') that
    completes the graph family next to pagerank (fixpoint), kcore
    (peeling) and dedup_clusters (contraction). ``_BFS_DEPTH`` levels;
    output is nodes-per-level.

    Distributed frontier discipline: the edge set is built once with
    the pagerank machinery and materialized bucketed BY SRC; each hop
    is exactly two bounded shuffles — (1) frontier rows co-locate with
    edges by src bucket and emit per-bucket DISTINCT neighbor partials,
    (2) neighbors co-locate with the visited set by node bucket and
    only unseen nodes survive. The visited set lives in the object
    store as a Dataset keyed by the SAME node bucketing (so the
    anti-join is a bucket-local isin, never a broadcast); the driver
    holds one count per level. The oracle is generated walk
    enumeration + MIN(level), sound because depth is bounded."""
    B = _pair_buckets()
    W = max(8, _cpus())
    # shared edge builder; BFS rides the undirected view with a
    # side tag for the frontier union
    edges = (_both_dir_edges(_cs_pairs(sf_dir, B, W), B)
             .map_batches(lambda df: df.assign(side="e"),
                          batch_format="pandas")
             .repartition(W).materialize())
    mins = edges.map_batches(
        lambda df: pd.DataFrame(
            {"m": [df.loc[df["src"] % 2 == 0, "src"].min()]}),
        batch_format="pandas").to_pandas()
    seed = int(np.nanmin(mins["m"].to_numpy(np.float64)))

    def node_frame(nodes: np.ndarray, side: str) -> pd.DataFrame:
        return pd.DataFrame({"bucket": (nodes & (B - 1)).astype("int32"),
                             "src": nodes.astype(np.int64),
                             "dst": np.int64(-1), "side": side})

    frontier = ray.data.from_pandas(
        node_frame(np.array([seed], dtype=np.int64), "f"))
    visited = ray.data.from_pandas(
        node_frame(np.array([seed], dtype=np.int64), "v"))
    counts = [(0, 1)]
    for lvl in range(1, _BFS_DEPTH + 1):
        def expand(g: pd.DataFrame) -> pd.DataFrame:
            f = g.loc[g["side"] == "f", ["src"]]
            e = g.loc[g["side"] == "e", ["src", "dst"]]
            nb = e.merge(f, on="src")["dst"].drop_duplicates().to_numpy()
            return node_frame(nb, "n")

        def unseen(g: pd.DataFrame) -> pd.DataFrame:
            seen = set(g.loc[g["side"] == "v", "src"].to_numpy())
            n = g.loc[g["side"] == "n", "src"].drop_duplicates()
            new = n[~n.isin(seen)].to_numpy()
            return node_frame(new, "f")

        nbrs = (edges.union(frontier)
                .groupby("bucket").map_groups(expand,
                                              batch_format="pandas"))
        frontier = (nbrs.union(visited).repartition(W)
                    .groupby("bucket").map_groups(
                        unseen, batch_format="pandas").materialize())
        n_new = frontier.count()
        counts.append((lvl, n_new))
        if n_new == 0:
            break
        visited = visited.union(
            frontier.map_batches(
                lambda df: df.assign(side="v"),
                batch_format="pandas")).materialize()
    out = pd.DataFrame(counts, columns=["lvl", "n_nodes"])
    out = out[out["n_nodes"] > 0]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SQL_BFS_LEVELS = _bfs_sql(_BFS_DEPTH)


def q_hits_scores(sf_dir: str):
    """HITS hubs & authorities (Kleinberg) over the DIRECTED
    customer -> supplier graph induced by orders |><| lineitem —
    the link-analysis complement to :func:`q_pagerank` (which walks the
    undirected graph). Customers are hubs, suppliers authorities:
    auth(s) = sum of hub scores over in-links, hub(c) = sum of auth
    scores over out-links, ``_HITS_ROUNDS`` full rounds from hub0 = 1.

    The iterations are deliberately UNNORMALIZED: starting from the
    all-ones hub vector, every intermediate score is a path COUNT — an
    exact integer — so the whole fixpoint runs in int64 on the Ray side
    and HUGEINT in the oracle, and the output comparison is bit-exact
    integer equality instead of pagerank's round-to-6 float parity.
    (Normalization only rescales, so the top-k ranking is the textbook
    HITS ranking.) Growth envelope: each half-round multiplies scores
    by at most the opposing max degree; a post-combine assert keeps
    every score under 2^53 — at TPC-H-like degree distributions that
    admits corpus scales far past sf100, and a violation raises (a red
    driver row) instead of silently wrapping int64.

    Distributed shape (the pagerank discipline): the distinct edge set
    is built with ONE orderkey-bucketed join + pair-bucketed global
    distinct and materialized ONCE in two static taggings (bucketed by
    customer, bucketed by supplier); each half-round is then exactly
    two bounded bucketed shuffles — (1) co-locate scores with edges by
    the source node and emit per-bucket PARTIAL sums keyed by the
    destination, (2) combine by destination. Score vectors live in the
    object store (O(nodes) rows); the driver holds nothing but the loop
    counter. Unions are coalesced to cluster-proportional width so
    block counts cannot compound across rounds."""
    B = _pair_buckets()
    W = max(8, _cpus())
    R = _HITS_ROUNDS
    # shared edge builder; HITS tags the raw (c, s) pairs itself
    edges = _cs_pairs(sf_dir, B, W).materialize()

    # two static taggings of the edge set, materialized once: the
    # c-keyed copy drives auth steps, the s-keyed copy hub steps
    def tag_by_c(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy()
        return pd.DataFrame({"bucket": (c & (B - 1)).astype("int32"),
                             "node": c, "dst": df["s"].to_numpy(),
                             "score": np.int64(-1), "side": "e"})

    def tag_by_s(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy()
        return pd.DataFrame({"bucket": (s & (B - 1)).astype("int32"),
                             "node": s, "dst": df["c"].to_numpy(),
                             "score": np.int64(-1), "side": "e"})

    edges_c = edges.map_batches(tag_by_c, batch_format="pandas") \
                   .repartition(W).materialize()
    edges_s = edges.map_batches(tag_by_s, batch_format="pandas") \
                   .repartition(W).materialize()

    def hub_seed(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["side"] == "e", ["bucket", "node"]] \
                 .drop_duplicates()

    def hub_seed_combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g["node"].drop_duplicates().to_numpy()
        return pd.DataFrame({"bucket": (c & (B - 1)).astype("int32"),
                             "node": c, "dst": np.int64(-1),
                             "score": np.int64(1), "side": "v"})

    # hub0 = 1 per DISTINCT customer: edges_c blocks are partitioned by
    # pair bucket, so a customer can span blocks — a per-batch distinct
    # alone would seed hub0 = out-degree. Per-batch partial distinct +
    # ONE bucketed combine gives the global distinct
    hubs = (edges_c.map_batches(hub_seed, batch_format="pandas")
            .groupby("bucket").map_groups(hub_seed_combine,
                                          batch_format="pandas")
            .materialize())

    def contrib(g: pd.DataFrame) -> pd.DataFrame:
        v = g.loc[g["side"] == "v", ["node", "score"]]
        e = g.loc[g["side"] == "e", ["node", "dst"]]
        m = e.merge(v, on="node")
        out = m.groupby("dst", as_index=False)["score"].sum()
        dst = out["dst"].to_numpy()
        return pd.DataFrame({"bucket": (dst & (B - 1)).astype("int32"),
                             "node": dst, "dst": np.int64(-1),
                             "score": out["score"].to_numpy(),
                             "side": "v"})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["score"].sum()
        mx = int(out["score"].max()) if len(out) else 0
        if mx >= 2**53:
            raise AssertionError(
                "hits_scores: score exceeds the 2^53 exactness envelope "
                "— reduce _HITS_ROUNDS or rescale")
        node = out["node"].to_numpy()
        return pd.DataFrame({"bucket": (node & (B - 1)).astype("int32"),
                             "node": node, "dst": np.int64(-1),
                             "score": out["score"].to_numpy(),
                             "side": "v"})

    def half_step(scores, tagged_edges):
        parts = (
            tagged_edges.union(scores)
            .groupby("bucket").map_groups(contrib, batch_format="pandas")
        )
        return (parts.repartition(W)
                .groupby("bucket").map_groups(combine,
                                              batch_format="pandas")
                .materialize())

    auths = None
    for _ in range(R):
        auths = half_step(hubs, edges_c)   # auth(s) = sum hub over in-links
        hubs = half_step(auths, edges_s)   # hub(c) = sum auth over out-links

    def topk(tag: str):
        def cut(df: pd.DataFrame) -> pd.DataFrame:
            # decode _cs_pairs' node ids back to raw keys (c = 2k,
            # s = 2k+1 — // 2 recovers both)
            out = pd.DataFrame({"node_type": tag,
                                "key": (df["node"] // 2).astype("int64"),
                                "score": df["score"].astype("int64")})
            return out.sort_values(["score", "key"],
                                   ascending=[False, True]).head(10)
        return cut

    # local top-10 per block under the oracle's (score DESC, key) total
    # order, then a driver-side cut of the <= blocks*10 survivors
    rows = pd.concat([
        auths.map_batches(topk("A"), batch_format="pandas").to_pandas(),
        hubs.map_batches(topk("H"), batch_format="pandas").to_pandas(),
    ])
    return (rows.sort_values(["node_type", "score", "key"],
                             ascending=[True, False, True])
            .groupby("node_type", as_index=False).head(10)
            .reset_index(drop=True))


SQL_HITS_SCORES = _hits_sql(_HITS_ROUNDS)


_CHUNK_W = 32  # tokens per training context window
_CHUNK_S = 24  # window stride (8-token overlap between windows)


def q_chunk_windows(sf_dir: str):
    """Fixed-token-window chunking with overlap — the pretraining
    context-window splitter: every document becomes ceil(n/stride)
    windows of up to ``_CHUNK_W`` tokens starting every ``_CHUNK_S``
    tokens, so consecutive windows share an 8-token overlap and no
    token is lost at window boundaries. Shape: a pure map-side fan-out
    inside ``map_batches`` — NO shuffle, no driver state, output rows
    stream straight through, so at 100 TB it is embarrassingly
    parallel and bounded only by write bandwidth. Window offsets are
    computed in one vectorized arange pass; the only per-window Python
    is the C-level ``str.join`` of the slice. Tokenization is a
    literal single-space split, recomputed bit-identically by the SQL
    mirror's ``string_split(text, ' ')``."""
    W, S = _CHUNK_W, _CHUNK_S
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.split(" ").to_numpy()
        n = np.fromiter((len(t) for t in toks), dtype=np.int64,
                        count=len(toks))
        c = -(-n // S)  # windows per doc: ceil(n / stride), n >= 1
        total = int(c.sum())
        if total == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_idx": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "chunk_text": pd.Series([], dtype="object"),
            })
        # per-window local index 0..c_i-1 via one global arange minus
        # each doc's exclusive prefix total — no Python loop over docs
        starts_of = np.concatenate(([0], np.cumsum(c)[:-1]))
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts_of, c)
        starts = idx * S
        ends = np.minimum(starts + W, np.repeat(n, c))
        toks_rep = np.repeat(toks, c)
        return pd.DataFrame({
            "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), c),
            "chunk_idx": idx,
            "n_tokens": ends - starts,
            "chunk_text": [" ".join(t[s:e]) for t, s, e
                           in zip(toks_rep, starts, ends)],
        })

    return ds.map_batches(chunk, batch_format="pandas", batch_size=4096)


# exact SQL mirror: same split, same stride grid (range excludes n, so
# every start < n), same 1-based-inclusive slice of the token list
SQL_CHUNK_WINDOWS = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
),
s AS (
  SELECT doc_id, toks, n,
         unnest(range(0, CAST(n AS BIGINT), 24)) AS st
  FROM t
)
SELECT doc_id,
       CAST(st / 24 AS BIGINT) AS chunk_idx,
       CAST(least(st + 32, n) - st AS BIGINT) AS n_tokens,
       array_to_string(toks[CAST(st + 1 AS BIGINT):least(st + 32, n)],
                       ' ') AS chunk_text
FROM s
"""


def q_source_token_jaccard(sf_dir: str):
    """Corpus-level source-similarity matrix: token-set Jaccard between
    every pair of sources — the dataset-curation view that tells you
    which crawl slices / providers overlap enough to treat as one
    mixture component. Shape: per-batch DISTINCT (source, token) rows
    (each batch dedups before anything shuffles) -> ONE bounded shuffle
    bucketed by token hash, where the bucket-local dedup IS the global
    dedup (a token's rows all land in its bucket) and each token emits
    its source pairs via one vectorized self-merge (m<=|sources| rows
    per token) -> tiny (src_a, src_b) partial counts -> final combine
    is |sources|^2 rows on the driver. Nothing driver-side scales with
    the corpus or the vocabulary; per-bucket work is
    O(vocab/buckets x |sources|^2), the inherent grain of the
    pairwise-source statistic. Jaccard is an unrounded ratio of the
    same two exact integers on both sides."""
    B = _pair_buckets()
    ds = _read(sf_dir, "documents", ["source", "text"])

    def local_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        e = df["text"].str.split(" ").explode()
        out = pd.DataFrame({
            "source": df["source"].reindex(e.index).to_numpy(),
            "tok": e.to_numpy(),
        }).drop_duplicates()
        h = pd.util.hash_array(out["tok"].to_numpy(dtype=object))
        out["bucket"] = (h % B).astype("int64")
        return out

    def tok_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["source", "tok"])
        m = g.merge(g, on="tok")
        pairs = m.loc[m["source_x"] < m["source_y"]] \
            .groupby(["source_x", "source_y"], as_index=False).size() \
            .rename(columns={"source_x": "src_a", "source_y": "src_b",
                             "size": "cnt"})
        vocab = g.groupby("source", as_index=False).size() \
            .rename(columns={"size": "cnt"})
        vocab = pd.DataFrame({"src_a": vocab["source"],
                              "src_b": vocab["source"],
                              "cnt": vocab["cnt"]})
        out = pd.concat([pairs, vocab], ignore_index=True)
        out["cnt"] = out["cnt"].astype("int64")
        return out

    parts = ds.map_batches(local_pairs, batch_format="pandas",
                           batch_size=65536) \
        .groupby("bucket").map_groups(tok_pairs, batch_format="pandas")
    agg = _bucketed_combine(parts, ["src_a", "src_b"], {"cnt": "sum"})
    diag = agg.loc[agg["src_a"] == agg["src_b"]] \
        .set_index("src_a")["cnt"]
    out = agg.loc[agg["src_a"] != agg["src_b"]].reset_index(drop=True)
    va = out["src_a"].map(diag).to_numpy(dtype=np.int64)
    vb = out["src_b"].map(diag).to_numpy(dtype=np.int64)
    inter = out["cnt"].to_numpy(dtype=np.int64)
    union_n = va + vb - inter
    return pd.DataFrame({
        "src_a": out["src_a"], "src_b": out["src_b"],
        "inter": inter, "union_n": union_n,
        "jaccard": inter.astype(np.float64) / union_n,
    })


# exact SQL mirror: same distinct (source, token) grain, same a<b pair
# orientation, same unrounded integer-ratio jaccard
SQL_SOURCE_TOKEN_JACCARD = """
WITH st AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
  )
),
v AS (SELECT source, count(*) AS n FROM st GROUP BY source),
i AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, CAST(i.inter AS BIGINT) AS inter,
       CAST(va.n + vb.n - i.inter AS BIGINT) AS union_n,
       CAST(i.inter AS DOUBLE) / (va.n + vb.n - i.inter) AS jaccard
FROM i
JOIN v va ON va.source = i.src_a
JOIN v vb ON vb.source = i.src_b
"""


_PMI_TOP_V = 24   # co-occurrence restricted to the top-V tokens by df
_PMI_MIN_PAIR = 5  # pairs below this document support are noise


def q_token_pmi(sf_dir: str):
    """Token co-occurrence PMI over the top-V vocabulary — the
    collocation / topic-drift statistic (pointwise mutual information
    of two tokens appearing in the same document). The top-V filter IS
    the scale story: at web scale the distinct-pair space is
    vocabulary^2, so pass 1 computes exact document frequencies with
    per-bucket top-V pruning (the global top-V is a subset of the
    union of per-bucket top-Vs) and only the V chosen tokens' pairs
    ever materialize — pass 2 broadcasts the V-token table once via
    ``ray.put`` and emits per-batch PARTIAL pair counts (<= V^2 rows
    per batch regardless of batch size), folded by one bounded
    combine. Per-doc pair emission is one numpy triu expansion, no
    per-pair Python. N comes from parquet row-group metadata (no
    scan). PMI = ln(N * df_ab / (df_a * df_b)) is computed from the
    same exact integers on both sides; the cut (df desc, token asc)
    and the support floor are deterministic ties included."""
    V, MINP = _PMI_TOP_V, _PMI_MIN_PAIR
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_tokens(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        e = df["text"].str.split(" ").explode()
        t = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64")
            .reindex(e.index).to_numpy(),
            "tok": e.to_numpy(),
        }).drop_duplicates()
        return t

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = doc_tokens(df)
        return t.groupby("tok", as_index=False).size() \
            .rename(columns={"size": "df"})

    dfs = _bucketed_combine(
        ds.map_batches(df_partial, batch_format="pandas",
                       batch_size=65536),
        ["tok"], {"df": "sum"},
        topk=(V, ["df", "tok"], [False, True]))
    dfs = dfs.sort_values(["df", "tok"], ascending=[False, True]) \
        .head(V).reset_index(drop=True)
    n_docs = int(_read(sf_dir, "documents", ["doc_id"]).count())
    df_map = dict(zip(dfs["tok"], dfs["df"].astype(np.int64)))
    top_ref = ray.put(df_map)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        dmap = ray.get(top_ref)
        t = doc_tokens(df)
        t = t.loc[t["tok"].isin(dmap)]
        if t.empty:
            return pd.DataFrame({"tok_a": pd.Series([], dtype="object"),
                                 "tok_b": pd.Series([], dtype="object"),
                                 "pair_docs": pd.Series([], dtype="int64")})
        rows = []
        # one triu expansion per doc: O(V^2) numpy per doc, never
        # per-pair Python
        for _, toks in t.groupby("doc_id")["tok"]:
            a = np.sort(toks.to_numpy(dtype=object))
            if a.size < 2:
                continue
            iu, ju = np.triu_indices(a.size, k=1)
            rows.append(pd.DataFrame({"tok_a": a[iu], "tok_b": a[ju]}))
        if not rows:
            return pd.DataFrame({"tok_a": pd.Series([], dtype="object"),
                                 "tok_b": pd.Series([], dtype="object"),
                                 "pair_docs": pd.Series([], dtype="int64")})
        p = pd.concat(rows, ignore_index=True)
        out = p.groupby(["tok_a", "tok_b"], as_index=False).size() \
            .rename(columns={"size": "pair_docs"})
        out["pair_docs"] = out["pair_docs"].astype("int64")
        return out

    pairs = _bucketed_combine(
        ds.map_batches(pair_partial, batch_format="pandas",
                       batch_size=65536),
        ["tok_a", "tok_b"], {"pair_docs": "sum"})
    pairs = pairs.loc[pairs["pair_docs"] >= MINP].reset_index(drop=True)
    da = pairs["tok_a"].map(df_map).to_numpy(dtype=np.int64)
    db = pairs["tok_b"].map(df_map).to_numpy(dtype=np.int64)
    cab = pairs["pair_docs"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "tok_a": pairs["tok_a"], "tok_b": pairs["tok_b"],
        "pair_docs": cab,
        "pmi": np.log(cab.astype(np.float64) * n_docs / (da * db)),
    })


# exact SQL mirror: same distinct (doc, token) grain, same (df desc,
# tok asc) top-V cut, same a<b orientation and support floor
SQL_TOKEN_PMI = """
WITH dt AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  )
),
f AS (SELECT tok, count(*) AS df FROM dt GROUP BY tok),
topv AS (SELECT tok, df FROM f ORDER BY df DESC, tok LIMIT 24),
ft AS (SELECT dt.doc_id, dt.tok FROM dt JOIN topv USING (tok)),
n AS (SELECT count(*) AS n FROM documents),
p AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS pair_docs
  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
)
SELECT p.tok_a, p.tok_b, CAST(p.pair_docs AS BIGINT) AS pair_docs,
       ln(CAST(p.pair_docs AS DOUBLE) * n.n / (da.df * db.df)) AS pmi
FROM p
JOIN topv da ON da.tok = p.tok_a
JOIN topv db ON db.tok = p.tok_b
CROSS JOIN n
WHERE p.pair_docs >= 5
"""


_CURR_K = 8  # curriculum difficulty buckets


def q_curriculum_buckets(sf_dir: str):
    """Length-curriculum bucketing: exact NTILE(K) of the corpus under
    ORDER BY (n_chars, doc_id) — the deterministic difficulty-tier
    assignment a curriculum-training dataloader consumes — reduced to
    per-bucket stats. Distributed exact-rank shape: pass 1 folds a
    (n_chars -> count) histogram (per-batch partials, driver fold —
    distinct lengths are intrinsically bounded by the max document
    length, NOT the corpus; a web corpus capped at 1 MB docs has <=1M
    histogram rows) into an exclusive cumulative table broadcast via
    ``ray.put``; pass 2 shuffles ONCE bucketed by n_chars so each
    group ranks its doc_ids locally (global rank = cum_below[len] +
    local rank) and emits per-(curriculum-bucket) PARTIAL aggregates —
    K x shuffle-width tiny rows reach the final fold. The NTILE
    remainder rule (first n%K buckets one larger) is replicated
    exactly; avg_chars is the unrounded ratio of the same two
    integers on both sides."""
    K = _CURR_K
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_chars", as_index=False).size() \
            .rename(columns={"size": "cnt"})
        g["cnt"] = g["cnt"].astype("int64")
        return g

    hist = ds.map_batches(hist_partial, batch_format="pandas",
                          batch_size=65536).to_pandas() \
        .groupby("n_chars", as_index=False)["cnt"].sum() \
        .sort_values("n_chars").reset_index(drop=True)
    lens = hist["n_chars"].to_numpy(dtype=np.int64)
    cnts = hist["cnt"].to_numpy(dtype=np.int64)
    n_total = int(cnts.sum())
    cum_below = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    q, rem = divmod(n_total, K)
    cum_ref = ray.put((lens, cum_below))
    B = _pair_buckets()

    def rank_and_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lens_b, cum_b = ray.get(cum_ref)
        g = g.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        base = cum_b[np.searchsorted(lens_b, g["n_chars"].to_numpy())]
        within = g.groupby("n_chars").cumcount().to_numpy()
        r = base + within + 1  # 1-based global rank
        # NTILE: first `rem` buckets hold q+1 rows, the rest q
        big = rem * (q + 1)
        bucket = np.where(
            r <= big,
            (r - 1) // max(q + 1, 1),
            rem + (r - 1 - big) // max(q, 1),
        ).astype(np.int64) + 1
        nc = g["n_chars"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"bucket": bucket, "n_chars": nc}) \
            .groupby("bucket", as_index=False) \
            .agg(n_docs=("n_chars", "size"), min_chars=("n_chars", "min"),
                 max_chars=("n_chars", "max"), sum_chars=("n_chars", "sum"))
        return out.astype({"n_docs": "int64", "min_chars": "int64",
                           "max_chars": "int64", "sum_chars": "int64"})

    def shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        df["shuf"] = (df["n_chars"].to_numpy(dtype=np.int64)) % B
        return df

    parts = ds.map_batches(shard, batch_format="pandas",
                           batch_size=65536) \
        .groupby("shuf").map_groups(rank_and_bucket,
                                    batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("bucket", as_index=False).agg(
        n_docs=("n_docs", "sum"), min_chars=("min_chars", "min"),
        max_chars=("max_chars", "max"), sum_chars=("sum_chars", "sum"))
    out["avg_chars"] = out["sum_chars"].to_numpy(dtype=np.float64) \
        / out["n_docs"].to_numpy(dtype=np.int64)
    return out


# exact SQL mirror: NTILE over the same deterministic total order
SQL_CURRICULUM_BUCKETS = """
WITH r AS (
  SELECT n_chars, ntile(8) OVER (ORDER BY n_chars, doc_id) AS bucket
  FROM documents
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
FROM r GROUP BY bucket
"""


def q_prefix_dups(sf_dir: str):
    """Prefix-containment dedup: every document whose text is a PROPER
    prefix of another document's text — the truncation-duplicate case
    (partial crawls, cut-off re-fetches) that exact-hash dedup misses
    because the hashes differ. The distributed trick is sort adjacency
    on DISTINCT texts: all strings with prefix ``a`` sort contiguously
    immediately after ``a`` itself, so ``a`` is a proper prefix of
    ANOTHER distinct text iff its immediate sorted successor starts
    with it — no all-pairs substring scan, no suffix array. Shape:
    (1) global text dedup via one hash-bucketed shuffle; (2) regroup by
    FIRST CHARACTER — every proper-prefix pair shares it, so the
    adjacency check is complete within each group (a web corpus would
    extend the key to the first k chars, routing each text to its own
    k-or-shorter prefix buckets — bounded x k fan-out — to split hot
    leading characters; one char is the right grain for this corpus);
    (3) one bucketed join back by text hash fans the surviving prefix
    texts out to every doc_id that carries them. Per-text Python is
    one C-level ``startswith`` against the sorted successor. The empty
    string (a prefix of everything but sharing no first char) is
    handled as its own group joined against the corpus's nonempty
    count."""
    B = _pair_buckets()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def local_distinct(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["text"]].drop_duplicates().reset_index(drop=True)
        h = pd.util.hash_array(out["text"].to_numpy(dtype=object))
        out["bucket"] = (h % B).astype("int64")
        return out

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["text"]].drop_duplicates().reset_index(drop=True)
        out["fc"] = out["text"].str.slice(0, 1)
        return out

    distinct = ds.map_batches(local_distinct, batch_format="pandas",
                              batch_size=65536) \
        .groupby("bucket").map_groups(bucket_distinct,
                                      batch_format="pandas") \
        .materialize()
    # the empty text sorts before every other string and is a proper
    # prefix of all of them, but shares no first character — resolve it
    # from two tiny counts (one vectorized partial pass) instead of
    # complicating the group key
    stats = distinct.map_batches(
        lambda df: pd.DataFrame({"n": [np.int64(len(df))],
                                 "empty": [np.int64((df["text"] == "")
                                                    .sum())]}),
        batch_format="pandas").to_pandas()
    n_distinct = int(stats["n"].sum())
    has_empty = int(stats["empty"].sum()) > 0

    def mark_prefixes(g: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(g["text"].to_numpy(dtype=object))
        if t.size >= 2:
            isp = np.fromiter(
                (nx.startswith(cu) for cu, nx in zip(t[:-1], t[1:])),
                dtype=bool, count=t.size - 1)
            keep = t[:-1][isp]
        else:
            keep = np.array([], dtype=object)
        keep = keep[keep != ""]  # empty text handled globally
        h = pd.util.hash_array(keep)
        return pd.DataFrame({"text": keep,
                             "bucket": (h % B).astype("int64")})

    pref = distinct.groupby("fc").map_groups(mark_prefixes,
                                             batch_format="pandas")

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        h = pd.util.hash_array(df["text"].to_numpy(dtype=object))
        return pd.DataFrame({"text": df["text"],
                             "doc_id": df["doc_id"].astype("int64"),
                             "bucket": (h % B).astype("int64")})

    def pref_side(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        df["doc_id"] = np.int64(-1)
        return df[["text", "doc_id", "bucket"]]

    def join_back(g: pd.DataFrame) -> pd.DataFrame:
        hit = set(g.loc[g["doc_id"] < 0, "text"])
        d = g.loc[g["doc_id"] >= 0]
        if has_empty and n_distinct > 1:
            m = d.loc[d["text"].isin(hit) | (d["text"] == "")]
        else:
            m = d.loc[d["text"].isin(hit)]
        return pd.DataFrame({
            "doc_id": m["doc_id"].to_numpy(dtype=np.int64),
            "text_len": m["text"].str.len().to_numpy(dtype=np.int64),
        })

    docs_t = ds.map_batches(tag_docs, batch_format="pandas",
                            batch_size=65536)
    return docs_t.union(pref.map_batches(pref_side,
                                         batch_format="pandas")) \
        .groupby("bucket").map_groups(join_back, batch_format="pandas")


# exact SQL mirror: proper-prefix EXISTS (fine at oracle scale; the Ray
# side replaces the all-pairs scan with sorted adjacency)
SQL_PREFIX_DUPS = """
SELECT a.doc_id, CAST(len(a.text) AS BIGINT) AS text_len
FROM documents a
WHERE EXISTS (
  SELECT 1 FROM documents b
  WHERE len(b.text) > len(a.text)
    AND substr(b.text, 1, len(a.text)) = a.text
)
"""


def q_event_transitions(sf_dir: str):
    """Markov transition matrix over the event stream: global counts of
    (prev_type -> next_type) per user under the deterministic total
    order (ts, event_id) — the behavioral-model statistic (what users
    do next) and the distributed shape of SQL's ``LAG(type) OVER
    (PARTITION BY user ORDER BY ts, event_id)``. Users are hashed into
    _pair_buckets() shuffle partitions (a user lives in exactly ONE
    bucket, so bucket-local shifted pairs ARE that user's global
    transitions); each bucket diffs thousands of users in one
    vectorized sort+shift pass and emits <= n_types^2 partial rows —
    the driver folds B x n_types^2 tiny rows, never event rows. The
    share column is the ratio of the SAME two integers on both sides
    (one float division, no accumulation order)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return df.assign(_b=u % B)

    def trans_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        same = g["user_id"].eq(g["user_id"].shift())
        prev = g["event_type"].shift()
        p = pd.DataFrame({"prev_type": prev[same], "next_type": g["event_type"][same]})
        out = p.groupby(["prev_type", "next_type"], as_index=False).size() \
            .rename(columns={"size": "n_trans"})
        out["n_trans"] = out["n_trans"].astype("int64")
        return out

    out = ds.map_batches(add_bucket, batch_format="pandas",
                         batch_size=65536) \
        .groupby("_b").map_groups(trans_bucket, batch_format="pandas") \
        .to_pandas()
    out = out.groupby(["prev_type", "next_type"], as_index=False)["n_trans"].sum()
    out["n_trans"] = out["n_trans"].astype("int64")
    tot = out.groupby("prev_type")["n_trans"].transform("sum")
    out["share"] = out["n_trans"].to_numpy(dtype=np.float64) \
        / tot.to_numpy(dtype=np.int64)
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


# exact SQL mirror: same (ts, event_id) total order; share is the same
# integer ratio (COUNT / per-prev_type window SUM)
SQL_EVENT_TRANSITIONS = """
WITH t AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, next_type,
       CAST(COUNT(*) AS BIGINT) AS n_trans,
       CAST(COUNT(*) AS DOUBLE)
         / SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS share
FROM t WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


# single source of truth for the Ray loop AND the generated SQL oracle
_MARKOV_ITERS = 4
_MARKOV_FP = 1_000_000_000_000  # fixed-point unit: 1e-12


def _markov_sql(k: int) -> str:
    """Generate the chained-CTE oracle for k fixed-point power
    iterations of the event-type Markov chain (the SQL mirror of
    q_markov_stationary's driver loop — one CTE per iteration)."""
    iters = []
    prev = "x0"
    for i in range(1, k + 1):
        iters.append(f"""x{i} AS (
  SELECT c.b AS a, SUM((x.v * c.n) // t2.tot) AS v
  FROM c JOIN {prev} x ON x.a = c.a JOIN tot t2 ON t2.a = c.a
  WHERE c.b IN (SELECT a FROM tot)
  GROUP BY c.b
)""")
        prev = f"x{i}"
    return f"""
WITH t AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), c AS (
  SELECT prev_type AS a, next_type AS b, CAST(COUNT(*) AS HUGEINT) AS n
  FROM t WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
), tot AS (
  SELECT a, SUM(n) AS tot FROM c GROUP BY a
), x0 AS (
  SELECT a, CAST({_MARKOV_FP} AS HUGEINT)
              // (SELECT COUNT(*) FROM tot) AS v
  FROM tot
),
{','.join(iters)}
SELECT a AS event_type, CAST(v AS BIGINT) AS stat_micro
FROM x{k} ORDER BY a
"""


def q_markov_backtest(sf_dir: str):
    """Sequence-model backtest — train the Markov next-event predictor
    on the FIRST half of the month, serve it on the SECOND: per
    prev_type the prediction is the most frequent successor in
    training (ties break to the lexicographically smallest — DuckDB's
    arg_max tie order is unspecified, so the mirror pins it
    explicitly), and accuracy is measured over every held-out
    transition whose prev_type was seen in training. The temporal
    train/serve split is the honest protocol for sequence models (the
    logreg_cv sibling for the Markov family); all counts are exact
    integers, accuracy is one mirrored division, round-6.

    Shape: two user-bucketed passes (the event_transitions machinery
    with a time filter — transitions never straddle the cutoff on
    either side because pairs are formed within a half); the S x S
    prediction table is catalog-sized and folds driver-side."""
    cutoff = pd.Timestamp("2024-01-16")
    ds = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        return df.assign(_b=u % B)

    def trans_half(half: str):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            if half == "a":
                g = g.loc[g["ts"] < cutoff]
            else:
                g = g.loc[g["ts"] >= cutoff]
            g = g.sort_values(["user_id", "ts", "event_id"])
            same = g["user_id"].eq(g["user_id"].shift())
            prev = g["event_type"].shift()
            p = pd.DataFrame({"prev_type": prev[same],
                              "next_type": g["event_type"][same]})
            out = p.groupby(["prev_type", "next_type"],
                            as_index=False).size() \
                .rename(columns={"size": "n"})
            out["n"] = out["n"].astype("int64")
            return out
        return f

    tagged = ds.map_batches(add_bucket, batch_format="pandas",
                            batch_size=65536).materialize()
    train = (tagged.groupby("_b").map_groups(trans_half("a"),
                                             batch_format="pandas")
             .to_pandas()
             .groupby(["prev_type", "next_type"], as_index=False)["n"]
             .sum())
    # argmax successor per prev, ties to the smallest next_type
    train = train.sort_values(["prev_type", "n", "next_type"],
                              ascending=[True, False, True])
    pred = train.groupby("prev_type", as_index=False).first() \
        .rename(columns={"next_type": "pred"})[["prev_type", "pred"]]
    pmap = dict(zip(pred["prev_type"], pred["pred"]))
    test = (tagged.groupby("_b").map_groups(trans_half("b"),
                                            batch_format="pandas")
            .to_pandas()
            .groupby(["prev_type", "next_type"], as_index=False)["n"]
            .sum())
    test = test.loc[test["prev_type"].isin(pmap)]
    n_test = int(test["n"].sum())
    hits = int(test.loc[
        test["next_type"] == test["prev_type"].map(pmap), "n"].sum())
    return pd.DataFrame({
        "n_test": pd.Series([n_test], dtype="int64"),
        "n_hits": pd.Series([hits], dtype="int64"),
        "accuracy": [_round_away(hits / float(n_test), 6)
                     if n_test else 0.0],
    })


SQL_MARKOV_BACKTEST = """
WITH lagged AS (
  SELECT ts, event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
), tr AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM lagged
  WHERE prev_type IS NOT NULL
    AND ts < TIMESTAMP '2024-01-16' AND prev_ts < TIMESTAMP '2024-01-16'
  GROUP BY prev_type, next_type
), pred AS (
  SELECT prev_type, next_type AS pred,
         row_number() OVER (PARTITION BY prev_type
                            ORDER BY n DESC, next_type) AS rk
  FROM tr
), p AS (SELECT prev_type, pred FROM pred WHERE rk = 1),
te AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM lagged
  WHERE prev_type IS NOT NULL
    AND ts >= TIMESTAMP '2024-01-16'
    AND prev_ts >= TIMESTAMP '2024-01-16'
  GROUP BY prev_type, next_type
), s AS (
  SELECT CAST(SUM(te.n) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN te.next_type = p.pred
                       THEN te.n ELSE 0 END) AS BIGINT) AS n_hits
  FROM te JOIN p USING (prev_type)
)
SELECT n_test, n_hits,
       ROUND(CAST(n_hits AS DOUBLE) / n_test, 6) AS accuracy
FROM s
"""


def q_markov_stationary(sf_dir: str):
    """Stationary distribution of the event-type Markov chain — which
    states the user behavior stream spends its time in — via
    ``_MARKOV_ITERS`` power iterations. The small-state iterative shape
    that complements :func:`q_pagerank`'s large-state one: ALL the
    corpus-sized work is the distributed transition-count estimate
    (identical partial-then-combine shape to q_event_transitions: users
    hash into buckets, one vectorized sort+shift per bucket, <=
    n_types^2 partial rows out), and the iteration itself runs on the
    driver over the O(S^2) count matrix — at 10^12 events S is still
    ~tens, so iterating driver-side is the scale-CORRECT choice, not a
    shortcut (a per-iteration shuffle would move nothing but overhead).

    Exactness: the iteration is fixed-point integer arithmetic —
    x_{k+1}(b) = sum_a (x_k(a) * n(a,b)) // tot(a) with x_0 =
    FP // S in 1e-12 units — evaluated in Python big-ints (products
    reach x*n ~ 1e12 * corpus-count, far past int64) and mirrored
    HUGEINT-for-HUGEINT by the generated oracle, so the comparison is
    bit-exact integer equality with zero float-accumulation surface.
    Truncation leaks ~S units of mass per round on both sides
    identically; states are the types with OUTGOING transitions, and
    mass sent outside the state set drops — also on both sides.
    Cited shape: reference has no iterative-chain analysis; this is
    the training-data-pipeline stationary-usage profile."""
    counts = q_event_transitions(sf_dir)[
        ["prev_type", "next_type", "n_trans"]]
    tot = {a: int(s) for a, s in
           counts.groupby("prev_type")["n_trans"].sum().items()}
    states = sorted(tot)
    x = {a: _MARKOV_FP // len(states) for a in states}
    triples = [(r["prev_type"], r["next_type"], int(r["n_trans"]))
               for _, r in counts.iterrows()]
    for _ in range(_MARKOV_ITERS):
        nxt: dict[str, int] = {}
        for a, b, n in triples:
            if a in x and b in tot:
                nxt[b] = nxt.get(b, 0) + (x[a] * n) // tot[a]
        x = nxt
    out = pd.DataFrame(sorted(x.items()),
                       columns=["event_type", "stat_micro"])
    if len(out) and int(out["stat_micro"].abs().max()) >= 2**63:
        raise AssertionError("markov_stationary: output exceeds BIGINT")
    out["stat_micro"] = out["stat_micro"].astype("int64")
    return out.reset_index(drop=True)


SQL_MARKOV_STATIONARY = _markov_sql(_MARKOV_ITERS)


def q_bigram_familiarity(sf_dir: str, _broadcast_max: int | None = None):
    """Bigram-LM familiarity: per document the sum over its ADJACENT
    token pairs of that bigram's GLOBAL corpus count — the 2-gram
    sibling of q_corpus_familiarity and the integer-exact core of a
    KenLM-style fluency filter (a doc whose bigrams are all
    corpus-frequent is boilerplate; one whose bigrams are novel is
    either fresh text or garbled OCR). Same two-pass shape: pass 1
    folds per-batch partial bigram counts through one bounded
    by-bigram-hash combine; within the broadcast budget the table is
    ``ray.put`` once and the corpus streams through a stateless scan.
    Past it (web-scale bigram vocabularies are corpus-sized) the
    occurrence rows hash-bucket by bigram — counts and scores inside
    each bucket are global because a bigram lives in one bucket — then
    a per-doc combine bucketed by doc_id. Bigram construction is one
    shift within each doc's token frame (no per-pair Python); docs
    with < 2 tokens emit no row (SQL inner join)."""
    budget = _BROADCAST_MAX_KEYS if _broadcast_max is None else _broadcast_max
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cols = ["doc_id", "n_bigrams", "n_distinct", "familiarity"]
    B = _pair_buckets()

    def bigram_frame(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        if t.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "bigram": pd.Series([], dtype="object")})
        # adjacent pair = token + next token within the same doc: one
        # shift over the exploded frame (doc_ids are contiguous there)
        same = t["doc_id"].eq(t["doc_id"].shift(-1))
        nxt = t["token"].shift(-1)
        m = same.to_numpy()
        return pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy()[m],
            "bigram": (t["token"][same] + " " + nxt[same]).to_numpy(),
        })

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        bg = bigram_frame(df)
        g = bg.groupby("bigram", as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        h = pd.util.hash_array(g["bigram"].to_numpy(dtype=object)) % B
        return g.assign(bucket=h.astype("int64"))

    def combine_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("bigram", as_index=False)["n"].sum()

    counts = ds.map_batches(partial_counts, batch_format="pandas",
                            batch_size=65536) \
        .groupby("bucket").map_groups(combine_counts, batch_format="pandas")
    probe = counts.limit(budget + 1).to_pandas()
    if len(probe) <= budget:
        cnt_ref = ray.put(probe.set_index("bigram")["n"])

        def score(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cnt_ref)
            bg = bigram_frame(df)
            if bg.empty:
                return pd.DataFrame({k: pd.Series([], dtype="int64")
                                     for k in cols})
            bg["c"] = bg["bigram"].map(c).astype("int64")
            out = bg.groupby("doc_id", as_index=False).agg(
                n_bigrams=("bigram", "size"),
                n_distinct=("bigram", "nunique"),
                familiarity=("c", "sum"))
            for k in cols:
                out[k] = out[k].astype("int64")
            return out[cols]

        return ds.map_batches(score, batch_format="pandas", batch_size=65536)

    # fallback: bigram vocabulary ~ corpus — bucketed count-and-score
    def occ_rows(df: pd.DataFrame) -> pd.DataFrame:
        bg = bigram_frame(df)
        h = pd.util.hash_array(bg["bigram"].to_numpy(dtype=object)) % B
        return bg.assign(bucket=h.astype("int64"))

    def bucket_score(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("bigram")["bigram"].transform("size")
        out = pd.DataFrame({"doc_id": g["doc_id"].astype("int64"),
                            "bigram": g["bigram"],
                            "c": c.to_numpy(dtype=np.int64)})
        r = out.groupby("doc_id", as_index=False).agg(
            n_bigrams=("c", "size"), n_distinct=("bigram", "nunique"),
            familiarity=("c", "sum"))
        for k in cols:
            r[k] = r[k].astype("int64")
        r["b2"] = r["doc_id"] % B
        return r

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_bigrams=("n_bigrams", "sum"), n_distinct=("n_distinct", "sum"),
            familiarity=("familiarity", "sum"))
        for k in cols:
            out[k] = out[k].astype("int64")
        return out[cols]

    return ds.map_batches(occ_rows, batch_format="pandas",
                          batch_size=65536) \
        .groupby("bucket").map_groups(bucket_score, batch_format="pandas") \
        .groupby("b2").map_groups(comb, batch_format="pandas")


# exact SQL mirror: same lowercase + Python-whitespace tokenization
# (the '\s+' literal is widened by the _PYWS block below), adjacent
# pairs via position self-join, global bigram counts joined back per
# occurrence, all-integer aggregates
SQL_BIGRAM_FAMILIARITY = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
  FROM (SELECT doc_id, string_split(nt, ' ') AS t
        FROM norm WHERE length(nt) > 0),
       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
),
gc AS (SELECT bg, COUNT(*) AS c FROM tok GROUP BY bg)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(COUNT(DISTINCT t.bg) AS BIGINT) AS n_distinct,
       CAST(SUM(gc.c) AS BIGINT) AS familiarity
FROM tok t JOIN gc USING (bg)
GROUP BY t.doc_id
"""


_SKIPGRAM_W = 3    # max positional distance (word2vec window)
_SKIPGRAM_K = 20   # pairs reported


def q_skipgram_counts(sf_dir: str):
    """Skip-gram co-occurrence counts — the word2vec/GloVe training
    statistic: for every token position i, the ordered pair (tok[i],
    tok[i+d]) for d = 1..``_SKIPGRAM_W``, counted corpus-wide, top
    ``_SKIPGRAM_K`` pairs by (count DESC, tok_a, tok_b). Positional
    (earlier token first), unlike :func:`q_token_pmi`'s doc-level
    unordered co-occurrence — this is the windowed corpus you feed an
    embedding trainer, that is the association statistic.

    Shape: pure map-side pair emission — per batch ONE explode then W
    shifted array comparisons (no per-pair Python, no per-doc loop;
    the d-shifted equality of the doc-index array marks pairs that
    stay inside one document) collapsed by a per-batch value_counts
    (Zipf: distinct pairs << occurrences), then ONE bounded by-pair
    bucketed combine with per-bucket top-K prune — the driver folds
    <= buckets*K rows, never the pair vocabulary. Exact integer
    counts; deterministic total order ties included on both sides."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # fresh RangeIndex: the shifted doc-boundary test below uses
        # index equality, which needs one unique index value per doc
        e = df["text"].reset_index(drop=True) \
            .str.lower().str.split().explode().dropna()
        arr = e.to_numpy(dtype=object)
        idx = e.index.to_numpy()
        frames = []
        for d in range(1, _SKIPGRAM_W + 1):
            if len(arr) <= d:
                break
            same = idx[d:] == idx[:-d]
            frames.append(pd.DataFrame({"tok_a": arr[:-d][same],
                                        "tok_b": arr[d:][same]}))
        if not frames:
            return pd.DataFrame({"tok_a": pd.Series([], dtype="object"),
                                 "tok_b": pd.Series([], dtype="object"),
                                 "n_cooc": pd.Series([], dtype="int64")})
        p = pd.concat(frames, ignore_index=True)
        out = p.groupby(["tok_a", "tok_b"], as_index=False).size() \
            .rename(columns={"size": "n_cooc"})
        out["n_cooc"] = out["n_cooc"].astype("int64")
        return out

    pairs = _bucketed_combine(
        ds.map_batches(partial, batch_format="pandas", batch_size=65536),
        ["tok_a", "tok_b"], {"n_cooc": "sum"},
        topk=(_SKIPGRAM_K, ["n_cooc", "tok_a", "tok_b"],
              [False, True, True]))
    pairs["n_cooc"] = pairs["n_cooc"].astype("int64")
    return pairs.sort_values(["n_cooc", "tok_a", "tok_b"],
                             ascending=[False, True, True]) \
        .head(_SKIPGRAM_K).reset_index(drop=True)


SQL_SKIPGRAM_COUNTS = r"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT string_split(nt, ' ') AS t FROM norm WHERE length(nt) > 0
),
pairs AS (
  SELECT t[i] AS tok_a, t[i + d] AS tok_b
  FROM tok,
       LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i),
       LATERAL (SELECT unnest(generate_series(1, {W})) AS d)
  WHERE i + d <= len(t)
)
SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_cooc
FROM pairs GROUP BY tok_a, tok_b
ORDER BY n_cooc DESC, tok_a, tok_b LIMIT {K}
""".replace("{W}", str(_SKIPGRAM_W)).replace("{K}", str(_SKIPGRAM_K))


_SEG_W = 16  # tokens per dedup segment ("line")


def q_segment_dedup(sf_dir: str):
    """Line-level exact dedup (RefinedWeb/CCNet-style, public): each
    document is cut into consecutive disjoint _SEG_W-token segments
    (the synthetic corpus has no newlines, so fixed token windows
    stand in for lines); a segment occurrence is a DUPLICATE when the
    same segment text appeared earlier in the corpus under the total
    order (doc_id, seg_idx). Output is the per-document rewrite plan —
    segments kept/removed and exact tokens removed — the statistic a
    curation pipeline applies before training. Shape: one vectorized
    explode (tokens -> pos//W segment ids -> per-segment join), then
    TWO bounded shuffles: segments hash-bucket by text (a segment
    lives in one bucket, so bucket-local first-occurrence IS global;
    duplicates are marked with one sort + duplicated() pass per
    bucket), then per-doc partial rollups combine bucketed by doc_id.
    The driver never sees segment rows; all outputs are int64."""
    W = _SEG_W
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B = _pair_buckets()
    cols = ["doc_id", "n_segs", "n_dup_segs", "n_tokens_removed"]

    def seg_rows(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        if t.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "seg_idx": pd.Series([], dtype="int64"),
                                 "seg": pd.Series([], dtype="object"),
                                 "n_tok": pd.Series([], dtype="int64"),
                                 "bucket": pd.Series([], dtype="int64")})
        t["seg_idx"] = (t.groupby("doc_id").cumcount() // W).astype("int64")
        g = t.groupby(["doc_id", "seg_idx"], as_index=False).agg(
            seg=("token", " ".join), n_tok=("token", "size"))
        g["n_tok"] = g["n_tok"].astype("int64")
        h = pd.util.hash_array(g["seg"].to_numpy(dtype=object)) % B
        return g.assign(bucket=h.astype("int64"))

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["seg", "doc_id", "seg_idx"])
        dup = g.duplicated("seg", keep="first")
        out = pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "is_dup": dup.to_numpy(),
            "n_tok": g["n_tok"].astype("int64"),
        })
        r = out.assign(rm=np.where(out["is_dup"], out["n_tok"], 0)) \
            .groupby("doc_id", as_index=False).agg(
                n_segs=("n_tok", "size"), n_dup_segs=("is_dup", "sum"),
                n_tokens_removed=("rm", "sum"))
        for k in cols:
            r[k] = r[k].astype("int64")
        r["b2"] = r["doc_id"] % B
        return r

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_segs=("n_segs", "sum"), n_dup_segs=("n_dup_segs", "sum"),
            n_tokens_removed=("n_tokens_removed", "sum"))
        for k in cols:
            out[k] = out[k].astype("int64")
        return out[cols]

    return ds.map_batches(seg_rows, batch_format="pandas",
                          batch_size=65536) \
        .groupby("bucket").map_groups(mark_dups, batch_format="pandas") \
        .groupby("b2").map_groups(comb, batch_format="pandas")


# exact SQL mirror: same lowercase + Python-whitespace tokenization
# (the '\s+' literal is widened by the _PYWS block below), same
# disjoint W-token segmentation, same (doc_id, seg_idx) first-keeper
SQL_SEGMENT_DEDUP = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
seg AS (
  SELECT doc_id, s - 1 AS seg_idx,
         array_to_string(t[(s-1)*16+1 : LEAST(s*16, len(t))], ' ') AS seg,
         LEAST(s*16, len(t)) - (s-1)*16 AS n_tok
  FROM (SELECT doc_id, string_split(nt, ' ') AS t
        FROM norm WHERE length(nt) > 0),
       LATERAL (SELECT unnest(generate_series(
                  1, CAST(ceil(len(t) / 16.0) AS BIGINT))) AS s)
),
m AS (
  SELECT doc_id, n_tok,
         row_number() OVER (PARTITION BY seg
                            ORDER BY doc_id, seg_idx) > 1 AS is_dup
  FROM seg
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
       CAST(SUM(CASE WHEN is_dup THEN n_tok ELSE 0 END) AS BIGINT)
         AS n_tokens_removed
FROM m GROUP BY doc_id
"""


def q_pareto_orders(sf_dir: str):
    """Skyline / Pareto-frontier query: per order priority, the orders
    not dominated on (later date, lower price) — b dominates a when
    b.date >= a.date AND b.price <= a.price with one strict; ties on
    both axes keep BOTH points. The distributed shape is the skyline
    classic: dominance is transitive, so every globally non-dominated
    point survives its batch-local frontier — each batch prunes to its
    local skyline (one vectorized sort + per-date min + exclusive
    cummin pass, no pairwise scan), and ONE tiny combine per priority
    group re-runs the same kernel on the union of local frontiers
    (O(distinct dates) rows each, never raw orders). No all-pairs
    anywhere; the oracle's NOT EXISTS is the quadratic check this
    replaces."""
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderkey", "o_orderdate",
                "o_totalprice"])

    def frontier(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("o_orderpriority", sort=False):
            g = g.sort_values(["o_orderdate", "o_totalprice"],
                              ascending=[False, True])
            # per-date min price, in date-desc order
            dmin = g.groupby("o_orderdate", sort=False)["o_totalprice"] \
                .min()
            # exclusive running min over strictly-later dates: a date
            # survives iff its min price beats every later date's
            prev = dmin.cummin().shift(1)
            alive = dmin[prev.isna() | (dmin < prev)]
            m = g["o_orderdate"].map(alive).eq(g["o_totalprice"])
            out.append(g[m.to_numpy()])
        if not out:
            return df.iloc[:0]
        return pd.concat(out, ignore_index=True)

    part = ds.map_batches(frontier, batch_format="pandas",
                          batch_size=65536)
    out = part.groupby("o_orderpriority") \
        .map_groups(frontier, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "o_orderpriority": out["o_orderpriority"],
        "o_orderkey": out["o_orderkey"].astype("int64"),
        "o_orderdate": out["o_orderdate"],
        "o_totalprice": out["o_totalprice"].astype(float),
    }).sort_values(["o_orderpriority", "o_orderkey"]).reset_index(drop=True)


# exact SQL mirror: the quadratic NOT EXISTS dominance check the
# distributed local-frontier union replaces
SQL_PARETO_ORDERS = """
SELECT a.o_orderpriority,
       CAST(a.o_orderkey AS BIGINT) AS o_orderkey,
       a.o_orderdate, a.o_totalprice
FROM orders a
WHERE NOT EXISTS (
  SELECT 1 FROM orders b
  WHERE b.o_orderpriority = a.o_orderpriority
    AND b.o_orderdate >= a.o_orderdate
    AND b.o_totalprice <= a.o_totalprice
    AND (b.o_orderdate > a.o_orderdate
         OR b.o_totalprice < a.o_totalprice)
)
"""


def q_mad_outliers(sf_dir: str):
    """Robust outlier counts per group via the median-absolute-
    deviation rule (|v - median| > 3 * MAD) — the heavy-tail-safe
    sibling of the z-score filter in q_nation_spend_outliers, and a
    standard data-quality gate. Both the median and the MAD are EXACT
    order statistics computed by the same histogram-narrowing scheme
    as q_group_percentiles (driver holds one (lo, hi, rank) triple per
    group; each pass is one map_batches of 512-bin partials), run
    TWICE: once over the raw values, once over |v - med| with the
    per-group medians broadcast via ``ray.put``. Cost is O(passes)
    full scans per phase regardless of group count; nothing
    group-sized ever sorts globally. Rank = ceil(n/2) (lower median)
    matches the SQL row_number oracle bit-for-bit, so the final
    3*MAD comparisons run on identical doubles on both sides."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    BINS = 512

    def group_median(dev_med: dict | None) -> dict[str, tuple]:
        """Exact per-group lower median of value (dev_med None) or of
        |value - dev_med[grp]|. Returns {grp: (median, n)}.

        One of the narrowing-kernel family (q_group_percentiles /
        here / q_rfm_segments.select_all_pairs / q_weighted_median /
        q_price_median_cont). They deliberately stay separate: the
        float-domain variants (this one, percentiles, weighted,
        median_cont) bin with np.linspace edges and filter with THE
        SAME float edges — self-consistent — while the int-domain
        variant (rfm) needs exact integer edges because its ranks
        index an integer lattice; rfm also selects (value, key)
        PAIRS, weighted accumulates WEIGHT sums, and median_cont
        narrows TWO bracketing ranks per group (sharing histograms
        via the uniq-range dedup) to interpolate between them. A
        single parameterized helper would thread 5 axes of variation
        through every call site."""
        med_ref = ray.put(dev_med)

        def vframe(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(med_ref)
            v = df["value"].to_numpy(dtype=np.float64)
            if m is not None:
                v = np.abs(v - df["event_type"].map(m).to_numpy())
            return pd.DataFrame({"grp": df["event_type"], "v": v})

        def stats(df: pd.DataFrame) -> pd.DataFrame:
            return vframe(df).groupby("grp")["v"].agg(
                n="count", lo="min", hi="max").reset_index()

        parts = ds.map_batches(stats, batch_format="pandas",
                               batch_size=65536).to_pandas()
        agg = parts.groupby("grp").agg(
            n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
        state = {g: [float(r["lo"]), float(np.nextafter(r["hi"], np.inf)),
                     int(np.ceil(0.5 * r["n"])), False, int(r["n"])]
                 for g, r in agg.iterrows()}

        for _ in range(6):
            bounds = {g: (s[0], s[1]) for g, s in state.items() if not s[3]}
            if not bounds:
                break
            b_ref = ray.put(bounds)

            def hist(df: pd.DataFrame) -> pd.DataFrame:
                b = ray.get(b_ref)
                vf = vframe(df)
                rows = []
                for grp, sub in vf.groupby("grp"):
                    if grp not in b:
                        continue
                    lo, hi = b[grp]
                    v = sub["v"].to_numpy()
                    v = v[(v >= lo) & (v < hi)]
                    h, _ = np.histogram(v, bins=np.linspace(lo, hi, BINS + 1))
                    rows.append((grp, h.astype(np.int64).tobytes()))
                return pd.DataFrame(rows, columns=["grp", "h"]) if rows \
                    else pd.DataFrame({"grp": pd.Series([], dtype="object"),
                                       "h": pd.Series([], dtype="object")})

            hp = ds.map_batches(hist, batch_format="pandas",
                                batch_size=65536).to_pandas()
            for grp in bounds:
                total = np.zeros(BINS, dtype=np.int64)
                for buf in hp.loc[hp["grp"] == grp, "h"]:
                    total += np.frombuffer(buf, dtype=np.int64)
                lo, hi, rank, _, n = state[grp]
                edges = np.linspace(lo, hi, BINS + 1)
                cum = np.cumsum(total)
                bi = int(np.searchsorted(cum, rank))
                new_rank = rank - (int(cum[bi - 1]) if bi else 0)
                done = bool(total[bi] <= 100_000)
                state[grp] = [float(edges[bi]), float(edges[bi + 1]),
                              new_rank, done, n]

        fin_ref = ray.put({g: (s[0], s[1]) for g, s in state.items()})

        def in_range(df: pd.DataFrame) -> pd.DataFrame:
            b = ray.get(fin_ref)
            vf = vframe(df)
            keep = []
            for grp, sub in vf.groupby("grp"):
                lo, hi = b[grp]
                v = sub["v"].to_numpy()
                keep.append(pd.DataFrame({"grp": grp,
                                          "v": v[(v >= lo) & (v < hi)]}))
            return pd.concat(keep, ignore_index=True) if keep else \
                pd.DataFrame({"grp": pd.Series([], dtype="object"),
                              "v": pd.Series([], dtype="float64")})

        vals = ds.map_batches(in_range, batch_format="pandas").to_pandas()
        out = {}
        for grp, s in state.items():
            v = np.sort(vals.loc[vals["grp"] == grp, "v"].to_numpy())
            out[grp] = (float(v[s[2] - 1]), s[4])
        return out

    med = {g: mv for g, (mv, _) in group_median(None).items()}
    mad_n = group_median(med)
    thr_ref = ray.put({g: (med[g], 3.0 * mv) for g, (mv, _) in
                       mad_n.items()})

    def count_out(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        g = df.groupby("event_type")["value"]
        rows = []
        for grp, v in g:
            m, lim = t[grp]
            a = v.to_numpy(dtype=np.float64)
            rows.append((grp, int((np.abs(a - m) > lim).sum())))
        return pd.DataFrame(rows, columns=["event_type", "n_outliers"]) \
            if rows else pd.DataFrame(
                {"event_type": pd.Series([], dtype="object"),
                 "n_outliers": pd.Series([], dtype="int64")})

    cnt = ds.map_batches(count_out, batch_format="pandas",
                         batch_size=65536).to_pandas() \
        .groupby("event_type", as_index=False)["n_outliers"].sum()
    cnt["n_outliers"] = cnt["n_outliers"].astype("int64")
    # UNROUNDED: med/mad are actual data values (or |v1 - v2| diffs)
    # identical on both sides; a 4-decimal round here would expose the
    # half-even (pandas) vs half-away (SQL ROUND) midpoint divergence
    # for free — the compare protocol's own 6-decimal float rounding
    # is applied identically to both sides
    cnt["med"] = cnt["event_type"].map(med)
    cnt["mad"] = cnt["event_type"].map(
        {g: mv for g, (mv, _) in mad_n.items()})
    cnt["n_events"] = cnt["event_type"].map(
        {g: n for g, (_, n) in mad_n.items()}).astype("int64")
    return cnt[["event_type", "med", "mad", "n_outliers", "n_events"]] \
        .sort_values("event_type").reset_index(drop=True)


# exact SQL mirror: lower-median rank ceil(n/2) at both levels, same
# 3*MAD threshold on identical doubles
SQL_MAD_OUTLIERS = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
med AS (
  SELECT event_type, value AS med, n FROM ranked
  WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
),
rankedd AS (
  SELECT e.event_type, ABS(e.value - m.med) AS d, m.med, m.n,
         row_number() OVER (PARTITION BY e.event_type
                            ORDER BY ABS(e.value - m.med)) AS rn
  FROM events e JOIN med m USING (event_type)
),
madt AS (
  SELECT event_type, d AS mad, med, n FROM rankedd
  WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)
)
SELECT e.event_type, m.med, m.mad,
       CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3 * m.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN madt m USING (event_type)
GROUP BY e.event_type, m.med, m.mad
"""


_BURST_GAP_S = 3600  # repeated (user, type) within this window = duplicate


def q_event_burst_dedup(sf_dir: str):
    """Telemetry burst dedup: an event is a DUPLICATE when the same
    (user, event_type) fired within _BURST_GAP_S seconds of its
    previous occurrence under the (ts, event_id) total order — the
    retry/double-click/bot-burst filter every event pipeline runs
    before analytics. Per (user, type) stream stats come back as kept
    / dropped counts. One bounded shuffle: (user, type) keys hash into
    _pair_buckets() partitions (a key lives in one bucket, so the
    bucket-local sort+shift gap IS the global one); each bucket diffs
    thousands of keys in one vectorized pass. Gap uses whole-second
    floor on both endpoints, matching the SQL date_diff oracle."""
    ds = _read(sf_dir, "events",
               ["user_id", "event_type", "ts", "event_id"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].astype("int64")
        h = pd.util.hash_array(df["event_type"].to_numpy(dtype=object))
        return df.assign(_b=((u ^ h.astype("int64")) % B))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        same = g["user_id"].eq(g["user_id"].shift()) \
            & g["event_type"].eq(g["event_type"].shift())
        gap = g["ts"].dt.floor("s").diff().dt.total_seconds()
        dup = same & (gap <= _BURST_GAP_S)
        out = pd.DataFrame({"user_id": g["user_id"].astype("int64"),
                            "event_type": g["event_type"],
                            "dup": dup.to_numpy()})
        r = out.groupby(["user_id", "event_type"], as_index=False).agg(
            n_events=("dup", "size"), n_dropped=("dup", "sum"))
        r["n_events"] = r["n_events"].astype("int64")
        r["n_dropped"] = r["n_dropped"].astype("int64")
        r["n_kept"] = r["n_events"] - r["n_dropped"]
        return r[["user_id", "event_type", "n_events", "n_kept",
                  "n_dropped"]]

    return ds.map_batches(add_bucket, batch_format="pandas",
                          batch_size=65536) \
        .groupby("_b").map_groups(dedup_bucket, batch_format="pandas")


# exact SQL mirror: same (ts, event_id) order, same floor-second gap
SQL_EVENT_BURST_DEDUP = """
WITH g AS (
  SELECT user_id, event_type,
         date_diff('second',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id), ts) AS gap
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN gap IS NULL OR gap > 3600 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN gap <= 3600 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped
FROM g GROUP BY user_id, event_type
"""


def q_rfm_segments(sf_dir: str):
    """RFM (recency / frequency / monetary) quintile segmentation —
    the classic customer-analytics cube: per customer max(orderdate),
    count(orders), sum(price in exact integer cents); each dimension
    gets an exact global NTILE(5) under the deterministic order
    (value, custkey); output is the 5x5x5 segment census. Distributed
    shape: ONE bounded shuffle builds the per-customer aggregate rows
    (partial per batch, combine bucketed by custkey); each dimension's
    4 NTILE boundaries are then found by the same histogram-narrowing
    selection as q_mad_outliers (driver holds (lo, hi, rank) per
    boundary — all 4 boundary ranks narrow in the SAME scan; ties at a
    boundary value resolve by collecting that final <=100k-row range
    and rank-indexing (value, custkey) pairs). The assignment pass is
    one stateless searchsorted against the 12 broadcast boundary
    pairs; only 125 segment rows reach the driver. Nothing
    customer-scale ever materializes driver-side (the curriculum
    query's full value histogram would here be customer-sized)."""
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderdate", "o_totalprice"])
    B = _pair_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        g = df.assign(m=cents).groupby("o_custkey", as_index=False).agg(
            r=("o_orderdate", "max"), f=("o_custkey", "size"),
            m=("m", "sum"))
        g["f"] = g["f"].astype("int64")
        g["m"] = g["m"].astype("int64")
        return g.assign(_b=g["o_custkey"].astype("int64") % B)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_custkey", as_index=False).agg(
            r=("r", "max"), f=("f", "sum"), m=("m", "sum"))
        return pd.DataFrame({
            "o_custkey": out["o_custkey"].astype("int64"),
            # recency as int64 MICROSECONDS (the parquet precision) so
            # all three dims share one integer kernel; us epoch values
            # (~2e15) stay exactly representable in float64 inside
            # np.histogram, which ns values (~2e18 > 2^53) would not
            "r": out["r"].astype("datetime64[us]").astype("int64"),
            "f": out["f"].astype("int64"),
            "m": out["m"].astype("int64"),
        })

    cust = ds.map_batches(partial, batch_format="pandas",
                          batch_size=65536) \
        .groupby("_b").map_groups(combine, batch_format="pandas") \
        .materialize()
    n = cust.count()
    q, rem = divmod(n, 5)
    # rank of the LAST row of quintile k (1-based, k = 1..4)
    bounds_ranks = [k * q + min(k, rem) for k in range(1, 5)]

    def select_all_pairs() -> dict[str, list[tuple[int, int]]]:
        """Exact (value, custkey) order statistics at bounds_ranks for
        ALL THREE dimensions simultaneously — state keyed by (dim,
        rank), so every boundary of every dimension narrows in the
        SAME stats / histogram / collect scans (one dataset pass per
        round instead of one per dimension, the q_group_percentiles
        rule). Ties resolve by rank-indexing the final collected
        <=100k-row range under (value, custkey)."""
        BINS = 512
        DIMS = ("r", "f", "m")

        def int_edges(lo: int, hi: int) -> np.ndarray:
            # EXACT integer bin edges: float linspace edges would let a
            # value land on a different side of floor/ceil-widened
            # bounds than the bin np.histogram counted it in, skewing
            # the residual rank. Integer edges make both agree exactly.
            e = lo + (np.arange(BINS + 1, dtype=np.int64) * (hi - lo)) \
                // BINS
            return np.unique(e)

        stats = cust.map_batches(
            lambda df: pd.DataFrame(
                {d + s: [getattr(df[d], m)()]
                 for d in DIMS for s, m in (("_lo", "min"), ("_hi", "max"))}),
            batch_format="pandas").to_pandas()
        # state per (dim, boundary): [lo, hi, residual rank within
        # [lo, hi)] where rank counts rows with value < lo already
        # excluded
        state = {}
        for d in DIMS:
            glo = int(stats[d + "_lo"].min())
            ghi = int(stats[d + "_hi"].max()) + 1
            for r in bounds_ranks:
                state[(d, r)] = [glo, ghi, r, False]
        for _ in range(8):
            open_b = {k: (s[0], s[1]) for k, s in state.items() if not s[3]}
            if not open_b:
                break
            b_ref = ray.put(open_b)

            def hist(df: pd.DataFrame, _b=b_ref) -> pd.DataFrame:
                b = ray.get(_b)
                rows = []
                for (d, r), (lo, hi) in b.items():
                    v_all = df[d].to_numpy(dtype=np.int64)
                    v = v_all[(v_all >= lo) & (v_all < hi)]
                    h, _ = np.histogram(v, bins=int_edges(lo, hi))
                    rows.append((d, r, h.astype(np.int64).tobytes()))
                return pd.DataFrame(rows, columns=["d", "r", "h"])

            hp = cust.map_batches(hist, batch_format="pandas").to_pandas()
            for (d, r), (lo, hi) in open_b.items():
                edges = int_edges(lo, hi)
                total = np.zeros(len(edges) - 1, dtype=np.int64)
                sel = (hp["d"] == d) & (hp["r"] == r)
                for buf in hp.loc[sel, "h"]:
                    total += np.frombuffer(buf, dtype=np.int64)
                cum = np.cumsum(total)
                rank = state[(d, r)][2]
                bi = int(np.searchsorted(cum, rank))
                new_rank = rank - (int(cum[bi - 1]) if bi else 0)
                nlo, nhi = int(edges[bi]), int(edges[bi + 1])
                done = bool(total[bi] <= 100_000) or nhi - nlo <= 1
                state[(d, r)] = [nlo, nhi, new_rank, done]

        fin_ref = ray.put({k: (s[0], s[1]) for k, s in state.items()})

        def in_range(df: pd.DataFrame, _b=fin_ref) -> pd.DataFrame:
            b = ray.get(_b)
            ck = df["o_custkey"].to_numpy(dtype=np.int64)
            keep = []
            for (d, r), (lo, hi) in b.items():
                v = df[d].to_numpy(dtype=np.int64)
                m = (v >= lo) & (v < hi)
                keep.append(pd.DataFrame(
                    {"d": d, "r": r, "v": v[m], "c": ck[m]}))
            return pd.concat(keep, ignore_index=True)

        vals = cust.map_batches(in_range, batch_format="pandas").to_pandas()
        out: dict[str, list[tuple[int, int]]] = {}
        for d in DIMS:
            pairs = []
            for r in bounds_ranks:
                sub = vals.loc[(vals["d"] == d) & (vals["r"] == r)] \
                    .sort_values(["v", "c"])
                rank = state[(d, r)][2]
                row = sub.iloc[rank - 1]
                pairs.append((int(row["v"]), int(row["c"])))
            out[d] = pairs
        return out

    cuts = select_all_pairs()
    cuts_ref = ray.put(cuts)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cuts_ref)
        ck = df["o_custkey"].to_numpy(dtype=np.int64)
        out = {}
        for dim in ("r", "f", "m"):
            v = df[dim].to_numpy(dtype=np.int64)
            # quintile = 1 + number of boundary pairs strictly below
            # (value, custkey); a row equal to boundary k closes
            # bucket k, so "strictly below" counts k-1 of them
            qn = np.zeros(len(v), dtype=np.int64)
            for bv, bc in c[dim]:
                qn += (v > bv) | ((v == bv) & (ck > bc))
            out[f"{dim}_q"] = qn + 1
        g = pd.DataFrame(out).groupby(["r_q", "f_q", "m_q"],
                                      as_index=False).size() \
            .rename(columns={"size": "n_customers"})
        g["n_customers"] = g["n_customers"].astype("int64")
        return g

    seg = cust.map_batches(assign, batch_format="pandas").to_pandas()
    out = seg.groupby(["r_q", "f_q", "m_q"], as_index=False) \
        ["n_customers"].sum()
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values(["r_q", "f_q", "m_q"]).reset_index(drop=True)


# exact SQL mirror: same integer-cents monetary, same (value, custkey)
# NTILE tie order on all three dimensions
SQL_RFM_SEGMENTS = """
WITH c AS (
  SELECT o_custkey, max(o_orderdate) AS r, COUNT(*) AS f,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS m
  FROM orders GROUP BY o_custkey
),
q AS (
  SELECT ntile(5) OVER (ORDER BY r, o_custkey) AS r_q,
         ntile(5) OVER (ORDER BY f, o_custkey) AS f_q,
         ntile(5) OVER (ORDER BY m, o_custkey) AS m_q
  FROM c
)
SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
       CAST(m_q AS BIGINT) AS m_q,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM q GROUP BY r_q, f_q, m_q
"""


def q_event_sequences(sf_dir: str):
    """Sequential-pattern mining, the 3-gram case: the top-20 most
    frequent CONSECUTIVE 3-event sequences across all users under the
    (ts, event_id) per-user total order — what a product analyst pulls
    to find dominant behavioral paths, and the order-3 extension of
    q_event_transitions. One bounded shuffle: users hash into
    _pair_buckets() partitions (a user's whole stream lands in one
    bucket, so two vectorized shifts inside the bucket enumerate its
    sequences exactly); each bucket emits <= |event_types|^3 partial
    count rows, and the driver folds B x that tiny table before the
    deterministic (n desc, sequence asc) top-20 cut. Event rows never
    reach the driver."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_b=df["user_id"].astype("int64") % B)

    def seq_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"]
        same2 = u.eq(u.shift(2))  # rows 3rd-or-later in their user run
        p = pd.DataFrame({"t1": g["event_type"].shift(2)[same2],
                          "t2": g["event_type"].shift(1)[same2],
                          "t3": g["event_type"][same2]})
        out = p.groupby(["t1", "t2", "t3"], as_index=False).size() \
            .rename(columns={"size": "n_seq"})
        out["n_seq"] = out["n_seq"].astype("int64")
        return out

    parts = ds.map_batches(add_bucket, batch_format="pandas",
                           batch_size=65536) \
        .groupby("_b").map_groups(seq_bucket, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby(["t1", "t2", "t3"], as_index=False)["n_seq"].sum()
    out["n_seq"] = out["n_seq"].astype("int64")
    return out.sort_values(["n_seq", "t1", "t2", "t3"],
                           ascending=[False, True, True, True]) \
        .head(20).reset_index(drop=True)


# exact SQL mirror: two LAGs under the same per-user total order, same
# deterministic (n desc, sequence asc) top-20 cut
SQL_EVENT_SEQUENCES = """
WITH s AS (
  SELECT lag(event_type, 2) OVER w AS t1,
         lag(event_type, 1) OVER w AS t2,
         event_type AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_seq
FROM s WHERE t1 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY n_seq DESC, t1, t2, t3
LIMIT 20
"""


def q_extraction_html_tables(sf_dir: str):
    """Structured DOM extraction gate: deterministic HTML documents —
    a boilerplate shell (nav/footer/attribute noise, a TH header row)
    wrapping a table whose cell VALUES are a closed-form function of
    doc_id — stream through the real regex table parser
    (``functions/html.extract_table_cells``), one batch of spans at a
    time. The oracle never parses HTML: it regenerates the expected
    (row, col, cell) lattice from the same modular arithmetic, so any
    parser slip (missed row, swallowed attribute, wrong cell order)
    breaks the hash. Stateless map_batches; cell rows ARE the result."""
    from .functions.html import extract_table_cells

    ds = _read(sf_dir, "documents", ["doc_id"])

    def gen_parse(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"].astype("int64"):
            R, C = int(d % 4 + 1), int(d % 3 + 2)
            body = "".join(
                "<tr class='r%d'>" % r
                + "".join(f"<td >v{(d * 31 + r * 7 + c) % 97}</td>"
                          for c in range(C))
                + "</tr>"
                for r in range(R))
            head = "<tr>" + "".join(f"<th>h{c}</th>" for c in range(C)) \
                + "</tr>"
            html = ("<html><nav><a href='/'>menu</a></nav>"
                    f"<table border=1>{head}{body}</table>"
                    "<footer>© corp</footer></html>")
            for ti, ri, ci, txt in extract_table_cells(html):
                rows.append((d, ti, ri, ci, txt))
        out = pd.DataFrame(rows, columns=["doc_id", "tbl", "row_idx",
                                          "col_idx", "cell"])
        for k in ("doc_id", "tbl", "row_idx", "col_idx"):
            out[k] = out[k].astype("int64")
        return out

    return ds.map_batches(gen_parse, batch_format="pandas",
                          batch_size=65536)


# oracle regenerates the lattice closed-form — no HTML parsing; row 0
# is the TH header row, data rows are offset by 1
SQL_EXTRACTION_HTML_TABLES = """
SELECT doc_id, CAST(0 AS BIGINT) AS tbl,
       CAST(0 AS BIGINT) AS row_idx, CAST(c AS BIGINT) AS col_idx,
       'h' || CAST(c AS VARCHAR) AS cell
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, doc_id % 3 + 1)) AS c)
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT) AS tbl,
       CAST(r + 1 AS BIGINT) AS row_idx, CAST(c AS BIGINT) AS col_idx,
       'v' || CAST((doc_id * 31 + r * 7 + c) % 97 AS VARCHAR) AS cell
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, doc_id % 4)) AS r),
     LATERAL (SELECT unnest(generate_series(0, doc_id % 3 + 1)) AS c)
"""


def q_weighted_median(sf_dir: str):
    """Quantity-WEIGHTED median price per return flag — the weighted
    order statistic (each row counts with weight w, the median is the
    smallest value whose running weight reaches half the total), the
    inventory-/revenue-weighted cousin of the count medians in
    q_median_prices. Same histogram-narrowing scheme as
    q_group_percentiles but the histograms accumulate WEIGHT SUMS per
    bin (np.histogram(v, weights=w)) and the driver tracks one
    residual weight rank per group; integer weights keep every
    cumulative comparison exact. O(passes) scans, one (lo, hi, rank)
    triple per group driver-side, final <=100k-row range collected for
    the exact crossing value. The SQL mirror is the cumulative-weight
    window with the same cw*2 >= tw crossing rule."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])
    BINS = 512

    def wframe(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "grp": df["l_returnflag"],
            "v": df["l_extendedprice"].to_numpy(dtype=np.float64),
            "w": np.floor(df["l_quantity"].to_numpy(dtype=np.float64)
                          + 0.5).astype(np.int64),
        })

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        f = wframe(df)
        return f.groupby("grp").agg(
            tw=("w", "sum"), lo=("v", "min"), hi=("v", "max")) \
            .reset_index()

    parts = ds.map_batches(stats, batch_format="pandas",
                           batch_size=65536).to_pandas()
    agg = parts.groupby("grp").agg(
        tw=("tw", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    # crossing rule cw*2 >= tw with integer cw == cw >= ceil(tw/2)
    state = {g: [float(r["lo"]), float(np.nextafter(r["hi"], np.inf)),
                 int(-(-int(r["tw"]) // 2)), False]
             for g, r in agg.iterrows()}

    for _ in range(6):
        bounds = {g: (s[0], s[1]) for g, s in state.items() if not s[3]}
        if not bounds:
            break
        b_ref = ray.put(bounds)

        def hist(df: pd.DataFrame, _b=b_ref) -> pd.DataFrame:
            b = ray.get(_b)
            f = wframe(df)
            rows = []
            for grp, sub in f.groupby("grp"):
                if grp not in b:
                    continue
                lo, hi = b[grp]
                v = sub["v"].to_numpy()
                w = sub["w"].to_numpy()
                m = (v >= lo) & (v < hi)
                h, _ = np.histogram(v[m], bins=np.linspace(lo, hi, BINS + 1),
                                    weights=w[m].astype(np.float64))
                # integer weights sum exactly in float64 at any
                # realistic scale; store back as int64
                rows.append((grp, np.rint(h).astype(np.int64).tobytes()))
            return pd.DataFrame(rows, columns=["grp", "h"]) if rows else \
                pd.DataFrame({"grp": pd.Series([], dtype="object"),
                              "h": pd.Series([], dtype="object")})

        hp = ds.map_batches(hist, batch_format="pandas",
                            batch_size=65536).to_pandas()
        for grp, (lo, hi) in bounds.items():
            total = np.zeros(BINS, dtype=np.int64)
            for buf in hp.loc[hp["grp"] == grp, "h"]:
                total += np.frombuffer(buf, dtype=np.int64)
            edges = np.linspace(lo, hi, BINS + 1)
            cum = np.cumsum(total)
            rank = state[grp][2]
            bi = int(np.searchsorted(cum, rank))
            new_rank = rank - (int(cum[bi - 1]) if bi else 0)
            done = bool(total[bi] <= 100_000)
            state[grp] = [float(edges[bi]), float(edges[bi + 1]),
                          new_rank, done]

    fin_ref = ray.put({g: (s[0], s[1]) for g, s in state.items()})

    def in_range(df: pd.DataFrame, _b=fin_ref) -> pd.DataFrame:
        b = ray.get(_b)
        f = wframe(df)
        keep = []
        for grp, sub in f.groupby("grp"):
            lo, hi = b[grp]
            m = (sub["v"].to_numpy() >= lo) & (sub["v"].to_numpy() < hi)
            keep.append(sub.loc[m])
        return pd.concat(keep, ignore_index=True) if keep else f.iloc[:0]

    vals = ds.map_batches(in_range, batch_format="pandas").to_pandas()
    rows = []
    for grp, s in sorted(state.items()):
        sub = vals.loc[vals["grp"] == grp].sort_values("v")
        # collapse ties so the crossing value is the VALUE multiset's
        cw = sub.groupby("v", sort=True)["w"].sum().cumsum()
        v = cw.index.to_numpy()[np.searchsorted(cw.to_numpy(), s[2])]
        # UNROUNDED data value: same midpoint rationale as mad_outliers
        rows.append((grp, float(v)))
    return pd.DataFrame(rows, columns=["l_returnflag", "wmedian_price"])


# exact SQL mirror: cumulative-weight window (RANGE frame pools ties),
# same integer crossing rule
SQL_WEIGHTED_MEDIAN = """
WITH g AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST(ROUND(l_quantity) AS BIGINT) AS w
  FROM lineitem
),
cum AS (
  SELECT l_returnflag, v,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM g
)
SELECT l_returnflag, MIN(v) AS wmedian_price
FROM cum WHERE cw * 2 >= tw GROUP BY l_returnflag
"""


def q_extraction_reading_order(sf_dir: str):
    """Reading-order merge gate (G1, the layout-parse step the north
    rule names): per document a deterministic grid of region chunks —
    R x C cells whose text is a closed-form token of (doc_id, row,
    col), RTL direction for odd doc_ids — streams through the REAL
    merge kernel (``functions/merge.merge_chunk_texts``: row-major,
    column direction flipped under RTL, separator-joined since exact
    projection cuts carry no overlap). The oracle never runs the
    merger: it rebuilds the expected page text with an ordered
    string_agg over the same lattice, so any ordering slip (RTL not
    flipped, rows interleaved, separator wrong) breaks the hash.
    Stateless map_batches; one (doc_id, page_text, n_chunks) row per
    doc."""
    from .config import MergeConfig
    from .functions.merge import merge_chunk_texts

    ds = _read(sf_dir, "documents", ["doc_id"])
    LTR, RTL = MergeConfig(), MergeConfig(rtl=True)

    def gen_merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for d in df["doc_id"].astype("int64"):
            R, C = int(d % 3 + 1), int(d % 3 + 2)
            chunks = [{"row": r, "col": c,
                       "text": f"w{(d * 13 + r * 5 + c) % 89}"}
                      for r in range(R) for c in range(C)]
            cfg = RTL if d % 2 else LTR
            rows.append((int(d), merge_chunk_texts(chunks, cfg),
                         len(chunks)))
        out = pd.DataFrame(rows, columns=["doc_id", "page_text",
                                          "n_chunks"])
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_chunks"] = out["n_chunks"].astype("int64")
        return out

    return ds.map_batches(gen_merge, batch_format="pandas",
                          batch_size=65536)


# oracle rebuilds the merged text closed-form: row-major string_agg,
# column order flipped for odd (RTL) docs, '\n\n' separator
SQL_EXTRACTION_READING_ORDER = """
SELECT doc_id,
       string_agg('w' || CAST((doc_id * 13 + r * 5 + c) % 89 AS VARCHAR),
                  chr(10) || chr(10)
                  ORDER BY r, CASE WHEN doc_id % 2 = 1 THEN -c ELSE c END)
         AS page_text,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM documents,
     LATERAL (SELECT unnest(generate_series(0, doc_id % 3)) AS r),
     LATERAL (SELECT unnest(generate_series(0, doc_id % 3 + 1)) AS c)
GROUP BY doc_id
"""


_DRIFT_A, _DRIFT_B, _DRIFT_V = "src0", "src1", 30


def q_distribution_drift(sf_dir: str):
    """Train/serve distribution-drift monitor: token-frequency
    comparison between two corpus slices (sources src0 vs src1) — per
    top-V token (by combined count, token-asc ties) the occurrence
    counts in each slice and the probability gap p_a - p_b, the table
    an ML-ops dashboard renders before a drift alarm. Shape: pushed-
    down two-source read -> per-batch (token, src, n) partials -> ONE
    shuffle bucketed by token hash (both slices' counts for a token
    meet in its bucket, where they pivot to one row and the bucket
    prunes to its local combined top-V — the global top-V is a subset
    of the union); slice totals fold from O(batches x 2) tiny partial
    rows, never a second scan. Counts are exact integers; the drift
    gap is one double expression over the same four integers on both
    sides."""
    A, Bsrc, V = _DRIFT_A, _DRIFT_B, _DRIFT_V
    ds = _read(sf_dir, "documents", ["source", "text"],
               filter=pc.is_in(pc.field("source"),
                               pa.array([A, Bsrc])))
    B = _pair_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        e = df["text"].str.lower().str.split().explode().dropna()
        if e.empty:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "src": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        t = pd.DataFrame({"src": df["source"].reindex(e.index).to_numpy(),
                          "token": e.to_numpy()})
        g = t.groupby(["token", "src"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        h = pd.util.hash_array(g["token"].to_numpy(dtype=object)) % B
        return g.assign(_b=h.astype("int64"))

    def pivot_prune(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["token", "src"], as_index=False)["n"].sum()
        w = s.pivot(index="token", columns="src", values="n") \
            .fillna(0).astype("int64")
        for c in (A, Bsrc):
            if c not in w.columns:
                w[c] = 0
        out = pd.DataFrame({"token": w.index,
                            "cnt_a": w[A].to_numpy(dtype=np.int64),
                            "cnt_b": w[Bsrc].to_numpy(dtype=np.int64)})
        out["comb"] = out["cnt_a"] + out["cnt_b"]
        return out.sort_values(["comb", "token"],
                               ascending=[False, True]).head(V)

    # materialized ONCE: both consumers (totals fold, top-V shuffle)
    # read the same partial-count blocks — without this the tokenize
    # scan would re-run per consumer. The blocks are distinct-token
    # partials, far smaller than the corpus slice.
    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).materialize()
    # slice totals: O(batches x 2) rows folded driver-side
    tots = parts.map_batches(
        lambda df: df.groupby("src", as_index=False)["n"].sum(),
        batch_format="pandas").to_pandas() \
        .groupby("src")["n"].sum()
    tot_a, tot_b = int(tots.get(A, 0)), int(tots.get(Bsrc, 0))
    if tot_a == 0 or tot_b == 0:
        # a monitor comparing against an empty slice is a configuration
        # error — fail loudly instead of emitting inf/nan drift rows
        raise ValueError(
            f"distribution_drift: empty token slice (tot_{A}={tot_a}, "
            f"tot_{Bsrc}={tot_b})")

    top = parts.groupby("_b").map_groups(pivot_prune,
                                         batch_format="pandas") \
        .to_pandas() \
        .sort_values(["comb", "token"], ascending=[False, True]) \
        .head(V).reset_index(drop=True)
    drift = top["cnt_a"].to_numpy(dtype=np.float64) / tot_a \
        - top["cnt_b"].to_numpy(dtype=np.float64) / tot_b
    return pd.DataFrame({"token": top["token"],
                         "cnt_a": top["cnt_a"].astype("int64"),
                         "cnt_b": top["cnt_b"].astype("int64"),
                         "drift": drift})


# exact SQL mirror: same lowercase whitespace tokenization (the '\s+'
# literal is widened by the _PYWS block below), same combined-count
# top-V cut, same single-expression drift over identical integers
SQL_DISTRIBUTION_DRIFT = r"""
WITH norm AS (
  SELECT source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents WHERE source IN ('src0', 'src1')
),
tok AS (
  SELECT source, unnest(string_split(nt, ' ')) AS token
  FROM norm WHERE length(nt) > 0
),
c AS (
  SELECT token,
         SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS cnt_a,
         SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cnt_b
  FROM tok GROUP BY token
),
t AS (
  SELECT SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tot_a,
         SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS tot_b
  FROM tok
)
SELECT token, CAST(cnt_a AS BIGINT) AS cnt_a,
       CAST(cnt_b AS BIGINT) AS cnt_b,
       CAST(cnt_a AS DOUBLE) / t.tot_a
         - CAST(cnt_b AS DOUBLE) / t.tot_b AS drift
FROM c CROSS JOIN t
ORDER BY cnt_a + cnt_b DESC, token
LIMIT 30
"""


def q_association_rules(sf_dir: str):
    """Association rules over the co-purchase pairs — the recommender
    output stage: for pairs with support >= 3 orders, both directed
    rules A -> B with confidence = n(AB)/n(A) and lift =
    n(AB) * N / (n(A) * n(B)), top-10 by (lift, rule) deterministic.
    Shape: the basket_pairs machinery supplies pair counts (one
    orderkey-bucketed expansion + one by-pair combine); item supports
    are a per-batch distinct fold; N is one count. The driver joins
    O(pruned pairs) x O(1) lookups — lift/confidence are float ratios
    of EXACT integers, mirrored expression-for-expression, round-6.

    The support floor makes the pruned pair set complete (every pair
    with n >= 3 survives the per-bucket prune trivially — the prune
    keeps all rows, only the driver cut applies the floor), so the
    top-10-by-lift is exact, not heuristic."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    B = _pair_buckets()
    MINSUP = 3

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df["l_orderkey"].astype("int64")
        return pd.DataFrame({"o": o, "p": df["l_partkey"].astype("int64"),
                             "_b": o % B})

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        # ONE pass per orderkey bucket emits all three statistics as a
        # tagged long frame. Baskets are disjoint across buckets, so
        # the bucket's basket COUNT is final; item and pair rows are
        # PARTIALS (a part/pair occurs in orders across buckets) —
        # items fold in the driver's catalog-bounded groupby, pairs in
        # the by-pair bucketed combine
        g = g.drop_duplicates(["o", "p"])[["o", "p"]]
        m = g.merge(g, on="o", suffixes=("_a", "_b"))
        m = m.loc[m["p_a"] < m["p_b"]]
        pr = m.groupby(["p_a", "p_b"], as_index=False).size() \
            .rename(columns={"size": "n_ab"})
        it = g.groupby("p", as_index=False).size() \
            .rename(columns={"size": "n_ab", "p": "p_a"})
        it["p_b"] = np.int64(-1)
        out = pd.concat([
            pr.assign(kind="pair"),
            it[["p_a", "p_b", "n_ab"]].assign(kind="item"),
            pd.DataFrame({"p_a": [np.int64(-1)], "p_b": [np.int64(-1)],
                          "n_ab": [np.int64(g["o"].nunique())],
                          "kind": "n"}),
        ], ignore_index=True)
        out["n_ab"] = out["n_ab"].astype("int64")
        return out

    stats = (ds.map_batches(add_bucket, batch_format="pandas",
                            batch_size=65536)
             .groupby("_b").map_groups(bucket_stats,
                                       batch_format="pandas")
             .materialize())
    pairs = _bucketed_combine(
        stats.filter(expr="kind == 'pair'"),
        ["p_a", "p_b"], {"n_ab": "sum"})
    pairs = pairs.loc[pairs["n_ab"] >= MINSUP]
    # item partials fold IN THE CLUSTER (O(buckets x parts) rows never
    # reach the driver — only the catalog-bounded distinct parts do);
    # the basket-count sentinels are O(buckets)
    items = _bucketed_combine(
        stats.filter(expr="kind == 'item'"), ["p_a"], {"n_ab": "sum"}) \
        .rename(columns={"p_a": "p", "n_ab": "n"})[["p", "n"]]
    n_orders = int(stats.filter(expr="kind == 'n'")
                   .to_pandas()["n_ab"].sum())
    # vectorized rule construction: two merges + column arithmetic,
    # no per-pair Python
    m = pairs.merge(items.rename(columns={"p": "p_a", "n": "na"}),
                    on="p_a") \
        .merge(items.rename(columns={"p": "p_b", "n": "nb"}), on="p_b")
    nab = m["n_ab"].to_numpy(np.int64).astype(np.float64)
    na = m["na"].to_numpy(np.int64)
    nb = m["nb"].to_numpy(np.int64)
    lift = np.round(nab * n_orders / (na.astype(np.float64) * nb), 6)
    fwd = pd.DataFrame({"antecedent": m["p_a"], "consequent": m["p_b"],
                        "n_ab": m["n_ab"],
                        "confidence": np.round(nab / na, 6),
                        "lift": lift})
    rev = pd.DataFrame({"antecedent": m["p_b"], "consequent": m["p_a"],
                        "n_ab": m["n_ab"],
                        "confidence": np.round(nab / nb, 6),
                        "lift": lift})
    out = pd.concat([fwd, rev], ignore_index=True)
    for c in ("antecedent", "consequent", "n_ab"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["lift", "antecedent", "consequent"],
                           ascending=[False, True, True]) \
        .head(10).reset_index(drop=True)


SQL_ASSOCIATION_RULES = """
WITH d AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), pr AS (
  SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM d a JOIN d b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p HAVING COUNT(*) >= 3
), it AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY p
), nn AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM d),
r AS (
  SELECT pa AS antecedent, pb AS consequent, n_ab,
         ROUND(CAST(n_ab AS DOUBLE) / ia.n, 6) AS confidence,
         ROUND(CAST(n_ab AS DOUBLE) * nn.n_orders / (CAST(ia.n AS DOUBLE)
               * ib.n), 6) AS lift
  FROM pr JOIN it ia ON ia.p = pr.pa JOIN it ib ON ib.p = pr.pb
  CROSS JOIN nn
  UNION ALL
  SELECT pb, pa, n_ab,
         ROUND(CAST(n_ab AS DOUBLE) / ib.n, 6),
         ROUND(CAST(n_ab AS DOUBLE) * nn.n_orders / (CAST(ia.n AS DOUBLE)
               * ib.n), 6)
  FROM pr JOIN it ia ON ia.p = pr.pa JOIN it ib ON ib.p = pr.pb
  CROSS JOIN nn
)
SELECT CAST(antecedent AS BIGINT) AS antecedent,
       CAST(consequent AS BIGINT) AS consequent, n_ab, confidence, lift
FROM r ORDER BY lift DESC, antecedent, consequent LIMIT 10
"""


def q_basket_triples(sf_dir: str):
    """Frequent-itemset mining at k=3 (the A-Priori step above
    :func:`q_basket_pairs`): top-10 part TRIPLES most often bought
    together in one order. Baskets are bounded (TPC-H ~4-7 items), so
    each orderkey bucket expands its baskets' distinct part sets into
    a<b<c triples with one chained hash self-merge — O(items^3) per
    basket, never corpus-cubic; per-triple partials fold through the
    by-triple bucketed combine where the top-10 prune is sound (a
    triple lives in one bucket). With UNBOUNDED baskets the classic
    A-Priori lever applies instead — broadcast the frequent-pair set
    from q_basket_pairs and drop candidate triples containing an
    infrequent pair BEFORE the shuffle; the bounded-basket direct
    expansion keeps this row exact and cheap here."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df["l_orderkey"].astype("int64")
        return pd.DataFrame({"o": o, "p": df["l_partkey"].astype("int64"),
                             "_b": o % B})

    def triples_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["o", "p"])[["o", "p"]]
        m = g.merge(g, on="o", suffixes=("_a", "_b"))
        m = m.loc[m["p_a"] < m["p_b"]]
        m = m.merge(g.rename(columns={"p": "p_c"}), on="o")
        m = m.loc[m["p_b"] < m["p_c"]]
        out = m.groupby(["p_a", "p_b", "p_c"], as_index=False).size() \
            .rename(columns={"size": "n_orders", "p_a": "part_a",
                             "p_b": "part_b", "p_c": "part_c"})
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    partials = ds.map_batches(add_bucket, batch_format="pandas",
                              batch_size=65536) \
        .groupby("_b").map_groups(triples_bucket, batch_format="pandas")
    out = _bucketed_combine(
        partials, ["part_a", "part_b", "part_c"], {"n_orders": "sum"},
        topk=(10, ["n_orders", "part_a", "part_b", "part_c"],
              [False, True, True, True]))
    for c in ("part_a", "part_b", "part_c", "n_orders"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["n_orders", "part_a", "part_b", "part_c"],
                           ascending=[False, True, True, True]) \
        .head(10).reset_index(drop=True)


SQL_BASKET_TRIPLES = """
WITH d AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
)
SELECT CAST(a.p AS BIGINT) AS part_a, CAST(b.p AS BIGINT) AS part_b,
       CAST(c.p AS BIGINT) AS part_c,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM d a JOIN d b ON a.o = b.o AND a.p < b.p
         JOIN d c ON b.o = c.o AND b.p < c.p
GROUP BY a.p, b.p, c.p
ORDER BY n_orders DESC, part_a, part_b, part_c LIMIT 10
"""


def q_basket_pairs(sf_dir: str):
    """Market-basket pair mining: the top-20 part pairs most often
    bought together in one order (frequent-itemset mining at k=2, the
    co-purchase signal behind recommenders). Orders are the baskets:
    lineitem rows hash-bucket by orderkey (a basket lives in ONE
    bucket), each bucket expands its baskets' DISTINCT part sets into
    a<b pairs with one numpy triu per basket (baskets are bounded —
    TPC-H ~4-7 items — so the expansion is O(items^2) per basket, not
    corpus-quadratic) and emits per-pair PARTIAL counts; a second
    shuffle bucketed BY PAIR folds them — only there is the top-20
    prune sound (a pair lives in exactly one pair-bucket, so its
    bucket-local total IS global; pruning in the orderkey buckets
    would drop partials of pairs whose orders straddle buckets) —
    before the deterministic (n desc, pair asc) driver cut of
    O(buckets x 20) rows."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        o = df["l_orderkey"].astype("int64")
        return pd.DataFrame({"o": o, "p": df["l_partkey"].astype("int64"),
                             "_b": o % B})

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized a<b expansion: one hash self-merge on the basket
        # key (baskets are bounded, so the join fan-out is O(items^2)
        # per basket) — no Python loop over the bucket's baskets
        g = g.drop_duplicates(["o", "p"])[["o", "p"]]
        m = g.merge(g, on="o", suffixes=("_a", "_b"))
        m = m.loc[m["p_a"] < m["p_b"]]
        out = m.groupby(["p_a", "p_b"], as_index=False).size() \
            .rename(columns={"size": "n_orders",
                             "p_a": "part_a", "p_b": "part_b"})
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    partials = ds.map_batches(add_bucket, batch_format="pandas",
                              batch_size=65536) \
        .groupby("_b").map_groups(pairs_bucket, batch_format="pandas")
    out = _bucketed_combine(
        partials, ["part_a", "part_b"], {"n_orders": "sum"},
        topk=(20, ["n_orders", "part_a", "part_b"],
              [False, True, True]))
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values(["n_orders", "part_a", "part_b"],
                           ascending=[False, True, True]) \
        .head(20).reset_index(drop=True)


# exact SQL mirror: distinct-per-basket a<b self-join, same cut
SQL_BASKET_PAIRS = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT CAST(a.l_partkey AS BIGINT) AS part_a,
       CAST(b.l_partkey AS BIGINT) AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM d a JOIN d b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""


def q_user_mode_event(sf_dir: str):
    """MODE aggregate (argmax-of-count per key): each user's most
    frequent event type with its count and the user's event total —
    SQL's mode()/top-1 window, the categorical summary a feature store
    materializes per entity. Per-batch (user, type, n) partials
    shrink the shuffle to distinct pairs per batch; ONE shuffle
    bucketed by user folds them and takes the per-user argmax with a
    deterministic (n desc, type asc) tie — a user lives in one bucket,
    so the bucket argmax IS global. Output is O(users)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    B = _pair_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["user_id"] = g["user_id"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return g.assign(_b=g["user_id"] % B)

    def argmax_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "event_type"], as_index=False)["n"].sum()
        s = s.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True])
        tot = s.groupby("user_id")["n"].transform("sum")
        s = s.assign(n_events=tot)
        top = s.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": top["user_id"].astype("int64"),
            "mode_type": top["event_type"],
            "mode_n": top["n"].astype("int64"),
            "n_events": top["n_events"].astype("int64"),
        })

    return ds.map_batches(partial, batch_format="pandas",
                          batch_size=65536) \
        .groupby("_b").map_groups(argmax_bucket, batch_format="pandas")


# exact SQL mirror: same (n desc, type asc) deterministic tie
SQL_USER_MODE_EVENT = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type
),
r AS (
  SELECT user_id, event_type, n,
         SUM(n) OVER (PARTITION BY user_id) AS n_events,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c
)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS mode_type,
       CAST(n AS BIGINT) AS mode_n, CAST(n_events AS BIGINT) AS n_events
FROM r WHERE rn = 1
"""


def q_repeat_customers(sf_dir: str):
    """INTERSECT set op (completing the union / EXCEPT family):
    customers who ordered in BOTH 1996 and 1997, rolled up to counts
    per market segment. One pushed-down year-filtered read; per-batch
    DISTINCT (custkey, year) partials; ONE shuffle bucketed by custkey
    where presence in both years is a vectorized 2-row check per key
    (a customer lives in one bucket); the segment lookup rides the
    same shuffle as tagged dim rows (the lost_customers three-way
    pattern), so the driver folds only O(segments) rows."""
    y96 = (pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01"))
    y97 = (pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01"))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"],
                   filter=(pc.field("o_orderdate") >= pa.scalar(y96[0]))
                   & (pc.field("o_orderdate") < pa.scalar(y97[1])))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    B = _pair_buckets()

    def order_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"]
        yr = np.where(d < y96[1], 1996, 1997).astype(np.int64)
        out = pd.DataFrame({"key": df["o_custkey"].astype("int64"),
                            "yr": yr}).drop_duplicates()
        out["seg"] = ""
        return out.assign(_b=out["key"] % B)

    def dim_part(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"key": df["c_custkey"].astype("int64"),
                            "yr": np.int64(0),
                            "seg": df["c_mktsegment"]})
        return out.assign(_b=out["key"] % B)

    def both_years(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["yr"] > 0].drop_duplicates(["key", "yr"])
        n_years = o.groupby("key")["yr"].nunique()
        keep = set(n_years[n_years == 2].index)
        d = g.loc[(g["yr"] == 0) & g["key"].isin(keep)]
        if d.empty:
            return pd.DataFrame(
                {"c_mktsegment": pd.Series([], dtype="object"),
                 "n_customers": pd.Series([], dtype="int64")})
        out = d.groupby("seg", as_index=False).size() \
            .rename(columns={"size": "n_customers", "seg": "c_mktsegment"})
        out["n_customers"] = out["n_customers"].astype("int64")
        return out[["c_mktsegment", "n_customers"]]

    parts = orders.map_batches(order_part, batch_format="pandas",
                               batch_size=65536) \
        .union(cust.map_batches(dim_part, batch_format="pandas")) \
        .groupby("_b").map_groups(both_years, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("c_mktsegment", as_index=False)["n_customers"].sum()
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# exact SQL mirror: INTERSECT of the two yearly custkey sets
SQL_REPEAT_CUSTOMERS = """
WITH both_y AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
  INTERSECT
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer JOIN both_y ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q_price_quantity_hist2d(sf_dir: str):
    """2-D profiling histogram: joint (price band x quantity) counts
    over lineitem — the bivariate scatter summary a profiler or BI
    heatmap consumes, and the 2-D sibling of q_price_histogram.
    Stateless shape: each batch emits its partial 2-D bincount as
    (price_band, qty, n) rows (<= bands x qtys per batch regardless
    of batch size, fully vectorized integer banding); one bounded
    combine folds them. All-integer cells, no shuffle of raw rows."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])
    BAND = 10_000  # price band width in whole currency units

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        band = (df["l_extendedprice"].to_numpy(dtype=np.float64)
                // BAND).astype(np.int64)
        qty = np.floor(df["l_quantity"].to_numpy(dtype=np.float64)
                       + 0.5).astype(np.int64)
        g = pd.DataFrame({"price_band": band, "qty": qty}) \
            .groupby(["price_band", "qty"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    out = ds.map_batches(partial, batch_format="pandas",
                         batch_size=65536).to_pandas() \
        .groupby(["price_band", "qty"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["price_band", "qty"]).reset_index(drop=True)


# exact SQL mirror: same integer banding (floor-div on price, round on
# quantity)
SQL_PRICE_QUANTITY_HIST2D = """
SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS price_band,
       CAST(ROUND(l_quantity) AS BIGINT) AS qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY 1, 2
"""


def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check in one O(len) pass (the verify
    step after SymSpell blocking; full DP never runs)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # one substitution allowed
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0  # a is shorter: one skip in b allowed
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _lev(a: str, b: str) -> int:
    """Unit-cost Levenshtein (DuckDB's levenshtein twin) — banded to
    early-exit is unnecessary at catalog name lengths."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def q_sorted_neighborhood_pairs(sf_dir: str):
    """Sorted-neighborhood blocking — the OTHER classic
    entity-resolution blocking scheme (vs :func:`q_fuzzy_name_matches`'
    SymSpell deletion blocking): sort the distinct name vocabulary and
    compare only names within a window of 3 positions, verifying with
    exact edit distance <= 2. Sorted-neighborhood catches near-misses
    that share a long PREFIX regardless of where the edit is; deletion
    blocking catches ed=1 anywhere but misses ed=2 — running both is
    the standard production recipe, and this row supplies the second
    leg.

    Shape: the distinct-name fold is the distributed part (bounded
    part-name vocabulary, the fuzzy_name_matches discipline); the
    sorted window enumeration is O(w * vocab) driver work on the
    bounded vocabulary, and the DP verification of the 3*V candidate
    pairs fans back out through map_batches. lev_dist is exact integer
    edit distance on both sides; the <= 5 acceptance bound is tuned to
    this catalog's two-to-three-word names (ed <= 2 is near-empty
    here, ed <= 5 keeps one-word-apart neighbors)."""
    ds = _read(sf_dir, "part", ["p_name"])
    W = 3

    def name_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["p_name"]].drop_duplicates()
        return out.assign(one=np.int64(1))

    names = _bucketed_combine(
        ds.map_batches(name_partial, batch_format="pandas",
                       batch_size=65536), ["p_name"], {"one": "max"})
    vocab = sorted(names["p_name"])
    cand = []
    for d in range(1, W + 1):
        cand.extend((vocab[i], vocab[i + d])
                    for i in range(len(vocab) - d))
    cdf = pd.DataFrame(cand, columns=["name_a", "name_b"])
    cds = ray.data.from_pandas(cdf).repartition(max(8, _cpus()))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        dist = np.array([_lev(a, b) for a, b in
                         zip(df["name_a"], df["name_b"])], dtype=np.int64)
        out = df.assign(lev_dist=dist)
        return out.loc[out["lev_dist"] <= 5]

    out = cds.map_batches(verify, batch_format="pandas").to_pandas()
    if out.empty:
        out = pd.DataFrame({"name_a": pd.Series([], dtype="object"),
                            "name_b": pd.Series([], dtype="object"),
                            "lev_dist": pd.Series([], dtype="int64")})
    out["lev_dist"] = out["lev_dist"].astype("int64")
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


SQL_SORTED_NEIGHBORHOOD_PAIRS = """
WITH n AS (SELECT DISTINCT p_name FROM part),
r AS (SELECT p_name, row_number() OVER (ORDER BY p_name) AS rn FROM n)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev_dist
FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3
WHERE levenshtein(a.p_name, b.p_name) <= 5
"""


def q_fuzzy_name_matches(sf_dir: str):
    """Approximate string matching via SymSpell deletion blocking
    (public algorithm): pairs of DISTINCT part names at edit distance
    exactly 1, with each name's part count — the entity-resolution /
    typo-clustering primitive. The scale story is the blocking: a
    name's candidate set is every name sharing an entry of
    {name} ∪ single-deletions(name), so candidates are found by ONE
    shuffle of (variant, name) rows bucketed by variant hash — never a
    vocabulary^2 scan (the SQL oracle's all-pairs levenshtein IS that
    quadratic check, feasible only because the name vocabulary is
    bounded). Within a bucket, pairs sharing a variant are verified
    with an O(len) ed<=1 pass; a second shuffle bucketed by pair
    dedupes pairs that shared variants across buckets. Name counts
    come from the catalog-standard bucketed combine."""
    ds = _read(sf_dir, "part", ["p_name"])
    B = _pair_buckets()

    def name_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_name", as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    names = _bucketed_combine(
        ds.map_batches(name_partial, batch_format="pandas",
                       batch_size=65536), ["p_name"], {"n": "sum"})
    # from_pandas yields ONE block — without a repartition the whole
    # vocabulary's variant expansion would run as a single task
    nds = ray.data.from_pandas(names.reset_index(drop=True)) \
        .repartition(B)

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        rows_v, rows_n, rows_c = [], [], []
        for nm, cnt in zip(df["p_name"], df["n"]):
            vs = {nm} | {nm[:i] + nm[i + 1:] for i in range(len(nm))}
            rows_v.extend(vs)
            rows_n.extend([nm] * len(vs))
            rows_c.extend([int(cnt)] * len(vs))
        out = pd.DataFrame({"v": rows_v, "name": rows_n, "n": rows_c})
        h = pd.util.hash_array(out["v"].to_numpy(dtype=object)) % B
        return out.assign(_b=h.astype("int64"))

    def candidate_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="v", suffixes=("_a", "_b"))
        m = m.loc[m["name_a"] < m["name_b"],
                  ["name_a", "name_b", "n_a", "n_b"]].drop_duplicates(
                      ["name_a", "name_b"])
        keep = [_ed_le1(a, b) for a, b in zip(m["name_a"], m["name_b"])]
        m = m.loc[keep]
        h = pd.util.hash_array(
            (m["name_a"] + "\x1f" + m["name_b"]).to_numpy(dtype=object)) % B
        return m.assign(_b2=h.astype("int64"))

    def dedupe_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["name_a", "name_b"])
        return pd.DataFrame({
            "name_a": out["name_a"], "name_b": out["name_b"],
            "n_parts_a": out["n_a"].astype("int64"),
            "n_parts_b": out["n_b"].astype("int64"),
        })

    out = nds.map_batches(variants, batch_format="pandas") \
        .groupby("_b").map_groups(candidate_pairs, batch_format="pandas") \
        .groupby("_b2").map_groups(dedupe_pairs, batch_format="pandas") \
        .to_pandas()
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


# oracle: the quadratic all-pairs levenshtein the blocking replaces —
# feasible because the name vocabulary is bounded
SQL_FUZZY_NAME_MATCHES = """
WITH n AS (SELECT p_name, CAST(COUNT(*) AS BIGINT) AS np
           FROM part GROUP BY p_name)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       a.np AS n_parts_a, b.np AS n_parts_b
FROM n a JOIN n b
  ON a.p_name < b.p_name AND levenshtein(a.p_name, b.p_name) = 1
"""


def q_user_longest_streak(sf_dir: str):
    """Longest STREAK per user: the maximum run of consecutive
    identical event types under the (ts, event_id) total order, and
    which type it was — the run-length flavor of gaps-and-islands
    (q_session_stats islands on time gaps; this islands on value
    changes), the engagement-streak metric. One bounded shuffle by
    user hash; each bucket detects runs in one vectorized
    change-flag + cumsum pass over thousands of users, reduces to
    per-user argmax with a deterministic (len desc, type asc) tie, and
    emits one row per user."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    B = _pair_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_b=df["user_id"].astype("int64") % B)

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new_run = g["user_id"].ne(g["user_id"].shift()) \
            | g["event_type"].ne(g["event_type"].shift())
        run_id = new_run.cumsum()
        runs = pd.DataFrame({"user_id": g["user_id"].astype("int64"),
                             "event_type": g["event_type"],
                             "run": run_id}) \
            .groupby(["user_id", "run", "event_type"], as_index=False) \
            .size().rename(columns={"size": "streak"})
        # same-length same-type runs collapse before the argmax so the
        # tie order matches the SQL mirror's DISTINCT
        runs = runs.drop_duplicates(["user_id", "event_type", "streak"])
        runs = runs.sort_values(["user_id", "streak", "event_type"],
                                ascending=[True, False, True])
        top = runs.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": top["user_id"].astype("int64"),
            "streak_type": top["event_type"],
            "streak_len": top["streak"].astype("int64"),
        })

    return ds.map_batches(add_bucket, batch_format="pandas",
                          batch_size=65536) \
        .groupby("_b").map_groups(streaks, batch_format="pandas")


# exact SQL mirror: islands via the rn-difference trick, same
# (len desc, type asc) argmax over DISTINCT (user, type, len)
SQL_USER_LONGEST_STREAK = """
WITH o AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rnt
  FROM events
),
runs AS (
  SELECT DISTINCT user_id, event_type,
         COUNT(*) OVER (PARTITION BY user_id, event_type, rn - rnt)
           AS streak
  FROM o
),
ranked AS (
  SELECT user_id, event_type, streak,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY streak DESC, event_type) AS k
  FROM (SELECT DISTINCT user_id, event_type, streak FROM runs)
)
SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS streak_type,
       CAST(streak AS BIGINT) AS streak_len
FROM ranked WHERE k = 1
"""


def q_cms_token_counts(sf_dir: str):
    """Count-min sketch point estimates gated against exact counts —
    completing the sketch family (Bloom membership, HLL distinct,
    SpaceSaving heavy hitters, mergeable quantiles, and now CMS
    frequency estimation, the sketch that answers "how often is key X"
    in O(d*w) memory however large the vocabulary). One streamed pass
    emits BOTH the per-batch (d x w) CMS blob (one int64 grid per
    batch, folded by plain addition on the driver) and the exact
    partial counts that feed the catalog-standard bucketed top-20 cut;
    the CMS is then point-queried for those 20 tokens. Gates (the
    hh_bounds_ok pattern): the DETERMINISTIC overestimate property
    est >= exact raises on violation (it cannot fail absent a bug);
    the 2N/w tightness bound with 4x slack is PROBABILISTIC (holds
    with prob ~1 - 8^-d per queried token), so it is emitted as a
    computed per-token column rather than asserted — a legitimate
    miss on some corpus surfaces as an oracle value mismatch at
    sample scale, not a crash."""
    from .functions import sketch as S

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B = _pair_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        cms = S.cms_partial(t["token"])
        g = t.groupby("token", as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        h = pd.util.hash_array(g["token"].to_numpy(dtype=object)) % B
        g["_b"] = h.astype("int64")
        g["cms"] = None
        # the CMS blob rides the first row of the partial frame
        g.loc[g.index[:1], "cms"] = [cms.tobytes()] if len(g) else None
        return g

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).materialize()
    blobs = parts.map_batches(
        lambda df: pd.DataFrame(
            {"cms": df["cms"].dropna().tolist()}),
        batch_format="pandas").to_pandas()
    cms = S.cms_merge([np.frombuffer(b, dtype=np.int64)
                       .reshape(S.CMS_D, S.CMS_W) for b in blobs["cms"]])
    n_total = int(cms[0].sum())

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out.sort_values(["n", "token"],
                               ascending=[False, True]).head(20)

    top = parts.groupby("_b").map_groups(combine, batch_format="pandas") \
        .to_pandas().sort_values(["n", "token"], ascending=[False, True]) \
        .head(20).reset_index(drop=True)
    est = S.cms_query(cms, top["token"])
    exact = top["n"].to_numpy(dtype=np.int64)
    if (est < exact).any():
        raise AssertionError("cms_overest_ok violated: est < exact")
    slack = 4 * int(np.ceil(2 * n_total / S.CMS_W))
    return pd.DataFrame({"token": top["token"], "n": exact,
                         "cms_overest_ok": True,
                         "cms_tight_ok": est - exact <= slack})


# exact SQL mirror: exact top-20 counts; on the Ray side overest is a
# hard in-query raise (deterministic CMS property) while tight_ok is
# the computed probabilistic bound — a miss diffs instead of crashing
SQL_CMS_TOKEN_COUNTS = r"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT unnest(string_split(nt, ' ')) AS token
  FROM norm WHERE length(nt) > 0
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS cms_overest_ok, TRUE AS cms_tight_ok
FROM tok GROUP BY token
ORDER BY n DESC, token LIMIT 20
"""


def q_order_count_distribution(sf_dir: str):
    """Frequency-of-frequencies (the Good-Turing profile): how many
    customers placed exactly K orders, for each K — the group-size
    distribution a capacity planner or smoothing estimator reads. Two
    cascaded aggregations, both partial-then-combine: per-batch
    per-customer counts -> ONE bucketed shuffle makes them global (a
    customer lives in one bucket) and each bucket emits its (K ->
    n_customers) partial histogram -> the driver folds O(buckets x
    distinct K) tiny rows. Distinct K is bounded by the max group
    size, never by the customer count."""
    ds = _read(sf_dir, "orders", ["o_custkey"])
    B = _pair_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).size() \
            .rename(columns={"size": "k"})
        g["k"] = g["k"].astype("int64")
        return g.assign(_b=g["o_custkey"].astype("int64") % B)

    def hist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("o_custkey", as_index=False)["k"].sum()
        out = per.groupby("k", as_index=False).size() \
            .rename(columns={"size": "n_customers"})
        out["n_customers"] = out["n_customers"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536) \
        .groupby("_b").map_groups(hist_bucket, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("k", as_index=False)["n_customers"].sum()
    out["n_customers"] = out["n_customers"].astype("int64")
    return out.sort_values("k").reset_index(drop=True)


# exact SQL mirror: two-level aggregate
SQL_ORDER_COUNT_DISTRIBUTION = """
WITH c AS (SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY o_custkey)
SELECT CAST(k AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM c GROUP BY k
"""


def q_price_median_cont(sf_dir: str):
    """Interpolated median (SQL PERCENTILE_CONT / quantile_cont) per
    return flag — completing the quantile family: the catalog's other
    quantiles are exact order STATISTICS (percentile_disc); this
    interpolates between the two adjacent ones at h = (n-1)*q, the
    estimator BI tools default to. Both bracketing order statistics of
    every group narrow in the SAME histogram scans (two (lo, hi, rank)
    triples per group driver-side), and identical (group, lo, hi)
    ranges are deduped so ONE histogram serves both ranks — they share
    bounds through nearly every pass (the q_group_percentiles rule);
    the interpolation v_lo + frac*(v_hi - v_lo) is one float
    expression over two exact data values, identical on both sides."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    BINS = 512
    Q = 0.5

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_returnflag")["l_extendedprice"].agg(
            n="count", lo="min", hi="max").reset_index()

    parts = ds.map_batches(stats, batch_format="pandas",
                           batch_size=65536).to_pandas()
    agg = parts.groupby("l_returnflag").agg(
        n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
    # per group: h = (n-1)*Q; need 1-based ranks floor(h)+1 and
    # (if fractional) floor(h)+2
    state: dict[tuple, list] = {}
    fracs: dict[str, float] = {}
    for g, r in agg.iterrows():
        h = (int(r["n"]) - 1) * Q
        lo_rank = int(np.floor(h)) + 1
        fracs[g] = h - np.floor(h)
        ranks = [lo_rank] if fracs[g] == 0 else [lo_rank, lo_rank + 1]
        for rk in ranks:
            state[(g, rk)] = [float(r["lo"]),
                              float(np.nextafter(r["hi"], np.inf)),
                              rk, False]

    def _uniq_ranges(keys: dict) -> tuple[dict, dict]:
        """Dedupe identical (g, lo, hi) ranges: both bracketing ranks
        of a group share bounds until the last passes, so ONE
        histogram / value-collect serves both (q_group_percentiles'
        uniq-range rule). Returns ({g: [(uid, lo, hi)]},
        {(g, uid): [rk, ...]})."""
        uniq: dict[tuple, list] = {}
        for (g, rk), (lo, hi) in keys.items():
            uniq.setdefault((g, lo, hi), []).append(rk)
        by_grp: dict[str, list] = {}
        range_rks: dict[tuple, list] = {}
        for uid, ((g, lo, hi), rks) in enumerate(uniq.items()):
            by_grp.setdefault(g, []).append((uid, lo, hi))
            range_rks[(g, uid)] = rks
        return by_grp, range_rks

    for _ in range(6):
        open_keys = {k: (s[0], s[1]) for k, s in state.items() if not s[3]}
        if not open_keys:
            break
        by_grp, range_rks = _uniq_ranges(open_keys)
        b_ref = ray.put(by_grp)

        def hist(df: pd.DataFrame, _b=b_ref) -> pd.DataFrame:
            b = ray.get(_b)
            rows = []
            for grp, sub in df.groupby("l_returnflag"):
                if grp not in b:
                    continue
                v_all = sub["l_extendedprice"].to_numpy()
                for uid, lo, hi in b[grp]:
                    v = v_all[(v_all >= lo) & (v_all < hi)]
                    h, _ = np.histogram(
                        v, bins=np.linspace(lo, hi, BINS + 1))
                    rows.append((grp, uid, h.astype(np.int64).tobytes()))
            return pd.DataFrame(rows, columns=["g", "uid", "h"]) if rows \
                else pd.DataFrame({"g": pd.Series([], dtype="object"),
                                   "uid": pd.Series([], dtype="int64"),
                                   "h": pd.Series([], dtype="object")})

        hp = ds.map_batches(hist, batch_format="pandas",
                            batch_size=65536).to_pandas()
        for (g, uid), rks in range_rks.items():
            total = np.zeros(BINS, dtype=np.int64)
            sel = (hp["g"] == g) & (hp["uid"] == uid)
            for buf in hp.loc[sel, "h"]:
                total += np.frombuffer(buf, dtype=np.int64)
            cum = np.cumsum(total)
            for rk in rks:  # same histogram, each rank's own position
                lo, hi, rank, _ = state[(g, rk)]
                edges = np.linspace(lo, hi, BINS + 1)
                bi = int(np.searchsorted(cum, rank))
                new_rank = rank - (int(cum[bi - 1]) if bi else 0)
                done = bool(total[bi] <= 100_000)
                state[(g, rk)] = [float(edges[bi]), float(edges[bi + 1]),
                                  new_rank, done]

    fin_by_grp, fin_rks = _uniq_ranges(
        {k: (s[0], s[1]) for k, s in state.items()})
    fin_ref = ray.put(fin_by_grp)

    def in_range(df: pd.DataFrame, _b=fin_ref) -> pd.DataFrame:
        b = ray.get(_b)
        keep = []
        for grp, sub in df.groupby("l_returnflag"):
            if grp not in b:
                continue
            v = sub["l_extendedprice"].to_numpy()
            for uid, lo, hi in b[grp]:
                keep.append(pd.DataFrame(
                    {"g": grp, "uid": uid, "v": v[(v >= lo) & (v < hi)]}))
        return pd.concat(keep, ignore_index=True) if keep else \
            pd.DataFrame({"g": pd.Series([], dtype="object"),
                          "uid": pd.Series([], dtype="int64"),
                          "v": pd.Series([], dtype="float64")})

    vals = ds.map_batches(in_range, batch_format="pandas").to_pandas()
    picked: dict[tuple, float] = {}
    for (g, uid), rks in fin_rks.items():
        sub = np.sort(vals.loc[(vals["g"] == g) & (vals["uid"] == uid),
                               "v"].to_numpy())
        for rk in rks:
            picked[(g, rk)] = float(sub[state[(g, rk)][2] - 1])
    rows = []
    for g, r in agg.iterrows():
        h = (int(r["n"]) - 1) * Q
        lo_rank = int(np.floor(h)) + 1
        v_lo = picked[(g, lo_rank)]
        if fracs[g] == 0:
            m = v_lo
        else:
            v_hi = picked[(g, lo_rank + 1)]
            m = v_lo + fracs[g] * (v_hi - v_lo)
        rows.append((g, m))
    return pd.DataFrame(rows, columns=["l_returnflag", "median_cont"]) \
        .sort_values("l_returnflag").reset_index(drop=True)


# exact SQL mirror: DuckDB quantile_cont interpolates with the same
# v_lo + frac*(v_hi - v_lo) formula over the same doubles
SQL_PRICE_MEDIAN_CONT = """
SELECT l_returnflag,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS median_cont
FROM lineitem GROUP BY l_returnflag
"""


def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE(o_orderstatus, o_orderpriority) — the full
    grouping-sets lattice, completing q_rollup_revenue (which only
    walks the hierarchy): base + both one-dimension marginals + grand
    total. Same scale discipline: the base aggregate is ONE
    distributed scan over a provably tiny key space
    (_partial_group_sum), and all 2^d - 1 super-aggregates are DERIVED
    from the base rows at O(groups) cost — never one scan per grouping
    set. Rolled-up dimensions use the 'ALL' sentinel on both sides."""
    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    base = _partial_group_sum(ds, ["o_orderstatus", "o_orderpriority"],
                              {"rev": "o_totalprice"}, counts="n_orders")
    by_status = base.groupby("o_orderstatus", as_index=False).agg(
        rev=("rev", "sum"), n_orders=("n_orders", "sum"))
    by_status["o_orderpriority"] = "ALL"
    by_pri = base.groupby("o_orderpriority", as_index=False).agg(
        rev=("rev", "sum"), n_orders=("n_orders", "sum"))
    by_pri["o_orderstatus"] = "ALL"
    total = pd.DataFrame({
        "o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
        "rev": [base["rev"].sum()], "n_orders": [base["n_orders"].sum()]})
    out = pd.concat([base, by_status, by_pri, total], ignore_index=True)
    out["rev"] = out["rev"].astype(float).round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out[["o_orderstatus", "o_orderpriority", "rev", "n_orders"]] \
        .sort_values(["o_orderstatus", "o_orderpriority"]) \
        .reset_index(drop=True)


SQL_CUBE_REVENUE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS rev,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation matrix over k numeric columns
    (l_quantity, l_extendedprice, l_discount) in ONE streaming pass —
    the multi-column generalization of q_value_hour_corr and the
    feature-redundancy screen run before model training. Each batch
    emits the k + k(k+1)/2 + 1 raw moments (n, per-column sums, the
    full upper-triangular cross-product matrix via one X^T X matmul);
    the driver folds O(k^2) numbers per batch and closes every pair's
    correlation. Zero shuffle, cost independent of row count beyond
    the scan."""
    COLS = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _read(sf_dir, "lineitem", COLS)
    k = len(COLS)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df[COLS].to_numpy(dtype=np.float64)
        xtx = x.T @ x  # all squares + cross-products in one matmul
        row = {"n": float(len(x))}
        for i, c in enumerate(COLS):
            row[f"s{i}"] = x[:, i].sum()
            for j in range(i, k):
                row[f"p{i}{j}"] = xtx[i, j]
        return pd.DataFrame([row])

    m = ds.map_batches(moments, batch_format="pandas",
                       batch_size=65536).to_pandas().sum()
    n = m["n"]
    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            cov = m[f"p{i}{j}"] - m[f"s{i}"] * m[f"s{j}"] / n
            vi = m[f"p{i}{i}"] - m[f"s{i}"] ** 2 / n
            vj = m[f"p{j}{j}"] - m[f"s{j}"] ** 2 / n
            rows.append((COLS[i], COLS[j],
                         round(float(cov / np.sqrt(vi * vj)), 4)))
    return pd.DataFrame(rows, columns=["col_a", "col_b", "corr"]) \
        .sort_values(["col_a", "col_b"]).reset_index(drop=True)


SQL_CORR_MATRIX = """
SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
       ROUND(corr(l_quantity, l_extendedprice), 4) AS corr FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_discount',
       ROUND(corr(l_quantity, l_discount), 4) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_discount',
       ROUND(corr(l_extendedprice, l_discount), 4) FROM lineitem
"""


def q_benford_digits(sf_dir: str):
    """Benford's-law first-digit profile of o_totalprice — the
    classic fraud / synthetic-data screen: organic magnitude-spanning
    amounts put ~30.1% of first digits at 1, and a flat profile
    betrays generated values. Prices are fixed to integer cents with
    the hist2d floor(x*100 + 0.5) rule (identical double math on both
    sides), the leading digit is taken from the exact int64 decimal
    string (no log10 — its ulp error near powers of 10 could misbin),
    and each batch emits a <= 9-row partial the driver folds. The
    observed share sits next to the Benford expectation log10(1+1/d)
    so the output IS the comparison. Zero shuffle."""
    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        d = pd.Series(cents).astype(str).str[0].astype(np.int64)
        g = d.value_counts().sort_index()
        return pd.DataFrame({"digit": g.index.to_numpy(np.int64),
                             "n": g.to_numpy(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    out = parts.groupby("digit", as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    total = int(out["n"].sum())
    out["pct"] = out["n"] / total  # identical int ratio on both sides
    out["benford_pct"] = np.round(np.log10(1.0 + 1.0 / out["digit"]
                                           .to_numpy(np.float64)), 4)
    return out.sort_values("digit").reset_index(drop=True)


# same integer-cents fix and int-string leading digit; LOG10 of the
# small rationals 1+1/d is ulp-identical across libm for these 9 values
# and both sides round it to 4
SQL_BENFORD_DIGITS = """
WITH d AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
)
SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
       COUNT(*) * 1.0 / SUM(COUNT(*)) OVER () AS pct,
       ROUND(LOG10(1.0 + 1.0 / digit), 4) AS benford_pct
FROM d GROUP BY digit ORDER BY digit
"""


def _grouped_value_ranges(ds: ray.data.Dataset, grp: str, val: str,
                          nr: int):
    """Shared first two passes of the rank-decomposition kernels
    (q_gini_by_priority / q_trimmed_mean): (1) one-scan per-group
    (n, sum, min, max) probe fixing nr value ranges per group; (2) one
    scan emitting per-batch (grp, value, count) partials tagged with
    their range id and a 'grp|rng' shuffle key, materialized ONCE;
    (3) O(groups x nr) range subtotals folded into exclusive prefix
    offsets on the driver. Returns (agg, parts, offs) — the consumer
    adds its own per-range map_groups kernel over ``parts`` keyed by
    ``key``, reading each range's offset from ``offs``."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(grp)[val].agg(
            n="count", s="sum", lo="min", hi="max").reset_index()

    agg = ds.map_batches(stats, batch_format="pandas",
                         batch_size=65536).to_pandas() \
        .groupby(grp).agg(n=("n", "sum"), s=("s", "sum"),
                          lo=("lo", "min"), hi=("hi", "max"))
    widths = {g: max((r["hi"] - r["lo"]) / nr, 1e-12)
              for g, r in agg.iterrows()}
    lows = {g: float(r["lo"]) for g, r in agg.iterrows()}
    w_ref = ray.put((widths, lows))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        widths_d, lows_d = ray.get(w_ref)
        g = df.groupby([grp, val], as_index=False).size() \
            .rename(columns={"size": "c"})
        v = g[val].to_numpy(np.float64)
        wv = g[grp].map(widths_d).to_numpy(np.float64)
        lv = g[grp].map(lows_d).to_numpy(np.float64)
        rng = np.clip(((v - lv) / wv).astype(np.int64), 0, nr - 1)
        g["c"] = g["c"].astype("int64")
        g["rng"] = rng
        g["key"] = g[grp] + "|" + rng.astype(str)
        return g

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).materialize()
    sums = _partial_group_sum(parts, [grp, "rng"], {"tot": "c"}) \
        .sort_values([grp, "rng"])
    sums["off"] = sums.groupby(grp)["tot"].cumsum() - sums["tot"]
    offs = {(r[grp], int(r["rng"])): int(r["off"])
            for _, r in sums.iterrows()}
    return agg, parts, offs


def q_gini_by_priority(sf_dir: str):
    """Exact Gini concentration coefficient of o_totalprice per order
    priority — the inequality metric a curation pipeline reads to see
    how skewed a source's contribution distribution is (G = 0 uniform,
    G -> 1 winner-take-all). Uses the rank-sum identity
    G = 2*sum(i*v_i)/(n*sum(v)) - (n+1)/n over ascending-sorted values,
    computed WITHOUT any global sort: sum(i*v_i) decomposes over
    distinct values as v*(c*C + c*(c+1)/2) where c is the value's
    count and C the count of strictly smaller values, so it needs only
    per-(group, value) counts plus a prefix count over the value
    domain. That prefix is the vocab_growth/shard_packing range-bucket
    two-pass shape, shared with q_trimmed_mean as
    :func:`_grouped_value_ranges`: per-batch (group, value, count)
    partials tagged with a value-range id, range subtotals folded to
    exclusive offsets (O(groups x ranges) driver rows), then ONE
    shuffle co-locates each range, where an intra-range sort + cumsum
    is bounded by the range, never the group. Ties are exact: the
    rank-sum of a tied block is order-invariant, so no tie-break is
    needed on either side."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    agg, parts, offs = _grouped_value_ranges(
        ds, "o_orderpriority", "o_totalprice", 64)
    offs_ref = ray.put(offs)

    def rank_sum(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offs_ref)
        grp = g["o_orderpriority"].iloc[0]
        off = offs[(grp, int(g["rng"].iloc[0]))]
        d = g.groupby("o_totalprice", as_index=False)["c"].sum() \
            .sort_values("o_totalprice")
        c = d["c"].to_numpy(np.int64)
        v = d["o_totalprice"].to_numpy(np.float64)
        C = off + np.concatenate(([0], np.cumsum(c)[:-1]))
        rs = float((v * (c * C + c * (c + 1) / 2.0)).sum())
        return pd.DataFrame({"grp": [grp], "rs": [rs]})

    rs = parts.groupby("key").map_groups(rank_sum, batch_format="pandas") \
        .to_pandas().groupby("grp", as_index=False)["rs"].sum()
    out = rs.merge(agg.reset_index(), left_on="grp",
                   right_on="o_orderpriority")
    n, s = out["n"].astype(float), out["s"].astype(float)
    out["gini"] = (2.0 * out["rs"] / (n * s) - (n + 1.0) / n).round(6)
    return out[["o_orderpriority", "gini"]] \
        .sort_values("o_orderpriority").reset_index(drop=True)


# oracle: the same rank-sum identity via row_number — rank-sums of
# tied blocks are order-invariant, so the arbitrary tie order of
# row_number cannot diverge from the Ray side's closed form
SQL_GINI_BY_PRIORITY = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
         SUM(o_totalprice) OVER (PARTITION BY o_orderpriority) AS s
  FROM orders
)
SELECT o_orderpriority,
       ROUND(2.0 * SUM(rn * v) / (MAX(n) * MAX(s))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini
FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_global_rank(sf_dir: str):
    """Global ROW_NUMBER over a whole table (ORDER BY o_totalprice,
    o_orderkey) WITHOUT a global sort — the distributed rank-assignment
    primitive behind ordered exports, pagination, and percentile
    transforms. Range-partitioned two-pass shape: a one-scan min/max
    probe fixes NR value ranges; the tagged rows materialize ONCE; per-
    range counts (O(NR) driver rows) fold into exclusive offsets; ONE
    shuffle co-locates each range, where an intra-range sort bounded by
    the range (never the table) assigns rank = offset + local position.
    The (value, key) total order makes ranks deterministic under ties.
    Skew note: a single hot VALUE lands in one range by construction —
    for known-degenerate distributions the range probe should histogram
    first (the rfm integer-edge pattern) instead of linspace."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    NR = max(64, 4 * _cpus())

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_totalprice"]
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()]})

    st = ds.map_batches(stats, batch_format="pandas",
                        batch_size=65536).to_pandas()
    lo, hi = float(st["lo"].min()), float(st["hi"].max())
    width = max((hi - lo) / NR, 1e-12)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        v = df["o_totalprice"].to_numpy(np.float64)
        rng = np.clip(((v - lo) / width).astype(np.int64), 0, NR - 1)
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].astype("int64"),
                             "v": v, "rng": rng})

    parts = ds.map_batches(tag, batch_format="pandas",
                           batch_size=65536).materialize()
    sums = _partial_group_sum(parts, ["rng"], {}, counts="c") \
        .sort_values("rng")
    offs = dict(zip(sums["rng"].astype(int),
                    (sums["c"].cumsum() - sums["c"]).astype(int)))
    offs_ref = ray.put(offs)

    def rank_range(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["rng"].iloc[0])]
        g = g.sort_values(["v", "o_orderkey"])
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
            "rnk": off + np.arange(1, len(g) + 1, dtype=np.int64)})

    return parts.groupby("rng").map_groups(rank_range,
                                           batch_format="pandas")


SQL_GLOBAL_RANK = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk
FROM orders
"""


def q_cramers_v(sf_dir: str):
    """Cramér's V effect size for event_type x day-of-week — the
    normalized [0,1] companion to the chi-square screen (chi2 grows
    with n, so only V is comparable across corpora; near 0 = usage is
    weekday-independent). Contingency counts fold map-side over the
    provably tiny key space (types x 7); the driver completes the
    R x C grid (absent cells are observed zeros), chi2 and V =
    sqrt(chi2 / (n * min(R-1, C-1))) — every input an exact integer,
    the two outputs mirrored float expressions, round-6. Zero
    shuffle."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "event_type": df["event_type"],
            "dow": df["ts"].dt.dayofweek.astype("int64"),
        }).groupby(["event_type", "dow"], as_index=False).size() \
            .rename(columns={"size": "n"})
        g["n"] = g["n"].astype("int64")
        return g

    base = (ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
            .groupby(["event_type", "dow"], as_index=False)["n"].sum())
    grid = base.pivot(index="event_type", columns="dow",
                      values="n").fillna(0).to_numpy(np.float64)
    n = grid.sum()
    rm = grid.sum(axis=1, keepdims=True)
    cm = grid.sum(axis=0, keepdims=True)
    exp = rm * cm / n
    chi2 = float(((grid - exp) ** 2 / exp).sum())
    r, c = grid.shape
    v = np.sqrt(chi2 / (n * min(r - 1, c - 1)))
    return pd.DataFrame({
        "n_events": pd.Series([int(n)], dtype="int64"),
        "chi2": [_round_away(chi2, 6)],
        "cramers_v": [_round_away(float(v), 6)],
    })


SQL_CRAMERS_V = """
WITH c AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, dayofweek(ts)
), dims AS (
  SELECT (SELECT COUNT(DISTINCT event_type) FROM c) AS r,
         (SELECT COUNT(DISTINCT dow) FROM c) AS cc,
         (SELECT CAST(SUM(n) AS DOUBLE) FROM c) AS n
), full_grid AS (
  SELECT et.event_type, d.dow, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM c) et
  CROSS JOIN (SELECT DISTINCT dow FROM c) d
  LEFT JOIN c ON c.event_type = et.event_type AND c.dow = d.dow
), m AS (
  SELECT g.event_type, g.dow, CAST(g.n AS DOUBLE) AS o,
         rm.s * cm.s / dims.n AS e
  FROM full_grid g
  JOIN (SELECT event_type, CAST(SUM(n) AS DOUBLE) AS s
        FROM full_grid GROUP BY event_type) rm USING (event_type)
  JOIN (SELECT dow, CAST(SUM(n) AS DOUBLE) AS s
        FROM full_grid GROUP BY dow) cm USING (dow)
  CROSS JOIN dims
), s AS (
  SELECT SUM((o - e) * (o - e) / e) AS chi2 FROM m
)
SELECT CAST(dims.n AS BIGINT) AS n_events,
       ROUND(s.chi2, 6) AS chi2,
       ROUND(sqrt(s.chi2 / (dims.n
             * LEAST(dims.r - 1, dims.cc - 1))), 6) AS cramers_v
FROM s CROSS JOIN dims
"""


def q_independence_stats(sf_dir: str):
    """Chi-square independence test + mutual information between two
    categorical dimensions (o_orderstatus x o_orderpriority) — the
    statistical screen for 'does this column carry signal about that
    one', run before feature selection or stratification. The joint
    contingency table is ONE distributed scan over a provably tiny key
    space (_partial_group_sum); the driver completes the R x C grid
    (absent cells are observed ZEROS — they still contribute their
    expected count to chi2), margins, chi2, dof, and MI over O(R*C)
    numbers. Zero shuffle."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
    base = _partial_group_sum(ds, ["o_orderstatus", "o_orderpriority"],
                              {}, counts="n")
    grid = base.pivot(index="o_orderstatus", columns="o_orderpriority",
                      values="n").fillna(0).to_numpy(np.float64)
    tot = grid.sum()
    e = np.outer(grid.sum(axis=1), grid.sum(axis=0)) / tot
    chi2 = float(((grid - e) ** 2 / e).sum())
    dof = int((grid.shape[0] - 1) * (grid.shape[1] - 1))
    nz = grid > 0
    mi = float((grid[nz] / tot * np.log(grid[nz] * tot
                                        / e[nz] / tot)).sum())
    return pd.DataFrame({"n": [int(tot)], "chi2": [round(chi2, 6)],
                         "dof": [np.int64(dof)], "mi": [round(mi, 6)]})


# mirror: full grid via margin cross-join (observed-zero cells DO
# contribute expected mass to chi2); MI only over observed cells
SQL_INDEPENDENCE_STATS = """
WITH j AS (
  SELECT o_orderstatus s, o_orderpriority p, CAST(COUNT(*) AS DOUBLE) n
  FROM orders GROUP BY 1, 2
),
grid AS (
  SELECT ss.s, pp.p, COALESCE(j.n, 0) AS n
  FROM (SELECT DISTINCT s FROM j) ss
  CROSS JOIN (SELECT DISTINCT p FROM j) pp
  LEFT JOIN j ON j.s = ss.s AND j.p = pp.p
),
t AS (
  SELECT s, p, n, SUM(n) OVER (PARTITION BY s) ns,
         SUM(n) OVER (PARTITION BY p) np, SUM(n) OVER () tot
  FROM grid
)
SELECT CAST(MAX(tot) AS BIGINT) AS n,
       ROUND(SUM((n - ns*np/tot)*(n - ns*np/tot)/(ns*np/tot)), 6) AS chi2,
       CAST((COUNT(DISTINCT s) - 1) * (COUNT(DISTINCT p) - 1) AS BIGINT)
         AS dof,
       ROUND(SUM(CASE WHEN n > 0
                      THEN n/tot * LN(n*tot/(ns*np)) ELSE 0 END), 6) AS mi
FROM t
"""


def q_table_checksum(sf_dir: str):
    """Order-independent table fingerprint: a commutative checksum
    (modular sum + XOR of a deterministic per-row polynomial) over
    orders — the anti-entropy primitive for comparing replicas /
    snapshots WITHOUT sorting or moving rows (the cheap companion to
    q_snapshot_diff's row-level CDC: checksums disagree -> run the
    diff). Each batch folds to THREE integers (row count, mod-sum,
    xor); the driver combines partials commutatively, so any batch
    split / cluster size / resume order yields the identical
    fingerprint. The row polynomial uses only integer-exact fields
    (orderkey, price cents via the floor(x*100+0.5) rule, leading
    chars of the categorical columns) so both sides compute identical
    int64 values; sums stay exact via Python ints (Ray) and HUGEINT
    (SQL)."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderstatus",
                "o_orderpriority"])
    M = (1 << 61) - 1

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(np.int64)
        cents = np.floor(df["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        st = df["o_orderstatus"].str[:1].map(ord).to_numpy(np.int64)
        pr = df["o_orderpriority"].str[:1].map(ord).to_numpy(np.int64)
        rh = (k * 2654435761 + cents * 97 + st * 1315423911
              + pr * 1000003) % M
        return pd.DataFrame({
            "n": [np.int64(len(k))],
            # Python-int fold: exact at any row count (no int64 overflow)
            "s": [int(sum(int(x) for x in rh) % M)],
            "x": [int(np.bitwise_xor.reduce(rh)) if len(rh) else 0],
        })

    p = ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536).to_pandas()
    return pd.DataFrame({
        "n_rows": [np.int64(p["n"].sum())],
        "checksum_sum": [np.int64(sum(int(v) for v in p["s"]) % M)],
        "checksum_xor": [np.int64(np.bitwise_xor.reduce(
            p["x"].to_numpy(np.int64))) if len(p) else np.int64(0)],
    })


def q_trimmed_mean(sf_dir: str):
    """Exact 5%-trimmed mean of o_totalprice per priority — the robust
    location estimate between the mean (outlier-hostile) and the
    median (throws away 98% of the data), completing the robust-stats
    family (MAD, interpolated median, winsor-style trim). Trimming is
    RANK-based (drop the k = floor(0.05 n) lowest and highest ranks),
    and because a tied block contributes only value x how-many-ranks-
    survive — never WHICH tied rows — the trimmed SUM needs only
    per-(group, value) counts plus each block's global rank interval:
    the :func:`_grouped_value_ranges` range-prefix decomposition
    shared with q_gini_by_priority. The per-range kernel intersects
    each block's rank interval (C, C+c] with the keep window
    (k, n-k] and emits a 2-number partial (sum, kept). No global
    sort, no group-sized driver state."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    TRIM = 0.05
    agg, parts, offs = _grouped_value_ranges(
        ds, "o_orderpriority", "o_totalprice", 64)
    keep = {g: (int(np.floor(TRIM * r["n"])),
                int(r["n"]) - int(np.floor(TRIM * r["n"])))
            for g, r in agg.iterrows()}  # keep ranks in (k, n-k]
    offs_ref = ray.put((offs, keep))

    def trim_sum(g: pd.DataFrame) -> pd.DataFrame:
        offs, keep_d = ray.get(offs_ref)
        grp = g["o_orderpriority"].iloc[0]
        off = offs[(grp, int(g["rng"].iloc[0]))]
        k_lo, k_hi = keep_d[grp]
        d = g.groupby("o_totalprice", as_index=False)["c"].sum() \
            .sort_values("o_totalprice")
        c = d["c"].to_numpy(np.int64)
        v = d["o_totalprice"].to_numpy(np.float64)
        hi_r = off + np.cumsum(c)          # block rank interval is
        lo_r = hi_r - c                    # (lo_r, hi_r]
        inc = np.clip(np.minimum(hi_r, k_hi) - np.maximum(lo_r, k_lo),
                      0, None)
        return pd.DataFrame({"grp": [grp],
                             "s": [float((v * inc).sum())],
                             "m": [int(inc.sum())]})

    rs = parts.groupby("key").map_groups(trim_sum, batch_format="pandas") \
        .to_pandas().groupby("grp", as_index=False).agg(
            s=("s", "sum"), m=("m", "sum"))
    rs["trimmed_mean"] = (rs["s"] / rs["m"]).round(6)
    rs["n_kept"] = rs["m"].astype("int64")
    return rs.rename(columns={"grp": "o_orderpriority"})[
        ["o_orderpriority", "trimmed_mean", "n_kept"]] \
        .sort_values("o_orderpriority").reset_index(drop=True)


def q_doc_keywords(sf_dir: str):
    """Per-document keyword extraction: each document's top-3 terms by
    (tf desc, df asc, token asc) with the tf-idf score attached — the
    per-doc tagging pass a corpus curator runs after the corpus-level
    q_tfidf_top_terms. Ranking uses ONLY integer-comparable keys (term
    frequency, document frequency, token), never the float score, so
    the cut is immune to ulp differences between log implementations;
    the score itself is computed with math.log (glibc libm, the same
    function DuckDB's LN calls) from a per-bucket {df: idf} map over
    the bucket's few distinct df values. Shape: per-batch (doc, token,
    tf) partials -> ONE by-token shuffle where the combine makes tf
    global and df is the group's row count (a token lives in one
    bucket) -> ONE by-doc shuffle for the per-doc top-3 (a doc lives
    in one bucket, so the bucket cut IS global). Driver state: the
    document count, one scalar."""
    import math

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    B = _pair_buckets()
    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()

    def tf_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        g = t.groupby(["doc_id", "token"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        g["tf"] = g["tf"].astype("int64")
        h = pd.util.hash_array(g["token"].to_numpy(dtype=object)) % B
        return g.assign(_b=h.astype("int64"))

    def df_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tf = g.groupby(["doc_id", "token"], as_index=False)["tf"].sum()
        dfreq = tf.groupby("token")["doc_id"].transform("size")
        out = tf.assign(df=dfreq.astype("int64"))
        return out.assign(_b2=out["doc_id"].astype("int64") % B)

    def topk_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tf", "df", "token"],
                          ascending=[True, False, True, True])
        top = g.groupby("doc_id", as_index=False).head(3).copy()
        top["rnk"] = top.groupby("doc_id").cumcount() + 1
        idf = {d: math.log(n_docs / d) for d in top["df"].unique()}
        top["score"] = (top["tf"] * top["df"].map(idf)).round(6)
        return pd.DataFrame({
            "doc_id": top["doc_id"].astype("int64"),
            "token": top["token"],
            "tf": top["tf"].astype("int64"),
            "df": top["df"].astype("int64"),
            "rnk": top["rnk"].astype("int64"),
            "score": top["score"],
        })

    return ds.map_batches(tf_partial, batch_format="pandas",
                          batch_size=65536) \
        .groupby("_b").map_groups(df_bucket, batch_format="pandas") \
        .groupby("_b2").map_groups(topk_doc, batch_format="pandas")


# same tokenizer as the cms/top_tokens mirrors; rank keys are pure
# integers so the WHERE rnk <= 3 cut matches bit-for-bit
SQL_DOC_KEYWORDS = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(string_split(nt, ' ')) AS token
  FROM norm WHERE length(nt) > 0
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
r AS (
  SELECT t.doc_id, t.token, t.tf, d.df,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY t.tf DESC, d.df, t.token) AS rnk
  FROM tf t JOIN dfq d USING (token)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, token,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(rnk AS BIGINT) AS rnk,
       ROUND(tf * LN((SELECT COUNT(*) FROM documents) * 1.0 / df), 6)
         AS score
FROM r WHERE rnk <= 3
"""


def q_price_psi(sf_dir: str):
    """Population Stability Index between two yearly slices of
    o_totalprice (1996 as reference, 1997 as comparison) — THE
    production model-monitoring drift metric: bin the comparison
    population by the reference population's EXACT deciles and sum
    (pa - pb) * ln(pa / pb) per bin (token-level drift is
    q_distribution_drift; this is the numeric-distribution flavor).
    The nine decile boundaries are exact order statistics of the
    reference slice found with the :func:`_grouped_value_ranges`
    decomposition — per-range (value, count) partials + exclusive
    offsets locate each decile's range, ONE map_groups selects the
    value at the local rank — then both slices bin in one stateless
    pass against the nine broadcast floats (searchsorted side='right',
    mirrored by the SQL edge-count subquery) and the driver folds 10
    counts per slice. PSI terms use math.log (glibc libm, same as
    DuckDB LN); bins empty on either side emit a 0.0 term (documented
    convention, keeps the sum finite)."""
    import math

    y_a = (pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01"))
    y_b = (pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01"))

    def slice_ds(win):
        return _read(sf_dir, "orders", ["o_totalprice", "o_orderdate"],
                     filter=(pc.field("o_orderdate") >= pa.scalar(win[0]))
                     & (pc.field("o_orderdate") < pa.scalar(win[1]))) \
            .map_batches(lambda df: pd.DataFrame(
                {"grp": "x", "v": df["o_totalprice"]
                 .to_numpy(np.float64)}), batch_format="pandas",
                batch_size=65536)

    ref = slice_ds(y_a)
    agg, parts, offs = _grouped_value_ranges(ref, "grp", "v", 64)
    n_a = int(agg.loc["x", "n"])
    ranks = [int(np.ceil(q * n_a)) for q in
             (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)]
    # locate each rank's range from the per-range totals the offsets
    # already encode (offs is exclusive-prefix by construction)
    rng_sorted = sorted(r for (_, r) in offs)
    rng_off = np.array([offs[("x", r)] for r in rng_sorted], dtype=np.int64)
    # side='left': rank rk belongs to range i iff off_i < rk <= off_i
    # + total_i, so a rank equal to an offset is the LAST row of the
    # PREVIOUS range
    rank_rng = {rk: rng_sorted[int(np.searchsorted(
        rng_off, rk, side="left")) - 1] for rk in ranks}
    # {range: [(rank, rank - offset_of_range), ...]} — everything the
    # per-range kernel needs, one small broadcast
    want_ref = ray.put({r: sorted((rk, rk - offs[("x", r)])
                                  for rk, rr in rank_rng.items()
                                  if rr == r)
                        for r in set(rank_rng.values())})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(want_ref)
        r = int(g["rng"].iloc[0])
        if r not in want:
            return pd.DataFrame({"rk": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="float64")})
        d = g.groupby("v", as_index=False)["c"].sum().sort_values("v")
        cum = d["c"].cumsum().to_numpy(np.int64)
        rows = [(rk, float(d["v"].iloc[int(np.searchsorted(cum, local))]))
                for rk, local in want[r]]
        return pd.DataFrame(rows, columns=["rk", "v"])

    picked = parts.groupby("key").map_groups(
        pick, batch_format="pandas").to_pandas()
    bounds = picked.set_index("rk").loc[ranks, "v"].to_numpy(np.float64)
    b_ref = ray.put(bounds)

    def bin_counts(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(b_ref)
        idx = np.searchsorted(b, df["v"].to_numpy(np.float64),
                              side="right")
        return pd.DataFrame({"bin": np.arange(10, dtype=np.int64),
                             "n": np.bincount(idx, minlength=10)
                             .astype(np.int64)})

    ca = ref.map_batches(bin_counts, batch_format="pandas",
                         batch_size=65536).to_pandas() \
        .groupby("bin")["n"].sum()
    cb = slice_ds(y_b).map_batches(bin_counts, batch_format="pandas",
                                   batch_size=65536).to_pandas() \
        .groupby("bin")["n"].sum()
    na = ca.reindex(range(10), fill_value=0).to_numpy(np.int64)
    nb = cb.reindex(range(10), fill_value=0).to_numpy(np.int64)
    pa_ = na / na.sum()
    pb_ = nb / nb.sum()
    terms = [round((a - b) * math.log(a / b), 6) if a > 0 and b > 0
             else 0.0 for a, b in zip(pa_, pb_)]
    return pd.DataFrame({
        "bin": np.arange(10, dtype=np.int64),
        "n_ref": na, "n_cmp": nb,
        "psi_term": terms,
        "psi_total": round(float(sum(terms)), 6),
    })


# mirror: same decile edges (rn = ceil(q*n) order statistics of the
# reference slice), same edge-count binning (count of edges <= v is
# searchsorted side='right'), same 0.0 convention for one-sided bins
SQL_PRICE_PSI = """
WITH a AS (
  SELECT o_totalprice AS v FROM orders
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1997-01-01'
),
b AS (
  SELECT o_totalprice AS v FROM orders
  WHERE o_orderdate >= DATE '1997-01-01'
    AND o_orderdate < DATE '1998-01-01'
),
r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
             COUNT(*) OVER () AS n FROM a),
qs AS (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q),
edges AS (SELECT v FROM r JOIN qs ON rn = CAST(CEIL(q * n) AS BIGINT)),
abin AS (SELECT (SELECT COUNT(*) FROM edges e WHERE e.v <= a.v) AS bin
         FROM a),
bbin AS (SELECT (SELECT COUNT(*) FROM edges e WHERE e.v <= b.v) AS bin
         FROM b),
bins AS (SELECT unnest(range(10)) AS bin),
ac AS (SELECT bin, COUNT(*) AS n FROM abin GROUP BY 1),
bc AS (SELECT bin, COUNT(*) AS n FROM bbin GROUP BY 1),
g AS (
  SELECT bins.bin,
         COALESCE(ac.n, 0) AS n_ref, COALESCE(bc.n, 0) AS n_cmp,
         SUM(COALESCE(ac.n, 0)) OVER () AS ta,
         SUM(COALESCE(bc.n, 0)) OVER () AS tb
  FROM bins LEFT JOIN ac USING (bin) LEFT JOIN bc USING (bin)
),
t AS (
  SELECT bin, n_ref, n_cmp,
         CASE WHEN n_ref > 0 AND n_cmp > 0
              THEN ROUND((n_ref*1.0/ta - n_cmp*1.0/tb)
                         * LN((n_ref*1.0/ta) / (n_cmp*1.0/tb)), 6)
              ELSE 0.0 END AS psi_term
  FROM g
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cmp AS BIGINT) AS n_cmp, psi_term,
       ROUND((SELECT SUM(psi_term) FROM t), 6) AS psi_total
FROM t ORDER BY bin
"""


_SCREEN_PATTERNS = [
    # (name, regex) — RE2-safe subset (no backreferences / lookaround)
    # so DuckDB regexp_matches and Python re.search agree exactly
    ("agg_then_sort", r"agg [a-z]+ sort"),
    ("double_batch", r"batch batch"),
    ("er_suffix_5plus", r"\b[a-z]{5,}er\b"),
    ("has_join", r"\bjoin\b"),
]


_BM25_TERMS = ["join", "spark", "window"]
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_search(sf_dir: str):
    """BM25 ranked retrieval: the top-10 documents per query term under
    the Robertson/Okapi score
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    idf = ln((N - df + 0.5)/(df + 0.5)) — the lexical-search baseline
    every retrieval pipeline starts from (the ANN family covers the
    dense side). One scan: each document is ONE row, so its length dl
    and per-term tf are exact within the batch — batches emit only
    candidate rows (docs containing a query term) plus a 3-number
    stats partial (docs, tokens, per-term df); the driver folds
    O(terms) numbers and broadcasts {term: idf} (math.log = glibc
    libm = DuckDB LN) + avgdl. A second pass over the MATERIALIZED
    candidates scores vectorized and prunes to a local top-10 per
    term (the union of local top-10s provably contains the global
    top-10), then ONE tiny by-term shuffle takes the global cut.
    Scores are bit-identical doubles on both sides, so ordering by
    raw score (tie-break doc_id) cannot diverge."""
    import math

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        dl = t.groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "dl"})
        tf = t.loc[t["token"].isin(_BM25_TERMS)] \
            .groupby(["doc_id", "token"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        cand = tf.merge(dl, on="doc_id")
        out = pd.DataFrame({
            "doc_id": cand["doc_id"].astype("int64"),
            "term": cand["token"],
            "tf": cand["tf"].astype("int64"),
            "dl": cand["dl"].astype("int64"),
        })
        # stats rows ride the same frame: term='' rows carry
        # (n_docs_with_tokens, total_tokens) and per-term df partials
        stats = [("", np.int64(len(dl)), np.int64(dl["dl"].sum()))] + [
            (f"df:{term}", np.int64((tf["token"] == term).sum()),
             np.int64(0))
            for term in _BM25_TERMS]
        srows = pd.DataFrame(stats, columns=["term", "tf", "dl"])
        srows.insert(0, "doc_id", np.int64(-1))
        return pd.concat([out, srows], ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).materialize()
    sp = parts.map_batches(
        lambda df: df.loc[df["doc_id"] < 0],
        batch_format="pandas").to_pandas()
    n_docs = int(sp.loc[sp["term"] == "", "tf"].sum())
    avgdl = float(sp.loc[sp["term"] == "", "dl"].sum()) / n_docs
    idf = {t: math.log((n_docs - d + 0.5) / (d + 0.5))
           for t, d in ((t, int(sp.loc[sp["term"] == f"df:{t}",
                                       "tf"].sum()))
                        for t in _BM25_TERMS)}
    bc = ray.put((idf, avgdl))

    def score_local(df: pd.DataFrame) -> pd.DataFrame:
        idf_d, ad = ray.get(bc)
        df = df.loc[df["doc_id"] >= 0].copy()
        if df.empty:
            return pd.DataFrame({"term": pd.Series([], dtype="object"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        tf = df["tf"].to_numpy(np.float64)
        dl = df["dl"].to_numpy(np.float64)
        denom = tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / ad)
        df["score"] = df["term"].map(idf_d).to_numpy(np.float64) \
            * tf * (_BM25_K1 + 1.0) / denom
        df = df.sort_values(["term", "score", "doc_id"],
                            ascending=[True, False, True])
        return df.groupby("term", as_index=False).head(10)[
            ["term", "doc_id", "score"]]

    def final_cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"],
                          ascending=[False, True]).head(10).copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["score"] = g["score"].round(6)
        return g[["term", "doc_id", "rnk", "score"]]

    return parts.map_batches(score_local, batch_format="pandas") \
        .groupby("term").map_groups(final_cut, batch_format="pandas")


# same tokenizer; identical double expression for the score, same
# (score DESC, doc_id) order — idf/avgdl are ratios of the same ints
SQL_BM25_SEARCH = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(string_split(nt, ' ')) AS token
  FROM norm WHERE length(nt) > 0
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
stats AS (SELECT COUNT(*) AS nd, SUM(dl) * 1.0 / COUNT(*) AS avgdl
          FROM dl),
terms AS (SELECT unnest(['join', 'spark', 'window']) AS term),
tf AS (
  SELECT t.doc_id, t.token AS term, COUNT(*) AS tf
  FROM tok t JOIN terms q ON t.token = q.term
  GROUP BY 1, 2
),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.term, tf.doc_id,
         LN((s.nd - d.df + 0.5) / (d.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
           AS score
  FROM tf JOIN dl USING (doc_id) JOIN dfq d USING (term)
  CROSS JOIN stats s
),
r AS (
  SELECT term, doc_id, score,
         row_number() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)
SELECT term, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rnk AS BIGINT) AS rnk, ROUND(score, 6) AS score
FROM r WHERE rnk <= 10
"""


def q_pattern_screen(sf_dir: str):
    """Regex content screen over the corpus — the shape of every
    PII / profanity / boilerplate pattern filter in a training-data
    pipeline: how many documents match each pattern and the corpus
    share. Patterns are compiled ONCE per task (closure over the
    module list), each batch runs vectorized str.contains per pattern
    and emits a <= |patterns|+1 row partial (plus a '__docs__'
    denominator row); the driver folds O(patterns) counts. Zero
    shuffle, scan cost |patterns| regex passes. The pattern set stays
    in the RE2-compatible subset so the SQL mirror's regexp_matches
    computes the identical predicate."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"]
        rows = [("__docs__", np.int64(len(s)))]
        for name, pat in _SCREEN_PATTERNS:
            rows.append((name, np.int64(
                s.str.contains(pat, regex=True).sum())))
        return pd.DataFrame(rows, columns=["name", "n"])

    p = ds.map_batches(partial, batch_format="pandas",
                       batch_size=65536).to_pandas() \
        .groupby("name", as_index=False)["n"].sum()
    tot = int(p.loc[p["name"] == "__docs__", "n"].iloc[0])
    out = p.loc[p["name"] != "__docs__"].copy()
    out["n_docs"] = out["n"].astype("int64")
    out["share"] = out["n_docs"] / tot  # identical int ratio both sides
    return out[["name", "n_docs", "share"]] \
        .sort_values("name").reset_index(drop=True)


SQL_PATTERN_SCREEN = r"""
WITH pats AS (
  SELECT * FROM (VALUES
    ('agg_then_sort', 'agg [a-z]+ sort'),
    ('double_batch', 'batch batch'),
    ('er_suffix_5plus', '\b[a-z]{5,}er\b'),
    ('has_join', '\bjoin\b')
  ) AS t(name, pat)
)
SELECT p.name,
       CAST(COUNT(*) FILTER (WHERE regexp_matches(d.text, p.pat))
            AS BIGINT) AS n_docs,
       COUNT(*) FILTER (WHERE regexp_matches(d.text, p.pat)) * 1.0
         / COUNT(*) AS share
FROM documents d CROSS JOIN pats p
GROUP BY p.name ORDER BY p.name
"""


def q_fk_integrity(sf_dir: str):
    """Referential-integrity audit across the schema's FK chain
    (lineitem→orders, orders→customer, customer→nation) — the
    constraint-validation pass a lake without enforced FKs runs after
    every load. Per FK: child row count, distinct child keys, orphan
    keys (child keys absent from the parent) and orphan rows. Shape
    per FK: per-batch (key, n) child partials + tagged parent key
    rows -> ONE shuffle bucketed by key where presence is a vectorized
    isin per bucket (a key lives in one bucket, so bucket-local
    absence IS global) -> O(buckets) count partials to the driver.
    Nothing key-scale ever reaches the driver."""
    B = _pair_buckets()
    specs = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
    ]
    rows = []
    for fk_name, child_t, child_k, parent_t, parent_k in specs:
        child = _read(sf_dir, child_t, [child_k])
        parent = _read(sf_dir, parent_t, [parent_k])

        def c_part(df: pd.DataFrame, _k=child_k) -> pd.DataFrame:
            g = df.groupby(_k, as_index=False).size() \
                .rename(columns={_k: "key", "size": "n"})
            g["key"] = g["key"].astype("int64")
            g["n"] = g["n"].astype("int64")
            g["side"] = "c"
            return g.assign(_b=g["key"] % B)

        def p_part(df: pd.DataFrame, _k=parent_k) -> pd.DataFrame:
            k = df[_k].astype("int64").drop_duplicates()
            return pd.DataFrame({"key": k, "n": np.int64(0),
                                 "side": "p", "_b": k % B})

        def audit(g: pd.DataFrame) -> pd.DataFrame:
            c = g.loc[g["side"] == "c"].groupby("key", as_index=False)[
                "n"].sum()
            pk = g.loc[g["side"] == "p", "key"].unique()
            orphan = ~c["key"].isin(pk)
            return pd.DataFrame({
                "n_rows": [np.int64(c["n"].sum())],
                "n_keys": [np.int64(len(c))],
                "n_orphan_keys": [np.int64(orphan.sum())],
                "n_orphan_rows": [np.int64(c.loc[orphan, "n"].sum())],
            })

        p = child.map_batches(c_part, batch_format="pandas",
                              batch_size=65536) \
            .union(parent.map_batches(p_part, batch_format="pandas")) \
            .groupby("_b").map_groups(audit, batch_format="pandas") \
            .to_pandas().sum()
        rows.append((fk_name, np.int64(p["n_rows"]), np.int64(p["n_keys"]),
                     np.int64(p["n_orphan_keys"]),
                     np.int64(p["n_orphan_rows"])))
    return pd.DataFrame(rows, columns=["fk", "n_rows", "n_keys",
                                       "n_orphan_keys", "n_orphan_rows"]) \
        .sort_values("fk").reset_index(drop=True)


SQL_FK_INTEGRITY = """
WITH l AS (
  SELECT 'lineitem.l_orderkey->orders' AS fk,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_keys,
         CAST(COUNT(DISTINCT l_orderkey)
              FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
           AS n_orphan_keys,
         CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT)
           AS n_orphan_rows
  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
),
o AS (
  SELECT 'orders.o_custkey->customer',
         CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
         CAST(COUNT(DISTINCT o_custkey)
              FILTER (WHERE c_custkey IS NULL) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT)
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
),
c AS (
  SELECT 'customer.c_nationkey->nation',
         CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
         CAST(COUNT(DISTINCT c_nationkey)
              FILTER (WHERE n_nationkey IS NULL) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE n_nationkey IS NULL) AS BIGINT)
  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
)
SELECT * FROM l UNION ALL SELECT * FROM o UNION ALL SELECT * FROM c
ORDER BY fk
"""


def q_column_entropy(sf_dir: str):
    """Shannon-entropy profile of the categorical columns of orders —
    the information-content screen that pairs with
    q_independence_stats (how much signal a column CARRIES vs how much
    it SHARES): per column the distinct-value count, entropy in nats,
    and the [0,1] normalized entropy H/ln(k). One scan melts both
    columns into per-batch (col, val, n) partials over provably tiny
    domains; the driver folds O(cols x values) rows and computes the
    entropies with math.log (glibc libm, same as DuckDB's LN). Zero
    shuffle."""
    import math

    COLS = ["o_orderstatus", "o_orderpriority"]
    ds = _read(sf_dir, "orders", COLS)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in COLS:
            g = df.groupby(c, as_index=False).size() \
                .rename(columns={c: "val", "size": "n"})
            g.insert(0, "col_name", c)
            frames.append(g)
        out = pd.concat(frames, ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas() \
        .groupby(["col_name", "val"], as_index=False)["n"].sum()
    rows = []
    for c, sub in parts.groupby("col_name"):
        n = sub["n"].to_numpy(np.float64)
        tot = n.sum()
        p = n / tot
        h = float(-sum(pi * math.log(pi) for pi in p))
        k = len(sub)
        rows.append((c, np.int64(k), round(h, 6),
                     round(h / math.log(k), 6) if k > 1 else 0.0))
    return pd.DataFrame(rows, columns=["col_name", "n_distinct",
                                       "entropy", "norm_entropy"]) \
        .sort_values("col_name").reset_index(drop=True)


SQL_COLUMN_ENTROPY = """
WITH c1 AS (SELECT o_orderstatus AS val, COUNT(*) AS n
            FROM orders GROUP BY 1),
t1 AS (SELECT val, n * 1.0 / SUM(n) OVER () AS p FROM c1),
c2 AS (SELECT o_orderpriority AS val, COUNT(*) AS n
       FROM orders GROUP BY 1),
t2 AS (SELECT val, n * 1.0 / SUM(n) OVER () AS p FROM c2)
SELECT 'o_orderstatus' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       ROUND(SUM(-p * LN(p)), 6) AS entropy,
       ROUND(SUM(-p * LN(p)) / LN(COUNT(*)), 6) AS norm_entropy
FROM t1
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
       ROUND(SUM(-p * LN(p)), 6),
       ROUND(SUM(-p * LN(p)) / LN(COUNT(*)), 6)
FROM t2
"""


# mirror: rank-based trim — any tie order yields the same trimmed
# VALUE multiset, so row_number's arbitrary tie order is safe
SQL_TRIMMED_MEAN = """
WITH r AS (
  SELECT o_orderpriority, o_totalprice AS v,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority,
       ROUND(AVG(v), 6) AS trimmed_mean,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM r
WHERE rn > CAST(FLOOR(0.05 * n) AS BIGINT)
  AND rn <= n - CAST(FLOOR(0.05 * n) AS BIGINT)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# same polynomial; DuckDB SUM(BIGINT) widens to HUGEINT so the modular
# sum is exact on both sides
SQL_TABLE_CHECKSUM = """
WITH r AS (
  SELECT (o_orderkey * 2654435761
          + CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 97
          + CAST(ascii(SUBSTR(o_orderstatus, 1, 1)) AS BIGINT) * 1315423911
          + CAST(ascii(SUBSTR(o_orderpriority, 1, 1)) AS BIGINT) * 1000003)
         % 2305843009213693951 AS rh
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(rh) % 2305843009213693951 AS BIGINT) AS checksum_sum,
       CAST(BIT_XOR(rh) AS BIGINT) AS checksum_xor
FROM r
"""


def q_triangle_count(sf_dir: str):
    """Distributed triangle count + global clustering coefficient over
    the part co-purchase graph (parts adjacent iff some order contains
    both) — the graph-analytics primitive after PageRank and connected
    components; community detection, spam/bot screens, and graph-
    quality audits all start from it. The classic degree-ordered
    orientation keeps every stage shuffle-bounded:

    - edge build: basket_pairs' orderkey-bucketed distinct pair
      expansion (baskets are bounded, so the a<b blowup is per-basket,
      never corpus-quadratic), then a by-pair bucketed GLOBAL distinct;
      the edge set is materialized ONCE and re-read by later stages;
    - degrees: endpoint partials -> ONE by-node bucketed fold. The
      degree table stays a Dataset (O(nodes) rows, never driver-side,
      never broadcast — the part dim is catalog-bounded today but the
      kernel must not care);
    - orientation: each undirected edge points from its (deg, id)-
      smaller endpoint to the larger, attaching degrees via two tagged
      bucketed joins. Out-degree is then O(sqrt(2m)) REGARDLESS of
      skew — a hub's edges point INTO it — so the per-node wedge
      expansion cannot blow up on a hot node and total wedge rows are
      bounded by m^1.5 (the optimal triangle-join bound);
    - wedges + closure: bucket oriented edges by src, expand each
      src's out-neighbors to (deg, id)-ordered pairs with the same
      vectorized self-merge, then ONE by-pair bucketed semi-join of
      wedges against oriented edges (a pair lives in exactly one
      bucket on both sides). Each triangle is counted exactly once.

    Output: one row — n_nodes, n_edges, n_wedges (undirected paths of
    length 2, folded from per-batch sum C(deg,2) partials),
    n_triangles, global_cc = 3T/W (same double expression both sides,
    rounded 6)."""
    B = _pair_buckets()
    W = max(8, _cpus())
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def add_ob(df: pd.DataFrame) -> pd.DataFrame:
        o = df["l_orderkey"].astype("int64")
        return pd.DataFrame({"o": o, "p": df["l_partkey"].astype("int64"),
                             "_b": o % B})

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["o", "p"])[["o", "p"]]
        m = g.merge(g, on="o", suffixes=("_a", "_b"))
        m = m.loc[m["p_a"] < m["p_b"], ["p_a", "p_b"]].drop_duplicates()
        return m.rename(columns={"p_a": "u", "p_b": "v"})

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        # int64 wrap is deterministic; numpy % with a positive divisor
        # is non-negative, so the bucket id is stable cross-process
        with np.errstate(over="ignore"):
            pb = (df["u"].to_numpy(np.int64) * np.int64(1_000_003)
                  + df["v"].to_numpy(np.int64)) % B
        return df.assign(_pb=pb.astype("int64"))

    edges = (ds.map_batches(add_ob, batch_format="pandas",
                            batch_size=65536)
             .groupby("_b").map_groups(pairs_bucket, batch_format="pandas")
             .map_batches(add_pb, batch_format="pandas")
             .groupby("_pb").map_groups(
                 lambda g: g[["u", "v"]].drop_duplicates(),
                 batch_format="pandas")
             .materialize())
    n_edges = edges.count()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.concat([df["u"], df["v"]]).value_counts()
        return pd.DataFrame({"node": c.index.to_numpy(np.int64),
                             "n": c.to_numpy(np.int64)})

    deg = (edges.map_batches(deg_partial, batch_format="pandas")
           .map_batches(lambda df: df.assign(
               _b=(df["node"] % B).astype("int64")), batch_format="pandas")
           .groupby("_b").map_groups(
               lambda g: g.groupby("node", as_index=False)["n"].sum(),
               batch_format="pandas")
           .materialize())
    n_nodes = deg.count()
    wp = deg.map_batches(
        lambda df: pd.DataFrame({"w": [int(
            (df["n"].to_numpy(np.int64)
             * (df["n"].to_numpy(np.int64) - 1) // 2).sum())]}),
        batch_format="pandas").to_pandas()
    n_wedges = int(wp["w"].sum())

    # ---- attach deg(u) then deg(v) via tagged bucketed joins
    def d_prep(key_out: str):
        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "_b": (df["node"] % B).astype("int64"),
                "k": df["node"].astype("int64"),
                "other": np.int64(-1), "dother": np.int64(-1),
                "n": df["n"].astype("int64"), "side": "d"})
        return prep

    def eu_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_b": (df["u"] % B).astype("int64"),
                             "k": df["u"].astype("int64"),
                             "other": df["v"].astype("int64"),
                             "dother": np.int64(-1),
                             "n": np.int64(-1), "side": "e"})

    def join_u(g: pd.DataFrame) -> pd.DataFrame:
        dim = g.loc[g["side"] == "d", ["k", "n"]]
        e = g.loc[g["side"] == "e", ["k", "other"]]
        m = e.merge(dim, on="k")
        return pd.DataFrame({"u": m["k"], "v": m["other"], "du": m["n"]})

    e_du = (edges.map_batches(eu_prep, batch_format="pandas")
            .union(deg.map_batches(d_prep("u"), batch_format="pandas"))
            .repartition(W)
            .groupby("_b").map_groups(join_u, batch_format="pandas"))

    def ev_prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_b": (df["v"] % B).astype("int64"),
                             "k": df["v"].astype("int64"),
                             "other": df["u"].astype("int64"),
                             "dother": df["du"].astype("int64"),
                             "n": np.int64(-1), "side": "e"})

    def join_v_orient(g: pd.DataFrame) -> pd.DataFrame:
        dim = g.loc[g["side"] == "d", ["k", "n"]]
        e = g.loc[g["side"] == "e", ["k", "other", "dother"]]
        m = e.merge(dim, on="k")
        u = m["other"].to_numpy(np.int64)    # original u, deg in dother
        v = m["k"].to_numpy(np.int64)        # original v, deg in n
        du = m["dother"].to_numpy(np.int64)
        dv = m["n"].to_numpy(np.int64)
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pd.DataFrame({
            "src": np.where(u_first, u, v),
            "dst": np.where(u_first, v, u),
            "ddst": np.where(u_first, dv, du)})

    oe = (e_du.map_batches(ev_prep, batch_format="pandas")
          .union(deg.map_batches(d_prep("v"), batch_format="pandas"))
          .repartition(W)
          .groupby("_b").map_groups(join_v_orient, batch_format="pandas")
          .materialize())

    # ---- wedges per src, closed against the oriented edge set
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["src", "dst", "ddst"]]
        m = g.merge(g, on="src", suffixes=("_a", "_b"))
        keep = ((m["ddst_a"] < m["ddst_b"])
                | ((m["ddst_a"] == m["ddst_b"])
                   & (m["dst_a"] < m["dst_b"])))
        m = m.loc[keep]
        return pd.DataFrame({"x": m["dst_a"].to_numpy(np.int64),
                             "y": m["dst_b"].to_numpy(np.int64),
                             "side": "w"})

    def oe_pair(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"x": df["src"].astype("int64"),
                             "y": df["dst"].astype("int64"),
                             "side": "e"})

    def pair_b(df: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            pb = (df["x"].to_numpy(np.int64) * np.int64(1_000_003)
                  + df["y"].to_numpy(np.int64)) % B
        return df.assign(_pb=pb.astype("int64"))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        e = g.loc[g["side"] == "e", ["x", "y"]]
        w = g.loc[g["side"] == "w", ["x", "y"]]
        t = len(w.merge(e, on=["x", "y"]))
        return pd.DataFrame({"t": [np.int64(t)]})

    src_b = oe.map_batches(
        lambda df: df.assign(_b=(df["src"] % B).astype("int64")),
        batch_format="pandas")
    tparts = (src_b.groupby("_b").map_groups(wedges, batch_format="pandas")
              .map_batches(pair_b, batch_format="pandas")
              .union(oe.map_batches(oe_pair, batch_format="pandas")
                     .map_batches(pair_b, batch_format="pandas"))
              .repartition(W)
              .groupby("_pb").map_groups(close, batch_format="pandas")
              .to_pandas())
    n_tri = int(tparts["t"].sum())
    cc = round(3.0 * n_tri / n_wedges, 6) if n_wedges else 0.0
    return pd.DataFrame({
        "n_nodes": pd.Series([n_nodes], dtype="int64"),
        "n_edges": pd.Series([n_edges], dtype="int64"),
        "n_wedges": pd.Series([n_wedges], dtype="int64"),
        "n_triangles": pd.Series([n_tri], dtype="int64"),
        "global_cc": pd.Series([cc], dtype="float64")})


# mirror: a<b edges, triple join for triangles, sum C(deg,2) wedges;
# 3.0*t/w is the same double expression on both sides
SQL_TRIANGLE_COUNT = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                        AND a.l_partkey < b.l_partkey),
deg AS (SELECT node, COUNT(*) AS n FROM (
          SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
        GROUP BY node),
tri AS (SELECT COUNT(*) AS t FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
w AS (SELECT SUM(n * (n - 1) // 2) AS w FROM deg)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       CAST(w.w AS BIGINT) AS n_wedges,
       CAST(tri.t AS BIGINT) AS n_triangles,
       ROUND(3.0 * tri.t / w.w, 6) AS global_cc
FROM w, tri
"""


def q_zipf_slope(sf_dir: str):
    """Zipf power-law fit over the corpus token distribution — the
    standard sanity check that a text corpus is natural-language-like
    (and the knob behind vocabulary-size / tokenizer-budget planning):
    OLS of ln(freq) on ln(rank) over the top-200 tokens, reporting
    slope (Zipf exponent ~ -1 for natural text), intercept and R^2.

    Scale shape: per-batch value_counts partials -> ONE bucketed
    combine with a per-bucket top-200 prune on the pure-integer
    (n desc, token asc) key (a token lives in exactly one bucket, so
    the union of bucket-local top-200s provably contains the global
    top-200 and the cut is ulp-immune); the driver regresses over 200
    numbers. ln on both sides is the same glibc libm as DuckDB LN;
    the only cross-row float folds are the four OLS sums over 200
    well-conditioned terms, emitted at round-6 like every float
    output in the catalog."""
    V = 200
    ds = _read(sf_dir, "documents", ["text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(
            r"[a-z0-9]+").explode().dropna()
        c = toks.value_counts()
        return pd.DataFrame({"token": c.index.to_numpy(),
                             "n": c.to_numpy().astype(np.int64)})

    parts = ds.map_batches(counts, batch_format="pandas", batch_size=8192)
    agg = _bucketed_combine(parts, ["token"], {"n": "sum"},
                            topk=(V, ["n", "token"], [False, True]))
    top = agg.sort_values(["n", "token"], ascending=[False, True]) \
        .head(V).reset_index(drop=True)
    v = len(top)
    x = np.log(np.arange(1, v + 1, dtype=np.float64))
    y = np.log(top["n"].to_numpy(np.float64))
    xb, yb = x.mean(), y.mean()
    sxy = ((x - xb) * (y - yb)).sum()
    sxx = ((x - xb) ** 2).sum()
    syy = ((y - yb) ** 2).sum()
    slope = sxy / sxx
    return pd.DataFrame({
        "n_tokens": pd.Series([v], dtype="int64"),
        "zipf_slope": pd.Series([round(slope, 6)], dtype="float64"),
        "zipf_intercept": pd.Series([round(yb - slope * xb, 6)],
                                    dtype="float64"),
        "r2": pd.Series([round(sxy * sxy / (sxx * syy), 6)],
                        dtype="float64")})


# mirror: same tokenizer, same integer-key rank cut, same OLS sums
SQL_ZIPF_SLOPE = r"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
),
c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rnk
      FROM c QUALIFY rnk <= 200),
p AS (SELECT LN(rnk) AS x, LN(n) AS y FROM r),
m AS (SELECT AVG(x) AS xb, AVG(y) AS yb FROM p),
s AS (SELECT COUNT(*) AS v,
             SUM((x - m.xb) * (y - m.yb)) AS sxy,
             SUM((x - m.xb) * (x - m.xb)) AS sxx,
             SUM((y - m.yb) * (y - m.yb)) AS syy,
             ANY_VALUE(m.xb) AS xb, ANY_VALUE(m.yb) AS yb
      FROM p, m)
SELECT CAST(v AS BIGINT) AS n_tokens,
       ROUND(sxy / sxx, 6) AS zipf_slope,
       ROUND(yb - sxy / sxx * xb, 6) AS zipf_intercept,
       ROUND(sxy * sxy / (sxx * syy), 6) AS r2
FROM s
"""


def q_weighted_sample(sf_dir: str):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    exponential race): the 20 orders drawn with probability
    proportional to o_totalprice — the primitive behind importance-
    weighted data mixing when Bernoulli / uniform-hash sampling
    (dataset_splits, source_hash_sample) isn't enough. Deterministic
    and RNG-free: u = (md5(orderkey)[:13 hex] + 1) / 2^52 is an EXACT
    dyadic rational in (0, 1] (52-bit numerator, power-of-two divisor
    — both engines produce the identical double), and the race key
    -ln(u)/w uses the same glibc libm LN as DuckDB, so keys are
    bit-identical and the (key, orderkey) order cannot diverge.
    Smallest-k keys win == P(selected) ∝ w, the A-ES result.

    Scale shape: stateless per-batch key computation + LOCAL top-20
    prune (the global top-20 is a subset of the union of local
    top-20s), so at most 20 x batches rows reach the driver cut —
    the corpus never shuffles. Same rows at any cluster size, batch
    split, or resume order."""
    K = 20
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["o_orderkey"].astype("int64")
        u = np.array([(int(hashlib.md5(str(int(k)).encode())
                           .hexdigest()[:13], 16) + 1)
                      for k in keys], dtype=np.float64) / float(2 ** 52)
        key = -np.log(u) / df["o_totalprice"].to_numpy(np.float64)
        out = pd.DataFrame({"o_orderkey": keys, "key": key})
        return out.sort_values(["key", "o_orderkey"]).head(K)

    cand = ds.map_batches(local_topk, batch_format="pandas",
                          batch_size=65536).to_pandas()
    out = cand.sort_values(["key", "o_orderkey"]).head(K) \
        .reset_index(drop=True)
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["priority"] = out["key"].round(6)
    return out[["o_orderkey", "rnk", "priority"]]


# mirror: identical dyadic uniform and race key; QUALIFY top-20
SQL_WEIGHTED_SAMPLE = """
WITH p AS (
  SELECT o_orderkey,
         -LN((CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),
                                       1, 13)) AS BIGINT) + 1)
             / 4503599627370496.0) / o_totalprice AS key
  FROM orders
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(row_number() OVER (ORDER BY key, o_orderkey) AS BIGINT) AS rnk,
       ROUND(key, 6) AS priority
FROM p QUALIFY rnk <= 20
"""


_COVERAGE_K = 8


def q_coverage_selection(sf_dir: str):
    """Greedy coverage-maximizing document selection (the facility-
    location / max-cover coreset shape behind 'pick the K most
    informative documents' data-selection recipes): K = 8 exact greedy
    rounds, each picking the document adding the most NOT-yet-covered
    distinct tokens (tie: doc_id asc), stopping early when no document
    adds anything. Submodularity makes exact greedy a (1 - 1/e)
    approximation of the optimal K-cover — the classic result the
    selection literature builds on.

    Scale shape: one streamed scan PER ROUND over the materialized
    input; each batch computes per-doc marginal gains vectorized
    (explode -> drop covered via isin -> group size) and emits ONLY its
    local winner plus that winner's uncovered-token payload, so the
    driver folds B candidate rows per round and never re-reads the
    winning doc. Driver state is the covered-token set — bounded by
    the union vocabulary of <= K documents, NOT the corpus vocabulary
    — re-broadcast each round via ray.put. At true 100 TB scale the
    round count, not the scan, is the cost: swap in stochastic/lazy
    greedy by sampling candidate batches per round — the kernel is
    unchanged."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    covered: set = set()
    rows, cum = [], 0
    for step in range(1, _COVERAGE_K + 1):
        cov_ref = ray.put(covered)

        def gains(df: pd.DataFrame, _cov=cov_ref) -> pd.DataFrame:
            cov = ray.get(_cov)
            ex = df["text"].str.lower().str.findall(
                r"[a-z0-9]+").explode().dropna()
            fr = pd.DataFrame({
                "doc_id": df["doc_id"].reindex(ex.index).astype("int64"),
                "token": ex}).drop_duplicates()
            if cov:
                fr = fr.loc[~fr["token"].isin(cov)]
            if fr.empty:
                return pd.DataFrame({
                    "doc_id": pd.Series([], dtype="int64"),
                    "gain": pd.Series([], dtype="int64"),
                    "toks": pd.Series([], dtype="object")})
            g = fr.groupby("doc_id", as_index=False).size() \
                .rename(columns={"size": "gain"})
            g = g.sort_values(["gain", "doc_id"],
                              ascending=[False, True]).head(1)
            wid = int(g["doc_id"].iloc[0])
            toks = "\x1f".join(fr.loc[fr["doc_id"] == wid, "token"])
            return pd.DataFrame({"doc_id": [np.int64(wid)],
                                 "gain": g["gain"].astype("int64").values,
                                 "toks": [toks]})

        cands = ds.map_batches(gains, batch_format="pandas",
                               batch_size=8192).to_pandas()
        if "gain" not in cands.columns:  # all blocks empty: all covered
            break
        cands = cands.loc[cands["gain"] > 0]
        if cands.empty:
            break
        w = cands.sort_values(["gain", "doc_id"],
                              ascending=[False, True]).iloc[0]
        covered.update(w["toks"].split("\x1f"))
        cum += int(w["gain"])
        rows.append((step, int(w["doc_id"]), int(w["gain"]), cum))
    return pd.DataFrame(
        rows, columns=["step", "doc_id", "new_tokens", "cum_coverage"]
    ).astype({"step": "int64", "doc_id": "int64",
              "new_tokens": "int64", "cum_coverage": "int64"})


def _coverage_sql(k: int) -> str:
    """Generate the chained-CTE mirror of q_coverage_selection's greedy
    loop — one (select, covered) CTE pair per round (the pagerank
    generated-iterative-oracle trick). A round whose candidate set is
    empty yields no row, exactly like the Ray loop's early break."""
    iters = []
    for i in range(1, k + 1):
        filt = ("" if i == 1
                else f"WHERE token NOT IN (SELECT token FROM cov{i - 1})")
        carry = ("" if i == 1
                 else f"UNION SELECT token FROM cov{i - 1}")
        iters.append(f"""s{i} AS (
  SELECT doc_id, COUNT(DISTINCT token) AS gain
  FROM tok {filt}
  GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1
), cov{i} AS (
  SELECT DISTINCT token FROM tok
  WHERE doc_id IN (SELECT doc_id FROM s{i})
  {carry}
), r{i} AS (SELECT {i} AS step, doc_id, gain FROM s{i})""")
    unions = "\nUNION ALL\n".join(
        f"SELECT * FROM r{i}" for i in range(1, k + 1))
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents)
),
{','.join(iters)}
SELECT CAST(step AS BIGINT) AS step,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(gain AS BIGINT) AS new_tokens,
       CAST(SUM(gain) OVER (ORDER BY step) AS BIGINT) AS cum_coverage
FROM ({unions})
"""


SQL_COVERAGE_SELECTION = _coverage_sql(_COVERAGE_K)


_KCORE_K = 3
_KCORE_MAX_ROUNDS = 16


def q_kcore(sf_dir: str):
    """k-core decomposition (k = 3) of the thresholded part
    co-purchase graph (edges = part pairs bought together in >= 2
    orders) — the iterative PEELING shape, complementing pagerank's
    fixed-iteration power method and dedup_clusters' hash-to-min:
    repeatedly drop nodes of degree < k until a fixpoint; what
    survives is the densely-connected core (community seeds,
    recommendation backbones, graph-quality audits).

    Scale shape: edges built once (basket-bounded pair expansion ->
    by-pair bucketed count fold with the >= 2 support filter) and
    materialized; each peel round is THREE bounded shuffles — one
    by-node degree fold, then two by-endpoint semi-joins filtering the
    edge list against the surviving node set (tagged-union buckets, a
    key lives in exactly one bucket; the node set is never broadcast
    or driver-materialized). The driver holds two scalars per round.
    Convergence is data-dependent (unlike pagerank): the loop stops
    the first round nothing drops and RAISES if _KCORE_MAX_ROUNDS
    rounds don't reach the fixpoint, so the fixed-depth SQL mirror
    (peeling is a no-op after convergence) can never silently
    diverge. Output: (k, n_core_nodes, n_core_edges)."""
    B = _pair_buckets()
    W = max(8, _cpus())
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def add_ob(df: pd.DataFrame) -> pd.DataFrame:
        o = df["l_orderkey"].astype("int64")
        return pd.DataFrame({"o": o, "p": df["l_partkey"].astype("int64"),
                             "_b": o % B})

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["o", "p"])[["o", "p"]]
        m = g.merge(g, on="o", suffixes=("_a", "_b"))
        m = m.loc[m["p_a"] < m["p_b"]]
        out = m.groupby(["p_a", "p_b"], as_index=False).size() \
            .rename(columns={"size": "n", "p_a": "u", "p_b": "v"})
        return out

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            pb = (df["u"].to_numpy(np.int64) * np.int64(1_000_003)
                  + df["v"].to_numpy(np.int64)) % B
        return df.assign(_pb=pb.astype("int64"))

    def fold_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "v"], as_index=False)["n"].sum()
        return out.loc[out["n"] >= 2, ["u", "v"]]

    edges = (ds.map_batches(add_ob, batch_format="pandas",
                            batch_size=65536)
             .groupby("_b").map_groups(pair_counts, batch_format="pandas")
             .map_batches(add_pb, batch_format="pandas")
             .groupby("_pb").map_groups(fold_pairs, batch_format="pandas")
             .materialize())

    def degrees(e: ray.data.Dataset) -> ray.data.Dataset:
        def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
            c = pd.concat([df["u"], df["v"]]).value_counts()
            return pd.DataFrame({"node": c.index.to_numpy(np.int64),
                                 "n": c.to_numpy(np.int64)})
        return (e.map_batches(deg_partial, batch_format="pandas")
                .map_batches(lambda df: df.assign(
                    _b=(df["node"] % B).astype("int64")),
                    batch_format="pandas")
                .groupby("_b").map_groups(
                    lambda g: g.groupby("node", as_index=False)["n"].sum(),
                    batch_format="pandas")
                .materialize())

    def semi(e: ray.data.Dataset, col: str,
             keep: ray.data.Dataset) -> ray.data.Dataset:
        other = "v" if col == "u" else "u"

        def e_prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"_b": (df[col] % B).astype("int64"),
                                 "k": df[col].astype("int64"),
                                 "other": df[other].astype("int64"),
                                 "side": "e"})

        def d_prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"_b": (df["node"] % B).astype("int64"),
                                 "k": df["node"].astype("int64"),
                                 "other": np.int64(-1), "side": "d"})

        def flt(g: pd.DataFrame) -> pd.DataFrame:
            ks = g.loc[g["side"] == "d", "k"]
            e_ = g.loc[g["side"] == "e"]
            e_ = e_.loc[e_["k"].isin(ks)]
            uu = e_["k"] if col == "u" else e_["other"]
            vv = e_["other"] if col == "u" else e_["k"]
            return pd.DataFrame({"u": uu.to_numpy(np.int64),
                                 "v": vv.to_numpy(np.int64)})

        return (e.map_batches(e_prep, batch_format="pandas")
                .union(keep.map_batches(d_prep, batch_format="pandas"))
                .repartition(W)
                .groupby("_b").map_groups(flt, batch_format="pandas"))

    cur, converged, empty = edges, False, False
    for _ in range(_KCORE_MAX_ROUNDS):
        deg = degrees(cur)
        n_all = deg.count()
        kept = deg.map_batches(
            lambda df: df.loc[df["n"] >= _KCORE_K, ["node"]],
            batch_format="pandas").materialize()
        n_keep = kept.count()
        if n_keep == n_all:
            converged = True
            break
        if n_keep == 0:
            converged, empty = True, True
            break
        cur = semi(semi(cur, "u", kept), "v", kept).materialize()
    if not converged:
        raise RuntimeError(
            f"kcore: no fixpoint within {_KCORE_MAX_ROUNDS} peel rounds — "
            "raise _KCORE_MAX_ROUNDS (and regenerate SQL_KCORE) for this "
            "graph")
    if empty:
        n_nodes, n_edges = 0, 0
    else:
        n_edges = cur.count()
        n_nodes = degrees(cur).count() if n_edges else 0
    return pd.DataFrame({
        "k": pd.Series([_KCORE_K], dtype="int64"),
        "n_core_nodes": pd.Series([n_nodes], dtype="int64"),
        "n_core_edges": pd.Series([n_edges], dtype="int64")})


def _kcore_sql(k: int, rounds: int) -> str:
    """Fixed-depth CTE mirror of the peel loop: peeling is idempotent
    after the fixpoint, so `rounds` >= the true peel depth (which the
    Ray side VERIFIES by raising) makes round `rounds` the core."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""n{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT u AS node FROM e{i - 1} UNION ALL SELECT v AS node FROM e{i - 1})
  GROUP BY node HAVING COUNT(*) >= {k}
), e{i} AS MATERIALIZED (
  SELECT u, v FROM e{i - 1}
  WHERE u IN (SELECT node FROM n{i}) AND v IN (SELECT node FROM n{i})
)""")
    return f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
{','.join(steps)}
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (
          SELECT u AS node FROM e{rounds}
          UNION SELECT v AS node FROM e{rounds})) AS n_core_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e{rounds}) AS n_core_edges
"""


SQL_KCORE = _kcore_sql(_KCORE_K, _KCORE_MAX_ROUNDS)


_MMR_K = 10
_MMR_LAMBDA = 0.7


def q_mmr_search(sf_dir: str):
    """MMR (maximal-marginal-relevance) diversified top-10 retrieval
    over the embedding column: greedy rounds picking
    argmax lambda*cos(q, d) - (1-lambda)*max_{s in S} cos(d, s) —
    the standard re-ranking that stops a dense retriever returning ten
    near-duplicates (Carbonell & Goldstein '98), and the selection
    shape RAG / eval-set builders use for diversity. Query = vec_id 0;
    candidates = everything else.

    Scale shape: per round ONE streamed scan — the query vector and
    the <= K selected vectors (a (K, 64) float block, bounded by K, not
    the corpus) broadcast via ray.put; each batch scores vectorized
    (two matmuls) and emits only its LOCAL winner carrying its vector
    payload, so the driver folds B rows per round and never re-reads
    the winner. Scores are rounded to 9 decimals BEFORE the argmax on
    both sides (the knn_bruteforce convention) so the
    (score desc, vec_id) pick is ulp-immune."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    qrow = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                 filter=pc.field("vec_id") == 0).to_pandas()
    qv = np.asarray(qrow["embedding"].iloc[0], dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    q_ref = ray.put(qv)
    sel_ids: list[int] = []
    sel_vecs: list[np.ndarray] = []
    rows = []
    for step in range(1, _MMR_K + 1):
        sel_ref = ray.put((list(sel_ids),
                           np.array(sel_vecs, dtype=np.float64)))

        def local_best(df: pd.DataFrame, _q=q_ref,
                       _s=sel_ref) -> pd.DataFrame:
            qv_ = ray.get(_q)
            ids_, sv = ray.get(_s)
            keep = (df["vec_id"] != 0) & ~df["vec_id"].isin(ids_)
            df = df.loc[keep]
            if df.empty:
                return pd.DataFrame({
                    "vec_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                    "vec": pd.Series([], dtype="object")})
            V = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            sim_q = Vn @ qv_
            if len(sv):
                svn = sv / np.linalg.norm(sv, axis=1, keepdims=True)
                sim_s = (Vn @ svn.T).max(axis=1)
            else:
                sim_s = np.zeros(len(V))
            score = np.round(_MMR_LAMBDA * sim_q
                             - (1.0 - _MMR_LAMBDA) * sim_s, 9)
            out = pd.DataFrame({"vec_id": df["vec_id"].to_numpy(np.int64),
                                "score": score,
                                "vec": list(V)})
            return out.sort_values(["score", "vec_id"],
                                   ascending=[False, True]).head(1)

        cands = ds.map_batches(local_best, batch_format="pandas",
                               batch_size=4096).to_pandas()
        if "score" not in cands.columns or cands.empty:
            break
        w = cands.sort_values(["score", "vec_id"],
                              ascending=[False, True]).iloc[0]
        sel_ids.append(int(w["vec_id"]))
        sel_vecs.append(np.asarray(w["vec"], dtype=np.float64))
        rows.append((step, int(w["vec_id"]), float(w["score"])))
    return pd.DataFrame(rows, columns=["step", "vec_id", "mmr_score"]) \
        .astype({"step": "int64", "vec_id": "int64",
                 "mmr_score": "float64"})


def _mmr_sql(k: int, lam: float) -> str:
    """Generated chained-CTE mirror of the MMR greedy loop: per round,
    score every remaining candidate with a correlated MAX over the
    selected-so-far set (each pick CTE carries its vector), round to 9,
    pick (score desc, vec_id)."""
    steps = []
    for i in range(1, k + 1):
        if i == 1:
            pen = "0.0"
            notin = ""
        else:
            sel = " UNION ALL ".join(
                f"SELECT ve FROM p{j}" for j in range(1, i))
            pen = (f"COALESCE((SELECT MAX(list_cosine_similarity(c.ve, "
                   f"s.ve)) FROM ({sel}) s), 0.0)")
            notin = ("AND c.vec_id NOT IN ("
                     + " UNION ALL ".join(
                         f"SELECT vec_id FROM p{j}" for j in range(1, i))
                     + ")")
        steps.append(f"""sc{i} AS MATERIALIZED (
  SELECT c.vec_id,
         ROUND({lam!r} * list_cosine_similarity(c.ve, (SELECT qe FROM q))
               - {1.0 - lam!r} * {pen}, 9) AS score,
         c.ve
  FROM cand c WHERE TRUE {notin}
), p{i} AS MATERIALIZED (
  SELECT vec_id, score, ve FROM sc{i}
  ORDER BY score DESC, vec_id LIMIT 1
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, vec_id, score FROM p{i}"
        for i in range(1, k + 1))
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
           WHERE vec_id = 0),
cand AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
  WHERE vec_id <> 0
),
{','.join(steps)}
SELECT CAST(step AS BIGINT) AS step,
       CAST(vec_id AS BIGINT) AS vec_id,
       score AS mmr_score
FROM ({unions})
"""


SQL_MMR_SEARCH = _mmr_sql(_MMR_K, _MMR_LAMBDA)


_RRF_K = 60          # standard RRF damping constant (Cormack et al. '09)
_RRF_TERM = "join"   # lexical query
_RRF_QVEC = 0        # dense query = embedding of vec_id 0
_RRF_DEPTH = 20      # per-system candidate depth fed into the fusion


def q_hybrid_rrf(sf_dir: str):
    """Reciprocal-rank-fusion hybrid retrieval: fuse a BM25 lexical
    ranking (term 'join' over documents) with a dense cosine ranking
    (query vector vec_id 0 over the aligned embeddings table) as
    sum_systems 1/(K + rank), K=60 — the standard lexical+dense fusion
    every hybrid RAG retriever runs (Cormack et al. SIGIR '09). Top-10
    fused docs with their fused score.

    Scale shape: each leg is one streamed scan emitting a local
    top-DEPTH per batch (the union of local top-D provably contains the
    global top-D since a doc's score is complete within its batch) plus,
    on the lexical side, an O(1)-row stats partial (n_docs, total
    tokens, df) the driver folds for idf/avgdl. The driver then fuses
    two <= DEPTH-row rankings — never corpus-sized data. BM25 doubles
    are bit-identical to the SQL mirror (same int ratios through libm
    ln); dense sims are rounded to 9 before ranking (the knn
    convention), so both systems' rank orders cannot diverge."""
    import math

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def lex_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _token_frame(df.reset_index(drop=True))
        dl = t.groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "dl"})
        tf = t.loc[t["token"] == _RRF_TERM] \
            .groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "tf"})
        cand = tf.merge(dl, on="doc_id")
        out = pd.DataFrame({"doc_id": cand["doc_id"].astype("int64"),
                            "tf": cand["tf"].astype("int64"),
                            "dl": cand["dl"].astype("int64")})
        # stats partials ride the same frame: doc_id=-1 carries
        # (n_docs_with_tokens, total_tokens), doc_id=-2 carries (df, 0)
        stats = pd.DataFrame({
            "doc_id": np.array([-1, -2], dtype=np.int64),
            "tf": np.array([len(dl), len(tf)], dtype=np.int64),
            "dl": np.array([dl["dl"].sum(), 0], dtype=np.int64)})
        return pd.concat([out, stats], ignore_index=True)

    parts = docs.map_batches(lex_partial, batch_format="pandas",
                             batch_size=65536).materialize()
    sp = parts.map_batches(lambda df: df.loc[df["doc_id"] < 0],
                           batch_format="pandas").to_pandas()
    n_docs = int(sp.loc[sp["doc_id"] == -1, "tf"].sum())
    avgdl = float(sp.loc[sp["doc_id"] == -1, "dl"].sum()) / n_docs
    df_term = int(sp.loc[sp["doc_id"] == -2, "tf"].sum())
    idf = math.log((n_docs - df_term + 0.5) / (df_term + 0.5))
    bc = ray.put((idf, avgdl))

    def lex_local(df: pd.DataFrame) -> pd.DataFrame:
        idf_, ad = ray.get(bc)
        df = df.loc[df["doc_id"] >= 0]
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        tf = df["tf"].to_numpy(np.float64)
        dl = df["dl"].to_numpy(np.float64)
        score = idf_ * tf * (_BM25_K1 + 1.0) \
            / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / ad))
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                            "score": score})
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True]).head(_RRF_DEPTH)

    lex = parts.map_batches(lex_local, batch_format="pandas").to_pandas() \
        .sort_values(["score", "doc_id"], ascending=[False, True]) \
        .head(_RRF_DEPTH).reset_index(drop=True)
    lex["rnk_l"] = np.arange(1, len(lex) + 1, dtype=np.int64)

    qrow = _read(sf_dir, "embeddings", ["vec_id", "embedding"],
                 filter=pc.field("vec_id") == _RRF_QVEC).to_pandas()
    qv = np.asarray(qrow["embedding"].iloc[0], dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    q_ref = ray.put(qv)

    def dense_local(df: pd.DataFrame) -> pd.DataFrame:
        sims = np.round(_normed_batch(df) @ ray.get(q_ref), 9)
        out = pd.DataFrame({"doc_id": df["vec_id"].to_numpy(np.int64),
                            "sim": sims})
        return out.sort_values(["sim", "doc_id"],
                               ascending=[False, True]).head(_RRF_DEPTH)

    dense = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .map_batches(dense_local, batch_format="pandas",
                     batch_size=4096).to_pandas() \
        .sort_values(["sim", "doc_id"], ascending=[False, True]) \
        .head(_RRF_DEPTH).reset_index(drop=True)
    dense["rnk_d"] = np.arange(1, len(dense) + 1, dtype=np.int64)

    m = lex[["doc_id", "rnk_l"]].merge(dense[["doc_id", "rnk_d"]],
                                       on="doc_id", how="outer")
    rl = m["rnk_l"].to_numpy(np.float64)   # NaN where absent
    rd = m["rnk_d"].to_numpy(np.float64)
    rrf = np.where(np.isnan(rl), 0.0, 1.0 / (_RRF_K + rl)) \
        + np.where(np.isnan(rd), 0.0, 1.0 / (_RRF_K + rd))
    out = pd.DataFrame({"doc_id": m["doc_id"].to_numpy(np.int64),
                        "rrf": rrf}) \
        .sort_values(["rrf", "doc_id"], ascending=[False, True]) \
        .head(10).reset_index(drop=True)
    return pd.DataFrame({"doc_id": out["doc_id"],
                         "rnk": np.arange(1, len(out) + 1, dtype=np.int64),
                         "rrf_score": np.round(out["rrf"].to_numpy(), 9)})


# same tokenizer/score expression as SQL_BM25_SEARCH; the fusion is
# 1.0/(60+rank) summed lex-then-dense on both sides (identical doubles)
SQL_HYBRID_RRF = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(string_split(nt, ' ')) AS token
  FROM norm WHERE length(nt) > 0
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
stats AS (SELECT COUNT(*) AS nd, SUM(dl) * 1.0 / COUNT(*) AS avgdl
          FROM dl),
tf AS (
  SELECT doc_id, COUNT(*) AS tf FROM tok WHERE token = 'join' GROUP BY 1
),
dfq AS (SELECT COUNT(*) AS df FROM tf),
lex_scored AS (
  SELECT tf.doc_id,
         LN((s.nd - d.df + 0.5) / (d.df + 0.5))
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl))
           AS score
  FROM tf JOIN dl USING (doc_id) CROSS JOIN dfq d CROSS JOIN stats s
),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rnk_l
  FROM lex_scored QUALIFY rnk_l <= 20
),
q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
dense_s AS (
  SELECT e.vec_id AS doc_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 9)
           AS sim
  FROM embeddings e CROSS JOIN q
),
dense AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY sim DESC, doc_id) AS rnk_d
  FROM dense_s QUALIFY rnk_d <= 20
),
fused AS (
  SELECT doc_id,
         COALESCE(1.0 / (60 + l.rnk_l), 0.0)
           + COALESCE(1.0 / (60 + d.rnk_d), 0.0) AS rrf
  FROM lex l FULL OUTER JOIN dense d USING (doc_id)
),
r AS (
  SELECT doc_id, rrf,
         row_number() OVER (ORDER BY rrf DESC, doc_id) AS rnk
  FROM fused
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rnk AS BIGINT) AS rnk,
       ROUND(rrf, 9) AS rrf_score
FROM r WHERE rnk <= 10
"""


def q_bpe_merge_pairs(sf_dir: str):
    """BPE tokenizer-training round 0: the exact global top-10
    character-pair merge candidates — for every token OCCURRENCE in the
    corpus, every adjacent character bigram inside the token, summed
    corpus-wide (Sennrich et al. ACL '16: the pair a BPE trainer would
    merge first, plus the next nine). The op every from-scratch
    tokenizer build starts with.

    Scale shape: each batch first collapses its token occurrences with
    value_counts (Zipf makes distinct-per-batch << occurrences), then
    expands bigrams VECTORIZED by character offset (a <= max-token-len
    loop of str.slice calls over shrinking row sets — never a loop over
    rows) into a per-batch (pair, cnt) partial; one bounded
    _bucketed_combine by pair hash with per-bucket top-10 pruning means
    the driver folds <= buckets*10 rows, never the pair vocabulary.
    Exact because every partial of a pair lands in one bucket and the
    global top-10 is a subset of the per-bucket top-10 union."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split().explode().dropna()
        empty = pd.DataFrame({"pair": pd.Series([], dtype="object"),
                              "cnt": pd.Series([], dtype="int64")})
        if toks.empty:
            return empty
        wf = toks.value_counts()
        w = pd.Series(wf.index)
        f = pd.Series(wf.to_numpy(np.int64))
        lens = w.str.len()
        chunks = []
        for i in range(int(lens.max()) - 1):
            m = lens >= i + 2
            if not m.any():
                break
            chunks.append(pd.DataFrame({
                "pair": w.loc[m].str.slice(i, i + 2).to_numpy(),
                "cnt": f.loc[m].to_numpy()}))
        if not chunks:
            return empty
        p = pd.concat(chunks, ignore_index=True) \
            .groupby("pair", as_index=False)["cnt"].sum()
        p["cnt"] = p["cnt"].astype("int64")
        return p

    parts = ds.map_batches(pair_partial, batch_format="pandas",
                           batch_size=8192)
    agg = _bucketed_combine(parts, ["pair"], {"cnt": "sum"},
                            topk=(10, ["cnt", "pair"], [False, True]))
    top = agg.sort_values(["cnt", "pair"], ascending=[False, True]) \
        .head(10).reset_index(drop=True)
    return pd.DataFrame({"pair": top["pair"],
                         "cnt": top["cnt"].astype("int64"),
                         "rnk": np.arange(1, len(top) + 1,
                                          dtype=np.int64)})


# same whitespace tokenizer as the bm25/token rows; substring and
# pandas str.slice are both codepoint-based, so multibyte text agrees
SQL_BPE_MERGE_PAIRS = r"""
WITH norm AS (
  SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT unnest(string_split(nt, ' ')) AS w
  FROM norm WHERE length(nt) > 0
),
pairs AS (
  SELECT substring(w, i, 2) AS pair
  FROM (
    SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
    FROM tok WHERE length(w) >= 2
  )
),
agg AS (SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY 1),
r AS (
  SELECT pair, cnt,
         row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
  FROM agg
)
SELECT pair, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 10
"""


_LOGREG_LR = 0.5
_LOGREG_ITERS = 5


def q_logreg_train(sf_dir: str):
    """Distributed logistic-regression training (full-batch gradient
    descent, 5 iterations): learn P(o_orderpriority = '1-URGENT') from
    o_totalprice — the iterative-ML representative (quality-classifier
    training is THE data-pipeline model job) alongside the iterative
    graph rows (pagerank, kcore). Per iteration ONE streamed scan emits
    per-batch integer gradient partials; the driver folds O(batches)
    rows, holds two weights, and broadcasts them back — the classic
    parameter-server-less GD shape that scales to any corpus because
    model state is O(features), data never leaves the cluster.

    Bit-exact across engines via fixed-point gradients (the
    _micro_revenue trick applied to training): the per-row residual
    sigmoid(w.x) - y is quantized with FLOOR(r * 1e6) (floor, not
    round — no tie ambiguity) to an int64, and the gradient is the
    EXACT integer sum of r_int (and r_int * cents), folded as Python
    ints driver-side / HUGEINT in the SQL mirror, so the weight
    trajectory is an identical double sequence on both sides. The
    sigmoid's exp goes through libm (math.exp per element — numpy's
    SIMD exp strays ulps from the glibc libm DuckDB calls; swap to
    np.exp when the gate is tolerance-style rather than bit-exact).
    Features are exact ints: price cents (x = cents * 1e-8), bias 1."""
    import math

    ds = _read(sf_dir, "orders", ["o_totalprice", "o_orderpriority"])

    def feat(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        y = pc.cast(pc.equal(t["o_orderpriority"], "1-URGENT"), pa.int64())
        return pa.table({"cents": cents, "y": y})

    fds = ds.map_batches(feat, batch_format="pyarrow").materialize()
    n = fds.count()
    w0, w1 = 0.0, 0.0
    rows = []
    for it in range(1, _LOGREG_ITERS + 1):
        ref = ray.put((w0, w1))

        def grad(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            a, b = ray.get(_r)
            c = df["cents"].to_numpy(np.int64)
            yv = df["y"].to_numpy(np.int64)
            z = a + b * (c * 1e-08)
            s = np.array([1.0 / (1.0 + math.exp(-v)) for v in z],
                         dtype=np.float64)
            r = np.floor((s - yv) * 1000000.0).astype(np.int64)
            return pd.DataFrame({
                "g0": [int(r.sum())],
                "g1": [int((r * c).sum())],
                "m": [int(((z >= 0) == (yv == 1)).sum())]})

        p = fds.map_batches(grad, batch_format="pandas",
                            batch_size=8192).to_pandas()
        # Python-int fold: per-batch partials fit int64, their sum at
        # arbitrary scale may not
        g0 = sum(int(v) for v in p["g0"])
        g1 = sum(int(v) for v in p["g1"])
        m = sum(int(v) for v in p["m"])
        acc = float(m) / float(n)
        w0 = w0 - _LOGREG_LR * (float(g0) / 1000000.0) / float(n)
        w1 = w1 - _LOGREG_LR * ((float(g1) / 1000000.0)
                                / 100000000.0) / float(n)
        rows.append((it, round(w0, 9), round(w1, 9), round(acc, 9)))
    return pd.DataFrame(rows, columns=["iter", "w0", "w1", "acc"]) \
        .astype({"iter": "int64", "w0": "float64", "w1": "float64",
                 "acc": "float64"})


def _logreg_sql(iters: int, lr: float) -> str:
    """Generated chained-CTE mirror of the fixed-point GD loop: each
    iteration aggregates the same FLOOR-quantized residuals (exact
    HUGEINT sums) and derives the next weights with the identical
    double expression; acc is reported with the PRE-update weights,
    matching the Ray loop."""
    cte = ["""feat AS MATERIALIZED (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
)""", "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM feat)",
        "it0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1)"]
    outs = []
    for i in range(1, iters + 1):
        p = i - 1
        z = (f"((SELECT w0 FROM it{p}) + (SELECT w1 FROM it{p})"
             f" * (cents * 1e-08))")
        cte.append(f"""g{i} AS MATERIALIZED (
  SELECT CAST(SUM(r) AS DOUBLE) AS g0,
         CAST(SUM(r * cents) AS DOUBLE) AS g1,
         SUM(CASE WHEN (z >= 0) = (y = 1) THEN 1 ELSE 0 END) AS m
  FROM (
    SELECT cents, y, {z} AS z,
           CAST(FLOOR((1.0 / (1.0 + EXP(-{z})) - y) * 1000000.0)
                AS BIGINT) AS r
    FROM feat)
)""")
        cte.append(f"""it{i} AS MATERIALIZED (
  SELECT (SELECT w0 FROM it{p})
           - {lr!r} * ((SELECT g0 FROM g{i}) / 1000000.0)
             / (SELECT n FROM nn) AS w0,
         (SELECT w1 FROM it{p})
           - {lr!r} * (((SELECT g1 FROM g{i}) / 1000000.0)
                       / 100000000.0)
             / (SELECT n FROM nn) AS w1
)""")
        outs.append(f"SELECT {i} AS iter, (SELECT w0 FROM it{i}) AS w0,"
                    f" (SELECT w1 FROM it{i}) AS w1,"
                    f" CAST((SELECT m FROM g{i}) AS DOUBLE)"
                    f" / (SELECT n FROM nn) AS acc")
    unions = "\nUNION ALL\n".join(outs)
    return f"""
WITH {','.join(cte)}
SELECT CAST(iter AS BIGINT) AS iter, ROUND(w0, 9) AS w0,
       ROUND(w1, 9) AS w1, ROUND(acc, 9) AS acc
FROM ({unions})
"""


SQL_LOGREG_TRAIN = _logreg_sql(_LOGREG_ITERS, _LOGREG_LR)


def _logreg_cv_sql(iters: int, lr: float) -> str:
    """Generated 2-fold CV mirror: one full fixed-point GD chain per
    fold (train on orderkey parity f, evaluate with the FINAL weights
    on the complementary fold)."""
    cte = ["""featk AS MATERIALIZED (
  SELECT o_orderkey % 2 AS fold,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
)"""]
    outs = []
    for f in (0, 1):
        cte.append(f"""tr{f} AS MATERIALIZED (
  SELECT cents, y FROM featk WHERE fold = {f}
)""")
        cte.append(f"nn{f} AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n "
                   f"FROM tr{f})")
        cte.append(f"f{f}it0 AS (SELECT CAST(0.0 AS DOUBLE) AS w0, "
                   f"CAST(0.0 AS DOUBLE) AS w1)")
        for i in range(1, iters + 1):
            p = i - 1
            z = (f"((SELECT w0 FROM f{f}it{p}) + "
                 f"(SELECT w1 FROM f{f}it{p}) * (cents * 1e-08))")
            cte.append(f"""f{f}g{i} AS MATERIALIZED (
  SELECT CAST(SUM(r) AS DOUBLE) AS g0,
         CAST(SUM(r * cents) AS DOUBLE) AS g1
  FROM (
    SELECT cents,
           CAST(FLOOR((1.0 / (1.0 + EXP(-{z})) - y) * 1000000.0)
                AS BIGINT) AS r
    FROM tr{f})
)""")
            cte.append(f"""f{f}it{i} AS MATERIALIZED (
  SELECT (SELECT w0 FROM f{f}it{p})
           - {lr!r} * ((SELECT g0 FROM f{f}g{i}) / 1000000.0)
             / (SELECT n FROM nn{f}) AS w0,
         (SELECT w1 FROM f{f}it{p})
           - {lr!r} * (((SELECT g1 FROM f{f}g{i}) / 1000000.0)
                       / 100000000.0)
             / (SELECT n FROM nn{f}) AS w1
)""")
        cte.append(f"""ev{f} AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS test_n,
         CAST(SUM(CASE WHEN (((SELECT w0 FROM f{f}it{iters})
                   + (SELECT w1 FROM f{f}it{iters}) * (cents * 1e-08))
                   >= 0) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS m
  FROM featk WHERE fold = {1 - f}
)""")
        outs.append(
            f"SELECT {f} AS fold, (SELECT CAST(n AS BIGINT) FROM "
            f"(SELECT COUNT(*) AS n FROM tr{f})) AS train_n, "
            f"(SELECT test_n FROM ev{f}) AS test_n, "
            f"(SELECT w0 FROM f{f}it{iters}) AS w0, "
            f"(SELECT w1 FROM f{f}it{iters}) AS w1, "
            f"CAST((SELECT m FROM ev{f}) AS DOUBLE)"
            f" / (SELECT test_n FROM ev{f}) AS test_acc")
    unions = "\nUNION ALL\n".join(outs)
    return f"""
WITH {','.join(cte)}
SELECT CAST(fold AS BIGINT) AS fold, train_n, test_n,
       ROUND(w0, 9) AS w0, ROUND(w1, 9) AS w1,
       ROUND(test_acc, 9) AS test_acc
FROM ({unions})
"""


def q_logreg_cv(sf_dir: str):
    """2-fold cross-validated logistic regression — the honest eval
    protocol on top of :func:`q_logreg_train` (training accuracy
    flatters; held-out accuracy is the number a model card reports).
    Folds are the deterministic orderkey parity (no RNG, stable across
    cluster sizes); each fold trains the same fixed-point GD loop on
    its half and evaluates the FINAL weights on the complement. All
    gradient sums stay exact integers (Python big-int folds / HUGEINT),
    the weight trajectories and accuracies are mirrored double
    expressions — the whole 2x(5-iteration) protocol is bit-checkable.
    Per iteration and fold: ONE streamed scan, O(features) driver
    state."""
    import math

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderpriority"])

    def feat(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t["o_totalprice"], pa.scalar(100.0))), pa.int64())
        y = pc.cast(pc.equal(t["o_orderpriority"], "1-URGENT"),
                    pa.int64())
        fold = pc.cast(pc.bit_wise_and(t["o_orderkey"], 1), pa.int64())
        return pa.table({"fold": fold, "cents": cents, "y": y})

    fds = ds.map_batches(feat, batch_format="pyarrow").materialize()
    rows = []
    for f in (0, 1):
        cnt = fds.map_batches(
            lambda df, _f=f: pd.DataFrame(
                {"tr": [int((df["fold"] == _f).sum())],
                 "te": [int((df["fold"] != _f).sum())]}),
            batch_format="pandas").to_pandas().sum()
        train_n, test_n = int(cnt["tr"]), int(cnt["te"])
        w0, w1 = 0.0, 0.0
        for _ in range(_LOGREG_ITERS):
            ref = ray.put((w0, w1, f))

            def grad(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
                a, b, ff = ray.get(_r)
                sub = df.loc[df["fold"] == ff]
                c = sub["cents"].to_numpy(np.int64)
                yv = sub["y"].to_numpy(np.int64)
                z = a + b * (c * 1e-08)
                s = np.array([1.0 / (1.0 + math.exp(-v)) for v in z],
                             dtype=np.float64)
                r = np.floor((s - yv) * 1000000.0).astype(np.int64)
                return pd.DataFrame({"g0": [int(r.sum())],
                                     "g1": [int((r * c).sum())]})

            p = fds.map_batches(grad, batch_format="pandas",
                                batch_size=8192).to_pandas()
            g0 = sum(int(v) for v in p["g0"])
            g1 = sum(int(v) for v in p["g1"])
            w0 = w0 - _LOGREG_LR * (float(g0) / 1000000.0) / float(train_n)
            w1 = w1 - _LOGREG_LR * ((float(g1) / 1000000.0)
                                    / 100000000.0) / float(train_n)
        ref = ray.put((w0, w1, f))

        def ev(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            a, b, ff = ray.get(_r)
            sub = df.loc[df["fold"] != ff]
            c = sub["cents"].to_numpy(np.int64)
            yv = sub["y"].to_numpy(np.int64)
            z = a + b * (c * 1e-08)
            return pd.DataFrame({"m": [int(((z >= 0) == (yv == 1)).sum())]})

        m = int(fds.map_batches(ev, batch_format="pandas",
                                batch_size=8192).to_pandas()["m"].sum())
        rows.append((f, train_n, test_n, round(w0, 9), round(w1, 9),
                     round(float(m) / float(test_n), 9)))
    out = pd.DataFrame(rows, columns=["fold", "train_n", "test_n",
                                      "w0", "w1", "test_acc"])
    for c in ("fold", "train_n", "test_n"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


SQL_LOGREG_CV = _logreg_cv_sql(_LOGREG_ITERS, _LOGREG_LR)


_REDACT_PAT = r"\b[a-z]{5,}er\b"   # RE2-safe PII-surrogate span pattern


def q_span_redact(sf_dir: str):
    """PII-shaped span extraction + redaction — the transform every
    training-data pipeline runs before release: per document, find all
    sensitive-span matches (the RE2-safe surrogate pattern stands in
    for email/phone/SSN regexes; the synthetic corpus has no real PII),
    count them, keep the first span for audit, and emit the md5 of the
    text with every span replaced by [REDACTED]. One stateless
    vectorized map over the stream (findall/replace are pandas str
    kernels, hash per KEPT doc), rows out only for docs with >= 1
    match, returned as a live Dataset — no driver materialization, so
    the transform IS the 100 TB path (write_parquet the result).
    Python re and DuckDB RE2 agree on this pattern class (no
    lookaround/backrefs), both replace non-overlapping leftmost
    matches, and md5 hex pins the full redacted text byte-for-byte."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def work(df: pd.DataFrame) -> pd.DataFrame:
        spans = df["text"].str.findall(_REDACT_PAT)
        n = spans.str.len().astype("int64")
        keep = n > 0
        red = df.loc[keep, "text"].str.replace(
            _REDACT_PAT, "[REDACTED]", regex=True)
        return pd.DataFrame({
            "doc_id": df.loc[keep, "doc_id"].astype("int64"),
            "n_spans": n.loc[keep],
            "first_span": spans.loc[keep].str[0],
            "redacted_md5": red.map(
                lambda t: hashlib.md5(t.encode()).hexdigest()),
        })

    return ds.map_batches(work, batch_format="pandas", batch_size=8192)


SQL_SPAN_REDACT = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(text, '\b[a-z]{5,}er\b')) AS BIGINT)
         AS n_spans,
       regexp_extract_all(text, '\b[a-z]{5,}er\b')[1] AS first_span,
       md5(regexp_replace(text, '\b[a-z]{5,}er\b', '[REDACTED]', 'g'))
         AS redacted_md5
FROM documents
WHERE regexp_matches(text, '\b[a-z]{5,}er\b')
"""


_DSIR_TGT_LANG = "en"


def q_dsir_weights(sf_dir: str):
    """DSIR importance weighting (Xie et al., NeurIPS '23): score every
    document by how much it resembles a TARGET distribution (here the
    lang='en' slice) relative to the full corpus — per doc the sum over
    token occurrences of ln p_tgt(w) - ln q_corpus(w) with add-0.5
    smoothing over the shared vocabulary — then keep the top-20, the
    importance-resampling selection step of data-curation pipelines.

    Integer-exact across engines: each token's log-ratio is quantized
    ONCE as S(w) = floor(score * 1e9) (libm ln via math.log = DuckDB
    LN; floor has no tie ambiguity) and doc weights are EXACT int64
    sums of tf * S(w), so no float accumulation order can diverge.

    Scale shape: one scan emits per-batch (doc_id, token, tf) rows plus
    per-token (c_all, c_tgt) stat partials riding the same frame
    (doc_id = -1); the smoothing totals (vocab size V, occurrence
    totals) come from an O(buckets) per-bucket reduction over the stat
    rows — the driver folds 3 numbers per bucket, never the vocabulary.
    Scoring is ONE bucketed shuffle co-locating each token's stats with
    its occurrence rows (no vocab broadcast), per-doc partials then
    fold through the standard bucketed combine with top-20 pruning."""
    import math

    B = _pair_buckets()
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        t = _token_frame(df)
        if t.empty:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "tf": pd.Series([], dtype="int64"),
                                 "c_tgt": pd.Series([], dtype="int64")})
        tf = t.groupby(["doc_id", "token"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        is_tgt = df.set_index(df["doc_id"])["lang"] == _DSIR_TGT_LANG
        t["is_tgt"] = is_tgt.reindex(t["doc_id"]).to_numpy()
        st = t.groupby("token", as_index=False).agg(
            tf=("doc_id", "size"), c_tgt=("is_tgt", "sum"))
        st.insert(1, "doc_id", np.int64(-1))   # stat partials: tf=c_all
        tf["c_tgt"] = np.int64(0)
        out = pd.concat([tf[["token", "doc_id", "tf", "c_tgt"]],
                         st[["token", "doc_id", "tf", "c_tgt"]]],
                        ignore_index=True)
        return out.astype({"doc_id": "int64", "tf": "int64",
                           "c_tgt": "int64"})

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=8192).materialize()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["token"], index=False).to_numpy()
        return df.assign(_b=(h % B).astype("int64"))

    # totals for the smoothing denominators: O(1) per bucket, exact ints
    def bucket_totals(g: pd.DataFrame) -> pd.DataFrame:
        st = g.loc[g["doc_id"] < 0]
        return pd.DataFrame({"v": [np.int64(st["token"].nunique())],
                             "all_tot": [np.int64(st["tf"].sum())],
                             "tgt_tot": [np.int64(st["c_tgt"].sum())]})

    bucketed = parts.map_batches(add_bucket, batch_format="pandas")
    tot = bucketed.groupby("_b").map_groups(
        bucket_totals, batch_format="pandas").to_pandas()
    V = int(tot["v"].sum())
    all_tot = int(tot["all_tot"].sum())
    tgt_tot = int(tot["tgt_tot"].sum())
    tref = ray.put((V, all_tot, tgt_tot))

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v, at, tt = ray.get(tref)
        st = g.loc[g["doc_id"] < 0].groupby("token", as_index=False) \
            .agg(c_all=("tf", "sum"), c_tgt=("c_tgt", "sum"))
        # libm ln per DISTINCT bucket token for bit-parity with LN
        st["s"] = np.array(
            [int(math.floor((math.log((ct + 0.5) / (tt + 0.5 * v))
                             - math.log((ca + 0.5) / (at + 0.5 * v)))
                            * 1000000000.0))
             for ca, ct in zip(st["c_all"], st["c_tgt"])],
            dtype=np.int64)
        occ = g.loc[g["doc_id"] >= 0].merge(st[["token", "s"]], on="token")
        occ["wint"] = occ["tf"].to_numpy(np.int64) \
            * occ["s"].to_numpy(np.int64)
        out = occ.groupby("doc_id", as_index=False).agg(
            wint=("wint", "sum"), n_tok=("tf", "sum"))
        return out.astype({"doc_id": "int64", "wint": "int64",
                           "n_tok": "int64"})

    partials = bucketed.groupby("_b").map_groups(
        score_bucket, batch_format="pandas")
    agg = _bucketed_combine(partials, ["doc_id"],
                            {"wint": "sum", "n_tok": "sum"},
                            topk=(20, ["wint", "doc_id"], [False, True]))
    top = agg.sort_values(["wint", "doc_id"], ascending=[False, True]) \
        .head(20).reset_index(drop=True)
    return pd.DataFrame({"doc_id": top["doc_id"].astype("int64"),
                         "wint": top["wint"].astype("int64"),
                         "n_tok": top["n_tok"].astype("int64"),
                         "rnk": np.arange(1, len(top) + 1,
                                          dtype=np.int64)})


SQL_DSIR_WEIGHTS = r"""
WITH norm AS (
  SELECT doc_id, lang,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tok AS (
  SELECT doc_id, lang, unnest(string_split(nt, ' ')) AS w
  FROM norm WHERE length(nt) > 0
),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
stats AS (
  SELECT w, COUNT(*) AS c_all,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
  FROM tok GROUP BY 1
),
totals AS (
  SELECT CAST(SUM(c_all) AS BIGINT) AS all_tot,
         CAST(SUM(c_tgt) AS BIGINT) AS tgt_tot,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM stats
),
sw AS (
  SELECT w,
         CAST(FLOOR((LN((c_tgt + 0.5) / (tgt_tot + 0.5 * v))
                     - LN((c_all + 0.5) / (all_tot + 0.5 * v)))
                    * 1000000000.0) AS BIGINT) AS s
  FROM stats CROSS JOIN totals
),
dw AS (
  SELECT tf.doc_id, SUM(tf.tf * sw.s) AS wint, SUM(tf.tf) AS n_tok
  FROM tf JOIN sw ON tf.w = sw.w GROUP BY 1
),
r AS (
  SELECT doc_id, wint, n_tok,
         row_number() OVER (ORDER BY wint DESC, doc_id) AS rnk
  FROM dw
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(wint AS BIGINT) AS wint,
       CAST(n_tok AS BIGINT) AS n_tok, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 20
"""


def q_contrastive_negatives(sf_dir: str):
    """Deterministic negative sampling for contrastive training: for
    each anchor (vec_id < 8) pick the 5 pseudo-random negatives whose
    label differs from the anchor's — the batch-construction step of
    every contrastive / triplet-loss embedding trainer, made
    reproducible (and SQL-checkable) by ranking candidates with the
    exact integer Lehmer key (vec_id * 48271) % 2147483647 (MINSTD)
    instead of an RNG, tie-broken by vec_id. Pure int64 arithmetic on
    both engines — no float, no hash-library dependence, no overflow
    for vec_id < ~1.9e14.

    Scale shape: the 8 (anchor, label) pairs broadcast once; each data
    batch emits only its LOCAL 5 smallest-key negatives per anchor
    (the global 5 are a subset of the per-batch union), then one tiny
    by-anchor grouped cut — candidate volume is 5 * anchors per batch
    regardless of corpus size."""
    anchors = _read(sf_dir, "embeddings", ["vec_id", "label"],
                    filter=pc.field("vec_id") < 8).to_pandas() \
        .sort_values("vec_id")
    a_ref = ray.put((anchors["vec_id"].to_numpy(np.int64),
                     anchors["label"].to_numpy(np.int64)))
    ds = _read(sf_dir, "embeddings", ["vec_id", "label"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        qids, qlabs = ray.get(a_ref)
        v = df["vec_id"].to_numpy(np.int64)
        lab = df["label"].to_numpy(np.int64)
        rk = (v * np.int64(48271)) % np.int64(2147483647)
        qcol, vcol, rcol = [], [], []
        for qid, ql in zip(qids, qlabs):
            m = lab != ql
            order = np.lexsort((v[m], rk[m]))[:5]
            vcol.append(v[m][order])
            rcol.append(rk[m][order])
            qcol.append(np.full(len(order), qid, dtype=np.int64))
        return pd.DataFrame({"qid": np.concatenate(qcol),
                             "vec_id": np.concatenate(vcol),
                             "rk": np.concatenate(rcol)})

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rk", "vec_id"]).head(5)
        return pd.DataFrame({"qid": g["qid"].to_numpy(np.int64),
                             "vec_id": g["vec_id"].to_numpy(np.int64),
                             "rnk": np.arange(1, len(g) + 1,
                                              dtype=np.int64)})

    out = ds.map_batches(local, batch_format="pandas", batch_size=4096) \
        .groupby("qid").map_groups(cut, batch_format="pandas").to_pandas()
    return out.astype({"qid": "int64", "vec_id": "int64", "rnk": "int64"}) \
        .sort_values(["qid", "rnk"]).reset_index(drop=True)


SQL_CONTRASTIVE_NEGATIVES = """
WITH a AS (
  SELECT vec_id AS qid, label AS alab FROM embeddings WHERE vec_id < 8
),
c AS (
  SELECT a.qid, e.vec_id, (e.vec_id * 48271) % 2147483647 AS rk
  FROM embeddings e JOIN a ON e.label <> a.alab
),
r AS (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY rk, vec_id) AS rnk
  FROM c
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5
"""


def q_price_trend_ols(sf_dir: str):
    """Group-wise least-squares trend (is average order value drifting
    over time per priority class?) from EXACT integer sufficient
    statistics: each batch emits per-group int64 partials (n, Sx, Sy,
    Sxy, Sxx) with x = days since 1995-01-01 and y = price cents, the
    driver folds them with Python big-ints (no float accumulation, no
    ordering sensitivity), and slope/intercept come out as integer
    micro-units via truncating rational division — bit-identical to the
    oracle's HUGEINT arithmetic (DuckDB ``//`` also truncates toward
    zero). ONE streamed scan, zero shuffle, O(groups) driver state: the
    closed-form-OLS shape that replaces a per-group regression fit at
    any corpus size. Per-batch envelope: |x| <= ~2.6k days and y <=
    ~$600k cents keep batch Sxy < 1e16, far inside int64; the unbounded
    folds happen in Python ints so they can never wrap.

    Slope is micro-cents/day, intercept micro-cents (both BIGINT):
    integer outputs sidestep the HUGEINT->DOUBLE cast, which is not
    guaranteed correctly rounded past 2^53 on the SQL side."""
    from fractions import Fraction

    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderdate", "o_totalprice"])
    epoch = pd.Timestamp("1995-01-01")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = (df["o_orderdate"] - epoch).dt.days.to_numpy(np.int64)
        y = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "n": 1, "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
        })
        return g.groupby("o_orderpriority", as_index=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536).to_pandas()
    rows = []
    for grp, sub in parts.groupby("o_orderpriority"):
        n = int(sub["n"].sum())
        sx = sum(int(v) for v in sub["sx"])
        sy = sum(int(v) for v in sub["sy"])
        sxy = sum(int(v) for v in sub["sxy"])
        sxx = sum(int(v) for v in sub["sxx"])
        den = n * sxx - sx * sx
        if den == 0:
            raise AssertionError(
                f"price_trend_ols: degenerate x variance for {grp!r} — "
                "all orders on one day; slope undefined")
        # int(Fraction) truncates toward zero, matching DuckDB's
        # HUGEINT // — floor division would differ on negative slopes
        slope_micro = int(Fraction((n * sxy - sx * sy) * 1_000_000, den))
        intercept_micro = int(Fraction((sy * sxx - sx * sxy) * 1_000_000,
                                       den))
        if max(abs(slope_micro), abs(intercept_micro)) >= 2**63:
            raise AssertionError(
                "price_trend_ols: output exceeds BIGINT — rescale units")
        rows.append((grp, n, slope_micro, intercept_micro))
    out = pd.DataFrame(
        rows, columns=["o_orderpriority", "n", "slope_micro",
                       "intercept_micro"])
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_PRICE_TREND_OLS = """
WITH b AS (
  SELECT o_orderpriority,
         CAST(DATEDIFF('day', TIMESTAMP '1995-01-01',
                       o_orderdate) AS BIGINT) AS x,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
), s AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS HUGEINT)  AS n,
         CAST(SUM(x) AS HUGEINT)    AS sx,
         CAST(SUM(y) AS HUGEINT)    AS sy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx
  FROM b GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n,
       CAST(((n * sxy - sx * sy) * 1000000)
            // (n * sxx - sx * sx) AS BIGINT) AS slope_micro,
       CAST(((sy * sxx - sx * sxy) * 1000000)
            // (n * sxx - sx * sx) AS BIGINT) AS intercept_micro
FROM s ORDER BY o_orderpriority
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "revenue_topk": q_revenue_topk,
    "order_priority_revenue": q_order_priority_revenue,
    "shipping_priority": q_shipping_priority,
    "mktsegment_stats": q_mktsegment_stats,
    "large_part_items": q_large_part_items,
    "distinct_flags": q_distinct_flags,
    "customers_no_orders": q_customers_no_orders,
    "top_orders_per_segment": q_top_orders_per_segment,
    "median_prices": q_median_prices,
    "event_type_stats": q_event_type_stats,
    "value_hour_corr": q_value_hour_corr,
    "price_stddev_by_priority": q_price_stddev_by_priority,
    "price_histogram": q_price_histogram,
    "hourly_user_windows": q_hourly_user_windows,
    "sliding_user_windows": q_sliding_user_windows,
    "session_stats": q_session_stats,
    "customer_highvalue_counts": q_customer_highvalue_counts,
    "dataset_splits": q_dataset_splits,
    "rare_token_postings": q_rare_token_postings,
    "dedup_exact": q_dedup_exact,
    "text_quality": q_text_quality,
    "fingerprints": q_fingerprints,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "knn_bruteforce": q_knn_bruteforce,
    "knn_lsh": q_knn_lsh,
    "embedding_similar_pairs": q_embedding_similar_pairs,
    "top_tokens": q_top_tokens,
    "dedup_keep_best": q_dedup_keep_best,
    "ingest_validation": q_ingest_validation,
    "extraction_span_counts": q_extraction_span_counts,
    "extraction_text_identity": q_extraction_text_identity,
    "extraction_ocr_roundtrip": q_extraction_ocr_roundtrip,
    "extraction_html_strip": q_extraction_html_strip,
    "extraction_pdf_pages": q_extraction_pdf_pages,
    "extraction_confidence": q_extraction_confidence,
    "pdf_metadata": q_pdf_metadata,
    "extraction_synth_corpus": q_extraction_synth_corpus,
    "extraction_checkpointed": q_extraction_checkpointed,
    "asof_last_order": q_asof_last_order,
    "party_nation_counts": q_party_nation_counts,
    "top_orders": q_top_orders,
    "dedup_ngram": q_dedup_ngram,
    "knn_ivf": q_knn_ivf,
    "knn_ivfpq": q_knn_ivfpq,
    "approx_distinct_orderkeys": q_approx_distinct_orderkeys,
    "multimodal_features": q_multimodal_features,
    "range_join_events": q_range_join_events,
    "dedup_clusters": q_dedup_clusters,
    "user_event_gaps": q_user_event_gaps,
    "ranked_orders": q_ranked_orders,
    "cumulative_revenue": q_cumulative_revenue,
    "rollup_revenue": q_rollup_revenue,
    "pivot_priority_by_segment": q_pivot_priority_by_segment,
    "props_field_stats": q_props_field_stats,
    "orders_stratified_sample": q_orders_stratified_sample,
    "tfidf_top_terms": q_tfidf_top_terms,
    "profile_orders": q_profile_orders,
    "event_funnel": q_event_funnel,
    "nation_spend_outliers": q_nation_spend_outliers,
    "lost_customers": q_lost_customers,
    "nation_top_suppliers": q_nation_top_suppliers,
    "group_percentiles": q_group_percentiles,
    "pagerank": q_pagerank,
    "price_quartile_stats": q_price_quartile_stats,
    "monthly_revenue_growth": q_monthly_revenue_growth,
    "local_supplier_revenue": q_local_supplier_revenue,
    "label_centroids": q_label_centroids,
    "corpus_prep": q_corpus_prep,
    "event_minute_gaps": q_event_minute_gaps,
    "segment_revenue_share": q_segment_revenue_share,
    "repetition_filter": q_repetition_filter,
    "decontamination": q_decontamination,
    "shard_packing": q_shard_packing,
    "lang_temperature_sample": q_lang_temperature_sample,
    "corpus_familiarity": q_corpus_familiarity,
    "vocab_growth": q_vocab_growth,
    "ngram_novelty": q_ngram_novelty,
    "snapshot_diff": q_snapshot_diff,
    "retention_cohorts": q_retention_cohorts,
    "conversion_attribution": q_conversion_attribution,
    "source_hash_sample": q_source_hash_sample,
    "chunk_windows": q_chunk_windows,
    "source_token_jaccard": q_source_token_jaccard,
    "token_pmi": q_token_pmi,
    "curriculum_buckets": q_curriculum_buckets,
    "prefix_dups": q_prefix_dups,
    "event_transitions": q_event_transitions,
    "bigram_familiarity": q_bigram_familiarity,
    "segment_dedup": q_segment_dedup,
    "pareto_orders": q_pareto_orders,
    "mad_outliers": q_mad_outliers,
    "event_burst_dedup": q_event_burst_dedup,
    "rfm_segments": q_rfm_segments,
    "event_sequences": q_event_sequences,
    "extraction_html_tables": q_extraction_html_tables,
    "weighted_median": q_weighted_median,
    "extraction_reading_order": q_extraction_reading_order,
    "distribution_drift": q_distribution_drift,
    "basket_pairs": q_basket_pairs,
    "user_mode_event": q_user_mode_event,
    "repeat_customers": q_repeat_customers,
    "price_quantity_hist2d": q_price_quantity_hist2d,
    "fuzzy_name_matches": q_fuzzy_name_matches,
    "user_longest_streak": q_user_longest_streak,
    "cms_token_counts": q_cms_token_counts,
    "order_count_distribution": q_order_count_distribution,
    "price_median_cont": q_price_median_cont,
    "cube_revenue": q_cube_revenue,
    "corr_matrix": q_corr_matrix,
    "benford_digits": q_benford_digits,
    "gini_by_priority": q_gini_by_priority,
    "global_rank": q_global_rank,
    "independence_stats": q_independence_stats,
    "table_checksum": q_table_checksum,
    "trimmed_mean": q_trimmed_mean,
    "doc_keywords": q_doc_keywords,
    "column_entropy": q_column_entropy,
    "price_psi": q_price_psi,
    "pattern_screen": q_pattern_screen,
    "fk_integrity": q_fk_integrity,
    "bm25_search": q_bm25_search,
    "triangle_count": q_triangle_count,
    "zipf_slope": q_zipf_slope,
    "weighted_sample": q_weighted_sample,
    "coverage_selection": q_coverage_selection,
    "kcore": q_kcore,
    "mmr_search": q_mmr_search,
    "hybrid_rrf": q_hybrid_rrf,
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "logreg_train": q_logreg_train,
    "span_redact": q_span_redact,
    "dsir_weights": q_dsir_weights,
    "contrastive_negatives": q_contrastive_negatives,
    "price_trend_ols": q_price_trend_ols,
    "hits_scores": q_hits_scores,
    "markov_stationary": q_markov_stationary,
    "skipgram_counts": q_skipgram_counts,
    "max_concurrency": q_max_concurrency,
    "value_locf": q_value_locf,
    "welch_ttest": q_welch_ttest,
    "char_entropy": q_char_entropy,
    "dup_rate_by_source": q_dup_rate_by_source,
    "mannwhitney_u": q_mannwhitney_u,
    "als_user_factors": q_als_user_factors,
    "ks_test": q_ks_test,
    "wilson_conversion": q_wilson_conversion,
    "user_autocorr": q_user_autocorr,
    "source_lang_tvd": q_source_lang_tvd,
    "wide_orders": q_wide_orders,
    "price_skewness": q_price_skewness,
    "geomean_prices": q_geomean_prices,
    "revenue_changepoint": q_revenue_changepoint,
    "theilsen_trend": q_theilsen_trend,
    "lang_rollup": q_lang_rollup,
    "incremental_agg": q_incremental_agg,
    "shard_rebalance": q_shard_rebalance,
    "zorder_layout": q_zorder_layout,
    "data_contract": q_data_contract,
    "revenue_anomalies": q_revenue_anomalies,
    "knn_int8": q_knn_int8,
    "ooo_inversions": q_ooo_inversions,
    "sorted_neighborhood_pairs": q_sorted_neighborhood_pairs,
    "token_burstiness": q_token_burstiness,
    "basket_triples": q_basket_triples,
    "association_rules": q_association_rules,
    "centroid_split_drift": q_centroid_split_drift,
    "bfs_levels": q_bfs_levels,
    "cheapest_suppliers": q_cheapest_suppliers,
    "hll_overlap": q_hll_overlap,
    "ppr_seed": q_ppr_seed,
    "encoding_audit": q_encoding_audit,
    "key_gaps": q_key_gaps,
    "rle_audit": q_rle_audit,
    "target_encoding": q_target_encoding,
    "logreg_cv": q_logreg_cv,
    "noise_distribution": q_noise_distribution,
    "mixing_schedule": q_mixing_schedule,
    "vocab_coverage": q_vocab_coverage,
    "self_bleu": q_self_bleu,
    "arrival_rates": q_arrival_rates,
    "sign_test": q_sign_test,
    "mcnemar_test": q_mcnemar_test,
    "degree_spend_corr": q_degree_spend_corr,
    "lang_text_stats": q_lang_text_stats,
    "cramers_v": q_cramers_v,
    "markov_backtest": q_markov_backtest,
    "dow_seasonality": q_dow_seasonality,
    "session_entry_exit": q_session_entry_exit,
    "abandonment_rate": q_abandonment_rate,
}

# Python-whitespace RE2 class: the Ray kernels tokenize/normalize with
# str.split() (and Python-re \s), whose set is WIDER than RE2's \s
# ([\t\n\f\r ]): \x0B, \x1C-\x1F, \x85 and the Unicode spaces. SQL
# mirrors of those kernels must split on the SAME set or a document
# containing e.g. a vertical tab or NBSP would false-red the oracle.
# (Equality with str.split() is asserted in tests/test_queries.py.)
_PYWS = (r"[\t\n\x0B\f\r\x1C-\x1F \x85\x{00A0}\x{1680}"
         r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+")
_PYWS_NEG = _PYWS.replace("[", "[^", 1)  # Python \S+ equivalent
for _n in ("SQL_FINGERPRINTS", "SQL_DEDUP_MINHASH", "SQL_DEDUP_SIMHASH",
           "SQL_EXTRACTION_HTML_STRIP", "SQL_REPETITION_FILTER",
           "SQL_DECONTAMINATION", "SQL_SHARD_PACKING",
           "SQL_CORPUS_FAMILIARITY", "SQL_VOCAB_GROWTH",
           "SQL_NGRAM_NOVELTY", "SQL_BIGRAM_FAMILIARITY",
           "SQL_SEGMENT_DEDUP", "SQL_DISTRIBUTION_DRIFT",
           "SQL_CMS_TOKEN_COUNTS", "SQL_SKIPGRAM_COUNTS",
           "SQL_SELF_BLEU"):
    # import-time assert: a reformatted literal would make the replace
    # a silent no-op and revert that oracle to RE2's narrower \s
    assert r"'\s+'" in globals()[_n], f"{_n} lost its '\\s+' anchor"
    globals()[_n] = globals()[_n].replace(r"'\s+'", f"'{_PYWS}'")
assert r"'\S+'" in SQL_TEXT_QUALITY, "SQL_TEXT_QUALITY lost its '\\S+' anchor"
SQL_TEXT_QUALITY = SQL_TEXT_QUALITY.replace(r"'\S+'", f"'{_PYWS_NEG}'")
del _n

ORACLE_SQL = {
    "pricing_summary": SQL_PRICING,
    "revenue_topk": SQL_REVENUE_TOPK,
    "order_priority_revenue": SQL_ORDER_PRIORITY_REVENUE,
    "shipping_priority": SQL_SHIPPING_PRIORITY,
    "mktsegment_stats": SQL_MKTSEGMENT_STATS,
    "large_part_items": SQL_LARGE_PART_ITEMS,
    "distinct_flags": SQL_DISTINCT_FLAGS,
    "customers_no_orders": SQL_CUSTOMERS_NO_ORDERS,
    "top_orders_per_segment": SQL_TOP_ORDERS_PER_SEGMENT,
    "median_prices": SQL_MEDIAN_PRICES,
    "event_type_stats": SQL_EVENT_TYPE_STATS,
    "value_hour_corr": SQL_VALUE_HOUR_CORR,
    "price_stddev_by_priority": SQL_PRICE_STDDEV_BY_PRIORITY,
    "price_histogram": SQL_PRICE_HISTOGRAM,
    "hourly_user_windows": SQL_HOURLY_USER_WINDOWS,
    "sliding_user_windows": SQL_SLIDING_USER_WINDOWS,
    "session_stats": SQL_SESSION_STATS,
    "customer_highvalue_counts": SQL_CUSTOMER_HIGHVALUE_COUNTS,
    "dataset_splits": SQL_DATASET_SPLITS,
    "rare_token_postings": SQL_RARE_TOKEN_POSTINGS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "fingerprints": SQL_FINGERPRINTS,
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "text_quality": SQL_TEXT_QUALITY,
    "knn_bruteforce": SQL_KNN_BRUTEFORCE,
    "knn_lsh": SQL_KNN_LSH,
    "knn_ivf": SQL_KNN_IVF,
    "knn_ivfpq": SQL_KNN_IVFPQ,
    "embedding_similar_pairs": SQL_EMBEDDING_SIMILAR_PAIRS,
    "top_tokens": SQL_TOP_TOKENS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "ingest_validation": SQL_INGEST_VALIDATION,
    "extraction_span_counts": SQL_EXTRACTION_SPAN_COUNTS,
    "extraction_text_identity": SQL_EXTRACTION_TEXT_IDENTITY,
    "extraction_ocr_roundtrip": SQL_EXTRACTION_OCR_ROUNDTRIP,
    "extraction_html_strip": SQL_EXTRACTION_HTML_STRIP,
    "extraction_pdf_pages": SQL_EXTRACTION_PDF_PAGES,
    "extraction_confidence": SQL_EXTRACTION_CONFIDENCE,
    "pdf_metadata": SQL_PDF_METADATA,
    "extraction_synth_corpus": SQL_EXTRACTION_SYNTH_CORPUS,
    "asof_last_order": SQL_ASOF_LAST_ORDER,
    "range_join_events": SQL_RANGE_JOIN_EVENTS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "party_nation_counts": SQL_PARTY_NATION_COUNTS,
    "top_orders": SQL_TOP_ORDERS,
    "dedup_ngram": SQL_DEDUP_NGRAM,
    "approx_distinct_orderkeys": SQL_APPROX_DISTINCT_ORDERKEYS,
    "extraction_checkpointed": SQL_EXTRACTION_CHECKPOINTED,
    "user_event_gaps": SQL_USER_EVENT_GAPS,
    "ranked_orders": SQL_RANKED_ORDERS,
    "cumulative_revenue": SQL_CUMULATIVE_REVENUE,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "pivot_priority_by_segment": SQL_PIVOT_PRIORITY_BY_SEGMENT,
    "props_field_stats": SQL_PROPS_FIELD_STATS,
    "orders_stratified_sample": SQL_ORDERS_STRATIFIED_SAMPLE,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "profile_orders": SQL_PROFILE_ORDERS,
    "event_funnel": SQL_EVENT_FUNNEL,
    "nation_spend_outliers": SQL_NATION_SPEND_OUTLIERS,
    "lost_customers": SQL_LOST_CUSTOMERS,
    "nation_top_suppliers": SQL_NATION_TOP_SUPPLIERS,
    "group_percentiles": SQL_GROUP_PERCENTILES,
    "pagerank": SQL_PAGERANK,
    "price_quartile_stats": SQL_PRICE_QUARTILE_STATS,
    "monthly_revenue_growth": SQL_MONTHLY_REVENUE_GROWTH,
    "local_supplier_revenue": SQL_LOCAL_SUPPLIER_REVENUE,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "corpus_prep": SQL_CORPUS_PREP,
    "event_minute_gaps": SQL_EVENT_MINUTE_GAPS,
    "segment_revenue_share": SQL_SEGMENT_REVENUE_SHARE,
    "repetition_filter": SQL_REPETITION_FILTER,
    "decontamination": SQL_DECONTAMINATION,
    "shard_packing": SQL_SHARD_PACKING,
    "lang_temperature_sample": SQL_LANG_TEMPERATURE_SAMPLE,
    "corpus_familiarity": SQL_CORPUS_FAMILIARITY,
    "vocab_growth": SQL_VOCAB_GROWTH,
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "conversion_attribution": SQL_CONVERSION_ATTRIBUTION,
    "source_hash_sample": SQL_SOURCE_HASH_SAMPLE,
    "chunk_windows": SQL_CHUNK_WINDOWS,
    "source_token_jaccard": SQL_SOURCE_TOKEN_JACCARD,
    "token_pmi": SQL_TOKEN_PMI,
    "curriculum_buckets": SQL_CURRICULUM_BUCKETS,
    "prefix_dups": SQL_PREFIX_DUPS,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "bigram_familiarity": SQL_BIGRAM_FAMILIARITY,
    "segment_dedup": SQL_SEGMENT_DEDUP,
    "pareto_orders": SQL_PARETO_ORDERS,
    "mad_outliers": SQL_MAD_OUTLIERS,
    "event_burst_dedup": SQL_EVENT_BURST_DEDUP,
    "rfm_segments": SQL_RFM_SEGMENTS,
    "event_sequences": SQL_EVENT_SEQUENCES,
    "extraction_html_tables": SQL_EXTRACTION_HTML_TABLES,
    "weighted_median": SQL_WEIGHTED_MEDIAN,
    "extraction_reading_order": SQL_EXTRACTION_READING_ORDER,
    "distribution_drift": SQL_DISTRIBUTION_DRIFT,
    "basket_pairs": SQL_BASKET_PAIRS,
    "user_mode_event": SQL_USER_MODE_EVENT,
    "repeat_customers": SQL_REPEAT_CUSTOMERS,
    "price_quantity_hist2d": SQL_PRICE_QUANTITY_HIST2D,
    "fuzzy_name_matches": SQL_FUZZY_NAME_MATCHES,
    "user_longest_streak": SQL_USER_LONGEST_STREAK,
    "cms_token_counts": SQL_CMS_TOKEN_COUNTS,
    "order_count_distribution": SQL_ORDER_COUNT_DISTRIBUTION,
    "price_median_cont": SQL_PRICE_MEDIAN_CONT,
    "cube_revenue": SQL_CUBE_REVENUE,
    "corr_matrix": SQL_CORR_MATRIX,
    "benford_digits": SQL_BENFORD_DIGITS,
    "gini_by_priority": SQL_GINI_BY_PRIORITY,
    "global_rank": SQL_GLOBAL_RANK,
    "independence_stats": SQL_INDEPENDENCE_STATS,
    "table_checksum": SQL_TABLE_CHECKSUM,
    "trimmed_mean": SQL_TRIMMED_MEAN,
    "doc_keywords": SQL_DOC_KEYWORDS,
    "column_entropy": SQL_COLUMN_ENTROPY,
    "price_psi": SQL_PRICE_PSI,
    "pattern_screen": SQL_PATTERN_SCREEN,
    "fk_integrity": SQL_FK_INTEGRITY,
    "bm25_search": SQL_BM25_SEARCH,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "zipf_slope": SQL_ZIPF_SLOPE,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "coverage_selection": SQL_COVERAGE_SELECTION,
    "kcore": SQL_KCORE,
    "mmr_search": SQL_MMR_SEARCH,
    "hybrid_rrf": SQL_HYBRID_RRF,
    "bpe_merge_pairs": SQL_BPE_MERGE_PAIRS,
    "logreg_train": SQL_LOGREG_TRAIN,
    "span_redact": SQL_SPAN_REDACT,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "contrastive_negatives": SQL_CONTRASTIVE_NEGATIVES,
    "price_trend_ols": SQL_PRICE_TREND_OLS,
    "hits_scores": SQL_HITS_SCORES,
    "markov_stationary": SQL_MARKOV_STATIONARY,
    "skipgram_counts": SQL_SKIPGRAM_COUNTS,
    "max_concurrency": SQL_MAX_CONCURRENCY,
    "value_locf": SQL_VALUE_LOCF,
    "welch_ttest": SQL_WELCH_TTEST,
    "char_entropy": SQL_CHAR_ENTROPY,
    "dup_rate_by_source": SQL_DUP_RATE_BY_SOURCE,
    "mannwhitney_u": SQL_MANNWHITNEY_U,
    "als_user_factors": SQL_ALS_USER_FACTORS,
    "ks_test": SQL_KS_TEST,
    "wilson_conversion": SQL_WILSON_CONVERSION,
    "user_autocorr": SQL_USER_AUTOCORR,
    "source_lang_tvd": SQL_SOURCE_LANG_TVD,
    "wide_orders": SQL_WIDE_ORDERS,
    "price_skewness": SQL_PRICE_SKEWNESS,
    "geomean_prices": SQL_GEOMEAN_PRICES,
    "revenue_changepoint": SQL_REVENUE_CHANGEPOINT,
    "theilsen_trend": SQL_THEILSEN_TREND,
    "lang_rollup": SQL_LANG_ROLLUP,
    "incremental_agg": SQL_INCREMENTAL_AGG,
    "shard_rebalance": SQL_SHARD_REBALANCE,
    "zorder_layout": SQL_ZORDER_LAYOUT,
    "data_contract": SQL_DATA_CONTRACT,
    "revenue_anomalies": SQL_REVENUE_ANOMALIES,
    "knn_int8": SQL_KNN_INT8,
    "ooo_inversions": SQL_OOO_INVERSIONS,
    "sorted_neighborhood_pairs": SQL_SORTED_NEIGHBORHOOD_PAIRS,
    "token_burstiness": SQL_TOKEN_BURSTINESS,
    "basket_triples": SQL_BASKET_TRIPLES,
    "association_rules": SQL_ASSOCIATION_RULES,
    "centroid_split_drift": SQL_CENTROID_SPLIT_DRIFT,
    "bfs_levels": SQL_BFS_LEVELS,
    "cheapest_suppliers": SQL_CHEAPEST_SUPPLIERS,
    "hll_overlap": SQL_HLL_OVERLAP,
    "ppr_seed": SQL_PPR_SEED,
    "encoding_audit": SQL_ENCODING_AUDIT,
    "key_gaps": SQL_KEY_GAPS,
    "rle_audit": SQL_RLE_AUDIT,
    "target_encoding": SQL_TARGET_ENCODING,
    "logreg_cv": SQL_LOGREG_CV,
    "noise_distribution": SQL_NOISE_DISTRIBUTION,
    "mixing_schedule": SQL_MIXING_SCHEDULE,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "self_bleu": SQL_SELF_BLEU,
    "arrival_rates": SQL_ARRIVAL_RATES,
    "sign_test": SQL_SIGN_TEST,
    "mcnemar_test": SQL_MCNEMAR_TEST,
    "degree_spend_corr": SQL_DEGREE_SPEND_CORR,
    "lang_text_stats": SQL_LANG_TEXT_STATS,
    "cramers_v": SQL_CRAMERS_V,
    "markov_backtest": SQL_MARKOV_BACKTEST,
    "dow_seasonality": SQL_DOW_SEASONALITY,
    "session_entry_exit": SQL_SESSION_ENTRY_EXIT,
    "abandonment_rate": SQL_ABANDONMENT_RATE,
}
