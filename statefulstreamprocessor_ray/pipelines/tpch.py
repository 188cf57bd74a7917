"""Relational star-schema pipelines over the TPC-H-ish tables.

Three classic decision-support shapes re-expressed Ray-Data-first, each a
composition of the engine's existing primitives (pruned reads, map-side
combiners, ``sharded_group_sum``, broadcast + partitioned joins, partial
top-k). They exist to prove the relational layer composes into multi-table
pipelines — the same operators a curation job uses to join document facts
to metadata dimensions at 100 TB.

Scale shapes
------------
- ``pricing_summary`` (Q1): predicate + column pruning at the READ
  (row-group skip via a pyarrow filter), per-batch integer micro-unit
  partials, ONE tiny group-keyed exchange (6 groups). The exchange carries
  |groups-in-batch| fixed-width rows per batch, never lineitem.
- ``shipping_priority`` (Q3): revenue pre-aggregated per orderkey BEFORE
  the fact-fact join (the combine-before-shuffle rule), orders semi-joined
  against the filtered customer keys through the linear hash join, global
  top-10 via associative per-batch partial top-k.
- ``local_supplier_volume`` (Q5): tiny dims (region→nation) broadcast;
  the two fact joins (orders⋈customer-selection, lineitem⋈that) ride the
  partitioned hash join; supplier is broadcast (TPC-H sizes it at 1% of
  orders — switch to partitioned_join if the dimension outgrows a node).

Micro-unit discipline: every money expression quantizes to
``round(expr * 1e6)`` int64 AFTER the per-row double arithmetic — the
per-row expression is the identical IEEE chain on both engine and oracle,
and the sums are associative integer arithmetic (the group_centroids
precedent). int64 bounds: sum(price_micro) overflows past ~9.2e18, i.e.
~10^8 rows per group at TPC-H price magnitudes — the same documented bound
as group_moments.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from statefulstreamprocessor_ray.functions.ops import shard_map, sharded_group_sum
from statefulstreamprocessor_ray.stages.relational import (
    broadcast_join,
    ensure_schema,
    partitioned_join,
)

MICRO = 1_000_000.0


def _ts(s: str):
    return pa.scalar(datetime.datetime.fromisoformat(s), pa.timestamp("us"))


def global_topk(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    k: int,
) -> ray.data.Dataset:
    """Global top-k rows by ``(value DESC, id ASC)``: associative per-batch
    partial top-k (each batch forwards at most k rows), then one single-task
    final selection — the driver never sees more than the k result rows and
    the exchange carries k rows per batch, independent of input size."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if value_col not in df.columns:  # zero-row schema-less block
            return df
        return df.sort_values(
            [value_col, id_col], ascending=[False, True]
        ).head(k)

    final = partial

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def read_lineitem_pruned(
    sf_dir: str,
    columns: list[str],
    filter_expr=None,
) -> ray.data.Dataset:
    """Column- and predicate-pruned lineitem read: only the named columns
    and the row groups whose statistics can match leave storage."""
    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=columns, filter=filter_expr
    )


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> ray.data.Dataset:
    """TPC-H Q1 shape: per (returnflag, linestatus) — qty / base-price /
    discounted-price / charge micro-unit sums, order count, and the three
    averages (each the one shared ``s/n/1e6`` division)."""
    li = read_lineitem_pruned(
        sf_dir,
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
        filter_expr=(pc.field("l_shipdate") <= _ts(cutoff)),
    )
    keys = ["l_returnflag", "l_linestatus"]

    def partial(t: pa.Table) -> pa.Table:
        # the read filter prunes row groups; re-apply exactly for rows inside
        # surviving groups
        t = t.filter(pc.less_equal(t["l_shipdate"], _ts(cutoff)))
        qty = pc.cast(t["l_quantity"], pa.float64()).to_numpy(zero_copy_only=False)
        ep = pc.cast(t["l_extendedprice"], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        disc = pc.cast(t["l_discount"], pa.float64()).to_numpy(zero_copy_only=False)
        tax = pc.cast(t["l_tax"], pa.float64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                keys[0]: t[keys[0]].to_pandas(),
                keys[1]: t[keys[1]].to_pandas(),
                "sq": np.round(qty * MICRO).astype(np.int64),
                "sb": np.round(ep * MICRO).astype(np.int64),
                "sd": np.round(ep * (1 - disc) * MICRO).astype(np.int64),
                "sc": np.round(ep * (1 - disc) * (1 + tax) * MICRO).astype(np.int64),
                "sdv": np.round(disc * MICRO).astype(np.int64),
            }
        )
        out = df.groupby(keys, sort=False).agg(
            sq=("sq", "sum"),
            sb=("sb", "sum"),
            sd=("sd", "sum"),
            sc=("sc", "sum"),
            sdv=("sdv", "sum"),
            n=("sq", "size"),
        )
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    sums = sharded_group_sum(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=keys,
        sums={
            "sq": "sum_qty_micro",
            "sb": "sum_base_micro",
            "sd": "sum_disc_micro",
            "sc": "sum_charge_micro",
            "sdv": "sdv",
            "n": "count_order",
        },
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["count_order"].to_numpy(np.int64)
        df = df.copy()
        df["avg_qty"] = df["sum_qty_micro"].to_numpy(np.float64) / n / MICRO
        df["avg_price"] = df["sum_base_micro"].to_numpy(np.float64) / n / MICRO
        df["avg_disc"] = df["sdv"].to_numpy(np.float64) / n / MICRO
        return df.drop(columns=["sdv"])

    return sums.map_batches(finish, batch_format="pandas")


def shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    date: str = "1998-03-15",
    k: int = 10,
) -> ray.data.Dataset:
    """TPC-H Q3 shape: top-k undelivered orders by revenue for one market
    segment. Revenue is combined per orderkey BEFORE any join; orders are
    semi-joined against the segment's customer keys through the linear hash
    join; the top-k is an associative partial reduction."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=(pc.field("c_mktsegment") == segment),
    ).select_columns(["c_custkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=(pc.field("o_orderdate") < _ts(date)),
    )
    cust = ensure_schema(cust, pa.schema([("c_custkey", pa.int64())]))
    # one-shuffle-at-a-time: two native hash joins in ONE execution DAG
    # deadlock on small clusters (both aggregator-actor fleets demand CPUs
    # simultaneously) — the barrier runs the semi join to completion before
    # the revenue join's fleet spins up (the repo-wide exchange rule,
    # stages/exchange.py)
    orders = ensure_schema(
        partitioned_join(
            orders, cust, left_on="o_custkey", right_on="c_custkey", how="semi"
        )
        .select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])
        .materialize(),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    li = read_lineitem_pruned(
        sf_dir,
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter_expr=(pc.field("l_shipdate") > _ts(date)),
    )

    def rev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], _ts(date)))
        ep = pc.cast(t["l_extendedprice"], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        disc = pc.cast(t["l_discount"], pa.float64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "rev": np.round(ep * (1 - disc) * MICRO).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("l_orderkey", sort=False, as_index=False)["rev"].sum(),
            preserve_index=False,
        )

    rev = ensure_schema(
        sharded_group_sum(
            li.map_batches(
                rev_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            keys=["l_orderkey"],
            sums={"rev": "revenue_micro"},
        ),
        pa.schema([("l_orderkey", pa.int64()), ("revenue_micro", pa.int64())]),
    )
    joined = partitioned_join(
        rev, orders, left_on="l_orderkey", right_on="o_orderkey", how="inner"
    ).select_columns(
        ["l_orderkey", "revenue_micro", "o_orderdate", "o_orderpriority"]
    )
    return global_topk(joined, "revenue_micro", "l_orderkey", k)


def local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> ray.data.Dataset:
    """TPC-H Q5 shape: revenue per nation where the customer AND the
    supplier sit in that nation inside one region. region→nation dims and
    supplier (1% of orders in TPC-H) broadcast; the orders⋈customer and
    lineitem⋈orders fact joins are partitioned hash joins; the final
    group-sum is one tiny keyed exchange."""
    region_keys = (
        ray.data.read_parquet(f"{sf_dir}/region.parquet")
        .to_pandas()
        .query("r_name == @region")["r_regionkey"]
        .to_numpy()
    )
    nation = (
        ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    )
    nation_in_region = nation[nation["n_regionkey"].isin(region_keys)][
        ["n_nationkey", "n_name"]
    ]

    cust = ensure_schema(
        broadcast_join(
            ray.data.read_parquet(
                f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
            ),
            nation_in_region,
            left_on="c_nationkey",
            right_on="n_nationkey",
            how="inner",
        ).select_columns(["c_custkey", "c_nationkey", "n_name"]),
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_nationkey", pa.int32()),
                ("n_name", pa.string()),
            ]
        ),
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= _ts(date_lo))
            & (pc.field("o_orderdate") < _ts(date_hi))
        ),
    )

    def date_gate(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["o_orderdate"], _ts(date_lo)),
            pc.less(t["o_orderdate"], _ts(date_hi)),
        )
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders = ensure_schema(
        orders.map_batches(date_gate, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    )
    # one-shuffle-at-a-time barrier between the two fact joins (see
    # shipping_priority): run orders⋈customer to completion before the
    # lineitem join's aggregator fleet spins up
    ord_cust = ensure_schema(
        partitioned_join(
            orders, cust, left_on="o_custkey", right_on="c_custkey", how="inner"
        )
        .select_columns(["o_orderkey", "c_nationkey", "n_name"])
        .materialize(),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("c_nationkey", pa.int32()),
                ("n_name", pa.string()),
            ]
        ),
    )

    li = read_lineitem_pruned(
        sf_dir, ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )

    def li_rev(t: pa.Table) -> pa.Table:
        ep = pc.cast(t["l_extendedprice"], pa.float64()).to_numpy(
            zero_copy_only=False
        )
        disc = pc.cast(t["l_discount"], pa.float64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev": pa.array(
                    np.round(ep * (1 - disc) * MICRO).astype(np.int64), pa.int64()
                ),
            }
        )

    li = li.map_batches(li_rev, batch_format="pyarrow", zero_copy_batch=True)
    li_ord = partitioned_join(
        li, ord_cust, left_on="l_orderkey", right_on="o_orderkey", how="inner"
    )

    supplier = (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        )
    )
    li_supp = broadcast_join(
        li_ord, supplier, left_on="l_suppkey", right_on="s_suppkey", how="inner"
    )

    def local_only(df: pd.DataFrame) -> pd.DataFrame:
        if "s_nationkey" not in df.columns:  # zero-row schema-less block
            return pd.DataFrame(
                {
                    "n_name": pd.Series([], dtype="object"),
                    "rev": pd.Series([], dtype="int64"),
                }
            )
        df = df[df["s_nationkey"] == df["c_nationkey"]]
        return df[["n_name", "rev"]]

    gated = li_supp.map_batches(local_only, batch_format="pandas")
    return sharded_group_sum(gated, keys=["n_name"], sums={"rev": "revenue_micro"})
