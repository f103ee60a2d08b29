"""Classic warehouse analytics over the TPC-H-shaped tables — the
general-query surface of the engine (scan-filter-aggregate and a
big×big equi-join), INTEGER-EXACT throughout.

Money stays in int64 cents (half-away-from-zero ×100, DuckDB
``round()``'s rule) and rates in int64 percent points, so revenue math
is products and sums of int64s — hash-identical to the SQL oracle with
zero float accumulation-order hazards; the only doubles are final
single divisions for averages.

Shapes:
- :func:`pricing_summary` (Q1-style): the combiner pattern — per-batch
  pandas partials over the tiny (returnflag, linestatus) key space, one
  vocabulary-sized groupby-sum, divisions at the end. One scan, one
  bounded shuffle.
- :func:`top_orders_by_revenue` (Q3-style): a big×big join done as ONE
  orderkey-hash exchange over the union of both filtered projections —
  all rows of a key land in one partition, so the semi-join and the
  per-order revenue sum complete locally; only the order-cardinality
  aggregate is sorted for the top-k. Content columns are pruned at the
  parquet read on both tables.

Reference analog: none (quichash is a hashing tool); graft-mandated
general data-processing surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _cents(col, scale: float = 100.0):
    return pc.cast(
        pc.round(
            pc.multiply(col, pa.scalar(scale)),
            round_mode="half_towards_infinity",
        ),
        pa.int64(),
    )


def pricing_summary(lineitem: Dataset, cutoff: str = "2000-01-01") -> Dataset:
    """Q1-style pricing summary per (returnflag, linestatus) for rows
    shipped on/before ``cutoff``: integer sums of qty (units), base
    price (cents), discounted price (cent·pct) and charge
    (cent·pct·pct), plus count and three single-division averages."""
    cut = pd.Timestamp(cutoff).to_datetime64()

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.less_equal(b["l_shipdate"], pa.scalar(cut))
        t = b.filter(pc.fill_null(keep, False))
        empty = pa.table(
            {
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty": pa.array([], pa.int64()),
                "sum_base": pa.array([], pa.int64()),
                "sum_disc": pa.array([], pa.int64()),
                "sum_charge": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        qty = np.asarray(pc.cast(t["l_quantity"], pa.int64()))
        price_c = np.asarray(_cents(t["l_extendedprice"]))
        disc_h = np.asarray(_cents(t["l_discount"]))  # percent points
        tax_h = np.asarray(_cents(t["l_tax"]))
        disc_price = price_c * (100 - disc_h)
        charge = disc_price * (100 + tax_h)
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "l_linestatus": t["l_linestatus"].to_pandas(),
                "q": qty,
                "b": price_c,
                "d": disc_price,
                "c": charge,
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("q", "sum"),
            sum_base=("b", "sum"),
            sum_disc=("d", "sum"),
            sum_charge=("c", "sum"),
            cnt=("q", "size"),
        ).reset_index()
        return pa.Table.from_pandas(
            g.astype(
                {
                    "sum_qty": "int64",
                    "sum_base": "int64",
                    "sum_disc": "int64",
                    "sum_charge": "int64",
                    "cnt": "int64",
                }
            ),
            preserve_index=False,
        )

    agg = (
        lineitem.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(["sum_qty", "sum_base", "sum_disc", "sum_charge", "cnt"])
    )

    def finish(b: pa.Table) -> pa.Table:
        cols = [
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base",
            "sum_disc", "sum_charge", "cnt", "avg_qty", "avg_price",
        ]
        if b.num_rows == 0 or "sum(cnt)" not in b.column_names:
            return pa.table(
                {
                    c: pa.array(
                        [],
                        pa.string() if c.startswith("l_") else (
                            pa.float64() if c.startswith("avg") else pa.int64()
                        ),
                    )
                    for c in cols
                }
            )
        cnt = pc.cast(b["sum(cnt)"], pa.int64())
        sq = pc.cast(b["sum(sum_qty)"], pa.int64())
        sb = pc.cast(b["sum(sum_base)"], pa.int64())
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": sq,
                "sum_base": sb,
                "sum_disc": pc.cast(b["sum(sum_disc)"], pa.int64()),
                "sum_charge": pc.cast(b["sum(sum_charge)"], pa.int64()),
                "cnt": cnt,
                "avg_qty": pc.divide(
                    pc.cast(sq, pa.float64()), pc.cast(cnt, pa.float64())
                ),
                "avg_price": pc.divide(
                    pc.cast(sb, pa.float64()), pc.cast(cnt, pa.float64())
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def top_orders_by_revenue(
    orders: Dataset,
    lineitem: Dataset,
    cutoff: str = "1998-01-01",
    k: int = 10,
    num_parts: int | None = None,
) -> Dataset:
    """Q3-style: revenue = Σ price·(100−disc) per order, for orders
    placed BEFORE ``cutoff`` with items shipped ON/AFTER it; top ``k``
    by (revenue DESC, orderkey ASC). One orderkey-hash exchange over
    the union of both filtered projections — the join and the per-order
    sum complete inside each partition."""
    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts

    cut = pd.Timestamp(cutoff).to_datetime64()
    if num_parts is None:
        num_parts = dataset_num_parts(
            lineitem, bytes_per_row=24, target_bytes=32 << 20
        )

    def o_side(b: pa.Table) -> pa.Table:
        keep = pc.less(b["o_orderdate"], pa.scalar(cut))
        t = b.filter(pc.fill_null(keep, False))
        key = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "rev": pa.nulls(t.num_rows, pa.int64()),  # marker: order row
                "part": pa.array(
                    np.asarray(key) % num_parts, pa.int64()
                ),
            }
        )

    def l_side(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b["l_shipdate"], pa.scalar(cut))
        t = b.filter(pc.fill_null(keep, False))
        key = pc.cast(t["l_orderkey"], pa.int64())
        price_c = np.asarray(_cents(t["l_extendedprice"]))
        disc_h = np.asarray(_cents(t["l_discount"]))
        return pa.table(
            {
                "key": key,
                "rev": pa.array(price_c * (100 - disc_h), pa.int64()),
                "part": pa.array(
                    np.asarray(key) % num_parts, pa.int64()
                ),
            }
        )

    tagged = orders.map_batches(
        o_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        lineitem.map_batches(
            l_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )

    def join_sum(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], pa.int64()),
                "revenue": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        df = g.to_pandas()
        is_order = df["rev"].isna()
        okeys = set(df.loc[is_order, "key"])
        li = df[~is_order & df["key"].isin(okeys)]
        if len(li) == 0:
            return empty
        out = (
            li.groupby("key", sort=False)["rev"].sum().reset_index()
        )
        return pa.table(
            {
                "o_orderkey": pa.array(out["key"].to_numpy(), pa.int64()),
                "revenue": pa.array(
                    out["rev"].to_numpy().astype("int64")
                ),
            }
        )

    per_order = hash_exchange(tagged, "part", join_sum, num_parts)
    return per_order.sort(
        ["revenue", "o_orderkey"], descending=[True, False]
    ).limit(k)


def revenue_by_nation(
    orders: Dataset,
    lineitem: Dataset,
    customer: Dataset,
    nation: Dataset,
    year: int = 1997,
    num_parts: int | None = None,
) -> Dataset:
    """Q5-style multi-way join: lineitem ⨝ orders ⨝ customer ⨝ nation,
    revenue per nation for orders placed in ``year``. Join tiering by
    table size: the big×big lineitem⨝orders leg is one orderkey-hash
    exchange (custkey rides back out with the local revenue partials);
    customer attaches through the broadcast↔co-partitioned lookup; the
    nation dimension (25 rows) is a driver dict in the task closure.
    → (n_name, revenue, n_items)."""
    import pandas as pd

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.lookup import attach_lookup
    from quichash_ray.stages.partitioning import dataset_num_parts

    lo = pd.Timestamp(f"{year}-01-01").to_datetime64()
    hi = pd.Timestamp(f"{year + 1}-01-01").to_datetime64()
    if num_parts is None:
        num_parts = dataset_num_parts(
            lineitem, bytes_per_row=24, target_bytes=32 << 20
        )

    def o_side(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
            pc.less(b["o_orderdate"], pa.scalar(hi)),
        )
        t = b.filter(pc.fill_null(keep, False))
        key = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "custkey": pc.cast(t["o_custkey"], pa.int64()),
                "rev": pa.nulls(t.num_rows, pa.int64()),
                "part": pa.array(np.asarray(key) % num_parts, pa.int64()),
            }
        )

    def l_side(b: pa.Table) -> pa.Table:
        key = pc.cast(b["l_orderkey"], pa.int64())
        price_c = np.asarray(_cents(b["l_extendedprice"]))
        disc_h = np.asarray(_cents(b["l_discount"]))
        return pa.table(
            {
                "key": key,
                "custkey": pa.nulls(b.num_rows, pa.int64()),
                "rev": pa.array(price_c * (100 - disc_h), pa.int64()),
                "part": pa.array(np.asarray(key) % num_parts, pa.int64()),
            }
        )

    tagged = orders.map_batches(
        o_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        lineitem.map_batches(
            l_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )

    def join_to_cust(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "custkey": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        df = g.to_pandas()
        is_order = df["rev"].isna()
        omap = df.loc[is_order, ["key", "custkey"]]
        li = df[~is_order].merge(
            omap, on="key", suffixes=("", "_o")
        )
        if len(li) == 0:
            return empty
        out = (
            li.groupby("custkey_o", sort=False)
            .agg(rev=("rev", "sum"), n_items=("rev", "size"))
            .reset_index()
            .rename(columns={"custkey_o": "custkey"})
        )
        return pa.Table.from_pandas(
            out.astype("int64"), preserve_index=False
        )

    per_cust = hash_exchange(tagged, "part", join_to_cust, num_parts)
    with_nat = attach_lookup(
        per_cust,
        customer,
        key_col="custkey",
        value_col="c_nationkey",
        out_col="nationkey",
        key_col_in_mapping="c_custkey",
    )
    # nation is a 25-row dimension — driver dict by contract
    nmap = {
        int(r["n_nationkey"]): r["n_name"] for r in nation.take_all()
    }

    def name_it(b: pa.Table) -> pa.Table:
        import pandas as pd

        if b.num_rows == 0:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "rev": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        names = pd.Series(np.asarray(b["nationkey"])).map(nmap)
        return pa.table(
            {
                "n_name": pa.array(names.to_numpy(), pa.string()),
                "rev": pc.cast(b["rev"], pa.int64()),
                "n_items": pc.cast(b["n_items"], pa.int64()),
            }
        )

    agg = (
        with_nat.map_batches(
            name_it, batch_format="pyarrow", batch_size=None
        )
        .groupby("n_name")
        .sum(["rev", "n_items"])
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(rev)" not in b.column_names:
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "revenue": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "n_name": b["n_name"],
                "revenue": pc.cast(b["sum(rev)"], pa.int64()),
                "n_items": pc.cast(b["sum(n_items)"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def late_orders_by_priority(
    orders: Dataset,
    lineitem: Dataset,
    late_days: int = 90,
    num_parts: int | None = None,
) -> Dataset:
    """Q4-style EXISTS semi-join aggregate: count orders per priority
    having AT LEAST ONE line item shipped more than ``late_days`` after
    the order date. The existence test needs o_orderdate next to each
    l_shipdate, so both sides ride one orderkey-hash exchange; each
    partition resolves EXISTS locally and emits per-priority partial
    counts (priority-cardinality-sized), finished by a tiny groupby.
    → (o_orderpriority, n_late_orders)."""
    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts

    if num_parts is None:
        num_parts = dataset_num_parts(
            lineitem, bytes_per_row=24, target_bytes=32 << 20
        )
    late_us = np.int64(late_days) * 86_400_000_000

    def o_side(b: pa.Table) -> pa.Table:
        key = pc.cast(b["o_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "prio": b["o_orderpriority"],
                "ts": pc.cast(b["o_orderdate"], pa.timestamp("us")),
                "is_order": pa.array(
                    np.ones(b.num_rows, dtype=bool)
                ),
                "part": pa.array(np.asarray(key) % num_parts, pa.int64()),
            }
        )

    def l_side(b: pa.Table) -> pa.Table:
        key = pc.cast(b["l_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "prio": pa.nulls(b.num_rows, pa.string()),
                "ts": pc.cast(b["l_shipdate"], pa.timestamp("us")),
                "is_order": pa.array(
                    np.zeros(b.num_rows, dtype=bool)
                ),
                "part": pa.array(np.asarray(key) % num_parts, pa.int64()),
            }
        )

    tagged = orders.map_batches(
        o_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        lineitem.map_batches(
            l_side, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )

    def exists_agg(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderpriority": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        df = g.to_pandas()
        df["ts_us"] = df["ts"].astype("int64")
        od = df[df["is_order"]]
        li = df[~df["is_order"]][["key", "ts_us"]].rename(
            columns={"ts_us": "ship_us"}
        )
        if len(od) == 0 or len(li) == 0:
            return empty
        j = li.merge(od[["key", "ts_us"]], on="key")
        late_keys = set(
            j.loc[j["ship_us"] - j["ts_us"] > late_us, "key"]
        )
        hit = od[od["key"].isin(late_keys)]
        if len(hit) == 0:
            return empty
        out = hit.groupby("prio", sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    out["prio"].to_numpy(), pa.string()
                ),
                "n": pa.array(out["n"].to_numpy().astype("int64")),
            }
        )

    agg = hash_exchange(tagged, "part", exists_agg, num_parts).groupby(
        "o_orderpriority"
    ).sum("n")

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(n)" not in b.column_names:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "n_late_orders": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_late_orders": pc.cast(b["sum(n)"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def promo_revenue_share(
    lineitem: Dataset,
    part: Dataset,
    year: int = 1997,
) -> Dataset:
    """Q14-style promo-revenue share for items shipped in ``year``:
    the part dimension collapses to a (partkey → is_promo) int mapping
    that attaches through the broadcast↔join lookup tiers, then one
    combiner pass sums promo and total revenue (int64 cent·pct) —
    the share is a single double division of those two sums.
    → one row (promo_rev, total_rev, promo_share_pct)."""
    from quichash_ray.stages.lookup import attach_lookup

    lo = pd.Timestamp(f"{year}-01-01").to_datetime64()
    hi = pd.Timestamp(f"{year + 1}-01-01").to_datetime64()

    def part_flag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": pc.cast(b["p_partkey"], pa.int64()),
                "is_promo": pc.cast(
                    pc.equal(b["p_type"], "PROMO"), pa.int64()
                ),
            }
        )

    flags = part.map_batches(
        part_flag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def li_rev(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi)),
        )
        t = b.filter(pc.fill_null(keep, False))
        price_c = np.asarray(_cents(t["l_extendedprice"]))
        disc_h = np.asarray(_cents(t["l_discount"]))
        return pa.table(
            {
                "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
                "rev": pa.array(price_c * (100 - disc_h), pa.int64()),
            }
        )

    revs = lineitem.map_batches(
        li_rev, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    # default=None → missing partkeys surface as null is_promo, and the
    # partial below DROPS them: inner-join semantics matching the oracle's
    # JOIN part, rather than resting on FK integrity of the input
    flagged = attach_lookup(
        revs,
        flags,
        key_col="l_partkey",
        value_col="is_promo",
        out_col="is_promo",
        key_col_in_mapping="p_partkey",
        default=None,
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["is_promo"]))
        if b.num_rows == 0:
            return pa.table(
                {"promo": pa.array([], pa.int64()),
                 "total": pa.array([], pa.int64())}
            )
        rev = np.asarray(pc.cast(b["rev"], pa.int64()))
        promo = np.asarray(pc.cast(b["is_promo"], pa.int64()))
        return pa.table(
            {
                "promo": pa.array([int((rev * promo).sum())], pa.int64()),
                "total": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    sums = flagged.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).sum(["promo", "total"])
    promo_rev = int(sums["sum(promo)"])
    total_rev = int(sums["sum(total)"])
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "promo_rev": pa.array([promo_rev], pa.int64()),
                "total_rev": pa.array([total_rev], pa.int64()),
                "promo_share_pct": pa.array(
                    [100.0 * promo_rev / total_rev if total_rev else None],
                    pa.float64(),
                ),
            }
        )
    )


def nation_pair_volume(
    lineitem: Dataset,
    orders: Dataset,
    supplier: Dataset,
    customer: Dataset,
    nation: Dataset,
    ship_lo: str = "1996-01-01",
    ship_hi: str = "1998-01-01",
    num_parts: int | None = None,
) -> Dataset:
    """Q7-style two-fact-chain volume shipping: revenue between every
    ordered (supplier nation, customer nation) pair with
    supp_nation ≠ cust_nation, for items shipped in [ship_lo, ship_hi).

    Chained multi-shuffle plan, size-tiered like :func:`revenue_by_nation`:

    1. lineitem projection (orderkey, suppkey, rev cents) gets
       ``s_nationkey`` through the broadcast↔co-partitioned lookup
       (inner semantics: unknown suppkeys drop, matching the oracle's
       JOIN supplier);
    2. orders projection (orderkey, custkey) gets ``c_nationkey`` the
       same way;
    3. the big×big lineitem⨝orders leg is ONE orderkey-hash exchange
       over the union of both annotated projections — each partition
       joins locally and emits (supp_nat, cust_nat, rev, n) partials
       bounded by the 25×25 nation-pair space;
    4. a pair-space groupby finishes the sums; nation names come from
       the 25-row driver dict.

    → (supp_nation, cust_nation, revenue, n_items); revenue in
    cent·percent units (price_cents × (100 − disc_pct)), integer-exact.
    """
    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.lookup import attach_lookup
    from quichash_ray.stages.partitioning import dataset_num_parts

    lo = pd.Timestamp(ship_lo).to_datetime64()
    hi = pd.Timestamp(ship_hi).to_datetime64()
    if num_parts is None:
        num_parts = dataset_num_parts(
            lineitem, bytes_per_row=24, target_bytes=32 << 20
        )

    def l_project(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi)),
        )
        t = b.filter(pc.fill_null(keep, False))
        price_c = np.asarray(_cents(t["l_extendedprice"]))
        disc_h = np.asarray(_cents(t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
                "rev": pa.array(price_c * (100 - disc_h), pa.int64()),
            }
        )

    li = lineitem.map_batches(
        l_project, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    li = attach_lookup(
        li,
        supplier,
        key_col="l_suppkey",
        value_col="s_nationkey",
        out_col="supp_nat",
        key_col_in_mapping="s_suppkey",
        default=None,
    )

    o = orders.map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": pc.cast(b["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(b["o_custkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    o = attach_lookup(
        o,
        customer,
        key_col="o_custkey",
        value_col="c_nationkey",
        out_col="cust_nat",
        key_col_in_mapping="c_custkey",
        default=None,
    )

    def l_side(b: pa.Table) -> pa.Table:
        # inner-join semantics: drop rows whose suppkey missed the dim
        t = b.filter(pc.is_valid(b["supp_nat"]))
        key = pc.cast(t["l_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "nat": pc.cast(t["supp_nat"], pa.int64()),
                "rev": pc.cast(t["rev"], pa.int64()),
                "part": pa.array(np.asarray(key) % num_parts, pa.int64()),
            }
        )

    def o_side(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b["cust_nat"]))
        key = pc.cast(t["o_orderkey"], pa.int64())
        return pa.table(
            {
                "key": key,
                "nat": pc.cast(t["cust_nat"], pa.int64()),
                "rev": pa.nulls(t.num_rows, pa.int64()),  # marker: order row
                "part": pa.array(np.asarray(key) % num_parts, pa.int64()),
            }
        )

    tagged = li.map_batches(
        l_side, batch_format="pyarrow", batch_size=None
    ).union(
        o.map_batches(o_side, batch_format="pyarrow", batch_size=None)
    )

    def join_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "supp_nat": pa.array([], pa.int64()),
                "cust_nat": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0 or "key" not in g.column_names:
            return empty
        df = g.to_pandas()
        is_order = df["rev"].isna()
        omap = df.loc[is_order, ["key", "nat"]].rename(
            columns={"nat": "cust_nat"}
        )
        li_rows = df[~is_order].merge(omap, on="key")
        if len(li_rows) == 0:
            return empty
        out = (
            li_rows.groupby(["nat", "cust_nat"], sort=False)
            .agg(rev=("rev", "sum"), n=("rev", "size"))
            .reset_index()
            .rename(columns={"nat": "supp_nat"})
        )
        return pa.Table.from_pandas(
            out.astype("int64"), preserve_index=False
        )

    partials = hash_exchange(tagged, "part", join_pairs, num_parts)
    agg = partials.groupby(["supp_nat", "cust_nat"]).sum(["rev", "n"])

    # nation is a 25-row dimension — driver dict by contract
    nmap = {int(r["n_nationkey"]): r["n_name"] for r in nation.take_all()}

    def finish(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "supp_nation": pa.array([], pa.string()),
                "cust_nation": pa.array([], pa.string()),
                "revenue": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0 or "sum(rev)" not in b.column_names:
            return empty
        sn = np.asarray(b["supp_nat"], np.int64)
        cn = np.asarray(b["cust_nat"], np.int64)
        keep = sn != cn
        sname = pd.Series(sn[keep]).map(nmap)
        cname = pd.Series(cn[keep]).map(nmap)
        return pa.table(
            {
                "supp_nation": pa.array(sname.to_numpy(), pa.string()),
                "cust_nation": pa.array(cname.to_numpy(), pa.string()),
                "revenue": pc.cast(
                    pa.array(np.asarray(b["sum(rev)"])[keep]), pa.int64()
                ),
                "n_items": pc.cast(
                    pa.array(np.asarray(b["sum(n)"])[keep]), pa.int64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)
