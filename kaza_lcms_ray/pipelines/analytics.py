"""Generic columnar analytics over arbitrary relational tables — the engine
is not geo-only.  Exercised against the driver's TPC-H-shaped tables
(lineitem / orders / customer) with the same exactness discipline as the
geo pipelines: every money/quantity column becomes ×100 scaled int64, so
grouped sums are exact integers (order-free, bit-identical to SQL) and the
derived averages are single identical double divisions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ray.data.aggregate import Count, Max, Sum

PRICING_CUTOFF = "1998-09-02"


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    from ..state.money import to_cents

    return to_cents(col.to_numpy(zero_copy_only=False))


def pricing_summary(lineitem, cutoff: str = PRICING_CUTOFF):
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) counts,
    exact sums of qty / base price / discounted price / charge, and the
    derived averages.

    disc_price and charge stay exact by keeping the rational factors
    integral: price_c·(100−disc_c) and price_c·(100−disc_c)·(100+tax_c),
    divided back once at the end (6e15 ≪ 2⁶³)."""
    cutoff_ts = np.datetime64(cutoff, "us")

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t.column("l_shipdate"), pa.scalar(cutoff_ts))
        t = t.filter(keep)
        qty = _cents(t.column("l_quantity"))
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        tax = _cents(t.column("l_tax"))
        disc_price = price * (100 - disc)
        charge = disc_price * (100 + tax)
        tb = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "q": pa.array(qty),
                "p": pa.array(price),
                "d": pa.array(disc),
                "dp": pa.array(disc_price),
                "ch": pa.array(charge),
            }
        )
        out = tb.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("q", "sum"), ("p", "sum"), ("d", "sum"), ("dp", "sum"),
             ("ch", "sum"), ([], "count_all")]
        )
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "q", "p", "d", "dp", "ch", "n"]
        )

    from ..stages.zonal import bucketed_sum
    agg = bucketed_sum(
        lineitem.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["q", "p", "d", "dp", "ch", "n"],
        max_keys_hint=1 << 16,  # schema-bounded keys — tree reduce,
    )

    def finalize(t: pa.Table) -> pa.Table:
        q = t.column("q").to_numpy(zero_copy_only=False).astype(np.float64)
        p = t.column("p").to_numpy(zero_copy_only=False).astype(np.float64)
        d = t.column("d").to_numpy(zero_copy_only=False).astype(np.float64)
        dp = t.column("dp").to_numpy(zero_copy_only=False).astype(np.float64)
        ch = t.column("ch").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": pa.array(q / 100.0),
                "sum_base_price": pa.array(p / 100.0),
                "sum_disc_price": pa.array(dp / 10000.0),
                "sum_charge": pa.array(ch / 1000000.0),
                "avg_qty": pa.array(q / (100.0 * n)),
                "avg_price": pa.array(p / (100.0 * n)),
                "avg_disc": pa.array(d / (100.0 * n)),
                "count_order": t.column("n"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def local_supplier_volume(
    lineitem,
    orders,
    customer,
    supplier,
    nation,
    region,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
):
    """TPC-H Q5-shaped local supplier volume: revenue per nation where the
    supplier and the ordering customer share a nation inside one region.

    Partitioning plan for the 6-table shape: region/nation are tiny
    (driver-side); supplier/customer attach through the size-guarded
    ``attach_dim`` broadcast-or-hash-join (so the same code path survives
    dimensions that outgrow a broadcast); lineitem is annotated with the
    supplier nation, filtered to the region, and pre-aggregated per
    (orderkey, supp_nation) — so the one big-big exchange, the hash
    Dataset.join on orderkey, moves pre-combined rows only.  Exact ×10⁴
    integer revenue throughout.
    """
    from ..runtime import join_partitions
    from ..stages.joins import attach_dim

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")

    nat = nation.to_pandas()
    reg = region.to_pandas()
    rk = reg.loc[reg["r_name"] == region_name, "r_regionkey"].to_numpy()
    nat_in = nat[nat["n_regionkey"].isin(rk)]
    nat_names = dict(zip(nat_in["n_nationkey"].astype(int), nat_in["n_name"]))
    nats_ref = ray.put(np.asarray(sorted(nat_names), dtype=np.int64))

    def orders_pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(t_from)),
            pc.less(t.column("o_orderdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        return t.select(["o_orderkey", "o_custkey"])

    ord_nat = attach_dim(
        orders.map_batches(orders_pre, batch_format="pyarrow"),
        customer,
        "o_custkey",
        "c_custkey",
        ["c_nationkey"],
    ).map_batches(
        lambda t: pa.table(
            {"l_orderkey": t.column("o_orderkey"), "c_nat": t.column("c_nationkey")}
        ),
        batch_format="pyarrow",
    )

    def li_pre(t: pa.Table) -> pa.Table:
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"),
             "l_suppkey": t.column("l_suppkey"),
             "rev": pa.array(rev)}
        )

    def li_partial(t: pa.Table) -> pa.Table:
        s_nat = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        in_region = np.isin(s_nat, ray.get(nats_ref))
        tb = pa.table(
            {
                "l_orderkey": t.column("l_orderkey").filter(pa.array(in_region)),
                "s_nat": pa.array(s_nat[in_region]),
                "rev": t.column("rev").filter(pa.array(in_region)),
            }
        )
        return (
            tb.group_by(["l_orderkey", "s_nat"])
            .aggregate([("rev", "sum")])
            .rename_columns(["l_orderkey", "s_nat", "rev"])
        )

    li = (
        attach_dim(
            lineitem.map_batches(li_pre, batch_format="pyarrow"),
            supplier,
            "l_suppkey",
            "s_suppkey",
            ["s_nationkey"],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "s_nat"])
        .aggregate(Sum("rev", alias_name="rev"))
    )
    joined = li.join(
        ord_nat,
        join_type="inner",
        num_partitions=join_partitions(rows_hint=orders.count()),
        on=("l_orderkey",),
    )

    def local_only(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("s_nat"), t.column("c_nat"))
        t = t.filter(keep)
        return pa.table({"n_nationkey": t.column("s_nat"), "rev": t.column("rev")})

    from ..stages.zonal import bucketed_sum
    per_nation = bucketed_sum(
        joined.map_batches(local_only, batch_format="pyarrow").rename_columns(
            {"rev": "revenue_scaled"}
        ),
        ["n_nationkey"],
        ["revenue_scaled"],
        max_keys_hint=1 << 16,  # |nations| — tree reduce
    ).to_pandas()
    per_nation["n_name"] = per_nation["n_nationkey"].map(dict(nat_names))
    per_nation = per_nation.sort_values(
        ["revenue_scaled", "n_name"], ascending=[False, True], kind="mergesort"
    )
    return per_nation[["n_name", "revenue_scaled"]].reset_index(drop=True)


def promo_revenue(
    lineitem, part, date_from: str = "1996-09-01", date_to: str = "1996-10-01"
):
    """TPC-H Q14-shaped promotion revenue share: the part dimension
    attaches through size-guarded ``attach_dim`` (is-promo flag, exact
    key-checked inner lookup), one exact integer partial per block,
    single global combine, one double division at the end."""
    import pandas as pd

    from ..stages.joins import attach_dim

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")

    def promo_flag(t: pa.Table) -> pa.Table:
        flag = pc.starts_with(t.column("p_type"), "PROMO")
        return pa.table(
            {"p_partkey": t.column("p_partkey"),
             "is_promo": pc.cast(flag, pa.int8())}
        )

    part_flag = part.select_columns(["p_partkey", "p_type"]).map_batches(
        promo_flag, batch_format="pyarrow"
    )

    def li_pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(t_from)),
            pc.less(t.column("l_shipdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        return pa.table(
            {"l_partkey": t.column("l_partkey"), "rev": pa.array(rev)}
        )

    def partial(t: pa.Table) -> pa.Table:
        rev = t.column("rev").to_numpy(zero_copy_only=False)
        is_promo = t.column("is_promo").to_numpy(zero_copy_only=False).astype(bool)
        return pa.table(
            {
                "promo_rev": pa.array([int(rev[is_promo].sum())]),
                "total_rev": pa.array([int(rev.sum())]),
            }
        )

    flagged = attach_dim(
        lineitem.map_batches(li_pre, batch_format="pyarrow"),
        part_flag,
        "l_partkey",
        "p_partkey",
        ["is_promo"],
    )
    agg = flagged.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo_rev", alias_name="promo_revenue_scaled"),
        Sum("total_rev", alias_name="total_revenue_scaled"),
    )
    p = int(agg["promo_revenue_scaled"])
    tot = int(agg["total_revenue_scaled"])
    return pd.DataFrame(
        {
            "promo_revenue_scaled": [p],
            "total_revenue_scaled": [tot],
            "promo_pct": [100.0 * float(p) / float(tot)],
        }
    )


def shipping_priority(
    lineitem,
    orders,
    customer,
    segment: str = "BUILDING",
    cutoff: str = "1998-06-01",
    k: int = 10,
):
    """TPC-H Q3-shaped shipping priority — the one pipeline that exercises
    Ray's hash ``Dataset.join`` (vs the broadcast-lookup joins elsewhere).

    Plan: customers of the segment become a broadcast key set (small side —
    never shuffled); orders are filtered by date + that set; lineitem is
    filtered by shipdate and PRE-AGGREGATED to exact per-orderkey revenue
    partials BEFORE the join, so the all-to-all moves one row per order,
    not one per line item.  The equi-join runs as a hash Dataset.join on
    l_orderkey with num_partitions sized ≥10k rows/partition (empty hash
    partitions break Arrow's FieldRef resolution in Ray 2.49), then a
    Dataset-native top-k by exact scaled revenue.
    """
    from ..runtime import join_partitions
    from ..stages.joins import attach_dim, top_k

    cutoff_ts = np.datetime64(cutoff, "us")
    seg = customer.filter(expr=f"c_mktsegment == '{segment}'")

    def orders_pre(t: pa.Table) -> pa.Table:
        keep = pc.less(t.column("o_orderdate"), pa.scalar(cutoff_ts))
        t = t.filter(keep)
        return t.select(["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    # semi-join vs the segment's customers: attach_dim inner semantics on the
    # unique c_custkey — size-guarded, so a fact-scaled customer table flips
    # to the hash-join path instead of a driver collect
    orders_seg = attach_dim(
        orders.map_batches(orders_pre, batch_format="pyarrow"),
        seg,
        "o_custkey",
        "c_custkey",
        [],
    )

    def orders_f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    def li_partial(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("l_shipdate"), pa.scalar(cutoff_ts))
        t = t.filter(keep)
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        tb = pa.table({"l_orderkey": t.column("l_orderkey"), "rev": pa.array(rev)})
        return tb.group_by(["l_orderkey"]).aggregate([("rev", "sum")]).rename_columns(
            ["l_orderkey", "rev"]
        )

    from ..stages.zonal import bucketed_sum
    rev_per_order = bucketed_sum(
        lineitem.map_batches(li_partial, batch_format="pyarrow").rename_columns(
            {"rev": "revenue_scaled"}
        ),
        ["l_orderkey"],
        ["revenue_scaled"],
    )
    # partition hint from the (metadata-only) orders count: the join keys
    # are order keys, so ≥10k rows/partition guards the empty-partition
    # ArrowInvalid in Ray 2.49 at small scale while still spreading at 100 TB
    joined = rev_per_order.join(
        orders_seg.map_batches(orders_f, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=join_partitions(rows_hint=orders.count()),
        on=("l_orderkey",),
    )
    return top_k(joined, "revenue_scaled", k, "l_orderkey")


def bilateral_volume(
    lineitem,
    orders,
    customer,
    supplier,
    nation,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
):
    """TPC-H Q7-shaped bilateral shipping volume: discounted revenue
    flowing between two nations (supplier nation × ordering-customer
    nation, both directions) per order year.  Same partitioning shape as
    Q5: nation driver-side (25 rows), supplier/customer through the
    size-guarded ``attach_dim``, lineitem pre-aggregated per (orderkey,
    supp-nation), one hash join on orderkey, nation-pair filter applied
    post-join where both sides are known."""
    from ..runtime import join_partitions
    from ..stages.joins import attach_dim

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")
    nat = nation.to_pandas()
    keymap = dict(zip(nat["n_name"], nat["n_nationkey"].astype(int)))
    names = {v: k for k, v in keymap.items()}
    ka, kb = keymap[nation_a], keymap[nation_b]
    pair = np.array(sorted((ka, kb)), dtype=np.int64)
    pair_ref = ray.put(pair)

    def orders_pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(t_from)),
            pc.less(t.column("o_orderdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        yrs = (
            t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "l_year": pa.array(yrs),
            }
        )

    def orders_post(t: pa.Table) -> pa.Table:
        c_nat = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        m = np.isin(c_nat, ray.get(pair_ref))
        sel = pa.array(m)
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey").filter(sel),
                "c_nat": pa.array(c_nat[m]),
                "l_year": t.column("l_year").filter(sel),
            }
        )

    ord_nat = attach_dim(
        orders.map_batches(orders_pre, batch_format="pyarrow"),
        customer,
        "o_custkey",
        "c_custkey",
        ["c_nationkey"],
    ).map_batches(orders_post, batch_format="pyarrow")

    def li_pre(t: pa.Table) -> pa.Table:
        rev = _cents(t.column("l_extendedprice")) * (100 - _cents(t.column("l_discount")))
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"),
             "l_suppkey": t.column("l_suppkey"),
             "rev": pa.array(rev)}
        )

    def li_partial(t: pa.Table) -> pa.Table:
        s_nat = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        m = np.isin(s_nat, ray.get(pair_ref))
        sel = pa.array(m)
        tb = pa.table(
            {
                "l_orderkey": t.column("l_orderkey").filter(sel),
                "s_nat": pa.array(s_nat[m]),
                "rev": t.column("rev").filter(sel),
            }
        )
        return (
            tb.group_by(["l_orderkey", "s_nat"]).aggregate([("rev", "sum")]).rename_columns(
                ["l_orderkey", "s_nat", "rev"]
            )
        )

    li = (
        attach_dim(
            lineitem.map_batches(li_pre, batch_format="pyarrow"),
            supplier,
            "l_suppkey",
            "s_suppkey",
            ["s_nationkey"],
        )
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "s_nat"])
        .aggregate(Sum("rev", alias_name="rev"))
    )
    joined = li.join(
        ord_nat,
        join_type="inner",
        num_partitions=join_partitions(rows_hint=orders.count()),
        on=("l_orderkey",),
    )

    def cross_only(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("s_nat"), t.column("c_nat"))
        t = t.filter(keep)
        return pa.table(
            {
                "s_nat": t.column("s_nat"),
                "c_nat": t.column("c_nat"),
                "l_year": t.column("l_year"),
                "rev": t.column("rev"),
            }
        )

    from ..stages.zonal import bucketed_sum
    out = bucketed_sum(
        joined.map_batches(cross_only, batch_format="pyarrow").rename_columns(
            {"rev": "revenue_scaled"}
        ),
        ["s_nat", "c_nat", "l_year"],
        ["revenue_scaled"],
        max_keys_hint=1 << 20,  # |nations|²·|years| — tree reduce
    ).to_pandas()
    out["supp_nation"] = out["s_nat"].map(names)
    out["cust_nation"] = out["c_nat"].map(names)
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)
    return out[["supp_nation", "cust_nation", "l_year", "revenue_scaled"]]


def large_orders(lineitem, orders, customer, min_qty: float = 250.0):
    """TPC-H Q18-shaped large-order detection: HAVING-filtered exact
    aggregate (per-order quantity cents), then dimension attachment that
    never materializes orders/customer on the driver.

    Scale shape: the post-HAVING aggregate is bounded by the RESULT size
    (the driver returns those rows anyway), so its key set is broadcast
    and orders/customer are *filtered scans* — each contributes at most
    one matching row per result row to the driver, O(result) total,
    regardless of fact-table scale.  (Previous design collected the whole
    orders + customer tables driver-side — OOM at 100×.)"""

    def partial(t: pa.Table) -> pa.Table:
        qty = _cents(t.column("l_quantity"))
        tb = pa.table({"l_orderkey": t.column("l_orderkey"), "q": pa.array(qty)})
        return (
            tb.group_by(["l_orderkey"]).aggregate([("q", "sum")]).rename_columns(
                ["l_orderkey", "qty_cents"]
            )
        )

    from ..stages.zonal import bucketed_sum
    agg = (
        bucketed_sum(
            lineitem.map_batches(partial, batch_format="pyarrow"),
            ["l_orderkey"],
            ["qty_cents"],
        )
        .filter(expr=f"qty_cents > {int(min_qty * 100)}")
        .to_pandas()  # bounded: this IS the result row set
    )

    def filtered(ds, key_col: str, keys: np.ndarray, out_cols: list[str]):
        keys_ref = ray.put(np.sort(keys))

        def fn(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            col = t.column(key_col).to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ks, col), 0, ks.shape[0] - 1)
            return t.select(out_cols).filter(pa.array(ks[pos] == col))

        return ds.map_batches(fn, batch_format="pyarrow").to_pandas()

    omap = filtered(
        orders, "o_orderkey", agg["l_orderkey"].to_numpy(),
        ["o_orderkey", "o_custkey"],
    )
    cmap = filtered(
        customer, "c_custkey", omap["o_custkey"].unique(),
        ["c_custkey", "c_name"],
    )
    out = agg.merge(
        omap.rename(columns={"o_orderkey": "l_orderkey"}), on="l_orderkey"
    ).merge(cmap, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values("l_orderkey", kind="mergesort").reset_index(drop=True)
    return out[["l_orderkey", "o_custkey", "c_name", "qty_cents"]]


def top_customers_by_revenue(lineitem, orders, customer, k: int = 10):
    """Top-k customers by exact discounted revenue — fully distributed:

    lineitem → exact per-ORDER revenue partials (groupby combine) →
    hash ``Dataset.join`` against orders projected to (o_orderkey,
    o_custkey) — orders is fact-scaled, so it is never collected or
    broadcast — → per-CUSTOMER integer sums → Dataset-native ``top_k``
    (two-level reduce, k rows reach the driver) → names attached by a
    filtered customer scan over the k winning keys.  Driver footprint is
    O(k); every exchange moves pre-combined rows.

    Returns a pandas DataFrame [c_custkey, c_name, revenue_scaled]
    (revenue_scaled = Σ price_c·(100−disc_c), exact int64)."""
    from ..runtime import join_partitions
    from ..stages.joins import top_k

    def li_partial(t: pa.Table) -> pa.Table:
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        rev = price * (100 - disc)
        tb = pa.table({"l_orderkey": t.column("l_orderkey"), "rev": pa.array(rev)})
        out = tb.group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return out.rename_columns(["l_orderkey", "rev"])

    from ..stages.zonal import bucketed_sum
    per_order = bucketed_sum(
        lineitem.map_batches(li_partial, batch_format="pyarrow"),
        ["l_orderkey"],
        ["rev"],
    )
    joined = per_order.join(
        orders.select_columns(["o_orderkey", "o_custkey"]),
        join_type="inner",
        num_partitions=join_partitions(rows_hint=orders.count()),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def cust_partial(t: pa.Table) -> pa.Table:
        tb = pa.table({"c_custkey": t.column("o_custkey"), "rev": t.column("rev")})
        out = tb.group_by(["c_custkey"]).aggregate([("rev", "sum")])
        return out.rename_columns(["c_custkey", "rev"])

    from ..stages.zonal import bucketed_sum
    per_cust = bucketed_sum(
        joined.map_batches(cust_partial, batch_format="pyarrow").rename_columns(
            {"rev": "revenue_scaled"}
        ),
        ["c_custkey"],
        ["revenue_scaled"],
    )
    top = top_k(per_cust, "revenue_scaled", k, "c_custkey").to_pandas()

    keys_ref = ray.put(np.sort(top["c_custkey"].to_numpy()))

    def name_filter(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        col = t.column("c_custkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, col), 0, ks.shape[0] - 1)
        return t.select(["c_custkey", "c_name"]).filter(pa.array(ks[pos] == col))

    names = customer.map_batches(name_filter, batch_format="pyarrow").to_pandas()
    out = top.merge(names, on="c_custkey", how="left")
    out = out.sort_values(
        ["revenue_scaled", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    return out[["c_custkey", "c_name", "revenue_scaled"]]


def order_priority_check(
    lineitem, orders, date_from: str = "1996-01-01", date_to: str = "1996-04-01"
):
    """TPC-H Q4-shaped order-priority check: per-priority counts of the
    orders in a quarter that have at least one RETURNED line (the schema's
    stand-in for Q4's commit<receipt lateness — this lineitem table has no
    commit/receipt dates).  Reference analog: the EXISTS-semi-join +
    grouped-count report shape.

    Scale shape: the lineitem side reduces to DISTINCT returned orderkeys
    (two-phase skinny dedupe — no raw rows shuffle) before the semi-join;
    the semi-join itself is ``attach_dim`` (broadcast sorted-probe below
    the size guard, hash ``Dataset.join`` above it — nothing ever
    driver-materializes past the guard).  Priority cardinality is 5, so
    the final combine is one tiny aggregate.

    Output: (o_orderpriority:string, order_count:int64).
    """
    from ..stages.joins import attach_dim, distinct

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")

    def li_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        return pa.table({"l_orderkey": t.column("l_orderkey")})

    returned = distinct(
        lineitem.select_columns(["l_orderkey", "l_returnflag"]).map_batches(
            li_keys, batch_format="pyarrow"
        ),
        ["l_orderkey"],
    ).map_batches(
        lambda t: t.append_column("hit", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow",
    )

    def o_window(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(t_from)),
            pc.less(t.column("o_orderdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
            }
        )

    hits = attach_dim(
        orders.select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(o_window, batch_format="pyarrow"),
        returned,
        "o_orderkey",
        "l_orderkey",
        ["hit"],
    )

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by("o_orderpriority").aggregate([([], "count_all")])
        return out.rename_columns(["o_orderpriority", "order_count"])

    from ..stages.zonal import bucketed_sum
    return bucketed_sum(
        hits.map_batches(partial, batch_format="pyarrow"),
        ["o_orderpriority"],
        ["order_count"],
        max_keys_hint=1 << 16,  # |priorities| — tree reduce
    )


def order_priority_check_sql(
    date_from: str = "1996-01-01", date_to: str = "1996-04-01"
) -> str:
    """Oracle twin of :func:`order_priority_check`."""
    return f"""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '{date_from}'
          AND o_orderdate <  TIMESTAMP '{date_to}'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority"""


def returnflag_priority_share(
    lineitem, orders, date_from: str = "1996-01-01", date_to: str = "1997-01-01"
):
    """TPC-H Q12-shaped urgency split: lines shipped inside a year window,
    classified by whether their order is high-priority (1-URGENT / 2-HIGH),
    counted per returnflag (the schema's stand-in for Q12's shipmode —
    this lineitem table carries no l_shipmode).

    Scale shape: lineitem pre-projects to (orderkey) skinny rows after the
    window filter; the order-priority dimension attaches through
    size-guarded ``attach_dim`` (unique o_orderkey → broadcast probe below
    the guard, hash join above); per-batch integer partials; the final
    combine is a ≤|flags| aggregate.

    Output: (l_returnflag:string, high_count:int64, low_count:int64).
    """
    from ..stages.joins import attach_dim

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")

    def li_pre(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(t_from)),
            pc.less(t.column("l_shipdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_returnflag": t.column("l_returnflag"),
            }
        )

    def o_pre(t: pa.Table) -> pa.Table:
        hi = pc.is_in(
            t.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "is_high": pc.cast(hi, pa.int8()),
            }
        )

    flagged = attach_dim(
        lineitem.select_columns(
            ["l_orderkey", "l_returnflag", "l_shipdate"]
        ).map_batches(li_pre, batch_format="pyarrow"),
        orders.select_columns(["o_orderkey", "o_orderpriority"]).map_batches(
            o_pre, batch_format="pyarrow"
        ),
        "l_orderkey",
        "o_orderkey",
        ["is_high"],
    )

    def partial(t: pa.Table) -> pa.Table:
        hi = t.column("is_high").to_numpy(zero_copy_only=False).astype(np.int64)
        part = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "high_count": pa.array(hi),
                "low_count": pa.array(1 - hi),
            }
        )
        out = part.group_by("l_returnflag").aggregate(
            [("high_count", "sum"), ("low_count", "sum")]
        )
        return out.rename_columns(["l_returnflag", "high_count", "low_count"])

    from ..stages.zonal import bucketed_sum
    return bucketed_sum(
        flagged.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"],
        ["high_count", "low_count"],
        max_keys_hint=1 << 16,  # |flags| — tree reduce
    )


def returnflag_priority_share_sql(
    date_from: str = "1996-01-01", date_to: str = "1997-01-01"
) -> str:
    """Oracle twin of :func:`returnflag_priority_share`."""
    return f"""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '{date_from}'
          AND l_shipdate <  TIMESTAMP '{date_to}'
        GROUP BY l_returnflag"""


def global_sales_opportunity(
    customer, orders, since: str = "2000-01-01", rows_hint: int | None = None
):
    """TPC-H Q22-shaped dormant-customer report: per market segment, the
    count and total balance of customers whose balance exceeds the global
    positive-balance average AND who have placed no orders since
    ``since`` (Q22's "no orders in 7 years" dormancy window).

    Exactness: the average-balance threshold never becomes a float — the
    filter is the integer cross-multiplication
    ``c_cents · n_pos > sum_pos_cents`` (bit-identical to the SQL twin's
    identical rewrite); segment totals are exact cent sums.

    Scale shape: the threshold is ONE tiny global aggregate (two int64s);
    the no-orders test is a distributed LEFT OUTER ``Dataset.join``
    against the DISTINCT order custkeys (skinny key rows — nothing
    broadcasts, nothing driver-materializes), filtered on the null probe;
    the final combine is a ≤|segments| aggregate.

    Output: (c_mktsegment:string, numcust:int64, totacctbal_cents:int64).
    """
    from ..runtime import join_partitions
    from ..stages.joins import distinct

    cust = customer.select_columns(["c_custkey", "c_acctbal", "c_mktsegment"])

    def pos_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("c_acctbal"))
        pos = cents[cents > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())]),
                "n": pa.array([int(pos.shape[0])]),
            }
        )

    tot = cust.map_batches(pos_partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n")
    )
    sum_pos, n_pos = int(tot["s"]), int(tot["n"])

    def rich(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("c_acctbal"))
        keep = cents * n_pos > sum_pos
        return pa.table(
            {
                "c_custkey": t.column("c_custkey").filter(pa.array(keep)),
                "c_mktsegment": t.column("c_mktsegment").filter(pa.array(keep)),
                "bal_cents": pa.array(cents[keep]),
            }
        )

    rich_ds = cust.map_batches(rich, batch_format="pyarrow")
    # the join merges the key columns, so a null probe needs an explicit
    # right-side marker column
    t_since = np.datetime64(since, "us")

    def recent(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("o_orderdate"), pa.scalar(t_since)))
        return pa.table({"o_custkey": t.column("o_custkey")})

    recent_keys = orders.select_columns(["o_custkey", "o_orderdate"]).map_batches(
        recent, batch_format="pyarrow"
    )
    okeys = distinct(recent_keys, ["o_custkey"]).map_batches(
        lambda t: t.append_column("has_order", pa.array(np.ones(len(t), np.int8))),
        batch_format="pyarrow",
    )
    joined = rich_ds.join(
        okeys,
        join_type="left_outer",
        num_partitions=join_partitions(rows_hint),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("has_order")))
        part = pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "numcust": pa.array(np.ones(len(t), np.int64)),
                "totacctbal_cents": t.column("bal_cents"),
            }
        )
        out = part.group_by("c_mktsegment").aggregate(
            [("numcust", "sum"), ("totacctbal_cents", "sum")]
        )
        return out.rename_columns(["c_mktsegment", "numcust", "totacctbal_cents"])

    from ..stages.zonal import bucketed_sum
    return bucketed_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["c_mktsegment"],
        ["numcust", "totacctbal_cents"],
        max_keys_hint=1 << 16,  # |segments| — tree reduce
    )


def global_sales_opportunity_sql(since: str = "2000-01-01") -> str:
    """Oracle twin of :func:`global_sales_opportunity` (integer threshold
    rewrite of Q22's avg subquery)."""
    return f"""
        WITH pos AS (
            SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) > 0
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
                   AS totacctbal_cents
        FROM customer CROSS JOIN pos
        WHERE CAST(round(c_acctbal * 100, 0) AS BIGINT) * pos.n > pos.s
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '{since}')
        GROUP BY c_mktsegment"""


def revenue_rollup(lineitem):
    """OLAP ROLLUP cube over (returnflag, linestatus): exact integer
    revenue (price·(100−disc) scaled cents) and row counts at all three
    grouping levels — the super-aggregate rows computed FROM the tiny base
    aggregate (never a second corpus pass); 'ALL' marks rolled-up levels
    (the SQL twin COALESCEs its ROLLUP NULLs identically).

    Output: (l_returnflag, l_linestatus, n, revenue_scaled) for
    flag×status, flag×'ALL', and 'ALL'×'ALL' rows.
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        part = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "n": pa.array(np.ones(len(t), np.int64)),
                "revenue_scaled": pa.array(rev),
            }
        )
        out = part.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("n", "sum"), ("revenue_scaled", "sum")]
        )
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "n", "revenue_scaled"]
        )

    from ..stages.zonal import bucketed_sum
    base = bucketed_sum(
        lineitem.select_columns(
            ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"]
        ).map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["n", "revenue_scaled"],
        max_keys_hint=1 << 16,  # flag×status — tree reduce
    ).to_pandas()
    if len(base) == 0:
        # empty Dataset.to_pandas() loses columns; the cube still carries
        # its zero-count grand total
        base = pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=str),
                "l_linestatus": pd.Series([], dtype=str),
                "n": pd.Series([], dtype="int64"),
                "revenue_scaled": pd.Series([], dtype="int64"),
            }
        )
    lvl1 = (
        base.groupby("l_returnflag", as_index=False)[["n", "revenue_scaled"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "n": [base["n"].sum()],
            "revenue_scaled": [base["revenue_scaled"].sum()],
        }
    )
    out = pd.concat([base, lvl1, lvl0], ignore_index=True)
    return out[["l_returnflag", "l_linestatus", "n", "revenue_scaled"]].astype(
        {"n": np.int64, "revenue_scaled": np.int64}
    )


def revenue_rollup_sql() -> str:
    """Oracle twin of :func:`revenue_rollup`."""
    return """
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COALESCE(l_linestatus, 'ALL') AS l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) AS revenue_scaled
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


def benford_audit(orders):
    """Benford's-law first-digit audit of order totals — the standard
    data-quality / fraud screen for money columns.  The first significant
    digit is taken from the DECIMAL STRING of the exact cents integer
    (never a float log — no boundary ambiguity at powers of ten);
    observed shares are pinned divisions and the Benford expectation
    log₁₀(1+1/d) is a Python-float literal shared with the SQL twin.

    Output: (digit:int64, n:int64, p_obs:f64, p_benford:f64) for d=1..9.
    """
    import math

    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("o_totalprice"))
        first = pc.utf8_slice_codeunits(
            pc.cast(pa.array(cents), pa.string()), 0, 1
        )
        d = pc.cast(first, pa.int64()).to_numpy(zero_copy_only=False)
        cnt = np.zeros(10, dtype=np.int64)
        np.add.at(cnt, d, 1)
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n": pa.array(cnt[1:]),
            }
        )

    from ..stages.zonal import bucketed_sum
    agg = (
        bucketed_sum(
            orders.select_columns(["o_totalprice"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["digit"],
            ["n"],
            max_keys_hint=1 << 16,  # 9 digits — tree reduce
        )
        .to_pandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    total = float(agg["n"].sum())
    agg["p_obs"] = agg["n"].to_numpy(np.float64) / total
    agg["p_benford"] = [
        math.log10(1.0 + 1.0 / d) for d in agg["digit"].astype(int)
    ]
    return agg.astype({"digit": np.int64, "n": np.int64})


def benford_audit_sql() -> str:
    """Oracle twin of :func:`benford_audit` (digit from the cents string;
    Benford constants inlined as the engine's Python floats)."""
    import math

    bens = ", ".join(
        f"({d}, {math.log10(1.0 + 1.0 / d)!r})" for d in range(1, 10)
    )
    return f"""
        WITH bd AS (
            SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM orders
        ),
        ct AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
            FROM bd GROUP BY digit
        ),
        tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM ct),
        exp_p AS (SELECT * FROM (VALUES {bens}) AS e(digit, p_benford))
        SELECT c.digit, c.n,
               CAST(c.n AS DOUBLE) / t.t AS p_obs,
               e.p_benford
        FROM ct c CROSS JOIN tot t JOIN exp_p e ON e.digit = c.digit"""


def product_profit(lineitem, orders, part, supplier, nation, name_like: str = "red"):
    """TPC-H Q9-shaped product-type profit: per (supplier nation, order
    year), profit = Σ price·(100−disc) − retail·qty (this schema has no
    partsupp, so the part's retail price plays supplycost — both ×10⁴
    scaled, so the difference is one exact int64) over lineitems whose
    part name contains ``name_like``.

    Partitioning plan (the Q5 discipline): the LIKE-filtered part
    dimension and the supplier→nation name map attach through size-guarded
    ``attach_dim`` / broadcast; the order year attaches the same way; the
    lineitem scan is pre-aggregated per (nation, year) INSIDE each batch
    so the final combine is tiny.  One corpus pass, zero big-big joins.

    Output: (n_name:string, o_year:int64, profit_scaled:int64).
    """
    from ..stages.joins import attach_dim

    def part_pre(t: pa.Table) -> pa.Table:
        keep = pc.match_substring(t.column("p_name"), name_like)
        t = t.filter(keep)
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "retail_c": pa.array(_cents(t.column("p_retailprice"))),
            }
        )

    sup = supplier.select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    nat = nation.select_columns(["n_nationkey", "n_name"]).to_pandas()
    smap = sup.merge(
        nat, left_on="s_nationkey", right_on="n_nationkey", how="inner"
    )[["s_suppkey", "n_name"]]
    import ray as _ray
    import ray.data as rd

    sref = _ray.put(
        {
            "k": np.sort(smap["s_suppkey"].to_numpy(np.int64)),
            "v": smap.sort_values("s_suppkey")["n_name"].to_numpy(object),
        }
    )

    def o_pre(t: pa.Table) -> pa.Table:
        yr = (
            t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "o_year": pa.array(yr)}
        )

    def li_pre(t: pa.Table) -> pa.Table:
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        cost = _cents(t.column("l_quantity"))  # combined with retail later
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev": pa.array(rev),
                "qty_c": pa.array(cost),
            }
        )

    li = attach_dim(
        lineitem.select_columns(
            [
                "l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount", "l_quantity",
            ]
        ).map_batches(li_pre, batch_format="pyarrow"),
        part.select_columns(["p_partkey", "p_name", "p_retailprice"]).map_batches(
            part_pre, batch_format="pyarrow"
        ),
        "l_partkey",
        "p_partkey",
        ["retail_c"],
    )
    li = attach_dim(
        li,
        orders.select_columns(["o_orderkey", "o_orderdate"]).map_batches(
            o_pre, batch_format="pyarrow"
        ),
        "l_orderkey",
        "o_orderkey",
        ["o_year"],
    )

    def partial(t: pa.Table) -> pa.Table:
        side = _ray.get(sref)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["k"], sk)
        pos = np.minimum(pos, max(len(side["k"]) - 1, 0))
        hit = side["k"][pos] == sk if len(side["k"]) else np.zeros(len(sk), bool)
        rev = t.column("rev").to_numpy(zero_copy_only=False)[hit]
        qty = t.column("qty_c").to_numpy(zero_copy_only=False)[hit]
        ret = t.column("retail_c").to_numpy(zero_copy_only=False)[hit]
        yr = t.column("o_year").to_numpy(zero_copy_only=False)[hit]
        prof = rev - ret * qty
        part_t = pa.table(
            {
                "n_name": pa.array(side["v"][pos[hit]], pa.string()),
                "o_year": pa.array(yr),
                "profit_scaled": pa.array(prof),
            }
        )
        g = part_t.group_by(["n_name", "o_year"]).aggregate(
            [("profit_scaled", "sum")]
        )
        return g.rename_columns(["n_name", "o_year", "profit_scaled"])

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["n_name", "o_year"])
        .aggregate(Sum("profit_scaled", alias_name="profit_scaled"))
    )


def product_profit_sql(name_like: str = "red") -> str:
    """Oracle twin of :func:`product_profit`."""
    return f"""
        SELECT n_name,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                        - CAST(round(p_retailprice * 100, 0) AS BIGINT)
                          * CAST(round(l_quantity * 100, 0) AS BIGINT))
                    AS BIGINT) AS profit_scaled
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%{name_like}%'
        GROUP BY n_name, o_year"""


def customer_distribution(orders, customer, status_excl: str = "F"):
    """TPC-H Q13-shaped customer order-count distribution: how many
    customers placed exactly k qualifying orders, INCLUDING the k=0
    customers the left-outer join keeps (the schema's o_orderstatus <>
    filter stands in for Q13's comment NOT LIKE).  Reference analog: the
    left-outer count + histogram report shape.

    Scale shape: orders reduce per-batch to (custkey, n) integer partials
    and combine through one skinny groupby — raw order rows never
    shuffle.  The per-customer count table then collapses to the tiny
    (c_count → custdist) histogram, and the zero bucket is pure
    arithmetic: |customer| − |customers with ≥1 order| (one scalar count
    on each side, no outer join materialized anywhere).

    Output: (c_count:int64, custdist:int64).
    """

    def o_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("o_orderstatus"), status_excl))
        out = t.select(["o_custkey"]).group_by("o_custkey").aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["o_custkey", "n"])

    per_cust = (
        orders.select_columns(["o_custkey", "o_orderstatus"])
        .map_batches(o_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def h_partial(t: pa.Table) -> pa.Table:
        out = t.select(["c_count"]).group_by("c_count").aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["c_count", "custdist"])

    hist = (
        per_cust.map_batches(h_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()  # ≤ max-orders-per-customer rows: tiny by construction
    )
    n_zero = int(customer.count()) - int(hist["custdist"].sum())
    out = pa.table(
        {
            "c_count": np.concatenate(
                [hist["c_count"].to_numpy(np.int64), np.array([0], np.int64)]
            ),
            "custdist": np.concatenate(
                [hist["custdist"].to_numpy(np.int64), np.array([n_zero], np.int64)]
            ),
        }
    )
    return out.filter(pc.greater(out.column("custdist"), 0))


def customer_distribution_sql(status_excl: str = "F") -> str:
    """Oracle twin of :func:`customer_distribution`."""
    return f"""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderstatus <> '{status_excl}'
            GROUP BY c_custkey) c
        GROUP BY c_count"""


def small_quantity_revenue(lineitem, part, brand: str = "Brand#13"):
    """TPC-H Q17-shaped small-quantity revenue: total extended price (÷7,
    the 'average yearly' convention) of the brand's lines whose quantity
    is below 20% of that part's average quantity.

    Exactness: the per-part average never becomes a float — the filter
    qty < 0.2·(sum/cnt) is the integer cross-multiplication
    qty_c·5·cnt < sum_c, and the final division by 700 happens once.

    Scale shape: two lineitem passes (inherent to the correlated-average
    shape).  Pass 1 pre-aggregates (partkey → sum_c, cnt) per batch and
    combines skinny; pass 2 attaches the per-part pair through
    size-guarded ``attach_dim`` (a single brand's parts: |part|/|brands|)
    and reduces the surviving cents to one scalar.

    Output: one row (avg_yearly:double).
    """
    from ..stages.joins import attach_dim

    brand_keys = part.map_batches(
        lambda t: t.filter(pc.equal(t.column("p_brand"), brand)).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )

    def li_partial(t: pa.Table) -> pa.Table:
        q = _cents(t.column("l_quantity"))
        tb = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "q": pa.array(q),
            }
        )
        out = tb.group_by("l_partkey").aggregate([("q", "sum"), ([], "count_all")])
        return out.rename_columns(["l_partkey", "sum_q", "cnt"])

    per_part = (
        lineitem.select_columns(["l_partkey", "l_quantity"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sum_q", alias_name="sum_q"), Sum("cnt", alias_name="cnt"))
    )
    # restrict the broadcast side to the brand's parts (inner attach_dim
    # on the skinny aggregate — both sides are per-part, never raw lines)
    brand_avg = attach_dim(
        per_part, brand_keys, "l_partkey", "p_partkey", []
    )

    def keep_small(t: pa.Table) -> pa.Table:
        q = _cents(t.column("l_quantity"))
        p = _cents(t.column("l_extendedprice"))
        s = t.column("sum_q").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        keep = q * 5 * c < s
        return pa.table({"rev": pa.array(p[keep])})

    survivors = attach_dim(
        lineitem.select_columns(["l_partkey", "l_quantity", "l_extendedprice"]),
        brand_avg,
        "l_partkey",
        "l_partkey",
        ["sum_q", "cnt"],
    ).map_batches(keep_small, batch_format="pyarrow")

    total = survivors.sum("rev", ignore_nulls=True) or 0
    return pa.table({"avg_yearly": np.array([total / 700.0], np.float64)})


def small_quantity_revenue_sql(brand: str = "Brand#13") -> str:
    """Oracle twin of :func:`small_quantity_revenue` — the SAME integer
    cross-multiplied threshold, so both branches follow one rule."""
    return f"""
        WITH pavg AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT))
                        AS BIGINT) AS sum_q,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) / 700.0 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = '{brand}'
        JOIN pavg a ON a.l_partkey = l.l_partkey
        WHERE CAST(round(l.l_quantity * 100, 0) AS BIGINT) * 5 * a.cnt
              < a.sum_q"""


def supplier_part_counts(
    lineitem, part, supplier, brand_excl: str = "Brand#15",
    type_prefix_excl: str = "PROMO",
):
    """TPC-H Q16-shaped supplier counts: exact COUNT(DISTINCT supplier)
    per (p_brand, p_type, p_size), with a brand/type exclusion and the
    negative-balance suppliers dropped (the schema's stand-in for Q16's
    complaint-comment anti-filter; supplier-part relationships come from
    lineitem since this schema carries no partsupp).

    Scale shape: lineitem reduces to DISTINCT (partkey, suppkey) skinny
    pairs first (two-phase dedupe — the only corpus-sized input never
    shuffles raw).  The bad-supplier set is a tiny broadcast filter; part
    attributes attach through size-guarded ``attach_dim``; the final
    exact distinct-count is a second two-phase distinct over
    (brand, type, size, suppkey) — every stage's rows are bounded by
    |parts × suppliers-per-part|, never by |lineitem|.

    Output: (p_brand, p_type, p_size:int64, supplier_cnt:int64).
    """
    from ..stages.joins import attach_dim, distinct

    pairs = distinct(
        lineitem.select_columns(["l_partkey", "l_suppkey"]),
        ["l_partkey", "l_suppkey"],
    )

    bad = supplier.map_batches(
        lambda t: t.filter(pc.less(t.column("s_acctbal"), 0.0)).select(
            ["s_suppkey"]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    bad_ref = ray.put(np.sort(bad["s_suppkey"].to_numpy(np.int64)))

    def drop_bad(t: pa.Table) -> pa.Table:
        bk = ray.get(bad_ref)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(bk, sk), 0, max(len(bk) - 1, 0))
        hit = (bk[pos] == sk) if len(bk) else np.zeros(len(sk), bool)
        return t.filter(pa.array(~hit))

    good_pairs = pairs.map_batches(drop_bad, batch_format="pyarrow")

    def keep_part(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.not_equal(t.column("p_brand"), brand_excl),
            pc.invert(
                pc.starts_with(t.column("p_type"), type_prefix_excl)
            ),
        )
        return t.filter(keep)

    attrs = attach_dim(
        good_pairs,
        part.select_columns(["p_partkey", "p_brand", "p_type", "p_size"])
        .map_batches(keep_part, batch_format="pyarrow"),
        "l_partkey",
        "p_partkey",
        ["p_brand", "p_type", "p_size"],
    )
    combos = distinct(attrs, ["p_brand", "p_type", "p_size", "l_suppkey"])

    def c_partial(t: pa.Table) -> pa.Table:
        out = (
            t.select(["p_brand", "p_type", "p_size"])
            .group_by(["p_brand", "p_type", "p_size"])
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["p_brand", "p_type", "p_size", "supplier_cnt"])

    return (
        combos.map_batches(c_partial, batch_format="pyarrow")
        .groupby(["p_brand", "p_type", "p_size"])
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
    )


def supplier_part_counts_sql(
    brand_excl: str = "Brand#15", type_prefix_excl: str = "PROMO"
) -> str:
    """Oracle twin of :func:`supplier_part_counts`."""
    return f"""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> '{brand_excl}'
          AND p_type NOT LIKE '{type_prefix_excl}%'
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size"""


def important_parts(
    lineitem, supplier, nation, nation_name: str = "NATION_3",
    frac_num: int = 1, frac_den: int = 1000,
):
    """TPC-H Q11-shaped important stock: parts whose revenue from one
    nation's suppliers exceeds ``frac_num/frac_den`` of that nation's
    total (value = sum of extended-price cents over the nation's lines;
    this schema has no partsupp, so lineitem revenue stands in for
    supplycost·availqty).

    Exactness: the HAVING threshold is the integer cross-multiplication
    value_c·frac_den > total_c·frac_num — no float compare anywhere; the
    reported value is one final /100 division.

    Scale shape: the nation's supplier keys are a tiny broadcast filter
    pushed into the lineitem scan; per-part cents combine two-phase
    skinny; the grand total is a scalar ``Dataset.sum`` over the SAME
    skinny aggregate (one rule, both uses); the final filter is stateless.

    Output: (l_partkey:int64, value:double) for qualifying parts.
    """
    nk = nation.map_batches(
        lambda t: t.filter(pc.equal(t.column("n_name"), nation_name)).select(
            ["n_nationkey"]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    keys = supplier.map_batches(
        lambda t: t.select(["s_suppkey", "s_nationkey"]),
        batch_format="pyarrow",
    ).to_pandas()
    good = np.sort(
        keys.loc[
            keys["s_nationkey"].isin(nk["n_nationkey"].tolist()), "s_suppkey"
        ].to_numpy(np.int64)
    )
    good_ref = ray.put(good)

    def li_partial(t: pa.Table) -> pa.Table:
        gk = ray.get(good_ref)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(gk, sk), 0, max(len(gk) - 1, 0))
        hit = (gk[pos] == sk) if len(gk) else np.zeros(len(sk), bool)
        t = t.filter(pa.array(hit))
        tb = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "v": pa.array(_cents(t.column("l_extendedprice"))),
            }
        )
        return tb.group_by("l_partkey").aggregate([("v", "sum")]).rename_columns(
            ["l_partkey", "value_c"]
        )

    per_part = (
        lineitem.select_columns(["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("value_c", alias_name="value_c"))
        .materialize()  # skinny (≤ |part| rows); scanned twice below
    )
    total_c = int(per_part.sum("value_c", ignore_nulls=True) or 0)

    def finalize(t: pa.Table) -> pa.Table:
        v = t.column("value_c").to_numpy(zero_copy_only=False)
        keep = v * frac_den > total_c * frac_num
        return pa.table(
            {
                "l_partkey": t.column("l_partkey").filter(pa.array(keep)),
                "value": pa.array(v[keep] / 100.0),
            }
        )

    return per_part.map_batches(finalize, batch_format="pyarrow")


def important_parts_sql(
    nation_name: str = "NATION_3", frac_num: int = 1, frac_den: int = 1000
) -> str:
    """Oracle twin of :func:`important_parts` — same integer threshold."""
    return f"""
        WITH nat_lines AS (
            SELECT l_partkey,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE n_name = '{nation_name}'
        ),
        pp AS (
            SELECT l_partkey, CAST(SUM(v) AS BIGINT) AS value_c
            FROM nat_lines GROUP BY l_partkey
        )
        SELECT l_partkey, value_c / 100.0 AS value
        FROM pp
        WHERE value_c * {frac_den} >
              (SELECT CAST(SUM(value_c) AS BIGINT) FROM pp) * {frac_num}"""


def _skyline_kernel(price_c: np.ndarray, size: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the Pareto frontier under (price min, size
    max).  A row is dominated iff some row has price < p with size ≥ s,
    OR price ≤ p with size > s; equal (price, size) pairs never dominate
    each other, so duplicates of a frontier point all survive.

    Vectorized: group sizes by sorted unique price, then the two prefix
    maxima (exclusive for the < case, inclusive for the ≤ case) answer
    both dominance tests with one searchsorted probe per row."""
    if price_c.shape[0] == 0:
        return np.zeros(0, bool)
    uniq, inv = np.unique(price_c, return_inverse=True)
    gmax = np.full(uniq.shape[0], np.iinfo(np.int64).min, np.int64)
    np.maximum.at(gmax, inv, size)
    incl = np.maximum.accumulate(gmax)  # max size among price <= uniq[i]
    excl = np.empty_like(incl)  # max size among price < uniq[i]
    excl[0] = np.iinfo(np.int64).min
    excl[1:] = incl[:-1]
    del incl  # folded into the two tests below
    return ~((excl[inv] >= size) | (gmax[inv] > size))


def part_skyline(part):
    """Skyline / Pareto-frontier query: the parts no other part beats on
    BOTH price (lower-or-equal) and size (higher-or-equal, one strict) —
    the classic multi-criteria shortlist operator.

    Scale shape: the skyline operator is decomposable — skyline(S ∪ T)
    = skyline(skyline(S) ∪ skyline(T)) — so each batch reduces to its
    local frontier first (typically ≤ |distinct prices| rows) and only
    those survivors meet in one final single-block pass.  Raw part rows
    never shuffle; the merge input is bounded by Σ per-batch frontier
    sizes, independent of the table's row count.

    Output: (p_partkey:int64, price_c:int64, p_size:int64).
    """

    def local(t: pa.Table) -> pa.Table:
        price_c = _cents(t.column("p_retailprice"))
        size = (
            t.column("p_size")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = _skyline_kernel(price_c, size)
        return pa.table(
            {
                "p_partkey": pa.array(
                    t.column("p_partkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[keep]
                ),
                "price_c": pa.array(price_c[keep]),
                "p_size": pa.array(size[keep]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        keep = _skyline_kernel(
            t.column("price_c").to_numpy(zero_copy_only=False),
            t.column("p_size").to_numpy(zero_copy_only=False),
        )
        return t.filter(pa.array(keep))

    return (
        part.select_columns(["p_partkey", "p_retailprice", "p_size"])
        .map_batches(local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def part_skyline_sql() -> str:
    """Oracle twin of :func:`part_skyline` — the NOT EXISTS dominance
    definition over the same ×100 integer prices."""
    return """
        WITH pp AS (
            SELECT p_partkey,
                   CAST(round(p_retailprice * 100, 0) AS BIGINT) AS price_c,
                   CAST(p_size AS BIGINT) AS p_size
            FROM part
        )
        SELECT p_partkey, price_c, p_size
        FROM pp a
        WHERE NOT EXISTS (
            SELECT 1 FROM pp b
            WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
              AND (b.price_c < a.price_c OR b.p_size > a.p_size))"""


def min_unit_price_suppliers(lineitem, supplier):
    """TPC-H Q2-shaped argmin-with-ties join-back: for every part, ALL
    (supplier, line) sources that achieve the minimum unit price — the
    correlated-MIN subquery shape (Q2's min supplycost; this schema has
    no partsupp, so unit price = extendedprice/quantity stands in).

    Exactness: unit price never becomes a float — the pinned rule is the
    integer floor division unit_milli = price_c·1000 // qty_c (both
    positive, so numpy and SQL agree), the per-part MIN is an integer
    two-phase aggregate, and the tie filter is integer equality.

    Scale shape: pass 1 reduces lines to the skinny per-part integer MIN
    (per-batch grouped-min partials — raw rows never shuffle); pass 2
    re-scans lineitem, attaches the min through size-guarded
    ``attach_dim``, keeps the exact ties, dedupes (part, supplier) pairs
    two-phase, and decorates with the tiny supplier dim.

    Output: (l_partkey, l_suppkey, s_name, unit_milli) — one row per
    distinct winning pair.
    """
    from ray.data.aggregate import Min

    from ..stages.joins import attach_dim, distinct

    def unit(t: pa.Table) -> pa.Table:
        p = _cents(t.column("l_extendedprice"))
        q = _cents(t.column("l_quantity"))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "unit_milli": pa.array(p * 1000 // q),
            }
        )

    units = lineitem.select_columns(
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]
    ).map_batches(unit, batch_format="pyarrow")

    def m_partial(t: pa.Table) -> pa.Table:
        out = (
            t.select(["l_partkey", "unit_milli"])
            .group_by("l_partkey")
            .aggregate([("unit_milli", "min")])
        )
        return out.rename_columns(["l_partkey", "mn"])

    mins = (
        units.map_batches(m_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Min("mn", alias_name="mn"))
    )

    def keep_ties(t: pa.Table) -> pa.Table:
        u = t.column("unit_milli").to_numpy(zero_copy_only=False)
        m = t.column("mn").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(u == m)).select(
            ["l_partkey", "l_suppkey", "unit_milli"]
        )

    winners = distinct(
        attach_dim(units, mins, "l_partkey", "l_partkey", ["mn"]).map_batches(
            keep_ties, batch_format="pyarrow"
        ),
        ["l_partkey", "l_suppkey", "unit_milli"],
    )
    return attach_dim(
        winners,
        supplier.select_columns(["s_suppkey", "s_name"]),
        "l_suppkey",
        "s_suppkey",
        ["s_name"],
    )


def min_unit_price_suppliers_sql() -> str:
    """Oracle twin of :func:`min_unit_price_suppliers` — same integer
    floor-division unit rule and tie-keeping MIN join."""
    return """
        WITH u AS (
            SELECT l_partkey, l_suppkey,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 1000
                   // CAST(round(l_quantity * 100, 0) AS BIGINT)
                       AS unit_milli
            FROM lineitem
        ),
        m AS (
            SELECT l_partkey, MIN(unit_milli) AS mn FROM u GROUP BY 1
        )
        SELECT DISTINCT u.l_partkey, u.l_suppkey, s.s_name, u.unit_milli
        FROM u
        JOIN m ON u.l_partkey = m.l_partkey AND u.unit_milli = m.mn
        JOIN supplier s ON s.s_suppkey = u.l_suppkey"""


def top_revenue_suppliers(
    lineitem, supplier, date_from: str = "1996-01-01", date_to: str = "1996-04-01"
):
    """TPC-H Q15-shaped top supplier(s): per-supplier revenue over a
    3-month shipdate window, then EVERY supplier achieving the global
    maximum (the Q15 view + ties rule).

    Exactness: revenue is the exact integer
    price_c · (100 − disc_c) sum; the global max and the tie filter are
    integer comparisons, so ties are exact, not float-fuzzy.

    Scale shape: the corpus-sized pass reduces inside each batch to one
    row per supplier (supplier-bounded partials) and combines through
    the bucketed integer exchange; the global MAX runs over the skinny
    per-supplier table; the winner set (usually one row) decorates via
    the size-guarded supplier dim attach.  No raw lineitem row ever
    shuffles.

    Output: (s_suppkey, s_name, total_rev_c:int64).
    """
    from ray.data.aggregate import Max

    from ..stages.joins import attach_dim
    from ..stages.zonal import bucketed_sum

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(t_from)),
            pc.less(t.column("l_shipdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        g = (
            pa.table({"l_suppkey": t.column("l_suppkey"), "rev": pa.array(rev)})
            .group_by(["l_suppkey"])
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["l_suppkey", "rev"])

    rev = bucketed_sum(
        lineitem.select_columns(
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
        ).map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"],
        ["rev"],
    ).materialize()  # skinny per-supplier table, consumed twice (max + ties)

    mx = int(rev.aggregate(Max("rev", alias_name="mx"))["mx"])

    def ties(t: pa.Table) -> pa.Table:
        r = t.column("rev").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(r == mx))

    return attach_dim(
        rev.map_batches(ties, batch_format="pyarrow"),
        supplier.select_columns(["s_suppkey", "s_name"]),
        "l_suppkey",
        "s_suppkey",
        ["s_name"],
    ).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t.column("l_suppkey"),
                "s_name": t.column("s_name"),
                "total_rev_c": t.column("rev"),
            }
        ),
        batch_format="pyarrow",
    )


def top_revenue_suppliers_sql(
    date_from: str = "1996-01-01", date_to: str = "1996-04-01"
) -> str:
    """Oracle twin of :func:`top_revenue_suppliers` — the Q15 revenue
    view + MAX scalar subquery, identical integer revenue rule."""
    return f"""
        WITH r AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
                        AS BIGINT) AS rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{date_from}'
              AND l_shipdate < TIMESTAMP '{date_to}'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.rev AS total_rev_c
        FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.rev = (SELECT MAX(rev) FROM r)"""


def waiting_suppliers(lineitem, orders, supplier):
    """TPC-H Q21-shaped "supplier who kept the order waiting": for every
    finished ('F') multi-supplier order, find the supplier that was the
    UNIQUE latest shipper (EXISTS another supplier on the order, NOT
    EXISTS another supplier shipping as late), and count such orders per
    supplier.  This schema has no commit/receipt dates
    (reference analog: the multi-way EXISTS/NOT-EXISTS self-join shape),
    so "waiting" = strictly-latest l_shipdate among ≥2 distinct suppliers.

    Scale shape: the raw lineitem never re-shuffles — it reduces to
    distinct (orderkey, suppkey) pairs carrying a per-pair MAX shipdate
    (two-phase Arrow group_by partials, skinny int64 rows).  Order-level
    (max, distinct-supplier-count) is a second two-phase aggregate of the
    pair table; attaching it back is ``attach_dim`` (hash join above the
    guard — both sides scale with |orders|, nothing driver-materializes).
    The unique-latest test is a third two-phase aggregate (count==1 makes
    MAX(suppkey) the witness supplier), the 'F' filter is a skinny
    semi-join, and supplier names attach from the bounded supplier dim.

    Output: (s_name:string, numwait:int64).
    """
    from ..stages.joins import attach_dim

    def pair_partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "smax": t.column("l_shipdate").cast(pa.int64()),
            }
        )
        out = tb.group_by(["l_orderkey", "l_suppkey"]).aggregate([("smax", "max")])
        return out.rename_columns(["l_orderkey", "l_suppkey", "smax"])

    from ..stages.zonal import bucketed_combine, bucketed_sum

    # the pair table feeds BOTH the order-level aggregate and the join-back;
    # without materializing, every downstream consumption re-executes the
    # raw-lineitem reduction.  It is the SKINNY reduced table (3 int64-ish
    # cols, one row per distinct (order, supplier)) — the pack_sequences
    # skinny-materialize rationale.  All combines run through the bucketed
    # exchange, not Ray's sort groupby (measured 56 s → 7 s at sf0.1/32).
    pairs = bucketed_combine(
        lineitem.select_columns(["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
            pair_partial, batch_format="pyarrow"
        ),
        ["l_orderkey", "l_suppkey"],
        {"smax": "max"},
    ).materialize()

    def ord_partial(t: pa.Table) -> pa.Table:
        out = t.group_by("l_orderkey").aggregate(
            [("smax", "max"), ([], "count_all")]
        )
        return out.rename_columns(["ok", "omax", "nsupp"])

    ords = bucketed_combine(
        pairs.map_batches(ord_partial, batch_format="pyarrow"),
        ["ok"],
        {"omax": "max", "nsupp": "sum"},
    ).materialize()

    enriched = attach_dim(
        pairs, ords, "l_orderkey", "ok", ["omax", "nsupp"],
        dim_rows=ords.count(),
    )

    def at_max(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("smax"), t.column("omax")),
            pc.greater_equal(t.column("nsupp"), pa.scalar(2, pa.int64())),
        )
        t = t.filter(keep)
        return pa.table(
            {"l_orderkey": t.column("l_orderkey"), "l_suppkey": t.column("l_suppkey")}
        )

    def uniq_partial(t: pa.Table) -> pa.Table:
        out = t.group_by("l_orderkey").aggregate(
            [("l_suppkey", "max"), ([], "count_all")]
        )
        return out.rename_columns(["l_orderkey", "skey", "nmax"])

    # bucketed exchange, NOT the sort-based native aggregate: the sort
    # groupby on this skinny 100k-row table measured 8.3 s vs 0.25 s
    # bucketed at sf0.1/32 — the same pathology the pair combine avoids
    uniq = bucketed_combine(
        enriched.map_batches(at_max, batch_format="pyarrow").map_batches(
            uniq_partial, batch_format="pyarrow"
        ),
        ["l_orderkey"],
        {"skey": "max", "nmax": "sum"},
    )

    def f_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("o_orderstatus"), "F"))
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "f_hit": pa.array(np.ones(len(t), np.int8)),
            }
        )

    fkeys = orders.select_columns(["o_orderkey", "o_orderstatus"]).map_batches(
        f_keys, batch_format="pyarrow"
    )

    waiting = attach_dim(
        uniq.filter(expr="nmax == 1"), fkeys, "l_orderkey", "o_orderkey", ["f_hit"]
    )

    def count_partial(t: pa.Table) -> pa.Table:
        out = (
            pa.table({"s_suppkey": t.column("skey")})
            .group_by("s_suppkey")
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["s_suppkey", "numwait"])

    counts = bucketed_combine(
        waiting.map_batches(count_partial, batch_format="pyarrow"),
        ["s_suppkey"],
        {"numwait": "sum"},
    )

    def s_dim(t: pa.Table) -> pa.Table:
        return pa.table({"sk": t.column("s_suppkey"), "s_name": t.column("s_name")})

    sdim = supplier.select_columns(["s_suppkey", "s_name"]).map_batches(
        s_dim, batch_format="pyarrow"
    )
    named = attach_dim(counts, sdim, "s_suppkey", "sk", ["s_name"])
    return named.select_columns(["s_name", "numwait"])


def waiting_suppliers_sql() -> str:
    """Oracle twin of :func:`waiting_suppliers` — the same unique-latest-
    shipper rule expressed algebraically over a distinct pair table."""
    return """
        WITH pairs AS (
            SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
            FROM lineitem GROUP BY 1, 2
        ),
        ord AS (
            SELECT l_orderkey, MAX(smax) AS omax, COUNT(*) AS nsupp
            FROM pairs GROUP BY 1
        ),
        atmax AS (
            SELECT p.l_orderkey, p.l_suppkey
            FROM pairs p JOIN ord o USING (l_orderkey)
            WHERE p.smax = o.omax AND o.nsupp >= 2
        ),
        uniq AS (
            SELECT l_orderkey, MAX(l_suppkey) AS l_suppkey
            FROM atmax GROUP BY 1 HAVING COUNT(*) = 1
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM uniq
        JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
        JOIN supplier ON s_suppkey = l_suppkey
        GROUP BY s_name"""


DISJUNCTIVE_GROUPS = (
    ("Brand#12", 1.0, 11.0, 1, 5),
    ("Brand#23", 10.0, 20.0, 1, 10),
    ("Brand#14", 20.0, 30.0, 1, 15),
)


def disjunctive_revenue(lineitem, part, groups=DISJUNCTIVE_GROUPS):
    """TPC-H Q19-shaped disjunctive-predicate join revenue: revenue over
    lineitem ⋈ part where ANY of the (brand, quantity-range, size-range)
    OR-groups matches.  The predicate cannot be pushed as one conjunctive
    filter — the canonical "OR of ANDs across both join sides" shape.

    Scale shape: lineitem is pre-filtered to the union quantity envelope
    at the read side (one vectorized mask), part attributes attach via the
    size-guarded ``attach_dim`` broadcast, the OR-group disjunction is one
    vectorized numpy mask per group, and the result is a single global
    integer sum (revenue in 10⁻⁴ dollar units — exact).

    Output: one row (revenue4:int64, n_lines:int64).
    """
    from ..stages.joins import attach_dim

    qmin = min(g[1] for g in groups)
    qmax = max(g[2] for g in groups)

    def li_pre(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity")
        keep = pc.and_(
            pc.greater_equal(q, pa.scalar(qmin)), pc.less_equal(q, pa.scalar(qmax))
        )
        t = t.filter(keep)
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        return pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "qty": t.column("l_quantity"),
                "rev4": pa.array(price * (100 - disc)),
            }
        )

    li = lineitem.select_columns(
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(li_pre, batch_format="pyarrow")

    def p_dim(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pk": t.column("p_partkey"),
                "p_brand": t.column("p_brand"),
                "p_size": t.column("p_size"),
            }
        )

    pdim = part.select_columns(["p_partkey", "p_brand", "p_size"]).map_batches(
        p_dim, batch_format="pyarrow"
    )
    joined = attach_dim(li, pdim, "l_partkey", "pk", ["p_brand", "p_size"])

    def partial(t: pa.Table) -> pa.Table:
        qty = t.column("qty").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False)
        brand = t.column("p_brand").to_numpy(zero_copy_only=False)
        mask = np.zeros(len(t), dtype=bool)
        for b, ql, qh, sl, sh in groups:
            mask |= (brand == b) & (qty >= ql) & (qty <= qh) & (size >= sl) & (size <= sh)
        rev = t.column("rev4").to_numpy(zero_copy_only=False)[mask]
        return pa.table(
            {
                "revenue4": pa.array([int(rev.sum())], pa.int64()),
                "n_lines": pa.array([int(mask.sum())], pa.int64()),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow").sum(
            ["revenue4", "n_lines"]
        )
        or {}
    )
    return pa.table(
        {
            "revenue4": pa.array([int(agg.get("sum(revenue4)") or 0)], pa.int64()),
            "n_lines": pa.array([int(agg.get("sum(n_lines)") or 0)], pa.int64()),
        }
    )


def disjunctive_revenue_sql(groups=DISJUNCTIVE_GROUPS) -> str:
    """Oracle twin of :func:`disjunctive_revenue`."""
    ors = " OR ".join(
        f"(p_brand = '{b}' AND l_quantity BETWEEN {ql} AND {qh} "
        f"AND p_size BETWEEN {sl} AND {sh})"
        for b, ql, qh, sl, sh in groups
    )
    return f"""
        SELECT COALESCE(CAST(SUM(
                 CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
               ) AS BIGINT), 0) AS revenue4,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE {ors}"""


def dominant_supplier_parts(
    lineitem, supplier, date_from: str = "1996-01-01", date_to: str = "1997-01-01"
):
    """TPC-H Q20-shaped correlated-fraction semi-join: suppliers that
    dominate a part's yearly volume — for each (supplier, part) the
    shipped quantity in the window exceeds HALF of that part's total
    across all suppliers (the reference's availqty > 0.5·sum(qty)
    correlated-subquery shape, adapted to this schema without partsupp).
    Counts dominated parts per supplier.

    Scale shape: quantities reduce to distinct (partkey, suppkey) pairs
    with exact integer sums (two-phase); the per-part total is a second
    two-phase aggregate of the SAME skinny pair table; the correlated
    comparison 2·q_sp > q_p is one ``attach_dim`` join on partkey (hash
    join above the guard — both sides are per-part aggregates, never raw
    lines); the half threshold is an integer cross-multiplication, no
    division.

    Output: (s_name:string, n_parts:int64).
    """
    from ..stages.joins import attach_dim

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")

    def pair_partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(t_from)),
            pc.less(t.column("l_shipdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        tb = pa.table(
            {
                "l_partkey": t.column("l_partkey"),
                "l_suppkey": t.column("l_suppkey"),
                "q": pa.array(_cents(t.column("l_quantity"))),
            }
        )
        out = tb.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        return out.rename_columns(["l_partkey", "l_suppkey", "q"])

    # consumed twice (per-part totals + the correlated join-back): skinny
    # materialize so raw lineitem reduces once (waiting_suppliers rationale)
    pairs = (
        lineitem.select_columns(
            ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
        )
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(Sum("q", alias_name="q"))
    ).materialize()

    def tot_partial(t: pa.Table) -> pa.Table:
        out = t.group_by("l_partkey").aggregate([("q", "sum")])
        return out.rename_columns(["pk", "tot"])

    totals = (
        pairs.map_batches(tot_partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("tot", alias_name="tot"))
    )

    enriched = attach_dim(pairs, totals, "l_partkey", "pk", ["tot"])

    def dominant(t: pa.Table) -> pa.Table:
        q = t.column("q").to_numpy(zero_copy_only=False)
        tot = t.column("tot").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(2 * q > tot))
        out = (
            pa.table({"s_suppkey": t.column("l_suppkey")})
            .group_by("s_suppkey")
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["s_suppkey", "n_parts"])

    counts = (
        enriched.map_batches(dominant, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("n_parts", alias_name="n_parts"))
    )

    def s_dim(t: pa.Table) -> pa.Table:
        return pa.table({"sk": t.column("s_suppkey"), "s_name": t.column("s_name")})

    sdim = supplier.select_columns(["s_suppkey", "s_name"]).map_batches(
        s_dim, batch_format="pyarrow"
    )
    named = attach_dim(counts, sdim, "s_suppkey", "sk", ["s_name"])
    return named.select_columns(["s_name", "n_parts"])


def dominant_supplier_parts_sql(
    date_from: str = "1996-01-01", date_to: str = "1997-01-01"
) -> str:
    """Oracle twin of :func:`dominant_supplier_parts` — same integer
    half-threshold cross-multiplication."""
    return f"""
        WITH pairs AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT))
                        AS BIGINT) AS q
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{date_from}'
              AND l_shipdate <  TIMESTAMP '{date_to}'
            GROUP BY 1, 2
        ),
        tot AS (SELECT l_partkey, SUM(q) AS tot FROM pairs GROUP BY 1)
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM pairs
        JOIN tot USING (l_partkey)
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE 2 * pairs.q > tot.tot
        GROUP BY s_name"""


def market_share(
    lineitem,
    orders,
    customer,
    supplier,
    nation,
    region,
    target_nation: str = "NATION_5",
    target_region: str = "AFRICA",
):
    """TPC-H Q8-shaped national market share: per order year, the fraction
    of revenue (orders placed by customers of ``target_region``) that was
    supplied by suppliers of ``target_nation``.

    Scale shape: nation × region resolve driver-side (bounded 25×5 rows by
    schema, the only collect); the region's customer filter attaches
    c_nationkey via the size-guarded ``attach_dim`` and tests membership
    against the tiny broadcast nation set; supplier nationality attaches
    the same way; the order-year attach onto lineitem is the one big-big
    join (hash join above the guard).  Numerator/denominator are exact
    integer 10⁻⁴-dollar sums per year; the share is ONE final double
    division, bit-replayable in SQL.

    Output: (o_year, num_rev4, den_rev4, mkt_share).
    """
    from ..stages.joins import attach_dim

    nat = nation.select_columns(["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = region.select_columns(["r_regionkey", "r_name"]).to_pandas()
    rkey = int(reg.loc[reg["r_name"] == target_region, "r_regionkey"].iloc[0])
    region_nations = np.sort(
        nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].to_numpy(np.int64)
    )
    target_nkey = int(nat.loc[nat["n_name"] == target_nation, "n_nationkey"].iloc[0])

    def c_dim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"ck": t.column("c_custkey"), "c_nationkey": t.column("c_nationkey")}
        )

    cdim = customer.select_columns(["c_custkey", "c_nationkey"]).map_batches(
        c_dim, batch_format="pyarrow"
    )

    def o_skinny(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        year = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "o_year": pa.array(year),
            }
        )

    ords = attach_dim(
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            o_skinny, batch_format="pyarrow"
        ),
        cdim,
        "o_custkey",
        "ck",
        ["c_nationkey"],
    )

    def region_filter(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(region_nations, nk)
        pos_c = np.clip(pos, 0, len(region_nations) - 1)
        t = t.filter(pa.array(region_nations[pos_c] == nk))
        return pa.table(
            {"ok": t.column("o_orderkey"), "o_year": t.column("o_year")}
        )

    ords = ords.map_batches(region_filter, batch_format="pyarrow")

    def li_pre(t: pa.Table) -> pa.Table:
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev4": pa.array(price * (100 - disc)),
            }
        )

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_pre, batch_format="pyarrow")

    def s_dim(t: pa.Table) -> pa.Table:
        return pa.table(
            {"sk": t.column("s_suppkey"), "s_nationkey": t.column("s_nationkey")}
        )

    sdim = supplier.select_columns(["s_suppkey", "s_nationkey"]).map_batches(
        s_dim, batch_format="pyarrow"
    )
    li = attach_dim(li, sdim, "l_suppkey", "sk", ["s_nationkey"])
    joined = attach_dim(li, ords, "l_orderkey", "ok", ["o_year"])

    def partial(t: pa.Table) -> pa.Table:
        rev = t.column("rev4").to_numpy(zero_copy_only=False)
        nk = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        num = np.where(nk == target_nkey, rev, 0)
        tb = pa.table(
            {
                "o_year": t.column("o_year"),
                "num_rev4": pa.array(num),
                "den_rev4": pa.array(rev),
            }
        )
        out = tb.group_by("o_year").aggregate(
            [("num_rev4", "sum"), ("den_rev4", "sum")]
        )
        return out.rename_columns(["o_year", "num_rev4", "den_rev4"])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("num_rev4", alias_name="num_rev4"),
            Sum("den_rev4", alias_name="den_rev4"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        num = t.column("num_rev4").to_numpy(zero_copy_only=False)
        den = t.column("den_rev4").to_numpy(zero_copy_only=False)
        share = num.astype(np.float64) / den.astype(np.float64)
        return pa.table(
            {
                "o_year": t.column("o_year"),
                "num_rev4": t.column("num_rev4"),
                "den_rev4": t.column("den_rev4"),
                "mkt_share": pa.array(share),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def market_share_sql(
    target_nation: str = "NATION_5", target_region: str = "AFRICA"
) -> str:
    """Oracle twin of :func:`market_share` — identical integer sums and one
    double division per year."""
    return f"""
        WITH li AS (
            SELECT l_orderkey, l_suppkey,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS rev4
            FROM lineitem
        ),
        o AS (
            SELECT o_orderkey,
                   CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            WHERE r_name = '{target_region}'
        ),
        j AS (
            SELECT o_year, rev4, s_nationkey
            FROM li
            JOIN o ON l_orderkey = o_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN s_nationkey =
                        (SELECT n_nationkey FROM nation
                         WHERE n_name = '{target_nation}')
                        THEN rev4 ELSE 0 END) AS BIGINT) AS num_rev4,
               CAST(SUM(rev4) AS BIGINT) AS den_rev4,
               CAST(SUM(CASE WHEN s_nationkey =
                        (SELECT n_nationkey FROM nation
                         WHERE n_name = '{target_nation}')
                        THEN rev4 ELSE 0 END) AS DOUBLE)
               / CAST(SUM(rev4) AS DOUBLE) AS mkt_share
        FROM j GROUP BY o_year"""


KANON_BAND_CENTS = 100_000  # acctbal band width: $1000 in cents
KANON_BAND_SHIFT = 100_000  # shift before // so negatives never divide


def k_anonymity(customer):
    """k-anonymity profile of the customer table under the quasi-identifier
    (nation, market segment, $1000 account-balance band) — the privacy /
    governance audit a data platform runs before sharing a table: how many
    equivalence classes of each size exist, and how many rows sit in
    dangerously small ones (class_size = 1 is a direct re-identification).

    Pinned band rule: cents = round(acctbal·100) (the house to_cents),
    band = (cents + shift) // width with the shift keeping the dividend
    non-negative — numpy floor-division and SQL // agree only off the
    negative axis, so the rule never goes there.

    Scale shape: per-batch Arrow class counts → bucketed combine over the
    BOUNDED class space (|nations|·|segments|·|bands|), then a ≤|classes|
    histogram fold — two skinny exchanges, raw rows never shuffle.

    Output: (class_size, n_classes, n_rows), ascending class_size.
    """
    from ..stages.zonal import bucketed_sum

    def classes(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("c_acctbal"))
        band = (cents + KANON_BAND_SHIFT) // KANON_BAND_CENTS
        g = (
            pa.table(
                {
                    "nation": t.column("c_nationkey"),
                    "segment": t.column("c_mktsegment"),
                    "band": pa.array(band),
                }
            )
            .group_by(["nation", "segment", "band"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["nation", "segment", "band", "k"])

    cls = bucketed_sum(
        customer.select_columns(
            ["c_nationkey", "c_mktsegment", "c_acctbal"]
        ).map_batches(classes, batch_format="pyarrow"),
        ["nation", "segment", "band"],
        ["k"],
    )

    def hist(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {
                    "class_size": pa.array(k),
                    "one": pa.array(np.ones(len(k), np.int64)),
                    "rows_": pa.array(k),
                }
            )
            .group_by(["class_size"])
            .aggregate([("one", "sum"), ("rows_", "sum")])
        )
        return g.rename_columns(["class_size", "n_classes", "n_rows"])

    return bucketed_sum(
        cls.map_batches(hist, batch_format="pyarrow"),
        ["class_size"],
        ["n_classes", "n_rows"],
    )


def k_anonymity_sql() -> str:
    """Oracle twin of :func:`k_anonymity`."""
    return f"""
        WITH ka_b AS (
            SELECT c_nationkey,
                   (CAST(round(c_acctbal * 100, 0) AS BIGINT)
                       + {KANON_BAND_SHIFT}) // {KANON_BAND_CENTS} AS band,
                   c_mktsegment
            FROM customer
        ),
        ka_c AS (
            SELECT c_nationkey, c_mktsegment, band,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM ka_b GROUP BY 1, 2, 3
        )
        SELECT k AS class_size,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(k) AS BIGINT) AS n_rows
        FROM ka_c GROUP BY k"""


FK_ORPHAN_MOD = 17  # derived-orphan rule: parents with key % 17 == 0 vanish


def fk_audit(orders, customer, lineitem):
    """Referential-integrity audit: orphan counts for the two big foreign
    keys (orders.o_custkey → customer, lineitem.l_orderkey → orders) —
    the data-quality gate a platform runs before publishing a snapshot.

    The synth schema is referentially intact, so the audit DERIVES a
    violated variant deterministically on both sides (the _dup_docs
    discipline): parents with key % 17 == 0 are treated as missing.

    Scale shape: each side reduces to SKINNY rows first — the child to
    (key, n_rows) partials, the parent to distinct keys — then ONE
    key-bucketed mixed combine (sum child rows, max parent flag) decides
    orphanhood per key; the verdict folds to a 2-row report.  Raw fact
    rows never shuffle.

    Output: (relation, n_rows, n_orphan_rows, n_orphan_keys).
    """
    from ..stages.zonal import bucketed_combine, bucketed_sum

    def one(child, child_key, parent, parent_key, relation):
        def child_part(t: pa.Table) -> pa.Table:
            g = t.group_by([child_key]).aggregate([([], "count_all")])
            out = g.rename_columns(["key", "n"])
            return out.append_column(
                "p", pa.array(np.zeros(out.num_rows, np.int64))
            )

        def parent_part(t: pa.Table) -> pa.Table:
            k = t.column(parent_key).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            k = np.unique(k[k % FK_ORPHAN_MOD != 0])
            return pa.table(
                {
                    "key": pa.array(k),
                    "n": pa.array(np.zeros(len(k), np.int64)),
                    "p": pa.array(np.ones(len(k), np.int64)),
                }
            )

        both = child.select_columns([child_key]).map_batches(
            child_part, batch_format="pyarrow"
        ).union(
            parent.select_columns([parent_key]).map_batches(
                parent_part, batch_format="pyarrow"
            )
        )
        per_key = bucketed_combine(both, ["key"], {"n": "sum", "p": "max"})

        def verdict(t: pa.Table) -> pa.Table:
            n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            p = t.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
            orphan = (p == 0) & (n > 0)
            return pa.table(
                {
                    "relation": pa.array([relation]),
                    "n_rows": pa.array([int(n.sum())]),
                    "n_orphan_rows": pa.array([int(n[orphan].sum())]),
                    "n_orphan_keys": pa.array([int(orphan.sum())]),
                }
            )

        return bucketed_sum(
            per_key.map_batches(verdict, batch_format="pyarrow"),
            ["relation"],
            ["n_rows", "n_orphan_rows", "n_orphan_keys"],
        )

    a = one(orders, "o_custkey", customer, "c_custkey", "orders->customer")
    b = one(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
    return a.union(b)


def fk_audit_sql() -> str:
    """Oracle twin of :func:`fk_audit`."""
    m = FK_ORPHAN_MOD

    def one(child, ckey, parent, pkey, relation):
        return f"""
        SELECT '{relation}' AS relation,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(CASE WHEN p.k IS NULL THEN 1 END), 0)
                    AS BIGINT) AS n_orphan_rows,
               CAST(COUNT(DISTINCT CASE WHEN p.k IS NULL THEN c.{ckey} END)
                    AS BIGINT) AS n_orphan_keys
        FROM {child} c
        LEFT JOIN (
            SELECT DISTINCT {pkey} AS k FROM {parent}
            WHERE {pkey} % {m} <> 0
        ) p ON p.k = c.{ckey}"""

    return (
        one("orders", "o_custkey", "customer", "c_custkey", "orders->customer")
        + " UNION ALL "
        + one("lineitem", "l_orderkey", "orders", "o_orderkey",
              "lineitem->orders")
    )


def basket_rules(lineitem, min_support: int = 2, k: int = 100):
    """Market-basket association rules over order contents: for every
    unordered part pair co-occurring in ≥ ``min_support`` orders, the
    support counts and the LIFT (observed co-occurrence / expected under
    independence),

        lift(a,b) = n · c_ab / (c_a · c_b)

    reported as the top-``k`` pairs by (lift DESC, part_a, part_b) — the
    classic affinity-analysis primitive (Apriori's scoring step) the
    TPC-H-shaped family lacked.

    Scale shape: raw lineitem reduces ONCE to distinct (order, part)
    rows (bucketed distinct — skinny int64 pairs); pair expansion runs
    per hash bucket with whole orders guaranteed and is fully
    VECTORIZED (ranges-from-counts index arithmetic, no per-order
    Python); per-bucket pair counts collapse before the bucketed sum;
    part margins attach via the size-guarded ``attach_dim`` broadcast;
    the global top-k is the two-level no-sort reduce.  Baskets are
    order-bounded (≤ C(parts-per-order, 2) pairs each), so nothing is
    quadratic in the corpus.

    Output: (part_a:int64, part_b:int64, c_ab:int64, c_a:int64,
    c_b:int64, lift:f64), ≤ k rows.
    """
    import pandas as pd

    from ..stages.joins import attach_dim, distinct, top_k
    from ..stages.zonal import _add_bucket, _default_buckets, bucketed_sum

    bp = distinct(
        lineitem.select_columns(["l_orderkey", "l_partkey"]),
        ["l_orderkey", "l_partkey"],
    ).materialize()
    n_orders = distinct(bp.select_columns(["l_orderkey"]), ["l_orderkey"]).count()
    n_bp = bp.count()

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        ok = g["l_orderkey"].to_numpy(np.int64)
        pk = g["l_partkey"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], ok[1:] != ok[:-1])))
        cnt = np.diff(np.concatenate((starts, [len(ok)])))
        # ranges-from-counts: element at local position i partners with the
        # (cnt−1−i) parts after it in its order segment
        idx = np.arange(len(ok))
        loc = idx - np.repeat(starts, cnt)
        rep = np.repeat(cnt, cnt) - 1 - loc
        csum = np.cumsum(rep)
        total = int(csum[-1]) if len(csum) else 0
        if total == 0:
            return pd.DataFrame(
                {
                    "pa": pd.Series([], dtype=np.int64),
                    "pb": pd.Series([], dtype=np.int64),
                    "c_ab": pd.Series([], dtype=np.int64),
                }
            )
        a_idx = np.repeat(idx, rep)
        b_idx = a_idx + 1 + (np.arange(total) - np.repeat(csum - rep, rep))
        key = pk[a_idx] * np.int64(1) * np.int64(2**32) + pk[b_idx]
        uk, uc = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {
                "pa": (uk >> np.int64(32)).astype(np.int64),
                "pb": (uk & np.int64(0xFFFFFFFF)).astype(np.int64),
                "c_ab": uc.astype(np.int64),
            }
        )

    pair_partials = (
        _add_bucket(bp, ["l_orderkey"], _default_buckets(n_bp))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["pa", "pb", "c_ab"])
    )
    pairs = bucketed_sum(pair_partials, ["pa", "pb"], ["c_ab"])

    def part_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["l_partkey"])
            .group_by(["l_partkey"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["l_partkey", "c"])

    parts = bucketed_sum(
        bp.map_batches(part_partial, batch_format="pyarrow"),
        ["l_partkey"],
        ["c"],
    ).materialize()
    n_parts = parts.count()

    def rn(col_from: str, col_to: str):
        def f(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [col_to if c == col_from else c for c in t.column_names]
            )

        return f

    dim_a = parts.map_batches(rn("c", "c_a"), batch_format="pyarrow")
    dim_b = parts.map_batches(rn("c", "c_b"), batch_format="pyarrow")
    sup = pairs.filter(expr=f"c_ab >= {min_support}")
    sup = attach_dim(sup, dim_a, "pa", "l_partkey", ["c_a"], dim_rows=n_parts)
    sup = attach_dim(sup, dim_b, "pb", "l_partkey", ["c_b"], dim_rows=n_parts)

    nf = float(n_orders)

    def score(t: pa.Table) -> pa.Table:
        cab = t.column("c_ab").to_numpy(zero_copy_only=False).astype(np.float64)
        ca = t.column("c_a").to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t.column("c_b").to_numpy(zero_copy_only=False).astype(np.float64)
        pa_ = t.column("pa").to_numpy(zero_copy_only=False)
        pb_ = t.column("pb").to_numpy(zero_copy_only=False)
        lift = (np.float64(nf) * cab) / (ca * cb)
        return pa.table(
            {
                "part_a": t.column("pa"),
                "part_b": t.column("pb"),
                "c_ab": t.column("c_ab"),
                "c_a": t.column("c_a"),
                "c_b": t.column("c_b"),
                "lift": pa.array(lift, pa.float64()),
                "tie": pa.array(pa_ * np.int64(2**32) + pb_, pa.int64()),
            }
        )

    ranked = top_k(
        sup.map_batches(score, batch_format="pyarrow"),
        "lift",
        k,
        "tie",
        descending=True,
    )
    return ranked.select_columns(
        ["part_a", "part_b", "c_ab", "c_a", "c_b", "lift"]
    )


def rfm_segments(orders):
    """RFM customer segmentation — the classic marketing-analytics rollup
    (Recency / Frequency / Monetary quintile scores per customer, packed
    into the 111–555 segment code).  PURE INTEGER end-to-end: order dates
    become epoch days, totalprice becomes exact cents, and the quintile
    rule is the NEAREST-RANK cutoff (c_k = smallest value whose
    cumulative customer count reaches ⌈n·k/5⌉; score = 1 + Σ(v > c_k),
    recency inverted so fresher = higher) — pinned identically in the
    oracle, so there is not a single float anywhere.

    Scale shape: raw orders reduce once through the bucketed combine to
    one skinny int64 row per customer; the three cutoff sets come from
    per-VALUE count histograms (≤ |customers| rows each — the customer
    table is a dimension) collapsed driver-side; scoring is a stateless
    broadcast map.

    Output: (o_custkey:int64, recency_days:int64, frequency:int64,
    monetary_cents:int64, r_score:int64, f_score:int64, m_score:int64,
    rfm:int64), one row per ordering customer.
    """
    import pandas as pd

    import ray

    from ..state.money import to_cents
    from ..stages.zonal import bucketed_combine, bucketed_sum

    DAY_NS = 86_400_000_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["o_orderdate"].astype("datetime64[ns]").astype("int64").to_numpy()
            // DAY_NS
        )
        cents = to_cents(df["o_totalprice"].to_numpy())
        g = (
            pd.DataFrame(
                {
                    "o_custkey": df["o_custkey"].to_numpy(np.int64),
                    "last_day": day,
                    "frequency": np.ones(len(df), np.int64),
                    "monetary_cents": cents,
                }
            )
            .groupby("o_custkey", as_index=False)
            .agg(
                last_day=("last_day", "max"),
                frequency=("frequency", "sum"),
                monetary_cents=("monetary_cents", "sum"),
            )
        )
        return g

    percust = bucketed_combine(
        orders.select_columns(
            ["o_custkey", "o_orderdate", "o_totalprice"]
        ).map_batches(partial, batch_format="pandas"),
        ["o_custkey"],
        {"last_day": "max", "frequency": "sum", "monetary_cents": "sum"},
    ).materialize()
    n = percust.count()

    gmax = int(
        percust.map_batches(
            lambda t: pa.table(
                {
                    "g": pa.array(
                        [
                            int(
                                t.column("last_day")
                                .to_numpy(zero_copy_only=False)
                                .max()
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["g"]
        .max()
    )

    def add_rec(t: pa.Table) -> pa.Table:
        last = t.column("last_day").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "recency_days": pa.array(np.int64(gmax) - last, pa.int64()),
                "frequency": t.column("frequency"),
                "monetary_cents": t.column("monetary_cents"),
            }
        )

    rec = percust.map_batches(add_rec, batch_format="pyarrow").materialize()

    def cutoffs(col: str) -> np.ndarray:
        def hp(t: pa.Table) -> pa.Table:
            g = t.select([col]).group_by([col]).aggregate([([], "count_all")])
            return g.rename_columns(["v", "c"])

        h = (
            bucketed_sum(rec.map_batches(hp, batch_format="pyarrow"), ["v"], ["c"])
            .to_pandas()
            .sort_values("v", kind="mergesort")
        )
        v = h["v"].to_numpy(np.int64)
        cum = np.cumsum(h["c"].to_numpy(np.int64))
        return np.array(
            [v[np.searchsorted(cum, (n * k + 4) // 5)] for k in (1, 2, 3, 4)],
            np.int64,
        )

    cut_ref = ray.put(
        {
            "r": cutoffs("recency_days"),
            "f": cutoffs("frequency"),
            "m": cutoffs("monetary_cents"),
        }
    )

    def score(t: pa.Table) -> pa.Table:
        cuts = ray.get(cut_ref)

        def asc(v: np.ndarray, c: np.ndarray) -> np.ndarray:
            s = np.ones(len(v), np.int64)
            for ck in c:
                s += (v > ck).astype(np.int64)
            return s

        rd_ = t.column("recency_days").to_numpy(zero_copy_only=False)
        fq = t.column("frequency").to_numpy(zero_copy_only=False)
        mo = t.column("monetary_cents").to_numpy(zero_copy_only=False)
        r_s = np.int64(6) - asc(rd_, cuts["r"])
        f_s = asc(fq, cuts["f"])
        m_s = asc(mo, cuts["m"])
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "recency_days": t.column("recency_days"),
                "frequency": t.column("frequency"),
                "monetary_cents": t.column("monetary_cents"),
                "r_score": pa.array(r_s, pa.int64()),
                "f_score": pa.array(f_s, pa.int64()),
                "m_score": pa.array(m_s, pa.int64()),
                "rfm": pa.array(r_s * 100 + f_s * 10 + m_s, pa.int64()),
            }
        )

    return rec.map_batches(score, batch_format="pyarrow")


def abc_parts(lineitem):
    """ABC (Pareto 80/95) inventory classification of parts by revenue —
    the stock-control staple: parts sorted by revenue descending, class
    A while the cumulative share is ≤80 %, B while ≤95 %, else C.

    PURE INTEGER: per-part revenue is the exact cent sum of
    l_extendedprice (bucketed two-phase reduce over the raw lineitem —
    the only corpus-sized pass); the cumulative rule is evaluated with
    integer cross-multiplication (cum·5 ≤ total·4, cum·20 ≤ total·19)
    over the (revenue DESC, partkey ASC) order, so there is no float
    anywhere and ties are deterministic.  The ranked classification runs
    driver-side on the |parts|-bounded dimension table.

    Output: (l_partkey:int64, revenue_cents:int64, cum_cents:int64,
    abc_class:string), parts in classification order.
    """
    import pandas as pd

    from ..state.money import to_cents
    from ..stages.zonal import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        cents = to_cents(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        )
        g = (
            pa.table(
                {
                    "l_partkey": t.column("l_partkey"),
                    "revenue_cents": pa.array(cents, pa.int64()),
                }
            )
            .group_by(["l_partkey"])
            .aggregate([("revenue_cents", "sum")])
        )
        return g.rename_columns(["l_partkey", "revenue_cents"])

    per_part = bucketed_sum(
        lineitem.select_columns(["l_partkey", "l_extendedprice"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["l_partkey"],
        ["revenue_cents"],
    ).to_pandas()  # |parts|-bounded dimension table
    import ray.data as rd

    if len(per_part) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "l_partkey": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                    "cum_cents": pa.array([], pa.int64()),
                    "abc_class": pa.array([], pa.string()),
                }
            )
        )
    per_part = per_part.sort_values(
        ["revenue_cents", "l_partkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    rev = per_part["revenue_cents"].to_numpy(np.int64)
    cum = np.cumsum(rev)
    total = int(cum[-1])
    is_a = cum * 5 <= total * 4
    is_b = ~is_a & (cum * 20 <= total * 19)
    cls = np.where(is_a, "A", np.where(is_b, "B", "C"))
    return rd.from_arrow(
        pa.table(
            {
                "l_partkey": pa.array(per_part["l_partkey"].to_numpy(np.int64)),
                "revenue_cents": pa.array(rev, pa.int64()),
                "cum_cents": pa.array(cum, pa.int64()),
                "abc_class": pa.array(cls.tolist(), pa.string()),
            }
        )
    )


def cohort_ltv(orders):
    """Cohort lifetime-value matrix — the classic retention-revenue
    rollup: customers grouped by FIRST-order calendar month (the
    cohort), every later order bucketed by months-since-first, and each
    (cohort, k) cell reporting the cohort's cumulative revenue per
    customer up to k.

    PURE INTEGER except the final division: months are exact
    year·12+month−1 ints, revenue is exact cents, cohort sizes are
    counts; `ltv_cents` = ONE pinned cum_rev/n_customers double per
    cell.  Scale shape: ONE bucketed per-customer min-month reduce, a
    size-guarded cohort attach back onto the order stream, per-batch
    (cohort, k) partials → tiny grouped sum; the cumulative scan runs
    on the (months × months)/2-bounded cell table driver-side.

    Output: (cohort_month:int64, k:int64, n_customers:int64,
    n_orders:int64, rev_cents:int64, cum_rev_cents:int64,
    ltv_cents:f64), cells sorted by (cohort, k).
    """
    import pandas as pd

    from ..state.money import to_cents
    from ..stages.joins import attach_dim
    from ..stages.zonal import bucketed_combine, bucketed_sum

    def month_partial(df: pd.DataFrame) -> pd.DataFrame:
        dt = df["o_orderdate"]
        ym = (dt.dt.year.to_numpy(np.int64) * 12 + dt.dt.month.to_numpy(np.int64)
              - 1)
        g = (
            pd.DataFrame(
                {"o_custkey": df["o_custkey"].to_numpy(np.int64), "cohort": ym}
            )
            .groupby("o_custkey", as_index=False)
            .agg(cohort=("cohort", "min"))
        )
        return g

    proj = orders.select_columns(["o_custkey", "o_orderdate", "o_totalprice"])
    first = bucketed_combine(
        proj.map_batches(month_partial, batch_format="pandas"),
        ["o_custkey"],
        {"cohort": "min"},
    ).materialize()
    n_cust = first.count()

    def cohort_sizes(t: pa.Table) -> pa.Table:
        g = t.select(["cohort"]).group_by(["cohort"]).aggregate([([], "count_all")])
        return g.rename_columns(["cohort", "n_customers"])

    sizes = (
        bucketed_sum(
            first.map_batches(cohort_sizes, batch_format="pyarrow"),
            ["cohort"],
            ["n_customers"],
        )
        .to_pandas()
        .set_index("cohort")["n_customers"]
    )

    withc = attach_dim(
        proj, first, "o_custkey", "o_custkey", ["cohort"], dim_rows=n_cust
    )

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        dt = df["o_orderdate"]
        ym = (dt.dt.year.to_numpy(np.int64) * 12 + dt.dt.month.to_numpy(np.int64)
              - 1)
        cents = to_cents(df["o_totalprice"].to_numpy())
        g = (
            pd.DataFrame(
                {
                    "cohort_month": df["cohort"].to_numpy(np.int64),
                    "k": ym - df["cohort"].to_numpy(np.int64),
                    "n_orders": np.ones(len(df), np.int64),
                    "rev_cents": cents,
                }
            )
            .groupby(["cohort_month", "k"], as_index=False)
            .agg(n_orders=("n_orders", "sum"), rev_cents=("rev_cents", "sum"))
        )
        return g

    cells = (
        bucketed_sum(
            withc.map_batches(cell_partial, batch_format="pandas"),
            ["cohort_month", "k"],
            ["n_orders", "rev_cents"],
        )
        .to_pandas()
        .sort_values(["cohort_month", "k"], kind="mergesort")
        .reset_index(drop=True)
    )
    import ray.data as rd

    if len(cells) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "cohort_month": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                    "rev_cents": pa.array([], pa.int64()),
                    "cum_rev_cents": pa.array([], pa.int64()),
                    "ltv_cents": pa.array([], pa.float64()),
                }
            )
        )
    cum = cells.groupby("cohort_month")["rev_cents"].cumsum().to_numpy(np.int64)
    ncust_col = sizes.reindex(cells["cohort_month"]).to_numpy(np.int64)
    ltv = cum.astype(np.float64) / ncust_col.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "cohort_month": pa.array(cells["cohort_month"].to_numpy(np.int64)),
                "k": pa.array(cells["k"].to_numpy(np.int64)),
                "n_customers": pa.array(ncust_col, pa.int64()),
                "n_orders": pa.array(cells["n_orders"].to_numpy(np.int64)),
                "rev_cents": pa.array(cells["rev_cents"].to_numpy(np.int64)),
                "cum_rev_cents": pa.array(cum, pa.int64()),
                "ltv_cents": pa.array(ltv, pa.float64()),
            }
        )
    )


def hhi_concentration(lineitem, supplier):
    """Herfindahl–Hirschman market-concentration index per nation —
    supplier-revenue concentration (10000·Σ share² in the antitrust
    convention; ≈10000/n when even, →10000 monopolized).

    Exactness: per-supplier revenue is the exact cent sum (bucketed
    two-phase reduce over raw lineitem — the only corpus-sized pass);
    the squared-cents sums run in PYTHON INTS on the supplier-bounded
    dimension table driver-side (the SQL twin uses HUGEINT), and the
    index is ONE pinned 10000·s2/(S·S) double chain.

    Output: (nation_key:int64, n_suppliers:int64, rev_cents:int64,
    hhi:f64), nations sorted.
    """
    import pandas as pd

    from ..state.money import to_cents
    from ..stages.zonal import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        cents = to_cents(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        )
        g = (
            pa.table(
                {
                    "l_suppkey": t.column("l_suppkey"),
                    "rev": pa.array(cents, pa.int64()),
                }
            )
            .group_by(["l_suppkey"])
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["l_suppkey", "rev"])

    per_supp = bucketed_sum(
        lineitem.select_columns(["l_suppkey", "l_extendedprice"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["l_suppkey"],
        ["rev"],
    ).to_pandas()  # |suppliers|-bounded dimension table
    sdim = supplier.select_columns(["s_suppkey", "s_nationkey"]).to_pandas()
    import ray.data as rd

    empty = pa.table(
        {
            "nation_key": pa.array([], pa.int64()),
            "n_suppliers": pa.array([], pa.int64()),
            "rev_cents": pa.array([], pa.int64()),
            "hhi": pa.array([], pa.float64()),
        }
    )
    if len(per_supp) == 0:
        return rd.from_arrow(empty)
    m = per_supp.merge(
        sdim, left_on="l_suppkey", right_on="s_suppkey", how="inner"
    )
    rows = []
    for nk, g in m.groupby("s_nationkey"):
        revs = [int(v) for v in g["rev"].tolist()]
        S = sum(revs)
        s2 = sum(v * v for v in revs)  # python ints — no overflow ever
        hhi = 10000.0 * float(s2) / (float(S) * float(S))
        rows.append((int(nk), len(revs), S, hhi))
    rows.sort()
    return rd.from_arrow(
        pa.table(
            {
                "nation_key": pa.array([r[0] for r in rows], pa.int64()),
                "n_suppliers": pa.array([r[1] for r in rows], pa.int64()),
                "rev_cents": pa.array([r[2] for r in rows], pa.int64()),
                "hhi": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


def new_vs_returning(orders):
    """New-vs-returning revenue split per calendar month — the growth
    dashboard's acquisition/retention decomposition: an order is NEW iff
    it falls in its customer's first-order month, RETURNING otherwise.

    Rides the :func:`cohort_ltv` machinery (bucketed per-customer
    min-month reduce + size-guarded cohort attach); per-month cells are
    exact counts/cents and the only double is the pinned
    new_rev/(new_rev+ret_rev) share.

    Output: (month:int64, n_new:int64, n_ret:int64, new_rev_cents:int64,
    ret_rev_cents:int64, new_share:f64), months sorted.
    """
    import pandas as pd

    from ..state.money import to_cents
    from ..stages.joins import attach_dim
    from ..stages.zonal import bucketed_combine, bucketed_sum

    def month_partial(df: pd.DataFrame) -> pd.DataFrame:
        dt = df["o_orderdate"]
        ym = (dt.dt.year.to_numpy(np.int64) * 12 + dt.dt.month.to_numpy(np.int64)
              - 1)
        return (
            pd.DataFrame(
                {"o_custkey": df["o_custkey"].to_numpy(np.int64), "cohort": ym}
            )
            .groupby("o_custkey", as_index=False)
            .agg(cohort=("cohort", "min"))
        )

    proj = orders.select_columns(["o_custkey", "o_orderdate", "o_totalprice"])
    first = bucketed_combine(
        proj.map_batches(month_partial, batch_format="pandas"),
        ["o_custkey"],
        {"cohort": "min"},
    ).materialize()
    withc = attach_dim(
        proj, first, "o_custkey", "o_custkey", ["cohort"],
        dim_rows=first.count(),
    )

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        dt = df["o_orderdate"]
        ym = (dt.dt.year.to_numpy(np.int64) * 12 + dt.dt.month.to_numpy(np.int64)
              - 1)
        cents = to_cents(df["o_totalprice"].to_numpy())
        is_new = (ym == df["cohort"].to_numpy(np.int64)).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "month": ym,
                    "n_new": is_new,
                    "n_ret": np.int64(1) - is_new,
                    "new_rev_cents": cents * is_new,
                    "ret_rev_cents": cents * (np.int64(1) - is_new),
                }
            )
            .groupby("month", as_index=False)
            .sum()
        )

    cells = (
        bucketed_sum(
            withc.map_batches(cell_partial, batch_format="pandas"),
            ["month"],
            ["n_new", "n_ret", "new_rev_cents", "ret_rev_cents"],
        )
        .to_pandas()
        .sort_values("month", kind="mergesort")
        .reset_index(drop=True)
    )
    import ray.data as rd

    nr = cells["new_rev_cents"].to_numpy(np.int64)
    rr = cells["ret_rev_cents"].to_numpy(np.int64)
    share = nr.astype(np.float64) / (nr + rr).astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "month": pa.array(cells["month"].to_numpy(np.int64)),
                "n_new": pa.array(cells["n_new"].to_numpy(np.int64)),
                "n_ret": pa.array(cells["n_ret"].to_numpy(np.int64)),
                "new_rev_cents": pa.array(nr, pa.int64()),
                "ret_rev_cents": pa.array(rr, pa.int64()),
                "new_share": pa.array(share, pa.float64()),
            }
        )
    )


def return_rates(lineitem, part):
    """Return-rate report per part brand — the retail quality metric
    (which brands come back): per brand, line counts, returned-line
    counts (``l_returnflag = 'R'``), returned revenue, and the pinned
    return-rate and revenue-at-risk shares.

    One corpus pass of per-batch (partkey → brand via the size-guarded
    dimension broadcast) conditional integer partials; the report is
    |brands|-bounded.

    Output: (p_brand:string, n_lines:int64, n_returned:int64,
    rev_cents:int64, ret_cents:int64, return_rate:f64, ret_share:f64),
    brands sorted.
    """
    import pandas as pd

    from ..state.money import to_cents
    from ..stages.joins import attach_dim
    from ..stages.zonal import bucketed_sum

    dim = part.select_columns(["p_partkey", "p_brand"])
    li = lineitem.select_columns(
        ["l_partkey", "l_returnflag", "l_extendedprice"]
    )
    withb = attach_dim(li, dim, "l_partkey", "p_partkey", ["p_brand"])

    def partial(t: pa.Table) -> pa.Table:
        cents = to_cents(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        )
        ret = pc.equal(t.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "p_brand": t.column("p_brand"),
                    "n_lines": pa.array(np.ones(len(ret), np.int64)),
                    "n_returned": pa.array(ret),
                    "rev_cents": pa.array(cents, pa.int64()),
                    "ret_cents": pa.array(cents * ret, pa.int64()),
                }
            )
            .group_by(["p_brand"])
            .aggregate(
                [("n_lines", "sum"), ("n_returned", "sum"),
                 ("rev_cents", "sum"), ("ret_cents", "sum")]
            )
        )
        return g.rename_columns(
            ["p_brand", "n_lines", "n_returned", "rev_cents", "ret_cents"]
        )

    rep = (
        bucketed_sum(
            withb.map_batches(partial, batch_format="pyarrow"),
            ["p_brand"],
            ["n_lines", "n_returned", "rev_cents", "ret_cents"],
        )
        .to_pandas()
        .sort_values("p_brand", kind="mergesort")
        .reset_index(drop=True)
    )
    import ray.data as rd

    nl = rep["n_lines"].to_numpy(np.int64)
    nr = rep["n_returned"].to_numpy(np.int64)
    rv = rep["rev_cents"].to_numpy(np.int64)
    rc = rep["ret_cents"].to_numpy(np.int64)
    rate = nr.astype(np.float64) / nl.astype(np.float64)
    share = rc.astype(np.float64) / rv.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "p_brand": pa.array(rep["p_brand"].astype(str).tolist()),
                "n_lines": pa.array(nl, pa.int64()),
                "n_returned": pa.array(nr, pa.int64()),
                "rev_cents": pa.array(rv, pa.int64()),
                "ret_cents": pa.array(rc, pa.int64()),
                "return_rate": pa.array(rate, pa.float64()),
                "ret_share": pa.array(share, pa.float64()),
            }
        )
    )


def revenue_deciles(orders):
    """Customer revenue concentration by decile — the Lorenz-curve table
    behind "top 10 % of customers drive X % of revenue": customers rank
    by exact cent revenue (ties to the smaller key), split into 10
    nearest-rank deciles (decile = ⌊10·(rank−1)/n⌋ — pure integers), and
    each decile reports counts, revenue and the pinned share.

    The raw pass is one bucketed per-customer cent reduce; ranking runs
    on the customer-bounded dimension table.

    Output: (decile:int64, rev_cents:int64, share:f64), decile 0 =
    highest-revenue customers (decile sizes are equal by construction
    ±1, so a count column would be degenerate).
    """
    import pandas as pd

    from ..state.money import to_cents
    from ..stages.zonal import bucketed_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "o_custkey": df["o_custkey"].to_numpy(np.int64),
                    "rev": to_cents(df["o_totalprice"].to_numpy()),
                }
            )
            .groupby("o_custkey", as_index=False)["rev"]
            .sum()
        )

    per_cust = (
        bucketed_sum(
            orders.select_columns(["o_custkey", "o_totalprice"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["o_custkey"],
            ["rev"],
        )
        .to_pandas()  # customer-bounded dimension table
    )
    import ray.data as rd

    empty = pa.table(
        {
            "decile": pa.array([], pa.int64()),
            "rev_cents": pa.array([], pa.int64()),
            "share": pa.array([], pa.float64()),
        }
    )
    if len(per_cust) == 0:
        return rd.from_arrow(empty)
    per_cust = per_cust.sort_values(
        ["rev", "o_custkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    n = len(per_cust)
    rank = np.arange(n, dtype=np.int64)  # 0-based = rank-1
    decile = (10 * rank) // n
    rev = per_cust["rev"].to_numpy(np.int64)
    g = (
        pd.DataFrame({"decile": decile, "rev_cents": rev})
        .groupby("decile", as_index=False)
        .sum()
    )
    total = int(rev.sum())
    share = g["rev_cents"].to_numpy(np.int64).astype(np.float64) / np.float64(total)
    return rd.from_arrow(
        pa.table(
            {
                "decile": pa.array(g["decile"].to_numpy(np.int64)),
                "rev_cents": pa.array(g["rev_cents"].to_numpy(np.int64)),
                "share": pa.array(share, pa.float64()),
            }
        )
    )
