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

from ray.data.aggregate import Count, Sum

PRICING_CUTOFF = "1998-09-02"


def _cents(col: pa.ChunkedArray) -> np.ndarray:
    v = col.to_numpy(zero_copy_only=False)
    return np.rint(v * 100.0).astype(np.int64)


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

    agg = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("q", alias_name="q"), Sum("p", alias_name="p"),
            Sum("d", alias_name="d"), Sum("dp", alias_name="dp"),
            Sum("ch", alias_name="ch"), Sum("n", alias_name="n"),
        )
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

    Partitioning plan for the 6-table shape: region/nation/supplier/customer
    are dimension tables (grow sub-linearly vs lineitem) — folded into ONE
    broadcast lookup each; orders is filtered by date and annotated with the
    customer nation inside ``map_batches``; lineitem is annotated with the
    supplier nation, filtered to the region, and pre-aggregated per
    (orderkey, supp_nation) — so the one big-big exchange, the hash
    Dataset.join on orderkey, moves pre-combined rows only.  Exact ×10⁴
    integer revenue throughout.
    """
    from ..runtime import join_partitions

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")

    nat = nation.to_pandas()
    reg = region.to_pandas()
    rk = reg.loc[reg["r_name"] == region_name, "r_regionkey"].to_numpy()
    nat_in = nat[nat["n_regionkey"].isin(rk)]
    nat_names = dict(zip(nat_in["n_nationkey"].astype(int), nat_in["n_name"]))
    sup = supplier.to_pandas()
    cus = customer.select_columns(["c_custkey", "c_nationkey"]).to_pandas()

    def lut(keys: np.ndarray, vals: np.ndarray):
        order = np.argsort(keys)
        return keys[order], vals[order]

    sk, sv = lut(
        sup["s_suppkey"].to_numpy(), sup["s_nationkey"].to_numpy().astype(np.int64)
    )
    ck, cv = lut(
        cus["c_custkey"].to_numpy(), cus["c_nationkey"].to_numpy().astype(np.int64)
    )
    side_ref = ray.put(
        {"sk": sk, "sv": sv, "ck": ck, "cv": cv, "nats": np.asarray(sorted(nat_names))}
    )

    def orders_f(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(t_from)),
            pc.less(t.column("o_orderdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        okey = t.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["ck"], okey)
        c_nat = side["cv"][np.clip(pos, 0, side["ck"].shape[0] - 1)]
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "c_nat": pa.array(c_nat),
            }
        )

    def li_partial(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        skey = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["sk"], skey)
        s_nat = side["sv"][np.clip(pos, 0, side["sk"].shape[0] - 1)]
        in_region = np.isin(s_nat, side["nats"])
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        tb = pa.table(
            {
                "l_orderkey": t.column("l_orderkey").take(
                    pa.array(np.nonzero(in_region)[0])
                ),
                "s_nat": pa.array(s_nat[in_region]),
                "rev": pa.array(rev[in_region]),
            }
        )
        return (
            tb.group_by(["l_orderkey", "s_nat"])
            .aggregate([("rev", "sum")])
            .rename_columns(["l_orderkey", "s_nat", "rev"])
        )

    li = (
        lineitem.map_batches(li_partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "s_nat"])
        .aggregate(Sum("rev", alias_name="rev"))
    )
    joined = li.join(
        orders.map_batches(orders_f, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=join_partitions(rows_hint=orders.count()),
        on=("l_orderkey",),
    )

    def local_only(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("s_nat"), t.column("c_nat"))
        t = t.filter(keep)
        return pa.table({"n_nationkey": t.column("s_nat"), "rev": t.column("rev")})

    per_nation = (
        joined.map_batches(local_only, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("rev", alias_name="revenue_scaled"))
        .to_pandas()
    )
    per_nation["n_name"] = per_nation["n_nationkey"].map(dict(nat_names))
    per_nation = per_nation.sort_values(
        ["revenue_scaled", "n_name"], ascending=[False, True], kind="mergesort"
    )
    return per_nation[["n_name", "revenue_scaled"]].reset_index(drop=True)


def promo_revenue(
    lineitem, part, date_from: str = "1996-09-01", date_to: str = "1996-10-01"
):
    """TPC-H Q14-shaped promotion revenue share: broadcast p_partkey →
    is-promo bitmap, one exact integer partial per block, single global
    combine, one double division at the end."""
    import pandas as pd

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")
    pt = part.select_columns(["p_partkey", "p_type"]).to_pandas()
    keys = pt["p_partkey"].to_numpy()
    promo = pt["p_type"].str.startswith("PROMO").to_numpy()
    order = np.argsort(keys)
    side_ref = ray.put({"keys": keys[order], "promo": promo[order]})

    def partial(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        keep = pc.and_(
            pc.greater_equal(t.column("l_shipdate"), pa.scalar(t_from)),
            pc.less(t.column("l_shipdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["keys"], pk)
        is_promo = side["promo"][np.clip(pos, 0, side["keys"].shape[0] - 1)]
        return pa.table(
            {
                "promo_rev": pa.array([int(rev[is_promo].sum())]),
                "total_rev": pa.array([int(rev.sum())]),
            }
        )

    agg = lineitem.map_batches(partial, batch_format="pyarrow").aggregate(
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
    from ..stages.joins import top_k

    cutoff_ts = np.datetime64(cutoff, "us")
    cust = customer.to_pandas()
    keys = np.sort(
        cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy()
    )
    keys_ref = ray.put(keys)

    def orders_f(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        keep = pc.and_(
            pc.less(t.column("o_orderdate"), pa.scalar(cutoff_ts)),
            pc.is_in(t.column("o_custkey"), value_set=pa.array(ks)),
        )
        t = t.filter(keep)
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

    rev_per_order = (
        lineitem.map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="revenue_scaled"))
    )
    # partition hint from the (metadata-only) orders count: the join keys
    # are order keys, so ≥10k rows/partition guards the empty-partition
    # ArrowInvalid in Ray 2.49 at small scale while still spreading at 100 TB
    joined = rev_per_order.join(
        orders.map_batches(orders_f, batch_format="pyarrow"),
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
    Q5: dims broadcast, lineitem pre-aggregated per (orderkey,
    supp-nation), one hash join on orderkey, nation-pair filter applied
    post-join where both sides are known."""
    from ..runtime import join_partitions

    t_from = np.datetime64(date_from, "us")
    t_to = np.datetime64(date_to, "us")
    nat = nation.to_pandas()
    keymap = dict(zip(nat["n_name"], nat["n_nationkey"].astype(int)))
    names = {v: k for k, v in keymap.items()}
    ka, kb = keymap[nation_a], keymap[nation_b]
    sup = supplier.to_pandas()
    cus = customer.select_columns(["c_custkey", "c_nationkey"]).to_pandas()

    def lut(keys, vals):
        o = np.argsort(keys)
        return keys[o], vals[o]

    sk, sv = lut(sup["s_suppkey"].to_numpy(), sup["s_nationkey"].to_numpy().astype(np.int64))
    ck, cv = lut(cus["c_custkey"].to_numpy(), cus["c_nationkey"].to_numpy().astype(np.int64))
    side_ref = ray.put({"sk": sk, "sv": sv, "ck": ck, "cv": cv})
    pair = np.array([ka, kb], dtype=np.int64)

    def orders_f(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        keep = pc.and_(
            pc.greater_equal(t.column("o_orderdate"), pa.scalar(t_from)),
            pc.less(t.column("o_orderdate"), pa.scalar(t_to)),
        )
        t = t.filter(keep)
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(side["ck"], cust), 0, side["ck"].shape[0] - 1)
        c_nat = side["cv"][pos]
        m = np.isin(c_nat, pair)
        idx = pa.array(np.nonzero(m)[0])
        yrs = (
            t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey").take(idx),
                "c_nat": pa.array(c_nat[m]),
                "l_year": pa.array(yrs[m]),
            }
        )

    def li_partial(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        skey = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(side["sk"], skey), 0, side["sk"].shape[0] - 1)
        s_nat = side["sv"][pos]
        m = np.isin(s_nat, pair)
        rev = _cents(t.column("l_extendedprice")) * (100 - _cents(t.column("l_discount")))
        tb = pa.table(
            {
                "l_orderkey": t.column("l_orderkey").take(pa.array(np.nonzero(m)[0])),
                "s_nat": pa.array(s_nat[m]),
                "rev": pa.array(rev[m]),
            }
        )
        return (
            tb.group_by(["l_orderkey", "s_nat"]).aggregate([("rev", "sum")]).rename_columns(
                ["l_orderkey", "s_nat", "rev"]
            )
        )

    li = (
        lineitem.map_batches(li_partial, batch_format="pyarrow")
        .groupby(["l_orderkey", "s_nat"])
        .aggregate(Sum("rev", alias_name="rev"))
    )
    joined = li.join(
        orders.map_batches(orders_f, batch_format="pyarrow"),
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

    out = (
        joined.map_batches(cross_only, batch_format="pyarrow")
        .groupby(["s_nat", "c_nat", "l_year"])
        .aggregate(Sum("rev", alias_name="revenue_scaled"))
        .to_pandas()
    )
    out["supp_nation"] = out["s_nat"].map(names)
    out["cust_nation"] = out["c_nat"].map(names)
    out = out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)
    return out[["supp_nation", "cust_nation", "l_year", "revenue_scaled"]]


def large_orders(lineitem, orders, customer, min_qty: float = 250.0):
    """TPC-H Q18-shaped large-order detection: HAVING-filtered exact
    aggregate (per-order quantity cents) + two broadcast dimension
    lookups (orderkey→custkey, custkey→name).  The filter runs on the
    pre-combined per-order rows, so only qualifying orders reach the
    lookup stage."""

    def partial(t: pa.Table) -> pa.Table:
        qty = _cents(t.column("l_quantity"))
        tb = pa.table({"l_orderkey": t.column("l_orderkey"), "q": pa.array(qty)})
        return (
            tb.group_by(["l_orderkey"]).aggregate([("q", "sum")]).rename_columns(
                ["l_orderkey", "qty_cents"]
            )
        )

    agg = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("qty_cents", alias_name="qty_cents"))
        .filter(expr=f"qty_cents > {int(min_qty * 100)}")
    )

    omap = orders.select_columns(["o_orderkey", "o_custkey"]).to_pandas()
    cmap = customer.select_columns(["c_custkey", "c_name"]).to_pandas()
    oorder = np.argsort(omap["o_orderkey"].to_numpy())
    corder = np.argsort(cmap["c_custkey"].to_numpy())
    side_ref = ray.put(
        {
            "ok": omap["o_orderkey"].to_numpy()[oorder],
            "oc": omap["o_custkey"].to_numpy()[oorder],
            "ck": cmap["c_custkey"].to_numpy()[corder],
            "cn": cmap["c_name"].to_numpy()[corder],
        }
    )

    def attach(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        keys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = np.clip(np.searchsorted(side["ok"], keys), 0, side["ok"].shape[0] - 1)
        cust = side["oc"][p]
        pc2 = np.clip(np.searchsorted(side["ck"], cust), 0, side["ck"].shape[0] - 1)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "o_custkey": pa.array(cust),
                "c_name": pa.array(side["cn"][pc2].astype(object), type=pa.string()),
                "qty_cents": t.column("qty_cents"),
            }
        )

    return agg.map_batches(attach, batch_format="pyarrow")


def top_customers_by_revenue(lineitem, orders, customer, k: int = 10):
    """Top-k customers by exact discounted revenue: lineitem → custkey via a
    broadcast orderkey→custkey lookup (orders ≪ lineitem), per-customer
    integer partial sums, tiny final top-k.  Returns a pandas DataFrame
    [c_custkey, c_name, revenue_scaled] (revenue_scaled = Σ price_c·(100−disc_c),
    exact int64; revenue = revenue_scaled / 1e4)."""
    omap = orders.select_columns(["o_orderkey", "o_custkey"]).to_pandas()
    okeys = omap["o_orderkey"].to_numpy()
    order = np.argsort(okeys)
    lookup_ref = ray.put(
        {"keys": okeys[order], "cust": omap["o_custkey"].to_numpy()[order]}
    )

    def partial(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(lk["keys"], ok)
        cust = lk["cust"][np.clip(pos, 0, lk["keys"].shape[0] - 1)]
        price = _cents(t.column("l_extendedprice"))
        disc = _cents(t.column("l_discount"))
        rev = price * (100 - disc)
        tb = pa.table({"c_custkey": pa.array(cust), "rev": pa.array(rev)})
        out = tb.group_by(["c_custkey"]).aggregate([("rev", "sum")])
        return out.rename_columns(["c_custkey", "rev"])

    agg = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Sum("rev", alias_name="revenue_scaled"))
    )
    top = agg.to_pandas().sort_values(
        ["revenue_scaled", "c_custkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    names = customer.select_columns(["c_custkey", "c_name"]).to_pandas()
    out = top.merge(names, on="c_custkey", how="left")
    return out[["c_custkey", "c_name", "revenue_scaled"]].reset_index(drop=True)
