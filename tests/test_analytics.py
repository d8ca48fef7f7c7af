"""Relational analytics semantics: semi-join multiplicity + join-window
classification (the TPC-H-shaped pipelines are otherwise certified by the
driver gate's SQL value-checks)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kaza_lcms_ray.pipelines import analytics


def _ds(df: pd.DataFrame):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_order_priority_semi_join_multiplicity(ray_session):
    # order 1 has THREE returned lines: must still count once (semi, not inner)
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 2, 3],
                "l_returnflag": ["R", "R", "R", "N", "R"],
            }
        )
    )
    orders = _ds(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_orderdate": pd.to_datetime(
                    ["1996-02-01", "1996-02-02", "1995-01-01", "1996-03-01"]
                ),
                "o_orderpriority": ["1-URGENT", "1-URGENT", "1-URGENT", "5-LOW"],
            }
        )
    )
    out = (
        analytics.order_priority_check(lineitem, orders)
        .to_pandas()
        .set_index("o_orderpriority")["order_count"]
    )
    # order 3 returned but outside window; order 4 in window but no 'R' line;
    # order 2 in window, flag N -> excluded
    assert out.to_dict() == {"1-URGENT": 1}


def test_priority_share_window_and_classification(ray_session):
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2, 3],
                "l_returnflag": ["A", "A", "N", "A"],
                "l_shipdate": pd.to_datetime(
                    ["1996-05-01", "1996-06-01", "1996-07-01", "1999-01-01"]
                ),
            }
        )
    )
    orders = _ds(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],
                "o_orderpriority": ["2-HIGH", "3-MEDIUM", "1-URGENT"],
            }
        )
    )
    out = (
        analytics.returnflag_priority_share(lineitem, orders)
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    # flag A: two high lines (order 1); the 1999 line is outside the window
    # flag N: one low line (order 2, 3-MEDIUM)
    assert out["l_returnflag"].tolist() == ["A", "N"]
    assert out["high_count"].tolist() == [2, 0]
    assert out["low_count"].tolist() == [0, 1]


def test_sales_opportunity_anti_join_and_threshold(ray_session):
    customer = _ds(
        pd.DataFrame(
            {
                "c_custkey": [1, 2, 3, 4],
                # positive-balance avg over (100, 300, 200) = 200
                "c_acctbal": [100.0, 300.0, 200.0, -50.0],
                "c_mktsegment": ["A", "A", "B", "B"],
            }
        )
    )
    orders = _ds(
        pd.DataFrame(
            {
                "o_custkey": [3, 3, 1],
                "o_orderdate": pd.to_datetime(
                    ["2000-06-01", "1998-01-01", "2000-07-01"]
                ),
            }
        )
    )
    out = analytics.global_sales_opportunity(customer, orders).to_pandas()
    # only cust 2 qualifies: bal 300 > avg 200 and no recent order
    # (cust 3 has bal 200 == avg -> strict > excludes; also has recent order)
    assert out.to_dict("records") == [
        {"c_mktsegment": "A", "numcust": 1, "totacctbal_cents": 30000}
    ]


def test_revenue_rollup_levels_are_consistent(ray_session):
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_returnflag": ["A", "A", "N"],
                "l_linestatus": ["F", "O", "O"],
                "l_extendedprice": [100.0, 200.0, 50.0],
                "l_discount": [0.10, 0.00, 0.50],
            }
        )
    )
    out = analytics.revenue_rollup(lineitem)
    tot = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    a = out[(out.l_returnflag == "A") & (out.l_linestatus == "ALL")]
    base = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    assert len(out) == 3 + 2 + 1
    assert tot["n"].iloc[0] == 3
    assert a["n"].iloc[0] == 2
    # rollup totals equal the sum of their children
    assert tot["revenue_scaled"].iloc[0] == base["revenue_scaled"].sum()
    assert (
        a["revenue_scaled"].iloc[0]
        == base[base.l_returnflag == "A"]["revenue_scaled"].sum()
    )
    # exact integer: 100.00*90 + 200.00*100 scaled cents
    assert a["revenue_scaled"].iloc[0] == 10000 * 90 + 20000 * 100


def test_theilsen_median_slope(ray_session, synth_small):
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, zonal

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = zonal.theilsen_trend(geo, band=3).to_pandas()
    assert len(got) > 0
    # the reported slope is exactly num/den of the chosen pair
    s = got["slope_num"].to_numpy(np.float64) / got["slope_den"].to_numpy(
        np.float64
    )
    assert got["theil_slope"].to_numpy().tobytes() == s.tobytes()
    # brute-force one cell
    df_all = geo.to_pandas()
    cid = int(got["cell_id"].iloc[0])
    from kaza_lcms_ray.state.cells import CELL_LEVEL, encode

    df_all["cell_id"] = encode(
        df_all["lon"].to_numpy(), df_all["lat"].to_numpy(), CELL_LEVEL
    )
    one = df_all[df_all["cell_id"] == cid]
    import numpy as _np

    yearly = (
        one.assign(c3=_np.round(one["b3"] * 100).astype(_np.int64))
        .groupby("year")["c3"]
        .sum()
        .sort_index()
    )
    x = yearly.index.to_numpy(_np.int64)
    v = yearly.to_numpy(_np.int64)
    ii, jj = _np.triu_indices(len(x), 1)
    dy, dx = v[jj] - v[ii], x[jj] - x[ii]
    ratio = dy.astype(_np.float64) / dx.astype(_np.float64)
    order = _np.lexsort((dx, dy, ratio))
    pick = order[(len(order) - 1) // 2]
    row = got[got.cell_id == cid].iloc[0]
    assert (row["slope_num"], row["slope_den"]) == (dy[pick], dx[pick])


def test_product_profit_filters_and_joins(ray_session):
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2],
                "l_partkey": [10, 11, 10],
                "l_suppkey": [100, 100, 101],
                "l_extendedprice": [100.0, 100.0, 10.0],
                "l_discount": [0.0, 0.0, 0.5],
                "l_quantity": [1.0, 1.0, 2.0],
            }
        )
    )
    orders = _ds(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2],
                "o_orderdate": pd.to_datetime(["1996-03-01", "1997-04-01"]),
            }
        )
    )
    part = _ds(
        pd.DataFrame(
            {
                "p_partkey": [10, 11],
                "p_name": ["red bolt", "blue bolt"],  # only part 10 matches
                "p_retailprice": [50.0, 50.0],
            }
        )
    )
    supplier = _ds(
        pd.DataFrame({"s_suppkey": [100, 101], "s_nationkey": [1, 2]})
    )
    nation = _ds(
        pd.DataFrame(
            {"n_nationkey": pd.array([1, 2], dtype="int32"),
             "n_name": ["KENYA", "PERU"]}
        )
    )
    out = (
        analytics.product_profit(lineitem, orders, part, supplier, nation)
        .to_pandas()
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )
    # KENYA 1996: rev 10000*100, cost 5000*100 -> 500000
    # PERU 1997: rev 1000*50=50000, cost 5000*200=1000000 -> -950000
    assert out.to_dict("records") == [
        {"n_name": "KENYA", "o_year": 1996, "profit_scaled": 500000},
        {"n_name": "PERU", "o_year": 1997, "profit_scaled": -950000},
    ]


def test_customer_distribution_zero_bucket_and_filter(ray_session):
    # cust 10: two kept orders; cust 20: only an excluded-status order
    # (counts as ZERO, not dropped); cust 30: no orders at all
    orders = _ds(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],
                "o_custkey": [10, 10, 20],
                "o_orderstatus": ["O", "P", "F"],
            }
        )
    )
    customer = _ds(pd.DataFrame({"c_custkey": [10, 20, 30]}))
    out = analytics.customer_distribution(orders, customer).to_pandas()
    got = dict(zip(out["c_count"], out["custdist"]))
    assert got == {2: 1, 0: 2}


def test_small_quantity_revenue_integer_threshold(ray_session):
    # part 1 (brand B): qties 10,10,10,1 -> sum_c=3100, cnt=4; a line
    # qualifies iff q_c*5*4 < 3100 i.e. q_c < 155 -> only the qty-1 line.
    # part 2 is another brand: its tiny line must NOT count.
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_partkey": [1, 1, 1, 1, 2],
                "l_quantity": [10.0, 10.0, 10.0, 1.0, 1.0],
                "l_extendedprice": [100.0, 100.0, 100.0, 7.0, 9.0],
            }
        )
    )
    part = _ds(
        pd.DataFrame({"p_partkey": [1, 2], "p_brand": ["Brand#13", "Brand#99"]})
    )
    out = analytics.small_quantity_revenue(lineitem, part).to_pandas()
    assert out["avg_yearly"].iloc[0] == 700.0 / 700.0  # 7.00 -> cents/700


def test_supplier_part_counts_distinct_and_filters(ray_session):
    # supplier 5 supplies part 1 via THREE lines -> counted once; supplier
    # 6 has negative balance -> excluded; part 2 is brand-excluded
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_partkey": [1, 1, 1, 1, 2],
                "l_suppkey": [5, 5, 5, 6, 5],
            }
        )
    )
    part = _ds(
        pd.DataFrame(
            {
                "p_partkey": [1, 2],
                "p_brand": ["Brand#1", "Brand#15"],
                "p_type": ["STANDARD", "STANDARD"],
                "p_size": [3, 3],
            }
        )
    )
    supplier = _ds(
        pd.DataFrame({"s_suppkey": [5, 6], "s_acctbal": [10.0, -1.0]})
    )
    out = analytics.supplier_part_counts(lineitem, part, supplier).to_pandas()
    assert len(out) == 1
    assert out["supplier_cnt"].iloc[0] == 1
    assert out["p_brand"].iloc[0] == "Brand#1"


def test_important_parts_threshold_is_strict(ray_session):
    # nation N's suppliers: 7, 8.  part 1 value 999_00 of total 1000_00
    # -> 99900*1000 > 100000*999 is FALSE at frac 999/1000 (strict), so
    # only a fraction below keeps it
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_partkey": [1, 2],
                "l_suppkey": [7, 8],
                "l_extendedprice": [999.0, 1.0],
            }
        )
    )
    supplier = _ds(
        pd.DataFrame({"s_suppkey": [7, 8], "s_nationkey": [3, 3]})
    )
    nation = _ds(pd.DataFrame({"n_nationkey": [3], "n_name": ["NATION_3"]}))
    strict = analytics.important_parts(
        lineitem, supplier, nation, frac_num=999, frac_den=1000
    ).to_pandas()
    assert len(strict) == 0  # (empty to_pandas loses column names)
    loose = analytics.important_parts(
        lineitem, supplier, nation, frac_num=1, frac_den=2
    ).to_pandas()
    assert loose["l_partkey"].tolist() == [1]
    assert loose["value"].tolist() == [999.0]


def test_part_skyline_dominance_and_reshard(ray_session):
    # frontier: (100, 9), (200, 12) and BOTH copies of the duplicate
    # frontier point (100, 9); (150, 9) loses to (100, 9); (100, 5)
    # loses within its own price group; (300, 12) loses to (200, 12)
    df = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4, 5, 6],
            "p_retailprice": [1.00, 2.00, 1.50, 1.00, 3.00, 1.00],
            "p_size": [9, 12, 9, 5, 12, 9],
        }
    )
    for nblocks in (1, 3):
        out = (
            analytics.part_skyline(_ds(df).repartition(nblocks))
            .to_pandas()
            .sort_values("p_partkey")
            .reset_index(drop=True)
        )
        assert out["p_partkey"].tolist() == [1, 2, 6]
        assert out["price_c"].tolist() == [100, 200, 100]
        assert out["p_size"].tolist() == [9, 12, 9]


def test_min_unit_price_keeps_all_ties(ray_session):
    # part 1: suppliers 5 and 6 BOTH hit unit 1000 milli (1.00/unit);
    # supplier 7 is pricier.  supplier 5 hits it twice -> one row.
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_partkey": [1, 1, 1, 1, 2],
                "l_suppkey": [5, 5, 6, 7, 5],
                "l_extendedprice": [10.0, 20.0, 30.0, 50.0, 8.0],
                "l_quantity": [10.0, 20.0, 30.0, 10.0, 2.0],
            }
        )
    )
    supplier = _ds(
        pd.DataFrame(
            {"s_suppkey": [5, 6, 7], "s_name": ["S5", "S6", "S7"]}
        )
    )
    out = (
        analytics.min_unit_price_suppliers(lineitem, supplier)
        .to_pandas()
        .sort_values(["l_partkey", "l_suppkey"])
        .reset_index(drop=True)
    )
    got = list(
        zip(out["l_partkey"], out["l_suppkey"], out["s_name"], out["unit_milli"])
    )
    assert got == [(1, 5, "S5", 1000), (1, 6, "S6", 1000), (2, 5, "S5", 4000)]


def test_waiting_suppliers_unique_latest_rule(ray_session):
    # order 1: suppliers 10,20 — 20 strictly latest -> counts for 20
    # order 2: suppliers 10,20 — TIE at the max -> nobody counts
    # order 3: single supplier 10 -> excluded (no other supplier exists)
    # order 4: like order 1 but o_orderstatus != 'F' -> excluded
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 2, 2, 3, 4, 4],
                "l_suppkey": [10, 20, 20, 10, 20, 10, 10, 20],
                "l_shipdate": pd.to_datetime(
                    [
                        "1996-01-01", "1996-02-01", "1996-01-15",
                        "1996-03-01", "1996-03-01",
                        "1996-01-01",
                        "1996-01-01", "1996-02-01",
                    ]
                ),
            }
        )
    )
    orders = _ds(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_orderstatus": ["F", "F", "F", "O"],
            }
        )
    )
    supplier = _ds(
        pd.DataFrame({"s_suppkey": [10, 20], "s_name": ["S10", "S20"]})
    )
    out = analytics.waiting_suppliers(lineitem, orders, supplier).to_pandas()
    assert out.set_index("s_name")["numwait"].to_dict() == {"S20": 1}


def test_dominant_supplier_parts_half_threshold(ray_session):
    # part 1: supp 10 ships 60, supp 20 ships 40 -> 10 dominates (120 > 100)
    # part 2: 50/50 split -> nobody dominates (2*50 == 100, not >)
    # part 3: outside the window -> ignored
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_partkey": [1, 1, 2, 2, 3],
                "l_suppkey": [10, 20, 10, 20, 10],
                "l_quantity": [60.0, 40.0, 50.0, 50.0, 99.0],
                "l_shipdate": pd.to_datetime(
                    ["1996-05-01", "1996-06-01", "1996-05-01",
                     "1996-05-02", "1999-01-01"]
                ),
            }
        )
    )
    supplier = _ds(
        pd.DataFrame({"s_suppkey": [10, 20], "s_name": ["S10", "S20"]})
    )
    out = analytics.dominant_supplier_parts(lineitem, supplier).to_pandas()
    assert out.set_index("s_name")["n_parts"].to_dict() == {"S10": 1}


def test_disjunctive_revenue_or_groups(ray_session):
    # line 1 matches group 1 (Brand#12, qty 5, size 3); line 2 fails every
    # group (brand matches group 2 but size 20 > 10); line 3 matches group 3.
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_partkey": [1, 2, 3],
                "l_quantity": [5.0, 15.0, 25.0],
                "l_extendedprice": [10.0, 100.0, 20.0],
                "l_discount": [0.0, 0.0, 0.5],
            }
        )
    )
    part = _ds(
        pd.DataFrame(
            {
                "p_partkey": [1, 2, 3],
                "p_brand": ["Brand#12", "Brand#23", "Brand#14"],
                "p_size": [3, 20, 15],
            }
        )
    )
    out = analytics.disjunctive_revenue(lineitem, part).to_pandas()
    # rev4 = 1000*100 + 2000*50 = 200000
    assert out["revenue4"].tolist() == [200000]
    assert out["n_lines"].tolist() == [2]


def test_market_share_year_fraction(ray_session):
    # region AFRICA = nations {0}; target nation NATION_0 (key 0).
    # 1996: order 1 (cust in region): lines rev 100 (supp of nation 0)
    #       + 300 (supp of nation 1) -> share 0.25
    # order 2's customer outside the region -> excluded entirely.
    lineitem = _ds(
        pd.DataFrame(
            {
                "l_orderkey": [1, 1, 2],
                "l_suppkey": [10, 20, 10],
                "l_extendedprice": [1.0, 3.0, 7.0],
                "l_discount": [0.0, 0.0, 0.0],
            }
        )
    )
    orders = _ds(
        pd.DataFrame(
            {
                "o_orderkey": [1, 2],
                "o_custkey": [100, 200],
                "o_orderdate": pd.to_datetime(["1996-04-01", "1996-05-01"]),
            }
        )
    )
    customer = _ds(pd.DataFrame({"c_custkey": [100, 200], "c_nationkey": [0, 1]}))
    supplier = _ds(pd.DataFrame({"s_suppkey": [10, 20], "s_nationkey": [0, 1]}))
    nation = _ds(
        pd.DataFrame(
            {
                "n_nationkey": [0, 1],
                "n_name": ["NATION_0", "NATION_1"],
                "n_regionkey": [0, 1],
            }
        )
    )
    region = _ds(
        pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["AFRICA", "AMERICA"]})
    )
    out = analytics.market_share(
        lineitem, orders, customer, supplier, nation, region,
        target_nation="NATION_0", target_region="AFRICA",
    ).to_pandas()
    assert out["o_year"].tolist() == [1996]
    assert out["num_rev4"].tolist() == [100 * 100]
    assert out["den_rev4"].tolist() == [400 * 100]
    assert out["mkt_share"].tolist() == [0.25]


def test_top_revenue_suppliers_exact_ties_and_window(ray_session):
    """Two suppliers with bit-identical integer revenue both win; a line
    outside the shipdate window is excluded."""
    import pandas as pd

    from kaza_lcms_ray.pipelines import analytics

    lineitem = _ds(
        pd.DataFrame(
            {
                "l_suppkey": [10, 20, 20, 30, 10],
                "l_shipdate": pd.to_datetime(
                    [
                        "1996-01-15",
                        "1996-02-01",
                        "1996-03-31",
                        "1996-02-10",
                        "1996-04-01",  # outside [from, to)
                    ]
                ),
                "l_extendedprice": [200.0, 150.0, 50.0, 100.0, 999.0],
                "l_discount": [0.0, 0.0, 0.0, 0.05, 0.0],
            }
        )
    )
    supplier = _ds(
        pd.DataFrame(
            {"s_suppkey": [10, 20, 30], "s_name": ["SUP_A", "SUP_B", "SUP_C"]}
        )
    )
    out = (
        analytics.top_revenue_suppliers(lineitem, supplier)
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    # 10: 20000*100 = 2_000_000 ; 20: (15000+5000)*100 = 2_000_000 (tie)
    # 30: 10000*95 = 950_000 ; the 1996-04-01 line is out of window
    assert out["s_suppkey"].tolist() == [10, 20]
    assert out["s_name"].tolist() == ["SUP_A", "SUP_B"]
    assert out["total_rev_c"].tolist() == [2_000_000, 2_000_000]


def test_k_anonymity_hand_case(ray_session):
    """Band rule floors correctly for negative balances and the histogram
    counts classes and rows exactly."""
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    cust = pd.DataFrame(
        {
            "c_nationkey": [1, 1, 1, 2, 2, 3],
            "c_mktsegment": ["A", "A", "A", "A", "A", "B"],
            # bands (cents+1e5)//1e5: -500.00 -> 0; 10.00 -> 1; 999.99 -> 1;
            # 1000.00 -> 2
            "c_acctbal": [-500.0, 10.0, 999.99, 10.0, 1000.0, 10.0],
        }
    )
    out = (
        analytics.k_anonymity(rd.from_pandas(cust).repartition(3))
        .to_pandas()
        .sort_values("class_size")
        .reset_index(drop=True)
    )
    # classes: (1,A,0):1  (1,A,1):2  (2,A,1):1  (2,A,2):1  (3,B,1):1
    assert out[out["class_size"] == 1]["n_classes"].iloc[0] == 4
    assert out[out["class_size"] == 1]["n_rows"].iloc[0] == 4
    assert out[out["class_size"] == 2]["n_classes"].iloc[0] == 1
    assert out[out["class_size"] == 2]["n_rows"].iloc[0] == 2
    assert len(out) == 2


def test_fk_audit_counts_orphans(ray_session):
    """Orphan rows/keys counted exactly under the derived %-mod rule;
    intact keys contribute zero."""
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    M = analytics.FK_ORPHAN_MOD
    customer = pd.DataFrame({"c_custkey": [M, M + 1, M + 2]})  # M vanishes
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            # two orders point at the vanished parent M, one at a key
            # that never existed
            "o_custkey": [M, M, M + 1, 999],
        }
    )
    lineitem = pd.DataFrame({"l_orderkey": [1, 1, 2, 4 * M]})
    # lineitem parents = orders keys {1..4} minus multiples of M;
    # 4*M's parent check: orderkey 4*M not in orders at all
    out = (
        analytics.fk_audit(
            rd.from_pandas(orders),
            rd.from_pandas(customer),
            rd.from_pandas(lineitem),
        )
        .to_pandas()
        .set_index("relation")
    )
    oc = out.loc["orders->customer"]
    assert oc["n_rows"] == 4
    assert oc["n_orphan_rows"] == 3  # two at M + one at 999
    assert oc["n_orphan_keys"] == 2
    lo = out.loc["lineitem->orders"]
    assert lo["n_rows"] == 4
    assert lo["n_orphan_rows"] == 1  # the 4*M row
    assert lo["n_orphan_keys"] == 1


def test_basket_rules_hand_orders(ray_session):
    """Orders {1:[10,20,30], 2:[10,20], 3:[10]} (with a duplicate line
    to exercise the distinct): n=3, c={10:3, 20:2, 30:1}; pairs
    (10,20):2, (10,30):1, (20,30):1.  min_support=1 checks lift order
    and the (part_a, part_b) tie-break among equal lifts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    df = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 1, 1, 2, 2, 3], np.int64),
            "l_partkey": np.array([10, 20, 30, 10, 10, 20, 10], np.int64),
        }
    )
    out = analytics.basket_rules(rd.from_pandas(df), min_support=2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["part_a"], r["part_b"], r["c_ab"], r["c_a"], r["c_b"]) == (
        10, 20, 2, 3, 2,
    )
    assert r["lift"] == (3.0 * 2.0) / (3.0 * 2.0)
    allp = analytics.basket_rules(
        rd.from_pandas(df), min_support=1
    ).to_pandas()
    # (20,30) lift 1.5 first; then equal-lift (10,20) and (10,30) in
    # packed-pair order
    assert list(zip(allp["part_a"], allp["part_b"])) == [
        (20, 30), (10, 20), (10, 30),
    ]
    assert allp["lift"].iloc[0] == 1.5
    # reshard invariance
    allp2 = analytics.basket_rules(
        rd.from_pandas(df).repartition(4), min_support=1
    ).to_pandas()
    assert allp.equals(allp2)


def test_rfm_segments_hand_orders(ray_session):
    """Five customers, one order each with distinct dates/prices: each
    quintile gets exactly one customer, so scores are a permutation of
    1..5 in each dimension; frequency all 1 -> everyone scores f=5
    (cutoffs all 1, nothing exceeds them... nearest-rank: all values
    equal means every cutoff is 1 and every score is 1)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    df = pd.DataFrame(
        {
            "o_custkey": np.array([1, 2, 3, 4, 5], np.int64),
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03",
                 "2024-01-04", "2024-01-05"]
            ),
            "o_totalprice": [10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    out = (
        analytics.rfm_segments(rd.from_pandas(df))
        .to_pandas()
        .set_index("o_custkey")
        .sort_index()
    )
    # recency: cust 5 ordered last -> recency 0 -> r_score 5; cust 1 -> 1
    assert list(out["recency_days"]) == [4, 3, 2, 1, 0]
    assert list(out["r_score"]) == [1, 2, 3, 4, 5]
    # all frequencies equal 1 -> every cutoff = 1 -> nobody exceeds -> 1
    assert list(out["f_score"]) == [1, 1, 1, 1, 1]
    assert list(out["m_score"]) == [1, 2, 3, 4, 5]
    assert out.loc[5, "rfm"] == 515 and out.loc[1, "rfm"] == 111
    assert out.loc[5, "monetary_cents"] == 5000
    # reshard invariance
    out2 = (
        analytics.rfm_segments(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("o_custkey")
        .sort_index()
    )
    assert out.equals(out2)


def test_abc_parts_hand(ray_session):
    """Revenues 80, 15, 4, 1 (cents 8000/1500/400/100, total 10000):
    cum shares 80/95/99/100 % -> classes A, B, C, C (boundary parts land
    via cum*5 <= total*4 and cum*20 <= total*19 exactly)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    df = pd.DataFrame(
        {
            "l_partkey": np.array([1, 2, 3, 4], np.int64),
            "l_extendedprice": [80.0, 15.0, 4.0, 1.0],
        }
    )
    out = analytics.abc_parts(rd.from_pandas(df)).to_pandas()
    assert list(out["l_partkey"]) == [1, 2, 3, 4]
    assert list(out["cum_cents"]) == [8000, 9500, 9900, 10000]
    assert list(out["abc_class"]) == ["A", "B", "C", "C"]
    out2 = analytics.abc_parts(rd.from_pandas(df).repartition(3)).to_pandas()
    assert out.equals(out2)


def test_cohort_ltv_hand_orders(ray_session):
    """Two cohorts: cust 1&2 first order Jan-2024 (cohort), cust 3 in
    Feb; cust 1 re-orders in Feb (k=1).  Exact cents and the cumulative
    per-customer chain."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    df = pd.DataFrame(
        {
            "o_custkey": np.array([1, 2, 1, 3], np.int64),
            "o_orderdate": pd.to_datetime(
                ["2024-01-10", "2024-01-20", "2024-02-05", "2024-02-15"]
            ),
            "o_totalprice": [10.0, 20.0, 5.0, 7.5],
        }
    )
    out = analytics.cohort_ltv(rd.from_pandas(df)).to_pandas()
    jan = 2024 * 12 + 0
    feb = jan + 1
    rows = {(r.cohort_month, r.k): r for r in out.itertuples()}
    r0 = rows[(jan, 0)]
    assert (r0.n_customers, r0.n_orders, r0.rev_cents) == (2, 2, 3000)
    assert r0.cum_rev_cents == 3000 and r0.ltv_cents == 1500.0
    r1 = rows[(jan, 1)]
    assert (r1.n_orders, r1.rev_cents, r1.cum_rev_cents) == (1, 500, 3500)
    assert r1.ltv_cents == 1750.0
    rf = rows[(feb, 0)]
    assert (rf.n_customers, rf.rev_cents, rf.ltv_cents) == (1, 750, 750.0)
    out2 = analytics.cohort_ltv(rd.from_pandas(df).repartition(3)).to_pandas()
    assert out.equals(out2)


def test_hhi_hand_market(ray_session):
    """Nation 0: one supplier (monopoly, HHI = 10000); nation 1: two
    equal suppliers (HHI = 5000)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    li = pd.DataFrame(
        {
            "l_suppkey": np.array([10, 20, 21, 21], np.int64),
            "l_extendedprice": [100.0, 50.0, 25.0, 25.0],
        }
    )
    sup = pd.DataFrame(
        {
            "s_suppkey": np.array([10, 20, 21], np.int64),
            "s_nationkey": np.array([0, 1, 1], np.int64),
        }
    )
    out = (
        analytics.hhi_concentration(rd.from_pandas(li), rd.from_pandas(sup))
        .to_pandas()
        .set_index("nation_key")
    )
    assert out.loc[0, "hhi"] == 10000.0 and out.loc[0, "n_suppliers"] == 1
    assert out.loc[1, "hhi"] == 5000.0 and out.loc[1, "rev_cents"] == 10000


def test_new_vs_returning_hand(ray_session):
    """Jan: cust 1 & 2 first orders (all new); Feb: cust 1 returns and
    cust 3 is new - exact split and share."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    df = pd.DataFrame(
        {
            "o_custkey": np.array([1, 2, 1, 3], np.int64),
            "o_orderdate": pd.to_datetime(
                ["2024-01-10", "2024-01-20", "2024-02-05", "2024-02-15"]
            ),
            "o_totalprice": [10.0, 20.0, 5.0, 7.5],
        }
    )
    out = (
        analytics.new_vs_returning(rd.from_pandas(df))
        .to_pandas()
        .set_index("month")
    )
    jan, feb = 2024 * 12 + 0, 2024 * 12 + 1
    assert (out.loc[jan, "n_new"], out.loc[jan, "n_ret"]) == (2, 0)
    assert out.loc[jan, "new_share"] == 1.0
    assert (out.loc[feb, "n_new"], out.loc[feb, "n_ret"]) == (1, 1)
    assert out.loc[feb, "new_rev_cents"] == 750
    assert out.loc[feb, "ret_rev_cents"] == 500
    assert out.loc[feb, "new_share"] == 750.0 / 1250.0
    out2 = (
        analytics.new_vs_returning(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("month")
    )
    assert out.equals(out2)


def test_return_rates_hand(ray_session):
    """Brand A: 2 lines, 1 returned (rate .5); brand B: 1 line, none."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines import analytics

    li = pd.DataFrame(
        {
            "l_partkey": np.array([1, 1, 2], np.int64),
            "l_returnflag": ["R", "N", "N"],
            "l_extendedprice": [10.0, 30.0, 5.0],
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2], np.int64),
            "p_brand": ["A", "B"],
        }
    )
    out = (
        analytics.return_rates(rd.from_pandas(li), rd.from_pandas(part))
        .to_pandas()
        .set_index("p_brand")
    )
    assert out.loc["A", "n_lines"] == 2 and out.loc["A", "n_returned"] == 1
    assert out.loc["A", "return_rate"] == 0.5
    assert out.loc["A", "ret_cents"] == 1000 and out.loc["A", "rev_cents"] == 4000
    assert out.loc["A", "ret_share"] == 0.25
    assert out.loc["B", "n_returned"] == 0 and out.loc["B", "ret_share"] == 0.0
