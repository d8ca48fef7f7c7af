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
