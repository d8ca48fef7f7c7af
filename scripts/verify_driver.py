"""Driver-contract verification harness (the /verify surface).

Reproduces the driver's correctness gate: run every `queries()` entry and
its `oracle_sql()` twin over /root/testdata/sf0.01, compare row count,
sorted-column schema and exact values.  Usage:

    python scripts/verify_driver.py [query ...]     # default: all
"""

import sys
import time

import numpy as np
import pandas as pd

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, ".")
import duckdb

import __ray_entry__ as e

SF = "/root/testdata/sf0.01"


def to_df(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    qs, sqls = e.queries(), e.oracle_sql()
    names = sys.argv[1:] or list(qs)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    n_pass = n_rows_only = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            ours = norm(to_df(qs[name](SF)))
        except Exception as ex:
            print(f"FAIL {name}: engine error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        t_eng = time.time() - t0
        if name not in sqls:
            print(f"rows-only {name}: {len(ours)} rows  ({t_eng:.1f}s)")
            n_rows_only += 1
            continue
        try:
            oracle = norm(con.sql(sqls[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        ok_rows = len(ours) == len(oracle)
        ok_schema = list(ours.columns) == list(oracle.columns)
        # The driver's value hash distinguishes int64 from float64 (DuckDB
        # HUGEINT lands as float64 in pandas) — an int-vs-float dtype split
        # between engine and oracle passed the old numeric compare but failed
        # the driver hash (r02: harmonic_year, training_split).  Treat a
        # kind mismatch across the int/float boundary as a hard failure.
        ok_dtype = True
        if ok_rows and ok_schema:
            for c in ours.columns:
                ka = ours[c].dtype.kind
                kb = oracle[c].dtype.kind
                if ("f" in (ka, kb)) and ka != kb and {ka, kb} & {"i", "u"}:
                    ok_dtype = False
                    print(f"  col {c} dtype kind mismatch: ours={ours[c].dtype} oracle={oracle[c].dtype}")
        ok_vals = False
        if ok_rows and ok_schema:
            ok_vals = True
            for c in ours.columns:
                a, b = ours[c].to_numpy(), oracle[c].to_numpy()
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    # byte-exact: a value-level hash (the driver's) sees the
                    # raw float64 bytes, so -0.0 vs 0.0 and NaN payload
                    # differences must fail here too, not just != values.
                    same = (
                        a.astype(np.float64).tobytes()
                        == b.astype(np.float64).tobytes()
                    )
                    if not same and (
                        (pd.isna(a) & pd.isna(b)) | (a.astype(np.float64) == b.astype(np.float64))
                    ).all():
                        print(f"  col {c}: values == but BYTES differ (-0.0 / NaN payload)")
                else:
                    same = (pd.Series(a).fillna("\0") == pd.Series(b).fillna("\0")).all()
                if not same:
                    ok_vals = False
                    bad = np.nonzero(
                        ~((pd.isna(a) & pd.isna(b)) | (pd.Series(a) == pd.Series(b)).to_numpy())
                    )[0][:3]
                    print(f"  col {c} mismatch rows {bad}: ours={a[bad]} oracle={b[bad]}")
        status = "PASS" if (ok_rows and ok_schema and ok_vals and ok_dtype) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(
            f"{status} {name}: rows {len(ours)}/{len(oracle)} schema_ok={ok_schema} "
            f"vals_ok={ok_vals}  (eng {t_eng:.1f}s + oracle {time.time()-t0-t_eng:.1f}s)"
        )
        if not ok_schema:
            print(f"  ours={list(ours.columns)}\n  oracle={list(oracle.columns)}")
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    rc = main()
    ray.shutdown()
    sys.exit(rc)
