"""Degeneracy scan: run every `queries()` entry at gate scale and flag
constant output columns.

A query can pass the rows+schema+hash gate while certifying only its no-op
path (round 4 found: a mask threshold on the wrong scale, an interval join
that never matched, dedup over an all-distinct corpus, SAR geometry flags
that could never trip).  This scan is the cheap detector: DEGEN = a result
with ≤1 row, or >3 rows with at least one constant column.  Constant
columns are not automatically bugs — single-row scalar reports are by
design — but every flag deserves a look.

Usage: python scripts/degen_scan.py [query ...]    # default: all
"""

import sys

import pandas as pd

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, ".")
import __ray_entry__ as e

SF = "/root/testdata/sf0.01"


def main():
    qs = e.queries()
    names = sys.argv[1:] or list(qs)
    n_flag = 0
    for name in names:
        try:
            res = qs[name](SF)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        except Exception as ex:
            print(f"ERR {name}: {type(ex).__name__}: {ex}", flush=True)
            n_flag += 1
            continue
        const = [c for c in df.columns if df[c].nunique(dropna=False) <= 1]
        degen = len(df) <= 1 or (const and len(df) > 3)
        if degen:
            n_flag += 1
        print(
            f"{'DEGEN' if degen else 'ok'} {name}: rows={len(df)} "
            f"const_cols={const}",
            flush=True,
        )
    print(f"{n_flag} flagged / {len(names)}")


if __name__ == "__main__":
    main()
