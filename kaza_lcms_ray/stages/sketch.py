"""Deterministic HyperLogLog distinct-count sketch.

The decomposable cardinality estimator a 100 TB pipeline uses where an
exact `distinct` would shuffle every row: per-block register partials
(grouped MAX — order-free), one tiny combine (m ≤ 4096 rows regardless of
data size), a closed-form estimate on the driver.

Unlike library HLLs this one is *bit-deterministic and SQL-replayable*:
the row hash is the engine's splitmix64 chain, rho is derived by exact
power-of-two arithmetic (lowbit = r & −r; log2 of a power of two is exact
in float64, rounded to kill the last-ulp ambiguity), and the register
fold Σ 2^(64−reg) is an exact HUGEINT/python-int sum — so DuckDB
reproduces the ESTIMATE itself bit-for-bit, both the raw-HLL branch and
the linear-counting branch (ln is libm on both sides).

Standard constants: alpha_m = 0.7213 / (1 + 1.079/m) for m ≥ 128, with
the published small-m values below (Flajolet et al. 2007).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..state.hashing import _fnv1a, hash_key

HLL_SEED = 11
_K = 64  # scale exponent of the exact register fold


def alpha_m(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _row_hashes(col: pa.ChunkedArray, seed: int) -> np.ndarray:
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        keys = np.asarray([_fnv1a(s) for s in col.to_pylist()], dtype=np.uint64)
    else:
        keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return hash_key(seed, "hll", keys)


def rho_of(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """h → (bucket, rho).  bucket = low p bits; rho = 1 + trailing zeros of
    the remaining bits (rest == 0 → the max rank 65 − p)."""
    m = np.int64(1) << p
    bucket = (h & np.uint64(m - 1)).astype(np.int64)
    r = (h >> np.uint64(p)).astype(np.int64)  # < 2^58 for p ≥ 6: int64-safe
    lowbit = r & -r
    with np.errstate(divide="ignore"):
        rho = np.where(
            r > 0,
            np.rint(np.log2(np.maximum(lowbit, 1).astype(np.float64))).astype(np.int64)
            + 1,
            np.int64(65 - p),
        )
    return bucket, rho


def hll_registers(ds, col: str, p: int, seed: int = HLL_SEED):
    """Dataset → register Dataset[bucket, r] (≤ 2^p rows).  Two-phase:
    per-block grouped MAX partial, then one global grouped MAX."""
    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        h = _row_hashes(t.column(col), seed)
        bucket, rho = rho_of(h, p)
        tb = pa.table({"bucket": pa.array(bucket), "r": pa.array(rho)})
        return (
            tb.group_by(["bucket"]).aggregate([("r", "max")]).rename_columns(
                ["bucket", "r"]
            )
        )

    return (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("r", alias_name="r"))
    )


def estimate_from_registers(regs: dict[int, int], p: int) -> float:
    """Closed-form HLL estimate from {bucket: max rho}.  Exact arithmetic
    until the final divisions, mirrored term-for-term by the SQL oracle."""
    m = 1 << p
    S = 0  # Σ 2^(K − reg)  (python int — exact)
    for b in range(m):
        S += 1 << (_K - regs.get(b, 0))
    v_zero = m - len([b for b in regs if regs[b] > 0])
    e_raw = (alpha_m(m) * m * m * float(1 << _K)) / float(S)
    if v_zero > 0 and e_raw <= 2.5 * m:
        return m * math.log(m / float(v_zero))
    return e_raw


def hll_count(ds, col: str, p: int, seed: int = HLL_SEED) -> float:
    """Distinct-count estimate for ``ds[col]`` — the driver touches only
    the ≤ 2^p combined registers, never the data."""
    reg_df = hll_registers(ds, col, p, seed).to_pandas()
    regs = dict(zip(reg_df["bucket"].astype(int), reg_df["r"].astype(int)))
    return estimate_from_registers(regs, p)


def hll_sql(table_expr: str, col_expr: str, p: int, seed: int = HLL_SEED) -> str:
    """DuckDB replay of the full sketch: same hash chain, same rho, same
    exact register fold, same branch logic — returns a scalar subquery
    string yielding the identical double estimate."""
    from ..state import sqlhash as SH

    m = 1 << p
    prefix = SH.hash_key_prefix(seed, "hll")
    keyed = SH.chain_select(
        f"SELECT {col_expr} AS kx FROM {table_expr}",
        SH.splitmix_steps(SH.xor64(SH.hug(prefix), "kx"), "hh", "k1"),
    )
    a = repr(alpha_m(m) * m * m * float(1 << _K))
    return f"""(
        WITH regs AS (
            SELECT CAST(hh % {m} AS BIGINT) AS bucket,
                   MAX(CASE WHEN CAST(hh // {m} AS BIGINT) > 0
                       THEN CAST(round(log2(CAST(
                                (CAST(hh // {m} AS BIGINT)
                                 & -CAST(hh // {m} AS BIGINT)) AS DOUBLE)), 0)
                            AS BIGINT) + 1
                       ELSE {65 - p} END) AS r
            FROM ({keyed}) GROUP BY 1
        ),
        full_regs AS (
            SELECT g.range AS bucket, COALESCE(regs.r, 0) AS r
            FROM range(0, {m}) g LEFT JOIN regs ON g.range = regs.bucket
        ),
        st AS (
            SELECT SUM(CAST(power(2, {_K} - r) AS HUGEINT)) AS s,
                   SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS v
            FROM full_regs
        )
        SELECT CASE WHEN v > 0
                     AND ({a} / CAST(s AS DOUBLE)) <= {2.5 * m!r}
                    THEN {m} * ln({m} / CAST(v AS DOUBLE))
                    ELSE {a} / CAST(s AS DOUBLE) END
        FROM st)"""
