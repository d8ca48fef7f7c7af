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
        from ..state.hashing import fnv1a_arr

        keys = fnv1a_arr(col)  # vectorized, bit-identical to _fnv1a
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


CMS_SEED = 23


def cms_counters(ds, text_col: str, depth: int = 4, width: int = 1024, seed: int = CMS_SEED):
    """Count-Min sketch over the whitespace token stream of ``text_col``.

    The heavy-hitter / frequency-estimation structure: per-block partial
    counter increments grouped by (row, bucket), one Sum combine — the
    driver and every downstream consumer touch only depth×width counter
    rows, never the token stream.  bucket_r(tok) =
    splitmix(hash_key(seed, r) ^ fnv(tok)) % width, replayed exactly in
    SQL."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    row_keys = [int(hash_key(seed, r)) for r in range(depth)]

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern(pc.utf8_lower(t.column(text_col)), " ")
        )
        if len(toks) == 0:
            return pa.table(
                {
                    "r": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        from ..state.hashing import fnv1a_arr

        h = fnv1a_arr(toks)  # vectorized, bit-identical to _fnv1a
        rs, buckets = [], []
        from ..state.hashing import splitmix64

        for r in range(depth):
            with np.errstate(over="ignore"):
                b = (splitmix64(np.uint64(row_keys[r]) ^ h) % np.uint64(width)).astype(
                    np.int64
                )
            rs.append(np.full(b.shape[0], r, dtype=np.int64))
            buckets.append(b)
        tb = pa.table({"r": pa.array(np.concatenate(rs)), "bucket": pa.array(np.concatenate(buckets))})
        out = tb.group_by(["r", "bucket"]).aggregate([([], "count_all")])
        return out.rename_columns(["r", "bucket", "n"])

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["r", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )


def cms_estimate(counters_df, probes: list[str], depth: int = 4, width: int = 1024, seed: int = CMS_SEED):
    """Point-estimate token counts from the combined counters: min over
    the depth rows of each probe's bucket counters (0 for never-touched
    buckets).  Classic CMS guarantee: est ≥ true, est ≤ true + εN w.h.p."""
    from ..state.hashing import splitmix64

    lut = {
        (int(r), int(b)): int(n)
        for r, b, n in zip(counters_df["r"], counters_df["bucket"], counters_df["n"])
    }
    out = []
    for tok in probes:
        h = np.uint64(_fnv1a(tok))
        est = None
        for r in range(depth):
            with np.errstate(over="ignore"):
                b = int(splitmix64(np.uint64(int(hash_key(seed, r))) ^ h) % np.uint64(width))
            c = lut.get((r, b), 0)
            est = c if est is None else min(est, c)
        out.append(est)
    return out


def cms_sql(table_expr: str, text_col: str, probes: list[str], depth: int = 4, width: int = 1024, seed: int = CMS_SEED) -> str:
    """DuckDB replay: token stream → per-row bucket counters → min over
    rows per probe token.  Same splitmix chain, pure integer."""
    from ..state import sqlhash as SH

    row_keys = [SH.hug(int(hash_key(seed, r))) for r in range(depth)]
    toks = f"""
        SELECT unnest(string_split(lower({text_col}), ' ')) AS tok
        FROM {table_expr}"""
    fnv = SH.fnv1a_chars("tok")
    rows = " UNION ALL ".join(
        f"SELECT r, CAST(bh % {width} AS BIGINT) AS bucket FROM ("
        + SH.chain_select(
            f"SELECT {r} AS r, {fnv} AS th FROM ({toks})",
            SH.splitmix_steps(SH.xor64(row_keys[r], "th"), "bh", f"c{r}"),
        )
        + ")"
        for r in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT '{t}' AS tok" for t in probes
    )
    probe_buckets = " UNION ALL ".join(
        f"SELECT tok, {r} AS r, CAST(bh % {width} AS BIGINT) AS bucket "
        f"FROM ({SH.chain_select(f'SELECT tok, {fnv} AS th FROM (' + probe_rows + ')', SH.splitmix_steps(SH.xor64(row_keys[r], 'th'), 'bh', f'p{r}'))})"
        for r in range(depth)
    )
    return f"""
        WITH counters AS (
            SELECT r, bucket, COUNT(*) AS n FROM ({rows}) GROUP BY r, bucket
        ),
        pb AS ({probe_buckets})
        SELECT pb.tok AS token,
               CAST(MIN(COALESCE(c.n, 0)) AS BIGINT) AS est
        FROM pb LEFT JOIN counters c ON c.r = pb.r AND c.bucket = pb.bucket
        GROUP BY pb.tok"""


BLOOM_SEED = 29


def _bloom_positions(keys_u64: np.ndarray, m_bits: int, k: int, seed: int) -> list[np.ndarray]:
    from ..state.hashing import splitmix64

    out = []
    for j in range(k):
        with np.errstate(over="ignore"):
            out.append(
                (splitmix64(np.uint64(int(hash_key(seed, j))) ^ keys_u64)
                 % np.uint64(m_bits)).astype(np.int64)
            )
    return out


def bloom_semi_report(
    probe_ds,
    build_ds,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = BLOOM_SEED,
):
    """Bloom-filter semi-join with a quality report — the pre-filter a
    100 TB pipeline ships to the fact-table scan when the build-side key
    set is too big for an exact broadcast but its BITSET is not
    (m_bits/8 bytes regardless of key count).

    Build: per-block distinct keys → k splitmix positions → distinct
    position rows (≤ m_bits however large the build side); the driver
    materializes only the bitset.  Probe: one map_batches pass counts rows
    whose key has all k bits set.  The report also carries the exact
    semi-join count (exact key set broadcast — affordable at test scale)
    so the false-positive overhead is visible: (n_exact, n_bloom,
    n_false).  Deterministic, replayed exactly in SQL.
    """
    from ray.data.aggregate import Sum

    def pos_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pc.unique(t.column(build_key)).to_numpy(zero_copy_only=False).astype(np.uint64)
        ps = np.unique(np.concatenate(_bloom_positions(keys, m_bits, k, seed)))
        return pa.table({"p": pa.array(ps)})

    # positions and the exact key set, each distinct'ed before collection
    pos_rows = (
        build_ds.select_columns([build_key])
        .map_batches(pos_partial, batch_format="pyarrow")
        .select_columns(["p"])
    )
    from .joins import distinct

    pos = distinct(pos_rows, ["p"]).to_pandas()["p"].to_numpy()
    keys_exact = np.sort(
        distinct(build_ds.select_columns([build_key]), [build_key])
        .to_pandas()[build_key]
        .to_numpy()
    )
    bits = np.zeros(m_bits, dtype=bool)
    bits[pos] = True
    import ray as _ray

    side_ref = _ray.put({"bits": bits, "keys": keys_exact})

    def probe_partial(t: pa.Table) -> pa.Table:
        side = _ray.get(side_ref)
        karr = t.column(probe_key).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(karr, return_inverse=True)
        ps = _bloom_positions(uk.astype(np.uint64), m_bits, k, seed)
        ok = np.ones(uk.shape[0], dtype=bool)
        for p in ps:
            ok &= side["bits"][p]
        pos_idx = np.searchsorted(side["keys"], uk)
        pos_idx = np.clip(pos_idx, 0, side["keys"].shape[0] - 1)
        exact = side["keys"][pos_idx] == uk
        return pa.table(
            {
                "n_exact": pa.array([int(exact[inv].sum())]),
                "n_bloom": pa.array([int(ok[inv].sum())]),
            }
        )

    agg = probe_ds.select_columns([probe_key]).map_batches(
        probe_partial, batch_format="pyarrow"
    ).aggregate(
        Sum("n_exact", alias_name="n_exact"), Sum("n_bloom", alias_name="n_bloom")
    )
    import pandas as pd

    ne, nb = int(agg["n_exact"]), int(agg["n_bloom"])
    return pd.DataFrame(
        {"n_exact": [ne], "n_bloom": [nb], "n_false": [nb - ne]}
    )


def bloom_sql(
    probe_table: str,
    build_sql: str,
    probe_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = BLOOM_SEED,
) -> str:
    """DuckDB replay: the same k splitmix position streams; membership =
    every position of the probe key appears in the build position set."""
    from ..state import sqlhash as SH

    def pos_inline(j: int) -> str:
        h = SH.splitmix_inline(SH.xor64(SH.hug(int(hash_key(seed, j))), "kx"))
        return f"CAST(({h}) % {m_bits} AS BIGINT)"

    build_pos = " UNION ".join(
        f"SELECT DISTINCT {pos_inline(j)} AS p "
        f"FROM (SELECT DISTINCT key AS kx FROM ({build_sql}))"
        for j in range(k)
    )
    probe_cols = ", ".join(f"{pos_inline(j)} AS p{j}" for j in range(k))
    pass_cond = " AND ".join(f"pk.p{j} IN (SELECT p FROM bpos)" for j in range(k))
    return f"""
        WITH bpos AS ({build_pos}),
        bkeys AS (SELECT DISTINCT key AS kx FROM ({build_sql})),
        pk AS (
            SELECT kx, {probe_cols}
            FROM (SELECT DISTINCT {probe_key} AS kx FROM {probe_table})
        ),
        verdicts AS (
            SELECT pk.kx,
                   CASE WHEN {pass_cond} THEN 1 ELSE 0 END AS bloom_ok,
                   CASE WHEN pk.kx IN (SELECT kx FROM bkeys) THEN 1 ELSE 0 END
                       AS exact_ok
            FROM pk
        )
        SELECT CAST(SUM(v.exact_ok * c.nrows) AS BIGINT) AS n_exact,
               CAST(SUM(v.bloom_ok * c.nrows) AS BIGINT) AS n_bloom,
               CAST(SUM((v.bloom_ok - v.exact_ok) * c.nrows) AS BIGINT)
                   AS n_false
        FROM verdicts v JOIN (
            SELECT {probe_key} AS kx, COUNT(*) AS nrows
            FROM {probe_table} GROUP BY 1
        ) c ON c.kx = v.kx"""


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


# ------------------------------------------------------- bottom-k sketches

BK_SEED = 23


def bottomk_sketches(ds, col: str, group_col: str, k: int = 64, seed: int = BK_SEED):
    """Per-group bottom-k sketch of the group's DISTINCT ``col`` set: the k
    smallest seeded hashes.  The decomposable set-similarity summary — a
    fixed k rows per group leave each block whatever the corpus size, and
    the combine is a tiny grouped merge (≤ k·blocks rows per group).
    Hash = splitmix64(seed, 'bk', fnv1a(value)) — the house chain, so the
    sketch CONTENT is SQL-replayable.  Returns Dataset[group, h] (uint64,
    ≤ k rows per group)."""
    import pandas as pd

    from ..state.hashing import fnv1a_arr, hash_key

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, col]).group_by([group_col, col]).aggregate([])
        h = hash_key(seed, "bk", fnv1a_arr(g.column(col)))
        df = pd.DataFrame(
            {
                group_col: g.column(group_col).to_numpy(zero_copy_only=False),
                "h": h,
            }
        )
        df = df.sort_values("h", kind="mergesort").groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates([group_col, "h"]).sort_values("h", kind="mergesort")
        return out.groupby(group_col, sort=False).head(k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(combine, batch_format="pandas")
    )


def bottomk_similarity(ds, col: str, group_col: str, k: int = 64, seed: int = BK_SEED):
    """Pairwise estimated Jaccard between every two groups' distinct-value
    sets from their bottom-k sketches: merge the two sketches, keep the
    kk = min(k, |union|) smallest union hashes, estimate = (how many of
    those are in BOTH) / kk — the classic KMV estimator, deterministic
    because the sketches are.  The driver only ever holds k·|groups|
    sketch rows; the corpus is touched once.

    Returns a pandas DataFrame (src_a, src_b, est_jaccard), src_a < src_b."""
    import pandas as pd

    sk = bottomk_sketches(ds, col, group_col, k, seed).to_pandas()
    sets = {g: set(v["h"].tolist()) for g, v in sk.groupby(group_col)}
    groups = sorted(sets)
    rows = []
    for i, a in enumerate(groups):
        for b in groups[i + 1 :]:
            merged = sorted(sets[a] | sets[b])[:k]
            inter = sum(1 for x in merged if x in sets[a] and x in sets[b])
            rows.append((a, b, inter / len(merged)))
    return pd.DataFrame(rows, columns=["src_a", "src_b", "est_jaccard"])


def bottomk_similarity_sql(
    docs_sql: str, col: str, group_col: str, k: int = 64, seed: int = BK_SEED
) -> str:
    """Oracle: identical hash chain, DISTINCT (group, h), bottom-k by
    row_number, union-merge per pair, same integer-ratio estimate."""
    from ..state import sqlhash as SH

    prefix = SH.hug(SH.hash_key_prefix(seed, "bk"))
    hashed = SH.chain_select(
        f"SELECT {group_col}, {SH.fnv1a_chars(col)} AS vh FROM ({docs_sql})",
        SH.splitmix_steps(SH.xor64(prefix, "vh"), "h", "bk"),
    )
    return f"""
        WITH bk_dh AS MATERIALIZED (
            SELECT DISTINCT {group_col} AS g, h FROM ({hashed})
        ),
        bk_sk AS MATERIALIZED (
            SELECT g, h FROM (
                SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
                FROM bk_dh
            ) WHERE rn <= {k}
        ),
        bk_gs AS (SELECT DISTINCT g FROM bk_sk),
        bk_prs AS (
            SELECT a.g AS sa, b.g AS sb FROM bk_gs a JOIN bk_gs b ON a.g < b.g
        ),
        bk_un AS (
            SELECT DISTINCT sa, sb, h FROM (
                SELECT p.sa, p.sb, s.h FROM bk_prs p JOIN bk_sk s ON s.g = p.sa
                UNION ALL
                SELECT p.sa, p.sb, s.h FROM bk_prs p JOIN bk_sk s ON s.g = p.sb
            )
        ),
        bk_mk AS (
            SELECT sa, sb, h FROM (
                SELECT sa, sb, h, row_number() OVER (
                    PARTITION BY sa, sb ORDER BY h
                ) AS rn FROM bk_un
            ) WHERE rn <= {k}
        )
        SELECT m.sa AS src_a, m.sb AS src_b,
               CAST(COUNT(CASE WHEN ia.h IS NOT NULL AND ib.h IS NOT NULL
                          THEN 1 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS est_jaccard
        FROM bk_mk m
        LEFT JOIN bk_sk ia ON ia.g = m.sa AND ia.h = m.h
        LEFT JOIN bk_sk ib ON ib.g = m.sb AND ib.h = m.h
        GROUP BY m.sa, m.sb"""


def hll_count_by(ds, col: str, group_col: str, p: int = 8, seed: int = HLL_SEED):
    """Per-group HLL distinct-count estimates — the grouped form of
    :func:`hll_count` (distinct users per day, distinct docs per source)
    a 100 TB pipeline uses where exact per-group COUNT(DISTINCT) would
    shuffle every raw row.

    Scale shape: per-block (group, bucket) grouped-MAX partials bound
    every shuffled row to ≤ |groups|·2^p regardless of input size; one
    global grouped MAX; the closed-form estimate runs per group over its
    ≤ 2^p registers inside ``map_groups`` (bounded task state).  The
    estimate is the SAME exact fold as the global sketch — python-int
    Σ 2^(K−reg) — so the SQL twin replays it bit-for-bit, both branches.

    Output: (``group_col``:int64, est:double).
    """
    import pandas as pd

    from ray.data.aggregate import Max

    def partial(t: pa.Table) -> pa.Table:
        h = _row_hashes(t.column(col), seed)
        bucket, rho = rho_of(h, p)
        tb = pa.table(
            {
                "g": t.column(group_col),
                "bucket": pa.array(bucket),
                "r": pa.array(rho),
            }
        )
        return (
            tb.group_by(["g", "bucket"])
            .aggregate([("r", "max")])
            .rename_columns(["g", "bucket", "r"])
        )

    regs = (
        ds.select_columns([col, group_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "bucket"])
        .aggregate(Max("r", alias_name="r"))
    )

    def estimate(gdf: pd.DataFrame) -> pd.DataFrame:
        d = dict(
            zip(gdf["bucket"].astype(int), gdf["r"].astype(int))
        )
        return pd.DataFrame(
            {
                group_col: [gdf["g"].iloc[0]],
                "est": [estimate_from_registers(d, p)],
            }
        )

    return regs.groupby("g").map_groups(estimate, batch_format="pandas")


def hll_by_sql(
    table_expr: str, col_expr: str, group_expr: str, p: int = 8,
    seed: int = HLL_SEED, group_alias: str = "g",
) -> str:
    """DuckDB replay of :func:`hll_count_by`: identical hash chain, rho,
    per-group zero-filled register fold and branch logic."""
    from ..state import sqlhash as SH

    m = 1 << p
    prefix = SH.hash_key_prefix(seed, "hll")
    keyed = SH.chain_select(
        f"SELECT {col_expr} AS kx, {group_expr} AS gx FROM {table_expr}",
        SH.splitmix_steps(SH.xor64(SH.hug(prefix), "kx"), "hh", "k1"),
    )
    a = repr(alpha_m(m) * m * m * float(1 << _K))
    return f"""
        WITH regs AS (
            SELECT gx, CAST(hh % {m} AS BIGINT) AS bucket,
                   MAX(CASE WHEN CAST(hh // {m} AS BIGINT) > 0
                       THEN CAST(round(log2(CAST(
                                (CAST(hh // {m} AS BIGINT)
                                 & -CAST(hh // {m} AS BIGINT)) AS DOUBLE)), 0)
                            AS BIGINT) + 1
                       ELSE {65 - p} END) AS r
            FROM ({keyed}) GROUP BY 1, 2
        ),
        grps AS (SELECT DISTINCT gx FROM regs),
        full_regs AS (
            SELECT grps.gx, g.range AS bucket, COALESCE(regs.r, 0) AS r
            FROM grps CROSS JOIN range(0, {m}) g
            LEFT JOIN regs ON regs.gx = grps.gx AND g.range = regs.bucket
        ),
        st AS (
            SELECT gx, SUM(CAST(power(2, {_K} - r) AS HUGEINT)) AS s,
                   SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS v
            FROM full_regs GROUP BY gx
        )
        SELECT gx AS {group_alias},
               CASE WHEN v > 0
                     AND ({a} / CAST(s AS DOUBLE)) <= {2.5 * m!r}
                    THEN {m} * ln({m} / CAST(v AS DOUBLE))
                    ELSE {a} / CAST(s AS DOUBLE) END AS est
        FROM st"""
