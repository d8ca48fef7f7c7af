"""Training-data layout operators: sequence packing + weighted source mixing.

Two ops every LLM pretraining pipeline runs over its curated corpus, absent
from the reference (which stops at curation) but first-class here:

* ``pack_sequences`` — concat-and-chunk packing: lay the corpus out in a
  seeded pseudo-random order and cut it into fixed token-budget context
  windows ("packs").  Every document gets (pack_id, pack_pos, n_splits).
  The global document order is a pure function of (seed, doc_id), so the
  layout is identical at any parallelism / cluster size — resharding the
  input never changes which window a document lands in.

  Scale shape: the global exclusive prefix-sum over token counts is the
  classic two-level scan — documents hash into 4096 ORDERED key buckets
  (bucket = key >> 52, monotone in key), per-bucket token totals reduce via
  the two-phase bucketed sum (one skinny row per bucket), the driver scans
  the ≤4096 bucket totals (trivially small at ANY corpus size), and one
  hash-shuffled ``groupby(bucket).map_groups`` computes local cumsums +
  broadcast bucket offset.  Nothing driver-side grows with the corpus.

* ``mix_sources`` — deterministic weighted mixture: down-sample each
  ``source`` so the output mixture follows configured weights (the
  "data mixing" step of a pretraining recipe).  Per-source acceptance
  rates derive from the tiny per-source count table (|sources| rows);
  acceptance itself is the usual seeded splitmix64 threshold test, so
  membership is exact, reshard-invariant, and SQL-replayable.

Both are value-checked bit-exact by SQL oracles (window-function prefix
sum; CTE-computed rates over the same hash streams — state/sqlhash.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..state.hashing import DEFAULT_SEED, hash_key, id_u64 as _id_u64
from .text import token_stats_batch

N_PACK_BUCKETS = 4096  # top-12-bit key buckets; driver scan is <= this
_BUCKET_SHIFT = np.uint64(52)
PACK_TAG = "packseq"
MIX_TAG = "mix"
_F53 = float(1 << 53)


def _keyed_counts(docs, seed: int, text_col: str):
    """documents -> skinny (doc_id, n_tokens, key, bucket); text dropped
    before anything shuffles."""

    def fn(t: pa.Table) -> pa.Table:
        t = token_stats_batch(t, text_col)
        key = hash_key(seed, PACK_TAG, _id_u64(t.column("doc_id")))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "key": pa.array(key),
                "kb": pa.array((key >> _BUCKET_SHIFT).astype(np.int64)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def pack_sequences(docs, budget: int = 512, seed: int = DEFAULT_SEED, text_col: str = "text"):
    """Concat-and-chunk sequence packing over a documents Dataset.

    Returns Dataset[doc_id, n_tokens, pack_id, pack_pos, n_splits]:
    documents sorted by (splitmix64 key, doc_id) are laid end-to-end;
    pack_id = global_token_offset // budget, pack_pos = offset % budget,
    n_splits = number of budget windows the document touches (empty docs
    count as touching their start window)."""
    from . import zonal

    # Materialized DELIBERATELY (measured both ways at 6.7M spans:
    # pinned 8.3 s vs recompute-per-consumer 21 s — unlike lm/tfidf the
    # recompute here re-reads and re-parses the full interleaved table).
    # The pinned table is the SKINNY projection (~50 B/row, no text); at
    # corpus scales beyond memory Ray's object store spills these blocks
    # to disk, which is the intended behavior — a disk-backed checkpoint
    # between the two passes, not a driver-side structure.
    skinny = _keyed_counts(docs, seed, text_col).materialize()

    # level-1 reduce: per-bucket token totals (<= N_PACK_BUCKETS rows)
    partial = skinny.map_batches(
        lambda t: t.group_by(["kb"])
        .aggregate([("n_tokens", "sum")])
        .rename_columns(["kb", "s_tokens"]),
        batch_format="pyarrow",
    )
    from ..runtime import bounded_collect

    totals = bounded_collect(
        zonal.bucketed_sum(
            partial, ["kb"], ["s_tokens"], max_keys_hint=N_PACK_BUCKETS
        ),
        N_PACK_BUCKETS,
        "pack bucket totals: one row per pack bucket",
    )
    totals = totals.sort_values("kb")
    # level-2: driver scan over the tiny ordered bucket table
    offsets = np.zeros(N_PACK_BUCKETS, dtype=np.int64)
    b = totals["kb"].to_numpy()
    csum = np.concatenate(([0], np.cumsum(totals["s_tokens"].to_numpy(np.int64))))
    offsets[b] = csum[:-1]
    off_ref = ray.put(offsets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(off_ref)
        g = g.sort_values(["key", "doc_id"], kind="mergesort").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(np.int64)
        off = int(base[int(g["kb"].iloc[0])]) + np.concatenate(
            ([0], np.cumsum(n)[:-1])
        )
        pack_id = off // budget
        pack_pos = off - pack_id * budget
        last = (off + np.maximum(n, 1) - 1) // budget
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": n,
                "pack_id": pack_id,
                "pack_pos": pack_pos,
                "n_splits": last - pack_id + 1,
            }
        )

    return skinny.groupby("kb").map_groups(per_bucket, batch_format="pandas")


def pack_sequences_sql(docs_sql: str, budget: int = 512, seed: int = DEFAULT_SEED) -> str:
    """Oracle: the same key stream + one window-function prefix sum."""
    from ..state import sqlhash as SH

    prefix = SH.hug(SH.hash_key_prefix(seed, PACK_TAG))
    keyed = SH.chain_select(
        f"""SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
                   CAST(doc_id AS HUGEINT) AS idh
            FROM ({docs_sql})""",
        SH.splitmix_steps(SH.xor64(prefix, "idh"), "k", "pk"),
    )
    return f"""
        WITH keyed AS ({keyed}),
        ord AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY k, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS off
            FROM keyed
        )
        SELECT doc_id, n_tokens,
               off // {budget} AS pack_id,
               off % {budget} AS pack_pos,
               (off + GREATEST(n_tokens, 1) - 1) // {budget}
                   - off // {budget} + 1 AS n_splits
        FROM ord"""


def mix_sources(
    docs,
    weight_of,
    alpha: float = 0.5,
    seed: int = DEFAULT_SEED,
    source_col: str = "source",
):
    """Deterministic weighted source mixing: keep documents so the output
    mixture approaches weights ``weight_of(source) -> float`` with total
    target ``alpha * len(docs)``.  Per-source acceptance rate
    r_s = min(1, total*alpha * w_s / (sum_w * n_s)); acceptance is the
    splitmix64 threshold test on doc_id, reshard-invariant.  Weights must
    be integer-valued (relative weights — scale fractional recipes), which
    makes sum_w exact under any accumulation order on both engine and
    oracle sides.

    Returns Dataset[doc_id, source] of the kept documents."""

    # tiny reduce: per-source counts (|sources| rows), then broadcast
    # integer thresholds — the small-side-lookup pattern, no shuffle join
    from ..runtime import bounded_collect
    from . import zonal

    counts = bounded_collect(
        zonal.bucketed_sum(
            docs.map_batches(
                lambda t: t.group_by([source_col])
                .aggregate([("doc_id", "count")])
                .rename_columns([source_col, "n_s"]),
                batch_format="pyarrow",
            ),
            [source_col],
            ["n_s"],
            # |sources| is config-bounded: the no-exchange tree reduce
            # replaces Ray's sort-based aggregate on string keys
            max_keys_hint=1 << 20,
        ),
        1 << 20,
        "mix_sources per-source counts: one row per source",
    ).rename(columns={"n_s": "sum(n_s)"})
    total = float(counts["sum(n_s)"].sum())
    if getattr(weight_of, "_wants_count", False):
        # count-derived weights (temperature mixing): weight_of(s, n_s)
        w = {
            s: float(weight_of(s, int(n)))
            for s, n in zip(counts[source_col], counts["sum(n_s)"])
        }
    else:
        w = {s: float(weight_of(s)) for s in counts[source_col]}
    # weights must be integer-valued: float64 addition of integers below
    # 2^53 is exact under ANY order, so engine-side sum_w and the oracle's
    # SUM(w) agree bit-for-bit regardless of accumulation order.  (Weights
    # are relative — scale fractional recipes to integers.)
    bad = [s for s, v in w.items() if v != np.floor(v)]
    if bad:
        raise ValueError(
            f"mix_sources weights must be integer-valued for the bit-exact "
            f"oracle contract; got non-integers for {bad[:3]}"
        )
    sum_w = float(sum(w.values()))
    thr = {
        s: np.int64(
            np.floor(
                min(1.0, total * alpha * w[s] / (sum_w * float(n))) * _F53
            )
        )
        for s, n in zip(counts[source_col], counts["sum(n_s)"])
    }
    thr_ref = ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        th = ray.get(thr_ref)
        h = (hash_key(seed, MIX_TAG, _id_u64(t.column("doc_id"))) >> np.uint64(11)).astype(np.int64)
        lim = (
            pd.Series(t.column(source_col).to_pandas())
            .map(th)
            .fillna(0)
            .to_numpy(np.int64)
        )
        return t.select(["doc_id", source_col]).filter(pa.array(h < lim))

    return docs.map_batches(keep, batch_format="pyarrow")


def mix_sources_sql(
    docs_sql: str,
    weight_sql: str,
    alpha: float = 0.5,
    seed: int = DEFAULT_SEED,
) -> str:
    """Oracle: same rates from a counts CTE (``weight_sql`` maps a
    ``source`` column reference to its weight expression), same hash test."""
    from ..state import sqlhash as SH

    prefix = SH.hug(SH.hash_key_prefix(seed, MIX_TAG))
    hashed = SH.chain_select(
        f"""SELECT doc_id, source, CAST(doc_id AS HUGEINT) AS idh
            FROM ({docs_sql})""",
        SH.splitmix_steps(SH.xor64(prefix, "idh"), "hv", "mx"),
    )
    return f"""
        WITH cnt AS (
            SELECT source, CAST(COUNT(*) AS DOUBLE) AS n_s,
                   {weight_sql} AS w
            FROM ({docs_sql}) GROUP BY source
        ),
        tot AS (SELECT SUM(n_s) AS total, SUM(w) AS sum_w FROM cnt),
        thr AS (
            SELECT source,
                   CAST(floor(LEAST(1.0,
                        total * {alpha!r} * w / (sum_w * n_s)) * {_F53!r})
                        AS BIGINT) AS lim
            FROM cnt, tot
        ),
        hashed AS ({hashed})
        SELECT h.doc_id, h.source
        FROM hashed h JOIN thr t ON h.source = t.source
        WHERE CAST(h.hv // 2048 AS BIGINT) < t.lim"""


N_ORDER_BUCKETS = 4096  # monotone value-range buckets; driver scan <= this


def global_rank(
    ds,
    value_col: str,
    id_col: str = "doc_id",
    lo: float = 0.0,
    hi: float = 1.0,
    num_buckets: int | None = None,
):
    """Dense 0-based GLOBAL rank of every row under the total order
    (``value_col`` asc, ``id_col`` asc) — the curriculum-ordering / global-
    sort-position primitive — without ever holding the corpus in one task.

    Same two-level scan as ``pack_sequences``: rows hash into
    ``N_ORDER_BUCKETS`` ORDERED buckets (bucket = value's position in a
    monotone [lo, hi] binning — any monotone binning preserves the total
    order across buckets; within a bucket the exact (value, id) sort
    decides), per-bucket COUNTS reduce to ≤4096 rows, the driver scans
    that tiny table into exclusive bucket offsets, and one hash-shuffled
    ``groupby(bucket)`` assigns rank = bucket offset + local sort index.
    Reshard-invariant; nothing driver-side grows with the corpus.  Values
    outside [lo, hi] clamp into the edge buckets (order still exact —
    clamping only affects WHICH bucket sorts them).

    Per-task bound: one bucket ≈ corpus/``num_buckets`` rows PLUS any
    value tie-run crossing it (identical values share a bin by
    construction — e.g. a mass of exactly-duplicate documents sharing one
    quality double).  The binning is monotone at ANY granularity, so at
    extreme scale raise ``num_buckets`` (the driver scan grows linearly
    and stays trivial up to ~10⁶); the irreducible worst case is the
    single largest tie-run, whose internal order is (id)-only.

    Returns Dataset[id, value, rank]."""
    from . import zonal

    nb = num_buckets or N_ORDER_BUCKETS

    def binb(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((np.clip(v, lo, hi) - lo) / (hi - lo) * nb).astype(np.int64)
        return pa.table(
            {
                id_col: t.column(id_col),
                value_col: t.column(value_col),
                "kb": pa.array(np.clip(b, 0, nb - 1)),
            }
        )

    skinny = ds.select_columns([id_col, value_col]).map_batches(
        binb, batch_format="pyarrow"
    ).materialize()  # skinny (~24 B/row) projection, consumed twice

    partial = skinny.map_batches(
        lambda t: t.group_by(["kb"])
        .aggregate([([], "count_all")])
        .rename_columns(["kb", "n"]),
        batch_format="pyarrow",
    )
    from ..runtime import bounded_collect

    totals = bounded_collect(
        zonal.bucketed_sum(partial, ["kb"], ["n"], max_keys_hint=nb),
        nb,
        "rank bucket totals: one row per order bucket",
    ).sort_values("kb")
    offsets = np.zeros(nb, dtype=np.int64)
    csum = np.concatenate(([0], np.cumsum(totals["n"].to_numpy(np.int64))))
    offsets[totals["kb"].to_numpy()] = csum[:-1]
    off_ref = ray.put(offsets)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(off_ref)
        g = g.sort_values([value_col, id_col], kind="mergesort").reset_index(drop=True)
        rank = int(base[int(g["kb"].iloc[0])]) + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame(
            {id_col: g[id_col], value_col: g[value_col], "rank": rank}
        )

    return skinny.groupby("kb").map_groups(per_bucket, batch_format="pandas")


def global_rank_sql(rows_sql: str, value_col: str, id_col: str = "doc_id") -> str:
    """Oracle: one window function over the identical total order."""
    return f"""
        SELECT {id_col}, {value_col},
               CAST(ROW_NUMBER() OVER (ORDER BY {value_col}, {id_col}) - 1
                    AS BIGINT) AS rank
        FROM ({rows_sql})"""


def spatial_partition(
    geo,
    n_parts: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
    span_mul: int = 1_000_000,
):
    """Space-filling-curve layout: assign every geo row to one of
    ``n_parts`` CONTIGUOUS Hilbert-order tiles of (as near as possible)
    equal row count — the locality-preserving repartitioning a tiled
    export / co-located spatial join wants (nearby points land in the
    same tile; NTILE-over-Hilbert semantics).

    Decomposition is ``global_rank``'s two-level ordered-bucket scan over
    the Hilbert index (exact as a float64 value: d < 4^level ≤ 2⁵²), tie-
    broken by the packed (doc_id·10⁶ + span_idx) uid; the tile is the
    NTILE formula applied to the dense rank.  Nothing driver-side grows
    with the corpus (≤4096 bucket counts + one total).

    Returns Dataset[doc_id, span_idx, hilbert_d, part]."""
    from ..state.cells import CELL_LEVEL, encode_hilbert

    def add_h(t: pa.Table) -> pa.Table:
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        hd = encode_hilbert(lon, lat, CELL_LEVEL).astype(np.int64)
        uid = (
            t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            * span_mul
            + t.column("span_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "uid": pa.array(uid),
                "hd": pa.array(hd.astype(np.float64)),
            }
        )

    keyed = geo.map_batches(add_h, batch_format="pyarrow")
    hi = float(4 ** CELL_LEVEL)
    ranked = global_rank(keyed, "hd", id_col="uid", lo=0.0, hi=hi).materialize()
    total = ranked.count()
    q, r = divmod(total, n_parts)
    boundary = (q + 1) * r

    def ntile(t: pa.Table) -> pa.Table:
        rank = t.column("rank").to_numpy(zero_copy_only=False)
        uid = t.column("uid").to_numpy(zero_copy_only=False)
        part = np.where(
            rank < boundary,
            rank // (q + 1),
            r + (rank - boundary) // max(q, 1),
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uid // span_mul),
                "span_idx": pa.array(uid % span_mul),
                "hilbert_d": pa.array(
                    t.column("hd").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "part": pa.array(part),
            }
        )

    return ranked.map_batches(ntile, batch_format="pyarrow")


TEMP_WEIGHT_SCALE = 1 << 20  # quantized n^T weights stay integer-valued


def temperature_mix(
    docs,
    temperature: float = 0.5,
    alpha: float = 0.5,
    seed: int = DEFAULT_SEED,
    source_col: str = "source",
):
    """Temperature-weighted source mixing — the multilingual
    exponent-smoothing sampler (p_s ∝ n_s^T, T < 1 upweights rare
    sources; mBERT/XLM-R's alpha-sampling).  Weights are DERIVED from the
    corpus's own per-source counts: w_s = floor(n_s^T · 2^20), quantized
    to integers so ``mix_sources``' bit-exact oracle contract (exact
    float64 sums under any order) still holds; the single pow() per
    source goes through libm on both engine and oracle sides.
    Everything else — the tiny counts reduce, broadcast integer
    thresholds, splitmix64 membership — is ``mix_sources``."""
    import math

    def weight_of(s, n):
        return float(np.floor(math.pow(float(n), temperature) * TEMP_WEIGHT_SCALE))

    weight_of._wants_count = True
    return mix_sources(docs, weight_of, alpha=alpha, seed=seed, source_col=source_col)


def temperature_mix_sql(
    docs_sql: str,
    temperature: float = 0.5,
    alpha: float = 0.5,
    seed: int = DEFAULT_SEED,
) -> str:
    """Oracle: the mix_sources oracle with the weight expression
    floor(pow(n_s, T) · 2^20) — DuckDB's lateral column alias lets it read
    the counts CTE's n_s; pow is the same libm call as math.pow."""
    return mix_sources_sql(
        docs_sql,
        f"floor(pow(n_s, {temperature!r}) * {float(TEMP_WEIGHT_SCALE)!r})",
        alpha=alpha,
        seed=seed,
    )


def token_budget(
    docs,
    budget: int = 1_000_000,
    unit_col: str = "n_chars",
    source_col: str = "source",
):
    """Largest-remainder apportionment of a global training-token budget
    across sources — the integer-exact mixture-budgeting step that turns
    mixing WEIGHTS (:func:`mix_sources` / :func:`temperature_mix`) into
    per-source token QUOTAS that sum EXACTLY to the budget (Hamilton's
    method; no float shares, no drift).

    Rule: quota_s = budget·n_s // N (integer), leftover L = budget − Σ
    quotas goes +1 each to the L sources with the largest integer
    remainder budget·n_s mod N (ties → source ASC).  Pure int64
    arithmetic end-to-end, replayed term-for-term in SQL.

    Scale shape: the corpus-sized pass is a per-batch grouped integer
    sum of ``unit_col`` per source through the bucketed exchange; the
    apportionment itself runs over the SOURCE-bounded count table (a few
    rows) — vectorized numpy, one argsort.

    Returns Dataset[(source, n_units:int64, alloc:int64)]; Σ alloc ==
    budget whenever the corpus is non-empty.
    """
    import ray.data as rd

    from . import zonal

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    source_col: t.column(source_col),
                    "n_units": t.column(unit_col).cast(pa.int64()),
                }
            )
            .group_by([source_col])
            .aggregate([("n_units", "sum")])
        )
        return g.rename_columns([source_col, "n_units"])

    from ..runtime import bounded_collect

    counts = bounded_collect(
        zonal.bucketed_sum(
            docs.select_columns([source_col, unit_col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            [source_col],
            ["n_units"],
            max_keys_hint=1 << 20,
        ),
        1 << 20,
        "token_budget per-source unit totals: one row per source",
    )
    schema = pa.schema(
        [
            (source_col, pa.string()),
            ("n_units", pa.int64()),
            ("alloc", pa.int64()),
        ]
    )
    if not len(counts):
        return rd.from_arrow(schema.empty_table())
    counts = counts.sort_values(source_col).reset_index(drop=True)
    n = counts["n_units"].to_numpy(np.int64)
    total = int(n.sum())
    b = np.int64(budget)
    base = b * n // total
    rem = b * n % total
    leftover = int(budget - base.sum())
    # +1 to the `leftover` largest remainders, ties to smallest source
    order = np.lexsort((np.arange(len(n)), -rem))
    alloc = base.copy()
    alloc[order[:leftover]] += 1
    return rd.from_arrow(
        pa.table(
            {
                source_col: pa.array(counts[source_col], pa.string()),
                "n_units": pa.array(n, pa.int64()),
                "alloc": pa.array(alloc, pa.int64()),
            }
        )
    )


def token_budget_sql(
    docs_sql: str, budget: int = 1_000_000, unit_col: str = "n_chars"
) -> str:
    """Oracle twin of :func:`token_budget` — identical integer div/mod
    apportionment, remainder rank window with the same tie rule."""
    return f"""
        WITH tbc AS (
            SELECT source, CAST(SUM({unit_col}) AS BIGINT) AS n_units
            FROM ({docs_sql}) GROUP BY source
        ),
        tbt AS (SELECT CAST(SUM(n_units) AS BIGINT) AS total FROM tbc),
        tbq AS (
            SELECT c.source, c.n_units,
                   {budget} * c.n_units // t.total AS base,
                   {budget} * c.n_units % t.total AS rem
            FROM tbc c CROSS JOIN tbt t
        ),
        tbl AS (
            SELECT CAST({budget} - SUM(base) AS BIGINT) AS leftover FROM tbq
        )
        SELECT q.source, q.n_units,
               CAST(q.base + CASE WHEN row_number() OVER (
                       ORDER BY q.rem DESC, q.source ASC
                   ) <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM tbq q CROSS JOIN tbl l"""


def rank_blend(
    ranked_a,
    ranked_b,
    id_col: str = "doc_id",
    names: tuple = ("rank_q", "rank_len"),
    rows_hint: int | None = None,
):
    """Rank-fusion of two quality signals: each signal is reduced to its
    dense global rank (``global_rank`` — scale-free, outlier-immune), and
    the blended score is the INTEGER rank sum — the standard multi-signal
    curation combiner when raw signals live on incomparable scales.

    Input: two ``global_rank`` outputs (Dataset[id, value, rank]).
    Output: Dataset[id, names[0], names[1], blend], blend = rank_a+rank_b.

    Scale shape: the rank tables are skinny (id, rank) projections; one
    id-keyed hash join + a stateless add.  All values int64 → exact under
    any partitioning."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..runtime import join_partitions

    def skinny(ds, name):
        def rn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: t.column(id_col),
                    name: pc.cast(t.column("rank"), pa.int64()),
                }
            )

        return ds.map_batches(rn, batch_format="pyarrow")

    j = skinny(ranked_a, names[0]).join(
        skinny(ranked_b, names[1]),
        join_type="inner",
        num_partitions=join_partitions(rows_hint),
        on=(id_col,),
    )

    def add_blend(t: pa.Table) -> pa.Table:
        return t.append_column(
            "blend", pc.add(t.column(names[0]), t.column(names[1]))
        )

    return j.map_batches(add_blend, batch_format="pyarrow")


SHARD_TAG = "shardplan"


def shard_plan(docs, n_shards: int = 64, seed: int = DEFAULT_SEED):
    """Deterministic hash-shard plan — the partition-layout report a
    100 TB ingest runs BEFORE writing: every document lands in
    ``hash(doc_id) mod n_shards`` (seeded splitmix64 — stable across
    reruns and resharding), and the plan reports each shard's document
    count, byte proxy (Σ n_chars) and share, so imbalance is visible
    before any data moves.

    Pure integers plus one pinned share division; the corpus pass is a
    stateless map emitting ≤ n_shards partial rows per batch.

    Output: (shard:int64, n_docs:int64, n_chars_sum:int64, share:f64),
    shards sorted.
    """
    import ray.data as rd

    from .zonal import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        h = hash_key(seed, SHARD_TAG, _id_u64(t.column("doc_id")))
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        g = (
            pa.table(
                {
                    "shard": pa.array(shard),
                    "n_docs": pa.array(np.ones(len(shard), np.int64)),
                    "n_chars_sum": pa.array(
                        t.column("n_chars")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    ),
                }
            )
            .group_by(["shard"])
            .aggregate([("n_docs", "sum"), ("n_chars_sum", "sum")])
        )
        return g.rename_columns(["shard", "n_docs", "n_chars_sum"])

    from ..runtime import bounded_collect

    plan = (
        bounded_collect(
            bucketed_sum(
                docs.select_columns(["doc_id", "n_chars"]).map_batches(
                    partial, batch_format="pyarrow"
                ),
                ["shard"],
                ["n_docs", "n_chars_sum"],
                max_keys_hint=n_shards,
            ),
            n_shards,
            "shard plan: one row per shard",
        )
        .sort_values("shard", kind="mergesort")
        .reset_index(drop=True)
    )
    total = int(plan["n_docs"].sum()) if len(plan) else 0
    nd = plan["n_docs"].to_numpy(np.int64)
    share = nd.astype(np.float64) / np.float64(total) if total else nd.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "shard": pa.array(plan["shard"].to_numpy(np.int64)),
                "n_docs": pa.array(nd, pa.int64()),
                "n_chars_sum": pa.array(plan["n_chars_sum"].to_numpy(np.int64)),
                "share": pa.array(share, pa.float64()),
            }
        )
    )


def shard_plan_sql(docs_sql: str, n_shards: int = 64, seed: int = DEFAULT_SEED) -> str:
    """Oracle twin of :func:`shard_plan`: the splitmix chain on
    (seed, tag)-prefixed doc ids, the same unsigned mod, exact margins
    and the pinned share."""
    from ..state import sqlhash as SH

    prefix = SH.hug(SH.hash_key_prefix(seed, SHARD_TAG))
    hashed = SH.chain_select(
        f"""SELECT doc_id, n_chars, CAST(doc_id AS HUGEINT) AS idh
            FROM ({docs_sql})""",
        SH.splitmix_steps(SH.xor64(prefix, "idh"), "hv", "sp"),
    )
    return f"""
        WITH sp_h AS ({hashed}),
        sp_g AS (
            SELECT CAST(hv % {n_shards} AS BIGINT) AS shard,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum
            FROM sp_h GROUP BY 1
        ),
        sp_t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM sp_g)
        SELECT g.shard, g.n_docs, g.n_chars_sum,
               CAST(g.n_docs AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
        FROM sp_g g CROSS JOIN sp_t t"""
