"""Tumbling-window aggregation over the events table.

Ray Data has no event-time window primitive; a tumbling window over bounded
batch data is exactly ``groupby(key, floor(ts / size))`` — implemented
two-phase (per-batch partial → combine), with only order-insensitive
statistics (count / min / max / exact integer sums) so results are
bit-stable and SQL-checkable.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..state.money import to_cents

KEYS = ["event_type", "window_start"]

# Partitioning contract of the SEQUENTIAL per-key ops (sessionize,
# running_totals, asof/interval joins, forward_fill, ewma, …): one key's
# events must land in one task, because the kernel runs an ordered scan
# within the key.  That co-location is semantically required — but a
# whale key (one 10⁸-event user in a 100 TB log) would silently turn a
# streaming stage into a single giant pandas task.  Enforce the
# assumption instead of assuming it: 2^25 rows ≈ 1–3 GB per group task.
MAX_GROUP_ROWS = 1 << 25


def _guard_group(g, op: str):
    """Raise (don't OOM) when a per-key group exceeds the task bound."""
    if len(g) > MAX_GROUP_ROWS:
        key_desc = g.iloc[0].to_dict() if len(g) else {}
        raise ValueError(
            f"{op}: key group with {len(g)} rows exceeds the per-task "
            f"bound {MAX_GROUP_ROWS} (whale key; first row {key_desc}); "
            "pre-filter or split this key upstream — the sequential "
            "kernel cannot be chunked without changing semantics"
        )
    return g


# --- hash-bucket exchange for the per-key kernels ---------------------
#
# Every per-key op below used to ride ``ds.groupby(key).map_groups(fn)``.
# Semantically that is exactly what they need (whole-key co-location,
# ``fn`` sees one key at a time) — but Ray's groupby is a SORT-BASED
# exchange, which costs seconds per 100k rows on raw user/string keys
# (measured 8.3 s native vs 0.25 s bucketed on a 100k-row uniq stage).
# The pair of closure factories below keeps the identical per-key kernel
# while shuffling on a single int64 hash bucket (~2×CPU-way): chain
# ``.map_batches(_add_key_bucket(key)).groupby("__kb")
# .map_groups(_per_bucket_fn(key, fn))``.  Row order across keys is not
# preserved — it never was (the native groupby emits groups in shuffle
# order too), and every events op is order-insensitive downstream.


def _add_key_bucket(key: str):
    import numpy as np

    from ..runtime import cluster_cpus
    from ..state.hashing import fnv1a_arr, hash_key

    nb = max(8, cluster_cpus() * 2)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key]
        if k.dtype.kind in ("O", "U", "S"):
            h = fnv1a_arr(k.astype(str).tolist())
        else:
            h = k.to_numpy().astype(np.uint64)
        b = (hash_key(h) % np.uint64(nb)).astype(np.int64)
        return df.assign(__kb=b)

    return add_bucket


def _per_bucket_fn(key: str, fn):
    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__kb")
        outs = [fn(sub) for _, sub in g.groupby(key, sort=True)]
        return pd.concat(outs, ignore_index=True)

    return per_bucket


def _window_combine(partials):
    """Combine per-batch (event_type, window_start, n, min, max) partials.

    Key cardinality is |event types| × |windows in the observed span| —
    structurally bounded (a decade of hourly windows × dozens of types is
    ~2M), so this rides the NO-EXCHANGE tree reduce rather than any
    all-to-all (Ray's sort-based Aggregate spends SECONDS per thousand
    rows on timestamp keys — measured 15.4 s on 3.4k partial rows)."""
    from .zonal import bucketed_combine

    return bucketed_combine(
        partials,
        KEYS,
        {"n": "sum", "min_value": "min", "max_value": "max"},
        max_keys_hint=1 << 21,
    ).select_columns(KEYS + ["n", "min_value", "max_value"])


def tumbling_window(ds, freq: str = "h"):
    """Dataset[events] → per (event_type, hour window): n, min/max value."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(window_start=df["ts"].dt.floor(freq))
        g = df.groupby(KEYS, as_index=False).agg(
            n=("event_id", "count"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        return g

    return _window_combine(ds.map_batches(partial, batch_format="pandas"))


def sliding_window(ds, width_hours: int = 2, slide_hours: int = 1):
    """Sliding windows as fan-out → tumbling combine: each event is mapped
    to the width/slide windows that contain it, then aggregated like a
    tumbling window.  Overlap factor = width/slide copies per event — the
    standard batch expression of a sliding window (no watermark state)."""
    assert width_hours % slide_hours == 0
    k = width_hours // slide_hours

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df["ts"].dt.floor(f"{slide_hours}h")
        frames = []
        for off in range(k):
            frames.append(
                df.assign(window_start=base - pd.to_timedelta(off * slide_hours, "h"))
            )
        fan = pd.concat(frames, ignore_index=True)
        return fan.groupby(KEYS, as_index=False).agg(
            n=("event_id", "count"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )

    return _window_combine(ds.map_batches(partial, batch_format="pandas"))


def sessionize(ds, gap_minutes: int = 30):
    """Gap-based sessionization per user — the stateful event-time window
    Ray Data lacks as a primitive, expressed as groupby(user).map_groups
    with a deterministic in-group sort (the documented partitioning
    assumption: one user's events fit one group).

    A new session starts when the gap to the previous event (ordered by
    ts, event_id) exceeds ``gap_minutes``.  Output per session: user_id,
    session_id (MIN event_id — order-free), session_start/end, n_events,
    value_cents (exact ×100 integer sum).  Every statistic is
    order-insensitive within the session, so results are bit-stable and
    SQL-checkable (lag + windowed running sum oracle).
    """
    import numpy as np

    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "sessionize")
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        brk = np.concatenate(([0], (np.diff(ts) > gap).astype(np.int64)))
        sid = np.cumsum(brk)
        cents = to_cents(g["value"].to_numpy())
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].to_numpy(),
                    "sid": sid,
                    "event_id": g["event_id"].to_numpy(),
                    "ts": ts,
                    "cents": cents,
                }
            )
            .groupby(["user_id", "sid"], as_index=False)
            .agg(
                session_id=("event_id", "min"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "count"),
                value_cents=("cents", "sum"),
            )
        )
        return out.drop(columns=["sid"])

    return ds.map_batches(_add_key_bucket("user_id"), batch_format="pandas").groupby("__kb").map_groups(_per_bucket_fn("user_id", per_user), batch_format="pandas")


def extract_props_key(ds, field: str = "k"):
    """Semi-structured extraction: pull an integer field out of the JSON
    ``props`` string column with one vectorized Arrow regex per batch (no
    per-row json.loads), keeping rows where the field is absent as -1.
    Then an exact grouped rollup per event_type (n, sum) — the
    schema-on-read pattern over a 100 TB log table."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t.column("props"), pattern=f'"{field}": (?P<v>-?[0-9]+)')
        v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        v = pc.fill_null(v, -1)
        tb = pa.table({"event_type": t.column("event_type"), "v": v})
        out = tb.group_by(["event_type"]).aggregate([("v", "sum"), ([], "count_all")])
        return out.rename_columns(["event_type", "sum_k", "n"])

    from .zonal import bucketed_sum

    return bucketed_sum(
        ds.select_columns(["event_type", "props"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["event_type"],
        ["sum_k", "n"],
        max_keys_hint=1 << 16,  # |event types| — tree reduce, no exchange
    )


def running_totals(ds, key: str = "user_id", ts_col: str = "ts", val_col: str = "value"):
    """Per-key cumulative sum ordered by (ts, event_id) — the running
    window aggregate (SUM OVER ... ROWS UNBOUNDED PRECEDING) Ray Data has
    no primitive for.  Co-partition by key, one in-group mergesort +
    integer cumsum; exact ×100 cents so the prefix sums are bit-stable
    regardless of how blocks arrived."""
    import numpy as np

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "running_totals")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        cents = to_cents(g[val_col].to_numpy())
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                key: g[key].to_numpy(),
                "cum_cents": np.cumsum(cents),
            }
        )

    return (
        ds.select_columns(["event_id", key, ts_col, val_col])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_key), batch_format="pandas")
    )


def event_gaps(ds, key: str = "user_id", ts_col: str = "ts"):
    """lag()-style window navigation: per key, microseconds since the
    previous event in (ts, event_id) order (first event → sentinel -1).
    Co-partition by key + one in-group mergesort — the same partitioning
    contract as sessionize/running_totals."""
    import numpy as np

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "event_gaps")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.empty(ts.shape[0], dtype=np.int64)
        gap[0] = -1
        gap[1:] = ts[1:] - ts[:-1]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                key: g[key].to_numpy(),
                "gap_us": gap,
            }
        )

    return (
        ds.select_columns(["event_id", key, ts_col])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_key), batch_format="pandas")
    )


def pivot_counts(ds, key: str = "user_id", cat_col: str = "event_type", cats=None):
    """Pivot: one row per key with a count column per category — expressed
    as per-block conditional-count partials + one Sum combine (never a
    per-category shuffle).  ``cats`` must be the closed category list (the
    schema can't depend on data at plan time)."""
    cats = list(cats or ("click", "view", "purchase", "signup", "error"))

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        keys = t.column(key).to_numpy(zero_copy_only=False)
        ct = t.column(cat_col).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        cols = {key: pa.array(uk)}
        for c in cats:
            cnt = np.zeros(uk.shape[0], dtype=np.int64)
            np.add.at(cnt, inv, (ct == c).astype(np.int64))
            cols[f"n_{c}"] = pa.array(cnt)
        return pa.table(cols)

    # sum-combine via the hash-bucket exchange, not Ray's native
    # sort-based aggregate (seconds of fixed cost on raw key dtypes);
    # user keys are unbounded, so no tree hint
    from .zonal import bucketed_sum

    return bucketed_sum(
        ds.select_columns([key, cat_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        [key],
        [f"n_{c}" for c in cats],
    )


def interval_join(ds, point_type: str = "error", gap_minutes: int = 30):
    """Range join of points into derived intervals — the second temporal
    join shape Ray Data lacks.

    Each ``point_type`` event is matched to the session interval
    ``[session_start, session_end]`` (from :func:`sessionize` over ALL
    events, same gap) of the same user that contains its timestamp.
    Gap-based sessions are disjoint per user, so a point matches ≤ 1
    interval; unmatched points keep sentinel session_id -1.

    Plan: harmonize intervals and points into one schema (µs int64
    endpoints, side tag), union, co-partition by user via
    ``groupby(user_id).map_groups`` (sessionize's documented partitioning
    assumption), then one ``np.searchsorted`` over interval starts per
    group + an end-containment check.  SQL oracle: the sessionize CTE
    joined on ``ts BETWEEN session_start AND session_end``.
    """
    import numpy as np
    import pyarrow.compute as pc

    # sessions derive from the NON-point events, so a point can genuinely
    # fall between sessions (else each point would trivially contain itself)
    def non_points(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("event_type"), point_type))

    sessions = sessionize(
        ds.map_batches(non_points, batch_format="pyarrow"), gap_minutes=gap_minutes
    )

    def iv_rows(t: pa.Table) -> pa.Table:
        t0 = t.column("session_start").cast(pa.timestamp("us")).cast(pa.int64())
        t1 = t.column("session_end").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "t0_us": t0,
                "t1_us": t1,
                "id": t.column("session_id").cast(pa.int64()),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def pt_rows(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("event_type"), point_type)
        t = t.select(["event_id", "user_id", "ts"]).filter(keep)
        ts = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "t0_us": ts,
                "t1_us": ts,
                "id": t.column("event_id").cast(pa.int64()),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    both = sessions.map_batches(iv_rows, batch_format="pyarrow").union(
        ds.map_batches(pt_rows, batch_format="pyarrow")
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "interval_join")
        iv = g[g["side"] == 0].sort_values("t0_us", kind="mergesort")
        pt = g[g["side"] == 1].sort_values(["t0_us", "id"], kind="mergesort")
        starts = iv["t0_us"].to_numpy()
        ends = iv["t1_us"].to_numpy()
        sids = iv["id"].to_numpy()
        ts = pt["t0_us"].to_numpy()
        idx = np.searchsorted(starts, ts, side="right") - 1
        safe = np.maximum(idx, 0)
        hit = (idx >= 0) & (ends[safe] >= ts)
        return pd.DataFrame(
            {
                "event_id": pt["id"].to_numpy(),
                "user_id": pt["user_id"].to_numpy(),
                "session_id": np.where(hit, sids[safe], np.int64(-1)),
            }
        )

    return both.map_batches(_add_key_bucket("user_id"), batch_format="pandas").groupby("__kb").map_groups(_per_bucket_fn("user_id", per_key), batch_format="pandas")


def asof_join(
    ds,
    left_type: str = "purchase",
    right_type: str = "view",
    on: str = "user_id",
    ts_col: str = "ts",
):
    """As-of join — the temporal join Ray Data lacks as a primitive.

    Each ``left_type`` event is matched to the same user's most recent
    ``right_type`` event with ``r.ts <= l.ts`` (attribution: "which view
    preceded this purchase").  Plan: prune to the two types and four
    columns inside ``map_batches`` (nothing else leaves the read), then
    ``groupby(on).map_groups`` — the same documented partitioning
    assumption as :func:`sessionize` (one key's events fit one group);
    inside a group the match is a single vectorized ``np.searchsorted``.

    Determinism: right rows with equal ts keep the max event_id (matching
    the oracle's QUALIFY dedupe), so DuckDB's ASOF JOIN reproduces the
    result bit-for-bit.  No-match rows get sentinel -1 (not NULL) in
    matched_event_id / lag_us so both sides hash identically.
    """
    import numpy as np
    import pyarrow.compute as pc

    def prune(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"), value_set=pa.array([left_type, right_type]))
        return t.select(["event_id", on, ts_col, "event_type"]).filter(keep)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "asof_join")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        r = g[g["event_type"] == right_type]
        r = r[~r[ts_col].duplicated(keep="last")]  # ts-sorted → last = max id
        left = g[g["event_type"] == left_type]
        lts = left[ts_col].to_numpy()
        rts = r[ts_col].to_numpy()
        idx = np.searchsorted(rts, lts, side="right") - 1
        safe = np.maximum(idx, 0)
        rid = r["event_id"].to_numpy()
        matched = np.where(idx >= 0, rid[safe], np.int64(-1))
        lag = (lts - rts[safe]).astype("timedelta64[us]").astype(np.int64)
        lag = np.where(idx >= 0, lag, np.int64(-1))
        return pd.DataFrame(
            {
                "event_id": left["event_id"].to_numpy(),
                on: left[on].to_numpy(),
                "matched_event_id": matched,
                "lag_us": lag,
            }
        )

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .map_batches(_add_key_bucket(on), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(on, per_key), batch_format="pandas")
    )


def forward_fill(
    ds,
    mark_type: str = "purchase",
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
):
    """Per-key as-of carry-forward (LOCF / gap fill): every event gets the
    integer-cents value of the key's most recent ``mark_type`` event at or
    before it in (ts, event_id) order; -1 before the first mark — the
    last_value(... IGNORE NULLS) window op Ray Data has no primitive for.
    Same partitioning contract as running_totals: co-partition by key, one
    in-group mergesort + a vectorized cummax index pass."""
    import numpy as np

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "forward_fill")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        cents = to_cents(g[val_col].to_numpy())
        ismark = (g["event_type"] == mark_type).to_numpy()
        idx = np.maximum.accumulate(np.where(ismark, np.arange(len(g)), -1))
        filled = np.where(idx >= 0, cents[np.maximum(idx, 0)], np.int64(-1))
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                key: g[key].to_numpy(),
                "last_mark_cents": filled.astype(np.int64),
            }
        )

    return (
        ds.select_columns(["event_id", key, ts_col, "event_type", val_col])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_key), batch_format="pandas")
    )


def ewma(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    denom: int = 4,
):
    """Per-key exponentially-weighted moving average, α = 1/``denom``,
    pinned to integers so the inherently-sequential recurrence is
    bit-replayable in SQL: v = round(value·100) cents; y₁ = v₁;
    yₜ = floor((vₜ + (denom−1)·yₜ₋₁) / denom).

    EWMA is the one event-stream shape with a TRUE sequential dependency
    per key.  Scale treatment — jagged-recurrence vectorization: keys hash
    into ~2×CPU buckets (the running_totals co-partition), one mergesort
    per bucket, then the recurrence advances ACROSS ALL KEYS IN LOCKSTEP:
    iteration i updates every key's i-th event as one numpy step, so a
    task costs O(rows) memory and O(max_events_per_key) vector steps — a
    million keys cost the same step count as one.

    Output: (event_id, key, ewma_cents:int64).
    """
    import numpy as np

    from ..state.hashing import splitmix64
    from .zonal import _default_buckets

    nb = _default_buckets(None)
    a = int(denom) - 1

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy(np.int64).view(np.uint64)
        return df.assign(bucket=(splitmix64(k) % np.uint64(nb)).astype(np.int64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"], kind="mergesort")
        v = to_cents(g[val_col].to_numpy())
        kk = g[key].to_numpy()
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n:
            first[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(first)
        runlen = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, runlen)
        y = v.copy()
        if n:
            order = np.argsort(pos, kind="stable")  # rows grouped by level
            maxp = int(pos.max())
            lvl = np.searchsorted(pos[order], np.arange(maxp + 2))
            for i in range(1, maxp + 1):
                rows_i = order[lvl[i] : lvl[i + 1]]
                # predecessor of a key's i-th event is the adjacent row
                # (the bucket is (key, ts)-sorted), already at level i−1
                y[rows_i] = (v[rows_i] + a * y[rows_i - 1]) // denom
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                key: kk,
                "ewma_cents": y,
            }
        )

    return (
        ds.select_columns(["event_id", key, ts_col, val_col])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["event_id", key, "ewma_cents"])
    )


def ewma_sql(events_sql: str, denom: int = 4) -> str:
    """Oracle twin: the identical integer recurrence as a recursive CTE
    (seq MATERIALIZED so DuckDB doesn't re-evaluate it per recursion
    round); floor((v + (denom−1)·y)/denom.0) in doubles is exact for
    |v + (denom−1)·y| < 2⁵³ — same values as the engine's int64 floor
    division."""
    a = int(denom) - 1
    return f"""
        WITH RECURSIVE ew_seq AS MATERIALIZED (
            SELECT event_id, user_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS v,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM ({events_sql})
        ),
        ew_r AS (
            SELECT event_id, user_id, rn, v AS y FROM ew_seq WHERE rn = 1
            UNION ALL
            SELECT s.event_id, s.user_id, s.rn,
                   CAST(floor((s.v + {a} * r.y) / {float(denom)!r}) AS BIGINT)
            FROM ew_seq s JOIN ew_r r
              ON s.user_id = r.user_id AND s.rn = r.rn + 1
        )
        SELECT event_id, user_id, y AS ewma_cents FROM ew_r"""


def session_attribution(ds, gap_minutes: int = 30):
    """First-touch / last-touch attribution per session: the gap-rule
    sessionization plus the FIRST and LAST event_type under the total
    (ts, event_id) order — the standard funnel-attribution shape.

    Deterministic: (user_id, ts) is unique in the stream, so first/last
    are well-defined; every other statistic is order-insensitive.  Same
    partitioning assumption as ``sessionize`` (one user's events fit one
    group; bucket keys for higher user cardinality).

    Output: (user_id, session_id = min event_id, first_type, last_type,
    n_events:int64, value_cents:int64)."""
    import numpy as np

    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "session_attribution")
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        brk = np.concatenate(([0], (np.diff(ts) > gap).astype(np.int64)))
        sid = np.cumsum(brk)
        cents = to_cents(g["value"].to_numpy())
        f = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "sid": sid,
                "event_id": g["event_id"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "cents": cents,
            }
        )
        return f.groupby(["user_id", "sid"], as_index=False).agg(
            session_id=("event_id", "min"),
            first_type=("event_type", "first"),
            last_type=("event_type", "last"),
            n_events=("event_id", "size"),
            value_cents=("cents", "sum"),
        )[
            [
                "user_id",
                "session_id",
                "first_type",
                "last_type",
                "n_events",
                "value_cents",
            ]
        ]

    return (
        ds.select_columns(["event_id", "user_id", "ts", "event_type", "value"])
        .map_batches(_add_key_bucket("user_id"), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn("user_id", per_user), batch_format="pandas")
    )


def session_attribution_sql(events_sql: str, gap_minutes: int = 30) -> str:
    """Oracle twin: LAG-gap session ids, arg_min/arg_max by ts (unique per
    user) for first/last, exact cent sums."""
    return f"""
        WITH sa_s AS (
            SELECT *, CAST(round(value * 100, 0) AS BIGINT) AS cents,
                   CASE WHEN ts - LAG(ts) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                        > INTERVAL {gap_minutes} MINUTE
                        THEN 1 ELSE 0 END AS brk
            FROM ({events_sql})
        ),
        sa_sid AS (
            SELECT *, SUM(brk) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM sa_s
        )
        SELECT user_id, CAST(MIN(event_id) AS BIGINT) AS session_id,
               arg_min(event_type, ts) AS first_type,
               arg_max(event_type, ts) AS last_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS value_cents
        FROM sa_sid GROUP BY user_id, sid"""


def funnel(ds, stages=("view", "click", "purchase"), within_days: int | None = None):
    """Ordered conversion funnel per user: stage k counts only if its
    event occurs STRICTLY AFTER the user's stage-(k−1) completion time
    (first-completion semantics — the standard product-funnel measure,
    immune to out-of-order stage events).

    ``within_days`` bounds the funnel to the first N days of the stream
    (ts < global MIN(ts) + N days) — the measurement-window form real
    funnels use.  Unbounded, a long-enough stream lets every user
    eventually complete every stage and the funnel saturates (observed on
    the driver events table: all users reach 3/3), so the bounded form is
    what the gate certifies.

    Deterministic: completion times are per-user MINs over a unique
    (user, ts) stream; no float arithmetic.  Same co-partitioning shape
    as the other event ops (hash-bucketed users, vectorized in-task
    pandas passes — one merge per stage, not one pass per user).  The
    window cutoff is one tiny distributed MIN (per-batch partials →
    driver scalar → stateless filter), not a driver scan.

    Output: (user_id, reached:int64 ∈ [0, len(stages)]).
    """
    import numpy as np

    from ..state.hashing import splitmix64
    from .zonal import _default_buckets

    nb = _default_buckets(None)

    if within_days is not None:
        day_us = np.int64(86_400) * 1_000_000

        def ts_min(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            if t.num_rows == 0:
                return pa.table({"m": pa.array([], pa.int64())})
            return pa.table({"m": pa.array([pc.min(ts).as_py()], pa.int64())})

        mins = ds.select_columns(["ts"]).map_batches(
            ts_min, batch_format="pyarrow"
        ).to_pandas()
        cutoff = np.int64(mins["m"].min()) + np.int64(within_days) * day_us

        def in_window(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
            return t.filter(pc.less(ts, pa.scalar(int(cutoff), pa.int64())))

        ds = ds.map_batches(in_window, batch_format="pyarrow")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["user_id"].to_numpy(np.int64).view(np.uint64)
        return df.assign(bucket=(splitmix64(k) % np.uint64(nb)).astype(np.int64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.Index(pd.unique(g["user_id"]))
        reached = pd.Series(np.int64(0), index=users)
        thr = pd.Series(np.datetime64("1677-09-22"), index=users)  # ≈ -inf
        alive = users
        for st in stages:
            sub = g[g["event_type"] == st]
            sub = sub[sub["user_id"].isin(alive)]
            t = sub["ts"].to_numpy()
            keep = t > thr.reindex(sub["user_id"]).to_numpy()
            sub = sub[keep]
            m = sub.groupby("user_id")["ts"].min()
            reached.loc[m.index] += 1
            thr = m
            alive = m.index
            if len(alive) == 0:
                break
        return pd.DataFrame(
            {"user_id": users.to_numpy(), "reached": reached.to_numpy()}
        )

    return (
        ds.select_columns(["user_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["user_id", "reached"])
    )


def funnel_sql(
    events_sql: str,
    stages=("view", "click", "purchase"),
    within_days: int | None = None,
) -> str:
    """Oracle twin: chained per-user first-completion MINs with the same
    strict-after rule; ``within_days`` applies the identical integer-µs
    global-MIN window cutoff."""
    if within_days is not None:
        span_us = within_days * 86_400 * 1_000_000
        events_sql = f"""SELECT * FROM ({events_sql})
            WHERE epoch_us(ts) < (SELECT MIN(epoch_us(ts))
                                  FROM ({events_sql})) + {span_us}"""
    ctes = [
        f"""fn_u AS (SELECT DISTINCT user_id FROM ({events_sql}))""",
        f"""fn_t1 AS (
            SELECT user_id, MIN(ts) AS t FROM ({events_sql})
            WHERE event_type = '{stages[0]}' GROUP BY user_id)""",
    ]
    for i, st in enumerate(stages[1:], start=2):
        ctes.append(
            f"""fn_t{i} AS (
            SELECT e.user_id, MIN(e.ts) AS t FROM ({events_sql}) e
            JOIN fn_t{i - 1} p ON e.user_id = p.user_id AND e.ts > p.t
            WHERE e.event_type = '{st}' GROUP BY e.user_id)"""
        )
    flags = " + ".join(
        f"CASE WHEN fn_t{i}.t IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(1, len(stages) + 1)
    )
    joins = "\n            ".join(
        f"LEFT JOIN fn_t{i} ON fn_t{i}.user_id = fn_u.user_id"
        for i in range(1, len(stages) + 1)
    )
    return f"""
        WITH {", ".join(ctes)}
        SELECT fn_u.user_id, CAST({flags} AS BIGINT) AS reached
        FROM fn_u
            {joins}"""


def retention_cohorts(
    ds,
    period_days: int = 7,
    cohort_days: int | None = None,
    activity_type: str | None = None,
):
    """Cohort retention: users grouped by their first-activity period
    (floor(ts / period) — epoch-aligned weeks by default); retention cell
    (cohort, k) counts the cohort's distinct users active k periods later
    — the standard product-retention triangle.

    Deterministic integers end-to-end.  Scale shape: pass 1 reduces to
    per-user first-period MINs (bucketed — one row per user per batch);
    the per-(user, period) activity table then joins the tiny per-user
    cohort via the SAME hash bucket (co-partitioned map_groups — no extra
    shuffle beyond the two bucketed reduces), and (cohort, k) counts
    collapse per batch.

    ``cohort_days`` (default = period_days) sets the cohort granularity
    INDEPENDENTLY of the retention period k: cohort = floor(first_ts /
    cohort_days·day), k = (floor(ts / cohort_days·day) − cohort) //
    (period_days / cohort_days is NOT assumed — k is the integer number
    of whole period_days-day periods after the cohort day).
    ``activity_type`` restricts which events count as RETAINED activity
    (the cohort itself still derives from the user's first event of ANY
    type).  On the driver events table the defaults degenerate — every
    user signs up in epoch-week 0 and is active every week, so every
    (cohort, k) cell equals the user count; daily cohorts + purchase-only
    activity is what the gate certifies.

    Output: (cohort:int64, k:int64, n_users:int64).
    """
    import numpy as np

    from ..state.hashing import splitmix64
    from .zonal import _default_buckets, bucketed_sum

    nb = _default_buckets(None)
    cd = cohort_days if cohort_days is not None else period_days
    day_us = np.int64(86_400) * 1_000_000
    cohort_us = np.int64(cd) * day_us
    k_per = np.int64(max(period_days // cd, 1))

    def add_period(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        per = np.floor_divide(ts, cohort_us)
        k = df["user_id"].to_numpy(np.int64).view(np.uint64)
        is_act = (
            np.ones(len(df), bool)
            if activity_type is None
            else (df["event_type"].to_numpy() == activity_type)
        )
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "period": per,
                "is_act": is_act.astype(np.int64),
                "bucket": (splitmix64(k) % np.uint64(nb)).astype(np.int64),
            }
        ).drop_duplicates(["user_id", "period", "is_act"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "period", "is_act"])
        first = g.groupby("user_id")["period"].transform("min")
        act = g["is_act"].to_numpy() == 1
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy()[act],
                "cohort": first.to_numpy()[act],
                "k": (g["period"].to_numpy()[act] - first.to_numpy()[act])
                // k_per,
            }
        ).drop_duplicates(["user_id", "cohort", "k"])
        return (
            out.groupby(["cohort", "k"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )

    cols = ["user_id", "ts"] + ([] if activity_type is None else ["event_type"])
    partial = (
        ds.select_columns(cols)
        .map_batches(add_period, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return bucketed_sum(
        partial, ["cohort", "k"], ["n_users"], recombine_batch_size=None
    )


def retention_cohorts_sql(
    events_sql: str,
    period_days: int = 7,
    cohort_days: int | None = None,
    activity_type: str | None = None,
) -> str:
    """Oracle twin: same floor-division periods, per-user MIN cohort over
    ALL events, distinct (user, k) activity (optionally type-filtered),
    grouped counts."""
    cd = cohort_days if cohort_days is not None else period_days
    us = cd * 86_400 * 1_000_000
    k_per = max(period_days // cd, 1)
    act = "" if activity_type is None else f"WHERE event_type = '{activity_type}'"
    return f"""
        WITH rc_all AS (
            SELECT DISTINCT user_id,
                   -- integer division: epoch_us exceeds 2^53, a double
                   -- floor would round; ts > 0 so trunc == floor
                   CAST(epoch_us(ts) // {us} AS BIGINT) AS period
            FROM ({events_sql})
        ),
        rc_c AS (
            SELECT user_id, MIN(period) AS cohort FROM rc_all GROUP BY user_id
        ),
        rc_act AS (
            SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // {us} AS BIGINT) AS period
            FROM ({events_sql}) {act}
        ),
        rc_k AS (
            SELECT DISTINCT a.user_id, c.cohort,
                   (a.period - c.cohort) // {k_per} AS k
            FROM rc_act a JOIN rc_c c ON a.user_id = c.user_id
        )
        SELECT cohort, k, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM rc_k GROUP BY 1, 2"""


def ewma_anomalies(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    denom: int = 4,
    threshold_cents: int = 20_000,
):
    """Streaming anomaly flags from the per-key integer EWMA baseline:
    each event's deviation is v_t − y_{t−1} (its value against the EWMA of
    everything BEFORE it); |dev| > ``threshold_cents`` flags an anomaly.
    A key's first event has no baseline → dev 0, never flagged (pinned).

    Same jagged lockstep vectorization and exact-integer recurrence as
    ``ewma``; the oracle extends the recursive CTE with a LAG window.
    Output: (event_id, key, dev_cents:int64, is_anomaly:int64)."""
    import numpy as np

    from ..state.hashing import splitmix64
    from .zonal import _default_buckets

    nb = _default_buckets(None)
    a = int(denom) - 1

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy(np.int64).view(np.uint64)
        return df.assign(bucket=(splitmix64(k) % np.uint64(nb)).astype(np.int64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, "event_id"], kind="mergesort")
        v = to_cents(g[val_col].to_numpy())
        kk = g[key].to_numpy()
        n = len(g)
        first = np.ones(n, dtype=bool)
        if n:
            first[1:] = kk[1:] != kk[:-1]
        starts = np.flatnonzero(first)
        runlen = np.diff(np.append(starts, n))
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, runlen)
        y = v.copy()
        if n:
            order = np.argsort(pos, kind="stable")
            maxp = int(pos.max())
            lvl = np.searchsorted(pos[order], np.arange(maxp + 2))
            for i in range(1, maxp + 1):
                rows_i = order[lvl[i] : lvl[i + 1]]
                y[rows_i] = (v[rows_i] + a * y[rows_i - 1]) // denom
        dev = np.zeros(n, dtype=np.int64)
        if n:
            dev[~first] = v[~first] - y[np.flatnonzero(~first) - 1]
        flag = (np.abs(dev) > threshold_cents).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                key: kk,
                "dev_cents": dev,
                "is_anomaly": flag,
            }
        )

    return (
        ds.select_columns(["event_id", key, ts_col, val_col])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["event_id", key, "dev_cents", "is_anomaly"])
    )


def ewma_anomalies_sql(
    events_sql: str, denom: int = 4, threshold_cents: int = 20_000
) -> str:
    """Oracle twin: the ewma recursive CTE + a LAG(y) deviation window."""
    a = int(denom) - 1
    return f"""
        WITH RECURSIVE ea_seq AS MATERIALIZED (
            SELECT event_id, user_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS v,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM ({events_sql})
        ),
        ea_r AS (
            SELECT event_id, user_id, rn, v, v AS y FROM ea_seq WHERE rn = 1
            UNION ALL
            SELECT s.event_id, s.user_id, s.rn, s.v,
                   CAST(floor((s.v + {a} * r.y) / {float(denom)!r}) AS BIGINT)
            FROM ea_seq s JOIN ea_r r
              ON s.user_id = r.user_id AND s.rn = r.rn + 1
        ),
        ea_d AS (
            SELECT event_id, user_id,
                   CAST(COALESCE(v - LAG(y) OVER (
                       PARTITION BY user_id ORDER BY rn), 0) AS BIGINT)
                       AS dev_cents
            FROM ea_r
        )
        SELECT event_id, user_id, dev_cents,
               CAST(CASE WHEN abs(dev_cents) > {threshold_cents}
                    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        FROM ea_d"""


def event_transitions(ds, key: str = "user_id", ts_col: str = "ts"):
    """First-order Markov transition matrix of event types: per key, the
    (previous → current) type pairs in (ts, event_id) order, counted
    globally, with per-source-row transition probabilities — the
    behavioral-model summary every event pipeline ships.

    Scale shape: the lag runs inside the per-key map_groups (the
    sessionize partitioning contract — a user's stream is bounded);
    transitions pre-count IN-GROUP, so the global combine moves at most
    |types|² rows per group; the probability is one pinned division over
    the tiny final matrix.

    Returns pandas[from_type, to_type, n, p] (≤|types|² rows).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "event_transitions")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        t = g["event_type"].to_numpy()
        if len(t) < 2:
            return pd.DataFrame({"from_type": [], "to_type": [], "n": []}).astype(
                {"from_type": str, "to_type": str, "n": np.int64}
            )
        pairs = pd.DataFrame({"from_type": t[:-1], "to_type": t[1:]})
        out = pairs.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": np.int64})

    empty = pd.DataFrame(
        {
            "from_type": pd.Series([], dtype=str),
            "to_type": pd.Series([], dtype=str),
            "n": pd.Series([], dtype="int64"),
            "p": pd.Series([], dtype="float64"),
        }
    )
    if ds.limit(1).count() == 0:  # zero groups -> column-less downstream
        return empty
    from .zonal import bucketed_sum

    counts = bucketed_sum(
        ds.select_columns(["event_id", key, ts_col, "event_type"])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_key), batch_format="pandas"),
        ["from_type", "to_type"],
        ["n"],
        # |types|² keys — the tree reduce replaces the native sort
        # aggregate on the string pair
        max_keys_hint=1 << 16,
    ).to_pandas()
    if len(counts) == 0:
        return empty
    tot = counts.groupby("from_type")["n"].transform("sum").to_numpy(np.float64)
    counts["p"] = counts["n"].to_numpy(np.float64) / tot
    return counts[["from_type", "to_type", "n", "p"]]


def event_transitions_sql(events_sql: str) -> str:
    """Oracle twin of :func:`event_transitions`."""
    return f"""
        WITH tr AS (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM ({events_sql})
        ),
        ct AS (
            SELECT prev AS from_type, event_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM tr WHERE prev IS NOT NULL
            GROUP BY prev, event_type
        )
        SELECT from_type, to_type, n,
               CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        FROM ct"""


def ab_test(ds, convert_type: str = "purchase", min_events: int = 14):
    """Two-cohort A/B conversion test: users split by user_id parity,
    conversion = at least ``min_events`` ``convert_type`` events (the
    heavy-purchaser metric — every user in the driver corpus has ≥1
    purchase, so a ≥1 definition is degenerate; both sides share the same
    threshold); reports the pooled two-proportion z statistic

        z = (pA − pB) / √(p̂(1−p̂)(1/nA + 1/nB))

    as ONE pinned double expression over four exact integers.

    Scale shape: per-batch (user, converted-partial) rows → per-user Sum
    (skinny ints) → four global counters; no raw event ever shuffles
    twice.  Returns one pandas row (n_a, conv_a, n_b, conv_b, p_a, p_b,
    z).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow as _pa

        u = t.column("user_id").to_numpy(zero_copy_only=False)
        conv = (
            t.column("event_type").to_numpy(zero_copy_only=False) == convert_type
        ).astype(np.int64)
        uk, inv = np.unique(u, return_inverse=True)
        c = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(c, inv, conv)
        return _pa.table({"user_id": _pa.array(uk), "nc": _pa.array(c)})

    from .zonal import bucketed_sum

    # user keys are unbounded → the hash-bucket exchange (not Ray's
    # sort-based aggregate, not the tree)
    per_user = bucketed_sum(
        ds.select_columns(["user_id", "event_type"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["user_id"],
        ["nc"],
    )

    def cohort_partial(t: pa.Table) -> pa.Table:
        import pyarrow as _pa

        u = t.column("user_id").to_numpy(zero_copy_only=False)
        nc = t.column("nc").to_numpy(zero_copy_only=False)
        b = (u % 2 == 1).astype(np.int64)
        conv = (nc >= min_events).astype(np.int64)
        return _pa.table(
            {
                "n_a": _pa.array([int((1 - b).sum())]),
                "conv_a": _pa.array([int(((1 - b) * conv).sum())]),
                "n_b": _pa.array([int(b.sum())]),
                "conv_b": _pa.array([int((b * conv).sum())]),
            }
        )

    agg = per_user.map_batches(cohort_partial, batch_format="pyarrow").aggregate(
        Sum("n_a", alias_name="n_a"),
        Sum("conv_a", alias_name="conv_a"),
        Sum("n_b", alias_name="n_b"),
        Sum("conv_b", alias_name="conv_b"),
    )
    n_a, c_a = int(agg["n_a"]), int(agg["conv_a"])
    n_b, c_b = int(agg["n_b"]), int(agg["conv_b"])
    p_a = np.float64(c_a) / np.float64(n_a)
    p_b = np.float64(c_b) / np.float64(n_b)
    pool = (np.float64(c_a) + np.float64(c_b)) / (np.float64(n_a) + np.float64(n_b))
    z = (p_a - p_b) / np.sqrt(
        pool * (1.0 - pool) * (1.0 / np.float64(n_a) + 1.0 / np.float64(n_b))
    )
    return pd.DataFrame(
        {
            "n_a": [n_a], "conv_a": [c_a], "n_b": [n_b], "conv_b": [c_b],
            "p_a": [float(p_a)], "p_b": [float(p_b)], "z": [float(z)],
        }
    )


def ab_test_sql(
    events_sql: str, convert_type: str = "purchase", min_events: int = 14
) -> str:
    """Oracle twin of :func:`ab_test` (identical pinned z expression)."""
    return f"""
        WITH au AS (
            SELECT user_id,
                   CAST(CASE WHEN SUM(CASE WHEN event_type = '{convert_type}'
                                           THEN 1 ELSE 0 END) >= {min_events}
                             THEN 1 ELSE 0 END AS BIGINT) AS conv
            FROM ({events_sql}) GROUP BY user_id
        ),
        cts AS (
            SELECT
                CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
                CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                CAST(SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
            FROM au
        )
        SELECT n_a, conv_a, n_b, conv_b,
               CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
               CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
               (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt(((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                       / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                      * (1.0 - ((CAST(conv_a AS DOUBLE) + CAST(conv_b AS DOUBLE))
                                / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))
                      * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
                   AS z
        FROM cts"""


def rolling_active_users(ds, window_days: int = 7):
    """Exact rolling-window active users (the WAU/MAU panel): for every
    calendar day, the count of distinct users active in the trailing
    ``window_days`` days — windowed COUNT(DISTINCT) expressed shuffle-
    light: distinct (user, day) pairs first (skinny ints), each pair
    fanned to the ≤window_days windows it feeds, then a distinct+count per
    window day.  No raw event is ever shuffled; the fan is over the
    already-deduplicated activity table.

    Only windows ending on an OBSERVED activity day are emitted (mirrored
    by the oracle); day = epoch-day integer, window day = its last day.

    Returns Dataset[day:int64, wau:int64].
    """
    import numpy as np

    from .joins import distinct as distinct_rows

    def to_days(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        return pa.table(
            {"user_id": t.column("user_id"), "day": pa.array(day)}
        )

    activity = distinct_rows(
        ds.select_columns(["user_id", "ts"]).map_batches(
            to_days, batch_format="pyarrow"
        ),
        ["user_id", "day"],
    ).materialize()  # skinny (user, day) ints; consumed twice (fan + domain)

    if activity.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {"day": pa.array([], pa.int64()), "wau": pa.array([], pa.int64())}
            )
        )

    obs_days = np.sort(
        distinct_rows(activity.select_columns(["day"]), ["day"])
        .to_pandas()["day"]
        .to_numpy(np.int64)
    )
    import ray

    days_ref = ray.put(obs_days)

    def fan(t: pa.Table) -> pa.Table:
        obs = ray.get(days_ref)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        parts = []
        for off in range(window_days):
            w = d + off
            # keep only windows anchored on an observed activity day
            pos = np.searchsorted(obs, w)
            ok = (pos < len(obs)) & (obs[np.minimum(pos, len(obs) - 1)] == w)
            parts.append(
                pa.table({"user_id": pa.array(u[ok]), "day": pa.array(w[ok])})
            )
        part = pa.concat_tables(parts)
        # in-batch dedupe before the shuffle
        g = part.group_by(["user_id", "day"]).aggregate([([], "count_all")])
        return g.select(["user_id", "day"])

    from .zonal import bucketed_sum

    def day_counts(t: pa.Table) -> pa.Table:
        g = t.select(["day"]).group_by(["day"]).aggregate([([], "count_all")])
        return g.rename_columns(["day", "wau"])

    # per-day distinct-user counts via the calendar-bounded tree reduce
    # (|days| keys), not Ray's sort-based Count aggregate
    return bucketed_sum(
        distinct_rows(
            activity.map_batches(fan, batch_format="pyarrow"), ["user_id", "day"]
        ).map_batches(day_counts, batch_format="pyarrow"),
        ["day"],
        ["wau"],
        max_keys_hint=1 << 20,
    )


def rolling_active_users_sql(events_sql: str, window_days: int = 7) -> str:
    """Oracle twin of :func:`rolling_active_users`."""
    return f"""
        WITH act AS (
            SELECT DISTINCT user_id,
                   CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
            FROM ({events_sql})
        ),
        obs AS (SELECT DISTINCT day FROM act),
        fan AS (
            SELECT DISTINCT a.user_id, a.day + o.off AS day
            FROM act a
            CROSS JOIN (SELECT unnest(range(0, {window_days})) AS off) o
            JOIN obs ON obs.day = a.day + o.off
        )
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM fan GROUP BY day"""


def time_weighted_avg(ds, key: str = "user_id", ts_col: str = "ts"):
    """Per-key time-weighted average of ``value``: each event's value
    holds until the next event (last event carries no weight), TWA =
    Σ value·duration / Σ duration — the standard telemetry summary for
    irregularly-sampled series.

    Exactness: value quantizes to cents, duration is exact integer
    microseconds, the weighted sum Σ cents·µs is int64 (bounded: a year
    of µs ≈ 3·10¹³ × cents ≈ 10⁴ → 3·10¹⁷ ≪ 2⁶³ per key), and the TWA is
    one pinned double division.  Same per-key map_groups contract as
    sessionize.

    Returns Dataset[key, n_holds:int64, wsum:int64, dur_us:int64,
    twa:f64] — keys with ≥2 events only.
    """
    import numpy as np

    from ..state.money import to_cents

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "time_weighted_avg")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=np.int64),
                    "n_holds": pd.Series([], dtype=np.int64),
                    "wsum": pd.Series([], dtype=np.int64),
                    "dur_us": pd.Series([], dtype=np.int64),
                    "twa": pd.Series([], dtype=np.float64),
                }
            )
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = to_cents(g["value"].to_numpy())
        dur = ts[1:] - ts[:-1]
        w = cents[:-1] * dur
        wsum, dsum = int(w.sum()), int(dur.sum())
        return pd.DataFrame(
            {
                key: [int(g[key].iloc[0])],
                "n_holds": [len(dur)],
                "wsum": [wsum],
                "dur_us": [dsum],
                "twa": [float(np.float64(wsum) / np.float64(dsum))],
            }
        )

    return (
        ds.select_columns(["event_id", key, ts_col, "value"])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_key), batch_format="pandas")
    )


def time_weighted_avg_sql(events_sql: str) -> str:
    """Oracle twin of :func:`time_weighted_avg`."""
    return f"""
        WITH tw AS (
            SELECT user_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents,
                   CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT)
                       AS dur
            FROM ({events_sql})
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_holds,
               CAST(SUM(cents * dur) AS BIGINT) AS wsum,
               CAST(SUM(dur) AS BIGINT) AS dur_us,
               CAST(SUM(cents * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE)
                   AS twa
        FROM tw WHERE dur IS NOT NULL
        GROUP BY user_id"""


def interval_union(ds, key: str = "user_id", ts_col: str = "ts"):
    """Per-key UNION-of-intervals coverage: each event opens the interval
    [ts, ts + cents(value) seconds); overlapping/touching intervals merge
    into islands; the report is each key's island count and total covered
    microseconds — the "active time" summary overlapping telemetry spans
    need (double-counting-free, unlike summing durations).

    Exactness: starts/ends are exact integer µs (duration = cents × 10⁶,
    no float time math); the island rule is the standard sweep — an
    interval starts a new island iff its start exceeds the running MAX of
    all previous ends (ties merge) — identical to the SQL twin's
    windowed running-max + cumulative-flag grouping.

    Scale shape: same per-key map_groups contract as sessionize (groups
    bounded per key); inside the group one vectorized sweep
    (sort + running max + cumsum), no per-interval Python.

    Returns Dataset[key, n_islands:int64, covered_us:int64].
    """
    import numpy as np

    from ..state.money import to_cents

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "interval_union")
        order = np.lexsort(
            (g["event_id"].to_numpy(), g[ts_col].to_numpy())
        )
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)[order]
        dur = to_cents(g["value"].to_numpy())[order] * 1_000_000
        end = ts + dur
        # running max of ends BEFORE each interval
        prev_max = np.empty(len(ts), np.int64)
        prev_max[0] = np.iinfo(np.int64).min
        np.maximum.accumulate(end[:-1], out=prev_max[1:])
        new_island = ts > prev_max
        new_island[0] = True
        island = np.cumsum(new_island) - 1
        n_isl = int(island[-1]) + 1
        starts = ts[new_island]
        ends = np.maximum.reduceat(end, np.flatnonzero(new_island))
        covered = int((ends - starts).sum())
        return pd.DataFrame(
            {
                key: [int(g[key].iloc[0])],
                "n_islands": [n_isl],
                "covered_us": [covered],
            }
        )

    return (
        ds.select_columns(["event_id", key, ts_col, "value"])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_key), batch_format="pandas")
    )


def interval_union_sql(events_sql: str) -> str:
    """Oracle twin of :func:`interval_union` — running max(end) window,
    island flag where start > previous running max, SUM-per-island, then
    per-key rollup."""
    return f"""
        WITH iv AS (
            SELECT user_id,
                   epoch_us(ts) AS s,
                   epoch_us(ts)
                     + CAST(round(value * 100, 0) AS BIGINT) * 1000000 AS e,
                   event_id
            FROM ({events_sql})
        ),
        mx AS (
            SELECT *, max(e) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max
            FROM iv
        ),
        isl AS (
            SELECT *, SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                               THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                   ) AS island
            FROM mx
        ),
        per_island AS (
            SELECT user_id, island,
                   MIN(s) AS st, MAX(e) AS en
            FROM isl GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(en - st) AS BIGINT) AS covered_us
        FROM per_island GROUP BY user_id"""


def mad_outliers(ds, val_col: str = "value", group_col: str = "event_type",
                 k: int = 3):
    """Median-absolute-deviation outlier flags per group — the robust
    data-cleaning rule (|v − median| > k·MAD) applied with exact integer
    arithmetic: values quantize to cents, both medians are nearest-rank
    picks from (group, bin) histograms at rank (n+1)//2, and the flag is
    the integer compare dev > k·MAD.

    Scale shape: two decomposable histogram passes (the adaptive-quality
    discipline) — per-batch (group, cents) partial counts combine through
    a skinny groupby, the per-group median scan holds ≤ |distinct bins|
    rows per task, and both cut tables broadcast once via ``ray.put``.
    The skinny (id, group, cents) projection is materialized between the
    passes (3 int/string cols) instead of re-decoding the source twice.

    Output: (event_id, ``group_col``, value_c, dev_c, is_outlier ∈ {0,1}).
    """
    import numpy as np

    import ray

    from .joins import probe_positions

    def add_bin(t: pa.Table) -> pa.Table:
        v = to_cents(t.column(val_col).to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                group_col: t.column(group_col),
                "value_c": pa.array(v),
            }
        )

    binned = (
        ds.select_columns(["event_id", group_col, val_col])
        .map_batches(add_bin, batch_format="pyarrow")
        .materialize()
    )

    def _nearest_rank_cut(hist_ds, bin_col):
        """(group, bin, cnt) histogram → {group → median bin} broadcast ref."""

        def med(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(bin_col, kind="mergesort")
            cnt = g["cnt"].to_numpy("int64")
            cum = cnt.cumsum()
            r = (int(cum[-1]) + 1) // 2
            bins = g[bin_col].to_numpy("int64")
            import numpy as _np

            return pd.DataFrame(
                {
                    group_col: [g[group_col].iloc[0]],
                    "m": [int(bins[int(_np.searchsorted(cum, r))])],
                }
            )

        cuts = (
            hist_ds.groupby(group_col)
            .map_groups(med, batch_format="pandas")
            .to_pandas()
        )
        return ray.put(
            {
                "keys": pa.array(
                    cuts[group_col].astype(str), type=pa.large_string()
                ),
                "m": cuts["m"].to_numpy("int64"),
            }
        )

    def _hist(src, col):
        def partial(t: pa.Table) -> pa.Table:
            out = (
                t.select([group_col, col])
                .group_by([group_col, col])
                .aggregate([([], "count_all")])
            )
            return out.rename_columns([group_col, col, "cnt"])

        from .zonal import bucketed_sum

        return bucketed_sum(
            src.map_batches(partial, batch_format="pyarrow"),
            [group_col, col],
            ["cnt"],
        )

    med_ref = _nearest_rank_cut(_hist(binned, "value_c"), "value_c")

    def add_dev(t: pa.Table) -> pa.Table:
        side = ray.get(med_ref)
        pos = probe_positions(t.column(group_col), side["keys"], group_col)
        v = t.column("value_c").to_numpy(zero_copy_only=False)
        return t.append_column("dev_c", pa.array(np.abs(v - side["m"][pos])))

    dev = binned.map_batches(add_dev, batch_format="pyarrow").materialize()
    mad_ref = _nearest_rank_cut(_hist(dev, "dev_c"), "dev_c")

    def flag(t: pa.Table) -> pa.Table:
        side = ray.get(mad_ref)
        pos = probe_positions(t.column(group_col), side["keys"], group_col)
        d = t.column("dev_c").to_numpy(zero_copy_only=False)
        return t.append_column(
            "is_outlier", pa.array((d > k * side["m"][pos]).astype(np.int64))
        )

    return dev.map_batches(flag, batch_format="pyarrow")


def mad_outliers_sql(events_sql: str, k: int = 3) -> str:
    """Oracle twin of :func:`mad_outliers` — the SAME cents bins,
    nearest-rank (n+1)//2 medians and integer k·MAD compare."""
    return f"""
        WITH mb AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS value_c
            FROM ({events_sql})
        ),
        h1 AS (
            SELECT event_type, value_c, CAST(COUNT(*) AS BIGINT) AS c
            FROM mb GROUP BY 1, 2
        ),
        r1 AS (
            SELECT event_type, value_c,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY value_c)
                       AS cum,
                   SUM(c) OVER (PARTITION BY event_type) AS n
            FROM h1
        ),
        med AS (
            SELECT event_type,
                   MIN(CASE WHEN cum >= (n + 1) // 2 THEN value_c END) AS m
            FROM r1 GROUP BY event_type
        ),
        dv AS (
            SELECT mb.event_id, mb.event_type, mb.value_c,
                   abs(mb.value_c - med.m) AS dev_c
            FROM mb JOIN med USING (event_type)
        ),
        h2 AS (
            SELECT event_type, dev_c, CAST(COUNT(*) AS BIGINT) AS c
            FROM dv GROUP BY 1, 2
        ),
        r2 AS (
            SELECT event_type, dev_c,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY dev_c)
                       AS cum,
                   SUM(c) OVER (PARTITION BY event_type) AS n
            FROM h2
        ),
        mad AS (
            SELECT event_type,
                   MIN(CASE WHEN cum >= (n + 1) // 2 THEN dev_c END) AS md
            FROM r2 GROUP BY event_type
        )
        SELECT dv.event_id, dv.event_type, dv.value_c, dv.dev_c,
               CASE WHEN dv.dev_c > {k} * mad.md THEN 1 ELSE 0 END
                   AS is_outlier
        FROM dv JOIN mad USING (event_type)"""


def ks_drift(ds, val_col: str = "value", group_col: str = "event_type",
             ts_col: str = "ts"):
    """Two-sample Kolmogorov–Smirnov drift statistic per group: the value
    distribution of each event type's EARLY half vs its LATE half (split
    at the pinned integer midpoint of the table's time range) — the
    distribution-shift monitor that complements the PSI report with an
    exact sup-norm statistic.

    Exactness: values quantize to cents, the split point is the integer
    (min_us + max_us) // 2, and D's numerator stays integral —
    max |k1·n2 − k2·n1| over the per-(group, bin) cumulative counts —
    with ONE final double division, so the SQL twin replays every bit.

    Scale shape: one tiny global (min, max) aggregate pins the cutoff;
    per-batch (group, bin, side) integer partials combine skinny; the
    per-group sup scan holds ≤ |distinct bins| rows per task.  Groups
    empty on either side are dropped (pinned rule, both branches).

    Output: (``group_col``, n_early, n_late, d_num:int64, d:double).
    """
    import numpy as np

    from ray.data.aggregate import Max, Min

    def epochs(t: pa.Table) -> pa.Table:
        return pa.table(
            {"e": t.column(ts_col).cast(pa.int64())}
        )

    rng = ds.select_columns([ts_col]).map_batches(
        epochs, batch_format="pyarrow"
    ).aggregate(Min("e"), Max("e"))
    mid = (int(rng["min(e)"]) + int(rng["max(e)"])) // 2

    def partial(t: pa.Table) -> pa.Table:
        v = to_cents(t.column(val_col).to_numpy(zero_copy_only=False))
        e = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        late = (e >= mid).astype("int64")
        tb = pa.table(
            {
                group_col: t.column(group_col),
                "v": pa.array(v),
                "c1": pa.array(1 - late),
                "c2": pa.array(late),
            }
        )
        out = tb.group_by([group_col, "v"]).aggregate(
            [("c1", "sum"), ("c2", "sum")]
        )
        return out.rename_columns([group_col, "v", "c1", "c2"])

    from .zonal import bucketed_sum

    hist = bucketed_sum(
        ds.select_columns([group_col, val_col, ts_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        [group_col, "v"],
        ["c1", "c2"],
    )

    def sup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v", kind="mergesort")
        c1 = g["c1"].to_numpy("int64")
        c2 = g["c2"].to_numpy("int64")
        n1, n2 = int(c1.sum()), int(c2.sum())
        if n1 == 0 or n2 == 0:
            return pd.DataFrame(
                {group_col: [], "n_early": [], "n_late": [],
                 "d_num": [], "d": []}
            )
        k1, k2 = c1.cumsum(), c2.cumsum()
        d_num = int(np.abs(k1 * n2 - k2 * n1).max())
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_early": np.array([n1], "int64"),
                "n_late": np.array([n2], "int64"),
                "d_num": np.array([d_num], "int64"),
                "d": [float(d_num) / float(n1 * n2)],
            }
        )

    return hist.groupby(group_col).map_groups(sup, batch_format="pandas")


def ks_drift_sql(events_sql: str) -> str:
    """Oracle twin of :func:`ks_drift` — same integer midpoint split,
    cents bins, cumulative integer numerator and single division."""
    return f"""
        WITH kb AS (
            SELECT event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS v,
                   CASE WHEN epoch_us(ts) >=
                        (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
                         FROM ({events_sql}))
                        THEN 1 ELSE 0 END AS late
            FROM ({events_sql})
        ),
        kh AS (
            SELECT event_type, v,
                   CAST(SUM(1 - late) AS BIGINT) AS c1,
                   CAST(SUM(late) AS BIGINT) AS c2
            FROM kb GROUP BY 1, 2
        ),
        kr AS (
            SELECT event_type,
                   SUM(c1) OVER (PARTITION BY event_type ORDER BY v) AS k1,
                   SUM(c2) OVER (PARTITION BY event_type ORDER BY v) AS k2,
                   SUM(c1) OVER (PARTITION BY event_type) AS n1,
                   SUM(c2) OVER (PARTITION BY event_type) AS n2
            FROM kh
        )
        SELECT event_type,
               CAST(n1 AS BIGINT) AS n_early,
               CAST(n2 AS BIGINT) AS n_late,
               CAST(MAX(abs(k1 * n2 - k2 * n1)) AS BIGINT) AS d_num,
               CAST(MAX(abs(k1 * n2 - k2 * n1)) AS DOUBLE)
                   / CAST(n1 * n2 AS DOUBLE) AS d
        FROM kr
        WHERE n1 > 0 AND n2 > 0
        GROUP BY event_type, n1, n2"""


def rolling_median(
    ds,
    window: int = 7,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
):
    """Per-key rolling LOWER median of the last ``window`` values ordered
    by (ts, event_id) — the robust windowed statistic (median smoothing /
    outlier-resistant trend) Ray Data has no primitive for.

    Rule (identical in SQL): over the ≤window most recent values, the
    element at 1-based sorted rank ceil(cnt/2) — an integer rank pick on
    ×100-cents values, never an interpolated float (SQL ``median()`` is
    interpolation-ambiguous on even counts; a rank rule is not).

    Scale shape: co-partition by key, one in-group mergesort, then a
    vectorized sliding-window sort (n×window matrix per group, groups
    bounded per user).

    Output: (event_id, key, roll_med_c:int64).
    """
    import numpy as np

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "rolling_median")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        cents = to_cents(g[val_col].to_numpy())
        n = cents.shape[0]
        # window matrix with +inf padding before the series start
        pad = np.full(window - 1, np.iinfo(np.int64).max, np.int64)
        ext = np.concatenate([pad, cents])
        idx = np.arange(n)[:, None] + np.arange(window)[None, :]
        win = np.sort(ext[idx], axis=1)  # padding sorts to the high end
        cnt = np.minimum(np.arange(n) + 1, window)
        med = win[np.arange(n), (cnt - 1) // 2]  # rank ceil(cnt/2), 0-based
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                key: g[key].to_numpy(),
                "roll_med_c": med,
            }
        )

    return (
        ds.select_columns(["event_id", key, ts_col, val_col])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_key), batch_format="pandas")
    )


def rolling_median_sql(
    window: int = 7,
    key: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> str:
    """Oracle twin of :func:`rolling_median` — explicit rank pick over a
    band self-join (no dependence on SQL median() semantics)."""
    return f"""
        WITH rm_r AS (
            SELECT event_id, {key},
                   CAST(round({val_col} * 100, 0) AS BIGINT) AS v_c,
                   ROW_NUMBER() OVER (
                       PARTITION BY {key} ORDER BY {ts_col}, event_id
                   ) AS rn
            FROM events
        ),
        rm_w AS (
            SELECT a.event_id, a.{key}, a.rn, b.v_c
            FROM rm_r a JOIN rm_r b
              ON b.{key} = a.{key}
             AND b.rn BETWEEN a.rn - {window - 1} AND a.rn
        ),
        rm_k AS (
            SELECT event_id, {key}, v_c,
                   ROW_NUMBER() OVER (
                       PARTITION BY {key}, rn ORDER BY v_c
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY {key}, rn) AS cnt
            FROM rm_w
        )
        SELECT event_id, {key}, CAST(v_c AS BIGINT) AS roll_med_c
        FROM rm_k WHERE rk = (cnt + 1) // 2"""


def cusum_changepoint(ds):
    """Per-key CUSUM changepoint over the event VALUE stream in event-time
    order: the index that maximizes the centered cumulative deviation
    |S_i·n − i·S_n| — the standard single-changepoint location statistic
    (where the level of a user's value stream shifts), in pure integers.

    Exactness: values quantize by the house cents rule (`to_cents`, SQL
    round); S_i, n, S_n and the cross-multiplied deviation are int64 (no
    division anywhere); the winner is the explicit (dev DESC, i ASC)
    order — deterministic under any partitioning at any stream length.

    Scale shape: hash-bucketed users (the funnel co-partitioning), one
    vectorized pandas pass per bucket: groupby-transform cumsums, packed-
    key idxmax — no per-user Python.

    Output: (user_id, n:int64, cp_idx:int64, max_dev_xn:int64).
    """
    import numpy as np

    from ..state.hashing import splitmix64
    from ..state.money import to_cents
    from .zonal import _default_buckets

    nb = _default_buckets(None)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        k = df["user_id"].to_numpy(np.int64).view(np.uint64)
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "ts": df["ts"].to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "v": to_cents(df["value"].to_numpy()),
                "bucket": (splitmix64(k) % np.uint64(nb)).astype(np.int64),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        s = grp["v"].cumsum().to_numpy(np.int64)
        i = (grp.cumcount() + 1).to_numpy(np.int64)
        n = grp["v"].transform("size").to_numpy(np.int64)
        stot = grp["v"].transform("sum").to_numpy(np.int64)
        dev = np.abs(s * n - i * stot)
        out = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "n": n,
                "i": i,
                "dev": dev,
            }
        )
        # (user, dev DESC, i ASC) -> first row per user is the winner
        out = out.sort_values(
            ["user_id", "dev", "i"], ascending=[True, False, True],
            kind="mergesort",
        )
        win = out.drop_duplicates("user_id")
        return pd.DataFrame(
            {
                "user_id": win["user_id"].to_numpy(),
                "n": win["n"].to_numpy(np.int64),
                "cp_idx": win["i"].to_numpy(np.int64),
                "max_dev_xn": win["dev"].to_numpy(np.int64),
            }
        )

    return (
        ds.select_columns(["user_id", "ts", "event_id", "value"])
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["user_id", "n", "cp_idx", "max_dev_xn"])
    )


def cusum_changepoint_sql(events_sql: str) -> str:
    """Oracle twin: window cumsums in the same (ts, event_id) order,
    identical integer deviation, (dev DESC, i ASC) QUALIFY winner."""
    return f"""
        cu_c AS (
            SELECT user_id, ts, event_id,
                   CAST(round(value * 100.0, 0) AS BIGINT) AS v
            FROM ({events_sql})
        ),
        cu_w AS (
            SELECT user_id,
                   row_number() OVER win AS i,
                   SUM(v) OVER win AS s,
                   COUNT(*) OVER (PARTITION BY user_id) AS n,
                   SUM(v) OVER (PARTITION BY user_id) AS stot
            FROM cu_c
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING)
        ),
        cu_d AS (
            SELECT user_id, n, i, abs(s * n - i * stot) AS dev
            FROM cu_w
        )
        SELECT user_id, CAST(n AS BIGINT) AS n,
               CAST(i AS BIGINT) AS cp_idx,
               CAST(dev AS BIGINT) AS max_dev_xn
        FROM cu_d QUALIFY row_number() OVER (
            PARTITION BY user_id ORDER BY dev DESC, i ASC
        ) = 1"""


def event_paths(ds, k: int = 3, key: str = "user_id", ts_col: str = "ts"):
    """User-journey histogram: each user's first ``k`` event types in
    (ts, event_id) order joined with '>' — the ordered collect_list /
    string_agg primitive Ray Data lacks — then an exact count per distinct
    path.  The funnel-analytics product ("which journeys happen, how
    often") over a 100 TB log.

    Scale shape: ONE co-partition by user (groups bounded per user,
    in-group mergesort + head(k) + join), emitting exactly one skinny
    (path) row per user; the path histogram folds through per-batch Arrow
    group counts + a bucketed combine — the second exchange moves one row
    per DISTINCT path per batch, never the user table.

    Output: (path:string, n_users:int64).  Default k=3: at the gate
    corpus k=8 made every user's path unique (n_users ≡ 1 — a
    degenerate histogram); k=3 exercises real collisions (counts 1–5).
    """
    from ray.data.aggregate import Sum

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "event_paths")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort").head(k)
        return pd.DataFrame(
            {"path": [">".join(g["event_type"].astype(str))]}
        )

    paths = (
        ds.select_columns([key, ts_col, "event_id", "event_type"])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_user), batch_format="pandas")
    )

    def count(t: pa.Table) -> pa.Table:
        out = t.group_by(["path"]).aggregate([([], "count_all")])
        return out.rename_columns(["path", "n_users"])

    from .zonal import bucketed_sum

    return bucketed_sum(
        paths.map_batches(count, batch_format="pyarrow"),
        ["path"],
        ["n_users"],
    )


def event_paths_sql(k: int = 3, key: str = "user_id", ts_col: str = "ts") -> str:
    """Oracle twin of :func:`event_paths`: ROW_NUMBER ordering, ordered
    string_agg, grouped count."""
    return f"""
        WITH ep_r AS (
            SELECT {key}, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY {key} ORDER BY {ts_col}, event_id
                   ) AS rn
            FROM events
        ),
        ep_p AS (
            SELECT {key},
                   string_agg(event_type, '>' ORDER BY rn) AS path
            FROM ep_r WHERE rn <= {k} GROUP BY {key}
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM ep_p GROUP BY path"""


AUTOCORR_LAGS = 12


def event_autocorr(ds, max_lag: int = AUTOCORR_LAGS):
    """Lag-k Pearson autocorrelation of each event type's hourly arrival
    counts — the periodicity detector (daily/weekly seasonality, bot
    cadence) a monitoring pipeline runs over a 100 TB log.

    The series is the DENSE hourly count vector over the table's global
    [min, max] hour (missing hours count 0 — dropping them would fake
    correlation).  All moment sums are exact int64 (counts are integers);
    r is ONE pinned IEEE expression num/(sqrt(dx)·sqrt(dy)) (two sqrts —
    dx·dy would overflow int64), 0.0 when either variance is zero.

    Scale shape: per-(type, hour) counts via in-batch Arrow group counts +
    the bucketed combine; the dense lag fold runs on the driver over a
    CALENDAR-bounded table (|types|·|hours| rows — grows with time span,
    never with corpus size).

    Output: (event_type, lag, n, num, dx, dy, r) for lag = 1..max_lag.
    """
    import numpy as np

    from .zonal import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        h = ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        g = (
            pa.table({"event_type": t.column("event_type"), "h": pa.array(h)})
            .group_by(["event_type", "h"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "h", "c"])

    counts = bucketed_sum(
        ds.select_columns(["event_type", "ts"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["event_type", "h"],
        ["c"],
    ).to_pandas()  # calendar-bounded: |types| x |hours in span|

    lo, hi = int(counts["h"].min()), int(counts["h"].max())
    span = hi - lo + 1
    out = []
    for et, d in counts.groupby("event_type"):
        v = np.zeros(span, np.int64)
        v[d["h"].to_numpy(np.int64) - lo] = d["c"].to_numpy(np.int64)
        for lag in range(1, max_lag + 1):
            x, y = v[: span - lag], v[lag:]
            n = np.int64(len(x))
            sx, sy = x.sum(), y.sum()
            num = int(n * (x * y).sum() - sx * sy)
            dx = int(n * (x * x).sum() - sx * sx)
            dy = int(n * (y * y).sum() - sy * sy)
            r = (
                float(num) / (np.sqrt(float(dx)) * np.sqrt(float(dy)))
                if dx > 0 and dy > 0
                else 0.0
            )
            out.append((et, lag, int(n), num, dx, dy, r))
    return pd.DataFrame(
        out, columns=["event_type", "lag", "n", "num", "dx", "dy", "r"]
    )


def event_autocorr_sql(max_lag: int = AUTOCORR_LAGS) -> str:
    """Oracle twin of :func:`event_autocorr`: dense hour grid via
    generate_series over the global range, lag self-join, exact integer
    moments, the identical pinned r expression."""
    lags = ", ".join(f"({k})" for k in range(1, max_lag + 1))
    return f"""
        WITH ac_h AS (
            SELECT event_type,
                   epoch_us(ts) // 3600000000 AS h,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        ac_mm AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM ac_h),
        ac_grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM ac_h) t
            CROSS JOIN (
                SELECT unnest(generate_series(mn, mx)) AS h FROM ac_mm
            ) g
        ),
        ac_s AS (
            SELECT g.event_type, g.h, COALESCE(c.c, 0) AS v
            FROM ac_grid g LEFT JOIN ac_h c
              ON c.event_type = g.event_type AND c.h = g.h
        ),
        ac_p AS (
            SELECT a.event_type, l.lag, a.v AS x, b.v AS y
            FROM ac_s a
            CROSS JOIN (VALUES {lags}) l(lag)
            JOIN ac_s b ON b.event_type = a.event_type
                       AND b.h = a.h + l.lag
        ),
        ac_a AS (
            SELECT event_type, lag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM ac_p GROUP BY 1, 2
        )
        SELECT event_type, CAST(lag AS BIGINT) AS lag, n,
               CAST(n * sxy - sx * sy AS BIGINT) AS num,
               CAST(n * sxx - sx * sx AS BIGINT) AS dx,
               CAST(n * syy - sy * sy AS BIGINT) AS dy,
               CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                    THEN CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                    ELSE 0.0 END AS r
        FROM ac_a"""


def event_runs(ds, key: str = "user_id", ts_col: str = "ts"):
    """Gaps-and-islands run-length encoding per user: maximal runs of the
    SAME event type in (ts, event_id) order — the streak/stint primitive
    (session behavior, sensor-state dwell) behind the classic SQL
    rn−rn_by_value trick.

    Deterministic winner: the longest run, ties broken by earliest start
    position.  Pure integers throughout.

    Scale shape: co-partition by user (groups bounded per user), one
    in-group mergesort + boundary-mask cumsum — no window self-joins.

    Output: (user_id, n_events, n_runs, longest_run, longest_type).
    """
    import numpy as np

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        _guard_group(g, "event_runs")
        g = g.sort_values([ts_col, "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        n = len(et)
        brk = np.ones(n, np.int64)
        brk[1:] = (et[1:] != et[:-1]).astype(np.int64)
        rid = np.cumsum(brk) - 1
        lens = np.bincount(rid)
        starts = np.nonzero(brk)[0]
        best = int(np.argmax(lens))  # first max = earliest start
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [n],
                "n_runs": [len(lens)],
                "longest_run": [int(lens[best])],
                "longest_type": [et[starts[best]]],
            }
        )

    return (
        ds.select_columns([key, ts_col, "event_id", "event_type"])
        .map_batches(_add_key_bucket(key), batch_format="pandas")
        .groupby("__kb")
        .map_groups(_per_bucket_fn(key, per_user), batch_format="pandas")
    )


def event_runs_sql(key: str = "user_id", ts_col: str = "ts") -> str:
    """Oracle twin of :func:`event_runs`: the rn − rn_by_type islands
    trick, per-island counts, (len DESC, start ASC) winner."""
    return f"""
        WITH er_r AS (
            SELECT {key}, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY {key} ORDER BY {ts_col}, event_id
                   ) AS rn,
                   ROW_NUMBER() OVER (
                       PARTITION BY {key}, event_type
                       ORDER BY {ts_col}, event_id
                   ) AS rnt
            FROM events
        ),
        er_i AS (
            SELECT {key}, event_type, rn - rnt AS isl,
                   CAST(COUNT(*) AS BIGINT) AS run_len,
                   CAST(MIN(rn) AS BIGINT) AS run_start
            FROM er_r GROUP BY 1, 2, 3
        ),
        er_u AS (
            SELECT {key},
                   CAST(SUM(run_len) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_runs
            FROM er_i GROUP BY 1
        ),
        er_w AS (
            SELECT {key}, run_len AS longest_run,
                   event_type AS longest_type
            FROM er_i
            QUALIFY row_number() OVER (
                PARTITION BY {key} ORDER BY run_len DESC, run_start ASC
            ) = 1
        )
        SELECT u.{key}, u.n_events, u.n_runs,
               w.longest_run, w.longest_type
        FROM er_u u JOIN er_w w ON w.{key} = u.{key}"""


KM_HOUR_US = 3_600_000_000
KM_VALUE_THRESHOLD = 100.0  # "conversion" = first purchase with value > this
# no-conversion sentinel: 2^62, deliberately clear of int64 max so
# min-combines over sentinel-adjacent values cannot overflow
_KM_SENTINEL = 1 << 62


def km_survival(
    ds,
    target_type: str = "purchase",
    value_threshold: float = KM_VALUE_THRESHOLD,
):
    """Kaplan-Meier time-to-conversion survival curve — per user, the time
    from their FIRST event to their first ``target_type`` event with
    value > ``value_threshold``; users who never convert are RIGHT-
    CENSORED at their last event.  The censoring-aware funnel statistic
    next to :func:`retention_cohorts` / `events_funnel`.

    Definitions (pinned, mirrored verbatim in SQL):
      * duration = (first conversion ts − first event ts) when a
        conversion exists (observed), else (last event ts − first event
        ts) (censored); floor-divided to integer HOURS (bounds the curve
        support by the calendar span, not the user count);
      * at each distinct hour d: n_risk(d) = #users with duration ≥ d
        (censored users count while at risk — the standard
        deaths-before-censorings convention), e(d) = conversions at d,
        and S(d) = Π_{d'≤d} (1 − e(d')/n_risk(d')) multiplied in
        ascending-hour order (left-to-right IEEE; e=0 factors are exactly
        1.0, so the engine skipping them is bit-identical to the oracle's
        recursive CTE walking every hour).

    Scale shape: per-batch (user, min-ts, max-ts, min-conversion-ts)
    partials → ONE bucketed min/max combine (the only corpus-sized
    exchange; the no-conversion case rides a +inf sentinel through the
    min); an in-batch histogram collapses the per-user table to
    calendar-bounded (hour, e, n) rows, which is all the driver folds.

    Output (hours with e > 0): (dur_hours:int64, n_risk:int64,
    n_events:int64, survival:f64).
    """
    import numpy as np
    import ray.data as rd

    from ..stages.zonal import bucketed_combine, bucketed_sum

    sent = np.int64(_KM_SENTINEL)

    def user_partial(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        conv = (et == target_type) & (val > value_threshold)
        tc = np.where(conv, ts, sent)
        g = (
            pa.table(
                {
                    "user_id": t.column("user_id").cast(pa.int64()),
                    "tf": pa.array(ts),
                    "tl": pa.array(ts),
                    "tc": pa.array(tc),
                }
            )
            .group_by(["user_id"])
            .aggregate([("tf", "min"), ("tl", "max"), ("tc", "min")])
        )
        return g.rename_columns(["user_id", "tf", "tl", "tc"])

    users = bucketed_combine(
        ds.map_batches(user_partial, batch_format="pyarrow"),
        keys=["user_id"],
        aggs={"tf": "min", "tl": "max", "tc": "min"},
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        import numpy as np

        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        tl = t.column("tl").to_numpy(zero_copy_only=False).astype(np.int64)
        tc = t.column("tc").to_numpy(zero_copy_only=False).astype(np.int64)
        obs = tc != np.int64(_KM_SENTINEL)
        dur = np.where(obs, tc - tf, tl - tf)
        hour = dur // np.int64(KM_HOUR_US)
        g = (
            pa.table(
                {
                    "dur_hours": pa.array(hour),
                    "e": pa.array(obs.astype(np.int64)),
                    "n": pa.array(np.ones(len(hour), np.int64)),
                }
            )
            .group_by(["dur_hours"])
            .aggregate([("e", "sum"), ("n", "sum")])
        )
        return g.rename_columns(["dur_hours", "e", "n"])

    hist = (
        bucketed_sum(
            users.map_batches(hist_partial, batch_format="pyarrow"),
            ["dur_hours"],
            ["e", "n"],
            recombine_batch_size=None,
        )
        .to_pandas()  # calendar-bounded: ≤ window-span hours rows
        .sort_values("dur_hours", kind="mergesort")
    )
    empty = pa.table(
        {
            "dur_hours": pa.array([], pa.int64()),
            "n_risk": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "survival": pa.array([], pa.float64()),
        }
    )
    if len(hist) == 0:
        return rd.from_arrow(empty)
    e = hist["e"].to_numpy(np.int64)
    n = hist["n"].to_numpy(np.int64)
    hours = hist["dur_hours"].to_numpy(np.int64)
    n_risk = n[::-1].cumsum()[::-1]  # Σ_{d'≥d} (observed + censored)
    s = np.float64(1.0)
    out = []
    for h, ee, nr in zip(hours.tolist(), e.tolist(), n_risk.tolist()):
        s = s * (np.float64(1.0) - np.float64(ee) / np.float64(nr))
        if ee > 0:
            out.append((h, nr, ee, float(s)))
    return rd.from_arrow(
        pa.table(
            {
                "dur_hours": pa.array([r[0] for r in out], pa.int64()),
                "n_risk": pa.array([r[1] for r in out], pa.int64()),
                "n_events": pa.array([r[2] for r in out], pa.int64()),
                "survival": pa.array([r[3] for r in out], pa.float64()),
            }
        )
    )


def km_survival_sql(
    events_sql: str,
    target_type: str = "purchase",
    value_threshold: float = KM_VALUE_THRESHOLD,
) -> str:
    """Oracle twin of :func:`km_survival`: identical conversion/censor/hour
    rules in exact integers, descending-cumsum risk set, and a recursive
    CTE multiplying (1 − e/n_risk) in ascending-hour order — the same
    left-to-right IEEE product as the engine (e=0 factors are exactly 1)."""
    return f"""
        km_u AS (
            SELECT user_id,
                   CAST(min(epoch_us(ts)) AS BIGINT) AS tf,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS tl,
                   min(CASE WHEN event_type = '{target_type}'
                             AND value > {value_threshold!r}
                            THEN CAST(epoch_us(ts) AS BIGINT) END) AS tc
            FROM ({events_sql}) GROUP BY user_id
        ),
        km_d AS (
            SELECT (CASE WHEN tc IS NOT NULL THEN tc - tf
                         ELSE tl - tf END) // {KM_HOUR_US} AS dur_hours,
                   CASE WHEN tc IS NOT NULL THEN 1 ELSE 0 END AS obs
            FROM km_u
        ),
        km_h AS (
            SELECT dur_hours,
                   CAST(SUM(obs) AS BIGINT) AS e,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM km_d GROUP BY dur_hours
        ),
        km_r AS (
            SELECT dur_hours, e,
                   CAST(SUM(n) OVER (ORDER BY dur_hours DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS n_risk,
                   CAST(ROW_NUMBER() OVER (ORDER BY dur_hours) AS BIGINT)
                       AS rn
            FROM km_h
        ),
        km_walk AS (
            SELECT rn, dur_hours, e, n_risk,
                   1.0 * (1.0 - CAST(e AS DOUBLE) / CAST(n_risk AS DOUBLE))
                       AS s
            FROM km_r WHERE rn = 1
            UNION ALL
            SELECT r.rn, r.dur_hours, r.e, r.n_risk,
                   w.s * (1.0 - CAST(r.e AS DOUBLE)
                                / CAST(r.n_risk AS DOUBLE)) AS s
            FROM km_walk w JOIN km_r r ON r.rn = w.rn + 1
        )
        SELECT dur_hours, n_risk, e AS n_events, s AS survival
        FROM km_walk WHERE e > 0"""


def burstiness(ds):
    """Fano factor (index of dispersion) per event type over occupied
    hourly buckets — the standard burstiness/overdispersion diagnostic
    for an arrival stream (≈1 Poisson, >1 bursty, <1 regular):

        F = Var(c)/Mean(c) over the per-hour counts c

    (population variance, occupied hours only — both conventions pinned
    into the oracle).  Fully decomposable: per-batch (type, epoch-hour)
    integer counts → hash-bucketed sum → per-type (n_hours, Σc, Σc²)
    partials → one tiny grouped sum; only |types| rows reach the driver
    and every double is a pinned chain of the three integer sums.

    Output: (event_type:string, n_hours:int64, c_sum:int64, c2_sum:int64,
    fano:f64), types sorted.
    """
    import ray.data as rd

    from ray.data.aggregate import Sum

    from .zonal import bucketed_sum

    import numpy as np

    HOUR_NS = 3_600_000_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # pin the resolution: arrow timestamps arrive as datetime64[us]
        # under pandas 2.x, so normalize to ns before the epoch division
        h = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // HOUR_NS
        out = (
            pd.DataFrame({"event_type": df["event_type"].to_numpy(), "h": h})
            .groupby(["event_type", "h"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        return out

    hourly = bucketed_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "h"],
        ["c"],
    )

    def type_partial(t: pa.Table) -> pa.Table:
        import numpy as np

        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "n_hours": pa.array(np.ones(len(c), np.int64)),
                    "c_sum": pa.array(c),
                    "c2_sum": pa.array(c * c),
                }
            )
            .group_by(["event_type"])
            .aggregate([("n_hours", "sum"), ("c_sum", "sum"), ("c2_sum", "sum")])
        )
        return g.rename_columns(["event_type", "n_hours", "c_sum", "c2_sum"])

    agg = (
        hourly.map_batches(type_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_hours", alias_name="n_hours"),
            Sum("c_sum", alias_name="c_sum"),
            Sum("c2_sum", alias_name="c2_sum"),
        )
        .to_pandas()  # ≤ |types| rows
    )
    agg = agg.sort_values("event_type", kind="mergesort").reset_index(drop=True)
    h = agg["n_hours"].to_numpy(np.int64).astype(np.float64)
    cs = agg["c_sum"].to_numpy(np.int64).astype(np.float64)
    c2 = agg["c2_sum"].to_numpy(np.int64).astype(np.float64)
    mean = cs / h
    fano = (c2 / h - mean * mean) / mean
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(agg["event_type"].astype(str).tolist()),
                "n_hours": pa.array(agg["n_hours"].to_numpy(np.int64)),
                "c_sum": pa.array(agg["c_sum"].to_numpy(np.int64)),
                "c2_sum": pa.array(agg["c2_sum"].to_numpy(np.int64)),
                "fano": pa.array(fano, pa.float64()),
            }
        )
    )


def peak_hours(ds):
    """Peak-hour profile per event type — the diurnal-rhythm rollup
    (which hour of day does each stream peak, and how concentrated is
    it): per (type, hour-of-day 0–23) exact counts, the peak hour via
    the pack-max trick (count·32 + (31 − hour) → max ⇒ highest count,
    then EARLIEST hour), and the peak share as ONE pinned division.

    Output: (event_type:string, peak_hour:int64, peak_n:int64,
    total:int64, share:f64), types sorted.
    """
    import numpy as np

    import ray.data as rd

    from .zonal import bucketed_sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ns = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        hour = (ns // 3_600_000_000_000) % 24
        out = (
            pd.DataFrame(
                {"event_type": df["event_type"].to_numpy(), "hour": hour}
            )
            .groupby(["event_type", "hour"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out

    hourly = bucketed_sum(
        ds.select_columns(["event_type", "ts"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "hour"],
        ["n"],
    ).to_pandas()  # ≤ |types|·24 rows
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "peak_hour": pa.array([], pa.int64()),
            "peak_n": pa.array([], pa.int64()),
            "total": pa.array([], pa.int64()),
            "share": pa.array([], pa.float64()),
        }
    )
    if len(hourly) == 0:
        return rd.from_arrow(empty)
    hourly["score"] = hourly["n"].to_numpy(np.int64) * np.int64(32) + (
        np.int64(31) - hourly["hour"].to_numpy(np.int64)
    )
    g = hourly.groupby("event_type", as_index=False).agg(
        score=("score", "max"), total=("n", "sum")
    )
    g = g.sort_values("event_type", kind="mergesort").reset_index(drop=True)
    score = g["score"].to_numpy(np.int64)
    peak_n = score // 32
    peak_hour = np.int64(31) - (score % np.int64(32))
    total = g["total"].to_numpy(np.int64)
    share = peak_n.astype(np.float64) / total.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(g["event_type"].astype(str).tolist()),
                "peak_hour": pa.array(peak_hour, pa.int64()),
                "peak_n": pa.array(peak_n, pa.int64()),
                "total": pa.array(total, pa.int64()),
                "share": pa.array(share, pa.float64()),
            }
        )
    )


def activation_latency(ds, from_type: str = "signup", to_type: str = "purchase"):
    """Activation latency per user — the onboarding funnel's core
    number: time from a user's FIRST ``from_type`` event to their FIRST
    ``to_type`` event (users missing either side are dropped; a negative
    latency means the target preceded the trigger and is reported as-is
    — it is a data fact, not an error).

    PURE INTEGER: epoch-microsecond minimums per (user, side) through
    the bucketed combine, one skinny merge on the user-bounded table.

    Output: (user_id:int64, from_us:int64, to_us:int64,
    latency_us:int64), users sorted.
    """
    import numpy as np

    import ray.data as rd

    from .zonal import bucketed_combine

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["event_type"].isin([from_type, to_type])
        df = df.loc[m]
        us = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1000
        return (
            pd.DataFrame(
                {
                    "user_id": df["user_id"].to_numpy(np.int64),
                    "side": (df["event_type"] == to_type)
                    .to_numpy()
                    .astype(np.int64),
                    "first_us": us,
                }
            )
            .groupby(["user_id", "side"], as_index=False)
            .agg(first_us=("first_us", "min"))
        )

    firsts = bucketed_combine(
        ds.select_columns(["user_id", "event_type", "ts"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["user_id", "side"],
        {"first_us": "min"},
    ).to_pandas()  # ≤ 2·|users| rows — user-bounded
    empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "from_us": pa.array([], pa.int64()),
            "to_us": pa.array([], pa.int64()),
            "latency_us": pa.array([], pa.int64()),
        }
    )
    if len(firsts) == 0:
        return rd.from_arrow(empty)
    piv = firsts.pivot_table(
        index="user_id", columns="side", values="first_us", aggfunc="min"
    )
    if 0 not in piv.columns or 1 not in piv.columns:
        return rd.from_arrow(empty)
    both = piv.dropna(subset=[0, 1])
    both = both.sort_index()
    f = both[0].to_numpy(np.int64)
    t = both[1].to_numpy(np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(both.index.to_numpy(np.int64)),
                "from_us": pa.array(f, pa.int64()),
                "to_us": pa.array(t, pa.int64()),
                "latency_us": pa.array(t - f, pa.int64()),
            }
        )
    )


def user_entropy(ds):
    """Per-user behavioral entropy — event-type diversity (0 = one-note
    bots/single-purpose accounts, high = diverse engagement), the
    per-entity companion of the landscape Shannon family:

        H_u = Σ_types −(n/N_u)·ln(n/N_u)

    Exactness: type counts exact; each term floor-quantizes to
    ⌊−p·ln p·2³⁰⌋ (libm ln, order-free int sums per user); H is one
    pinned h_q/2³⁰ scaling.  Scale shape: (user, type) bucketed counts,
    whole users per hash bucket, vectorized segment folds.

    Output: (user_id:int64, n_events:int64, h_q:int64, entropy:f64),
    users sorted (n_types is omitted: at gate scale every user touches
    every type, which would read as a degenerate constant column —
    events_pivot carries the per-type breakdown).
    """
    import math

    import numpy as np

    import ray.data as rd

    from .zonal import _add_bucket, _default_buckets, bucketed_sum

    S = float(1 << 30)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["user_id", "event_type", "n"])

    ut = bucketed_sum(
        ds.select_columns(["user_id", "event_type"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["user_id", "event_type"],
        ["n"],
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        o = np.argsort(uid, kind="mergesort")
        uid, n = uid[o], n[o]
        starts = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        lens = np.diff(np.concatenate((starts, [len(uid)])))
        tot = np.repeat(np.add.reduceat(n, starts), lens)
        p = n.astype(np.float64) / tot.astype(np.float64)
        log_u = np.frompyfunc(math.log, 1, 1)
        terms = np.floor(-(p * log_u(p).astype(np.float64)) * S).astype(np.int64)
        hq = np.add.reduceat(terms, starts)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": np.add.reduceat(n, starts),
                "h_q": hq,
            }
        )

    rep = (
        _add_bucket(ut, ["user_id"], _default_buckets())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["user_id", "n_events", "h_q"])
    )

    def finalize(t: pa.Table) -> pa.Table:
        hq = t.column("h_q").to_numpy(zero_copy_only=False)
        return t.append_column(
            "entropy", pa.array(hq.astype(np.float64) / S, pa.float64())
        )

    return rep.map_batches(finalize, batch_format="pyarrow")


def punchcard(ds):
    """The activity punchcard — day-of-week × hour-of-day event counts
    (the classic engagement heat-map): pure integer epoch arithmetic on
    both sides (dow = (epoch_days + 4) mod 7, 0 = Sunday — no locale or
    timezone functions anywhere), exact counts, pinned share of total.

    Output: (dow:int64, hour:int64, n:int64, share:f64), sorted.
    """
    import numpy as np

    import ray.data as rd

    from .zonal import bucketed_sum

    HOUR_NS = 3_600_000_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ns = df["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        hours = ns // HOUR_NS
        hour = hours % 24
        days = hours // 24
        dow = (days + 4) % 7
        return (
            pd.DataFrame({"dow": dow, "hour": hour})
            .groupby(["dow", "hour"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    rep = (
        bucketed_sum(
            ds.select_columns(["ts"]).map_batches(partial, batch_format="pandas"),
            ["dow", "hour"],
            ["n"],
        )
        .to_pandas()  # ≤ 168 rows
        .sort_values(["dow", "hour"], kind="mergesort")
        .reset_index(drop=True)
    )
    empty = pa.table(
        {
            "dow": pa.array([], pa.int64()),
            "hour": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "share": pa.array([], pa.float64()),
        }
    )
    if len(rep) == 0:
        return rd.from_arrow(empty)
    n = rep["n"].to_numpy(np.int64)
    total = int(n.sum())
    share = n.astype(np.float64) / np.float64(total)
    return rd.from_arrow(
        pa.table(
            {
                "dow": pa.array(rep["dow"].to_numpy(np.int64)),
                "hour": pa.array(rep["hour"].to_numpy(np.int64)),
                "n": pa.array(n, pa.int64()),
                "share": pa.array(share, pa.float64()),
            }
        )
    )
