"""As-of and interval (range) joins over the events table — the temporal
join shapes Ray Data lacks as primitives (stages/events.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kaza_lcms_ray.stages import events


def _mk_events():
    # two users; interleaved views (v) and purchases (p), one orphan purchase
    rows = [
        # user 1: view@10, purchase@15 (match 100, lag 5s), view@20,
        #         purchase@20 (equal ts -> matches 102), purchase@5 (orphan)
        (100, 10, 1, "view", 1.0),
        (101, 15, 1, "purchase", 2.0),
        (102, 20, 1, "view", 3.0),
        (103, 20, 1, "purchase", 4.0),
        (104, 5, 1, "purchase", 5.0),
        # user 2: single view after its purchase -> orphan purchase
        (200, 50, 2, "purchase", 6.0),
        (201, 60, 2, "view", 7.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "s", "user_id", "event_type", "value"])
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df.pop("s"), unit="s")
    return df[["event_id", "ts", "user_id", "event_type", "value"]]


def test_asof_join_hand_oracle(ray_session):
    out = (
        events.asof_join(rd.from_pandas(_mk_events()).repartition(3))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = {r.event_id: (r.matched_event_id, r.lag_us) for r in out.itertuples()}
    assert got[101] == (100, 5_000_000)
    assert got[103] == (102, 0)  # equal ts counts as "at or before"
    assert got[104] == (-1, -1)  # no prior view
    assert got[200] == (-1, -1)  # view comes later
    assert set(got) == {101, 103, 104, 200}


def test_asof_right_ts_tie_keeps_max_id(ray_session):
    df = _mk_events()
    # duplicate view ts for user 1 at s=10 with a higher event_id
    extra = df.iloc[[0]].assign(event_id=150)
    ds = rd.from_pandas(pd.concat([df, extra], ignore_index=True))
    out = events.asof_join(ds).to_pandas()
    row = out[out.event_id == 101].iloc[0]
    assert row.matched_event_id == 150


def test_interval_join_hand_oracle(ray_session):
    # sessions from NON-error events (gap 30 min); errors land inside or out
    rows = [
        (1, 0, 7, "click", 0.0),
        (2, 600, 7, "view", 0.0),  # same session as event 1
        (3, 10_000, 7, "click", 0.0),  # second session (gap > 30 min)
        (10, 300, 7, "error", 0.0),  # inside session 1
        (11, 5_000, 7, "error", 0.0),  # between sessions -> -1
        (12, 10_000, 7, "error", 0.0),  # exactly at session-2 start
    ]
    df = pd.DataFrame(rows, columns=["event_id", "s", "user_id", "event_type", "value"])
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df.pop("s"), unit="s")
    out = (
        events.interval_join(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("event_id")
    )
    got = dict(zip(out.event_id, out.session_id))
    assert got == {10: 1, 11: -1, 12: 3}


def test_interval_join_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 200_000, n), unit="s"),
            "user_id": rng.integers(0, 9, n),
            "event_type": rng.choice(["view", "click", "error"], n),
            "value": rng.random(n),
        }
    )
    a = events.interval_join(rd.from_pandas(df)).to_pandas().sort_values("event_id")
    b = (
        events.interval_join(rd.from_pandas(df).repartition(7))
        .to_pandas()
        .sort_values("event_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_forward_fill_locf_hand(ray_session):
    """LOCF: marks carry forward in (ts, event_id) order, -1 before the
    first mark, per key independently; reshard-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages.events import forward_fill

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
         "2024-01-01 03:00", "2024-01-01 00:30", "2024-01-01 01:30"]
    )
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [7, 7, 7, 7, 8, 8],
            "ts": ts,
            "event_type": ["view", "purchase", "click", "purchase", "click", "view"],
            "value": [9.0, 1.25, 9.0, 2.5, 9.0, 9.0],
        }
    )
    expect = {1: -1, 2: 125, 3: 125, 4: 250, 5: -1, 6: -1}
    ds = rd.from_pandas(df)
    for d in (ds, ds.repartition(4)):
        out = forward_fill(d).to_pandas()
        got = dict(zip(out["event_id"], out["last_mark_cents"]))
        assert got == expect


def test_ewma_matches_naive_recurrence(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events as ev

    rng = np.random.RandomState(11)
    n = 600
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 7, n).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10_000_000, n), unit="s"),
            "value": np.round(rng.rand(n) * 500, 2),
        }
    )
    # unique (user, ts) like the driver table, so the order is total
    df = df.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    naive = {}
    state = {}
    for _, r in df.sort_values(["user_id", "ts", "event_id"]).iterrows():
        v = int(np.copysign(np.floor(abs(r["value"]) * 100 + 0.5), r["value"]))
        u = r["user_id"]
        y = v if u not in state else (v + 3 * state[u]) // 4
        state[u] = y
        naive[r["event_id"]] = y
    for nblocks in (1, 5):
        got = (
            ev.ewma(rd.from_pandas(df).repartition(nblocks))
            .to_pandas()
            .set_index("event_id")
        )
        for eid in df["event_id"]:
            assert int(got.loc[eid, "ewma_cents"]) == naive[eid], eid


def test_funnel_ordering_and_retention_cells(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events as ev

    # user 1: full ordered funnel; user 2: purchase BEFORE view (stage 3
    # must not count); user 3: view only
    rows = [
        (1, 1, "2024-01-01 00:00", "view"),
        (2, 1, "2024-01-01 00:05", "click"),
        (3, 1, "2024-01-01 00:10", "purchase"),
        (4, 2, "2024-01-01 00:00", "purchase"),
        (5, 2, "2024-01-01 00:05", "view"),
        (6, 2, "2024-01-01 00:10", "click"),
        (7, 3, "2024-01-01 00:00", "view"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["value"] = 1.0
    got = (
        ev.funnel(rd.from_pandas(df))
        .to_pandas()
        .set_index("user_id")["reached"]
        .to_dict()
    )
    assert got == {1: 3, 2: 2, 3: 1}

    # retention: user 1 active weeks 0 and 1 of its cohort; user 2 week 0
    rws = [
        (1, 1, "2024-01-01"),
        (2, 1, "2024-01-09"),  # 8 days later -> k=1
        (3, 2, "2024-01-02"),
    ]
    rdf = pd.DataFrame(rws, columns=["event_id", "user_id", "ts"])
    rdf["ts"] = pd.to_datetime(rdf["ts"])
    rdf["value"] = 0.0
    rdf["event_type"] = "view"
    out = (
        ev.retention_cohorts(rd.from_pandas(rdf))
        .to_pandas()
        .sort_values(["cohort", "k"])
        .reset_index(drop=True)
    )
    # epoch-week cohorts: user1 cohort week W, cells (W,0) and (W,1)
    ks = out.groupby("k")["n_users"].sum().to_dict()
    assert ks[0] == 2 and ks[1] == 1


def test_event_transitions_and_ab_test(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    # user 1: view->click->view ; user 2: view->click
    ev = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [1, 2, 3, 4, 5],
                    "user_id": [1, 1, 1, 2, 2],
                    "ts": pd.to_datetime(
                        [
                            "2024-01-01 00:00",
                            "2024-01-01 00:01",
                            "2024-01-01 00:02",
                            "2024-01-01 00:00",
                            "2024-01-01 00:05",
                        ]
                    ),
                    "event_type": ["view", "click", "view", "view", "click"],
                    "value": [1.0] * 5,
                }
            ),
            preserve_index=False,
        )
    )
    tr = events.event_transitions(ev).set_index(["from_type", "to_type"])
    assert tr.loc[("view", "click"), "n"] == 2
    assert tr.loc[("click", "view"), "n"] == 1
    assert tr.loc[("view", "click"), "p"] == 1.0  # view->click is view's only exit
    assert abs(tr["p"].groupby("from_type").sum() - 1.0).max() < 1e-12

    # A/B: user 2 (odd->B? 2%2=0 -> A) converts with 2 purchases, min 2
    ev2 = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [1, 2, 3, 4],
                    "user_id": [2, 2, 3, 4],
                    "ts": pd.to_datetime(["2024-01-01"] * 4),
                    "event_type": ["purchase", "purchase", "purchase", "view"],
                    "value": [1.0] * 4,
                }
            ),
            preserve_index=False,
        )
    )
    out = events.ab_test(ev2, min_events=2).iloc[0]
    # cohort A = even ids {2, 4}: conv {2}; cohort B = {3}: no conv
    assert (out["n_a"], out["conv_a"], out["n_b"], out["conv_b"]) == (2, 1, 1, 0)
    import math

    pool = 1.0 / 3.0
    want = (0.5 - 0.0) / math.sqrt(pool * (1 - pool) * (1 / 2.0 + 1 / 1.0))
    assert abs(out["z"] - want) < 1e-12


def test_rolling_active_users_window(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    # user 1 active day 0 and 10; user 2 active day 1
    ev = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [1, 2, 3, 4],
                    "user_id": [1, 1, 1, 2],
                    "ts": pd.to_datetime(
                        [
                            "1970-01-01 00:00",
                            "1970-01-01 09:00",
                            "1970-01-11 00:00",
                            "1970-01-02 00:00",
                        ]
                    ),
                    "event_type": ["view"] * 4,
                    "value": [1.0] * 4,
                }
            ),
            preserve_index=False,
        )
    )
    out = (
        events.rolling_active_users(ev, window_days=7)
        .to_pandas()
        .set_index("day")["wau"]
    )
    # observed days: 0, 1, 10. window(0) = {u1}; window(1) = {u1 (day0), u2};
    # window(10) = {u1} (day 10 only; days 0-1 are outside the trailing 7)
    assert out.to_dict() == {0: 1, 1: 2, 10: 1}


def test_mad_outliers_hand_check_and_reshard(ray_session):
    """Group A: values 1..9 plus a 100.0 spike -> median 5.00, MAD
    ~2.00; only the spike crosses 3*MAD.  Group B is constant -> MAD 0,
    every equal value stays inlier (dev 0 > 0 is false)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import events as E

    va = [float(x) for x in range(1, 10)] + [100.0]
    vb = [7.0] * 5
    df = pd.DataFrame(
        {
            "event_id": list(range(15)),
            "event_type": ["A"] * 10 + ["B"] * 5,
            "value": va + vb,
        }
    )
    for nblocks in (1, 4):
        out = (
            E.mad_outliers(rd.from_pandas(df).repartition(nblocks))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # A: n=10 -> rank 5 -> median 5.00 (500c); devs sorted:
        # 0,100,100,200,200,300,300,400,400,9500 -> rank 5 -> MAD 200c
        a = out[out["event_type"] == "A"]
        assert a[a["is_outlier"] == 1]["value_c"].tolist() == [10000]
        assert a["dev_c"].max() == 9500
        # value 9.00: dev |900-500|=400 <= 3*200 -> stays inlier
        assert (a[a["value_c"] == 900]["is_outlier"] == 0).all()
        b = out[out["event_type"] == "B"]
        assert (b["is_outlier"] == 0).all()
        assert (b["dev_c"] == 0).all()


def test_ks_drift_hand_check(ray_session):
    """Type A: early half all 1.00, late half all 2.00 -> D = 1 exactly
    (d_num = n1*n2).  Type B: identical halves -> D = 0.  Type C only
    exists early -> dropped (pinned rule)."""
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events as E

    ts = pd.to_datetime(
        ["2024-01-01", "2024-01-02", "2024-01-09", "2024-01-10"]
    )
    rows = []
    eid = 0
    for t0, v in zip(ts, [1.0, 1.0, 2.0, 2.0]):
        rows.append((eid, "A", t0, v)); eid += 1
    for t0, v in zip(ts, [5.0, 6.0, 5.0, 6.0]):
        rows.append((eid, "B", t0, v)); eid += 1
    rows.append((eid, "C", ts[0], 9.0)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "event_type", "ts", "value"])
    for nblocks in (1, 3):
        out = (
            E.ks_drift(rd.from_pandas(df).repartition(nblocks))
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        assert out["event_type"].tolist() == ["A", "B"]
        a = out.iloc[0]
        assert (a["n_early"], a["n_late"]) == (2, 2)
        assert a["d_num"] == 4 and a["d"] == 1.0
        b = out.iloc[1]
        assert b["d_num"] == 0 and b["d"] == 0.0


def test_rolling_median_rank_rule(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    # one user, values 5,1,9,2 -> window 3 lower medians:
    # [5]->5, [5,1]->1 (lower of even), [5,1,9]->5, [1,9,2]->2
    df = pd.DataFrame(
        {
            "event_id": ["e1", "e2", "e3", "e4"],
            "user_id": ["u"] * 4,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 01:00",
                 "2024-01-01 02:00", "2024-01-01 03:00"]
            ),
            "value": [5.0, 1.0, 9.0, 2.0],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        events.rolling_median(ds, window=3)
        .to_pandas()
        .set_index("event_id")["roll_med_c"]
    )
    assert out.to_dict() == {"e1": 500, "e2": 100, "e3": 500, "e4": 200}


def test_interval_union_merges_overlaps(ray_session):
    """Overlapping and touching intervals merge; disjoint ones don't;
    covered time is the exact union length."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    # user 1: [0,10s), [5s,15s) overlap -> one island of 15s;
    #         [20s,30s) separate  => 2 islands, 25s
    # user 2: [0,10s), [10s,20s) touch (10 > 10 false -> merge) => 1 island 20s
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:05",
                    "2024-01-01 00:00:20",
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:10",
                ]
            ),
            "value": [0.10, 0.10, 0.10, 0.10, 0.10],  # 10 cents -> 10 s
        }
    )
    ev = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        events.interval_union(ev).to_pandas().set_index("user_id").sort_index()
    )
    assert out.loc[1, "n_islands"] == 2
    assert out.loc[1, "covered_us"] == 25_000_000
    assert out.loc[2, "n_islands"] == 1
    assert out.loc[2, "covered_us"] == 20_000_000


def test_cusum_changepoint_bruteforce(ray_session):
    """A stream with an injected level shift locates the shift; result is
    partition-invariant; hand replay matches exactly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events as ev

    rows = []
    eid = 0
    for uid, shift_at in ((1, 10), (2, 25), (3, 5)):
        for i in range(40):
            v = 1.0 if i < shift_at else 9.0
            rows.append(
                {
                    "event_id": eid,
                    "user_id": uid,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "value": v,
                }
            )
            eid += 1
    df = pd.DataFrame(rows)
    for ds in (rd.from_pandas(df), rd.from_pandas(df).repartition(4)):
        out = (
            ev.cusum_changepoint(ds)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        assert out["n"].tolist() == [40, 40, 40]
        # CUSUM max deviation lands exactly at the last pre-shift index
        assert out["cp_idx"].tolist() == [10, 25, 5]
        for _, r in out.iterrows():
            g = df[df["user_id"] == r["user_id"]].sort_values(
                ["ts", "event_id"]
            )
            v = np.round(g["value"].to_numpy() * 100).astype(np.int64)
            s = np.cumsum(v)
            i = np.arange(1, len(v) + 1, dtype=np.int64)
            dev = np.abs(s * len(v) - i * s[-1])
            k = np.lexsort((i, -dev))[0]
            assert r["cp_idx"] == i[k] and r["max_dev_xn"] == dev[k]


def test_event_paths_order_truncation_histogram(ray_session):
    """Paths follow (ts, event_id) order, truncate at k, and the histogram
    counts users per distinct path; repartition-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: a,b,a in ts order; ts tie broken by event_id (e2 before e3)
    rows += [
        (1, 10, base + pd.Timedelta(minutes=5), "b"),
        (1, 2, base, "a"),
        (1, 3, base, "x"),
    ]
    # user 2: same journey as nobody else, 5 events truncated to k=2
    rows += [(2, 20 + i, base + pd.Timedelta(minutes=i), t)
             for i, t in enumerate("abcde")]
    # user 3: identical journey to user 4
    rows += [(3, 30, base, "a"), (3, 31, base + pd.Timedelta(minutes=1), "x")]
    rows += [(4, 40, base, "a"), (4, 41, base + pd.Timedelta(minutes=1), "x")]
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "event_type"])
    out = (
        events.event_paths(rd.from_pandas(df).repartition(3), k=2)
        .to_pandas().sort_values("path").reset_index(drop=True)
    )
    got = dict(zip(out["path"], out["n_users"]))
    assert got == {"a>x": 3, "a>b": 1}
    out2 = (
        events.event_paths(rd.from_pandas(df), k=2)
        .to_pandas().sort_values("path").reset_index(drop=True)
    )
    assert out.equals(out2)


def test_event_autocorr_detects_planted_period(ray_session):
    """A period-6 arrival pattern peaks at lags 6 and 12; zeros for missing
    hours are real (dense series); matches numpy.corrcoef exactly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    base = pd.Timestamp("2024-03-01")
    rows = []
    eid = 0
    for h in range(0, 240):
        k = 5 if h % 6 == 0 else 1  # bursts every 6 hours
        for j in range(k):
            rows.append(("burst", eid, base + pd.Timedelta(hours=h, minutes=j)))
            eid += 1
    df = pd.DataFrame(rows, columns=["event_type", "event_id", "ts"])
    out = events.event_autocorr(rd.from_pandas(df).repartition(4)).set_index("lag")
    assert (out["n"] > 0).all()
    r6, r12 = out.loc[6, "r"], out.loc[12, "r"]
    others = out.drop(index=[6, 12])["r"]
    assert r6 > 0.9 and r12 > 0.9
    assert (others < 0.2).all()
    # exact agreement with numpy.corrcoef on the dense series
    v = np.array([5 if h % 6 == 0 else 1 for h in range(240)], np.float64)
    want = np.corrcoef(v[:-6], v[6:])[0, 1]
    assert abs(r6 - want) < 1e-12


def test_event_runs_hand_case(ray_session):
    """Run segmentation, counts, and the (longest, earliest) winner match a
    hand case including a tie."""
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    base = pd.Timestamp("2024-01-01")
    # user 1: a a b b c -> runs (a,2) (b,2) (c,1); tie a vs b -> a (earlier)
    seq = ["a", "a", "b", "b", "c"]
    rows = [
        (1, i, base + pd.Timedelta(minutes=i), t) for i, t in enumerate(seq)
    ]
    # user 2: single run
    rows += [(2, 10 + i, base + pd.Timedelta(minutes=i), "x") for i in range(3)]
    df = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "event_type"])
    out = (
        events.event_runs(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[1].tolist() == [5, 3, 2, "a"]
    assert out.loc[2].tolist() == [3, 1, 3, "x"]


def test_km_survival_textbook_case(ray_session):
    """Five users — conversions at 1h (×2) and 3h, censored at 2h and 4h:
    the classic KM table S(1)=3/5, S(3)=0.6·(1−1/2)=0.3; censored users
    hold the risk set but emit no curve row."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    eid = 0

    def add(uid, dt_hours, etype, value):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": base + pd.Timedelta(hours=dt_hours),
                "user_id": uid,
                "event_type": etype,
                "value": value,
                "props": "{}",
            }
        )
        eid += 1

    for uid, dur, observed in [
        (1, 1, True),
        (2, 1, True),
        (3, 2, False),
        (4, 3, True),
        (5, 4, False),
    ]:
        add(uid, 0, "signup", 0.0)
        if observed:
            add(uid, dur, "purchase", 200.0)  # > threshold: conversion
        else:
            add(uid, dur, "purchase", 50.0)  # below threshold: censored
    got = (
        events.km_survival(rd.from_pandas(pd.DataFrame(rows)))
        .to_pandas()
        .sort_values("dur_hours")
        .reset_index(drop=True)
    )
    assert got["dur_hours"].tolist() == [1, 3]
    assert got["n_risk"].tolist() == [5, 2]
    assert got["n_events"].tolist() == [2, 1]
    assert got["survival"].tolist() == [1.0 * (1.0 - 2.0 / 5.0),
                                        (1.0 - 2.0 / 5.0) * (1.0 - 1.0 / 2.0)]


def test_burstiness_hand_stream(ray_session):
    """Two types: 'a' = 3 events in one hour + 1 in another (counts 3,1:
    mean 2, var 1, fano 0.5); 'b' = 2 hours with 1 each (fano 0)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    ts = pd.to_datetime(
        [
            "2024-01-01 10:00", "2024-01-01 10:20", "2024-01-01 10:40",
            "2024-01-01 12:00",
            "2024-01-02 01:00", "2024-01-02 03:30",
        ]
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(6),
            "ts": ts,
            "user_id": np.zeros(6, np.int64),
            "event_type": ["a", "a", "a", "a", "b", "b"],
            "value": np.zeros(6),
            "props": [""] * 6,
        }
    )
    out = events.burstiness(rd.from_pandas(df)).to_pandas().set_index("event_type")
    assert out.loc["a", "n_hours"] == 2 and out.loc["a", "c_sum"] == 4
    assert out.loc["a", "c2_sum"] == 10
    # mean 2, var (10/2 - 4) = 1 -> fano 0.5
    assert out.loc["a", "fano"] == 0.5
    assert out.loc["b", "n_hours"] == 2 and out.loc["b", "fano"] == 0.0
    out2 = (
        events.burstiness(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("event_type")
    )
    assert out.equals(out2)


def test_peak_hours_hand_stream(ray_session):
    """Type 'a': hours 10,10,12 -> peak 10 (2/3); type 'b': tie between
    hours 3 and 5 (one each) -> earliest hour 3 wins."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    ts = pd.to_datetime(
        ["2024-01-01 10:05", "2024-01-02 10:55", "2024-01-01 12:00",
         "2024-01-01 03:00", "2024-01-01 05:00"]
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(5),
            "ts": ts,
            "user_id": np.zeros(5, np.int64),
            "event_type": ["a", "a", "a", "b", "b"],
            "value": np.zeros(5),
            "props": [""] * 5,
        }
    )
    out = events.peak_hours(rd.from_pandas(df)).to_pandas().set_index("event_type")
    assert out.loc["a", "peak_hour"] == 10 and out.loc["a", "peak_n"] == 2
    assert out.loc["a", "share"] == 2.0 / 3.0
    assert out.loc["b", "peak_hour"] == 3  # tie -> earliest


def test_activation_latency_hand(ray_session):
    """User 1: signup 10:00, purchases 12:00 & 11:00 -> latency to the
    FIRST purchase (1h). User 2: purchase before signup -> negative.
    User 3: signup only -> dropped."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import events

    rows = [
        (1, "2024-01-01 10:00", "signup"),
        (1, "2024-01-01 12:00", "purchase"),
        (1, "2024-01-01 11:00", "purchase"),
        (2, "2024-01-01 09:00", "purchase"),
        (2, "2024-01-01 10:00", "signup"),
        (3, "2024-01-01 08:00", "signup"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows)),
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": np.array([r[0] for r in rows], np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.zeros(len(rows)),
            "props": [""] * len(rows),
        }
    )
    out = (
        events.activation_latency(rd.from_pandas(df))
        .to_pandas()
        .set_index("user_id")
    )
    assert list(out.index) == [1, 2]
    assert out.loc[1, "latency_us"] == 3_600_000_000
    assert out.loc[2, "latency_us"] == -3_600_000_000
