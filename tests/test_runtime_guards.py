"""Executable driver-collect bounds and the events whale-key guard."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kaza_lcms_ray.runtime import DriverCollectBoundExceeded, bounded_collect
from kaza_lcms_ray.stages import events


def test_bounded_collect_passes_under_bound(ray_session):
    df = pd.DataFrame({"a": np.arange(100, dtype=np.int64)})
    out = bounded_collect(rd.from_pandas(df), 100, "test: exactly at bound")
    assert len(out) == 100
    assert out["a"].tolist() == list(range(100))


def test_bounded_collect_raises_over_bound(ray_session):
    df = pd.DataFrame({"a": np.arange(101, dtype=np.int64)})
    with pytest.raises(DriverCollectBoundExceeded, match="101 rows"):
        bounded_collect(rd.from_pandas(df), 100, "test: one over")


def test_bounded_collect_matches_to_pandas(ray_session):
    # identical block-builder path: values, dtypes and column order match
    df = pd.DataFrame(
        {
            "s": ["x", "y", "z"],
            "i": np.array([1, 2, 3], np.int64),
            "f": np.array([0.5, 1.5, 2.5], np.float64),
        }
    )
    ds = rd.from_pandas(df)
    a = ds.to_pandas()
    b = bounded_collect(rd.from_pandas(df), 10, "test: parity")
    pd.testing.assert_frame_equal(a, b)


def test_events_guard_group_raises_on_whale_key():
    g = pd.DataFrame({"user_id": np.zeros(10, np.int64)})
    # temporarily shrink the bound: the guard reads the module constant
    orig = events.MAX_GROUP_ROWS
    events.MAX_GROUP_ROWS = 5
    try:
        with pytest.raises(ValueError, match="whale key"):
            events._guard_group(g, "sessionize")
        assert events._guard_group(g.head(5), "sessionize") is not None
    finally:
        events.MAX_GROUP_ROWS = orig


def test_bpe_train_vocab_cap_truncates(ray_session):
    from kaza_lcms_ray.stages import text as text_stage

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            # 'aa' dominates; rare singles form the truncatable tail
            "text": ["aa aa aa ab", "aa aa ba", "cc", "dd", "ee", "ff"],
        }
    )
    ds = rd.from_pandas(docs)
    full = text_stage.bpe_train(ds, n_merges=1).to_pandas()
    capped = text_stage.bpe_train(ds, n_merges=1, max_vocab=3).to_pandas()
    # the dominant merge survives any realistic truncation
    assert full.iloc[0]["lhs"] == capped.iloc[0]["lhs"] == "a"
    assert full.iloc[0]["rhs"] == capped.iloc[0]["rhs"] == "a"


def test_tree_reduce_matches_bucketed_exchange(ray_session):
    from kaza_lcms_ray.stages.zonal import bucketed_combine, bucketed_sum

    rng = np.random.default_rng(11)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 317, n).astype(np.int64),
            "s": rng.choice(["a", "b", "c"], n),
            "v": rng.integers(-1000, 1000, n).astype(np.int64),
            "w": rng.integers(0, 10**9, n).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(13)

    def norm(out):
        return (
            out.to_pandas()
            .sort_values(["k", "s"], kind="mergesort")
            .reset_index(drop=True)
        )

    a = norm(bucketed_sum(ds, ["k", "s"], ["v", "w"]))
    b = norm(bucketed_sum(ds, ["k", "s"], ["v", "w"], max_keys_hint=1000))
    pd.testing.assert_frame_equal(a, b)

    aggs = {"v": "sum", "w": "max"}
    c = norm(bucketed_combine(ds, ["k", "s"], aggs))
    d = norm(bucketed_combine(ds, ["k", "s"], aggs, max_keys_hint=1000))
    pd.testing.assert_frame_equal(c, d)
