"""Fuzzy edit-distance join: banded-DP exactness and segment-blocking
completeness vs a brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kaza_lcms_ray.stages import fuzzy


def _lev_py(a: bytes, b: bytes) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[len(b)]


def test_banded_levenshtein_matches_full_dp():
    rng = np.random.default_rng(7)
    alpha = list("abcde")
    words = [
        "".join(rng.choice(alpha, size=rng.integers(0, 12)))
        for _ in range(300)
    ]
    a = pa.array(words[:150])
    b = pa.array(words[150:])
    for k in (1, 2, 3):
        got = fuzzy.banded_levenshtein(a, b, k)
        for i, (x, y) in enumerate(zip(words[:150], words[150:])):
            want = _lev_py(x.encode(), y.encode())
            if want <= k:
                assert got[i] == want, (x, y, k, got[i], want)
            else:
                assert got[i] == k + 1, (x, y, k, got[i])


def test_fuzzy_pairs_complete_vs_bruteforce(ray_session):
    # small alphabet + short lengths force plenty of near pairs, including
    # strings short enough for the short-block path (len <= k)
    rng = np.random.default_rng(42)
    alpha = list("ab")
    words = sorted(
        {
            "".join(rng.choice(alpha, size=rng.integers(1, 9)))
            for _ in range(120)
        }
    )
    k = 2
    want = set()
    for i, x in enumerate(words):
        for y in words[i + 1 :]:
            d = _lev_py(x.encode(), y.encode())
            if 1 <= d <= k:
                want.add((x, y, d))
    ds = rd.from_arrow(pa.table({"name": pa.array(words)}))
    out = fuzzy.fuzzy_name_pairs(ds, "name", max_dist=k).to_pandas()
    got = set(zip(out["name_a"], out["name_b"], out["dist"]))
    assert got == want


def test_fuzzy_pairs_distinct_under_duplicate_rows(ray_session):
    # duplicated input rows must not duplicate output pairs
    ds = rd.from_arrow(
        pa.table({"name": pa.array(["blue bolt", "blue bolt", "bluebolt", None])})
    )
    out = fuzzy.fuzzy_name_pairs(ds, "name", max_dist=2).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["name_a"] == "blue bolt"
    assert out.iloc[0]["name_b"] == "bluebolt"
    assert out.iloc[0]["dist"] == 1


def test_entity_resolution_transitive_chain(ray_session):
    # "aaaa" ~ "aaab" ~ "aabb" chain: direct dist("aaaa","aabb")=2 <= k,
    # but "cccc" ~ "cccd" is a separate entity; transitive closure must
    # label each chain by its min name
    from kaza_lcms_ray.stages import dedup

    words = ["aaaa", "aaab", "aabb", "cccc", "cccd"]
    ds = rd.from_arrow(pa.table({"name": pa.array(words)}))
    pairs = fuzzy.fuzzy_name_pairs(ds, "name", max_dist=1).map_batches(
        lambda t: pa.table({"a": t.column("name_a"), "b": t.column("name_b")}),
        batch_format="pyarrow",
    )
    cl = dedup.min_label_clusters(pairs).to_pandas()
    got = dict(zip(cl["node"], cl["cluster"]))
    # with max_dist=1 the a-chain is connected only transitively
    assert got == {
        "aaaa": "aaaa", "aaab": "aaaa", "aabb": "aaaa",
        "cccc": "cccc", "cccd": "cccc",
    }
