"""Deterministic HyperLogLog sketch (stages/sketch.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from kaza_lcms_ray.stages import sketch


def _ds(values):
    return rd.from_pandas(pd.DataFrame({"v": values}))


def test_hll_accuracy_raw_branch(ray_session):
    # 50k distinct ints at p=12: relative error within 3·1.04/√m ≈ 4.9%
    n, p = 50_000, 12
    est = sketch.hll_count(_ds(np.arange(n, dtype=np.int64)), "v", p)
    assert abs(est - n) / n < 3 * 1.04 / np.sqrt(1 << p)


def test_hll_linear_counting_branch(ray_session):
    # 100 distinct at p=12 → linear-counting branch, near-exact
    est = sketch.hll_count(_ds(np.arange(100, dtype=np.int64)), "v", 12)
    assert abs(est - 100) < 3


def test_hll_duplicates_do_not_move_estimate(ray_session):
    a = sketch.hll_count(_ds(np.arange(1000, dtype=np.int64)), "v", 10)
    dup = np.tile(np.arange(1000, dtype=np.int64), 7)
    b = sketch.hll_count(_ds(dup), "v", 10)
    assert a == b


def test_hll_partition_invariant(ray_session):
    vals = np.arange(5000, dtype=np.int64)
    a = sketch.hll_count(_ds(vals), "v", 10)
    b = sketch.hll_count(_ds(vals).repartition(13), "v", 10)
    assert a == b


def test_hll_string_column(ray_session):
    vals = [f"doc-{i}" for i in range(2000)]
    est = sketch.hll_count(_ds(vals), "v", 11)
    assert abs(est - 2000) / 2000 < 3 * 1.04 / np.sqrt(1 << 11)


def test_cms_overestimates_never_under(ray_session):
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, 40)) for _ in range(200)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    counters = sketch.cms_counters(ds, "text").to_pandas()
    import collections

    true = collections.Counter(w for t in texts for w in t.split(" "))
    probes = words[:10] + ["never-seen"]
    ests = sketch.cms_estimate(counters, probes)
    for tok, est in zip(probes, ests):
        assert est >= true.get(tok, 0)  # CMS never underestimates
    # with 4x1024 counters and 8k tokens, heavy probes should be near-exact
    err = [e - true[t] for t, e in zip(probes[:10], ests[:10])]
    assert max(err) <= 0.01 * sum(true.values())


def test_cms_partition_invariant(ray_session):
    texts = [f"alpha beta w{i % 7}" for i in range(300)]
    a = sketch.cms_counters(rd.from_pandas(pd.DataFrame({"text": texts})), "text").to_pandas()
    b = sketch.cms_counters(
        rd.from_pandas(pd.DataFrame({"text": texts})).repartition(9), "text"
    ).to_pandas()
    key = lambda df: df.sort_values(["r", "bucket"]).reset_index(drop=True)
    assert key(a).equals(key(b))


def test_bloom_no_false_negatives_and_bounded_fp(ray_session):
    rng = np.random.default_rng(11)
    build = pd.DataFrame({"key": np.arange(0, 3000, 2, dtype=np.int64)})  # evens
    probe = pd.DataFrame({"key": rng.integers(0, 6000, 20000).astype(np.int64)})
    rep = sketch.bloom_semi_report(
        rd.from_pandas(probe).repartition(5),
        rd.from_pandas(build).repartition(3),
        "key",
        "key",
        m_bits=1 << 14,
    )
    n_exact = int(probe["key"].isin(set(build["key"])).sum())
    assert int(rep["n_exact"][0]) == n_exact  # exact side is exact
    assert int(rep["n_bloom"][0]) >= n_exact  # no false negatives
    assert int(rep["n_false"][0]) <= 0.05 * len(probe)  # fpp sane at 16k bits


def test_bottomk_similarity_exact_regime_and_reshard(ray_session):
    """With k >= |union| the KMV estimate IS the exact Jaccard of the
    distinct-value sets; sketches are reshard-invariant."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.sketch import bottomk_similarity

    vals_a = ["x", "y", "z", "w", "x"]          # distinct {x,y,z,w}
    vals_b = ["x", "y", "q", "q"]               # distinct {x,y,q}
    vals_c = ["unrelated1", "unrelated2"]
    ds = rd.from_arrow(
        pa.table(
            {
                "text": vals_a + vals_b + vals_c,
                "source": ["a"] * 5 + ["b"] * 4 + ["c"] * 2,
            }
        )
    )
    for d in (ds, ds.repartition(6)):
        out = bottomk_similarity(d, "text", "source", k=64)
        got = {(r.src_a, r.src_b): r.est_jaccard for r in out.itertuples()}
        assert got[("a", "b")] == 2 / 5   # |{x,y}| / |{x,y,z,w,q}|
        assert got[("a", "c")] == 0.0
        assert got[("b", "c")] == 0.0


def test_bottomk_sketch_bounded_and_estimates_in_range(ray_session):
    """Sketch size <= k per group; estimates stay in [0, 1] under a small
    k (approximate regime)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.sketch import bottomk_sketches, bottomk_similarity

    rng = np.random.RandomState(5)
    texts = [f"t{v}" for v in rng.randint(0, 400, 2000)]
    srcs = [f"s{v}" for v in rng.randint(0, 3, 2000)]
    ds = rd.from_arrow(pa.table({"text": texts, "source": srcs}))
    sk = bottomk_sketches(ds, "text", "source", k=16).to_pandas()
    assert sk.groupby("source").size().max() <= 16
    out = bottomk_similarity(ds, "text", "source", k=16)
    assert ((out["est_jaccard"] >= 0) & (out["est_jaccard"] <= 1)).all()


def test_hll_count_by_matches_global_per_group(ray_session):
    # each group's estimate must equal the GLOBAL sketch run on that
    # group alone (same seed/p): the grouped form is the same rule
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "v": rng.randint(0, 5_000, size=20_000).astype(np.int64),
            "g": np.repeat(np.arange(4, dtype=np.int64), 5_000),
        }
    )
    for nblocks in (1, 5):
        got = (
            sketch.hll_count_by(
                rd.from_pandas(df).repartition(nblocks), "v", "g", p=8
            )
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert got["g"].tolist() == [0, 1, 2, 3]
        for gi in range(4):
            solo = sketch.hll_count(
                _ds(df.loc[df["g"] == gi, "v"].to_numpy()), "v", 8
            )
            assert got["est"].iloc[gi] == solo
            exact = df.loc[df["g"] == gi, "v"].nunique()
            assert abs(got["est"].iloc[gi] - exact) / exact < 3 * 1.04 / np.sqrt(256)
