"""Sequence packing + weighted source mixing: reshard invariance, layout
correctness, mixture proportions, SQL replay."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from kaza_lcms_ray.stages import packing

BUDGET = 64


def _docs_table(n=400, seed=7):
    rng = np.random.RandomState(seed)
    words = [" ".join(["w"] * int(k)) for k in rng.randint(0, 40, n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(words),
            "source": pa.array([f"src{int(i) % 5}" for i in rng.randint(0, 20, n)]),
        }
    )


def test_pack_sequences_layout_and_reshard_invariance(ray_session):
    import ray.data as rd

    tbl = _docs_table()
    out1 = (
        packing.pack_sequences(rd.from_arrow(tbl), budget=BUDGET)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # different sharding -> identical layout
    out2 = (
        packing.pack_sequences(rd.from_arrow(tbl).repartition(13), budget=BUDGET)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out1, out2)

    # the laid-out corpus is gapless: sorted by (pack_id, pack_pos), each
    # document starts exactly where the previous one ended (mod budget)
    df = out1.copy()
    df["off"] = df["pack_id"] * BUDGET + df["pack_pos"]
    # zero-token docs share their neighbor's offset — drop them for the
    # gapless check (they contribute no tokens to the layout)
    df = df[df["n_tokens"] > 0].sort_values("off").reset_index(drop=True)
    end = df["off"] + df["n_tokens"]
    assert (df["off"].iloc[1:].to_numpy() == end.iloc[:-1].to_numpy()).all()
    assert df["off"].iloc[0] == 0
    # n_splits covers the token span
    span_last = (df["off"] + np.maximum(df["n_tokens"], 1) - 1) // BUDGET
    assert (df["n_splits"] == span_last - df["pack_id"] + 1).all()

    # SQL replay on the same table
    con = duckdb.connect()
    con.register("docs_t", tbl)
    want = (
        con.execute(
            packing.pack_sequences_sql("SELECT doc_id, text FROM docs_t", budget=BUDGET)
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("n_tokens", "pack_id", "pack_pos", "n_splits"):
        np.testing.assert_array_equal(
            out1[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
        )


def test_mix_sources_proportions_and_sql(ray_session):
    import ray.data as rd

    tbl = _docs_table(n=2000)
    weight = lambda s: float(int(s[3:]) + 1)  # src0..src4 -> 1..5
    out = packing.mix_sources(
        rd.from_arrow(tbl), weight, alpha=0.5
    ).to_pandas()
    # kept mixture leans toward the heavier sources
    got = out.groupby("source").size()
    assert got["src4"] > got["src0"]
    # total near alpha * n
    assert abs(len(out) - 1000) < 150

    con = duckdb.connect()
    con.register("docs_t", tbl)
    want = con.execute(
        packing.mix_sources_sql(
            "SELECT doc_id, source FROM docs_t",
            "CAST(substr(source, 4) AS BIGINT) + 1",
            alpha=0.5,
        )
    ).df()
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])

    # reshard invariance
    out2 = packing.mix_sources(
        rd.from_arrow(tbl).repartition(11), weight, alpha=0.5
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_pack_roundtrip_and_ordered_consumption(ray_session, tmp_path):
    """Packed layout -> resumable partitioned write -> global sort ->
    streaming consumption in training order (gapless offsets)."""
    import ray.data as rd

    from kaza_lcms_ray import lineage

    tbl = _docs_table(n=300)
    packed = packing.pack_sequences(rd.from_arrow(tbl), budget=BUDGET)
    out = str(tmp_path / "packs")
    n_written, n_skipped = lineage.resumable_write(
        packed, out, key_col="pack_id", num_parts=8, config_hash="packv1"
    )
    assert n_written > 0 and n_skipped == 0

    # rerun skips every finished partition
    packed2 = packing.pack_sequences(rd.from_arrow(tbl), budget=BUDGET)
    n_written2, n_skipped2 = lineage.resumable_write(
        packed2, out, key_col="pack_id", num_parts=8, config_hash="packv1"
    )
    assert n_written2 == 0 and n_skipped2 == n_written

    # training-order consumption: global sort + streamed batches
    ds = lineage.read_output(out).sort(["pack_id", "pack_pos"])
    offs, toks = [], []
    for b in ds.iter_batches(batch_format="pandas", batch_size=64):
        offs.extend((b["pack_id"] * BUDGET + b["pack_pos"]).tolist())
        toks.extend(b["n_tokens"].tolist())
    # offsets non-decreasing and gapless over nonzero docs
    import numpy as np

    offs, toks = np.array(offs), np.array(toks)
    nz = toks > 0
    assert (np.diff(offs) >= 0).all()
    ends = offs[nz] + toks[nz]
    assert (offs[nz][1:] == ends[:-1]).all()


def test_global_rank_matches_sql_and_resharding(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import packing

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            # clustered values with exact ties to exercise the tiebreak
            "quality": np.round(rng.random(500), 2),
        }
    )
    got = (
        packing.global_rank(rd.from_pandas(df), "quality", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("rows_in", df)
    exp = (
        con.sql(
            packing.global_rank_sql("SELECT doc_id, quality FROM rows_in", "quality")
        )
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
    # reshard invariance: 17 input blocks give the identical ranking
    got2 = (
        packing.global_rank(
            rd.from_pandas(df).repartition(17), "quality", "doc_id"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)
    # out-of-range values clamp into edge buckets but still rank exactly
    df2 = df.assign(quality=df["quality"] * 3 - 1)
    got3 = (
        packing.global_rank(rd.from_pandas(df2), "quality", "doc_id")
        .to_pandas()
        .sort_values("quality", kind="mergesort")
    )
    assert (got3["rank"].to_numpy() == np.arange(500)).all()


def test_temperature_mix_flattens_sources(ray_session):
    """T<1 keeps a HIGHER fraction of rare sources than proportional
    mixing; T=1 with integer-count weights equals proportional."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import packing

    rng = np.random.RandomState(4)
    # skewed corpus: src_big 400 docs, src_small 40
    ids = np.arange(440, dtype=np.int64)
    src = np.where(ids < 400, "src_big", "src_small")
    tbl = pa.table({"doc_id": pa.array(ids), "source": pa.array(src)})
    out = packing.temperature_mix(
        rd.from_arrow(tbl), temperature=0.5, alpha=0.5
    ).to_pandas()
    kept = out.groupby("source").size()
    frac = {"src_big": kept.get("src_big", 0) / 400, "src_small": kept.get("src_small", 0) / 40}
    # rare source kept at a strictly higher rate
    assert frac["src_small"] > frac["src_big"]

    # reshard invariance
    out2 = packing.temperature_mix(
        rd.from_arrow(tbl).repartition(5), temperature=0.5, alpha=0.5
    ).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_rank_blend_matches_window_replay(ray_session):
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import packing

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "q": rng.rand(200),
            "length": rng.randint(0, 500, 200).astype(np.int64),
        }
    )
    ra = packing.global_rank(rd.from_pandas(df), "q", lo=0.0, hi=1.0)
    rb = packing.global_rank(rd.from_pandas(df), "length", lo=0.0, hi=500.0)
    got = (
        packing.rank_blend(ra, rb)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want_q = df.sort_values(["q", "doc_id"]).reset_index()
    rank_q = pd.Series(np.arange(200), index=want_q["doc_id"]).sort_index()
    want_l = df.sort_values(["length", "doc_id"]).reset_index()
    rank_l = pd.Series(np.arange(200), index=want_l["doc_id"]).sort_index()
    assert (got["rank_q"].to_numpy() == rank_q.to_numpy()).all()
    assert (got["rank_len"].to_numpy() == rank_l.to_numpy()).all()
    assert (got["blend"].to_numpy() == rank_q.to_numpy() + rank_l.to_numpy()).all()


def test_token_budget_sums_exactly_and_tie_rule(ray_session):
    """Σ alloc == budget exactly; remainder ties resolve to the smallest
    source name."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import packing

    # three sources with counts 1,1,1 and budget 4: base 1 each,
    # leftover 1 goes to the lexicographically smallest source
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "source": ["b", "a", "c"],
            "n_chars": [5, 5, 5],
        }
    )
    docs = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        packing.token_budget(docs, budget=4, unit_col="n_chars")
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert int(out["alloc"].sum()) == 4
    assert out.loc["a", "alloc"] == 2
    assert out.loc["b", "alloc"] == 1
    assert out.loc["c", "alloc"] == 1

    # skewed counts: exact Hamilton result
    df2 = pd.DataFrame(
        {
            "doc_id": range(4),
            "source": ["x", "y", "z", "x"],
            "n_chars": [3, 3, 1, 4],  # x=7, y=3, z=1, total 11
        }
    )
    docs2 = rd.from_arrow(pa.Table.from_pandas(df2, preserve_index=False))
    out2 = (
        packing.token_budget(docs2, budget=10, unit_col="n_chars")
        .to_pandas()
        .set_index("source")
    )
    # quotas: x=70/11=6 r4, y=30/11=2 r8, z=10/11=0 r10; leftover 2 -> z, y
    assert int(out2["alloc"].sum()) == 10
    assert out2.loc["x", "alloc"] == 6
    assert out2.loc["y", "alloc"] == 3
    assert out2.loc["z", "alloc"] == 1


def test_shard_plan_deterministic_and_complete(synth_small, ray_session):
    """shard_plan: every doc lands in exactly one shard, totals match,
    assignment is reshard-invariant and changes with the seed."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.sources import storage
    from kaza_lcms_ray.stages import packing

    docs = lambda: storage.read_documents(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "n_chars"],
    )
    out = packing.shard_plan(docs(), n_shards=16).to_pandas()
    n_docs = docs().count()
    assert out["n_docs"].sum() == n_docs
    assert out["shard"].between(0, 15).all()
    assert len(out) > 1  # hash actually spreads
    assert abs(out["share"].sum() - 1.0) < 1e-12
    out2 = packing.shard_plan(docs().repartition(7), n_shards=16).to_pandas()
    assert out.equals(out2)
    out_seed = packing.shard_plan(docs(), n_shards=16, seed=999).to_pandas()
    assert not out.equals(out_seed)
