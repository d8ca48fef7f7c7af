"""Unigram-LM scoring and n-gram decontamination: hand checks, SQL replay,
reshard invariance."""

import duckdb
import numpy as np
import pyarrow as pa

from kaza_lcms_ray.stages import text


def test_lm_score_hand_check_and_sql(ray_session):
    import math

    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["aa bb aa", "bb cc", ""]),
        }
    )
    out = (
        text.lm_score(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus: aa=2, bb=2, cc=1, total=5; doc 2 (empty) absent
    assert list(out["doc_id"]) == [0, 1]
    lp = {w: math.floor(math.log(c / 5.0) * text.LM_Q + 0.5) for w, c in
          (("aa", 2), ("bb", 2), ("cc", 1))}
    assert out["logprob_q"].iloc[0] == 2 * lp["aa"] + lp["bb"]
    assert out["logprob_q"].iloc[1] == lp["bb"] + lp["cc"]
    assert (out["avg_nll"] > 0).all()

    con = duckdb.connect()
    con.register("docs_t", tbl)
    want = (
        con.execute(text.lm_score_sql("SELECT doc_id, text FROM docs_t"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        out["logprob_q"].to_numpy(np.int64), want["logprob_q"].to_numpy(np.int64)
    )
    np.testing.assert_array_equal(out["avg_nll"].to_numpy(), want["avg_nll"].to_numpy())


def test_decontaminate_hand_check_and_sql(ray_session):
    import ray.data as rd

    # doc 0 is the "eval" doc (0 % 97 == 0); doc 1 shares its 5-gram,
    # doc 2 does not; doc 3 is too short for any 5-gram
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "one two three four five six",
                    "zzz one two three four five",
                    "one two three four laundered five",
                    "too short",
                ]
            ),
        }
    )
    out = (
        text.decontaminate(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 2]  # eval doc + short doc absent
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert r1["n_grams"] == 2 and r1["n_hits"] == 1 and r1["contaminated"] == 1
    r2 = out[out["doc_id"] == 2].iloc[0]
    assert r2["n_hits"] == 0 and r2["contaminated"] == 0

    con = duckdb.connect()
    con.register("docs_t", tbl)
    want = (
        con.execute(text.decontaminate_sql("SELECT doc_id, text FROM docs_t"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_grams", "n_hits", "contaminated"):
        np.testing.assert_array_equal(
            out[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
        )

    # reshard invariance
    out2 = (
        text.decontaminate(rd.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        out["n_hits"].to_numpy(np.int64), out2["n_hits"].to_numpy(np.int64)
    )


def test_bpe_token_stats(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["I'll pay $12.50, it's fine!", "abc 123 def"]),
        }
    )
    out = (
        text.bpe_token_stats(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "I" "'ll" " pay" " $" "12" "." "50" "," " it" "'s" " fine" "!" = 12
    assert out["n_bpe"].iloc[0] == 12
    # the standalone alpha pattern also matches inside contractions:
    # I, ll, pay, it, s, fine = 6
    assert out["n_alpha_runs"].iloc[0] == 6
    assert out["n_num_runs"].iloc[0] == 2    # 12, 50
    assert out["n_bpe"].iloc[1] == 3         # "abc" " 123" " def"

    con = duckdb.connect()
    con.register("docs_t", tbl)
    want = (
        con.execute(text.bpe_token_stats_sql("SELECT doc_id, text FROM docs_t"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("n_bpe", "n_alpha_runs", "n_num_runs"):
        np.testing.assert_array_equal(
            out[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
        )


def test_lm_score_join_path_matches_broadcast(ray_session):
    """The large-vocabulary hash-join path must produce the identical
    result as the broadcast path (quantized int sums are shuffle-proof)."""
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(150, dtype=np.int64)),
            "text": pa.array(
                [f"w{i % 7} w{(i * 3) % 11} common word" for i in range(150)]
            ),
        }
    )
    a = (
        text.lm_score(rd.from_arrow(tbl))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        text.lm_score(rd.from_arrow(tbl), vocab_limit=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in ("doc_id", "n_toks", "logprob_q"):
        np.testing.assert_array_equal(
            a[c].to_numpy(np.int64), b[c].to_numpy(np.int64), err_msg=c
        )
    np.testing.assert_array_equal(a["avg_nll"].to_numpy(), b["avg_nll"].to_numpy())


def test_ccnet_buckets_terciles_and_sql(ray_session):
    """CCNet head/middle/tail: per-lang tercile sizes follow the
    nearest-rank rule, bucket is monotone in nll_bin within a lang,
    reshard-invariant, and the SQL twin replays bit-for-bit."""
    import pandas as pd
    import ray.data as rd

    # 9 en docs spanning common->rare vocab, 3 fr docs; rarity drives
    # avg_nll so terciles are non-trivial
    words = [chr(ord("a") + i) * 3 for i in range(12)]  # aaa, bbb, ...
    rows = []
    for i in range(9):
        # doc i repeats word i (freq falls with i) -> nll rises with i
        rows.append((i, " ".join([words[i]] * (10 - i) + ["common"] * 3), "en"))
    for i in range(9, 12):
        rows.append((i, " ".join([words[i]] * (13 - i)), "fr"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
        }
    )
    outs = []
    for nblocks in (1, 4):
        out = (
            text.ccnet_buckets(rd.from_arrow(tbl).repartition(nblocks))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    en = out[out["lang"] == "en"]
    fr = out[out["lang"] == "fr"]
    # nearest-rank thirds: 9 -> 3/3/3 ; 3 -> 1/1/1
    assert en["bucket"].value_counts().sort_index().tolist() == [3, 3, 3]
    assert fr["bucket"].value_counts().sort_index().tolist() == [1, 1, 1]
    # bucket monotone in nll_bin within each lang
    for g in (en, fr):
        s = g.sort_values("nll_bin")
        assert (np.diff(s["bucket"].to_numpy(np.int64)) >= 0).all()

    con = duckdb.connect()
    con.register("documents", tbl)
    want = (
        con.execute(text.ccnet_buckets_sql("SELECT doc_id, text FROM documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("lang", "n_toks", "nll_bin", "bucket"):
        np.testing.assert_array_equal(out[c].to_numpy(), want[c].to_numpy())
