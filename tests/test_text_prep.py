"""normalize_text / chunk_text / bpe_pair_stats: hand oracles, edge cases,
reshard invariance, SQL replay."""

import duckdb
import numpy as np
import pyarrow as pa

from kaza_lcms_ray.stages import text


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "text": pa.array(rows),
        }
    )


def _sql_df(tbl: pa.Table, sql: str):
    con = duckdb.connect()
    con.register("docs", tbl)
    return con.execute(sql).fetchdf()


def test_c4_rules_hand_and_sql(ray_session):
    import ray.data as rd

    rows = [
        "One. Two! Three? clean doc",            # 3 sentences -> kept
        "Too short. Only two?",                   # 2 sentences -> dropped
        "Has Lorem IPSUM inside. Plus. More.",    # lorem -> dropped
        "Code { leak }. Yes. Sure. Fine.",        # brace -> dropped
        "Read the Privacy Policy. Ok. Ok. Ok.",   # policy -> dropped
        "Line one.\nline two ends?\nLine3!",      # 3 lines, all terminal
    ]
    tbl = _docs(rows)
    out = (
        text.c4_rules(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["kept"]) == [1, 0, 0, 0, 0, 1]
    assert list(out["n_sentences"]) == [3, 2, 3, 4, 4, 3]
    assert list(out["has_lorem"]) == [0, 0, 1, 0, 0, 0]
    assert list(out["has_brace"]) == [0, 0, 0, 1, 0, 0]
    assert list(out["has_policy"]) == [0, 0, 0, 0, 1, 0]
    assert list(out["n_lines"]) == [1, 1, 1, 1, 1, 3]
    assert list(out["n_term_lines"]) == [0, 1, 1, 1, 1, 3]

    ora = (
        _sql_df(tbl, text.c4_rules_sql("SELECT doc_id, text FROM docs"))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        assert list(ora[c]) == list(out[c]), c


def test_normalize_text_hand_and_sql(ray_session):
    import ray.data as rd

    tbl = _docs(["  Hello\t\tWORLD \n", "already clean", "", "A  B"])
    out = (
        text.normalize_text(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["text_norm"]) == ["hello world", "already clean", "", "a b"]
    assert list(out["changed"]) == [1, 0, 0, 1]
    assert list(out["n_chars_norm"]) == [11, 13, 0, 3]

    ora = (
        _sql_df(tbl, text.normalize_text_sql("SELECT doc_id, text FROM docs"))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(ora["text_norm"]) == list(out["text_norm"])
    assert list(ora["changed"]) == list(out["changed"])


def test_chunk_text_windows(ray_session):
    import ray.data as rd

    # size 5, stride 3: len 8 -> chunks at 0,3,6 ; len 3 -> one chunk ;
    # len 0 -> ONE empty chunk (documents never silently dropped)
    tbl = _docs(["abcdefgh", "xyz", ""])
    out = (
        text.chunk_text(rd.from_arrow(tbl), size=5, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    got = list(zip(out["doc_id"], out["chunk_idx"], out["chunk_text"]))
    assert got == [
        (0, 0, "abcde"),
        (0, 1, "defgh"),
        (0, 2, "gh"),
        (1, 0, "xyz"),
        (2, 0, ""),
    ]
    assert list(out["chunk_len"]) == [5, 5, 2, 3, 0]

    ora = (
        _sql_df(
            tbl,
            text.chunk_text_sql("SELECT doc_id, text FROM docs", size=5, stride=3),
        )
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert list(ora["chunk_text"]) == [c for _, _, c in got]


def test_chunk_text_reshard_invariant(ray_session):
    import ray.data as rd

    rows = ["a" * n for n in range(0, 40, 7)]
    tbl = _docs(rows)
    a = (
        text.chunk_text(rd.from_arrow(tbl), size=8, stride=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    b = (
        text.chunk_text(rd.from_arrow(tbl).repartition(5), size=8, stride=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_bpe_pair_stats_hand_and_sql(ray_session):
    import ray.data as rd

    # "aab aab" -> pairs aa, ab per word occurrence; "ba" -> ba; "x" dropped
    tbl = _docs(["aab aab ba", "x aab"])
    out = (
        text.bpe_pair_stats(rd.from_arrow(tbl), k=10)
        .to_pandas()
        .sort_values("pair")
        .reset_index(drop=True)
    )
    got = dict(zip(out["pair"], out["ct"]))
    assert got == {"aa": 3, "ab": 3, "ba": 1}

    ora = _sql_df(tbl, text.bpe_pair_stats_sql("SELECT doc_id, text FROM docs", k=10))
    assert dict(zip(ora["pair"], ora["ct"])) == got


def test_bpe_pair_stats_reshard_invariant(ray_session):
    import ray.data as rd

    rows = ["the quick brown fox jumps", "over the lazy dog", "the the the"]
    tbl = _docs(rows)
    a = text.bpe_pair_stats(rd.from_arrow(tbl), k=50).to_pandas()
    b = text.bpe_pair_stats(rd.from_arrow(tbl).repartition(4), k=50).to_pandas()
    a = a.sort_values(["pair"]).reset_index(drop=True)
    b = b.sort_values(["pair"]).reset_index(drop=True)
    assert a.equals(b)


def test_hash_embed_rule_and_composition(ray_session):
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.state.hashing import fnv1a_arr
    from kaza_lcms_ray.stages import cluster, text

    tbl = _docs(["apple banana apple", "", "Banana!  cherry"])
    out = (
        text.hash_embed(rd.from_arrow(tbl), dim=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    vecs = np.stack([np.asarray(v) for v in out["vec"]])
    assert vecs.shape == (3, 16)
    # hand-apply the rule
    want = np.zeros((3, 16))
    for i, words in enumerate([["apple", "banana", "apple"], [], ["banana", "cherry"]]):
        for w in words:
            h = int(fnv1a_arr([w])[0])
            want[i, h % 16] += -1.0 if h >> 63 else 1.0
    assert np.array_equal(vecs, want)
    assert np.array_equal(vecs[1], np.zeros(16))  # empty doc -> zero vector

    # composes with the clustering stages (rename to their default schema)
    ds = text.hash_embed(rd.from_arrow(tbl), dim=16).rename_columns(
        ["vec_id", "embedding"]
    )
    _, assign = cluster.kmeans(ds, k=2, iters=1, seed=3)
    assert len(assign.to_pandas()) == 3


def test_lexical_diversity_hand_and_empty(ray_session):
    """TTR hand-check: distinct/total tokens, 0.0 for token-free docs,
    reshard-invariant (fully in-batch per doc)."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.text import lexical_diversity

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["the cat the cat sat", "", "a b? a! c"],
            }
        )
    )
    for d in (ds, ds.repartition(3)):
        out = lexical_diversity(d).to_pandas().sort_values("doc_id")
        assert out["n_tokens"].tolist() == [5, 0, 4]
        assert out["n_types"].tolist() == [3, 0, 3]
        assert out["ttr"].tolist() == [3 / 5, 0.0, 3 / 4]


def test_token_entropy_known_values_and_reshard(ray_session):
    import math

    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import text as tx

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a a b",            # H over {2/3, 1/3}
                "same same same",   # single type -> entropy 0
                "1234 5678",        # no [a-z']+ tokens at all
                "w x y z",          # uniform over 4 -> 4 * term(1/4)
            ],
        }
    )
    S = float(tx.ENTROPY_SCALE_INT)

    def term(p):
        return int(np.floor(-(p * math.log(p)) * S))

    want = {
        1: (3, term(2.0 / 3.0) + term(1.0 / 3.0)),
        2: (3, term(1.0)),
        3: (0, 0),
        4: (4, 4 * term(0.25)),
    }
    for nblocks in (1, 3):
        out = (
            tx.token_entropy(rd.from_pandas(df).repartition(nblocks))
            .to_pandas()
            .set_index("doc_id")
        )
        for k, (n, e) in want.items():
            assert int(out.loc[k, "n_tok"]) == n
            assert int(out.loc[k, "entropy_q"]) == e


def test_zipf_fit_slope_on_synthetic_power_law(ray_session):
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import text as tx

    # corpus where term_i appears ~ C/i times -> slope should be ~ -1
    import itertools
    import string

    names = [
        "".join(p) for p in itertools.product(string.ascii_lowercase, repeat=2)
    ]
    words = []
    for i in range(1, 60):
        words.extend([names[i]] * max(1, 600 // i))
    rng = np.random.RandomState(5)
    rng.shuffle(words)
    docs = [" ".join(words[i::40]) for i in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": docs})
    for nblocks in (1, 4):
        out = (
            tx.zipf_fit(rd.from_pandas(df).repartition(nblocks), top=50)
            .to_pandas()
        )
        assert int(out["n_terms"].iloc[0]) == 50
        assert -1.3 < float(out["slope"].iloc[0]) < -0.7


def test_bm25_ranking_sanity_and_reshard(ray_session):
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import text as tx

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "spark table spark table spark",  # dense in both terms
                "spark table window filler words here",
                "spark only here with other words",
                "table appears once in this longer document of many words",
                "nothing relevant at all",
                "window window window",
            ],
        }
    )
    outs = []
    for nblocks in (1, 3):
        got = (
            tx.bm25_topk(rd.from_pandas(df).repartition(nblocks),
                         ["spark", "table"], k=6)
            .to_pandas()
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # doc 0 (dense in both query terms) must rank first; doc 4/5 excluded
    assert int(outs[0]["doc_id"].iloc[0]) == 0
    assert set(outs[0]["doc_id"]) & {4, 5} == set()


def test_pmi_prefers_exclusive_pairs(ray_session):
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import text as tx

    # "aa bb" always co-occur exclusively; "cc" is frequent everywhere
    docs = ["aa bb cc dd", "aa bb cc ee", "aa bb cc ff", "cc gg", "cc hh"]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    got = tx.pmi_collocations(rd.from_pandas(df), m=20, k=5).to_pandas()
    assert got["gram"].iloc[0] == "aa bb"  # the exclusive pair wins PMI


def test_dsir_select_prefers_target_like_docs(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import text

    # target sample = doc_id % 7 == 0 -> docs 0,7,14 speak "alpha"; the
    # rest speak "beta" except a few beta-side docs that ALSO speak alpha —
    # those must outrank pure-beta docs
    rows = []
    for i in range(40):
        if i % 7 == 0:
            t = "alpha bravo charlie alpha bravo"
        elif i in (1, 8, 15, 22):
            t = "alpha bravo charlie delta echo"
        else:
            t = "zulu yankee xray whiskey victor"
        rows.append((i, t))
    docs = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]), preserve_index=False
        )
    )
    out = text.dsir_select(docs, keep_frac=4).to_pandas()
    assert len(out) == 10  # 40 // 4
    got = set(out["doc_id"].tolist())
    # every alpha-speaking doc (target members + lookalikes) selected first
    alpha_docs = {i for i in range(40) if i % 7 == 0} | {1, 8, 15, 22}
    assert alpha_docs <= got
    # deterministic under re-run
    out2 = text.dsir_select(docs, keep_frac=4).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_bpe_train_known_merges(ray_session):
    """Handcrafted corpus with known merge sequence, including the greedy
    leftmost-non-overlap rule on runs ('aaaa' merges to 'aa','aa')."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import text

    # 'hehehe' stresses overlap: pairs he(3) eh(2); 'the' x4 gives th(4), he(4)
    rows = [(0, "the the the the hehehe aaaa")]
    docs = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]), preserve_index=False
        )
    )
    out = text.bpe_train(docs, n_merges=3).to_pandas()
    assert out["rnk"].tolist() == [1, 2, 3]
    # round 1: he appears in 'the'x4 + 'hehehe'x3 = 7 -- beats th=4, aa=3
    assert (out.loc[0, "lhs"], out.loc[0, "rhs"], out.loc[0, "ct"]) == ("h", "e", 7)
    # after merging: 'the'->t,he; 'hehehe'->he,he,he; 'aaaa'->a,a,a,a
    # round 2 pairs: t|he=4, he|he=2, a|a=3 -> t,he wins
    assert (out.loc[1, "lhs"], out.loc[1, "rhs"], out.loc[1, "ct"]) == ("t", "he", 4)
    # round 3: a|a=3 beats he|he=2; greedy merges positions 0,2 of 'aaaa'
    assert (out.loc[2, "lhs"], out.loc[2, "rhs"], out.loc[2, "ct"]) == ("a", "a", 3)


def test_bpe_train_tie_break_and_empty(ray_session):
    """Count ties resolve to the lexicographically smallest (lhs, rhs);
    an empty corpus yields a typed empty merge table."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import text

    rows = [(0, "zy ba")]  # zy and ba both count 1; ba < zy
    docs = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text"]), preserve_index=False
        )
    )
    out = text.bpe_train(docs, n_merges=1).to_pandas()
    assert (out.loc[0, "lhs"], out.loc[0, "rhs"]) == ("b", "a")

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out0 = text.bpe_train(empty, n_merges=2)
    assert out0.count() == 0
    assert [f.name for f in out0.schema().base_schema] == [
        "rnk",
        "lhs",
        "rhs",
        "ct",
    ]


def test_quantile_normalize_properties(synth_small, ray_session):
    """Within a source norm_bin is monotone in quality; every norm_bin is
    a bin present in the global histogram; top-ranked docs map to the
    global max bin; partition-invariant."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.pipelines import curation

    docs = rd.read_parquet(
        f"/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "source"],
    )
    out = (
        curation.quantile_normalize(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out2 = (
        curation.quantile_normalize(docs.repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)
    zb = np.floor(out["quality"].to_numpy() * 4096.0).astype(np.int64)
    glob_bins = set(zb.tolist())
    assert set(out["norm_bin"].tolist()) <= glob_bins
    gmax = max(glob_bins)
    for s, grp in out.assign(zb=zb).groupby("source"):
        g = grp.sort_values(["zb", "doc_id"])
        assert (np.diff(g["norm_bin"].to_numpy()) >= 0).all()
        # the within-source max rank maps to the global max bin
        assert g["norm_bin"].iloc[-1] == gmax
    assert (out["norm_q"] == out["norm_bin"] / 4096.0).all()


def test_token_gini_hand_cases(ray_session):
    """flat: every token unique (all f=1) → Gini exactly 0; skew: one token
    dominating pushes Gini toward 1; values match the direct sorted-rank
    formula; reshard-invariant."""
    import ray.data as rd

    # tokenizer keeps [a-z'] runs only — tokens must be purely alphabetic
    flat_text = " ".join(
        "tok" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(50)
    )
    skew_text = " ".join(["common"] * 99 + ["rare"])
    rows = [
        {"doc_id": "a", "source": "flat", "text": flat_text},
        {"doc_id": "b", "source": "skew", "text": skew_text},
    ]
    got = (
        text.token_gini(rd.from_items(rows, override_num_blocks=2))
        .to_pandas()
        .set_index("source")
    )
    assert got.loc["flat", "gini"] == 0.0
    assert got.loc["flat", "v_terms"] == 50
    assert got.loc["flat", "total_tokens"] == 50
    # skew: freqs sorted asc = [1, 99]; num = 1·1 + 99·2 = 199; V=2, T=100
    exp = 2.0 * 199.0 / (2.0 * 100.0) - 3.0 / 2.0
    assert got.loc["skew", "gini"] == exp
    # reshard invariance: same rows split one-per-block
    got1 = (
        text.token_gini(rd.from_items(rows, override_num_blocks=1))
        .to_pandas()
        .set_index("source")
    )
    assert got1["gini"].to_dict() == got["gini"].to_dict()
