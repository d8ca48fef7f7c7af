"""TF-IDF top-k: hand-checked scores, reshard invariance, SQL replay."""

import duckdb
import numpy as np
import pyarrow as pa

from kaza_lcms_ray.stages import text


def _corpus():
    return pa.table(
        {
            "doc_id": pa.array(np.arange(4, dtype=np.int64)),
            "text": pa.array(
                [
                    "apple banana apple",
                    "banana cherry",
                    "cherry date date date",
                    "apple banana cherry date",
                ]
            ),
        }
    )


def test_tfidf_hand_check_and_sql(ray_session):
    import math

    import ray.data as rd

    tbl = _corpus()
    out = (
        text.tfidf_topk(rd.from_arrow(tbl), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # doc 0: apple tf=2 df=2 -> 2*ln(4/2); banana tf=1 df=3 -> ln(4/3)
    r0 = out[out["doc_id"] == 0]
    assert list(r0["term"]) == ["apple", "banana"]
    assert r0["score"].iloc[0] == 2.0 * math.log(4.0 / 2.0)
    # doc 2: date tf=3 beats cherry
    r2 = out[out["doc_id"] == 2]
    assert list(r2["term"]) == ["date", "cherry"]

    con = duckdb.connect()
    con.register("docs_t", tbl)
    want = (
        con.execute(text.tfidf_topk_sql("SELECT doc_id, text FROM docs_t", k=2))
        .df()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(want) == len(out)
    np.testing.assert_array_equal(out["term"].to_numpy(), want["term"].to_numpy())
    np.testing.assert_array_equal(
        out["score"].to_numpy(), want["score"].to_numpy()
    )

    # reshard invariance (every doc in its own block)
    out2 = (
        text.tfidf_topk(rd.from_arrow(tbl).repartition(4), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(out["term"].to_numpy(), out2["term"].to_numpy())
    np.testing.assert_array_equal(out["score"].to_numpy(), out2["score"].to_numpy())


def test_tfidf_join_path_matches_broadcast(ray_session):
    """Large-vocabulary hash-join + grouped-top-k path must equal the
    broadcast path exactly (the selection is a pure function of
    (score, term))."""
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "text": pa.array(
                [f"w{i % 7} w{(i * 3) % 11} common word x{i % 13}" for i in range(120)]
            ),
        }
    )
    a = (
        text.tfidf_topk(rd.from_arrow(tbl), k=3)
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    b = (
        text.tfidf_topk(rd.from_arrow(tbl), k=3, vocab_limit=1)
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    assert len(a) == len(b)
    for c in ("doc_id", "rank", "term", "tf"):
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy(), err_msg=c)
    np.testing.assert_array_equal(a["score"].to_numpy(), b["score"].to_numpy())


def test_source_similarity_hand_case(ray_session):
    """Cosine matrix matches a hand numpy computation on a controlled
    vocabulary; identical sources hit cos=1; disjoint ones cos=0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages.text import source_similarity

    docs = pd.DataFrame(
        {
            "source": ["s1", "s1", "s2", "s3"],
            "text": [
                "apple banana apple",
                "banana cherry",
                "apple banana apple banana cherry",  # == s1's combined tf
                "zebra yak",  # disjoint vocab
            ],
        }
    )
    out = source_similarity(rd.from_pandas(docs).repartition(3)).set_index(
        ["source_a", "source_b"]
    )
    # s1 tf: apple 2, banana 2, cherry 1; s2 identical -> cos exactly 1
    assert out.loc[("s1", "s2"), "dot"] == 2 * 2 + 2 * 2 + 1 * 1
    assert abs(out.loc[("s1", "s2"), "cos"] - 1.0) < 1e-12
    # disjoint-vocab pairs either carry dot == 0 or (no shared term rows)
    # are absent entirely
    for key in [("s1", "s3"), ("s2", "s3")]:
        if key in out.index:
            assert out.loc[key, "dot"] == 0


def test_log_odds_hand_corpus(ray_session):
    """Two tiny sources: 'apple' only in A, 'zebra' only in B, 'the'
    in both — replay the alpha=1 chain exactly."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import text as T

    df = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b"],
            "text": ["apple the", "apple", "zebra the", "zebra zebra"],
        }
    )
    out = T.log_odds(rd.from_pandas(df), "a", "b", k=10).to_pandas()
    assert set(out["term"]) == {"apple", "the", "zebra"}
    row = out.set_index("term")
    # counts: apple (2,0), the (1,1), zebra (0,3); n_a=3, n_b=4, V=3
    assert tuple(row.loc["apple", ["y_a", "y_b"]]) == (2, 0)
    assert tuple(row.loc["zebra", ["y_a", "y_b"]]) == (0, 3)
    n_a, n_b, V = 3, 4, 3
    for term, (ya, yb) in {"apple": (2, 0), "the": (1, 1), "zebra": (0, 3)}.items():
        delta = math.log((ya + 1) / float(n_a + V - 1 - ya)) - math.log(
            (yb + 1) / float(n_b + V - 1 - yb)
        )
        z = delta / math.sqrt(1.0 / (ya + 1) + 1.0 / (yb + 1))
        assert row.loc[term, "delta"] == delta
        assert row.loc[term, "z"] == z
    # ranking: apple (A-distinctive) first, zebra last
    assert out["term"].iloc[0] == "apple" and out["term"].iloc[-1] == "zebra"
