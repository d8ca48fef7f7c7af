"""Dedup family: minhash-LSH end-to-end with planted near-dups, clustering,
jaccard verification, exact dedup, simhash properties."""

import numpy as np
import pandas as pd

import ray.data as rd

from kaza_lcms_ray.stages import ann, dedup


def _planted_corpus():
    base = (
        "the quick brown fox jumps over the lazy dog while the river delta "
        "floods the grass plains every wet season in the kavango basin"
    )
    rows = []
    # cluster A: base + tiny edits
    rows.append(("a1", base))
    rows.append(("a2", base.replace("quick", "quicker")))
    rows.append(("a3", base + " again"))
    # cluster B: different text + edit
    other = (
        "land cover classification with random forests requires good training "
        "data sampled from reference polygons across all strata classes"
    )
    rows.append(("b1", other))
    rows.append(("b2", other.replace("good", "great")))
    # singletons
    rows.append(("c1", "completely unrelated short note about nothing"))
    rows.append(("d1", "another standalone document with its own content"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    df = _planted_corpus()
    ds = rd.from_pandas(df)
    pairs = dedup.minhash_candidate_pairs(ds, "text", "doc_id", num_perm=64, bands=16).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert ("a1", "a2") in got and ("a1", "a3") in got
    assert ("b1", "b2") in got
    # no cross-cluster garbage
    assert not any(a.startswith("a") and b.startswith("b") for a, b in got)
    assert not any("c1" in p or "d1" in p for p in got)


def test_jaccard_verification_kernel():
    df = _planted_corpus()
    j_close = dedup.ngram_jaccard([df.text[0]], [df.text[1]])[0]
    j_far = dedup.ngram_jaccard([df.text[0]], [df.text[5]])[0]
    assert j_close > 0.7 > j_far
    assert dedup.ngram_jaccard(["same"], ["same"])[0] == 1.0


def test_min_label_clusters(ray_session):
    pairs = rd.from_pandas(
        pd.DataFrame({"a": ["a1", "a1", "b1", "x1"], "b": ["a2", "a3", "b2", "x2"]})
    )
    clusters = dedup.min_label_clusters(pairs).to_pandas()
    lbl = dict(zip(clusters["node"], clusters["cluster"]))
    assert lbl["a1"] == lbl["a2"] == lbl["a3"] == "a1"
    assert lbl["b1"] == lbl["b2"] == "b1"
    assert lbl["x1"] == lbl["x2"] == "x1"


def test_drop_exact_dupes(ray_session):
    df = pd.DataFrame(
        {"text": ["x", "x", "y", "x", "z"], "doc_id": [5, 3, 1, 9, 2]}
    )
    out = dedup.drop_exact_dupes(rd.from_pandas(df), "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]  # min id kept per text


def test_simhash_near_texts_close():
    sh = dedup.SimHasher("text", "doc_id")
    import pyarrow as pa

    df = _planted_corpus()
    t = pa.table({"doc_id": df["doc_id"], "text": df["text"]})
    out = sh(t).to_pandas()
    sig = dict(zip(out["doc_id"], out["simhash"].astype(np.uint64)))
    ham = lambda a, b: bin(int(sig[a]) ^ int(sig[b])).count("1")
    assert ham("a1", "a2") < ham("a1", "b1")
    assert ham("b1", "b2") < ham("b1", "c1")


def test_lsh_buckets_route_similar_vectors(ray_session):
    from kaza_lcms_ray.state.hashing import hash_unit

    n, d = 200, 16
    base = hash_unit(1, "v", np.arange(n * d)).reshape(n, d) - 0.5
    # pairs: vector i and i+n are tiny perturbations of each other
    pert = base + (hash_unit(2, "p", np.arange(n * d)).reshape(n, d) - 0.5) * 0.01
    mat = np.concatenate([base, pert])
    df = pd.DataFrame({"vec_id": np.arange(2 * n), "embedding": list(mat.astype(np.float32))})
    out = ann.lsh_bucketed(rd.from_pandas(df), nbits=8).to_pandas()
    b = out.sort_values("vec_id")["bucket"].to_numpy()
    same = (b[:n] == b[n:]).mean()
    assert same > 0.9  # near-identical vectors land in the same bucket


def test_verified_near_dup_clusters_end_to_end(ray_session):
    df = _planted_corpus()
    ds = rd.from_pandas(df)
    clusters, pairs = dedup.verified_near_dup_clusters(ds, "text", "doc_id")
    lbl = dict(zip(clusters["node"], clusters["cluster"]))
    assert lbl["a1"] == lbl["a2"] == lbl["a3"] == "a1"
    assert lbl["b1"] == lbl["b2"] == "b1"
    assert "c1" not in lbl and "d1" not in lbl
    assert (pairs["jaccard"] >= 0.7).all()


def test_embedding_dup_pairs_block_pair_exact(ray_session):
    from kaza_lcms_ray.state.hashing import hash_unit

    n, d = 120, 8
    mat = hash_unit(3, "e", np.arange(n * d)).reshape(n, d) - 0.5
    mat[40] = mat[7] * 1.5           # planted exact-direction dup
    mat[90] = mat[11] + 0.001
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)})
    ds = rd.from_pandas(df).repartition(5)  # force multiple block pairs
    got = ann.embedding_dup_pairs(ds, 0.8).to_pandas()
    got_set = set(map(tuple, got[["a", "b"]].to_numpy()))
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T
    ii, jj = np.nonzero((sims >= 0.8) & (np.arange(n)[:, None] < np.arange(n)[None, :]))
    want = set(zip(ii.tolist(), jj.tolist()))
    assert got_set == want and (7, 40) in want


def test_embedding_near_dup_lsh_recall(ray_session):
    from kaza_lcms_ray.state.hashing import hash_unit

    n, d = 150, 16
    base = hash_unit(5, "v", np.arange(n * d)).reshape(n, d) - 0.5
    pert = base + (hash_unit(6, "p", np.arange(n * d)).reshape(n, d) - 0.5) * 0.02
    mat = np.concatenate([base, pert])
    ids = np.arange(2 * n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(mat)})
    got = ann.embedding_near_dup_lsh(rd.from_pandas(df), 0.98, n_tables=6).to_pandas()
    got_set = set(map(tuple, got[["a", "b"]].to_numpy()))
    # precision: every emitted pair really is >= threshold (in-bucket exact)
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T
    for a, b in got_set:
        assert sims[a, b] >= 0.98
    # recall vs the planted (i, i+n) pairs
    planted = {(i, i + n) for i in range(n) if sims[i, i + n] >= 0.98}
    found = planted & got_set
    assert len(found) / max(1, len(planted)) > 0.9


def test_minhash_hot_bucket_cap(ray_session):
    # adversarial hot bucket: 50 identical docs land in one bucket per band
    df = pd.DataFrame(
        {"doc_id": np.arange(50, dtype=np.int64), "text": ["same text here"] * 50}
    )
    pairs = dedup.minhash_candidate_pairs(
        rd.from_pandas(df), "text", "doc_id", max_bucket=8
    ).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    # capped: only pairs among the 8 smallest ids survive
    assert got == {(i, j) for i in range(8) for j in range(i + 1, 8)}


def test_min_label_clusters_compression_rounds(ray_session):
    # a dense clique + a chain; force the spanning-forest rounds
    clique = [(i, j) for i in range(20) for j in range(i + 1, 20)]
    chain = [(100 + i, 101 + i) for i in range(30)]
    df = pd.DataFrame(clique + chain, columns=["a", "b"])
    full = dedup.min_label_clusters(rd.from_pandas(df)).to_pandas()
    compressed = dedup.min_label_clusters(
        rd.from_pandas(df), driver_pair_limit=10, max_rounds=6
    ).to_pandas()
    f = dict(zip(full["node"], full["cluster"]))
    c = dict(zip(compressed["node"], compressed["cluster"]))
    assert f == c
    assert all(c[n] == 0 for n in range(20))
    assert all(c[n] == 100 for n in range(100, 131))


def test_verified_clusters_distributed_verify_matches_driver(ray_session):
    df = _planted_corpus()
    ds = rd.from_pandas(df)
    cl_drv, p_drv = dedup.verified_near_dup_clusters(ds, "text", "doc_id")
    cl_dst, p_dst = dedup.verified_near_dup_clusters(
        ds, "text", "doc_id", driver_pair_limit=0
    )
    assert dict(zip(cl_drv["node"], cl_drv["cluster"])) == dict(
        zip(cl_dst["node"], cl_dst["cluster"])
    )
    key = lambda d: sorted(map(tuple, d[["a", "b"]].to_numpy()))
    assert key(p_drv) == key(p_dst)


def test_knn_join_blocked_matches_brute_force(ray_session):
    from kaza_lcms_ray.state.hashing import hash_unit

    n, d, k = 90, 8, 4
    mat = hash_unit(9, "kj", np.arange(n * d)).reshape(n, d) - 0.5
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)})
    ds = rd.from_pandas(df).repartition(4)  # force multiple block pairs
    got = (
        ann.knn_join(ds, k=k, id_col="vec_id", embed_col="embedding")
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = nm @ nm.T
    ids = np.arange(n)
    rows = []
    for q in range(n):
        order = np.lexsort((ids, -sims[q]))[:k]
        for r, nid in enumerate(order, start=1):
            rows.append((q, r, nid))
    want = pd.DataFrame(rows, columns=["qid", "rank", "vec_id"])
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )
    # rank-1 neighbour of every vector is itself (self kept; callers drop)
    assert (got[got["rank"] == 1]["vec_id"].to_numpy() == np.arange(n)).all()


def test_knn_join_lsh_recall(ray_session):
    from kaza_lcms_ray.state.hashing import hash_unit

    n, d, k = 120, 8, 3
    mat = hash_unit(13, "kl", np.arange(n * d)).reshape(n, d) - 0.5
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)})
    ds = rd.from_pandas(df).repartition(3)
    approx = ann.knn_join_lsh(ds, k=k, nbits=4, n_tables=6).to_pandas()
    exact = ann.knn_join(ds, k=k).to_pandas()
    a = set(map(tuple, approx[["qid", "vec_id"]].to_numpy())) if "vec_id" in approx else set(
        map(tuple, approx[["qid", "nid"]].to_numpy())
    )
    e = set(map(tuple, exact[["qid", "vec_id"]].to_numpy()))
    recall = len(a & e) / len(e)
    assert recall >= 0.5  # approximate path finds most true neighbours
    # every vector got rows and ranks are 1..<=k
    assert approx.groupby("qid")["rank"].min().eq(1).all()


def test_batch_signatures_match_scalar_reference():
    """Vectorized whole-batch signatures are bit-identical to the per-doc
    scalar path (_char_shingle_hashes + minhash_signature)."""
    texts = [
        "", "a", "ab", "abcd", "abcde", "abcdef",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # dup
        "naïve café — unicode ✓ bytes", None, 12345,
        "x" * 300, ("y" * 150) + ("z" * 150),
    ]
    mh = dedup.MinHasher("t", "i", num_perm=64, bands=16, shingle_k=5)
    got = mh.signatures(texts)
    want = np.empty_like(got)
    for i, t in enumerate(texts):
        sh = dedup._char_shingle_hashes(str(t).encode("utf-8"), 5)
        want[i] = dedup.minhash_signature(np.unique(sh), mh.a, mh.b)
    assert (got == want).all()
    # arrow-column input path (with a null) agrees with the list path
    import pyarrow as pa

    got2 = mh.signatures(pa.chunked_array([pa.array(
        [None if t is None else str(t) for t in texts]
    )]))
    assert (got2 == want).all()


def _para_corpus():
    """Multi-line docs with cross-doc and within-doc duplicate paragraphs.
    Long lines (>=16 chars) dedupe; short lines never do."""
    shared = "this exact paragraph appears in several documents"
    other = "a second long paragraph repeated across the corpus"
    return pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                f"{shared}\nunique first doc body line here\n--",
                f"intro line two\n{shared}\n{other}",
                f"{other}\n{other}\nshort",          # within-doc dup too
                f"{shared}",                          # fully dropped
                "",                                   # empty doc survives
            ],
        }
    )


def test_drop_dup_paragraphs_semantics(ray_session):
    df = _para_corpus()
    out = (
        dedup.drop_dup_paragraphs(rd.from_pandas(df), "text", "doc_id")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    shared = "this exact paragraph appears in several documents"
    other = "a second long paragraph repeated across the corpus"
    # doc 1 holds the first occurrence of `shared`; keeps everything
    assert out.loc[1, "text_clean"] == f"{shared}\nunique first doc body line here\n--"
    assert out.loc[1, "n_dropped"] == 0
    # doc 2 loses `shared` (kept in doc 1) but keeps `other` (first corpus
    # occurrence is (2, 2)) and its short intro line
    assert out.loc[2, "text_clean"] == f"intro line two\n{other}"
    assert out.loc[2, "n_dropped"] == 1
    # doc 3: both copies of `other` drop (keeper is doc 2), short line stays
    assert out.loc[3, "text_clean"] == "short"
    assert out.loc[3, "n_kept"] == 1 and out.loc[3, "n_dropped"] == 2
    # doc 4's only paragraph was dropped -> doc absent
    assert 4 not in out.index
    # doc 5: empty text is a single short paragraph, kept verbatim
    assert out.loc[5, "text_clean"] == "" and out.loc[5, "n_kept"] == 1


def test_drop_dup_paragraphs_matches_sql_oracle(ray_session, synth_small):
    """Engine vs the DuckDB oracle over the synth documents table (single-
    paragraph docs with many exact duplicates) AND the crafted multi-line
    corpus."""
    import duckdb

    for df in [
        _para_corpus(),
        # driver-shaped flat corpus: single-paragraph docs, many exact dups
        pd.read_parquet("/root/testdata/sf0.001/documents.parquet")[
            ["doc_id", "text"]
        ].head(2000),
    ]:
        got = (
            dedup.drop_dup_paragraphs(rd.from_pandas(df), "text", "doc_id")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("docs_in", df)
        exp = (
            con.sql(
                dedup.drop_dup_paragraphs_sql("SELECT doc_id, text FROM docs_in")
            )
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con.close()
        pd.testing.assert_frame_equal(
            got[["doc_id", "text_clean", "n_kept", "n_dropped"]].astype(
                {"n_kept": "int64", "n_dropped": "int64"}
            ),
            exp[["doc_id", "text_clean", "n_kept", "n_dropped"]].astype(
                {"n_kept": "int64", "n_dropped": "int64"}
            ),
        )


def test_near_dedup_filter_drops_larger_near_dups(ray_session):
    df = _planted_corpus()
    df["doc_id"] = ["a1", "a2", "a3", "b1", "b2", "c1", "d1"]
    kept = set(
        dedup.near_dedup_filter(rd.from_pandas(df), "text", "doc_id")
        .to_pandas()["doc_id"]
    )
    # expectation derived from the verified pairs themselves: drop = larger
    # id of every verified pair
    cand = dedup.minhash_candidate_pairs(rd.from_pandas(df), "text", "doc_id").materialize()
    ver = dedup._verify_pairs_distributed(
        rd.from_pandas(df), cand, "text", "doc_id", k=5, threshold=0.4,
        n_pairs=cand.count(),
    ).to_pandas()
    exp = set(df["doc_id"]) - set(ver["b"])
    assert kept == exp
    # the planted clusters actually collapsed: each cluster's min id kept
    assert "a1" in kept and "b1" in kept
    assert not {"a2", "a3", "b2"} & kept


def test_line_repetition_matches_sql(ray_session):
    import duckdb

    from kaza_lcms_ray.stages import text as T

    df = _para_corpus()
    # add a doc with heavy within-doc line repetition
    rep = "repeat this exact long line please\n" * 4 + "tail"
    df = pd.concat(
        [df, pd.DataFrame({"doc_id": [9], "text": [rep]})], ignore_index=True
    )
    got = (
        T.line_repetition(rd.from_pandas(df), "text", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs_in", df)
    exp = (
        con.sql(T.line_repetition_sql("SELECT doc_id, text FROM docs_in"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac"]],
        exp[["doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac"]],
        check_dtype=False,
    )
    # doc 9: 5 lines, 3 dup occurrences of the long line
    r9 = got.set_index("doc_id").loc[9]
    assert r9["n_lines"] == 5 and abs(r9["dup_line_frac"] - 3 / 5) < 1e-15


def test_redact_matches_sql(ray_session):
    import duckdb

    from kaza_lcms_ray.stages import text as T

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "call 555-123 4567 now",
                "no digits here at all",
                "a 1234567890 b 22-33-44-55 c",
            ],
        }
    )
    got = (
        T.redact(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs_in", df)
    exp = (
        con.sql(T.redact_sql("SELECT doc_id, text FROM docs_in"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
    assert got.loc[0, "n_hits"] == 1 and got.loc[1, "n_hits"] == 0
    assert "<NUM>" in got.loc[2, "text_redacted"]


def test_drop_dup_paragraphs_join_fallback_equals_broadcast(ray_session):
    """keeper_broadcast_limit=0 forces the hash-join fallback; both paths
    must produce the identical corpus."""
    df = _para_corpus()
    a = (
        dedup.drop_dup_paragraphs(rd.from_pandas(df), "text", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dedup.drop_dup_paragraphs(
            rd.from_pandas(df), "text", "doc_id", keeper_broadcast_limit=0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_dup_window_signals_hand_and_reshard(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import dedup

    # win=8, stride=4: doc0/doc1 share "abcdefgh" (a window of both);
    # doc2 is unique; doc3 is too short for any window
    rows = [
        "abcdefghXYZWkkkk",   # windows: abcdefgh, efghXYZW, XYZWkkkk
        "qqabcdefghzz",       # windows: qqabcdef, abcdefgh (at off 2 — not
                              # aligned? off 0,4: qqabcdef, bcdefghz) — see below
        "unique window text here",
        "short",
    ]
    # recompute expectations with the actual rule: offsets 0,4,8,... with
    # off + 8 <= len
    import duckdb

    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                    "text": pa.array(rows)})
    con = duckdb.connect()
    con.register("docs", tbl)
    want = (
        con.execute(
            dedup.dup_window_signals_sql("SELECT doc_id, text FROM docs", win=8, stride=4)
        )
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for parts in (1, 3):
        got = (
            dedup.dup_window_signals(
                rd.from_arrow(tbl).repartition(parts), win=8, stride=4
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got[sorted(got.columns)].equals(want[sorted(want.columns)])
    # doc3 (too short) absent; shared window flagged on both owners
    assert set(want["doc_id"]) == {0, 1, 2}
    assert want.set_index("doc_id").loc[2, "n_dup_fps"] == 0


def test_dup_window_signals_string_ids(ray_session):
    """id column can be any dtype (the corpus path keys on string
    'doc#span' ids)."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import dedup

    tbl = pa.table(
        {
            "doc_id": pa.array(["a#0", "b#1", "c#2"]),
            "text": pa.array(["abcdefgh", "abcdefgh", "zzzzzzzz"]),
        }
    )
    out = (
        dedup.dup_window_signals(rd.from_arrow(tbl), win=8, stride=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == ["a#0", "b#1", "c#2"]
    assert list(out["n_dup_fps"]) == [1, 1, 0]


def test_dedup_report_hand_and_reshard(ray_session):
    """dedup_report: exact per-group (n_docs, n_unique, dup_rate) on a
    hand-checkable corpus, invariant under repartitioning (the fp-bucketed
    distinct must not double-count a fingerprint split across blocks)."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.dedup import dedup_report

    texts = ["a", "a", "b", "c", "c", "c", "x", "y"]
    srcs = ["s1", "s1", "s1", "s2", "s2", "s2", "s2", "s2"]
    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(8)), "text": texts, "source": srcs})
    )
    for d in (ds, ds.repartition(5)):
        out = (
            dedup_report(d)
            .to_pandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert out["n_docs"].tolist() == [3, 5]
        assert out["n_unique"].tolist() == [2, 3]
        assert out["dup_rate"].tolist() == [1.0 - 2 / 3, 1.0 - 3 / 5]


def test_near_dedup_keep_best_quality_rule(ray_session):
    """Quality-keeper fuzzy dedup: the lower-quality pair member drops
    (keeper flips vs the min-id rule when the later doc scores higher);
    with constant quality the survivor set equals near_dedup_filter's."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.dedup import near_dedup_filter, near_dedup_keep_best

    base = "the quick brown fox jumps over the lazy dog " * 6
    texts = [base, base + "tail!", "something entirely different " * 8]
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2, 3], "text": texts}))

    def q(vals):
        return rd.from_arrow(
            pa.table({"doc_id": [1, 2, 3], "quality": np.asarray(vals, float)})
        )

    # doc 2 (near-dup of 1) scores higher -> doc 1 drops
    best = near_dedup_keep_best(ds, q([0.1, 0.9, 0.5])).to_pandas()
    assert sorted(best["doc_id"]) == [2, 3]
    # constant quality -> tie -> larger id drops, same as the min-id rule
    tied = near_dedup_keep_best(ds, q([0.5, 0.5, 0.5])).to_pandas()
    minid = near_dedup_filter(ds).to_pandas()
    assert sorted(tied["doc_id"]) == sorted(minid["doc_id"]) == [1, 3]


def test_dedup_against_broadcast_and_join_paths_equal(ray_session):
    """Incremental dedup: new rows whose text exists in the reference
    corpus drop; the broadcast-membership and hash-join paths agree; an
    empty reference keeps everything."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.dedup import dedup_against

    new = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 4], "text": ["a", "b", "c", "a"]})
    )
    ref = rd.from_arrow(pa.table({"doc_id": [10, 11], "text": ["a", "x"]}))
    got_b = sorted(dedup_against(new, ref).to_pandas()["doc_id"])
    got_j = sorted(dedup_against(new, ref, max_broadcast_fps=0).to_pandas()["doc_id"])
    assert got_b == got_j == [2, 3]
    empty_ref = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                        "text": pa.array([], pa.string())}))
    assert sorted(dedup_against(new, empty_ref).to_pandas()["doc_id"]) == [1, 2, 3, 4]


def test_snapshot_diff_hand(ray_session):
    """added/removed/changed classification; unchanged rows never appear;
    reshard-invariant."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.dedup import snapshot_diff

    a = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3, 4], "text": ["a", "b", "c", "d"]})
    )
    b = rd.from_arrow(
        pa.table({"doc_id": [2, 3, 4, 9], "text": ["b", "C!", "d", "new"]})
    )
    expect = {1: "removed", 3: "changed", 9: "added"}
    for aa, bb in ((a, b), (a.repartition(3), b.repartition(2))):
        out = snapshot_diff(aa, bb).to_pandas()
        assert dict(zip(out["doc_id"], out["status"])) == expect


# ----------------------------------------- corpus-wide frequent-line removal


def _boilerplate_corpus():
    nav = "NAVIGATION HOME ABOUT CONTACT US TODAY"  # 3 occurrences -> removed
    rare = "rare footer occurring exactly twice ok"  # 2 occurrences -> kept
    short = "---"  # short lines always survive, however frequent
    return pd.DataFrame(
        [
            ("d1", f"unique first body line of doc one\n{nav}\n{short}"),
            ("d2", f"{nav}\nsecond doc unique content line\n{rare}"),
            ("d3", f"third doc says something else\n{rare}\n{nav}\n{short}"),
            ("d4", nav),  # only line removed -> doc disappears
            ("d5", f"{short}\n{short}"),  # short-only doc survives intact
        ],
        columns=["doc_id", "text"],
    )


def test_drop_frequent_lines_threshold_and_rebuild(ray_session):
    df = _boilerplate_corpus()
    out = (
        dedup.drop_frequent_lines(rd.from_pandas(df), min_count=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # d4 lost its only line and disappears
    assert sorted(out.index) == ["d1", "d2", "d3", "d5"]
    assert out.loc["d1", "text_clean"] == "unique first body line of doc one\n---"
    # rare (2 < 3) and short lines survive; order preserved
    assert out.loc["d2", "text_clean"].endswith("rare footer occurring exactly twice ok")
    assert out.loc["d3", "text_clean"] == (
        "third doc says something else\nrare footer occurring exactly twice ok\n---"
    )
    assert out.loc["d5", "text_clean"] == "---\n---"
    assert int(out.loc["d1", "n_dropped"]) == 1
    assert int(out.loc["d5", "n_dropped"]) == 0


def test_drop_frequent_lines_join_path_matches_broadcast(ray_session):
    df = _boilerplate_corpus()
    a = (
        dedup.drop_frequent_lines(rd.from_pandas(df), min_count=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dedup.drop_frequent_lines(rd.from_pandas(df), min_count=3, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_mmr_select_diversifies(ray_session):
    """Three near-identical docs + one different-but-relevant doc: plain
    top-2 would take two clones; MMR must pick one clone then the
    different doc."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import dedup

    q = "the quick brown fox jumps over the lazy dog near the river bank"
    clone = q + " indeed"
    # "other": shares most of the query (high relevance) but differs from
    # the clones enough that 2*rel - sim favors it at step 2
    other = "the quick brown fox jumps over the lazy dog near the harbor wall"
    noise = "completely unrelated text about spacecraft telemetry budgets"
    docs = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": [0, 1, 2, 3, 4],
                    "text": [q, clone, clone + " truly", other, noise],
                }
            ),
            preserve_index=False,
        )
    )
    out = dedup.mmr_select(docs, q, k_results=2, pool_size=4).to_pandas()
    assert out["rank"].tolist() == [1, 2]
    assert out["doc_id"].iloc[0] in (1, 2)  # a clone wins on relevance
    assert out["doc_id"].iloc[1] == 3  # diversity: the other clone is demoted
    # rerun determinism
    out2 = dedup.mmr_select(docs, q, k_results=2, pool_size=4).to_pandas()
    assert out2["doc_id"].tolist() == out["doc_id"].tolist()


def test_containment_asymmetric(ray_session):
    """A short doc fully inside a long one scores containment 1.0 while
    Jaccard stays low; unrelated docs produce no pair."""
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import dedup

    short = "the quick brown fox jumps over the lazy dog"
    long = short + " while the river bends north past the floodplain and on"
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [short, long, "completely different words entirely here"],
        }
    )
    ds = rd.from_pandas(df)
    out = dedup.containment_pairs(ds, "text", "doc_id", k=5, threshold=0.5).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (1, 2) in pairs
    row = out[(out["a"] == 1) & (out["b"] == 2)].iloc[0]
    assert row["containment"] == 1.0
    jac = dedup.ngram_jaccard([short], [long], k=5)[0]
    assert jac < 0.9
    assert not any(3 in p for p in pairs)
