"""End-to-end corpus curation — the canonical LLM training-data flow as
ONE composed Dataset pipeline: exact dedup → language/quality filter →
seeded subsample.

Each stage is an already-verified operator (dedup.drop_exact_dupes,
text.TextScorer, splitmix sampling); the composition itself is what a real
user runs over 100 TB, so it gets its own value-checked query: the DuckDB
oracle chains the same three stages (min-id-per-text CTE, the text-score
expression trees, the integer hash-threshold sample) and must produce the
identical survivor set.

Determinism notes: the subsample compares ``hash >> 11 < frac·2^53`` in
INTEGERS on both sides (no float u), and float quality thresholds agree
because the quality doubles themselves are oracle-equal.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..state.hashing import DEFAULT_SEED, _fnv1a, hash_key


def curate_corpus(
    docs,
    seed: int = DEFAULT_SEED,
    min_quality: float = 0.45,
    lang: str = "en",
    sample_frac: float = 0.5,
):
    """documents(doc_id, text) → surviving doc_id Dataset."""
    import pyarrow.compute as pc

    from ..stages import dedup, text

    kept = dedup.drop_exact_dupes(docs, "text", "doc_id")
    scored = text.text_scores(kept)

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t.column("quality"), min_quality),
            pc.equal(t.column("lang_pred"), lang),
        )
        return t.filter(m)

    thresh = int(sample_frac * float(1 << 53))

    def sample(t: pa.Table) -> pa.Table:
        col = t.column("doc_id")
        if t.num_rows == 0:
            return t.select(["doc_id"])
        if pa.types.is_integer(col.type):
            keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            keys = np.asarray(
                [_fnv1a(s) for s in col.to_pylist()], dtype=np.uint64
            )
        h = hash_key(seed, "cur", keys)
        keep_m = (h >> np.uint64(11)).astype(np.int64) < thresh
        return t.filter(pa.array(keep_m)).select(["doc_id"])

    return scored.map_batches(keep, batch_format="pyarrow").map_batches(
        sample, batch_format="pyarrow"
    )


def pretrain_build(
    docs_full,
    mix_weight,
    alpha: float = 0.7,
    budget: int = 512,
    seed: int = DEFAULT_SEED,
):
    """The full pretraining data-prep funnel as ONE composed flow:
    curation (dedup → quality/lang → subsample) → weighted source mixing →
    concat-and-chunk sequence packing.

    ``docs_full`` is Dataset[doc_id, text, source].  Survivor sets travel
    as hash joins on doc_id (corpus-sized — never broadcast); only the
    skinny (doc_id, source) projection is materialized between the two
    passes mix_sources makes over its input.  Returns the packed layout
    Dataset[doc_id, n_tokens, pack_id, pack_pos, n_splits]."""
    from ..runtime import join_partitions
    from ..stages import packing

    # survivor-id sides are materialized (skinny doc_id[+source] columns)
    # so join partitions can be sized from the actual row count — Ray
    # 2.49's hash-join aggregator fails on schema-less empty partitions
    # (same workaround as dedup._verify_pairs_distributed)
    kept1 = curate_corpus(
        docs_full.select_columns(["doc_id", "text"]), seed=seed
    ).materialize()
    np1 = join_partitions(rows_hint=kept1.count())
    # NOT materialized: mix_sources makes two passes (counts, filter) and
    # each re-executes this join — at 10^12 docs the curated (id, source)
    # table is tens of TB, and re-running a hash join twice streams while
    # pinning it in the object store does not.  A checkpointed deployment
    # would persist this stage via lineage.resumable_write instead (the
    # pretrain CLI persists the final layout that way).
    mix_in = docs_full.select_columns(["doc_id", "source"]).join(
        kept1, join_type="inner", num_partitions=np1, on=("doc_id",)
    )
    mixed = packing.mix_sources(mix_in, mix_weight, alpha=alpha, seed=seed).materialize()
    np2 = join_partitions(rows_hint=mixed.count())
    pack_in = docs_full.select_columns(["doc_id", "text"]).join(
        mixed.select_columns(["doc_id"]),
        join_type="inner",
        num_partitions=np2,
        on=("doc_id",),
    )
    return packing.pack_sequences(pack_in, budget=budget, seed=seed)


def pretrain_build_sql(
    scores_sql: str,
    weight_sql: str,
    alpha: float = 0.7,
    budget: int = 512,
    seed: int = DEFAULT_SEED,
) -> str:
    """Oracle: chain the three verified stage oracles over the same
    survivor sets."""
    from ..stages import packing

    kept1 = curation_sql(scores_sql, seed=seed)
    mix_in = f"""SELECT d.doc_id, d.source FROM documents d
                 JOIN ({kept1}) k1 ON d.doc_id = k1.doc_id"""
    kept2 = packing.mix_sources_sql(mix_in, weight_sql, alpha=alpha, seed=seed)
    pack_in = f"""SELECT d.doc_id, d.text FROM documents d
                  JOIN ({kept2}) k2 ON d.doc_id = k2.doc_id"""
    return packing.pack_sequences_sql(pack_in, budget=budget, seed=seed)


_QBIN_SCALE = 16777216.0  # 2^24 quality bins — exact IEEE multiply both sides


def adaptive_quality_filter(docs, p: float = 25.0, source_col: str = "source"):
    """Per-source adaptive quality cutoff: keep documents whose quality
    score is ≥ their OWN source's p-th percentile — the group-adaptive
    filter that drops each source's worst tail without a global threshold
    penalizing weaker sources.

    The percentile rule is DECOMPOSABLE (VERDICT r3 #2a — the old exact
    quantile put an entire source's quality column in ONE map_groups
    task): quality is quantized to 2²⁴ bins (``floor(q·2²⁴)``, an exact
    IEEE multiply DuckDB reproduces bit-for-bit), per-batch (source, bin)
    integer counts combine through a hash-bucketed sum, and the cutoff is
    the nearest-rank bin — the first bin whose cumulative count reaches
    ``ceil(n·p/100)``.  Max task rows = occupied bins per source ≤ 2²⁴,
    independent of corpus size; the only driver-side table is |sources|
    cutoff rows.  Resolution: the kept set can differ from the continuous
    percentile only for documents within 2⁻²⁴ ≈ 6·10⁻⁸ of it; the oracle
    (adaptive_quality_sql) is pinned to the SAME quantized rule, the
    hll_distinct pattern.  Returns Dataset[doc_id, source, quality]."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from ..stages import text
    from ..stages.zonal import bucketed_sum

    scored = text.text_scores(docs)
    frac = p / 100.0

    def partial(t: pa.Table) -> pa.Table:
        q = t.column("quality").to_numpy(zero_copy_only=False)
        qbin = np.floor(q * _QBIN_SCALE).astype(np.int64)
        tb = t.select([source_col]).append_column("qbin", pa.array(qbin))
        out = tb.group_by([source_col, "qbin"]).aggregate([([], "count_all")])
        return out.rename_columns([source_col, "qbin", "cnt"])

    hist = bucketed_sum(
        scored.map_batches(partial, batch_format="pyarrow"),
        [source_col, "qbin"],
        ["cnt"],
    )

    def cutoff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("qbin", kind="mergesort")
        cnt = g["cnt"].to_numpy(np.int64)
        rank = int(np.ceil(int(cnt.sum()) * frac))
        j = int(np.searchsorted(np.cumsum(cnt), rank))
        return pd.DataFrame(
            {
                source_col: [g[source_col].iloc[0]],
                "cut_bin": [int(g["qbin"].to_numpy()[j])],
            }
        )

    cuts = (
        hist.groupby(source_col).map_groups(cutoff, batch_format="pandas").to_pandas()
    )
    cut_ref = ray.put(
        {
            "sources": pa.array(cuts[source_col].astype(str), type=pa.large_string()),
            "cut_bin": cuts["cut_bin"].to_numpy(np.int64),
        }
    )

    def keep(t: pa.Table) -> pa.Table:
        from ..stages.joins import probe_positions

        cs = ray.get(cut_ref)
        q = t.column("quality").to_numpy(zero_copy_only=False)
        qbin = np.floor(q * _QBIN_SCALE).astype(np.int64)
        pos = probe_positions(t.column(source_col), cs["sources"], "source")
        lim = cs["cut_bin"][pos]
        out = t.select(["doc_id", source_col, "quality"])
        return out.filter(pa.array(qbin >= lim))

    return scored.map_batches(keep, batch_format="pyarrow")


def adaptive_quality_sql(scores_sql: str, p: float = 25.0) -> str:
    """Oracle: the SAME quantized nearest-rank rule as
    ``adaptive_quality_filter`` (the hll_distinct pattern — both branches
    pinned to one deterministic rule): bin = floor(quality·2²⁴), cutoff =
    first bin whose running count reaches ceil(n·p/100), keep bin ≥
    cutoff.  The quality doubles themselves are oracle-equal
    (text_scores' expression tree), and floor/ceil/× are IEEE-identical."""
    return f"""
        WITH s AS (
            SELECT f.doc_id, d.source, f.quality,
                   CAST(floor(f.quality * {_QBIN_SCALE!r}) AS BIGINT) AS qbin
            FROM ({scores_sql}) f JOIN documents d ON f.doc_id = d.doc_id
        ),
        h AS (
            SELECT source, qbin, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM s GROUP BY source, qbin
        ),
        r AS (
            SELECT source, qbin,
                   SUM(cnt) OVER (PARTITION BY source ORDER BY qbin) AS cum,
                   SUM(cnt) OVER (PARTITION BY source) AS n
            FROM h
        ),
        c AS (
            SELECT source, min(qbin) AS cut_bin
            FROM r WHERE cum >= ceil(n * {p / 100.0!r}) GROUP BY source
        )
        SELECT s.doc_id, s.source, s.quality
        FROM s JOIN c USING (source)
        WHERE s.qbin >= c.cut_bin"""


def curation_sql(scores_sql: str, seed: int = DEFAULT_SEED, min_quality: float = 0.45, lang: str = "en", sample_frac: float = 0.5) -> str:
    """Oracle: min-id-per-text keepers ∩ score thresholds ∩ integer hash
    sample, chaining the already-verified text-score SQL."""
    from ..state import sqlhash as SH

    prefix = SH.hug(SH.hash_key_prefix(seed, "cur"))
    thresh = int(sample_frac * float(1 << 53))
    hashed = SH.chain_select(
        f"""SELECT f.doc_id, CAST(f.doc_id AS HUGEINT) AS idh
            FROM ({scores_sql}) f
            JOIN (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text) k
              ON f.doc_id = k.doc_id
            WHERE f.quality >= {min_quality!r} AND f.lang_pred = '{lang}'""",
        SH.splitmix_steps(SH.xor64(prefix, "idh"), "ch", "cu"),
    )
    return f"""
        SELECT doc_id FROM ({hashed})
        WHERE CAST(ch // 2048 AS BIGINT) < {thresh}"""


_ZBIN_SCALE = 4096.0  # 2^12 z-score bins: coarse enough that the exact
# integer moment sums stay safe (Σ cnt·bin² ≤ n·2²⁴), fine enough for
# feature scaling; an exact IEEE multiply both sides


def source_zscore(docs, source_col: str = "source"):
    """Per-source z-score normalization of the quality signal — the
    feature-scaling step of a mixture recipe (each source's scores become
    comparable before cross-source thresholds).

    Fully decomposable, exact under any combine order (the
    adaptive_quality_filter histogram shape): quality quantizes to 2¹²
    bins, (source, bin) integer counts reduce through the bucketed sum,
    per-source moments fold over the ≤4097-row histogram with PYTHON
    bigints (exact at any corpus size; the oracle's HUGEINT sums match),
    and the float64 mean/var/z expression tree mirrors the SQL exactly.
    Sources with zero variance get z = 0.  Returns
    Dataset[doc_id, source, quality, z]."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from ..stages import text
    from ..stages.zonal import bucketed_sum

    scored = text.text_scores(docs)

    def partial(t: pa.Table) -> pa.Table:
        q = t.column("quality").to_numpy(zero_copy_only=False)
        zb = np.floor(q * _ZBIN_SCALE).astype(np.int64)
        tb = t.select([source_col]).append_column("zb", pa.array(zb))
        out = tb.group_by([source_col, "zb"]).aggregate([([], "count_all")])
        return out.rename_columns([source_col, "zb", "cnt"])

    hist = bucketed_sum(
        scored.map_batches(partial, batch_format="pyarrow"),
        [source_col, "zb"],
        ["cnt"],
    )

    def moments(g: pd.DataFrame) -> pd.DataFrame:
        cnt = [int(c) for c in g["cnt"].to_numpy(np.int64)]
        zb = [int(b) for b in g["zb"].to_numpy(np.int64)]
        n = sum(cnt)  # python bigints: exact at any corpus size
        s1 = sum(c * b for c, b in zip(cnt, zb))
        s2 = sum(c * b * b for c, b in zip(cnt, zb))
        mean = float(s1) / float(n)
        var = float(s2) / float(n) - mean * mean
        return pd.DataFrame(
            {
                source_col: [g[source_col].iloc[0]],
                "mean": [mean],
                "std": [math.sqrt(var) if var > 0 else 0.0],
            }
        )

    stats = (
        hist.groupby(source_col).map_groups(moments, batch_format="pandas").to_pandas()
    )
    side_ref = ray.put(
        {
            "sources": pa.array(stats[source_col].astype(str), type=pa.large_string()),
            "mean": stats["mean"].to_numpy(np.float64),
            "std": stats["std"].to_numpy(np.float64),
        }
    )

    def apply_z(t: pa.Table) -> pa.Table:
        from ..stages.joins import probe_positions

        side = ray.get(side_ref)
        q = t.column("quality").to_numpy(zero_copy_only=False)
        zb = np.floor(q * _ZBIN_SCALE)
        pos = probe_positions(t.column(source_col), side["sources"], "source")
        mean, std = side["mean"][pos], side["std"][pos]
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(std > 0, (zb - mean) / std, 0.0)
        out = t.select(["doc_id", source_col, "quality"])
        return out.append_column("z", pa.array(z.astype(np.float64)))

    return scored.map_batches(apply_z, batch_format="pyarrow")


def source_zscore_sql(scores_sql: str) -> str:
    """Oracle: the identical quantized-moment rule (HUGEINT sums = the
    engine's python bigints; the same float64 mean/var/z expression
    tree)."""
    return f"""
        WITH s AS (
            SELECT f.doc_id, d.source, f.quality,
                   CAST(floor(f.quality * {_ZBIN_SCALE!r}) AS BIGINT) AS zb
            FROM ({scores_sql}) f JOIN documents d ON f.doc_id = d.doc_id
        ),
        h AS (
            SELECT source, zb, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM s GROUP BY source, zb
        ),
        m AS (
            SELECT source,
                   CAST(SUM(CAST(cnt AS HUGEINT)) AS DOUBLE) AS n_d,
                   CAST(SUM(CAST(cnt AS HUGEINT) * zb) AS DOUBLE) AS s1_d,
                   -- HUGEINT products: cnt·zb² can pass 2⁶³ at corpus scale
                   CAST(SUM(CAST(cnt AS HUGEINT) * zb * zb) AS DOUBLE) AS s2_d
            FROM h GROUP BY source
        ),
        st AS (
            SELECT source, s1_d / n_d AS mean,
                   s2_d / n_d - (s1_d / n_d) * (s1_d / n_d) AS var
            FROM m
        )
        SELECT s.doc_id, s.source, s.quality,
               CASE WHEN st.var > 0
                    THEN (floor(s.quality * {_ZBIN_SCALE!r}) - st.mean)
                         / sqrt(st.var)
                    ELSE 0.0 END AS z
        FROM s JOIN st USING (source)"""


def web_curation(
    docs,
    pattern: str,
    replacement: str = "<ENT>",
    p: float = 25.0,
    source_col: str = "source",
):
    """The full modern web-corpus funnel composed from the staged
    operators, one streaming flow:

      1. regex scrubbing (``text.redact`` — stateless RE2 pass);
      2. corpus-wide paragraph dedup with document reassembly
         (``dedup.drop_dup_paragraphs`` — fingerprint keeper reduce +
         broadcast probe; docs whose every paragraph was dropped vanish);
      3. Gopher repetition/quality rules over the CLEANED text
         (``text.gopher_quality``) — survivors travel as a skinny id
         hash-join, never a broadcast of corpus size;
      4. per-source adaptive quality cutoff over the cleaned text
         (``adaptive_quality_filter`` — decomposable quantized
         histogram), source attached back from the input table by one
         integer-keyed hash join.

    Returns Dataset[doc_id, source, quality] of surviving documents.
    Every stage's survivor set is either a stateless filter or a skinny
    hash join — nothing driver-side or broadcast grows with the corpus
    except the |sources| cutoff table."""
    import pyarrow as pa

    from ..runtime import join_partitions
    from ..stages import dedup, text

    def as_text(col_from):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t.column("doc_id"), "text": t.column(col_from)})

        return fn

    clean = text.redact(docs, pattern, replacement).map_batches(
        as_text("text_redacted"), batch_format="pyarrow"
    )
    # Materialized DELIBERATELY (pack_sequences discipline): this table
    # feeds BOTH the Gopher pass and the survivor join below, and
    # recomputing it re-runs the entire redact + paragraph-dedup
    # sub-funnel (itself two corpus passes).  Beyond memory the object
    # store spills — a disk-backed checkpoint between consumers.
    deduped = (
        dedup.drop_dup_paragraphs(clean, "text", "doc_id")
        .map_batches(as_text("text_clean"), batch_format="pyarrow")
        .materialize()
    )

    gq = text.gopher_quality(deduped)
    keep_ids = (
        gq.map_batches(
            lambda t: t.filter(
                pa.compute.equal(t.column("keep"), pa.scalar(1))
            ).select(["doc_id"]),
            batch_format="pyarrow",
        ).materialize()  # skinny survivor ids (pack discipline)
    )
    n_keep = keep_ids.count()
    if n_keep == 0:
        # zero Gopher survivors: the funnel result is exactly empty, and
        # Ray 2.49's hash-join aggregator crashes on the schema-less empty
        # partitions an empty side produces — return the typed empty
        import ray.data as rd

        id_type = keep_ids.schema().base_schema.field("doc_id").type
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], id_type),
                    source_col: pa.array([], pa.string()),
                    "quality": pa.array([], pa.float64()),
                }
            )
        )
    kept = deduped.join(
        keep_ids,
        join_type="inner",
        num_partitions=join_partitions(rows_hint=n_keep),
        on=("doc_id",),
    )

    src = docs.select_columns(["doc_id", source_col])
    # materialized: adaptive_quality_filter consumes its input twice
    # (histogram pass + final filter pass) — pin the survivor-sized table
    # once instead of re-running both joins per consumer
    kept_src = kept.join(
        src,
        join_type="inner",
        num_partitions=join_partitions(rows_hint=n_keep),
        on=("doc_id",),
    ).materialize()
    return adaptive_quality_filter(kept_src, p=p, source_col=source_col)


def web_curation_sql(
    text_scores_sql_of,
    pattern: str,
    replacement: str = "<ENT>",
    p: float = 25.0,
) -> str:
    """Oracle: the same four stages composed from each operator's own SQL
    builder.  ``text_scores_sql_of`` is the (docs_sql → scores SQL)
    builder so the adaptive stage scores the CLEANED text while source
    still comes from the base documents table."""
    from ..stages import dedup, text

    red = text.redact_sql(
        "SELECT doc_id, text FROM documents", pattern, replacement
    )
    red_txt = f"SELECT doc_id, text_redacted AS text FROM ({red})"
    pd_sql = dedup.drop_dup_paragraphs_sql(red_txt)
    pd_txt = f"SELECT doc_id, text_clean AS text FROM ({pd_sql})"
    gq = text.gopher_quality_sql(pd_txt)
    kept = f"""
        SELECT p.doc_id, p.text FROM ({pd_txt}) p
        JOIN ({gq}) g ON p.doc_id = g.doc_id AND g.keep = 1"""
    return adaptive_quality_sql(text_scores_sql_of(kept), p=p)


# ----------------------------------------- model-based quality classifier

RFQ_FEATURES = ["stop_ratio", "alpha_ratio", "mean_tok_len"]
RFQ_TRAIN_MOD = 3  # train slice: doc_id % MOD == 0 (bounded at any corpus)
RFQ_TREES = 25
RFQ_DEPTH = 8
_RFQ_MEMO: dict = {}


def _rfq_features(t: pa.Table) -> np.ndarray:
    """(n, 3) float64 feature matrix from a (doc_id, text) batch via the
    TextScorer kernels — the identical doubles the oracle recomputes."""
    from ..stages.text import TextScorer

    scored = TextScorer()(t)
    return np.column_stack(
        [
            scored.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in RFQ_FEATURES
        ]
    )


def quality_classifier_artifacts(docs_path: str, out_root: str) -> dict:
    """Train the fasttext-style model-based quality filter ONCE and persist
    the node table the SQL oracle replays.

    Pipeline analog of the reference's primitives discipline
    (/root/reference/src/utils/primitives.py:69-97) applied to curation:
    the TRAIN SLICE (doc_id % RFQ_TRAIN_MOD == 0 — bounded sample, the
    only thing ever driver-side) gets TextScorer features
    (stop/alpha/mean-token-length) and Gopher keep labels; two binary
    forests (class 1 = keep) train seeded; the flattened node tables land
    at {out_root}/rfq_model/trees.parquet for the recursive-CTE walk.
    Scoring is distributed (broadcast forests, predict_quantized int64
    leaf sums — order-free, SQL-exact)."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages import text as T
    from ..state.forest import nodes_table, train_forest

    key = (docs_path, out_root)
    if key in _RFQ_MEMO:
        return _RFQ_MEMO[key]
    base = os.path.join(out_root, "rfq_model")
    trees_path = os.path.join(base, "trees.parquet")
    marker = os.path.join(base, "done-rfq.json")
    if not os.path.exists(marker):
        os.makedirs(base, exist_ok=True)
        tbl = pq.read_table(docs_path, columns=["doc_id", "text"])
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tbl = tbl.filter(pa.array(ids % RFQ_TRAIN_MOD == 0))
        X = _rfq_features(tbl)
        labels = (
            T.gopher_quality(rd.from_arrow(tbl))
            .to_pandas()
            .set_index("doc_id")["keep"]
        )
        y = labels.loc[tbl.column("doc_id").to_numpy(zero_copy_only=False)].to_numpy()
        models = {}
        for c in (0, 1):
            models[c] = train_forest(
                X,
                y == c,
                n_trees=RFQ_TREES,
                max_depth=RFQ_DEPTH,
                class_tag=c,
                feature_names=RFQ_FEATURES,
            )
        nt = pa.concat_tables([nodes_table(models[c], c) for c in (0, 1)])
        pq.write_table(nt, trees_path)
        with open(marker, "w") as f:
            json.dump({"n_train": len(tbl)}, f)
        _RFQ_MEMO[key] = {"models": models, "trees_path": trees_path}
        return _RFQ_MEMO[key]
    # replay-from-disk path: rebuild the forests deterministically (same
    # slice, same seed ⇒ identical bytes as the persisted node table)
    tbl = pq.read_table(docs_path, columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    tbl = tbl.filter(pa.array(ids % RFQ_TRAIN_MOD == 0))
    X = _rfq_features(tbl)
    from ..stages import text as T2
    import ray.data as rd2

    labels = (
        T2.gopher_quality(rd2.from_arrow(tbl)).to_pandas().set_index("doc_id")["keep"]
    )
    y = labels.loc[tbl.column("doc_id").to_numpy(zero_copy_only=False)].to_numpy()
    from ..state.forest import train_forest as _tf

    models = {
        c: _tf(
            X,
            y == c,
            n_trees=RFQ_TREES,
            max_depth=RFQ_DEPTH,
            class_tag=c,
            feature_names=RFQ_FEATURES,
        )
        for c in (0, 1)
    }
    _RFQ_MEMO[key] = {"models": models, "trees_path": trees_path}
    return _RFQ_MEMO[key]


def quality_classify(docs, models):
    """Distributed model-based quality scoring: broadcast the two binary
    forests, one stateless map computes TextScorer features + the exact
    int64 quantized leaf sums; pred = argmax (pq desc, class asc).
    Returns Dataset[doc_id, pq_0, pq_1, pred]."""
    import ray

    ref = ray.put(models)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        X = _rfq_features(t)
        pq0 = m[0].predict_quantized(X)
        pq1 = m[1].predict_quantized(X)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "pq_0": pa.array(pq0),
                "pq_1": pa.array(pq1),
                "pred": pa.array((pq1 > pq0).astype(np.int64)),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def leakage_safe_split(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    frac: float = 0.8,
    jaccard_threshold: float = 0.4,
):
    """Contamination-safe train/test split: the seeded 80/20 split, then
    every TRAIN document that is a verified near-duplicate (exact
    k-shingle Jaccard ≥ threshold over LSH candidates) of any TEST
    document is dropped from train — the split-hygiene step that stops
    eval leakage through near-copies (Lee et al. 2022's dedup-the-split
    finding).

    Scale shape: split membership is COMPUTABLE from the id (the seeded
    hash rule), so the leak test needs NO join against the test split —
    each verified pair classifies its endpoints by re-hashing inside the
    batch; only the leaking-train id set (≤ 2·|near-dup pairs|, ≪ corpus)
    is collected and broadcast for the anti-join (swap to the fp-keyed
    hash-join fallback if a corpus's dup-pair count ever approaches the
    broadcast limit).

    Returns Dataset[id_col] — the clean train ids."""
    import pyarrow as pa

    from ..stages import dedup, joins, sampling

    train, _test = sampling.split_train_test(docs, [id_col], frac=frac)
    cand = dedup.minhash_candidate_pairs(docs, text_col, id_col).materialize()
    verified = dedup._verify_pairs_distributed(
        docs, cand, text_col, id_col, k=5,
        threshold=jaccard_threshold, n_pairs=cand.count(),
    ).filter(expr=f"jaccard >= {jaccard_threshold}")

    def leaking_train_ids(t: pa.Table) -> pa.Table:
        from ..state.hashing import DEFAULT_SEED, hash_unit

        def rnd(col):
            tt = pa.table({id_col: t.column(col)})
            return hash_unit(DEFAULT_SEED, "split", sampling._row_key(tt, [id_col]))

        ra, rb = rnd("a"), rnd("b")
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        a_train, b_train = ra < frac, rb < frac
        leak = np.concatenate([a[a_train & ~b_train], b[b_train & ~a_train]])
        return pa.table({"leak": pa.array(np.unique(leak))})

    leaks = verified.map_batches(
        leaking_train_ids, batch_format="pyarrow"
    ).to_pandas()
    leak_ids = leaks["leak"].to_numpy() if len(leaks) else np.array([], np.int64)
    clean = joins.anti_join_ids(train, id_col, np.unique(leak_ids))
    return clean.select_columns([id_col])


def quantile_normalize(docs, source_col: str = "source"):
    """Cross-source QUANTILE normalization of the quality signal — the
    rank-based sibling of :func:`source_zscore` (robust to per-source
    score-distribution shape, the calibration mixture recipes use when
    sources score on incomparable scales): each document's quality is
    replaced by the GLOBAL quality bin at its within-source rank.

    Rule (integers end-to-end, shared with the oracle): quality quantizes
    to the 2¹² bins; r = within-source inclusive cum count at the doc's
    bin; target = ⌈r · n_glob / n_s⌉ (exact ceil); norm_bin = the smallest
    global bin whose inclusive global cum ≥ target.  The global cum is
    strictly increasing over present bins, so the answer is unique — no
    tie rule needed.

    Scale shape: ONE decomposable (source, bin) histogram reduce (the
    source_zscore shape, ≤ |sources|·4097 rows); the (source, bin) →
    norm_bin mapping is computed on the DRIVER with python bigints (exact
    at any corpus size — r·n_glob would overflow int64 per-row at 10¹²
    docs, the bounded-pairs mapping sidesteps that) and broadcast as a
    dense lookup; the per-row pass is a stateless 2-D take.

    Output: (doc_id, source, quality, norm_bin:int64, norm_q:f64).
    """
    import pandas as pd  # noqa: F401
    import pyarrow as pa
    import pyarrow.compute as pc  # noqa: F401

    import ray

    from ..stages import text
    from ..stages.joins import probe_positions
    from ..stages.zonal import bucketed_sum

    scored = text.text_scores(docs)

    def partial(t: pa.Table) -> pa.Table:
        q = t.column("quality").to_numpy(zero_copy_only=False)
        zb = np.floor(q * _ZBIN_SCALE).astype(np.int64)
        tb = t.select([source_col]).append_column("zb", pa.array(zb))
        out = tb.group_by([source_col, "zb"]).aggregate([([], "count_all")])
        return out.rename_columns([source_col, "zb", "cnt"])

    hist = bucketed_sum(
        scored.map_batches(partial, batch_format="pyarrow"),
        [source_col, "zb"],
        ["cnt"],
    ).to_pandas()

    nbins = int(_ZBIN_SCALE) + 1  # zb ∈ [0, 4096] for quality ∈ [0, 1]
    srcs = sorted(hist[source_col].unique())
    sidx = {s: i for i, s in enumerate(srcs)}
    dense = np.zeros((len(srcs), nbins), np.int64)
    for s, b, c in zip(
        hist[source_col], hist["zb"].to_numpy(np.int64), hist["cnt"].to_numpy(np.int64)
    ):
        dense[sidx[s], b] = c
    cum = dense.cumsum(axis=1)  # inclusive within-source cum per bin
    gcnt = dense.sum(axis=0)
    gcum = gcnt.cumsum()  # strictly increasing over present bins
    n_glob = int(gcum[-1])
    present = np.flatnonzero(gcnt > 0)
    g_cum_present = gcum[present]
    # (source, bin) → norm_bin with python-bigint exact ceil targets
    norm = np.full((len(srcs), nbins), -1, np.int64)
    for i in range(len(srcs)):
        n_s = int(cum[i, -1])
        if n_s == 0:
            continue
        for b in np.flatnonzero(dense[i] > 0):
            r = int(cum[i, b])
            target = -(-r * n_glob // n_s)  # ceil(r·n_glob/n_s), bigint
            j = int(np.searchsorted(g_cum_present, min(target, n_glob)))
            norm[i, b] = int(present[j])
    side_ref = ray.put(
        {
            "sources": pa.array([str(s) for s in srcs], type=pa.large_string()),
            "norm": norm,
        }
    )

    def apply_norm(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        q = t.column("quality").to_numpy(zero_copy_only=False)
        zb = np.floor(q * _ZBIN_SCALE).astype(np.int64)
        pos = probe_positions(t.column(source_col), side["sources"], "source")
        nb = side["norm"][pos, zb]
        out = t.select(["doc_id", source_col, "quality"])
        return out.append_column("norm_bin", pa.array(nb)).append_column(
            "norm_q", pa.array(nb / _ZBIN_SCALE)
        )

    return scored.map_batches(apply_norm, batch_format="pyarrow")


def quantile_normalize_sql(scores_sql: str) -> str:
    """Oracle twin of :func:`quantile_normalize`: window cums, HUGEINT
    exact ceil target, ASOF JOIN on the negated strictly-increasing
    global cum (greatest −gcum ≤ −target ⇔ smallest gcum ≥ target)."""
    return f"""
        WITH qn_s AS MATERIALIZED (
            SELECT f.doc_id, d.source, f.quality,
                   CAST(floor(f.quality * {_ZBIN_SCALE!r}) AS BIGINT) AS zb
            FROM ({scores_sql}) f JOIN documents d ON f.doc_id = d.doc_id
        ),
        qn_h AS (
            SELECT source, zb, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM qn_s GROUP BY source, zb
        ),
        qn_sc AS (
            SELECT source, zb,
                   SUM(cnt) OVER (PARTITION BY source ORDER BY zb
                                  ROWS UNBOUNDED PRECEDING) AS r,
                   SUM(cnt) OVER (PARTITION BY source) AS n_s
            FROM qn_h
        ),
        qn_g AS (
            SELECT zb,
                   SUM(cnt) OVER (ORDER BY zb ROWS UNBOUNDED PRECEDING) AS gc
            FROM (SELECT zb, SUM(cnt) AS cnt FROM qn_h GROUP BY zb)
        ),
        qn_gn AS (SELECT zb, -CAST(gc AS HUGEINT) AS neg_gc FROM qn_g),
        qn_map AS (
            SELECT m.source, m.zb, g.zb AS norm_bin
            FROM (
                -- neg_target = −⌈r·G/n_s⌉ = floor((−r·G)/n_s)
                SELECT source, zb,
                       (-CAST(r AS HUGEINT) * (SELECT MAX(gc) FROM qn_g))
                           // CAST(n_s AS HUGEINT) AS neg_target
                FROM qn_sc
            ) m
            ASOF JOIN qn_gn g ON m.neg_target >= g.neg_gc
        )
        SELECT s.doc_id, s.source, s.quality,
               CAST(p.norm_bin AS BIGINT) AS norm_bin,
               p.norm_bin / {_ZBIN_SCALE!r} AS norm_q
        FROM qn_s s JOIN qn_map p ON p.source = s.source AND p.zb = s.zb"""
