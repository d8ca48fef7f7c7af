"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray-Data-first shapes (see /opt guides + SURVEY.md §2.7):
  * exact       — two-phase: per-batch partial (min keeper, count) per key →
                  small groupby over partials.  No raw-row shuffle.
  * minhash-LSH — shingle → minhash signature per batch → explode to
                  (band, band_hash, doc) rows → groupby(band, band_hash) →
                  candidate pairs → union-find over the collected pair set
                  (pairs ≪ corpus: only docs with an LSH collision appear).
  * simhash     — 64-bit sign-of-weighted-sum signature per batch; near-dup
                  candidates = equal signature bands (hamming ≤ r via
                  band-partitioning).
  * n-gram Jaccard — exact verification kernel for candidate pairs.

The reference's near-dedup analog is the order-dependent greedy
``distanceFilter`` (src/utils/sampling.py:12-49); its spatial variant lives
in stages/sampling.py.  These text variants are the training-data-pipeline
extensions the engine adds beyond the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min  # noqa: F401 (Min used by exact_dedup_keys)

from ..state.hashing import splitmix64

# ------------------------------------------------------------------ exact


def exact_dedup_keys(ds, key_col: str, id_col: str):
    """Per distinct key: keeper id (min) + duplicate count.

    Two-phase: Arrow group_by inside each batch emits one row per key per
    batch, then a small groupby combines partials.  The combine shuffle is
    keyed on the key's 128-bit whole-string fingerprint (two independent
    Horner bases, splitmix64-finalized) — the raw key string never enters
    a shuffle key (VERDICT r3 #1; collision odds ~n²/2¹²⁸, negligible at
    10¹² docs).  Output: (fp_hi, fp_lo, keep_id, n_dups) — exact
    integer semantics, order-insensitive.
    """

    def partial(t: pa.Table) -> pa.Table:
        out = t.select([key_col, id_col]).group_by([key_col]).aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        hi, lo = _fp128(out.column(key_col))
        return pa.table(
            {
                "fp_hi": pa.array(hi.astype(np.int64)),
                "fp_lo": pa.array(lo.astype(np.int64)),
                "keep_id": out.column(f"{id_col}_min"),
                "n_dups": out.column(f"{id_col}_count"),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["fp_hi", "fp_lo"])
        .aggregate(Min("keep_id", alias_name="keep_id"), Sum("n_dups", alias_name="n_dups"))
    )


def dedup_report(ds, text_col: str = "text", group_col: str = "source"):
    """Per-group duplication observability: n_docs, n_unique (distinct
    texts), dup_rate — the funnel health report a curation run logs per
    source/shard before deciding dedup strategy.

    Scale shape (the house fingerprint discipline): raw text never enters
    a shuffle.  Each batch emits its DISTINCT (fp_hi, fp_lo, group) rows —
    128-bit whole-string fingerprints — plus a tiny per-group doc-count
    partial; fp rows exchange bucketed on the fingerprint (same fp → same
    bucket, so the in-task distinct is global), fold to per-group unique
    counts, and both tiny per-group tables combine through ``bucketed_sum``.
    Equal to COUNT(DISTINCT text) per group up to fp128 collisions
    (~n²/2¹²⁸).  Max task rows: corpus-distinct/num_buckets fp rows."""
    from ..runtime import cluster_cpus
    from .zonal import bucketed_sum

    nb = max(8, cluster_cpus() * 2)

    def fp_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select([text_col, group_col])
            .group_by([text_col, group_col])
            .aggregate([([], "count_all")])
        )
        hi, lo = _fp128(g.column(text_col))
        bucket = (hi % np.uint64(nb)).astype(np.int64)
        return pa.table(
            {
                "fp_hi": pa.array(hi.astype(np.int64)),
                "fp_lo": pa.array(lo.astype(np.int64)),
                group_col: g.column(group_col),
                "bucket": pa.array(bucket),
            }
        )

    def uniq_in_bucket(g: pa.Table) -> pa.Table:
        d = g.group_by(["fp_hi", "fp_lo", group_col]).aggregate([([], "count_all")])
        u = d.group_by([group_col]).aggregate([([], "count_all")])
        return u.rename_columns([group_col, "n_unique"])

    uniq = bucketed_sum(
        ds.map_batches(fp_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq_in_bucket, batch_format="pyarrow"),
        [group_col],
        ["n_unique"],
        recombine_batch_size=None,
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col]).group_by([group_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "n_docs"])

    counts = bucketed_sum(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        [group_col],
        ["n_docs"],
        recombine_batch_size=None,
    )

    # both sides are group-cardinality tiny; broadcast the doc counts into
    # a stateless map over the unique counts (no shuffle join for a
    # |groups|-row table)
    import ray

    from ..runtime import bounded_collect

    cnt_pdf = bounded_collect(
        counts, 1 << 20, "per-group doc counts: one row per group"
    )
    cnt_ref = ray.put(
        {
            "keys": cnt_pdf[group_col].to_numpy(),
            "n": cnt_pdf["n_docs"].to_numpy(np.int64),
        }
    )

    def attach(t: pa.Table) -> pa.Table:
        side = ray.get(cnt_ref)
        order = np.argsort(side["keys"], kind="stable")
        keys, nd = side["keys"][order], side["n"][order]
        pos = np.searchsorted(keys, t.column(group_col).to_numpy(zero_copy_only=False))
        n_docs = nd[pos]
        n_uniq = t.column("n_unique").to_numpy(zero_copy_only=False).astype(np.int64)
        rate = 1.0 - n_uniq.astype(np.float64) / n_docs.astype(np.float64)
        return pa.table(
            {
                group_col: t.column(group_col),
                "n_docs": pa.array(n_docs),
                "n_unique": pa.array(n_uniq),
                "dup_rate": pa.array(rate),
            }
        )

    return uniq.map_batches(attach, batch_format="pyarrow")


def dedup_report_sql(docs_sql: str, group_col: str = "source") -> str:
    """Oracle: exact distinct-text counts per group (the engine's fp128
    distinct is equal absent 128-bit collisions); same double division."""
    return f"""
        SELECT {group_col},
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique,
               1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) AS dup_rate
        FROM ({docs_sql}) GROUP BY {group_col}"""


def drop_exact_dupes(ds, key_col: str, id_col: str):
    """Keep exactly one row (min id) per key — without the key (raw corpus
    text) ever entering a shuffle.

    Scale shape (VERDICT r3 #1): (1) per-batch 128-bit whole-string
    fingerprint of the key → only skinny (fp_hi, fp_lo, id) rows shuffle;
    (2) min-id keeper per fingerprint; (3) integer-keyed hash semi-join
    (inner on the unique keeper ids) brings the surviving full rows back.
    Equal to min-id-per-key up to 128-bit fingerprint collisions
    (~n²/2¹²⁸ — ignorable at 10¹² docs).  The keeper side is materialized
    (one id per distinct key — the skinny side) so join partitions are
    sized from its true count (Ray 2.49's hash join fails on schema-less
    empty partitions).
    """
    from ray.data.aggregate import Min as _Min

    from ..runtime import join_partitions

    def fp_rows(t: pa.Table) -> pa.Table:
        hi, lo = _fp128(t.column(key_col))
        return pa.table(
            {
                "fp_hi": pa.array(hi.astype(np.int64)),
                "fp_lo": pa.array(lo.astype(np.int64)),
                id_col: t.column(id_col),
            }
        )

    keepers = (
        ds.map_batches(fp_rows, batch_format="pyarrow")
        .groupby(["fp_hi", "fp_lo"])
        .aggregate(_Min(id_col, alias_name=id_col))
        .select_columns([id_col])
        .materialize()
    )
    nparts = join_partitions(rows_hint=keepers.count())
    return ds.join(keepers, join_type="inner", num_partitions=nparts, on=(id_col,))


# --------------------------------------------- paragraph-level exact dedup

PARA_MIN_DEDUP_LEN = 16  # paragraphs shorter than this never dedupe (C4 keeps
# boilerplate-short lines: deduping "" / "---" would mangle document structure)


def _explode_paragraphs(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """One row per '\\n'-separated paragraph: (id, idx, para, n_para) with
    idx = 0-based position and n_para = the doc's paragraph count (carried
    so the rebuild can report how many were dropped).  Pure Arrow/numpy —
    one split kernel, offset arithmetic, no per-doc Python."""
    import pyarrow.compute as pc

    text = t.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    paras = pc.split_pattern(text, "\n")
    if isinstance(paras, pa.ChunkedArray):
        paras = paras.combine_chunks()
    offs = paras.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]  # sliced arrays carry a non-zero first offset
    counts = offs[1:] - offs[:-1]
    di = np.repeat(np.arange(len(t), dtype=np.int64), counts)
    idx = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], counts)
    ids = t.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: ids.take(pa.array(di)),
            "idx": pa.array(idx),
            "para": paras.flatten(),
            "n_para": pa.array(np.repeat(counts, counts)),
        }
    )


def _rebuild_contiguous(s: pa.Table, id_col: str) -> pa.Table:
    """Reassemble (id, idx, para, n_para) rows — already grouped by id and
    idx-ascending — into one (id, text_clean, n_kept, n_dropped) row per
    doc via Arrow ``binary_join`` over a list view (no per-doc Python)."""
    import pyarrow.compute as pc

    ids = s.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    idv = ids.to_numpy(zero_copy_only=False)
    n = len(s)
    first = np.ones(n, dtype=bool)
    if n:
        first[1:] = idv[1:] != idv[:-1]
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, n)).astype(np.int64)
    offsets = pa.array(np.append(0, np.cumsum(counts)).astype(np.int64))
    # large types BEFORE combining: a task's total text can pass 2 GiB at
    # corpus scale, and combine_chunks on 32-bit-offset string chunks
    # would overflow — cast chunk-wise first
    para = s.column("para").cast(pa.large_string())
    if isinstance(para, pa.ChunkedArray):
        para = para.combine_chunks()
    joined_txt = pc.binary_join(
        pa.LargeListArray.from_arrays(offsets, para),
        pa.scalar("\n", type=pa.large_string()),
    )
    n_para = s.column("n_para").to_numpy(zero_copy_only=False)[starts]
    return pa.table(
        {
            id_col: ids.take(pa.array(starts)),
            "text_clean": joined_txt,
            "n_kept": pa.array(counts),
            "n_dropped": pa.array((n_para - counts).astype(np.int64)),
        }
    )


PARA_KEEPER_BROADCAST_LIMIT = 5_000_000  # distinct long paragraphs


def drop_dup_paragraphs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = PARA_MIN_DEDUP_LEN,
    rows_hint: int | None = None,
    keeper_broadcast_limit: int = PARA_KEEPER_BROADCAST_LIMIT,
):
    """C4/RefinedWeb-style corpus-wide line dedup: every '\\n'-separated
    paragraph of length ≥ ``min_len`` survives only at its FIRST corpus
    occurrence (min (doc_id, idx) lexicographic); shorter paragraphs always
    survive.  Docs are reassembled from surviving paragraphs in original
    order; a doc whose every paragraph was dropped disappears.

    Scale shape (the ``drop_exact_dupes`` fingerprint discipline — raw
    paragraph text never enters a shuffle key):
      1. one streaming pass explodes to per-batch (fp128, id, idx) SKINNY
         rows for ≥min_len paragraphs (text never leaves the batch);
      2. first-occurrence keeper per fingerprint via per-batch Arrow-sorted
         partials + a hash-bucketed combine (exact tuple-min under any
         blocking: each phase keeps the lexicographic minimum);
      3. keeper table ≤ ``keeper_broadcast_limit`` (one row per distinct
         long paragraph): broadcast once via ``ray.put`` and run ONE
         stateless second pass over the original docs — explode, probe the
         sorted keeper arrays (two-level searchsorted), drop, reassemble —
         all inside the batch.  The corpus text never enters a shuffle or
         join at all (a document is one input row, so its paragraphs never
         cross a batch boundary; nothing relies on downstream block
         composition).  Measured at the 6.7 M-span bench corpus: 41 s for
         the join path → ~16 s for this pass structure;
      4. above the limit: fall back to the hash-join path — keepers join
         back on the integer fingerprint (left outer), per-doc reassembly
         in hash-bucketed groups.

    Returns Dataset[id, text_clean, n_kept, n_dropped].  Reference analog:
    exact distinct (SURVEY §2.7) applied at sub-document granularity."""
    import pyarrow.compute as pc

    import ray

    from ..runtime import join_partitions
    from ..state.hashing import id_u64, splitmix64 as _smx
    from .zonal import _default_buckets

    nb = _default_buckets(rows_hint)

    sort_keys = [
        ("fp_hi", "ascending"),
        ("fp_lo", "ascending"),
        (id_col, "ascending"),
        ("idx", "ascending"),
    ]

    def first_per_fp(t: pa.Table) -> pa.Table:
        """One row per fingerprint: the (id, idx)-lexicographic minimum."""
        s = t.take(pc.sort_indices(t, sort_keys=sort_keys))
        hi = s.column("fp_hi").to_numpy(zero_copy_only=False)
        lo = s.column("fp_lo").to_numpy(zero_copy_only=False)
        first = np.ones(len(s), dtype=bool)
        first[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        return s.filter(pa.array(first))

    def keeper_partial(t: pa.Table) -> pa.Table:
        ex = _explode_paragraphs(t, text_col, id_col)
        hi, lo = _fp128(ex.column("para"))
        is_long = pc.greater_equal(
            pc.utf8_length(ex.column("para")), min_len
        ).to_numpy(zero_copy_only=False)
        skinny = pa.table(
            {
                "fp_hi": pa.array(hi.astype(np.int64)[is_long]),
                "fp_lo": pa.array(lo.astype(np.int64)[is_long]),
                id_col: ex.column(id_col).filter(pa.array(is_long)),
                "idx": ex.column("idx").filter(pa.array(is_long)),
            }
        )
        out = first_per_fp(skinny)
        bucket = (
            _smx(
                out.column("fp_hi").to_numpy(zero_copy_only=False).view(np.uint64)
                ^ out.column("fp_lo").to_numpy(zero_copy_only=False).view(np.uint64)
            )
            % np.uint64(nb)
        ).astype(np.int64)
        return out.append_column("bucket", pa.array(bucket))

    def keeper_combine(g: pa.Table) -> pa.Table:
        return first_per_fp(g.drop_columns(["bucket"])).rename_columns(
            ["fp_hi", "fp_lo", "keep_id", "keep_idx"]
        )

    keepers = (
        ds.map_batches(keeper_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keeper_combine, batch_format="pyarrow")
        .materialize()  # skinny: one row per distinct long paragraph
    )
    n_keep = keepers.count()

    if n_keep <= keeper_broadcast_limit:
        if n_keep == 0:
            # empty corpus: no long paragraphs → every row passes through
            # the strip untouched (dedup_batch guards on len(side["hi"]))
            kt = pd.DataFrame(
                {
                    "fp_hi": np.empty(0, np.int64),
                    "fp_lo": np.empty(0, np.int64),
                    "keep_id": pd.Series([], dtype=object),
                    "keep_idx": np.empty(0, np.int64),
                }
            )
        else:
            kt = keepers.to_pandas()
        khi = kt["fp_hi"].to_numpy(np.int64)
        klo = kt["fp_lo"].to_numpy(np.int64)
        order = np.lexsort((klo, khi))
        side_ref = ray.put(
            {
                "hi": khi[order],
                "lo": klo[order],
                "kid": pa.Table.from_pandas(
                    kt.iloc[order][["keep_id"]], preserve_index=False
                ).column("keep_id"),
                "kidx": kt["keep_idx"].to_numpy(np.int64)[order],
            }
        )

        def dedup_batch(t: pa.Table) -> pa.Table:
            side = ray.get(side_ref)
            ex = _explode_paragraphs(t, text_col, id_col)
            hi, lo = _fp128(ex.column("para"))
            hi = hi.astype(np.int64)
            lo = lo.astype(np.int64)
            is_long = pc.greater_equal(
                pc.utf8_length(ex.column("para")), min_len
            ).to_numpy(zero_copy_only=False)
            kept = np.ones(len(ex), dtype=bool)
            li = np.flatnonzero(is_long)
            if li.size:
                if len(side["hi"]) == 0:
                    raise ValueError(
                        "drop_dup_paragraphs: empty keeper table but long "
                        "paragraphs present (non-deterministic input?)"
                    )
                h, l = hi[li], lo[li]
                # two-level probe of the (hi, lo)-lexsorted keeper arrays:
                # locate the hi-run, then the exact lo inside it (runs are
                # ~always length 1 — 64-bit hi collisions are ~n²/2⁶⁵)
                start = np.searchsorted(side["hi"], h, side="left")
                end = np.searchsorted(side["hi"], h, side="right")
                pos = np.minimum(start, len(side["hi"]) - 1)
                multi = np.flatnonzero(end - start > 1)
                for j in multi:  # astronomically rare hi-collision runs
                    pos[j] = min(
                        start[j]
                        + np.searchsorted(side["lo"][start[j] : end[j]], l[j]),
                        end[j] - 1,
                    )
                # every long paragraph's fp must resolve to ITS OWN keeper
                # row — a miss on either half (broken keeper invariant,
                # e.g. a non-deterministic input between the two passes)
                # must fail loudly, not silently mis-drop
                if ((end == start)
                        | (side["hi"][pos] != h)
                        | (side["lo"][pos] != l)).any():
                    raise ValueError(
                        "drop_dup_paragraphs: paragraph fingerprint missing "
                        "from keeper table (non-deterministic input?)"
                    )
                own_idx = (
                    ex.column("idx").to_numpy(zero_copy_only=False)[li]
                    == side["kidx"][pos]
                )
                own = own_idx.copy()
                cand = np.flatnonzero(own_idx)
                if cand.size:
                    # id compare only where idx already matches (≈ one row
                    # per distinct paragraph) — vectorized Arrow equality
                    ids_sub = ex.column(id_col).take(pa.array(li[cand]))
                    kid_sub = (
                        side["kid"].take(pa.array(pos[cand])).combine_chunks()
                    )
                    own[cand] = pc.equal(ids_sub, kid_sub).to_numpy(
                        zero_copy_only=False
                    )
                kept[li] = own
            s = ex.filter(pa.array(kept))
            return _rebuild_contiguous(s, id_col)

        return ds.map_batches(dedup_batch, batch_format="pyarrow")

    # ---- large-keeper fallback: hash-join the keepers back on the fp ----
    def explode_fp(t: pa.Table) -> pa.Table:
        out = _explode_paragraphs(t, text_col, id_col)
        hi, lo = _fp128(out.column("para"))
        return out.append_column(
            "fp_hi", pa.array(hi.astype(np.int64))
        ).append_column("fp_lo", pa.array(lo.astype(np.int64)))

    paras = ds.map_batches(explode_fp, batch_format="pyarrow")
    joined = paras.join(
        keepers,
        join_type="left_outer",
        num_partitions=join_partitions(),
        on=("fp_hi", "fp_lo"),
    )

    def keep_mask(t: pa.Table) -> pa.Table:
        no_keeper = pc.is_null(t.column("keep_id"))
        own = pc.and_(
            pc.equal(t.column("keep_id"), t.column(id_col)),
            pc.equal(t.column("keep_idx"), t.column("idx")),
        )
        kept = pc.or_kleene(no_keeper, own)
        return t.filter(pc.fill_null(kept, False)).select(
            [id_col, "idx", "para", "n_para"]
        )

    kept = joined.map_batches(keep_mask, batch_format="pyarrow")

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        key = _smx(id_u64(col))
        return t.append_column(
            "bucket", pa.array((key % np.uint64(nb)).astype(np.int64))
        )

    def rebuild(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[(id_col, "ascending"), ("idx", "ascending")]
            )
        )
        return _rebuild_contiguous(s, id_col)

    return (
        kept.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rebuild, batch_format="pyarrow")
        .select_columns([id_col, "text_clean", "n_kept", "n_dropped"])
    )


def drop_dup_paragraphs_sql(
    docs_sql: str,
    min_len: int = PARA_MIN_DEDUP_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for ``drop_dup_paragraphs``: identical split / first-
    occurrence / reassembly rule, joining on the raw paragraph string where
    the engine joins on its 128-bit fingerprint (equal results absent
    fingerprint collisions, ~n²/2¹²⁸)."""
    return f"""
        WITH paras AS (
            SELECT {id_col},
                   CAST(generate_subscripts(ps, 1) - 1 AS BIGINT) AS idx,
                   unnest(ps) AS p,
                   CAST(len(ps) AS BIGINT) AS n_para
            FROM (SELECT {id_col}, string_split({text_col}, chr(10)) AS ps
                  FROM ({docs_sql}))
        ),
        keep AS (
            SELECT p, {id_col} AS kdoc, idx AS kidx FROM (
                SELECT p, {id_col}, idx,
                       ROW_NUMBER() OVER (PARTITION BY p
                                          ORDER BY {id_col}, idx) AS rn
                FROM paras WHERE length(p) >= {min_len}
            ) WHERE rn = 1
        ),
        kept AS (
            SELECT pr.{id_col}, pr.idx, pr.p, pr.n_para
            FROM paras pr LEFT JOIN keep k ON pr.p = k.p
            WHERE k.p IS NULL
               OR (pr.{id_col} = k.kdoc AND pr.idx = k.kidx)
        )
        SELECT {id_col},
               string_agg(p, chr(10) ORDER BY idx) AS text_clean,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(any_value(n_para) - COUNT(*) AS BIGINT) AS n_dropped
        FROM kept GROUP BY {id_col}"""


def near_dedup_filter(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.4,
    max_broadcast_ids: int = 5_000_000,
):
    """End-to-end fuzzy-dedup funnel: drop every document that has a
    VERIFIED near-duplicate with a smaller id; keep the rest.

    Composition of the staged primitives: MinHash-LSH candidates →
    distributed exact-Jaccard verification → the drop set is the distinct
    larger id of each surviving pair (pairs are emitted a < b).  This is
    the "no smaller near-dup" rule — deterministic and locally decidable
    per pair, NOT transitive-closure clustering (``min_label_clusters``
    covers that; under chains a<b<c it drops both b and c, which is the
    conservative side).  The drop set is pair-bounded (≪ corpus): below
    ``max_broadcast_ids`` it broadcasts into a stateless isin filter,
    above it falls back to a hash left-outer join + null filter so nothing
    driver-side grows with the corpus."""
    cand = minhash_candidate_pairs(ds, text_col, id_col).materialize()
    verified = _verify_pairs_distributed(
        ds, cand, text_col, id_col, k=k, threshold=threshold, n_pairs=cand.count()
    )
    # distinct drop ids via the bucketed exchange (joins.distinct), not
    # Ray's native sort-based groupby-count
    from .joins import distinct

    drops = distinct(verified.select_columns(["b"]), ["b"])
    return _filter_out_ids(ds, id_col, drops, "b", max_broadcast_ids)


def near_dedup_keep_best(
    ds,
    quality_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_col: str = "quality",
    k: int = 5,
    threshold: float = 0.4,
    max_broadcast_ids: int = 5_000_000,
):
    """Fuzzy dedup keeping the BEST member of each verified near-dup pair —
    the 'keep highest quality, not smallest id' curation policy.

    Same funnel as ``near_dedup_filter`` (MinHash-LSH candidates →
    distributed exact-Jaccard verify); per verified pair the DROP is the
    lower-``quality_col`` member (ties → the larger id, so with constant
    quality the survivor set equals the min-id rule).  Quality attaches to
    the pair-bounded verified set by the same two skinny hash joins the
    text verification uses — the corpus-sized ``quality_ds`` is never
    broadcast.  Pairwise-local like ``near_dedup_filter`` (NOT transitive
    closure): in a chain a~b~c with b best, both a and c drop."""
    from ..runtime import join_partitions

    cand = minhash_candidate_pairs(ds, text_col, id_col).materialize()
    verified = _verify_pairs_distributed(
        ds, cand, text_col, id_col, k=k, threshold=threshold, n_pairs=cand.count()
    )
    q = quality_ds.select_columns([id_col, quality_col])
    n_pairs = verified.count()
    if n_pairs == 0:
        return ds
    np_parts = 1 if n_pairs < 10_000 else join_partitions(rows_hint=n_pairs)
    with_a = verified.join(
        q, join_type="inner", num_partitions=np_parts,
        on=("a",), right_on=(id_col,), right_suffix="_qa",
    ).materialize()  # sequential joins — see _verify_pairs_distributed
    with_ab = with_a.join(
        q, join_type="inner", num_partitions=np_parts,
        on=("b",), right_on=(id_col,), left_suffix="_l", right_suffix="_qb",
    )
    qa, qb = f"{quality_col}_l", f"{quality_col}_qb"

    def loser(t: pa.Table) -> pa.Table:
        va = t.column(qa).to_numpy(zero_copy_only=False)
        vb = t.column(qb).to_numpy(zero_copy_only=False)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"drop_id": pa.array(np.where(vb > va, a, b))})

    drops = (
        with_ab.map_batches(loser, batch_format="pyarrow")
        .groupby("drop_id")
        .count()
        .select_columns(["drop_id"])
    )
    return _filter_out_ids(ds, id_col, drops, "drop_id", max_broadcast_ids)


def _filter_out_ids(ds, id_col, drops, drop_col, max_broadcast_ids):
    """Shared drop-set filter tail: broadcast isin below the guard, hash
    left-outer join + null filter above it (nothing driver-side grows with
    the corpus)."""
    import pyarrow.compute as pc

    from ..runtime import join_partitions
    from ..stages.joins import anti_join_ids

    drops = drops.materialize()
    n_drop = drops.count()
    if n_drop <= max_broadcast_ids:
        return anti_join_ids(ds, id_col, drops.to_pandas()[drop_col].to_numpy())

    def flag(t: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: t.column(drop_col), "_drop": pa.array(np.ones(len(t), np.int64))}
        )

    drop_keyed = drops.map_batches(flag, batch_format="pyarrow")
    # partitions sized for the corpus-sided left input (see
    # drop_dup_paragraphs), not the small drop set
    joined = ds.join(
        drop_keyed,
        join_type="left_outer",
        num_partitions=join_partitions(),
        on=(id_col,),
    )

    def keep_unflagged(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("_drop"))).drop_columns(["_drop"])

    return joined.map_batches(keep_unflagged, batch_format="pyarrow")


# ------------------------------------------------------- shingles / minhash

_MERSENNE = np.uint64((1 << 61) - 1)


def _char_shingle_hashes(s: bytes, k: int) -> np.ndarray:
    """All k-byte shingle hashes of one document (vectorized rolling
    polynomial, FNV-prime base, splitmix64-finalized).  Sub-k documents get
    ONE shingle hashing the whole byte string with the same polynomial (so
    two short docs collide iff their full text is identical — not merely
    their first byte)."""
    b = np.frombuffer(s, dtype=np.uint8)
    if b.shape[0] == 0:
        return np.empty(0, np.uint64)
    win = min(k, b.shape[0])
    with np.errstate(over="ignore"):
        h = np.zeros(b.shape[0] - win + 1, dtype=np.uint64)
        base = np.uint64(1099511628211)
        for j in range(win):
            h = h * base + b[j : b.shape[0] - win + 1 + j].astype(np.uint64)
    return splitmix64(h)


_SH_BASE = np.uint64(1099511628211)
_SH_IBASE = np.uint64(pow(1099511628211, -1, 1 << 64))  # base is odd → invertible
_FP2_BASE = np.uint64(1000000007)  # second independent odd base → 128-bit fp
_FP2_IBASE = np.uint64(pow(1000000007, -1, 1 << 64))


def _whole_doc_horner(col, base: np.uint64, ibase: np.uint64) -> np.ndarray:
    """One 64-bit whole-string Horner hash per document, splitmix64-
    finalized — the win=len special case of ``_batch_shingle_hashes``,
    parameterized by base so two calls yield an effectively 128-bit
    fingerprint.  One O(total bytes) segmented numpy pass per batch; no
    per-document Python."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array([str(t) for t in col], type=pa.large_string())
    if col.null_count:
        col = pc.fill_null(col, "None")
    arr = col.cast(pa.large_binary())
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    tot = data.shape[0]
    with np.errstate(over="ignore"):
        ones = np.ones(1, np.uint64)
        pw = np.multiply.accumulate(
            np.concatenate([ones, np.full(max(tot - 1, 0), base)])
        )
        ipw = np.multiply.accumulate(
            np.concatenate([ones, np.full(max(tot - 1, 0), ibase)])
        )
        t = np.concatenate(
            [np.zeros(1, np.uint64), np.cumsum(data.astype(np.uint64) * ipw)]
        )
        h = np.where(
            ends > starts,
            pw[np.maximum(ends - 1, 0)] * (t[ends] - t[starts]),
            np.uint64(0),
        )
    return splitmix64(h)


def _fp128(col) -> tuple[np.ndarray, np.ndarray]:
    """128-bit per-document fingerprint: two independent Horner hashes."""
    return (
        _whole_doc_horner(col, _SH_BASE, _SH_IBASE),
        _whole_doc_horner(col, _FP2_BASE, _FP2_IBASE),
    )


def _batch_shingle_hashes(col, k: int) -> tuple[np.ndarray, np.ndarray]:
    """``_char_shingle_hashes`` for a WHOLE batch, no per-doc Python loop.

    Returns (flat shingle hashes, segment offsets: doc i's shingles are
    flat[seg[i]:seg[i+1]]).  Bit-identical to the scalar path (verified by
    test_dedup): the Horner window hash  Σ_j b[p+j]·base^{w−1−j}  is
    rewritten as  base^{p+w−1} · Σ_j b[p+j]·base^{−(p+j)}  over the
    CONCATENATED utf-8 buffer, so one wrap-mod-2⁶⁴ cumsum/cumprod over the
    buffer serves every document; per-doc windows (win = min(k, len), one
    whole-string shingle for sub-k docs) only index into it.
    """
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array([str(t) for t in col], type=pa.large_string())
    if col.null_count:
        col = pc.fill_null(col, "None")  # str(None) compat with the scalar path
    arr = col.cast(pa.large_binary())
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    starts, lens = offs[:-1], np.diff(offs)
    win = np.minimum(lens, k)
    n_sh = np.where(lens > 0, lens - win + 1, 0).astype(np.int64)
    seg = np.concatenate([[0], np.cumsum(n_sh)])
    total_sh = int(seg[-1])
    if total_sh == 0:
        return np.empty(0, np.uint64), seg
    p = np.repeat(starts, n_sh) + (np.arange(total_sh) - np.repeat(seg[:-1], n_sh))
    w = np.repeat(win, n_sh)
    tot = data.shape[0]
    with np.errstate(over="ignore"):
        ones = np.ones(1, np.uint64)
        pw = np.multiply.accumulate(
            np.concatenate([ones, np.full(max(tot - 1, 0), _SH_BASE)])
        )
        ipw = np.multiply.accumulate(
            np.concatenate([ones, np.full(max(tot - 1, 0), _SH_IBASE)])
        )
        t = np.concatenate(
            [np.zeros(1, np.uint64), np.cumsum(data.astype(np.uint64) * ipw)]
        )
        h = pw[p + w - 1] * (t[p + w] - t[p])
    return splitmix64(h), seg


def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    a = splitmix64(np.arange(seed, seed + num_perm, dtype=np.uint64)) | np.uint64(1)
    b = splitmix64(np.arange(seed + num_perm, seed + 2 * num_perm, dtype=np.uint64))
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of (a·x + b) over the shingle set."""
    if shingles.shape[0] == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = a[None, :] * shingles[:, None] + b[None, :]
    return m.min(axis=0)


class MinHasher:
    """Actor-pool callable: (id, text) batch → minhash band rows.

    Emits ``bands`` rows per document: (doc_key, band_id, band_hash) where
    band_hash folds rows_per_band signature slots.  Grouping on
    (band_id, band_hash) yields LSH candidate buckets.
    """

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64, bands: int = 16, shingle_k: int = 5):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) minhash signatures — whole-batch vectorized
        (_batch_shingle_hashes + chunked minimum.reduceat over the flat
        shingle array); empty docs get the max-filled signature, exactly
        like the scalar minhash_signature([]) path."""
        flat, seg = _batch_shingle_hashes(texts, self.k)
        n = seg.shape[0] - 1
        sigs = np.full((n, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        nz = np.nonzero(np.diff(seg) > 0)[0]
        if nz.size == 0:
            return sigs
        red_starts = seg[nz]  # empty segments contribute no elements between
        chunk = 16  # bound the (n_shingles × chunk) temp to ~flat×16×8 B
        with np.errstate(over="ignore"):
            for c in range(0, self.num_perm, chunk):
                a, b = self.a[c : c + chunk], self.b[c : c + chunk]
                vals = a[None, :] * flat[:, None] + b[None, :]
                sigs[nz, c : c + chunk] = np.minimum.reduceat(vals, red_starts, axis=0)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        ids = batch.column(self.id_col).to_pylist()
        sigs = self.signatures(texts)
        folded = sigs.reshape(len(ids), self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            band_hash = folded[:, :, 0].copy()
            for r in range(1, self.rows_per_band):
                band_hash = splitmix64(band_hash ^ folded[:, :, r])
        n = len(texts)
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(np.asarray(ids, dtype=object), self.bands)),
                "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64)),
            }
        )


def minhash_candidate_pairs(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    concurrency=None,
    max_bucket: int = 1024,
):
    """documents → candidate near-duplicate pairs (a < b) via LSH buckets.

    ``max_bucket`` caps degenerate hot buckets (e.g. millions of near-empty
    docs sharing a band hash): a bucket of B > max_bucket members emits pairs
    only among its ``max_bucket`` smallest ids and LOGS the truncation —
    O(B²) pair emission on an uncapped hot bucket is the classic LSH
    quadratic blowup.  Pair emission is vectorized (triu_indices)."""
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].unique())
        if ids.shape[0] < 2:
            return pd.DataFrame({"a": ids[:0], "b": ids[:0]})
        if ids.shape[0] > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "LSH bucket (band=%s, hash=%s) has %d members; capped to %d "
                "(%d candidate pairs dropped)",
                g["band_id"].iloc[0], g["band_hash"].iloc[0],
                ids.shape[0], max_bucket,
                ids.shape[0] * (ids.shape[0] - 1) // 2
                - max_bucket * (max_bucket - 1) // 2,
            )
            ids = ids[:max_bucket]
        ii, jj = np.triu_indices(ids.shape[0], k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    # bucketed combine (not per-(band,hash) map_groups): Ray's sort-based
    # groupby pays seconds of fixed cost per all-to-all at any size, so the
    # shuffle key is ONE int64 hash bucket; inside the task non-colliding
    # rows drop vectorized and only colliding (band, hash) groups loop
    from ..runtime import cluster_cpus
    from ..state.hashing import hash_key

    nb = max(8, cluster_cpus() * 2)

    def add_bucket(t: pa.Table) -> pa.Table:
        bid = t.column("band_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (hash_key(bh ^ (bid << np.uint64(48))) % np.uint64(nb)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        colliding = g[g.duplicated(["band_id", "band_hash"], keep=False)]
        empty = pd.DataFrame(
            {"a": g[id_col].iloc[:0], "b": g[id_col].iloc[:0]}
        )
        if colliding.empty:
            return empty
        frames = [
            pairs(grp) for _, grp in colliding.groupby(
                ["band_id", "band_hash"], sort=False
            )
        ]
        frames = [f for f in frames if len(f)]
        return pd.concat(frames, ignore_index=True) if frames else empty

    cand = (
        band_rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .select_columns(["a", "b"])
    )
    # a pair can surface from several bands → distinct
    return exact_pairs_distinct(cand)


def exact_pairs_distinct(pairs_ds):
    """Distinct (a, b) pairs via the bucketed pattern: per-batch dedupe,
    one int64-bucket shuffle, exact in-task dedupe (id dtype agnostic —
    integer ids pass through, strings fnv-hash)."""
    from ..runtime import cluster_cpus
    from ..state.hashing import hash_key, id_u64

    nb = max(8, cluster_cpus() * 2)

    def partial(t: pa.Table) -> pa.Table:
        out = t.group_by(["a", "b"]).aggregate([]).select(["a", "b"])
        b = (
            hash_key(id_u64(out.column("a").combine_chunks() if isinstance(out.column("a"), pa.ChunkedArray) else out.column("a"))
                     ^ id_u64(out.column("b").combine_chunks() if isinstance(out.column("b"), pa.ChunkedArray) else out.column("b")))
            % np.uint64(nb)
        ).astype(np.int64)
        return out.append_column("bucket", pa.array(b))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    return (
        pairs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .select_columns(["a", "b"])
    )


def verified_near_dup_clusters(
    ds,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    driver_pair_limit: int = 200_000,
):
    """End-to-end near-dedup: LSH candidates → exact n-gram Jaccard
    verification → min-label clusters.  Returns (clusters_df, pairs_df)
    where clusters_df maps node → cluster (min member id) for every doc in
    a verified cluster, and pairs_df carries the verified pairs + jaccard.

    Verification is sized by an explicit guard: at ≤ ``driver_pair_limit``
    candidate pairs the texts are fetched by a distributed is_in filter and
    verified on the driver (candidates ≪ corpus for benign corpora); above
    it — the boilerplate-heavy-crawl regime — the pair list is hash-joined
    against the corpus twice (a-side, b-side) and verified inside
    map_batches, so nothing driver-side grows with the pair count.
    """
    import ray.data as rd

    cand_ds = minhash_candidate_pairs(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )
    n_pairs = cand_ds.count()
    if n_pairs == 0:
        return (
            pd.DataFrame({"node": [], "cluster": []}),
            pd.DataFrame({"a": [], "b": [], "jaccard": []}),
        )
    if n_pairs <= driver_pair_limit:
        cand = cand_ds.to_pandas()
        needed = sorted(set(cand["a"]) | set(cand["b"]))
        from ..runtime import bounded_collect

        texts = bounded_collect(
            ds.map_batches(
                lambda t: t.select([id_col, text_col]).filter(
                    pa.compute.is_in(t.column(id_col), pa.array(needed))
                ),
                batch_format="pyarrow",
            ),
            2 * driver_pair_limit,
            "near-dup candidate texts: ≤ 2·driver_pair_limit docs",
        ).set_index(id_col)[text_col]
        jac = ngram_jaccard(
            [texts[a] for a in cand["a"]], [texts[b] for b in cand["b"]], k=shingle_k
        )
        verified = cand.assign(jaccard=jac)[jac >= jaccard_threshold].reset_index(
            drop=True
        )
        verified_ds = rd.from_pandas(verified[["a", "b"]]) if len(verified) else None
    else:
        from ..runtime import bounded_collect

        verified_pairs = _verify_pairs_distributed(
            ds, cand_ds, text_col, id_col, shingle_k, jaccard_threshold, n_pairs
        )
        # the function's CONTRACT returns driver DataFrames; the verified
        # set is ≪ candidates for real corpora — enforce rather than assume
        verified = bounded_collect(
            verified_pairs,
            max(16 * driver_pair_limit, 1 << 22),
            "verified near-dup pairs (driver-DataFrame contract)",
        ).reset_index(drop=True)
        verified_ds = verified_pairs.select_columns(["a", "b"]) if len(verified) else None
    clusters = (
        min_label_clusters(verified_ds).to_pandas()
        if verified_ds is not None
        else pd.DataFrame({"node": [], "cluster": []})
    )
    return clusters, verified


def _verify_pairs_distributed(ds, cand_ds, text_col, id_col, k, threshold, n_pairs):
    """Hash-join candidate pairs to their texts and verify in map_batches —
    the crawl-scale path (no driver-side pair/text collection)."""
    from ..runtime import join_partitions

    docs = ds.select_columns([id_col, text_col])
    # size partitions so none is empty: Ray 2.49's hash-join aggregator
    # fails on schema-less empty partitions (ArrowInvalid FieldRef); at the
    # pair counts that route here, ≥10k rows/partition keeps them full
    np_parts = 1 if n_pairs < 10_000 else join_partitions(rows_hint=n_pairs)
    with_a = cand_ds.join(
        docs, join_type="inner", num_partitions=np_parts,
        on=("a",), right_on=(id_col,), right_suffix="_ta",
    ).materialize()
    # materialize between the two joins: two CONCURRENT join operators in
    # one plan contend for aggregator actors (hangs/binder errors on small
    # sessions); the intermediate is pairs×text-sized, bounded
    with_ab = with_a.join(
        docs, join_type="inner", num_partitions=np_parts,
        on=("b",), right_on=(id_col,), left_suffix="_l", right_suffix="_tb",
    )
    ta, tb = f"{text_col}_l", f"{text_col}_tb"

    def verify(t: pa.Table) -> pa.Table:
        a_text = t.column(ta).to_pylist()
        b_text = t.column(tb).to_pylist()
        jac = ngram_jaccard(a_text, b_text, k=k)
        out = pa.table(
            {"a": t.column("a"), "b": t.column("b"), "jaccard": pa.array(jac)}
        )
        return out.filter(pa.array(jac >= threshold))

    return with_ab.map_batches(verify, batch_format="pyarrow").materialize()


def ngram_jaccard(texts_a: list[str], texts_b: list[str], k: int = 5) -> np.ndarray:
    """Exact k-shingle Jaccard for candidate pairs (verification kernel)."""
    out = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        sa = set(np.unique(_char_shingle_hashes(ta.encode("utf-8"), k)).tolist())
        sb = set(np.unique(_char_shingle_hashes(tb.encode("utf-8"), k)).tolist())
        u = len(sa | sb)
        out[i] = (len(sa & sb) / u) if u else 1.0
    return out


# ----------------------------------------------------------------- simhash


class SimHasher:
    """64-bit SimHash per document over token hashes (actor pool).

    Fully vectorized (the text.TextScorer pattern): ONE regex split per
    batch, FNV-1a over the flattened token array (state.hashing.fnv1a_arr —
    bit-identical to the scalar _fnv1a the SQL oracle mirrors; never
    builtin hash(): PYTHONHASHSEED), splitmix64 finalize, per-bit ±1 votes
    summed per document by cumsum differencing — no per-token Python."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..state.hashing import fnv1a_arr

        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends = offs[:-1] - offs[0], offs[1:] - offs[0]
        flat = toks.flatten()
        hs = splitmix64(fnv1a_arr(flat))
        # split emits empty edge fragments (leading/trailing whitespace) that
        # Python's .split() never yields — weight them 0 in the votes
        w = (
            pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        ).astype(np.int8)
        bits = (
            (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int8)
        votes = (2 * bits - 1) * w[:, None]
        cs = np.vstack(
            [np.zeros(64, np.int64), np.cumsum(votes, axis=0, dtype=np.int64)]
        )
        acc = cs[ends] - cs[starts]  # (n_docs, 64) per-doc bit votes
        sigs = (
            ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :])
            .sum(axis=1, dtype=np.uint64)
            .astype(np.int64)
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "simhash": pa.array(sigs),
            }
        )


def simhash_signatures(ds, text_col: str, id_col: str, concurrency=None):
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


# --------------------------------------------------------------- clustering


def _forest_batch(t: pa.Table) -> pa.Table:
    """Replace a batch of edges by its spanning forest (root → node rows).

    Connectivity-preserving compression: a dense LSH clique of B members
    (B²/2 pairs) collapses to B−1 edges.  Output is ≤ unique-nodes rows
    regardless of input pair count."""
    a = t.column("a").to_pylist()
    b = t.column("b").to_pylist()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    out_a, out_b = [], []
    for n in list(parent):
        r = find(n)
        if r != n:
            out_a.append(r)
            out_b.append(n)
    return pa.table(
        {
            "a": pa.array(out_a, type=t.column("a").type),
            "b": pa.array(out_b, type=t.column("b").type),
        }
    )


def min_label_clusters(pairs_ds, driver_pair_limit: int = 2_000_000, max_rounds: int = 4):
    """Connected components over near-dup pairs → Dataset[node, cluster]
    (cluster = min node id of the component).

    Scale shape: while the edge set exceeds ``driver_pair_limit``, a
    map_batches round replaces each batch's edges by its spanning forest
    (dense cliques collapse to trees; output ≤ unique nodes per batch) with
    a coalescing repartition between rounds so each round merges more of
    the component.  The final compressed edge set union-finds on the
    driver — bytes proportional to distinct colliding docs, not pairs.
    Deterministic: connectivity and component minima are global properties,
    independent of batch boundaries.
    """
    import ray.data as rd

    ds = pairs_ds
    for rnd in range(max_rounds):
        cnt = ds.count()
        if cnt <= driver_pair_limit:
            break
        nblocks = max(1, int(cnt // driver_pair_limit))
        ds = ds.repartition(nblocks).map_batches(
            _forest_batch, batch_format="pyarrow", batch_size=driver_pair_limit
        )
    # the forest rounds contract edges toward ≤ driver_pair_limit; if
    # max_rounds exhausts first the component structure is pathological —
    # enforce a generous ceiling instead of silently OOM-ing the driver
    from ..runtime import bounded_collect

    # floor of 2^22 keeps the ceiling meaningful at production limits
    # (default 200k → 3.2M-row ceiling ≈ 100 MB of skinny edges) while
    # tolerating deliberately tiny test limits that stop short of full
    # contraction
    pairs = bounded_collect(
        ds,
        max(16 * driver_pair_limit, 1 << 22),
        "union-find edge set after forest-contraction rounds",
    )
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs[["a", "b"]].itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min id → cluster label is the min member
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(set(pairs["a"]) | set(pairs["b"]))
    return rd.from_pandas(
        pd.DataFrame({"node": nodes, "cluster": [find(n) for n in nodes]})
    )


def dup_window_signals(
    ds,
    win: int = 64,
    stride: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Exact-substring duplication signals — the windowed, shuffle-friendly
    form of suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499): slide
    ``win``-char windows at ``stride`` over each document; a window is
    DUPLICATED iff its exact text occurs as a window in ≥2 distinct
    documents.  Windows at stride s catch any cross-document repeat of
    length ≥ win + s − 1 — the standard scalable approximation of the
    arbitrary-length suffix-array repeat.

    Per surviving doc: n_fps (distinct window fingerprints), n_dup_fps,
    dup_frac = n_dup_fps/n_fps, flagged (dup_frac ≥ 1/2, integer-exact
    2·n_dup ≥ n).  Docs shorter than ``win`` emit no windows and are
    absent from the output (the oracle mirrors this).

    Scale shape: window TEXT never leaves its batch — each window is
    fingerprinted to 128 bits in place (``_fp128``) and only skinny
    (fp_hi, fp_lo, doc_id) rows shuffle, ≤ len/stride per doc.  One
    fp-bucketed exchange counts distinct docs per fingerprint and emits
    per-(fp, doc) shared flags; one doc-bucketed integer sum finishes.
    A 128-bit collision is the only divergence from exact substring
    equality (~n²/2¹²⁸ — ignorable at 10¹² windows)."""
    import pyarrow.compute as pc

    from ..runtime import cluster_cpus
    from ..state.hashing import hash_key
    from .zonal import bucketed_sum

    nb = max(8, cluster_cpus() * 2)

    def windows(t: pa.Table) -> pa.Table:
        text = t.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_win = np.where(lens >= win, (lens - win) // stride + 1, 0)
        parts, owners = [], []
        alive = np.nonzero(n_win > 0)[0]
        k = 0
        while alive.size:
            idx = pa.array(alive)
            parts.append(
                pc.utf8_slice_codeunits(
                    text.take(idx), start=k * stride, stop=k * stride + win
                )
            )
            owners.append(alive)  # id dtype-agnostic: gather rows at the end
            k += 1
            alive = alive[n_win[alive] > k]
        if not parts:
            return pa.table(
                {
                    "fp_hi": pa.array([], type=pa.int64()),
                    "fp_lo": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=ids.type),
                    "bucket": pa.array([], type=pa.int64()),
                }
            )
        wtxt = pa.chunked_array(parts).combine_chunks()
        hi, lo = _fp128(wtxt)
        out = (
            pa.table(
                {
                    "fp_hi": pa.array(hi.astype(np.int64)),
                    "fp_lo": pa.array(lo.astype(np.int64)),
                    id_col: ids.take(pa.array(np.concatenate(owners))),
                }
            )
            .group_by(["fp_hi", "fp_lo", id_col])  # in-batch (fp, doc) distinct
            .aggregate([])
        )
        bucket = (
            hash_key(out.column("fp_lo").to_numpy(zero_copy_only=False).astype(np.uint64))
            % np.uint64(nb)
        ).astype(np.int64)
        return out.append_column("bucket", pa.array(bucket))

    def fp_group(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of an fp land in this bucket → exact global distinct +
        # distinct-doc count per fp
        d = df.drop_duplicates(["fp_hi", "fp_lo", id_col])
        nd = d.groupby(["fp_hi", "fp_lo"])[id_col].transform("size")
        return pd.DataFrame(
            {
                id_col: d[id_col].to_numpy(),
                "n_fps": np.ones(len(d), dtype=np.int64),
                "n_dup_fps": (nd.to_numpy() >= 2).astype(np.int64),
            }
        )

    partial = (
        ds.map_batches(windows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fp_group, batch_format="pandas")
    )
    sums = bucketed_sum(partial, [id_col], ["n_fps", "n_dup_fps"])

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_fps").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("n_dup_fps").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "dup_frac", pa.array(d.astype(np.float64) / n)
        ).append_column("flagged", pa.array((2 * d >= n).astype(np.int64)))

    return sums.map_batches(finish, batch_format="pyarrow")


def dup_window_signals_sql(
    docs_sql: str, win: int = 64, stride: int = 8
) -> str:
    """Oracle: the window texts themselves are the group keys (collision-
    free ground truth the 128-bit engine fingerprints stand in for)."""
    return f"""
        WITH w AS (
            SELECT doc_id,
                   substring(text, CAST(k * {stride} + 1 AS BIGINT), {win}) AS wtxt
            FROM (
                SELECT doc_id, text,
                       unnest(generate_series(
                           0, (length(text) - {win}) // {stride})) AS k
                FROM ({docs_sql}) WHERE length(text) >= {win}
            )
        ),
        d AS (SELECT DISTINCT doc_id, wtxt FROM w),
        c AS (SELECT wtxt, COUNT(DISTINCT doc_id) AS nd FROM d GROUP BY wtxt),
        per AS (
            SELECT d.doc_id, COUNT(*) AS n_fps,
                   SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS n_dup_fps
            FROM d JOIN c USING (wtxt) GROUP BY d.doc_id
        )
        SELECT doc_id, CAST(n_fps AS BIGINT) AS n_fps,
               CAST(n_dup_fps AS BIGINT) AS n_dup_fps,
               CAST(n_dup_fps AS DOUBLE) / n_fps AS dup_frac,
               CAST(2 * n_dup_fps >= n_fps AS BIGINT) AS flagged
        FROM per"""


def dedup_against(ds_new, ds_ref, key_col: str = "text", max_broadcast_fps: int = 5_000_000):
    """Incremental dedup: drop every new-shard row whose ``key_col`` already
    exists in a reference corpus — the daily-crawl-vs-archive filter that
    makes dedup O(increment), not O(archive), per run.

    Both sides reduce to skinny 128-bit fingerprints (raw text never
    shuffles).  The reference fp set deduplicates through the bucketed
    distinct; below ``max_broadcast_fps`` it broadcasts once into a
    stateless structured-searchsorted membership filter, above it a hash
    left-outer join keyed on (fp_hi, fp_lo) keeps everything distributed.
    Exact up to fp128 collisions (~n²/2¹²⁸)."""
    import ray

    from ..runtime import join_partitions
    from .joins import distinct

    def ref_fps(t: pa.Table) -> pa.Table:
        g = t.select([key_col]).group_by([key_col]).aggregate([])
        hi, lo = _fp128(g.column(key_col))
        return pa.table(
            {
                "fp_hi": pa.array(hi.astype(np.int64)),
                "fp_lo": pa.array(lo.astype(np.int64)),
            }
        )

    fps = distinct(
        ds_ref.map_batches(ref_fps, batch_format="pyarrow"), ["fp_hi", "fp_lo"]
    ).materialize()
    n_fps = fps.count()
    if n_fps == 0:  # empty reference — nothing can be a duplicate
        return ds_new

    if n_fps <= max_broadcast_fps:
        pdf = fps.to_pandas()
        ref = np.empty(len(pdf), dtype=[("h", "<i8"), ("l", "<i8")])
        ref["h"] = pdf["fp_hi"].to_numpy(np.int64)
        ref["l"] = pdf["fp_lo"].to_numpy(np.int64)
        ref.sort()
        ref_ref = ray.put(ref)

        def drop_known(t: pa.Table) -> pa.Table:
            side = ray.get(ref_ref)
            hi, lo = _fp128(
                t.column(key_col).combine_chunks()
                if isinstance(t.column(key_col), pa.ChunkedArray)
                else t.column(key_col)
            )
            probe = np.empty(len(t), dtype=[("h", "<i8"), ("l", "<i8")])
            probe["h"] = hi.astype(np.int64)
            probe["l"] = lo.astype(np.int64)
            if side.shape[0] == 0:
                return t
            pos = np.clip(np.searchsorted(side, probe), 0, side.shape[0] - 1)
            known = side[pos] == probe
            return t.filter(pa.array(~known))

        return ds_new.map_batches(drop_known, batch_format="pyarrow")

    # corpus-scale reference: distributed hash join on the fingerprint
    def add_fps(t: pa.Table) -> pa.Table:
        hi, lo = _fp128(
            t.column(key_col).combine_chunks()
            if isinstance(t.column(key_col), pa.ChunkedArray)
            else t.column(key_col)
        )
        return t.append_column("fp_hi", pa.array(hi.astype(np.int64))).append_column(
            "fp_lo", pa.array(lo.astype(np.int64))
        )

    def flagged(t: pa.Table) -> pa.Table:
        return t.append_column("_dup", pa.array(np.ones(len(t), np.int64)))

    import pyarrow.compute as pc

    joined = ds_new.map_batches(add_fps, batch_format="pyarrow").join(
        fps.map_batches(flagged, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=join_partitions(),
        on=("fp_hi", "fp_lo"),
    )

    def keep_new(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("_dup"))).drop_columns(
            ["_dup", "fp_hi", "fp_lo"]
        )

    return joined.map_batches(keep_new, batch_format="pyarrow")


def snapshot_diff(ds_a, ds_b, key_col: str = "text", id_col: str = "doc_id"):
    """Change detection between two corpus snapshots (crawl N vs N+1):
    per id, 'added' (only in B), 'removed' (only in A), 'changed' (in
    both with different content).  Unchanged rows never leave the join.

    Scale shape: each side reduces to skinny (id, fp_hi, fp_lo) rows —
    content travels as 128-bit fingerprints, so the full-outer hash join
    exchanges 3 integers per row whatever the document size; the
    classifier is one stateless vectorized pass.  Returns
    Dataset[id_col, status]."""
    import pyarrow.compute as pc

    from ..runtime import join_partitions

    def fps(names):
        idn, hn, ln = names

        def fn(t: pa.Table) -> pa.Table:
            col = t.column(key_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            hi, lo = _fp128(col)
            return pa.table(
                {
                    idn: t.column(id_col),
                    hn: pa.array(hi.astype(np.int64)),
                    ln: pa.array(lo.astype(np.int64)),
                }
            )

        return fn

    a = ds_a.map_batches(fps(("ida", "ha", "la")), batch_format="pyarrow").materialize()
    b = ds_b.map_batches(fps(("idb", "hb", "lb")), batch_format="pyarrow")
    # the skinny fp table is cheap to materialize for a row count; sizing
    # partitions by it avoids 2×CPU aggregator actors on near-empty inputs
    joined = a.join(
        b,
        join_type="full_outer",
        num_partitions=join_partitions(rows_hint=a.count()),
        on=("ida",),
        right_on=("idb",),
    )

    def classify(t: pa.Table) -> pa.Table:
        # fill nulls BEFORE numpy conversion: a nullable int64 column
        # converts to float64-with-NaN, and 64-bit fingerprints are not
        # representable in float64 (distinct fps could compare equal)
        def i64(name):
            return (
                pc.fill_null(t.column(name), 0)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )

        # Ray's full_outer COALESCES the key columns into the left name
        # ("ida" carries whichever side is present); absence is detected on
        # the value fingerprints instead
        only_b = pc.is_null(t.column("ha")).to_numpy(zero_copy_only=False)
        only_a = pc.is_null(t.column("hb")).to_numpy(zero_copy_only=False)
        ha, hb, la, lb = i64("ha"), i64("hb"), i64("la"), i64("lb")
        both = ~only_a & ~only_b
        changed = both & ((ha != hb) | (la != lb))
        keep = only_a | only_b | changed
        ids = i64("ida")
        status = np.full(len(t), "changed", dtype=object)
        status[only_b] = "added"
        status[only_a] = "removed"
        return pa.table(
            {
                id_col: pa.array(ids[keep].astype(np.int64)),
                "status": pa.array(status[keep].tolist(), type=pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow")


# --------------------------------------- corpus-wide frequent-line removal

FREQ_LINE_BROADCAST_LIMIT = 5_000_000  # distinct frequent (boilerplate) lines


def drop_frequent_lines(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 3,
    min_len: int = PARA_MIN_DEDUP_LEN,
    rows_hint: int | None = None,
    broadcast_limit: int = FREQ_LINE_BROADCAST_LIMIT,
):
    """RefinedWeb/Dolma-style boilerplate removal: every '\\n'-separated
    line of length ≥ ``min_len`` whose exact text occurs ≥ ``min_count``
    times CORPUS-WIDE (all occurrences counted, within-doc repeats
    included) is removed from every document; shorter lines always
    survive.  Documents reassemble from surviving lines in original order;
    a document losing every line disappears.

    Scale shape (the house fingerprint discipline — raw line text never
    enters a shuffle key):
      1. one streaming pass explodes lines and emits per-batch
         (fp128 → partial occurrence count) SKINNY rows;
      2. hash-bucketed integer combine → corpus counts per fingerprint;
      3. the frequent set (count ≥ min_count) is boilerplate-sized
         (≪ distinct-line cardinality): below ``broadcast_limit`` it
         broadcasts once via ``ray.put`` and removal is ONE stateless
         second pass (lexsorted-fp membership probe + in-batch rebuild —
         a document is one input row, so its lines never cross a batch);
      4. above the limit: left join lines⋈frequent on the integer fp,
         bucketed per-doc rebuild (the ``drop_dup_paragraphs`` fallback
         shape).

    Returns Dataset[id, text_clean, n_kept, n_dropped].  Reference analog:
    exact distinct at sub-document granularity (SURVEY §2.7), inverted —
    frequency-keyed removal rather than first-keeper dedup."""
    import pyarrow.compute as pc

    import ray

    from ..runtime import join_partitions
    from ..state.hashing import id_u64, splitmix64 as _smx
    from .zonal import _default_buckets, bucketed_sum

    nb = _default_buckets(rows_hint)

    def count_partial(t: pa.Table) -> pa.Table:
        ex = _explode_paragraphs(t, text_col, id_col)
        is_long = pc.greater_equal(pc.utf8_length(ex.column("para")), min_len)
        para = ex.column("para").filter(is_long)
        hi, lo = _fp128(para)
        g = pa.table(
            {
                "fp_hi": pa.array(hi.astype(np.int64)),
                "fp_lo": pa.array(lo.astype(np.int64)),
            }
        )
        out = g.group_by(["fp_hi", "fp_lo"]).aggregate([("fp_hi", "count")])
        return out.rename_columns(["fp_hi", "fp_lo", "cnt"])

    counts = bucketed_sum(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["fp_hi", "fp_lo"],
        ["cnt"],
        recombine_batch_size=None,
        rows_hint=rows_hint,
    )
    frequent = counts.filter(
        expr=f"cnt >= {int(min_count)}"
    ).materialize()  # boilerplate-sized: one row per distinct frequent line
    n_freq = frequent.count()

    if n_freq <= broadcast_limit:
        if n_freq == 0:
            # empty Dataset.to_pandas() loses column names — short-circuit
            fhi = np.empty(0, np.int64)
            flo = np.empty(0, np.int64)
        else:
            ft = frequent.to_pandas()
            fhi = ft["fp_hi"].to_numpy(np.int64)
            flo = ft["fp_lo"].to_numpy(np.int64)
        order = np.lexsort((flo, fhi))
        side_ref = ray.put({"hi": fhi[order], "lo": flo[order]})

        def strip_batch(t: pa.Table) -> pa.Table:
            side = ray.get(side_ref)
            ex = _explode_paragraphs(t, text_col, id_col)
            kept = np.ones(len(ex), dtype=bool)
            is_long = pc.greater_equal(
                pc.utf8_length(ex.column("para")), min_len
            ).to_numpy(zero_copy_only=False)
            li = np.flatnonzero(is_long)
            if li.size and len(side["hi"]):
                hi, lo = _fp128(ex.column("para").take(pa.array(li)))
                h = hi.astype(np.int64)
                l = lo.astype(np.int64)
                start = np.searchsorted(side["hi"], h, side="left")
                end = np.searchsorted(side["hi"], h, side="right")
                member = np.zeros(li.size, dtype=bool)
                one = end - start == 1
                if one.any():
                    member[one] = side["lo"][start[one]] == l[one]
                for j in np.flatnonzero(end - start > 1):
                    seg = side["lo"][start[j] : end[j]]
                    k = int(np.searchsorted(seg, l[j]))
                    member[j] = k < len(seg) and seg[k] == l[j]
                kept[li] = ~member
            return _rebuild_contiguous(ex.filter(pa.array(kept)), id_col)

        return ds.map_batches(strip_batch, batch_format="pyarrow")

    # ---- large-frequent-set fallback: fp-keyed left join, null = keep ----
    def explode_fp(t: pa.Table) -> pa.Table:
        out = _explode_paragraphs(t, text_col, id_col)
        hi, lo = _fp128(out.column("para"))
        return out.append_column(
            "fp_hi", pa.array(hi.astype(np.int64))
        ).append_column("fp_lo", pa.array(lo.astype(np.int64)))

    lines = ds.map_batches(explode_fp, batch_format="pyarrow")
    joined = lines.join(
        frequent,
        join_type="left_outer",
        num_partitions=join_partitions(),
        on=("fp_hi", "fp_lo"),
    )

    def keep_mask(t: pa.Table) -> pa.Table:
        # frequent set holds only ≥min_len lines; identical text ⇒ same
        # length, so a marker hit implies the line is long — null = keep
        return t.filter(pc.is_null(t.column("cnt"))).select(
            [id_col, "idx", "para", "n_para"]
        )

    kept = joined.map_batches(keep_mask, batch_format="pyarrow")

    def add_doc_bucket(t: pa.Table) -> pa.Table:
        col = t.column(id_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        key = _smx(id_u64(col))
        return t.append_column(
            "bucket", pa.array((key % np.uint64(nb)).astype(np.int64))
        )

    def rebuild(g: pa.Table) -> pa.Table:
        s = g.take(
            pc.sort_indices(
                g, sort_keys=[(id_col, "ascending"), ("idx", "ascending")]
            )
        )
        return _rebuild_contiguous(s, id_col)

    return (
        kept.map_batches(add_doc_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rebuild, batch_format="pyarrow")
        .select_columns([id_col, "text_clean", "n_kept", "n_dropped"])
    )


def drop_frequent_lines_sql(
    docs_sql: str,
    min_count: int = 3,
    min_len: int = PARA_MIN_DEDUP_LEN,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for ``drop_frequent_lines``: identical split / corpus-count /
    threshold / reassembly rule, joining on the raw line string where the
    engine joins on its 128-bit fingerprint."""
    return f"""
        WITH fl_paras AS (
            SELECT {id_col},
                   CAST(generate_subscripts(ps, 1) - 1 AS BIGINT) AS idx,
                   unnest(ps) AS p,
                   CAST(len(ps) AS BIGINT) AS n_para
            FROM (SELECT {id_col}, string_split({text_col}, chr(10)) AS ps
                  FROM ({docs_sql}))
        ),
        fl_freq AS (
            SELECT p FROM fl_paras WHERE length(p) >= {min_len}
            GROUP BY p HAVING COUNT(*) >= {min_count}
        ),
        fl_kept AS (
            SELECT pr.{id_col}, pr.idx, pr.p, pr.n_para
            FROM fl_paras pr LEFT JOIN fl_freq f ON pr.p = f.p
            WHERE f.p IS NULL
        )
        SELECT {id_col},
               string_agg(p, chr(10) ORDER BY idx) AS text_clean,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(any_value(n_para) - COUNT(*) AS BIGINT) AS n_dropped
        FROM fl_kept GROUP BY {id_col}"""


def similar_docs(
    ds,
    query_text: str,
    k_results: int = 10,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Single-query similarity search — "find documents like this one":
    exact k-shingle Jaccard of every document against ONE broadcast query
    document, ranked by (jaccard desc, id).

    Scale shape: the query's distinct shingle set broadcasts once; each
    batch computes per-doc distinct shingles with the shared vectorized
    rolling hash and a sorted-array membership count — NO shuffle at all;
    only docs with ≥1 shared shingle emit a row and ≤k survive each block
    via the two-level top-k.  Exact: jaccard = ni/(nq + nd − ni), one
    IEEE division of exact integers (identical in SQL).

    Returns Dataset[(id, jaccard)] — the top-k."""
    import ray

    from .joins import top_k

    q = np.unique(_char_shingle_hashes(query_text.encode("utf-8"), shingle_k))
    nq = int(q.shape[0])
    qref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        flat, seg = _batch_shingle_hashes(t.column(text_col), shingle_k)
        n = len(t)
        counts = np.diff(seg)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((flat, doc_idx))
        di, h = doc_idx[order], flat[order]
        first = np.ones(di.shape[0], dtype=bool)
        if di.shape[0]:
            first[1:] = (di[1:] != di[:-1]) | (h[1:] != h[:-1])
        di, h = di[first], h[first]
        nd = np.bincount(di, minlength=n).astype(np.int64)
        if nq and h.shape[0]:
            pos = np.minimum(np.searchsorted(qs, h), nq - 1)
            member = qs[pos] == h
        else:
            member = np.zeros(h.shape[0], dtype=bool)
        ni = np.bincount(di[member], minlength=n).astype(np.int64)
        nz = np.flatnonzero(ni)
        jac = ni[nz] / (nq + nd[nz] - ni[nz])
        ids = t.column(id_col).take(pa.array(nz))
        return pa.table({id_col: ids, "jaccard": pa.array(jac)})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return top_k(scored, "jaccard", k_results, tiebreak_col=id_col, descending=True)


MMR_SIM_SCALE = 1 << 20  # integer quantization of the Jaccard similarities


def mmr_select(
    ds,
    query_text: str,
    k_results: int = 8,
    pool_size: int = 24,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Maximal-marginal-relevance diversified retrieval (Carbonell &
    Goldstein 1998, public method) — "documents like this one, but not
    like each other": greedy selection maximizing

        score(d | S) = 2·rel_q(d) − max_{s∈S} sim_q(d, s)      (λ = ½)

    where rel/sim are k-shingle Jaccard similarities QUANTIZED to integers
    (⌊j·2²⁰⌋ via pure integer division (inter·2²⁰)//union), so every score
    is an int64 and the greedy argmax (score desc, id asc) is bit-exact in
    SQL — the λ=½ choice is what keeps the subtraction integral.

    Scale shape: the distributed part is :func:`similar_docs`-shaped —
    query shingle set broadcast, per-batch membership counts, two-level
    top-``pool_size`` — and only then does the driver rerank the bounded
    candidate pool (pairwise sims over ≤pool_size docs).

    Returns Dataset[(rank, id, rel_q, score_q)] — the k selected docs in
    pick order.
    """
    import ray
    import ray.data as rd

    from .joins import top_k

    Q = MMR_SIM_SCALE
    q = np.unique(_char_shingle_hashes(query_text.encode("utf-8"), shingle_k))
    nq = int(q.shape[0])
    qref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        flat, seg = _batch_shingle_hashes(t.column(text_col), shingle_k)
        n = len(t)
        counts = np.diff(seg)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((flat, doc_idx))
        di, h = doc_idx[order], flat[order]
        first = np.ones(di.shape[0], dtype=bool)
        if di.shape[0]:
            first[1:] = (di[1:] != di[:-1]) | (h[1:] != h[:-1])
        di, h = di[first], h[first]
        nd = np.bincount(di, minlength=n).astype(np.int64)
        if nq and h.shape[0]:
            pos = np.minimum(np.searchsorted(qs, h), nq - 1)
            member = qs[pos] == h
        else:
            member = np.zeros(h.shape[0], dtype=bool)
        ni = np.bincount(di[member], minlength=n).astype(np.int64)
        ids_all = t.column(id_col).to_numpy(zero_copy_only=False)
        nz = np.flatnonzero((ni > 0) & (ids_all != 0))
        relq = (ni[nz] * Q) // (nq + nd[nz] - ni[nz])
        return pa.table(
            {id_col: pa.array(ids_all[nz]), "rel_q": pa.array(relq)}
        )

    pool = (
        top_k(
            ds.map_batches(score, batch_format="pyarrow"),
            "rel_q",
            pool_size,
            tiebreak_col=id_col,
            descending=True,
        )
        .to_pandas()
        .sort_values(["rel_q", id_col], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )
    if len(pool) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "rank": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "rel_q": pa.array([], pa.int64()),
                    "score_q": pa.array([], pa.int64()),
                }
            )
        )

    # bounded candidate texts -> shingle sets -> pairwise quantized sims
    pool_ids = pool[id_col].to_numpy(np.int64)
    idset = ray.put(np.sort(pool_ids))

    def pick(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.isin(ids, ray.get(idset))
        return t.filter(pa.array(keep))

    from ..runtime import bounded_collect

    texts = bounded_collect(
        ds.map_batches(pick, batch_format="pyarrow"),
        pool_size,
        "mmr candidate texts: ≤ pool_size docs",
    )
    sets = {
        int(r[id_col]): np.unique(
            _char_shingle_hashes(str(r[text_col]).encode("utf-8"), shingle_k)
        )
        for _, r in texts.iterrows()
    }
    m = len(pool_ids)
    simq = np.zeros((m, m), dtype=np.int64)
    for i in range(m):
        a = sets[int(pool_ids[i])]
        for j in range(i + 1, m):
            b = sets[int(pool_ids[j])]
            inter = int(np.intersect1d(a, b, assume_unique=True).shape[0])
            union = int(a.shape[0] + b.shape[0] - inter)
            simq[i, j] = simq[j, i] = (inter * Q) // union if union else 0

    relq = pool["rel_q"].to_numpy(np.int64)
    selected: list[int] = []
    out_rows = []
    remaining = list(range(m))
    for rank in range(1, min(k_results, m) + 1):
        best = None
        for i in remaining:
            red = int(simq[i, selected].max()) if selected else 0
            sc = 2 * int(relq[i]) - red
            key = (-sc, int(pool_ids[i]))
            if best is None or key < best[0]:
                best = (key, i, sc)
        _, bi, bsc = best
        out_rows.append((rank, int(pool_ids[bi]), int(relq[bi]), bsc))
        selected.append(bi)
        remaining.remove(bi)
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array([r[0] for r in out_rows], pa.int64()),
                id_col: pa.array([r[1] for r in out_rows], pa.int64()),
                "rel_q": pa.array([r[2] for r in out_rows], pa.int64()),
                "score_q": pa.array([r[3] for r in out_rows], pa.int64()),
            }
        )
    )


def ngram_containment(texts_a: list[str], texts_b: list[str], k: int = 5) -> np.ndarray:
    """Exact k-shingle CONTAINMENT |A∩B| / |A| for candidate pairs — the
    asymmetric near-dup measure (quote / subset detection: a short doc
    fully contained in a long one scores 1.0 where Jaccard stays low)."""
    out = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        sa = set(np.unique(_char_shingle_hashes(ta.encode("utf-8"), k)).tolist())
        sb = set(np.unique(_char_shingle_hashes(tb.encode("utf-8"), k)).tolist())
        out[i] = (len(sa & sb) / len(sa)) if sa else 1.0
    return out


def containment_pairs(ds, text_col: str, id_col: str, k: int = 5, threshold: float = 0.5):
    """LSH candidate pairs verified by exact k-shingle containment — the
    asymmetric companion of the Jaccard verify (same crawl-scale shape:
    pairs ⋈ texts via two bounded hash joins, per-pair kernel on the
    candidate set only, never the corpus cross product).

    Output: (a, b, containment:f64) for pairs with containment ≥
    ``threshold`` — note (a,b) and (b,a) can both survive with DIFFERENT
    values (containment is directional); candidates are emitted a < b,
    so this checks "a's shingles inside b"."""
    from ..runtime import join_partitions

    cand = minhash_candidate_pairs(ds, text_col, id_col).materialize()
    n_pairs = cand.count()
    docs = ds.select_columns([id_col, text_col])
    np_parts = 1 if n_pairs < 10_000 else join_partitions(rows_hint=n_pairs)
    with_a = cand.join(
        docs, join_type="inner", num_partitions=np_parts,
        on=("a",), right_on=(id_col,), right_suffix="_ta",
    ).materialize()
    with_ab = with_a.join(
        docs, join_type="inner", num_partitions=np_parts,
        on=("b",), right_on=(id_col,), left_suffix="_l", right_suffix="_tb",
    )
    ta, tb = f"{text_col}_l", f"{text_col}_tb"

    def verify(t: pa.Table) -> pa.Table:
        c = ngram_containment(t.column(ta).to_pylist(), t.column(tb).to_pylist(), k=k)
        out = pa.table(
            {"a": t.column("a"), "b": t.column("b"), "containment": pa.array(c)}
        )
        return out.filter(pa.array(c >= threshold))

    return with_ab.map_batches(verify, batch_format="pyarrow")


def scd2_history(ds_a, ds_b, key_col: str = "text", id_col: str = "doc_id"):
    """Slowly-changing-dimension type-2 history build between two corpus
    snapshots — the warehouse-ETL staple: per id, versioned rows with
    integer validity windows (valid_from/valid_to in snapshot epochs,
    −1 = still open):

      unchanged → (0, −1)             changed → (0, 1) + (1, −1)
      added     → (1, −1)             removed → (0, 1)

    Content travels as the :func:`snapshot_diff` 128-bit fingerprints
    internally (the join exchanges 3 integers per row whatever the
    document size); ``valid_from`` IS the snapshot epoch whose content
    the row carries, so the whole history row is pure integers.

    Output: (doc_id:int64, valid_from:int64, valid_to:int64).
    """
    import pyarrow.compute as pc

    from ..runtime import join_partitions

    def fps(names):
        idn, hn, ln = names

        def fn(t: pa.Table) -> pa.Table:
            col = t.column(key_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            hi, lo = _fp128(col)
            return pa.table(
                {
                    idn: t.column(id_col),
                    hn: pa.array(hi.astype(np.int64)),
                    ln: pa.array(lo.astype(np.int64)),
                }
            )

        return fn

    a = ds_a.map_batches(fps(("ida", "ha", "la")), batch_format="pyarrow").materialize()
    b = ds_b.map_batches(fps(("idb", "hb", "lb")), batch_format="pyarrow")
    joined = a.join(
        b,
        join_type="full_outer",
        num_partitions=join_partitions(rows_hint=a.count()),
        on=("ida",),
        right_on=("idb",),
    )

    def emit(t: pa.Table) -> pa.Table:
        def i64(name):
            return (
                pc.fill_null(t.column(name), 0)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )

        only_b = pc.is_null(t.column("ha")).to_numpy(zero_copy_only=False)
        only_a = pc.is_null(t.column("hb")).to_numpy(zero_copy_only=False)
        ha, hb, la, lb = i64("ha"), i64("hb"), i64("la"), i64("lb")
        ids = i64("ida")
        both = ~only_a & ~only_b
        changed = both & ((ha != hb) | (la != lb))
        unchanged = both & ~changed
        out_id, out_f, out_t = [], [], []
        # epoch-0 rows: unchanged stay open; changed/removed close at 1
        m = ~only_b
        closes = changed | only_a
        out_id.append(ids[m])
        out_f.append(np.zeros(int(m.sum()), np.int64))
        out_t.append(np.where(closes[m], np.int64(1), np.int64(-1)))
        # epoch-1 rows for changed/added, open
        m2 = changed | only_b
        out_id.append(ids[m2])
        out_f.append(np.ones(int(m2.sum()), np.int64))
        out_t.append(np.full(int(m2.sum()), -1, np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "valid_from": pa.array(np.concatenate(out_f), pa.int64()),
                "valid_to": pa.array(np.concatenate(out_t), pa.int64()),
            }
        )

    return joined.map_batches(emit, batch_format="pyarrow")
