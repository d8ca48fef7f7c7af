"""Model stages: training-table build, per-class RF primitives, tile
scoring, assemblage, accuracy/area reports.

Reference flow (SURVEY.md §3.2-3.3):
  02train_test  — stratified sample inside reference polygons + band
                  extraction + 80/20 split (src/02train_test.py,
                  src/utils/sampling.py:115-193)
  03RFprimitives— per-class binary RF probability models, 2-pass training
                  (all features → top-20 retrain), OOB/importance metrics
                  (src/03RFprimitives.py, src/utils/primitives.py:69-151)
  04generate_LC — per-tile argmax over class probabilities → LANDCOVER
                  (src/utils/assemblage.py)
  05accuracy    — confusion matrix + per-class producer/user accuracy +
                  per-class area (src/misc/05accuracy.py:89-141)

Ray-Data shape: the training table is tiny next to the corpus → collected
and trained driver-side (deterministic numpy forest); the trained models are
broadcast once (ray.put) into a scorer actor pool that scores ALL classes in
a single pass over the tile composites (one wide batch op, no shuffle);
argmax happens per batch; only the per-class counts aggregate shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, CLASSES, PipelineConfig
from ..state.forest import Forest, top_k_features, train_forest
from ..stages import covariates, pip, sampling, spans, zonal


# ------------------------------------------------------ training table


def build_training_table(
    synth_root: str, config: PipelineConfig = DEFAULT_CONFIG
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """geo spans inside labeled reference polygons → covariate features →
    seeded per-class cap → 80/20 split.  Returns (train, test) DataFrames.

    The PIP label join is the sampleRegions band-extraction analog (J4):
    each span already carries its band observation, so 'extraction' is the
    covariate computation.
    """
    docs = rd.read_parquet(f"{synth_root}/documents")
    geo = spans.geo_obs(docs)
    labeled = pip.pip_join(
        geo, f"{synth_root}/polygons.parquet", kinds=["reference"], mode="label"
    )
    labeled = labeled.filter(expr="LANDCOVER > 0")
    feat = covariates.add_covariates(labeled, config)
    capped = sampling.stratified_sample(
        feat,
        "LANDCOVER",
        ["doc_id", "span_idx"],
        {c: 400 for c in CLASSES},
        seed=config.seed,
    )
    train, test = sampling.split_train_test(
        capped, ["doc_id", "span_idx"], seed=config.seed, frac=config.split_frac
    )
    return train.to_pandas(), test.to_pandas()


# ------------------------------------------------------- model training


def train_primitives(
    train_df: pd.DataFrame, config: PipelineConfig = DEFAULT_CONFIG
) -> dict:
    """Per-class binary forests, two-pass (full → top-k features retrain).

    Returns {class: {"forest": Forest, "features": [names], "oob": float,
    "importance": {name: score}}} — the metrics the reference exports per
    class (src/utils/primitives.py:18-30).
    """
    names = covariates.feature_names(config)
    X = train_df[names].to_numpy(dtype=np.float64)
    y_all = train_df["LANDCOVER"].to_numpy()
    # the per-class models are independent — train them as parallel Ray
    # tasks (reference analog: the per-class EE export tasks run
    # concurrently server-side, src/utils/primitives.py:139-150).  Results
    # are deterministic regardless of scheduling: each task is a pure
    # function of (X, y, seed, class_tag).
    if ray.is_initialized():
        x_ref = ray.put(X)
        futs = {
            c: _train_one_class.remote(x_ref, y_all == c, c, names, config)
            for c in sorted(CLASSES)
        }
        return {c: ray.get(f) for c, f in futs.items()}
    return {
        c: _train_one_class_local(X, y_all == c, c, names, config)
        for c in sorted(CLASSES)
    }


def _train_one_class_local(X, y_bool, c, names, config):
    y = y_bool.astype(np.float64)  # M16 binary relabel, no data copy
    full = train_forest(
        X, y, n_trees=config.rf_trees, seed=config.rf_seed, class_tag=c,
        feature_names=names,
    )
    keep = top_k_features(full, config.rf_top_k_features)
    kept_names = [names[i] for i in keep]
    retrained = train_forest(
        X[:, keep], y, n_trees=config.rf_trees, seed=config.rf_seed,
        class_tag=1000 + c, feature_names=kept_names,
    )
    return {
        "forest": retrained,
        "features": kept_names,
        "oob": retrained.oob_error,
        "importance": dict(zip(names, full.importance.tolist())),
    }


@ray.remote
def _train_one_class(X, y_bool, c, names, config):
    return _train_one_class_local(X, y_bool, c, names, config)


# ------------------------------------------------------------- scoring


class PrimitiveScorer:
    """Actor-pool callable: batch of feature rows → per-class probabilities
    (prob_1..prob_8) + argmax LANDCOVER (+1-free: classes already 1-based).

    Models loaded once per actor from the object store."""

    def __init__(self, models_ref):
        self.models = (
            ray.get(models_ref) if isinstance(models_ref, ray.ObjectRef) else models_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        probs = []
        classes = sorted(self.models)
        for c in classes:
            m = self.models[c]
            fnames = m["features"]
            X = np.stack(
                [batch.column(f).to_numpy(zero_copy_only=False) for f in fnames],
                axis=1,
            )
            p = m["forest"].predict_proba(X)
            probs.append(p)
            batch = batch.append_column(f"prob_{c}", pa.array(p))
        P = np.stack(probs, axis=1)
        # ties → lowest class index (band-order argmax, assemblage.py:12-19)
        label = np.asarray(classes, dtype=np.int32)[np.argmax(P, axis=1)]
        return batch.append_column("LANDCOVER_pred", pa.array(label))


def score(ds, models: dict, concurrency=None):
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    models_ref = ray.put(models)
    return ds.map_batches(
        PrimitiveScorer,
        fn_constructor_kwargs={"models_ref": models_ref},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


# ------------------------------------------------ tile composite + labels


def tile_composites(geo, config: PipelineConfig = DEFAULT_CONFIG):
    """Per-(tile, year) mean-band composite → covariates.

    The 01composite analog at tile granularity: exact scaled-int means, then
    the covariate kernels over the composite bands.
    """
    comp = zonal.zonal_counts(geo, keys=("tile_id", "year"), bands=range(6))

    def rename(t: pa.Table) -> pa.Table:
        cols = {"tile_id": t.column("tile_id"), "year": t.column("year"), "n": t.column("n")}
        for b in range(6):
            cols[f"b{b}"] = t.column(f"mean_b{b}")
        return pa.table(cols)

    return comp.map_batches(rename, batch_format="pyarrow").map_batches(
        lambda t: covariates.covariates_batch(t, config), batch_format="pyarrow"
    )


def generate_landcover(synth_root: str, models: dict, config: PipelineConfig = DEFAULT_CONFIG):
    """documents → tile composites → score → Dataset[tile_id, year,
    LANDCOVER] (the 04generate_LC output)."""
    docs = rd.read_parquet(f"{synth_root}/documents")
    geo = spans.geo_obs(docs)
    scored = score(tile_composites(geo, config), models)
    return scored.select_columns(["tile_id", "year", "LANDCOVER_pred"]).map_batches(
        lambda t: t.rename_columns(["tile_id", "year", "LANDCOVER"]),
        batch_format="pyarrow",
    )


# --------------------------------------------------------- accuracy (A9)


def stratified_area_estimate(
    strata_weights: dict[int, float],
    map_class: np.ndarray,
    ref_class: np.ndarray,
    total_area_m2: float,
) -> pd.DataFrame:
    """Stratified area estimation with 95% CI — the reference's final Area
    Estimation spreadsheet step (src/misc/old_README_instructions.md:16-50,
    ProjectWorkflow.md:225-256), as the standard good-practice estimator:

      p̂_j  = Σ_h W_h · n_hj / n_h          (area proportion of class j)
      SE_j = √( Σ_h W_h² · p̂_hj(1−p̂_hj) / (n_h − 1) )
      CI95 = 1.96 · SE_j;  area_j = p̂_j · total_area

    ``strata_weights``: mapped-area share W_h per stratum (map class);
    ``map_class`` / ``ref_class``: the accuracy-assessment sample.
    """
    classes = sorted(strata_weights)
    rows = []
    for j in classes:
        p_j = 0.0
        var = 0.0
        for h in classes:
            sel = map_class == h
            n_h = int(sel.sum())
            if n_h == 0:
                continue
            p_hj = float((ref_class[sel] == j).sum()) / n_h
            w = strata_weights[h]
            p_j += w * p_hj
            if n_h > 1:
                var += w * w * p_hj * (1.0 - p_hj) / (n_h - 1)
        se = float(np.sqrt(var))
        rows.append(
            {
                "LANDCOVER": j,
                "area_share": p_j,
                "se": se,
                "ci95": 1.96 * se,
                "area_m2": p_j * total_area_m2,
                "area_ci95_m2": 1.96 * se * total_area_m2,
            }
        )
    return pd.DataFrame(rows)


def area_with_ci(synth_root: str, models: dict, config: PipelineConfig = DEFAULT_CONFIG):
    """End-to-end area ± CI: predicted landcover map → strata weights from
    mapped tile counts → accuracy sample (predicted vs synth truth labels
    on the training tiles) → stratified estimator.

    Fully distributed over the tile map (which grows with the mapped area,
    so it must never sit on the driver): per-class counts and the total
    mapped area are Dataset aggregates, and the accuracy sample is a
    seeded partition-invariant bottom-k by splitmix rank — only the ≤2000
    sampled rows and the 8 strata rows ever reach the driver."""
    from ..state.cells import TILE_LEVEL, cell_area_m2, cell_center
    from ..state.hashing import hash_key
    from ..stages.joins import top_k
    from ..synth import class_of

    lc = generate_landcover(synth_root, models, config)

    cdf = lc.groupby("LANDCOVER").count().to_pandas()
    counts = dict(zip(cdf["LANDCOVER"], cdf["count()"]))
    tot_n = float(sum(counts.values()))
    weights = {int(c): n / tot_n for c, n in counts.items()}

    def with_area_rank(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        yr = t.column("year").to_numpy(zero_copy_only=False)
        t = t.append_column(
            "area_m2_i", pa.array(np.rint(cell_area_m2(tid, TILE_LEVEL)).astype(np.int64))
        )
        rnd = hash_key(config.seed, "areasamp", tid.astype(np.int64) * np.int64(10007) + yr)
        return t.append_column("rnd", pa.array(rnd.astype(np.int64)))

    aug = lc.map_batches(with_area_rank, batch_format="pyarrow")
    total = float(aug.sum("area_m2_i"))
    samp = top_k(
        aug, "rnd", min(2000, int(tot_n)), "tile_id", descending=False
    ).to_pandas()
    lon, lat = cell_center(samp["tile_id"].to_numpy(), TILE_LEVEL)
    truth = class_of(lon, lat)
    return stratified_area_estimate(
        weights, samp["LANDCOVER"].to_numpy(), truth, total
    )


def score_quantized(
    ds, models: dict, concurrency=None, label_col="LANDCOVER_q", prefix="pq_"
):
    """Like ``score`` but emits the exact replayable statistic: per class,
    ``{prefix}{c}`` = Σ_trees rint(leaf_value·2^40) (int64, order-free),
    plus ``{label_col}`` = argmax over the integer sums (ties → lowest
    class).  A SQL walk over the exported node tables reproduces every
    value bit-for-bit — see ``Forest.predict_quantized``.  ``label_col``/
    ``prefix`` let a second model family (e.g. a single-tree baseline for
    a paired McNemar test) score the same rows without column collisions."""
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    models_ref = ray.put(models)

    class QuantScorer:
        def __init__(self):
            self.models = ray.get(models_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            classes = sorted(self.models)
            sums = []
            for c in classes:
                m = self.models[c]
                X = np.stack(
                    [
                        batch.column(f).to_numpy(zero_copy_only=False)
                        for f in m["features"]
                    ],
                    axis=1,
                )
                q = m["forest"].predict_quantized(X)
                sums.append(q)
                batch = batch.append_column(f"{prefix}{c}", pa.array(q))
            Q = np.stack(sums, axis=1)
            label = np.asarray(classes, dtype=np.int32)[np.argmax(Q, axis=1)]
            return batch.append_column(label_col, pa.array(label))

    return ds.map_batches(
        QuantScorer,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


# --------------------------------------------- model export (SQL oracle)

_RF_MEMO: dict = {}


def rf_artifacts(synth_root: str, config: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Train the per-class primitives ONCE per (synth_root, config) and
    persist the two artifacts the SQL oracle replays:

      {synth_root}/rf_model/trees.parquet — every forest flattened to a
        relational node table (``state.forest.nodes_table``): the
        model-export analog of the reference's per-class probability-image
        assets (src/utils/primitives.py:33-46);
      {synth_root}/rf_model/probs/ — per-(tile, year) float64 class
        probabilities + argmax LANDCOVER, written DISTRIBUTED by the
        scorer pipeline (ds.write_parquet, streaming — the full map never
        sits on the driver).

    Both the engine queries and ``oracle_sql`` generation call this; a
    done-marker keyed by config hash makes repeats (same process or a
    fresh one) skip straight to the persisted artifacts.  Everything is
    deterministic (seeded splitmix64), so racing processes write
    identical bytes.
    """
    import json
    import os

    import pyarrow.parquet as pq

    key = (synth_root, config.config_hash())
    if key in _RF_MEMO:
        return _RF_MEMO[key]
    base = os.path.join(synth_root, "rf_model")
    marker = os.path.join(base, f"done-{config.config_hash()}.json")
    trees_path = os.path.join(base, "trees.parquet")
    probs_dir = os.path.join(base, "probs")
    if not os.path.exists(marker):
        import shutil

        os.makedirs(base, exist_ok=True)
        train_df, test_df = build_training_table(synth_root, config)
        models = train_primitives(train_df, config)
        from ..state.forest import nodes_table

        nt = pa.concat_tables(
            [nodes_table(models[c]["forest"], c) for c in sorted(models)]
        )
        pq.write_table(nt, trees_path)
        train_df.to_parquet(os.path.join(base, "train.parquet"), index=False)
        test_df.to_parquet(os.path.join(base, "test.parquet"), index=False)
        docs = rd.read_parquet(f"{synth_root}/documents")
        geo = spans.geo_obs(docs)
        scored = score(tile_composites(geo, config), models)
        classes = sorted(models)
        # probs/ is a multi-file parquet DIRECTORY the reader globs: a
        # crashed or stale-config run must never leave extra part files
        # that read_parquet would silently merge.  Write to a process-
        # unique temp dir, clear any stale dir, then rename atomically —
        # the dir either has exactly this run's parts or doesn't exist
        # (and the marker is written only after the rename).
        tmp_dir = f"{probs_dir}.tmp.{os.getpid()}"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        scored.select_columns(
            ["tile_id", "year"]
            + [f"prob_{c}" for c in classes]
            + ["LANDCOVER_pred"]
        ).write_parquet(tmp_dir)
        # the artifact paths are config-shared (the SQL oracles address
        # them statically), so a marker for a DIFFERENT config becomes a
        # lie the moment the old probs dir goes away — drop stale markers
        # BEFORE touching probs_dir: a crash after the rename must not
        # leave another config's marker pointing at this config's data
        import glob as _glob

        for m in _glob.glob(os.path.join(base, "done-*.json")):
            if m != marker:
                os.remove(m)
        shutil.rmtree(probs_dir, ignore_errors=True)
        os.rename(tmp_dir, probs_dir)
        with open(marker, "w") as f:
            json.dump({"config": config.config_hash()}, f)
    else:
        train_df = pd.read_parquet(os.path.join(base, "train.parquet"))
        test_df = pd.read_parquet(os.path.join(base, "test.parquet"))
        models = train_primitives(train_df, config)
    out = {
        "models": models,
        "trees_path": trees_path,
        "probs_dir": probs_dir,
        "train": train_df,
        "test": test_df,
    }
    _RF_MEMO[key] = out
    return out


def confusion_report(truth: np.ndarray, pred: np.ndarray) -> dict:
    """Confusion matrix + per-class producer/user accuracy + overall metrics
    (src/misc/05accuracy.py:89-141 semantics, computed driver-side)."""
    classes = sorted(CLASSES)
    k = len(classes)
    cm = np.zeros((k, k), dtype=np.int64)
    cidx = {c: i for i, c in enumerate(classes)}
    for t, p in zip(truth, pred):
        cm[cidx[int(t)], cidx[int(p)]] += 1
    total = cm.sum()
    overall = np.trace(cm) / total if total else float("nan")
    with np.errstate(divide="ignore", invalid="ignore"):
        producers = np.diag(cm) / cm.sum(axis=1)  # omission complement
        users = np.diag(cm) / cm.sum(axis=0)  # commission complement
        f1 = 2 * producers * users / (producers + users)
    return {
        "classes": classes,
        "matrix": cm,
        "overall_accuracy": float(overall),
        "producers_accuracy": producers,
        "users_accuracy": users,
        "f1": f1,
    }


AUC_SCORE_SCALE = 1 << 12  # pq share → score granularity (int64-safe: pq ≲ 2^45)


def auc_from_histogram(
    s: np.ndarray, n_pos: np.ndarray, n_neg: np.ndarray
) -> tuple[int, int]:
    """Exact Mann-Whitney AUC from a (score → pos/neg count) histogram.

    Returns integer ``(auc_num, auc_den)`` with AUC = num/den and the
    standard tie convention (a tied pair counts 1/2):

      2U  = Σ_i n_pos_i · (2·cumneg_<i + n_neg_i)       (scores ascending)
      num = 2U,  den = 2·P·N

    Python-int arithmetic so P·N never overflows; the SQL twin replays the
    identical window-sum expression over the same histogram.  The histogram
    itself is the decomposable part (bounded by score granularity, here
    ≤ AUC_SCORE_SCALE+1 rows), so this driver-side final is O(granularity)
    regardless of corpus size.
    """
    # consolidate duplicate score rows first — two rows with the same s are
    # TIES, not an ordering (a raw group-by feed never duplicates, but a
    # concatenation of partial histograms may)
    uniq, inv = np.unique(np.asarray(s), return_inverse=True)
    npos = np.zeros(len(uniq), dtype=object)
    nneg = np.zeros(len(uniq), dtype=object)
    np.add.at(npos, inv, np.asarray(n_pos, dtype=object))
    np.add.at(nneg, inv, np.asarray(n_neg, dtype=object))
    npos = npos.tolist()
    nneg = nneg.tolist()
    num = 0
    cumneg = 0
    for p, n in zip(npos, nneg):
        num += int(p) * (2 * cumneg + int(n))
        cumneg += int(n)
    P = int(sum(npos))
    N = cumneg
    return num, 2 * P * N


AREA_P_SCALE = 1 << 40  # quantization of the Σ_h W_h·p_hj terms
AREA_V_SCALE = 1 << 60  # quantization of the variance terms


def area_estimate_from_confusion(conf: pd.DataFrame) -> pd.DataFrame:
    """Stratified area estimation with 95% CI from a confusion-count table
    (columns LANDCOVER = reference truth, LANDCOVER_pred = map class, n) —
    the reference's final Area Estimation step
    (src/misc/old_README_instructions.md:16-50) in its simple-random-
    sample form: strata are the MAP classes and W_h = n_h/n, so

      p̂_j  = Σ_h W_h · p_hj,   p_hj = n_hj / n_h
      SE_j = √( Σ_h W_h² · p_hj(1−p_hj) / (n_h − 1) )

    Exactness contract (the quantized-rule pattern): each (h, j) term is
    floor(expr · 2⁴⁰) (proportion) / floor(expr · 2⁶⁰) (variance) with a
    pinned double expression order, summed as int64 — order-free and
    replayed term-for-term in SQL.  Outputs both the integer sums (p_q,
    var_q) and the derived doubles (area_share = p_q/2⁴⁰,
    se = √(var_q/2⁶⁰), ci95 = 1.96·se).
    """
    df = conf.copy()
    n_h = df.groupby("LANDCOVER_pred")["n"].transform("sum").to_numpy(np.float64)
    n_tot = float(df["n"].sum())
    nn = df["n"].to_numpy(np.float64)
    w = n_h / n_tot
    p = nn / n_h
    qp = np.floor(w * p * float(AREA_P_SCALE)).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        v = ((((w * w) * p) * (1.0 - p)) / (n_h - 1.0)) * float(AREA_V_SCALE)
    qv = np.where(n_h > 1.0, np.floor(v), 0.0).astype(np.int64)
    out = (
        pd.DataFrame(
            {"LANDCOVER": df["LANDCOVER"].to_numpy(), "qp": qp, "qv": qv}
        )
        .groupby("LANDCOVER", as_index=False)
        .agg(p_q=("qp", "sum"), var_q=("qv", "sum"))
        .sort_values("LANDCOVER")
        .reset_index(drop=True)
    )
    out["area_share"] = out["p_q"].to_numpy(np.float64) / float(AREA_P_SCALE)
    out["se"] = np.sqrt(out["var_q"].to_numpy(np.float64) / float(AREA_V_SCALE))
    out["ci95"] = 1.96 * out["se"].to_numpy(np.float64)
    return out


def area_estimate_sql(conf_sql: str) -> str:
    """Oracle twin of ``area_estimate_from_confusion`` over a confusion CTE
    producing (LANDCOVER, LANDCOVER_pred, n)."""
    sp, sv = float(AREA_P_SCALE), float(AREA_V_SCALE)
    return f"""
        WITH ae_conf AS MATERIALIZED ({conf_sql}),
        ae_tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS n FROM ae_conf),
        ae_h AS (
            SELECT "LANDCOVER_pred" AS h, CAST(SUM(n) AS DOUBLE) AS n_h
            FROM ae_conf GROUP BY 1
        ),
        ae_wp AS (
            SELECT c."LANDCOVER" AS j, b.n_h,
                   b.n_h / t.n AS w,
                   CAST(c.n AS DOUBLE) / b.n_h AS p
            FROM ae_conf c
            JOIN ae_h b ON c."LANDCOVER_pred" = b.h
            CROSS JOIN ae_tot t
        ),
        ae_q AS (
            SELECT j,
                   CAST(floor(w * p * {sp!r}) AS BIGINT) AS qp,
                   CASE WHEN n_h > 1.0
                        THEN CAST(floor(((((w * w) * p) * (1.0 - p))
                                         / (n_h - 1.0)) * {sv!r}) AS BIGINT)
                        ELSE 0 END AS qv
            FROM ae_wp
        ),
        ae_s AS (
            SELECT j AS "LANDCOVER",
                   CAST(SUM(qp) AS BIGINT) AS p_q,
                   CAST(SUM(qv) AS BIGINT) AS var_q
            FROM ae_q GROUP BY 1
        )
        SELECT "LANDCOVER", p_q, var_q,
               CAST(p_q AS DOUBLE) / {sp!r} AS area_share,
               sqrt(CAST(var_q AS DOUBLE) / {sv!r}) AS se,
               1.96 * sqrt(CAST(var_q AS DOUBLE) / {sv!r}) AS ci95
        FROM ae_s"""


# --------------------------------------------- feature relevance (MI)

MI_SCALE = 1 << 40
MI_BINS = 16


def feature_mi(ds, features, label: str = "LANDCOVER", bins: int = MI_BINS):
    """Mutual information I(feature_bin; label) per feature — the
    filter-method feature-relevance ranking a training pipeline runs
    before model fitting (the reference's per-class variable-importance
    analog, src/utils/primitives.py:18-30, computed model-free).

    Pinned rules (identical in SQL): per-feature exact MIN/MAX (order-free,
    no float summation), bin = min(bins-1, floor(((x-m)·16.0)/(M-m)))
    (one IEEE expression), zero-count cells contribute nothing, and each
    cell term quantizes floor((c/n)·ln((n·c)/(cx·cy))·2⁴⁰) → int64 so the
    per-feature sum is order-free and hash-stable.

    Scale shape: phase 1 = decomposable min/max partials (one row per
    feature per batch); phase 2 = (feature, bin, class) counts via in-batch
    Arrow group counts + bucketed combine (≤ |features|·bins·|classes|
    rows); phase 3 = O(cells) driver final.  Three passes, no raw-row
    shuffle.

    Output: (feature, n, mi_q, mi) — one row per feature.
    """
    feats = sorted(features)

    def mm_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "feature": pa.array([], pa.string()),
                    "mn": pa.array([], pa.float64()),
                    "mx": pa.array([], pa.float64()),
                }
            )
        names, mns, mxs = [], [], []
        for f in feats:
            x = t.column(f).to_numpy(zero_copy_only=False)
            names.append(f)
            mns.append(float(np.min(x)))
            mxs.append(float(np.max(x)))
        return pa.table(
            {
                "feature": pa.array(names),
                "mn": pa.array(mns, pa.float64()),
                "mx": pa.array(mxs, pa.float64()),
            }
        )

    mm = (
        ds.map_batches(mm_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("feature")
        .agg(mn=("mn", "min"), mx=("mx", "max"))
    )
    lo = {f: float(mm.loc[f, "mn"]) for f in feats}
    hi = {f: float(mm.loc[f, "mx"]) for f in feats}

    def cnt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "feature": pa.array([], pa.string()),
                    "bin": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        ys = t.column(label).to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for f in feats:
            x = t.column(f).to_numpy(zero_copy_only=False)
            m, M = lo[f], hi[f]
            if M == m:
                b = np.zeros(len(x), np.int64)
            else:
                b = np.minimum(
                    bins - 1,
                    np.floor(((x - m) * float(bins)) / (M - m)).astype(np.int64),
                )
            parts.append(
                pa.table(
                    {
                        "feature": pa.array([f] * len(x)),
                        "bin": pa.array(b),
                        "y": pa.array(ys),
                    }
                )
            )
        g = (
            pa.concat_tables(parts)
            .group_by(["feature", "bin", "y"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["feature", "bin", "y", "c"])

    from ..stages.zonal import bucketed_sum

    cells = bucketed_sum(
        ds.map_batches(cnt, batch_format="pyarrow"),
        ["feature", "bin", "y"],
        ["c"],
    ).to_pandas()  # bounded: ≤ |features|·bins·|classes| rows

    out = []
    for f in feats:
        d = cells[cells["feature"] == f]
        n = int(d["c"].sum())
        cx = d.groupby("bin")["c"].sum()
        cy = d.groupby("y")["c"].sum()
        c = d["c"].to_numpy(np.int64)
        a = c.astype(np.float64) / float(n)
        num = (n * c).astype(np.float64)
        den = (
            cx.loc[d["bin"]].to_numpy(np.int64)
            * cy.loc[d["y"]].to_numpy(np.int64)
        ).astype(np.float64)
        tq = np.floor((a * np.log(num / den)) * float(MI_SCALE)).astype(np.int64)
        mi_q = int(tq.sum())
        out.append((f, n, mi_q, mi_q / float(MI_SCALE)))
    return pd.DataFrame(out, columns=["feature", "n", "mi_q", "mi"])


def feature_mi_sql(feats_sql: str, features, label: str = "LANDCOVER",
                   bins: int = MI_BINS) -> str:
    """Oracle twin of :func:`feature_mi` over a subquery exposing the
    feature columns + the label: identical bin expression, grouped counts,
    the identical quantized ln term, per-feature integer sum."""
    longf = " UNION ALL ".join(
        f"SELECT '{f}' AS feature, CAST(\"{f}\" AS DOUBLE) AS x, "
        f'CAST("{label}" AS BIGINT) AS y FROM mi_in'
        for f in sorted(features)
    )
    return f"""
        mi_in AS MATERIALIZED ({feats_sql}),
        mi_f AS ({longf}),
        mi_mm AS (
            SELECT feature, MIN(x) AS m, MAX(x) AS mx FROM mi_f GROUP BY feature
        ),
        mi_b AS (
            SELECT f.feature,
                   CASE WHEN mm.mx = mm.m THEN 0
                        ELSE LEAST({bins - 1}, CAST(floor(
                            ((f.x - mm.m) * {float(bins)!r}) / (mm.mx - mm.m)
                        ) AS BIGINT)) END AS bin,
                   f.y
            FROM mi_f f JOIN mi_mm mm USING (feature)
        ),
        mi_nxy AS (
            SELECT feature, bin, y, CAST(COUNT(*) AS BIGINT) AS c
            FROM mi_b GROUP BY 1, 2, 3
        ),
        mi_nx AS (
            SELECT feature, bin, CAST(SUM(c) AS BIGINT) AS cx
            FROM mi_nxy GROUP BY 1, 2
        ),
        mi_ny AS (
            SELECT feature, y, CAST(SUM(c) AS BIGINT) AS cy
            FROM mi_nxy GROUP BY 1, 2
        ),
        mi_n AS (
            SELECT feature, CAST(SUM(c) AS BIGINT) AS n
            FROM mi_nxy GROUP BY 1
        ),
        mi_t AS (
            SELECT x.feature, n.n,
                   CAST(floor(
                       ((CAST(x.c AS DOUBLE) / CAST(n.n AS DOUBLE))
                        * ln(CAST(n.n * x.c AS DOUBLE)
                             / CAST(nx.cx * ny.cy AS DOUBLE)))
                       * {float(MI_SCALE)!r}
                   ) AS BIGINT) AS tq
            FROM mi_nxy x
            JOIN mi_nx nx ON nx.feature = x.feature AND nx.bin = x.bin
            JOIN mi_ny ny ON ny.feature = x.feature AND ny.y = x.y
            JOIN mi_n n ON n.feature = x.feature
        )
        SELECT feature, n, CAST(SUM(tq) AS BIGINT) AS mi_q,
               CAST(SUM(tq) AS DOUBLE) / {float(MI_SCALE)!r} AS mi
        FROM mi_t GROUP BY feature, n"""
