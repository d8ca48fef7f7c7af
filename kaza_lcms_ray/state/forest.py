"""Deterministic numpy random forest (binary primitives, PROBABILITY mode).

The engine analog of the reference's smileRandomForest configuration
(src/utils/primitives.py:69-97): numberOfTrees=100, minLeafPopulation=1,
bagFraction=0.7, fixed seed (51515), output mode PROBABILITY, one binary
model per class ("primitive"), plus OOB error and variable importance
(model.explain() analog) and top-k feature selection + retrain
(gettop20, src/utils/primitives.py:49-59,86-92).

Everything is seeded splitmix64 — bootstrap rows and feature subsets are
pure functions of (seed, class, tree) — so training is bit-reproducible on
any machine; scoring is a vectorized iterative tree walk (no Python
per-row recursion).  Training runs driver-side on the collected training
table (small next to the document corpus); the trained forest is broadcast
to the scorer actor pool.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .hashing import RF_SEED, hash_key

# leaf-probability quantization for the exact SQL scoring replay: 2^-40
# resolution, and 100 summed leaves × 2^40 stays far inside int64
QUANT_BITS = 40


@dataclass
class Tree:
    feature: np.ndarray  # int32, -1 for leaf
    thresh: np.ndarray  # float64
    left: np.ndarray  # int32
    right: np.ndarray  # int32
    value: np.ndarray  # float64 leaf probability of class 1


@dataclass
class Forest:
    trees: list[Tree] = field(default_factory=list)
    oob_error: float = float("nan")
    importance: np.ndarray | None = None  # gini importance per feature
    feature_names: list[str] | None = None

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        """Mean of per-tree leaf probabilities (PROBABILITY output mode)."""
        n = X.shape[0]
        acc = np.zeros(n)
        for tr in self.trees:
            acc += tr.value[self._leaf_nodes(tr, X)]
        return acc / max(1, len(self.trees))

    @staticmethod
    def _leaf_nodes(tr: Tree, X: np.ndarray) -> np.ndarray:
        """Vectorized iterative walk → leaf node index per row."""
        node = np.zeros(X.shape[0], dtype=np.int32)
        active = tr.feature[node] >= 0
        while active.any():
            f = tr.feature[node[active]]
            go_left = X[active, f] <= tr.thresh[node[active]]
            node[active] = np.where(
                go_left, tr.left[node[active]], tr.right[node[active]]
            )
            active = tr.feature[node] >= 0
        return node

    def predict_quantized(self, X: np.ndarray, bits: int = QUANT_BITS) -> np.ndarray:
        """Exact replayable score: Σ_trees rint(leaf_value·2^bits) as int64.

        Integer addition is order-free, so a SQL replay of the identical
        tree walk (nodes exported by ``nodes_table``) sums to the exact
        same int64 no matter how the engine or DuckDB orders the trees —
        unlike the float mean of ``predict_proba``, whose last bit depends
        on accumulation order.
        """
        scale = float(2**bits)
        acc = np.zeros(X.shape[0], dtype=np.int64)
        for tr in self.trees:
            leaf = self._leaf_nodes(tr, X)
            acc += np.rint(tr.value[leaf] * scale).astype(np.int64)
        return acc


def _best_split(X, y, feat_idx, min_leaf: int):
    """Best (feature, threshold) by weighted gini; deterministic tie-break
    (first feature in feat_idx order, smallest threshold)."""
    n = y.shape[0]
    best = (np.inf, -1, 0.0)
    for f in feat_idx:
        order = np.argsort(X[:, f], kind="stable")
        xs, ys = X[order, f], y[order]
        csum = np.cumsum(ys)
        total = csum[-1]
        nl = np.arange(1, n)
        pl = csum[:-1] / nl
        nr = n - nl
        pr = (total - csum[:-1]) / nr
        gini = nl * 2 * pl * (1 - pl) + nr * 2 * pr * (1 - pr)
        valid = xs[1:] != xs[:-1]
        valid &= (nl >= min_leaf) & (nr >= min_leaf)
        if not valid.any():
            continue
        cand = np.nonzero(valid)[0]
        gbest = cand[np.argmin(gini[cand])]  # first min → smallest threshold
        if gini[gbest] < best[0]:
            thresh = (xs[gbest] + xs[gbest + 1]) / 2.0
            best = (gini[gbest], f, thresh)
    return best


def _grow(X, y, rows, feat_count, key, min_leaf, max_depth, nodes, imp=None):
    """Recursive deterministic CART; returns node index.  ``imp`` (float64
    per-feature array) accumulates the weighted Gini impurity DECREASE of
    every split — the variable-importance measure of the reference's
    explain() (src/utils/primitives.py:18-30), not a raw split count."""
    idx = len(nodes["feature"])
    for c in nodes.values():
        c.append(0)
    ysub = y[rows]
    p1 = float(ysub.mean()) if ysub.shape[0] else 0.0
    if (
        ysub.shape[0] < 2 * min_leaf
        or max_depth <= 0
        or p1 == 0.0
        or p1 == 1.0
    ):
        nodes["feature"][idx] = -1
        nodes["value"][idx] = p1
        return idx
    # deterministic feature subsample: sqrt(F) features chosen by seeded hash
    m = max(1, int(np.sqrt(X.shape[1])))
    scores = hash_key(key, np.arange(X.shape[1], dtype=np.int64))
    feat_idx = np.argsort(scores, kind="stable")[:m]
    feat_idx = np.sort(feat_idx)
    g, f, thr = _best_split(X[rows], ysub, feat_idx, min_leaf)
    if f < 0:
        nodes["feature"][idx] = -1
        nodes["value"][idx] = p1
        return idx
    if imp is not None:  # weighted impurity decrease: parent − Σ children
        imp[f] += ysub.shape[0] * 2 * p1 * (1 - p1) - g
    go_left = X[rows, f] <= thr
    l = _grow(X, y, rows[go_left], feat_count, hash_key(key, 1), min_leaf, max_depth - 1, nodes, imp)
    r = _grow(X, y, rows[~go_left], feat_count, hash_key(key, 2), min_leaf, max_depth - 1, nodes, imp)
    nodes["feature"][idx] = f
    nodes["thresh"][idx] = thr
    nodes["left"][idx] = l
    nodes["right"][idx] = r
    return idx


def train_forest(
    X: np.ndarray,
    y: np.ndarray,
    n_trees: int = 100,
    bag_fraction: float = 0.7,
    min_leaf: int = 1,
    max_depth: int = 12,
    seed: int = RF_SEED,
    class_tag: int = 0,
    feature_names: list[str] | None = None,
) -> Forest:
    """Binary forest with OOB error + gini importance (explain() analog)."""
    n, F = X.shape
    forest = Forest(feature_names=feature_names)
    oob_votes = np.zeros(n)
    oob_count = np.zeros(n)
    importance = np.zeros(F)
    for t in range(n_trees):
        tree_key = hash_key(seed, class_tag, t)
        # bagFraction=0.7 without replacement (smile semantics): the
        # bag_fraction·n rows with smallest per-(tree,row) hash
        row_scores = hash_key(tree_key, np.arange(n, dtype=np.int64))
        k = max(1, int(round(bag_fraction * n)))
        bag = np.sort(np.argsort(row_scores, kind="stable")[:k])
        oob = np.setdiff1d(np.arange(n), bag, assume_unique=True)
        nodes = {
            "feature": [], "thresh": [], "left": [], "right": [], "value": [],
        }
        _grow(X, y, bag, F, tree_key, min_leaf, max_depth, nodes, importance)
        tr = Tree(
            np.asarray(nodes["feature"], dtype=np.int32),
            np.asarray(nodes["thresh"], dtype=np.float64),
            np.asarray(nodes["left"], dtype=np.int32),
            np.asarray(nodes["right"], dtype=np.int32),
            np.asarray(nodes["value"], dtype=np.float64),
        )
        forest.trees.append(tr)
        if oob.shape[0]:
            single = Forest(trees=[tr])
            oob_votes[oob] += single.predict_proba(X[oob])
            oob_count[oob] += 1
    seen = oob_count > 0
    if seen.any():
        pred = (oob_votes[seen] / oob_count[seen]) >= 0.5
        forest.oob_error = float((pred != (y[seen] > 0)).mean())
    forest.importance = importance
    return forest


def nodes_table(forest: Forest, class_id: int, bits: int = QUANT_BITS):
    """Flatten a trained forest into a relational node table for the SQL
    scoring oracle (the model-export analog of the reference's per-class
    asset exports, src/utils/primitives.py:33-46).

    Columns: class, tree, node, feature_name ('' at leaves), thresh, left,
    right, value_q (= rint(leaf_value·2^bits), int64 — see
    ``predict_quantized``).  Internal nodes carry value_q = 0.
    """
    import pyarrow as pa

    names = forest.feature_names
    scale = float(2**bits)
    cols = {k: [] for k in
            ("class", "tree", "node", "feature_name", "thresh", "left",
             "right", "value_q")}
    for t, tr in enumerate(forest.trees):
        n = tr.feature.shape[0]
        cols["class"].extend([class_id] * n)
        cols["tree"].extend([t] * n)
        cols["node"].extend(range(n))
        is_leaf = tr.feature < 0
        cols["feature_name"].extend(
            "" if is_leaf[i] else names[tr.feature[i]] for i in range(n)
        )
        cols["thresh"].extend(np.where(is_leaf, 0.0, tr.thresh).tolist())
        cols["left"].extend(tr.left.tolist())
        cols["right"].extend(tr.right.tolist())
        cols["value_q"].extend(
            np.where(is_leaf, np.rint(tr.value * scale), 0.0)
            .astype(np.int64)
            .tolist()
        )
    return pa.table(
        {
            "class": pa.array(cols["class"], type=pa.int32()),
            "tree": pa.array(cols["tree"], type=pa.int32()),
            "node": pa.array(cols["node"], type=pa.int32()),
            "feature_name": pa.array(cols["feature_name"], type=pa.string()),
            "thresh": pa.array(cols["thresh"], type=pa.float64()),
            "left": pa.array(cols["left"], type=pa.int32()),
            "right": pa.array(cols["right"], type=pa.int32()),
            "value_q": pa.array(cols["value_q"], type=pa.int64()),
        }
    )


def top_k_features(forest: Forest, k: int = 20) -> list[int]:
    """Indices of the k most important features (ties → lower index), the
    gettop20 analog (src/utils/primitives.py:49-59)."""
    imp = forest.importance
    order = np.lexsort((np.arange(imp.shape[0]), -imp))
    return sorted(order[:k].tolist())
