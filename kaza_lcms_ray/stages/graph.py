"""Graph analytics over similarity graphs: integer-quantized PageRank.

The kNN graph (`ann.knn_join`) induces a directed similarity graph over
the corpus; PageRank over it ranks "central" documents — the graph-based
importance / curation signal (cf. the connectivity analyses run over
web-crawl link graphs).  Reference analog: the per-class iterative
discipline of /root/reference/src/utils/primitives.py (seeded, replayable
artifacts per round) applied to an iterative graph algorithm.

Every iteration is EXACTLY replayable in SQL (the kmeans pattern,
stages/cluster.py): ranks are int64 at 2^30 scale, contributions are
integer floor divisions, the damped sum is one integer expression —
deterministic under any combine order, unrolled as one CTE per
iteration on the oracle side.

Scale shape per iteration: attach the rank onto each edge by src (the
size-guarded broadcast / hash-join of ``joins.attach_dim`` — the rank
table is one skinny row per node), one stateless map emits (dst,
contribution) rows, the hash-bucketed integer sum reduces them, and a
zero-contribution row unioned per node keeps teleport-only nodes in the
table without an outer join.  Nothing driver-side grows with the graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PR_SCALE = 1 << 30  # initial rank per node; int64-safe for ≤ 2^32 in-edges
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio


def pagerank(
    edges,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
):
    """Simplified integer PageRank over a directed edge Dataset.

    r_0(v) = 2^30 for every node (relative ranks — no normalization);
    each round every node sends floor(r/outdeg) along each out-edge and
    r_{t+1}(v) = floor(15·2^30/100) + floor(85·Σ_in contributions/100).
    Dangling mass vanishes (the standard simplified formulation) and
    ranks stay comparable across nodes.  All arithmetic is int64 floor
    division — bit-stable at any parallelism and replayed exactly by
    ``pagerank_sql``.

    Returns Dataset[node, rank] (int64)."""
    from ..stages.joins import attach_dim, distinct
    from ..stages.zonal import bucketed_sum

    proj = edges.select_columns([src_col, dst_col])

    # node table: distinct endpoints (skinny two-phase distinct)
    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"node": t.column(src_col)}),
                pa.table({"node": t.column(dst_col)}),
            ]
        )

    nodes = distinct(
        proj.map_batches(endpoints, batch_format="pyarrow"), ["node"]
    ).materialize()
    n_nodes = nodes.count()

    # out-degree per src (skinny integer reduce)
    def deg_partial(t: pa.Table) -> pa.Table:
        out = t.group_by([src_col]).aggregate([([], "count_all")])
        return out.rename_columns(["node", "outdeg"])

    outdeg = bucketed_sum(
        proj.map_batches(deg_partial, batch_format="pyarrow"), ["node"], ["outdeg"]
    )
    edges_deg = attach_dim(
        proj, outdeg, src_col, "node", ["outdeg"], dim_rows=n_nodes
    ).materialize()

    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN

    def init_rank(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "rank": pa.array(np.full(len(t), PR_SCALE, dtype=np.int64)),
            }
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow")
    for _ in range(n_iters):
        ranked_edges = attach_dim(
            edges_deg, ranks, src_col, "node", ["rank"], dim_rows=n_nodes
        )

        def contrib(t: pa.Table) -> pa.Table:
            r = t.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
            d = t.column("outdeg").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"node": t.column(dst_col), "c": pa.array(r // d)}
            )

        def zero_row(t: pa.Table) -> pa.Table:
            # teleport-only nodes stay present without an outer join
            return pa.table(
                {
                    "node": t.column("node"),
                    "c": pa.array(np.zeros(len(t), dtype=np.int64)),
                }
            )

        sums = bucketed_sum(
            ranked_edges.map_batches(contrib, batch_format="pyarrow").union(
                nodes.map_batches(zero_row, batch_format="pyarrow")
            ),
            ["node"],
            ["c"],
        )

        def damp(t: pa.Table) -> pa.Table:
            c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            r = teleport + (PR_DAMP_NUM * c) // PR_DAMP_DEN
            return pa.table({"node": t.column("node"), "rank": pa.array(r)})

        ranks = sums.map_batches(damp, batch_format="pyarrow").materialize()
    return ranks


def pagerank_sql(
    edges_sql: str,
    n_iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> str:
    """Oracle: the identical integer recurrence unrolled, one CTE per
    iteration (the kmeans-replay pattern)."""
    teleport = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    parts = [
        f"pr_e AS MATERIALIZED (SELECT {src_col} AS src, {dst_col} AS dst FROM ({edges_sql}))",
        """pr_nodes AS (SELECT DISTINCT node FROM (
               SELECT src AS node FROM pr_e UNION ALL SELECT dst FROM pr_e))""",
        """pr_deg AS (SELECT src, COUNT(*) AS outdeg FROM pr_e GROUP BY src)""",
        f"pr_r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS r FROM pr_nodes)",
    ]
    for t in range(n_iters):
        parts.append(
            f"""pr_s{t} AS (
                SELECT e.dst AS node, SUM(r.r // d.outdeg) AS c
                FROM pr_e e JOIN pr_deg d ON d.src = e.src
                       JOIN pr_r{t} r ON r.node = e.src
                GROUP BY e.dst
            )"""
        )
        parts.append(
            f"""pr_r{t + 1} AS (
                SELECT n.node,
                       CAST({teleport} + ({PR_DAMP_NUM} * COALESCE(s.c, 0))
                            // {PR_DAMP_DEN} AS BIGINT) AS r
                FROM pr_nodes n LEFT JOIN pr_s{t} s ON s.node = n.node
            )"""
        )
    ctes = ",\n        ".join(parts)
    return f"""
        WITH {ctes}
        SELECT node, r AS rank FROM pr_r{n_iters}"""


def triangle_counts(edges, src_col: str = "src", dst_col: str = "dst"):
    """Per-node triangle counts over the undirected simple graph induced
    by a directed edge Dataset — the clustering/community-density signal
    (triangle-rich neighborhoods in a near-dup or kNN graph flag template
    farms and boilerplate clusters).

    Compact-forward with degree ordering, each stage a bounded exchange:

    1. canonicalize: (min, max) per edge, self-loops dropped, distinct via
       the bucketed pair-dedupe (``dedup.exact_pairs_distinct``).
    2. degrees: skinny (node, deg) integer reduce; attached to both
       endpoints through the size-guarded ``attach_dim``.
    3. orient every edge from the (deg, id)-smaller endpoint — a total
       order, so each triangle has exactly ONE vertex with out-edges to
       the other two, and max out-degree is O(√m) whatever the skew (the
       hub that breaks naive node-iterator counting).
    4. wedges: bucket oriented edges by source hash, pandas self-merge
       per bucket (C-speed, no Python loop), emit (v, w, u) with v < w.
    5. closure: hash-join wedges against canonical edges on (v, w); every
       match is one triangle, counted once.
    6. per-node counts: each triangle contributes 1 to u, v, w — the
       bucketed integer sum.

    Returns Dataset[node, n_tri] (int64) for nodes in ≥ 1 triangle."""
    import pandas as pd

    from ..runtime import cluster_cpus, join_partitions
    from ..stages.dedup import exact_pairs_distinct
    from ..stages.joins import attach_dim, distinct
    from ..stages.zonal import bucketed_sum
    from ..state.hashing import hash_key

    proj = edges.select_columns([src_col, dst_col])

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {"a": pa.array(np.minimum(a, b)), "b": pa.array(np.maximum(a, b))}
        )

    und = exact_pairs_distinct(
        proj.map_batches(canon, batch_format="pyarrow")
    ).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [pa.table({"node": t.column("a")}), pa.table({"node": t.column("b")})]
        )

    def deg_partial(t: pa.Table) -> pa.Table:
        out = t.group_by(["node"]).aggregate([([], "count_all")])
        return out.rename_columns(["node", "deg"])

    deg = bucketed_sum(
        und.map_batches(endpoints, batch_format="pyarrow").map_batches(
            deg_partial, batch_format="pyarrow"
        ),
        ["node"],
        ["deg"],
    ).materialize()
    n_nodes = deg.count()

    with_da = attach_dim(und, deg, "a", "node", ["deg"], dim_rows=n_nodes)

    def r1(t: pa.Table) -> pa.Table:
        # select-by-name (not positional rename): the attach_dim hash-join
        # fallback can carry the dim key column through
        return pa.table(
            {"a": t.column("a"), "b": t.column("b"), "deg_a": t.column("deg")}
        )

    with_da = with_da.map_batches(r1, batch_format="pyarrow")
    with_dab = attach_dim(with_da, deg, "b", "node", ["deg"], dim_rows=n_nodes)

    nb = max(8, cluster_cpus() * 2)

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        da = t.column("deg_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        bucket = (hash_key(src.astype(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table(
            {"src": pa.array(src), "dst": pa.array(dst), "bucket": pa.array(bucket)}
        )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["src", "dst"]].merge(g[["src", "dst"]], on="src")
        m = m[m["dst_x"] < m["dst_y"]]
        return pd.DataFrame(
            {"v": m["dst_x"], "w": m["dst_y"], "u": m["src"]}
        )

    wedge_ds = (
        with_dab.map_batches(orient, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedges, batch_format="pandas")
    )

    n_wedges = wedge_ds.materialize().count()
    if n_wedges == 0:
        return ray_empty_node_table()
    np_parts = 1 if n_wedges < 10_000 else join_partitions(rows_hint=n_wedges)
    tri = wedge_ds.join(
        und,
        join_type="inner",
        num_partitions=np_parts,
        on=("v", "w"),
        right_on=("a", "b"),
    )

    def tri_nodes(t: pa.Table) -> pa.Table:
        ones = pa.array(np.ones(len(t), dtype=np.int64))
        return pa.concat_tables(
            [
                pa.table({"node": t.column("u"), "n_tri": ones}),
                pa.table({"node": t.column("v"), "n_tri": ones}),
                pa.table({"node": t.column("w"), "n_tri": ones}),
            ]
        )

    return bucketed_sum(
        tri.map_batches(tri_nodes, batch_format="pyarrow"), ["node"], ["n_tri"]
    )


def ray_empty_node_table():
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"node": pa.array([], pa.int64()), "n_tri": pa.array([], pa.int64())})
    )


def triangle_counts_sql(edges_sql: str, src_col: str = "src", dst_col: str = "dst") -> str:
    """Oracle: canonical x<y<z triple enumeration over the distinct
    undirected edge set — counts each triangle once, so per-node counts
    match the engine's degree-ordered wedge closure exactly."""
    return f"""
        WITH tr_und AS MATERIALIZED (
            SELECT DISTINCT LEAST({src_col}, {dst_col}) AS u,
                            GREATEST({src_col}, {dst_col}) AS v
            FROM ({edges_sql}) WHERE {src_col} <> {dst_col}
        ),
        tr AS (
            SELECT a.u AS x, a.v AS y, b.v AS z
            FROM tr_und a
            JOIN tr_und b ON b.u = a.v
            JOIN tr_und c ON c.u = a.u AND c.v = b.v
        )
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
            SELECT x AS node FROM tr
            UNION ALL SELECT y FROM tr
            UNION ALL SELECT z FROM tr
        ) GROUP BY node"""


def assortativity(edges, src_col: str = "src", dst_col: str = "dst"):
    """Degree assortativity coefficient of the undirected simple graph —
    Newman's r (Pearson correlation of endpoint degrees over edges,
    each undirected edge counted in both orientations): positive =
    hubs link hubs (social-network shape), negative = hubs link leaves
    (star/template shape) — the one-number wiring diagnostic for a kNN /
    near-dup / co-visitation graph.

    Decomposable and pinned: canonical distinct edges → skinny integer
    degree reduce → size-guarded degree attach on both endpoints →
    per-batch INTEGER sums M = 2m, Σd, Σd², Σ(d_u·d_v)·2 (int64 holds
    while Σd² ≤ 9·10¹⁸ — kNN-style bounded-degree graphs at any corpus
    scale; a hub of degree 10⁹ would need quantization first) → ONE
    pinned (sxy/M − μ²)/(sxx/M − μ²) double chain.

    Output: ONE row (m_edges:int64, s_x:int64, s_xx:int64, s_xy:int64,
    r:f64); empty when the degree variance is zero (r undefined).
    """
    import ray.data as rd

    from ray.data.aggregate import Sum

    from ..stages.dedup import exact_pairs_distinct
    from ..stages.joins import attach_dim
    from ..stages.zonal import bucketed_sum

    proj = edges.select_columns([src_col, dst_col])

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {"a": pa.array(np.minimum(a, b)), "b": pa.array(np.maximum(a, b))}
        )

    und = exact_pairs_distinct(
        proj.map_batches(canon, batch_format="pyarrow")
    ).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [pa.table({"node": t.column("a")}), pa.table({"node": t.column("b")})]
        )

    def deg_partial(t: pa.Table) -> pa.Table:
        out = t.group_by(["node"]).aggregate([([], "count_all")])
        return out.rename_columns(["node", "deg"])

    deg = bucketed_sum(
        und.map_batches(endpoints, batch_format="pyarrow").map_batches(
            deg_partial, batch_format="pyarrow"
        ),
        ["node"],
        ["deg"],
    ).materialize()
    n_nodes = deg.count()

    wa = attach_dim(und, deg, "a", "node", ["deg"], dim_rows=n_nodes)

    def r1(t: pa.Table) -> pa.Table:
        return pa.table(
            {"a": t.column("a"), "b": t.column("b"), "deg_a": t.column("deg")}
        )

    wab = attach_dim(
        wa.map_batches(r1, batch_format="pyarrow"), deg, "b", "node", ["deg"],
        dim_rows=n_nodes,
    )

    def sums(t: pa.Table) -> pa.Table:
        da = t.column("deg_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "m2": pa.array([np.int64(2 * len(da))], pa.int64()),
                "s_x": pa.array([int((da + db).sum())], pa.int64()),
                "s_xx": pa.array([int((da * da + db * db).sum())], pa.int64()),
                "s_xy": pa.array([int(2 * (da * db).sum())], pa.int64()),
            }
        )

    agg = (
        wab.map_batches(sums, batch_format="pyarrow")
        .groupby(None)
        .aggregate(
            Sum("m2", alias_name="m2"), Sum("s_x", alias_name="s_x"),
            Sum("s_xx", alias_name="s_xx"), Sum("s_xy", alias_name="s_xy"),
        )
        .to_pandas()
    )
    empty = pa.table(
        {
            "m_edges": pa.array([], pa.int64()),
            "s_x": pa.array([], pa.int64()),
            "s_xx": pa.array([], pa.int64()),
            "s_xy": pa.array([], pa.int64()),
            "r": pa.array([], pa.float64()),
        }
    )
    if len(agg) == 0 or int(agg["m2"].iloc[0]) == 0:
        return rd.from_arrow(empty)
    M = float(int(agg["m2"].iloc[0]))
    sx = float(int(agg["s_x"].iloc[0]))
    sxx = float(int(agg["s_xx"].iloc[0]))
    sxy = float(int(agg["s_xy"].iloc[0]))
    mu = sx / M
    den = sxx / M - mu * mu
    if den <= 0.0:
        return rd.from_arrow(empty)
    r = (sxy / M - mu * mu) / den
    return rd.from_arrow(
        pa.table(
            {
                "m_edges": pa.array([np.int64(int(agg["m2"].iloc[0]) // 2)]),
                "s_x": pa.array([np.int64(int(agg["s_x"].iloc[0]))]),
                "s_xx": pa.array([np.int64(int(agg["s_xx"].iloc[0]))]),
                "s_xy": pa.array([np.int64(int(agg["s_xy"].iloc[0]))]),
                "r": pa.array([r], pa.float64()),
            }
        )
    )


def assortativity_sql(edges_sql: str, src_col: str = "src", dst_col: str = "dst") -> str:
    """Oracle twin of :func:`assortativity`: distinct canonical edges,
    per-node degrees, the same four integer sums over both orientations,
    the identical pinned (sxy/M − μ²)/(sxx/M − μ²) chain (and the same
    zero-variance drop rule)."""
    return f"""
        WITH as_und AS MATERIALIZED (
            SELECT DISTINCT LEAST({src_col}, {dst_col}) AS a,
                            GREATEST({src_col}, {dst_col}) AS b
            FROM ({edges_sql}) WHERE {src_col} <> {dst_col}
        ),
        as_deg AS (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                SELECT a AS node FROM as_und
                UNION ALL SELECT b FROM as_und
            ) GROUP BY node
        ),
        as_s AS (
            SELECT CAST(2 * COUNT(*) AS BIGINT) AS m2,
                   CAST(SUM(da.deg + db.deg) AS BIGINT) AS s_x,
                   CAST(SUM(da.deg * da.deg + db.deg * db.deg) AS BIGINT)
                       AS s_xx,
                   CAST(SUM(2 * (da.deg * db.deg)) AS BIGINT) AS s_xy
            FROM as_und e
            JOIN as_deg da ON da.node = e.a
            JOIN as_deg db ON db.node = e.b
        ),
        as_mu AS (
            SELECT *, CAST(s_x AS DOUBLE) / CAST(m2 AS DOUBLE) AS mu FROM as_s
        )
        SELECT CAST(m2 // 2 AS BIGINT) AS m_edges, s_x, s_xx, s_xy,
               (CAST(s_xy AS DOUBLE) / CAST(m2 AS DOUBLE) - mu * mu)
                   / (CAST(s_xx AS DOUBLE) / CAST(m2 AS DOUBLE) - mu * mu) AS r
        FROM as_mu
        WHERE m2 > 0
          AND (CAST(s_xx AS DOUBLE) / CAST(m2 AS DOUBLE) - mu * mu) > 0.0"""
