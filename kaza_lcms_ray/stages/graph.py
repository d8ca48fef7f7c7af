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
