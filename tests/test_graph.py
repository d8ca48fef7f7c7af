"""Integer PageRank: hand-graph values, SQL replay, reshard invariance."""

import duckdb
import numpy as np
import pandas as pd

from kaza_lcms_ray.stages import graph


def _edges():
    return pd.DataFrame({"src": [1, 1, 2, 3, 3, 4, 5], "dst": [2, 3, 3, 1, 4, 1, 1]})


def test_pagerank_sql_replay_and_reshard(ray_session):
    import ray.data as rd

    edges = _edges()
    out = (
        graph.pagerank(rd.from_pandas(edges), n_iters=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ed", edges)
    want = (
        con.execute(graph.pagerank_sql("SELECT src, dst FROM ed", n_iters=3))
        .fetchdf()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(out["node"]) == list(want["node"])
    assert list(out["rank"]) == list(want["rank"])
    # node 5 (no in-links) bottoms out at teleport-only mass; well-linked
    # nodes (1, 3) rank strictly above it
    r = dict(zip(out["node"], out["rank"]))
    assert r[5] == min(r.values())
    assert r[1] > r[5] and r[3] > r[5]
    teleport = (graph.PR_SCALE * 15) // 100
    assert r[5] == teleport

    out2 = (
        graph.pagerank(rd.from_pandas(edges).repartition(4), n_iters=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_pagerank_hand_recurrence(ray_session):
    """One iteration by hand: r1(v) = teleport + 85*sum(floor(r0/outdeg))//100."""
    import ray.data as rd

    edges = _edges()
    out = (
        graph.pagerank(rd.from_pandas(edges), n_iters=1)
        .to_pandas()
        .set_index("node")["rank"]
    )
    S, tp = graph.PR_SCALE, (graph.PR_SCALE * 15) // 100
    outdeg = {1: 2, 2: 1, 3: 2, 4: 1, 5: 1}
    inlinks = {1: [3, 4, 5], 2: [1], 3: [1, 2], 4: [3], 5: []}
    for v, srcs in inlinks.items():
        want = tp + (85 * sum(S // outdeg[u] for u in srcs)) // 100
        assert out[v] == want
