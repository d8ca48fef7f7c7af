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


def test_triangle_counts_brute_force_and_skew(ray_session):
    """triangle_counts vs brute-force triple enumeration on a random
    directed graph (duplicate/reverse/self edges included), plus a hub
    star+cycle case where naive node-iterator counting would blow up the
    hub's wedge list; reshard-invariant."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.graph import triangle_counts

    rng = np.random.RandomState(7)
    n = 40
    src = rng.randint(0, n, 300)
    dst = rng.randint(0, n, 300)

    def brute(src, dst):
        und = {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist()) if a != b}
        nodes = sorted({x for e in und for x in e})
        cnt = {x: 0 for x in nodes}
        for x, y, z in itertools.combinations(nodes, 3):
            if (x, y) in und and (x, z) in und and (y, z) in und:
                cnt[x] += 1
                cnt[y] += 1
                cnt[z] += 1
        return {k: v for k, v in cnt.items() if v > 0}

    expect = brute(src, dst)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    for d in (ds, ds.repartition(9)):
        out = triangle_counts(d).to_pandas()
        got = dict(zip(out["node"], out["n_tri"]))
        assert got == expect

    # hub 0 connects to everyone; triangle only where spokes also connect
    hub_src = np.array([0] * 10 + [1, 3], dtype=np.int64)
    hub_dst = np.array(list(range(1, 11)) + [2, 4], dtype=np.int64)
    out = triangle_counts(
        rd.from_arrow(pa.table({"src": hub_src, "dst": hub_dst}))
    ).to_pandas()
    got = dict(zip(out["node"], out["n_tri"]))
    assert got == {0: 2, 1: 1, 2: 1, 3: 1, 4: 1}


def test_assortativity_hand_graphs(ray_session):
    """Star K1,3 is maximally disassortative (r = -1); a 4-cycle is
    degree-regular (zero variance -> empty); a path P4 has known sums."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import graph

    def edges(pairs):
        a, b = zip(*pairs)
        return rd.from_pandas(
            pd.DataFrame(
                {"src": np.array(a, np.int64), "dst": np.array(b, np.int64)}
            )
        )

    star = graph.assortativity(edges([(0, 1), (0, 2), (0, 3)])).to_pandas()
    assert len(star) == 1 and star["m_edges"].iloc[0] == 3
    assert star["r"].iloc[0] == -1.0
    cycle = graph.assortativity(
        edges([(0, 1), (1, 2), (2, 3), (3, 0)])
    ).to_pandas()
    assert len(cycle) == 0  # all degrees 2: zero variance, undefined
    # P4: degrees 1,2,2,1; directed pairs (1,2),(2,1),(2,2),(2,2),(2,1),(1,2)
    p4 = graph.assortativity(edges([(0, 1), (1, 2), (2, 3)])).to_pandas()
    M, sx, sxx, sxy = 6.0, 10.0, 18.0, 16.0
    assert p4["s_x"].iloc[0] == 10 and p4["s_xx"].iloc[0] == 18
    assert p4["s_xy"].iloc[0] == 16
    mu = sx / M
    assert p4["r"].iloc[0] == (sxy / M - mu * mu) / (sxx / M - mu * mu)
    # duplicate + reversed edges collapse to the same canonical set
    dup = graph.assortativity(
        edges([(0, 1), (1, 0), (1, 2), (2, 3), (2, 3)])
    ).to_pandas()
    assert dup.equals(p4)


def test_knn_hubness_hand_edges(ray_session):
    """Edges 1->3, 2->3, 3->1 over ids {1,2,3,4}: in-degrees 3:2, 1:1,
    and ids 2,4 never referenced -> in_degree 0 has 2 vectors."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import ann

    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "qid": np.array([1, 2, 3], np.int64),
                "vec_id": np.array([3, 3, 1], np.int64),
            }
        )
    )
    ids = rd.from_pandas(pd.DataFrame({"vec_id": np.arange(1, 5, dtype=np.int64)}))
    out = ann.knn_hubness(edges, ids).to_pandas().set_index("in_degree")
    assert out.loc[0, "n_vecs"] == 2 and out.loc[1, "n_vecs"] == 1
    assert out.loc[2, "n_vecs"] == 1
    assert out.loc[0, "share"] == 0.5
