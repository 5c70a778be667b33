"""PageRank numeric contract: parity with a dense numpy power
iteration, rank-mass conservation, and dangling-node handling."""

from __future__ import annotations

import numpy as np

from sfcrimedatapipeline_spark.operators.graph import pagerank


def _numpy_pagerank(n, edges, damping=0.85, iters=10, undirected=True):
    if undirected:
        edges = edges + [(b, a) for a, b in edges]
    out_deg = np.zeros(n)
    for a, _ in edges:
        out_deg[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for a, b in edges:
            contrib[b] += r[a] / out_deg[a]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return r


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (4, 0)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["rank"] for r in pagerank(df).collect()}
    want = _numpy_pagerank(5, edges)
    for i in range(5):
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_directed_with_dangling_node(spark):
    # node 2 has no out-edges in the directed graph: its mass must
    # redistribute, not vanish
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["rank"] for r in pagerank(df, undirected=False).collect()}
    want = _numpy_pagerank(3, edges, undirected=False)
    for i in range(3):
        assert abs(got[i] - want[i]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[2] > got[1] > got[0]  # rank flows down the chain
