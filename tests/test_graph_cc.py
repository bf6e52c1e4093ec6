"""Connected components: known topologies + union-find cross-check."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from orc_spark.operators.graph import connected_components


def _run(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    edf = spark.createDataFrame(edges or [(0, 0)], "src bigint, dst bigint")
    if not edges:
        edf = edf.limit(0)
    out = connected_components(ndf, edf).collect()
    return {r.node: r.comp for r in out}


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-label per component
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def test_chain_star_singletons(spark):
    # chain 1-2-3-4, star 10-{11,12,13}, singletons 20, 21
    nodes = [1, 2, 3, 4, 10, 11, 12, 13, 20, 21]
    edges = [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12), (13, 10)]
    got = _run(spark, nodes, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 21}


def test_two_triangles_bridged(spark):
    nodes = list(range(1, 7))
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    got = _run(spark, nodes, edges)
    assert set(got.values()) == {1}


def test_random_vs_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(100))
    edges = [(rng.randrange(100), rng.randrange(100)) for _ in range(60)]
    assert _run(spark, nodes, edges) == _union_find(nodes, edges)


def test_long_path_converges(spark):
    # diameter 30 path — exercises the iteration/convergence loop hard
    nodes = list(range(30))
    edges = [(i, i + 1) for i in range(29)]
    got = _run(spark, nodes, edges)
    assert set(got.values()) == {0}


# --- k-core: brute-force cross-check + oracle-envelope guard ------------------


def _py_kcore(edges, k):
    """Reference peel: repeatedly drop nodes with degree < k."""
    es = set(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nes = {(a, b) for a, b in es if a in keep and b in keep}
        if nes == es:
            return deg, keep
        es = nes


def test_kcore_matches_bruteforce_and_converges_inside_envelope(spark, sf_small):
    """gr_kcore peels to the exact fixpoint (vs a Python peel of the same
    edge list) AND the testdata converges inside the oracle's fixed unroll —
    the runtime guard raises otherwise, so merely completing asserts the
    envelope (ADVICE r04: mirror the AHRS run-length pin)."""
    from orc_spark.plans.graph_q import KCORE_K, _mutual_knn_edges, gr_kcore

    edges = [(r.ea, r.eb) for r in _mutual_knn_edges(spark, sf_small).collect()]
    deg, keep = _py_kcore(edges, KCORE_K)
    want = {n: deg[n] for n in keep}
    rows = gr_kcore(spark, sf_small).collect()
    assert {r.s_suppkey: r.core_degree for r in rows} == want
    assert all(r.converged for r in rows)


def test_kcore_envelope_guard_raises(spark, sf_small, monkeypatch):
    """Shrinking the oracle unroll below what the data needs must fail
    loudly, not silently diverge from the oracle."""
    import orc_spark.plans.graph_q as gq

    monkeypatch.setattr(gq, "KCORE_ORACLE_ROUNDS", 0)
    with pytest.raises(RuntimeError, match="oracle unrolls"):
        gq.gr_kcore(spark, sf_small)


def test_gr_bfs_local_finish_equals_distributed(spark, sf_small, monkeypatch):
    """The bounded driver finish and the unrolled distributed rounds must
    emit identical hop rows (counts AND membership digests)."""
    import orc_spark.plans.graph_q as gq

    local = [tuple(r) for r in gq.gr_bfs(spark, sf_small).collect()]
    monkeypatch.setattr(gq, "GRAPH_LOCAL_FINISH_EDGES", -1)
    dist = [tuple(r) for r in gq.gr_bfs(spark, sf_small).collect()]
    assert local == dist
    assert local  # non-degenerate: at least one hop row


def test_gr_linkpred_local_finish_equals_distributed(
    spark, sf_small, monkeypatch
):
    """Driver finish == distributed wedge join, including the fixed-point
    Adamic-Adar sums and the rounded jaccard doubles."""
    import orc_spark.plans.graph_q as gq

    local = [tuple(r) for r in gq.gr_linkpred(spark, sf_small).collect()]
    monkeypatch.setattr(gq, "GRAPH_LOCAL_FINISH_EDGES", -1)
    dist = [tuple(r) for r in gq.gr_linkpred(spark, sf_small).collect()]
    assert local == dist
    assert local


def test_gr_label_prop_local_finish_equals_distributed(
    spark, sf_small, monkeypatch
):
    """Driver finish == distributed synchronous rounds (argmax with
    count-desc/label-asc tie-break), including community digests."""
    import orc_spark.plans.graph_q as gq

    local = [tuple(r) for r in gq.gr_label_prop(spark, sf_small).collect()]
    monkeypatch.setattr(gq, "GRAPH_LOCAL_FINISH_EDGES", -1)
    dist = [tuple(r) for r in gq.gr_label_prop(spark, sf_small).collect()]
    assert local == dist
    assert local


def test_local_bfs_known_topology():
    """Chain 0-1-2-3-4-5-6 with source 0 (0 % 20 == 0): exact hops, node 6
    beyond the 4-hop horizon maps to -1; counts per level are 1."""
    from orc_spark.plans.graph_q import local_bfs_hops

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    rows = {hop: n for hop, n, _dig in local_bfs_hops(edges, 20, 4)}
    assert rows == {-1: 2, 0: 1, 1: 1, 2: 1, 3: 1, 4: 1}


def test_local_lpa_two_cliques_bridged():
    """Two 4-cliques joined by one bridge edge: labels converge to the two
    clique minima (the bridge can't outvote 3 internal neighbors)."""
    from orc_spark.plans.graph_q import local_lpa_communities

    def clique(ns):
        return [(a, b) for i, a in enumerate(ns) for b in ns[i + 1:]]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    rows = local_lpa_communities(edges, 3)
    assert [(lab, size) for lab, size, _d in rows] == [(1, 4), (10, 4)]


def test_local_linkpred_known_topology():
    """Path 1-2-3 plus hub 2-4: candidates are the distance-2 pairs through
    hub 2 (deg 3); common-neighbor count 1, Adamic-Adar term 1e9/ln(3)."""
    import math

    from orc_spark.plans.graph_q import local_linkpred

    edges = [(1, 2), (2, 3), (2, 4)]
    rows = local_linkpred(edges, 1_000_000_000, 20)
    aa3 = math.floor(1e9 / math.log(3.0))
    want = {
        (1, 3): (1, 1, 1, round(1 / 1.0, 6), aa3),
        (1, 4): (1, 1, 1, round(1 / 1.0, 6), aa3),
        (3, 4): (1, 1, 1, round(1 / 1.0, 6), aa3),
    }
    got = {(u, v): (cn, du, dv, j, aa) for u, v, cn, du, dv, j, aa in rows}
    assert got == want


def test_cc_distributed_path_equals_union_find(spark, monkeypatch):
    """Force the cap off so the distributed pointer-jumping rounds (the
    path that runs at real scale) stay exercised — the local union-find
    finish otherwise takes every test and gate graph."""
    import orc_spark.operators.graph as g

    monkeypatch.setattr(g, "CC_LOCAL_FINISH_ROWS", -1)
    rng = random.Random(11)
    nodes = list(range(60))
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]
    got = _run(spark, nodes, edges)
    assert got == _union_find(nodes, edges)


def test_cc_distributed_path_known_topology(spark, monkeypatch):
    import orc_spark.operators.graph as g

    monkeypatch.setattr(g, "CC_LOCAL_FINISH_ROWS", -1)
    nodes = [1, 2, 3, 4, 10, 11, 12, 13, 20]
    edges = [(2, 1), (2, 3), (3, 4), (10, 11), (13, 10)]
    got = _run(spark, nodes, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 12, 13: 10, 20: 20}


def test_gr_pagerank_local_finish_equals_distributed(
    spark, sf_small, monkeypatch
):
    """Driver-side numpy power iteration == distributed join rounds,
    bit-identical fixed-point ranks for every node."""
    import orc_spark.plans.graph_q as gq

    local = sorted(tuple(r) for r in gq.gr_pagerank(spark, sf_small).collect())
    monkeypatch.setattr(gq, "PR_LOCAL_FINISH_EDGES", -1)
    dist = sorted(tuple(r) for r in gq.gr_pagerank(spark, sf_small).collect())
    assert local == dist
    assert local


def test_local_pagerank_known_topology():
    """Symmetric 2-node graph: ranks stay exactly at the fixed point
    base + 85*scale//100 after one iteration and never move again; a
    3-node star pushes mass to the hub (hub rank > leaf rank)."""
    import numpy as np

    from orc_spark.plans.graph_q import PR_BASE, PR_SCALE, local_pagerank

    # 1 <-> 2: each node's contribution is its whole rank (outdeg 1)
    nodes, r = local_pagerank([1, 2], [2, 1], 4, PR_SCALE, PR_BASE)
    assert list(nodes) == [1, 2]
    fp = PR_BASE + 85 * PR_SCALE // 100
    # with scale chosen so 85*scale%100 == 0, the symmetric point is exact
    assert list(r) == [fp, fp] == [PR_SCALE, PR_SCALE]

    # star: hub 1 with leaves 2, 3 (undirected union both directions)
    src = np.array([1, 1, 2, 3]); dst = np.array([2, 3, 1, 1])
    nodes, r = local_pagerank(src, dst, 4, PR_SCALE, PR_BASE)
    ranks = dict(zip(nodes, r))
    assert ranks[1] > ranks[2] == ranks[3]

    # empty edge set: empty result, no IndexError from the segment layout
    nodes, r = local_pagerank([], [], 4, PR_SCALE, PR_BASE)
    assert len(nodes) == 0 and len(r) == 0
    assert nodes.dtype == np.int64 and r.dtype == np.int64
