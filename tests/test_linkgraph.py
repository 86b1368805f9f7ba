"""Link-graph kernels: integer PageRank and triangle counting verified
against brute-force reference implementations on controlled graphs."""

from __future__ import annotations

import random

from bigdatatiler_spark.operators.linkgraph import (
    DAMP_DEN,
    DAMP_NUM,
    PAGERANK_ITERS,
    PR_SCALE,
    PR_TELEPORT,
    pagerank_integer,
    triangle_counts,
)


def _brute_pagerank(edges, iters=PAGERANK_ITERS):
    """The identical integer recurrence, driver-side: the spec both the
    Spark loop and the DuckDB oracle must realize."""
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    r = {n: PR_SCALE for n in nbrs}
    for _ in range(iters):
        contrib = {n: r[n] // len(nbrs[n]) for n in nbrs}
        r = {
            n: PR_TELEPORT + (DAMP_NUM * sum(contrib[m] for m in nbrs[n])) // DAMP_DEN
            for n in nbrs
        }
    return r


def _brute_triangles(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    count: dict[int, int] = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) not in es:
                continue
            for c in nodes:
                if c > b and (a, c) in es and (b, c) in es:
                    for n in (a, b, c):
                        count[n] = count.get(n, 0) + 1
    return count


def _pr(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {r["node"]: r["pr_micro"] for r in pagerank_integer(df).collect()}


def _tri(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {r["node"]: r["tri_count"] for r in triangle_counts(df).collect()}


def test_pagerank_matches_brute_recurrence(spark):
    edges = [(1, 2), (2, 3), (3, 4), (1, 3), (5, 6)]
    assert _pr(spark, edges) == _brute_pagerank(edges)


def test_pagerank_hub_outranks_leaves(spark):
    # star: hub 1 linked to 2..6 — the hub must dominate
    edges = [(1, k) for k in range(2, 7)]
    got = _pr(spark, edges)
    assert got[1] == max(got.values())
    assert all(got[1] > got[k] for k in range(2, 7))


def test_pagerank_random_graph_matches_brute(spark):
    rng = random.Random(7)
    nodes = list(range(30))
    edges = list(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(60)
        }
    )
    assert _pr(spark, edges) == _brute_pagerank(edges)


def test_triangles_basic_shapes(spark):
    # one triangle + a pendant edge + a square (no triangle)
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11), (11, 12), (12, 13), (10, 13)]
    assert _tri(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_triangles_clique_counts(spark):
    # K4: each vertex on C(3,2)=3 triangles
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert _tri(spark, edges) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_random_graph_matches_brute(spark):
    rng = random.Random(11)
    nodes = list(range(25))
    edges = list({tuple(sorted(rng.sample(nodes, 2))) for _ in range(80)})
    assert _tri(spark, edges) == _brute_triangles(edges)
