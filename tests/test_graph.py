"""PageRank (functions/graph.py): golden vectors vs the pure-Python
integer recurrence, symmetry properties, and mass accounting."""

import pytest
from pyspark.sql import functions as F

from nolock_social_ocr_services_spark.functions.graph import (
    PR_SCALE,
    pagerank,
    pagerank_reference,
)


def _sym(pairs):
    """Symmetrize an undirected edge list."""
    return [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank_fp for r in pagerank(df, **kw).collect()}


def test_star_graph_matches_reference_and_is_symmetric(spark):
    edges = _sym([("hub", "a"), ("hub", "b"), ("hub", "c")])
    got = _run(spark, edges)
    want = pagerank_reference(edges)
    assert got == want
    # the three leaves are interchangeable -> identical ranks
    assert got["a"] == got["b"] == got["c"]
    assert got["hub"] > got["a"]


def test_chain_graph_golden(spark):
    edges = _sym([("a", "b"), ("b", "c"), ("c", "d")])
    got = _run(spark, edges)
    assert got == pagerank_reference(edges)
    # ends are symmetric, middles are symmetric, middles rank higher
    assert got["a"] == got["d"]
    assert got["b"] == got["c"]
    assert got["b"] > got["a"]


def test_directed_dangling_node_leaks_mass(spark):
    # b has no out-edges: its mass leaks each round (documented
    # simplification) but it still receives the teleport base term.
    edges = [("a", "b")]
    got = _run(spark, edges, iterations=2)
    want = pagerank_reference(edges, iterations=2)
    assert got == want
    assert sum(got.values()) < PR_SCALE  # leaked
    assert got["b"] > got["a"]  # b receives, a only teleports


def test_total_mass_conserved_within_floor_error(spark):
    # symmetrized graph: no dangling nodes, so the only loss is the
    # per-edge floor (< 1 unit per in-edge per round)
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    edges = _sym(pairs)
    got = _run(spark, edges, iterations=4)
    loss = PR_SCALE - sum(got.values())
    assert 0 <= loss <= 4 * (len(edges) + len(got))


def test_iterations_zero_returns_uniform_init(spark):
    edges = _sym([("a", "b")])
    got = _run(spark, edges, iterations=0)
    assert got == {"a": PR_SCALE // 2, "b": PR_SCALE // 2}


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df).count() == 0


def test_rank_order_follows_degree_on_trade_shape(spark):
    # bipartite c<->s shape like the registered query: a supplier
    # connected to every customer outranks one connected to a single
    # customer
    pairs = [("c1", "sA"), ("c2", "sA"), ("c3", "sA"), ("c3", "sB")]
    edges = _sym(pairs)
    got = _run(spark, edges)
    assert got == pagerank_reference(edges)
    assert got["sA"] > got["sB"]


def test_triangle_stats_golden(spark):
    """K4 minus one edge: two triangles sharing an edge; exact per-node
    counts and integer clustering coefficients."""
    from nolock_social_ocr_services_spark.functions.graph import (
        triangle_stats,
    )

    # nodes 1-2-3-4; edges: 12 13 14 23 24 (no 34)
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "src long, dst long"
    )
    out = {r.node: r for r in triangle_stats(e).collect()}
    assert {n: r.triangles for n, r in out.items()} == {1: 2, 2: 2, 3: 1, 4: 1}
    assert out[1].degree == 3 and out[3].degree == 2
    assert out[1].clustering_milli == 2 * 2 * 1000 // (3 * 2)  # 666
    assert out[3].clustering_milli == 1000                     # closed pair
    # star graph: no triangles anywhere, leaves get 0 with d=1
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    souts = triangle_stats(star).collect()
    assert all(r.triangles == 0 and r.clustering_milli == 0 for r in souts)


def test_triangle_stats_canonicalizes_input(spark):
    """Self-loops, duplicates, and both-direction edges collapse to one
    undirected edge set before counting."""
    from nolock_social_ocr_services_spark.functions.graph import (
        triangle_stats,
    )

    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (2, 2)],
        "src long, dst long",
    )
    out = {r.node: r for r in triangle_stats(e).collect()}
    assert {n: r.triangles for n, r in out.items()} == {1: 1, 2: 1, 3: 1}
    assert all(r.degree == 2 for r in out.values())


def test_triangle_stats_matches_brute_force(spark):
    """Parity with a python brute-force triple enumeration on a random
    graph (the degree orientation must not change the answer)."""
    import itertools
    import random

    from nolock_social_ocr_services_spark.functions.graph import (
        triangle_stats,
    )

    rng = random.Random(31)
    nodes = list(range(25))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
            )
            if a != b
        }
    )
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.triangles, r.degree, r.clustering_milli)
        for r in triangle_stats(e).collect()
    }
    es = set(edges)
    tri_count = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            tri_count[a] += 1
            tri_count[b] += 1
            tri_count[c] += 1
    deg = {n: 0 for n in nodes}
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    want = {
        n: (
            tri_count[n],
            deg[n],
            2 * tri_count[n] * 1000 // (deg[n] * (deg[n] - 1))
            if deg[n] >= 2
            else 0,
        )
        for n in nodes
        if deg[n] >= 1
    }
    assert got == want and sum(t for t, _, _ in want.values()) > 0
