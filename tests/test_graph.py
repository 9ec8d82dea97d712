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
