"""Graph analytics as Pregel-style join + aggregate rounds.

PageRank (Page et al. 1999) in INTEGER-EXACT fixed-point arithmetic:
ranks live in units of 1/``scale`` so every per-edge contribution is a
bigint floor division and every per-node combine is a bigint sum.
Bigint sums are order-independent (float sums are not), so the result
is bit-identical across partitionings, engines, and retries — which is
what lets a single-node DuckDB oracle hash-match the distributed run.

Scale shape: each iteration is ONE equi-join of the edge table with
the node-sized rank table plus ONE hash aggregation on the destination
— the classic Pregel/GraphX superstep expressed in DataFrame ops. The
rank and degree tables are node-sized; the edge table is scanned once
per round and never collected. The only driver-side scalar is the node
COUNT (needed for the teleport term), never rows. Lineage grows
linearly with the iteration count; for deep iteration (>~15 rounds)
interpose ``localCheckpoint()`` — ``functions/dedup.py``'s
``connected_components`` shows the same pattern with pointer jumping,
which is why PageRank here uses a fixed small round count instead.

Ref parity: the reference has no graph engine; this is part of the
training-data-pipeline surface (domain-authority scoring for crawl
frontier/curation ranking).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 4,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    persist: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a pre-deduplicated edge list.

    Recurrence (all bigint; ``div`` = floor division, every quantity
    non-negative so floor == truncate in both Spark and DuckDB):

        r_0(v) = scale div N
        r_i(v) = ((100 - damping_pct) * scale) div (100 * N)
                 + sum over edges u->v of
                   (damping_pct * r_{i-1}(u)) div (100 * outdeg(u))

    Dangling nodes (no out-edges) keep receiving the teleport term but
    contribute nothing — their mass leaks, the standard simplification;
    symmetrized (undirected) graphs have none. Returns ``(node,
    rank_fp)`` with ``rank_fp ~= rank * scale``; the per-node floor in
    the contribution loses < 1 unit per in-edge per round, so ranks are
    exact to ~iterations * max_indeg / scale.

    ``persist``: materialize the edge, node, and degree tables once
    (MEMORY_AND_DISK) instead of re-deriving their lineage — often a
    scan + join + distinct — every round; without it an I-iteration run
    re-reads the upstream tables ~4I times. Left cached for the
    returned plan's benefit; callers owning a long-lived session can
    ``unpersist()`` after collecting.
    """
    if persist:
        from pyspark import StorageLevel

        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    if persist:
        from pyspark import StorageLevel

        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
        outdeg = outdeg.persist(StorageLevel.MEMORY_AND_DISK)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    base = ((100 - damping_pct) * scale) // (100 * n)
    contrib_expr = F.expr(
        f"({int(damping_pct)} * rank_fp) div (100 * outdeg)"
    ).alias("_c")
    ranks = nodes.withColumn("rank_fp", F.lit(scale // n).cast("long"))
    for _ in range(int(iterations)):
        contribs = (
            edges.join(ranks.withColumnRenamed("node", src), src)
            .join(outdeg, src)
            .select(F.col(dst).alias("node"), contrib_expr)
            .groupBy("node")
            .agg(F.sum("_c").alias("_contrib"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("_contrib"), F.lit(0)))
            .cast("long")
            .alias("rank_fp"),
        )
    return ranks


def pagerank_reference(
    edges: list[tuple[str, str]],
    iterations: int = 4,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
) -> dict[str, int]:
    """Pure-Python twin of :func:`pagerank` for golden tests — the same
    integer recurrence evaluated single-threaded."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    if n == 0:
        return {}
    outdeg: dict[str, int] = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    base = ((100 - damping_pct) * scale) // (100 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        nxt = {v: base for v in nodes}
        for u, v in edges:
            nxt[v] += (damping_pct * r[u]) // (100 * outdeg[u])
        r = nxt
    return r
