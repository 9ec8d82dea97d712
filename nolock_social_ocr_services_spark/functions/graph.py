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


def triangle_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    persist: bool = True,
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient, via
    the degree-oriented wedge join (Suri & Vassilvitskii 2011,
    "Counting triangles and the curse of the last reducer").

    The naive triple-join enumerates every wedge at a hub node —
    O(d_max^2) rows for one key, the "last reducer" that stalls a
    10^12-edge job. Orienting each undirected edge from its
    lower-(degree, id) endpoint to the higher one bounds every node's
    OUT-degree by O(sqrt(m)): wedges are generated only at a triangle's
    smallest-degree corner, so the per-key fan-out — and the shuffle —
    is O(m^1.5) total regardless of hubs. The closure check is one
    equi-join back against the oriented edge set.

    Input may contain duplicates, self-loops, or both directions; all
    are canonicalized away. Output: (node, triangles, degree,
    clustering_milli) for every node with degree >= 1, clustering in
    exact integer milli (2T*1000 div d(d-1), 0 when d < 2).

    ``persist``: the canonical edge set, degree table, and oriented
    edges are each referenced 2-3 times downstream (wedge sides,
    closure probe, corner counts); like :func:`pagerank`, materialize
    them once instead of re-running the upstream edge derivation ~8
    times (without this the plan re-computes the whole input subtree
    per reference). Caller unpersists by releasing the DataFrames.
    """
    u, v = F.col(src), F.col(dst)
    e = (
        edges.filter(u != v)
        .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .distinct()
    )
    if persist:
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    if persist:
        from pyspark import StorageLevel

        deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    ed = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = ed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    if persist:
        from pyspark import StorageLevel

        o = o.persist(StorageLevel.MEMORY_AND_DISK)
    o1 = o.select(F.col("s"), F.col("t").alias("b"), F.col("dt").alias("db"))
    o2 = o.select(F.col("s"), F.col("t").alias("c"), F.col("dt").alias("dc"))
    wedges = o1.join(o2, on="s").filter(
        F.struct(F.col("db"), F.col("b")) < F.struct(F.col("dc"), F.col("c"))
    )
    closing = o.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tri = wedges.join(closing, on=["b", "c"]).select("s", "b", "c")
    corners = (
        tri.select(F.col("s").alias("n"))
        .unionAll(tri.select(F.col("b").alias("n")))
        .unionAll(tri.select(F.col("c").alias("n")))
    )
    tc = corners.groupBy("n").agg(F.count("*").alias("triangles"))
    return (
        deg.join(tc, on="n", how="left")
        .select(
            F.col("n").alias("node"),
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.col("d").alias("degree"),
            F.when(
                F.col("d") >= 2,
                F.expr("2 * coalesce(triangles, 0) * 1000 div (d * (d - 1))"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_milli"),
        )
    )
