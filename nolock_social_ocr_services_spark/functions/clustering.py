"""Distributed Lloyd's k-means over an embedding column.

Completes the ANN story started by ``similarity.ivf_topk`` (whose
docstring defers centroid TRAINING to "k-means on a sample"): this is
that trainer, written the way MLlib's is — per-iteration work is one
scan with a PURE-PROJECTION assignment (the k×dim centroids inline as
literals; argmin folds over them in codegen — no join, no shuffle)
plus one partially-aggregated shuffle (the mean update), and the only
driver traffic is the k×dim centroid matrix each round (the same tiny
collect MLlib's ``treeAggregate`` does). Nothing O(N) ever reaches the
driver, so the loop runs unchanged over 10^11 vectors on 1000
executors. (For k×dim beyond plan-literal comfort, swap the literal
array for a broadcast-join assignment — same semantics, one extra
exchange for the window argmin.)

Determinism: init is the first ``k`` vectors by id (a deterministic
"sample"; at scale, any hash-sample works as long as it is pinned), and
every updated centroid component is rounded to 6 decimals before the
next assignment round. The rounding is the cross-engine equality trick
used throughout this repo: Spark and DuckDB sum doubles in different
orders (~1e-15 relative drift), and the round absorbs it so both
engines assign against bit-identical centroids — which makes an
ITERATIVE algorithm hash-checkable against an unrolled SQL oracle.

Distances: squared Euclidean via ``zip_with`` + ``aggregate`` (JVM
built-ins, codegen'd; no Python anywhere in the loop). Ties broken by
centroid id, matching the oracle's ``ORDER BY dist, cid``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(
    vecs: DataFrame, cent_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """Nearest-centroid assignment as a PURE PROJECTION: the centroids
    are already driver-side (k tiny rows), so they inline as a literal
    array<struct<cid,c>> and the argmin folds over it with
    ``transform`` + ``aggregate`` — zero joins, zero exchanges, fully
    codegen'd. (A broadcast-join + window argmin costs a shuffle of
    every row for the row_number; this costs nothing but the scan.)
    Ties break to the LOWEST cid: rows iterate in ascending-cid order
    and only a strictly smaller distance replaces the running best."""
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in c]).alias("c"),
            )
            for cid, c in sorted(cent_rows)
        ]
    )
    dists = F.transform(
        cent_arr,
        lambda s: F.struct(
            _sqdist(F.col("v"), s["c"]).alias("d"), s["cid"].alias("cid")
        ),
    )
    best = F.aggregate(
        dists,
        F.struct(
            F.lit(float("inf")).alias("d"), F.lit(-1).alias("cid")
        ),
        lambda acc, s: F.when(s["d"] < acc["d"], s).otherwise(acc),
    )
    # a NULL or wrong-length vector has NULL distance to every centroid
    # (the fold keeps the -1 seed) — surface that as cluster=NULL, not a
    # real-looking cluster id a downstream stratify would group on.
    return vecs.withColumn(
        "cluster",
        F.when(best["cid"] >= 0, best["cid"]),
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Run ``iters`` Lloyd rounds; return the final centroids as
    ``[(cid, vector), ...]`` (k rows — driver-side by design, exactly
    like MLlib's KMeansModel.clusterCenters)."""
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cent_rows = [
        (int(r["id"]), list(r["v"]))
        for r in vecs.orderBy("id").limit(k).collect()
    ]
    cent_rows = [(i, v) for i, (_, v) in enumerate(cent_rows)]
    for _ in range(iters):
        assigned = _assign(vecs, cent_rows)
        # mean update: posexplode to (cluster, dim) cells -> partial-agg
        # shuffle keyed on k*dim tiny groups -> re-pack ordered arrays.
        means = (
            # NULL clusters (NULL / wrong-length vectors) contribute to
            # no mean — they'd otherwise crash the int() below and drag
            # centroids toward garbage.
            assigned.filter(F.col("cluster").isNotNull())
            .select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .collect()
        )
        new = {int(r["cluster"]): list(r["c"]) for r in means}
        # an empty cluster keeps its previous centroid (Lloyd's standard
        # fallback; the oracle's LEFT JOIN + COALESCE mirrors it).
        cent_rows = [(cid, new.get(cid, old)) for cid, old in cent_rows]
    return cent_rows


def kmeans_assignments(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train with :func:`kmeans_fit`, then label every vector under the
    FINAL centroids: (id_col, cluster). One extra broadcast-join pass —
    the full-scan labeling step a training pipeline runs anyway to
    stratify / dedup-by-cluster the corpus."""
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    cent_rows = kmeans_fit(df, k, iters, id_col, vec_col)
    return _assign(vecs, cent_rows).select(
        F.col("id").alias(id_col), "cluster"
    )
