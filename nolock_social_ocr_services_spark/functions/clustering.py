"""Distributed Lloyd's k-means over an embedding column.

Completes the ANN story started by ``similarity.ivf_topk`` (whose
docstring defers centroid TRAINING to "k-means on a sample"): this is
that trainer, written the way MLlib's is — per-iteration work is one
broadcast join (assignment, map-side) plus one partially-aggregated
shuffle (the mean update), and the only driver traffic is the k×dim
centroid matrix each round (k rows — the same tiny collect MLlib's
``treeAggregate`` does). Nothing O(N) ever reaches the driver, so the
loop runs unchanged over 10^11 vectors on 1000 executors.

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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(
    vecs: DataFrame, cent: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k-row centroid table,
    argmin by (distance, cid). Map-side only — no shuffle of the data."""
    scored = vecs.crossJoin(F.broadcast(cent)).withColumn(
        "dist", _sqdist(F.col("v"), F.col("c"))
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cid")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "v", F.col("cid").alias("cluster"))
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
    spark = df.sparkSession
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
        cent = _centroid_df(spark, cent_rows)
        assigned = _assign(vecs, cent)
        # mean update: posexplode to (cluster, dim) cells -> partial-agg
        # shuffle keyed on k*dim tiny groups -> re-pack ordered arrays.
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
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


def _centroid_df(
    spark: SparkSession, cent_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    return spark.createDataFrame(
        cent_rows, "cid int, c array<double>"
    )


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
    cent = _centroid_df(
        df.sparkSession, kmeans_fit(df, k, iters, id_col, vec_col)
    )
    return _assign(vecs, cent).select(
        F.col("id").alias(id_col), "cluster"
    )
