"""Similarity search over an embedding column (array<float>).

Two tiers, mirroring what a 100 TB training pipeline needs:

* ``cosine_topk`` — exact brute force: normalize once, self-join, rank.
  The correctness baseline; quadratic, so only for modest query sets
  (or query-subset vs corpus joins).
* ``lsh_topk`` — sign-random-projection LSH: deterministic hyperplanes
  (seeded per plane, generated driver-side, broadcast as literal
  arrays), bucket join on the signature prefix, exact re-rank inside
  buckets. Sub-quadratic: candidates ~ corpus / 2^bits per query.

Dot products use ``F.zip_with`` + ``aggregate`` (JVM built-ins, no
Python). Floats are summed in array order, so results are deterministic
run-to-run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # cast each element to double BEFORE multiplying: float32 products
    # differ from double products in the 7th decimal, and the DuckDB
    # oracles compute over CAST(embedding AS DOUBLE[]) — double-first
    # keeps every derived similarity bit-identical across engines.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_unit_vector(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Pre-normalize embeddings (do it ONCE, upstream of any join)."""
    n = _norm(F.col(vec_col))
    return df.withColumn(
        out_col,
        F.when(n == 0, F.lit(None)).otherwise(
            F.transform(F.col(vec_col), lambda x: x.cast("double") / n)
        ),
    )


def cosine_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors: (query_id, neighbor_id, rank, sim).

    ``queries`` defaults to the whole table (all-pairs). Normalization
    happens once per side; the join computes a single dot product per
    pair; ranking is a window over the query id. Zero-norm vectors have
    no cosine direction (unit=NULL) and are excluded from BOTH sides —
    otherwise they'd emit k NULL-sim rows per query and leak into other
    queries' top-k."""
    base = (
        with_unit_vector(df, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("neighbor_id"), F.col("unit").alias("unit_n"))
    )
    qdf = queries if queries is not None else df
    q = (
        with_unit_vector(qdf, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("query_id"), F.col("unit").alias("unit_q"))
    )
    pairs = q.crossJoin(base).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        _dot(F.col("unit_q"), F.col("unit_n")).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def margin_mine(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    knn: int = 4,
    threshold: float = 1.05,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
    parallel corpus mining with multilingual sentence embeddings" — the
    CCMatrix/LASER alignment rule): score a candidate pair not by raw
    cosine but by its RATIO margin against each side's neighborhood
    density, margin(x, y) = cos(x, y) / ((deg(x) + deg(y)) / 2) with
    deg = mean cosine of the k nearest neighbors on the OTHER side.
    Hubness-robust: a vector that is close to everything (high deg)
    must clear a proportionally higher bar, which is why margin beats
    absolute-threshold mining for parallel-corpus extraction.

    Returns one row per src vector whose best-margin target clears
    ``threshold``: (src_id, tgt_id, margin).

    Shape: normalize once per side; this form scores all src x tgt
    pairs (the correctness baseline, quadratic like ``cosine_topk``).
    At 100 TB the pair generation swaps for the bucketed candidate
    ops shipped here (``near_dup_pairs_bucketed`` SRP banding /
    ``ivf_topk``) with identical margin arithmetic on candidates only
    — deg(x) over ANN-k instead of exact-k is the standard trade
    (Artetxe & Schwenk use faiss ANN for exactly this reason).

    Cross-engine float contract: sims rounded to 9 dp, neighborhood
    means to 9, the margin to 6; rankings order by the rounded values
    with id tie-breaks."""
    from pyspark.sql import Window

    s = (
        with_unit_vector(src, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("src_id"), F.col("unit").alias("us"))
    )
    t = (
        with_unit_vector(tgt, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("tgt_id"), F.col("unit").alias("ut"))
    )
    sims = s.crossJoin(t).select(
        "src_id",
        "tgt_id",
        F.round(_dot(F.col("us"), F.col("ut")), 9).alias("sim"),
    )
    w_src = Window.partitionBy("src_id").orderBy(F.desc("sim"), "tgt_id")
    deg_src = (
        sims.withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= knn)
        .groupBy("src_id")
        .agg(F.round(F.avg("sim"), 9).alias("deg_src"))
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(F.desc("sim"), "src_id")
    deg_tgt = (
        sims.withColumn("rn", F.row_number().over(w_tgt))
        .filter(F.col("rn") <= knn)
        .groupBy("tgt_id")
        .agg(F.round(F.avg("sim"), 9).alias("deg_tgt"))
    )
    margins = (
        sims.join(deg_src, on="src_id")
        .join(deg_tgt, on="tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round(
                F.col("sim")
                / ((F.col("deg_src") + F.col("deg_tgt")) / F.lit(2.0)),
                6,
            ).alias("margin"),
        )
    )
    w_best = Window.partitionBy("src_id").orderBy(F.desc("margin"), "tgt_id")
    return (
        margins.withColumn("rn", F.row_number().over(w_best))
        .filter((F.col("rn") == 1) & (F.col("margin") >= threshold))
        .select("src_id", "tgt_id", "margin")
    )


def margin_mine_bucketed(
    src: DataFrame,
    tgt: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    knn: int = 4,
    threshold: float = 1.05,
    dim: int | None = None,
    bits: int = 12,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Margin-based bitext mining over SRP-banded candidates — the
    100-TB form of :func:`margin_mine` (Artetxe & Schwenk 2019 run
    their margin rule over faiss ANN candidates for exactly this
    reason; this is the Spark equivalent).

    Candidate spec (deterministic, oracle-recomputable): a (src, tgt)
    pair is a candidate iff the hamming distance between the two
    ``bits``-bit sign-random-projection signatures is <= bands-1.
    Candidates are GENERATED by the banded equi-join (cut the
    signature into ``bands`` bands; hamming <= bands-1 pigeonholes at
    least one identical band), so the pair space is
    sum-of-squared-band-bucket-sizes per band — never |src| x |tgt|.
    Each candidate then gets ONE exact dot product; the margin
    arithmetic (sim / mean-of-top-knn neighborhood density, both
    sides) runs unchanged on candidates, with deg over candidate-kNN
    instead of exact-kNN — the standard ANN trade.

    Returns one row per src vector whose best-margin candidate clears
    ``threshold``: (src_id, tgt_id, margin). Same float contract as
    margin_mine: sims and degs rounded to 9 dp, margins to 6, rankings
    over the rounded values with id tie-breaks. Zero-norm vectors are
    excluded (no cosine direction)."""
    from pyspark.sql import Window

    if bits % bands != 0:
        raise ValueError("bits must be divisible by bands")
    if dim is None:
        meta = src.schema[vec_col].metadata or {}
        dim = meta.get("dim")
    if dim is None:
        raise ValueError(
            f"vector dimension unknown: pass dim= or attach {{'dim': n}} "
            f"metadata to column {vec_col!r} (plan-build must not run a job)"
        )
    planes = random_hyperplanes(int(dim), bits, seed)
    raw = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def _side(df: DataFrame, side: str) -> DataFrame:
        return (
            with_unit_vector(df, vec_col)
            .filter(F.col("unit").isNotNull())
            .select(
                F.col(id_col).alias(f"{side}_id"),
                F.col("unit").alias(f"u{side}"),
                srp_signature(raw, planes).cast("long").alias(f"sig_{side}"),
            )
        )

    s = _side(src, "src")
    t = _side(tgt, "tgt")
    r = bits // bands
    mask = (1 << r) - 1

    def _banded(df: DataFrame, side: str) -> DataFrame:
        band_structs = [
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col(f"sig_{side}"), b * r)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
        return df.select(
            f"{side}_id",
            f"sig_{side}",
            F.explode(F.array(*band_structs)).alias("band"),
        ).select(f"{side}_id", f"sig_{side}", "band.band_idx", "band.band_val")

    cand = (
        _banded(s, "src")
        .join(_banded(t, "tgt"), on=["band_idx", "band_val"])
        .filter(
            F.bit_count(F.col("sig_src").bitwiseXOR(F.col("sig_tgt")))
            <= bands - 1
        )
        .select("src_id", "tgt_id")
        .distinct()
    )
    sims = (
        cand.join(s.select("src_id", "usrc"), "src_id")
        .join(t.select("tgt_id", "utgt"), "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round(_dot(F.col("usrc"), F.col("utgt")), 9).alias("sim"),
        )
    )
    w_src = Window.partitionBy("src_id").orderBy(F.desc("sim"), "tgt_id")
    deg_src = (
        sims.withColumn("rn", F.row_number().over(w_src))
        .filter(F.col("rn") <= knn)
        .groupBy("src_id")
        .agg(F.round(F.avg("sim"), 9).alias("deg_src"))
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(F.desc("sim"), "src_id")
    deg_tgt = (
        sims.withColumn("rn", F.row_number().over(w_tgt))
        .filter(F.col("rn") <= knn)
        .groupBy("tgt_id")
        .agg(F.round(F.avg("sim"), 9).alias("deg_tgt"))
    )
    margins = (
        sims.join(deg_src, on="src_id")
        .join(deg_tgt, on="tgt_id")
        .select(
            "src_id",
            "tgt_id",
            F.round(
                F.col("sim")
                / ((F.col("deg_src") + F.col("deg_tgt")) / F.lit(2.0)),
                6,
            ).alias("margin"),
        )
    )
    w_best = Window.partitionBy("src_id").orderBy(F.desc("margin"), "tgt_id")
    return (
        margins.withColumn("rn", F.row_number().over(w_best))
        .filter((F.col("rn") == 1) & (F.col("margin") >= threshold))
        .select("src_id", "tgt_id", "margin")
    )


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (driver-side, tiny)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id (int) for a vector."""
    sig = F.lit(0)
    for j, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(p)) for p in plane]),
                lambda x, p: (x * p).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: SRP bucket join + exact re-rank in-bucket.

    Recall < 1 by construction (neighbors in other buckets are missed);
    verified against ``cosine_topk`` in tests. Bucket key cardinality
    2^bits spreads the join; tune bits so corpus/2^bits rows fit a task.

    ``dim`` must be known at plan-build time: pass it explicitly or
    attach ``{"dim": n}`` metadata to the vector column — inferring it
    from data would silently trigger a Spark job inside the operator.
    """
    if dim is None:
        meta = df.schema[vec_col].metadata or {}
        dim = meta.get("dim")
    if dim is None:
        raise ValueError(
            f"vector dimension unknown: pass dim= or attach {{'dim': n}} "
            f"metadata to column {vec_col!r} (plan-build must not run a job)"
        )
    dim = int(dim)
    planes = random_hyperplanes(dim, bits, seed)
    # zero-norm vectors (unit=NULL) would all hash to bucket 0 (every
    # when(proj > 0) false) and join NULL-sim pairs against real
    # bucket-0 vectors — exclude them like cosine_topk does.
    sig = (
        with_unit_vector(df, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col("unit"),
            srp_signature(F.col("unit"), planes).alias("bucket"),
        )
    )
    a = sig.select(
        F.col("id").alias("query_id"), F.col("unit").alias("unit_q"), "bucket"
    )
    b = sig.select(
        F.col("id").alias("neighbor_id"), F.col("unit").alias("unit_n"), "bucket"
    )
    pairs = a.join(b, on="bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id", _dot(F.col("unit_q"), F.col("unit_n")).alias("sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize each vector to its
    nearest centroid, then exact-search only within the inverted lists
    of the query's ``nprobe`` nearest centroids.

    Centroids are the first ``n_centroids`` vectors by id — a
    deterministic "training sample" (at scale: k-means on a sample; the
    partition/search structure is identical). The centroid table is tiny
    and BROADCAST, so assignment is a map-side join: no shuffle until
    the per-cluster join, whose key (cluster id) caps the pair
    space at nprobe * sum-of-squared-cluster-sizes instead of N^2.

    ``nprobe`` is the standard IVF recall/cost dial: every vector lives
    in exactly ONE inverted list (its nearest centroid), and each query
    probes its ``nprobe`` nearest lists — nprobe=1 is the cheapest form,
    higher values recover neighbors that quantized across a cluster
    boundary at linearly higher candidate cost. A (query, neighbor)
    pair can appear at most once because the probed clusters are
    distinct and the neighbor belongs to one list. Recall vs
    :func:`cosine_topk` is pinned in tests at both settings.
    Zero-norm vectors have no cosine direction and are excluded.
    """
    unit = with_unit_vector(df, vec_col).filter(F.col("unit").isNotNull())
    # "first n_centroids by id" via TakeOrdered, not `id < n_centroids`:
    # the predicate form is only correct for dense 0-based integer ids
    # (1-based ids silently train n-1 centroids; string ids cast to
    # NULL and select none, emptying the whole result).
    cent = (
        unit.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col("unit").alias("cunit"))
    )
    scored = unit.select(F.col(id_col).alias("id"), "unit").crossJoin(
        F.broadcast(cent)
    )
    from pyspark.sql import Window

    w_assign = Window.partitionBy("id").orderBy(
        _dot(F.col("unit"), F.col("cunit")).desc(), F.col("cid")
    )
    ranked_cent = scored.withColumn(
        "crank", F.row_number().over(w_assign)
    )
    assigned = ranked_cent.filter(F.col("crank") == 1).select(
        "id", "unit", F.col("cid").alias("cluster")
    )
    probes = ranked_cent.filter(F.col("crank") <= nprobe).select(
        "id", "unit", F.col("cid").alias("cluster")
    )
    a = probes.select(
        F.col("id").alias("query_id"), F.col("unit").alias("unit_q"), "cluster"
    )
    b = assigned.select(
        F.col("id").alias("neighbor_id"), F.col("unit").alias("unit_n"), "cluster"
    )
    pairs = a.join(b, on="cluster").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored2 = pairs.select(
        "query_id", "neighbor_id", _dot(F.col("unit_q"), F.col("unit_n")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored2.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def near_dup_pairs_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Bucketed embedding near-dup: the 100-TB path for
    :func:`near_dup_pairs`. Returns (id_a < id_b, hamming) for pairs with
    SRP-signature hamming <= bands-1 AND exact cosine >= threshold.

    Design (mirrors dedup.simhash_near_dup): each vector gets a
    ``bits``-bit sign-random-projection signature; the signature is cut
    into ``bands`` bands and candidates are generated with an equi-join
    per band — pigeonhole-EXACT for the hamming bound (hamming <= bands-1
    forces at least one identical band), so the only approximation vs
    the brute-force cosine spec is the hamming gate itself (recall vs
    :func:`near_dup_pairs` is measured in tests). Join fan-out is
    sum-of-squared-bucket-sizes per band instead of N^2; candidates then
    get ONE exact dot product each. Zero-norm vectors have no cosine
    direction and are excluded, as in ivf_topk.
    """
    if bits % bands != 0:
        raise ValueError("bits must be divisible by bands")
    if dim is None:
        meta = df.schema[vec_col].metadata or {}
        dim = meta.get("dim")
    if dim is None:
        raise ValueError(
            f"vector dimension unknown: pass dim= or attach {{'dim': n}} "
            f"metadata to column {vec_col!r} (plan-build must not run a job)"
        )
    planes = random_hyperplanes(int(dim), bits, seed)
    # signature on the RAW (cast-double) vector: sign(dot(v, plane)) is
    # normalization-invariant, and skipping the unit division keeps the
    # float math identical to the DuckDB oracle's recomputation.
    raw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = (
        with_unit_vector(df, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col("unit"),
            srp_signature(raw, planes).cast("long").alias("sig"),
        )
    )
    r = bits // bands
    mask = (1 << r) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftright(F.col("sig"), b * r).bitwiseAND(F.lit(mask)).alias("band_val"),
        )
        for b in range(bands)
    ]
    banded = base.select(
        "id", "sig", F.explode(F.array(*band_structs)).alias("band")
    ).select("id", "sig", "band.band_idx", "band.band_val")
    left = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
        "band_idx", "band_val",
    )
    right = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
        "band_idx", "band_val",
    )
    cand = (
        left.join(right, on=["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= bands - 1)
        .distinct()
    )
    ua = base.select(F.col("id").alias("id_a"), F.col("unit").alias("ua"))
    ub = base.select(F.col("id").alias("id_b"), F.col("unit").alias("ub"))
    verified = (
        cand.join(ua, "id_a")
        .join(ub, "id_b")
        .filter(_dot(F.col("ua"), F.col("ub")) >= threshold)
    )
    return verified.select("id_a", "id_b", "hamming")


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >= t).

    Dedup variant over the embedding column: normalize once, self-join,
    codegen'd dot product via ``aggregate``/``zip_with`` — no UDF. At
    scale, feed the join through :func:`srp_signature` buckets first
    (same pattern as lsh_topk) to avoid the N^2 pair space; the exact
    form here is the correctness baseline the bucketed variant is
    checked against.
    """
    unit = with_unit_vector(df, vec_col=vec_col).select(
        F.col(id_col).alias("id"), "unit"
    )
    a = unit.select(F.col("id").alias("id_a"), F.col("unit").alias("ua"))
    b = unit.select(F.col("id").alias("id_b"), F.col("unit").alias("ub"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("ua"), F.col("ub"))
    return (
        pairs.withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r"))
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization (the storage/serving form
    of an embedding corpus: 4x smaller than float32, dot products in
    integer SIMD). q_i = round(x_i * 127 / max|x|), zero vectors -> all
    zeros. Pure JVM higher-order functions, map-only, no shuffle.

    Output keeps INTEGER summaries (q_sum / q_min / q_max / n_sat)
    rather than raw doubles so cross-engine comparison is exact: the
    only float op is the single multiply/divide before round, evaluated
    in double with the same literal form on both engines. n_sat counts
    saturated components (|q| = 127) — the clipping audit a quantizer
    report needs.
    """
    emb = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    q = F.when(
        scale == 0, F.transform(emb, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            emb, lambda x: F.round(x * F.lit(127.0) / scale).cast("int")
        )
    )
    return df.select(
        F.col(id_col),
        F.aggregate(
            q, F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
        F.size(F.filter(q, lambda v: F.abs(v) == 127)).alias("n_sat"),
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cluster
    the embedding space, then within each cluster mark every vector
    that has an EARLIER (smaller-id) cluster-mate with cosine >=
    threshold as a semantic duplicate. The kept set (is_dup = false) is
    the semantically-deduplicated corpus. Output: (id_col, cluster,
    is_dup). Zero-norm / NULL / unassignable vectors have no cosine
    direction (or no cluster) and are never marked duplicates.

    Scale (100 TB): clustering via :func:`clustering.kmeans_assignments`
    (broadcast centroids, partial-agg mean updates); the pair join is
    restricted to WITHIN-cluster pairs, so the pair space is
    sum-of-squared-cluster-sizes, not N^2. The join key is the cluster
    id — its parallelism is k, so at scale k must grow with the corpus
    (SemDeDup uses tens of thousands of clusters, keeping every cluster
    a few thousand vectors); small k here is the test configuration,
    not the deployment shape.
    """
    from .clustering import kmeans_assignments

    assigned = kmeans_assignments(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    unit = with_unit_vector(df, vec_col=vec_col).select(
        F.col(id_col).alias("id"), "unit"
    )
    lab = (
        assigned.select(F.col(id_col).alias("id"), "cluster")
        .join(unit, "id")
        .filter(F.col("cluster").isNotNull() & F.col("unit").isNotNull())
    )
    a = lab.select(
        F.col("id").alias("id_a"),
        F.col("cluster").alias("ca"),
        F.col("unit").alias("ua"),
    )
    b = lab.select(
        F.col("id").alias("id_b"),
        F.col("cluster").alias("cb"),
        F.col("unit").alias("ub"),
    )
    dups = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("id_a") > F.col("id_b")))
        .filter(_dot(F.col("ua"), F.col("ub")) >= threshold)
        .select(F.col("id_a").alias("dup_id"))
        .distinct()
    )
    return assigned.join(
        dups, assigned[id_col] == dups["dup_id"], "left"
    ).select(
        F.col(id_col), "cluster", F.col("dup_id").isNotNull().alias("is_dup")
    )


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Distributed gram (second-moment) matrix: for D-dim embeddings,
    the upper triangle of ``sum_n x_n x_n^T`` as rows ``(i, j, gram)``
    — the reduction that feeds PCA / whitening of an embedding corpus
    (covariance = gram/n - mean mean^T, eigendecomposed driver-side on
    D^2 numbers, projection broadcast back).

    Shape for scale: ``mapInPandas`` computes one D x D partial per
    ARROW BATCH (a single int64 ``Q.T @ Q`` matmul — no per-row or
    per-pair Python), so the shuffle carries D(D+1)/2 rows per batch
    (2,080 for D=64), never the data; the final ``groupBy(i, j)`` agg
    is over #batches * 2,080 tiny rows. Per-batch partials are the
    map-side-combine of dense linear algebra.

    Values are quantized to ``round(v * scale)`` int64 JVM-SIDE (same
    half-up semantics as the money-in-cents queries), so the sum is
    EXACT and order-independent — the property the DuckDB oracle needs.
    At extreme scale int64 partials can overflow (|q| <= 5.3e5 here ->
    ~3e7 rows per pair saturate int64); the production variant keeps
    float64 partials and accepts last-bit drift, same code shape.
    """
    qdf = df.select(
        F.transform(
            F.col(vec_col),
            lambda v: F.round(v.cast("double") * F.lit(scale)).cast("long"),
        ).alias("qe")
    )

    def batches(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["qe"].to_numpy()).astype(np.int64)
            g = q.T @ q
            iu, ju = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "s": g[iu, ju],
                }
            )

    parts = qdf.mapInPandas(batches, schema="i int, j int, s long")
    return parts.groupBy("i", "j").agg(F.sum("s").alias("gram"))


def matryoshka_topk(
    df: DataFrame,
    dims: int = 16,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Matryoshka-truncated retrieval (Kusupati et al. 2022): rank by
    cosine over only the FIRST ``dims`` coordinates, re-normalized.

    This is the cheap-first-pass dial for 100-TB retrieval: a 4x dim
    truncation cuts the dot-product FLOPs and the shuffled bytes 4x
    while MRL-trained embeddings keep most of the recall; the full-dim
    `cosine_topk` (or the SRP/IVF bucketed paths) then re-ranks the
    shortlist. Truncation is a plan-side ``slice`` — no Python, no
    extra shuffle; normalization of the slice happens inside
    ``cosine_topk`` (unit vectors computed once per side)."""
    cut = df.select(
        id_col, F.slice(F.col(vec_col), 1, dims).alias(vec_col)
    )
    qcut = (
        queries.select(id_col, F.slice(F.col(vec_col), 1, dims).alias(vec_col))
        if queries is not None
        else None
    )
    return cosine_topk(cut, k=k, id_col=id_col, vec_col=vec_col, queries=qcut)


def matryoshka_rerank_topk(
    df: DataFrame,
    dims: int = 16,
    k: int = 3,
    shortlist_k: int = 10,
    bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka retrieval the way it is actually deployed (Kusupati
    et al. 2022 §4: "adaptive retrieval" — shortlist with the cheap
    truncated prefix, re-rank the shortlist at full dimension):

    1. SHORTLIST: slice to the first ``dims`` coordinates (plan-side,
       no Python) and run :func:`lsh_topk` over the truncated space —
       SRP bucket equi-join + in-bucket rank, sub-quadratic — keeping
       ``shortlist_k`` candidates per query.
    2. RERANK: one exact FULL-dimension dot product per shortlist
       pair, window top-``k``.

    The FLOPs and shuffled bytes of the candidate stage shrink by
    D/dims, and the full-dim math runs on shortlist_k rows per query
    instead of N. No cartesian product anywhere — this retires
    :func:`matryoshka_topk`'s composition over the quadratic
    ``cosine_topk``, which stays as the oracle baseline.

    Returns (query_id, neighbor_id, rank, sim) with sim the FULL-dim
    cosine. Vectors whose truncated prefix has zero norm have no
    truncated direction and are excluded from both sides (a nonzero
    prefix implies a nonzero full vector, so the full-dim join below
    drops nothing)."""
    from pyspark.sql import Window

    cut = df.select(id_col, F.slice(F.col(vec_col), 1, dims).alias(vec_col))
    short = lsh_topk(
        cut,
        k=shortlist_k,
        bits=bits,
        id_col=id_col,
        vec_col=vec_col,
        dim=dims,
        seed=seed,
    ).select("query_id", "neighbor_id")
    unit = (
        with_unit_vector(df, vec_col)
        .filter(F.col("unit").isNotNull())
        .select(F.col(id_col).alias("id"), "unit")
    )
    scored = (
        short.join(
            unit.select(F.col("id").alias("query_id"), F.col("unit").alias("uq")),
            "query_id",
        )
        .join(
            unit.select(
                F.col("id").alias("neighbor_id"), F.col("unit").alias("un")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("uq"), F.col("un")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def _achlioptas_matrix(in_dims: int, out_dims: int, seed: int) -> np.ndarray:
    """The (in_dims, out_dims) sparse sign matrix of Achlioptas 2003
    ("Database-friendly random projections"): entries +1 / -1 / 0 with
    probability 1/6, 1/6, 2/3, drawn from the repo's seeded-md5 hash60
    convention (``sampling.hash60``) instead of an RNG object — so the
    SAME matrix is reproducible in any engine, on any cluster size, and
    in the DuckDB oracle, with no RNG state to ship."""
    import hashlib

    R = np.zeros((in_dims, out_dims), dtype=np.int64)
    for d in range(in_dims):
        for j in range(out_dims):
            h = int(
                hashlib.md5(f"{seed}:{d}:{j}".encode()).hexdigest()[:15], 16
            )
            m = h % 6
            if m == 0:
                R[d, j] = 1
            elif m == 1:
                R[d, j] = -1
    return R


def jl_project(
    df: DataFrame,
    out_dims: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection, integer-exact.

    The data-INDEPENDENT companion to :func:`matryoshka_topk`'s learned
    truncation: project D-dim embeddings to ``out_dims`` with the
    Achlioptas sparse sign matrix — distances are preserved within
    (1 +- eps) w.h.p. for out_dims ~ O(log n / eps^2), with no training
    pass over the corpus. The 100-TB shape: one ``mapInPandas`` matmul
    per Arrow batch (the gram_matrix pattern — dense linear algebra at
    BLAS speed, no per-row Python), zero exchanges (pure projection),
    and the matrix itself is built INSIDE the UDF per worker from the
    seeded-md5 rule, so no driver job, no broadcast, and no
    input-dimension argument: each batch reads D off its own rows.

    Values are quantized ``round(v * scale)`` (the money-in-cents trick
    shared with :func:`gram_matrix`) BEFORE the +-1 matmul, so the
    output is int64 and bit-identical across engines, partitionings,
    and cluster sizes — what lets a cross-engine oracle hash it.
    Rows with NULL vectors project to NULL; ragged batches are handled
    per distinct length.

    Returns (id_col, proj array<long>). The id field keeps the INPUT
    column's type (string doc ids work) — hardcoding long here would
    make Arrow mis-map any non-long id at runtime.
    """
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, proj array<long>"

    def batches(it):
        import pandas as pd

        cache: dict[int, np.ndarray] = {}
        for pdf in it:
            ids = pdf[id_col]
            vecs = pdf[vec_col]
            proj: list = [None] * len(pdf)
            ok = vecs.notna().to_numpy()
            lens = np.array([len(v) if o else -1 for v, o in zip(vecs, ok)])
            for D in np.unique(lens):
                if D < 0:
                    continue
                rows = np.nonzero(lens == D)[0]
                X = np.asarray(
                    [vecs.iloc[i] for i in rows], dtype=np.float64
                ) * scale
                Q = (np.floor(np.abs(X) + 0.5) * np.sign(X)).astype(np.int64)
                R = cache.get(int(D))
                if R is None:
                    R = _achlioptas_matrix(int(D), out_dims, seed)
                    cache[int(D)] = R
                Y = Q @ R
                for k, i in enumerate(rows):
                    proj[i] = Y[k].tolist()
            yield pd.DataFrame({id_col: ids, "proj": proj})

    return df.select(id_col, vec_col).mapInPandas(batches, schema=out_schema)
