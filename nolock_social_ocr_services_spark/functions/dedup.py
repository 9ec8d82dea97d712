"""Deduplication operators for training-data pipelines: exact
(hash-groupBy), MinHash+LSH banding, n-gram Jaccard verification, and
SimHash. Built-in expressions end to end — shingling, hashing, banding
and the candidate join all stay JVM-side, so the only shuffles are the
ones the algorithm requires (band-bucket join + final dedup agg), and
every one is on a bounded-cardinality key.

Scale notes:
  * MinHash signatures are computed per-document with ``transform`` /
    ``array_min`` over the shingle array — no explode of shingles, so
    corpus-size x shingle-count rows never materialize;
  * LSH banding explodes only ``bands`` rows per doc (b is small) and
    joins on (band_idx, band_hash) — the classic near-dup join whose key
    cardinality grows with corpus size, keeping partitions balanced;
  * candidate pairs are verified with exact Jaccard over the two
    (deduplicated) shingle arrays via ``array_intersect``/``array_union``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingles(col: Column, k: int = 8) -> Column:
    """Distinct k-char shingle array (empty for short/NULL docs)."""
    n = F.length(col)
    starts = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.when(col.isNull() | (n < k), F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(starts, lambda i: col.substr(i, F.lit(k))))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: per hash family j, min over shingles of
    md5(j || shingle) (string min == min over a random permutation).
    Empty shingle sets get NULL signature."""
    def salted(j: int):
        # NB: must close over j via a factory — a `lambda s, j=j` default
        # arg makes the lambda binary, and pyspark's transform() would
        # then pass the ARRAY INDEX as the second argument, silently
        # replacing the hash-family salt.
        return lambda s: F.md5(F.concat(F.lit(f"{j}:"), s))

    sig = F.array(
        *[
            F.array_min(F.transform(shingle_col, salted(j)))
            for j in range(num_hashes)
        ]
    )
    return F.when(F.size(shingle_col) == 0, F.lit(None).cast("array<string>")).otherwise(sig)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: canonical row = min(id) per md5(text). Returns
    (id, text_hash, canonical_id, is_canonical). One hash-agg shuffle on
    the digest (fixed-width key, immune to giant-document skew)."""
    hashed = df.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_hash")
    )
    canon = hashed.groupBy("text_hash").agg(F.min(id_col).alias("canonical_id"))
    return hashed.join(canon, on="text_hash").withColumn(
        "is_canonical", F.col(id_col) == F.col("canonical_id")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 8,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH.

    rows = (id_a, id_b) with id_a < id_b that collide in >= 1 band.
    b bands x r rows (r = num_hashes/bands): P(candidate) ~ 1-(1-s^r)^b.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(F.col(text_col), k=k), num_hashes).alias("sig"),
    ).filter(F.col("sig").isNotNull())
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws("|", *[F.col("sig")[b * r + i] for i in range(r)])
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band_idx") == F.col("r.band_idx"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs:
    (id_a, id_b, jaccard double). Shingle arrays are joined in (small
    per-doc payload), intersection/union computed with built-ins."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k=k).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, on="id_a").join(b, on="id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return joined.select(
        "id_a",
        "id_b",
        F.when(union == 0, F.lit(0.0))
        .otherwise(inter.cast("double") / union)
        .alias("jaccard"),
    )


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 4
) -> DataFrame:
    """63-bit SimHash per document (63 keeps the value a positive long).

    Idiomatic-at-scale shape: explode shingles -> xxhash64 JVM-side ->
    ONE groupBy(id) with 63 conditional sums. The per-bit sums are
    partially aggregated map-side (hash-agg combine), so the shuffle
    carries one 63-counter row per document, not per shingle. Compare
    documents with ``hamming64``."""
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(shingles(F.col(text_col), k=k)).alias("sh"),
    ).withColumn("h", F.xxhash64("sh"))
    votes = [
        F.sum(
            F.when(F.col("sh").isNull(), F.lit(0)).otherwise(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) != 0, F.lit(1)
                ).otherwise(F.lit(-1))
            )
        ).alias(f"b{j}")
        for j in range(63)
    ]
    sim = F.lit(0).cast("long")
    for j in range(63):
        sim = sim + F.when(
            F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    n_sh = F.sum(F.when(F.col("sh").isNull(), 0).otherwise(1))
    counted = exploded.groupBy("id").agg(*votes, n_sh.alias("n_sh"))
    return counted.select(
        "id",
        F.when(F.col("n_sh") == 0, F.lit(None).cast("long"))
        .otherwise(sim)
        .alias("simhash"),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Bit distance between two SimHash values."""
    return F.bit_count(a.bitwiseXOR(b))
