"""Deterministic sampling, splitting, sketching, and sequence packing.

Training-data pipeline operators beyond the reference's own surface
(first-class per the build brief): every large-scale corpus job needs a
reproducible train/val/test split, stratified subsampling, cheap
cardinality estimates, and token-budget sequence packing. All four are
built on one primitive — a deterministic 60-bit hash of a key column —
so results are identical across engines (the DuckDB oracles recompute
the same md5) and across runs/cluster sizes (no RNG, no
``Math.random``-style seeds that differ per executor).

Scale notes (100 TB):
  * ``hash_bucket`` / ``hash_split`` / ``stratified_sample`` are pure
    map-side projections/filters — no shuffle, no state; the split of a
    10^12-row table costs one scan.
  * ``kmv_distinct`` is the K-minimum-values sketch (Bar-Yossef et al.,
    "Counting distinct elements in a data stream", RANDOM 2002): keep
    the k smallest hash values; estimate = (k-1) / h_k with hashes
    normalized to [0,1). The distinct() is one hash-shuffle on a
    fixed-width digest; the global k-smallest compiles to
    TakeOrderedAndProject (per-partition k-row heaps merged once) — no
    global sort at any scale.
  * ``pack_sequences`` packs documents into fixed-token-budget bins for
    LLM batch assembly. Packing is per hash-bucket (PARTITION BY bucket
    in the window), never a single global cumulative sum — buckets pack
    in parallel across executors, so the operator scales by raising
    ``n_buckets`` with the cluster, and assignment stays deterministic
    under any parallelism (the north-rule two-cluster-size criterion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^60 — the hash domain size; 60 bits = 15 md5 hex chars, fits BIGINT.
HASH_DOMAIN = float(1 << 60)


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash of a column (md5 hex prefix -> long).
    Non-string keys are cast to their canonical string form first, so
    Spark and the DuckDB oracle twin hash identical bytes. Oracle twin:
    ``('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15))::UBIGINT``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hash_bucket(col: Column, n_buckets: int) -> Column:
    """Stable bucket id in [0, n_buckets) from a key column. The hash is
    of the VALUE, so bucket membership survives repartitioning, cluster
    resizing, and re-runs — unlike ``rand()`` or ``monotonically
    _increasing_id``-based splits which are plan-dependent."""
    return F.pmod(hash60(col), F.lit(n_buckets))


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a deterministic train/val/test label by hashing
    its id into 100 buckets (map-only; no shuffle, no RNG). A document
    keeps its split forever — the property dataset curation actually
    needs (test-set contamination is irreversible)."""
    b = hash_bucket(F.col(id_col), 100)
    return df.withColumn(
        out_col,
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame, id_col: str, pct: int
) -> DataFrame:
    """Deterministic ~pct% sample: keep rows whose id hashes into the
    first ``pct`` of 100 buckets. Applied after a groupBy key or within
    strata it yields per-stratum rates that converge to pct% without
    any coordination — a filter pushed to the scan."""
    return df.filter(hash_bucket(F.col(id_col), 100) < pct)


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """K-minimum-values distinct-count sketch over ``col``.

    Returns one row: ``k``, ``kth_hash`` (the k-th smallest 60-bit
    hash), and ``est_distinct`` = floor((k-1) * 2^60 / kth_hash).
    Exactly reproducible cross-engine: identical md5 -> identical long
    -> identical IEEE double division -> identical floor. At 100 TB the
    plan is: hash-distinct (one shuffle of 8-byte digests), then
    ``sort.limit(k)`` which Spark compiles to TakeOrderedAndProject —
    per-partition k-row heaps, single k-row merge, never a global sort.
    Fewer than k distinct values means the sketch holds ALL of them —
    report the exact count (the estimator over a non-kth max hash would
    grossly overestimate small cardinalities; same guard as
    corpus_ops.kmv_by_group).
    """
    ks = (
        df.select(hash60(F.col(col)).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return ks.agg(F.count("*").alias("k"), F.max("h").alias("kth_hash")).select(
        "k",
        "kth_hash",
        F.when(F.col("k") < k, F.col("k").cast("long"))
        .otherwise(
            F.floor(
                F.lit(float(k - 1))
                * F.lit(HASH_DOMAIN)
                / F.col("kth_hash").cast("double")
            ).cast("long")
        )
        .alias("est_distinct"),
    )


def hll_distinct_by_group(
    df: DataFrame, col: str, group_col: str, b: int = 8
) -> DataFrame:
    """HyperLogLog distinct-count sketch per group (Flajolet et al.
    2007) — the constant-memory companion to :func:`kmv_distinct`: a
    KMV sketch keeps k hashes, an HLL keeps ``m = 2^b`` 6-bit-ish
    registers regardless of cardinality, and (unlike KMV) two HLLs
    MERGE by register-wise max, which is why production pipelines
    (and Spark's own ``approx_count_distinct``) use it for per-domain
    / per-shard cardinality reports that roll up.

    Register math is INTEGER-exact cross-engine: bucket = top ``b``
    bits of the 60-bit md5 hash, rho = leading zeros of the remaining
    ``w = 60 - b`` bits + 1 via string bit-length (``length(bin(rem))``
    — identical no-leading-zeros semantics in Spark and DuckDB; no
    float log2 anywhere). The harmonic sum is kept SCALED-INTEGER:
    ``s_scaled = sum over all m buckets of 2^(w+1 - M_j)`` (absent
    bucket: M=0) — terms are exact powers of two, the total is < 2^62,
    so the BIGINT sum is order-independent and bit-identical in both
    engines; the float estimate is one literal-constant division off
    it (+ the standard linear-counting small-range branch off the
    integer zero-register count).

    Scale: one shuffle to (group, bucket) registers — at most
    ``groups * m`` rows regardless of corpus size — then one tiny
    group agg. This is the 100-TB cardinality-report shape: the
    corpus-sized side is map-only hashing.

    Output: (group_col, v_zero, s_scaled, est_distinct).
    """
    m = 1 << b
    w1 = 60 - b + 1  # rho of an all-zero remainder window
    h = hash60(F.col(col))
    bucket = F.shiftright(h, 60 - b)
    rem = h.bitwiseAND(F.lit((1 << (60 - b)) - 1))
    rho = F.when(rem == 0, F.lit(w1)).otherwise(
        F.lit(w1) - F.length(F.bin(rem))
    )
    regs = (
        df.select(F.col(group_col), bucket.alias("bucket"), rho.alias("rho"))
        .where(F.col(col).isNotNull())
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("M"))
    )
    per = regs.groupBy(group_col).agg(
        (F.lit(m) - F.count("*")).cast("int").alias("v_zero"),
        (
            (F.lit(m).cast("long") - F.count("*"))
            * F.lit(1 << w1).cast("long")
            + F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({w1} - M AS INT))")
            )
        ).cast("long").alias("s_scaled"),
    )
    # alpha_m * m^2 * 2^(w+1), one Python-computed double inlined as the
    # SAME literal in the oracle — both engines then do one cast + one
    # divide on identical inputs
    factor = ((0.7213 / (1 + 1.079 / m)) * m * m) * float(1 << w1)
    est_raw = F.lit(factor) / F.col("s_scaled").cast("double")
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (F.col("v_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")),
    ).otherwise(est_raw)
    return per.select(
        group_col, "v_zero", "s_scaled", F.round(est, 6).alias("est_distinct")
    )


def cms_estimate(
    df: DataFrame,
    col: str,
    probes: list[str],
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Count-min sketch frequency estimates (Cormode & Muthukrishnan
    2005) — the third constant-memory sketch next to KMV and HLL:
    ``d`` hash rows of ``w`` counters answer "how often does X occur"
    for ANY X with one-sided error (estimate >= truth, overshoot
    bounded by collisions ~ N/w per row, min over d rows). The sketch
    is ``d*w`` counters regardless of corpus size — the standard shape
    for heavy-hitter / frequency telemetry over a 100-TB stream where
    an exact per-token count would itself be a corpus-sized table.

    Everything is INTEGER-exact cross-engine: positions are
    ``hash60(i ':' value) mod w`` (the seeded-md5 convention the
    minhash band hashes use), counters are plain BIGINT counts, and
    the estimate is a MIN over d looked-up counters — no floats
    anywhere. Plan: one map-side d-way explode + one (row, pos)
    hash-agg bounded at ``d*w`` groups; probes are a tiny literal
    relation joined BROADCAST against the sketch.

    Output: one row per probe, ``(token, est_count)`` — absent probes
    report their collision noise (>= 0), never NULL, exactly as a real
    CMS does."""
    spark = df.sparkSession
    cells = df.where(F.col(col).isNotNull()).select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        hash60(F.concat(F.lit(f"{i}:"), F.col(col))),
                        F.lit(w),
                    )
                    for i in range(d)
                ]
            )
        ).alias("row", "pos")
    )
    sketch = cells.groupBy("row", "pos").agg(
        F.count("*").cast("long").alias("cnt")
    )
    probe_df = spark.createDataFrame(
        [(p,) for p in probes], "token string"
    ).select(
        "token",
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        hash60(F.concat(F.lit(f"{i}:"), F.col("token"))),
                        F.lit(w),
                    )
                    for i in range(d)
                ]
            )
        ).alias("row", "pos"),
    )
    # the d*w-row sketch is the broadcast side (the outer/preserved probe
    # side of a left join cannot be the build side)
    looked = probe_df.join(F.broadcast(sketch), ["row", "pos"], "left")
    return looked.groupBy("token").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "est_count"
        )
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Fixed-order sequence packing: concatenate documents (in
    deterministic id order, within hash buckets) into contiguous token
    ranges and assign each doc the bin where its range STARTS —
    ``bin = floor(start_offset / budget)``.

    This is the streaming/fixed-order packing rule used for LLM batch
    assembly: bins are full up to the budget except where one document
    straddles a boundary (it belongs to its start bin). Windows are
    PARTITIONed BY bucket so packing is embarrassingly parallel — the
    global-cumulative-sum formulation would serialize 10^12 rows through
    one partition.

    Adds ``bucket``, ``start_offset``, ``bin`` columns.
    """
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("bucket", hash_bucket(F.col(id_col), n_buckets))
        .withColumn(
            "start_offset",
            F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "bin", F.floor(F.col("start_offset") / F.lit(budget)).cast("int")
        )
    )


def shuffle_positions(
    df: DataFrame, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic global training-shuffle order: every row gets a
    dense position 1..N in md5(id|seed) order — the epoch shuffle of a
    pretraining data loader, reproducible across runs, engines, and
    cluster sizes (new seed = new permutation).

    NOT implemented as one global row_number() window (that collapses
    the table into a single partition). Two-level form instead:

      bucket  = first two hex chars of the key (256 ranges; hex
                lexicographic order == key order, so bucket boundaries
                respect the global order);
      in-rank = row_number() PARTITION BY bucket (parallel, ~N/256
                rows per window partition);
      pos     = broadcast-joined cumulative bucket offset + in-rank.

    Cost at scale: one shuffle on bucket for the windows, one tiny
    (256-row) aggregate for the offsets, one broadcast join. The only
    single-partition window runs over those 256 offset rows, never the
    data. Raising the bucket width (3 hex chars -> 4096) keeps window
    partitions executor-sized at any corpus size.
    """
    key = F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed))))
    bucket = F.substring(key, 1, 2)
    with_key = df.withColumn("_sh_key", key).withColumn("_sh_b", bucket)
    counts = with_key.groupBy("_sh_b").agg(F.count("*").alias("_sh_n"))
    w_off = Window.orderBy("_sh_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_sh_b",
        F.coalesce(F.sum("_sh_n").over(w_off), F.lit(0)).alias("_sh_off"),
    )
    w_in = Window.partitionBy("_sh_b").orderBy("_sh_key")
    return (
        with_key.withColumn("_sh_r", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_sh_b")
        .withColumn(
            "pos", (F.col("_sh_off") + F.col("_sh_r")).cast("long")
        )
        .drop("_sh_key", "_sh_b", "_sh_r", "_sh_off")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 7,
    group_col: str | None = None,
) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis & Spirakis 2006, A-Res):
    each row gets key u^(1/w); the k largest keys are a weighted sample
    without replacement. Computed in the equivalent -ln(u)/w form (k
    SMALLEST win) with u derived DETERMINISTICALLY from the row's
    60-bit hash of (id, seed) at 1e-6 granularity — reproducible across
    runs, cluster sizes, and the DuckDB oracle, unlike ``rand()``.

    Rows with non-positive weight are excluded (zero weight = never
    sampled, exactly the A-Res limit). ``score`` rounds to 9 decimals,
    ties break on id — the cross-engine determinism contract.

    Plan: map-side score projection, then TakeOrderedAndProject for the
    global form (never a full sort); with ``group_col`` a per-group
    row_number window (one shuffle on the group key — per-group state
    is a sort of that group's rows only, the standard top-k-per-key
    shape)."""
    u = (
        hash_bucket(
            F.concat(F.col(id_col).cast("string"), F.lit(f"#w{seed}")),
            1_000_000,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    scored = df.filter(F.col(weight_col) > 0).withColumn(
        "score",
        F.round(-F.log(u) / F.col(weight_col).cast("double"), 9),
    )
    if group_col is None:
        return scored.orderBy("score", id_col).limit(k)
    w = Window.partitionBy(group_col).orderBy("score", id_col)
    return (
        scored.withColumn("_ws_rn", F.row_number().over(w))
        .filter(F.col("_ws_rn") <= k)
        .drop("_ws_rn")
    )
