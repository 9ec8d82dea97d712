"""Corpus-preparation operators for LLM training-data pipelines:
fixed-budget text chunking with overlap, n-gram statistics, vocabulary
construction with OOV coverage, integer-exact TF-IDF term ranking,
per-group KMV distinct sketches, and deterministic source-mixture
sampling.

Everything here is pure `pyspark.sql.functions` — no Python UDFs, no
driver-side loops — so each operator compiles into whole-stage codegen
and its cost is a scan plus at most one or two hash shuffles.

Scale notes (100 TB):
  * ``chunked`` explodes each document into ceil(n/stride) chunks via
    ``F.sequence`` + higher-order ``transform`` on the per-row token
    array — all map-side; chunk count grows with data, never with a
    shuffle key's cardinality.
  * ``ngram_counts`` builds n-grams with ``transform(sequence(...))``
    over the token array per row (map-side), then one hash-agg on the
    n-gram string. Partial aggregation absorbs the Zipf head before the
    exchange, so the shuffle carries per-partition distinct n-grams,
    not corpus positions.
  * ``vocab`` is a count + global top-V: ``orderBy.limit(V)`` compiles
    to TakeOrderedAndProject (per-partition V-row heaps, one merge) —
    no global sort at any scale. OOV joins the Zipf-head vocab back
    with a BROADCAST hint; V is small by construction.
  * ``tfidf_top_terms`` keeps scores in exact integer arithmetic
    (score = tf * SCALE div df) so ranking is bit-identical across
    engines and cluster sizes — no float ulp flips what "top term"
    means between a 10-node and a 1000-node run.
  * ``kmv_by_group`` = per-group k-minimum-values sketch via
    row_number <= k — one shuffle on (group, hash) then one window;
    groups sketch in parallel, sketch size is O(k) per group.
  * ``mixture_sample`` composes per-source hash thresholds, a
    map-only filter (the same determinism contract as
    ``sampling.stratified_sample``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash60, hash_bucket

#: integer scale for exact tf-idf ranking (see tfidf_top_terms)
TFIDF_SCALE = 1_000_000


def words(col: Column) -> Column:
    """Whitespace token array with empty-string guard — the shared
    tokenizer contract with the DuckDB oracles
    (``regexp_split_to_array(trim(text), '\\s+')``)."""
    return F.filter(
        F.split(F.trim(col), r"\s+"), lambda w: w != F.lit("")
    )


def chunked(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into fixed-size token chunks with overlap
    (size - stride tokens shared between neighbours) — the standard
    context-window packing pre-pass for LLM pretraining.

    Chunk i covers tokens [i*stride, i*stride + size); the last chunk
    may be short but is never empty; empty documents yield no chunks.
    Output adds ``chunk_id`` (0-based) and ``chunk_text``; all map-side
    (sequence + slice + array_join on the already-split token array).
    """
    w = words(F.col(text_col))
    n = F.size(w)
    # number of chunks: 1 + floor((n-1)/stride) for n >= 1
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        (n - 1).cast("long") / F.lit(stride) + 1
    ).cast("int")
    return (
        df.withColumn("_words", w)
        .withColumn("_n_chunks", n_chunks)
        .filter(F.col("_n_chunks") > 0)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("_n_chunks") - 1),
                    lambda i: F.array_join(
                        F.slice(F.col("_words"), i * stride + 1, size), " "
                    ),
                )
            ).alias("chunk_id", "chunk_text"),
        )
    )


def ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Corpus n-gram frequency table: one row per distinct space-joined
    n-gram with its occurrence count. N-grams are materialized per row
    (map-side higher-order functions), then hash-aggregated once.
    """
    w = words(F.col(text_col))
    grams = F.when(F.size(w) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
    )
    return (
        df.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, n_occurrences) over the whole corpus."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )


def vocab(df: DataFrame, text_col: str = "text", top_v: int = 256) -> DataFrame:
    """Top-V vocabulary by corpus frequency, deterministic tie-break on
    the token string. ``orderBy.limit`` compiles to
    TakeOrderedAndProject — no global sort."""
    return (
        token_counts(df, text_col)
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_v)
    )


def oov_rate(
    df: DataFrame, text_col: str = "text", top_v: int = 256
) -> DataFrame:
    """Vocabulary coverage: one row with corpus token occurrences, the
    occurrences covered by the top-V vocab, and the OOV rate (exact
    rational rendered as a 6-dp double). The vocab side is tiny by
    construction, so the join is a broadcast. The vocab derives from
    the SAME token_counts frame as the coverage side — calling vocab()
    would rebuild the scan+tokenize+agg pass a second time, doubling
    the most expensive stage at corpus scale."""
    counts = token_counts(df, text_col)
    v = (
        counts.orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(top_v)
        .select("token")
    )
    joined = counts.join(F.broadcast(v).withColumn("_inv", F.lit(1)), "token", "left")
    return joined.agg(
        F.sum("n_occurrences").cast("long").alias("total_occurrences"),
        F.sum(F.when(F.col("_inv").isNotNull(), F.col("n_occurrences")).otherwise(0))
        .cast("long")
        .alias("covered_occurrences"),
        F.round(
            1.0
            - F.sum(
                F.when(F.col("_inv").isNotNull(), F.col("n_occurrences")).otherwise(0)
            ).cast("double")
            / F.sum("n_occurrences").cast("double"),
            6,
        ).alias("oov_rate"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top TF-IDF term per document, ranked in EXACT integer arithmetic.

    score = tf * TFIDF_SCALE div df  (df = document frequency). The
    constant corpus-size factor is dropped (it rescales every term in a
    document identically, so the argmax is unchanged for any monotone
    idf of df... strictly: we rank by tf/df, the idf=1/df variant).
    Integer div keeps the ranking bit-identical across engines and
    cluster sizes — float idf (ln-based) can flip near-ties by one ulp
    and make "the top term" nondeterministic, which poisons hash-based
    regression checks downstream. Ties break on the token string.

    Plan: one (doc, token) hash-agg for tf, one token hash-agg for df
    (partial-agg absorbs the Zipf head), one shuffle join on token,
    one window for the per-doc argmax.
    """
    toks = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = toks.select(id_col, "token").distinct().groupBy("token").agg(
        F.count("*").alias("df")
    )
    # exact integer division, not float: floor(tf*SCALE / df)
    scored = tf.join(dfreq, "token").withColumn(
        "score", F.expr(f"CAST(tf * {TFIDF_SCALE} AS BIGINT) DIV df")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("token").alias("top_term"), "score")
    )


def kmv_by_group(
    df: DataFrame, group_col: str, value_col: str, k: int = 32
) -> DataFrame:
    """Per-group K-minimum-values distinct sketch: for each group the
    k-th smallest 60-bit hash of ``value_col`` and the cardinality
    estimate floor((k-1) * 2^60 / kth_hash). Exact across engines (same
    md5 -> same longs -> same integer floor). One shuffle, one window.
    Groups with fewer than k distinct values report exact counts."""
    from .sampling import HASH_DOMAIN

    hs = (
        df.select(F.col(group_col).alias("grp"), hash60(F.col(value_col)).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    ks = hs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return (
        ks.groupBy("grp")
        .agg(F.count("*").alias("k"), F.max("h").alias("kth_hash"))
        .select(
            F.col("grp").alias(group_col),
            "k",
            "kth_hash",
            F.when(
                F.col("k") < k, F.col("k").cast("long")
            )
            .otherwise(
                F.floor(
                    F.lit(float(k - 1))
                    * F.lit(HASH_DOMAIN)
                    / F.col("kth_hash").cast("double")
                ).cast("long")
            )
            .alias("est_distinct"),
        )
    )


def kmv_sketches(
    df: DataFrame, group_col: str, value_col: str, k: int = 32
) -> DataFrame:
    """Per-group KMV sketch MATERIALIZED as its k-min hash array —
    (grp, sketch: array<long> sorted ascending). Same build shape as
    ``kmv_by_group`` (one shuffle on (group, hash), one window), but
    the sketch itself is kept so sketches can be COMBINED: KMV sketches
    are mergeable summaries (Beyer et al. 2007, "On synopses for
    distinct-value estimation"), which is what makes them usable across
    partitions, shards, and ingest increments at 100 TB."""
    hs = (
        df.select(F.col(group_col).alias("grp"), hash60(F.col(value_col)).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    ks = hs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return ks.groupBy("grp").agg(F.sort_array(F.collect_list("h")).alias("sketch"))


def kmv_overlap_pairs(
    df: DataFrame, group_col: str, value_col: str, k: int = 32
) -> DataFrame:
    """Pairwise distinct-value OVERLAP between groups, estimated from
    KMV sketches alone (no re-scan of the data): for groups A, B the
    k-min of the sketch UNION is itself the KMV sketch of A∪B, and the
    fraction of its members present in BOTH per-group sketches is an
    unbiased Jaccard estimator (Beyer et al. 2007 §5); intersection
    cardinality follows as J * |A∪B|-estimate. The corpus-audit use:
    "how much vocabulary do these two languages/shards share" without
    ever joining token sets.

    Output per (grp_a < grp_b): k_merged, n_both (exact integers from
    the deterministic md5 sketches — the DuckDB oracle reproduces them
    bit-for-bit), jaccard_est (round 6), est_union, est_intersection.

    Scale shape: the sketch build is the only data-sized work; the pair
    combine joins G sketch rows of O(k) longs each (G = group count,
    bounded), entirely in array built-ins."""
    from .sampling import HASH_DOMAIN

    sk = kmv_sketches(df, group_col, value_col, k=k)
    a = sk.select(F.col("grp").alias("grp_a"), F.col("sketch").alias("sk_a"))
    b = sk.select(F.col("grp").alias("grp_b"), F.col("sketch").alias("sk_b"))
    pairs = a.join(b, on=F.col("grp_a") < F.col("grp_b"))
    merged = F.slice(F.array_sort(F.array_union("sk_a", "sk_b")), 1, k)
    n_merged = F.size(merged)
    n_both = F.size(
        F.array_intersect(F.array_intersect(merged, F.col("sk_a")), F.col("sk_b"))
    )
    jaccard = F.round(n_both.cast("double") / n_merged, 6)
    kth = F.element_at(merged, -1)
    est_union = F.when(
        n_merged < k, n_merged.cast("long")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(HASH_DOMAIN) / kth.cast("double")
        ).cast("long")
    )
    return pairs.select(
        F.col("grp_a").alias(f"{group_col}_a"),
        F.col("grp_b").alias(f"{group_col}_b"),
        n_merged.cast("long").alias("k_merged"),
        n_both.cast("long").alias("n_both"),
        jaccard.alias("jaccard_est"),
        est_union.alias("est_union"),
        F.floor(jaccard * est_union.cast("double")).cast("long").alias(
            "est_intersection"
        ),
    )


def mixture_sample(
    df: DataFrame, source_col: str, rates: dict[str, int], id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic source-mixture sampling: keep ``rates[source]`` %
    of each source's rows (hash-threshold per row; sources absent from
    ``rates`` are dropped). This is how pretraining mixtures weight
    corpora (e.g. books 3x upweighted vs web) while staying exactly
    reproducible across runs and cluster sizes. Map-only."""
    b = hash_bucket(F.col(id_col), 100)
    cond = F.lit(False)
    for src, pct in sorted(rates.items()):
        cond = cond | ((F.col(source_col) == src) & (b < pct))
    return df.filter(cond)


def lm_perplexity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style LM quality scoring: train an add-one-smoothed bigram
    model on the corpus itself, then score every document by average
    negative log-probability (and its exp, the perplexity) — the
    standard "how much does this look like the reference corpus" filter
    for pretraining data.

    p(w|u) = (C(u,w) + 1) / (Cctx(u) + V), with Cctx(u) = bigrams
    starting at u and V = distinct corpus tokens. Per-bigram log-probs
    round to 9 decimals and the per-doc average to 6 — the cross-engine
    determinism contract (Spark and DuckDB sum floats in different
    orders; both engines then exp/round bit-identical inputs).

    Shape: two hash aggs build the count tables, one join scores the
    exploded bigram stream, one agg folds per doc. The V scalar rides a
    broadcast 1-row crossJoin. At 100 TB the model trains on a hash
    SAMPLE of the corpus (CCNet trains on a Wikipedia-sized slice, not
    the crawl) and the prob table broadcasts — the scoring pass is then
    map-side; semantics identical, code path the same join.

    Docs with < 2 tokens have no bigrams and produce no row."""
    w = words(F.col(text_col))
    # one tokenized projection feeds BOTH the bigram stream and the
    # vocabulary count — tokenizing twice would add a whole extra
    # scan+regex pass over the corpus (at the 100-TB target, persist
    # this projection or train on the hash sample noted above).
    tokd = df.select(F.col(id_col), w.alias("ws"))
    toks = tokd.filter(F.size("ws") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.struct(
            F.element_at("ws", i).alias("u"),
            F.element_at("ws", i + 1).alias("w"),
        ),
    )
    big = toks.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, F.col("p.u").alias("u"), F.col("p.w").alias("w")
    )
    bigc = big.groupBy("u", "w").agg(F.count("*").alias("cuw"))
    ctx = bigc.groupBy("u").agg(F.sum("cuw").alias("cu"))
    vt = tokd.select(F.explode("ws").alias("token")).agg(
        F.countDistinct("token").alias("v")
    )
    probs = (
        bigc.join(ctx, on="u")
        .crossJoin(F.broadcast(vt))
        .select(
            "u",
            "w",
            F.round(
                F.log((F.col("cuw") + F.lit(1.0)) / (F.col("cu") + F.col("v"))),
                9,
            ).alias("logp"),
        )
    )
    scored = (
        big.join(probs, on=["u", "w"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("logp").alias("alp"),
        )
    )
    anlp = F.round(-F.col("alp"), 6)
    return scored.select(
        id_col,
        "n_bigrams",
        anlp.alias("avg_neg_logp"),
        F.round(F.exp(anlp), 4).alias("ppl"),
    )


def top_ngram_char_frac(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher repetition filter (Rae et al. 2021, appendix A1.1):
    per-document fraction of characters contained in occurrences of the
    document's most frequent n-gram. High values flag template/boiler-
    plate documents that token-level stats miss. Output: (id_col,
    top_ngram, n_occ, char_frac) where char_frac = n_occ *
    len(top_ngram) / len(space-joined token stream), rounded to 6dp;
    ties on the count break to the lexicographically smallest n-gram so
    the answer is deterministic across engines and cluster sizes.
    Documents with fewer than ``n`` tokens have no n-gram and no row.

    Scale (100 TB): n-grams materialize map-side on the per-row token
    array (no corpus-position explosion beyond one row per gram
    occurrence); ONE hash-agg on (doc, gram) with map-side partial
    aggregation; the argmax window partitions by the document id, so
    its partition size is bounded by one document's distinct grams —
    never by the corpus.
    """
    w = words(F.col(text_col))
    grams = F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
    )
    base = df.select(
        F.col(id_col),
        F.length(F.array_join(w, " ")).alias("_chars"),
        F.explode(grams).alias("ngram"),
    )
    counted = base.groupBy(id_col, "_chars", "ngram").agg(
        F.count("*").alias("n_occ")
    )
    win = Window.partitionBy(id_col).orderBy(
        F.desc("n_occ"), F.asc("ngram")
    )
    return (
        counted.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            id_col,
            F.col("ngram").alias("top_ngram"),
            "n_occ",
            F.round(
                F.col("n_occ") * F.length("ngram") / F.col("_chars"), 6
            ).alias("char_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: annotate every training document with
    the number of distinct word ``n``-grams it shares with an eval
    benchmark (GPT-3's appendix-C 13-gram rule; same shape as Dolma's
    and The Pile's decontamination passes). Downstream either drops
    flagged docs or excises the overlapping windows.

    Scale (100 TB corpus, small benchmark — the real-world asymmetry):
      * the benchmark side collapses to DISTINCT n-grams and rides a
        BROADCAST hint, so the corpus-side probe is a map-side
        broadcast hash join — the corpus itself NEVER shuffles;
      * n-gram construction is ``transform(sequence(...))`` over each
        row's token array (codegen'd, map-side, no Python);
      * only the join survivors (matching (doc, ngram) pairs — tiny by
        construction: eval sets are ~1e4 docs) reach the hash-agg
        exchange, and the per-doc hit counts re-attach to the corpus
        through a second broadcast join, so the full pipeline touches
        the big table with zero wide shuffles of it.

    Returns ``docs`` plus ``hit_ngrams`` (distinct shared n-grams, 0 if
    clean) and ``contaminated`` (bool). Docs shorter than ``n`` tokens
    carry no n-grams and are never flagged.
    """
    w = words(F.col(text_col))
    grams = F.when(
        F.size(w) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
    )
    bench_ngrams = (
        benchmark.select(F.explode(grams).alias("ngram")).distinct()
    )
    hits = (
        docs.select(F.col(id_col), F.explode(grams).alias("ngram"))
        .join(F.broadcast(bench_ngrams), "ngram")
        .groupBy(id_col)
        .agg(F.count_distinct("ngram").alias("hit_ngrams"))
    )
    return (
        docs.join(F.broadcast(hits), id_col, "left")
        .withColumn("hit_ngrams", F.coalesce("hit_ngrams", F.lit(0)))
        .withColumn("contaminated", F.col("hit_ngrams") > 0)
    )


def decontaminate_excise(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply side of :func:`decontaminate`: instead of dropping flagged
    docs, excise exactly the tokens covered by a shared ``n``-gram and
    rebuild the remaining text (GPT-3 removes a window around each
    collision rather than the whole document; this is the deterministic
    token-exact version of that rule). Fully-contaminated docs come
    back with EMPTY text, not absent — the row-count contract callers
    audit removal rates against.

    Same scale shape as ``decontaminate``: the benchmark collapses to
    distinct n-grams and broadcasts, the corpus-side probe is a
    map-side broadcast hash join, and the per-doc hit-position lists
    (tiny: positions of matches only) re-attach through a second
    broadcast join. The excision itself is pure higher-order functions
    over each row's token array — no shuffle of the corpus, no Python.

    Returns (id_col, clean_text, n_removed) with ``clean_text``
    token-normalized (single-space joined, the same rebuild contract as
    ``chunked`` / ``dedup.block_dedup_apply``).
    """
    w = words(F.col(text_col))
    grams = F.when(
        F.size(w) < n,
        F.array().cast("array<struct<pos:int,ngram:string>>"),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.array_join(F.slice(w, i, n), " ").alias("ngram"),
            ),
        )
    )
    bench_ngrams = (
        benchmark.select(
            F.explode(grams).alias("g")
        ).select(F.col("g.ngram").alias("ngram")).distinct()
    )
    hitpos = (
        docs.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.ngram").alias("ngram"))
        .join(F.broadcast(bench_ngrams), "ngram")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("hitpos"))
    )
    hp = F.coalesce(F.col("hitpos"), F.array().cast("array<int>"))
    toks = F.filter(
        F.transform(
            w,
            lambda tok, i: F.struct(
                tok.alias("w"), (i + 1).alias("j")
            ),
        ),
        lambda s: ~F.exists(
            hp, lambda p: (p <= s["j"]) & (s["j"] < p + n)
        ),
    )
    return (
        docs.join(F.broadcast(hitpos), id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(
                F.transform(toks, lambda s: s["w"]), " "
            ).alias("clean_text"),
            (F.size(w) - F.size(toks)).cast("long").alias("n_removed"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    score every document by how target-like its hashed n-gram profile
    is, log w(x) = sum_b n_b(x) * log(p_target(b) / p_raw(b)), where
    n_b counts the doc's unigrams+bigrams hashed into bucket b and the
    two bucket distributions are add-one-smoothed from the target rows
    (``is_target``) vs the raw rest. The paper hashes into 10k buckets;
    ``n_buckets`` is the same machinery at a test-friendly size.

    Shape: one tokenize+explode builds the (doc, bucket) gram stream;
    ONE hash-agg over it yields both distributions (B rows — target
    count and raw count per bucket via conditional sums); the log-ratio
    table crossJoins the 1-row totals and BROADCASTS into the scoring
    join, so the corpus-sized side never shuffles for the model — the
    only corpus-keyed exchange is the per-doc partial-agg sum. At
    100 TB the ratio table is still exactly B rows; the paper's 10k
    buckets broadcast as trivially as 64.

    Determinism contract (shared with lm_perplexity): per-bucket log
    ratio rounds to 9 decimals, the per-doc sum to 6 — Spark and the
    DuckDB oracle then compare bit-identical values. Docs with zero
    tokens produce no row (they have no gram mass to weigh)."""
    w = words(F.col(text_col))
    toks = df.select(
        F.col(id_col), is_target.cast("int").alias("is_t"), w.alias("ws")
    ).filter(F.size("ws") >= 1)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("ws", i), F.element_at("ws", i + 1)
        ),
    )
    grams = toks.select(
        id_col,
        "is_t",
        F.explode(
            F.when(F.size("ws") >= 2, F.concat("ws", bigrams)).otherwise(
                F.col("ws")
            )
        ).alias("gram"),
    ).select(id_col, "is_t", hash_bucket(F.col("gram"), n_buckets).alias("b"))
    bstats = grams.groupBy("b").agg(
        F.sum("is_t").alias("ct"),
        F.sum(F.lit(1) - F.col("is_t")).alias("cr"),
    )
    tot = bstats.agg(
        F.sum("ct").alias("tott"), F.sum("cr").alias("totr")
    )
    ratio = bstats.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                ((F.col("ct") + F.lit(1.0)) * (F.col("totr") + F.lit(float(n_buckets))))
                / ((F.col("cr") + F.lit(1.0)) * (F.col("tott") + F.lit(float(n_buckets))))
            ),
            9,
        ).alias("logr"),
    )
    return (
        grams.join(F.broadcast(ratio), on="b")
        .groupBy(id_col)
        .agg(
            F.first("is_t").alias("is_t"),
            F.count("*").alias("n_grams"),
            F.round(F.sum("logr"), 6).alias("log_w"),
        )
        .select(
            id_col,
            F.col("is_t").cast("int").alias("is_target"),
            F.col("n_grams").cast("long").alias("n_grams"),
            "log_w",
        )
    )


def dsir_select(
    df: DataFrame,
    is_target: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    gumbel_seed: int | None = None,
) -> DataFrame:
    """DSIR selection: the top-``k`` most target-like RAW documents by
    importance weight (target rows define the distribution, only raw
    rows compete for selection). With ``gumbel_seed`` the paper's
    Gumbel-top-k resampling is applied DETERMINISTICALLY: u is the
    document's 60-bit hash of (id, seed) mapped to (0,1) at 1e-6
    granularity, g = -ln(-ln(u)) rounded to 6 decimals — reproducible
    across runs, cluster sizes, and in the DuckDB oracle, unlike
    ``rand()``. Plan: weights (see dsir_log_weights) then a top-k —
    TakeOrderedAndProject, never a global sort."""
    lw = dsir_log_weights(
        df, is_target, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    ).filter(F.col("is_target") == 0)
    score = F.col("log_w")
    if gumbel_seed is not None:
        u = (
            hash_bucket(
                F.concat(F.col(id_col).cast("string"), F.lit(f"#g{gumbel_seed}")),
                1_000_000,
            ).cast("double")
            + F.lit(0.5)
        ) / F.lit(1_000_000.0)
        score = score + F.round(-F.log(-F.log(u)), 6)
    return (
        lw.select(
            id_col,
            "n_grams",
            "log_w",
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def domain_cap(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    quota_scale: int = 8,
) -> DataFrame:
    """Per-domain quota subsampling (RefinedWeb-style domain caps,
    Penedo et al. 2023; the sqrt quota is temperature-flattened mixing
    a la Raffel et al. 2020): a domain with n docs keeps at most
    quota = min(n, ceil(quota_scale * sqrt(n))) of them, so giant
    domains are capped ~proportionally to sqrt(n) while small domains
    pass through whole — no single crawl host dominates the corpus.

    Determinism: membership is a hash-threshold per row — keep iff
    hash_bucket(id, 1e6) < (quota * 1e6) DIV n — all-integer threshold
    arithmetic (sqrt/ceil are correctly-rounded IEEE doubles in both
    engines), so the kept set is identical across runs, cluster sizes,
    and the DuckDB oracle. The kept count is hash-approximate (~quota,
    not exactly quota), the standard trade for a map-only plan: the
    alternative exact-quota form is a per-domain row_number window —
    a per-domain sort a hot domain turns into a straggler.

    Shape: ONE tiny hash-agg (domain counts), thresholds broadcast
    back, then a map-side filter at scan speed. Adds ``cap_quota`` and
    ``cap_threshold`` columns for audit; at 100 TB the domain table is
    O(domains) rows and broadcasts."""
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_src"))
    quotas = counts.select(
        source_col,
        "n_src",
        F.least(
            F.col("n_src"),
            F.ceil(F.lit(float(quota_scale)) * F.sqrt(F.col("n_src"))).cast(
                "long"
            ),
        ).alias("cap_quota"),
    ).withColumn(
        "cap_threshold", F.expr("(cap_quota * 1000000) DIV n_src")
    )
    return (
        df.join(F.broadcast(quotas), on=source_col)
        .filter(hash_bucket(F.col(id_col), 1_000_000) < F.col("cap_threshold"))
        .drop("n_src")
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", iters: int = 3
) -> tuple[DataFrame, list[tuple]]:
    """Distributed BPE tokenizer training (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units"):
    learn ``iters`` merge rules over the corpus. Classic BPE trains on
    the WORD-FREQUENCY table, not the raw token stream — the first agg
    collapses a 100-TB corpus to O(vocabulary) rows, and every later
    round runs over that small table. Each round: adjacent-symbol pairs
    weighted by word frequency -> one hash-agg -> argmax via
    TakeOrdered(1) (a single row to the driver, the same per-round
    scalar kmeans_fit collects) -> the merge applied map-side with an
    ``aggregate`` HOF (greedy left-to-right non-overlapping: a symbol
    merges with the accumulator's LAST element iff that element is the
    rule's left side — "aaa" under (a,a) becomes ["aa","a"]).

    Deterministic by construction: counts are integers; the argmax
    tie-break is (count DESC, left ASC, right ASC) in binary collation
    — no float anywhere, so the DuckDB oracle unrolls the same rounds
    and matches bit-for-bit. Returns (segmented_words, merges):
    ``segmented_words`` = (word, freq, syms array) after all merges,
    ``merges`` = [(iter, left, right, merged, pair_count)].

    At 100 TB: persist the word-frequency table between rounds (the
    lineage otherwise re-derives t nested HOF applications each round);
    everything after the first agg is vocabulary-sized."""
    wf = (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    cur = wf.select(
        "word",
        "freq",
        F.expr(
            "transform(sequence(1, length(word)),"
            " i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    merges: list[tuple] = []
    for t in range(iters):
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "struct(element_at(syms, i) AS l,"
                        " element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .select("freq", "p.l", "p.r")
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merged = b["l"] + b["r"]
        merges.append((t + 1, b["l"], b["r"], merged, int(b["cnt"])))
        l_lit, r_lit, m_lit = F.lit(b["l"]), F.lit(b["r"]), F.lit(merged)
        cur = cur.withColumn(
            "syms",
            F.aggregate(
                "syms",
                F.expr("CAST(array() AS array<string>)"),
                lambda out, x: F.when(
                    (F.size(out) > 0)
                    & (F.element_at(out, -1) == l_lit)
                    & (x == r_lit),
                    F.concat(
                        F.slice(out, F.lit(1), F.size(out) - 1),
                        F.array(m_lit),
                    ),
                ).otherwise(F.concat(out, F.array(x))),
            ),
        )
    return cur, merges


def bpe_segment(
    df: DataFrame,
    text_col: str = "text",
    iters: int = 3,
    top_words: int = 100,
) -> DataFrame:
    """The distributed face of bpe_train: the ``top_words``
    highest-frequency words with their post-merge segmentation
    (space-joined symbols). orderBy+limit compiles to
    TakeOrderedAndProject — never a global sort."""
    cur, _ = bpe_train(df, text_col=text_col, iters=iters)
    return (
        cur.select(
            "word",
            F.col("freq").cast("long").alias("freq"),
            F.array_join("syms", " ").alias("seg"),
        )
        .orderBy(F.desc("freq"), "word")
        .limit(top_words)
    )


def char_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    classic gibberish/low-diversity signal: keyboard mash and repeated
    filler score far below natural text (~3.5-4.5 bits/char for
    English), binary-ish blobs score near log2(alphabet).

    Computed entirely PER ROW with higher-order functions — H =
    log2(N) - (1/N) * sum_c count(c) * log2(count(c)) over the row's
    characters — so the plan is map-only at scan speed: zero shuffles,
    zero Python, nothing leaves the row. Cost is O(distinct_chars *
    len) per row (alphabet is small; len bounded by the doc).

    Determinism contract: each distinct-char term rounds to 9 decimals,
    the per-doc entropy to 6 (the lm_perplexity contract — both engines
    then round bit-identical inputs). Empty/NULL docs produce no row."""
    chars = F.filter(
        F.split(F.col(text_col), ""), lambda c: c != F.lit("")
    )
    d = df.select(F.col(id_col), chars.alias("cs")).filter(
        F.size("cs") >= 1
    )
    return d.select(
        id_col,
        F.size("cs").cast("long").alias("n_chars"),
        _entropy_bits_of_chars(F.col("cs")).alias("entropy_bits"),
    )


def _entropy_bits_of_chars(cs: Column) -> Column:
    """Shannon bits/char of a non-empty char array (the char_entropy
    formula as a reusable Column — see char_entropy for the contract).
    Caller guarantees size >= 1."""
    # sorted distinct chars: the float terms then sum in the SAME order
    # in Spark and the DuckDB oracle (binary collation both sides), so
    # the 6-decimal round sees bit-identical input
    terms = F.transform(
        F.array_sort(F.array_distinct(cs)),
        lambda c: F.round(
            F.size(F.filter(cs, lambda x: x == c))
            * F.log2(F.size(F.filter(cs, lambda x: x == c))),
            9,
        ),
    )
    n = F.size(cs)
    return F.round(
        F.log2(n)
        - F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t) / n,
        6,
    )


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_entropy_bits: float = 2.0,
    max_dup_token_pct: int = 80,
) -> DataFrame:
    """The end-to-end curation verdict pass — the single call a corpus
    release runs, composing the individually-verified gates in the
    standard cheap-to-expensive order:

      too_short    n_tokens < min_tokens
      low_entropy  char entropy (bits/char) < min_entropy_bits
      repetitive   duplicate-token fraction > max_dup_token_pct %
                   (all-integer compare: 100*(n - distinct) > pct*n)
      dup          not the min-doc_id owner of the text's md5 digest
      kept         everything else

    One verdict per document (first failing rule wins — rule order is
    the contract). Scale shape: every gate except ``dup`` is per-row
    HOF arithmetic computed in ONE map-side projection; the dedup rank
    then shuffles only (id, digest, n_tokens, flags) — the text itself
    NEVER crosses the exchange, so the shuffle is ~tens of bytes/row at
    any corpus size. Rows failing a map-side gate still flow through
    the rank, which is semantically free: identical digests imply
    identical text, hence identical map-side verdicts for the whole
    group. Window partitions are bounded by duplicate-group size.
    """
    toks = words(F.col(text_col))
    n_tokens = F.size(toks)
    flags = df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("digest"),
        n_tokens.cast("long").alias("n_tokens"),
        (n_tokens < min_tokens).alias("f_short"),
        F.when(
            n_tokens < min_tokens, F.lit(False)
        ).otherwise(
            _entropy_bits_of_chars(
                F.filter(
                    F.split(F.col(text_col), ""),
                    lambda c: c != F.lit(""),
                )
            )
            < min_entropy_bits
        ).alias("f_entropy"),
        (
            100 * (n_tokens - F.size(F.array_distinct(toks)))
            > max_dup_token_pct * n_tokens
        ).alias("f_rep"),
    )
    rk = F.row_number().over(
        Window.partitionBy("digest").orderBy(id_col)
    )
    return flags.withColumn("rk", rk).select(
        id_col,
        "n_tokens",
        F.when(F.col("f_short"), F.lit("too_short"))
        .when(F.col("f_entropy"), F.lit("low_entropy"))
        .when(F.col("f_rep"), F.lit("repetitive"))
        .when(F.col("rk") > 1, F.lit("dup"))
        .otherwise(F.lit("kept"))
        .alias("verdict"),
    )


def token_budget_plan(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    max_epochs_milli: int = 4000,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Data-recipe planner: per-source epoch/repeat factors for a token
    budget (the Llama/DoReMi mixture-table computation).

    Given integer mixture weights (parts of ``sum(weights)``), a total
    token budget, and a repeat ceiling in milli-epochs (4000 = each
    source may be seen at most 4x), emits one row per weighted source:

      have_tokens   tokens available in the corpus
      need_tokens   budget * weight / total_weight   (floor)
      epochs_milli  ceil(1000 * need / have), capped at the ceiling
      planned_tokens min(need, have * ceiling / 1000)
      deficit_tokens need - planned  (unfillable without more data)

    ALL-INTEGER arithmetic — the plan is bit-identical across engines
    and cluster sizes. Cost at 100 TB: one hash-agg over the corpus
    (partial agg absorbs everything map-side; #sources rows cross the
    wire), then a BROADCAST join against the recipe table and scalar
    math on the agg result. Weighted sources absent from the corpus
    leave their budget share unallocated, faithfully to the recipe.
    """
    w_total = sum(weights.values())
    wdf = df.sparkSession.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())],
        "source string, weight long",
    ).withColumnRenamed("source", source_col)
    have = df.groupBy(source_col).agg(
        F.sum(F.size(words(F.col(text_col)))).alias("have_tokens")
    )
    j = have.join(F.broadcast(wdf), on=source_col, how="inner")
    need = F.expr(f"({budget_tokens} * weight) DIV {w_total}")
    j = j.withColumn("need_tokens", need)
    epochs = F.least(
        F.lit(max_epochs_milli).cast("long"),
        F.expr("(1000 * need_tokens + have_tokens - 1) DIV have_tokens"),
    )
    j = j.withColumn(
        "epochs_milli",
        F.when(F.col("have_tokens") == 0, F.lit(0).cast("long")).otherwise(
            epochs
        ),
    )
    planned = F.least(
        F.col("need_tokens"),
        F.expr(f"(have_tokens * {max_epochs_milli}) DIV 1000"),
    )
    j = j.withColumn(
        "planned_tokens",
        F.when(F.col("have_tokens") == 0, F.lit(0).cast("long")).otherwise(
            planned
        ),
    )
    return j.select(
        source_col,
        "have_tokens",
        "weight",
        "need_tokens",
        "epochs_milli",
        "planned_tokens",
        (F.col("need_tokens") - F.col("planned_tokens")).alias(
            "deficit_tokens"
        ),
    )


def bpe_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    iters: int = 3,
) -> DataFrame:
    """Tokenizer-fertility report: how well the learned BPE vocabulary
    fits each corpus slice (per language/source) — the standard
    tokenizer-evaluation table (subwords per word and chars per
    subword; high fertility on a language = that language pays more
    sequence length per word).

    ALL-INTEGER outputs (counts + milli-ratios by integer division) so
    the report hashes identically across engines. Scale shape: merges
    train on the global word-frequency table (bpe_train); the per-group
    stats need one (group, word) hash-agg over the corpus — partial agg
    collapses each partition to its distinct words before the exchange
    — then a BROADCAST join against the vocabulary-sized segmentation
    table and one tiny per-group agg.
    """
    seg, _ = bpe_train(df, text_col=text_col, iters=iters)
    wl = (
        df.select(
            F.col(group_col),
            F.explode(words(F.col(text_col))).alias("word"),
        )
        .groupBy(group_col, "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    j = wl.join(F.broadcast(seg.select("word", "syms")), on="word")
    rep = j.groupBy(group_col).agg(
        F.sum("freq").alias("n_words"),
        F.sum(F.col("freq") * F.size("syms")).alias("n_subwords"),
        F.sum(F.col("freq") * F.length("word")).alias("n_chars"),
    )
    return rep.select(
        group_col,
        "n_words",
        "n_subwords",
        "n_chars",
        F.expr("(1000 * n_subwords) DIV n_words").alias(
            "fertility_milli"
        ),
        F.expr("(1000 * n_chars) DIV n_subwords").alias(
            "chars_per_subword_milli"
        ),
    )


def bpe_encode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = 3,
) -> DataFrame:
    """Tokenize the corpus with the learned BPE merges — the apply side
    of bpe_train, in the shape real 100-TB tokenization takes: the
    word -> segmentation table is VOCABULARY-sized and BROADCASTS, the
    corpus explodes its words map-side and picks up each word's subword
    array from the broadcast, so the corpus never shuffles to be
    tokenized (the only exchanges are inside training itself). Returns
    the (doc, subword) stream in document word order."""
    seg, _ = bpe_train(df, text_col=text_col, iters=iters)
    wtoks = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("word")
    )
    return wtoks.join(
        F.broadcast(seg.select("word", "syms")), on="word"
    ).select(id_col, F.explode("syms").alias("subword"))


def nb_quality(
    df: DataFrame,
    is_ref: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-3-style learned quality classifier (Brown et al. 2020,
    Appendix A): train on "reference corpus vs rest" and score every
    document by how reference-like it reads. The closed-form distributed
    trainer is multinomial Naive Bayes — per word token t,
    logr(t) = ln( ((C_ref(t)+1) * (N_rest+V)) / ((C_rest(t)+1) * (N_ref+V)) )
    (add-one smoothing, V = corpus vocabulary size), and a document's
    log-odds is the sum of logr over its token OCCURRENCES plus the
    class-prior log ratio; ``p_hq`` squashes it through the logistic.
    This is the slot pipeline.py reserves for a learned classifier —
    the fastText/LR classifier of the paper differs only in where the
    weights come from; the scoring join is identical.

    Shape: one tokenize+explode feeds ONE hash-agg over tokens that
    yields both class counts via conditional sums (vocab-sized output);
    totals and priors are 1-row aggs riding broadcast crossJoins; the
    weight table BROADCASTS into the scoring join, so the corpus-sized
    stream shuffles only for the final per-doc sum. At 100 TB the model
    is still vocab-sized, and training can run on a hash sample without
    touching the scoring path.

    Determinism contract (shared with lm_perplexity / dsir): per-token
    log ratios and the prior round to 9 decimals, per-doc outputs to 6.
    Token-less docs produce no row (no evidence, score undefined)."""
    w = words(F.col(text_col))
    toks = df.select(
        F.col(id_col), is_ref.cast("int").alias("is_r"), w.alias("ws")
    )
    prior = toks.agg(
        F.sum("is_r").alias("n_ref"),
        F.sum(F.lit(1) - F.col("is_r")).alias("n_rest"),
    )
    stream = toks.filter(F.size("ws") >= 1).select(
        id_col, "is_r", F.explode("ws").alias("token")
    )
    counts = stream.groupBy("token").agg(
        F.sum("is_r").alias("cp"),
        F.sum(F.lit(1) - F.col("is_r")).alias("cn"),
    )
    tot = counts.agg(
        F.sum("cp").alias("tp"), F.sum("cn").alias("tn"),
        F.count("*").alias("v"),
    )
    model = counts.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            F.log(
                ((F.col("cp") + F.lit(1.0)) * (F.col("tn") + F.col("v")))
                / ((F.col("cn") + F.lit(1.0)) * (F.col("tp") + F.col("v")))
            ),
            9,
        ).alias("logr"),
    )
    logit = F.round(
        F.col("s")
        + F.round(F.log(F.col("n_ref") * F.lit(1.0) / F.col("n_rest")), 9),
        6,
    )
    return (
        stream.join(F.broadcast(model), on="token")
        .groupBy(id_col)
        .agg(
            F.first("is_r").alias("is_r"),
            F.count("*").alias("n_tokens"),
            F.sum("logr").alias("s"),
        )
        .crossJoin(F.broadcast(prior))
        .select(
            F.col(id_col),
            F.col("is_r").cast("int").alias("is_ref"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            logit.alias("nb_logit"),
        )
        .withColumn(
            "p_hq",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("nb_logit"))), 6
            ),
        )
    )


def pareto_keep(
    scored: DataFrame,
    alpha: float = 9.0,
    p_col: str = "p_hq",
    id_col: str = "doc_id",
    salt: str = "pareto",
) -> DataFrame:
    """GPT-3's stochastic quality threshold: keep a document iff
    ``np.random.pareto(alpha) > 1 - score`` — high-scoring docs almost
    always survive, low-scoring docs survive with a heavy-tailed small
    probability, so the filtered corpus keeps some diversity instead of
    a hard cliff. The draw is DERANDOMIZED the way every sampler here
    is: u = hash60(salt:doc_id) / 2^60 and the Lomax inverse CDF
    draw = (1-u)^(-1/alpha) - 1, so the keep set is a pure function of
    (doc_id, salt, alpha) — identical across re-runs, engines, and
    cluster sizes. Map-side only: adds zero exchanges to the scored
    plan. Draw and threshold round to 6 before the comparison so both
    engines compare bit-identical values."""
    u = hash60(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))) / F.lit(
        float(1 << 60)
    )
    draw = F.round(
        F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0), 6
    )
    return scored.withColumn(
        "keep", draw > F.round(F.lit(1.0) - F.col(p_col), 6)
    )
