"""Tests for deterministic sampling / splitting / KMV sketch / packing
(functions/sampling.py). The properties under test are the ones a
training-data pipeline actually relies on: split stability under
repartitioning, sample-rate convergence, sketch accuracy, and the
packing invariant (every bin except a bucket's last holds >= budget
tokens counting the straddling doc).
"""

import pyspark.sql.functions as F
import pytest

from nolock_social_ocr_services_spark.functions import sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_split_rates_and_determinism(spark, docs):
    split = sampling.with_split(docs, id_col="doc_id")
    rates = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    total = sum(rates.values())
    assert total == docs.count()
    # hash split converges to 90/5/5 — allow slack at tiny SF
    assert 0.80 <= rates["train"] / total <= 0.97
    assert rates.get("val", 0) > 0 and rates.get("test", 0) > 0

    # plan-independence: same labels after an arbitrary repartition
    a = {r["doc_id"]: r["split"] for r in split.select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.with_split(docs.repartition(7), id_col="doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_split_is_map_only(docs):
    plan = sampling.with_split(docs, id_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection: no shuffle


def test_stratified_sample_rate_and_subset(docs):
    s = sampling.stratified_sample(docs, "doc_id", pct=7)
    n, total = s.count(), docs.count()
    assert 0.02 <= n / total <= 0.15
    # sample(5) is a subset of sample(7): nested by construction
    s5 = set(
        r["doc_id"]
        for r in sampling.stratified_sample(docs, "doc_id", pct=5)
        .select("doc_id")
        .collect()
    )
    s7 = set(r["doc_id"] for r in s.select("doc_id").collect())
    assert s5 <= s7


def test_kmv_estimate_accuracy(spark, docs):
    words = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    truth = words.distinct().count()
    row = sampling.kmv_distinct(words, "word", k=64).collect()[0]
    assert row["k"] == min(64, truth)
    if truth > 64:
        assert abs(row["est_distinct"] - truth) / truth < 0.25


def test_pack_sequences_invariants(spark):
    rows = [(i, 100 + (i * 37) % 400) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = sampling.pack_sequences(
        df, "n_tokens", id_col="doc_id", budget=1000, n_buckets=4
    ).collect()
    assert len(packed) == 300
    by_bucket = {}
    for r in sorted(packed, key=lambda r: (r["bucket"], r["start_offset"])):
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rs in by_bucket.items():
        # offsets are a contiguous prefix-sum within the bucket
        off = 0
        for r in rs:
            assert r["start_offset"] == off
            assert r["bin"] == off // 1000
            off += r["n_tokens"]
        # every bin except the last spans >= budget tokens (start of the
        # first doc of bin b+1 is past bin b's budget boundary)
        bins = sorted(set(r["bin"] for r in rs))
        assert bins == list(range(len(bins)))  # no empty bins


def test_shuffle_positions_dense_permutation(spark):
    from nolock_social_ocr_services_spark.functions import sampling

    df = spark.createDataFrame(
        [(f"doc-{i:04d}",) for i in range(500)], "doc_id string"
    )
    got = sampling.shuffle_positions(df).collect()
    # dense 1..N, each exactly once
    assert sorted(r.pos for r in got) == list(range(1, 501))
    # matches the single-window definition: rank of md5(id|seed)
    import hashlib

    def key(d):
        return hashlib.md5(f"{d}|42".encode()).hexdigest()

    want = {
        d: i + 1
        for i, d in enumerate(
            sorted((r.doc_id for r in got), key=key)
        )
    }
    assert {r.doc_id: r.pos for r in got} == want


def test_shuffle_positions_stable_under_repartition(spark):
    from nolock_social_ocr_services_spark.functions import sampling

    df = spark.createDataFrame(
        [(f"doc-{i:04d}",) for i in range(300)], "doc_id string"
    )
    a = {r.doc_id: r.pos for r in sampling.shuffle_positions(df).collect()}
    b = {
        r.doc_id: r.pos
        for r in sampling.shuffle_positions(df.repartition(13)).collect()
    }
    c = {
        r.doc_id: r.pos
        for r in sampling.shuffle_positions(df, seed=7).collect()
    }
    assert a == b
    assert a != c  # a new seed is a new permutation


def test_kmv_small_cardinality_is_exact(spark):
    """Fewer than k distinct values means the sketch holds all of them:
    report the exact count, never the (grossly overestimating) k-th
    order-statistic formula."""
    vals = spark.createDataFrame([(f"w{i % 5}",) for i in range(100)], "word string")
    row = sampling.kmv_distinct(vals, "word", k=64).collect()[0]
    assert row["k"] == 5
    assert row["est_distinct"] == 5


def test_weighted_sample_determinism_and_weight_bias(spark):
    from nolock_social_ocr_services_spark.functions import sampling

    rows = [(i, 1000 if i < 20 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sampling.weighted_sample(df, "w", k=10, seed=3).collect()
    assert len(got) == 10
    # weight bias: the 20 heavy rows (1000x weight) should dominate the
    # sample of 10 drawn from 200 rows
    heavy = sum(1 for r in got if r["doc_id"] < 20)
    assert heavy >= 8
    # plan-independent and deterministic
    again = sampling.weighted_sample(
        df.repartition(7), "w", k=10, seed=3
    ).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in got]
    # different seed -> different sample; zero-weight rows never sampled
    other = sampling.weighted_sample(df, "w", k=10, seed=4).collect()
    assert [r["doc_id"] for r in other] != [r["doc_id"] for r in got]
    dfz = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 0), (4, 5)], "doc_id long, w long"
    )
    ids = {r["doc_id"] for r in
           sampling.weighted_sample(dfz, "w", k=4).collect()}
    assert ids == {2, 4}


def test_weighted_sample_per_group_topk(spark):
    from nolock_social_ocr_services_spark.functions import sampling

    rows = [(i, "g" + str(i % 3), 1 + i % 5) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w long")
    got = sampling.weighted_sample(df, "w", k=4, group_col="g").collect()
    per = {}
    for r in got:
        per.setdefault(r["g"], []).append(r["doc_id"])
    assert set(per) == {"g0", "g1", "g2"}
    assert all(len(v) == 4 for v in per.values())


def _py_hll(values, b=8):
    """Pure-python HLL with the module's exact conventions (md5-prefix
    60-bit hash, top-b bucket, bin-length rho, scaled-integer sum,
    linear-counting branch)."""
    import hashlib
    import math

    m = 1 << b
    w = 60 - b
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket, rem = h >> w, h & ((1 << w) - 1)
        rho = (w + 1) if rem == 0 else (w + 1 - rem.bit_length())
        regs[bucket] = max(regs.get(bucket, 0), rho)
    v_zero = m - len(regs)
    s_scaled = v_zero * (1 << (w + 1)) + sum(
        1 << (w + 1 - M) for M in regs.values()
    )
    factor = ((0.7213 / (1 + 1.079 / m)) * m * m) * float(1 << (w + 1))
    est = factor / float(s_scaled)
    if est <= 2.5 * m and v_zero > 0:
        est = float(m) * math.log(float(m) / v_zero)
    return v_zero, s_scaled, round(est, 6)


def test_hll_matches_python_reference(spark, docs):
    words = docs.select(
        "lang", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    got = {
        r.lang: (r.v_zero, r.s_scaled, r.est_distinct)
        for r in sampling.hll_distinct_by_group(words, "word", "lang").collect()
    }
    by_lang = {}
    for r in words.collect():
        by_lang.setdefault(r.lang, []).append(r.word)
    for lang, vals in by_lang.items():
        assert got[lang] == _py_hll(vals), lang


def test_hll_accuracy_at_larger_cardinality(spark):
    """Past the linear-counting range the raw estimator must engage and
    stay within HLL's expected error (~1.04/sqrt(256) ~ 6.5%; allow 3x)."""
    n = 20000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.concat(F.lit("tok"), F.col("id")).alias("w")
    )
    row = sampling.hll_distinct_by_group(df, "w", "g").collect()[0]
    assert row.v_zero == 0 or row.est_distinct > 2.5 * 256
    assert abs(row.est_distinct - n) / n < 0.20


def test_hll_insensitive_to_duplicates_and_order(spark):
    a = spark.createDataFrame(
        [("g", w) for w in ["x", "y", "z"] * 50], "g string, w string"
    )
    b = spark.createDataFrame(
        [("g", w) for w in ["z", "x", "y"]], "g string, w string"
    )
    ra = sampling.hll_distinct_by_group(a, "w", "g").collect()[0]
    rb = sampling.hll_distinct_by_group(b, "w", "g").collect()[0]
    assert (ra.v_zero, ra.s_scaled, ra.est_distinct) == (
        rb.v_zero, rb.s_scaled, rb.est_distinct,
    )


def test_cms_one_sided_and_exact_small(spark):
    """CMS estimates are >= truth for present keys (one-sided error),
    exact when the sketch is wide relative to the vocab, and an absent
    probe reports its collision noise (>= 0), never NULL."""
    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "w string")
    got = {
        r.token: r.est_count
        for r in sampling.cms_estimate(
            df, "w", ["a", "b", "c", "nope"], d=4, w=256
        ).collect()
    }
    # 3 distinct keys in 4x256 counters: min-over-rows is exact w.h.p.;
    # one-sidedness (>=) is the hard guarantee either way
    assert got["a"] >= 7 and got["b"] >= 3 and got["c"] >= 1
    assert got["a"] == 7 and got["b"] == 3 and got["c"] == 1
    assert got["nope"] >= 0


def test_cms_overshoot_bounded(spark):
    """With vocab >> width, every estimate still dominates the truth and
    the total overshoot respects the eps*N bound (e*N/w, here with a
    generous constant for min-over-4-rows at this fill)."""
    n_vocab, reps = 2000, 3
    df = spark.range(n_vocab * reps).select(
        F.concat(F.lit("t"), (F.col("id") % n_vocab)).alias("w")
    )
    probes = [f"t{i}" for i in range(0, 2000, 97)]
    got = sampling.cms_estimate(df, "w", probes, d=4, w=256).collect()
    n_total = n_vocab * reps
    for r in got:
        assert r.est_count >= reps, r
        assert r.est_count <= reps + 3 * n_total // 256, r
