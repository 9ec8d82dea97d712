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
