"""k-anonymity release (functions/privacy.py) + postings index."""

from pyspark.sql import functions as F

from nolock_social_ocr_services_spark.functions.privacy import (
    k_anonymity_report,
    k_anonymize,
)
from nolock_social_ocr_services_spark.functions.retrieval import (
    build_postings,
)


def test_k_anonymize_suppresses_small_classes(spark):
    df = spark.createDataFrame(
        [(i, 25 + (i % 2) * 10, "A" if i < 6 else "B", 100 + i)
         for i in range(8)],
        "pid long, age long, grp string, val long",
    )
    out = k_anonymize(
        df,
        quasi={"decade": (F.col("age") / 10).cast("long") * 10,
               "grp": F.col("grp")},
        sensitive={"val": F.col("val")},
        k=3,
    )
    rows = out.collect()
    # classes: (20,A)x3 (30,A)x3 (20,B)x1 (30,B)x1 -> B suppressed
    assert len(rows) == 6
    assert all(r.class_size >= 3 for r in rows)
    assert {r.grp for r in rows} == {"A"}
    assert "pid" not in out.columns  # identifiers never released
    # every released row's quasi combo has >= k companions IN the output
    from collections import Counter

    c = Counter((r.decade, r.grp) for r in rows)
    assert all(v >= 3 for v in c.values())


def test_k_anonymity_report_flags_without_suppressing(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "pid long, g string"
    )
    rep = {r.g: r for r in k_anonymity_report(
        df, quasi={"g": F.col("g")}, k=2
    ).collect()}
    assert rep["x"].released and rep["x"].class_size == 2
    assert not rep["y"].released and rep["y"].class_size == 1


def test_build_postings_sorted_df_and_stopword_cap(spark):
    docs = spark.createDataFrame(
        [
            (3, "the cat sat"),
            (1, "the dog sat"),
            (2, "the cat ran"),
            (4, "the the the"),   # dup tokens count once for df
        ],
        "doc_id long, text string",
    )
    out = {r.term: r for r in build_postings(
        docs, min_df=2, max_df_milli=750
    ).collect()}
    # 'the' df=4 = 1000 milli > 750 -> stopword-cut; 'dog','ran' df=1 < 2
    assert set(out) == {"cat", "sat"}
    assert out["cat"].df == 2 and out["cat"].postings == [2, 3]
    assert out["sat"].postings == [1, 3]  # sorted doc ids


def test_l_diversity_catches_uniform_sensitive_class(spark):
    """A class can satisfy k-anonymity (size 4 >= 3) while every member
    shares ONE sensitive value — k-anon passes, l-diversity fails it."""
    from nolock_social_ocr_services_spark.functions.privacy import (
        l_diversity_report,
    )

    rows = [(i, "uniform", 500) for i in range(4)]
    rows += [(i + 10, "varied", 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "pid long, g string, wage long")
    rep = {r.g: r for r in l_diversity_report(
        df, quasi={"g": F.col("g")}, sensitive=F.col("wage"), l=2
    ).collect()}
    assert rep["uniform"].class_size == 4       # k-anonymous at k<=4...
    assert rep["uniform"].n_sensitive == 1
    assert not rep["uniform"].diverse           # ...but discloses wage
    assert rep["varied"].diverse and rep["varied"].n_sensitive == 4
