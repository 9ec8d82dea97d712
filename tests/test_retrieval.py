"""BM25 retrieval: hand-computed golden, tie-break determinism, and
plan shape (map-side scoring, TakeOrdered top-k, zero Python)."""

import pytest

from nolock_social_ocr_services_spark.functions import retrieval as rt
from nolock_social_ocr_services_spark.plans.inspect import (
    batch_eval_count,
    exchange_count,
    explain_str,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "a a b"), (2, "a b b b"), (3, "b b")],
        "doc_id long, text string",
    )


def test_bm25_golden_hand_computed(corpus):
    # N=3, sum_dl=9, df(a)=2 -> idf = round(ln(1.6), 9) = 0.470003629
    # d1: tf=2, dl=3, denom = 2 + 0.3 + 0.9*3*3/9 = 3.2
    #     score = 0.470003629 * 4.4 / 3.2 -> 0.646255 at 6 dp
    # d2: tf=1, dl=4, denom = 1 + 0.3 + 0.9*4*3/9 = 2.5
    #     score = 0.470003629 * 2.2 / 2.5 -> 0.413603 at 6 dp
    # d3: tf=0 -> excluded
    rows = rt.bm25_topk(corpus, {"q": ["a"]}, k=10).collect()
    got = [(r["query_id"], r["doc_id"], r["score"]) for r in rows]
    assert got == [("q", 1, 0.646255), ("q", 2, 0.413603)]


def test_bm25_stats_single_agg_exact_ints(corpus):
    n, sum_dl, dfs = rt.bm25_corpus_stats(corpus, ["a", "b", "zz"])
    assert (n, sum_dl) == (3, 9)
    assert dfs == {"a": 2, "b": 3, "zz": 0}


def test_bm25_k_boundary_ties_break_on_doc_id(spark):
    df = spark.createDataFrame(
        [(7, "x y"), (4, "x y"), (9, "x y")], "doc_id long, text string"
    )
    rows = rt.bm25_topk(df, {"q": ["x"]}, k=2).collect()
    assert [r["doc_id"] for r in rows] == [4, 7]


def test_bm25_multi_query_union_and_no_match_excluded(corpus):
    out = rt.bm25_topk(corpus, {"qa": ["a"], "qz": ["zz"]}, k=5)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {"qa"}  # qz matches nothing


def test_bm25_plan_is_map_side_takeordered(corpus):
    out = rt.bm25_topk(corpus, {"q1": ["a"], "q2": ["b"]}, k=3)
    plan = explain_str(out)
    # scoring scan is pure codegen arithmetic: no Python, no exchange,
    # no join; top-k is per-partition heaps, not a window on query_id
    assert batch_eval_count(out) == 0
    assert exchange_count(out) == 0
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


# -- reciprocal-rank fusion -----------------------------------------------------


def test_rrf_fuse_hand_vectors(spark):
    from nolock_social_ocr_services_spark.functions import retrieval as rt

    sparse = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query_id string, doc_id long, rank long",
    )
    dense = spark.createDataFrame(
        [("q", 2, 1), ("q", 4, 2)],
        "query_id string, doc_id long, rank long",
    )
    out = {
        r.doc_id: r
        for r in rt.rrf_fuse({"sparse": sparse, "dense": dense}).collect()
    }
    # doc 2 appears in both systems -> highest fused score, rank 1
    assert out[2].n_systems == 2 and out[2].fused_rank == 1
    assert out[2].rrf_score == pytest.approx(
        round(1 / 62, 9) + round(1 / 61, 9)
    )
    # single-system docs ordered by their reciprocal rank
    assert out[1].n_systems == 1
    assert out[1].rrf_score == pytest.approx(round(1 / 61, 9))
    assert out[4].rrf_score == pytest.approx(round(1 / 62, 9))
    # rank-1-in-one-system (doc 1) beats rank-2-in-one-system (doc 4)
    assert out[1].fused_rank < out[4].fused_rank


def test_rrf_fuse_is_calibration_free(spark):
    """Fusion depends only on ranks: scaling one system's scores (a
    recalibration) changes nothing because scores never enter."""
    from nolock_social_ocr_services_spark.functions import retrieval as rt

    a = spark.createDataFrame(
        [("q", i, i) for i in range(1, 6)],
        "query_id string, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        [("q", 10 - i, i) for i in range(1, 6)],
        "query_id string, doc_id long, rank long",
    )
    out1 = rt.rrf_fuse({"a": a, "b": b}).collect()
    out2 = rt.rrf_fuse({"b": b, "a": a}).collect()  # input order irrelevant
    assert {(r.doc_id, r.fused_rank) for r in out1} == {
        (r.doc_id, r.fused_rank) for r in out2
    }
