"""BM25 sparse retrieval over the document corpus.

Re-creates the retrieval stage a training-data pipeline runs for
retrieval-based decontamination, hard-negative mining, and
quality-by-query-likeness scoring (the sparse half of a dense+sparse
hybrid; the dense half is ``functions/similarity.py``). Okapi BM25 in
the Lucene form: idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1),
score(d, q) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).

Scale notes (100 TB):
  * The corpus-statistics pass is ONE aggregate producing a single
    row: N, sum(dl), and df(t) per query term via
    ``sum(array_contains(tokens, t))`` — no explode, no (doc, term)
    shuffle, partial aggregation absorbs everything map-side. The
    result is query-term-sized and lands on the driver as a scalar
    (same bounded-collect contract as the k-means centroid fetch,
    ``similarity.py``).
  * Scoring is map-side only: per-term tf comes from a higher-order
    ``filter`` over the row's token array against literal terms, so
    the scoring scan is whole-stage codegen with zero exchanges.
  * Per-query top-k compiles to TakeOrderedAndProject (per-partition
    k-row heaps, one driver merge) — never a window partitioned by
    query_id, which would hash the whole match set onto Q keys and
    serialize on the hottest query. Q is small by construction; the
    per-query plans union.

Cross-engine determinism contract (see ``queries.py``): idf and each
per-term score term are rounded to 9 decimals, terms are summed in
sorted-term order, the final score to 6 decimals; ranking orders by
the ROUNDED score then doc_id, so Spark and DuckDB pick identical
top-k sets.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .corpus_ops import words

#: Okapi defaults (Robertson et al.; Lucene's BM25Similarity ships the
#: same constants).
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_corpus_stats(
    df: DataFrame, terms: list[str], text_col: str = "text"
) -> tuple[int, int, dict[str, int]]:
    """One-pass corpus statistics for BM25: (N, sum_dl, df-per-term).

    A single aggregate over the corpus — ``array_contains`` per term
    inside the agg, so the only thing that crosses the wire is one
    partial-agg row per partition. Returns exact integers; every
    float in BM25 is derived from these downstream, which is what
    makes the scores reproducible across engines and cluster sizes.
    """
    toks = words(F.col(text_col))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("sum_dl"),
    ]
    for i, t in enumerate(sorted(set(terms))):
        aggs.append(
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"df_{i}")
        )
    row = df.agg(*aggs).first()
    dfs = {t: row[f"df_{i}"] for i, t in enumerate(sorted(set(terms)))}
    return int(row["n_docs"]), int(row["sum_dl"]), dfs


def idf9(n_docs: int, doc_freq: int) -> float:
    """Lucene-form idf rounded to 9 decimals (the cross-engine
    contract boundary — DuckDB recomputes ln() itself and meets us at
    9 dp)."""
    return round(
        math.log((n_docs - doc_freq + 0.5) / (doc_freq + 0.5) + 1.0), 9
    )


def _term_score(
    toks: Column, dl: Column, term: str, idf: float, n: int, sum_dl: int
) -> Column:
    """One term's contribution, written as the exact double-arithmetic
    shape the DuckDB oracle uses: constants pre-folded (k1+1 = 2.2,
    k1*(1-b) = 0.3, k1*b = 0.9), avgdl never materialized — dl/avgdl
    becomes dl*N/sum_dl so both engines divide the same integers."""
    tf = F.size(F.filter(toks, lambda w: w == F.lit(term))).cast("double")
    denom = (
        tf
        + F.lit(0.3)
        + F.lit(0.9) * dl * F.lit(float(n)) / F.lit(float(sum_dl))
    )
    return F.round(F.lit(idf) * (F.lit(2.2) * tf) / denom, 9)


def bm25_score(
    df: DataFrame,
    terms: list[str],
    n_docs: int,
    sum_dl: int,
    doc_freqs: dict[str, int],
    text_col: str = "text",
) -> DataFrame:
    """Map-side BM25 score of every document against one query.

    Adds a ``score`` column (6-dp rounded, summed in sorted-term
    order). Purely per-row arithmetic over literal stats — zero
    exchanges, zero Python.
    """
    toks = words(F.col(text_col))
    dl = F.size(toks).cast("double")
    score = None
    for t in sorted(set(terms)):
        s = _term_score(toks, dl, t, idf9(n_docs, doc_freqs[t]), n_docs, sum_dl)
        score = s if score is None else score + s
    return df.withColumn("score", F.round(score, 6))


#: RRF damping constant — 60 is the value from Cormack, Clarke &
#: Buettcher 2009 ("Reciprocal rank fusion outperforms Condorcet and
#: individual rank learning methods"), kept verbatim by every major
#: hybrid-search engine.
RRF_K = 60


def rrf_fuse(
    rankings: dict[str, DataFrame],
    k_const: int = RRF_K,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval systems' per-query
    rankings — the standard hybrid dense+sparse combiner: score(d) =
    sum over systems of 1/(k + rank_s(d)). Rank-based, so no score
    calibration between BM25 floats and cosine floats is needed, and
    because ranks are small integers the fused score is deterministic
    across engines and cluster sizes.

    Inputs: each DataFrame has (query_id, ``id_col``, rank). Output:
    (query_id, id_col, n_systems, rrf_score, fused_rank).

    Scale shape: the inputs are already top-k candidate lists (Q x k
    rows per system — bounded by construction, NOT data-sized), so the
    union + hash-agg + per-query window all run over candidates only.
    Per-term contributions are rounded to 9 dp before the sum, the sum
    to 9 dp — the cross-engine float contract used throughout."""
    tagged = None
    for name in sorted(rankings):
        t = rankings[name].select(
            "query_id", F.col(id_col), F.col("rank").cast("long").alias("rank")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    contrib = F.round(
        F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank").cast("double")), 9
    )
    agg = (
        tagged.select("query_id", id_col, contrib.alias("c"))
        .groupBy("query_id", id_col)
        .agg(
            F.count("*").cast("long").alias("n_systems"),
            F.round(F.sum("c"), 9).alias("rrf_score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), id_col)
    return agg.withColumn("fused_rank", F.row_number().over(w))


def bm25_topk(
    df: DataFrame,
    queries: dict[str, list[str]],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents per query by BM25 — (query_id, doc_id, score).

    One stats aggregate over the union of all query terms, then one
    map-side scoring scan per query with an orderBy(k)-limit that
    compiles to TakeOrderedAndProject; the per-query results union.
    Docs matching no term (score 0) are excluded. Ties at the k
    boundary break on doc_id ascending.
    """
    all_terms = sorted({t for ts in queries.values() for t in ts})
    n, sum_dl, dfs = bm25_corpus_stats(df, all_terms, text_col=text_col)
    parts = []
    for qid in sorted(queries):
        scored = bm25_score(
            df, queries[qid], n, sum_dl, dfs, text_col=text_col
        )
        parts.append(
            scored.where(F.col("score") > 0)
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col),
                F.col("score"),
            )
            .orderBy(F.desc("score"), id_col)
            .limit(k)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df_milli: int | None = None,
) -> DataFrame:
    """Inverted-index build: (term, df, postings) with the posting
    list as a SORTED doc-id array — the core IR artifact behind the
    BM25/decontamination/hard-negative stages (Lucene's postings,
    materialized as a table).

    Shape: tokenize map-side (the shared ``words`` contract), reduce
    to DISTINCT (doc, term) — tf does not belong in a df index and
    dropping duplicates map-side shrinks the only shuffle — then ONE
    term-partitioned agg builds df + the sorted posting array.

    Skew IS the stopword problem here: the hottest term's posting list
    is the biggest reduce key. ``max_df_milli`` drops terms present in
    more than that fraction (milli) of documents — the classic
    stopword cut — which is precisely a hot-key cap: the surviving
    posting lists are bounded at max_df_milli/1000 * N entries.
    ``min_df`` prunes the hapax tail (most of the vocabulary, nearly
    useless postings). n_docs is computed once (one scalar agg) and
    broadcast into the predicate.

    The df gate runs BEFORE the posting arrays are built: a cheap
    count-only agg (map-side partial sums, a handful of longs per
    term) computes df, the min_df/max_df filter prunes the term set,
    and only SURVIVING terms flow into the collect_list agg — so the
    hottest stopword's posting array (up to N doc ids in one reduce
    task) is never materialized just to be discarded. Both aggs hash
    on ``term``; the extra shuffle of the pruned df table is tiny
    (one row per surviving term).
    """
    t = df.select(
        F.col(id_col).alias("_d"),
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("term"),
    )
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("_n")
    )
    dfreq = (
        t.groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
    )
    if max_df_milli is not None:
        dfreq = dfreq.crossJoin(F.broadcast(n_docs)).filter(
            F.col("df") * 1000 <= F.lit(max_df_milli) * F.col("_n")
        ).drop("_n")
    return (
        t.join(dfreq, on="term")
        .groupBy("term", "df")
        .agg(F.array_sort(F.collect_list("_d")).alias("postings"))
        .select("term", "df", "postings")
    )
