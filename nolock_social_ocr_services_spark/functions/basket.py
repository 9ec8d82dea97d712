"""Market-basket association rules (the a-priori pair pass).

The classic co-occurrence miner (Agrawal & Srikant 1994's frequent
itemsets, truncated at pairs — the pass that dominates production
basket mining): support, confidence, and lift for every item pair that
co-occurs in enough transactions.

Distributed shape:
  * transactions reduce to DISTINCT (txn, item) rows first — a line
    item repeated in an order must not double-count support;
  * the pair pass is a self-equi-join ON THE TRANSACTION KEY, so its
    fan-out is sum(basket_size^2) — bounded by the basket-size cap,
    never by corpus size (a 10^12-row table with 10-item baskets emits
    ~45 pairs per basket). ``max_basket`` drops pathological baskets
    (a crawler cart with 10^5 items would alone emit 5*10^9 pairs);
    dropped baskets are counted in the audit column of pair_rules'
    companion, not silently (the N used for lift is post-cap).
  * all rates are INTEGER milli-units (`x * 1000 div y`): a float
    division's last ulp differs across engines; integer division is
    bit-identical, which is what lets a DuckDB oracle hash the result.

Citation (parity surface): the reference has no basket miner; this is
part of the beyond-reference training-data/analytics battery the brief
requires (SURVEY.md "Training-data ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_rules(
    tx: DataFrame,
    txn_col: str = "txn",
    item_col: str = "item",
    min_pair_count: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """Association rules over item pairs: (item_a < item_b,
    pair_count, count_a, count_b, conf_ab_milli, conf_ba_milli,
    lift_milli), restricted to pairs co-occurring >= min_pair_count
    times in baskets of <= max_basket distinct items.

    conf(a->b) = P(b|a), lift = P(ab) / (P(a) P(b)) — both in integer
    milli-units; lift > 1000 means positive association.
    """
    t = tx.select(
        F.col(txn_col).alias("_t"), F.col(item_col).alias("_i")
    ).distinct()
    sizes = t.groupBy("_t").agg(F.count("*").alias("_bs")).filter(
        F.col("_bs") <= max_basket
    )
    # the size filter joins back BEFORE anything materializes a basket:
    # both sides are hash-partitioned on _t, so this adds no exchange
    kept = t.join(sizes.select("_t"), on="_t")
    n_txn = sizes.agg(F.count("*").alias("_n"))
    item_counts = kept.groupBy("_i").agg(F.count("*").alias("_c"))
    a = kept.select(F.col("_t"), F.col("_i").alias("item_a"))
    b = kept.select(F.col("_t"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, on="_t")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("_i").alias("item_a"), F.col("_c").alias("count_a")
    )
    cb = item_counts.select(
        F.col("_i").alias("item_b"), F.col("_c").alias("count_b")
    )
    return (
        pairs.join(ca, on="item_a")
        .join(cb, on="item_b")
        .crossJoin(F.broadcast(n_txn))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "count_a",
            "count_b",
            F.expr("pair_count * 1000 div count_a").alias("conf_ab_milli"),
            F.expr("pair_count * 1000 div count_b").alias("conf_ba_milli"),
            # decimal(38,0) intermediates: pair_count * _n * 1000 in
            # long arithmetic overflows int64 once pair_count * _n
            # passes ~9.2e15 (a few million co-occurrences over a few
            # billion baskets) and, with ANSI off, wraps SILENTLY to a
            # wrong lift. The 38-digit product is exact to ~1e38; the
            # quotient itself (lift in milli) is small and fits long.
            F.expr(
                "CAST(pair_count AS DECIMAL(38,0)) * _n * 1000 "
                "div (CAST(count_a AS DECIMAL(38,0)) * count_b)"
            ).alias("lift_milli"),
        )
    )
