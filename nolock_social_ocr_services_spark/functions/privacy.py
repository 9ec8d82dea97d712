"""Privacy-preserving release ops: k-anonymity (Sweeney 2002).

A table is k-anonymous over its quasi-identifiers when every
combination of quasi-identifier values (every EQUIVALENCE CLASS)
covers at least k rows — no released row can be narrowed below k
candidates by joining on the quasi columns. The release pipeline:
generalize the quasi-identifiers (caller-supplied bucketing — decade
ages, zip prefixes, integer-cents ranges), then SUPPRESS every class
smaller than k.

Shape: one hash-agg over the generalized quasi columns (class sizes —
partial aggs collapse map-side), one key-partitioned join back, one
filter. The identifier columns never appear in the output at all —
suppression-by-absence, not masking. Class sizes ride along as an
audit column (they are k-anonymity-safe by construction: every
released size >= k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymize(
    df: DataFrame,
    quasi: dict[str, Column],
    sensitive: dict[str, Column],
    k: int = 5,
) -> DataFrame:
    """Release (quasi..., sensitive..., class_size) rows, dropping
    every equivalence class with fewer than k members. ``quasi`` maps
    output name -> generalized expression; ``sensitive`` maps output
    name -> retained value expression. No identifier survives."""
    qnames = list(quasi)
    g = df.select(
        *[expr.alias(name) for name, expr in quasi.items()],
        *[expr.alias(name) for name, expr in sensitive.items()],
    )
    sizes = (
        g.groupBy(*qnames)
        .agg(F.count("*").alias("class_size"))
        .filter(F.col("class_size") >= k)
    )
    return g.join(sizes, on=qnames)


def k_anonymity_report(
    df: DataFrame, quasi: dict[str, Column], k: int = 5
) -> DataFrame:
    """Audit view before release: one row per equivalence class with
    (quasi..., class_size, released) — the suppression the release
    would apply, without applying it."""
    qnames = list(quasi)
    return (
        df.select(*[expr.alias(name) for name, expr in quasi.items()])
        .groupBy(*qnames)
        .agg(F.count("*").alias("class_size"))
        .select(
            *qnames,
            "class_size",
            (F.col("class_size") >= k).alias("released"),
        )
    )


def l_diversity_report(
    df: DataFrame,
    quasi: dict[str, Column],
    sensitive: Column,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007 — the attack k-anonymity
    misses: a class can be large yet carry ONE sensitive value, so
    membership alone discloses it). One row per equivalence class:
    (quasi..., class_size, n_sensitive, diverse) with ``diverse`` true
    when the class holds >= l distinct sensitive values. Same single
    hash-agg shape as :func:`k_anonymity_report` — count_distinct
    rides the same shuffle."""
    qnames = list(quasi)
    return (
        df.select(
            *[expr.alias(name) for name, expr in quasi.items()],
            sensitive.alias("_s"),
        )
        .groupBy(*qnames)
        .agg(
            F.count("*").alias("class_size"),
            F.count_distinct(F.col("_s")).alias("n_sensitive"),
        )
        .select(
            *qnames,
            "class_size",
            "n_sensitive",
            (F.col("n_sensitive") >= l).alias("diverse"),
        )
    )
