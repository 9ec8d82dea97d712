"""Spatial neighbor join: all point pairs within a radius.

The 2-D member of the repo's banded-join family (1-D interval overlap
lives in ``operators/temporal.py::interval_join``): bucket the plane
into radius-sized grid CELLS, meet candidates through a cell equi-join,
verify with the exact distance predicate on candidates only. The naive
form is an O(N^2) cross join; the grid form's fan-out is 9 cells per
point and its per-cell work is density-bounded — the standard shape
under every production spatial index (PostGIS gist tiles, H3, S2,
Sedona's grid partitioner).

Pair-uniqueness without a distinct shuffle: one join side explodes
onto its 3x3 neighborhood, the other stays in its home cell, and the
exploded side is required to hold the LOWER id. A qualifying pair
(a < b) then meets in exactly one place — b's home cell, through a's
one exploded copy that lands there — so no dedup pass exists in the
plan (the mirror meeting, b exploded into a's home, fails the id
ordering and never materializes past the join filter).

Coordinates are INTEGERS (grid/world units) and the verify predicate
is integer dist^2 <= r^2: bit-identical across engines, which is what
lets the DuckDB oracle run the brute-force quadratic formulation and
hash-match — two independent formulations of the same answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbor_pairs(
    df: DataFrame,
    id_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
    radius: int = 25,
) -> DataFrame:
    """All pairs (id_a < id_b) with euclidean distance <= radius:
    (id_a, id_b, dist2). Cell width = radius, so any qualifying pair
    is in the same or an adjacent cell (|dx| <= r implies cell delta
    <= 1) — the 3x3 explode is exhaustive, not a recall dial."""
    r2 = radius * radius
    pt = df.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
        F.floor(F.col(x_col) / radius).cast("long").alias("_cx"),
        F.floor(F.col(y_col) / radius).cast("long").alias("_cy"),
    )
    offs = F.expr(
        "explode(flatten(transform(sequence(-1, 1), dx ->"
        " transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    a = pt.select(
        F.col("_id").alias("id_a"),
        F.col("_x").alias("xa"),
        F.col("_y").alias("ya"),
        "_cx",
        "_cy",
        offs.alias("_o"),
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("_cx") + F.col("_o.dx")).alias("cx"),
        (F.col("_cy") + F.col("_o.dy")).alias("cy"),
    )
    b = pt.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("xb"),
        F.col("_y").alias("yb"),
        F.col("_cx").alias("cx"),
        F.col("_cy").alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, on=["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", d2.alias("dist2"))
        .filter(F.col("dist2") <= r2)
    )
