"""Salted repartitioning to defuse large-document skew.

The reference never sees skew — each HTTP request is one document
(Program.cs:79-100) and Rx ``Merge(4)`` load-balances requests. Exploding
``documents.spans`` concentrates a giant document's spans in one task, so
we add a salt over ``(doc_id, offset)`` and repartition on it; the spans
of one document then spread across up to K tasks and the UDF compute is
balanced. AQE only re-splits *shuffle/join* skew, not UDF-compute skew,
hence the explicit salt (SURVEY.md §4 custom strategy #1).

Order is restored afterwards by :mod:`.reassemble` (window over
``offset``), which is why salting is safe for the span-sequence invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    num_partitions: int | None = None,
    salt_buckets: int = 64,
    key_cols: tuple[str, ...] = ("doc_id", "offset"),
    salt_col: str = "salt",
    keep_salt: bool = False,
) -> DataFrame:
    """Repartition rows on a hash salt derived from ``key_cols``.

    ``pmod(hash(doc_id, offset), salt_buckets)`` spreads one document's
    spans over up to ``salt_buckets`` partitions deterministically (no
    rand(); re-runs produce identical partition assignment, which the
    checkpoint/resume protocol relies on).
    """
    salted = df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(salt_buckets))
    )
    if num_partitions is not None:
        out = salted.repartition(num_partitions, salt_col)
    else:
        out = salted.repartition(salt_col)
    return out if keep_salt else out.drop(salt_col)
