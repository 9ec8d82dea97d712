"""Ordered per-document span re-assembly + span-sequence equality.

Spark re-creation of the reference's page-order contract: OCR pages carry
an ``index`` and text is joined in index order
(MistralOcrApiService.cs:164; page model OcrModels.cs:131-144). Here the
order key is ``offset`` (BASELINE.json input_hint) and re-assembly must
hold after arbitrary repartitioning/salting — this operator is the
guardian of the span-sequence-equality invariant
``(kind, text, media_ref, order)`` per ``doc_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reassemble_spans(
    exploded: DataFrame,
    span_fields: tuple[str, ...] = ("kind", "text", "media_ref", "offset"),
    doc_col: str = "doc_id",
    order_col: str = "offset",
    out_col: str = "spans",
) -> DataFrame:
    """Collapse exploded span rows back to ``(doc_id, spans[])`` in offset order.

    ``collect_list`` gives no ordering guarantee after a shuffle, so the
    offset is embedded in each struct and the array is ``array_sort``-ed
    by it — one aggregation, no window + second shuffle. At 100 TB this is
    a single hash-aggregate exchange on ``doc_id``; per-doc arrays stay
    small (spans per doc, not corpus-wide).
    """
    span_struct = F.struct(*[F.col(f).alias(f) for f in span_fields])
    collected = exploded.groupBy(doc_col).agg(
        F.array_sort(
            F.collect_list(span_struct),
            lambda a, b: F.when(a[order_col] < b[order_col], -1)
            .when(a[order_col] > b[order_col], 1)
            .otherwise(0),
        ).alias(out_col)
    )
    return collected


def span_sequence_fingerprint(
    docs: DataFrame,
    doc_col: str = "doc_id",
    spans_col: str = "spans",
    fields: tuple[str, ...] = ("kind", "text", "media_ref"),
    order_field: str = "offset",
) -> DataFrame:
    """(doc_id, seq_hash) — order-sensitive hash of the span sequence.

    The hash covers ``fields`` in ``order_field`` order with NULLs made
    explicit, so two documents agree iff their ordered
    (kind, text, media_ref, order) sequences agree.
    """
    spans = F.col(spans_col)
    ordered = F.array_sort(
        spans,
        lambda a, b: F.when(a[order_field] < b[order_field], -1)
        .when(a[order_field] > b[order_field], 1)
        .otherwise(0),
    )
    parts = F.transform(
        ordered,
        lambda s: F.concat_ws(
            "\x01",
            *[F.coalesce(s[f].cast("string"), F.lit("\x00")) for f in fields],
            s[order_field].cast("string"),
        ),
    )
    return docs.select(
        F.col(doc_col), F.md5(F.concat_ws("\x02", parts)).alias("seq_hash")
    )


def span_sequence_equal(
    left: DataFrame,
    right: DataFrame,
    doc_col: str = "doc_id",
    spans_col: str = "spans",
    fields: tuple[str, ...] = ("kind", "text", "media_ref"),
) -> DataFrame:
    """Per-doc equality report: (doc_id, equal boolean).

    Full-outer join on doc_id of both sides' sequence fingerprints; a doc
    missing on either side is unequal. This is the distributed form of the
    reference's deterministic text/page-order assertions
    (ReceiptOcrTests.cs:23-40 assert on stable text properties).
    """
    lf = span_sequence_fingerprint(left, doc_col, spans_col, fields).alias("l")
    rf = span_sequence_fingerprint(right, doc_col, spans_col, fields).alias("r")
    joined = lf.join(rf, on=doc_col, how="full_outer")
    return joined.select(
        F.col(doc_col),
        (
            F.col("l.seq_hash").isNotNull()
            & F.col("r.seq_hash").isNotNull()
            & (F.col("l.seq_hash") == F.col("r.seq_hash"))
        ).alias("equal"),
    )
