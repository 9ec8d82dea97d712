"""Grouped-map (``applyInPandas``) operators — the batch->summary UDF
tier from SURVEY §2.11 (UDTF-like: whole group in, one frame out).

This is the tier for per-entity computations that genuinely need the
whole group materialized as one pandas frame (order-sensitive feature
extraction, per-document model scoring). For plain aggregations the
built-in hash aggregate is strictly better (map-side partial agg, no
Python); ``doc_span_summary`` intentionally computes aggregation-shaped
outputs so the driver's DuckDB oracle can verify the tier end-to-end.

Scale notes: ``groupBy(key).applyInPandas`` is ONE shuffle on the key,
then FlatMapGroupsInPandas streams each group through a worker — state
is bounded by the largest single group, so the giant-document tail
(corpus GIANT_SPANS) is the stress case, not total data size.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

SUMMARY_SCHEMA = (
    "doc_id string, n_spans bigint, n_media bigint, text_chars bigint"
)


def doc_span_summary(flat: DataFrame) -> DataFrame:
    """Per-document summary via grouped-map: one output row per doc.

    Input needs columns (doc_id, kind, text); extra columns are pruned
    before the shuffle so only three thin columns cross to Python.
    """

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": [pdf["doc_id"].iloc[0]],
                "n_spans": [len(pdf)],
                "n_media": [int(pdf["kind"].isin(["image", "pdf"]).sum())],
                "text_chars": [int(pdf["text"].str.len().fillna(0).sum())],
            }
        )

    return (
        flat.select("doc_id", "kind", "text")
        .groupBy("doc_id")
        .applyInPandas(summarize, SUMMARY_SCHEMA)
    )
