"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end extraction pipeline on
sf0.001. ``queries()`` exposes one DataFrame callable per implemented
operator from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-runnable
ANSI-SQL equivalent over the pre-registered views (region nation
customer supplier part orders lineitem events documents embeddings).

The interleaved-span corpus is derived deterministically from the
``documents`` view by rules valid in BOTH Spark SQL and DuckDB
(corpus.flat_spans_sql), so the oracle recomputes *intended* outputs
from the construction rules while the Spark side runs the real pipeline
(trie UDF over decoded bytes, mapInPandas OCR, regex field parse) —
agreement certifies the pipeline, not just the plumbing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nolock_social_ocr_services_spark import corpus, pipeline
from nolock_social_ocr_services_spark.extract.ocr import (
    DUCK,
    ocr_field_exprs,
    oracle_ocr_text_sql,
)
from nolock_social_ocr_services_spark.operators.classify import classify_mime
from nolock_social_ocr_services_spark.operators.reassemble import reassemble_spans
from nolock_social_ocr_services_spark.operators.salt import salted_repartition

SF0001 = "/root/testdata/sf0.001"

# DuckDB relation producing the corpus spans (the oracle building block).
_FLAT = f"({corpus.oracle_flat_spans_sql()})"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full classify->OCR->extract->reassemble pipeline on
    sf0.001, summarized per document."""
    docs = corpus.materialized_documents(spark, SF0001)
    flat = pipeline.extract_spans(docs, salt_buckets=32)
    return flat.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("receipt").isNotNull().cast("long")).alias("n_receipts"),
        F.sum(F.col("check").isNotNull().cast("long")).alias("n_checks"),
        F.sum(F.col("extract_error").isNotNull().cast("long")).alias("n_errors"),
        F.sum("ocr_tokens").alias("sum_tokens"),
    )


# -- Spark-side query callables ----------------------------------------------


def _q_classify_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C4 + P8: trie classification of every span's payload prefix."""
    spans = corpus.flat_spans(spark, sf_dir).select(
        "doc_id", "offset", "kind", "media_ref"
    )
    out = classify_mime(spans, data_url_col="media_ref", out_col="mime")
    return out.select("doc_id", "offset", "kind", "mime")


def _q_mime_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 trie-hit histogram (north_rule lineage aggregate)."""
    return (
        _q_classify_spans(spark, sf_dir)
        .groupBy("mime")
        .agg(F.count("*").alias("n_spans"))
    )


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = corpus.materialized_documents(spark, sf_dir)
    return pipeline.extract_spans(docs, salt_buckets=32)


def _q_extract_receipts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2-T8 receipt path: OCR -> ordered concat -> typed field parse."""
    flat = _extracted(spark, sf_dir)
    return flat.filter(F.col("receipt").isNotNull()).select(
        "doc_id",
        "offset",
        F.col("receipt.merchant_name").alias("merchant_name"),
        F.col("receipt.receipt_date").alias("receipt_date"),
        F.col("receipt.total_amount").cast("decimal(18,2)").cast("string").alias("total_amount"),
        F.col("receipt.tax_amount").cast("decimal(18,2)").cast("string").alias("tax_amount"),
        F.col("receipt.payment_method").alias("payment_method"),
        F.col("receipt.items_count").alias("items_count"),
    )


def _q_extract_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2-T8 check path."""
    flat = _extracted(spark, sf_dir)
    return flat.filter(F.col("check").isNotNull()).select(
        "doc_id",
        "offset",
        F.col("check.check_number").alias("check_number"),
        F.col("check.payee").alias("payee"),
        F.col("check.amount").cast("decimal(18,2)").cast("string").alias("amount"),
        F.col("check.bank_name").alias("bank_name"),
        F.col("check.is_signed").alias("is_signed"),
    )


def _q_ocr_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2+T3+W1: full OCR text with pages re-ordered by index."""
    flat = _extracted(spark, sf_dir)
    return flat.filter(F.col("media_ref").isNotNull()).select(
        "doc_id", "offset", F.col("text").alias("ocr_text")
    )


def _q_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_rule text path: DOM-heuristic boilerplate strip."""
    flat = _extracted(spark, sf_dir)
    return flat.filter(F.col("kind") == "html").select(
        "doc_id", "offset", F.col("text").alias("clean_text")
    )


def _q_span_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2: offset-order reconstruction after explode + salted shuffle."""
    docs = corpus.materialized_documents(spark, sf_dir)
    exploded = pipeline.explode_spans(docs)
    salted = salted_repartition(exploded, salt_buckets=32)
    rebuilt = reassemble_spans(salted)
    return rebuilt.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("spans"),
                lambda s: F.concat_ws("@", s["kind"], s["offset"].cast("string")),
            ),
            "|",
        ).alias("span_seq"),
    )


def _q_extraction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4: per-MIME success/error counters + token totals."""
    flat = _extracted(spark, sf_dir)
    return (
        flat.filter(F.col("media_ref").isNotNull())
        .groupBy("mime")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(
                (F.col("receipt").isNotNull() | F.col("check").isNotNull()).cast("long")
            ).alias("n_parsed"),
            F.sum(F.col("extract_error").isNotNull().cast("long")).alias("n_errors"),
            F.sum(F.col("ocr_tokens").cast("long")).alias("sum_tokens"),
        )
    )


def _q_batch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: BatchOcrExtractionResponse computed aggregates
    (DocumentType.cs:192-208) — success/failure counts, avg confidence
    of successes, success rate — per media kind."""
    flat = _extracted(spark, sf_dir)
    media = flat.filter(F.col("media_ref").isNotNull())
    ok = F.col("receipt").isNotNull() | F.col("check").isNotNull()
    return media.groupBy("kind").agg(
        F.sum(ok.cast("long")).alias("success_count"),
        F.sum(F.col("extract_error").isNotNull().cast("long")).alias("failure_count"),
        F.round(F.avg("confidence"), 6).alias("avg_confidence"),
        F.round(
            F.sum(ok.cast("long")) / F.count("*"), 6
        ).alias("success_rate"),
    )


def _q_filter_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P7 filter/validation battery over the corpus spans."""
    spans = corpus.flat_spans(spark, sf_dir)
    return (
        spans.filter(F.col("media_ref").isNotNull())  # P1 null-url filter
        .filter(F.length("media_ref") > 0)  # P2
        .filter(F.trim(F.col("media_ref")) != "")  # P3
        .filter(F.col("media_ref").startswith("data:"))  # P8
        .filter(F.col("kind").isin("image", "pdf"))  # P7 doc-type validation
        .select("doc_id", "offset", "kind")
    )


def _q_union_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 stream merge: receipt-kind + check-kind branches re-merged."""
    spans = corpus.flat_spans(spark, sf_dir)
    images = spans.filter(F.col("kind") == "image").select("doc_id", "offset", "kind")
    pdfs = spans.filter(F.col("kind") == "pdf").select("doc_id", "offset", "kind")
    return images.unionByName(pdfs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from nolock_social_ocr_services_spark.queries import extra_queries

    qs: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "classify_spans": _q_classify_spans,
        "mime_histogram": _q_mime_histogram,
        "extract_receipts": _q_extract_receipts,
        "extract_checks": _q_extract_checks,
        "ocr_text": _q_ocr_text,
        "html_strip": _q_html_strip,
        "span_reassembly": _q_span_reassembly,
        "extraction_stats": _q_extraction_stats,
        "batch_stats": _q_batch_stats,
        "filter_route": _q_filter_route,
        "union_spans": _q_union_spans,
    }
    for name, (fn, _sql) in extra_queries().items():
        qs[name] = fn
    return qs


# -- DuckDB oracles -----------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    from nolock_social_ocr_services_spark.queries import extra_queries

    extra = {
        name: sql for name, (_fn, sql) in extra_queries().items() if sql is not None
    }
    e = ocr_field_exprs(DUCK, h="md5(media_ref)")
    ocr_text = oracle_ocr_text_sql(DUCK, mime="mime", h="md5(media_ref)")
    strip_pfx = corpus.HTML_PREFIX.replace("'", "''")
    strip_sfx = corpus.HTML_SUFFIX.replace("'", "''")
    return {
        "classify_spans": f"""
            SELECT doc_id, "offset", kind, mime FROM {_FLAT} f
        """,
        "mime_histogram": f"""
            SELECT mime, count(*) AS n_spans FROM {_FLAT} f GROUP BY mime
        """,
        "extract_receipts": f"""
            SELECT doc_id, "offset",
                   {e['merchant_name']} AS merchant_name,
                   {e['receipt_date']} AS receipt_date,
                   {e['total_amount']} AS total_amount,
                   {e['tax_amount']} AS tax_amount,
                   {e['payment_method']} AS payment_method,
                   {e['items_count']} AS items_count
            FROM {_FLAT} f
            WHERE kind = 'image' AND mime <> 'application/octet-stream'
        """,
        "extract_checks": f"""
            SELECT doc_id, "offset",
                   {e['check_number']} AS check_number,
                   {e['payee']} AS payee,
                   {e['check_amount']} AS amount,
                   {e['bank_name']} AS bank_name,
                   {e['is_signed']} AS is_signed
            FROM {_FLAT} f
            WHERE kind = 'pdf' AND mime = 'application/pdf'
        """,
        "ocr_text": f"""
            SELECT doc_id, "offset", {ocr_text} AS ocr_text
            FROM {_FLAT} f
            WHERE media_ref IS NOT NULL
        """,
        "html_strip": f"""
            SELECT doc_id, "offset",
                   trim(replace(replace(text, '{strip_pfx}', ''), '{strip_sfx}', '')) AS clean_text
            FROM {_FLAT} f
            WHERE kind = 'html'
        """,
        "span_reassembly": f"""
            SELECT doc_id,
                   string_agg(kind || '@' || CAST("offset" AS VARCHAR), '|' ORDER BY "offset") AS span_seq
            FROM {_FLAT} f
            GROUP BY doc_id
        """,
        "extraction_stats": f"""
            -- CAST sums to BIGINT: DuckDB sum(int) yields HUGEINT, which
            -- canonicalizes as float64 driver-side; Spark emits BIGINT.
            SELECT mime,
                   count(*) AS n_spans,
                   CAST(sum(CASE WHEN mime <> 'application/octet-stream' THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
                   CAST(sum(CASE WHEN mime = 'application/octet-stream' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                   CAST(sum(CASE WHEN mime <> 'application/octet-stream'
                            THEN {e['ocr_tokens']} ELSE NULL END) AS BIGINT) AS sum_tokens
            FROM {_FLAT} f
            WHERE media_ref IS NOT NULL
            GROUP BY mime
        """,
        "batch_stats": f"""
            SELECT kind,
                   CAST(sum(CASE WHEN mime <> 'application/octet-stream' THEN 1 ELSE 0 END) AS BIGINT) AS success_count,
                   CAST(sum(CASE WHEN mime = 'application/octet-stream' THEN 1 ELSE 0 END) AS BIGINT) AS failure_count,
                   CAST(round(avg(CASE WHEN mime <> 'application/octet-stream' THEN 0.8 END), 6) AS DOUBLE) AS avg_confidence,
                   CAST(round(sum(CASE WHEN mime <> 'application/octet-stream' THEN 1.0 ELSE 0.0 END) / count(*), 6) AS DOUBLE) AS success_rate
            FROM {_FLAT} f
            WHERE media_ref IS NOT NULL
            GROUP BY kind
        """,
        "filter_route": f"""
            SELECT doc_id, "offset", kind FROM {_FLAT} f
            WHERE media_ref IS NOT NULL AND length(media_ref) > 0
              AND trim(media_ref) <> '' AND media_ref LIKE 'data:%'
              AND kind IN ('image', 'pdf')
        """,
        "union_spans": f"""
            SELECT doc_id, "offset", kind FROM {_FLAT} f WHERE kind = 'image'
            UNION ALL
            SELECT doc_id, "offset", kind FROM {_FLAT} f WHERE kind = 'pdf'
        """,
        **extra,
    }
