"""End-to-end extraction pipeline (the reference's EP1/EP2 spine,
SURVEY.md §3, re-expressed as one declarative Spark plan):

    documents(doc_id, spans[])                  Iceberg/parquet scan
      -> explode(spans)                         U2 flatten
      -> salted repartition                     §4 custom #1 (skew)
      -> trie classify (prefix-only UDF)        C1-C4
      -> synthetic OCR (mapInPandas)            T2 stand-in
      -> ordered page concat (built-ins)        T3 / W1
      -> html boilerplate strip                 north_rule text path
      -> typed field extraction (built-ins)     T4-T8
      -> per-doc ordered re-assembly            W1 invariant

Every stage keeps per-row failures as data (error columns), never
failing the job for one row (ST6, ReactivePipelineExtensions.cs:180-188).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract.html import strip_boilerplate
from .extract.ocr import concat_pages, run_ocr
from .extract.records import route_and_extract
from .operators.classify import classify_mime
from .operators.reassemble import reassemble_spans, span_sequence_equal
from .operators.salt import salted_repartition

FLAT_COLUMNS = (
    "doc_id",
    "offset",
    "kind",
    "mime",
    "text",
    "media_ref",
    "receipt",
    "check",
    "receipt_full",
    "check_full",
    "schema_used",
    "extract_error",
    "confidence",
    "ocr_model",
    "ocr_tokens",
)


def barrier_filter(df: DataFrame, cond) -> DataFrame:
    """Filter on already-projected columns WITHOUT letting Catalyst
    substitute the predicate below the projection.

    PushPredicateThroughNonJoin only rewrites ``Filter(Project(...))``
    when EVERY project expression is deterministic, so one throwaway
    ``monotonically_increasing_id()`` column pins the filter above the
    projection. The predicate must REFERENCE that column (OR'd with an
    always-false test of it, inside one non-splittable disjunct) —
    otherwise ColumnPruning deletes the unused nondeterministic field
    first and the now-deterministic Project lets the filter through.
    Why it matters here: a success filter like ``receipt.isNotNull()``
    otherwise inlines the WHOLE extraction expression (the cleanup
    regex chain per tested field) into a pre-projection predicate — the
    plan then runs the regex battery once per field in the filter and
    again in the projection. With the barrier the struct is computed
    once and the filter tests its null bit. Costs one long column,
    dropped immediately; row pruning still happens before any
    downstream stage."""
    return (
        df.withColumn("__no_pushdown", F.monotonically_increasing_id())
        .filter(cond | (F.col("__no_pushdown") < F.lit(0)))
        .drop("__no_pushdown")
    )


def explode_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans[]) -> one row per span. Catalyst prunes unselected
    nested fields out of the scan (check ReadSchema in .explain)."""
    return docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def extract_spans(
    docs: DataFrame,
    salt_buckets: int | None = None,
    partitions: int | None = None,
    fused: bool = False,
    classify_engine: str = "expr",
) -> DataFrame:
    """Flat extracted spans: classify + extract every span.

    ``text`` holds the extraction result per kind: raw text for 'text'
    spans, boilerplate-stripped for 'html', ordered-page OCR markdown for
    media spans ('' for unknown payloads, flagged in extract_error).

    Plan shape (scale-deliberate): ONE scan, ONE salted exchange, no
    branch-and-union (Catalyst would push branch filters below the
    exchange and triple the scan+shuffle). Pandas UDFs are evaluated
    unconditionally on every row even under when(), so instead the UDF
    *inputs* are masked to NULL for non-applicable rows — a scalar Arrow
    UDF ships only its argument columns, and NULL inputs cost ~1 bit/row
    on the transfer: text spans never ship their text into the OCR UDF,
    media spans never ship into the boilerplate stripper.

    ``classify_engine`` defaults to ``"expr"`` — the trie compiled to a
    codegen'd when-chain (classify.trie_match_expr). Measured on the
    sf0.1 x20 corpus, local[16], interleaved A/B: expr 2.07-2.28 s vs
    udf 2.27-2.78 s warm (~10-20% whole-pipeline), and it removes one of
    the two Python stages entirely (one Arrow boundary, half the Python
    worker pressure) — the gap widens at cluster scale. ``"udf"`` keeps
    the broadcast compiled-NumPy trie stage (byte-identical outputs,
    property-tested equivalent) as the slot where a learned classifier
    would go; the oracle-checked ``classify_spans`` query exercises it
    every round.
    """
    exploded = explode_spans(docs)
    if partitions is None:
        # explicit partition count: AQE would coalesce the salted
        # exchange to ~64MB partitions, leaving cores idle and a
        # straggler tail; 3 tasks/core keeps the wave granular.
        cores = docs.sparkSession.sparkContext.defaultParallelism
        partitions = max(salt_buckets or 0, cores * 3, 64)
    salted = salted_repartition(
        exploded, num_partitions=partitions, salt_buckets=salt_buckets
    )
    if fused:
        # one ArrowEvalPython stage instead of two: the trie classify
        # and the OCR run in the same Python batch (see
        # make_fused_classify_ocr_udf); identical outputs, one fewer
        # JVM<->Python Arrow round trip per row.
        from .extract.ocr import _H as _OCR_H
        from .extract.ocr import make_fused_classify_ocr_udf
        from .operators.classify import decode_data_url_prefix
        from .trie import OCTET_STREAM, lenient_trie

        spark = docs.sparkSession
        udf = make_fused_classify_ocr_udf(
            spark, lenient_trie().compile(), OCTET_STREAM
        )
        res = udf(
            decode_data_url_prefix(F.col("media_ref")),
            F.md5(F.col("media_ref")),
        )
        r = F.col(_OCR_H)
        full = F.array(
            F.struct(F.lit(2).alias("index"), r["app2_md"].alias("markdown")),
            F.struct(F.lit(1).alias("index"), r["app1_md"].alias("markdown")),
            F.struct(F.lit(0).alias("index"), r["main_md"].alias("markdown")),
        )
        npages = r["npages"]
        from .extract.ocr import PAGE_SCHEMA

        pages = F.when(
            npages.isNull(), F.lit(None).cast(PAGE_SCHEMA)
        ).otherwise(F.slice(full, F.lit(4) - npages, npages))
        ocred = concat_pages(
            salted.withColumn(_OCR_H, res)
            .withColumn("mime", r["mime"])
            .withColumn("ocr_pages", pages)
            .withColumn("ocr_model", r["model"])
            .withColumn("ocr_tokens", r["tokens"])
            .drop(_OCR_H)
        )
    else:
        classified = classify_mime(
            salted, data_url_col="media_ref", out_col="mime", engine=classify_engine
        )
        ocred = concat_pages(run_ocr(classified))
    html_only = F.when(F.col("kind") == "html", F.col("text"))  # masked input
    extracted = ocred.withColumn(
        "extracted_text",
        F.when(F.col("kind") == "html", strip_boilerplate(html_only))
        .when(F.col("kind") == "text", F.col("text"))
        .otherwise(F.col("ocr_text")),
    )
    typed = route_and_extract(extracted, text_col="ocr_text")
    return typed.select(
        "doc_id",
        "offset",
        "kind",
        "mime",
        F.col("extracted_text").alias("text"),
        "media_ref",
        "receipt",
        "check",
        "receipt_full",
        "check_full",
        "schema_used",
        "extract_error",
        "confidence",
        "ocr_model",
        "ocr_tokens",
    )


def extracted_documents(docs: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Nested output: (doc_id, spans[]) with extracted text, offset order
    restored after the salted shuffle — the span-sequence contract."""
    flat = extract_spans(docs, salt_buckets=salt_buckets)
    return reassemble_spans(
        flat, span_fields=("kind", "text", "media_ref", "offset")
    )


def identity_roundtrip_report(docs: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """Build-plan step 3 invariant: explode -> salt -> reassemble with NO
    extraction must reproduce the input spans exactly (per-doc equal flag).
    """
    exploded = explode_spans(docs)
    salted = salted_repartition(exploded, salt_buckets=salt_buckets)
    rebuilt = reassemble_spans(salted)
    return span_sequence_equal(docs, rebuilt)


def equality_pass_rate(report: DataFrame) -> float:
    """Fraction of docs whose span sequence matches (north-star metric)."""
    row = report.agg(
        F.avg(F.col("equal").cast("double")).alias("rate")
    ).first()
    return float(row.rate) if row.rate is not None else 0.0
