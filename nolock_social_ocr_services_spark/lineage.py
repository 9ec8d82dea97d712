"""Partition-granular checkpointing + per-partition lineage (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Spark has no built-in resumable-batch primitive (SURVEY.md §4 custom
strategy #3), so this module implements the protocol explicitly:

* the corpus is split into ``num_parts`` deterministic resume units
  (``part_id = pmod(hash(doc_id), P)`` — on a real deployment these are
  Iceberg partitions; hash-of-key keeps the unit assignment stable
  across runs and cluster sizes);
* each unit is extracted and written to ``data/part_id=K/`` with
  idempotent overwrite, THEN a lineage row (doc/span counts + trie-hit
  histogram, FIXTURES.md §5) and a manifest marker are committed —
  write-data-then-manifest ordering makes a kill at any point safe:
  an uncommitted unit is simply re-overwritten on resume;
* resume = anti-join the unit list against the committed manifest and
  process only the remainder (``OcrRequestHandler``'s per-request
  idempotence, lifted to partition granularity);
* readers go through ``read_output``, which only exposes committed
  units, so a killed run never leaks partial data.

The reference's progress/statistics events (ThroughWithProgress,
ReactivePipelineExtensions.cs:199-251; PipelineStatistics,
ReactiveMistralOcrPipeline.cs:262-269) map onto the lineage rows.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import extract_spans


def with_part_id(docs: DataFrame, num_parts: int) -> DataFrame:
    return docs.withColumn(
        "part_id", F.pmod(F.hash(F.col("doc_id")), F.lit(num_parts))
    )


def committed_parts(spark: SparkSession, out_dir: str) -> set[int]:
    """Units whose manifest marker exists (= fully committed)."""
    manifest = f"{out_dir}/_manifest"
    if not os.path.exists(manifest):
        return set()
    rows = spark.read.parquet(manifest).select("part_id").distinct().collect()
    return {r.part_id for r in rows}


def pending_docs(docs_with_part: DataFrame, manifest_df: DataFrame) -> DataFrame:
    """Anti-join resume: documents of not-yet-committed units only."""
    done = manifest_df.select("part_id").distinct()
    return docs_with_part.join(F.broadcast(done), on="part_id", how="left_anti")


def _lineage_row(flat_out: DataFrame, run_id: str, part_id: int) -> DataFrame:
    """(run_id, part_id, doc_count, span_count, trie_hits, committed_at)
    computed from the committed partition output in one aggregation."""
    spark = flat_out.sparkSession
    hits = (
        flat_out.filter(F.col("mime").isNotNull())
        .groupBy("mime")
        .agg(F.count("*").alias("n"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("mime"), F.col("n")))
            ).alias("trie_hits")
        )
    )
    counts = flat_out.agg(
        F.countDistinct("doc_id").alias("doc_count"),
        F.count("*").alias("span_count"),
    )
    return (
        counts.crossJoin(hits)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("part_id", F.lit(part_id))
        .withColumn("committed_at", F.current_timestamp())
        .select(
            "run_id", "part_id", "doc_count", "span_count", "trie_hits",
            "committed_at",
        )
    )


def _lineage_rows_batch(
    flat_out: DataFrame, run_id: str
) -> DataFrame:
    """Batch form of the lineage row: one (run_id, part_id, doc_count,
    span_count, trie_hits, committed_at) row per part_id in one
    aggregation over the re-read committed output."""
    hits = (
        flat_out.filter(F.col("mime").isNotNull())
        .groupBy("part_id", "mime")
        .agg(F.count("*").alias("n"))
        .groupBy("part_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("mime"), F.col("n")))
            ).alias("trie_hits")
        )
    )
    counts = flat_out.groupBy("part_id").agg(
        F.countDistinct("doc_id").alias("doc_count"),
        F.count("*").alias("span_count"),
    )
    return (
        counts.join(hits, on="part_id", how="left")
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
        .select(
            "run_id", "part_id", "doc_count", "span_count", "trie_hits",
            "committed_at",
        )
    )


def run_extract_job(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str,
    num_parts: int = 16,
    salt_buckets: int | None = None,
    fail_after: int | None = None,
    batch_size: int = 1,
) -> list[int]:
    """Run (or resume) the checkpointed extraction job.

    Returns the list of part_ids processed by THIS invocation (already-
    committed units are skipped via the manifest anti-check).
    ``fail_after=k`` injects a crash after >= k units commit (kill/resume
    tests; checked at batch boundaries).

    ``batch_size``: units extracted per Spark job. At 1 (default) each
    unit is its own job — finest resume granularity, but every unit
    RE-SCANS the full input (the part_id filter is a hash of doc_id, so
    no partition pruning), i.e. P scans for P units. At scale set
    batch_size ~ 8-64: one scan + one dynamic-partition-overwrite write
    per batch (ceil(P/B) scans total), manifests still committed per
    unit AFTER the batch's data lands, so a kill mid-batch just
    re-extracts that batch's uncommitted units on resume (idempotent
    overwrite). Resume granularity coarsens to the batch only for
    in-flight work, never for committed units.
    """
    docsp = with_part_id(docs, num_parts)
    done = committed_parts(spark, out_dir)
    pending = [p for p in range(num_parts) if p not in done]
    processed: list[int] = []
    for i in range(0, len(pending), max(batch_size, 1)):
        if fail_after is not None and len(processed) >= fail_after:
            raise RuntimeError(f"injected failure after {fail_after} commits")
        batch = pending[i : i + max(batch_size, 1)]
        if len(batch) == 1:
            part = batch[0]
            part_docs = docsp.filter(F.col("part_id") == part).drop("part_id")
            data_path = f"{out_dir}/data/part_id={part}"
            extract_spans(part_docs, salt_buckets=salt_buckets).write.mode(
                "overwrite"
            ).parquet(data_path)
            # data committed -> now lineage + manifest (ordering = crash safety)
            flat_out = spark.read.parquet(data_path)
            _lineage_row(flat_out, run_id, part).write.mode("append").parquet(
                f"{out_dir}/_lineage"
            )
            _write_manifest(spark, out_dir, run_id, [part])
            processed.append(part)
            continue
        batch_docs = docsp.filter(F.col("part_id").isin(batch)).drop("part_id")
        flat = extract_spans(batch_docs, salt_buckets=salt_buckets)
        # part_id is a pure function of doc_id -> re-derive after
        # extraction and write all units of the batch in ONE job.
        flat_p = with_part_id(flat, num_parts)
        (
            flat_p.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part_id")
            .parquet(f"{out_dir}/data")
        )
        re_read = spark.read.parquet(f"{out_dir}/data").filter(
            F.col("part_id").isin(batch)
        )
        _lineage_rows_batch(re_read, run_id).write.mode("append").parquet(
            f"{out_dir}/_lineage"
        )
        _write_manifest(spark, out_dir, run_id, batch)
        processed.extend(batch)
    return processed


def _write_manifest(
    spark: SparkSession, out_dir: str, run_id: str, parts: list[int]
) -> None:
    rows = spark.createDataFrame(
        [(run_id, p, "committed", f"{out_dir}/data/part_id={p}") for p in parts],
        "run_id string, part_id int, status string, output_snapshot string",
    ).withColumn("committed_at", F.current_timestamp())
    rows.write.mode("append").parquet(f"{out_dir}/_manifest")


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Committed extraction output only (uncommitted dirs are invisible)."""
    done = committed_parts(spark, out_dir)
    df = spark.read.option("basePath", f"{out_dir}/data").parquet(
        *[f"{out_dir}/data/part_id={p}" for p in sorted(done)]
    )
    return df.drop("part_id")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/_lineage")
