"""Checkpoint/resume protocol: a killed run resumes from the last
committed partition, recomputes nothing already committed, and the final
output is identical to an uninterrupted run (FIXTURES.md §5)."""

import pytest
from pyspark.sql import functions as F

from nolock_social_ocr_services_spark import corpus, lineage


N_PARTS = 6


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return corpus.synthesize_documents(spark, sf_dir).cache()


def _rows(df):
    return sorted(
        (r.doc_id, r.offset, r.kind, r.mime, r.text, r.media_ref)
        for r in df.select(
            "doc_id", "offset", "kind", "mime", "text", "media_ref"
        ).collect()
    )


def test_kill_and_resume_byte_identical(spark, docs, tmp_path_factory):
    clean_dir = str(tmp_path_factory.mktemp("clean"))
    killed_dir = str(tmp_path_factory.mktemp("killed"))

    # uninterrupted reference run
    done = lineage.run_extract_job(
        spark, docs, clean_dir, run_id="clean", num_parts=N_PARTS
    )
    assert done == list(range(N_PARTS))

    # killed run: crashes after 2 commits
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.run_extract_job(
            spark, docs, killed_dir, run_id="run1", num_parts=N_PARTS, fail_after=2
        )
    assert lineage.committed_parts(spark, killed_dir) == {0, 1}

    # partial output only exposes committed units
    partial = lineage.read_output(spark, killed_dir)
    assert 0 < partial.count() < spark.read.parquet(f"{clean_dir}/data").count()

    # resume: processes exactly the remaining units
    resumed = lineage.run_extract_job(
        spark, docs, killed_dir, run_id="run2", num_parts=N_PARTS
    )
    assert resumed == list(range(2, N_PARTS))
    assert lineage.committed_parts(spark, killed_dir) == set(range(N_PARTS))

    # final output identical to the clean run
    assert _rows(lineage.read_output(spark, killed_dir)) == _rows(
        lineage.read_output(spark, clean_dir)
    )

    # re-running a complete job is a no-op
    assert lineage.run_extract_job(
        spark, docs, killed_dir, run_id="run3", num_parts=N_PARTS
    ) == []


def test_lineage_rows_cover_corpus(spark, docs, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("lin"))
    lineage.run_extract_job(spark, docs, out_dir, run_id="r", num_parts=N_PARTS)
    lin = lineage.read_lineage(spark, out_dir)
    assert lin.count() == N_PARTS
    assert set(lin.columns) == {
        "run_id", "part_id", "doc_count", "span_count", "trie_hits", "committed_at"
    }
    totals = lin.agg(
        F.sum("doc_count").alias("docs"), F.sum("span_count").alias("spans")
    ).first()
    assert totals.docs == docs.count()
    assert totals.spans == docs.agg(F.sum(F.size("spans"))).first()[0]
    # trie-hit histogram totals == media span count (A5)
    hist_total = (
        lin.select(F.explode("trie_hits").alias("m", "n")).agg(F.sum("n")).first()[0]
    )
    media = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.media_ref").isNotNull())
        .count()
    )
    assert hist_total == media


def test_pending_docs_anti_join(spark, docs, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("anti"))
    with pytest.raises(RuntimeError):
        lineage.run_extract_job(
            spark, docs, out_dir, run_id="r", num_parts=N_PARTS, fail_after=3
        )
    docsp = lineage.with_part_id(docs, N_PARTS)
    manifest = spark.read.parquet(f"{out_dir}/_manifest")
    pending = lineage.pending_docs(docsp, manifest)
    assert pending.filter(F.col("part_id").isin(0, 1, 2)).count() == 0
    assert pending.count() == docsp.filter(~F.col("part_id").isin(0, 1, 2)).count()


def test_batched_units_identical_to_per_unit(spark, docs, tmp_path_factory):
    """batch_size > 1 (one scan + dynamic-partition-overwrite per batch)
    must produce byte-identical output, lineage coverage, and manifests
    as the per-unit path — only the scan count differs."""
    per_unit = str(tmp_path_factory.mktemp("per_unit"))
    batched = str(tmp_path_factory.mktemp("batched"))
    lineage.run_extract_job(
        spark, docs, per_unit, run_id="u1", num_parts=N_PARTS, batch_size=1
    )
    lineage.run_extract_job(
        spark, docs, batched, run_id="b1", num_parts=N_PARTS, batch_size=4
    )
    assert _rows(lineage.read_output(spark, per_unit)) == _rows(
        lineage.read_output(spark, batched)
    )
    assert lineage.committed_parts(spark, batched) == set(range(N_PARTS))
    lin = {
        r.part_id: (r.doc_count, r.span_count)
        for r in lineage.read_lineage(spark, batched).collect()
    }
    lin_u = {
        r.part_id: (r.doc_count, r.span_count)
        for r in lineage.read_lineage(spark, per_unit).collect()
    }
    assert lin == lin_u


def test_batched_kill_resume(spark, docs, tmp_path_factory):
    """Kill between batches: committed batches are skipped on resume and
    the final output matches an uninterrupted batched run."""
    out = str(tmp_path_factory.mktemp("bkill"))
    with pytest.raises(RuntimeError):
        lineage.run_extract_job(
            spark, docs, out, run_id="b2", num_parts=N_PARTS,
            batch_size=2, fail_after=2,
        )
    first = lineage.committed_parts(spark, out)
    assert len(first) == 2  # exactly one batch committed
    resumed = lineage.run_extract_job(
        spark, docs, out, run_id="b2r", num_parts=N_PARTS, batch_size=2
    )
    assert set(resumed) == set(range(N_PARTS)) - first
    clean = str(tmp_path_factory.mktemp("bclean"))
    lineage.run_extract_job(
        spark, docs, clean, run_id="bc", num_parts=N_PARTS, batch_size=2
    )
    assert _rows(lineage.read_output(spark, out)) == _rows(
        lineage.read_output(spark, clean)
    )
