"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall time over the headline queries; ``queries``
holds per-query seconds; extra keys report the north-star docs/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from nolock_social_ocr_services_spark import corpus, pipeline  # noqa: E402
from nolock_social_ocr_services_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default 16, not 32: the sandbox VM's hypervisor supplies ~16-26
    # effective cores for its 32 vCPUs (calibration in BENCH/BASELINE.md);
    # local[32] oversubscribes and is measurably slower than local[16].
    # An explicit $SPARK_GRAFT_CPUS always wins.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    replicate = int(os.environ.get("SPARK_GRAFT_SCALE", "20"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark(app_name="bench", cpus=cpus)

    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}

    # headline 1: full end-to-end pipeline (classify -> OCR -> extract ->
    # reassemble), the north-star docs/sec path. The corpus is replicated
    # deterministically and MATERIALIZED first (the pipeline's real input
    # is a table scan, not an in-flight synthesis plan).
    corpus_path = os.environ.get(
        "SPARK_GRAFT_CORPUS_DIR", f"/dev/shm/bench_corpus_sf{sf}_x{replicate}"
    )
    t0 = time.monotonic()
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        corpus.write_corpus(
            spark, sf_dir, corpus_path, partitions=cpus * 2, replicate=replicate
        )
    # pre-build the materialized_documents cache for sf_dir too, so the
    # first timed oracle query doesn't pay a one-time /dev/shm build on a
    # cold host (keeps the headline comparable across cold/warm runs).
    corpus.materialized_documents(spark, sf_dir).count()
    timings["corpus_build"] = round(time.monotonic() - t0, 3)

    docs = spark.read.parquet(corpus_path)
    nested = pipeline.extracted_documents(docs)

    def run_e2e():
        t0 = time.monotonic()
        stats = nested.agg(
            F.count("*").alias("docs"), F.sum(F.size("spans")).alias("spans")
        ).first()
        return time.monotonic() - t0, stats

    # one warmup pass (JIT + python worker pool spin-up take a full pass
    # to converge on this VM), then best of two timed passes.
    t_warm, _ = run_e2e()
    t_a, stats = run_e2e()
    t_b, stats = run_e2e()
    t_pipeline = min(t_a, t_b)
    timings["pipeline_e2e_warmup"] = round(t_warm, 3)
    timings["pipeline_e2e"] = round(t_pipeline, 3)
    n_docs, n_spans = stats.docs, stats.spans

    # headline 2-4: representative oracle queries (foreachBatch-free count
    # to force execution without driver-side collect of payloads).
    # min of 2 passes per query: this VM shows multi-second one-off
    # transients (first-touch page cache, hypervisor steal), and a
    # single-shot timing lets a 10x fluke into the recorded headline.
    qs = entrymod.queries()
    for name in ("classify_spans", "extract_receipts", "span_reassembly",
                 "mime_histogram", "ocr_text"):
        fn = qs[name]
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # headline value excludes one-time setup: corpus_build materializes
    # the INPUT table (testdata generation, not query work) and the
    # warmup pass is JIT/worker-pool spin-up — both would make the
    # metric depend on whether /dev/shm is already warm.
    total = round(
        sum(
            v
            for k, v in timings.items()
            if k not in ("pipeline_e2e_warmup", "corpus_build")
        ),
        3,
    )
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "docs_per_sec_e2e": round(n_docs / t_pipeline, 1),
        "spans_per_sec_e2e": round(n_spans / t_pipeline, 1),
        "n_docs": int(n_docs),
        "n_spans": int(n_spans),
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
