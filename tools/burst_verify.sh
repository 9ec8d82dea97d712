#!/bin/bash
# Quiet-host verification burst: run between scaling-campaign runs with
# the campaign SIGSTOPped, so pytest/oracle/bench Spark jobs never share
# the host with an in-flight scaling pass (in-VM competition is invisible
# to the scaling protocol's validity gates — see CANARY_LEAK_WINDOW).
set -x
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=/root/repo

python -m pytest tests/test_records_full.py tests/test_pipeline.py \
  tests/test_plans.py -x -q 2>&1 | tail -3

python tools/check_oracle.py extract_receipts extract_checks \
  extract_receipts_full extract_checks_full receipt_items validate_enums \
  batch_stats extraction_stats filter_route classify_strict \
  span_reassembly 2>&1 | tail -3

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=16 \
SPARK_GRAFT_SCALE=5 SPARK_GRAFT_CORPUS_DIR=/dev/shm/burst_corpus_001_x5 \
  python bench.py 2>/dev/null | tail -1
