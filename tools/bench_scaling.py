"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 from N to 4N executors, sandbox-evidenced as two
parallelism levels on the same input).

Levels default to local[4] vs local[16] (N=4, 4N=16), NOT 8 vs 32:
a calibration pass with pure CPU spin processes (run_calibration below,
results embedded in BENCH/BASELINE.md) shows this VM's hypervisor
supplies only ~16-26 effective cores for its 32 vCPUs — 8->32 spin
scaling is capped by the HOST (vCPU overcommit), while 2->8 and 4->16
stay in the machine's linear region. The 4/16 pair therefore measures
the JOB's scaling, not the hypervisor cap.

Measurement protocol — SANDWICH ALTERNATION: the host's effective CPU
supply drifts +-60% on minute timescales (noisy neighbors), so timing
level N for six passes and then level 4N for six passes confounds the
level with the host phase. Instead both taskset-pinned JVMs stay alive
and a file-token protocol serializes passes N_0, 4N_0, N_1, 4N_1, ...,
N_pairs; each 4N pass is BRACKETED by the two surrounding N passes and
scored against their mean: eff_i = ((t_N_i + t_N_{i+1})/2 / t_4N_i)/4.
The bracketing cancels drift that is locally linear in time (a plain
adjacent pair is biased whenever the supply moves between its two
passes). The reported figure is the median of per-pair efficiencies
(best pair also shown). Each level does ``warmups`` untimed passes
first (JIT + python-worker spin-up take 2-3 passes to converge).

Writes BENCH/BASELINE.md. Usage: python tools/bench_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from nolock_social_ocr_services_spark.session import get_spark
from nolock_social_ocr_services_spark import pipeline

cpus = int(sys.argv[1]); corpus_path = sys.argv[2]
warmups = int(sys.argv[3]); iters = int(sys.argv[4]); sync_dir = sys.argv[5]
spark = get_spark(app_name=f"scaling_{cpus}", cpus=cpus)
docs = spark.read.parquet(corpus_path)
nested = pipeline.extracted_documents(docs)
n_docs = docs.count()

def run_once():
    t0 = time.monotonic()
    nested.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0

for _ in range(warmups):
    run_once()

# token protocol: wait for sync_dir/turn_<cpus>_<i>, run one pass,
# write sync_dir/done_<cpus>_<i> with the seconds, repeat.
with open(os.path.join(sync_dir, f"ready_{cpus}"), "w") as f:
    f.write("1")
for i in range(iters):
    tok = os.path.join(sync_dir, f"turn_{cpus}_{i}")
    while not os.path.exists(tok):
        time.sleep(0.05)
    sec = run_once()
    with open(os.path.join(sync_dir, f"done_{cpus}_{i}"), "w") as f:
        f.write(repr(sec))
print(json.dumps({"cpus": cpus, "n_docs": n_docs}))
spark.stop()
"""


def _spin(counter, seconds=3.0):
    x = 0
    t0 = time.monotonic()
    while time.monotonic() - t0 < seconds:
        for _ in range(100000):
            x += 1
        counter.value += 100000


def probe_supply(procs: int, seconds: float = 2.0) -> float:
    """Instantaneous host CPU supply (M incr/s) at `procs` spin
    processes — an independent probe of whether the hypervisor is
    actually granting that many cores RIGHT NOW."""
    counters = [multiprocessing.Value("l", 0) for _ in range(procs)]
    ps = [
        multiprocessing.Process(target=_spin, args=(c, seconds))
        for c in counters
    ]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return round(sum(c.value for c in counters) / seconds / 1e6, 1)


def run_calibration(levels=(2, 4, 8, 16, 32)) -> dict[int, float]:
    """Pure-CPU spin throughput (M incr/s) per process count — measures
    the VM's effective core supply independent of Spark."""
    out = {}
    for procs in levels:
        counters = [multiprocessing.Value("l", 0) for _ in range(procs)]
        ps = [multiprocessing.Process(target=_spin, args=(c,)) for c in counters]
        [p.start() for p in ps]
        [p.join() for p in ps]
        out[procs] = round(sum(c.value for c in counters) / 3.0 / 1e6, 1)
    return out


def start_child(cpus: int, corpus_path: str, warmups: int, iters: int,
                sync_dir: str) -> subprocess.Popen:
    # taskset pins the WHOLE process tree (JVM executor threads AND the
    # Python UDF worker processes) to exactly `cpus` cores — local[N]
    # alone is not an N-core cluster, because Arrow UDF workers are
    # separate processes that would spill onto the other cores.
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        sys.executable, "-c", CHILD % {"repo": REPO},
        str(cpus), corpus_path, str(warmups), str(iters), sync_dir,
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, env=env)


def _await(path: str, timeout: float = 3600) -> None:
    t0 = time.monotonic()
    while not os.path.exists(path):
        if time.monotonic() - t0 > timeout:
            raise TimeoutError(path)
        time.sleep(0.1)


def _read_sec(path: str) -> float:
    _await(path)
    time.sleep(0.05)  # let the write land
    with open(path) as f:
        return float(f.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_SCALE", "300"))
    lo_cores = int(os.environ.get("SCALING_N", "4"))
    hi_cores = lo_cores * 4
    sf = sf_dir.rstrip("/").split("sf")[-1]
    corpus_path = f"/dev/shm/scaling_corpus_sf{sf}_x{replicate}"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        sys.path.insert(0, REPO)
        from nolock_social_ocr_services_spark.corpus import write_corpus
        from nolock_social_ocr_services_spark.session import get_spark

        spark = get_spark(app_name="scaling_gen", cpus=16)
        write_corpus(spark, sf_dir, corpus_path, partitions=128, replicate=replicate)
        spark.stop()

    calib = run_calibration()
    warmups = int(os.environ.get("SCALING_WARMUPS", "2"))
    pairs = int(os.environ.get("SCALING_PAIRS", "6"))
    sync_dir = f"/dev/shm/scaling_sync_{os.getpid()}"
    os.makedirs(sync_dir, exist_ok=True)

    n_docs = None
    lo_proc = start_child(lo_cores, corpus_path, warmups, pairs + 1, sync_dir)
    hi_proc = start_child(hi_cores, corpus_path, warmups, pairs, sync_dir)
    try:
        # both children finish warmup before any timed pass
        _await(os.path.join(sync_dir, f"ready_{lo_cores}"))
        _await(os.path.join(sync_dir, f"ready_{hi_cores}"))
        lo_times, hi_times, pair_eff = [], [], []

        def run_pass(cores: int, i: int) -> float:
            open(os.path.join(sync_dir, f"turn_{cores}_{i}"), "w").close()
            return round(_read_sec(os.path.join(sync_dir, f"done_{cores}_{i}")), 2)

        # strictly serialized sandwich: N_0, 4N_0, N_1, 4N_1, ..., N_pairs
        # SYMMETRIC supply probes (protocol v2): one before EVERY slot,
        # N and 4N alike — a starved N slot inflates the efficiency just
        # as a starved 4N slot deflates it, so validity must gate both.
        supply, lo_supply = [], []
        lo_supply.append(probe_supply(hi_cores))
        lo_times.append(run_pass(lo_cores, 0))
        for i in range(pairs):
            supply.append(probe_supply(hi_cores))
            hi_times.append(run_pass(hi_cores, i))
            lo_supply.append(probe_supply(hi_cores))
            lo_times.append(run_pass(lo_cores, i + 1))
            bracket = (lo_times[i] + lo_times[i + 1]) / 2.0
            pair_eff.append(round((bracket / hi_times[i]) / 4.0, 3))
        lo_proc.wait(timeout=600)
        hi_proc.wait(timeout=600)
    finally:
        for p in (lo_proc, hi_proc):
            if p.poll() is None:
                p.kill()

    sys.path.insert(0, REPO)
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{corpus_path}/*.parquet'"
    ).fetchone()[0]

    # Drift validity: the bracket exists to cancel drift that is
    # locally LINEAR in time; when the two bracketing N passes disagree
    # by more than 35% the host supply shifted non-linearly inside the
    # pair and no bracketing can rescue it. The criterion uses ONLY the
    # N side (independent of the measured 4N time), is fixed in advance,
    # and every pair is still shown in the table.
    # A pair is additionally invalid when an independent spin probe
    # shows the hypervisor starving ANY of the pair's three slots
    # (supply < 75% of the run's best probe) — the 4N slot (starvation
    # deflates efficiency: the job measures the host) AND both
    # bracketing N slots (starvation there INFLATES efficiency by
    # slowing the denominator side). All criteria are independent of
    # the measured 4N job time.
    all_probes = supply + lo_supply
    best_supply = max(all_probes) if all_probes else 1.0
    ok_sup = [s >= 0.75 * best_supply for s in supply]
    ok_lo = [s >= 0.75 * best_supply for s in lo_supply]
    valid = [
        abs(lo_times[i] - lo_times[i + 1]) / min(lo_times[i], lo_times[i + 1])
        <= 0.35
        and ok_sup[i]
        and ok_lo[i]
        and ok_lo[i + 1]
        for i in range(len(pair_eff))
    ]
    valid_eff = [e for e, v in zip(pair_eff, valid) if v]
    med_eff = statistics.median(valid_eff if len(valid_eff) >= 2 else pair_eff)
    best_i = max(range(len(pair_eff)), key=lambda i: pair_eff[i])
    lo_best, hi_best = min(lo_times), min(hi_times)

    c_eff = {
        f"{a}->{b}": round(calib[b] / calib[a] / (b / a), 2)
        for a, b in ((2, 8), (4, 16), (8, 32))
        if a in calib and b in calib
    }
    md = f"""# BENCH — scaling evidence (north_rule two-cluster-size criterion)

Same job (full extraction pipeline: parquet scan -> explode -> balanced
hash repartition on (doc_id, offset) -> trie classify -> synthetic OCR
-> ordered page concat -> HTML strip -> typed extraction -> per-doc
offset-order reassembly), same materialized input corpus
({n_docs} docs), two taskset-pinned long-lived JVMs (sandbox stand-in
for N vs 4N executors), {warmups} warmup passes per level.

## Host calibration (why N={lo_cores}, 4N={hi_cores} and not 8/32)

Pure-CPU spin throughput (M increments/s) by process count on this VM:
{json.dumps(calib)} — the hypervisor supplies only ~16-26 effective
cores for the 32 vCPUs, and the supply drifts +-60% on minute
timescales. Spin scaling efficiency: {json.dumps(c_eff)}. 8->32 is
capped by the HOST (vCPU overcommit / lock-holder preemption), so the
job is evidenced at {lo_cores}->{hi_cores} cores, inside the machine's linear
region. On a real multi-executor cluster the 4N level adds whole
machines (CPU + memory bandwidth + shuffle disks scale together),
which is what the pinned pair emulates.

## Sandwich-alternation protocol

Because the host supply drifts, the two levels alternate single passes
(N_0, 4N_0, N_1, 4N_1, ..., N_{pairs}); each 4N pass is scored against
the MEAN of its two bracketing N passes — locally-linear drift cancels:
eff_i = ((t_N_i + t_N_i+1)/2 / t_4N_i) / 4.

A pair is valid iff (a) its two bracketing N passes agree within 35%
(drift shifted non-linearly inside the pair otherwise — bracketing
cannot cancel that) and (b) independent {hi_cores}-process CPU-spin
probes run just before EVERY slot of the pair — both bracketing N slots
and the 4N slot — each show >= 75% of the run's best supply. A starved
4N slot measures the hypervisor, not the job; a starved N slot is just
as disqualifying because it inflates the efficiency by slowing the
denominator side (probing only the 4N slots would bias the statistic
upward). All criteria are fixed in advance and independent of the
measured 4N job time; every pair is shown.

| pair | probe@N (M/s) | t_N before (s) | probe@4N (M/s) | t_4N={hi_cores}c (s) | probe@N' (M/s) | t_N after (s) | efficiency | valid |
|---|---|---|---|---|---|---|---|---|
""" + "\n".join(
        f"| {i} | {lo_supply[i]:.0f} | {lo_times[i]:.2f} | {supply[i]:.0f} | "
        f"{hi_times[i]:.2f} | {lo_supply[i + 1]:.0f} | "
        f"{lo_times[i + 1]:.2f} | {pair_eff[i]:.3f} | "
        f"{'yes' if valid[i] else 'no'} |"
        for i in range(len(pair_eff))
    ) + f"""

**Median scaling efficiency over valid pairs = {med_eff:.3f}**
({sum(valid)}/{len(valid)} pairs valid; best pair
{pair_eff[best_i]:.3f}; north_rule threshold: >= 0.8).

Throughput at best pass: N: {n_docs / lo_best:.0f} docs/sec ({lo_best:.2f} s),
4N: {n_docs / hi_best:.0f} docs/sec ({hi_best:.2f} s).
Corpus: {corpus_path} (sf{sf} documents x{replicate} deterministic replicas).
Generated by tools/bench_scaling.py on local[{lo_cores}]/local[{hi_cores}],
single host, {time.strftime('%Y-%m-%d')}.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # Every run is logged in runs.jsonl; BASELINE.md is rewritten on
    # every run and its HEADLINE is the cross-run median over runs with
    # >= 2 valid pairs (reporting the all-time max would be upward-
    # biased selection over host noise). The latest run's full table is
    # embedded; best run is stated but never the headline.
    runs_path = os.path.join(REPO, "BENCH", "runs.jsonl")
    with open(runs_path, "a") as f:
        f.write(json.dumps({
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "protocol": "v2-symmetric-probes",
            "median_efficiency": med_eff, "pair_eff": pair_eff,
            "valid": valid, "supply_probes": supply,
            "lo_supply_probes": lo_supply,
            "lo_times": lo_times, "hi_times": hi_times,
        }) + "\n")
    run_medians = []  # current (v2) protocol only — the headline pool
    v1_medians = []
    with open(runs_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
                if sum(rec.get("valid", [])) < 2:
                    continue
                if rec.get("protocol") == "v2-symmetric-probes":
                    run_medians.append(rec["median_efficiency"])
                else:
                    v1_medians.append(rec["median_efficiency"])
            except (ValueError, KeyError):
                pass
    cross_med = statistics.median(run_medians) if run_medians else None
    cross_best = max(run_medians) if run_medians else None
    v1_med = statistics.median(v1_medians) if v1_medians else None
    if cross_med is None:
        # No v2 run has >= 2 valid pairs yet: say so — do NOT headline
        # the current run's number (its pairs failed the validity
        # criteria, so it is evidence of host noise, not of scaling).
        summary = (
            f"\n## Cross-run summary (all logged runs, BENCH/runs.jsonl)\n\n"
            f"**No v2-protocol run has produced >= 2 valid pairs yet** —"
            f" the latest run's median ({med_eff:.3f}) is NOT pooled"
            f" ({sum(valid)}/{len(valid)} pairs passed the pre-registered"
            f" validity criteria; the host was supply-starved)."
            f" Provisional evidence is the v1-protocol cross-run median"
            f" {v1_med:.3f}"
            f" ({', '.join(f'{m:.3f}' for m in v1_medians)}) — v1 probed"
            f" supply before 4N slots only, so treat it with that bias"
            f" caveat (north_rule threshold >= 0.8). This file is"
            f" rewritten every run with the latest run's full table"
            f" below.\n"
            if v1_med is not None else
            f"\n## Cross-run summary (all logged runs, BENCH/runs.jsonl)\n\n"
            f"**No run has produced >= 2 valid pairs yet**; latest run"
            f" median {med_eff:.3f} (not pooled).\n"
        )
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
            f.write(md.split("## Sandwich-alternation protocol")[0]
                    + summary
                    + "\n## Sandwich-alternation protocol"
                    + md.split("## Sandwich-alternation protocol")[1])
        print(md)
        print(summary)
        print(json.dumps({"median_efficiency": med_eff, "pair_eff": pair_eff,
                          "valid": valid, "supply_probes": supply,
                          "lo_times": lo_times, "hi_times": hi_times,
                          "n_docs": n_docs, "calibration": calib}))
        return
    summary = (
        f"\n## Cross-run summary (all logged runs, BENCH/runs.jsonl)\n\n"
        f"**Median scaling efficiency across the {len(run_medians)}"
        f" v2-protocol runs with >= 2 valid pairs: {cross_med:.3f}**"
        f" (north_rule threshold >= 0.8). Latest run: {med_eff:.3f};"
        f" best v2 run: {cross_best:.3f} (best is stated for completeness,"
        f" never used as the headline — max-over-noisy-runs is upward-"
        f"biased). The headline pools only v2-symmetric-probe runs: v1"
        f" runs probed supply before 4N slots only, so their validity"
        f" flags are biased in BOTH directions (a starved N slot inflates"
        f" efficiency and was never invalidated; an uncaught starved-4N"
        f" deflates it) — their medians"
        f" ({', '.join(f'{m:.3f}' for m in v1_medians) or 'none'};"
        f" median {v1_med:.3f}) are kept in the log and stated here but"
        f" not pooled. This file is rewritten every run with the latest"
        f" run's full table below.\n"
        if v1_med is not None else
        f"\n## Cross-run summary (all logged runs, BENCH/runs.jsonl)\n\n"
        f"**Median scaling efficiency across the {len(run_medians)}"
        f" v2-protocol runs with >= 2 valid pairs: {cross_med:.3f}**"
        f" (north_rule threshold >= 0.8). Latest run: {med_eff:.3f};"
        f" best v2 run: {cross_best:.3f}.\n"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md.split("## Sandwich-alternation protocol")[0]
                + summary
                + "\n## Sandwich-alternation protocol"
                + md.split("## Sandwich-alternation protocol")[1])
    print(md)
    print(summary)
    print(json.dumps({"median_efficiency": med_eff, "pair_eff": pair_eff,
                      "valid": valid, "supply_probes": supply,
                      "lo_times": lo_times, "hi_times": hi_times,
                      "n_docs": n_docs, "calibration": calib}))


if __name__ == "__main__":
    main()
