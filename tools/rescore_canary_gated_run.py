"""One-off re-score of the single protocol-v4 ("v4-canary-gated") run.

v4 gated pair validity on the in-pass canary (criterion d); v4.1
withdrew that gate as structurally confounded (see the CANARY_MIN_FRAC
note in bench_scaling.py). This script recomputes the ONE v4 run's
pair validity under the surviving criteria — (a) bracket agreement
<= 35%, (b) symmetric point probes >= 75% of run best, (c) in-pass
steal <= 20% — from the raw per-pass data already in runs.jsonl, and
appends a "v4.1-canary-recorded" record with "rescored_from" set to
the original timestamp. The original v4 line is left untouched; the
pooling in bench_scaling.py skips "v4-canary-gated" lines so the run
is never double-counted. Measured times are bit-identical to the
original record — only the validity flags change, and they change to
exactly what protocol v3 (long fixed in advance) would have said.

Usage: python tools/rescore_canary_gated_run.py
"""

from __future__ import annotations

import json
import os
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = os.path.join(REPO, "BENCH", "runs.jsonl")
STEAL_MAX_FRAC = 0.20


def rescore(rec: dict) -> dict:
    lo_t, hi_t = rec["lo_times"], rec["hi_times"]
    lo_s, hi_s = rec["lo_steal"], rec["hi_steal"]
    sup, lo_sup = rec["supply_probes"], rec["lo_supply_probes"]
    best = max(sup + lo_sup)
    valid = [
        abs(lo_t[i] - lo_t[i + 1]) / min(lo_t[i], lo_t[i + 1]) <= 0.35
        and sup[i] >= 0.75 * best
        and lo_sup[i] >= 0.75 * best
        and lo_sup[i + 1] >= 0.75 * best
        and hi_s[i] <= STEAL_MAX_FRAC
        and lo_s[i] <= STEAL_MAX_FRAC
        and lo_s[i + 1] <= STEAL_MAX_FRAC
        for i in range(len(rec["pair_eff"]))
    ]
    eff = [e for e, v in zip(rec["pair_eff"], valid) if v]
    med = statistics.median(eff if len(eff) >= 2 else rec["pair_eff"])
    out = dict(rec)
    out["protocol"] = "v4.1-canary-recorded"
    out["rescored_from"] = rec["ts"]
    out["valid"] = valid
    out["median_efficiency"] = med
    return out


def main() -> None:
    with open(RUNS) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    targets = [r for r in recs if r.get("protocol") == "v4-canary-gated"]
    already = {
        r.get("rescored_from")
        for r in recs
        if r.get("protocol") == "v4.1-canary-recorded"
    }
    appended = 0
    with open(RUNS, "a") as f:
        for rec in targets:
            if rec["ts"] in already:
                continue
            out = rescore(rec)
            f.write(json.dumps(out) + "\n")
            appended += 1
            print(json.dumps({
                "rescored_from": out["rescored_from"],
                "median_efficiency": out["median_efficiency"],
                "valid": out["valid"],
            }))
    print(f"appended {appended} re-score record(s)")


if __name__ == "__main__":
    main()
