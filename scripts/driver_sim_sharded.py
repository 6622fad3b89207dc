"""Process-sharded full-registry driver_sim (round 10, VERDICT r9 #2).

verify_all's driver stage — the full-volume 411-query correctness sim —
was the round loop's single biggest serial cost: 2,128 s of the 3,153 s
one-command repro ran in ONE Spark session (PROGRESS.jsonl
`verify_all_stages`, round 9).  The sharded test runner already proved
4-way subprocess isolation safe on this host (the shard-safety audit at
scripts/run_tests_sharded.py:8-16 applies verbatim: no shared
metastore, per-process SparkSessions, auto-incrementing UI ports); this
script applies the same split to the sim: N driver_sim subprocesses,
each owning every n-th query of the sorted registry (--shard i/n),
each verifying its slice at sf0.01 AND (with --full-volume) sf0.1 AND
the sf1 sensitive subset when the fixture exists — then the per-shard
JSON status maps are merged into the SAME CORRECTNESS_LOCAL.md the
serial run wrote.

The round-robin split preserves the per-query clearCache hygiene (each
shard clears between queries exactly as the serial sim did) and the
entry() smoke runs in every shard (seconds; also N independent checks
of the flagship contract).

Round 11 (VERDICT r10 #1): the split is COST-PACKED — each shard LPT-
packs the registry by the measured per-query walls in
scripts/driver_shard_costs.json (refreshed here with --update-costs
after a complete green run), replacing the round-robin-by-name split
whose 6-way spread was 471-823 s because one name-slice drew the heavy
sf1-sensitive queries.  --sf1-full extends the sf1 tier to the whole
registry (VERDICT r10 #4).

Usage: python scripts/driver_sim_sharded.py [--workers N] [--full-volume]
           [--sf1-full] [--update-costs] [--no-summary] [sf_dir]
Exit 0 iff every shard exits 0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_shard(
    i: int,
    n: int,
    sf_dir: str,
    full_volume: bool,
    no_volume: bool = False,
    sf1_full: bool = False,
) -> dict:
    out_path = f"/tmp/driver_sim_shard_{i}_{n}.json"
    try:
        os.unlink(out_path)
    except OSError:
        pass
    cmd = [
        sys.executable,
        "scripts/driver_sim.py",
        "--shard",
        f"{i}/{n}",
        "--json",
        out_path,
        sf_dir,
    ]
    if full_volume:
        cmd.insert(2, "--full-volume")
    if no_volume:
        cmd.insert(2, "--no-volume")
    if sf1_full:
        cmd.insert(2, "--sf1-full")
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_SHARD_CPUS", "8"),
        # cap each shard's DuckDB oracle to its cpu budget — uncapped,
        # every shard's oracle grabs all 32 cores and the sf1-heavy
        # stretch runs ~6x oversubscribed (round 11, VERDICT r10 #1)
        "SPARK_GRAFT_ORACLE_THREADS": os.environ.get(
            "SPARK_GRAFT_SHARD_CPUS", "8"
        ),
    }
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True)
    wall = round(time.perf_counter() - t0, 1)
    data: dict = {}
    try:
        with open(out_path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        pass
    return {
        "i": i,
        "rc": proc.returncode,
        "wall_sec": wall,
        "data": data,
        "stdout_tail": proc.stdout[-4000:],
        "stderr_tail": proc.stderr[-2000:] if proc.returncode != 0 else "",
    }


def main() -> None:
    argv = sys.argv[1:]
    workers = 4
    if "--workers" in argv:
        workers = int(argv[argv.index("--workers") + 1])
    full_volume = "--full-volume" in argv
    no_volume = "--no-volume" in argv
    sf1_full = "--sf1-full" in argv
    update_costs = "--update-costs" in argv
    write_summary = "--no-summary" not in argv
    pos = [
        a
        for j, a in enumerate(argv)
        if not a.startswith("--")
        and (j == 0 or argv[j - 1] != "--workers")
    ]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.01"

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as ex:
        results = list(
            ex.map(
                lambda i: run_shard(
                    i, workers, sf_dir, full_volume, no_volume, sf1_full
                ),
                range(workers),
            )
        )
    total = round(time.perf_counter() - t0, 1)

    statuses: dict[str, str] = {}
    big_statuses: dict[str, str] = {}
    sf1_statuses: dict[str, str] = {}
    failures: list[str] = []
    big_failures: list[str] = []
    costs: dict[str, dict[str, float]] = {"sf0.01": {}, "sf0.1": {}, "sf1": {}}
    ok = True
    complete = True  # every shard produced its JSON (ADVICE r10: a
    # crashed shard must not let a PARTIAL table overwrite the committed
    # full-registry CORRECTNESS_LOCAL.md)
    for r in sorted(results, key=lambda r: r["i"]):
        d = r["data"]
        if not d:
            complete = False
        if r["rc"] != 0 and not d:
            # shard crashed before writing its JSON — surface and fail
            ok = False
            print(f"[shard {r['i']}] CRASH rc={r['rc']}")
            print(r["stdout_tail"])
            print(r["stderr_tail"], file=sys.stderr)
            continue
        statuses.update(d.get("statuses", {}))
        big_statuses.update(d.get("big_statuses", {}))
        sf1_statuses.update(d.get("sf1_statuses", {}))
        failures.extend(d.get("failures", []))
        big_failures.extend(d.get("big_failures", []))
        for tier, m in (d.get("costs") or {}).items():
            costs.setdefault(tier, {}).update(m)
        if r["rc"] != 0:
            ok = False
        print(
            f"[shard {r['i']}] {'PASS' if r['rc'] == 0 else 'FAIL'} "
            f"{r['wall_sec']}s  {len(d.get('statuses', {}))} queries"
        )
    n_ok = sum(1 for s in statuses.values() if s == "MATCH")
    n_rows_only = sum(1 for s in statuses.values() if s == "rows-only")
    print(
        f"\nmerged: {n_ok} oracle-matched, {n_rows_only} rows-only, "
        f"{len(failures)} failed"
    )
    if big_statuses:
        n_big_ok = sum(1 for s in big_statuses.values() if s == "MATCH")
        print(f"sf0.1 volume: {n_big_ok}/{len(big_statuses)} MATCH")
    if sf1_statuses:
        n1 = sum(1 for s in sf1_statuses.values() if s == "MATCH")
        print(f"sf1 volume: {n1}/{len(sf1_statuses)} MATCH")
    walls = sorted(r["wall_sec"] for r in results)
    spread = round(walls[-1] / walls[len(walls) // 2], 2) if walls[0] > 0 else 0
    print(
        f"driver_sim sharded x{workers}: {total}s  "
        f"shard walls {walls} (max/median {spread})  "
        f"ok={ok and not failures}"
    )

    all_green = ok and not failures and not big_failures
    if write_summary and statuses:
        if not complete:
            # partial-merge guard (ADVICE r10): never overwrite the
            # committed full-registry artifact from a run where a shard
            # died before reporting its slice
            print("SKIPPING CORRECTNESS_LOCAL.md write — a shard produced no JSON")
        else:
            import driver_sim as ds

            ds.write_summary_md(
                statuses, big_statuses, sf1_statuses, sf_dir, full_volume,
                len(big_failures), sf1_full,
            )
    if update_costs and complete and all_green and any(costs.values()):
        # refresh the measured cost table the LPT shard packing reads —
        # only from a COMPLETE green run, so a crashed/failed pass can't
        # poison the next run's packing
        import driver_sim as ds

        with open(ds.COSTS_PATH, "w") as fh:
            json.dump(costs, fh, indent=0, sort_keys=True)
            fh.write("\n")
        print(f"wrote {ds.COSTS_PATH} ({sum(len(v) for v in costs.values())} entries)")
    sys.exit(0 if all_green else 1)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
