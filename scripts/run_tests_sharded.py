"""Sharded test runner (round-8 VERDICT #4): the full suite in one
serial pytest session costs ~17-38 min (1080 Spark tests, throttle-
dependent) — the round loop's biggest fixed cost.  pytest-xdist is not
in the container, so this runner shards by PROCESS: N pytest
subprocesses, each with its OWN SparkSession (SPARK_GRAFT_CPUS=8 →
local[8] per worker on the 32-cpu host), run concurrently.

Shard safety audit (why concurrent pytest processes don't collide):
- the only catalog-writing test (test_plans bucketed-join) uses the
  in-memory session catalog with explicit paths — no shared Derby
  metastore, no spark-warehouse contention;
- each worker gets its own --basetemp, so tmp_path factories never race;
- Spark UI ports auto-increment from 4040 (spark.port.maxRetries
  default 16 covers 4 workers);
- the module-scoped persist-leak gate is per-process by construction.

Packing is by MEASURED per-unit cost (round 10, VERDICT r9 #1 —
SCALE.md round 10 records the data and the intermediate packs that
taught each rule).  Standalone-process measurements (seconds): plans
halves 240/145 (hash split, see below), streaming 202, properties 178,
parity thirds ~115 each, llm 124, operators 101, wave4x 62, catalog
55, wave7x 51, sparkify 49, wave6x 37, pipeline 35, writer_retry 27,
wave63 24.  Two whales are split across workers: the 411-query
oracle-parity sweep 3 ways via SPARK_GRAFT_PARITY_SHARD (hook in
tests/test_oracle_parity.py) and test_plans.py — whose 411-param
plan-budget sweep was the module behind the old operators worker's
2.9x straggle — 2 ways via SPARK_GRAFT_FILE_SHARD +
SPARK_GRAFT_FILE_SHARD_MODULES (conftest collection hook, scoped so
co-resident modules run whole; pinned by
tests/test_catalog.py::test_file_shard_hook_partitions_collection).

The file shard hashes nodeids instead of round-robin over the
collection index: per-item cost correlates with collection order
(measured: index-alternating test_plans halves ran 320 s vs 107 s —
the parametrized sweep interleaves expensive plan-builds at even
positions), and even hash halves stay cost-lopsided (240/145, equal
counts) because a few snapshot plans dominate — so the halves are
treated as UNITS WITH THEIR OWN MEASURED COST and packed with
complementary co-modules, rather than assumed equal.
Pack targets (standalone units; in-process session sharing runs each
worker ~0.8-0.9x of its unit sum): streaming 404, parity-plans-a 355,
parity-plans-b 419, parity-ops 442 — the h0 plans half carries ~60 s
of snapshot-cost overshoot in practice, so its worker is packed
lightest (measured walls: 322/410/396/385-class, max/median ~1.05).

Suite wall time is appended to SUITE_TIME.jsonl (committed) so
round-over-round creep is visible, per VERDICT r7 #4.

Usage: python scripts/run_tests_sharded.py          # full sharded suite
       python scripts/run_tests_sharded.py --list   # show the shard plan
Exit code: 0 iff every worker's pytest exited 0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (worker-name, pytest targets, extra env)
SHARDS: list[tuple[str, list[str], dict[str, str]]] = [
    (
        "streaming",
        [
            "tests/test_streaming.py",
            "tests/test_properties.py",
            "tests/test_wave63_ops.py",
        ],
        {},
    ),
    (
        "parity-plans-a",
        [
            "tests/test_oracle_parity.py",
            "tests/test_plans.py",
        ],
        {
            "SPARK_GRAFT_PARITY_SHARD": "0/3",
            "SPARK_GRAFT_FILE_SHARD": "0/2",
            "SPARK_GRAFT_FILE_SHARD_MODULES": "test_plans.py",
        },
    ),
    (
        "parity-plans-b",
        [
            "tests/test_oracle_parity.py",
            "tests/test_plans.py",
            "tests/test_llm_ops.py",
            "tests/test_pipeline_ops.py",
        ],
        {
            "SPARK_GRAFT_PARITY_SHARD": "1/3",
            "SPARK_GRAFT_FILE_SHARD": "1/2",
            "SPARK_GRAFT_FILE_SHARD_MODULES": "test_plans.py",
        },
    ),
    (
        "parity-ops",
        [
            "tests/test_oracle_parity.py",
            "tests/test_operators.py",
            "tests/test_catalog.py",
            "tests/test_wave4x_ops.py",
            "tests/test_wave7x_ops.py",
            "tests/test_sparkify.py",
            "tests/test_wave6x_ops.py",
            "tests/test_writer_retry.py",
        ],
        {"SPARK_GRAFT_PARITY_SHARD": "2/3"},
    ),
]


def run_shard(name: str, targets: list[str], extra_env: dict[str, str]) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_SHARD_CPUS", "8"),
        **extra_env,
    }
    t0 = time.perf_counter()
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            *targets,
            "-q",
            "-p",
            "no:cacheprovider",
            f"--basetemp=/tmp/shard-{name}",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
    )
    wall = round(time.perf_counter() - t0, 1)
    summary = ""
    for line in reversed(proc.stdout.splitlines()):
        if "passed" in line or "failed" in line or "error" in line:
            summary = line.strip()
            break
    return {
        "name": name,
        "rc": proc.returncode,
        "wall_sec": wall,
        "summary": summary,
        "stdout_tail": proc.stdout[-4000:] if proc.returncode != 0 else "",
        "stderr_tail": proc.stderr[-2000:] if proc.returncode != 0 else "",
    }


def main() -> None:
    if "--list" in sys.argv:
        for name, targets, env in SHARDS:
            print(f"{name}: {' '.join(targets)} {env}")
        return
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=len(SHARDS)) as ex:
        results = list(
            ex.map(lambda s: run_shard(s[0], s[1], s[2]), SHARDS)
        )
    total = round(time.perf_counter() - t0, 1)
    ok = True
    for r in results:
        status = "PASS" if r["rc"] == 0 else f"FAIL rc={r['rc']}"
        print(f"[{r['name']}] {status} {r['wall_sec']}s  {r['summary']}")
        if r["rc"] != 0:
            ok = False
            print(r["stdout_tail"])
            print(r["stderr_tail"], file=sys.stderr)
    print(f"suite wall (sharded x{len(SHARDS)}): {total}s  ok={ok}")
    try:
        with open(os.path.join(REPO, "SUITE_TIME.jsonl"), "a") as f:
            f.write(
                json.dumps(
                    {
                        "ts": int(time.time()),
                        "mode": f"sharded-{len(SHARDS)}",
                        "wall_sec": total,
                        "ok": ok,
                        "workers": [
                            {k: r[k] for k in ("name", "rc", "wall_sec", "summary")}
                            for r in results
                        ],
                    }
                )
                + "\n"
            )
    except OSError:
        pass
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
