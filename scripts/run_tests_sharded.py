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
taught each rule).  Standalone-process measurements (seconds, clean):
plans ~235 (after the round-10 fix below), streaming 202, properties
178, parity halves 213/183, llm 124, operators 101, wave4x 62,
catalog 55, wave7x 51, sparkify 49, wave6x 37, pipeline 35,
writer_retry 27, wave63 24 — packed to 404/392/381/404 unit targets
(max/median 1.02); the only split module is the oracle-parity sweep
(SPARK_GRAFT_PARITY_SHARD, hook in tests/test_oracle_parity.py).

test_plans.py looked like a 531 s whale until per-TEST measurement
(scripts/balance_file_shard.py --measure) showed 43% of it was ONE
test rebuilding all 411 plans to re-check an invariant the per-query
snapshot sweep already asserts; that test is now a pure JSON check and
the module is ordinary-sized.  For the next whale, the generic
splitter remains: SPARK_GRAFT_FILE_SHARD="i/n" (+ _MODULES scoping,
+ _SALT for measured-cost balancing via balance_file_shard.py
--search) hash-shards a module's items across workers — pinned by
tests/test_catalog.py::test_file_shard_hook_partitions_collection.
Hash-by-nodeid, not collection index: item cost correlates with
collection order (measured 320/107 s index-alternating halves).

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
            "tests/test_scratch.py",
            "tests/test_sf1_tier.py",
        ],
        {},
    ),
    (
        "parity-a",
        [
            "tests/test_oracle_parity.py",
            "tests/test_llm_ops.py",
            "tests/test_catalog.py",
        ],
        {"SPARK_GRAFT_PARITY_SHARD": "0/2"},
    ),
    (
        "parity-b",
        [
            "tests/test_oracle_parity.py",
            "tests/test_operators.py",
            "tests/test_wave4x_ops.py",
            "tests/test_pipeline_ops.py",
        ],
        {"SPARK_GRAFT_PARITY_SHARD": "1/2"},
    ),
    (
        "plans-io",
        [
            "tests/test_plans.py",
            "tests/test_wave7x_ops.py",
            "tests/test_sparkify.py",
            "tests/test_wave6x_ops.py",
            "tests/test_writer_retry.py",
        ],
        {},
    ),
]


def _slowest_files(junit_path: str, top: int = 3) -> list[list]:
    """Per-FILE total test seconds from a shard's junit XML, top-N —
    straggler telemetry (round 11, VERDICT r10 #6 stretch): the round-10
    whale hunt needed a manual --durations pass to find that 43% of one
    worker was a single test file; this keeps the next whale visible in
    every committed SUITE_TIME.jsonl line."""
    import xml.etree.ElementTree as ET

    try:
        root = ET.parse(junit_path).getroot()
    except (OSError, ET.ParseError):
        return []
    per_file: dict[str, float] = {}
    for case in root.iter("testcase"):
        cls = case.get("classname") or ""
        mod = ".".join(cls.split(".")[:2])  # tests.test_x[.NestedClass]
        try:
            per_file[mod] = per_file.get(mod, 0.0) + float(case.get("time") or 0)
        except ValueError:
            pass
    ranked = sorted(per_file.items(), key=lambda kv: -kv[1])[:top]
    return [[m, round(t, 1)] for m, t in ranked]


def run_shard(name: str, targets: list[str], extra_env: dict[str, str]) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_SHARD_CPUS", "8"),
        **extra_env,
    }
    junit = f"/tmp/shard-{name}-junit.xml"
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
            f"--junitxml={junit}",
            "-o",
            "junit_family=xunit2",
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
        "slowest_files": _slowest_files(junit),
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
                            {
                                k: r[k]
                                for k in (
                                    "name",
                                    "rc",
                                    "wall_sec",
                                    "summary",
                                    "slowest_files",
                                )
                            }
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
