"""Pick the SPARK_GRAFT_FILE_SHARD_SALT that balances a module's hash
shards by MEASURED cost (round 10, VERDICT r9 #1 follow-through).

Why a salt: the conftest file shard assigns items by
crc32(salt + nodeid) % n.  Hash halves are count-even but can be
cost-lopsided when a few parametrized cases dominate (test_plans'
unsalted halves measured 240 s vs 145 s at 260/255 tests).  Given a
per-test cost table, the salt is one committed string that re-deals
the same deterministic hash into cost-balanced shards — no cost table
is needed at RUN time, and the assignment stays stable until the salt
is deliberately re-tuned.

Usage:
  python scripts/balance_file_shard.py --measure tests/test_plans.py
      # runs pytest --durations=0 (serial, one process) and writes the
      # per-test cost table to /tmp/file_shard_costs.json
  python scripts/balance_file_shard.py --search [n_shards]
      # reads the table, tries salts 0..499, prints the best few

The chosen salt goes into the shard's env in run_tests_sharded.SHARDS.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COSTS = "/tmp/file_shard_costs.json"

# pytest --durations=0 lines: "  1.23s call     tests/test_plans.py::test_x[q1]"
DUR_RE = re.compile(r"^\s*([0-9.]+)s\s+(call|setup|teardown)\s+(\S+)")


def measure(target: str) -> None:
    env = {**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "8")}
    env.pop("SPARK_GRAFT_FILE_SHARD", None)
    env.pop("SPARK_GRAFT_FILE_SHARD_MODULES", None)
    proc = subprocess.run(
        [
            sys.executable, "-m", "pytest", target, "-q",
            "--durations=0", "--durations-min=0.0",
            "-p", "no:cacheprovider", "--basetemp=/tmp/balance-measure",
        ],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    costs: dict[str, float] = {}
    for line in proc.stdout.splitlines():
        m = DUR_RE.match(line)
        if m:
            sec, _, nodeid = float(m.group(1)), m.group(2), m.group(3)
            costs[nodeid] = costs.get(nodeid, 0.0) + sec
    if proc.returncode != 0 or not costs:
        print(proc.stdout[-3000:])
        sys.exit(f"measure failed (rc={proc.returncode}, {len(costs)} rows)")
    with open(COSTS, "w") as f:
        json.dump({"target": target, "costs": costs}, f)
    print(
        f"measured {len(costs)} tests, total {sum(costs.values()):.1f}s "
        f"-> {COSTS}"
    )


def search(n: int) -> None:
    with open(COSTS) as f:
        data = json.load(f)
    costs: dict[str, float] = data["costs"]
    total = sum(costs.values())
    results = []
    for salt_i in range(500):
        salt = "" if salt_i == 0 else str(salt_i)
        sums = [0.0] * n
        for nodeid, c in costs.items():
            sums[zlib.crc32((salt + nodeid).encode()) % n] += c
        results.append((max(sums) - min(sums), salt, [round(s, 1) for s in sums]))
    results.sort()
    print(f"total {total:.1f}s over {len(costs)} tests, {n} shards:")
    for spread, salt, sums in results[:5]:
        print(f"  salt={salt!r:6} shards={sums} spread={spread:.1f}s")
    worst = results[-1]
    print(f"  (worst tried: salt={worst[1]!r} {worst[2]})")


def main() -> None:
    if "--measure" in sys.argv:
        measure(sys.argv[sys.argv.index("--measure") + 1])
    elif "--search" in sys.argv:
        idx = sys.argv.index("--search")
        n = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 2
        search(n)
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main()
