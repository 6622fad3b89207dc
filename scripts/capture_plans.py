"""Capture .explain("formatted") for named registry queries to files.

Usage: python scripts/capture_plans.py <outdir> [--suffix _before] [names...]

With no names, captures the frozen-42 bench headline set.  One Spark
session, one file per query: <outdir>/<name><suffix>.txt.  Used for the
optimization-round evidence trail (plans/r11/<query>_before.txt /
_after.txt) — the judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from udacity_datalake_spark_spark import scratch
from udacity_datalake_spark_spark.plans import QUERIES
from udacity_datalake_spark_spark.session import get_session


def main() -> None:
    args = sys.argv[1:]
    if not args:
        print("usage: capture_plans.py <outdir> [--suffix _before] [names...]", file=sys.stderr)
        sys.exit(2)
    outdir = args[0]
    rest = args[1:]
    suffix = ""
    if rest and rest[0] == "--suffix":
        suffix = rest[1]
        rest = rest[2:]
    names = rest
    if not names:
        from bench import HEADLINE

        names = HEADLINE
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown: {unknown}", file=sys.stderr)
        sys.exit(2)
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="udacity-datalake-spark-capture-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        scratch.release()
        print(f"wrote {name}{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
