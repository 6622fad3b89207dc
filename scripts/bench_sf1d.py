"""Dim-grown sf1 tier (round-8 VERDICT #2): measure the DIM-BOUND
headliners at .localdata/sf1d, where the customer/supplier/part key
space grows 10x alongside the facts (scripts/make_sf1.py --grow-dims).

The fact-only sf1 tier proved every corpus/fact term, but left the
queries whose true scaling variable is the DIMENSION key space reading
slope ~= 1 by fixture construction (SCALE.md r7 notes this honestly):
q07 (customer x supplier OR-join), q212/q217/q319 (co-supply graph on
part/supplier keys), q373 (brand itemset universe), q222 (part
classification).  sf1d grows exactly that axis: 10 disjoint isomorphic
replicas of the relational universe, so the expected cost model is
LINEAR (each replica reproduces sf0.1's structure on fresh keys; wedge
joins, prefix sums, and itemset lattices each do 10x the sf0.1 work
with zero cross-replica interaction).

Built-in correctness invariant: isomorphic-replica construction makes
q212's (n_nodes, n_edges, n_triangles) at sf1d EXACTLY 10x the sf0.1
values — the scale-adaptive edge threshold (1.1x mean shared parts) is
distribution-invariant across identical replicas.  The run asserts
this before recording timings; a violation means the fixture (or the
edge rule's scale adaptivity) is broken and the slopes would be
measuring the wrong graph.

Output: BENCH_SF1D.json at the repo root; flag bar identical to the
other tiers (slope >= 20 on 10x data).

Usage: python scripts/bench_sf1d.py   (a few minutes; idle host only)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench
from udacity_datalake_spark_spark.plans import QUERIES
from udacity_datalake_spark_spark.session import get_session

SF01_DIR = "/root/testdata/sf0.1"
SF1D_DIR = os.environ.get("SPARK_GRAFT_SF1D_DIR", "/root/repo/.localdata/sf1d")
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))

# The queries whose sf1 slope ~=1 was fixture semantics (SCALE.md
# r7 "slopes ~1 are fixture semantics" list + VERDICT r7 item #2).
DIM_BOUND = [
    "q07_or_join_decomposed",
    "q212_triangle_count",
    "q217_clustering_coefficient",
    "q222_abc_xyz_classification",
    "q319_link_prediction",
    "q373_apriori_triples",
]


def time_query(spark, name: str, sf_dir: str, repeats: int) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return round(best, 4)


def main() -> None:
    if not os.path.isdir(SF1D_DIR):
        sys.exit(
            f"sf1d fixture missing at {SF1D_DIR} — "
            "run scripts/make_sf1.py --grow-dims first"
        )
    spark = get_session(app_name="udacity-datalake-spark-bench-sf1d")

    # isomorphism invariant before any timing
    g01 = QUERIES["q212_triangle_count"](spark, SF01_DIR).collect()[0]
    spark.catalog.clearCache()
    g1d = QUERIES["q212_triangle_count"](spark, SF1D_DIR).collect()[0]
    spark.catalog.clearCache()
    iso = {
        "sf01": {k: int(g01[k]) for k in ("n_nodes", "n_edges", "n_triangles")},
        "sf1d": {k: int(g1d[k]) for k in ("n_nodes", "n_edges", "n_triangles")},
    }
    for k in ("n_nodes", "n_edges", "n_triangles"):
        if int(g1d[k]) != 10 * int(g01[k]):
            sys.exit(
                f"isomorphism invariant violated: {k} sf1d={int(g1d[k])} "
                f"!= 10 * sf0.1={int(g01[k])} — fixture or edge rule broken"
            )
    print(f"isomorphism invariant OK: {iso}")

    # warm-up at the smallest SF fills codegen/JIT with identical shapes
    for name in DIM_BOUND:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()

    cal_start = bench._calibration_probe(spark)
    t_sf01: dict[str, float] = {}
    t_sf1d: dict[str, float] = {}
    for name in DIM_BOUND:
        t_sf01[name] = time_query(spark, name, SF01_DIR, REPEATS)
        t_sf1d[name] = time_query(spark, name, SF1D_DIR, REPEATS)
        slope = round(t_sf1d[name] / t_sf01[name], 2) if t_sf01[name] > 0 else 0.0
        print(f"  {name}: sf0.1 {t_sf01[name]}s  sf1d {t_sf1d[name]}s  slope {slope}")
        sys.stdout.flush()
    cal_end = bench._calibration_probe(spark)

    slopes = {
        n: (round(t_sf1d[n] / t_sf01[n], 2) if t_sf01[n] > 0 else 0.0) for n in t_sf1d
    }
    flagged = [n for n, s in slopes.items() if s >= 20.0]
    record = {
        "metric": "sf1d_dim_grown_tier",
        "sf_base": 0.1,
        "tier": "sf1d (facts x10 AND dims x10, 10 isomorphic replicas)",
        "n_queries": len(t_sf1d),
        "repeats": REPEATS,
        "isomorphism_invariant_q212": iso,
        "total_sf1d_sec": round(sum(t_sf1d.values()), 4),
        "total_sf01_sec": round(sum(t_sf01.values()), 4),
        "calibration": {
            "probe": "range(1e7) sum codegen, min of 3",
            "start_sec": cal_start,
            "end_sec": cal_end,
        },
        "queries_sf01": t_sf01,
        "queries_sf1d": t_sf1d,
        "slopes": slopes,
        "flagged_ge20x": flagged,
    }
    with open("/root/repo/BENCH_SF1D.json", "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(
        json.dumps(
            {
                "metric": "sf1d_tier_total",
                "value": record["total_sf1d_sec"],
                "unit": "sec",
                "n_queries": len(t_sf1d),
                "flagged_ge20x": flagged,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
