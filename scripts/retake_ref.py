"""Validated BENCH_REF.json swap (round 9, VERDICT r8 #2).

SCALE.md's refresh policy: the committed reference (probe 0.1266 — the
slow edge of this host's 0.05-0.15 idle band) is mildly lenient and
should be retaken when a uniform window with probe ≤ 0.08 shows up.
bench.py now prints `reference_retake_available` when such a window
occurs; THIS script performs the swap, because a bench run must never
silently move its own goalposts.

Validation before writing anything:
  * the candidate sweep (BENCH_HEADLINE.json by default) is a frozen-42
    record at the reference's scale factor;
  * its calibration window was uniform (start/end ratio ≤ 2.0) with
    mean ≤ REF_RETAKE_PROBE (0.08) — strictly tighter than the 0.15
    commit ceiling — and faster than the committed reference's probe;
  * it carries raw AND normalized times for every frozen-42 query (the
    dual-view rule needs both).

On success: BENCH_REF.json is rewritten with a provenance field naming
both windows, and one `ref_swap` line is appended to
bench_history.jsonl recomputing each prior uniform frozen-42 entry's
worst drift against the NEW reference — so the committed series stays
interpretable across the swap without rewriting history lines.

Usage: python scripts/retake_ref.py [candidate.json] [--dry-run]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fail(msg: str) -> None:
    print(f"retake_ref: REFUSED — {msg}", file=sys.stderr)
    sys.exit(1)


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--dry-run"]
    dry = "--dry-run" in sys.argv
    cand_path = argv[0] if argv else os.path.join(REPO, "BENCH_HEADLINE.json")
    try:
        with open(cand_path) as f:
            cand = json.load(f)
    except (OSError, ValueError) as ex:
        fail(f"cannot read candidate sweep {cand_path}: {ex}")
    with open(os.path.join(REPO, bench.REF_NAME)) as f:
        old = json.load(f)

    if cand.get("headline_set") != "frozen42":
        fail(f"candidate headline_set={cand.get('headline_set')!r}, need frozen42")
    if cand.get("sf") != old.get("sf"):
        fail(f"candidate sf={cand.get('sf')} != reference sf={old.get('sf')}")
    cal = cand.get("calibration", {})
    s, e, mean = cal.get("start_sec"), cal.get("end_sec"), cal.get("mean_sec")
    if not all(isinstance(v, (int, float)) and v > 0 for v in (s, e, mean)):
        fail(f"candidate calibration incomplete: {cal}")
    if max(s, e) / min(s, e) > bench.CAL_UNIFORM_MAX_RATIO:
        fail(f"candidate probe window non-uniform: start {s}s / end {e}s")
    if mean > bench.REF_RETAKE_PROBE:
        fail(
            f"candidate probe mean {mean}s > retake bar "
            f"{bench.REF_RETAKE_PROBE}s — not the clean window the policy "
            "is waiting for"
        )
    old_mean = old.get("calibration", {}).get("mean_sec")
    if old_mean is not None and mean >= old_mean:
        fail(f"candidate probe {mean}s is not faster than reference {old_mean}s")
    raw, norm = cand.get("queries", {}), cand.get("queries_normalized", {})
    missing = [n for n in bench.HEADLINE if n not in raw or n not in norm]
    if missing:
        fail(f"candidate lacks raw+normalized times for {missing}")

    new_ref = {
        "metric": "bench_reference_normalized",
        "provenance": (
            f"frozen-42 sweep {time.strftime('%Y-%m-%d %H:%M')} (round 9 "
            f"retake per SCALE.md policy): uniform codegen window start "
            f"{s}s / end {e}s (ratio {max(s, e) / min(s, e):.2f} <= "
            f"{bench.CAL_UNIFORM_MAX_RATIO}), mean {mean}s <= retake bar "
            f"{bench.REF_RETAKE_PROBE}s; replaces the {old_mean}s-probe "
            f"reference (slow edge of the idle band — its leniency window "
            f"could hide up to ~{old_mean / mean:.2f}x of real drift). "
            "Swap performed by scripts/retake_ref.py after full "
            "validation; prior-entry drift recomputed in the ref_swap "
            "line of bench_history.jsonl. Refresh policy unchanged: only "
            "overwrite from a uniform window within the ceiling, tighter "
            "probes only, and record the swap in SCALE.md."
        ),
        "sf": cand.get("sf"),
        "headline_set": "frozen42",
        "calibration": cal,
        "queries_raw": {n: raw[n] for n in bench.HEADLINE},
        "queries_normalized": {n: norm[n] for n in bench.HEADLINE},
    }

    # Recompute every prior uniform frozen-42 entry's drift against the
    # NEW reference (history lines themselves are immutable).
    recomputed: dict[str, dict] = {}
    hist_path = os.path.join(REPO, bench.HISTORY_NAME)
    try:
        with open(hist_path) as f:
            entries = [json.loads(ln) for ln in f if ln.strip()]
    except (OSError, ValueError):
        entries = []
    for ent in entries:
        if not (
            ent.get("set") == "frozen42"
            and ent.get("sf") == cand.get("sf")
            and ent.get("calibration_uniform")
        ):
            continue
        drifts = {}
        for n, v in (ent.get("queries_normalized") or {}).items():
            rv = new_ref["queries_normalized"].get(n)
            if rv:
                drifts[n] = round(v / rv, 2)
        if drifts:
            worst = max(drifts, key=drifts.get)
            recomputed[str(ent.get("ts"))] = {
                "max_drift": drifts[worst],
                "max_drift_query": worst,
                "n_over_bar": sum(
                    1 for d in drifts.values() if d > bench.REGRESSION_FLAG_RATIO
                ),
            }

    if dry:
        print(json.dumps({"metric": "ref_swap_dry_run", "would_write": True,
                          "new_probe": mean, "old_probe": old_mean,
                          "recomputed_entries": len(recomputed)}))
        return
    with open(os.path.join(REPO, bench.REF_NAME), "w") as f:
        json.dump(new_ref, f, indent=1)
        f.write("\n")
    with open(hist_path, "a") as f:
        f.write(
            json.dumps(
                {
                    "ts": int(time.time()),
                    "ref_swap": True,
                    "set": "frozen42",
                    "sf": cand.get("sf"),
                    "new_probe_mean": mean,
                    "old_probe_mean": old_mean,
                    "drift_recomputed_vs_new_ref": recomputed,
                }
            )
            + "\n"
        )
    print(
        json.dumps(
            {
                "metric": "ref_swap",
                "new_probe": mean,
                "old_probe": old_mean,
                "recomputed_entries": len(recomputed),
            }
        )
    )


if __name__ == "__main__":
    main()
