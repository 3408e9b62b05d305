"""Per-round sf1 scale-validation regression diff (VERDICT r6 item 5):
the ×10 sweep now runs every round (SCALE_VALIDATION_r{N}.json); this
prints the round-over-round comparison so a scale regression surfaces
the round it lands, not at the next audit.

Usage: python tools/scale_diff.py [prev.json] [cur.json] [threshold]
Defaults: SCALE_VALIDATION.json SCALE_VALIDATION_r07.json 1.5

Markdown table of workloads whose current spark_sec exceeds
threshold × previous (plus absolute floor 0.5 s — sub-second swings
are Spark job-floor noise), with duck ratios where both rounds timed
the oracle, added/removed workloads, and the skew-demo /
autoswitch decisions. Exit 0 always: evidence generation, not a gate.
"""

from __future__ import annotations

import json
import os
import sys


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "SCALE_VALIDATION.json")
    cur_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "SCALE_VALIDATION_r07.json")
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    with open(prev_path) as f:
        prev = json.load(f)
    with open(cur_path) as f:
        cur = json.load(f)
    pw, cw = prev["workloads"], cur["workloads"]
    common = sorted(
        n for n in set(pw) & set(cw)
        if "spark_sec" in pw[n] and "spark_sec" in cw[n]
    )

    print(f"prev: {os.path.basename(prev_path)} ({prev['sf_dir']}, {len(pw)} workloads)")
    print(f"cur:  {os.path.basename(cur_path)} ({cur['sf_dir']}, {len(cw)} workloads)")
    print(f"added: {sorted(set(cw) - set(pw))}; removed: {sorted(set(pw) - set(cw))}\n")

    print("| workload | prev s | cur s | x | prev ratio | cur ratio |")
    print("|---|---|---|---|---|---|")
    flagged = 0
    for n in common:
        p, c = pw[n]["spark_sec"], cw[n]["spark_sec"]
        x = round(c / max(p, 1e-9), 2)
        flag = c > threshold * p and c - p > 0.5
        flagged += flag
        mark = " **REGRESSED**" if flag else ""
        print(f"| {n}{mark} | {p} | {c} | {x} | "
              f"{pw[n].get('ratio_vs_duck', '-')} | {cw[n].get('ratio_vs_duck', '-')} |")
    print(f"\nregressions over {threshold}x (+0.5s floor): {flagged}")
    for key in ("skew_demo", "autoswitch"):
        if cur.get(key):
            print(f"\n{key}: {json.dumps(cur[key])}")


if __name__ == "__main__":
    main()
