"""Witness audit: derive, from the repo's own artifacts, which
oracle-backed suite queries have a driver-green CORRECTNESS row in SOME
round (the judge's "never_witnessed == ∅" check, VERDICT r5 item 1),
and HOW STALE each witness is (VERDICT r6 item 9 — the rotation input).

Usage:
    python tools/witness_audit.py            # coverage + age report
    python tools/witness_audit.py --rotation N K
        # print the K stalest oracle-backed queries assuming the
        # CURRENT gate window will be witnessed in round N — i.e. the
        # machine-generated fill for round N+1's window.

Exit 0 when every oracle-backed query is either driver-witnessed or in
the CURRENT gate window (i.e. will be witnessed when this round's
CORRECTNESS lands); exit 1 otherwise, listing the orphans.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def green_rows(path: str) -> set[str]:
    with open(path) as f:
        d = json.load(f)
    return {
        name
        for name, row in d.items()
        if isinstance(row, dict)
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") is not False  # rows-only rounds lack hashes
        and not row.get("err")
    }


def round_num(path: str) -> int:
    base = os.path.basename(path)  # CORRECTNESS_r06.json
    return int(base.split("_r")[1].split(".")[0])


def last_witness(repo: str) -> dict[str, int]:
    """query name -> highest round with a driver-green row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        n = round_num(path)
        for name in green_rows(path):
            latest[name] = max(latest.get(name, 0), n)
    return latest


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from automated_data_pipeline_spark.suite import GATE_WINDOW, all_specs

    latest = last_witness(repo)
    witnessed = set(latest)
    per_round: dict[str, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        per_round[os.path.basename(path)] = green_rows(path)
    current_round = max(
        (round_num(p) for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))),
        default=0,
    )

    oracle_backed = {s.name for s in all_specs() if s.oracle is not None}
    rows_only = {s.name for s in all_specs() if s.oracle is None}
    never = oracle_backed - witnessed
    pending = never & set(GATE_WINDOW)
    orphans = never - set(GATE_WINDOW)

    if len(sys.argv) >= 2 and sys.argv[1] == "--rotation":
        # Assume the CURRENT window lands green in round `assume_round`
        # (so its members' age resets), then emit the K stalest names.
        assume_round = int(sys.argv[2]) if len(sys.argv) > 2 else current_round + 1
        k = int(sys.argv[3]) if len(sys.argv) > 3 else 50
        eff = dict(latest)
        for n in GATE_WINDOW:
            eff[n] = assume_round
        ranked = sorted(
            oracle_backed, key=lambda n: (eff.get(n, 0), n)
        )
        for n in ranked[:k]:
            print(f"{eff.get(n, 0):>2}  {n}")
        return

    for rnd, rows in per_round.items():
        print(f"{rnd}: {len(rows)} green rows")
    print(f"\noracle-backed queries: {len(oracle_backed)}  "
          f"(rows-only: {len(rows_only)}: {sorted(rows_only)})")
    print(f"driver-witnessed (union over rounds): {len(oracle_backed & witnessed)}")
    print(f"in current gate window awaiting this round's artifact: "
          f"{len(pending)}\n  {sorted(pending)}")

    # Witness-age report (VERDICT r6 item 9): per-query last-green
    # round; flag anything whose witness is >3 rounds old and not
    # already queued in the current window.
    ages: dict[int, list[str]] = {}
    for n in sorted(oracle_backed & witnessed):
        ages.setdefault(latest[n], []).append(n)
    print(f"\nwitness age (current round = r{current_round}):")
    for rnd in sorted(ages):
        print(f"  last green r{rnd}: {len(ages[rnd])} queries")
    stale = [
        n for n in sorted(oracle_backed & witnessed)
        if current_round - latest[n] > 3 and n not in GATE_WINDOW
    ]
    if stale:
        print(f"\nSTALE (age >3 rounds, not in window) ({len(stale)}):")
        for n in stale:
            print(f"  r{latest[n]}  {n}")

    from automated_data_pipeline_spark.suite import AWAITING_FIRST_WITNESS

    awaiting = sorted(set(orphans) & set(AWAITING_FIRST_WITNESS))
    orphans = sorted(set(orphans) - set(AWAITING_FIRST_WITNESS))
    if awaiting:
        print(
            f"\nADDED after the latest artifact, awaiting first witness "
            f"({len(awaiting)}; strict-checked by check_oracles, head the "
            f"next rotation):"
        )
        for n in awaiting:
            print(f"  {n}")
    if orphans:
        print(f"\nNEVER-WITNESSED and NOT in the gate window ({len(orphans)}):")
        for n in orphans:
            print(f"  {n}")
        sys.exit(1)
    print("\nok: every oracle-backed query is witnessed, gated, or newly added")


if __name__ == "__main__":
    main()
