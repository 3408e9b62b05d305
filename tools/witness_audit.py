"""Witness audit: derive, from the repo's own artifacts, which
oracle-backed suite queries have a driver-green CORRECTNESS row in SOME
round (the judge's "never_witnessed == ∅" check, VERDICT r5 item 1).

Usage: python tools/witness_audit.py
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


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from automated_data_pipeline_spark.suite import GATE_WINDOW, all_specs

    witnessed: set[str] = set()
    per_round: dict[str, set[str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rows = green_rows(path)
        per_round[os.path.basename(path)] = rows
        witnessed |= rows

    oracle_backed = {s.name for s in all_specs() if s.oracle is not None}
    rows_only = {s.name for s in all_specs() if s.oracle is None}
    never = oracle_backed - witnessed
    pending = never & set(GATE_WINDOW)
    orphans = never - set(GATE_WINDOW)

    for rnd, rows in per_round.items():
        print(f"{rnd}: {len(rows)} green rows")
    print(f"\noracle-backed queries: {len(oracle_backed)}  "
          f"(rows-only: {len(rows_only)}: {sorted(rows_only)})")
    print(f"driver-witnessed (union over rounds): {len(oracle_backed & witnessed)}")
    print(f"in current gate window awaiting this round's artifact: "
          f"{len(pending)}\n  {sorted(pending)}")
    if orphans:
        print(f"\nNEVER-WITNESSED and NOT in the gate window ({len(orphans)}):")
        for n in sorted(orphans):
            print(f"  {n}")
        sys.exit(1)
    print("\nok: every oracle-backed query is witnessed or gated this round")


if __name__ == "__main__":
    main()
