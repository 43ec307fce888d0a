"""Compute the next round's certification-window ordering.

The correctness driver checks the FIRST ``BUDGET`` entries of
``build_queries()`` in dict order (observed: exactly 50 in rounds 1-2).
This tool reads every ``CORRECTNESS_r*.json`` in the repo root and emits
the rotation the registry comment promises (queries.py, "ROUND-4
ROTATION PLAN"):

  1. queries whose LATEST driver verdict is a FAIL (fix + re-certify);
  2. never-driver-certified queries (including any the window deferred);
  3. the always-in-window headline certifier (``maint_scan``);
  4. backfill with the longest-unverified green queries (oldest green
     round first) — continuous re-certification of the proven surface;
  5. everything else in current registry order, past the cutoff.

Output: a summary to stderr and a ready-to-paste Python list literal for
``_CERTIFICATION_PRIORITY`` to stdout. Pure registry computation — no
SparkSession, no jobs.

Usage::

    python tools/rotate_window.py            # propose next-round ordering
    python tools/rotate_window.py --check    # exit 1 if the CURRENT order
                                             # wastes window slots
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET = 50
ALWAYS_IN_WINDOW = ["maint_scan"]


def load_verdicts() -> tuple[dict[str, int], dict[str, int]]:
    """Return (last_green_round, last_fail_round) per query name."""
    green: dict[str, int] = {}
    fail: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        for name, row in json.load(open(path)).items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if ok:
                green[name] = max(green.get(name, 0), rnd)
            else:
                fail[name] = max(fail.get(name, 0), rnd)
    return green, fail


def registry_order() -> list[str]:
    sys.path.insert(0, REPO)
    from lakehouse_benchmark_ingestion_spark.queries import build_queries

    return list(build_queries())


def propose(names: list[str], green: dict[str, int], fail: dict[str, int]) -> list[str]:
    latest_fail = [
        n for n in names
        if n in fail and fail[n] >= green.get(n, -1)  # fail not yet re-greened
    ]
    never = [n for n in names if n not in green and n not in latest_fail]
    placed = set(latest_fail) | set(never)
    pinned = [n for n in ALWAYS_IN_WINDOW if n in names and n not in placed]
    placed.update(pinned)
    # oldest-green first: the longer a query has gone unverified, the
    # sooner it rotates back in
    backfill = sorted(
        (n for n in names if n not in placed),
        key=lambda n: (green.get(n, 0), names.index(n)),
    )
    return latest_fail + never + pinned + backfill


def main() -> int:
    green, fail = load_verdicts()
    names = registry_order()
    order = propose(names, green, fail)
    window, tail = order[:BUDGET], order[BUDGET:]

    wasted = [
        n for n in names[:BUDGET]
        if n in green and green[n] >= fail.get(n, -1) and n not in ALWAYS_IN_WINDOW
    ]
    uncovered = [
        n for n in names[BUDGET:]
        if n not in green or fail.get(n, -1) > green.get(n, -1)
    ]
    print(
        f"registry: {len(names)} queries | driver budget: {BUDGET}\n"
        f"ever-green: {sum(1 for n in names if n in green)} | "
        f"latest-verdict-fail: "
        f"{sum(1 for n in names if fail.get(n, -1) > green.get(n, -1))}\n"
        f"current window: {len(wasted)} slots on already-green "
        f"(beyond pinned {ALWAYS_IN_WINDOW}): {wasted}\n"
        f"current tail: {len(uncovered)} not-yet-green past the cutoff: "
        f"{uncovered}",
        file=sys.stderr,
    )
    if "--check" in sys.argv:
        # window is optimal when no already-green query (beyond the pin)
        # occupies a slot while a not-yet-green query sits past the cutoff
        bad = bool(wasted) and bool(uncovered)
        print("window OK" if not bad else "window WASTES SLOTS", file=sys.stderr)
        return 1 if bad else 0

    print("_CERTIFICATION_PRIORITY = [")
    for n in window:
        mark = (
            " # FAIL r%d" % fail[n]
            if fail.get(n, -1) > green.get(n, -1)
            else (" # never certified" if n not in green else "")
        )
        print(f'    "{n}",{mark}')
    print("    # ---- past the driver cutoff ----")
    for n in tail:
        print(f'    "{n}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
