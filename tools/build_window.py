"""Construct the next round's 50-row driver window from the evidence
ledger — the mechanical companion to tests/test_registry.py.

Usage: python tools/build_window.py [touched_query ...]

Reads CORRECTNESS_r*.json (the committed ledger), the registry order
and REGISTERED_ROUND, then emits the recommended ``_DRIVER_WINDOW``
literal for the NEXT round, built as:

1. never-green queries with NO local-ledger evidence (these cannot
   ride either safety net, so they must all fit);
2. queries whose code was touched this round (command-line args);
3. never-DRIVER-green queries that ARE green in the newest committed
   local ledger, in registration order — a first-ever driver row is
   worth more than refreshing an untouched long-green query, so these
   come BEFORE stale greens (tests/test_registry.py states the same
   priority);
4. remaining slots filled by stale greens, OLDEST last-green first —
   ties broken by registry order (red rows from the latest round sort
   first automatically: their last green is older);
5. overflow check: every once-driver-green query left out must have
   been green in the latest round or the round before (the three-round
   cap), and the leftover count must fit ``len(QUERIES) - 100`` —
   except queries green in the newest committed local ledger, whose
   tier-2 coverage substitutes for driver freshness (stale or
   never-evaluated alike; see test_registry.py for the rationale).

Exits non-zero with a diagnosis when the window is infeasible (more
never-greens + touched than 50 slots).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def local_ledger(repo: str = _REPO) -> tuple[set, int]:
    """(green queries, round number) of the NEWEST committed local
    evidence ledger (``CORRECTNESS_LOCAL_r*.json``, highest round
    wins); (set(), 0) when none exists.

    Shared by this tool and tests/test_registry.py so a new round's
    ledger is picked up by both without hand-editing filenames.  The
    round number matters: tier-2 coverage only counts while the
    ledger is at least as fresh as the newest DRIVER round — a stale
    ledger must be regenerated (tools/check_oracle.py --ledger), or
    the staleness invariants revert to the strict driver-only form."""
    paths = sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_LOCAL_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
    )
    if not paths:
        return set(), 0
    rnd = int(re.search(r"_r(\d+)\.json$", paths[-1]).group(1))
    with open(paths[-1]) as fh:
        d = json.load(fh)
    return {q for q, rec in d.items()
            if rec.get("rows_match") and rec.get("schema_match")
            and rec.get("hash_match") and not rec.get("err")}, rnd


def local_green(repo: str = _REPO) -> set:
    """Green set of the newest local ledger (see ``local_ledger``)."""
    return local_ledger(repo)[0]


def last_green() -> tuple[dict, int]:
    last: dict = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as fh:
            for q, rec in json.load(fh).items():
                if (rec.get("rows_match") and rec.get("schema_match")
                        and rec.get("hash_match") and not rec.get("err")):
                    last[q] = max(last.get(q, 0), rnd)
    return last, latest


def main() -> int:
    touched = set(sys.argv[1:])
    from xutil_spark.entry_queries import QUERIES

    last, latest = last_green()
    names = list(QUERIES)
    unknown = touched - set(names)
    if unknown:
        print(f"unknown touched queries: {sorted(unknown)}", file=sys.stderr)
        return 2

    # two-tier policy (tests/test_registry.py): never-DRIVER-green
    # queries with a green row in the newest committed LOCAL ledger
    # may wait outside the window; those without any evidence must fit
    local = local_green()
    never = [q for q in names if last.get(q, 0) == 0]
    never_bare = [q for q in never if q not in local]
    window: list = []

    def take(qs):
        for q in qs:
            if q not in window and len(window) < WINDOW:
                window.append(q)

    take(never_bare)
    if len(never_bare) > WINDOW:
        print(f"INFEASIBLE: {len(never_bare)} never-green queries with "
              f"no local-ledger evidence exceed the {WINDOW}-row window; "
              "run tools/check_oracle.py --ledger over them first.",
              file=sys.stderr)
        return 1
    take(sorted(touched, key=names.index))
    # never-driver-evaluated but locally-green: registration order
    take([q for q in never if q in local])
    # stale greens, oldest evidence first, registry order on ties
    stale = [q for q in names
             if q not in window and last.get(q, 0) < latest]
    stale.sort(key=lambda q: (last.get(q, 0), names.index(q)))
    take(stale)
    # latest-green fill if slots remain (keeps headline queries fresh)
    fresh = [q for q in names if q not in window]
    take(fresh)

    # locally-green queries are tier-2 covered (stale or never-
    # evaluated alike) — the hard overflow invariants apply only to
    # stale once-driver-green queries WITHOUT a local-ledger row
    out = [q for q in names
           if q not in window and 0 < last.get(q, 0) < latest
           and q not in local]
    budget = max(0, len(names) - 2 * WINDOW)
    too_stale = [q for q in out if last.get(q, 0) < latest - 1]
    waiting = [q for q in names
               if q not in window and last.get(q, 0) == 0]
    print(f"# next-round window ({len(window)} rows); ledger latest=r"
          f"{latest:02d}; {len(out)} stale-green no-local-row overflow "
          f"(budget {budget}); too-stale overflow: {too_stale or 'none'}; "
          f"{len(waiting)} locally-green queries waiting for a slot")
    if len(out) > budget or too_stale:
        print("# WARNING: overflow violates the registry invariants — "
              "trim additions or accept staleness", file=sys.stderr)
    print("_DRIVER_WINDOW = [")
    for i in range(0, len(window), 3):
        print("    " + ", ".join(repr(q) for q in window[i:i + 3]) + ",")
    print("]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
