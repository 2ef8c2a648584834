"""Cap-rotation planner: computes the next round's 50-slot
adjudication cap mechanically (VERDICT r7 #8 — the staleness rule
lives in tooling, not memory).

The driver adjudicates only the FIRST 50 registry entries, so the cap
is evidence budget. This script emits, from the committed CORRECTNESS
files and the git history:

1. the staleness histogram (latest green round → query count);
2. the OBLIGATIONS — queries that MUST head the cap:
   (a) grace: registered (module git-ADDED) after the newest
       adjudication — no driver row can exist yet;
   (b) never-green queries whose grace has expired;
   (c) churn-stale: a file in the query's import closure changed
       after its latest green (one-round grace mirror of
       tests/test_registry.py's invariant);
3. a proposed cap: obligations first, then the oldest-green tier —
   no query's last adjudication may age past MAX_STALE_ROUNDS without
   rotating back in.

Usage: python tools/rotate_cap.py   (read-only; prints the plan)
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import sys
from collections import Counter, defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

CAP = 50


def stale_bound(n_queries: int) -> int:
    """Maximum rounds any query may age without re-adjudication.

    COMPUTED from the live registry size, not a constant (VERDICT r8
    #3: a fixed 3 became unsatisfiable past 150 queries — 50 slots per
    round can re-adjudicate N queries only every ceil(N/50) rounds).
    Strict oldest-green-first rotation achieves exactly this bound:
    each round retires the 50 stalest entries, so a freshly-adjudicated
    query re-enters the cap after at most ceil(N/50) - 1 intervening
    rounds."""
    return max(1, -(-n_queries // CAP))


def latest_green_round() -> dict[str, int]:
    latest: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        with open(p) as f:
            for name, row in json.load(f).items():
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                ):
                    latest[name] = max(latest.get(name, 0), r)
    return latest


def main() -> None:
    import test_registry as tr
    from tcrd_spark.registry import all_queries

    q = all_queries()
    greens_round = {n: r for n, r in latest_green_round().items() if n in q}
    green_ts = tr._latest_green_ts()
    last_adj = max(
        tr._commit_ts(os.path.relpath(p, REPO))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    )
    cur_round = max(greens_round.values(), default=0)

    grace, never_green, churn_stale = [], [], []
    worst_file: dict[str, str] = {}
    for name in sorted(q):
        src = os.path.relpath(inspect.getsourcefile(q[name]), REPO)
        if tr._added_ts(src) > last_adj:
            grace.append(name)
            continue
        if name not in green_ts:
            never_green.append(name)
            continue
        f, ts = max(
            ((f, tr._commit_ts(f)) for f in tr._closure(q[name])),
            key=lambda kv: kv[1],
        )
        if ts > green_ts[name]:
            churn_stale.append(name)
            worst_file[name] = f

    bound = stale_bound(len(q))
    hist = Counter(greens_round.values())
    print(f"staleness histogram (latest green round -> queries); "
          f"bound = ceil({len(q)}/{CAP}) = {bound} rounds:")
    byround = defaultdict(list)
    for n, r in greens_round.items():
        byround[r].append(n)
    for r in sorted(byround):
        age = cur_round - r
        flag = "  <-- OVER BOUND" if age > bound else ""
        print(f"  r{r} (age {age}): {hist[r]}{flag}")

    obligations = grace + never_green + churn_stale
    print(f"\nobligations ({len(obligations)}):")
    for n in grace:
        print(f"  {n}  [new-query grace]")
    for n in never_green:
        print(f"  {n}  [never driver-green]")
    for n in churn_stale:
        print(f"  {n}  [closure churn: {worst_file[n]}]")

    filler = [
        n
        for r in sorted(byround)
        for n in sorted(byround[r])
        if n not in set(obligations)
    ]
    cap = obligations + filler[: max(0, CAP - len(obligations))]
    over = len(obligations) - CAP
    if over > 0:
        # more obligations than slots (a shared-helper commit expires
        # the churn grace of its WHOLE import closure at once): record
        # the overflow as an explicit one-round deferral. The file is
        # consumed by tests/test_registry.py (a validly-deferred name
        # is exempt from the churn invariant for exactly one
        # adjudication round) and the deferred names sort FIRST at the
        # next rotation (effective green −1). Deferral never means
        # unverified: the pytest oracle sweep and the builder's
        # tools/check.py sweeps hash-match every deferred query anyway.
        deferred = [n for n in obligations if n not in set(cap[:CAP])]
        with open(os.path.join(REPO, "DEFERRALS.json"), "w") as f:
            json.dump(
                {
                    "recorded_at_round": cur_round + 1,
                    "reason": f"{len(obligations)} churn-stale "
                              f"obligations for a {CAP}-slot cap",
                    "deferred": deferred,
                },
                f,
                indent=1,
            )
        print(f"\nWARNING: {over} obligations beyond the cap — recorded "
              f"as a one-round deferral in DEFERRALS.json "
              f"(recorded_at_round={cur_round + 1}).")
    print(f"\nproposed cap ({len(cap[:CAP])}):")
    for n in cap[:CAP]:
        print(f"  {n}")


if __name__ == "__main__":
    main()
