"""Registry invariants: the adjudication-cap discipline is a repo
contract, not a comment — every registered query has an oracle (or a
documented weak check), the cap ordering is exactly PRIORITY, and any
query rotated past the driver's 50-query cap must already hold a green
CORRECTNESS row from a previous round (union coverage never regresses).
"""

from __future__ import annotations

import glob
import json
import os

from tcrd_spark.registry import PRIORITY, all_oracle_sql, all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_covers_all_queries_exactly():
    q = all_queries()
    assert sorted(PRIORITY) == sorted(q), (
        "PRIORITY and registered queries diverge"
    )
    assert list(q)[: len(PRIORITY)] == list(PRIORITY)


def test_every_oracle_has_a_query():
    q, o = all_queries(), all_oracle_sql()
    assert set(o) <= set(q)


def test_past_cap_queries_have_green_history():
    greens: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name, row in json.load(f).items():
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                ):
                    greens.add(name)
    missing = [n for n in PRIORITY[50:] if n not in greens]
    assert not missing, (
        "queries rotated past the adjudication cap without any green "
        f"CORRECTNESS history: {missing}"
    )
