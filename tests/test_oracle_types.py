"""Oracle-typing audit: no oracle may emit a DuckDB HUGEINT column.

DuckDB's bare ``sum()`` over INTEGER returns HUGEINT (int128), which
pandas widens to float64 — so the driver hashes ``7.0`` against Spark's
``7`` and the query fails its value-hash despite identical values.
Rounds 1 and 2 each re-hit this class (CORRECTNESS_r01/r02); every such
sum must be wrapped in ``CAST(... AS BIGINT)``.  This test binds every
registered oracle against the sf0.001 views and rejects any output
column whose resolved type is HUGEINT/UHUGEINT, so the class cannot
recur no matter how the SQL is spelled.
"""

from __future__ import annotations


def test_no_hugeint_in_oracle_output(duck):
    from tcrd_spark.registry import all_oracle_sql

    bad = {}
    for name, sql in all_oracle_sql().items():
        rel = duck.sql(sql)  # binds/plans only; does not execute
        huge = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if huge:
            bad[name] = huge
    assert not bad, (
        f"oracles emitting HUGEINT (wrap the sum in CAST(... AS BIGINT)): {bad}"
    )
