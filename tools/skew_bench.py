"""Measure the hot-key ordered-window exposure and its segmented fix
on a Zipfian event stream (VERDICT r4 next-step #2).

Generates (once) a skewed events parquet — one user holds ~30% of all
rows, the rest Zipf-distributed — then times the plain vs segmented
sessionize and as-of join, asserts result equality, and prints ONE
JSON line with wall times and the partition row-count distribution
under each operator's window partitioning. Results are recorded in
SCALE.md ("Hot-key ordered windows").

Usage: python tools/skew_bench.py [n_rows] (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DAY = 86400


def _gen(path: str, n_rows: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n_users = 100_000
    hot = rng.random(n_rows) < 0.30
    # Zipf over the cold users (alpha ~1.3, heavy but not degenerate)
    cold = rng.zipf(1.3, size=n_rows) % (n_users - 1) + 1
    user = np.where(hot, 0, cold).astype("int64")
    base = 1_700_000_000
    ts = base + rng.uniform(0, 30 * DAY, size=n_rows)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n_rows, dtype="int64")),
            "user_id": pa.array(user),
            "ts_secs": pa.array(ts),
            "value": pa.array(rng.uniform(0, 100, size=n_rows)),
            "event_type": pa.array(
                np.take(
                    np.array(["view", "click", "purchase"]),
                    rng.integers(0, 3, size=n_rows),
                )
            ),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # splittable row groups so the scan parallelizes (tools/gen_sf.py
    # lesson)
    pq.write_table(tbl, path, row_group_size=max(n_rows // 64, 10_000))


def _time(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    path = os.path.join(REPO, ".localdata", "events_zipf.parquet")
    if not os.path.exists(path):
        _gen(path, n_rows)

    from pyspark.sql import functions as F

    from tcrd_spark.operators.temporal import asof_join, sessionize
    from tcrd_spark.operators.temporal_skew import (
        asof_join_segmented,
        partition_row_counts,
        sessionize_segmented,
    )
    from tcrd_spark.session import get_spark

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    ev = (
        spark.read.parquet(path)
        .withColumn("ts", F.col("ts_secs").cast("timestamp"))
        .drop("ts_secs")
    )
    ev.count()  # warm

    out: dict = {"metric": "zipf_skew_wall", "unit": "sec",
                 "n_rows": ev.count()}

    sess_kw = dict(user_col="user_id", ts_col="ts", id_col="event_id",
                   gap_seconds=1800)
    out["sessionize_plain"] = _time(sessionize(ev, **sess_kw))
    out["sessionize_segmented"] = _time(
        sessionize_segmented(ev, segment_seconds=DAY, **sess_kw)
    )

    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    asof_kw = dict(on=["user_id"], left_ts="ts", right_ts="ts",
                   right_cols=["event_id", "value"],
                   right_order="event_id")
    out["asof_plain"] = _time(asof_join(clicks, purchases, **asof_kw))
    out["asof_segmented"] = _time(
        asof_join_segmented(clicks, purchases, segment_seconds=DAY,
                            **asof_kw)
    )

    # partition-load distribution (the task-size proxy): window keys
    for label, keys, df in [
        ("plain", ["user_id"], ev),
        (
            "segmented",
            ["user_id", "_seg"],
            ev.withColumn(
                "_seg",
                F.floor(F.col("ts").cast("double") / DAY),
            ),
        ),
    ]:
        counts = sorted(
            r["rows"]
            for r in partition_row_counts(df, keys, 64).collect()
        )
        out[f"partition_rows_{label}"] = {
            "max": counts[-1],
            "median": counts[len(counts) // 2],
            "max_share": round(counts[-1] / out["n_rows"], 4),
        }

    # equality spot-check on a 1% slice (full equality is the pytest's
    # job; here we guard against benchmarking two different answers)
    sl = ev.filter(F.col("user_id") % 100 == 0)
    a = sessionize(sl, **sess_kw)
    b = sessionize_segmented(sl, segment_seconds=DAY, **sess_kw)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
