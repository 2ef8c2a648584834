"""Z-order layout (sources/zorder.py): the skipping win is measured —
partition [min,max] ranges on the SECOND column prune a predicate far
better under z-order than under a single-column sort; z-values respect
the Morton property on hand-checked codes."""

from __future__ import annotations

from pyspark.sql import functions as F

from tcrd_spark.sources.lake import load_table
from tcrd_spark.sources.zorder import interleave, zorder_layout


def test_interleave_matches_hand_computed_morton(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], ["a", "b"]
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", interleave(["a", "b"]).alias("z")
        ).collect()
    }

    def morton(a, b):
        z = 0
        for k in range(8):
            z |= ((a >> k) & 1) << (2 * k + 1)
            z |= ((b >> k) & 1) << (2 * k)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b, z)


def _partition_ranges(df, col, n):
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )


def test_zorder_prunes_second_column_predicates(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    n = 16

    # baseline: sorted by user_id only (the single-column layout)
    by_user = ev.repartitionByRange(n, "user_id").sortWithinPartitions(
        "user_id"
    )
    zord = zorder_layout(ev, ["user_id", "value"], n)

    # skipping power = how narrow each partition's min/max band is on
    # the SECOND column (what parquet footer pruning sees). With 16
    # partitions the curve gives quartile resolution per column, so a
    # quarter-width mean band is the theoretical target; the baseline
    # partitions each span ~the full value range.
    def mean_width(layout):
        ranges = _partition_ranges(layout, "value", n)
        return sum(r["hi"] - r["lo"] for r in ranges) / len(ranges)

    full = ev.agg(
        (F.max("value") - F.min("value")).alias("w")
    ).collect()[0]["w"]
    base_w = mean_width(by_user)
    z_w = mean_width(zord)
    assert base_w >= 0.5 * full, (base_w, full)
    assert z_w <= 0.6 * base_w, (z_w, base_w)

    # and a concrete probe INSIDE a value stratum (p30–p40, clear of
    # the quartile code boundaries): far fewer partitions overlap
    lo, hi = ev.agg(
        F.expr("percentile(value, 0.30)"), F.expr("percentile(value, 0.40)")
    ).collect()[0]

    def overlapping(layout):
        ranges = _partition_ranges(layout, "value", n)
        return sum(1 for r in ranges if r["lo"] <= hi and r["hi"] >= lo)

    assert overlapping(zord) < overlapping(by_user), (
        overlapping(zord), overlapping(by_user)
    )

    # layout is a reshuffle, never a filter
    assert zord.count() == ev.count()
