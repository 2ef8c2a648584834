"""Time-series downsampling for visualization — LTTB-lite: per key,
reduce N points to ~one representative per time bucket, keeping the
points that preserve the series' SHAPE (spikes, reversals) instead of
the blind bucket average that flattens them.

Timescale/Influx ship LTTB (largest-triangle-three-buckets, Steinarsson
2013) as the standard downsampler. Classic LTTB is SEQUENTIAL: the
point chosen in bucket i depends on the point chosen in bucket i-1 —
a per-key serial chain that cannot parallelize inside a key and has no
SQL form. This operator is the parallel "lite" variant production
engines actually deploy at scale: the triangle anchors are the
NEIGHBOR BUCKETS' CENTROIDS (fixed, data-derived) rather than the
previous selection, so every bucket's argmax is independent —
expressible as two windows over built-in functions, identical in the
DuckDB oracle, and embarrassingly parallel per key. On smooth series
the two variants pick near-identical points; the lite variant's
spike-retention guarantee (a bucket's most-deviant point wins) is what
visualization needs and what averaging destroys (pytest-pinned).

Per (key, bucket): keep the point maximizing the triangle area with
the previous and next buckets' centroids — 0.5·|(x₋−x₊)(y−y₋) −
(x₋−x)(y₊−y₋)|; the first/last buckets anchor on themselves (their
centroid), degrading gracefully to max-deviation-from-mean. Ties
break on (earlier ts, so the pick is deterministic).

Determinism for the oracle: areas compare in exact integer space —
epoch-second x deltas × 6dp-scaled y deltas (bigint products) — so
both engines pick the identical argmax row even where float areas
would tie-break differently.

100 TB shape: one key+bucket hash exchange for the centroids
(map-side combinable), one key-partitioned window for the
neighbor-centroid join (lag/lead over the bucket series — bucket
cardinality per key is bounded by span/width, not event count), one
WindowGroupLimit argmax per bucket. Skewed keys cost their own
partitions only; nothing is global.

Reference parity: none (hypertable extension, with
operators/timeseries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKET = "hour"


def lttb_downsample(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    bucket: str = BUCKET,
) -> DataFrame:
    """(key, bucket, ts, v): ONE shape-preserving representative per
    (key, time bucket) — the LTTB-lite argmax against neighbor-bucket
    centroids."""
    pts = events.select(
        F.col(key_col),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        F.col(ts_col).alias("ts"),
        # epoch SECONDS and 6dp-scaled values as bigints (the
        # timeseries.py discipline): INTEGER sums are exact in fp64,
        # so both centroid coordinates are bit-identical cross-engine
        # regardless of summation order — a raw avg(v) differed in the
        # last ulp between engines and flipped near-tie argmaxes at sf1
        F.col(ts_col).cast("timestamp").cast("long").alias("ex"),
        F.round(F.col(val_col) * 1e6).cast("long").alias("vi"),
        F.col(val_col).alias("v"),
    )
    cent = pts.groupBy(key_col, "bucket").agg(
        F.avg("ex").alias("cx"),
        F.avg("vi").alias("cy"),  # 6dp-scaled centroid y
    )
    wb = Window.partitionBy(key_col).orderBy("bucket")
    cent = cent.select(
        key_col,
        "bucket",
        # neighbor centroids; edge buckets anchor on themselves
        F.coalesce(F.lag("cx").over(wb), F.col("cx")).alias("px"),
        F.coalesce(F.lag("cy").over(wb), F.col("cy")).alias("py"),
        F.coalesce(F.lead("cx").over(wb), F.col("cx")).alias("nx"),
        F.coalesce(F.lead("cy").over(wb), F.col("cy")).alias("ny"),
    )
    j = pts.join(cent, [key_col, "bucket"])
    # 2×area in exact integer space: x as epoch seconds (bigint),
    # y already 6dp-scaled (bigint) — identical argmax in both engines
    r = lambda c: F.round(F.col(c)).cast("long")  # noqa: E731
    area2 = F.abs(
        (r("px") - r("nx")) * (F.col("vi") - r("py"))
        - (r("px") - F.col("ex")) * (r("ny") - r("py"))
    )
    w = Window.partitionBy(key_col, "bucket").orderBy(
        F.desc("_a2"), F.asc("ts")
    )
    return (
        j.withColumn("_a2", area2)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(key_col, "bucket", "ts", "v")
    )


# ------------------------------------------------- registered query


def q_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly shape-preserving downsample of the per-user event value
    series (1-in-7 user sample, the resample_gapfill discipline)."""
    from tcrd_spark.sources.lake import load_table

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 7 == 0
    )
    return lttb_downsample(events, "user_id", "ts", "value", BUCKET)


QUERIES = {"lttb_downsample": q_lttb_downsample}

ORACLE = {
    "lttb_downsample": """
        WITH pts AS (
          SELECT user_id, date_trunc('hour', ts) AS bucket, ts,
                 -- floor, not a bare cast: Spark's timestamp->long
                 -- TRUNCATES sub-second fractions while DuckDB's
                 -- double->bigint cast ROUNDS (diverged at sf1 where
                 -- raw event timestamps carry fractions)
                 CAST(floor(epoch(ts)) AS BIGINT) AS ex,
                 CAST(round(value * 1e6) AS BIGINT) AS vi, value AS v
          FROM events WHERE user_id % 7 = 0
        ),
        cent AS (
          SELECT user_id, bucket,
                 avg(ex) AS cx, avg(vi) AS cy
          FROM pts GROUP BY 1, 2
        ),
        nb AS (
          SELECT user_id, bucket,
                 coalesce(lag(cx) OVER w, cx) AS px,
                 coalesce(lag(cy) OVER w, cy) AS py,
                 coalesce(lead(cx) OVER w, cx) AS nx,
                 coalesce(lead(cy) OVER w, cy) AS ny
          FROM cent
          WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
        ),
        scored AS (
          SELECT p.user_id, p.bucket, p.ts, p.v,
                 abs(
                   (CAST(round(px) AS BIGINT) - CAST(round(nx) AS BIGINT))
                   * (p.vi - CAST(round(py) AS BIGINT))
                   - (CAST(round(px) AS BIGINT) - p.ex)
                   * (CAST(round(ny) AS BIGINT)
                      - CAST(round(py) AS BIGINT))
                 ) AS a2
          FROM pts p JOIN nb
            ON p.user_id = nb.user_id AND p.bucket = nb.bucket
        )
        SELECT user_id, bucket, ts, v FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id, bucket ORDER BY a2 DESC, ts
          ) AS rn FROM scored
        ) WHERE rn = 1
    """,
}
