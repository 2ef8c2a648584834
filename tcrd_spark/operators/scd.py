"""SCD Type 2 history build: change-stream → validity intervals.

The slowly-changing-dimension pattern every warehouse ETL needs:
given a stream of observations (key, ts, attribute), emit one row per
VERSION — the attribute value with [valid_from, valid_to) and an
is_current flag — collapsing consecutive observations that carry no
change. The reference mutates dimension rows in place (`loaders/`
upd_* SQL) and keeps history only in tdl_update_log; SCD2 is the
lake-native replacement: immutable versions, point-in-time joins for
free (`BETWEEN valid_from AND valid_to`).

100 TB shape: two windows, both partitioned by the dimension KEY (one
lag for change detection, one lead for interval close) — key
cardinality is the parallelism, no global ordering anywhere. Hot keys
are bounded by per-key history length, not corpus size; a key with
pathological churn routes through the same skew-split discipline as
`operators/temporal_skew.py`. Composes with MERGE (`sources/merge.py`)
for incremental upkeep: new observations only touch the partitions of
keys they change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key, attr, valid_from, valid_to, version, is_current).

    Consecutive rows (per key, time-ordered) with an unchanged attr
    collapse into one version. valid_to is NULL for the open (current)
    version. `tiebreak_col` makes same-timestamp observations
    deterministic.
    """
    order = [F.asc(ts_col)] + (
        [F.asc(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    carry = [tiebreak_col] if tiebreak_col else []
    changed = df.select(
        key_col, ts_col, attr_col, *carry,
        F.lag(attr_col).over(w).alias("_prev"),
    ).filter(
        F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
    )
    # the interval window needs the tiebreak too: surviving change rows
    # can still share a timestamp within a key
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return changed.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_batch_delta(
    history: DataFrame,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """The CHANGE ROWS a batch induces on a standing SCD2 history —
    the touched keys' re-versioned rows only, in history schema
    (key, attr, valid_from, valid_to, version, is_current). Exposed
    separately from `scd2_apply_batch` so sinks that persist history
    in the versioned lake can MERGE just the delta (COW on touched
    files) instead of materializing the full updated frame
    (`streaming/scd_stream.py`). Same precondition/validation as
    apply: every batch row strictly later than its key's current
    valid_from."""
    hist_cols = [
        key_col, attr_col, "valid_from", "valid_to", "version",
        "is_current",
    ]
    if validate:
        viol = (
            batch.select(key_col, ts_col)
            .join(
                history.filter(F.col("is_current")).select(
                    key_col, "valid_from"
                ),
                key_col,
            )
            .filter(F.col(ts_col) <= F.col("valid_from"))
        )
        sample = viol.select(key_col, ts_col, "valid_from").take(3)
        if sample:
            raise ValueError(
                "scd2_apply_batch: batch rows not strictly later than "
                "their key's current valid_from (late/out-of-order "
                "data) — the incremental path would diverge from the "
                f"rebuild; route these keys through scd2_history "
                f"instead. Examples: {[tuple(r) for r in sample]}"
            )
    keys = batch.select(key_col).distinct()
    seed = (
        history.filter(F.col("is_current"))
        .join(keys, key_col, "semi")
        .select(
            key_col,
            F.col("valid_from").alias(ts_col),
            attr_col,
            F.col("version").alias("_seed_v"),
            *(
                [
                    F.lit(None)
                    .cast(batch.schema[tiebreak_col].dataType)
                    .alias(tiebreak_col)
                ]
                if tiebreak_col
                else []
            ),
        )
    )
    obs = batch.select(
        key_col, ts_col, attr_col,
        F.lit(None).cast("int").alias("_seed_v"),
        *([tiebreak_col] if tiebreak_col else []),
    ).unionByName(seed.select(*[
        key_col, ts_col, attr_col, "_seed_v",
        *([tiebreak_col] if tiebreak_col else []),
    ]))
    order = [F.asc(ts_col)] + (
        [F.asc(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    wk = Window.partitionBy(key_col)
    changed = obs.select(
        key_col, ts_col, attr_col, "_seed_v",
        *([tiebreak_col] if tiebreak_col else []),
        F.lag(attr_col).over(w).alias("_prev"),
    ).filter(
        F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
    )
    # new keys have no seed: versions start at 1
    base = F.coalesce(F.max("_seed_v").over(wk), F.lit(1))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    delta = changed.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        (base + F.row_number().over(w2) - 1).cast("int").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    return delta.select(*hist_cols)


def scd2_apply_batch(
    history: DataFrame,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Incremental SCD2 upkeep: apply a batch of NEW observations
    (key, ts, attr[, tiebreak]) to a standing history, returning the
    updated history — equal to rebuilding `scd2_history` over the
    union of all observations, provided every batch row is strictly
    later than its key's current ``valid_from`` (append-in-time; late
    or out-of-order data takes the batch rebuild path instead).

    ``validate=True`` (default) enforces that precondition eagerly
    instead of trusting the caller: batch rows at or before their
    key's current ``valid_from`` would silently produce history that
    diverges from the rebuild (the seed's NULL tiebreak sorts before
    same-ts batch rows, compounding it), so the guard raises with the
    violating keys. Cost ∝ batch (one semi-join against current rows —
    the same rows the seed join reads anyway); pass ``validate=False``
    only when the source is append-in-time by construction.

    Plan: the batch's keys pull ONLY their current version rows
    (semi-join); each touched key replays (current-version seed ∪
    batch rows) through the same change-filter windows as the batch
    build, re-versioning from the seed's version; the resulting delta
    MERGEs into the standing history on (key, version) — the seed row
    updates in place (its valid_to closes / stays open), new versions
    insert, untouched keys' rows and partitions pass through
    (`sources/merge.py` presence-marker full-outer). Work ∝ batch, not
    history: N daily batches over a 100 TB dimension never rescan the
    closed versions.
    """
    from tcrd_spark.sources.merge import merge_frames

    hist_cols = [
        key_col, attr_col, "valid_from", "valid_to", "version",
        "is_current",
    ]
    delta = scd2_batch_delta(
        history, batch, key_col, ts_col, attr_col,
        tiebreak_col=tiebreak_col, validate=validate,
    )
    return merge_frames(
        history.select(*hist_cols), delta,
        [key_col, "version"],
    )


def as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time view: the version rows live at `ts`."""
    return history.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )


# ------------------------------------------------- registered queries


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version history of each user's event_type 'state' over the
    events stream (change rows only, validity intervals, open current
    version)."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    return scd2_history(ev, "user_id", "ts", "event_type", "event_id")


BATCH_CUTOFF = "2024-01-24 00:00:00"


def q_scd2_apply_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental == rebuild, adjudicated: history built from events
    BEFORE the cutoff, the rest applied as ONE change batch via
    MERGE — the oracle computes the one-shot rebuild over ALL events,
    so the hash match proves the N-batch upkeep path exactly
    reproduces it (the composition SURVEY §2.4 claims)."""
    from tcrd_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    cut = F.to_timestamp(F.lit(BATCH_CUTOFF))
    old = ev.filter(F.col("ts") < cut)
    batch = ev.filter(F.col("ts") >= cut).select(
        "user_id", "ts", "event_type", "event_id"
    )
    hist = scd2_history(old, "user_id", "ts", "event_type", "event_id")
    return scd2_apply_batch(
        hist, batch, "user_id", "ts", "event_type", "event_id"
    )


QUERIES = {
    "scd2_history": q_scd2_history,
    "scd2_apply_batch": q_scd2_apply_batch,
}

ORACLE = {
    "scd2_history": """
        WITH changed AS (
            SELECT user_id, ts, event_type, event_id
            FROM (
                SELECT user_id, ts, event_type, event_id,
                       lag(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC
                       ) AS prev
                FROM events
            )
            WHERE prev IS NULL OR event_type != prev
        )
        SELECT user_id, event_type,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               row_number() OVER w AS version,
               lead(ts) OVER w IS NULL AS is_current
        FROM changed
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
}

# the incremental path must land on the ONE-SHOT rebuild — same SQL
ORACLE["scd2_apply_batch"] = ORACLE["scd2_history"]
