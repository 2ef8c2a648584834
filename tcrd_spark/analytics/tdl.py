"""Target Development Level (TDL) classification.

Reference semantics (`loaders/load-TDLs.py:77-129`):
- any MoA drug activity           → Tclin
- else any drug activity          → Tchem
- else any cmpd activity          → Tchem
- else score "dark points": pubmed score < 5 (+1), generif count <= 3
  (+1), antibody count <= 50 (+1); >= 2 points → Tdark, UNLESS an
  'Experimental MF/BP Leaf Term GOA' exists → Tbio with bump_flag;
  else Tbio.

The reference runs an N+1 per-target fan-out (~20,412 get_target
calls, 10m06s, `doc/README_v6.txt:430-436`); here it is a single
when-chain over a pre-joined feature DataFrame — no UDF, pure
whole-stage codegen, one pass at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PMS_THRESHOLD = 5.0
GENERIF_THRESHOLD = 3
AB_THRESHOLD = 50


def dark_points(pms: Column, rif_ct: Column, ab_ct: Column) -> Column:
    return (
        F.when(pms < PMS_THRESHOLD, 1).otherwise(0)
        + F.when(rif_ct <= GENERIF_THRESHOLD, 1).otherwise(0)
        + F.when(ab_ct <= AB_THRESHOLD, 1).otherwise(0)
    )


def features_from_lake(lake: dict[str, DataFrame]) -> DataFrame:
    """Build the TDL feature row per target from the domain tables —
    the whole-lake replacement for get_target4tdlcalc's N+1 fan-out:
    drug/cmpd counts from the activity tables, pms / ab_ct / efl_goa
    from the EAV tdl_info rows, rif_ct from generif.
    """
    from tcrd_spark.api.adaptor import entity

    ent = entity(lake).select("target_id", "protein_id")
    drug = lake["drug_activity"].groupBy("target_id").agg(
        F.sum(F.when(F.col("has_moa"), 1).otherwise(0)).alias("moa_drug_ct"),
        F.count("*").alias("drug_ct"),
    )
    cmpd = lake["cmpd_activity"].groupBy("target_id").agg(
        F.count("*").alias("cmpd_ct")
    )
    info = lake["tdl_info"]
    pms = (
        info.filter(F.col("itype") == "JensenLab PubMed Score")
        .select("protein_id", F.col("number_value").alias("pms"))
    )
    ab = (
        info.filter(F.col("itype") == "Ab Count")
        .select("protein_id", F.col("integer_value").alias("ab_ct"))
    )
    efl = (
        info.filter(F.col("itype") == "Experimental MF/BP Leaf Term GOA")
        .select("protein_id", F.lit(True).alias("efl_goa"))
        .distinct()
    )
    rif = lake["generif"].groupBy("protein_id").agg(
        F.count("*").alias("rif_ct")
    )
    return (
        ent.join(drug, "target_id", "left")
        .join(cmpd, "target_id", "left")
        .join(pms, "protein_id", "left")
        .join(ab, "protein_id", "left")
        .join(efl, "protein_id", "left")
        .join(rif, "protein_id", "left")
        .select(
            "target_id",
            "protein_id",
            F.coalesce("moa_drug_ct", F.lit(0)).alias("moa_drug_ct"),
            F.coalesce("drug_ct", F.lit(0)).alias("drug_ct"),
            F.coalesce("cmpd_ct", F.lit(0)).alias("cmpd_ct"),
            F.coalesce("pms", F.lit(0.0)).alias("pms"),
            F.coalesce("rif_ct", F.lit(0)).alias("rif_ct"),
            F.coalesce("ab_ct", F.lit(0)).alias("ab_ct"),
            F.coalesce("efl_goa", F.lit(False)).alias("efl_goa"),
        )
    )


def compute_tdl(features: DataFrame) -> DataFrame:
    """features columns: moa_drug_ct, drug_ct, cmpd_ct, pms, rif_ct,
    ab_ct, efl_goa (boolean). Adds (tdl, bump_flag)."""
    pts = dark_points(F.col("pms"), F.col("rif_ct"), F.col("ab_ct"))
    is_dark = pts >= 2
    tdl = (
        F.when(F.col("moa_drug_ct") > 0, "Tclin")
        .when(F.col("drug_ct") > 0, "Tchem")
        .when(F.col("cmpd_ct") > 0, "Tchem")
        .when(is_dark & ~F.col("efl_goa"), "Tdark")
        .otherwise("Tbio")
    )
    bump = (
        (F.col("moa_drug_ct") == 0)
        & (F.col("drug_ct") == 0)
        & (F.col("cmpd_ct") == 0)
        & is_dark
        & F.col("efl_goa")
    )
    return features.withColumn("tdl", tdl).withColumn("bump_flag", bump)


def tdl_refresh(
    lake: dict[str, DataFrame],
    person: str = "tcrd_spark",
    application: str = "load-TDLs",
    app_version: str | None = None,
    asof: str | None = None,
) -> dict[str, DataFrame]:
    """The complete load-TDLs refresh cycle as one pipeline
    (`loaders/load-TDLs.py:44-76`): recompute every target's TDL from
    the lake, overwrite target.tdl (the reference's per-target
    upd_target loop), emit tdl_update_log audit rows for targets whose
    classification CHANGED, and produce the printed tally (per-TDL
    counts + bumped count) the build log records as its oracle
    (`doc/README_v6.txt:430-436`).

    Returns {'target', 'tdl_update_log', 'tdl_counts'}. Deterministic:
    log ids are surrogates of (target_id, old, new, refresh timestamp)
    — the timestamp keeps ids unique when a target repeats the same
    transition in a later cycle — and `asof` (the log timestamp) is
    injectable for reproducible runs.
    """
    from tcrd_spark.schema.tables import surrogate_id

    new = compute_tdl(features_from_lake(lake)).select(
        F.col("target_id").alias("nid"),
        F.col("tdl").alias("_new_tdl"),
        "bump_flag",
    )
    # `new` derives FROM lake["target"] (entity join), so this is a
    # self-join — qualify explicitly to dodge ambiguous-column analysis
    joined = (
        lake["target"]
        .alias("t")
        .join(new.alias("n"), F.col("t.id") == F.col("n.nid"), "left")
        .select("t.*", "n._new_tdl", "n.bump_flag")
    )
    target = joined.withColumn(
        "tdl", F.coalesce("_new_tdl", "tdl")
    ).drop("_new_tdl", "bump_flag")
    changed = joined.filter(
        ~F.col("_new_tdl").eqNullSafe(F.col("tdl"))
        & F.col("_new_tdl").isNotNull()
    )
    # the refresh timestamp folds into the surrogate so a target
    # repeating the same transition across refresh cycles (A→B, B→A,
    # A→B) gets DISTINCT log ids in the append-only log
    stamp = (
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss")
        if asof is None
        else F.lit(asof)
    )
    log_rows = changed.select(
        surrogate_id(
            F.concat_ws("|", F.col("id"), F.coalesce("tdl", F.lit("")),
                        F.col("_new_tdl"), stamp)
        ).alias("id"),
        F.col("id").alias("target_id"),
        F.col("tdl").alias("old_tdl"),
        F.col("_new_tdl").alias("new_tdl"),
        F.lit(person).alias("person"),
        stamp.alias("datetime"),
        F.lit(None).cast("string").alias("explanation"),
        F.lit(application).alias("application"),
        F.lit(app_version).cast("string").alias("app_version"),
    )
    log = lake["tdl_update_log"].unionByName(
        log_rows, allowMissingColumns=True
    )
    counts = (
        new.groupBy(F.col("_new_tdl").alias("tdl"))
        .agg(
            F.count("*").alias("ct"),
            F.sum(F.when(F.col("bump_flag"), 1).otherwise(0)).alias(
                "bumped_ct"
            ),
        )
        .orderBy("tdl")
    )
    return {"target": target, "tdl_update_log": log, "tdl_counts": counts}


def sql_tdl_case(
    moa="moa_drug_ct", drug="drug_ct", cmpd="cmpd_ct",
    pms="pms", rif="rif_ct", ab="ab_ct", efl="efl_goa",
) -> tuple[str, str]:
    """The identical rule chain as oracle SQL: returns the (tdl CASE
    expression, bump_flag boolean expression) pair."""
    pts = (
        f"(CASE WHEN {pms} < {PMS_THRESHOLD} THEN 1 ELSE 0 END"
        f" + CASE WHEN {rif} <= {GENERIF_THRESHOLD} THEN 1 ELSE 0 END"
        f" + CASE WHEN {ab} <= {AB_THRESHOLD} THEN 1 ELSE 0 END)"
    )
    tdl = (
        f"CASE WHEN {moa} > 0 THEN 'Tclin' "
        f"WHEN {drug} > 0 THEN 'Tchem' "
        f"WHEN {cmpd} > 0 THEN 'Tchem' "
        f"WHEN {pts} >= 2 AND NOT {efl} THEN 'Tdark' "
        f"ELSE 'Tbio' END"
    )
    bump = (
        f"({moa} = 0 AND {drug} = 0 AND {cmpd} = 0 AND {pts} >= 2 AND {efl})"
    )
    return tdl, bump
