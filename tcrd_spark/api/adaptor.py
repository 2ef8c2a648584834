"""The DBAdaptor read surface, Spark-first.

The reference's central execution pattern is an N+1 fan-out: ~40 point
queries per target × 20,412 targets (`loaders/TCRD.py:1857-2125`,
SURVEY §3-A). Every method here is the whole-table formulation: one
plan, grouped joins, `collect_list(struct(...))` for the nested parts.
`get_targets(ids)` is a filter on the same plan — the per-entity API
falls out of the set-based one, never the other way around.

All lake tables arrive as a dict[str, DataFrame] (`lake` argument) so
the adaptor is storage-agnostic (parquet, Delta, temp views alike).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tcrd_spark.functions.eav import dereference


def entity(lake: dict[str, DataFrame]) -> DataFrame:
    """The universal 3-way access path target⋈t2tc⋈protein
    (`SQL/create-TCRDv7.sql:2352` view; `loaders/TCRD.py:2267-2269`).
    target is ~20k rows — both joins broadcast."""
    t = lake["target"].select(
        F.col("id").alias("target_id"),
        F.col("name").alias("target_name"),
        "ttype", "tdl", "idg", "fam", "famext",
    )
    bridge = lake["t2tc"]
    p = lake["protein"]
    return (
        F.broadcast(t)
        .join(bridge, "target_id")
        .join(p, bridge.protein_id == p.id)
        .drop("id")
    )


def find_targets(lake: dict[str, DataFrame], **criteria) -> DataFrame:
    """find_targets(sym=..., uniprot=..., geneid=..., stringid=...,
    name=..., tdl=..., fam=...) — conjunctive equality like the
    reference's appended `AND p.<col> = %s` (`loaders/TCRD.py:
    2266-2289`). Returns distinct target_ids."""
    df = entity(lake)
    colmap = {
        "sym": "sym", "uniprot": "uniprot", "geneid": "geneid",
        "stringid": "stringid", "name": "target_name",
        "tdl": "tdl", "fam": "fam",
    }
    for k, v in criteria.items():
        if k not in colmap:
            raise KeyError(f"unsupported find_targets key: {k}")
        df = df.filter(F.col(colmap[k]) == v)
    return df.select("target_id").distinct()


def find_targets_by_xref(
    lake: dict[str, DataFrame], xtype: str, value: str
) -> DataFrame:
    """Two-branch xref lookup: target-attached ∪ protein-attached,
    deduped (`loaders/TCRD.py:2300-2353`, union+set() at :2338-2342)."""
    x = lake["xref"].filter(
        (F.col("xtype") == xtype) & (F.col("value") == value)
    )
    direct = x.filter(F.col("target_id").isNotNull()).select("target_id")
    via_protein = (
        x.filter(F.col("protein_id").isNotNull())
        .select("protein_id")
        .join(lake["t2tc"], "protein_id")
        .select("target_id")
    )
    return direct.unionByName(via_protein).distinct()


def find_targets_by_alias(
    lake: dict[str, DataFrame], atype: str, value: str
) -> DataFrame:
    """4-way alias join (`loaders/TCRD.py:2355-2392`)."""
    a = lake["alias"].filter(
        (F.col("type") == atype) & (F.col("value") == value)
    )
    return (
        a.select("protein_id")
        .join(lake["t2tc"], "protein_id")
        .select("target_id")
        .distinct()
    )


def get_beans(lake: dict[str, DataFrame]) -> DataFrame:
    """Count dashboard (`loaders/TCRD.py:1711-1811` get_beans +
    get_count_typecount): one row per (table, type) with row count —
    all tables in one unioned aggregation pass."""
    parts = []
    typed = {
        "tdl_info": "itype", "xref": "xtype", "expression": "etype",
        "disease": "dtype", "pathway": "pwtype", "ppi": "ppitype",
    }
    for tbl, tcol in typed.items():
        if tbl in lake:
            parts.append(
                lake[tbl]
                .groupBy(F.lit(tbl).alias("table_name"), F.col(tcol).alias("type"))
                .agg(F.count("*").alias("ct"))
            )
    for tbl in ("target", "protein", "alias", "goa", "generif"):
        if tbl in lake:
            parts.append(
                lake[tbl].agg(
                    F.lit(tbl).alias("table_name"),
                    F.lit(None).cast("string").alias("type"),
                    F.count("*").alias("ct"),
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


DOMAIN_XTYPES = ("Pfam", "InterPro", "PROSITE")


def get_target_features(lake: dict[str, DataFrame]) -> DataFrame:
    """Distinct protein domain features across the three domain xref
    namespaces, unioned and deduped (`loaders/TCRD.py:2422-2608`
    get_target_features appends Pfam ∪ InterPro ∪ PROSITE)."""
    x = lake["xref"].filter(
        F.col("xtype").isin(*DOMAIN_XTYPES)
        & F.col("protein_id").isNotNull()
    )
    return x.select("protein_id", "xtype", "value").distinct()


def get_common_pathway(
    lake: dict[str, DataFrame], pid1: int, pid2: int, pwtype: str = "KEGG"
) -> DataFrame:
    """Pathway names shared by two proteins — the reference's pathway
    self-join on name (`loaders/TCRD.py:2871-2883`), expressed as the
    intersect of the two name sets."""
    pw = lake["pathway"].filter(F.col("pwtype") == pwtype)
    a = pw.filter(F.col("protein_id") == pid1).select("name")
    b = pw.filter(F.col("protein_id") == pid2).select("name")
    return a.intersect(b)


def get_nearest_tclin(lake: dict[str, DataFrame]) -> DataFrame:
    """Nearest-Tclin over kegg_distance, both directions, ties kept
    (`loaders/TCRD.py:2800-2869`; `loaders/load-KEGGNearestTclins.py:
    83-110`). The reference runs 2 MIN-then-requery queries per
    non-Tclin protein; here each direction is one join + rank window
    for ALL proteins (operators/graph.py nearest_flagged). Returns
    (protein_id, direction up/downstream, tclin_id, distance)."""
    from tcrd_spark.operators.graph import nearest_flagged

    tclin_pids = (
        lake["target"]
        .filter(F.col("tdl") == "Tclin")
        .select(F.col("id").alias("target_id"))
        .join(lake["t2tc"], "target_id")
        .select(F.col("protein_id").alias("tclin_id"))
        .distinct()
    )
    kd = lake["kegg_distance"].select(
        F.col("pid1"), F.col("pid2"), F.col("distance")
    )
    # downstream: self is pid1, flagged target is pid2
    down = nearest_flagged(
        kd.select(F.col("pid1").alias("protein_id"),
                  F.col("pid2").alias("other"), "distance"),
        tclin_pids, "protein_id", "other", "tclin_id",
    ).select("protein_id", F.lit("downstream").alias("direction"),
             F.col("other").alias("tclin_id"), "distance")
    # upstream: self is pid2, flagged target is pid1
    up = nearest_flagged(
        kd.select(F.col("pid2").alias("protein_id"),
                  F.col("pid1").alias("other"), "distance"),
        tclin_pids, "protein_id", "other", "tclin_id",
    ).select("protein_id", F.lit("upstream").alias("direction"),
             F.col("other").alias("tclin_id"), "distance")
    both = down.unionByName(up)
    # only non-Tclin proteins get rows (load-KEGGNearestTclins.py:83)
    return both.join(
        tclin_pids.withColumnRenamed("tclin_id", "protein_id"),
        "protein_id",
        "left_anti",
    )


def get_protein_dto(lake: dict[str, DataFrame]) -> DataFrame:
    """DTO classification path per protein — the reference walks the
    dto.parent_id chain recursively per protein (`loaders/TCRD.py:
    2127-2137` get_protein_dto). One ancestor-closure pass over the
    dto edge table serves every protein at once. Returns
    (protein_id, dtoid, ancestor, depth); depth 0 is the node itself."""
    from tcrd_spark.operators.graph import ancestor_closure_edges

    dto = lake["dto"]
    edges = dto.filter(F.col("parent_id").isNotNull()).select(
        F.col("id").alias("child"), F.col("parent_id").alias("parent")
    )
    closure = ancestor_closure_edges(edges, "child", "parent")
    p = lake["protein"].filter(F.col("dtoid").isNotNull()).select(
        F.col("id").alias("protein_id"), F.col("dtoid")
    )
    self_rows = p.select(
        "protein_id", "dtoid",
        F.col("dtoid").alias("ancestor"), F.lit(0).alias("depth"),
    )
    walked = p.join(
        closure.withColumnRenamed("node", "dtoid"), "dtoid"
    ).select("protein_id", "dtoid", "ancestor", "depth")
    return self_rows.unionByName(walked)


def tdl_evolution(versions: dict[str, DataFrame]) -> DataFrame:
    """TDLevol (`python/mk-TDLevol.py:14-50`): per-uniprot TDL across
    schema versions as one wide matrix — the reference's nested-dict
    merge is a union + pivot. versions: {version_label: df(uniprot,
    tdl)}; output (uniprot, <one col per version>), first() per cell
    (uniprot is unique per version)."""
    parts = [
        df.select(
            F.col("uniprot"), F.lit(v).alias("version"), F.col("tdl")
        )
        for v, df in versions.items()
    ]
    allv = parts[0]
    for p in parts[1:]:
        allv = allv.unionByName(p)
    return (
        allv.groupBy("uniprot")
        .pivot("version", list(versions))
        .agg(F.first("tdl"))
    )


def _grouped_list(df: DataFrame, key: str, struct_cols: list[str], alias: str):
    return df.groupBy(key).agg(
        F.collect_list(F.struct(*struct_cols)).alias(alias)
    )


def target_documents(
    lake: dict[str, DataFrame], target_ids: list[int] | None = None
) -> DataFrame:
    """The nested 'target document' — get_target(include_annotations=
    True) for EVERY target in one plan (`loaders/TCRD.py:1857-1951` +
    get_protein `:1953-2125`). ~20 point-queries per entity become ~8
    grouped joins; xrefs arrive as a map type→list like the adaptor's
    dict-of-lists (`:1988-1998`)."""
    ent = entity(lake).withColumnRenamed("protein_id", "pid")
    base = ent.select(
        "target_id", "target_name", "ttype", "tdl", "idg", "fam",
        F.col("pid").alias("protein_id"), "uniprot", "sym", "geneid",
        "stringid",
    )
    if target_ids is not None:
        base = base.filter(F.col("target_id").isin(target_ids))

    # per-protein nested annotation arrays
    infos = dereference(lake["tdl_info"], lake["info_type"]).select(
        "protein_id", "itype", "value"
    )
    tdl_infos = infos.groupBy("protein_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("itype", "value")))
        ).alias("tdl_infos")
    )
    aliases = _grouped_list(
        lake["alias"].select("protein_id", "type", "value"),
        "protein_id", ["type", "value"], "aliases",
    )
    # xrefs grouped by type into a map of value-lists (TCRD.py:1988-1998)
    xrefs = (
        lake["xref"]
        .filter(F.col("protein_id").isNotNull())
        .groupBy("protein_id", "xtype")
        .agg(F.array_sort(F.collect_list("value")).alias("vals"))
        .groupBy("protein_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("xtype", "vals")))
            ).alias("xrefs")
        )
    )
    goas = _grouped_list(
        lake["goa"].select("protein_id", "go_id", "go_term", "evidence"),
        "protein_id", ["go_id", "go_term", "evidence"], "goas",
    )
    exprs = _grouped_list(
        lake["expression"].select(
            "protein_id", "etype", "tissue", "qual_value", "number_value"
        ),
        "protein_id", ["etype", "tissue", "qual_value", "number_value"],
        "expressions",
    )
    # target-attached annotations
    diseases = (
        lake["disease"]
        .filter(F.col("target_id").isNotNull())
        .select("target_id", "dtype", "name", "did", "zscore")
        .groupBy("target_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("zscore", "dtype", "name", "did"))
            ).alias("_d")
        )
        # ordered by zscore DESC like `loaders/TCRD.py:1905`
        .select("target_id", F.reverse("_d").alias("diseases"))
    )
    drugs = _grouped_list(
        lake["drug_activity"].select(
            "target_id", "drug", "has_moa", "act_value", "act_type"
        ),
        "target_id", ["drug", "has_moa", "act_value", "act_type"],
        "drug_activities",
    )

    out = (
        base.join(tdl_infos, "protein_id", "left")
        .join(aliases, "protein_id", "left")
        .join(xrefs, "protein_id", "left")
        .join(goas, "protein_id", "left")
        .join(exprs, "protein_id", "left")
        .join(diseases, "target_id", "left")
        .join(drugs, "target_id", "left")
    )
    return out


def export_wide_csv_df(lake: dict[str, DataFrame]) -> DataFrame:
    """tcrd2csv-style flat export (`python/tcrd2csv.py:45-47,79-270`):
    scalar columns + counts + pipe-joined lists + top-5 disease slice —
    one wide SELECT instead of per-target flattening."""
    doc = target_documents(lake)
    return doc.select(
        "target_id",
        F.col("target_name").alias("name"),
        "ttype",
        "tdl",
        "uniprot",
        "sym",
        "geneid",
        F.size(F.coalesce(F.col("aliases"), F.array())).alias("alias_count"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.coalesce(F.col("aliases"), F.array()), lambda a: a["value"]
                )
            ),
            "|",
        ).alias("aliases_pipe"),
        F.size(F.coalesce(F.col("goas"), F.array())).alias("goa_count"),
        F.size(F.coalesce(F.col("expressions"), F.array())).alias(
            "expression_count"
        ),
        # top-5 diseases by zscore desc (tcrd2csv.py:216 `[:5]`)
        F.array_join(
            F.transform(
                F.slice(F.coalesce(F.col("diseases"), F.array()), 1, 5),
                lambda d: d["name"],
            ),
            "|",
        ).alias("top5_diseases"),
        F.element_at(F.col("tdl_infos"), "JensenLab PubMed Score").alias(
            "pubmed_score"
        ),
        F.element_at(F.col("tdl_infos"), "Ab Count").alias("ab_count"),
    )
