"""Referential-integrity audit over the lake.

The reference leans on InnoDB FK constraints plus manual repair
scripts when loads drift (`SQL/update_geneids7.sql`,
`doc/README_v6Fixes.txt`); a parquet lake has no engine-enforced FKs,
so this module makes the check a first-class declarative audit:
`fk_orphans` counts child rows whose FK value resolves to no parent
row, per declared edge — run it after any load, diff it between runs.

Scale: each edge is one left-anti join against the parent's key
column; parents here are dimension-sized (broadcast) or key-pruned
scans. The audit never materializes offending rows unless asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (child_table, fk_col, parent_table, parent_key) — the core FK edges
# of `SQL/create-TCRDv7.sql` (declared there as CONSTRAINT fk_*).
FK_EDGES: tuple[tuple[str, str, str, str], ...] = (
    ("t2tc", "target_id", "target", "id"),
    ("t2tc", "protein_id", "protein", "id"),
    ("alias", "protein_id", "protein", "id"),
    ("xref", "protein_id", "protein", "id"),
    ("xref", "target_id", "target", "id"),
    ("tdl_info", "protein_id", "protein", "id"),
    ("tdl_info", "target_id", "target", "id"),
    ("generif", "protein_id", "protein", "id"),
    ("goa", "protein_id", "protein", "id"),
    ("expression", "protein_id", "protein", "id"),
    ("drug_activity", "target_id", "target", "id"),
    ("cmpd_activity", "target_id", "target", "id"),
    ("disease", "target_id", "target", "id"),
    ("phenotype", "protein_id", "protein", "id"),
    ("pathway", "protein_id", "protein", "id"),
    ("pmscore", "protein_id", "protein", "id"),
    ("protein2pubmed", "protein_id", "protein", "id"),
    ("protein2pubmed", "pubmed_id", "pubmed", "id"),
    ("kegg_distance", "pid1", "protein", "id"),
    ("kegg_distance", "pid2", "protein", "id"),
    ("kegg_nearest_tclin", "protein_id", "protein", "id"),
    ("kegg_nearest_tclin", "tclin_id", "protein", "id"),
    ("tdl_update_log", "target_id", "target", "id"),
    ("provenance", "dataset_id", "dataset", "id"),
)


def fk_orphans(
    lake: dict[str, DataFrame],
    edges: tuple[tuple[str, str, str, str], ...] = FK_EDGES,
) -> DataFrame:
    """One row per FK edge present in the lake: child table, fk
    column, parent table, and the count of non-null child FK values
    with no matching parent row. 0 everywhere = clean lake.

    All edges audit in ONE plan (a union of per-edge anti-join
    counts), so the whole audit is a single action — one job wave
    across the cluster instead of one sequential job per edge (E jobs
    dominated the audit's wall-clock; at scale each would be its own
    full scan round-trip)."""
    from functools import reduce

    spark = next(iter(lake.values())).sparkSession
    per_edge = []
    for child, fk, parent, key in edges:
        if child not in lake or parent not in lake:
            continue
        cdf = lake[child]
        if fk not in cdf.columns:
            continue
        per_edge.append(
            cdf.filter(F.col(fk).isNotNull())
            .select(F.col(fk).alias(key))
            .join(lake[parent].select(key), key, "left_anti")
            .agg(F.count("*").alias("orphan_ct"))
            .select(
                F.lit(child).alias("child_table"),
                F.lit(fk).alias("fk_col"),
                F.lit(parent).alias("parent_table"),
                "orphan_ct",
            )
        )
    if not per_edge:
        return spark.createDataFrame(
            [],
            "child_table string, fk_col string, parent_table string, "
            "orphan_ct long",
        )
    return reduce(lambda a, b: a.unionByName(b), per_edge)


def assert_clean(lake: dict[str, DataFrame]) -> None:
    """Raise with the offending edges if any FK orphans exist — the
    load-time guard a pipeline calls after writing new tables."""
    bad = [
        (r.child_table, r.fk_col, r.orphan_ct)
        for r in fk_orphans(lake).collect()
        if r.orphan_ct > 0
    ]
    if bad:
        raise AssertionError(f"FK orphans: {bad}")
