"""Small deterministic TCRD-shaped lake for API/analytics tests
(SURVEY.md §5: the rebuild authors its own correctness harness)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tcrd_spark.schema.tables import TABLE_SCHEMAS


def _df(spark: SparkSession, table: str, rows: list[dict]) -> DataFrame:
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    schema = TABLE_SCHEMAS[table]
    dec_cols = {f.name for f in schema.fields if isinstance(f.dataType, DecimalType)}

    def conv(c, v):
        if c in dec_cols and v is not None:
            return Decimal(str(v))
        return v

    cols = [f.name for f in schema.fields]
    data = [tuple(conv(c, r.get(c)) for c in cols) for r in rows]
    return spark.createDataFrame(data, schema)


def build_lake(spark: SparkSession) -> dict[str, DataFrame]:
    """6 targets exercising every TDL branch and both xref branches."""
    targets = [
        dict(id=i, name=f"T{i}", ttype="Single Protein", idg=False)
        for i in range(1, 7)
    ]
    proteins = [
        dict(id=10 + i, name=f"P{i}", uniprot=f"U{i:05d}", sym=f"SYM{i}",
             geneid=100 + i, stringid=f"9606.ENSP{i:08d}")
        for i in range(1, 7)
    ]
    t2tc = [dict(target_id=i, protein_id=10 + i) for i in range(1, 7)]

    # T1: MoA drug -> Tclin ; T2: non-MoA drug -> Tchem ;
    # T3: cmpd activity -> Tchem ; T4: 2 dark points -> Tdark ;
    # T5: dark + efl goa -> Tbio bumped ; T6: rich -> Tbio
    drug_activity = [
        dict(id=1, target_id=1, drug="moadrug", has_moa=True),
        dict(id=2, target_id=2, drug="plaindrug", has_moa=False),
    ]
    cmpd_activity = [
        dict(id=1, target_id=3, catype="ChEMBL", cmpd_id_in_src="C1"),
    ]
    info_type = [
        dict(name="JensenLab PubMed Score", data_type="Number"),
        dict(name="Ab Count", data_type="Integer"),
        dict(name="Experimental MF/BP Leaf Term GOA", data_type="Boolean"),
        dict(name="UniProt Function", data_type="String"),
    ]
    tdl_info = []
    iid = 0
    for i in range(1, 7):
        pid = 10 + i
        pms = 2.0 if i in (4, 5) else 99.0
        ab = 10 if i in (4, 5) else 300
        iid += 1
        tdl_info.append(
            dict(id=iid, itype="JensenLab PubMed Score", protein_id=pid,
                 number_value=pms)
        )
        iid += 1
        tdl_info.append(
            dict(id=iid, itype="Ab Count", protein_id=pid, integer_value=ab)
        )
    tdl_info.append(
        dict(id=98, itype="Experimental MF/BP Leaf Term GOA",
             protein_id=15, boolean_value=True)
    )
    tdl_info.append(
        dict(id=99, itype="UniProt Function", protein_id=16,
             string_value="does things")
    )
    generif = [
        dict(id=i, protein_id=10 + i, text=f"rif {i}")
        for i in range(1, 7)
        for _ in range(1)
    ]
    # give T6 many generifs so it has > 3
    generif += [
        dict(id=100 + k, protein_id=16, text=f"extra {k}") for k in range(5)
    ]
    xref = [
        dict(id=1, xtype="Ensembl", target_id=1, value="ENSG000001",
             dataset_id=1),
        dict(id=2, xtype="Ensembl", protein_id=11, value="ENSG000001",
             dataset_id=1),  # same value through the protein branch
        dict(id=3, xtype="Ensembl", protein_id=12, value="ENSG000002",
             dataset_id=1),
        dict(id=4, xtype="HGNC", protein_id=13, value="HGNC:3", dataset_id=1),
    ]
    alias = [
        dict(id=1, protein_id=11, type="symbol", value="ALIAS1", dataset_id=1),
        dict(id=2, protein_id=12, type="uniprot", value="U-OLD-2", dataset_id=1),
    ]
    goa = [
        dict(id=1, protein_id=11, go_id="GO:1", go_term="F:kinase"),
        dict(id=2, protein_id=11, go_id="GO:2", go_term="P:signaling"),
    ]
    expression = [
        dict(id=1, etype="HPA", protein_id=11, tissue="liver",
             qual_value="High"),
        dict(id=2, etype="HPA", protein_id=11, tissue="brain",
             qual_value="Low"),
    ]
    disease = [
        dict(id=1, dtype="JensenLab Knowledge", target_id=1, name="dz-low",
             zscore=1.0),
        dict(id=2, dtype="JensenLab Knowledge", target_id=1, name="dz-high",
             zscore=5.0),
        dict(id=3, dtype="JensenLab Knowledge", target_id=1, name="dz-mid",
             zscore=3.0),
    ]
    pathway = [
        dict(id=1, protein_id=11, pwtype="KEGG", name="pw1"),
    ]
    ppi = []
    pmscore = [
        dict(id=1, protein_id=11, year=2019, score=1.5),
        dict(id=2, protein_id=11, year=2020, score=2.5),
    ]
    dataset = [dict(id=1, name="fixture", source="synthetic")]
    provenance = [
        dict(id=1, dataset_id=1, table_name="xref", column_name=None)
    ]

    rows = dict(
        target=targets, protein=proteins, t2tc=t2tc,
        drug_activity=drug_activity, cmpd_activity=cmpd_activity,
        info_type=info_type, tdl_info=tdl_info, generif=generif,
        xref=xref, alias=alias, goa=goa, expression=expression,
        disease=disease, pathway=pathway, ppi=ppi, pmscore=pmscore,
        dataset=dataset, provenance=provenance,
    )
    return {t: _df(spark, t, r) for t, r in rows.items()}
