"""GO-leaf, antibody, compound-activity, and RGD loader families
(loaders_misc), hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import _df, build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_go_leaf_flags(spark):
    from tcrd_spark.etl.loaders_misc import GO_LEAF_ITYPE, go_leaf_flags

    # DAG: GO:2 is_a GO:1, GO:3 is_a GO:1 → leaves are GO:2, GO:3.
    go_terms = spark.createDataFrame(
        [("GO:0000001", []), ("GO:0000002", ["GO:0000001"]),
         ("GO:0000003", ["GO:0000001"])],
        "term_id string, is_a array<string>",
    )
    goa = _df(spark, "goa", [
        # leaf + experimental + MF -> kept
        dict(id=1, protein_id=11, go_id="GO:0000002",
             go_term="F:kinase activity", evidence="IDA"),
        # second kept row, checks '; ' join in go_id order
        dict(id=2, protein_id=11, go_id="GO:0000003",
             go_term="P:signaling", evidence="EXP"),
        # non-leaf -> dropped
        dict(id=3, protein_id=11, go_id="GO:0000001",
             go_term="F:binding", evidence="IDA"),
        # cellular component -> dropped
        dict(id=4, protein_id=12, go_id="GO:0000002",
             go_term="C:nucleus", evidence="IDA"),
        # non-experimental evidence -> dropped
        dict(id=5, protein_id=12, go_id="GO:0000002",
             go_term="F:kinase activity", evidence="IEA"),
    ])
    out = go_leaf_flags(goa, go_terms).collect()
    assert len(out) == 1
    r = out[0]
    assert r.protein_id == 11 and r.itype == GO_LEAF_ITYPE
    assert r.string_value == (
        "GO:0000002|F:kinase activity|IDA; GO:0000003|P:signaling|EXP"
    )


def test_antibodypedia(spark, lake, tmp_path):
    tsv = tmp_path / "abp.tsv"
    tsv.write_text(
        "U00001\t120\t5\thttps://www.antibodypedia.com/gene/1/SYM1\n"
        "U00002\t0\t0\t\n"
        "UNKNOWN\t9\t1\tx\n"
    )
    from tcrd_spark.etl.loaders_misc import (
        AB_ITYPE, ABURL_ITYPE, MAB_ITYPE, load_antibodypedia,
    )

    out = load_antibodypedia(spark, str(tsv), lake["protein"])
    rows = {(r.protein_id, r.itype): r for r in out.collect()}
    assert rows[(11, AB_ITYPE)].integer_value == 120
    assert rows[(11, MAB_ITYPE)].integer_value == 5
    assert rows[(11, ABURL_ITYPE)].string_value.endswith("SYM1")
    assert rows[(12, AB_ITYPE)].integer_value == 0
    # empty url column parses as NULL -> no URL row for protein 12
    assert (12, ABURL_ITYPE) not in rows
    assert not any(pid not in (11, 12) for pid, _ in rows)


def _gtopdb_interaction_row(sym, uniprot, ligand_id, act_value, act_type,
                            pmids=""):
    row = [""] * 37
    row[2], row[3], row[13] = sym, uniprot, str(ligand_id)
    row[26], row[28], row[36] = act_value, act_type, pmids
    return ",".join(row)


def test_gtopdb(spark, lake, tmp_path):
    ligands = tmp_path / "ligands.csv"
    lig_rows = [
        ["1", "acetylcholine"] + [""] * 7 + ["1903"] + [""] * 4 + ["CC(=O)OCC"],
        ["2", "mab-x"] + ["", "Antibody"] + [""] * 5 + [""] + [""] * 4 + [""],
        ["3", "pep-y"] + ["", "Peptide"] + [""] * 5 + [""] + [""] * 4 + [""],
    ]
    # fix type column position: index 3 is 'type'
    lig_rows[0] = ["1", "acetylcholine", "", "Metabolite", "", "", "", "", "",
                   "1903", "", "", "", "", "CC(=O)OCC"]
    header = ",".join(f"h{i}" for i in range(15))
    ligands.write_text(
        header + "\n" + "\n".join(",".join(r) for r in lig_rows) + "\n"
    )
    inter = tmp_path / "interactions.csv"
    hdr = ",".join(f"c{i}" for i in range(37))
    inter.write_text("\n".join([
        hdr,
        _gtopdb_interaction_row("SYM1", "U00001", 1, "7.5", "pKi", "123|456"),
        _gtopdb_interaction_row("SYM2", "U00002", 1, "", "pKi"),       # no act
        _gtopdb_interaction_row("SYM3", "U00003|U00004", 1, "5", "pKi"),  # multi
        _gtopdb_interaction_row("NOPE", "UNKNOWN", 1, "6.1", "pIC50"),  # notfnd
        _gtopdb_interaction_row("SYM5", "U00005", 2, "4.0", "pKd"),    # ab ligand
    ]) + "\n")
    from tcrd_spark.etl.loaders_misc import load_gtopdb

    out = load_gtopdb(spark, str(ligands), str(inter),
                      lake["protein"], lake["t2tc"])
    rows = out.cmpd_activity.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.target_id == 1 and r.catype == "Guide to Pharmacology"
    assert r.cmpd_name_in_src == "acetylcholine"
    assert r.act_value == 7.5 and r.act_type == "pKi"
    assert r.pubmed_ids == "123|456" and r.cmpd_pubchem_cid == 1903
    assert out.skipped_ligands == 2
    assert out.skipped_rows == 2          # no-activity + multi-uniprot
    assert out.notfnd.count() == 1


def test_fill_pubchem_cids(spark, tmp_path):
    unichem = tmp_path / "unichem.tsv"
    unichem.write_text(
        "From src:'1'\tTo src:'22'\n"
        "CHEMBL25\t2244\n"
        "CHEMBL99\t9999\n"
    )
    cmpd = _df(spark, "cmpd_activity", [
        dict(id=1, target_id=1, catype="ChEMBL", cmpd_id_in_src="CHEMBL25"),
        dict(id=2, target_id=2, catype="ChEMBL", cmpd_id_in_src="CHEMBLX"),
        dict(id=3, target_id=3, catype="Guide to Pharmacology",
             cmpd_id_in_src="CHEMBL25", cmpd_pubchem_cid=777),
    ])
    from tcrd_spark.etl.loaders_misc import fill_pubchem_cids

    out = {r.id: r for r in fill_pubchem_cids(spark, str(unichem), cmpd).collect()}
    assert out[1].cmpd_pubchem_cid == 2244     # filled from the map
    assert out[2].cmpd_pubchem_cid is None     # unmapped ChEMBL id
    assert out[3].cmpd_pubchem_cid == 777      # non-ChEMBL untouched


def test_rgd(spark, tmp_path):
    qtl = tmp_path / "rat_qtls.tsv"
    qtl.write_text(
        "rgdid\tnhprotein_id\tqtl_rgdid\tqtl_symbol\tqtl_name\tlod\t"
        "p_value\ttrait_name\tmeasurement_type\tassociated_disease\tphenotype\n"
        "61958\t2\t1302\tBp6\tBlood pressure QTL 6\t5.4\tNone\t"
        "arterial blood pressure\tblood pressure\tHypertension\tNone\n"
    )
    terms = tmp_path / "rat_terms.tsv"
    terms.write_text(
        "rgdid\tterm_id\tobj_symbol\tterm_name\tqualifier\tevidence\tontology\n"
        "61958\tDOID:10763\tKit\thypertension\tNone\tIAGP\t"
        "Disease Ontology\n"
    )
    from tcrd_spark.etl.loaders_misc import load_rgd

    out = load_rgd(spark, str(qtl), str(terms))
    q = out.rat_qtl.first()
    assert q.nhprotein_id == 2 and q.qtl_symbol == "Bp6"
    assert q.lod == 5.4 and q.p_value is None        # 'None' scrubbed
    assert q.phenotype is None
    t = out.rat_term.first()
    assert t.term_id == "DOID:10763" and t.qualifier is None
    assert t.evidence == "IAGP" and t.ontology == "Disease Ontology"


def test_compact_table_plain_and_partitioned(spark, tmp_path):
    """compact_table collapses a many-small-file table (the streaming
    sink shape) into few files while preserving rows and, for
    partitioned tables, the partition directory layout."""
    import glob
    import os

    from pyspark.sql import functions as F

    from tcrd_spark.sources.lake import compact_table

    # plain table: 40 tiny files
    p1 = str(tmp_path / "plain")
    spark.range(4000).repartition(40).write.parquet(p1)
    r1 = compact_table(spark, p1, target_bytes_per_file=1 << 30)
    assert r1["files_before"] >= 40
    assert r1["files_after"] == 1
    assert spark.read.parquet(p1).count() == 4000
    assert not os.path.exists(p1 + ".__compact__")
    assert not os.path.exists(p1 + ".__old__")

    # partitioned table: many files per partition → few, layout kept
    p2 = str(tmp_path / "parts")
    df = spark.range(3000).select(
        F.pmod(F.col("id"), 3).alias("cell_id"), F.col("id").alias("v")
    )
    for _ in range(5):  # five appends = five files per partition
        df.coalesce(1).write.mode("append").partitionBy("cell_id").parquet(p2)
    r2 = compact_table(
        spark, p2, partition_col="cell_id", target_bytes_per_file=1 << 30
    )
    assert r2["files_before"] >= 15
    assert r2["files_after"] <= 3  # at most one per partition here
    back = spark.read.parquet(p2)
    assert back.count() == 15000
    assert sorted(
        os.path.basename(d)
        for d in glob.glob(p2 + "/cell_id=*")
    ) == ["cell_id=0", "cell_id=1", "cell_id=2"]
