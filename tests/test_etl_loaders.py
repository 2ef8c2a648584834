"""End-to-end loader pipelines (FIXTURES.md §B2/B3/B8, hand-computed
expectations per §C conventions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_stringdb_loader(spark, lake, tmp_path):
    # B8: header + links; one non-9606 row (skipped), one unknown ENSP
    # (notfnd). Fixture stringids are 9606.ENSP0000000{1..6} → P11..P16.
    links = tmp_path / "links.txt"
    links.write_text(
        "protein1 protein2 combined_score\n"
        "9606.ENSP00000001 9606.ENSP00000002 900\n"
        "9606.ENSP00000002 9606.ENSP00000003 150\n"
        "9606.ENSP00000001 9606.ENSP99999999 400\n"   # unknown endpoint 2
        "10090.ENSMUSP0001 9606.ENSP00000002 500\n"   # non-human: skipped
    )
    from tcrd_spark.etl.loaders import load_stringdb_ppi

    out = load_stringdb_ppi(spark, str(links), lake["protein"])
    edges = {
        (r.protein1_id, r.protein2_id, r.score)
        for r in out.ppi.collect()
    }
    assert edges == {(11, 12, 900.0), (12, 13, 150.0)}
    assert out.notfnd.count() == 1  # the unknown-endpoint row only
    assert out.ppi.schema["ppitype"].dataType.simpleString() == "string"


def test_pmscores_loader(spark, lake, tmp_path):
    # B2: ENSP<TAB>year<TAB>score over 2 proteins; P13..P16 get no rows
    # → zero-filled sums (InsZeroJLPMSs). One unknown ENSP → notfnd.
    tsv = tmp_path / "protein_counts.tsv"
    tsv.write_text(
        "ENSP00000001\t2019\t1.5\n"
        "ENSP00000001\t2020\t2.25\n"
        "ENSP00000002\t2020\t4.0\n"
        "ENSP99999999\t2020\t9.9\n"
    )
    from tcrd_spark.etl.loaders import PMSCORE_ITYPE, load_jensenlab_pmscores

    out = load_jensenlab_pmscores(spark, str(tsv), lake["protein"])
    assert out.pmscore.count() == 3
    assert out.notfnd.count() == 1
    sums = {
        r.protein_id: r.number_value
        for r in out.tdl_info.filter(F.col("itype") == PMSCORE_ITYPE).collect()
    }
    # running sum per protein (load-JensenLabPubMedScores.py:104-131)
    assert sums[11] == pytest.approx(3.75)
    assert sums[12] == pytest.approx(4.0)
    # zero-fill covers EVERY protein in the dimension
    assert set(sums) == {r.id for r in lake["protein"].select("id").collect()}
    assert sums[13] == 0.0


def test_consensus_loader(spark, lake, tmp_path):
    # B5: expression rows over 2 proteins; 'Kidney' missing from the
    # tissue map (skipped); 'liver'/'Liver' merge through lower-casing.
    tmap = tmp_path / "tissues_typed.csv"
    tmap.write_text(
        "tissue,unused,TissueType\n"
        "liver,x,Liver-Typed\n"
        "brain,x,Brain-Typed\n"
    )
    exp = spark.createDataFrame(
        [
            (11, "HPA", "Liver", "High"),
            (11, "HPM Gene", "liver", "High"),
            (11, "HPA", "Brain", "Low"),
            (11, "HPA", "Kidney", "High"),      # unmapped: skipped
            (11, "GTEx", "Liver", "Low"),       # etype not contributing
            (12, "HPM Protein", "Brain", "Medium"),
        ],
        "protein_id int, etype string, tissue string, qual_value string",
    )
    from tcrd_spark.etl.loaders import load_consensus_expressions

    out = load_consensus_expressions(spark, exp, str(tmap))
    rows = {
        (r.protein_id, r.tissue): (r.consensus_name, r.confidence)
        for r in out.collect()
    }
    # two High votes agree → mode High; support 2 → confidence 2
    assert rows[(11, "Liver-Typed")] == ("High", 2)
    # single votes → depth-0/1 rungs of the ladder
    assert rows[(11, "Brain-Typed")][0] == "Low"
    assert rows[(12, "Brain-Typed")][0] == "Medium"
    assert len(rows) == 3


def test_gtex_loader(spark, lake, tmp_path):
    # B3: GCT with 2 skip lines; 2 genes × 4 samples = 2 tissues × 2
    # subjects (one M, one F); one ENSGR row (dropped) and versioned
    # ENSG names (suffix stripped). Medians are over a single value per
    # (gene, tissue, sex) here, so levels are hand-derivable.
    gct = tmp_path / "expr.gct"
    gct.write_text(
        "#1.2\n"
        "3\t4\n"
        "Name\tDescription\tGT-AAA-0001\tGT-AAA-0002\tGT-BBB-0001\tGT-BBB-0002\n"
        "ENSG000001.5\tgeneA\t0.0\t2.0\t4.0\t8.0\n"
        "ENSG000002.1\tgeneB\t1.0\t1.0\t1.0\t1.0\n"
        "ENSGR0000999.1\tpar\t5.0\t5.0\t5.0\t5.0\n"
    )
    attrs = spark.createDataFrame(
        [
            ("GT-AAA-0001", "Liver"),
            ("GT-AAA-0002", "Brain"),
            ("GT-BBB-0001", "Liver"),
            ("GT-BBB-0002", "Brain"),
        ],
        "SAMPID string, SMTSD string",
    )
    phenos = spark.createDataFrame(
        [("GT-AAA", 1), ("GT-BBB", 2)], "SUBJID string, GENDER int"
    )
    # fixture xref: ENSG000001→P11, ENSG000002→P12 (Ensembl rows)
    xref = (
        lake["xref"]
        .filter((F.col("xtype") == "Ensembl") & F.col("protein_id").isNotNull())
        .select("protein_id", "value")
        .dropDuplicates(["value"])
    )
    from tcrd_spark.etl.loaders import load_gtex

    out = load_gtex(spark, str(gct), attrs, phenos, xref)
    rows = {
        (r.protein_id, r.tissue, r.sex): (r.qual_value, r.number_value)
        for r in out.expression.collect()
    }
    # ENSGR dropped; 2 genes × 2 tissues × 2 sexes, both ENSGs resolve
    assert len(rows) == 8
    # geneA M: Liver 0.0 → rank 0 → Not detected; Brain 2.0 → top rank
    assert rows[(11, "Liver", "M")] == ("Not detected", 0.0)
    assert rows[(11, "Brain", "M")][0] == "High"
    # geneB: all-equal nonzero values → average frac rank 0.75 → High
    assert rows[(12, "Liver", "F")][0] == "High"
    taus = {(r.protein_id, r.sex): r.tau for r in out.tau.collect()}
    assert len(taus) == 4
    # 2 tissues → bins 1,2 → tau = (1−1/2 + 1−2/2)/(2−1) = 0.5; ties
    # split across ntile bins per the documented cut2 deviation
    # (analytics/tau.py module docstring), so geneB's equal values give
    # the same 0.5, not 0
    assert taus[(11, "F")] == pytest.approx(0.5)
    assert taus[(12, "M")] == pytest.approx(0.5)


def test_hgram_loader(spark):
    from tcrd_spark.etl.loaders import load_hgram_cdfs

    ga = spark.createDataFrame(
        # type 1: counts 1,2,3 over proteins 11-13 → mu=2, sigma_pop≈0.8165
        [(11, 1)] * 1 + [(12, 1)] * 2 + [(13, 1)] * 3
        # type 2: all counts equal → sigma=0 → logistic fallback
        + [(11, 2)] * 2 + [(12, 2)] * 2,
        "protein_id int, gat_id int",
    )
    gat = spark.createDataFrame(
        [(1, "GO-BP"), (2, "Pathways")], "id int, name string"
    )
    out = {
        (r.protein_id, r.type): r for r in load_hgram_cdfs(ga, gat).collect()
    }
    import math

    r = out[(12, "GO-BP")]
    assert r.attr_count == 2 and r.mu == pytest.approx(2.0)
    assert r.sigma == pytest.approx(math.sqrt(2 / 3), abs=1e-6)
    assert r.attr_cdf == pytest.approx(0.5)         # at the mean
    # σ=0 → NaN in both the CDF and the fallback → the reference never
    # writes the row (load-HGramCDFs.py nan_ct); neither do we
    assert (11, "Pathways") not in out
    assert (12, "Pathways") not in out


def test_expression_atlas_loader(spark, tmp_path):
    from tcrd_spark.etl.loaders import load_expression_atlas

    tsv = tmp_path / "a-analytics.tsv"
    tsv.write_text(
        "gene_id\tgene_name\tcontrast\tp_value\tlog2foldchange\n"
        "ENSG1\tg1\tc1\t0.01\t2.5\n"      # kept
        "ENSG1\tg1\tc2\t0.04\t-1.5\n"     # kept, maps to same DOID → dedup
        "ENSG2\tg2\tc1\t0.2\t3.0\n"       # p too high
        "ENSG3\tg3\tc1\t0.01\t0.5\n"      # |lfc| too small
        "ENSG4\tg4\tcX\t0.01\t2.0\n"      # contrast unmapped → dropped
    )
    contrasts = spark.createDataFrame(
        [("c1", "DOID:7", "dz"), ("c2", "DOID:7", "dz")],
        "contrast string, doid string, disease string",
    )
    rows = load_expression_atlas(spark, str(tsv), contrasts).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.gene_id, r.doid, r.dtype) == ("ENSG1", "DOID:7",
                                            "Expression Atlas")
