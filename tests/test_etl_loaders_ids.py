"""Identifier-management + disease/phenotype loader families
(loaders_ids), hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import _df, build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_hgnc(spark, tmp_path):
    protein = _df(spark, "protein", [
        dict(id=1, name="P1", uniprot="U1", sym="AAA", geneid=100),
        dict(id=2, name="P2", uniprot="U2", sym=None, geneid=None),
        dict(id=3, name="P3", uniprot="U3", sym="CCC", geneid=300),
    ])
    tsv = tmp_path / "hgnc.tsv"
    tsv.write_text(
        "HGNC ID\tApproved symbol\tApproved name\tStatus\tUniProt ID\t"
        "NCBI Gene ID\tMouse genome database ID\n"
        # resolves by sym; geneid 999 != 100 -> geneid discrepancy
        "HGNC:1\tAAA\talpha\tApproved\tU1\t999\tMGI:11\n"
        # no sym match; resolves by uniprot; fills sym+geneid
        "HGNC:2\tBBB\tbeta\tApproved\tU2\t200\t\n"
        # resolves by geneid; sym DDD != CCC -> sym discrepancy
        "HGNC:3\tDDD\tdelta\tApproved\tUX\t300\t\n"
        "HGNC:4\tZZZ\tzeta\tApproved\tUZ\t400\t\n"      # notfnd
    )
    from tcrd_spark.etl.loaders_ids import load_hgnc

    out = load_hgnc(spark, str(tsv), protein)
    xr = {(r.protein_id, r.xtype, r.value) for r in out.xref.collect()}
    assert (1, "HGNC", "HGNC:1") in xr and (1, "MGI ID", "MGI:11") in xr
    assert (2, "HGNC", "HGNC:2") in xr
    assert not any(x[1] == "MGI ID" and x[0] == 2 for x in xr)
    prot = {r.id: r for r in out.protein.collect()}
    assert prot[2].sym == "BBB" and prot[2].geneid == 200   # filled
    assert prot[1].sym == "AAA" and prot[1].geneid == 100   # not overwritten
    assert prot[3].sym == "CCC"
    sd = out.sym_discrepancies.collect()
    assert len(sd) == 1 and sd[0].protein_id == 3 and sd[0].hgnc_sym == "DDD"
    gd = out.geneid_discrepancies.collect()
    assert len(gd) == 1 and gd[0].protein_id == 1 and gd[0].hgnc_geneid == 999
    assert out.notfnd.count() == 1


def test_stringids(spark, tmp_path):
    protein = _df(spark, "protein", [
        dict(id=1, name="AAA_HUMAN", uniprot="U1", geneid=100),
        dict(id=2, name="BBB_HUMAN", uniprot="U2", geneid=200),
        dict(id=3, name="CCC_HUMAN", uniprot="U3", geneid=300),
        dict(id=4, name="DDD_HUMAN", uniprot="U4", geneid=400,
             stringid="9606.ENSPKEEP"),
        dict(id=5, name="EEE_HUMAN", uniprot="U5", geneid=500),
    ])
    match = tmp_path / "match.tsv"
    match.write_text(
        # identity != 100 -> ignored entirely
        "x\tU9|XXX_HUMAN\t9606.ENSP00000009\t95\t700\n"
        # U1 maps twice; higher bitscore ENSP00000002 wins
        "x\tU1|AAA_HUMAN\t9606.ENSP00000001\t100\t500\n"
        "x\tU1|AAA_HUMAN\t9606.ENSP00000002\t100\t800\n"
    )
    alias = tmp_path / "alias.tsv"
    alias.write_text(
        # adds a name-keyed mapping for protein 2
        "9606.ENSP00000003\tBBB_HUMAN\tBLAST_UniProt_ID\n"
        # conflicts with the match winner for AAA_HUMAN
        "9606.ENSP00000001\tAAA_HUMAN\tBLAST_UniProt_ID\n"
        # geneid-keyed mapping for protein 3
        "9606.ENSP00000004\t300\tEnsembl_UniProt\n"
    )
    from tcrd_spark.etl.loaders_ids import load_stringids

    out = load_stringids(spark, str(match), str(alias), protein)
    prot = {r.id: r.stringid for r in out.protein.collect()}
    assert prot[1] == "9606.ENSP00000002"     # best bitscore via uniprot
    assert prot[2] == "9606.ENSP00000003"     # alias file via name
    assert prot[3] == "9606.ENSP00000004"     # alias file via geneid
    assert prot[4] == "9606.ENSPKEEP"         # existing kept
    assert prot[5] is None
    assert {r.alias for r in out.conflicts.collect()} == {"AAA_HUMAN"}
    assert {r.id for r in out.unmatched.collect()} == {5}


def test_tf_flags(spark, lake, tmp_path):
    csv = tmp_path / "tfs.csv"
    header = "Ensembl ID,HGNC symbol,DBD,Is TF?,a,b,c,d,e,EntrezGene ID\n"
    csv.write_text(
        header
        + "ENSG1,SYM1,Homeodomain,Yes,,,,,,101\n"
        + "ENSG2,NOSYM,ZF,Yes,,,,,,102\n"        # sym miss -> geneid hit
        + "ENSG3,SYM3,ZF,No,,,,,,103\n"          # not a TF: skipped
        + "ENSG4,NOPE,ZF,Yes,,,,,,999\n"         # notfnd
    )
    from tcrd_spark.etl.loaders_ids import TF_ITYPE, load_tf_flags

    out = load_tf_flags(spark, str(csv), lake["protein"])
    rows = {r.protein_id: r for r in out.tdl_info.collect()}
    assert set(rows) == {11, 12}
    assert all(r.itype == TF_ITYPE and r.boolean_value is True
               for r in rows.values())
    assert out.skipped == 1 and out.notfnd.count() == 1


def test_ctd_diseases(spark, lake, tmp_path):
    # fixture do_xref: DOID:9352 has MESH xref D003924 (see fixtures);
    # build a second DOID sharing the same MESH id to check fan-out.
    do_xref = _df(spark, "do_xref", [
        dict(doid="DOID:9352", db="MESH", value="D003924"),
        dict(doid="DOID:0001", db="MESH", value="D003924"),
        dict(doid="DOID:0002", db="OMIM", value="222100"),
    ])
    csv = tmp_path / "ctd.csv"
    csv.write_text(
        "# comment line,,,,\n"
        "SYM1,101,diabetes,MESH:D003924,marker/mechanism\n"
        "SYM2,102,rare,MESH:D999999,therapeutic\n"       # unmapped MESH
        "SYM3,103,nodirect,MESH:D003924,\n"              # no evidence: skip
    )
    from tcrd_spark.etl.loaders_ids import load_ctd_diseases

    out = load_ctd_diseases(spark, str(csv), lake["protein"], do_xref)
    rows = {(r.protein_id, r.did) for r in out.disease.collect()}
    # MESH:D003924 fans out to both DOIDs; unmapped keeps accession
    assert rows == {(11, "DOID:9352"), (11, "DOID:0001"),
                    (12, "MESH:D999999")}
    assert out.disease.first().dtype == "CTD"
    assert out.skipped == 1


def test_disgenet(spark, lake, tmp_path):
    tsv = tmp_path / "disgenet.tsv"
    tsv.write_text(
        "geneid\tsym\tdid\tname\tscore\tsource\n"
        "101\tSYM1\tC0004096\tAsthma\t0.4\t CTD_human \n"
        "999\tNOPE\tC0011849\tDiabetes\t0.3\tBEFREE\n"
    )
    from tcrd_spark.etl.loaders_ids import load_disgenet

    out = load_disgenet(spark, str(tsv), lake["protein"])
    rows = out.disease.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.protein_id, r.dtype, r.did, r.score, r.source) == (
        11, "DisGeNET", "C0004096", 0.4, "CTD_human")   # source trimmed
    assert out.notfnd.count() == 1


def test_jax_phenotypes(spark, lake, tmp_path):
    mpo = _df(spark, "mpo", [
        dict(mpid="MP:0001", name="abnormal gait"),
        dict(mpid="MP:0002", name="small heart"),
    ])
    tsv = tmp_path / "hmd.rpt"
    tsv.write_text(
        "SYM1\t101\tm1\tx\ty\tz\tMP:0001 MP:0002\n"
        "SYM2\t102\tm2\tx\ty\tz\t\n"                    # no terms: skip
        "NOPE\t999\tm3\tx\ty\tz\tMP:0001\n"             # notfnd
    )
    from tcrd_spark.etl.loaders_ids import JAX_PTYPE, load_jax_phenotypes

    out = load_jax_phenotypes(spark, str(tsv), lake["protein"], mpo)
    rows = {(r.protein_id, r.term_id, r.term_name)
            for r in out.phenotype.collect()}
    assert rows == {(11, "MP:0001", "abnormal gait"),
                    (11, "MP:0002", "small heart")}
    assert out.phenotype.first().ptype == JAX_PTYPE
    assert out.skipped == 1 and out.notfnd.count() == 1


def test_lincs(spark, lake, tmp_path):
    csv = tmp_path / "lincs.csv"
    csv.write_text(
        "101,1.5,DC1,CCO,A375\n"
        "101,-0.7,DC2,CCN,MCF7\n"
        "999,2.0,DC3,CCC,PC3\n"
    )
    from tcrd_spark.etl.loaders_ids import load_lincs

    out = load_lincs(spark, str(csv), lake["protein"])
    rows = {(r.protein_id, r.cellid, r.zscore) for r in out.lincs.collect()}
    assert rows == {(11, "A375", 1.5), (11, "MCF7", -0.7)}
    assert out.notfnd.count() == 1
    # output plan repartitions on the downstream join key
    plan = out.lincs._jdf.queryExecution().optimizedPlan().toString()
    assert "protein_id" in plan and "RepartitionByExpression" in plan
