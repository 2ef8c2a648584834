"""CCLE + HPM expression loader families (loaders_expr)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import _df, build_lake


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_ccle(spark, tmp_path):
    gct = tmp_path / "ccle.gct"
    gct.write_text(
        "#1.2\n"
        "2\t2\n"
        "Name\tDescription\tHELA_CERVIX\tK562\n"
        "ENSG000100.5\tgene a\t3.5\t0.0\n"
        "ENSG000200.12\tgene b\t1.25\t7.5\n"
    )
    xref = _df(spark, "xref", [
        dict(id=1, xtype="ENSG", protein_id=21, value="ENSG000100",
             dataset_id=1),
        # fan-out: same ENSG known for two proteins (allow.cartesian)
        dict(id=2, xtype="ENSG", protein_id=22, value="ENSG000100",
             dataset_id=1),
    ])
    from tcrd_spark.etl.loaders_expr import load_ccle

    out = load_ccle(spark, str(gct), xref)
    rows = {(r.protein_id, r.cell_id, r.tissue, r.number_value)
            for r in out.expression.collect()}
    # version suffix stripped; sample split on first '_'; no-underscore
    # sample gets NULL tissue; both fan-out proteins present
    assert rows == {
        (21, "HELA", "CERVIX", 3.5), (22, "HELA", "CERVIX", 3.5),
        (21, "K562", None, 0.0), (22, "K562", None, 0.0),
    }
    assert out.expression.first().etype == "CCLE"
    assert {r.ensg for r in out.unresolved_genes.collect()} == {"ENSG000200"}


def test_hpm(spark, lake, tmp_path):
    qual = tmp_path / "hpm.tsv"
    qual.write_text(
        "RefSeq\tTissue\tx\tLogMedian\tQual\n"
        "NP_001\tLiver\t.\t2.0\tHigh\n"
        "NP_001\tBrain\t.\tNA\tNot detected\n"
        "NP_001\tUnknown Tissue\t.\t1.0\tMedium\n"
        "NP_999\tLiver\t.\t1.0\tLow\n"       # unresolvable RefSeq
    )
    xref = _df(spark, "xref", [
        dict(id=1, xtype="RefSeq", protein_id=11, value="NP_001",
             dataset_id=1),
    ])
    from tcrd_spark.etl.loaders_expr import HPM_TAU_ITYPE, load_hpm

    out = load_hpm(spark, str(qual), xref, lake)
    rows = {(r.tissue): r for r in out.expression.collect()}
    assert set(rows) == {"Liver", "Brain", "Unknown Tissue"}
    assert rows["Liver"].number_value == 2.0
    assert rows["Liver"].qual_value == "High"
    assert rows["Liver"].uberon_id == "UBERON:0002107"   # by name
    assert rows["Brain"].number_value is None            # 'NA' kept NULL
    assert rows["Brain"].uberon_id == "UBERON:0000955"
    assert rows["Unknown Tissue"].uberon_id is None
    assert {r.rs for r in out.notfnd.collect()} == {"NP_999"}
    assert {r.tissue for r in out.no_uberon.collect()} == {"Unknown Tissue"}
    taus = out.tau_tdl_info.collect()
    assert len(taus) == 1 and taus[0].itype == HPM_TAU_ITYPE
    # 3 tissues, levels: Liver=2 bins above Brain(NA->0); value-quantile
    # bins over {2.0, 1.0}: edges at 10%..90% of the two values; Liver
    # in top bin, Unknown mid, Brain 0 -> tau strictly between 0 and 1
    assert 0.0 < taus[0].number_value <= 1.0
