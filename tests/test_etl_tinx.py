"""TIN-X lifecycle-C pipeline from raw files (FIXTURES.md §B1, §C-D2):
junk-line skip, stringid→STRING-xref fallback resolution, DO
membership semi-join, and hand-computed novelty/importance/rank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.tcrd_fixtures import build_lake

OBO = """format-version: 1.2

[Term]
id: DOID:1
name: disease one

[Term]
id: DOID:2
name: disease two
"""


@pytest.fixture(scope="module")
def lake(spark):
    return build_lake(spark)


def test_tinx_pipeline(spark, lake, tmp_path):
    pmf = tmp_path / "protein_mentions.tsv"
    # P11 (stringid 9606.ENSP00000001) in pmids 1,2,3; P12 in 2,3;
    # P13 via STRING-xref fallback in 3; junk + unknown lines
    pmf.write_text(
        "ENSP00000001\t1 2 3\n"
        "ENSP00000002\t2 3\n"
        "ENSPALT00013\t3\n"          # resolves via xref STRING fallback
        "XXXJUNK\t9\n"               # non-ENSP: skipped before resolve
        "ENSP99999999\t4\n"          # unknown: notfnd
    )
    dmf = tmp_path / "disease_mentions.tsv"
    dmf.write_text(
        "DOID:1\t1 2\n"
        "DOID:2\t3\n"
        "DOID:9999\t2\n"             # not in DO: notfnd
    )
    obo = tmp_path / "doid.obo"
    obo.write_text(OBO)

    xref_plus = lake["xref"].unionByName(
        spark.createDataFrame(
            [(99, "STRING", None, 13, "ENSPALT00013", 1)],
            "id int, xtype string, target_id int, protein_id int, "
            "value string, dataset_id int",
        ),
        allowMissingColumns=True,
    )

    from tcrd_spark.etl.tinx import run_tinx

    out = run_tinx(
        spark, str(pmf), str(dmf), str(obo), lake["protein"], xref_plus
    )
    assert out.protein_notfnd.select("ext_id").distinct().collect()[0][0] == \
        "ENSP99999999"
    assert out.disease_notfnd.select("ext_id").distinct().collect()[0][0] == \
        "DOID:9999"

    # papers: pmid1 {11}, pmid2 {11,12}, pmid3 {11,12,13}
    nov = {r.protein_id: r.novelty for r in out.novelty.collect()}
    assert nov[11] == pytest.approx(6 / 11, abs=1e-6)   # 1/(1 + 1/2 + 1/3)
    assert nov[12] == pytest.approx(1.2, abs=1e-6)      # 1/(1/2 + 1/3)
    assert nov[13] == pytest.approx(3.0, abs=1e-6)      # 1/(1/3)

    imp = {
        (r.protein_id, r.doid): r.score for r in out.importance.collect()
    }
    assert imp[(11, "DOID:1")] == pytest.approx(1.5)        # 1/1 + 1/2
    assert imp[(12, "DOID:1")] == pytest.approx(0.5)
    assert imp[(11, "DOID:2")] == pytest.approx(1 / 3, abs=1e-6)
    assert len(imp) == 5

    # (DOID:1, P11): pmid1 score 1·1 < pmid2 score 2·1 → ranks 0, 1
    ranks = {
        (r.doid, r.protein_id, r.pmid): r.rank
        for r in out.rankings.collect()
    }
    assert ranks[("DOID:1", 11, 1)] == 0
    assert ranks[("DOID:1", 11, 2)] == 1
