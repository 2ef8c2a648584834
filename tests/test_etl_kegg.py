"""End-to-end KEGG chain: KGML → kegg_distance → kegg_nearest_tclin.

Mirrors the reference's two-loader build step and its logged count
oracle (`doc/README_v6.txt:1633-1660`): unique min-merged pairs,
fan-out inserted rows, skipped/unresolved ids, and per-direction
nearest-Tclin rows with ties kept.
"""

from __future__ import annotations

import pytest

# Pathway A: chain 101→102→103, group {104,105} (clique) with a
# relation group→101.
KGML_A = """<pathway name="path:hsa00001" org="hsa" number="00001">
  <entry id="1" name="hsa:101" type="gene"/>
  <entry id="2" name="hsa:102" type="gene"/>
  <entry id="3" name="hsa:103" type="gene"/>
  <entry id="4" name="hsa:104" type="gene"/>
  <entry id="5" name="hsa:105" type="gene"/>
  <entry id="9" name="undefined" type="group">
    <component id="4"/><component id="5"/>
  </entry>
  <relation entry1="1" entry2="2" type="PPrel"/>
  <relation entry1="2" entry2="3" type="PPrel"/>
  <relation entry1="9" entry2="1" type="PPrel"/>
</pathway>"""

# Pathway B: shortcut 101→103 (min-merge beats A's distance 2),
# 101→104, and an edge into the unresolvable gene 999.
KGML_B = """<pathway name="path:hsa00002" org="hsa" number="00002">
  <entry id="1" name="hsa:101" type="gene"/>
  <entry id="3" name="hsa:103" type="gene"/>
  <entry id="4" name="hsa:104" type="gene"/>
  <entry id="7" name="hsa:999" type="gene"/>
  <relation entry1="1" entry2="3" type="PPrel"/>
  <relation entry1="1" entry2="4" type="PPrel"/>
  <relation entry1="3" entry2="7" type="PPrel"/>
</pathway>"""


@pytest.fixture(scope="module")
def chain(spark):
    from tcrd_spark.etl.kegg import kegg_chain

    # geneid 102 resolves to TWO proteins (12, 22) — the reference's
    # pids1×pids2 fan-out; 999 resolves to none (notfnd).
    protein = spark.createDataFrame(
        [(11, 101), (12, 102), (22, 102), (13, 103), (14, 104), (15, 105)],
        "id int, geneid int",
    )
    target = spark.createDataFrame(
        [(1, "Tbio"), (2, "Tbio"), (22, "Tbio"), (3, "Tclin"),
         (4, "Tclin"), (5, "Tdark")],
        "id int, tdl string",
    )
    t2tc = spark.createDataFrame(
        [(1, 11), (2, 12), (22, 22), (3, 13), (4, 14), (5, 15)],
        "target_id int, protein_id int",
    )
    return kegg_chain(spark, [KGML_A, KGML_B], protein, target, t2tc)


def test_min_merged_pairs(chain):
    pairs = {
        (r.geneid1, r.geneid2): r.distance for r in chain["pairs"].collect()
    }
    assert len(pairs) == 14  # the "unique non-zero shortest path lengths" count
    # B's direct edge wins the min-merge over A's 2-hop path
    assert pairs[("101", "103")] == 1
    # clique members reach through the group relation
    assert pairs[("104", "103")] == 3
    assert pairs[("105", "101")] == 1


def test_distance_fanout_and_notfnd(chain):
    rows = {
        (r.pid1, r.pid2): r.distance
        for r in chain["kegg_distance"].collect()
    }
    # 12 resolvable pairs; the 4 pairs touching geneid 102 fan out ×2
    assert len(rows) == 16
    assert rows[(11, 12)] == 1 and rows[(11, 22)] == 1
    assert rows[(11, 13)] == 1
    # the 2 pairs touching gene 999 are skipped; 999 is the one notfnd
    assert [r.geneid for r in chain["notfnd"].collect()] == ["999"]


def test_nearest_tclin_directions_and_ties(chain):
    rows = {
        (r.protein_id, r.direction, r.tclin_id): r.distance
        for r in chain["kegg_nearest_tclin"].collect()
    }
    assert len(rows) == 9
    # protein 11 has TWO downstream Tclins at min distance 1 — tie kept
    assert rows[(11, "downstream", 13)] == 1
    assert rows[(11, "downstream", 14)] == 1
    # fan-out proteins 12 and 22 each get the same nearest rows
    assert rows[(12, "downstream", 13)] == 1
    assert rows[(22, "downstream", 13)] == 1
    assert rows[(12, "upstream", 14)] == 2
    assert rows[(22, "upstream", 14)] == 2
    assert rows[(15, "downstream", 14)] == 1
    assert rows[(15, "upstream", 14)] == 1
    assert rows[(11, "upstream", 14)] == 1
    # Tclin proteins themselves never appear as protein_id
    assert not any(pid in (13, 14) for pid, _, _ in rows)


def test_chain_records_lineage(chain):
    ds = {r.name: r for r in chain["dataset"].collect()}
    assert set(ds) == {"KEGG Distances", "KEGG Nearest Tclins"}
    prov = {r.table_name: r.dataset_id for r in chain["provenance"].collect()}
    assert prov["kegg_distance"] == ds["KEGG Distances"].id
    assert prov["kegg_nearest_tclin"] == ds["KEGG Nearest Tclins"].id
