"""Publishing pins (sources/export.py): manifest totals match, the
round-trip read equals the source, verification passes on pristine
output, and corruption / deletion / injection are each NAMED."""

from __future__ import annotations

import json
import os

from tcrd_spark.sources.export import MANIFEST, export_jsonl, verify_export


def _docs(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )


def test_export_roundtrip_and_verify(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    docs = _docs(spark, sf_dir)
    manifest = export_jsonl(spark, docs, out, "doc_id", n_shards=4)
    assert manifest["total_rows"] == docs.count()
    assert sum(s["rows"] for s in manifest["shards"].values()) == docs.count()
    back = spark.read.json(out + "/part-*")
    assert sorted(map(tuple, back.select(*docs.columns).collect())) == sorted(
        map(tuple, docs.collect())
    )
    assert verify_export(spark, out)["ok"]


def test_tamper_detection_names_the_shard(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    export_jsonl(spark, _docs(spark, sf_dir), out, "doc_id", n_shards=4)
    shard = sorted(
        f for f in os.listdir(out) if f.startswith("part-")
    )[1]
    with open(os.path.join(out, shard), "ab") as f:
        f.write(b'{"doc_id": 999999}\n')
    # drop Hadoop's local-FS .crc sidecar: on object stores (the 100 TB
    # deployment) there is none — the MANIFEST is the integrity layer
    # under test, not the local filesystem's
    crc = os.path.join(out, f".{shard}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    rep = verify_export(spark, out)
    assert not rep["ok"]
    assert rep["mismatched"] == [shard]
    assert not rep["missing"] and not rep["extra"]


def test_missing_shard_detected(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    export_jsonl(spark, _docs(spark, sf_dir), out, "doc_id", n_shards=4)
    shard = sorted(f for f in os.listdir(out) if f.startswith("part-"))[0]
    os.remove(os.path.join(out, shard))
    rep = verify_export(spark, out)
    assert not rep["ok"] and rep["missing"] == [shard]


def test_deterministic_membership(spark, sf_dir, tmp_path):
    """Same input ⇒ same shard membership and order ⇒ same hashes."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs = _docs(spark, sf_dir)
    ma = export_jsonl(spark, docs, a, "doc_id", n_shards=4)
    mb = export_jsonl(spark, docs.orderBy("lang"), b, "doc_id", n_shards=4)
    assert [s["sha256"] for s in ma["shards"].values()] == [
        s["sha256"] for s in mb["shards"].values()
    ]
    with open(os.path.join(a, MANIFEST)) as f:
        assert json.load(f)["total_rows"] == ma["total_rows"]
