"""Publishing pins (sources/export.py): manifest totals match, the
round-trip read equals the source, shard→file mapping is exactly 1:1,
verification passes on pristine output, corruption / deletion /
injection are each NAMED, an empty export round-trips, and the
release gates (expectations incl. PSI drift, k-anonymity) refuse
before a byte is staged."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from tcrd_spark.sources.export import MANIFEST, export_jsonl, verify_export


def _docs(spark, sf_dir):
    from tcrd_spark.sources.lake import load_table

    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )


def _shard_files(out):
    return sorted(glob.glob(os.path.join(out, "_shard=*", "part-*")))


def _label(path):
    """data-file path → its manifest shard label."""
    k = int(os.path.basename(os.path.dirname(path)).split("=")[1])
    return f"shard-{k:05d}"


def test_export_roundtrip_and_verify(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    docs = _docs(spark, sf_dir)
    manifest = export_jsonl(spark, docs, out, "doc_id", n_shards=4)
    assert manifest["total_rows"] == docs.count()
    assert sum(s["rows"] for s in manifest["shards"].values()) == docs.count()
    back = spark.read.json(out + "/_shard=*/part-*")
    assert sorted(map(tuple, back.select(*docs.columns).collect())) == sorted(
        map(tuple, docs.collect())
    )
    assert verify_export(spark, out)["ok"]


def test_one_file_per_shard(spark, sf_dir, tmp_path):
    """The r8 ADVICE defect: hash-repartitioning N shard ids into N
    partitions collides, merging shards into one file. partitionBy
    gives the documented exact 1:1 shard→file mapping."""
    out = str(tmp_path / "pub")
    m = export_jsonl(spark, _docs(spark, sf_dir), out, "doc_id", n_shards=8)
    files = _shard_files(out)
    assert len(files) == 8 == len(m["shards"])
    assert sorted({_label(f) for f in files}) == sorted(m["shards"])
    assert all(s["rows"] > 0 for s in m["shards"].values())


def test_empty_export_roundtrips(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    docs = _docs(spark, sf_dir).where(F.lit(False))
    m = export_jsonl(spark, docs, out, "doc_id", n_shards=4)
    assert m["total_rows"] == 0 and m["shards"] == {}
    rep = verify_export(spark, out)
    assert rep["ok"] and rep["rows_ok"]


def test_tamper_detection_names_the_shard(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    export_jsonl(spark, _docs(spark, sf_dir), out, "doc_id", n_shards=4)
    path = _shard_files(out)[1]
    with open(path, "ab") as f:
        f.write(b'{"doc_id": 999999}\n')
    # drop Hadoop's local-FS .crc sidecar: on object stores (the 100 TB
    # deployment) there is none — the MANIFEST is the integrity layer
    # under test, not the local filesystem's
    crc = os.path.join(
        os.path.dirname(path), f".{os.path.basename(path)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    rep = verify_export(spark, out)
    assert not rep["ok"]
    assert rep["mismatched"] == [_label(path)]
    assert not rep["missing"] and not rep["extra"]


def test_missing_shard_detected(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    export_jsonl(spark, _docs(spark, sf_dir), out, "doc_id", n_shards=4)
    path = _shard_files(out)[0]
    os.remove(path)
    rep = verify_export(spark, out)
    assert not rep["ok"] and rep["missing"] == [_label(path)]


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


# ------------------------------------------------------ release gates


def test_k_anonymity_gate_refuses_at_risk_frame(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    docs = _docs(spark, sf_dir)
    # doc_id is unique ⇒ every quasi-class has size 1 < k
    with pytest.raises(ValueError, match="k-anonymity.*below k=5"):
        export_jsonl(
            spark, docs, out, "doc_id", n_shards=4,
            k_anon=(["doc_id"], 5),
        )
    assert not os.path.exists(out)  # refused BEFORE staging


def test_k_anonymity_gate_passes_clean_frame(spark, sf_dir, tmp_path):
    out = str(tmp_path / "pub")
    docs = _docs(spark, sf_dir)
    m = export_jsonl(
        spark, docs, out, "doc_id", n_shards=4,
        k_anon=(["lang"], 2),  # few languages, many docs each
    )
    assert m["total_rows"] == docs.count()
    assert verify_export(spark, out)["ok"]


def test_drift_gate_refuses_drifted_frame(spark, sf_dir, tmp_path):
    from tcrd_spark.quality.drift import freeze_reference, psi_max

    out = str(tmp_path / "pub")
    docs = _docs(spark, sf_dir)
    ref = freeze_reference(docs, "n_chars")
    # a length-truncated slice is exactly the drift PSI catches
    drifted = docs.where(F.col("n_chars") < 200)
    with pytest.raises(ValueError, match="psi_n_chars"):
        export_jsonl(
            spark, drifted, out, "doc_id", n_shards=4,
            expectations=[psi_max("n_chars", ref, threshold=0.25)],
        )
    assert not os.path.exists(out)
    # the undrifted frame ships through the same gate
    m = export_jsonl(
        spark, docs, out, "doc_id", n_shards=4,
        expectations=[psi_max("n_chars", ref, threshold=0.25)],
    )
    assert m["total_rows"] == docs.count()
