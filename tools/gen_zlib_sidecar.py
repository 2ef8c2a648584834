"""Regenerate tests/fixtures/zlib_sidecar.parquet — the committed
fixture behind the `compressibility_buckets` adjudicated query
(pipeline/compressibility.py, VERDICT r9 #6).

One row per DISTINCT document text across every testdata SF:
(text_md5, zlib_bytes) with zlib level PINNED at
compressibility.LEVEL. Keyed by content hash, not (sf, doc_id), so
one sidecar serves sf0.001 local checks AND the driver's sf0.01
adjudication; ~6k rows / a few hundred KB committed.

Rerun only if the driver regenerates the documents tables:
    python tools/gen_zlib_sidecar.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tcrd_spark.pipeline.compressibility import LEVEL, _SIDECAR  # noqa: E402

TESTDATA = "/root/testdata"


def main() -> None:
    seen: dict[str, int] = {}
    con = duckdb.connect()
    for sf in sorted(os.listdir(TESTDATA)):
        p = os.path.join(TESTDATA, sf, "documents.parquet")
        if not os.path.exists(p):
            continue
        rows = con.execute(
            f"SELECT DISTINCT text FROM read_parquet('{p}') "
            "WHERE text IS NOT NULL AND octet_length(encode(text)) > 0"
        ).fetchall()
        for (t,) in rows:
            b = t.encode("utf-8")
            h = hashlib.md5(b).hexdigest()
            if h not in seen:
                seen[h] = len(zlib.compress(b, LEVEL))
    tbl = pa.table({
        "text_md5": list(seen),
        "zlib_bytes": pa.array(seen.values(), pa.int64()),
    })
    pq.write_table(tbl, _SIDECAR)
    print(f"{len(seen)} distinct texts -> {_SIDECAR}")


if __name__ == "__main__":
    main()
