"""Scale-up generator: replicate a TESTDATA star-schema directory R×
(default 10×, sf0.1 → "sf1") for scaling-curve benchmarks.

The driver's generator is not available, so scale-up is replication
with consistent key remapping — which preserves the base data's
schemas, per-key distributions, and join selectivities exactly while
multiplying row counts:

- region/nation stay fixed (TPC-H dims are SF-invariant).
- customer/supplier/part/orders/lineitem/events replicate with each
  copy's keys offset by copy_index * (max_base_key + 1); FK columns
  offset by the SAME constant as their parent, so every copy is a
  self-contained sub-universe and join fan-outs scale linearly.
- documents: each copy suffixes a copy tag onto every token EXCEPT the
  language-profile stopwords. Within-copy structure (exact dups,
  near-dup jaccard, language id, quality features) is preserved
  bijectively; cross-copy shingle overlap collapses to the rare
  all-stopword 3-gram, so near-dup pair counts scale linearly — the
  behavior a 10× corpus of fresh documents would show.
- embeddings: each copy applies a seeded random ORTHOGONAL rotation.
  Rotations preserve all within-copy inner products (pair structure
  identical to base), and rotated-vs-base similarities follow the same
  null distribution the base data's unrelated pairs already follow —
  matching how the driver's own generator scales (near-dup pairs grow
  ~quadratically with corpus size in the base data: 59 pairs @500
  vectors, 920 @2000).

Usage: python tools/gen_sf.py [src_dir] [dest_dir] [factor]
Defaults: /root/testdata/sf0.1  <repo>/.localdata/sf1  10
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# keep language-id and stopword-ratio features intact across copies
_PROTECT = {
    w
    for words in (
        ("the", "a", "and", "of", "to", "is"),
        ("der", "die", "das", "und", "ist", "ein"),
        ("le", "la", "et", "les", "des", "est"),
        ("el", "la", "los", "que", "y", "es"),
    )
    for w in words
}

# (table, [key columns offset by this table's own max+1],
#         {fk_col: parent_table})
RELATIONAL = [
    ("customer", ["c_custkey"], {}),
    ("supplier", ["s_suppkey"], {}),
    ("part", ["p_partkey"], {}),
    ("orders", ["o_orderkey"], {"o_custkey": "customer"}),
    (
        "lineitem",
        [],
        {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    ),
    ("events", ["event_id", "user_id"], {}),
]

_KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
}


def _replicate_relational(con, src, dest, factor):
    # per-table offset unit = max(own key / parent key) + 1
    unit: dict[str, int] = {}
    for table, keys, fks in RELATIONAL:
        path = os.path.join(src, f"{table}.parquet")
        cols = keys[:]
        if table in _KEY_OF and _KEY_OF[table] not in cols:
            cols.append(_KEY_OF[table])
        if not cols:
            unit[table] = 0
            continue
        mx = con.execute(
            f"SELECT max(greatest({', '.join(cols)})) "
            f"FROM read_parquet('{path}')"
        ).fetchone()[0]
        unit[table] = int(mx) + 1
    # events needs separate units per key column
    ev_units = {}
    for k in ("event_id", "user_id"):
        mx = con.execute(
            f"SELECT max({k}) FROM "
            f"read_parquet('{os.path.join(src, 'events.parquet')}')"
        ).fetchone()[0]
        ev_units[k] = int(mx) + 1

    for table, keys, fks in RELATIONAL:
        path = os.path.join(src, f"{table}.parquet")
        colnames = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{path}')"
            ).fetchall()
        ]
        selects = []
        for i in range(factor):
            exprs = []
            for c in colnames:
                if table == "events" and c in ev_units:
                    exprs.append(f"{c} + {i * ev_units[c]} AS {c}")
                elif c in keys or c == _KEY_OF.get(table):
                    exprs.append(f"{c} + {i * unit[table]} AS {c}")
                elif c in fks:
                    exprs.append(f"{c} + {i * unit[fks[c]]} AS {c}")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM read_parquet('{path}')"
            )
        q = " UNION ALL ".join(selects)
        out = os.path.join(dest, f"{table}.parquet")
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


def _replicate_documents(con, src, dest, factor):
    tbl = con.execute(
        "SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{os.path.join(src, 'documents.parquet')}') "
        "ORDER BY doc_id"
    ).fetchall()
    unit = max(r[0] for r in tbl) + 1
    word = re.compile(r"\S+")
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i in range(factor):
        tag = "" if i == 0 else chr(96 + i)  # a..i for copies 1..9

        def xform(m, tag=tag):
            t = m.group(0)
            return t if (not tag or t.lower() in _PROTECT) else t + tag

        for doc_id, text, lang, source in tbl:
            ids.append(doc_id + i * unit)
            t = text if not tag else word.sub(xform, text)
            texts.append(t)
            langs.append(lang)
            sources.append(source)
            n_chars.append(len(t))
    out = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    # splittable row groups: a single 50k-row group would pin every
    # downstream text scan to ONE task (Spark assigns row groups to
    # input splits) — the scaled corpus must scale scan parallelism too
    pq.write_table(out, os.path.join(dest, "documents.parquet"),
                   row_group_size=max(2000, out.num_rows // 32))
    print(f"documents: {len(ids)} rows")


def _replicate_embeddings(con, src, dest, factor):
    rows = con.execute(
        "SELECT vec_id, embedding, label FROM "
        f"read_parquet('{os.path.join(src, 'embeddings.parquet')}') "
        "ORDER BY vec_id"
    ).fetchall()
    unit = max(r[0] for r in rows) + 1
    base = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    dim = base.shape[1]
    ids, vecs, labels = [], [], []
    for i in range(factor):
        if i == 0:
            m = base
        else:
            rng = np.random.default_rng(42 + i)
            q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            m = base @ q.T
        for j, (vec_id, _vec, label) in enumerate(rows):
            ids.append(vec_id + i * unit)
            vecs.append(m[j].astype(np.float32).tolist())
            labels.append(label)
    out = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(out, os.path.join(dest, "embeddings.parquet"),
                   row_group_size=max(1000, out.num_rows // 32))
    print(f"embeddings: {len(ids)} rows")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(repo, ".localdata", "sf1")
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM "
            f"read_parquet('{os.path.join(src, t)}.parquet')) "
            f"TO '{os.path.join(dest, t)}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied (fixed dim)")
    _replicate_relational(con, src, dest, factor)
    _replicate_documents(con, src, dest, factor)
    _replicate_embeddings(con, src, dest, factor)
    print(f"done → {dest}")


if __name__ == "__main__":
    main()
