"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the same comparison the driver's t2 gate performs at sf0.01.

The sweep fans the ~93 queries over a thread pool: Spark schedules
concurrent jobs from multiple threads onto the same local[32] session
(py4j releases the GIL on the socket), and each worker gets its own
DuckDB cursor over the shared in-memory catalog (`con.cursor()` is the
documented multithreading pattern). Serial, this sweep alone was ~10
minutes of suite wall; pooled it rides the idle cores. Coverage is
identical — the final assertion lists every failing query with its
full problem detail."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tcrd_spark.registry import all_oracle_sql, all_queries
from tools.check import compare

QUERIES = all_queries()
ORACLE = all_oracle_sql()


def _check_one(name, spark, duck_cursor, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    spark_rows = df.collect()
    if name not in ORACLE:
        # non-SQL-expressible op: rows-only smoke (the driver's weak
        # check)
        return None if spark_rows is not None else ["no rows object"]
    res = duck_cursor.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    return compare(spark_rows, df.columns, duck_rows, duck_cols) or None


def test_all_queries_match_oracle(spark, duck, sf_dir):
    names = sorted(QUERIES)

    def run(name):
        cur = duck.cursor()
        try:
            return name, _check_one(name, spark, cur, sf_dir)
        except Exception as e:  # surface per-query, don't kill the pool
            return name, [f"exception: {e!r}"]
        finally:
            cur.close()

    with ThreadPoolExecutor(max_workers=12) as pool:
        results = list(pool.map(run, names))
    failures = {n: p for n, p in results if p}
    assert not failures, (
        f"{len(failures)}/{len(names)} queries diverge from their "
        f"oracles: {failures}"
    )


def test_salted_join_equivalence(spark, sf_dir):
    """salted_join ≡ plain equi join on a skewed fact table (one hot
    key holding most rows)."""
    from pyspark.sql import functions as F

    from tcrd_spark.operators.joins import salted_join
    from tcrd_spark.sources.lake import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    # skew: collapse 90% of rows onto one hot part key
    skewed = li.withColumn(
        "l_partkey",
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(1)).otherwise(
            F.col("l_partkey")
        ),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    plain = skewed.join(
        part, skewed.l_partkey == part.p_partkey
    ).select("l_orderkey", "l_suppkey", "p_partkey", "p_brand")
    salted = salted_join(
        skewed.withColumnRenamed("l_partkey", "p_partkey"), part, "p_partkey"
    ).select("l_orderkey", "l_suppkey", "p_partkey", "p_brand")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()
