"""Join operators (SURVEY.md §2.3).

Every reference join is an equi inner join or an app-level dict lookup;
here each pattern becomes a declarative DataFrame join so Catalyst picks
broadcast-hash for dim tables and shuffle-hash/sort-merge for facts, with
AQE handling skew. No collect()-side lookups anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tcrd_spark.sources.lake import load_table


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi join: salt the skewed fact side, replicate the dim
    side n_salts×, join on (key, salt).

    The reference's hub-protein joins (ppi 11.6M and lincs 84M rows
    skew toward hub proteins, `doc/README_v6.txt:1510,1985`) are the
    shape this exists for. AQE skew-join splits oversized SHUFFLE
    partitions, but cannot help when the skew shows up inside a
    broadcast-probe hot loop or a groupBy on the hot key — salting
    spreads one hot key over n_salts tasks unconditionally. Result is
    identical to `skewed.join(dim, key, how)` for inner/left/left_semi/
    left_anti only — right/full would emit one null-padded row PER SALT
    for each unmatched dim key, so those modes are rejected. The dim
    side must tolerate n_salts× replication (it is the small side by
    contract).

    Salt = pmod(hash(whole fact row), n) — deterministic (stable plans
    across retries, unlike rand()) and uniform even when one key
    dominates, since the non-key columns vary."""
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "semi", "leftsemi", "left_semi",
                   "anti", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — unmatched dim keys "
            "would duplicate n_salts times under right/full joins"
        )
    salt = F.pmod(
        F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)
    )
    salted = skewed.withColumn("_salt", salt)
    replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [key, "_salt"], how).drop("_salt")


def q_three_way_entity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The universal access path: customer ⋈ nation ⋈ region.

    Mirrors target ⋈ t2tc ⋈ protein (`SQL/create-TCRDv7.sql:2352`,
    `loaders/TCRD.py:2267-2269`). nation/region are dimension tables →
    broadcast joins, zero shuffle of the fact side.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            "c_acctbal",
        )
    )


def q_lookup_point_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """find_targets analog: resolve a small literal key set to entity rows.

    Mirrors `loaders/TCRD.py:2244-2298` (sym/uniprot/geneid → target id):
    broadcast(keys) ⋈ entity instead of N point queries.
    """
    customer = load_table(spark, sf_dir, "customer")
    keys = spark.createDataFrame(
        [("Customer#000000007",), ("Customer#000000021",), ("Customer#000000042",)],
        ["key_name"],
    )
    return (
        F.broadcast(keys)
        .join(customer, keys.key_name == customer.c_name)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left_semi (`loaders/TCRD.py:2873`, view :2352)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


def q_anti_join_notfnd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'notfnd' reporting → left_anti (`loaders/load-GTEx.py:110-118`,
    `python/TIN-X.py:141-143`): entities with no match in the other side."""
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-branch find-by-xref: branch1 ∪ branch2 → dedup
    (`loaders/TCRD.py:2300-2353`, union+set() dedup at 2338-2342)."""
    orders = load_table(spark, sf_dir, "orders")
    b1 = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b2 = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return b1.unionByName(b2).dropDuplicates()


def q_fallback_join_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized entity-resolution with fallback key chain
    (`python/TIN-X.py:136-143`: stringid → STRING xref → Ensembl xref;
    `loaders/load-JensenLabPubMedScores.py:63-101` notfnd negative cache).

    Spark form: left join on key1, coalesce with left join on key2; the
    negative cache is simply the null side of the left joins.
    """
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_name"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("sk"), "s_name"
    )
    return (
        events.join(F.broadcast(customer), events.user_id == customer.ck, "left")
        .join(F.broadcast(supplier), events.user_id == supplier.sk, "left")
        .select(
            "event_id",
            F.coalesce("c_name", "s_name", F.lit("NOTFND")).alias("resolved_name"),
        )
    )


def q_self_join_common(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-pathway self-join (`loaders/TCRD.py:2871-2883`): supplier
    pairs that ship at least one common part, via self-join on the
    bridge key with a < dedup predicate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("supp1"),
            F.col("b.l_suppkey").alias("supp2"),
        )
        .distinct()
    )


def q_bridge_m2n_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M:N bridge join + count (`loaders/TCRD.py:2067` protein2pubmed ⋈
    pubmed; `:2114` gene_attribute counts): lineitems per customer via
    the orders bridge."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey")
        .agg(F.count("*").alias("li_ct"))
    )


QUERIES = {
    "three_way_entity_join": q_three_way_entity_join,
    "lookup_point_join": q_lookup_point_join,
    "semi_join": q_semi_join,
    "anti_join_notfnd": q_anti_join_notfnd,
    "union_dedup": q_union_dedup,
    "fallback_join_cascade": q_fallback_join_cascade,
    "self_join_common": q_self_join_common,
    "bridge_m2n_join": q_bridge_m2n_join,
}

ORACLE = {
    "three_way_entity_join": """
        SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name,
               c_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "lookup_point_join": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_name IN ('Customer#000000007','Customer#000000021','Customer#000000042')
    """,
    "semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    "anti_join_notfnd": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
            (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    "union_dedup": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "fallback_join_cascade": """
        SELECT e.event_id,
               coalesce(c.c_name, s.s_name, 'NOTFND') AS resolved_name
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        LEFT JOIN supplier s ON e.user_id = s.s_suppkey
    """,
    "self_join_common": """
        SELECT DISTINCT a.l_suppkey AS supp1, b.l_suppkey AS supp2
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) b
          ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    """,
    "bridge_m2n_join": """
        SELECT c_custkey, count(*) AS li_ct
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey
    """,
}
