"""Market-basket co-occurrence: frequent item pairs and association
rules (support / confidence / lift) over order baskets.

The 2-itemset core of Apriori/FP-growth expressed relationally: one
distinct pass for baskets, one bounded self-join for pairs, two
broadcast joins for the rule statistics. The reference computes
co-membership only as graph cliques (`loaders/KEGG_Graph.py` group
expansion — see operators/graph.clique_edges); this adds the
frequency/association layer a recommender or basket-analysis workload
needs (SURVEY.md §2 aggregation-extension family).

100 TB shape: the pair self-join fans out quadratically in BASKET
size, not corpus size — baskets are short (≤7 items here; cap with a
basket-size filter when a pathological basket appears, the same
discipline as clique_expansion's BETWEEN guard). Pair counting is
map-side combinable on (a, b); item supports are a broadcast-sized
dimension (≤ |catalog| rows); the total-basket count rides a 1-row
broadcast. The support threshold prunes BEFORE the rule expansion, so
confidence/lift math runs only on frequent pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_SUP = 3  # minimum pair support (co-occurrence count)


def basket_items(df: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    """Distinct (basket, item) membership."""
    return df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()


def pair_supports(items: DataFrame, min_sup: int = MIN_SUP) -> DataFrame:
    """(item_a, item_b, pair_sup) for unordered frequent pairs,
    item_a < item_b. Fan-out is bounded by basket size."""
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    return (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_sup"))
        .filter(F.col("pair_sup") >= min_sup)
    )


def association_rules(
    df: DataFrame, basket_col: str, item_col: str, min_sup: int = MIN_SUP
) -> DataFrame:
    """(antecedent, consequent, pair_sup, sup_ant, sup_cons, conf,
    lift): both directed rules per frequent pair.

        conf(a→b) = sup(ab) / sup(a)
        lift(a→b) = conf(a→b) / (sup(b) / N)   (>1 ⇒ positive assoc.)
    """
    items = basket_items(df, basket_col, item_col)
    pairs = pair_supports(items, min_sup)
    sup = items.groupBy("item").agg(F.count("*").alias("sup"))
    n1 = items.agg(F.countDistinct("basket").alias("n_baskets"))
    rules = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_sup",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_sup",
        )
    )
    return (
        rules.join(
            F.broadcast(sup.withColumnRenamed("item", "antecedent")
                        .withColumnRenamed("sup", "sup_ant")),
            "antecedent",
        )
        .join(
            F.broadcast(sup.withColumnRenamed("item", "consequent")
                        .withColumnRenamed("sup", "sup_cons")),
            "consequent",
        )
        .crossJoin(F.broadcast(n1))
        .select(
            "antecedent",
            "consequent",
            "pair_sup",
            "sup_ant",
            "sup_cons",
            F.round(F.col("pair_sup") / F.col("sup_ant"), 6).alias("conf"),
            F.round(
                (F.col("pair_sup") / F.col("sup_ant"))
                / (F.col("sup_cons") / F.col("n_baskets")),
                6,
            ).alias("lift"),
        )
    )


# ------------------------------------------------- registered queries


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over order baskets (parts co-ordered,
    pair support ≥ 3)."""
    from tcrd_spark.sources.lake import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return association_rules(li, "l_orderkey", "l_partkey", MIN_SUP)


QUERIES = {"association_rules": q_association_rules}

ORACLE = {
    "association_rules": f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
            FROM lineitem
        ),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_sup
            FROM items a JOIN items b
              ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2
            HAVING count(*) >= {MIN_SUP}
        ),
        sup AS (SELECT item, count(*) AS sup FROM items GROUP BY 1),
        n1 AS (SELECT count(DISTINCT basket) AS n_baskets FROM items),
        rules AS (
            SELECT item_a AS antecedent, item_b AS consequent, pair_sup
            FROM pairs
            UNION ALL
            SELECT item_b, item_a, pair_sup FROM pairs
        )
        SELECT r.antecedent, r.consequent, r.pair_sup,
               sa.sup AS sup_ant, sc.sup AS sup_cons,
               round(r.pair_sup / sa.sup, 6) AS conf,
               round((r.pair_sup / sa.sup) / (sc.sup / n1.n_baskets), 6)
                   AS lift
        FROM rules r
        JOIN sup sa ON sa.item = r.antecedent
        JOIN sup sc ON sc.item = r.consequent
        CROSS JOIN n1
    """,
}
