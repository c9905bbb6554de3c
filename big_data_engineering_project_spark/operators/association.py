"""Market-basket association mining: frequent item pairs + lift.

North-star extension (no reference analog — the reference stops at
per-key counts): co-occurrence statistics over a basket-structured
fact table, the standard first step of association-rule mining
(Agrawal & Srikant, VLDB'94 — the a-priori support prefilter below is
that paper's key pruning idea).

Pipeline shape, all exact integers until the final lift division:

1. `items`   = DISTINCT (basket, item)       — one shuffle.
2. a-priori prune: keep items with support ≥ min_item_support
   (an item below threshold cannot be in a pair above it); the
   surviving item-support table is group-cardinality-sized and is
   BROADCAST both as the semi-join pruner and as the lift lookup.
3. `pairs`   = self-join items on basket with item_a < item_b —
   shuffles on basket only; the per-basket pair fan-out is
   C(basket_size, 2), bounded by the largest basket after pruning
   (TPC-H order ≤ 7 lines → ≤ 21 pairs; a real corpus needs the
   min-support cut to bound this, which is why it is built in).
4. pair support = groupBy(item_a, item_b).count() — map-side
   partial aggregation.
5. lift(a,b) = N·supp(a,b) / (supp(a)·supp(b)) computed as ONE
   double division of exact BIGINT products — both engines evaluate
   the identical IEEE expression, so lift is hash-comparable.

Scale: no all-pairs product anywhere (pairs exist only within a
basket); the only large shuffles key on basket and on (item_a,
item_b); item stats move by broadcast. A pathologically hot ITEM
(appears in a large fraction of baskets) inflates pair fan-out
linearly, not quadratically, because it pairs only within baskets;
a pathologically hot BASKET is C(n,2) — cap upstream or raise
min_item_support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 1,
) -> DataFrame:
    """Within-basket item pairs with support and lift.

    Returns (item_a, item_b, pair_support, support_a, support_b,
    lift) with item_a < item_b; lift relative to the TOTAL basket
    count (including baskets emptied by the support prune — lift
    stays a probability ratio over the full corpus).
    """
    items = df.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    n_baskets = items.select(
        F.countDistinct("__basket").alias("__n")
    )  # 1 row
    supp = items.groupBy("__item").agg(
        F.count(F.lit(1)).cast("long").alias("__supp")
    )
    if min_item_support > 1:
        supp = supp.filter(F.col("__supp") >= min_item_support)
        items = items.join(
            F.broadcast(supp.select("__item")), "__item", "left_semi"
        )
    a = items.select(
        F.col("__basket"), F.col("__item").alias("item_a")
    )
    b = items.select(
        F.col("__basket"), F.col("__item").alias("item_b")
    )
    pairs = (
        a.join(b, "__basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_support"))
    )
    sa = supp.select(
        F.col("__item").alias("item_a"), F.col("__supp").alias("support_a")
    )
    sb = supp.select(
        F.col("__item").alias("item_b"), F.col("__supp").alias("support_b")
    )
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .withColumn(
            "lift",
            (F.col("pair_support") * F.col("__n")).cast("double")
            / (F.col("support_a") * F.col("support_b")).cast("double"),
        )
        .select(
            "item_a",
            "item_b",
            "pair_support",
            "support_a",
            "support_b",
            "lift",
        )
    )
