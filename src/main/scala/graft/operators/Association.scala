package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket association mining: support, confidence and lift for
  * item pairs co-occurring in the same basket — the relational
  * analogue of [[TextAnalysis.pmiCollocations]] (lift > 1 ⇔ PMI > 0),
  * and the first step of any "what moves together" curation question
  * (part types per order here; sources per dup-cluster, tags per
  * document elsewhere).
  *
  * Scale shape: baskets dedup to DISTINCT (basket, item) rows before
  * the self-join, so per-key multiplicity is bounded by the ITEM
  * domain (not basket size × duplicates); the pair join keys on the
  * basket id; pair/item/basket counts are map-side-combinable
  * aggregates over domain-bounded frames; the lift arithmetic is one
  * fixed left-to-right expression over exact counts.
  */
object Association {

  def basketLift(df: DataFrame, basket: Column, item: Column,
      minPairCount: Long = 1L): DataFrame = {
    val bi = df.select(basket.as("b"), item.as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
      .localCheckpoint() // feeds pair join (twice), item counts, N
    val n = bi.agg(countDistinct(col("b")).as("n_baskets"))
    val itemCounts = bi.groupBy(col("i")).agg(count(lit(1)).as("ni"))
    val pairs = bi.toDF("b", "item_a")
      .join(bi.toDF("b", "item_b"), "b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.toDF("item_a", "n_a"), "item_a")
      .join(itemCounts.toDF("item_b", "n_b"), "item_b")
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_baskets"), 6).as("support"),
        round(col("n_ab").cast("double") * col("n_baskets")
          / col("n_a") / col("n_b"), 6).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }
}
