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
  *
  * The distinct projection bounds multiplicity by the item DOMAIN —
  * fine when baskets are orders with a few dozen part types, but the
  * self-join still emits |items|² pairs PER BASKET, so one jumbo
  * basket (a crawl dump where "basket" = domain, 10⁵ items) fires
  * 10¹⁰ pairs from a single join key: the classic skew bomb. Hence
  * `maxBasketSize` — LOUD by default: a basket over the cap raises
  * in-plan (the requireBoundedDomain discipline; a silent drop would
  * diverge from any uncapped oracle with no error). Pass
  * `dropOversized = true` to exclude jumbo baskets instead (their
  * pairs are near-uninformative anyway — everything co-occurs with
  * everything in a jumbo basket, so lift ≈ support noise) and read
  * [[oversizedBaskets]] alongside so the drop is visible — the same
  * report-the-cap discipline as `dupGroups.driverEdgeLimit`.
  */
object Association {

  /** Default jumbo-basket cap: 10⁴ items → ≤10⁸ pairs worst-case from
    * one key, painful but survivable; 10⁵ would not be. */
  val DefaultMaxBasketSize = 10000

  /** The baskets a `maxBasketSize` cap would drop, with their sizes —
    * run it alongside [[basketLift]] to report what was excluded. */
  def oversizedBaskets(df: DataFrame, basket: Column, item: Column,
      maxBasketSize: Int = DefaultMaxBasketSize): DataFrame =
    df.select(basket.as("b"), item.as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
      .groupBy(col("b")).agg(count(lit(1)).as("basket_size"))
      .filter(col("basket_size") > maxBasketSize)

  def basketLift(df: DataFrame, basket: Column, item: Column,
      minPairCount: Long = 1L,
      maxBasketSize: Int = DefaultMaxBasketSize,
      dropOversized: Boolean = false): DataFrame = {
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2 (pairs need two items), got $maxBasketSize")
    // NOT spread: the distinct's map-side partial aggregation collapses
    // the stream to the small (basket, item) domain on the scan side —
    // a repartition here would shuffle the full input (plus its
    // sort-before-repartition) just to parallelize work the partial
    // aggregate makes cheap (A/B-measured round 15: spread was 1.5×
    // WORSE at bench scale)
    val raw = df.select(basket.as("b"), item.as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    // the cap acts BEFORE the self-join — the |items|² expansion
    // happens per join key, so it must bind on the input side. Default
    // is the loud path: an over-cap basket raises (the item column is
    // referenced by every downstream aggregate, so the raise cannot be
    // pruned away); dropOversized = true excludes those baskets instead
    val sizes = raw.groupBy(col("b")).agg(count(lit(1)).as("__bs"))
    val capped =
      if (dropOversized) raw.join(sizes.filter(col("__bs") <= maxBasketSize), "b")
      else raw.join(sizes, "b").withColumn("i",
        when(col("__bs") <= maxBasketSize, col("i")).otherwise(raise_error(concat(
          lit(s"basketLift: basket "), col("b"),
          lit(s" has "), col("__bs"),
          lit(s" distinct items, over maxBasketSize $maxBasketSize — its " +
            "|items|^2 pair expansion is the classic skew bomb. Raise the cap " +
            "knowingly, or pass dropOversized = true and report " +
            "oversizedBaskets alongside.")))))
    val bi = capped.drop("__bs")
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
