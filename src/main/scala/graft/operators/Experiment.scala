package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment analysis over the event stream: deterministic hash
  * bucketing into variants and the two-proportion z-test on
  * conversion — the readout every data-collection A/B (new crawler
  * config, new filter threshold) ends with.
  *
  * Assignment is a CONTENT hash (md5 of the unit id + experiment
  * salt), not rand(): replayable across runs and engines, and
  * re-salting gives an independent assignment. The hex-string
  * comparison ('0'–'7' → A, ~50/50) is engine-portable — the oracle
  * replays it character-for-character.
  *
  * Scale shape: one dedup-to-unit aggregation (user → converted flag,
  * map-side combinable max) + one variant aggregation (2 rows) — a
  * single shuffle on user_id at any corpus size; the z arithmetic
  * runs on the 2-row frame.
  */
object Experiment {

  /** Per-variant conversion + pooled two-proportion z, one row.
    * A unit converts when it logs at least `minConversions` events of
    * `convertType` — the count threshold keeps the metric meaningful
    * on streams where nearly every unit eventually logs one.
    */
  def abTest(events: DataFrame, salt: String,
      convertType: String = "purchase", minConversions: Int = 1): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === convertType, 1L).otherwise(0L))
        >= minConversions, 1L).otherwise(0L).as("converted"))
      .withColumn("variant",
        when(substring(md5(concat_ws(":", col("user_id").cast("string"),
          lit(salt))), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
    val byVariant = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    // 2-row frame from here on: pivot the two variants side by side
    // an empty variant (tiny corpora, skewed hash) reports 0, not null
    val wide = byVariant.agg(
      coalesce(max(when(col("variant") === "A", col("n"))), lit(0L)).as("n_a"),
      coalesce(max(when(col("variant") === "A", col("conv"))), lit(0L)).as("conv_a"),
      coalesce(max(when(col("variant") === "B", col("n"))), lit(0L)).as("n_b"),
      coalesce(max(when(col("variant") === "B", col("conv"))), lit(0L)).as("conv_b"))
    wide.select(
        col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        // CaseWhen evaluates lazily — the guard keeps ANSI mode from
        // raising DIVIDE_BY_ZERO on an empty variant
        when(col("n_a") > 0L, col("conv_a").cast("double") / col("n_a")).as("p_a"),
        when(col("n_b") > 0L, col("conv_b").cast("double") / col("n_b")).as("p_b"),
        when(col("n_a") + col("n_b") > 0L,
          (col("conv_a") + col("conv_b")).cast("double") /
            (col("n_a") + col("n_b"))).as("p_pool"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(col("p_a"), 6).as("rate_a"),
        round(col("p_b"), 6).as("rate_b"),
        when(col("n_a") > 0L && col("n_b") > 0L &&
          col("p_pool") > 0.0 && col("p_pool") < 1.0,
          round((col("p_a") - col("p_b")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
          .as("z"))
  }
}
