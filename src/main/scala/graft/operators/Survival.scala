package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Kaplan–Meier survival estimation with right-censoring — the
  * churn/retention curve done properly: users still active when the
  * observation window closes are CENSORED, not counted as churned
  * (the naive "retention = fraction still here" curve silently treats
  * them as deaths and biases every estimate downward).
  *
  * Input: one row per subject, (t, event) — duration and whether the
  * terminal event was OBSERVED (true) or the subject was censored at t
  * (false). S(t) = Π_{s ≤ t} (1 − d_s/n_s), with the standard
  * convention that deaths at t precede censorings at t (both count in
  * the at-risk set n_t).
  *
  * Scale shape: one groupBy collapses subjects to the DURATION domain
  * (days/weeks — bounded); the at-risk counts, the log-term cumulative
  * sum and the product-as-exp all run on that bounded frame. The
  * cumulative product is computed as exp(Σ ln(1 − d/n)) with each log
  * term quantized at 9 dp into decimals — order-free, engine-exact —
  * and the one subject-shaped operation is the first aggregate.
  */
object Survival {

  def kaplanMeier(subjects: DataFrame,
      domainLimit: Long = Partitioning.DefaultDomainLimit): DataFrame = {
    // duration-domain boundedness is CHECKED (requireBoundedDomain),
    // not trusted: sub-second raw timestamps as t would otherwise
    // silently single-task-sort the subject corpus in the window below
    val byT = Partitioning.requireBoundedDomain(
      subjects
        .filter(col("t").isNotNull && col("t") >= 0)
        .groupBy(col("t"))
        .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
          sum(when(!col("event"), 1L).otherwise(0L)).as("c")),
      "t", "Survival.kaplanMeier", domainLimit)
    val total = byT.agg(sum(col("d") + col("c")).as("n_total"))
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = byT.crossJoin(broadcast(total))
      .withColumn("cum_gone", sum(col("d") + col("c")).over(wCum))
      // at risk AT t: everyone not yet dead/censored strictly before t
      .withColumn("n_risk", col("n_total") - col("cum_gone") + col("d") + col("c"))
    val term9 = when(col("d") === 0L, lit(0.0))
      .when(col("d") < col("n_risk"),
        round(log(lit(1.0) - col("d").cast("double") / col("n_risk")), 9))
    withRisk
      .withColumn("t9", term9.cast(DecimalType(28, 9)))
      // d == n_risk (everyone remaining dies) → ln 0 undefined; flag
      // the collapse and pin S = 0 from that time on
      .withColumn("collapsed", max(when(col("d") === col("n_risk") &&
        col("d") > 0L, 1).otherwise(0)).over(wCum))
      .withColumn("cum9", sum(col("t9")).over(wCum))
      .select(col("t"), col("n_risk"),
        col("d").as("n_churned"), col("c").as("n_censored"),
        when(col("collapsed") === 1, lit(0.0))
          .otherwise(round(exp(col("cum9").cast("double")), 6)).as("survival"))
      .orderBy(col("t"))
  }
}
