package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — the classic product
  * question ("of the users who viewed, how many then clicked, then
  * purchased — in that order?") and, in a training-data pipeline, the
  * provenance question (ingested → cleaned → shipped). Strict
  * sequential semantics: stage k counts only if it happens strictly
  * AFTER the user's earliest completion of stage k−1 — a purchase
  * before any view is not a conversion.
  *
  * Shape at 100 TB: one filtered aggregation per stage, each keyed on
  * user_id with map-side partial `min` (the earliest-completion table
  * per stage is one row per qualifying user), chained by broadcast-or
  * shuffle equi-joins on user_id. No window over a user's full event
  * history, no event×event self-join — cost is `stages` passes over
  * the (filtered) stream. Events whose stage never matches are pruned
  * at the scan by the `event_type IN (…)` pushdown.
  */
object Funnel {

  /** The contract query's funnel, shared with the oracle SQL. */
  val funnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** The contract query's conversion window (seconds): stage k counts
    * only within this horizon of the user's stage-(k−1) completion —
    * the standard funnel definition, and what keeps the measure
    * selective on a long event history. Shared with the oracle.
    */
  val funnelWindowSeconds: Long = 21600L

  /** Per-user funnel progress for `stages` (ordered). Output: one row
    * per user who completed stage 1, with the stage-completion
    * timestamps (formatted, driver-hashable), the count of stages
    * completed, and the end-to-end conversion seconds for full
    * completions (null otherwise). All boundary comparisons run on
    * integer epoch micros — exactly replayable.
    */
  def funnel(events: DataFrame, stages: Seq[String] = funnelStages,
      windowSeconds: Long = funnelWindowSeconds): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(windowSeconds > 0, s"windowSeconds must be > 0, got $windowSeconds")
    val fmt = "yyyy-MM-dd HH:mm:ss"
    // stage 1: earliest occurrence per user
    var cur = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    // stage k: earliest occurrence strictly after the user's t(k-1)
    // and within the conversion window
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = unix_micros(col(s"t$i"))
      val next = events.filter(col("event_type") === st)
        .select(col("user_id"), col("ts"))
        .join(cur, "user_id")
        .filter(unix_micros(col("ts")) > prev &&
          unix_micros(col("ts")) <= prev + lit(windowSeconds * 1000000L))
        .groupBy(col("user_id")).agg(min(col("ts")).as(s"t${i + 1}"))
      cur = cur.join(next.select(col("user_id"), col(s"t${i + 1}")),
        Seq("user_id"), "left")
    }
    val stageCols = stages.indices.map(i => col(s"t${i + 1}"))
    val completed = stageCols.foldLeft(lit(0L)) {
      (acc, c) => acc + when(c.isNotNull, 1L).otherwise(0L)
    }
    val full = stageCols.last
    cur.select(
      col("user_id") +:
        stages.indices.map(i =>
          date_format(col(s"t${i + 1}"), fmt).as(s"t${i + 1}")) :+
        completed.as("stages_completed") :+
        when(full.isNotNull,
          (unix_timestamp(full) - unix_timestamp(col("t1"))).cast("long"))
          .as("conversion_secs"): _*)
      .orderBy(col("user_id"))
  }

  /** The funnel report: users reaching each stage — the dashboard
    * numbers; one conditional-count aggregation over [[funnel]].
    */
  def funnelSummary(events: DataFrame,
      stages: Seq[String] = funnelStages): DataFrame = {
    val aggs = stages.zipWithIndex.map { case (st, i) =>
      sum(when(col("stages_completed") >= i + 1, 1L).otherwise(0L)).as(s"n_$st")
    }
    funnel(events, stages).agg(aggs.head, aggs.tail: _*)
  }
}
