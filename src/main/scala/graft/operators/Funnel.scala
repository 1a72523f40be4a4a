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

  /** 97.5th normal quantile — the 95% two-sided z, shared with the
    * oracle as an explicit literal.
    */
  val WilsonZ: Double = 1.959963984540054

  /** Wilson score intervals on each funnel step's conversion rate —
    * the UNCERTAINTY the bare funnelSummary rates lack (a 2/3-users
    * step and a 2000/3000 step both read "67%"; only one of them
    * means it). Wilson beats the normal approximation exactly where
    * funnels live: small counts and rates near 0 or 1, never leaving
    * [0, 1]. All arithmetic is a fixed-order double formula over the
    * exact step counts with [[WilsonZ]] (z² formed by the same
    * product both sides), so the oracle reproduces every digit.
    *
    * Shape: rides [[funnelSummary]] (per-stage min-aggs, equi-joins
    * on user_id); the CI math runs on the stages-row unpivot of its
    * single output row. Output (step, stage, n_prev, n_reached,
    * rate, ci_lo, ci_hi), 6-dp; a zero-`n_prev` step yields NULLs.
    */
  def funnelWilson(events: DataFrame,
      stages: Seq[String] = funnelStages): DataFrame = {
    require(stages.size >= 2, "funnelWilson needs at least two stages")
    val pairs = stages.sliding(2).toSeq.zipWithIndex
    val stackArgs = pairs.map { case (Seq(a, b), i) =>
      s"${i + 1}, '$b', n_$a, n_$b"
    }.mkString(", ")
    val rows = funnelSummary(events, stages).select(expr(
      s"stack(${pairs.size}, $stackArgs) AS (step, stage, n_prev, n_reached)"))
    val n = col("n_prev").cast("double")
    val k = col("n_reached").cast("double")
    val p = k / n
    val z2 = lit(WilsonZ * WilsonZ)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(WilsonZ) *
      sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n)) / denom
    rows.select(col("step").cast("int").as("step"), col("stage"),
        col("n_prev"), col("n_reached"),
        when(col("n_prev") > 0L, round(p, 6)).as("rate"),
        when(col("n_prev") > 0L, round(center - half, 6)).as("ci_lo"),
        when(col("n_prev") > 0L, round(center + half, 6)).as("ci_hi"))
      .orderBy(col("step"))
  }

  /** The contract query's retention period: one DAY of epoch-anchored
    * micros — integer floor division, bit-identical in any engine (no
    * calendar, no timezone, no week-start convention to disagree on).
    * Daily granularity keeps the triangle differentiated on the
    * synthetic history (at weekly granularity every user is active
    * every week and the table is uniformly 1.0). Shared with the
    * oracle.
    */
  val retentionPeriodMicros: Long = 86400L * 1000000L

  /** Cohort retention — the funnel's companion table: users cohorted
    * by the period of their FIRST event; cell (cohort, k) counts the
    * cohort members active again k periods later, with the retention
    * rate against the cohort size (offset 0 is the cohort size by
    * definition — every user is active in their first period).
    *
    * Shape at 100 TB: first-event table is one map-side-combined min
    * per user; the cohort join keys on user_id; the cell aggregate is
    * a two-level count-distinct on (cohort, offset) whose partial side
    * dedups (cohort, offset, user) before the exchange. The triangle
    * is periods² rows — tiny — so the rate join broadcasts.
    */
  def retention(events: DataFrame,
      periodMicros: Long = retentionPeriodMicros): DataFrame = {
    require(periodMicros > 0, s"periodMicros must be > 0, got $periodMicros")
    val first = events.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    val cells = events.select(col("user_id"), col("ts"))
      .join(first, "user_id")
      .select(col("user_id"),
        floor(unix_micros(col("first_ts")) / periodMicros).as("cohort_period"),
        (floor(unix_micros(col("ts")) / periodMicros)
          - floor(unix_micros(col("first_ts")) / periodMicros)).as("period_offset"))
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val sizes = cells.filter(col("period_offset") === 0)
      .select(col("cohort_period"), col("n_users").as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_period")
      .select(col("cohort_period"), col("period_offset"), col("n_users"),
        col("cohort_size"),
        round(col("n_users").cast("double") / col("cohort_size"), 6).as("rate"))
      .orderBy(col("cohort_period"), col("period_offset"))
  }

  /** Rolling `windowDays`-day active users — the DAU/WAU/MAU family's
    * sliding middle, reported for every day that has ≥ 1 event. The
    * naive formulation is a per-day range self-join (each day scans a
    * `windowDays`-wide slice of the whole stream: Ω(days·window) event
    * touches); a count-distinct window over RANGE INTERVAL is worse —
    * Spark materializes per-row frames and a distinct inside a moving
    * frame can't partial-aggregate.
    *
    * The scalable shape inverts it: dedup to (user, day) FIRST — one
    * map-side-combined distinct whose size is bounded by users×days,
    * not events — then each (user, day) CONTRIBUTES itself forward to
    * the `windowDays` target days it makes active (a bounded explode),
    * re-dedups, and counts per day. Every shuffle after the first is
    * on the tiny contribution table; the day filter is a broadcast
    * semi-join against the distinct active-day list.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val userDays = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val activeDays = userDays.select(col("day")).distinct()
    userDays
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("k"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("k")).as("day"))
      .distinct()
      .join(broadcast(activeDays), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n_active"))
      .orderBy(col("day"))
  }

  /** Top event-type paths: the most frequent length-`pathLen` runs of
    * consecutive events inside a session (gap-based `session_window`,
    * same sessionization as the sessions query) — the "what do users
    * actually do" view product analytics builds its flow diagrams
    * from.
    *
    * Shape at 100 TB: one shuffle on (user_id, session) — the same
    * exchange the session aggregate already pays; the per-session
    * event list is bounded by session length (activity gaps cap it),
    * sorted in-place by (ts, event_id) for a deterministic order, and
    * the path extraction is a per-row bounded transform (no
    * self-join, no lead/lag window over a user's full history). The
    * final cut is a TakeOrdered top-k on (count desc, path) — no
    * global sort.
    */
  def sessionPaths(events: DataFrame, gapSeconds: Long = 1800L,
      pathLen: Int = 3, topK: Int = 20): DataFrame = {
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    require(pathLen >= 2, s"pathLen must be >= 2, got $pathLen")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val types = events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(array_sort(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("event_type")).as("types"))
      .filter(size(col("types")) >= pathLen)
    types
      .select(explode(transform(sequence(lit(0), size(col("types")) - pathLen),
        i => concat_ws(">",
          (0 until pathLen).map(j => element_at(col("types"), i + lit(j + 1))): _*)))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(topK)
  }

  /** Signup→purchase conversion-latency quantiles — the product-health
    * companion to the funnel: for each user, seconds from their FIRST
    * signup to their first purchase at-or-after it, reduced to
    * (n_converted, p50, p90, p99). Two per-user min-aggregations and
    * one scalar quantile aggregate — no event×event self-join.
    *
    * `exact = true` (the oracle-parity default) uses Spark's exact
    * interpolated `percentile` (the established quantile_cont parity);
    * state is value→count over the latency domain in ONE global group.
    * `exact = false` (the 100 TB dial, round-7 verdict: a parameter,
    * not prose) swaps in `approx_percentile` at the given accuracy —
    * bounded sketch state for a continuous latency column; n_converted
    * stays exact in both modes.
    */
  def timeToConvert(events: DataFrame, fromType: String = "signup",
      toType: String = "purchase", exact: Boolean = true,
      approxAccuracy: Int = 10000): DataFrame = {
    def pct(p: String, alias: String) = {
      val c = if (exact) expr(s"percentile(lat, ${p}D)")
        else expr(s"approx_percentile(lat, ${p}D, $approxAccuracy)").cast("double")
      round(c, 6).as(alias)
    }
    val su = events.filter(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(col("ts")).as("su"))
    events.filter(col("event_type") === toType)
      .join(su, "user_id")
      .filter(col("ts") >= col("su"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("pu"), max(col("su")).as("su"))
      .select(((unix_micros(col("pu")) - unix_micros(col("su")))
        / lit(1000000.0)).as("lat"))
      .agg(count(lit(1)).as("n_converted"),
        pct("0.5", "p50_s"), pct("0.9", "p90_s"), pct("0.99", "p99_s"))
  }

  /** First-order Markov transition matrix over within-session event
    * sequences: P(next event type | current) — the quantitative form
    * of [[sessionPaths]]' top-paths view, and the model behind "what
    * does a user do after an error". Transitions never cross a session
    * boundary (the gap break resets the chain).
    *
    * Shape at 100 TB: sessionization and the lag both run as window
    * frames over ONE (user_id, ts, event_id) exchange+sort (the
    * scd2FromLog discipline); the transition aggregate is map-side
    * combinable into the bounded |types|² matrix, and the row-total
    * window runs over that bounded matrix, not the stream.
    */
  /** In-session (from, to, n) transition counts — the shared chain
    * under [[transitionMatrix]] and [[markovAccuracy]]: session break
    * and predecessor from the SAME user-partitioned window (a row
    * that opens a session has no from_type, so no second exchange on
    * a (user, session) key ever happens), then one map-side-combinable
    * count on the bounded type×type grid.
    */
  private def transitionCounts(events: DataFrame,
      gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("from_type", when(col("prev_ts").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) <
          gapSeconds * 1000000L, lag(col("event_type"), 1).over(w)))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  def transitionMatrix(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rowTotal = Window.partitionBy(col("from_type"))
    transitionCounts(events, gapSeconds)
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(rowTotal), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** First-order Markov next-event prediction accuracy — the
    * EVALUATION of [[transitionMatrix]] as a model: predict each
    * session step's next type as the argmax transition from its
    * predecessor, score against what actually happened. In-sample by
    * design (train = eval = the same stream) — the readout is "how
    * predictable is this event stream at order 1", the baseline any
    * sequence model must beat, not a generalization claim.
    *
    * Everything derives from the bounded (from, to, n) count grid:
    * the argmax is a map-side-combinable `min(struct(-n, to))`
    * (deterministic on ties: highest n, then first type name), and
    * accuracy per from-state is n(from, argmax) / n(from) — no second
    * pass over the stream.
    */
  def markovAccuracy(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val counts = transitionCounts(events, gapSeconds)
    val pred = counts.groupBy(col("from_type"))
      .agg(min(struct((-col("n")).as("nn"), col("to_type").as("t"))).as("m"),
        sum(col("n")).as("n_transitions"))
      .select(col("from_type"), col("m.t").as("predicted"),
        col("n_transitions"))
    pred.join(counts
        .select(col("from_type"), col("to_type"), col("n").as("n_correct")),
        Seq("from_type"))
      .filter(col("to_type") === col("predicted"))
      .select(col("from_type"), col("predicted"), col("n_transitions"),
        col("n_correct"),
        round(col("n_correct").cast("double") / col("n_transitions"), 6)
          .as("accuracy"))
      .orderBy(col("from_type"))
  }

  /** Position-based (U-shaped) multi-touch attribution — the third
    * member of the credit family beside last-touch (as-of join) and
    * linear (equal split): the FIRST and LAST touch before a purchase
    * take 40% of the value each, middles share the remaining 20%;
    * 1 touch → 100%, 2 touches → 50/50 (the standard position ladder).
    *
    * Touches come from the same bounded time-bucketed range join as
    * linear attribution (never a per-user cross product); position is
    * a `row_number` window PARTITIONED by purchase ordered on
    * (click_ts, k) — a full tie implies the same k, hence the same
    * channel, so per-channel sums stay deterministic even when the
    * endpoint assignment among tied rows is not. Per-touch credits
    * round at 6 dp per ROW and fold in exact decimals (order-free);
    * untouched purchases keep full credit in the organic lane via a
    * left anti join.
    */
  def uShapedAttribution(events: DataFrame,
      gapSeconds: Long = 3600L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    val touches = Joins.rangeJoinPrior(
      purchases, clicks, "user_id", "ts", "click_ts", gapSeconds)
    val w = Window.partitionBy(col("event_id"))
    val credits = touches
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("pos", row_number().over(
        w.orderBy(col("click_ts"), col("k"))))
      .withColumn("wgt",
        when(col("n_touches") === 1, lit(1.0))
          .when(col("n_touches") === 2, lit(0.5))
          .when(col("pos") === 1 || col("pos") === col("n_touches"), lit(0.4))
          .otherwise(lit(0.2) / (col("n_touches") - lit(2)).cast("double")))
      .select(concat(lit("campaign_"), col("k") % 4).as("channel"),
        round(col("value") * col("wgt"), 6).as("credit"))
    val organic = purchases
      .join(touches.select(col("event_id")).distinct(),
        Seq("event_id"), "left_anti")
      .select(lit("organic").as("channel"), round(col("value"), 6).as("credit"))
    credits.unionByName(organic)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit").cast(DecimalType(18, 6))).cast("double")
          .as("attributed_value"))
      .orderBy(col("channel"))
  }
}
