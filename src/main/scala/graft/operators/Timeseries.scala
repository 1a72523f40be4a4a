package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Daily-series diagnostics over the event stream — the monitoring
  * questions a pipeline asks of its own volume curve: "did ingest
  * volume shift, and when?" (CUSUM changepoint), "is today's count
  * explainable by last week's?" (seasonal-naive forecast error), and
  * "is today an outlier against its own trailing window?" (rolling
  * z-score). These extend the reference's stats/monitoring surface
  * (aeuc_vector_db/db.py stats(), reference only reports static
  * counts) to the time axis a production ingest actually watches.
  *
  * Shape at 100 TB: every operator here aggregates the raw stream to
  * ONE row per day first — a map-side-combinable count keyed on the
  * calendar day, so the shuffle moves day-level partials, never
  * events. Everything after that point (windows, self-joins on the
  * day key, peak scans) runs on the bounded DAY DOMAIN — guarded by
  * [[Partitioning.requireBoundedDomain]], the discipline every
  * unpartitioned cumulative window in this repo follows. Calendar
  * days are physically bounded (~37k rows per century), so the
  * domain stage is driver-trivial at any corpus scale.
  *
  * Determinism discipline: the daily counts are exact longs; every
  * derived statistic is formed from exact integer/decimal sums with a
  * FIXED operation order shared character-for-character with the
  * DuckDB oracle, then rounded at 6 dp. Where a variance radicand
  * appears it is computed exactly in decimals and clamped at zero
  * before sqrt (the Monitor.scala radicand lesson).
  */
object Timeseries {

  /** One exact count per calendar day, the shared head of every
    * operator in this file. Bounded-domain-guarded: the downstream
    * global windows sort THIS frame, so its row count must stay in
    * the domain class (it does — it is calendar days). */
  private def dailyCounts(events: DataFrame, site: String): DataFrame =
    Partitioning.requireBoundedDomain(
      events.groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      "day", site)

  /** CUSUM changepoint scan over daily event counts: the cumulative
    * deviation S_i = Σ_{j≤i}(x_j − μ) and the day where |S| peaks —
    * the classic "the level shifted HERE" detector (Page 1954). A
    * flat series random-walks near zero; a mean shift at day t makes
    * |S| a tent with its apex at t. Reports the full curve (for
    * plotting/alerting) with the peak day(s) flagged.
    *
    * Determinism: S_i = cum_i − i·total/n_days where cum_i and i are
    * exact (running long sum, row_number), so each S_i is ONE double
    * expression with a fixed order, rounded at 6 dp; the peak flag
    * compares the ROUNDED values, so oracle equality is exact.
    * Shape: day-domain window + two broadcast 1-row aggregates; the
    * only sort is the guarded day-domain sort.
    */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events, "Timeseries.cusumChangepoint")
    val tot = daily.agg(sum(col("n")).as("total"), count(lit(1)).as("n_days"))
    val cumW = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = daily.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(Window.orderBy(col("day"))))
      .withColumn("cum", sum(col("n")).over(cumW))
      .select(col("day"), col("n"),
        round(col("cum").cast("double") - col("i").cast("double")
          * col("total").cast("double") / col("n_days").cast("double"),
          6).as("cusum"))
    val peak = curve.agg(max(abs(col("cusum"))).as("peak"))
    curve.crossJoin(broadcast(peak))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
        col("cusum"),
        when(abs(col("cusum")) === col("peak"), lit(1)).otherwise(lit(0))
          .cast("int").as("is_peak"))
      .orderBy(col("day"))
  }

  /** Seasonal-naive forecast evaluation: predict each day's count
    * with the count `season` days earlier, and score the prediction
    * with MAE, sMAPE and MASE (Hyndman & Koehler 2006) — MASE scales
    * the seasonal forecast's error by the one-step-naive in-sample
    * error, so < 1 means "last week beats yesterday" and the measure
    * is unit-free across series. The honest baseline every fancy
    * volume forecast must beat before it ships.
    *
    * Gaps are semantic, not positional: the prediction joins on
    * day − season (an equi-join on the day key), so a missing
    * calendar day yields no forecast rather than silently borrowing
    * the wrong lag — ROWS-frame lag over an irregular series would.
    * Shape: the two lag joins are day-domain equi-joins with the
    * (broadcast) shifted copy; summary statistics are exact long
    * sums except the 9-dp-decimal sMAPE term fold. n_eval = 0 (or a
    * zero scale error) yields NULL ratios, never a division blowup.
    */
  def seasonalNaiveEval(events: DataFrame, season: Int = 7): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val daily = dailyCounts(events, "Timeseries.seasonalNaiveEval")
    val pred = daily.select(date_add(col("day"), season).as("day"),
      col("n").as("n_pred"))
    val prev = daily.select(date_add(col("day"), 1).as("day"),
      col("n").as("n_prev"))
    val eval = daily.join(broadcast(pred), Seq("day"))
      .select(col("n"), col("n_pred"),
        abs(col("n") - col("n_pred")).as("err"),
        // sMAPE term: 2|x−p|/(x+p); counts are ≥ 1 so the denominator
        // is never zero. 9-dp round → decimal fold (order-free).
        round(lit(2.0) * abs(col("n") - col("n_pred")).cast("double")
          / (col("n") + col("n_pred")).cast("double"), 9)
          .cast(DecimalType(20, 9)).as("sm9"))
      .agg(count(lit(1)).as("n_eval"), sum(col("err")).as("se"),
        sum(col("sm9")).as("ssm"))
    val scale = daily.join(broadcast(prev), Seq("day"))
      .select(abs(col("n") - col("n_prev")).as("s"))
      .agg(count(lit(1)).as("n_scale"), sum(col("s")).as("ss"))
    val nd = daily.agg(count(lit(1)).as("n_days"))
    val mae = col("se").cast("double") / col("n_eval").cast("double")
    val scaleMae = col("ss").cast("double") / col("n_scale").cast("double")
    nd.crossJoin(broadcast(eval)).crossJoin(broadcast(scale))
      .select(col("n_days"), col("n_eval"),
        when(col("n_eval") > 0, round(mae, 6)).as("mae"),
        when(col("n_scale") > 0, round(scaleMae, 6)).as("scale_mae"),
        when(col("n_eval") > 0 && col("n_scale") > 0 && col("ss") > 0,
          round(mae / scaleMae, 6)).as("mase"),
        when(col("n_eval") > 0,
          round(col("ssm").cast("double") / col("n_eval").cast("double"), 6))
          .as("smape"))
  }

  /** Rolling z-score anomaly flags: each day scored against the
    * sample mean/stddev of its trailing `window` OBSERVED days
    * (current day excluded — the day under test must not contaminate
    * its own baseline). The per-day sibling of Monitor.hourlyAnomaly's
    * global z-score: level shifts and ramps move the baseline with
    * the series here, so only LOCAL spikes flag.
    *
    * "Observed days": the frame is ROWS-based over the day-domain
    * table, so after a calendar gap the window is the last `window`
    * days that HAVE data — documented semantics, not an accident
    * (an irregular monitor wants "recent behaviour", not empty
    * calendar slots as zeros).
    *
    * Determinism: trailing sum/sum-of-squares are exact decimals
    * (counts cast to decimal BEFORE squaring — the chiSquare
    * overflow lesson); variance numerator w·Σx² − (Σx)² is exact,
    * clamped at zero (radicand guard), divided once, sqrt'd, rounded.
    * The flag compares against the ROUNDED mean/std so the oracle
    * replays it bit-for-bit.
    */
  def rollingAnomaly(events: DataFrame, window: Int = 7,
      k: Double = 3.0): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(k > 0, s"k must be > 0, got $k")
    val daily = dailyCounts(events, "Timeseries.rollingAnomaly")
    val w = Window.orderBy(col("day")).rowsBetween(-window, -1)
    val cnt = count(col("n")).over(w)
    val s = sum(col("n").cast(DecimalType(38, 0))).over(w)
    val s2 = sum(col("n").cast(DecimalType(19, 0))
      * col("n").cast(DecimalType(19, 0))).over(w)
    val stats = daily.select(col("day"), col("n"),
      cnt.as("n_window"), s.as("s"), s2.as("s2"))
    // parenthesized as ONE expression: a leading `-` on a continuation
    // line is parsed as a new unary-minus statement by Scala's
    // semicolon inference, silently dropping the s² term
    val numer = (col("n_window").cast(DecimalType(38, 0)) * col("s2")
      - col("s") * col("s"))
    val meanRaw = col("s").cast("double") / col("n_window").cast("double")
    val stdRaw = sqrt(greatest(numer.cast("double")
      / (col("n_window").cast("double")
        * (col("n_window") - 1).cast("double")), lit(0.0)))
    stats
      .withColumn("mean_prev",
        when(col("n_window") >= 2, round(meanRaw, 6)))
      .withColumn("std_prev",
        when(col("n_window") >= 2, round(stdRaw, 6)))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
        col("n_window").cast("int").as("n_window"),
        col("mean_prev"), col("std_prev"),
        coalesce(
          (abs(col("n").cast("double") - col("mean_prev"))
            > lit(k) * col("std_prev")).cast("int"),
          lit(0)).as("is_anomaly"))
      .orderBy(col("day"))
  }

  /** Day-of-week-ADJUSTED anomaly flags: each day's count z-scores
    * against the trailing `window` SAME-weekday observations (current
    * day excluded) — a Monday is judged against prior Mondays, so the
    * weekly rhythm [[seasonalityStrength]] measures cannot masquerade
    * as anomaly the way it can in the unadjusted [[rollingAnomaly]]
    * (where every quiet Sunday flags against a busy-weekday
    * baseline). dow is days-since-a-known-Monday mod 7 — the
    * seasonality convention, never an engine's dayofweek(). Same
    * exact-decimal-moment / clamped-radicand / rounded-readout
    * contract as rollingAnomaly; days with under 2 same-dow baseline
    * observations report NULL stats and flag 0.
    *
    * Shape: the guarded day-domain collapse, then windows PARTITIONED
    * by dow — 7 bounded sub-series, each sorted within its partition;
    * nothing global, nothing corpus-sized past the first aggregate.
    */
  def dowAdjustedAnomaly(events: DataFrame, window: Int = 4,
      k: Double = 3.0): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(k > 0, s"k must be > 0, got $k")
    val daily = dailyCounts(events, "Timeseries.dowAdjustedAnomaly")
      .withColumn("dow",
        pmod(datediff(col("day"), to_date(lit("1970-01-05"))), lit(7)))
    val w = Window.partitionBy(col("dow")).orderBy(col("day"))
      .rowsBetween(-window, -1)
    val cnt = count(col("n")).over(w)
    val s = sum(col("n").cast(DecimalType(38, 0))).over(w)
    val s2 = sum(col("n").cast(DecimalType(19, 0))
      * col("n").cast(DecimalType(19, 0))).over(w)
    val stats = daily.select(col("day"), col("dow"), col("n"),
      cnt.as("n_window"), s.as("s"), s2.as("s2"))
    val numer = (col("n_window").cast(DecimalType(38, 0)) * col("s2")
      - col("s") * col("s"))
    val meanRaw = col("s").cast("double") / col("n_window").cast("double")
    val stdRaw = sqrt(greatest(numer.cast("double")
      / (col("n_window").cast("double")
        * (col("n_window") - 1).cast("double")), lit(0.0)))
    stats
      .withColumn("mean_prev",
        when(col("n_window") >= 2, round(meanRaw, 6)))
      .withColumn("std_prev",
        when(col("n_window") >= 2, round(stdRaw, 6)))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dow").cast("int").as("dow"), col("n"),
        col("n_window").cast("int").as("n_window"),
        col("mean_prev"), col("std_prev"),
        coalesce(
          (abs(col("n").cast("double") - col("mean_prev"))
            > lit(k) * col("std_prev")).cast("int"),
          lit(0)).as("is_anomaly"))
      .orderBy(col("day"))
  }

  /** Day-of-week seasonality strength — the variance share the weekly
    * cycle explains: 1 − SS_within/SS_total where SS_within removes
    * per-dow means (the R² of the dow-means model). Near 1 ⇒ the
    * series is mostly weekly rhythm (forecast with
    * [[seasonalNaiveEval]]'s lag-7), near 0 ⇒ the weekly shape is
    * noise. dow is computed as days-since-a-known-Monday mod 7 —
    * never an engine's dayofweek(), whose 0/1-based Sunday/Monday
    * conventions differ.
    *
    * Shape: the day-domain collapse, one 7-row dow-mean aggregate
    * joined back broadcast, squared deviations quantized at 9 dp into
    * decimals (order-free sums). SS_total = 0 (a constant series) has
    * no variance to explain — strength is DEFINED 0, never 0/0.
    */
  def seasonalityStrength(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events, "Timeseries.seasonalityStrength")
      .select(col("day"),
        pmod(datediff(col("day"), to_date(lit("1970-01-05"))), lit(7))
          .as("dow"),
        col("n").cast("double").as("y"))
    val overall = daily.agg(count(lit(1)).as("n_days"),
      (sum(col("y")) / count(lit(1))).as("mu"))
    val dowMeans = daily.groupBy(col("dow"))
      .agg((sum(col("y")) / count(lit(1))).as("mu_dow"))
    val terms = daily
      .join(broadcast(dowMeans), "dow")
      .crossJoin(broadcast(overall))
      .select(col("n_days"),
        round((col("y") - col("mu")) * (col("y") - col("mu")), 9)
          .cast(DecimalType(28, 9)).as("t_tot"),
        round((col("y") - col("mu_dow")) * (col("y") - col("mu_dow")), 9)
          .cast(DecimalType(28, 9)).as("t_win"))
    terms.groupBy(col("n_days"))
      .agg(sum(col("t_tot")).cast("double").as("ss_total"),
        sum(col("t_win")).cast("double").as("ss_within"))
      .select(col("n_days"),
        round(col("ss_total"), 6).as("ss_total"),
        round(col("ss_within"), 6).as("ss_within"),
        when(col("ss_total") > 0.0,
          round(lit(1.0) - col("ss_within") / col("ss_total"), 6))
          .otherwise(lit(0.0)).as("strength"))
  }

  /** Theil-Sen robust trend over the daily series — the slope
    * estimate an anomaly can't drag (Theil 1950, Sen 1968): the
    * MEDIAN of all pairwise slopes (y_j − y_i)/(x_j − x_i), with the
    * companion median intercept. OLS on daily counts moves with one
    * bot-burst day; the pairwise-median slope has a 29.3% breakdown
    * point — the "is volume actually growing" number a monitoring
    * dashboard wants next to [[cusumChangepoint]]'s level-shift scan.
    *
    * The pairwise self-join is O(days²) BY DESIGN and safe for the
    * same reason every operator in this file is: the stream collapses
    * to the guarded day domain first (a year is 365 rows → 66k pairs),
    * never pairing raw events. x is days-since-first (exact int from
    * datediff), so each slope is one fixed double division; medians
    * are exact interpolated percentiles; readouts round at 6 dp.
    */
  def theilSenTrend(events: DataFrame): DataFrame = {
    // tighter guard than the family default: this operator SQUARES the
    // day domain, so the bound must hold pre-squaring (10k days = 27
    // years -> 50M pairs, still one task-set; 2M days would not be)
    val daily = Partitioning.requireBoundedDomain(
      events.groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n")),
      "day", "Timeseries.theilSenTrend", 10000L)
    val d0 = daily.agg(min(col("day")).as("day0"),
      count(lit(1)).as("n_days"))
    val xy = daily.crossJoin(broadcast(d0))
      .select(datediff(col("day"), col("day0")).cast("long").as("x"),
        col("n").cast("double").as("y"), col("n_days"))
    val pairs = xy.as("a").join(xy.as("b"), col("a.x") < col("b.x"))
      .select(((col("b.y") - col("a.y"))
        / (col("b.x") - col("a.x")).cast("double")).as("slope"))
    val slope = pairs.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(slope, 0.5D)").as("slope_med"))
    xy.crossJoin(broadcast(slope))
      .select(col("n_days"), col("n_pairs"), col("slope_med"),
        (col("y") - col("slope_med") * col("x")).as("b0"))
      .groupBy(col("n_days"), col("n_pairs"), col("slope_med"))
      .agg(expr("percentile(b0, 0.5D)").as("intercept_med"))
      .select(col("n_days"), col("n_pairs"),
        round(col("slope_med"), 6).as("slope_per_day"),
        round(col("intercept_med"), 6).as("intercept"))
  }
}
