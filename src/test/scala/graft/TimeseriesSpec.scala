package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Timeseries

class TimeseriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // events on given (dayOffset, countThatDay) — dayOffset from a fixed
  // epoch day, each event 1 s apart inside the day
  private def ev(days: (Int, Int)*) = {
    val base = 1700000000000000L // epoch micros, mid-day
    days.flatMap { case (d, c) =>
      (0 until c).map(i => (d.toLong * 86400000000L + base + i * 1000000L))
    }.toDF("us").select(timestamp_micros(col("us")).as("ts"))
  }

  test("cusumChangepoint: level shift peaks at the shift day") {
    // 3 days at 10, then 3 days at 20 — mean 15, S walks -5,-10,-15
    // then -10,-5,0: the peak |S| sits on the last low day
    val got = Timeseries.cusumChangepoint(ev(
      (0, 10), (1, 10), (2, 10), (3, 20), (4, 20), (5, 20))).collect()
    assert(got.map(_.getDouble(2)).toSeq ==
      Seq(-5.0, -10.0, -15.0, -10.0, -5.0, 0.0))
    assert(got.map(_.getInt(3)).toSeq == Seq(0, 0, 1, 0, 0, 0),
      "exactly the apex day flags")
  }

  test("cusumChangepoint: flat series flags its (tied) extremes, not a fake shift") {
    val got = Timeseries.cusumChangepoint(ev((0, 5), (1, 5), (2, 5))).collect()
    assert(got.map(_.getDouble(2)).toSeq == Seq(0.0, 0.0, 0.0))
    // all days tie at |S| = 0 — deterministic, and no day is singled out
    assert(got.map(_.getInt(3)).toSeq == Seq(1, 1, 1))
  }

  test("seasonalNaiveEval: known lag errors; gap days get no forecast") {
    // season=2: day 2 predicted by day 0 (err 2), day 3 by day 1
    // (err 1); day 5 has no day-3 predecessor... build with a gap
    val df = Timeseries.seasonalNaiveEval(ev(
      (0, 10), (1, 12), (2, 12), (3, 13), (6, 99)), season = 2)
    val r = df.collect()(0)
    assert(r.getLong(0) == 5, "n_days")
    // evaluable: day2(pred day0, err 2), day3(pred day1, err 1) —
    // day 6 has no day-4 observation, so the gap yields NO forecast
    assert(r.getLong(1) == 2, "n_eval")
    assert(r.getDouble(2) == 1.5, "mae = (2+1)/2")
    // one-step scale pairs: (0,1) err 2, (1,2) err 0, (2,3) err 1 → 1.0
    assert(r.getDouble(3) == 1.0, "scale_mae")
    assert(r.getDouble(4) == 1.5, "mase = 1.5/1.0")
    // smape terms: 2*2/22, 2*1/25 → mean of (0.181818182, 0.08)
    assert(math.abs(r.getDouble(5) - 0.130909) < 1e-6, "smape")
  }

  test("seasonalNaiveEval: zero scale error yields NULL MASE, not a blowup") {
    val r = Timeseries.seasonalNaiveEval(ev(
      (0, 7), (1, 7), (2, 9)), season = 2).collect()(0)
    assert(r.getDouble(2) == 2.0, "mae |9-7|")
    // one-step diffs: 0, 2 → scale_mae 1.0 — fine; now a truly flat one
    val flat = Timeseries.seasonalNaiveEval(ev(
      (0, 7), (1, 7), (2, 7)), season = 2).collect()(0)
    assert(flat.isNullAt(4), "MASE undefined when the naive error is 0")
    assert(flat.getDouble(3) == 0.0, "scale_mae itself is 0, reported")
  }

  test("rollingAnomaly: spike flags against its trailing window, baseline days do not") {
    // 7 flat days then a spike; window=3 for a short series
    val got = Timeseries.rollingAnomaly(ev(
      (0, 10), (1, 10), (2, 10), (3, 10), (4, 50)), window = 3, k = 3.0)
      .collect()
    val byDay = got.map(r => r.getLong(1) -> r).toMap
    // first day: empty window → nulls, not anomalous
    assert(got(0).getInt(2) == 0 && got(0).isNullAt(3) && got(0).getInt(5) == 0)
    // second day: 1-row window → still null (sample std needs 2)
    assert(got(1).getInt(2) == 1 && got(1).isNullAt(4) && got(1).getInt(5) == 0)
    // day 3 onward: mean 10, std 0 — flat days don't flag
    assert(got(3).getDouble(3) == 10.0 && got(3).getDouble(4) == 0.0
      && got(3).getInt(5) == 0)
    // the spike: |50 - 10| > 3·0 → flags
    assert(got(4).getLong(1) == 50 && got(4).getInt(5) == 1)
  }

  test("rollingAnomaly: current day is excluded from its own baseline") {
    // ramp: if the current day leaked into the window, day 4's mean
    // would include 50 and the z-score would shrink; with exclusion
    // the baseline is exactly the three 10s
    val got = Timeseries.rollingAnomaly(ev(
      (0, 10), (1, 10), (2, 10), (3, 50)), window = 3, k = 1.0).collect()
    assert(got(3).getDouble(3) == 10.0, "baseline mean excludes the spike day")
    assert(got(3).getInt(2) == 3, "window saw exactly the 3 prior days")
  }

  test("parameter validation fails fast") {
    val e = ev((0, 1))
    intercept[IllegalArgumentException](Timeseries.seasonalNaiveEval(e, 0))
    intercept[IllegalArgumentException](Timeseries.rollingAnomaly(e, 1))
    intercept[IllegalArgumentException](Timeseries.rollingAnomaly(e, 7, 0.0))
  }

  test("seasonalityStrength: perfect weekly cycle -> 1, constant -> 0, mixed in between") {
    // two exact repeats of a 7-day pattern: dow means absorb ALL
    // variance -> strength exactly 1
    val pattern = Seq(3, 8, 5, 9, 4, 7, 6)
    val perfect = ev((0 until 14).map(d => (d, pattern(d % 7))): _*)
    val p = Timeseries.seasonalityStrength(perfect).head()
    assert(p.getLong(0) == 14L && p.getDouble(3) == 1.0 &&
      p.getDouble(2) == 0.0)
    // constant series: no variance to explain -> defined 0, not 0/0
    val const = ev((0 until 14).map(d => (d, 5)): _*)
    val c = Timeseries.seasonalityStrength(const).head()
    assert(c.getDouble(1) == 0.0 && c.getDouble(3) == 0.0)
    // within-dow variance leaves strength strictly between 0 and 1
    val mixed = ev((0 until 14).map(d =>
      (d, pattern(d % 7) + (if (d < 7) 0 else d % 3))): _*)
    val m = Timeseries.seasonalityStrength(mixed).head().getDouble(3)
    assert(m > 0.0 && m < 1.0, s"mixed strength $m")
  }

  test("theilSenTrend: the outlier day cannot drag the median slope") {
    // y = (10, 12, 100, 16) on days 0..3: pairwise slopes
    // {2, 45, 2, 88, 2, -84} -> median 2 (OLS would report ~8.8);
    // intercepts y - 2x = (10, 10, 96, 10) -> median 10
    val out = Timeseries.theilSenTrend(ev((0, 10), (1, 12), (2, 100), (3, 16)))
      .head()
    assert(out.getLong(0) == 4L && out.getLong(1) == 6L)
    assert(out.getDouble(2) == 2.0, s"median slope, got ${out.getDouble(2)}")
    assert(out.getDouble(3) == 10.0, s"median intercept, got ${out.getDouble(3)}")
    // a clean linear ramp recovers its exact slope/intercept
    val lin = Timeseries.theilSenTrend(ev((0, 5), (1, 8), (2, 11), (3, 14)))
      .head()
    assert(lin.getDouble(2) == 3.0 && lin.getDouble(3) == 5.0)
  }

  test("dowAdjustedAnomaly: weekly rhythm does not flag; a same-dow spike does") {
    // 6 weeks: weekdays 20 events, sundays 2 — a quiet Sunday is
    // NORMAL against its own weekday lane. Week 6's Wednesday spikes
    // to 60: constant same-dow baseline (std 0) must flag it.
    val days = (0 until 42).map { d =>
      val dow = d % 7 // day 0 chosen as a Monday-equivalent lane; the
                      // operator's own dow labeling is independent
      val n = if (d == 37) 60 else if (dow == 6) 2 else 20
      (d, n)
    }
    val got = Timeseries.dowAdjustedAnomaly(ev(days: _*), window = 4, k = 3.0)
      .collect()
    assert(got.length == 42)
    val byIdx = got.sortBy(_.getString(0)).zipWithIndex.map(_.swap).toMap
    // sundays after the warmup have 4 same-dow baselines of 2 → no flag
    val lateSundays = (0 until 42).filter(d => d % 7 == 6 && d >= 28)
    lateSundays.foreach { d =>
      assert(byIdx(d).getInt(6) == 0, s"quiet Sunday day $d wrongly flagged") }
    assert(byIdx(37).getInt(6) == 1, "same-dow spike must flag")
    assert(byIdx(37).getDouble(4) == 20.0 && byIdx(37).getDouble(5) == 0.0,
      "spike day's baseline is the four prior same-dow 20s")
    // warmup days (fewer than 2 same-dow baselines) report NULL stats, flag 0
    assert(byIdx(0).isNullAt(4) && byIdx(0).getInt(6) == 0)
    // contrast pin: the UNADJUSTED rolling form flags at least one
    // late quiet Sunday at the same k where the adjusted form is clean
    val rolled = Timeseries.rollingAnomaly(ev(days: _*), 7, 2.0).collect()
      .sortBy(_.getString(0)).zipWithIndex.map(_.swap).toMap
    assert(lateSundays.exists(d => rolled(d).getInt(5) == 1),
      "premise: the weekly rhythm trips the unadjusted detector")
  }
}
