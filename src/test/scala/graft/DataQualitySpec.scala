package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DataQuality

class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tableExpectations counts violations per check in one pass") {
    val df = Seq((1, "a", 10.0), (2, null, -5.0), (3, "c", 0.0), (4, "d", 3.0))
      .toDF("id", "name", "amount")
    val out = DataQuality.tableExpectations(df, "t", Seq(
        "name_nonnull" -> col("name").isNull,
        "amount_positive" -> (col("amount") <= 0.0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(out == Set(
      ("t.name_nonnull", 4L, 1L, false),
      ("t.amount_positive", 4L, 2L, false)))
  }

  test("all checks over one table share a single scan/aggregate") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    val plan = DataQuality.tableExpectations(df, "t", Seq(
        "a" -> col("name").isNull, "b" -> (col("id") < 0)))
      .queryExecution.optimizedPlan.toString
    val aggs = "Aggregate".r.findAllIn(plan).length
    assert(aggs == 1, s"checks must fold into ONE aggregate, got $aggs:\n$plan")
  }

  test("check names that are not bare identifiers still work") {
    val df = Seq((1, "a"), (2, null)).toDF("id", "name")
    val out = DataQuality.tableExpectations(df, "t", Seq(
        "no-nulls" -> col("name").isNull,       // dash would parse as minus
        "o'brien rule" -> (col("id") < 0)))     // quote would break the literal
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("t.no-nulls" -> 1L, "t.o'brien rule" -> 0L))
  }

  test("empty table: zero violations, checks pass vacuously") {
    val df = Seq.empty[(Int, String)].toDF("id", "name")
    val out = DataQuality.tableExpectations(df, "t",
        Seq("name_nonnull" -> col("name").isNull))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq == Seq((0L, 0L, true)))
  }

  test("uniqueness and referential integrity detect real defects") {
    val dup = Seq(1, 2, 2, 3, 3, 3).toDF("k")
    val u = DataQuality.uniqueness(dup, col("k"), "t.pk").head()
    assert((u.getLong(1), u.getLong(2), u.getBoolean(3)) == (6L, 3L, false))

    val child = Seq(1, 1, 2, 9).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val ri = DataQuality.referentialIntegrity(child, parent,
      col("fk"), col("pk"), "c.fk").head()
    assert((ri.getLong(1), ri.getLong(2), ri.getBoolean(3)) == (4L, 1L, false))
  }

  test("null foreign keys count as orphans (no silent null-match)") {
    val child = Seq(Some(1), None, Some(2)).toDF("fk")
    val parent = Seq(1, 2).toDF("pk")
    val ri = DataQuality.referentialIntegrity(child, parent,
      col("fk"), col("pk"), "c.fk").head()
    // null = pk never matches → the null row is an orphan
    assert(ri.getLong(2) == 1L)
  }

  test("freshness: lag vs the explicit as-of, stale flag, never-delivered group") {
    import org.apache.spark.sql.functions._
    // asOf = 100s epoch; a fresh at 95s (lag 5), b stale at 10s (lag 90),
    // c never delivered (all-null ts) -> null lag, stale by definition
    val df = Seq(
      (Some(95L), "a"), (Some(40L), "a"),
      (Some(10L), "b"),
      (None: Option[Long], "c"))
      .toDF("t", "src")
      .select(timestamp_seconds(col("t")).as("ts"), col("src"))
    val out = DataQuality.freshness(df, col("src"), col("ts"),
        "1970-01-01 00:01:40", maxLagSeconds = 30L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3),
          r.getBoolean(4)))).toMap
    assert(out("a") == ((2L, 5L, false)))
    assert(out("b") == ((1L, 90L, true)))
    assert(out("c") == ((0L, -1L, true)), "never delivered is stale, lag NULL")
  }

  test("freshness: an unparseable asOf fails loudly, never all-stale") {
    import org.apache.spark.sql.functions._
    // in non-ANSI mode to_timestamp would NULL a typo'd tick and every
    // group would come back stale=true — a plausible-looking report
    // from a misconfigured scheduler; the strict driver-side parse
    // raises instead
    val df = Seq((1L, "a")).toDF("t", "src")
      .select(timestamp_seconds(col("t")).as("ts"), col("src"))
    val ex = intercept[IllegalArgumentException] {
      DataQuality.freshness(df, col("src"), col("ts"),
        "2024-02-31 00:00:00", maxLagSeconds = 30L)
    }
    assert(ex.getMessage.contains("not a valid"))
    intercept[IllegalArgumentException] {
      DataQuality.freshness(df, col("src"), col("ts"),
        "yesterday", maxLagSeconds = 30L)
    }
  }

  test("benfordTest: digit extraction, domain exclusions, absent digits still contribute") {
    // digits by magnitude: 123.45→1, 0.056→5, 999.0→9, 1.0→1;
    // excluded: null, 0, negative, and 1e-9 (shifts below one)
    val df = Seq(Some(123.45), Some(0.056), Some(999.0), Some(1.0),
      None, Some(0.0), Some(-50.0), Some(1e-9)).toDF("v")
    val got = DataQuality.benfordTest(df, col("v")).collect()
    assert(got.length == 9, "always one row per digit 1-9")
    val byDigit = got.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit(1) == 2 && byDigit(5) == 1 && byDigit(9) == 1)
    assert((2 to 8).filterNot(_ == 5).forall(d => byDigit(d) == 0))
    // the log-law shares are the textbook constants
    val exp = got.map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(exp(1) == 0.30103 && exp(2) == 0.176091 && exp(9) == 0.045757)
    // absent digits contribute (0−E)²/E = E, not zero
    val term = got.map(r => r.getInt(0) -> r.getDouble(4)).toMap
    assert(term(3) > 0, "a missing digit is evidence AGAINST conformance")
    // one shared total, equal to the 9-term sum at 6 dp
    val totals = got.map(_.getDouble(5)).distinct
    assert(totals.length == 1)
    assert(math.abs(totals.head - got.map(_.getDouble(4)).sum) < 5e-6)
  }

  test("benfordTest: a geometric ramp conforms far better than a flat shifted one") {
    // 10^(k/50) for k=0..99 spans two decades log-uniformly — the
    // textbook Benford generator; 900+d sequences all start with 9
    val benford = (0 until 100).map(k => math.pow(10.0, k / 50.0)).toDF("v")
    val skewed = (0 until 100).map(k => 900.0 + k).toDF("v")
    val chiB = DataQuality.benfordTest(benford, col("v")).head().getDouble(5)
    val chiS = DataQuality.benfordTest(skewed, col("v")).head().getDouble(5)
    assert(chiB < 16.0, s"log-uniform data should conform, chi2=$chiB")
    assert(chiS > 100.0, s"all-9s data must blow up the statistic, chi2=$chiS")
  }

  test("calendarGaps: finds exactly the hole, per-group ranges, dense group clean") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-02"), ("a", "2024-01-04"), // 01-03 missing
      ("b", "2024-02-10"), ("b", "2024-02-11"), ("b", "2024-02-12"), // dense
      ("c", "2024-03-01")                                            // single day
    ).toDF("g", "d").withColumn("ts", to_timestamp(col("d")))
    val out = DataQuality.calendarGaps(rows, col("g"), col("ts")).collect()
    assert(out.length == 1, s"exactly one hole: ${out.toSeq}")
    assert(out.head.getString(0) == "a" &&
      out.head.getDate(1).toString == "2024-01-03")
    // group b's February days must NOT count as gaps for group a
    // (ranges are per-group); null ts rows are ignored
    val withNull = rows.unionByName(
      Seq(("a", "x")).toDF("g", "d")
        .withColumn("ts", lit(null).cast("timestamp")))
    assert(DataQuality.calendarGaps(withNull, col("g"), col("ts"))
      .count() == 1)
  }

  test("winsorize: clamps to exact interpolated percentiles, keeps n, flags lanes") {
    import org.apache.spark.sql.functions._
    // group 'a': 1..100 plus one 1000 outlier; p01/p99 of 101 values
    // interpolate at rank p*(n-1): lo = 1 + 0.01*100 = 2.0? No —
    // values sorted: 1..100,1000; rank 1.0 -> 2.0; hi rank 99*... use
    // assertions computed from the operator's own contract instead:
    // clamped extremes equal the percentile columns exactly
    val rows = ((1 to 100).map(i => ("a", i.toDouble)) :+ (("a", 1000.0))) ++
      (1 to 50).map(i => ("b", i.toDouble))
    val df = rows.toDF("g", "v")
    val out = DataQuality.winsorize(df, col("g"), col("v"), 0.01, 0.99)
      .collect()
    assert(out.length == 151, "winsorize keeps every non-null row")
    val a = out.filter(_.getString(0) == "a")
    val lo = a.head.getDouble(5); val hi = a.head.getDouble(6)
    assert(a.forall(r => r.getDouble(5) == lo && r.getDouble(6) == hi),
      "one (lo, hi) pair per group")
    // the 1000 outlier clamps to hi and is flagged
    val big = a.find(_.getDouble(1) == 1000.0).get
    assert(big.getDouble(2) == hi && big.getBoolean(4) && !big.getBoolean(3))
    // the minimum clamps to lo
    val small = a.find(_.getDouble(1) == 1.0).get
    assert(small.getDouble(2) == lo && small.getBoolean(3))
    // interior rows pass through untouched
    val mid = a.find(_.getDouble(1) == 50.0).get
    assert(mid.getDouble(2) == 50.0 && !mid.getBoolean(3) && !mid.getBoolean(4))
    // group b's edges are its own
    val b = out.filter(_.getString(0) == "b")
    assert(b.head.getDouble(6) < hi, "group b has its own (smaller) hi edge")
    intercept[IllegalArgumentException] {
      DataQuality.winsorize(df, col("g"), col("v"), 0.5, 0.5)
    }
  }

  test("winsorize: a continuous group key fails loudly at the domain guard") {
    import org.apache.spark.sql.functions._
    val df = spark.range(100).select(col("id").cast("string").as("g"),
      col("id").cast("double").as("v"))
    val ex = intercept[Exception] {
      DataQuality.winsorize(df, col("g"), col("v"), domainLimit = 10L)
        .collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("DataQuality.winsorize"),
      s"guard must name the site: $msg")
  }
}
