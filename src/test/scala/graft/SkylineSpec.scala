package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frontier(pts: Seq[(Int, Int)]): Set[(Int, Int)] =
    Skyline.frontier2d(pts.toDF("m", "x"), col("m"), col("x"))
      .select(col("m"), col("x")).as[(Int, Int)].collect().toSet

  private def brute(pts: Seq[(Int, Int)]): Set[(Int, Int)] =
    pts.filter { case (m, x) =>
      !pts.exists { case (m2, x2) =>
        m2 <= m && x2 >= x && (m2 < m || x2 > x) }
    }.toSet

  test("frontier keeps only undominated points") {
    // (1,5) and (3,9) survive; (2,4) dominated by (1,5); (3,9) beats (4,9)
    val pts = Seq((1, 5), (2, 4), (3, 9), (4, 9), (5, 1))
    assert(frontier(pts) == Set((1, 5), (3, 9)))
  }

  test("duplicate points neither dominate each other — both stay") {
    val pts = Seq((2, 7), (2, 7), (5, 3))
    val out = Skyline.frontier2d(pts.toDF("m", "x"), col("m"), col("x")).count()
    assert(out == 2L)
  }

  test("same-m group: only the group max survives; equal-x cheaper point wins") {
    // (1,5) vs (1,3): latter dominated (equal m, smaller x)
    // (2,5): dominated by (1,5) (worse m, equal x)
    assert(frontier(Seq((1, 5), (1, 3), (2, 5))) == Set((1, 5)))
  }

  test("property: window construction equals the quadratic definition") {
    val genPts = Gen.listOfN(40, Gen.zip(Gen.choose(0, 8), Gen.choose(0, 8)))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(genPts) { pts =>
        pts.isEmpty || frontier(pts) == brute(pts)
      })
    assert(res.passed, res.status.toString)
  }

  test("null coordinates drop out rather than poisoning the window") {
    val df = Seq((Some(1), Some(5)), (None, Some(9)), (Some(2), None))
      .toDF("m", "x")
    val out = Skyline.frontier2d(df, col("m"), col("x")).count()
    assert(out == 1L)
  }

  test("the bounded-domain guard reuses the domain exchange, no double scan") {
    // the sentinel-union guard recomputes the domain AGGREGATE for its
    // count — the scale question is whether that recompute re-reads the
    // base data. It must not: both branches share the identical
    // canonical groupBy exchange, so AQE's ReuseExchange makes the
    // count branch read the SHUFFLED data (one base scan total). A
    // regression here would double every guarded operator's input cost
    // at 100 TB.
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .groupBy(col("source")).agg(count(lit(1)).as("m"), sum(col("n_chars")).as("x"))
    val out = Skyline.frontier2d(df, col("m"), col("x"))
    out.collect() // AQE finalizes reuse decisions at execution
    // AQE's toString prints Final + Initial plans — judge the FINAL one
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ReusedExchange"),
      s"guard count branch must reuse the domain exchange:\n$plan")
    val scans = "FileScan parquet".r.findAllMatchIn(plan).length
    assert(scans <= 1, s"guarded plan must scan the base data once, saw $scans:\n$plan")
  }

  test("high-cardinality minimize domain fails loudly, not silently sorts") {
    // a continuous minimize column used to degrade the global window
    // into a single-partition sort of n rows with no warning — now the
    // bounded-domain guard raises in-plan
    val df = (1 to 20).map(i => (i, i)).toDF("m", "x")
    val ex = intercept[Exception] {
      Skyline.frontier2d(df, col("m"), col("x"), domainLimit = 10L).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("Skyline.frontier2d") && msg.contains("bounded-domain"),
      s"expected the bounded-domain raise, got: $msg")
    // at the limit it still runs (the diagonal is all Pareto-optimal)
    assert(Skyline.frontier2d(df, col("m"), col("x"), domainLimit = 20L)
      .count() == 20L)
  }
}
