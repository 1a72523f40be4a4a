package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Partitioning

/** Pins for the sentinel-union guards themselves (the operator-side
  * loud-failure behavior is pinned in each operator's own spec).
  */
class GuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def msg(e: Throwable): String =
    Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")

  test("guard raises even for a count-only consumer (pruning-proof)") {
    // a projection-held raise_error would be column-pruned away when
    // the consumer references no columns (.count()), silently passing
    // the guard AND counting a phantom sentinel row — the raise lives
    // in the sentinel's filter CONDITION precisely so this cannot
    // happen
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    val guarded = Partitioning.requireSampleScale(df, "GuardSpec", 10L)
    val ex = intercept[Exception] { guarded.count() }
    assert(msg(ex).contains("sample-scale evaluator"),
      s"count-only consumer must still trip the guard: ${msg(ex)}")
    // under the limit, a count-only consumer sees EXACTLY the input
    // rows — no phantom sentinel row
    assert(Partitioning.requireSampleScale(df, "GuardSpec", 20L).count() == 20L)
  }

  test("requireBoundedDomain: same pruning-proof raise, exact row count") {
    val dom = (1L to 15L).map(i => (i, i * 2)).toDF("k", "mx")
    val ex = intercept[Exception] {
      Partitioning.requireBoundedDomain(dom, "k", "GuardSpec", 5L).count()
    }
    assert(msg(ex).contains("bounded-domain"))
    assert(Partitioning.requireBoundedDomain(dom, "k", "GuardSpec", 15L)
      .count() == 15L)
  }
}
