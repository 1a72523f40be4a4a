package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Survival

class SurvivalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def km(rows: (Long, Boolean)*) =
    Survival.kaplanMeier(rows.toDF("t", "event"))
      .select(col("t"), col("n_risk"), col("n_churned"), col("n_censored"),
        col("survival"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq

  test("textbook KM: censoring shrinks the risk set without a death step") {
    // classic small example: deaths at 1, 3; censored at 2, 4; n=4
    // t=1: n=4, d=1 → S = 3/4 = 0.75
    // t=2: censored only → S stays 0.75, risk 3
    // t=3: n=2, d=1 → S = 0.75 · 1/2 = 0.375
    // t=4: censored → S stays
    val out = km((1L, true), (2L, false), (3L, true), (4L, false))
    assert(out == Seq(
      (1L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 0L, 1L, 0.75),
      (3L, 2L, 1L, 0L, 0.375),
      (4L, 1L, 0L, 1L, 0.375)))
  }

  test("naive retention (censored-as-churned) underestimates survival — KM does not") {
    // half the cohort censored at 5 while still alive: KM at t=5 keeps
    // S = 0.5 from the single death at 2 of 4 at-risk... compute:
    // t=2: n=4, d=2 → S=0.5; t=5: censored 2 → S stays 0.5.
    val out = km((2L, true), (2L, true), (5L, false), (5L, false))
    assert(out.last._5 == 0.5)
    // naive curve would call it 0.0 at t=5 (everyone "gone")
  }

  test("everyone dies at the last time → survival collapses to exactly 0") {
    val out = km((1L, true), (2L, true), (2L, true))
    assert(out.last._5 == 0.0)
    // and ln(0) never evaluated: survival before the collapse is finite
    assert(out.head._5 > 0.0)
  }

  test("ties at one time: deaths precede censorings in the risk set") {
    // at t=3: 2 deaths + 1 censored, all 3 at risk → factor 1/3
    val out = km((3L, true), (3L, true), (3L, false))
    assert(out == Seq((3L, 3L, 2L, 1L, 0.333333)))
  }

  test("negative or null durations are excluded, not poisoning the curve") {
    val df = Seq((Some(-1L), true), (None, true), (Some(2L), true))
      .toDF("t", "event")
    val out = Survival.kaplanMeier(df).select(col("t")).as[Long].collect()
    assert(out.toSeq == Seq(2L))
  }

  test("unbounded duration domain fails loudly, not silently sorts") {
    // raw sub-second timestamps as t would single-task-sort the
    // subject corpus in the cumulative window — the guard raises
    val df = (1L to 30L).map(t => (t, true)).toDF("t", "event")
    val ex = intercept[Exception] {
      Survival.kaplanMeier(df, domainLimit = 10L).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("Survival.kaplanMeier") && msg.contains("bounded-domain"))
    assert(Survival.kaplanMeier(df, domainLimit = 30L).count() == 30L)
  }
}
