package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Experiment

class ExperimentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String)*) =
    rows.toDF("user_id", "event_type")

  test("z matches the hand-computed two-proportion statistic") {
    // force assignment by picking users whose md5(u:salt) first hex
    // char lands on each side — discover the split empirically, then
    // check the arithmetic against it
    val users = (0L until 40L)
    val converts = users.filter(_ % 2 == 0).toSet // half convert
    val rows = users.flatMap { u =>
      if (converts(u)) Seq((u, "purchase")) else Seq((u, "view"))
    }
    val out = Experiment.abTest(ev(rows: _*), "s1", "purchase", 1).head()
    val (nA, cA, nB, cB) = (out.getLong(0), out.getLong(1),
      out.getLong(2), out.getLong(3))
    assert(nA + nB == 40L && cA + cB == 20L)
    val pA = cA.toDouble / nA; val pB = cB.toDouble / nB
    val pool = (cA + cB).toDouble / (nA + nB)
    val expectZ = (pA - pB) / math.sqrt(pool * (1 - pool) * (1.0 / nA + 1.0 / nB))
    assert(math.abs(out.getDouble(6) - BigDecimal(expectZ)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("assignment is deterministic and changes with the salt") {
    val rows = (0L until 30L).map(u => (u, "view"))
    val a1 = Experiment.abTest(ev(rows: _*), "s1", "purchase", 1).head()
    val a2 = Experiment.abTest(ev(rows: _*), "s1", "purchase", 1).head()
    assert(a1.getLong(0) == a2.getLong(0), "same salt → same split")
    val b = Experiment.abTest(ev(rows: _*), "other-salt", "purchase", 1).head()
    // 30 users: a different salt virtually certainly shifts the split
    assert(a1.getLong(0) != b.getLong(0) || a1.getLong(2) != b.getLong(2))
  }

  test("degenerate pools (all or none converted) yield NULL z, not NaN") {
    val all = (0L until 20L).map(u => (u, "purchase"))
    val r1 = Experiment.abTest(ev(all: _*), "s1", "purchase", 1).head()
    assert(r1.isNullAt(6), "p_pool = 1 → z undefined → NULL")
    val none = (0L until 20L).map(u => (u, "view"))
    val r2 = Experiment.abTest(ev(none: _*), "s1", "purchase", 1).head()
    assert(r2.isNullAt(6), "p_pool = 0 → z undefined → NULL")
  }

  test("chiSquare matches the hand-computed 2×2 statistic; independence → 0") {
    // contingency [[30,10],[10,30]]: n=80, all marginals 40, E=20 per
    // cell, chi2 = 4·(10²/20) = 20, dof = 1
    val rows =
      Seq.fill(30)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(30)(("y", "v"))
    val out = Experiment.chiSquare(rows.toDF("a", "b"), col("a"), col("b")).head()
    assert(out.getLong(3) == 1L && out.getDouble(4) == 20.0, out.toString)
    // perfectly proportional table → chi2 exactly 0
    val indep =
      Seq.fill(20)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(40)(("y", "u")) ++ Seq.fill(20)(("y", "v"))
    val z = Experiment.chiSquare(indep.toDF("a", "b"), col("a"), col("b")).head()
    assert(z.getDouble(4) == 0.0, z.toString)
    // null categories drop out rather than forming a null cell
    val withNull = Seq(("x", Some("u")), ("x", None), ("y", Some("u")))
    val wn = Experiment.chiSquare(withNull.toDF("a", "b"), col("a"), col("b")).head()
    assert(wn.getLong(2) == 2L && wn.getLong(1) == 1L)
    // ABSENT grid cells still contribute (0−E)²/E = E — dropping them
    // understates χ² exactly when dependence is strongest. Hand case:
    // (x,1)=10,(x,2)=10,(y,1)=10, (y,2) never occurs → E(y,2)=10/3
    // and χ² = 0.833333 + 1.666667 + 1.666667 + 3.333333 = 7.5
    val sparse = Seq.fill(10)(("x", "1")) ++ Seq.fill(10)(("x", "2")) ++
      Seq.fill(10)(("y", "1"))
    val sp = Experiment.chiSquare(sparse.toDF("a", "b"), col("a"), col("b")).head()
    assert(sp.getLong(2) == 4L, "n_cells counts the full grid")
    assert(sp.getDouble(4) == 7.5, s"zero cell must contribute its E: $sp")
  }

  test("cohensKappa: perfect → 1, chance-level → ~0, constant raters → NULL") {
    def df(rows: Seq[(Boolean, Boolean)]) = rows.toDF("ra", "rb")
    val perfect = Experiment.cohensKappa(
      df(Seq.fill(10)((true, true)) ++ Seq.fill(10)((false, false))),
      col("ra"), col("rb")).head()
    assert(perfect.getDouble(4) == 1.0)
    // independent raters at 50/50: agreement = chance → κ = 0
    val chance = Experiment.cohensKappa(
      df(Seq((true, true), (true, false), (false, true), (false, false))),
      col("ra"), col("rb")).head()
    assert(chance.getDouble(4) == 0.0)
    // both raters constant-true: p_e = 1 → κ undefined → NULL
    val const = Experiment.cohensKappa(
      df(Seq.fill(5)((true, true))), col("ra"), col("rb")).head()
    assert(const.isNullAt(4))
    // hand value: n=10, n11=4, n00=3, na=5, nb=6 → po=.7, pe=.5, κ=.4
    val hand = Experiment.cohensKappa(
      df(Seq.fill(4)((true, true)) ++ Seq.fill(3)((false, false)) ++
        Seq.fill(1)((true, false)) ++ Seq.fill(2)((false, true))),
      col("ra"), col("rb")).head()
    assert(hand.getDouble(4) == 0.4, hand.toString)
  }

  test("cupedAbTest: correlated covariate cuts variance, uncorrelated leaves it") {
    import java.sql.Timestamp
    def ev(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("user_id", "t", "value")
        .select(col("user_id"), timestamp_micros(col("t") * 1000000L).as("ts"),
          col("value"))
    val split = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    // strong pre/post correlation: post = 2·pre + small per-user offset
    val users = (1L to 40L)
    val correlated = users.flatMap { u =>
      val pre = (u % 7 + 1).toDouble
      Seq((u, 0L, pre), (u, split + 10L, 2.0 * pre + (u % 3) * 0.1))
    }
    val c = Experiment.cupedAbTest(ev(correlated), "s1", "2024-01-16 00:00:00").head()
    val (varY, varAdj, red) = (c.getDouble(5), c.getDouble(6), c.getDouble(7))
    assert(varAdj < varY * 0.2,
      s"a post = 2·pre + noise covariate must slash variance: $c")
    assert(red > 0.8 && red <= 1.0)
    // theta should sit near the true slope 2
    assert(math.abs(c.getDouble(2) - 2.0) < 0.2, s"theta ≈ 2: $c")
    // uncorrelated covariate: adjustment must not manufacture variance
    // reduction (theta ≈ 0, var_y_adj ≈ var_y)
    val uncorr = users.flatMap { u =>
      Seq((u, 0L, (u % 2).toDouble), (u, split + 10L, (u % 5).toDouble))
    }
    val un = Experiment.cupedAbTest(ev(uncorr), "s1", "2024-01-16 00:00:00").head()
    assert(math.abs(un.getDouble(7)) < 0.2, s"no correlation → no reduction: $un")
  }

  test("abPower: textbook n at p=0.5/MDE=0.1; smaller MDEs need more units") {
    // 10 of 20 users convert → base rate 0.5
    val rows = (0L until 20L).map(u => (u, if (u < 10) "purchase" else "view"))
    val out = Experiment.abPower(ev(rows: _*), "purchase", 1,
      mdes = Seq(0.05, 0.1)).collect()
    assert(out.forall(_.getDouble(1) == 0.5))
    // independent hand calculation of the standard formula at p1=0.5,
    // p2=0.6: n = (1.959964·√(2·.55·.45) + 0.841621·√(.25+.24))²/0.01
    val expect = math.ceil(math.pow(
      1.959964 * math.sqrt(2 * 0.55 * 0.45) +
        0.841621 * math.sqrt(0.5 * 0.5 + 0.6 * 0.4), 2) / 0.01).toLong
    val n01 = out.find(_.getDouble(2) == 0.1).get.getLong(3)
    assert(n01 == expect, s"expected $expect, got $n01")
    val n005 = out.find(_.getDouble(2) == 0.05).get.getLong(3)
    assert(n005 > 3 * n01, "halving the MDE roughly quadruples n")
    // unreachable lift (p2 >= 1) → NULL, not a bogus finite n
    val allConv = (0L until 10L).map(u => (u, "purchase"))
    val un = Experiment.abPower(ev(allConv: _*), "purchase", 1, mdes = Seq(0.5))
      .head()
    assert(un.isNullAt(3))
  }

  test("minConversions threshold gates the conversion flag") {
    val rows = Seq((1L, "purchase"), (1L, "purchase"), (2L, "purchase"))
    val out = Experiment.abTest(ev(rows: _*), "s1", "purchase", 2).head()
    // exactly one user (user 1) reaches 2 purchases
    assert(out.getLong(1) + out.getLong(3) == 1L)
  }

  test("bhAdjust: the textbook step-up — k*=2 at these five p-values") {
    import org.apache.spark.sql.functions._
    val tests = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.165),
      ("t4", 0.205), ("t5", 0.396)).toDF("test", "p")
    val out = graft.operators.Experiment.bhAdjust(tests, "test", "p", 0.05)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out("t1") == ((0.05, true)) && out("t2") == ((0.05, true)))
    // step-up: t3's raw 0.275 is overridden by t4's smaller 0.25625
    assert(out("t3") == ((0.25625, false)))
    assert(out("t4") == ((0.25625, false)))
    assert(out("t5") == ((0.396, false)))
  }

  test("bhAdjust: NULL p passes through unranked; bounded-domain guard raises") {
    import org.apache.spark.sql.functions._
    val tests = Seq(("a", Some(0.01)), ("b", None)).toDF("test", "p")
    val out = graft.operators.Experiment.bhAdjust(tests, "test", "p", 0.05)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("b").isNullAt(4) && !out("b").getBoolean(5))
    assert(out("a").getLong(3) == 1L, "m counts only testable rows")
    val many = spark.range(100).select(col("id").cast("string").as("test"),
      (col("id").cast("double") / 1000).as("p"))
    val ex = intercept[Exception] {
      graft.operators.Experiment.bhAdjust(many, "test", "p",
        alpha = 0.05, domainLimit = 10L).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("Experiment.bhAdjust"))
    intercept[IllegalArgumentException] {
      graft.operators.Experiment.bhAdjust(tests, "test", "p", alpha = 0.0)
    }
  }

  test("metricZTests: a real shift tests significant; degenerate lanes go NULL") {
    import org.apache.spark.sql.functions._
    val rows =
      (1 to 50).map(i => ("shifted", i % 2 == 0, if (i % 2 == 0) 10.0 + (i % 5) else 50.0 + (i % 5))) ++
      (1 to 50).map(i => ("nullish", i % 2 == 0, (i % 7).toDouble)) ++
      Seq(("tiny", true, 1.0), ("tiny", false, 2.0)) ++          // n<2 per arm
      (1 to 10).map(_ => ("constant", true, 5.0)) ++             // zero variance
      (1 to 10).map(_ => ("constant", false, 5.0))
    val df = rows.toDF("metric", "isa", "v")
    val out = graft.operators.Experiment.metricZTests(df,
      col("metric"), col("v"), col("isa"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("shifted").getDouble(5) < -20.0, "a 40-point shift is a huge |z|")
    assert(out("shifted").getDouble(6) == 0.0, "p rounds to 0 at 9 dp")
    assert(math.abs(out("nullish").getDouble(5)) < 2.0)
    assert(out("tiny").isNullAt(5) && out("tiny").isNullAt(6))
    assert(out("constant").isNullAt(5), "zero pooled variance -> NULL, never Inf")
  }
}
