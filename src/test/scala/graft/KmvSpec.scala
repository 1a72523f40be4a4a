package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Kmv
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** KMV distinct sketch: exact below k, bounded error above it, and
  * the theta-sketch merge law (bottom-k of a union equals bottom-k of
  * merged bottom-ks) as a ScalaCheck property.
  */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("below k the sketch is the distinct set: exact count") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"w${i % 17} filler"))
      .toDF("doc_id", "text")
    val r = Kmv.distinctTokens(docs, k = 256).head()
    assert(r.getLong(1) == 18L) // 17 w-words + "filler"
    assert(r.getDouble(2) == 18.0)
  }

  test("above k the estimate lands within the ~1/sqrt(k-2) error band") {
    val docs = Seq.tabulate(5000)(i => (i.toLong, s"u$i"))
      .toDF("doc_id", "text") // 5000 distinct tokens
    val r = Kmv.distinctTokens(docs, k = 512).head()
    assert(r.getLong(1) == 512L)
    val est = r.getDouble(2)
    // 3 standard errors: 3 * 5000/sqrt(510) ≈ 664
    assert(math.abs(est - 5000.0) < 700.0, s"est $est too far from 5000")
  }

  test("duplicates do not move the estimate (distinct semantics)") {
    val once = Seq.tabulate(3000)(i => (i.toLong, s"u$i")).toDF("doc_id", "text")
    val thrice = Seq.tabulate(9000)(i => (i.toLong, s"u${i % 3000}"))
      .toDF("doc_id", "text")
    val a = Kmv.distinctTokens(once, 256).head().getDouble(2)
    val b = Kmv.distinctTokens(thrice, 256).head().getDouble(2)
    assert(a == b)
  }

  test("deterministic across runs") {
    val docs = Seq.tabulate(4000)(i => (i.toLong, s"v$i")).toDF("doc_id", "text")
    val a = Kmv.distinctTokens(docs, 128).collect().toSeq
    val b = Kmv.distinctTokens(docs, 128).collect().toSeq
    assert(a == b)
  }

  test("merge law: bottom-k of union == merge of bottom-ks (property)") {
    val agg = new Kmv.BottomK(8)
    val gen = Gen.listOf(Gen.chooseNum(0L, 40L))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(gen, gen) { (xs: List[Long], ys: List[Long]) =>
        val direct = (xs ++ ys).distinct.sorted.take(8).toVector
        val merged = agg.merge(
          xs.foldLeft(agg.zero)(agg.reduce),
          ys.foldLeft(agg.zero)(agg.reduce))
        merged == direct
      })
    assert(res.passed, res.status.toString)
  }

  test("overlapEstimate exact lane: small sets give exact union/jaccard/intersect") {
    val a = (1 to 30).map(i => (i.toLong, s"u$i")).toDF("id", "k")
    val b = (21 to 50).map(i => (i.toLong, s"u$i")).toDF("id", "k")
    // |A|=30, |B|=30, A∩B = {21..30} = 10, A∪B = 50, J = 10/50 = 0.2
    val r = Kmv.overlapEstimate(a, "k", b, "k", k = 256).head()
    assert(r.getDouble(1) == 50.0)
    assert(r.getDouble(2) == 0.2)
    assert(r.getDouble(3) == 10.0)
  }

  test("overlapEstimate estimator lane: big overlap lands in the error band") {
    val a = (1 to 6000).map(i => (i.toLong, s"u$i")).toDF("id", "k")
    val b = (3001 to 9000).map(i => (i.toLong, s"u$i")).toDF("id", "k")
    // true: union 9000, intersect 3000, J = 1/3
    val r = Kmv.overlapEstimate(a, "k", b, "k", k = 512).head()
    assert(math.abs(r.getDouble(1) - 9000.0) < 1300.0, s"union ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 1.0 / 3) < 0.08, s"jaccard ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 3000.0) < 700.0, s"intersect ${r.getDouble(3)}")
  }

  test("overlapEstimate: disjoint sets estimate zero overlap") {
    val a = (1 to 2000).map(i => (i.toLong, s"a$i")).toDF("id", "k")
    val b = (1 to 2000).map(i => (i.toLong, s"b$i")).toDF("id", "k")
    val r = Kmv.overlapEstimate(a, "k", b, "k", k = 256).head()
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("reduce keeps the buffer sorted, distinct and capped") {
    val agg = new Kmv.BottomK(4)
    val b = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(b == Vector(1L, 2L, 3L, 7L))
  }

  test("groupedJaccard: identical groups J=1, disjoint J=0, matches the pair form") {
    import spark.implicits._
    val rows =
      (1 to 100).map(i => ("ga", s"v$i")) ++
      (1 to 100).map(i => ("gb", s"v$i")) ++
      (201 to 300).map(i => ("gc", s"v$i"))
    val df = rows.toDF("g", "v")
    val got = Kmv.groupedJaccard(df, "g", "v", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == Set("ga" -> "gb", "ga" -> "gc", "gb" -> "gc"))
    // unions fit under k = 256: all three readouts are EXACT
    assert(got("ga" -> "gb") == ((100.0, 1.0, 100.0)), s"$got")
    assert(got("ga" -> "gc")._2 == 0.0 && got("ga" -> "gc")._1 == 200.0)
    // the per-group form must equal the single-pair operator on (ga, gb)
    val pair = Kmv.overlapEstimate(
      df.filter($"g" === "ga"), "v", df.filter($"g" === "gb"), "v", 256)
      .head()
    assert((pair.getDouble(1), pair.getDouble(2), pair.getDouble(3)) ==
      got("ga" -> "gb"))
  }

  test("groupedJaccard: the driver-bound group cap is checked, not trusted") {
    import spark.implicits._
    val df = (1 to 40).map(i => (s"g$i", "x")).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Kmv.groupedJaccard(df, "g", "v", k = 16, maxGroups = 8)
    }
  }

  test("groupedJaccard: the cap binds IN-PLAN, before the driver transfer") {
    import spark.implicits._
    // 10× the cap: 80 groups vs maxGroups = 8. The round-10 bug class
    // was a require AFTER .collect() — the driver had already
    // materialized every group's sketch when the check fired. The
    // transfer frame must carry a plan-level limit (CollectLimit /
    // GlobalLimit) and ship at most maxGroups + 1 rows.
    val df = (1 to 80).flatMap(i => Seq((s"g$i", "x"), (s"g$i", "y")))
      .toDF("g", "v")
    val transfer = Kmv.groupSketches(df, "g", "v", k = 16, maxGroups = 8)
    val plan = transfer.queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit") || plan.contains("GlobalLimit"),
      s"transfer plan has no limit node — the cap is post-hoc again:\n$plan")
    val rows = transfer.collect()
    assert(rows.length == 9,
      s"driver received ${rows.length} sketch rows; the bound is maxGroups+1 = 9")
    // and the public operator still fails loudly on the same input
    val ex = intercept[IllegalArgumentException] {
      Kmv.groupedJaccard(df, "g", "v", k = 16, maxGroups = 8)
    }
    assert(ex.getMessage.contains("maxGroups"))
    // green path unchanged: under the cap every group still pairs
    assert(Kmv.groupedJaccard(df.filter($"g".isin("g1", "g2", "g3")),
      "g", "v", k = 16, maxGroups = 8).count() == 3L)
  }

  test("groupedContainment: subset shows C(A→B)=1 where Jaccard hides it; exact lanes by hand") {
    import spark.implicits._
    // ga ⊂ gb (40 of gb's 160 values): Jaccard = 40/160 = 0.25 reads
    // "mostly different", containment(ga→gb) = 1.0 reads "ga is
    // redundant" — the directional signal is the operator's point.
    // All sketches sit below k = 256 → every lane is EXACT.
    val rows =
      (1 to 40).map(i => ("ga", s"v$i")) ++
      (1 to 160).map(i => ("gb", s"v$i")) ++
      (501 to 520).map(i => ("gc", s"v$i"))
    val df = rows.toDF("g", "v")
    val got = Kmv.groupedContainment(df, "g", "v", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5),
         r.getDouble(6), r.getDouble(7))).toMap
    assert(got.keySet == Set("ga" -> "gb", "ga" -> "gc", "gb" -> "gc"))
    // (a_est, b_est, intersect, contain_a_in_b, contain_b_in_a)
    assert(got("ga" -> "gb") == ((40.0, 160.0, 40.0, 1.0, 0.25)), s"$got")
    assert(got("ga" -> "gc") == ((40.0, 20.0, 0.0, 0.0, 0.0)), s"$got")
    assert(got("gb" -> "gc") == ((160.0, 20.0, 0.0, 0.0, 0.0)), s"$got")
    // its intersect column must equal the jaccard form's on every pair
    // (same sketches, same readout math)
    val jac = Kmv.groupedJaccard(df, "g", "v", k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5))
      .toMap
    got.foreach { case (pair, v) => assert(jac(pair) == v._3, s"$pair") }
    // driver-bound cap is the shared groupSketches discipline
    val wide = (1 to 40).map(i => (s"g$i", "x")).toDF("g", "v")
    val ex = intercept[IllegalArgumentException] {
      Kmv.groupedContainment(wide, "g", "v", k = 16, maxGroups = 8)
    }
    assert(ex.getMessage.contains("maxGroups"))
  }
}
