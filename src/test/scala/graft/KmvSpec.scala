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

  test("reduce keeps the buffer sorted, distinct and capped") {
    val agg = new Kmv.BottomK(4)
    val b = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(b == Vector(1L, 2L, 3L, 7L))
  }
}
