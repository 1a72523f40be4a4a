package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CountMin

/** Count-Min sketch laws: never undercounts, linear under union, and
  * collision pressure degrades to overestimates — never to silence.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exactCounts(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private val docs = Seq(
    (1L, "a a a b b c"), (2L, "a b d d"), (3L, "e e e e c a")
  ).toDF("doc_id", "text")
  // exact: a=5 b=3 c=2 d=2 e=4

  test("estimates never undercount, and are exact at ample width") {
    val want = exactCounts(docs)
    val got = CountMin.estimates(docs, Seq("a", "b", "c", "d", "e", "zzz"),
      depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, n) <- got) assert(n >= want.getOrElse(t, 0L), s"undercount on $t")
    // width 4096 over a 5-word vocabulary: no collisions in practice —
    // deterministic hashing makes this a stable exact-equality pin
    assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 2L,
      "e" -> 4L, "zzz" -> 0L))
  }

  test("collision pressure (width=2, depth=1) overestimates, bounded by n") {
    val want = exactCounts(docs)
    val total = want.values.sum
    val got = CountMin.estimates(docs, Seq("a", "b", "c", "d", "e"),
      depth = 1, width = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, n) <- got) {
      assert(n >= want(t), s"undercount on $t")
      assert(n <= total, s"estimate above the stream length on $t")
    }
  }

  test("linearity: counters of a union are the cell-wise sum of the parts") {
    val a = docs.filter(col("doc_id") <= 2)
    val b = docs.filter(col("doc_id") > 2)
    val merged = CountMin.counters(a, 4, 64)
      .unionAll(CountMin.counters(b, 4, 64))
      .groupBy("d", "bucket").agg(sum("n").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = CountMin.counters(docs, 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("counter table is bounded by depth*width") {
    val big = Seq.tabulate(500)(i => (i.toLong, s"w$i x$i y$i")).toDF("doc_id", "text")
    assert(CountMin.counters(big, 3, 16).count() <= 3L * 16L)
  }

  test("joinSizeEstimate never undercounts, exact at ample width, nulls skip") {
    val a = Seq((1L, Some(10L)), (2L, Some(10L)), (3L, Some(20L)), (4L, None))
      .toDF("id", "k")
    val b = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(20L)), (4L, Some(30L)),
      (5L, None)).toDF("id", "k")
    // exact |a join b on k|: key 10 -> 2*1, key 20 -> 1*2 = 4; NULLs never match
    val exact = a.join(b, "k").count()
    assert(exact == 4L)
    val est = CountMin.joinSizeEstimate(a, "k", b, "k", depth = 4, width = 4096)
      .head().getString(0).toLong
    assert(est >= exact)
    assert(est == 4L) // 3-key domain in a 4096 grid: collision-free, exact
  }

  test("joinSizeEstimate self-join gives the sum of squared key counts") {
    val df = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val est = CountMin.joinSizeEstimate(df, "k", df, "k", depth = 4, width = 4096)
      .head().getString(0).toLong
    assert(est == 25L + 9L + 1L)
  }

  test("joinSizeEstimate: disjoint key sets may estimate 0 and never error") {
    val a = Seq((1L, 1L)).toDF("id", "k")
    val b = Seq.empty[(Long, Long)].toDF("id", "k")
    val est = CountMin.joinSizeEstimate(a, "k", b, "k")
      .head().getString(0).toLong
    assert(est == 0L)
  }

  test("parameter validation") {
    intercept[IllegalArgumentException](CountMin.counters(docs, 0, 64))
    intercept[IllegalArgumentException](CountMin.counters(docs, 4, 1))
    intercept[IllegalArgumentException](CountMin.estimates(docs, Nil))
  }
}
