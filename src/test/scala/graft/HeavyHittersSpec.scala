package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Two-pass exact heavy hitters: the Misra–Gries candidate pass plus
  * the exact recount must equal the exact groupBy top-k wherever the
  * guarantee holds, and must FAIL LOUDLY (never silently approximate)
  * where it provably may not.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exactTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("matches the exact top-k on the documents corpus") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = HeavyHitters.topTokens(docs, 20, capacity = 1024)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val want = exactTopK(docs, 20).zipWithIndex
      .map { case ((w, n), i) => (i + 1, w, n) }
    assert(got == want)
  }

  test("exact with ties and a no-eviction sketch (vocab <= capacity)") {
    val docs = Seq.tabulate(30)(i => (i.toLong, s"a b b c${i % 3}"))
      .toDF("doc_id", "text")
    val got = HeavyHitters.topTokens(docs, 4, capacity = 64)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val want = exactTopK(docs, 4).zipWithIndex
      .map { case ((w, n), i) => (i + 1, w, n) }
    assert(got == want)
  }

  test("a provably-inexact result raises instead of silently approximating") {
    // 500 distinct singleton words, no heavy hitter: any capacity-8
    // sketch evicts constantly and no candidate count can beat the
    // n/(capacity+1) bound — the operator must refuse
    val docs = Seq.tabulate(500)(i => (i.toLong, s"w$i")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      HeavyHitters.topTokens(docs, 5, capacity = 8)
    }
    assert(e.getMessage.contains("Raise capacity"))
  }

  test("an empty corpus returns an empty frame, not an error") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.topTokens(docs, 5, capacity = 8).count() == 0L)
  }

  test("eviction pressure with genuine heavy hitters stays exact") {
    // 3 hot words (counts 400/300/200) drowned in 600 singletons: a
    // capacity-64 sketch evicts, but the hot counts clear the bound
    val rows =
      Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2") ++ Seq.fill(200)("hot3") ++
        Seq.tabulate(600)(i => s"u$i")
    val docs = rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = HeavyHitters.topTokens(docs, 3, capacity = 64)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "hot1", 400L), (2, "hot2", 300L), (3, "hot3", 200L)))
  }

  test("keySkew: heavy key surfaces with its share; nulls count as (null)") {
    // one user owns 60% of rows — the salting case; two null keys
    val rows = Seq.fill(60)(Some(7L)) ++ (1 to 38).map(i => Some(100L + i)) ++
      Seq(None, None)
    val df = rows.zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val got = HeavyHitters.keySkew(df, "user_id", 3, capacity = 256)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.head == (1, "7", 60L, 60.0))
    assert(got(1) == (2, "(null)", 2L, 2.0))
    assert(got.length == 3 && got(2)._3 == 1L)
  }

  test("keySkew under eviction pressure stays exact for a provable heavy key") {
    val rows = Seq.fill(500)(1L) ++ (1 to 600).map(i => 1000L + i)
    val df = rows.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("event_id", "user_id")
    val got = HeavyHitters.keySkew(df, "user_id", 1, capacity = 64)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("1", 500L)))
  }

  test("MG merge law: merged summaries retain every item above n/(c+1)") {
    val mg = new HeavyHitters.MisraGries(4)
    val xs = Seq.fill(30)("a") ++ Seq.tabulate(10)(i => s"l$i")
    val ys = Seq.fill(25)("b") ++ Seq.tabulate(10)(i => s"r$i")
    val bx = xs.foldLeft(mg.zero)(mg.reduce)
    val by = ys.foldLeft(mg.zero)(mg.reduce)
    val m = mg.merge(bx, by)
    // n = 75, bound = 75/5 = 15 — "a" (30) and "b" (25) must survive
    assert(m._1.contains("a") && m._1.contains("b"))
    assert(m._1.size <= 4)
    assert(m._2) // evictions definitely fired
  }

  test("provableTop1: exact lane is layout-independent under eviction") {
    import spark.implicits._
    // 6400 singletons + one key at 101: n = 6501, capacity 64 →
    // bound = 6501/65 = 100.02; 101·65 = 6565 > 6501 → provable, and
    // MUST return the same exact (key, n) under every partition layout
    val rows = (Seq.fill(101)("hot") ++ (1 to 6400).map(i => s"u$i"))
    Seq(1, 3, 16, 32).foreach { parts =>
      val vals = rows.toDF("w").repartition(parts)
      val (top, n) = HeavyHitters.provableTop1(vals, capacity = 64)
      assert(n == 6501L)
      assert(top.contains(("hot", 101L)), s"parts=$parts got $top")
    }
  }

  test("provableTop1: the boundary count m·(c+1) == n refuses, every layout") {
    import spark.implicits._
    // hot = 100, n = 6500, capacity 64 → 100·65 = 6500, NOT > n —
    // the exact lane must refuse identically under every layout (this
    // is the run-to-run flip hazard the advisor had: a key sitting ON
    // n/(capacity+1) may or may not survive the sketch, so no lane
    // may depend on whether it did)
    val rows = (Seq.fill(100)("hot") ++ (1 to 6400).map(i => s"u$i"))
    Seq(1, 3, 16, 32).foreach { parts =>
      val vals = rows.toDF("w").repartition(parts)
      val (top, n) = HeavyHitters.provableTop1(vals, capacity = 64)
      assert(n == 6500L)
      assert(top.isEmpty, s"parts=$parts must refuse, got $top")
    }
  }

  test("provableTop1: empty input and no-eviction smalls") {
    import spark.implicits._
    val (t0, n0) = HeavyHitters.provableTop1(
      Seq.empty[String].toDF("w"), capacity = 8)
    assert(t0.isEmpty && n0 == 0L)
    // tiny domain, no eviction: max ≥ n/#keys > n/(cap+1) always holds,
    // so a non-empty input under capacity is ALWAYS provable
    val (t1, n1) = HeavyHitters.provableTop1(
      Seq("a", "b", "b", "c").toDF("w"), capacity = 8)
    assert(n1 == 4L && t1.contains(("b", 2L)))
    // total tie: (n desc, key asc) picks the smallest key
    val (t2, _) = HeavyHitters.provableTop1(
      Seq("z", "a").toDF("w"), capacity = 8)
    assert(t2.contains(("a", 1L)))
  }
}
