package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int = 5): Map[Long, (Long, Double)] =
    Graph.pageRank(pairs.toDF("doc_a", "doc_b"), iters).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("star: the hub outranks every leaf; leaves tie") {
    val r = ranks(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(r(0L)._1 == 3 && r(1L)._1 == 1)
    assert(r(0L)._2 > r(1L)._2, "hub must outrank leaves")
    assert(r(1L)._2 == r(2L)._2 && r(2L)._2 == r(3L)._2, "leaves are symmetric")
  }

  test("path: the middle outranks the endpoints; mass sums to ~1") {
    val r = ranks(Seq((1L, 2L), (2L, 3L)))
    assert(r(2L)._2 > r(1L)._2 && r(1L)._2 == r(3L)._2)
    val total = r.values.map(_._2).sum
    assert(math.abs(total - 1.0) < 1e-4, s"rank mass $total")
  }

  test("regular components converge to uniform 1/n (the corpus shape)") {
    // a pair and a triangle: 1-regular and 2-regular — uniform is the
    // fixpoint for both, which is why dup_pagerank is flat on the
    // synthetic corpus
    val r = ranks(Seq((0L, 1L), (10L, 11L), (11L, 12L), (10L, 12L)))
    val expect = BigDecimal(1.0 / 5).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.values.forall(v => math.abs(v._2 - expect) < 1e-9))
  }

  test("five rounds equal a driver-side reference iteration with the same quantization") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L), (4L, 5L))
    def q9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = adj.size
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var r = adj.keys.map(k => k -> q9(1.0 / n)).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.HashMap.empty[Long, BigDecimal]
        .withDefaultValue(BigDecimal(0))
      for ((src, dsts) <- adj; dst <- dsts)
        contrib(dst) = contrib(dst) + q9(r(src).toDouble / deg(src))
      r = adj.keys.map(k =>
        k -> q9((1.0 - 0.85) / n + 0.85 * contrib(k).toDouble)).toMap
    }
    val got = ranks(pairs)
    for ((k, v) <- r) {
      val expect = v.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(k)._2 === expect, s"node $k")
    }
  }

  test("pageRank is total on an empty pair set") {
    assert(ranks(Seq.empty).isEmpty)
  }

  private def tris(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangles(pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangles: K4 has 4, each vertex in 3; chains and stars have none") {
    // K4 on {1,2,3,4} plus a chain 5-6-7 (A≈B≈C without A≈C) plus a
    // star at 8 — only the clique contributes
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = tris(k4 ++ Seq((5L, 6L), (6L, 7L), (8L, 9L), (8L, 10L), (8L, 11L)))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 vertices sit in 3 triangles each, nothing else in any: $got")
    assert(got.values.sum == 12L, "4 triangles x 3 vertices")
  }

  test("triangles: counts are orientation-proof on a skewed hub graph") {
    // hub 0 connected to 1..10, plus edges (1,2) and (2,3): triangles
    // (0,1,2) and (0,2,3). The hub's raw degree is 10 but each triangle
    // must still be counted exactly once.
    val hub = (1L to 10L).map(v => (0L, v))
    val got = tris(hub ++ Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 2L, 3L -> 1L), got.toString)
    // duplicate and reversed pair rows must not double-count
    val dup = tris(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 2L)))
    assert(dup == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles is total on empty and triangle-free inputs") {
    assert(tris(Seq.empty).isEmpty)
    assert(tris(Seq((1L, 2L), (3L, 4L))).isEmpty)
  }
}
