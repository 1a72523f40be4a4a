package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 vectors in 6-d with variance concentrated on two axes
  private lazy val emb = (0 until 40).map { i =>
    val main = (i % 7).toFloat - 3f
    val minor = (i % 3).toFloat - 1f
    (i.toLong, Array(main * 2f, minor, main, 0.1f * (i % 2), 0f, minor * 0.5f).toSeq)
  }.toDF("vec_id", "embedding")

  test("fitComponents: unit-norm, pairwise-orthogonal components") {
    val comps = Pca.fitComponents(emb, k = 3)
    assert(comps.length == 3 && comps.forall(_.length == 6))
    for (c <- comps) {
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"component norm $norm")
    }
    for (i <- 0 until 3; j <- i + 1 until 3) {
      val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-9, s"components $i,$j not orthogonal: $dot")
    }
  }

  test("project: matches a driver-side dot fold against the same components") {
    val comps = Pca.fitComponents(emb, k = 2)
    val got = Pca.project(emb, comps).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for ((id, v) <- vecs; j <- 0 until 2) {
      // identical left-to-right fold, then the same 6-dp rounding
      var acc = 0.0
      var d = 0
      while (d < v.length) { acc += v(d) * comps(j)(d); d += 1 }
      val want = BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got((id, j)) == want, s"vec $id comp $j: ${got((id, j))} vs $want")
    }
  }

  test("project: captured variance is ordered and dominates the trailing axes") {
    val comps = Pca.fitComponents(emb, k = 3)
    val proj = Pca.project(emb, comps).collect()
      .groupBy(_.getInt(1)).view
      .mapValues { rows =>
        val xs = rows.map(_.getDouble(2))
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum / xs.length
      }.toMap
    assert(proj(0) >= proj(1) && proj(1) >= proj(2),
      s"component variances not descending: $proj")
  }
}
