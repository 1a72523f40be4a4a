package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pq

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // hand model: 2 subspaces of dim 2, 4 codes each — small enough to
  // reason about every assignment by eye
  private val hand = Pq.Model(subDim = 2, codebooks = Array(
    Array(Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0), Array(10.0, 10.0)),
    Array(Array(0.0, 0.0), Array(5.0, 5.0), Array(-1.0, 0.0), Array(0.0, -1.0))))

  private def df(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")

  test("encode: centroid-exact vectors get their own code and zero error") {
    // v = (codebook0 code 1) ++ (codebook1 code 2) → packed 1 + 2·16
    val d = df(7L -> Seq(1f, 0f, -1f, 0f))
    val r = Pq.encode(d, hand).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == (1L + 2L * 16L), s"packed ${r(0).getLong(1)}")
    assert(r(0).getDouble(2) == 0.0)
  }

  test("encode: nearest centroid wins per subspace, qerr sums residuals") {
    // sub0 (0.9, 0.1): nearest is (1,0) d=0.02; sub1 (4,4): nearest (5,5) d=2
    val d = df(1L -> Seq(0.9f, 0.1f, 4f, 4f))
    val r = Pq.encode(d, hand).collect()(0)
    assert(r.getLong(1) == (1L + 1L * 16L))
    // float 0.9f/0.1f widen to doubles with float noise; bound not equality
    assert(math.abs(r.getDouble(2) - 2.02) < 1e-6, s"qerr ${r.getDouble(2)}")
  }

  test("encode: distance ties break to the lowest code") {
    val tied = Pq.Model(subDim = 2, codebooks = Array(
      Array(Array(2.0, 0.0), Array(0.0, 0.0), Array(2.0, 0.0)), // codes 0,2 identical
      Array(Array(0.0, 0.0))))
    // sub0 (2,0) is bit-exact distance 0 to codes 0 AND 2 → code 0
    val r = Pq.encode(df(1L -> Seq(2f, 0f, 0f, 0f)), tied).collect()(0)
    assert(r.getLong(1) == 0L)
  }

  test("decode inverts the packing: reconstruction is the chosen centroids") {
    val packed = 1L + 2L * 16L
    assert(Pq.decode(packed, hand).toSeq == Seq(1.0, 0.0, -1.0, 0.0))
  }

  test("adcTopK equals exact distance to each row's reconstruction") {
    val rows = Seq(
      1L -> Seq(1f, 0f, 5f, 5f),
      2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(10f, 10f, 0f, -1f),
      4L -> Seq(0f, 0f, -1f, 0f))
    val q = Array(0.5, 0.5, 1.0, 1.0)
    val enc = Pq.encode(df(rows: _*), hand)
    val got = Pq.adcTopK(enc, hand, q, topK = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.size == 4)
    for ((id, adc) <- got) {
      val packed = enc.filter(col("vec_id") === id).collect()(0).getLong(1)
      val rec = Pq.decode(packed, hand)
      val exact = q.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc - exact) < 1e-6, s"vec $id adc $adc vs exact $exact")
    }
  }

  test("adcTopK: ascending by distance with vec_id tie-break, limit honored") {
    // vecs 2 and 4 decode to different cells; craft two rows in the SAME
    // cell → identical ADC, tie must order by vec_id
    val rows = Seq(9L -> Seq(0f, 0f, 0f, 0f), 3L -> Seq(0f, 0f, 0f, 0f),
      5L -> Seq(10f, 10f, 5f, 5f))
    val q = Array(0.0, 0.0, 0.0, 0.0)
    val out = Pq.adcTopK(Pq.encode(df(rows: _*), hand), hand, q, topK = 2).collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 3L && out(1).getLong(0) == 9L)
    assert(out(0).getDouble(2) == 0.0 && out(1).getDouble(2) == 0.0)
  }

  test("fit recovers planted per-subspace clusters; encode error is tiny") {
    // 2 subspaces × 4 planted centers, points jittered ±0.01 around them
    val centers = Array(Array(0.0, 0.0), Array(8.0, 0.0), Array(0.0, 8.0), Array(8.0, 8.0))
    val rows = (0 until 256).map { i =>
      val c0 = centers(i % 4); val c1 = centers((i / 4) % 4)
      val j = (i % 5) * 0.004 - 0.008
      (i.toLong, Seq((c0(0) + j).toFloat, (c0(1) - j).toFloat,
        (c1(0) - j).toFloat, (c1(1) + j).toFloat))
    }
    val d = df(rows: _*)
    val m = Pq.fit(d, dim = 4, numSub = 2, k = 4)
    assert(m.numSubspaces == 2 && m.subDim == 2)
    val maxErr = Pq.encode(d, m).agg(max(col("qerr"))).collect()(0).getDouble(0)
    // planted spread within a cluster is ≤ 0.016 per axis → sq error ≤ ~1e-3;
    // a collapsed codebook would leave ≥ 32 (inter-center distance²)
    assert(maxErr < 0.01, s"max quantization error $maxErr — codebook missed a cluster")
  }

  test("fit caps its training sample but encode still covers every row") {
    val rows = (0 until 500).map(i => (i.toLong, Seq.fill(4)((i % 7).toFloat)))
    val m = Pq.fit(df(rows: _*), dim = 4, numSub = 2, k = 2)
    assert(Pq.encode(df(rows: _*), m).count() == 500)
  }

  test("totality: empty input encodes and searches to empty") {
    val empty = spark.emptyDataset[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Pq.encode(empty, hand).count() == 0)
    assert(Pq.adcTopK(Pq.encode(empty, hand), hand, Array(0.0, 0.0, 0.0, 0.0), 5).count() == 0)
  }

  // --- IVF·PQ composition ---

  private def ivfFixture = {
    // three well-separated clumps so the coarse cells are unambiguous
    val rows = (0 until 30).map { i =>
      val base = (i % 3) * 10f
      (i.toLong, Seq(base + (i % 5) * 0.1f, base, base - (i % 4) * 0.1f, base))
    }
    val e = df(rows: _*)
    val idx = graft.operators.KMeansIndex.build(e, k = 3, seed = 7L)
    val m = Pq.fit(e, dim = 4, numSub = 2, k = 4)
    val enc = idx.assigned.select(col("vec_id"), col("cell"),
      Pq.packedCodeExpr(col("embedding"), m).as("pq_code"))
    (idx, m, enc)
  }

  test("ivfAdcTopK with nProbe = k equals plain adcTopK over everything") {
    val (idx, m, enc) = ivfFixture
    val q = Array(10.0, 10.0, 10.0, 10.0)
    val full = Pq.adcTopK(enc.select(col("vec_id"), col("pq_code")), m, q, topK = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val ivf = Pq.ivfAdcTopK(enc, idx.centroids, m, q, topK = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(ivf == full)
  }

  test("ivfAdcTopK scans only probed cells: results are a subset of them") {
    val (idx, m, enc) = ivfFixture
    val q = Array(0.5, 0.0, 0.0, 0.0)
    val got = Pq.ivfAdcTopK(enc, idx.centroids, m, q, topK = 30, nProbe = 1)
    val cells = got.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.size == 1, s"nProbe=1 must confine the scan to one cell, got $cells")
    // and every member of that cell is rankable — nothing silently dropped
    val cellN = enc.filter(col("cell") === cells.head).count()
    assert(got.count() == math.min(30L, cellN))
  }

  test("ivfAdcTopK totality: empty encoded table searches to empty") {
    val (idx, m, _) = ivfFixture
    val empty = spark.emptyDataset[(Long, Int, Long)].toDF("vec_id", "cell", "pq_code")
    assert(Pq.ivfAdcTopK(empty, idx.centroids, m,
      Array(0.0, 0.0, 0.0, 0.0), 5, nProbe = 2).count() == 0)
  }
}
