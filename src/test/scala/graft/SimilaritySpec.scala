package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Mirrors /root/reference/tests/test_similarity.py (values and
  * tolerances): known-value tests, zero-vector guard, monotonicity,
  * phi-weighted properties, dispatch errors.
  */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def score(metric: String, a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(VectorOps.similarity(metric)(col("a"), col("b")).as("s"))
      .head().getDouble(0)

  test("cosine: identical vectors → 1") {
    assert(math.abs(score("cosine", Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) - 1.0) < 1e-6)
  }
  test("cosine: orthogonal → 0") {
    assert(math.abs(score("cosine", Seq(1f, 0f), Seq(0f, 1f))) < 1e-6)
  }
  test("cosine: opposite → -1") {
    assert(math.abs(score("cosine", Seq(1f, 0f), Seq(-1f, 0f)) + 1.0) < 1e-6)
  }
  test("cosine: zero vector guarded, never NaN") {
    val s = score("cosine", Seq(0f, 0f), Seq(1f, 1f))
    assert(!s.isNaN && s == 0.0)
  }
  test("euclidean distance 3-4-5 → similarity 1/6") {
    assert(math.abs(score("euclidean", Seq(0f, 0f), Seq(3f, 4f)) - 1.0 / 6.0) < 1e-6)
  }
  test("euclidean: identical → 1") {
    assert(math.abs(score("euclidean", Seq(2f, 2f), Seq(2f, 2f)) - 1.0) < 1e-6)
  }
  test("dot product known value 32") {
    assert(math.abs(score("dot", Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)) - 32.0) < 1e-6)
  }
  test("monotonicity: closer vector scores higher (cosine, euclidean)") {
    for (m <- Seq("cosine", "euclidean")) {
      val near = score(m, Seq(1f, 1f, 0f), Seq(1f, 0.9f, 0f))
      val far = score(m, Seq(1f, 1f, 0f), Seq(-1f, 0f, 1f))
      assert(near > far, s"metric $m")
    }
  }
  test("phi_weighted: self-similarity ≈ 1 for phi-valued vector") {
    val v = Array.fill(4)(1.618f)
    val s = VectorOps.phiWeightedSimilarity(v, v)
    assert(math.abs(s - 1.0) < 1e-5)
  }
  test("phi_weighted: bounded in [-1, 1]") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val a = Array.fill(8)(rnd.nextFloat() * 4 - 2)
      val b = Array.fill(8)(rnd.nextFloat() * 4 - 2)
      val s = VectorOps.phiWeightedSimilarity(a, b)
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
  }
  test("phi_weighted: matches reference float64 formula on a known pair") {
    // independent scalar recomputation (same constants, straightforward loop)
    val a = Array(0.5f, 1.618f, 2.0f, 0.1f)
    val b = Array(0.6f, 1.6f, 2.1f, 0.05f)
    val viaUdf = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(VectorOps.similarity("phi_weighted")(col("a"), col("b"))).head().getDouble(0)
    assert(math.abs(viaUdf - VectorOps.phiWeightedSimilarity(a, b)) < 1e-12)
  }
  test("phi_weighted column path is a native expression — no UDF in the plan") {
    // parquet-backed: a local Seq constant-folds to LocalTableScan
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(VectorOps.similarity("phi_weighted")(
      col("embedding"), col("embedding")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("vecphisim") && !plan.contains("UDF"),
      s"plan was:\n$plan")
    assert(df.count() == 500)
  }

  test("dispatch: unknown metric → IllegalArgumentException") {
    intercept[IllegalArgumentException] {
      VectorOps.similarity("bogus")(col("a"), col("b"))
    }
  }
  test("similarity symmetric for all metrics") {
    for (m <- Seq("cosine", "euclidean", "dot", "phi_weighted")) {
      val ab = score(m, Seq(0.3f, 1.2f), Seq(1.1f, 0.2f))
      val ba = score(m, Seq(1.1f, 0.2f), Seq(0.3f, 1.2f))
      assert(math.abs(ab - ba) < 1e-9, s"metric $m")
    }
  }

  test("l2Normalize: unit norm, dot == cosine afterwards, zero-safe") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(-1.0f, 2.0f))).toDF("vec_id", "embedding")
    val n = df.select(col("vec_id"),
      VectorOps.l2Normalize(col("embedding")).as("u")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(n(1L) == Seq(0.6, 0.8))
    assert(n(2L) == Seq(0.0, 0.0)) // zero vector passes through, no NaN
    val norm3 = math.sqrt(n(3L).map(x => x * x).sum)
    assert(math.abs(norm3 - 1.0) < 1e-12)
    // after normalization, plain dot ranks identically to cosine
    val un = df.filter($"vec_id" =!= 2L)
      .select(VectorOps.l2Normalize(col("embedding")).as("u"), col("vec_id"))
    val both = un.as("a").crossJoin(un.as("b"))
      .select(
        VectorOps.dotProduct(col("a.u"), col("b.u")).as("dot"),
        VectorOps.cosineSimilarity(col("a.u"), col("b.u")).as("cos"))
      .collect()
    both.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("randomProject: linear, deterministic, and JL-distance-preserving in aggregate") {
    val dim = 64
    val rnd = new scala.util.Random(11)
    val vecs = (1 to 40).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val planes = graft.operators.Ann.hyperplanes(16, dim, 7L)
    val proj = vecs.select(col("vec_id"),
      VectorOps.randomProject(col("embedding"), planes).as("p"))
    val rows = proj.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.values.forall(_.length == 16), "m output dims")
    // linearity: proj(2v) == 2*proj(v)
    val doubled = vecs.select(col("vec_id"),
      VectorOps.randomProject(transform(col("embedding"),
        x => x * lit(2.0f)), planes).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    rows.foreach { case (id, p) =>
      p.zip(doubled(id)).foreach { case (a, b) =>
        assert(math.abs(2 * a - b) < 1e-6) }
    }
    // JL: mean squared-distance ratio over pairs near 1 (m=16 is coarse;
    // the MEAN is what the lemma bounds, individual pairs vary)
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val ratios = for {
      i <- 1L to 40L; j <- (i + 1) to 40L
    } yield sq(rows(i), rows(j)) / sq(orig(i), orig(j))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"JL mean distortion off: $mean")
    // dim mismatch fails loudly, not as an all-null projection
    val bad = vecs.select(VectorOps.randomProject(
      slice(col("embedding"), 1, 10), planes))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage.contains("randomProject") ||
      e.getCause != null && e.getCause.getMessage.contains("randomProject"))
    // a NULL embedding names itself in the error instead of raising a
    // null message (concat over a null size is null)
    val withNull = vecs.select(when(col("vec_id") === 1L, col("embedding"))
      .otherwise(lit(null).cast("array<float>")).as("embedding"))
    val e2 = intercept[Exception] {
      withNull.select(VectorOps.randomProject(col("embedding"), planes)).collect()
    }
    val msgs = Iterator.iterate[Throwable](e2)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("null embedding"), msgs)
  }

  test("rrfFuse: hand-computed fusion, single-list ids, deterministic ties") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val out = graft.operators.Search.rrfFuse(a, b, k0 = 60, topK = 10).collect()
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), r.getDouble(3))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(10L)._3 == r6(1.0 / 61 + 1.0 / 62))
    assert(byId(20L)._3 == r6(1.0 / 62 + 1.0 / 61))
    assert(byId(30L) == ((Some(3), None, r6(1.0 / 63)))) // lexical-only lane
    assert(byId(40L) == ((None, Some(3), r6(1.0 / 63)))) // vector-only lane
    // 10 and 20 tie exactly; id breaks the tie; 30/40 tie likewise
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("mrlTruncationRecall: full-width cut is identity; recall bounded; self in top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // dims = full width → both arms are the identical ranking → recall 1.0
    val full = operators.Search.mrlTruncationRecall(e, "cosine", dims = 64,
      k = 10, nQueries = 3).collect()
    assert(full.length == 3 && full.forall(_.getDouble(2) == 1.0),
      s"full-width truncation must be the identity: ${full.map(_.getDouble(2)).toSeq}")
    // an aggressive cut stays a well-formed rate
    val cut = operators.Search.mrlTruncationRecall(e, "cosine", dims = 8,
      k = 10, nQueries = 3).collect()
    assert(cut.length == 3)
    assert(cut.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
    // queries find themselves in BOTH arms (cos(x,x)=1 survives any
    // prefix cut), so recall can never be 0 with k >= 1
    assert(cut.forall(_.getLong(1) >= 1L), "the query itself is a guaranteed hit")
  }

  test("signSignatures: hand-checkable bits, strict-positive threshold") {
    import spark.implicits._
    // dims 0 and 33 positive, dim 32 zero (NOT set — strictly positive),
    // dim 1 negative (not set)
    val v = Array.fill(64)(0f)
    v(0) = 0.5f; v(1) = -0.5f; v(33) = 2f
    val d = Seq((7L, v.toSeq)).toDF("vec_id", "embedding")
    val r = operators.Search.signSignatures(d, 64).collect()(0)
    assert(r.getLong(1) == 1L, s"sig0 ${r.getLong(1)}")        // bit 0 only
    assert(r.getLong(2) == 2L, s"sig1 ${r.getLong(2)}")        // bit 1 of word 1 (dim 33)
  }

  test("hammingRerank: self-hit at rank 1; candidates=corpus equals brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val n = e.count().toInt
    // candidate stage passes EVERYTHING → rerank is exact brute force
    val viaHamming = operators.Search.hammingRerank(e, q, candidates = n, topK = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = operators.Search.topK(e, "cosine", 10, queryId = 0L)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(viaHamming == brute)
    // the query itself: hamming 0, cosine 1 → rank 1 under any candidate cut
    val top = operators.Search.hammingRerank(e, q, candidates = 50, topK = 10).collect()
    assert(top.head.getLong(0) == 0L && top.head.getInt(1) == 0)
    assert(top.head.getDouble(2) == 1.0)
  }

  test("hammingRerank: guards and totality") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      operators.Search.hammingRerank(
        spark.emptyDataset[(Long, Seq[Float])].toDF("vec_id", "embedding"),
        Array.fill(64)(1f), candidates = 5, topK = 10)
    }
    val empty = spark.emptyDataset[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(operators.Search.hammingRerank(empty, Array.fill(64)(1f), 50, 10).count() == 0)
  }
}
