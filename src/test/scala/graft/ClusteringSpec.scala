package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Clustering, Search}

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toSeq.toDF("vec_id", "embedding", "label")

  test("centroids: element-wise mean, sorted member ids, counts") {
    val df = emb((1L, Seq(1f, 3f), 0), (2L, Seq(3f, 5f), 0), (3L, Seq(10f, 10f), 1))
    val byName = Clustering.centroids(df, col("label"), col("vec_id")).collect()
      .map(r => r.getAs[Int]("cluster_key") ->
        (r.getAs[scala.collection.Seq[Double]]("centroid").toSeq,
          r.getAs[scala.collection.Seq[Long]]("member_ids").toSeq,
          r.getAs[Long]("n_members"))).toMap
    assert(byName(0)._1 == Seq(2.0, 4.0) && byName(0)._2 == Seq(1L, 2L) && byName(0)._3 == 2)
    assert(byName(1)._1 == Seq(10.0, 10.0))
  }

  test("withInertia: sum of squared distances to the centroid") {
    val df = emb((1L, Seq(0f, 0f), 0), (2L, Seq(2f, 0f), 0))
    val r = Clustering.withInertia(df, col("label"), col("vec_id")).head()
    assert(r.getAs[Double]("inertia") == 2.0) // centroid (1,0): 1 + 1
  }

  test("withPhiBand: empty input yields no rows; bands partition all rows") {
    val empty = emb()
    assert(Clustering.withPhiBand(empty, 3).count() == 0)
    val df = emb((1 to 9).map(i => (i.toLong, Seq(i * 0.3f, 0f), 0)): _*)
    val bands = Clustering.withPhiBand(df, 3).groupBy("band").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bands.values.sum == 9)
    assert(bands.keys.forall(b => b >= 0 && b <= 2))
  }

  test("simplifiedSilhouette: hand-computed a/b distances and per-cell mean") {
    // centers (0,0) and (4,0); points: on-center (a=0, b=4 -> s=1),
    // midpoint (a=b=2 -> s=0, assigned to cell 0 by the lowest-cell
    // tie-break), and (1,0) (a=1, b=3 -> s=2/3)
    val df = emb((1L, Seq(0f, 0f), 0), (2L, Seq(2f, 0f), 0), (3L, Seq(1f, 0f), 0))
    val centers = Array(Array(0.0, 0.0), Array(4.0, 0.0))
    val rows = Clustering.simplifiedSilhouette(df, centers).collect()
      .map(r => r.getAs[Int]("cell") ->
        (r.getAs[Long]("n_members"), r.getAs[Double]("mean_silhouette"))).toMap
    assert(rows.keySet == Set(0))
    val (n, s) = rows(0)
    assert(n == 3L)
    assert(math.abs(s - 0.555556) < 1e-9) // mean of (1.0, 0.0, 0.666667)
  }

  test("simplifiedSilhouette: well-separated clusters score near 1") {
    val df = emb(
      (1L, Seq(0f, 0.1f), 0), (2L, Seq(0.1f, 0f), 0),
      (3L, Seq(10f, 0f), 1), (4L, Seq(10f, 0.1f), 1))
    val centers = Array(Array(0.05, 0.05), Array(10.0, 0.05))
    val rows = Clustering.simplifiedSilhouette(df, centers).collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getAs[Double]("mean_silhouette") > 0.98))
  }

  test("ivfTopK probing all cells equals brute-force top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val nCells = e.select("label").distinct().count().toInt
    val brute = Search.topK(e, "cosine", 10).select("vec_id")
      .as[Long].collect().toSeq
    val ivfAll = Ann.ivfTopK(e, "cosine", 10, nProbe = nCells).select("vec_id")
      .as[Long].collect().toSeq
    assert(ivfAll == brute)
    // fewer probes: result is a subset of the probed cells' members
    val ivf2 = Ann.ivfTopK(e, "cosine", 10, nProbe = 2)
    assert(ivf2.select("label").distinct().count() <= 2)
  }

  test("hardNegatives: label-disjoint, rank-ordered, matches brute force at rank 1") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Search.hardNegatives(e, "cosine", 5, 3).collect()
    val qLabels = e.filter(col("vec_id") < 3).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.length == 3 * 5)
    out.foreach { r =>
      assert(r.getAs[Int]("label") != qLabels(r.getAs[Long]("query_id")))
    }
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
    }
    // rank 1 for query 0 = the brute-force best different-label score
    val q0 = e.filter(col("vec_id") === 0).head()
    val q0Label = q0.getAs[Int]("label")
    val q0Emb = q0.getAs[scala.collection.Seq[Float]]("embedding")
    val bruteBest = e.filter(col("label") =!= q0Label)
      .select(round(graft.functions.VectorOps.cosineSimilarity(col("embedding"),
        typedLit(q0Emb.toSeq)), 6).as("score"))
      .agg(max(col("score"))).head().getDouble(0)
    val rank1 = out.filter(r => r.getAs[Long]("query_id") == 0L &&
      r.getAs[Int]("rank") == 1).head.getAs[Double]("score")
    assert(rank1 == bruteBest)
  }

  test("tripletMining: known positive/negative, margin sign, lone-label anchor drops") {
    import spark.implicits._
    // anchor 0 (label 0): positive is the nearly-parallel v2 (label 0),
    // hard negative is the nearby v3 (label 1), not the far v4 (label 1);
    // anchor 1 carries a label no other vector has → no positive → drops
    val e = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.0f, 1.0f, 0.0f), 7),
      (2L, Seq(0.99f, 0.1f, 0.0f), 0),
      (3L, Seq(0.9f, 0.4f, 0.0f), 1),
      (4L, Seq(0.0f, 0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val out = Search.tripletMining(e, "cosine", nQueries = 2).collect()
    assert(out.length == 1, "the lone-label anchor must drop (no positive arm)")
    val r = out.head
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 2L, "positive = nearest same-label")
    assert(r.getLong(3) == 3L, "negative = nearest cross-label, not the far one")
    assert(r.getDouble(5) > 0.0, "well-separated anchor has positive margin")
    assert(r.getDouble(5) === BigDecimal(r.getDouble(2) - r.getDouble(4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("lshCosinePairs only emits same-bucket pairs above threshold") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Ann.lshCosinePairs(e, 0.4).collect()
    assert(pairs.forall(_.getDouble(2) >= 0.4))
  }

  test("embeddingDispersion: the linear pass equals the all-pairs mean") {
    val e = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0),   // identical pair
      (3L, Array(1f, 0f), 1), (4L, Array(0f, 1f), 1),   // orthogonal pair
      (5L, Array(1f, 0f), 2),                           // n=1 → drops
      (6L, Array(1f, 0f), 3), (7L, Array(0f, 1f), 3), (8L, Array(1f, 0f), 3))
      .toDF("vec_id", "embedding", "label")
    val got = Clustering.embeddingDispersion(e, "label").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set(0, 1, 3), s"$got")
    assert(got(0) == ((2L, 1.0, 0.0)))     // duplicates: mean cos 1
    assert(got(1) == ((2L, 0.0, 1.0)))     // orthogonal: mean cos 0
    // label 3: pairs (6,7)=0, (6,8)=1, (7,8)=0 → mean 1/3; the identity
    // gives (‖(2,1)‖² − 3)/(3·2) = (5 − 3)/6 — same number, ZERO pairs formed
    assert(got(3) == ((3L, 0.333333, 0.666667)), s"$got")
  }
}
