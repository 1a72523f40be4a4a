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

  test("lshCosinePairs only emits same-bucket pairs above threshold") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Ann.lshCosinePairs(e, 0.4).collect()
    assert(pairs.forall(_.getDouble(2) >= 0.4))
  }
}
