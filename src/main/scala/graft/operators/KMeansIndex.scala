package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** MLlib batch ANN index — the BASELINE.json north-star path ("MLlib
  * batch index build, DataFrame similarity search"): train KMeans over
  * the embedding column, persist cell assignments as a partition-key
  * column, search by probing the nearest cell centroids.
  *
  * At 100 TB the assignment write is `partitionBy("cell")`; a probe
  * query then prunes to nProbe/k of the data before brute-force scoring
  * — the distributed generalization of the reference's coarse→fine
  * `search_pglyphs` navigation (`vector_field.py:328-345`).
  */
object KMeansIndex {

  case class Index(assigned: DataFrame, centroids: DataFrame)

  /** Train a KMeans index: returns the base table with a `cell` column
    * and the centroid table (cell, centroid: array<double>).
    */
  def build(emb: DataFrame, k: Int, seed: Long = 42L): Index = {
    val spark = emb.sparkSession
    val withVec = Partitioning.spread(emb)
      .withColumn("features", array_to_vector(col("embedding").cast("array<double>")))
      .cache()
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
      // random init: one seeding job instead of k-means||'s ~5 passes —
      // at index-build scale the extra iterations are cheaper than the
      // extra full-data passes
      .setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(withVec)
    val assigned = model.transform(withVec).drop("features")
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (v: Vector, i: Int) => (i, v.toArray) }
      .toDF("cell", "centroid")
    Index(assigned, centroids)
  }

  /** Probe-then-scan search: score the k centroids (tiny, broadcast),
    * keep the best nProbe cells, brute-force only their members.
    */
  def search(index: Index, query: Array[Float], topK: Int, nProbe: Int): DataFrame = {
    val q = typedLit(query.toSeq.map(_.toDouble))
    val probes = index.centroids
      .withColumn("cscore", VectorOps.cosineSimilarity(col("centroid"), q))
      .orderBy(col("cscore").desc, col("cell").asc)
      .limit(nProbe)
      .select(col("cell"))
    index.assigned
      .join(broadcast(probes), "cell")
      .withColumn("score", round(VectorOps.cosineSimilarity(col("embedding"), q), 6))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(topK)
      .select(col("vec_id"), col("cell"), col("score"))
  }

  /** Recall of the probe search against the exact brute-force top-k —
    * the quality metric an index build reports.
    */
  def recallAtK(index: Index, emb: DataFrame, query: Array[Float],
      topK: Int, nProbe: Int): Double = {
    val approx = search(index, query, topK, nProbe)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val q = typedLit(query.toSeq.map(_.toDouble))
    val exact = emb
      .withColumn("score", VectorOps.cosineSimilarity(col("embedding"), q))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(topK)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    if (exact.isEmpty) 0.0
    else approx.intersect(exact).size.toDouble / exact.size
  }
}
