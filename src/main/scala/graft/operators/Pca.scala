package graft.operators

import org.apache.spark.ml.feature.{PCA => MlPca}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** PCA dimensionality reduction over an embedding column — the learned
  * counterpart of the fixed JL projection (`VectorOps.randomProject`),
  * and the second member of the dump-and-replay oracle family alongside
  * [[KMeansIndex]]: MLlib only FITS the component matrix; the projection
  * applied to data is our own codegen'd left-to-right dot fold against
  * the dumped component weights — engine-portable (the oracle replays it
  * with `list_dot_product` over the same dumped doubles), with no model
  * broadcast at scoring time.
  *
  * Scale shape: the fit is one covariance aggregation over the corpus
  * (MLlib treeAggregate — map-side combined); the projection is a
  * narrow per-row map with k codegen dot products, no shuffle, no UDF.
  */
object Pca {

  /** Where the fitted components are dumped so the SQL oracle can replay
    * the projection (same convention as `KMeansIndex.centroidDumpPath`).
    */
  def componentDumpPath: String =
    sys.props.getOrElse("graft.pca.dump", "/tmp/graft_oracle_pca_components")

  /** Fit k principal components; row j of the result is component j's
    * weight vector over the input dimensions.
    */
  def fitComponents(emb: DataFrame, k: Int): Array[Array[Double]] = {
    val withVec = Partitioning.spread(emb)
      .withColumn("features", array_to_vector(col("embedding").cast("array<double>")))
    val model = new MlPca().setK(k)
      .setInputCol("features").setOutputCol("pca")
      .fit(withVec)
    val pc = model.pc // dim x k, column-major
    Array.tabulate(k)(j => Array.tabulate(pc.numRows)(d => pc(d, j)))
  }

  /** Dump fitted components as (comp, weights) parquet for the oracle. */
  def dumpComponents(spark: org.apache.spark.sql.SparkSession,
      comps: Array[Array[Double]], path: String = componentDumpPath): Unit = {
    import spark.implicits._
    comps.zipWithIndex.map { case (w, j) => (j, w.toSeq) }.toSeq
      .toDF("comp", "weights").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Project each embedding onto the components: exploded scalar rows
    * (vec_id, comp, val) — driver-hashable, one codegen'd VecDot per
    * component, values rounded at 6 dp (both engines fold the identical
    * left-to-right sequence over the identical dumped doubles).
    */
  def project(emb: DataFrame, comps: Array[Array[Double]]): DataFrame = {
    val pcs = comps.zipWithIndex.map { case (w, j) =>
      struct(lit(j).as("comp"),
        round(VectorOps.dotProduct(col("embedding"), typedLit(w.toSeq)), 6).as("pval"))
    }
    Partitioning.spread(emb)
      .select(col("vec_id"), explode(array(pcs.toSeq: _*)).as("pc"))
      .select(col("vec_id"), col("pc.comp").as("comp"), col("pc.pval").as("pval"))
      .orderBy(col("vec_id"), col("comp"))
  }
}
