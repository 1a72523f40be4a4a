package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate-nearest-neighbour search: coarse-to-fine (IVF-style) over
  * cluster centroids, generalizing the reference's `search_pglyphs`
  * coarse navigation (`/root/reference/aeuc_vector_db/vector_field.py:328-345`).
  *
  * The scale path for 100 TB: the centroid table is tiny (one row per
  * cell) and broadcast; probing selects nProbe cells; the fine search
  * touches only the matching cells' rows — with the base table
  * partitioned/bucketed by cell id this is partition pruning, so the
  * fine scan reads nProbe/nCells of the data instead of all of it.
  * Here the deterministic cell id is the `label` column (a stand-in for
  * an MLlib-KMeans-assigned cell id, which is the production path).
  */
object Ann {

  /** Coarse search: score cell centroids against the query, top-k cells.
    * Mirrors `search_pglyphs` scan-score-sort-limit on centroids.
    */
  def searchCentroids(emb: DataFrame, metric: String, k: Int, queryId: Long = 0L): DataFrame = {
    val cent = Clustering.centroids(emb, col("label"), col("vec_id"))
      .select(col("cluster_key").cast("int").as("label"), col("centroid"), col("n_members"))
    cent.crossJoin(broadcast(Search.queryVector(emb, queryId)))
      .select(col("label"), col("n_members"),
        round(VectorOps.similarity(metric)(col("centroid"), col("q_embedding")), 6)
          .as("score"))
      .filter(Search.rankable(col("score")))
      .orderBy(col("score").desc, col("label").asc)
      .limit(k)
  }

  /** IVF top-k: probe the nProbe best cells, then brute-force only their
    * members. The probe result is tiny → broadcast semi-join prunes the
    * fine scan.
    */
  def ivfTopK(emb: DataFrame, metric: String, k: Int, nProbe: Int,
              queryId: Long = 0L): DataFrame = {
    val probes = searchCentroids(emb, metric, nProbe, queryId).select(col("label"))
    emb.join(broadcast(probes), "label")
      .crossJoin(broadcast(Search.queryVector(emb, queryId)))
      .select(col("vec_id"), col("label"),
        round(VectorOps.similarity(metric)(col("embedding"), col("q_embedding")), 6)
          .as("score"))
      .filter(Search.rankable(col("score")))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic seeded Gaussian hyperplanes for sign-random-projection
    * LSH: `nPlanes` rows of `dim` standard-normal components from
    * `java.util.Random(seed)` (whose nextGaussian algorithm is fixed by
    * the Java spec — identical constants on every JVM). Components are
    * quantized to 3 decimals via a decimal-string round-trip so the SAME
    * doubles can be interpolated as literals into the DuckDB oracle SQL:
    * both engines parse "0.123" to the identical IEEE double.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    // Locale.ROOT: the f-interpolator formats with the JVM default
    // locale, so a comma-decimal locale (de_DE, fr_FR, …) would render
    // "0,123" and crash toDouble
    Array.fill(nPlanes, dim)(
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(rnd.nextGaussian())).toDouble)
  }

  /** Sign-bit bucket id from `planes`: bit i = [v · planes(i) ≥ 0].
    * The dot is the same left-to-right codegen fold on both engines, so
    * the sign — hence the bucket — is bit-deterministic. A dimension
    * mismatch errors loudly: VecDot would return null, `when` would fall
    * to 0 for every plane, and ALL rows would silently share bucket 0 —
    * degenerating the "sub-quadratic" join into the full n² product.
    * A NULL embedding is different from a wrong-dim one — it is missing
    * data, not a schema bug — and maps to a NULL bucket: null join keys
    * match nothing, so the row simply contributes no candidate pairs
    * instead of killing a corpus-scale job (and instead of raising an
    * error whose concat'd message is itself null).
    */
  def signBucket(v: Column, planes: Array[Array[Double]]): Column = {
    require(planes.nonEmpty && planes.length <= 31,
      s"need 1..31 planes (bucket is a positive int), got ${planes.length}")
    val dim = planes.head.length
    val raw = planes.zipWithIndex.map { case (p, i) =>
      when(VectorOps.dotProduct(v, typedLit(p.toSeq)) >= 0d, lit(1 << i))
        .otherwise(lit(0))
    }.reduce(_ + _)
    when(v.isNull, lit(null).cast("int"))
      .when(size(v) === dim, raw)
      .otherwise(raise_error(
        concat(lit("signBucket: embedding dim "), size(v).cast("string"),
          lit(s" != plane dim $dim"))))
  }

  /** LSH-bucketed near-dup pairs over embeddings: sign-random-projection
    * buckets from seeded Gaussian hyperplanes, pairs generated only
    * within a bucket, verified by exact cosine. The scale path for
    * embedding dedup when the O(n²) baseline (Dedup.embeddingTopPairs)
    * stops fitting. (Round 1 used coordinate-sign "planes"; axis-aligned
    * projections have poor recall on correlated dims — real seeded
    * projections keep determinism and fix recall.)
    */
  def lshCosinePairs(emb: DataFrame, threshold: Double, nBits: Int = 8,
                     dim: Int = 64, seed: Long = 42L): DataFrame = {
    val bucket = signBucket(col("embedding"), hyperplanes(nBits, dim, seed))
    val b = emb.withColumn("bucket", bucket)
    val a = b.select(col("bucket"), col("vec_id").as("vec_a"), col("embedding").as("ea"),
      VectorOps.l2Norm(col("embedding")).as("na"))
    val c = b.select(col("bucket"), col("vec_id").as("vec_b"), col("embedding").as("eb"),
      VectorOps.l2Norm(col("embedding")).as("nb"))
    a.join(c, Seq("bucket")).filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorOps.dotProduct(col("ea"), col("eb"))
          / (col("na") * col("nb") + lit(1e-12)), 6).as("score"))
      .filter(col("score") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
