package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorOps
import graft.operators.{Clustering, Search}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching ANSI-SQL oracle in `oracleSql`
  * (run by the driver in DuckDB over the same parquet tables) unless the
  * operator is not SQL-expressible (then: rows-only check).
  *
  * Hash-stability rules used throughout (the driver compares by value
  * hash after sorting columns by name):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates accumulate in DECIMAL (order-independent, exact)
  *    or are rounded to 6 dp after same-order folds;
  *  - every top-k has a deterministic secondary sort key;
  *  - timestamps are formatted to strings.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def emb(s: SparkSession, dir: String) = tbl(s, dir, "embeddings")

  /** The events table is written with TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects; read nanos as long and convert to a
    * microsecond timestamp (lossless for this data).
    */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tbl(s, dir, "events")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }

  // φ-band break factors 1 − φ^{−k}, interpolated into the oracle SQL so
  // both engines compare against bit-identical double constants.
  private val phiF1 = 1.0 - 1.0 / VectorOps.Phi
  private val phiF2 = 1.0 - 1.0 / (VectorOps.Phi * VectorOps.Phi)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Search.topK(emb(spark, "/root/testdata/sf0.001"), "cosine", 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 search: scan → score → top-k (TakeOrderedAndProject, no shuffle)
    "search_cosine_topk" -> ((s, dir) => Search.topK(emb(s, dir), "cosine", 10)),
    "search_dot_topk" -> ((s, dir) => Search.topK(emb(s, dir), "dot", 10)),
    "search_euclidean_topk" -> ((s, dir) => Search.topK(emb(s, dir), "euclidean", 10)),
    "search_phi_topk" -> ((s, dir) => Search.topK(emb(s, dir), "phi_weighted", 10)),
    "search_filtered_topk" -> ((s, dir) =>
      Search.topKFiltered(emb(s, dir), "cosine", 10, ctxFilter = Some(3))),
    "knn_join_top3" -> ((s, dir) => Search.knnJoin(emb(s, dir), "cosine", 3, 10)),
    // §2.3 clustering: vector-mean Aggregator + two-pass inertia
    "cluster_centroid_dims" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("dim_idx", (col("pos") + 1).cast("int"))
        .filter(col("dim_idx") <= 8)
        .groupBy(col("label"), col("dim_idx"))
        .agg(round(sum(col("x").cast("double")) / count(lit(1)), 6).as("c"))
        .orderBy(col("label"), col("dim_idx"))),
    "cluster_inertia_by_label" -> ((s, dir) =>
      Clustering.withInertia(emb(s, dir), col("label"), col("vec_id"))
        .select(col("cluster_key").cast("int").as("cluster_key"),
          col("n_members"), col("inertia"))
        .orderBy(col("cluster_key"))),
    "phi_bands" -> ((s, dir) =>
      Clustering.withPhiBand(emb(s, dir), 3)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_members"),
          round(min(col("norm")), 9).as("min_norm"),
          round(max(col("norm")), 9).as("max_norm"))
        .orderBy(col("band"))),
    // §2.6 stats (reference exact count-distinct semantics)
    "stats_summary" -> ((s, dir) =>
      emb(s, dir).agg(
        count(lit(1)).as("n_vectors"),
        countDistinct(col("vec_id") % 144000L).as("n_glyph_ids"),
        countDistinct(col("vec_id") % 10L).as("n_contexts"),
        max(size(col("embedding"))).cast("long").as("dim"))),
    // §2.9 relational surface: aggregation, join, window, time
    "q1_pricing_summary" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(28, 6))).cast("double").as("sum_disc_price"),
          round(sum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
          round(sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
            / count(lit(1)), 6).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
    "events_hourly" -> ((s, dir) =>
      events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
        .orderBy(col("hour"), col("event_type")))
  )

  /** DuckDB-runnable oracle SQL, same table names, same column aliases. */
  def oracleSql: Map[String, String] = Map(
    "search_cosine_topk" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
         |    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
         |       * sqrt(list_dot_product(q.qe, q.qe)) + 1e-12), 6) AS score
         |FROM embeddings e CROSS JOIN q
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,
    "search_dot_topk" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS score
         |FROM embeddings e CROSS JOIN q
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,
    "search_euclidean_topk" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(1.0 / (1.0 + list_distance(CAST(e.embedding AS DOUBLE[]), q.qe)), 6) AS score
         |FROM embeddings e CROSS JOIN q
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,
    "search_filtered_topk" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.vec_id % 144000 AS glyph_id,
         |  CAST(e.vec_id % 10 AS INT) AS outer_context_id,
         |  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
         |    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
         |       * sqrt(list_dot_product(q.qe, q.qe)) + 1e-12), 6) AS score
         |FROM embeddings e CROSS JOIN q
         |WHERE e.vec_id % 10 = 3
         |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin,
    "knn_join_top3" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
         |           FROM embeddings WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe)
         |      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
         |         * sqrt(list_dot_product(q.qe, q.qe)) + 1e-12), 6) AS score
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         |ranked AS (
         |  SELECT *, CAST(row_number() OVER
         |    (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INT) AS rank
         |  FROM scored)
         |SELECT query_id, neighbor_id, score, rank FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "cluster_centroid_dims" ->
      s"""WITH ex AS (
         |  SELECT label, CAST(generate_subscripts(embedding, 1) AS INT) AS dim_idx,
         |         CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings)
         |SELECT label, dim_idx, round(sum(x)/count(*), 6) AS c
         |FROM ex WHERE dim_idx <= 8 GROUP BY label, dim_idx ORDER BY label, dim_idx""".stripMargin,
    "cluster_inertia_by_label" ->
      s"""WITH ex AS (
         |  SELECT label, vec_id, generate_subscripts(embedding, 1) AS i,
         |         CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |cent AS (SELECT label, i, round(sum(x)/count(*), 6) AS c FROM ex GROUP BY label, i)
         |SELECT CAST(ex.label AS INT) AS cluster_key, count(DISTINCT ex.vec_id) AS n_members,
         |       round(sum((ex.x - cent.c)*(ex.x - cent.c)), 6) AS inertia
         |FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
         |GROUP BY ex.label ORDER BY cluster_key""".stripMargin,
    "phi_bands" ->
      s"""WITH n AS (
         |  SELECT vec_id, sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                                       CAST(embedding AS DOUBLE[]))) AS norm
         |  FROM embeddings),
         |b AS (SELECT min(norm) AS min_n, max(norm) AS max_n FROM n),
         |banded AS (
         |  SELECT vec_id, norm,
         |    CASE WHEN norm < min_n + (max_n - min_n + 1e-12) * $phiF1 THEN 0
         |         WHEN norm < min_n + (max_n - min_n + 1e-12) * $phiF2 THEN 1
         |         ELSE 2 END AS band
         |  FROM n CROSS JOIN b)
         |SELECT band, count(*) AS n_members,
         |  round(min(norm), 9) AS min_norm, round(max(norm), 9) AS max_norm
         |FROM banded GROUP BY band ORDER BY band""".stripMargin,
    "stats_summary" ->
      s"""SELECT count(*) AS n_vectors,
         |  count(DISTINCT vec_id % 144000) AS n_glyph_ids,
         |  count(DISTINCT vec_id % 10) AS n_contexts,
         |  CAST(max(len(embedding)) AS BIGINT) AS dim
         |FROM embeddings""".stripMargin,
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  sum(l_quantity) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
         |  round(sum(l_quantity)/count(*), 6) AS avg_qty,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*), 6) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
         |  count(*) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
