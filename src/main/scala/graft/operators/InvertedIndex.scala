package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — the retrieval analogue of
  * [[KMeansIndex]]'s persisted IVF layout: build once (postings
  * partitioned on a term-hash bucket), search many (only the query
  * terms' buckets are read — static `PartitionFilters` at the file
  * index, the rest of the corpus is never scanned). Scoring reuses
  * `TextAnalysis.bm25Rank` verbatim, so the persisted path cannot drift
  * from the from-scratch operator; the driver hash-compares both
  * against the same oracle.
  *
  * Layout under `dir`:
  *   postings/bucket=N/  (w, doc_id, dl, tf)  — dl denormalized into the
  *                        postings so search needs no doc-stats join
  *   stats/              one row (n_docs, sum_dl) over the WHOLE corpus
  *                        (BM25's idf and avgdl are corpus-global even
  *                        for docs matching no query term)
  *
  * Scale shape: the build is the tokenize → (w, doc, dl) count the
  * from-scratch path runs once per QUERY, paid once per CORPUS instead;
  * a search reads |query-term buckets| / NumBuckets of the postings
  * files, computes df from exactly those postings (a term's postings
  * live wholly in its bucket), and ranks with the bounded top-k tail.
  */
object InvertedIndex {

  /** Bucket fan-out of the postings layout. At corpus scale this would
    * be sized so a bucket's postings fit a few files; the pruning ratio
    * for a q-term query is ≤ q/NumBuckets regardless.
    */
  val NumBuckets = 16

  def indexDir: String =
    sys.props.getOrElse("graft.bm25.index", "/tmp/graft_bm25_index")

  private def termBucket(t: Column): Column =
    pmod(xxhash64(t), lit(NumBuckets)).cast("int")

  /** Postings schema, stated explicitly at read time: an EMPTY corpus
    * (the first micro-batch of a stream) writes a postings directory
    * with no data files, and a schema-inferring read would die there
    * instead of returning zero rows.
    */
  private val postingsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dl", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("tf", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.IntegerType)))

  private def postingsOf(docs: DataFrame): DataFrame =
    Partitioning.spread(docs)
      .select(col("doc_id"), TextAnalysis.words(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("w"))
      .groupBy(col("w"), col("doc_id"), col("dl")).agg(count(lit(1)).as("tf"))
      .withColumn("bucket", termBucket(col("w")))

  private def statsOf(docs: DataFrame): DataFrame =
    Partitioning.spread(docs)
      .select(size(TextAnalysis.words(col("text"))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** Build the base postings + corpus-stats layout for `docs`. A
    * rebuild re-indexes the full corpus, so any previously appended
    * batches are stale and dropped (same rebuild semantics as
    * `KMeansIndex.persist`).
    */
  def build(docs: DataFrame, dir: String = indexDir): Unit = {
    val spark = docs.sparkSession
    val batches = new org.apache.hadoop.fs.Path(s"$dir/batches")
    val fs = batches.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(batches)) fs.delete(batches, true)
    postingsOf(docs)
      .write.partitionBy("bucket").mode("overwrite").parquet(s"$dir/postings")
    statsOf(docs).coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Incrementally index a NEW document batch (disjoint doc_ids from
    * everything already indexed — BM25's df and corpus stats compose
    * additively over disjoint doc sets, so a search over base ∪ batches
    * equals a from-scratch index of the union). The batch lands in its
    * own `batches/batch-<uuid>` directory and becomes visible only once
    * its `_COMMITTED` marker exists — written AFTER both the postings
    * and stats jobs succeed (two writes, so Spark's per-job `_SUCCESS`
    * alone cannot gate the pair). Same atomic-publish discipline as
    * `KMeansIndex.appendPersisted`; `foreachBatch`-compatible.
    */
  def appendBatch(docs: DataFrame, dir: String = indexDir): Unit = {
    val spark = docs.sparkSession
    val batchDir = s"$dir/batches/batch-${java.util.UUID.randomUUID()}"
    postingsOf(docs).write.partitionBy("bucket").parquet(s"$batchDir/postings")
    statsOf(docs).coalesce(1).write.parquet(s"$batchDir/stats")
    val fs = new org.apache.hadoop.fs.Path(batchDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(batchDir, "_COMMITTED"), true).close()
  }

  /** Committed batch directories, oldest-first; uncommitted (in-flight
    * or failed) batches are invisible to every reader.
    */
  private def committedBatches(spark: SparkSession, dir: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/batches")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_COMMITTED")))
        .map(_.toString).sorted.toSeq
    else Seq.empty[String]
  }

  /** Compact the layout: fold every batch committed AT THE SNAPSHOT
    * into the base postings/stats (the [[KMeansIndex.compactPersisted]]
    * discipline, completing the index-maintenance pair) — a
    * continuously-ingesting BM25 index accumulates one postings +
    * stats directory pair per batch, and every search unions them all;
    * compaction resets that read amplification without re-tokenizing
    * anything (the fold is a file-layout rewrite of already-computed
    * postings; stats fold additively into one row).
    *
    * Publish: staging writes + directory renames, snapshot-scoped
    * batch deletion — a batch committed concurrently survives
    * untouched. The postings and stats swaps are two renames (not one
    * atomic pair), so like a [[build]] rebuild the swap window needs
    * quiesced searches; batches never do (their publish is the single
    * `_COMMITTED` create).
    */
  def compact(spark: SparkSession, dir: String = indexDir): Unit = {
    val batches = committedBatches(spark, dir)
    if (batches.isEmpty) return
    val token = java.util.UUID.randomUUID().toString
    (s"$dir/postings" +: batches.map(b => s"$b/postings"))
      .map(p => spark.read.schema(postingsSchema).option("basePath", p).parquet(p))
      .reduce(_.unionByName(_))
      .write.partitionBy("bucket").parquet(s"$dir/.postings_compact_$token")
    (s"$dir/stats" +: batches.map(b => s"$b/stats"))
      .map(p => spark.read.parquet(p))
      .reduce(_.unionByName(_))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .coalesce(1).write.parquet(s"$dir/.stats_compact_$token")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    for (part <- Seq("postings", "stats")) {
      val old = s"$dir/.${part}_old_$token"
      require(fs.rename(p(s"$dir/$part"), p(old)), s"compact: $part swap-out failed")
      require(fs.rename(p(s"$dir/.${part}_compact_$token"), p(s"$dir/$part")),
        s"compact: $part swap-in failed")
      fs.delete(p(old), true)
    }
    batches.foreach(b => fs.delete(p(b), true))
  }

  /** Search the persisted layout: same result as
    * `TextAnalysis.bm25TopDocs` on the indexed corpus, reading only the
    * query terms' buckets.
    */
  def search(spark: SparkSession, queryTerms: Seq[String], k: Int = 10,
      dir: String = indexDir, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "query must have at least one term")
    val terms = queryTerms.distinct
    // bucket ids for the query terms, computed with the SAME hash the
    // writer used (a tiny Spark job over |terms| rows — the engine's
    // xxhash64, not a driver-side reimplementation that could drift)
    import spark.implicits._
    val buckets = terms.toDF("w").select(termBucket(col("w")).as("b"))
      .distinct().as[Int].collect().toSeq
    val batches = committedBatches(spark, dir)
    // every branch keeps its own basePath, so bucket=N stays a partition
    // value and the bucket filter is STATIC pruning on each branch
    val tf = (s"$dir/postings" +: batches.map(b => s"$b/postings"))
      .map(p => spark.read.schema(postingsSchema).option("basePath", p).parquet(p))
      .reduce(_.unionByName(_))
      .filter(col("bucket").isin(buckets: _*)) // static partition pruning
      .filter(col("w").isin(terms: _*))
      .select(col("doc_id"), col("dl"), col("w"), col("tf"))
    // a term's postings live wholly in its bucket, so df computed from
    // the pruned read equals the corpus df; batches hold disjoint docs,
    // so df and corpus stats compose additively over the union
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val stats = (s"$dir/stats" +: batches.map(b => s"$b/stats"))
      .map(p => spark.read.parquet(p))
      .reduce(_.unionByName(_))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    TextAnalysis.bm25Rank(tf, df, stats, k, k1, b)
  }
}
