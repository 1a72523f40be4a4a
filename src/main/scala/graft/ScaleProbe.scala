package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
/** Internal scaling probe: 20x data (100k docs, 40k vectors) for the
  * sub-quadratic operator paths. Not part of the driver contract. */
object ScaleProbe {

  /** Regenerate the 20x probe corpus when /tmp was wiped: each sf0.1 doc
    * replicated 20x with a per-copy marker token appended (copies are
    * NEAR-dups — worst case for the pair graph / component resolution),
    * embeddings replicated 20x with the id offset (distinct ids, same
    * geometry — worst case for bucket collisions). Shared by
    * [[GrowthProbe]], so both probes regenerate identically.
    */
  def ensureCorpus(spark: SparkSession, dir: String = "/tmp/scale_probe"): Unit =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))) {
      val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      d0.withColumn("rep", explode(sequence(lit(0), lit(19))))
        .select((col("doc_id") * 32 + col("rep")).as("doc_id"),
          concat(col("text"), lit(" copymark"), col("rep")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(8).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val e0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      e0.withColumn("rep", explode(sequence(lit(0), lit(19))))
        .select((col("vec_id") * 32 + col("rep")).as("vec_id"),
          col("embedding"), col("label"))
        .repartition(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"generated $dir (20x sf0.1)")
    }

  /** 20x events for the event-family probes: each copy shifts USERS
    * (user_id·32+rep) and keeps timestamps, so every replica user
    * carries an identical per-user stream — growth multiplies the user
    * population, which is exactly the axis sessions/funnels/retention
    * must stay linear in. Read through the production
    * [[sources.Tables.events]] so the probe exercises the same
    * schema-dispatching reader as the contract queries.
    */
  def ensureEvents(spark: SparkSession, dir: String = "/tmp/scale_probe"): Unit =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/events.parquet"))) {
      val ev0 = sources.Tables.events(spark, "/root/testdata/sf0.1")
      ev0.withColumn("rep", explode(sequence(lit(0), lit(19))))
        .select((col("event_id") * 32 + col("rep")).as("event_id"), col("ts"),
          (col("user_id") * 32 + col("rep")).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(8).write.mode("overwrite").parquet(s"$dir/events.parquet")
      println(s"generated $dir/events.parquet (20x sf0.1)")
    }

  /** 20x relational tables for the subquery-decorrelation probes:
    * orders/lineitem replicate along the ORDER axis (orderkey·32+rep,
    * so the order→lineitem relationship is preserved per replica) while
    * part stays fixed — q17's per-partkey correlated aggregate then
    * sees its per-key lists grow linearly, which is exactly the axis
    * the decorrelated aggregate+join must stay linear in.
    */
  def ensureRelational(spark: SparkSession, dir: String = "/tmp/scale_probe"): Unit =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/lineitem.parquet"))) {
      val li0 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      li0.withColumn("rep", explode(sequence(lit(0), lit(19))))
        .withColumn("l_orderkey", col("l_orderkey") * 32 + col("rep"))
        .drop("rep")
        .repartition(8).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val o0 = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      o0.withColumn("rep", explode(sequence(lit(0), lit(19))))
        .withColumn("o_orderkey", col("o_orderkey") * 32 + col("rep"))
        .drop("rep")
        .repartition(8).write.mode("overwrite").parquet(s"$dir/orders.parquet")
      spark.read.parquet("/root/testdata/sf0.1/part.parquet")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")
      println(s"generated $dir relational tables (20x sf0.1 orders/lineitem)")
    }

  /** The 40x (200k-doc) corpus for one-more-doubling probes: same
    * near-dup-group structure with TWICE the copies per group, so pair
    * output per group grows ~4x on the doubling — adversarial for any
    * candidate-generation path whose cost tracks the pair graph.
    */
  def ensureDouble(spark: SparkSession, dir: String = "/tmp/scale_probe"): Unit =
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents_x2.parquet"))) {
      val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      d0.withColumn("rep", explode(sequence(lit(0), lit(39))))
        .select((col("doc_id") * 64 + col("rep")).as("doc_id"),
          concat(col("text"), lit(" copymark"), col("rep")).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(16).write.mode("overwrite").parquet(s"$dir/documents_x2.parquet")
      println(s"generated $dir/documents_x2.parquet (40x sf0.1)")
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/scale_probe"
    ensureCorpus(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime()-t0)/1e9}%8.2f  $name rows=$n")
    }
    t("search_topk 40k")(Search.topK(emb, "cosine", 10).count())
    t("knn_join 10q x 40k")(Search.knnJoin(emb, "cosine", 3, 10).count())
    t("ivf_topk 40k")(Ann.ivfTopK(emb, "cosine", 10, 2).count())
    t("minhash_lsh 100k docs")(Dedup.minhashLshPairs(docs, 0.5).count())
    t("simhash 100k docs")(Dedup.simhash(docs).count())
    t("simhash_pairs 100k docs")(Dedup.simhashPairs(docs, 3).count())
    t("ngram_jaccard prefix-exact 100k docs")(Dedup.ngramJaccardPairs(docs, 0.9).count())
    t("ngram_jaccard maxDf=100 100k docs")(Dedup.ngramJaccardPairs(docs, 0.9, maxDf = Some(100)).count())
    t("keep_canonical 100k docs")(Dedup.keepCanonical(docs).count())
    t("text_stats 100k docs")(TextAnalysis.textStats(docs).count())
    t("sketch 100k docs")(TextAnalysis.minKSketch(docs).count())
    t("quality_flags 100k docs")(TextAnalysis.qualityFlags(docs).count())
    t("clean_pipeline 100k docs")(CorpusPipeline.cleanSummary(docs).count())
    t("contamination 100k docs")(Dedup.contaminationFlags(docs,
      docs.filter(col("doc_id") % 50 === 0), 8, 3).count())
    t("dup_groups on minhash pairs 100k docs")(
      Dedup.dupGroups(Dedup.minhashLshPairs(docs, 0.5)).count())
    t("dup_groups DISTRIBUTED on minhash pairs 100k docs")(
      Dedup.dupGroups(Dedup.minhashLshPairs(docs, 0.5), driverEdgeLimit = 0).count())
    t("mixture_sample 100k docs")(Sampling.mixtureSample(docs,
      Map("src0" -> 1.0, "src1" -> 0.5), 0.75).filter(col("sampled")).count())
    t("upsample 100k docs")(Sampling.upsample(docs,
      Map("src0" -> 2.5, "src1" -> 0.25), 1.25).count())
    t("stratified_sample n=100 100k docs")(
      Sampling.stratifiedSample(docs, col("source"), col("doc_id"), 100).count())
    t("pack_windows 100k docs")(Packing.packWindows(docs, 512, 64).count())
    t("bm25 100k docs")(TextAnalysis.bm25TopDocs(docs,
      Seq("query", "fast", "merge"), 10).count())
    t("span_dedup n=8 100k docs")(Dedup.spanDedup(docs, 8).count())
    t("token_budget 100k docs")(Sampling.tokenBudgetSummary(docs,
      Map("src0" -> 8000L), 10000L, numShards = 64).count())
    t("novelty 100k docs")(TextAnalysis.noveltyScores(docs).count())
    t("quality_buckets 100k docs")(TextAnalysis.curriculumSummary(docs).count())
    t("corpus_report 100k docs")(CorpusPipeline.corpusReport(docs).count())
    t("incremental 5k batch vs 95k history")(Dedup.incrementalFlags(
      docs.filter(col("doc_id") % 20 === 0), docs.filter(col("doc_id") % 20 =!= 0),
      0.5).filter(col("keep")).count())
    t("jl_project 40k vecs")(emb.select(
      graft.functions.VectorOps.randomProject(col("embedding"),
        Ann.hyperplanes(8, 64, 7L))).count())
    t("pii_scrub 100k docs")(TextAnalysis.piiScrub(docs).count())
    t("unigram_surprisal 100k docs")(TextAnalysis.unigramSurprisal(docs).count())
    t("image decode round-trip 100k docs")(
      Multimodal.imageRoundTripMeta(docs).count())
    // the persisted-IVF lifecycle at probe scale: one build+persist,
    // then the search that 100 TB users actually run (static cell
    // pruning over the layout)
    val layout = s"$dir/ivf_layout"
    t("kmeans build+persist 40k vecs")({
      KMeansIndex.persist(KMeansIndex.build(emb, k = 8), layout); 1L
    })
    val q0 = emb.orderBy(col("vec_id")).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    t("ivf searchPersisted 40k vecs")(
      KMeansIndex.searchPersisted(spark, layout, q0, topK = 10, nProbe = 3).count())
    // the persisted-BM25 lifecycle at probe scale: one build (the cost
    // a 100 TB user pays once), then the bucket-pruned search they run
    // per query, plus one incremental batch append
    val bmDir = s"$dir/bm25_index"
    t("bm25 index build 95k docs")({
      InvertedIndex.build(docs.filter(col("doc_id") % 20 =!= 0), bmDir); 1L
    })
    t("bm25 searchPersisted")(
      InvertedIndex.search(spark, Seq("query", "fast", "merge"), 10, bmDir).count())
    t("bm25 appendBatch 5k docs")({
      InvertedIndex.appendBatch(docs.filter(col("doc_id") % 20 === 0), bmDir); 1L
    })
    t("bm25 search after append")(
      InvertedIndex.search(spark, Seq("query", "fast", "merge"), 10, bmDir).count())
    t("multimodal resize 100k docs")(Multimodal.imageResizeMeta(docs).count())
    t("audio features 100k docs")(Multimodal.audioFeatures(docs).count())
    t("boilerplate_removal 100k docs")(
      TextAnalysis.removeBoilerplate(docs).count())
    t("dsir_weights 100k docs")(Sampling.dsirWeights(docs).count())
    // SemDeDup at probe scale: k chosen so cells stay ~600 vectors —
    // the paper's dial; the pair join cost tracks sum(cell^2), not n^2
    t("semdedup k=64 40k vecs")(
      Dedup.semDedup(KMeansIndex.build(emb, k = 64), 0.4).count())
    t("quality fit+score 100k docs")({
      val w = QualityModel.fit(docs); QualityModel.score(docs, w).count()
    })
    t("bpe learn12+tokenize 100k docs")({
      val m = Bpe.learnMerges(docs, 12); Bpe.tokenizeCounts(docs, m).count()
    })
    t("pagerank on minhash pairs 100k docs")(
      Graph.pageRank(Dedup.minhashLshPairs(docs, 0.5)).count())
    spark.stop()
  }
}
