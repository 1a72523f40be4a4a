package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.operators._

/** Totality sweep: every composable operator must accept an EMPTY input
  * frame without throwing — a cleaning pipeline's stages see empty
  * partitions and empty filtered frames constantly (a quality gate that
  * drops everything, a source with no documents, the first micro-batch
  * of a stream), and an operator that 0-divides or head()s there takes
  * the whole job down. Global aggregates may legitimately return their
  * one identity row; everything else must return zero rows.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))))

  private lazy val emb = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  private def zeroRows(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
    assert(df.count() == 0, s"$name must yield no rows on empty input")

  test("text operators are total on an empty corpus") {
    zeroRows("textStats")(TextAnalysis.textStats(docs))
    zeroRows("langId")(TextAnalysis.langId(docs))
    zeroRows("tokenCounts")(TextAnalysis.tokenCounts(docs))
    zeroRows("digests")(TextAnalysis.digests(docs))
    zeroRows("minKSketch")(TextAnalysis.minKSketch(docs, 4))
    zeroRows("tfidfTopTerms")(TextAnalysis.tfidfTopTerms(docs, 3))
    zeroRows("chunkWords")(TextAnalysis.chunkWords(docs, 50, 10))
    zeroRows("qualityFlags")(TextAnalysis.qualityFlags(docs))
    zeroRows("noveltyScores")(TextAnalysis.noveltyScores(docs))
    zeroRows("piiScrub")(TextAnalysis.piiScrub(docs))
    zeroRows("bm25TopDocs")(TextAnalysis.bm25TopDocs(docs, Seq("query"), 10))
    zeroRows("removeBoilerplate")(TextAnalysis.removeBoilerplate(docs))
    // global aggregate: one identity row is acceptable, a throw is not
    assert(TextAnalysis.sizePercentiles(docs).count() <= 1)
  }

  test("dedup operators are total on an empty corpus") {
    // exactSummary is a global aggregate — identity row allowed
    assert(Dedup.exactSummary(docs).count() <= 1)
    zeroRows("keepCanonical")(Dedup.keepCanonical(docs))
    zeroRows("ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, 0.5))
    zeroRows("minhashLshPairs")(Dedup.minhashLshPairs(docs, 0.5))
    zeroRows("simhash")(Dedup.simhash(docs))
    zeroRows("simhashPairs")(Dedup.simhashPairs(docs, 3))
    zeroRows("spanDedup")(Dedup.spanDedup(docs, 4))
    zeroRows("dupGroups")(Dedup.dupGroups(
      Dedup.minhashLshPairs(docs, 0.5)))
    zeroRows("contaminationFlags")(Dedup.contaminationFlags(docs, docs, 8, 3))
    zeroRows("evalContamination")(Dedup.evalContamination(docs, docs, 8, 0.5))
    zeroRows("dedupTokenSavings")(Dedup.dedupTokenSavings(docs))
    zeroRows("contaminationGate")(Dedup.contaminationGate(docs, docs, 8, 3))
    zeroRows("ngramDiversity")(TextAnalysis.ngramDiversity(docs, 2))
    // empty on BOTH sides of the composed release: everything unchanged
    zeroRows("decontaminate")(CorpusPipeline.decontaminate(docs, docs, 0.5))
    zeroRows("idfCosineRank")(Dedup.idfCosineRank(docs, Dedup.lshCandidates(docs)))
    zeroRows("incrementalFlags")(Dedup.incrementalFlags(docs, docs, 0.5))
    zeroRows("embeddingNearDup")(Dedup.embeddingNearDup(emb, 0.9))
    zeroRows("semDedup")(Dedup.semDedup(
      KMeansIndex.Index(emb.withColumn("cell", org.apache.spark.sql.functions.lit(0)),
        emb.select(col("label").as("cell"), col("embedding").cast("array<double>").as("centroid"))),
      0.9))
  }

  test("sampling/packing/pipeline operators are total on an empty corpus") {
    zeroRows("mixtureSample")(Sampling.mixtureSample(docs, Map("src0" -> 1.0), 0.5))
    zeroRows("mixtureSummary")(Sampling.mixtureSummary(docs, Map("src0" -> 1.0), 0.5))
    zeroRows("upsample")(Sampling.upsample(docs, Map("src0" -> 2.0), 1.0))
    zeroRows("stratifiedSample")(
      Sampling.stratifiedSample(docs, col("source"), col("doc_id"), 10))
    zeroRows("tokenBudgetSummary")(
      Sampling.tokenBudgetSummary(docs, Map("src0" -> 100L), 100L))
    zeroRows("dsirWeights")(Sampling.dsirWeights(docs))
    zeroRows("packWindows")(Packing.packWindows(docs, 512, 64))
    zeroRows("cleanSummary")(CorpusPipeline.cleanSummary(docs))
    zeroRows("corpusReport")(CorpusPipeline.corpusReport(docs))
  }

  test("vector operators are total on an empty embedding table") {
    zeroRows("Search.topK")(Search.topK(emb, "cosine", 10))
    zeroRows("Ann.lshCosinePairs")(Ann.lshCosinePairs(emb, 0.4))
    zeroRows("Ann.searchCentroids")(Ann.searchCentroids(emb, "cosine", 5))
    zeroRows("Clustering.centroids")(
      Clustering.centroids(emb, col("label"), col("vec_id")))
    zeroRows("Multimodal.metaSql")(
      Multimodal.metaSql(Multimodal.fromDocuments(docs)))
    zeroRows("Multimodal.chunk")(
      Multimodal.chunk(Multimodal.fromDocuments(docs), 256))
    zeroRows("imageRoundTripMeta")(Multimodal.imageRoundTripMeta(docs))
    zeroRows("imageResizeMeta")(Multimodal.imageResizeMeta(docs))
    zeroRows("videoFrameSample")(Multimodal.videoFrameSample(docs))
    zeroRows("imageChannelStats")(Multimodal.imageChannelStats(docs))
    zeroRows("audioFeatures")(Multimodal.audioFeatures(docs))
    zeroRows("quarantineRoundTrip")(Multimodal.quarantineRoundTrip(docs))
    zeroRows("repetitionSignals")(TextAnalysis.repetitionSignals(docs))
    zeroRows("sourceOverlap")(TextAnalysis.sourceOverlap(docs))
    zeroRows("vocabCoverage")(TextAnalysis.vocabCoverage(docs))
  }

  test("round-8 operators are total on empty inputs") {
    import spark.implicits._
    val events = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    // global aggregate: one identity row with n_converted = 0 and null
    // quantiles — not a throw, not a 0-division
    val ttc = Funnel.timeToConvert(events).collect()
    assert(ttc.length == 1 && ttc.head.getLong(0) == 0L)
    val ttcApprox = Funnel.timeToConvert(events, exact = false).collect()
    assert(ttcApprox.length == 1 && ttcApprox.head.getLong(0) == 0L)
    // recallCurve with zero queries: one row per probe arm, zero cells
    // scanned, null recall (0 hits / 0 queries has no defined rate)
    val idx = KMeansIndex.Index(
      emb.withColumn("cell", org.apache.spark.sql.functions.lit(0)),
      Seq((0, Seq.fill(8)(0.0))).toDF("cell", "centroid"))
    val noQueries = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("q_embedding"))
    val curve = KMeansIndex.recallCurve(idx, noQueries, topK = 10,
      probes = Seq(1, 2)).collect()
    assert(curve.length == 2 && curve.forall(_.getLong(1) == 0L))
    // per-element quantization over an empty table: zero rows
    zeroRows("quantizeInt8")(emb.select(col("vec_id"),
      graft.functions.VectorOps.quantizeInt8(col("embedding"),
        graft.functions.VectorOps.absMax(col("embedding")))))
    // approx dials on empty frames
    assert(Monitor.profile(docs, Seq("doc_id"), exact = false).count() == 1)
    zeroRows("robustOutliers approx")(
      Monitor.robustOutliers(docs.select(col("doc_id"),
        col("n_chars")), "doc_id", "n_chars", exact = false))
  }

  test("round-8 continuation operators are total on empty inputs") {
    import spark.implicits._
    // AUC on an empty scored frame: ONE identity row — null auc (the
    // statistic is undefined), zero counts, no 0-division
    val scored = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("quality", DoubleType),
        StructField("label", LongType))))
    val auc = QualityModel.rocAuc(scored).collect()
    assert(auc.length == 1 && auc.head.isNullAt(0)
      && auc.head.getLong(1) == 0L && auc.head.getLong(2) == 0L)
    // null labels (unlabeled rows) drop out of BOTH counts — the
    // evaluator scores the labeled subset, never guesses
    val partial = QualityModel.rocAuc(Seq(
      (0.9, Some(1L)), (0.5, Option.empty[Long]), (0.1, Some(0L)))
      .toDF("quality", "label")).head()
    assert(partial.getDouble(0) == 1.0
      && partial.getLong(1) == 1L && partial.getLong(2) == 1L)
    zeroRows("calibrationBins")(QualityModel.calibrationBins(scored))
    zeroRows("curriculumOrder")(Sampling.curriculumOrder(docs))
    zeroRows("kAnonymity")(Monitor.kAnonymity(docs, Seq("source", "lang")))
  }

  test("persisted BM25 index is total on an empty corpus") {
    import graft.operators.InvertedIndex
    val dir = java.nio.file.Files.createTempDirectory("bm25empty").toString
    InvertedIndex.build(docs, dir)
    // stats exists with the identity row; no postings → empty ranking
    assert(InvertedIndex.search(spark, Seq("query"), k = 5, dir = dir).count() == 0)
  }
}
