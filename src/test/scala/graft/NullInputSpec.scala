package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators._

/** Null-row totality sweep — the companion to [[EmptyInputSpec]]: at
  * corpus scale some rows WILL carry a null text or embedding (failed
  * extraction, schema drift, a bad upstream join), and a pipeline stage
  * must not take the job down over one of them. Policy under test:
  * null-text rows flow through text operators as null/zero outputs or
  * drop out of tokenized paths; null-embedding rows drop out of vector
  * scoring (a null score can never enter a top-k). Every operator here
  * must at minimum not throw.
  */
class NullInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world good text here ok fine yes", "en", "s1", 38L),
    (2L, null.asInstanceOf[String], "en", "s1", 0L),
    (3L, "another ordinary document with words", "en", "s2", 36L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  // 64-dim: the sign-LSH / near-dup paths bucket with 64-dim planes
  private lazy val emb = Seq(
    (1L, Array.tabulate(64)(i => if (i == 0) 1f else 0f), 0),
    (2L, null.asInstanceOf[Array[Float]], 1),
    (3L, Array.tabulate(64)(i => if (i == 1) 1f else 0f), 0))
    .toDF("vec_id", "embedding", "label")

  private def total(name: String)(f: => Long): Unit =
    assert(f >= 0, s"$name must not throw on null rows")

  test("text operators survive a null-text row") {
    total("textStats")(TextAnalysis.textStats(docs).count())
    total("langId")(TextAnalysis.langId(docs).count())
    total("tokenCounts")(TextAnalysis.tokenCounts(docs).count())
    total("digests")(TextAnalysis.digests(docs).count())
    total("minKSketch")(TextAnalysis.minKSketch(docs, 4).count())
    total("tfidfTopTerms")(TextAnalysis.tfidfTopTerms(docs, 3).count())
    total("chunkWords")(TextAnalysis.chunkWords(docs, 5, 2).count())
    total("qualityFlags")(TextAnalysis.qualityFlags(docs).count())
    total("noveltyScores")(TextAnalysis.noveltyScores(docs).count())
    total("piiScrub")(TextAnalysis.piiScrub(docs).count())
    total("unigramSurprisal")(TextAnalysis.unigramSurprisal(docs).count())
    total("bm25TopDocs")(TextAnalysis.bm25TopDocs(docs, Seq("hello"), 5).count())
    total("sizePercentiles")(TextAnalysis.sizePercentiles(docs).count())
    total("repetitionSignals")(TextAnalysis.repetitionSignals(docs).count())
    total("sourceOverlap")(TextAnalysis.sourceOverlap(docs).count())
    total("removeBoilerplate")(TextAnalysis.removeBoilerplate(docs).count())
    total("dsirWeights")(Sampling.dsirWeights(docs).count())
  }

  test("dedup operators survive a null-text row") {
    total("exactSummary")(Dedup.exactSummary(docs).count())
    total("keepCanonical")(Dedup.keepCanonical(docs).count())
    total("ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, 0.5).count())
    total("minhashLshPairs")(Dedup.minhashLshPairs(docs, 0.5).count())
    total("simhash")(Dedup.simhash(docs).count())
    total("simhashPairs")(Dedup.simhashPairs(docs, 3).count())
    total("spanDedup")(Dedup.spanDedup(docs, 4).count())
    total("contaminationFlags")(
      Dedup.contaminationFlags(docs, docs.limit(1), 4, 2).count())
    total("incrementalFlags")(
      Dedup.incrementalFlags(docs.filter(col("doc_id") === 2L), docs, 0.5).count())
  }

  test("sampling/packing/pipeline operators survive a null-text row") {
    total("mixtureSample")(Sampling.mixtureSample(docs, Map("s1" -> 1.0), 0.5).count())
    total("upsample")(Sampling.upsample(docs, Map("s1" -> 2.0), 1.0).count())
    total("stratifiedSample")(
      Sampling.stratifiedSample(docs, col("source"), col("doc_id"), 10).count())
    total("tokenBudgetSummary")(
      Sampling.tokenBudgetSummary(docs, Map("s1" -> 100L), 100L).count())
    total("packWindows")(Packing.packWindows(docs, 8, 4).count())
    total("cleanSummary")(CorpusPipeline.cleanSummary(docs).count())
    total("corpusReport")(CorpusPipeline.corpusReport(docs).count())
  }

  test("vector operators survive a null-embedding row") {
    // queryId = 1 — the fixture's real vector (queryId 0 would make the
    // search vacuously empty)
    total("Search.topK")(Search.topK(emb, "cosine", 5, queryId = 1L).count())
    total("Ann.lshCosinePairs")(Ann.lshCosinePairs(emb, 0.1).count())
    total("Dedup.embeddingNearDup")(Dedup.embeddingNearDup(emb, 0.5).count())
    // the null-embedding row must DROP from the ranking, not ride along
    // as a null score under limit
    val top = Search.topK(emb, "cosine", 5, queryId = 1L).collect()
    assert(top.nonEmpty && top.length == 2, s"expected the 2 real rows, got ${top.length}")
    assert(top.forall(r => !r.isNullAt(r.fieldIndex("score"))),
      "top-k must not contain null scores")
  }

  test("a NaN-poisoned embedding never reaches rank 1 of a top-k") {
    val poisoned = Seq(
      (1L, Array.tabulate(64)(i => if (i == 0) 1f else 0f), 0),
      (2L, Array.tabulate(64)(i => if (i == 0) Float.NaN else 0f), 1),
      (3L, Array.tabulate(64)(i => if (i < 2) 1f else 0f), 0))
      .toDF("vec_id", "embedding", "label")
    // Spark orders NaN ABOVE every real double: without the rankable
    // guard vec 2 would sit at rank 1 of every descending top-k
    val top = Search.topK(poisoned, "cosine", 3, queryId = 1L).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 3L),
      s"NaN row must drop, got ${top.map(_.getLong(0)).toSeq}")
    val knn = Search.knnJoin(poisoned, "cosine", 2, 2).collect()
    assert(knn.forall(r => !r.getDouble(r.fieldIndex("score")).isNaN),
      "knnJoin must not rank NaN scores")
  }

  test("triplet mining survives null embeddings and NaN scores") {
    val e = Seq(
      (0L, Array.tabulate(64)(i => if (i == 0) 1f else 0f), 0),
      (1L, null.asInstanceOf[Array[Float]], 0),
      (2L, Array.tabulate(64)(i => if (i < 2) 1f else 0f), 0),
      (3L, Array.tabulate(64)(i => if (i == 0) Float.NaN else 0f), 1),
      (4L, Array.tabulate(64)(i => if (i == 1) 1f else 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Search.tripletMining(e, "cosine", nQueries = 1).collect()
    // anchor 0: positive must be the real same-label vec 2 (the null
    // drops), negative the real vec 4 (the NaN drops from ranking)
    assert(out.length == 1)
    assert(out.head.getLong(1) == 2L && out.head.getLong(3) == 4L,
      s"null/NaN candidates must not win an arm: ${out.head}")
  }

  test("curriculum order drops null-n_chars rows rather than throwing") {
    // a null length cannot be staged — it must not take the epoch
    // builder down, and it must not land in stage 2 by CASE fallthrough
    val d = Seq((1L, "a", Some(100L)), (2L, "b", Option.empty[Long]),
      (3L, "c", Some(500L))).toDF("doc_id", "text", "n_chars")
    val out = Sampling.curriculumOrder(d, limit = 10).collect()
    assert(out.length == 3, "null n_chars rows still flow through")
    val stages = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stages(1L) == 0 && stages(3L) == 2)
    assert(stages(2L) == 2, "CASE otherwise puts null lengths in the last stage")
  }
}
