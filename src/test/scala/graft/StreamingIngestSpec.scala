package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** SURVEY.md §7.6: streaming ingest path — VectorEntry is the natural
  * streaming record (`types.py:7`); Structured Streaming foreachBatch
  * validates + appends into the engine with the audit chain intact.
  */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch ingest: entries validated, appended, audited") {
    implicit val sc = spark.sqlContext
    val db = new VectorFieldDB(spark, 4)
    val mem = MemoryStream[VectorEntry]
    // AvailableNow snapshots offsets at start — enqueue first
    mem.addData(
      VectorEntry("e1", 1, 1, Array(1f, 2f, 3f, 4f), source_tag = "stream"),
      VectorEntry("e2", 2, 2, Array(4f, 3f, 2f, 1f), source_tag = "stream"))
    val q = mem.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[VectorEntry], _: Long) =>
        val rows = batch.collect().toSeq.map(e =>
          IGlyph(e.entry_id, e.glyph_id, e.outer_context_id, e.embedding,
            label = e.source_tag, meta = e.meta))
        if (rows.nonEmpty) db.addIGlyphs(rows)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    assert(db.iglyphs.count() == 2)
    assert(db.getIGlyph("e1").get.label == "stream")
    val hist = db.changeHistory.collect()
    assert(hist.length == 1 && hist.head.getAs[String]("action") == "ADD_IGLYPH")
    // second micro-batch continues the chain
    val mem2 = MemoryStream[VectorEntry]
    mem2.addData(VectorEntry("e3", 3, 3, Array(0f, 0f, 1f, 0f)))
    val q2 = mem2.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[VectorEntry], _: Long) =>
        val rows = batch.collect().toSeq.map(e =>
          IGlyph(e.entry_id, e.glyph_id, e.outer_context_id, e.embedding))
        if (rows.nonEmpty) db.addIGlyphs(rows)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(db.iglyphs.count() == 3)
    val chain = db.changeHistory.collect()
      .map(r => (r.getAs[String]("hash_before"), r.getAs[String]("hash_after")))
    assert(chain.length == 2 && chain(0)._2 == chain(1)._1)
  }

  test("foreachBatch incremental dedup: each micro-batch checked against grown history") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // history starts with one shipped doc; each accepted batch doc joins it
    var history = Seq((1L, base, "s")).toDF("doc_id", "text", "source")
    val accepted = scala.collection.mutable.ArrayBuffer[Long]()
    val mem = MemoryStream[(Long, String, String)]
    mem.addData(
      (10L, base, "s"),                        // dup of shipped history → dropped
      (11L, "fresh unseen words nothing shared with prior documents", "s"))
    val q = mem.toDS().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the SAME batch operator per micro-batch; survivors append to
        // history so the next batch sees them (KMeansIndex-style
        // persisted digests/bands at scale — frames here)
        val keep = operators.Dedup.incrementalFlags(batch, history, 0.5)
          .filter(col("keep")).select("doc_id")
        val ids = keep.collect().map(_.getLong(0))
        accepted.synchronized { accepted ++= ids }
        history = history.union(
          batch.join(keep, "doc_id").select("doc_id", "text", "source"))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(accepted.sorted == Seq(11L), s"accepted was $accepted")
    // a second batch replaying the accepted doc must now be caught by
    // the GROWN history — cross-batch dedup, not just vs the seed
    val mem2 = MemoryStream[(Long, String, String)]
    mem2.addData((20L, "fresh unseen words nothing shared with prior documents", "s"))
    val q2 = mem2.toDS().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = operators.Dedup.incrementalFlags(batch, history, 0.5)
          .filter(col("keep")).select("doc_id").collect().map(_.getLong(0))
        accepted.synchronized { accepted ++= ids }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(accepted.sorted == Seq(11L), "replayed content is caught by grown history")
  }

  test("foreachBatch quality gate: only keep-verdict docs land in the sink") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    mem.addData(
      (1L, "the cat sat on a mat and a dog slept in it quietly today", "s"),
      (2L, "buy now buy now buy now buy now buy now buy now", "s"),
      (3L, "the quick brown fox jumps over a lazy dog in the warm sun", "s"))
    val sink = scala.collection.mutable.ArrayBuffer[Long]()
    // the SAME batch operator runs per micro-batch — stream/batch parity
    // by construction; qualityFlags' aggregations are legal here because
    // foreachBatch hands over a plain batch DataFrame
    val q = mem.toDS().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = operators.TextAnalysis.qualityFlags(batch)
          .filter(org.apache.spark.sql.functions.col("keep"))
          .select("doc_id").collect().map(_.getLong(0))
        sink.synchronized { sink ++= kept }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(sink.sorted == Seq(1L, 3L), s"sink was $sink")
  }

  test("foreachBatch IVF ingest: streamed vectors land in the pruned persisted index") {
    // the appendPersisted scaladoc's claim ("works as a Structured
    // Streaming foreachBatch sink body") exercised literally: stream
    // two micro-batches of vectors into a persisted layout, then a
    // probe search over the committed view must see them with the SAME
    // cell assignment a from-scratch assignment would give
    import graft.operators.KMeansIndex
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfstream").toString
    val base = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 13).toFloat / 13f)))
      .toDF("vec_id", "embedding")
    KMeansIndex.persist(KMeansIndex.build(base, k = 4), dir)
    val mem = MemoryStream[(Long, Seq[Float])]
    mem.addData((100L, Seq.fill(8)(0.9f)), (101L, Seq.fill(8)(0.05f)))
    val q = mem.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) KMeansIndex.appendPersisted(spark, dir, batch)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // nProbe = k → the search sees every cell; both streamed vectors
    // must be findable in the committed view
    val hits = KMeansIndex.searchPersisted(spark, dir,
        Array.fill(8)(0.9f), topK = 3, nProbe = 4)
      .collect().map(_.getLong(0))
    assert(hits.contains(100L), s"streamed vector missing from search: ${hits.toSeq}")
    // and a pruned probe (nProbe=1) of the exact query still finds it —
    // the append assigned it to the cell the query probes first
    val pruned = KMeansIndex.searchPersisted(spark, dir,
        Array.fill(8)(0.9f), topK = 1, nProbe = 1)
      .collect().map(_.getLong(0))
    assert(pruned.toSeq == Seq(100L),
      s"append-time cell assignment diverged from probe: ${pruned.toSeq}")
  }

  test("foreachBatch index ingest: streamed batches land in the searchable BM25 index") {
    import graft.operators.InvertedIndex
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bm25stream").toString
    InvertedIndex.build(
      Seq((1L, "query plan cost", "s")).toDF("doc_id", "text", "source"), dir)
    val mem = MemoryStream[(Long, String, String)]
    mem.addData((2L, "fast query merge", "s"), (3L, "unrelated words", "s"))
    val q = mem.toDS().toDF("doc_id", "text", "source").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) InvertedIndex.appendBatch(batch, dir)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // the streamed docs are searchable and rank identically to a
    // from-scratch index of the union
    val got = InvertedIndex.search(spark, Seq("query"), k = 5, dir = dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val full = java.nio.file.Files.createTempDirectory("bm25streamfull").toString
    InvertedIndex.build(Seq(
      (1L, "query plan cost", "s"), (2L, "fast query merge", "s"),
      (3L, "unrelated words", "s")).toDF("doc_id", "text", "source"), full)
    val want = InvertedIndex.search(spark, Seq("query"), k = 5, dir = full)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    assert(got.map(_._1).toSet == Set(1L, 2L))
  }

  test("contaminationGate: stream and batch verdicts are identical (stateless gate)") {
    import graft.operators.Dedup
    implicit val sc = spark.sqlContext
    val bench = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "a b c d e f g h i j"),              // 3 shared 8-grams → flagged
      (2L, "a b c d e f g h X Y"),              // 1 shared → below minShared=3
      (3L, "nothing in common with the bench at all here"),
      (4L, "short doc"),                        // <8 words → 0 shared
      (5L, null.asInstanceOf[String]))          // null text → 0 shared
    // the gate is ONE stateless projection, so it must run under
    // readStream with no watermark/state and agree with the batch
    // form row-for-row
    val mem = MemoryStream[(Long, String)]
    mem.addData(incoming: _*)
    val streamed = Dedup.contaminationGate(
      mem.toDS().toDF("doc_id", "text"), bench, n = 8, minShared = 3)
    assert(streamed.isStreaming, "the gate must stay streaming-safe")
    val q = streamed.writeStream.format("memory")
      .queryName("contam_gate").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val viaStream = spark.table("contam_gate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val viaBatch = Dedup.contaminationGate(
        incoming.toDF("doc_id", "text"), bench, n = 8, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(viaStream.toSeq == viaBatch.toSeq,
      s"stream/batch divergence: ${viaStream.toSeq} vs ${viaBatch.toSeq}")
    assert(viaBatch.toSeq == Seq((1L, 3L, true), (2L, 1L, false),
      (3L, 0L, false), (4L, 0L, false), (5L, 0L, false)), s"${viaBatch.toSeq}")
  }

  test("contaminationGate: the vocabulary transfer cap binds in-plan") {
    import graft.operators.Dedup
    // 40 distinct 8-grams vs maxVocab = 8 → loud refusal, and the
    // plan-capped transfer means the driver never held the domain
    val bench = (1 to 8).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h w${i}i w${i}j w${i}k w${i}l"))
      .toDF("doc_id", "text")
    val inc = Seq((1L, "x y")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.contaminationGate(inc, bench, n = 8, minShared = 1, maxVocab = 8)
    }
    assert(ex.getMessage.contains("maxVocab"))
  }
}
