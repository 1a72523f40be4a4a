package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** Streaming CDC: the SCD2 merge applied per micro-batch through
  * foreachBatch must converge to the same current state the BATCH
  * history rebuild derives from the full log — the stream/batch parity
  * pin for the Cdc pair (the Streaming.scala discipline applied to
  * dimension maintenance).
  */
class StreamingCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch scd2Merge over micro-batches ≡ batch scd2FromLog current rows") {
    implicit val sc = spark.sqlContext
    // change log: (key, ts, state, id) in three micro-batches with
    // re-sends (same state again) and flip-backs (a → b → a)
    val b1 = Seq((1L, 10L, "a", 1L), (2L, 10L, "x", 2L))
    val b2 = Seq((1L, 20L, "b", 3L), (2L, 20L, "x", 4L), (3L, 20L, "n", 5L))
    val b3 = Seq((1L, 30L, "a", 6L))
    val all = b1 ++ b2 ++ b3

    // accumulated current state, merged batch by batch
    var current = Seq.empty[(Long, String, Long)]
      .toDF("key", "state", "f")
      .select(col("key"), col("state"), timestamp_micros(col("f")).as("effective_from_ts"))

    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = mem.toDS().toDF("key", "t", "state", "id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val upd = Cdc.latestState(
          batch.select(col("key"), timestamp_micros(col("t")).as("ts"),
            col("state"), col("id")),
          col("key"), col("ts"), col("state"), col("id"))
        val merged = Cdc.scd2Merge(current, upd)
        // persist only the OPEN rows as the next batch's current side
        // (a real sink would also append the closed rows); materialize
        // eagerly — the next merge must not recompute this lineage
        current = merged.filter(col("is_current"))
          .select(col("key"), col("state"), col("effective_from_ts"))
          .localCheckpoint()
        ()
      }
      .start()
    // drive each change set as its OWN micro-batch — per-batch
    // compaction (latestState) is lossy about run starts, so batch
    // boundaries are part of the CDC contract being tested
    for (b <- Seq(b1, b2, b3)) { mem.addData(b); q.processAllAvailable() }
    q.stop()

    val streamed = current
      .select(col("key"), col("state"),
        unix_micros(col("effective_from_ts")).as("f"))
      .as[(Long, String, Long)].collect().toSet

    val batchCurrent = Cdc.scd2FromLog(
        all.toDF("key", "t", "state", "id")
          .select(col("key"), timestamp_micros(col("t")).as("ts"),
            col("state"), col("id")),
        col("key"), col("ts"), col("state"), col("id"))
      .filter(col("is_current"))
      .select(col("key"), col("state"),
        unix_micros(col("effective_from_ts")).as("f"))
      .as[(Long, String, Long)].collect().toSet

    assert(streamed == batchCurrent,
      s"stream-merged current state must equal the batch rebuild:\n" +
        s"stream: $streamed\nbatch:  $batchCurrent")
    // and the expected content, explicitly: 1→a (reopened at 30),
    // 2→x (unchanged since 10), 3→n (new at 20)
    assert(streamed == Set((1L, "a", 30L), (2L, "x", 10L), (3L, "n", 20L)))
  }

  test("scd2LookupStream: streamed fact enrichment equals the batch lookup") {
    implicit val sc = spark.sqlContext
    // dim with a boundary, a gap, and an open null-state version — the
    // same edge set the batch CdcSpec fixture pins
    val dim = Seq(
      (1L, Some("a"), 0L, Some(10L)),
      (1L, Some("b"), 10L, Some(20L)),
      (1L, None: Option[String], 30L, None: Option[Long]))
      .toDF("key", "state", "f", "t")
      .select(col("key"), col("state"),
        timestamp_micros(col("f")).as("effective_from_ts"),
        timestamp_micros(col("t")).as("effective_to_ts"))
    val factRows = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 25L),
      (103L, 1L, 35L), (104L, 2L, 5L))
    val mem = MemoryStream[(Long, Long, Long)]
    mem.addData(factRows: _*)
    val facts = mem.toDS().toDF("event_id", "key", "t")
      .select(col("event_id"), col("key"), timestamp_micros(col("t")).as("ts"))
    val q = streaming.Streaming.scd2LookupStream(facts, dim)
      .writeStream.format("memory").queryName("scd2_lookup_stream_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("dim_state"),
        unix_micros(col("dim_effective_from_ts")).as("f"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val streamed = norm(spark.table("scd2_lookup_stream_out"))
    val batch = norm(Cdc.scd2Lookup(
      factRows.toDF("event_id", "key", "t")
        .select(col("event_id"), col("key"), timestamp_micros(col("t")).as("ts")),
      dim))
    assert(streamed == batch && streamed.size == factRows.size,
      s"stream-static lookup must equal the batch as-of lookup:\n" +
        s"stream: $streamed\nbatch:  $batch")
    // the semantics, explicitly: boundary→newer version, gap→NULL,
    // open null-state version→matched-with-null, unknown key→NULL
    assert(streamed == Set((100L, "a", 0L), (101L, "b", 10L),
      (102L, null, -1L), (103L, null, 30L), (104L, null, -1L)))
  }

  test("scd2LookupStream: a fact payload column named state does not collide") {
    // the batch operator accepts arbitrary fact payloads (asofJoin
    // prefixes the dim side) — the streaming form must too, so its dim
    // columns carry private aliases; a facts side with its own `state`
    // would otherwise be an ambiguous reference at plan time
    val dim = Seq((1L, "dimstate", 0L, None: Option[Long]))
      .toDF("key", "state", "f", "t")
      .select(col("key"), col("state"),
        timestamp_micros(col("f")).as("effective_from_ts"),
        timestamp_micros(col("t")).as("effective_to_ts"))
    val facts = Seq((1L, 5L, "factpayload")).toDF("key", "t", "state")
      .select(col("key"), timestamp_micros(col("t")).as("ts"), col("state"))
    // works on batch frames too (plain join) — enough to prove resolution
    val out = streaming.Streaming.scd2LookupStream(facts, dim)
    assert(out.columns.count(_ == "state") == 1 &&
      out.columns.contains("dim_state"))
    val row = out.head()
    assert(row.getAs[String]("state") == "factpayload" &&
      row.getAs[String]("dim_state") == "dimstate")
  }
}
