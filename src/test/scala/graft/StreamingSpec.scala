package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming
import graft.streaming.Streaming.{Event, Session}

/** Streaming operators driven end-to-end with MemoryStream sources and
  * memory sinks; batch/stream parity checks.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(3600L * 1000 * 10 + min * 60000L)

  private val fixture = Seq(
    Event(1, ts(0), 1, "click", 1.0),
    Event(2, ts(10), 1, "click", 2.0),
    Event(3, ts(70), 1, "view", 3.0),   // > 30 min gap → new session
    Event(4, ts(5), 2, "click", 4.0))

  test("hourlyAgg: streaming result equals batch result") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = Streaming.hourlyAgg(mem.toDF()).writeStream
      .format("memory").queryName("hourly_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hourly_out")
      .orderBy("hour", "event_type").collect().map(_.toSeq)
    val batch = Streaming.hourlyAgg(fixture.toDF())
      .orderBy("hour", "event_type").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
  }

  test("hoppingAgg: streaming equals batch; every event in exactly two windows") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = Streaming.hoppingAgg(mem.toDF()).writeStream
      .format("memory").queryName("hopping_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hopping_out")
      .orderBy("w_start", "event_type").collect().map(_.toSeq)
    val batch = Streaming.hoppingAgg(fixture.toDF())
      .orderBy("w_start", "event_type").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
    // 2h windows sliding 1h: Σ window counts = 2 × events
    val total = spark.table("hopping_out")
      .agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(total == 2L * fixture.size, s"each event must land in exactly 2 windows, got $total")
  }

  test("sessionAgg: 30-min gap splits sessions per user") {
    val out = Streaming.sessionAgg(fixture.toDF(), gapSeconds = 1800)
      .orderBy("user_id", "session_start").collect()
    // user 1: two sessions (0+10 merged, 70 separate); user 2: one
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1)
    assert(out(2).getAs[Long]("user_id") == 2)
  }

  test("sessionAgg works as a streaming query with watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = Streaming.sessionAgg(mem.toDF()).writeStream
      .format("memory").queryName("sess_out").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("sess_out").count() == 3)
  }

  test("windowCounts: streaming equals batch; trendingTypes ranks with deterministic ties") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(fixture: _*)
    val q = Streaming.windowCounts(mem.toDF(), 3600L, watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("trend_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("trend_out")
      .orderBy("window_start", "event_type").collect().map(_.toSeq)
    val batch = Streaming.windowCounts(fixture.toDF(), 3600L)
      .orderBy("window_start", "event_type").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty)
    // fixture: hour 0 holds 3 clicks, hour 1 holds 1 view -> one rank-1
    // row per window at topK=1
    val top = Streaming.trendingTypes(fixture.toDF(), 3600L, 1).collect()
    assert(top.length == 2)
    assert(top.map(r => (r.getAs[String]("event_type"), r.getAs[Int]("rank"))).toSeq
      == Seq(("click", 1), ("view", 1)))
    // explicit tie fixture: equal counts in one window tie-break
    // lexicographically, topK cuts after the rank
    val tie = Seq(
      Event(10, ts(0), 1, "view", 0.0), Event(11, ts(1), 2, "view", 0.0),
      Event(12, ts(2), 3, "click", 0.0), Event(13, ts(3), 4, "click", 0.0),
      Event(14, ts(4), 5, "error", 0.0))
    val ranked = Streaming.trendingTypes(tie.toDF(), 3600L, 2).collect()
    assert(ranked.map(r => (r.getAs[String]("event_type"), r.getAs[Int]("rank"))).toSeq
      == Seq(("click", 1), ("view", 2)))
  }

  test("trendingTypes stateful stage executes on the RocksDB state store") {
    // round-7 verdict item 7: the stream/batch parity above runs the
    // stateful path on the default HDFS-backed store — run it once
    // against RocksDB (the provider a production deployment uses for
    // large state) and pin that the operator EXECUTED there, via the
    // rocksdb custom metrics in the query progress, not just planned.
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Event]
      mem.addData(fixture: _*)
      val q = Streaming.windowCounts(mem.toDF(), 3600L, watermark = Some("2 hours"))
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode("complete").start()
      q.processAllAvailable()
      val progress = q.lastProgress
      q.stop()
      assert(progress.stateOperators.nonEmpty, "expected a stateful operator")
      assert(progress.json.contains("rocksdb"),
        s"expected rocksdb state-store metrics in progress:\n${progress.json}")
      val streamed = spark.table("rocks_out")
        .orderBy("window_start", "event_type").collect().map(_.toSeq)
      val batch = Streaming.windowCounts(fixture.toDF(), 3600L)
        .orderBy("window_start", "event_type").collect().map(_.toSeq)
      assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty,
        "RocksDB-backed stream result must equal the batch result")
    }
  }

  /** Run `body` with the RocksDB state-store provider active, restoring
    * the previous provider after — the shared harness for the
    * per-stateful-operator execution smokes below (round-8 verdict
    * item 5: every stateful op runs once on the production store).
    */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("dedupIngest stateful dedup executes on the RocksDB state store") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val replayed = fixture ++ Seq(fixture(0), fixture(0), fixture(3))
      val mem = MemoryStream[Event]
      mem.addData(replayed: _*)
      val q = Streaming.dedupIngest(mem.toDF()).writeStream
        .format("memory").queryName("rocks_ingest_dedup_out")
        .outputMode("append").start()
      q.processAllAvailable()
      val progress = q.lastProgress
      q.stop()
      assert(progress.stateOperators.nonEmpty, "expected a stateful operator")
      assert(progress.json.contains("rocksdb"),
        s"expected rocksdb state-store metrics in progress:\n${progress.json}")
      val streamed = spark.table("rocks_ingest_dedup_out")
        .orderBy("event_id").collect().map(_.toSeq)
      val batch = Streaming.dedupIngest(replayed.toDF())
        .orderBy("event_id").collect().map(_.toSeq)
      assert(streamed.toSeq == batch.toSeq && streamed.length == fixture.length,
        "RocksDB-backed dedup must equal the batch result")
    }
  }

  test("clickErrorJoin stream-stream join executes on the RocksDB state store") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val evts = Seq(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(5), 1, "error", 0.0),
        Event(3, ts(30), 1, "error", 0.0),
        Event(4, ts(4), 2, "click", 1.0),
        Event(5, ts(6), 2, "click", 1.0),
        Event(6, ts(8), 2, "error", 0.0))
      val mem = MemoryStream[Event]
      mem.addData(evts: _*)
      val q = Streaming.clickErrorJoin(mem.toDF(), windowSeconds = 600)
        .writeStream.format("memory").queryName("rocks_cej_out")
        .outputMode("append").start()
      q.processAllAvailable()
      val progress = q.lastProgress
      q.stop()
      assert(progress.stateOperators.nonEmpty, "expected join state operators")
      assert(progress.json.contains("rocksdb"),
        s"expected rocksdb state-store metrics in progress:\n${progress.json}")
      val streamed = spark.table("rocks_cej_out")
        .orderBy("error_id", "click_id").collect().map(_.toSeq)
      val batch = Streaming.clickErrorJoin(evts.toDF(), windowSeconds = 600)
        .orderBy("error_id", "click_id").collect().map(_.toSeq)
      assert(streamed.toSeq == batch.toSeq && streamed.length == 3,
        "RocksDB-backed stream-stream join must equal the batch result")
    }
  }

  test("watermark DROPS a late event in append mode; batch would keep it") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // batch 1: events at minute 0 and minute 300 — the late arrival
    // threshold advances to max(ts) − 1h = minute 240 after this batch
    mem.addData(Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(300), 1, "view", 1.0))
    val q = Streaming.windowCounts(mem.toDF(), 3600L, watermark = Some("1 hour"))
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 2: an event for the LONG-CLOSED minute-0 window (< the
    // watermark) plus a fresh event that advances time further
    mem.addData(Event(3, ts(1), 2, "click", 1.0),
      Event(4, ts(600), 2, "view", 1.0))
    q.processAllAvailable()
    // batch 3: push the watermark past every open window so all
    // on-time aggregates finalize and emit
    mem.addData(Event(5, ts(1200), 3, "view", 1.0))
    q.processAllAvailable(); q.stop()
    def toCountMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window_start"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect()
      .map { case (w, t, n) => (w, t) -> n }.toMap
    val counts = toCountMap(spark.table("late_out"))
    // the minute-0 click window finalized with ONE event — the late
    // replay (event 3) was dropped, not merged
    val hour0 = java.time.Instant.ofEpochSecond(36000L)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(counts((hour0, "click")) == 1L,
      s"late event must be dropped by the watermark: $counts")
    // batch semantics over the same rows KEEPS it — the drop is a
    // streaming watermark effect, not a filter in the operator
    val allRows = Seq(Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(300), 1, "view", 1.0), Event(3, ts(1), 2, "click", 1.0),
      Event(4, ts(600), 2, "view", 1.0), Event(5, ts(1200), 3, "view", 1.0))
    val batch = toCountMap(Streaming.windowCounts(allRows.toDF(), 3600L))
    assert(batch((hour0, "click")) == 2L)
  }

  test("streaming dedup: dropDuplicatesWithinWatermark removes replayed events") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(0), 1, "click", 1.0), // exact replay
      Event(2, ts(1), 1, "view", 2.0))
    val q = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == 2)
  }

  test("dedupIngest: streaming result equals batch result on replayed input") {
    implicit val sc = spark.sqlContext
    val replayed = fixture ++ Seq(
      fixture(0), fixture(0),          // event 1 delivered three times
      fixture(3))                      // event 4 delivered twice
    val mem = MemoryStream[Event]
    mem.addData(replayed: _*)
    val q = Streaming.dedupIngest(mem.toDF()).writeStream
      .format("memory").queryName("ingest_dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ingest_dedup_out")
      .orderBy("event_id").collect().map(_.toSeq)
    // batch run of the SAME plan (watermark eliminated): one row per id
    val batch = Streaming.dedupIngest(replayed.toDF())
      .orderBy("event_id").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.length == fixture.length)
  }

  test("clickErrorJoin: stream-stream interval join matches batch result") {
    implicit val sc = spark.sqlContext
    val evts = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "error", 0.0),   // joins click 1 (5 min back)
      Event(3, ts(30), 1, "error", 0.0),  // > 10 min after click 1 → no match
      Event(4, ts(4), 2, "click", 1.0),
      Event(5, ts(6), 2, "click", 1.0),
      Event(6, ts(8), 2, "error", 0.0))   // joins clicks 4 and 5
    val mem = MemoryStream[Event]
    mem.addData(evts: _*)
    val q = Streaming.clickErrorJoin(mem.toDF(), windowSeconds = 600).writeStream
      .format("memory").queryName("cej_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cej_out")
      .orderBy("error_id", "click_id").collect().map(_.toSeq)
    val batch = Streaming.clickErrorJoin(evts.toDF(), windowSeconds = 600)
      .orderBy("error_id", "click_id").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.length == 3)
    assert(streamed.map(r => (r(1), r(3))).toSeq == Seq((2L, 1L), (6L, 4L), (6L, 5L)))
  }

  test("statefulSessionize emits closed sessions, keeps open state") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.statefulSessionize(mem.toDS(), gapMillis = 1800000)
      .writeStream.format("memory").queryName("stateful_out")
      .outputMode("append").start()
    mem.addData(fixture: _*)
    q.processAllAvailable()
    // only user 1's first session closed (event at +70min arrived after gap)
    val closed = spark.table("stateful_out").as[Session].collect()
    assert(closed.length == 1 && closed.head.n_events == 2 &&
      closed.head.sum_value == 3.0)
    // a later far-future event closes user 1's second session
    mem.addData(Event(9, ts(300), 1, "click", 9.0))
    q.processAllAvailable(); q.stop()
    assert(spark.table("stateful_out").count() == 2)
  }

  test("statefulSessionize custom state executes on the RocksDB state store") {
    // the flatMapGroupsWithState path keeps arbitrary user state — the
    // one stateful shape the other smokes don't cover on RocksDB
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Event]
      val q = Streaming.statefulSessionize(mem.toDS(), gapMillis = 1800000)
        .writeStream.format("memory").queryName("rocks_stateful_out")
        .outputMode("append").start()
      mem.addData(fixture: _*)
      q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress.stateOperators.nonEmpty, "expected custom-state operator")
      assert(progress.json.contains("rocksdb"),
        s"expected rocksdb state-store metrics in progress:\n${progress.json}")
      mem.addData(Event(9, ts(300), 1, "click", 9.0))
      q.processAllAvailable(); q.stop()
      // same session semantics as the default-store test above
      assert(spark.table("rocks_stateful_out").count() == 2)
    }
  }

  test("Count-Min counters stream incrementally on RocksDB, equal to batch") {
    // the sketch's streaming aggregation state is bounded at
    // depth*width keys BY CONSTRUCTION — the rare full-history corpus
    // statistic that streams without a watermark forever (an exact
    // per-word count's state would be the vocabulary); complete-mode
    // output is the counter table itself
    withRocksDb {
      implicit val sc = spark.sqlContext
      val docsFixture = Seq((1L, "a a b c"), (2L, "b d d e"), (3L, "e e a f"))
      val mem = MemoryStream[(Long, String)]
      val q = operators.CountMin.counters(
          mem.toDF().toDF("doc_id", "text"), depth = 4, width = 64)
        .writeStream.format("memory").queryName("rocks_cms_out")
        .outputMode("complete").start()
      mem.addData(docsFixture.take(2): _*)
      q.processAllAvailable()
      mem.addData(docsFixture.drop(2): _*)   // second batch: state merges
      q.processAllAvailable()
      val progress = q.lastProgress
      q.stop()
      assert(progress.stateOperators.nonEmpty, "expected a stateful operator")
      assert(progress.stateOperators.head.numRowsTotal <= 4L * 64L,
        "sketch state must stay bounded by depth*width")
      assert(progress.json.contains("rocksdb"),
        s"expected rocksdb state-store metrics in progress:\n${progress.json}")
      import spark.implicits._
      val streamed = spark.table("rocks_cms_out")
        .orderBy("d", "bucket").collect().map(_.toSeq)
      val batch = operators.CountMin.counters(
          docsFixture.toDF("doc_id", "text"), depth = 4, width = 64)
        .orderBy("d", "bucket").collect().map(_.toSeq)
      assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty,
        "RocksDB-backed streaming counters must equal the batch counters")
    }
  }

  test("KMV sketch streams on RocksDB with one state row; exact lane parity") {
    // third member of the streaming sketch family: distinct counting
    // with k-longs state; below k the streamed sketch must EQUAL the
    // batch sketch exactly (sorted distinct bottom-k is merge-order-
    // independent, unlike the MG summary — so full equality is fair)
    withRocksDb {
      implicit val sc = spark.sqlContext
      val keys = (1 to 40).map(i => (i.toLong, s"user${i % 25}"))
      val mem = MemoryStream[(Long, String)]
      val q = operators.Kmv.sketchPass(
          mem.toDF().toDF("id", "w"), k = 64)
        .writeStream.format("memory").queryName("rocks_kmv_out")
        .outputMode("complete").start()
      mem.addData(keys.take(20): _*)
      q.processAllAvailable()
      mem.addData(keys.drop(20): _*)
      q.processAllAvailable()
      val progress = q.lastProgress
      q.stop()
      assert(progress.stateOperators.nonEmpty, "expected a stateful operator")
      assert(progress.stateOperators.head.numRowsTotal == 1L,
        "the global sketch aggregate keeps exactly one state row")
      assert(progress.json.contains("rocksdb"),
        s"expected rocksdb state-store metrics in progress:\n${progress.json}")
      import spark.implicits._
      val streamed = spark.table("rocks_kmv_out").head().getSeq[Long](0)
      val batch = operators.Kmv.sketchPass(
          keys.toDF("id", "w"), k = 64).head().getSeq[Long](0)
      assert(streamed == batch && streamed.length == 25,
        "streamed bottom-k must equal the batch bottom-k (25 distinct users)")
    }
  }

  test("Misra-Gries sketch pass streams on RocksDB; retention law holds") {
    // the MG summary's CONTENT is merge-order-dependent, so streaming
    // equality with batch would over-pin; what the scheme guarantees —
    // and what pass 2 relies on — is retention: any item with count >
    // n/(capacity+1) is in the candidate set. Pin that law on the
    // streamed summary, plus bounded 1-row state and bounded map size.
    withRocksDb {
      implicit val sc = spark.sqlContext
      val capacity = 8
      // "hot" appears 30 times among 40 singletons: 30 > 70/9 ≈ 7.8
      val docsFixture =
        (Seq.fill(30)("hot") ++ Seq.tabulate(40)(i => s"u$i"))
          .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val mem = MemoryStream[(Long, String)]
      val q = operators.HeavyHitters.sketchPass(
          mem.toDF().toDF("doc_id", "text"), capacity)
        .writeStream.format("memory").queryName("rocks_mg_out")
        .outputMode("complete").start()
      mem.addData(docsFixture.take(35): _*)
      q.processAllAvailable()
      mem.addData(docsFixture.drop(35): _*)
      q.processAllAvailable()
      val progress = q.lastProgress
      q.stop()
      assert(progress.stateOperators.nonEmpty, "expected a stateful operator")
      assert(progress.stateOperators.head.numRowsTotal == 1L,
        "the global sketch aggregate keeps exactly one state row")
      assert(progress.json.contains("rocksdb"),
        s"expected rocksdb state-store metrics in progress:\n${progress.json}")
      val out = spark.table("rocks_mg_out").head()
      val summary = out.getStruct(0).getMap[String, Long](0)
      assert(summary.size <= capacity, "summary must respect capacity")
      assert(out.getLong(1) == 70L, "n_total must count the whole stream")
      assert(summary.contains("hot"),
        s"retention law: count-30 item must survive in $summary")
    }
  }
}
