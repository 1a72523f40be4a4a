package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** SCD2 semantics pins: run-length compaction, half-open intervals,
  * merge lanes, idempotence, and the one-exchange plan shape.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def log(rows: (Long, Long, String, Long)*) =
    rows.toDF("k", "t", "st", "id")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("st"), col("id"))

  test("scd2FromLog collapses consecutive runs into half-open intervals") {
    // key 1: a a b a  → [a@0,2) [b@2,3) [a@3,∞); key 2: c → [c@10,∞)
    val df = Cdc.scd2FromLog(
      log((1L, 0L, "a", 0L), (1L, 1L, "a", 1L), (1L, 2L, "b", 2L),
        (1L, 3L, "a", 3L), (2L, 10L, "c", 4L)),
      col("k"), col("t"), col("st"), col("id"))
      .orderBy(col("key"), col("effective_from_ts"))
      .select(col("key"), col("state"),
        col("effective_from_ts").cast("long").as("f"),
        col("effective_to_ts").cast("long").as("to"),
        col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))

    assert(df.toSeq == Seq(
      (1L, "a", 0L, 2L, false), (1L, "b", 2L, 3L, false),
      (1L, "a", 3L, -1L, true), (2L, "c", 10L, -1L, true)))
  }

  test("ties on ts break on the tie column — the ordering is total") {
    // same ts, ids 5 then 6: id order decides which state is 'last'
    val out = Cdc.scd2FromLog(
      log((1L, 7L, "x", 5L), (1L, 7L, "y", 6L)),
      col("k"), col("t"), col("st"), col("id"))
      .orderBy(col("effective_from_ts"), col("state"))
      .select(col("state"), col("is_current")).as[(String, Boolean)].collect()
    assert(out.toSeq == Seq(("x", false), ("y", true)))
  }

  test("scd2FromLog plans ONE exchange for both window frames") {
    val plan = Cdc.scd2FromLog(log((1L, 0L, "a", 0L)),
      col("k"), col("t"), col("st"), col("id"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"lag and lead share partitioning+ordering — expected 1 exchange, got $exchanges:\n$plan")
  }

  test("scd2Merge routes the four lanes and is idempotent on re-sends") {
    val cur = Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L))
      .toDF("key", "state", "f")
      .select(col("key"), col("state"), col("f").cast("timestamp").as("effective_from_ts"))
    val upd = Seq((2L, "b", 5L), (3L, "d", 5L), (4L, "e", 5L))
      .toDF("key", "state", "t")
      .select(col("key"), col("state"), col("t").cast("timestamp").as("ts"))
    val out = Cdc.scd2Merge(cur, upd)
      .select(col("key"), col("state"), col("lane"), col("is_current"))
      .as[(Long, String, String, Boolean)].collect().toSet
    assert(out == Set(
      (1L, "a", "unchanged", true),   // absent from batch → untouched
      (2L, "b", "unchanged", true),   // same state re-sent → no new version
      (3L, "c", "closed", false),     // superseded: closes at update ts
      (3L, "d", "reopened", true),    // ... and the new version opens
      (4L, "e", "new", true)))        // first sighting
    // idempotence: merging the SAME batch into the resulting current
    // rows changes nothing (every lane lands in unchanged)
    val cur2 = Cdc.scd2Merge(cur, upd).filter(col("is_current"))
      .select(col("key"), col("state"), col("effective_from_ts"))
    val again = Cdc.scd2Merge(cur2, upd)
    assert(again.filter(col("lane") =!= "unchanged").count() == 0L)
  }

  test("scd2Lookup: half-open boundaries, gaps yield NULL, null state distinguishable") {
    // dim for key 1: a@[0,10) → b@[10,20) → (GAP: trimmed) → NULL-state@[30,∞)
    val dim = Seq(
      (1L, Some("a"), 0L, Some(10L)),
      (1L, Some("b"), 10L, Some(20L)),
      (1L, None: Option[String], 30L, None: Option[Long]))
      .toDF("key", "state", "f", "t")
      .select(col("key"), col("state"),
        col("f").cast("timestamp").as("effective_from_ts"),
        col("t").cast("timestamp").as("effective_to_ts"))
    val facts = Seq(
      (100L, 1L, 5L),    // mid-interval → a
      (101L, 1L, 10L),   // AT the boundary → the NEWER version (b)
      (102L, 1L, 19L),   // last instant of b → b
      (103L, 1L, 25L),   // in the GAP → NULL (not stale b)
      (104L, 1L, 35L),   // open null-state version → matched, state null
      (105L, 2L, 5L))    // unknown key → NULL
      .toDF("event_id", "key", "t")
      .select(col("event_id"), col("key"), col("t").cast("timestamp").as("ts"))
    val out = Cdc.scd2Lookup(facts, dim)
      .select(col("event_id"), col("dim_state"),
        col("dim_effective_from_ts").cast("long").as("from"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(100L) == (("a", 0L)))
    assert(out(101L) == (("b", 10L)), "a boundary fact takes the NEWER version")
    assert(out(102L) == (("b", 10L)))
    assert(out(103L) == ((null, -1L)), "a gap fact gets NULL, never the stale version")
    assert(out(104L) == ((null, 30L)),
      "a legitimately-NULL state stays matched (from is non-null)")
    assert(out(105L) == ((null, -1L)))
  }

  test("scd2Lookup: an empty [t,t) interval never shadows its same-from sibling") {
    // a same-instant change-log tie produces version z@[5,5) (empty)
    // and a@[5,∞) — equal effective_from_ts. The as-of carry breaks
    // equal-time ties by payload order, so without the empty-interval
    // drop the z version could win the carry and NULL every lookup
    // from t=5 onward while 'a' held the answer
    val events = log((1L, 5L, "z", 1L), (1L, 5L, "a", 2L))
    val dim = Cdc.scd2FromLog(events, col("k"), col("t"), col("st"), col("id"))
    // sanity: the tie really does produce the empty interval
    assert(dim.filter(col("effective_from_ts") === col("effective_to_ts"))
      .count() == 1L)
    val facts = Seq((100L, 1L, 5L), (101L, 1L, 9L), (102L, 1L, 3L))
      .toDF("event_id", "key", "t")
      .select(col("event_id"), col("key"), col("t").cast("timestamp").as("ts"))
    val out = Cdc.scd2Lookup(facts, dim)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    assert(out(100L) == "a", s"the boundary fact takes the live sibling: $out")
    assert(out(101L) == "a")
    assert(out(102L) == null, "before any version → unmatched")
  }

  test("scd2Lookup composes with scd2FromLog: every log event sees its own state") {
    // looking each log event up in the history built FROM that log must
    // return the event's own state (it starts or continues a version)
    val events = log((1L, 0L, "a", 0L), (1L, 5L, "a", 1L), (1L, 9L, "b", 2L),
      (2L, 3L, "c", 3L))
    val dim = Cdc.scd2FromLog(events, col("k"), col("t"), col("st"), col("id"))
    val facts = events.select(col("k").as("key"), col("t").as("ts"),
      col("id").as("event_id"), col("st"))
    val out = Cdc.scd2Lookup(facts, dim)
    assert(out.filter(!(col("dim_state") <=> col("st"))).count() == 0L,
      "every event's looked-up state must equal its own logged state")
    assert(out.count() == 4L)
  }

  test("scd2Merge: NULL key fails loudly instead of fanning out") {
    // the lane predicates read c_key/u_key nullness as "absent from
    // that side", so a genuinely-null input key would alias the
    // full-outer non-match signal and sail through as independent
    // unchanged/new lanes — the in-plan guard raises instead
    val cur = Seq((Some(1L), "a", 0L), (None, "x", 0L))
      .toDF("key", "state", "f")
      .select(col("key"), col("state"), col("f").cast("timestamp").as("effective_from_ts"))
    val upd = Seq((2L, "e", 5L)).toDF("key", "state", "t")
      .select(col("key"), col("state"), col("t").cast("timestamp").as("ts"))
    val ex = intercept[Exception] { Cdc.scd2Merge(cur, upd).collect() }
    def msg(e: Throwable): String =
      Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
    assert(msg(ex).contains("NULL key"), s"expected NULL-key raise, got: ${msg(ex)}")
    // null key in the updates side raises too
    val cur2 = Seq((1L, "a", 0L)).toDF("key", "state", "f")
      .select(col("key"), col("state"), col("f").cast("timestamp").as("effective_from_ts"))
    val upd2 = Seq((None: Option[Long], "e", 5L)).toDF("key", "state", "t")
      .select(col("key"), col("state"), col("t").cast("timestamp").as("ts"))
    val ex2 = intercept[Exception] { Cdc.scd2Merge(cur2, upd2).collect() }
    assert(msg(ex2).contains("NULL key"))
  }

  test("NULL state is a legal value: compaction and merge are null-safe") {
    // history: null, null, "a" → two intervals (the null run compacts)
    val df = Seq((1L, 0L, None, 1L), (1L, 1L, None, 2L), (1L, 2L, Some("a"), 3L))
      .toDF("k", "t", "st", "id")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("st"), col("id"))
    val hist = Cdc.scd2FromLog(df, col("k"), col("t"), col("st"), col("id"))
      .orderBy(col("effective_from_ts"))
      .select(col("state"), col("is_current"))
      .collect().map(r => (if (r.isNullAt(0)) "∅" else r.getString(0),
        r.getBoolean(1)))
    assert(hist.toSeq == Seq(("∅", false), ("a", true)),
      s"null-state run must compact and close: ${hist.toSeq}")
    // merge: (k, null) superseded by "a" → closed + reopened, never a
    // silently-vanished key; null re-sent over null → unchanged
    val cur = Seq((1L, Option.empty[String], 0L), (2L, Option.empty[String], 0L))
      .toDF("key", "state", "f")
      .select(col("key"), col("state"), col("f").cast("timestamp").as("effective_from_ts"))
    val upd = Seq((1L, Some("a"), 5L), (2L, Option.empty[String], 5L))
      .toDF("key", "state", "t")
      .select(col("key"), col("state"), col("t").cast("timestamp").as("ts"))
    val lanes = Cdc.scd2Merge(cur, upd)
      .select(col("key"), col("lane")).as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(lanes(1L) == Seq("closed", "reopened"),
      s"null→a must supersede, not vanish: $lanes")
    assert(lanes(2L) == Seq("unchanged"), "null re-send is idempotent")
  }

  test("scd2Merge executes ONE join — lanes come from an explode, not a union") {
    val cur = Seq((1L, "a", 0L)).toDF("key", "state", "f")
      .select(col("key"), col("state"), col("f").cast("timestamp").as("effective_from_ts"))
    val upd = Seq((1L, "b", 5L)).toDF("key", "state", "t")
      .select(col("key"), col("state"), col("t").cast("timestamp").as("ts"))
    val plan = graft.operators.Cdc.scd2Merge(cur, upd)
      .queryExecution.optimizedPlan.toString
    val joins = "Join ".r.findAllIn(plan).length
    assert(joins == 1,
      s"a per-lane union would re-execute the join — expected 1, got $joins:\n$plan")
  }

  test("merge lanes partition correctly on empty sides") {
    val empty = Seq.empty[(Long, String, Long)].toDF("key", "state", "f")
      .select(col("key"), col("state"), col("f").cast("timestamp").as("effective_from_ts"))
    val upd = Seq((1L, "a", 5L)).toDF("key", "state", "t")
      .select(col("key"), col("state"), col("t").cast("timestamp").as("ts"))
    val bootstrap = Cdc.scd2Merge(empty, upd)
      .select(col("lane")).as[String].collect().toSeq
    assert(bootstrap == Seq("new"))
    val noop = Cdc.scd2Merge(
      upd.select(col("key"), col("state"), col("ts").as("effective_from_ts")),
      upd.limit(0))
    assert(noop.select(col("lane")).as[String].collect().toSeq == Seq("unchanged"))
  }

  test("latestState picks the (ts, tie)-max row per key") {
    val out = Cdc.latestState(
      log((1L, 5L, "old", 1L), (1L, 9L, "new", 2L), (1L, 9L, "newer", 3L)),
      col("k"), col("t"), col("st"), col("id"))
      .select(col("key"), col("state")).as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "newer")))
  }
}
