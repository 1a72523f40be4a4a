package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = 1700000000000000L // epoch micros

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us") + T0).as("ts"))

  test("funnel: order is strict, the window binds, stage-1 gates entry") {
    val events = ev(
      (1L, "view", 0L), (1L, "click", 10000000L), (1L, "purchase", 20000000L),
      // user 2: a purchase BEFORE the first view must not convert
      (2L, "purchase", 0L), (2L, "view", 10000000L), (2L, "click", 20000000L),
      // user 3: click lands outside the 60 s window
      (3L, "view", 0L), (3L, "click", 61000000L),
      // user 4: never views — not in the funnel at all
      (4L, "click", 0L), (4L, "purchase", 10000000L),
      // user 5: click at EXACTLY the view instant — strict > excludes it
      (5L, "view", 0L), (5L, "click", 0L))
    val got = Funnel.funnel(events, windowSeconds = 60L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), Option(r.get(5)).map(_.toString.toLong))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    assert(got(1L) == ((3L, Some(20L))), "full conversion in 20 s")
    assert(got(2L) == ((2L, None)), "pre-view purchase must not count")
    assert(got(3L) == ((1L, None)), "out-of-window click must not count")
    assert(got(5L) == ((1L, None)), "simultaneous events are not ordered")
  }

  test("funnelSummary counts users reaching each stage") {
    val events = ev(
      (1L, "view", 0L), (1L, "click", 1000000L), (1L, "purchase", 2000000L),
      (2L, "view", 0L), (2L, "click", 1000000L),
      (3L, "view", 0L))
    val r = Funnel.funnelSummary(events).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("funnel picks the EARLIEST qualifying stage event, not any") {
    // two clicks in-window: the earlier one anchors the purchase window
    val events = ev(
      (1L, "view", 0L), (1L, "click", 5000000L), (1L, "click", 50000000L),
      // purchase is within 60 s of the LATER click but not the earlier
      (1L, "purchase", 70000000L))
    val got = Funnel.funnel(events, windowSeconds = 60L).head()
    assert(got.getLong(4) == 2L,
      "the earliest in-window click anchors stage 3; 70 s > 5 s + 60 s")
  }

  test("funnel is total on an empty event table") {
    val empty = ev().limit(0)
    assert(Funnel.funnel(empty).count() == 0)
  }

  test("retention: cohorts by first-event period, offsets count distinct returners") {
    val day = 86400000000L
    // users 1,2 start period 0; user 3 starts period 1.
    // period 1 sees user 1 (twice — distinct must collapse) + user 3;
    // period 2 sees users 2 and 3
    val events = ev(
      (1L, "view", 0L), (1L, "click", day + 1L), (1L, "view", day + 2L),
      (2L, "view", 1L), (2L, "purchase", 2 * day + 1L),
      (3L, "view", day + 5L), (3L, "view", 2 * day + 6L))
    val got = Funnel.retention(events, periodMicros = day).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val c0 = T0 / day // epoch-anchored cohort index of micro offset 0
    assert(got((c0, 0L)) == ((2L, 2L, 1.0)))
    assert(got((c0, 1L)) == ((1L, 2L, 0.5)), "only user 1 returns next day")
    assert(got((c0, 2L)) == ((1L, 2L, 0.5)), "only user 2 returns on day 2")
    assert(got((c0 + 1, 0L)) == ((1L, 1L, 1.0)))
    assert(got((c0 + 1, 1L)) == ((1L, 1L, 1.0)), "user 3 returns")
    assert(got.size == 5)
  }

  test("rollingActiveUsers: trailing window counts, gap days absent, dedup within day") {
    val day = 86400000000L // one day of micros
    val events = ev(
      // user 1 active on days 0 and 1 (twice on day 0 — must count once)
      (1L, "view", 0L), (1L, "click", 1000000L), (1L, "view", day),
      // user 2 active on day 0 only
      (2L, "view", 2000000L),
      // user 3 active on day 9 only — outside day 1's window, and its
      // own window reaches back over the empty gap to nobody else
      (3L, "view", 9 * day))
    val got = Funnel.rollingActiveUsers(events, windowDays = 7).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // T0 = 2023-11-14 22:13:20 UTC → day 0 = 2023-11-14
    assert(got == Map(
      "2023-11-14" -> 2L, // users 1, 2
      "2023-11-15" -> 2L, // both day-0 users still inside the window
      "2023-11-23" -> 1L  // user 3; day-0/1 activity is > 6 days back
    ))
    // gap days (no events) produce no row even though windows span them
    assert(!got.contains("2023-11-20"))
  }

  test("sessionPaths: in-session triples only, session gaps split paths, top-k order") {
    val s = 1000000L // one second of micros
    val rows = Seq(
      // user 1, one session: view > click > purchase > view
      (1L, "view", 0L), (1L, "click", 10 * s), (1L, "purchase", 20 * s),
      (1L, "view", 30 * s),
      // user 2 repeats view > click > purchase in one session
      (2L, "view", 0L), (2L, "click", 5 * s), (2L, "purchase", 10 * s),
      // user 3: gap > 30 min between click and purchase — NO triple may
      // bridge the session break
      (3L, "view", 0L), (3L, "click", 10 * s), (3L, "purchase", 2000 * s),
      (3L, "view", 2010 * s), (3L, "error", 2020 * s))
    val events = rows.zipWithIndex.map { case ((u, t, us), i) => (i.toLong, u, t, us) }
      .toDF("event_id", "user_id", "event_type", "us")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us") + T0).as("ts"))
    val got = Funnel.sessionPaths(events, 1800L, 3, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("view>click>purchase") == 2L) // users 1 and 2; NOT user 3
    assert(got("click>purchase>view") == 1L) // user 1's sliding second triple
    assert(got("purchase>view>error") == 1L) // user 3's second session
    // user 3's click>purchase gap is a session break: no bridging triple
    assert(got.size == 3)
  }

  test("transitionMatrix: session gaps reset the chain; rows sum to 1") {
    val sec = 1000000L
    def frame(rows: (Long, Long, String, Long)*) =
      rows.toDF("user_id", "us", "event_type", "event_id")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
          col("event_id"), col("event_type"))
    // user 1: a→b→c in one session, then a gap ≥ 30min, then b→c;
    // the cross-gap c→b transition must NOT count
    val events = frame(
      (1L, 0L, "a", 1L), (1L, 10L * sec, "b", 2L), (1L, 20L * sec, "c", 3L),
      (1L, 10000L * sec, "b", 4L), (1L, 10010L * sec, "c", 5L))
    val out = Funnel.transitionMatrix(events, 1800L)
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 1.0)),
      ("b", "c") -> ((2L, 1.0))))
    assert(!out.contains(("c", "b")), "gap must reset the chain")
    // probabilities per from_type row sum to 1
    val rows = Funnel.transitionMatrix(frame(
        (1L, 0L, "a", 1L), (1L, 1L * sec, "b", 2L),
        (1L, 2L * sec, "a", 3L), (1L, 3L * sec, "c", 4L)), 1800L)
      .groupBy(col("from_type")).agg(sum(col("p")).as("s"))
      .select(col("s")).as[Double].collect()
    assert(rows.forall(s => math.abs(s - 1.0) < 1e-9))
    // one STREAM-SHAPED window partitioning only: the break rule and
    // the predecessor share the user_id window, so no (user, session)
    // composite key ever re-shuffles the event stream (the remaining
    // exchanges — matrix aggregate, row-total window — are bounded by
    // |types|²)
    val plan = Funnel.transitionMatrix(events, 1800L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(user_id") ||
      !"hashpartitioning\\(user_id[^)]*sess".r.findFirstIn(plan).isDefined,
      s"no (user, session)-keyed exchange allowed:\n$plan")
    assert("hashpartitioning\\(user_id".r.findAllIn(plan).length == 1,
      s"the event stream must shuffle exactly once:\n$plan")
  }

  test("rollingActiveUsers: window 1 reduces to daily actives") {
    val day = 86400000000L
    val events = ev((1L, "view", 0L), (2L, "view", 0L), (1L, "view", day))
    val got = Funnel.rollingActiveUsers(events, windowDays = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("2023-11-14" -> 2L, "2023-11-15" -> 1L))
  }

  test("funnelWilson: hand-checked interval, bounds, and the p=1 edge") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(u: Long, t: String, minute: Int) =
      (u * 100 + minute, new Timestamp(1700000000000L + minute * 60000L), u, t, 1.0)
    // 4 viewers; users 1,2 click after viewing; both clickers purchase
    val rows =
      (1L to 4L).map(u => ev(u, "view", 1)) ++
        Seq(ev(1L, "click", 2), ev(2L, "click", 3)) ++
        Seq(ev(1L, "purchase", 4), ev(2L, "purchase", 5))
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Funnel.funnelWilson(events).collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq((1, "click", 4L, 2L), (2, "purchase", 2L, 2L)))
    val step1 = got(0)
    assert(step1.getDouble(4) == 0.5)
    // Wilson for k=2, n=4, z=1.959964: symmetric about 0.5, half ≈ 0.349963
    assert(math.abs(step1.getDouble(5) - 0.150037) < 1e-4)
    assert(math.abs(step1.getDouble(6) - 0.849963) < 1e-4)
    // p = 1 on n = 2: the interval stays inside [0, 1] and excludes low rates
    val step2 = got(1)
    assert(step2.getDouble(4) == 1.0)
    assert(step2.getDouble(5) > 0.29 && step2.getDouble(6) <= 1.0)
  }

  test("markovAccuracy: argmax prediction, deterministic tie-break, session gaps cut") {
    import org.apache.spark.sql.functions._
    // user 1 session: a->b, b->a, a->b  (a: b wins 2-0; b: a wins 1-0)
    // user 2: a->c once, then a GAP, then c->a (new session opener
    // c is not a transition target of the pre-gap a)
    // ties: user 3 contributes a->c so a has b:2, c:2 -> tie breaks
    // to the FIRST type name alphabetically ('b')
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 10:01:00", "b"),
      (1L, "2024-01-01 10:02:00", "a"), (1L, "2024-01-01 10:03:00", "b"),
      (2L, "2024-01-01 10:00:00", "a"), (2L, "2024-01-01 10:01:00", "c"),
      (2L, "2024-01-01 14:00:00", "c"), (2L, "2024-01-01 14:01:00", "a"),
      (3L, "2024-01-01 10:00:00", "a"), (3L, "2024-01-01 10:01:00", "c")
    ).zipWithIndex.map { case ((u, ts, t), i) => (i.toLong, u, ts, t) }
      .toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = graft.operators.Funnel.markovAccuracy(rows, 1800L)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // from a: b x2, c x2 -> tie -> 'b'; accuracy 2/4
    assert(out("a") == (("b", 4L, 2L, 0.5)), s"got ${out("a")}")
    // from b: a x1 (the 10:02 step) -> 1/1
    assert(out("b") == (("a", 1L, 1L, 1.0)))
    // from c: a x1 (user 2's post-gap pair) -> the gap cut means the
    // 14:00 'c' is a session OPENER, not a target of 10:01's c
    assert(out("c") == (("a", 1L, 1L, 1.0)))
    assert(out.size == 3)
  }

  test("uShapedAttribution: 40/20/40 ladder, 1- and 2-touch lanes, gap cut, organic") {
    import org.apache.spark.sql.functions._
    def ev(id: Long, user: Long, ts: String, tpe: String, value: Double, k: Long) =
      (id, user, ts, tpe, value, if (k >= 0) s"""{"k":$k}""" else "{}")
    val rows = Seq(
      // user 1: 3 touches k=0,1,2 then purchase 100 -> 40/20/40
      ev(101, 1, "2024-01-01 10:50:00", "click", 0, 0),
      ev(102, 1, "2024-01-01 10:55:00", "click", 0, 1),
      ev(103, 1, "2024-01-01 10:58:00", "click", 0, 2),
      ev(104, 1, "2024-01-01 11:00:00", "purchase", 100.0, -1),
      // user 2: 2 touches -> 50/50
      ev(201, 2, "2024-01-01 10:50:00", "click", 0, 0),
      ev(202, 2, "2024-01-01 10:59:00", "click", 0, 1),
      ev(203, 2, "2024-01-01 11:00:00", "purchase", 10.0, -1),
      // user 3: 1 touch -> 100%
      ev(301, 3, "2024-01-01 10:30:00", "click", 0, 3),
      ev(302, 3, "2024-01-01 11:00:00", "purchase", 8.0, -1),
      // user 4: no clicks -> organic
      ev(401, 4, "2024-01-01 11:00:00", "purchase", 7.0, -1),
      // user 5: 4 touches k=0..3 -> 40/10+10/40 of 50
      ev(501, 5, "2024-01-01 10:10:00", "click", 0, 0),
      ev(502, 5, "2024-01-01 10:20:00", "click", 0, 1),
      ev(503, 5, "2024-01-01 10:30:00", "click", 0, 2),
      ev(504, 5, "2024-01-01 10:40:00", "click", 0, 3),
      ev(505, 5, "2024-01-01 11:00:00", "purchase", 50.0, -1),
      // user 6: only touch is OUTSIDE the 1h window -> organic
      ev(601, 6, "2024-01-01 08:00:00", "click", 0, 0),
      ev(602, 6, "2024-01-01 11:00:00", "purchase", 9.0, -1)
    ).toDF("event_id", "user_id", "ts_s", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = graft.operators.Funnel.uShapedAttribution(rows, 3600L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // campaign_0: u1 first 40 + u2 half 5 + u5 first 20 = 65 over 3 credits
    assert(out("campaign_0") == ((3L, 65.0)), s"got ${out("campaign_0")}")
    // campaign_1: u1 middle 20 + u2 half 5 + u5 middle 5 = 30
    assert(out("campaign_1") == ((3L, 30.0)))
    // campaign_2: u1 last 40 + u5 middle 5 = 45
    assert(out("campaign_2") == ((2L, 45.0)))
    // campaign_3: u3 solo 8 + u5 last 20 = 28
    assert(out("campaign_3") == ((2L, 28.0)))
    // organic: u4 untouched 7 + u6 out-of-window 9 = 16
    assert(out("organic") == ((2L, 16.0)))
  }
}
