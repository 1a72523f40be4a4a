package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of the large side lands on one hot key
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, s"row$i"))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Joins.saltedJoin(large, small, "k", salt = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("saltedJoin scatters even fully-identical hot-key rows") {
    // position-derived salt (the implementation's): a content hash would
    // send every identical duplicate row to ONE bucket, recreating the
    // straggler the salt exists to break
    val large = (1 to 1000).map(_ => (1L, "same")).toDF("k", "payload")
    val dist = large.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(dist.length >= 6)              // hot key spread over most buckets
    assert(dist.max < 1000 * 0.4)         // no bucket holds the whole key
  }

  test("asofJoin: greatest right time <= left time, per key; ties included; no-match null") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq((1L, ts(100), "e1"), (1L, ts(50), "e2"), (2L, ts(100), "e3"),
      (1L, ts(10), "e4")).toDF("k", "t", "id")
    val right = Seq((1L, ts(100), 900L), (1L, ts(60), 901L), (1L, ts(20), 902L),
      (3L, ts(90), 903L)).toDF("k", "t", "rid")
    val got = Joins.asofJoin(left, right, "k", "t", "t", Seq("rid"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(got("e1") == Some(900L)) // equal time included (<=)
    assert(got("e2") == Some(902L)) // skips the later 60/100 rows
    assert(got("e3") == None)       // key 2 has no right rows
    assert(got("e4") == None)       // before every right row
  }

  test("asofJoin: struct carry — null payload fields kept, columns from one row") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    // the matched (latest) right row has a NULL rid: per-column
    // last(ignoreNulls) would resurrect 7L from the older row and pair
    // it with the newer row's tag — a row that never existed
    val left = Seq((1L, ts(10), "e")).toDF("k", "t", "id")
    val right = Seq(
      (1L, ts(1), Option(7L), Option("x")),
      (1L, ts(5), Option.empty[Long], Option("y"))).toDF("k", "t", "rid", "tag")
    val r = Joins.asofJoin(left, right, "k", "t", "t", Seq("rid", "tag")).head()
    assert(r.isNullAt(3), "null rid of the matched row must survive")
    assert(r.getString(4) == "y", "tag must come from the same matched row")
  }

  test("asofJoin: null keys never match (equality semantics)") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq((Option(1L), ts(10), "a"), (Option.empty[Long], ts(10), "b"))
      .toDF("k", "t", "id")
    val right = Seq((Option(1L), ts(5), 7L), (Option.empty[Long], ts(5), 8L))
      .toDF("k", "t", "rid")
    val got = Joins.asofJoin(left, right, "k", "t", "t", Seq("rid"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(got("a") == Some(7L) && got("b").isEmpty)
  }

  test("asofJoin: equal-time right rows tie-break deterministically") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq((1L, ts(10), "e")).toDF("k", "t", "id")
    val right = Seq((1L, ts(5), 10L), (1L, ts(5), 20L)).toDF("k", "t", "rid")
    val vals = (1 to 3).map { i =>
      Joins.asofJoin(left, right.repartition(i + 1), "k", "t", "t", Seq("rid"))
        .head().getLong(3)
    }
    assert(vals.forall(_ == 20L), s"expected max-struct tie-break, got $vals")
  }

  test("rangeJoinPrior: inclusive bounds, bucket-boundary pairs, key isolation") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    val left = Seq((1L, ts(100), "p1"), (2L, ts(100), "p2")).toDF("k", "t", "id")
    val right = Seq(
      (1L, ts(100), "exact"),    // == left time → in (inclusive)
      (1L, ts(70), "in-range"),  // 30s before, gap 30 → in (boundary)
      (1L, ts(69), "too-old"),   // 31s before → out
      (1L, ts(101), "future"),   // after → out
      (2L, ts(99), "other-key")
    ).toDF("k", "rt", "rid")
    val got = Joins.rangeJoinPrior(left, right, "k", "t", "rt", 30)
      .select("id", "rid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("p1", "exact"), ("p1", "in-range"), ("p2", "other-key")))
  }

  test("fuzzyMatch: typo'd names resolve, ties break on name, no-candidate rows keep nulls") {
    val catalog = Seq("cold widget", "large widget", "blue rod").toDF("name")
    val dirty = Seq(
      (1L, "cld widget"),    // 1 deletion from "cold widget"
      (2L, "large widget"),  // exact -> dist 0
      (3L, "blue rod"),      // exact
      (4L, "xxxxx widget"),  // no catalog name within 1 edit
      (5L, "zz gadget")      // block key matches nothing
    ).toDF("p_partkey", "name")
    val out = Joins.fuzzyMatch(dirty, catalog, "p_partkey",
        n => element_at(split(n, " "), -1), maxDist = 1)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[String]("matched_name")), Option(r.get(3)))).toMap
    assert(out(1L) == (Some("cold widget"), Some(1)))
    assert(out(2L) == (Some("large widget"), Some(0)))
    assert(out(3L) == (Some("blue rod"), Some(0)))
    assert(out(4L) == (None, None))
    assert(out(5L) == (None, None))
    assert(out.size == 5)
  }

  test("fuzzyMatch: winner is the (dist, name) minimum, deterministically") {
    // "cat" is 1 edit from both "bat" and "cap": min name wins -> "bat"
    val catalog = Seq("bat", "cap").toDF("name")
    val dirty = Seq((1L, "cat")).toDF("p_partkey", "name")
    val out = Joins.fuzzyMatch(dirty, catalog, "p_partkey",
        _ => lit(1), maxDist = 1).head()
    assert(out.getAs[String]("matched_name") == "bat")
    assert(out.getAs[Int]("dist") == 1)
  }

  test("fuzzyMatch: exactly one levenshtein per candidate in the physical plan") {
    // round-7 verdict: filter + aggregate each computed the distance, so
    // every surviving candidate paid the O(len²) levenshtein twice. The
    // fix projects it once and keeps the maxDist cut INSIDE the aggregate
    // (min(when(...))) — a separate Filter would be pushed below the
    // projection and re-inline the expression.
    val catalog = Seq("cold widget", "blue rod").toDF("name")
    val dirty = Seq((1L, "cld widget"), (2L, "blue rod")).toDF("p_partkey", "name")
    val qe = Joins.fuzzyMatch(dirty, catalog, "p_partkey",
      n => element_at(split(n, " "), -1), maxDist = 1).queryExecution
    for ((label, plan) <- Seq("optimized" -> qe.optimizedPlan.toString,
                              "physical" -> qe.executedPlan.toString)) {
      val n = "levenshtein".r.findAllIn(plan.toLowerCase).size
      assert(n == 1, s"expected exactly 1 levenshtein in the $label plan, got $n")
    }
  }

  test("fuzzyMatch: generator contract — p_name is 2+ tokens, first token length >= 2") {
    // the fuzzy_match contract query blocks on the LAST token and deletes
    // a char of the FIRST at pos >= 2 (pmod(p_partkey, len1-1)); the
    // oracle blocks on split_part(name,' ',2). Both arms agree only while
    // every p_name has >= 2 tokens and a first token of length >= 2 — pin
    // the shape so a testdata regen fails HERE, not as a silent hash
    // divergence (round-7 advice).
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val p = spark.read.parquet(s"/root/testdata/$sf/part.parquet")
      val bad = p.filter(size(split(col("p_name"), " ")) < 2 ||
          length(element_at(split(col("p_name"), " "), 1)) < 2)
        .count()
      assert(bad == 0, s"$sf/part.parquet: $bad p_name rows break the " +
        "two-token/first-token>=2 contract the fuzzy_match arms assume")
    }
  }

  test("jaroWinkler kernel: oracle-pinned boundary values") {
    import org.apache.spark.sql.graftx.JaroWinklerKernel.{jaroWinkler => jw}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // every expected value here was read off DuckDB's
    // jaro_winkler_similarity — the oracle the contract query replays
    assert(jw(u(""), u("")) == 0.0, "both empty -> 0 (NOT 1)")
    assert(jw(u("a"), u("")) == 0.0)
    assert(jw(u("abc"), u("abc")) == 1.0)
    assert(jw(u("ab"), u("ba")) == 0.0, "len-2 window is 0: transposed pair scores 0")
    assert(math.abs(jw(u("martha"), u("marhta")) - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw(u("dixon"), u("dicksonx")) - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw(u("duane"), u("dwayne")) - 0.8400000000000001) < 1e-15)
    // boost threshold is STRICT jaro > 0.7: common prefix 4 but jaro
    // exactly 0.6 -> no boost
    assert(jw(u("abcdxxxxxx"), u("abcdyyyyyy")) == 0.6)
    // byte-level: 'é' is 2 bytes, no match against 'e'
    assert(jw(u("é"), u("e")) == 0.0)
    // ODD mismatch count (3) floors to t=1 — the case that separates
    // floor from true halving (DuckDB: 0.9449074...)
    assert(math.abs(jw(u("blu gear"), u("blue gear")) - 0.9449074074074074) < 1e-15)
  }

  test("fuzzyMatchJw: resolves typos, thresholds, keeps null for no-candidate rows") {
    val catalog = Seq("cold widget", "large widget", "blue rod").toDF("name")
    val dirty = Seq(
      (1L, "cld widget"),    // high JW vs "cold widget"
      (2L, "large widget"),  // exact -> 1.0
      (3L, "xq widget"),     // same block, but too dissimilar for 0.88
      (4L, "zz gadget")      // block key matches nothing
    ).toDF("p_partkey", "name")
    val out = Joins.fuzzyMatchJw(dirty, catalog, "p_partkey",
        n => element_at(split(n, " "), -1), minSim = 0.88)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[String]("matched_name")), Option(r.get(3)))).toMap
    assert(out(1L)._1 == Some("cold widget"))
    assert(out(2L) == (Some("large widget"), Some(1.0)))
    assert(out(3L) == (None, None))
    assert(out(4L) == (None, None))
    assert(out.size == 4)
  }

  test("fuzzyMatchJw: length-ratio prune is invisible to results (soundness)") {
    // τ = 0.88 activates the s/l >= 5τ-4 = 0.4 prune; an unpruned run
    // (τ = 0.5 threshold applied post-hoc cannot reconstruct winners, so
    // compare against a manual no-prune recomputation instead)
    import org.apache.spark.sql.graftx.TextExpressions.jaroWinkler
    val catalog = Seq("anvil", "an", "anvilanvilanvil").toDF("name")
    val dirty = Seq((1L, "anvil"), (2L, "anvilanvil")).toDF("p_partkey", "name")
    val got = Joins.fuzzyMatchJw(dirty, catalog, "p_partkey",
        _ => lit(1), minSim = 0.88)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("matched_name"))).toMap
    val manual = dirty.crossJoin(catalog.select(col("name").as("cname")))
      .withColumn("sim", jaroWinkler(col("name"), col("cname")))
      .filter(col("sim") >= 0.88)
      .groupBy("p_partkey")
      .agg(max(struct(col("sim"), col("cname"))).as("m"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getStruct(1).getString(1))).toMap
    for (k <- Seq(1L, 2L))
      assert(got(k) == manual.getOrElse(k, None),
        s"pruned and unpruned winners differ for key $k")
  }

  test("fuzzyMatchJw: prune measures BYTES — multibyte names stay reachable") {
    // the kernel is byte-level, so the s/l >= 5τ-4 proof is in octet
    // lengths. "éé" (4 bytes) vs "ééxy" (6 bytes): byte jw = 0.93333
    // passes τ = 0.93 and the byte ratio 4/6 = 0.667 passes the 0.65
    // floor — but the CHAR ratio 2/4 = 0.5 would have wrongly pruned
    // the only true match. A char-length prune fails this test.
    import org.apache.spark.sql.graftx.TextExpressions.jaroWinkler
    val catalog = Seq("ééxy").toDF("name")
    val dirty = Seq((1L, "éé")).toDF("p_partkey", "name")
    val kernel = dirty.crossJoin(catalog.select(col("name").as("cname")))
      .select(jaroWinkler(col("name"), col("cname"))).head().getDouble(0)
    assert(kernel >= 0.93, s"premise: byte-level jw $kernel must reach τ")
    val out = Joins.fuzzyMatchJw(dirty, catalog, "p_partkey",
      _ => lit(1), minSim = 0.93).head()
    assert(out.getAs[String]("matched_name") == "ééxy",
      s"byte-reachable multibyte candidate was pruned: $out")
  }

  test("fuzzyMatchJw: one kernel call per candidate; codegen, not a UDF") {
    val catalog = Seq("cold widget", "blue rod").toDF("name")
    val dirty = Seq((1L, "cld widget")).toDF("p_partkey", "name")
    val qe = Joins.fuzzyMatchJw(dirty, catalog, "p_partkey",
      n => element_at(split(n, " "), -1), minSim = 0.88).queryExecution
    for ((label, plan) <- Seq("optimized" -> qe.optimizedPlan.toString,
                              "physical" -> qe.executedPlan.toString)) {
      val n = "jarowinklersim".r.findAllIn(plan.toLowerCase).size
      assert(n == 1, s"expected exactly 1 JW kernel in the $label plan, got $n")
    }
    assert(!qe.executedPlan.toString.contains("ScalaUDF"),
      "the kernel must be a native expression, not a UDF")
    intercept[IllegalArgumentException] {
      Joins.fuzzyMatchJw(dirty, catalog, "p_partkey", _ => lit(1), minSim = 1.5)
    }
  }

  test("joinAdvisor: all three lanes fire at their thresholds; estimate never undercounts") {
    val skewed = ((1 to 80).map(_ => (1L, "hot")) ++
      (1 to 20).map(i => (i.toLong + 1, "cold"))).toDF("k", "pay")
    val dim = (1 to 50).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    // broadcast lane: the 50-row dim fits under the row threshold
    val bc = Joins.joinAdvisor(skewed, "k", dim, "k",
      broadcastRows = 100L).head()
    assert(bc.getString(5) == "broadcast_smaller_side")
    assert(bc.getLong(0) == 100L && bc.getLong(1) == 50L)
    val trueJoin = skewed.join(dim, "k").count()
    assert(BigDecimal(bc.getString(2)) >= BigDecimal(trueJoin),
      "CMS inner product never undercounts the true join size")
    // salt lane: dim too big to broadcast (threshold 10), hot key owns
    // 80% of the left
    val salt = Joins.joinAdvisor(skewed, "k", dim, "k",
      broadcastRows = 10L, skewSharePct = 50.0).head()
    assert(salt.getString(5) == "salted_shuffle")
    assert(salt.getString(3) == "1" && salt.getDouble(4) == 80.0)
    // shuffle lane: no broadcast fit, no skew over the bar
    val sh = Joins.joinAdvisor(skewed, "k", dim, "k",
      broadcastRows = 10L, skewSharePct = 90.0).head()
    assert(sh.getString(5) == "shuffle_join")
    intercept[IllegalArgumentException] {
      Joins.joinAdvisor(skewed, "k", dim, "k", broadcastRows = 0L)
    }
    intercept[IllegalArgumentException] {
      Joins.joinAdvisor(skewed, "k", dim, "k", skewSharePct = 101.0)
    }
  }

  test("joinAdvisor: an empty left side advises broadcast, never crashes on head()") {
    val empty = Seq.empty[(Long, String)].toDF("k", "pay")
    val dim = Seq((1L, "d")).toDF("k", "nm")
    val out = Joins.joinAdvisor(empty, "k", dim, "k").head()
    assert(out.getLong(0) == 0L && out.getString(5) == "broadcast_smaller_side")
    assert(out.isNullAt(3) && out.getDouble(4) == 0.0)
    assert(BigDecimal(out.getString(2)) == BigDecimal(0),
      "empty side -> provably empty join")
  }

  test("joinAdvisor: one lazy plan, bit-identical across layouts on the lane boundary") {
    // the CORRECTNESS_r09 forensic scenario: a top key sitting exactly
    // ON n/(capacity+1) under eviction, where the old try/catch lane
    // could flip with Misra-Gries merge order. 100·65 == 6500 == n →
    // the refused lane must win under EVERY partition layout and
    // shuffle width, and every emitted value must be bit-identical.
    val leftRows = (Seq.fill(100)("hot") ++ (1 to 6400).map(i => s"u$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }
    val dim = (1 to 500).map(i => (s"u$i", i)).toDF("k", "v")
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val outs = for {
        parts <- Seq(1, 7, 32); shuf <- Seq("2", "32")
      } yield {
        spark.conf.set("spark.sql.shuffle.partitions", shuf)
        val left = leftRows.toDF("k", "pay").repartition(parts)
        Joins.joinAdvisor(left, "k", dim, "k", broadcastRows = 10L,
          skewSharePct = 1.0, skewCapacity = 64)
          .head().toSeq.map(String.valueOf).mkString("|")
      }
      assert(outs.distinct.size == 1, s"layout-dependent advisor: $outs")
      val row = outs.head.split('|')
      assert(row(3) == "null", "boundary count must land in the refused lane")
      assert(row(4) == (BigDecimal(100).setScale(18) / BigDecimal(65))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue.toString,
        "refused lane reports the capacity-derived share bound")
      assert(row(5) == "salted_shuffle" || row(5) == "shuffle_join")
    } finally spark.conf.set("spark.sql.shuffle.partitions", sp)
  }

  test("joinAdvisor: an unprovable top key means provably-no-skew, not a refusal") {
    // 20k distinct uniform keys evict the MG sketch and make top-1
    // unprovable — which BOUNDS the share at 100/(capacity+1)%: the
    // advisor reports the bound and keeps advising instead of raising
    val uniform = spark.range(20000)
      .select(col("id").as("k"), lit("p").as("pay"))
    val dim = spark.range(20000).select(col("id").as("k"), lit("d").as("nm"))
    val out = Joins.joinAdvisor(uniform, "k", dim, "k",
      broadcastRows = 10L, skewSharePct = 10.0).head()
    assert(out.getString(5) == "shuffle_join",
      s"uniform keys, no broadcast fit -> plain shuffle: $out")
    assert(out.isNullAt(3), "no provable top key -> null")
    assert(out.getDouble(4) < 0.05, "share reported as the MG bound")
  }

  test("keySkew surfaces the hot key first") {
    val df = (1 to 100).map(i => (if (i <= 60) 5L else i.toLong, i)).toDF("k", "v")
    val top = Joins.keySkew(df, "k", 3).collect()
    assert(top.head.getLong(0) == 5L && top.head.getLong(1) == 60L)
  }

  test("linkage evaluation counts wrong-entity matches against precision") {
    // catalog has a near-collision: "alpha one" vs "altha one" (dist 1
    // apart) — a corrupted "alpa one" (from alpha) is dist 1 from BOTH,
    // and the deterministic (dist, name) tie-break picks "alpha one"
    // (lexicographically first) — correct. "zzzzz one" matches nothing.
    val catalog = Seq("alpha one", "altha one", "beta two").toDF("name")
    val dirty = Seq(
      (1L, "alpha one"),  // clean, exact
      (2L, "alpa one"),   // corrupted from alpha one, recoverable
      (3L, "zzzzz one")   // unmatchable
    ).toDF("id", "name")
    val m = Joins.fuzzyMatch(dirty, catalog, "id",
      n => element_at(split(n, " "), -1), maxDist = 1)
      .select(col("id"), col("matched_name"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(m(1L) == "alpha one" && m(2L) == "alpha one" && m(3L) == null)
  }

  private def ivFrame(prefix: String, rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "s", "e")
      .select(col("user_id"),
        timestamp_micros(col("s")).as(s"${prefix}_st"),
        timestamp_micros(col("e")).as(s"${prefix}_en"))

  test("intervalOverlapJoin: overlap semantics, exactly-once across buckets") {
    val sec = 1000000L
    // left [0,10s] overlaps right [5s,20s] and touches right [10s,30s];
    // right [11s,12s] misses; other-key right [5s,6s] must not match
    val l = ivFrame("l", (1L, 0L, 10L * sec))
    val r = ivFrame("r",
      (1L, 5L * sec, 20L * sec), (1L, 10L * sec, 30L * sec),
      (1L, 11L * sec, 12L * sec), (2L, 5L * sec, 6L * sec))
    val out = Joins.intervalOverlapJoin(l, r, "user_id",
        "l_st", "l_en", "r_st", "r_en", bucketSeconds = 2L)
      .select(col("user_id"), unix_micros(col("r_st")).as("rs"))
      .as[(Long, Long)].collect().toSet
    // touching endpoints (l_en == r_st) count; each pair ONCE even
    // though the 10s overlap spans 5 two-second buckets
    assert(out == Set((1L, 5L * sec), (1L, 10L * sec)))
  }

  test("intervalOverlapJoin: inverted interval (end < start) fails loudly") {
    // sequence(start, stop) silently DESCENDS when start > stop, so an
    // unguarded inverted interval would still explode into bucket rows
    // and could emit phantom matches — the guard turns it into an
    // in-plan raise_error instead
    val sec = 1000000L
    val good = ivFrame("r", (1L, 0L, 10L * sec))
    val badL = ivFrame("l", (1L, 10L * sec, 5L * sec)) // end < start
    val ex = intercept[Exception] {
      Joins.intervalOverlapJoin(badL, good, "user_id",
        "l_st", "l_en", "r_st", "r_en", bucketSeconds = 2L).collect()
    }
    assert(ex.getMessage.contains("inverted left interval") ||
      Option(ex.getCause).exists(_.getMessage.contains("inverted left interval")),
      s"expected the inverted-interval raise_error, got: ${ex.getMessage}")
    val goodL = ivFrame("l", (1L, 0L, 10L * sec))
    val badR = ivFrame("r", (1L, 8L * sec, 2L * sec))
    val ex2 = intercept[Exception] {
      Joins.intervalOverlapJoin(goodL, badR, "user_id",
        "l_st", "l_en", "r_st", "r_en", bucketSeconds = 2L).collect()
    }
    assert(ex2.getMessage.contains("inverted right interval") ||
      Option(ex2.getCause).exists(_.getMessage.contains("inverted right interval")))
  }

  test("intervalOverlapJoin: NULL endpoints drop the row, never raise") {
    // the pre-guard semantics: sequence over a null is null and explode
    // emits nothing — the inverted-interval guard must pass nulls
    // through to that path, not feed them into raise_error (whose
    // concat would throw with a contentless null message)
    val sec = 1000000L
    val l = Seq(
      (1L, Some(0L), Some(10L * sec)),         // valid, overlaps r
      (1L, Some(0L), None),                    // null end → drops
      (1L, None, Some(10L * sec)))             // null start → drops
      .toDF("user_id", "s", "e")
      .select(col("user_id"),
        timestamp_micros(col("s")).as("l_st"),
        timestamp_micros(col("e")).as("l_en"))
    val r = ivFrame("r", (1L, 5L * sec, 20L * sec))
    val out = Joins.intervalOverlapJoin(l, r, "user_id",
        "l_st", "l_en", "r_st", "r_en", bucketSeconds = 2L)
      .collect()
    assert(out.length == 1, s"only the fully-specified interval joins: ${out.toSeq}")
  }

  test("intervalOverlapJoin matches the quadratic inequality join") {
    val rng = new scala.util.Random(7)
    val sec = 1000000L
    def gen(p: String) = ivFrame(p, Seq.fill(60) {
      val k = rng.nextInt(4).toLong
      val s = rng.nextInt(500).toLong * sec
      (k, s, s + rng.nextInt(90).toLong * sec)
    }: _*)
    val l = gen("l"); val r = gen("r")
    val fast = Joins.intervalOverlapJoin(l, r, "user_id",
        "l_st", "l_en", "r_st", "r_en", bucketSeconds = 60L)
      .select(unix_micros(col("l_st")), unix_micros(col("r_st")), col("user_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq.sorted
    val brute = l.join(r.withColumnRenamed("user_id", "u2"),
        col("user_id") === col("u2") &&
          col("l_st") <= col("r_en") && col("r_st") <= col("l_en"))
      .select(unix_micros(col("l_st")), unix_micros(col("r_st")), col("user_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq.sorted
    assert(fast == brute, s"bucketized join diverges from the definition")
  }

  test("intervalOverlapJoin plans as an equi-join, not a cartesian/BNLJ") {
    val l = ivFrame("l", (1L, 0L, 1000000L))
    val r = ivFrame("r", (1L, 0L, 1000000L))
    val plan = Joins.intervalOverlapJoin(l, r, "user_id",
        "l_st", "l_en", "r_st", "r_en", 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the bucket key must make this an equi-join:\n$plan")
  }
}
