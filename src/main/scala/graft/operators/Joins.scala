package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skewed data at scale.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; the
  * explicit salted join remains the tool when one hot key dominates a
  * shuffle (e.g. a null-ish default key holding >1% of 100 TB): the big
  * side scatters its rows across `salt` sub-keys, the small side is
  * replicated `salt` times, and the shuffle key becomes (key, salt) —
  * bounding any single partition at 1/salt of the hot key.
  */
object Joins {

  /** Inner equi-join with salting. Result is exactly the plain
    * `large.join(small, key)` — the salt column is internal. The salt
    * comes from the row's POSITION (round-robin over
    * monotonically_increasing_id), not a content hash: the motivating
    * hot key is typically a default value with identical payloads too,
    * and a content hash would send every such duplicate row to ONE salt
    * bucket, recreating the straggler the salt exists to break up.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val saltedLarge = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** As-of join — the canonical "operator Spark lacks" (DuckDB/kdb have
    * it natively): for each left row, the right row with the greatest
    * `rightTime <= leftTime` within the same key. Implemented with the
    * union + ordered-window technique: interleave both sides sorted by
    * (time, right-first-on-ties) per key, then carry the last seen right
    * row forward with `last_value(ignoreNulls)` over ONE struct of the
    * whole payload. One shuffle on the key — no range cross-product,
    * scales as a single sort-merge pass.
    *
    * The struct carry (not per-column carries) is what makes the
    * semantics right: every output row's payload columns come from the
    * SAME matched right row, and a matched row whose payload fields are
    * legitimately null yields nulls rather than resurrecting older
    * values (per-column `last(ignoreNulls)` does both wrong). Null join
    * keys never match (equality semantics, like DuckDB's ASOF JOIN);
    * equal-time right rows tie-break deterministically to the largest
    * payload struct.
    *
    * `left`/`right` must share `keyCol`; right payload columns are
    * prefixed `asof_`. Left rows with no prior right row get nulls.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => org.apache.spark.sql.types.StructField(
        s"asof_$c", right.schema(c).dataType)))
    val lAligned = left.select(
      (col(keyCol).as("__key") +: col(leftTime).as("__t") +: lit(0).as("__is_right") +:
        (leftCols.map(col) :+ lit(null).cast(payloadType).as("__r"))).toIndexedSeq: _*)
    // right rows with a null key can never equality-match; left null-key
    // rows then share a partition with no right rows → null payload
    val rAligned = right.filter(col(keyCol).isNotNull).select(
      (col(keyCol).as("__key") +: col(rightTime).as("__t") +: lit(1).as("__is_right") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(rightPayload.map(c => col(c).as(s"asof_$c")): _*).as("__r"))).toIndexedSeq: _*)
    // right rows sort before left rows at equal time → an equal-time
    // right row IS visible to the left row (<= semantics); __r in the
    // ordering makes equal-(key, time) right rows deterministic
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__is_right").desc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__carried").getField(s"asof_$c").as(s"asof_$c")): _*)
  }

  /** Range (interval) join: pairs (l, r) sharing `keyCol` with
    * `rightTime ∈ [leftTime − gapSeconds, leftTime]`. A naive inequality
    * join is a per-key cross product; instead both sides are bucketed to
    * `gapSeconds`-wide time blocks and each left row probes only its own
    * and the previous block (any in-range right row must fall in one of
    * the two) — an equi-join Spark shuffles hash-partitioned, with the
    * exact range filter applied to candidates only.
    */
  def rangeJoinPrior(left: DataFrame, right: DataFrame, keyCol: String,
                     leftTime: String, rightTime: String,
                     gapSeconds: Long): DataFrame = {
    // gap 0 would make the bucket division silently yield no matches
    require(gapSeconds >= 1, s"gapSeconds must be >= 1, got $gapSeconds")
    val lb = left.withColumn("__lt", unix_millis(col(leftTime)))
      .withColumn("__bucket", floor(col("__lt") / (gapSeconds * 1000)))
    val rb = right.withColumn("__rt", unix_millis(col(rightTime)))
      .withColumn("__rbucket", floor(col("__rt") / (gapSeconds * 1000)))
    val probes = lb.withColumn("__probe",
      explode(array(col("__bucket"), col("__bucket") - 1)))
    probes.join(rb,
        probes(keyCol) === rb(keyCol) && col("__probe") === col("__rbucket"))
      .filter(col("__rt") >= col("__lt") - gapSeconds * 1000 && col("__rt") <= col("__lt"))
      .drop(rb(keyCol))
      .drop("__lt", "__rt", "__bucket", "__rbucket", "__probe")
  }

  /** Interval × interval overlap join — "which left intervals overlap
    * which right intervals for the same key" (session overlap,
    * campaign/outage windows, validity-range reconciliation). The
    * naive form is a per-key inequality join — quadratic in per-key
    * interval count and un-plannable as an equi-join. Here each
    * interval explodes into the time BUCKETS it covers (explode factor
    * = span/bucket + 1 — pick `bucketSeconds` near the typical
    * interval length), the join runs as a plain (key, bucket)
    * equi-join, and each overlapping pair survives EXACTLY once via
    * the canonical-bucket rule: the pair is kept only in the bucket of
    * `greatest(lStart, rStart)` — the overlap's start instant, which
    * both intervals necessarily cover — so no distinct/dedup pass is
    * needed after the join.
    *
    * Overlap is closed-interval: touching endpoints (lEnd == rStart)
    * count. All arithmetic in exact micros longs.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val b = bucketSeconds * 1000000L
    // Inverted intervals (end < start) fail LOUDLY inside the plan:
    // sequence(start, stop) silently generates a DESCENDING range when
    // start > stop, so a bad interval would still explode into bucket
    // rows and could emit phantom matches. raise_error keeps the check
    // distributed — no driver-side validation pass over the inputs.
    // NULL endpoints keep the PRE-GUARD semantics (the row drops out —
    // sequence over a null is null and explode emits nothing): the
    // first when-arm passes them through so a null cannot fall into
    // the raise branch with a contentless null message.
    def endGuard(endMicros: Column, startMicros: Column, side: String): Column =
      when(startMicros.isNull || endMicros.isNull, endMicros)
        .when(endMicros >= startMicros, endMicros)
        .otherwise(raise_error(concat(
          lit(s"intervalOverlapJoin: inverted $side interval (end < start) at start="),
          startMicros, lit(" end="), endMicros)))
    val lb = left
      .withColumn("__ls", unix_micros(col(lStart)))
      .withColumn("__le", endGuard(unix_micros(col(lEnd)), col("__ls"), "left"))
      .withColumn("__bk", explode(sequence(
        floor(col("__ls") / b), floor(col("__le") / b))))
    val rb = right
      .withColumn("__rs", unix_micros(col(rStart)))
      .withColumn("__re", endGuard(unix_micros(col(rEnd)), col("__rs"), "right"))
      .withColumn("__rbk", explode(sequence(
        floor(col("__rs") / b), floor(col("__re") / b))))
    lb.join(rb, lb(keyCol) === rb(keyCol) && col("__bk") === col("__rbk"))
      .filter(col("__ls") <= col("__re") && col("__rs") <= col("__le"))
      .filter(col("__bk") === floor(greatest(col("__ls"), col("__rs")) / b))
      .drop(rb(keyCol))
      .drop("__ls", "__le", "__rs", "__re", "__bk", "__rbk")
  }

  /** Blocked edit-distance entity resolution — match each dirty string
    * to its nearest catalog entry within `maxDist` edits (record
    * linkage / typo correction for ingest-time reference joins). The
    * naive formulation is a dirty×catalog cross join with a levenshtein
    * on every pair; here candidates are bounded by two sound filters:
    *
    *  1. a caller-supplied blocking key (a deterministic feature the
    *     expected edits cannot move — the untouched last token here, a
    *     phonetic code or length band elsewhere) turns the cross join
    *     into an equi-join;
    *  2. the length filter |len(a)−len(b)| ≤ maxDist (a lower bound on
    *     edit distance) prunes survivors before any distance is
    *     computed.
    *
    * The winner per dirty row is the min over (dist, name) — a plain
    * map-side-combinable `min(struct)` aggregation, deterministic on
    * ties, NOT a row_number window (no per-key sort of the full
    * candidate list). The distance is computed ONCE per surviving
    * candidate, in a projection the aggregate references twice; the
    * `maxDist` cut lives INSIDE the aggregate (`min(when(...))`, nulls
    * ignored) rather than in a separate Filter — a filter would be
    * pushed below the projection and re-inline the levenshtein,
    * paying the O(len²) distance twice per candidate (round-7
    * verdict). Unmatched rows survive with null match columns (the
    * quarantine lane). Catalog is distinct-projected and NOT
    * hint-broadcast: the planner broadcasts it while its estimated
    * size sits under `spark.sql.autoBroadcastJoinThreshold` (any
    * real entity-resolution catalog) and degrades to a shuffled
    * equi-join on `__block` — not an OOM'd broadcast — when a caller
    * hands it a catalog at data scale.
    *
    * Output: (`idCol`, name, matched_name, dist), one row per dirty
    * row. `levenshtein` is exact and integer in both Spark and the
    * oracle — hash-stable with no rounding discipline needed.
    */
  def fuzzyMatch(dirty: DataFrame, catalog: DataFrame, idCol: String,
                 blockKey: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val cat = catalog.select(col("name").as("cname")).distinct()
      .select(col("cname"), blockKey(col("cname")).as("__block"),
        length(col("cname")).as("__clen"))
    val best = dirty
      .select(col(idCol), col("name"), blockKey(col("name")).as("__block"),
        length(col("name")).as("__dlen"))
      .join(cat, "__block")
      .filter(abs(col("__dlen") - col("__clen")) <= maxDist)
      // one levenshtein per candidate: the projection below is the only
      // site; `min(when(...))` references the column, and CollapseProject
      // will not inline a non-cheap expression used twice
      .withColumn("__dist", levenshtein(col("name"), col("cname")))
      .groupBy(col(idCol))
      .agg(min(when(col("__dist") <= maxDist,
        struct(col("__dist").as("dist"), col("cname").as("cname")))).as("m"))
      .select(col(idCol), col("m.cname").as("matched_name"),
        col("m.dist").as("dist"))
    dirty.select(col(idCol), col("name"))
      .join(best, Seq(idCol), "left")
      .select(col(idCol), col("name"), col("matched_name"), col("dist"))
  }

  /** Blocked Jaro-Winkler entity resolution — the similarity-scored
    * sibling of [[fuzzyMatch]]: edit distance counts every edit alike,
    * Jaro-Winkler (native codegen expression, byte-level,
    * DuckDB/rapidfuzz-pinned semantics — see
    * [[org.apache.spark.sql.graftx.JaroWinklerKernel]]) weights
    * head-of-string agreement and tolerates transpositions, the ER
    * default for name data. Candidates are bounded by:
    *
    *  1. the caller's blocking key (equi-join, as in fuzzyMatch);
    *  2. a SOUND length-ratio prune: with s = min(len), l = max(len),
    *     m ≤ s gives jaro ≤ (2 + s/l)/3, and the ≤4-byte prefix boost
    *     gives jw ≤ 0.6·jaro + 0.4 — so jw ≥ τ forces
    *     s/l ≥ 5τ − 4. Applied only when the bound is active (τ > 0.8);
    *     a candidate it drops provably cannot reach the threshold.
    *
    * The winner per dirty row is max over (sim, cname) — map-side
    * combinable `max(struct)`, deterministic on ties, no window sort;
    * the similarity is computed ONCE per surviving candidate in a
    * projection the aggregate references twice (same round-7 lesson as
    * fuzzyMatch). The τ cut lives inside the aggregate
    * (`max(when(...))`), not a Filter that would re-inline the kernel.
    * Unmatched rows survive with null match columns. `sim` is reported
    * rounded to 6 dp; the threshold compares the UNROUNDED value.
    */
  def fuzzyMatchJw(dirty: DataFrame, catalog: DataFrame, idCol: String,
                   blockKey: Column => Column, minSim: Double): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0,
      s"minSim must lie in (0, 1], got $minSim")
    import org.apache.spark.sql.graftx.TextExpressions.jaroWinkler
    val cat = catalog.select(col("name").as("cname")).distinct()
      .select(col("cname"), blockKey(col("cname")).as("__block"),
        length(col("cname")).as("__clen"))
    val ratioFloor = 5.0 * minSim - 4.0
    val cand0 = dirty
      .select(col(idCol), col("name"), blockKey(col("name")).as("__block"),
        length(col("name")).as("__dlen"))
      .join(cat, "__block")
    val cand =
      if (ratioFloor > 0.0)
        cand0.filter(least(col("__dlen"), col("__clen")).cast("double") /
          greatest(col("__dlen"), col("__clen")) >= ratioFloor)
      else cand0
    val best = cand
      .withColumn("__sim", jaroWinkler(col("name"), col("cname")))
      .groupBy(col(idCol))
      .agg(max(when(col("__sim") >= minSim,
        struct(col("__sim").as("sim"), col("cname").as("cname")))).as("m"))
      .select(col(idCol), col("m.cname").as("matched_name"),
        col("m.sim").as("sim"))
    dirty.select(col(idCol), col("name"))
      .join(best, Seq(idCol), "left")
      .select(col(idCol), col("name"), col("matched_name"),
        round(col("sim"), 6).as("sim"))
  }

  /** Key-frequency report — pick salt factors from data, not folklore. */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topN)

  /** Join-strategy advisor — the planning-stats family composed into
    * the decision it exists for: BEFORE running an equi-join, spend a
    * few bounded passes ([[HeavyHitters.keySkew]]'s exact top key,
    * [[CountMin.joinSizeEstimate]]'s never-undercounting inner
    * product, two exact counts) and read off the strategy a planner
    * without table stats cannot know: broadcast the smaller side when
    * it fits, salt when one key owns the shuffle, plain shuffle
    * otherwise. Every number in the row is deterministic and
    * oracle-replayable — the recommendation is a pure CASE over them,
    * so the advisor itself is testable, not folklore.
    *
    * Cost shape: each input is scanned a bounded number of times
    * (count, CMS counters, the skew sketch's two passes) — all
    * map-side-combinable aggregations with no join between the
    * inputs; the join being advised on is never executed. Driver
    * state is a handful of scalars.
    */
  def joinAdvisor(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      broadcastRows: Long = 1000000L, skewSharePct: Double = 10.0,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(broadcastRows > 0, s"broadcastRows must be > 0, got $broadcastRows")
    require(skewSharePct > 0.0 && skewSharePct <= 100.0,
      s"skewSharePct must lie in (0, 100], got $skewSharePct")
    val spark = left.sparkSession
    val nLeft = left.filter(col(leftKey).isNotNull).count()
    val nRight = right.filter(col(rightKey).isNotNull).count()
    val est = CountMin.joinSizeEstimate(left, leftKey, right, rightKey,
      depth, width).head().getDecimal(0)
    // keySkew REFUSES when the top key is not provably exact — but for
    // the advisor that refusal is itself the answer: Misra-Gries
    // retains anything with count > n/(capacity+1), so an unprovable
    // top-1 has share ≤ 100/(capacity+1) % (≈ 0.024% at 4096) — the
    // key is provably NOT skewed and the salt lane cannot fire. Report
    // the bound as the share and a null key.
    val (topKey, topShare) =
      if (nLeft == 0L) (null: String, 0.0) // empty left: no keys, no skew
      else try {
        val top = HeavyHitters.keySkew(left, leftKey, 1).head()
        (top.getString(1), top.getDouble(3))
      } catch {
        case _: IllegalStateException =>
          (null: String, 100.0 / 4097.0)
      }
    val rec =
      if (math.min(nLeft, nRight) <= broadcastRows) "broadcast_smaller_side"
      else if (topShare >= skewSharePct) "salted_shuffle"
      else "shuffle_join"
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        nLeft, nRight, est, topKey, topShare, rec)), 1),
      StructType(Seq(
        StructField("n_left", LongType),
        StructField("n_right", LongType),
        StructField("est_join_rows", DecimalType(38, 0)),
        StructField("top_left_key", StringType),
        StructField("top_left_share_pct", DoubleType),
        StructField("recommendation", StringType))))
  }
}
