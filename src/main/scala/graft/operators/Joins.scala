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
    *  2. a SOUND length-ratio prune IN BYTES: with s = min(octet_len),
    *     l = max(octet_len), m ≤ s gives jaro ≤ (2 + s/l)/3, and the
    *     ≤4-byte prefix boost gives jw ≤ 0.6·jaro + 0.4 — so jw ≥ τ
    *     forces s/l ≥ 5τ − 4. Applied only when the bound is active
    *     (τ > 0.8); a candidate it drops provably cannot reach the
    *     threshold. The lengths MUST be octet_length, not length: the
    *     kernel is byte-level, so the proof's s and l are byte counts —
    *     char lengths understate multibyte strings asymmetrically and
    *     would wrongly prune reachable candidates (e.g. "éé" vs "ééxy":
    *     byte jw = 0.9333 but the char ratio 2/4 fails the τ = 0.93
    *     floor 0.65 that the byte ratio 4/6 passes).
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
        octet_length(col("cname")).as("__clen"))
    val ratioFloor = 5.0 * minSim - 4.0
    val cand0 = dirty
      .select(col(idCol), col("name"), blockKey(col("name")).as("__block"),
        octet_length(col("name")).as("__dlen"))
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
    * few bounded passes (an exact-or-refuse top-key probe, the CMS
    * inner product, the two side counts) and read off the strategy a
    * planner without table stats cannot know: broadcast the smaller
    * side when it fits, salt when one key owns the shuffle, plain
    * shuffle otherwise. Every number in the row is deterministic and
    * oracle-replayable — the recommendation is a pure CASE over them,
    * so the advisor itself is testable, not folklore.
    *
    * The whole advisor is ONE lazy DataFrame program (no driver
    * actions in here — compose it into a pipeline, union several
    * key-column candidates, or `.head()` it for the scalars):
    *   - both side counts fall out of the CMS counter tables for free
    *     (each hash row d partitions all keys, so Σ_bucket n at d = 0
    *     is the side's non-NULL key count — no separate count scan);
    *   - the counter tables meet in a FULL OUTER join so one-sided
    *     cells still feed the counts, while the inner product only
    *     sums cells present on both sides (a NULL product is skipped
    *     by SUM); a hash row with zero bucket overlap proves the join
    *     empty (shared keys collide at EVERY row), so its per-row
    *     coalesce-to-0 makes min over d exactly 0 there;
    *   - the skew lane recounts the Misra-Gries candidates via a
    *     broadcast semi-style join against the ≤ capacity exploded
    *     candidate keys (no driver isin round-trip), and the
    *     exact-vs-refused branch is the merge-order-INDEPENDENT
    *     predicate of [[HeavyHitters.provableTop1]]: recounted max m
    *     satisfies m·(capacity+1) > n_left iff the true max does, in
    *     exact integer arithmetic. The share denominator is n_left
    *     (NULL keys excluded — equi-join semantics), matching the
    *     side counts; an unprovable top key reports a null key and
    *     the provable share bound 100/(capacity+1) %, under which the
    *     salt lane cannot fire.
    *
    * `est_join_rows` is the exact CMS bound serialized as a digit
    * STRING, not DECIMAL(38,0) — see [[CountMin.joinSizeEstimate]]
    * for why wide-decimal output columns are not representation-
    * stable across engines. Parse with BigDecimal.
    *
    * Cost shape: left is scanned three times (MG sketch, candidate
    * recount, counters), right once — all map-side-combinable
    * aggregations; every join in the plan is a broadcast of a
    * bounded (≤ depth·width or ≤ capacity rows) side or a 1-row
    * cross of global aggregates; the join being advised on is never
    * executed.
    */
  def joinAdvisor(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      broadcastRows: Long = 1000000L, skewSharePct: Double = 10.0,
      depth: Int = 4, width: Int = 1024,
      skewCapacity: Int = 4096): DataFrame = {
    require(broadcastRows > 0, s"broadcastRows must be > 0, got $broadcastRows")
    require(skewSharePct > 0.0 && skewSharePct <= 100.0,
      s"skewSharePct must lie in (0, 100], got $skewSharePct")
    require(skewCapacity >= 1, s"skewCapacity must be >= 1, got $skewCapacity")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val lk = Partitioning.spread(left)
      .select(col(leftKey).cast("string").as("w")).filter(col("w").isNotNull)
    val rk = Partitioning.spread(right)
      .select(col(rightKey).cast("string").as("w")).filter(col("w").isNotNull)
    // counts + CMS inner product from one counter-table program
    val cells = CountMin.countersOf(lk, depth, width).as("ca")
      .join(CountMin.countersOf(rk, depth, width).as("cb"),
        Seq("d", "bucket"), "full_outer")
    val perRow = cells.groupBy(col("d")).agg(
      coalesce(sum(col("ca.n").cast(dec) * col("cb.n")), lit(0).cast(dec))
        .as("ip"),
      sum(col("ca.n")).as("na"), sum(col("cb.n")).as("nb"))
    val scalars = perRow.agg(
      coalesce(min(col("ip")), lit(0).cast(dec)).as("est"),
      // na/nb are identical at every hash row d; max just selects one
      coalesce(max(col("na")), lit(0L)).as("n_left"),
      coalesce(max(col("nb")), lit(0L)).as("n_right"))
    // skew lane: MG candidates exploded in-plan, recounted exactly
    val mg = udaf(new HeavyHitters.MisraGries(skewCapacity),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val cands = lk.agg(mg(col("w")).as("cand"))
      .select(explode(map_keys(col("cand._1"))).as("w"))
    val top = lk.join(broadcast(cands), Seq("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      // (n desc, key asc) winner as a 1-row global agg (stays 1 row
      // on an empty candidate set, where a limit(1) would vanish)
      .agg(min(struct((-col("n")).as("nn"), col("w").as("k"))).as("t"))
    // the refused lane's provable share bound, 6-dp like the share
    val bound6 = (BigDecimal(100).setScale(18) / BigDecimal(skewCapacity + 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue
    val m = (-col("t.nn")).cast(dec)
    val provable = col("t").isNotNull &&
      m * lit(skewCapacity + 1) > col("n_left")
    val share =
      when(col("n_left") === 0L, lit(0.0))
        .when(provable, round((-col("t.nn")) * lit(100.0) / col("n_left"), 6))
        .otherwise(lit(bound6))
    scalars.crossJoin(top).select(
      col("n_left"), col("n_right"),
      col("est").cast("string").as("est_join_rows"),
      when(provable, col("t.k")).as("top_left_key"),
      share.as("top_left_share_pct"),
      when(least(col("n_left"), col("n_right")) <= broadcastRows,
        "broadcast_smaller_side")
        .when(share >= skewSharePct, "salted_shuffle")
        .otherwise("shuffle_join").as("recommendation"))
  }
}
