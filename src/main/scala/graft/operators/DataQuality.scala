package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Declarative data-quality expectations — the admission gate a
  * 100 TB ingest runs before data reaches training: null/domain/range
  * predicates, key uniqueness, and referential integrity, each
  * reported as (check_name, n_checked, n_violations, pass).
  *
  * Scale shape: every predicate expectation over one table folds into
  * a SINGLE aggregate pass (one scan, map-side combinable
  * `sum(when(violation))` per check — adding a check adds a column,
  * not a scan); uniqueness is one groupBy on the key; referential
  * integrity is one anti join on the foreign key (shuffle-partitioned
  * by key, broadcastable when the parent is a dim). Nothing collects
  * to the driver; the report size is the number of CHECKS, not rows.
  */
object DataQuality {

  /** All predicate checks for one table in one aggregate pass, then
    * unpivoted to the report shape via stack (no second scan).
    */
  def tableExpectations(df: DataFrame, table: String,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation")
    require(checks.forall(!_._1.contains("`")),
      "check names must not contain backticks")
    val aggs = count(lit(1)).as("__n") +:
      checks.map { case (name, violation) =>
        sum(when(violation, 1L).otherwise(0L)).as(s"__v_$name")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // backtick the column reference and escape quotes in the label —
    // a check named "no-nulls" is a column named __v_no-nulls, which
    // unquoted would parse as a subtraction
    val stackArgs = checks.map { case (name, _) =>
      val label = s"$table.$name".replace("'", "''")
      s"'$label', `__v_$name`"
    }.mkString(", ")
    one.select(col("__n"),
        expr(s"stack(${checks.size}, $stackArgs) AS (check_name, n_violations)"))
      .select(col("check_name"), col("__n").as("n_checked"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        (coalesce(col("n_violations"), lit(0L)) === 0L).as("pass"))
  }

  /** Key uniqueness as count − countDistinct (one aggregate; exact —
    * swap a sketch in only for monitoring, never for a gate).
    */
  def uniqueness(df: DataFrame, key: Column, checkName: String): DataFrame =
    df.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(key)).as("n_violations"))
      .select(lit(checkName).as("check_name"), col("n_checked"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))

  /** Referential integrity: child rows whose foreign key has no match
    * in the parent — ONE left-anti join on the key; the parent side
    * prunes to the key column before the exchange.
    */
  def referentialIntegrity(child: DataFrame, parent: DataFrame,
      fk: Column, pk: Column, checkName: String): DataFrame = {
    val orphans = child.select(fk.as("__fk"))
      .join(parent.select(pk.as("__pk")), col("__fk") === col("__pk"),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val total = child.agg(count(lit(1)).as("n_checked"))
    // both sides are 1-row aggregates — the cross join is a broadcast
    // of a single row, the established bounded-crossJoin exception
    total.crossJoin(orphans)
      .select(lit(checkName).as("check_name"), col("n_checked"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
  }

  /** Data freshness / timeliness per group — "when did each source
    * last deliver, and is it stale": newest event time per group, its
    * lag against a caller-supplied `asOf` instant, and the staleness
    * flag. `asOf` is an explicit parameter (never wall-clock inside
    * the operator) so the check is deterministic, replayable, and
    * oracle-comparable — the pipeline passes its scheduling tick.
    *
    * One map-side-combined aggregate pass; group count bounds the
    * output. Groups whose timestamps are all NULL report NULL lag and
    * stale = true (never delivered ⇒ stale by definition).
    */
  def freshness(df: DataFrame, group: Column, ts: Column,
      asOf: String, maxLagSeconds: Long): DataFrame = {
    require(maxLagSeconds >= 0, s"maxLagSeconds must be >= 0, got $maxLagSeconds")
    // STRICT driver-side parse before the plan ever sees the string:
    // in non-ANSI mode to_timestamp turns a typo'd asOf into NULL, and
    // every group would come back lag=NULL / stale=true — a plausible-
    // looking all-stale report from a misconfigured tick instead of an
    // error (the fail-loud discipline of the rest of the suite)
    try java.time.LocalDateTime.parse(asOf,
      java.time.format.DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss")
        .withResolverStyle(java.time.format.ResolverStyle.STRICT))
    catch { case e: java.time.format.DateTimeParseException =>
      throw new IllegalArgumentException(
        s"freshness: asOf '$asOf' is not a valid 'yyyy-MM-dd HH:mm:ss' instant", e)
    }
    val asOfTs = to_timestamp(lit(asOf))
    // exact micros difference + explicit floor division: second-level
    // truncation rules differ between engines on fractional seconds,
    // integer micros arithmetic does not
    val lagSecs = floor((unix_micros(asOfTs) - unix_micros(col("max_ts")))
      .cast("double") / 1000000.0).cast("long")
    df.groupBy(group.as("grp"))
      .agg(count(ts).as("n_rows"), max(ts).as("max_ts"))
      .select(col("grp"), col("n_rows"),
        date_format(col("max_ts"), "yyyy-MM-dd HH:mm:ss").as("last_seen"),
        lagSecs.as("lag_seconds"),
        coalesce(lagSecs > maxLagSeconds, lit(true)).as("stale"))
      .orderBy(col("grp"))
  }

  /** Benford first-digit conformance test (Benford 1938; Nigrini's
    * fraud screen): the observed first-significant-digit distribution
    * of a positive amount column against the log-law expectation
    * P(d) = log10(1 + 1/d), with the χ² statistic — fabricated or
    * process-generated amounts (prices from a uniform RNG, padded
    * invoices) miss the law; organic multiplicative amounts follow it.
    * One row per digit 1-9 (absent digits reported as 0-count rows,
    * they still contribute (0−E)²/E) plus the shared χ² total.
    *
    * Digit extraction never touches log10 on data: the value is
    * shifted to an exact BIGINT (round(x·10⁶) — six significant
    * decimals is far past any amount column's precision) and the
    * first character of the INTEGER's decimal rendering is the digit.
    * Integer-to-string is locale-free and engine-identical, where
    * floor(log10(x)) straddles engines for x within an ulp of a power
    * of ten. Values whose shift rounds to zero (< 5·10⁻⁷) leave the
    * test's domain and are excluded with the non-positives.
    *
    * Shape at 100 TB: one filtered scan folding into a 9-key
    * map-side-combinable count; everything downstream (expected
    * shares, χ² terms, the total) runs on the 9-row digit domain.
    * Determinism: expected shares are ln-ratio doubles rounded at
    * 9 dp (the surprisal rule), χ² terms are fixed-order squares
    * (explicit product, never pow) rounded at 9 dp and summed as
    * decimals; readouts rounded at 6 dp.
    */
  def benfordTest(df: DataFrame, value: Column): DataFrame = {
    val digits = df.sparkSession.range(1)
      .select(explode(sequence(lit(1), lit(9))).as("digit"))
      .select(col("digit").cast("int").as("digit"))
    val counts = df.filter(value.isNotNull && value > 0)
      .select(substring(round(value.cast("double") * lit(1000000.0))
        .cast("bigint").cast("string"), 1, 1).cast("int").as("digit"))
      .filter(col("digit") >= 1)
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = counts.agg(sum(col("n_obs")).as("n"))
    val full = digits.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      .withColumn("p9", round(log(lit(1.0)
        + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)), 9))
      .withColumn("exp_n", col("n").cast("double") * col("p9"))
      .withColumn("term9", round((col("n_obs").cast("double") - col("exp_n"))
        * (col("n_obs").cast("double") - col("exp_n")) / col("exp_n"), 9))
    val chi2 = full
      .agg(sum(col("term9").cast(DecimalType(20, 9))).as("chi2"))
    full.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("n").cast("double"), 6)
          .as("obs_share"),
        round(col("p9"), 6).as("exp_share"),
        round(col("term9"), 6).as("chi2_term"),
        round(col("chi2").cast("double"), 6).as("chi2_total"))
      .orderBy(col("digit"))
  }

  /** Missing-calendar-day report — [[freshness]]'s historical sibling:
    * freshness asks "is the newest data recent?", this asks "did any
    * PAST day silently never arrive?" (the partition-level hole an
    * upstream backfill or a dropped ingest job leaves; a daily
    * pipeline that joins on date silently produces nothing for the
    * hole). One row per (group, missing day) between the group's own
    * first and last observed days.
    *
    * Shape at 100 TB: the observed side is a distinct (group, day)
    * projection — map-side combinable, bounded by groups × calendar;
    * the expected side explodes `sequence(min_day, max_day)` from a
    * per-group 1-row aggregate (calendar-bounded by construction);
    * the report is one left-anti join between two calendar-bounded
    * frames. The corpus is touched once.
    */
  def calendarGaps(df: DataFrame, group: Column, ts: Column): DataFrame = {
    val obs = df.filter(ts.isNotNull)
      .select(group.as("grp"), to_date(ts).as("day"))
      .distinct()
    val expected = obs.groupBy(col("grp"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("grp"), explode(sequence(col("d0"), col("d1"))).as("day"))
    expected.join(obs, Seq("grp", "day"), "left_anti")
      .select(col("grp"), col("day").as("missing_day"))
      .orderBy(col("grp"), col("missing_day"))
  }

  /** Per-group winsorization — the robust-cleaning step a metrics
    * pipeline runs before any mean-based readout: clamp each value to
    * its group's [pLo, pHi] exact interpolated percentiles, so a fat
    * tail (a bot burst, a unit-error spike) stops dominating
    * downstream aggregates without dropping the rows (the clamp keeps
    * n intact where a filter would bias it).
    *
    * Shape at 100 TB: one exact-percentile aggregation per group (the
    * group domain is the event-type/source/tenant axis — bounded by
    * design, enforced via [[Partitioning.requireBoundedDomain]]), the
    * edges frame joins back by group key (planner broadcasts it while
    * it fits, degrades to a shuffled equi-join beyond — never hinted),
    * and the clamp itself is a codegen `least/greatest` projection.
    * Output rows carry (group, raw value, winsorized value, clamped
    * flag); summary readouts aggregate from there with map-side
    * combine.
    *
    * Determinism: exact `percentile` interpolation (the closest-ranks
    * rule both engines share); the clamp is pure comparison — no new
    * float folds; means downstream should decimal-accumulate (the
    * contract query does).
    *
    * Rows with a NULL group key are EXCLUDED (a null group has no
    * edges to clamp against, and the equi-join back would drop them
    * silently anyway — this makes the drop a stated contract);
    * coalesce the group upstream to keep them.
    */
  def winsorize(df: DataFrame, group: Column, value: Column,
      pLo: Double = 0.01, pHi: Double = 0.99,
      domainLimit: Long = 100000L): DataFrame = {
    require(pLo >= 0.0 && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val base = df.filter(value.isNotNull)
      .select(group.as("grp"), value.cast("double").as("v"))
      .filter(col("grp").isNotNull)
    // the join-back side must be a bounded DOMAIN frame — checked, not
    // trusted (a continuous group key would ship a corpus-sized edges
    // table into every join task)
    val edges = Partitioning.requireBoundedDomain(
      base.groupBy(col("grp"))
        .agg(expr(s"percentile(v, ${pLo}D)").as("lo"),
          expr(s"percentile(v, ${pHi}D)").as("hi")),
      "grp", "DataQuality.winsorize", domainLimit)
    base.join(edges, "grp")
      .select(col("grp"), col("v"),
        least(greatest(col("v"), col("lo")), col("hi")).as("v_w"),
        (col("v") < col("lo")).as("clamped_lo"),
        (col("v") > col("hi")).as("clamped_hi"),
        col("lo"), col("hi"))
  }
}
