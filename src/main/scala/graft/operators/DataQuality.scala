package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
