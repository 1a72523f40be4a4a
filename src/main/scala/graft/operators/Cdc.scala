package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD Type 2) operators — the lakehouse
  * change-data-capture surface: rebuild a full dimension HISTORY from
  * an append-only change log, and MERGE an updates batch into a
  * current snapshot. The reference engine has no CDC surface; these
  * are north-star additions a 100 TB training-data pipeline needs to
  * version its metadata dimensions (source registries, license
  * states, crawl configs) without rewriting history.
  *
  * Scale shape: both operators are single-shuffle-per-key.
  * [[scd2FromLog]] is two window functions over ONE
  * partitioning/ordering (Catalyst reuses the exchange and sort);
  * [[scd2Merge]] is a full-outer join of two pre-aggregated
  * per-key frames plus a union — no driver state, no per-row probing,
  * and the three merge lanes (unchanged / superseded / new) fall out
  * of one join pass. Neither materializes anything proportional to
  * history length on a single node.
  */
object Cdc {

  /** Rebuild SCD2 intervals from an append-only change log.
    *
    * Consecutive runs of the same `state` collapse into one interval
    * (the run-length compaction that makes a change LOG into a
    * dimension HISTORY): a row survives only where its state differs
    * from the previous state for the key, and each survivor's
    * `effective_to` is the next survivor's `effective_from` — the
    * half-open [from, to) convention; the last interval per key is
    * open (`effective_to` null, `is_current` true).
    *
    * `tieBreak` makes the ordering total when `ts` alone has ties
    * (e.g. an event id) — without it, lag/lead would be
    * nondeterministic across engines.
    */
  def scd2FromLog(log: DataFrame, key: Column, ts: Column, state: Column,
      tieBreak: Column): DataFrame = {
    log
      .select(key.as("key"), ts.as("ts"), state.as("state"),
        tieBreak.as("tie"))
      .withColumn("prev_state", lag(col("state"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts").asc, col("tie").asc)))
      // the first row is detected by a lagged marker, not by
      // prev_state being null — a logged NULL state is a legal value
      // and must run-length-compact like any other (null-safe <=>)
      .withColumn("has_prev", lag(lit(true), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts").asc, col("tie").asc)))
      .filter(col("has_prev").isNull || !(col("prev_state") <=> col("state")))
      // the second window runs on the SAME partitioning and ordering —
      // one exchange, one sort, two window frames
      .withColumn("effective_to_ts", lead(col("ts"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts").asc, col("tie").asc)))
      .select(col("key"), col("state"),
        col("ts").as("effective_from_ts"),
        col("effective_to_ts"),
        col("effective_to_ts").isNull.as("is_current"))
  }

  /** Merge an updates batch into the current rows of an SCD2 dimension.
    *
    * `current`: one row per key — the open (`is_current`) rows of the
    * dimension, as (key, state, effective_from_ts).
    * `updates`: one row per key — the new observed state, as
    * (key, state, ts).
    *
    * Lanes (one full-outer join, no re-scan):
    *  - key only in current → row unchanged, still open;
    *  - key in both, same state → unchanged (an idempotent re-send
    *    does NOT cut a new version);
    *  - key in both, state differs → the old row CLOSES at the update
    *    ts and a new open row starts there;
    *  - key only in updates → brand-new open row.
    *
    * Returns the new current+closed row set with a `lane` marker —
    * the writer appends the closed rows and replaces the open ones.
    */
  def scd2Merge(current: DataFrame, updates: DataFrame): DataFrame = {
    // NULL keys fail LOUDLY: the lane predicates below use c_key/u_key
    // nullness to mean "absent from that side" (full-outer non-match),
    // and a genuinely-null input key would alias that signal — a
    // null-key current row and a null-key update row would sail
    // through as independent 'unchanged'/'new' lanes instead of
    // merging. State is null-safe (<=>, a NULL state is a legal
    // dimension value); the KEY is a precondition, enforced in-plan so
    // the check stays distributed.
    def keyGuard(key: Column, side: String): Column =
      when(key.isNotNull, key).otherwise(raise_error(
        lit(s"scd2Merge: NULL key in $side input — SCD2 keys must be non-null " +
          "(null key is indistinguishable from a full-outer non-match)")))
    val cur = current.select(keyGuard(col("key"), "current").as("c_key"),
      col("state").as("c_state"),
      col("effective_from_ts").as("c_from"))
    val upd = updates.select(keyGuard(col("key"), "updates").as("u_key"),
      col("state").as("u_state"), col("ts").as("u_ts"))
    // ONE pass over the joined frame: each row emits its 1–2 output
    // lanes as an inline array + explode — a union of filtered branches
    // would re-execute the full-outer join once per lane
    val nullTs = lit(null).cast("timestamp")
    def lane(key: Column, state: Column, from: Column, to: Column,
        isCurrent: Column, name: Column) =
      struct(key.as("key"), state.as("state"), from.as("effective_from_ts"),
        to.as("effective_to_ts"), isCurrent.as("is_current"), name.as("lane"))
    // all state comparisons are NULL-SAFE (<=>): a NULL state is a
    // legal dimension value — plain === / =!= would make every lane
    // predicate NULL and silently drop the key from the merge
    val sameState = col("c_state") <=> col("u_state")
    val lanes = array(
      // unchanged: absent from the batch, or same state re-sent
      when(col("u_key").isNull || (col("c_key").isNotNull && sameState),
        lane(col("c_key"), col("c_state"), col("c_from"), nullTs,
          lit(true), lit("unchanged"))),
      // superseded: the old row closes at the update ts ...
      when(col("c_key").isNotNull && col("u_key").isNotNull && !sameState,
        lane(col("c_key"), col("c_state"), col("c_from"), col("u_ts"),
          lit(false), lit("closed"))),
      // ... and the new state opens; first sighting opens as "new"
      when(col("u_key").isNotNull && (col("c_key").isNull || !sameState),
        lane(col("u_key"), col("u_state"), col("u_ts"), nullTs,
          lit(true), when(col("c_key").isNull, "new").otherwise("reopened"))))
    cur.join(upd, col("c_key") === col("u_key"), "full_outer")
      .select(explode(filter(lanes, _.isNotNull)).as("r"))
      .select(col("r.key").as("key"), col("r.state").as("state"),
        col("r.effective_from_ts"), col("r.effective_to_ts"),
        col("r.is_current"), col("r.lane"))
  }

  /** SCD2 dimension lookup — the CONSUMER side of the family: each
    * fact row picks the dimension version effective at its timestamp
    * (`effective_from_ts <= ts`, and `ts < effective_to_ts` when the
    * version is closed) — the join every fact pipeline runs against a
    * versioned dimension.
    *
    * Scale shape: rides [[Joins.asofJoin]]'s union + ordered-window
    * carry — ONE shuffle on the key, no per-fact range probe, no
    * interval explode. Version boundaries are half-open [from, to): a
    * fact AT a boundary takes the NEWER version (an equal-time right
    * row is visible to the as-of carry, and the carry keeps the last
    * one). A fact in a history GAP — at/after a closed version's end
    * with no successor covering it (a retention-trimmed dimension) —
    * gets NULL, never the stale prior version; matched-ness is judged
    * from the carried effective_from_ts (non-null in any valid SCD2
    * row), so a legitimately-NULL state stays distinguishable from
    * "no effective version".
    *
    * `facts`: (key, ts, …payload); `dim`: (key, state,
    * effective_from_ts, effective_to_ts). Output: every fact column +
    * `dim_state` + `dim_effective_from_ts`.
    */
  def scd2Lookup(facts: DataFrame, dim: DataFrame): DataFrame = {
    // EMPTY intervals ([t, t) — same-instant change-log ties produce
    // them) are dropped before the carry: no ts can satisfy
    // from <= ts < to when from = to, so the drop is semantically
    // exact — and necessary, because the as-of carry breaks the
    // equal-from tie by payload order, and letting the empty interval
    // win would NULL every lookup from t onward while its non-empty
    // same-from sibling held the answer. Valid SCD2 versions never
    // overlap, so after the drop at most one version per (key, from)
    // remains.
    val nonEmpty = dim.filter(col("effective_to_ts").isNull ||
      col("effective_from_ts") < col("effective_to_ts"))
    val looked = Joins.asofJoin(facts,
      nonEmpty.select(col("key"), col("state"), col("effective_from_ts"),
        col("effective_to_ts")),
      "key", "ts", "effective_from_ts",
      Seq("state", "effective_from_ts", "effective_to_ts"))
    val valid = col("asof_effective_from_ts").isNotNull &&
      (col("asof_effective_to_ts").isNull ||
        col("ts") < col("asof_effective_to_ts"))
    looked.select(facts.columns.map(col).toIndexedSeq ++ Seq(
      when(valid, col("asof_state")).as("dim_state"),
      when(valid, col("asof_effective_from_ts")).as("dim_effective_from_ts")): _*)
  }

  /** Latest observed state per key from a change log — the snapshot
    * both merge sides are built from. row_number (not max_by) so the
    * tie-break rule is explicit and engine-portable.
    */
  def latestState(log: DataFrame, key: Column, ts: Column, state: Column,
      tieBreak: Column): DataFrame =
    log.select(key.as("key"), ts.as("ts"), state.as("state"), tieBreak.as("tie"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("ts").desc, col("tie").desc)))
      .filter(col("rn") === 1)
      .drop("rn", "tie")
}
