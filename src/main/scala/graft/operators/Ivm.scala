package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Algebraic incremental view maintenance for aggregate views — the
  * pattern that turns a nightly full-corpus rollup into a per-batch
  * append at 100 TB: keep the view as MERGEABLE partial states
  * (count, decimal sum, min, max), fold each arriving batch into a
  * delta state with the same shape, and merge. `merged(base, delta)`
  * equals the aggregate recomputed from scratch — associativity and
  * commutativity of the partial states is the whole theorem, and the
  * contract query proves it against a from-scratch oracle.
  *
  * avg is DERIVED at read time from (sum, count): it does not merge,
  * and persisting it in the state would silently break maintenance.
  * min/max are insert-only mergeable but NOT retractable — deleting
  * rows invalidates them (the reason real lakehouses pair IVM with
  * delete-vector recompute); [[retractable]] states that subset.
  *
  * Scale shape: the state is |keys| rows; folding a batch is one
  * map-side-combinable aggregation over the BATCH; the merge is one
  * full-outer equi-join of two key-sized frames. Corpus size appears
  * nowhere after the initial base fold.
  */
object Ivm {

  /** Fold rows into the mergeable per-key state. */
  def aggState(df: DataFrame, key: Column, value: Column): DataFrame =
    df.select(key.as("key"), value.as("v"))
      .groupBy(col("key"))
      .agg(count(col("v")).as("n"),
        sum(col("v").cast(DecimalType(28, 6))).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))

  /** Merge two states: the ⊕ of the IVM algebra. */
  def merge(base: DataFrame, delta: DataFrame): DataFrame = {
    val b = base.select(col("key").as("bk"), col("n").as("bn"),
      col("sum_v").as("bs"), col("min_v").as("bmin"), col("max_v").as("bmax"))
    val d = delta.select(col("key").as("dk"), col("n").as("dn"),
      col("sum_v").as("ds"), col("min_v").as("dmin"), col("max_v").as("dmax"))
    b.join(d, col("bk") === col("dk"), "full_outer")
      .select(coalesce(col("bk"), col("dk")).as("key"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("bs"), lit(0).cast(DecimalType(28, 6))) +
          coalesce(col("ds"), lit(0).cast(DecimalType(28, 6)))).as("sum_v"),
        least(col("bmin"), col("dmin")).as("min_v"),   // least/greatest skip nulls
        greatest(col("bmax"), col("dmax")).as("max_v"))
  }

  /** Read the view: derived columns materialize HERE, never in state. */
  def read(state: DataFrame): DataFrame =
    state.select(col("key"), col("n"), col("sum_v").cast("double").as("sum_v"),
        col("min_v"), col("max_v"),
        when(col("n") > 0L,
          round(col("sum_v").cast("double") / col("n"), 6)).as("avg_v"))
      .orderBy(col("key"))

  /** Which state columns survive row deletion: count and sum retract
    * (subtract the deleted batch's state); min/max do not — a delete
    * touching the extremum forces a per-key recompute.
    */
  val retractable: Set[String] = Set("n", "sum_v")

  /** COUNT DISTINCT as a mergeable state: exact `countDistinct` is not
    * algebraic (the partial state is the value set itself), so the
    * maintainable form is the HLL sketch. Merging is deterministic and
    * commutative, and the merged estimate stays within the sketch's
    * error envelope of the true union cardinality — but it is NOT
    * bit-identical to a sketch built directly from the union (the
    * DataSketches union promotes the internal representation, e.g.
    * sparse coupon list → dense HLL), which is why this state is a
    * MONITORING dial and the exact aggregate stays the oracle default
    * (the Monitor.profile discipline). At 100 TB the distinct-user /
    * distinct-digest columns of a maintained view are sketches or they
    * are rebuilds.
    */
  def distinctState(df: DataFrame, key: Column, value: Column): DataFrame =
    df.select(key.as("key"), value.as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("key"))
      .agg(expr("hll_sketch_agg(v)").as("nd_sketch"))

  /** Merge two distinct-count states (the ⊕ for [[distinctState]]). */
  def mergeDistinct(base: DataFrame, delta: DataFrame): DataFrame = {
    val b = base.select(col("key").as("bk"), col("nd_sketch").as("bs"))
    val d = delta.select(col("key").as("dk"), col("nd_sketch").as("ds"))
    b.join(d, col("bk") === col("dk"), "full_outer")
      .select(coalesce(col("bk"), col("dk")).as("key"),
        when(col("bs").isNull, col("ds"))
          .when(col("ds").isNull, col("bs"))
          .otherwise(expr("hll_union(bs, ds)")).as("nd_sketch"))
  }

  /** Read the estimated distinct count per key. */
  def readDistinct(state: DataFrame): DataFrame =
    state.select(col("key"),
        expr("hll_sketch_estimate(nd_sketch)").as("n_distinct_est"))
      .orderBy(col("key"))
}
