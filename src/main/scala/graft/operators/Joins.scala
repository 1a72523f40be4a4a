package graft.operators

import org.apache.spark.sql.DataFrame
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
    * `large.join(small, key)` — the salt column is internal. The big
    * side's salt is a deterministic hash of its row id expression so
    * repeated runs partition identically.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-frequency report — pick salt factors from data, not folklore. */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topN)
}
