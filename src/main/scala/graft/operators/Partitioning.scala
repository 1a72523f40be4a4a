package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for CPU-heavy per-row stages. */
object Partitioning {

  /** Spread `df` across the session's cores, but only when it arrives
    * with fewer partitions than that (the single-file local test tables
    * arrive as 1). On a real cluster inputs already arrive in thousands
    * of partitions; an unconditional `repartition(defaultParallelism)`
    * there would be an extra full shuffle of the base data — so the
    * repartition is gated on the input's actual partition count.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
