package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for CPU-heavy per-row stages. */
object Partitioning {

  /** Spread `df` across the session's cores, but only when it arrives
    * under-parallel (the single-file local test tables arrive as 1
    * split). On a real cluster inputs already arrive in thousands of
    * partitions; an unconditional `repartition(defaultParallelism)`
    * there would be an extra full shuffle of the base data — so the
    * repartition is gated on the input's width.
    *
    * Width probe: an explicit caller hint wins; otherwise the input-file
    * count of the underlying file source — a metadata lookup on the
    * already-listed FileIndex which, unlike the previous
    * `df.rdd.getNumPartitions`, does not force a throwaway physical
    * planning of the upstream plan on every operator call. File count
    * under-estimates split count for large splittable files, which only
    * errs toward spreading — safe for the CPU-heavy per-row stages this
    * guards. Non-file inputs (in-memory test frames, JDBC) report zero
    * files and are treated as narrow: there the fan-out is the desired
    * behavior for a CPU-heavy stage anyway.
    */
  def spread(df: DataFrame, widthHint: Int = -1): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val width  = if (widthHint > 0) widthHint else df.inputFiles.length
    if (width >= target) df else df.repartition(target)
  }
}
