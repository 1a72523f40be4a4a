package graft

import org.apache.spark.sql.SparkSession

/** Targeted SQL↔DataFrame parity runner — the single-entry version of
  * SqlSurfaceSpec's exhaustive loop, for iterating on one new
  * `SqlSurface` entry without paying the full-surface run. Usage:
  * `graft.ParityOne <name> [<name> ...]`; the full loop still gates
  * every round.
  */
object ParityOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.ParityOne <queryName> [...]")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      Views.register(spark, dir)
      val viaSql = spark.sql(SqlSurface.sql(name)).collect().map(_.toString).toSeq
      val viaDf = SqlSurface.dataFrameForm(name)(spark, dir)
        .collect().map(_.toString).toSeq
      println(s"$name: sql=${viaSql.length} df=${viaDf.length} equal=${viaSql == viaDf}")
      require(viaSql == viaDf && viaSql.nonEmpty, s"$name parity FAILED")
    }
    println("parity OK")
    spark.stop()
  }
}
