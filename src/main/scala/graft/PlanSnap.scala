package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named queries to
  * plans/<tag>/<query>_<suffix>.txt — the optimization round's
  * before/after plan evidence (optimization tooling, not part of the
  * driver contract).
  *
  * Usage: runMain graft.PlanSnap <suffix> <query[,query...]> [outDir]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <suffix> <q1,q2,...> [outDir]")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = if (args.length > 2) args(2) else "plans/r15"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      spark.sharedState.cacheManager.clearCache()
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
