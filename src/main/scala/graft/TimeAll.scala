package graft
import org.apache.spark.sql.SparkSession
object TimeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => println(s"ERR $name ${e.getMessage.take(100)}") }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$dt%8.2f  $name")
      name -> dt
    }
    println(f"TOTAL ${results.map(_._2).sum}%8.2f")
    spark.stop()
  }
}
