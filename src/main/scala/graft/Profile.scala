package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for single queries (optimization tooling, not
  * part of the driver contract). Runs each named query through the
  * noop sink like Bench, with a listener recording per-stage wall
  * time, task counts and shuffle bytes, so per-query seconds can be
  * attributed to stages/exchanges instead of guessed at.
  *
  * Usage: runMain graft.Profile <query[,query...]> [reps]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in Bench.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map {
      case "ALL" => SparkEntry.queries.keys.toSeq.sorted
      case s => s.split(",").toSeq
    }.getOrElse(Seq("lsh_recall"))
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // keep measurement parity with Bench's session (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "128k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class StageRec(id: Int, name: String, submitted: Long, completed: Long,
                        tasks: Int, taskTimeMs: Long,
                        shufRead: Long, shufWrite: Long, input: Long)
    val stages = scala.collection.mutable.ArrayBuffer[StageRec]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += StageRec(si.stageId, si.name,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          si.numTasks, m.executorRunTime,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // same warmup family as Bench so JIT noise doesn't land on the first query
    for (w <- Seq("search_cosine_topk", "dedup_minhash_lsh", "pack_windows"))
      try SparkEntry.queries(w)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"warmup failed: $e") }
    spark.sharedState.cacheManager.clearCache()

    for (name <- names; rep <- 1 to reps) {
      stages.clear(); jobs = 0
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      // let listener events drain (listenerBus is spark-private; a
      // short sleep suffices for a profiling tool)
      Thread.sleep(300)
      val recs = stages.sortBy(_.submitted)
      println(f"\n===== $name rep $rep: wall ${wall}%.2f s, ${jobs} jobs, ${recs.size} stages, task-time ${recs.map(_.taskTimeMs).sum / 1e3}%.2f s =====")
      val t00 = recs.headOption.map(_.submitted).getOrElse(0L)
      for (r <- recs) {
        val span = (r.completed - r.submitted) / 1e3
        println(f"  stage ${r.id}%4d +${(r.submitted - t00) / 1e3}%6.2f span ${span}%6.3f s tasks ${r.tasks}%4d taskTime ${r.taskTimeMs / 1e3}%7.3f s shufR ${r.shufRead / 1024}%8d KB shufW ${r.shufWrite / 1024}%8d KB in ${r.input / 1024}%7d KB  ${r.name.take(90)}")
      }
    }
    spark.stop()
  }
}
