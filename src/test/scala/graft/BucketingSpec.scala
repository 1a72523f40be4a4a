package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Physical-layout strategies for the 100 TB path: partition pruning on
  * the context column and bucketed co-located joins (no Exchange).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partitionBy(outer_context_id): ctx filter becomes partition pruning") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/iglyphs_part"
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("outer_context_id", (col("vec_id") % 10).cast("int"))
      .write.partitionBy("outer_context_id").mode("overwrite").parquet(out)
    val scan = spark.read.parquet(out).filter(col("outer_context_id") === 3)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(outer_context_id"),
      s"expected partition filter in:\n${plan.take(1500)}")
    assert(scan.count() == 50) // 500 vectors, 10 contexts
    // only the ctx=3 directory is read
    assert(plan.contains("outer_context_id=3") ||
      !plan.contains("outer_context_id=4"))
  }

  test("bucketed tables join without a shuffle Exchange") {
    spark.sql("DROP TABLE IF EXISTS emb_bucketed")
    spark.sql("DROP TABLE IF EXISTS labels_bucketed")
    // a previously failed run can leave the managed location behind
    for (t <- Seq("emb_bucketed", "labels_bucketed")) {
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.write.bucketBy(4, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("emb_bucketed")
    emb.select(col("vec_id"), (col("label") * 2).as("label2"))
      .write.bucketBy(4, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("labels_bucketed")
    val joined = spark.table("emb_bucketed")
      .join(spark.table("labels_bucketed"), "vec_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n${plan.take(2000)}")
    assert(joined.count() == 500)
    // the real co-location claim: with broadcast off (both sides "too
    // big", the 100 TB situation) the join must be a SortMergeJoin
    // DIRECTLY over the bucketed scans — no Exchange anywhere in it
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val smj = spark.table("emb_bucketed")
        .join(spark.table("labels_bucketed"), "vec_id")
      val smjPlan = smj.queryExecution.executedPlan.toString
      assert(smjPlan.contains("SortMergeJoin"), smjPlan.take(1500))
      assert(!smjPlan.contains("Exchange hashpartitioning"), smjPlan.take(2000))
      assert(smj.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("zOrderKey: hand-checkable Morton interleave; zero maps to zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a=10 (1010b), b=6 (0110b): bits 2,6 from a (4+64) + bits 3,5
    // from b (8+32) = 108 — the textbook Morton(10,6)
    val d = Seq((10L, 6L), (0L, 0L), (255L, 0L), (0L, 255L)).toDF("a", "b")
    val got = d.select(graft.operators.Partitioning.zOrderKey(col("a"), col("b"), 8))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(108L, 0L, 0x5555L, 0xAAAAL))
  }

  test("zOrderLayout: every file group is a bounded rectangle in both dims") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // full 64x64 grid; 16 file groups (groupBits=4 over 12 zkey bits)
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val out = graft.operators.Partitioning.zOrderLayout(grid, col("a"), col("b"),
      bits = 6, groupBits = 4)
    val rects = out.groupBy(col("file_group"))
      .agg(count(lit(1)).as("n"),
        (max(col("a")) - min(col("a"))).as("wa"),
        (max(col("b")) - min(col("b"))).as("wb"))
      .collect()
    assert(rects.length == 16)
    // each group holds 4096/16 = 256 cells in a 16x16 rectangle — both
    // dimension widths bounded at 15, where a plain sort on `a` would
    // give groups spanning the FULL 0..63 range of b
    rects.foreach { r =>
      assert(r.getLong(1) == 256L)
      assert(r.getLong(2) <= 15L && r.getLong(3) <= 15L,
        s"group ${r.get(0)} rectangle ${r.getLong(2)}x${r.getLong(3)}")
    }
  }
}
