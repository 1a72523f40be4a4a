package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.RewriteHofDotProduct

class RewriteRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // parquet-backed source: a local Seq collapses to LocalRelation via
  // ConvertToLocalRelation before user-provided optimizer rules run
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def hofDot =
    emb.select(aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("dot"))

  test("rule rewrites HOF aggregate(zip_with(*)) into native VecDot") {
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      val df = hofDot
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vecdot"), s"plan was:\n$optimized")
      // value matches the un-rewritten evaluation bit-for-bit
      val native = emb.select(graft.functions.VectorOps.dotProduct(
        col("embedding"), col("embedding")).as("dot"))
      assert(df.collect().map(_.getDouble(0)).toSeq ==
        native.collect().map(_.getDouble(0)).toSeq)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("without the rule the HOF form keeps its aggregate shape") {
    val plan = hofDot.queryExecution.optimizedPlan.toString
    assert(!plan.contains("vecdot"))
    assert(hofDot.count() == 500)
  }

  test("VecDot nulls match the HOF form: null element and length mismatch") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 1.0, 2.0))
    ).toDF("a", "b")
    val native = df.select(graft.functions.VectorOps.dotProduct(col("a"), col("b")).as("d"))
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d"))
    val n = native.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val h = hof.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(n.toSeq == h.toSeq && n(0).isEmpty && n(1).isEmpty && n(2).contains(9.0))
  }

  test("rule does not fire on non-dot aggregates") {
    spark.experimental.extraOptimizations = Seq(RewriteHofDotProduct)
    try {
      val df = emb.select(aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("s"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("vecdot"))
      assert(df.count() == 500)
    } finally spark.experimental.extraOptimizations = Nil
  }
}
