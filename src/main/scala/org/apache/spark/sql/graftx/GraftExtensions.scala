package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of graft's native expressions, making every vector
  * kernel SQL-reachable (`SELECT vec_dot(a, b)` / `vec_sq_dist(a, b)`),
  * either per-session (`GraftFunctions.register`) or cluster-wide via
  * `--conf spark.sql.extensions=org.apache.spark.sql.graftx.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftFunctions {
  private[graftx] val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    ("vec_sq_dist",
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_sq_dist"),
      (args: Seq[Expression]) => VecSqDist(args(0), args(1))))

  /** Per-session registration (no extensions config needed). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
