package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Add, Divide, Expression, ExpressionInfo, Literal, Multiply, Sqrt}

/** SQL registration of graft's native expressions, exposing the
  * reference's FULL metric dispatch (`similarity.py:82-110`) to SQL
  * users — `vec_dot`, `vec_cosine_sim`, `vec_euclidean_dist`,
  * `vec_euclidean_sim`, `vec_phi_sim` (plus the raw `vec_sq_dist`
  * kernel) — either per-session (`GraftFunctions.register`) or
  * cluster-wide via
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
  private def arity2(name: String)(f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != 2) throw new IllegalArgumentException(
        s"$name expects 2 arguments (vector, vector), got ${args.length}")
      f(args(0), args(1))
    }

  // The composed metrics repeat their argument expressions (e.g. cosine
  // evaluates VecDot(a,a)); all children are deterministic column
  // references or literals in practice, and Catalyst's common-
  // subexpression elimination shares the repeated folds inside
  // whole-stage codegen — the same pattern Spark's own
  // RuntimeReplaceable built-ins use.
  private def cosine(a: Expression, b: Expression): Expression =
    Divide(VecDot(a, b),
      Add(Multiply(Sqrt(VecDot(a, a)), Sqrt(VecDot(b, b))), Literal(1e-12)))

  private def euclideanDist(a: Expression, b: Expression): Expression =
    Sqrt(VecSqDist(a, b))

  private def euclideanSim(a: Expression, b: Expression): Expression =
    Divide(Literal(1.0), Add(Literal(1.0), euclideanDist(a, b)))

  private[graftx] val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      arity2("vec_dot")(VecDot(_, _))),
    ("vec_sq_dist",
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_sq_dist"),
      arity2("vec_sq_dist")(VecSqDist(_, _))),
    ("vec_phi_sim",
      new ExpressionInfo(classOf[VecPhiSim].getName, "vec_phi_sim"),
      arity2("vec_phi_sim")(VecPhiSim(_, _))),
    ("vec_cosine_sim",
      new ExpressionInfo(classOf[VecDot].getName, "vec_cosine_sim"),
      arity2("vec_cosine_sim")(cosine)),
    ("vec_euclidean_dist",
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_euclidean_dist"),
      arity2("vec_euclidean_dist")(euclideanDist)),
    ("vec_euclidean_sim",
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_euclidean_sim"),
      arity2("vec_euclidean_sim")(euclideanSim)))

  /** Per-session registration (no extensions config needed). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
