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
  private def arity2(name: String, repeatsArgs: Boolean = false,
      argDesc: String = "vector, vector")(
      f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != 2) throw new IllegalArgumentException(
        s"$name expects 2 arguments ($argDesc), got ${args.length}")
      // Composed metrics place the same argument Expression at multiple
      // tree positions (cosine evaluates VecDot(a,b), VecDot(a,a) and
      // VecDot(b,b)). A non-deterministic argument (e.g. an array built
      // from rand()) would then evaluate independently per occurrence
      // and yield a silently inconsistent score — reject it loudly.
      // Builders run after `transformExpressionsUp` has resolved the
      // children, so `deterministic` is meaningful here.
      if (repeatsArgs && !args.forall(_.deterministic))
        throw new IllegalArgumentException(
          s"$name repeats its arguments inside the composed metric, so " +
          "non-deterministic arguments would evaluate to different values " +
          "at each occurrence; materialize the argument first (e.g. in a " +
          "subquery or prior projection)")
      f(args(0), args(1))
    }

  // The composed metrics repeat their (deterministic — enforced above)
  // argument expressions; Catalyst's common-subexpression elimination
  // shares the repeated folds inside whole-stage codegen — the same
  // pattern Spark's own RuntimeReplaceable built-ins use.
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
    // Composed metrics have no single implementing Expression class —
    // DESCRIBE FUNCTION names this registry and the usage text states
    // the composition, rather than borrowing a kernel's class name.
    ("vec_cosine_sim",
      new ExpressionInfo(GraftFunctions.getClass.getName, null, "vec_cosine_sim",
        "vec_cosine_sim(a, b) - cosine similarity, composed as " +
          "vec_dot(a,b) / (sqrt(vec_dot(a,a)) * sqrt(vec_dot(b,b)) + 1e-12)", ""),
      arity2("vec_cosine_sim", repeatsArgs = true)(cosine)),
    ("vec_euclidean_dist",
      new ExpressionInfo(GraftFunctions.getClass.getName, null, "vec_euclidean_dist",
        "vec_euclidean_dist(a, b) - euclidean distance, composed as " +
          "sqrt(vec_sq_dist(a, b))", ""),
      arity2("vec_euclidean_dist")(euclideanDist)),
    ("vec_euclidean_sim",
      new ExpressionInfo(GraftFunctions.getClass.getName, null, "vec_euclidean_sim",
        "vec_euclidean_sim(a, b) - euclidean similarity, composed as " +
          "1 / (1 + sqrt(vec_sq_dist(a, b)))", ""),
      arity2("vec_euclidean_sim")(euclideanSim)),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      args => {
        if (args.length != 1) throw new IllegalArgumentException(
          s"nfc_normalize expects 1 argument (string), got ${args.length}")
        NfcNormalize(args.head)
      }),
    ("jaro_winkler",
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      arity2("jaro_winkler", argDesc = "string, string")(JaroWinklerSim(_, _))))

  /** Per-session registration (no extensions config needed). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    definitions.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
