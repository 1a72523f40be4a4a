package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows no other row dominates,
  * where B dominates A iff B.minimize ≤ A.minimize ∧ B.maximize ≥
  * A.maximize with at least one strict. The textbook definition is a
  * quadratic NOT EXISTS self-join (the oracle states exactly that);
  * this operator computes it in O(n log n): group to the distinct
  * minimize-domain, one ordered window over that domain, then a
  * semi-join back — at 100 TB the window runs over the DOMAIN of the
  * minimize column (prices, sizes, buckets — bounded), never over raw
  * rows, and the group-max aggregation is map-side combinable.
  *
  * Frontier membership: a row (m, x) survives iff
  *   x = max{x' | minimize = m}           (best in its own m-group —
  *     anything less is dominated by the group max, strict in x), and
  *   x > max{groupmax(m') | m' < m}       (strictly better than every
  *     strictly-cheaper group — equality there means a cheaper point
  *     matches x and dominates, strict in m).
  * Duplicate (m, x) points neither dominate each other — both stay.
  */
object Skyline {

  def frontier2d(df: DataFrame, minimize: Column, maximize: Column,
      domainLimit: Long = Partitioning.DefaultDomainLimit): DataFrame = {
    val pts = df.withColumn("__m", minimize).withColumn("__x", maximize)
      .filter(col("__m").isNotNull && col("__x").isNotNull)
    // the boundedness the window depends on is CHECKED, not trusted: a
    // continuous minimize column would otherwise silently degrade the
    // window below into a single-partition sort of n rows
    val groupMax = Partitioning.requireBoundedDomain(
      pts.groupBy(col("__m")).agg(max(col("__x")).as("__gmax")),
      "__m", "Skyline.frontier2d", domainLimit)
    // the global ordered window runs over the distinct-__m frame —
    // domain-bounded (the classifier_auc discipline), not row-bounded
    val w = Window.orderBy(col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierKeys = groupMax
      .withColumn("__prev", max(col("__gmax")).over(w))
      .filter(col("__prev").isNull || col("__gmax") > col("__prev"))
      .select(col("__m").as("__fm"), col("__gmax").as("__fx"))
    pts.join(frontierKeys,
        col("__m") === col("__fm") && col("__x") === col("__fx"), "left_semi")
      .drop("__m", "__x")
  }
}
