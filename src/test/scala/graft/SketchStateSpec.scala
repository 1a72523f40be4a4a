package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import graft.operators._

/** Executed-metric pins for the batch sketch family (round-9 verdict
  * #5): the sketches' 100 TB claim is about STATE, not time — the
  * partial (map-side) aggregate must emit rows bounded by
  * tasks × sketch-state, never by the vocabulary/key domain. The
  * streaming suite pins the same bound through RocksDB state-store
  * metrics; these tests pin the batch path through the executed
  * plan's partial-aggregate `numOutputRows`, on inputs whose domain
  * is 15-60× the sketch bound so a domain-shaped partial cannot
  * sneak under the assertion.
  */
class SketchStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sum of numOutputRows over PARTIAL-mode aggregate nodes of the
    * EXECUTED (final AQE) plan, plus the count of such nodes. AQE
    * wraps finished stages in QueryStageExec whose plan is NOT a
    * TreeNode child, so the walk descends into stages explicitly. */
  private def partialAggRows(df: DataFrame): (Long, Int) = {
    // Execute through the SAME QueryExecution whose plan is walked
    // below: a noop write plans (and runs) a SEPARATE QueryExecution,
    // leaving df.queryExecution's metrics at 0 and every bound
    // assertion vacuously true. collect() runs
    // df.queryExecution.executedPlan itself (outputs here are
    // sketch-sized), so the metrics read afterwards are the executed
    // ones — and the callers assert rows >= 1 so a zero-metric
    // regression fails loudly instead of passing silently.
    df.collect()
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Partial}
    var rows = 0L
    var nodes = 0
    def isPartial(aggExprs: Seq[AggregateExpression]) =
      aggExprs.nonEmpty && aggExprs.forall(_.mode == Partial)
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case r: ReusedExchangeExec => walk(r.child)
        case h: HashAggregateExec if isPartial(h.aggregateExpressions) =>
          rows += h.metrics("numOutputRows").value; nodes += 1
        case o: ObjectHashAggregateExec if isPartial(o.aggregateExpressions) =>
          rows += o.metrics("numOutputRows").value; nodes += 1
        case s: SortAggregateExec if isPartial(s.aggregateExpressions) =>
          rows += s.metrics("numOutputRows").value; nodes += 1
        case _ => ()
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    (rows, nodes)
  }

  private val parts = 8

  // 16k distinct tokens, one per row — the adversarial vocabulary for
  // any sketch that would shuffle per-distinct-key
  private lazy val wideDocs = spark.range(16000)
    .select(col("id").as("doc_id"),
      concat(lit("tok"), col("id")).as("text"))
    .repartition(parts)

  test("CountMin.counters: partial rows ≤ tasks × depth·width, not vocab") {
    val depth = 4; val width = 32 // sketch bound 128 ≪ 16k domain
    val (rows, nodes) = partialAggRows(
      CountMin.counters(wideDocs, depth, width))
    assert(nodes >= 1, "expected a partial aggregate in the plan")
    assert(rows >= 1, "zero executed partial rows — the metrics read is vacuous")
    val boundPerTask = depth.toLong * width
    assert(rows <= 32L * boundPerTask,
      s"partial emitted $rows rows — vocabulary-shaped, not sketch-shaped " +
        s"(bound ${32L * boundPerTask})")
    assert(rows < 16000L, s"partial rows $rows reached the 16k domain")
  }

  test("MisraGries sketch pass: partial rows = one summary per task") {
    val (rows, nodes) = partialAggRows(
      HeavyHitters.sketchPass(wideDocs, capacity = 64))
    assert(nodes >= 1)
    assert(rows >= 1, "zero executed partial rows — the metrics read is vacuous")
    // a global ObjectHashAggregate partial emits ONE buffer row per
    // task; 64 is a generous ceiling for 8 input partitions under AQE
    // coalescing — the failure mode guarded against is ~16k rows
    assert(rows <= 64L,
      s"MG partial emitted $rows rows — the summary is not riding the " +
        "partial aggregate")
  }

  test("MG summary content is capacity-bounded after the full merge") {
    val row = HeavyHitters.sketchPass(wideDocs, capacity = 64).head()
    val m = row.getStruct(0).getMap[String, Long](0)
    assert(m.size <= 64, s"merged summary holds ${m.size} > capacity entries")
  }

  test("joinSizeEstimate: both counter partials stay sketch-bounded") {
    val a = spark.range(12000).select(col("id").as("k")).repartition(parts)
    val b = spark.range(12000).select((col("id") + 6000L).as("k"))
      .repartition(parts)
    val est = CountMin.joinSizeEstimate(a, "k", b, "k", depth = 4, width = 32)
    val (rows, nodes) = partialAggRows(est)
    assert(nodes >= 2, "expected a partial aggregate per side")
    assert(rows >= 1, "zero executed partial rows — the metrics read is vacuous")
    // 2 sides × tasks × 128 cells, plus the tiny per-d/global folds
    assert(rows <= 2L * 32L * 128L + 1024L,
      s"counter partials emitted $rows rows — key-domain-shaped")
    assert(rows < 24000L, s"partial rows $rows reached the key domain")
  }
}
