package graft

import org.apache.spark.sql.SparkSession

/** The engine's SQL surface — the SURVEY §1.1/§7.1 commitment that
  * "every operation is also SQL-reachable": register the test tables as
  * temp views and the graftx native expressions in the session function
  * registry, so the flagship queries run as plain `spark.sql` strings
  * (see [[SqlSurface]] for the contract queries expressed that way, and
  * [[VectorFieldDB.registerViews]] for the managed stores).
  *
  * Idempotent and cheap: `createOrReplaceTempView` binds a lazy plan
  * (one parquet footer read per table, no scan), and re-registering a
  * function overwrites the previous binding. Cluster-wide registration
  * without code goes through the standard extensions config instead:
  * `--conf spark.sql.extensions=org.apache.spark.sql.graftx.GraftExtensions`.
  */
object Views {

  /** Relational test tables (TESTDATA.md star schema). */
  val relationalTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  // last-registered dir per session (identity — sessions aren't values):
  // a contract query calls register() on every invocation, and without
  // the memo each call would pay ten parquet footer reads just to
  // rebind identical views
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  /** Register every test table under `dir` as a temp view (the three
    * encoding-quirky tables go through their central [[sources.Tables]]
    * readers, so SQL users see the same normalized schema the
    * DataFrame API does) and register the graftx function set
    * (`vec_dot`, `vec_cosine_sim`, `vec_euclidean_dist`,
    * `vec_euclidean_sim`, `vec_phi_sim`, `vec_sq_dist`,
    * `nfc_normalize`). No-op when this session already has `dir`
    * registered.
    */
  def register(s: SparkSession, dir: String): Unit = {
    val key = Integer.valueOf(System.identityHashCode(s))
    if (registeredDir.get(key) != dir) {
      org.apache.spark.sql.graftx.GraftFunctions.register(s)
      // the bounded top-k UDAF as a SQL function: per-group top-k with
      // map-side partial aggregation (k rows per partition cross the
      // shuffle — never a per-group sort of the full candidate list).
      // UDAF registration fixes k at registration time, so the common
      // contract arities get named variants.
      import org.apache.spark.sql.functions.udaf
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      for (k <- Seq(1, 3, 5, 10))
        s.udf.register(s"topk${k}_pairs",
          udaf(new graft.operators.Search.TopKAgg(k),
            ExpressionEncoder[(Long, Double)]()))
      // the bounded-state sketch aggregators as SQL functions: the
      // engine-path sketches (not just their pure-SQL readout
      // replays) are reachable from raw spark.sql — same
      // fixed-at-registration arity convention as topk
      for (c <- Seq(64, 1024))
        s.udf.register(s"mg_sketch_$c",
          udaf(new graft.operators.HeavyHitters.MisraGries(c),
            ExpressionEncoder[String]()))
      for (k <- Seq(64, 256, 1024))
        s.udf.register(s"kmv_sketch_$k",
          udaf(new graft.operators.Kmv.BottomK(k),
            ExpressionEncoder[Long]()))
      sources.Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
      sources.Tables.documents(s, dir).createOrReplaceTempView("documents")
      sources.Tables.events(s, dir).createOrReplaceTempView("events")
      relationalTables.foreach(t =>
        sources.Tables.table(s, dir, t).createOrReplaceTempView(t))
      registeredDir.put(key, dir)
    }
  }
}
