package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) over the token
  * stream: point-frequency estimates for ARBITRARY query terms from a
  * fixed depth×width counter table — the complement of
  * [[HeavyHitters]] (which finds the top-k but can't answer "how often
  * does THIS term occur" for a term outside it).
  *
  * 100 TB shape: the only corpus-sized operation is one explode →
  * aggregate whose map-side partial combine collapses each task to at
  * most depth×width counter rows BEFORE the exchange — state and
  * shuffle are O(depth·width) regardless of vocabulary (the same
  * bounded-aggregation-state argument as the Misra–Gries pass, but the
  * sketch here is LINEAR: counters of a union are the cell-wise sum of
  * the parts, so per-source/per-day counter tables merge by addition —
  * the [[Ivm]] mergeable-state discipline; spec-pinned).
  *
  * Guarantee: estimates NEVER undercount, and overcount by more than
  * 2n/width with probability ≤ (1/2)^depth per query. Hashing is
  * md5("d:term") → first 12 hex digits → mod width — deliberately
  * engine-portable so an external SQL engine replays the identical
  * counter table and estimates (the oracle does).
  *
  * Reference: extends aeuc_vector_db's exact `stats()` counting
  * (vector_field.py:716 vicinity) to the approximate regime its data
  * model never needed; scoped per SURVEY.md §2.9 sketch family.
  */
object CountMin {

  /** Bucket of `term` for hash row `d`: md5("d:term") first 12 hex
    * digits as a non-negative long, mod `width`. String-identical to
    * the oracle's CAST('0x' || substr(md5(d || ':' || term), 1, 12)).
    */
  private def bucket(term: org.apache.spark.sql.Column, d: Int, width: Int) =
    pmod(conv(substring(md5(concat(lit(s"$d:"), term)), 1, 12), 16, 10)
      .cast("long"), lit(width.toLong))

  private def tokens(docs: DataFrame) =
    Partitioning.spread(docs)
      .select(explode(TextAnalysis.words(col("text"))).as("w"))

  /** The depth×width counter table (d, bucket, n) — at most
    * depth·width rows, LINEAR in the input (counters of a union equal
    * the cell-wise sum of the parts' counters). Absent cells mean 0.
    *
    * Streams as-is: on a `readStream` frame this plans as a streaming
    * aggregation whose full-history state is bounded at depth·width
    * keys BY CONSTRUCTION — no watermark needed, ever (StreamingSpec
    * runs it on RocksDB and pins state ≤ depth·width + batch parity).
    */
  def counters(docs: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    tokens(docs)
      .select(posexplode(array((0 until depth).map(d =>
        bucket(col("w"), d, width)): _*)).as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** Point estimates for `terms`: each term's estimate is the MIN over
    * its depth counters (missing cell = 0). Output (term, n_est)
    * sorted by term. The probe side is |terms|×depth rows joining the
    * bounded counter table — both sides tiny; the corpus is touched
    * exactly once, inside [[counters]].
    */
  def estimates(docs: DataFrame, terms: Seq[String],
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val probes = terms.toDF("term")
      .select(col("term"), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(col("term"), d, width).as("bucket"))): _*))
        .as("p"))
      .select(col("term"), col("p.d").as("d"), col("p.bucket").as("bucket"))
    probes.join(broadcast(counters(docs, depth, width)),
        Seq("d", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
      .orderBy(col("term"))
  }
}
