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

  /** Counter table over an arbitrary pre-projected single-string-column
    * frame (column `w`) — the generic core [[counters]] (tokens) and
    * [[joinSizeEstimate]] (join keys) share.
    */
  private[operators] def countersOf(vals: DataFrame, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    vals
      .select(posexplode(array((0 until depth).map(d =>
        bucket(col("w"), d, width)): _*)).as(Seq("d", "bucket")))
      .groupBy(col("d"), col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** The depth×width counter table (d, bucket, n) — at most
    * depth·width rows, LINEAR in the input (counters of a union equal
    * the cell-wise sum of the parts' counters). Absent cells mean 0.
    *
    * Streams as-is: on a `readStream` frame this plans as a streaming
    * aggregation whose full-history state is bounded at depth·width
    * keys BY CONSTRUCTION — no watermark needed, ever (StreamingSpec
    * runs it on RocksDB and pins state ≤ depth·width + batch parity).
    */
  def counters(docs: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame =
    countersOf(tokens(docs), depth, width)

  /** Equi-join output-size estimate WITHOUT performing the join — the
    * CMS inner product (Cormode & Muthukrishnan 2005 §4.2): per hash
    * row d, Σ_bucket nA·nB, then min over d. NEVER undercounts
    * |A ⋈ B| (collisions only add), so it is a safe planning bound:
    * "do not run this shuffle" decisions (salting, pre-aggregation,
    * broadcast refusal) made on the estimate are conservative. Each
    * side costs one bounded counter pass; the estimate itself is a
    * join of two ≤ depth·width tables. Self-joins (a = b on the same
    * key) estimate Σ n_k² — the shuffle-explosion number [[HeavyHitters.keySkew]]
    * diagnoses per-key. NULL keys are skipped on BOTH sides (equi-join
    * semantics: NULL never matches). Output: 1 row (n_est STRING — the
    * exact integer serialized as its digit string; consumers parse
    * with BigDecimal).
    *
    * Why a string and not DECIMAL(38,0): the value itself needs wide
    * decimal arithmetic (two 10^12-row sides put Σ nA·nB past long
    * range), but a DECIMAL(38,0) *output column* is the one type in
    * this contract whose concrete value representation differs across
    * parquet readers and SQL engines (fixed-point vs int128 vs
    * arbitrary-precision object), so a bit-stable correctness gate
    * that hashes rendered values cannot rely on it. A digit string is
    * identical everywhere. (CORRECTNESS_r09 forensics: the only two
    * red rows on the board were exactly the only two queries with a
    * DECIMAL(38,0) output column — this one and the advisor's
    * est_join_rows — green under a DuckDB-reads-both-sides compare,
    * red under the driver's reader; every internally-decimal,
    * double-rendered query was green under both.)
    */
  def joinSizeEstimate(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    def side(df: DataFrame, key: String) = countersOf(
      Partitioning.spread(df).select(col(key).cast("string").as("w"))
        .filter(col("w").isNotNull),
      depth, width)
    side(a, aKey).as("ca")
      .join(side(b, bKey).as("cb"), Seq("d", "bucket"))
      .groupBy(col("d"))
      // decimal product: two 10^12-row sides put nA·nB past long range
      .agg(sum(col("ca.n").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        * col("cb.n")).as("ip"))
      // an empty counter intersection means a provably-empty join
      .agg(coalesce(min(col("ip")), lit(0)).cast(
        org.apache.spark.sql.types.DecimalType(38, 0))
        .cast("string").as("n_est"))
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
