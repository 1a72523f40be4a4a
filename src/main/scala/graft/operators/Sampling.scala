package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic source-mixture sampling — the "data mixing" step that
  * reweights a corpus's sources before training (up/down-sampling web
  * text vs books vs code, Pile/Dolma-style).
  *
  * Each document gets a content-stable uniform draw
  * `u = (first 60 bits of sha256(doc_id)) / 2^60` and survives iff
  * `u < weight(source)`. Hash-based draws — not `rand()` — because the
  * decision must be REPLAYABLE: the same document samples the same way
  * on every run, across retries, and across engines (the oracle
  * recomputes the identical draw in SQL), and the sample composes with
  * incremental ingest (new docs don't reshuffle old decisions). A
  * weight > 1 is capped by the u < w comparison at "always keep"
  * (upsampling by repetition is a separate, explicit step — silently
  * duplicating rows inside a sampler would corrupt dedup semantics
  * downstream).
  *
  * Shape at 100 TB: one narrow projection — no shuffle, no state, no
  * driver involvement; the weight map is a literal when-chain.
  */
object Sampling {

  /** 2^60 as an exact double (60 < 53-bit mantissa range of powers of
    * two — exact), matching the oracle's literal.
    */
  private val TwoPow60 = 1152921504606846976.0

  /** The per-document uniform draw in [0, 1): 60 bits of sha256 parsed
    * base-16 — the same slice-and-parse both engines fold bit-equally.
    */
  def uniformDraw(docId: Column): Column =
    conv(substring(sha2(docId.cast("string"), 256), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(TwoPow60)

  /** Per-doc sampling verdict: adds `u`, `w`, `sampled`. */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
      defaultWeight: Double): DataFrame = {
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (src, wt)) => when(col("source") === src, lit(wt)).otherwise(acc)
    }
    docs.withColumn("u", uniformDraw(col("doc_id")))
      .withColumn("w", w)
      .withColumn("sampled", col("u") < col("w"))
  }

  /** Per-source mixture report: how many docs each source keeps under
    * the weights, with the observed rate (converges to the weight as
    * the source grows — the sanity number a pipeline owner checks).
    */
  def mixtureSummary(docs: DataFrame, weights: Map[String, Double],
      defaultWeight: Double): DataFrame =
    mixtureSample(docs, weights, defaultWeight)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
        round(min(col("w")), 6).as("weight"))
      .select(col("source"), col("n_docs"), col("n_sampled"), col("weight"),
        round(col("n_sampled").cast("double") / col("n_docs"), 6).as("rate"))
      .orderBy(col("source"))
}
