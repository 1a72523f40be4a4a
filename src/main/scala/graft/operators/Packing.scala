package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-size token windows
  * for training (concat-and-chunk: the corpus is laid out as one token
  * stream per shard and cut every `windowTokens` tokens; documents may
  * straddle a cut, exactly as GPT-style pretraining packs them).
  *
  * Determinism contract: a document's (shard, pack_id, offset) depends
  * only on doc ids and texts — shard and in-shard order both derive
  * from sha256(doc_id), so the layout is a replayable global shuffle,
  * not a `rand()` that moves every run.
  *
  * Shape at 100 TB: ONE shuffle, to `numShards` hash partitions, then a
  * per-shard ordered running sum. The window function partitions by
  * shard — there is deliberately NO global ordering (a single
  * `Window.orderBy` with no partition key collapses the whole corpus
  * into one task). Shards are the unit of parallelism AND the unit of
  * output (one training file each): size `numShards` so a shard's
  * token stream fits one task comfortably — at 100 TB that is simply a
  * larger `numShards`, the plan does not change.
  */
object Packing {

  /** Per-document window assignment: `shard`, `ord` (in-shard rank
    * hash), `n_tokens`, `pack_id` (first window the doc touches),
    * `off` (token offset inside that window), `n_windows` (how many
    * windows the doc spans — >1 means it straddles cuts).
    */
  def packWindows(docs: DataFrame, windowTokens: Int, numShards: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    require(numShards > 0, "numShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = col("cum") - col("n_tokens")
    docs
      .select(col("doc_id"),
        // shard = the shared 60-bit mixing hash mod shards; the full hex
        // string is the in-shard sort key (lowercase hex sorts the
        // same everywhere ASCII does)
        pmod(Sampling.hash60(col("doc_id")), lit(numShards.toLong)).as("shard"),
        sha2(col("doc_id").cast("string"), 256).as("ord"),
        size(TextAnalysis.words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("ord"), col("n_tokens"),
        // long-to-long floor division via double is exact here: token
        // offsets sit far below 2^53
        floor(start / lit(windowTokens.toDouble)).cast("long").as("pack_id"),
        pmod(start, lit(windowTokens.toLong)).as("off"),
        (floor((col("cum") - 1) / lit(windowTokens.toDouble)).cast("long")
          - floor(start / lit(windowTokens.toDouble)).cast("long") + 1L)
          .as("n_windows"))
  }

  /** Per-shard packing report: document/token totals, how many windows
    * the shard cuts into, and the straddle count — the numbers that
    * size training files and measure cut overhead.
    */
  def packSummary(docs: DataFrame, windowTokens: Int, numShards: Int): DataFrame =
    packWindows(docs, windowTokens, numShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("n_windows") > 1, 1L).otherwise(0L)).as("n_straddling"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        // ceil(total / W): the shard's stream cuts into this many windows
        (floor((col("n_tokens") - 1) / lit(windowTokens.toDouble)).cast("long") + 1L)
          .as("n_packs"),
        col("n_straddling"))
      .orderBy(col("shard"))
}
