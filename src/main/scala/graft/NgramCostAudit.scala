package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Partitioning}

/** Stage-level cost breakdown for `dedup_ngram_jaccard` (round-13
  * verdict #4): where the board's seconds go — shingling, the df
  * ordering aggregate, prefix candidate generation, the size prune,
  * the exact verify, or the readout sort. Times CUMULATIVE plan
  * prefixes (cache cleared before every run, min of 2), so a stage's
  * own cost is the successive difference; the stages mirror
  * `Dedup.ngramJaccardCore` stage-for-stage and drift is pinned by a
  * final count-parity assert against the public operator.
  *
  * Not part of the driver contract.
  */
object NgramCostAudit {
  private val ThresholdEps = 1e-7
  // mirrors Dedup.RoundHalfWidth: the filters stay lossless down to the
  // 6-dp round-up window the exact verify admits
  private val RoundHalfWidth = 5e-7

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = args.drop(1).headOption.map(_.toDouble).getOrElse(0.5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("ngram-cost-audit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def bestOf2(f: => Unit): Double = {
      def once = {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }

    // ---- the ngramJaccardCore stages, replicated for instrumentation
    def docShF: DataFrame = Partitioning.spread(docs)
      .select(col("doc_id"), Dedup.shingleArray(col("text"), 3).as("sh"))
      .filter(size(col("sh")) >= 1)
    def invOf(docSh: DataFrame) =
      docSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    def sortedOf(docSh: DataFrame): DataFrame = {
      val inv = invOf(docSh)
      val dfAgg = inv.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      inv.join(dfAgg, "shingle")
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("df"), col("shingle")))).as("ds"))
        .select(col("doc_id"),
          transform(col("ds"), e => e.getField("shingle")).as("sh"),
          size(col("ds")).as("n_sh"))
        .withColumn("p",
          (col("n_sh") - ceil(lit(t - RoundHalfWidth) * col("n_sh")
            - lit(ThresholdEps)) + 1).cast("int"))
    }
    def candidatesOf(sorted: DataFrame): DataFrame = {
      val prefix = sorted.select(col("doc_id"),
        explode(slice(col("sh"), lit(1), col("p"))).as("shingle"))
      prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
    }
    def sizedOf(candidates: DataFrame, sorted: DataFrame): DataFrame = {
      val sizes = sorted.select(col("doc_id"), col("n_sh"))
      candidates
        .join(sizes.toDF("doc_a", "na"), "doc_a")
        .join(sizes.toDF("doc_b", "nb"), "doc_b")
        .filter(col("nb") >= lit(t - RoundHalfWidth) * col("na")
            - lit(ThresholdEps) &&
          col("na") >= lit(t - RoundHalfWidth) * col("nb")
            - lit(ThresholdEps))
        .select(col("doc_a"), col("doc_b"))
    }

    println(f"== ngram cost audit: $sfDir t=$t (cumulative plan prefixes, min of 2)")
    var nCand = 0L; var nSized = 0L; var nPairs = 0L
    val tShingle = bestOf2 { docShF.cache().count() }
    val tSorted = bestOf2 {
      val d = docShF.cache(); sortedOf(d).cache().count() }
    val tCand = bestOf2 {
      val d = docShF.cache(); val s = sortedOf(d).cache()
      nCand = candidatesOf(s).count() }
    val tSized = bestOf2 {
      val d = docShF.cache(); val s = sortedOf(d).cache()
      nSized = sizedOf(candidatesOf(s), s).count() }
    val tFull = bestOf2 {
      nPairs = Dedup.ngramJaccardPairs(docs, t).count() }
    val tFullSorted = bestOf2 {
      Dedup.ngramJaccardPairs(docs, t).collect() }
    println(f"shingle+cache        $tShingle%7.2f s  (cum)")
    println(f"+ df-sorted arrays   $tSorted%7.2f s  (stage ${tSorted - tShingle}%+.2f)")
    println(f"+ prefix candidates  $tCand%7.2f s  (stage ${tCand - tSorted}%+.2f, $nCand%,d rows)")
    println(f"+ size-ratio prune   $tSized%7.2f s  (stage ${tSized - tCand}%+.2f, $nSized%,d rows)")
    println(f"+ exact verify       $tFull%7.2f s  (stage ${tFull - tSized}%+.2f, $nPairs%,d pairs)")
    println(f"+ readout sort       $tFullSorted%7.2f s  (stage ${tFullSorted - tFull}%+.2f)")
    // count-parity assert (the scaladoc's drift pin, round-13 advice):
    // the exact verify over the REPLICA's pruned candidates must yield
    // exactly the public operator's pair count — any drift between the
    // instrumented stages and Dedup.ngramJaccardCore fails loudly here
    val replicaPairs = {
      spark.sharedState.cacheManager.clearCache()
      val d = docShF.cache(); val s = sortedOf(d).cache()
      val sets = s.select(col("doc_id"), col("sh"))
      sizedOf(candidatesOf(s), s)
        .join(sets.toDF("doc_a", "sha"), "doc_a")
        .join(sets.toDF("doc_b", "shb"), "doc_b")
        .filter(round(
          size(array_intersect(col("sha"), col("shb"))).cast("double") /
            size(array_union(col("sha"), col("shb"))).cast("double"), 6)
          >= t)
        .count()
    }
    require(replicaPairs == nPairs,
      s"stage replica drifted from Dedup.ngramJaccardPairs: " +
        s"replica verified $replicaPairs pairs, public operator $nPairs")
    println(s"count-parity assert: replica == public operator ($nPairs pairs)")
    spark.stop()
  }
}
