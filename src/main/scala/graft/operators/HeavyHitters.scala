package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Exact top-k frequent tokens at corpus scale via the TWO-PASS
  * heavy-hitters scheme: (1) a mergeable Misra–Gries summary finds a
  * bounded candidate set in one pass with O(capacity) state per task —
  * never a vocabulary-sized aggregation; (2) an exact recount of the
  * candidates only (a filter + map-side-combined count bounded by
  * |candidates|) makes the final top-k EXACT, with the exactness
  * precondition CHECKED, not trusted.
  *
  * Why this beats the naive `groupBy(word).count.orderBy.limit(k)` at
  * 100 TB: the naive plan shuffles one row per DISTINCT word — web-
  * scale vocabularies (URLs, hashes, typos) reach billions of keys, so
  * aggregation state and exchange scale with the vocabulary, not with
  * k. Here pass 1's aggregation state is a fixed `capacity`-entry
  * summary per task (the partial aggregate IS the sketch; merges stay
  * bounded — the same mergeable-state idea as [[Ivm]]), and pass 2
  * touches only candidate rows.
  *
  * Guarantee (Misra–Gries 1982; merge rule per Agarwal et al. 2012,
  * "Mergeable Summaries"): the summary undercounts any item by at most
  * n/(capacity+1), and an item with true count > n/(capacity+1) is
  * ALWAYS retained. Hence if the exact k-th candidate count exceeds
  * n/(capacity+1), no non-candidate can belong in the top-k and the
  * result is exact — [[topTokens]] verifies exactly that inequality
  * (and short-circuits it when the sketch provably never evicted, in
  * which case the candidate set IS the vocabulary) and fails loudly
  * (raise capacity) instead of silently returning an approximate list.
  */
object HeavyHitters {

  /** Mergeable Misra–Gries summary over strings. The buffer is
    * (summary, evicted): `evicted` records whether any eviction /
    * merge offset ever fired — false means the summary holds the FULL
    * vocabulary and exactness needs no bound check. The buffer map is
    * immutable (persistent O(log) updates; the udaf wrapper keeps it
    * as a JVM object inside a partition and only encodes it across the
    * exchange). The decrement-all step is O(capacity) but fires at
    * most once per (capacity+1) inserts — amortized O(1) per row.
    */
  class MisraGries(capacity: Int)
      extends Aggregator[String, (Map[String, Long], Boolean),
        (Map[String, Long], Boolean)] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    def zero: (Map[String, Long], Boolean) = (Map.empty, false)

    def reduce(b: (Map[String, Long], Boolean),
        w: String): (Map[String, Long], Boolean) = {
      if (w == null) return b
      val (m, ev) = b
      m.get(w) match {
        case Some(c) => (m.updated(w, c + 1L), ev)
        case None if m.size < capacity => (m.updated(w, 1L), ev)
        case None =>
          // classic MG: the new item's +1 cancels against a global −1
          (m.iterator.collect { case (k, c) if c > 1L => (k, c - 1L) }.toMap,
            true)
      }
    }

    def merge(x: (Map[String, Long], Boolean),
        y: (Map[String, Long], Boolean)): (Map[String, Long], Boolean) = {
      val combined = y._1.foldLeft(x._1) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      val ev = x._2 || y._2
      if (combined.size <= capacity) (combined, ev)
      else {
        // subtract the (capacity+1)-th largest count from everything,
        // drop the non-positive — the mergeable-summaries offset rule
        val cut = combined.valuesIterator.toArray.sortBy(-_).apply(capacity)
        (combined.iterator.collect {
          case (k, c) if c > cut => (k, c - cut)
        }.toMap, true)
      }
    }

    def finish(r: (Map[String, Long], Boolean)): (Map[String, Long], Boolean) = r

    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Map[String, Long], Boolean)]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Map[String, Long], Boolean)]()
  }

  private val outSchema = StructType(Seq(
    StructField("rank", IntegerType),
    StructField("word", StringType),
    StructField("n", LongType)))

  private def tokens(docs: DataFrame) =
    Partitioning.spread(docs)
      .select(explode(TextAnalysis.words(col("text"))).as("w"))

  /** Pass 1 as a standalone 1-row frame (cand = (summary, evicted),
    * n_total): the sketch and the total token count share one scan,
    * and the aggregation state per task is the fixed `capacity`-entry
    * summary — the plan to audit is ObjectHashAggregate with a partial
    * side below a SINGLE 1-row exchange, never a per-word shuffle.
    */
  def sketchPass(docs: DataFrame, capacity: Int): DataFrame = {
    val mg = udaf(new MisraGries(capacity),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    tokens(docs).agg(mg(col("w")).as("cand"), count(lit(1)).as("n_total"))
  }

  /** The generic two-pass core over any single-string-column frame
    * (column `w`): returns the checked exact top-k as (value, count)
    * in (n desc, value asc) order, plus the total row count. Shared by
    * [[topTokens]] (token frequencies) and [[keySkew]] (join/group key
    * multiplicities — the direct input to a salting decision).
    */
  private def topOf(vals: DataFrame, k: Int,
      capacity: Int): (IndexedSeq[(String, Long)], Long) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(capacity >= k,
      s"capacity $capacity must be >= k $k (candidates must cover the top-k)")
    val mg = udaf(new MisraGries(capacity),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val row = vals.agg(mg(col("w")).as("cand"), count(lit(1)).as("n_total")).head()
    val sketch = row.getStruct(0)
    val cands = sketch.getMap[String, Long](0).keys.toSeq
    val evicted = sketch.getBoolean(1)
    val nTotal = row.getLong(1)
    if (cands.isEmpty) {
      // an EVICTED-empty sketch proves nothing (the offset rule can
      // drop every counter on a diffuse vocabulary) — refuse; a truly
      // empty corpus (never evicted, nothing seen) is a real empty
      if (evicted) throw new IllegalStateException(
        "HeavyHitters: the summary evicted down to empty - " +
          s"no count can be proven (n=$nTotal, capacity=$capacity). " +
          "Raise capacity.")
      return (IndexedSeq.empty, nTotal)
    }
    // pass 2: exact counts of the bounded candidate set only
    val topK = vals.filter(col("w").isin(cands: _*))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(k)
      .collect()
    // exactness precondition, CHECKED: if the sketch never evicted the
    // candidates ARE the vocabulary; otherwise every true top-k item
    // must provably be a candidate — MG retains anything with count >
    // n/(capacity+1), so the k-th candidate count must beat that bound
    // (and a short candidate list under eviction proves nothing).
    val bound = nTotal.toDouble / (capacity + 1).toDouble
    if (evicted &&
        (topK.length < k || topK.last.getLong(1).toDouble <= bound))
      throw new IllegalStateException(
        "HeavyHitters: the top-k is not provably exact - " +
          s"k-th candidate count ${topK.lastOption.map(_.getLong(1))} vs the " +
          s"Misra-Gries undercount bound n/(capacity+1) = $bound " +
          s"(n=$nTotal, capacity=$capacity, candidates=${cands.size}). " +
          "Raise capacity.")
    (topK.toIndexedSeq.map(r => (r.getString(0), r.getLong(1))), nTotal)
  }

  /** Deterministic exact-or-refuse top-1 over a single-string-column
    * frame (column `w`, NULLs already excluded by the caller) — the
    * skew lane [[graft.operators.Joins.joinAdvisor]] builds on.
    * Returns `(Some((key, n)), nTotal)` when the exact global top-1 is
    * provable from the sketch, `(None, nTotal)` otherwise.
    *
    * Unlike [[topOf]] (which THROWS on an unprovable top-k, the right
    * contract for a report), this is a total function with a lane
    * predicate that is PROVABLY independent of Misra–Gries merge
    * order — the advisor's exact-vs-bound branch must not flip
    * run-to-run with shuffle fetch order. Proof: let M be the true
    * max key count and B = n/(capacity+1) the MG retention bound
    * (any key with count > B is retained under EVERY merge order —
    * Agarwal et al. 2012, Mergeable Summaries). Let m be the recounted
    * max over the (merge-order-dependent) candidate set.
    *   - If M > B: every argmax key is retained, so m = M > B and the
    *     recount's (n desc, key asc) tie-break sees ALL keys of count
    *     M — the returned (key, n) is the exact global top-1, the
    *     same under every merge order.
    *   - If M ≤ B: m ≤ M ≤ B for every merge order (an empty evicted
    *     candidate set lands here too).
    * Hence the branch `m > B` equals `M > B`, a property of the DATA
    * alone; the candidate-set variability lives entirely inside the
    * refused lane, where no candidate content is reported. The
    * comparison is done in exact integer arithmetic
    * (m·(capacity+1) > n) so no floating-point rounding sits on the
    * boundary.
    */
  def provableTop1(vals: DataFrame, capacity: Int = 4096)
      : (Option[(String, Long)], Long) = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val mg = udaf(new MisraGries(capacity),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val row = vals.agg(mg(col("w")).as("cand"), count(lit(1)).as("n_total")).head()
    val cands = row.getStruct(0).getMap[String, Long](0).keys.toSeq
    val nTotal = row.getLong(1)
    if (nTotal == 0L || cands.isEmpty) return (None, nTotal)
    val top = vals.filter(col("w").isin(cands: _*))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(1).head()
    val m = top.getLong(1)
    if (BigInt(m) * (capacity + 1) > BigInt(nTotal))
      (Some((top.getString(0), m)), nTotal)
    else (None, nTotal)
  }

  /** Exact top-k whitespace tokens of `docs.text`: MG candidates →
    * exact candidate recount → checked top-k. Output (rank, word, n),
    * rank 1-based with (n desc, word asc) total order — identical to
    * the exact `groupBy + orderBy + limit` the oracle states.
    *
    * Driver state is bounded by `capacity` (the candidate list and the
    * ≤ k recounted head — the bounded-collect discipline of the
    * k-means centroid dump).
    */
  def topTokens(docs: DataFrame, k: Int, capacity: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    val (top, _) = topOf(tokens(docs), k, capacity)
    // topOf's order already carries rank — no single-partition window
    val ranked = top.zipWithIndex.map { case ((w, n), i) => Row(i + 1, w, n) }
    spark.createDataFrame(spark.sparkContext.parallelize(ranked, 1), outSchema)
  }

  /** Join/group-key skew report: the exact top-k heaviest values of
    * `keyCol` with their multiplicity and share of all rows — the
    * number that decides whether a shuffle on this key needs salting
    * (a key with share ≫ 1/shufflePartitions is a straggler task).
    * Same checked two-pass scheme, so it works on key domains far too
    * large to groupBy-count outright (user ids, URLs). Output
    * (rank, key_value, n, share_pct 6-dp), (n desc, key asc) order;
    * NULL keys count under the literal "(null)" so a null-skew bomb
    * (the classic outer-join hazard) is visible, not dropped.
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10,
      capacity: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    val vals = Partitioning.spread(df)
      .select(coalesce(col(keyCol).cast("string"), lit("(null)")).as("w"))
    val (top, nTotal) = topOf(vals, k, capacity)
    // exact rational → 6-dp HALF_UP, identical to the oracle's
    // round(n * 100 / total, 6) on the same exact inputs
    val ranked = top.zipWithIndex.map { case ((v, n), i) =>
      Row(i + 1, v, n, (BigDecimal(n) * 100 / BigDecimal(nTotal))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(ranked, 1),
      StructType(Seq(
        StructField("rank", IntegerType),
        StructField("key_value", StringType),
        StructField("n", LongType),
        StructField("share_pct", org.apache.spark.sql.types.DoubleType))))
  }
}
