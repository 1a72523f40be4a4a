package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
  * 2002; the theta-sketch core): keep the k smallest DISTINCT hash
  * values of the stream; if fewer than k survive, the sketch IS the
  * distinct set (exact); otherwise the k-th smallest uniform u_(k)
  * estimates the distinct count as (k−1)/u_(k), with relative error
  * ~1/√(k−2).
  *
  * Why not `countDistinct`: exact distinct over a web-scale token
  * stream is itself a vocabulary-sized shuffle — the aggregation
  * state is the vocabulary. The KMV aggregator's state is k longs per
  * task, mergeable by union-then-truncate (the theta-sketch merge
  * law, spec-pinned), so the 1-row exchange carries k values however
  * large the vocabulary. Same bounded-state argument as
  * [[HeavyHitters]] (top-k) and [[CountMin]] (point frequencies) —
  * this completes the sketch family with distinct counting. Spark's
  * own `approx_count_distinct` (HLL++) answers the same question;
  * this one is ENGINE-PORTABLE: hashes are the md5-12 convention, so
  * the DuckDB oracle replays sketch and estimate bit-for-bit.
  */
object Kmv {

  /** Bounded bottom-k distinct aggregator over 48-bit hash longs. The
    * buffer is a sorted, distinct Vector capped at k — O(k) per task,
    * merge = merge-distinct-truncate.
    */
  class BottomK(k: Int) extends Aggregator[Long, Vector[Long], Vector[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")

    def zero: Vector[Long] = Vector.empty

    def reduce(b: Vector[Long], h: Long): Vector[Long] = {
      if (b.length == k && h >= b.last) b
      else {
        val i = searchInsert(b, h)
        if (i < b.length && b(i) == h) b
        else {
          val v = (b.take(i) :+ h) ++ b.drop(i)
          if (v.length > k) v.take(k) else v
        }
      }
    }

    def merge(x: Vector[Long], y: Vector[Long]): Vector[Long] = {
      // merge two sorted distinct runs, truncate at k
      val out = Vector.newBuilder[Long]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < x.length || j < y.length)) {
        val v =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) {
            val v = x(i); if (j < y.length && y(j) == v) j += 1; i += 1; v
          } else { val v = y(j); j += 1; v }
        out += v; n += 1
      }
      out.result()
    }

    def finish(r: Vector[Long]): Vector[Long] = r

    private def searchInsert(b: Vector[Long], h: Long): Int = {
      var lo = 0; var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }

    def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Long]]()
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[Long]]()
  }

  /** md5-12 hash of a string column as a long in [0, 16^12) — the
    * engine-portable convention every sketch here shares.
    */
  private[operators] def hash48(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  private val outSchema = StructType(Seq(
    StructField("k", LongType),
    StructField("sketch_size", LongType),
    StructField("n_est", DoubleType)))

  /** Distinct-count estimate over any single-string-column frame
    * (column `w`). Output 1 row (k, sketch_size, n_est): exact (the
    * sketch held everything) when sketch_size < k, else (k−1)/u_(k)
    * rounded to 6 dp — identical to the oracle's replay.
    */
  /** The corpus-sized pass as a standalone 1-row frame (sk = the
    * sorted bottom-k distinct hashes) — the plan to audit: partial
    * BottomK state below a SINGLE 1-row exchange, key-only scan.
    */
  def sketchPass(vals: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new BottomK(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    vals.select(hash48(col("w")).as("h")).agg(agg(col("h")).as("sk"))
  }

  def distinctEstimate(vals: DataFrame, k: Int = 1024): DataFrame = {
    val spark = vals.sparkSession
    val sk = sketchPass(vals, k).head().getSeq[Long](0)
    val est =
      if (sk.length < k) sk.length.toDouble
      else {
        // u_(k) = (h_(k) + 0.5) / 16^12, the md5-mantissa convention
        val uk = (sk.last.toDouble + 0.5) / math.pow(16.0, 12)
        BigDecimal((k - 1).toDouble / uk)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(k.toLong, sk.length.toLong, est)), 1), outSchema)
  }

  /** Distinct whitespace tokens of `docs.text`, estimated. */
  def distinctTokens(docs: DataFrame, k: Int = 1024): DataFrame =
    distinctEstimate(
      Partitioning.spread(docs)
        .select(explode(TextAnalysis.words(col("text"))).as("w")), k)

  /** Distinct values of any column, estimated (NULLs skipped — the
    * `countDistinct` convention).
    */
  def distinctValues(df: DataFrame, valueCol: String, k: Int = 1024): DataFrame =
    distinctEstimate(
      Partitioning.spread(df)
        .select(col(valueCol).cast("string").as("w"))
        .filter(col("w").isNotNull), k)

  private def keyed(df: DataFrame, valueCol: String) =
    Partitioning.spread(df)
      .select(col(valueCol).cast("string").as("w"))
      .filter(col("w").isNotNull)

  /** Theta-sketch set operations between two keyed sets from their
    * sketches alone (Dasgupta et al. 2016): the union sketch is the
    * merge of the two bottom-ks; with θ = u_(k) of the union,
    * |A∪B| ≈ (k−1)/θ, J(A,B) ≈ |{h ∈ union sketch : h ∈ A_sk ∧
    * h ∈ B_sk}| / k, and |A∩B| = J · |A∪B|. Each input pays ONE
    * bounded sketch pass; everything after runs on ≤ k driver-side
    * longs. When the union fits below k the sketches ARE the sets and
    * all three outputs are exact. Output 1 row (k, union_est,
    * jaccard_est 6-dp, intersect_est) — intersect rounded HALF_UP to
    * 6 dp like its factors, so the oracle's replay matches exactly.
    */
  def overlapEstimate(a: DataFrame, aCol: String,
      b: DataFrame, bCol: String, k: Int = 1024): DataFrame = {
    val spark = a.sparkSession
    val agg = new BottomK(k)
    val skA = sketchPass(keyed(a, aCol), k).head().getSeq[Long](0).toVector
    val skB = sketchPass(keyed(b, bCol), k).head().getSeq[Long](0).toVector
    val union = agg.merge(skA, skB)
    val (setA, setB) = (skA.toSet, skB.toSet)
    val exact = union.length < k
    val unionEst =
      if (exact) union.length.toDouble
      else {
        val theta = (union.last.toDouble + 0.5) / math.pow(16.0, 12)
        BigDecimal((k - 1).toDouble / theta)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    val inBoth = union.count(h => setA(h) && setB(h))
    val denom = if (exact) union.length else k
    val jaccard =
      if (denom == 0) 0.0
      else BigDecimal(inBoth.toDouble / denom)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val intersect = BigDecimal(jaccard * unionEst)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(
        k.toLong, unionEst, jaccard, intersect)), 1),
      StructType(Seq(
        StructField("k", LongType),
        StructField("union_est", DoubleType),
        StructField("jaccard_est", DoubleType),
        StructField("intersect_est", DoubleType))))
  }

  /** Pairwise Jaccard / union / intersection estimates between EVERY
    * pair of groups from ONE bounded sketch pass — the per-group form
    * of [[overlapEstimate]] (which answers one pair from two passes).
    * The corpus-sized work is a single groupBy(group) BottomK
    * aggregation (partial state k longs per task per group); the
    * sketches collect to the driver (bounded: ≤ maxGroups × k longs —
    * the centroid-dump discipline, enforced IN-PLAN by a
    * limit(maxGroups + 1) on the transfer, so an over-cap group
    * column fails loudly without shipping its domain) and the
    * ≤ C(groups, 2)
    * pair readouts run on k-long vectors with the same theta-sketch
    * math, rounding and exact-below-k semantics as overlapEstimate.
    * Output (group_a < group_b, ordered): k, union_est, jaccard_est,
    * intersect_est — all 6-dp, oracle-replayable (md5-12 hashes).
    */
  /** The bounded transfer frame behind [[groupedJaccard]] — exposed so
    * the cap ORDERING is spec-pinnable. The maxGroups bound must hold
    * BEFORE the driver transfer, not be audited after it:
    * limit(maxGroups + 1) caps the collect at the PLAN level
    * (CollectLimit), so a high-cardinality group column (user_id, URL
    * host) ships at most one sketch row over the cap instead of the
    * whole domain — the executors still compute every group's partial
    * state, but the driver never materializes more than the bound.
    * Within the cap, limit returns ALL groups (order irrelevant: the
    * readout sorts), so the green path is unchanged.
    */
  private[graft] def groupSketches(df: DataFrame, groupCol: String,
      valueCol: String, k: Int, maxGroups: Int): DataFrame = {
    val agg = udaf(new BottomK(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
    Partitioning.spread(df)
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        hash48(col(valueCol).cast("string")).as("h"))
      .groupBy(col("g")).agg(agg(col("h")).as("sk"))
      .limit(maxGroups + 1)
  }

  def groupedJaccard(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256, maxGroups: Int = 1024): DataFrame = {
    require(maxGroups >= 2, s"maxGroups must be >= 2, got $maxGroups")
    val spark = df.sparkSession
    val rows = groupSketches(df, groupCol, valueCol, k, maxGroups).collect()
    require(rows.length <= maxGroups,
      s"groupedJaccard: over $maxGroups groups (maxGroups) " +
        "- the sketch table must stay driver-bounded; raise the cap " +
        "knowingly or pre-bucket the group column")
    val sketches = rows.map(r => r.getString(0) -> r.getSeq[Long](1).toVector)
      .sortBy(_._1)
    val merger = new BottomK(k)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (ga, sa) = sketches(i)
      val (gb, sb) = sketches(j)
      val union = merger.merge(sa, sb)
      val exact = union.length < k
      val unionEst =
        if (exact) union.length.toDouble
        else r6((k - 1).toDouble /
          ((union.last.toDouble + 0.5) / math.pow(16.0, 12)))
      val (setA, setB) = (sa.toSet, sb.toSet)
      val inBoth = union.count(h => setA(h) && setB(h))
      val denom = if (exact) union.length else k
      val jaccard = if (denom == 0) 0.0 else r6(inBoth.toDouble / denom)
      val intersect = r6(jaccard * unionEst)
      Row(ga, gb, k.toLong, unionEst, jaccard, intersect)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("group_a", org.apache.spark.sql.types.StringType),
        StructField("group_b", org.apache.spark.sql.types.StringType),
        StructField("k", LongType),
        StructField("union_est", DoubleType),
        StructField("jaccard_est", DoubleType),
        StructField("intersect_est", DoubleType))))
  }

  /** DIRECTIONAL containment between every pair of groups from the
    * same ONE bounded sketch pass as [[groupedJaccard]]:
    * C(A→B) = |A∩B| / |A| — the asymmetric statistic Jaccard hides.
    * A source whose vocabulary sits nearly wholly inside another's
    * (a re-crawl, a filtered mirror, a subset dump) shows Jaccard
    * ≈ |A|/|B| (small when B is big) but containment(A→B) ≈ 1 — the
    * "this source is redundant, drop it" planning signal, the GROUP
    * form of the per-document geometry [[Dedup.containmentPairs]]
    * catches. Estimates: per-group cardinality from each group's own
    * sketch (exact below k, else the (k−1)/θ theta-sketch lane),
    * intersection = jaccard_est × union_est exactly as the sibling,
    * containments = intersect_est / own_est — every factor 6-dp-
    * rounded before the next product/division, so the DuckDB oracle
    * replays bit-for-bit. Output per ordered pair: k, a_est, b_est,
    * intersect_est, contain_a_in_b, contain_b_in_a (estimates may
    * exceed 1 by estimator noise — left raw, an estimator should not
    * silently clamp its own error).
    *
    * Shape at 100 TB: identical to [[groupedJaccard]] — the corpus
    * crosses one groupBy(group) BottomK exchange, the driver transfer
    * is plan-capped at maxGroups + 1 sketch rows, the pair readout is
    * driver-local on ≤ C(groups, 2) k-long vectors.
    */
  def groupedContainment(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256, maxGroups: Int = 1024): DataFrame = {
    require(maxGroups >= 2, s"maxGroups must be >= 2, got $maxGroups")
    val spark = df.sparkSession
    val rows = groupSketches(df, groupCol, valueCol, k, maxGroups).collect()
    require(rows.length <= maxGroups,
      s"groupedContainment: over $maxGroups groups (maxGroups) " +
        "- the sketch table must stay driver-bounded; raise the cap " +
        "knowingly or pre-bucket the group column")
    val sketches = rows.map(r => r.getString(0) -> r.getSeq[Long](1).toVector)
      .sortBy(_._1)
    val merger = new BottomK(k)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cardEst(s: Vector[Long]): Double =
      if (s.length < k) s.length.toDouble
      else r6((k - 1).toDouble / ((s.last.toDouble + 0.5) / math.pow(16.0, 12)))
    val out = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
    } yield {
      val (ga, sa) = sketches(i)
      val (gb, sb) = sketches(j)
      val union = merger.merge(sa, sb)
      val exact = union.length < k
      val unionEst =
        if (exact) union.length.toDouble
        else r6((k - 1).toDouble /
          ((union.last.toDouble + 0.5) / math.pow(16.0, 12)))
      val (setA, setB) = (sa.toSet, sb.toSet)
      val inBoth = union.count(h => setA(h) && setB(h))
      val denom = if (exact) union.length else k
      val jaccard = if (denom == 0) 0.0 else r6(inBoth.toDouble / denom)
      val intersect = r6(jaccard * unionEst)
      val (aEst, bEst) = (cardEst(sa), cardEst(sb))
      Row(ga, gb, k.toLong, aEst, bEst, intersect,
        r6(intersect / aEst), r6(intersect / bEst))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("group_a", org.apache.spark.sql.types.StringType),
        StructField("group_b", org.apache.spark.sql.types.StringType),
        StructField("k", LongType),
        StructField("a_est", DoubleType),
        StructField("b_est", DoubleType),
        StructField("intersect_est", DoubleType),
        StructField("contain_a_in_b", DoubleType),
        StructField("contain_b_in_a", DoubleType))))
  }
}
