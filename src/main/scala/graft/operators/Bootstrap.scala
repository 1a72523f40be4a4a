package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Poisson bootstrap confidence intervals — THE bootstrap that scales:
  * classic resampling draws n rows with replacement per replicate
  * (B shuffles of the corpus); the Poisson bootstrap (Chamandy et al.
  * 2012, "Estimating Uncertainty for Massive Data Streams" — the
  * big-data A/B standard) gives every row an independent Poisson(1)
  * weight per replicate instead, because Binomial(n, 1/n) → Poisson(1)
  * as n grows. One weighted pass computes ALL replicates: the per-row
  * explode fans to B (rep, w·x, w) triples whose map-side partial
  * combine collapses each task to B rows before the one exchange —
  * replicate means, and the CI, then cost O(B) regardless of corpus
  * size. No resampling shuffle exists anywhere. (The point estimate
  * adds one plain unweighted aggregate — two scans total, both
  * shuffle-free below their 1-row folds.)
  *
  * Determinism: the per-(row, rep) uniform draw is the repo's
  * md5-mantissa convention (same as [[Sampling.uniformDraw]]'s
  * sha-based cousin but md5-12 so the oracle replays it byte-for-
  * byte), pushed through the Poisson(1) inverse CDF as a literal
  * when-chain — both engines compare the SAME doubles against the
  * SAME literals, so weights, replicate means (one division, 6-dp
  * round), and the interpolated percentile CI agree exactly.
  *
  * Statistical caveat, stated not hidden: weights are truncated at 8
  * (P[Poisson(1) > 8] ≈ 1.1e-6 — at B=200 replicates of a 10^12-row
  * corpus some truncations occur, biasing means by < 1e-5 of one
  * row's contribution); replicates whose total weight lands 0 are
  * dropped from the percentile (only plausible for tiny n — reported
  * via n_reps_used).
  */
object Bootstrap {

  /** Cumulative Poisson(1) probabilities P[X <= k], k = 0..7; a draw
    * u falls into the first bucket with u < cdf(k) → weight k, else 8.
    */
  private val cdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  /** md5-mantissa uniform in [0, 1): first 12 hex digits of
    * md5(id:salt:rep) as a long, +0.5, over 16^12 — the
    * `weighted_sample` convention, replayable in any engine with md5.
    */
  private def draw(id: Column, rep: Column, salt: String): Column =
    (conv(substring(md5(concat(id.cast("string"), lit(s":$salt:"),
      rep.cast("string"))), 1, 12), 16, 10).cast("long").cast("double")
      + lit(0.5)) / lit(math.pow(16.0, 12))

  private def poissonWeight(u: Column): Column =
    cdf.zipWithIndex.foldRight(lit(8): Column) { case ((p, k), fallback) =>
      when(u < p, k).otherwise(fallback)
    }

  /** Bootstrap CI for the mean of `valueCol` (an exact-summable
    * integer/decimal column; `idCol` seeds the per-row draws —
    * duplicate ids share their draw, which correlates their weights
    * and understates variance; hand in a genuinely unique id):
    * one row (n_rows, n_reps_used, point_mean, ci_lo, ci_hi), means
    * 6-dp. `level` 0.95 → the [2.5%, 97.5%] interpolated percentiles
    * of the replicate means.
    */
  def meanCi(df: DataFrame, idCol: String, valueCol: String,
      reps: Int = 200, salt: String = "bs", level: Double = 0.95): DataFrame = {
    require(reps >= 2 && reps <= 100000, s"reps must be in [2,1e5], got $reps")
    require(level > 0 && level < 1, s"level must be in (0,1), got $level")
    // exact-decimal tail fractions, passed as decimal STRINGS so both
    // engines parse the same literal: (1 - 0.95)/2 in double
    // arithmetic is 0.025000000000000022, and that dirt would reach
    // the percentile interpolation index (the oracle writes 0.025)
    val lo = (BigDecimal(1) - BigDecimal(level.toString)) / 2
    val hi = BigDecimal(1) - lo
    val rows = Partitioning.spread(df)
      .select(col(idCol).cast("string").as("id"),
        col(valueCol).cast(DecimalType(28, 6)).as("x"))
      .filter(col("x").isNotNull)
    // ONE pass: per row, B (rep, weight) pairs; partial aggregation
    // collapses each task to <= B rows before the single exchange
    val repMeans = rows
      .select(col("id"), col("x"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("w", poissonWeight(draw(col("id"), col("rep"), salt)))
      .groupBy(col("rep"))
      .agg(sum(col("x") * col("w")).as("wx"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      // exact decimal sums; ONE double division, 6-dp — oracle-stable
      .select(round(col("wx").cast("double") / col("sw"), 6).as("m"))
    val ci = repMeans.agg(
      count(lit(1)).as("n_reps_used"),
      round(expr(s"percentile(m, $lo)"), 6).as("ci_lo"),
      round(expr(s"percentile(m, $hi)"), 6).as("ci_hi"))
    // exact decimal sum, ONE double division — the identical fold the
    // oracle states (an avg() would divide in decimal internally and
    // could differ from the oracle's arithmetic in the last bits)
    val point = rows.agg(count(lit(1)).as("n_rows"), sum(col("x")).as("sx"))
      .select(col("n_rows"),
        round(col("sx").cast("double") / col("n_rows"), 6).as("point_mean"))
    point.crossJoin(ci)
      .select(col("n_rows"), col("n_reps_used"),
        col("point_mean"), col("ci_lo"), col("ci_hi"))
  }

  /** Bootstrap CI for the DIFFERENCE of group means (A − B) — the A/B
    * uplift readout with uncertainty, same one-pass Poisson scheme:
    * each replicate's two means come from conditional sums inside ONE
    * (rep)-keyed aggregation (never a per-replicate join); a replicate
    * missing either group drops (reported via n_reps_used). Draws
    * depend on (row id, rep) only — the same row keeps the same
    * weight whichever group it is in, the paired-bootstrap property.
    * Output: (n_a, n_b, n_reps_used, point_diff, ci_lo, ci_hi).
    */
  def diffCi(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, groupA: String, groupB: String,
      reps: Int = 200, salt: String = "bs", level: Double = 0.95): DataFrame = {
    require(reps >= 2 && reps <= 100000, s"reps must be in [2,1e5], got $reps")
    require(level > 0 && level < 1, s"level must be in (0,1), got $level")
    require(groupA != groupB, "groupA and groupB must differ")
    val lo = (BigDecimal(1) - BigDecimal(level.toString)) / 2
    val hi = BigDecimal(1) - lo
    val rows = Partitioning.spread(df)
      .select(col(idCol).cast("string").as("id"),
        col(valueCol).cast(DecimalType(28, 6)).as("x"),
        col(groupCol).cast("string").as("g"))
      .filter(col("x").isNotNull && col("g").isin(groupA, groupB))
    def wSum(g: String, c: Column) = sum(when(col("g") === g, c).otherwise(lit(0)))
    val repDiffs = rows
      .select(col("id"), col("x"), col("g"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("w", poissonWeight(draw(col("id"), col("rep"), salt)))
      .groupBy(col("rep"))
      .agg(wSum(groupA, col("x") * col("w")).as("wxa"),
        wSum(groupA, col("w")).as("swa"),
        wSum(groupB, col("x") * col("w")).as("wxb"),
        wSum(groupB, col("w")).as("swb"))
      .filter(col("swa") > 0 && col("swb") > 0)
      .select(round(round(col("wxa").cast("double") / col("swa"), 6)
        - round(col("wxb").cast("double") / col("swb"), 6), 6).as("m"))
    val ci = repDiffs.agg(
      count(lit(1)).as("n_reps_used"),
      round(expr(s"percentile(m, $lo)"), 6).as("ci_lo"),
      round(expr(s"percentile(m, $hi)"), 6).as("ci_hi"))
    val point = rows.agg(
      wSum(groupA, lit(1L)).as("n_a"), wSum(groupB, lit(1L)).as("n_b"),
      wSum(groupA, col("x")).as("sxa"), wSum(groupB, col("x")).as("sxb"))
      .select(col("n_a"), col("n_b"),
        // an absent group makes the diff undefined — raise in-plan
        // rather than emit a silent NULL row
        when(col("n_a") > 0 && col("n_b") > 0,
          round(round(col("sxa").cast("double") / col("n_a"), 6)
            - round(col("sxb").cast("double") / col("n_b"), 6), 6))
          .otherwise(raise_error(concat(lit("Bootstrap.diffCi: group absent "),
            lit(s"('$groupA' or '$groupB') in "), lit(groupCol))))
          .as("point_diff"))
    point.crossJoin(ci)
      .select(col("n_a"), col("n_b"), col("n_reps_used"),
        col("point_diff"), col("ci_lo"), col("ci_hi"))
  }
}
