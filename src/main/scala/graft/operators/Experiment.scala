package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Experiment analysis over the event stream: deterministic hash
  * bucketing into variants and the two-proportion z-test on
  * conversion — the readout every data-collection A/B (new crawler
  * config, new filter threshold) ends with.
  *
  * Assignment is a CONTENT hash (md5 of the unit id + experiment
  * salt), not rand(): replayable across runs and engines, and
  * re-salting gives an independent assignment. The hex-string
  * comparison ('0'–'7' → A, ~50/50) is engine-portable — the oracle
  * replays it character-for-character.
  *
  * Scale shape: one dedup-to-unit aggregation (user → converted flag,
  * map-side combinable max) + one variant aggregation (2 rows) — a
  * single shuffle on user_id at any corpus size; the z arithmetic
  * runs on the 2-row frame.
  */
object Experiment {

  /** Pearson chi-square test of independence between two categorical
    * columns (event type × day-of-week here; any pair of bounded-
    * domain dimensions): χ² = Σ (O−E)²/E over the contingency table,
    * plus degrees of freedom — the distribution-shift alarm for
    * categorical structure, next to [[Monitor.hourlyAnomaly]]'s
    * volume z-scores.
    *
    * Scale shape: ONE map-side-combinable count aggregation over the
    * corpus; everything after (marginals, expected counts, the fold)
    * runs on the contingency table — |A|×|B| rows, domain-bounded.
    * Terms quantize at 9 dp into decimals (order-free sum); expected
    * counts are exact-integer products divided once, in the same
    * expression both engines state.
    */
  def chiSquare(df: DataFrame, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): DataFrame = {
    val cells = df.select(a.as("a"), b.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
      .localCheckpoint() // feeds both marginals and the fold
    val ra = cells.groupBy(col("a")).agg(sum(col("o")).as("row_total"))
    val cb = cells.groupBy(col("b")).agg(sum(col("o")).as("col_total"))
    val n = cells.agg(sum(col("o")).as("n"))
    // the DENSE |A|×|B| grid: a combination that never occurs still
    // contributes its (0−E)²/E = E term — summing only observed cells
    // understates χ² exactly when the dependence is strongest (the
    // sourceJsDivergence dense-grid lesson; dof already assumes the
    // full grid). Both grid sides are domain-bounded aggregates.
    val grid = ra.crossJoin(cb)
    val term = grid
      .join(cells, Seq("a", "b"), "left")
      .select(col("row_total"), col("col_total"),
        coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(n))
      .select(
        // E = row·col/n as ONE division; (O−E)²/E left-to-right.
        // row_total is cast to double BEFORE the multiply: long×long
        // marginal products overflow silently in non-ANSI mode at
        // counts the 100 TB target actually reaches (~3×10⁹ rows per
        // marginal is enough), while the DuckDB oracle's HUGEINT does
        // not — the parity break would appear exactly at scale.
        (col("row_total").cast("double") * col("col_total") /
          col("n").cast("double")).as("e"),
        col("o"))
      .select(round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 9)
        .cast(DecimalType(28, 9)).as("t9"))
      .agg(coalesce(sum(col("t9")), lit(0).cast(DecimalType(28, 9))).as("chi9"),
        count(lit(1)).as("n_cells"))
    val dims = ra.agg(count(lit(1)).as("n_a"))
      .crossJoin(cb.agg(count(lit(1)).as("n_b")))
    term.crossJoin(dims)
      .select(col("n_a"), col("n_b"), col("n_cells"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        round(col("chi9").cast("double"), 6).as("chi2"))
  }

  /** Cohen's kappa between two boolean raters — chance-corrected
    * agreement for label-quality audits (two heuristic quality gates,
    * a model vs a rule, two annotator pools). κ = (p_o − p_e)/(1 − p_e)
    * with p_e from the raters' marginals.
    *
    * ONE aggregate pass: all four contingency cells and both marginals
    * are `sum(when(...))` columns of the same map-side-combinable
    * aggregation — adding raters' agreement costs a scan, not a join.
    * Rows where either rater abstains (null) are excluded. κ is NULL
    * when p_e = 1 (both raters constant — agreement is all chance).
    */
  def cohensKappa(df: DataFrame, raterA: org.apache.spark.sql.Column,
      raterB: org.apache.spark.sql.Column): DataFrame = {
    val base = df.select(raterA.as("ra"), raterB.as("rb"))
      .filter(col("ra").isNotNull && col("rb").isNotNull)
    val agg = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("n11"),
      sum(when(!col("ra") && !col("rb"), 1L).otherwise(0L)).as("n00"),
      sum(when(col("ra"), 1L).otherwise(0L)).as("na"),
      sum(when(col("rb"), 1L).otherwise(0L)).as("nb"))
    agg.select(col("n"), (col("n11") + col("n00")).as("n_agree"),
        col("na"), col("nb"),
        when(col("n") > 0L,
          (col("n11") + col("n00")).cast("double") / col("n")).as("po"),
        when(col("n") > 0L,
          (col("na").cast("double") / col("n")) * (col("nb").cast("double") / col("n")) +
          (lit(1.0) - col("na").cast("double") / col("n")) *
            (lit(1.0) - col("nb").cast("double") / col("n"))).as("pe"))
      .select(col("n"), col("n_agree"),
        round(col("po"), 6).as("po"), round(col("pe"), 6).as("pe"),
        when(col("pe") < 1.0,
          round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6)).as("kappa"))
  }

  /** Experiment sizing: the per-variant n required to detect a given
    * absolute lift in conversion at α = 0.05 (two-sided) and power
    * 0.8 — the "how long must this A/B run" readout computed FROM the
    * corpus's observed base rate, not a guessed one. Standard normal-
    * approximation formula with the two-proportion variance under H0
    * and H1; z quantiles are fixed literals (the engine has no inverse
    * normal CDF, and the two constants ARE the test definition).
    *
    * One aggregate pass (unit dedup + base rate), then pure scalar
    * arithmetic on a 1-row frame for each MDE in the sweep.
    */
  def abPower(events: DataFrame, convertType: String = "purchase",
      minConversions: Int = 1,
      mdes: Seq[Double] = Seq(0.02, 0.05, 0.10)): DataFrame = {
    require(mdes.nonEmpty && mdes.forall(m => m > 0.0 && m < 1.0),
      "MDEs must be absolute lifts in (0, 1)")
    val zAlpha = 1.959964 // Φ⁻¹(0.975)
    val zBeta = 0.841621  // Φ⁻¹(0.80)
    val base = events.groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === convertType, 1L).otherwise(0L))
        >= minConversions, 1L).otherwise(0L).as("conv"))
      .agg(count(lit(1)).as("n_units"), sum(col("conv")).as("n_conv"))
      .select(col("n_units"),
        when(col("n_units") > 0L,
          col("n_conv").cast("double") / col("n_units")).as("p1"))
    import events.sparkSession.implicits._
    val sweep = mdes.toDF("mde")
    base.crossJoin(broadcast(sweep))
      .select(col("n_units"), round(col("p1"), 6).as("base_rate"), col("mde"),
        (col("p1") + col("mde")).as("p2"), col("p1"))
      // p2 capped below 1: an unreachable lift has no finite n
      .select(col("n_units"), col("base_rate"), col("mde"),
        when(col("p1") > 0.0 && col("p2") < 1.0, {
          val pbar = (col("p1") + col("p2")) / 2.0
          val sd0 = sqrt(pbar * (lit(1.0) - pbar) * 2.0)
          val sd1 = sqrt(col("p1") * (lit(1.0) - col("p1")) +
            col("p2") * (lit(1.0) - col("p2")))
          ceil(pow(lit(zAlpha) * sd0 + lit(zBeta) * sd1, 2.0) /
            (col("mde") * col("mde"))).cast("long")
        }).as("n_per_variant"))
      .orderBy(col("mde"))
  }

  /** CUPED (controlled-experiment using pre-experiment data): adjust
    * each unit's post-period metric by its pre-period covariate,
    * Y′ = Y − θ(X − mean X) with θ = cov(X,Y)/var(X) — the standard
    * variance-reduction that makes the same experiment detect smaller
    * effects. Reports the raw and adjusted variant difference and the
    * pooled variance reduction (= corr² when θ is the OLS slope).
    *
    * Determinism across engines: X and Y fold in exact DECIMAL(18,6);
    * all moment sums (ΣX, ΣY, ΣX², ΣXY) are exact decimal folds; θ and
    * mean X derive from them in ONE fixed double expression; each
    * adjusted value rounds at 6 dp back into decimals before the
    * per-variant folds — no order-dependent double sum anywhere.
    *
    * Scale shape: one shuffle on the unit key (the per-user aggregate);
    * the moment frame is ONE row cross-joined back as a broadcast; the
    * variant readout is a 2-row aggregate.
    */
  def cupedAbTest(events: DataFrame, salt: String,
      splitTs: String): DataFrame = {
    val split = lit(splitTs).cast("timestamp")
    val perUser = events
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts") < split,
          col("value").cast(DecimalType(18, 6)))), lit(0).cast(DecimalType(18, 6)))
          .as("x"),
        coalesce(sum(when(col("ts") >= split,
          col("value").cast(DecimalType(18, 6)))), lit(0).cast(DecimalType(18, 6)))
          .as("y"))
      .withColumn("variant",
        when(substring(md5(concat_ws(":", col("user_id").cast("string"),
          lit(salt))), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
    val m = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    val nD = col("n").cast("double")
    val varX = col("sxx").cast("double") - col("sx").cast("double") *
      col("sx").cast("double") / nD
    val theta = when(col("n") > 1L && varX > 0.0,
      (col("sxy").cast("double") - col("sx").cast("double") *
        col("sy").cast("double") / nD) / varX).otherwise(lit(0.0))
    val adjusted = perUser.crossJoin(broadcast(
        m.select(col("n"), round(theta, 9).as("theta"),
          (col("sx").cast("double") / nD).as("mean_x"))))
      .withColumn("yadj", round(col("y").cast("double") -
        col("theta") * (col("x").cast("double") - col("mean_x")), 6)
        .cast(DecimalType(18, 6)))
    val byVariant = adjusted.groupBy(col("variant"))
      .agg(count(lit(1)).as("vn"),
        sum(col("y")).as("vy"), sum(col("yadj")).as("vyadj"))
    val pooled = adjusted.agg(
      count(lit(1)).as("pn"),
      sum(col("y")).as("py"), sum(col("y") * col("y")).as("pyy"),
      sum(col("yadj")).as("pa"), sum(col("yadj") * col("yadj")).as("paa"),
      max(col("theta")).as("theta"))
    val wide = byVariant.agg(
      coalesce(max(when(col("variant") === "A", col("vn"))), lit(0L)).as("n_a"),
      coalesce(max(when(col("variant") === "B", col("vn"))), lit(0L)).as("n_b"),
      max(when(col("variant") === "A", col("vy"))).as("ya"),
      max(when(col("variant") === "B", col("vy"))).as("yb"),
      max(when(col("variant") === "A", col("vyadj"))).as("aa"),
      max(when(col("variant") === "B", col("vyadj"))).as("ab"))
    def variance(ss: Column, s: Column, n: Column): Column =
      when(n > 1L, (ss.cast("double") - s.cast("double") * s.cast("double") /
        n.cast("double")) / (n.cast("double") - 1.0))
    wide.crossJoin(broadcast(pooled))
      .select(col("n_a"), col("n_b"), col("theta"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          round(col("ya").cast("double") / col("n_a") -
            col("yb").cast("double") / col("n_b"), 6)).as("diff_raw"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          round(col("aa").cast("double") / col("n_a") -
            col("ab").cast("double") / col("n_b"), 6)).as("diff_adj"),
        round(variance(col("pyy"), col("py"), col("pn")), 6).as("var_y"),
        round(variance(col("paa"), col("pa"), col("pn")), 6).as("var_y_adj"),
        when(variance(col("pyy"), col("py"), col("pn")) > 0.0,
          round(lit(1.0) - variance(col("paa"), col("pa"), col("pn")) /
            variance(col("pyy"), col("py"), col("pn")), 6)).as("var_reduction"))
  }

  /** Per-variant conversion + pooled two-proportion z, one row.
    * A unit converts when it logs at least `minConversions` events of
    * `convertType` — the count threshold keeps the metric meaningful
    * on streams where nearly every unit eventually logs one.
    */
  def abTest(events: DataFrame, salt: String,
      convertType: String = "purchase", minConversions: Int = 1): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === convertType, 1L).otherwise(0L))
        >= minConversions, 1L).otherwise(0L).as("converted"))
      .withColumn("variant",
        when(substring(md5(concat_ws(":", col("user_id").cast("string"),
          lit(salt))), 1, 1).isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
          .otherwise("B"))
    val byVariant = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    // 2-row frame from here on: pivot the two variants side by side
    // an empty variant (tiny corpora, skewed hash) reports 0, not null
    val wide = byVariant.agg(
      coalesce(max(when(col("variant") === "A", col("n"))), lit(0L)).as("n_a"),
      coalesce(max(when(col("variant") === "A", col("conv"))), lit(0L)).as("conv_a"),
      coalesce(max(when(col("variant") === "B", col("n"))), lit(0L)).as("n_b"),
      coalesce(max(when(col("variant") === "B", col("conv"))), lit(0L)).as("conv_b"))
    wide.select(
        col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        // CaseWhen evaluates lazily — the guard keeps ANSI mode from
        // raising DIVIDE_BY_ZERO on an empty variant
        when(col("n_a") > 0L, col("conv_a").cast("double") / col("n_a")).as("p_a"),
        when(col("n_b") > 0L, col("conv_b").cast("double") / col("n_b")).as("p_b"),
        when(col("n_a") + col("n_b") > 0L,
          (col("conv_a") + col("conv_b")).cast("double") /
            (col("n_a") + col("n_b"))).as("p_pool"))
      .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        round(col("p_a"), 6).as("rate_a"),
        round(col("p_b"), 6).as("rate_b"),
        when(col("n_a") > 0L && col("n_b") > 0L &&
          col("p_pool") > 0.0 && col("p_pool") < 1.0,
          round((col("p_a") - col("p_b")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
          .as("z"))
  }

  /** 1/√(2π) as a shared literal — neither engine computes sqrt(2π). */
  private val InvSqrt2Pi = 0.3989422804014327

  /** Two-sided p-value of a z statistic via the Abramowitz–Stegun
    * 26.2.17 polynomial (|error| < 7.5e-8): both engines fold the SAME
    * literal coefficients from the same z double, so parity is by
    * shared formula, not by math-library agreement; the result
    * quantizes at 9 dp (the surprisal discipline) before anything
    * compares or ranks it.
    */
  private def pTwoSided(z: Column): Column = {
    val x = abs(z)
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * x)
    val poly = k * (lit(0.319381530) + k * (lit(-0.356563782)
      + k * (lit(1.781477937) + k * (lit(-1.821255978)
        + k * lit(1.330274429)))))
    val phi = lit(InvSqrt2Pi) * exp(lit(-0.5) * x * x)
    // least() IGNORES nulls (least(NULL, 1.0) = 1.0), so an explicit
    // null gate keeps an untestable z from masquerading as p = 1
    when(z.isNotNull, round(least(lit(2.0) * phi * poly, lit(1.0)), 9))
  }

  /** Welch z-test of mean(value) between two arms, ONE test per
    * metric — the sweep an experimentation platform runs over its
    * whole metric catalog before multiple-testing correction
    * ([[bhAdjust]]). Moments fold as decimal sums of per-row double
    * products — the decimal makes the SUM merge-order-independent
    * (the per-row square itself is IEEE double, replayed identically
    * by the oracle); the z and p fold in fixed literal order. Metrics
    * with under 2 rows per arm or zero pooled variance report NULL
    * z/p (no test, never ±Inf).
    *
    * Shape at 100 TB: one map-side-combinable (metric, arm) moment
    * aggregation over the stream; the test arithmetic runs on the
    * 2·|metrics| grid.
    */
  def metricZTests(df: DataFrame, metric: Column, value: Column,
      armA: Column): DataFrame = {
    val base = df.filter(value.isNotNull)
      .select(metric.as("metric"),
        when(armA, "A").otherwise("B").as("arm"),
        value.cast("double").as("v"))
    // v*v is an IEEE DOUBLE product (possibly rounded for inputs past
    // ~6 significant dp) cast to decimal AFTERWARDS — the decimal's
    // job here is not to make the square exact but to make the SUM of
    // those per-row doubles order-independent; parity holds because
    // the oracle replays the identical double product per row before
    // its own decimal fold
    val m = base.groupBy(col("metric"), col("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(38, 12))).as("s"),
        sum((col("v") * col("v")).cast(DecimalType(38, 12))).as("s2"))
    def side(a: String, c: String) =
      max(when(col("arm") === a, col(c)))
    val wide = m.groupBy(col("metric"))
      .agg(coalesce(side("A", "n"), lit(0L)).as("n_a"),
        side("A", "s").as("s_a"), side("A", "s2").as("s2_a"),
        coalesce(side("B", "n"), lit(0L)).as("n_b"),
        side("B", "s").as("s_b"), side("B", "s2").as("s2_b"))
    def mean(s: String, n: String) = col(s).cast("double") / col(n)
    // sample variance from exact moments: (s2 − s²/n) / (n−1)
    def vr(s: String, s2: String, n: String) =
      (col(s2).cast("double") - col(s).cast("double")
        * col(s).cast("double") / col(n)) / (col(n) - lit(1L))
    val se2 = (vr("s_a", "s2_a", "n_a") / col("n_a")) +
      (vr("s_b", "s2_b", "n_b") / col("n_b"))
    val z = when(col("n_a") >= 2L && col("n_b") >= 2L,
      when(se2 > 0.0, round((mean("s_a", "n_a") - mean("s_b", "n_b"))
        / sqrt(se2), 6)))
    wide.select(col("metric"), col("n_a"), col("n_b"),
        round(mean("s_a", "n_a"), 6).as("mean_a"),
        round(mean("s_b", "n_b"), 6).as("mean_b"),
        z.as("z"))
      .withColumn("p", pTwoSided(col("z")))
      .orderBy(col("metric"))
  }

  /** Benjamini–Hochberg step-up FDR adjustment (BH 1995) — the
    * correction between a metric sweep and a launch decision: testing
    * 50 metrics at α=0.05 expects 2-3 false alarms; BH caps the
    * EXPECTED FALSE-DISCOVERY RATE at α instead of the per-test error.
    * p_adj(i) = min over j ≥ i of min(1, p(j)·m/j) on the p-ascending
    * ranking; reject iff p_adj ≤ α (the step-up equivalence).
    *
    * The tests frame is one row per metric — a bounded DOMAIN, checked
    * via [[Partitioning.requireBoundedDomain]] before the global rank
    * window (the skyline/KM discipline: trust, then verify). NULL
    * p-values (untestable metrics) pass through unranked and
    * unrejected. Ties rank deterministically on (p, test id).
    */
  def bhAdjust(tests: DataFrame, testCol: String, pCol: String,
      alpha: Double = 0.05, domainLimit: Long = 2000000L): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must lie in (0,1), got $alpha")
    import org.apache.spark.sql.expressions.Window
    val testable = Partitioning.requireBoundedDomain(
      tests.filter(col(pCol).isNotNull)
        .select(col(testCol).as("test"), col(pCol).cast("double").as("p")),
      testCol, "Experiment.bhAdjust", domainLimit)
    val mTot = testable.agg(count(lit(1)).as("m"))
    val ranked = testable.crossJoin(broadcast(mTot))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("p"), col("test"))))
      .withColumn("raw_adj", round(col("p") * col("m") / col("rank"), 9))
    val stepUp = ranked.withColumn("p_adj",
        least(lit(1.0), min(col("raw_adj")).over(
          Window.orderBy(col("rank").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .select(col("test"), col("p"), col("rank"), col("m"),
        col("p_adj"), (col("p_adj") <= alpha).as("significant"))
    val untestable = tests.filter(col(pCol).isNull)
      .select(col(testCol).as("test"), col(pCol).cast("double").as("p"),
        lit(null).cast("int").as("rank"), lit(null).cast("long").as("m"),
        lit(null).cast("double").as("p_adj"), lit(false).as("significant"))
    stepUp.unionByName(untestable).orderBy(col("test"))
  }
}
