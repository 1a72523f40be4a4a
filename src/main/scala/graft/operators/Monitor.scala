package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-quality monitoring operators — the checks a production corpus
  * pipeline runs on every ingest: volume anomalies on the event
  * stream, distribution drift between corpus snapshots, and value
  * histograms. None of them look at single rows; all reduce to small
  * keyed aggregates a dashboard reads directly.
  */
object Monitor {

  /** Per-(event_type, hour) volume z-scores against that event type's
    * own hourly history — the first-line "did ingest break last night"
    * alarm. Counts are integers, so the moments are EXACT: sum and
    * sum-of-squares accumulate in decimals, and both engines evaluate
    * the identical closed-form sample variance
    * (Σn² − (Σn)²/k)/(k−1) from the same exact integers — no Welford
    * vs naive-sum float divergence, no approximate sketch.
    *
    * Shape at 100 TB: one map-side-combined count per (type, hour),
    * one tiny per-type moment aggregate (rows = event types), and a
    * broadcast join back — the stream is touched once. Types with a
    * degenerate history (k < 2 buckets or zero variance) emit null z
    * rather than dividing by zero.
    */
  def hourlyAnomaly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"),
        sum(col("n").cast(DecimalType(20, 0))).as("s"),
        sum((col("n") * col("n")).cast(DecimalType(28, 0))).as("ssq"))
    val k = col("k").cast("double")
    val s = col("s").cast("double")
    val ssq = col("ssq").cast("double")
    val sd = sqrt((ssq - s * s / k) / (k - lit(1.0)))
    // guard on the RADICAND, not sd: Spark orders NaN above every double,
    // so if float cancellation ever drove ssq − s²/k slightly negative,
    // sqrt → NaN would PASS an `sd > 0` guard and emit NaN z while the
    // oracle's sqrt(negative) errors. Unreachable from exact integer
    // moments (< 2^53), but the guard now encodes that instead of
    // assuming it. Mirrored in the oracle SQL.
    hourly.join(broadcast(stats), "event_type")
      .select(col("event_type"), col("hour"), col("n"),
        when(col("k") >= 2 && (ssq - s * s / k) > 0.0,
          round((col("n") - s / k) / sd, 6)).as("z"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Per-label centroid shift between two corpus snapshots — embedding
    * drift, the monitor that catches a changed encoder or a shifted
    * source mix before a model trains on it. Snapshot membership is a
    * caller-supplied predicate (here: any deterministic split); the
    * drift for a label is the L2 distance between its two centroids.
    *
    * Determinism discipline: per-dimension means are rounded at 6 dp
    * (the [[Clustering]] centroid contract), each squared difference
    * is quantized at 9 dp into a decimal, and the across-dims sum is
    * a DECIMAL aggregation — order-free, so Spark's arbitrary
    * aggregation order and the oracle's agree bit-for-bit before the
    * final sqrt.
    *
    * Shape at 100 TB: one (label, dim) mean aggregation per snapshot
    * over exploded embeddings — map-side combinable — then a join on
    * (label, dim) whose size is labels×dims, far below one partition.
    */
  def embeddingDrift(emb: DataFrame, inOld: org.apache.spark.sql.Column): DataFrame = {
    def centroids(df: DataFrame) = df
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim_idx", "x")))
      .groupBy(col("label"), col("dim_idx"))
      .agg(round(avg(col("x").cast("double")), 6).as("c"))
    val old = centroids(emb.filter(inOld))
    val nw = centroids(emb.filter(!inOld))
    old.toDF("label", "dim_idx", "c_old")
      .join(nw.toDF("label", "dim_idx", "c_new"), Seq("label", "dim_idx"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_dims"),
        sum(round((col("c_old") - col("c_new")) * (col("c_old") - col("c_new")), 9)
          .cast(DecimalType(28, 9))).as("ssq"))
      .select(col("label"), col("n_dims"),
        round(sqrt(col("ssq").cast("double")), 6).as("drift"))
      .orderBy(col("label"))
  }

  /** Exponentially time-decayed counts per group — "what's popular
    * NOW": each event contributes 2^(−age/halfLife) at the corpus
    * horizon (the stream's max ts), so yesterday's burst fades and a
    * current trickle ranks. The batch form of the decayed counter a
    * streaming sink maintains incrementally (decay is associative:
    * old_total · 2^(−Δt/h) + new).
    *
    * Determinism discipline: pow is the only transcendental — the
    * per-row weight is rounded at 9 dp (where engine libm ulp
    * differences die, the ln/surprisal rule) and summed in decimals.
    * Shape: one tiny max-ts aggregate broadcast back, then per-row
    * codegen + one map-side-combined aggregation on the group key.
    */
  def decayedCounts(events: DataFrame, groupCol: String,
      halfLifeSeconds: Long): DataFrame = {
    require(halfLifeSeconds >= 1, s"halfLifeSeconds must be >= 1, got $halfLifeSeconds")
    val horizon = events.agg(max(unix_micros(col("ts"))).as("t_max"))
    val w = round(pow(lit(2.0),
      -((col("t_max") - unix_micros(col("ts"))).cast("double")
        / lit(halfLifeSeconds * 1000000.0))), 9)
    events.crossJoin(broadcast(horizon))
      .select(col(groupCol), w.cast(DecimalType(20, 9)).as("w"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("w")).cast("double"), 6).as("decayed_count"))
      .orderBy(col(groupCol))
  }

  /** Per-column profile of a table — row count, null count, distinct
    * count — the schema-drift / completeness monitor run on every
    * ingested partition. ONE scan: all columns' aggregates evaluate in
    * a single multi-count-distinct aggregation (Spark plans the
    * standard Expand — one pass over the data, partial aggregation per
    * column below the exchange), then the single result row unpivots
    * to one row per column. `n_distinct` excludes nulls (SQL
    * COUNT(DISTINCT x) semantics); nulls are reported separately.
    *
    * `exact` is the 100 TB scale dial (round-7 verdict: a parameter,
    * not prose): `true` (the oracle-parity default) uses exact
    * `countDistinct`, whose state is one entry PER DISTINCT VALUE per
    * column; `false` swaps in `approx_count_distinct` (HyperLogLog++,
    * ~2% relative error) — constant-size sketch state per column, the
    * form a 100 TB profile job actually runs. Null counts and row
    * counts are exact in both modes.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def dist(c: String) =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        dist(c).as(s"__dist_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          col(s"__null_$c").as("n_null"),
          col(s"__dist_$c").as("n_distinct"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_null"),
        col("p.n_distinct"))
      .orderBy(col("col_name"))
  }

  /** Profile drift between a reference slice and a current slice —
    * the schema/statistics companion to [[psi]]'s value-distribution
    * gate: per column, row counts, null RATES, exact distinct counts
    * and distinctness (distinct/rows) on both sides, and a drift flag.
    * Columns missing from a side — a schema change between snapshots —
    * surface as status `added`/`dropped` rows with NULL stats for the
    * absent side, never a silent drop.
    *
    * The distinct signal fires only when BOTH cardinality moved
    * (|Δdistinct|/dist_ref > tol) AND distinctness moved
    * (|dc/nc − dr/nr| > tol·dr/nr): cardinality alone false-alarms on
    * ID-like columns under a size change (half the rows ⇒ half the
    * ids — but distinctness stays 1.0), distinctness alone
    * false-alarms on categorical columns (20 values over half the
    * rows doubles the density — but cardinality stays 20). An
    * all-null drifted column is caught by the null-rate arm
    * (|Δ null rate| > nullRateTol), so a dist_ref = 0 reference
    * (no cardinality baseline) does not need a distinct verdict.
    *
    * Shape at 100 TB: ONE [[profile]] pass per side (a single
    * multi-aggregate scan each — never per-column rescans), then all
    * arithmetic on the two |columns|-row frames joined full-outer on
    * the column name. Determinism: exact integer counts, fixed-order
    * double arithmetic, every flag compares ROUNDED 6-dp values so a
    * boundary cannot flip between engines, (col_name) order.
    */
  def profileDrift(ref: DataFrame, cur: DataFrame,
      nullRateTol: Double = 0.05, distinctRatioTol: Double = 0.5)
      : DataFrame = {
    require(nullRateTol > 0.0, s"nullRateTol must be > 0, got $nullRateTol")
    require(distinctRatioTol > 0.0,
      s"distinctRatioTol must be > 0, got $distinctRatioTol")
    val pr = profile(ref, ref.columns.toSeq)
      .select(col("col_name"), col("n_rows").as("n_ref"),
        col("n_null").as("null_ref"), col("n_distinct").as("dist_ref"))
    val pc = profile(cur, cur.columns.toSeq)
      .select(col("col_name"), col("n_rows").as("n_cur"),
        col("n_null").as("null_cur"), col("n_distinct").as("dist_cur"))
    val nrr = col("null_ref").cast("double") / col("n_ref")
    val nrc = col("null_cur").cast("double") / col("n_cur")
    val dnr = col("dist_ref").cast("double") / col("n_ref")
    val dnc = col("dist_cur").cast("double") / col("n_cur")
    val cardShift = when(col("dist_ref") > 0,
      abs(col("dist_cur") - col("dist_ref")).cast("double") / col("dist_ref"))
    val distFlag = coalesce(
      round(cardShift, 6) > distinctRatioTol &&
        round(abs(dnc - dnr), 6) > round(lit(distinctRatioTol) * dnr, 6),
      lit(false))
    pr.join(pc, Seq("col_name"), "full_outer")
      .select(col("col_name"),
        when(col("n_ref").isNull, "added")
          .when(col("n_cur").isNull, "dropped")
          .otherwise("common").as("status"),
        col("n_ref"), col("n_cur"),
        round(nrr, 6).as("null_rate_ref"),
        round(nrc, 6).as("null_rate_cur"),
        round(nrc - nrr, 6).as("null_rate_delta"),
        col("dist_ref"), col("dist_cur"),
        round(dnr, 6).as("distinctness_ref"),
        round(dnc, 6).as("distinctness_cur"),
        round(cardShift, 6).as("cardinality_shift"),
        (col("n_ref").isNull || col("n_cur").isNull ||
          (abs(round(nrc - nrr, 6)) > nullRateTol) || distFlag)
          .cast("int").as("drifted"))
      .orderBy(col("col_name"))
  }

  /** Robust outlier scores via the median absolute deviation — the
    * length-cut a curation pipeline should use instead of mean/stddev
    * z-scores, which the outliers themselves corrupt (one 10M-token
    * document drags the mean; it cannot drag the median). Reports the
    * modified z-score 0.6745·(x − median)/MAD (Iglewicz & Hoaglin
    * 1993) and the |z| > cutoff flag, null when MAD = 0 (over half the
    * values identical — no robust scale to judge against).
    *
    * Determinism: with `exact = true` (the oracle-parity default) both
    * location and scale are EXACT interpolated percentiles (the
    * established percentile/quantile_cont parity); the flag compares
    * the ROUNDED z so the boundary cannot flip between engines. The
    * two scalar aggregates broadcast back; scoring is per-row codegen.
    *
    * `exact = false` is the 100 TB dial (round-7 verdict): Spark's
    * exact `percentile` buffers value→count per aggregation — memory
    * ∝ distinct values in ONE global group, bounded for word-count /
    * latency domains but unbounded for a continuous column. The
    * approx path swaps in `approx_percentile` (Greenwald-Khanna,
    * bounded state at the given accuracy) for BOTH the median and the
    * MAD; everything downstream is identical.
    */
  def robustOutliers(df: DataFrame, idCol: String, valueCol: String,
      cutoff: Double = 3.5, exact: Boolean = true,
      approxAccuracy: Int = 10000): DataFrame = {
    require(cutoff > 0, s"cutoff must be > 0, got $cutoff")
    def p50(c: String) =
      if (exact) expr(s"percentile($c, 0.5D)")
      else expr(s"approx_percentile($c, 0.5D, $approxAccuracy)").cast("double")
    val v = df.select(col(idCol), col(valueCol).cast("double").as("value"))
    val med = v.agg(p50("value").as("med"))
    val withMed = v.crossJoin(broadcast(med))
    val mad = withMed.agg(p50("abs(value - med)").as("mad"))
    withMed.crossJoin(broadcast(mad))
      .select(col(idCol), col("value"),
        when(col("mad") > 0.0,
          round(lit(0.6745) * (col("value") - col("med")) / col("mad"), 6))
          .as("robust_z"))
      .withColumn("is_outlier",
        when(col("robust_z").isNotNull, abs(col("robust_z")) > cutoff))
      .orderBy(col(idCol))
  }

  /** Equi-width histogram of a numeric column per group — the
    * value-distribution monitor. Bin = floor(value/width): one integer
    * per row, one map-side-combined count per (group, bin). Bin edges
    * are exact double multiples of `width`; rows with null values are
    * excluded (they are a separate null-rate monitor's business).
    */
  def valueHistogram(df: DataFrame, groupCol: String, valueCol: String,
                     width: Double): DataFrame = {
    require(width > 0, s"width must be > 0, got $width")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol),
        floor(col(valueCol) / width).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("bin"),
        round(col("bin") * width, 6).as("bin_lo"), col("n"))
      .orderBy(col(groupCol), col("bin"))
  }

  /** k-anonymity report over a quasi-identifier combination — the
    * privacy companion to [[graft.operators.TextAnalysis.piiScrub]]:
    * partition the table into equivalence classes on the quasi
    * columns, then report the CLASS-SIZE DISTRIBUTION (class_size →
    * how many classes, how many records). The dataset's k-anonymity
    * is the smallest class_size row; records in classes below a
    * policy threshold are the re-identifiable ones a release gate
    * counts (Sweeney 2002 — published definition; nothing per-row
    * ever leaves the aggregate).
    *
    * Scale shape: two map-side-combinable groupBys — the first keyed
    * on the quasi tuple (corpus-sized but combinable), the second on
    * the class size (output bounded by the largest class). Null quasi
    * values form their own class, as Spark/SQL GROUP BY naturally
    * treats them — nulls are a real linkage class, not ignorable.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("class_size"))
      .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_records"))
      .orderBy(col("class_size"))
  }

  /** l-diversity beside [[kAnonymity]] (Machanavajjhala et al. 2007):
    * k-anonymity bounds how many records share a quasi-identifier
    * tuple, but a class where every record carries the SAME sensitive
    * value still discloses it — l-diversity reports, per equivalence
    * class, how many DISTINCT sensitive values it holds. The release
    * gate is min(l) over classes, surfaced as the `l` distribution.
    *
    * One two-level count-distinct (map-side dedup of (class, value)
    * before the exchange), then the bounded histogram — the same
    * shape and cost as the k-anonymity report.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitive: org.apache.spark.sql.Column): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(sensitive).as("l"), count(lit(1)).as("sz"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("sz")).as("n_records"))
      .orderBy(col("l"))
  }

  /** t-closeness (Li, Li & Venkatasubramanian 2007) — the third
    * privacy gate beside [[kAnonymity]] (class sizes) and
    * [[lDiversity]] (distinct sensitive values): even an l-diverse
    * class leaks if its sensitive DISTRIBUTION differs from the
    * table's (a class that is 90% "length-bucket 0" tells an attacker
    * plenty, whatever its l). t per class = Earth Mover's Distance
    * between the class's and the global sensitive distribution; for
    * an ORDERED attribute with unit ground distances,
    * EMD = Σᵢ |Σ_{j≤i}(p_j − q_j)| / (m − 1) over the m observed
    * sensitive values — the ordered-EMD closed form from the paper.
    * Release gate: max(t) ≤ threshold.
    *
    * Shape at 100 TB: one map-side-combinable (class, value) count
    * over the corpus; the dense class×value grid (absent cells are
    * REAL zeros — p_j = 0 contributes to the EMD, so the grid join is
    * load-bearing, not cosmetic) and the cumulative windows run on
    * bounded domains — the class frame is guarded by
    * [[Partitioning.requireBoundedDomain]], the cumsum window is
    * PARTITIONED by class. Determinism: exact counts, one fixed
    * double division per share, |cumsum| terms quantized at 9 dp into
    * decimals, 6-dp readout.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitive: org.apache.spark.sql.Column,
      domainLimit: Long = 2000000L): DataFrame = {
    require(quasiCols.nonEmpty, "t-closeness needs at least one quasi-identifier")
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(sensitive.isNotNull)
      .select(concat_ws("|", quasiCols.map(col): _*).as("cls"),
        sensitive.as("sv"))
    val cellCounts = base.groupBy(col("cls"), col("sv"))
      .agg(count(lit(1)).as("c"))
    val classes = Partitioning.requireBoundedDomain(
      cellCounts.groupBy(col("cls")).agg(sum(col("c")).as("n_cls")),
      "cls", "Monitor.tCloseness", domainLimit)
    // the sensitive-value domain multiplies into the |classes|×|values|
    // grid AND orders the per-class cumsum window, so a near-continuous
    // sensitive column (raw salaries, timestamps) must refuse loudly
    // here too — pre-bucket the column, don't feed the raw domain.
    // 65536 values × the class limit already bounds the grid at ~10^11
    // cells worst-case; real gates run on ≤ dozens of buckets.
    val values = Partitioning.requireBoundedDomain(
      cellCounts.groupBy(col("sv")).agg(sum(col("c")).as("n_val")),
      "sv", "Monitor.tCloseness(sensitive)", math.min(domainLimit, 65536L))
    val totals = values.agg(sum(col("n_val")).as("n"),
      count(lit(1)).as("m"))
    // dense grid: absent (class, value) cells are real zeros
    val grid = classes.crossJoin(values)
      .join(cellCounts, Seq("cls", "sv"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(totals))
      .select(col("cls"), col("sv"), col("n_cls"), col("m"),
        (col("c").cast("double") / col("n_cls")).as("p"),
        (col("n_val").cast("double") / col("n")).as("q"))
    val wCum = Window.partitionBy(col("cls")).orderBy(col("sv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum", sum(col("p") - col("q")).over(wCum))
      .select(col("cls"), col("n_cls"), col("m"),
        round(abs(col("cum")), 9).cast(DecimalType(28, 9)).as("t9"))
      .groupBy(col("cls"), col("n_cls"), col("m"))
      // cast the decimal sum to double BEFORE the division (decimal
      // division scale rules differ between engines); m = 1 means one
      // sensitive value everywhere — every distribution is identical,
      // t = 0 by definition, never 0/0
      .agg(when(col("m") > 1L,
        round(sum(col("t9")).cast("double") / (col("m") - lit(1L)), 6))
        .otherwise(lit(0.0)).as("t"))
      .select(col("cls"), col("n_cls").as("class_size"), col("t"))
      .orderBy(col("cls"))
  }

  /** ln 2 as an explicit shared literal — both engines divide their
    * nat-sums by THIS double, not by their own log(2) evaluation.
    */
  private val Ln2 = 0.6931471805599453

  /** Population Stability Index between a reference and a current
    * slice of a numeric column — the industry drift gate (rule of
    * thumb: < 0.1 stable, 0.1–0.25 watch, > 0.25 shifted). Bins are
    * the REFERENCE's exact quantile edges (so the reference is ~
    * uniform over bins by construction and the index reads as pure
    * movement); both sides' shares are Laplace-smoothed
    * (c + 0.5)/(n + bins/2) — an empty bin contributes a finite,
    * deterministic term instead of ∞. PSI = Σ (q−p)·ln(q/p) with the
    * [[TextAnalysis.sourceJsDivergence]] fold discipline (9-dp
    * quantized terms, order-free decimal sum, 6-dp readout).
    *
    * Shape at 100 TB: one exact-percentile aggregate over the
    * reference (single pass, mergeable percentile state), then ONE
    * map-side-combined bin count per side — the bin assignment is a
    * codegen fold over ≤ bins−1 edge literals, no join; everything
    * after runs on the bins-row grid. Output 1 row
    * (n_ref, n_cur, bins, psi).
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    val spark = ref.sparkSession
    import spark.implicits._
    // exact-decimal fraction strings: both engines parse "0.1", never
    // a double-division artifact (the Bootstrap percentile lesson)
    val fracs = (1 until bins)
      .map(i => (BigDecimal(i) / BigDecimal(bins)).toString).mkString(", ")
    val edgeRow = ref.filter(col(valueCol).isNotNull)
      .agg(expr(s"percentile($valueCol, array($fracs))").as("es"))
      .head()
    // an empty reference has no quantiles — refuse loudly instead of
    // NPE-ing on the null percentile array
    if (edgeRow.isNullAt(0)) throw new IllegalArgumentException(
      s"Monitor.psi: the reference slice has no non-null '$valueCol' rows - " +
        "PSI bins are undefined without a reference distribution")
    val edges = edgeRow.getSeq[Double](0)
    // bin(x) = #edges strictly below x — ties land in the lower bin
    def binOf(c: org.apache.spark.sql.Column) =
      edges.foldLeft(lit(0)) { (acc, e) => acc + (c > lit(e)).cast("int") }
    def binCounts(df: DataFrame, as: String) = df
      .filter(col(valueCol).isNotNull)
      .select(binOf(col(valueCol).cast("double")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(as))
    val grid = spark.range(bins).select(col("id").cast("int").as("bin"))
      .join(binCounts(ref, "c_ref"), Seq("bin"), "left")
      .join(binCounts(cur, "c_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val totals = grid.agg(sum(col("c_ref")).as("n_ref"),
      sum(col("c_cur")).as("n_cur"))
    val half = bins.toDouble / 2
    grid.crossJoin(broadcast(totals))
      .select(col("n_ref"), col("n_cur"),
        ((col("c_ref").cast("double") + 0.5) / (col("n_ref") + lit(half)))
          .as("p"),
        ((col("c_cur").cast("double") + 0.5) / (col("n_cur") + lit(half)))
          .as("q"))
      .select(col("n_ref"), col("n_cur"),
        round((col("q") - col("p")) * log(col("q") / col("p")), 9)
          .cast(DecimalType(28, 9)).as("t9"))
      .groupBy(col("n_ref"), col("n_cur"))
      .agg(round(sum(col("t9")).cast("double"), 6).as("psi"))
      .select(col("n_ref"), col("n_cur"), lit(bins).as("bins"), col("psi"))
  }

  /** Equi-depth (equi-height) histogram — the planner-stats structure
    * beside [[valueHistogram]]'s equi-width bins: bin EDGES are the
    * column's exact quantiles, so every bin holds ~n/bins rows and the
    * histogram resolves the dense region a fixed-width grid smears
    * into one bar. This is the selectivity-estimation structure
    * (Spark CBO, Postgres, DuckDB all keep equi-depth histograms):
    * range-predicate selectivity reads off as (bins touched)/bins.
    * The observed per-bin counts are reported rather than assumed —
    * heavy ties pile into one bin and the skew SHOWS (the bin's share
    * exceeds 1/bins), which is exactly what a planner wants to know.
    *
    * Shape at 100 TB: one exact-percentile + min/max aggregation pass
    * (edges become plan literals), then one map-side-combinable
    * bin-count pass over a codegen fold — the psi_drift shape; the
    * grid/edges arithmetic runs on `bins` rows. Ties land in the
    * LOWER bin (strictly-greater fold), matching the oracle.
    */
  def equidepthHistogram(df: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    val spark = df.sparkSession
    val fracs = (1 until bins)
      .map(i => (BigDecimal(i) / BigDecimal(bins)).toString).mkString(", ")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("x"))
    val statRow = base.agg(
      expr(s"percentile(x, array($fracs))").as("es"),
      min(col("x")).as("mn"), max(col("x")).as("mx")).head()
    if (statRow.isNullAt(0)) throw new IllegalArgumentException(
      s"Monitor.equidepthHistogram: no non-null '$valueCol' rows - " +
        "an empty column has no quantile edges")
    val edges = statRow.getSeq[Double](0)
    val mn = statRow.getDouble(1)
    val mx = statRow.getDouble(2)
    def binOf(c: org.apache.spark.sql.Column) =
      edges.foldLeft(lit(0)) { (acc, e) => acc + (c > lit(e)).cast("int") }
    val counts = base.select(binOf(col("x")).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n_rows"))
    val lows = mn +: edges
    val highs = edges :+ mx
    val grid = spark.range(bins).select(col("id").cast("int").as("bin"),
      element_at(array(lows.map(lit): _*), col("id").cast("int") + 1).as("lo"),
      element_at(array(highs.map(lit): _*), col("id").cast("int") + 1).as("hi"))
    val total = counts.agg(sum(col("n_rows")).as("n_total"))
    grid.join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("bin"), round(col("lo"), 6).as("lo"),
        round(col("hi"), 6).as("hi"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total"), 6).as("share"))
      .orderBy(col("bin"))
  }

  /** Mutual information (bits) between two bounded-domain categorical
    * columns, with marginal entropies and the normalized
    * MI / √(H(a)·H(b)) — the MEASURE of dependence next to
    * [[graft.operators.Experiment.chiSquare]]'s test of it (χ² says
    * "dependent?", MI says "how much — in bits you could exploit").
    *
    * Determinism (the [[TextAnalysis.sourceJsDivergence]] discipline):
    * counts are exact; each cell/marginal term is one fixed double
    * expression over those integers, quantized at 9 dp into DECIMAL
    * and summed order-free; the nat→bit division uses the shared
    * [[Ln2]] literal; the final readouts round at 6 dp. NMI's factors
    * are the ROUNDED entropies, so the oracle multiplies the same
    * numbers; degenerate marginals (either H = 0) define NMI = 0.
    *
    * Shape at 100 TB: ONE corpus-sized (a, b) count whose partial
    * aggregation combines map-side; marginals and folds run on the
    * bounded |A|×|B| grid. Output 1 row
    * (n, mi_bits, h_a_bits, h_b_bits, nmi).
    */
  def mutualInformation(df: DataFrame, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): DataFrame = {
    val cells = df.select(a.as("a"), b.as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds both marginals and the joint fold
    val ma = cells.groupBy(col("a")).agg(sum(col("c")).as("ca"))
    val mb = cells.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val grand = cells.agg(sum(col("c")).as("n"))
    def entropyBits(marg: DataFrame, cnt: String) = marg
      .crossJoin(broadcast(grand))
      .select(round((col(cnt).cast("double") / col("n"))
        * log(col("n").cast("double") / col(cnt)), 9)
        .cast(DecimalType(28, 9)).as("t9"))
      .agg(round(sum(col("t9")).cast("double") / lit(Ln2), 6).as("h"))
    val mi = cells
      .join(ma, "a").join(mb, "b")
      .crossJoin(broadcast(grand))
      // p_ab · ln(p_ab / (p_a·p_b)) = (c/n) · ln(c·n / (ca·cb)); a
      // present cell always has c > 0, so no zero-guard lane exists
      .select(round((col("c").cast("double") / col("n"))
        * log(col("c").cast("double") * col("n")
          / (col("ca").cast("double") * col("cb"))), 9)
        .cast(DecimalType(28, 9)).as("t9"))
      .agg(round(sum(col("t9")).cast("double") / lit(Ln2), 6).as("mi"))
    grand
      .crossJoin(mi)
      .crossJoin(entropyBits(ma, "ca").withColumnRenamed("h", "ha"))
      .crossJoin(entropyBits(mb, "cb").withColumnRenamed("h", "hb"))
      .select(col("n"), col("mi").as("mi_bits"),
        col("ha").as("h_a_bits"), col("hb").as("h_b_bits"),
        when(col("ha") > 0.0 && col("hb") > 0.0,
          round(col("mi") / sqrt(col("ha") * col("hb")), 6))
          .otherwise(lit(0.0)).as("nmi"))
  }
}
