package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Learned quality classifier — the CCNet/fastText-filter analogue
  * (Wenzek et al. 2020 train a fastText model on a trusted corpus and
  * keep crawl documents it scores high; DCLM and FineWeb-Edu do the
  * same with stronger models): logistic regression over cheap per-doc
  * quality signals, trained ON THE CORPUS ITSELF against a trusted
  * label (here `lang = 'en'` stands in for "looks like the target
  * corpus", as in [[Sampling.dsirWeights]]).
  *
  * Third member of the dump-and-replay oracle family
  * ([[KMeansIndex]], [[Pca]]): MLlib only FITS the weight vector; the
  * APPLIED model is our own codegen'd left-to-right dot fold plus
  * sigmoid over the dumped doubles — engine-portable (the oracle
  * replays it with `list_dot_product` + `exp` on identical inputs),
  * with no model broadcast at scoring time.
  *
  * Shape at 100 TB: the fit runs on a hash-sampled cap (classifier
  * quality saturates long before corpus size; the gradient passes
  * must not scale with the crawl), scoring is one narrow per-row
  * projection — feature extraction, dot, sigmoid, all inside
  * whole-stage codegen; no shuffle, no UDF.
  *
  * Honesty note: the driver's synthetic corpus assigns `lang`
  * INDEPENDENTLY of the text (marker-word rates are identical across
  * langs), so the contract-query model is near-chance by
  * construction — the contract validates the fit/dump/score machinery
  * and its oracle parity, exactly as the PCA contract validates the
  * projection; QualityModelSpec demonstrates actual separation on a
  * corpus whose label is learnable.
  */
object QualityModel {

  /** Where the fitted weights are dumped so the SQL oracle can replay
    * the scoring (same convention as `KMeansIndex.centroidDumpPath`).
    */
  def weightsDumpPath: String =
    sys.props.getOrElse("graft.quality.dump", "/tmp/graft_oracle_quality_weights")

  /** Rows the fit sees at most — a deterministic hash sample past this
    * (the [[KMeansIndex.build]] discipline: training cost must scale
    * with the MODEL, not the corpus).
    */
  val fitCap: Long = 65536L

  /** The target-language marker list (the [[TextAnalysis.langMarkers]]
    * entry for the fit's proxy label) — the one genuinely predictive
    * feature; the generic signals carry the "quality" shape.
    */
  val targetMarkers: Seq[String] =
    TextAnalysis.langMarkers.toMap.apply("en")

  /** The feature vector, ORDER IS PART OF THE CONTRACT:
    * f0 stopword fraction, f1 type-token ratio, f2 mean word length,
    * f3 ln(1 + n_words), f4 target-marker fraction. Every entry is a
    * ratio of exact integers (or ln of one) — identical IEEE doubles
    * in both engines, so the score fold needs no per-feature
    * quantization.
    */
  def featuresCol: Column = {
    val ws = TextAnalysis.words(col("text"))
    val nW = size(ws).cast("double")
    array(
      size(filter(ws, w => w.isin(TextAnalysis.stopwords: _*))).cast("double") / nW,
      size(array_distinct(ws)).cast("double") / nW,
      aggregate(transform(ws, w => length(w).cast("long")), lit(0L),
        (acc, x) => acc + x).cast("double") / nW,
      log(lit(1.0) + nW),
      size(filter(ws, w => w.isin(targetMarkers: _*))).cast("double") / nW)
  }

  case class Weights(w: Array[Double], intercept: Double)

  /** Fit the classifier: label 1.0 where `lang = targetLang`. Returns
    * the weight vector on the ORIGINAL feature scale (MLlib
    * standardizes internally and transforms back).
    */
  def fit(docs: DataFrame, targetLang: String = "en",
      seed: Long = 42L): Weights = {
    val base = Partitioning.spread(docs)
    val n = docs.count()
    val trainRows = if (n <= fitCap) base else {
      val keepPerMille = math.max(1L, fitCap * 1000L / n)
      base.filter(pmod(xxhash64(col("doc_id"), lit(seed)), lit(1000L)) < keepPerMille)
    }
    val prepared = trainRows.select(
      when(col("lang") === targetLang, 1.0).otherwise(0.0).as("label"),
      array_to_vector(featuresCol).as("features"))
      .cache()
    val model = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setStandardization(true)
      .fit(prepared)
    prepared.unpersist() // training scratch — do not leave it to LRU
    Weights(model.coefficients.toArray, model.intercept)
  }

  /** Dump the fitted weights as one (weights, intercept) parquet row. */
  def dumpWeights(spark: org.apache.spark.sql.SparkSession, w: Weights,
      path: String = weightsDumpPath): Unit = {
    import spark.implicits._
    Seq((w.w.toSeq, w.intercept)).toDF("weights", "intercept").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Score every document: quality = sigmoid(w·f + b) rounded at 6 dp,
    * predicted = rounded quality ≥ 0.5 (the comparison reads the SAME
    * rounded value in both engines, so the boundary is deterministic).
    */
  def score(docs: DataFrame, w: Weights): DataFrame = {
    val z = VectorOps.dotProduct(featuresCol, typedLit(w.w.toSeq)) + lit(w.intercept)
    Partitioning.spread(docs)
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("quality"))
      .withColumn("predicted", col("quality") >= 0.5)
      .orderBy(col("doc_id"))
  }
}
