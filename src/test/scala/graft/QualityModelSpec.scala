package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // a corpus whose label IS learnable from the features: "en" docs are
  // stopword/marker-rich prose-like soup, others are marker-free
  private def learnable = {
    val rich = Seq("the", "a", "fast", "key", "of", "to", "is", "in")
    val poor = Seq("wort", "zahl", "blau", "grun", "rot", "acht", "neun")
    (0L until 40L).map { i =>
      val en = i % 2 == 0
      val vocab = if (en) rich else poor
      val text = (0 until 30).map(j => vocab((i + j * 7).toInt % vocab.size)).mkString(" ")
      (i, text, if (en) "en" else "de")
    }.toDF("doc_id", "text", "lang")
  }

  test("fit learns a separating model when the label is learnable") {
    val d = learnable
    val w = QualityModel.fit(d)
    val scored = QualityModel.score(d, w).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val (en, de) = scored.partition(_._1 % 2 == 0)
    assert(en.map(_._2).min > de.map(_._2).max,
      "every stopword-rich doc must outscore every stopword-free doc")
    assert(en.forall(_._3) && de.forall(!_._3),
      "the 0.5 cut must separate the two classes on this corpus")
  }

  test("score equals a driver-side sigmoid fold over the same weights") {
    val d = learnable.limit(4)
    val w = QualityModel.Weights(Array(0.5, -1.0, 0.25, 0.1, 2.0), -0.75)
    val texts = d.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val got = QualityModel.score(d, w).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    for ((id, text) <- texts) {
      val ws = text.trim.split("\\s+")
      val nW = ws.length.toDouble
      val f = Array(
        ws.count(operators.TextAnalysis.stopwords.contains).toDouble / nW,
        ws.distinct.length.toDouble / nW,
        ws.map(_.length.toLong).sum.toDouble / nW,
        math.log(1.0 + nW),
        ws.count(QualityModel.targetMarkers.contains).toDouble / nW)
      val z = f.zip(w.w).map { case (a, b) => a * b }.sum + w.intercept
      val expect = BigDecimal(1.0 / (1.0 + math.exp(-z)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) === expect, s"doc $id")
    }
  }

  test("score is total on an empty corpus with fixed weights") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val w = QualityModel.Weights(Array(1.0, 1.0, 1.0, 1.0, 1.0), 0.0)
    assert(QualityModel.score(empty, w).count() == 0)
  }

  test("rocAuc equals the hand-computed tie-aware Mann-Whitney statistic") {
    // pos .9 beats both negs; pos .7 beats only .6 → 3/4 pairs = 0.75
    val r = QualityModel.rocAuc(
      Seq((0.9, 1L), (0.8, 0L), (0.7, 1L), (0.6, 0L)).toDF("quality", "label"))
      .head()
    assert(r.getDouble(0) === 0.75)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    // tied pair counts half: pos .9; pos/neg tied at .5; neg .1
    // pairs: (.9 vs .5)=1, (.9 vs .1)=1, (.5 vs .5)=0.5, (.5 vs .1)=1 → 3.5/4
    val tied = QualityModel.rocAuc(
      Seq((0.9, 1L), (0.5, 1L), (0.5, 0L), (0.1, 0L)).toDF("quality", "label"))
      .head().getDouble(0)
    assert(tied === 0.875)
  }

  test("ksStatistic equals the hand-computed max CDF gap") {
    // pos at .9 .7; neg at .8 .6: at s=.6 |0-0.5|=.5; .7 |.5-.5|=0;
    // .8 |.5-1|=.5; .9 |1-1|=0 → KS = 0.5
    val r = QualityModel.ksStatistic(
      Seq((0.9, 1L), (0.8, 0L), (0.7, 1L), (0.6, 0L)).toDF("quality", "label"))
      .head()
    assert(r.getDouble(0) === 0.5)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    // perfect separation: KS = 1
    val perfect = QualityModel.ksStatistic(
      Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L)).toDF("quality", "label"))
      .head().getDouble(0)
    assert(perfect === 1.0)
    // identical distributions (fully tied): KS = 0
    val tied = QualityModel.ksStatistic(
      Seq((0.5, 1L), (0.5, 0L), (0.5, 1L), (0.5, 0L)).toDF("quality", "label"))
      .head().getDouble(0)
    assert(tied === 0.0)
    // one class: undefined
    assert(QualityModel.ksStatistic(
      Seq((0.9, 1L), (0.8, 1L)).toDF("quality", "label")).head().isNullAt(0))
  }

  test("rocAuc: all-tied 0.5, perfect 1.0, reversed 0.0, single-class null") {
    def auc(rows: Seq[(Double, Long)]): org.apache.spark.sql.Row =
      QualityModel.rocAuc(rows.toDF("quality", "label")).head()
    assert(auc(Seq((0.3, 1L), (0.3, 0L), (0.3, 1L), (0.3, 0L))).getDouble(0) === 0.5)
    assert(auc(Seq((0.9, 1L), (0.8, 1L), (0.2, 0L))).getDouble(0) === 1.0)
    assert(auc(Seq((0.9, 0L), (0.1, 1L))).getDouble(0) === 0.0)
    val single = auc(Seq((0.9, 1L), (0.8, 1L)))
    assert(single.isNullAt(0), "AUC undefined for one class")
    assert(single.getLong(1) == 2L && single.getLong(2) == 0L)
  }

  test("unquantized score domain fails loudly in rocAuc and percentileRanks") {
    // the 6-dp quantization contract of score() is what bounds the
    // cumulative windows — a raw continuous score column now raises
    // instead of silently single-task-sorting the corpus
    val wide = (1 to 40).map(i => (i / 1000.0, (i % 2).toLong, i.toLong))
      .toDF("quality", "label", "doc_id")
    val ex = intercept[Exception] {
      QualityModel.rocAuc(wide.select(col("quality"), col("label")),
        domainLimit = 10L).collect()
    }
    val msg1 = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg1.contains("QualityModel.rocAuc") && msg1.contains("bounded-domain"))
    val ex2 = intercept[Exception] {
      QualityModel.percentileRanks(wide, domainLimit = 10L).collect()
    }
    val msg2 = Option(ex2.getMessage).getOrElse("") +
      Option(ex2.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg2.contains("QualityModel.percentileRanks") &&
      msg2.contains("bounded-domain"))
    // within the limit both still run
    assert(QualityModel.rocAuc(wide.select(col("quality"), col("label")),
      domainLimit = 40L).count() == 1L)
  }

  test("calibrationBins: exhaustive partition, exact fractions, edge binning") {
    val scored = Seq(
      (0.05, 0L), (0.05, 1L),        // bin 0: frac_pos 0.5
      (0.95, 1L), (0.951, 1L),       // bin 9: frac_pos 1.0
      (1.0, 1L))                     // quality 1.0 clamps into bin 9
      .toDF("quality", "label")
    val bins = QualityModel.calibrationBins(scored).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(bins.map(_._2).sum == 5L, "bins must partition the corpus")
    assert(bins.map(_._1).toSeq == Seq(0, 9))
    val b0 = bins.find(_._1 == 0).get
    assert(b0._2 == 2L && b0._3 === 0.05 && b0._4 === 0.5)
    val b9 = bins.find(_._1 == 9).get
    assert(b9._2 == 3L && b9._4 === 1.0)
  }

  test("percentileRanks equals SQL percent_rank: ties share, extremes pin") {
    // scores .1, .5, .5, .9 → percent_rank 0, 1/3, 1/3, 1
    val out = QualityModel.percentileRanks(Seq(
      (1L, 0.1), (2L, 0.5), (3L, 0.5), (4L, 0.9)).toDF("doc_id", "quality"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) === 0.0)
    assert(out(2L) === 0.333333 && out(3L) === 0.333333)
    assert(out(4L) === 1.0)
    // single row: rank undefined → null, not 0-division
    val single = QualityModel.percentileRanks(
      Seq((1L, 0.5)).toDF("doc_id", "quality")).head()
    assert(single.isNullAt(2))
  }

  test("classifier evaluation composes: corpus AUC is high when learnable") {
    val d = learnable
    val w = QualityModel.fit(d)
    val scored = QualityModel.score(d, w).join(
      d.select(col("doc_id"),
        (col("lang") === "en").cast("long").as("label")), Seq("doc_id"))
    val auc = QualityModel.rocAuc(scored).head().getDouble(0)
    // the learnable corpus separates perfectly (fit spec above), so the
    // rank statistic must saturate
    assert(auc == 1.0, s"expected AUC 1.0 on the separable corpus, got $auc")
  }
}
