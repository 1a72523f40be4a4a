package graft

import org.scalatest.funsuite.AnyFunSuite
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
}
