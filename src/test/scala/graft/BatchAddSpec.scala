package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class BatchAddSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def glyphDf(n: Int, dim: Int = 4) =
    (0 until n).map(i => IGlyph(s"b$i", i, i % 10, Array.fill(dim)(i.toFloat)))
      .toDS().toDF()

  test("addIGlyphsDF: distributed batch insert, audit, counts") {
    val db = new VectorFieldDB(spark, 4)
    assert(db.addIGlyphsDF(glyphDf(20)) == 20L)
    assert(db.iglyphs.count() == 20)
    assert(db.changeHistory.collect().head.getAs[String]("action") == "ADD_IGLYPH")
  }

  test("addIGlyphsDF: rejects wrong dim, bad ranges, and existing ids") {
    val db = new VectorFieldDB(spark, 4)
    db.addIGlyphsDF(glyphDf(5))
    intercept[IllegalArgumentException](db.addIGlyphsDF(glyphDf(5))) // dups
    intercept[IllegalArgumentException](db.addIGlyphsDF(
      Seq(IGlyph("x", 1, 1, Array(1f, 2f))).toDS().toDF())) // wrong dim
    intercept[IllegalArgumentException](db.addIGlyphsDF(
      Seq(IGlyph("y", 144000, 1, Array.fill(4)(1f))).toDS().toDF())) // range
    assert(db.iglyphs.count() == 5)
  }
}
