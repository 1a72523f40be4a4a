package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/tests/test_types.py: validation boundaries and
  * round-trip.
  */
class ModelSpec extends AnyFunSuite {

  test("glyph_id boundaries: 0 and 143999 accepted, 144000 rejected") {
    Validation.requireGlyphId(0)
    Validation.requireGlyphId(143999)
    intercept[IllegalArgumentException](Validation.requireGlyphId(144000))
    intercept[IllegalArgumentException](Validation.requireGlyphId(-1))
  }

  test("outer_context_id boundaries: 9 accepted, 10 rejected") {
    Validation.requireCtx(0)
    Validation.requireCtx(9)
    intercept[IllegalArgumentException](Validation.requireCtx(10))
    intercept[IllegalArgumentException](Validation.requireCtx(-1))
  }

  test("embedding dim validation") {
    Validation.requireDim(Array(1f, 2f, 3f, 4f), 4)
    intercept[IllegalArgumentException](Validation.requireDim(Array(1f, 2f), 4))
    intercept[IllegalArgumentException](Validation.requireDim(null, 4))
    intercept[IllegalArgumentException](Validation.requireNonEmpty(Array.empty[Float]))
  }

  test("Dataset round-trip preserves IGlyph fields") {
    val spark = TestSpark.spark
    import spark.implicits._
    val g = IGlyph("id-1", 42, 3, Array(1f, 2f, 3f, 4f), label = "obs",
      meta = """{"k":"v","n":1}""")
    val back = Seq(g).toDS().collect().head
    assert(back.iglyph_id == "id-1" && back.glyph_id == 42 &&
      back.outer_context_id == 3 && back.embedding.toSeq == Seq(1f, 2f, 3f, 4f) &&
      back.label == "obs" && back.meta == """{"k":"v","n":1}""" && back.version == "1.0.0")
  }

  test("JSON round-trip via toJSON / read.json") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ds = Seq(
      IGlyph("a", 1, 1, Array(1f, 0f)),
      IGlyph("b", 2, 2, Array(0f, 1f), label = "x")).toDS()
    val json = ds.toJSON
    val back = spark.read.schema(ds.toDF().schema).json(json).as[IGlyph]
      .collect().sortBy(_.iglyph_id)
    assert(back.length == 2 && back(0).iglyph_id == "a" &&
      back(1).label == "x" && back(0).embedding.toSeq == Seq(1f, 0f))
  }

  test("VectorEntry fingerprint: 64 hex chars, content-sensitive") {
    // VectorOps.fingerprint = sha2-256 over the embedding JSON
    // (documented Blake2b deviation)
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def fp(e: Seq[Float]): String =
      Seq(Tuple1(e)).toDF("embedding")
        .select(functions.VectorOps.fingerprint(col("embedding"))).head().getString(0)
    val f1 = fp(Seq(1f, 2f)); val f2 = fp(Seq(1f, 2.0001f))
    assert(f1.length == 64 && f1.matches("[0-9a-f]{64}") && f1 != f2)
    // deterministic: same content twice gives the same fingerprint
    assert(fp(Seq(1f, 2f)) == f1)
  }
}
