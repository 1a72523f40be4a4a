package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Source/sink round-trips (SURVEY.md §2.9 scans/sources/sinks): the
  * engine's tables survive parquet, orc, json, and csv; schemas are
  * re-applied on schemaless formats.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val base = spark.read
    .parquet("/root/testdata/sf0.001/customer.parquet").cache()
  private lazy val dir = java.nio.file.Files.createTempDirectory("graft-io").toString

  private def roundtrip(fmt: String): Unit = {
    val path = s"$dir/$fmt"
    base.write.format(fmt).mode("overwrite")
      .option("header", "true") // csv only; ignored elsewhere
      .save(path)
    val back = spark.read.format(fmt)
      .schema(base.schema) // csv/json lose types without it
      .option("header", "true")
      .load(path)
    assert(back.count() == base.count(), fmt)
    val a = base.orderBy("c_custkey").collect().map(_.toSeq)
    val b = back.orderBy("c_custkey").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, s"$fmt round-trip mismatch")
  }

  test("parquet round-trip")(roundtrip("parquet"))
  test("orc round-trip")(roundtrip("orc"))
  test("json round-trip")(roundtrip("json"))
  test("csv round-trip")(roundtrip("csv"))

  test("embeddings (nested array column) round-trip via json") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val path = s"$dir/emb_json"
    emb.write.mode("overwrite").json(path)
    val back = spark.read.schema(emb.schema).json(path)
    assert(back.count() == emb.count())
    val origRow = emb.filter(col("vec_id") === 7).head().getSeq[Float](1)
    val backRow = back.filter(col("vec_id") === 7).head().getSeq[Float](1)
    assert(origRow == backRow) // float values survive the text format
  }
}
