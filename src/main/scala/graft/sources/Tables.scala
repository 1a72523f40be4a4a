package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central readers for the driver-provided parquet tables
  * (`/root/repo/TESTDATA.md`). One place owns the quirks: the events
  * table's TIMESTAMP(NANOS) encoding, and the derived reference
  * address-space columns for the embeddings table.
  */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")

  def documents(s: SparkSession, dir: String): DataFrame = table(s, dir, "documents")

  /** events is written with TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; read nanos as long and convert to a microsecond
    * timestamp. Integer `div` — a double division would be inexact
    * here (epoch nanos exceed double's 2^53 range, ulp = 256 ns).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Embeddings with the reference's address space derived from vec_id:
    * glyph_id = vec_id % 144000, outer_context_id = vec_id % 10
    * (`/root/reference/aeuc_vector_db/types.py:121-128` bounds).
    */
  def embeddingsAddressed(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .withColumn("glyph_id", col("vec_id") % 144000L)
      .withColumn("outer_context_id", (col("vec_id") % 10L).cast("int"))
}
