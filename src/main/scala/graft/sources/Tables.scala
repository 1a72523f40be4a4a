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
    // session-scoped by necessity: the legacy flag has no per-read
    // option and is consulted when the scan plans AND executes, so it
    // cannot be set-and-restored around this lazy read. Side effect: any
    // later TIMESTAMP(NANOS) parquet in this session also reads as long.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      // floor division, not `div` (truncation toward zero): a pre-epoch
      // nanos value like -1500 must floor to -2µs, not truncate to -1µs,
      // or boundary comparisons flip vs an oracle that floors
      .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
  }

  /** The reference's address-space derivation — THE single definition of
    * the vec_id → (glyph_id, ctx) mapping and its 144000/10 bounds
    * (`/root/reference/aeuc_vector_db/types.py:121-128`); operators that
    * need address columns apply this rather than re-deriving inline.
    */
  def withAddressSpace(df: DataFrame): DataFrame =
    df.withColumn("glyph_id", col("vec_id") % 144000L)
      .withColumn("outer_context_id", (col("vec_id") % 10L).cast("int"))

  /** Embeddings with the reference's address space derived from vec_id. */
  def embeddingsAddressed(s: SparkSession, dir: String): DataFrame =
    withAddressSpace(embeddings(s, dir))
}
