package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension; SURVEY.md §2.9).
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * real Spark-side machinery — schema, partition-parallel batched decode
  * via mapPartitions, fixed-size chunking, metadata projection — is
  * implemented and tested; the codec itself is a pluggable trait whose
  * production implementation would wrap an image/audio library (not
  * available in this container) and is therefore STUBBED with a
  * deterministic fake that derives plausible dimensions from the content
  * digest.
  */
object Multimodal {

  case class MediaRecord(media_id: Long, modality: String, content: Array[Byte],
      source: String)
  case class DecodedMeta(media_id: Long, modality: String, n_bytes: Long,
      sha256: String, width: Int, height: Int, channels: Int)

  /** Pluggable decoder: content bytes → (width, height, channels). */
  trait Decoder extends Serializable {
    def decode(modality: String, content: Array[Byte]): (Int, Int, Int)
  }

  /** STUB decoder — deterministic fake. A production decoder would be
    * e.g. `javax.imageio`/ffmpeg here; this container has neither, so
    * dimensions are derived from the sha-256 digest and byte length
    * (stable, content-sensitive, and cheap — which is exactly what the
    * plumbing tests need).
    */
  object FakeDecoder extends Decoder {
    def decode(modality: String, content: Array[Byte]): (Int, Int, Int) = {
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(content)
      val w = 64 + (((d(0) & 0xff) % 32) * 16)
      val h = 64 + (((d(1) & 0xff) % 18) * 16)
      val c = if (modality == "audio") 1 else 3
      (w, h, c)
    }
  }

  /** Treat a text table as a media table (the test corpus has no binary
    * column): content = utf-8 bytes, modality assigned round-robin.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("modality"),
      col("text").cast("binary").as("content"),
      col("source"))

  /** Batched partition-parallel decode — the mapPartitions shape a real
    * codec needs (amortizes per-batch codec init, streams record
    * iterators, never collects). This is the Scala analogue of a Pandas
    * `mapInPandas` decode UDF.
    */
  def decodeMeta(media: Dataset[MediaRecord], decoder: Decoder = FakeDecoder)(
      implicit enc: Encoder[DecodedMeta]): Dataset[DecodedMeta] =
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts, etc.)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        md.reset()
        val digest = graft.functions.HashUtil.hex(md.digest(r.content))
        val (w, h, c) = decoder.decode(r.modality, r.content)
        DecodedMeta(r.media_id, r.modality, r.content.length.toLong, digest, w, h, c)
      }
    }

  /** Pure-SQL metadata projection (no decode): byte length + digest +
    * the same deterministic fake dimensions — oracle-checkable shape.
    */
  def metaSql(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("modality"),
      length(col("content")).cast("long").as("n_bytes"),
      sha2(col("content"), 256).as("sha256"))
      .withColumn("width",
        (lit(64) + (conv(substring(col("sha256"), 1, 2), 16, 10).cast("int") % 32) * 16))
      .withColumn("height",
        (lit(64) + (conv(substring(col("sha256"), 3, 2), 16, 10).cast("int") % 18) * 16))
      .withColumn("channels", when(col("modality") === "audio", 1).otherwise(3))
      .orderBy(col("media_id"))

  /** Fixed-size chunking (e.g. frame sampling / shard upload): explode
    * each payload into `chunkSize`-byte binary slices with an index.
    */
  def chunk(media: DataFrame, chunkSize: Int): DataFrame =
    media
      .withColumn("n_chunks",
        ceil(length(col("content")).cast("double") / chunkSize).cast("int"))
      // 0-byte payloads emit NO chunks: sequence(0, -1) infers step -1
      // and would yield spurious chunk_idx rows [0, -1]
      .filter(col("n_chunks") >= 1)
      .withColumn("chunk_idx", explode(sequence(lit(0), col("n_chunks") - 1)))
      .withColumn("chunk",
        expr(s"substring(content, chunk_idx * $chunkSize + 1, $chunkSize)"))
      .select(col("media_id"), col("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_bytes"), col("chunk"))
}
