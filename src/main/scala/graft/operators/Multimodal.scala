package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension; SURVEY.md §2.9).
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * Spark-side machinery — schema, partition-parallel batched decode via
  * mapPartitions, fixed-size chunking, metadata projection — plus a REAL
  * image decoder: [[ImageIoDecoder]] wraps `javax.imageio` (pure JVM —
  * BMP/PNG/GIF/JPEG readers ship with the JDK, no native codecs) and is
  * the default. [[FakeDecoder]] remains for plumbing tests whose
  * payloads are not decodable images (the test corpus is text), and as
  * the stand-in shape for modalities whose codecs the container lacks
  * (audio/video).
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

  /** REAL image decoder over `javax.imageio` — pure-JVM BMP/PNG/GIF/JPEG
    * support built into the JDK, so it runs on any executor with no
    * native codec install. Returns the decoded raster's true
    * (width, height, bands). Fails loudly on an undecodable payload:
    * silently faking dimensions for a corrupt image is how a 100 TB
    * media pipeline ships garbage downstream.
    */
  object ImageIoDecoder extends Decoder {
    def decode(modality: String, content: Array[Byte]): (Int, Int, Int) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      require(img != null, s"ImageIoDecoder: undecodable $modality payload " +
        s"(${content.length} bytes) — no registered ImageReader claims it")
      (img.getWidth, img.getHeight, img.getRaster.getNumBands)
    }
  }

  /** Deterministic in-memory BMP encoder (24bpp, TYPE_3BYTE_BGR) — the
    * fixture generator for the real-decode path: pixels derive from
    * (seed, x, y), so payload bytes are reproducible, and the BMP
    * container size is closed-form (54-byte header + 4-byte-aligned
    * rows: 54 + ((24·w+31)/32)·4·h — verified against ImageIO's writer),
    * which lets a SQL oracle check that a real encode→decode round trip
    * happened without being able to decode images itself.
    */
  private def fillImage(width: Int, height: Int, seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (seed * 1103515245L + x * 31L + y * 17L) & 0xffffff
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(fillImage(width, height, seed), "bmp", bos)
    bos.toByteArray
  }

  /** STUB decoder — deterministic fake for payloads that are NOT real
    * images (the text-derived test corpus, and modalities whose codecs
    * this container lacks): dimensions derive from the sha-256 digest
    * and byte length (stable, content-sensitive, cheap — what the
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
    * `mapInPandas` decode UDF. Defaults to the REAL [[ImageIoDecoder]];
    * pass [[FakeDecoder]] for non-image payloads.
    */
  def decodeMeta(media: Dataset[MediaRecord], decoder: Decoder = ImageIoDecoder)(
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

  /** Real-decode contract path: one deterministic BMP per row (dims
    * derive from doc_id), encoded and then decoded inside the partition
    * by the real [[ImageIoDecoder]] — actual codec work, batched and
    * partition-parallel — reduced to scalar metadata a SQL oracle can
    * verify in closed form (seed dims + the BMP container-size formula).
    * A decoder that misreads the raster, or a fake that never decodes,
    * breaks the hash.
    */
  def imageRoundTripMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      // per-partition codec init, for real: ImageIO's convenience API
      // (ImageIO.read/write) builds and disposes a reader/writer pair
      // per CALL — at millions of images per partition that churn
      // dominates tiny-image decode, so one pair is hoisted here and
      // reused for every record, disposed when the iterator drains
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("bmp").next()
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("bmp").next()
      var disposed = false
      val rows = it.map { id =>
        val w = 8 + (id % 16).toInt
        val h = 8 + ((id / 16) % 16).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(fillImage(w, h, id))
        ios.close()
        val bytes = bos.toByteArray
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        reader.setInput(iis)
        val img = reader.read(0) // full raster decode — the measured work
        iis.close()
        (id, bytes.length.toLong, img.getWidth, img.getHeight,
          img.getRaster.getNumBands)
      }
      new Iterator[(Long, Long, Int, Int, Int)] {
        def hasNext: Boolean = {
          val h = rows.hasNext
          if (!h && !disposed) { disposed = true; reader.dispose(); writer.dispose() }
          h
        }
        def next(): (Long, Long, Int, Int, Int) = rows.next()
      }
    }.toDF("media_id", "n_bytes", "width", "height", "channels")
      .orderBy(col("media_id"))
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
