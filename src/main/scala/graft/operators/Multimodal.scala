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
      flatMapWithCodecs(it) { (writer, reader, id) =>
        val (w, h) = seededDims(id)
        val bytes = encodeWith(writer, fillImage(w, h, id))
        val img = decodeWith(reader, bytes)
        Iterator.single((id, bytes.length.toLong, img.getWidth, img.getHeight,
          img.getRaster.getNumBands))
      }
    }.toDF("media_id", "n_bytes", "width", "height", "channels")
      .orderBy(col("media_id"))
  }

  /** Per-partition codec hoisting, shared by every real-decode operator:
    * ImageIO's convenience API (ImageIO.read/write) builds and disposes a
    * reader/writer pair per CALL — at millions of images per partition
    * that churn dominates tiny-image decode, so one pair is hoisted per
    * partition, reused for every record, and disposed when the record
    * iterator drains.
    */
  private def flatMapWithCodecs[T, U](it: Iterator[T])(
      f: (javax.imageio.ImageWriter, javax.imageio.ImageReader, T) => IterableOnce[U]): Iterator[U] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("bmp").next()
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("bmp").next()
    var disposed = false
    val rows = it.flatMap(t => f(writer, reader, t))
    new Iterator[U] {
      def hasNext: Boolean = {
        val h = rows.hasNext
        if (!h && !disposed) { disposed = true; reader.dispose(); writer.dispose() }
        h
      }
      def next(): U = rows.next()
    }
  }

  private def encodeWith(writer: javax.imageio.ImageWriter,
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(img)
    ios.close()
    bos.toByteArray
  }

  private def decodeWith(reader: javax.imageio.ImageReader,
      bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    reader.setInput(iis)
    val img = reader.read(0) // full raster decode — the measured work
    iis.close()
    img
  }

  /** Fixture-formula constants, shared between the operators and the
    * contract oracle SQL (interpolated there from these fields, never
    * re-typed): seeded image dims, thumbnail target, frame container
    * layout, audio sample stream. One definition — a retuned operator
    * cannot silently drift from its oracle.
    */
  val DimBase = 8
  val DimMod = 16
  val ThumbW = 12
  val ThumbH = 12
  val FrameBase = 3
  val FrameMod = 3
  val FrameSeedMult = 37L
  val FrameStride = 2
  val AudioBaseSamples = 400
  val AudioStepSamples = 50
  val AudioRate = 8000
  val AudioHashA = 2654435761L
  val AudioHashB = 40503L

  /** Source dims for the seeded fixture image of a given id — shared by
    * the round-trip, resize, frame and feature contract paths (and
    * replayed closed-form by their oracles).
    */
  private def seededDims(id: Long): (Int, Int) =
    (DimBase + (id % DimMod).toInt, DimBase + ((id / DimMod) % DimMod).toInt)

  /** Thumbnail resize (decode → nearest-neighbor resample → re-encode) —
    * the standard media-pipeline normalization step. The resample uses
    * explicit integer mapping `src = dst·srcDim/dstDim` (floor), so the
    * resized raster is bit-deterministic, and `pix_sum` — the sum of the
    * 24-bit pixel values read back from the RESIZED image — is replayable
    * in closed form from the seed formula: an oracle that knows the seed
    * can verify the decode+resample actually touched every pixel without
    * being able to decode images itself. Real codec + raster work per
    * row; per-partition reader/writer reuse; no shuffle.
    */
  def imageResizeMeta(docs: DataFrame, dstW: Int = ThumbW, dstH: Int = ThumbH): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      flatMapWithCodecs(it) { (writer, reader, id) =>
        val (sw, sh) = seededDims(id)
        val src = decodeWith(reader, encodeWith(writer, fillImage(sw, sh, id)))
        val dst = new java.awt.image.BufferedImage(
          dstW, dstH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < dstH) {
          var x = 0
          while (x < dstW) {
            dst.setRGB(x, y, src.getRGB(x * sw / dstW, y * sh / dstH) & 0xffffff)
            x += 1
          }
          y += 1
        }
        // checksum reads back from the RESIZED raster — a resample that
        // wrote nothing (or sampled the wrong source pixel) breaks it
        var pixSum = 0L
        y = 0
        while (y < dstH) {
          var x = 0
          while (x < dstW) { pixSum += dst.getRGB(x, y) & 0xffffff; x += 1 }
          y += 1
        }
        val dstBytes = encodeWith(writer, dst)
        Iterator.single((id, sw, sh, dstW, dstH, dstBytes.length.toLong, pixSum))
      }
    }.toDF("media_id", "src_width", "src_height", "dst_width", "dst_height",
        "dst_bytes", "pix_sum")
      .orderBy(col("media_id"))
  }

  /** Deterministic multi-frame container parameters, shared with the
    * frame-sample oracle: `3 + id%3` frames, frame i seeded `id·37 + i`.
    */
  private def frameCount(id: Long): Int = FrameBase + (id % FrameMod).toInt
  private def frameSeed(id: Long, i: Int): Long = id * FrameSeedMult + i

  /** Build a deterministic video-like container for an id: magic `GVID`,
    * big-endian frame count, then length-prefixed BMP frames — the shape
    * a real container format (MP4/AVI) presents to a frame sampler:
    * opaque bytes whose frame boundaries must be walked, not guessed.
    */
  def encodeVideo(writer: javax.imageio.ImageWriter, id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val n = frameCount(id)
    out.writeBytes("GVID")
    out.writeInt(n)
    var i = 0
    while (i < n) {
      val seed = frameSeed(id, i)
      val (fw, fh) = seededDims(seed)
      val frame = encodeWith(writer, fillImage(fw, fh, seed))
      out.writeInt(frame.length)
      out.write(frame)
      i += 1
    }
    out.close()
    bos.toByteArray
  }

  /** Frame sampling over a video-like container: parse the container
    * (magic + count + length-prefixed frames), keep every `stride`-th
    * frame, REAL-decode each kept frame, emit its raster dims. The
    * container is built and then re-parsed from its serialized bytes, so
    * the boundary arithmetic is exercised for real — a parser that
    * mis-walks the length prefixes lands on undecodable bytes and fails
    * loudly. One row per sampled frame; per-partition codec reuse; no
    * shuffle.
    */
  def videoFrameSample(docs: DataFrame, stride: Int = FrameStride): DataFrame = {
    require(stride >= 1, s"videoFrameSample: stride must be >= 1, got $stride")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      flatMapWithCodecs(it) { (writer, reader, id) =>
        val container = encodeVideo(writer, id)
        val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(container))
        val magic = new Array[Byte](4)
        in.readFully(magic)
        require(new String(magic, "US-ASCII") == "GVID",
          s"videoFrameSample: bad container magic for media $id")
        val n = in.readInt()
        val rows = Vector.newBuilder[(Long, Int, Int, Int, Long)]
        var i = 0
        while (i < n) {
          val len = in.readInt()
          val frame = new Array[Byte](len)
          in.readFully(frame)
          if (i % stride == 0) {
            val img = decodeWith(reader, frame)
            rows += ((id, i, img.getWidth, img.getHeight, len.toLong))
          }
          i += 1
        }
        rows.result()
      }
    }.toDF("media_id", "frame_idx", "width", "height", "frame_bytes")
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Feature extraction over the decoded raster: per-channel pixel sums
    * (the 0th-moment color feature a vision pipeline starts from). Sums
    * are read from the DECODED image pixel by pixel, so the oracle —
    * which replays the seed formula per (x, y) in SQL — verifies that
    * real per-pixel raster work happened. Integer sums, bit-stable in
    * both engines; no shuffle.
    */
  def imageChannelStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      flatMapWithCodecs(it) { (writer, reader, id) =>
        val (w, h) = seededDims(id)
        val img = decodeWith(reader, encodeWith(writer, fillImage(w, h, id)))
        var sumR = 0L; var sumG = 0L; var sumB = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = img.getRGB(x, y)
            sumR += (v >> 16) & 0xff
            sumG += (v >> 8) & 0xff
            sumB += v & 0xff
            x += 1
          }
          y += 1
        }
        Iterator.single((id, w, h, sumR, sumG, sumB))
      }
    }.toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy(col("media_id"))
  }

  /** Deterministic audio fixture parameters, shared with the audio
    * oracle: `400 + id%16·50` mono samples at 8 kHz, sample i drawn from
    * a Knuth-hash stream shifted into signed 16-bit range.
    */
  private def audioSampleCount(id: Long): Int = AudioBaseSamples + (id % DimMod).toInt * AudioStepSamples
  private def audioSampleAt(seed: Long, i: Int): Int =
    (((seed * AudioHashA + i * AudioHashB) % 65536L) - 32768L).toInt

  /** Serialize the seeded fixture signal as a canonical RIFF/WAVE
    * container (44-byte header + 16-bit PCM LE frames) — written field
    * by field from the public spec, so the parser below exercises a real
    * third-party decode, not a private round trip.
    */
  def encodeWav(id: Long): Array[Byte] = {
    val n = audioSampleCount(id)
    val dataBytes = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(AudioRate) // sample rate
      .putInt(AudioRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) { buf.putShort(audioSampleAt(id, i).toShort); i += 1 }
    buf.array()
  }

  /** Audio feature extraction: parse the WAV container with the JDK's
    * `javax.sound.sampled` codec (real RIFF chunk walk + PCM frame
    * reads — not our own parser), then compute signal features from the
    * decoded samples: sum of squares, peak amplitude, RMS. The oracle
    * replays the sample formula per index in SQL, so a parser that
    * misreads the format block or drops frames breaks the hash. Integer
    * features are bit-stable; `rms` is one IEEE-correctly-rounded
    * divide + sqrt over exact integers, identical in both engines. Per
    * row, no shuffle.
    */
  def audioFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      // per-partition codec hoisting, same lever as the ImageIO paths:
      // AudioSystem.getAudioInputStream re-runs SPI provider discovery
      // per CALL (each non-matching provider parses and throws
      // internally) — ~0.3 ms/row that dominates tiny-clip decode. The
      // JDK's real readers are public SPI classes; resolve them once
      // per partition and go to the matching provider directly.
      val providers = {
        val it = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        val b = List.newBuilder[javax.sound.sampled.spi.AudioFileReader]
        while (it.hasNext) b += it.next()
        b.result()
      }
      var wavReader: javax.sound.sampled.spi.AudioFileReader = null
      def open(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
        if (wavReader != null)
          return wavReader.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        val found = providers.iterator.flatMap { p =>
          try Some((p, p.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))))
          catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
        }.take(1).toList
        found match {
          case (p, s) :: _ => wavReader = p; s
          case _ => throw new javax.sound.sampled.UnsupportedAudioFileException(
            "audioFeatures: no AudioFileReader provider claims the payload")
        }
      }
      it.map { id =>
        val bytes = encodeWav(id)
        val ais = open(bytes)
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"audioFeatures: unexpected decoded format for media $id: $fmt")
        val pcm = ais.readAllBytes()
        ais.close()
        val n = pcm.length / 2
        var sumSq = 0L; var peak = 0
        var i = 0
        while (i < n) {
          val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
          sumSq += v.toLong * v
          val a = math.abs(v)
          if (a > peak) peak = a
          i += 1
        }
        (id, fmt.getSampleRate.toInt, n.toLong, bytes.length.toLong, sumSq, peak,
          math.sqrt(sumSq.toDouble / n))
      }
    }.toDF("media_id", "sample_rate", "n_samples", "n_bytes", "sum_sq", "peak", "rms")
      .orderBy(col("media_id"))
  }

  /** Lenient decode with a quarantine lane: the production posture for
    * a 100 TB media scan, where some payloads are ALWAYS corrupt and a
    * decoder that throws kills the job while one that fakes dimensions
    * ships garbage. Every row comes back — `status` `ok` with real
    * decoded dims, or `error` with null dims — so the caller can gate
    * on an error budget and route the quarantine lane to storage.
    * [[decodeMeta]] (strict) remains the right default where corruption
    * is a pipeline bug, not an input property.
    */
  def decodeMetaLenient(media: Dataset[MediaRecord],
      decoder: Decoder = ImageIoDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        md.reset()
        val digest = graft.functions.HashUtil.hex(md.digest(r.content))
        try {
          val (w, h, c) = decoder.decode(r.modality, r.content)
          (r.media_id, r.modality, r.content.length.toLong, digest,
            "ok", Option(w), Option(h), Option(c))
        } catch {
          // quarantine, don't kill: any decoder failure (unclaimed
          // format, truncated raster, codec exception) becomes a row
          case scala.util.control.NonFatal(_) =>
            (r.media_id, r.modality, r.content.length.toLong, digest,
              "error", None, None, None)
        }
      }
    }.toDF("media_id", "modality", "n_bytes", "sha256", "status",
        "width", "height", "channels")
  }

  /** Contract fixture for the quarantine path: a real BMP per doc, with
    * every `corruptEvery`-th payload truncated to its header bytes — a
    * deterministic corruption the oracle can replay as `doc_id % k = 0`.
    * Runs the real decoder over the mixed stream and reports per-status
    * metadata (null dims on the quarantine lane).
    */
  def quarantineRoundTrip(docs: DataFrame, corruptEvery: Int = 7): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val decoded = docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      flatMapWithCodecs(it) { (writer, reader, id) =>
        val (w, h) = seededDims(id)
        val whole = encodeWith(writer, fillImage(w, h, id))
        val bytes = if (id % corruptEvery == 0) whole.take(20) else whole
        val row = try {
          val img = decodeWith(reader, bytes)
          (id, bytes.length.toLong, "ok",
            Option(img.getWidth), Option(img.getHeight))
        } catch {
          case scala.util.control.NonFatal(_) =>
            (id, bytes.length.toLong, "error", None: Option[Int], None: Option[Int])
        }
        Iterator.single(row)
      }
    }.toDF("media_id", "n_bytes", "status", "width", "height")
    decoded.orderBy(col("media_id"))
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
