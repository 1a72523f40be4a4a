package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRecord, DecodedMeta}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val media = Seq(
    MediaRecord(1, "image", "hello world of pixels".getBytes("UTF-8"), "s1"),
    MediaRecord(2, "audio", "pcm pcm pcm".getBytes("UTF-8"), "s1"),
    MediaRecord(3, "video", Array.fill[Byte](1000)(7), "s2"))

  test("decodeMeta: partition-parallel decode with deterministic stub") {
    // text payloads are not decodable images — the stub decoder applies
    val out = Multimodal.decodeMeta(media.toDS(), Multimodal.FakeDecoder)
      .collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out.forall(m => m.sha256.length == 64 && m.width >= 64 && m.height >= 64))
    assert(out(1).channels == 1 && out(0).channels == 3) // audio mono stub
    assert(out(2).n_bytes == 1000)
    // deterministic: same content → same fake dimensions
    val again = Multimodal.decodeMeta(media.toDS(), Multimodal.FakeDecoder)
      .collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
  }

  test("decodeMeta default ImageIoDecoder: real BMP/PNG dims from real bytes") {
    val png = {
      val img = new java.awt.image.BufferedImage(17, 5,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val real = Seq(
      MediaRecord(1, "image", Multimodal.encodeBmp(23, 10, seed = 42L), "s1"),
      MediaRecord(2, "image", png, "s1"))
    val out = Multimodal.decodeMeta(real.toDS()).collect().sortBy(_.media_id)
    assert(out(0).width == 23 && out(0).height == 10 && out(0).channels == 3)
    assert(out(1).width == 17 && out(1).height == 5)
    // 24bpp BMP container size is closed-form: header + 4-byte-aligned rows
    assert(out(0).n_bytes == 54 + ((24 * 23 + 31) / 32) * 4 * 10)
    // a non-image payload fails loudly, not with fake dimensions
    val bad = Seq(MediaRecord(3, "image", "not an image".getBytes("UTF-8"), "s1"))
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(bad.toDS()).collect()
    }
    assert(ex.getMessage.contains("undecodable") ||
      Option(ex.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("imageRoundTripMeta: encode→ImageIO-decode lands on seeded dims") {
    val docs = Seq((0L, "a"), (17L, "b"), (255L, "c")).toDF("doc_id", "text")
    val out = Multimodal.imageRoundTripMeta(docs).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
        r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("channels")))
    def expected(id: Long) = {
      val w = 8 + (id % 16).toInt; val h = 8 + ((id / 16) % 16).toInt
      (id, (54 + ((24 * w + 31) / 32) * 4 * h).toLong, w, h, 3)
    }
    assert(out.toSeq == Seq(0L, 17L, 255L).map(expected))
  }

  test("metaSql matches mapPartitions decode on shared fields") {
    val ds = media.toDS().toDF()
    val viaSql = Multimodal.metaSql(ds).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
        r.getAs[String]("sha256"), r.getAs[Int]("channels"))).sortBy(_._1)
    val viaMp = Multimodal.decodeMeta(media.toDS(), Multimodal.FakeDecoder).collect()
      .map(m => (m.media_id, m.n_bytes, m.sha256, m.channels)).sortBy(_._1)
    assert(viaSql.toSeq == viaMp.toSeq)
  }

  /** Reference pixel value at (x, y) of the seeded fixture image — the
    * same closed form the SQL oracles replay.
    */
  private def pix(seed: Long, x: Int, y: Int): Long =
    (seed * 1103515245L + x * 31L + y * 17L) & 0xffffff

  test("imageResizeMeta: nearest-neighbor resample, checksum from the resized raster") {
    val docs = Seq((5L, "a"), (100L, "b"), (255L, "c")).toDF("doc_id", "text")
    val out = Multimodal.imageResizeMeta(docs, dstW = 12, dstH = 12).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("src_width"),
        r.getAs[Int]("src_height"), r.getAs[Int]("dst_width"),
        r.getAs[Int]("dst_height"), r.getAs[Long]("dst_bytes"),
        r.getAs[Long]("pix_sum")))
    def expected(id: Long) = {
      val sw = 8 + (id % 16).toInt; val sh = 8 + ((id / 16) % 16).toInt
      val sum = (for { y <- 0 until 12; x <- 0 until 12 }
        yield pix(id, x * sw / 12, y * sh / 12)).sum
      (id, sw, sh, 12, 12, (54 + ((24 * 12 + 31) / 32) * 4 * 12).toLong, sum)
    }
    assert(out.toSeq == Seq(5L, 100L, 255L).map(expected))
  }

  test("videoFrameSample: container walk + per-frame real decode") {
    // ids 0,1,2 → 3,4,5 frames; stride 2 keeps idx {0,2}, {0,2}, {0,2,4}
    val docs = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "text")
    val out = Multimodal.videoFrameSample(docs, stride = 2).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx"),
        r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Long]("frame_bytes")))
    def expected(id: Long, i: Int) = {
      val seed = id * 37 + i
      val fw = 8 + (seed % 16).toInt; val fh = 8 + ((seed / 16) % 16).toInt
      (id, i, fw, fh, (54 + ((24 * fw + 31) / 32) * 4 * fh).toLong)
    }
    val want = Seq((0L, 0), (0L, 2), (1L, 0), (1L, 2), (2L, 0), (2L, 2), (2L, 4))
      .map { case (id, i) => expected(id, i) }
    assert(out.toSeq == want)
  }

  test("imageChannelStats: channel sums from the decoded raster match the seed formula") {
    val docs = Seq((7L, "a"), (42L, "b")).toDF("doc_id", "text")
    val out = Multimodal.imageChannelStats(docs).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("width"),
        r.getAs[Int]("height"), r.getAs[Long]("sum_r"), r.getAs[Long]("sum_g"),
        r.getAs[Long]("sum_b")))
    def expected(id: Long) = {
      val w = 8 + (id % 16).toInt; val h = 8 + ((id / 16) % 16).toInt
      val vs = for { y <- 0 until h; x <- 0 until w } yield pix(id, x, y)
      (id, w, h, vs.map(v => (v >> 16) & 0xff).sum,
        vs.map(v => (v >> 8) & 0xff).sum, vs.map(_ & 0xff).sum)
    }
    assert(out.toSeq == Seq(7L, 42L).map(expected))
  }

  test("audioFeatures: javax.sound parse of the RIFF container matches the sample formula") {
    val docs = Seq((3L, "a"), (18L, "b")).toDF("doc_id", "text")
    val out = Multimodal.audioFeatures(docs).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("sample_rate"),
        r.getAs[Long]("n_samples"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("sum_sq"), r.getAs[Int]("peak"), r.getAs[Double]("rms")))
    def expected(id: Long) = {
      val n = 400 + (id % 16).toInt * 50
      val vs = (0 until n).map(i => (((id * 2654435761L + i * 40503L) % 65536L) - 32768L).toInt)
      val sumSq = vs.map(v => v.toLong * v).sum
      (id, 8000, n.toLong, (44 + 2 * n).toLong, sumSq, vs.map(math.abs).max,
        math.sqrt(sumSq.toDouble / n))
    }
    assert(out.toSeq == Seq(3L, 18L).map(expected))
    // a corrupt container fails loudly, not with fake features
    val wav = Multimodal.encodeWav(3L)
    wav(0) = 'X'.toByte
    val ex = intercept[Exception] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
    }
    assert(ex.isInstanceOf[javax.sound.sampled.UnsupportedAudioFileException])
  }

  test("quarantineRoundTrip: corrupt payloads route to the error lane, codecs survive") {
    // ids 0 and 7 corrupt with stride 7; interleaved with good rows in
    // the same partition, so the reused reader must recover after a
    // failed read
    val docs = Seq((0L, "a"), (3L, "b"), (7L, "c"), (9L, "d"))
      .toDF("doc_id", "text").coalesce(1)
    val out = Multimodal.quarantineRoundTrip(docs, corruptEvery = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4))))
    def good(id: Long) = {
      val w = 8 + (id % 16).toInt; val h = 8 + ((id / 16) % 16).toInt
      (id, (54 + ((24 * w + 31) / 32) * 4 * h).toLong, "ok", Some(w), Some(h))
    }
    assert(out.toSeq == Seq(
      (0L, 20L, "error", None, None), good(3L),
      (7L, 20L, "error", None, None), good(9L)))
  }

  test("decodeMetaLenient: undecodable payloads quarantine instead of killing the job") {
    val mixed = Seq(
      MediaRecord(1, "image", Multimodal.encodeBmp(10, 4, seed = 5L), "s"),
      MediaRecord(2, "image", "definitely not an image".getBytes("UTF-8"), "s"),
      MediaRecord(3, "image", Multimodal.encodeBmp(6, 6, seed = 9L), "s"))
    val out = Multimodal.decodeMetaLenient(mixed.toDS()).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[String]("status"),
        Option(r.get(r.fieldIndex("width"))))).sortBy(_._1)
    assert(out(0) == ((1L, "ok", Some(10))))
    assert(out(1) == ((2L, "error", None)))
    assert(out(2) == ((3L, "ok", Some(6))))
  }

  test("chunk: fixed-size slices reassemble to original length") {
    val out = Multimodal.chunk(media.toDS().toDF(), 256)
      .groupBy("media_id").agg(sum("chunk_bytes").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("total"),
        r.getAs[Long]("n"))).sortBy(_._1)
    assert(out(0) == (1L, 21L, 1L))
    assert(out(2) == (3L, 1000L, 4L)) // 256*3 + 232
  }
}
