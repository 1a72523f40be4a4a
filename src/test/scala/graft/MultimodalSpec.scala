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
    val out = Multimodal.decodeMeta(media.toDS()).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out.forall(m => m.sha256.length == 64 && m.width >= 64 && m.height >= 64))
    assert(out(1).channels == 1 && out(0).channels == 3) // audio mono stub
    assert(out(2).n_bytes == 1000)
    // deterministic: same content → same fake dimensions
    val again = Multimodal.decodeMeta(media.toDS()).collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
  }

  test("metaSql matches mapPartitions decode on shared fields") {
    val ds = media.toDS().toDF()
    val viaSql = Multimodal.metaSql(ds).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("n_bytes"),
        r.getAs[String]("sha256"), r.getAs[Int]("channels"))).sortBy(_._1)
    val viaMp = Multimodal.decodeMeta(media.toDS()).collect()
      .map(m => (m.media_id, m.n_bytes, m.sha256, m.channels)).sortBy(_._1)
    assert(viaSql.toSeq == viaMp.toSeq)
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
