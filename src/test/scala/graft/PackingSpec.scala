package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 64
  private val G = 4

  private def corpus(n: Int) =
    spark.range(n).select(
      col("id").as("doc_id"),
      // doc i has (i % 90) + 1 words — some docs longer than a window
      concat_ws(" ", transform(sequence(lit(0), pmod(col("id"), lit(90))),
        i => concat(lit("w"), i.cast("string")))).as("text"))

  test("per-shard token stream is contiguous: each doc starts where the previous ended") {
    val rows = Packing.packWindows(corpus(500), W, G)
      .select("shard", "ord", "n_tokens", "pack_id", "off")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(rows.keySet.subsetOf((0L until G).toSet))
    rows.foreach { case (_, docs) =>
      var expectStart = 0L
      docs.sortBy(_._2).foreach { case (_, _, ntok, packId, off) =>
        assert(packId * W + off === expectStart, "doc must start at the stream cursor")
        assert(off >= 0 && off < W)
        expectStart += ntok
      }
    }
  }

  test("n_windows spans the cut points a doc actually crosses") {
    Packing.packWindows(corpus(300), W, G).collect().foreach { r =>
      val (ntok, off, nw) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("off"),
        r.getAs[Long]("n_windows"))
      val expect = (off + ntok - 1) / W + 1
      assert(nw === expect, s"ntok=$ntok off=$off")
    }
  }

  test("assignment is replayable and total-preserving") {
    val a = Packing.packWindows(corpus(400), W, G)
    val b = Packing.packWindows(corpus(400), W, G)
    assert(a.select("doc_id", "shard", "pack_id", "off").except(b.select("doc_id", "shard", "pack_id", "off")).isEmpty)
    assert(a.count() === 400L, "packing assigns every doc exactly once")
  }

  test("packSummary: n_packs is ceil(tokens/W), straddle count matches row-level truth") {
    val win = Packing.packWindows(corpus(500), W, G)
    val fromRows = win.groupBy("shard")
      .agg(sum("n_tokens").as("t"),
        sum(when(col("n_windows") > 1, 1L).otherwise(0L)).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Packing.packSummary(corpus(500), W, G).collect().foreach { r =>
      val (t, s) = fromRows(r.getAs[Long]("shard"))
      assert(r.getAs[Long]("n_tokens") === t)
      assert(r.getAs[Long]("n_packs") === (t + W - 1) / W)
      assert(r.getAs[Long]("n_straddling") === s)
    }
  }

  test("degenerate parameters are rejected loudly") {
    intercept[IllegalArgumentException](Packing.packWindows(corpus(2), 0, 1))
    intercept[IllegalArgumentException](Packing.packWindows(corpus(2), 64, 0))
  }
}
