package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of the large side lands on one hot key
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, s"row$i"))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "name")
    val plain = large.join(small, "k").select("k", "payload", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Joins.saltedJoin(large, small, "k", salt = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("saltedJoin scatters the hot key across salt buckets") {
    val large = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val dist = large.withColumn("__salt",
        pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(8L)).cast("int"))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(dist.length >= 6)              // hot key spread over most buckets
    assert(dist.max < 1000 * 0.4)         // no bucket holds the whole key
  }

  test("keySkew surfaces the hot key first") {
    val df = (1 to 100).map(i => (if (i <= 60) 5L else i.toLong, i)).toDF("k", "v")
    val top = Joins.keySkew(df, "k", 3).collect()
    assert(top.head.getLong(0) == 5L && top.head.getLong(1) == 60L)
  }
}
