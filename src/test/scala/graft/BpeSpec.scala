package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges reproduces the hand-computed merge sequence") {
    // word counts: "abab" x3, "abc" x2, "bc" x1
    // round 1 pairs: a b: 3*2+2 = 8, b a: 3, b c: 2+1 = 3 → merge "a b"→"ab"
    //   (count 8; "abab" → "ab ab", "abc" → "ab c")
    // round 2 pairs: ab ab: 3, ab c: 2, b c: 1 → merge "ab ab"→"abab"
    // round 3 pairs: ab c: 2, b c: 1 → merge "ab c"→"abc"
    val d = Seq(
      (0L, "abab abc abab"), (1L, "abab abc bc")
    ).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(d, 3)
    assert(merges == Seq(("a b", "ab"), ("ab ab", "abab"), ("ab c", "abc")))
  }

  test("learnMerges breaks count ties lexicographically and stops when exhausted") {
    // "xy" x1: round 1 only pair is x y; round 2 has no pairs left
    val d = Seq((0L, "xy")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(d, 5) == Seq(("x y", "xy")))
    // tie: "ab" and "cd" both count 1 → "a b" < "c d" merges first
    val d2 = Seq((0L, "ab cd")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(d2, 1) == Seq(("a b", "ab")))
  }

  test("tokenizeCounts applies merges greedily left to right") {
    val d = Seq((0L, "abab abc bc"), (1L, "zz")).toDF("doc_id", "text")
    val merges = Seq(("a b", "ab"), ("ab ab", "abab"), ("ab c", "abc"))
    val got = Bpe.tokenizeCounts(d, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 0: abab→1 token, abc→1, bc→"b c" 2 → 4 bpe tokens / 3 words
    assert(got(0) == ((0L, 3L, 4L, 1.333333)))
    // doc 1: "z z" — no merge applies
    assert(got(1) == ((1L, 1L, 2L, 2.0)))
  }

  test("learnMerges is total on an empty corpus") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    assert(Bpe.learnMerges(empty, 3) == Seq.empty)
    assert(Bpe.tokenizeCounts(empty, Seq(("a b", "ab"))).count() == 0)
  }
}
