package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusPipeline

/** End-to-end cleaning pipeline: every stage must visibly account for
  * its own drops in the per-source survival counts.
  */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val base = "the cat sat on a mat and a dog slept in it quietly today"

  test("cleanSummary: quality, exact-dup and near-dup drops land in the right source") {
    val docs = Seq(
      (1L, base, "src_a"),                    // survives everything
      (2L, base, "src_a"),                    // exact dup of 1 -> exact stage
      (3L, "buy now buy now buy now buy now buy now buy now", "src_a"), // quality
      (4L, base + " extra", "src_b"),         // near-dup of 1 -> larger id dropped
      (5L, "the alpha beta gamma delta epsilon zeta eta theta iota kappa lambda", "src_b"))
      .toDF("doc_id", "text", "source")
    val got = CorpusPipeline.cleanSummary(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("src_a") == ((3L, 2L, 1L, 1L)), s"src_a was ${got("src_a")}")
    assert(got("src_b") == ((2L, 2L, 2L, 1L)), s"src_b was ${got("src_b")}")
    // the cleaned frame itself is the component minima + unique docs
    val surviving = CorpusPipeline.clean(docs).afterNearDup
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surviving == Set(1L, 5L))
  }

  test("corpusReport: volume, dup share, gate rate and median length per source") {
    val docs = Seq(
      (1L, base, "src_a"),                    // clean
      (2L, base, "src_a"),                    // exact dup of 1 (not canonical)
      (3L, "the cat sat on a mat and it is fine here today", "src_a"),
      (4L, "buy now buy now buy now buy now buy now buy now", "src_b"))
      .toDF("doc_id", "text", "source")
    val got = CorpusPipeline.corpusReport(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))
      .toMap
    val (n, tok, p50, dups, rate) = got("src_a")
    assert(n == 3L && dups == 1L, "doc 2 counts as an exact duplicate")
    assert(tok == docs.filter($"source" === "src_a").collect()
      .map(_.getString(1).trim.split("\\s+").length.toLong).sum)
    assert(p50 > 0 && rate == 1.0, "all src_a docs pass the gate")
    assert(got("src_b")._5 == 0.0, "repetition spam fails the gate")
    assert(got("src_b")._4 == 0L)
  }

  test("cleanSummary: stages are monotonically non-increasing, sources with zero survivors kept") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now", "only_junk"),
      (2L, base, "good"))
      .toDF("doc_id", "text", "source")
    val got = CorpusPipeline.cleanSummary(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // a source whose every doc is filtered still appears, with zeros
    assert(got("only_junk") == ((1L, 0L, 0L, 0L)))
    assert(got("good") == ((1L, 1L, 1L, 1L)))
    got.values.foreach { case (a, b, c, d) =>
      assert(a >= b && b >= c && c >= d)
    }
  }

  test("snapshotDiff: added/removed/changed/unchanged classified by digest") {
    import org.apache.spark.sql.functions.col
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val nw = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val got = CorpusPipeline.snapshotDiff(old, nw).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
    // identical snapshots: everything unchanged, nothing else reported
    val same = CorpusPipeline.snapshotDiff(old, old).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(same == Map("unchanged" -> 3L))
  }

  test("snapshotDiff: NULL-text docs classify by doc_id presence, not hash nullness") {
    // sha2(NULL) is NULL — a nullness-based classifier would call a
    // NULL-text doc present in BOTH snapshots "added". Presence must
    // come from membership markers; hash comparison must be null-safe
    // (two NULL-text versions are "unchanged", NULL→text is "changed").
    val old = Seq((1L, null: String), (2L, "b"), (3L, null: String))
      .toDF("doc_id", "text")
    val nw = Seq((1L, null: String), (2L, "b"), (3L, "now has text"),
      (4L, null: String)).toDF("doc_id", "text")
    val got = CorpusPipeline.snapshotDiff(old, nw).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 1L, "changed" -> 1L, "unchanged" -> 2L),
      s"$got")
  }

  test("decontaminate: a contaminated training doc reads as `removed` in the release diff") {
    // training doc 2 is a verbatim copy of eval doc 101 (Jaccard 1.0 at
    // any threshold); docs 4 and 6 share nothing with the eval set
    val train = Seq(
      (2L, base),
      (4L, "completely different words about ships and harbors at dawn"),
      (6L, "yet another unrelated training document mentioning winter"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (101L, base),
      (103L, "an eval item no training doc resembles in any way"))
      .toDF("doc_id", "text")
    val got = CorpusPipeline.decontaminate(train, eval_, 0.5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("removed" -> 1L, "unchanged" -> 2L), s"$got")
    // a clean corpus releases untouched — no spurious quarantines
    val clean = CorpusPipeline.decontaminate(
      train.filter($"doc_id" =!= 2L), eval_, 0.5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean == Map("unchanged" -> 2L), s"$clean")
  }
}
