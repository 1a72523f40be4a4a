package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma alpha delta", "a"),
    (2L, "alpha beta beta beta unique", "a"),
    (3L, "zeta eta theta iota kappa", "b")
  ).toDF("doc_id", "text", "source")

  test("textStats: counts and ratios") {
    val r = TextAnalysis.textStats(docs).filter($"doc_id" === 1).head()
    assert(r.getAs[Long]("n_words") == 5 && r.getAs[Long]("n_distinct_words") == 4)
    assert(math.abs(r.getAs[Double]("ttr") - 0.8) < 1e-9)
  }

  test("tfidfTopTerms: doc-unique terms outrank corpus-wide terms") {
    val top = TextAnalysis.tfidfTopTerms(docs, 2).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1)).map(_.getString(2)).toSeq).toMap
    // 'unique' appears only in doc 2; 'beta' has tf 3 but df 2 → ln(3/2) weight
    assert(top(2L).head == "beta" || top(2L).head == "unique")
    assert(top(2L).contains("unique"))
    // doc 3's vocabulary is fully unique to it
    assert(top(3L).forall(Seq("zeta", "eta", "theta", "iota", "kappa").contains))
  }

  test("chunkWords: windows with overlap, truncated tail, short docs = 1 chunk") {
    val many = Seq((1L, (1 to 95).map(i => s"w$i").mkString(" "), "s"),
      (2L, "a b c", "s")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.chunkWords(many, 50, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // 95 words, stride 40: chunks at 1..50, 41..90, 81..95
    assert(got.filter(_._1 == 1L) == Seq((1L, 0, 50L), (1L, 1, 50L), (1L, 2, 15L)))
    assert(got.filter(_._1 == 2L) == Seq((2L, 0, 3L)))
    // overlap: chunk 1 starts at word 41 (10-word overlap with chunk 0)
    val texts = TextAnalysis.chunkWords(many, 50, 10)
      .filter($"doc_id" === 1 && $"chunk_idx" === 1).head().getString(3)
    assert(texts.startsWith("w41 "))
  }

  test("langId: marker-word argmax is deterministic") {
    val d = Seq((1L, "the the the der fast", "s")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.langId(d).head()
    assert(r.getAs[String]("pred_lang") == "en") // 5 en markers vs 1 de
  }

  test("qualityFlags: repetition fractions and the keep verdict") {
    val d = Seq(
      // natural-ish prose: stopwords present, no dominating bigram
      (1L, "the cat sat on a mat and the dog slept in it quietly today", "s"),
      // templated loop: one bigram dominates -> rejected
      (2L, "buy now buy now buy now buy now buy now buy now", "s"),
      // too short
      (3L, "the end", "s"),
      // punctuation soup -> rejected on punct_frac
      (4L, "the $$$ ### @@@ !!! %%% ^^^ &&& *** ((( ))) a b c", "s"),
      // no stopwords at all -> rejected
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "s"))
      .toDF("doc_id", "text", "source")
    val q = TextAnalysis.qualityFlags(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getAs[Boolean]("keep"))
    // doc 2: "buy now" = 6 of 11 bigram slots
    assert(q(2L).getAs[Double]("top_bigram_frac") == math.rint(6.0 / 11 * 1e6) / 1e6 ||
      q(2L).getAs[Double]("top_bigram_frac") > 0.5)
    assert(!q(2L).getAs[Boolean]("keep"))
    assert(!q(3L).getAs[Boolean]("keep")) // n_words = 2 < 10
    assert(!q(4L).getAs[Boolean]("keep"))
    assert(q(4L).getAs[Double]("punct_frac") > 0.3)
    assert(!q(5L).getAs[Boolean]("keep")) // stop_c = 0
    assert(q(5L).getAs[Double]("stopword_frac") == 0.0)
    // single-word doc: no bigrams, no crash, frac 0
    val one = TextAnalysis.qualityFlags(
      Seq((9L, "solo", "s")).toDF("doc_id", "text", "source")).head()
    assert(one.getAs[Double]("top_bigram_frac") == 0.0)
    assert(one.getAs[Long]("n_words") == 1L)
  }

  test("sizePercentiles: exact closest-ranks interpolation (quantile_cont semantics)") {
    // 4 docs with 1/2/3/4 words: p50 over {1,2,3,4} = 2.5 (midpoint),
    // p90 = 1 + 3*0.9 = 3.7 — the linear-interpolation definition both
    // engines use; any digest/approximation would miss these exactly
    val d = Seq((1L, "w", "s"), (2L, "w w", "s"), (3L, "w w w", "s"),
      (4L, "w w w w", "s")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sizePercentiles(d).head()
    assert(r.getAs[Double]("p50_words") == 2.5)
    assert(r.getAs[Double]("p90_words") == 3.7)
    assert(r.getAs[Double]("p99_words") == 3.97)
    assert(r.getAs[Double]("p50_chars") == 4.0) // lengths 1,3,5,7
  }

  test("bm25TopDocs matches a scalar BM25 computation and ranks by relevance") {
    val d = Seq(
      (1L, "fast fast fast merge other words here", "s"),
      (2L, "fast merge", "s"),
      (3L, "nothing relevant at all in this one", "s"),
      (4L, "fast other filler tokens pad pad pad pad pad pad pad pad", "s")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.bm25TopDocs(d, Seq("fast", "merge"), 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(3L), "doc with no query term must be absent")
    // scalar reference: same Lucene-style idf and k1/b defaults
    val dls = Map(1L -> 7.0, 2L -> 2.0, 3L -> 7.0, 4L -> 12.0)
    val avgdl = dls.values.sum / 4.0
    val dfs = Map("fast" -> 3.0, "merge" -> 2.0)
    val tfs = Map((1L, "fast") -> 3.0, (1L, "merge") -> 1.0,
      (2L, "fast") -> 1.0, (2L, "merge") -> 1.0, (4L, "fast") -> 1.0)
    def score(id: Long): Double = tfs.collect { case ((d0, t), tf) if d0 == id =>
      val idf = math.log((4.0 - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1.0)
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dls(id) / avgdl))
    }.sum
    Seq(1L, 2L, 4L).foreach { id =>
      assert(math.abs(got(id)._2 - score(id)) < 1e-5, s"doc $id")
    }
    assert(got(1L)._1 == 2L && got(4L)._1 == 1L)
    // short doc hitting both terms outranks the long doc hitting one
    assert(got(2L)._2 > got(4L)._2)
  }

  test("bm25TopDocs: top-k cut and empty-query guard") {
    val many = (1 to 30).map(i => (i.toLong, "fast " + ("pad " * i).trim, "s"))
      .toDF("doc_id", "text", "source")
    assert(TextAnalysis.bm25TopDocs(many, Seq("fast"), 5).count() == 5L)
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopDocs(many, Seq.empty, 5)
    }
  }

  test("noveltyScores: lower-id docs claim shared shingles; short docs score 0") {
    val d = Seq(
      (1L, "a b c d e", "s"),        // shingles: abc bcd cde — all novel
      (2L, "a b c d e", "s"),        // exact rehash → novelty 0
      (3L, "c d e f g h", "s"),      // cde shared with doc 1, 3 novel of 4
      (4L, "x y", "s")               // < 3 words → no shingles
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.noveltyScores(d, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(got(3L) == ((4L, 3L, 0.75)))
    assert(got(4L) == ((0L, 0L, 0.0)), "short doc present with zero shingles")
  }

  test("curriculumBuckets: quartiles partition the score order, no ntile window") {
    // 20 docs, 100 words each: i stopwords, a constant 25-word top-word
    // anchor, distinct fillers → score = i/100 − 0.25, strictly monotone
    val d = (1 to 20).map { i =>
      val stops = Seq.fill(i)("the")
      val anchor = Seq.fill(25)("zz")
      val rest = (1 to 75 - i).map(j => s"t${i}x$j")
      (i.toLong, (stops ++ anchor ++ rest).mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val rows = TextAnalysis.curriculumBuckets(d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(rows.length == 20, "every doc gets a bucket")
    assert(rows.map(_._3).toSet == Set(1, 2, 3, 4))
    // bucket boundaries respect score order
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    for (b <- 1 to 3)
      assert(byBucket(b).max <= byBucket(b + 1).min,
        s"bucket $b scores must not exceed bucket ${b + 1}")
    // exact-percentile quartiles of 20 distinct scores → 5 docs each
    assert(byBucket.values.map(_.length).toSeq.sorted == Seq(5, 5, 5, 5))
    // the plan must not contain any ranking window at all — thresholds
    // broadcast + when-chain, never an ntile()-style global sort
    val plan = TextAnalysis.curriculumBuckets(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "bucketing must not use a ranking window")
  }

  test("unigramSurprisal: matches hand-computed −Σ tf·ln p / n, ranks rarity") {
    // corpus: a×5, b×1, c×1, total 7
    val d = Seq((1L, "a a a a"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_words"), r.getAs[Double]("surprisal")))
      .toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val la = r9(-math.log(5.0 / 7.0)); val lb = r9(-math.log(1.0 / 7.0))
    assert(out(1L) == (4L, r6(la)))
    assert(out(2L) == (2L, r6((la + lb) / 2)))
    assert(out(3L) == (1L, r6(lb)))
    // all-common-words doc scores below the rare-vocabulary doc
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2)
  }

  test("bigramLm: hand-computed conditional cross-entropy; <2-word docs drop") {
    // bigrams: (a b)×2 from docs 1-2, (a c)×1 from doc 3 → c(a·)=3
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLm(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"), r.getAs[Double]("cross_entropy")))
      .toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lab = r9(-math.log(2.0 / 3.0)); val lac = r9(-math.log(1.0 / 3.0))
    assert(out(1L) == (1L, r6(lab)))
    assert(out(2L) == (1L, r6(lab)))
    assert(out(3L) == (1L, r6(lac)))
    assert(!out.contains(4L)) // one word → no bigram → no row
    // the common continuation is more predictable than the rare one
    assert(out(1L)._2 < out(3L)._2)
  }

  test("normalizeText: NFC composes, case folds, whitespace collapses") {
    import org.apache.spark.sql.functions.{col, lit}
    // decomposed uppercase + tab + double space vs precomposed lowercase
    val d = Seq((1L, "CAFE\u0301\t du  monde"), (2L, "caf\u00e9 du monde"))
      .toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "caf\u00e9 du monde")
    assert(out(1L) == out(2L))
    // already-NFC ASCII is untouched (the zero-copy fast path)
    val same = d.select(TextAnalysis.normalizeText(lit("plain ascii")).as("n"))
      .head().getString(0)
    assert(same == "plain ascii")
  }

  test("normalizedDedup: byte-distinct variants collapse to one group") {
    val d = Seq(
      (1L, "caf\u00e9 menu"),        // precomposed
      (2L, "CAFE\u0301  menu"),      // decomposed uppercase, double space
      (3L, "totally different")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalizedDedup(d).collect()
    assert(out.length == 2)
    val merged = out.filter(_.getAs[Long]("n_docs") == 2L)
    assert(merged.length == 1)
    assert(merged.head.getAs[Long]("n_raw_variants") == 2L)
    assert(merged.head.getAs[Long]("keeper_doc") == 1L)
  }

  test("piiScrub: redacts emails/phones/IPs with typed tokens, counts match") {
    val d = Seq(
      (1L, "mail a.user+tag@sub.example.org or b@x.io then call 415-555-0123 done"),
      (2L, "server at 10.0.42.7 and 192.168.1.1 ok"),
      (3L, "clean text with no identifiers at all"),
      // an email whose domain is dotted digits must NOT be half-eaten by
      // the later IP rule — email scrubs first
      (4L, "edge user1@2.3.4.com end")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_email") == 2 && out(1L).getAs[Long]("n_phone") == 1)
    assert(out(2L).getAs[Long]("n_ip") == 2)
    assert(out(3L).getAs[Long]("n_email") == 0 && out(3L).getAs[Long]("n_ip") == 0)
    assert(out(4L).getAs[Long]("n_email") == 1 && out(4L).getAs[Long]("n_ip") == 0)
    // digests equal the directly-computed scrubbed strings
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect1 = "mail <EMAIL> or <EMAIL> then call <PHONE> done"
    val expect2 = "server at <IP> and <IP> ok"
    val expect4 = "edge <EMAIL> end"
    assert(out(1L).getAs[String]("clean_sha") == sha(expect1))
    assert(out(1L).getAs[Long]("clean_len") == expect1.length.toLong)
    assert(out(2L).getAs[String]("clean_sha") == sha(expect2))
    assert(out(4L).getAs[String]("clean_sha") == sha(expect4))
  }

  test("minKSketch: identical texts share the sketch, edits change it") {
    val d = Seq((1L, "the quick brown fox jumps", "s"),
      (2L, "the quick brown fox jumps", "s"),
      (3L, "the quick brown cat jumps", "s")).toDF("doc_id", "text", "source")
    val sk = TextAnalysis.minKSketch(d, 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSet).toMap
    assert(sk(1L) == sk(2L))
    assert(sk(1L) != sk(3L))
    assert(sk(1L).intersect(sk(3L)).nonEmpty) // shared grams survive the edit
  }

  test("repetitionSignals: trigram-instance duplication fraction, short docs carry 0") {
    val d = Seq(
      (1L, "a b a b a b", "s"),       // trigrams: aba, bab, aba, bab → all duplicated
      (2L, "one two three four", "s"), // 2 distinct trigrams, no repeats
      (3L, "too short", "s"),          // < 3 words → zero row
      (4L, "x y z x y z x y z", "s")) // 7 grams: xyz*3 yzx*2 zxy*2 → all dup
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.repetitionSignals(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 4L, 2L, 1.0),
      (2L, 2L, 2L, 0.0),
      (3L, 0L, 0L, 0.0),
      (4L, 7L, 3L, 1.0)))
  }

  test("sourceOverlap: shared distinct shingles and Jaccard per source pair") {
    val d = Seq(
      (1L, "alpha beta gamma delta", "sA"), // shingles: abg, bgd
      (2L, "alpha beta gamma other", "sB"), // shingles: abg, bgo
      (3L, "unrelated words entirely here", "sC"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceOverlap(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // only sA-sB share anything: 1 shared of (2 + 2 - 1) = 1/3
    assert(out.toSeq == Seq(("sA", "sB", 1L, 2L, 2L, 0.333333)))
  }

  test("vocabCoverage: rank order, cumulative fractions, TakeOrdered cut") {
    val d = Seq(
      (1L, "b b b a a c", "s"),
      (2L, "a d", "s")).toDF("doc_id", "text", "source")
    // counts: a=3, b=3, c=1, d=1 → ties break on word asc
    val df = TextAnalysis.vocabCoverage(d, topV = 3)
    val out = df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1, "a", 3L, 0.375), (2, "b", 3L, 0.75), (3, "c", 1L, 0.875)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "the top-V cut must be per-partition heaps, not a global sort")
  }

  test("repetitionSignals plan: partial combine below both exchanges, no self-join") {
    val d = Seq((1L, "a b c d e", "s")).toDF("doc_id", "text", "source")
    val plan = TextAnalysis.repetitionSignals(d).queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"), "gram counting must map-side combine")
    assert(plan.contains("partial_sum"), "per-doc fold must map-side combine")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "trigram construction must be a zip, never a join")
  }

  test("sourceOverlap plan: shingle self-join is an equi-join, never a nested loop") {
    val d = Seq((1L, "a b c d e", "sA"), (2L, "a b c x y", "sB"))
      .toDF("doc_id", "text", "source")
    val plan = TextAnalysis.sourceOverlap(d).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the source pair matrix must come from an equi-join on shingle")
  }

  private def sha256(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("removeBoilerplate drops cross-doc lines, keeps order, survives all-boilerplate docs") {
    // banner "buy our stuff" appears in 5 distinct docs (df ≥ 3 → removed);
    // "red green blue" appears in 2 (df < 3 → kept)
    val d = Seq(
      (0L, "buy our stuff red green blue"),
      (1L, "buy our stuff one two three"),
      (2L, "buy our stuff red green blue"),
      (3L, "alpha beta gamma"),
      (4L, "buy our stuff"),                   // all boilerplate → clean ""
      (5L, "zz yy xx buy our stuff aa bb cc")  // banner mid-doc → order check
    ).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplate(d, lineWords = 3, minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(0L) == ((2L, 1L, 14L, sha256("red green blue"))))
    assert(got(1L) == ((2L, 1L, 13L, sha256("one two three"))))
    assert(got(2L) == got(0L))
    assert(got(3L) == ((1L, 0L, 16L, sha256("alpha beta gamma"))))
    assert(got(4L) == ((1L, 1L, 0L, sha256(""))))
    // the removed middle line must not disturb surrounding order
    assert(got(5L) == ((3L, 1L, 17L, sha256("zz yy xx aa bb cc"))))
  }

  test("bm25MrrEval: tf-spam outranks the relevant doc — rank 3, rr 1/3; k cut zeroes") {
    // 'beta' is near-ubiquitous (idf ~0.29), 'alpha' rare (idf ~1.05):
    // two alpha-spam docs (tf 4, no beta) outscore the ONE doc holding
    // both terms, so first_rel_rank = 3 — the non-saturated shape the
    // term-dense contract corpus can't produce
    val docs = ((0L until 6L).map(i => (i, "beta x y")) ++ Seq(
      (6L, "alpha alpha alpha alpha"),
      (7L, "alpha alpha alpha alpha"),
      (8L, "alpha beta"))).toDF("doc_id", "text")
    val q = Seq(0 -> Seq("alpha", "beta"))
    val out = TextAnalysis.bm25MrrEval(docs, q, k = 10).head()
    assert(out.getLong(1) == 1L, "exactly one conjunctively relevant doc")
    assert(out.getLong(2) == 3L, s"spam must outrank the relevant doc: $out")
    assert(out.getDouble(3) == 0.333333)
    // cutting k below the relevant rank zeroes the reciprocal rank
    val cut = TextAnalysis.bm25MrrEval(docs, q, k = 2).head()
    assert(cut.isNullAt(2) && cut.getDouble(3) == 0.0)
    // a query with an absent term has no relevant docs at all
    val none = TextAnalysis.bm25MrrEval(docs, Seq(0 -> Seq("alpha", "nope")), k = 5).head()
    assert(none.getLong(1) == 0L && none.getDouble(3) == 0.0)
  }

  test("bm25Ndcg: 1.0 on an ideal ranking, < 1 when spam outranks grades") {
    // spam corpus (the MRR spec's shape): two alpha-heavy docs outrank
    // the one doc holding both terms → a grade-2 doc sits below two
    // grade-1 docs → nDCG strictly < 1
    val spam = ((0L until 6L).map(i => (i, "beta x y")) ++ Seq(
      (6L, "alpha alpha alpha alpha"),
      (7L, "alpha alpha alpha alpha"),
      (8L, "alpha beta"))).toDF("doc_id", "text")
    val s = TextAnalysis.bm25Ndcg(spam, Seq("alpha", "beta"), 10).head()
    assert(s.getLong(1) == 9L, "all 9 docs hold a query term")
    assert(s.getDouble(4) < 1.0 && s.getDouble(4) > 0.0,
      s"spam above the graded doc must cost nDCG: $s")
    // hand-replay: ranking grades = ideal grades ⇒ ndcg == 1 exactly.
    // A corpus where the both-terms doc also wins BM25:
    val ideal = Seq((1L, "alpha beta"), (2L, "alpha x y z"), (3L, "beta x y z"))
      .toDF("doc_id", "text")
    val i = TextAnalysis.bm25Ndcg(ideal, Seq("alpha", "beta"), 10).head()
    assert(i.getDouble(4) == 1.0, s"ideal ranking must score exactly 1: $i")
    // no query term anywhere → idcg 0 → ndcg NULL, not NaN/divide error
    val none = TextAnalysis.bm25Ndcg(ideal, Seq("zzz"), 10).head()
    assert(none.isNullAt(4) && none.getDouble(2) == 0.0)
  }

  test("pmiCollocations: glued pairs score high, independent pairs near zero") {
    // "san francisco" always adjacent; filler words combine freely
    val glued = (0L until 10L).map(i => (i, "san francisco the a of"))
    val noise = (10L until 20L).map(i => (i, "the of a the of a the of"))
    val out = TextAnalysis.pmiCollocations((glued ++ noise).toDF("doc_id", "text"),
      minCount = 5, topK = 5)
      .select(col("w1"), col("w2"), col("pmi")).collect()
    assert(out.head.getString(0) == "san" && out.head.getString(1) == "francisco",
      s"the glued pair must top the PMI table: ${out.toSeq}")
    // PMI for a pair that occurs ONLY together and nowhere else:
    // ln(c2·N1²/(N2·c1·c1)) with c2=c1=10 → dominated by N1²/N2 scale;
    // it must strictly exceed every free-combining pair
    assert(out.tail.forall(_.getDouble(2) < out.head.getDouble(2)))
    // minCount prunes: a pair seen < 5 times never surfaces
    val pruned = TextAnalysis.pmiCollocations(
      (glued ++ Seq((99L, "rare token"))).toDF("doc_id", "text"),
      minCount = 5, topK = 20).collect()
    assert(!pruned.exists(r => r.getString(0) == "rare"))
  }

  test("sourceJsDivergence: identical sources → 0; disjoint vocab → ln 2") {
    val same = Seq(("a", "x y z"), ("b", "x y z")).toDF("source", "text")
      .withColumn("doc_id", monotonically_increasing_id())
    val j0 = TextAnalysis.sourceJsDivergence(same)
      .select(col("jsd")).as[Double].collect()
    assert(j0.forall(_ == 0.0), s"identical distributions → JSD 0: ${j0.toSeq}")

    val disjoint = Seq(("a", "x x x"), ("b", "y y y")).toDF("source", "text")
      .withColumn("doc_id", monotonically_increasing_id())
    val jd = TextAnalysis.sourceJsDivergence(disjoint)
      .select(col("jsd")).as[Double].collect()
    // maximal divergence: every word is exclusive → JSD = ln 2
    assert(jd.forall(v => math.abs(v - math.log(2.0)) < 1e-6), jd.toSeq.toString)
  }

  test("sourceJsDivergence counts ABSENT words (the dense-grid term)") {
    // source a holds {x, y}, source b only {x}: b's missing 'y' must
    // contribute ½·q·ln 2 — a sparse join would report jsd(b) too low
    val docs = Seq(("a", "x y"), ("b", "x")).toDF("source", "text")
      .withColumn("doc_id", monotonically_increasing_id())
    val rows = TextAnalysis.sourceJsDivergence(docs)
      .select(col("source"), col("jsd"), col("n_words_present"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // hand computation for b: p=(1,0), q=(1/2,1/2) over (x,y)
    //   x: ½[1·ln(1/¾) + ½·ln(½/¾)]; y: ½[0 + ½·ln(½/¼)]
    val expB = 0.5 * (1.0 * math.log(1 / 0.75) + 0.5 * math.log(0.5 / 0.75)) +
      0.5 * (0.5 * math.log(2.0))
    assert(math.abs(rows("b")._1 - expB) < 1e-5,
      s"expected ${expB}, got ${rows("b")._1}")
    assert(rows("b")._2 == 1L && rows("a")._2 == 2L)
  }

  test("readability: hand-computed Flesch/FK, syllable floor, empty doc NULLs") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "The cat sat. It ran!"),   // 5 words, 2 sentences, 5 syllables
      (2L, "bcd fgh."),               // vowel-less words floor at 1 syllable each
      (3L, "")                        // 0 words -> NULL scores
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((5L, 2L, 5L)))
    // ease = 206.835 - 1.015*(5/2) - 84.6*(5/5) = 119.6975
    assert(r1.getDouble(4) == 119.6975)
    // grade = 0.39*2.5 + 11.8*1 - 15.59 = -2.815
    assert(r1.getDouble(5) == -2.815)
    val r2 = out(2L)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((2L, 1L, 2L)),
      "vowel-less words still count 1 syllable each")
    val r3 = out(3L)
    assert(r3.getLong(1) == 0L && r3.isNullAt(4) && r3.isNullAt(5),
      "empty document: zero words, NULL scores")
  }

  test("charEntropy: hand-computed bits, single-char 0, empty doc vanishes") {
    import org.apache.spark.sql.functions._
    // "aabb": p(a)=p(b)=1/2 -> H = 1 bit; "aaaa": H = 0;
    // "abcd": 4 equiprobable -> H = 2 bits; "" -> no row
    val docs = Seq((1L, "aabb"), (2L, "aaaa"), (3L, "abcd"), (4L, ""))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.charEntropy(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "empty document produces no row")
    assert(out(1L) == ((4L, 2L, 1.0)))
    assert(out(2L) == ((4L, 1L, 0.0)))
    assert(out(3L) == ((4L, 4L, 2.0)))
  }

  test("charEntropy: base64-ish noise scores above natural text") {
    import org.apache.spark.sql.functions._
    val natural = "the quick brown fox jumps over the lazy dog and runs on"
    val noise = "aGVsbG8gd29ybGQhIHRoaXMrbG9va3MvbGlrZT1iYXNlNjQwMTIzNDU2Nzg5"
    val docs = Seq((1L, natural), (2L, noise)).toDF("doc_id", "text")
    val h = graft.operators.TextAnalysis.charEntropy(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(h(2L) > h(1L), s"noise must out-entropy natural text: $h")
  }

  test("zipfAlpha: exact two-point slope, planted power law, degenerate drop") {
    // src_a: token "a"×8, "b"×4 → points (ln1, ln8), (ln2, ln4); the
    // two-point slope is exactly −1 ⇒ α = 1.0 at 6 dp
    val a = (1L, Array.fill(8)("a") ++ Array.fill(4)("b"), "src_a")
    // src_b: a planted freq = round(64·r^−1.5) law over 6 ranks —
    // the fit must land near 1.5 despite integer rounding of counts
    val freqs = (1 to 6).map(r => math.round(64.0 * math.pow(r, -1.5)).toInt)
    val b = (2L, freqs.zipWithIndex.flatMap { case (f, i) =>
      Array.fill(f)(s"t$i") }.toArray, "src_b")
    // src_c: a single distinct token → n = 1 → no slope → dropped
    val c = (3L, Array.fill(5)("only"), "src_c")
    val docs = Seq(a, b, c)
      .map { case (id, ws, src) => (id, ws.mkString(" "), src) }
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.zipfAlpha(docs, 500).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set("src_a", "src_b"), s"$got")
    assert(got("src_a") == ((2L, 1.0)), s"$got")
    assert(got("src_b")._1 == 6L)
    assert(math.abs(got("src_b")._2 - 1.5) < 0.06,
      s"planted alpha=1.5 law fit as ${got("src_b")._2}")
  }

  test("ngramDiversity: bigram counts, ttr and entropy per source") {
    val docs = Seq(
      (1L, "a b a b", "src_a"),   // bigrams: "a b"×2, "b a"×1
      (2L, "c d", "src_b"),       // one bigram → entropy 0
      (3L, "solo", "src_b"),      // <2 words → contributes nothing
      (4L, null.asInstanceOf[String], "src_b"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.ngramDiversity(docs, 2).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // src_a: H = round9(2/3·log2(3/2)) + round9(1/3·log2(3))
    //          = 0.389975000 + 0.528320834 → 0.918296 at 6 dp
    assert(got("src_a") == ((3L, 2L, 0.666667, 0.918296)), s"$got")
    assert(got("src_b") == ((1L, 1L, 1.0, 0.0)), s"$got")
  }
}
