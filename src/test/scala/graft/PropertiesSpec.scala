package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Property-based tests (SURVEY.md §5 plan): metric laws, top-k nesting,
  * filter/search commutation, import∘export identity, hash-membership
  * coupling. ScalaCheck properties run through its own runner (the
  * scalatest bridge artifact is not in the dependency set).
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.choose(-2.0f, 2.0f))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }

  private def scalarScore(metric: String, a: Array[Float], b: Array[Float]): Double =
    Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(VectorOps.similarity(metric)(col("a"), col("b"))).head().getDouble(0)

  test("property: cosine symmetric, self-similarity ≈ 1 for non-zero vectors") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val ab = scalarScore("cosine", a, b)
      val ba = scalarScore("cosine", b, a)
      val selfOk = !a.exists(v => math.abs(v) > 0.01) ||
        math.abs(scalarScore("cosine", a, a) - 1.0) < 1e-6
      math.abs(ab - ba) < 1e-12 && selfOk
    })
  }

  test("property: cosine bounded in [-1, 1]; euclidean similarity in (0, 1]") {
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val c = scalarScore("cosine", a, b)
      val e = scalarScore("euclidean", a, b)
      c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 && e > 0.0 && e <= 1.0 + 1e-12
    })
  }

  test("property: int8 quantization — codes in [-127,127], error ≤ scale/254") {
    check(Prop.forAll(vecGen) { a =>
      val row = Seq(Tuple1(a.toSeq)).toDF("v")
        .select(VectorOps.absMax(col("v")).as("scale"),
          VectorOps.quantizeInt8(col("v"), VectorOps.absMax(col("v"))).as("q"),
          VectorOps.quantizationError(col("v"), VectorOps.absMax(col("v"))).as("err"))
        .head()
      val scale = row.getDouble(0)
      if (scale == 0.0) true // zero vector: quantization not defined (query guards it)
      else {
        val codes = row.getSeq[Int](1)
        val err = row.getDouble(2)
        // symmetric rounding bound: half a step, step = scale/127
        codes.forall(q => q >= -127 && q <= 127) &&
          err <= scale / 254.0 + 1e-12
      }
    })
  }

  private lazy val db10: VectorFieldDB = {
    val db = new VectorFieldDB(spark, 8)
    val rnd = new scala.util.Random(11)
    for (i <- 0 until 30)
      db.addIGlyph(i, i % 4, Array.fill(8)(rnd.nextFloat() * 2 - 1), id = Some(f"g$i%03d"))
    db
  }

  test("property: top-k ids ⊆ top-(k+1) ids") {
    val q = Array.fill(8)(0.3f)
    for (k <- 1 until 8) {
      val topK = db10.search(q, k).select("iglyph_id").as[String].collect().toSet
      val topK1 = db10.search(q, k + 1).select("iglyph_id").as[String].collect().toSet
      assert(topK.subsetOf(topK1), s"k=$k")
    }
  }

  test("property: search-then-filter == filter-then-search (ctx filter)") {
    val q = Array.fill(8)(0.3f)
    for (ctx <- 0 until 4) {
      val filteredSearch = db10.search(q, 30, ctxFilter = Some(ctx))
        .select("iglyph_id").as[String].collect().toSeq
      val searchThenFilter = db10.search(q, 30)
        .filter(col("outer_context_id") === ctx)
        .select("iglyph_id").as[String].collect().toSeq
      assert(filteredSearch == searchThenFilter, s"ctx=$ctx")
    }
  }

  test("property: import ∘ export = identity on membership and content") {
    val jsonl = db10.exportJsonl().collect()
    val db2 = new VectorFieldDB(spark, 8)
    assert(db2.importJsonl(spark.createDataset(jsonl.toSeq)) == 30)
    val orig = db10.iglyphs.select("iglyph_id", "glyph_id", "label")
      .as[(String, Int, String)].collect().sortBy(_._1).toSeq
    val back = db2.iglyphs.select("iglyph_id", "glyph_id", "label")
      .as[(String, Int, String)].collect().sortBy(_._1).toSeq
    assert(orig == back)
    assert(db2.currentHash == db10.currentHash) // same membership → same hash
  }

  test("property: dupGroups equals brute-force union-find on random graphs") {
    import graft.operators.Dedup
    val edgesGen = for {
      n <- Gen.choose(2, 24)                    // vertices 0..n-1
      m <- Gen.choose(1, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct
    check(Prop.forAll(edgesGen) { es =>
      es.isEmpty || {
        // reference: driver-side union-find with path compression
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        // canonical label = min of component = root under min-union
        val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
        val expected = verts.map(v => v -> find(v)).toMap
        // driverEdgeLimit = 0 forces the distributed propagation — the
        // driver fast path IS this reference union-find, so testing it
        // against itself would be vacuous
        val got = Dedup.dupGroups(
            es.map { case (a, b) => (a, b, 0.9) }.toDF("doc_a", "doc_b", "jaccard"),
            driverEdgeLimit = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expected
      }
    })
  }

  test("property: hash changes iff membership changes") {
    val db = new VectorFieldDB(spark, 8)
    val h0 = db.currentHash
    val id = db.addIGlyph(1, 1, Array.fill(8)(1f))
    val h1 = db.currentHash
    assert(h1 != h0)
    db.updateIGlyphEmbedding(id, Array.fill(8)(2f)) // same membership
    assert(db.currentHash == h1)
    db.deleteIGlyph(id)
    assert(db.currentHash != h1 && db.currentHash == h0) // back to empty membership
  }

  test("property: spanDedup equals a sequential driver-side reference on random corpora") {
    import graft.operators.Dedup
    // small vocab forces block collisions within and across docs
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd")
    val corpusGen = for {
      nDocs <- Gen.choose(1, 8)
      texts <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 13)
        ws <- Gen.listOfN(len, wordGen)
      } yield ws.mkString(" "))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val n = 3
    check(Prop.forAll(corpusGen) { corpus =>
      // reference: scan docs in id order, blocks in position order,
      // keep a block's globally first occurrence only
      val seen = scala.collection.mutable.HashSet[String]()
      val expect = corpus.map { case (id, text) =>
        val blocks = text.trim.split("\\s+").grouped(n).map(_.mkString(" ")).toSeq
        val kept = blocks.filter(b => seen.add(b))
        id -> ((blocks.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      val got = Dedup.spanDedup(
          corpus.toDF("doc_id", "text").withColumn("source", lit("s")), n)
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      got == expect
    })
  }

  test("property: repetitionSignals equals a driver-side trigram count on random corpora") {
    import graft.operators.TextAnalysis
    val wordGen = Gen.oneOf("aa", "bb", "cc")
    val corpusGen = for {
      nDocs <- Gen.choose(1, 6)
      texts <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 12)
        ws <- Gen.listOfN(len, wordGen)
      } yield ws.mkString(" "))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    check(Prop.forAll(corpusGen) { corpus =>
      val expect = corpus.map { case (id, text) =>
        val ws = text.trim.split("\\s+").toSeq
        val grams = if (ws.size < 3) Seq.empty[String]
          else ws.sliding(3).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size).values.toSeq
        val n = grams.size.toLong
        val dup = counts.filter(_ > 1).sum.toLong
        val frac = if (n == 0L) 0.0
          else BigDecimal(dup.toDouble / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        id -> ((n, counts.size.toLong, frac))
      }.toMap
      val got = TextAnalysis.repetitionSignals(
          corpus.toDF("doc_id", "text").withColumn("source", lit("s")))
        .collect().map(r =>
          r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      got == expect
    })
  }

  test("property: persisted index search equals from-scratch BM25 on random corpora") {
    import graft.operators.{InvertedIndex, TextAnalysis}
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val corpusGen = for {
      nDocs <- Gen.choose(2, 7)
      texts <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(1, 10)
        ws <- Gen.listOfN(len, wordGen)
      } yield ws.mkString(" "))
      split <- Gen.choose(1, nDocs - 1) // batch boundary for the append
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") }, split)
    val few = SCTest.Parameters.default.withMinSuccessfulTests(5)
    val res = SCTest.check(few, Prop.forAll(corpusGen) { case (corpus, split) =>
      val docs = corpus.toDF("doc_id", "text", "source")
      val dir = java.nio.file.Files.createTempDirectory("bm25prop").toString
      InvertedIndex.build(docs.filter(col("doc_id") < split), dir)
      InvertedIndex.appendBatch(docs.filter(col("doc_id") >= split), dir)
      val q = Seq("aa", "cc")
      val got = InvertedIndex.search(spark, q, k = 10, dir = dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val want = TextAnalysis.bm25TopDocs(docs, q, k = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      got == want
    })
    assert(res.passed, res.status.toString)
  }

  test("property: distributed BPE equals a sequential reference on random corpora") {
    import graft.operators.Bpe
    // driver-side reference: the Sennrich algorithm verbatim over a
    // word-count map — adjacent-pair counting, argmax with (count desc,
    // pair asc) ties, greedy left-to-right replace-all application
    def reference(words: Seq[String], m: Int): Seq[(String, String)] = {
      var vocab = words.groupBy(identity).view
        .map { case (w, g) => (w.toCharArray.mkString(" "), g.size.toLong) }.toMap
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var continue = true
      while (out.size < m && continue) {
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        for ((sym, n) <- vocab) {
          val ss = sym.split(" ")
          for (i <- 0 until ss.length - 1)
            counts.updateWith(ss(i) + " " + ss(i + 1))(c => Some(c.getOrElse(0L) + n))
        }
        if (counts.isEmpty) continue = false
        else {
          val (pair, _) = counts.minBy { case (p, c) => (-c, p) }
          val merged = pair.replace(" ", "")
          out += ((pair, merged))
          vocab = vocab.groupBy { case (sym, _) => sym.replace(pair, merged) }.view
            .map { case (sym, g) => (sym, g.values.sum) }.toMap
        }
      }
      out.toSeq
    }
    val wordGen = for {
      len <- Gen.choose(1, 5)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpusGen = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws
    val few = SCTest.Parameters.default.withMinSuccessfulTests(8)
    val res = SCTest.check(few, Prop.forAll(corpusGen) { words =>
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val want = reference(words, 4)
      // both the capped driver fast path and the distributed loop
      Bpe.learnMerges(docs, 4) == want &&
        Bpe.learnMerges(docs, 4, driverVocabLimit = 0) == want
    })
    assert(res.passed, res.status.toString)
  }

  test("property: multimodal codec paths land on the closed forms for arbitrary ids") {
    import graft.operators.Multimodal
    val idGen = Gen.choose(0L, 5000000L)
    val few = SCTest.Parameters.default.withMinSuccessfulTests(5)
    val res = SCTest.check(few, Prop.forAll(Gen.listOfN(3, idGen)) { ids0 =>
      val ids = ids0.distinct.sorted
      val docs = ids.map(id => (id, "t")).toDF("doc_id", "text")
      val rs = Multimodal.imageResizeMeta(docs).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(6)))
      val rsOk = rs.toSeq == ids.map { id =>
        val sw = 8 + (id % 16).toInt; val sh = 8 + ((id / 16) % 16).toInt
        val sum = (for { y <- 0 until 12; x <- 0 until 12 } yield
          (id * 1103515245L + (x * sw / 12) * 31L + (y * sh / 12) * 17L) & 0xffffff).sum
        (id, sw, sh, sum)
      }
      val au = Multimodal.audioFeatures(docs).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getInt(5)))
      val auOk = au.toSeq == ids.map { id =>
        val n = 400 + (id % 16).toInt * 50
        val vs = (0 until n).map(i =>
          (((id * 2654435761L + i * 40503L) % 65536L) - 32768L).toInt)
        (id, n.toLong, vs.map(v => v.toLong * v).sum, vs.map(math.abs).max)
      }
      rsOk && auOk
    })
    assert(res.passed, res.status.toString)
  }

  test("property: AUC is rank-statistic — invariant under monotone score maps") {
    import graft.operators.QualityModel
    // random labeled score sets; applying a strictly increasing
    // transform (and re-rounding to 6 dp, which preserves order for
    // these magnitudes) must not change the AUC — it depends only on
    // the ORDER of scores, the defining property of Mann-Whitney
    val rowsGen = for {
      n <- Gen.choose(4, 40)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, 999)          // scores on a coarse 3-dp grid…
        l <- Gen.oneOf(0L, 1L)
      } yield (s / 1000.0, l))
    } yield rows
    val few = SCTest.Parameters.default.withMinSuccessfulTests(10)
    val res = SCTest.check(few, Prop.forAll(rowsGen) { rows =>
      val hasBoth = rows.exists(_._2 == 1L) && rows.exists(_._2 == 0L)
      !hasBoth || {
        def auc(rs: Seq[(Double, Long)]): Double =
          QualityModel.rocAuc(rs.toDF("quality", "label")).head().getDouble(0)
        val base = auc(rows)
        // monotone maps: affine squeeze and a curved blend with
        // derivative ≥ 0.3 — adjacent 3-dp grid points stay ≥ 3·10⁻⁴
        // apart, so 6-dp rounding can neither merge nor reorder them
        val affine = auc(rows.map { case (s, l) => (0.2 + s * 0.5, l) })
        val curved = auc(rows.map { case (s, l) =>
          (BigDecimal(0.3 * s + 0.7 * s * s * s).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble, l) })
        base == affine && base == curved
      }
    })
    assert(res.passed, res.status.toString)
  }

  test("property: percentile ranks lie in [0,1], mean is 1/2 for distinct scores") {
    import graft.operators.QualityModel
    val few = SCTest.Parameters.default.withMinSuccessfulTests(10)
    val res = SCTest.check(few, Prop.forAll(Gen.choose(2, 50)) { n =>
      // n distinct scores → ranks are exactly {0, 1/(n−1), …, 1}
      val rows = (0 until n).map(i => (i.toLong, i / 100.0))
      val got = QualityModel.percentileRanks(rows.toDF("doc_id", "quality"))
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      val want = (0 until n).map(i => i.toLong ->
        BigDecimal(i.toDouble / (n - 1)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
      got == want
    })
    assert(res.passed, res.status.toString)
  }
}
