package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(4)).cast("string")).as("source"))

  test("uniformDraw lands in [0,1) and is replayable per id") {
    val r = corpus(1000)
      .select(Sampling.uniformDraw(col("doc_id")).as("u1"),
        Sampling.uniformDraw(col("doc_id")).as("u2"))
      .agg(min("u1"), max("u1"), sum(when(col("u1") === col("u2"), 0).otherwise(1)))
      .head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) < 1.0)
    assert(r.getLong(2) === 0L, "draw must be deterministic per doc_id")
  }

  test("weight 1.0 keeps all, 0.0 keeps none, >1 caps at keep-all without duplication") {
    val docs = corpus(400)
    val out = Sampling.mixtureSample(docs,
      Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 5.0), defaultWeight = 0.5)
    assert(out.count() === 400L, "sampler must not add or drop rows — it only flags")
    val bySrc = out.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(when(col("sampled"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySrc("src0")._1 === bySrc("src0")._2, "w=1.0 keeps everything")
    assert(bySrc("src1")._2 === 0L, "w=0.0 keeps nothing")
    assert(bySrc("src2")._1 === bySrc("src2")._2, "w>1 caps at keep-all")
    val k3 = bySrc("src3")._2
    assert(k3 > 0L && k3 < bySrc("src3")._1, "default 0.5 keeps a strict subset")
  }

  test("observed rate converges to the weight") {
    val out = Sampling.mixtureSample(corpus(20000),
      Map("src0" -> 0.25, "src1" -> 0.75), defaultWeight = 0.5)
    val rates = out.groupBy("source")
      .agg((sum(when(col("sampled"), 1.0).otherwise(0.0)) / count(lit(1))).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rates("src0") - 0.25) < 0.03)
    assert(math.abs(rates("src1") - 0.75) < 0.03)
    assert(math.abs(rates("src2") - 0.5) < 0.03)
  }

  test("upsample: integer weights give exact copy counts, 0 drops, fractional lands between floors") {
    val out = Sampling.upsample(corpus(4000),
      Map("src0" -> 2.0, "src1" -> 0.0, "src2" -> 2.5), defaultWeight = 1.0)
    val per = out.groupBy("source", "doc_id").agg(count(lit(1)).as("n"),
        max("rep").as("maxr"), min("rep").as("minr"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(per.forall { case (_, n, maxr, minr) => minr === 1L && maxr === n },
      "rep must be the dense 1..n_reps index")
    val bySrc = per.groupBy(_._1).view.mapValues(_.map(_._2))
    assert(bySrc("src0").forall(_ === 2L), "w=2.0 gives exactly two copies")
    assert(!bySrc.contains("src1"), "w=0.0 drops the source entirely")
    assert(bySrc("src2").forall(n => n === 2L || n === 3L), "w=2.5 gives 2 or 3 copies")
    val mean = bySrc("src2").map(_.toDouble).sum / 1000
    assert(math.abs(mean - 2.5) < 0.1, s"w=2.5 mean reps ~2.5, got $mean")
    assert(bySrc("src3").forall(_ === 1L), "default w=1.0 keeps exactly one copy")
  }

  test("upsample rejects negative and absurd weights at the API boundary") {
    intercept[IllegalArgumentException](
      Sampling.upsample(corpus(2), Map("src0" -> -0.1), 1.0))
    intercept[IllegalArgumentException](
      Sampling.upsample(corpus(2), Map("src0" -> 1e6), 1.0))
    // explicit maxWeight raise is honored
    assert(Sampling.upsample(corpus(40), Map.empty, 2000.0, maxWeight = 2000.0)
      .count() === 80000L)
  }

  test("upsample draw is decorrelated from the mixture-sample draw") {
    // same id set, w=0.5 in both paths: if they shared one coin the kept
    // sets would be identical; the salt makes overlap ~binomial(n, .25)
    val docs = corpus(2000)
    val kept = Sampling.mixtureSample(docs, Map.empty, 0.5)
      .filter(col("sampled")).select("doc_id")
    val upped = Sampling.upsample(docs, Map.empty, 0.5).select("doc_id")
    val both = kept.intersect(upped).count().toDouble
    assert(both > 300 && both < 700,
      s"overlap $both should be ~500 of 2000, not ~all-or-none of the ~1000 kept")
  }

  test("stratifiedSample takes exactly min(n, stratum size) rows, replayably") {
    // src0 has 300 docs, src1..3 have 3 each (ids 1200..1208)
    val docs = spark.range(1209).select(col("id").as("doc_id"),
      when(col("id") < 1200, "src0")
        .otherwise(concat(lit("src"), (pmod(col("id"), lit(3)) + 1).cast("string")))
        .as("source"))
    val out = Sampling.stratifiedSample(docs, col("source"), col("doc_id"), 10)
    val per = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per("src0") === 10L, "large stratum capped at n")
    assert(per("src1") === 3L && per("src2") === 3L && per("src3") === 3L,
      "small strata kept whole")
    val again = Sampling.stratifiedSample(docs, col("source"), col("doc_id"), 10)
    assert(out.select("doc_id").except(again.select("doc_id")).isEmpty,
      "selection is replayable")
  }

  test("stratifiedSample plan is a WindowGroupLimit partial top-n, not a full sort") {
    val plan = Sampling.stratifiedSample(corpus(100), col("source"), col("doc_id"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=n must push a map-side group limit below the exchange:\n$plan")
  }

  test("tokenBudget keeps the exact deterministic prefix; crossing doc included") {
    val docs = corpus(200).withColumn("text",
      concat_ws(" ", transform(sequence(lit(1), (pmod(col("doc_id"), lit(7)) + 1).cast("int")),
        _ => lit("w"))))
    // numShards = 1 → selection order is pure (sha256(doc_id), doc_id)
    val out = Sampling.tokenBudget(docs, Map("src0" -> 60L), defaultBudget = 40L,
      numShards = 1).collect()
    assert(out.length == 200, "flagging operator must not add or drop rows")
    val bySrc = out.groupBy(_.getAs[String]("source"))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex(id: Long) = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    bySrc.foreach { case (src, rows) =>
      val budget = if (src == "src0") 60L else 40L
      val ordered = rows.sortBy(r => (hex(r.getAs[Long]("doc_id")), r.getAs[Long]("doc_id")))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("start") == cum, s"$src prefix sum")
        assert(r.getAs[Boolean]("kept") == (cum < budget), s"$src keep rule")
        cum += r.getAs[Long]("n_tokens")
      }
      val keptTokens = rows.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("n_tokens")).sum
      assert(keptTokens >= budget, s"$src must reach the budget (crossing doc kept)")
    }
  }

  test("tokenBudget: zero budget drops the source, huge budget keeps everything") {
    val docs = corpus(100).withColumn("text", lit("one two three"))
    val sum = Sampling.tokenBudgetSummary(docs,
      Map("src0" -> 0L), defaultBudget = 1000000L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sum("src0")._2 == 0L && sum("src0")._3 == 0L)
    Seq("src1", "src2", "src3").foreach { s =>
      assert(sum(s)._1 == sum(s)._2, s"$s fully kept under a huge budget")
    }
  }

  test("tokenBudget is replayable and shard-stable across reruns") {
    val docs = corpus(300).withColumn("text", lit("a b c d e"))
    def keptSet = Sampling.tokenBudget(docs, Map.empty, defaultBudget = 100L, numShards = 4)
      .filter(col("kept")).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(keptSet == keptSet, "identical kept set on replay")
    assert(keptSet.nonEmpty)
  }

  test("mixtureSummary rate column equals n_sampled / n_docs rounded to 6") {
    val s = Sampling.mixtureSummary(corpus(1000), Map("src0" -> 0.3), 0.9)
      .collect()
    assert(s.map(_.getString(0)).toSeq === Seq("src0", "src1", "src2", "src3"))
    s.foreach { r =>
      val expect = BigDecimal(r.getLong(2).toDouble / r.getLong(1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) === expect)
    }
  }

  test("dsirWeights: target-vocabulary docs score positive, raw-vocabulary negative") {
    // word buckets are sha-256 derived and therefore fixed forever; the
    // two vocabularies below were chosen to be collision-free in 64
    // buckets (alpha 4, beta 51, gamma 57 / delta 35, epsilon 60,
    // omega 43, kappa 42), so the sign invariant is exact, not
    // probabilistic
    val d = Seq(
      (0L, "alpha beta alpha gamma", "en"),
      (1L, "alpha beta", "en"),
      (2L, "delta epsilon omega", "de"),
      (3L, "delta kappa", "de"),
      (4L, "alpha delta", "de")
    ).toDF("doc_id", "text", "lang")
    val got = Sampling.dsirWeights(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(0L)._1 == 4 && got(1L)._1 == 2)
    assert(got(0L)._2 > 0 && got(0L)._3, "pure target vocabulary must look target-like")
    assert(got(1L)._2 > 0 && got(1L)._3)
    assert(got(2L)._2 < 0 && !got(2L)._3, "pure raw vocabulary must look raw-like")
    assert(got(3L)._2 < 0 && !got(3L)._3)
    // doc 4 mixes one target-heavy and one raw-heavy word; its score
    // sits strictly between the pure docs' scores
    assert(got(4L)._2 > got(2L)._2 && got(4L)._2 < got(0L)._2)
  }

  test("classBalance: entropy 0 for monoculture, ln2 for 50/50, majority ties on class") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "en", "mono"), (2L, "en", "mono"),
      (3L, "en", "even"), (4L, "de", "even"),
      (5L, "en", "skew"), (6L, "en", "skew"), (7L, "en", "skew"), (8L, "de", "skew"))
      .toDF("doc_id", "lang", "source")
    val out = graft.operators.Sampling.classBalance(d, "source", "lang").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("mono") == ((2L, 1L, "en", 1.0, 0.0)))
    // 50/50: ties on count -> 'de' (min class) is the reported majority
    assert(out("even") == ((2L, 2L, "de", 0.5, r6(2 * r9(0.5 * math.log(2))))))
    val skewH = r6(r9(-0.75 * math.log(0.75)) + r9(-0.25 * math.log(0.25)))
    assert(out("skew") == ((4L, 2L, "en", 0.75, skewH)))
  }

  test("leakageSafeSplit: groups never straddle; rescued flags the moved docs") {
    import org.apache.spark.sql.functions.col
    // component {3, 8, 19}: min id 3 → everyone 'train' (3%10=3).
    // naive would put 8 → 'valid' and 19 → 'test' — both rescued.
    val docs = Seq(3L, 8L, 19L, 28L, 7L).toDF("doc_id")
    val groups = Seq((3L, 3L), (8L, 3L), (19L, 3L)).toDF("doc_id", "group_id")
    val out = graft.operators.Sampling.leakageSafeSplit(docs, groups).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(out(3L) == ((3L, "train", false)))
    assert(out(8L) == ((3L, "train", true)))
    assert(out(19L) == ((3L, "train", true)))
    // singletons: own id, naive == group split, never rescued
    assert(out(28L) == ((28L, "valid", false)))
    assert(out(7L) == ((7L, "train", false)))
    // the invariant the operator exists for: one split per group
    val d = graft.operators.Sampling.leakageSafeSplit(docs, groups)
      .groupBy(col("group_id"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(d == 0, "a dup group straddled splits")
  }

  private def curriculumDocs = (0L until 300L)
    .map(i => (i, "x" * 60, 40L + (i * 7L) % 500L))
    .toDF("doc_id", "text", "n_chars")

  test("curriculumOrder: stages ascend with position; order is replayable") {
    val d = curriculumDocs
    val a = Sampling.curriculumOrder(d, seed = 42L, limit = 100).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    // positions are 1..limit and stages never decrease along them
    assert(a.map(_._4).toSeq == (1L to 100L))
    val stages = a.sortBy(_._4).map(_._2).toSeq
    assert(stages == stages.sorted, "difficulty stage must be monotone in position")
    // replayable: a second run is identical
    val b = Sampling.curriculumOrder(d, seed = 42L, limit = 100).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("curriculumOrder: the seed permutes within stages without changing them") {
    val d = curriculumDocs
    val a = Sampling.curriculumOrder(d, seed = 1L, limit = 300).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    val b = Sampling.curriculumOrder(d, seed = 2L, limit = 300).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // same docs, same per-doc stage...
    assert(a.map(x => x._1 -> x._2).toMap == b.map(x => x._1 -> x._2).toMap)
    // ...different within-stage order (md5 keys differ)
    assert(a.sortBy(_._3).map(_._1).toSeq != b.sortBy(_._3).map(_._1).toSeq,
      "changing the seed must permute the epoch order")
  }

  test("curriculumOrder plans as TakeOrderedAndProject, not a global sort") {
    val plan = Sampling.curriculumOrder(curriculumDocs, limit = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"the staged cut must be a partial top-k:\n$plan")
  }

  test("weightedSample: replayable, weight-responsive, total on bad weights") {
    val df = (1L to 200L).map(i => (i, if (i == 7L) 1000000L else 1L))
      .toDF("doc_id", "wt")
    val pick = Sampling.weightedSample(df, col("doc_id"), col("wt"), 10)
    val ids = pick.select(col("id")).as[Long].collect().toSet
    // the million-weight row is (1 - ~e^-1e6·u-ish) certain to make a
    // top-10 of 200: its key is u's log shrunk a millionfold
    assert(ids.contains(7L), s"heavy row must be sampled: $ids")
    // replayable: same seed, same sample; new seed, (almost surely) not
    val again = Sampling.weightedSample(df, col("doc_id"), col("wt"), 10)
      .select(col("id")).as[Long].collect().toSet
    assert(again == ids)
    val reseeded = Sampling.weightedSample(df, col("doc_id"), col("wt"), 10, seed = 99L)
      .select(col("id")).as[Long].collect().toSet
    assert(reseeded != ids, "independent permutation under a new seed")
    // null/zero/negative weights carry no mass and never sample
    val bad = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(-2L)))
      .toDF("doc_id", "wt")
    val out = Sampling.weightedSample(bad, col("doc_id"), col("wt"), 10)
      .select(col("id")).as[Long].collect().toSeq
    assert(out == Seq(1L))
  }

  test("weightedSample plans as TakeOrderedAndProject (parallel reservoir)") {
    val df = (1L to 50L).map(i => (i, i)).toDF("doc_id", "wt")
    val plan = Sampling.weightedSample(df, col("doc_id"), col("wt"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"A-ES must cut as a partial top-k, not a global sort:\n$plan")
  }

  test("hashSampleQuantiles: sample == corpus when n <= k, so estimates are exact") {
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "x")
    val got = Sampling.hashSampleQuantiles(df, "id", "x", k = 1024,
      ps = Seq(0.5, 0.9)).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getLong(4) == 100 && r.getLong(5) == 100)
      assert(r.getDouble(3) == 0.0, "full sample must reproduce the exact quantile")
    }
    assert(got(0).getDouble(1) == 50.5, "interpolated p50 of 1..100")
    assert(got(1).getDouble(1) == 90.1, "interpolated p90 of 1..100")
  }

  test("hashSampleQuantiles: a k-row sample tracks the corpus distribution") {
    // 4000 rows, values 1..4000 — a 256-row hash sample's p50 should
    // land well inside the middle half (deterministic given md5)
    val df = (1L to 4000L).map(i => (i, i.toDouble)).toDF("id", "x")
    val got = Sampling.hashSampleQuantiles(df, "id", "x", k = 256,
      ps = Seq(0.5)).collect()(0)
    assert(got.getLong(4) == 256, "sample is exactly k rows")
    assert(got.getLong(5) == 4000)
    assert(got.getDouble(1) > 1000 && got.getDouble(1) < 3000,
      s"sample p50 ${got.getDouble(1)} should track the corpus median 2000.5")
    assert(got.getDouble(3) == math.abs(got.getDouble(1) - got.getDouble(2)))
  }

  test("hashSampleQuantiles: withExact=false skips the corpus pass and the cap") {
    val df = (1L to 50L).map(i => (i, i.toDouble)).toDF("id", "x")
    val got = Sampling.hashSampleQuantiles(df, "id", "x", k = 16,
      ps = Seq(0.5), withExact = false).collect()(0)
    assert(!got.isNullAt(1), "sample estimate still reported")
    assert(got.isNullAt(2) && got.isNullAt(3), "no exact side, no error")
    // and the sample-scale cap does not apply on the sample-only path
    val uncapped = Sampling.hashSampleQuantiles(df, "id", "x", k = 16,
      ps = Seq(0.5), withExact = false, maxExactRows = 1L)
    assert(uncapped.count() == 1)
  }

  test("hashSampleQuantiles: the exact side is a capped evaluator") {
    val df = (1L to 50L).map(i => (i, i.toDouble)).toDF("id", "x")
    val ex = intercept[Exception] {
      Sampling.hashSampleQuantiles(df, "id", "x", k = 16,
        ps = Seq(0.5), maxExactRows = 10L).collect()
    }
    def msg(e: Throwable): String = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg(ex).contains("sample-scale evaluator"))
    intercept[IllegalArgumentException] {
      Sampling.hashSampleQuantiles(df, "id", "x", k = 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSampleQuantiles(df, "id", "x", ps = Seq(1.5))
    }
  }

  test("groupHashSampleQuantiles: per-group exactness below k, group isolation") {
    // group a: 1..50 (n < k -> sample == group, abs_error 0);
    // group b: shifted 1000-fold so any cross-group leak is glaring
    val df = ((1 to 50).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 40).map(i => ("b", 1000L + i, i * 1000.0)))
      .toDF("g", "id", "x")
    val out = Sampling.groupHashSampleQuantiles(df, "g", "id", "x",
      k = 64, ps = Seq(0.5)).collect()
    assert(out.length == 2)
    val byG = out.map(r => r.getString(0) -> r).toMap
    assert(byG("a").getDouble(2) == 25.5 && byG("a").getDouble(4) == 0.0)
    assert(byG("b").getDouble(2) == 20500.0 && byG("b").getDouble(4) == 0.0)
    assert(byG("a").getLong(5) == 50 && byG("b").getLong(5) == 40)
  }

  test("groupHashSampleQuantiles: WindowGroupLimit map-side cut; caps and params") {
    val df = (1 to 500).map(i => (s"g${i % 4}", i.toLong, i.toDouble))
      .toDF("g", "id", "x")
    val qe = Sampling.groupHashSampleQuantiles(df, "g", "id", "x", k = 16)
      .queryExecution
    assert(qe.executedPlan.toString.contains("WindowGroupLimit"),
      "the per-group rank cut must push map-side, not sort whole groups:\n" +
        qe.executedPlan.toString.take(2000))
    // sample is exactly k per group once groups exceed k
    val got = Sampling.groupHashSampleQuantiles(df, "g", "id", "x",
      k = 16, ps = Seq(0.5)).collect()
    assert(got.forall(_.getLong(5) == 16L))
    // sample-only path skips the exact pass; the cap binds the exact side
    val prodOnly = Sampling.groupHashSampleQuantiles(df, "g", "id", "x",
      k = 16, ps = Seq(0.5), withExact = false).collect()
    assert(prodOnly.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    val ex = intercept[Exception] {
      Sampling.groupHashSampleQuantiles(df, "g", "id", "x",
        k = 16, ps = Seq(0.5), maxExactRows = 10L).collect()
    }
    def msg(e: Throwable): String = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg(ex).contains("sample-scale evaluator"))
  }
}
