package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Monitor

class MonitorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T0 = 1700000000000000L // epoch micros

  test("hourlyAnomaly: hand-computed z; degenerate histories yield null z") {
    val hour = 3600000000L
    // type a: counts 1,2,3 per hour -> mean 2, sample sd 1, z = -1,0,1
    // type b: one hour only (k=1) -> null z
    // type c: constant counts (sd=0) -> null z
    val rows =
      Seq.fill(1)((1L, "a", 0L)) ++ Seq.tabulate(2)(i => (10L + i, "a", hour)) ++
      Seq.tabulate(3)(i => (20L + i, "a", 2 * hour)) ++
      Seq((30L, "b", 0L)) ++
      Seq((40L, "c", 0L), (41L, "c", hour))
    val events = rows.toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us") + T0).as("ts"))
    val out = Monitor.hourlyAnomaly(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    val hours = out.keys.filter(_._1 == "a").map(_._2).toSeq.sorted
    assert(out(("a", hours(0))) == ((1L, Some(-1.0))))
    assert(out(("a", hours(1))) == ((2L, Some(0.0))))
    assert(out(("a", hours(2))) == ((3L, Some(1.0))))
    assert(out.filter(_._1._1 == "b").values.forall(_._2.isEmpty), "k=1 -> null z")
    assert(out.filter(_._1._1 == "c").values.forall(_._2.isEmpty), "sd=0 -> null z")
  }

  test("embeddingDrift: hand-computed L2 shift; identical snapshots drift 0") {
    // label 0: old centroid (1,0), new centroid (0,1) -> drift sqrt(2)
    // label 1: same points in both snapshots -> drift 0
    val emb = Seq(
      (0L, 0, Seq(1f, 0f)), (2L, 0, Seq(1f, 0f)),   // old (even ids)
      (1L, 0, Seq(0f, 1f)), (3L, 0, Seq(0f, 1f)),   // new (odd ids)
      (4L, 1, Seq(2f, 2f)), (5L, 1, Seq(2f, 2f))
    ).toDF("vec_id", "label", "embedding")
    val out = Monitor.embeddingDrift(emb, col("vec_id") % 2 === 0).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(0)._1 == 2L)
    assert(math.abs(out(0)._2 - 1.414214) < 1e-9) // round(sqrt(2), 6)
    assert(out(1) == ((2L, 0.0)))
  }

  test("profile: per-column rows, null and distinct counts from one pass") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("a"), None),
      (3L, None, Some(2.0))
    ).toDF("id", "s", "v")
    val out = Monitor.profile(df, Seq("id", "s", "v")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("id") == ((3L, 0L, 3L)))
    assert(out("s") == ((3L, 1L, 1L))) // nulls out of the distinct count
    assert(out("v") == ((3L, 1L, 2L)))
    assert(out.size == 3)
  }

  test("robustOutliers: MAD scores hand-computed; zero MAD yields null z") {
    // values 1..9 plus a wild 1000: median 5.5, |x-med| median = 2.5,
    // z(1000) = 0.6745*(994.5)/2.5 = 268.3161 — flagged; z(9) = 0.9443
    val d = ((1 to 9).map(i => (i.toLong, i.toLong)) :+ (10L, 1000L))
      .toDF("doc_id", "n")
    val out = Monitor.robustOutliers(d, "doc_id", "n").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.get(3)))).toMap
    assert(out(10L) == ((Some(268.3161), Some(true))))
    assert(out(9L)._1.exists(z => math.abs(z - 0.9443) < 1e-9))
    assert(out(9L)._2 == Some(false))
    // constant-majority data: MAD 0 -> null z, null flag
    val flat = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 99L)).toDF("doc_id", "n")
    val f = Monitor.robustOutliers(flat, "doc_id", "n").collect()
    assert(f.forall(r => r.get(2) == null && r.get(3) == null))
  }

  test("exact=false dials: sketch paths track the exact paths at tolerance (sf0.01)") {
    // the round-7 verdict's scale dial: the approx path must exist as a
    // PARAMETER and agree with the exact oracle default within sketch
    // tolerance on real data — run on the sf0.01 gate tables
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // profile: HLL++ distincts within ~5% rsd of exact; rows/nulls exact
    val pe = Monitor.profile(docs, Seq("doc_id", "source"), exact = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val pa = Monitor.profile(docs, Seq("doc_id", "source"), exact = false).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for (c <- Seq("doc_id", "source")) {
      assert(pa(c)._1 == pe(c)._1 && pa(c)._2 == pe(c)._2,
        s"rows/nulls must stay exact for $c")
      val (de, da) = (pe(c)._3.toDouble, pa(c)._3.toDouble)
      assert(math.abs(da - de) <= math.max(2.0, 0.1 * de),
        s"$c: approx distinct $da vs exact $de")
    }
    // robustOutliers: GK-sketch median/MAD keep z within a small band
    val withLen = docs.select(col("doc_id"), length(col("text")).as("n"))
    def zs(exact: Boolean) = Monitor.robustOutliers(withLen, "doc_id", "n",
        exact = exact).collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val (ze, za) = (zs(true), zs(false))
    assert(ze.keySet == za.keySet)
    val diffs = ze.collect { case (id, Some(e)) if za(id).isDefined =>
      math.abs(za(id).get - e) }
    assert(diffs.nonEmpty && diffs.max < 0.5,
      s"max |z_approx - z_exact| = ${if (diffs.nonEmpty) diffs.max else -1}")
    // corpusReport: sketch p50 within 10% of exact, other columns equal
    val ce = operators.CorpusPipeline.corpusReport(docs, exact = true).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val ca = operators.CorpusPipeline.corpusReport(docs, exact = false).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    for ((src, (nd, nt, p50)) <- ce) {
      assert(ca(src)._1 == nd && ca(src)._2 == nt)
      assert(math.abs(ca(src)._3 - p50) <= math.max(1.0, 0.1 * p50),
        s"$src: approx p50 ${ca(src)._3} vs exact $p50")
    }
    // timeToConvert: sketch latency quantiles within 10% of exact
    val events = sources.Tables.events(spark, "/root/testdata/sf0.01")
    val te = operators.Funnel.timeToConvert(events, exact = true).head()
    val ta = operators.Funnel.timeToConvert(events, exact = false).head()
    assert(ta.getLong(0) == te.getLong(0), "n_converted must stay exact")
    // approx_percentile returns an actual data value (no interpolation);
    // in a sparse tail one rank of sketch error can move the VALUE a lot,
    // so the p99 band is wider than the body quantiles' (rank error stays
    // ≤ n/accuracy either way)
    for ((i, tol) <- Seq(1 -> 0.1, 2 -> 0.1, 3 -> 0.3)) {
      val (e, a) = (te.getDouble(i), ta.getDouble(i))
      assert(math.abs(a - e) <= math.max(1.0, tol * e), s"quantile $i: $a vs $e")
    }
  }

  test("decayedCounts: halves per half-life, horizon event weighs 1") {
    val day = 86400000000L
    val events = Seq(
      (1L, "a", 2 * day), // the horizon event: age 0 -> weight 1
      (2L, "a", day),     // one half-life back -> 0.5
      (3L, "a", 0L),      // two -> 0.25
      (4L, "b", 2 * day))
    .toDF("event_id", "event_type", "us")
      .select(col("event_id"), col("event_type"),
        timestamp_micros(col("us") + T0).as("ts"))
    val out = Monitor.decayedCounts(events, "event_type", 86400L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("a") == ((3L, 1.75)))
    assert(out("b") == ((1L, 1.0)))
  }

  test("valueHistogram: bin edges, counts, and null exclusion") {
    val df = Seq(("a", 0.0), ("a", 24.99), ("a", 25.0), ("a", 60.0), ("b", 10.0))
      .toDF("event_type", "value")
      .unionByName(Seq(("a", Option.empty[Double])).toDF("event_type", "value"))
    val out = Monitor.valueHistogram(df, "event_type", "value", 25.0).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(out(("a", 0L)) == ((0.0, 2L)))   // 0.0 and 24.99; the null row is gone
    assert(out(("a", 1L)) == ((25.0, 1L)))  // 25.0 lands in bin 1 (floor)
    assert(out(("a", 2L)) == ((50.0, 1L)))
    assert(out(("b", 0L)) == ((0.0, 1L)))
    assert(out.size == 4)
  }

  test("kAnonymity: class-size distribution, null quasi class, record conservation") {
    // classes: (a,x)×3, (a,y)×1, (b,x)×2, (null,x)×2 → sizes 1:1, 2:2, 3:1
    val df = Seq(
      (1L, Some("a"), "x"), (2L, Some("a"), "x"), (3L, Some("a"), "x"),
      (4L, Some("a"), "y"),
      (5L, Some("b"), "x"), (6L, Some("b"), "x"),
      (7L, None, "x"), (8L, None, "x"))
      .toDF("id", "q1", "q2")
    val out = Monitor.kAnonymity(df, Seq("q1", "q2")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L, 1L)))
    assert(out(2L) == ((2L, 4L)), "nulls form their OWN linkage class")
    assert(out(3L) == ((1L, 3L)))
    assert(out.values.map(_._2).sum == 8L, "records must be conserved")
    assert(out.keys.min == 1L, "the dataset's k-anonymity is the min class size")
    intercept[IllegalArgumentException](Monitor.kAnonymity(df, Seq.empty))
  }

  test("lDiversity: a k-anonymous class with one sensitive value reports l=1") {
    import org.apache.spark.sql.functions._
    // class (a): 3 records, all sensitive=7 → k fine, l = 1 (leaks);
    // class (b): 2 records, sensitive 1 and 2 → l = 2
    val df = Seq(("a", 7L), ("a", 7L), ("a", 7L), ("b", 1L), ("b", 2L))
      .toDF("q", "s")
    val out = graft.operators.Monitor.lDiversity(df, Seq("q"), col("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> ((1L, 3L)), 2L -> ((1L, 2L))),
      s"l distribution wrong: $out")
  }

  test("psi: identical slices score exactly 0; a shifted slice alarms") {
    import spark.implicits._
    val base = Seq.tabulate(1000)(i => (i.toLong, (i % 100).toLong))
      .toDF("id", "v")
    val same = Monitor.psi(base, base, "v", bins = 10).head()
    assert(same.getLong(0) == 1000L && same.getLong(1) == 1000L)
    assert(same.getDouble(3) == 0.0)
    // current shifted by +80: mass leaves the low bins → PSI >> 0.25
    val shifted = base.select(col("id"), (col("v") + 80L).as("v"))
    val drift = Monitor.psi(base, shifted, "v", bins = 10).head().getDouble(3)
    assert(drift > 0.25, s"shifted PSI $drift should alarm")
  }

  test("psi: an empty current slice is finite and deterministic, not an error") {
    import spark.implicits._
    val base = Seq.tabulate(200)(i => (i.toLong, (i % 50).toLong)).toDF("id", "v")
    val none = base.filter(col("v") < 0)
    val r = Monitor.psi(base, none, "v", bins = 5).head()
    assert(r.getLong(1) == 0L)
    assert(!r.isNullAt(3) && !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    val r2 = Monitor.psi(base, none, "v", bins = 5).head()
    assert(r.getDouble(3) == r2.getDouble(3))
  }

  test("psi: an empty REFERENCE fails loudly (bins are undefined)") {
    import spark.implicits._
    val base = Seq.tabulate(50)(i => (i.toLong, i.toLong)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Monitor.psi(base.filter(col("v") < 0), base, "v", bins = 5)
    }
    assert(e.getMessage.contains("reference"))
  }

  test("mutualInformation: perfect dependence gives MI = H = 1 bit, NMI = 1") {
    import spark.implicits._
    val df = (Seq.fill(40)(("x", "u")) ++ Seq.fill(40)(("y", "v")))
      .zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
    val r = Monitor.mutualInformation(df, col("a"), col("b")).head()
    assert(r.getLong(0) == 80L)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("mutualInformation: exact independence gives MI = 0, NMI = 0") {
    import spark.implicits._
    val df = (for { a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 25 }
      yield (a, b)).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "a", "b")
    val r = Monitor.mutualInformation(df, col("a"), col("b")).head()
    assert(r.getDouble(1) == 0.0 && r.getDouble(4) == 0.0)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
  }

  test("mutualInformation: a constant column has H = 0 and defines NMI = 0") {
    import spark.implicits._
    val df = Seq.tabulate(30)(i => (i.toLong, "only", s"g${i % 3}"))
      .toDF("id", "a", "b")
    val r = Monitor.mutualInformation(df, col("a"), col("b")).head()
    assert(r.getDouble(2) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("tCloseness: hand-computed ordered EMD, dense-grid zeros, degenerate m=1") {
    import org.apache.spark.sql.functions._
    // A: (0,0,0,1), B: (0,1,1,1) -> global q=(.5,.5), m=2
    // t_A = |0.75-0.5|/(2-1) = 0.25; t_B symmetric
    val df = (Seq.fill(3)(("a", "x", 0L)) ++ Seq(("a", "x", 1L)) ++
      Seq(("b", "x", 0L)) ++ Seq.fill(3)(("b", "x", 1L)))
      .toDF("src", "lng", "sv")
    val out = graft.operators.Monitor.tCloseness(df, Seq("src", "lng"),
      col("sv")).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("a|x") == 0.25 && out("b|x") == 0.25)
    // absent cells are REAL zeros: A has only sv=0, B only sv=1 ->
    // p_A=(1,0) vs q=(.5,.5) -> t = (0.5 + 0)/1 = 0.5
    val disjoint = (Seq.fill(2)(("a", "x", 0L)) ++ Seq.fill(2)(("b", "x", 1L)))
      .toDF("src", "lng", "sv")
    val d = graft.operators.Monitor.tCloseness(disjoint, Seq("src", "lng"),
      col("sv")).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(d("a|x") == 0.5 && d("b|x") == 0.5,
      s"absent grid cells must contribute p=0 terms: $d")
    // one sensitive value everywhere: every class matches the global
    // distribution trivially -> t = 0, never 0/0
    val mono = Seq(("a", "x", 7L), ("b", "x", 7L)).toDF("src", "lng", "sv")
    val m1 = graft.operators.Monitor.tCloseness(mono, Seq("src", "lng"),
      col("sv")).collect()
    assert(m1.forall(_.getDouble(2) == 0.0))
    // class-domain guard
    val many = spark.range(100).select(col("id").cast("string").as("src"),
      lit("x").as("lng"), (col("id") % 3).as("sv"))
    val ex = intercept[Exception] {
      graft.operators.Monitor.tCloseness(many, Seq("src", "lng"),
        col("sv"), domainLimit = 10L).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("Monitor.tCloseness"))
  }

  test("equidepthHistogram: quantile edges balance counts; ties pile up visibly") {
    import org.apache.spark.sql.functions._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = graft.operators.Monitor.equidepthHistogram(df, "v", bins = 4)
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // edges p25/p50/p75 of 1..100 = 25.75 / 50.5 / 75.25 (interpolated)
    assert(out(0).getDouble(1) == 1.0 && out(0).getDouble(2) == 25.75)
    assert(out(3).getDouble(1) == 75.25 && out(3).getDouble(2) == 100.0)
    assert(out.map(_.getLong(3)).toSeq == Seq(25L, 25L, 25L, 25L),
      "equi-depth on a uniform column balances exactly")
    // heavy ties: ninety 5s + ten 100s at 2 bins — the tie bin's share
    // (0.9) exceeds 1/bins, the skew a planner needs to SEE
    val skew = (Seq.fill(90)(5.0) ++ Seq.fill(10)(100.0)).toDF("v")
    val s = graft.operators.Monitor.equidepthHistogram(skew, "v", bins = 2)
      .collect()
    assert(s(0).getLong(3) == 90L && s(0).getDouble(4) == 0.9)
    assert(s(1).getLong(3) == 10L)
    intercept[IllegalArgumentException] {
      graft.operators.Monitor.equidepthHistogram(
        df.filter(col("v") < 0), "v", bins = 4)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Monitor.equidepthHistogram(df, "v", bins = 1)
    }
  }

  test("profileDrift: null-rate jump and real collapse flag; size scaling does not") {
    import spark.implicits._
    val ref = Seq(
      (1L, Some("a"), "x"), (2L, Some("b"), "y"),
      (3L, Some("c"), "x"), (4L, Some("d"), "y")
    ).toDF("id", "v", "keep")
    // half-size slice: `id` keeps distinctness 1.0 (NOT drift), `keep`
    // keeps cardinality 2 (NOT drift — distinctness doubling alone
    // must not fire), `v` goes all-null (null-rate arm), `extra` is a
    // schema addition
    val cur = Seq(
      (5L, None: Option[String], "x", 1),
      (6L, None, "y", 2)
    ).toDF("id", "v", "keep", "extra")
    val got = graft.operators.Monitor.profileDrift(
      ref, cur, nullRateTol = 0.05, distinctRatioTol = 0.5)
      .collect().map(r => r.getString(0) -> r).toMap
    def drifted(c: String) = got(c).getAs[Int]("drifted")
    assert(got("v").getString(1) == "common" && drifted("v") == 1,
      "all-null current column must flag via the null-rate arm")
    assert(got("v").getAs[Double]("null_rate_delta") == 1.0)
    assert(drifted("id") == 0,
      s"ID column under a size change is NOT drift: ${got("id")}")
    assert(drifted("keep") == 0,
      s"stable categorical under a size change is NOT drift: ${got("keep")}")
    assert(got("extra").getString(1) == "added" && drifted("extra") == 1)
    // a genuine cardinality collapse: the id column degenerates to one
    // repeated value — both the cardinality and distinctness arms move
    val collapsed = Seq((9L, "z"), (9L, "z"), (9L, "z")).toDF("id", "keep")
    val got2 = graft.operators.Monitor.profileDrift(
      ref.select("id", "keep"), collapsed)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got2("id").getAs[Int]("drifted") == 1,
      s"collapse to one value must flag: ${got2("id")}")
    // dropped column lane
    val got3 = graft.operators.Monitor.profileDrift(ref, cur.drop("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got3("v").getString(1) == "dropped" && got3("v").getAs[Int]("drifted") == 1)
  }
}
