package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bootstrap

/** Poisson bootstrap: deterministic replay, CI sanity (covers the
  * point estimate, tightens with data), and the degenerate lanes.
  */
class BootstrapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(n: Int) =
    Seq.tabulate(n)(i => (i.toLong, 100L + (i % 7))).toDF("doc_id", "v")

  test("deterministic: identical inputs give identical CI rows") {
    val df = fixture(500)
    val a = Bootstrap.meanCi(df, "doc_id", "v", reps = 100).collect().toSeq
    val b = Bootstrap.meanCi(df, "doc_id", "v", reps = 100).collect().toSeq
    assert(a == b && a.length == 1)
  }

  test("CI brackets the point mean and sits near the true mean") {
    val df = fixture(2000) // true mean = 100 + mean(i%7) ≈ 103.0
    val r = Bootstrap.meanCi(df, "doc_id", "v", reps = 200).head()
    val (nRows, nReps) = (r.getLong(0), r.getLong(1))
    val (point, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(nRows == 2000L && nReps == 200L)
    assert(lo <= point && point <= hi, s"CI [$lo,$hi] must bracket $point")
    assert(hi - lo < 1.0, "a 2000-row mean CI must be tight")
    assert(math.abs(point - 103.0) < 0.2)
  }

  test("CI width shrinks roughly like 1/sqrt(n)") {
    def width(n: Int) = {
      val r = Bootstrap.meanCi(fixture(n), "doc_id", "v", reps = 200).head()
      r.getDouble(4) - r.getDouble(3)
    }
    val (w400, w6400) = (width(400), width(6400))
    assert(w6400 < w400 / 2.5, s"w400=$w400 w6400=$w6400")
  }

  test("re-salting gives an independent (different) replicate draw") {
    val df = fixture(300)
    val a = Bootstrap.meanCi(df, "doc_id", "v", salt = "bs").head()
    val b = Bootstrap.meanCi(df, "doc_id", "v", salt = "other").head()
    assert(a.getDouble(2) == b.getDouble(2), "point estimate is salt-free")
    assert(a.getDouble(3) != b.getDouble(3) || a.getDouble(4) != b.getDouble(4),
      "CIs from independent draws should differ in some digit")
  }

  test("null values drop; parameter validation") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(20L)))
      .toDF("doc_id", "v")
    val r = Bootstrap.meanCi(df, "doc_id", "v", reps = 50).head()
    assert(r.getLong(0) == 2L && r.getDouble(2) == 15.0)
    intercept[IllegalArgumentException](Bootstrap.meanCi(df, "doc_id", "v", reps = 1))
    intercept[IllegalArgumentException](
      Bootstrap.meanCi(df, "doc_id", "v", level = 1.0))
  }

  test("diffCi: a real uplift's CI excludes zero; a null effect's CI contains it") {
    // A ~ 110 (spread ±3), B ~ 100 — the CI must be all-positive
    val ab = Seq.tabulate(1200) { i =>
      val g = if (i % 2 == 0) "A" else "B"
      (i.toLong, (if (g == "A") 110L else 100L) + (i % 7) - 3L, g)
    }.toDF("doc_id", "v", "grp")
    val r = Bootstrap.diffCi(ab, "doc_id", "v", "grp", "A", "B", reps = 200).head()
    assert(r.getLong(0) == 600L && r.getLong(1) == 600L && r.getLong(2) == 200L)
    val (point, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(lo <= point && point <= hi)
    assert(math.abs(point - 10.0) < 0.5)
    assert(lo > 0, s"a 10-point uplift on n=600/600 must exclude 0, got lo=$lo")
    // same values, group labels shuffled deterministically -> null effect
    val nul = ab.withColumn("grp",
      when(pmod(col("doc_id"), lit(4)) < 2, "A").otherwise("B"))
    val rn = Bootstrap.diffCi(nul, "doc_id", "v", "grp", "A", "B", reps = 200).head()
    assert(rn.getDouble(4) <= 0.0 && rn.getDouble(5) >= 0.0,
      s"label-scrambled CI [${rn.getDouble(4)}, ${rn.getDouble(5)}] should contain 0")
  }

  test("diffCi: an absent group fails loudly") {
    val onlyA = Seq((1L, 10L, "A"), (2L, 12L, "A")).toDF("doc_id", "v", "grp")
    val e = intercept[Exception] {
      Bootstrap.diffCi(onlyA, "doc_id", "v", "grp", "A", "B").collect()
    }
    assert(e.getMessage.contains("group absent"))
  }

  test("weights follow Poisson(1): ~37% zeros over many (row, rep) draws") {
    // indirect but deterministic: with one row and many reps, the
    // share of dropped/zero-weight replicates estimates P[X=0] = e^-1
    val one = Seq((42L, 1000L)).toDF("doc_id", "v")
    val r = Bootstrap.meanCi(one, "doc_id", "v", reps = 2000).head()
    val usedShare = r.getLong(1).toDouble / 2000.0
    assert(math.abs(usedShare - (1 - math.exp(-1))) < 0.03,
      s"used share $usedShare should approximate 1 - e^-1 ≈ 0.632")
  }
}
