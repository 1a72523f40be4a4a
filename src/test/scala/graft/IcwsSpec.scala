package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Icws

/** ICWS weighted-Jaccard: collision probability equals the generalized
  * Jaccard, so identical weighted sets must match on EVERY sample
  * (est 1.0 exactly), disjoint sets on none (0.0), and the exact
  * column must reproduce the hand-computed Σmin/Σmax.
  */
class IcwsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rowsOf(data: (String, String, Long)*) =
    data.toDF("g", "e", "w")

  test("identical weighted sets estimate exactly 1.0; disjoint exactly 0.0") {
    val rows = rowsOf(
      ("a", "x", 3L), ("a", "y", 1L),
      ("b", "x", 3L), ("b", "y", 1L),      // identical to a
      ("c", "p", 2L), ("c", "q", 5L))      // disjoint from both
    val got = Icws.weightedJaccardIcws(rows, "g", "e", "w", k = 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    // same (elem, weight) profile → same draws → same argmin per i:
    // every sample collides, estimator exactly 16/16
    assert(got(("a", "b")) == ((1.0, 1.0)), s"$got")
    // disjoint vocabularies cannot share a sample element
    assert(got(("a", "c")) == ((0.0, 0.0)), s"$got")
    assert(got(("b", "c")) == ((0.0, 0.0)), s"$got")
  }

  test("exact column is the hand-computed sum-min over sum-max; estimate within the k=32 band") {
    // A = {x:4, y:2}, B = {x:1, y:2, z:3}:
    // Σmin = 1 + 2 = 3; Σmax = 4 + 2 + 3 = 9; J_w = 1/3
    val rows = rowsOf(
      ("a", "x", 4L), ("a", "y", 2L),
      ("b", "x", 1L), ("b", "y", 2L), ("b", "z", 3L))
    val r = Icws.weightedJaccardIcws(rows, "g", "e", "w", k = 32).head()
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getDouble(4) == 0.333333, s"exact ${r.getDouble(4)}")
    val est = r.getDouble(3)
    // Var = J(1-J)/k → sd ≈ 0.083; 4 sd ≈ 0.33 — a loose, stable band
    assert(est >= 0.0 && est <= 1.0 && math.abs(est - 1.0 / 3) <= 0.34,
      s"estimate $est implausibly far from J_w = 1/3")
    assert(r.getDouble(5) ==
      BigDecimal(math.abs(est - 0.333333)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("duplicate (group, elem) rows sum their weights; weight scale shifts the estimate") {
    // duplicates fold: {x:2+2} ≡ {x:4}
    val dup = rowsOf(("a", "x", 2L), ("a", "x", 2L), ("b", "x", 4L))
    val r = Icws.weightedJaccardIcws(dup, "g", "e", "w", k = 8).head()
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0, s"$r")
    // same SETS, different weights: J_w = min/max = 1/5 — the weighted
    // estimator must see the difference a set-Jaccard cannot
    val skew = rowsOf(("a", "x", 1L), ("b", "x", 5L))
    val s = Icws.weightedJaccardIcws(skew, "g", "e", "w", k = 32).head()
    assert(s.getDouble(4) == 0.2, s"$s")
    assert(s.getDouble(3) < 1.0,
      s"weight-skewed singletons must not collide on every sample: $s")
  }

  test("the group-domain gate refuses over maxGroups in-plan") {
    val rows = (1 to 10).map(i => (s"g$i", "x", 1L)).toDF("g", "e", "w")
    val ex = intercept[Exception] {
      Icws.weightedJaccardIcws(rows, "g", "e", "w", k = 4, maxGroups = 4)
        .collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("weightedJaccardIcws"),
      s"expected the domain-gate raise naming the site: $msg")
  }

  test("weightedContainment: hand-computed directional masses; subset reads 1.0; disjoint pairs report explicit zeros") {
    // A = {x:4, y:2} (tot 6), B = {x:1, y:2, z:3} (tot 6): Σmin = 3
    // → C(A→B) = C(B→A) = 0.5; C = {q:7} disjoint from both
    val rows = rowsOf(
      ("a", "x", 4L), ("a", "y", 2L),
      ("b", "x", 1L), ("b", "y", 2L), ("b", "z", 3L),
      ("c", "q", 7L))
    val got = Icws.weightedContainment(rows, "g", "e", "w")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // the pair domain is TOTAL: disjoint pairs carry explicit zeros
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")), s"$got")
    assert(got(("a", "b")) == ((0.5, 0.5)), s"$got")
    assert(got(("a", "c")) == ((0.0, 0.0)), s"$got")
    assert(got(("b", "c")) == ((0.0, 0.0)), s"$got")
    // a weighted SUBSET is fully contained even at small symmetric
    // Jaccard: A = {x:2} inside B = {x:5, y:1} (J_w = 2/6)
    val sub = rowsOf(("a", "x", 2L), ("b", "x", 5L), ("b", "y", 1L))
    val s2 = Icws.weightedContainment(sub, "g", "e", "w").head()
    assert(s2.getDouble(2) == 1.0 && s2.getDouble(3) == 0.333333, s"$s2")
    // the group-domain gate rides the plan, same as the ICWS readout
    val many = (1 to 10).map(i => (s"g$i", "x", 1L)).toDF("g", "e", "w")
    val ex = intercept[Exception] {
      Icws.weightedContainment(many, "g", "e", "w", maxGroups = 4).collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("weightedContainment"), s"$msg")
  }

  test("persisted layout probe is row-for-row the from-rows operator; a bare path refuses") {
    val rows = rowsOf(
      ("a", "x", 4L), ("a", "y", 2L), ("a", "z", 7L),
      ("b", "x", 1L), ("b", "y", 2L), ("b", "z", 3L),
      ("c", "q", 5L), ("c", "x", 4L),
      ("d", "q", 5L), ("d", "x", 4L))
    val path = java.nio.file.Files
      .createTempDirectory("icws_sketch_spec").toString
    Icws.persistSketches(rows, "g", "e", "w", path, k = 16)
    val direct = Icws.weightedJaccardIcws(rows, "g", "e", "w", k = 16)
      .collect().map(_.toSeq).toSeq
    val probed = Icws.weightedJaccardIcwsPersisted(spark, path)
      .collect().map(_.toSeq).toSeq
    assert(probed == direct, s"probed $probed vs direct $direct")
    // the manifest carries k: a probe never guesses the sample count
    val ex = intercept[IllegalArgumentException] {
      Icws.weightedJaccardIcwsPersisted(spark,
        java.nio.file.Files.createTempDirectory("icws_empty").toString)
    }
    assert(ex.getMessage.contains("manifest"))
  }

  test("appended layout probe equals a fresh rebuild over the merged rows; a torn batch is invisible") {
    val base = rowsOf(
      ("a", "x", 4L), ("a", "y", 2L),
      ("b", "x", 1L), ("b", "y", 2L), ("b", "z", 3L),
      ("c", "q", 5L))
    // batch 1 touches existing a and new d; batch 2 re-touches a (the
    // latest-wins override) and touches c
    val batch1 = rowsOf(("a", "z", 3L), ("d", "x", 4L), ("d", "q", 1L))
    val batch2 = rowsOf(("a", "x", 2L), ("c", "x", 4L))
    val all = base.unionByName(batch1).unionByName(batch2)
    val path = java.nio.file.Files
      .createTempDirectory("icws_append_spec").toString
    Icws.persistSketches(base, "g", "e", "w", path, k = 16)
    Icws.appendSketches(batch1, "g", "e", "w", path)
    Icws.appendSketches(batch2, "g", "e", "w", path)
    val direct = Icws.weightedJaccardIcws(all, "g", "e", "w", k = 16)
      .collect().map(_.toSeq).toSeq
    val probed = Icws.weightedJaccardIcwsPersisted(spark, path)
      .collect().map(_.toSeq).toSeq
    assert(probed == direct, s"probed $probed vs direct $direct")
    // torn append: a batch directory without its _COMMITTED marker
    // must not change a single row of the probe
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path, "batches", "batch-torn"))
    val afterTorn = Icws.weightedJaccardIcwsPersisted(spark, path)
      .collect().map(_.toSeq).toSeq
    assert(afterTorn == direct, "uncommitted batch leaked into the probe")
  }

  test("compacted tables are row-identical to a fresh rebuild; batches are folded away") {
    val base = rowsOf(
      ("a", "x", 4L), ("a", "y", 2L),
      ("b", "x", 1L), ("b", "z", 3L))
    val batch1 = rowsOf(("a", "z", 3L), ("c", "q", 5L), ("c", "x", 2L))
    val batch2 = rowsOf(("b", "y", 7L), ("c", "q", 1L))
    val all = base.unionByName(batch1).unionByName(batch2)
    val path = java.nio.file.Files
      .createTempDirectory("icws_compact_spec").toString
    val fresh = java.nio.file.Files
      .createTempDirectory("icws_compact_fresh").toString
    Icws.persistSketches(base, "g", "e", "w", path, k = 16)
    Icws.appendSketches(batch1, "g", "e", "w", path)
    Icws.appendSketches(batch2, "g", "e", "w", path)
    Icws.compactSketches(spark, path)
    Icws.persistSketches(all, "g", "e", "w", fresh, k = 16)
    for (table <- Seq("weights", "totals", "sketches")) {
      def rows(p: String) = spark.read.parquet(s"$p/$table")
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(rows(path) == rows(fresh), s"$table diverged from rebuild")
    }
    val batchRoot = new java.io.File(s"$path/batches")
    assert(!batchRoot.exists || batchRoot.list().isEmpty,
      "compaction left committed batches behind")
    val probed = Icws.weightedJaccardIcwsPersisted(spark, path)
      .collect().map(_.toSeq).toSeq
    val direct = Icws.weightedJaccardIcws(all, "g", "e", "w", k = 16)
      .collect().map(_.toSeq).toSeq
    assert(probed == direct, s"post-compact probe drifted: $probed vs $direct")
  }

  test("appends re-sketch under the LAYOUT's salt, and an oversize append refuses in-plan") {
    val base = rowsOf(("a", "x", 4L), ("b", "x", 1L), ("b", "y", 2L))
    val batch = rowsOf(("a", "y", 3L))
    val path = java.nio.file.Files
      .createTempDirectory("icws_salt_spec").toString
    Icws.persistSketches(base, "g", "e", "w", path, k = 16, salt = "era7")
    Icws.appendSketches(batch, "g", "e", "w", path)
    // identical up to the estimate column only if the append drew
    // under salt "era7" — a default-salt redraw would zero the
    // cross-era collisions and shift est_weighted_jaccard
    val probed = Icws.weightedJaccardIcwsPersisted(spark, path)
      .collect().map(_.toSeq).toSeq
    val direct = Icws.weightedJaccardIcws(base.unionByName(batch),
      "g", "e", "w", k = 16, salt = "era7").collect().map(_.toSeq).toSeq
    assert(probed == direct, s"probed $probed vs direct $direct")
    // the group-domain gate rides the append: refusal names the site
    val many = (1 to 9).map(i => (s"n$i", "x", 1L)).toDF("g", "e", "w")
    val ex = intercept[Exception] {
      Icws.appendSketches(many, "g", "e", "w", path, maxGroups = 4)
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("appendSketches"), s"$msg")
    // the refused batch never committed: the probe still reads the
    // pre-append view
    val after = Icws.weightedJaccardIcwsPersisted(spark, path)
      .collect().map(_.toSeq).toSeq
    assert(after == direct, "a refused append leaked into the layout")
  }
}
