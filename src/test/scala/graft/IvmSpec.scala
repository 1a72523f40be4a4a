package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.Ivm

class IvmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def readRows(state: org.apache.spark.sql.DataFrame) =
    Ivm.read(state)
      .select(col("key"), col("n"), col("sum_v"), col("min_v"), col("max_v"),
        col("avg_v"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("property: base ⊕ delta ≡ from-scratch, in either merge order") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 4), Gen.choose(-50, 500)))
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(gen, Gen.choose(2, 5)) { (rows, mod) =>
        rows.isEmpty || {
          val df = rows.zipWithIndex
            .map { case ((k, v), i) => (i.toLong, k.toLong, v.toLong) }
            .toDF("id", "k", "v")
          val scratch = readRows(Ivm.aggState(df, col("k"), col("v")))
          val a = Ivm.aggState(df.filter(col("id") % mod === 0), col("k"), col("v"))
          val b = Ivm.aggState(df.filter(col("id") % mod =!= 0), col("k"), col("v"))
          readRows(Ivm.merge(a, b)) == scratch &&
            readRows(Ivm.merge(b, a)) == scratch
        }
      })
    assert(res.passed, res.status.toString)
  }

  test("empty delta is the merge identity; disjoint keys union") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
    val base = Ivm.aggState(df, col("k"), col("v"))
    val empty = Ivm.aggState(df.limit(0), col("k"), col("v"))
    assert(readRows(Ivm.merge(base, empty)) == readRows(base))
    // delta introduces a brand-new key: survives with its own state
    val delta = Ivm.aggState(Seq((9L, 7L)).toDF("k", "v"), col("k"), col("v"))
    val merged = Ivm.read(Ivm.merge(base, delta))
      .filter(col("key") === 9L).head()
    assert(merged.getLong(1) == 1L && merged.getLong(3) == 7L)
  }

  test("null values carry no state: count/sum/extrema ignore them") {
    val df = Seq((1L, Some(10L)), (1L, None)).toDF("k", "v")
    val r = Ivm.read(Ivm.aggState(df, col("k"), col("v"))).head()
    assert(r.getLong(1) == 1L && r.getDouble(5) == 10.0)
  }

  test("retractable names exactly the delete-safe state columns") {
    assert(Ivm.retractable == Set("n", "sum_v"))
  }

  test("distinct-count state: merge is commutative and tracks the union") {
    val all = (1L to 2000L).map(i => (i % 3, i)).toDF("k", "v")
    val a = all.filter(col("v") <= 1200L)
    val b = all.filter(col("v") > 600L) // 600-row overlap
    val sa = Ivm.distinctState(a, col("k"), col("v"))
    val sb = Ivm.distinctState(b, col("k"), col("v"))
    val merged = Ivm.readDistinct(Ivm.mergeDistinct(sa, sb))
      .as[(Long, Long)].collect().toMap
    // merge order must not matter (the ⊕ is commutative)
    val swapped = Ivm.readDistinct(Ivm.mergeDistinct(sb, sa))
      .as[(Long, Long)].collect().toMap
    assert(merged == swapped)
    // the merged estimate tracks the exact union within HLL tolerance
    // — it need NOT bit-equal a direct sketch of the union (the union
    // promotes the internal representation), which is exactly why the
    // exact aggregate stays the oracle default
    val exact = all.groupBy(col("k")).agg(countDistinct(col("v")).as("n"))
      .as[(Long, Long)].collect().toMap
    merged.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
        s"estimate for $k off: $est vs ${exact(k)}")
    }
    // delta with a brand-new key survives with its own sketch
    val nk = Ivm.readDistinct(Ivm.mergeDistinct(
        Ivm.distinctState(a, col("k"), col("v")),
        Ivm.distinctState(Seq((9L, 1L)).toDF("k", "v"), col("k"), col("v"))))
      .as[(Long, Long)].collect().toMap
    assert(nk(9L) == 1L)
  }
}
