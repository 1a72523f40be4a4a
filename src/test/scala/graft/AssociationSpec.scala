package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Association

class AssociationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lift(rows: (Long, String)*) =
    Association.basketLift(rows.toDF("b", "i"), col("b"), col("i"))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("support"), col("lift"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

  test("hand-computed lift; ubiquitous item has lift exactly 1") {
    // baskets: {a,b}, {a,b}, {a}, {c} → n_a=3, n_b=2, n_ab=2, N=4
    // lift = 2·4/(3·2) = 1.333333, support = 0.5
    val m = lift((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "c"))
    assert(m(("a", "b")) == ((2L, 0.5, 1.333333)))
    // item in EVERY basket: co-occurrence is exactly chance → lift 1
    val u = lift((1L, "x"), (1L, "y"), (2L, "x"), (3L, "x"), (4L, "x"))
    assert(u(("x", "y"))._3 == 1.0)
  }

  test("duplicate (basket, item) rows collapse before counting") {
    // 'a' listed twice in basket 1 must not inflate n_ab or n_a
    val m = lift((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
    assert(m(("a", "b")) == ((1L, 0.5, 1.0)))
  }

  test("maxBasketSize: loud by default, drops + reports only on opt-in") {
    // one jumbo basket of 50 items (would emit 50·49/2 pairs) plus two
    // small baskets
    val jumbo = (1 to 50).map(i => (99L, f"j$i%02d"))
    val small = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"))
    val df = (jumbo ++ small).toDF("b", "i")
    // default: an over-cap basket RAISES — a silent drop would diverge
    // from any uncapped oracle with no error
    val ex = intercept[Exception] {
      Association.basketLift(df, col("b"), col("i"), maxBasketSize = 10)
        .collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxBasketSize"), s"expected the cap raise: $msg")
    // opt-in drop: the jumbo basket contributes NOTHING to pairs,
    // counts, or N, and shows up in the oversized report
    val out = Association.basketLift(df, col("b"), col("i"),
        maxBasketSize = 10, dropOversized = true)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(6)))).toMap
    // only the small-basket pair survives; N=2 (jumbo excluded), so
    // lift = 2·2/(2·2) = 1
    assert(out == Map(("a", "b") -> ((2L, 1.0))),
      s"jumbo pairs must not appear: $out")
    val over = Association.oversizedBaskets(df, col("b"), col("i"),
        maxBasketSize = 10)
      .as[(Long, Long)].collect().toSet
    assert(over == Set((99L, 50L)), "the dropped basket is reported with its size")
    // the default cap leaves small fixtures untouched (contract-row
    // safety: 50-item baskets are far under 10k)
    val all = Association.basketLift(df, col("b"), col("i"))
    assert(all.count() > 1L, "default cap must not affect 50-item baskets")
  }

  test("minPairCount prunes singleton pairs; null baskets/items drop") {
    val df = Seq((Some(1L), Some("a")), (Some(1L), Some("b")),
      (None, Some("z")), (Some(2L), None)).toDF("b", "i")
    val out = Association.basketLift(df, col("b"), col("i"), minPairCount = 2L)
    assert(out.count() == 0L)
    val kept = Association.basketLift(df, col("b"), col("i"))
    assert(kept.count() == 1L)
  }
}
