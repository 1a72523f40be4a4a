package org.apache.spark.sql.graftx

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for Unicode NFC normalization. Spark has no built-in
  * for this (DuckDB ships `nfc_normalize`; Trino `normalize`), yet it
  * is the first line of every text-dedup recipe: visually-identical
  * strings with different codepoint sequences (é vs e +  ̗ U+0301) must
  * collapse BEFORE any digest/shingle/minhash sees them, or every
  * downstream dedup silently under-merges.
  *
  * The quick-check fast path matters at corpus scale: `isNormalized`
  * is a single scan with no allocation, and real-world corpora are
  * overwhelmingly ASCII/already-NFC — the expensive
  * decompose-reorder-recompose pass runs only on the rows that need
  * it, and the already-normalized row returns the INPUT UTF8String
  * untouched (zero-copy).
  */
object NfcKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native codegen expression — stays
  * inside WholeStageCodegen (one static call per row, no UDF encoder
  * round-trip), null-propagating like the string built-ins.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graftx.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static kernel for Jaro-Winkler similarity — the record-linkage
  * kernel beside `levenshtein`: edit distance counts every edit the
  * same, Jaro-Winkler weights agreement near the string HEAD (name
  * data's most stable region) and tolerates transpositions, which is
  * why ER literature defaults to it for person/org/product names.
  *
  * Semantics are pinned to the de-facto standard the oracle engine
  * (DuckDB, via rapidfuzz) implements, verified empirically on the
  * boundary cases:
  *  - BYTE-level comparison (not codepoints): 'é' vs 'e' is 0.0;
  *  - match window = max(⌊max(la,lb)/2⌋ − 1, 0), so 2-char
  *    transposed pairs ("ab"/"ba") score 0;
  *  - either side empty → 0.0 (including both empty);
  *  - jaro = (m/la + m/lb + (m − ⌊t/2⌋)/m) / 3, t = mismatched
  *    positions between the two matched-character sequences (the
  *    floor matters: odd t IS reachable when the strings have
  *    different lengths);
  *  - the Winkler prefix boost (≤ 4 bytes, weight 0.1) applies only
  *    when jaro > 0.7 (strict).
  *
  * O(la·window) time, two small boolean scratch arrays — per-row
  * cost like levenshtein's, safe inside a projection over candidate
  * pairs at any scale.
  */
object JaroWinklerKernel {
  def jaroWinkler(x: UTF8String, y: UTF8String): Double = {
    val a = x.getBytes
    val b = y.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // transpositions = FLOOR(mismatched positions / 2) — integer
    // division, matching the oracle engine (empirically pinned:
    // 'blu gear'/'blue gear' has 3 mismatched positions; DuckDB
    // scores it as t=1, not t=1.5)
    val jaro = (md / la + md / lb + (md - mismatches / 2) / md) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(la, lb))
      var p = 0
      while (p < maxP && a(p) == b(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** Jaro-Winkler similarity as a native codegen expression — one
  * static call per row inside WholeStageCodegen, null-propagating
  * like the string built-ins.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerKernel.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftx.JaroWinklerKernel.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  def nfcNormalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))

  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinklerSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
