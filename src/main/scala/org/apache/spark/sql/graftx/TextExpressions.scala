package org.apache.spark.sql.graftx

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
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

object TextExpressions {
  def nfcNormalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))
}
