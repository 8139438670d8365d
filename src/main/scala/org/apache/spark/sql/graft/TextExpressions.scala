package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-word shingle expression: tokenize on single spaces and emit all
  * n-token windows joined by a space, in one pass over the UTF8String —
  * replacing a `transform(sequence(...), i -> array_join(slice(split(...))))`
  * HOF tree that evaluates interpreted with per-window allocations.
  * Semantics match the HOF form exactly (asserted in TextOpsSpec), so
  * downstream MinHash/Jaccard results are unchanged.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native text canonicalization in one pass: Unicode NFC normalization,
  * control/format characters (categories Cc, Cf) mapped to spaces, space
  * runs collapsed, leading/trailing spaces trimmed. The per-row cost is a
  * single String traversal — versus a 4-deep regexp_replace tree which
  * re-scans the string per pattern and can't whole-stage-compile the NFC
  * step at all. Semantics are pinned to what an oracle can express as
  * `trim(regexp_replace(regexp_replace(nfc_normalize(s),
  * '[\p{Cc}\p{Cf}]', ' ', 'g'), ' +', ' ', 'g'))`: non-space whitespace
  * (e.g. U+00A0) is deliberately preserved, so the two forms stay
  * bit-identical.
  */
case class TextClean(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_clean"

  override protected def nullSafeEval(input: Any): Any =
    TextClean.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.TextClean.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextClean {
  /** Static so generated code can call it directly. */
  def compute(text: UTF8String): UTF8String = {
    val s = java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val tp = Character.getType(cp)
      if (cp == ' ' || tp == Character.CONTROL || tp == Character.FORMAT) {
        // Space or a char the cleaner maps to space: fold into one
        // separator, dropped entirely at the string edges (trim).
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(cp)
        started = true
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def of(text: Column): Column =
    ExpressionUtils.column(TextClean(ExpressionUtils.expression(text)))
}

object WordShingles {
  private val SPACE = UTF8String.fromString(" ")

  /** Static so generated code can call it directly. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(SPACE, -1)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val window = new Array[UTF8String](n)
        var j = 0
        while (j < n) { window(j) = toks(i + j); j += 1 }
        out(i) = UTF8String.concatWs(SPACE, window: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def of(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))
}
