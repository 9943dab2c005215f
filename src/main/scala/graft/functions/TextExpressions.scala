package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-scoring kernels.
  *
  * [[CharBigramNll]] is the hot path of the CCNet-style LM quality sweep
  * (graft.ops.TextOps.lmScore): average add-one-smoothed negative
  * log-likelihood over a document's character bigrams against dense count
  * LUTs. The composable formulation (split → ascii codes → `aggregate`
  * fold over zipped slices) walks four interpreted higher-order loops and
  * boxes every element; this expression is ONE pass over the UTF-8 bytes
  * with primitive array lookups, inlined by whole-stage codegen — the
  * difference between a quality sweep that is scan-bound and one that is
  * eval-bound at 100 TB.
  *
  * Semantics (bit-identical to the fold, spec-pinned):
  *   - iterate CODEPOINTS (UTF-8 lead bytes; continuation bytes skipped —
  *     the same units `length()` and `split(text, "")` count);
  *   - codepoints ≥ 128 take the miss path (count 0) exactly like the
  *     LUT fold's `when(c < 128, ...)` guard — the model is ASCII-keyed
  *     (enforced by the caller);
  *   - per pair: `acc -= ln((bg + 1) / (ctx + V))`, accumulated in text
  *     order; result `acc / nPairs`; NULL when fewer than two codepoints.
  */
case class CharBigramNll(child: Expression, bgCounts: Array[Long],
    ctxCounts: Array[Long], vocab: Int) extends UnaryExpression {

  require(bgCounts.length == 128 * 128 && ctxCounts.length == 128,
    "dense LUTs must be 128x128 / 128 (ASCII-keyed model)")

  override def dataType: DataType = DoubleType
  // NULL for sub-2-codepoint inputs even when the child is non-null
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_bigram_nll expects string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    var acc = 0.0
    var prev = -1
    var nPairs = 0L
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) { // lead byte = one codepoint
        val code = if ((b & 0xFF) < 128) b & 0xFF else 128
        if (prev >= 0) {
          val bg = if (prev < 128 && code < 128) bgCounts(prev * 128 + code) else 0L
          val cx = if (prev < 128) ctxCounts(prev) else 0L
          acc -= java.lang.StrictMath.log((bg + 1.0) / (cx + vocab.toDouble))
          nPairs += 1
        }
        prev = code
      }
      i += 1
    }
    if (nPairs < 1) null else Double.box(acc / nPairs.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bgRef = ctx.addReferenceObj("bgCounts", bgCounts, "long[]")
    val ctxRef = ctx.addReferenceObj("ctxCounts", ctxCounts, "long[]")
    nullSafeCodeGen(ctx, ev, s => {
      val nb = ctx.freshName("nb")
      val acc = ctx.freshName("acc")
      val prev = ctx.freshName("prev")
      val nPairs = ctx.freshName("nPairs")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val code = ctx.freshName("code")
      val bg = ctx.freshName("bg")
      val cx = ctx.freshName("cx")
      s"""
         |int $nb = $s.numBytes();
         |double $acc = 0.0;
         |int $prev = -1;
         |long $nPairs = 0L;
         |for (int $i = 0; $i < $nb; $i++) {
         |  byte $b = $s.getByte($i);
         |  if (($b & 0xC0) != 0x80) {
         |    int $code = (($b & 0xFF) < 128) ? ($b & 0xFF) : 128;
         |    if ($prev >= 0) {
         |      long $bg = ($prev < 128 && $code < 128) ? $bgRef[$prev * 128 + $code] : 0L;
         |      long $cx = ($prev < 128) ? $ctxRef[$prev] : 0L;
         |      $acc -= java.lang.StrictMath.log(($bg + 1.0) / ($cx + ${vocab}.0));
         |      $nPairs++;
         |    }
         |    $prev = $code;
         |  }
         |}
         |if ($nPairs < 1L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc / (double) $nPairs;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {
  /** Column wrapper for [[CharBigramNll]]. */
  def char_bigram_nll(text: Column, bgCounts: Array[Long],
                      ctxCounts: Array[Long], vocab: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CharBigramNll(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        bgCounts, ctxCounts, vocab))
}
