package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

import org.apache.spark.sql.GraftColumnBridge.{column, expression}

/** Native sketch kernels over a bound array<long> of element hashes.
  *
  * Both replace a "64 higher-order traversals" / "explode + 64 aggregate
  * buffers" formulation with ONE pass over the input array per row —
  * row-local, shuffle-free, inlined by whole-stage codegen. On a document
  * corpus the sketch pass is the dominant cost of dedup; these kernels are
  * why the signature stage scales with document count rather than
  * (documents × features) shuffle rows.
  */

/** MinHash signature: for element hashes h, signature[i] =
  * min over h of (a_i·h + b_i) mod p — identical math and (a, b) family as
  * the composable formulation in DedupOps (inputs are non-negative and
  * below 2^32, so Java's % equals pmod and a·h stays in 63 bits). */
case class MinHashSignature(child: Expression, as: Array[Long], bs: Array[Long],
    prime: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val num = as.length
    val mins = Array.fill(num)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < num) {
        val v = (h * as(i) + bs(i)) % prime
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[${as.length}];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j);
         |  for (int $i = 0; $i < ${as.length}; $i++) {
         |    long $v = ($h * $aRef[$i] + $bRef[$i]) % ${prime}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash: each element hash votes ±1 per bit position; the sign of
  * each summed position forms the fingerprint. One pass, no explode, no
  * aggregation state. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $votes = new int[64];
         |int $n = $arr.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $arr.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Deterministic pseudo-random hyperplane coefficients for sign-random-
  * projection LSH. Public static (Scala object forwarder) so generated Java
  * calls the exact same function as interpreted eval — the two paths must be
  * bit-identical or a plan-shape change would silently move vectors across
  * buckets. */
object SrpCoef {
  /** Coefficient in (-1, 1) for (plane, dim): a splitmix64-style finalizer
    * over the packed (plane, dim, seed) triple. */
  def coef(plane: Int, dim: Int, seed: Long): Double = {
    var h = seed ^ (plane.toLong * 0x9E3779B97F4A7C15L) ^
      (dim.toLong * 0xC2B2AE3D27D4EB4FL)
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    (h >>> 11).toDouble * (2.0 / (1L << 53).toDouble) - 1.0
  }
}

/** Sign-random-projection signature over an `array<float>` embedding:
  * `nPlanes` (≤ 64) pseudo-random hyperplanes, coefficients derived on the
  * fly from (plane, dim, seed) — no materialized coefficient arrays, no
  * per-plane higher-order traversals. Bit p of the result is the sign of
  * the projection onto plane p. One dims × planes multiply-add pass per
  * row, row-local and shuffle-free; banding into b-bit bucket keys is plain
  * shift/mask arithmetic downstream (DedupOps.embeddingLshPairs). */
case class SignRandomProjection(child: Expression, nPlanes: Int, seed: Long)
    extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 64, s"nPlanes must be in [1, 64], got $nPlanes")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"srp_signature expects array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Double](nPlanes)
    val n = arr.numElements()
    var d = 0
    while (d < n) {
      val v = arr.getFloat(d).toDouble
      var p = 0
      while (p < nPlanes) { acc(p) += v * SrpCoef.coef(p, d, seed); p += 1 }
      d += 1
    }
    var sig = 0L
    var p = 0
    while (p < nPlanes) { if (acc(p) > 0) sig |= (1L << p); p += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |double[] $acc = new double[$nPlanes];
         |int $n = $arr.numElements();
         |for (int $d = 0; $d < $n; $d++) {
         |  double $v = (double) $arr.getFloat($d);
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    $acc[$p] += $v * graft.functions.SrpCoef.coef($p, $d, ${seed}L);
         |  }
         |}
         |long $sig = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  if ($acc[$p] > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SketchFunctions {
  /** Signature column from a bound array<long> of element hashes. */
  def minhash_signature(hashes: Column, as: Array[Long], bs: Array[Long],
                        prime: Long): Column =
    column(MinHashSignature(expression(hashes), as, bs, prime))

  /** 64-bit SimHash fingerprint from a bound array<long> of token hashes. */
  def simhash64(hashes: Column): Column = column(SimHash64(expression(hashes)))

  /** Sign-random-projection bit signature from an `array<float>` embedding. */
  def srp_signature(embedding: Column, nPlanes: Int, seed: Long): Column =
    column(SignRandomProjection(expression(embedding), nPlanes, seed))

  /** Misra–Gries heavy-hitters summary aggregate (see
    * [[MisraGriesTopK]]): array<struct<item, est>> by (est desc, item). */
  def misra_gries_topk(item: Column, capacity: Int): Column =
    column(MisraGriesTopK(expression(item), capacity).toAggregateExpression())
}
