package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.CharBigramNll
import graft.ops.BpeOps

/** ScalaCheck properties over the pure row-local kernels (no Spark
  * session): BPE merge/encode invariants and the native LM scorer vs an
  * independent reference implementation. */
object KernelProperties extends Properties("graft.kernels") {

  private val word: Gen[String] =
    for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    } yield cs.mkString

  private val mergeList: Gen[List[(String, String)]] =
    Gen.listOf(for {
      a <- Gen.alphaLowerChar
      b <- Gen.alphaLowerChar
    } yield (a.toString, b.toString)).map(_.take(8))

  property("bpe encodeWord restores the word under concatenation") =
    forAll(word, mergeList) { (w, merges) =>
      val toks = BpeOps.encodeWord(w, merges.map(_._1).toArray,
        merges.map(_._2).toArray, merges.map(p => p._1 + p._2).toArray)
      toks.mkString("") == w && toks.nonEmpty && toks.length <= w.length
    }

  property("bpe encodeWord agrees with the mergeOnce chain") =
    forAll(word, mergeList) { (w, merges) =>
      val fast = BpeOps.encodeWord(w, merges.map(_._1).toArray,
        merges.map(_._2).toArray, merges.map(p => p._1 + p._2).toArray).toSeq
      var slow: IndexedSeq[String] =
        w.split("").toIndexedSeq.filter(_.nonEmpty)
      merges.foreach { case (a, b) => slow = BpeOps.mergeOnce(slow, a, b) }
      fast == slow
    }

  // --- native LM kernel vs an independent scala reference ---------------

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
      1 -> Gen.choose(33.toChar, 126.toChar),
      1 -> Gen.const('é') // non-ASCII: must take the miss path
    )).map(_.mkString)

  private val counts: Gen[(Array[Long], Array[Long], Int)] =
    for {
      nBg <- Gen.choose(0, 40)
      bgs <- Gen.listOfN(nBg, for {
        i <- Gen.choose(97, 122); j <- Gen.choose(97, 122)
        n <- Gen.choose(1L, 500L)
      } yield (i * 128 + j, n))
      v <- Gen.choose(1, 60)
    } yield {
      val bg = new Array[Long](128 * 128)
      bgs.foreach { case (k, n) => bg(k) = n }
      val ctx = new Array[Long](128)
      (0 until 128).foreach { c =>
        ctx(c) = (0 until 128).map(j => bg(c * 128 + j)).sum
      }
      (bg, ctx, v)
    }

  private def referenceNll(t: String, bg: Array[Long], ctx: Array[Long],
                           v: Int): Option[Double] = {
    val cps = t.codePoints().toArray.map(c => if (c < 128) c else 128)
    if (cps.length < 2) None
    else {
      var acc = 0.0
      var i = 0
      while (i + 1 < cps.length) {
        val (c1, c2) = (cps(i), cps(i + 1))
        val b = if (c1 < 128 && c2 < 128) bg(c1 * 128 + c2) else 0L
        val c = if (c1 < 128) ctx(c1) else 0L
        acc -= java.lang.StrictMath.log((b + 1.0) / (c + v.toDouble))
        i += 1
      }
      Some(acc / (cps.length - 1).toDouble)
    }
  }

  property("CharBigramNll.eval matches the reference bit-for-bit") =
    forAll(asciiText, counts) { case (t, (bg, ctx, v)) =>
      val expr = CharBigramNll(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType), bg, ctx, v)
      val got = Option(expr.nullSafeEval(UTF8String.fromString(t)))
        .map(_.asInstanceOf[Double])
      got == referenceNll(t, bg, ctx, v)
    }
}
