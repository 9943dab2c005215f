package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Catalyst optimizer rule: plan the natural point-in-interval theta join
  * as a binned equi-join.
  *
  * Users write the obvious thing —
  * {{{ points.join(ivs, key === ivKey && pt >= s && pt <= e) }}} —
  * and Spark, seeing a non-equi conjunct, falls back to
  * BroadcastNestedLoopJoin: every point probes every interval of its key,
  * O(n·m) work and a driver OOM once neither side broadcasts. The scalable
  * formulation (RangeJoinOps.pointInIntervalJoin) is mechanical: quantize
  * time into `binSeconds` bins, explode each interval over the bins it
  * overlaps, equi-join on (keys, bin), re-apply the exact containment
  * filter. This rule performs that rewrite inside the optimizer, so the
  * hand-written theta join gets the hash-join plan automatically —
  * the (c)-tier of the custom-operator ladder (LogicalPlan rule via
  * SparkSessionExtensions), used where composition can't see the intent.
  *
  * Conservative trigger: INNER join whose condition is exactly ≥0
  * attribute equalities across sides + one inclusive lower + one inclusive
  * upper bound on the same left timestamp attribute against right
  * timestamp attributes. Anything else is left untouched. With equi keys
  * present Spark would plan a hash join whose range conjuncts run as a
  * residual filter — quadratic WITHIN each key group; without keys it
  * falls to BroadcastNestedLoopJoin outright. The bin key fixes both: it
  * either joins alone (keyless) or tightens the key-group fan-out to
  * intervals overlapping the same bin.
  */
case class IntervalJoinRule(binSeconds: Long = 3600L)
    extends Rule[LogicalPlan] with PredicateHelper {
  require(binSeconds > 0)

  /** floor(epoch-seconds / binSeconds) — timestamp→double cast is
    * timezone-free, Floor(double) is LongType. */
  private def bin(e: Expression): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(binSeconds.toDouble)))

  private def tsAttr(e: Expression): Option[Attribute] = e match {
    case a: Attribute if a.dataType == TimestampType => Some(a)
    case _ => None
  }

  /** (point, bound) when `l op r` reads as point-from-left vs
    * bound-from-right, for either written orientation. */
  private def sides(x: Expression, y: Expression,
                    left: LogicalPlan, right: LogicalPlan): Option[(Attribute, Attribute)] =
    (tsAttr(x), tsAttr(y)) match {
      case (Some(a), Some(b))
        if left.outputSet.contains(a) && right.outputSet.contains(b) => Some((a, b))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        // already-binned joins (this rule's own output after the optimizer
        // pushes the containment filter back into the join condition, or
        // RangeJoinOps' hand-built __bin) must not re-match — without this
        // guard the operator-optimization batch would re-bin to fixpoint
        if !cond.references.exists(a =>
          a.name.startsWith("__graft_bin") || a.name == "__bin") =>
      val conjuncts = splitConjunctivePredicates(cond)
      val eqs = conjuncts.collect {
        case e @ EqualTo(a: Attribute, b: Attribute)
          if (left.outputSet.contains(a) && right.outputSet.contains(b)) ||
             (left.outputSet.contains(b) && right.outputSet.contains(a)) => e
      }
      // pt >= start (either orientation)
      val lowers = conjuncts.flatMap {
        case GreaterThanOrEqual(x, y) => sides(x, y, left, right)
        case LessThanOrEqual(x, y) => sides(y, x, left, right)
        case _ => None
      }
      // pt <= end (either orientation)
      val uppers = conjuncts.flatMap {
        case LessThanOrEqual(x, y) => sides(x, y, left, right)
        case GreaterThanOrEqual(x, y) => sides(y, x, left, right)
        case _ => None
      }
      val rewritable =
        lowers.size == 1 && uppers.size == 1 &&
          lowers.head._1 == uppers.head._1 &&
          conjuncts.size == eqs.size + 2
      if (!rewritable) j
      else {
        val (pt, start) = lowers.head
        val end = uppers.head._2
        // left: one extra projected bin column
        val lBinAlias = Alias(bin(pt), "__graft_bin_l")()
        val lProj = Project(left.output :+ lBinAlias, left)
        val lBin = lBinAlias.toAttribute
        // right: drop inverted/null intervals, explode the bin range
        val rFiltered = Filter(LessThanOrEqual(start, end), right)
        val rBin = AttributeReference("__graft_bin_r", LongType,
          nullable = false)()
        // Sequence is TimeZoneAwareExpression: without an explicit zone it
        // is unresolved, and optimizer-batch plan validation rejects the
        // rewrite (the analyzer only fills zones during analysis)
        val gen = Generate(Explode(Sequence(bin(start), bin(end), None,
          Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(rBin), child = rFiltered)
        val newCond = (eqs :+ EqualTo(lBin, rBin).asInstanceOf[Expression])
          .reduce(And)
        val joined = Join(lProj, gen, Inner, Some(newCond), hint)
        val contained = Filter(And(
          GreaterThanOrEqual(pt, start), LessThanOrEqual(pt, end)), joined)
        Project(j.output, contained)
      }
  }
}
