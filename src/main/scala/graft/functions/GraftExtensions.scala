package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's native functions
  * and optimizer rules at session build, so any session created with
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * or `--conf spark.sql.extensions=graft.functions.GraftExtensions` gets
  * `cosine_sim(a, b)` in SQL without imperative registration
  * (VectorFunctions.register remains for already-built sessions) and the
  * point-in-interval theta-join → binned equi-join rewrite
  * (graft.plans.IntervalJoinRule). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("misra_gries_topk"),
      new ExpressionInfo(classOf[MisraGriesTopK].getName, "misra_gries_topk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MisraGriesTopK(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue())))
    // bin width tunes interval-join fan-out vs bucket size; ~typical
    // interval length is right (an interval spanning k bins replicates k+1×)
    e.injectOptimizerRule { session =>
      graft.plans.IntervalJoinRule(
        session.conf.getOption("spark.graft.intervalJoin.binSeconds")
          .map(_.toLong).getOrElse(3600L))
    }
  }
}
