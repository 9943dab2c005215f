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
    // simhash64(array<long>): 64-bit SimHash fingerprint of token hashes
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs(0))))
    // srp_signature(array<float>, nPlanes, seed): sign-random-projection
    // bit signature (the LSH family every embedding-dedup/kNN path uses)
    e.injectFunction((
      FunctionIdentifier("srp_signature"),
      new ExpressionInfo(classOf[SignRandomProjection].getName, "srp_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SignRandomProjection(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].longValue())))
    // minhash_signature(array<long> element hashes, num perms): signature
    // under the library's standard seeded (a, b) family — the same family
    // DedupOps and the oracle-SQL generator inline, so SQL callers get
    // signatures comparable with every DataFrame-side pipeline
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val ps = graft.ops.DedupOps.hashParams(
          exprs(1).eval().asInstanceOf[Number].intValue())
        MinHashSignature(exprs(0), ps.map(_._1), ps.map(_._2),
          graft.ops.DedupOps.MinhashPrime)
      }))
    // INSERT-side schema evolution for TxTables (inert unless
    // spark.graft.sql.schema.autoMerge is on): re-applies Spark's own
    // output resolution with the query's extra columns widened in
    e.injectResolutionRule { session =>
      graft.sources.TxAutoMergeInsertRule(session)
    }
    // bin width tunes interval-join fan-out vs bucket size; ~typical
    // interval length is right (an interval spanning k bins replicates k+1×)
    e.injectOptimizerRule { session =>
      graft.plans.IntervalJoinRule(
        session.conf.getOption("spark.graft.intervalJoin.binSeconds")
          .map(_.toLong).getOrElse(3600L))
    }
    // zone-map file skipping for SQL reads of TxTables: range predicates
    // over registered views reach the per-file (min, max) sidecars, so a
    // SQL-only session prunes like readWhere/readWhereAll
    e.injectOptimizerRule { session =>
      graft.plans.TxTablePruneRule(session)
    }
  }
}
