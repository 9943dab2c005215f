package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget document packing — grouping documents into ~`budget`-token
  * packs for sequence-packed training (each pack becomes one training
  * sequence; padding waste is bounded by the last doc of each pack).
  *
  * Globally-greedy packing is inherently serial (each decision depends on
  * the running total), so the scalable formulation shards first: documents
  * hash into `buckets` independent lanes, and each lane packs its own
  * documents by running token count — one shuffle on the bucket key, lanes
  * pack in parallel, pack identity is (bucket, pack_seq). The relaxation
  * versus perfect bin-packing is the standard streaming one: a pack can
  * overshoot the budget by less than one document.
  */
object PackOps {

  /** Assign each doc to a pack: `bucket` = doc_id mod buckets (portable,
    * deterministic), `pack_seq` = floor(tokens-before-this-doc / budget)
    * within the bucket's doc_id order. Window state is a single running
    * sum — no per-pack buffering, spill-safe. */
  def packByBudget(docs: DataFrame, tokens: Column, budget: Long,
                   buckets: Int = 64): DataFrame = {
    require(budget > 0 && buckets > 0)
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), tokens.cast("long").as("n_tokens"),
        pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_seq",
        floor((col("cum_tokens") - col("n_tokens")) / budget))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        col("pack_seq"), col("cum_tokens"))
  }

  /** Pack-level rollup: docs per pack and token fill (the training-side
    * consumer reads packs, not docs). */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("bucket"), col("pack_seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
}
