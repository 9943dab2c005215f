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

  /** SFT-style TRAINING-EXAMPLE serialization: each user's event stream
    * becomes one deterministic text example — events sorted by
    * (timestamp, id) and rendered as `type@id` joined with `|` (the id,
    * not the raw clock, goes into the text: sub-second timestamp
    * precision differs across engines/file generations, and a training
    * example must serialize bit-identically everywhere). The whole
    * example is built ROW-LOCALLY after one grouped collect (sort_array
    * on the struct gives a total order, so the string is identical on
    * any engine / any partitioning); `example_md5` is the content
    * fingerprint a downstream dedup or lineage check keys on. One
    * shuffle on the user key — the conversation-grouping shape of
    * multi-turn SFT data prep. */
  def serializeSessions(events: DataFrame, user: String, ts: String,
                        idCol: String, typeCol: String): DataFrame =
    events
      .groupBy(col(user))
      .agg(sort_array(collect_list(struct(
        col(ts).as("t"), col(idCol).as("i"), col(typeCol).as("y"))))
        .as("__evs"))
      .select(col(user),
        size(col("__evs")).as("n_events"),
        array_join(transform(col("__evs"),
          e => concat(e.getField("y"), lit("@"),
            e.getField("i").cast("string"))), "|")
          .as("example"))
      .withColumn("example_md5", md5(col("example")))


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
