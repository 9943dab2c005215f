package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze layer: raw wire records → typed rows.
  *
  * Reference semantics (`Bronze1.py:130-145`): a Kafka record frame
  * `(key binary, value binary, topic string, ...)` is cast to string,
  * filtered by topic, parsed with `from_json` against the entity schema, and
  * the struct is flattened with `select("data.*")`. Malformed JSON or missing
  * fields become null (no `_corrupt_record` handling in the reference);
  * fields not declared in the schema vanish (SURVEY §2.10.6).
  *
  * These are pure `DataFrame => DataFrame` transforms so they run unchanged
  * in batch tests and inside streaming pipelines (graft.stream.Pipelines).
  */
object BronzeOps {

  /** P1: binary→string cast projection (`Bronze1.py:130`). Keeps `topic` so
    * the multi-topic bronze stream can fan out per entity. */
  def castWire(kafka: DataFrame): DataFrame =
    kafka.selectExpr("CAST(value AS STRING) AS value", "topic")

  /** F1 + P2 + P3: route one topic out of a multi-topic frame and parse it
    * (`Bronze1.py:132-145`). Topic equality is plain `===` — null topics
    * drop, matching reference behavior. */
  def parseTopic(wire: DataFrame, topic: String, schema: StructType): DataFrame =
    wire.filter(col("topic") === topic)
      .select(from_json(col("value"), schema).alias("data"))
      .select("data.*")

  /** P2 + P3 for a single-topic stream (`Silver1.py:35-36` shape). */
  def parseValue(wire: DataFrame, schema: StructType): DataFrame =
    wire.select(from_json(col("value").cast("string"), schema).alias("data"))
      .select("data.*")

  /** P4: struct→JSON serialization used by every Kafka sink
    * (`Silver1.py:45-46`): key = id cast string, value = whole row as JSON. */
  def toKafkaFrame(df: DataFrame, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").alias("key"),
      to_json(struct(df.columns.map(col).toSeq: _*)).alias("value"))
}
