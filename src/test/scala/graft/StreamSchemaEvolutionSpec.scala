package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Streaming-sink schema evolution: `writeStream.toTable` with extra
  * source columns union-evolves the table at the epoch commit — the same
  * contract as the Scala append API (direct API writes evolve by design;
  * only the SQL surface gates evolution behind
  * `spark.graft.sql.schema.autoMerge`). Old rows project the new column
  * as NULL; the schema widens once and stays stable across epochs. */
class StreamSchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a streaming epoch with an extra column union-evolves; old rows project NULL; restart stays stable") {
    spark.conf.set("spark.sql.catalog.txse",
      classOf[graft.sources.TxTableCatalog].getName)
    try {
      val t = Files.createTempDirectory("graft_se_").toString + "/t"
      TxTable.init(spark, t,
        (1 to 8).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
      val src = Files.createTempDirectory("graft_se_src_").toString
      val ckpt = Files.createTempDirectory("graft_se_ck_").toString
      Seq(("S1", 100L, "x"), ("S2", 200L, "y")).toDF("k", "v", "extra")
        .write.mode("overwrite").parquet(src)
      def drain(): Unit = {
        val q = spark.readStream
          .schema("k STRING, v BIGINT, extra STRING").parquet(src)
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .toTable(s"txse.`$t`")
        q.awaitTermination()
      }
      drain()
      val head = TxTable.snapshot(spark, t)
      assert(head.schema.get.fieldNames.contains("extra"))
      val m = spark.table(s"txse.`$t`").select($"k", $"extra")
        .as[(String, Option[String])].collect().toMap
      assert(m.size == 10)
      assert(m("S1").contains("x") && m("S2").contains("y"))
      assert(m("K3").isEmpty, "pre-evolution rows project NULL")
      // a second epoch with MORE rows of the evolved shape: schema
      // stays stable (no duplicate column, no second evolution commit
      // beyond the data commit)
      Seq(("S3", 300L, "z")).toDF("k", "v", "extra")
        .write.mode("append").parquet(src)
      drain()
      val head2 = TxTable.snapshot(spark, t)
      assert(head2.schema.get.fieldNames.count(_ == "extra") == 1)
      assert(spark.table(s"txse.`$t`").count() == 11)
      // time travel below the evolution keeps the narrow schema
      assert(!TxTable.read(spark, t, Some(0L)).columns.contains("extra"))
    } finally spark.conf.unset("spark.sql.catalog.txse")
  }
}
