package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Grammar hardening for the round-13 manifest extensions: the
  * equality-delete registry property (':' / '|' joined, URL-encoded
  * fields) and the tagged trailing entry fields (`rid:`, `v:`) are
  * load-bearing — a round-trip corruption would mis-scope deletes or
  * drift identities. Hostile inputs round-trip exactly. */
class EqDeleteCodecSpec extends AnyFunSuite {

  test("eq-delete registry render/parse round-trips hostile rels and column names exactly") {
    val hostile = Seq(
      TxTable.EqDelete(3L, "files/ab:cd|ef/eqdel", Seq("k")),
      TxTable.EqDelete(7L, "files/x/eqdel", Seq("a:b", "c|d", "e,f")),
      TxTable.EqDelete(Long.MaxValue - 1, "files/üñïçødé/eqdel",
        Seq("col with space", "col%2Fenc")),
      TxTable.EqDelete(0L, "files/pipe||colon::commas,,/p",
        Seq("k1", "k2", "k3")))
    // singly and in every prefix combination
    (1 to hostile.length).foreach { n =>
      val ds = hostile.take(n)
      val parsed = TxTable.parseEqDeletes(
        Map(TxTable.EqDeletesProp -> TxTable.renderEqDeletes(ds)))
      assert(parsed == ds, s"n=$n: $parsed")
    }
    // empty registry parses as empty
    assert(TxTable.parseEqDeletes(Map.empty).isEmpty)
  }

  test("tagged entry fields survive a full manifest round-trip in every presence combination (DV x rid x addV)") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    // drive the REAL serde through a table lifecycle that produces all
    // combinations: plain adds (v: only), tracked adds (rid: + v:), a
    // MOR delete (dv + rid + v on the re-add), then reparse via
    // snapshot and compare field by field
    val t = Files.createTempDirectory("graft_codec_").toString + "/t"
    TxTable.init(spark, t,
      spark.range(20).select(col("id").as("k"), col("id").as("v")),
      "k", 2)
    TxTable.enableRowTracking(spark, t)
    TxTable.deleteWhereMor(spark, t, col("k") % 5 === 0)
    val before = TxTable.snapshot(spark, t)
    assert(before.entries.forall(e =>
      e.base.isDefined && e.addV.isDefined))
    assert(before.entries.exists(_.dv.isDefined))
    // force a checkpoint-format (full manifest) round-trip as well:
    // commit property ticks until the checkpoint interval divides the
    // version, then resolve THROUGH the checkpoint
    val toCp = TxTable.CheckpointInterval -
      (before.version % TxTable.CheckpointInterval)
    (1L to toCp).foreach(i =>
      TxTable.setProperties(spark, t, set = Map("codec.tick" -> s"$i")))
    val after = TxTable.snapshot(spark, t)
    assert(after.version % TxTable.CheckpointInterval == 0)
    val byRel = after.entries.map(e => e.rel -> e).toMap
    before.entries.foreach { e =>
      val r = byRel(e.rel)
      assert(r.base == e.base && r.addV == e.addV && r.dv == e.dv &&
        r.rows == e.rows,
        s"${e.rel}: $r != $e after the checkpoint round-trip")
    }
  }
}
