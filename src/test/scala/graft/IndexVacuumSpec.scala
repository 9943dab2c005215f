package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, TxTable}

/** Side-index GC under corpus deletes/retention: the landing job's staged
  * indexes (MinHash bands, span grams, SRP embed bands, BM25 postings)
  * accumulate GHOST entries for documents a retention verb later removed
  * from the corpus. A ghost is not just waste — the admission probe
  * dedup-REJECTS a fresh near-duplicate against content the corpus no
  * longer holds, silently losing it. `vacuumIndex` drops every index row
  * whose id is absent from the live corpus as ONE bounded merge-on-read
  * commit (deletion vectors, no file rewrite). */
class IndexVacuumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txiv",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txiv")
  }

  private val loremA = ("alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
  private val loremB = "completely different text about spark catalyst " +
    "optimizer whole stage codegen shuffle partitions broadcast " +
    "joins and adaptive execution at one hundred terabytes" + " pad" * 20

  test("a deleted doc's ghost index entries reject its re-ingested twin; vacuum_index makes admission accept it; other entries survive") {
    val base = Files.createTempDirectory("graft_iv1_").toString
    val corpus = s"$base/corpus"
    val index = s"$base/index"
    // batch 1: two distinct docs land and index
    val b1 = Seq((1L, loremA), (2L, loremB)).toDF("doc_id", "text")
    val acc1 = DedupOps.ingestBatch(b1, corpus, index,
      txn = Some(("iv", 1L)))
    assert(acc1.count() == 2)
    // the twin of doc 1 (tiny mutation, same shingles dominate) is
    // rejected while doc 1's bands are live in the index
    val twin = Seq((10L, loremA + " tail")).toDF("doc_id", "text")
    val acc2 = DedupOps.ingestBatch(twin, corpus, index,
      txn = Some(("iv", 2L)))
    assert(acc2.count() == 0,
      "the twin must be dedup-rejected while the original is live")
    // retention removes doc 1 from the corpus (however the corpus is
    // stored — the vacuum takes the surviving LIVE KEYS); the index
    // still carries doc 1's band rows: GHOSTS
    val liveIds = spark.read.parquet(corpus)
      .filter($"doc_id" =!= 1L).select($"doc_id")
    val idxBefore = TxTable.read(spark, index)
    val ghostRows = idxBefore.filter($"doc_id" === 1L).count()
    assert(ghostRows > 0)
    val beforeSnap = TxTable.snapshot(spark, index)
    val n = DedupOps.vacuumIndex(spark, index, liveIds)
    assert(n == ghostRows, s"vacuumed $n, expected $ghostRows")
    val afterSnap = TxTable.snapshot(spark, index)
    // ONE merge-on-read commit: no new data files, vectors only
    assert(afterSnap.version == beforeSnap.version + 1)
    assert(afterSnap.entries.map(_.rel).toSet
      .subsetOf(beforeSnap.entries.map(_.rel).toSet))
    val after = TxTable.read(spark, index)
    assert(after.filter($"doc_id" === 1L).count() == 0)
    assert(after.filter($"doc_id" === 2L).count() ==
      idxBefore.filter($"doc_id" === 2L).count(),
      "other docs' index entries must survive the vacuum untouched")
    // the twin is ACCEPTED now — its content returns to the corpus
    val acc3 = DedupOps.ingestBatch(twin, corpus, index,
      txn = Some(("iv", 3L)))
    assert(acc3.count() == 1,
      "after the vacuum the twin must be admitted")
    // and the twin's bands are indexed, so a SECOND twin is rejected
    val twin2 = Seq((11L, loremA + " other tail")).toDF("doc_id", "text")
    assert(DedupOps.ingestBatch(twin2, corpus, index,
      txn = Some(("iv", 4L))).count() == 0)
    // idempotent: nothing left to vacuum, no commit
    val v = TxTable.snapshot(spark, index).version
    assert(DedupOps.vacuumIndex(spark, index,
      spark.read.parquet(corpus).select($"doc_id")) == 0L)
    assert(TxTable.snapshot(spark, index).version == v)
  }

  test("CALL vacuum_index drives the GC from SQL against a TxTable corpus; works for vec_id-keyed embed indexes too") {
    registered {
      val base = Files.createTempDirectory("graft_iv2_").toString
      val corpus = s"$base/corpus"
      val index = s"$base/index"
      // a TxTable corpus of vectors + a vec_id-keyed side index
      TxTable.init(spark, corpus,
        (0L until 20L).map(i => (i, s"p$i")).toDF("vec_id", "payload"),
        "vec_id", 4)
      TxTable.init(spark, index,
        (0L until 20L).flatMap(i => Seq((i, 0, s"b$i"), (i, 1, s"c$i")))
          .toDF("vec_id", "band", "bkey"),
        "vec_id", 4)
      // retention: MOR-delete a quarter of the corpus
      spark.sql(s"DELETE FROM txiv.`$corpus` WHERE vec_id % 4 = 0")
      val vacuumed = spark.sql(s"CALL txiv.vacuum_index('$index', " +
        s"'$corpus', 'vec_id')").as[Long].head()
      assert(vacuumed == 10L, s"got $vacuumed") // 5 dead ids x 2 rows
      val left = TxTable.read(spark, index)
      assert(left.count() == 30L)
      assert(left.filter($"vec_id" % 4 === 0).count() == 0)
      // non-TxTable corpus refuses loudly
      val e = intercept[Exception] {
        spark.sql(s"CALL txiv.vacuum_index('$index', '$base/nope', " +
          "'vec_id')")
      }
      assert(e.getMessage.contains("not a TxTable"), e.getMessage)
    }
  }
}
