package graft.sources

import java.io.{ByteArrayOutputStream, ObjectOutputStream}
import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.parquet.GraftParquetShim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{DeletionVectors, TxTable}

/** Deletion-vector payload locality: a task must serialize ONLY its own
  * file's bitmap. The reader factory travels with EVERY task, so it must
  * carry no bitmaps at all; each DV'd file's bitmap rides on its own
  * InputPartition, attached driver-side at planning time. At 100 TB a
  * churned table holds ~100k DV'd files — a factory-resident rel→bitmap
  * map would re-serialize the UNION of all their bitmaps into every task
  * binary, an O(files × bitmap-bytes) per-task tax this layout removes. */
class DvPartitionPayloadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def javaBytes(o: AnyRef): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(o)
    oos.close()
    bos.toByteArray
  }

  private def containsSub(hay: Array[Byte], needle: Array[Byte]): Boolean = {
    require(needle.nonEmpty)
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return true
      i += 1
    }
    false
  }

  private def freshDvTable(): String = {
    val table = Files.createTempDirectory("graft_dvp_").toString + "/t"
    val df = (0 until 400)
      .map(d => (s"k$d", d.toLong, (d % 7).toLong)).toDF("k", "day", "grp")
    TxTable.init(spark, table, df, "k", 4)
    // mark rows across every bucket's file so SEVERAL files carry
    // distinct bitmaps
    assert(TxTable.deleteWhereMor(spark, table,
      col("day") % 10L === 3L) === 40L)
    table
  }

  test("each partition ships only its own file's bitmap; the factory ships none") {
    val table = freshDvTable()
    val snap = TxTable.snapshot(spark, table)
    val dvd = snap.entries.filter(_.dv.isDefined)
    assert(dvd.size >= 2, "need several DV'd files to prove locality")
    val byRel = DeletionVectors.loadBitmaps(spark, table, dvd)
    assert(byRel.keySet === dvd.map(_.rel).toSet)

    val parts = TxScanPlanning.partitionsFor(table, snap.entries)
    assert(parts.length === snap.entries.size)
    val paired = parts.map { p =>
      val g = p.asInstanceOf[GraftParquetShim.GraftBucketFilePartition]
      assert(g.files.length === 1)
      val rel = DvPartitionReaderFactory.RelRe
        .findFirstIn(g.files.head.filePath.toString).get
      (rel, g)
    }
    // payload present exactly on DV'd files, and it is THAT file's bitmap
    paired.foreach { case (rel, g) =>
      byRel.get(rel) match {
        case Some((key, bytes)) =>
          assert(g.dv.isDefined, s"$rel lost its payload")
          assert(g.dv.get._1 === key)
          assert(java.util.Arrays.equals(g.dv.get._2, bytes))
        case None => assert(g.dv.isEmpty, s"clean $rel grew a payload")
      }
    }
    // the serialized task payload of partition A must not contain
    // partition B's bitmap bytes (what a factory-resident map would ship)
    val dvdPaired = paired.filter { case (rel, _) => byRel.contains(rel) }
    dvdPaired.foreach { case (rel, g) =>
      val ser = javaBytes(g)
      assert(containsSub(ser, byRel(rel)._2),
        s"$rel's own bitmap should ride in its partition")
      dvdPaired.foreach { case (other, _) =>
        if (other != rel)
          assert(!containsSub(ser, byRel(other)._2),
            s"partition for $rel serialized $other's bitmap")
      }
    }
    // the reader factory carries NO bitmap: its serialized form holds no
    // scanned file's bitmap bytes and its size is payload-independent
    val schema = snap.schema.get
    val factory = TxScanPlanning.dvReaderFor(snap.entries,
      TxFileSchema(schema), schema)
    val fser = javaBytes(factory)
    byRel.values.foreach { case (_, bytes) =>
      assert(!containsSub(fser, bytes),
        "reader factory must not serialize any bitmap")
    }
    // the row-identity factory must be payload-free too
    val synth = TxScanPlanning.augmentedReaderFor(snap.entries,
      TxFileSchema(schema),
      org.apache.spark.sql.types.StructType(schema.fields :+
        org.apache.spark.sql.types.StructField("_file",
          org.apache.spark.sql.types.StringType) :+
        org.apache.spark.sql.types.StructField("_pos",
          org.apache.spark.sql.types.LongType)))
    val sser = javaBytes(synth)
    byRel.values.foreach { case (_, bytes) =>
      assert(!containsSub(sser, bytes),
        "row-identity factory must not serialize any bitmap")
    }
    // and the payload-carrying scan still reads exactly the live rows
    val got = TxTable.read(spark, table).count()
    assert(got === 360L)
  }
}
