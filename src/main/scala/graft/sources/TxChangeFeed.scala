package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.GraftParquetShim
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.RoaringBitmap

import graft.ops.{DeletionVectors, TxTable}

/** The TxTable ROW-LEVEL CHANGE FEED as a DSv2 table — the Delta
  * `table_changes` / CDF-streaming design done on the commit log this
  * engine owns. Loaded through the catalog by the reserved `#changes`
  * path suffix:
  *
  *   - batch: `spark.read.option("startingVersion", 2)
  *     .option("endingVersion", 4).table("txcat.\`/t#changes\`")` —
  *     `startingVersion` is INCLUSIVE of that commit's changes (default
  *     0 = full history, the initial snapshot surfacing as inserts),
  *     `endingVersion` defaults to the head; `startingTimestamp` /
  *     `endingTimestamp` resolve through the commit log's publication
  *     times (first commit at-or-after / newest commit at-or-before).
  *   - streaming: `spark.readStream.table("txcat.\`/t#changes\`")` —
  *     offsets are commit versions exactly like the append source
  *     ([[TxMicroBatchStream]]); `startingVersion` (number | `latest`)
  *     or `startingTimestamp` (at-or-after) and `maxVersionsPerTrigger`
  *     admission ride along, and `Trigger.AvailableNow` pins the head
  *     at prepare time.
  *
  * The schema is the table's data schema plus `_change_type` STRING and
  * `_commit_version` LONG. Change derivation is the manifest file-diff
  * plus the deletion-vector BITMAP diff per commit:
  *
  *   - files added at v → their live rows as 'insert'@v;
  *   - files removed at v → their then-live rows as 'delete'@v;
  *   - same rel, changed vector → EXACTLY the newly-marked positions as
  *     'delete'@v, and (a [[TxTable.restore]] that shrank the vector)
  *     exactly the revived positions as 'insert'@v.
  *
  * Unlike the append-only streaming source — which throws on rewrite
  * commits because it promises exactly-once appends — the change feed
  * REPRESENTS every commit: rewrites surface file-granularly
  * (delete+insert of the rewritten files, the documented conservative
  * shape), deletes and restores surface row-exactly. I/O per commit is
  * only that commit's changed files (DV'd ones filtered to the diff
  * positions), never a table re-scan — the contract that keeps a 100 TB
  * table's downstream consumers paying O(delta). */
final class TxChangesTable(path: String) extends Table with SupportsRead {
  private val snap = TxTable.snapshot(SparkSession.active, path)
  private[sources] val dataSchema: StructType = StructType(
    snap.schema.getOrElse(throw new IllegalStateException(
      s"$path carries no recorded schema (pre-v2 manifest) — the change " +
        "feed needs the recorded schema to type change frames"))
      .filterNot(_.name == graft.ops.LayoutOps.BucketCol))
  // consumers see LOGICAL names (column mapping); the file readers keep
  // the PHYSICAL dataSchema — positionally identical
  // row tracking: a tracked table's change rows carry their durable
  // identity (nullable: files predating the enable have no anchor) —
  // the link that lets a streaming consumer classify a delete and the
  // insert that replaced it as one update across commits
  private[sources] val tracked: Boolean =
    snap.props.get(TxTable.RowTrackingProp).contains("true")
  private val lineageFields =
    if (!tracked) Seq.empty
    else Seq(StructField(TxTable.RowIdCol, LongType),
      StructField(TxTable.RowCommitCol, LongType))
  private val outSchema = StructType((dataSchema.fields
    .map(f => f.copy(name = snap.logicalName(f.name))) ++ lineageFields)
    :+ StructField("_change_type", StringType, nullable = false)
    :+ StructField("_commit_version", LongType, nullable = false))

  override def name(): String = s"$path#changes"
  override def schema(): StructType = outSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan =
      new TxChangesScan(path, dataSchema, outSchema, options, tracked)
  }
}

/** Scan serving both read modes off [[TxChangeFeedPlanning]]. The change
  * schema is served whole — CDF consumers read the change columns by
  * definition, so column pruning would buy little and cost the planner a
  * second schema path. */
private[sources] final class TxChangesScan(path: String,
    dataSchema: StructType, outSchema: StructType,
    options: CaseInsensitiveStringMap,
    tracked: Boolean = false) extends Scan {
  private def spark = SparkSession.active
  override def readSchema(): StructType = outSchema
  override def description(): String = s"GraftTxChanges $path"

  override def toBatch: Batch = new Batch {
    require(options.get("startingVersion") == null ||
        options.get("startingTimestamp") == null,
      "startingVersion and startingTimestamp are mutually exclusive")
    require(options.get("endingVersion") == null ||
        options.get("endingTimestamp") == null,
      "endingVersion and endingTimestamp are mutually exclusive")
    // timestamp bounds resolve through the commit log's own publication
    // times: starting = first commit at or after, ending = newest commit
    // at or before (the Delta table_changes convention); a start past
    // the head or an end before the log yields an empty feed
    private val start =
      Option(options.get("startingVersion")).map(_.toLong)
        .orElse(Option(options.get("startingTimestamp")).map(ts =>
          TxTable.firstVersionAtOrAfter(spark, path,
              TxTimestamps.parseMillis(ts))
            .getOrElse(TxTable.snapshot(spark, path).version + 1)))
        .getOrElse(0L)
    private val end = Option(options.get("endingVersion")).map(_.toLong)
      .orElse(Option(options.get("endingTimestamp")).map { ts =>
        try TxTable.versionAsOfTimestamp(spark, path,
          TxTimestamps.parseMillis(ts))
        catch { case _: IllegalArgumentException => -1L }
      })
      .getOrElse(TxTable.snapshot(spark, path).version)
    override def planInputPartitions(): Array[InputPartition] =
      TxChangeFeedPlanning.plan(spark, path, start - 1, end, tracked)
    override def createReaderFactory(): PartitionReaderFactory =
      TxChangeFeedPlanning.readerFactory(dataSchema, tracked)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TxChangesMicroBatchStream(path, dataSchema, options, tracked)
}

/** Commit-version offsets over the row-level change feed — the same
  * offset/admission shape as the append source, but every commit kind is
  * representable so no skip/ignore escape hatches are needed. */
final class TxChangesMicroBatchStream(path: String, dataSchema: StructType,
    options: CaseInsensitiveStringMap, tracked: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def spark = SparkSession.active
  private val startingVersion = Option(options.get("startingVersion"))
  private val startingTimestamp = Option(options.get("startingTimestamp"))
  require(startingVersion.isEmpty || startingTimestamp.isEmpty,
    "startingVersion and startingTimestamp are mutually exclusive")
  private val maxVersionsPerTrigger: Option[Long] =
    Option(options.get("maxVersionsPerTrigger")).map(_.toLong)
  // file/row admission caps — the SAME options and the SAME
  // implementation as the append source ([[TxStreamAdmission]]), with
  // the change-feed cost (adds + removes + DV diffs): a churn-heavy
  // table cannot flood a CDC micro-batch
  private val maxFilesPerTrigger: Option[Int] =
    Option(options.get("maxFilesPerTrigger")).map(_.toInt)
  private val maxRowsPerTrigger: Option[Long] =
    Option(options.get("maxRowsPerTrigger")).map(_.toLong)

  @volatile private var availableNowCap: Option[Long] = None
  private def headVersion: Long = TxTable.snapshot(spark, path).version
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(headVersion)

  override def initialOffset(): Offset =
    TxStreamOffset(startingVersion match {
      case Some("latest") => headVersion // only commits after stream start
      case Some(v) => v.toLong - 1 // serve from commit v inclusive
      case None => startingTimestamp match {
        // commits published at or after the instant (Delta convention)
        case Some(ts) =>
          TxTable.firstVersionAtOrAfter(spark, path,
              TxTimestamps.parseMillis(ts))
            .map(_ - 1).getOrElse(headVersion)
        case None => -1L // full history: initial snapshot as inserts
      }
    })

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: Spark calls latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TxStreamOffset].version
    val head = availableNowCap.getOrElse(headVersion)
    TxStreamOffset(TxStreamAdmission.choose(spark, path, s, head,
      maxVersionsPerTrigger, maxFilesPerTrigger, maxRowsPerTrigger,
      TxStreamAdmission.changesCost))
  }

  override def deserializeOffset(json: String): Offset =
    TxStreamOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[TxStreamOffset].version
    val e = end.asInstanceOf[TxStreamOffset].version
    if (e <= s) Array.empty
    else TxChangeFeedPlanning.plan(spark, path, s, e, tracked)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TxChangeFeedPlanning.readerFactory(dataSchema, tracked)
}

/** Shared planner/reader for batch and streaming change scans. */
private[sources] object TxChangeFeedPlanning {

  /** One unit of change: the stock [[FilePartition]] the parquet reader
    * accepts, stamped with its change type and commit version. Bitmap
    * semantics: `include=true` emits ONLY the bitmap positions (a DV
    * diff), `include=false` emits every position NOT in the bitmap (live
    * rows of a DV'd file); an absent bitmap serves the whole file.
    * Bitmap'd partitions hold exactly one file — positions count per
    * file. */
  final case class TxChangePartition(inner: FilePartition,
      changeType: String, version: Long, include: Boolean,
      bitmap: Option[Array[Byte]], cacheKey: String,
      lineage: Option[(Long, Long)] = None) extends InputPartition

  /** Partitions for the row-level changes of commits (from, to];
    * `from = -1` starts at the initial snapshot. The walk is per-version
    * manifest metadata (O(checkpoint interval) reads each) plus one
    * batched DV-sidecar load per side per version — bounded by the
    * commits' own change volume. */
  def plan(spark: SparkSession, path: String, from: Long, to: Long,
           tracked: Boolean = false)
      : Array[InputPartition] = {
    require(from <= to, s"change range ($from, $to] is empty or inverted")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def pf(rel: String) = {
      val p = new Path(s"$path/$rel")
      val st = fs.getFileStatus(p)
      GraftParquetShim.partitionedFile(p.toString, st.getLen,
        st.getModificationTime)
    }
    val parts = Seq.newBuilder[(String, Long, Boolean,
      Option[Array[Byte]], String, Array[String])] // (+ rels) pre-index
    // row-tracking anchors per rel (a file's base never changes once
    // assigned, so one map serves every version of the range)
    val anchors = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def note(m: Map[String, TxTable.FileEntry]): Unit =
      if (tracked) m.valuesIterator.foreach(e =>
        e.base.foreach(b => anchors.update(e.rel, b)))
    var prev: Map[String, TxTable.FileEntry] =
      if (from < 0) Map.empty
      else TxTable.snapshot(spark, path, Some(from)).entries
        .map(e => e.rel -> e).toMap
    note(prev)
    var prevDels: Seq[TxTable.EqDelete] =
      if (from < 0) Seq.empty
      else TxTable.parseEqDeletes(
        TxTable.snapshot(spark, path, Some(from)).props)
    (from + 1 to to).foreach { v =>
      val curSnap = TxTable.snapshot(spark, path, Some(v))
      val cur = curSnap.entries.map(e => e.rel -> e).toMap
      note(cur)
      // EQUALITY deletes registered at v: fold the key sidecar to the
      // exact physical positions it killed (live-at-v rows of files
      // predating v, minus rows earlier deletes already killed) and
      // emit them through the standard inclusion-bitmap partitions —
      // the write path paid nothing, the feed pays the read (the MOR
      // contract)
      val curDels = TxTable.parseEqDeletes(curSnap.props)
      curDels.filter(_.version == v).foreach { d =>
        TxTable.eqDeletePositions(spark, path, curSnap, d, prevDels)
          .toSeq.sortBy(_._1).foreach { case (rel, bytes) =>
            parts += (("delete", v, true, Some(bytes),
              s"cdf-eqdel:$rel@$v", Array(rel)))
          }
      }
      prevDels = curDels
      // dataChange=false commits (compaction/Z-order/purge/rebucket)
      // changed no live row — emit nothing, just advance the baseline
      if (TxTable.commitIsRewrite(fs, path, v)) { prev = cur }
      else {
      // UPDATE classification (pre/post images): a delta row-level
      // commit's sidecar marks which deleted/inserted positions were the
      // two halves of updates; absent sidecar or missing metadata
      // degrades to plain delete/insert, never wrong rows
      val (ud, ui) = TxTable.commitCdfRel(fs, path, v) match {
        case Some(rel) => DeletionVectors.loadCdfMaps(spark, path, rel)
        case None => (Map.empty[String, Array[Byte]],
          Map.empty[String, Array[Byte]])
      }
      val added = (cur.keySet -- prev.keySet).toSeq.sorted.map(cur)
      val removed = (prev.keySet -- cur.keySet).toSeq.sorted.map(prev)
      val changed = cur.keySet.intersect(prev.keySet).toSeq.sorted
        .filter(rel => cur(rel).dv != prev(rel).dv)
      val curBms = DeletionVectors.loadBitmaps(spark, path,
        (added ++ changed.map(cur)).filter(_.dv.isDefined))
      val prevBms = DeletionVectors.loadBitmaps(spark, path,
        (removed ++ changed.map(prev)).filter(_.dv.isDefined))
      // whole live files: DV-less ones ride together (one partition per
      // commit+type), DV'd ones one-per-file with an exclusion bitmap
      def emit(entries: Seq[TxTable.FileEntry], tpe: String,
               bms: Map[String, (String, Array[Byte])]): Unit = {
        val (dvd, clean) = entries.partition(_.dv.isDefined)
        if (clean.nonEmpty)
          parts += ((tpe, v, false, None, "",
            clean.map(_.rel).sorted.toArray))
        dvd.foreach { e =>
          val (key, bytes) = bms(e.rel)
          parts += ((tpe, v, false, Some(bytes), key, Array(e.rel)))
        }
      }
      val (updAdded, plainAdded) = added.partition(e =>
        ui.contains(e.rel) && e.dv.isEmpty && e.rows.isDefined)
      emit(plainAdded, "insert", curBms)
      updAdded.foreach { e =>
        // inserted positions in the update bitmap are post-images; the
        // exclusion partition serves the statement's plain inserts
        val bm = DeletionVectors.deserialize(ui(e.rel))
        parts += (("update_postimage", v, true, Some(ui(e.rel)),
          s"cdf-upost:${e.rel}@$v", Array(e.rel)))
        if (!e.rows.contains(bm.getLongCardinality))
          parts += (("insert", v, false, Some(ui(e.rel)),
            s"cdf-uins:${e.rel}@$v", Array(e.rel)))
      }
      val (updRemoved, plainRemoved) = removed.partition(e =>
        ud.contains(e.rel) && e.rows.isDefined)
      emit(plainRemoved, "delete", prevBms)
      updRemoved.foreach { e =>
        // a fully-dropped file: updated then-live positions are
        // pre-images; the rest of its then-live rows plain deletes
        val udBm = DeletionVectors.deserialize(ud(e.rel))
        val prevDv = e.dv.fold(new RoaringBitmap())(_ =>
          DeletionVectors.deserialize(prevBms(e.rel)._2))
        val pre = RoaringBitmap.andNot(udBm, prevDv)
        if (!pre.isEmpty)
          parts += (("update_preimage", v, true,
            Some(DeletionVectors.serialize(pre)),
            s"cdf-upre:${e.rel}@$v", Array(e.rel)))
        val dead = RoaringBitmap.or(prevDv, udBm)
        if (!e.rows.contains(dead.getLongCardinality))
          parts += (("delete", v, false,
            Some(DeletionVectors.serialize(dead)),
            s"cdf-udel:${e.rel}@$v", Array(e.rel)))
      }
      // same rel, changed vector: newly-marked positions died at v,
      // un-marked positions (a restore shrank the vector) revived at v
      changed.foreach { rel =>
        def bmOf(e: TxTable.FileEntry,
                 bms: Map[String, (String, Array[Byte])]): RoaringBitmap =
          e.dv.fold(new RoaringBitmap())(_ =>
            DeletionVectors.deserialize(bms(rel)._2))
        val cb = bmOf(cur(rel), curBms)
        val pb = bmOf(prev(rel), prevBms)
        val newlyDead0 = RoaringBitmap.andNot(cb, pb)
        // updated rows' deaths are pre-images, the rest plain deletes
        val udBm = ud.get(rel).map(DeletionVectors.deserialize)
          .getOrElse(new RoaringBitmap())
        val preImg = RoaringBitmap.and(newlyDead0, udBm)
        val newlyDead = RoaringBitmap.andNot(newlyDead0, udBm)
        val revived = RoaringBitmap.andNot(pb, cb)
        if (!preImg.isEmpty)
          parts += (("update_preimage", v, true,
            Some(DeletionVectors.serialize(preImg)),
            s"cdf-upre:$rel@$v", Array(rel)))
        if (!newlyDead.isEmpty)
          parts += (("delete", v, true,
            Some(DeletionVectors.serialize(newlyDead)),
            s"cdf-dead:$rel@$v", Array(rel)))
        if (!revived.isEmpty)
          parts += (("insert", v, true,
            Some(DeletionVectors.serialize(revived)),
            s"cdf-revived:$rel@$v", Array(rel)))
      }
      prev = cur
      }
    }
    // row tracking: identity is per FILE (anchor + physical position),
    // so a tracked feed splits batched multi-file partitions per file
    // and attaches each file's anchor
    val raw0 = parts.result()
    val expanded =
      if (!tracked) raw0
      else raw0.flatMap { case t @ (tpe, v, include, bitmap, key, rels) =>
        if (rels.length <= 1) Seq(t)
        else rels.toSeq.map(r =>
          (tpe, v, include, bitmap, key, Array(r)))
      }
    expanded.zipWithIndex.map {
      case ((tpe, v, include, bitmap, key, rels), i) =>
        TxChangePartition(FilePartition(i, rels.map(pf)), tpe, v,
          include, bitmap, key,
          if (tracked && rels.length == 1) anchors.get(rels.head)
          else None): InputPartition
    }.toArray
  }

  def readerFactory(dataSchema: StructType,
                    tracked: Boolean = false): PartitionReaderFactory = {
    // tracked feeds additionally read the hidden materialized lineage
    // columns (null-filled on files that never moved rows)
    val fileSchema =
      if (!tracked) dataSchema
      else StructType(dataSchema.fields
        :+ StructField(TxTable.RidCol, LongType)
        :+ StructField(TxTable.RcvCol, LongType))
    new TxChangeReaderFactory(
      TxScanPlanning.readerFor(fileSchema, fileSchema),
      dataSchema.fields.map(_.dataType), tracked)
  }
}

/** Wraps the stock parquet reader: applies the partition's bitmap by
  * physical position (inclusion for DV diffs, exclusion for live rows of
  * DV'd files) and appends the change-type/commit-version constants.
  * Row-based by construction — change feeds are incremental-consumer
  * reads, not the hot analytical path. */
private[sources] final class TxChangeReaderFactory(
    raw: PartitionReaderFactory, dataTypes: Array[DataType],
    tracked: Boolean = false)
    extends PartitionReaderFactory {
  import org.apache.spark.sql.connector.read.PartitionReader

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[TxChangeFeedPlanning.TxChangePartition]
    if (cp.bitmap.isDefined)
      require(cp.inner.files.length == 1,
        "a bitmap'd change partition must hold exactly one file")
    val bm = cp.bitmap.map(DeletionVectors.cachedBitmap(cp.cacheKey, _))
    val tpe = UTF8String.fromString(cp.changeType)
    val delegate = raw.createReader(cp.inner)
    val n = dataTypes.length
    val width = n + (if (tracked) 4 else 2)
    new PartitionReader[InternalRow] {
      private var pos = -1L
      private val out = new GenericInternalRow(width)
      override def next(): Boolean = bm match {
        case None =>
          if (delegate.next()) { pos += 1; true } else false
        case Some(b) =>
          while (delegate.next()) {
            pos += 1
            val marked =
              pos <= DeletionVectors.MaxPos && b.contains(pos.toInt)
            if (marked == cp.include) return true
          }
          false
      }
      override def get(): InternalRow = {
        val row = delegate.get()
        var i = 0
        while (i < n) { out.update(i, row.get(i, dataTypes(i))); i += 1 }
        if (tracked) {
          // materialized hidden columns win; fresh rows answer from the
          // file's anchor + this physical position; files with no
          // anchor (pre-enable history) honestly serve NULL
          val rid: Any =
            if (!row.isNullAt(n)) java.lang.Long.valueOf(row.getLong(n))
            else cp.lineage.map(l => java.lang.Long.valueOf(l._1 + pos))
              .orNull
          val rcv: Any =
            if (!row.isNullAt(n + 1))
              java.lang.Long.valueOf(row.getLong(n + 1))
            else cp.lineage.map(l => java.lang.Long.valueOf(l._2)).orNull
          out.update(n, rid)
          out.update(n + 1, rcv)
        }
        out.update(width - 2, tpe)
        out.update(width - 1, cp.version)
        out
      }
      override def close(): Unit = delegate.close()
    }
  }
}
