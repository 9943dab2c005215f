package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.roaringbitmap.RoaringBitmap

/** Deletion-vector plumbing for [[TxTable]]'s merge-on-read deletes — the
  * public Delta/Iceberg DV design re-expressed over the graft commit log:
  * a DELETE that only partially covers a file marks the matching ROW
  * POSITIONS dead in a per-file compressed bitmap (RoaringBitmap — the
  * same library Spark itself depends on) instead of rewriting the file.
  * The bitmaps for one delete commit land in ONE staged parquet sidecar
  * `(rel, dv, ndel)` under `files/<uuid>/` — vacuum-managed exactly like
  * data — and each affected manifest entry is atomically re-added with a
  * [[TxTable.DvRef]] pointing at it.
  *
  * Positions are the file's physical row indexes (`_metadata.row_index`
  * on the DataFrame read path; reader ordinal on the DSv2 per-file path —
  * identical because a whole-file scan with no pushed filters reads rows
  * in file order). Readers drop marked positions; compaction folds DVs
  * away by rewriting through the DV-aware read.
  *
  * Scale shape: the delete scans ONLY the partially-covered files (full
  * coverage is a manifest drop; zero coverage is untouched), the bitmap
  * build is a distributed per-file aggregation, and a read's extra cost
  * is one broadcast of the SCANNED files' bitmaps plus a row-filter on
  * exactly those files — clean files keep their vectorized/codegen path
  * untouched. */
object DeletionVectors {

  /** Files can hold at most Int.MaxValue rows for a positional bitmap;
    * parquet files at sane sizes are orders of magnitude below this. */
  private[graft] val MaxPos = Int.MaxValue.toLong

  /** The table-relative data-file suffix
    * `files/<uuid>[/spec-<sid>][/part-<v0>][/part2-<v1>…]/<dir>/<name>` —
    * the ONE pattern every DV consumer keys files by (`input_file_name`
    * extraction here, partition-path extraction on the DSv2 side). The
    * optional `spec-<sid>` segment marks a post-evolution partition
    * generation; the `part*` segments are the hidden-partition levels;
    * the innermost dir is always `bucket-<b>` (so a parquet task-file
    * NAME starting with `part-` can never be mistaken for a partition
    * segment — names sit past the bucket dir). Load-bearing: a drifted
    * copy would silently serve deleted rows. */
  private[graft] val RelPattern =
    "files/[^/]+(/spec-\\d+)?(/part\\d*-[^/]+)*/[^/]+/[^/]+$"
  private val RelRegex = RelPattern.r

  /** Canonical `files/…` suffix of a manifest rel — what the
    * input_file_name extraction yields. Identity for native rels; for a
    * CLONE's shared files the manifest rel is `../…/files/…` and this
    * strips the cross-table prefix. Staging-dir UUIDs make the suffix
    * unique across tables, so it is a safe join key. */
  private[graft] def relKey(rel: String): String =
    RelRegex.findFirstIn(rel).getOrElse(rel)

  /** Column mapping the extracted suffix back to the MANIFEST rel for
    * the given entry set, so every downstream keying (bitmaps, zone-map
    * sidecars, manifest removes) speaks manifest rels even over a
    * clone's shared files. Bounded by the statement's entry set — the
    * same cost class as the live-set trim udf used beside it; pure
    * extraction when no entry needs remapping. */
  private[graft] def manifestRel(entries: Seq[TxTable.FileEntry])
      : Column = {
    val extracted = regexp_extract(input_file_name(), RelPattern, 0)
    val m = entries.map(e => relKey(e.rel) -> e.rel)
      .filter(x => x._1 != x._2).toMap
    if (m.isEmpty) extracted
    else udf((s: String) => m.getOrElse(s, s)).apply(extracted)
  }

  def serialize(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val out = new java.io.ByteArrayOutputStream()
    bm.serialize(new java.io.DataOutputStream(out))
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  /** Distributed per-file position collector: positions stream in as
    * longs, merge map-side into one RoaringBitmap per file. */
  private class DvAgg extends org.apache.spark.sql.expressions.Aggregator[
      java.lang.Long, RoaringBitmap, Array[Byte]] {
    override def zero: RoaringBitmap = new RoaringBitmap()
    override def reduce(b: RoaringBitmap, pos: java.lang.Long): RoaringBitmap = {
      if (pos != null) {
        require(pos.longValue() >= 0 && pos.longValue() <= MaxPos,
          s"row position ${pos.longValue()} outside positional-bitmap range")
        b.add(pos.intValue())
      }
      b
    }
    override def merge(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = {
      a.or(b); a
    }
    override def finish(b: RoaringBitmap): Array[Byte] = serialize(b)
    override def bufferEncoder =
      org.apache.spark.sql.Encoders.kryo[RoaringBitmap]
    override def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }

  private[graft] def dvUdaf: org.apache.spark.sql.expressions
      .UserDefinedFunction =
    udaf(new DvAgg, org.apache.spark.sql.Encoders.LONG)

  /** Executor/driver-shared cache of deserialized bitmaps. DV sidecar
    * files are immutable (staged once, referenced by rel), so the
    * (dvRel, rel) key can never go stale. Size-bounded LRU: past the cap
    * the ELDEST entry alone evicts (a whole-cache clear would stampede
    * every in-flight partition into re-deserializing mid-scan). */
  private val MaxCached = 4096
  private val cache =
    new java.util.LinkedHashMap[String, RoaringBitmap](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, RoaringBitmap]): Boolean =
        size() > MaxCached
    }

  private[graft] def cachedBitmap(key: String,
                                  bytes: => Array[Byte]): RoaringBitmap =
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val bm = deserialize(bytes)
        cache.put(key, bm)
        bm
      }
    }

  /** Driver-side load of the deletion bitmaps for `entries` (only those
    * carrying a [[TxTable.DvRef]]): one read over the distinct DV sidecar
    * files, returning rel -> (cache key, serialized bitmap). Bounded by
    * the scanned files' bitmap bytes — the same order as the broadcast a
    * DV-aware read ships. */
  private[graft] def loadBitmaps(spark: SparkSession, table: String,
                                 entries: Seq[TxTable.FileEntry])
      : Map[String, (String, Array[Byte])] = {
    val dvd = entries.flatMap(e => e.dv.map(d => e.rel -> d.rel))
    if (dvd.isEmpty) return Map.empty
    val wanted = dvd.toMap
    val dvFiles = dvd.map(_._2).distinct.map(r => s"$table/$r")
    // a rel can appear in SEVERAL sidecars (each delete stages a fresh
    // one holding the files it touched, superseding their older rows) —
    // only the row from the sidecar the ENTRY references is current; an
    // older sidecar's row for the same rel is a stale subset that must
    // never shadow it
    spark.read.parquet(dvFiles: _*)
      .select(col("rel"), col("dv"), input_file_name().as("__src"))
      .collect()
      .iterator
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1), r.getString(2)))
      .filter { case (rel, _, src) =>
        wanted.get(rel).exists(dvRel => src.endsWith(dvRel)) }
      .map { case (rel, bytes, _) =>
        rel -> ((s"${wanted(rel)}#$rel", bytes)) }
      .toMap
  }

  /** Per-task probe behind [[DvMarked]]: resolves the row's FILE PATH to
    * its deletion bitmap through the broadcast and answers membership.
    * The map is keyed by [[relKey]] (staging-dir UUIDs make the suffix
    * unique even across a clone's tables); the probe takes the raw
    * `input_file_name` and runs the suffix extraction itself — ONCE per
    * file change, not per row. Rows arrive file-clustered within a
    * partition, so the one-entry memo turns the steady-state per-row
    * cost into one UTF8String equality + one bitmap.contains (no regexp,
    * no map lookup, no String conversion on the hot path). Micro-bench,
    * 4 M rows with EVERY file dirty at 1% deleted, local[32] medians:
    * clean read 0.16 s; DV'd read with the old per-row ScalaUDF +
    * regexp leg 1.45 s; this probe 0.44 s — 3.3× less dirty-read tax,
    * and `purgeDeletes` reclaims the clean path entirely past its
    * threshold.
    * Mutable state is `@transient`: every task deserializes its own copy
    * (expression references ship per task), so no cross-thread sharing. */
  private[graft] final class DvProbe(
      bc: org.apache.spark.broadcast.Broadcast[
        Map[String, (String, Array[Byte])]]) extends Serializable {
    @transient private var lastPath: org.apache.spark.unsafe.types.UTF8String = _
    @transient private var lastBm: RoaringBitmap = _
    def hit(path: org.apache.spark.unsafe.types.UTF8String,
            pos: Long): Boolean = {
      if (path == null) return false
      if (lastPath == null || !lastPath.equals(path)) {
        // the incoming UTF8String may view a reused row buffer — copy
        lastPath = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(path.getBytes)
        lastBm = bc.value.get(relKey(path.toString)) match {
          case Some((key, bytes)) => cachedBitmap(key, bytes)
          case None => null
        }
      }
      lastBm != null && pos >= 0 && pos <= MaxPos &&
        lastBm.contains(pos.toInt)
    }
  }

  /** Native Catalyst predicate `marked(rel, pos)` — true iff the row's
    * physical position is set in its file's deletion bitmap. Codegen'd
    * (stays inside WholeStageCodegen; plan-pinned in DeletionVectorSpec),
    * replacing the per-row ScalaUDF the DataFrame-path DV filter used to
    * pay: no per-row UTF8String→String conversion, no boxing, no
    * JVM-boundary invoke — one memoized probe call. `bitmaps` travel as
    * ONE Spark broadcast: a closure-captured map would be re-serialized
    * into EVERY task binary (at 100k churned files that is files ×
    * bitmap-bytes per task); a broadcast ships once per executor and its
    * blocks are reclaimed by the ContextCleaner when the plan is GC'd.
    * Executors deserialize each file's bitmap once through the bounded
    * cache. The predicate sits only on the DV'd files' leg of a read —
    * clean files never pay it. */
  private[graft] case class DvMarked(
      rel: org.apache.spark.sql.catalyst.expressions.Expression,
      pos: org.apache.spark.sql.catalyst.expressions.Expression,
      probe: DvProbe)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with org.apache.spark.sql.catalyst.expressions.Predicate {
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.expressions.codegen.{
      CodegenContext, ExprCode}
    override def left: Expression = rel
    override def right: Expression = pos
    override def nullable: Boolean = false
    override def prettyName: String = "dv_marked"
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
        : Any = {
      val r = rel.eval(input)
        .asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val p = pos.eval(input)
      probe.hit(r, if (p == null) -1L else p.asInstanceOf[Long])
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val probeRef = ctx.addReferenceObj("dvProbe", probe,
        classOf[DvProbe].getName)
      val r = rel.genCode(ctx)
      val p = pos.genCode(ctx)
      ev.copy(code =
        code"""
          ${r.code}
          ${p.code}
          boolean ${ev.value} = $probeRef.hit(
            ${r.isNull} ? null : ${r.value},
            ${p.isNull} ? -1L : ${p.value});
        """,
        isNull = FalseLiteral)
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(rel = l, pos = r)
  }

  /** The live-row predicate for the DataFrame read path over DV'd files:
    * keep a row iff its (file rel, physical row index) is NOT marked in
    * the file's bitmap. See [[DvMarked]] for the execution shape. */
  private[graft] def liveFilter(spark: SparkSession,
                                bitmaps: Map[String, (String, Array[Byte])])
      : Column = {
    val probe = new DvProbe(spark.sparkContext.broadcast(
      bitmaps.map { case (rel, v) => relKey(rel) -> v }))
    !org.apache.spark.sql.GraftColumnBridge.column(DvMarked(
      org.apache.spark.sql.GraftColumnBridge.expression(col("__dv_rel")),
      org.apache.spark.sql.GraftColumnBridge.expression(col("__dv_pos")),
      probe))
  }

  /** Read `entries` of `table` applying deletion vectors: clean files go
    * through the ordinary (vectorized, codegen) parquet read; DV'd files
    * add the physical row index + rel, filter live rows, and union back.
    * Schema/columns identical to a plain read on both legs. */
  /** Build the parquet frame for an explicit entry list. With a recorded
    * schema the scan is constructed straight from manifest statistics
    * (paths + `b:` lengths; legacy entries fall back to one cached stat
    * each): ZERO listing jobs and zero schema inference at plan time —
    * the manifest-metadata read path (guide §6), same execution plan as
    * `spark.read.schema(s).parquet(...)` otherwise. Schema-less (v1)
    * tables keep the listing+inference reader, their only schema source. */
  private[graft] def entriesFrame(spark: SparkSession, table: String,
                                  es: Seq[TxTable.FileEntry],
                                  schema: Option[StructType]): DataFrame =
    schema match {
      case Some(s) =>
        val tPath = new org.apache.hadoop.fs.Path(table)
        val fs = tPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val qualified = fs.makeQualified(tPath).toString
        org.apache.spark.sql.execution.datasources.v2.parquet
          .GraftParquetShim.parquetFromStatuses(spark, s,
            es.map(e => (s"$qualified/${e.rel}",
              graft.sources.TxFileSizes.of(fs, table, e))))
      case None =>
        spark.read.parquet(es.map(e => s"$table/${e.rel}"): _*)
    }

  private[graft] def readEntries(spark: SparkSession, table: String,
                                 entries: Seq[TxTable.FileEntry],
                                 schema: Option[StructType]): DataFrame = {
    val (dvd, clean) = entries.partition(_.dv.isDefined)
    require(entries.nonEmpty, "readEntries needs at least one file")
    val cleanDf =
      if (clean.isEmpty) None
      else Some(entriesFrame(spark, table, clean, schema))
    val dvdDf =
      if (dvd.isEmpty) None
      else {
        val bitmaps = loadBitmaps(spark, table, dvd)
        val raw = entriesFrame(spark, table, dvd, schema)
        val cols = raw.columns.toSeq
        // the probe is relKey-keyed and extracts the suffix itself once
        // per file — the raw path feeds it directly: no per-row regexp,
        // no manifest-rel remap even over a clone's shared files, and
        // the whole leg stays codegen'd
        Some(raw
          .withColumn("__dv_rel", input_file_name())
          .withColumn("__dv_pos", col("_metadata.row_index"))
          .filter(liveFilter(spark, bitmaps))
          .select(cols.map(col): _*))
      }
    (cleanDf, dvdDf) match {
      case (Some(c), Some(d)) => c.unionByName(d)
      case (c, d) => c.orElse(d).get
    }
  }

  /** The inverse read: rows of `entries` whose physical position IS set
    * in the given bitmap — the change-feed's exact row-level DELETE
    * emission (a deletion-vector diff between two versions marks exactly
    * the rows that died in between). Bitmap cache keys are
    * content-addressed (the diff bitmaps are ad hoc, not sidecar-backed). */
  private[graft] def readMarked(spark: SparkSession, table: String,
                                marked: Seq[(TxTable.FileEntry, Array[Byte])],
                                schema: Option[StructType],
                                lineage: Boolean = false): DataFrame = {
    require(marked.nonEmpty, "readMarked needs at least one file")
    require(!lineage || schema.isDefined,
      "lineage-carrying marked reads need an explicit schema")
    val keyed = marked.map { case (e, bytes) =>
      relKey(e.rel) ->
        ((s"diff#${java.util.UUID.nameUUIDFromBytes(bytes)}", bytes))
    }.toMap
    // row tracking: the marked rows carry their identity — materialized
    // hidden columns win over the file's manifest anchor (base + physical
    // position), exactly the [[TxTable.readLineage]] coalesce
    val readSchema = schema.map { s =>
      if (!lineage) s
      else StructType(s.fields
        :+ org.apache.spark.sql.types.StructField(TxTable.RidCol,
          org.apache.spark.sql.types.LongType)
        :+ org.apache.spark.sql.types.StructField(TxTable.RcvCol,
          org.apache.spark.sql.types.LongType))
    }
    val raw = entriesFrame(spark, table, marked.map(_._1), readSchema)
    val cols = schema.fold(raw.columns.toSeq)(_.fieldNames.toSeq)
    // the same native DvMarked predicate as the live filter, un-negated
    // (one broadcast, relKey-keyed, codegen'd — see DvMarked)
    val probe = new DvProbe(spark.sparkContext.broadcast(keyed))
    val filtered = raw
      .withColumn("__dv_rel", input_file_name())
      .withColumn("__dv_pos", col("_metadata.row_index"))
      .filter(org.apache.spark.sql.GraftColumnBridge.column(DvMarked(
        org.apache.spark.sql.GraftColumnBridge.expression(col("__dv_rel")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("__dv_pos")),
        probe)))
    if (!lineage) filtered.select(cols.map(col): _*)
    else {
      val lookup = marked.map { case (e, _) =>
        val (b, v0) = e.base.getOrElse(throw new IllegalStateException(
          s"$table: ${e.rel} carries no base row id under row tracking. " +
            "Rows staged on an UNPUBLISHED branch or WAP id receive " +
            "durable ids at publish (lineage is undefined until then — " +
            "publish first); on a published head this means the enable " +
            "invariant is broken (run enable_row_tracking / compact " +
            "once)"))
        (relKey(e.rel), b, v0)
      }
      val lookupDf = spark.createDataFrame(lookup)
        .toDF("__rk2", "__base", "__frcv")
      filtered
        .withColumn("__rk",
          regexp_extract(input_file_name(), RelPattern, 0))
        .withColumn("__pos", col("_metadata.row_index"))
        .join(broadcast(lookupDf), col("__rk") === col("__rk2"), "left")
        .withColumn(TxTable.RowIdCol,
          coalesce(col(s"`${TxTable.RidCol}`"),
            col("__base") + col("__pos")))
        .withColumn(TxTable.RowCommitCol,
          coalesce(col(s"`${TxTable.RcvCol}`"), col("__frcv")))
        .select((cols.map(col) :+ col(TxTable.RowIdCol)
          :+ col(TxTable.RowCommitCol)): _*)
    }
  }

  /** Stage the per-commit UPDATE-CLASSIFICATION sidecar (row-level CDF):
    * rows of `(kind, rel, bm)` where kind 'ud' marks the DELETED
    * positions of `rel` that belong to updates (pre-images) and kind
    * 'ui' marks the INSERTED positions of `rel` that belong to updates
    * (post-images). Referenced from the commit header (field 11), kept
    * alive by vacuum exactly like a DV sidecar. */
  private[graft] def stageCdfFile(spark: SparkSession, table: String,
                                  rows: Seq[(String, String, Array[Byte])])
      : String = {
    require(rows.nonEmpty, "no update classification to stage")
    val rel = s"files/${java.util.UUID.randomUUID()}/cdf.parquet"
    val schema = StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("rel", StringType, nullable = false),
      StructField("bm", BinaryType, nullable = false)))
    val fs = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(table, rel).getParent)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    val w = org.apache.spark.sql.execution.datasources.v2.parquet
      .GraftParquetShim.rowParquetWriter(s"$table/$rel", schema,
        org.apache.spark.sql.execution.datasources.v2.parquet
          .GraftParquetShim.writeHadoopConf(spark))
    try rows.foreach { case (k, r, bm) =>
      w.write(conv(org.apache.spark.sql.Row(k, r, bm))
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
    } finally w.close()
    rel
  }

  /** Load an update-classification sidecar: (updated-delete bitmaps by
    * source rel, updated-insert bitmaps by new rel). */
  private[graft] def loadCdfMaps(spark: SparkSession, table: String,
                                 rel: String)
      : (Map[String, Array[Byte]], Map[String, Array[Byte]]) = {
    val rows = spark.read.parquet(s"$table/$rel")
      .select(col("kind"), col("rel"), col("bm"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2)))
    (rows.collect { case ("ud", r, b) => r -> b }.toMap,
      rows.collect { case ("ui", r, b) => r -> b }.toMap)
  }

  /** Stage ONE deletion-vector sidecar parquet holding `rows` of
    * `(rel, dv, ndel)` under a fresh `files/<uuid>/` directory (driver-
    * side writer — the row count is the commit's touched files, bounded
    * metadata) and return its table-relative path. Crash before the
    * commit leaves an unreferenced orphan for vacuum, like any stage. */
  private[graft] def stageDvFile(spark: SparkSession, table: String,
                                 rows: Seq[(String, Array[Byte], Long)])
      : String = {
    require(rows.nonEmpty, "no deletion vectors to stage")
    val rel = s"files/${java.util.UUID.randomUUID()}/dv.parquet"
    val schema = StructType(Seq(
      StructField("rel", StringType, nullable = false),
      StructField("dv", BinaryType, nullable = false),
      StructField("ndel", LongType, nullable = false)))
    val fs = new Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(table, rel).getParent)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    val w = org.apache.spark.sql.execution.datasources.v2.parquet
      .GraftParquetShim.rowParquetWriter(s"$table/$rel", schema,
        org.apache.spark.sql.execution.datasources.v2.parquet
          .GraftParquetShim.writeHadoopConf(spark))
    try rows.foreach { case (r, dv, n) =>
      w.write(conv(org.apache.spark.sql.Row(r, dv, java.lang.Long.valueOf(n)))
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
    } finally w.close()
    rel
  }
}
