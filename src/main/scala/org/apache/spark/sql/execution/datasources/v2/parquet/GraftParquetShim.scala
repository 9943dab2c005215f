package org.apache.spark.sql.execution.datasources.v2.parquet

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.read.{HasPartitionKey, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Spark-package shim for graft's TxTable DSv2 read path (public-knowledge
  * Spark internals, the pattern OSS connectors use to reuse the stock
  * readers): constructs the vectorized parquet reader factory and
  * file-partition values whose Scala visibility is package-private.
  *
  * Everything here delegates; the TxTable-specific logic (manifest →
  * buckets → partitions) lives in `graft.sources`. */
object GraftParquetShim {

  /** The stock vectorized/codegen parquet reader factory over an explicit
    * (dataSchema, readDataSchema) pair — no partition columns (TxTable
    * buckets travel INSIDE the data files). `pushedFilters` ride into the
    * stock reader for ROW-GROUP and page (column-index) skipping INSIDE
    * kept files — the level below the manifest's file pruning; parquet
    * filtering is conservative and Spark re-evaluates the residuals
    * above, so it can only shrink I/O, never change results. Delegates to
    * a real [[ParquetScan]] over an empty file index so every
    * read-support hadoop conf key (requested schema, timezone, rebase
    * modes, …) is prepared by the stock code path, not re-derived here. */
  def readerFactory(spark: SparkSession, dataSchema: StructType,
                    readDataSchema: StructType,
                    pushedFilters: Array[org.apache.spark.sql.sources.Filter]
                      = Array.empty): PartitionReaderFactory = {
    val index = new org.apache.spark.sql.execution.datasources
      .InMemoryFileIndex(spark, Seq.empty, Map.empty, Some(dataSchema))
    ParquetScan(spark, spark.sessionState.newHadoopConf(), index,
      dataSchema, readDataSchema, new StructType(), pushedFilters,
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(), None,
      Seq.empty, Seq.empty,
      Array.empty[org.apache.spark.sql.connector.read.VariantExtraction])
      .createReaderFactory()
  }

  /** A whole-file PartitionedFile with empty partition values. */
  def partitionedFile(path: String, size: Long,
                      modTime: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPathString(path), 0L,
      size, Array.empty, modTime, size)

  /** One input partition per TxTable bucket: the stock FilePartition (so
    * the stock reader factory accepts it) plus [[HasPartitionKey]] carrying
    * the bucket id — the hook storage-partitioned joins group on.
    *
    * `dv` is the partition's OWN file's deletion-vector payload
    * (cache key, serialized bitmap), attached at planning time by the
    * driver. Partition-attached so each task serializes exactly the
    * bitmap bytes it will apply — a reader factory travels with EVERY
    * task, so a rel→bitmap map stored there would ship the union of all
    * scanned files' bitmaps into each task binary. A DV-carrying
    * partition always holds exactly one file (positions count per file). */
  final class GraftBucketFilePartition(index: Int,
                                       files: Array[PartitionedFile],
                                       val bucketId: Int,
                                       val dv: Option[(String, Array[Byte])])
      extends FilePartition(index, files) with HasPartitionKey {
    override def partitionKey(): InternalRow =
      new GenericInternalRow(Array[Any](bucketId))
  }

  def bucketFilePartition(index: Int, files: Array[PartitionedFile],
                          bucketId: Int,
                          dv: Option[(String, Array[Byte])] = None)
      : FilePartition with HasPartitionKey =
    new GraftBucketFilePartition(index, files, bucketId, dv)

  /** A [[org.apache.spark.sql.execution.datasources.FileIndex]] over an
    * EXPLICIT status list — the manifest-backed read path: every file's
    * path and length come from the table's own commit metadata, so
    * planning performs ZERO filesystem listing (no `InMemoryFileIndex`
    * job over the path set) and zero per-file stats. This is the property
    * manifest table formats are built for (guide §6: manifest metadata
    * avoids directory listing altogether); the statuses' lengths feed
    * split planning (`maxPartitionBytes`) exactly like listed ones. */
  private final class GraftManifestFileIndex(
      statuses: Seq[org.apache.hadoop.fs.FileStatus])
      extends org.apache.spark.sql.execution.datasources.FileIndex {
    override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
      statuses.map(_.getPath)
    override def listFiles(
        partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
        dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
        : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] =
      Seq(org.apache.spark.sql.execution.datasources.PartitionDirectory(
        InternalRow.empty, statuses.toArray))
    override def inputFiles: Array[String] =
      statuses.map(_.getPath.toString).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = statuses.map(_.getLen).sum
    override def partitionSchema: StructType = new StructType()
  }

  /** A parquet DataFrame over an explicit (path, length) file list with a
    * KNOWN schema: no listing job, no schema inference, no per-file
    * footer or stat calls at plan time — identical execution to
    * `spark.read.schema(s).parquet(paths: _*)` (same `HadoopFsRelation` +
    * `ParquetFileFormat` scan, same codegen/vectorized reader, metadata
    * columns like `_metadata.row_index` included), minus the
    * `InMemoryFileIndex` work. Lengths must be the files' true sizes
    * (they bound split planning); modification times are irrelevant to
    * the parquet reader and are stamped 0. */
  def parquetFromStatuses(spark: SparkSession, schema: StructType,
                          files: Seq[(String, Long)])
      : org.apache.spark.sql.DataFrame = {
    val statuses = files.map { case (p, len) =>
      new org.apache.hadoop.fs.FileStatus(len, false, 1, 128L * 1024 * 1024,
        0L, new org.apache.hadoop.fs.Path(p))
    }
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      new GraftManifestFileIndex(statuses),
      partitionSchema = new StructType(),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(spark)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      org.apache.spark.sql.execution.datasources.LogicalRelation(relation))
  }

  /** Driver-side hadoop conf for [[rowParquetWriter]]: newHadoopConf plus
    * the keys ParquetWriteSupport.init ASSERTS are explicitly present
    * (Spark's prepareWrite sets them; a bare session conf only carries
    * keys the user changed) — resolved through SQLConf so the session's
    * actual values (not re-derived defaults) travel to the executors. */
  def writeHadoopConf(spark: SparkSession)
      : org.apache.hadoop.conf.Configuration = {
    val conf = spark.sessionState.newHadoopConf()
    val sql = spark.sessionState.conf
    conf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_WRITE_LEGACY_FORMAT.key,
      sql.writeLegacyParquetFormat.toString)
    conf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sql.parquetOutputTimestampType.toString)
    conf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_REBASE_MODE_IN_WRITE.key,
      sql.getConf(org.apache.spark.sql.internal.SQLConf
        .PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sql.getConf(org.apache.spark.sql.internal.SQLConf
        .PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sql.parquetFieldIdWriteEnabled.toString)
    conf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sql.getConf(org.apache.spark.sql.internal.SQLConf
        .PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    conf
  }

  /** Executor-side parquet writer for catalyst InternalRows, via Spark's
    * own ParquetWriteSupport (same timestamp/decimal/rebase semantics as
    * every other file this engine writes). The hadoop conf must come from
    * [[writeHadoopConf]] so the SQL entries the write support consults
    * ride along. */
  def rowParquetWriter(path: String,
                       schema: StructType,
                       conf: org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.hadoop.ParquetWriter[InternalRow] = {
    org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
      .setSchema(schema, conf)
    new GraftRowWriterBuilder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .withWriteMode(org.apache.parquet.hadoop.ParquetFileWriter.Mode.CREATE)
      .build()
  }

  private final class GraftRowWriterBuilder(p: org.apache.hadoop.fs.Path)
      extends org.apache.parquet.hadoop.ParquetWriter.Builder[InternalRow,
        GraftRowWriterBuilder](p) {
    override def self(): GraftRowWriterBuilder = this
    override def getWriteSupport(conf: org.apache.hadoop.conf.Configuration)
        : org.apache.parquet.hadoop.api.WriteSupport[InternalRow] =
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetWriteSupport
  }
}
