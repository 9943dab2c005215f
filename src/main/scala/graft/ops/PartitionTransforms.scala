package graft.ops

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}

/** Hidden partitioning (the Iceberg partition-transform idea): a table
  * declares `PARTITIONED BY (days(ts), bucket(n, key))` and the engine —
  * not the user — derives each row's partition value at write time,
  * splits staged files by it (a `part-<v>/` path segment above the
  * bucket segment, so the MANIFEST FORMAT is untouched and vacuum /
  * branch / WAP logic is oblivious), and converts query predicates on
  * the SOURCE column into exact per-file envelopes at plan time. Users
  * never see or write the partition column; they filter on `ts` and get
  * partition pruning.
  *
  * Reference behavior note: the reference pipeline's gold tables are
  * time-cut by event date (`Gold1.py:20-27`'s commented time cutoff is
  * exactly this read shape); this layer gives that read planner-visible
  * pruning instead of a full scan.
  *
  * Transform semantics are UTC-EXACT and timezone-free, like Iceberg's
  * published spec: `hours`/`days` are pure epoch arithmetic on the
  * instant; `months`/`years` run the proleptic-Gregorian civil-date
  * algorithm (Howard Hinnant's `civil_from_days`, public domain) in
  * integer arithmetic — so the SAME instant always lands in the SAME
  * partition no matter the session timezone, and the driver-side range
  * reconstruction below ([[rangeMicros]]) is exactly inverse. All
  * expressions are stock `functions._` arithmetic: codegen-friendly,
  * no UDF in the write path.
  *
  * Value definitions (all relative to 1970-01-01T00:00:00Z):
  *   hours(ts)  = floorDiv(epochMicros, 3_600_000_000)
  *   days(ts)   = floorDiv(epochMicros, 86_400_000_000); days(date) = epochDay
  *   months(x)  = (utcYear - 1970) * 12 + (utcMonth - 1)
  *   years(x)   = utcYear - 1970
  */
object PartitionTransforms {

  /** Hidden write-side partition tag column (dropped before bytes land,
    * like [[LayoutOps.BucketCol]]'s `__pb` staging alias). */
  val PartCol = "__graft_part"

  /** Table-property key recording the transform, e.g. `days(ts)` — the
    * column name is PHYSICAL (column-mapping safe: renames change only
    * the logical map, never this identity). Set at CREATE, immutable. */
  val Prop = "graft.partition.transform"

  val Fns: Set[String] = Set("hours", "days", "months", "years")

  /** A parsed transform: function + PHYSICAL source column. */
  final case class Spec(fn: String, column: String) {
    def render: String = s"$fn($column)"
  }

  def parse(s: String): Spec = {
    val m = "^([a-z]+)\\((.+)\\)$".r
    s.trim match {
      case m(fn, c) if Fns(fn) => Spec(fn, c)
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform '$other': expected " +
          s"${Fns.toSeq.sorted.mkString("|")}(<column>)")
    }
  }

  def of(props: Map[String, String]): Option[Spec] =
    props.get(Prop).map(parse)

  /** Validate the transform against the table schema at CREATE: the
    * source column must exist and be TIMESTAMP (any fn) or DATE
    * (days/months/years — sub-day partitions of a date are meaningless). */
  def validate(spec: Spec, schema: org.apache.spark.sql.types.StructType): Unit = {
    val f = schema.fields.find(_.name == spec.column).getOrElse(
      throw new IllegalArgumentException(
        s"partition transform ${spec.render}: column '${spec.column}' " +
          s"is not in ${schema.simpleString}"))
    f.dataType match {
      case TimestampType => ()
      case DateType if spec.fn != "hours" => ()
      case dt => throw new IllegalArgumentException(
        s"partition transform ${spec.render}: needs TIMESTAMP" +
          s"${if (spec.fn == "hours") "" else " or DATE"}, " +
          s"'${spec.column}' is ${dt.sql}")
    }
  }

  // ---- write-side expression ------------------------------------------

  /** Floor division as a Column, EXACT over the full long range —
    * `Math.floorDiv` semantics, matching the driver-side mirrors and
    * the DSv2 PartTagger bit for bit. A double-division floor would be
    * wrong past 2^53 (epoch micros reach 2.5e17 at the common
    * 9999-12-31 sentinel: a row one microsecond before a day boundary
    * could round INTO the next partition, breaking the file-envelope
    * invariant that pruning and metadata-only drops rely on). pmod's
    * non-negative remainder makes the subtraction land exactly on a
    * multiple of b, and SQL `div` (IntegralDivide) is exact long
    * arithmetic — both codegen'd, no UDF. */
  private def fdiv(a: Column, b: Long): Column =
    call_function("div", a - pmod(a, lit(b)), lit(b)).cast("long")

  /** Civil (proleptic-Gregorian) year/month from epoch days, as pure
    * integer Column arithmetic — Hinnant's civil_from_days. Returns
    * (year, month 1-12). */
  private def civil(d: Column): (Column, Column) = {
    val z = d + lit(719468L)
    val era = fdiv(z, 146097L)
    val doe = z - era * lit(146097L) // [0, 146096]
    val yoe = fdiv(
      doe - fdiv(doe, 1460L) + fdiv(doe, 36524L) - fdiv(doe, 146096L),
      365L) // [0, 399]
    val y0 = yoe + era * lit(400L)
    val doy = doe - (lit(365L) * yoe + fdiv(yoe, 4L) - fdiv(yoe, 100L))
    val mp = fdiv(lit(5L) * doy + lit(2L), 153L) // [0, 11]
    val m = mp + when(mp < 10, lit(3L)).otherwise(lit(-9L)) // [1, 12]
    val y = y0 + when(m <= 2, lit(1L)).otherwise(lit(0L))
    (y, m)
  }

  /** The row's partition value for `spec` — NULL when the source value
    * is NULL (such rows land under a `part-null/` segment and are never
    * partition-pruned or partition-dropped). */
  def partExpr(spec: Spec, dt: DataType): Column = {
    val c = col(s"`${spec.column}`")
    val epochDays: Column = dt match {
      case TimestampType => fdiv(unix_micros(c), 86400000000L)
      case DateType => datediff(c, to_date(lit("1970-01-01")))
        .cast("long")
      case other => throw new IllegalArgumentException(
        s"partition transform ${spec.render} over ${other.sql}")
    }
    spec.fn match {
      case "hours" => fdiv(unix_micros(c), 3600000000L)
      case "days" => epochDays
      case "months" =>
        val (y, m) = civil(epochDays)
        (y - lit(1970L)) * lit(12L) + (m - lit(1L))
      case "years" => civil(epochDays)._1 - lit(1970L)
    }
  }

  // ---- driver-side mirrors (exact inverses, java.time in UTC) ---------

  /** Partition value of an instant (epoch micros) under `fn`. */
  def valueOfMicros(fn: String, micros: Long): Long = fn match {
    case "hours" => Math.floorDiv(micros, 3600000000L)
    case "days" => Math.floorDiv(micros, 86400000000L)
    case "months" =>
      val ld = LocalDate.ofEpochDay(Math.floorDiv(micros, 86400000000L))
      (ld.getYear - 1970).toLong * 12 + (ld.getMonthValue - 1)
    case "years" =>
      LocalDate.ofEpochDay(Math.floorDiv(micros, 86400000000L))
        .getYear.toLong - 1970
  }

  /** Partition value of an epoch day (DATE source) under `fn`. */
  def valueOfEpochDay(fn: String, day: Long): Long = fn match {
    case "days" => day
    case "months" =>
      val ld = LocalDate.ofEpochDay(day)
      (ld.getYear - 1970).toLong * 12 + (ld.getMonthValue - 1)
    case "years" => LocalDate.ofEpochDay(day).getYear.toLong - 1970
    case other => throw new IllegalArgumentException(
      s"transform $other undefined over DATE")
  }

  /** The [start, end) instant range (epoch micros) of partition `p`. */
  def rangeMicros(fn: String, p: Long): (Long, Long) = fn match {
    case "hours" => (p * 3600000000L, (p + 1) * 3600000000L)
    case "days" => (p * 86400000000L, (p + 1) * 86400000000L)
    case "months" =>
      val start = LocalDate.of(1970 + Math.floorDiv(p, 12L).toInt,
        Math.floorMod(p, 12L).toInt + 1, 1)
      (start.toEpochDay * 86400000000L,
        start.plusMonths(1).toEpochDay * 86400000000L)
    case "years" =>
      val start = LocalDate.of(1970 + p.toInt, 1, 1)
      (start.toEpochDay * 86400000000L,
        start.plusYears(1).toEpochDay * 86400000000L)
  }

  /** The [start, end) epoch-day range of partition `p` (DATE source). */
  def rangeEpochDays(fn: String, p: Long): (Long, Long) = fn match {
    case "days" => (p, p + 1)
    case "months" =>
      val start = LocalDate.of(1970 + Math.floorDiv(p, 12L).toInt,
        Math.floorMod(p, 12L).toInt + 1, 1)
      (start.toEpochDay, start.plusMonths(1).toEpochDay)
    case "years" =>
      val start = LocalDate.of(1970 + p.toInt, 1, 1)
      (start.toEpochDay, start.plusYears(1).toEpochDay)
    case other => throw new IllegalArgumentException(
      s"transform $other undefined over DATE")
  }

  // ---- per-file value from the staged path ------------------------------

  // Anchored to the CANONICAL suffix: the partition segment sits exactly
  // between `files/<uuid>/` and the bucket dir (`files/<uuid>/part-<v>/
  // bucket-<b>/<name>`). A bare `/part-<digits>/` match anywhere would
  // also fire on a clone's `../../…` cross-table prefix traversing a
  // user directory literally named `part-<n>`, mis-attributing
  // unpartitioned shared files to partition n (wrong prune / wrong
  // metadata drop). `relKey` strips any cross-table prefix first.
  private val RelPart = "files/[^/]+/part-(-?\\d+)/[^/]+/[^/]+$".r
  private val RelPartNull = "files/[^/]+/part-null/[^/]+/[^/]+$".r

  /** The file's partition value, parsed from its `part-<v>/` path
    * segment. None for pre-partitioning files and `part-null/` files —
    * both are kept by every partition prune and skipped by every
    * partition-metadata drop (over-keep, never wrong). */
  def partOfRel(rel: String): Option[Long] =
    RelPart.findFirstMatchIn(DeletionVectors.relKey(rel))
      .map(_.group(1).toLong)

  /** True when `rel` carries ANY partition segment (valued or null) —
    * the staged-layout marker specs assert on. */
  def hasPartSegment(rel: String): Boolean =
    partOfRel(rel).isDefined ||
      RelPartNull.findFirstIn(DeletionVectors.relKey(rel)).isDefined

  // ---- typed envelopes for the pruning / coverage kernels ---------------

  /** The partition's inclusive (lo, hi) envelope in the RUNTIME CLASS of
    * the predicate value `v`, so [[TxTable.cmpAny]] compares natively.
    * None when `v`'s class is not a recognized datetime external type —
    * callers must then keep the file (over-keep). The envelope brackets
    * every possible row value in the partition: lo = range start,
    * hi = range end minus one micro/day. */
  def envelopeLike(fn: String, p: Long, v: Any): Option[(Any, Any)] = {
    def ofMicros(m: Long): Any = v match {
      case _: java.sql.Timestamp =>
        java.sql.Timestamp.from(Instant.ofEpochSecond(
          Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L))
      case _: Instant => Instant.ofEpochSecond(
        Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L)
      case _ => null
    }
    def ofDay(d: Long): Any = v match {
      case _: java.sql.Date =>
        java.sql.Date.valueOf(LocalDate.ofEpochDay(d))
      case _: LocalDate => LocalDate.ofEpochDay(d)
      case _ => null
    }
    v match {
      case _: java.sql.Timestamp | _: Instant =>
        val (s, e) = rangeMicros(fn, p)
        Some((ofMicros(s), ofMicros(e - 1L)))
      case _: java.sql.Date | _: LocalDate =>
        // date column: partition values/ranges are in epoch days
        val (s, e) = rangeEpochDays(fn, p)
        Some((ofDay(s), ofDay(e - 1L)))
      case _ => None
    }
  }

  /** Epoch offset used by specs/demos to render a partition value back
    * into a human date (days transform only). */
  def dayToDate(p: Long): LocalDate = LocalDate.ofEpochDay(p)

  /** Executor-side row tagger for the DSv2 task writers: resolves the
    * source column's ordinal once, then maps each InternalRow to its
    * `part-<v>/` path segment (`part-null/` for NULL sources). The same
    * pure-JVM mirrors as the driver's planning math, so task-written
    * files and Scala-staged files land in identical segments. */
  final case class PartTagger(spec: Spec,
                              ordinal: Int,
                              isDate: Boolean) extends Serializable {
    def segOf(row: org.apache.spark.sql.catalyst.InternalRow): String =
      if (row.isNullAt(ordinal)) "part-null/"
      else if (isDate)
        s"part-${valueOfEpochDay(spec.fn, row.getInt(ordinal).toLong)}/"
      else s"part-${valueOfMicros(spec.fn, row.getLong(ordinal))}/"
  }

  /** Build the tagger binding `spec` (column name must be in the WRITE
    * schema's namespace — callers map physical→logical for DSv2 query
    * schemas). Throws when the write schema omits the source column
    * (placement would be undefined). */
  def taggerFor(spec: Spec,
                writeSchema: org.apache.spark.sql.types.StructType)
      : PartTagger = {
    val i = scala.util.Try(writeSchema.fieldIndex(spec.column))
      .getOrElse(throw new IllegalArgumentException(
        s"write omits the hidden-partition source column " +
          s"'${spec.column}' (${spec.render})"))
    writeSchema.fields(i).dataType match {
      case TimestampType => PartTagger(spec, i, isDate = false)
      case DateType => PartTagger(spec, i, isDate = true)
      case dt => throw new IllegalArgumentException(
        s"partition source '${spec.column}' arrives as ${dt.sql}")
    }
  }

  private[graft] val UTC: ZoneOffset = ZoneOffset.UTC
}
