package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.ops.{PartitionTransforms, TxTable}

/** Per-file pruning verdicts, shared verbatim by the driver-side walk and
  * the distributed planning job — ONE implementation so the two paths
  * cannot drift (the parity the Iceberg distributed-planning design
  * hinges on). Each verdict answers "may this file hold a matching row?"
  * from the file's own evidence (zone-map row, partition path, bloom,
  * bucket id) plus a tiny per-query context; every unknown keeps the
  * file (over-keep, never wrong). */
private[graft] object TxPruneVerdicts extends Serializable {

  /** One range bound: (lower value + strict?, upper value + strict?). */
  type Bound = (Option[(Any, Boolean)], Option[(Any, Boolean)])

  /** Zone-map verdict: `stat` is the file's (lo, hi) sidecar row (None =
    * file unknown to the sidecar → keep; both null = an ALL-NULL file,
    * which cannot satisfy a range predicate → drop; half-null → keep).
    * Incomparable types keep. */
  def zoneKeep(stat: Option[(Any, Any)], bs: Seq[Bound]): Boolean =
    stat match {
      case Some((l, h)) if l != null && h != null =>
        bs.forall { case (lo, hi) =>
          Try {
            lo.forall { case (v, strict) =>
              val c = TxTable.cmpAny(h, v)
              if (strict) c > 0 else c >= 0
            } && hi.forall { case (v, strict) =>
              val c = TxTable.cmpAny(l, v)
              if (strict) c < 0 else c <= 0
            }
          }.getOrElse(true)
        }
      case Some((l, h)) if l == null && h == null => false
      case _ => true
    }

  /** Hidden-partition envelope verdict over the file's OWN generation's
    * spec (history + `spec-<sid>/` stamp). Pre-partitioning files, null
    * segments, and unknown sids keep. */
  def envelopeKeep(rel: String,
                   hist: IndexedSeq[PartitionTransforms.Spec],
                   bs: Seq[(String, Bound)],
                   pe: Seq[(String, Seq[Any])]): Boolean =
    PartitionTransforms.resolve(rel, hist) match {
      case Some(res) =>
        bs.forall { case (c, (lo, hi)) =>
          Try {
            val v = lo.orElse(hi).get._1
            PartitionTransforms.envelopeFor(res, c, v) match {
              case Some((envLo, envHi)) =>
                lo.forall { case (x, strict) =>
                  val cc = TxTable.cmpAny(envHi, x)
                  if (strict) cc > 0 else cc >= 0
                } && hi.forall { case (x, strict) =>
                  val cc = TxTable.cmpAny(envLo, x)
                  if (strict) cc < 0 else cc <= 0
                }
              case None => true
            }
          }.getOrElse(true)
        } && pe.forall { case (c, vs) =>
          // IN / = over a partition source: keep iff ANY probed value
          // lands inside the envelope
          Try {
            vs.exists { v =>
              PartitionTransforms.envelopeFor(res, c, v) match {
                case Some((envLo, envHi)) =>
                  TxTable.cmpAny(v, envLo) >= 0 &&
                    TxTable.cmpAny(v, envHi) <= 0
                case None => true
              }
            }
          }.getOrElse(true)
        }
      case None => true
    }

  /** Bloom verdict: keep iff the filter might contain ANY probed hash.
    * A false positive only over-keeps. */
  def bloomKeep(bloom: org.apache.spark.util.sketch.BloomFilter,
                hashes: Seq[Long]): Boolean =
    hashes.exists(bloom.mightContainLong)
}

/** Read-side fold of UNFOLDED equality deletes for the DSv2 scan path:
  * the write path committed KEY TUPLES (zero reads); a columnar catalog
  * scan cannot anti-join inside the stock parquet reader, so at PLAN
  * time the matching rows' PHYSICAL POSITIONS are computed once (one
  * key-column-pruned Spark job over exactly the affected files — the
  * read half of the MOR contract) and ride the existing per-partition
  * deletion-vector machinery (bitmap payloads, row-based degraded
  * reads, position-exact synthesis). Memoized per (table, version) —
  * a snapshot's registry is immutable, and commitNext GCs entries as
  * rewrites fold them, so the steady state pays nothing. */
private[sources] object TxEqFold {
  import org.roaringbitmap.RoaringBitmap

  import graft.ops.DeletionVectors

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long),
        Map[String, (String, Array[Byte])]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long),
            Map[String, (String, Array[Byte])]]): Boolean = size() > 64
    })

  /** Per-MANIFEST-rel (cache key, serialized bitmap) of the rows the
    * snapshot's registry kills — empty when the registry is. */
  def bitmapsFor(spark: SparkSession, path: String,
                 snap: TxTable.Snapshot)
      : Map[String, (String, Array[Byte])] = {
    val dels = TxTable.parseEqDeletes(snap.props)
    if (dels.isEmpty) return Map.empty
    val key = (path, snap.version)
    val hit = cache.get(key)
    if (hit != null) return hit
    val affected = snap.entries.filter(e =>
      dels.exists(d => e.addV.forall(_ < d.version)))
    val out: Map[String, (String, Array[Byte])] =
      if (affected.isEmpty) Map.empty
      else {
        val physSchema = snap.schema.getOrElse(
          throw new IllegalStateException(
            s"$path: equality deletes need a recorded schema"))
        val needCols = dels.flatMap(_.cols).distinct.toSet
        val readSchema = org.apache.spark.sql.types.StructType(
          physSchema.fields.filter(f => needCols.contains(f.name)))
        val raw = DeletionVectors.entriesFrame(spark, path, affected,
            Some(readSchema))
          .withColumn("__rk", org.apache.spark.sql.functions
            .regexp_extract(org.apache.spark.sql.functions
              .input_file_name(), DeletionVectors.RelPattern, 0))
          .withColumn("__pos", col("_metadata.row_index"))
        val addvDf = spark.createDataFrame(affected.map(e =>
            (DeletionVectors.relKey(e.rel), e.addV.getOrElse(
              throw new IllegalStateException(
                s"$path: ${e.rel} unstamped under a live equality " +
                  "delete")))))
          .toDF("__rk2", "__addv")
        val joined = raw.join(
          org.apache.spark.sql.functions.broadcast(addvDf),
          col("__rk") === col("__rk2"), "left")
        val markedDf = dels.groupBy(_.cols).toSeq
          .sortBy(_._1.mkString(",")).map { case (cols, ds) =>
            val keysDf = ds.map(d =>
                spark.read.parquet(s"$path/${d.rel}")
                  .withColumn("__delv", lit(d.version)))
              .reduce(_.unionByName(_))
            val cond = cols.map(c => joined(c) === keysDf(c))
              .reduce(_ && _) && col("__addv") < keysDf("__delv")
            // same key-budgeted strategy switch as the Scala read path:
            // forced broadcast only while the group's known key count
            // fits spark.graft.eqdelete.broadcastKeyLimit; past it AQE
            // picks the join, so a huge backlog shuffles instead of
            // OOMing the driver at plan time
            joined.join(
              TxTable.eqMaybeBroadcast(spark, keysDf,
                TxTable.eqKnownKeys(ds)), cond,
              "left_semi").select(col("__rk"), col("__pos"))
          }.reduce(_.union(_)).distinct()
        // the fold rides DRIVER memory as per-file bitmaps, and ONE
        // low-cardinality key can address unboundedly many rows — so
        // the position count (a cheap distributed aggregate) gates the
        // collect: past the bound the scan refuses LOUDLY toward the
        // maintenance verb instead of OOMing the driver. The Scala
        // read path (a pure anti-join, nothing collected) keeps
        // serving any backlog size
        val maxPos = scala.util.Try(spark.conf
          .get(TxTable.EqMaxFoldPositionsConf).toLong)
          .getOrElse(TxTable.DefaultEqMaxFoldPositions)
        // ONE bounded materialization gates AND feeds the fold: take
        // maxPos+1 rows — overflow proves the registry addresses more
        // positions than the driver may hold, without running the
        // position pipeline twice (the count-then-collect double pass)
        // or ever collecting more than the bound. executeTake stops
        // scheduling partitions once the limit is met, and its final
        // stage reuses the distinct's shuffle output, so upstream work
        // runs exactly once either way.
        val limit = (math.min(maxPos, Int.MaxValue - 2L) + 1).toInt
        val limited = markedDf.limit(limit).collect()
        if (limited.length >= limit) throw new IllegalStateException(
          s"$path: the unfolded equality-delete registry addresses " +
            s"more than $maxPos row positions — past the " +
            s"${TxTable.EqMaxFoldPositionsConf} bound the plan-time " +
            "position fold would exhaust driver memory. Run " +
            "foldEqDeletes()/CALL fold_eq_deletes (or auto_maintain) " +
            "first, or read through the Scala path (TxTable.read), " +
            "which anti-joins without collecting")
        val marked = limited.map(r => (r.getString(0), r.getLong(1)))
        val relByKey = affected.map(e =>
          DeletionVectors.relKey(e.rel) -> e.rel).toMap
        marked.groupBy(_._1).flatMap { case (rk, ps) =>
          relByKey.get(rk).map { rel =>
            val bm = new RoaringBitmap()
            ps.foreach { case (_, p) =>
              require(p <= DeletionVectors.MaxPos,
                s"$path: position $p exceeds the bitmap domain")
              bm.add(p.toInt)
            }
            rel -> ((s"eqfold#$path@${snap.version}#$rel",
              DeletionVectors.serialize(bm)))
          }
        }
      }
    cache.put(key, out)
    out
  }

  /** Merge a file's DV payload with its eq-fold payload (bitmap OR);
    * content-addressed composite key so the executor bitmap cache can
    * never serve a half-merged entry. */
  def merge(dv: Option[(String, Array[Byte])],
            eq: Option[(String, Array[Byte])])
      : Option[(String, Array[Byte])] = (dv, eq) match {
    case (Some((k1, b1)), Some((k2, b2))) =>
      val m = RoaringBitmap.or(DeletionVectors.deserialize(b1),
        DeletionVectors.deserialize(b2))
      Some((s"$k1+$k2", DeletionVectors.serialize(m)))
    case (d, e) => d.orElse(e)
  }
}

/** Distributed scan planning (the public Iceberg idea): past a
  * file-count threshold the per-file pruning verdicts evaluate as a
  * SPARK JOB over the manifest's entry set instead of a driver-side
  * O(files) walk — the driver ships only the tiny per-query context
  * (bounds, probe hashes, spec history), executors read the zone-map /
  * bloom sidecars directly (never collected into driver maps) and join
  * them to the entries on `rel`, and only the KEPT rels return to the
  * driver. At 10⁸ files the driver's planning work drops from "compare
  * every file against every bound, after collecting every sidecar row"
  * to "serialize the entry list + receive the survivors".
  *
  * Engaged when `snap.entries.size >= spark.graft.planning.distributeAt`
  * (default 100000 — sandbox-scale tables never pay the job-scheduling
  * overhead; a 100 TB table's scans always amortize it). The verdicts
  * themselves are [[TxPruneVerdicts]] — the same functions the driver
  * walk calls — so the two paths cannot diverge on semantics, and the
  * parity spec pins equality of the kept set file for file. */
private[graft] object TxDistributedPrune {

  val DistributeAtConf = "spark.graft.planning.distributeAt"
  val DefaultDistributeAt = 100000

  /** Spec-observable engagement counter. */
  val runs = new java.util.concurrent.atomic.AtomicLong(0)

  def threshold(spark: SparkSession): Int =
    Try(spark.conf.get(DistributeAtConf).toInt)
      .getOrElse(DefaultDistributeAt)

  /** Zone-map stage context: all range bounds over one sidecar-profiled
    * column. */
  final case class ZoneStage(column: String,
                             bs: Seq[TxPruneVerdicts.Bound])

  /** Bloom stage context: pre-hashed probe values for one
    * bloom-profiled column. */
  final case class BloomStage(column: String, hashes: Seq[Long])

  /** Partition-envelope stage context (empty hist ⇒ stage inactive). */
  final case class EnvStage(hist: IndexedSeq[PartitionTransforms.Spec],
                            bs: Seq[(String, TxPruneVerdicts.Bound)],
                            pe: Seq[(String, Seq[Any])])

  /** Evaluate all stages as one Spark job; returns the kept rels. */
  def run(spark: SparkSession, path: String,
          entries: Seq[TxTable.FileEntry],
          zones: Seq[ZoneStage], env: Option[EnvStage],
          blooms: Seq[BloomStage],
          bucketSets: Seq[Set[Int]]): Set[String] = {
    import spark.implicits._
    val df = entries.map(e => (e.rel, e.bucket)).toDF("__rel", "__bucket")
    evaluate(spark, path, df, zones, env, blooms, bucketSets)
      .select(col("__rel")).as[String].collect().toSet
  }

  /** [[run]] for a SHARD-BACKED snapshot (round-14 ask #2): the entry
    * lines parse EXECUTOR-side straight from the checkpoint's shard
    * files — the driver ships only shard paths + the O(interval) net
    * delta changes, and receives back the SURVIVORS as full entries.
    * At 10⁸ files the driver's planning memory drops from "every
    * FileEntry" to "the kept set". */
  def runSharded(spark: SparkSession, path: String,
                 le: TxTable.LazyEntries,
                 zones: Seq[ZoneStage], env: Option[EnvStage],
                 blooms: Seq[BloomStage],
                 bucketSets: Seq[Set[Int]]): Seq[TxTable.FileEntry] = {
    import spark.implicits._
    val sh = le.shards
    // removes are versioned (see ShardedEntries): a rel is dead in a
    // shard only when some removal is NEWER than the shard file's
    // name-encoded write version — a re-added incarnation living in a
    // later shard survives the @rm that killed its predecessor
    val rmMax = TxTable.rmMaxOf(sh.removes)
    val shardDf = spark.read
      .text(TxTable.shardFilePaths(sh): _*)
      .select(org.apache.spark.sql.functions.input_file_name().as("__f"),
        col("value").as("__l"))
      .as[(String, String)]
      .filter(_._2.nonEmpty)
      .map { case (f, line) =>
        val e = TxTable.parseEntryLine(line)
        val shardV = TxTable.shardVersionOf(
          f.substring(f.lastIndexOf('/') + 1))
        (e.rel, e.bucket, line, shardV)
      }
      .filter(r => !rmMax.get(r._1).exists(_ > r._4))
      .map(r => (r._1, r._2, r._3))
    val addDf = spark.createDataset(
      sh.adds.map(e => (e.rel, e.bucket, TxTable.renderEntryLine(e))))
    val entryDf = shardDf.union(addDf).toDF("__rel", "__bucket", "__line")
    evaluate(spark, path, entryDf, zones, env, blooms, bucketSets)
      .select(col("__line")).as[String].collect()
      .map(TxTable.parseEntryLine(_)).toSeq
      .sortBy(e => (e.bucket, e.rel))
  }

  /** The shared verdict pipeline behind [[run]] and [[runSharded]]:
    * sidecar joins + one mapPartitions filter over whatever entry frame
    * the caller built. Extra input columns (the sharded path's `__line`)
    * pass through untouched. */
  private def evaluate(spark: SparkSession, path: String,
                       entryDf: DataFrame,
                       zones: Seq[ZoneStage], env: Option[EnvStage],
                       blooms: Seq[BloomStage],
                       bucketSets: Seq[Set[Int]]): DataFrame = {
    runs.incrementAndGet()
    var df = entryDf
    // one left join per sidecar-profiled column: the sidecar parquet is
    // read DISTRIBUTED (rel, lo, hi / rel, bloom) — duplicates from
    // racing refresh appends carry identical values by construction
    // (immutable files, deterministic footers), so an arbitrary
    // dropDuplicates pick matches the driver path's preference dedup
    zones.zipWithIndex.foreach { case (z, i) =>
      val sp = TxTable.statsPath(path, z.column).toString
      val s = spark.read.parquet(sp)
        .select(col("rel").as(s"__zr$i"), col("lo").as(s"__lo$i"),
          col("hi").as(s"__hi$i"))
        .dropDuplicates(s"__zr$i")
        .withColumn(s"__zs$i", lit(true))
      df = df.join(s, df("__rel") === s(s"__zr$i"), "left")
        .drop(s"__zr$i")
    }
    blooms.zipWithIndex.foreach { case (b, i) =>
      val sp = TxTable.bloomPath(path, b.column).toString
      val s = spark.read.parquet(sp)
        .select(col("rel").as(s"__br$i"), col("bloom").as(s"__bm$i"))
        .dropDuplicates(s"__br$i")
      df = df.join(s, df("__rel") === s(s"__br$i"), "left")
        .drop(s"__br$i")
    }
    val schema = df.schema
    val relIdx = schema.fieldIndex("__rel")
    val bucketIdx = schema.fieldIndex("__bucket")
    val zIdx = zones.indices.map(i => (schema.fieldIndex(s"__lo$i"),
      schema.fieldIndex(s"__hi$i"), schema.fieldIndex(s"__zs$i")))
    val bmIdx = blooms.indices.map(i => schema.fieldIndex(s"__bm$i"))
    val zonesB = zones.map(_.bs)
    val envB = env
    val bloomHashes = blooms.map(_.hashes)
    val bucketsB = bucketSets
    df.mapPartitions { it =>
      it.filter { r =>
        val bucket = r.getInt(bucketIdx)
        val rel = r.getString(relIdx)
        bucketsB.forall(_.contains(bucket)) &&
          zonesB.zip(zIdx).forall { case (bs, (li, hi, si)) =>
            val stat =
              if (r.isNullAt(si)) None else Some((r.get(li), r.get(hi)))
            TxPruneVerdicts.zoneKeep(stat, bs)
          } &&
          envB.forall(e =>
            TxPruneVerdicts.envelopeKeep(rel, e.hist, e.bs, e.pe)) &&
          bloomHashes.zip(bmIdx).forall { case (hs, bi) =>
            r.isNullAt(bi) || TxPruneVerdicts.bloomKeep(
              org.apache.spark.util.sketch.BloomFilter.readFrom(
                r.getAs[Array[Byte]](bi)), hs)
          }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      .toDF()
  }
}
