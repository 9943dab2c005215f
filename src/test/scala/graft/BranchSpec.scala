package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TxTable

/** Branch refs on the commit log (the Iceberg branching model): a branch
  * forks from a pinned main version, accumulates its own CAS-published
  * delta commits (never occupying main version numbers), reads via
  * `@branch.<name>`, takes appends (Scala + SQL INSERT), publishes onto
  * main as ONE fast-forward commit (refusing when main diverged), and is
  * vacuum-protected until published or dropped. WAP is the one-staged-
  * commit special case of this. */
class BranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registered[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.txbr",
      classOf[graft.sources.TxTableCatalog].getName)
    try body
    finally spark.conf.unset("spark.sql.catalog.txbr")
  }

  private def fresh(): String = {
    val t = Files.createTempDirectory("graft_br_").toString + "/t"
    TxTable.init(spark, t,
      (1 to 32).map(i => (s"K$i", i.toLong)).toDF("k", "v"), "k", 4)
    t
  }

  test("branch writes are invisible on main; @branch reads serve base+deltas; publish is ONE commit") {
    registered {
      val t = fresh()
      val base = spark.sql(s"CALL txbr.create_branch('$t', 'dev')")
        .as[Long].head()
      assert(base == TxTable.snapshot(spark, t).version)
      // Scala append + SQL INSERT both land branch deltas
      assert(TxTable.appendToBranch(spark, t, "dev",
        Seq(("B1", 101L)).toDF("k", "v")) == 1)
      spark.sql(s"INSERT INTO txbr.`$t@branch.dev` VALUES ('B2', 102L)")
      // invisible on main — no new main version, no new rows
      assert(TxTable.snapshot(spark, t).version == base)
      assert(spark.table(s"txbr.`$t`").count() == 32)
      // the branch read serves base + both branch commits
      val br = spark.table(s"txbr.`$t@branch.dev`")
      assert(br.count() == 34)
      assert(br.where($"k".isin("B1", "B2")).count() == 2)
      // branch is append-only: row-level mutation refuses
      intercept[Exception] {
        spark.sql(s"DELETE FROM txbr.`$t@branch.dev` WHERE k = 'B1'")
      }
      // fast-forward publish: ONE main commit with the net delta
      val pub = spark.sql(s"CALL txbr.publish_branch('$t', 'dev')")
        .as[Long].head()
      assert(pub == base + 1, "publish must be exactly one commit")
      assert(spark.table(s"txbr.`$t`").count() == 34)
      assert(TxTable.branches(spark, t).isEmpty, "the ref releases")
      // the published commit carries the exactly-once branch stamp
      val changed = TxTable.changesBetween(spark, t, base, pub)
      assert(changed.filter($"_change_type" === "insert").count() == 2)
    }
  }

  test("diverged branch publish refuses loudly; the branch stays readable") {
    registered {
      val t = fresh()
      TxTable.createBranch(spark, t, "exp")
      TxTable.appendToBranch(spark, t, "exp",
        Seq(("X1", 900L)).toDF("k", "v"))
      // main moves past the base
      TxTable.appendOnce(spark, t, Seq(("M1", 500L)).toDF("k", "v"),
        "k", 4, "br-spec", 1L)
      val e = intercept[IllegalStateException] {
        TxTable.publishBranch(spark, t, "exp")
      }
      assert(e.getMessage.contains("DIVERGED"))
      // nothing was lost: the branch still reads (base + its delta,
      // WITHOUT main's divergent append)
      val br = spark.table(s"txbr.`$t@branch.exp`")
      assert(br.count() == 33)
      assert(br.where($"k" === "M1").count() == 0)
      assert(TxTable.dropBranch(spark, t, "exp") == 1)
    }
  }

  test("vacuum protects the branch closure: base version pinned, staged files unswept; drop releases them") {
    registered {
      val t = fresh()
      val base = TxTable.createBranch(spark, t, "hold")
      TxTable.appendToBranch(spark, t, "hold",
        Seq(("H1", 700L)).toDF("k", "v"))
      // advance main several commits so the base falls below keep=1
      (1 to 3).foreach(i => TxTable.appendOnce(spark, t,
        Seq((s"M$i", i * 10L)).toDF("k", "v"), "k", 4, "br-vac", i.toLong))
      val swept = TxTable.vacuum(spark, t, keepVersions = 1,
        orphanRetentionMs = 0L)
      // the branch's staged directory survived the orphan sweep and the
      // base version survived manifest pruning — the branch still reads
      val br = spark.table(s"txbr.`$t@branch.hold`")
      assert(br.where($"k" === "H1").count() == 1)
      assert(br.count() == 33)
      assert(TxTable.snapshot(spark, t, Some(base)).version == base)
      // dropping the branch releases everything to the next sweep
      TxTable.dropBranch(spark, t, "hold")
      val swept2 = TxTable.vacuum(spark, t, keepVersions = 1,
        orphanRetentionMs = 0L)
      assert(swept2.size > swept.size ||
        (swept2.nonEmpty && swept.isEmpty),
        s"the dropped branch's files must sweep (before=${swept.size}, " +
          s"after=${swept2.size})")
      intercept[Exception] { TxTable.branchSnapshot(spark, t, "hold") }
    }
  }

  test("concurrent branch appends CAS-race safely: both land, neither is lost") {
    registered {
      val t = fresh()
      TxTable.createBranch(spark, t, "race")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = (1 to 4).map { i =>
        Future {
          TxTable.appendToBranch(spark, t, "race",
            Seq((s"R$i", i * 100L)).toDF("k", "v"))
        }
      }
      val ks = Await.result(Future.sequence(fs), 120.seconds)
      assert(ks.sorted == Seq(1, 2, 3, 4),
        s"four racing appends must land as four distinct branch commits, got $ks")
      val br = spark.table(s"txbr.`$t@branch.race`")
      assert(br.where($"k".startsWith("R")).count() == 4,
        "no racing append may be lost")
      // the whole race publishes as ONE main commit
      val v = TxTable.publishBranch(spark, t, "race")
      assert(v == 1L)
      assert(spark.table(s"txbr.`$t`").count() == 36)
    }
  }

  test("append racing a publish is never silently lost: it lands on main or fails loudly") {
    registered {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      // the race window is the publisher's fence (marker -> freeze ->
      // commit -> drop); iterate so both interleavings actually occur
      (1 to 8).foreach { i =>
        val t = fresh()
        TxTable.createBranch(spark, t, "pub")
        TxTable.appendToBranch(spark, t, "pub",
          Seq((s"BASE$i", 1L)).toDF("k", "v"))
        val fPub = Future {
          scala.util.Try(TxTable.publishBranch(spark, t, "pub"))
        }
        val fApp = Future {
          scala.util.Try(TxTable.appendToBranch(spark, t, "pub",
            Seq((s"RACE$i", 2L)).toDF("k", "v")))
        }
        val (pub, app) = (Await.result(fPub, 120.seconds),
          Await.result(fApp, 120.seconds))
        val main = spark.table(s"txbr.`$t`")
        val raceOnMain = main.where($"k" === s"RACE$i").count()
        if (pub.isSuccess) {
          assert(main.where($"k" === s"BASE$i").count() == 1,
            "the frozen branch delta must land on main")
          app match {
            case scala.util.Success(_) =>
              assert(raceOnMain == 1,
                s"iter $i: append reported success but its rows are " +
                  "nowhere (silent loss)")
            case scala.util.Failure(e) =>
              assert(raceOnMain == 0,
                s"iter $i: append failed loudly but its rows leaked " +
                  "onto main")
              assert(e.getMessage.contains("publish") ||
                  e.getMessage.contains("no branch named"),
                s"iter $i: refusal must name the racing publish: $e")
          }
        } else {
          // publish refused (it cannot here — only an env hiccup);
          // then the branch must still be intact with every append
          assert(app.isSuccess &&
            spark.table(s"txbr.`$t@branch.pub`")
              .where($"k" === s"RACE$i").count() == 1)
        }
      }
    }
  }

  test("publish fence: appends refuse while the marker is up; abortBranchPublish recovers a crashed publisher") {
    registered {
      val t = fresh()
      TxTable.createBranch(spark, t, "fenced")
      TxTable.appendToBranch(spark, t, "fenced",
        Seq(("F1", 1L)).toDF("k", "v"))
      // simulate a publisher that crashed between its two fence writes:
      // marker up, no frozen count
      val log = new org.apache.hadoop.fs.Path(t, "_txlog/branch-fenced.publish")
      val fs = log.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(log, false); out.write("publishing\n".getBytes); out.close()
      val e = intercept[Exception] {
        TxTable.appendToBranch(spark, t, "fenced",
          Seq(("F2", 2L)).toDF("k", "v"))
      }
      assert(e.getMessage.contains("publish"))
      // no txn landed -> abort clears the fence and appends flow again
      TxTable.abortBranchPublish(spark, t, "fenced")
      TxTable.appendToBranch(spark, t, "fenced",
        Seq(("F3", 3L)).toDF("k", "v"))
      assert(spark.table(s"txbr.`$t@branch.fenced`")
        .where($"k".startsWith("F")).count() == 2)
      TxTable.publishBranch(spark, t, "fenced")
      assert(spark.table(s"txbr.`$t`")
        .where($"k".startsWith("F")).count() == 2)
      // a re-created branch name starts with a clean chain (no strays)
      TxTable.createBranch(spark, t, "fenced")
      assert(TxTable.appendToBranch(spark, t, "fenced",
        Seq(("F4", 4L)).toDF("k", "v")) == 1)
      TxTable.dropBranch(spark, t, "fenced")
    }
  }

  test("createBranch('a') never touches live sibling branch 'a.dev' (dotted names share a raw prefix)") {
    registered {
      val t = fresh()
      // 'a.dev' is live with one unpublished delta; its refs
      // 'branch-a.dev.base' / 'branch-a.dev.d1' both start with the raw
      // prefix 'branch-a.d' that createBranch('a')'s stray cleanup scans
      TxTable.createBranch(spark, t, "a.dev")
      assert(TxTable.appendToBranch(spark, t, "a.dev",
        Seq(("AD1", 201L)).toDF("k", "v")) == 1)
      TxTable.createBranch(spark, t, "a")
      // the sibling's base AND delta chain must both survive
      assert(TxTable.branches(spark, t).keySet == Set("a", "a.dev"))
      assert(spark.table(s"txbr.`$t@branch.a.dev`")
        .where($"k" === "AD1").count() == 1,
        "branch a.dev lost its unpublished delta to createBranch('a')")
      // and both branches stay independently appendable + publishable
      TxTable.appendToBranch(spark, t, "a", Seq(("A1", 301L)).toDF("k", "v"))
      TxTable.publishBranch(spark, t, "a.dev")
      assert(spark.table(s"txbr.`$t`").where($"k" === "AD1").count() == 1)
      TxTable.dropBranch(spark, t, "a")
    }
  }

  test("arbitration after a completed publish: a delta the publish CARRIED succeeds instead of false-failing (no double-apply invite)") {
    registered {
      val t = fresh()
      val base = TxTable.createBranch(spark, t, "dev")
      TxTable.appendToBranch(spark, t, "dev", Seq(("D1", 1L)).toDF("k", "v"))
      TxTable.appendToBranch(spark, t, "dev", Seq(("D2", 2L)).toDF("k", "v"))
      // the publish freezes at d=2, commits txn branch:dev:<base> with
      // epoch 2, and drops every branch ref — exactly the state a racing
      // appender sees when it arbitrates AFTER the publish finished
      TxTable.publishBranch(spark, t, "dev")
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // delta 2 was inside the frozen prefix: its rows ARE on main, so
      // arbitration must return success (a failure here tells the caller
      // "retry on main" and double-applies the rows)
      TxTable.arbitrateAppendVsPublish(fs, t, "dev", base, 2)
      assert(spark.table(s"txbr.`$t`")
        .where($"k".isin("D1", "D2")).count() == 2)
      // a delta PAST the frozen count did not land: still fails loudly
      val e = intercept[IllegalStateException] {
        TxTable.arbitrateAppendVsPublish(fs, t, "dev", base, 3)
      }
      assert(e.getMessage.contains("NOT included"))
      // and a publish from a DIFFERENT base proves nothing for this one
      val e2 = intercept[IllegalStateException] {
        TxTable.arbitrateAppendVsPublish(fs, t, "dev", base + 7, 1)
      }
      assert(e2.getMessage.contains("NOT included"))
    }
  }

  test("branch appends enforce constraints and union-evolve schema; duplicate branch names refuse") {
    registered {
      val t = fresh()
      spark.sql(s"ALTER TABLE txbr.`$t` ADD CONSTRAINT v_pos CHECK (v > 0)")
      TxTable.createBranch(spark, t, "dev")
      intercept[Exception] { TxTable.createBranch(spark, t, "dev") }
      intercept[Exception] {
        TxTable.appendToBranch(spark, t, "dev",
          Seq(("BAD", -1L)).toDF("k", "v"))
      }
      // schema union-evolution on the branch only — main stays narrow
      TxTable.appendToBranch(spark, t, "dev",
        Seq(("E1", 5L, "extra")).toDF("k", "v", "note"))
      assert(spark.table(s"txbr.`$t@branch.dev`").columns.contains("note"))
      assert(!spark.table(s"txbr.`$t`").columns.contains("note"))
      // publish carries the evolved schema onto main
      TxTable.publishBranch(spark, t, "dev")
      assert(spark.table(s"txbr.`$t`").columns.contains("note"))
      assert(spark.table(s"txbr.`$t`").where($"k" === "K1")
        .select($"note").head().isNullAt(0))
    }
  }
}
