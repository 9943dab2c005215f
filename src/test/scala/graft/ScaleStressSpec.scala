package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SimilarityOps, TextOps}

/** Plan-stability stress BEYOND the largest shipped fixture (sf0.1 =
  * 5000 docs / 2000 vectors): synthetic ~10× blow-ups generated in-test
  * (the SkewOpsSpec pattern). What these pin is not speed but SHAPE — the
  * failure mode of a 10× scale-up is a silent plan flip (a side crossing
  * the broadcast threshold and degenerating into a nested loop, a bounded
  * window losing its group-limit) that correctness tests at sf0.1 can
  * never catch. Results are checked for well-formedness from the SAME
  * executed query the plan is read from. */
class ScaleStressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("knnJoinLsh at 10x sf0.1 vectors: banded equi-join holds, no nested loop, bounded top-k") {
    val dims = 64
    val n = 20000 // 10x the sf0.1 embeddings fixture
    val rnd = new scala.util.Random(13)
    // clustered mixture (50 centers + noise): realistic non-uniform LSH
    // bucket occupancy, unlike iid-gaussian vectors whose buckets are flat
    val centers = Array.fill(50)(Array.fill(dims)(rnd.nextGaussian().toFloat))
    val rows: Seq[(Long, Array[Float])] = (0 until n).map { i =>
      val c = centers(i % 50)
      (i.toLong, c.map(x => x + (rnd.nextGaussian() * 0.5).toFloat))
    }
    val vectors = rows.toDF("vec_id", "embedding")
    val knn = SimilarityOps.knnJoinLsh(vectors, k = 5)
    val got = knn.select($"query_id", $"rank", $"neighbor_id", $"sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // well-formed: ranks contiguous from 1, sims non-increasing, <= k each
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= 5, s"query $q got ${sorted.length} > k rows")
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"query $q ranks not contiguous")
      assert(sorted.map(_._4).sliding(2).forall(w =>
        w.length < 2 || w(0) >= w(1)), s"query $q sims not sorted")
      assert(sorted.map(_._3).distinct.length == sorted.length,
        s"query $q duplicate neighbors")
    }
    // in a clustered corpus, most queries must actually find neighbors
    assert(got.map(_._1).distinct.length >= n / 2,
      s"only ${got.map(_._1).distinct.length} of $n queries found neighbors")
    val p = knn.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"kNN join degenerated at 10x:\n${p.take(4000)}")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"per-query top-k lost its bounded heap at 10x:\n${p.take(4000)}")
  }

  test("bm25TopDocsForQueries at 10x sf0.1 docs: broadcasts hold, per-query top-k bounded") {
    val nDocs = 50000 // 10x the sf0.1 documents fixture
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "line", "sort", "window",
      "spark", "stream", "order", "data", "column", "join", "small",
      "customer", "query", "big", "filter", "group", "vector", "the", "a")
    val rnd = new scala.util.Random(29)
    val docs: Seq[(Long, String)] = (0 until nDocs).map { i =>
      (i.toLong, (0 until 16).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val docsDf = docs.toDF("doc_id", "text")
    val queries = Seq(
      (1L, "spark stream window"), (2L, "join merge hash"),
      (3L, "vector query filter"), (4L, "customer order data"),
      (5L, "fast scan"), (6L, "slow sort batch"), (7L, "key value table"),
      (8L, "group by column")).toDF("query_id", "query_text")
    val out = TextOps.bm25TopDocsForQueries(docsDf, queries, k = 10,
      nDocsKnown = Some(nDocs.toLong), avgdlKnown = Some(16.0))
    val got = out.select($"query_id", $"rank", $"doc_id", $"score6")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).distinct.length == 8, "every query must rank docs")
    got.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= 10 && sorted.map(_._2).toSeq == (1 to sorted.length),
        s"query $q ranks malformed")
      assert(sorted.map(_._4).sliding(2).forall(w =>
        w.length < 2 || w(0) >= w(1)), s"query $q scores not sorted")
    }
    val p = out.queryExecution.executedPlan.toString
    // the term pre-filter, df stats, and query fan-out must STAY broadcast
    // at 10x — a flip to sort-merge here means the plan re-shuffles the
    // corpus-sized postings per stage
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"broadcast legs flipped at 10x:\n${p.take(4000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"retrieval degenerated at 10x:\n${p.take(4000)}")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"per-query top-k lost its bounded heap at 10x:\n${p.take(4000)}")
  }

  test("bm25 queryset shuffled fallback: a hot shared term is AQE-skew-split, results well-formed") {
    // broadcastQueries = false is the extreme-query-set escape hatch (a
    // whole corpus of mined queries): every query-side join degrades to a
    // shuffled equi-join on `term`. A stopword-grade term shared by EVERY
    // doc and EVERY query is then one shuffle key carrying |docs| rows —
    // the plan must survive via AQE skew-split, exactly like the span
    // specs pin for the gram join.
    val conf = Seq(
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val nDocs = 100000
      // every doc: the hot term + 3 docs-local tokens; every query: the
      // hot term + one selective term -> the term-keyed joins all see one
      // giant key next to uniform ones
      val docsDf = spark.range(nDocs).select(
        $"id".as("doc_id"),
        concat(lit("the t"), $"id" % 97, lit(" u"), $"id" % 89,
          lit(" v"), $"id" % 83).as("text"))
      val queries = (1 to 8).map(q => (q.toLong, s"the t${q * 7}"))
        .toDF("query_id", "query_text")
      val out = TextOps.bm25TopDocsForQueries(docsDf, queries, k = 10,
        nDocsKnown = Some(nDocs.toLong), avgdlKnown = Some(4.0),
        broadcastQueries = false)
      // collect THIS frame: the skew assertion must read the executed plan
      // of the same query that ran (the SkewOpsSpec convention)
      val got = out.collect().map(r => (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getDouble(3)))
      assert(got.map(_._1).distinct.length == 8, "every query must rank docs")
      got.groupBy(_._1).foreach { case (q, rs) =>
        val sorted = rs.sortBy(_._2)
        assert(sorted.length == 10 &&
          sorted.map(_._2).toSeq == (1 to sorted.length),
          s"query $q ranks malformed")
        assert(sorted.map(_._4).sliding(2).forall(w =>
          w.length < 2 || w(0) >= w(1)), s"query $q scores not sorted")
        // the selective term dominates the stopword: the top docs must all
        // contain the query's t-term (idf of 'the' is ~0 at df = nDocs)
        val sel = (q * 7) % 97
        assert(sorted.forall { case (_, _, d, _) => d % 97 == sel },
          s"query $q top docs missed the selective term")
      }
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"fallback: AQE did not skew-split the hot-term join:\n${p.take(4000)}")
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"fallback degenerated:\n${p.take(4000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
