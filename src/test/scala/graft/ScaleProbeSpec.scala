package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, GraphAnalytics, Profiling}

/** Structural guards behind the ScaleProbe measurements (NOTES round-7):
  * wall-clock linearity is noisy on a shared box, but the PROPERTIES that
  * produce it are deterministic — pin those. */
class ScaleProbeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q142 guard: the bounded-slice filter reaches the parquet scan " +
       "(corpus size cannot leak into the PPJoin)") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 600)
    val toks = d.select(col("doc_id").as("id"),
      explode(Dedup.shingleExpr("text", 5)).as("tok"))
    // r12: the operator materializes its distinct token frame ONCE
    // (localCheckpoint), so the slice pushdown lives in THAT plan — the
    // one the checkpoint executes; rows beyond the slice never leave
    // the reader (measured flat 6.1→5.9 s at rep 1→8, ScaleProbe)
    val tokPlan = toks
      .select(col("id"), xxhash64(col("tok")).as("tok")).distinct()
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(tokPlan.contains("PushedFilters") &&
      tokPlan.contains("LessThan(doc_id,600)"),
      tokPlan.linesIterator.take(40).mkString("\n"))
    // and the join machinery itself reads the materialized frame (no
    // fresh corpus scans inside the candidate/verify plan)
    val p = Dedup.prefixFilterJoin(toks, "id", "tok", tau = 0.6)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("Scan ExistingRDD") && !p.contains("PushedFilters"),
      p.linesIterator.take(40).mkString("\n"))
  }

  test("q387 guard: checksum digests with map-side partials and at most " +
       "two exchanges (bucket agg + single-row root)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val p = Profiling.tableChecksum(li,
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_returnflag", "l_linestatus"), buckets = 16)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // linear in rows because each task folds its partition into 16
    // partial digests before anything shuffles; only the 16-row bucket
    // frame (and the 1-row root) ever cross the wire
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).size <= 3,
      p.linesIterator.take(40).mkString("\n"))
    assert(p.contains("partial_"), p.linesIterator.take(40).mkString("\n"))
  }

  test("merge guard (q132/q121 cores): a store's UNTOUCHED mass never " +
       "enters a merge — touched-cell results are replication-invariant") {
    // the MergeProbe flat line in semantic form: merging one fixed batch
    // into a store whose OTHER cells are 2× heavier must produce the
    // identical touched set and identical touched-cell contents — if
    // store size leaked into the merge, these would differ. Uses a
    // 3-centroid layout where the batch lands in exactly cell 0.
    import graft.store.AnnStore
    import graft.operators.Similarity
    val base = (0 until 30).map { i =>
      (i.toLong, Seq((i % 3).toFloat * 10f + 1f, 1f))
    }.toDF("vec_id", "embedding")
    val centroids = Seq((0, Seq(1f, 1f)), (1, Seq(11f, 1f)), (2, Seq(21f, 1f)))
      .toDF("cid", "cv")
    def assign(df: org.apache.spark.sql.DataFrame) =
      Similarity.assignNearestCentroid(df, "embedding", "vec_id",
        centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val batch = Seq((900L, Seq(1.5f, 1f)), (901L, Seq(0.5f, 1f)))
      .toDF("vec_id", "embedding")
    def mergedCell0(store: org.apache.spark.sql.DataFrame): Set[Long] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_mg").toFile
      val p = s"${dir.getAbsolutePath}/ann"
      AnnStore.write(assign(store), p)
      AnnStore.merge(spark, p, batch, centroids, "cid", "cv",
        "embedding", "vec_id")
      val got = spark.read.parquet(p).filter(col("centroid_id") === 0)
        .select("vec_id").as[Long].collect().toSet
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
      got
    }
    // replica rows land ONLY in cells 1 and 2 (x = 11 / 21) — cell 0,
    // where the batch lands, is identical in both stores
    val heavy = base.union((0 until 30).map { i =>
      (1000L + i, Seq((i % 2).toFloat * 10f + 11f, 1f))
    }.toDF("vec_id", "embedding"))
    assert(mergedCell0(base) == mergedCell0(heavy))
    assert(mergedCell0(base).contains(900L) && mergedCell0(base).contains(901L))
  }

  test("q428 guard: disjoint graph replicas never widen a sweep — " +
       "betweenness from replica-0 sources is replication-invariant") {
    // the linearity law in semantic form: Brandes BFS cost is
    // Σ_replicas (frontier work), because a replica's nodes are
    // unreachable from another replica's sources. If replication ever
    // contaminated a sweep, these results would differ.
    val edges = (0 until 24).flatMap { i =>
      Seq((i.toLong, ((i + 1) % 24).toLong), (i.toLong, ((i + 3) % 24).toLong))
    }.toDF("src", "dst")
    val base = GraphAnalytics.sampledBetweenness(edges, "src", "dst",
        sources = Seq(0L, 7L, 13L), maxDepth = 6, topK = 10)
      .collect().map(_.toSeq).toSeq
    val replicated = edges.union(
      edges.select((col("src") + 1000L).as("src"),
        (col("dst") + 1000L).as("dst")))
    val withCopy = GraphAnalytics.sampledBetweenness(replicated, "src", "dst",
        sources = Seq(0L, 7L, 13L), maxDepth = 6, topK = 10)
      .collect().map(_.toSeq).toSeq
    assert(withCopy == base)
  }

  test("q537 guard: disjoint replication leaves replica-0's tree and the " +
       "round count unchanged — Borůvka rounds track the largest component") {
    // a weighted ring + chords: enough structure for multiple rounds
    val edges = (0 until 16).flatMap { i =>
      Seq((i.toLong, ((i + 1) % 16).toLong, 1.0 + (i % 5) * 0.1),
        (i.toLong, ((i + 4) % 16).toLong, 2.0 + (i % 3) * 0.1))
    }.toDF("src", "dst", "w")
    val base = GraphAnalytics.boruvkaMst(edges, "src", "dst", "w")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val replicated = edges.union(
      edges.select((col("src") + 1000L).as("src"),
        (col("dst") + 1000L).as("dst"), col("w")))
    val both = GraphAnalytics.boruvkaMst(replicated, "src", "dst", "w")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // replica 0's tree edges survive byte-identical, INCLUDING their
    // round numbers (each replica merges in parallel, never interacting)
    assert(both.filter(_._2 < 1000L) == base)
    // and the copy contributes exactly the shifted twin
    assert(both.filter(_._2 >= 1000L) ==
      base.map(e => (e._1, e._2 + 1000L, e._3 + 1000L, e._4)))
    // the round count is replication-invariant
    assert(both.map(_._1).max == base.map(_._1).max)
  }

  test("q540 guard: disjoint replication leaves replica-0's truss " +
       "unchanged — no cross-replica triangle can exist") {
    // K4 + pendant + detached triangle (the kTruss spec graph): the
    // 4-truss is exactly the K4. Replication must reproduce it shifted,
    // byte-identical supports included — the linearity law in semantic
    // form (triangle enumeration never pairs nodes across replicas)
    val e = (Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L)) ++ Seq((3L, 4L), (5L, 6L), (6L, 7L), (5L, 7L)))
      .toDF("src", "dst")
    val base = GraphAnalytics.kTruss(e, "src", "dst", k = 4, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val replicated = e.union(e.select((col("src") + 1000L).as("src"),
      (col("dst") + 1000L).as("dst")))
    val both = GraphAnalytics.kTruss(replicated, "src", "dst", k = 4,
        rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(both.filter(_._1 < 1000L) == base)
    assert(both.filter(_._1 >= 1000L) ==
      base.map(t => (t._1 + 1000L, t._2 + 1000L, t._3)))
  }

  test("q546 guard: disjoint replication leaves replica-0's SCC labels " +
       "and the FW-BW round count unchanged") {
    // mixed SCC structure (the sccLabelsFwBw spec graph): partitions of
    // different replicas decompose in PARALLEL within the same rounds,
    // so rounds track the hardest replica — which replication never
    // changes — and labels shift by exactly the id offset
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 4L), (6L, 7L)).toDF("src", "dst")
    def labelsOf(df: org.apache.spark.sql.DataFrame,
                 st: GraphAnalytics.FwBwStats) =
      GraphAnalytics.sccLabelsFwBw(df, "src", "dst", stats = Some(st))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val baseStats = new GraphAnalytics.FwBwStats
    val base = labelsOf(e, baseStats)
    val baseRounds = baseStats.lastRounds.get()
    val replicated = e.union(e.select((col("src") + 1000L).as("src"),
      (col("dst") + 1000L).as("dst")))
    val bothStats = new GraphAnalytics.FwBwStats
    val both = labelsOf(replicated, bothStats)
    val bothRounds = bothStats.lastRounds.get()
    assert(both.filter(_._1 < 1000L) == base)
    assert(both.filter(_._1 >= 1000L) ==
      base.map(t => (t._1 + 1000L, t._2 + 1000L, t._3)))
    assert(bothRounds == baseRounds)
  }
}
