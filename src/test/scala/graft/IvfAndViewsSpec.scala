package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.plans.SecureViews

class IvfAndViewsSpec extends SparkSpec {
  import spark.implicits._

  test("IVF probe finds the true neighbor when its bucket is probed") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.95f, 0.05f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.05f, 0.95f))).toDF("vec_id", "embedding")
    val centroids = Seq(0 -> Seq(1.0f, 0.0f), 1 -> Seq(0.0f, 1.0f))
    val assigned = Similarity.ivfAssign(corpus, "embedding", centroids)
    val buckets = assigned.select("vec_id", "centroid_id")
      .as[(Long, Int)].collect().toMap
    assert(buckets == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
    val hits = Similarity.ivfSearch(assigned, "embedding", "vec_id",
        centroids, Seq(0.9f, 0.1f), k = 2, nProbe = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits == Seq(2L, 1L)) // only bucket 0 scanned; nearest first
  }

  test("batch IVF probe matches the single-query probe per query") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.95f, 0.05f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.05f, 0.95f))).toDF("vec_id", "embedding")
    val cents = Seq(0 -> Seq(1.0f, 0.0f), 1 -> Seq(0.0f, 1.0f))
    val centsDf = cents.toDF("cid", "cv")
    val assigned = Similarity.assignNearestCentroid(
      corpus, "embedding", "vec_id", centsDf, "cid", "cv")
    val queries = Seq((100L, Seq(0.9f, 0.1f)), (200L, Seq(0.1f, 0.9f)))
    val batch = Similarity.ivfSearchBatch(assigned, "embedding", "vec_id",
        centsDf, "cid", "cv", queries.toDF("qid", "qv"), "qv", "qid",
        k = 2, nProbe = 1)
      .select("query_id", "rank", "vec_id").as[(Long, Int, Long)]
      .collect().groupBy(_._1)
    queries.foreach { case (qid, qv) =>
      val single = Similarity.ivfSearch(assigned, "embedding", "vec_id",
          cents, qv, k = 2, nProbe = 1)
        .select("vec_id").as[Long].collect().toSeq
      assert(batch(qid).sortBy(_._2).map(_._3).toSeq == single)
    }
  }

  test("kmeans: Lloyd rounds recover separated cluster means; empty seed is kept") {
    import graft.operators.Clustering
    val pts = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(1.1f, -0.1f)),
      (10L, Seq(0.0f, 1.0f)), (11L, Seq(0.1f, 0.9f)), (12L, Seq(-0.1f, 1.1f)))
      .toDF("vec_id", "embedding")
    // seed 2 in-distribution centroids + one that captures nothing
    val init = Seq(0 -> Seq(0.8, 0.2), 1 -> Seq(0.2, 0.8), 2 -> Seq(100.0, 100.0))
    val m = Clustering.kmeans(pts, "embedding", init, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // converged means of the two true clusters
    assert(math.abs(m((0, 0)) - 1.0) < 1e-6)
    assert(math.abs(m((0, 1)) - 0.0) < 1e-6)
    assert(math.abs(m((1, 0)) - 0.0) < 1e-6)
    assert(math.abs(m((1, 1)) - 1.0) < 1e-6)
    // the empty cluster emits no mean rows and nothing crashes
    assert(m.keys.map(_._1).toSet == Set(0, 1))
  }

  test("clusterQuality: per-cell inertia plus a rollup total row") {
    import graft.operators.Clustering
    val assigned = Seq(
      (1L, 0, 2.0), (2L, 0, 3.0), // cell 0: inertia 4 + 9 = 13
      (3L, 1, 1.0)                // cell 1: inertia 1
    ).toDF("vec_id", "centroid_id", "centroid_dist")
    val out = Clustering.clusterQuality(assigned, "centroid_id", "centroid_dist")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set((Some(0), 2L, 13.0), (Some(1), 1L, 1.0), (None, 3L, 14.0)))
  }

  test("assignNearestCentroid: fold and array-scan paths agree bit-for-bit") {
    // the >maxFoldCentroids path (real IVF nlist sizes) must produce the
    // identical assignment AND distance as the least-fold path
    val corpus = (1 to 60).map { i =>
      (i.toLong, Seq((i % 7).toFloat, (i % 5).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Seq(0 -> Seq(0.0f, 0.0f), 1 -> Seq(6.0f, 4.0f), 2 -> Seq(3.0f, 2.0f))
      .toDF("cid", "cv")
    val fold = Similarity.assignNearestCentroid(
        corpus, "embedding", "vec_id", cents, "cid", "cv")
      .select("vec_id", "centroid_id", "centroid_dist")
      .as[(Long, Int, Double)].collect().toSet
    val scan = Similarity.assignNearestCentroid(
        corpus, "embedding", "vec_id", cents, "cid", "cv", maxFoldCentroids = 0)
      .select("vec_id", "centroid_id", "centroid_dist")
      .as[(Long, Int, Double)].collect().toSet
    assert(scan == fold)
  }

  test("assignNearestCentroid matches ivfAssign's literal-centroid variant") {
    val corpus = (1 to 50).map { i =>
      (i.toLong, Seq((i % 7).toFloat, (i % 5).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Seq(0 -> Seq(0.0f, 0.0f), 1 -> Seq(6.0f, 4.0f), 2 -> Seq(3.0f, 2.0f))
    val viaLiteral = Similarity.ivfAssign(corpus, "embedding", cents)
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    val centsDf = cents.map { case (id, v) => (id, v) }.toDF("cid", "cv")
    val viaJoin = Similarity.assignNearestCentroid(
        corpus, "embedding", "vec_id", centsDf, "cid", "cv")
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    assert(viaLiteral == viaJoin)
  }

  test("restricted view: column grant, row grant, masking (§2.10)") {
    val df = Seq((1L, "alice", "s3cret", 100.0), (2L, "bob", "hunter2", -5.0))
      .toDF("id", "name", "password", "balance")
    val view = SecureViews.restrict(df,
      allowedCols = Seq("id", "name", "password"),
      rowPredicate = Some(col("balance") > 0),
      maskedCols = Set("password"))
    val rows = view.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(1) == "alice" && rows.head.getString(2) == "***")
    assert(!view.columns.contains("balance"))
    intercept[IllegalArgumentException](
      SecureViews.restrict(df, Seq("nope")))
    // the row predicate sees REAL values, even on a masked column — a
    // post-masking filter would compare against "***" and return nothing
    val byMasked = SecureViews.restrict(df,
      allowedCols = Seq("id", "password"),
      rowPredicate = Some(col("password") === "s3cret"),
      maskedCols = Set("password")).collect()
    assert(byMasked.length == 1 && byMasked.head.getLong(0) == 1L)
    assert(byMasked.head.getString(1) == "***") // still masked in output
    // and the inverted predicate excludes exactly that row
    val inverted = SecureViews.restrict(df,
      allowedCols = Seq("id", "password"),
      rowPredicate = Some(col("password") =!= "s3cret"),
      maskedCols = Set("password")).collect()
    assert(inverted.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("view names validate as identifiers (deepsec/database.py:55-67)") {
    assert(SecureViews.isValidIdentifier("VS_TABLE_1"))
    assert(!SecureViews.isValidIdentifier("bad-name"))
    assert(!SecureViews.isValidIdentifier("1bad"))
    assert(!SecureViews.isValidIdentifier("x; DROP TABLE t"))
    val df = Seq((1, "a")).toDF("id", "v")
    SecureViews.grantView(spark, "sv_ok", df, Seq("id"))
    assert(spark.table("sv_ok").columns.toSeq == Seq("id"))
    intercept[IllegalArgumentException](
      SecureViews.grantView(spark, "bad name", df, Seq("id")))
  }

  test("gridDbscan: labels equal a reference component computation; noise is NULL") {
    // deterministic pseudo-random 64-dim vectors; expected clusters are
    // recomputed in the test from the driver-side hyperplaneCode twin
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 120L).map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = graft.operators.Clustering
      .gridDbscan(df, "vec_id", "embedding", dim = 64, nBits = 4, minPts = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toList
    // reference: driver-side codes -> counts -> core -> components
    val codes = vecs.map { case (id, v) =>
      id -> Similarity.hyperplaneCode(v, 64, 4)
    }.toMap
    val counts = codes.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val core = counts.filter(_._2 >= 6).keySet
    def root(c: Long, seen: Set[Long]): Long = { // min cell reachable
      val nbrs = (0 until 4).map(b => c ^ (1L << b)).filter(core).filterNot(seen)
      (c +: nbrs.map(n => root(n, seen + c))).min
    }
    val expectLabel = core.map(c => c -> root(c, Set())).toMap
    assert(out.nonEmpty && out.size == 120)
    out.foreach { case (id, cell, nPts, isCore, cluster) =>
      assert(cell == codes(id))
      assert(nPts == counts(cell))
      assert(isCore == core.contains(cell))
      assert(cluster == (if (core.contains(cell)) Some(expectLabel(cell)) else None))
    }
    // sanity: the parameterization actually produces both clusters and noise
    assert(out.exists(_._5.isEmpty) && out.exists(_._5.nonEmpty))
  }

  test("frequentItemsets: hand-computed supports, Apriori levels, threshold div") {
    // 5 docs, threshold = (5*2) div 5 = 2 docs
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b"), (4L, "c d"), (5L, "d"))
      .toDF("doc_id", "text")
    val out = graft.operators.Itemsets
      .frequentItemsets(docs, "doc_id", "text", 2, 5)
      .collect().map(r => (r.getInt(0),
        r.getString(1), Option(r.getString(2)), Option(r.getString(3)),
        r.getLong(4))).toSet
    val expected = Set(
      (1, "a", None, None, 3L), (1, "b", None, None, 3L),
      (1, "c", None, None, 3L), (1, "d", None, None, 2L),
      (2, "a", Some("b"), None, 3L), (2, "a", Some("c"), None, 2L),
      (2, "b", Some("c"), None, 2L),
      (3, "a", Some("b"), Some("c"), 2L))
    assert(out == expected)
  }

  test("sequentialPatterns: gapped-subsequence supports; ties never chain") {
    def run(rows: Seq[(Long, String, Long)], minSeqs: Long) =
      graft.operators.Itemsets.sequentialPatterns(
          rows.toDF("sid", "item", "t"), "sid", "item", "t", minSeqs)
        .collect().map(r => (r.getInt(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3)), r.getLong(4)))
        .toSet
    // sid 1: a1 b2 a3 c4; sid 2: a1 c2; sid 3: b5;
    // sid 4: a1 b1 (simultaneous — must NOT support <a,b> or <b,a>);
    // sid 5: b1 a2 b3 (greedy: first b=1, a after it, b after that)
    val rows = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "c", 4L),
      (2L, "a", 1L), (2L, "c", 2L),
      (3L, "b", 5L),
      (4L, "a", 1L), (4L, "b", 1L),
      (5L, "b", 1L), (5L, "a", 2L), (5L, "b", 3L))
    val out = run(rows, minSeqs = 2L)
    val expected = Set[(Int, String, Option[String], Option[String], Long)](
      (1, "a", None, None, 4L), (1, "b", None, None, 4L),
      (1, "c", None, None, 2L),
      (2, "a", Some("b"), None, 2L), (2, "a", Some("c"), None, 2L),
      (2, "b", Some("a"), None, 2L))
    assert(out == expected)
    // two identical sequences: the full triple reaches level 3
    val twin = Seq((10L, "x", 1L), (10L, "y", 2L), (10L, "z", 3L),
      (11L, "x", 1L), (11L, "y", 2L), (11L, "z", 3L))
    val t3 = run(twin, minSeqs = 2L)
    assert(t3.contains((3, "x", Some("y"), Some("z"), 2L)))
    assert(t3.count(_._1 == 3) == 1)
    assert(t3.filter(_._1 == 2).map(x => (x._2, x._3.get)) ==
      Set(("x", "y"), ("x", "z"), ("y", "z")))
  }

  test("daviesBouldin and simplifiedSilhouette: hand-computed two-cell case") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cents = Seq((0, Seq(0f, 0f)), (1, Seq(10f, 0f))).toDF("cid", "cv")
    val pts = Seq((1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f)),
      (3L, Seq(10f, 1f)), (4L, Seq(10f, -3f))).toDF("vec_id", "embedding")
    val assigned = Similarity.assignNearestCentroid(pts, "embedding",
      "vec_id", cents, "cid", "cv")
    val db = graft.operators.Clustering.daviesBouldin(assigned,
        "centroid_id", "centroid_dist", cents, "cid", "cv")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // σ0 = 1 (both at distance 1), σ1 = (1+3)/2 = 2; d01 = 10 → R = 0.3
    assert(db(0) == ((2L, 1.0, 0.3, 0.3)))
    assert(db(1) == ((2L, 2.0, 0.3, 0.3)))
    val sil = graft.operators.Clustering.simplifiedSilhouette(pts,
        "embedding", "vec_id", cents, "cid", "cv")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // s per point: (b−a)/max(a,b) with rounded distances
    val s1 = (9.0 - 1.0) / 9.0
    val s2 = (11.0 - 1.0) / 11.0
    val s3 = { val b = r6(math.sqrt(101.0)); (b - 1.0) / b }
    val s4 = { val b = r6(math.sqrt(109.0)); (b - 3.0) / b }
    def d18(x: Double) =
      BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    val g = r6((d18(s1) + d18(s2) + d18(s3) + d18(s4)).toDouble / 4)
    assert(sil(0) == ((2L, r6((d18(s1) + d18(s2)).toDouble / 2), g)))
    assert(sil(1) == ((2L, r6((d18(s3) + d18(s4)).toDouble / 2), g)))
  }
}
