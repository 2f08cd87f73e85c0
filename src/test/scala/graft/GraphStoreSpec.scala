package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.store.GraphStore

class GraphStoreSpec extends SparkSpec {
  import spark.implicits._

  // tiny deterministic corpus: 24 vectors on a 2-D fan so cosine
  // neighborhoods are unambiguous (angle order == neighbor order)
  private def corpus = (0 until 24).map { i =>
    val a = i * 0.12
    (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
  }.toDF("vec_id", "embedding")

  private def refinedGraph = {
    val e = corpus
    val centroids = e.filter(col("vec_id") % 6 === 0)
      .select((col("vec_id") / 6).cast("int").as("cid"),
        col("embedding").as("cv"))
    val assigned = Similarity.assignNearestCentroid(e, "embedding",
        "vec_id", centroids, "cid", "cv")
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val base = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
    Similarity.nnDescentRefine(base, e, "embedding", "vec_id", 3)
  }

  test("stored-graph beam search equals the in-query path (build once, probe many)") {
    val g = refinedGraph.cache()
    val dir = java.nio.file.Files.createTempDirectory("graft_gstore").toFile
    val path = s"${dir.getAbsolutePath}/graph"
    GraphStore.write(g, path, nBuckets = 4)
    val inQuery = Similarity.graphBeamSearch(g, corpus, "embedding",
        "vec_id", queryId = 7L, entryIds = Seq(0L, 12L), beam = 6,
        iters = 2, k = 4)
      .select("rank", "vec_id", "distance")
      .as[(Int, Long, Double)].collect().toSeq
    // probe the SAME store twice — the build is paid once, each probe is
    // a pruned lookup; both must match the in-query result exactly
    (1 to 2).foreach { _ =>
      val stored = GraphStore.beamSearch(spark, path, nBuckets = 4,
          corpus, "embedding", "vec_id", queryId = 7L,
          entryIds = Seq(0L, 12L), beam = 6, iters = 2, k = 4)
        .select("rank", "vec_id", "distance")
        .as[(Int, Long, Double)].collect().toSeq
      assert(stored == inQuery)
    }
    g.unpersist()
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("neighbors() partition-prunes to the probed id buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gstore2").toFile
    val path = s"${dir.getAbsolutePath}/graph"
    GraphStore.write(refinedGraph, path, nBuckets = 4)
    // ids 5 and 9 both land in bucket 1 (mod 4) — exactly one directory
    val look = GraphStore.neighbors(spark, path, Seq(5L, 9L), nBuckets = 4)
    val p = look.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // bucket predicate in PartitionFilters (pruned directories), id
    // predicate pushed to the scan — never a full-graph read
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined, p)
    assert(p.contains("PushedFilters") && p.contains("id"), p)
    assert(look.select("id").distinct().as[Long].collect().toSet ==
      Set(5L, 9L))
    // every returned adjacency row belongs to a probed node
    assert(look.select("rank").count() == look.count())
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("merge implements the HNSW insert rule; untouched buckets stay put") {
    val e = corpus
    val old = e.filter(col("vec_id") % 2 === 0)
    val centroids = old.filter(col("vec_id") % 6 === 0)
      .select((col("vec_id") / 6).cast("int").as("cid"),
        col("embedding").as("cv"))
    val assigned = Similarity.assignNearestCentroid(old, "embedding",
        "vec_id", centroids, "cid", "cv")
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val g0 = Similarity.knnGraph(assigned, "embedding", "vec_id", 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_gstore_m").toFile
    val path = s"${dir.getAbsolutePath}/graph"
    // nBuckets = 12: new ids 3,9 touch buckets {3, 9} plus their
    // neighbors' buckets; bucket of id 1 (odd, never an id here) and
    // buckets hosting no touched node stay byte-identical
    GraphStore.write(g0, path, nBuckets = 12)
    def listing(b: Int): Set[(String, Long)] = {
      val d = new java.io.File(s"$path/bucket=$b")
      if (d.exists()) d.listFiles().map(f => (f.getName, f.length())).toSet
      else Set.empty
    }
    val before = (0 until 12).map(b => b -> listing(b)).toMap
    val batch = e.filter(col("vec_id").isin(3L, 9L))
    GraphStore.merge(spark, path, nBuckets = 12, old, batch,
      "embedding", "vec_id", k = 2)
    // expected: re-rank of old edges ∪ fwd ∪ reverse, top-2 per id
    val fwd = Similarity.topKBatch(old, "embedding", "vec_id", batch,
        "embedding", "vec_id", 2)
      .select(col("query_id").as("id"), col("vec_id").as("nbr_id"),
        col("distance"))
    val rev = fwd.select(col("nbr_id").as("id"), col("id").as("nbr_id"),
      col("distance"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("distance").asc, col("nbr_id").asc)
    val expected = g0.select(col("id"), col("nbr_id"), col("distance"))
      .unionByName(fwd).unionByName(rev)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 2)
      .select("id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val got = spark.read.parquet(path)
      .select("id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(got == expected)
    // buckets untouched by the insert were not rewritten
    val touchedIds = Set(3L, 9L) ++ fwd.select("nbr_id").as[Long].collect()
    val touchedBuckets = touchedIds.map(i => (i % 12).toInt)
    (0 until 12).filterNot(touchedBuckets).foreach { b =>
      assert(listing(b) == before(b), s"bucket $b rewritten")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("mergeScoped: nProbe = all cells degenerates to the exact merge; " +
       "nProbe = 1 confines forward candidates to the probed cell") {
    val e = corpus
    val old = e.filter(col("vec_id") % 2 === 0)
    val centroids = old.filter(col("vec_id") % 6 === 0)
      .select((col("vec_id") / 6).cast("int").as("cid"),
        col("embedding").as("cv"))
    val nCells = centroids.count().toInt
    val assigned = Similarity.assignNearestCentroid(old, "embedding",
        "vec_id", centroids, "cid", "cv")
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val g0 = Similarity.knnGraph(assigned, "embedding", "vec_id", 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_gstore_ms").toFile
    def freshStore(name: String): String = {
      val p = s"${dir.getAbsolutePath}/$name"
      GraphStore.write(g0, p, nBuckets = 12)
      p
    }
    def contents(p: String): Set[(Long, Int, Long, Double)] =
      spark.read.parquet(p).select("id", "rank", "nbr_id", "distance")
        .as[(Long, Int, Long, Double)].collect().toSet
    val batch = e.filter(col("vec_id").isin(3L, 9L))
    // full cell coverage ≡ the exact merge, bit-for-bit (topKBatch and
    // the Catalyst cosine expression share the sqrt(na)*sqrt(nb)
    // association, so even the doubles agree)
    val pExact = freshStore("exact")
    GraphStore.merge(spark, pExact, 12, old, batch, "embedding",
      "vec_id", k = 2)
    val pAll = freshStore("all")
    GraphStore.mergeScoped(spark, pAll, 12, assigned, centroids,
      "cid", "cv", nProbe = nCells, batch, "embedding", "vec_id", k = 2)
    assert(contents(pAll) == contents(pExact))
    // nProbe = 1: each batch node's forward out-edges come ONLY from its
    // single probed cell (the scoping is real, not a pass-through)
    val pOne = freshStore("one")
    GraphStore.mergeScoped(spark, pOne, 12, assigned, centroids,
      "cid", "cv", nProbe = 1, batch, "embedding", "vec_id", k = 2)
    val cellOf = assigned.select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toMap
    val cents = centroids.select(col("cid"), col("cv"))
      .as[(Int, Seq[Float])].collect().toSeq
    val batchVecs = batch.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val got = spark.read.parquet(pOne)
      .select("id", "nbr_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).toSet }
    batchVecs.foreach { case (qid, qv) =>
      val probed = Similarity.nearestCentroidIds(cents, qv, 1).toSet
      got(qid).foreach { nbr =>
        assert(probed.contains(cellOf(nbr)),
          s"node $qid linked to $nbr outside its probed cell")
      }
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("readEdges serves the exact inline edge set, column-pruned when distance is unused") {
    val e = corpus
    val centroids = e.filter(col("vec_id") % 6 === 0)
      .select((col("vec_id") / 6).cast("int").as("cid"),
        col("embedding").as("cv"))
    val assigned = Similarity.assignNearestCentroid(e, "embedding",
        "vec_id", centroids, "cid", "cv")
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val inline = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_gstore4").toFile
    val path = s"${dir.getAbsolutePath}/graph"
    GraphStore.write(inline, path, nBuckets = 4)
    // analytics serving contract: the stored adjacency equals the inline
    // build EXACTLY (ids, ranks, distances — parquet doubles lossless),
    // so every oracle that replays the kNN derivation stays green
    val stored = GraphStore.readEdges(spark, path)
    assert(stored.select("id", "rank", "nbr_id", "distance")
      .as[(Long, Int, Long, Double)].collect().toSet ==
      inline.select("id", "rank", "nbr_id", "distance")
        .as[(Long, Int, Long, Double)].collect().toSet)
    // an unweighted analytics read prunes distance/rank out of the scan
    val unweighted = stored.select(col("id").as("src"),
      col("nbr_id").as("dst"))
    val p = unweighted.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    assert(readSchema.contains("id") && readSchema.contains("nbr_id"), p)
    assert(!readSchema.contains("distance"), p)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("hierarchical entry: descent lands near the query; recall@k >= flat-entry baseline") {
    val e = corpus
    val centroids = e.filter(col("vec_id") % 6 === 0)
      .select((col("vec_id") / 6).cast("int").as("cid"),
        col("embedding").as("cv"))
    val assigned = Similarity.assignNearestCentroid(e, "embedding",
      "vec_id", centroids, "cid", "cv")
    val graph = Similarity.knnGraph(
      assigned.select(col("vec_id"), col("embedding"), col("centroid_id")),
      "embedding", "vec_id", 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_gstore_h").toFile
    val path = s"${dir.getAbsolutePath}/graph"
    GraphStore.write(graph, path, nBuckets = 4)
    // query vec 21 sits at the far end of the fan — the worst case for
    // fixed low-id entries, the motivating case for descent
    val k = 4
    val truth = Similarity.topK(e, "embedding",
        e.filter(col("vec_id") === 21L).head().getSeq[Float](1),
        k, "COSINE", "vec_id")
      .select("vec_id").as[Long].collect().toSet
    def recall(hits: Set[Long]): Double =
      (hits intersect truth).size.toDouble / k
    val flat = GraphStore.beamSearch(spark, path, nBuckets = 4, e,
        "embedding", "vec_id", queryId = 21L, entryIds = Seq(0L, 1L),
        beam = 4, iters = 3, k = k)
      .select("vec_id").as[Long].collect().toSet
    val hier = GraphStore.hierarchicalBeamSearch(spark, path,
        nBuckets = 4, assigned, "embedding", "vec_id", centroids,
        "cid", "cv", queryId = 21L, startCid = 0, coarseK = 2,
        descentHops = 2, beam = 4, iters = 3, k = k)
      .select("vec_id").as[Long].collect().toSet
    assert(recall(hier) >= recall(flat),
      s"hier ${recall(hier)} < flat ${recall(flat)}")
    // on the fan the descent must land the far cell exactly: full recall
    assert(recall(hier) == 1.0, s"hier hits $hier vs truth $truth")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("layered entry (L=3): nested-prefix descent reaches the far cell; " +
       "recall >= flat baseline at equal beam budget") {
    val e = corpus
    val centroids = e.filter(col("vec_id") % 6 === 0)
      .select((col("vec_id") / 6).cast("int").as("cid"),
        col("embedding").as("cv"))
    val assigned = Similarity.assignNearestCentroid(e, "embedding",
      "vec_id", centroids, "cid", "cv")
    val graph = Similarity.knnGraph(
      assigned.select(col("vec_id"), col("embedding"), col("centroid_id")),
      "embedding", "vec_id", 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_gstore_l").toFile
    val path = s"${dir.getAbsolutePath}/graph"
    GraphStore.write(graph, path, nBuckets = 4)
    val k = 4
    val truth = Similarity.topK(e, "embedding",
        e.filter(col("vec_id") === 21L).head().getSeq[Float](1),
        k, "COSINE", "vec_id")
      .select("vec_id").as[Long].collect().toSet
    def recall(hits: Set[Long]): Double =
      (hits intersect truth).size.toDouble / k
    val flat = GraphStore.beamSearch(spark, path, nBuckets = 4, e,
        "embedding", "vec_id", queryId = 21L, entryIds = Seq(0L, 1L),
        beam = 4, iters = 3, k = k)
      .select("vec_id").as[Long].collect().toSet
    // layers {0} ⊂ {0,1} ⊂ {0..3}: the top seed is the WORST cell for
    // query 21, and each layer's 2 hops must walk the fan toward cell 3
    val layered = GraphStore.layeredBeamSearch(spark, path,
        nBuckets = 4, assigned, "embedding", "vec_id", centroids,
        "cid", "cv", layerPrefixes = Seq(1, 2), queryId = 21L,
        startCid = 0, coarseK = 2, hopsPerLayer = 2, beam = 4,
        iters = 3, k = k)
      .select("vec_id").as[Long].collect().toSet
    assert(recall(layered) >= recall(flat),
      s"layered ${recall(layered)} < flat ${recall(flat)}")
    assert(recall(layered) == 1.0, s"layered hits $layered vs $truth")
    // nesting invariant is enforced, not assumed
    intercept[IllegalArgumentException] {
      GraphStore.layeredBeamSearch(spark, path, 4, assigned, "embedding",
        "vec_id", centroids, "cid", "cv", layerPrefixes = Seq(2, 2),
        queryId = 21L, startCid = 0, coarseK = 2, hopsPerLayer = 1,
        beam = 4, iters = 1, k = k)
    }
    intercept[IllegalArgumentException] {
      GraphStore.layeredBeamSearch(spark, path, 4, assigned, "embedding",
        "vec_id", centroids, "cid", "cv", layerPrefixes = Seq(1, 2),
        queryId = 21L, startCid = 3, coarseK = 2, hopsPerLayer = 1,
        beam = 4, iters = 1, k = k)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("storedKnnGraph: built once per (JVM, dir) — repeat reads never rewrite") {
    val dir = "/root/testdata/sf0.001"
    val first = graft.queries.QueryHelpers.storedKnnGraph(spark, dir)
      .select("id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    val root = graft.queries.QueryHelpers.storedKnnGraphPath(spark, dir)
    def listing = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("bucket=")).flatMap(_.listFiles())
      .map(f => f.getPath -> f.lastModified()).toMap
    val before = listing
    val second = graft.queries.QueryHelpers.storedKnnGraph(spark, dir)
      .select("id", "rank", "nbr_id").as[(Long, Int, Long)].collect().toSet
    assert(second == first && first.nonEmpty)
    assert(listing == before, "repeat read rewrote the store")
  }

  test("store layout: one directory per bucket, ids stay in their bucket") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gstore3").toFile
    val path = s"${dir.getAbsolutePath}/graph"
    GraphStore.write(refinedGraph, path, nBuckets = 4)
    val buckets = new java.io.File(path).list()
      .filter(_.startsWith("bucket=")).toSeq.sorted
    assert(buckets == (0 until 4).map(b => s"bucket=$b"))
    val bad = spark.read.parquet(path)
      .filter(pmod(col("id"), lit(4L)).cast("int") =!= col("bucket"))
    assert(bad.count() == 0)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
