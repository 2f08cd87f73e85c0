package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-merge scale probe: proves AnnStore.merge and
  * IndexStore.merge cost O(touched cells), not O(store), by building each
  * store from a `replication`×-replicated corpus, merging a small batch
  * that lands in FEW cells, and reporting (build seconds, merge seconds,
  * touched/total cells, untouched directories byte-identical). On a store
  * 8× the gate corpus the merge should cost a small fraction of the
  * build and rewrite only the touched directories — the property that
  * lets a 100 TB store grow daily without a rebuild.
  *
  * Usage: runMain graft.MergeProbe [sfDir] [replication]
  */
object MergeProbe {

  private def cellListing(root: String): Map[String, Set[(String, Long)]] = {
    val d = new java.io.File(root)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .map(c => c.getName ->
        c.listFiles().map(f => (f.getName, f.length())).toSet).toMap
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_mergeprobe").toFile

    // ---- AnnStore: 64-cell IVF over the replicated embeddings ----------
    val e0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val e = (0 until rep).map(i => e0.select(
        (col("vec_id") + i * 1000000L).as("vec_id"), col("embedding")))
      .reduce(_ union _)
    val centroids = e0.filter(col("vec_id") < 64)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
    val assigned = graft.operators.Similarity.assignNearestCentroid(
        e, "embedding", "vec_id", centroids, "cid", "cv")
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
    val annPath = s"${tmp.getAbsolutePath}/ann"
    val (_, annBuild) = time { graft.store.AnnStore.write(assigned, annPath) }
    val storeRows = spark.read.parquet(annPath).count()
    // batch: 100 copies of ONE vector — lands in exactly one cell
    val batch = e0.filter(col("vec_id") === 5)
      .crossJoin(spark.range(100).select((col("id") + 900000000L).as("nid")))
      .select(col("nid").as("vec_id"), col("embedding"))
    val before = cellListing(annPath)
    val (_, annMerge) = time { graft.store.AnnStore.merge(spark, annPath,
      batch, centroids, "cid", "cv", "embedding", "vec_id") }
    val after = cellListing(annPath)
    val annTouched = after.keySet.filter(k => before.get(k) != after.get(k))
    val annUntouchedOk = (before.keySet -- annTouched)
      .forall(k => before(k) == after(k))
    println(f"ann  build=${annBuild}%7.2fs rows=$storeRows%8d cells=${after.size}%3d " +
      f"merge=${annMerge}%6.2fs touched=${annTouched.size}%3d " +
      s"untouched_identical=$annUntouchedOk merged_rows=${spark.read.parquet(annPath).count()}")

    // ---- IndexStore: 64-bucket inverted index over replicated docs ------
    val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val d = (0 until rep).map(i => d0.select(
        (col("doc_id") + i * 1000000L).as("doc_id"), col("text")))
      .reduce(_ union _)
    val idxPath = s"${tmp.getAbsolutePath}/idx"
    val idx = graft.operators.Retrieval.invertedIndex(d, "doc_id", "text")
    val (_, idxBuild) = time { graft.store.IndexStore.write(idx, idxPath, 64) }
    val terms = spark.read.parquet(idxPath).count()
    // batch: 100 new docs sharing a tiny fixed vocabulary — few buckets
    import spark.implicits._
    val nb = (0 until 100).map(i =>
      (900000000L + i, "quorum lattice kestrel")).toDF("doc_id", "text")
    val ib = cellListing(idxPath)
    val (_, idxMerge) = time { graft.store.IndexStore.merge(spark, idxPath,
      graft.operators.Retrieval.invertedIndex(nb, "doc_id", "text"), 64) }
    val ia = cellListing(idxPath)
    val idxTouched = ia.keySet.filter(k => ib.get(k) != ia.get(k))
    val idxUntouchedOk = (ib.keySet -- idxTouched).forall(k => ib(k) == ia(k))
    println(f"idx  build=${idxBuild}%7.2fs terms=$terms%8d buckets=${ia.size}%3d " +
      f"merge=${idxMerge}%6.2fs touched=${idxTouched.size}%3d " +
      s"untouched_identical=$idxUntouchedOk")

    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    spark.stop()
  }
}
