package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.pipeline.Embedder

/** Shared builder-side helpers for the query modules (split verbatim from
  * SparkEntry): table readers, the events timestamp shim, decimal-exact
  * sums, the per-JVM scratch token, and the memoized persisted kNN-graph
  * store every graph-analytics query serves from. */
private[graft] object QueryHelpers {

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Per-JVM token for the store-writing queries' scratch directories:
    * repeat runs inside one process reuse (and overwrite) the same dirs,
    * while two processes on the same host can never race each other's
    * half-swapped buckets. */
  lazy val tmpToken: String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Build-once/serve-many kNN graph: the q101 bucket-local kNN edge set
    * (8-centroid IVF assignment, k = 3 — the exact frame every
    * graph-analytics query used to REBUILD inline), persisted once per
    * (JVM, sf-dir) through [[graft.store.GraphStore.write]] and read back
    * as adjacency rows for centrality/diameter/shortest-path queries —
    * the reference's standing-index behavior (a stored HNSW graph serves
    * every session, vector_store.py:266-271) applied to analytics: the
    * O(N·k·cell) construction is paid at first touch, after which each
    * query's graph input is one N·k-row pruned-column store scan. The
    * edge set is BYTE-IDENTICAL to the inline build (parquet doubles are
    * lossless), so every DuckDB oracle that replays the kNN derivation
    * from embeddings.parquet stays exact. */
  val knnGraphStorePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def storedKnnGraphPath(s: SparkSession, dir: String): String =
    knnGraphStorePaths.computeIfAbsent(dir, d => {
      val e = tbl(s, d, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val g = Similarity.knnGraph(
        Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv"), "embedding", "vec_id", 3)
      val p = sys.props("java.io.tmpdir") +
        s"/graft-knn-graph-$tmpToken-${math.abs(d.hashCode.toLong)}"
      store.GraphStore.write(g, p, nBuckets = 16)
      p
    })
  def storedKnnGraph(s: SparkSession, dir: String): DataFrame =
    store.GraphStore.readEdges(s, storedKnnGraphPath(s, dir))

  /** The driver's events.parquet has carried `ts` as TIMESTAMP(NANOS) in
    * some rounds and TIMESTAMP(MICROS) in others — handle both. Nanos:
    * Spark's vectorized reader rejects them, so read as long (legacy conf)
    * and truncate to µs — exactly what the oracle's CAST(ts AS TIMESTAMP)
    * does on the DuckDB side. Micros: take the column as read, cast to the
    * session-zone timestamp type so downstream comparisons against
    * `lit(...).cast("timestamp")` literals keep one type (UTC session →
    * identical instants either way). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Order-independent exact sum of a double expression: accumulate as
    * decimal (exact, commutative), return double. The DuckDB oracle does the
    * identical cast chain. */
  def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(24,$scale)")).cast("double")
  def dsumSql(e: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($e AS DECIMAL(24,$scale))) AS DOUBLE)"


  /** End-to-end RAG slice (SURVEY.md §7.1 step 5): documents → chunk →
    * dedup → stub-embed → parquet store (staged write + catalog) → top-8
    * cosine retrieval with normalized scores. */
  def embedSearch(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val chunks = Chunker.chunkWithIds(tbl(s, dir, "documents"), "doc_id", "text", 200, 50)
      .select(col("chunk_id").as("id"), col("chunk").as("text"),
        map(lit("source"), col("source"), lit("start_index"),
          col("start_index").cast("string")).as("metadata"))
    val deduped = Dedup.exactDedup(chunks, "text", "id")
    val embedded = Embedder.embed(deduped, "text", Embedder.stubEmbed(dim))
    val root = sys.props("java.io.tmpdir") + "/graft-stores"
    val name = store.VectorStore.storeName("DOCS", "stub", "hash64", 200, 50, "COSINE", "HNSW")
    store.VectorStore.write(embedded, root, name,
      s"""{"alias": "DOCS", "embedding_model": {"provider": "stub", "id": "hash64"},
         | "chunk_size": 200, "chunk_overlap": 50, "distance_strategy": "COSINE",
         | "index_type": "HNSW"}""".stripMargin)
    val stored = store.VectorStore.read(s, root, name)
    val qv = Embedder.stubEmbed(dim)(Seq("spark join stream merge")).head.toSeq
    Similarity.topK(stored, "embedding", qv, 8, "COSINE", "id")
      .select(col("id"), col("text"), round(col("score"), 6).as("score"))
  }


  /** Build-once/serve-many LEXICAL index — the IndexStore twin of
    * [[storedKnnGraph]]: the documents inverted index persisted once per
    * (JVM, sf-dir) through [[graft.store.IndexStore.write]] (8 term
    * buckets), so every BM25-consuming query (hybrid fusion, PRF, RBO,
    * snippets) probes partition-pruned posting lists instead of
    * re-tokenizing the corpus. Scores are arithmetic-identical to the
    * scan-built [[graft.operators.Retrieval.bm25]] (q106 ≡ q98 pins it),
    * so every oracle is untouched. q97/q98/q104/q121 keep inline builds
    * BY DESIGN — they gate the build/scan/merge machinery itself. */
  private val indexStorePaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def storedIndexPath(s: SparkSession, dir: String): String =
    indexStorePaths.computeIfAbsent(dir, d => {
      val idx = graft.operators.Retrieval.invertedIndex(
        tbl(s, d, "documents"), "doc_id", "text")
      val p = sys.props("java.io.tmpdir") +
        s"/graft-index-store-$tmpToken-${math.abs(d.hashCode.toLong)}"
      graft.store.IndexStore.write(idx, p, nBuckets = 8)
      p
    })
  /** Doc lengths memoized as a localCheckpointed |docs|-row frame: the
    * whole point of the standing index is NOT re-tokenizing the corpus
    * per query, and dl was the remaining tokenize pass (measured: the
    * stored path LOST to the scan path until this was pinned). */
  private val docLengthFrames =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  def docLengths(s: SparkSession, dir: String): DataFrame =
    docLengthFrames.computeIfAbsent(dir, d =>
      tbl(s, d, "documents").select(col("doc_id").cast("long").as("id"),
        size(graft.operators.Retrieval.analyze(col("text")))
          .cast("long").as("dl"))
        .localCheckpoint())
  /** [[graft.operators.Retrieval.bm25]] served from the standing index. */
  def storedBm25(s: SparkSession, dir: String, terms: Seq[String],
                 k: Int): DataFrame =
    graft.operators.Retrieval.bm25FromIndex(s, storedIndexPath(s, dir), 8,
      docLengths(s, dir), terms, k)

  /** The q496/q497 synthetic rater panel: (flipBase, pickBase, accNum,
    * accDen) per annotator — 90%, 70%, 60% accurate. Prime hash bases
    * keep the raters independent and the oracle replayable. */
  val AnnotatorPanel: Seq[(Long, Long, Int, Int)] =
    Seq((1000003L, 999983L, 9, 10), (999979L, 93077L, 7, 10),
      (93083L, 93097L, 3, 5))

  // ======================================================================
}
