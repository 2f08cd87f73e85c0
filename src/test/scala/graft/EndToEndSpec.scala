package graft

import org.apache.spark.sql.functions._
import graft.operators.{ChangeDetection, Chunker, Dedup}
import graft.pipeline.{Embedder, RagPipeline}
import graft.sources.DocumentSource
import graft.store.VectorStore
import graft.streaming.EventStreams
import java.nio.file.{Files, Paths}

/** The full reference lifecycle in one flow (SURVEY §3.1 + §3.2 + ST1):
  * ingest files → chunk → dedup → embed → store → retrieve → answer,
  * then modify a file and refresh incrementally → retrieval reflects it.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("ingest → chunk → embed → store → retrieve → refresh lifecycle") {
    val corpusDir = Files.createTempDirectory("graft-e2e-corpus").toString
    val storeRoot = Files.createTempDirectory("graft-e2e-store").toString
    // NOTE: files must have distinct content — cross-file content dedup (P4)
    // would otherwise drop one file's chunks entirely and change-detection
    // would (correctly) re-classify that file as new on every refresh.
    Files.writeString(Paths.get(corpusDir, "spark.txt"),
      "spark catalyst optimizer rules rewrite logical plans into physical plans")
    Files.writeString(Paths.get(corpusDir, "stream.txt"),
      "structured streaming watermarks bound state for windowed aggregation")

    val embedFn = Embedder.stubEmbed(32)
    val storeName = VectorStore.storeName("E2E", "stub", "hash32", 64, 8, "COSINE", "HNSW")

    def buildChunks(corpus: org.apache.spark.sql.DataFrame) = {
      val parsed = corpus.filter(col("parse_ok"))
        .select(col("filename"), col("text"),
          col("size"), col("time_modified").cast("string").as("mtime"))
      val chunked = Chunker.chunkWithIds(parsed, "filename", "text", 64, 8)
        .select(col("chunk_id").as("id"), col("chunk").as("text"),
          map(lit("filename"), col("filename"),
            lit("etag"), md5(col("text")),
            lit("time_modified"), col("mtime"),
            lit("start_index"), col("start_index").cast("string")).as("metadata"))
      Embedder.embed(Dedup.exactDedup(chunked, "text", "id"), "text", embedFn)
        .select("id", "text", "metadata", "embedding")
    }

    // 1. ingest + index
    val corpus = DocumentSource.loadCorpus(spark, corpusDir, "*.txt")
    val chunks = buildChunks(corpus)
    VectorStore.write(chunks, storeRoot, storeName, """{"alias": "E2E"}""")
    val stored = VectorStore.read(spark, storeRoot, storeName)
    assert(stored.select("text").distinct().count() == stored.count())

    // 2. retrieve through the routed pipeline
    val res = RagPipeline.execute(spark, Map(storeName -> stored),
      "how does catalyst rewrite plans", Seq.empty, embedFn, _ => "",
      RagPipeline.Config(topK = 3, scoreThreshold = 0.0))
    val topTexts = res.docs.select("text").as[String].collect()
    assert(topTexts.exists(_.contains("catalyst")))

    // 3. modify one file + add one; refresh only the changed set (ST1)
    Files.writeString(Paths.get(corpusDir, "stream.txt"),
      "completely rewritten content about state store checkpoints")
    Files.writeString(Paths.get(corpusDir, "new.txt"),
      "fresh document about shuffle partitioning strategies")
    val listing = DocumentSource.loadCorpus(spark, corpusDir, "*.txt")
      .filter(col("parse_ok"))
      .select(col("filename").as("name"), md5(col("text")).as("etag"),
        col("time_modified").cast("string").as("time_modified"))
    val processed = VectorStore.processedFiles(
      VectorStore.read(spark, storeRoot, storeName))
    val statuses = ChangeDetection.detectChanges(
        listing.select("name", "etag", "time_modified"), processed)
      .as[(String, String)].collect().toMap
    assert(statuses("new.txt") == "new")
    assert(statuses("stream.txt") == "modified")
    assert(statuses("spark.txt") == "unchanged")

    val counts = EventStreams.refreshBatch(spark, storeRoot, storeName, listing,
      changed => buildChunks(
        DocumentSource.loadCorpus(spark, corpusDir, "*.txt")
          .join(changed.select(col("name").as("filename")), "filename")))
    assert(counts("new") == 1 && counts("modified") == 1)

    // 4. retrieval over the refreshed store finds the new content
    val after = VectorStore.read(spark, storeRoot, storeName)
    val res2 = RagPipeline.execute(spark, Map(storeName -> after),
      "shuffle partitioning strategies", Seq.empty, embedFn, _ => "",
      RagPipeline.Config(topK = 2, scoreThreshold = 0.0))
    val texts2 = res2.docs.select("text").as[String].collect()
    assert(texts2.exists(_.contains("shuffle partitioning")))
    // stale chunks of the modified file are gone; only rewritten content
    // remains (the short trailing chunk is the new text's overlap window)
    val streamTexts = after.filter(element_at(col("metadata"), "filename") === "stream.txt")
      .select("text").as[String].collect()
    assert(streamTexts.exists(_.contains("state store checkpoints")))
    assert(!streamTexts.exists(_.contains("watermarks")), // old content purged
      s"stale chunk survived refresh: ${streamTexts.mkString("; ")}")
  }

  test("IVF lifecycle: k-means build → assign → store → pruned probe → recall gate") {
    import graft.operators.{Clustering, Similarity}
    import graft.store.AnnStore
    // two well-separated blobs of 4-dim vectors (30 per blob)
    val rows = (0 until 30).map { i =>
      (i.toLong, Seq(1.0f, 0.0f, (i % 5) * 0.01f, 0.0f))
    } ++ (100 until 130).map { i =>
      (i.toLong, Seq(0.0f, 1.0f, 0.0f, (i % 5) * 0.01f))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    // 1. BUILD: Lloyd rounds from two in-distribution seeds
    val init = Seq(0 -> Seq(0.9, 0.1, 0.0, 0.0), 1 -> Seq(0.1, 0.9, 0.0, 0.0))
    val means = Clustering.kmeans(corpus, "embedding", init, iters = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    val codebook = means.groupBy(_._1).map { case (cid, ds) =>
      (cid, ds.sortBy(_._2).map(_._3.toFloat).toSeq)
    }.toSeq.sortBy(_._1)
    assert(codebook.map(_._1) == Seq(0, 1))
    // 2. ASSIGN + 3. STORE partitioned by cell
    val centsDf = codebook.toDF("cid", "cv")
    val assigned = Similarity.assignNearestCentroid(
      corpus, "embedding", "vec_id", centsDf, "cid", "cv")
    val dir = Files.createTempDirectory("graft-e2e-ann").toFile
    val path = s"${dir.getAbsolutePath}/ann"
    AnnStore.write(assigned.select(col("vec_id"), col("embedding"), col("centroid_id")), path)
    // 4. PROBE: nProbe=1 reads one cell directory
    val q = Seq(0.95f, 0.05f, 0.02f, 0.0f)
    val probed = AnnStore.probe(spark, path, codebook, q,
      "embedding", "vec_id", k = 5, nProbe = 1)
    // 5. GATE: with separated blobs, one probed cell holds the true top-5
    val exact = Similarity.topK(corpus, "embedding", q, 5, "COSINE", "vec_id")
      .select(col("vec_id").as("qid2"), col("vec_id"))
    val recall = Similarity.recallAtK(
        probed.select(lit(1L).as("qid2"), col("vec_id")),
        exact.select(lit(1L).as("qid2"), col("vec_id")), "qid2", "vec_id", 5)
      .select("recall").as[Double].head()
    assert(recall == 1.0)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
