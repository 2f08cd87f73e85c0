package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval
import graft.store.IndexStore

class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  test("index store round-trip: lookup returns exactly the written postings") {
    val df = Seq((1L, "a b a"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(df, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toFile
    val path = s"${dir.getAbsolutePath}/idx"
    IndexStore.write(idx, path, nBuckets = 4)
    val got = IndexStore.lookup(spark, path, Seq("a", "c"), 4)
      .select("term", "df", "cf").as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.keySet == Set("a", "c"))
    assert(got("a") == ((2L, 3L))) // docs 1 (tf 2) and 3 (tf 1)
    assert(got("c") == ((1L, 1L)))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("lookup partition-prunes to the probed term buckets") {
    val docs = (0 until 64).map(i => (i.toLong, s"term$i")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_idx2").toFile
    val path = s"${dir.getAbsolutePath}/idx"
    IndexStore.write(idx, path, nBuckets = 8)
    val look = IndexStore.lookup(spark, path, Seq("term7"), 8)
    val p = look.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the bucket filter must land in PartitionFilters (pruned directories),
    // not as a post-scan Filter over the whole index
    assert(p.contains("PartitionFilters") && p.contains("bucket"))
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(p).isDefined, p)
    assert(look.select("term").as[String].collect().toSeq == Seq("term7"))
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
