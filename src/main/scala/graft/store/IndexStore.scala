package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed inverted-index store, bucketed by a term hash.
  *
  * The persistence layer for [[graft.operators.Retrieval.invertedIndex]]:
  * posting lists land `partitionBy("bucket")` where bucket =
  * scrambleHash(term-polyhash) mod nBuckets, so a term lookup is a
  * PARTITION-PRUNED scan of one bucket directory — at 100 TB the index
  * shards into nBuckets independent directories and a query touches
  * |query terms| of them, never the full index. The same layout serves the
  * vector side in [[VectorStore]] (filename-hash buckets) — one pattern,
  * two stores.
  *
  * The bucket function is the oracle-replayable hash family
  * ([[graft.plans.HashExpressions]]): tokenPoly 62-bit term hash →
  * xorshift-multiply scramble → mod nBuckets.
  */
object IndexStore {

  /** Bucket column for a term column: scramble the rolling-polynomial term
    * hash (uniform across buckets even for short/similar terms). The
    * 62-bit token hash is reduced mod 2^31-1 BEFORE the scramble — keyHash
    * multiplies by PolyBase1, which would overflow a long on 62-bit input
    * under ANSI arithmetic. */
  def termBucket(termCol: String, nBuckets: Int)(implicit spark: SparkSession): org.apache.spark.sql.Column = {
    graft.plans.HashExpressions.register(spark)
    val th = pmod(
      element_at(call_function("graft_token_polyhashes", col(termCol)), 1),
      lit(graft.plans.HashExpressions.P2n31))
    pmod(graft.operators.Sketches.keyHash(th), lit(nBuckets.toLong)).cast("int")
  }

  /** Write an inverted index (term, df, cf, postings) bucketed by term
    * hash. Overwrites the store path. */
  def write(index: DataFrame, path: String, nBuckets: Int): Unit = {
    implicit val spark: SparkSession = index.sparkSession
    index.withColumn("bucket", termBucket("term", nBuckets))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
  }

  /** Merge a NEW batch's inverted index into a persisted store WITHOUT
    * rebuilding untouched buckets: only the buckets the batch's terms hash
    * into are read, re-aggregated (df/cf sum, posting lists concatenated
    * and re-sorted) and swapped back via the staging-dir + atomic-rename
    * protocol [[VectorStore.upsertPartitioned]] uses — the incremental
    * ingest path, so index maintenance cost scales with the batch, not
    * the corpus. Precondition (standard append ingest): the batch's doc
    * ids are NEW — re-ingesting an existing doc would double-count its
    * postings; delete-then-merge for replacement. An empty batch is a
    * no-op. */
  def merge(spark: SparkSession, path: String, newIndex: DataFrame,
            nBuckets: Int): Unit = {
    implicit val s: SparkSession = spark
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val bucketed = newIndex.withColumn("bucket", termBucket("term", nBuckets))
      .cache()
    val buckets = bucketed.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (buckets.isEmpty) { bucketed.unpersist(); return }
    // partition-pruned read: only the touched buckets are scanned
    val existing = spark.read.parquet(path)
      .filter(col("bucket").isin(buckets.map(Integer.valueOf).toSeq: _*))
    val merged = existing.unionByName(bucketed)
      .groupBy("bucket", "term")
      .agg(sum("df").as("df"), sum("cf").as("cf"),
        sort_array(flatten(collect_list(col("postings")))).as("postings"))
      .select("term", "df", "cf", "postings", "bucket")
    val staging = path + "_staging"
    merged.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging)
    // Bucket swaps are individually atomic (rename), not transactional as
    // a group — a crash between the two moves can leave ONE bucket absent
    // until re-merged (same guarantee as VectorStore.upsertPartitioned).
    // A leftover _old dir from a crashed cleanup is garbage: delete it
    // up front so a previous crash can never wedge future merges.
    buckets.foreach { b =>
      val src = Paths.get(staging, s"bucket=$b")
      val dst = Paths.get(path, s"bucket=$b")
      val old = Paths.get(s"${path}_old_b$b")
      if (Files.exists(old))
        org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
      if (Files.exists(dst)) Files.move(dst, old, StandardCopyOption.ATOMIC_MOVE)
      if (Files.exists(src)) Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      if (Files.exists(old))
        org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
    }
    org.apache.commons.io.FileUtils.deleteDirectory(Paths.get(staging).toFile)
    bucketed.unpersist()
  }

  /** Look up posting lists for `terms`: computes their buckets and reads
    * ONLY those partitions (partition pruning on the bucket filter — the
    * scan's PartitionFilters prove it; pinned by IndexStoreSpec). */
  def lookup(spark: SparkSession, path: String, terms: Seq[String],
             nBuckets: Int): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val buckets = terms.toDF("term")
      .select(termBucket("term", nBuckets).as("b"))
      .distinct().as[Int].collect().toSeq
    spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
  }
}
