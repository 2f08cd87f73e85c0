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
