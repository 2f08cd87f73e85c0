package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Parquet-backed IVF vector store: the corpus, pre-assigned to coarse
  * centroids ([[Similarity.assignNearestCentroid]]), persisted
  * `partitionBy("centroid_id")` so a probe is a PARTITION-PRUNED scan of
  * the `nProbe` nearest cells — the physical mechanism every
  * "stored partitionBy(centroid_id)" note in [[Similarity]] refers to,
  * made concrete. At 100 TB with nlist=4096 cells, a nProbe=8 query reads
  * ~0.2% of the corpus directories and never touches the rest; the scan's
  * `PartitionFilters` prove the pruning (pinned by IndexStoreSpec's ANN
  * twin). Same store pattern as the term-bucketed [[IndexStore]] and the
  * filename-bucketed [[VectorStore]] — one layout, three stores.
  *
  * Mirrors the reference's IVF index build-after-merge
  * (reference: src/server/app/embed/vector_store.py:266-271, index types
  * embed/schemas.py:17) as a data layout instead of a database index.
  */
object AnnStore {

  /** Persist an assigned corpus (must carry `centroid_id`) partitioned by
    * cell. `repartition` by the partition column first so each cell is
    * written by one task — without it every task writes a sliver of every
    * cell and the store fragments into nTasks × nCells small files. */
  def write(assigned: DataFrame, path: String): Unit =
    assigned
      .repartition(col("centroid_id"))
      .write.partitionBy("centroid_id").mode("overwrite").parquet(path)

  /** Top-k over ONLY the `nProbe` cells nearest the query: the
    * `centroid_id` filter lands in the scan's PartitionFilters, so
    * unprobed cell directories are never opened. Output matches
    * [[Similarity.ivfSearch]] on the same assignment (same probe ranking,
    * same distances, same ties). */
  def probe(spark: SparkSession, path: String,
            centroids: Seq[(Int, Seq[Float])], query: Seq[Float],
            vecCol: String, idCol: String, k: Int, nProbe: Int): DataFrame = {
    val probeIds = Similarity.nearestCentroidIds(centroids, query, nProbe)
    Similarity.topK(
      spark.read.parquet(path).filter(col("centroid_id").isin(probeIds: _*)),
      vecCol, query, k, "COSINE", idCol)
  }
}
