package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window character splitter with overlap.
  *
  * Semantics mirror the reference splitter
  * (reference: src/server/app/embed/document.py:69-110):
  *  - windows start at 0 and advance by `chunkSize - ceil(chunkOverlap)`
  *  - every start strictly below the text length produces a chunk
  *    (the final chunk may be shorter than `chunkSize`)
  *  - `start_index` is recorded per chunk, `id = "{docKey}_{idx}"`
  *    (reference: embed/document.py:113-130, process_metadata)
  *  - constraint `0 <= overlap < size` is validated up front
  *    (reference: embed/document.py:80-86)
  *
  * Implementation: pure Catalyst built-ins (`sequence` → `transform` →
  * `posexplode`) — no UDF, so the whole operator stays inside whole-stage
  * codegen, the scan underneath keeps column pruning, and the operator is
  * trivially parallel: each input row expands independently, no shuffle.
  * At 100 TB the only knob that matters is input split size
  * (`spark.sql.files.maxPartitionBytes`), not this operator.
  */
object Chunker {

  /** Number of chunks for a text of length `len`: ceil(max(len,1) / step)
    * via the while-start-below-length rule. Empty text yields 0 chunks. */
  def chunkStarts(len: Column, step: Int): Column =
    when(len <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), len - 1, lit(step)))

  /** Split `textCol` into overlapping windows.
    *
    * Output: input columns plus `chunk_index` (int, 0-based per document),
    * `start_index` (int), `chunk` (string).
    */
  def chunk(df: DataFrame, textCol: String, chunkSize: Int, chunkOverlap: Int): DataFrame = {
    val overlap = math.ceil(chunkOverlap.toDouble).toInt
    require(chunkSize > 0, s"chunk_size must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"chunk_overlap must be in [0, chunk_size), got $overlap for size $chunkSize")
    val step = chunkSize - overlap

    val starts = chunkStarts(length(col(textCol)), step)
    df.select(col("*"), posexplode(starts).as(Seq("chunk_index", "start_index")))
      // substring is 1-based; chunkSize caps the window, the tail is shorter
      .withColumn("chunk", expr(s"substring($textCol, start_index + 1, $chunkSize)"))
  }

  /** Chunk + enrich with a chunk id `"{key}_{idx}"`, mirroring
    * process_metadata (reference: embed/document.py:113-130). */
  def chunkWithIds(df: DataFrame, keyCol: String, textCol: String,
                   chunkSize: Int, chunkOverlap: Int): DataFrame =
    chunk(df, textCol, chunkSize, chunkOverlap)
      .withColumn("chunk_id", concat(col(keyCol).cast("string"), lit("_"), col("chunk_index")))

  /** Sequence-packing assignment for training batches: documents are
    * concatenated in (`shardCol`, `orderCol`) order into fixed
    * `budget`-token windows (the FlashAttention-style packed-batch
    * layout). A doc starting at exclusive-prefix-sum position s gets
    * `pack_id = s div budget`; `spans_boundary` marks docs whose token
    * run crosses into the next window (the trainer either splits them
    * there or masks across the seam). Pure window arithmetic — exact,
    * deterministic, engine-replayable.
    *
    * Scale shape: the running sum partitions by `shardCol` (shard ≈ a
    * training-data file group), so each shard's cumsum runs independently
    * — no global window bottleneck; pack ids are per-shard. */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("_start", coalesce(sum(tokensCol).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"_start div $budget").cast("int"))
      .withColumn("spans_boundary",
        expr(s"(_start + $tokensCol - 1) div $budget").cast("int") > col("pack_id"))
      .drop("_start")
  }
}
