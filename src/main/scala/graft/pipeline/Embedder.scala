package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding stage.
  *
  * The reference embeds chunks in batches of 500 against a remote model with
  * an optional `60/rpm` inter-batch sleep
  * (reference: src/server/app/embed/vector_store.py:158-186
  * `_embed_documents_in_batches`). In Spark the same shape is
  * `mapPartitions` with intra-partition batching: each task groups its rows
  * into batches and calls the (pluggable) embedding function once per batch —
  * the canonical Spark batched-UDF pattern. No shuffle; parallelism = input
  * partitions.
  *
  * This environment has no network, so the default embedder is a
  * deterministic seeded hash projection (pure `String => Array[Float]`,
  * L2-normalized) — every test and oracle check is exactly reproducible.
  */
object Embedder {

  type EmbedFn = Seq[String] => Seq[Array[Float]]

  /** Deterministic stub: token hashes scattered into `dim` buckets (signed,
    * feature-hashing style), then L2-normalized. Same text → same vector.
    * The token hash is the engine's rolling polynomial
    * (graft.plans.HashExpressions.PolyBase1 mod 2^31-1) with the sign drawn
    * from bit 6 — SQL-expressible on purpose, so the end-to-end
    * chunk→embed→search pipeline can be replayed by the DuckDB oracle. */
  def stubEmbed(dim: Int): EmbedFn = texts => texts.map { t =>
    val v = new Array[Float](dim)
    var i = 0
    val toks = t.toLowerCase.split("\\W+").filter(_.nonEmpty)
    while (i < toks.length) {
      val s = toks(i)
      var h = 0L; var j = 0
      while (j < s.length) {
        h = (h * graft.plans.HashExpressions.PolyBase1 + s.charAt(j)) % 2147483647L
        j += 1
      }
      val idx = (h % dim).toInt
      v(idx) += (if (((h >> 6) & 1L) == 0L) 1f else -1f)
      i += 1
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }

  /** Batch-embed `textCol` into an `embedding ARRAY<FLOAT>` column.
    * `batchSize` mirrors the reference's 500 (vector_store.py:164);
    * `rateLimitRpm > 0` sleeps `60/rpm` seconds between batches within each
    * partition (vector_store.py:183-186) — per-partition, so the effective
    * aggregate rate is rpm × parallelism; size the limit for the provider
    * accordingly (or run the embed stage with a capped partition count). */
  def embed(df: DataFrame, textCol: String, fn: EmbedFn,
            batchSize: Int = 500, rateLimitRpm: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))
    val idx = df.schema.fieldIndex(textCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      var first = true
      it.grouped(batchSize).flatMap { batch =>
        if (!first && rateLimitRpm > 0) Thread.sleep(60000L / rateLimitRpm)
        first = false
        val vecs = fn(batch.map(r => Option(r.getString(idx)).getOrElse("")))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }

  /** Doc-level mean-pooling of chunk embeddings — the standard way a
    * chunked corpus gets one retrieval/clustering vector per document
    * (average of its chunk vectors). Emits the pooled vector's summary,
    * not the array itself: chunk count and the pooled L2 norm — the norm
    * IS the coherence signal (chunks pointing the same way pool to norm
    * ≈ 1 after unit-chunk embedding; topically scattered docs pool
    * toward 0), which makes it the doc-level drift/quality feature.
    *
    * Replay-exactness: per-dimension means accumulate as DECIMAL(38,18)
    * sums of exact float→double widenings over a count divide; the norm
    * is a decimal sum of correctly-rounded squared means under one IEEE
    * sqrt.
    *
    * Shape: one posexplode fan-out (rows × dim) that collapses to
    * (group, dim) partial sums map-side, one (group)-keyed rollup — the
    * standard distributed vector-mean; nothing driver-side. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    def d18(c: org.apache.spark.sql.Column) = c.cast("decimal(38,18)")
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "_x")))
      .groupBy(col(groupCol), col("dim"))
      .agg(count(lit(1)).as("_n"),
        sum(d18(col("_x").cast("double"))).cast("double").as("_s"))
      .withColumn("_m", col("_s") / col("_n"))
      .groupBy(col(groupCol))
      .agg(max("_n").as("n_chunks"),
        sqrt(sum(d18(col("_m") * col("_m"))).cast("double")).as("pool_norm"))
  }
}
