package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chunk JSON sink/source (reference S7): chunks round-trip through the
  * LangChain-shaped JSON files the reference writes —
  * `{"kwargs": {"page_content": ..., "metadata": {...}}, "id": ...}`
  * (reference: embed/document.py:323-353, doc_to_json / json_to_doc).
  *
  * Implemented as plain `df.write.json` / `spark.read.schema(...).json` —
  * distributed, splittable, no driver round-trip.
  */
object ChunkJson {

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("kwargs", StructType(Seq(
      StructField("page_content", StringType),
      StructField("metadata", MapType(StringType, StringType)))))))

  /** Write chunks (id, text, metadata) in the reference's JSON shape. */
  def write(chunks: DataFrame, path: String): Unit =
    chunks.select(col("id"),
        struct(col("text").as("page_content"), col("metadata").as("metadata")).as("kwargs"))
      .write.mode("overwrite").json(path)

  /** Read the JSON shape back to (id, text, metadata). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)
      .select(col("id"), col("kwargs.page_content").as("text"),
        col("kwargs.metadata").as("metadata"))

  /** CSV sink with header (reference S14, embed/utils.py:109-122). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
