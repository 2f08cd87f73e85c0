package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / similarity column functions over `ARRAY<FLOAT|DOUBLE>`.
  *
  * Semantics mirror the distance strategies the reference exposes
  * (reference: src/server/app/embed/schemas.py:12 — COSINE, DOT, EUCLIDEAN)
  * and the retrieval score normalization
  * (reference: src/server/app/mcp/tools/vs_retriever.py:267-274).
  *
  * Implementation note (scale): these are composed from Catalyst built-ins
  * (`zip_with` / `aggregate`), so the plan stays declarative — no opaque Scala
  * UDF, full column pruning and filter pushdown around them. Arithmetic is
  * promoted to DOUBLE and accumulated left-to-right so results are
  * reproducible across engines (DuckDB oracle computes the same fold).
  * For the 100 TB hot path there is a codegen'd native expression variant in
  * [[graft.plans.VectorExpressions]]; these HOF forms are the portable
  * reference semantics both are tested against.
  */
object VectorFunctions {

  /** Left-fold sum of an array<double> column. */
  private def fold(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two equal-length vectors, in double precision. */
  def dotProduct(a: Column, b: Column): Column =
    fold(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Euclidean (L2) norm of a vector. */
  def l2Norm(a: Column): Column =
    sqrt(fold(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Euclidean distance ||a - b||. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(fold(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    })))

  /** Cosine similarity in [-1, 1]; 0 when either vector has zero norm. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, 0.0).otherwise(dotProduct(a, b) / denom)
  }

  /** Cosine distance in [0, 2] — what an ANN store returns for COSINE
    * (reference implies this range via `1 - d/2` normalization,
    * mcp/tools/vs_retriever.py:267-269). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** Normalize a raw distance to a similarity score in [0, 1], exactly as
    * the reference does per distance strategy
    * (mcp/tools/vs_retriever.py:267-274):
    * COSINE → 1 - d/2; DOT → d; else → 1/(1+d). */
  def normalizeScore(distance: Column, strategy: String): Column =
    strategy.toUpperCase match {
      case "COSINE" => lit(1.0) - distance / 2.0
      case "DOT"    => distance
      case _        => lit(1.0) / (lit(1.0) + distance)
    }

  /** L2-normalize a vector (unit length); zero vector passes through. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Per-vector symmetric int8 quantization scale: max |x| / 127.
    * At 100 TB this is the 4× storage cut for a vector store —
    * `ARRAY<FLOAT>` → `ARRAY<TINYINT>` + one float scale per row. */
  def quantScale(a: Column): Column =
    array_max(transform(a, x => abs(x.cast("double")))) / 127.0

  /** Symmetric int8 quantization of a float vector given its scale;
    * zero scale (zero vector) quantizes to zeros. */
  def quantizeInt8(a: Column, scale: Column): Column =
    when(scale === 0.0, transform(a, _ => lit(0).cast("int")))
      .otherwise(transform(a, x => round(x.cast("double") / scale, 0).cast("int")))

  /** Dequantized reconstruction: q * scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Max absolute reconstruction error of int8 quantization — the
    * quality metric that decides whether the 4× storage cut is safe for a
    * given embedding family (bounded by scale/2 for symmetric rounding). */
  def quantError(a: Column, q: Column, scale: Column): Column =
    array_max(zip_with(a, dequantize(q, scale),
      (x, r) => abs(x.cast("double") - r)))
}
