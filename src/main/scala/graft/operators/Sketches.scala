package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketches. Spark's `approx_count_distinct` (HyperLogLog++)
  * merges partition sketches in a partitioning-dependent order, so its
  * estimate is not stable across cluster layouts — fine for monitoring,
  * wrong for a reproducibility-gated pipeline. KMV (k minimum hash
  * values, Bar-Yossef et al.) is a pure function of the value SET:
  * deterministic everywhere, mergeable (union = merge the k-min sets),
  * and exactly replayable by the SQL oracle.
  *
  * Scale shape: distinct-of-hash collapses map-side (partial aggregate),
  * the k smallest survive per partition via TakeOrdered's bounded heaps,
  * and only `partitions × k` longs reach the driver-side max. */
object Sketches {

  private val P = graft.plans.HashExpressions.P2n31
  private val Mix = 73244475L // 32-bit integer-hash mixing constant

  /** Scrambled hash of a numeric key into [0, 2^31-1): affine step + two
    * xorshift-multiply rounds. A bare affine hash of consecutive keys is
    * LATTICE-structured (three-distance theorem) and biases k-minimum
    * statistics; the mixer restores the uniform-minima behavior KMV needs.
    * All ops (xor, >>, *, %) are exact in both Spark ANSI and DuckDB, so
    * the oracle replays the identical values. */
  def keyHash(key: Column, base: Long = graft.plans.HashExpressions.PolyBase1): Column = {
    val h0 = pmod(key.cast("long") * base, lit(P))
    val h1 = pmod(h0.bitwiseXOR(shiftright(h0, 16)) * Mix, lit(P))
    pmod(h1.bitwiseXOR(shiftright(h1, 13)) * Mix, lit(P))
  }

  /** KMV estimate of |distinct keyCol|: (k-1) * P / h_k where h_k is the
    * k-th smallest distinct hash. Exact when fewer than k distinct values
    * exist (falls back to the distinct count). Returns a 1-row frame
    * (estimate DOUBLE, n_hashes BIGINT). */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 256): DataFrame = {
    val kmin = df.select(keyHash(col(keyCol)).as("h"))
      .distinct()
      .orderBy("h")
      .limit(k)
    kmin.agg(
      when(count(lit(1)) < k, count(lit(1)).cast("double"))
        .otherwise(lit((k - 1).toDouble) * P / max("h")).as("estimate"),
      count(lit(1)).as("n_hashes"))
  }
}
