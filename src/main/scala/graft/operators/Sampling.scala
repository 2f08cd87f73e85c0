package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the reproducibility-critical piece of a
  * training-data pipeline. `rand()`-based sampling (including
  * `df.stat.sampleBy`) depends on partitioning and row order, so two runs
  * of the same job can emit different corpora; hash-bucket sampling is a
  * pure function of the row key: stable across runs, cluster sizes, AQE
  * re-plans, and engines (the DuckDB oracle replays it bit-for-bit).
  *
  * Shape at 100 TB: the bucket is a scalar projection (no shuffle, no
  * state); sampling is a pushable filter; split assignment is a column.
  */
object Sampling {

  private val P = graft.plans.HashExpressions.P2n31
  private val B1 = graft.plans.HashExpressions.PolyBase1
  private val B2 = graft.plans.HashExpressions.PolyBase2

  /** Deterministic bucket in [0, buckets) from a numeric key: affine hash
    * mod 2^31-1 (key * base stays < 2^62 for keys < 2^31 — ANSI-safe). */
  def hashBucket(key: Column, buckets: Int, base: Long = B1): Column =
    pmod(key.cast("long") * base, lit(P)) % buckets

  /** Stratified sample: keep a row when its bucket falls below the
    * stratum's percentage (0-100). Rates is (stratumValue -> pct). */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (v, p)) =>
      when(col(stratumCol) === v, p).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), 100) < pct)
  }

  /** Deterministic train/eval split on an independent hash (base B2 so it
    * is uncorrelated with sampling buckets). */
  def trainTestSplit(df: DataFrame, keyCol: String, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol), 100, B2) < trainPct, "train").otherwise("eval"))
}
