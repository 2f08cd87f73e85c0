package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-quality evaluation over scored corpora — the measurement
  * half of model-based data curation: a fastText/DCLM-style quality
  * score (see [[TextQuality.classifierScore]]) is only trusted after its
  * ranking power (AUC) and calibration are measured against a reference
  * label. The reference evaluates retrieval answers one row at a time
  * (reference: src/server/app/testbed package); these are the corpus-scale
  * equivalents for the FILTERING models a 100 TB pipeline runs first.
  *
  * Replay-exactness: AUC is computed from the Mann-Whitney rank-sum in
  * DOUBLED integer units (`2U` — ties contribute exactly 1 unit each),
  * so everything up to the final division is BIGINT arithmetic, exact
  * and partitioning-independent; calibration-bin members are integers
  * plus one fixed float binning expression mirrored in the oracle.
  */
object Evaluation {

  /** Exact ROC-AUC by Mann-Whitney rank-sum with the standard tie
    * correction: `AUC = [Σ_s n_pos(s)·(2·cumNeg(<s) + n_neg(s))] /
    * (2·P·N)`, accumulated over DISTINCT score values in ascending
    * order. Equal scores contribute ½ per (pos, neg) pair — doubling
    * keeps the numerator an exact BIGINT.
    *
    * Scale shape: one groupBy collapses the corpus to its distinct
    * score values map-side; the ordered cumulative window then runs
    * over |distinct scores| rows, not |corpus| rows, and the result is
    * a single row. Returns (n_pos, n_neg, u2, auc). */
  def aucByRankSum(scored: DataFrame, scoreCol: String,
                   labelCol: String): DataFrame = {
    val byScore = scored
      .groupBy(col(scoreCol).as("_s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("_np"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("_nn"))
    val w = Window.orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("_cum_nn", coalesce(sum("_nn").over(w), lit(0L)))
      .agg(sum("_np").cast("long").as("n_pos"),
        sum("_nn").cast("long").as("n_neg"),
        sum(col("_np") * (lit(2L) * col("_cum_nn") + col("_nn")))
          .cast("long").as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double") / (lit(2L) * col("n_pos") * col("n_neg")))
          .as("auc"))
  }

  /** Reliability diagram: bin a score known to lie in [-0.5, 0.5]
    * (a [[TextQuality.classifierScore]] margin) into `nBins` fixed
    * equal-width bins and report each bin's size and positive fraction —
    * a well-calibrated score's `frac_pos` rises monotonically with the
    * bin. Fixed bin edges (not data-derived quantiles) keep the binning
    * a pure per-row function: zero-shuffle until the final small
    * aggregation. Returns (bin, n, n_pos, frac_pos, min_score,
    * max_score) for non-empty bins. */
  def calibrationBins(scored: DataFrame, scoreCol: String,
                      labelCol: String, nBins: Int = 10): DataFrame =
    scored
      // fixed float expression, mirrored verbatim in the oracle
      .withColumn("bin",
        least(greatest(floor((col(scoreCol) + lit(0.5)) * nBins).cast("int"),
          lit(0)), lit(nBins - 1)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        min(scoreCol).as("min_score"),
        max(scoreCol).as("max_score"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n")).as("frac_pos"),
        col("min_score"), col("max_score"))
}
