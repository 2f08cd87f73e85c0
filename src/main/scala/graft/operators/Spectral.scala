package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dominant-direction analysis of an embedding corpus by distributed
  * power iteration — the spectral diagnostic behind "all-but-the-top"
  * embedding post-processing (Mu & Viswanath 2018): stub or real encoder
  * embeddings concentrate variance in a few directions, and ANN recall /
  * cosine contrast improve when the top component is projected out. This
  * computes that top component (of the UNCENTERED second-moment matrix
  * XᵀX, i.e. the top right-singular direction of the corpus matrix)
  * without ever materializing the d×d Gram matrix.
  *
  * Each round maps v → XᵀXv in two corpus passes folded into ONE
  * aggregate: per row the scalar s = x·v (a 64-element decimal fold —
  * exact, order-independent), then d per-dimension decimal sums
  * Σᵢ sᵢ·xᵢ[d] in a single hash aggregate with map-side partials —
  * nothing corpus-sized shuffles; only d running sums per partition.
  * The d-vector of sums is normalized IN-ENGINE (decimal norm², IEEE
  * sqrt, one divide) and the unit vector re-enters the next round as a
  * collected literal (d doubles through the driver per round — bounded,
  * and `Double.toString` round-trips bit-exactly).
  *
  * Replay-exactness: every float→double widening is exact; every product
  * and divide is one correctly-rounded double op in a fixed
  * parenthesization; every SUM accumulates as DECIMAL(38,18) (exact,
  * commutative); sqrt is IEEE-correctly-rounded (NOTES parity rules 5/11)
  * — so a DuckDB oracle replays each round bit-for-bit with unnest +
  * decimal sums.
  *
  * Caveat: power iteration needs v₀ not orthogonal to the top component;
  * the uniform start `1/sqrt(d)` works for any corpus with a nonzero
  * mean-ish dominant direction (a corpus engineered to be exactly
  * orthogonal to uniform would converge to a lower component — pass a
  * different `v0` then).
  */
object Spectral {

  private def d18(c: Column): Column = c.cast("decimal(38,18)")

  /** Per-row dot product with a constant vector as an exact decimal fold:
    * products are correctly-rounded double ops truncated to
    * DECIMAL(38,18), summed exactly in array order (= any order). */
  private def dotConst(vecCol: String, v: Array[Double]): Column = {
    val varr = array(v.map(lit): _*)
    aggregate(
      zip_with(col(vecCol), varr, (x, w) => d18(x.cast("double") * w)),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)"),
      (acc, p) => d18(acc + p)).cast("double")
  }

  /** One power-iteration round: returns the UN-normalized image w = XᵀXv
    * plus its norm, as a (dim, w, nrm) frame of `dim` rows. */
  private def roundFrame(df: DataFrame, vecCol: String, dim: Int,
                         v: Array[Double]): DataFrame = {
    val withS = df.select(dotConst(vecCol, v).as("_s"), col(vecCol).as("_v"))
    val sumCols = (0 until dim).map { d =>
      sum(d18(col("_s") * element_at(col("_v"), d + 1).cast("double")))
        .cast("double").as(s"_w$d")
    }
    val sums = withS.agg(sumCols.head, sumCols.tail: _*)
    val wrows = sums.select(
      posexplode(array((0 until dim).map(d => col(s"_w$d")): _*))
        .as(Seq("dim", "w")))
    val nrm = wrows
      .agg(sum(d18(col("w") * col("w"))).cast("double").as("_n2"))
      .select(sqrt(col("_n2")).as("nrm"))
    wrows.crossJoin(broadcast(nrm))
  }

  /** Top principal direction of the uncentered second moment after
    * `rounds` power iterations from the uniform unit start (or `v0`).
    * Returns `dim` rows (dim INT, loading DOUBLE, lambda DOUBLE) where
    * `loading` is the unit-vector entry and `lambda` = ‖XᵀXv‖ of the
    * final round — the dominant-eigenvalue estimate of XᵀX (its share of
    * Σ‖x‖² is the variance-concentration audit number). */
  def topComponent(df: DataFrame, vecCol: String, dim: Int, rounds: Int,
                   v0: Option[Array[Double]] = None): DataFrame = {
    require(dim >= 1 && rounds >= 1, "need dim >= 1 and rounds >= 1")
    var v = v0.getOrElse(Array.fill(dim)(1.0 / math.sqrt(dim.toDouble)))
    require(v.length == dim, s"v0 must have $dim entries")
    var frame: DataFrame = null
    (1 to rounds).foreach { r =>
      frame = roundFrame(df, vecCol, dim, v)
      // d doubles through the driver per round — bounded by the embedding
      // dimension, never by the corpus; the final round stays lazy (the
      // caller's action is its only execution)
      if (r < rounds)
        v = frame.orderBy("dim")
          .select((col("w") / col("nrm")).as("vd"))
          .collect().map(_.getDouble(0))
    }
    frame.select(col("dim").cast("int").as("dim"),
      (col("w") / col("nrm")).as("loading"), col("nrm").as("lambda"))
  }

  /** Embedding-space anisotropy audit (Ethayarajh 2019 / the
    * all-but-the-top motivation): the ratio ‖μ‖ / mean‖x‖ of the mean
    * vector's norm to the mean vector norm. Isotropic embeddings score
    * ~0 (directions cancel); a large common component — which crushes
    * cosine contrast and ANN recall — scores toward 1 and says "run
    * [[topComponent]] removal before indexing". Also reports the norm
    * distribution (mean, sd, CV): high norm variance breaks
    * inner-product vs cosine interchangeability. One aggregate with
    * dim+3 decimal sums; per-row norms round to 6 before accumulating
    * (the distortion-family parity discipline). */
  def anisotropyAudit(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val base = df.select(col(vecCol).as("_v"))
      .withColumn("_nrm", round(sqrt(expr(
        "aggregate(zip_with(_v, _v, (x, y) -> cast(x as double) * y), " +
          "0D, (a, b) -> a + b)")), 6))
    val dimSums = (0 until dim).map(d =>
      sum(d18(element_at(col("_v"), d + 1).cast("double")))
        .cast("double").as(s"_m$d"))
    val aggCols = Seq(count(lit(1)).as("n"),
      sum(d18(col("_nrm"))).cast("double").as("s1"),
      sum(d18(col("_nrm") * col("_nrm"))).cast("double").as("s2")) ++ dimSums
    val sums = base.agg(aggCols.head, aggCols.tail: _*)
    val muNorm2 = (0 until dim).map { d =>
      val m = col(s"_m$d") / col("n")
      m * m
    }.reduce(_ + _) // fixed left association over dims, oracle-replayable
    sums
      .withColumn("mean_norm", col("s1") / col("n"))
      .withColumn("sd_norm", sqrt(
        (col("s2") - col("s1") * col("s1") / col("n")) / col("n")))
      .withColumn("mu_norm", sqrt(muNorm2))
      .select(col("n"), round(col("mean_norm"), 6).as("mean_norm"),
        round(col("sd_norm"), 6).as("sd_norm"),
        round(col("sd_norm") / col("mean_norm"), 6).as("cv_norm"),
        round(col("mu_norm"), 6).as("mu_norm"),
        round(col("mu_norm") / col("mean_norm"), 6).as("anisotropy"))
  }

  /** Embedding snapshot drift: split the corpus by `splitCol` (e.g.
    * old vs new ingest batch), compare the two MEAN vectors — cosine
    * between them, the L2 gap, and the `topK` dimensions by absolute
    * mean shift. The "did the encoder (or the corpus) move" monitor a
    * standing ANN index needs before trusting recall numbers across
    * re-embeds: a cosine near 1 with a small gap means old scores stay
    * comparable; a localized top-dims shift points at specific
    * feature drift rather than global re-scaling.
    *
    * Scale shape: one posexplode to (dim, half) grain with map-side
    * partial sums; everything after runs on 2·dim rows. Per-dim sums
    * decimal-accumulate; cosine/L2 are fixed-parenthesization trees
    * over the dim-row frame (decimal window sums, IEEE sqrt). */
  def snapshotDrift(df: DataFrame, vecCol: String, splitCol: String,
                    topK: Int): DataFrame = {
    val wAll = Window.partitionBy(lit(1))
    val byDim = df.select(col(splitCol).as("_h"),
        posexplode(col(vecCol)).as(Seq("dim", "_x")))
      .groupBy("dim")
      .agg(
        sum(when(col("_h"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("_h"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("_h"), d18(col("_x").cast("double")))).cast("double")
          .as("_sa"),
        sum(when(!col("_h"), d18(col("_x").cast("double")))).cast("double")
          .as("_sb"))
      .withColumn("mean_a", col("_sa") / col("n_a"))
      .withColumn("mean_b", col("_sb") / col("n_b"))
      .withColumn("delta", col("mean_a") - col("mean_b"))
    val glob = byDim
      .withColumn("_dot", sum(d18(col("mean_a") * col("mean_b")))
        .over(wAll).cast("double"))
      .withColumn("_na2", sum(d18(col("mean_a") * col("mean_a")))
        .over(wAll).cast("double"))
      .withColumn("_nb2", sum(d18(col("mean_b") * col("mean_b")))
        .over(wAll).cast("double"))
      .withColumn("_gap2", sum(d18(col("delta") * col("delta")))
        .over(wAll).cast("double"))
      .withColumn("cos_means",
        col("_dot") / (sqrt(col("_na2")) * sqrt(col("_nb2"))))
      .withColumn("l2_gap", sqrt(col("_gap2")))
      .withColumn("_rk", row_number().over(Window.partitionBy(lit(1))
        .orderBy(abs(col("delta")).desc, col("dim"))))
    glob.filter(col("_rk") <= topK)
      .select(col("_rk").as("rank"), col("dim"), col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"),
        round(col("mean_b"), 6).as("mean_b"),
        round(col("delta"), 6).as("delta"),
        round(col("cos_means"), 9).as("cos_means"),
        round(col("l2_gap"), 6).as("l2_gap"))
      .orderBy("rank")
  }
}
