package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crowd-annotation quality operators: synthetic replayable annotators,
  * Dawid–Skene confusion-matrix EM, and chance-corrected agreement
  * (Krippendorff's alpha / Fleiss' kappa).
  *
  * Reference analog: the testbed's judge/grader loop
  * (`/root/reference/src/server/app/testbed/judge.py`) scores answers with a
  * single LLM judge; at training-data scale labels come from MANY noisy
  * raters (or prompted judge variants), and the aggregation/QA layer —
  * who is reliable, what does the panel agree on — is the operator the
  * reference leaves implicit. Everything here is sufficient-statistics
  * shaped: the corpus is touched once to build per-item label patterns,
  * and EM/agreement run on the tiny pattern table, so cost at 100 TB is
  * the one scan. */
object Annotation {

  /** Fabricate `annotators.size` deterministic noisy raters over a
    * ground-truth class column: rater j reports the true class with
    * probability accNum/accDen (decided by the replayable key hash with
    * base `flipBase`), else one of the OTHER classes picked by a second
    * hash (base `pickBase`). Pure map-side projection; the same recipe
    * replays verbatim in the DuckDB oracle. Returns
    * (id, cls, y0..y{J-1}). */
  def synthAnnotations(df: DataFrame, idCol: String, clsCol: String,
                       classes: Seq[String],
                       annotators: Seq[(Long, Long, Int, Int)]): DataFrame = {
    require(classes.size >= 2, "need >= 2 classes")
    val k = classes.size
    val cols = annotators.zipWithIndex.map {
      case ((flipBase, pickBase, accNum, accDen), j) =>
        val flip = Sketches.keyHash(col(idCol), flipBase)
        val pick = pmod(Sketches.keyHash(col(idCol), pickBase),
          lit((k - 1).toLong)).cast("int")
        // wrong-label pick via a per-class CASE ladder (no lambdas: DuckDB
        // list_filter can't capture row columns — NOTES rule 8)
        val wrong = classes.map { c =>
          val others = classes.filterNot(_ == c)
          when(col(clsCol) === c,
            element_at(array(others.map(lit): _*), pick + 1))
        }.reduceRight((a, b) => a.otherwise(b))
        when(flip % accDen < accNum, col(clsCol)).otherwise(wrong).as(s"y$j")
    }
    df.select(col(idCol).as("id") +: col(clsCol).as("cls") +: cols: _*)
  }

  /** Dawid–Skene (1979) EM over a wide annotation frame (id, cls,
    * y0..y{J-1}): learn per-rater confusion matrices theta_j[c, l] and
    * class priors pi_c WITHOUT looking at `cls`, then report them next to
    * the empirically-true confusion (which does use `cls`) — the
    * unsupervised-recovers-truth story. The frame collapses to <= k^J
    * label-pattern counts; E-step (posterior over latent class) and
    * M-step (re-estimated pi/theta) are fixed double expression trees
    * over those counts with decimal-accumulated sums, so `iters` rounds
    * replay engine-identically (same discipline as
    * [[Linkage.fellegiSunterEm]]). Symmetric diagonal-heavy starts
    * (theta diag 0.7, off-diag split evenly; pi uniform) keep the latent
    * classes aligned with the label values via the majority signal.
    *
    * Output: one row per (annotator, true_class, label) with theta_em,
    * theta_true, pi_em. */
  def dawidSkene(wide: DataFrame, nAnnotators: Int, classes: Seq[String],
                 iters: Int = 2): DataFrame = {
    require(iters >= 1 && nAnnotators >= 2, "need iters>=1, >=2 raters")
    val k = classes.size
    val js = 0 until nAnnotators
    val cs = 0 until k
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val patterns = wide.groupBy(js.map(j => col(s"y$j")): _*)
      .agg(count(lit(1)).as("cnt"))
    val s = wide.sparkSession
    val offDiag = 0.3 / (k - 1)
    val init = s.range(1).select(
      cs.map(c => lit(1.0 / k).as(s"pi$c")) ++
        (for { j <- js; c <- cs; l <- cs } yield
          lit(if (c == l) 0.7 else offDiag).as(s"t${j}_${c}_$l")): _*)
    val fin = (1 to iters).foldLeft(init) { (params, _) =>
      // E-step: posterior mu_c per pattern, classes summed in fixed order
      val withP = patterns.crossJoin(broadcast(params))
      val pm = cs.map { c =>
        js.foldLeft(col(s"pi$c")) { (acc, j) =>
          acc * cs.map(l => when(col(s"y$j") === classes(l),
            col(s"t${j}_${c}_$l"))).reduceRight(_ otherwise _)
        }.as(s"pm$c")
      }
      val withMu = withP.select(col("*") +: pm: _*)
        .withColumn("_z", cs.map(c => col(s"pm$c")).reduce(_ + _))
        .select(col("*") +: cs.map(c =>
          (col(s"pm$c") / col("_z")).as(s"mu$c")): _*)
      // M-step: decimal-accumulated weighted counts -> new pi / theta
      val aggs =
        sum(d18(col("cnt"))).cast("double").as("_n") +:
          (cs.map(c => sum(d18(col(s"mu$c") * col("cnt"))).cast("double")
            .as(s"_w$c")) ++
            (for { j <- js; c <- cs; l <- cs } yield
              sum(d18(col(s"mu$c") * col("cnt") *
                when(col(s"y$j") === classes(l), 1L).otherwise(0L)))
                .cast("double").as(s"_w${j}_${c}_$l")))
      withMu.agg(aggs.head, aggs.tail: _*)
        .select(cs.map(c => (col(s"_w$c") / col("_n")).as(s"pi$c")) ++
          (for { j <- js; c <- cs; l <- cs } yield
            (col(s"_w${j}_${c}_$l") / col(s"_w$c")).as(s"t${j}_${c}_$l")): _*)
    }
    // empirical truth: P(y_j = l | cls = c), exact integer ratio
    val truthRows = js.map { j =>
      wide.groupBy(col("cls").as("true_class"), col(s"y$j").as("label"))
        .agg(count(lit(1)).as("_nl"))
        .withColumn("_nc", sum("_nl").over(
          org.apache.spark.sql.expressions.Window.partitionBy("true_class")))
        .select(lit(j).as("annotator"), col("true_class"), col("label"),
          (col("_nl").cast("double") / col("_nc")).as("theta_true"))
    }.reduce(_ unionByName _)
    import s.implicits._
    val grid = (for { j <- js; c <- cs; l <- cs } yield
      (j, classes(c), classes(l))).toDF("annotator", "true_class", "label")
    val emLong = grid.crossJoin(broadcast(fin))
      .withColumn("theta_em",
        (for { j <- js; c <- cs; l <- cs } yield
          when(col("annotator") === j && col("true_class") === classes(c) &&
            col("label") === classes(l), col(s"t${j}_${c}_$l")))
          .reduceRight(_ otherwise _))
      .withColumn("pi_em", cs.map(c =>
        when(col("true_class") === classes(c), col(s"pi$c")))
        .reduceRight(_ otherwise _))
      .select("annotator", "true_class", "label", "theta_em", "pi_em")
    emLong.join(truthRows, Seq("annotator", "true_class", "label"), "left")
      .select(col("annotator"), col("true_class"), col("label"),
        round(col("theta_em"), 6).as("theta_em"),
        round(coalesce(col("theta_true"), lit(0.0)), 6).as("theta_true"),
        round(col("pi_em"), 6).as("pi_em"))
      .orderBy("annotator", "true_class", "label")
  }

  /** Chance-corrected inter-rater agreement over the same wide frame:
    * Krippendorff's alpha (nominal metric, complete data), Fleiss'
    * kappa, and raw pairwise agreement. Every numerator/denominator is
    * an exact BIGINT built from per-item per-class count n_ic (all
    * products bounded well under 2^53 — see the int->double parity rule),
    * so each metric is one or two double divisions over exact integers:
    *   alpha = 1 - Num_o*(T-1) / ((m-1)*Num_e),  T = n*m,
    *   Num_o = sum_i sum_c n_ic*(m - n_ic),  Num_e = T^2 - sum_c P_c^2.
    * One scan to n_ic, one k-row marginal — agreement at 100 TB costs
    * the scan. */
  def agreementMetrics(wide: DataFrame, nAnnotators: Int,
                       classes: Seq[String]): DataFrame = {
    val m = nAnnotators
    val js = 0 until m
    // per-item per-class counts, kept wide: nc0..nc{k-1}
    val nic = wide.select(col("id") +: classes.zipWithIndex.map {
      case (c, i) =>
        js.map(j => when(col(s"y$j") === c, 1L).otherwise(0L))
          .reduce(_ + _).as(s"nc$i")
    }: _*)
    val aggCols = count(lit(1)).as("n_items") +:
      (classes.indices.map(i =>
        sum(col(s"nc$i") * (lit(m.toLong) - col(s"nc$i"))).as(s"_o$i")) ++
        classes.indices.map(i =>
          sum(col(s"nc$i") * (col(s"nc$i") - 1L)).as(s"_p$i")) ++
        classes.indices.map(i => sum(col(s"nc$i")).as(s"_m$i")))
    val per = nic.agg(aggCols.head, aggCols.tail: _*)
    val numO = classes.indices.map(i => col(s"_o$i")).reduce(_ + _)
    val numP = classes.indices.map(i => col(s"_p$i")).reduce(_ + _)
    val sumSq = classes.indices.map(i => col(s"_m$i") * col(s"_m$i"))
      .reduce(_ + _)
    val t = col("n_items") * m
    val base = per.select(col("n_items"), (t).as("n_ratings"),
      numO.as("_no"), numP.as("_np"), sumSq.as("_ssq"))
    val alpha = lit(1.0) - (col("_no") * (col("n_ratings") - 1L))
      .cast("double") /
      ((col("n_ratings") * col("n_ratings") - col("_ssq")) *
        lit((m - 1).toLong)).cast("double")
    val pbar = col("_np").cast("double") /
      (col("n_items") * lit((m * (m - 1)).toLong)).cast("double")
    val pe = col("_ssq").cast("double") /
      (col("n_ratings").cast("double") * col("n_ratings").cast("double"))
    val kappa = (pbar - pe) / (lit(1.0) - pe)
    val s = wide.sparkSession
    import s.implicits._
    Seq("fleiss_kappa", "krippendorff_alpha", "pairwise_agreement")
      .toDF("metric")
      .crossJoin(broadcast(base))
      .withColumn("value", round(
        when(col("metric") === "fleiss_kappa", kappa)
          .when(col("metric") === "krippendorff_alpha", alpha)
          .otherwise(pbar), 6))
      .select("metric", "value", "n_items", "n_ratings")
      .orderBy("metric")
  }
}
