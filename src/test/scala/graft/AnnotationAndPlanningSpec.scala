package graft

import org.apache.spark.sql.functions._
import graft.operators.{Annotation, DataLayout, Profiling}
import graft.streaming.EventStreams

class AnnotationAndPlanningSpec extends SparkSpec {
  import spark.implicits._

  private val classes = Seq("a", "b", "c")

  test("synthAnnotations: accuracy 1/1 reproduces the truth; deterministic") {
    val df = (1L to 50L).map(i => (i, classes((i % 3).toInt)))
      .toDF("id", "cls")
    val wide = Annotation.synthAnnotations(df, "id", "cls", classes,
      Seq((1000003L, 999983L, 1, 1), (999979L, 93077L, 1, 2)))
    val r = wide.collect()
    assert(r.forall(x => x.getString(2) == x.getString(1))) // y0 == cls
    // y1 at 50% accuracy must disagree sometimes, and always stay in-class
    assert(r.exists(x => x.getString(3) != x.getString(1)))
    assert(r.forall(x => classes.contains(x.getString(3))))
    val again = Annotation.synthAnnotations(df, "id", "cls", classes,
      Seq((1000003L, 999983L, 1, 1), (999979L, 93077L, 1, 2))).collect()
    assert(r.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("dawidSkene: EM recovers near-identity confusion for accurate raters") {
    val df = (1L to 300L).map(i => (i, classes((i % 3).toInt)))
      .toDF("id", "cls")
    val wide = Annotation.synthAnnotations(df, "id", "cls", classes,
      Seq((1000003L, 999983L, 19, 20), (999979L, 93077L, 9, 10),
        (93083L, 93097L, 9, 10)))
    val out = Annotation.dawidSkene(wide, 3, classes, iters = 2).collect()
    assert(out.length === 27)
    // diag theta_em high for every rater, and EM tracks the empirical truth
    val diag = out.filter(r => r.getString(1) == r.getString(2))
    assert(diag.forall(_.getDouble(3) > 0.8))
    assert(out.forall(r => math.abs(r.getDouble(3) - r.getDouble(4)) < 0.1))
    // per (annotator, true_class) rows of theta_em sum to ~1
    out.groupBy(r => (r.getInt(0), r.getString(1))).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
  }

  test("agreementMetrics: unanimous raters with class variation score 1.0") {
    val df = (1L to 60L).map(i => (i, classes((i % 3).toInt)))
      .toDF("id", "cls")
    val wide = df.select(col("id"), col("cls"), col("cls").as("y0"),
      col("cls").as("y1"), col("cls").as("y2"))
    val m = Annotation.agreementMetrics(wide, 3, classes).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("krippendorff_alpha") === 1.0)
    assert(m("fleiss_kappa") === 1.0)
    assert(m("pairwise_agreement") === 1.0)
  }

  test("agreementMetrics: one contrarian rater drops agreement below 1") {
    val df = (1L to 60L).map(i => (i, classes((i % 3).toInt)))
      .toDF("id", "cls")
    val contra = when(col("cls") === "a", "b").otherwise(lit("a"))
    val wide = df.select(col("id"), col("cls"), col("cls").as("y0"),
      col("cls").as("y1"), contra.as("y2"))
    val m = Annotation.agreementMetrics(wide, 3, classes).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("krippendorff_alpha") < 1.0 && m("krippendorff_alpha") > -1.0)
    assert(m("pairwise_agreement") < 1.0)
  }

  test("vOptimalCurve: DP matches hand-computed optimum and dominates equal-width") {
    val vals = Seq(0L, 0L, 0L, 10L, 100L, 100L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val out = DataLayout.vOptimalCurve(df, "id", "v", nBins = 48, maxB = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    // b=2 optimum merges {0,0,0,10} | {100,100}: SSE 75 over 6 rows
    assert(math.abs(out(2)._1 - 75.0 / 6) < 1e-9)
    // b=3 separates all three distinct values exactly
    assert(out(3)._1 === 0.0)
    // V-optimal never loses to equal-width at the same budget
    out.values.foreach { case (vopt, ew) => assert(vopt <= ew + 1e-9) }
    // more buckets never hurt
    assert(out(1)._1 >= out(2)._1 && out(2)._1 >= out(3)._1)
  }

  test("littlesLawAudit: clipped busy time, peak, and midnight edge effect") {
    val sessions = Seq(
      ("2024-01-01 01:00:00", "2024-01-01 02:00:00"), // 1h inside day 1
      ("2024-01-01 01:30:00", "2024-01-01 02:30:00"), // overlaps the first
      ("2024-01-01 23:00:00", "2024-01-02 01:00:00")  // crosses midnight
    ).toDF("s", "e").select(col("s").cast("timestamp").as("session_start"),
      col("e").cast("timestamp").as("session_end"))
    val out = EventStreams.littlesLawAudit(sessions).collect()
      .map(r => r.getDate(0).toString -> r).toMap
    val d1 = out("2024-01-01")
    assert(d1.getLong(1) === 3L) // all three start on day 1
    assert(d1.getLong(2) === (3600L + 3600L + 3600L) * 1000000L)
    assert(d1.getLong(3) === 2L) // the 01:00/01:30 overlap
    val d2 = out("2024-01-02")
    assert(d2.getLong(1) === 0L) // no arrivals on day 2
    assert(d2.getLong(2) === 3600L * 1000000L) // clipped tail hour
    // day-2 little_gap is pure edge effect: L > 0 with zero arrivals
    assert(d2.getDouble(7) > 0.0)
  }

  test("chainPlans: 2^(n-1) plans, each materializing n-1 intervals") {
    val plans = Profiling.chainPlans(Seq("r", "n", "c", "o", "l"))
    val byPlan = plans.groupBy(_._1)
    assert(byPlan.size === 16)
    assert(byPlan.values.forall(_.size === 4))
    // every plan ends at the full interval
    assert(byPlan.values.forall(_.exists(p => p._2 == 0 && p._3 == 4)))
  }

  test("joinOrderAudit: measured-cost ranking prefers the small-start order") {
    val a = Seq((1L, "x")).toDF("ak", "av")
    val b = (1L to 10L).map(i => (1L, i)).toDF("ak2", "bk")
    val c = (1L to 10L).flatMap(i => (1L to 10L).map(j => (i, i * 100 + j)))
      .toDF("bk2", "ck")
    val out = Profiling.joinOrderAudit(
      Seq(("A", a), ("B", b), ("C", c)),
      Seq(("ak", "ak2"), ("bk", "bk2"))).collect()
    assert(out.length === 4)
    val costs = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    // A-first and B->A-first pay |AB| + |ABC| = 10 + 100
    assert(costs("A>B>C") === 110L && costs("B>A>C") === 110L)
    // C-first pays |BC| + |ABC| = 100 + 100
    assert(costs("C>B>A") === 200L && costs("B>C>A") === 200L)
    assert(out.filter(_.getInt(0) === 1).forall(_.getLong(2) === 110L))
  }
}
