package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, Stats}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("cusumChangepoint: peak lands at the step edge; flat series peaks at 0") {
    val s5 = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 5L))
      .toDF("t", "v")
    val out = graft.operators.Stats.cusumChangepoint(s5, "t", "v")
      .orderBy("t").as[(Long, Long, Long, Boolean)].collect().toSeq
    // T=5, S=13 → C = 5·cum − t·13 = −8, −16, −24, −12, 0
    assert(out.map(_._3) == Seq(-8L, -16L, -24L, -12L, 0L))
    assert(out.map(_._4) == Seq(false, false, true, false, false))
    // constant series: every C = 0 → every row ties at the peak
    val flat = Seq((1L, 2L), (2L, 2L)).toDF("t", "v")
    assert(graft.operators.Stats.cusumChangepoint(flat, "t", "v")
      .filter(col("is_peak")).count() == 2L)
  }

  test("kaplanMeier: textbook product-limit steps; censored rows consume risk only") {
    val life = Seq((1L, true), (2L, true), (3L, false)).toDF("t", "obs")
    val out = graft.operators.Stats.kaplanMeier(life, "t", "obs")
      .orderBy("t").as[(Long, Long, Long, Double)].collect().toSeq
    // t=1: 3 at risk, 1 event → S = 2/3; t=2: 2 at risk, 1 event → S = 1/3
    assert(out == Seq((1L, 3L, 1L, 2.0 / 3.0), (2L, 2L, 1L, (2.0 / 3.0) * 0.5)))
    // all-censored input yields an empty curve
    val cens = Seq((1L, false), (5L, false)).toDF("t", "obs")
    assert(graft.operators.Stats.kaplanMeier(cens, "t", "obs").count() == 0L)
  }

  test("cupedAdjust: perfectly-correlated covariate removes all variance") {
    // y = 10x exactly → θ = 10; y_adj = y − 10(x − x̄) = 10·x̄ for every
    // row → both arms' adjusted means equal the global raw mean
    val df = Seq((true, 1L, 10L), (true, 3L, 30L), (false, 2L, 20L),
        (false, 6L, 60L)).toDF("arm", "x", "y")
    val out = graft.operators.Stats.cupedAdjust(df, "arm", "x", "y")
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out(true)._4 == 10.0 && out(false)._4 == 10.0) // theta
    assert(out(true)._3 == 30.0 && out(false)._3 == 30.0) // adjusted means
    assert(out(true)._2 == 20.0 && out(false)._2 == 40.0) // raw means
  }

  test("cupedAdjust: constant covariate degrades to theta 0, raw means") {
    val df = Seq((true, 5L, 10L), (false, 5L, 30L)).toDF("arm", "x", "y")
    val out = graft.operators.Stats.cupedAdjust(df, "arm", "x", "y")
      .collect().map(r => r.getBoolean(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(true) == ((10.0, 10.0, 0.0)))
    assert(out(false) == ((30.0, 30.0, 0.0)))
  }

  test("quantileNormalize: identical groups map onto the global values") {
    // two groups with the SAME distribution → q_norm stays within the
    // original value set and preserves order within each group
    val df = (1 to 10).flatMap(i => Seq(("a", i.toLong * 2, i.toDouble),
      ("b", i.toLong * 2 + 1, i.toDouble))).toDF("g", "id", "v")
    val out = graft.operators.Stats.quantileNormalize(df, "g", "v", "id")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 20)
    // every normalized value is one of the global observed values
    assert(out.forall { case (_, _, qn) => (1 to 10).map(_.toDouble).contains(qn) })
    // the max of each group maps to the global max
    assert(out.filter(_._2 == 10.0).forall(_._3 == 10.0))
    // monotone within group
    for (g <- Seq("a", "b")) {
      val gs = out.filter(_._1 == g).sortBy(_._2).map(_._3)
      assert(gs.zip(gs.tail).forall { case (x, y) => x <= y })
    }
  }

  test("z-score anomalies flag exactly the >2σ rows") {
    // group g: nine 10s and one 30 → mean 12, σ = sqrt((9*4 + 324)/10) = 6
    // z(30) = 3, z(10) = -1/3 → only the 30 is flagged
    val df = (Seq.fill(9)(10.0) :+ 30.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "v")
    val out = Stats.zscoreAnomalies(df, "g", "v", 2.0)
      .select("id", "v", "z").as[(Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(9L))
    assert(out.head._3 == 3.0)
  }

  test("chiSquareDrift: hand-computed contributions; ref-absent category flags NULL") {
    import graft.operators.Stats.chiSquareDrift
    val ref = Seq("a", "a", "a", "b").toDF("src")
    val cur = Seq("a", "b", "b", "b", "c").toDF("src")
    val out = chiSquareDrift(ref, cur, "src").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val ea = (5L * 3L).toDouble / 4L // 3.75
    val eb = (5L * 1L).toDouble / 4L // 1.25
    val ca = ((1.0 - ea) * (1.0 - ea)) / ea
    val cb = ((3.0 - eb) * (3.0 - eb)) / eb
    assert(out("a") == ((3L, 1L, Some(ea), Some(ca))))
    assert(out("b") == ((1L, 3L, Some(eb), Some(cb))))
    // 'c' never seen in the reference: no expectation, explicit NULLs —
    // a drift gate treats the row itself as the alarm
    assert(out("c") == ((0L, 1L, None, None)))
  }

  test("group correlation hits ±1 on perfectly (anti)correlated data") {
    val df = (1 to 50).flatMap(i => Seq(
      ("pos", i.toDouble, 2.0 * i + 3.0),
      ("neg", i.toDouble, -1.0 * i + 100.0))).toDF("g", "x", "y")
    val r = Stats.groupCorrelation(df, "g", "x", "y")
      .select("g", "corr").as[(String, Double)].collect().toMap
    assert(r("pos") == 1.0)
    assert(r("neg") == -1.0)
  }

  test("trimmedMean: hand-cut values; fully-trimmed group keeps a NULL row") {
    // group g: values 1..10 → cut = 1 per side → mean of 2..9 = 5.5
    val g = (1 to 10).map(i => ("g", i.toDouble, i.toLong))
    // group t: 5 identical huge rows with trim: n=5, cut=0 → all kept
    val t = (1 to 5).map(i => ("t", 100.0, i.toLong))
    val df = (g ++ t).toDF("grp", "v", "id")
    val out = Stats.trimmedMean(df, "grp", "v", "id", 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val og = out("g")
    assert(og.getLong(1) == 10 && og.getLong(2) == 8)
    assert(og.getDouble(3) == 5.5)
    val ot = out("t")
    assert(ot.getLong(2) == 5 && ot.getDouble(3) == 100.0)
    // trimTenths=4: n=2 → cut=0 (2*4 div 10)=0... use n=10,cut=4 → 2 kept
    val heavy = Stats.trimmedMean(g.toDF("grp", "v", "id"), "grp", "v", "id", 4)
      .head()
    assert(heavy.getLong(2) == 2 && heavy.getDouble(3) == 5.5)
  }

  test("dispersionIndex: constant buckets give D=0; hand value for (1,3)") {
    import java.sql.Timestamp
    def ts(min: Int, sec: Int) =
      Timestamp.valueOf(f"2026-01-01 00:$min%02d:$sec%02d")
    // type "flat": 2 per minute over 3 minutes → variance 0
    val flat = for (m <- 0 until 3; s <- Seq(1, 31)) yield ("flat", ts(m, s))
    // type "burst": minute 0 has 1 event, minute 1 has 3 → D = 0.5
    val burst = Seq(("burst", ts(0, 5)), ("burst", ts(1, 5)),
      ("burst", ts(1, 15)), ("burst", ts(1, 25)))
    val df = (flat ++ burst).toDF("t", "ts")
    val out = Stats.dispersionIndex(df, "t", "ts", 60L)
      .collect().map(r => r.getString(0) -> r).toMap
    val f = out("flat")
    assert(f.getLong(1) == 3 && f.getLong(2) == 6 && f.getLong(3) == 0)
    assert(f.getDouble(5) == 0.0)
    val b = out("burst")
    // n=2, Σc=4, Σc²=10 → num = 2·10−16 = 4, denom = 8 → D = 0.5
    assert(b.getLong(3) == 4 && b.getLong(4) == 8 && b.getDouble(5) == 0.5)
  }

  test("spearman: ±1 on monotone data, invariant under monotone transforms") {
    // x vs x³ is nonlinear but perfectly monotone → ρ = 1 (Pearson < 1)
    val df = (1 to 40).flatMap(i => Seq(
      ("mono", i.toDouble, i.toDouble * i * i),
      ("anti", i.toDouble, -3.0 * i + 7.0))).toDF("g", "x", "y")
    val rho = Stats.spearman(df, "g", "x", "y")
      .select("g", "rho").as[(String, Double)].collect().toMap
    assert(rho("mono") == 1.0)
    assert(rho("anti") == -1.0)
    val pear = Stats.groupCorrelation(df, "g", "x", "y")
      .select("g", "corr").as[(String, Double)].collect().toMap
    assert(pear("mono") < 1.0)
  }

  test("spearman handles ties via doubled average ranks") {
    // x = (1,1,2), y = (10,10,20): tie run shares rank; still ρ = 1
    val df = Seq(("g", 1.0, 10.0), ("g", 1.0, 10.0), ("g", 2.0, 20.0))
      .toDF("g", "x", "y")
    val rho = Stats.spearman(df, "g", "x", "y")
      .select("rho").as[Double].head()
    assert(rho == 1.0)
    // x ties but y doesn't: hand value for ranks rx=(3,3,6)/2, ry=(1,2,3)
    val df2 = Seq(("g", 1.0, 10.0), ("g", 1.0, 11.0), ("g", 2.0, 20.0))
      .toDF("g", "x", "y")
    val rho2 = Stats.spearman(df2, "g", "x", "y")
      .select("rho").as[Double].head()
    // doubled ranks rx=(3,3,6), ry=(2,4,6) → ρ = 3/(2·sqrt(3)) = sqrt(3)/2
    assert(math.abs(rho2 - math.sqrt(3.0) / 2.0) < 1e-12)
  }

  test("rrf fusion: ranks combine as 1/(c+rank) and doc in both lists wins") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", 10, c = 60)
      .as[(Long, Double, Long)].collect()
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(out.head._1 == 2L) // in both lists: 1/62 + 1/61 beats 1/61
    // decimal(27,15) accumulation truncates past 15 decimals — compare
    // within that tolerance
    assert(math.abs(byId(2L) - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    assert(math.abs(byId(1L) - 1.0 / 61) < 1e-12)
    val lists = out.map(t => t._1 -> t._3).toMap
    assert(lists(2L) == 2L && lists(1L) == 1L)
  }

  test("ewmaMonitor: hand-computed geometric weights, first rows unscored") {
    // series in one group: 8, 4, 6 (ordered by t). Row t=1 has no history.
    // t=2: hist=[8], L=1 -> wsum = 8/2 = 4, norm = 1/2 -> ewma = 8, dev = -4
    // t=3: hist=[8,4], L=2 -> 8/4 + 4/2 = 4, norm = 3/4 -> ewma = 16/3
    val df = Seq((1L, "g", 8.0), (2L, "g", 4.0), (3L, "g", 6.0))
      .toDF("t", "g", "v")
    val out = Stats.ewmaMonitor(df, "g", "t", "t", "v",
        window = 16, minHistory = 1, threshold = 0.5)
      .select("t", "n_history", "ewma", "deviation")
      .as[(Long, Int, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(2L, 3L))
    assert(out(0) == ((2L, 1, 8.0, -4.0)))
    assert(out(1)._2 == 2 && math.abs(out(1)._3 - 16.0 / 3) < 1e-15)
    assert(math.abs(out(1)._4 - (6.0 - 16.0 / 3)) < 1e-15)
  }

  test("ewmaMonitor: rows below minHistory or threshold are not flagged") {
    val df = (1 to 10).map(i => (i.toLong, "g", 10.0)).toDF("t", "g", "v")
    // constant series: deviation is exactly 0 everywhere -> nothing flagged
    assert(Stats.ewmaMonitor(df, "g", "t", "t", "v", 16, 1, 1e-9).count() == 0)
  }

  test("theilSenSlope: outlier day cannot drag the median slope") {
    // five points on v = 10x except one wild outlier at x=4.
    // 10 pairwise slopes; 6 of them are exactly 10 -> lower median = 10
    val df = Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 30L), (4L, 1000L))
      .map { case (x, v) => ("g", x, v) }.toDF("g", "x", "v")
    val out = graft.operators.Stats.theilSenSlope(df, "g", "x", "v")
      .as[(String, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("g", 5L, 10L, 10.0)))
  }

  test("theilSenSlope: even pair count picks the deterministic lower median") {
    // 4 points -> 6 pairs; slopes sorted: lower median is rank 3
    val df = Seq((0L, 0L), (1L, 1L), (2L, 4L), (3L, 9L))
      .map { case (x, v) => ("g", x, v) }.toDF("g", "x", "v")
    val slopes = for {
      Seq((xi, vi), (xj, vj)) <- Seq((0L, 0L), (1L, 1L), (2L, 4L), (3L, 9L))
        .combinations(2).toSeq
    } yield ((vj - vi).toDouble / (xj - xi), xi, xj)
    val expected = slopes.sortBy(t => (t._1, t._2, t._3)).apply(2)._1
    val out = graft.operators.Stats.theilSenSlope(df, "g", "x", "v")
      .as[(String, Long, Long, Double)].collect().head
    assert(out._3 == 6L && out._4 == expected)
  }

  test("bootstrapMeans: constant metric -> every resampled mean is that constant") {
    val df = (0L until 200L).map(i => (i, 7L)).toDF("id", "v")
    val out = graft.operators.Stats.bootstrapMeans(df, "id", "v", reps = 16)
      .as[(Int, Long, Double)].collect()
    assert(out.length == 16)
    assert(out.forall(_._3 == 7.0))
    // Binomial(8,1/8) draws over 200 rows: every rep keeps a nontrivial,
    // varying number of draws (not Bernoulli-0/1, not the full corpus)
    assert(out.forall(r => r._2 > 100 && r._2 < 300))
    assert(out.map(_._2).distinct.length > 1)
  }

  test("welchTTest: hand-computed statistic; tiny arm gives NULL t") {
    // arm A: 1, 2, 3 (mean 2, var 1); arm B: 5, 7 (mean 6, var 2)
    // t = (2-6)/sqrt(1/3 + 2/2) = -4/sqrt(4/3)
    val df = Seq((true, 1L), (true, 2L), (true, 3L), (false, 5L), (false, 7L))
      .toDF("arm", "v")
    val r = graft.operators.Stats.welchTTest(df, "arm", "v").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == -4.0)
    assert(math.abs(r.getDouble(5) - (-4.0 / math.sqrt(4.0 / 3))) < 1e-12)
    val tiny = Seq((true, 1L), (false, 5L)).toDF("arm", "v")
    assert(graft.operators.Stats.welchTTest(tiny, "arm", "v")
      .collect().head.isNullAt(5))
  }

  test("obfMonitor: final look matches welchTTest; boundary shrinks per look") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Seq(
      (1, true, 10L), (1, false, 20L), (1, true, 30L), (1, false, 40L),
      (2, true, 15L), (2, false, 25L), (2, true, 5L), (2, false, 45L),
      (3, true, 50L), (3, false, 10L), (3, true, 20L), (3, false, 30L))
      .toDF("wk", "arm", "v")
    val looks = graft.operators.Stats.obfMonitor(ev, "wk", "arm", "v", 2.04)
      .orderBy("wk").collect()
    assert(looks.length == 3)
    // the final cumulative look must equal the fixed-horizon Welch test
    val fixedRow = graft.operators.Stats.welchTTest(ev, "arm", "v").head()
    val last = looks.last
    assert(last.getAs[Long]("n_a") == fixedRow.getAs[Long]("n_a"))
    assert(last.getAs[Double]("diff") == fixedRow.getAs[Double]("diff"))
    assert(last.getAs[Double]("z") == fixedRow.getAs[Double]("t_stat"))
    // OBF boundary: strictly decreasing, equals zα at the last look
    val bounds = looks.map(_.getAs[Double]("bound")).toSeq
    assert(bounds == bounds.sorted.reverse && bounds.distinct == bounds)
    assert(math.abs(bounds.last - 2.04) < 1e-12)
    // crossed is consistent with |z| vs bound at every look
    looks.foreach { r =>
      assert(r.getAs[Boolean]("crossed") ==
        (math.abs(r.getAs[Double]("z")) > r.getAs[Double]("bound")))
    }
  }

  test("quantileTreatmentEffect: hand-checked ranks; p100-style top via p>=100 skipped") {
    // arm A values 10,20,30,40 — p25→r=1→10, p50→r=2→20, p75→r=3→30,
    // p90→r=3 (90·4 div 100)→30; arm B values 100,200 — lower-rank
    // estimator keeps r=1 (→100) through p75/p90 since 90·2 div 100 = 1
    val df = (Seq(10L, 20L, 30L, 40L).map((true, _)) ++
      Seq(100L, 200L).map((false, _))).toDF("arm", "v")
    val out = graft.operators.Stats
      .quantileTreatmentEffect(df, "arm", "v", Seq(25, 50, 75, 90))
      .orderBy("pct").as[(Int, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      (25, 4L, 2L, 10L, 100L, -90L),
      (50, 4L, 2L, 20L, 100L, -80L),
      (75, 4L, 2L, 30L, 100L, -70L),
      (90, 4L, 2L, 30L, 100L, -70L)))
  }

  test("diffInDiff: parallel-trends null gives 0; cell means exact; empty cell → NULL mean") {
    // control 10→20, treatment 30→40: both move +10 → DiD = 0
    val nullCase = Seq((false, false, 10L), (false, true, 20L),
      (true, false, 30L), (true, true, 40L)).toDF("arm", "post", "v")
    val r0 = graft.operators.Stats.diffInDiff(nullCase, "arm", "post", "v").head()
    assert(r0.getAs[Double]("did") == 0.0)
    assert(r0.getAs[Double]("mean_t_pre") == 30.0)
    // treatment jumps +30 while control moves +10 → DiD = +20
    val eff = Seq((false, false, 10L), (false, true, 20L),
      (true, false, 30L), (true, true, 60L)).toDF("arm", "post", "v")
    assert(graft.operators.Stats.diffInDiff(eff, "arm", "post", "v")
      .head().getAs[Double]("did") == 20.0)
    // a missing cell nulls its mean and propagates into did
    val sparse = Seq((false, false, 10L), (true, true, 60L))
      .toDF("arm", "post", "v")
    val r2 = graft.operators.Stats.diffInDiff(sparse, "arm", "post", "v").head()
    assert(r2.isNullAt(r2.fieldIndex("mean_t_pre")))
    assert(r2.isNullAt(r2.fieldIndex("did")))
  }

  test("splitConformal: qhat is the exact order statistic, coverage exact") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => ("g", i, (i * 37) % 101))
    val df = rows.toDF("grp", "id", "v")
    val out = Stats.splitConformal(df, "grp", "id", "v").head()
    // independent driver-side recomputation with the same hash folds
    val folds = df.withColumn("fold",
        graft.operators.Sketches.keyHash(col("id")) % 10)
      .select("id", "v", "fold").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val train = folds.filter(_._3 < 4)
    val yhat = train.map(t => BigDecimal(t._2)).sum.toDouble / train.length
    val calib = folds.filter(t => t._3 >= 4 && t._3 < 7)
      .map(t => (math.abs(t._2.toDouble - yhat), t._1)).sortBy(identity)
    val kk = ((calib.length + 1) * 9 + 9) / 10
    val qhat = calib(kk - 1)._1
    val test = folds.filter(_._3 >= 7)
      .map(t => math.abs(t._2.toDouble - yhat))
    assert(out.getAs[Long]("n_train") == train.length.toLong)
    assert(out.getAs[Long]("n_calib") == calib.length.toLong)
    assert(out.getAs[Long]("n_test") == test.length.toLong)
    assert(out.getAs[Double]("qhat") ==
      BigDecimal(qhat).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getAs[Double]("coverage") ==
      test.count(_ <= qhat).toDouble / test.length)
    // the marginal-coverage contract: ≥ 1 - α on a well-behaved sample
    assert(out.getAs[Double]("coverage") >= 0.8)
  }

  test("psiDrift: identical distributions score ~0, a shifted one flags") {
    import spark.implicits._
    val ref = (1L to 200L).map(i => ("g", i % 40)).toDF("grp", "v")
    val same = Stats.psiDrift(ref, ref, "grp", "v", 10L, 4).head()
    assert(same.getAs[Double]("psi") == 0.0 && !same.getAs[Boolean]("drifted"))
    // current shifted wholly out of the reference's occupied bins
    val cur = (1L to 200L).map(i => ("g", 30L + i % 10)).toDF("grp", "v")
    val out = Stats.psiDrift(ref, cur, "grp", "v", 10L, 4).head()
    assert(out.getAs[Double]("psi") > 0.2 && out.getAs[Boolean]("drifted"))
    assert(out.getAs[Long]("n_ref") == 200L && out.getAs[Long]("n_cur") == 200L)
  }

  test("conditionalEntropy: per-state H and weighted global, hand-computed") {
    import spark.implicits._
    def d18(x: Double) =
      BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pairs = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("f", "t")
    val out = Stats.conditionalEntropy(pairs, "f", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val hA = (0.0 - (d18(2.0 / 3 * math.log(2.0 / 3)) +
      d18(1.0 / 3 * math.log(1.0 / 3))).toDouble)
    val hCond = r6((d18(3.0 / 4 * hA) + d18(1.0 / 4 * 0.0)).toDouble)
    assert(out("a") == ((3L, r6(hA), hCond)))
    assert(out("b") == ((1L, 0.0, hCond))) // deterministic next step
  }

  test("logRank: hand-computed hypergeometric O−E and variance") {
    import spark.implicits._
    def d18(x: Double) =
      BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val life = Seq((true, 1L, true), (true, 3L, true),
      (false, 2L, true), (false, 3L, false)).toDF("arm", "t", "obs")
    val r = Stats.logRank(life, "arm", "t", "obs").head()
    // t1: O 1 E ½ V ¼; t2: O 0 E ⅓ V 2/9; t3: O 1 E ½ V ¼
    val omes = Seq(1.0 - 1.0 * 2 / 4, 0.0 - 1.0 * 1 / 3, 1.0 - 1.0 * 1 / 2)
    val vs = Seq(
      (1.0 * (2.0 / 4)) * (1.0 - 2.0 / 4) * (3.0 / 3),
      (1.0 * (1.0 / 3)) * (1.0 - 1.0 / 3) * (2.0 / 2),
      (1.0 * (1.0 / 2)) * (1.0 - 1.0 / 2) * (1.0 / 1))
    val ome = omes.map(d18).sum.toDouble
    val vv = vs.map(d18).sum.toDouble
    assert(r.getAs[Long]("n_times") == 3L)
    assert(r.getAs[Double]("o_minus_e") == r6(ome))
    assert(r.getAs[Double]("variance") == r6(vv))
    assert(r.getAs[Double]("z") == r6(ome / math.sqrt(vv)))
  }

  test("ratioMetricDelta: hand-computed delta-method SE and two-arm z") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val units = Seq((true, 10L, 2L), (true, 20L, 2L),
      (false, 12L, 3L), (false, 12L, 1L)).toDF("arm", "x", "y")
    val out = Stats.ratioMetricDelta(units, "arm", "x", "y")
      .collect().map(r => r.getBoolean(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // t: ratio 7.5, vx 25, vy 0, cxy 0, ȳ 2 → se = √(25/8)
    // c: ratio 6, vx 0, vy 1, cxy 0 → se = √(36/8)
    val seT = math.sqrt(25.0 / 8)
    val seC = math.sqrt(36.0 / 8)
    val z = r6((7.5 - 6.0) / math.sqrt(seT * seT + seC * seC))
    assert(out(true) == ((2L, 7.5, r6(seT), z)))
    assert(out(false) == ((2L, 6.0, r6(seC), z)))
  }

  test("maseSeasonalNaive: periodic series → mase 0, exact naive MAE") {
    import spark.implicits._
    val n = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)
    val daily = n.zipWithIndex.map { case (v, d) => (d.toLong, v) }
      .toDF("day", "n")
    val r = Stats.maseSeasonalNaive(daily, "day", "n").head()
    assert(r.getAs[Long]("n_days") == 7L)
    // lag-1 errors on days 7..13: 6,1,1,1,1,1,1 → 12/7
    assert(r.getAs[Double]("mae_naive") ==
      BigDecimal(12.0 / 7).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(r.getAs[Double]("mae_seasonal") == 0.0)
    assert(r.getAs[Double]("mase") == 0.0)
  }

  test("rollingCorrelation: exact 1.0 on a linear pair, null below window") {
    import spark.implicits._
    val daily = (0L to 19L).map(d => (d, d, 2 * d + 5)).toDF("day", "x", "y")
    val out = Stats.rollingCorrelation(daily, "day", "x", "y", 14)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    // only full 14-day windows emit; y = 2x+5 correlates exactly 1
    assert(out.keySet == (13L to 19L).toSet)
    assert(out.values.forall(_ == 1.0))
    // a constant series has zero variance → null guard
    val flat = (0L to 19L).map(d => (d, 5L, 2 * d)).toDF("day", "x", "y")
    val o2 = Stats.rollingCorrelation(flat, "day", "x", "y", 14).collect()
    assert(o2.nonEmpty && o2.forall(_.isNullAt(3)))
  }

  test("seasonalResiduals: weekly pattern absorbed, only the spike flags") {
    import spark.implicits._
    val pattern = Seq(10L, 10L, 10L, 10L, 10L, 20L, 30L)
    val daily = (0L to 20L).map(d =>
      (d, pattern((d % 7).toInt) + (if (d == 10L) 200L else 0L)))
      .toDF("day", "n")
    val out = Stats.seasonalResiduals(daily, "day", "n")
      .collect().map(r => r.getLong(0) -> r).toMap
    // edge days have no full 7-window: trend/resid/flag NULL
    for (d <- Seq(0L, 1L, 2L, 18L, 19L, 20L)) {
      assert(out(d).isNullAt(2) && out(d).isNullAt(4) && out(d).isNullAt(5))
    }
    // the weekly pattern itself never flags; the spike does
    val flagged = out.collect {
      case (d, r) if !r.isNullAt(5) && r.getBoolean(5) => d
    }.toSet
    assert(flagged == Set(10L))
    assert(out(10L).getDouble(4) > 100.0) // large positive residual
  }

  test("permutationTest: constant values give zero diffs and p = 1") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, 7L)).toDF("k", "v")
    val r = Stats.permutationTest(df, "k", "v").head()
    assert(r.getAs[Double]("diff_obs") == 0.0)
    assert(r.getAs[Long]("n_perms") == 64L)
    assert(r.getAs[Long]("n_extreme") == 64L) // every |0| >= |0|
    assert(r.getAs[Double]("p_value") == 1.0)
  }

  test("madOutliers: exact median/MAD, one wild value cannot inflate scale") {
    import spark.implicits._
    // 9 values centered at 10, MAD 1; the 1000 is > 3·1.4826·1 away
    val df = (Seq(8L, 9L, 9L, 10L, 10L, 10L, 11L, 11L, 1000L))
      .map(("g", _)).toDF("grp", "v")
    val r = Stats.madOutliers(df, "grp", "v").head()
    assert(r.getAs[Long]("n") == 9L)
    assert(r.getAs[Long]("med") == 10L)
    assert(r.getAs[Long]("mad") == 1L)
    assert(r.getAs[Long]("n_outliers") == 1L) // only the 1000
  }

  test("giniStump: hand-computed perfect split wins, sides always non-empty") {
    import spark.implicits._
    // feature 0,1 → negative; 2,3 → positive: threshold 2 is pure
    val df = Seq((0L, false), (1L, false), (2L, true), (3L, true))
      .toDF("x", "y")
    val out = Stats.giniStump(df, "x", "y").collect()
      .map(r => r.getAs[Long]("threshold") ->
        ((r.getAs[Double]("gini"), r.getAs[Boolean]("is_best")))).toMap
    // t=1: L={0}, R={1,+,+} → 0 + 3·(1−(2/3)²−(1/3)²) = 4/3; /4 → 1/3
    // (output gini is round(·, 6) per the oracle-parity convention)
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((0.333333, false)))
    assert(out(2L) == ((0.0, true))) // pure split
    assert(out(3L) == ((0.333333, false)))
  }

  test("pageHinkley: hand-computed statistic, alarm position, no-alarm group") {
    import spark.implicits._
    // series 10,10,10,20: deviations from running mean 0,0,0,+7.5;
    // m = 0,0,0,7.5; min-so-far 0 → PH peaks 7.5 at t=4
    val rows = Seq(("a", 1, 10L), ("a", 2, 10L), ("a", 3, 10L),
      ("a", 4, 20L), ("b", 1, 5L), ("b", 2, 5L))
    val df = rows.toDF("g", "t", "y")
    val out = Stats.pageHinkley(df, "g", "t", "y", delta = 0.0,
      lambda = 5.0).collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("a").getAs[Double]("peak_ph") == 7.5)
    assert(out("a").getAs[Long]("n_alarms") == 1L)
    assert(out("a").getAs[Long]("first_alarm_t") == 4L)
    assert(out("b").getAs[Long]("n_alarms") == 0L)
    assert(out("b").isNullAt(out("b").fieldIndex("first_alarm_t")))
  }

  test("jackknifeRatio: matches the closed-form leave-one-out variance") {
    import spark.implicits._
    // strata sums: (1,2), (2,2), (3,2) → θ=6/6=1
    // loo: (5/4, 4/4, 3/4); mean = 1; var = 2/3·(1/16+0+1/16) = 1/12
    val df = Seq((0L, 1L, 2L), (1L, 2L, 2L), (2L, 3L, 2L))
      .toDF("stratum", "num", "den")
    val out = Stats.jackknifeRatio(df, "stratum", "num", "den")
      .orderBy("stratum").collect()
    assert(out.map(_.getAs[Double]("theta_loo")).toSeq ==
      Seq(1.25, 1.0, 0.75))
    assert(out.head.getAs[Double]("theta_hat") == 1.0)
    assert(math.abs(out.head.getAs[Double]("var_jack") - 1.0 / 12) < 1e-9)
    assert(math.abs(out.head.getAs[Double]("se_jack") -
      math.sqrt(1.0 / 12)) < 1e-9)
  }

  test("cramerVonMises: hand-computed ties-correct statistic") {
    import spark.implicits._
    // A = {1,2}, B = {1,3}: Σ w·(CA·m − CB·n)² = 2·0 + 1·4 + 1·0 = 4
    // T = 4 / (2·2·4²) = 0.0625
    val df = Seq(("g", true, 1L), ("g", true, 2L), ("g", false, 1L),
      ("g", false, 3L)).toDF("g", "armA", "v")
    val out = Stats.cramerVonMises(df, "g", "armA", "v").head()
    assert(out.getAs[Long]("n_a") == 2L && out.getAs[Long]("n_b") == 2L)
    assert(out.getAs[Double]("t_cvm") == 0.0625)
    assert(!out.getAs[Boolean]("rejects_5pct"))
    // identical samples → T = 0
    val same = Seq(("g", true, 1L), ("g", true, 2L), ("g", false, 1L),
      ("g", false, 2L)).toDF("g", "armA", "v")
    assert(Stats.cramerVonMises(same, "g", "armA", "v")
      .head().getAs[Double]("t_cvm") == 0.0)
  }

  test("permutationTestPerGroup: single group ≡ the global test") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => ("g", i, i * 7 % 23))
    val df = rows.toDF("g", "id", "v")
    val grouped = Stats.permutationTestPerGroup(df, "g", "id", "v", 16)
      .head()
    val global = Stats.permutationTest(df.select("id", "v"), "id", "v", 16)
      .head()
    assert(grouped.getAs[Double]("p_value") ==
      global.getAs[Double]("p_value"))
    assert(grouped.getAs[Long]("n_extreme") ==
      global.getAs[Long]("n_extreme"))
    assert(grouped.getAs[Double]("diff_obs") ==
      global.getAs[Double]("diff_obs"))
  }

  test("stratifiedAtt: treated-weighted within-stratum gaps") {
    import spark.implicits._
    // 2 strata by score; s0: t {10} c {0,0} gap 10 (n_t 1); s1: t {30}
    // c {20,20} gap 10... make gaps differ: s1 t {40} → gap 20
    // ATT = (1·10 + 1·20)/2 = 15
    val units = Seq(
      (1L, true, 1L, 10L), (2L, false, 2L, 0L), (3L, false, 3L, 0L),
      (4L, true, 10L, 40L), (5L, false, 11L, 20L), (6L, false, 12L, 20L))
      .toDF("id", "tr", "sc", "y")
    val out = Stats.stratifiedAtt(units, "id", "tr", "sc", "y", 2)
      .orderBy("stratum").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("gap") == 10.0)
    assert(out(1).getAs[Double]("gap") == 20.0)
    assert(out.forall(_.getAs[Double]("att_strat") == 15.0))
  }

  test("meanExcessTable: exact thresholds and excess means") {
    import spark.implicits._
    // values 1..100: p90 threshold = 90 → 10 exceeders, mean excess
    // (1+..+10)/10 = 5.5; p99 → u=99, 1 exceeder, excess 1
    val df = (1L to 100L).map(v => (v, v)).toDF("id", "v")
    val out = Stats.meanExcessTable(df, "id", "v", Seq(90, 99))
      .collect().map(r => r.getAs[Int]("pct") -> r).toMap
    assert(out(90).getAs[Long]("threshold") == 90L)
    assert(out(90).getAs[Long]("n_exceed") == 10L)
    assert(out(90).getAs[Double]("mean_excess") == 5.5)
    assert(out(99).getAs[Long]("n_exceed") == 1L)
    assert(out(99).getAs[Double]("mean_excess") == 1.0)
  }

  test("qqShift: nearest-rank deciles per half, exact shifts") {
    import spark.implicits._
    // pre: 1..10 → decile d at rank ceil(d·10/10) = d → value d
    // post: 11..20 → value 10 + d → shift 10 everywhere
    val rows = (1L to 10L).map(v => ("g", v, true, v)) ++
      (1L to 10L).map(v => ("g", v + 100, false, v + 10))
    val out = Stats.qqShift(rows.toDF("g", "id", "pre", "v"),
      "g", "pre", "v", "id").orderBy("decile").collect()
    assert(out.length == 9)
    assert(out.forall(_.getAs[Long]("shift") == 10L))
    assert(out.head.getAs[Long]("v_pre") == 1L)
    assert(out.last.getAs[Long]("v_pre") == 9L)
  }

  test("overdispersionGate: Poisson-like passes, bursty flags") {
    import spark.implicits._
    // g1: constant 5s → var 0, vmr 0; g2: {0,10} → var 50, mean 5, vmr 10
    val rows = Seq.fill(10)(("g1", 5L)) ++
      (1 to 5).flatMap(_ => Seq(("g2", 0L), ("g2", 10L)))
    val out = Stats.overdispersionGate(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("g1").getAs[Double]("vmr") == 0.0)
    assert(!out("g1").getAs[Boolean]("overdispersed"))
    assert(math.abs(out("g2").getAs[Double]("vmr") -
      (250.0 / 9) / 5) < 1e-6)
    assert(out("g2").getAs[Boolean]("overdispersed"))
  }

  test("twoPassMedian: equals the naive sorted median, scans one bucket") {
    import spark.implicits._
    val vals = Seq(17L, 3L, 99L, 42L, 8L, 65L, 23L, 4L, 91L, 55L, 12L)
    val out = Stats.twoPassMedian(vals.toDF("v"), "v", coarseBins = 4)
      .head()
    assert(out.getAs[Long]("median") == vals.sorted.apply(vals.size / 2))
    assert(out.getAs[Long]("n") == 11L)
    assert(out.getAs[Long]("n_candidates") < 11L) // only one bucket scanned
  }

  test("priceIndices: hand-computed Laspeyres/Paasche/Fisher") {
    import spark.implicits._
    // item A: p0=1, q0=10 → p1=2, q1=5;  item B: p0=2, q0=10 → p1=2, q1=20
    // L = (2·10 + 2·10)/(1·10 + 2·10) = 40/30;  P = (2·5+2·20)/(1·5+2·20) = 50/45
    val rows = Seq(("b", "A", 1000L, 10L), ("b", "B", 2000L, 10L),
      ("c", "A", 1000L, 5L), ("c", "B", 4000L, 20L))
    val out = Stats.priceIndices(rows.toDF("p", "item", "cents", "qty"),
      "p", "item", "cents", "qty", "b", "c").head()
    assert(out.getAs[Long]("n_common_items") == 2L)
    assert(math.abs(out.getAs[Double]("laspeyres") - 40.0 / 30) < 1e-6)
    assert(math.abs(out.getAs[Double]("paasche") - 50.0 / 45) < 1e-6)
    assert(math.abs(out.getAs[Double]("fisher") -
      math.sqrt(40.0 / 30 * (50.0 / 45))) < 1e-6)
  }

  test("regressionDiscontinuity: recovers an exact step on linear data") {
    import spark.implicits._
    // y = 2x below the cutoff, y = 2x + 100 at and above: slopes 2/2,
    // intercepts at c = 10: 20 and 120 → effect exactly 100
    val units = ((0L until 10L).map(x => (x, 2 * x)) ++
      (10L until 20L).map(x => (x, 2 * x + 100))).toDF("x", "y")
    val out = Stats.regressionDiscontinuity(units, "x", "y",
      cutoff = 10L, bandwidth = 10L).head()
    assert(out.getAs[Long]("n_left") == 10L)
    assert(out.getAs[Long]("n_right") == 10L)
    assert(out.getAs[Double]("slope_left") == 2.0)
    assert(out.getAs[Double]("slope_right") == 2.0)
    assert(out.getAs[Double]("icept_left") == 20.0)
    assert(out.getAs[Double]("icept_right") == 120.0)
    assert(out.getAs[Double]("rd_effect") == 100.0)
  }

  test("caliperMatchAtt: nearest control within caliper, unmatched drop") {
    import spark.implicits._
    // treated: id1 score 10 (controls at 9 and 12 → picks 9), id2 score
    // 50 (no control within ±2 → unmatched)
    val units = Seq((1L, true, 10L, 100L), (2L, true, 50L, 999L),
      (3L, false, 9L, 40L), (4L, false, 12L, 70L), (5L, false, 30L, 0L))
      .toDF("id", "tr", "sc", "y")
    val out = Stats.caliperMatchAtt(units, "id", "tr", "sc", "y", 2L)
      .head()
    assert(out.getAs[Long]("n_treated") == 2L)
    assert(out.getAs[Long]("n_matched") == 1L)
    assert(out.getAs[Double]("mean_treated") == 100.0)
    assert(out.getAs[Double]("mean_matched_control") == 40.0)
    assert(out.getAs[Double]("att") == 60.0)
  }

  test("sprtBernoulli: crosses the right boundary on day 1, or continues") {
    import spark.implicits._
    // p0=0.25 vs p1=0.75 → per-success log-ratio ln 3; A = ln 19
    // g1: 4/4 successes day 1 → LLR = 4·ln3 ≈ 4.394 ≥ 2.944 → accept_h1
    // g0: 0/4 → −4.394 ≤ −2.944 → accept_h0;  gc: 1/2 → LLR = 0 → continue
    val rows = Seq(("g1", 1, 4L, 4L), ("g0", 1, 4L, 0L), ("gc", 1, 2L, 1L))
    val out = Stats.sprtBernoulli(rows.toDF("g", "day", "n", "k"),
      "g", "day", "n", "k", 0.25, 0.75, 0.05, 0.05)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("g1").getAs[String]("decision") == "accept_h1")
    assert(out("g1").getAs[Long]("day_h1") == 1L)
    assert(math.abs(out("g1").getAs[Double]("llr_final") -
      4 * math.log(3)) < 1e-5)
    assert(out("g0").getAs[String]("decision") == "accept_h0")
    assert(out("gc").getAs[String]("decision") == "continue")
    assert(out("gc").getAs[Double]("llr_final") == 0.0)
  }

  test("ucb1Replay: forced initialization, then exploits the best arm") {
    import spark.implicits._
    // 4 days, arm 0 dominant: days 1-3 forced 0,1,2; day 4 UCB picks 0
    // cum = 1.0 + 0.1 + 0.1 + 1.0 = 2.2; best fixed = 4·1.0; regret 1.8
    val days = (1 to 4).map(t => ("g", t, 1.0, 0.1, 0.1))
    val out = Stats.ucb1Replay(days.toDF("g", "t", "r0", "r1", "r2"),
      "g", "t", "r0", "r1", "r2").head()
    assert(out.getAs[Long]("n_pulls_0") == 2L)
    assert(out.getAs[Long]("n_pulls_1") == 1L)
    assert(out.getAs[Long]("n_pulls_2") == 1L)
    assert(out.getAs[Double]("cum_reward") == 2.2)
    assert(out.getAs[Double]("best_fixed") == 4.0)
    assert(out.getAs[Double]("regret") == 1.8)
  }

  test("segmentedTrend: finds the exact trend break, zero-SSE split") {
    import spark.implicits._
    // y = x up to x=10, flat 10 after: k=9 and k=10 both split into two
    // perfect lines (SSE 0); tie breaks to the smaller k
    val rows = (1 to 20).map(x => ("g", x, if (x <= 10) x.toLong else 10L))
    val out = Stats.segmentedTrend(rows.toDF("g", "t", "y"), "g", "t", "y",
      minSeg = 5).head()
    assert(out.getAs[Long]("n") == 20L)
    assert(out.getAs[Long]("best_k") == 9L)
    assert(out.getAs[Double]("sse_left") == 0.0)
    assert(out.getAs[Double]("sse_right") == 0.0)
    assert(out.getAs[Double]("drop_ratio") == 1.0)
    assert(out.getAs[Double]("sse_single") > 0.0)
  }

  test("nelsonAalen: hand-computed hazard steps, NULL-guarded n==d variance") {
    import spark.implicits._
    // t=1: 2 deaths of 4 at risk; t=2: censored; t=3: last one dies
    val life = Seq((1L, true), (1L, true), (2L, false), (3L, true))
      .toDF("t", "obs")
    val rows = Stats.nelsonAalen(life, "t", "obs")
      .orderBy("t").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_at_risk") == 4L)
    assert(rows(0).getAs[Double]("cum_hazard") == 0.5)       // 2/4
    assert(rows(0).getAs[Double]("greenwood_var") == 0.25)   // 2/(4·2)
    assert(rows(1).getAs[Long]("n_at_risk") == 1L)
    assert(rows(1).getAs[Double]("cum_hazard") == 1.5)       // + 1/1
    // final step has n==d: its variance factor is NULL, sum unchanged
    assert(rows(1).getAs[Double]("greenwood_var") == 0.25)
  }

  test("kruskalWallis: textbook H, exact midrank tie correction") {
    import spark.implicits._
    // no ties: a=[1,2] b=[3,4] → H = 12/20·(9/2+49/2) − 15 = 2.4
    val plain = Stats.kruskalWallis(
      Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v"),
      "g", "v").head()
    assert(plain.getAs[Long]("n") == 4L && plain.getAs[Long]("k") == 2L)
    assert(plain.getAs[Double]("h") == 2.4)
    assert(plain.getAs[Double]("h_adj") == 2.4) // tie term 0
    // full ties inside groups: midranks 1.5/3.5, C = 1 − 12/60 = 0.8
    val tied = Stats.kruskalWallis(
      Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 2L)).toDF("g", "v"),
      "g", "v").head()
    assert(tied.getAs[Double]("h") == 2.4)
    assert(tied.getAs[Double]("h_adj") == 3.0)
    // degenerate: single distinct value → C = 0 → h_adj NULL
    val flat = Stats.kruskalWallis(
      Seq(("a", 7L), ("b", 7L)).toDF("g", "v"), "g", "v").head()
    assert(flat.isNullAt(flat.fieldIndex("h_adj")))
  }

  test("brownForsythe: hand-computed F from lower-median deviations") {
    import spark.implicits._
    val df = (Seq(1L, 2L, 3L, 100L).map(("x", _)) ++
      Seq(5L, 5L, 5L, 5L).map(("y", _))).toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("k") == 2L)
    // x: median idx (4+1) div 2 = 2 → m=2 (LOWER median), z=[1,0,1,98]
    // bss = 2500 − 100²/8 = 1250; wss = 9606 − 2500 = 7106
    val f = BigDecimal((1250.0 / 1.0) / (7106.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("f") == f)
  }

  test("longestStreaks: islands split on the missing day") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 5L), (1L, 6L),
      (2L, 10L), (2L, 10L)).toDF("u", "day") // u2: duplicate day rows
    val out = Stats.longestStreaks(df, "u", "day", topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) == ((5L, 3L)))
    assert(out(2L) == ((1L, 1L)))
  }

  test("rfmSegments: distinct metrics yield distinct quintiles, exact rollup") {
    import spark.implicits._
    // 5 users: user i has last day i, i events of 100·i cents each
    val rows = (1 to 5).flatMap(i =>
      (1 to i).map(_ => (i.toLong, i.toLong, 100L * i)))
    val out = Stats.rfmSegments(rows.toDF("u", "day", "cents"),
      "u", "day", "cents").collect()
    assert(out.length == 5) // all metrics distinct → 5 distinct codes
    // user 5: most recent (r=1), most frequent (f=1), biggest spend (m=1)
    val top = out.find(_.getString(0) == "111").get
    assert(top.getLong(1) == 1L)
    // avg per-ENTITY total spend: 5 events × 500 cents = 25.00
    assert(top.getDouble(2) == 25.0)
  }

  test("hillTailIndex: hand-computed gamma over the top-k order stats") {
    import spark.implicits._
    val df = Seq((16L, 1L), (8L, 2L), (4L, 3L), (2L, 4L)).toDF("v", "id")
    val r = Stats.hillTailIndex(df, "v", "id", k = 2).head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("x_k") == 4L)
    val t1 = math.log(16.0) - math.log(4.0)
    val t2 = math.log(8.0) - math.log(4.0)
    val g = (BigDecimal(t1) + BigDecimal(t2)).toDouble / 2
    assert(r.getAs[Double]("gamma") ==
      BigDecimal(g).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("alpha") == BigDecimal(1.0 / g)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("weibullFit: censored and zero lifetimes excluded; scale doubles with time") {
    import spark.implicits._
    val base = Seq((2L, true), (4L, true), (8L, true),
      (16L, false), (0L, true)) // censored and t=0 must not count
    val r1 = Stats.weibullFit(base.toDF("t", "obs"), "t", "obs").head()
    assert(r1.getAs[Long]("n_fail") == 3L)
    val r2 = Stats.weibullFit(
      base.map { case (t, o) => (t * 2, o) }.toDF("t", "obs"),
      "t", "obs").head()
    // t → 2t: shape invariant, scale exactly doubles (Weibull property)
    assert(r2.getAs[Double]("shape") == r1.getAs[Double]("shape"))
    assert(math.abs(r2.getAs[Double]("scale") -
      2 * r1.getAs[Double]("scale")) < 1e-5)
  }

  test("entropyRate: deterministic alternating chain has predictability 1") {
    import spark.implicits._
    val ev = (0 until 8).map(i => (1L, i.toLong, i.toLong,
      if (i % 2 == 0) "a" else "b"))
      .toDF("user_id", "us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = Stats.entropyRate(ev, "user_id", "ts", "event_id",
      "event_type").head()
    assert(r.getAs[Long]("n_transitions") == 7L)
    assert(r.getAs[Double]("h_rate") == 0.0) // every next step certain
    assert(r.getAs[Double]("predictability") == 1.0)
  }

  test("partialCorrelation: z orthogonal to x and y leaves r_xy unchanged") {
    import spark.implicits._
    val df = Seq((1.0, 3.0, 1.0), (2.0, 5.0, 1.0),
      (1.0, 3.0, -1.0), (2.0, 5.0, -1.0)).toDF("x", "y", "z")
    val r = Stats.partialCorrelation(df, "x", "y", "z").head()
    assert(r.getAs[Double]("r_xy") == 1.0)
    assert(r.getAs[Double]("r_xz") == 0.0 &&
      r.getAs[Double]("r_yz") == 0.0)
    assert(r.getAs[Double]("r_xy_given_z") == 1.0)
  }

  test("residualDiagnostics: alternating residuals — hand DW and runs z") {
    import spark.implicits._
    val df = (1 to 6).map(t => ("g", t.toLong,
      if (t % 2 == 1) 1L else 3L)).toDF("g", "t", "x")
    val r = Stats.residualDiagnostics(df, "g", "t", "x").head()
    // e = 6x−12 = ±6 alternating: sd2 = 5·144, se2 = 6·36
    assert(r.getAs[Double]("dw") ==
      BigDecimal(720.0 / 216.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Long]("runs") == 6L)
    // a=b=3: mu=4, s2=1.2 → z = 2/√1.2
    assert(r.getAs[Double]("runs_z") ==
      BigDecimal(2.0 / math.sqrt(1.2)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("acfTable: alternating series gives exact ±1 at lags 1 and 2") {
    import spark.implicits._
    val rows = (1 to 6).map(t => ("g", t.toLong,
      if (t % 2 == 1) 1L else 2L))
    val acf = Stats.acfTable(rows.toDF("g", "t", "v"), "g", "t", "v",
        maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf"))
      .toMap
    assert(acf(1) == -1.0 && acf(2) == 1.0)
  }

  test("frequentPaths: session gap bounds triples; counts and shares exact") {
    import spark.implicits._
    val us = 1000000L
    val ev = Seq(
      ("u1", 0L, 1L, "a"), ("u1", 60 * us, 2L, "b"),
      ("u1", 120 * us, 3L, "c"), ("u1", 180 * us, 4L, "a"),
      // u2's second gap exceeds the 5-minute budget → no triple
      ("u2", 0L, 5L, "a"), ("u2", 60 * us, 6L, "b"),
      ("u2", 1000 * us, 7L, "c"))
      .toDF("user_id", "us", "event_id", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Stats.frequentPaths(ev, "user_id", "ts", "event_id",
        "event_type", gapUs = 300L * us, topK = 10)
      .collect().map(r => r.getString(1) -> (r.getLong(2),
        r.getAs[Double]("share"))).toMap
    assert(out == Map("a>b>c" -> ((1L, 0.5)), "b>c>a" -> ((1L, 0.5))))
  }

  test("anovaF: hand-computed SSB/SSW; identical groups give F = 0") {
    // groups a={1,2,3}, b={4,5,6}: means 2 and 5, SSB = 13.5, SSW = 4
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L)).toDF("g", "v")
    val r = Stats.anovaF(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("ss_between") == 13.5)
    assert(r.getAs[Double]("ss_within") == 4.0)
    assert(r.getAs[Double]("f") == 13.5) // (13.5/1)/(4/4)
    // same values in both groups → SSB = 0 → F = 0
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    assert(Stats.anovaF(same, "g", "v").collect()(0)
      .getAs[Double]("f") == 0.0)
  }

  test("wilcoxonSignedRank: zeros dropped, midranks under ties, exact z") {
    // d = {+1, −1, +2, +2, 0}: zero dropped → n = 4; |d| ranks:
    // 1,1 → midrank 1.5 (r2 = 3); 2,2 → midrank 3.5 (r2 = 7)
    // W+ = 1.5 + 3.5 + 3.5 = 8.5; mean = 5; tie = (2³−2)·2 = 12
    // var12 = 2·4·5·9 − 12 = 348 → z = (17−10)/√29
    val df = Seq(1L, -1L, 2L, 2L, 0L).toDF("d")
    val r = Stats.wilcoxonSignedRank(df, "d").collect()(0)
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Double]("w_plus") == 8.5)
    assert(r.getAs[Double]("z") ==
      BigDecimal(7.0 / math.sqrt(348.0 / 12.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("friedman: perfectly consistent ranks give W = 1; incomplete blocks drop") {
    // 3 blocks × 3 treatments, same order everywhere → χ² = n(k−1) = 6
    val df = Seq(("b1", "x", 1L), ("b1", "y", 2L), ("b1", "z", 3L),
      ("b2", "x", 10L), ("b2", "y", 20L), ("b2", "z", 30L),
      ("b3", "x", 5L), ("b3", "y", 6L), ("b3", "z", 7L),
      ("b4", "x", 1L)) // incomplete → dropped
      .toDF("b", "j", "v")
    val r = Stats.friedman(df, "b", "j", "v").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 3L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Double]("chi2_f") == 6.0)
    assert(r.getAs[Double]("kendall_w") == 1.0)
  }

  test("ivWald: beta = reduced form / first stage on a hand design") {
    // z=1: x̄=2, ȳ=20; z=0: x̄=1, ȳ=10 → fs=1, rf=10, β=10
    val df = Seq((1L, 2L, 20L), (1L, 2L, 20L), (0L, 1L, 10L),
      (0L, 1L, 10L)).toDF("z", "x", "y")
    val r = Stats.ivWald(df, "z", "x", "y").collect()(0)
    assert(r.getAs[Double]("first_stage") == 1.0)
    assert(r.getAs[Double]("reduced_form") == 10.0)
    assert(r.getAs[Double]("beta_iv") == 10.0)
    // zero within-arm variance → sp2 = 0 → F null (guarded)
    assert(r.isNullAt(r.fieldIndex("first_stage_f")))
  }

  test("cochranQ: textbook 3-treatment binary table") {
    // blocks: (1,1,0), (1,0,0), (1,1,1), (0,0,0)
    // C = (3,2,1), R = (2,1,3,0), N = 6, ΣR² = 14, k = 3
    // num = Σ(3C−6)² = 9+0+9 = 18; den = 3·(18−14) = 12 → Q = 2·18/12 = 3
    val rows = Seq(("b1", "t1", 1L), ("b1", "t2", 1L), ("b1", "t3", 0L),
      ("b2", "t1", 1L), ("b2", "t2", 0L), ("b2", "t3", 0L),
      ("b3", "t1", 1L), ("b3", "t2", 1L), ("b3", "t3", 1L),
      ("b4", "t1", 0L), ("b4", "t2", 0L), ("b4", "t3", 0L))
      .toDF("b", "j", "x")
    val r = Stats.cochranQ(rows, "b", "j", "x").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Long]("n_informative") == 2L)
    assert(r.getAs[Double]("q") == 3.0)
  }

  test("kendallTauRatio: monotone series gives tau = 1; x-tie discounts correctly") {
    // y = sn/sd equals x exactly → all 3 pairs concordant
    val mono = Seq((1L, 1L, 10L, 10L), (2L, 2L, 20L, 10L),
      (3L, 3L, 30L, 10L)).toDF("t", "x", "sn", "sd")
    val r = Stats.kendallTauRatio(mono, "t", "x", "sn", "sd").head()
    assert(r.getAs[Long]("concordant") == 3L &&
      r.getAs[Double]("tau_b") == 1.0)
    // x = (1,1,2): one x-tie pair → τ-b = 2/√(2·3)
    val tied = Seq((1L, 1L, 1L, 1L), (2L, 1L, 2L, 1L), (3L, 2L, 3L, 1L))
      .toDF("t", "x", "sn", "sd")
    val r2 = Stats.kendallTauRatio(tied, "t", "x", "sn", "sd").head()
    assert(r2.getAs[Long]("ties_x") == 1L &&
      r2.getAs[Long]("concordant") == 2L)
    assert(r2.getAs[Double]("tau_b") ==
      BigDecimal(2.0 / math.sqrt(6.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("pacf: alternating series — hand rho and Durbin-Levinson phi22") {
    // v alternates ±1 around mean 0 over 6 consecutive days:
    // rho1 = −5/6, rho2 = 4/6, rho3 = −3/6; p22 = (r2−r1²)/(1−r1²) = −1/11
    val df = (0 to 5).map(t => ("a", t.toLong, if (t % 2 == 0) 2L else 0L))
      .toDF("g", "t", "v")
    val r = Stats.pacf(df, "g", "t", "v").head()
    assert(r.getAs[Double]("rho1") == -0.833333)
    assert(r.getAs[Double]("rho2") == 0.666667)
    assert(r.getAs[Double]("rho3") == -0.5)
    assert(r.getAs[Double]("pacf1") == -0.833333)
    assert(r.getAs[Double]("pacf2") ==
      BigDecimal(-1.0 / 11.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("holtWinters: two-step hand recurrence; singleton is its own forecast") {
    // y = [10, 12]: ℓ₂ = 0.5·12 + 0.5·10 = 11, b₂ = 0.25, s[1] = 0.25,
    // sse = (12−10)² = 4; next slot is s[2] = 0 → forecast 11.25
    val df = Seq(("a", 1L, 10L), ("a", 2L, 12L)).toDF("g", "t", "y")
    val r = Stats.holtWinters(df, "g", "t", "y").head()
    assert(r.getAs[Double]("level") == 11.0)
    assert(r.getAs[Double]("trend") == 0.25)
    assert(r.getAs[Double]("forecast_next") == 11.25)
    assert(r.getAs[Double]("mse") == 4.0)
    assert(r.getAs[Double]("seas_amplitude") == 0.25) // max 0.25, min 0
    val one = Seq(("a", 1L, 10L)).toDF("g", "t", "y")
    val r1 = Stats.holtWinters(one, "g", "t", "y").head()
    assert(r1.getAs[Double]("level") == 10.0 &&
      r1.getAs[Double]("forecast_next") == 10.0)
  }

  test("mannKendall: monotone series — exact S and z; constant series degenerates") {
    // strictly increasing n=4: S = 6, var·18 = 4·3·13 = 156
    val up = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 4L)).toDF("g", "t", "v")
    val r = Stats.mannKendall(up, "g", "t", "v").head()
    assert(r.getAs[Long]("s_stat") == 6L)
    assert(r.getAs[Double]("var_s") ==
      BigDecimal(156.0 / 18.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("z") ==
      BigDecimal(5.0 / math.sqrt(156.0 / 18.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // constant series: every pair tied → var18 = 0 → z NULL
    val flat = Seq(("a", 1L, 7L), ("a", 2L, 7L), ("a", 3L, 7L))
      .toDF("g", "t", "v")
    val rf = Stats.mannKendall(flat, "g", "t", "v").head()
    assert(rf.getAs[Long]("s_stat") == 0L && rf.isNullAt(rf.fieldIndex("z")))
  }

  test("effectSizes: known pooled-SD d and Hedges shrinkage direction") {
    // a={1,2,3}, b={4,5,6}: s² = 1 both → sp = 1, d = −3; J = 1 − 3/15
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L)).toDF("arm", "v")
    val r = Stats.effectSizes(df, "arm", "v").collect()(0)
    assert(r.getAs[String]("arm_a") == "a")
    assert(r.getAs[Double]("cohen_d") == -3.0)
    assert(r.getAs[Double]("hedges_g") == -2.4)
  }

  test("wasserstein1: pure shift scores the shift; identical slices score 0") {
    // a = {0, 10}, b = {3, 13}: uniform +3 shift → W1 = 3
    val df = Seq(("g", false, 0L), ("g", false, 10L),
      ("g", true, 3L), ("g", true, 13L)).toDF("g", "cur", "v")
    val r = Stats.wasserstein1(df, "g", "cur", "v").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("w1") == 3.0)
    // identical distributions → 0
    val same = Seq(("g", false, 5L), ("g", true, 5L),
      ("g", false, 9L), ("g", true, 9L)).toDF("g", "cur", "v")
    assert(Stats.wasserstein1(same, "g", "cur", "v")
      .head().getAs[Double]("w1") == 0.0)
  }

  test("matrixProfileMotifs: repeated shape found, overlaps excluded") {
    // series: pattern (1,5) at t=0, noise, same pattern at t=6
    val s = Seq(0L -> 1L, 1L -> 5L, 2L -> 9L, 3L -> 2L, 4L -> 7L,
      5L -> 3L, 6L -> 1L, 7L -> 5L).toDF("t", "v")
    val out = Stats.matrixProfileMotifs(s, "t", "v", m = 2, k = 1).head()
    // windows at 0 and 6 are both (1,5) → dist² = 0, |0−6| ≥ 2
    assert(out.getAs[Long]("ta") == 0L && out.getAs[Long]("tb") == 6L)
    assert(out.getAs[Long]("dist2") == 0L)
    // trivial-match exclusion: adjacent windows never pair
    val flat = Seq(0L -> 1L, 1L -> 1L, 2L -> 1L).toDF("t", "v")
    val pairs = Stats.matrixProfileMotifs(flat, "t", "v", m = 2, k = 10)
    assert(pairs.count() == 0L) // only windows 0,1 exist; |0−1| < 2
  }

  test("boostedStumps: round-1 split and leaves exact; round-2 mse never worse") {
    // f1 separates y={10,10} vs {20,20} perfectly; f2 splits the
    // residual noise {−1,+1} within each leaf
    val df = Seq((1L, 1L, 9L), (1L, 2L, 11L), (2L, 1L, 19L),
      (2L, 2L, 21L)).toDF("f1", "f2", "y")
    val out = Stats.boostedStumps(df, "f1", "f2", "y")
      .orderBy("round").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("thr") == 1L)
    assert(r1.getAs[Double]("leaf_lo") == 10.0 &&
      r1.getAs[Double]("leaf_hi") == 20.0)
    assert(r1.getAs[Double]("mse") == 1.0) // residuals ±1 everywhere
    val r2 = out(1)
    // f2 = 1 rows have residual −1, f2 = 2 rows +1 → perfect round 2
    assert(r2.getAs[Long]("thr") == 1L)
    assert(r2.getAs[Double]("leaf_lo") == -1.0 &&
      r2.getAs[Double]("leaf_hi") == 1.0)
    assert(r2.getAs[Double]("mse") == 0.0)
  }

  test("hierarchicalMedianForecast: medians don't add — gap is the proof") {
    // parent P, children a and b over ticks 1..5 (window 5):
    // a = {0,0,0,10,10} → med 0; b = {0,0,0,8,8} → med 0; BU = 0
    // totals = {0,0,0,18,18} → direct med 0 → gap 0? shift: make ticks
    // overlap so totals median differs: a={2,2,2,10,10} med 2,
    // b={0,4,4,4,0} med 4 → BU 6; totals {2,6,6,14,10} med 6 → gap 0?
    // use a={1,9,1,9,1} med 1, b={9,1,9,1,9} med 9 → BU 10;
    // totals all 10 → direct 10 → gap 0. Anti-correlated children DO
    // add. Correlated skew: a={1,1,1,9,9} med 1, b={2,2,2,8,8} med 2 →
    // BU 3; totals {3,3,3,17,17} med 3 → gap 0 (aligned order!). Use
    // misaligned skew: a={1,1,9,9,1} b={8,2,2,2,8}:
    // meds: a → 1, b → 2, BU 3; totals {9,3,11,11,9} med 9 → gap −6
    val rows = Seq(
      ("P", "a", 1L, 1L), ("P", "a", 2L, 1L), ("P", "a", 3L, 9L),
      ("P", "a", 4L, 9L), ("P", "a", 5L, 1L),
      ("P", "b", 1L, 8L), ("P", "b", 2L, 2L), ("P", "b", 3L, 2L),
      ("P", "b", 4L, 2L), ("P", "b", 5L, 8L))
      .toDF("p", "c", "t", "v")
    val r = Stats.hierarchicalMedianForecast(rows, "p", "c", "t", "v", 5)
      .head()
    assert(r.getAs[Long]("n_children") == 2L)
    assert(r.getAs[Long]("bottom_up") == 3L)
    assert(r.getAs[Long]("direct_med") == 9L)
    assert(r.getAs[Long]("gap") == -6L)
    // a child absent in a recent tick ranks as 0, not as a missing row
    val sparse = Seq(("P", "a", 1L, 5L), ("P", "a", 5L, 5L))
      .toDF("p", "c", "t", "v")
    val r2 = Stats.hierarchicalMedianForecast(sparse, "p", "c", "t",
      "v", 5).head()
    assert(r2.getAs[Long]("bottom_up") == 0L) // {5,0,0,0,5} → med 0
  }

  test("huberMean: outlier drags the mean but barely moves the M-estimate") {
    // 9 values at 100 plus one at 10100: mean 1100; Huber(c=50) stays
    // near 100 — shift exposes the drag
    val df = (Seq.fill(9)(100L) :+ 10100L).zipWithIndex
      .map { case (v, i) => ("g", v) }.toDF("g", "v")
    val r = Stats.huberMean(df, "g", "v", c = 50L, iters = 3).head()
    assert(r.getAs[Double]("mean") == 1100.0)
    assert(math.abs(r.getAs[Double]("huber_m") - 100.0) < 60.0)
    assert(r.getAs[Double]("shift") < -900.0)
    // clean data: huber == mean exactly (all weights 1 every round)
    val clean = Seq(("g", 10L), ("g", 20L), ("g", 30L)).toDF("g", "v")
    val rc = Stats.huberMean(clean, "g", "v", c = 50L, iters = 3).head()
    assert(rc.getAs[Double]("shift") == 0.0)
  }

  test("ridgeCv: exact-fit data gives beta 2 and zero MSE at lambda 0; " +
    "shrinkage costs MSE") {
    val df = Seq((1L, 2L, 0), (2L, 4L, 1), (3L, 6L, 0), (4L, 8L, 1))
      .toDF("x", "y", "fold")
    val out = Stats.ridgeCv(df, col("x"), col("y"), col("fold"),
        nFolds = 2, lambdas = Seq(0L, 1000L))
      .orderBy("lambda", "fold").collect()
    assert(out.length == 4)
    val l0 = out.take(2)
    assert(l0.forall(_.getAs[Double]("beta") == 2.0))
    assert(l0.forall(_.getAs[Double]("fold_mse") == 0.0))
    assert(l0.forall(_.getAs[Double]("cv_mse") == 0.0))
    // lambda shrinks beta below 2 and buys positive held-out error
    val l1 = out.drop(2)
    assert(l1.forall(_.getAs[Double]("beta") < 2.0))
    assert(l1.forall(_.getAs[Double]("cv_mse") > 0.0))
  }

  test("hampelGate: outlier flagged by MAD fence; winsorized mean barely moves") {
    // group a: 1..9 plus a 10^6 glitch — median 5.5, MAD 2.5, k=3 fence
    // [5.5-7.5, 5.5+7.5]; the glitch clips to 13.0
    val df = ((1L to 9L).map(v => ("a", v)) :+ ("a", 1000000L))
      .toDF("g", "v")
    val r = Stats.hampelGate(df, "g", "v", k = 3).head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("median") == 5.5)
    assert(r.getAs[Double]("mad") == 2.5)
    assert(r.getAs[Long]("n_outliers") == 1L)
    // winsorized mean = (1+..+9 + 13)/10 = 5.8 — the plain mean is 100004.5
    assert(r.getAs[Double]("win_mean") == 5.8)
  }

  test("hampelGateScalable ≡ hampelGate bit-for-bit on shared groups") {
    // mixed group sizes (odd, even, with duplicates, with a glitch) so
    // both interpolation branches and the fence/clip algebra are hit;
    // coarseBins=4 forces pass-2 rank-selection inside crowded buckets
    val df = (((1L to 9L).map(v => ("a", v)) :+ ("a", 1000000L)) ++
      (1L to 7L).map(v => ("b", v * 3)) ++
      Seq.fill(6)(("c", 42L)) ++ Seq(("c", 41L), ("c", 10000L)))
      .toDF("g", "v")
    val exact = Stats.hampelGate(df, "g", "v", k = 3)
      .orderBy("g").collect().toSeq
    val scalable = Stats.hampelGateScalable(df, "g", "v", k = 3,
        coarseBins = 4)
      .orderBy("g").collect().toSeq
    assert(scalable == exact)
    // and nothing in the scalable plan buffers whole groups: no
    // percentile aggregate anywhere
    val p = Stats.hampelGateScalable(df, "g", "v", 3, 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("percentile"), p)
  }

  test("pettittChangepoint: clean shift peaks at the boundary; U integer-exact") {
    // 5 low values then 5 high: U peaks exactly at t=5 with
    // K = 2*Σ(low midranks) - t(n+1) → |U_5| = |2*15 - 5*11| = 25;
    // the single wild low-side outlier (90 at t=3) cannot fake a peak
    // elsewhere because ranks cap its leverage
    val df = Seq((1L, 10L), (2L, 12L), (3L, 11L), (4L, 13L), (5L, 9L),
      (6L, 100L), (7L, 102L), (8L, 101L), (9L, 103L), (10L, 99L))
      .toDF("t", "v")
    val out = Stats.pettittChangepoint(df, "t", "v")
      .orderBy("t").collect()
    val peak = out.filter(_.getAs[Boolean]("is_peak"))
    assert(peak.length == 1 && peak.head.getAs[Long]("t") == 5L)
    assert(peak.head.getAs[Long]("k_stat") == 25L)
    // last row's U must be 0 (full-rank sum identity) and never a peak
    assert(out.last.getAs[Long]("u_t") == 0L &&
      !out.last.getAs[Boolean]("is_peak"))
    // ties get midranks: duplicate values keep U integer and symmetric
    val ties = Seq((1L, 5L), (2L, 5L), (3L, 50L), (4L, 50L)).toDF("t", "v")
    val ut = Stats.pettittChangepoint(ties, "t", "v")
      .orderBy("t").collect().map(_.getAs[Long]("u_t")).toSeq
    // midranks: 1.5,1.5,3.5,3.5 → U = (3-5, 6-10, 13-15, 20-20)
    assert(ut == Seq(-2L, -4L, -2L, 0L))
  }

  test("diffInDiffSe: hand-computed two-by-two recovers lift, se and t") {
    // treated pre {10,12} post {20,22}; control pre {5,7} post {9,11}:
    // did = (21-11) - (10-6) = 6; each cell s²/n = 1 → se = 2, t = 3
    val df = Seq(
      (true, false, 10L), (true, false, 12L),
      (true, true, 20L), (true, true, 22L),
      (false, false, 5L), (false, false, 7L),
      (false, true, 9L), (false, true, 11L)).toDF("tr", "po", "v")
    val r = Stats.diffInDiffSe(df, "tr", "po", "v").head()
    assert(r.getAs[Long]("n_total") == 8L)
    assert(r.getAs[Double]("mean_t_pre") == 11.0 &&
      r.getAs[Double]("mean_t_post") == 21.0)
    assert(r.getAs[Double]("mean_c_pre") == 6.0 &&
      r.getAs[Double]("mean_c_post") == 10.0)
    assert(r.getAs[Double]("did") == 6.0)
    assert(r.getAs[Double]("se") == 2.0 && r.getAs[Double]("t") == 3.0)
  }

  test("trimmedMeanScalable: interquartile mean absorbs the glitch the plain mean eats") {
    // 1..9 + a 10^6 glitch: q25 = 3.25, q75 = 7.75 → kept {4,5,6,7},
    // trimmed mean 5.5 while the plain mean is ~100004
    val df = ((1L to 9L).map(v => ("a", v)) :+ ("a", 1000000L)).toDF("g", "v")
    val r = Stats.trimmedMeanScalable(df, "g", "v", coarseBins = 4).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("n_kept") == 4L)
    assert(r.getAs[Double]("q25") == 3.25 && r.getAs[Double]("q75") == 7.75)
    assert(r.getAs[Double]("trimmed_mean") == 5.5)
  }

  test("groupedTwoPassQuantile ≡ percentile() for quartiles on every group size") {
    // group sizes 1..7 hit every (floor, frac) combination of h = p(n−1)
    val df = (1 to 7).flatMap(n => (1 to n).map(i => (s"g$n", (i * 7 + n).toLong)))
      .toDF("g", "v")
    for ((pn, pd, p) <- Seq((1, 4, 0.25), (1, 2, 0.5), (3, 4, 0.75))) {
      val exact = df.groupBy("g").agg(expr(s"percentile(v, $p)").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val two = Stats.groupedTwoPassQuantile(
          df.select(col("g"), col("v")), pn, pd, coarseBins = 4)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(two == exact, s"p=$p: $two vs $exact")
    }
  }

  test("groupedTwoPassQuantiles: the fused multi-quantile pass equals per-quantile runs bit-for-bit") {
    val df = (1 to 7).flatMap(n => (1 to n).map(i => (s"g$n", (i * 7 + n).toLong)))
      .toDF("g", "v").select(col("g"), col("v"))
    val qs = Seq((1, 4), (1, 2), (3, 4), (7, 8))
    val fused = Stats.groupedTwoPassQuantiles(df, qs, coarseBins = 4)
      .collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(2 + i))).toMap
    qs.zipWithIndex.foreach { case ((pn, pd), i) =>
      val single = Stats.groupedTwoPassQuantile(df, pn, pd, coarseBins = 4)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      single.foreach { case (g, q) =>
        assert(fused(g)(i) == q, s"quantile $pn/$pd group $g") }
    }
  }

  test("cochranArmitage: perfect monotone trend scores positive z; flat scores 0") {
    // buckets 0,1,2 with rates 0/10, 5/10, 10/10 — exact hand values:
    // N=30 R=15 T'=Σs(rN-nR)=1*(150-150)+2*(300-150)=300
    // B = NΣns² - (Σns)² = 30*50 - 30² = 600; z = 300*√30/(√(15*15)*√600)
    val up = (0 until 10).flatMap(i => Seq((0L, false), (1L, i < 5), (2L, true)))
      .toDF("s", "f")
    val r = Stats.cochranArmitage(up, "s", "f").head()
    assert(r.getAs[Long]("t_num") == 300L)
    assert(r.getAs[Double]("z") ==
      BigDecimal(300.0 * math.sqrt(30.0) / (15.0 * math.sqrt(600.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val flat = (0 until 10).flatMap(i => Seq((0L, i < 5), (1L, i < 5)))
      .toDF("s", "f")
    assert(Stats.cochranArmitage(flat, "s", "f").head().getAs[Long]("t_num") == 0L)
  }

  test("mutualInformation: independent columns have MI 0; copies have MI = H") {
    val ind = (0 until 100).map(i => (i % 2, (i / 2) % 5)).toDF("a", "b")
    val ri = Stats.mutualInformation(ind, "a", "b").head()
    assert(ri.getAs[Double]("mi") == 0.0)
    assert(ri.getAs[Double]("nmi") == 0.0)
    // b == a: MI = H(a) = ln 2, NMI = 1
    val cp = (0 until 100).map(i => (i % 2, i % 2)).toDF("a", "b")
    val rc = Stats.mutualInformation(cp, "a", "b").head()
    assert(rc.getAs[Double]("mi") == rc.getAs[Double]("h_a"))
    assert(rc.getAs[Double]("nmi") == 1.0)
    assert(math.abs(rc.getAs[Double]("mi") - math.log(2.0)) < 1e-6)
  }

  test("benfordAudit: a perfect Benford sample scores chi2 0; uniform digits flunk") {
    // counts proportional to log10(1+1/d) out of 10000 won't be exact,
    // so build the exact-expectation case instead: one value per digit,
    // n=9, expected n*p != 1 -> chi2 > 0 but ratios computed exactly
    val uni = (1 to 9).map(d => Tuple1(d.toLong * 1000)).toDF("v")
    val ru = Stats.benfordAudit(uni, "v").collect()
    assert(ru.length == 9 && ru.forall(_.getAs[Long]("n_obs") == 1L))
    val chi2u = ru.head.getAs[Double]("chi2")
    // a heavily benford-skewed sample scores far lower chi2 per row than
    // the uniform one at the same n: 30/18/12/10/8/7/6/5/4 ~ benford
    val skew = Seq(30, 18, 12, 10, 8, 7, 6, 5, 4).zipWithIndex
      .flatMap { case (n, i) => Seq.fill(n)((i + 1).toLong * 100) }
      .map(Tuple1(_)).toDF("v")
    val chi2s = Stats.benfordAudit(skew, "v").head().getAs[Double]("chi2")
    assert(chi2s / 100 < chi2u / 9, s"skew $chi2s uniform $chi2u")
    // digit extraction ignores non-positive values
    val withJunk = uni.union(Seq(Tuple1(0L), Tuple1(-5L)).toDF("v"))
    assert(Stats.benfordAudit(withJunk, "v").count() == 9)
  }

  test("giniSplitGain: perfect splitter gains the full parent impurity; noise gains 0") {
    val df = (0 until 100).map { i =>
      (i % 2 == 0, if (i % 2 == 0) "a" else "b", ((i / 2) % 4).toString)
    }.toDF("y", "perfect", "noise")
    val out = Stats.giniSplitGain(df, "y", Seq("perfect", "noise"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("gain")).toMap
    assert(out("perfect") == 0.5) // parent gini = 0.5, children pure
    assert(out("noise") == 0.0)
  }

  test("cramersV: identical columns associate at 1; independent at 0") {
    val same = (0 until 60).map(i => (i % 3, i % 3)).toDF("a", "b")
    val rs = Stats.cramersV(same, "a", "b").head()
    assert(rs.getAs[Double]("cramers_v") == 1.0)
    val ind = (0 until 60).map(i => (i % 3, (i / 3) % 2)).toDF("a", "b")
    assert(Stats.cramersV(ind, "a", "b").head()
      .getAs[Double]("cramers_v") == 0.0)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("yuleWalkerAr2: r/phi/forecast match the closed-form tree; gaps thin pairs") {
    // v = 3,1,4,1,5,9 at t = 1..6; recompute the exact same double tree
    // (pair-sum Pearson per lag, Yule-Walker solve, mean-reverting
    // forecast from the two latest values) and demand rounded equality
    val v = Seq(3L, 1L, 4L, 1L, 5L, 9L)
    val df = v.zipWithIndex.map { case (x, i) => ((i + 1).toLong, x) }
      .toDF("t", "v")
    def pearson(pairs: Seq[(Long, Long)]): Double = {
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val r1 = pearson(v.init.zip(v.tail))
    val r2 = pearson(v.dropRight(2).zip(v.drop(2)))
    val mean = v.sum.toDouble / v.size
    val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val fc = mean + phi1 * (9L - mean) + phi2 * (5L - mean)
    val out = Stats.yuleWalkerAr2(df, "t", "v").head()
    assert(out.getAs[Long]("n") == 6L)
    assert(out.getAs[Long]("n_pairs1") == 5L &&
      out.getAs[Long]("n_pairs2") == 4L)
    assert(out.getAs[Double]("r1") == round6(r1))
    assert(out.getAs[Double]("r2") == round6(r2))
    assert(out.getAs[Double]("phi1") == round6(phi1))
    assert(out.getAs[Double]("phi2") == round6(phi2))
    assert(out.getAs[Double]("forecast_next") == round6(fc))
    // a calendar gap (no t=4) only thins the pair sets — lag-1 loses
    // the two pairs straddling the hole, lag-2 keeps the jumps over it
    val gap = Seq((1L, 3L), (2L, 1L), (3L, 4L), (5L, 5L), (6L, 9L))
      .toDF("t", "v")
    val g = Stats.yuleWalkerAr2(gap, "t", "v").head()
    assert(g.getAs[Long]("n_pairs1") == 3L &&
      g.getAs[Long]("n_pairs2") == 2L)
  }

  test("betaBinomialAb: Beta(1+s,1+n-s) posteriors and superiority z, hand-computed") {
    // arm 0: n=2, s=1 → Beta(2,2): mean 1/2, var 4/(16·5) = 0.05
    // arm 1: n=3, s=3 → Beta(4,1): mean 4/5, var 4/(25·6)
    val df = Seq((0L, true), (0L, false), (1L, true), (1L, true),
      (1L, true)).toDF("arm", "conv")
    val r = Stats.betaBinomialAb(df, "arm", "conv").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("s_a") == 1L)
    assert(r.getAs[Long]("n_b") == 3L && r.getAs[Long]("s_b") == 3L)
    assert(r.getAs[Double]("post_mean_a") == 0.5)
    assert(r.getAs[Double]("post_mean_b") == 0.8)
    assert(r.getAs[Double]("lift") == round6(0.3))
    val z = (0.8 - 0.5) / math.sqrt(0.05 + 4.0 / (25.0 * 6.0))
    assert(r.getAs[Double]("z_superiority") == round6(z))
    // mis-encoded arms fail fast instead of yielding an all-NULL row:
    // 1/2 encoding, a single arm, and string arms all raise
    intercept[IllegalArgumentException] {
      Stats.betaBinomialAb(Seq((1L, true), (2L, false)).toDF("arm", "conv"),
        "arm", "conv").head()
    }
    intercept[IllegalArgumentException] {
      Stats.betaBinomialAb(Seq((0L, true), (0L, false)).toDF("arm", "conv"),
        "arm", "conv").head()
    }
    intercept[IllegalArgumentException] {
      Stats.betaBinomialAb(Seq(("a", true), ("b", false)).toDF("arm", "conv"),
        "arm", "conv").head()
    }
  }

  test("moodMedianTest: hand-computed counts, expecteds, chi2 parts; " +
      "median values drop") {
    // values 1..8: grand median 4.5; group a = {1,2,3,8}, b = {4,5,6,7}
    // → a: above 1 / below 3; b: above 3 / below 1; e_above = 2 each
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 8L),
      ("b", 4L), ("b", 5L), ("b", 6L), ("b", 7L)).toDF("g", "v")
    val out = Stats.moodMedianTest(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // chi2_part = (1-2)²/2 + (3-2)²/2 = 1.0 for each group
    assert(out("a") == ((1L, 3L, 2.0, 1.0)))
    assert(out("b") == ((3L, 1L, 2.0, 1.0)))
    // a median VALUE drops: {1,2,3} with median 2 → 2 contributes to
    // neither count
    val med = Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("g", "v")
    val m = Stats.moodMedianTest(med, "g", "v").head()
    assert(m.getLong(1) == 1L && m.getLong(2) == 1L)
    // half-degenerate: ta = 0 (no value anywhere above the grand
    // median 2) → e_above = 0 with n_above forced 0, so chi2_part is
    // the DEFINED below-half; group b empties entirely (both values
    // equal the median) → both sides degenerate → NULL, surfaced
    val half = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 2L))
      .toDF("g", "v")
    val h = Stats.moodMedianTest(half, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val ha = h("a") // below-half: n_below=1, e_below=1 → (1-1)²/1 = 0
    assert(ha.getLong(1) == 0L && ha.getLong(2) == 1L)
    assert(ha.getAs[Double]("chi2_part") == 0.0)
    val hb = h("b")
    assert(hb.getLong(1) == 0L && hb.getLong(2) == 0L)
    assert(hb.isNullAt(hb.fieldIndex("chi2_part")))
  }

  test("negativeBinomialFit: MoM closed form on a hand design; " +
      "underdispersed group gets NULL fit") {
    // group a: k = 1,2,3,6 → n=4, m=3, var = (1+4+0+9)... sample var
    // = ((1-3)²+(2-3)²+(3-3)²+(6-3)²)/3 = (4+1+0+9)/3 = 14/3
    // r = 9/(14/3-3) = 9/(5/3) = 5.4, p = 3/(14/3) = 9/14
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 6L),
      ("b", 2L), ("b", 2L), ("b", 2L)).toDF("g", "k")
    val out = Stats.negativeBinomialFit(df, "g", "k")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Double]("mean") == 3.0)
    assert(a.getAs[Double]("variance") == round6(14.0 / 3.0))
    assert(a.getAs[Double]("nb_r") == round6(9.0 / (14.0 / 3.0 - 3.0)))
    assert(a.getAs[Double]("nb_p") == round6(3.0 / (14.0 / 3.0)))
    val b = out("b") // variance 0 ≤ mean → no NB fit
    assert(b.isNullAt(b.fieldIndex("nb_r")) &&
      b.isNullAt(b.fieldIndex("nb_p")))
  }

  test("rmst: area under the KM steps, head segment + horizon cut") {
    // the KaplanMeier spec's curve: S(1)=2/3, S(2)=1/3; at tau=5 the
    // area is 1 (head, S=1 on [0,1)) + 2/3·1 + 1/3·3
    val life = Seq((1L, true), (2L, true), (3L, false)).toDF("t", "obs")
    val r = Stats.rmst(life, "t", "obs", tau = 5L).head()
    assert(r.getAs[Long]("tau") == 5L && r.getAs[Long]("n_steps") == 2L)
    assert(r.getAs[Double]("rmst") == round6(1.0 + 2.0 / 3.0 + 1.0))
    assert(r.getAs[Double]("km_tail") == round6(1.0 / 3.0))
    // horizon before the first event: the curve is flat 1 on [0, tau)
    val early = Stats.rmst(life, "t", "obs", tau = 1L).head()
    assert(early.getAs[Long]("n_steps") == 0L &&
      early.getAs[Double]("rmst") == 1.0)
  }

  test("ccfTable: shifted copy peaks at its lag; zero-variance legs stay null") {
    // y is x delayed by one step (y_{t+1} = x_t), so lag +1 correlates
    // perfectly and must be the unique peak
    val df = Seq((1L, 3L, 9L), (2L, 1L, 3L), (3L, 4L, 1L),
      (4L, 1L, 4L), (5L, 5L, 1L)).toDF("t", "x", "y")
    val out = Stats.ccfTable(df, "t", "x", "y", maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("ccf"),
          r.getAs[Boolean]("is_peak"))).toMap
    assert(out(1)._2 == 1.0 && out(1)._3)
    assert(out(1)._1 == 4L && out(0)._1 == 5L && out(-2)._1 == 3L)
    assert(out.filter(_._2._3).keySet == Set(1))
    // a constant y has zero variance at every lag: all ccf NULL, and
    // the peak flag must not fire anywhere
    val const = Seq((1L, 3L, 7L), (2L, 1L, 7L), (3L, 4L, 7L))
      .toDF("t", "x", "y")
    val c = Stats.ccfTable(const, "t", "x", "y", maxLag = 1).collect()
    assert(c.forall(r => r.isNullAt(r.fieldIndex("ccf"))))
    assert(c.forall(!_.getAs[Boolean]("is_peak")))
    // lags beyond the calendar span emit no row at all: a 3-point
    // series only aligns pairs for lags -2..2
    assert(Stats.ccfTable(const, "t", "x", "y", maxLag = 5)
      .count() == 5L)
  }

  test("jonckheereTerpstra: hand-counted pair wins, ties at half weight") {
    // groups 1:{1,2} 2:{2,3} 3:{4}: 2U_12 = 2+2+1+2 = 7 (one tie),
    // 2U_13 = 4, 2U_23 = 4 → j2 = 15; e2 = (25 − 9)/2 = 8;
    // var = (25·13 − (4·7 + 4·7 + 5))/72 = 264/72
    val df = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 4L))
      .toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 5L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("j2") == 15L && r.getAs[Long]("e2") == 8L)
    assert(r.getAs[Double]("z") ==
      round6(7.0 / (2.0 * math.sqrt(264.0 / 72.0))))
  }

  test("conoverIman: no-tie hand case; midranks under ties") {
    // a:{1,2} b:{3,4}: mean ranks 1.5 / 3.5, H = 2.4, S² = 5/3,
    // se = √(5/3 · (4−1−2.4)/(4−2) · 1) = √0.5 → t = −2/√0.5
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val r = Stats.conoverIman(df, "g", "v").head()
    assert(r.getAs[Double]("mean_rank_a") == 1.5 &&
      r.getAs[Double]("mean_rank_b") == 3.5)
    assert(r.getAs[Double]("t_stat") == round6(-2.0 / math.sqrt(0.5)))
    // ties: a:{1,1} b:{1,3} — the three 1s share midrank 2, so the
    // group mean ranks are 2 and (2+4)/2 = 3
    val ties = Seq(("a", 1L), ("a", 1L), ("b", 1L), ("b", 3L))
      .toDF("g", "v")
    val t = Stats.conoverIman(ties, "g", "v").head()
    assert(t.getAs[Double]("mean_rank_a") == 2.0 &&
      t.getAs[Double]("mean_rank_b") == 3.0)
  }

  test("pageTrend: monotone blocks hit the closed-form z; incomplete blocks drop") {
    // two blocks, both strictly increasing across ordered treatments
    // 10 < 20 < 30: doubled rank sums 4/8/12 → L2 = 56, E2 = 48,
    // Var = 4 → z = 8/(2·2) = 2
    val cells = Seq((1L, 10L, 5L), (1L, 20L, 7L), (1L, 30L, 9L),
      (2L, 10L, 1L), (2L, 20L, 2L), (2L, 30L, 3L))
      .toDF("b", "j", "v")
    val r = Stats.pageTrend(cells, "b", "j", "v").head()
    assert(r.getAs[Long]("n_blocks") == 2L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("l2") == 56L && r.getAs[Long]("e2") == 48L)
    assert(r.getAs[Double]("z") == 2.0)
    // a block missing a treatment is excluded, leaving the same answer
    val withPartial = cells.unionByName(
      Seq((3L, 10L, 4L), (3L, 20L, 6L)).toDF("b", "j", "v"))
    val p = Stats.pageTrend(withPartial, "b", "j", "v").head()
    assert(p.getAs[Long]("n_blocks") == 2L &&
      p.getAs[Double]("z") == 2.0)
  }

  test("ebBetaBinomialShrink: MoM prior pulls small segments; degenerate prior falls back") {
    // rates 0.5 / 0.3 / 0.7 → μ = 0.5, σ² = 0.04, m = 5.25,
    // a = b = 2.625; the n=1000 segment barely moves
    val per = Seq(("A", 10L, 5L), ("B", 10L, 3L), ("C", 1000L, 700L))
      .toDF("seg", "n", "s")
    val out = Stats.ebBetaBinomialShrink(per, "seg", "n", "s")
      .collect().map(r => r.getAs[String]("seg") -> r).toMap
    assert(out("A").getAs[Double]("shrunk_rate") == 0.5)
    assert(out("B").getAs[Double]("shrunk_rate") ==
      round6((3.0 + 2.625) / (10.0 + 2.625 + 2.625)))
    assert(out("C").getAs[Double]("shrunk_rate") ==
      round6((700.0 + 2.625) / (1000.0 + 2.625 + 2.625)))
    assert(out("A").getAs[Double]("prior_a") == 2.625 &&
      out("A").getAs[Double]("prior_b") == 2.625)
    // identical rates → zero variance → no valid Beta prior: raw rates
    // pass through and the prior columns stay NULL
    val flat = Seq(("A", 10L, 5L), ("B", 20L, 10L)).toDF("seg", "n", "s")
    val f = Stats.ebBetaBinomialShrink(flat, "seg", "n", "s").collect()
    assert(f.forall(r => r.getAs[Double]("shrunk_rate") ==
      r.getAs[Double]("raw_rate")))
    assert(f.forall(r => r.isNullAt(r.fieldIndex("prior_a"))))
  }

  test("tukeyHsd: pooled MSE and Tukey-Kramer q on a hand grid") {
    // a:{1,3} b:{5,7} c:{9,11}: means 2/6/10, SS_within = 6, N−k = 3,
    // MSE = 2 → se = √(2/2·(1/2+1/2)) = 1, so q = raw mean diff
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L),
      ("c", 9L), ("c", 11L)).toDF("g", "v")
    val out = Stats.tukeyHsd(df, "g", "v").orderBy("g_a", "g_b")
      .collect()
    assert(out.length == 3)
    val byPair = out.map(r => (r.getAs[String]("g_a"),
      r.getAs[String]("g_b")) -> r).toMap
    assert(byPair(("a", "b")).getAs[Double]("q_stat") == -4.0)
    assert(byPair(("a", "c")).getAs[Double]("q_stat") == -8.0)
    assert(byPair(("b", "c")).getAs[Double]("q_stat") == -4.0)
    assert(byPair(("a", "c")).getAs[Double]("diff") == -8.0)
    assert(byPair(("a", "b")).getAs[Long]("n_a") == 2L)
  }
}
