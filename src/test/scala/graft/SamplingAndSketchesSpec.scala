package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Sketches}

class SamplingAndSketchesSpec extends SparkSpec {
  import spark.implicits._

  test("cmsInnerProduct: ≥ exact F2 always, = with a collision-free grid") {
    import graft.operators.Sketches
    // 4 distinct keys, width 4096 → collisions vanishingly unlikely
    val df = (Seq.fill(3)(10L) ++ Seq.fill(2)(20L) ++ Seq(30L, 40L))
      .toDF("key")
    val grid = Sketches.cmsCounters(df, "key", 4, 4096)
    val est = Sketches.cmsInnerProduct(grid, grid)
      .head().getLong(0)
    val exactF2 = 9L + 4L + 1L + 1L
    assert(est == exactF2)
    // a tight grid (width 2) forces collisions → strict overestimate
    val tight = Sketches.cmsCounters(df, "key", 4, 2)
    val est2 = Sketches.cmsInnerProduct(tight, tight).head().getLong(0)
    assert(est2 >= exactF2)
  }

  test("budgetCurve: cumulative tokens step down the quality levels") {
    // levels: 0.9 → (2 docs, 30 tok), 0.5 → (1, 5), 0.1 → (3, 9)
    val df = Seq((0.9, 10L), (0.9, 20L), (0.5, 5L),
        (0.1, 3L), (0.1, 3L), (0.1, 3L)).toDF("q", "w")
    val out = Sampling.budgetCurve(df, "q", "w")
      .orderBy(org.apache.spark.sql.functions.desc("q"))
      .as[(Double, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((0.9, 2L, 30L, 2L, 30L),
      (0.5, 1L, 5L, 3L, 35L), (0.1, 3L, 9L, 6L, 44L)))
  }

  test("hash sampling is deterministic and approximately honors strata rates") {
    val df = (0L until 2000L).map(i => (i, if (i % 4 == 0) "en" else "xx"))
      .toDF("id", "lang")
    val once = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 50), 10)
      .select("id").as[Long].collect().sorted.toSeq
    val twice = Sampling.stratifiedSample(df, "id", "lang", Map("en" -> 50), 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(once == twice) // pure function of the key — no rand()
    val en = once.count(_ % 4 == 0).toDouble / 500
    val xx = once.count(_ % 4 != 0).toDouble / 1500
    assert(en > 0.4 && en < 0.6, s"en rate $en")
    assert(xx > 0.05 && xx < 0.15, s"xx rate $xx")
  }

  test("train/test split is stable and near the requested fraction") {
    val df = (0L until 1000L).map(Tuple1(_)).toDF("id")
    val split = Sampling.trainTestSplit(df, "id", 80)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(split("train") > 700 && split("train") < 900)
    assert(split("train") + split("eval") == 1000)
  }

  test("packed Bloom probe ≡ bit-frame probe, and both superset the build set") {
    val m = 4096; val k = 3
    val build = (0L until 300L).map(i => Tuple1(i * 7)).toDF("key")
    val probe = (0L until 3000L).map(Tuple1(_)).toDF("key")
    val bits = Sketches.bloomBits(build, "key", m, k)
    val viaFrame = Sketches.bloomProbe(probe, "key", bits, m, k)
      .as[Long].collect().toSet
    val words = Sketches.packBits(bits, m)
    val viaPacked = Sketches.bloomProbePacked(probe, "key", words, m, k)
      .as[Long].collect().toSet
    assert(viaPacked == viaFrame) // the native expr replays keyHash bit-for-bit
    val inRange = (0L until 300L).map(_ * 7).filter(_ < 3000).toSet
    assert(inRange.subsetOf(viaPacked)) // no false negatives
  }

  test("CMS estimates dominate true counts and are exact for isolated keys") {
    // 500 distinct keys, key i appearing (i % 10) + 1 times
    val rows = (0L until 500L).flatMap(i => Seq.fill((i % 10).toInt + 1)(Tuple1(i)))
    val df = rows.toDF("key")
    val counters = Sketches.cmsCounters(df, "key", 4, 1024)
    val truth = df.groupBy("key").count()
    val est = Sketches.cmsEstimate(truth, "key", counters, 4, 1024)
      .join(truth, "key").as[(Long, Long, Long)].collect()
    assert(est.length == 500)
    est.foreach { case (k, e, t) => assert(e >= t, s"key $k: est $e < true $t") }
  }

  test("HLL per-group estimate is deterministic and within ~2σ (m=32 → σ≈18%)") {
    // gcd(3, 2000) = 1, so every group sees all 2000 key residues
    val df = (0L until 6000L).map(i => (s"g${i % 3}", i % 2000)).toDF("g", "key")
    val once = Sketches.hllDistinctByGroup(df, "g", "key", 5)
      .as[(String, Double)].collect().toMap
    val twice = Sketches.hllDistinctByGroup(df.repartition(7), "g", "key", 5)
      .as[(String, Double)].collect().toMap
    assert(once == twice) // pure function of the value set — layout-independent
    once.values.foreach(v => assert(math.abs(v - 2000) / 2000 < 0.4, s"estimate $v"))
  }

  test("KMV is exact below k and within ~15% above k (deterministic)") {
    val small = (0L until 100L).map(Tuple1(_)).toDF("k")
    val exact = Sketches.kmvDistinct(small, "k", 256)
      .as[(Double, Long)].head()
    assert(exact == ((100.0, 100L)))

    val big = (0L until 20000L).map(i => Tuple1(i % 5000)).toDF("k")
    val (est, n) = Sketches.kmvDistinct(big, "k", 256).as[(Double, Long)].head()
    assert(n == 256)
    assert(math.abs(est - 5000) / 5000 < 0.15, s"estimate $est for 5000 distinct")
  }

  test("KMV Jaccard: identical sets → 1, disjoint sets → 0, and the " +
    "estimate tracks true overlap above k") {
    val a = (0L until 120L).map(Tuple1(_)).toDF("k")
    val same = Sketches.kmvJaccard(a, a, "k", 64)
      .select("n_union", "n_both", "jaccard_est").as[(Long, Long, Double)].head()
    assert(same == ((64L, 64L, 1.0)))

    val b = (1000L until 1120L).map(Tuple1(_)).toDF("k")
    val disj = Sketches.kmvJaccard(a, b, "k", 64)
      .select("n_both", "jaccard_est").as[(Long, Double)].head()
    assert(disj == ((0L, 0.0)))

    // |A|=3000, |B|=3000, |A∩B|=1000 → J = 1000/5000 = 0.2
    val bigA = (0L until 3000L).map(Tuple1(_)).toDF("k")
    val bigB = (2000L until 5000L).map(Tuple1(_)).toDF("k")
    val r = Sketches.kmvJaccard(bigA, bigB, "k", 256)
    val (j, inter) = r.select("jaccard_est", "intersection_est")
      .as[(Double, Double)].head()
    assert(math.abs(j - 0.2) < 0.08, s"jaccard $j for true 0.2")
    assert(math.abs(inter - 1000) / 1000 < 0.4, s"intersection $inter for 1000")
    // below-k exact fallback: union estimate equals the true union size
    val ua = (0L until 30L).map(Tuple1(_)).toDF("k")
    val ub = (20L until 50L).map(Tuple1(_)).toDF("k")
    val (nu, ue) = Sketches.kmvJaccard(ua, ub, "k", 64)
      .select("n_union", "union_est").as[(Long, Double)].head()
    assert(nu == 50L && ue == 50.0)
  }

  test("domain mix hits the target proportions within hash-sampling noise") {
    // 3000 a / 1000 b → target 50/50: b is the binding domain (keeps all
    // ~1000), a keeps ~1000 of 3000
    val df = ((0L until 3000L).map((_, "a")) ++ (3000L until 4000L).map((_, "b")))
      .toDF("id", "dom")
    val out = Sampling.domainMix(df, "id", "dom", Map("a" -> 0.5, "b" -> 0.5))
    val byDom = out.groupBy("dom").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(byDom("b") - 1000L) <= 60, s"binding domain kept ${byDom("b")}")
    assert(math.abs(byDom("a") - 1000L) <= 60, s"sampled domain kept ${byDom("a")}")
    // deterministic: independent of partitioning
    val again = Sampling.domainMix(df.repartition(13), "id", "dom",
      Map("a" -> 0.5, "b" -> 0.5)).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("domain mix keeps everything when the data already matches the mix") {
    val df = ((0L until 500L).map((_, "a")) ++ (500L until 1000L).map((_, "b")))
      .toDF("id", "dom")
    val out = Sampling.domainMix(df, "id", "dom", Map("a" -> 0.5, "b" -> 0.5))
    assert(out.count() == 1000L) // keep_frac = 1.0 for both
  }

  test("domain cap keeps at most cap rows per domain, deterministically") {
    val df = ((0L until 100L).map((_, "big")) ++ (100L until 105L).map((_, "small")))
      .toDF("id", "dom")
    val out = Sampling.domainCap(df, "id", "dom", cap = 10)
    val byDom = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom("big") == 10L && byDom("small") == 5L)
    // stable under re-partitioning: same surviving ids
    val again = Sampling.domainCap(df.repartition(7), "id", "dom", cap = 10)
    assert(out.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
  }

  test("temperature mix thins heads by sqrt(min/count) and keeps the tail whole") {
    // 4000 a / 1000 b / 250 c → keep fracs √(250/4000)=0.25, 0.5, 1.0
    val df = ((0L until 4000L).map((_, "a")) ++ (4000L until 5000L).map((_, "b"))
        ++ (5000L until 5250L).map((_, "c"))).toDF("id", "dom")
    val byDom = Sampling.temperatureMix(df, "id", "dom")
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom("c") == 250L) // rarest domain: keep_frac exactly 1
    assert(math.abs(byDom("a") - 1000L) <= 80, s"a kept ${byDom("a")}")
    assert(math.abs(byDom("b") - 500L) <= 60, s"b kept ${byDom("b")}")
  }

  test("epoch mix duplicates by floor(w) plus a hash coin for the fraction") {
    val df = ((0L until 1000L).map((_, "hi")) ++ (1000L until 2000L).map((_, "lo"))
        ++ (2000L until 2100L).map((_, "other"))).toDF("id", "dom")
    val out = Sampling.epochMix(df, "id", "dom", Map("hi" -> 2.25, "lo" -> 0.5))
    val byDom = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom("other") == 100L) // unspecified domain: weight 1
    // hi: 2 guaranteed epochs + ~25% third copies
    assert(byDom("hi") >= 2100L && byDom("hi") <= 2400L, s"hi got ${byDom("hi")}")
    assert(math.abs(byDom("lo") - 500L) <= 60, s"lo got ${byDom("lo")}")
    // every hi row has epochs 0 and 1; epoch indexes are dense per row
    val epochs = out.filter(col("dom") === "hi")
      .groupBy("id").agg(collect_list("epoch").as("e"))
      .select(expr("size(e)"), expr("array_min(e)"), expr("array_max(e)"))
      .as[(Int, Long, Long)].collect()
    assert(epochs.forall { case (n, mn, mx) => mn == 0L && mx == n - 1 })
    // deterministic under repartition
    val again = Sampling.epochMix(df.repartition(7), "id", "dom",
      Map("hi" -> 2.25, "lo" -> 0.5))
      .select("id", "epoch").as[(Long, Long)].collect().toSet
    assert(again == out.select("id", "epoch").as[(Long, Long)].collect().toSet)
  }

  test("negative samples: k per anchor, never same-cell, stable under repartition") {
    val assigned = (0L until 200L).map(i => (i, (i % 4).toInt)).toDF("id", "cell")
    val anchors = assigned.filter(col("id") < 3)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.negativeSamples(df, "id", "cell", anchors, "id", "cell", k = 5)
        .select("anchor_id", "rank", "neg_id")
        .as[(Long, Int, Long)].collect().toSet
    val out = run(assigned)
    assert(out.groupBy(_._1).forall(_._2.size == 5))
    // anchor a lives in cell a%4 — no negative may share it
    assert(out.forall { case (a, _, n) => n % 4 != a % 4 && n != a })
    assert(run(assigned.repartition(7)) == out) // pure function of the ids
  }

  test("HLL registers merge to the exact same estimate as the direct sketch") {
    import org.apache.spark.sql.functions._
    val df = (0L until 3000L).map(i => (i % 97 + i / 800 * 1000, s"g${i % 3}", i % 5))
      .toDF("key", "g", "shard")
    val direct = Sketches.hllDistinctByGroup(df, "g", "key", 5)
      .as[(String, Double)].collect().toMap
    // shard-level register tables (what each partition persists), merged
    val regs = Sketches.hllRegisters(df, Seq("shard", "g"), "key", 5)
    val merged = Sketches.hllMergeEstimate(regs, "g", 5)
      .as[(String, Double)].collect().toMap
    assert(merged == direct) // max is associative: any merge tree is exact
    // register table is bounded: ≤ m rows per (shard, group)
    val maxRegs = regs.groupBy("shard", "g").count()
      .agg(max("count")).as[Long].head()
    assert(maxRegs <= 32L)
  }

  test("sharded CMS grids merge to exactly the single-pass grid") {
    val df = (0L until 2000L).map(i => (i % 37, (i % 6).toInt)).toDF("key", "shard")
    val direct = Sketches.cmsCounters(df, "key", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.cmsMerge(
        Sketches.cmsCountersSharded(df, Seq("shard"), "key", 4, 64))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == direct) // cells are linear: Σ shard grids ≡ one pass
  }

  test("histogram quantiles interpolate exactly on a hand-computed grid") {
    // 100 values 0.5..99.5 into 10 bins of width 10 → each bin holds 10
    val df = (0 until 100).map(i => Tuple1(i + 0.5)).toDF("v")
    val hist = Sketches.histogramCounts(df, "v", 0.0, 100.0, 10)
    assert(hist.as[(Long, Long)].collect().toMap.values.forall(_ == 10L))
    val qs = Sketches.histogramQuantiles(hist, 0.0, 100.0, 10, Seq(0.5, 0.95))
      .as[(Double, Double)].collect().toMap
    // p50: target=50, bucket 4 (cum 50), est = 40 + 10*(50-40)/10 = 50
    assert(qs(0.5) == 50.0)
    // p95: target=95, bucket 9 (cum 100), est = 90 + 10*(95-90)/10 = 95
    assert(qs(0.95) == 95.0)
  }

  test("histogram counts sum-merge across shards like any linear sketch") {
    val df = (0L until 1000L).map(i => (i % 100 + 0.5, (i % 3).toInt)).toDF("v", "shard")
    val direct = Sketches.histogramCounts(df, "v", 0.0, 100.0, 20)
      .as[(Long, Long)].collect().toMap
    val sharded = (0 until 3).map(sh =>
        Sketches.histogramCounts(df.filter(col("shard") === sh), "v", 0.0, 100.0, 20))
      .reduce(_ unionByName _)
      .groupBy("b").agg(sum("c").as("c"))
      .as[(Long, Long)].collect().toMap
    assert(sharded == direct)
  }

  test("recall@k matches hand-computed overlap per query") {
    import graft.operators.Similarity
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 20L)).toDF("qid", "id")
    val exact = Seq((1L, 10L), (1L, 12L), (2L, 20L), (2L, 21L)).toDF("qid", "id")
    val r = Similarity.recallAtK(approx, exact, "qid", "id", 2)
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((1L, 0.5)))
    assert(r(2L) == ((1L, 0.5)))
  }

  test("recall@k keeps zero-hit queries as explicit 0-recall rows") {
    import graft.operators.Similarity
    val approx = Seq((1L, 10L), (2L, 99L)).toDF("qid", "id")
    val exact = Seq((1L, 10L), (1L, 12L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("qid", "id")
    val r = Similarity.recallAtK(approx, exact, "qid", "id", 2)
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r.size == 3, "every exact-side query must appear")
    assert(r(1L) == ((1L, 0.5)))
    assert(r(2L) == ((0L, 0.0))) // approx hit none of q2's true neighbors
    assert(r(3L) == ((0L, 0.0))) // query entirely absent from approx
  }

  test("DSIR: target-looking docs outrank raw-only docs; selection is floor(pct)") {
    // 4 docs sharing the target phrase + 4 of unrelated filler; the two
    // held-out docs (not flagged as target) that REPEAT the target bigrams
    // must outrank the filler docs
    val target = "spark shuffle exchange partition"
    val df = Seq(
      (1L, target, "tgt"), (2L, target, "tgt"),
      (3L, target + " " + target, "raw"),     // target-looking, unlabeled
      (4L, target, "raw"),                    // target-looking, unlabeled
      (5L, "completely unrelated words entirely", "raw"),
      (6L, "other filler text goes here now", "raw"),
      (7L, "nothing in common with anything", "raw"),
      (8L, "", "raw")                         // featureless: must survive
    ).toDF("doc_id", "text", "dom")
    val out = Sampling.dsirSelect(df, "doc_id", "text",
        col("dom") === "tgt", buckets = 16, selectPct = 25)
      .select("doc_id", "n_feats", "weight", "rank", "selected")
      .as[(Long, Int, Long, Int, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(out.size == 8, "every doc stays in the output")
    assert(out(8L)._2 == 0 && out(8L)._3 == 0L, "featureless doc scores 0")
    // per-feature average weight: target docs' buckets carry high ratios
    def avg(id: Long): Double = out(id)._3.toDouble / math.max(out(id)._2, 1)
    assert(avg(3L) > avg(5L) && avg(4L) > avg(6L),
      "target-profile docs carry higher importance per feature")
    // floor semantics: 8 docs * 25% = 2 selected, ranks 1 and 2
    assert(out.values.count(_._5) == 2)
    assert(out.values.filter(_._5).map(_._4).toSet == Set(1, 2))
    // deterministic under repartition
    val again = Sampling.dsirSelect(df.repartition(7), "doc_id", "text",
        col("dom") === "tgt", buckets = 16, selectPct = 25)
      .select("doc_id", "weight").as[(Long, Long)].collect().toMap
    assert(out.forall { case (id, t) => again(id) == t._3 })
  }

  test("clusterSplit: near-dup families land in exactly one split") {
    import graft.operators.Sampling
    val docs = Seq((1L, "aa"), (2L, "ab"), (3L, "ac"), (4L, "ad"))
      .toDF("doc_id", "text")
    // docs 1,2,3 are one cluster (rep 1); doc 4 is a singleton
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L))
      .toDF("id", "cluster_rep")
    val out = Sampling.clusterSplit(docs, "doc_id", labels, "id", "cluster_rep")
      .select("doc_id", "cluster_rep", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1L, 1L, 1L, 4L))
    // whole cluster shares one split; split of the rep id decides it
    assert(out.take(3).map(_._3).distinct.length == 1)
    assert(Set("train", "val", "test").contains(out(3)._3))
    // the split is the documented rep-hash rule (replayable)
    val h = graft.plans.HashExpressions.scrambleHash(
      1L, graft.plans.HashExpressions.PolyBase2) % 10
    val want = if (h < 8) "train" else if (h == 8) "val" else "test"
    assert(out.head._3 == want)
  }

  test("prioritySample: top-k by deterministic priority with HT threshold") {
    import graft.operators.Sampling
    import graft.plans.HashExpressions.{scrambleHash, PolyBase1, P2n31}
    val rows = Seq((1L, 100L), (2L, 10L), (3L, 1000L), (4L, 50L),
      (5L, 500L), (6L, 5L))
    val df = rows.toDF("id", "w")
    def pr(id: Long, w: Long): Double =
      w.toDouble * P2n31 / (scrambleHash(id, PolyBase1) + 1).toDouble
    val ranked = rows.map { case (i, w) => (i, w, pr(i, w)) }
      .sortBy(t => (-t._3, t._1))
    val k = 3
    val tau = ranked(k)._3 // the (k+1)-th priority
    val want = ranked.take(k)
      .map(t => (t._1, math.max(t._2.toDouble, tau))).sortBy(_._1)
    val got = Sampling.prioritySample(df, "id", "w", k)
      .select("id", "est_weight").as[(Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("preferencePairs: length-closest negative in-group, deterministic ties") {
    val docs = Seq(
      (1L, "en", 100L, true), (2L, "en", 130L, false), (3L, "en", 90L, false),
      // chosen 4 ties 50-diff to rejected 5 and 6 -> smaller id 5 wins
      (4L, "fr", 200L, true), (5L, "fr", 150L, false), (6L, "fr", 250L, false),
      // group with no negative: chosen 7 emits no pair
      (7L, "zh", 10L, true))
      .toDF("id", "lang", "len", "good")
    val out = graft.operators.Sampling
      .preferencePairs(docs, "id", "lang", "len", "good")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((3L, 100L, 90L, 10L)),
      4L -> ((5L, 200L, 150L, 50L))))
  }

  test("neymanAllocation: quotas ∝ N_h·σ_h, largest-remainder sums to budget") {
    val df = Seq(("a", 0L), ("a", 2L), ("b", 5L), ("b", 5L),
      ("c", 0L), ("c", 4L)).toDF("g", "v")
    val out = Sampling.neymanAllocation(df, "g", "v", 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // σ: a=1 (w 2), b=0 (w 0), c=2 (w 4); W=6 → quotas 10/3, 0, 20/3;
    // floors 3+0+6=9, the 1 leftover goes to c (largest fraction)
    assert(out("a") == ((2L, 1.0, 3.333333, 3L)))
    assert(out("b") == ((2L, 0.0, 0.0, 0L)))
    assert(out("c") == ((2L, 2.0, 6.666667, 7L)))
    assert(out.values.map(_._4).sum == 10L)
  }

  test("splitLeakageAudit: fold counts match a driver hash recompute") {
    val cl = (1L to 100L).map(i => (i, i % 10)).toDF("id", "rep")
    val out = Sampling.splitLeakageAudit(cl, "id", "rep")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val test = cl.withColumn("t", Sketches.keyHash(col("id")) % 10 >= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val exp = test.groupBy(_._2).map { case (rep, rows) =>
      val nTest = rows.count(_._3).toLong
      val nTrain = rows.size - nTest
      rep -> ((rows.size.toLong, nTrain, nTest, nTrain > 0 && nTest > 0))
    }
    assert(out == exp)
    assert(out.values.exists(_._4)) // the naive split leaks somewhere
  }

  test("bloomFprAudit: members always hit, sparse filter yields no FPs") {
    import spark.implicits._
    import graft.operators.Sketches
    val members = Seq(1L, 2L, 3L).toDF("k")
    // probing with a member must register as a (trivial) positive
    val hit = Sketches.bloomFprAudit(members, "k", Seq(1L).toDF("k"),
      "k", mBits = 1 << 20, kHashes = 3).head()
    assert(hit.getAs[Long]("n_false_pos") == 1L)
    assert(hit.getAs[Long]("bits_set") <= 9L)
    // 9 set bits in 2^20 → genuine non-members essentially never FP
    val miss = Sketches.bloomFprAudit(members, "k",
      (1000L to 1100L).toDF("k"), "k", mBits = 1 << 20, kHashes = 3)
      .head()
    assert(miss.getAs[Long]("n_false_pos") == 0L)
    assert(miss.getAs[Double]("fpr") == 0.0)
  }

  test("dhStratify: uniform histogram cuts into equal strata") {
    import spark.implicits._
    import graft.operators.Sampling
    // values 0..99 → 10 bins of 10 each (nBins=10); cum√f uniform →
    // 5 strata of 2 bins / 20 rows each, exact means
    val df = (0L until 100L).toDF("v")
    val out = Sampling.dhStratify(df, "v", nBins = 10, nStrata = 5)
      .orderBy("stratum").collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Long]("n_rows") == 20L))
    assert(out.forall(_.getAs[Long]("n_bins") == 2L))
    assert(out.head.getAs[Double]("mean_v") == 9.5) // mean of 0..19
    assert(out.last.getAs[Double]("mean_v") == 89.5)
  }

  test("ipfRake: margins converge to uniform targets, structure preserved") {
    import spark.implicits._
    import graft.operators.Sampling
    val cells = Seq(("a", "x", 1L), ("a", "y", 3L), ("b", "x", 2L),
      ("b", "y", 2L)).toDF("src", "lng", "n")
    val out = Sampling.ipfRake(cells, "src", "lng", "n", iters = 6)
      .collect().map(r => (r.getAs[String]("src"), r.getAs[String]("lng"))
        -> r.getAs[Double]("weight")).toMap
    // N=8, 2 rows × 2 cols → every margin should approach 4
    val rowA = out(("a", "x")) + out(("a", "y"))
    val colX = out(("a", "x")) + out(("b", "x"))
    assert(math.abs(rowA - 4.0) < 1e-3, s"row margin $rowA")
    assert(math.abs(colX - 4.0) < 1e-3, s"col margin $colX")
    assert(out.values.forall(_ > 0))
    // the dominant cell within a row stays dominant (interaction kept)
    assert(out(("a", "y")) > out(("a", "x")))
  }

  test("mixtureWaterfill: hand-solved boundary, sums to budget, all-saturated NULL") {
    import spark.implicits._
    import graft.operators.Sampling
    // r = avail/w: A=10, C=50, B=100; boundary at C: x* = (150-10)/3
    val dom = Seq(("A", 10L, 1L), ("B", 100L, 1L), ("C", 100L, 2L))
      .toDF("dom", "avail", "w")
    val out = Sampling.mixtureWaterfill(dom, "dom", "avail", "w", 150L)
      .collect().map(r => r.getAs[String]("dom") -> r).toMap
    val x = 140.0 / 3
    assert(out("A").getAs[Boolean]("saturated"))
    assert(!out("B").getAs[Boolean]("saturated"))
    assert(out("A").getAs[Double]("alloc") == 10.0)
    assert(math.abs(out("B").getAs[Double]("alloc") - x) < 1e-9)
    assert(math.abs(out("C").getAs[Double]("alloc") - 2 * x) < 1e-9)
    assert(math.abs(out.values.map(_.getAs[Double]("alloc")).sum - 150.0)
      < 1e-9)
    // budget over total availability: everything saturates, x* NULL
    val all = Sampling.mixtureWaterfill(dom, "dom", "avail", "w", 500L)
      .collect()
    assert(all.forall(_.getAs[Boolean]("saturated")))
    assert(all.forall(r => r.isNullAt(r.fieldIndex("x_star"))))
    assert(all.map(_.getAs[Double]("alloc")).sum == 210.0)
  }

  test("coherentSampleAudit: sample-join keys are exactly the kept keys' pairs") {
    import spark.implicits._
    val left = (1L to 200L).toDF("k")
    // right: every key appears 3× — join rows per kept key = 3
    val right = (1L to 200L).flatMap(k => Seq(k, k, k)).toDF("k")
    val r = Sampling.coherentSampleAudit(left, "k", right, "k",
      modulus = 10, keep = 2).head()
    val nl = r.getAs[Long]("n_left")
    // coherence: every kept left key brings exactly its 3 right rows
    assert(r.getAs[Long]("n_right") == nl * 3)
    assert(r.getAs[Long]("n_joined") == nl * 3)
    assert(r.getAs[Long]("n_full") == 600L)
    // HT estimate = joined·5; rel_err consistent with it
    assert(r.getAs[Double]("ht_estimate") == nl * 3.0 * 5)
  }

  test("aqpAudit: full-population sample reproduces truth with zero error") {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("g", i, i * 10L)).toDF("g", "k", "v")
    // keep 9 of 10 hash buckets: a large sample whose CI must cover
    val r = Sampling.aqpAudit(df, "g", "k", "v", modulus = 10, keep = 9)
      .head()
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("n_sample") > 50L)
    assert(r.getAs[Boolean]("covered"))
    assert(r.getAs[Double]("true_mean") == 505.0)
  }

  test("greedySetCover: picks by marginal gain, stops when covered, ties asc") {
    val members = Seq(("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "c"), ("s2", "d"), ("s3", "d"), ("s3", "e"))
      .toDF("set", "elem")
    val out = Sampling.greedySetCover(members, "set", "elem", rounds = 6)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // round 1: s1 (3 new); round 2: s3 beats s2 (2 new vs 1); then the
    // universe is covered and NO further rows appear despite rounds = 6
    assert(out.toSeq == Seq((1, "s1", 3L, 3L), (2, "s3", 2L, 5L)))
    // gain tie → lexicographically smaller set id
    val tie = Seq(("B", "x"), ("B", "y"), ("A", "x"), ("A", "y"))
      .toDF("set", "elem")
    val t = Sampling.greedySetCover(tie, "set", "elem", rounds = 2).head()
    assert(t.getString(1) == "A" && t.getDouble(4) == 1.0)
  }

  test("amsF2 / amsJoinSize: exact on collision-free grids; merge = concat-build") {
    import graft.operators.Sketches
    // 20 distinct keys, each appearing key-many times; width 1024 makes
    // collisions essentially impossible at this size, so the median-of-
    // rows estimate equals the exact F2 = sum f^2
    val freqs = (1L to 20L).flatMap(k => Seq.fill(k.toInt)(k)).toDF("k")
    val g = Sketches.amsCounters(freqs, "k", depth = 5, width = 1024)
    val f2 = Sketches.amsF2(g, depth = 5).head().getAs[Long]("f2_est")
    assert(f2 == (1L to 20L).map(k => k * k).sum)
    // join size: a has each key once, b has key-many copies ->
    // sum a_k*b_k = sum k = 210
    val a = (1L to 20L).toDF("k")
    val ga = Sketches.amsCounters(a, "k", depth = 5, width = 1024)
    val js = Sketches.amsJoinSize(ga, g, depth = 5).head()
      .getAs[Long]("join_size_est")
    assert(js == 210L)
    // mergeability: sketch(a ++ a) == merge(sketch(a), sketch(a))
    val merged = Sketches.amsMerge(ga.union(ga))
      .orderBy("d", "pos").collect().toSeq
    val direct = Sketches.amsCounters(a.union(a), "k", 5, 1024)
      .orderBy("d", "pos").collect().toSeq
    assert(merged == direct)
  }
}
