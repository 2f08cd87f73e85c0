package graft

import org.apache.spark.sql.functions._
import graft.operators.{DataLayout, Evaluation, GraphAnalytics, NgramLm}
import graft.plans.HashExpressions.{scrambleHash, PolyBase1}

class NgramLmAndEvalSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLmScore: integer-log2 surprisal against the corpus's own counts") {
    // corpus bigrams: "a b"×2, "b a"×1, "a c"×1; prefix counts: a·=3, b·=1
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = NgramLm.bigramLmScore(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "surprisal_bits", "max_surprisal")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc1: (a b): ilog2(3)-ilog2(2)=0 twice; (b a): ilog2(1)-ilog2(1)=0
    // doc2: (a c): ilog2(3)-ilog2(1)=1
    assert(out == Seq((1L, 3L, 0L, 0L), (2L, 1L, 1L, 1L)))
  }

  test("bigramLmScore: single-token and empty docs are excluded") {
    val df = Seq((1L, "x"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = NgramLm.bigramLmScore(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("bigramLmScoreAgainst: held-out scoring with OOV bigrams counted") {
    // train: "a b a b a c" → bigrams ab,ba,ab,ba,ac; c(ab)=2, c(ba)=2,
    // c(ac)=1; ctx a=3, b=2. val doc 100: "a b x" → ab (seen:
    // s = ilog2(3)-ilog2(2) = 1-1 = 0) and "b x" (OOV)
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val valDf = Seq((100L, "a b x"), (101L, "z z")).toDF("doc_id", "text")
    val out = graft.operators.NgramLm
      .bigramLmScoreAgainst(train, valDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val v = out(100L)
    assert(v.getLong(1) == 2 && v.getLong(2) == 1) // 2 bigrams, 1 oov
    assert(v.getLong(3) == 0 && v.getDouble(4) == 0.0)
    // doc 101: single bigram "z z", fully OOV → null bits_per_scored
    val z = out(101L)
    assert(z.getLong(1) == 1 && z.getLong(2) == 1 && z.isNullAt(4))
  }

  test("pmiCollocations: exact ratio and ordering") {
    // 3 docs, each "p q" plus filler so p,q occur only together
    val df = Seq.tabulate(5)(i => Tuple1(s"p q f$i g$i")).toDF("text")
    val out = NgramLm.pmiCollocations(df, "text", minCount = 5L, k = 5)
      .select("w1", "w2", "c_bg", "c1", "c2", "pmi_ratio")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // only "p q" reaches minCount=5; N=20 tokens, B=15 bigrams
    assert(out.map(t => (t._1, t._2, t._3)) == Seq(("p", "q", 5L)))
    val want = 5.0 * 20 / 15 * 20 / 5 / 5
    assert(out.head._6 == want)
  }

  test("aucByRankSum: hand-checked AUC with a tie") {
    val df = Seq((0.9, true), (0.8, false), (0.8, true), (0.3, false))
      .toDF("score", "label")
    val (np, nn, u2, auc) = Evaluation.aucByRankSum(df, "score", "label")
      .as[(Long, Long, Long, Double)].head()
    // pairs: 0.9 beats both negs, 0.8T ties 0.8F (½) and beats 0.3
    assert((np, nn, u2) == (2L, 2L, 7L))
    assert(auc == 0.875)
  }

  test("aucByRankSumBy: per-group equals global on one group; single-class NULL") {
    val df = Seq((0.9, true), (0.8, false), (0.7, true), (0.1, false))
      .map { case (s, l) => ("g", s, l) }.toDF("grp", "s", "l")
    val grouped = Evaluation.aucByRankSumBy(df, "grp", "s", "l").head()
    val global = Evaluation.aucByRankSum(df, "s", "l").head()
    assert(grouped.getLong(1) == global.getLong(0))
    assert(grouped.getLong(3) == global.getLong(2))
    assert(grouped.getDouble(4) == global.getDouble(3))
    // a stratum with only positives keeps its row with NULL auc
    val mixed = df.unionAll(
      Seq(("onlypos", 0.5, true), ("onlypos", 0.6, true))
        .toDF("grp", "s", "l"))
    val rows = Evaluation.aucByRankSumBy(mixed, "grp", "s", "l")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("onlypos").getLong(2) == 0 && rows("onlypos").isNullAt(4))
  }

  test("aucByRankSum: perfect separation gives 1.0") {
    val df = (1 to 10).map(i => (i.toDouble, i > 5)).toDF("score", "label")
    assert(Evaluation.aucByRankSum(df, "score", "label")
      .select("auc").as[Double].head() == 1.0)
  }

  test("calibrationBins: fixed edges, clamped extremes") {
    val df = Seq((-0.5, false), (-0.06, false), (0.04, true), (0.5, true))
      .toDF("margin", "label")
    val out = Evaluation.calibrationBins(df, "margin", "label", 10)
      .orderBy("bin").select("bin", "n", "n_pos")
      .as[(Int, Long, Long)].collect().toSeq
    // -0.5→bin0, -0.06→floor(4.4)=4, 0.04→floor(5.4)=5, 0.5→floor(10)→clamp 9
    assert(out == Seq((0, 1L, 0L), (4, 1L, 0L), (5, 1L, 1L), (9, 1L, 1L)))
  }

  test("tokenEntropy: integer-log2 entropy, constant doc scores zero") {
    val df = Seq((1L, "x x x x"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = NgramLm.tokenEntropy(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_distinct", "entropy_bits")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc1: 4·ilog2(4) − 4·ilog2(4) = 0; doc2: 4·2 − 4·0 = 8
    assert(out == Seq((1L, 4L, 1L, 0L), (2L, 4L, 4L, 8L)))
  }

  test("zipfOctaves: terms bucket by log2 of corpus frequency") {
    // freq: "a"×4 (octave 2), "b"×2, "c"×2 (octave 1), "d"×1 (octave 0)
    val df = Seq(Tuple1("a a b c d"), Tuple1("a a b c")).toDF("text")
    val out = NgramLm.zipfOctaves(df, "text")
      .orderBy("octave")
      .select("octave", "n_terms", "n_occurrences")
      .as[(Int, Long, Long)].collect().toSeq
    assert(out == Seq((0, 1L, 1L), (1, 2L, 4L), (2, 1L, 4L)))
  }

  test("rendezvousShard matches the scalar argmax and moves only to the new shard") {
    val keys = (0L until 500L).map(Tuple1(_)).toDF("id")
    val out = keys
      .withColumn("s16", DataLayout.rendezvousShard(col("id"), 16))
      .withColumn("s17", DataLayout.rendezvousShard(col("id"), 17))
      .as[(Long, Int, Int)].collect().toSeq
    def hrw(k: Long, n: Int): Int =
      (0 until n).map(s => (scrambleHash(k * 131L + s, PolyBase1), -s))
        .max match { case (_, ns) => -ns }
    out.foreach { case (k, s16, s17) =>
      assert(s16 == hrw(k, 16) && s17 == hrw(k, 17))
      if (s16 != s17) assert(s17 == 16) // HRW: movers go only to the added shard
    }
    val movedFrac = out.count(t => t._2 != t._3).toDouble / out.size
    assert(movedFrac > 0.01 && movedFrac < 0.15, s"moved $movedFrac")
  }

  test("triangleStats: triangle plus pendant, direction-insensitive") {
    // undirected triangle {1,2,3} + pendant 4; fed with duplicate reversed edges
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val (nodes, es, wedges, tris, trans) =
      GraphAnalytics.triangleStats(edges, "src", "dst")
        .as[(Long, Long, Long, Long, Double)].head()
    // degrees 2,2,3,1 → wedges 1+1+3+0 = 5
    assert((nodes, es, wedges, tris) == (4L, 4L, 5L, 1L))
    assert(trans == 3.0 / 5)
  }

  test("chi2TopTerms: perfect discriminator scores N, universal term scores 0") {
    val docs = Seq((1L, "pos the aa", true), (2L, "pos the bb", true),
      (3L, "neg the aa", false), (4L, "neg the cc", false))
      .toDF("doc_id", "text", "lab")
    val out = graft.operators.Evaluation
      .chi2TopTerms(docs, "doc_id", "text", "lab", topK = 10)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // "pos": a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4 = N
    assert(out("pos") == (("pos", 2L, 0L, 4.0)))
    assert(out("neg") == (("neg", 0L, 2L, 4.0)))
    // "the" in every doc: zero denominator -> defined 0, not NULL/NaN
    assert(out("the") == (("the", 2L, 2L, 0.0)))
    // "aa" in one of each class: independent -> chi2 = 0
    assert(out("aa")._4 == 0.0)
  }

  test("clusterAgreement: hand-computed ARI and purity; perfect match gives 1") {
    // clusters {A:[x,x,y], B:[y,y]}: sum_ij=2, a=(3,2)->sum_a=4,
    // b=(x:2,y:3)->sum_b=4, purity=4/5, C(5,2)=10, exp=1.6,
    // ARI = (2-1.6)/(4-1.6) = 1/6
    val df = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "y"), ("B", "y"))
      .toDF("c", "l")
    val r = graft.operators.Evaluation.clusterAgreement(df, "c", "l")
      .collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 2 && r.getLong(2) == 2)
    assert(r.getLong(3) == 2 && r.getLong(4) == 4 && r.getLong(5) == 4)
    assert(r.getLong(6) == 4 && r.getDouble(7) == 0.8)
    assert(math.abs(r.getDouble(8) - 0.4 / 2.4) < 1e-15)
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("c", "l")
    assert(graft.operators.Evaluation.clusterAgreement(perfect, "c", "l")
      .collect().head.getDouble(8) == 1.0)
  }

  test("sourceAblationAuc equals a direct AUC recomputation without each source") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map { i =>
      val src = s"s${i % 4}"
      val label = rnd.nextBoolean()
      // label-correlated score with ties and per-source shift
      val score = (if (label) 2 else 0) + rnd.nextInt(4) + (i % 4) * 0.5
      (i.toLong, src, score, label)
    }
    val df = rows.toDF("id", "src", "score", "lab")
    val out = graft.operators.Evaluation
      .sourceAblationAuc(df, "src", "score", "lab")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))).toMap
    for (s <- Seq("s0", "s1", "s2", "s3")) {
      val direct = graft.operators.Evaluation
        .aucByRankSum(df.filter(col("src") =!= s), "score", "lab")
        .collect().head
      val (np, nn, u2, auc) = out(s)
      assert(np == direct.getLong(0), s"n_pos $s")
      assert(nn == direct.getLong(1), s"n_neg $s")
      assert(u2 == direct.getLong(2), s"u2 $s")
      assert(auc == direct.getDouble(3), s"auc $s")
    }
  }

  test("rankAgreement: identical lists tau=1, reversed tau=-1, partial overlap") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3), (4L, 4)).toDF("id", "rank")
    val same = graft.operators.Evaluation.rankAgreement(a, a, "id", "rank", 4)
      .collect().head
    assert(same.getLong(0) == 4 && same.getDouble(1) == 1.0)
    assert(same.getDouble(4) == 1.0)
    val rev = Seq((1L, 4), (2L, 3), (3L, 2), (4L, 1)).toDF("id", "rank")
    assert(graft.operators.Evaluation.rankAgreement(a, rev, "id", "rank", 4)
      .collect().head.getDouble(4) == -1.0)
    // b shares ids 2,3 with a; ranks agree in order -> tau = 1, overlap 0.5
    val b = Seq((2L, 1), (3L, 2), (9L, 3), (8L, 4)).toDF("id", "rank")
    val p = graft.operators.Evaluation.rankAgreement(a, b, "id", "rank", 4)
      .collect().head
    assert(p.getLong(0) == 2 && p.getDouble(1) == 0.5 && p.getDouble(4) == 1.0)
    // single common doc: no pairs -> NULL tau
    val c = Seq((1L, 1), (7L, 2)).toDF("id", "rank")
    assert(graft.operators.Evaluation.rankAgreement(a, c, "id", "rank", 4)
      .collect().head.isNullAt(4))
  }

  test("bradleyTerry: 2:1 duel record converges to 2/3 vs 1/3") {
    // A beats B twice, B beats A once → m_AB = 3, W = (2, 1). The MM map
    // fixes at s_A/s_B = 2 after one round; normalized 2/3 and 1/3.
    val pairs = Seq(("A", "B"), ("A", "B"), ("B", "A")).toDF("win", "lose")
    val out = graft.operators.Evaluation.bradleyTerry(pairs, "win", "lose", 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("A") == ((3L, 2L, 0.666667)))
    assert(out("B") == ((3L, 1L, 0.333333)))
  }

  test("bradleyTerry: a never-winning item fixes at strength 0") {
    val pairs = Seq(("A", "B"), ("A", "C"), ("C", "B")).toDF("win", "lose")
    val out = graft.operators.Evaluation.bradleyTerry(pairs, "win", "lose", 3)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("B") == 0.0)
    assert(out("A") > out("C") && out("C") > 0.0)
    assert(math.abs(out.values.sum - 1.0) < 1e-5)
  }

  test("labelNoiseScreen: outvoted node flagged; agreeing node clean; majority ties to smaller label") {
    // node 1 (label 0) has neighbors labeled 1,1,0 → 2/3 disagree,
    // majority 1 → flagged; node 2 (label 1) agrees with both neighbors
    val graph = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 10L), (2L, 2, 11L),
      (3L, 1, 10L), (3L, 2, 11L)).toDF("id", "rank", "nbr_id")
    val labels = Seq((1L, 0), (2L, 1), (3L, 9),
      (10L, 1), (11L, 1), (12L, 0)).toDF("vid", "lab")
    val out = graft.operators.Evaluation
      .labelNoiseScreen(graph, labels, "vid", "lab")
      .collect().map(r => r.getLong(0) -> r).toMap
    val n1 = out(1L)
    assert(n1.getAs[Long]("n_disagree") == 2L &&
      n1.getAs[Int]("nbr_majority") == 1 && n1.getAs[Boolean]("flagged"))
    val n2 = out(2L)
    assert(n2.getAs[Long]("n_disagree") == 0L &&
      !n2.getAs[Boolean]("flagged"))
    // node 3 (label 9): both neighbors carry label 1 → unanimous
    // disagreement, majority 1, flagged
    val n3 = out(3L)
    assert(n3.getAs[Double]("disagree_frac") == 1.0 &&
      n3.getAs[Boolean]("flagged"))
  }

  test("labelNoiseScreen: equal-vote majority breaks toward the smaller label") {
    val graph = Seq((1L, 1, 10L), (1L, 2, 11L)).toDF("id", "rank", "nbr_id")
    val labels = Seq((1L, 5), (10L, 7), (11L, 3)).toDF("vid", "lab")
    val r = graft.operators.Evaluation
      .labelNoiseScreen(graph, labels, "vid", "lab").head()
    assert(r.getAs[Int]("nbr_majority") == 3)
    assert(r.getAs[Double]("disagree_frac") == 1.0)
  }

  test("brierDecomposition: hand-computed Murphy terms, identity holds") {
    import spark.implicits._
    val df = Seq((0.1, false), (0.1, false), (0.9, true), (0.9, false))
      .toDF("p", "o")
    val r = graft.operators.Evaluation.brierDecomposition(df, "p", "o").head()
    // bin1: n 2, p̄ 0.1, ō 0; bin9: n 2, p̄ 0.9, ō 0.5; base rate 1/4
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 1L)
    assert(r.getAs[Double]("base_rate") == 0.25)
    assert(r.getAs[Double]("brier") == 0.21)
    assert(r.getAs[Double]("reliability") == 0.085)
    assert(r.getAs[Double]("resolution") == 0.0625)
    assert(r.getAs[Double]("uncertainty") == 0.1875)
    // Murphy identity (within-bin predictions constant → holds up to
    // the float error of re-adding the three rounded terms)
    assert(math.abs(r.getAs[Double]("reliability") -
      r.getAs[Double]("resolution") + r.getAs[Double]("uncertainty") -
      r.getAs[Double]("brier")) < 1e-12)
  }

  test("weightOfEvidence: smoothed shares, hand-computed WOE and IV") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = Seq((0.1, false), (0.1, false), (0.9, true), (0.9, false))
      .toDF("p", "o")
    val out = graft.operators.Evaluation.weightOfEvidence(df, "p", "o")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // bin1: pos 0 neg 2; bin9: pos 1 neg 1; totals tp 1 tn 3, 2 bins
    val (pp1, pn1) = (1.0 / 3, 3.0 / 5)
    val (pp9, pn9) = (2.0 / 3, 2.0 / 5)
    val iv = r6((pp1 - pn1) * math.log(pp1 / pn1) +
      (pp9 - pn9) * math.log(pp9 / pn9))
    assert(out(1L) == ((2L, 0L, r6(math.log(pp1 / pn1)), iv)))
    assert(out(9L) == ((2L, 1L, r6(math.log(pp9 / pn9)), iv)))
  }

  test("heapsLawFit: exact OLS on the cumulative checkpoints") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val r = graft.operators.NgramLm.heapsLawFit(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("n_points") == 3L)
    assert(r.getAs[Long]("n_total") == 8L && r.getAs[Long]("v_total") == 4L)
    // mirror: checkpoints (2,2) (4,3) (8,4), decimal-18 accumulated sums
    def d18(x: Double) = BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    val pts = Seq((2.0, 2.0), (4.0, 3.0), (8.0, 4.0))
      .map { case (n, v) => (math.log(n), math.log(v)) }
    val sx = pts.map(p => d18(p._1)).sum.toDouble
    val sy = pts.map(p => d18(p._2)).sum.toDouble
    val sxy = pts.map(p => d18(p._1 * p._2)).sum.toDouble
    val sxx = pts.map(p => d18(p._1 * p._1)).sum.toDouble
    val beta = (sxy - sx * sy / 3) / (sxx - sx * sx / 3)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("beta") == r6(beta))
    assert(r.getAs[Double]("ln_k") == r6((sy - beta * sx) / 3))
    // sublinear growth on natural-ish text
    assert(r.getAs[Double]("beta") > 0 && r.getAs[Double]("beta") < 1)
  }

  test("meanAveragePrecision: precision at hit ranks, zero-hit query stays") {
    import spark.implicits._
    val approx = Seq((1L, 1, "a"), (1L, 2, "c"), (1L, 3, "b"),
      (2L, 1, "e"), (2L, 2, "f")).toDF("qid", "rank", "doc")
    val exact = Seq((1L, "a"), (1L, "b"), (2L, "d")).toDF("qid", "doc")
    val out = graft.operators.Evaluation
      .meanAveragePrecision(approx, exact, "qid", "doc", "rank")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1: hits at ranks 1 and 3 → AP = (1/1 + 2/3)/2; q2: no hits → 0
    val ap1 = r6((1.0 + 2.0 / 3) / 2)
    assert(out(1L) == ((2L, 2L, ap1, r6(ap1 / 2))))
    assert(out(2L) == ((1L, 0L, 0.0, r6(ap1 / 2))))
  }

  test("isotonicFit: equals PAV pooling on a known violator sequence") {
    import spark.implicits._
    import graft.operators.Evaluation
    // rates 0.2, 0.6, 0.4, 0.8 with equal weight 10: bins 1,2 violate →
    // pool to (6+4)/20 = 0.5; result 0.2, 0.5, 0.5, 0.8 (sklearn PAV)
    val bins = Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L),
      (3L, 10L, 8L)).toDF("bin", "n", "n_pos")
    val out = Evaluation.isotonicFit(bins, "bin", "n", "n_pos")
      .select("bin", "iso").as[(Long, Double)].collect().toMap
    assert(out == Map(0L -> 0.2, 1L -> 0.5, 2L -> 0.5, 3L -> 0.8))
    // monotone non-decreasing by construction
    val sorted = out.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted)
  }

  test("pinballEval: hand-computed tau=0.9 loss on a fixed split") {
    import spark.implicits._
    import graft.operators.Stats
    // train (even ids): v = 10,20,...,100 → ceil(0.9·10)=9th smallest = 90
    // test (odd ids): v = 85 and 95 → losses 0.1·5 and 0.9·5 → mean 2.5
    val rows = (1 to 10).map(i => ("g", i.toLong * 2, i.toLong * 10)) ++
      Seq(("g", 1L, 85L), ("g", 3L, 95L))
    val out = Stats.pinballEval(rows.toDF("g", "id", "v"), "g", "id", "v")
      .head()
    assert(out.getAs[Long]("n_train") == 10L)
    assert(out.getAs[Long]("qhat") == 90L)
    assert(out.getAs[Long]("n_test") == 2L)
    assert(out.getAs[Double]("pinball") == 2.5)
  }

  test("knSmoothedBigrams: hand-computed interpolated KN on a toy corpus") {
    import spark.implicits._
    import graft.operators.NgramLm
    // corpus bigrams: "a b" ×2, "b a" ×1, "a c" ×1
    //   types = 3, n1 = 2 (b a, a c), n2 = 1 (a b) → D = 2/4 = 0.5
    //   ctx a: c_ctx = 3, n_follow = 2;  w2 b: n_prec = 1
    //   P_kn(b|a) = (2−0.5)/3 + 0.5·2/3 · 1/3 = 0.5 + 1/9
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = NgramLm.knSmoothedBigrams(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getAs[String]("ctx"), r.getAs[String]("w2")) ->
        r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("c_bg") == 2L)
    assert(ab.getAs[Long]("c_ctx") == 3L)
    assert(ab.getAs[Long]("n_follow") == 2L)
    assert(ab.getAs[Long]("n_prec") == 1L)
    assert(ab.getAs[Double]("discount") == 0.5)
    assert(math.abs(ab.getAs[Double]("p_kn") - (1.5 / 3 + 0.5 * 2 / 3.0 / 3)) < 1e-12)
    // probabilities out of a context sum to ≤ 1 (mass D·n_follow/c_ctx is
    // spread over the whole vocab, seen and unseen)
    val aMass = out.collect { case ((c, _), r) if c == "a" =>
      r.getAs[Double]("p_kn") }.sum
    assert(aMass > 0 && aMass < 1.0)
  }

  test("goodTuringCounts: Turing re-estimates on a fixed bigram profile") {
    import spark.implicits._
    import graft.operators.NgramLm
    // bigram counts: "a b"=3, "b c"=1, "c d"=1, "d e"=2  →
    //   N1=2, N2=1, N3=1; N = 7 total bigram tokens
    //   r=1: r* = 2·1/2 = 1.0; r=2: r* = 3·1/1 = 3.0; r=3: N4=0 → NULL
    val docs = Seq((1L, "a b c d e"), (2L, "a b"), (3L, "a b"),
      (4L, "d e")).toDF("doc_id", "text")
    val out = NgramLm.goodTuringCounts(docs, "doc_id", "text", maxR = 8)
      .collect().map(r => r.getAs[Long]("r") -> r).toMap
    assert(out(1L).getAs[Long]("n_r") == 2L)
    assert(out(1L).getAs[Double]("r_star") == 1.0)
    assert(out(2L).getAs[Double]("r_star") == 3.0)
    assert(out(3L).isNullAt(out(3L).fieldIndex("r_star")))
    assert(math.abs(out(1L).getAs[Double]("mass_r") - 2.0 / 7) < 1e-12)
  }

  test("bhFdr: textbook step-up — rejects through the largest passing rank") {
    import spark.implicits._
    import graft.operators.Evaluation
    // p = .01, .04, .03, .20 with q=1/4, m=4: sorted .01 .03 .04 .20 vs
    // thresholds .0625 .125 .1875 .25 → k*=3 (p=.04 ≤ .1875); the .20
    // hypothesis fails its own threshold .25? 20/100=.2 ≤ .25 → k*=4!
    // all four discovered (step-up takes the LARGEST passing rank)
    val df = Seq(("h1", 1L, 100L), ("h2", 4L, 100L), ("h3", 3L, 100L),
      ("h4", 20L, 100L)).toDF("id", "num", "den")
    val out = Evaluation.bhFdr(df, "id", "num", "den", 1L, 4L)
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(out.values.forall(_.getAs[Boolean]("is_discovery")))
    // raise the bar: q=1/20 → thresholds .0125 .025 .0375 .05;
    // only p=.01 passes rank 1; .03 > .025 at rank 2, .04 > .0375, .2 > .05
    val strict = Evaluation.bhFdr(df, "id", "num", "den", 1L, 20L)
      .collect().map(r => r.getAs[String]("id") ->
        r.getAs[Boolean]("is_discovery")).toMap
    assert(strict == Map("h1" -> true, "h2" -> false, "h3" -> false,
      "h4" -> false))
  }

  test("sigmoidCalibration: matches a hand-run gradient fold and improves fit") {
    import spark.implicits._
    import graft.operators.Evaluation
    // bins whose rate curve is a shifted steeper sigmoid than init (1,0)
    val bins = Seq((-0.35, 100L, 10L), (-0.15, 100L, 30L),
      (0.15, 100L, 75L), (0.35, 100L, 95L)).toDF("x", "n", "n_pos")
    val out = Evaluation.sigmoidCalibration(bins, "x", "n", "n_pos",
      iters = 12, step = 2.0).head()
    // replicate the fold exactly
    val data = Seq((-0.35, 100.0, 0.10), (-0.15, 100.0, 0.30),
      (0.15, 100.0, 0.75), (0.35, 100.0, 0.95))
    var (a, b) = (1.0, 0.0)
    for (_ <- 1 to 12) {
      var ga = BigDecimal(0); var gb = BigDecimal(0); var nn = 0.0
      data.foreach { case (x, n, pi) =>
        val z = a * x + b; val az = math.abs(z)
        val s = 0.5 + 0.5 * z / (1.0 + az)
        val ds = 0.5 / ((1.0 + az) * (1.0 + az))
        ga += BigDecimal(n * 2.0 * (s - pi) * ds * x)
          .setScale(18, BigDecimal.RoundingMode.HALF_UP)
        gb += BigDecimal(n * 2.0 * (s - pi) * ds)
          .setScale(18, BigDecimal.RoundingMode.HALF_UP)
        nn += n
      }
      val a2 = a - 2.0 * (ga.toDouble / 400)
      val b2 = b - 2.0 * (gb.toDouble / 400)
      a = a2; b = b2
    }
    assert(math.abs(out.getAs[Double]("a") - a) < 1e-8)
    assert(math.abs(out.getAs[Double]("b") - b) < 1e-8)
    assert(out.getAs[Double]("mse_after") < out.getAs[Double]("mse_before"))
  }

  test("zipfSlopeBySource: octave profile, slope sign, top share") {
    import spark.implicits._
    import graft.operators.NgramLm
    // srcA: "a"×8 "b"×2 "c"×2 "d e f g" (16 tokens) — octaves:
    // 3→1 type, 1→2, 0→4 → points (0,2),(1,1),(3,0): negative slope
    val docs = Seq(("A", ("a " * 8) + ("b " * 2) + ("c " * 2) + "d e f g"))
      .toDF("source", "text")
    val out = NgramLm.zipfSlopeBySource(docs, "source", "text").head()
    assert(out.getAs[Long]("n_tokens") == 16L)
    assert(out.getAs[Long]("n_types") == 7L)
    assert(out.getAs[Long]("n_octaves") == 3L)
    assert(out.getAs[Double]("slope") < 0)
    assert(out.getAs[Double]("top_share") == 0.5)
  }

  test("rankBiasedOverlap: identical lists give 1 - p^depth, disjoint give 0") {
    import spark.implicits._
    import graft.operators.Evaluation
    val l = (1 to 10).map(i => (i.toLong * 7, i)).toDF("id", "rank")
    val out = Evaluation.rankBiasedOverlap(l, l, "id", "rank", 10, 0.9)
      .head()
    assert(out.getAs[Long]("n_common") == 10L)
    // Σ_m c_m telescopes to Σ_d (1−p)p^{d−1} = 1 − p^10
    assert(math.abs(out.getAs[Double]("rbo_trunc") -
      (1 - math.pow(0.9, 10))) < 1e-9)
    assert(math.abs(out.getAs[Double]("rbo_max") - 1.0) < 1e-9)
    val other = (1 to 10).map(i => (i.toLong * 7 + 1, i)).toDF("id", "rank")
    val o2 = Evaluation.rankBiasedOverlap(l, other, "id", "rank", 10, 0.9)
      .head()
    assert(o2.getAs[Long]("n_common") == 0L)
    assert(o2.getAs[Double]("rbo_trunc") == 0.0)
  }

  test("expectedCalibrationError: hand-computed ECE and MCE") {
    import spark.implicits._
    import graft.operators.Evaluation
    // (0.1·10 floors to bin 1 — IEEE 0.1·10 is 1.0000000000000002)
    // bin1: p̄=.1 rate=.5 gap=.4 (n=2); bin7: gap=.3; bin9: gap=.1
    // ECE = (2·.4 + .3 + .1)/4 = .3; MCE = .4
    val scored = Seq((0.1, false), (0.1, true), (0.7, true), (0.9, true))
      .toDF("p", "y")
    val out = Evaluation.expectedCalibrationError(scored, "p", "y", 10)
      .collect().map(r => r.getAs[Int]("bin") -> r).toMap
    assert(out.keySet == Set(1, 7, 9))
    assert(out(1).getAs[Double]("gap") == 0.4)
    assert(out(7).getAs[Double]("gap") == 0.3)
    assert(out(1).getAs[Double]("ece") == 0.3)
    assert(out(1).getAs[Double]("mce") == 0.4)
    // perfectly calibrated bins → zero everywhere
    val perfect = Seq((0.5, true), (0.5, false)).toDF("p", "y")
    val p0 = Evaluation.expectedCalibrationError(perfect, "p", "y", 10)
      .head()
    assert(p0.getAs[Double]("ece") == 0.0 && p0.getAs[Double]("mce") == 0.0)
  }

  test("doublyRobustOpe: hand-computed DM/IPS/DR, unseen pair backs off") {
    import spark.implicits._
    import graft.operators.Evaluation
    // train: q(c,0)=15, q(c,1)=20 → π=1, K=2
    val train = Seq(("c", 0L, 10L), ("c", 0L, 20L), ("c", 1L, 40L),
      ("c", 1L, 0L)).toDF("ctx", "act", "r")
    // eval DR terms: 20+2(30−20)=40, 20, 20+2(10−20)=0, unseen act → 20
    val eval_ = Seq(("c", 1L, 30L), ("c", 0L, 50L), ("c", 1L, 10L),
      ("c", 2L, 99L)).toDF("ctx", "act", "r")
    val out = Evaluation.doublyRobustOpe(train, eval_, "ctx", "act", "r")
      .head()
    assert(out.getAs[Long]("pi") == 1L)
    assert(out.getAs[Long]("n_eval") == 4L)
    assert(out.getAs[Long]("n_matched") == 2L)
    assert(out.getAs[Double]("dm_value") == 20.0)
    assert(out.getAs[Double]("ips_value") == 20.0) // 2·(30+10)/4
    assert(out.getAs[Double]("dr_value") == 20.0)  // (40+20+0+20)/4
  }

  test("holtSmoothing: matches an explicit sequential fold") {
    import spark.implicits._
    import graft.operators.Stats
    val ys = Seq(3.0, 7.0, 2.0, 9.0)
    var l = 0.0; var b = 0.0; var sse = 0.0
    ys.zipWithIndex.foreach { case (y, i) =>
      if (i == 0) { l = y; b = 0.0 }
      else {
        val f = l + b; val l1 = 0.5 * y + 0.5 * f
        b = 0.25 * (l1 - l) + 0.75 * b; sse += (y - f) * (y - f); l = l1
      }
    }
    val df = ys.zipWithIndex.map { case (y, i) => ("g", i, y) }
      .toDF("g", "t", "y")
    val out = Stats.holtSmoothing(df, "g", "t", "y").head()
    assert(out.getAs[Long]("n_obs") == 4L)
    assert(out.getAs[Double]("level") == l)
    assert(out.getAs[Double]("trend") == b)
    assert(out.getAs[Double]("forecast_next") == l + b)
    assert(out.getAs[Double]("mse") == sse / 3)
  }

  test("burrowsDelta: identical-style sources score 0, outlier scores higher") {
    import spark.implicits._
    // a and b share a word distribution; c inverts it
    val docs = Seq(
      ("a", "x x x y"), ("a", "x y"),
      ("b", "x x x y"), ("b", "x y"),
      ("c", "y y y x"), ("c", "y x"))
      .toDF("source", "text")
    val out = NgramLm.burrowsDelta(docs, "source", "text",
        topK = 2, topPairs = 3)
      .collect().map(r => (r.getString(1), r.getString(2)) ->
        r.getAs[Double]("delta")).toMap
    assert(out(("a", "b")) == 0.0)
    assert(out(("a", "c")) > 0.0 && out(("b", "c")) > 0.0)
    assert(out(("a", "c")) == out(("b", "c"))) // symmetry via identity
  }

  test("jensenShannon: 0 for identical mixes, ln 2 for disjoint vocabularies") {
    import spark.implicits._
    val docs = Seq(("a", "x x y"), ("b", "x x y"), ("c", "z w z"))
      .toDF("source", "text")
    val out = NgramLm.jensenShannonBySource(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Double]("jsd")).toMap
    assert(out(("a", "b")) == 0.0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("a", "c")) == ln2 && out(("b", "c")) == ln2)
  }

  test("jensenShannonCounts: tokenizer-free twin agrees on the same extremes") {
    import spark.implicits._
    // identical cell distributions → 0; disjoint cells → ln 2
    val cells = Seq((1, 10, 2L), (1, 11, 1L), (2, 10, 4L), (2, 11, 2L),
      (3, 20, 3L)).toDF("grp", "cell", "n")
    val out = NgramLm.jensenShannonCounts(cells, "grp", "cell", "n")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        r.getAs[Double]("jsd")).toMap
    assert(out((1, 2)) == 0.0)
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1, 3)) == ln2 && out((2, 3)) == ln2)
  }

  test("aucBootstrap: point replica matches exact AUC; replicas bounded") {
    import spark.implicits._
    // perfectly separable: scores 1..4 positive iff score >= 3
    val rows = Seq((1L, 1L, false), (2L, 2L, false), (3L, 3L, true),
      (4L, 4L, true)).toDF("id", "s", "l")
    val out = graft.operators.Evaluation
      .aucBootstrap(rows, "id", "s", "l", reps = 8).collect()
    val point = out.find(_.getInt(0) == -1).get
    assert(point.getAs[Long]("w_pos") == 2L &&
      point.getAs[Long]("w_neg") == 2L)
    assert(point.getAs[Double]("auc") == 1.0)
    // every replica of a separable problem is still 1.0 (or NULL when
    // a class resamples to zero mass)
    out.filter(_.getInt(0) >= 0).foreach { r =>
      if (!r.isNullAt(r.fieldIndex("auc")))
        assert(r.getAs[Double]("auc") == 1.0)
    }
    assert(out.length == 9)
  }

  test("clusterPairMetrics: hand-counted pair table; perfect = ARI 1") {
    // truth {a,b | c,d}, pred {a,b,c | d}: pairs ab=TP, ac/bc=FP,
    // cd=FN, ad/bd=TN
    val assign = Seq(("a", "X", 1), ("b", "X", 1), ("c", "X", 2),
      ("d", "Y", 2)).toDF("item", "pred", "truth")
    val r = Evaluation.clusterPairMetrics(assign, "pred", "truth").head()
    assert(r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Long]("tp") == 1L && r.getAs[Long]("fp") == 2L &&
      r.getAs[Long]("fn") == 1L && r.getAs[Long]("tn") == 2L)
    assert(r.getAs[Double]("precision") == 1.0 / 3)
    assert(r.getAs[Double]("recall") == 0.5)
    assert(r.getAs[Double]("f1") == 0.4)
    assert(r.getAs[Double]("rand_index") == 0.5)
    // this configuration is exactly chance level: ARI = 0
    assert(r.getAs[Double]("ari") == 0.0)
    // pred == truth: everything perfect
    val same = Seq(("a", 1, 1), ("b", 1, 1), ("c", 2, 2)).toDF("i", "pred", "truth")
    val p = Evaluation.clusterPairMetrics(same, "pred", "truth").head()
    assert(p.getAs[Double]("f1") == 1.0 && p.getAs[Double]("ari") == 1.0)
  }

  test("chao1Richness: hand singleton/doubleton values; saturated corpus covers") {
    val df = Seq("a a b").toDF("text")
    val r = graft.operators.NgramLm.chao1Richness(df, "text").head()
    assert(r.getAs[Long]("n_tokens") == 3L && r.getAs[Long]("n_types") == 2L)
    assert(r.getAs[Long]("f1") == 1L && r.getAs[Long]("f2") == 1L)
    // bias-corrected chao1 = D + f1(f1-1)/(2(f2+1)) = 2 + 0 = 2
    assert(r.getAs[Double]("chao1") == 2.0)
    assert(r.getAs[Double]("coverage") == BigDecimal(1.0 - 1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // no singletons -> full coverage, chao1 = observed types
    val sat = Seq("a a b b").toDF("text")
    val rs = graft.operators.NgramLm.chao1Richness(sat, "text").head()
    assert(rs.getAs[Double]("chao1") == 2.0 && rs.getAs[Double]("coverage") == 1.0)
  }

  test("vocabularyGrowth: types accumulate at first-seen doc, curve monotone") {
    val df = Seq((0L, "x"), (1L, "x y"), (2L, "z")).toDF("doc_id", "text")
    val out = graft.operators.NgramLm.vocabularyGrowth(df, "doc_id", "text",
        Seq(1L, 2L, 3L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
