package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)),
    (4L, Seq(-1.0f, 0.0f)), (5L, Seq(0.7f, 0.7f))).toDF("vec_id", "embedding")

  test("topK orders by cosine distance with deterministic ties") {
    val out = Similarity.topK(corpus, "embedding", Seq(1.0f, 0.0f), 3, "COSINE", "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 5L))
  }

  test("filtered IVF probe (pre-filter) ≡ topK over the filtered probed cells") {
    // a metadata predicate composed BEFORE ivfSearch must rank exactly
    // the predicate-matching rows of the probed cells — the serving-time
    // "filtered query" contract (filter inside the cells, not post-k)
    val big = (0 until 60).map { i =>
      (i.toLong, (0 until 8).map(d => ((i * 13 + d * 7) % 17 - 8).toFloat / 8f),
        i % 3)
    }.toDF("vec_id", "embedding", "label")
    val cents = Seq(
      (0, Seq.fill(8)(1.0f)), (1, (0 until 8).map(d => if (d < 4) 1.0f else -1.0f)))
    val centDf = cents.toDF("cid", "cv")
    val assigned = Similarity.assignNearestCentroid(big, "embedding", "vec_id",
      centDf, "cid", "cv")
    val qv = (0 until 8).map(d => ((d * 7) % 17 - 8).toFloat / 8f)
    val got = Similarity.ivfSearch(assigned.filter($"label" === 1),
        "embedding", "vec_id", cents, qv, 5, 1)
      .select("vec_id", "distance").as[(Long, Double)].collect().toSeq
    val probeIds = Similarity.nearestCentroidIds(cents, qv, 1)
    val want = Similarity.topK(
        assigned.filter($"label" === 1 && $"centroid_id".isin(probeIds: _*)),
        "embedding", qv, 5, "COSINE", "vec_id")
      .select("vec_id", "distance").as[(Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
    // every hit satisfies the predicate
    val labels = big.filter($"vec_id".isin(got.map(_._1): _*))
      .select("label").as[Int].collect().toSet
    assert(labels == Set(1))
  }

  test("multiProbeSearch with a full probe set equals exact topK") {
    // nBits = 1 → probes = {code, code^1} = BOTH buckets, so the probe
    // filter drops nothing and the re-rank must equal brute-force topK
    val big = (0 until 60).map { i =>
      (i.toLong, (0 until 64).map(d => ((i * 13 + d * 7) % 17 - 8).toFloat / 8f))
    }.toDF("vec_id", "embedding")
    val qv = (0 until 64).map(d => ((d * 7) % 17 - 8).toFloat / 8f)
    val mp = Similarity.multiProbeSearch(big, "embedding", "vec_id", qv,
        dim = 64, nBits = 1, k = 5)
      .select("vec_id", "distance").as[(Long, Double)].collect().toSeq
    val ex = Similarity.topK(big, "embedding", qv, 5, "COSINE", "vec_id")
      .select("vec_id", "distance").as[(Long, Double)].collect().toSeq
    assert(mp == ex)
  }

  test("hyperplaneCode (driver) equals hyperplaneBucket (expression)") {
    val big = (0 until 40).map { i =>
      (i.toLong, (0 until 64).map(d => ((i * 31 + d * 11) % 23 - 11).toFloat / 11f))
    }.toDF("vec_id", "embedding")
    val fromExpr = big
      .select(col("vec_id"),
        Similarity.hyperplaneBucket("embedding", 64, 8).as("b"))
      .as[(Long, Long)].collect().toMap
    val vecs = big.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    vecs.foreach { case (id, v) =>
      assert(Similarity.hyperplaneCode(v, 64, 8) == fromExpr(id), s"id=$id")
    }
  }

  test("COSINE score normalization matches reference formula (1 - d/2 over d=1-cos)") {
    val out = Similarity.topK(corpus, "embedding", Seq(1.0f, 0.0f), 5, "COSINE", "vec_id")
      .select("vec_id", "score").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - 1.0) < 1e-12)       // identical vector
    assert(math.abs(out(3L) - 0.5) < 1e-12)       // orthogonal
    assert(math.abs(out(4L) - 0.0) < 1e-12)       // opposite
  }

  test("topK DOT strategy ranks by inner product descending") {
    val out = Similarity.topK(corpus, "embedding", Seq(1.0f, 0.0f), 3, "DOT", "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 5L)) // dots: 1.0, 0.9, 0.7
  }

  test("topK EUCLIDEAN strategy ranks by L2 distance ascending") {
    val out = Similarity.topK(corpus, "embedding", Seq(0.0f, 1.0f), 2, "EUCLIDEAN", "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(3L, 5L)) // exact match first, then (0.7, 0.7)
  }

  test("vector function identities") {
    val df = Seq((Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      dotProduct(col("a"), col("b")), l2Norm(col("a")),
      cosineSimilarity(col("a"), col("b")), l2Distance(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 25.0)
    assert(r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getDouble(3) == 0.0)
  }

  test("zero-norm vectors get similarity 0, not NaN") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    assert(df.select(cosineSimilarity(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("l2Normalize yields unit vectors; zero vector passes through") {
    val df = Seq((Seq(3.0f, 4.0f), Seq(0.0f, 0.0f))).toDF("a", "z")
    val r = df.select(l2Normalize(col("a")), l2Normalize(col("z"))).head()
    assert(r.getSeq[Double](0) == Seq(0.6, 0.8))
    assert(r.getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("multiStoreSearch: threshold, dedup keep-max, global top-k (vs_retriever flow)") {
    val s1 = Seq(("a", "doc one", 0.9), ("b", "doc two", 0.7)).toDF("id", "text", "score")
    val s2 = Seq(("c", "doc one", 0.95), ("d", "doc three", 0.4)).toDF("id", "text", "score")
    val out = Similarity.multiStoreSearch(Seq("s1" -> s1, "s2" -> s2), 0.65, 8)
      .select("id", "text", "score", "searched_table")
      .as[(String, String, Double, String)].collect().toSeq
    // doc three filtered (0.4 < 0.65); "doc one" deduped keeping 0.95 from s2
    assert(out.map(_._1) == Seq("c", "b"))
    assert(out.head._4 == "s2")
  }

  test("MMR with λ=1 reduces to pure relevance top-k") {
    val mmr = Similarity.mmr(corpus, "embedding", "vec_id", Seq(1.0f, 0.0f), 3, 5, 1.0)
    assert(mmr.map(_._1) == Seq(1L, 2L, 5L))
  }

  test("MMR with diversity-heavy λ avoids the near-duplicate second pick") {
    // λ=0.3 after picking 1: near-duplicate 2 scores 0.3·0.994 − 0.7·0.994 ≈ −0.40;
    // the anti-correlated vector 4 scores 0.3·(−1) − 0.7·(−1) = +0.4 → most
    // diverse pick wins (standard MMR with signed cosine).
    val mmr = Similarity.mmr(corpus, "embedding", "vec_id", Seq(1.0f, 0.0f), 2, 5, 0.3)
    assert(mmr.head._1 == 1L)
    assert(mmr(1)._1 == 4L)
  }

  test("PQ: codes pick the nearest subspace centroid; ADC equals the " +
       "distance to the reconstructed vector") {
    import graft.operators.Quantization
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(0.5, 0.5), Array(-0.5, -0.5)))
    val df = Seq(
      (1L, Seq(0.9f, 0.1f, 0.4f, 0.6f)),
      (2L, Seq(0.1f, 0.9f, -0.4f, -0.6f))).toDF("vec_id", "embedding")
    val enc = Quantization.pqEncode(df, "embedding", cb)
    val codes = enc.select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L) == Seq(0, 0) && codes(2L) == Seq(1, 1))
    val q = Seq(1.0f, 0.0f, 0.5f, 0.5f)
    val hits = Quantization.pqSearch(enc, "vec_id", q, cb, 2)
      .select("vec_id", "adc_dist").as[(Long, Double)].collect().toMap
    // definitional identity: ADC = Σ_s ||q_s − centroid(code_s)||², the
    // distance to the row's RECONSTRUCTED vector — bit-exact (same folds)
    val t = Quantization.adcTable(q, cb)
    assert(hits(1L) == t(0)(0) + t(1)(0))
    assert(hits(2L) == t(0)(1) + t(1)(1))
  }

  test("binary quantization: expr pack ≡ driver pack incl. the sign bit; " +
       "full-shortlist bqSearch ≡ exact top-k") {
    import graft.operators.Quantization
    // 64-dim vectors exercising bit 63 (a positive last component makes
    // the packed long NEGATIVE)
    val v1 = (0 until 64).map(i => if (i % 3 == 0) 1.0f else -1.0f)
    val v2 = (0 until 64).map(i => if (i < 32) 1.0f else -0.5f)
    val v3 = (0 until 64).map(_ => 1.0f)
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("vec_id", "embedding")
    val packed = Quantization.binaryQuantize(df, "embedding", 64)
      .select("vec_id", "bq").as[(Long, Long)].collect().toMap
    for ((id, v) <- Seq(1L -> v1, 2L -> v2, 3L -> v3)) {
      assert(packed(id) == Quantization.bqPack(v), s"vec $id")
    }
    assert(packed(1L) < 0L && packed(3L) == -1L, "bit 63 set → negative long")
    // shortlist = corpus size makes the Hamming stage a no-op filter, so
    // the re-rank must equal the exact cosine top-k
    val exact = Similarity.topK(df, "embedding", v2, 3, "COSINE", "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    val bq = Quantization.bqSearch(df, "vec_id", "embedding", v2,
        k = 3, shortlistK = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(bq == exact)
  }

  test("truncated rerank: full shortlist ≡ exact top-k; shortlist bounds output") {
    val q = Seq(1.0f, 0.0f)
    val exact = Similarity.topK(corpus, "embedding", q, 3, "COSINE", "vec_id")
      .select("vec_id").as[Long].collect().toSeq
    // a corpus-wide shortlist makes stage 2 exact even with a 1-dim coarse
    val full = Similarity.truncatedRerank(corpus, "embedding", "vec_id", q,
        k = 3, dPrime = 1, shortlistK = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact)
    // a 1-row shortlist caps the result regardless of k
    val narrow = Similarity.truncatedRerank(corpus, "embedding", "vec_id", q,
      k = 3, dPrime = 2, shortlistK = 1)
    assert(narrow.count() == 1)
  }

  test("distributed MMR: λ=1 ≡ top-k; selection and scores match driver MMR") {
    val q = Seq(1.0f, 0.0f)
    // λ=1: pure relevance — identical ids to topK
    val rel = Similarity.mmrDistributed(corpus, "embedding", "vec_id", q, 3, 5, 1.0)
    assert(rel.map(_._1) == Seq(1L, 2L, 5L))
    // diversity-heavy λ: same greedy picks as the driver path, scores
    // equal to the last ulp (associativity of the cosine denominator)
    for (lam <- Seq(0.3, 0.5, 0.7)) {
      val drv = Similarity.mmr(corpus, "embedding", "vec_id", q, 3, 5, lam)
      val dst = Similarity.mmrDistributed(corpus, "embedding", "vec_id", q, 3, 5, lam)
      assert(dst.map(_._1) == drv.map(_._1), s"selection diverged at λ=$lam")
      dst.zip(drv).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-12, s"score diverged at λ=$lam: $a vs $b")
      }
    }
    // k beyond the candidate pool: stops at the pool, no infinite loop
    val all = Similarity.mmrDistributed(corpus, "embedding", "vec_id", q, 10, 5, 0.5)
    assert(all.size == 5)
  }

  test("batch top-k ranks per query") {
    val qs = Seq((100L, Seq(1.0f, 0.0f)), (200L, Seq(0.0f, 1.0f))).toDF("qid", "qv")
    val out = Similarity.topKBatch(corpus, "embedding", "vec_id", qs, "qv", "qid", 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 1L), (200L, 3L)))
  }

  test("graph beam search on a complete graph with full beam ≡ exact top-k") {
    // complete graph: one centroid bucket, k = n-1 neighbors each
    val assigned = corpus.withColumn("centroid_id", lit(0))
    val complete = Similarity.knnGraph(assigned, "embedding", "vec_id", 4)
    val got = Similarity.graphBeamSearch(complete, corpus, "embedding",
        "vec_id", queryId = 1L, entryIds = Seq(3L), beam = 5, iters = 1, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    // query vec 1 itself ranks first (distance 0), then 2, then 5 — the
    // same order as exact topK for (1,0)
    assert(got == Seq(1L, 2L, 5L))
  }

  test("graph beam search: beam keeps the `beam` nearest with id ties, " +
    "and a second iteration can only improve the best distance") {
    val assigned = corpus.withColumn("centroid_id", lit(0))
    val complete = Similarity.knnGraph(assigned, "embedding", "vec_id", 2)
    def best(iters: Int): Double =
      Similarity.graphBeamSearch(complete, corpus, "embedding", "vec_id",
          queryId = 1L, entryIds = Seq(4L), beam = 2, iters = iters, k = 1)
        .select("distance").as[Double].head()
    assert(best(2) <= best(1) + 1e-15)
    val out = Similarity.graphBeamSearch(complete, corpus, "embedding",
        "vec_id", queryId = 1L, entryIds = Seq(4L), beam = 2, iters = 2, k = 5)
      .collect()
    assert(out.length == 2) // k capped by beam size
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2))
  }

  test("marginMining matches a brute-force reference on a small set") {
    def cosDist(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def vec(i: Long): Array[Float] =
      Array((i % 5 + 1).toFloat, (i % 3 + 1).toFloat, (i % 7 + 1).toFloat, 1f)
    val srcIds = (0L to 10L by 2).toSeq
    val tgtIds = (1L to 13L by 2).toSeq
    val k = 3
    val src = srcIds.map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val tgt = tgtIds.map(i => (i, vec(i))).toDF("vec_id", "embedding")
    // reference: forward/backward top-k by (distance, id), ratio margin
    def topk(qs: Seq[Long], cs: Seq[Long]) = qs.map { q =>
      q -> cs.map(c => (cosDist(vec(q), vec(c)), c)).sorted.take(k)
    }.toMap
    val fwd = topk(srcIds, tgtIds)
    val cands = fwd.values.flatten.map(_._2).toSeq.distinct
    val bwd = topk(cands, srcIds)
    val expected = srcIds.flatMap { s =>
      val fs = fwd(s).map(p => BigDecimal(1.0 - p._1).setScale(12,
        BigDecimal.RoundingMode.HALF_UP)).sum
      val best = fwd(s).map { case (d, t) =>
        val bs = bwd(t).map(p => BigDecimal(1.0 - p._1).setScale(12,
          BigDecimal.RoundingMode.HALF_UP)).sum
        val m = (2.0 * k * (1.0 - d)) / (fs + bs).toDouble
        (t, 1.0 - d, m)
      }.maxBy { case (t, _, m) => (m, -t) }
      if (best._3 > 1.0) Some((s, best._1, best._2, best._3)) else None
    }
    val got = Similarity.marginMining(src, "vec_id", tgt, "vec_id",
        "embedding", k, minMargin = 1.0)
      .select("src_id", "tgt_id", "cosine", "margin")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(g => (g._1, g._2)) == expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-12 && math.abs(g._4 - e._4) < 1e-12)
    }
  }

  test("maxSimSearch matches a driver-side MaxSim reference; slices=1 is plain dot") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs.head._2
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def maxsim(v: Seq[Float], slices: Int): Double = {
      val sub = 16 / slices
      (0 until slices).map { qs =>
        val qsl = q.slice(qs * sub, (qs + 1) * sub)
        (0 until slices).map(ds =>
          dot(v.slice(ds * sub, (ds + 1) * sub), qsl)).max
      }.sum
    }
    for (slices <- Seq(1, 4)) {
      val out = Similarity.maxSimSearch(df, "embedding", "vec_id", q,
          dim = 16, slices = slices, k = 5)
        .as[(Long, Double)].collect()
      val expect = vecs.map { case (id, v) => (id, maxsim(v, slices)) }
        .sortBy { case (id, s) => (-s, id) }.take(5)
      assert(out.toSeq == expect.toSeq, s"slices=$slices")
    }
    // slices=1 degenerates to the plain full-vector dot product
    val full = Similarity.maxSimSearch(df, "embedding", "vec_id", q, 16, 1, 1)
      .as[(Long, Double)].head()
    assert(full._2 == vecs.map(v => dot(v._2, q)).max)
  }

  test("jlDistortionPairs: exact fold replay, zero-distance guard") {
    val va = Array(1.0f, 2.0f, -1.0f, 0.5f)
    val vb = Array(0.0f, 1.5f, 2.0f, -0.5f)
    val df = Seq((1L, va.toSeq), (2L, vb.toSeq), (3L, va.toSeq))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Quantization
      .jlDistortionPairs(df, "vec_id", "embedding", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val planes = Similarity.hyperplanePlanes(4, 2)
    def proj(v: Array[Float]) = planes.map(p =>
      p.indices.foldLeft(0.0)((a, i) => a + v(i).toDouble * p(i)))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dTrue = r6(math.sqrt(va.indices.foldLeft(0.0)((a, i) =>
      a + (va(i).toDouble - vb(i)) * (va(i).toDouble - vb(i)))))
    val (pa, pb) = (proj(va), proj(vb))
    val dProj = r6(math.sqrt(
      pa.indices.foldLeft(0.0)((a, j) =>
        a + (pa(j) - pb(j)) * (pa(j) - pb(j))) / 2))
    val p12 = out((1L, 2L))
    assert(p12.getDouble(2) == dTrue && p12.getDouble(3) == dProj)
    assert(p12.getDouble(4) == r6(dProj / dTrue))
    // identical vectors: both distances 0, ratio NULL (not a 0/0)
    val p13 = out((1L, 3L))
    assert(p13.getDouble(2) == 0.0 && p13.getDouble(3) == 0.0)
    assert(p13.isNullAt(4))
  }

  test("intrinsicDimension: ln(r2/r1) fold, duplicates and singletons drop") {
    val g = Seq(
      (1L, 1, 0.1), (1L, 2, 0.2),  // contributes ln 2
      (2L, 1, 0.2), (2L, 2, 0.2),  // ln 1 = 0
      (3L, 1, 0.0), (3L, 2, 0.3),  // r1 = 0 → excluded
      (4L, 1, 0.5))                // no second neighbor → excluded
      .toDF("id", "rank", "distance")
    val r = graft.operators.Similarity
      .intrinsicDimension(g, "id", "rank", "distance").head()
    def d18(x: Double) =
      BigDecimal(x).setScale(18, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sl = (d18(math.log(0.2 / 0.1)) + d18(math.log(0.2 / 0.2))).toDouble
    assert(r.getAs[Long]("n_points") == 2L)
    assert(r.getAs[Double]("sum_log") == r6(sl))
    assert(r.getAs[Double]("id_est") == r6(2.0 / sl))
  }
}
