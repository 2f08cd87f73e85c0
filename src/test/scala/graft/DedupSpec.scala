package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps first occurrence (reference vector_store.py:112-118)") {
    val df = Seq((3L, "dup"), (1L, "dup"), (2L, "uniq")).toDF("id", "text")
    val out = Dedup.exactDedup(df, "text", "id").select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("keep-max dedup keeps highest score, ties → lowest id (vs_retriever.py:140-148)") {
    val df = Seq((1L, "a", 0.5), (2L, "a", 0.9), (3L, "a", 0.9), (4L, "b", 0.1))
      .toDF("id", "text", "score")
    val out = Dedup.dedupKeepMax(df, "text", "score", "id")
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 4L))
  }

  test("crossSourceOverlap counts distinct shared texts per canonical pair") {
    val df = Seq(
      ("hello", "a"), ("hello", "b"), ("hello", "b"), // dup within b: once
      ("world", "a"), ("world", "c"),
      ("only-a", "a")).toDF("text", "source")
    val out = graft.operators.Dedup.crossSourceOverlap(df, "text", "source")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("a", "b", 1L), ("a", "c", 1L)))
  }

  test("minhash LSH finds near-duplicates, not unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog repeatedly every single day"
    val near = base + " now"
    val far = "completely different content about spark catalyst optimizer internals"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
    val pairs = Dedup.minhashLshPairs(df, "id", "text", 5, 64, 8, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash est_jaccard ≈ 1 for identical docs") {
    val df = Seq((1L, "identical text content here"), (2L, "identical text content here"))
      .toDF("id", "text")
    val est = Dedup.minhashLshPairs(df, "id", "text", 5, 64, 8, 0.5)
      .select("est_jaccard").as[Double].head()
    assert(est == 1.0)
  }

  test("simhash: identical docs get hamming 0; near docs small hamming") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, base), (2L, base), (3L, base + " lambda")).toDF("id", "text")
    val pairs = Dedup.simhashPairs(df, "id", "text", 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    val map = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(map((1L, 2L)) == 0L)
  }

  test("ngram jaccard: exact similarity for hand-checked pair") {
    // grams("abcd",3) = {abc, bcd}; grams("abcde",3) = {abc, bcd, cde}
    // intersection 2, union 3 → 2/3
    val df = Seq((1L, "abcd"), (2L, "abcde")).toDF("id", "text")
    val j = Dedup.ngramJaccardPairs(df, "id", "text", 3, 0.1)
      .select("jaccard").as[Double].head()
    assert(math.abs(j - 2.0 / 3.0) < 1e-12)
  }

  test("cluster dedup: min-label propagation resolves transitive chains") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9) and {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.dedupClusters(pairs, "doc_a", "doc_b")
      .select("id", "cluster_rep").as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("cluster dedup: driver union-find and distributed loop agree") {
    // chain of diameter 5 plus a separate clique and a 2-cycle duplicate edge
    val pairs = Seq((10L, 9L), (9L, 8L), (8L, 7L), (7L, 6L), (6L, 5L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L), (31L, 30L))
      .toDF("doc_a", "doc_b")
    val viaDriver = Dedup.dedupClusters(pairs, "doc_a", "doc_b")
      .select("id", "cluster_rep").as[(Long, Long)].collect().toMap
    val viaLoop = Dedup.dedupClusters(pairs, "doc_a", "doc_b",
        collectThreshold = -1L)
      .select("id", "cluster_rep").as[(Long, Long)].collect().toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver(5L) == 5L && viaDriver(10L) == 5L && viaDriver(22L) == 20L
      && viaDriver(31L) == 30L)
  }

  test("incrementalClusters: merged labels equal a full rebuild — " +
      "component merges, new-node edges, untouched components") {
    // old graph: components {1,2,3}, {10,11}, {20} (via a self-ish pair
    // 20-21), plus an untouched {40,41}
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (40L, 41L)).toDF("doc_a", "doc_b")
    val oldLabels = Dedup.dedupClusters(oldPairs, "doc_a", "doc_b")
    // batch: merges {1,2,3} with {10,11} via 3-10; attaches brand-new
    // node 99 to {20,21}; adds a fully-new component {70,71}
    val newPairs = Seq((3L, 10L), (99L, 21L), (70L, 71L))
      .toDF("doc_a", "doc_b")
    val merged = Dedup.incrementalClusters(oldLabels, newPairs,
        "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val rebuilt = Dedup.dedupClusters(oldPairs.unionByName(newPairs),
        "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(merged == rebuilt)
    assert(merged(11L) == 1L && merged(99L) == 20L && merged(71L) == 70L
      && merged(41L) == 40L)
  }

  test("cluster dedup: string ids use natural ordering on both paths") {
    val pairs = Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("doc_a", "doc_b")
    val expect = Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x")
    assert(Dedup.dedupClusters(pairs, "doc_a", "doc_b")
      .as[(String, String)].collect().toMap == expect)
    assert(Dedup.dedupClusters(pairs, "doc_a", "doc_b", collectThreshold = -1L)
      .as[(String, String)].collect().toMap == expect)
  }

  test("contamination check flags containment, not jaccard") {
    // eval doc is a short probe fully contained in a much longer train
    // doc: jaccard is tiny but containment is 1.0
    val probe = "the quick brown fox jumps over the lazy dog"
    val train = Seq(
      (1L, ("padding " * 50) + probe + (" trailer" * 50)),
      (2L, "completely unrelated content with nothing shared here at all"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, probe)).toDF("eval_id", "etext")
    val got = Dedup.contaminationCheck(train, "doc_id", "text",
        eval, "eval_id", "etext", n = 8, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 1)
    assert(got.head._1 == 1L && got.head._2 == 100L && got.head._3 == 1.0)
  }

  test("dup spans: shared token run becomes one maximal span per doc") {
    // 10 shared tokens; with n=3 the duplicated gram positions are the 8
    // window starts inside the run, merging to one island per document
    val run = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    val df = Seq(
      (1L, run + " only1 only2"),
      (2L, "pre1 pre2 " + run),
      (3L, "nothing in common with anybody else here")).toDF("id", "text")
    val got = Dedup.dupSpans(df, "id", "text", n = 3)
      .select("id", "span_start", "span_end", "span_tokens", "n_grams")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 9L, 10L, 8L), (2L, 2L, 11L, 10L, 8L)))
  }

  test("dup spans: within-doc repetition flags both copies as spans") {
    // grams of "p q r s p q r s" at n=3: (p q r) at 0 and 4, (q r s) at 1
    // and 5 — two islands {0,1} and {4,5}, each spanning 4 tokens
    val df = Seq((1L, "p q r s p q r s")).toDF("id", "text")
    val got = Dedup.dupSpans(df, "id", "text", n = 3)
      .select("span_start", "span_end", "span_tokens", "n_grams")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 3L, 4L, 2L), (4L, 7L, 4L, 2L)))
  }

  test("dup spans: docs shorter than n tokens yield no grams and no spans") {
    val df = Seq((1L, "a b"), (2L, "a b")).toDF("id", "text")
    assert(Dedup.dupSpans(df, "id", "text", n = 3).count() == 0L)
  }

  test("embedding near-dup finds cosine-close pairs within blocks") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.01f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", lit(0), 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("aHash flags a one-pixel perturbation as near-dup, distinct images as far") {
    import graft.operators.Multimodal
    val texts = Seq(
      (1L, "a" * 32 + "z" * 40),          // half low, half high pixels
      (2L, "b" + "a" * 31 + "z" * 40),    // one leading byte perturbed
      (3L, ("az" * 40)))                  // alternating — different pattern
    val bin = texts.toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("b"))
    val hashed = Multimodal.extractFeatures(bin, "b", featDim = 64)
      .withColumn("m", Multimodal.featureMean(col("features")))
      .select(col("doc_id"), Multimodal.aHash64(col("features"), col("m")).as("ph"))
    val byId = hashed.as[(Long, Long)].collect().toMap
    assert(byId.values.forall(_ >= 0L)) // bit 63 clear by design
    assert(java.lang.Long.bitCount(byId(1L) ^ byId(2L)) <= 3)
    assert(java.lang.Long.bitCount(byId(1L) ^ byId(3L)) > 3)
    val pairs = Dedup.hammingPairs64(hashed, "doc_id", "ph", 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // the tight-loop production path is bit-identical to the HOF pipeline
    val fast = Multimodal.perceptualHashes(bin, "doc_id", "b", 64)
      .as[(Long, Long)].collect().toMap
    assert(fast == byId)
  }

  test("incremental probe finds stored near-dups without re-pairing the corpus") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val stored = Dedup.bandSignatures(
      Seq((1L, base), (2L, "completely different content about spark shuffles here"))
        .toDF("doc_id", "text"), "doc_id", "text", 5, 64, 8)
    // new batch: a near-copy of doc 1 and a novel doc
    val newSigs = Dedup.bandSignatures(
      Seq((100L, base.dropRight(6)), (200L, "nothing like anything stored xyzzy"))
        .toDF("doc_id", "text"), "doc_id", "text", 5, 64, 8)
    val hits = Dedup.incrementalDedupProbe(stored, newSigs, 64, 0.5)
      .select("new_id", "stored_id").as[(Long, Long)].collect().toSet
    assert(hits.contains((100L, 1L)))
    assert(!hits.exists(_._1 == 200L))
    // parity with the batch pair generator on the union (no bucket-cap
    // effects at this size): probe pairs ⊆ full-LSH pairs
    val full = Dedup.minhashLshPairs(
        Seq((1L, base), (2L, "completely different content about spark shuffles here"),
          (100L, base.dropRight(6)), (200L, "nothing like anything stored xyzzy"))
          .toDF("doc_id", "text"), "doc_id", "text", 5, 64, 8, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(hits.forall { case (n, s) => full.contains((math.min(n, s), math.max(n, s))) })
  }

  test("SemDeDup: within-cell near-pairs drop the member closer to its centroid") {
    val cents = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("cid", "cv")
    val df = Seq(
      (10L, Seq(10f, 0f)),   // cell 0, dist 9 — far outlier, kept
      (11L, Seq(5f, 0f)),    // cell 0, dist 4, cos(10,11)=1 -> closer, dropped
      (12L, Seq(2f, 1.9f)),  // cell 0, cos≈0.72 < 0.9 with both -> kept
      (13L, Seq(0f, 3f)),    // cell 1, dist 2
      (14L, Seq(0f, 3f)),    // cell 1, identical -> tie, larger id dropped
      (15L, Seq(0.9f, 1.1f)) // cell 1, dissimilar -> kept
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
        cents, "cid", "cv", minCosine = 0.9)
      .select("id", "centroid_id", "kept")
      .as[(Long, Int, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L, 14L, 15L),
      "every vector stays in the output, flagged not deleted")
    assert(out(10L) == ((0, true)), "the cell-0 outlier survives")
    assert(out(11L) == ((0, false)), "the closer-to-centroid twin is dropped")
    assert(out(12L) == ((0, true)), "sub-threshold cosine is no duplicate")
    assert(out(13L) == ((1, true)), "distance tie keeps the smaller id")
    assert(out(14L) == ((1, false)), "distance tie drops the larger id")
    assert(out(15L) == ((1, true)))
    // the cell-size cap is a no-pairing valve, not a row filter: capped
    // cells skip dedup but their rows stay (and stay kept)
    val capped = Dedup.semanticDedup(df, "vec_id", "embedding",
        cents, "cid", "cv", minCosine = 0.9, maxCellSize = 2)
      .select("id", "kept").as[(Long, Boolean)].collect().toMap
    assert(capped.size == 6 && capped.values.forall(identity))
  }

  test("prefixFilterJoin: exact Jaccard pairs; a shared stopword alone never pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the weather in paris is lovely this time of year"),
      (4L, "completely different content about spark shuffles the"))
    val toks = docs.toDF("id", "text")
      .select(col("id"), explode(split(col("text"), " ")).as("tok"))
    val out = Dedup.prefixFilterJoin(toks, "id", "tok", tau = 0.6)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // brute force: only (1,2) passes — inter 7 of union 9; every doc
    // shares "the" but a stopword-grade token is never a prefix token
    assert(out == Set((1L, 2L, 7.0 / 9.0)))
    // tau = 1.0: the 1-token prefix still finds exact-duplicate sets
    val dup = Seq((5L, "alpha beta"), (6L, "beta alpha"), (7L, "alpha gamma"))
    val dupToks = dup.toDF("id", "text")
      .select(col("id"), explode(split(col("text"), " ")).as("tok"))
    val exact = Dedup.prefixFilterJoin(dupToks, "id", "tok", tau = 1.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((5L, 6L)))
  }

  test("semantic contamination: near-eval train docs flagged, witness ties to smaller id") {
    val cents = Seq((0, Seq(1f, 0f)), (1, Seq(0f, 1f))).toDF("cid", "cv")
    val train = Seq(
      (10L, Seq(10f, 0f)),  // cell 0: cos 1.0 with evals 100/102, .995 with 101
      (11L, Seq(2f, 1.9f)), // cell 0: max cos ≈ 0.79 < 0.9 → clean
      (12L, Seq(0f, 5f))    // cell 1: no eval in cell → clean
    ).toDF("vec_id", "embedding")
    val ev = Seq(
      (100L, Seq(3f, 0f)), (101L, Seq(1f, 0.1f)), (102L, Seq(20f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticContamination(train, "vec_id", "embedding",
        ev, "vec_id", "embedding", cents, "cid", "cv", minCosine = 0.9)
      .select("id", "n_eval_hits", "witness_eid", "contaminated")
      .as[(Long, Long, Option[Long], Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out.keySet == Set(10L, 11L, 12L), "clean docs stay in the output")
    // 100 and 102 tie at cosine exactly 1.0 → witness is the smaller id
    assert(out(10L) == ((3L, Some(100L), true)))
    assert(out(11L) == ((0L, None, false)))
    assert(out(12L) == ((0L, None, false)))
  }

  test("bbitSignatures: identical texts share the packed signature; estimate is 1") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content with other words here"))
      .toDF("id", "text")
    val sigs = Dedup.bbitSignatures(df, "id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs.values.forall(_ >= 0L)) // 63-bit packing stays non-negative
    val est = df.sparkSession.range(1).select(
      Dedup.bbitEstimate(lit(sigs(1L)), lit(sigs(2L))).as("e"),
      Dedup.bbitEstimate(lit(sigs(1L)), lit(sigs(3L))).as("d"))
      .as[(Double, Double)].head()
    assert(est._1 == 1.0)
    assert(est._2 >= 0.0 && est._2 < 0.5) // unrelated docs: clamped noise
  }

  test("containmentJoin: subset detected asymmetrically; Jaccard-low pair still found") {
    // A = {a,b,c} fully inside B = {a..j}: containment(A->B) = 1 but
    // Jaccard = 3/10 — the pair prefixFilterJoin(tau=.9) cannot emit.
    // C = {a,b,x}: containment(C->B) = 2/3 < 0.9 -> excluded
    val toks = (Seq("a", "b", "c").map(t => (1L, t)) ++
      ('a' to 'j').map(t => (2L, t.toString)) ++
      Seq("a", "b", "x").map(t => (3L, t))).toDF("id", "tok")
    val out = Dedup.containmentJoin(toks, "id", "tok", tau = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 1.0)))
    assert(Dedup.prefixFilterJoin(toks, "id", "tok", tau = 0.9)
      .filter(col("doc_a") === 1 && col("doc_b") === 2).count() == 0)
  }

  test("clusterEvolution: split, merged, grown, stable classes") {
    val oldM = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // A: will split (3 leaves)
      (4L, 4L), (5L, 4L),             // B: will grow (6 joins)
      (7L, 7L), (8L, 7L),             // C: will merge with D
      (9L, 9L), (10L, 9L),            // D: will merge with C
      (11L, 11L), (12L, 11L))         // E: unchanged -> stable
      .toDF("id", "cluster_rep")
    val newM = Seq(
      (1L, 1L), (2L, 1L),             // 3 is gone (singleton)
      (4L, 4L), (5L, 4L), (6L, 4L),   // B + joiner 6
      (7L, 7L), (8L, 7L), (9L, 7L), (10L, 7L), // C+D merged
      (11L, 11L), (12L, 11L))
      .toDF("id", "cluster_rep")
    val out = Dedup.clusterEvolution(oldM, newM)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(out(1L) == ((3L, 2L, 1L, 0L, "split")))
    assert(out(4L) == ((2L, 1L, 1L, 1L, "grown")))
    assert(out(7L) == ((2L, 1L, 2L, 0L, "merged")))
    assert(out(9L) == ((2L, 1L, 2L, 0L, "merged")))
    assert(out(11L) == ((2L, 1L, 1L, 0L, "stable")))
  }

  test("jaccardPrefixJoin: exact pairs at threshold, lossless vs brute force") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), // |∩|=3, |∪|=5 → 0.6
      (3L, "x y"), (4L, "y x"),         // identical sets → 1.0
      (5L, "p q r s t")).toDF("doc_id", "text")
    val out = operators.Dedup.jaccardPrefixJoin(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == Set((1L, 2L), (3L, 4L)))
    assert(out((1L, 2L)) == 0.6 && out((3L, 4L)) == 1.0)
    // losslessness on a wider corpus: prefix-filtered == brute force
    val wide = (1L to 30L).map(i =>
      (i, (0 until 6).map(j => s"w${(i + j * 7) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    val pref = operators.Dedup.jaccardPrefixJoin(wide, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val toks = wide.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val brute = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
      .join(toks.groupBy("doc_id").agg(count(lit(1)).as("ma"))
        .withColumnRenamed("doc_id", "da"), Seq("da"))
      .join(toks.groupBy("doc_id").agg(count(lit(1)).as("mb"))
        .withColumnRenamed("doc_id", "db"), Seq("db"))
      .withColumn("j", col("i").cast("double") / (col("ma") + col("mb") - col("i")))
      .filter(col("j") >= 0.5)
      .select("da", "db", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == brute && brute.nonEmpty)
  }

  test("ngramNovelty: shared phrasing scores 0, disjoint phrasing 1") {
    import spark.implicits._
    val same = (1L to 40L).map(i => (i, "the quick brown fox jumps high"))
      .toDF("doc_id", "text")
    val r1 = Dedup.ngramNovelty(same, "doc_id", "text", n = 4).head()
    assert(r1.getAs[Long]("n_unseen") == 0L)
    assert(r1.getAs[Double]("novelty") == 0.0)
    val uniq = (1L to 40L).map(i =>
      (i, s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e"))
      .toDF("doc_id", "text")
    val r2 = Dedup.ngramNovelty(uniq, "doc_id", "text", n = 4).head()
    assert(r2.getAs[Double]("novelty") == 1.0)
    assert(r2.getAs[Long]("n_unseen") == r2.getAs[Long]("n_test_grams"))
  }

  test("effectiveSampleSize: Kish (Σw)²/Σw² with singleton fill") {
    import spark.implicits._
    // two clusters of sizes 3 and 2 (members listed per row)
    val clusters = Seq(1L, 1L, 1L, 5L, 5L).map(Tuple1(_)).toDF("rep")
    val r = graft.operators.Dedup
      .effectiveSampleSize(clusters, "rep", corpusSize = 10L).head()
    assert(r.getAs[Long]("n_clusters") == 2L)
    assert(r.getAs[Long]("n_clustered") == 5L)
    assert(r.getAs[Long]("n_singletons") == 5L)
    // n_eff = 100 / (9 + 4 + 5) = 100/18
    val exp = BigDecimal(100.0 / 18)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("n_eff") == exp)
    assert(r.getAs[Double]("eff_ratio") ==
      BigDecimal(100.0 / 18 / 10).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("matchTransitivityAudit: counts open wedges exactly") {
    import spark.implicits._
    // triangle {1,2,3} fully closed; chain 4-5-6 open (4~6 missing)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (5L, 6L))
      .toDF("a", "b")
    val out = Dedup.matchTransitivityAudit(pairs, "a", "b").head()
    assert(out.getAs[Long]("n_pairs") == 5L)
    assert(out.getAs[Long]("n_wedges") == 4L) // 3 in triangle + 1 chain
    assert(out.getAs[Long]("n_closed") == 3L)
    assert(out.getAs[Long]("n_violations") == 1L)
    assert(out.getAs[Double]("closure_ratio") == 0.75)
    // no wedges at all → zero counts, NULL ratio
    val iso = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val o2 = Dedup.matchTransitivityAudit(iso, "a", "b").head()
    assert(o2.getAs[Long]("n_wedges") == 0L)
    assert(o2.isNullAt(o2.fieldIndex("closure_ratio")))
  }

  test("lshPlanner: more bands shifts the curve left (higher fp, lower fn)") {
    val m = Dedup.lshPlanner(spark, Seq((4, 8), (64, 8)), tau = 0.8)
      .collect().map(r => r.getAs[Int]("b") ->
        ((r.getAs[Double]("fp_area"), r.getAs[Double]("fn_area")))).toMap
    assert(m(64)._1 > m(4)._1) // 64 bands: collide earlier → more fp
    assert(m(64)._2 < m(4)._2) // ... and fewer missed true pairs
    // degenerate single hash (b=1, r=1): P(s) = s → fp = ∫₀^0.8 s ds
    val one = Dedup.lshPlanner(spark, Seq((1, 1)), tau = 0.8, steps = 100)
      .head()
    assert(math.abs(one.getAs[Double]("fp_area") - 0.32) < 1e-4)
    assert(math.abs(one.getAs[Double]("fn_area") - 0.02) < 1e-4)
  }
}
