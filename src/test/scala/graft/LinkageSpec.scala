package graft

import graft.operators.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("best match picks the most similar in-block candidate, above threshold only") {
    val left = Seq(
      (1L, "b1", "johnathan smith"),
      (2L, "b1", "maria gonzalez"),
      (3L, "b2", "totally unique name")).toDF("id", "blk", "name")
    val right = Seq(
      (10L, "b1", "jonathan smith"), // near-dup of 1
      (11L, "b1", "maria gonzales"), // near-dup of 2
      (12L, "b1", "zzzz qqqq xxxx"), // decoy, low similarity
      (13L, "b3", "totally unique name")) // exact text but WRONG block
      .toDF("id", "blk", "name")
    val got = Linkage.bestMatch(left, "id", right, "id", "blk", "name", 0.3)
      .select("l_id", "matched_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 11L)) // 3 has no in-block candidate
  }

  test("jaccard is trigram-set based and symmetric under the hash") {
    val left = Seq((1L, "b", "abcdef")).toDF("id", "blk", "name")
    val right = Seq((2L, "b", "abcdef")).toDF("id", "blk", "name")
    val j = Linkage.bestMatch(left, "id", right, "id", "blk", "name", 0.0)
      .select("jaccard").as[Double].head()
    assert(j == 1.0) // identical strings → identical trigram sets
  }

  test("goldenRecords: mode survivorship with deterministic ties, max and min folds") {
    val recs = Seq(
      (1L, 10L, "en", "s1", 10), (2L, 10L, "fr", "s2", 20),
      (3L, 10L, "en", "s1", 15),
      // cluster 20: lang tie en/fr 1-1 -> lexicographically smaller "en"
      (4L, 20L, "fr", "s9", 5), (5L, 20L, "en", "s9", 3))
      .toDF("id", "cluster", "lang", "source", "nch")
    val out = graft.operators.Linkage
      .goldenRecords(recs, "id", "cluster", Seq("lang", "source"), Seq("nch"))
      .orderBy("cluster_id")
      .as[(Long, Long, Long, Int, String, String)].collect().toSeq
    assert(out == Seq((10L, 1L, 3L, 20, "en", "s1"),
      (20L, 4L, 2L, 5, "en", "s9")))
  }

  test("sortedNeighborhood: adjacent near-identicals pair, distant names never") {
    val recs = Seq(
      (1L, "alpha document one"),
      (2L, "alpha document onX"),   // dist 1 from id 1, adjacent in sort
      (3L, "zz totally different"),
      (4L, "alpha documenz one")    // dist 1 from id 1, 2 from id 2
    ).toDF("id", "name")
    val out = graft.operators.Linkage
      .sortedNeighborhood(recs, "id", "name", window = 3, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(4)).toMap
    // sort order: "alpha document onX"(2) < "alpha document one"(1)
    //   < "alpha documenz one"(4) < "zz..."(3)
    assert(out((2L, 1L)) == 1)
    assert(out((1L, 4L)) == 1)
    assert(out((2L, 4L)) == 2)
    // id 3 pairs with nothing within dist 2
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("editDistanceJoin: exact distances, lossless vs brute force") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "abcdef"), (2L, "abcdxf"), (3L, "abcdef"),
      (4L, "zzzzzz"), (5L, "abzdxf"), (6L, "abc") /* < q(k+1): excluded */)
      .toDF("id", "s")
    val out = Linkage.editDistanceJoin(docs, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out == Map((1L, 2L) -> 1, (1L, 3L) -> 0, (1L, 5L) -> 2,
      (2L, 3L) -> 1, (2L, 5L) -> 1, (3L, 5L) -> 2))
    // losslessness on a generated corpus: filtered == brute force
    val wide = (1L to 40L).map(i =>
      (i, (0 until 8).map(j => ('a' + (i + j * 3) % 7).toChar).mkString))
      .toDF("id", "s")
    val filt = Linkage.editDistanceJoin(wide, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = wide.as("a").crossJoin(wide.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .filter(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(filt == brute && brute.nonEmpty)
  }

  test("fellegiSunter: u from value distribution, hand-computed log evidence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val recs = Seq((1L, "x", "p"), (2L, "x", "p"), (3L, "y", "p"),
      (4L, "y", "q")).toDF("id", "f1", "f2").withColumn("blk", lit(0))
    val out = Linkage.fellegiSunter(recs, "id", "blk", Seq("f1", "f2"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size == 6) // all within-block pairs
    // u(f1): {x:2, y:2} → 8/16 = 0.5; u(f2): {p:3, q:1} → 10/16 = 0.625
    val (u1, u2) = (0.5, 0.625)
    assert(out((1L, 2L)) ==
      ((2L, math.log(0.95 / u1) + math.log(0.95 / u2))))
    assert(out((3L, 4L)) ==
      ((1L, math.log(0.95 / u1) + math.log((1.0 - 0.95) / (1.0 - u2)))))
    assert(out((1L, 4L)) ==
      ((0L, math.log((1.0 - 0.95) / (1.0 - u1)) +
        math.log((1.0 - 0.95) / (1.0 - u2)))))
  }

  test("blockingQuality: reduction ratio and pairs completeness exact") {
    import spark.implicits._
    val cand = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    val truth = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val r = Linkage.blockingQuality(cand, "a", "b", truth, "a", "b", 4L)
      .head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    // RR = 1 − 2/6; PC = 1/2
    assert(r.getDouble(3) ==
      BigDecimal(1.0 - 2.0 / 6).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(4) == 0.5)
  }

  test("phoneticBlocks: same-sound different-spelling words share a block") {
    import spark.implicits._
    val words = Seq("smith", "smyth", "robert", "rupert", "blue")
      .toDF("w")
    val blocks = Linkage.phoneticBlocks(words, "w")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2))).toMap
    assert(blocks("S530") == ((2L, "smith,smyth")))
    assert(blocks("R163") == ((2L, "robert,rupert")))
    assert(blocks("B400") == ((1L, "blue")))
  }

  test("diceBestMatch: dropped-char typo recovers its source word") {
    import spark.implicits._
    val vocab = Seq("widget", "window", "gizmo").toDF("w")
    val variants = Seq(("widget", "wdget"), ("window", "wndow"))
      .toDF("orig", "typo")
    val out = Linkage.diceBestMatch(variants, "orig", "typo", vocab, "w")
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out == Map("widget" -> "widget", "window" -> "window"))
  }

  test("fellegiSunterEm: separable field earns a larger agree weight") {
    import spark.implicits._
    // block 1 holds twin records agreeing on f1 (rarely by chance on
    // f2); many cross pairs agree on neither — EM should learn
    // m(f1) >> u(f1) and a bigger weight for f1 than f2
    val rows = Seq(
      (1L, 1, "x", "p"), (2L, 1, "x", "q"), (3L, 1, "y", "p"),
      (4L, 1, "y", "q"), (5L, 1, "z", "p"), (6L, 1, "z", "q"))
      .toDF("id", "blk", "f1", "f2")
    val out = Linkage.fellegiSunterEm(rows, "id", "blk",
      Seq("f1", "f2"), iters = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // pi consistent across rows, weights positive and finite
    assert(out.keySet == Set("f1", "f2"))
    val (m1, u1, w1) = out("f1")
    assert(m1 >= 0.0 && m1 <= 1.0 && u1 >= 0.0 && u1 <= 1.0)
    assert(w1 > 0.0)
  }

  test("jaroWinklerBestMatch: transposition typo links back; reject band drops strangers") {
    val left = Seq((1L, "MARTHA"), (2L, "DWAYNE"), (3L, "ZEBRA"))
      .toDF("id", "w")
    val right = Seq("MARHTA", "DUANE", "QUUX").map(Tuple1(_)).toDF("rw")
    val out = graft.operators.Linkage.jaroWinklerBestMatch(
        left, "id", "w", right, "rw", minJw = 0.8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getAs[Double]("jw"))).toMap
    assert(out(1L) == ("MARHTA", 0.961111))
    assert(out(2L) == ("DUANE", 0.84))
    // ZEBRA has no same-letter candidate at all -> absent
    assert(!out.contains(3L))
  }
}
