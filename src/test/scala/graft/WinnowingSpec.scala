package graft

import graft.operators.{Clustering, Dedup, Winnowing}
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  // 40 chars, comfortably over k + w − 1 = 23
  private val base = "the quick brown fox jumps over lazy dogs"

  test("fingerprints: identical docs share every fingerprint, short docs none") {
    val df = Seq((1L, base), (2L, base), (3L, "too short")).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, "doc_id", "text")
      .groupBy("doc_id").agg(collect_set("fp").as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet == fps(2L).toSet && fps(1L).nonEmpty)
    assert(!fps.contains(3L))
  }

  test("fingerprints: a shared span of length >= w + k - 1 guarantees a common fp") {
    // winnowing guarantee: any shared substring of 23+ chars yields at
    // least one shared selected fingerprint, whatever surrounds it
    val span = "0123456789abcdefghijklmnop" // 26 chars
    val df = Seq((1L, s"XXXX $span YYYYYYYYYY"), (2L, s"ZZZZZZZZZZZZ $span QQ"))
      .toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, "doc_id", "text")
      .groupBy("doc_id").agg(collect_set("fp").as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty)
  }

  test("native winnow fingerprints equal the per-character window form, any k/w") {
    // the r11 native expression vs the original explode + lead + sliding
    // window-min formulation, on random text over several (k, w)
    val P = 1000000007L
    val rnd = new scala.util.Random(7)
    // includes multi-byte BMP characters (r11 ADVICE): the native form
    // hashes Unicode CODE POINTS, which must equal the declarative
    // split('')+ascii() path on every character the corpus can contain
    val alpha = "abcdefg XYZ.,;!? 0123456789éßñ人間ωДあ"
    val docs = (1 to 30).map { i =>
      (i.toLong, (0 until 20 + rnd.nextInt(300))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    }.toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 16), (3, 4), (5, 2), (2, 7))) {
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val old = docs.filter(length(col("text")) >= k + w - 1)
        .select(col("doc_id"),
          posexplode(expr(s"transform(split(text, ''), c -> cast(ascii(c) as bigint))"))
            .as(Seq("pos", "code")))
        .withColumn("_kh", pmod((0 until k).map { j =>
          lead(col("code"), j).over(wDoc) * lit(Seq.fill(k - 1 - j)(31L).product)
        }.reduce(_ + _), lit(P)))
        .filter(col("_kh").isNotNull)
        .withColumn("fp", min(col("_kh")).over(wDoc.rowsBetween(0, w - 1)))
        .withColumn("_full", lead(col("_kh"), w - 1).over(wDoc))
        .filter(col("_full").isNotNull)
        .select(col("doc_id"), col("fp")).distinct()
        .as[(Long, Long)].collect().toSet
      val native = graft.operators.Winnowing
        .fingerprints(docs, "doc_id", "text", k, w)
        .as[(Long, Long)].collect().toSet
      assert(native == old, s"winnow mismatch at k=$k w=$w")
    }
  }

  test("sharedFingerprintPairs: near-dup twins pair up, unrelated docs do not") {
    val other = "completely different words appear in this second document here"
    val df = Seq((1L, base + " with a small tail"), (2L, base + " and another tail"),
      (3L, other)).toDF("doc_id", "text")
    val pairs = Winnowing.sharedFingerprintPairs(df, "doc_id", "text",
        minShared = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("editVerifiedPairs: levenshtein confirms the LSH candidates") {
    val a = base * 3
    val df = Seq((1L, a), (2L, a + " tail"), (3L, "x")).toDF("doc_id", "text")
    val out = Dedup.editVerifiedPairs(df, "doc_id", "text",
        threshold = 0.5, minEditSim = 0.9)
      .select("doc_a", "doc_b", "lev", "verified")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 2L, 5L, true))) // " tail" = 5 appended chars
  }

  test("kCenterGreedy: seeds at min id, then picks the farthest point") {
    val df = Seq(
      (10L, Array(1f, 0f)),  // seed (min id)
      (11L, Array(0.9f, 0.1f)), // near the seed
      (12L, Array(-1f, 0f)), // opposite: distance 2, picked second
      (13L, Array(0f, 1f))   // orthogonal: distance 1, picked third
    ).toDF("vec_id", "embedding")
    val out = Clustering.kCenterGreedy(df, "embedding", "vec_id", 3)
      .orderBy("sel_rank")
      .select("sel_rank", "id").as[(Int, Long)].collect().toSeq
    assert(out == Seq((1, 10L), (2, 12L), (3, 13L)))
  }
}
