package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE vocabulary induction: hand-checkable merges on a tiny corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wordCounts keeps lowercase a-z tokens with frequencies") {
    val df = Seq("the cat The CAT cat!", "the dog").toDF("text")
    val wc = Bpe.wordCounts(df, "text").as[(String, Long)].collect().toMap
    // "cat!" fails ^[a-z]+$; "The"/"CAT" lowercase to the/cat
    assert(wc == Map("the" -> 3L, "cat" -> 2L, "dog" -> 1L))
  }

  test("learnMerges picks the most frequent adjacent pair, ties by symbol") {
    // freq-weighted pairs in {aab×3, ab×2}: (a,b) count 5, (a,a) count 3
    val words = Seq(("aab", 3L), ("ab", 2L)).toDF("word", "freq")
    val m = Bpe.learnMerges(words, iters = 2)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(m(0) == ((1, "a", "b", 5L)))
    // after merging "ab": words are a|ab ×3 and ab ×2 -> pair (a, ab) ×3
    assert(m(1) == ((2, "a", "ab", 3L)))
  }

  test("greedy leftmost merge: overlapping pair consumed left to right") {
    // "aaa" with freq 4: pairs (a,a)×2·4=8; merging gives aa|a (greedy),
    // so round 2 sees (aa, a) ×4
    val words = Seq(("aaa", 4L)).toDF("word", "freq")
    val m = Bpe.learnMerges(words, iters = 2)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(m(0) == ((1, "a", "a", 8L)))
    assert(m(1) == ((2, "aa", "a", 4L)))
  }

  test("applyMerges tokenizes with the learned merge list in rank order") {
    val words = Seq(("aab", 1L), ("b", 1L)).toDF("word", "freq")
    val toks = Bpe.applyMerges(words, Seq(("a", "a"), ("aa", "b")))
      .select("word", "tokens")
      .as[(String, Seq[String])].collect().toMap
    assert(toks("aab") == Seq("aab"))
    assert(toks("b") == Seq("b"))
  }

  test("applyMerges rides input columns through (freq-weighted tokenize)") {
    val words = Seq(("abc", 5L)).toDF("word", "freq")
    val out = Bpe.applyMerges(words, Seq(("a", "b")))
      .select("word", "freq", "tokens")
      .as[(String, Long, Seq[String])].collect().toSeq
    assert(out == Seq(("abc", 5L, Seq("ab", "c"))))
  }

  test("learn -> apply round-trip: corpus tokenizes with its own merges") {
    val df = Seq("low lower lowest", "low low").toDF("text")
    val wc = Bpe.wordCounts(df, "text")
    val merges = Bpe.learnMerges(wc, iters = 3).orderBy("rank")
      .select("sym_a", "sym_b").as[(String, String)].collect().toSeq
    val toks = Bpe.applyMerges(wc, merges)
      .select("word", "tokens").as[(String, Seq[String])].collect().toMap
    // merges learned: (l,o)x5 -> (lo,w)x5 -> (low,e)x2; every word
    // reassembles from its tokens
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(toks == Map("low" -> Seq("low"), "lower" -> Seq("lowe", "r"),
      "lowest" -> Seq("lowe", "s", "t")))
    toks.foreach { case (w, ts) => assert(ts.mkString == w) }
  }

  test("single-char words contribute no pairs but keep their frequency") {
    val words = Seq(("a", 9L), ("bc", 1L)).toDF("word", "freq")
    val m = Bpe.learnMerges(words, iters = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "b", "c", 1L)))
  }
}
