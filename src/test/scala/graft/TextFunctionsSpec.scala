package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c).head().getAs[T](0)

  test("token count ignores repeated/leading whitespace") {
    assert(one[Int](TF.tokenCount(col("text")), "  a  b c ") == 3)
    assert(one[Int](TF.tokenCount(col("text")), "") == 0)
  }

  test("approx subword count: +1 token per 4 chars beyond the first 4") {
    assert(one[Int](TF.approxSubwordCount(col("text")), "ab cd") == 2)
    assert(one[Int](TF.approxSubwordCount(col("text")), "abcdefgh") == 2)  // 8 chars → 2
    assert(one[Int](TF.approxSubwordCount(col("text")), "abcdefghi") == 3) // 9 chars → 3
  }

  test("punct/digit ratios") {
    assert(one[Double](TF.punctRatio(col("text")), "a,b!") == 0.5)
    assert(one[Double](TF.digitRatio(col("text")), "a1b2") == 0.5)
    assert(one[Double](TF.punctRatio(col("text")), "") == 0.0)
  }

  test("stopword ratio over lowercased tokens") {
    assert(one[Double](TF.stopwordRatio(col("text")), "The cat and dog") == 0.5)
  }

  test("mean word length") {
    assert(one[Double](TF.meanWordLength(col("text")), "ab abcd") == 3.0)
    assert(one[Double](TF.meanWordLength(col("text")), "") == 0.0)
  }

  test("langId picks the language with most marker hits; no hits → und") {
    assert(one[String](TF.langId(col("text")), "this is the best of the tests") == "en")
    assert(one[String](TF.langId(col("text")), "das ist der Hund und die Katze") == "de")
    assert(one[String](TF.langId(col("text")), "xyzzy qwerty") == "und")
  }

  test("fingerprint: equal texts equal, differing texts differ, order-sensitive") {
    val df = Seq(("ab"), ("ab"), ("ba")).toDF("text")
    val fps = df.select(TF.fingerprint("text")).as[Long].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
    // hand-computed: h("ab") = (0*31+97)*31+98 mod p = 3105
    assert(fps(0) == 97L * 31 + 98)
  }

  test("quality score stays in [0,1] and rewards clean prose") {
    val clean = "the quick brown fox jumps over the lazy dog and runs far away today again"
    val noisy = "@@@@ 1234 #### $$$$ %%%% 5678"
    val qc = one[Double](TF.qualityScore(col("text")), clean)
    val qn = one[Double](TF.qualityScore(col("text")), noisy)
    assert(qc > 0.8 && qc <= 1.0)
    assert(qn < 0.3 && qn >= 0.0)
  }
}
