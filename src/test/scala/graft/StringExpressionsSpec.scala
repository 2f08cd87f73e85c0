package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.StringExpressions

class StringExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def dice(a: String, b: String): Double =
    StringExpressions.bigramDice(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("bigramDice: textbook values, multiset semantics, degenerate inputs") {
    // night/nacht share only 'ht': 2·1/(4+4)
    assert(dice("night", "nacht") == 0.25)
    assert(dice("abc", "abc") == 1.0)
    // multiset, not set: 'aaa' has TWO 'aa' bigrams, 'aa' has one
    assert(dice("aaa", "aa") == 2.0 * 1 / 3)
    assert(dice("a", "abc") == 0.0) // no bigrams on the left
    assert(dice("", "") == 0.0)     // 0/0 defined as 0
    // symmetry
    assert(dice("widget", "wdget") == dice("wdget", "widget"))
  }

  test("registered SQL function matches the static method (codegen path)") {
    StringExpressions.register(spark)
    val pairs = Seq(("night", "nacht"), ("widget", "wdget"),
      ("stream", "spark"), ("aaa", "aa"))
    val got = pairs.toDF("a", "b")
      .select(call_function("graft_bigram_dice", col("a"), col("b")))
      .as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), v) => assert(v == dice(a, b)) }
  }
}
