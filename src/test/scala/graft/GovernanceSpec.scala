package graft

import org.apache.spark.sql.functions._
import graft.operators.Governance

class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("row policy keeps exactly the allowlisted keys") {
    val data = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val policy = Seq(Tuple1(1L), Tuple1(3L), Tuple1(3L)).toDF("allowed")
    val got = Governance.applyRowPolicy(data, "k", policy, "allowed")
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 3L))
  }

  test("mask tail is format-preserving") {
    val got = Seq("Customer#42", "ab", "").toDF("s")
      .select(Governance.maskTail(col("s"), 4).as("m")).as[String].collect().toSeq
    assert(got == Seq("Cust*******", "ab", ""))
  }

  test("generalize bands negative and positive values consistently") {
    val got = Seq(1863.84, -12.5, 0.0, 99.99).toDF("x")
      .select(Governance.generalize(col("x"), 100.0).as("b")).as[Double].collect().toSeq
    assert(got == Seq(1800.0, -100.0, 0.0, 0.0))
  }

  test("url safety rejects non-http schemes, localhost, and private ranges") {
    val cases = Seq(
      "https://ok.example.com/x" -> true,
      "http://ok.example.com/x" -> true,
      "file:///etc/passwd" -> false,
      "ftp://host/x" -> false,
      "http://localhost/admin" -> false,
      "http://127.0.0.1/x" -> false,
      "http://10.1.2.3/x" -> false,
      "http://192.168.0.9/x" -> false,
      "http://172.16.0.1/x" -> false,
      "http://172.32.0.1/x" -> true, // 172.32 is outside RFC-1918
      "http://169.254.1.1/x" -> false)
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Governance.urlIsSafe(col("url")).as("s"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (u, expect) => assert(got(u) == expect, u) }
  }

  test("URL canonicalization collapses cosmetic variants, keeps real differences") {
    val cases = Seq(
      "https://Example.COM/a" -> "https://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:80/a" -> "http://example.com/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a", // real port kept
      "https://example.com/a#section" -> "https://example.com/a",
      "https://example.com/a?utm_source=x&b=2&a=1&fbclid=z" ->
        "https://example.com/a?a=1&b=2",
      "https://example.com/a?b=2&a=1" -> "https://example.com/a?a=1&b=2",
      "https://example.com" -> "https://example.com/", // empty path → '/'
      "https://example.com/a?x=1" -> "https://example.com/a?x=1")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Governance.canonicalizeUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, expect) => assert(got(u) == expect, u) }
  }
}
