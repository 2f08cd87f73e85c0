package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("asOfJoin: latest right row at or before each left row, per key") {
    val left = Seq(
      (1L, 10L, ts(10), "p10"), (2L, 10L, ts(30), "p30"),
      (3L, 20L, ts(5), "p5"))
      .toDF("event_id", "user_id", "ts", "tag")
    val right = Seq(
      (10L, ts(3), 1.0), (10L, ts(10), 2.0), (10L, ts(20), 3.0),
      (20L, ts(9), 9.0))
      .toDF("user_id", "ts", "value")
    val out = Joins.asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .select("event_id", "asof_value").as[(Long, Option[Double])]
      .collect().toMap
    // equal timestamps match (at-or-before): event 1 picks the ts(10) click
    assert(out == Map(1L -> Some(2.0), 2L -> Some(3.0), 3L -> None))
  }

  test("asOfJoin preserves left rows with no preceding right row") {
    val left = Seq((1L, 5L, ts(1), 1.0)).toDF("event_id", "user_id", "ts", "value")
    val right = Seq((5L, ts(2), 7.0)).toDF("user_id", "ts", "value")
    val row = Joins.asOfJoin(left, right, "user_id", "ts", Seq("value"))
      .select("asof_ts", "asof_value").head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("bloomPrunedJoin ≡ plain join; prefilter passes every matching row") {
    val fact = (1L to 400L).map(i => (i, s"row$i")).toDF("fk", "payload")
    val dim = Seq((7L, "a"), (23L, "b"), (399L, "c")).toDF("dk", "attr")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    val pruned = Joins.bloomPrunedJoin(fact, "fk", dim, "dk")
      .select("fk", "payload", "attr").as[(Long, String, String)]
      .collect().toSet
    assert(pruned == plain, "false positives die in the join; no false negatives")
    // the prefilter alone is a superset of matching rows and (with m=2^17
    // over 3 keys) drops the overwhelming majority of non-matching ones
    val pass = Joins.bloomPrefilter(fact, "fk", dim, "dk")
      .select("fk").as[Long].collect().toSet
    assert(Set(7L, 23L, 399L).subsetOf(pass))
    assert(pass.size < 50, s"prefilter kept ${pass.size} of 400")
  }

  test("rangeJoin: banded equi-join matches brute BETWEEN, band edges exact") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 5L), (3L, 100L, 160L))
      .toDF("iid", "lo", "hi")
    val pts = Seq(0L, 5L, 10L, 11L, 15L, 16L, 99L, 100L, 160L, 161L)
      .map(Tuple1(_)).toDF("p")
    val out = Joins.rangeJoin(pts, "p", iv, "lo", "hi", 16L)
      .select("iid", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pts.crossJoin(iv)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("iid", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == brute)
    assert(out == Set((1L, 0L), (1L, 5L), (1L, 10L), (2L, 5L),
      (3L, 100L), (3L, 160L)))
  }

  test("overlapJoin: each overlapping pair exactly once, matches brute force") {
    import spark.implicits._
    // long intervals spanning several bands — the ownership rule must
    // keep exactly one copy per pair
    val l = Seq((1L, 0L, 40L), (2L, 35L, 36L), (3L, 90L, 95L))
      .toDF("lid", "llo", "lhi")
    val r = Seq((10L, 30L, 100L), (11L, 41L, 50L), (12L, 200L, 210L))
      .toDF("rid", "rlo", "rhi")
    val out = Joins.overlapJoin(l, "llo", "lhi", r, "rlo", "rhi", 16L)
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toList.sorted
    val brute = l.crossJoin(r)
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select("lid", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toList.sorted
    assert(out == brute) // sorted LISTS: catches duplicates, not just sets
    assert(out == List((1L, 10L), (2L, 10L), (3L, 10L)))
  }
}
