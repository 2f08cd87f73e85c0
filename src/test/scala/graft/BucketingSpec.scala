package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Co-located joins via bucketed tables — the zero-shuffle join layout for
  * repeated big-big joins at cluster scale (SURVEY §2.3: "co-located joins
  * via bucketing"). Both sides bucketed by the join key into the same
  * bucket count → the join needs NO exchange on either side.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without a shuffle exchange") {
    // managed tables land in the default warehouse; DROP TABLE removes files
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("okey", "o_val")
    val lineitem = (1L to 5000L).map(i => (i % 1000 + 1, i)).toDF("okey", "l_val")
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lineitem")

    // disable broadcast so the join would otherwise need a full shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "okey")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"expected shuffle-free co-located join:\n$p")
      assert(joined.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("partitioned fact + filtered dim join dynamic-partition-prunes the scan") {
    // the OTHER scan-pruning pillar at 100 TB: a fact table partitioned by
    // a dim-derived key only reads the partitions the dim filter selects —
    // the partition filter arrives at RUNTIME from the broadcast side
    val dir = Files.createTempDirectory("graft_dpp").toFile
    val fact = (0L until 5000L)
      .map(i => (i, s"p${i % 10}", i * 2)).toDF("id", "part_key", "v")
    fact.write.partitionBy("part_key").mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/fact")
    Seq(("p3", "keep"), ("p7", "keep"), ("p3x", "drop"))
      .toDF("part_key", "tag")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/dim")
    val dim = spark.read.parquet(s"${dir.getAbsolutePath}/dim")
    val joined = spark.read.parquet(s"${dir.getAbsolutePath}/fact")
      .join(dim.filter(col("tag") === "keep"), "part_key")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      "expected a runtime dynamicpruning partition filter:\n" +
        p.linesIterator.take(25).mkString("\n"))
    assert(joined.count() == 1000L) // 2 of 10 partitions survive
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
