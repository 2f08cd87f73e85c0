package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with one pathologically hot key, adaptive
  * execution splits the skewed partition at runtime instead of one reducer
  * dragging the stage — the organic-skew complement to the explicit
  * [[graft.operators.Joins.saltedJoin]] for known-hot keys. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 100k rows on ONE key vs 100 on the rest → massive relative skew
      val left = spark.range(100000).select(
        when(col("id") < 99900, 7L).otherwise(col("id") % 100).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
      val right = (0L until 100L).map(i => (i, s"r$i")).toDF("k", "name")
      val joined = left.join(right, "k")
      // materialize THIS frame (count() would finalize a different plan)
      assert(joined.collect().length == 100000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"expected AQE skew split in:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
