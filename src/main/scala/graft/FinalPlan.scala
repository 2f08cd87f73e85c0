package graft

import org.apache.spark.sql.SparkSession

/** Local tuning aid (r12): print the FINAL adaptive plan — the one with
  * AQEShuffleRead coalesce decisions and runtime join strategies — by
  * executing the query first, then rendering its executedPlan. Explain
  * (pre-execution) only shows `isFinalPlan=false`, which hides exactly
  * the partition-count decisions that matter for the 1-task-stage
  * serialization hunts. Usage: runMain graft.FinalPlan <sfDir> [q...] */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name (final adaptive plan) ==========")
        try {
          val df = fn(spark, sfDir)
          df.count()
          println(df.queryExecution.executedPlan.toString)
        } catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
