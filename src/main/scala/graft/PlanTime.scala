package graft

import org.apache.spark.sql.SparkSession

/** Local tuning aid (r11): split a query's wall time into DataFrame
  * construction, analysis, optimization+physical planning, and
  * execution — tells whether the per-query floor is driver planning or
  * actual run time. Usage: runMain graft.PlanTime <sfDir> <reps> [q...] */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    println(f"${"query"}%-30s ${"build"}%7s ${"analyze"}%8s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val t = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.schema // force analysis
          val t2 = System.nanoTime()
          df.queryExecution.executedPlan // optimize + physical plan
          val t3 = System.nanoTime()
          try df.count()
          catch { case e: Throwable => System.err.println(s"$name: $e") }
          val t4 = System.nanoTime()
          spark.catalog.clearCache()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, (t4 - t3) / 1e9)
        }.last // warm rep
        println(f"$name%-30s ${t._1}%7.3f ${t._2}%8.3f ${t._3}%7.3f " +
          f"${t._4}%7.3f ${t._1 + t._2 + t._3 + t._4}%7.3f")
      }
    }
    spark.stop()
  }
}
