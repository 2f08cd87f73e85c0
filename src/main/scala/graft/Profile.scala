package graft

import org.apache.spark.sql.SparkSession

/** Repeated-run profiler: times each named query `reps` times in one
  * session and prints first/min seconds, separating one-off costs
  * (codegen compile, footer reads, AQE planning) from steady-state
  * execution. Usage: runMain graft.Profile <sfDir> <reps> [query...] */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case t: Throwable => System.err.println(s"$name FAILED: $t"); -1L }
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-28s first=${times.head}%6.3f  min=${times.min}%6.3f")
      }
    }
    spark.stop()
  }
}
