package graft
import org.apache.spark.sql.SparkSession

/** Local tuning aid: time the named queries only.
  * {{{ sbt 'runMain graft.TimeQ /root/testdata/sf0.1 3 q213_frequent_itemsets' }}}
  * runs each named query 3 times against the given SF dir and prints
  * every pass plus the min — the same warm-JVM min-of-N estimator
  * [[Bench]] uses, without paying for the other 300+ queries. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional runtime conf overrides for A/B experiments ("k=v;k=v";
    // ';'-separated everywhere — TimeQ/JobStats/Bench; malformed or
    // empty segments are skipped, not crashed on)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ =>
      }
    })
    spark.range(100000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $name%-28s min ${times.min}%7.3f s  passes ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
