package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local tuning aid (r11): micro-timings for expression-level A/Bs that
  * TimeQ can't isolate (shingling forms, HOF vs native). Each case runs
  * `reps` times warm and prints the min. Usage: runMain graft.MicroBench <sfDir> */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.HashExpressions.register(spark)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    d.count()
    def time(label: String, reps: Int = 5)(body: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-46s min ${ts.map(_._1).min}%7.3f s  (n=${ts.head._2})")
    }
    time("explode shingleExpr(5) [HOF strings]") {
      d.select(explode(operators.Dedup.shingleExpr("text", 5)).as("t")).count()
    }
    time("explode shingle strings via sentinel-native") {
      d.select(explode(expr("graft_shingles(text, 5)")).as("t")).count()
    }
    time("shingleHashes [HOF transform+aggregate]") {
      d.select(explode(operators.Dedup.shingleHashes("text", 5)).as("t")).count()
    }
    time("graft_shingle_polyhashes [native]") {
      d.select(explode(expr("graft_shingle_polyhashes(text, 5)")).as("t")).count()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    time("minhash sig 64 over shingle polyhashes") {
      noop(d.select(expr(
        "graft_minhash_sig(graft_shingle_polyhashes(text, 5), 64)").as("sig")))
    }
    time("band hashes [HOF transform+aggregate(slice)]") {
      noop(d.select(expr(
        "graft_minhash_sig(graft_shingle_polyhashes(text, 5), 64)").as("sig"))
        .select(expr("transform(sequence(0, 7), b -> " +
          "aggregate(slice(sig, b * 8 + 1, 8), 0L, " +
          "(acc, v) -> (acc * 1000003L + v) % 2147483647L))").as("bh")))
    }
    time("band hashes [native graft_band_hashes]") {
      noop(d.select(expr(
        "graft_minhash_sig(graft_shingle_polyhashes(text, 5), 64)").as("sig"))
        .select(expr("graft_band_hashes(sig, 8)").as("bh")))
    }
    spark.stop()
  }
}
