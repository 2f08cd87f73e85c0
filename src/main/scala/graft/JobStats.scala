package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Local tuning aid (r11): per-query job/stage/task accounting, so a
  * query's wall time can be attributed to scheduling floor (many tiny
  * jobs/stages) vs real task work. Prints, per named query:
  * wall seconds, #jobs, #stages, #tasks, summed task time, and the
  * implied overhead (wall − task-time/cores).
  * Usage: runMain graft.JobStats <sfDir> <reps> [query...] */
object JobStats {
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
    // optional runtime conf overrides for A/B experiments, e.g.
    // SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false;spark.sql.shuffle.partitions=8"
    // (';'-separated everywhere — TimeQ/JobStats/Bench; malformed or
    // empty segments are skipped, not crashed on)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ =>
      }
    })
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
    }
    spark.sparkContext.addSparkListener(listener)
    spark.range(100000).selectExpr("sum(id)").collect()
    println(f"${"query"}%-30s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s " +
      f"${"tasks"}%6s ${"taskSum_s"}%10s")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        val walls = (1 to reps).map { r =>
          if (r == reps) { // count only the last (warm) rep
            jobs = 0; stages = 0; tasks = 0; taskMs = 0L
          }
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case t: Throwable =>
            System.err.println(s"$name FAILED: $t") }
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        Thread.sleep(150) // let straggling listener events drain
        println(f"$name%-30s ${walls.last}%8.3f $jobs%5d $stages%7d " +
          f"$tasks%6d ${taskMs / 1e3}%10.3f")
      }
    }
    spark.stop()
  }
}
