package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.{Files, Paths}

/** New-file detection via Structured Streaming's file source — the ST1
  * "new objects" path (the modified-object path is the foreachBatch refresh
  * tested in StreamingSpec). The checkpoint carries processed-file state, so
  * a restarted query ingests ONLY files that arrived since — exactly the
  * incremental semantics the reference builds by hand with etag bookkeeping
  * (reference: embed/refresh.py, oci/bucket.py:152-181). */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("file stream ingests only newly arrived files across restarts") {
    val dir = Files.createTempDirectory("graft-filestream").toString
    val ckpt = dir + "/_ckpt"
    Files.writeString(Paths.get(dir, "first.txt"), "alpha")

    val out = dir + "/_out"
    def runOnce(): Unit = {
      val q = spark.readStream.text(dir + "/*.txt")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      q.stop()
    }

    runOnce()
    assert(spark.read.parquet(out).select("value").as[String].collect().toSeq
      == Seq("alpha"))

    Files.writeString(Paths.get(dir, "second.txt"), "beta")
    runOnce() // same checkpoint → only the delta is appended
    assert(spark.read.parquet(out).select("value").as[String].collect().toSet
      == Set("alpha", "beta"))
  }

  test("windowed aggregation state survives a checkpointed restart") {
    // an open window's partial count lives in the state store; a restarted
    // query must resume it, not recount from scratch — the property that
    // makes exactly-once windowed aggregation real on a long-lived cluster
    val dir = Files.createTempDirectory("graft-statestream").toString
    val ckpt = dir + "/_ckpt"
    val out = dir + "/_out"
    val schema = "ts TIMESTAMP, v INT"
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).json(dir + "/in")
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("n"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      q.stop()
    }
    Files.createDirectories(Paths.get(dir, "in"))
    // run 1: hour-0 closes (watermark passes 01:00); hour-1 stays OPEN
    // with one event in state
    Files.writeString(Paths.get(dir, "in", "a.json"),
      """{"ts":"1970-01-01T00:10:00Z","v":1}
        |{"ts":"1970-01-01T00:20:00Z","v":2}
        |{"ts":"1970-01-01T01:05:00Z","v":3}""".stripMargin)
    runOnce()
    val after1 = spark.read.parquet(out)
      .select(hour(col("ws")), col("n")).as[(Int, Long)].collect().toMap
    assert(after1 == Map(0 -> 2L)) // hour 1 not emitted yet — still open

    // run 2: one more hour-1 event, plus hour-2 to advance the watermark.
    // hour-1 must emit 2 = 1 (recovered state) + 1 (new) — a lost state
    // store would report 1
    Files.writeString(Paths.get(dir, "in", "b.json"),
      """{"ts":"1970-01-01T01:30:00Z","v":4}
        |{"ts":"1970-01-01T02:30:00Z","v":5}""".stripMargin)
    runOnce()
    val after2 = spark.read.parquet(out)
      .select(hour(col("ws")), col("n")).as[(Int, Long)].collect().toMap
    assert(after2 == Map(0 -> 2L, 1 -> 2L))
  }
}
