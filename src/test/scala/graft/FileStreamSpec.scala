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
}
