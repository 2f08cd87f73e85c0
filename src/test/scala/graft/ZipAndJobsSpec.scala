package graft

import graft.sources.ZipIngest
import graft.streaming.JobTracker
import graft.testbed.Testbed
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import java.nio.file.{Files, Paths}

class ZipAndJobsSpec extends SparkSpec {
  import spark.implicits._

  private def makeZip(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, bytes) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("zip extraction flattens paths and reads entries (S11)") {
    val z = makeZip("a/b.txt" -> "hello".getBytes, "c.md" -> "# hi".getBytes)
    val out = ZipIngest.extractEntries(z)
    assert(out.map(_._1) == Seq("a_b.txt", "c.md"))
    assert(new String(out.head._2) == "hello")
  }

  test("zip caps enforced: entry count, per-file size, nested archives " +
       "(staging.py:33-35,119-241)") {
    val many = (1 to 11).map(i => s"f$i.txt" -> "x".getBytes)
    intercept[IllegalStateException](
      ZipIngest.extractEntries(makeZip(many: _*), ZipIngest.Limits(maxFiles = 10)))
    intercept[IllegalStateException](
      ZipIngest.extractEntries(makeZip("big.txt" -> Array.fill(100)('x'.toByte)),
        ZipIngest.Limits(maxFileBytes = 50)))
    intercept[IllegalStateException](
      ZipIngest.extractEntries(makeZip("inner.zip" -> "PK".getBytes)))
    intercept[IllegalStateException](
      ZipIngest.extractEntries(
        makeZip("a.txt" -> Array.fill(60)('x'.toByte), "b.txt" -> Array.fill(60)('x'.toByte)),
        ZipIngest.Limits(maxTotalBytes = 100)))
  }

  test("distributed archive explode: good archives yield entries, bad ones one error row") {
    val dir = Files.createTempDirectory("graft-zips").toString
    val good = makeZip("x.txt" -> "data".getBytes)
    val bad = makeZip("nested.zip" -> "PK".getBytes)
    Files.write(Paths.get(dir, "good.zip"), good)
    Files.write(Paths.get(dir, "bad.zip"), bad)
    val out = ZipIngest.explodeArchives(spark, dir)
      .select("entry_name", "ok").as[(Option[String], Boolean)].collect().toSet
    assert(out == Set((Some("x.txt"), true), (None, false)))
  }

  test("job state machine: legal transitions, immutable terminals (jobs.py:254-313)") {
    import JobTracker._
    val j = Job("j1", Queued, 0, 0)
    val running = transition(j, Running, 100)
    assert(running.status == Running && running.heartbeatAt == 100)
    val done = transition(running, Succeeded, 200)
    assert(done.status == Succeeded)
    // terminal is immutable — the reference pins this with a guarded UPDATE
    assert(transition(done, Failed, 300) == done)
    assert(transition(done, Running, 300) == done)
    // queued can fail directly, running→queued is illegal
    assert(transition(Job("x", Queued, 0, 0), Failed, 10, Some("boom")).status == Failed)
    assert(transition(running, Queued, 300) == running)
  }

  test("heartbeat updates only running jobs") {
    import JobTracker._
    val running = Job("r", Running, heartbeatAt = 0, updatedAt = 0)
    assert(heartbeat(running, 500).heartbeatAt == 500)
    val queued = Job("q", Queued, heartbeatAt = 0, updatedAt = 0)
    assert(heartbeat(queued, 500).heartbeatAt == 0)
  }

  test("multimodal frame sampling emits one row per frame offset") {
    import graft.operators.Multimodal
    val df = Seq((1L, Array.fill[Byte](10)(1))).toDF("id", "bin")
    val out = Multimodal.sampleFrames(df, "bin", everyNBytes = 4)
      .select("frame_index", "frame_offset").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L), (1L, 4L), (2L, 8L))) // ceil(10/4) = 3 frames
  }

  test("stale reaper and TTL expiry (jobs.py:54-57,130-166)") {
    import JobTracker._
    val fresh = Job("a", Running, heartbeatAt = 900_000, updatedAt = 0)
    val stale = Job("b", Running, heartbeatAt = 0, updatedAt = 0)
    val reaped = reapStale(Seq(fresh, stale), now = 1_000_000)
    assert(reaped.find(_.id == "a").get.status == Running)
    val b = reaped.find(_.id == "b").get
    assert(b.status == Failed && b.error.exists(_.contains("stale")))
    val old = Job("c", Succeeded, 0, updatedAt = 0)
    val kept = Job("d", Running, 0, updatedAt = 0)
    assert(expire(Seq(old, kept), now = TtlS * 1000L + 1).map(_.id) == Seq("d"))
  }

  test("question apportioning is divmod round-robin (A7, testbed.py:242-246)") {
    assert(Testbed.apportion(7, 3) == Seq(3, 2, 2))
    assert(Testbed.apportion(2, 4) == Seq(1, 1, 0, 0))
    assert(Testbed.apportion(6, 3) == Seq(2, 2, 2))
  }
}
