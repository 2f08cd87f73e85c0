package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("tumbling window aggregates run identically in batch mode") {
    val df = Seq(
      (ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(61), "click", 4.0))
      .toDF("ts", "event_type", "value")
    val out = EventStreams.tumblingCounts(df, "1 hour")
      .select("event_type", "n", "sum_value")
      .as[(String, Long, Double)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq == Seq(1L, 2L))
    assert(out.map(_._3).toSet == Set(3.0, 4.0))
  }

  test("watermark boundary is INCLUSIVE: wm == window end emits the window " +
       "and drops late rows into it (the q524 oracle's exact drop rule)") {
    // hour-aligned base so window ends are whole milliseconds
    def hts(min: Int, ms: Int = 0): Timestamp =
      new Timestamp(1700000000000L - (1700000000000L % 3600000L) +
        min * 60000L + ms)
    val out = EventStreams.replayWatermarkedTumbling(spark, Seq(
        // batch 0: window [0,60) gets one row; max ts 90:00.000 makes
        // the NEXT watermark exactly 60:00.000 == that window's end
        Seq((hts(5), "a", 1L), (hts(90), "b", 1L)),
        // batch 1: a late row into [0,60) while wm EQUALS its end —
        // must be dropped (inclusive <=), not merged
        Seq((hts(10), "a", 100L)),
        // batch 2: advance wm past everything so open windows flush
        Seq((hts(300), "c", 1L)))
      , "1 hour", "30 minutes")
      // session tz is UTC, so casting the ntz output back is lossless
      .select(col("window_start").cast("timestamp"), col("event_type"),
        col("n"), col("sum_cents"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    val h0 = hts(0).getTime
    assert(out == Set(
      (h0, "a", 1L, 1L),            // emitted at wm == end, late 100 dropped
      (h0 + 3600000L, "b", 1L, 1L)  // flushed by the final advance
    ), out.toString)
  }

  test("streaming tumbling window with watermark produces same aggregates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamed = EventStreams.tumblingCountsStream(
      mem.toDF.toDF("ts", "event_type", "value"), "1 hour", "10 minutes")
    val q = streamed.writeStream.format("memory")
      .queryName("tumbling_test").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0))
      mem.addData((ts(200), "click", 9.0)) // advances watermark past hour 0
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .select("event_type", "n", "sum_value")
        .as[(String, Long, Double)].collect()
      assert(rows.contains(("click", 2L, 3.0))) // hour-0 window finalized
    } finally q.stop()
  }

  test("windowed aggregate streams end-to-end into a parquet sink " +
       "(watermark finalizes windows in append mode)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = java.nio.file.Files.createTempDirectory("graft-winsink").toString
    val src = dir + "/src"; val out = dir + "/out"; val ckpt = dir + "/ckpt"
    val events = Seq(
      (ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(30), "view", 5.0),
      (ts(61), "click", 4.0), (ts(200), "click", 9.0))
      .toDF("ts", "event_type", "value")
    events.write.parquet(src)

    val streamed = EventStreams.tumblingCountsStream(
      spark.readStream.schema(events.schema).parquet(src), "1 hour", "10 minutes")
    val q = streamed.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000); q.stop()

    // append mode emits exactly the windows whose end precedes the final
    // watermark (max event time - delay) — replay that cut in batch
    val watermark = ts(200).getTime - 10 * 60000L
    val expected = EventStreams.tumblingCounts(events, "1 hour")
      .filter(col("window_end") <= new Timestamp(watermark).toString)
      .select("event_type", "n", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    val sunk = spark.read.parquet(out)
      .select("event_type", "n", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(sunk == expected)
    assert(sunk.contains(("click", 2L, 3.0)) && sunk.contains(("view", 1L, 5.0)))
  }

  test("sessionization: batch gaps-and-islands semantics") {
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0),  // session 1 (gap 10m < 30m)
      (1L, ts(100), 3.0),                   // session 2
      (2L, ts(0), 5.0))                     // user 2, one session
      .toDF("user_id", "ts", "value")
    val out = EventStreams.sessionizeBatch(df, 30 * 60 * 1000L)
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 1L, 3.0), (1L, 2L, 3.0), (2L, 1L, 5.0)))
  }

  test("sessionization: streaming flatMapGroupsWithState closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventStreams.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L)
    val q = sessions.writeStream.format("memory")
      .queryName("session_test").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(1, ts(0), 1L, "click", 1.0), Event(2, ts(10), 1L, "click", 2.0))
      q.processAllAvailable()
      // jump far ahead: watermark passes session 1's timeout → emitted
      mem.addData(Event(3, ts(600), 1L, "click", 3.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(1200), 1L, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .select("user_id", "n_events", "sum_value").as[(Long, Int, Double)].collect()
      assert(rows.contains((1L, 2, 3.0))) // first session: 2 events, sum 3.0
    } finally q.stop()
  }

  test("replayDedupEviction: within/cross-batch dedup, watermark eviction " +
       "re-emits, re-added batch drops against live state") {
    def hts(min: Long): Timestamp =
      new Timestamp(1700000000000L - (1700000000000L % 3600000L) +
        min * 60000L)
    def run(batches: Seq[Seq[(Timestamp, Long)]], delay: String) =
      EventStreams.replayDedupEviction(spark, batches, delay)
        .groupBy("k").count().as[(Long, Long)].collect().toMap
    // key 1 duplicated within batch 1 AND re-added in batch 3 after the
    // tick evicted its state; batch 4 re-adds batch 3 verbatim while the
    // fresh state is live → dropped
    val b1 = Seq((hts(0), 1L), (hts(5), 1L), (hts(10), 2L))
    val tick = Seq((hts(24 * 60), 99L))
    val b3 = Seq((hts(25 * 60), 1L), (hts(25 * 60 + 5), 2L))
    assert(run(Seq(b1, tick, b3, b3), "45 minutes") ==
      Map(1L -> 2L, 2L -> 2L, 99L -> 1L))
    // no eviction inside the delay window: a cross-batch duplicate is
    // dropped (state survives the micro-batch boundary)
    val c1 = Seq((hts(0), 7L))
    val c2 = Seq((hts(10), 7L), (hts(10), 8L))
    assert(run(Seq(c1, c2), "2 hours") == Map(7L -> 1L, 8L -> 1L))
  }

  test("replaySessionTimeout: timeout boundary is STRICT (wm must pass " +
      "last + gap), tails stay unemitted, gap closes ride along") {
    // gap 1000 ms, sessionize's fixed 10-minute watermark delay.
    // user 1 has ONE event at T0; a clock user advances the watermark.
    val t0 = 1700000000000L
    val gap = 1000L
    val delay = 600000L
    def ev(id: Long, u: Long, t: Long) =
      Event(id, new Timestamp(t), u, "click", 1.0)
    // scenario A: final wm lands EXACTLY on t0 + gap → timeout must
    // NOT fire (strict), nothing is emitted at all
    val a = EventStreams.replaySessionTimeout(spark, Seq(
      Seq(ev(1, 1L, t0)),
      Seq(ev(2, 99L, t0 + gap + delay))), gap)
    assert(a.count() == 0L)
    // scenario B: one ms past the boundary → user 1's session emits
    // via TIMEOUT (no successor event exists for user 1)
    val b = EventStreams.replaySessionTimeout(spark, Seq(
      Seq(ev(1, 1L, t0)),
      Seq(ev(2, 99L, t0 + gap + delay + 1))), gap)
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Int, Double)].collect().toSet
    assert(b == Set((1L, 1, 1.0)))
    // scenario C: a successor INSIDE the gap joins the session; one
    // OUTSIDE closes it inline (emitted regardless of the watermark)
    val c = EventStreams.replaySessionTimeout(spark, Seq(
      Seq(ev(1, 1L, t0), ev(2, 1L, t0 + gap)),   // joins (gap inclusive)
      Seq(ev(3, 1L, t0 + 10 * gap))),            // closes inline
      gap)
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Int, Double)].collect().toSet
    assert(c == Set((1L, 2, 2.0)))
  }

  test("replayOuterAttribution: outer rows emit only when the two-stream " +
      "watermark STRICTLY passes imp + within; matches emit regardless") {
    val t0 = 1700000000000L
    val within = 3600000L  // 1 hour
    val delay = 600000L    // 10 minutes (matches the helper arg below)
    def its(t: Long) = new Timestamp(t)
    // scenario A: both streams' clocks land the min-watermark EXACTLY
    // on t0 + within → impression 1 must NOT be evicted (strict): no
    // rows at all (clock keys never match; clock imps never evict —
    // eviction needs wm > their own max ts − delay + within)
    val a = EventStreams.replayOuterAttribution(spark,
      Seq(Seq((its(t0), 1L)), Seq((its(t0 + within + delay), 998L))),
      Seq(Seq(), Seq((its(t0 + within + delay), 999L, 5L))),
      within = "1 hour", delay = "10 minutes")
    assert(a.count() == 0L)
    // scenario B: one ms past the boundary → the null-padded outer row
    // for impression 1 emits, exactly once
    val b = EventStreams.replayOuterAttribution(spark,
      Seq(Seq((its(t0), 1L)), Seq((its(t0 + within + delay + 1), 998L))),
      Seq(Seq(), Seq((its(t0 + within + delay + 1), 999L, 5L))),
      within = "1 hour", delay = "10 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(b.toSeq == Seq((1L, its(t0), None, -1L)))
    // scenario C: a matching click emits the pair immediately (long
    // before any eviction), and no null row ever appears for it
    val c = EventStreams.replayOuterAttribution(spark,
      Seq(Seq((its(t0), 1L)), Seq((its(t0 + within + delay + 1), 998L))),
      Seq(Seq((its(t0 + 1000), 1L, 7L)),
        Seq((its(t0 + within + delay + 1), 999L, 5L))),
      within = "1 hour", delay = "10 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)), if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(c.toSeq == Seq((1L, its(t0), Some(its(t0 + 1000)), 7L)))
  }

  test("streaming dedup: dropDuplicatesWithinWatermark keeps one row per event id") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val deduped = mem.toDF.toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(0), 1.0), (1L, ts(1), 1.0), (2L, ts(2), 2.0))
      q.processAllAvailable()
      mem.addData((2L, ts(3), 2.0), (3L, ts(4), 3.0)) // id 2 still within watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream join: clicks attribute to impressions within the range, " +
       "identical result in batch mode") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val joined = EventStreams.attributeClicks(
      imps.toDF.toDF("ad_id", "imp_ts"),
      clicks.toDF.toDF("click_ad", "click_ts", "click_val"),
      within = "45 minutes", delay = "10 minutes")
    val q = joined.writeStream.format("memory")
      .queryName("attrib_test").outputMode(OutputMode.Append()).start()
    try {
      imps.addData((7L, ts(0)), (8L, ts(0)))
      clicks.addData((7L, ts(30), 1.5), // 30 min after ad 7's impression — in range
        (7L, ts(300), 9.9), // 5 hours later — outside the range
        (9L, ts(10), 2.0)) // no matching impression
      q.processAllAvailable()
      val rows = spark.table("attrib_test")
        .select("ad_id", "click_val").as[(Long, Double)].collect().toSeq
      assert(rows == Seq((7L, 1.5)))
    } finally q.stop()

    // the SAME operator runs in batch mode with identical semantics
    val batch = EventStreams.attributeClicks(
      Seq((7L, ts(0)), (8L, ts(0))).toDF("ad_id", "imp_ts"),
      Seq((7L, ts(30), 1.5), (7L, ts(300), 9.9), (9L, ts(10), 2.0))
        .toDF("click_ad", "click_ts", "click_val"),
      within = "45 minutes", delay = "10 minutes")
      .select("ad_id", "click_val").as[(Long, Double)].collect().toSeq
    assert(batch == Seq((7L, 1.5)))
  }

  test("foreachBatch-style incremental refresh: only changed files re-embedded " +
       "(reference refresh.py:28-143)") {
    import graft.store.VectorStore
    val root = java.nio.file.Files.createTempDirectory("graft-refresh").toString
    val initial = Seq(
      ("a_0", "alpha", Map("filename" -> "a", "etag" -> "e-a", "time_modified" -> "t1"), Seq(1.0f)),
      ("b_0", "beta", Map("filename" -> "b", "etag" -> "e-b", "time_modified" -> "t1"), Seq(1.0f)))
      .toDF("id", "text", "metadata", "embedding")
    VectorStore.write(initial, root, "R1", "{}")
    // b modified (new etag), c new, a unchanged
    val listing = Seq(
      ("a", "e-a", "t1"), ("b", "e-b2", "t1"), ("c", "e-c", "t1"))
      .toDF("name", "etag", "time_modified")
    val counts = EventStreams.refreshBatch(spark, root, "R1", listing,
      changed => changed.select(
        concat(col("name"), lit("_0")).as("id"),
        concat(lit("text-"), col("name")).as("text"),
        map(lit("filename"), col("name"), lit("etag"), col("etag"),
          lit("time_modified"), col("time_modified")).as("metadata"),
        array(lit(2.0f)).as("embedding")))
    assert(counts == Map("unchanged" -> 1L, "modified" -> 1L, "new" -> 1L))
    val after = VectorStore.read(spark, root, "R1")
    assert(after.count() == 3) // a_0 untouched, b_0 re-embedded, c_0 added
    val bText = after.filter(col("id") === "b_0").select("text").as[String].head()
    assert(bText == "text-b") // modified file's chunk was replaced
  }

  test("z-score filter runs on a stream against a static broadcast profile") {
    implicit val sqlCtx = spark.sqlContext
    // profile: mean 12, σ = 6 (nine 10s + one 30, as in StatsSpec)
    val profile = (Seq.fill(9)(10.0) :+ 30.0).map(v => ("g", v)).toDF("g", "v")
    val mem = MemoryStream[(String, Double)]
    val flagged = graft.operators.Stats.zscoreAnomaliesAgainst(
      mem.toDF.toDF("g", "v"), profile, "g", "v", 2.0)
    val q = flagged.writeStream.format("memory").queryName("anomaly_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(("g", 11.0), ("g", 40.0), ("g", 23.0), ("g", 25.0))
      q.processAllAvailable()
      val hits = spark.table("anomaly_test").select("v", "z")
        .as[(Double, Double)].collect().toMap
      // |z| > 2 ⇔ outside 12 ± 12 → only 40 (z = 28/6); 25 is z ≈ 2.17
      assert(hits.keySet == Set(40.0, 25.0))
      assert(math.abs(hits(40.0) - 28.0 / 6) < 1e-12)
    } finally q.stop()
  }

  test("retention cohorts match a hand-computed engagement matrix") {
    // week length = 7 days; user 1 seen weeks 0 and 1, user 2 week 0 only,
    // user 3 joins week 1
    def wk(week: Int, day: Int) =
      new Timestamp((week * 7L + day) * 86400000L)
    val ev = Seq(
      (1L, wk(0, 1)), (1L, wk(0, 2)), (1L, wk(1, 0)),
      (2L, wk(0, 3)), (3L, wk(1, 4))).toDF("user_id", "ts")
    val r = graft.streaming.EventStreams.retentionCohorts(ev)
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(r == Seq(
      (0, 0, 2L, 1.0),   // cohort week 0: both users present
      (0, 1, 1L, 0.5),   // only user 1 returns in week 1
      (1, 0, 1L, 1.0)))  // cohort week 1: user 3
  }

  test("streaming sequence packing matches the batch operator across batches") {
    import graft.streaming.EventStreams.{PackAssign, PackDoc}
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      PackDoc("en", 1L, 800L), PackDoc("en", 2L, 900L), PackDoc("en", 3L, 700L),
      PackDoc("en", 4L, 2500L), PackDoc("de", 1L, 1999L), PackDoc("de", 2L, 1L))
    val mem = MemoryStream[PackDoc]
    val q = EventStreams.packSequencesStream(mem.toDS(), budget = 2000L)
      .writeStream.format("memory").queryName("pack_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // per-shard in-order delivery split across two micro-batches: the
      // cursor must carry over the batch boundary
      mem.addData(docs.take(3))
      q.processAllAvailable()
      mem.addData(docs.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("pack_test").as[PackAssign].collect()
        .map(p => (p.shard, p.doc_id) -> ((p.pack_id, p.spans_boundary))).toMap
      val batch = graft.operators.Chunker.packSequences(
          docs.toDF("shard", "doc_id", "tokens"), "shard", "doc_id", "tokens", 2000L)
        .select(col("shard"), col("doc_id"), col("pack_id"), col("spans_boundary"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getInt(2), r.getBoolean(3)))).toMap
      assert(streamed == batch)
      // state is one cursor per shard: doc 4 lands after 800+900+700=2400
      // tokens → pack 1, and crosses into pack 2 (2400+2500-1 div 2000)
      assert(streamed(("en", 4L)) == ((1, true)))
      assert(streamed(("de", 2L)) == ((0, false))) // token 1999 fills pack 0 exactly
    } finally q.stop()
  }

  test("streaming dedup probe: later batches see earlier batches' signatures") {
    import graft.operators.Dedup
    import graft.streaming.EventStreams
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val dir = java.nio.file.Files.createTempDirectory("graft_sigs").toFile
    val path = s"${dir.getAbsolutePath}/sigs"
    // bootstrap the store with the seed corpus's signatures (batch=-1)
    val seed = Seq((1L, base), (2L, "completely unrelated text about spark plans"))
      .toDF("doc_id", "text")
    Dedup.bandSignatures(seed, "doc_id", "text")
      .select(col("id").cast("long").as("id"), col("sig"),
        col("band_idx"), col("band_hash"))
      .write.parquet(s"$path/batch=-1")
    // batch 1: one near-dup of doc 1 + one fresh doc
    val batch1 = Seq((10L, base + "!"), (11L, "fresh doc with its own words entirely"))
      .toDF("doc_id", "text")
    val b1 = EventStreams.dedupProbeBatch(spark, path, batch1, 1L, "doc_id", "text")
    assert(b1.map(t => (t._1, t._2)) == Seq((10L, 1L)))
    // batch 2: a near-dup of BATCH 1's doc 11 — only visible because the
    // probe persisted batch 1's signatures into the store
    val batch2 = Seq((20L, "fresh doc with its own words entirely?"))
      .toDF("doc_id", "text")
    val b2 = EventStreams.dedupProbeBatch(spark, path, batch2, 2L, "doc_id", "text")
    assert(b2.map(t => (t._1, t._2)) == Seq((20L, 11L)))
    // at-least-once REPLAY of batch 2 (same batchId): identical result —
    // no self-matches against its own first attempt, no double-append
    val b2replay = EventStreams.dedupProbeBatch(spark, path, batch2, 2L, "doc_id", "text")
    assert(b2replay == b2)
    // and a replay of batch 1 still cannot see batch 2 pairs change
    val b1replay = EventStreams.dedupProbeBatch(spark, path, batch1, 1L, "doc_id", "text")
    assert(b1replay.map(t => (t._1, t._2)).contains((10L, 1L)))
    assert(!b1replay.exists(t => t._1 == t._2), "self-match leaked through replay")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("multiTouchAttribution: hand-computed linear and U-shaped credits") {
    import java.sql.Timestamp
    def ts(min: Long) = new Timestamp(min * 60000L)
    // user 1: purchase at t=100min with 3 prior views (t=10, 20, 30)
    //   linear: 333333 each; position: 400000, 200000, 400000
    // user 2: purchase at t=50 with 1 view (t=40): both models 1000000
    // user 3: view outside the 7-day window -> no credit
    val rows = Seq(
      (1L, 101L, ts(100), "purchase"), (1L, 1L, ts(10), "view"),
      (1L, 2L, ts(20), "view"), (1L, 3L, ts(30), "view"),
      (2L, 102L, ts(50), "purchase"), (2L, 4L, ts(40), "view"),
      (3L, 103L, ts(20000), "purchase"), (3L, 5L, ts(1), "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.streaming.EventStreams
      .multiTouchAttribution(rows, "purchase", "view", windowDays = 7)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // all lags are 0 days; totals: linear 3*333333 + 1000000,
    // position 400000+200000+400000 + 1000000
    assert(out == Map(0L -> ((4L, 1999999L, 2000000L))))
  }

  test("concurrencyPeak: closed intervals, starts count before ends") {
    import org.apache.spark.sql.functions._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // [1,10] [2,5] [3,4] → all three open at t=3; [20,21] [21,22] touch
    // at t=21 (closed) → 2, but the global peak is 3 at t=3
    val sess = Seq((ts(1), ts(10)), (ts(2), ts(5)), (ts(3), ts(4)),
        (ts(20), ts(21)), (ts(21), ts(22)))
      .toDF("session_start", "session_end")
    val out = graft.streaming.EventStreams.concurrencyPeak(sess).collect().head
    assert(out.getLong(0) == 5L)
    assert(out.getLong(1) == 3L)
    assert(out.getTimestamp(2) == ts(3))
  }

  test("latenessAudit PREDICTS the rows a watermarked streaming agg drops") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    // arrival order: 100', 200', 50' (150' late), 210', flush at 500'.
    // delay 60': after 200' arrives the watermark is 140' > 50' →
    // streaming must DROP the 50' event; nothing else is late enough
    val arrivals = Seq(t(100), t(200), t(50), t(210), t(500))
    val audit = graft.streaming.EventStreams.latenessAudit(
        arrivals.zipWithIndex.map { case (x, i) => (i.toLong, x) }
          .toDF("event_id", "ts"),
        Seq(60L * 60000L))
      .collect().head
    assert(audit.getLong(2) == 1L) // predicted drops
    val mem = MemoryStream[Timestamp]
    val agg = mem.toDF.toDF("ts").withWatermark("ts", "60 minutes")
      .groupBy(window(col("ts"), "10 minutes")).count()
    val q = agg.writeStream.format("memory").queryName("late_pred")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      // one arrival per micro-batch = the audit's running-max model
      arrivals.foreach { x => mem.addData(x); q.processAllAvailable() }
      val counted = spark.table("late_pred")
        .agg(sum("count")).as[Long].collect().head
      // 4 of 5 events survive into finalized windows (500' not yet
      // finalized but also not dropped; count only closed windows +
      // verify the dropped one): windows for 100/200/210 hold 3 events
      assert(counted == 3L)
      assert(arrivals.length - 1 - audit.getLong(2) == counted)
    } finally q.stop()
  }

  test("latenessAudit: drops counted against the arrival-order high-water mark") {
    import org.apache.spark.sql.functions._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // arrival by event_id; event times 600, 610, 605, 540 minutes →
    // lateness 0, 0, 5 min, 70 min
    val ev = Seq((1L, ts(600)), (2L, ts(610)), (3L, ts(605)), (4L, ts(540)))
      .toDF("event_id", "ts")
    val out = graft.streaming.EventStreams
      .latenessAudit(ev, Seq(60000L, 3600000L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(60000L) == ((4L, 2L)))   // 5 min and 70 min both late
    assert(out(3600000L) == ((4L, 1L))) // only the 70 min straggler
  }

  test("liftTable: perfect top-half classifier has lift 2 then decays to 1") {
    import org.apache.spark.sql.functions._
    val scored = (1 to 10).map(i => (i.toLong, (11 - i).toDouble, i <= 5))
      .toDF("id", "score", "label")
    val out = graft.operators.Evaluation
      .liftTable(scored, "id", "score", "label", buckets = 5)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.forall(_._2 == 2L)) // equal buckets
    // top buckets all-positive → lift 2.0; full population → 1.0
    assert(out.head == ((1L, 2L, 2L, 2L, 2L, 2.0)))
    assert(out(2) == ((3L, 2L, 1L, 6L, 5L, 5.0 * 10 / (6 * 5))))
    assert(out.last == ((5L, 2L, 0L, 10L, 5L, 1.0)))
  }

  test("shapleyAttribution: single-channel credit is whole; efficiency holds") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    def ev(id: Long, u: Long, t: String) =
      (id, Timestamp.valueOf("2024-01-01 00:00:00"), u, t)
    // user 1: click → purchase (click alone explains it)
    // user 2: click + view → purchase (split between click and view)
    // user 3: view, no purchase (adds nothing to any coalition)
    val rows = Seq(ev(1, 1, "click"), ev(2, 1, "purchase"),
      ev(3, 2, "click"), ev(4, 2, "view"), ev(5, 2, "purchase"),
      ev(6, 3, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.streaming.EventStreams
      .shapleyAttribution(rows, "purchase", Seq("click", "view"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // k=2, k! = 2: v({c}) = 1, v({v}) = 0, v({c,v}) = 2
    // φ_click·2 = 1·(1−0) + 1·(2−0) = 3; φ_view·2 = 0 + 1·(2−1) = 1
    assert(out("click") == 3L && out("view") == 1L)
    // efficiency: Σ φ·k! = k!·v(C) = 2·2
    assert(out.values.sum == 4L)
  }

  test("RocksDB state store: sessionization and stream dedup identical under both providers") {
    implicit val sqlCtx = spark.sqlContext
    // the provider is an execution choice, never a semantics choice: the
    // exact same inputs must yield the exact same sessions and deduped
    // rows under HDFSBacked (default) and RocksDB — the 100 TB backend
    // for unbounded keyed state (see EventStreams.RocksDbProvider)
    def runSessionize(): Set[(Long, Int, Double)] = {
      val mem = MemoryStream[Event]
      val q = EventStreams.sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L)
        .writeStream.format("memory")
        .queryName("rocksdb_sess").outputMode(OutputMode.Append()).start()
      try {
        mem.addData(Event(1, ts(0), 1L, "click", 1.0),
          Event(2, ts(10), 1L, "click", 2.0), Event(3, ts(5), 2L, "view", 5.0))
        q.processAllAvailable()
        mem.addData(Event(4, ts(600), 1L, "click", 3.0),
          Event(5, ts(610), 2L, "view", 7.0))
        q.processAllAvailable()
        mem.addData(Event(6, ts(1200), 1L, "click", 4.0))
        q.processAllAvailable()
        spark.table("rocksdb_sess")
          .select("user_id", "n_events", "sum_value")
          .as[(Long, Int, Double)].collect().toSet
      } finally q.stop()
    }
    def runDedup(): Seq[Long] = {
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val q = mem.toDF.toDF("event_id", "ts", "value")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("memory")
        .queryName("rocksdb_dedup").outputMode(OutputMode.Append()).start()
      try {
        mem.addData((1L, ts(0), 1.0), (1L, ts(1), 1.0), (2L, ts(2), 2.0))
        q.processAllAvailable()
        mem.addData((2L, ts(3), 2.0), (3L, ts(4), 3.0))
        q.processAllAvailable()
        spark.table("rocksdb_dedup").select("event_id")
          .as[Long].collect().sorted.toSeq
      } finally q.stop()
    }
    val (sessDefault, dedupDefault) = (runSessionize(), runDedup())
    val (sessRocks, dedupRocks) =
      EventStreams.withStateStoreProvider(spark, EventStreams.RocksDbProvider) {
        // RocksDB actually bound? the conf must be visible to the query
        assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
          .contains("RocksDB"))
        (runSessionize(), runDedup())
      }
    assert(sessRocks == sessDefault && sessDefault.nonEmpty)
    assert(dedupRocks == dedupDefault && dedupDefault == Seq(1L, 2L, 3L))
    // provider restored for the rest of the shared-session suites
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").exists(_.contains("RocksDB")))
  }
}
