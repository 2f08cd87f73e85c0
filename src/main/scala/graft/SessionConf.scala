package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Scoped, session-local SQLConf overrides — the ONE definition of the
  * `spark.sql.shuffle.partitions` override previously duplicated in
  * GraphAnalytics and EventStreams, carrying the shared contract.
  *
  * CONTRACT — single-threaded session use: a `spark.conf.set` override is
  * SESSION-GLOBAL for its duration, so any query planned CONCURRENTLY on
  * the same SparkSession silently inherits the overridden value. Every
  * caller in this engine is a sequential driver (Verify, Bench and the
  * specs run queries one at a time on one session); a multi-threaded
  * server must either skip the override or plan its work on
  * `spark.newSession()` (SQLConf is per-session, the SparkContext is
  * shared).
  *
  * Why the override exists at all:
  *   - BOUNDED graph frames (contracted gate graphs, frontier-sized BFS
  *     steps): fewer map tasks trim per-step scheduling overhead that
  *     AQE's reduce-side coalescing cannot reach; corpus-scale frames
  *     pass `None`.
  *   - Streaming replays: a streaming query binds its STATE-STORE
  *     partition count to this setting at start, and the bounded replay
  *     instruments pay per-partition store setup/commit on EVERY
  *     micro-batch (measured: a stream-stream join burned ~30 s of pure
  *     store machinery on a 1,500-row replay at 32 partitions, ~3 s at
  *     4). Queries already running keep their own binding.
  *
  * The single-threaded contract is ENFORCED, not just documented: a
  * second thread entering an override on a session that another thread
  * currently holds would corrupt the save/restore pair (the restore
  * race), so that case throws immediately. Same-thread nesting is fine —
  * restores unwind in LIFO order.
  */
object SessionConf {

  private val ShuffleKey = "spark.sql.shuffle.partitions"

  /** session (identity) -> thread currently holding an override, if any.
    * SparkSession does not override equals, so keys compare by identity;
    * entries are removed on exit, so nothing pins a session. */
  private val holders = new ConcurrentHashMap[SparkSession, Thread]()

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n` (restored after, even on throw). `None` runs `body` unchanged. */
  def withShufflePartitions[A](spark: SparkSession, n: Option[Int])(body: => A): A =
    n match {
      case None => body
      case Some(p) => withShufflePartitions(spark, p)(body)
    }

  def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val me = Thread.currentThread()
    val prev = holders.putIfAbsent(spark, me)
    val nested = prev eq me
    if (prev != null && !nested)
      throw new IllegalStateException(
        "withShufflePartitions: this session already has an active override " +
          s"held by thread '${prev.getName}' — the override is session-global; " +
          "concurrent callers must use spark.newSession() (see SessionConf contract)")
    val old = spark.conf.get(ShuffleKey)
    spark.conf.set(ShuffleKey, n.toString)
    try body
    finally {
      spark.conf.set(ShuffleKey, old)
      if (!nested) holders.remove(spark, me)
    }
  }
}
