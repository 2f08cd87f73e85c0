package graft.streaming

/** Background-job state machine (reference ST2).
  *
  * Mirrors the `aio_embed_jobs` lifecycle invariants
  * (reference: src/server/app/embed/jobs.py:54-57 defaults; :188-313
  * guarded transitions, heartbeat, stale reaper, TTL):
  *  - queued → running → succeeded | failed; terminal states immutable
  *  - a running job must heartbeat every `heartbeatS`; one unseen for
  *    `reapAfterS` is reaped to failed("stale")
  *  - terminal jobs older than `ttlS` are deleted.
  *
  * Kept as pure transition functions over an immutable job map so the exact
  * SQL-guard semantics the reference pins in its tests (e.g. terminal
  * UPDATE no-ops) are unit-testable; persistence is a plain DataFrame/
  * parquet append of the resulting rows. Spark's own listener/commit
  * machinery replaces the reference's HA plumbing (SURVEY §7.4).
  */
object JobTracker {

  val HeartbeatS = 30   // jobs.py:54
  val ReapAfterS = 180  // jobs.py:55
  val TtlS = 3600       // jobs.py:56

  sealed trait Status { def terminal: Boolean = false }
  case object Queued extends Status
  case object Running extends Status
  case object Succeeded extends Status { override def terminal = true }
  case object Failed extends Status { override def terminal = true }

  case class Job(id: String, status: Status, heartbeatAt: Long, updatedAt: Long,
                 error: Option[String] = None)

  /** Guarded transition: terminal states never change (the reference
    * enforces this with a guarded UPDATE — jobs.py:254-313). Returns the
    * job unchanged when the transition is illegal. */
  def transition(job: Job, to: Status, now: Long, error: Option[String] = None): Job =
    (job.status, to) match {
      case (s, _) if s.terminal => job
      case (Queued, Running) => job.copy(status = Running, heartbeatAt = now, updatedAt = now)
      case (Running, Succeeded) => job.copy(status = Succeeded, updatedAt = now)
      case (Running, Failed) => job.copy(status = Failed, updatedAt = now, error = error)
      case (Queued, Failed) => job.copy(status = Failed, updatedAt = now, error = error)
      case _ => job
    }

  def heartbeat(job: Job, now: Long): Job =
    if (job.status == Running) job.copy(heartbeatAt = now) else job

  /** Reap running jobs with no heartbeat for `reapAfterS` (jobs.py:130-166). */
  def reapStale(jobs: Seq[Job], now: Long, reapAfterS: Int = ReapAfterS): Seq[Job] =
    jobs.map { j =>
      if (j.status == Running && now - j.heartbeatAt > reapAfterS * 1000L)
        j.copy(status = Failed, updatedAt = now, error = Some("stale: heartbeat lost"))
      else j
    }

  /** Drop terminal jobs past TTL (jobs.py: TTL delete). */
  def expire(jobs: Seq[Job], now: Long, ttlS: Int = TtlS): Seq[Job] =
    jobs.filterNot(j => j.status.terminal && now - j.updatedAt > ttlS * 1000L)
}
