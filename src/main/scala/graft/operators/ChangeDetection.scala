package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental-refresh change detection.
  *
  * Classifies current source objects against the per-file aggregate of
  * already-processed chunks, exactly as the reference does for OCI bucket
  * refresh (reference: src/server/app/oci/bucket.py:152-181
  * `detect_changed_objects`):
  *   - object absent from processed       → NEW
  *   - etag differs OR time_modified differs → MODIFIED
  *   - legacy row (etag AND mtime both null)  → UNCHANGED (grandfathered)
  *   - otherwise                          → UNCHANGED
  * Processed rows with no current object → DELETED (stale; the reference
  * deletes their chunks, vector_store.py:239-245).
  *
  * Scale: one full-outer equi-join on the object name. The `processed` side
  * is already a per-file aggregate (one row per file, not per chunk —
  * the reference pushes that GROUP BY server-side for the same reason,
  * vector_store.py:379-396), so both sides are file-cardinality. At 100 TB
  * with ~10⁸ files this is a routine shuffled join; the chunk-cardinality
  * table is never shuffled.
  */
object ChangeDetection {

  /** `current`: (name, etag, time_modified); `processed`: (filename, etag,
    * time_modified) — one row per processed file. Returns (name, status). */
  def detectChanges(current: DataFrame, processed: DataFrame): DataFrame = {
    val cur = current.select(col("name"), lit(1).as("_cur_present"),
      col("etag").as("cur_etag"), col("time_modified").as("cur_mtime"))
    val proc = processed.select(col("filename").as("name"), lit(1).as("_proc_present"),
      col("etag").as("proc_etag"), col("time_modified").as("proc_mtime"))
    cur.join(proc, Seq("name"), "full_outer")
      .select(col("name"),
        when(col("_cur_present").isNull, "deleted")
          .when(col("_proc_present").isNull, "new")
          .when(col("proc_etag").isNull && col("proc_mtime").isNull, "unchanged") // legacy rows
          .when(coalesce(col("cur_etag") =!= col("proc_etag"), lit(false)) ||
                coalesce(col("cur_mtime") =!= col("proc_mtime"), lit(false)), "modified")
          .otherwise("unchanged").as("status"))
  }

  /** SCD Type-2 INCREMENTAL MERGE: apply a batch of later change events
    * to a persisted interval table without rebuilding history — the
    * dimension-maintenance twin of the q185 aggregate-maintenance proof
    * (merge(state, delta) ≡ rebuild(all), and the oracle gate computes
    * the rebuild). `state` is a (key, attr, valid_from, valid_to,
    * is_current) interval table; `deltaEvents` are raw (key, event_id,
    * ts, attr) rows ALL later than every state row (the ingest-cutoff
    * contract).
    *
    * Three pieces, none touching closed history: closed state rows pass
    * through untouched (at 100 TB that is the whole point — history is
    * immutable and never rewritten), each key's open interval closes at
    * the key's first delta timestamp (one tiny per-key aggregate,
    * broadcast-joined onto the current rows only), and the delta builds
    * its own intervals with the same lead window. */
  def scd2Merge(state: DataFrame, deltaEvents: DataFrame,
                keyCol: String = "user_id", attrCol: String = "event_type",
                tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(tsCol, tieCol)
    val deltaIv = deltaEvents
      .select(col(keyCol), col(attrCol),
        col(tsCol).cast("timestamp_ntz").as("valid_from"),
        lead(col(tsCol), 1).over(w).cast("timestamp_ntz").as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
    val firstDelta = deltaEvents.groupBy(col(keyCol))
      .agg(min(col(tsCol).cast("timestamp_ntz")).as("_fd"))
    val cols = Seq(keyCol, attrCol, "valid_from", "valid_to", "is_current")
    val closedPass = state.filter(!col("is_current"))
      .select(cols.map(col): _*)
    val currentFixed = state.filter(col("is_current"))
      .join(broadcast(firstDelta), Seq(keyCol), "left")
      .select(col(keyCol), col(attrCol), col("valid_from"),
        coalesce(col("_fd"), col("valid_to")).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
    closedPass.unionByName(currentFixed).unionByName(deltaIv.select(cols.map(col): _*))
  }

  /** Partial aggregate state for incremental view maintenance: per group,
    * the algebraic tuple (n, Σv as exact decimal, min, max) that a batch
    * contributes to a materialized rollup. States from any number of
    * batches [[mergeAggStates]]-fold into the state a full recompute
    * would produce — so yesterday's 100 TB never rescans; only the new
    * batch aggregates. One map-side-combinable groupBy per batch. */
  def aggState(df: DataFrame, groupCols: Seq[String],
               vCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(vCol).cast("decimal(38,0)")).as("sv"),
        min(col(vCol)).as("mn"),
        max(col(vCol)).as("mx"))

  /** CDC changelog application — the lakehouse MERGE a stream of
    * (key, version, op, payload…) rows compacts to: per key, the row
    * with the LEXICOGRAPHICALLY greatest (version, op, payload…) wins
    * (struct-max: one hash aggregate with map-side partials, and the
    * full-struct tie-break makes duplicate versions deterministic — the
    * as-of-join lesson), and a key whose winning op is `delete` leaves
    * the table. Unlike replaying the log row-by-row, this applies a
    * whole backlog in ONE aggregate — the catch-up path after an outage
    * — and columns must be non-null for the struct ordering to be total.
    * Returns the final state: (key, version, op, payload…). */
  def applyChangelog(log: DataFrame, keyCol: String, versionCol: String,
                     opCol: String, deleteOp: String = "delete"): DataFrame = {
    val payload = log.columns.filterNot(Set(keyCol, versionCol, opCol))
    val packed = log.groupBy(col(keyCol))
      .agg(max(struct(col(versionCol) +: col(opCol) +:
        payload.map(col): _*)).as("_last"))
    packed.filter(col(s"_last.$opCol") =!= deleteOp)
      .select(col(keyCol) +: col(s"_last.$versionCol").as(versionCol) +:
        col(s"_last.$opCol").as(opCol) +:
        payload.map(c => col(s"_last.$c").as(c)): _*)
  }

  /** Merge [[aggState]] frames (associative + commutative: n and sv add,
    * min/max fold), returning the same state schema plus the served
    * `mean`. Union of state-cardinality frames, one groupBy — the
    * incremental-refresh path for every SUM/COUNT/MIN/MAX/AVG dashboard
    * a pipeline maintains. */
  def mergeAggStates(states: Seq[DataFrame],
                     groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeAggStates: no states")
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("n").as("n"), sum("sv").cast("decimal(38,0)").as("sv"),
        min("mn").as("mn"), max("mx").as("mx"))
      .withColumn("mean", col("sv").cast("double") / col("n"))
  }
}
