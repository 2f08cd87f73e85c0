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
}
