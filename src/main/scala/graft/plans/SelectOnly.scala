package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

/** SELECT-only SQL guard for the NL2SQL execution surface.
  *
  * The reference validates NL2SQL-produced statements with a hand-written
  * comment/string-stripping tokenizer plus a CTE walk
  * (reference: src/server/app/embed/utils.py:35-70 `_is_select_only`).
  * On Spark we do it properly: parse to a `LogicalPlan` with the session
  * parser and reject anything that is a `Command` (DDL/DML/utility) or an
  * insert — a structural whitelist instead of a lexical one, immune to the
  * comment-smuggling edge cases the reference's tokenizer has to chase.
  */
object SelectOnly {

  def isSelectOnly(spark: SparkSession, sql: String): Boolean =
    try {
      val plan: LogicalPlan = spark.sessionState.sqlParser.parsePlan(sql)
      !plan.exists {
        case _: Command               => true
        case _: InsertIntoStatement   => true
        case _                        => false
      }
    } catch { case _: Exception => false }

  /** Run `sql` only if it is a pure query; otherwise throw.
    * (reference also wraps execution in SET TRANSACTION READ ONLY —
    * structurally unnecessary here since rejected plans never run.) */
  def runSelectOnly(spark: SparkSession, sql: String): org.apache.spark.sql.DataFrame = {
    require(isSelectOnly(spark, sql), s"only SELECT statements are allowed: $sql")
    spark.sql(sql)
  }

  /** Result-set cap: error (not truncate) past `maxRows`, mirroring
    * ResultSetTooLargeError at DEFAULT_MAX_ROWS=100000
    * (reference: database/sql.py:19-24, :91-107). Uses limit(n+1) so the
    * check reads at most n+1 rows, never the full result. */
  def executeCapped(spark: SparkSession, sql: String, maxRows: Int = 100000): org.apache.spark.sql.DataFrame = {
    val df = runSelectOnly(spark, sql)
    if (df.limit(maxRows + 1).count() > maxRows)
      throw new IllegalStateException(s"result set exceeds $maxRows rows")
    df
  }
}
