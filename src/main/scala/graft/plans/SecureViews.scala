package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row/column-level access views (reference §2.10 Deep Data Security).
  *
  * The reference implements data roles and row/column grants as validated
  * Oracle DDL (reference: src/server/app/deepsec/database.py:229-434). The
  * Spark-native equivalent is structural: a grant is a projection (column
  * grant) plus a filter (row grant) materialized as a view — Catalyst's
  * column pruning and predicate pushdown make the restricted view exactly
  * as efficient as a table the user was "allowed" to have.
  */
object SecureViews {

  private val identifier = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Oracle-identifier-style validation (reference deepsec/database.py:55-67
    * and database/sql.py:42-52). */
  def isValidIdentifier(name: String): Boolean =
    identifier.pattern.matcher(name).matches()

  /** Build a restricted view: only `allowedCols`, only rows matching
    * `rowPredicate` (None → all rows). Masked columns are replaced by a
    * redaction literal instead of dropped when listed in `maskedCols`.
    *
    * The row predicate is applied to the UNPROJECTED, UNMASKED frame: a
    * policy like `name = 'alice'` must see the table's real values (and
    * may reference columns the grant doesn't expose) — filtering after
    * masking would compare against the redaction literal and return the
    * wrong row set. Catalyst still pushes the filter into the scan; the
    * projection/masking happens above it. */
  def restrict(df: DataFrame, allowedCols: Seq[String],
               rowPredicate: Option[Column] = None,
               maskedCols: Set[String] = Set.empty): DataFrame = {
    require(allowedCols.nonEmpty, "at least one column must be granted")
    allowedCols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val filtered = rowPredicate.fold(df)(df.filter)
    filtered.select(allowedCols.map { c =>
      if (maskedCols.contains(c)) lit("***").as(c) else col(c)
    }: _*)
  }

  /** Register the restricted view under a validated name. */
  def grantView(spark: SparkSession, viewName: String, df: DataFrame,
                allowedCols: Seq[String], rowPredicate: Option[Column] = None,
                maskedCols: Set[String] = Set.empty): Unit = {
    require(isValidIdentifier(viewName), s"invalid view name: $viewName")
    restrict(df, allowedCols, rowPredicate, maskedCols)
      .createOrReplaceTempView(viewName)
  }
}
