package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grant/principal layer over [[SecureViews]] (reference §2.10 Deep Data
  * Security: data roles carrying row/column grants, granted in turn to end
  * users — reference: src/server/app/deepsec/database.py:229-434).
  *
  * The reference materializes grants as validated Oracle DDL; the
  * Spark-native equivalent is a POLICY CATALOG — plain data, no DDL — that
  * resolves a (principal, table) pair to a restricted DataFrame:
  *  - a ROLE holds per-table grants (allowed columns, masked columns, an
  *    optional row-filter predicate),
  *  - a PRINCIPAL (end user) holds role memberships,
  *  - resolution unions the principal's roles: a column is visible if ANY
  *    role grants it, unmasked if ANY granting role leaves it clear
  *    (the reference's additive-privilege model: more roles never shrink
  *    access), and row filters OR together.
  * Enforcement is [[SecureViews.restrict]] + [[graft.operators.Governance]]
  * — projections and filters inside Catalyst, so a governed view still
  * prunes columns and pushes its row filter into the 100 TB scan.
  *
  * The catalog is immutable: `grant`/`revoke` return a new catalog, so a
  * policy change is an atomic swap (same reasoning as the vector store's
  * staged promotion), never a half-applied mutation.
  */
object Grants {

  /** One table grant inside a role. `rowFilterSql` is a SQL boolean
    * expression over the TABLE's columns (admin-authored, like the
    * reference's DDL bodies); identifiers are validated, the expression is
    * parsed by Spark at resolution time. */
  final case class TableGrant(table: String, allowedCols: Seq[String],
                              maskedCols: Set[String] = Set.empty,
                              rowFilterSql: Option[String] = None) {
    require(SecureViews.isValidIdentifier(table), s"invalid table name: $table")
    require(allowedCols.nonEmpty, s"grant on $table allows no columns")
    allowedCols.foreach(c => require(SecureViews.isValidIdentifier(c),
      s"invalid column name: $c"))
    require(maskedCols.subsetOf(allowedCols.toSet),
      s"masked columns must be granted columns on $table")
  }

  final case class AccessDenied(principal: String, table: String)
    extends RuntimeException(s"principal '$principal' has no grant on '$table'")

  final class GrantCatalog private (
      val roleGrants: Map[String, Map[String, TableGrant]],
      val memberships: Map[String, Set[String]]) {

    /** Add/replace a role's grant on one table. */
    def grant(role: String, g: TableGrant): GrantCatalog = {
      require(SecureViews.isValidIdentifier(role), s"invalid role name: $role")
      val forRole = roleGrants.getOrElse(role, Map.empty) + (g.table -> g)
      new GrantCatalog(roleGrants + (role -> forRole), memberships)
    }

    /** Drop a role's grant on one table (no-op when absent). */
    def revoke(role: String, table: String): GrantCatalog = {
      val forRole = roleGrants.getOrElse(role, Map.empty) - table
      new GrantCatalog(roleGrants + (role -> forRole), memberships)
    }

    /** Enroll a principal in a role. */
    def addMember(principal: String, role: String): GrantCatalog =
      new GrantCatalog(roleGrants,
        memberships + (principal -> (memberships.getOrElse(principal, Set.empty) + role)))

    /** Remove a principal from a role. */
    def removeMember(principal: String, role: String): GrantCatalog =
      new GrantCatalog(roleGrants,
        memberships + (principal -> (memberships.getOrElse(principal, Set.empty) - role)))

    /** The principal's effective grant on `table` across all their roles:
      * columns union, a column is masked only when EVERY granting role
      * masks it, row filters OR (None anywhere → unfiltered).
      *
      * Privileges are TABLE-scoped, exactly like SQL role semantics
      * (and the reference's data-role grants): rows and columns merge
      * independently, so a principal holding {rows-of-EU, name-masked}
      * and {rows-of-rich, name-clear} sees name clear on EU rows too.
      * Deployments needing (row, column)-scoped masking should model it
      * as separate tables/views per sensitivity tier rather than
      * expecting the role union to scope masks per row. */
    def effectiveGrant(principal: String, table: String): Option[TableGrant] = {
      val gs = memberships.getOrElse(principal, Set.empty).toSeq.sorted
        .flatMap(r => roleGrants.getOrElse(r, Map.empty).get(table))
      if (gs.isEmpty) None
      else {
        val cols = gs.flatMap(_.allowedCols).distinct
        val masked = cols.filter(c =>
          gs.filter(_.allowedCols.contains(c)).forall(_.maskedCols.contains(c))).toSet
        val filters = gs.map(_.rowFilterSql)
        val rowSql = if (filters.exists(_.isEmpty)) None
          else Some(filters.flatten.distinct.map(f => s"($f)").mkString(" OR "))
        Some(TableGrant(table, cols, masked, rowSql))
      }
    }

    /** Resolve the governed view a principal sees of `df` (registered as
      * `table`): projection + masking + row filter via
      * [[SecureViews.restrict]]. Throws [[AccessDenied]] without a grant —
      * absence of a grant is absence of ACCESS, not an empty frame a
      * caller might mistake for a valid-but-empty table. */
    def viewFor(principal: String, table: String, df: DataFrame): DataFrame =
      effectiveGrant(principal, table) match {
        case None => throw AccessDenied(principal, table)
        case Some(g) =>
          SecureViews.restrict(df, g.allowedCols,
            g.rowFilterSql.map(expr), g.maskedCols)
      }
  }

  object GrantCatalog {
    val empty: GrantCatalog = new GrantCatalog(Map.empty, Map.empty)

    /** Load a catalog from plain policy TABLES — the deployable form: a
      * grants frame (role STRING, table STRING, allowed_cols ARRAY<STRING>,
      * masked_cols ARRAY<STRING>, row_filter STRING nullable) and a
      * memberships frame (principal STRING, role STRING). Policy data
      * stays data — versioned, diffable, joinable — and becomes an
      * enforcing catalog in one call; identifiers validate on load. */
    def fromPolicyTables(grants: DataFrame, members: DataFrame): GrantCatalog = {
      var cat = empty
      grants.select(col("role").cast("string"), col("table").cast("string"),
          col("allowed_cols").cast("array<string>"),
          col("masked_cols").cast("array<string>"),
          col("row_filter").cast("string"))
        .collect().foreach { r =>
          cat = cat.grant(r.getString(0), TableGrant(r.getString(1),
            r.getSeq[String](2).toSeq,
            Option(r.getSeq[String](3)).map(_.toSet).getOrElse(Set.empty),
            Option(r.getString(4))))
        }
      members.select(col("principal").cast("string"), col("role").cast("string"))
        .collect().foreach(r => cat = cat.addMember(r.getString(0), r.getString(1)))
      cat
    }
  }
}
