package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One family module = one slice of the driver contract: its query
  * builders and their DuckDB oracles, keyed identically. */
private[graft] trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

/** The registry SparkEntry serves from — concatenation preserves the
  * single-map semantics of the original inline SparkEntry map. Key
  * uniqueness is ASSERTED at init: `++` silently last-wins on a
  * duplicate, so a mis-numbered new query would otherwise shadow an old
  * one and the correctness gate would shrink by one without failing. */
private[graft] object QueryRegistry {
  val modules: Seq[QueryModule] = Seq(
    Queries001to090,
    Queries091to155,
    Queries156to222,
    Queries223to272,
    Queries273to319,
    Queries320to368,
    Queries369to421,
    Queries422to477,
    Queries478to509,
    Queries510to516,
    Queries517to521,
    Queries522to532,
    Queries533to540,
    Queries541to545,
    Queries546to555,
    Queries556to565)
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val maps = modules.map(_.queries)
    val merged = maps.reduce(_ ++ _)
    require(merged.size == maps.map(_.size).sum,
      s"QueryRegistry: duplicate query keys across modules — " +
        s"${maps.map(_.size).sum} declared, ${merged.size} distinct")
    merged
  }
  lazy val oracleSql: Map[String, String] = {
    val maps = modules.map(_.oracleSql)
    val merged = maps.reduce(_ ++ _)
    require(merged.size == maps.map(_.size).sum,
      s"QueryRegistry: duplicate oracle keys across modules — " +
        s"${maps.map(_.size).sum} declared, ${merged.size} distinct")
    require(merged.keySet.subsetOf(queries.keySet),
      "QueryRegistry: oracle key without a matching query: " +
        (merged.keySet -- queries.keySet).mkString(", "))
    merged
  }
}
