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
  * single-map semantics the driver contract had when SparkEntry held all
  * 509 entries inline (keys are globally unique; CORRECTNESS gates every
  * one). */
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
    Queries510to519,
    Queries520to529)
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_.queries).reduce(_ ++ _)
  lazy val oracleSql: Map[String, String] =
    modules.iterator.map(_.oracleSql).reduce(_ ++ _)
}
