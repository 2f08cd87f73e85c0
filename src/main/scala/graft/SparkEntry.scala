package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (see COVERAGE.md for the full matrix), each with a
  * DuckDB-equivalent `oracleSql`: every query here is SQL-expressible by
  * construction, including the hash/LSH/sketch pipelines, which use
  * rolling-polynomial and xorshift-multiply hashes with seeded constants
  * embedded as literals precisely so the oracle can replay the identical
  * arithmetic (see NOTES.md "oracle-expressible hash architecture").
  * Column names/types are aligned pairwise; doubles that depend on
  * accumulation order are computed in exact decimal arithmetic and cast
  * back, so both engines produce bit-identical values.
  */
object SparkEntry {

  import graft.queries.QueryHelpers.embedSearch

  /** Flagship query on sf=0.001: full ingest → chunk → dedup → embed →
    * store → retrieve pipeline; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    embedSearch(spark, "/root/testdata/sf0.001")

  /** One `queries` entry per implemented operator (SURVEY.md §2 +
    * COVERAGE.md), served from the per-family modules under
    * `graft.queries` (QueryRegistry concatenates them; keys unique,
    * every entry CORRECTNESS-gated). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryRegistry.queries

  /** DuckDB-equivalent SQL per query, same keys as [[queries]]. */
  def oracleSql: Map[String, String] =
    graft.queries.QueryRegistry.oracleSql
}
