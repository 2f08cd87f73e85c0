package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for cluster-scale execution.
  *
  * Catalyst already plans broadcast/shuffled-hash/sort-merge joins and AQE
  * rewrites skewed sort-merge joins at runtime; these helpers cover the two
  * cases that still need explicit structure at 100 TB:
  *  - salting a *known* hot key set so one reducer doesn't receive a
  *    whole key's partition (AQE skew handling splits partitions, but
  *    salting also parallelizes the *build* side replication), and
  *  - insert-if-absent / delete-stale rewrites as reusable shapes
  *    (the reference's J1/J2 merges, embed/vector_store.py:239-257).
  */
object Joins {

  /** Salted equi-join: replicate each `right` row `salt` ways and scatter
    * `left` rows uniformly across the replicas, so a skewed join key fans
    * out over `salt` reducers instead of one.
    *
    * Use when the key histogram is known to be heavy-tailed (e.g. joining
    * chunk tables on hot filenames). For organic skew discovered at
    * runtime, prefer AQE (`spark.sql.adaptive.skewJoin.enabled`).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Insert-if-absent (reference J1): rows of `incoming` whose key is not in
    * `existing`. */
  def insertIfAbsent(incoming: DataFrame, existing: DataFrame, key: String): DataFrame =
    incoming.join(existing.select(key), Seq(key), "left_anti")

  /** Delete-stale rewrite (reference J2): `table` minus rows whose `key` is
    * in `stale`. */
  def deleteMatching(table: DataFrame, stale: DataFrame, key: String): DataFrame =
    table.join(stale.select(key), Seq(key), "left_anti")
}
