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

  /** As-of join: enrich each `left` row with the LATEST `right` row whose
    * `time` is at or before the left row's, per `key` — the point-in-time
    * join Spark lacks as a built-in (SURVEY §2.3 notes the reference has no
    * as-of/range joins; this is the beyond-reference time-series surface).
    *
    * Implemented as a tagged union + per-key running
    * `last(_, ignoreNulls)` window: ONE shuffle on `key`, no range
    * explosion, and the window sort is (time, side) with right rows first
    * so 'at or before' ties resolve to the right row. At 100 TB this
    * shuffles each side once — same cost as a plain equi-join — versus the
    * quadratic blowup of an inequality theta-join.
    *
    * Right-side columns come back as `{prefix}{time}` and `{prefix}{c}` for
    * each c in `rightVals` (NULL when no right row precedes). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               rightVals: Seq[String], prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rStruct = right.select(col(key), col(time),
      struct((time +: rightVals).map(col): _*).as("_rrow"))
    val l2 = left
      .withColumn("_rrow", lit(null).cast(rStruct.schema("_rrow").dataType))
      .withColumn("_side", lit(1))
    val r2 = left.columns.filterNot(Set(key, time))
      .foldLeft(rStruct.withColumn("_side", lit(0))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      .select(l2.columns.map(col): _*)
    // Third sort key: the right-row struct itself. Multiple right rows
    // with equal (key, time) would otherwise leave last() nondeterministic;
    // struct ordering is field-wise, so ties resolve to the max payload.
    // (Left rows carry a null _rrow but sort after all right rows at equal
    // time via _side, so the null never decides an ordering.)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("_side").asc, col("_rrow").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l2.unionByName(r2)
      .withColumn("_last", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_rrow", "_side")
    (time +: rightVals)
      .foldLeft(joined)((df, c) => df.withColumn(prefix + c, col(s"_last.$c")))
      .drop("_last")
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
