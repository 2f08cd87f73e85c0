package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution): block, score, keep best match.
  *
  * A training-data curation pipeline links records that describe the same
  * entity across sources (author pages, product listings, near-identical
  * profiles) before dedup can merge them. The scalable shape is always the
  * same three steps: (1) candidates from an equi-join on a BLOCKING key —
  * never a cross join; at 100 TB the blocking join is an ordinary shuffled
  * hash join and the block size bounds the quadratic term, (2) a cheap
  * similarity score per candidate pair, (3) best-match-per-record via a
  * window, which shuffles once on the left id.
  *
  * The score is character-trigram Jaccard over the same rolling-polynomial
  * hashes the dedup family uses (graft_shingle_polyhashes), so the DuckDB
  * oracle replays the identical arithmetic.
  */
object Linkage {

  /** Best right-side match per left row among same-block candidates with
    * trigram Jaccard ≥ threshold. Output: (l_id, matched_id, jaccard).
    * Both name columns must be non-empty with length ≥ shingle size. */
  def bestMatch(left: DataFrame, leftId: String,
                right: DataFrame, rightId: String,
                blockCol: String, nameCol: String,
                threshold: Double): DataFrame = {
    graft.plans.HashExpressions.register(left.sparkSession)
    def prep(df: DataFrame, id: String, pfx: String) =
      df.select(col(id).as(s"${pfx}_id"), col(blockCol).as(s"${pfx}_blk"),
        call_function("graft_shingle_polyhashes", col(nameCol), lit(3)).as(s"${pfx}_h"))
    val l = prep(left, leftId, "l")
    val r = prep(right, rightId, "r")
    // native tight-loop intersection: size(array_intersect(...)) builds
    // boxed collections per candidate pair and dominated the block scoring
    val inter = call_function("graft_inter_size", col("l_h"), col("r_h"))
    val w = Window.partitionBy("l_id").orderBy(col("jaccard").desc, col("r_id"))
    l.join(r, col("l_blk") === col("r_blk"))
      .withColumn("_inter", inter)
      .withColumn("jaccard",
        col("_inter").cast("double") /
          (size(col("l_h")) + size(col("r_h")) - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("l_id"), col("r_id").as("matched_id"), col("jaccard"))
  }
}
