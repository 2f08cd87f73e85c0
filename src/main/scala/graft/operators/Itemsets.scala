package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining (Apriori / SON shape) over document token
  * sets — the market-basket classic applied where a curation pipeline
  * actually uses it: co-occurring boilerplate phrases, template token
  * bundles, and tag combinations that mark machine-generated text. A
  * PMI collocation ([[NgramLm.pmiCollocations]]) scores ADJACENT pairs;
  * itemsets find unordered co-presence at any distance, with the
  * support-monotonicity prune that makes k > 2 tractable.
  *
  * Scale shape (the SON/Apriori distributed form): L1 is one token
  * aggregate; every candidate level is generated WITHIN a document from
  * broadcast-pruned frequent items only — the quadratic/cubic expansion
  * is per-document (bounded by the frequent-item count), never corpus ×
  * corpus, and each level's count is one map-side-combinable groupBy.
  * Level-3 candidates are additionally semi-joined against the frequent
  * PAIRS (the real Apriori prune — every subset of a frequent set is
  * frequent, so the prune is lossless and the oracle can threshold
  * directly without replaying it). Supports are exact BIGINTs; the
  * threshold is `⌊n_docs·supNum/supDen⌋`, integer `div` per parity
  * rule 6.
  */
object Itemsets {

  /** Frequent 1/2/3-itemsets of distinct lowercased whitespace tokens
    * with support ≥ ⌊n_docs·supNum/supDen⌋. Returns
    * (k, item_a, item_b, item_c, support) — item_b/item_c NULL below
    * their level — ordered (k, item_a, item_b, item_c). */
  def frequentItemsets(docs: DataFrame, idCol: String, textCol: String,
                       supNum: Int, supDen: Int): DataFrame = {
    val t = docs.select(col(idCol).as("id"),
      explode(array_distinct(
        filter(split(lower(col(textCol)), "\\s+"), x => x =!= ""))).as("item"))
    val nDocs = docs.agg(count(lit(1)).as("_n"))
    def keepFrequent(counted: DataFrame): DataFrame = counted
      .crossJoin(broadcast(nDocs))
      .filter(col("support") >= expr(s"(_n * $supNum) div $supDen"))
      .drop("_n")
    val l1 = keepFrequent(
      t.groupBy("item").agg(count(lit(1)).as("support")))
    val tf = t.join(broadcast(l1.select("item")), Seq("item"), "left_semi")
    // Candidate levels expand through codegen'd id self-joins. MEASURED
    // ALTERNATIVE (do not redo): per-doc sorted baskets via collect_set
    // with map-side HOF combination expansion halves the shuffles but ran
    // 2× SLOWER at sf0.1 (16.7 s vs 7.4 s min-of-3) — nested interpreted
    // transforms allocate a struct per candidate, while the joins stay
    // inside whole-stage codegen. The shuffles here are (id, item) rows
    // hashed by id — small and uniform.
    val l2 = keepFrequent(tf.select(col("id"), col("item").as("item_a"))
      .join(tf.select(col("id"), col("item").as("item_b")), Seq("id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support")))
    // level-3 baskets: only items that appear in some frequent pair
    val l2items = broadcast(l2.select(col("item_a").as("item"))
      .union(l2.select(col("item_b"))).distinct())
    val tp = tf.join(l2items, Seq("item"), "left_semi")
    val pairsB = broadcast(l2.select("item_a", "item_b"))
    val cand3 = tp.select(col("id"), col("item").as("item_a"))
      .join(tp.select(col("id"), col("item").as("item_b")), Seq("id"))
      .join(tp.select(col("id"), col("item").as("item_c")), Seq("id"))
      .filter(col("item_a") < col("item_b") && col("item_b") < col("item_c"))
      // Apriori: all three sub-pairs must be frequent (lossless prune)
      .join(pairsB, Seq("item_a", "item_b"), "left_semi")
      .join(pairsB.toDF("item_b", "item_c"), Seq("item_b", "item_c"), "left_semi")
      .join(pairsB.toDF("item_a", "item_c"), Seq("item_a", "item_c"), "left_semi")
    val l3 = keepFrequent(cand3
      .groupBy("item_a", "item_b", "item_c").agg(count(lit(1)).as("support")))
    val s = lit(null).cast("string")
    l1.select(lit(1).as("k"), col("item").as("item_a"), s.as("item_b"),
        s.as("item_c"), col("support"))
      .unionByName(l2.select(lit(2).as("k"), col("item_a"), col("item_b"),
        s.as("item_c"), col("support")))
      .unionByName(l3.select(lit(3).as("k"), col("item_a"), col("item_b"),
        col("item_c"), col("support")))
      .orderBy("k", "item_a", "item_b", "item_c")
  }
}
