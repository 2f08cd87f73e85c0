package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction at corpus scale — the
  * tokenizer-learning step of an LLM data pipeline (Sennrich et al. 2016).
  * Classic BPE: start from characters, repeatedly count adjacent symbol
  * pairs across the corpus (weighted by word frequency) and merge the most
  * frequent pair into one symbol.
  *
  * Distributed shape, per merge round: one map-side pair explode over the
  * DISTINCT-WORD table (not the corpus — word counting collapses 100 TB of
  * text to a vocabulary-sized frame once, up front), one partial-agg
  * groupBy(pair), one 1-row global argmax broadcast back into a map-side
  * string rewrite. Rounds cost O(vocab), never O(corpus); only the single
  * best pair ever visits the driver plan as a broadcast.
  *
  * Determinism / replay: symbols ride in a `chr(31)`-separated string;
  * `replace` is leftmost-non-overlapping greedy in both Spark
  * (UTF8String.replace) and DuckDB, and argmax ties break on
  * (count DESC, a, b) — so the whole learn loop unrolls into chained SQL
  * CTEs for the oracle. Words are lowercase `[a-z]+` tokens, so the
  * separator can never collide with symbol text.
  */
object Bpe {

  /** Distinct-word frequency table over whitespace-split lowercase `[a-z]+`
    * tokens — the one corpus-sized pass; everything after runs on this. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn `iters` merges. Returns (rank INT, sym_a, sym_b, pair_count) —
    * merge ranks 1..iters in learned order. */
  def learnMerges(words: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one merge round")
    var w = words.select(
      expr("array_join(filter(split(word, ''), x -> x != ''), chr(31))").as("w"),
      col("freq"))
    var merges: DataFrame = null
    for (r <- 1 to iters) {
      val pairs = w
        .select(expr("split(w, chr(31))").as("sy"), col("freq"))
        .filter(size(col("sy")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(sy) - 2), i -> named_struct('a', sy[i], 'b', sy[i + 1]))")).as("p"),
          col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("a").asc, col("b").asc)
        .limit(1)
        .withColumn("rank", lit(r))
      merges = if (merges == null) best else merges.unionByName(best)
      w = w.crossJoin(broadcast(
          best.select(col("a").as("_ma"), col("b").as("_mb"))))
        .select(expr("replace(w, concat(_ma, chr(31), _mb), concat(_ma, _mb))").as("w"),
          col("freq"))
    }
    merges.select(col("rank"), col("a").as("sym_a"), col("b").as("sym_b"),
      col("pair_count"))
  }

  /** Apply learned merges to a word table — the tokenize side: replay the
    * merge list in rank order, append each word's final symbol array as
    * `tokens` (other input columns ride through, so a frequency-weighted
    * word table tokenizes in place). Symbols must be `[a-z]+` (what
    * [[learnMerges]] produces from [[wordCounts]] input) — enforced, since
    * they are spliced into an expression string. */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    merges.foreach { case (a, b) =>
      require(a.matches("[a-z]+") && b.matches("[a-z]+"),
        s"merge symbols must be [a-z]+, got ($a, $b)")
    }
    var w = words.withColumn("_w",
      expr("array_join(filter(split(word, ''), x -> x != ''), chr(31))"))
    merges.foreach { case (a, b) =>
      w = w.withColumn("_w", expr(
        s"replace(_w, concat('$a', chr(31), '$b'), concat('$a', '$b'))"))
    }
    w.withColumn("tokens", expr("split(_w, chr(31))")).drop("_w")
  }
}
