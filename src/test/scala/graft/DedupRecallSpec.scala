package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Recall of the near-duplicate detectors against constructed ground truth:
  * each document paired with itself minus its last 7 characters (true
  * 5-gram Jaccard ≈ 0.97). Deterministic — fixed corpus (sf0.001 documents,
  * seed-42 driver data) and seeded hash families — so exact thresholds are
  * assertable, not flaky. */
class DedupRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))
  private lazy val corpus = docs.union(
    docs.select(col("doc_id") + 1000000,
      expr("substring(text, 1, greatest(length(text) - 7, 1))")))
  private val truePairs = 500

  test("minhash LSH (64 hashes, 8 bands) recalls ≈99% of constructed near-dups") {
    val found = Dedup.minhashLshPairs(corpus, "doc_id", "text", 5, 64, 8, 0.8)
      .filter(col("doc_b") === col("doc_a") + 1000000)
      .count()
    // the rare miss is the shortest docs (~49 chars), where losing 7 chars
    // drops true Jaccard to ~0.8 and 8-row band collision odds fall —
    // expected LSH behavior at these parameters, pinned deterministically
    // (the polynomial hash family lands at 499/500 here)
    assert(found == 499, s"minhash recall $found/$truePairs")
  }

  test("simhash (hamming ≤ 3) recalls most constructed near-dups") {
    val found = Dedup.simhashPairs(corpus, "doc_id", "text", 3)
      .filter(col("doc_b") === col("doc_a") + 1000000)
      .count()
    // truncating the final word shifts a few token hashes; most docs stay
    // within 3 bits. Pin the deterministic floor so regressions surface.
    assert(found >= (truePairs * 0.6).toInt, s"simhash recall $found/$truePairs")
  }

  test("ngram jaccard verification confirms candidates above threshold exactly") {
    val subset = docs.filter(col("doc_id") < 50)
    val sub = subset.union(subset.select(col("doc_id") + 1000,
      expr("substring(text, 1, greatest(length(text) - 7, 1))")))
    val found = Dedup.ngramJaccardPairs(sub, "doc_id", "text", 5, 0.6)
      .filter(col("doc_b") === col("doc_a") + 1000)
      .count()
    assert(found == 50, s"ngram recall $found/50")
  }
}
