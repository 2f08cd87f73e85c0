package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sketches. Spark's `approx_count_distinct` (HyperLogLog++)
  * merges partition sketches in a partitioning-dependent order, so its
  * estimate is not stable across cluster layouts — fine for monitoring,
  * wrong for a reproducibility-gated pipeline. KMV (k minimum hash
  * values, Bar-Yossef et al.) is a pure function of the value SET:
  * deterministic everywhere, mergeable (union = merge the k-min sets),
  * and exactly replayable by the SQL oracle.
  *
  * Scale shape: distinct-of-hash collapses map-side (partial aggregate),
  * the k smallest survive per partition via TakeOrdered's bounded heaps,
  * and only `partitions × k` longs reach the driver-side max. */
object Sketches {

  private val P = graft.plans.HashExpressions.P2n31
  private val Mix = graft.plans.HashExpressions.Mix

  /** Scrambled hash of a numeric key into [0, 2^31-1): affine step + two
    * xorshift-multiply rounds. A bare affine hash of consecutive keys is
    * LATTICE-structured (three-distance theorem) and biases k-minimum
    * statistics; the mixer restores the uniform-minima behavior KMV needs.
    * All ops (xor, >>, *, %) are exact in both Spark ANSI and DuckDB, so
    * the oracle replays the identical values. */
  def keyHash(key: Column, base: Long = graft.plans.HashExpressions.PolyBase1): Column = {
    val h0 = pmod(key.cast("long") * base, lit(P))
    val h1 = pmod(h0.bitwiseXOR(shiftright(h0, 16)) * Mix, lit(P))
    pmod(h1.bitwiseXOR(shiftright(h1, 13)) * Mix, lit(P))
  }

  /** Bloom-filter bit set over a key column: standard double hashing
    * (Kirsch-Mitzenmacher), position_i = (h1 + i*h2) mod m. The "filter"
    * is a DataFrame of distinct set bits — broadcastable to probe sides,
    * exactly the shape of engine runtime-filter join pruning. */
  def bloomBits(df: DataFrame, keyCol: String, m: Int, k: Int): DataFrame = {
    val h1 = keyHash(col(keyCol), graft.plans.HashExpressions.PolyBase1)
    val h2 = keyHash(col(keyCol), graft.plans.HashExpressions.PolyBase2)
      .bitwiseOR(lit(1L)) // odd stride → cycles through all of [0, m)
    val positions = array((0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m))): _*)
    df.select(explode(positions).as("bit")).distinct()
  }

  /** Probe: distinct keys of `df` whose k positions are ALL set in `bits`
    * (supersets the true build set; the false-positive rate is the Bloom
    * trade-off). Probe keys are deduplicated before exploding positions —
    * a key appearing N times would otherwise match N*k != k position
    * indexes and be dropped, a false NEGATIVE violating the superset
    * guarantee — and a key passes when all k distinct position-indexes
    * matched. */
  def bloomProbe(df: DataFrame, keyCol: String, bits: DataFrame,
                 m: Int, k: Int): DataFrame = {
    val h1 = keyHash(col(keyCol), graft.plans.HashExpressions.PolyBase1)
    val h2 = keyHash(col(keyCol), graft.plans.HashExpressions.PolyBase2)
      .bitwiseOR(lit(1L))
    val positions = array((0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m))): _*)
    df.select(col(keyCol)).distinct()
      .select(col(keyCol), posexplode(positions).as(Seq("pidx", "bit")))
      .join(broadcast(bits), "bit")
      .groupBy(keyCol).agg(countDistinct(col("pidx")).as("_matched"))
      .filter(col("_matched") === k)
      .select(keyCol)
  }

  /** Pack a [[bloomBits]] bit frame into `m/64` little-endian words on the
    * driver — 16 KB for m = 2^17. This is the broadcastable runtime-filter
    * form: Spark's own `InjectRuntimeFilter` ships Bloom filters to probe
    * sides the same way, and at 100 TB a 16 KB literal beating a 1.8M-row
    * shuffle+join is exactly the point of a Bloom filter. */
  def packBits(bits: DataFrame, m: Int): Array[Long] = {
    val words = new Array[Long]((m + 63) / 64)
    // bits are distinct, so SUM of the per-bit masks is the bitwise OR
    bits.selectExpr("cast(bit div 64 as int) as w",
        "shiftleft(1L, cast(bit % 64 as int)) as mask")
      .groupBy("w").agg(sum("mask").as("word"))
      .collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Probe against a packed bit set: distinct keys whose k positions are
    * ALL set. Pure map-side expression over the broadcast words — the
    * only shuffle is the key dedup, vs. the explode+join+aggregate a
    * bit-frame probe needs. Semantically identical to probing the
    * [[bloomBits]] frame (same superset-of-build guarantee). Uses the
    * native [[graft.plans.HashExpressions.BloomProbeExpr]] — composing it
    * from Column ops put a 2048-element array literal into codegen, whose
    * generated filter exceeded the JIT huge-method limit and ran ~9× slower
    * in the bytecode interpreter. */
  def bloomProbePacked(df: DataFrame, keyCol: String, words: Array[Long],
                       m: Int, k: Int): DataFrame = {
    graft.plans.HashExpressions.register(df.sparkSession)
    df.select(col(keyCol)).distinct()
      .filter(call_function("graft_bloom_probe",
        col(keyCol), typedLit(words.toSeq), lit(m), lit(k)))
  }

  /** KMV estimate of |distinct keyCol|: (k-1) * P / h_k where h_k is the
    * k-th smallest distinct hash. Exact when fewer than k distinct values
    * exist (falls back to the distinct count). Returns a 1-row frame
    * (estimate DOUBLE, n_hashes BIGINT). */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 256): DataFrame = {
    val kmin = df.select(keyHash(col(keyCol)).as("h"))
      .distinct()
      .orderBy("h")
      .limit(k)
    kmin.agg(
      when(count(lit(1)) < k, count(lit(1)).cast("double"))
        .otherwise(lit((k - 1).toDouble) * P / max("h")).as("estimate"),
      count(lit(1)).as("n_hashes"))
  }
}
