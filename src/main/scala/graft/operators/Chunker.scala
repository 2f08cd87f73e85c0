package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-window character splitter with overlap.
  *
  * Semantics mirror the reference splitter
  * (reference: src/server/app/embed/document.py:69-110):
  *  - windows start at 0 and advance by `chunkSize - ceil(chunkOverlap)`
  *  - every start strictly below the text length produces a chunk
  *    (the final chunk may be shorter than `chunkSize`)
  *  - `start_index` is recorded per chunk, `id = "{docKey}_{idx}"`
  *    (reference: embed/document.py:113-130, process_metadata)
  *  - constraint `0 <= overlap < size` is validated up front
  *    (reference: embed/document.py:80-86)
  *
  * Implementation: pure Catalyst built-ins (`sequence` → `transform` →
  * `posexplode`) — no UDF, so the whole operator stays inside whole-stage
  * codegen, the scan underneath keeps column pruning, and the operator is
  * trivially parallel: each input row expands independently, no shuffle.
  * At 100 TB the only knob that matters is input split size
  * (`spark.sql.files.maxPartitionBytes`), not this operator.
  */
object Chunker {

  /** Number of chunks for a text of length `len`: ceil(max(len,1) / step)
    * via the while-start-below-length rule. Empty text yields 0 chunks. */
  def chunkStarts(len: Column, step: Int): Column =
    when(len <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), len - 1, lit(step)))

  /** Split `textCol` into overlapping windows.
    *
    * Output: input columns plus `chunk_index` (int, 0-based per document),
    * `start_index` (int), `chunk` (string).
    */
  def chunk(df: DataFrame, textCol: String, chunkSize: Int, chunkOverlap: Int): DataFrame = {
    val overlap = math.ceil(chunkOverlap.toDouble).toInt
    require(chunkSize > 0, s"chunk_size must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"chunk_overlap must be in [0, chunk_size), got $overlap for size $chunkSize")
    val step = chunkSize - overlap

    val starts = chunkStarts(length(col(textCol)), step)
    df.select(col("*"), posexplode(starts).as(Seq("chunk_index", "start_index")))
      // substring is 1-based; chunkSize caps the window, the tail is shorter
      .withColumn("chunk", expr(s"substring($textCol, start_index + 1, $chunkSize)"))
  }

  /** Chunk + enrich with a chunk id `"{key}_{idx}"`, mirroring
    * process_metadata (reference: embed/document.py:113-130). */
  def chunkWithIds(df: DataFrame, keyCol: String, textCol: String,
                   chunkSize: Int, chunkOverlap: Int): DataFrame =
    chunk(df, textCol, chunkSize, chunkOverlap)
      .withColumn("chunk_id", concat(col(keyCol).cast("string"), lit("_"), col("chunk_index")))

  /** Sequence-packing assignment for training batches: documents are
    * concatenated in (`shardCol`, `orderCol`) order into fixed
    * `budget`-token windows (the FlashAttention-style packed-batch
    * layout). A doc starting at exclusive-prefix-sum position s gets
    * `pack_id = s div budget`; `spans_boundary` marks docs whose token
    * run crosses into the next window (the trainer either splits them
    * there or masks across the seam). Pure window arithmetic — exact,
    * deterministic, engine-replayable.
    *
    * Scale shape: the running sum partitions by `shardCol` (shard ≈ a
    * training-data file group), so each shard's cumsum runs independently
    * — no global window bottleneck; pack ids are per-shard. */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("_start", coalesce(sum(tokensCol).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"_start div $budget").cast("int"))
      .withColumn("spans_boundary",
        expr(s"(_start + $tokensCol - 1) div $budget").cast("int") > col("pack_id"))
      .drop("_start")
  }

  /** Packing-efficiency audit over a [[packSequences]] assignment: per
    * shard, the document/token totals, the boundary-crossing document
    * count (content split across a training-window seam — the packing
    * quality cost), the window count `ceil(total/windowTokens)`, and
    * the waste in the final ragged window (`fill_frac` → 1 means the
    * budget is fully used; concatenative packing wastes at most one
    * window per shard, so low fill flags shards too small for their
    * window size). One hash aggregate with map-side partials — the
    * planning number a packing run is judged by, all integer arithmetic
    * except the final fraction. */
  def packEfficiency(packed: DataFrame, shardCol: String, tokensCol: String,
                     boundaryCol: String, windowTokens: Int): DataFrame = {
    require(windowTokens >= 1, "need windowTokens >= 1")
    val nWin = expr(s"(total_tokens + ${windowTokens - 1}) div $windowTokens")
    packed.groupBy(col(shardCol)).agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).cast("long").as("total_tokens"),
        sum(col(boundaryCol).cast("int")).cast("long").as("n_boundary_docs"))
      .select(col(shardCol), col("n_docs"), col("total_tokens"),
        col("n_boundary_docs"),
        nWin.as("n_windows"),
        (nWin * windowTokens - col("total_tokens")).as("waste_tokens"),
        (col("total_tokens").cast("double") / (nWin * windowTokens))
          .as("fill_frac"))
  }

  /** Deterministic span-corruption plan (the T5/UL2 denoising-objective
    * layout, Raffel 2020 §3.1.4): each document's whitespace-token stream
    * is cut into `blockTokens`-token blocks; every FULL block masks one
    * `spanTokens`-token span whose offset within the block is
    * `scrambleHash(docId·31 + block) mod (blockTokens − spanTokens + 1)`
    * — spans never overlap or cross blocks by construction, and the plan
    * is a pure function of (doc id, token count): two pipeline runs, or
    * two engines, mask the IDENTICAL positions (`rand()`-based masking is
    * not reproducible across partitionings; this is).
    *
    * Per doc: token/span/masked counts and the resulting encoder/decoder
    * lengths under sentinel-token packing (each span collapses to one
    * sentinel on the input side and expands to sentinel+span on the
    * target side). All integer arithmetic — the oracle replays it
    * exactly. Scalar projection only: no shuffle, no state; the 100 TB
    * cost is the tokenize split, shared with every other text operator. */
  def spanCorruptionPlan(df: DataFrame, idCol: String, textCol: String,
                         blockTokens: Int = 20, spanTokens: Int = 3): DataFrame = {
    require(spanTokens < blockTokens, "span must fit inside its block")
    val nToks = size(split_part_tokens(col(textCol)))
    df.select(col(idCol), nToks.as("n_tokens"))
      .withColumn("n_spans", expr(s"n_tokens div $blockTokens").cast("long"))
      .withColumn("n_masked", col("n_spans") * spanTokens)
      .withColumn("input_len", col("n_tokens") - col("n_masked") + col("n_spans"))
      .withColumn("target_len", col("n_masked") + col("n_spans"))
      .withColumn("first_span_offset",
        when(col("n_spans") > 0, Sketches.keyHash(col(idCol).cast("long") * 31)
          % (blockTokens - spanTokens + 1)))
  }

  private def split_part_tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Sentence-aware budget chunking — the RAG-practical splitter: text
    * splits at sentence boundaries ([.!?]+ runs), and consecutive
    * sentences group into chunks of ≈ `budgetTokens` via the cumulative
    * token count (pack = ⌈cumsum⌉ div budget — the [[packSequences]]
    * discipline: deterministic and windowable, a greedy first-fit would
    * need sequential state). Unlike [[chunk]], no sentence is ever cut
    * mid-way, so every chunk is quotable context. Returns (idCol,
    * chunk_idx, n_sentences, n_tokens, chunk). One doc-keyed window. */
  def sentenceChunks(df: DataFrame, idCol: String, textCol: String,
                     budgetTokens: Int): DataFrame = {
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos")
    df.select(col(idCol).as("id"),
        posexplode(filter(split(col(textCol), "[.!?]+\\s*"), t => t =!= ""))
          .as(Seq("pos", "sent")))
      .withColumn("nt", size(filter(split(col("sent"), "\\s+"),
        t => t =!= "")).cast("long"))
      .withColumn("cum", sum("nt").over(wDoc.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      // the sentence belongs to the pack its PREVIOUS cumsum falls in
      .withColumn("pack", expr(s"(cum - nt) div $budgetTokens"))
      .groupBy("id", "pack")
      .agg(count(lit(1)).as("n_sentences"), sum("nt").as("n_tokens"),
        concat_ws(". ", expr(
          "transform(array_sort(collect_list(struct(pos, sent))), s -> s.sent)"))
          .as("chunk"))
      .select(col("id").as(idCol), col("pack").cast("int").as("chunk_idx"),
        col("n_sentences"), col("n_tokens"), col("chunk"))
  }

  /** Content-defined chunking (Rabin/gear CDC — the rsync/backup-dedup
    * boundary trick): cut wherever the rolling k-gram hash of the text
    * hits `hash % divisor == 0`, so boundaries are anchored to CONTENT,
    * not offsets. Insert a prefix into a document and a fixed-window
    * splitter ([[chunk]]) re-cuts every window; CDC re-synchronizes at
    * the first content anchor and every later chunk is byte-identical —
    * the property that lets a 100 TB incremental ingest re-embed only
    * the chunks that actually changed. Mean chunk length ≈ `divisor`
    * chars (no min/max clamps here — production adds them; the oracle
    * replays this exact rule).
    *
    * Same per-character window-function shape as
    * [[Winnowing.fingerprints]] (one shuffle by doc, one sort, the
    * k-gram hash via k `lead`s, mod-p polynomial over ASCII codes);
    * returns (idCol, chunk_idx, start, len, chunk). */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, divisor: Int = 32): DataFrame = {
    val P = 1000000007L
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val chars = df.filter(length(col(textCol)) >= 1)
      .select(col(idCol).as("id"),
        posexplode(expr(
          s"transform(split($textCol, ''), c -> cast(ascii(c) as bigint))"))
          .as(Seq("pos", "code")))
    val segs = chars
      .withColumn("_kh", pmod((0 until k).map { j =>
        lead(col("code"), j).over(wDoc) * lit(Seq.fill(k - 1 - j)(31L).product)
      }.reduce(_ + _), lit(P)))
      .withColumn("cut", when(col("_kh").isNotNull && col("pos") > 0 &&
        pmod(col("_kh"), lit(divisor.toLong)) === 0, 1L).otherwise(0L))
      .withColumn("grp", sum("cut").over(wDoc.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("id", "grp")
      .agg(min("pos").as("start"), count(lit(1)).as("len"))
    segs
      .join(df.select(col(idCol).as("id"), col(textCol).as("_t")), Seq("id"))
      .select(col("id").as(idCol), col("grp").cast("int").as("chunk_idx"),
        col("start"), col("len"),
        expr("substring(_t, cast(start + 1 as int), cast(len as int))")
          .as("chunk"))
  }

  /** Padding-waste audit of fixed-size batch assembly — THE number that
    * decides whether a training pipeline length-sorts before batching:
    * documents are grouped into batches of `batchSize` in two orders
    * (arrival = by id; length-sorted = by (len, id)), each batch pads
    * every member to its max length, and waste = padded − real tokens.
    * Returns one row per strategy with batch count, real/padded token
    * totals, and the waste share (the only float op). Length-sorting
    * typically cuts padding several-fold; this measures it exactly on
    * the actual corpus instead of assuming it.
    *
    * Scale shape: per strategy one ordered window pass (row_number +
    * per-batch max via groupBy on `rn div batchSize`) — the window is a
    * global order, mitigated at scale by ranging over an already
    * aggregated (id, len) projection, and in a real trainer the sort
    * runs per shard; the audit's conclusion is order-level, not
    * shard-exact. */
  def paddingWaste(df: DataFrame, idCol: String, lenCol: String,
                   batchSize: Int): DataFrame = {
    require(batchSize >= 1, "need batchSize >= 1")
    val W = org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).cast("long").as("id"),
      col(lenCol).cast("long").as("len"))
    def wasteOf(ordered: DataFrame, name: String): DataFrame =
      ordered
        .withColumn("batch", expr(s"(rn - 1) div $batchSize"))
        .groupBy("batch")
        .agg(count(lit(1)).as("bn"), sum("len").as("breal"),
          max("len").as("bmax"))
        .agg(count(lit(1)).as("n_batches"),
          sum("breal").as("real_tokens"),
          sum(col("bmax") * col("bn")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("real_tokens"), col("padded_tokens"),
          round((col("padded_tokens") - col("real_tokens")).cast("double") /
            col("padded_tokens"), 6).as("waste_frac"))
    val arrival = wasteOf(base.withColumn("rn",
      row_number().over(W.orderBy("id"))), "arrival")
    val sorted = wasteOf(base.withColumn("rn",
      row_number().over(W.orderBy("len", "id"))), "length_sorted")
    arrival.unionByName(sorted).orderBy("strategy")
  }

  /** TextTiling topic-boundary detection (Hearst 1997, the block-
    * comparison variant) — the semantic CHUNKER the fixed-window and
    * content-defined splitters bracket: cut where adjacent text blocks
    * stop sharing vocabulary. Tokens split into `blockTokens`-token
    * blocks; at each interior block boundary the multiset Dice
    * similarity `2·Σ min(tfL, tfR) / (|L| + |R|)` between the adjacent
    * blocks is computed from exact term counts (one divide per
    * boundary); a boundary is a TILE CUT when its similarity falls
    * below `tau`. Per document: block count, cut count, mean boundary
    * similarity (decimal-accumulated, round 6) — the corpus-level
    * answer to "how topically uniform are these documents, and how
    * many semantic chunks would TextTiling yield?".
    *
    * Scale shape: tokenize+posexplode rides the scan; per-(doc, block,
    * term) counts shuffle once on (doc, block skeleton); the
    * adjacent-block comparison is a self-join on (doc, block+1) —
    * co-partitioned by doc, no fan-out beyond per-doc vocabulary. */
  def textTilingBoundaries(df: DataFrame, idCol: String, textCol: String,
                           blockTokens: Int, tau: Double): DataFrame = {
    require(blockTokens >= 1, "need blockTokens >= 1")
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val toks = df
      .select(col(idCol).as("id"),
        posexplode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => t =!= "")).as(Seq("pos", "term")))
      .withColumn("blk", expr(s"pos div $blockTokens"))
    val tf = toks.groupBy("id", "blk", "term")
      .agg(count(lit(1)).as("c"))
    val blkTot = tf.groupBy("id", "blk").agg(sum("c").as("nt"))
    val nBlocks = blkTot.groupBy("id").agg(count(lit(1)).as("n_blocks"))
    val pairs = tf.select(col("id"), col("blk"), col("term"),
        col("c").as("cl"))
      .join(tf.select(col("id"), (col("blk") - 1).as("blk"),
        col("term"), col("c").as("cr")), Seq("id", "blk", "term"))
      .groupBy("id", "blk")
      .agg(sum(least(col("cl"), col("cr"))).as("inter"))
    val sims = blkTot.select(col("id"), col("blk"), col("nt").as("nl"))
      .join(blkTot.select(col("id"), (col("blk") - 1).as("blk"),
        col("nt").as("nr")), Seq("id", "blk"))
      .join(pairs, Seq("id", "blk"), "left")
      .withColumn("sim", (lit(2.0) * coalesce(col("inter"), lit(0L))
        .cast("double")) / (col("nl") + col("nr")).cast("double"))
    sims.groupBy("id")
      .agg(count(lit(1)).as("n_boundaries"),
        sum(when(col("sim") < tau, 1L).otherwise(0L)).as("n_cuts"),
        round(sum(d18(col("sim"))).cast("double") / count(lit(1)), 6)
          .as("mean_sim"))
      .join(nBlocks, Seq("id"))
      .select(col("id").as(idCol), col("n_blocks"), col("n_boundaries"),
        col("n_cuts"), col("mean_sim"))
  }
}
