package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunker

/** Mirrors the reference splitter tests
  * (reference: src/server/tests/embed/test_document.py:99-133) plus
  * seeded randomized invariants (coverage / reconstruction / spacing). */
class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int): Seq[(Int, Int, String)] =
    Chunker.chunk(Seq((1L, text)).toDF("doc_id", "text"), "text", size, overlap)
      .select("chunk_index", "start_index", "chunk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq

  test("windows advance by size - overlap and record start_index") {
    val out = chunksOf("abcdefghij", 4, 2) // step 2: starts 0,2,4,6,8
    assert(out.map(_._2) == Seq(0, 2, 4, 6, 8))
    assert(out.map(_._3) == Seq("abcd", "cdef", "efgh", "ghij", "ij"))
  }

  test("no overlap → exact partition") {
    val out = chunksOf("abcdefgh", 4, 0)
    assert(out.map(_._3) == Seq("abcd", "efgh"))
  }

  test("text shorter than window → single chunk") {
    assert(chunksOf("ab", 10, 3).map(_._3) == Seq("ab"))
  }

  test("empty text → no chunks") {
    assert(chunksOf("", 10, 3).isEmpty)
  }

  test("invalid overlap rejected (reference document.py:80-86)") {
    intercept[IllegalArgumentException](chunksOf("abc", 4, 4))
    intercept[IllegalArgumentException](chunksOf("abc", 0, 0))
  }

  test("chunk ids follow {key}_{idx} (reference document.py:113-130)") {
    val out = Chunker.chunkWithIds(
        Seq((7L, "abcdefgh")).toDF("doc_id", "text"), "doc_id", "text", 4, 0)
      .select("chunk_id").as[String].collect().toSeq
    assert(out == Seq("7_0", "7_1"))
  }

  test("property: coverage, reconstruction, and spacing invariants (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 40).foreach { _ =>
      val text = rnd.alphanumeric.take(rnd.nextInt(400)).mkString
      val size = 2 + rnd.nextInt(49)
      val ov = rnd.nextInt(size)
      val out = chunksOf(text, size, ov)
      if (text.isEmpty) assert(out.isEmpty)
      else {
        val step = size - ov
        // every char position is covered by at least one chunk
        val covered = out.flatMap { case (_, s, c) => s until (s + c.length) }.toSet
        assert(covered == text.indices.toSet, s"size=$size ov=$ov len=${text.length}")
        // chunks reconstruct the text from their start indices
        out.foreach { case (_, s, c) => assert(text.substring(s, s + c.length) == c) }
        assert(out.map(_._2) == out.indices.map(_ * step))
      }
    }
  }

  test("sequence packing assigns budget-aligned pack ids per shard") {
    // shard A: tokens 900,900,900 → starts 0,900,1800 → all pack 0; only
    // doc 3 (1800..2699) crosses the 2000 seam. shard B: an exactly-full
    // window (2000) does NOT span; the next doc starts pack 1.
    val df = Seq((1L, "A", 900), (2L, "A", 900), (3L, "A", 900),
        (10L, "B", 2000), (11L, "B", 50))
      .toDF("id", "shard", "tokens")
    val got = graft.operators.Chunker
      .packSequences(df, "shard", "id", "tokens", 2000)
      .select("id", "pack_id", "spans_boundary")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0, false), (2L, 0, false), (3L, 0, true),
      (10L, 0, false), (11L, 1, false)))
  }

  test("packEfficiency: window count, waste, and boundary docs per shard") {
    // A: 2700 tokens → 2 windows, waste 1300, doc 3 spans the seam
    // B: 2050 tokens → 2 windows, waste 1950, nothing spans (2000 exact)
    val df = Seq((1L, "A", 900), (2L, "A", 900), (3L, "A", 900),
        (10L, "B", 2000), (11L, "B", 50))
      .toDF("id", "shard", "tokens")
    val packed = graft.operators.Chunker
      .packSequences(df, "shard", "id", "tokens", 2000)
    val eff = graft.operators.Chunker
      .packEfficiency(packed, "shard", "tokens", "spans_boundary", 2000)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = eff("A")
    assert(a.getLong(1) == 3 && a.getLong(2) == 2700 && a.getLong(3) == 1)
    assert(a.getLong(4) == 2 && a.getLong(5) == 1300)
    assert(a.getDouble(6) == 2700.0 / 4000.0)
    val b = eff("B")
    assert(b.getLong(2) == 2050 && b.getLong(3) == 0 && b.getLong(4) == 2)
  }

  test("spanCorruptionPlan: counts are pure integer functions of (id, tokens)") {
    val df = Seq((7L, (1 to 45).map(i => s"t$i").mkString(" ")),
        (9L, "a b c"))
      .toDF("doc_id", "text")
    val out = graft.operators.Chunker.spanCorruptionPlan(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r45 = out(7L)
    // 45 tokens -> 2 full 20-blocks -> 2 spans of 3: 6 masked,
    // encoder 45-6+2=41, decoder 6+2=8
    assert(r45.getInt(1) == 45 && r45.getLong(2) == 2 && r45.getLong(3) == 6)
    assert(r45.getLong(4) == 41 && r45.getLong(5) == 8)
    val off = r45.getLong(6)
    assert(off >= 0 && off < 18)
    // the offset is the documented hash: reproducible across runs/engines
    assert(off == graft.plans.HashExpressions.scrambleHash(
      7L * 31, graft.plans.HashExpressions.PolyBase1) % 18)
    // 3 tokens: no full block -> zero spans, null offset, identity lengths
    val r3 = out(9L)
    assert(r3.getLong(2) == 0 && r3.getLong(4) == 3 && r3.isNullAt(6))
  }

  test("contentDefinedChunks: chunks partition the text; prefix edit re-syncs") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"sentence number $i of the test corpus")
      .mkString(" ")
    val docs = Seq((1L, text), (2L, "EDITED-PREFIX " + text))
      .toDF("doc_id", "text")
    val ch = Chunker.contentDefinedChunks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2).toLong,
        r.getLong(3), r.getString(4)))
    // reconstruction: in-order concat of chunks is exactly the text
    val rec1 = ch.filter(_._1 == 1L).sortBy(_._2).map(_._5).mkString
    assert(rec1 == text)
    val rec2 = ch.filter(_._1 == 2L).sortBy(_._2).map(_._5).mkString
    assert(rec2 == "EDITED-PREFIX " + text)
    // starts/lens are consistent with the chunk strings
    ch.foreach { case (_, _, start, len, c) => assert(c.length == len) }
    // shift resilience: after the hash re-synchronizes, the twin shares
    // most of the original's chunks verbatim (a fixed-window splitter
    // at any size shares none — every window shifts by the prefix)
    val c1 = ch.filter(_._1 == 1L).map(_._5).toSet
    val c2 = ch.filter(_._1 == 2L).map(_._5).toSet
    val shared = c1.intersect(c2).size.toDouble / c1.size
    assert(shared >= 0.5, s"shared chunk fraction $shared")
    val fixedShared = Chunker.chunk(docs, "text", 32, 0)
      .select("doc_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val f1 = fixedShared.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fixedShared.filter(_._1 == 2L).map(_._2).toSet
    assert(f1.intersect(f2).size.toDouble / f1.size < shared)
  }

  test("sentenceChunks: packs at sentence boundaries, budget honored") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three. four five! six seven eight nine? ten"))
      .toDF("doc_id", "text")
    val out = Chunker.sentenceChunks(docs, "doc_id", "text", 5)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // cum 3,5,9,10 → packs (cum−nt) div 5 = 0,0,1,1
    assert(out(0) == ((2L, 5L, "one two three. four five")))
    assert(out(1) == ((2L, 5L, "six seven eight nine. ten")))
  }

  test("paddingWaste: length-sorting strictly reduces interleaved-length padding") {
    import spark.implicits._
    // arrival order interleaves 1s and 9s → every batch pads to 9;
    // sorted order separates them → half the padding disappears
    val docs = (0L until 8L).map(i => (i, if (i % 2 == 0) 1L else 9L))
      .toDF("id", "len")
    val out = Chunker.paddingWaste(docs, "id", "len", batchSize = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // arrival: batches {1,9,1,9}×2 → padded 36+36 = 72, real 40
    assert(out("arrival") == ((2L, 40L, 72L)))
    // sorted: {1,1,1,1} and {9,9,9,9} → padded 4 + 36 = 40, zero waste
    assert(out("length_sorted") == ((2L, 40L, 40L)))
  }

  test("textTilingBoundaries: vocabulary break is cut, uniform text is not") {
    import spark.implicits._
    // blocks of 3 tokens: doc 1 repeats one vocabulary → sim 1 at both
    // boundaries; doc 2 switches vocabulary entirely at the boundary
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "a b c x y z")).toDF("doc_id", "text")
    val out = Chunker.textTilingBoundaries(docs, "doc_id", "text",
        blockTokens = 3, tau = 0.15)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_blocks") == 3L &&
      out(0).getAs[Long]("n_boundaries") == 2L &&
      out(0).getAs[Long]("n_cuts") == 0L &&
      out(0).getAs[Double]("mean_sim") == 1.0)
    assert(out(1).getAs[Long]("n_cuts") == 1L &&
      out(1).getAs[Double]("mean_sim") == 0.0)
  }
}
