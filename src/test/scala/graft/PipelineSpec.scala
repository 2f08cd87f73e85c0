package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Embedder, RagPipeline}
import graft.plans.SelectOnly

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stub embedder is deterministic and L2-normalized") {
    val e = Embedder.stubEmbed(16)
    val a = e(Seq("hello world"))
    val b = e(Seq("hello world"))
    assert(a.head.toSeq == b.head.toSeq)
    val norm = math.sqrt(a.head.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  test("embed stage appends ARRAY<FLOAT> via mapPartitions batching") {
    val df = Seq((1L, "alpha"), (2L, "delta"), (3L, "alpha")).toDF("id", "text")
    val out = Embedder.embed(df, "text", Embedder.stubEmbed(8), batchSize = 2)
    assert(out.schema("embedding").dataType.typeName == "array")
    val vecs = out.select("id", "embedding").as[(Long, Seq[Float])].collect().toMap
    assert(vecs(1L) == vecs(3L)) // same text → same vector
    assert(vecs(1L) != vecs(2L))
  }

  test("meanPool: hand-computed pooled norm; unit chunks pool to coherence") {
    // doc 1: orthogonal unit chunks (1,0) and (0,1) → mean (.5,.5),
    // norm = sqrt(.5) ; doc 2: one chunk (0,1) → norm 1 (fully coherent)
    val df = Seq((1L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
        (2L, Seq(0.0f, 1.0f)))
      .toDF("doc_id", "embedding")
    val out = Embedder.meanPool(df, "doc_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 2)
    assert(math.abs(out(1L)._2 - math.sqrt(0.5)) < 1e-12)
    assert(out(2L) == ((1L, 1.0)))
  }

  test("route resolution matches reference runtime/common.py:86-96") {
    import RagPipeline._
    assert(resolveRoute(vecSearchEnabled = true, nl2sqlEnabled = true) == Combined)
    assert(resolveRoute(vecSearchEnabled = true, nl2sqlEnabled = false) == VecSearch)
    assert(resolveRoute(vecSearchEnabled = false, nl2sqlEnabled = true) == Nl2Sql)
    assert(resolveRoute(vecSearchEnabled = false, nl2sqlEnabled = false) == LlmOnly)
  }

  test("rephrase guard: multi-line or empty → original (vs_rephrase.py:35-45)") {
    assert(RagPipeline.guardRephrase("orig", "better query") == "better query")
    assert(RagPipeline.guardRephrase("orig", "two\nlines") == "orig")
    assert(RagPipeline.guardRephrase("orig", "   ") == "orig")
  }

  test("history wire format: role skipping, trailing newline iff any " +
      "labeled turn, label-count recovery (common.py:100-117)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, Seq((1L, 1L, "user", "q1"), (2L, 2L, "assistant", "a1"),
        (3L, 3L, "system", "ignored"), (4L, 4L, "user", "q2"))),
      (2L, Seq((1L, 1L, "tool", "x"), (2L, 2L, "system", "y"))))
      .toDF("cid", "raw")
      .select(col("cid"), transform(col("raw"), t =>
        struct(t.getField("_1").as("ord"), t.getField("_2").as("ord2"),
          t.getField("_3").as("role"), t.getField("_4").as("content")))
        .as("turns"))
      .select(col("cid"),
        RagPipeline.historyTextFromTurns(col("turns")).as("h"))
      .withColumn("n", RagPipeline.labeledTurnCount(col("h")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(df(1L) == (("User: q1\nAssistant: a1\nUser: q2\n", 3L)))
    // all roles skipped → empty string, NO trailing newline, count 0
    assert(df(2L) == (("", 0L)))
  }

  test("unfence strips ```json fences (vs_retriever.py:35)") {
    assert(RagPipeline.unfence("```json\n[1,2]\n```") == "[1,2]")
    assert(RagPipeline.unfence("plain") == "plain")
  }

  test("table selection validated against catalog, capped at 3, fallback first " +
       "(vs_retriever.py:53-127)") {
    val catalog = Seq("T_A", "T_B", "T_C", "T_D")
    assert(RagPipeline.validateTableSelection("""["T_B", "T_A"]""", catalog)
      == Seq("T_B", "T_A"))
    assert(RagPipeline.validateTableSelection(
      "```json\n[\"T_A\",\"T_B\",\"T_C\",\"T_D\"]\n```", catalog)
      == Seq("T_A", "T_B", "T_C")) // capped at DEFAULT_MAX_TABLES
    assert(RagPipeline.validateTableSelection("""["NOPE", "ALSO_NO"]""", catalog)
      == Seq("T_A")) // nothing valid → first table fallback
    assert(RagPipeline.validateTableSelection("not json at all", catalog) == Seq("T_A"))
  }

  test("grade 'no' empties the retrieved docs (vs_grade.py contract)") {
    val embed = Embedder.stubEmbed(8)
    val store = Embedder.embed(Seq(("d_0", "some text")).toDF("id", "text"), "text", embed)
    val slots = RagPipeline.Slots(grade = (_, _) => false,
      answer = (_, docs) => s"docs=${docs.size}")
    val res = RagPipeline.execute(spark, Map("S" -> store), "q", Seq.empty, embed,
      _ => "", RagPipeline.Config(scoreThreshold = 0.0, gradeEnabled = true), slots)
    assert(res.answer == "docs=0")
  }

  test("end-to-end vecsearch route over a stub store") {
    val embed = Embedder.stubEmbed(16)
    val docs = Seq("spark catalyst optimizer", "streaming watermark windows",
      "vector similarity search")
    val store = Embedder.embed(
      docs.zipWithIndex.map { case (t, i) => (s"d_$i", t) }.toDF("id", "text"),
      "text", embed)
    val res = RagPipeline.execute(spark, Map("S1" -> store),
      "catalyst optimizer", Seq.empty, embed, _ => "",
      RagPipeline.Config(topK = 2, scoreThreshold = 0.0))
    assert(res.route == RagPipeline.VecSearch)
    val top = res.docs.select("text").as[String].collect()
    assert(top.contains("spark catalyst optimizer"))
  }

  test("combined route: classifier picks nl2sql for aggregate-ish questions " +
       "(multi_tool.py:108-120)") {
    val res = RagPipeline.execute(spark, Map.empty,
      "how many orders total", Seq.empty, Embedder.stubEmbed(8),
      q => s"SQL[$q]", vecSearchEnabled = true, nl2sqlEnabled = true)
    assert(res.route == RagPipeline.Combined)
    assert(res.answer == "SQL[how many orders total]")
  }

  test("combined route: vecsearch-classified question skips SQL") {
    val embed = Embedder.stubEmbed(8)
    val store = Embedder.embed(Seq(("d_0", "catalyst rules")).toDF("id", "text"), "text", embed)
    var sqlCalled = false
    val res = RagPipeline.execute(spark, Map("S" -> store),
      "tell me about catalyst", Seq.empty, embed,
      _ => { sqlCalled = true; "SQL" },
      RagPipeline.Config(scoreThreshold = 0.0),
      vecSearchEnabled = true, nl2sqlEnabled = true)
    assert(res.route == RagPipeline.Combined && !sqlCalled)
  }

  test("combined route with 'both' classifier synthesizes SQL and search answers " +
       "(multi_tool.py:122-181)") {
    val embed = Embedder.stubEmbed(8)
    val store = Embedder.embed(Seq(("d_0", "spark docs")).toDF("id", "text"), "text", embed)
    val slots = RagPipeline.Slots(classify = _ => "both",
      synthesize = (q, sqlAns, vsAns) => s"merged($sqlAns + $vsAns)")
    val res = RagPipeline.execute(spark, Map("S" -> store),
      "question", Seq.empty, embed, _ => "sql-answer",
      RagPipeline.Config(scoreThreshold = 0.0), slots,
      vecSearchEnabled = true, nl2sqlEnabled = true)
    assert(res.answer.startsWith("merged(sql-answer + "))
  }

  test("rephrase slot fires only with ≥2 turns of history (vs_rephrase guard)") {
    val embed = Embedder.stubEmbed(8)
    val store = Embedder.embed(Seq(("d_0", "alpha beta")).toDF("id", "text"), "text", embed)
    var rephrased = 0
    val slots = RagPipeline.Slots(rephrase = (q, _) => { rephrased += 1; q + " (re)" })
    val cfg = RagPipeline.Config(scoreThreshold = 0.0, rephraseEnabled = true)
    RagPipeline.execute(spark, Map("S" -> store), "q", Seq.empty, embed, _ => "",
      cfg, slots)
    assert(rephrased == 0) // no history → skipped
    val hist = Seq("user" -> "a", "assistant" -> "b")
    RagPipeline.execute(spark, Map("S" -> store), "q", hist, embed, _ => "", cfg, slots)
    assert(rephrased == 1)
  }

  test("SELECT-only guard accepts queries, rejects DDL/DML (embed/utils.py:35-70)") {
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("guard_t")
    assert(SelectOnly.isSelectOnly(spark, "SELECT * FROM guard_t"))
    assert(SelectOnly.isSelectOnly(spark, "WITH x AS (SELECT 1) SELECT * FROM x"))
    assert(!SelectOnly.isSelectOnly(spark, "DROP TABLE guard_t"))
    assert(!SelectOnly.isSelectOnly(spark, "INSERT INTO guard_t VALUES (2, 'b')"))
    assert(!SelectOnly.isSelectOnly(spark, "CREATE TABLE z (a INT) USING parquet"))
    assert(!SelectOnly.isSelectOnly(spark, "not sql at all"))
    assert(SelectOnly.runSelectOnly(spark, "SELECT 1 AS one").count() == 1)
    intercept[IllegalArgumentException](
      SelectOnly.runSelectOnly(spark, "DROP TABLE guard_t"))
  }

  test("result cap errors past maxRows (reference database/sql.py:19-24)") {
    spark.range(100).createOrReplaceTempView("cap_t")
    intercept[IllegalStateException](
      SelectOnly.executeCapped(spark, "SELECT * FROM cap_t", maxRows = 50))
    assert(SelectOnly.executeCapped(spark, "SELECT * FROM cap_t", maxRows = 200)
      .count() == 100)
  }
}
