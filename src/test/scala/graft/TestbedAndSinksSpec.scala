package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.testbed.Testbed
import graft.sources.ChunkJson
import graft.operators.Joins

class TestbedAndSinksSpec extends SparkSpec {
  import spark.implicits._

  test("testbed: answer → judge → report pipeline (reference §3.3)") {
    val qa = Seq(
      Testbed.QARecord("1", "what is top_k", "8", "ctx", "retrieval"),
      Testbed.QARecord("2", "what is threshold", "0.65", "ctx", "retrieval"),
      Testbed.QARecord("3", "what is fetch_k", "20", "ctx", "mmr")).toDS()
    val answered = Testbed.collectAnswers(qa, q => if (q.contains("top_k")) "8" else "wrong")
    val judged = Testbed.judge(answered, (_, a, ref) => a == ref)
    val report = Testbed.report(judged)
    assert(report.n == 3)
    assert(math.abs(report.correctness - 1.0 / 3.0) < 1e-12)
    assert(report.byTopic("retrieval") == 0.5 && report.byTopic("mmr") == 0.0)
  }

  test("testset generation applies the min-chunk floor (generation.py:26-29)") {
    val docs = Seq((1L, "a" * 200), (2L, "b" * 10)).toDF("doc_id", "text")
    val ts = Testbed.generateTestset(docs, "text", "doc_id",
      questions = 3, chunkSize = 20, minChunks = 5)
    val topics = ts.select("topic").as[String].collect().toSet
    assert(topics == Set("1")) // doc 2 has 1 chunk < 5 → filtered
    assert(ts.count() == 3)    // capped at `questions`
  }

  test("chunk JSON sink/source round-trip (reference S7 shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString + "/chunks"
    val chunks = Seq(
      ("d_0", "hello", Map("filename" -> "f", "start_index" -> "0")),
      ("d_1", "world", Map("filename" -> "f", "start_index" -> "5")))
      .toDF("id", "text", "metadata")
    ChunkJson.write(chunks, dir)
    val back = ChunkJson.read(spark, dir)
      .select("id", "text").as[(String, String)].collect().toMap
    assert(back == Map("d_0" -> "hello", "d_1" -> "world"))
    val meta = ChunkJson.read(spark, dir)
      .filter(col("id") === "d_1")
      .select(element_at(col("metadata"), "start_index")).as[String].head()
    assert(meta == "5")
  }

  test("csv sink round-trips with header (reference S14)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/out"
    ChunkJson.writeCsv(Seq((1L, "x"), (2L, "y")).toDF("k", "v"), dir)
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    val back = ChunkJson.readCsv(spark, dir, schema).as[(Long, String)].collect().toSet
    assert(back == Set((1L, "x"), (2L, "y")))
  }

  test("salted join preserves equi-join semantics") {
    val left = (1 to 100).map(i => (i % 3, i)).toDF("k", "v")
    val right = Seq((0, "zero"), (1, "one"), (2, "two")).toDF("k", "name")
    val plain = left.join(right, "k").agg(count(lit(1)), sum("v")).head()
    val salted = Joins.saltedJoin(left, right, "k", 4).agg(count(lit(1)), sum("v")).head()
    assert(plain.getLong(0) == salted.getLong(0))
    assert(plain.getLong(1) == salted.getLong(1))
  }

  test("insertIfAbsent / deleteMatching anti-join shapes (reference J1/J2)") {
    val existing = Seq(("a", 1), ("b", 2)).toDF("id", "v")
    val incoming = Seq(("b", 9), ("c", 3)).toDF("id", "v")
    assert(Joins.insertIfAbsent(incoming, existing, "id")
      .select("id").as[String].collect().toSeq == Seq("c"))
    assert(Joins.deleteMatching(existing, incoming, "id")
      .select("id").as[String].collect().toSeq == Seq("a"))
  }

  test("slugify collapses non-word runs and trims edges") {
    import graft.functions.{TextFunctions => TF}
    val out = Seq("Hello, World!  42").toDF("t")
      .select(TF.slugify(col("t"))).as[String].head()
    assert(out == "hello-world-42")
  }

  test("nfkc normalization collapses whitespace and compatibility forms") {
    import graft.functions.{TextFunctions => TF}
    val out = Seq("ﬁle    name").toDF("t")
      .select(TF.nfkcNormalize(col("t"))).as[String].head()
    assert(out == "file name")
  }
}
