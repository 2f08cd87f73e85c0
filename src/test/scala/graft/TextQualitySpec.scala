package graft

import org.apache.spark.sql.functions._
import graft.operators.TextQuality

class TextQualitySpec extends SparkSpec {

  test("tokenLinesFromText equals tokenLines(tokens(text), width) for all widths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq("", " ", "one", "a b c d e",
      " lead  and \t tab \n newline trail ",
      (1 to 40).map(i => s"t$i").mkString(" ")).toDF("text")
    for (w <- Seq(1, 3, 12)) {
      val rows = docs
        .withColumn("_toks", graft.operators.TextQuality.tokens(col("text")))
        .select(
          graft.operators.TextQuality.tokenLinesFromText(col("text"), w).as("native"),
          graft.operators.TextQuality.tokenLines("_toks", w).as("hofv"))
        .collect()
      rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), s"w=$w"))
    }
  }
  import spark.implicits._

  test("gopher metrics match hand computation") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextQuality.gopherMetrics(df, "doc_id", "text").head()
    assert(r.getAs[Int]("n_words") == 6)
    assert(r.getAs[Double]("mean_word_len") == 17.0 / 6) // t-h-e c-a-t ... 17 chars
    assert(r.getAs[Double]("stopword_frac") == 3.0 / 6) // the, on, the
    assert(r.getAs[Double]("unique_frac") == 5.0 / 6) // 'the' repeats
    assert(r.getAs[Int]("max_word_len") == 3)
    assert(!r.getAs[Boolean]("quality_pass")) // fails n_words >= 30
  }

  test("bigram repetition: dup and top fractions match hand computation") {
    // bigrams: "a b","b a","a b","b c" → 4 total, 3 distinct, top "a b"=2
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = TextQuality.bigramRepetition(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_bigrams") == 4L)
    assert(r.getAs[Long]("distinct_bigrams") == 3L)
    assert(r.getAs[Double]("dup_bigram_frac") == 1.0 - 3.0 / 4)
    assert(r.getAs[Double]("top_bigram_frac") == 2.0 / 4)
  }

  test("a perfectly repetitive doc maxes the duplicate fraction") {
    val df = Seq((1L, ("x y " * 50).trim)).toDF("doc_id", "text")
    val r = TextQuality.bigramRepetition(df, "doc_id", "text").head()
    assert(r.getAs[Long]("n_bigrams") == 99L)
    assert(r.getAs[Long]("distinct_bigrams") == 2L) // "x y" and "y x"
    assert(r.getAs[Double]("top_bigram_frac") == 50.0 / 99)
  }

  test("tf-idf ranks doc-exclusive frequent terms first") {
    val df = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val r = TextQuality.tfidfTopTerms(df, "doc_id", "text", 1)
      .orderBy("doc_id").as[(Long, Int, String, Double)].collect()
    // doc1: x has tf=2, df=1 → 2·2/1 = 4; doc2: z has tf=1, df=1 → 2
    assert(r.toSeq == Seq((1L, 1, "x", 4.0), (2L, 1, "z", 2.0)))
  }

  test("rare-bigram stats match hand computation against the corpus LM") {
    // corpus bigrams: "a b" ×3 (docs 1,1,2), "b a" ×1 (doc 1), "c d" ×1
    // (doc 3) — with rareMax=2 the "a b" occurrences are common (count 3),
    // "b a" and "c d" are rare
    val df = Seq(
      (1L, "a b a b"),   // bigrams: a b, b a, a b
      (2L, "a b"),       // bigram: a b
      (3L, "c d")).toDF("doc_id", "text")
    val r = TextQuality.rareBigramStats(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_bigrams", "n_rare", "rare_frac", "min_count")
      .as[(Long, Long, Double, Long)].collect()
    assert(r(0) == ((3L, 1L, 1.0 / 3.0, 1L))) // doc 1: b a is rare
    assert(r(1) == ((1L, 0L, 0.0, 3L)))       // doc 2: a b is common
    assert(r(2) == ((1L, 1L, 1.0, 1L)))       // doc 3: c d is rare
  }

  test("pii redaction counts and masks emails and ipv4s") {
    val df = Seq(
      (1L, "reach me at bob@corp.example or 192.168.0.12 thanks"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val r = TextQuality.piiRedact(df, "text").orderBy("doc_id")
      .select("n_emails", "n_ips", "redacted").as[(Int, Int, String)].collect()
    assert(r(0) == ((1, 1, "reach me at <EMAIL> or <IP> thanks")))
    assert(r(1) == ((0, 0, "no pii here at all")))
  }

  test("cleanBlock: longest contiguous passing run; no-pass doc keeps a zero row") {
    // pass iff >= 2 words and no 'bad'
    val df = Seq(
      (1L, Seq("one two", "bad here", "a b", "c d", "e f", "bad x", "y z")),
      (2L, Seq("bad", "bad")),
      (3L, Seq[String]()))
      .toDF("doc_id", "lines")
    val out = graft.operators.TextQuality
      .cleanBlock(df, "doc_id", "lines", minWords = 2, blocklist = Seq("bad"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), if (r.isNullAt(2)) None else Some(r.getInt(2)),
          r.getLong(3)))).toMap
    assert(out(1L) == ((7, Some(2), 3L))) // run [2,3,4] beats [0] and [6]
    assert(out(2L) == ((2, None, 0L)))
    assert(out(3L) == ((0, None, 0L)))
  }

  test("boilerplatePrefix: modal prefix share and template flag") {
    val df = Seq(
      ("s1", "h1 h2 t a"), ("s1", "h1 h2 t b"), ("s1", "other text x"),
      ("s2", "u v w"), ("s2", "p q r"))
      .toDF("source", "text")
    val out = graft.operators.TextQuality
      .boilerplatePrefix(df, "source", "text", prefixTokens = 3,
        shareThreshold = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    assert(out("s1") == ((3L, "h1 h2 t", 2L, 2.0 / 3, true)))
    // s2: 1-1 tie -> lexicographically smaller prefix wins, share 0.5
    assert(out("s2") == ((2L, "p q r", 1L, 0.5, true)))
  }

  test("globalLineDedup: first (doc, idx) occurrence wins; empty docs fp 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, Seq("A", "B")), (2L, Seq("B", "C")), (3L, Seq("A")))
      .toDF("doc_id", "lines")
    val out = graft.operators.TextQuality
      .globalLineDedup(df, "doc_id", "lines")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def fp(t: String) =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    assert(out(1L) == ((2L, 0L, fp("A B"))))
    assert(out(2L) == ((1L, 1L, fp("C"))))
    assert(out(3L) == ((0L, 1L, 0L)))
  }

  test("topNgramFractions: exact fractions, short docs fall back to 0") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, "ab ab ab cd"),   // top2 "ab ab"×2, chars=4 → 8/10
      (2L, "x")).toDF("doc_id", "text") // 1 token: both fracs 0
    val out = graft.operators.TextQuality
      .topNgramFractions(df, "doc_id", "text", Seq(2, 3), Seq(0.5, 0.5))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // doc1 tok_chars=8 (separator-free); top 2-gram "ab ab" count 2,
    // gram chars 4 → 8/8 = 1.0; top 3-gram: all distinct, tie →
    // lexicographically-last "ab ab cd" count 1, chars 6 → 0.75
    assert(out(1L) == ((1.0, 0.75, false)))
    assert(out(2L) == ((0.0, 0.0, true)))
  }

  test("dupNgramCoverage: interval union never double-counts overlaps") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // doc1: "a b c a b c a b" — duplicated 2-grams "a b"(×3),"b c"(×2),
    // "c a"(×2) cover positions 1..8 entirely → coverage 8/8
    // doc2: all distinct bigrams → 0
    val df = Seq(
      (1L, "a b c a b c a b"),
      (2L, "p q r s")).toDF("doc_id", "text")
    val out = graft.operators.TextQuality
      .dupNgramCoverage(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((8L, 8L, 1.0)))
    assert(out(2L) == ((4L, 0L, 0.0)))
  }

  test("fleschMetrics: exact counts and coefficients, 0-word guard") {
    val df = Seq((1L, "The cat sat. It ran!"), (2L, "")).toDF("doc_id", "text")
    val out = TextQuality.fleschMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    // words 5; sentences 2 ('.'+'!'); vowel groups e,a,a,i,a = 5
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 2L && r1.getLong(3) == 5L)
    val ease = BigDecimal(206.835 - 1.015 * 2.5 - 84.6 * 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val grade = BigDecimal(0.39 * 2.5 + 11.8 * 1.0 - 15.59)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getDouble(4) == ease && r1.getDouble(5) == grade)
    assert(!r1.getBoolean(6)) // 119.7 ease is not hard text
    // empty doc: sentence floor 1, null scores, null flag
    val r2 = out(2L)
    assert(r2.getLong(1) == 0L && r2.getLong(2) == 1L)
    assert(r2.isNullAt(4) && r2.isNullAt(5) && r2.isNullAt(6))
  }

  test("rakeKeywords: deg/freq word scores, phrase sums, hand-computed") {
    val df = Seq((1L, "deep learning of deep networks. deep learning wins"))
      .toDF("doc_id", "text")
    val out = TextQuality.rakeKeywords(df, "doc_id", "text", 10)
      .collect().map(r => r.getString(1) ->
        ((r.getInt(0), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // deep: freq 3, deg 2+2+3=7; learning: freq 2, deg 5; networks 1/2;
    // wins 1/3 → phrase scores 7/3+5/2+3, 7/3+5/2, 7/3+2
    assert(out.keySet == Set("deep learning wins", "deep learning",
      "deep networks"))
    assert(out("deep learning wins") == ((1, 3L, 1L, 7.833333)))
    assert(out("deep learning") == ((2, 2L, 1L, 4.833333)))
    assert(out("deep networks") == ((3, 2L, 1L, 4.333333)))
  }

  test("boilerplateLineShare: cross-doc line df marks template lines") {
    val docs = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "a b z w"),
      (4L, "p q r s")).toDF("doc_id", "text")
    val out = TextQuality.boilerplateLineShare(docs, "doc_id", "text",
        lineTokens = 2, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // "a b" appears in docs 1-3 (df 3) → boilerplate; all others unique
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 1L, 0.5)))
    assert(out(4L) == ((2L, 0L, 0.0)))
  }

  test("charClassEntropy: four distinct transitions give ln 4") {
    val df = Seq((1L, "ab1 c"), (2L, "aaaa")).toDF("doc_id", "text")
    val out = TextQuality.charClassEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    // l→l, l→d, d→s, s→l — uniform over 4 → H = ln 4
    assert(out(1L)._1 == 4L)
    assert(math.abs(out(1L)._2 - math.log(4.0)) < 1e-6)
    // one repeated transition: zero entropy
    assert(out(2L) == ((3L, 0.0)))
  }

  test("extractiveSummary: the line repeating the doc vocabulary outranks the outlier") {
    import spark.implicits._
    // doc 1: lines 0 and 1 share vocabulary (bigrams "a b" "b c" …), line
    // 2 is disjoint — the centroid leans to the majority vocabulary
    val majority = "a b c d a b c d a b c d"      // 12 tokens
    val outlier = "x y z w x y z w x y z w"
    val df = Seq((1L, s"$majority $majority $outlier")).toDF("doc_id", "text")
    val out = TextQuality.extractiveSummary(df, "doc_id", "text", 12, 64, 2)
      .orderBy("rank")
      .select("rank", "line_idx", "line").as[(Int, Int, String)].collect()
    // the two majority lines win (tie on score → smaller line_idx first)
    assert(out.toSeq == Seq((1, 0, majority), (2, 1, majority)))
    // a 1-token doc has no bigram and drops out entirely
    val tiny = Seq((2L, "solo")).toDF("doc_id", "text")
    assert(TextQuality.extractiveSummary(tiny, "doc_id", "text").count() == 0)
  }

  test("encodingAudit: counts signatures, flags only corrupted docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean ascii text"),
      (2L, "smart quote ruin: â€œquotedâ€"), // â ×2
      (3L, "latin1 ruin: caffÃ¨ and Ã©tÃ©"),      // Ã ×3
      (4L, "replacement: bad�byte"),
      (5L, "tab\tand newline\nare non-print")).toDF("doc_id", "text")
    val out = TextQuality.encodingAudit(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_mojibake") == 0L &&
      !out(1L).getAs[Boolean]("is_suspect"))
    assert(out(2L).getAs[Long]("n_mojibake") == 2L &&
      out(2L).getAs[Boolean]("is_suspect"))
    assert(out(3L).getAs[Long]("n_mojibake") == 3L)
    assert(out(4L).getAs[Long]("n_replacement") == 1L &&
      out(4L).getAs[Boolean]("is_suspect"))
    // control chars count as non-printable but are NOT mojibake
    assert(out(5L).getAs[Long]("n_non_print") == 2L &&
      !out(5L).getAs[Boolean]("is_suspect"))
    // n_chars counts code points
    assert(out(1L).getAs[Long]("n_chars") == 16L)
  }

  test("scriptMix: homoglyph spoofing flags confusable_risk; pure scripts don't") {
    val docs = Seq(
      (1L, "plain ascii text 42"),          // latin + digits only
      (2L, "bаnаnа bread"),  // Cyrillic 'а' homoglyphs in latin
      (3L, "привет"), // pure Cyrillic
      (4L, "lοgοs"),              // Greek 'ο' homoglyphs
      (5L, "12345"))                        // digits only
      .toDF("doc_id", "text")
    val out = TextQuality.scriptMix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_latin") == 14L &&
      !out(1L).getAs[Boolean]("mixed_script") &&
      !out(1L).getAs[Boolean]("confusable_risk"))
    assert(out(2L).getAs[Long]("n_cyrillic") == 3L &&
      out(2L).getAs[Boolean]("confusable_risk"))
    // pure Cyrillic is a different language, NOT a spoof
    assert(out(3L).getAs[Long]("n_cyrillic") == 6L &&
      out(3L).getAs[Long]("n_latin") == 0L &&
      !out(3L).getAs[Boolean]("confusable_risk"))
    assert(out(4L).getAs[Long]("n_greek") == 2L &&
      out(4L).getAs[Boolean]("mixed_script") &&
      out(4L).getAs[Boolean]("confusable_risk"))
    assert(out(5L).getAs[Long]("n_digit") == 5L &&
      !out(5L).getAs[Boolean]("mixed_script"))
  }

  test("oovRate: head vocab covers source A fully; source B half OOV") {
    // global cf: a=3, b=1, z=1 → top-2 vocab (cf desc, tok asc) = {a, b}
    val docs = Seq(("A", "a a b"), ("B", "a z")).toDF("source", "text")
    val out = TextQuality.oovRate(docs, "source", "text", vocabSize = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("n_oov") == 0L &&
      out("A").getAs[Double]("oov_rate") == 0.0)
    assert(out("B").getAs[Long]("n_tokens") == 2L &&
      out("B").getAs[Long]("n_oov") == 1L)
    assert(out("B").getAs[Double]("oov_rate") == 0.5 &&
      out("B").getAs[Double]("type_oov_rate") == 0.5)
  }
}
