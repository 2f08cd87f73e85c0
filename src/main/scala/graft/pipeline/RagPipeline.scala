package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** RAG query pipeline with build-time conditional topology.
  *
  * Mirrors the reference's vecsearch Flow graph — optional rephrase →
  * optional discovery/table-selection → retrieve (always) → optional grade →
  * format answer (reference: src/server/app/agentspec/flow_vecsearch.py:
  * 307-443), with LLM steps as injected function slots exactly where the
  * reference has LlmNodes (rephrase vs_rephrase.py:35-145, selection
  * vs_retriever.py:53-127, grade vs_grade.py:27-99, synthesize
  * multi_tool.py:122-139). Deterministic default slots make the pipeline
  * fully testable offline.
  *
  * Route resolution matches runtime/common.py:86-96: LLM_ONLY / NL2SQL /
  * VECSEARCH / COMBINED from the enabled-tools set; COMBINED classifies then
  * runs both branches and synthesizes (multi_tool.py:141-181).
  */
object RagPipeline {

  /** Token-usage accounting folded across pipeline steps/models
    * (reference A5: runtime/common.py:150-160 `add_usage`;
    * langgraph/session.py:87-109). */
  case class TokenUsage(prompt: Long = 0, completion: Long = 0) {
    def total: Long = prompt + completion
    def +(other: TokenUsage): TokenUsage =
      TokenUsage(prompt + other.prompt, completion + other.completion)
  }

  object TokenUsage {
    def fold(usages: Seq[TokenUsage]): TokenUsage =
      usages.foldLeft(TokenUsage())(_ + _)

    /** Distributed fold over a usage DataFrame (prompt, completion). */
    def foldDf(df: org.apache.spark.sql.DataFrame): TokenUsage = {
      val r = df.agg(sum("prompt").as("p"), sum("completion").as("c")).head()
      TokenUsage(Option(r.get(0)).map(_.toString.toLong).getOrElse(0L),
        Option(r.get(1)).map(_.toString.toLong).getOrElse(0L))
    }
  }

  sealed trait Route
  case object LlmOnly extends Route
  case object Nl2Sql extends Route
  case object VecSearch extends Route
  case object Combined extends Route

  /** reference runtime/common.py:86-96 */
  def resolveRoute(vecSearchEnabled: Boolean, nl2sqlEnabled: Boolean): Route =
    (vecSearchEnabled, nl2sqlEnabled) match {
      case (true, true)   => Combined
      case (true, false)  => VecSearch
      case (false, true)  => Nl2Sql
      case (false, false) => LlmOnly
    }

  /** LLM-step function slots (deterministic defaults; swap in real models
    * in production). */
  case class Slots(
      rephrase: (String, Seq[(String, String)]) => String =
        (q, hist) => q, // reference falls back to the original on any issue
      selectTables: (String, Seq[String]) => Seq[String] =
        (_, catalog) => catalog.take(3), // reference caps at DEFAULT_MAX_TABLES=3
      grade: (String, String) => Boolean = (_, _) => true, // API failure → "yes"
      answer: (String, Seq[String]) => String =
        (q, docs) => s"[$q] -> ${docs.size} docs",
      classify: String => String = q =>
        if (q.toLowerCase.matches(".*\\b(sum|count|average|total|how many)\\b.*")) "nl2sql"
        else "vecsearch",
      synthesize: (String, String, String) => String =
        (q, sqlAns, vsAns) => s"$sqlAns\n$vsAns")

  case class Config(
      topK: Int = 8,            // reference core/schemas.py:52
      scoreThreshold: Double = 0.65, // :53
      fetchK: Int = 20,         // :54
      lambdaMult: Double = 0.5, // :55
      searchType: String = "similarity", // or "mmr"
      rephraseEnabled: Boolean = false,
      gradeEnabled: Boolean = false)

  case class Result(answer: String, docs: DataFrame, route: Route)

  /** Conversation history rendered to the reference's wire format
    * (reference: runtime/common.py:100-117): each user turn becomes
    * "User: content", each assistant turn "Assistant: content", any
    * other role is SKIPPED, lines join with "\n" and a trailing "\n"
    * is appended iff any labeled turn survived. Columnar (sort_array +
    * filter + transform + array_join over an array of
    * struct(ord, role, content) built per group), so the formatting
    * runs distributed over however many conversations the corpus
    * holds; q555 hash-gates it. */
  def historyTextFromTurns(turns: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val sorted = sort_array(turns)
    val labeled = filter(sorted,
      t => t.getField("role").isin("user", "assistant"))
    val lines = transform(labeled, t =>
      concat(when(t.getField("role") === "user", lit("User: "))
        .otherwise(lit("Assistant: ")), t.getField("content")))
    when(size(lines) > 0, concat(array_join(lines, "\n"), lit("\n")))
      .otherwise(lit(""))
  }

  /** Labeled-turn count of a wire-format history STRING — the rule
    * vs_rephrase applies when an MCP client sends history as plain text
    * rather than a list (reference: vs_rephrase.py:100-115): the count
    * is occurrences of "User:" plus occurrences of "Assistant:"
    * (labels stored without the trailing space precisely so this
    * counting works); rephrase needs >= MIN_CHAT_HISTORY_FOR_REPHRASE
    * = 2. Occurrence counting via the length-difference identity, so
    * the same expression replays in SQL. */
  def labeledTurnCount(historyText: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (((length(historyText)
        - length(replace(historyText, lit("User:"), lit("")))) / 5)
      + ((length(historyText)
        - length(replace(historyText, lit("Assistant:"), lit("")))) / 10))
      .cast("long")

  /** Single-line-or-original rephrase guard
    * (reference: vs_rephrase.py:35-45 — multi-line or empty output is
    * rejected in favor of the original question). */
  def guardRephrase(original: String, rephrased: String): String = {
    val t = rephrased.trim
    if (t.isEmpty || t.contains("\n")) original else t
  }

  /** Strip ```json fences from an LLM payload
    * (reference: vs_retriever.py:35, :106-111). */
  def unfence(s: String): String =
    s.trim.replaceAll("(?s)^```(?:json)?\\s*", "").replaceAll("\\s*```$", "").trim

  /** Validate an LLM table-selection payload against the real catalog
    * (reference L3, vs_retriever.py:53-127): unfence, extract the JSON
    * string list, keep only names that exist, cap at `maxTables` (=3,
    * DEFAULT_MAX_TABLES), fall back to the first catalog table when nothing
    * valid survives. */
  def validateTableSelection(raw: String, catalog: Seq[String],
                             maxTables: Int = 3): Seq[String] = {
    val names = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(unfence(raw)).map(_.group(1)).toSeq
    val valid = names.filter(catalog.contains).distinct.take(maxTables)
    if (valid.nonEmpty) valid else catalog.take(1)
  }

  /** Vector-search branch: rephrase? → select stores → per-store top-k →
    * normalize/threshold/dedup/global top-k → grade? → answer. */
  def vecSearch(spark: SparkSession, stores: Map[String, DataFrame],
                question: String, history: Seq[(String, String)],
                embed: Embedder.EmbedFn, cfg: Config, slots: Slots): Result = {
    // rephrase only with ≥2 turns of history (reference vs_rephrase.py
    // guard); a THROWING rephrase slot falls back to the original
    // question exactly like a malformed one (vs_rephrase.py:35-45
    // rejects "on any issue" — API failure included)
    val q0 = if (cfg.rephraseEnabled && history.size >= 2)
      guardRephrase(question,
        try slots.rephrase(question, history)
        catch { case scala.util.control.NonFatal(_) => question })
    else question
    // table-selection failure → first catalog table, the same fallback
    // validateTableSelection applies to an unparseable payload
    // (reference: vs_retriever.py:53-127)
    val catalog = stores.keys.toSeq.sorted
    val selected = (try slots.selectTables(q0, catalog)
      catch { case scala.util.control.NonFatal(_) => catalog.take(1) })
      .take(3)
    val qVec = embed(Seq(q0)).head.toSeq
    val perStore = selected.flatMap { name =>
      stores.get(name).map { df =>
        name -> Similarity.topK(df, "embedding", qVec, cfg.topK, "COSINE", "id")
          .select(col("id"), col("text"), col("score"))
      }
    }
    val merged =
      if (perStore.isEmpty) spark.emptyDataFrame
      else Similarity.multiStoreSearch(perStore, cfg.scoreThreshold, cfg.topK)
    val docs = merged.collect().map(_.getAs[String]("text")).toSeq
    // grade slot failure → "yes" (docs kept): the reference treats a
    // grading-API error as a pass vote rather than emptying the answer
    // (reference: vs_grade.py:94-99) — degradation must not destroy
    // retrieval the user already paid for
    val vote = if (!cfg.gradeEnabled) true
      else try slots.grade(q0, docs.mkString("\n"))
      catch { case scala.util.control.NonFatal(_) => true }
    val graded = if (vote) docs
      else Seq.empty[String] // "no" empties the docs (vs_grade contract)
    Result(slots.answer(q0, graded), merged, VecSearch)
  }

  /** Full routed chat execution (§3.1 of SURVEY.md). */
  def execute(spark: SparkSession, stores: Map[String, DataFrame],
              question: String, history: Seq[(String, String)],
              embed: Embedder.EmbedFn,
              runSql: String => String,
              cfg: Config = Config(), slots: Slots = Slots(),
              vecSearchEnabled: Boolean = true,
              nl2sqlEnabled: Boolean = false): Result =
    resolveRoute(vecSearchEnabled, nl2sqlEnabled) match {
      case LlmOnly => Result(slots.answer(question, Seq.empty), spark.emptyDataFrame, LlmOnly)
      case VecSearch => vecSearch(spark, stores, question, history, embed, cfg, slots)
      case Nl2Sql => Result(runSql(question), spark.emptyDataFrame, Nl2Sql)
      case Combined =>
        // classifier parse/API failure → "both" (run both tools and
        // synthesize): the reference's degradation contract when the
        // routing LLM returns garbage (reference: multi_tool.py:118-120)
        val label = try slots.classify(question)
          catch { case scala.util.control.NonFatal(_) => "both" }
        label match {
          case "nl2sql" => Result(runSql(question), spark.emptyDataFrame, Combined)
          case "vecsearch" =>
            vecSearch(spark, stores, question, history, embed, cfg, slots).copy(route = Combined)
          case _ =>
            val vs = vecSearch(spark, stores, question, history, embed, cfg, slots)
            val sqlAns = runSql(question)
            Result(slots.synthesize(question, sqlAns, vs.answer), vs.docs, Combined)
        }
    }
}
