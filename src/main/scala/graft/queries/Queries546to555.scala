package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators._
import QueryHelpers._

/** Round-9 additions: the scalable FW-BW SCC twin (closing the one
  * remaining graph-at-scale gap the r8 verdict named) and its
  * condensation/critical-path consumer, the session-TIMEOUT and
  * stream-stream OUTER-JOIN watermark semantics under the hash gate,
  * the route matrix's failure/degradation legs, the history
  * wire-format contract, bidirectional point distance, incremental
  * WCC maintenance, and the Mood / negative-binomial statistics. */
private[graft] object Queries546to555 extends QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q546_scc_fwbw" -> ((s, dir) => {
      // q538's strongly-connected components computed by the SCALE
      // path: forward-backward pivot decomposition with trim cascades
      // — per-partition BFS node sets instead of the definitional
      // closure's O(n·reach) pair materialization, so the same
      // operator runs on an UNCONTRACTED 100 TB graph (ScaleProbe pins
      // rounds flat under disjoint edge replication). Same input, same
      // definitional oracle as q538: one algorithm gate, two engine
      // paths (the q98/q106 stored-vs-scan pattern applied to an
      // algorithm pair)
      val li = tbl(s, dir, "lineitem").filter(col("l_quantity") <= 1)
        .select((col("l_partkey") % 512).as("src"),
          (col("l_suppkey") % 512).as("dst"))
      GraphAnalytics.sccLabelsFwBw(li, "src", "dst",
          shufflePartitions = Some(8))
        .orderBy("node")
    }),

    "q547_timeout_replay" -> ((s, dir) => {
      // flatMapGroupsWithState EVENT-TIME TIMEOUT semantics under the
      // hash gate (q524's replay discipline applied to the custom-state
      // sessionizer): a real 3-micro-batch execution in global event-
      // time order, 12-hour session gap — sessions close EITHER by an
      // arriving successor or by the watermark passing last + gap, and
      // open tails (users active within ~12h10m of stream end) are
      // never emitted; the oracle replays gap-split + the strict
      // final-watermark cut. Integral cents keep the per-session fold
      // exact; boundary strictness pinned by StreamingSpec
      import s.implicits._
      val rows = events(s, dir)
        .filter(col("event_id") < 3000 && col("value").isNotNull)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"),
          round(col("value") * 100).cast("double").as("cents"))
        .orderBy("ts", "event_id")
        .as[(Long, java.sql.Timestamp, Long, String, Double)]
        .collect()
      val n = rows.length
      val batches = Seq(rows.slice(0, n / 3), rows.slice(n / 3, 2 * n / 3),
          rows.slice(2 * n / 3, n))
        .map(_.map(t => graft.streaming.EventStreams.Event(
          t._1, t._2, t._3, t._4, t._5)).toSeq)
      graft.streaming.EventStreams.replaySessionTimeout(s, batches,
          gapMs = 43200000L)
        .select(col("user_id"),
          col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("n_events"), col("sum_value").as("sum_cents"))
        .orderBy("user_id", "session_start")
    }),

    "q548_route_failures" -> ((s, dir) => {
      // the route matrix's DEGRADATION legs (q509 pinned the happy
      // paths): every LLM-slot failure mode the reference survives,
      // under the oracle gate — rephrase throw/multi-line/empty →
      // original question (vs_rephrase.py:35-45), grade API failure →
      // "yes" so retrieval is kept (vs_grade.py:94-99), classifier
      // throw/garbage label → "both" (multi_tool.py:118-120), and
      // table-selection unparseable payload / throw → first catalog
      // table (vs_retriever.py:53-127). The oracle restates each leg's
      // route, doc count and answer from embeddings + documents
      import pipeline.RagPipeline
      val e = tbl(s, dir, "embeddings")
      def storeOf(parity: Int) = e.filter(col("label") % 2 === parity)
        .select(col("vec_id").as("id"),
          concat(lit("vec-"), col("vec_id") % 50).as("text"),
          col("embedding"))
      val stores = Map("docs_even" -> storeOf(0), "docs_odd" -> storeOf(1))
      val vecMap = e.filter(col("vec_id") === 3L)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val embedFn: pipeline.Embedder.EmbedFn = texts => texts.map { t =>
        vecMap("\\d+".r.findFirstIn(t).map(_.toLong).getOrElse(3L))
      }
      tbl(s, dir, "documents").createOrReplaceTempView("graft_docs_rf")
      val runSql: String => String = _ => {
        val c = plans.SelectOnly.executeCapped(s,
          "SELECT count(*) AS n FROM graft_docs_rf").head().getLong(0)
        s"docs=$c"
      }
      val hist = Seq(("turn1", "reply1"), ("turn2", "reply2"))
      val qVec = "describe vec 3 design patterns"
      def boom[A]: A = throw new RuntimeException("injected slot failure")
      val base = RagPipeline.Slots()
      val cases: Seq[(Int, String, RagPipeline.Config, RagPipeline.Slots,
          Boolean, Boolean)] = Seq(
        (0, "rephrase_throws",
          RagPipeline.Config(rephraseEnabled = true),
          base.copy(rephrase = (_, _) => boom), true, false),
        (1, "rephrase_multiline",
          RagPipeline.Config(rephraseEnabled = true),
          base.copy(rephrase = (_, _) => "line one\nline two"),
          true, false),
        (2, "rephrase_empty",
          RagPipeline.Config(rephraseEnabled = true),
          base.copy(rephrase = (_, _) => "   "), true, false),
        (3, "grade_throws",
          RagPipeline.Config(gradeEnabled = true),
          base.copy(grade = (_, _) => boom), true, false),
        (4, "classify_throws", RagPipeline.Config(),
          base.copy(classify = _ => boom), true, true),
        (5, "classify_garbage", RagPipeline.Config(),
          base.copy(classify = _ => "garbled-label"), true, true),
        (6, "select_unparseable", RagPipeline.Config(),
          base.copy(selectTables = (_, cat) =>
            RagPipeline.validateTableSelection(
              "```json\n[\"not_a_table\", 42]\n```", cat)), true, false),
        (7, "select_throws", RagPipeline.Config(),
          base.copy(selectTables = (_, _) => boom), true, false))
      val out = cases.map { case (cid, fail, cfg, slots, von, son) =>
        val res = RagPipeline.execute(s, stores, qVec, hist, embedFn,
          runSql, cfg = cfg, slots = slots,
          vecSearchEnabled = von, nl2sqlEnabled = son)
        (cid, fail, res.route.toString.toLowerCase, res.docs.count(),
          res.answer)
      }
      import s.implicits._
      out.toDF("case_id", "failure", "route", "n_docs", "answer")
        .withColumn("case_id", col("case_id").cast("int"))
        .orderBy("case_id")
    }),

    "q549_condensation_dag" -> ((s, dir) => {
      // the SCC CONDENSATION composed with longest-path levels: contract
      // each q546 component to one node and the cyclic flow graph
      // becomes a DAG whose level(v) = critical-path depth — the
      // dependency-scheduling readout (how many sequential waves a
      // rebuild cascade needs) that neither the SCC labels nor plain
      // reachability expose. Consumes the STANDING flow-SCC label frame
      // (cluster state computed once per session by the q546 scale path
      // — the serve-many discipline q554's merge maintains) and
      // dagLevels' max-relaxation, which doubles as a cycle check on
      // the condensation (a cycle would mean the SCC labels were wrong)
      val li = tbl(s, dir, "lineitem").filter(col("l_quantity") <= 1)
        .select((col("l_partkey") % 512).as("src"),
          (col("l_suppkey") % 512).as("dst"))
      val e = li.filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint()
      val scc = flowScc(s, dir).select("node", "scc")
      val ce = e
        .join(scc.select(col("node").as("src"), col("scc").as("su")),
          Seq("src"))
        .join(scc.select(col("node").as("dst"), col("scc").as("sv")),
          Seq("dst"))
        .filter(col("su") =!= col("sv"))
        .select(col("su").as("src"), col("sv").as("dst")).distinct()
      val lvl = GraphAnalytics.dagLevels(ce, "src", "dst")
      scc.groupBy("scc").agg(count(lit(1)).as("n_members"))
        .join(lvl.withColumnRenamed("node", "scc"), Seq("scc"), "left")
        .select(col("scc"), coalesce(col("level"), lit(0L)).as("level"),
          col("n_members"))
        .orderBy("scc")
    }),

    "q550_outer_join_replay" -> ((s, dir) => {
      // stream-stream LEFT OUTER join watermark semantics under the
      // hash gate (the third replay instrument beside q524/q547):
      // views attribute to the same user's clicks within 2 hours; the
      // null-padded row for an unclicked view may only emit once the
      // TWO-STREAM watermark (min across streams, 10-minute delay)
      // strictly passes view + 2h — early emission would be wrong
      // (a match could still arrive), never emitting would be wrong
      // too. Whole-ms quantized timestamps make every boundary exact;
      // three global time-slice batches feed both streams in order
      import s.implicits._
      val sl = events(s, dir)
        .filter(col("event_id") < 4000)
        .select(col("event_id"), col("event_type"),
          expr("timestamp_millis(unix_millis(ts))").as("ts"),
          col("user_id"), col("value"))
        .localCheckpoint()
      val imp = sl.filter(col("event_type") === "view")
        .select(col("ts"), col("user_id"))
        .as[(java.sql.Timestamp, Long)].collect()
        .sortBy(t => (t._1.getTime, t._2))
      val clk = sl.filter(col("event_type") === "click" &&
          col("value").isNotNull)
        .select(col("ts"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[(java.sql.Timestamp, Long, Long)].collect()
        .sortBy(t => (t._1.getTime, t._2))
      // global tercile cut TIMES over the merged timeline, then each
      // stream splits at the same cuts — batch i's rows all precede
      // batch i+1's on both streams
      val allTs = (imp.map(_._1.getTime) ++ clk.map(_._1.getTime)).sorted
      val (c1, c2) = (allTs(allTs.length / 3), allTs(2 * allTs.length / 3))
      def cut[T](rows: Array[T], ts: T => Long): Seq[Seq[T]] = Seq(
        rows.filter(r => ts(r) < c1).toSeq,
        rows.filter(r => ts(r) >= c1 && ts(r) < c2).toSeq,
        rows.filter(r => ts(r) >= c2).toSeq)
      graft.streaming.EventStreams.replayOuterAttribution(s,
          cut[(java.sql.Timestamp, Long)](imp, _._1.getTime),
          cut[(java.sql.Timestamp, Long, Long)](clk, _._1.getTime),
          within = "2 hours", delay = "10 minutes")
        .select(col("ad_id").as("user_id"),
          col("imp_ts").cast("timestamp_ntz").as("view_ts"),
          col("click_ts").cast("timestamp_ntz").as("click_ts"),
          col("click_cents"))
        .orderBy("user_id", "view_ts", "click_ts", "click_cents")
    }),

    "q553_point_distance" -> ((s, dir) => {
      // exact point-to-point hop distance on the standing kNN graph by
      // BIDIRECTIONAL BFS — the meet-in-the-middle point query
      // (O(b^(d/2)) per side where a one-sided sweep pays O(b^d)):
      // 23→444, distance 4 at sf0.01 / 6 at sf0.1. The oracle replays
      // a plain 12-level BFS unroll from the source — the two
      // algorithms must land on the identical distance, the q546/q538
      // two-paths-one-oracle pattern. (The disconnected −1 leg is
      // pinned in GraphAnalyticsSpec rather than here: proving
      // disconnection costs a full component exhaustion — pure gate
      // overhead on every round)
      val edges = storedKnnGraph(s, dir)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      val rows = Seq(444L).map { b =>
        val d = GraphAnalytics.bidirectionalBfsDistance(
          edges, "src", "dst", 23L, b, shufflePartitions = Some(4))
        require(d >= 0 && d <= 12,
          s"q553: distance $d to $b outside the oracle's 12-level " +
            "unroll (bfsUnrollSql) — raise both in lockstep")
        (23L, b, d)
      }
      import s.implicits._
      rows.toDF("src", "dst", "distance").orderBy("dst")
    }),

    "q554_incremental_wcc" -> ((s, dir) => {
      // incremental WCC maintenance gated merged ≡ rebuilt: q311's
      // exact corpus and LSH pair pipeline, split into an OLD edge set
      // (both endpoints doc < 400) whose labels are computed first and
      // a NEW batch (every remaining pair) merged in via the
      // super-node graph — the daily-ingest path that updates cluster
      // state at O(batch) instead of recomputing the corpus WCC. The
      // oracle is the SAME recursive-fixpoint SQL as q56/q311: the
      // incremental path must land on the identical labeling
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
          shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
        .localCheckpoint()
      def isOld(c: org.apache.spark.sql.Column) =
        pmod(c, lit(1000000L)) < 400
      val oldPairs = pairs.filter(
        isOld(col("doc_a")) && isOld(col("doc_b")))
      val newPairs = pairs.filter(
        !(isOld(col("doc_a")) && isOld(col("doc_b"))))
      val oldLabels = Dedup.dedupClusters(oldPairs, "doc_a", "doc_b")
      Dedup.incrementalClusters(oldLabels, newPairs, "doc_a", "doc_b")
        .select(col("id").as("doc_id"), col("cluster_rep"))
        .orderBy("doc_id")
    }),

    "q555_history_contract" -> ((s, dir) => {
      // the conversation-history WIRE FORMAT and rephrase-eligibility
      // contracts (reference: runtime/common.py:100-117,
      // vs_rephrase.py:100-115) gated over data: each user's first 4
      // events become turns (view→user, click→assistant, anything
      // else → SKIPPED — the role filter is part of the contract),
      // rendered to "User: …\nAssistant: …\n" with the trailing
      // newline iff any labeled turn survived; the labeled-turn count
      // is recovered FROM THE STRING by the reference's label-
      // occurrence rule and gates MIN_CHAT_HISTORY_FOR_REPHRASE = 2
      import pipeline.RagPipeline
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val turns = events(s, dir).filter(col("user_id") < 40)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("ord"),
            col("event_id").as("ord2"),
            when(col("event_type") === "view", "user")
              .when(col("event_type") === "click", "assistant")
              .otherwise(col("event_type")).as("role"),
            concat(col("event_type"), lit("-"), col("event_id"))
              .as("content")).as("t"))
        .groupBy("user_id").agg(collect_list("t").as("turns"))
      turns
        .select(col("user_id"),
          RagPipeline.historyTextFromTurns(col("turns"))
            .as("history_text"))
        .withColumn("n_labeled_turns",
          RagPipeline.labeledTurnCount(col("history_text")))
        .withColumn("rephrase_eligible", col("n_labeled_turns") >= 2)
        .orderBy("user_id")
    }),

    "q551_mood_median" -> ((s, dir) =>
      // Mood's median test on quantity by return flag — the
      // dichotomized (most outlier-robust) member of the rank family
      // beside q440's Kruskal-Wallis on the same design: per-group
      // above/below-grand-median counts, expected under homogeneity,
      // additive chi-sq contributions. The grand median rides the
      // q522/q527 two-pass histogram — no percentile buffer at any
      // plan node, so the same test runs at unbounded cardinality
      Stats.moodMedianTest(tbl(s, dir, "lineitem"), "l_returnflag",
          "l_quantity")
        .orderBy("g")),

    "q552_negbin_fit" -> ((s, dir) => {
      // negative-binomial MoM fit of per-user event counts by type —
      // the model that ACCOMMODATES the overdispersion q423 detects:
      // exact (n, sum, sum-of-squares) blocks, closed-form
      // r = m^2/(v-m), p = m/v, and NULL fits where variance <= mean
      // (Poisson-or-thinner groups surfaced, not extrapolated) — the
      // driver's click/error types overdisperse, purchase/signup/view
      // do not, so both branches ride the gate
      val counts = events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("k"))
      Stats.negativeBinomialFit(counts, "event_type", "k").orderBy("g")
    })
  )

  /** 12-level BFS unroll from node 23 over the kNN edge CTE — levels
    * past the eccentricity are identity stages (reach only grows then
    * fixes), so the fixed unroll and the Scala side's adaptive
    * bidirectional search land on identical distances; unreachable
    * targets coalesce to −1 on both engines. */
  private def bfsUnrollSql(maxD: Int): String = {
    val stages = (1 to maxD).map { k =>
      s"""s$k AS MATERIALIZED (SELECT DISTINCT nb AS n FROM (
         |    SELECT e.hi AS nb FROM eb e JOIN r${k - 1} r ON e.lo = r.n
         |    UNION ALL
         |    SELECT e.lo FROM eb e JOIN r${k - 1} r ON e.hi = r.n)),
         |r$k AS MATERIALIZED (SELECT n, min(d) AS d FROM (
         |    SELECT n, d FROM r${k - 1}
         |    UNION ALL SELECT n, $k FROM s$k)
         |  GROUP BY n)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Queries533to540.knnEbPrefix},
       |r0 AS (SELECT CAST(23 AS BIGINT) AS n, 0 AS d),
       |$stages
       |SELECT CAST(23 AS BIGINT) AS src, CAST(t AS BIGINT) AS dst,
       |  CAST(coalesce((SELECT d FROM r$maxD WHERE n = t), -1) AS BIGINT)
       |    AS distance
       |FROM (SELECT 444 AS t)
       |ORDER BY dst""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q553_point_distance" -> bfsUnrollSql(12),

    // the q56/q311 recursive-fixpoint WCC oracle, verbatim — the
    // incremental merge path must produce the identical labeling
    "q554_incremental_wcc" -> OracleHelpers.dedupClustersOracleSql,
    // the q538 definitional closure, verbatim — FW-BW must land on the
    // identical labeling
    "q546_scc_fwbw" -> Queries533to540.sccOracleSql,

    // gap-split sessions (ms-floored times, the engine's GroupState
    // arithmetic) emitted iff closed by a successor (sid < last_sid) or
    // by the final watermark passing end + gap STRICTLY (timeouts fire
    // when wm > timeout ts; wm = global max event time, ms-floored,
    // minus the sessionizer's fixed 10-minute delay)
    "q547_timeout_replay" ->
      """WITH ev AS (SELECT user_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS t,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_id < 3000 AND value IS NOT NULL),
        |wm AS (SELECT max(t) - 600000 AS w FROM ev),
        |g AS (SELECT user_id, t, cents,
        |    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |        IS NULL
        |      OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
        |        > 43200000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM ev),
        |s AS (SELECT user_id, t, cents,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |agg AS (SELECT user_id, sid, min(t) AS t0, max(t) AS t1,
        |    CAST(count(*) AS INT) AS n_events,
        |    CAST(SUM(cents) AS DOUBLE) AS sum_cents
        |  FROM s GROUP BY 1, 2),
        |mx AS (SELECT user_id, max(sid) AS last_sid FROM agg GROUP BY 1)
        |SELECT a.user_id,
        |  make_timestamp(a.t0 * 1000) AS session_start,
        |  make_timestamp(a.t1 * 1000) AS session_end,
        |  a.n_events, a.sum_cents
        |FROM agg a JOIN mx m USING (user_id), wm
        |WHERE a.sid < m.last_sid OR a.t1 + 43200000 < wm.w
        |ORDER BY a.user_id, session_start""".stripMargin,

    // every failure leg restated: the vecsearch legs resolve to the
    // q509 retrieval count over both stores (n2), the single-store
    // fallback legs to the docs_even-only count (n1), the both-tool
    // legs to sql answer + newline + vecsearch answer
    "q548_route_failures" ->
      """WITH dc AS (SELECT count(*) AS d FROM documents),
        |q3 AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id = 3),
        |s2 AS (SELECT vec_id AS id,
        |    'vec-' || CAST(vec_id % 50 AS VARCHAR) AS text,
        |    1.0 - (1.0 - list_cosine_similarity(
        |      CAST(embedding AS DOUBLE[]), qv)) / 2.0 AS score,
        |    row_number() OVER (PARTITION BY label % 2
        |      ORDER BY 1.0 - list_cosine_similarity(
        |        CAST(embedding AS DOUBLE[]), qv), vec_id) AS rk
        |  FROM embeddings, q3),
        |n2 AS (SELECT count(*) AS n FROM (
        |  SELECT 1 FROM (SELECT *, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY score DESC, id) AS rn
        |    FROM s2 WHERE rk <= 8 AND score >= 0.65) WHERE rn = 1
        |  ORDER BY score DESC, id LIMIT 8)),
        |se AS (SELECT vec_id AS id,
        |    'vec-' || CAST(vec_id % 50 AS VARCHAR) AS text,
        |    1.0 - (1.0 - list_cosine_similarity(
        |      CAST(embedding AS DOUBLE[]), qv)) / 2.0 AS score,
        |    row_number() OVER (ORDER BY 1.0 - list_cosine_similarity(
        |      CAST(embedding AS DOUBLE[]), qv), vec_id) AS rk
        |  FROM embeddings, q3 WHERE label % 2 = 0),
        |n1 AS (SELECT count(*) AS n FROM (
        |  SELECT 1 FROM (SELECT *, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY score DESC, id) AS rn
        |    FROM se WHERE rk <= 8 AND score >= 0.65) WHERE rn = 1
        |  ORDER BY score DESC, id LIMIT 8)),
        |va AS (SELECT '[describe vec 3 design patterns] -> '
        |    || n || ' docs' AS a, CAST(n AS BIGINT) AS nd FROM n2),
        |v1 AS (SELECT '[describe vec 3 design patterns] -> '
        |    || n || ' docs' AS a, CAST(n AS BIGINT) AS nd FROM n1)
        |SELECT * FROM (
        |  SELECT 0 AS case_id, 'rephrase_throws' AS failure,
        |    'vecsearch' AS route, nd AS n_docs, a AS answer FROM va
        |  UNION ALL SELECT 1, 'rephrase_multiline', 'vecsearch', nd, a
        |  FROM va
        |  UNION ALL SELECT 2, 'rephrase_empty', 'vecsearch', nd, a
        |  FROM va
        |  UNION ALL SELECT 3, 'grade_throws', 'vecsearch', nd, a
        |  FROM va
        |  UNION ALL SELECT 4, 'classify_throws', 'combined', nd,
        |    'docs=' || d || chr(10) || a FROM va, dc
        |  UNION ALL SELECT 5, 'classify_garbage', 'combined', nd,
        |    'docs=' || d || chr(10) || a FROM va, dc
        |  UNION ALL SELECT 6, 'select_unparseable', 'vecsearch', nd, a
        |  FROM v1
        |  UNION ALL SELECT 7, 'select_throws', 'vecsearch', nd, a
        |  FROM v1)
        |ORDER BY case_id""".stripMargin,

    // q538's closure CTEs + condensation edges + longest-path levels by
    // bounded recursive extension (UNION dedups (node, depth) pairs, the
    // DAG bounds depth) — max depth per condensation node
    "q549_condensation_dag" ->
      """WITH RECURSIVE e AS (SELECT DISTINCT l_partkey % 512 AS src,
        |    l_suppkey % 512 AS dst
        |  FROM lineitem WHERE l_quantity <= 1
        |    AND l_partkey % 512 <> l_suppkey % 512),
        |r AS (SELECT src, dst FROM e
        |  UNION
        |  SELECT r.src, e.dst FROM r JOIN e ON e.src = r.dst
        |  WHERE r.src <> e.dst),
        |mut AS (SELECT a.src AS u, a.dst AS v FROM r a
        |  JOIN r b ON b.src = a.dst AND b.dst = a.src),
        |nodes AS (SELECT DISTINCT n AS node FROM
        |  (SELECT src AS n FROM e UNION ALL SELECT dst FROM e) t),
        |scc AS (SELECT n.node,
        |    least(n.node, coalesce(min(m.v), n.node)) AS scc
        |  FROM nodes n LEFT JOIN mut m ON m.u = n.node GROUP BY n.node),
        |sz AS (SELECT scc, CAST(count(*) AS BIGINT) AS n_members
        |  FROM scc GROUP BY scc),
        |ce AS (SELECT DISTINCT sa.scc AS u, sb.scc AS v
        |  FROM e JOIN scc sa ON sa.node = e.src
        |    JOIN scc sb ON sb.node = e.dst
        |  WHERE sa.scc <> sb.scc),
        |cn AS (SELECT u AS n FROM ce UNION SELECT v FROM ce),
        |lp AS (SELECT n, 0 AS l FROM cn
        |  UNION
        |  SELECT ce.v, lp.l + 1 FROM lp JOIN ce ON ce.u = lp.n),
        |lv AS (SELECT n, max(l) AS level FROM lp GROUP BY n)
        |SELECT z.scc, CAST(coalesce(lv.level, 0) AS BIGINT) AS level,
        |  z.n_members
        |FROM sz z LEFT JOIN lv ON lv.n = z.scc
        |ORDER BY z.scc""".stripMargin,

    // matched pairs = the plain interval join; null rows = views with
    // no in-window click whose window end lies STRICTLY below the
    // final two-stream watermark (min of the streams' max ts, ms, −10m)
    "q550_outer_join_replay" ->
      """WITH sl AS (SELECT event_id, event_type, user_id,
        |    epoch_ms(CAST(ts AS TIMESTAMP)) AS t, value
        |  FROM events WHERE event_id < 4000),
        |imp AS (SELECT user_id AS u, t FROM sl
        |  WHERE event_type = 'view'),
        |clk AS (SELECT user_id AS cu, t AS ct,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM sl WHERE event_type = 'click' AND value IS NOT NULL),
        |wm AS (SELECT least((SELECT max(t) FROM imp),
        |    (SELECT max(ct) FROM clk)) - 600000 AS w),
        |m AS (SELECT i.u, i.t AS it, c.ct, c.cents
        |  FROM imp i JOIN clk c ON c.cu = i.u
        |    AND c.ct >= i.t AND c.ct <= i.t + 7200000),
        |um AS (SELECT i.u, i.t AS it FROM imp i, wm
        |  WHERE i.t + 7200000 < wm.w
        |    AND NOT EXISTS (SELECT 1 FROM clk c WHERE c.cu = i.u
        |      AND c.ct >= i.t AND c.ct <= i.t + 7200000))
        |SELECT u AS user_id, make_timestamp(it * 1000) AS view_ts,
        |  make_timestamp(ct * 1000) AS click_ts, cents AS click_cents
        |FROM m
        |UNION ALL
        |SELECT u, make_timestamp(it * 1000), NULL, NULL FROM um
        |ORDER BY user_id, view_ts, click_ts, click_cents""".stripMargin,

    // per-user first-4 turns, role-mapped and NULL-skipped by
    // string_agg, trailing newline iff any labeled turn; label counts
    // recovered from the string by the same length-difference identity
    "q555_history_contract" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events WHERE user_id < 40),
        |turns AS (SELECT user_id, t, event_id,
        |    CASE event_type WHEN 'view' THEN 'user'
        |      WHEN 'click' THEN 'assistant' ELSE event_type END AS role,
        |    event_type || '-' || event_id AS content
        |  FROM ev WHERE rn <= 4),
        |h AS (SELECT user_id,
        |    CASE WHEN count(CASE WHEN role IN ('user', 'assistant')
        |        THEN 1 END) > 0
        |      THEN string_agg(
        |        CASE role WHEN 'user' THEN 'User: ' || content
        |          WHEN 'assistant' THEN 'Assistant: ' || content END,
        |        chr(10) ORDER BY t, event_id) || chr(10)
        |      ELSE '' END AS history_text
        |  FROM turns GROUP BY user_id)
        |SELECT user_id, history_text,
        |  CAST((length(history_text)
        |      - length(replace(history_text, 'User:', ''))) // 5
        |    + (length(history_text)
        |      - length(replace(history_text, 'Assistant:', ''))) // 10
        |    AS BIGINT) AS n_labeled_turns,
        |  ((length(history_text)
        |      - length(replace(history_text, 'User:', ''))) // 5
        |    + (length(history_text)
        |      - length(replace(history_text, 'Assistant:', ''))) // 10)
        |    >= 2 AS rephrase_eligible
        |FROM h ORDER BY user_id""".stripMargin,

    // grand median via quantile_cont (the q527-pinned equivalence with
    // the two-pass histogram), counts as exact BIGINTs, the e/chi2
    // doubles assembled in the identical tree
    "q551_mood_median" ->
      """WITH v AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v FROM lineitem),
        |m AS (SELECT quantile_cont(v, 0.5) AS med FROM v),
        |cnt AS (SELECT g,
        |    CAST(SUM(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_above,
        |    CAST(SUM(CASE WHEN v < med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_below
        |  FROM v, m GROUP BY g),
        |tot AS (SELECT CAST(SUM(n_above) AS BIGINT) AS ta,
        |    CAST(SUM(n_below) AS BIGINT) AS tb FROM cnt),
        |x AS (SELECT g, n_above, n_below,
        |    (n_above + n_below) * (CAST(ta AS DOUBLE) / (ta + tb))
        |      AS e_above,
        |    (n_above + n_below) * (CAST(tb AS DOUBLE) / (ta + tb))
        |      AS e_below
        |  FROM cnt, tot)
        |SELECT g, n_above, n_below, round(e_above, 6) AS exp_above,
        |  round(CASE WHEN e_above > 0 OR e_below > 0 THEN
        |    COALESCE(CASE WHEN e_above > 0 THEN
        |      (n_above - e_above) * (n_above - e_above) / e_above END, 0)
        |    + COALESCE(CASE WHEN e_below > 0 THEN
        |      (n_below - e_below) * (n_below - e_below) / e_below END, 0)
        |    END, 6) AS chi2_part
        |FROM x ORDER BY g""".stripMargin,

    // exact per-group count blocks, sample variance, closed-form MoM
    // solve with NULL where variance <= mean
    "q552_negbin_fit" ->
      """WITH c AS (SELECT event_type AS g, user_id,
        |    CAST(count(*) AS BIGINT) AS k FROM events GROUP BY 1, 2),
        |b AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(k) AS BIGINT) AS s,
        |    CAST(SUM(CAST(k AS DECIMAL(38,0)) * k) AS DECIMAL(38,0))
        |      AS ss
        |  FROM c GROUP BY g),
        |x AS (SELECT g, n, CAST(s AS DOUBLE) / n AS mean,
        |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
        |      AS variance
        |  FROM b WHERE n >= 2)
        |SELECT g, n, round(mean, 6) AS mean,
        |  round(variance, 6) AS variance,
        |  round(CASE WHEN variance > mean
        |    THEN mean * mean / (variance - mean) END, 6) AS nb_r,
        |  round(CASE WHEN variance > mean
        |    THEN mean / variance END, 6) AS nb_p
        |FROM x ORDER BY g""".stripMargin
  )
}
