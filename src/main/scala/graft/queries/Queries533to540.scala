package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import QueryHelpers._

/** Round-8 session-3 additions: the autoregressive forecast member
  * (Yule–Walker AR(2)), the Bayesian A/B posterior, restricted mean
  * survival time, the Tukey HSD post-hoc, distributed Borůvka MST over
  * the standing kNN graph (single-linkage dendrogram at scale), and
  * directed SCC labels on a contracted graph. */
private[graft] object Queries533to540 extends QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q533_yule_walker_ar2" -> ((s, dir) => {
      // the AUTOREGRESSIVE member of the forecast family (q394 Holt /
      // q461 Holt-Winters / EWMA are exponential smoothers — none can
      // model oscillatory mean-reversion): AR(2) by Yule-Walker over
      // daily cents totals, lag correlations from exact pair sums, the
      // closed-form phi solve, and the one-step forecast from the two
      // latest days
      val daily = events(s, dir).filter(col("value").isNotNull)
        .select(expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') as long)")
          .as("day"),
          round(col("value") * 100).cast("long").as("cents"))
        .groupBy("day").agg(sum("cents").as("v"))
      Stats.yuleWalkerAr2(daily, "day", "v")
    }),

    "q534_beta_binomial_ab" -> ((s, dir) => {
      // Bayesian A/B on per-user conversion (>= 13 purchase events in
      // the window — the driver's users all purchase, so the unit-level
      // outcome is "heavy purchaser"): Beta(1+s, 1+n-s) posteriors per
      // hash arm, posterior mean/variance as exact rationals, and the
      // normal-approx superiority z (no Φ — the ln/exp rule; the
      // decision layer applies its own table)
      val units = events(s, dir).groupBy("user_id")
        .agg((sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 13).as("conv"))
        .select((col("user_id") % 2).as("arm"), col("conv"))
      Stats.betaBinomialAb(units, "arm", "conv")
    }),

    "q535_rmst" -> ((s, dir) => {
      // area under q251's churn survival curve up to a 48-hour horizon:
      // "expected active hours in the first two days", the censoring-
      // safe lifetime summary and the standard effect scale when
      // hazards cross (where q370's log-rank loses power)
      val per = events(s, dir).groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      val gmax = per.agg(max("t1").as("gm"))
      val life = per.crossJoin(broadcast(gmax))
        .select(expr("(t1 - t0) div 3600000000").as("t"),
          (col("t1") < col("gm") - lit(43200000000L)).as("observed"))
      Stats.rmst(life, "t", "observed", tau = 48L)
    }),

    "q536_tukey_hsd" -> ((s, dir) =>
      // the post-hoc q452's ANOVA calls for: WHICH return-flag pairs
      // differ in mean quantity, on the studentized-range scale
      // (pairwise Welch t's inflate the family error) — same exact
      // per-group (n, Σv, Σv²) blocks as anovaF, k² driver-scale pairs
      Stats.tukeyHsd(tbl(s, dir, "lineitem"), "l_returnflag",
          "l_quantity")
        .orderBy("g_a", "g_b")),

    "q537_boruvka_mst" -> ((s, dir) => {
      // minimum spanning FOREST of the standing kNN graph by Borůvka —
      // the MST algorithm that is actually distributed — giving the
      // single-linkage dendrogram of the embedding corpus: cut the
      // edge list at weight θ and the components are exactly the
      // θ-threshold single-linkage clusters (the hierarchy q13-style
      // flat dedup cuts can't give). Served from the persisted
      // GraphStore; every round's min-edge selection uses the total
      // order (w, lo, hi), so the oracle's fixed-unroll replay lands on
      // the identical forest
      val edges = storedKnnGraph(s, dir)
        .select(col("id").as("src"), col("nbr_id").as("dst"),
          col("distance").as("w"))
      val mst = GraphAnalytics.boruvkaMst(edges, "src", "dst", "w")
        .select(col("round"), col("lo").as("src"), col("hi").as("dst"),
          round(col("w"), 6).as("weight"))
      // the oracle below is UNROLLED at rounds=7 (jumps=7 covers
      // pointer chains to depth 2^7 — far past the ⌈log₂ components⌉
      // any sane merge forest reaches); the Scala side adapts up to
      // maxRounds=24, so a graph needing >7 rounds would otherwise
      // surface as an opaque hash mismatch. Fail loudly instead, naming
      // the constants to bump in lockstep (measured: 4 rounds at sf0.1,
      // rounds track the LARGEST component — flat under replication)
      val maxRound = mst.agg(max("round")).head().get(0)
      require(maxRound == null || maxRound.asInstanceOf[Int] <= 7,
        s"q537: Borůvka used round $maxRound > 7 — the DuckDB oracle " +
          "is unrolled at rounds=7/jumps=7 (boruvkaOracleSql); raise " +
          "both unroll constants with the Scala side")
      mst.orderBy("weight", "src", "dst")
    }),

    "q538_scc_labels" -> ((s, dir) => {
      // strongly connected components of the part→supplier flow graph
      // (512-key contraction of the quantity-1 lineitem slice) — the
      // directed cycle structure q275's undirected components can't
      // see: a dependency/citation CYCLE is one SCC, a shared ancestor
      // is not. Definition-exact via semi-naive closure on the bounded
      // contracted graph (the q142 bounded-twin discipline)
      val li = tbl(s, dir, "lineitem").filter(col("l_quantity") <= 1)
        .select((col("l_partkey") % 512).as("src"),
          (col("l_suppkey") % 512).as("dst"))
      GraphAnalytics.sccLabels(li, "src", "dst", maxIters = 32)
        .orderBy("node")
    }),

    "q539_sequential_patterns" -> ((s, dir) => {
      // which ORDERED behavior patterns are common: gapped-subsequence
      // support of every event-type pattern up to length 3 over each
      // user's high-value slice (value >= 80 thins sequences to ~13
      // events so supports actually differentiate) — the ordered
      // complement of the q184 itemsets and the every-path
      // generalization of the q69 declared funnel
      val ev = events(s, dir).filter(col("value") >= 80)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
      Itemsets.sequentialPatterns(ev, "user_id", "event_type", "t",
        minSeqs = 90L)
    }),

    "q540_ktruss" -> ((s, dir) => {
      // 4-truss of the standing kNN graph: edges kept only while >= 2
      // triangles back them — the EDGE-cohesion complement of q192's
      // k-core (a hub passes a degree gate with strangers; a truss
      // edge needs common neighbors), isolating the mutually-confirmed
      // near-dup communities. Fixed 6-round peel, rounds past the
      // fixpoint are no-ops on both engines (measured: the sf0.01 peel
      // is stationary from round 2 — 4 rounds of margin)
      val edges = storedKnnGraph(s, dir)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      GraphAnalytics.kTruss(edges, "src", "dst", k = 4, rounds = 6)
        .select(col("a").as("src"), col("b").as("dst"), col("support"))
        .orderBy("src", "dst")
    })
  )

  /** The standing kNN graph (q537/q540/q553 inputs) as an undirected
    * edge CTE chain ending at `eb(lo, hi, w)` — the replay of
    * GraphStore's 8-centroid IVF assignment + in-cell top-3. Shared
    * with Queries546to555 (q553's BFS unroll). */
  private[queries] val knnEbPrefix: String =
    """c AS MATERIALIZED (SELECT CAST(vec_id AS INT) AS cid,
      |    CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings WHERE vec_id < 8),
      |a AS MATERIALIZED (SELECT vec_id, embedding, centroid_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
      |          c.cv), c.cid) AS rn
      |    FROM embeddings e, c) WHERE rn = 1),
      |p AS MATERIALIZED (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
      |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
      |      CAST(r.embedding AS DOUBLE[])) AS distance
      |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
      |    AND l.vec_id <> r.vec_id),
      |g0w AS MATERIALIZED (SELECT id, nbr_id, distance FROM (
      |    SELECT id, nbr_id, distance, row_number() OVER (
      |      PARTITION BY id ORDER BY distance, nbr_id) AS rk
      |    FROM p) WHERE rk <= 3),
      |eb AS MATERIALIZED (SELECT least(id, nbr_id) AS lo, greatest(id, nbr_id) AS hi,
      |    min(distance) AS w FROM g0w GROUP BY 1, 2)""".stripMargin

  /** Borůvka replay, fixed unroll: `rounds` rounds × (`jumps` + 1)
    * pointer-doubling stages, over the kNN-graph edge CTE. Stages past
    * each fixpoint are identity maps, so the fixed schedule and the
    * Scala side's adaptive early-exit land on identical labels — the
    * q523 "replay the whole descent" discipline applied to a loop.
    * Every CTE is MATERIALIZED: the doubling stages each reference
    * their predecessor twice, so inlining would re-expand the chain
    * 2^jumps times per round (measured: DuckDB exhausts file handles
    * re-opening the embeddings parquet); materialization makes the
    * replay linear in stages, like the Scala side's checkpoints. */
  private def boruvkaOracleSql(rounds: Int, jumps: Int): String = {
    val prefix =
      s"""WITH $knnEbPrefix,
        |lab0 AS MATERIALIZED (SELECT v, v AS lab FROM
        |  (SELECT lo AS v FROM eb UNION SELECT hi FROM eb) t)"""
        .stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val doublings = (1 to jumps).map { k =>
        s"""pj${r}_${k + 1} AS MATERIALIZED (SELECT a.c, b.p FROM pj${r}_$k a
           |  JOIN pj${r}_$k b ON b.c = a.p)""".stripMargin
      }.mkString(",\n")
      s"""ce$r AS MATERIALIZED (SELECT la.lab AS cl, lb.lab AS ch, e.w, e.lo, e.hi
         |  FROM eb e JOIN lab${r - 1} la ON la.v = e.lo
         |    JOIN lab${r - 1} lb ON lb.v = e.hi
         |  WHERE la.lab <> lb.lab),
         |inc$r AS MATERIALIZED (SELECT cl AS c, ch AS o, w, lo, hi FROM ce$r
         |  UNION ALL SELECT ch, cl, w, lo, hi FROM ce$r),
         |sel$r AS MATERIALIZED (SELECT c, o, w, lo, hi FROM (
         |    SELECT c, o, w, lo, hi, row_number() OVER (
         |      PARTITION BY c ORDER BY w, lo, hi) AS rn
         |    FROM inc$r) WHERE rn = 1),
         |pj${r}_0 AS MATERIALIZED (SELECT l.lab AS c, coalesce(s.o, l.lab) AS p
         |  FROM (SELECT DISTINCT lab FROM lab${r - 1}) l
         |  LEFT JOIN sel$r s ON s.c = l.lab),
         |pj${r}_1 AS MATERIALIZED (SELECT a.c,
         |    CASE WHEN b.p = a.c THEN least(a.c, a.p) ELSE a.p END AS p
         |  FROM pj${r}_0 a JOIN pj${r}_0 b ON b.c = a.p),
         |$doublings,
         |lab$r AS MATERIALIZED (SELECT l.v, p.p AS lab FROM lab${r - 1} l
         |  JOIN pj${r}_${jumps + 1} p ON p.c = l.lab)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to rounds)
      .map(r => s"SELECT DISTINCT CAST($r AS INT) AS round, lo, hi, w " +
        s"FROM sel$r")
      .mkString("\nUNION ALL\n")
    s"""$prefix,
       |$roundCtes
       |SELECT round, CAST(lo AS BIGINT) AS src, CAST(hi AS BIGINT) AS dst,
       |  round(w, 6) AS weight
       |FROM ($unions)
       |ORDER BY weight, src, dst""".stripMargin
  }

  /** k-truss replay, fixed unroll over the kNN edge CTE: per round,
    * oriented-triangle enumeration, per-edge support, and the
    * support >= k-2 cut — rounds past the fixpoint delete nothing,
    * so the fixed schedule matches the Scala side exactly. */
  private def kTrussOracleSql(k: Int, rounds: Int): String = {
    val s0 = """s0 AS MATERIALIZED (SELECT lo AS a, hi AS b FROM eb)"""
    val roundCtes = (1 to rounds).map { r =>
      s"""tr$r AS MATERIALIZED (SELECT e1.a, e1.b, e2.b AS c
         |  FROM s${r - 1} e1 JOIN s${r - 1} e2 ON e2.a = e1.b
         |  JOIN s${r - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
         |sup$r AS MATERIALIZED (SELECT a, b,
         |    CAST(count(*) AS BIGINT) AS support
         |  FROM (SELECT a, b FROM tr$r
         |    UNION ALL SELECT b, c FROM tr$r
         |    UNION ALL SELECT a, c FROM tr$r) GROUP BY a, b),
         |k$r AS MATERIALIZED (SELECT e.a, e.b,
         |    coalesce(s.support, 0) AS support
         |  FROM s${r - 1} e LEFT JOIN sup$r s
         |    ON s.a = e.a AND s.b = e.b
         |  WHERE coalesce(s.support, 0) >= ${k - 2}),
         |s$r AS MATERIALIZED (SELECT a, b FROM k$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $knnEbPrefix,
       |$s0,
       |$roundCtes
       |SELECT a AS src, b AS dst, CAST(support AS BIGINT) AS support
       |FROM k$rounds ORDER BY src, dst""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    // lag-k pair sums as exact BIGINT/decimal blocks, the same fixed
    // double trees for r/phi/forecast as the Spark side
    "q533_yule_walker_ar2" ->
      """WITH d AS (SELECT
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS t,
        |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS s FROM d),
        |l1 AS (SELECT CAST(count(*) AS BIGINT) AS n1,
        |    CAST(SUM(a.v) AS BIGINT) AS sx, CAST(SUM(b.v) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(a.v AS DECIMAL(38,0)) * a.v) AS DECIMAL(38,0))
        |      AS sxx,
        |    CAST(SUM(CAST(b.v AS DECIMAL(38,0)) * b.v) AS DECIMAL(38,0))
        |      AS syy,
        |    CAST(SUM(CAST(a.v AS DECIMAL(38,0)) * b.v) AS DECIMAL(38,0))
        |      AS sxy
        |  FROM d a JOIN d b ON b.t = a.t + 1),
        |l2 AS (SELECT CAST(count(*) AS BIGINT) AS n2,
        |    CAST(SUM(a.v) AS BIGINT) AS sx, CAST(SUM(b.v) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(a.v AS DECIMAL(38,0)) * a.v) AS DECIMAL(38,0))
        |      AS sxx,
        |    CAST(SUM(CAST(b.v AS DECIMAL(38,0)) * b.v) AS DECIMAL(38,0))
        |      AS syy,
        |    CAST(SUM(CAST(a.v AS DECIMAL(38,0)) * b.v) AS DECIMAL(38,0))
        |      AS sxy
        |  FROM d a JOIN d b ON b.t = a.t + 2),
        |lt AS (SELECT
        |    MAX(CASE WHEN rn = 1 THEN v END) AS x_last,
        |    MAX(CASE WHEN rn = 2 THEN v END) AS x_prev
        |  FROM (SELECT v, row_number() OVER (ORDER BY t DESC) AS rn
        |    FROM d) WHERE rn <= 2),
        |rr AS (SELECT n, n1, n2, CAST(s AS DOUBLE) / n AS mean,
        |    x_last, x_prev,
        |    (l1.n1 * CAST(l1.sxy AS DOUBLE)
        |        - CAST(l1.sx AS DOUBLE) * l1.sy) /
        |      (sqrt(l1.n1 * CAST(l1.sxx AS DOUBLE)
        |          - CAST(l1.sx AS DOUBLE) * l1.sx) *
        |       sqrt(l1.n1 * CAST(l1.syy AS DOUBLE)
        |          - CAST(l1.sy AS DOUBLE) * l1.sy)) AS r1,
        |    (l2.n2 * CAST(l2.sxy AS DOUBLE)
        |        - CAST(l2.sx AS DOUBLE) * l2.sy) /
        |      (sqrt(l2.n2 * CAST(l2.sxx AS DOUBLE)
        |          - CAST(l2.sx AS DOUBLE) * l2.sx) *
        |       sqrt(l2.n2 * CAST(l2.syy AS DOUBLE)
        |          - CAST(l2.sy AS DOUBLE) * l2.sy)) AS r2
        |  FROM tot, l1, l2, lt),
        |ph AS (SELECT n, n1, n2, mean, x_last, x_prev, r1, r2,
        |    r1 * (CAST(1 AS DOUBLE) - r2)
        |      / (CAST(1 AS DOUBLE) - r1 * r1) AS phi1,
        |    (r2 - r1 * r1) / (CAST(1 AS DOUBLE) - r1 * r1) AS phi2
        |  FROM rr)
        |SELECT n, n1 AS n_pairs1, n2 AS n_pairs2,
        |  round(mean, 6) AS mean, round(r1, 6) AS r1, round(r2, 6) AS r2,
        |  round(phi1, 6) AS phi1, round(phi2, 6) AS phi2,
        |  round(mean + phi1 * (x_last - mean) + phi2 * (x_prev - mean), 6)
        |    AS forecast_next
        |FROM ph""".stripMargin,

    // two Beta posteriors from exact per-arm (n, s); mean/variance as
    // rationals-to-double, superiority z from the same fixed tree
    "q534_beta_binomial_ab" ->
      """WITH u AS (SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 13 AS conv
        |  FROM events GROUP BY user_id),
        |arms AS (SELECT user_id % 2 AS arm,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS s
        |  FROM u GROUP BY 1),
        |pos AS (SELECT arm, n, s, 1 + s AS a, 1 + n - s AS b FROM arms),
        |st AS (SELECT arm, n, s,
        |    CAST(a AS DOUBLE) / (a + b) AS m,
        |    CAST(a * b AS DOUBLE) / (CAST((a + b) * (a + b) AS DOUBLE)
        |      * (a + b + 1)) AS v
        |  FROM pos),
        |w AS (SELECT
        |  MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
        |  MAX(CASE WHEN arm = 0 THEN s END) AS s_a,
        |  MAX(CASE WHEN arm = 0 THEN m END) AS m_a,
        |  MAX(CASE WHEN arm = 0 THEN v END) AS v_a,
        |  MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
        |  MAX(CASE WHEN arm = 1 THEN s END) AS s_b,
        |  MAX(CASE WHEN arm = 1 THEN m END) AS m_b,
        |  MAX(CASE WHEN arm = 1 THEN v END) AS v_b
        |  FROM st)
        |SELECT n_a, s_a, round(m_a, 6) AS post_mean_a,
        |  n_b, s_b, round(m_b, 6) AS post_mean_b,
        |  round(m_b - m_a, 6) AS lift,
        |  round((m_b - m_a) / sqrt(v_a + v_b), 6) AS z_superiority
        |FROM w""".stripMargin,

    // q251's KM replay, cut at tau=48, lead-window step areas
    // decimal-accumulated, arg_max survival tail
    "q535_rmst" ->
      """WITH per AS (SELECT user_id,
        |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
        |  FROM events GROUP BY user_id),
        |gm AS (SELECT max(t1) AS gm FROM per),
        |life AS (SELECT (t1 - t0) // 3600000000 AS t,
        |    t1 < gm - 43200000000 AS observed FROM per, gm),
        |pt AS (SELECT t, count(*) AS n_all,
        |    CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d
        |  FROM life GROUP BY t),
        |tt AS (SELECT CAST(SUM(n_all) AS BIGINT) AS N FROM pt),
        |ar AS (SELECT t, d, N - CAST(coalesce(SUM(n_all)
        |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
        |  FROM pt, tt),
        |st AS (SELECT t, n_at_risk, d AS n_events,
        |    CAST(n_at_risk - d AS DOUBLE) / n_at_risk AS f
        |  FROM ar WHERE d > 0),
        |km AS (SELECT a.t,
        |    list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |      list(CAST(b.f AS DOUBLE) ORDER BY b.t)), (x, y) -> x * y)
        |      AS survival
        |  FROM st a JOIN st b ON b.t <= a.t
        |  GROUP BY a.t),
        |fk AS (SELECT t, survival FROM km WHERE t < 48),
        |seg AS (SELECT t, survival,
        |    least(coalesce(lead(t) OVER (ORDER BY t), 48), 48) AS t_next
        |  FROM fk),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_steps,
        |    CAST(SUM(CAST(survival * CAST(t_next - t AS DOUBLE)
        |      AS DECIMAL(38,18))) AS DOUBLE) AS step_area,
        |    arg_max(survival, t) AS km_tail
        |  FROM seg),
        |hd AS (SELECT CAST(least(coalesce(min(t), 48), 48) AS DOUBLE)
        |    AS head_area FROM fk)
        |SELECT CAST(48 AS BIGINT) AS tau, ag.n_steps,
        |  round(hd.head_area + coalesce(ag.step_area,
        |    CAST(0 AS DOUBLE)), 6) AS rmst,
        |  round(ag.km_tail, 6) AS km_tail
        |FROM ag, hd""".stripMargin,

    // q452's exact (n, Σv, Σv²) blocks, pooled MSE, k² pairs with the
    // Tukey–Kramer se — q referred to the studentized-range table by
    // the caller (no p: the ln/exp rule)
    "q536_tukey_hsd" ->
      """WITH base AS (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v FROM lineitem),
        |gs AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_g,
        |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
        |      AS ss_g
        |  FROM base GROUP BY g),
        |ms AS (SELECT
        |    (CAST(SUM(ss_g) AS DOUBLE)
        |      - CAST(SUM(CAST(CAST(CAST(s_g AS DECIMAL(38,0)) * s_g
        |          AS DOUBLE) / n_g AS DECIMAL(38,18))) AS DOUBLE))
        |      / CAST(SUM(n_g) - count(*) AS DOUBLE) AS mse
        |  FROM gs),
        |pr AS (SELECT a.g AS g_a, b.g AS g_b, a.n_g AS n_a, b.n_g AS n_b,
        |    CAST(a.s_g AS DOUBLE) / a.n_g AS m_a,
        |    CAST(b.s_g AS DOUBLE) / b.n_g AS m_b
        |  FROM gs a JOIN gs b ON a.g < b.g),
        |se AS (SELECT g_a, g_b, n_a, n_b, m_a, m_b,
        |    sqrt(mse / CAST(2 AS DOUBLE) *
        |      (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) AS se
        |  FROM pr, ms)
        |SELECT g_a, g_b, n_a, n_b,
        |  round(m_a, 6) AS mean_a, round(m_b, 6) AS mean_b,
        |  round(m_a - m_b, 6) AS diff,
        |  round((m_a - m_b) / se, 6) AS q_stat
        |FROM se ORDER BY g_a, g_b""".stripMargin,

    "q537_boruvka_mst" -> boruvkaOracleSql(rounds = 7, jumps = 7),

    // PrefixSpan-by-joins replay: earliest-extension greedy per level,
    // Apriori-gated (the HAVING on each level is the same lossless
    // prune the Spark side broadcasts)
    "q539_sequential_patterns" ->
      """WITH occ AS MATERIALIZED (SELECT DISTINCT user_id AS sid,
        |    event_type AS item, epoch_us(CAST(ts AS TIMESTAMP)) AS t
        |  FROM events WHERE value >= 80),
        |l1 AS MATERIALIZED (SELECT sid, item, min(t) AS t1
        |  FROM occ GROUP BY sid, item),
        |sup1 AS MATERIALIZED (SELECT item AS p1,
        |    CAST(count(*) AS BIGINT) AS n_seqs
        |  FROM l1 GROUP BY 1 HAVING count(*) >= 90),
        |first1 AS MATERIALIZED (SELECT l.sid, l.item AS p1, l.t1
        |  FROM l1 l JOIN sup1 s ON s.p1 = l.item),
        |ext2 AS MATERIALIZED (SELECT f.sid, f.p1, o.item AS p2,
        |    min(o.t) AS t2
        |  FROM first1 f JOIN occ o ON o.sid = f.sid AND o.t > f.t1
        |  GROUP BY f.sid, f.p1, o.item),
        |sup2 AS MATERIALIZED (SELECT p1, p2,
        |    CAST(count(*) AS BIGINT) AS n_seqs
        |  FROM ext2 GROUP BY 1, 2 HAVING count(*) >= 90),
        |ext3 AS MATERIALIZED (SELECT DISTINCT e.sid, e.p1, e.p2,
        |    o.item AS p3
        |  FROM ext2 e JOIN sup2 s ON s.p1 = e.p1 AND s.p2 = e.p2
        |  JOIN occ o ON o.sid = e.sid AND o.t > e.t2),
        |sup3 AS (SELECT p1, p2, p3, CAST(count(*) AS BIGINT) AS n_seqs
        |  FROM ext3 GROUP BY 1, 2, 3 HAVING count(*) >= 90)
        |SELECT CAST(1 AS INT) AS k, p1 AS item_a,
        |  CAST(NULL AS VARCHAR) AS item_b,
        |  CAST(NULL AS VARCHAR) AS item_c, n_seqs FROM sup1
        |UNION ALL
        |SELECT 2, p1, p2, NULL, n_seqs FROM sup2
        |UNION ALL
        |SELECT 3, p1, p2, p3, n_seqs FROM sup3
        |ORDER BY k, item_a, item_b, item_c""".stripMargin,

    "q540_ktruss" -> kTrussOracleSql(k = 4, rounds = 6),

    // definition-exact: recursive closure, mutual-reach pairs, min
    // mutual partner as the label
    "q538_scc_labels" -> sccOracleSql
  )

  /** The definitional SCC closure CTEs over the 512-contracted flow
    * graph — the shared WITH body behind [[sccOracleSql]] (q538/q546/
    * q557) and q559's condensation select: one recursive closure, four
    * consumers, so every SCC-family gate rides literally the same
    * mutual-reachability definition. */
  private[queries] val sccOracleCtes: String =
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
        |sz AS (SELECT scc, CAST(count(*) AS BIGINT) AS scc_size
        |  FROM scc GROUP BY scc)""".stripMargin

  /** The definitional SCC oracle — shared verbatim by q538 (semi-naive
    * closure), q546 (scalable FW-BW) and q557 (incremental merge): one
    * labeling definition, three engine paths. */
  private[queries] val sccOracleSql: String = sccOracleCtes +
      """
        |SELECT s.node, s.scc, z.scc_size
        |FROM scc s JOIN sz z ON z.scc = s.scc
        |ORDER BY s.node""".stripMargin
}
