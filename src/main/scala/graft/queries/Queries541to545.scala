package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import QueryHelpers._

/** Round-8 session-3 additions, second batch: the lead-lag
  * cross-correlation table, the two ORDERED-alternative rank tests
  * (Jonckheere–Terpstra for independent groups, Page for blocks), the
  * Conover–Iman post-hoc that q440's Kruskal–Wallis was missing, and
  * empirical-Bayes shrinkage of per-segment rates. */
private[graft] object Queries541to545 extends QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q541_ccf_lead_lag" -> ((s, dir) => {
      // does signup volume LEAD purchase volume? CCF at lags -7..7
      // between the two daily count series — the cross-series member
      // of the autocorrelation family (q.acf sees one series only);
      // is_peak marks the single best lag deterministically
      val daily = events(s, dir)
        .select(expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') as long)")
          .as("day"), col("event_type"))
        .groupBy("day")
        .agg(sum(when(col("event_type") === "signup", 1L).otherwise(0L))
          .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      Stats.ccfTable(daily, "day", "x", "y", maxLag = 7)
    }),

    "q542_jonckheere" -> ((s, dir) =>
      // do later line numbers carry stochastically larger quantities?
      // The ORDERED alternative across l_linenumber 1..7 — q440's
      // Kruskal-Wallis spends power on every permutation; JT spends it
      // all on the monotone trend (the rank analog of q513's
      // Cochran-Armitage)
      Stats.jonckheereTerpstra(tbl(s, dir, "lineitem"), "l_linenumber",
        "l_quantity")),

    "q543_conover_iman" -> ((s, dir) =>
      // the post-hoc q440's omnibus H calls for: WHICH return-flag
      // pairs differ in rank location — the rank twin of q536's Tukey
      // HSD (HSD assumes variance homogeneity on means; Conover-Iman
      // assumes nothing, same exact midrank lattice as KW)
      Stats.conoverIman(tbl(s, dir, "lineitem"), "l_returnflag",
        "l_quantity")),

    "q544_page_trend" -> ((s, dir) => {
      // does per-user activity trend across the weekly cycle? Blocks =
      // users, treatments = day-of-week (epoch-day mod 7 — engine-
      // independent, unlike dayofweek()), value = events that day of
      // week; Page's L is Friedman's ordered twin exactly as JT is
      // Kruskal-Wallis's
      val cells = events(s, dir)
        .select(col("user_id"),
          expr("cast(datediff(cast(ts as date), date'1970-01-01') % 7" +
            " as long)").as("j"))
        .groupBy("user_id", "j").agg(count(lit(1)).as("v"))
      Stats.pageTrend(cells, "user_id", "j", "v")
    }),

    "q545_eb_shrink" -> ((s, dir) => {
      // league-table honesty: per-supplier return rates shrunk toward
      // a method-of-moments Beta prior learned from the supplier
      // population — small suppliers pull to the prior, large ones
      // keep their rate (the multi-group completion of q534's two-arm
      // uniform-prior posterior)
      val per = tbl(s, dir, "lineitem")
        .groupBy(col("l_suppkey").as("seg"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("s"))
      Stats.ebBetaBinomialShrink(per, "seg", "n", "s").orderBy("seg")
    })
  )

  def oracleSql: Map[String, String] = Map(

    // per-lag exact pair-sum Pearson, the same fixed double tree;
    // peak by (|ccf| desc, |lag|, lag)
    "q541_ccf_lead_lag" ->
      """WITH d AS MATERIALIZED (SELECT
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS t,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |lg AS (SELECT CAST(range AS INT) AS lag FROM range(-7, 8)),
        |ag AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(a.x) AS BIGINT) AS sx, CAST(SUM(b.y) AS BIGINT)
        |      AS sy,
        |    CAST(SUM(CAST(a.x AS DECIMAL(38,0)) * a.x) AS DECIMAL(38,0))
        |      AS sxx,
        |    CAST(SUM(CAST(b.y AS DECIMAL(38,0)) * b.y) AS DECIMAL(38,0))
        |      AS syy,
        |    CAST(SUM(CAST(a.x AS DECIMAL(38,0)) * b.y) AS DECIMAL(38,0))
        |      AS sxy
        |  FROM lg CROSS JOIN d a JOIN d b ON b.t = a.t + lg.lag
        |  GROUP BY lag),
        |cc AS (SELECT lag, n_pairs,
        |    CASE WHEN sqrt(n_pairs * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * sx) *
        |        sqrt(n_pairs * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * sy) > 0
        |      THEN (n_pairs * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * sy) /
        |        (sqrt(n_pairs * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * sx) *
        |         sqrt(n_pairs * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * sy))
        |    END AS ccf
        |  FROM ag),
        |pk AS (SELECT lag, n_pairs, ccf, row_number() OVER (
        |    ORDER BY abs(ccf) DESC NULLS LAST, abs(lag), lag) AS rn
        |  FROM cc)
        |SELECT lag, n_pairs, round(ccf, 6) AS ccf,
        |  rn = 1 AND ccf IS NOT NULL AS is_peak
        |FROM pk ORDER BY lag""".stripMargin,

    // histogram² pair expansion, ×2-cleared J, no-tie null variance
    "q542_jonckheere" ->
      """WITH gv AS MATERIALIZED (SELECT
        |    CAST(l_linenumber AS BIGINT) AS g,
        |    CAST(l_quantity AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |j AS (SELECT CAST(SUM(CASE WHEN a.v < b.v
        |      THEN 2 * CAST(a.c AS DECIMAL(38,0)) * b.c
        |      ELSE CAST(a.c AS DECIMAL(38,0)) * b.c END)
        |    AS DECIMAL(38,0)) AS j2
        |  FROM gv a JOIN gv b ON a.g < b.g AND a.v <= b.v),
        |ns AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g
        |  FROM gv GROUP BY g),
        |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(n_g AS DECIMAL(38,0)) * n_g)
        |      AS DECIMAL(38,0)) AS sn2,
        |    CAST(SUM(CAST(n_g AS DECIMAL(38,0)) * n_g * (2 * n_g + 3))
        |      AS DECIMAL(38,0)) AS t2
        |  FROM ns)
        |SELECT nn AS n, k, CAST(j2 AS BIGINT) AS j2,
        |  (nn * nn - CAST(sn2 AS BIGINT)) // 2 AS e2,
        |  CASE WHEN CAST(CAST(nn AS DECIMAL(38,0)) * nn * (2 * nn + 3)
        |      - t2 AS DOUBLE) / 72.0 > 0
        |    THEN round(CAST(CAST(j2 AS BIGINT)
        |        - (nn * nn - CAST(sn2 AS BIGINT)) // 2 AS DOUBLE) /
        |      (2.0 * sqrt(CAST(CAST(nn AS DECIMAL(38,0)) * nn
        |        * (2 * nn + 3) - t2 AS DOUBLE) / 72.0)), 6)
        |  END AS z
        |FROM tot, j""".stripMargin,

    // KW's doubled-midrank lattice, H rebuilt tie-corrected, pooled
    // rank variance, k² pairs
    "q543_conover_iman" ->
      """WITH base AS MATERIALIZED (SELECT l_returnflag AS g,
        |    CAST(l_quantity AS BIGINT) AS v FROM lineitem),
        |perv AS (SELECT v, CAST(count(*) AS BIGINT) AS t
        |  FROM base GROUP BY v),
        |ranked AS MATERIALIZED (SELECT v, t,
        |    2 * coalesce(SUM(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + t + 1 AS r2
        |  FROM perv),
        |gs AS MATERIALIZED (SELECT g,
        |    CAST(SUM(c.n_gv * r.r2) AS BIGINT) AS s2,
        |    CAST(SUM(c.n_gv) AS BIGINT) AS n_g
        |  FROM (SELECT g, v, count(*) AS n_gv FROM base GROUP BY 1, 2) c
        |  JOIN ranked r ON r.v = c.v GROUP BY g),
        |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
        |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie,
        |    CAST(SUM(CAST(t AS DECIMAL(38,0)) * r2 * r2)
        |      AS DECIMAL(38,0)) AS q4
        |  FROM ranked),
        |hrow AS (SELECT nn, tie, q4, CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(CAST(CAST(s2 AS DECIMAL(38,0)) * s2
        |        AS DOUBLE) / 4.0 / n_g AS DECIMAL(38,18))) AS DOUBLE)
        |      AS s
        |  FROM gs, tot GROUP BY nn, tie, q4),
        |h3 AS (SELECT nn, k,
        |    CASE WHEN 1.0 - CAST(tie AS DOUBLE) /
        |        (CAST(nn AS DOUBLE) * nn * nn - nn) > 0
        |      THEN (12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * s
        |          - 3.0 * (CAST(nn AS DOUBLE) + 1)) /
        |        (1.0 - CAST(tie AS DOUBLE) /
        |          (CAST(nn AS DOUBLE) * nn * nn - nn))
        |    END AS h_adj,
        |    CAST(q4 - CAST(nn AS DECIMAL(38,0)) * (nn + 1) * (nn + 1)
        |      AS DOUBLE) / 4.0 / (CAST(nn AS DOUBLE) - 1) AS s_sq
        |  FROM hrow),
        |pr AS (SELECT a.g AS g_a, b.g AS g_b, a.n_g AS n_a,
        |    b.n_g AS n_b,
        |    CAST(a.s2 AS DOUBLE) / 2.0 / a.n_g AS mr_a,
        |    CAST(b.s2 AS DOUBLE) / 2.0 / b.n_g AS mr_b
        |  FROM gs a JOIN gs b ON a.g < b.g),
        |se AS (SELECT g_a, g_b, n_a, n_b, mr_a, mr_b,
        |    sqrt(s_sq * ((CAST(nn AS DOUBLE) - 1 - h_adj) /
        |      (CAST(nn AS DOUBLE) - k)) * (1.0 / n_a + 1.0 / n_b)) AS se
        |  FROM pr, h3)
        |SELECT g_a, g_b, n_a, n_b,
        |  round(mr_a, 6) AS mean_rank_a, round(mr_b, 6) AS mean_rank_b,
        |  CASE WHEN se > 0 THEN round((mr_a - mr_b) / se, 6) END
        |    AS t_stat
        |FROM se ORDER BY g_a, g_b""".stripMargin,

    // friedman's within-block midrank lattice, ordered coefficients by
    // dense rank, no-tie null variance
    "q544_page_trend" ->
      """WITH cells AS MATERIALIZED (SELECT user_id AS b,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      % 7 AS BIGINT) AS j,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |kk AS (SELECT CAST(count(DISTINCT j) AS BIGINT) AS k
        |  FROM cells),
        |comp AS (SELECT c.b, c.j, c.v FROM cells c
        |  JOIN (SELECT b, count(*) AS n_b FROM cells GROUP BY b) z
        |    ON z.b = c.b, kk WHERE z.n_b = kk.k),
        |ranked AS (SELECT b, j,
        |    2 * (rank() OVER (PARTITION BY b ORDER BY v) - 1)
        |      + count(*) OVER (PARTITION BY b, v) + 1 AS r2
        |  FROM comp),
        |perj AS (SELECT j, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(r2) AS BIGINT) AS rj2
        |  FROM ranked GROUP BY j),
        |o AS (SELECT j, n, rj2,
        |    CAST(dense_rank() OVER (ORDER BY j) AS BIGINT) AS ord
        |  FROM perj),
        |ad AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
        |    (SELECT k FROM kk) AS k,
        |    CAST(SUM(ord * rj2) AS BIGINT) AS l2
        |  FROM o)
        |SELECT n AS n_blocks, k, l2,
        |  n * k * (k + 1) * (k + 1) // 2 AS e2,
        |  CASE WHEN CAST(n * k * k * (k + 1) * (k * k - 1) AS DOUBLE)
        |      / 144.0 > 0
        |    THEN round(CAST(l2 - n * k * (k + 1) * (k + 1) // 2
        |        AS DOUBLE) /
        |      (2.0 * sqrt(CAST(n * k * k * (k + 1) * (k * k - 1)
        |        AS DOUBLE) / 144.0)), 6)
        |  END AS z
        |FROM ad""".stripMargin,

    // across-segment MoM Beta prior (decimal-18 accumulated moments),
    // posterior mean per segment, raw fallback on degenerate priors
    "q545_eb_shrink" ->
      """WITH per AS (SELECT l_suppkey AS seg,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS s
        |  FROM lineitem GROUP BY 1),
        |base AS MATERIALIZED (SELECT seg, n, s,
        |    CAST(s AS DOUBLE) / n AS raw FROM per WHERE n > 0),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(raw AS DECIMAL(38,18))) AS DOUBLE) AS sr,
        |    CAST(SUM(CAST(raw * raw AS DECIMAL(38,18))) AS DOUBLE)
        |      AS srr
        |  FROM base),
        |pr AS (SELECT CASE WHEN m > 0 THEN mu * m END AS a,
        |    CASE WHEN m > 0 THEN (1.0 - mu) * m END AS b
        |  FROM (SELECT mu,
        |      CASE WHEN v > 0 THEN mu * (1.0 - mu) / v - 1 END AS m
        |    FROM (SELECT sr / k AS mu,
        |        CASE WHEN k > 1 THEN (srr - sr * sr / k)
        |          / (CAST(k AS DOUBLE) - 1) END AS v
        |      FROM mom)))
        |SELECT seg, n, s, round(raw, 6) AS raw_rate,
        |  round(coalesce((s + a) / (n + a + b), raw), 6)
        |    AS shrunk_rate,
        |  round(a, 6) AS prior_a, round(b, 6) AS prior_b
        |FROM base, pr ORDER BY seg""".stripMargin
  )
}
