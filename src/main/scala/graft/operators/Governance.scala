package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row- and column-level governance as plan-level operators (SURVEY §2.10).
  *
  * The reference enforces data roles with row/column grants via validated
  * DDL (reference: src/server/app/deepsec/database.py:229-434) and guards
  * outbound URLs against SSRF (src/url_safety.py, used by
  * webscrape.py:113-119). On Spark the same semantics are views: a row
  * policy is a semi-join against an allowlist (never a collected IN-list —
  * the policy table can be large and changes independently), a column
  * grant is a projection, and masking is an expression. All of it stays
  * inside Catalyst, so pushdown/pruning still apply to governed views —
  * at 100 TB the row policy PRUNES the scan rather than post-filtering.
  */
object Governance {

  /** Row-level policy: keep rows whose `keyCol` appears in the policy
    * frame's `policyKeyCol`. Left-semi join — broadcastable when small,
    * shuffle-safe when not. */
  def applyRowPolicy(df: DataFrame, keyCol: String,
                     policy: DataFrame, policyKeyCol: String): DataFrame =
    df.join(policy.select(col(policyKeyCol).as(keyCol)).distinct(),
      Seq(keyCol), "left_semi")

  /** Mask the tail of a string column: keep the first `keep` chars, replace
    * the rest with '*' of the same length (format-preserving). */
  def maskTail(c: Column, keep: Int): Column =
    concat(substring(c, 1, keep),
      repeat(lit("*"), greatest(length(c) - keep, lit(0))))

  /** Bucket a numeric column to `width`-sized bands (generalization, the
    * k-anonymity move): floor(x / width) * width. floor() is exact and
    * identical across engines — double→int CASTs are not (Spark truncates,
    * DuckDB rounds). */
  def generalize(c: Column, width: Double): Column =
    floor(c / width) * width

  /** Canonical URL (the C4/CommonCrawl dedup key): lowercase scheme+host,
    * default :80/:443 ports stripped, fragment dropped, tracking params
    * (utm_*, fbclid, gclid) removed, remaining query params SORTED so
    * param order never splits a dedup group, empty path → '/'. Pure
    * regexp/array column ops in the RE2-compatible subset, so the oracle
    * replays every step. Two pages fetched via cosmetically-different
    * URLs collapse to one key BEFORE any content hashing — the cheapest
    * dedup tier in a crawl pipeline. Precondition: run [[urlIsSafe]] (or
    * any scheme://host validation) first — schemeless or IPv6-literal
    * inputs are out of this parser's RE2-safe subset. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = lower(regexp_extract(url, "^[A-Za-z]+://([^/:?#]+)", 1))
    val port = regexp_extract(url, "^[A-Za-z]+://[^/:?#]+:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val rawPath = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    // query must PRECEDE any fragment: a '?' inside '#frag?x=1' is part of
    // the fragment, not a query — [^#?]* pins the match before the first '#'
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val params = sort_array(filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid=") &&
        !p.startsWith("gclid=")))
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns — the
    * release gate a governed export runs before publishing "anonymized"
    * rows (Sweeney 2002; Machanavajjhala 2007): every equivalence class
    * of the quasi-identifier tuple must hold ≥ k rows (else its members
    * are re-identifiable) and ≥ l distinct sensitive values (else the
    * class size hides nothing — everyone in it shares the secret).
    *
    * One aggregate: the corpus collapses to its QI classes map-side
    * (class count bounded by the QI domain product, not the corpus);
    * `countDistinct` within the class is exact. Returns one row per
    * class: (qiCols..., class_size, l_div, k_violation, l_violation) —
    * the publishable subset is the all-false rows, and the violating
    * rows ARE the remediation worklist (suppress or generalize them). */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_div"))
      .withColumn("k_violation", col("class_size") < k)
      .withColumn("l_violation", col("l_div") < l)
  }

  /** t-closeness audit (Li et al. 2007), the release gate k-anonymity and
    * l-diversity miss: a class can be large and diverse yet still leak if
    * its SENSITIVE-VALUE DISTRIBUTION differs sharply from the corpus's.
    * Emits, per quasi-identifier class, the total-variation distance
    *
    *   TVD = ½ · Σ_s | n_cs/n_c − N_s/N |
    *
    * computed in EXACT integer arithmetic as Σ|n_cs·N − N_s·n_c| over
    * decimal(38,0) (count products overflow BIGINT at corpus scale), with
    * ONE double division at the end — oracle-replayable bit-for-bit.
    * Absent sensitive values contribute their full global mass N_s·n_c,
    * picked up by a right join onto the per-class × per-value grid only
    * for values the class actually misses — the grid is |classes|×|values|
    * rows of counts, never corpus-sized. Two map-side-combinable
    * aggregates plus one broadcast join; classes with TVD > t are the
    * suppress/generalize worklist. */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, t: Double): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    val qi = qiCols.map(col)
    val cell = df.groupBy(qi :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("n_cs"))
    val cls = cell.groupBy(qiCols.head, qiCols.tail: _*)
      .agg(sum("n_cs").as("n_c"))
    val glob = cell.groupBy(col(sensitiveCol))
      .agg(sum("n_cs").as("n_s"))
    val total = glob.agg(sum("n_s").as("n_tot"))
    // full class × value grid, so a value absent from a class still
    // contributes |0·N − N_s·n_c|
    val grid = cls.crossJoin(broadcast(glob))
      .join(cell, qiCols :+ sensitiveCol, "left")
      .na.fill(0L, Seq("n_cs"))
      .crossJoin(broadcast(total))
    grid.groupBy(qiCols.head, qiCols.tail: _*)
      .agg(max("n_c").as("class_size"),
        sum(abs(col("n_cs").cast("decimal(38,0)") * col("n_tot") -
          col("n_s").cast("decimal(38,0)") * col("n_c"))).as("_num"),
        max(col("n_c").cast("decimal(38,0)") * col("n_tot")).as("_den"))
      .withColumn("tvd",
        (col("_num").cast("double") / col("_den").cast("double")) / 2.0)
      .withColumn("t_violation", col("tvd") > t)
      .drop("_num", "_den")
  }

  /** SSRF-safe URL predicate, mirroring the reference's url_safety checks:
    * http(s) scheme only, no localhost, no RFC-1918 / link-local / loopback
    * literal hosts. RE2-compatible regexes so the oracle replays exactly. */
  def urlIsSafe(url: Column): Column = {
    val host = regexp_extract(url, "^https?://([^/:]+)", 1)
    url.rlike("^https?://") &&
      !(host === "localhost") &&
      !host.rlike("^127\\.") &&
      !host.rlike("^10\\.") &&
      !host.rlike("^192\\.168\\.") &&
      !host.rlike("^172\\.(1[6-9]|2[0-9]|3[01])\\.") &&
      !host.rlike("^169\\.254\\.")
  }

  /** Integer CDF thresholds (×2³¹−1) of the BOUNDED two-sided geometric
    * noise distribution P(k) ∝ (1/2)^|k|, k ∈ [−8, 8] — shared verbatim
    * with the q249 oracle's CASE arms. */
  val GeometricCdf: Seq[(Int, Long)] = Seq(
    -8 -> 2803503L, -7 -> 8410510L, -6 -> 19624524L, -5 -> 42052551L,
    -4 -> 86908607L, -3 -> 176620717L, -2 -> 356044938L, -1 -> 714893381L,
    0 -> 1432590265L, 1 -> 1791438708L, 2 -> 1970862929L,
    3 -> 2060575039L, 4 -> 2105431095L, 5 -> 2127859122L,
    6 -> 2139073136L, 7 -> 2144680143L)

  /** Differential-privacy-style noisy release counts: per-group counts
    * plus bounded two-sided geometric noise (the discrete Laplace /
    * geometric mechanism of Ghosh et al. 2009, truncated at ±8), clamped
    * at zero. The "randomness" is the seeded [[Sketches.keyHash]] uniform
    * of the group key's rolling fingerprint — DETERMINISTIC by design, so
    * release runs are reproducible and the oracle replays the draw; a
    * production deployment would swap the seed per release epoch. Noise
    * selection is pure BIGINT threshold compares (no float sampling).
    * Complements [[kAnonymityAudit]]: suppress small classes there,
    * perturb the published counts here. */
  def dpNoisyCounts(df: DataFrame, groupCols: Seq[String]): DataFrame = {
    val counts = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("_gk", concat_ws("|", groupCols.map(col): _*))
      .withColumn("_u",
        Sketches.keyHash(graft.functions.TextFunctions.fingerprint("_gk")))
    val noise = GeometricCdf.foldRight(lit(8L): Column) {
      case ((k, t), acc) => when(col("_u") < t, lit(k.toLong)).otherwise(acc)
    }
    counts.withColumn("noise", noise)
      .withColumn("noisy_n", greatest(lit(0L), col("n") + col("noise")))
      .select(groupCols.map(col) ++
        Seq(col("n"), col("noise"), col("noisy_n")): _*)
  }

  /** k-anonymity generalization ladder: for each candidate
    * quasi-identifier set (most → least specific), the equivalence-class
    * profile — group count, smallest class, rows in classes below `k`,
    * their share, and whether the level meets k-anonymity. The release
    * decision is the FIRST level with `meets_k` (drop columns until no
    * class is small enough to re-identify); the per-level share shows
    * what each generalization step buys. One groupBy per level over the
    * same scan — levels are a handful, so this is a single multi-agg
    * pass in practice. */
  def kAnonymityLadder(df: DataFrame, levels: Seq[Seq[String]],
                       k: Long): DataFrame =
    levels.zipWithIndex.map { case (cols0, i) =>
      val sizes =
        if (cols0.isEmpty) df.agg(count(lit(1)).as("sz"))
        else df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("sz"))
      sizes.agg(count(lit(1)).as("n_groups"), min("sz").as("min_group"),
          sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("n_below_k"),
          sum("sz").as("_n"))
        .select(lit(i).as("level"),
          lit(if (cols0.isEmpty) "(all)" else cols0.mkString(",")).as("qi"),
          col("n_groups"), col("min_group"), col("n_below_k"),
          round(col("n_below_k").cast("double") / col("_n"), 6)
            .as("share_below"),
          (col("min_group") >= k).as("meets_k"))
    }.reduce(_ unionByName _)

  /** Blocklist scan (the C4 bad-word gate, kept to substring semantics):
    * per (group, pattern), how many docs contain the pattern and how
    * many occurrences total — occurrences via the replace-and-measure
    * identity (len(t) − len(replace(t, p, ''))) / len(p), all exact
    * integers, no regex. Map-side |patterns|-way explode; one grouped
    * aggregate. The worklist readout a filtering pipeline tunes its
    * list against before committing to drops. */
  def blocklistScan(df: DataFrame, srcCol: String, textCol: String,
                    patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "blocklistScan: need non-empty patterns")
    df.select(col(srcCol).as("src"), col(textCol).as("t"))
      .select(col("src"), col("t"),
        explode(array(patterns.map(lit(_)): _*)).as("p"))
      .withColumn("hits", expr(
        "(length(t) - length(replace(t, p, ''))) div length(p)"))
      .groupBy("src", "p")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum("hits").as("total_hits"))
      .withColumn("doc_share",
        round(col("n_docs_hit").cast("double") / col("n_docs"), 6))
      .orderBy("src", "p")
  }

  /** Local-differential-privacy frequency estimation by k-ary
    * randomized response (Warner 1965 / RAPPOR's direct-encoding
    * case): each row reports its TRUE category with probability
    * p = pNum/pDen, else a uniformly "random" category — here derived
    * from the replayable key hash, which makes the privatization
    * reproducible for audit while keeping the per-row report
    * plausible-deniable w.r.t. anyone without the key column. The
    * collector sees only `obs`; the unbiased debias is
    * n̂_v = (obs_v − n·(1−p)/k) / p  (since P(report v | true v) =
    * p + (1−p)/k and P(report v | true u≠v) = (1−p)/k), computed as an
    * exact-integer numerator over one double division. `rel_err`
    * against the ground truth measures the privacy-utility cost at
    * THIS n — the number that says whether the mechanism's noise
    * drowns your tail categories.
    *
    * Map-side report projection + one k-row aggregate; nothing about
    * the mechanism changes at 100 TB except that rel_err shrinks as
    * 1/√n. */
  def ldpFrequency(df: DataFrame, idCol: String, catCol: String,
                   categories: Seq[String], pNum: Int = 3,
                   pDen: Int = 4): DataFrame = {
    require(categories.nonEmpty && pNum >= 1 && pNum < pDen,
      "need categories and 1 <= pNum < pDen")
    val k = categories.size
    val catArr = array(categories.map(lit): _*)
    val h = graft.operators.Sketches.keyHash(col(idCol))
    val h2 = graft.operators.Sketches.keyHash(col(idCol),
      graft.plans.HashExpressions.PolyBase2)
    val reported = when(h % pDen < pNum, col(catCol))
      .otherwise(element_at(catArr, (pmod(h2, lit(k.toLong)) + 1)
        .cast("int")))
    val base = df.select(col(idCol), col(catCol), reported.as("rep"))
    val truth = base.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("true_n"))
    val obs = base.groupBy(col("rep").as("category"))
      .agg(count(lit(1)).as("obs_n"))
    val n = base.agg(count(lit(1)).as("_n"))
    truth.join(obs, Seq("category"), "full_outer")
      .crossJoin(broadcast(n))
      .withColumn("true_n", coalesce(col("true_n"), lit(0L)))
      .withColumn("obs_n", coalesce(col("obs_n"), lit(0L)))
      .withColumn("est_n", round(
        (col("obs_n") * lit(k.toLong) * pDen -
          col("_n") * lit((pDen - pNum).toLong)).cast("double") /
          (lit(k.toLong) * pNum), 6))
      .withColumn("rel_err", round(when(col("true_n") > 0,
        abs(col("est_n") - col("true_n").cast("double")) /
          col("true_n")), 6))
      .select("category", "true_n", "obs_n", "est_n", "rel_err")
      .orderBy("category")
  }
}
