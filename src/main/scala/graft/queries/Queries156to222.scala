package graft
package queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators._
import graft.pipeline.Embedder
import QueryHelpers._
import OracleHelpers._

/** Query builders + DuckDB oracles q156-q222, split verbatim from
  * SparkEntry (see its scaladoc for the oracle-parity contract; NOTES.md
  * for the hash/decimal replay rules). */
private[graft] object Queries156to222 extends QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    "q156_bigram_lm" -> ((s, dir) =>
      // corpus-trained bigram-LM surprisal per document (the CCNet
      // perplexity gate) in exact integer log2 units — bit-length of the
      // exact corpus counts, BIGINT sums, one final division
      NgramLm.bigramLmScore(tbl(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),


    "q157_pmi_collocations" -> ((s, dir) =>
      // phrase mining: top-20 collocations by exact PMI ratio; the
      // unigram vocabulary broadcasts onto the bigram table, top-k is a
      // bounded heap
      NgramLm.pmiCollocations(tbl(s, dir, "documents"), "text",
        minCount = 5L, k = 20)),


    "q158_classifier_auc" -> ((s, dir) => {
      // ranking power of the hashed-bigram quality classifier against the
      // Gopher heuristic gate: exact Mann-Whitney AUC with tie correction,
      // all-BIGINT numerator (u2 = 2U), single output row
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), col("margin"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
      Evaluation.aucByRankSum(scored, "margin", "quality_pass")
    }),


    "q159_calibration" -> ((s, dir) => {
      // reliability diagram of the classifier margin vs the Gopher gate:
      // 10 fixed bins over [-0.5, 0.5], per-bin size + positive fraction
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), col("margin"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
      Evaluation.calibrationBins(scored, "margin", "quality_pass", nBins = 10)
        .orderBy("bin")
    }),


    "q160_shard_moves" -> ((s, dir) =>
      // rendezvous-hash shard routing + resize audit: per current shard
      // (of 16), keys moved when growing to 17 — expect ≈ 1/17; pure
      // map-side argmax fold, no shuffle before the 16-row aggregate
      DataLayout.shardMovement(
          tbl(s, dir, "documents").select(col("doc_id")), "doc_id", 16)
        .orderBy("shard")),


    "q161_knn_triangles" -> ((s, dir) => {
      // structure audit of the q101 kNN graph: undirected triangle census
      // + transitivity via the canonical a<b<c node-iterator join (fan-out
      // bounded by the kNN degree cap)
      GraphAnalytics.triangleStats(
        storedKnnGraph(s, dir),
        "id", "nbr_id")
    }),


    "q162_token_entropy" -> ((s, dir) =>
      // per-doc unigram entropy (repetition/compressibility gate) in
      // exact integer log2 units — two map-side-combined aggregates
      NgramLm.tokenEntropy(tbl(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),


    "q163_zipf_octaves" -> ((s, dir) =>
      // vocabulary health: term/occurrence mass per log2-frequency octave
      // (Zipf decay audit) — the per-shard corpus monitor
      NgramLm.zipfOctaves(tbl(s, dir, "documents"), "text")
        .orderBy("octave")),


    "q164_domain_report" -> ((s, dir) => {
      // per-source curation report card (Dolma-style): volume, Gopher
      // pass rate, exact-dup rate (content fingerprint), decimal-exact
      // mean classifier margin — the dashboard a 100 TB curation run is
      // steered by; one corpus scan feeds classifier+fingerprint, the
      // Gopher gate joins on doc_id
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .withColumn("_fp", TF.fingerprint("text"))
        .withColumn("_fpn", count(lit(1)).over(Window.partitionBy("_fp")))
      scored
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("n_chars"),
          sum(when(col("quality_pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("_fpn") > 1, 1L).otherwise(0L)).as("n_dup"),
          sum(col("margin").cast("decimal(24,6)")).cast("double").as("_sm"))
        .select(col("source"), col("n_docs"), col("n_chars"),
          (col("n_pass").cast("double") / col("n_docs")).as("pass_rate"),
          (col("n_dup").cast("double") / col("n_docs")).as("dup_rate"),
          (col("_sm") / col("n_docs")).as("mean_margin"))
        .orderBy("source")
    }),


    "q165_winnowing" -> ((s, dir) => {
      // MOSS winnowing fingerprints: shared-passage pairs the shingle-set
      // LSH family can only approximate — each doc and its truncated twin
      // share every window outside the cut tail
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      Winnowing.sharedFingerprintPairs(corpus, "doc_id", "text",
          k = 8, w = 16, minShared = 4)
        .orderBy("doc_a", "doc_b")
    }),


    "q166_edit_verified" -> ((s, dir) => {
      // two-stage near-dup: LSH proposes, exact Levenshtein confirms —
      // the O(len²) DP runs only on LSH survivors, never corpus-wide
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      Dedup.editVerifiedPairs(corpus, "doc_id", "text",
          shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8,
          minEditSim = 0.9)
        .orderBy("doc_a", "doc_b")
    }),


    "q167_ndcg" -> ((s, dir) => {
      // graded ranking quality of the q103 IVF probe: nDCG@3 with exact
      // rational discounts (integer DCG numerators, one final division);
      // assignment served from the standing AnnStore
      val e = tbl(s, dir, "embeddings")
      val assigned = storedAssigned(s, dir)
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val approx = Similarity.ivfSearchBatch(assigned, "embedding", "vec_id",
        codebook(s, dir), "cid", "cv", queries, "qv", "qid", 3, 2)
      val exact = Similarity.topKBatch(e, "embedding", "vec_id",
        queries, "qv", "qid", 3)
      Evaluation.ndcgRational(approx, exact, "query_id", "vec_id", "rank", 3)
        .orderBy("query_id")
    }),


    "q168_rater_kappa" -> ((s, dir) => {
      // Cohen's κ between the model-based gate (q100 classifier label)
      // and the rule-based one (q71 Gopher pass) — beyond-chance
      // agreement, the sanity check before either filters a corpus
      val d = tbl(s, dir, "documents")
      Evaluation.cohenKappa(
        TextQuality.classifierScore(d, "doc_id", "text")
          .select(col("doc_id"), col("label"))
          .join(TextQuality.gopherMetrics(d, "doc_id", "text")
            .select(col("doc_id"), col("quality_pass")), Seq("doc_id")),
        "label", "quality_pass")
    }),


    "q169_distinct_ngrams" -> ((s, dir) =>
      // distinct-1/2/3 diversity per source — template-dominated sources
      // score low even when per-document dedup passes
      NgramLm.distinctNgrams(tbl(s, dir, "documents"), "source", "text", 3)
        .orderBy("source", "n")),


    "q170_ks_drift" -> ((s, dir) => {
      // exact two-sample KS over the event value distribution (mod-3
      // snapshot split as q147): integer cross-multiplied CDF gaps,
      // one division at the end
      val e = events(s, dir).filter(col("value").isNotNull)
      Stats.ksStatistic(
        e.filter(col("event_id") % 3 === 0),
        e.filter(col("event_id") % 3 =!= 0), "value")
    }),


    "q171_gini_sources" -> ((s, dir) =>
      // token-mass concentration across sources — the mix audit number
      Stats.giniConcentration(
        tbl(s, dir, "documents").select(col("source"),
          size(TextQuality.tokens(lower(col("text")))).cast("long").as("w")),
        "source", "w")),


    "q172_kcenter" -> ((s, dir) =>
      // greedy k-center coreset: 6 maximally-diverse exemplars under
      // cosine distance, each round one distributed argmax job
      Clustering.kCenterGreedy(tbl(s, dir, "embeddings"), "embedding",
          "vec_id", 6)
        .select(col("sel_rank"), col("id").as("vec_id"),
          round(col("dist"), 6).as("dist"))
        .orderBy("sel_rank")),


    // ---- TPC-H completion: the five shapes the suite still lacked ------
    // (no partsupp table in the testdata — Q2/Q11/Q16/Q20 derive the
    // part-supplier relation from lineitem, keeping each query's
    // *plan shape* faithful: correlated-min join-back, nation-pair
    // disjunction, scalar-subquery threshold, NOT-IN distinct count,
    // nested-aggregate semi-join)

    "q173_min_cost_supplier" -> ((s, dir) => {
      // TPC-H Q2 shape: cheapest regional supplier per part. The
      // correlated MIN subquery becomes a per-part argmin computed once
      // and joined back; the threshold frame is tiny → broadcast, so the
      // only shuffle is the cost groupBy on (part, supp)
      val cost = tbl(s, dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("supply_cost"))
      val sup = broadcast(tbl(s, dir, "supplier")
        .join(broadcast(tbl(s, dir, "nation")
          .join(broadcast(tbl(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey")))
      val elig = cost
        .join(broadcast(tbl(s, dir, "part")
          .filter(col("p_type") === "LARGE" && col("p_size").between(20, 30))),
          col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
      val minc = elig.groupBy(col("p_partkey").as("_pk"))
        .agg(min("supply_cost").as("_min_cost"))
      elig.join(broadcast(minc),
          col("p_partkey") === col("_pk") && col("supply_cost") === col("_min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          round(col("supply_cost"), 6).as("supply_cost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    }),


    "q174_volume_shipping" -> ((s, dir) => {
      // TPC-H Q7: bilateral trade volume between two nations by ship
      // year — the nation-pair disjunction rides on two broadcast copies
      // of nation; lineitem⋈orders stays the only fact-fact shuffle
      val n1 = broadcast(tbl(s, dir, "nation")
        .select(col("n_nationkey").as("_sn_key"), col("n_name").as("supp_nation")))
      val n2 = broadcast(tbl(s, dir, "nation")
        .select(col("n_nationkey").as("_cn_key"), col("n_name").as("cust_nation")))
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(tbl(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("_sn_key"))
        .join(n2, col("c_nationkey") === col("_cn_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),


    "q175_important_parts" -> ((s, dir) => {
      // TPC-H Q11 shape: parts whose regional inventory value exceeds a
      // fraction of the total — the scalar subquery is a 1-row broadcast
      // crossJoin onto the per-part aggregate, not a second scan pass
      val asiaSup = broadcast(tbl(s, dir, "supplier")
        .join(broadcast(tbl(s, dir, "nation")
          .join(broadcast(tbl(s, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey"))
      val perPart = tbl(s, dir, "lineitem")
        .join(asiaSup, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(dsum(col("l_extendedprice") * col("l_quantity")).as("part_value"))
      val total = perPart.agg(
        sum(col("part_value").cast("decimal(30,6)")).cast("double").as("_total"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_value") > col("_total") * 0.0001)
        .select(col("l_partkey").as("p_partkey"), col("part_value"))
        .orderBy(desc("part_value"), col("p_partkey"))
    }),


    "q176_supplier_part_counts" -> ((s, dir) => {
      // TPC-H Q16 shape: distinct-supplier counts per part attribute,
      // NOT IN (complaint suppliers) as a broadcast anti-join before the
      // distinct — the exclusion never shuffles
      val ps = tbl(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      ps.join(broadcast(tbl(s, dir, "supplier")
            .filter(col("s_acctbal") < 0).select("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(tbl(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 9, 19, 25, 36, 49))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    }),


    "q177_excess_capacity" -> ((s, dir) => {
      // TPC-H Q20 shape: suppliers whose all-time shipped quantity of
      // 'red' parts more than doubles their 1996 volume — the nested
      // aggregate subquery folds into ONE conditional groupBy (two sums,
      // one shuffle), then a semi-join into supplier
      val qty96 = sum(when(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"),
        col("l_quantity")).otherwise(lit(0.0)).cast("decimal(24,6)"))
        .cast("double")
      val ps = tbl(s, dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(col("l_quantity")).as("qty_total"), qty96.as("qty_1996"))
      val holders = ps
        .join(broadcast(tbl(s, dir, "part").filter(col("p_name").like("red %"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .filter(col("qty_1996") > 0 && col("qty_total") > col("qty_1996") * 2)
        .select("l_suppkey").distinct()
      tbl(s, dir, "supplier")
        .join(holders, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    }),


    // ---- Data-quality profiling (Deequ-style pre-training audit) -------

    "q178_column_profile" -> ((s, dir) =>
      // one-shuffle per-column profile of the corpus table: unpivot to
      // (column_name, value) then a single partial-capable aggregate —
      // no per-column scan, no Expand-node multi-distinct
      Profiling.columnProfile(tbl(s, dir, "documents"))
        .orderBy("column_name")),


    "q179_constraint_audit" -> ((s, dir) => {
      // the declared-invariant gate over the star schema: key uniqueness,
      // two FK containments, two value-range memberships — violation
      // COUNTS, one union-of-aggregates action, all-zeros ⇔ contract holds
      val li = tbl(s, dir, "lineitem")
      val dupCount = (df: org.apache.spark.sql.DataFrame, keys: Seq[String]) =>
        Profiling.duplicateKeys(df, keys)
          .agg(coalesce(sum(col("_n")), lit(0L)).as("n"))
      Profiling.auditReport(Seq(
        "lineitem_pk_unique" -> dupCount(li, Seq("l_orderkey", "l_linenumber")),
        "documents_pk_unique" -> dupCount(tbl(s, dir, "documents"), Seq("doc_id")),
        "orders_custkey_fk" -> Profiling.orphanCount(
          tbl(s, dir, "orders"), "o_custkey", tbl(s, dir, "customer"), "c_custkey"),
        "lineitem_orderkey_fk" -> Profiling.orphanCount(
          li, "l_orderkey", tbl(s, dir, "orders"), "o_orderkey"),
        "discount_in_unit_range" -> li
          .filter(col("l_discount") < 0 || col("l_discount") > 1)
          .agg(count(lit(1)).as("n")),
        "quantity_positive" -> li.filter(col("l_quantity") <= 0)
          .agg(count(lit(1)).as("n"))))
        .select(col("check").as("check_name"), col("n_violations"), col("passed"))
        .orderBy("check_name")
    }),


    "q180_ivfpq_search" -> ((s, dir) => {
      // the production 100 TB ANN configuration — IVF partition pruning ×
      // PQ compression composed end to end: probe 2 of 8 cells, ADC-score
      // only those cells' codes (table lookups over m=4 small ints per
      // row), exact-rerank the 12-row shortlist. Stored
      // partitionBy(centroid_id), the probe is a partition-pruned scan;
      // the original floats are touched only for the shortlist
      val e = tbl(s, dir, "embeddings")
      val assigned = storedAssigned(s, dir)
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val cb = operators.Quantization.pqCodebook(64, 4, 4)
      val encoded = operators.Quantization.pqEncode(assigned, "embedding", cb)
      val cents = codebookSeq(s, dir)
      val qv = e.filter(col("vec_id") === 5).select("embedding").head().getSeq[Float](0)
      val probeIds = Similarity.nearestCentroidIds(cents, qv, 2)
      val shortlist = operators.Quantization.pqSearch(
        encoded.filter(col("centroid_id").isin(probeIds: _*)), "vec_id", qv, cb, 12)
      graft.plans.VectorExpressions.register(s)
      shortlist
        .withColumn("distance", call_function("graft_cosine_distance",
          col("embedding"), typedLit(qv)))
        .orderBy(col("distance").asc, col("vec_id").asc)
        .limit(6)
        .select(col("vec_id"), col("centroid_id"),
          round(col("adc_dist"), 6).as("adc_dist"),
          round(col("distance"), 6).as("distance"))
    }),


    "q181_mad_outliers" -> ((s, dir) => {
      // robust per-group outlier gate: median/MAD instead of mean/stddev
      // (one junk burst can't drag the threshold the way it does the q110
      // z-score path). Exact LOWER median — rank (n+1) div 2 under a
      // value sort — so no interpolation arithmetic to keep in sync
      // across engines; the per-group medians ride back as broadcasts
      val e = events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      def lowerMedian(df: DataFrame, vcol: String, out: String) = {
        val w = Window.partitionBy("event_type").orderBy(col(vcol))
        df.withColumn("_rn", row_number().over(w))
          .withColumn("_cnt", count(lit(1)).over(Window.partitionBy("event_type")))
          .filter(col("_rn") === expr("(_cnt + 1) div 2"))
          .select(col("event_type"), col(vcol).as(out))
      }
      val med = lowerMedian(e, "value", "med")
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = lowerMedian(dev.select(col("event_type"), col("dev")), "dev", "mad")
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          min("med").as("median"),
          min("mad").as("mad"),
          sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_frac", col("n_outliers").cast("double") / col("n"))
        .orderBy("event_type")
    }),


    "q182_langid_confusion" -> ((s, dir) =>
      // evaluation of the q24 language-ID heuristic against the labeled
      // lang column: confusion matrix + per-truth-label row fractions —
      // one aggregate plus a window over the (tiny) matrix
      tbl(s, dir, "documents")
        .select(col("lang"), TF.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .withColumn("frac", col("n").cast("double")
          .divide(sum("n").over(Window.partitionBy("lang"))))
        .orderBy("lang", "lang_pred")),


    "q183_pareto_frontier" -> ((s, dir) => {
      // 2-criteria skyline (Pareto frontier) document selection: keep every
      // doc not dominated on (quality, token count) — the "best of both"
      // curation set. Sort-free formulation: per-quality-level max tokens
      // (one aggregate), running max over STRICTLY higher levels (window
      // over the level table only — bounded ≤ 10^6+1 rows by the round-6
      // quality grid, so it broadcasts and the corpus never globally sorts),
      // then an equi-join back
      val d = tbl(s, dir, "documents").select(col("doc_id"),
        TF.qualityScore(col("text")).as("quality"),
        TF.tokenCount(col("text")).cast("long").as("n_tokens"))
      val lvl = d.groupBy("quality").agg(max("n_tokens").as("_lm"))
      val wl = Window.orderBy(col("quality").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val run = lvl.withColumn("_pm", max("_lm").over(wl))
      d.join(broadcast(run), "quality")
        .filter(col("n_tokens") === col("_lm") &&
          (col("_pm").isNull || col("n_tokens") > col("_pm")))
        .select(col("doc_id"), col("quality"), col("n_tokens"))
        .orderBy(desc("quality"), desc("n_tokens"), col("doc_id"))
    }),


    "q184_group_trend" -> ((s, dir) => {
      // exact OLS drift line per event_type: value ~ seconds since the
      // group's first event. Every sufficient statistic accumulates as an
      // exact INTEGER (seconds × value-cents), so no decimal-rounding
      // parity hazards; slope/R² then evaluate in double over those exact
      // sums — identical expression trees on both engines. One shuffle
      val e = events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), unix_timestamp(col("ts")).as("xs"),
          round(col("value") * 100).cast("long").as("v100"))
      val g = e.groupBy("event_type").agg(min("xs").as("_x0"))
      val d = e.join(broadcast(g), "event_type")
        .withColumn("x", col("xs") - col("_x0"))
      val dec = (c: Column) => sum(c.cast("decimal(38,0)")).cast("double")
      val sums = d.groupBy("event_type").agg(
        count(lit(1)).cast("double").as("n"),
        dec(col("x")).as("sx"), dec(col("v100")).as("sy"),
        dec(col("x") * col("x")).as("sxx"),
        dec(col("x") * col("v100")).as("sxy"),
        dec(col("v100") * col("v100")).as("syy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val denX = col("n") * col("sxx") - col("sx") * col("sx")
      val denY = col("n") * col("syy") - col("sy") * col("sy")
      sums.select(col("event_type"), col("n").cast("long").as("n"),
          (col("sy") / col("n") / 100.0).as("mean_value"),
          (num / denX * 86400.0 / 100.0).as("slope_per_day"),
          (num * num / (denX * denY)).as("r2"))
        .orderBy("event_type")
    }),


    "q185_agg_maintenance" -> ((s, dir) => {
      // materialized-view maintenance: a per-source aggregate STATE (the
      // 90% already ingested) merged with a new-batch DELTA aggregate via
      // one outer join of commutative-monoid states (sum/sum/max) — the
      // incremental path never rescans the base data. The ORACLE computes
      // the full aggregate directly, so the hash match IS the proof that
      // state ⊕ delta ≡ full recompute
      val docs = tbl(s, dir, "documents")
      def roll(df: DataFrame) = df.groupBy("source").agg(
        count(lit(1)).as("n"), sum(col("n_chars")).as("c"), max("doc_id").as("m"))
      val state = roll(docs.filter(col("doc_id") % 10 =!= 0))
        .select(col("source"), col("n").as("na"), col("c").as("ca"), col("m").as("ma"))
      val delta = roll(docs.filter(col("doc_id") % 10 === 0))
        .select(col("source"), col("n").as("nb"), col("c").as("cb"), col("m").as("mb"))
      state.join(delta, Seq("source"), "full_outer")
        .select(col("source"),
          (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L))).as("n_docs"),
          (coalesce(col("ca"), lit(0L)) + coalesce(col("cb"), lit(0L))).as("total_chars"),
          greatest(col("ma"), col("mb")).as("max_doc_id"))
        .orderBy("source")
    }),


    "q186_sparse_cosine" -> ((s, dir) => {
      // lexical doc-doc similarity: idf-weighted sparse cosine assembled
      // from ONE posting self-join on the term (never a dense all-pairs
      // scan); integer bit-length idf keeps every sum exact. Shingle
      // terms (q142's tokenizer) because the corpus's 31-word vocabulary
      // makes word-level tf-idf degenerate; bounded slice like q142, the
      // LSH family stays the open-corpus path
      val d = tbl(s, dir, "documents").filter(col("doc_id") < 600)
      val toks = d.select(col("doc_id").as("id"),
        explode(Dedup.shingleExpr("text", 5)).as("term"))
      Retrieval.sparseCosineJoin(toks, "id", "term",
          tau = 0.5, minDf = 2, maxDf = 120)
        .select(col("doc_a"), col("doc_b"), col("dot"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("doc_a", "doc_b")
    }),


    "q187_markov_transitions" -> ((s, dir) => {
      // next-event Markov transition matrix over WITHIN-SESSION pairs
      // (the behavioral-sequence summary funnels/q69 don't give): a pair
      // is consecutive events of one user ≤ 30 min apart — one user
      // window (same shuffle as sessionization), integer-µs gap test,
      // then a tiny matrix aggregate + per-from row normalization
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      events(s, dir).select("user_id", "event_id", "ts", "event_type")
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("_gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("from_type").isNotNull && col("_gap") <= gapUs)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prob", col("n").cast("double")
          .divide(sum("n").over(Window.partitionBy("from_type"))))
        .orderBy("from_type", "to_type")
    }),


    "q188_orc_roundtrip" -> ((s, dir) => {
      // format-portability gate: a lineitem slice written as ORC (the
      // second columnar format in the source/sink matrix), read back with
      // a pushed filter and aggregated — hash-matching the parquet-fed
      // oracle proves the engine is format-agnostic end to end
      val out = sys.props("java.io.tmpdir") + s"/graft-orc-$tmpToken/lineitem"
      tbl(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
        .write.mode("overwrite").orc(out)
      s.read.orc(out)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
        .orderBy("l_returnflag")
    }),


    "q189_csv_roundtrip" -> ((s, dir) => {
      // CSV sink/source parity (upgrades S14 from spec-only to
      // oracle-gated): orders slice → CSV with header + explicit µs
      // timestamp format → read back under the parquet schema →
      // aggregate. Doubles survive via shortest-round-trip formatting;
      // the oracle aggregates the same slice straight from parquet
      val src = tbl(s, dir, "orders")
      val out = sys.props("java.io.tmpdir") + s"/graft-csv-$tmpToken/orders"
      val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      src.filter(col("o_orderkey") % 5 === 0)
        .write.mode("overwrite").option("header", "true")
        .option("timestampFormat", tsFmt).csv(out)
      s.read.schema(src.schema).option("header", "true")
        .option("timestampFormat", tsFmt).csv(out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 4).as("total"),
          max(col("o_orderdate")).cast("timestamp_ntz").as("last_order"))
        .orderBy("o_orderpriority")
    }),


    "q190_json_roundtrip" -> ((s, dir) => {
      // JSON-lines sink/source parity completes the format matrix
      // (parquet native, ORC q188, CSV q189): a documents slice → JSON →
      // read back under the parquet schema → per-lang rollup whose
      // polynomial content fingerprint SUM proves the text survived the
      // escape/unescape byte-for-byte, not just the row counts
      val src = tbl(s, dir, "documents")
      val out = sys.props("java.io.tmpdir") + s"/graft-json-$tmpToken/documents"
      src.filter(col("doc_id") % 3 === 0)
        .write.mode("overwrite").json(out)
      s.read.schema(src.schema).json(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum("n_chars").as("total_chars"),
          sum(TF.fingerprint("text")).as("fp_sum"))
        .orderBy("lang")
    }),


    "q191_spearman" -> ((s, dir) =>
      // monotone-invariant rank correlation (quantity vs price per
      // return flag) — Pearson over doubled average ranks, which stay
      // integers under ties; two windows on one group exchange, then the
      // q111 six-sum aggregate in decimal
      Stats.spearman(tbl(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),


    "q192_kcore" -> ((s, dir) => {
      // dense-core extraction over the q101 kNN graph: 2 synchronous
      // peel rounds at k=4 — boilerplate/template families show up as
      // high-coreness clusters even when no pair crosses a duplicate
      // threshold; each round is one degree aggregate + two semi-joins
      val graph = storedKnnGraph(s, dir)
      GraphAnalytics.kCorePeel(graph, "id", "nbr_id", k = 4, rounds = 2)
        .select(col("id").as("vec_id"), col("deg"))
        .orderBy("vec_id")
    }),


    "q193_top_component" -> ((s, dir) =>
      // dominant-direction audit (all-but-the-top, Mu 2018): 2 power-
      // iteration rounds v → XᵀXv, each ONE hash aggregate of 64 decimal
      // sums (map-side partials; the corpus never shuffles); loadings +
      // the eigenvalue estimate replay bit-for-bit from decimal/sqrt ops
      Spectral.topComponent(tbl(s, dir, "embeddings"), "embedding",
          dim = 64, rounds = 2)
        .select(col("dim"), round(col("loading"), 6).as("loading"),
          round(col("lambda"), 6).as("lambda"))
        .orderBy("dim")),


    "q194_hubness" -> ((s, dir) => {
      // k-occurrence (in-degree) histogram of the q101 kNN graph — the
      // hubness pathology audit that decides whether ANN needs
      // dominant-direction removal; zero-in-degree antihubs counted via
      // the node-table left join
      val e = tbl(s, dir, "embeddings")
      val graph = storedKnnGraph(s, dir)
      GraphAnalytics.inDegreeHistogram(graph, "nbr_id", e, "vec_id")
        .orderBy("n_in")
    }),


    "q195_pack_efficiency" -> ((s, dir) =>
      // packing audit over the q85 assignment: per-shard window count,
      // final-window waste, and boundary-crossing docs — the number a
      // packing config is judged by; one extra hash aggregate on the
      // already-gated packing path
      Chunker.packEfficiency(
          Chunker.packSequences(
            tbl(s, dir, "documents")
              .select(col("doc_id"), col("lang"),
                TF.tokenCount(col("text")).as("tokens"))
              .filter(col("tokens") > 0),
            "lang", "doc_id", "tokens", 2000),
          "lang", "tokens", "spans_boundary", 2000)
        .orderBy("lang")),


    "q196_budget_curve" -> ((s, dir) =>
      // quality-vs-token-budget operating curve: cumulative tokens of
      // all docs at-or-above each quality level — corpus collapses to
      // the level table first (q183's sort-free argument), the running
      // sum windows over levels only
      Sampling.budgetCurve(
          tbl(s, dir, "documents")
            .select(TF.qualityScore(col("text")).as("quality"),
              TF.tokenCount(col("text")).cast("long").as("n_tokens")),
          "quality", "n_tokens")
        .orderBy(desc("quality")))    ,


    "q197_multiprobe_lsh" -> ((s, dir) => {
      // multi-probe hyperplane LSH (Lv 2007): the query probes its own
      // sign-bit bucket plus the 8 Hamming-1 flips — 9 literal codes, so
      // the plan is scan → map-side code → IN filter → exact cosine →
      // TakeOrdered; no shuffle, no join, and the IN list partition-
      // prunes a bucket-partitioned store
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.multiProbeSearch(e, "embedding", "vec_id", qv,
          dim = 64, nBits = 8, k = 8)
        .select(col("vec_id"), col("bucket"),
          round(col("distance"), 6).as("distance"))
    }),


    "q198_burstiness" -> ((s, dir) =>
      // stream-hygiene audit: index of dispersion of per-minute event
      // counts per type — D ≈ 1 organic, ≫ 1 bursty bot traffic; exact
      // BIGINT rational with one final divide, two map-side-partial
      // aggregates
      Stats.dispersionIndex(
          events(s, dir).select(col("event_type"), col("ts")),
          "event_type", "ts", bucketSeconds = 60L)
        .orderBy("event_type")),


    "q199_heldout_surprisal" -> ((s, dir) => {
      // train/val generalization gate: bigram LM fitted on the 80% train
      // split scores the 20% val split — OOV-bigram rate + bits/bigram
      // read the distribution gap; LM count tables are vocab-sized joins
      val d = tbl(s, dir, "documents")
      NgramLm.bigramLmScoreAgainst(
          d.filter(col("doc_id") % 10 < 8),
          d.filter(col("doc_id") % 10 >= 8), "doc_id", "text")
        .orderBy("doc_id")
    }),


    "q200_multiprobe_recall" -> ((s, dir) => {
      // the q103 recall discipline applied to the multi-probe LSH path:
      // recall@8 of q197's probe-and-rerank against exact top-8 over 5
      // queries — qualifies the nBits/probe-set config before serving
      val e = tbl(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val qvs = queries.orderBy("qid").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
      val approx = qvs.map { case (qid, qv) =>
        Similarity.multiProbeSearch(e, "embedding", "vec_id", qv,
            dim = 64, nBits = 8, k = 8)
          .select(lit(qid).as("query_id"), col("vec_id"))
      }.reduce(_ unionAll _)
      val exact = Similarity.topKBatch(e, "embedding", "vec_id",
        queries, "qv", "qid", 8)
      Similarity.recallAtK(approx, exact, "query_id", "vec_id", 8)
        .orderBy("query_id")
    }),


    "q201_source_overlap" -> ((s, dir) => {
      // provenance audit: distinct texts shared verbatim between source
      // pairs (mirrors / double-ingests); a synthetic "mirror" source
      // re-posts every 5th doc so the matrix is non-trivial at any SF.
      // Texts collapse to 16-byte digests before the pair join
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("text"), col("source")).unionAll(
        d.filter(col("doc_id") % 5 === 0)
          .select(col("text"), lit("mirror").as("source")))
      Dedup.crossSourceOverlap(corpus, "text", "source")
        .orderBy("source_a", "source_b")
    }),


    "q202_trimmed_mean" -> ((s, dir) =>
      // robust per-type value summary: exact 10%-per-side trimmed mean
      // with deterministic tie ranks; fully-trimmed groups keep a NULL
      // row instead of vanishing
      Stats.trimmedMean(
          events(s, dir).filter(col("value").isNotNull)
            .select(col("event_type"), col("value"), col("event_id")),
          "event_type", "value", "event_id", trimTenths = 1)
        .orderBy("event_type")),


    "q203_mean_pooling" -> ((s, dir) => {
      // doc-level vector from chunk embeddings: chunk (200/50) →
      // stub-embed → per-doc mean pool; the pooled norm is the topical-
      // coherence feature. Explode collapses to (doc, dim) partials
      // map-side; the full chunk→embed→pool chain replays in the oracle
      val chunks = Chunker.chunkWithIds(tbl(s, dir, "documents"),
          "doc_id", "text", 200, 50)
        .select(col("doc_id"), col("chunk").as("ctext"))
      val emb = Embedder.embed(chunks, "ctext", Embedder.stubEmbed(64))
      Embedder.meanPool(emb, "doc_id", "embedding")
        .select(col("doc_id"), col("n_chunks"),
          round(col("pool_norm"), 6).as("pool_norm"))
        .orderBy("doc_id")
    }),


    "q204_auc_by_lang" -> ((s, dir) => {
      // per-language slice of the q158 gate: exact Mann-Whitney AUC of
      // the hashed-bigram classifier against the Gopher label, stratified
      // by lang — the bias audit before a corpus-wide threshold;
      // single-class strata keep NULL-auc rows
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), col("margin"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
        .join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
      Evaluation.aucByRankSumBy(scored, "lang", "margin", "quality_pass")
        .orderBy("lang")
    }),


    "q205_tokenizer_fertility" -> ((s, dir) => {
      // tokenizer fertility audit: tokens-per-word and chars-per-token
      // per language under the q130-learned merges — the number that
      // flags a vocabulary under-serving a language (high fertility =
      // more sequence length for the same text). Merges learn once
      // globally; the apply is a map-side rewrite of the per-lang
      // vocab-sized word table, never a second corpus pass
      val d = tbl(s, dir, "documents")
      val merges = operators.Bpe
        .learnMerges(operators.Bpe.wordCounts(d, "text"), iters = 3)
        .orderBy("rank").select("sym_a", "sym_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      val wl = d.select(col("lang"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy("lang", "word").agg(count(lit(1)).as("freq"))
      operators.Bpe.applyMerges(wl, merges)
        .select(col("lang"), col("freq"),
          size(col("tokens")).as("ntok"), length(col("word")).as("nchr"))
        .groupBy("lang").agg(
          sum("freq").as("n_words"),
          sum(col("freq") * col("ntok")).as("n_tokens"),
          sum(col("freq") * col("nchr")).as("n_chars"))
        .select(col("lang"), col("n_words"), col("n_tokens"), col("n_chars"),
          (col("n_tokens").cast("double") / col("n_words"))
            .as("tokens_per_word"),
          (col("n_chars").cast("double") / col("n_tokens"))
            .as("chars_per_token"))
        .orderBy("lang")
    }),


    "q206_join_size_estimate" -> ((s, dir) => {
      // sketch-based join-cardinality statistic (AMS/CMS F2): self-join
      // size on l_partkey estimated from the 4×1024 grid alone — min
      // over depth of Σ cell² — vs the exact Σ c_k²; the broadcast-vs-
      // shuffle decision input a 100 TB optimizer reads from sketches,
      // never from a key rescan
      val li = tbl(s, dir, "lineitem").select(col("l_partkey").as("key"))
      val grid = Sketches.cmsCounters(li, "key", 4, 1024)
      val est = Sketches.cmsInnerProduct(grid, grid)
      val exact = li.groupBy("key").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).cast("long").as("exact_f2"))
      est.crossJoin(exact)
        .select(col("inner_product_est"), col("exact_f2"),
          (col("inner_product_est").cast("double") / col("exact_f2"))
            .as("over_ratio"))
    }),


    "q207_bbit_minhash" -> ((s, dir) => {
      // b-bit minhash (Li & König 2010): q20's LSH pairs re-estimated
      // from ONE packed 63-bit signature per doc (8 bytes vs 256 for the
      // full array — the signature table you can keep hot at 100 TB);
      // per pair the whole cost is XOR + popcount. est_jaccard (full
      // sig) rides along so the query itself exhibits the estimator's
      // agreement with the 64-value estimate on true near-dups
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      val bs = Dedup.bbitSignatures(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64)
      pairs
        .join(bs.select(col("id").as("doc_a"), col("bsig").as("_ba")), "doc_a")
        .join(bs.select(col("id").as("doc_b"), col("bsig").as("_bb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
          Dedup.bbitEstimate(col("_ba"), col("_bb")).as("est_bbit"))
        .orderBy("doc_a", "doc_b")
    }),


    "q208_chi2_terms" -> ((s, dir) => {
      // χ² token feature selection against the lang='en' label — the
      // vocabulary audit behind a fastText-style classifier (and the
      // label-leak detector): exact-integer 2×2 contingency per term,
      // one map-side-combined aggregate over distinct (doc, term) pairs
      Evaluation.chi2TopTerms(
        tbl(s, dir, "documents").withColumn("is_en", col("lang") === "en"),
        "doc_id", "text", "is_en", topK = 30)
    }),


    "q209_golden_record" -> ((s, dir) => {
      // golden-record survivorship over the q56 dedup clusters: each
      // cluster collapses to one canonical record — min id, mode lang /
      // source (ties to the smallest value), max kept-text length. The
      // "merge & survive" step an MDM/curation pipeline runs after
      // linkage; all mode picks are min_by hash aggregates, no windows
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      val clusters = Dedup.dedupClusters(pairs, "doc_a", "doc_b",
        edgePartitions = 8)
      val attrs = clusters
        .join(corpus, clusters("id") === corpus("doc_id"))
        .join(d.select(col("doc_id").as("_base"), col("lang"), col("source")),
          expr("id % 1000000") === col("_base"))
        .select(col("cluster_rep"), col("id"), col("lang"), col("source"),
          length(col("text")).as("kept_chars"))
      Linkage.goldenRecords(attrs, "id", "cluster_rep",
          modeCols = Seq("lang", "source"), maxCols = Seq("kept_chars"))
        .orderBy("cluster_id")
    }),


    "q210_containment" -> ((s, dir) => {
      // exact containment self-join (Broder's resemblance-vs-containment
      // split): half-prefix twins are shingle-SUBSETS of their base docs
      // — near-zero Jaccard pairs that only containment finds (quote /
      // superstring dedup). Prefix filter on the contained side only;
      // bounded slice, like q142's ground-truth role
      val d = tbl(s, dir, "documents").filter(col("doc_id") < 400)
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) div 2, 5))")))
      val toks = corpus.select(col("doc_id").as("id"),
        explode(Dedup.shingleExpr("text", 5)).as("tok"))
      Dedup.containmentJoin(toks, "id", "tok", tau = 0.9)
        .orderBy("doc_a", "doc_b")
    }),


    "q211_theilsen" -> ((s, dir) => {
      // Theil–Sen robust drift per event_type: lower-median of pairwise
      // slopes between exact daily sums — the trend line q184's OLS
      // cannot have dragged by outlier days. Pairs are over DAYS (one
      // bounded self-join), never events
      val e = events(s, dir).filter(col("value").isNotNull)
      val daily = e.groupBy(col("event_type"),
          expr("unix_timestamp(ts) div 86400").as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("v100"))
      Stats.theilSenSlope(daily, "event_type", "day", "v100")
        .select(col("event_type"), col("n_points"), col("n_pairs"),
          (col("ts_slope") / 100.0).as("slope_per_day"))
        .orderBy("event_type")
    }),


    "q212_bootstrap" -> ((s, dir) =>
      // deterministic Poisson bootstrap of mean doc length: per-(row,
      // rep) multiplicities are Binomial(8,1/8) draws from the scrambled
      // key hash — reproducible error bars in one corpus pass, the
      // uncertainty primitive eval dashboards need at 100 TB
      Stats.bootstrapMeans(tbl(s, dir, "documents"), "doc_id", "n_chars",
        reps = 32)),


    "q213_frequent_itemsets" -> ((s, dir) =>
      // Apriori/SON frequent token itemsets at 40% support — boilerplate
      // and template-bundle mining; candidate expansion is per-document
      // over broadcast-pruned frequent items, counts are map-side
      // combinable aggregates, the level-3 Apriori prune is lossless so
      // the oracle thresholds directly
      operators.Itemsets.frequentItemsets(tbl(s, dir, "documents"),
        "doc_id", "text", supNum = 2, supDen = 5)),


    "q214_grid_dbscan" -> ((s, dir) =>
      // grid-density clustering of the embedding corpus: density on
      // hyperplane sign-CELLS (≤ 2^6), clusters = components of
      // Hamming-1-adjacent core cells, sparse cells are NULL-cluster
      // noise. The corpus only ever maps and counts; the graph work is
      // on ≤ 64 nodes by construction
      operators.Clustering.gridDbscan(tbl(s, dir, "embeddings"),
          "vec_id", "embedding", dim = 64, nBits = 6, minPts = 10)
        .orderBy("id")),


    "q215_path_trigrams" -> ((s, dir) => {
      // top within-session 3-step event paths — the sequence-mining
      // extension of q187's transition matrix (funnels show ONE declared
      // path; this surfaces the paths users actually take). One user
      // window, two leads, session gap ≤ 30 min between consecutive
      // steps, then a tiny combinable count and a bounded top-20
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      events(s, dir).select("user_id", "event_id", "ts", "event_type")
        .withColumn("_t1", lead(col("event_type"), 1).over(w))
        .withColumn("_t2", lead(col("event_type"), 2).over(w))
        .withColumn("_g1", unix_micros(lead(col("ts"), 1).over(w))
          - unix_micros(col("ts")))
        .withColumn("_g2", unix_micros(lead(col("ts"), 2).over(w))
          - unix_micros(lead(col("ts"), 1).over(w)))
        .filter(col("_t2").isNotNull &&
          col("_g1") <= gapUs && col("_g2") <= gapUs)
        .groupBy(col("event_type").as("step1"), col("_t1").as("step2"),
          col("_t2").as("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(20)
    }),


    "q216_clustering_ari" -> ((s, dir) => {
      // external clustering validation: purity + EXACT adjusted Rand
      // index of the IVF cell assignment vs the embeddings' labels —
      // pure pair-counting (binomials of exact BIGINTs), no NMI logs;
      // the corpus collapses to one |cells|×|labels| contingency —
      // served column-pruned from the standing AnnStore (cells + labels,
      // no vectors read)
      val assigned = storedAssigned(s, dir)
        .select(col("centroid_id"), col("label"))
      Evaluation.clusterAgreement(assigned, "centroid_id", "label")
    }),


    "q217_source_ablation" -> ((s, dir) => {
      // leave-one-source-out AUC in ONE pass: the doubled rank-sum
      // decomposes over (pos source, neg source), so U_without(s) =
      // U_total − row_s − col_s + U(s,s) — data valuation for "which
      // source props up / drags down the quality classifier"
      // classifierScore and gopherMetrics are both row-local withColumn
      // pipelines that RETAIN their input columns, so they compose into
      // ONE corpus scan (r12) — the previous two doc_id self-joins
      // re-scanned the corpus twice and shuffled it twice for the same
      // (margin, quality_pass, source) rows
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.gopherMetrics(
          TextQuality.classifierScore(d, "doc_id", "text"),
          "doc_id", "text", keep = Seq("margin", "source"))
        .select(col("doc_id"), col("margin"), col("quality_pass"),
          col("source"))
      Evaluation.sourceAblationAuc(scored, "source", "margin",
          "quality_pass")
        .orderBy("source")
    }),


    "q218_k_anonymity" -> ((s, dir) =>
      // k-anonymity / l-diversity release gate over the (lang, length
      // bucket) quasi-identifier with source as the sensitive attribute:
      // classes under k=5 rows or l=3 distinct sources are the
      // suppress/generalize worklist. One map-side-combinable aggregate
      operators.Governance.kAnonymityAudit(
          tbl(s, dir, "documents")
            .withColumn("len_bucket", expr("n_chars div 100")),
          Seq("lang", "len_bucket"), "source", k = 5, l = 3)
        .orderBy("lang", "len_bucket")),


    "q219_fd_audit" -> ((s, dir) =>
      // declared-candidate functional-dependency audit: the PK FD
      // o_orderkey→o_custkey must hold exactly; the other three are
      // near/non-FDs whose violating-class counts profile the schema.
      // Four tiny aggregates union into one action
      operators.Profiling.fdAudit(tbl(s, dir, "orders"),
          Seq(("o_orderkey", "o_custkey"),
            ("o_custkey", "o_orderpriority")))
        .unionByName(operators.Profiling.fdAudit(tbl(s, dir, "lineitem"),
          Seq(("l_orderkey", "l_suppkey"), ("l_partkey", "l_suppkey"))))
        .orderBy("lhs_col", "rhs_col")),


    "q220_cluster_evolution" -> ((s, dir) => {
      // dedup-ops snapshot diff: clusters of the 300-doc old corpus vs
      // the full corpus — per old cluster: split (members now under
      // several reps), merged (a new cluster absorbed several old ones),
      // grown (new-corpus joiners), or stable. The question every
      // incremental dedup ingest has to answer before promoting
      val d = tbl(s, dir, "documents")
      def corpus(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("text")).union(
          df.select(col("doc_id") + 1000000,
            expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      def clusters(c: org.apache.spark.sql.DataFrame) =
        Dedup.dedupClusters(
          Dedup.minhashLshPairs(c, "doc_id", "text",
            shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8),
          "doc_a", "doc_b", edgePartitions = 8)
      Dedup.clusterEvolution(
          clusters(corpus(d.filter(col("doc_id") < 300))),
          clusters(corpus(d)))
        .orderBy("old_rep")
    }),


    "q221_clean_block" -> ((s, dir) => {
      // clean-block salvage: the longest contiguous run of C4-passing
      // 12-token pseudo-lines per doc — main-content extraction where
      // q99 keeps scattered lines; one doc-window shuffle (q87's
      // gaps-and-islands shape)
      val d = tbl(s, dir, "documents")
        .withColumn("lines", TextQuality.tokenLinesFromText(col("text"), 12))
      TextQuality.cleanBlock(d, "doc_id", "lines", minWords = 5,
          blocklist = Seq("slow"))
        .orderBy("id")
    }),


    "q222_boilerplate" -> ((s, dir) =>
      // per-source template detection: the modal 8-token document prefix
      // and its share — a stamped header/footer bug owns a large share;
      // one (source, prefix) count + min_by argmax, no sorts
      TextQuality.boilerplatePrefix(tbl(s, dir, "documents"), "source",
          "text", prefixTokens = 8, shareThreshold = 0.2)
        .orderBy("source"))
  )

  def oracleSql: Map[String, String] = Map(


      "q156_bigram_lm" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |g AS (
          |  SELECT doc_id, t[CAST(i AS INT)] AS ctx,
          |    t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg
          |  FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
          |  WHERE len(t) >= 2),
          |c AS (
          |  SELECT doc_id,
          |    CAST(length(bin(COUNT(*) OVER (PARTITION BY ctx))) -
          |      length(bin(COUNT(*) OVER (PARTITION BY bg))) AS BIGINT) AS s
          |  FROM g)
          |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          |  CAST(SUM(s) AS BIGINT) AS surprisal_bits,
          |  CAST(MAX(s) AS BIGINT) AS max_surprisal,
          |  CAST(SUM(s) AS DOUBLE) / COUNT(*) AS bits_per_bigram
          |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,


      "q157_pmi_collocations" ->
        """WITH toks AS (
          |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_tok
          |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
          |tt AS (SELECT CAST(SUM(c_tok) AS BIGINT) AS n_tokens FROM uni),
          |bgc AS (
          |  SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2,
          |    CAST(COUNT(*) AS BIGINT) AS c_bg
          |  FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
          |  GROUP BY 1, 2),
          |tb AS (SELECT CAST(SUM(c_bg) AS BIGINT) AS n_bigrams FROM bgc)
          |SELECT b.w1, b.w2, b.c_bg, u1.c_tok AS c1, u2.c_tok AS c2,
          |  CAST(b.c_bg AS DOUBLE) * n_tokens / n_bigrams * n_tokens
          |    / u1.c_tok / u2.c_tok AS pmi_ratio
          |FROM bgc b JOIN uni u1 ON b.w1 = u1.tok JOIN uni u2 ON b.w2 = u2.tok, tt, tb
          |WHERE b.c_bg >= 5
          |ORDER BY pmi_ratio DESC, w1, w2 LIMIT 20""".stripMargin,


      "q158_classifier_auc" -> classifierAucOracleSql,


      "q159_calibration" -> calibrationOracleSql,


      "q160_shard_moves" -> shardMovesOracleSql,


      "q161_knn_triangles" -> knnTrianglesOracleSql,


      "q162_token_entropy" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |tc AS (SELECT doc_id, tok, COUNT(*) AS c
          |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok),
          |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
          |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
          |    CAST(SUM(c * (length(bin(c)) - 1)) AS BIGINT) AS sum_clog
          |  FROM tc GROUP BY doc_id)
          |SELECT doc_id, n_tokens, n_distinct,
          |  CAST(n_tokens * (length(bin(n_tokens)) - 1) - sum_clog AS BIGINT) AS entropy_bits,
          |  CAST(n_tokens * (length(bin(n_tokens)) - 1) - sum_clog AS DOUBLE)
          |    / n_tokens AS bits_per_token
          |FROM agg ORDER BY doc_id""".stripMargin,


      "q163_zipf_octaves" ->
        """WITH toks AS (
          |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |c AS (SELECT tok, COUNT(*) AS c
          |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok)
          |SELECT CAST(length(bin(c)) - 1 AS INT) AS octave,
          |  CAST(COUNT(*) AS BIGINT) AS n_terms,
          |  CAST(SUM(c) AS BIGINT) AS n_occurrences,
          |  CAST(MIN(c) AS BIGINT) AS min_count,
          |  CAST(MAX(c) AS BIGINT) AS max_count
          |FROM c GROUP BY 1 ORDER BY octave""".stripMargin,


      "q164_domain_report" -> domainReportOracleSql,


      "q165_winnowing" -> winnowingOracleSql,


      "q166_edit_verified" -> editVerifiedOracleSql,


      "q167_ndcg" -> ndcgOracleSql,


      "q168_rater_kappa" -> raterKappaOracleSql,


      "q169_distinct_ngrams" -> distinctNgramsOracleSql,


      "q170_ks_drift" ->
        """WITH e AS (SELECT event_id, value FROM events WHERE value IS NOT NULL),
          |r AS (SELECT value AS v, CAST(COUNT(*) AS BIGINT) AS nr
          |  FROM e WHERE event_id % 3 = 0 GROUP BY value),
          |c AS (SELECT value AS v, CAST(COUNT(*) AS BIGINT) AS nc
          |  FROM e WHERE event_id % 3 <> 0 GROUP BY value),
          |m AS (SELECT coalesce(r.v, c.v) AS v, coalesce(nr, 0) AS nr,
          |    coalesce(nc, 0) AS nc FROM r FULL JOIN c ON r.v = c.v),
          |t AS (SELECT CAST(SUM(nr) AS BIGINT) AS tr, CAST(SUM(nc) AS BIGINT) AS tc FROM m),
          |cum AS (SELECT v, SUM(nr) OVER w AS cr, SUM(nc) OVER w AS cc FROM m
          |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |best AS (SELECT abs(cr * tc - cc * tr) AS g, v FROM cum, t
          |  ORDER BY g DESC, v ASC LIMIT 1)
          |SELECT t.tr AS n_ref, t.tc AS n_cur, CAST(b.g AS BIGINT) AS d_num,
          |  CAST(t.tr * t.tc AS BIGINT) AS d_denom,
          |  CAST(b.g AS DOUBLE) / (t.tr * t.tc) AS ks_d, b.v AS d_at
          |FROM t, best b""".stripMargin,


      "q171_gini_sources" ->
        """WITH tc AS (SELECT source,
          |    CAST(SUM(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> ''))) AS BIGINT) AS w
          |  FROM documents GROUP BY source),
          |rk AS (SELECT source, w, row_number() OVER (ORDER BY w, source) AS i FROM tc),
          |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
          |    CAST(SUM(w) AS BIGINT) AS total_weight,
          |    CAST(SUM(i * w) AS BIGINT) AS iw FROM rk)
          |SELECT n_groups, total_weight,
          |  CAST(2 * iw - (n_groups + 1) * total_weight AS BIGINT) AS gini_num,
          |  CAST(2 * iw - (n_groups + 1) * total_weight AS DOUBLE)
          |    / (n_groups * total_weight) AS gini
          |FROM agg""".stripMargin,


      "q172_kcenter" -> kcenterOracleSql,


      "q173_min_cost_supplier" ->
        """WITH cost AS (SELECT l_partkey, l_suppkey,
          |    MIN(l_extendedprice / l_quantity) AS supply_cost
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT s_acctbal, s_name, n_name, p_partkey,
          |  round(c.supply_cost, 6) AS supply_cost
          |FROM part, cost c, supplier, nation, region
          |WHERE p_partkey = c.l_partkey AND s_suppkey = c.l_suppkey
          |  AND p_type = 'LARGE' AND p_size BETWEEN 20 AND 30
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'EUROPE'
          |  AND c.supply_cost = (
          |    SELECT MIN(c2.supply_cost)
          |    FROM cost c2, supplier s2, nation n2, region r2
          |    WHERE c2.l_partkey = p_partkey AND s2.s_suppkey = c2.l_suppkey
          |      AND s2.s_nationkey = n2.n_nationkey
          |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,


      "q174_volume_shipping" ->
        s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  CAST(year(l_shipdate) AS INT) AS l_year,
           |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
           |FROM lineitem, orders, customer, supplier, nation n1, nation n2
           |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           |  AND l_suppkey = s_suppkey
           |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
           |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
           |  AND l_shipdate >= TIMESTAMP '1996-01-01'
           |  AND l_shipdate < TIMESTAMP '1998-01-01'
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,


      "q175_important_parts" ->
        s"""WITH v AS (
           |  SELECT l_partkey,
           |    ${dsumSql("l_extendedprice * l_quantity")} AS part_value
           |  FROM lineitem
           |  WHERE l_suppkey IN (
           |    SELECT s_suppkey FROM supplier, nation, region
           |    WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           |      AND r_name = 'ASIA')
           |  GROUP BY 1)
           |SELECT l_partkey AS p_partkey, part_value FROM v
           |WHERE part_value > 0.0001 * (
           |  SELECT CAST(SUM(CAST(part_value AS DECIMAL(30,6))) AS DOUBLE) FROM v)
           |ORDER BY part_value DESC, p_partkey""".stripMargin,


      "q176_supplier_part_counts" ->
        """SELECT p_brand, p_type, p_size,
          |  count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
          |WHERE p_partkey = l_partkey
          |  AND p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          |  AND p_size IN (1, 9, 19, 25, 36, 49)
          |  AND l_suppkey NOT IN (
          |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY 1, 2, 3
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,


      "q177_excess_capacity" ->
        s"""WITH ps AS (
           |  SELECT l_partkey, l_suppkey,
           |    ${dsumSql("l_quantity")} AS qty_total,
           |    CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
           |        AND l_shipdate < TIMESTAMP '1997-01-01'
           |      THEN l_quantity ELSE 0.0 END AS DECIMAL(24,6))) AS DOUBLE)
           |      AS qty_1996
           |  FROM lineitem GROUP BY 1, 2)
           |SELECT s_name, s_acctbal FROM supplier
           |WHERE s_suppkey IN (
           |  SELECT ps.l_suppkey FROM ps, part
           |  WHERE p_partkey = ps.l_partkey AND p_name LIKE 'red %'
           |    AND ps.qty_1996 > 0 AND ps.qty_total > 2 * ps.qty_1996)
           |ORDER BY s_name""".stripMargin,


      "q178_column_profile" -> {
        val one = (c: String) =>
          s"""SELECT '$c' AS column_name, count(*) AS n_rows,
             |  count($c) AS n_nonnull,
             |  count(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
             |  min(CAST($c AS VARCHAR)) AS min_str,
             |  max(CAST($c AS VARCHAR)) AS max_str FROM documents""".stripMargin
        Seq("doc_id", "text", "lang", "source", "n_chars")
          .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
      },


      "q179_constraint_audit" ->
        """WITH checks AS (
          |  SELECT 'lineitem_pk_unique' AS check_name,
          |    CAST(COALESCE((SELECT SUM(n) FROM (
          |      SELECT count(*) AS n FROM lineitem
          |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)), 0)
          |      AS BIGINT) AS n_violations
          |  UNION ALL
          |  SELECT 'documents_pk_unique',
          |    CAST(COALESCE((SELECT SUM(n) FROM (
          |      SELECT count(*) AS n FROM documents
          |      GROUP BY doc_id HAVING count(*) > 1)), 0) AS BIGINT)
          |  UNION ALL
          |  SELECT 'orders_custkey_fk',
          |    (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
          |      AND o_custkey NOT IN (SELECT c_custkey FROM customer))
          |  UNION ALL
          |  SELECT 'lineitem_orderkey_fk',
          |    (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
          |      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
          |  UNION ALL
          |  SELECT 'discount_in_unit_range',
          |    (SELECT count(*) FROM lineitem
          |      WHERE l_discount < 0 OR l_discount > 1)
          |  UNION ALL
          |  SELECT 'quantity_positive',
          |    (SELECT count(*) FROM lineitem WHERE l_quantity <= 0))
          |SELECT check_name, n_violations, n_violations = 0 AS passed
          |FROM checks ORDER BY check_name""".stripMargin,

      "q180_ivfpq_search" -> ivfpqOracleSql,


      "q181_mad_outliers" ->
        """WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
          |r AS (SELECT event_type, value,
          |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
          |    count(*) OVER (PARTITION BY event_type) AS cnt FROM e),
          |med AS (SELECT event_type, value AS med FROM r WHERE rn = (cnt + 1) // 2),
          |d AS (SELECT e.event_type, e.value, m.med,
          |    abs(e.value - m.med) AS dev
          |  FROM e JOIN med m ON e.event_type = m.event_type),
          |r2 AS (SELECT event_type, dev,
          |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
          |    count(*) OVER (PARTITION BY event_type) AS cnt FROM d),
          |mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (cnt + 1) // 2)
          |SELECT d.event_type, count(*) AS n, min(d.med) AS median,
          |  min(m.mad) AS mad,
          |  CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_outliers,
          |  CAST(SUM(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END) AS DOUBLE)
          |    / count(*) AS outlier_frac
          |FROM d JOIN mad m ON d.event_type = m.event_type
          |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,


      "q182_langid_confusion" ->
        s"""WITH pred AS (
           |  SELECT lang, $caseExpr AS lang_pred FROM (
           |    SELECT doc_id, lang, ${langMarkers.map(l => s"${l._1}_hits").mkString(", ")},
           |      $bestExpr AS best
           |    FROM (SELECT doc_id, lang, ${hitCols.mkString(", ")} FROM documents)))
           |SELECT lang, lang_pred, count(*) AS n,
           |  CAST(count(*) AS DOUBLE)
           |    / SUM(count(*)) OVER (PARTITION BY lang) AS frac
           |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


      "q183_pareto_frontier" ->
        s"""WITH d AS (SELECT doc_id, $qualitySql AS quality,
           |    CAST(len($toks) AS BIGINT) AS n_tokens
           |  FROM documents),
           |lvl AS (SELECT quality, max(n_tokens) AS lm FROM d GROUP BY quality),
           |run AS (SELECT quality, lm, max(lm) OVER (ORDER BY quality DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM lvl)
           |SELECT d.doc_id, d.quality, d.n_tokens
           |FROM d JOIN run r ON d.quality = r.quality
           |WHERE d.n_tokens = r.lm AND (r.pm IS NULL OR d.n_tokens > r.pm)
           |ORDER BY d.quality DESC, d.n_tokens DESC, d.doc_id""".stripMargin,


      "q184_group_trend" ->
        """WITH e AS (SELECT event_type,
          |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS xs,
          |    CAST(round(value * 100) AS BIGINT) AS v100
          |  FROM events WHERE value IS NOT NULL),
          |g AS (SELECT event_type, min(xs) AS x0 FROM e GROUP BY event_type),
          |d AS (SELECT e.event_type, e.xs - g.x0 AS x, e.v100
          |  FROM e JOIN g USING (event_type)),
          |s AS (SELECT event_type,
          |    CAST(count(*) AS DOUBLE) AS n,
          |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(v100 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(x * v100 AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
          |    CAST(SUM(CAST(v100 * v100 AS DECIMAL(38,0))) AS DOUBLE) AS syy
          |  FROM d GROUP BY event_type)
          |SELECT event_type, CAST(n AS BIGINT) AS n,
          |  sy / n / 100.0 AS mean_value,
          |  (n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400.0 / 100.0
          |    AS slope_per_day,
          |  (n * sxy - sx * sy) * (n * sxy - sx * sy)
          |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
          |FROM s ORDER BY event_type""".stripMargin,


      // full recompute on purpose: matching the Spark side's state⊕delta
      // merge path proves the maintenance is equivalent to a rebuild
      "q185_agg_maintenance" ->
        """SELECT source, count(*) AS n_docs,
          |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          |  max(doc_id) AS max_doc_id
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,


      "q186_sparse_cosine" ->
        """WITH g AS (
          |  SELECT DISTINCT doc_id, substring(text, CAST(s AS INT) + 1, 5) AS tok
          |  FROM documents, unnest(range(0, length(text) - 4, 1)) AS t(s)
          |  WHERE length(text) >= 5 AND doc_id < 600
          |  UNION
          |  SELECT doc_id, text AS tok FROM documents
          |  WHERE length(text) < 5 AND doc_id < 600),
          |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM g),
          |tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM g GROUP BY 1, 2),
          |dfq AS (SELECT term, count(*) AS df FROM tf
          |  GROUP BY term HAVING count(*) BETWEEN 2 AND 120),
          |w AS (SELECT tf.doc_id, tf.term,
          |    tf.tf * (length(bin(n_docs // df)) - 1) AS w
          |  FROM tf JOIN dfq USING (term), nd
          |  WHERE tf.tf * (length(bin(n_docs // df)) - 1) > 0),
          |nsq AS (SELECT doc_id, SUM(w * w) AS nsq FROM w GROUP BY doc_id),
          |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |    CAST(SUM(a.w * b.w) AS BIGINT) AS dot
          |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b, dot,
          |  round(CAST(dot AS DOUBLE)
          |    / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))), 6)
          |    AS cosine
          |FROM p JOIN nsq na ON p.doc_a = na.doc_id
          |  JOIN nsq nb ON p.doc_b = nb.doc_id
          |WHERE CAST(dot AS DOUBLE)
          |    / (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) >= 0.5
          |ORDER BY doc_a, doc_b""".stripMargin,


      "q187_markov_transitions" ->
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |    event_type FROM events),
          |l AS (SELECT event_type,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS from_type,
          |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) AS gap_us
          |  FROM e),
          |p AS (SELECT from_type, event_type AS to_type, count(*) AS n FROM l
          |  WHERE from_type IS NOT NULL AND gap_us <= 1800000000 GROUP BY 1, 2)
          |SELECT from_type, to_type, n,
          |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS prob
          |FROM p ORDER BY 1, 2""".stripMargin,


      // fed from PARQUET on purpose: the Spark side answers from its ORC
      // round trip, so the match proves format fidelity
      "q188_orc_roundtrip" ->
        s"""SELECT l_returnflag, count(*) AS n,
           |  ${dsumSql("l_extendedprice")} AS total
           |FROM lineitem
           |WHERE l_orderkey % 7 = 0
           |  AND l_shipdate >= TIMESTAMP '1996-01-01'
           |GROUP BY 1 ORDER BY 1""".stripMargin,


      "q189_csv_roundtrip" ->
        s"""SELECT o_orderpriority, count(*) AS n,
           |  ${dsumSql("o_totalprice", 4)} AS total,
           |  max(o_orderdate) AS last_order
           |FROM orders WHERE o_orderkey % 5 = 0
           |GROUP BY 1 ORDER BY 1""".stripMargin,


      // fed from PARQUET: the Spark side answers from its JSON round
      // trip; the fingerprint sum pins byte-exact text fidelity
      "q190_json_roundtrip" ->
        """SELECT lang, count(*) AS n,
          |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          |  CAST(SUM(list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(range(1, length(text) + 1),
          |      i -> CAST(ord(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
          |    (acc, c) -> (acc * 31 + c) % 1000000007)) AS BIGINT) AS fp_sum
          |FROM documents WHERE doc_id % 3 = 0
          |GROUP BY 1 ORDER BY 1""".stripMargin,


      // doubled average ranks (2·rank() + ties − 1 — integers), then the
      // q111 six-sum Pearson; the doubling cancels in the ratio
      "q191_spearman" ->
        """WITH rk AS (SELECT l_returnflag,
          |    2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
          |      + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx,
          |    2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
          |      + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry
          |  FROM lineitem),
          |st AS (SELECT l_returnflag, COUNT(*) AS n,
          |    CAST(SUM(CAST(rx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(ry AS DECIMAL(38,0))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(rx AS DECIMAL(19,0)) * CAST(rx AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(ry AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(rx AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0))) AS DOUBLE) AS sxy
          |  FROM rk GROUP BY l_returnflag)
          |SELECT l_returnflag, n,
          |  round((n * sxy - sx * sy) /
          |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS rho
          |FROM st ORDER BY l_returnflag""".stripMargin,


      "q192_kcore" -> kCoreOracleSql,


      // two power-iteration rounds replayed: per-row dots and per-dim
      // sums as exact DECIMAL(38,18) accumulations, norms via IEEE sqrt;
      // round(,6) absorbs the decimal→double 1-ulp engine divergence on
      // sums whose integer representation passes 2^53 (NOTES rule on
      // decimal→double)
      "q193_top_component" ->
        """WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |s1 AS (SELECT vec_id,
          |    CAST(SUM(CAST(v[CAST(i AS INT) + 1] * 0.125 AS DECIMAL(38,18))) AS DOUBLE) AS s
          |  FROM x, unnest(range(0, 64)) AS t(i) GROUP BY vec_id),
          |w1 AS (SELECT CAST(i AS INT) AS dim,
          |    CAST(SUM(CAST(s1.s * x.v[CAST(i AS INT) + 1] AS DECIMAL(38,18))) AS DOUBLE) AS w
          |  FROM x JOIN s1 USING (vec_id), unnest(range(0, 64)) AS t(i) GROUP BY i),
          |n1 AS (SELECT sqrt(CAST(SUM(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE)) AS nrm FROM w1),
          |v1 AS (SELECT dim, w / nrm AS vd FROM w1, n1),
          |s2 AS (SELECT x.vec_id,
          |    CAST(SUM(CAST(x.v[v1.dim + 1] * v1.vd AS DECIMAL(38,18))) AS DOUBLE) AS s
          |  FROM x, v1 GROUP BY x.vec_id),
          |w2 AS (SELECT CAST(i AS INT) AS dim,
          |    CAST(SUM(CAST(s2.s * x.v[CAST(i AS INT) + 1] AS DECIMAL(38,18))) AS DOUBLE) AS w
          |  FROM x JOIN s2 USING (vec_id), unnest(range(0, 64)) AS t(i) GROUP BY i),
          |n2 AS (SELECT sqrt(CAST(SUM(CAST(w * w AS DECIMAL(38,18))) AS DOUBLE)) AS nrm FROM w2)
          |SELECT dim, round(w / nrm, 6) AS loading, round(nrm, 6) AS lambda
          |FROM w2, n2 ORDER BY dim""".stripMargin,


      // q101's graph replay, then the k-occurrence histogram with
      // zero-in-degree antihubs kept by the node-table left join
      "q194_hubness" ->
        s"""$knnEdgesPrefixSql,
           |ind AS (SELECT nbr_id, count(*) AS n_in FROM g0 GROUP BY nbr_id),
           |alln AS (SELECT e.vec_id, CAST(coalesce(i.n_in, 0) AS BIGINT) AS n_in
           |  FROM embeddings e LEFT JOIN ind i ON e.vec_id = i.nbr_id)
           |SELECT n_in, count(*) AS n_nodes FROM alln
           |GROUP BY n_in ORDER BY n_in""".stripMargin,


      // the q85 packing CTE rolled up per shard; window count and waste
      // in integer // arithmetic
      "q195_pack_efficiency" ->
        """WITH t AS (SELECT doc_id, lang,
          |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS INT) AS tokens
          |  FROM documents),
          |nz AS (SELECT * FROM t WHERE tokens > 0),
          |p AS (SELECT doc_id, lang, tokens,
          |    COALESCE(SUM(tokens) OVER (PARTITION BY lang ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
          |  FROM nz),
          |pk AS (SELECT lang, tokens,
          |    ((s + tokens - 1) // 2000) > (s // 2000) AS spans_boundary
          |  FROM p),
          |a AS (SELECT lang, count(*) AS n_docs,
          |    CAST(SUM(tokens) AS BIGINT) AS total_tokens,
          |    CAST(SUM(CAST(spans_boundary AS INT)) AS BIGINT) AS n_boundary_docs
          |  FROM pk GROUP BY lang)
          |SELECT lang, n_docs, total_tokens, n_boundary_docs,
          |  (total_tokens + 1999) // 2000 AS n_windows,
          |  ((total_tokens + 1999) // 2000) * 2000 - total_tokens AS waste_tokens,
          |  CAST(total_tokens AS DOUBLE)
          |    / (((total_tokens + 1999) // 2000) * 2000) AS fill_frac
          |FROM a ORDER BY lang""".stripMargin,


      "q196_budget_curve" ->
        s"""WITH d AS (SELECT $qualitySql AS quality,
           |    CAST(len($toks) AS BIGINT) AS n_tokens
           |  FROM documents),
           |lvl AS (SELECT quality, count(*) AS n_docs,
           |    CAST(SUM(n_tokens) AS BIGINT) AS tokens
           |  FROM d GROUP BY quality)
           |SELECT quality, n_docs, tokens,
           |  CAST(SUM(n_docs) OVER (ORDER BY quality DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
           |  CAST(SUM(tokens) OVER (ORDER BY quality DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           |FROM lvl ORDER BY quality DESC""".stripMargin,


      // query code + 8 Hamming-1 flips computed in SQL from the same
      // left-fold plane dots, then the exact-cosine rerank of the
      // probed buckets
      "q197_multiprobe_lsh" ->
        s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |    FROM embeddings WHERE vec_id = 0),
           |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |b AS (SELECT vec_id, v,
           |    CAST(${hyperplaneBitsSql("v", 8)} AS BIGINT) AS bucket FROM e),
           |qc AS (SELECT ${hyperplaneBitsSql("qv", 8)} AS code FROM q),
           |probes AS (SELECT CASE WHEN i = 8 THEN code
           |    ELSE xor(code, (CAST(1 AS BIGINT) << CAST(i AS INT))) END AS p
           |  FROM qc, unnest(range(0, 9)) AS t(i))
           |SELECT b.vec_id, b.bucket,
           |  round(1.0 - list_cosine_similarity(b.v, q.qv), 6) AS distance
           |FROM b, q WHERE b.bucket IN (SELECT p FROM probes)
           |ORDER BY 1.0 - list_cosine_similarity(b.v, q.qv), b.vec_id
           |LIMIT 8""".stripMargin,


      "q198_burstiness" ->
        """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
          |bc AS (SELECT event_type, epoch_us(ts) // 60000000 AS b, count(*) AS c
          |  FROM e GROUP BY 1, 2),
          |a AS (SELECT event_type, count(*) AS n_buckets,
          |    CAST(SUM(c) AS BIGINT) AS n_events,
          |    CAST(SUM(c * c) AS BIGINT) AS scc
          |  FROM bc GROUP BY event_type)
          |SELECT event_type, n_buckets, n_events,
          |  n_buckets * scc - n_events * n_events AS d_num,
          |  n_buckets * n_events AS d_denom,
          |  CAST(n_buckets * scc - n_events * n_events AS DOUBLE)
          |    / (n_buckets * n_events) AS dispersion
          |FROM a ORDER BY event_type""".stripMargin,


      // LM counts from the train split only; val bigrams LEFT JOIN the
      // count tables; ilog2 difference = bin-length difference (the -1s
      // cancel); OOV rows counted, excluded from the surprisal sum
      "q199_heldout_surprisal" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |g AS (
          |  SELECT doc_id, t[CAST(i AS INT)] AS ctx,
          |    t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg
          |  FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
          |  WHERE len(t) >= 2),
          |tg AS (SELECT * FROM g WHERE doc_id % 10 < 8),
          |vg AS (SELECT * FROM g WHERE doc_id % 10 >= 8),
          |bgc AS (SELECT bg, count(*) AS cbg FROM tg GROUP BY bg),
          |ctxc AS (SELECT ctx, count(*) AS cctx FROM tg GROUP BY ctx),
          |j AS (SELECT vg.doc_id, b.cbg, c.cctx
          |  FROM vg LEFT JOIN bgc b USING (bg) LEFT JOIN ctxc c USING (ctx))
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |  CAST(SUM(CASE WHEN cbg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          |  CAST(coalesce(SUM(CASE WHEN cbg IS NOT NULL
          |    THEN length(bin(cctx)) - length(bin(cbg)) END), 0) AS BIGINT)
          |    AS surprisal_bits,
          |  CASE WHEN count(*) > SUM(CASE WHEN cbg IS NULL THEN 1 ELSE 0 END)
          |    THEN CAST(coalesce(SUM(CASE WHEN cbg IS NOT NULL
          |        THEN length(bin(cctx)) - length(bin(cbg)) END), 0) AS DOUBLE)
          |      / (count(*) - SUM(CASE WHEN cbg IS NULL THEN 1 ELSE 0 END))
          |  END AS bits_per_scored
          |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,


      // q197's probe logic generalized per query (code + flips joined by
      // query), then the q103 recall replay against exact top-8
      "q200_multiprobe_recall" ->
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |b AS (SELECT vec_id, v,
           |    CAST(${hyperplaneBitsSql("v", 8)} AS BIGINT) AS bucket FROM e),
           |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           |  FROM embeddings WHERE vec_id < 5),
           |qc AS (SELECT query_id, qv,
           |    CAST(${hyperplaneBitsSql("qv", 8)} AS BIGINT) AS code FROM q),
           |probes AS (SELECT query_id, CASE WHEN i = 8 THEN code
           |    ELSE xor(code, (CAST(1 AS BIGINT) << CAST(i AS INT))) END AS p
           |  FROM qc, unnest(range(0, 9)) AS t(i)),
           |approx AS (SELECT query_id, vec_id FROM (
           |    SELECT qc.query_id, b.vec_id,
           |      row_number() OVER (PARTITION BY qc.query_id
           |        ORDER BY 1.0 - list_cosine_similarity(b.v, qc.qv), b.vec_id) AS rk
           |    FROM b JOIN (SELECT DISTINCT query_id, p FROM probes) pr
           |        ON b.bucket = pr.p
           |      JOIN qc ON pr.query_id = qc.query_id) WHERE rk <= 8),
           |exact AS (SELECT query_id, vec_id FROM (
           |    SELECT q.query_id, e.vec_id,
           |      row_number() OVER (PARTITION BY q.query_id
           |        ORDER BY 1.0 - list_cosine_similarity(e.v, q.qv), e.vec_id) AS rk
           |    FROM e, q) WHERE rk <= 8),
           |hits AS (SELECT x.query_id, COUNT(*) AS n_hit
           |  FROM exact x JOIN approx ap USING (query_id, vec_id)
           |  GROUP BY x.query_id)
           |SELECT qs.query_id, coalesce(h.n_hit, 0) AS n_hit,
           |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 8 AS recall
           |FROM (SELECT DISTINCT query_id FROM exact) qs
           |LEFT JOIN hits h USING (query_id)
           |ORDER BY qs.query_id""".stripMargin,


      "q201_source_overlap" ->
        """WITH corpus AS (
          |  SELECT text, source FROM documents
          |  UNION ALL
          |  SELECT text, 'mirror' AS source FROM documents WHERE doc_id % 5 = 0),
          |hs AS (SELECT DISTINCT md5(text) AS h, source FROM corpus)
          |SELECT a.source AS source_a, b.source AS source_b,
          |  count(*) AS n_shared
          |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


      // rank/count windows share the partition; cut = (n*1)//10 per
      // side; fully-trimmed groups keep a NULL-mean row
      "q202_trimmed_mean" ->
        """WITH e AS (SELECT event_type, value, event_id FROM events
          |  WHERE value IS NOT NULL),
          |r AS (SELECT event_type, value,
          |    row_number() OVER (PARTITION BY event_type
          |      ORDER BY value, event_id) AS rk,
          |    count(*) OVER (PARTITION BY event_type) AS n
          |  FROM e),
          |k AS (SELECT event_type, value, n,
          |    rk > (n * 1) // 10 AND rk <= n - (n * 1) // 10 AS keep
          |  FROM r)
          |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
          |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |  CASE WHEN SUM(CASE WHEN keep THEN 1 ELSE 0 END) > 0
          |    THEN CAST(SUM(CASE WHEN keep
          |        THEN CAST(value AS DECIMAL(24,6)) END) AS DOUBLE)
          |      / SUM(CASE WHEN keep THEN 1 ELSE 0 END)
          |  END AS trimmed_mean
          |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin,


      "q203_mean_pooling" -> meanPoolOracleSql,


      // the q158 CTEs joined to lang; rank-sum windows partition by
      // lang; single-class strata emit NULL auc
      "q204_auc_by_lang" ->
        s"""$scoredMarginCtes,
           |bys AS (SELECT d.lang, margin AS s,
           |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS np,
           |    CAST(SUM(CASE WHEN quality_pass THEN 0 ELSE 1 END) AS BIGINT) AS nn
           |  FROM scored JOIN documents d USING (doc_id)
           |  GROUP BY d.lang, margin),
           |cum AS (SELECT lang, np, nn,
           |    coalesce(SUM(nn) OVER (PARTITION BY lang ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
           |  FROM bys)
           |SELECT lang, CAST(SUM(np) AS BIGINT) AS n_pos,
           |  CAST(SUM(nn) AS BIGINT) AS n_neg,
           |  CAST(SUM(np * (2 * cum_nn + nn)) AS BIGINT) AS u2,
           |  CASE WHEN SUM(np) > 0 AND SUM(nn) > 0
           |    THEN CAST(SUM(np * (2 * cum_nn + nn)) AS DOUBLE)
           |      / (2 * SUM(np) * SUM(nn)) END AS auc
           |FROM cum GROUP BY lang ORDER BY lang""".stripMargin,


      "q205_tokenizer_fertility" -> tokenizerFertilityOracleSql,


      // the q74 CMS cell replay, then min-over-depth of Σ cell² vs the
      // exact second frequency moment
      "q206_join_size_estimate" ->
        """WITH keys AS (SELECT l_partkey AS key FROM lineitem),
          |ch0 AS (SELECT key, (key * 1000003) % 2147483647 AS a0,
          |    (key * 999983) % 2147483647 AS b0 FROM keys),
          |ch1 AS (SELECT key, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1,
          |    (xor(b0, b0 >> 16) * 73244475) % 2147483647 AS b1 FROM ch0),
          |ch2 AS (SELECT key, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h1,
          |    ((xor(b1, b1 >> 13) * 73244475) % 2147483647) | 1 AS h2 FROM ch1),
          |cells AS (SELECT d, (h1 + d * h2) % 1024 AS pos, COUNT(*) AS c
          |  FROM ch2, unnest(range(0, 4)) AS t(d) GROUP BY d, pos),
          |dots AS (SELECT d, CAST(SUM(c * c) AS BIGINT) AS dot
          |  FROM cells GROUP BY d),
          |est AS (SELECT MIN(dot) AS inner_product_est FROM dots),
          |ex AS (SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2 FROM (
          |    SELECT COUNT(*) AS c FROM keys GROUP BY key))
          |SELECT inner_product_est, exact_f2,
          |  CAST(inner_product_est AS DOUBLE) / exact_f2 AS over_ratio
          |FROM est, ex""".stripMargin,


      // the q20 signature CTEs plus a packed-LSB column; the estimate is
      // the same XOR+popcount the Spark side runs
      "q207_bbit_minhash" ->
        s"""WITH $minhashPairCtes,
           |bsig AS (SELECT doc_id,
           |    CAST(list_sum(list_transform(range(1, 64),
           |      k -> (sig[CAST(k AS INT)] % 2) << (k - 1))) AS BIGINT) AS bsig
           |  FROM sigs),
           |p2 AS (SELECT doc_a, doc_b, est_jaccard FROM pairs
           |  WHERE est_jaccard >= 0.8)
           |SELECT doc_a, doc_b, est_jaccard,
           |  greatest(0.0,
           |    2.0 * (63 - bit_count(xor(a.bsig, b.bsig))) / 63.0 - 1.0)
           |    AS est_bbit
           |FROM p2 JOIN bsig a ON doc_a = a.doc_id
           |  JOIN bsig b ON doc_b = b.doc_id
           |ORDER BY doc_a, doc_b""".stripMargin,


      "q208_chi2_terms" ->
        """WITH lab AS (SELECT doc_id, lang = 'en' AS lab, text FROM documents),
          |pres AS (SELECT doc_id, lab, t.term
          |  FROM lab, unnest(list_distinct(list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '')))
          |    AS t(term)),
          |tot AS (SELECT
          |    CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |    CAST(SUM(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS n0
          |  FROM lab),
          |pt AS (SELECT term,
          |    CAST(SUM(CASE WHEN lab THEN 1 ELSE 0 END) AS BIGINT) AS a,
          |    CAST(SUM(CASE WHEN lab THEN 0 ELSE 1 END) AS BIGINT) AS b
          |  FROM pres GROUP BY term),
          |x AS (SELECT term, a, b, n1 - a AS c, n0 - b AS d, n1 + n0 AS n
          |  FROM pt, tot)
          |SELECT term, a AS n_label, b AS n_rest,
          |  CASE WHEN CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
          |      * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE) = 0.0
          |    THEN 0.0
          |    ELSE CAST(n AS DOUBLE)
          |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
          |         - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
          |      * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
          |         - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
          |      / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
          |         * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE))
          |  END AS chi2
          |FROM x ORDER BY chi2 DESC, term LIMIT 30""".stripMargin,


      "q209_golden_record" -> goldenRecordOracleSql,


      "q210_containment" -> containmentOracleSql,


      // q184's exact daily buckets, then the pairwise-slope median —
      // slopes are single double divisions of exact integers, the rank
      // pick replays (slope, xi, xj) ordering with // lower-median
      "q211_theilsen" ->
        """WITH e AS (SELECT event_type,
          |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400
          |      AS day,
          |    CAST(round(value * 100) AS BIGINT) AS v100
          |  FROM events WHERE value IS NOT NULL),
          |daily AS (SELECT event_type, day, CAST(SUM(v100) AS BIGINT) AS v
          |  FROM e GROUP BY 1, 2),
          |p AS (SELECT a.event_type, a.day AS xi, b.day AS xj,
          |    CAST(b.v - a.v AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
          |      AS slope
          |  FROM daily a JOIN daily b
          |    ON a.event_type = b.event_type AND a.day < b.day),
          |r AS (SELECT event_type, slope,
          |    row_number() OVER (PARTITION BY event_type
          |      ORDER BY slope, xi, xj) AS rn,
          |    COUNT(*) OVER (PARTITION BY event_type) AS np
          |  FROM p)
          |SELECT event_type,
          |  CAST(ceil((1.0 + sqrt(1.0 + 8.0 * np)) / 2) AS BIGINT)
          |    AS n_points,
          |  np AS n_pairs, slope / 100.0 AS slope_per_day
          |FROM r WHERE rn = (np + 1) // 2 ORDER BY event_type""".stripMargin,


      // the keyHash chain of doc_id·8209 + rep·127 + j, kept draws are
      // h ≡ 0 (mod 8) — Binomial(8, 1/8) multiplicities summed per rep
      "q212_bootstrap" ->
        """WITH rj AS (SELECT doc_id, n_chars, CAST(r AS INT) AS rep,
          |    doc_id * 8209 + r * 127 + j AS k
          |  FROM documents, unnest(range(0, 32)) AS t(r),
          |    unnest(range(0, 8)) AS u(j)),
          |h0 AS (SELECT rep, n_chars, (k * 1000003) % 2147483647 AS h
          |  FROM rj),
          |h1 AS (SELECT rep, n_chars,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT rep, n_chars,
          |    (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1)
          |SELECT rep, CAST(count(*) AS BIGINT) AS n_draws,
          |  CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / count(*)
          |    AS boot_mean
          |FROM h2 WHERE h % 8 = 0 GROUP BY rep ORDER BY rep""".stripMargin,


      // direct support thresholding — the Spark side's Apriori prune is
      // lossless (support monotonicity), so the oracle never replays it
      "q213_frequent_itemsets" ->
        """WITH t AS (SELECT doc_id AS id, u.item
          |  FROM documents, unnest(list_distinct(list_filter(
          |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '')))
          |    AS u(item)),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
          |l1 AS (SELECT item, CAST(count(*) AS BIGINT) AS support
          |  FROM t GROUP BY item),
          |l2 AS (SELECT a.item AS item_a, b.item AS item_b,
          |    CAST(count(*) AS BIGINT) AS support
          |  FROM t a JOIN t b ON a.id = b.id AND a.item < b.item
          |  GROUP BY 1, 2),
          |l3 AS (SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
          |    CAST(count(*) AS BIGINT) AS support
          |  FROM t a JOIN t b ON a.id = b.id AND a.item < b.item
          |  JOIN t c ON b.id = c.id AND b.item < c.item
          |  GROUP BY 1, 2, 3)
          |SELECT CAST(1 AS INT) AS k, item AS item_a,
          |  CAST(NULL AS VARCHAR) AS item_b, CAST(NULL AS VARCHAR) AS item_c,
          |  support
          |FROM l1, n WHERE support >= (n * 2) // 5
          |UNION ALL
          |SELECT CAST(2 AS INT), item_a, item_b, CAST(NULL AS VARCHAR),
          |  support
          |FROM l2, n WHERE support >= (n * 2) // 5
          |UNION ALL
          |SELECT CAST(3 AS INT), item_a, item_b, item_c, support
          |FROM l3, n WHERE support >= (n * 2) // 5
          |ORDER BY k, item_a, item_b, item_c""".stripMargin,


      "q214_grid_dbscan" -> gridDbscanOracleSql,


      "q215_path_trigrams" ->
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |    event_type FROM events),
          |l AS (SELECT event_type AS step1,
          |    lead(event_type, 1) OVER w AS step2,
          |    lead(event_type, 2) OVER w AS step3,
          |    epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS g1,
          |    epoch_us(lead(ts, 2) OVER w) - epoch_us(lead(ts, 1) OVER w)
          |      AS g2
          |  FROM e
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
          |FROM l
          |WHERE step3 IS NOT NULL AND g1 <= 1800000000 AND g2 <= 1800000000
          |GROUP BY 1, 2, 3
          |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin,


      // q35's assignment subquery → one contingency → pair-count ARI;
      // every binomial is BIGINT, // 2, the ratio one fixed double tree
      "q216_clustering_ari" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
          |    CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a0 AS (SELECT e.vec_id, e.label, c.cid AS centroid_id,
          |    row_number() OVER (PARTITION BY e.vec_id
          |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv),
          |        c.cid) AS rn
          |  FROM embeddings e, c),
          |a AS (SELECT vec_id, label, centroid_id FROM a0 WHERE rn = 1),
          |ct AS (SELECT centroid_id AS cc, label AS ll,
          |    CAST(count(*) AS BIGINT) AS nij FROM a GROUP BY 1, 2),
          |sij AS (SELECT CAST(SUM((nij * (nij - 1)) // 2) AS BIGINT)
          |    AS sum_ij FROM ct),
          |ai AS (SELECT cc, CAST(SUM(nij) AS BIGINT) AS a,
          |    CAST(MAX(nij) AS BIGINT) AS mx FROM ct GROUP BY cc),
          |sa AS (SELECT CAST(count(*) AS BIGINT) AS n_clusters,
          |    CAST(SUM((a * (a - 1)) // 2) AS BIGINT) AS sum_a,
          |    CAST(SUM(a) AS BIGINT) AS n,
          |    CAST(SUM(mx) AS BIGINT) AS purity_num FROM ai),
          |sb AS (SELECT CAST(count(*) AS BIGINT) AS n_labels,
          |    CAST(SUM((b * (b - 1)) // 2) AS BIGINT) AS sum_b
          |  FROM (SELECT ll, CAST(SUM(nij) AS BIGINT) AS b
          |    FROM ct GROUP BY ll))
          |SELECT n, n_clusters, n_labels, sum_ij, sum_a, sum_b, purity_num,
          |  CAST(purity_num AS DOUBLE) / CAST(n AS DOUBLE) AS purity,
          |  (CAST(sum_ij AS DOUBLE)
          |     - CAST(sum_a AS DOUBLE) * CAST(sum_b AS DOUBLE)
          |       / CAST((n * (n - 1)) // 2 AS DOUBLE))
          |  / ((CAST(sum_a AS DOUBLE) + CAST(sum_b AS DOUBLE)) / 2.0
          |     - CAST(sum_a AS DOUBLE) * CAST(sum_b AS DOUBLE)
          |       / CAST((n * (n - 1)) // 2 AS DOUBLE)) AS ari
          |FROM sa, sij, sb""".stripMargin,


      // the q158 scored CTEs joined to source; the U matrix decomposes
      // the doubled rank-sum by (pos source, neg source) over a dense
      // score × source negative grid
      "q217_source_ablation" ->
        s"""$scoredMarginCtes,
           |sdoc AS (SELECT s.doc_id, s.margin, s.quality_pass, d.source
           |  FROM scored s JOIN documents d USING (doc_id)),
           |bys AS (SELECT margin AS s, source AS src,
           |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT)
           |      AS np,
           |    CAST(SUM(CASE WHEN quality_pass THEN 0 ELSE 1 END) AS BIGINT)
           |      AS nn
           |  FROM sdoc GROUP BY 1, 2),
           |grid AS (SELECT sc.s, sr.src, coalesce(b.nn, 0) AS nn
           |  FROM (SELECT DISTINCT s FROM bys) sc
           |  CROSS JOIN (SELECT DISTINCT src FROM bys) sr
           |  LEFT JOIN bys b ON sc.s = b.s AND sr.src = b.src),
           |ng AS (SELECT s, src, nn,
           |    coalesce(SUM(nn) OVER (PARTITION BY src ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS cum_nn
           |  FROM grid),
           |u AS (SELECT p.src AS sp, n.src AS sn,
           |    CAST(SUM(p.np * (2 * n.cum_nn + n.nn)) AS BIGINT) AS u2
           |  FROM (SELECT s, src, np FROM bys WHERE np > 0) p
           |  JOIN ng n ON p.s = n.s GROUP BY 1, 2),
           |tot AS (SELECT source AS src,
           |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT)
           |      AS p,
           |    CAST(SUM(CASE WHEN quality_pass THEN 0 ELSE 1 END) AS BIGINT)
           |      AS nneg
           |  FROM sdoc GROUP BY 1),
           |g AS (SELECT CAST(SUM(p) AS BIGINT) AS pt,
           |    CAST(SUM(nneg) AS BIGINT) AS nt FROM tot),
           |ut AS (SELECT CAST(SUM(u2) AS BIGINT) AS u2t FROM u),
           |ru AS (SELECT sp AS src, CAST(SUM(u2) AS BIGINT) AS ur
           |  FROM u GROUP BY sp),
           |cu AS (SELECT sn AS src, CAST(SUM(u2) AS BIGINT) AS uc
           |  FROM u GROUP BY sn),
           |du AS (SELECT sp AS src, u2 AS ud FROM u WHERE sp = sn)
           |SELECT t.src AS source,
           |  pt - p AS n_pos_excl, nt - nneg AS n_neg_excl,
           |  u2t - coalesce(ur, 0) - coalesce(uc, 0) + coalesce(ud, 0)
           |    AS u2_excl,
           |  CASE WHEN pt > 0 AND nt > 0
           |    THEN CAST(u2t AS DOUBLE) / (2 * pt * nt) END AS auc_full,
           |  CASE WHEN pt - p > 0 AND nt - nneg > 0
           |    THEN CAST(u2t - coalesce(ur, 0) - coalesce(uc, 0)
           |        + coalesce(ud, 0) AS DOUBLE)
           |      / (2 * (pt - p) * (nt - nneg)) END AS auc_without,
           |  (CASE WHEN pt - p > 0 AND nt - nneg > 0
           |    THEN CAST(u2t - coalesce(ur, 0) - coalesce(uc, 0)
           |        + coalesce(ud, 0) AS DOUBLE)
           |      / (2 * (pt - p) * (nt - nneg)) END)
           |  - (CASE WHEN pt > 0 AND nt > 0
           |    THEN CAST(u2t AS DOUBLE) / (2 * pt * nt) END) AS delta_auc
           |FROM tot t CROSS JOIN g CROSS JOIN ut
           |LEFT JOIN ru ON t.src = ru.src
           |LEFT JOIN cu ON t.src = cu.src
           |LEFT JOIN du ON t.src = du.src
           |ORDER BY source""".stripMargin,


      "q218_k_anonymity" ->
        """SELECT lang, n_chars // 100 AS len_bucket,
          |  CAST(count(*) AS BIGINT) AS class_size,
          |  CAST(count(DISTINCT source) AS BIGINT) AS l_div,
          |  count(*) < 5 AS k_violation,
          |  count(DISTINCT source) < 3 AS l_violation
          |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


      "q219_fd_audit" -> fdAuditOracleSql,


      "q220_cluster_evolution" -> clusterEvolutionOracleSql,


      // q99's line CTEs → pass predicate → gaps-and-islands → per-doc
      // argmax run; docs with no passing line keep a best_len-0 row
      "q221_clean_block" ->
        """WITH d AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
          |      AS toks
          |  FROM documents),
          |l AS (SELECT doc_id,
          |    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
          |    ELSE list_transform(range(0, CAST(floor((len(toks) - 1) / 12) AS BIGINT) + 1),
          |      i -> array_to_string(toks[CAST(i * 12 + 1 AS INT) : CAST(i * 12 + 12 AS INT)], ' '))
          |    END AS lines
          |  FROM d),
          |x AS (SELECT doc_id, CAST(i AS INT) AS idx,
          |    lines[CAST(i AS INT) + 1] AS ln
          |  FROM l, unnest(range(0, len(lines))) AS u(i)),
          |p AS (SELECT doc_id, idx FROM x WHERE
          |  len(list_filter(str_split(ln, ' '), w -> w <> '')) >= 5
          |  AND len(list_filter(['slow'],
          |    w -> list_contains(str_split(ln, ' '), w))) = 0),
          |g AS (SELECT doc_id, idx,
          |    idx - (row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1)
          |      AS grp
          |  FROM p),
          |runs AS (SELECT doc_id, CAST(min(idx) AS INT) AS start,
          |    CAST(count(*) AS BIGINT) AS len
          |  FROM g GROUP BY doc_id, grp),
          |best AS (SELECT doc_id, start, len FROM runs
          |  QUALIFY row_number() OVER (PARTITION BY doc_id
          |    ORDER BY len DESC, start) = 1)
          |SELECT l.doc_id AS id, CAST(len(l.lines) AS INT) AS n_lines,
          |  best.start AS best_start, coalesce(best.len, 0) AS best_len
          |FROM l LEFT JOIN best ON l.doc_id = best.doc_id
          |ORDER BY id""".stripMargin,


      "q222_boilerplate" ->
        """WITH d AS (SELECT source,
          |    array_to_string(list_filter(
          |      regexp_split_to_array(text, '\s+'), x -> x <> '')[1:8], ' ')
          |      AS pfx
          |  FROM documents),
          |c AS (SELECT source, pfx, CAST(count(*) AS BIGINT) AS n
          |  FROM d GROUP BY 1, 2),
          |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          |  FROM d GROUP BY source),
          |top AS (SELECT source, pfx, n FROM c
          |  QUALIFY row_number() OVER (PARTITION BY source
          |    ORDER BY n DESC, pfx) = 1)
          |SELECT t.source, nd.n_docs, t.pfx AS top_prefix, t.n AS top_n,
          |  CAST(t.n AS DOUBLE) / nd.n_docs AS top_share,
          |  CAST(t.n AS DOUBLE) / nd.n_docs >= 0.2 AS is_template
          |FROM top t JOIN nd USING (source) ORDER BY source""".stripMargin
  )
}
