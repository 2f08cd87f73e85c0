package graft

import org.apache.spark.sql.functions._

/** Regression guards for physical-plan quality — the properties that make
  * these operators survive a 100× scale-up. A correctness-green change that
  * breaks one of these (filter stops pushing down, a dimension stops
  * broadcasting, top-k becomes a full sort) fails here, not in production.
  */
class PlanQualitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  /** Execute first so AQE finalizes, then inspect the real physical plan
    * (the pre-execution adaptive plan hides scan details and codegen). */
  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q06: all predicates reach the parquet scan; only needed columns read") {
    val p = plan("q06_revenue_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.02)"))
    // projection pruning: 4 of 11 lineitem columns
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp"))
  }

  test("q03: dimension tables broadcast (no shuffled join of the fact table)") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q02: all four dimension sides broadcast; the only large join is fact-fact") {
    val p = plan("q02_trade_volume")
    // nation (×2), customer+nation, supplier+nation all broadcast;
    // lineitem⋈orders stays the single big join (SMJ pre-AQE)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
    assert("SortMergeJoin".r.findAllIn(p).size <= 1)
  }

  test("q63: as-of join is one shuffle (union + window), no range explosion") {
    // examine only the executed (final) AQE plan, not the initial twin
    val p = plan("q63_asof_join").split("== Initial Plan ==").head
    // a single hash exchange on the join key feeds the running-last window;
    // the final orderBy adds its own exchange — nothing else may shuffle
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).size <= 2, p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("Window"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q31: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q31_topk_global")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial+final with whole-stage codegen") {
    val p = plan("q01_pricing_summary")
    // "* Node" marks whole-stage-codegen membership in formatted explain
    assert(p.contains("* HashAggregate"))
    assert(p.contains("partial_sum"))
  }

  test("q12: exact dedup shuffles digests, not document bodies") {
    val p = plan("q12_dedup_first")
    assert(p.contains("md5")) // partition key is the 16-byte digest
  }

  test("q17: single-query top-k is a take-ordered scan (no corpus shuffle)") {
    val p = plan("q17_cosine_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("graft_cosine_distance")) // native codegen expression in use
  }

  test("q67: packed bloom probe is a map-side filter — no probe-side join") {
    val p = plan("q67_bloom_filter")
    assert(p.contains("graft_bloom_probe")) // native expr with reference-object words
    // the probe stream must NOT explode positions and join the bit frame:
    // its only wide op is the key dedup; the remaining joins are the tiny
    // flagged⋈build stats joins
    assert(!p.contains("posexplode"))
  }

  test("q74: CMS counter grid aggregates partially map-side") {
    val p = plan("q74_cms_heavy_hitters")
    assert(p.contains("partial_count") || p.contains("partial_sum"))
    // the estimate side joins the tiny counter grid broadcast
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q76: z-order stats stay in one whole-stage-codegen aggregate — no HOFs") {
    val p = plan("q76_zorder_layout")
    assert(p.contains("* HashAggregate"))
    assert(!p.contains("CodegenFallback"), "z-value must be flat shift/mask terms")
  }

  test("q79: the governed view's row policy prunes via a broadcast semi-join") {
    val p = plan("q79_governed_view")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("SortMergeJoin")) // allowlist broadcasts
  }

  test("q75: per-group HLL is two partial-capable aggregates, never a sort") {
    val p = plan("q75_hll_distinct")
    // (group, bucket) max-rho then (group) harmonic sum — both hash
    // aggregates with map-side partials; a sort-based fallback would
    // mean the rho column stopped being fixed-width
    assert(p.contains("partial_max") && p.contains("partial_sum"))
    assert(!p.contains("SortAggregate"))
  }

  test("q77: skew audit ends in a bounded top-k, not a global sort") {
    val p = plan("q77_skew_profile").split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"))
    // the two-number totals frame must broadcast into the counts
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q82: compaction plan windows over the per-key aggregate, not rows") {
    val p = plan("q82_compaction_plan")
    // groupBy(key) BEFORE the cumulative-sum window: the window's input
    // is the aggregated frame (one row per key), so a partial aggregate
    // must appear in the plan feeding the Window
    assert(p.contains("Window"))
    assert(p.contains("partial_count"))
  }

  test("q84: contamination check broadcasts the eval side; train never shuffles grams") {
    val p = plan("q84_contamination").split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"))
    // only the matched (train,eval) hits and the final orderBy shuffle;
    // the exploded train gram stream itself must not exchange
    assert(!p.contains("SortMergeJoin"))
  }

  test("q87: dup spans is two keyed windows + final sort — three exchanges, no joins") {
    val p = plan("q87_dup_spans").split("== Initial Plan ==").head
    // gram-hash occurrence window, per-doc islands window, output orderBy —
    // nothing else may shuffle, and duplicated-gram detection must not
    // plan as a self-join of the gram stream
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).size <= 3, p.linesIterator.take(40).mkString("\n"))
    assert("Window \\(\\d+\\)".r.findAllIn(p).size == 2)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
  }

  test("q88: returned-customers top-20 is TakeOrderedAndProject over broadcast joins") {
    val p = plan("q88_returned_custs").split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q90: big-orders threshold aggregates lineitem BEFORE the joins") {
    val p = plan("q90_big_orders").split("== Initial Plan ==").head
    // the HAVING side reduces to order cardinality pre-join (partial+final
    // HashAggregate), then the tiny qualifying frame joins broadcast-side
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q91: the OR-of-ANDs predicate pushes per-relation conjuncts to both scans") {
    val p = plan("q91_brand_disjunction")
    // lineitem side: the quantity disjunction reaches the parquet scan;
    // part side: the brand disjunction reaches its scan
    assert(p.contains("PushedFilters"))
    assert(p.contains("Or(And("), "expected the disjunction pushed to a scan")
  }

  test("q93: scalar-max side broadcasts as a 1-row build (no shuffle-join of the agg)") {
    val p = plan("q93_top_supplier").split("== Initial Plan ==").head
    assert(p.contains("Cross BuildRight"), "expected the 1-row max frame broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q94: rich-idle customers anti-join + 1-row avg broadcast") {
    val p = plan("q94_rich_idle_custs").split("== Initial Plan ==").head
    assert(p.contains("LeftAnti"))
    assert(p.contains("Cross BuildRight"), "expected the scalar avg broadcast")
  }

  test("q96: per-domain cap plans as WindowGroupLimit (map-side cap before shuffle)") {
    val p = plan("q96_domain_cap")
    // partial + final group-limit: each input partition keeps a cap-sized
    // heap per domain BEFORE the exchange — a hot host never floods a task
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, "expected partial+final group limit")
  }

  test("q85: packing cumsum partitions by shard (no single-partition window)") {
    val p = plan("q85_pack_plan")
    assert(p.contains("Window"))
    // the window exchange hashes on the shard column, not a global
    // SinglePartition gather
    assert(p.contains("hashpartitioning(lang"),
      "expected a shard-hash exchange feeding the window")
  }

  test("q98: BM25 joins broadcast (df + stats are tiny); top-k is not a full sort") {
    val p = plan("q98_bm25").split("== Initial Plan ==").head
    // term-df and corpus-stats sides ride in broadcast — the (doc, term)
    // frame never re-shuffles for them
    assert(!p.contains("SortMergeJoin"), "expected broadcast joins only")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q97: index build is two aggregates; nothing else shuffles") {
    val p = plan("q97_inverted_index").split("== Initial Plan ==").head
    // (term, id) partial+final, then per-term partial+final collect_list,
    // plus the presentation orderBy — at most 3 exchanges, no joins
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).size <= 3,
      p.linesIterator.take(30).mkString("\n"))
    assert(!p.contains("Join"))
  }

  test("q101: kNN graph — broadcast centroid assign, one equi-join on the cell id") {
    val full = plan("q101_knn_graph")
    val p = full.split("== Initial Plan ==").head
    // pair generation is an EQUI-join on centroid_id (cell-local work; AQE
    // may choose broadcast-hash at tiny SF) — never a cartesian expansion
    assert(!p.contains("CartesianProduct"))
    assert("Join Inner".r.findAllIn(full).nonEmpty || full.contains("HashJoin"))
    assert(full.contains("centroid_id"), "expected the self-join keyed on centroid_id")
  }

  test("q35: centroid assignment is a pure map — no join, no window, one exchange") {
    val p = plan("q35_ivf_assign").split("== Initial Plan ==").head
    // the argmin folds inside the row's projection: the corpus×centroid
    // expansion (former crossJoin+window) must never reappear
    assert(!p.contains("Join"), "centroid argmin must not join/expand the corpus")
    assert(!p.contains("Window"), "centroid argmin must fold map-side, not window-rank")
    // the only exchange is the final presentation orderBy
    assert("Exchange \\(\\d+\\)".r.findAllIn(p).size <= 1,
      p.linesIterator.take(25).mkString("\n"))
  }

  test("q119: NN-descent stays equi-join shaped — no cartesian expansion") {
    val p = plan("q119_nn_descent")
    assert(!p.contains("CartesianProduct"),
      "candidate generation must join on shared node ids, never cross")
  }

  test("q120: the ANN store probe partition-prunes its cell directories") {
    val p = plan("q120_ann_store")
    assert("PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(p).isDefined,
      "probe must prune cells at the directory level")
  }

  test("q54: the STANDING AnnStore probe partition-prunes its cells") {
    // q54 now serves from QueryHelpers.storedAnnPath — the build-once
    // store — so its nProbe=2 cell filter must land in the scan's
    // PartitionFilters exactly like the inline-built q120 store's
    val p = plan("q54_ivf_search")
    assert("PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(p).isDefined,
      "standing-store probe must prune cells at the directory level")
  }

  test("q115/q216: pure cell consumers never read the vector column") {
    // the standing store is columnar: a consumer that only needs
    // (id, cell) or (cell, label) must not drag the 64-float embedding
    // array through its scan
    for (q <- Seq("q115_negative_samples", "q216_clustering_ari")) {
      val p = plan(q)
      val reads = "ReadSchema: [^\\n]*".r.findAllIn(p).mkString("\n")
      assert(!reads.contains("embedding"),
        s"$q reads the embedding column it never uses:\n$reads")
    }
  }

  test("q522/q527: the scalable robust gates never buffer a group " +
       "(no percentile aggregate anywhere in the plan)") {
    for (q <- Seq("q522_hampel_scalable", "q527_grouped_quartiles")) {
      val p = plan(q)
      assert(!p.toLowerCase.contains("percentile"),
        s"$q fell back to a buffering percentile:\n" +
          p.linesIterator.take(30).mkString("\n"))
    }
  }

  test("q124: PQ encode + ADC stay map-side; the result is a bounded top-k") {
    val p = plan("q124_pq_search").split("== Initial Plan ==").head
    assert(!p.contains("Join"), "PQ scoring must not join — codes and the " +
      "ADC table are plan literals")
    assert(!p.contains("Window"))
    assert(p.contains("TakeOrderedAndProject"),
      "ADC top-k must keep per-partition heaps")
  }

  test("q122: both truncated-rerank stages are bounded top-k, never full sorts") {
    val p = plan("q122_truncated_rerank").split("== Initial Plan ==").head
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      "coarse shortlist and re-rank must both keep per-partition heaps")
    assert(!p.contains("Exchange rangepartitioning"),
      "a range exchange means a stage fell back to a global sort")
  }

  test("q99/q100: line filter and classifier stay map-side (no mid-plan exchange)") {
    for (q <- Seq("q99_c4_lines", "q100_classifier")) {
      val p = plan(q).split("== Initial Plan ==").head
      // one exchange only: the final presentation orderBy
      assert("Exchange \\(\\d+\\)".r.findAllIn(p).size <= 1,
        s"$q grew a shuffle:\n" + p.linesIterator.take(25).mkString("\n"))
      assert(!p.contains("Join"))
    }
  }

  test("q102/q105: sketch merges are pure hash aggregates (no sort, no join)") {
    for (q <- Seq("q102_hll_merge", "q105_cms_merge")) {
      val p = plan(q).split("== Initial Plan ==").head
      assert(!p.contains("SortAggregate"), s"$q fell back to sort aggregation")
      if (q.startsWith("q102")) assert(!p.contains("Join"))
    }
  }

  test("q103: recall eval — probe set broadcasts; the corpus side never shuffle-joins") {
    val p = plan("q103_ann_recall").split("== Initial Plan ==").head
    // every join in the plan is broadcast (probe set, centroid set, exact
    // side) — a SortMergeJoin would mean the corpus started shuffling
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("q110/q111: stats profile is one aggregate + broadcast-back, no sort agg") {
    val p110 = plan("q110_window_anomaly").split("== Initial Plan ==").head
    assert(p110.contains("BroadcastHashJoin") && !p110.contains("SortMergeJoin"))
    val p111 = plan("q111_group_corr").split("== Initial Plan ==").head
    assert(p111.contains("HashAggregate") && !p111.contains("SortAggregate"))
    assert(!p111.contains("Join"))
  }

  test("q107: retention is two keyed shuffles + a broadcast of cohort sizes") {
    val p = plan("q107_retention").split("== Initial Plan ==").head
    // cohort sizes (tiny) must broadcast; user/week aggregates shuffle
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q109: RRF fuse ends in a bounded top-k, not a global sort") {
    val p = plan("q109_hybrid_rrf").split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q112: incremental probe broadcasts the new batch; no pair cartesian") {
    val p = plan("q112_incremental_dedup").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q114/q116: URL canonical dedup and epoch mix never join") {
    for (q <- Seq("q114_url_canonical", "q116_epoch_mix")) {
      val p = plan(q).split("== Initial Plan ==").head
      assert(!p.contains("Join"), s"$q grew a join")
    }
  }

  test("q115: negative sampling — anchors ride broadcast, corpus never sort-merges") {
    val p = plan("q115_negative_samples").split("== Initial Plan ==").head
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q117: the export composite keeps every join broadcast at gate scale") {
    val p = plan("q117_training_export").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"))
    // WindowGroupLimit from the per-source cap must survive composition
    assert(p.contains("WindowGroupLimit"), "expected the domain-cap group limit")
  }

  test("q125/q127: real-codec decode stays map-side — only the generator " +
    "spread and the output sort may exchange") {
    for (q <- Seq("q125_image_decode", "q127_wav_decode")) {
      val p = plan(q).split("== Initial Plan ==").head
      assert(!p.contains("Join"), s"$q grew a join")
      // repartition(32) of the 8-byte ids + the final orderBy: nothing else
      assert("Exchange \\(\\d+\\)".r.findAllIn(p).size <= 2,
        s"$q shuffles beyond generator-spread + sort")
    }
  }

  test("q129: beam search never scans — candidate joins broadcast, " +
    "no cartesian anywhere") {
    val p = plan("q129_graph_search").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"))
    // every beam round ends in a bounded top-k, never a global sort
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q130: BPE rounds are hash aggregates + 1-row broadcasts back") {
    val p = plan("q130_bpe_merges").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    // the per-round argmax rides back as a broadcast into the rewrite
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"), "argmax should be a bounded top-1")
  }

  test("q136/q139: iterative graph rounds truncate lineage per superstep") {
    // each round references the previous state twice, so an untruncated
    // plan doubles per iteration (and the kNN pair join would reappear in
    // every round's lineage). The eager per-round localCheckpoint means
    // the FINAL plan is a checkpoint scan + presentation ops: no corpus
    // re-scan, no pair join, and a plan string whose size is independent
    // of the iteration count.
    for (q <- Seq("q136_pagerank", "q139_label_propagation")) {
      val p = plan(q)
      assert(p.contains("Scan ExistingRDD"),
        s"$q should read the superstep checkpoint")
      assert(!p.contains("Scan parquet"),
        s"$q final plan must not re-derive the kNN join lineage")
      assert(!p.contains("CartesianProduct"), q)
      assert(p.length < 20000, s"$q plan string should stay round-bounded")
    }
  }

  test("q193: power-iteration rounds aggregate map-side — the corpus never shuffles") {
    // each round is scan → project(fold) → partial agg → SinglePartition
    // exchange of ONE 64-sum row; no corpus-sized Exchange, no explode of
    // the corpus (posexplode runs over the 1-row sums frame only), no join
    // against anything corpus-sized
    val p = plan("q193_top_component").split("== Initial Plan ==").head
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(800))
    // every Exchange is SinglePartition (aggregate partials or the 64-row
    // frames) — a hashpartitioning Exchange would mean corpus rows moved
    assert(!p.contains("hashpartitioning"),
      "corpus rows must not shuffle in the power-iteration rounds")
  }

  test("q197: multi-probe LSH is scan → filter → TakeOrdered, zero shuffles") {
    val p = plan("q197_multiprobe_lsh").split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"),
      "probe-list filter + rerank must be a single scan stage")
    assert(!p.contains("Join"), "the probe set rides as literals, not a join")
  }

  test("q192: the k-core result reads the superstep checkpoint") {
    val p = plan("q192_kcore")
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.contains("CartesianProduct"))
    assert(p.length < 20000, "plan string must stay round-bounded")
  }

  test("q145: exists/not-exists plan as hash semi/anti joins on the order key") {
    // the <>/>= extras must ride as join-condition residuals, not force
    // a nested-loop or cartesian re-scan of lineitem
    val p = plan("q145_waiting_suppliers").split("== Initial Plan ==").head
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q140: the Bloom prefilter is a map-side Filter ahead of the join") {
    // the probe itself must plan as scan + Filter with NO exchange — the
    // pruning happens before any shuffle by construction
    val fact = spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey")
    val dim = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("key"))
    val pf = graft.operators.Joins.bloomPrefilter(fact, "l_orderkey", dim, "key")
    val pp = pf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(pp.contains("graft_bloom_probe"))
    assert(!"Exchange \\(\\d+\\)".r.findFirstIn(pp).isDefined,
      "prefilter must be pure map-side")
    // and the full stats query never sort-merges the fact table (the
    // bloom probe ran at localCheckpoint time — the final plan reads the
    // already-prefiltered rows as a checkpointed RDD scan)
    val p = plan("q140_bloom_join").split("== Initial Plan ==").head
    assert(p.contains("Scan ExistingRDD") && !p.contains("SortMergeJoin"))
  }

  test("q173: correlated-min join-back — one fact shuffle, argmin broadcast back") {
    // the (part, supp) cost groupBy is the ONLY exchange of fact data;
    // part/supplier/nation/region AND the per-part min all broadcast
    val p = plan("q173_min_cost_supplier").split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q174: nation-pair disjunction broadcasts; lineitem⋈orders is the one big join") {
    val full = plan("q174_volume_shipping")
    val p = full.split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
    assert("SortMergeJoin".r.findAllIn(p).size <= 1)
    // the ship-date range reaches the scan (scan details print after the
    // AQE plan tree, so check the full explain text)
    assert(full.contains("GreaterThanOrEqual(l_shipdate"))
  }

  test("q175: scalar-subquery threshold rides as a broadcast, not a second scan pass") {
    val p = plan("q175_important_parts").split("== Initial Plan ==").head
    // semi-join exclusion broadcast + 1-row total broadcast; the per-part
    // aggregate is the only exchange of lineitem data (plus final sort)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q176: NOT-IN exclusion is a broadcast anti-join before the distinct") {
    val full = plan("q176_supplier_part_counts")
    // the anti-join is authored as a broadcast LeftAnti; at this SF there
    // are no negative-balance suppliers, so AQE's empty-relation
    // propagation may legitimately erase it from the FINAL plan — pin the
    // authored shape on the initial plan and no-sort-merge on the final
    assert(full.contains("LeftAnti"))
    assert(!full.split("== Initial Plan ==").head.contains("SortMergeJoin"))
  }

  test("q188: the ORC read-back pushes the ship-date filter into the scan") {
    val full = plan("q188_orc_roundtrip")
    assert(full.contains("Scan orc"))
    assert(full.contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("q177: nested-aggregate threshold folds to one conditional groupBy") {
    // ONE shuffle of lineitem (the (part,supp) groupBy with two sums);
    // the 'red parts' filter and the supplier semi-join both broadcast
    val p = plan("q177_excess_capacity").split("== Initial Plan ==").head
    assert(p.contains("LeftSemi"))
    assert(!p.contains("SortMergeJoin"))
    assert("HashAggregate".r.findAllIn(p).size >= 2) // partial+final
  }

  test("q233: phrase match never builds a per-doc cartesian") {
    // map-side term prune then equi-joins — no range-condition join
    // degeneration (BroadcastNestedLoop/Cartesian) anywhere
    val p = plan("q233_phrase_match").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window")) // and no rank-window fallback
  }

  test("q245: passage aggregation is partial+final doc aggregate, top-k take") {
    // min_by's struct ordering selects SortAggregate — still two-phase
    // (map-side partial before the exchange), which is the property that
    // matters; the final pick is TakeOrderedAndProject, never a full sort
    val p = plan("q245_passage_agg").split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
    assert("(Hash|Sort)Aggregate".r.findAllIn(p).size >= 2)
  }

  test("q247: fielded BM25 top-k takes, no fact-fact shuffle join") {
    // dims (df/stats) broadcast; the only cross join is the 1-row stats
    // frame; final selection is TakeOrderedAndProject
    val p = plan("q247_bm25f").split("== Initial Plan ==").head
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q250: sorted-neighborhood candidates come from equi-joins on rank") {
    val p = plan("q250_sorted_neighborhood").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q327: prefix-filtered Jaccard join never goes quadratic") {
    // candidates come from token equi-joins; the only allowed non-equi
    // shape would be a cartesian — there must be none
    val p = plan("q327_jaccard_prefix_join").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q330: q-gram edit-distance join is all equi-joins") {
    val p = plan("q330_edit_distance_join").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q335: target encoding broadcasts both aggregate sides") {
    // group stats and the global scalar join back as broadcasts — the
    // corpus-sized probe side never shuffles for the join
    val p = plan("q335_target_encoding").split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q213: itemset expansions aggregate partially (map-side combine)") {
    val p = plan("q213_frequent_itemsets").split("== Initial Plan ==").head
    // every support count is a partial+final hash aggregate pair and the
    // dictionary/prune joins broadcast — no sort-merge join anywhere
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q539: sequence-pattern expansions join by sequence id; prunes broadcast") {
    // the Apriori gates are broadcast LEFT-SEMI joins (lossless prunes
    // BEFORE the expansions), and every support count is a hash
    // aggregate — nothing sorts the corpus and nothing goes corpus²
    val p = plan("q539_sequential_patterns")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(p.contains("HashAggregate"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q542: the Jonckheere pair expansion runs on the checkpointed histogram") {
    // the corpus collapses to the (group, value) histogram at
    // localCheckpoint time, so the final plan's quadratic structure
    // joins ExistingRDD scans — the raw lineitem parquet never reaches
    // the pair join
    val p = plan("q542_jonckheere")
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.contains("Scan parquet"))
  }

  test("q541: CCF joins the bounded daily frame, never the raw events") {
    // the daily collapse is materialized before the ±lag explode-join;
    // the final plan sees only the checkpointed daily frame
    val p = plan("q541_ccf_lead_lag")
    assert(p.contains("Scan ExistingRDD"))
    assert(!p.contains("Scan parquet"))
    assert(p.contains("Generate") && p.contains("explode"))
  }

  test("q545: the learned prior joins back as a broadcast, never a shuffle") {
    // one |segments|-row moment aggregate broadcast against the
    // per-segment frame — a single-row cross side must not induce a
    // sort-merge join or exchange-heavy plan
    val p = plan("q545_eb_shrink")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q554: the incremental-WCC re-point map broadcasts — the label " +
       "store never shuffles for an O(batch) merge") {
    // the super-node rep map is batch-sized by contract; without the
    // hint its checkpointed frame has no size estimate and the re-point
    // join would sort-merge the whole label table
    val p = plan("q554_incremental_wcc")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q557: the incremental-SCC re-point map broadcasts — the label " +
       "frame never shuffles for the merge itself") {
    // the changed-label map lives in the contracted super space (q554's
    // boundedness class); the corpus-scale label table takes it as a
    // broadcast join, never a sort-merge of the store
    val p = plan("q557_incremental_scc")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q551: Mood counts aggregate partially map-side over the scan") {
    // one groupBy over the rows (partial+final) + a 1-row broadcast of
    // the marginals — no row-level shuffle beyond the group aggregate
    val p = plan("q551_mood_median")
    assert(p.contains("partial_"))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }
}
