package graft
package queries

/** Registry metadata the prose in COVERAGE.md used to carry alone —
  * encoded so a spec (RegistrySpec) and the bench can ENFORCE it:
  *
  *   - [[instruments]]: bounded GATE INSTRUMENTS — exact ground truths
  *     and replay probes whose steady cost is correctness-gate overhead,
  *     not engine cost. Bench rolls their steady seconds into a separate
  *     `instrument_steady_s` field so capability cost and engine cost
  *     are separable in BENCH_r{N}.json.
  *   - [[knnGraphConsumers]] / [[annStoreConsumers]] /
  *     [[indexStoreConsumers]]: queries that must SERVE from the
  *     standing stores ([[QueryHelpers.storedKnnGraph]] /
  *     [[QueryHelpers.storedAssigned]] / [[QueryHelpers.storedBm25]] /
  *     [[QueryHelpers.storedIndexTerms]]) rather than rebuild inline.
  *     RegistrySpec asserts each consumer's SOURCE references the
  *     store helper and never an inline builder — a regression here
  *     would otherwise only surface as an unexplained bench drift.
  *   - [[machineryGates]]: queries that keep inline builds BY DESIGN
  *     because they gate the build/assign/merge machinery itself.
  *     RegistrySpec asserts these are the ONLY query blocks calling the
  *     inline builders.
  */
private[graft] object QueryTags {

  /** Bounded correctness instruments (the r8 verdict's five heaviest
    * steady queries are all here — exact ground truths that calibrate
    * or replay, never the scale path itself):
    *   q142 exact PPJoin ground truth (calibrates q143's LSH recall),
    *   q383 HITS power-iteration sweeps (the cost IS the operator),
    *   q387 full-scan order-invariant table checksum,
    *   q524 real micro-batch watermark replay,
    *   q538 definition-exact SCC closure on the contracted graph
    *     (the bounded twin of q546's scalable FW-BW path),
    *   q547 real micro-batch session-timeout replay,
    *   q550 real micro-batch stream-stream outer-join replay. */
  val instruments: Set[String] = Set(
    "q142_similarity_join",
    "q383_hits",
    "q387_table_checksum",
    "q524_watermark_replay",
    "q538_scc_labels",
    "q547_timeout_replay",
    "q550_outer_join_replay",
    // r10: the incremental-SCC-state merge gates rebuild the OLD
    // standing state (labels + condensation via FW-BW on 7/8 of the
    // contracted flow graph) inline each run so the merge has
    // something to merge into — that rebuild is pure gate overhead (a
    // standing corpus pays it once, not per query); and the dedup
    // replay is a real 4-micro-batch execution like q524/q547/q550
    "q557_incremental_scc",
    "q559_condensation_merge",
    "q560_dedup_eviction_replay",
    // r11: q557's production-path twin — same inline standing-state
    // rebuild overhead, same oracle
    "q561_incremental_scc_standing")

  /** Serve from the standing kNN GraphStore (QueryHelpers.storedKnnGraph
    * / storedKnnGraphPath). */
  val knnGraphConsumers: Set[String] = Set(
    "q136_pagerank", "q137_ppr_expand", "q139_label_propagation",
    "q161_knn_triangles", "q192_kcore", "q194_hubness", "q228_khop",
    "q239_link_prediction", "q275_assortativity",
    "q277_edge_embeddedness", "q321_label_noise", "q332_mutual_knn",
    "q347_clustering_coef", "q348_modularity", "q365_intrinsic_dim",
    "q418_diameter_sweep", "q419_wl_refinement", "q422_brandes",
    "q428_sampled_betweenness", "q448_assortativity",
    "q458_harmonic_centrality", "q504_bellman_ford",
    "q506_hierarchical_entry", "q523_layered_entry",
    "q526_standing_stack", "q537_boruvka_mst", "q540_ktruss",
    "q553_point_distance")

  /** Serve from the standing IVF AnnStore (QueryHelpers.storedAssigned
    * / storedAnnPath). */
  val annStoreConsumers: Set[String] = Set(
    "q54_ivf_search", "q103_ann_recall", "q115_negative_samples",
    "q141_cluster_quality", "q167_ndcg", "q180_ivfpq_search",
    "q216_clustering_ari", "q306_cell_balance", "q307_probe_cost_curve",
    "q309_cell_distortion", "q312_filtered_ann", "q348_modularity",
    "q353_map_eval", "q354_davies_bouldin", "q463_semantic_divergence",
    "q506_hierarchical_entry", "q523_layered_entry",
    "q526_standing_stack")

  /** Serve from the standing lexical IndexStore (QueryHelpers.storedBm25
    * / storedIndexPath / storedIndexTerms). */
  val indexStoreConsumers: Set[String] = Set(
    "q109_hybrid_rrf", "q227_prf_expansion", "q231_rank_stability",
    "q256_ltr_features", "q276_term_burstiness",
    "q290_prefix_completions", "q314_rbo", "q319_linear_rerank",
    "q324_impact_pruned", "q343_prf_expansion", "q425_rbo",
    "q526_standing_stack")

  /** Keep inline builds BY DESIGN — each gates the build / assignment /
    * store / merge machinery itself (the r8 verdict's line-ownership
    * audit, now enforced instead of prose). */
  val machineryGates: Set[String] = Set(
    "q35_ivf_assign",     // the assignment operator's own gate
    "q101_knn_graph",     // kNN graph construction gate
    "q104_index_store",   // IndexStore write/scan gate
    "q106_index_bm25",    // bm25FromIndex vs scan-built bm25 gate
    "q119_nn_descent",    // NN-descent refinement gate
    "q120_ann_store",     // AnnStore write/probe gate
    "q121_index_merge",   // IndexStore incremental-merge gate
    "q129_graph_search",  // in-memory beam-search gate
    "q132_ann_merge",     // AnnStore cell-scoped merge gate
    "q378_graph_store",   // GraphStore write/probe gate
    "q382_graph_merge",   // GraphStore incremental-merge gate
    "q556_graph_merge_scoped", // GraphStore cell-scoped merge gate
    "q558_graph_merge_recall", // merged-vs-rebuilt recall gate
    "q562_knn_graph_scaled",   // kNN graph gate, corpus-scaled codebook
    "q97_inverted_index") // inverted-index construction gate
}

