package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators._
import graft.pipeline.Embedder

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (see COVERAGE.md for the full matrix), each with a
  * DuckDB-equivalent `oracleSql`: every query here is SQL-expressible by
  * construction, including the hash/LSH/sketch pipelines, which use
  * rolling-polynomial and xorshift-multiply hashes with seeded constants
  * embedded as literals precisely so the oracle can replay the identical
  * arithmetic (see NOTES.md "oracle-expressible hash architecture").
  * Column names/types are aligned pairwise; doubles that depend on
  * accumulation order are computed in exact decimal arithmetic and cast
  * back, so both engines produce bit-identical values.
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Per-JVM token for the store-writing queries' scratch directories:
    * repeat runs inside one process reuse (and overwrite) the same dirs,
    * while two processes on the same host can never race each other's
    * half-swapped buckets. */
  private lazy val tmpToken: String =
    java.util.UUID.randomUUID().toString.take(8)

  /** The driver's events.parquet has carried `ts` as TIMESTAMP(NANOS) in
    * some rounds and TIMESTAMP(MICROS) in others — handle both. Nanos:
    * Spark's vectorized reader rejects them, so read as long (legacy conf)
    * and truncate to µs — exactly what the oracle's CAST(ts AS TIMESTAMP)
    * does on the DuckDB side. Micros: take the column as read, cast to the
    * session-zone timestamp type so downstream comparisons against
    * `lit(...).cast("timestamp")` literals keep one type (UTC session →
    * identical instants either way). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Order-independent exact sum of a double expression: accumulate as
    * decimal (exact, commutative), return double. The DuckDB oracle does the
    * identical cast chain. */
  private def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(24,$scale)")).cast("double")
  private def dsumSql(e: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($e AS DECIMAL(24,$scale))) AS DOUBLE)"

  /** Flagship query on sf=0.001: full ingest → chunk → dedup → embed →
    * store → retrieve pipeline; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    embedSearch(spark, "/root/testdata/sf0.001")

  /** End-to-end RAG slice (SURVEY.md §7.1 step 5): documents → chunk →
    * dedup → stub-embed → parquet store (staged write + catalog) → top-8
    * cosine retrieval with normalized scores. */
  private def embedSearch(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val chunks = Chunker.chunkWithIds(tbl(s, dir, "documents"), "doc_id", "text", 200, 50)
      .select(col("chunk_id").as("id"), col("chunk").as("text"),
        map(lit("source"), col("source"), lit("start_index"),
          col("start_index").cast("string")).as("metadata"))
    val deduped = Dedup.exactDedup(chunks, "text", "id")
    val embedded = Embedder.embed(deduped, "text", Embedder.stubEmbed(dim))
    val root = sys.props("java.io.tmpdir") + "/graft-stores"
    val name = store.VectorStore.storeName("DOCS", "stub", "hash64", 200, 50, "COSINE", "HNSW")
    store.VectorStore.write(embedded, root, name,
      s"""{"alias": "DOCS", "embedding_model": {"provider": "stub", "id": "hash64"},
         | "chunk_size": 200, "chunk_overlap": 50, "distance_strategy": "COSINE",
         | "index_type": "HNSW"}""".stripMargin)
    val stored = store.VectorStore.read(s, root, name)
    val qv = Embedder.stubEmbed(dim)(Seq("spark join stream merge")).head.toSeq
    Similarity.topK(stored, "embedding", qv, 8, "COSINE", "id")
      .select(col("id"), col("text"), round(col("score"), 6).as("score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Aggregations (SURVEY §2.4) -------------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity"), 4).as("sum_qty"),
          dsum(col("l_extendedprice"), 4).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .as("sum_charge"),
          (dsum(col("l_quantity"), 4) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice"), 4) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q09_orders_per_month" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 4).as("total"),
          (dsum(col("o_totalprice"), 4) / count(lit(1))).as("avg_price"))
        .orderBy("month")
    }),

    "q15_file_rollup" -> ((s, dir) => {
      // A1/A2 per-file metadata rollup (reference vector_store.py:379-396)
      tbl(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), max("n_chars").as("max_chars"),
          min("doc_id").as("first_doc"),
          sum("n_chars").as("total_chars"))
        .orderBy("source")
    }),

    "q44_file_stats" -> ((s, dir) => {
      // A2 file statistics with orphan accounting (vector_store.py:447-531):
      // legacy chunks with no filename roll into an __orphan__ row
      val store = tbl(s, dir, "documents").select(
        when(col("doc_id") % 10 === 0, lit(null).cast("string"))
          .otherwise(col("source")).as("filename"),
        col("n_chars"), col("doc_id"))
      store.groupBy(coalesce(col("filename"), lit("__orphan__")).as("filename"))
        .agg(count(lit(1)).as("n_chunks"), max("n_chars").as("max_chars"),
          min("doc_id").as("first_doc"))
        .orderBy("filename")
    }),

    "q45_rollup" -> ((s, dir) => {
      // multi-level aggregation (beyond the reference — it has no grouping
      // sets); subtotal levels labeled via coalesce so null-ordering
      // differences between engines never matter
      tbl(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 4).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    }),

    "q34_distinct_counts" -> ((s, dir) => {
      tbl(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // ---- Joins (SURVEY §2.3) --------------------------------------------
    "q02_trade_volume" -> ((s, dir) => {
      // TPC-H Q7 shape: revenue between customer-nation and supplier-nation
      // pairs. nation is broadcast twice (25 rows); the fact-side joins
      // shuffle on their keys. supplier (100·sf rows) auto-broadcasts
      // under AQE.
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val custNation = tbl(s, dir, "customer")
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val suppNation = tbl(s, dir, "supplier")
        .join(broadcast(tbl(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(custNation, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .filter(col("cust_nation") =!= col("supp_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), col("supp_nation"), col("cust_nation"))
        .limit(20)
    }),

    "q49_cube" -> ((s, dir) => {
      // full CUBE over (returnflag, linestatus) — grouping-set breadth
      // beyond the reference (it has no grouping sets at all)
      tbl(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 4).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    }),

    "q50_pivot" -> ((s, dir) => {
      // pivot with an explicit value list (deterministic output schema);
      // the oracle is the equivalent conditional aggregation
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity"), 4))
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0.0)).as("f_qty"),
          coalesce(col("O"), lit(0.0)).as("o_qty"))
        .orderBy("l_returnflag")
    }),

    "q51_moving_avg" -> ((s, dir) => {
      // rows-frame window: per-customer moving average over the last 3
      // orders by date (decimal sum / count, divided as doubles for parity)
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
      tbl(s, dir, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(col("o_totalprice").cast("decimal(24,4)")).over(w).cast("double")
            / count(lit(1)).over(w)).as("mov_avg3"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q52_below_avg_bigticket" -> ((s, dir) => {
      // TPC-H Q17 shape: per-part average joined back against the facts —
      // the aggregate side reduces to part-cardinality before the join
      val perPart = tbl(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("p_key"))
        .agg((dsum(col("l_quantity"), 4) / count(lit(1))).as("avg_qty"))
      tbl(s, dir, "lineitem")
        .join(perPart, col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < lit(0.9) * col("avg_qty"))
        .agg(dsum(col("l_extendedprice"), 4).as("below_avg_revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q60_promo_revenue" -> ((s, dir) => {
      // TPC-H Q14 shape: conditional-aggregate ratio over a fact⋈dim join
      // (part auto-broadcasts under AQE at bench scale)
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val promoRev = when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0))
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * dsum(promoRev) / dsum(rev)).as("promo_pct"),
          count(lit(1)).as("n_items"))
    }),

    "q61_shipmode_priority" -> ((s, dir) => {
      // TPC-H Q12 shape: join + per-group conditional counts
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    "q88_returned_custs" -> ((s, dir) => {
      // TPC-H Q10 shape: returned-items revenue per customer over a
      // half-year — facts shuffle on their join keys, nation broadcasts,
      // and the top-20 plans as TakeOrderedAndProject (no global sort)
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      tbl(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(tbl(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(tbl(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    }),

    "q89_order_count_dist" -> ((s, dir) => {
      // TPC-H Q13 shape: left outer join + double aggregation — order
      // count per customer INCLUDING zero-order customers, then the
      // distribution of those counts (second agg input is customer-
      // cardinality, so the second shuffle is tiny)
      tbl(s, dir, "customer")
        .join(tbl(s, dir, "orders").filter(col("o_orderstatus") =!= "F"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    "q90_big_orders" -> ((s, dir) => {
      // TPC-H Q18 shape: orders whose total quantity clears a threshold —
      // the HAVING side reduces lineitem to order cardinality BEFORE any
      // join, so the join input is the few qualifying orders, not the facts
      val big = tbl(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("b_orderkey"))
        .agg(dsum(col("l_quantity"), 4).as("sum_qty"))
        .filter(col("sum_qty") > 350)
      tbl(s, dir, "orders")
        .join(big, col("o_orderkey") === col("b_orderkey"))
        .join(tbl(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
    }),

    "q91_brand_disjunction" -> ((s, dir) => {
      // TPC-H Q19 shape: OR-of-ANDs predicate mixing fact and dim columns —
      // nothing prunes the scan, but the whole disjunction stays inside
      // one whole-stage-codegen'd filter after the join
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 21)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 20) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 25) &&
            col("l_quantity").between(20, 40)))
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_items"))
    }),

    "q92_national_share" -> ((s, dir) => {
      // TPC-H Q8 shape: one supplier-nation's share of a customer-region's
      // revenue by order year — two broadcast dim pipelines (nation×2,
      // region, supplier) around one fact shuffle
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val asiaCust = tbl(s, dir, "customer")
        .join(broadcast(tbl(s, dir, "nation")
            .join(tbl(s, dir, "region").filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val suppNation = tbl(s, dir, "supplier")
        .join(broadcast(tbl(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      // reduce orders to ASIA customers BEFORE touching the facts: the
      // dim-filtered orders side is ~region-share of orders, so the
      // fact join's build side shrinks 5× (broadcastable far longer)
      val ordersAsia = tbl(s, dir, "orders")
        .join(asiaCust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
      tbl(s, dir, "lineitem")
        .join(ordersAsia, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0.0)))
            / dsum(rev)).as("mkt_share"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    }),

    "q93_top_supplier" -> ((s, dir) => {
      // TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
      // revenue — the scalar max is an aggregate of the already-reduced
      // per-supplier frame, broadcast back (no second scan of the facts)
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val perSupp = tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(dsum(rev).as("total_revenue"))
      perSupp
        .crossJoin(broadcast(perSupp.agg(max("total_revenue").as("_mx"))))
        .filter(col("total_revenue") === col("_mx"))
        .join(tbl(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    "q94_rich_idle_custs" -> ((s, dir) => {
      // TPC-H Q22 shape: above-average-balance customers with no recent
      // orders — scalar-avg subquery broadcast as a 1-row frame, anti-join
      // against recent orders, per-nation rollup
      val cust = tbl(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(24,6)")).cast("double")
          / count(lit(1))).as("_avg"))
      val recent = tbl(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("_avg"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_custs"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy("nation")
    }),

    "q53_percentiles" -> ((s, dir) => {
      // exact interpolated percentiles (sort-based; round(6) absorbs the
      // engines' different interpolation association)
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("median_price"),
          round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    "q03_revenue_by_nation" -> ((s, dir) => {
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(tbl(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("nation")
    }),

    "q04_order_priority" -> ((s, dir) => {
      // EXISTS semi-join (reference J7-shape)
      val li = tbl(s, dir, "lineitem").filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey").distinct()
      tbl(s, dir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    "q64_salted_join" -> ((s, dir) => {
      // salted equi-join under the oracle gate: the salt fans a hot key
      // over `salt` reducers but MUST NOT change the result — the oracle
      // is the plain join
      val li = tbl(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      val ords = tbl(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      Joins.saltedJoin(li, ords, "o_orderkey", salt = 8)
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    "q05_customers_no_orders" -> ((s, dir) => {
      // insert-if-absent anti-join shape (reference J1, vector_store.py:250-257)
      val recent = tbl(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      tbl(s, dir, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    }),

    "q10_brand_stats" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_quantity"), 4).as("sum_qty"),
          (dsum(col("l_extendedprice"), 4) / count(lit(1))).as("avg_price"))
        .orderBy("p_brand")
    }),

    "q43_revenue_by_region" -> ((s, dir) => {
      // 5-table chain exercising every dimension incl. region; dims broadcast
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(tbl(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .groupBy(col("r_name").as("region"))
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n_items"),
          countDistinct(col("c_custkey")).as("n_customers"))
        .orderBy("region")
    }),

    // ---- Filters / projections / row transforms (SURVEY §2.2) -----------
    "q06_revenue_filter" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q11_chunk_documents" -> ((s, dir) => {
      // P1 fixed-window splitter + P2 id enrichment
      Chunker.chunkWithIds(tbl(s, dir, "documents"), "doc_id", "text", 200, 50)
        .select(col("doc_id"), col("chunk_index"), col("start_index"),
          col("chunk_id"), col("chunk"))
        .orderBy("doc_id", "chunk_index")
    }),

    "q65_stratified_sample" -> ((s, dir) => {
      // deterministic hash-bucket sampling + train/eval split: stable
      // across runs, partitionings, and engines — unlike rand()-based
      // sampleBy (reproducibility is the point for training corpora)
      val d = tbl(s, dir, "documents")
      Sampling.trainTestSplit(
          Sampling.stratifiedSample(d, "doc_id", "lang", Map("en" -> 50), 10),
          "doc_id", 80)
        .select(col("doc_id"), col("lang"), col("split"))
        .orderBy("doc_id")
    }),

    "q67_bloom_filter" -> ((s, dir) => {
      // Bloom build+probe (the runtime join-pruning shape): bits built
      // over big-quantity orderkeys, probed by all orders; flagged ⊇ build
      // with a bounded false-positive overshoot
      val m = 131072; val k = 3
      // build is read three times (bit packing, FP anti-join, n_build) —
      // cache the ~|build| keys instead of rescanning lineitem each time
      val build = tbl(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_orderkey").as("key")).distinct().cache()
      val words = Sketches.packBits(Sketches.bloomBits(build, "key", m, k), m)
      val probe = tbl(s, dir, "orders").select(col("o_orderkey").as("key"))
      val flagged = Sketches.bloomProbePacked(probe, "key", words, m, k)
      // one pass over flagged for both counts (the left join marks build
      // membership; build is small enough that Catalyst broadcasts it)
      val stats = flagged.join(build.withColumn("_inb", lit(1)), Seq("key"), "left")
        .agg(count(lit(1)).as("n_flagged"),
          coalesce(sum(when(col("_inb").isNull, 1L).otherwise(0L)), lit(0L)).as("n_false_pos"))
      build.agg(count(lit(1)).as("n_build")).crossJoin(stats)
    }),

    "q74_cms_heavy_hitters" -> ((s, dir) => {
      // count-min sketch heavy hitters: the 4×1024 counter grid is fixed
      // size regardless of input (map-side partial agg), estimates join the
      // broadcast grid; est ≥ true is the CMS guarantee under the oracle
      val li = tbl(s, dir, "lineitem").select(col("l_partkey").as("key"))
      val counters = Sketches.cmsCounters(li, "key", 4, 1024)
      val top = li.groupBy("key").agg(count(lit(1)).as("true_cnt"))
        .orderBy(desc("true_cnt"), col("key")).limit(10)
      Sketches.cmsEstimate(top, "key", counters, 4, 1024)
        .join(top, "key")
        .select(col("key"), col("true_cnt"), col("cms_est"))
        .orderBy(desc("true_cnt"), col("key"))
    }),

    "q75_hll_distinct" -> ((s, dir) => {
      // order-independent HyperLogLog per group (exact-oracle twin of
      // approx_count_distinct, whose HLL++ merge order is layout-dependent)
      val ev = events(s, dir)
      val est = Sketches.hllDistinctByGroup(ev, "event_type", "user_id", 5)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(est, "event_type").orderBy("event_type")
    }),

    "q66_kmv_distinct" -> ((s, dir) => {
      // KMV distinct sketch: deterministic (value-set function), mergeable,
      // exactly oracle-replayable — vs HLL++ whose estimate depends on
      // partition merge order
      Sketches.kmvDistinct(tbl(s, dir, "lineitem"), "l_partkey", 256)
    }),

    "q12_dedup_first" -> ((s, dir) => {
      // P4 content dedup, first occurrence wins (vector_store.py:112-118)
      Dedup.exactDedup(tbl(s, dir, "documents"), "text", "doc_id")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    }),

    "q13_dedup_keepmax" -> ((s, dir) => {
      // R3 retrieval dedup keep-max (vs_retriever.py:130-151); "content" = lang
      Dedup.dedupKeepMax(tbl(s, dir, "documents"), "lang", "n_chars", "doc_id")
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang")
    }),

    "q16_score_normalize" -> ((s, dir) => {
      // R2 score normalization (vs_retriever.py:267-274)
      val d = (col("vec_id") % 100).cast("double") / 50.0
      tbl(s, dir, "embeddings")
        .select(col("vec_id"), d.as("distance"),
          VF.normalizeScore(d, "COSINE").as("cosine_score"),
          VF.normalizeScore(d, "DOT").as("dot_score"),
          VF.normalizeScore(d, "EUCLIDEAN").as("euclidean_score"))
        .orderBy("vec_id")
    }),

    // ---- Sorts / limits / top-k (SURVEY §2.5) ---------------------------
    "q08_top3_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rk")
    }),

    "q31_topk_global" -> ((s, dir) => {
      // R4 global top-k → TakeOrderedAndProject, no full sort
      tbl(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
    }),

    "q46_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      tbl(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q47_string_funcs" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          upper(col("source")).as("up"),
          lpad(col("lang"), 5, "_").as("padded"),
          reverse(col("source")).as("rev"),
          expr("substring(text, 3, 8)").as("sub"),
          replace(col("source"), lit("src"), lit("origin")).as("repl"),
          levenshtein(col("source"), col("lang")).as("lev"),
          instr(col("text"), "spark").cast("long").as("pos"),
          repeat(col("lang"), 3).as("rep"),
          concat_ws("|", col("source"), col("lang")).as("joined"),
          sha2(col("source"), 256).as("sha"))
        .orderBy("doc_id")),

    "q48_date_funcs" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          (dayofweek(col("o_orderdate")) - 1).as("dow"), // 0=Sunday, both engines
          dayofyear(col("o_orderdate")).as("doy"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("plus30"),
          datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("days_to_2002"))
        .orderBy("o_orderkey")),

    // ---- Set operations (SURVEY §2.6) -----------------------------------
    "q07_distinct_segments" -> ((s, dir) =>
      tbl(s, dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")),

    "q30_union_except" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      d.filter(col("doc_id") % 3 === 0).select("doc_id")
        .union(d.filter(col("doc_id") % 5 === 0).select("doc_id"))
        .distinct()
        .except(d.filter(col("doc_id") % 7 === 0).select("doc_id"))
        .orderBy("doc_id")
    }),

    // ---- Incremental / change detection (SURVEY §2.9) -------------------
    "q14_change_detection" -> ((s, dir) => {
      // J3 etag/mtime classification (oci/bucket.py:152-181); synthesizes
      // current vs processed listings deterministically from `documents`.
      val d = tbl(s, dir, "documents")
      val cur = d.filter(col("doc_id") % 5 =!= 0).select(
        concat(lit("f"), col("doc_id")).as("name"),
        when(col("doc_id") % 7 === 0, md5(concat(col("text"), lit("X"))))
          .otherwise(md5(col("text"))).as("etag"),
        (col("doc_id") % 11).cast("string").as("time_modified"))
      val proc = d.filter(col("doc_id") % 5 =!= 4).select(
        concat(lit("f"), col("doc_id")).as("filename"),
        when(col("doc_id") % 13 === 0, lit(null).cast("string"))
          .otherwise(md5(col("text"))).as("etag"),
        when(col("doc_id") % 13 === 0, lit(null).cast("string"))
          .otherwise((col("doc_id") % 11).cast("string")).as("time_modified"))
      ChangeDetection.detectChanges(cur, proc).orderBy("name")
    }),

    "q27_sessionize" -> ((s, dir) => {
      // gap-based sessionization (batch twin of the streaming operator)
      streaming.EventStreams.sessionizeNative(
          events(s, dir).select("user_id", "ts", "value"), "30 minutes")
        .withColumn("session_start", col("session_start").cast("timestamp_ntz"))
        .withColumn("session_end", col("session_end").cast("timestamp_ntz"))
        .orderBy("user_id", "session_start")
    }),

    "q62_interval_join" -> ((s, dir) => {
      // range join: per click, views by the same user in the preceding 10
      // minutes — equi-key on user_id keeps it a hash/SMJ join with a
      // range residual, not a quadratic theta-join
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts").as("c_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      clicks.join(views,
          clicks("user_id") === views("user_id") &&
            col("v_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES") &&
            col("v_ts") < col("c_ts"),
          "left")
        .groupBy(col("event_id"))
        .agg(count(col("v_ts")).as("n_views"))
        .orderBy("event_id")
    }),

    "q63_asof_join" -> ((s, dir) => {
      // as-of join: each purchase enriched with the latest same-user click
      // at or before it (Joins.asOfJoin: one shuffle, no range explosion)
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      Joins.asOfJoin(purchases, clicks, "user_id", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("asof_ts").cast("timestamp_ntz").as("click_ts"),
          col("asof_value").as("click_value"))
        .orderBy("event_id")
    }),

    "q68_scd_intervals" -> ((s, dir) => {
      // SCD2-style temporal modeling: each event opens a validity interval
      // closed by the user's next event (lead window); open intervals are
      // the current state
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir).filter(col("user_id") < 100)
        .select(col("user_id"), col("event_type"),
          col("ts").cast("timestamp_ntz").as("valid_from"),
          lead(col("ts"), 1).over(w).cast("timestamp_ntz").as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy("user_id", "valid_from")
    }),

    "q69_funnel" -> ((s, dir) => {
      // strict ordered funnel: first view → first click after it → first
      // purchase after that; per-stage reductions stay user-cardinality
      val ev = events(s, dir)
      def stage(tpe: String) = ev.filter(col("event_type") === tpe)
        .select(col("user_id"), col("ts"))
      val v = stage("view").groupBy("user_id").agg(min("ts").as("tv"))
      val c = stage("click").join(v, "user_id").filter(col("ts") > col("tv"))
        .groupBy("user_id").agg(min("ts").as("tc"))
      val p = stage("purchase").join(c, "user_id").filter(col("ts") > col("tc"))
        .groupBy("user_id").agg(min("ts").as("tp"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
    }),

    "q28_tumbling_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    "q42_sliding_window" -> ((s, dir) => {
      streaming.EventStreams.slidingCounts(events(s, dir), "1 hour", "15 minutes")
        .select(col("window_start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // ---- Scalar functions / JSON (SURVEY §2.7) --------------------------
    "q29_json_props" -> ((s, dir) => {
      events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .groupBy("k_val").agg(count(lit(1)).as("n"))
        .orderBy("k_val")
    }),

    // ---- Text analysis (beyond-reference training-data ops) -------------
    "q70_bigram_counts" -> ((s, dir) => {
      // n-gram LM statistics: top-20 token bigrams across the corpus —
      // explode is map-side, the only shuffle is the count aggregation,
      // and top-k plans as TakeOrderedAndProject
      // tokenize ONCE into a column: Catalyst does not CSE interpreted
      // higher-order expressions, so inlining the split into the per-index
      // lambda would re-split the text per bigram (quadratic)
      tbl(s, dir, "documents")
        .select(expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").as("t"))
        .select(explode(expr(
          "case when size(t) < 2 then cast(array() as array<string>) " +
            "else transform(sequence(1, size(t) - 1), " +
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) end")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("bigram"))
        .limit(20)
    }),

    "q71_gopher_quality" -> ((s, dir) =>
      // Gopher-style document quality gate (word-count / mean-word-length /
      // stopword / uniqueness bounds) — single-pass HOF metrics, no shuffle
      TextQuality.gopherMetrics(tbl(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q72_bigram_repetition" -> ((s, dir) =>
      // duplicate/top bigram fractions (Gopher's repetition filters) —
      // ONE (doc, bigram) shuffle with map-side partial aggregation
      TextQuality.bigramRepetition(tbl(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q73_pii_redact" -> ((s, dir) => {
      // regex PII scrub (C4-style): the synthetic corpus carries no PII, so
      // inject deterministic email/IP spans per doc, then count + redact
      val withPii = tbl(s, dir, "documents").withColumn("text2",
        concat(col("text"), lit(" contact doc"), col("doc_id"),
          lit("@example.com from 10.0."), col("doc_id") % 256,
          lit("."), (col("doc_id") * 7) % 256))
      TextQuality.piiRedact(withPii, "text2")
        .select(col("doc_id"), col("n_emails"), col("n_ips"),
          length(col("redacted")).as("redacted_len"),
          expr("right(redacted, 40)").as("redacted_tail"))
        .orderBy("doc_id")
    }),

    "q95_rare_bigrams" -> ((s, dir) =>
      // perplexity-proxy quality gate: per-doc rare-bigram stats against
      // the corpus's own bigram counts (exact-integer CCNet stand-in)
      TextQuality.rareBigramStats(tbl(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q76_zorder_layout" -> ((s, dir) =>
      // Morton-code clustering: bucket lineitem into 64 z-ranges of
      // (partkey, suppkey) and report per-bucket min/max — the footer
      // stats a reader prunes on; narrow ranges in BOTH dims = skipping
      // works for predicates on either column
      DataLayout.zOrderStats(
          tbl(s, dir, "lineitem")
            .select((col("l_partkey") % 1024).as("px"),
              (col("l_suppkey") % 1024).as("sy")),
          "px", "sy", bits = 10, nBuckets = 64)
        .orderBy("bucket")),

    "q77_skew_profile" -> ((s, dir) =>
      // pre-shuffle join-key audit: hottest keys + ratio to the mean key
      // frequency — the decision input for saltedJoin (q64) / AQE skew
      DataLayout.skewProfile(
          tbl(s, dir, "lineitem").select(col("l_partkey")), "l_partkey", 10)),

    "q78_tfidf_top_terms" -> ((s, dir) =>
      // per-doc top-3 TF-IDF terms over a 50-doc slice (exact-ratio IDF)
      TextQuality.tfidfTopTerms(
          tbl(s, dir, "documents").filter(col("doc_id") < 50), "doc_id", "text", 3)
        .orderBy("doc_id", "rank")),

    "q81_record_linkage" -> ((s, dir) => {
      // entity resolution: link each document to its best match in a
      // shifted-window view of the corpus — blocking on (lang, source)
      // keeps candidates quadratic only within tiny blocks
      val d = tbl(s, dir, "documents")
      val blk = concat(col("lang"), lit("|"), col("source"))
      val leftT = d.select(col("doc_id"), blk.as("blk"),
          expr("substring(text, 1, 60)").as("name"))
        .filter(length(col("name")) >= 3)
      val rightT = d.select((col("doc_id") + 1000000).as("doc_id"), blk.as("blk"),
          expr("substring(text, 8, 60)").as("name"))
        .filter(length(col("name")) >= 3)
      Linkage.bestMatch(leftT, "doc_id", rightT, "doc_id", "blk", "name", 0.3)
        .orderBy("l_id")
    }),

    "q82_compaction_plan" -> ((s, dir) =>
      // key-aligned small-file compaction plan over the ship-date order:
      // files cut every 5000 rows but never splitting a date, so planned
      // min/max ranges are disjoint and a date predicate prunes to one
      // file run. The write path is DataLayout.compact (range-partition +
      // rolling maxRecordsPerFile); this is its audit view.
      DataLayout.compactionPlan(
          tbl(s, dir, "lineitem").select(col("l_shipdate")), "l_shipdate", 5000)
        .select(col("file_id"), col("n_keys"), col("n_rows"),
          col("min_key").cast("timestamp_ntz").as("min_key"),
          col("max_key").cast("timestamp_ntz").as("max_key"))
        .orderBy("file_id")),

    "q83_domain_mix" -> ((s, dir) =>
      // resample the corpus to a 40% en / 15%-each other-language mix:
      // the largest mix-consistent total is kept, rows chosen by the
      // deterministic hash-bucket rule (reproducible across engines)
      Sampling.domainMix(
          tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", "lang",
          Map("en" -> 0.4, "de" -> 0.15, "es" -> 0.15,
            "fr" -> 0.15, "zh" -> 0.15))
        .select(col("doc_id"), col("lang"), col("keep_frac"), col("n_domain"))
        .orderBy("doc_id")),

    "q96_domain_cap" -> ((s, dir) =>
      // C4/RefinedWeb-style per-host page cap: at most 20 docs per source,
      // chosen by deterministic scrambled-hash rank (stable under
      // re-partitioning), rank-limit plans as WindowGroupLimit
      Sampling.domainCap(
          tbl(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source", cap = 20)
        .orderBy("doc_id")),

    "q84_contamination" -> ((s, dir) => {
      // benchmark decontamination: 8-gram containment of each "eval" doc
      // (a substring probe set) in every training doc — containment, not
      // Jaccard, so a short benchmark buried in a long page still flags
      val d = tbl(s, dir, "documents")
      val eval = d.filter(col("doc_id") % 250 === 0)
        .select(col("doc_id").as("eval_id"),
          expr("substring(text, 20, 200)").as("etext"))
      Dedup.contaminationCheck(d, "doc_id", "text",
          eval, "eval_id", "etext", n = 8, threshold = 0.4)
        .orderBy("train_id", "eval_id")
    }),

    "q87_dup_spans" -> ((s, dir) => {
      // exact duplicated-span extraction (token 8-grams) over the near-dup
      // corpus — the substring-level step after pair/cluster detection:
      // WHICH ranges of a document are copies, not just which documents
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      Dedup.dupSpans(corpus, "doc_id", "text", n = 8)
        .orderBy("doc_id", "span_start")
    }),

    "q85_pack_plan" -> ((s, dir) =>
      // sequence-packing assignment: concatenate docs per lang shard in
      // doc_id order into 2000-token training windows; spans_boundary
      // marks docs crossing a window seam
      Chunker.packSequences(
          tbl(s, dir, "documents")
            .select(col("doc_id"), col("lang"),
              TF.tokenCount(col("text")).as("tokens"))
            .filter(col("tokens") > 0),
          "lang", "doc_id", "tokens", 2000)
        .select(col("doc_id"), col("lang"), col("tokens"),
          col("pack_id"), col("spans_boundary"))
        .orderBy("doc_id")),

    "q86_temperature_mix" -> ((s, dir) =>
      // α=0.5 temperature rebalancing (mT5 recipe): thin head languages
      // toward √count shares; the rarest language keeps everything
      Sampling.temperatureMix(
          tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", "lang")
        .select(col("doc_id"), col("lang"), col("keep_frac"), col("n_domain"))
        .orderBy("doc_id")),

    // ---- Lexical retrieval (beyond ref; pairs with the vector surface) --
    "q97_inverted_index" -> ((s, dir) =>
      // index build: (term, doc) partial-count → one per-TERM aggregate;
      // posting lists emerge sorted by doc id. The output reduces each
      // list to content/order checksums so the oracle compares scalars
      // (the array itself is pinned by RetrievalSpec)
      Retrieval.invertedIndex(tbl(s, dir, "documents"), "doc_id", "text")
        .select(col("term"), col("df"), col("cf"),
          element_at(col("postings"), 1).getField("id").as("first_id"),
          element_at(col("postings"), -1).getField("id").as("last_id"),
          expr("aggregate(postings, 0L, (a, p) -> a + p.id * p.tf)")
            .as("dot_check"),
          expr("aggregate(zip_with(postings, sequence(1, size(postings)), " +
            "(p, i) -> p.id * i), 0L, (a, x) -> a + x)").as("ord_check"))
        .orderBy("term")),

    "q98_bm25" -> ((s, dir) =>
      // BM25 ranking for a 4-term query: the token explode is filtered to
      // the query's terms BEFORE the shuffle, corpus stats ride along
      // broadcast, top-k plans as TakeOrderedAndProject
      Retrieval.bm25(tbl(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "join", "vector", "window"), 20)),

    "q99_c4_lines" -> ((s, dir) => {
      // C4-style line-level filter over 12-token pseudo-lines (the corpus
      // has no newlines): keep lines with ≥5 words, no blocklisted word,
      // first occurrence within the doc; doc kept iff ≥2 lines survive.
      // Pure map-side HOF logic — zero shuffle
      val d = tbl(s, dir, "documents")
        .withColumn("_toks", TextQuality.tokens(col("text")))
        .withColumn("lines", TextQuality.tokenLines("_toks", 12))
      TextQuality.c4LineFilter(d, "lines", minWords = 5,
          blocklist = Seq("slow"), minLines = 2)
        .select(col("doc_id"), col("n_lines"), col("n_kept"), col("kept"),
          length(col("kept_text")).as("kept_len"))
        .orderBy("doc_id")
    }),

    "q100_classifier" -> ((s, dir) =>
      // hashed-bigram linear quality classifier (fastText-shaped scoring
      // against a deterministic weight function): map-side feature hash →
      // weight fold → mean margin; no shuffle at any scale
      TextQuality.classifierScore(tbl(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "n_feats", "raw_margin", "margin", "label")
        .orderBy("doc_id")),

    "q106_index_bm25" -> ((s, dir) => {
      // BM25 served FROM the persisted bucketed index (q104's store):
      // posting lookup partition-prunes to |terms| buckets, the matched
      // postings broadcast into the doc-length join — the corpus-sized
      // side never shuffles. Arithmetic-identical to q98 (same oracle)
      val d = tbl(s, dir, "documents")
      val idx = Retrieval.invertedIndex(d, "doc_id", "text")
      val root = sys.props("java.io.tmpdir") + s"/graft-index-store-bm25-$tmpToken"
      store.IndexStore.write(idx, root, nBuckets = 8)
      val dl = d.select(col("doc_id").cast("long").as("id"),
        size(Retrieval.analyze(col("text"))).cast("long").as("dl"))
      Retrieval.bm25FromIndex(s, root, 8, dl,
        Seq("spark", "join", "vector", "window"), 20)
    }),

    "q117_training_export" -> ((s, dir) => {
      // the capstone data-prep DAG in one query: Gopher quality gate →
      // hashed-bigram classifier gate → exact dedup (keep-first) →
      // per-source cap → per-lang sequence packing. Every stage is an
      // operator already proven under its own oracle; the composite
      // replays as one chained-CTE oracle. Map-side gates run before any
      // shuffle; the dedup/cap/pack shuffles operate on the SHRUNK corpus
      val d = tbl(s, dir, "documents")
      val gids = TextQuality.gopherMetrics(d, "doc_id", "text")
        .filter(col("quality_pass")).select("doc_id")
      val gated = d.join(gids, "doc_id")
        .select("doc_id", "text", "lang", "source")
      val classified = TextQuality.classifierScore(gated, "doc_id", "text")
        .filter(col("label"))
        .select("doc_id", "text", "lang", "source")
      val deduped = Dedup.exactDedup(classified, "text", "doc_id")
      val capped = Sampling.domainCap(deduped, "doc_id", "source", cap = 20)
      val withTokens = capped
        .withColumn("tokens", size(TextQuality.tokens(col("text"))))
        .filter(col("tokens") > 0)
        .select("doc_id", "lang", "source", "tokens")
      Chunker.packSequences(withTokens, "lang", "doc_id", "tokens", 2000)
        .select("doc_id", "lang", "source", "tokens", "pack_id", "spans_boundary")
        .orderBy("doc_id")
    }),

    "q116_epoch_mix" -> ((s, dir) =>
      // epoch-weighted mixing (Llama-style): en runs 2.5 epochs (2 copies
      // + hash-coin third), fr thins to 0.5, others 1 — duplication and
      // thinning in one map-side operator, rows never shuffle
      Sampling.epochMix(
          tbl(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id", "lang", Map("en" -> 2.5, "de" -> 1.0, "fr" -> 0.5))
        .orderBy("doc_id", "epoch")),

    "q115_negative_samples" -> ((s, dir) => {
      // contrastive-training negatives: per anchor, the k smallest
      // scrambled pair hashes outside the anchor's IVF cell — pure
      // function of the ids, so pairs are reproducible across reruns,
      // repartitions, and cluster sizes
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("centroid_id"))
      val anchors = assigned.filter(col("vec_id") < 5)
      Sampling.negativeSamples(assigned, "vec_id", "centroid_id",
          anchors, "vec_id", "centroid_id", k = 4)
        .orderBy("anchor_id", "rank")
    }),

    "q114_url_canonical" -> ((s, dir) => {
      // crawl-tier URL dedup: five cosmetic variants per URL group (case,
      // default port, fragment, tracking params, param order) collapse to
      // two canonical keys — the cheapest dedup tier, BEFORE any content
      // hashing; one groupBy on the canonical string
      val d = tbl(s, dir, "documents")
      val g = expr("cast(doc_id div 5 as string)")
      val p = expr("cast((doc_id div 5) % 7 as string)")
      val url = when(col("doc_id") % 5 === 0,
          concat(lit("https://SITE"), g, lit(".example.com/path"), p))
        .when(col("doc_id") % 5 === 1,
          concat(lit("https://site"), g, lit(".example.com:443/path"), p,
            lit("?utm_source=x")))
        .when(col("doc_id") % 5 === 2,
          concat(lit("https://site"), g, lit(".example.com/path"), p, lit("#frag")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("https://site"), g, lit(".example.com/path"), p, lit("?b=2&a=1")))
        .otherwise(
          concat(lit("https://site"), g, lit(".example.com/path"), p,
            lit("?a=1&b=2&utm_campaign=z")))
      d.select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), Governance.canonicalizeUrl(col("url")).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_variants"), min("doc_id").as("min_doc"))
        .orderBy("canonical_url")
    }),

    "q113_phash_neardup" -> ((s, dir) => {
      // perceptual-hash near-dup over (stub-)decoded binary assets: aHash
      // bits from the decoded pixel array, then the same 4×16-bit band
      // blocking + Hamming verify as SimHash — one pipeline for text and
      // image fingerprints. Twins perturb ONE leading byte, so they land
      // within Hamming ≤ 3 of their original
      // ASCII-only gate, mirrored in the oracle: the stub hashes UTF-8
      // BYTES while the oracle replays per-character CODE POINTS — equal
      // only for ASCII, so non-ASCII docs are excluded by construction on
      // both sides rather than trusting the corpus generator
      val d = tbl(s, dir, "documents")
        .filter(!col("text").rlike("[^\\x00-\\x7F]"))
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("concat('X', substring(text, 2))")))
      val bin = corpus.select(col("doc_id"),
        col("text").cast("binary").as("content_bin"))
      // one tight per-row loop (decode → mean → bit vote); the declarative
      // featureMean/aHash64 twin is bit-identical (DedupSpec) but pays
      // ~128 interpreted lambda evals per row
      val hashed = Multimodal.perceptualHashes(bin, "doc_id", "content_bin", 64)
      Dedup.hammingPairs64(hashed, "doc_id", "ph", maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    "q112_incremental_dedup" -> ((s, dir) => {
      // incremental ingest dedup: the corpus's LSH band signatures are the
      // STORED table (hashed once, ever); a 50-doc new batch is hashed,
      // broadcast, and probed against matching band buckets — corpus
      // growth costs O(batch) per ingest, not O(corpus)
      val d = tbl(s, dir, "documents")
      val stored = Dedup.bandSignatures(
        d.select(col("doc_id"), col("text")), "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8)
      val newBatch = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          expr("substring(text, 1, greatest(length(text) - 7, 1))").as("text"))
      val newSigs = Dedup.bandSignatures(newBatch, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8)
      Dedup.incrementalDedupProbe(stored, newSigs, 64, threshold = 0.8)
        .orderBy("new_id", "stored_id")
    }),

    "q109_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: BM25 lexical ranks fused with dense cosine ranks
      // by Reciprocal Rank Fusion — rank-based, so the incompatible score
      // scales never matter; both lists are top-k-bounded, so the fuse is
      // trivially cheap no matter the corpus
      val lex = Retrieval.bm25(tbl(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "join", "vector", "window"), 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("id").asc)))
      val e = tbl(s, dir, "embeddings")
      val dense = Similarity.topKBatch(e, "embedding", "vec_id",
          e.filter(col("vec_id") === 0).select(col("vec_id").as("qid"),
            col("embedding").as("qv")), "qv", "qid", 20)
        .select(col("vec_id").as("id"), col("rank"))
      Retrieval.rrfFuse(Seq(lex.select(col("id"), col("rank")), dense), "id", 10)
    }),

    "q110_window_anomaly" -> ((s, dir) =>
      // per-type z-score anomalies from order-independent decimal sums
      // (Spark's stddev aggregates in partition order — not replayable);
      // one broadcast of per-group stats + a map-side filter
      Stats.zscoreAnomalies(
          events(s, dir).select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value", sigmas = 2.0)
        .orderBy("event_id")),

    "q111_group_corr" -> ((s, dir) =>
      // grouped Pearson correlation from the six order-independent sums —
      // one hash aggregate with map-side partials; sqrt is IEEE-exact so
      // the oracle replays the value bit-for-bit
      Stats.groupCorrelation(tbl(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    "q107_retention" -> ((s, dir) =>
      // weekly retention cohorts: first-seen week per user, then the
      // (cohort, week) engagement matrix — one user-keyed shuffle, one
      // (cohort, week) shuffle, cohort sizes broadcast
      streaming.EventStreams.retentionCohorts(events(s, dir))),

    "q108_hist_quantiles" -> ((s, dir) => {
      // mergeable numeric-profiling sketch: fixed 50-bin histogram of
      // l_quantity (O(nBuckets) state, layout-independent unlike
      // percentile_approx), then interpolated p50/p90/p99
      val hist = Sketches.histogramCounts(
        tbl(s, dir, "lineitem"), "l_quantity", 0.0, 50.0, 50)
      Sketches.histogramQuantiles(hist, 0.0, 50.0, 50, Seq(0.5, 0.9, 0.99))
    }),

    "q105_cms_merge" -> ((s, dir) => {
      // shard-mergeable count-min: per-shard 4×1024 grids (what each
      // ingest partition persists), summed into one grid — cells are
      // linear, so the merged grid is bit-identical to the single-pass
      // one (spec-pinned); heavy-hitter estimates read the merged grid
      val li = tbl(s, dir, "lineitem")
        .select(col("l_partkey").as("key"),
          (col("l_orderkey") % 4).cast("int").as("shard"))
      val merged = Sketches.cmsMerge(
        Sketches.cmsCountersSharded(li, Seq("shard"), "key", 4, 1024))
      val top = li.groupBy("key").agg(count(lit(1)).as("true_cnt"))
        .orderBy(desc("true_cnt"), col("key")).limit(10)
      Sketches.cmsEstimate(top, "key", merged, 4, 1024)
        .join(top, "key")
        .select(col("key"), col("true_cnt"), col("cms_est"))
        .orderBy(desc("true_cnt"), col("key"))
    }),

    "q118_hourly_hll" -> ((s, dir) => {
      // sketch-over-time: distinct users per hour via the same mergeable
      // HLL as q75/q102, with the exact count alongside — the dashboard
      // query a stream materializes from persisted hourly registers
      // instead of rescanning raw events
      val ev = events(s, dir)
        .withColumn("hr", date_trunc("hour", col("ts")).cast("timestamp_ntz"))
        .select(col("hr"), col("user_id"))
      val est = Sketches.hllDistinctByGroup(ev, "hr", "user_id")
      val exact = ev.groupBy("hr").agg(countDistinct("user_id").as("n_exact"))
      est.join(exact, "hr").orderBy("hr")
    }),

    "q102_hll_merge" -> ((s, dir) => {
      // shard-mergeable HLL: per-(shard, group) register tables — what a
      // 1000-executor pipeline PERSISTS per partition — then a max-merge
      // and finish that never rescans the raw keys. Register max is
      // associative/commutative, so any merge tree gives the identical
      // estimate (spec-pinned against the direct single-pass sketch)
      val ev = events(s, dir)
        .withColumn("shard", (col("event_id") % 4).cast("int"))
      val regs = Sketches.hllRegisters(ev, Seq("shard", "event_type"), "user_id")
      Sketches.hllMergeEstimate(regs, "event_type")
        .orderBy("event_type")
    }),

    "q103_ann_recall" -> ((s, dir) => {
      // ANN quality gate: recall@3 of the declarative batch IVF probe
      // (nProbe=2 of 8 cells, probe set broadcast — the corpus never
      // shuffles) against the exact top-3 — the measurement that decides
      // whether an IVF config is safe to trust at full scale
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val approx = Similarity.ivfSearchBatch(assigned, "embedding", "vec_id",
        centroids, "cid", "cv", queries, "qv", "qid", 3, 2)
      val exact = Similarity.topKBatch(e, "embedding", "vec_id",
        queries, "qv", "qid", 3)
      Similarity.recallAtK(approx, exact, "query_id", "vec_id", 3)
        .orderBy("query_id")
    }),

    "q104_index_store" -> ((s, dir) => {
      // persisted inverted index, bucketed by term hash: a term lookup is
      // a partition-pruned scan of |terms| bucket directories, not the
      // full index (IndexStoreSpec pins the PartitionFilters)
      val idx = Retrieval.invertedIndex(tbl(s, dir, "documents"), "doc_id", "text")
      val root = sys.props("java.io.tmpdir") + s"/graft-index-store-$tmpToken"
      store.IndexStore.write(idx, root, nBuckets = 8)
      store.IndexStore.lookup(s, root, Seq("spark", "join", "vector"), 8)
        .select(col("term"), col("df"), col("cf"),
          expr("aggregate(postings, 0L, (a, p) -> a + p.id * p.tf)")
            .as("dot_check"))
        .orderBy("term")
    }),

    // ---- Governance (SURVEY §2.10) --------------------------------------
    "q79_governed_view" -> ((s, dir) => {
      // row policy (semi-join against an allowlist) + column masking +
      // numeric generalization — a governed view that still prunes at scan
      val policy = tbl(s, dir, "nation").filter(col("n_regionkey") === 1)
        .select(col("n_nationkey"))
      Governance.applyRowPolicy(tbl(s, dir, "customer"), "c_nationkey",
          policy, "n_nationkey")
        .select(col("c_custkey"),
          Governance.maskTail(col("c_name"), 9).as("name_masked"),
          Governance.generalize(col("c_acctbal"), 100.0).as("bal_band"),
          col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    "q80_url_safety" -> ((s, dir) => {
      // SSRF URL guard (the webscrape front-gate): synthesize a URL column
      // with unsafe schemes/hosts mixed in, then classify
      val d = tbl(s, dir, "documents")
      val url = when(col("doc_id") % 7 === 0,
          concat(lit("http://10."), col("doc_id") % 256, lit(".0.1/x")))
        .when(col("doc_id") % 11 === 0, lit("file:///etc/passwd"))
        .when(col("doc_id") % 13 === 0, lit("http://localhost/admin"))
        .when(col("doc_id") % 5 === 0,
          concat(lit("http://192.168.1."), col("doc_id") % 256, lit("/p")))
        .otherwise(concat(lit("https://"), col("source"),
          lit(".example.com/doc/"), col("doc_id")))
      d.select(col("doc_id"), url.as("url"))
        .withColumn("is_safe", Governance.urlIsSafe(col("url")))
        .orderBy("doc_id")
    }),

    "q23_token_stats" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      d.select(col("doc_id"),
          TF.tokenCount(col("text")).as("tokens"),
          TF.approxSubwordCount(col("text")).as("subwords"),
          TF.punctRatio(col("text")).as("punct_ratio"),
          TF.digitRatio(col("text")).as("digit_ratio"),
          TF.stopwordRatio(col("text")).as("stopword_ratio"))
        .orderBy("doc_id")
    }),

    "q24_lang_id" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TF.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "q25_quality_score" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TF.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "q26_fingerprint" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), TF.fingerprint("text").as("fp"))
        .orderBy("doc_id")),

    // ---- Deduplication family (beyond-reference) ------------------------
    "q20_minhash_pairs" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      Dedup.minhashLshPairs(corpus, "doc_id", "text",
          shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
        .orderBy("doc_a", "doc_b")
    }),

    "q56_dedup_clusters" -> ((s, dir) => {
      // cluster-level dedup: LSH pairs → connected components → min-id rep
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      Dedup.dedupClusters(pairs, "doc_a", "doc_b", edgePartitions = 8)
        .select(col("id").as("doc_id"), col("cluster_rep"))
        .orderBy("doc_id")
    }),

    "q21_simhash_pairs" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    "q22_ngram_jaccard" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id") < 50)
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 5, threshold = 0.6)
        .orderBy("doc_a", "doc_b")
    }),

    "q36_embedding_neardup" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      Dedup.embeddingNearDupPairs(e, "vec_id", "embedding",
          Similarity.hyperplaneBucket("embedding", 64, 4), 0.25)
        .select(col("doc_a"), col("doc_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("doc_a", "doc_b")
    }),

    // ---- Similarity search (J6/R1-R5) -----------------------------------
    "q17_cosine_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.topK(e, "embedding", qv, 8, "COSINE", "vec_id")
        .select(col("vec_id"), col("label"), round(col("distance"), 6).as("distance"))
    }),

    "q18_knn_batch" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.topKBatch(e, "embedding", "vec_id", queries, "qv", "qid", 3)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("distance"), 6).as("distance"))
        .orderBy("query_id", "rank")
    }),

    "q19_mmr" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val picked = Similarity.mmr(e, "embedding", "vec_id", qv, 5, 20, 0.5)
      s.createDataFrame(picked.zipWithIndex.map { case ((id, sc), i) =>
        (i + 1, id, BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }).toDF("rank", "vec_id", "mmr_score")
    }),

    // ---- Flagship RAG pipeline (oracle replays the whole chunk→embed→
    // search chain; the store write is a side effect)
    "q32_embed_search" -> ((s, dir) => embedSearch(s, dir)),

    "q57_quantize_embeddings" -> ((s, dir) => {
      // symmetric int8 quantization of the embedding column — the 4×
      // storage cut for a 100 TB vector store, with per-row reconstruction
      // error as the quality gate
      val e = tbl(s, dir, "embeddings")
      e.withColumn("scale", VF.quantScale(col("embedding")))
        .withColumn("q", VF.quantizeInt8(col("embedding"), col("scale")))
        .select(col("vec_id"), col("scale"),
          expr("aggregate(q, 0L, (acc, x) -> acc + abs(x))").as("l1_q"),
          VF.quantError(col("embedding"), col("q"), col("scale")).as("max_err"))
        .orderBy("vec_id")
    }),

    "q58_quantized_search" -> ((s, dir) => {
      // retrieval over the int8-quantized store: dequantize and rank —
      // the end-to-end check that the 4× storage cut preserves search.
      // scale/q are materialized as columns FIRST: passing the quantScale
      // expression straight into the per-element lambdas would re-evaluate
      // the O(d) array_max once per element (O(d²) per row — measured 2×
      // the whole query's runtime at sf0.1)
      val e = tbl(s, dir, "embeddings")
      val deq = e
        .withColumn("scale", VF.quantScale(col("embedding")))
        .withColumn("q", VF.quantizeInt8(col("embedding"), col("scale")))
        .select(col("vec_id"),
          VF.dequantize(col("q"), col("scale")).as("demb"))
      val qv = deq.filter(col("vec_id") === 0).select("demb")
        .head().getSeq[Double](0)
      deq.withColumn("distance", VF.cosineDistance(col("demb"), typedLit(qv)))
        .orderBy(col("distance"), col("vec_id"))
        .limit(8)
        .select(col("vec_id"), round(col("distance"), 6).as("distance"))
    }),

    "q54_ivf_search" -> ((s, dir) => {
      // IVF probe path: assign the corpus to its nearest centroid, then
      // scan only the nProbe=2 centroid buckets closest to the query —
      // at cluster scale the corpus is written partitionBy(centroid_id)
      // and this becomes a partition-pruned scan
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val cents = centroids.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
      val qv = e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
      Similarity.ivfSearch(assigned, "embedding", "vec_id", cents, qv, 8, 2)
        .select(col("vec_id"), col("centroid_id"),
          round(col("distance"), 6).as("distance"))
    }),

    "q101_knn_graph" -> ((s, dir) => {
      // bucket-local kNN graph (NN-descent/SemDeDup stage 1): map-side
      // IVF assignment to 8 centroids, then top-3 cosine neighbors within
      // each cell — the self-join shuffles only on centroid_id (free when
      // the corpus is stored partitionBy(centroid_id))
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
        .withColumn("distance", round(col("distance"), 6))
        .orderBy("id", "rank")
    }),

    "q119_nn_descent" -> ((s, dir) => {
      // NN-descent refinement (HNSW-family graph build, Dong et al. 2011):
      // the bucket-local graph's components never LEAVE their IVF cell, so
      // the seed unions a deterministic ring (i → i+1 — the replayable
      // stand-in for NN-descent's random seed graph) to give expansion a
      // path between cells; one neighbor-of-neighbor round then reaches
      // true neighbors IVF blocking misses by construction. The sampled
      // recall@3 gate shows base vs refined side by side — refined can
      // only match or beat base (superset re-rank)
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val base = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      graft.plans.VectorExpressions.register(s)
      val ring = e.select(col("vec_id").as("id"), col("embedding").as("_lv"))
        .join(e.select((col("vec_id") - 1).as("id"), col("vec_id").as("nbr_id"),
          col("embedding").as("_rv")), Seq("id"))
        .select(col("id"), col("nbr_id"),
          call_function("graft_cosine_distance", col("_lv"), col("_rv")).as("distance"))
      val seed = base.select(col("id"), col("nbr_id"), col("distance"))
        .unionByName(ring)
      val refined = Similarity.nnDescentRefine(seed, e, "embedding", "vec_id", 3)
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      // exact top-3 TRUE neighbors (self excluded) of the sampled nodes
      val wEx = Window.partitionBy("query_id")
        .orderBy(col("distance").asc, col("vec_id").asc)
      val exact3 = Similarity.topKBatch(e, "embedding", "vec_id",
          queries, "qv", "qid", 4)
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("_rk", row_number().over(wEx)).filter(col("_rk") <= 3)
        .select(col("query_id").as("id"), col("vec_id").as("nbr_id"))
      def evalRecall(g: DataFrame) = Similarity.recallAtK(
        g.filter(col("id") < 50).select(col("id"), col("nbr_id")),
        exact3, "id", "nbr_id", 3)
      evalRecall(base)
        .withColumnRenamed("n_hit", "n_hit_base")
        .withColumnRenamed("recall", "recall_base")
        .join(evalRecall(refined)
          .withColumnRenamed("n_hit", "n_hit_ref")
          .withColumnRenamed("recall", "recall_ref"), Seq("id"))
        .orderBy("id")
    }),

    "q124_pq_search" -> ((s, dir) => {
      // product quantization serving: 64-dim floats become 4 codes
      // (map-side argmin per subspace), then query scoring is pure table
      // lookups (ADC) — the memory/compute compression that makes a
      // 100 TB vector corpus scannable; recall trade-off gated like any
      // ANN config
      val e = tbl(s, dir, "embeddings")
      val cb = operators.Quantization.pqCodebook(64, 4, 4)
      val qv = e.filter(col("vec_id") === 3).select("embedding").head().getSeq[Float](0)
      val encoded = operators.Quantization.pqEncode(e, "embedding", cb)
      operators.Quantization.pqSearch(encoded, "vec_id", qv, cb, 10)
        .select(col("vec_id"), round(col("adc_dist"), 6).as("adc_dist"))
    }),

    "q123_kmeans" -> ((s, dir) => {
      // the IVF coarse-codebook BUILD (the step the reference delegates
      // to its DB's index build): 2 Lloyd rounds from a deterministic
      // seed — zero-join argmin assignment + one decimal-exact hash
      // aggregate per round; only k×dim doubles visit the driver
      val e = tbl(s, dir, "embeddings")
      val init = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
      operators.Clustering.kmeans(e, "embedding", init, iters = 2)
        .select(col("cid"), col("dim"), round(col("mean"), 6).as("mean"))
        .orderBy("cid", "dim")
    }),

    "q121_index_merge" -> ((s, dir) => {
      // incremental index ingest: base build on the first 400 docs, then
      // MERGE the rest — only the batch's term-hash buckets are read,
      // re-aggregated, and atomically swapped; the lookup result must be
      // indistinguishable from a full rebuild (the oracle computes over
      // ALL documents)
      val d = tbl(s, dir, "documents")
      val root = sys.props("java.io.tmpdir") + s"/graft-index-merge-$tmpToken"
      val base = Retrieval.invertedIndex(
        d.filter(col("doc_id") < 400), "doc_id", "text")
      store.IndexStore.write(base, root, nBuckets = 8)
      val batch = Retrieval.invertedIndex(
        d.filter(col("doc_id") >= 400), "doc_id", "text")
      store.IndexStore.merge(s, root, batch, nBuckets = 8)
      store.IndexStore.lookup(s, root, Seq("spark", "join", "vector"), 8)
        .select(col("term"), col("df"), col("cf"),
          expr("aggregate(postings, 0L, (a, p) -> a + p.id * p.tf)")
            .as("dot_check"))
        .orderBy("term")
    }),

    "q122_truncated_rerank" -> ((s, dir) => {
      // Matryoshka-style two-stage search: coarse rank on the first 32 of
      // 64 dims (half the scan arithmetic at full scale), exact re-rank of
      // the 50-row shortlist — both stages TakeOrderedAndProject, the
      // corpus never shuffles
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 2).select("embedding").head().getSeq[Float](0)
      Similarity.truncatedRerank(e, "embedding", "vec_id", qv,
          k = 8, dPrime = 32, shortlistK = 50)
        .select(col("vec_id"), round(col("coarse_dist"), 6).as("coarse_dist"),
          round(col("distance"), 6).as("distance"))
    }),

    "q120_ann_store" -> ((s, dir) => {
      // the IVF store end-to-end (the 100 TB serving shape): assign →
      // persist partitionBy(centroid_id) → probe reads ONLY the nProbe
      // nearest cell DIRECTORIES — partition pruning in the scan's
      // PartitionFilters (IndexStoreSpec's ANN twin pins it), not a
      // post-scan filter
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val root = sys.props("java.io.tmpdir") + s"/graft-ann-store-$tmpToken"
      store.AnnStore.write(assigned, root)
      val cents = centroids.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
      val qv = e.filter(col("vec_id") === 1).select("embedding").head().getSeq[Float](0)
      store.AnnStore.probe(s, root, cents, qv, "embedding", "vec_id", 8, 2)
        .select(col("vec_id"), col("centroid_id"),
          round(col("distance"), 6).as("distance"))
    }),

    "q55_multistore_search" -> ((s, dir) => {
      // the reference's flagship retrieval composite (vs_retriever.py:
      // 307-384): per-store top-k → union → threshold → dedup keep-max on
      // content → global top-k, with the searched table stamped
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
      def searchStore(df: DataFrame) =
        Similarity.topK(df, "embedding", qv, 8, "COSINE", "vec_id")
          .select(col("vec_id").as("id"),
            concat(lit("vec-"), col("vec_id") % 50).as("text"), col("score"))
      val even = searchStore(e.filter(col("label") % 2 === 0))
      val odd = searchStore(e.filter(col("label") % 2 === 1))
      Similarity.multiStoreSearch(Seq("even" -> even, "odd" -> odd), 0.55, 8)
        .select(col("searched_table"), col("id"), col("text"),
          round(col("score"), 6).as("score"))
    }),

    // ---- IVF-style ANN assignment (scale path for similarity search) ----
    "q35_ivf_assign" -> ((s, dir) => {
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      Similarity.assignNearestCentroid(e, "embedding", "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("centroid_id"),
          round(col("centroid_dist"), 6).as("centroid_dist"))
        .orderBy("vec_id")
    }),

    // ---- Testbed evaluation (SURVEY §3.3: answer → judge → report) ------
    "q37_testbed_eval" -> ((s, dir) => {
      import s.implicits._
      val qa0 = testbed.Testbed.generateTestset(
          tbl(s, dir, "documents"), "text", "doc_id",
          questions = 2, chunkSize = 40, minChunks = 5)
        .withColumn("reference_answer", upper(expr("substring(reference_context, 1, 16)")))
        .withColumn("agent_answer", lit(null).cast("string"))
        .withColumn("correctness", lit(null).cast("boolean"))
        .as[testbed.Testbed.QARecord]
      val answered = testbed.Testbed.collectAnswers(qa0, q => q.toUpperCase)
      val judged = testbed.Testbed.judge(answered,
        (q, a, ref) => a == q.toUpperCase && ref.length % 2 == 0)
      testbed.Testbed.reportByTopic(judged.toDF())
        .select(col("topic"), col("n"), col("n_correct"), col("correctness"))
        .orderBy("topic")
    }),

    // ---- NL2SQL execution surface (SELECT-only guard → spark.sql) -------
    "q38_nl2sql" -> ((s, dir) => {
      Seq("part", "supplier").foreach { t =>
        tbl(s, dir, t).createOrReplaceTempView(t)
      }
      plans.SelectOnly.executeCapped(s,
        """SELECT p_brand, count(*) AS n, max(p_retailprice) AS max_price
          |FROM part WHERE p_size >= 30 GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    }),

    // ---- Web-scrape row transforms (P7 slugify) -------------------------
    "q39_slugify" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          TF.slugify(expr("substring(text, 1, 50)")).as("slug"))
        .orderBy("doc_id")),

    // ---- Web-scrape section extraction (S8) -----------------------------
    "q40_webscrape_sections" -> ((s, dir) => {
      // synthesized two-section pages: exercises script stripping, heading
      // splits, entity unescaping, and whitespace normalization
      val pages = tbl(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("<html><script>skip()</script><h1>"), col("source"),
            lit("</h1>"), expr("substring(text, 1, 120)"),
            lit("<h2>Details &amp; more</h2>"), expr("substring(text, 121)"),
            lit("</html>")).as("html"))
      sources.WebScrape.sections(pages, "html")
        .select(col("doc_id"), col("section_index"), col("title"), col("content"))
        .orderBy("doc_id", "section_index")
    }),

    // ---- File-corpus ingest (S1-S6; rows-only — reads a generated corpus)
    "q41_file_ingest" -> ((s, dir) => {
      import java.nio.file.{Files, Paths}
      val corpusDir = Files.createDirectories(
        Paths.get(sys.props("java.io.tmpdir"), s"graft-ingest-corpus-$tmpToken")).toString
      val docs = tbl(s, dir, "documents").filter(col("doc_id") < 20)
        .select("doc_id", "text").collect()
      docs.foreach { r =>
        Files.writeString(Paths.get(corpusDir, s"doc${r.getLong(0)}.txt"), r.getString(1))
      }
      Files.writeString(Paths.get(corpusDir, "readme.md"), "# corpus")
      Files.writeString(Paths.get(corpusDir, "binary.pdf"), "%PDF-fake")
      Files.writeString(Paths.get(corpusDir, "data.bin"), "xx")
      // REAL binary fixtures for the JDK-only extractors: a DOCX (zip +
      // word/document.xml) and a PDF with an uncompressed content stream —
      // expected text is a constant, so text_len is oracle-checkable
      val docxBytes = {
        val bos = new java.io.ByteArrayOutputStream()
        val z = new java.util.zip.ZipOutputStream(bos)
        z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
        z.write(("<?xml version=\"1.0\"?><w:document><w:body>" +
          "<w:p><w:r><w:t>Spark ingest works</w:t></w:r></w:p>" +
          "<w:p><w:r><w:t xml:space=\"preserve\">Second paragraph</w:t></w:r></w:p>" +
          "</w:body></w:document>").getBytes("UTF-8"))
        z.closeEntry(); z.close(); bos.toByteArray
      }
      Files.write(Paths.get(corpusDir, "report.docx"), docxBytes)
      val xlsxBytes = {
        val bos = new java.io.ByteArrayOutputStream()
        val z = new java.util.zip.ZipOutputStream(bos)
        z.putNextEntry(new java.util.zip.ZipEntry("xl/sharedStrings.xml"))
        z.write("<sst><si><t>region</t></si><si><t>total</t></si></sst>".getBytes("UTF-8"))
        z.closeEntry()
        z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
        z.write(("<worksheet><sheetData>" +
          "<row r=\"1\"><c r=\"A1\" t=\"s\"><v>0</v></c><c r=\"B1\" t=\"s\"><v>1</v></c></row>" +
          "<row r=\"2\"><c r=\"A2\"><v>7</v></c><c r=\"B2\"><v>950</v></c></row>" +
          "</sheetData></worksheet>").getBytes("UTF-8"))
        z.closeEntry(); z.close(); bos.toByteArray
      }
      Files.write(Paths.get(corpusDir, "table.xlsx"), xlsxBytes)
      Files.write(Paths.get(corpusDir, "real.pdf"),
        ("%PDF-1.4\n1 0 obj\n<< /Length 44 >>\nstream\n" +
          "BT /F1 12 Tf (Hello from a real PDF) Tj ET\n" +
          "endstream\nendobj\ntrailer\n<<>>\n%%EOF").getBytes("ISO-8859-1"))
      val corpus = sources.DocumentSource.loadCorpus(s, corpusDir)
      corpus.select(col("filename"), col("ext"), col("parse_ok"),
          length(col("text")).as("text_len"), col("skip_reason"))
        .orderBy("filename")
    }),

    "q59_frame_sample" -> ((s, dir) => {
      // frame-sampling plan over an opaque binary column: one row per
      // sampled frame (index, byte offset) — the explode side of a video
      // frame sampler, no shuffle, parallelism = input partitions
      val bin = tbl(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content_bin"))
      Multimodal.sampleFrames(bin, "content_bin", 100)
        .select(col("doc_id"), col("frame_index"), col("frame_offset"))
        .orderBy("doc_id", "frame_index")
    }),

    // ---- Multimodal plumbing (binary columns, batch decode stub) --------
    "q33_multimodal_features" -> ((s, dir) => {
      val bin = tbl(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content_bin"))
      Multimodal.extractFeatures(bin, "content_bin", featDim = 8)
        .select(col("doc_id"), col("byte_len"), col("sha256"))
        .orderBy("doc_id")
    }),

    // ---- Multimodal REAL codecs (JDK ImageIO / javax.sound) -------------
    "q125_image_decode" -> ((s, dir) => {
      // REAL image codec round-trip: a deterministic 16×16 gray PNG per doc
      // (pixel(x,y) = (x·7 + y·13 + doc_id·31) mod 256) is encoded AND
      // decoded with the JDK's real PNG codec, then 8×8 average-pooled into
      // mean + 63-bit aHash. PNG is lossless, so the oracle replays the
      // stats arithmetically — the codec is in the loop, the math is exact.
      // Both stages are one map each: at 100 TB the decode cost rides the
      // scan stage, zero shuffle
      import s.implicits._
      val imgs = tbl(s, dir, "documents").select(col("doc_id"))
        .repartition(32) // spread codec work: ids are 8 bytes, encode is the cost
        .as[Long]
        .map { id =>
          val px = Array.tabulate(256)(i =>
            (((i % 16) * 7 + (i / 16) * 13 + id * 31) % 256).toInt)
          (id, graft.sources.BinaryMedia.encodeGrayPng(16, 16, px))
        }.toDF("doc_id", "img")
      Multimodal.decodeImageStats(imgs, "doc_id", "img")
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_gray"), 6).as("mean_gray"), col("ahash"))
        .orderBy("doc_id")
    }),

    "q126_image_neardup" -> ((s, dir) => {
      // perceptual near-dup over REAL decoded pixels: docs sharing
      // doc_id mod 20 get near-identical GIF images (one pixel bumped per
      // doc), decoded with the JDK's real GIF codec into aHash63, then the
      // same 4×16-band Hamming machinery as SimHash/q113 — proving the
      // image path feeds the existing dedup stack unchanged
      import s.implicits._
      val imgs = tbl(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 400)
        .repartition(32).as[Long]
        .map { id =>
          val px = Array.tabulate(256) { i =>
            val x = i % 16; val y = i / 16
            val base = (x * 7 + y * 13 + (id % 20) * 31) % 256
            val bump = if (x == id % 16 && y == (id / 16) % 16) 1 + id % 7 else 0L
            ((base + bump) % 256).toInt
          }
          (id, graft.sources.BinaryMedia.encodeGrayGif(16, 16, px))
        }.toDF("doc_id", "img")
      val hashed = Multimodal.decodeImageStats(imgs, "doc_id", "img")
        .select(col("doc_id"), col("ahash"))
      Dedup.hammingPairs64(hashed, "doc_id", "ahash", maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),

    "q127_wav_decode" -> ((s, dir) => {
      // REAL audio codec: a deterministic 16-bit PCM mono WAV per doc
      // (128 + doc_id mod 64 samples, sample(i) = (doc_id·31 + i·17) mod
      // 4096 − 2048) decoded via javax.sound.sampled — count, peak and
      // mean-square energy replayed arithmetically by the oracle
      import s.implicits._
      val wavs = tbl(s, dir, "documents").select(col("doc_id"))
        .repartition(32).as[Long]
        .map { id =>
          val n = (128 + id % 64).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 4096) - 2048).toShort)
          (id, graft.sources.BinaryMedia.encodeWavPcm16(samples, 8000))
        }.toDF("doc_id", "wav")
      Multimodal.decodeWavStats(wavs, "doc_id", "wav")
        .select(col("doc_id"), col("n_samples"), col("sample_rate"),
          col("peak"), round(col("mean_square"), 6).as("mean_square"))
        .orderBy("doc_id")
    }),

    "q128_gif_frames" -> ((s, dir) => {
      // REAL video-style frame sampling: an animated GIF per doc
      // (3 + doc_id mod 5 frames of 8×8, pixel = (x·3 + y·5 + f·11 +
      // doc_id·7) mod 256), every 2nd frame decoded to its mean gray via
      // the JDK GIF reader — the explode shape of q59 with an actual codec
      // in the loop, still zero shuffle
      import s.implicits._
      val gifs = tbl(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 1000)
        .repartition(32).as[Long]
        .map { id =>
          val nf = (3 + id % 5).toInt
          val frames = (0 until nf).map(f => Array.tabulate(64)(i =>
            (((i % 8) * 3 + (i / 8) * 5 + f * 11 + id * 7) % 256).toInt))
          (id, graft.sources.BinaryMedia.encodeAnimatedGif(8, 8, frames))
        }.toDF("doc_id", "gif")
      Multimodal.gifFrameMeans(gifs, "doc_id", "gif", everyN = 2)
        .select(col("doc_id"), col("frame_index"),
          round(col("frame_mean"), 6).as("frame_mean"))
        .orderBy("doc_id", "frame_index")
    }),

    "q129_graph_search" -> ((s, dir) => {
      // the serving half of the graph-index (HNSW) family: greedy beam
      // search over the bucket-local kNN graph — entry points 0..3, two
      // expand→score→keep-8 rounds, top-5 answer for query vec 5. The
      // corpus is touched only via equi-joins on candidate ids
      // (O(beam·degree) scorings per round, never a scan)
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      Similarity.graphBeamSearch(graph, e, "embedding", "vec_id",
          queryId = 5L, entryIds = Seq(0L, 1L, 2L, 3L),
          beam = 8, iters = 2, k = 5)
        .select(col("rank"), col("vec_id"),
          round(col("distance"), 6).as("distance"))
        .orderBy("rank")
    }),

    "q130_bpe_merges" -> ((s, dir) => {
      // BPE tokenizer induction over the corpus (Sennrich 2016): one
      // corpus pass builds the distinct-word table, then each merge round
      // is a vocab-sized pair count + a 1-row argmax broadcast back into a
      // map-side rewrite — rounds cost O(vocab), never O(corpus). Three
      // rounds, learned merges out; the oracle unrolls the loop as CTEs
      val wc = operators.Bpe.wordCounts(tbl(s, dir, "documents"), "text")
      operators.Bpe.learnMerges(wc, iters = 3).orderBy("rank")
    }),

    "q131_kmv_overlap" -> ((s, dir) => {
      // cross-corpus overlap with NO exact intersect: content fingerprints
      // → per-side KMV k-min sketches → union-sketch membership — Jaccard
      // and intersection-size estimates from 2×64 longs, however large the
      // corpora; the two windows share docs 150-349 by construction
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), TF.fingerprint("text").as("fp"))
      Sketches.kmvJaccard(
          d.filter(col("doc_id") < 350), d.filter(col("doc_id") >= 150),
          "fp", 64)
        .select(col("n_union"), col("n_both"),
          round(col("union_est"), 6).as("union_est"),
          round(col("jaccard_est"), 6).as("jaccard_est"),
          round(col("intersection_est"), 6).as("intersection_est"))
    }),

    "q132_ann_merge" -> ((s, dir) => {
      // incremental vector ingest: build the IVF store on even ids, MERGE
      // the odd-id batch — only the cells the batch lands in are read and
      // atomically swapped (ingest cost scales with the batch); the probe
      // must be indistinguishable from a full rebuild, so the oracle
      // computes over ALL embeddings
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val base = Similarity.assignNearestCentroid(
          e.filter(col("vec_id") % 2 === 0), "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val root = sys.props("java.io.tmpdir") + s"/graft-ann-merge-$tmpToken"
      store.AnnStore.write(base, root)
      store.AnnStore.merge(s, root, e.filter(col("vec_id") % 2 === 1),
        centroids, "cid", "cv", "embedding", "vec_id")
      val cents = centroids.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
      val qv = e.filter(col("vec_id") === 2).select("embedding").head().getSeq[Float](0)
      store.AnnStore.probe(s, root, cents, qv, "embedding", "vec_id", 8, 2)
        .select(col("vec_id"), col("centroid_id"),
          round(col("distance"), 6).as("distance"))
    }),

    "q133_bpe_encode" -> ((s, dir) => {
      // the tokenize half of the BPE lifecycle: learn 3 merges (q130),
      // then APPLY them to the distinct-word table and report the top-20
      // vocabulary symbols by weighted occurrence — corpus tokenization is
      // a map-side rewrite of the vocab-sized word table, never a second
      // corpus pass; the 3 learned merges are the only driver-side rows
      val wc = operators.Bpe.wordCounts(tbl(s, dir, "documents"), "text")
      val merges = operators.Bpe.learnMerges(wc, iters = 3).orderBy("rank")
        .select("sym_a", "sym_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      operators.Bpe.applyMerges(wc, merges)
        .select(explode(col("tokens")).as("token"), col("word"), col("freq"))
        .groupBy("token")
        .agg(countDistinct("word").as("n_words"), sum("freq").as("occurrences"))
        .orderBy(col("occurrences").desc, col("token"))
        .limit(20)
    }),

    "q134_dsir_select" -> ((s, dir) => {
      // DSIR importance selection (Xie 2023): hashed-bigram bucket counts
      // for the src0 target domain vs the raw corpus -> fixed-point
      // importance ratios -> map-side per-doc weight fold -> top-25% keep;
      // integer arithmetic end to end, so the oracle replays it exactly
      Sampling.dsirSelect(tbl(s, dir, "documents"), "doc_id", "text",
          col("source") === "src0", buckets = 64, selectPct = 25)
        .select(col("doc_id"), col("n_feats"), col("weight"),
          col("rank"), col("selected"))
        .orderBy("doc_id")
    }),

    "q135_semantic_dedup" -> ((s, dir) => {
      // SemDeDup (Abbas 2023): map-side IVF cell assignment scopes the
      // cosine pair search; of any within-cell pair >= 0.35 the member
      // closer to its centroid is dropped, keeping the cluster's diverse
      // outliers — cluster-level semantic dedup over the same centroids
      // as q35, single equi-shuffle on the cell id
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      Dedup.semanticDedup(e, "vec_id", "embedding", centroids, "cid", "cv",
          minCosine = 0.35)
        .select(col("id").as("vec_id"), col("centroid_id"),
          round(col("centroid_dist"), 6).as("centroid_dist"), col("kept"))
        .orderBy("vec_id")
    }),

    "q136_pagerank" -> ((s, dir) => {
      // prototypicality selection: PageRank centrality over the q101 kNN
      // graph — central docs are representative, low-rank docs isolated;
      // fixed-point BIGINT mass so the 3 power iterations replay exactly;
      // each round is the 2-shuffle Pregel shape (join ranks on src,
      // groupBy dst) over the SAME degree-annotated edge list
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      GraphAnalytics.ranked(GraphAnalytics.pageRank(graph, "id", "nbr_id", 3))
        .select(col("id").as("vec_id"), col("pr"), col("rk"))
        .orderBy("rk")
    }),

    "q137_ppr_expand" -> ((s, dir) => {
      // seed-set expansion by personalized PageRank: teleport mass
      // restricted to 5 trusted seeds diffuses along kNN edges — the
      // graph-diffusion "related documents" signal for curation; same
      // fixed-point rounds as q136, teleport share split across seeds
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      val seeds = e.filter(col("vec_id") < 5).select("vec_id")
      GraphAnalytics.personalizedPageRank(graph, "id", "nbr_id",
          seeds, "vec_id", 3)
        .filter(col("pr") > 0)
        .select(col("id").as("vec_id"), col("base").as("teleport"), col("pr"))
        .orderBy("vec_id")
    }),

    "q138_semantic_contamination" -> ((s, dir) => {
      // embedding-level decontamination (q84's semantic twin): train docs
      // within cosine 0.35 of ANY eval doc are flagged, with hit count,
      // max cosine, and the witness eval id; cell-scoped train×eval with
      // the eval side broadcast — the train corpus is never shuffled
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val train = e.filter(col("vec_id") % 17 =!= 3)
      val evalDf = e.filter(col("vec_id") % 17 === 3)
      Dedup.semanticContamination(train, "vec_id", "embedding",
          evalDf, "vec_id", "embedding", centroids, "cid", "cv",
          minCosine = 0.35)
        .select(col("id").as("vec_id"), col("centroid_id"),
          col("n_eval_hits"), round(col("max_cosine"), 6).as("max_cosine"),
          col("witness_eid"), col("contaminated"))
        .orderBy("vec_id")
    }),

    "q139_label_propagation" -> ((s, dir) => {
      // semi-supervised label spreading: clamp the labels of the first
      // 200 vectors, majority-vote them 2 rounds along kNN edges (ties to
      // the smallest label) — each round one join + integer count agg,
      // replayed exactly by the oracle
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      val seeds = e.filter(col("vec_id") < 200).select("vec_id", "label")
      GraphAnalytics.labelPropagation(graph, "id", "nbr_id",
          seeds, "vec_id", "label", iters = 2)
        .select(col("id").as("vec_id"), col("label"), col("origin"))
        .orderBy("vec_id")
    }),

    "q140_bloom_join" -> ((s, dir) => {
      // Bloom runtime-filter join pruning: the urgent-orders dim builds a
      // 16 KB packed bitmap; lineitem rows are dropped map-side in the
      // scan stage before the join shuffle. n_joined proves prefilter ∘
      // join ≡ plain join; n_false_pass is the bounded Bloom overshoot
      // that the join then discards
      val m = 131072; val k = 3
      val dim = tbl(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("key")).distinct().cache()
      val fact = tbl(s, dir, "lineitem").select(col("l_orderkey"))
      val pruned = Joins.bloomPrefilter(fact, "l_orderkey", dim, "key", m, k)
        .cache()
      val joined = pruned.join(dim, pruned("l_orderkey") === dim("key"))
      fact.agg(count(lit(1)).as("n_fact"))
        .crossJoin(pruned.agg(count(lit(1)).as("n_pass")))
        .crossJoin(joined.agg(count(lit(1)).as("n_joined")))
        .withColumn("n_false_pass", col("n_pass") - col("n_joined"))
    }),

    "q141_cluster_quality" -> ((s, dir) => {
      // codebook quality gate (the k-means elbow input): per-cell point
      // count + inertia from the SAME map-side assignment as q35, with a
      // rollup total row — squared distances are exact double products,
      // accumulated in decimal so the sum is order-independent
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
      Clustering.clusterQuality(assigned, "centroid_id", "centroid_dist")
        .orderBy(col("centroid_id").asc_nulls_last)
    }),

    "q142_similarity_join" -> ((s, dir) => {
      // EXACT all-pairs 5-gram-shingle Jaccard ≥ 0.6 via prefix + length
      // filtering — candidates only from each doc's rarest df-ordered
      // prefix shingles, so no LSH miss risk (q20 estimates; this is
      // ground truth). Exact all-pairs is the bounded-slice validation
      // tool (it measures q20/q21's recall); the slice is capped like
      // q22's, the LSH family is the open-corpus path
      val d = tbl(s, dir, "documents").filter(col("doc_id") < 600)
      val toks = d.select(col("doc_id").as("id"),
        explode(Dedup.shingleExpr("text", 5)).as("tok"))
      Dedup.prefixFilterJoin(toks, "id", "tok", tau = 0.6)
        .orderBy("doc_a", "doc_b")
    }),

    "q143_lsh_recall" -> ((s, dir) => {
      // the dedup-config qualification gate (the q103 recall@k idea
      // applied to LSH): on a bounded near-dup corpus, q20's MinHash-LSH
      // pairs are scored against q142's EXACT prefix-filtered ground
      // truth — recall says whether 64 hashes × 8 bands is safe to trust
      // before a full-corpus run, precision what the est_jaccard cut
      // over-flags
      val d = tbl(s, dir, "documents").filter(col("doc_id") < 300)
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text",
          shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
        .select("doc_a", "doc_b").cache()
      val toks = corpus.select(col("doc_id").as("id"),
        explode(Dedup.shingleExpr("text", 5)).as("tok"))
      val exact = Dedup.prefixFilterJoin(toks, "id", "tok", tau = 0.8)
        .select("doc_a", "doc_b").cache()
      val hit = exact.join(lsh, Seq("doc_a", "doc_b"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(lsh.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
        .withColumn("precision", col("n_hit").cast("double") / col("n_lsh"))
    }),

    "q144_local_supplier_volume" -> ((s, dir) => {
      // TPC-H Q5: revenue from intra-nation trade in one region/year —
      // the 6-way join; region/nation/supplier/customer all broadcast,
      // lineitem⋈orders stays the only fact-fact shuffle
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val rn = broadcast(tbl(s, dir, "nation")
        .join(broadcast(tbl(s, dir, "region"))
          .filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey")))
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(tbl(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(tbl(s, dir, "customer")),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(rn, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(rev).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    }),

    "q145_waiting_suppliers" -> ((s, dir) => {
      // TPC-H Q21 shape (adapted: lineitem has no commit/receipt dates, so
      // "the blocker" is the strictly-latest shipper on the order): for
      // 'F' orders with multiple suppliers, count per supplier the orders
      // where THEIR ship date beats every co-supplier's — semi + anti
      // equi-joins on the order key, no correlated re-scan
      val l = tbl(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
      val l1 = l
        .join(tbl(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val l2 = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = l.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("d3"))
      val waiting = l1
        .join(l2, col("l_orderkey") === col("k2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("k3") &&
          col("l_suppkey") =!= col("s3") &&
          col("d3") >= col("l_shipdate"), "left_anti")
      waiting
        .join(broadcast(tbl(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    }),

    "q146_nation_profit" -> ((s, dir) => {
      // TPC-H Q9 shape (no partsupp table → revenue in place of profit):
      // per supplier-nation per order-year revenue on 'red' parts; part/
      // supplier/nation broadcast, one fact-fact shuffle
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")
          .filter(col("p_name").contains("red"))
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(tbl(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(tbl(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(tbl(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("nation"), desc("o_year"))
    }),

    "q147_drift_chi2" -> ((s, dir) => {
      // corpus-composition drift monitor: χ² of the source mix between a
      // third of the corpus and the rest (mod-3 split crosses the
      // generator's mod-20 source cycle, so every category lands in both
      // snapshots), per-category contributions plus a decimal-accumulated
      // total row (NULL category) — each term is a fixed parenthesization
      // of correctly-rounded double ops, so the oracle replays it
      // bit-for-bit
      val d = tbl(s, dir, "documents")
      val per = Stats.chiSquareDrift(
        d.filter(col("doc_id") % 3 === 0),
        d.filter(col("doc_id") % 3 =!= 0), "source")
      val total = per.agg(
        sum("n_ref").as("n_ref"), sum("n_cur").as("n_cur"),
        sum(col("contrib").cast("decimal(32,10)")).cast("double").as("_chi2"))
        .select(lit(null).cast("string").as("category"),
          col("n_ref"), col("n_cur"),
          lit(null).cast("double").as("expected"),
          col("_chi2").as("contrib"))
      per.unionByName(total).orderBy(col("category").asc_nulls_last)
    }),

    "q148_bq_search" -> ((s, dir) => {
      // the 1-bit end of the quantization family (q57 int8 → q124 PQ →
      // here 64 dims in ONE long): sign-bit pack map-side, Hamming
      // XOR+popcount shortlist as a bounded TakeOrdered heap, exact
      // cosine re-rank of the 50-row shortlist — the corpus never
      // shuffles in either stage
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 2).select("embedding")
        .head().getSeq[Float](0)
      Quantization.bqSearch(e, "vec_id", "embedding", qv,
          k = 8, shortlistK = 50)
        .select(col("vec_id"), col("hamming"),
          round(col("distance"), 6).as("distance"))
    }),

    "q149_shipping_priority" -> ((s, dir) => {
      // TPC-H Q3: revenue of yet-unshipped orders for one market segment
      // — the last partsupp-free TPC-H shape. Both date filters push to
      // the scans; the filtered customer dim broadcasts; top-10 is a
      // bounded TakeOrdered, never a global sort.
      val cutoff = lit("1995-03-15").cast("timestamp")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      tbl(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
        .join(tbl(s, dir, "orders").filter(col("o_orderdate") < cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(tbl(s, dir, "customer")
            .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    "q150_margin_mining" -> ((s, dir) => {
      // LASER-style margin mining (Artetxe & Schwenk 2019) between the
      // even-id batch (bounded query slice) and the odd-id half of the
      // embedding corpus: best target per source by RATIO margin — raw
      // cosine normalized by both sides' k-NN neighborhood density —
      // two bounded-heap corpus passes, no corpus shuffle
      val e = tbl(s, dir, "embeddings")
      val src = e.filter(col("vec_id") % 2 === 0 && col("vec_id") < 400)
      val tgt = e.filter(col("vec_id") % 2 === 1)
      Similarity.marginMining(src, "vec_id", tgt, "vec_id", "embedding",
          k = 4, minMargin = 1.0)
        .select(col("src_id"), col("tgt_id"),
          round(col("cosine"), 6).as("cosine"),
          round(col("margin"), 6).as("margin"))
        .orderBy("src_id")
    }),

    "q151_split_assign" -> ((s, dir) => {
      // near-dup-safe train/val/test split: split keyed on the LSH dedup
      // CLUSTER representative, so near-duplicate families can never
      // straddle splits (train/test leakage); the audit output pins
      // per-split doc/cluster/char counts and n_straddle = 0
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      val labels = Dedup.dedupClusters(pairs, "doc_a", "doc_b", edgePartitions = 8)
      val sp = Sampling.clusterSplit(corpus, "doc_id", labels, "id", "cluster_rep")
      val agg = sp.groupBy("split").agg(
        count(lit(1)).as("n_docs"),
        countDistinct("cluster_rep").as("n_clusters"),
        sum(length(col("text"))).cast("long").as("n_chars"))
      val straddle = sp.groupBy("cluster_rep")
        .agg(countDistinct("split").as("_ns"))
        .filter(col("_ns") > 1)
        .agg(count(lit(1)).as("n_straddle"))
      agg.crossJoin(broadcast(straddle)).orderBy("split")
    }),

    "q152_ewma_monitor" -> ((s, dir) => {
      // EWMA control chart over the per-type event stream: α=1/2
      // geometric weights over ≤16 predecessors, all arithmetic
      // replay-exact (power-of-two scaling + decimal accumulate)
      Stats.ewmaMonitor(events(s, dir), "event_type", "ts", "event_id",
          "value", window = 16, minHistory = 4, threshold = 120.0)
        .select(col("event_type"), col("event_id"), col("value"),
          col("n_history"), round(col("ewma"), 6).as("ewma"),
          round(col("deviation"), 6).as("deviation"))
        .orderBy("event_type", "event_id")
    }),

    "q153_span_corruption" -> ((s, dir) =>
      // deterministic T5-style span-corruption plan: per-doc mask layout
      // as a pure function of (doc_id, token count) — reproducible
      // across runs, partitionings, and engines
      Chunker.spanCorruptionPlan(tbl(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q154_priority_sample" -> ((s, dir) =>
      // token-weighted audit sample: 100 docs by Duffield-Lund-Thorup
      // priority, est_weight = max(w, τ) making char totals unbiased;
      // deterministic hash uniforms, bounded TakeOrdered heap
      Sampling.prioritySample(tbl(s, dir, "documents"), "doc_id",
          "n_chars", k = 100)
        .select(col("doc_id"), col("n_chars"),
          round(col("priority"), 6).as("priority"),
          round(col("est_weight"), 6).as("est_weight"))
        .orderBy("doc_id")),

    "q155_dedup_report" -> ((s, dir) => {
      // dedup savings audit: near-dup cluster size histogram with the
      // chars reclaimable under keep-representative — the planning
      // number a dedup run is justified by
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      val labels = Dedup.dedupClusters(pairs, "doc_a", "doc_b", edgePartitions = 8)
      val j = corpus
        .join(labels.select(col("id").as("doc_id"), col("cluster_rep")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_rep"), col("doc_id")).as("rep"),
          length(col("text")).as("len"))
      val perCluster = j.groupBy("rep").agg(
        count(lit(1)).as("cluster_size"),
        sum(col("len")).cast("long").as("chars_total"),
        min_by(col("len"), col("doc_id")).cast("long").as("chars_rep"))
      perCluster.groupBy("cluster_size").agg(
          count(lit(1)).as("n_clusters"),
          sum(col("chars_total")).cast("long").as("chars_total"),
          sum(col("chars_total") - col("chars_rep")).cast("long").as("chars_savable"))
        .orderBy("cluster_size")
    }),

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
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      GraphAnalytics.triangleStats(
        Similarity.knnGraph(assigned, "embedding", "vec_id", 3),
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
      // rational discounts (integer DCG numerators, one final division)
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val approx = Similarity.ivfSearchBatch(assigned, "embedding", "vec_id",
        centroids, "cid", "cv", queries, "qv", "qid", 3, 2)
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
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(
          e, "embedding", "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val cb = operators.Quantization.pqCodebook(64, 4, 4)
      val encoded = operators.Quantization.pqEncode(assigned, "embedding", cb)
      val cents = centroids.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
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
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
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
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
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
      // the corpus collapses to one |cells|×|labels| contingency
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(
        e, "embedding", "vec_id", centroids, "cid", "cv")
      Evaluation.clusterAgreement(assigned, "centroid_id", "label")
    }),

    "q217_source_ablation" -> ((s, dir) => {
      // leave-one-source-out AUC in ONE pass: the doubled rank-sum
      // decomposes over (pos source, neg source), so U_without(s) =
      // U_total − row_s − col_s + U(s,s) — data valuation for "which
      // source props up / drags down the quality classifier"
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), col("margin"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
        .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
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
        .withColumn("_toks", TextQuality.tokens(col("text")))
        .withColumn("lines", TextQuality.tokenLines("_toks", 12))
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
        .orderBy("source")),

    "q223_preference_pairs" -> ((s, dir) => {
      // DPO-style preference-pair mining: each Gopher-passing doc pairs
      // with the length-CLOSEST failing doc of the same language —
      // length matching is the confound control, lang the comparability
      // block; group equi-join + one min_by argmin, no global sort
      val d = tbl(s, dir, "documents")
      val labeled = TextQuality.gopherMetrics(d, "doc_id", "text")
        .select(col("doc_id"), col("quality_pass"))
        .join(d.select(col("doc_id"), col("lang"), col("n_chars")),
          Seq("doc_id"))
      Sampling.preferencePairs(labeled, "doc_id", "lang", "n_chars",
          "quality_pass")
        .orderBy("chosen_id")
    }),

    "q224_maxsim" -> ((s, dir) => {
      // late-interaction MaxSim (ColBERT shape): doc and query as 8×8-dim
      // sub-vectors, score = Σ over query slices of max dot vs any doc
      // slice — per-aspect matching a pooled vector can't express. Query
      // slices ride as literals: scan → 64 inline dot folds →
      // TakeOrderedAndProject, zero shuffle
      val e = tbl(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0)
      Similarity.maxSimSearch(e, "embedding", "vec_id", q,
          dim = 64, slices = 8, k = 10)
        .select(col("vec_id"), round(col("maxsim"), 6).as("maxsim"))
    }),

    "q225_attribution" -> ((s, dir) =>
      // multi-touch attribution: each purchase credits the user's views
      // in the prior 7 days — linear and U-shaped 40/20/40 models in
      // exact integer micro-credits (floor div), so the lag-curve sums
      // replay as BIGINTs under any partitioning
      streaming.EventStreams.multiTouchAttribution(events(s, dir),
          "purchase", "view", windowDays = 7)
        .orderBy("lag_days")),

    "q226_ab_test" -> ((s, dir) => {
      // hash-bucketed A/B readout: users split by the scrambled key hash
      // (a null experiment — |t| should be small), per-user purchase
      // cents, Welch's t from decimal-exact sufficient statistics
      val perUser = events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100).cast("long")).cast("long")
          .as("v100"))
        .withColumn("arm", Sketches.keyHash(col("user_id")) % 2 === 0)
      Stats.welchTTest(perUser, "arm", "v100")
    }),

    "q227_prf_expansion" -> ((s, dir) => {
      // pseudo-relevance feedback (RM3-lite): BM25 round 1 → top-2
      // co-occurring terms from the top-5 docs (by total tf, ties to the
      // smaller term) join the query → BM25 round 2. The classic
      // query-understanding step between raw BM25 (q98) and hybrid
      // fusion (q109); the expansion terms are 2 strings on the driver
      import s.implicits._
      val d = tbl(s, dir, "documents")
      val q0 = Seq("spark", "join", "vector", "window")
      val top5 = Retrieval.bm25(d, "doc_id", "text", q0, 5).select("id")
      val expTerms = d
        .join(top5, d("doc_id") === top5("id"), "left_semi")
        .select(explode(Retrieval.analyze(col("text"))).as("term"))
        .filter(!col("term").isin(q0: _*))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(2)
        .select("term").as[String].collect().toSeq
      Retrieval.bm25(d, "doc_id", "text", q0 ++ expTerms, 10)
    }),

    "q228_khop" -> ((s, dir) => {
      // k-hop reachability audit of the q101 kNN graph from seed 0:
      // frontier sizes for 1..3 directed hops — the expansion-rate
      // sanity check for graph beam search (q129); three equi-joins on
      // a k-bounded edge list
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val edges = Similarity.knnGraph(
          Similarity.assignNearestCentroid(e, "embedding", "vec_id",
            centroids, "cid", "cv"), "embedding", "vec_id", k = 3)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      val h0 = e.filter(col("vec_id") === 0).select(col("vec_id").as("node"))
      def expand(frontier: DataFrame, visited: DataFrame) =
        frontier.join(edges, frontier("node") === edges("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
      val h1 = expand(h0, h0)
      val v1 = h0.union(h1)
      val h2 = expand(h1, v1)
      val v2 = v1.union(h2)
      val h3 = expand(h2, v2)
      def su(df: DataFrame, hop: Int) = df.agg(lit(hop).as("hop"),
        count(lit(1)).as("n_nodes"), min("node").as("min_id"),
        max("node").as("max_id"))
      su(h1, 1).unionByName(su(h2, 2)).unionByName(su(h3, 3))
        .orderBy("hop")
    }),

    "q229_centroid_drift" -> ((s, dir) => {
      // embedding-space drift monitor: per-label centroid vs the global
      // centroid, L2 over per-dim means from DECIMAL-exact sums (the
      // q193 discipline — a plain double sum over dims would be
      // partition-order-dependent); flags a stratum drifting away from
      // the corpus in representation space
      val dims = tbl(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .withColumn("x", col("x").cast("double"))
      val dsum18 = (c: Column) => sum(c.cast("decimal(38,18)")).cast("double")
      val per = dims.groupBy("label", "dim")
        .agg(dsum18(col("x")).as("sx"), count(lit(1)).as("n"))
        .withColumn("mean", col("sx") / col("n"))
      val glob = dims.groupBy("dim")
        .agg((dsum18(col("x")) / count(lit(1))).as("gmean"))
      per.join(glob, "dim")
        .withColumn("d2",
          (col("mean") - col("gmean")) * (col("mean") - col("gmean")))
        .groupBy("label")
        .agg(max("n").as("n_vectors"),
          round(sqrt(dsum18(col("d2"))), 6).as("drift"))
        .orderBy("label")
    }),

    "q230_scd2_merge" -> ((s, dir) => {
      // SCD2 incremental merge: intervals persisted at the Jan-20 cutoff
      // + the later event batch, merged WITHOUT rewriting closed history
      // — the oracle REBUILDS from all events, so the hash match is the
      // merge ≡ rebuild proof (q185's discipline on the dimension table)
      val ev = events(s, dir).filter(col("user_id") < 100)
      val cut = lit("2024-01-20").cast("timestamp")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val state = ev.filter(col("ts") < cut)
        .select(col("user_id"), col("event_type"),
          col("ts").cast("timestamp_ntz").as("valid_from"),
          lead(col("ts"), 1).over(w).cast("timestamp_ntz").as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull)
      ChangeDetection.scd2Merge(state, ev.filter(col("ts") >= cut))
        .orderBy("user_id", "valid_from")
    }),

    "q231_rank_stability" -> ((s, dir) => {
      // ranker promote-gate: overlap@10 + exact Kendall tau between the
      // plain BM25 top-10 and its PRF-expanded rerun (q227) — "how much
      // did the expansion actually move the ordering?"
      import s.implicits._
      val d = tbl(s, dir, "documents")
      val q0 = Seq("spark", "join", "vector", "window")
      def ranked(df: org.apache.spark.sql.DataFrame) = df.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id"))))
      val a = ranked(Retrieval.bm25(d, "doc_id", "text", q0, 10))
      val top5 = Retrieval.bm25(d, "doc_id", "text", q0, 5).select("id")
      val expTerms = d
        .join(top5, d("doc_id") === top5("id"), "left_semi")
        .select(explode(Retrieval.analyze(col("text"))).as("term"))
        .filter(!col("term").isin(q0: _*))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(2)
        .select("term").as[String].collect().toSeq
      val b = ranked(Retrieval.bm25(d, "doc_id", "text", q0 ++ expTerms, 10))
      Evaluation.rankAgreement(a, b, "id", "rank", k = 10)
    }),

    "q232_topk_agg" -> ((s, dir) => {
      // per-source top-3 quality docs via the native bounded-heap
      // aggregate (graft_top_k → ObjectHashAggregate): map-side partial
      // heaps mean the shuffle carries ≤3 rows per (task, source) where
      // the q08-style window form shuffles and sorts EVERY row. DESC is
      // encoded by negation; doc_id makes the tuple total
      val d = tbl(s, dir, "documents")
        .withColumn("quality", TF.qualityScore(col("text")))
      graft.plans.TopKAggregate.topKRows(d, Seq("source"),
          Seq((-col("quality")).as("nq"), col("doc_id").as("doc_id")),
          Nil, k = 3)
        .select(col("source"), col("doc_id"), (-col("nq")).as("quality"))
        .orderBy("source", "doc_id")
    }),

    "q233_phrase_match" -> ((s, dir) =>
      // exact consecutive-token phrase scan: per-row HOF over the token
      // array, zero shuffle — grep-shaped, the right plan for a phrase
      // query without a prebuilt positional index
      Retrieval.phraseMatch(tbl(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "join"))
        .orderBy("id")),

    "q234_min_span" -> ((s, dir) =>
      // minimal covering span (proximity): smallest token window holding
      // all three query terms — hits filtered map-side, ONE shuffle by
      // doc id, |terms| running-max window columns
      Retrieval.minSpanProximity(tbl(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "vector", "merge"))
        .orderBy("id")),

    "q235_snippet" -> ((s, dir) =>
      // keyword-in-context: the 8-token window with the most distinct
      // query terms (ties → earliest), with its text — bounded self-join
      // of query-term hits only, never token × token
      Retrieval.bestSnippet(tbl(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "vector", "merge"), width = 8)
        .orderBy("id")),

    "q236_bradley_terry" -> ((s, dir) => {
      // Bradley–Terry source strengths from head-to-head quality duels:
      // consecutive same-lang docs duel, higher quality wins (tie → the
      // earlier doc). One corpus window builds the duels; the 3 MM
      // rounds run on the bounded source × source match matrix
      val w = Window.partitionBy("lang").orderBy("doc_id")
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          TF.qualityScore(col("text")).as("q"))
      val duels = d
        .withColumn("n_doc", lead("doc_id", 1).over(w))
        .withColumn("n_src", lead("source", 1).over(w))
        .withColumn("n_q", lead("q", 1).over(w))
        .filter(col("n_doc").isNotNull && col("source") =!= col("n_src"))
        .select(
          when(col("q") >= col("n_q"), col("source")).otherwise(col("n_src"))
            .as("win"),
          when(col("q") >= col("n_q"), col("n_src")).otherwise(col("source"))
            .as("lose"))
      Evaluation.bradleyTerry(duels, "win", "lose", iters = 3)
        .orderBy("item")
    }),

    "q237_audio_vad" -> ((s, dir) => {
      // energy-threshold voice-activity segmentation over REAL WAV clips
      // (the q127 corpus): 32-sample frames, exact BIGINT energies,
      // frames ≥ 20M merged gaps-and-islands into speech segments
      import s.implicits._
      val wavs = tbl(s, dir, "documents").select(col("doc_id"))
        .repartition(32).as[Long]
        .map { id =>
          val n = (128 + id % 64).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 4096) - 2048).toShort)
          (id, graft.sources.BinaryMedia.encodeWavPcm16(samples, 8000))
        }.toDF("doc_id", "wav")
      Multimodal.vadSegments(wavs, "doc_id", "wav", frameLen = 32,
          energyThreshold = 20000000L)
        .orderBy("id", "start_frame")
    }),

    "q238_benford" -> ((s, dir) =>
      // Benford first-digit audit of order totals — the synthetic-data /
      // fabricated-numbers smell test; digits from the exact cents
      // rendering, expectations as fixed 6 dp literals
      Profiling.benfordAudit(tbl(s, dir, "orders"),
          round(col("o_totalprice") * 100).cast("long"))
        .orderBy("digit")),

    "q239_link_prediction" -> ((s, dir) => {
      // common-neighbor/Jaccard link prediction over the q101 kNN graph:
      // the "should-be-neighbors" candidates that densify a kNN graph
      // before NN-descent; one shared-neighbor self-join, hub-capped
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val edges = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      GraphAnalytics.linkPrediction(edges, "id", "nbr_id", topN = 20)
    }),

    "q240_textrank" -> ((s, dir) =>
      // TextRank keyword centrality: the q136 fixed-point PageRank run on
      // the word co-occurrence graph (pairs within 2 tokens) instead of
      // the kNN doc graph — corpus stages shuffle by doc, the PR rounds
      // run on the bounded vocabulary graph
      GraphAnalytics.textRankKeywords(tbl(s, dir, "documents"),
          "doc_id", "text", coWindow = 2, iters = 3)
        .orderBy("rk")),

    "q241_skip_audit" -> ((s, dir) => {
      // min/max data-skipping audit: the SAME year-1997 predicate scans
      // ~every file under arrival order but prunes most under
      // sort-on-write — the quantified reason compaction (q82) sorts
      val o = tbl(s, dir, "orders")
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-12-31").cast("timestamp")
      val arrival = DataLayout.skipStats(o,
        expr("o_orderkey div 100"), col("o_orderdate"), lo, hi)
      val sorted = DataLayout.skipStats(
        o.withColumn("_rn",
          row_number().over(Window.orderBy("o_orderdate", "o_orderkey"))),
        expr("(_rn - 1) div 100"), col("o_orderdate"), lo, hi)
      DataLayout.skipSummary(Seq("arrival" -> arrival,
          "date_sorted" -> sorted))
        .orderBy("layout")
    }),

    "q242_quantile_norm" -> ((s, dir) =>
      // quantile normalization: each source's quality distribution maps
      // onto the global one (batch-effect correction before mixing
      // scorer outputs) — integer rank arithmetic into a 100-level
      // broadcast table
      Stats.quantileNormalize(
          tbl(s, dir, "documents")
            .withColumn("quality", TF.qualityScore(col("text"))),
          "source", "quality", "doc_id", levels = 100)
        .select(col("id").as("doc_id"), col("grp").as("source"),
          col("v").as("quality"), col("q_norm"))
        .orderBy("doc_id")),

    "q243_concurrency_peak" -> ((s, dir) =>
      // sweep-line peak concurrency over the q27 sessions: +1/−1
      // boundary events, running sum, earliest peak instant — the
      // connection-pool / rate-limit capacity number
      streaming.EventStreams.concurrencyPeak(
        streaming.EventStreams.sessionizeBatch(events(s, dir),
          gapMs = 1800000L))
        // NTZ at the edge: UTC session makes this an identity on values,
        // and the µs parquet encoding matches the oracle (q230 precedent)
        .withColumn("peak_at", col("peak_at").cast("timestamp_ntz"))),

    "q244_lift_table" -> ((s, dir) => {
      // cumulative-gains deciles of the hashed-bigram classifier against
      // the Gopher gate (the q158 pairing): per rank-decile positives and
      // the cumulative lift over random — the model-promotion curve
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), col("margin"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
      Evaluation.liftTable(scored, "doc_id", "margin", "quality_pass", 10)
        .orderBy("bucket")
    }),

    "q245_passage_agg" -> ((s, dir) =>
      // MaxP-style passage aggregation: q11's chunks score by exact
      // query-term counts (zero-shuffle HOF), docs score
      // best + 0.2·(sum − best), top-10 with the best-chunk pointer
      Retrieval.passageAggregate(
          Chunker.chunkWithIds(tbl(s, dir, "documents"), "doc_id", "text",
            200, 50),
          "doc_id", "chunk_id", "chunk",
          Seq("spark", "join", "merge"), decay = 0.2, k = 10)),

    "q246_cuped" -> ((s, dir) => {
      // CUPED-adjusted A/B readout on the q226 hash arms: pre-period
      // view count is the covariate, post-period purchase cents the
      // outcome — θ from exact sums, per-arm raw vs adjusted means
      val ev = events(s, dir)
      val cut = lit("2024-01-20").cast("timestamp")
      val pre = ev.filter(col("event_type") === "view" && col("ts") < cut)
        .groupBy("user_id").agg(count(lit(1)).as("x"))
      val out = ev.filter(col("event_type") === "purchase" &&
          col("ts") >= cut)
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      val joined = ev.select("user_id").distinct()
        .join(pre, Seq("user_id"), "left")
        .join(out, Seq("user_id"), "left")
        .select(col("user_id"), coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
        .withColumn("arm", Sketches.keyHash(col("user_id")) % 2 === 0)
      Stats.cupedAdjust(joined, "arm", "x", "y").orderBy("arm")
    }),

    "q247_bm25f" -> ((s, dir) => {
      // fielded BM25: the first 5 tokens act as a ×2-boosted title over
      // the body — weighted tf/dl fold BEFORE the one BM25 saturation,
      // same pushed-down term filter and decimal scoring as q98
      val toks = Retrieval.analyze(col("text"))
      val d = tbl(s, dir, "documents")
        .withColumn("title", array_join(slice(toks, 1, 5), " "))
        .withColumn("body",
          array_join(slice(toks, lit(6), greatest(size(toks) - 5, lit(0))),
            " "))
      Retrieval.bm25Fielded(d, "doc_id", Seq("title" -> 2, "body" -> 1),
        Seq("spark", "join", "vector", "window"), k = 10)
    }),

    "q248_lateness_audit" -> ((s, dir) =>
      // watermark sizing from the log itself: arrival order = event_id,
      // running-max event time, drop counts at 1 min / 10 min / 1 h
      // candidate delays — picks `withWatermark` empirically
      streaming.EventStreams.latenessAudit(events(s, dir),
          Seq(60000L, 600000L, 3600000L))
        .orderBy("delay_ms")),

    "q249_dp_counts" -> ((s, dir) =>
      // DP-style release counts per (source, lang): bounded two-sided
      // geometric noise drawn from the seeded keyHash uniform of the
      // group key fingerprint — pure BIGINT threshold compares, clamped
      // at zero; the perturb-side companion to the q218 k-anonymity gate
      Governance.dpNoisyCounts(tbl(s, dir, "documents"),
          Seq("source", "lang"))
        .orderBy("source", "lang")),

    "q250_sorted_neighborhood" -> ((s, dir) => {
      // sorted-neighborhood blocking: doc names + 2-char-deleted twins
      // rank by name, pair within a 4-rank window, verify by exact
      // Levenshtein ≤ 3 — the hash-block-complementary linkage path
      val d = tbl(s, dir, "documents")
      val base = d.select(col("doc_id").as("id"),
        expr("substring(text, 1, 40)").as("name"))
      val twins = d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("id"),
          concat(expr("substring(text, 1, 20)"),
            expr("substring(text, 23, 18)")).as("name"))
      Linkage.sortedNeighborhood(base.unionByName(twins), "id", "name",
          window = 4, maxDist = 3)
        .orderBy("id_a", "id_b")
    }),

    "q251_kaplan_meier" -> ((s, dir) => {
      // churn survival curve: per-user lifetime in whole hours (first →
      // last event), churn OBSERVED only when the user went quiet ≥ 12 h
      // before the log ends (else censored) — the product-limit estimate
      // plain retention means get wrong under censoring
      val per = events(s, dir).groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      val gmax = per.agg(max("t1").as("gm"))
      val life = per.crossJoin(broadcast(gmax))
        .select(expr("(t1 - t0) div 3600000000").as("t"),
          (col("t1") < col("gm") - lit(43200000000L)).as("observed"))
      Stats.kaplanMeier(life, "t", "observed").orderBy("t")
    }),

    "q252_cusum" -> ((s, dir) =>
      // CUSUM level-shift scan over daily event counts: exact BIGINT
      // scaled deviations T·cum − t·total, |peak| rows flagged — the
      // changepoint monitor that complements q152's EWMA smoothing
      Stats.cusumChangepoint(
          events(s, dir).groupBy(to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n_events")),
          "day", "n_events")
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
        .orderBy("day")),

    "q253_lagged_corr" -> ((s, dir) => {
      // lead/lag cross-correlation: daily view counts vs daily purchase
      // cents at lags −3..+3 — "do views drive purchases days later?";
      // 7 small date-shifted joins into the q111 exact-sum Pearson
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")).otherwise(0L))
            .as("y"))
      val pairs = (-3 to 3).map { l =>
        daily.select(col("day"), col("x"))
          .join(daily.select(date_sub(col("day"), l).as("day"), col("y")),
            "day")
          .select(lit(l).as("lag"), col("x"), col("y"))
      }.reduce(_ unionByName _)
      Stats.groupCorrelation(pairs, "lag", "x", "y").orderBy("lag")
    }),

    "q254_line_dedup" -> ((s, dir) => {
      // corpus-wide exact line dedup (C4/RefinedWeb): q99's 12-token
      // pseudo-lines over docs + full twins of every 3rd doc — only the
      // first (doc, idx) occurrence of a line survives; docs reassemble
      // from survivors, content pinned by the rolling fingerprint
      val d0 = tbl(s, dir, "documents")
      val corpus = d0.select(col("doc_id"), col("text")).unionByName(
        d0.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      val withLines = corpus
        .withColumn("_toks", TextQuality.tokens(col("text")))
        .withColumn("lines", TextQuality.tokenLines("_toks", 12))
      TextQuality.globalLineDedup(withLines, "doc_id", "lines")
        .orderBy("id")
    }),

    "q255_zorder_skipping" -> ((s, dir) => {
      // the q76/q241 synthesis: the SAME 2-D box predicate against
      // 200-row files cut by (x, y) lexicographic sort vs z-value sort —
      // zone maps on both dims; z-order prunes on BOTH axes where the
      // lexicographic layout only prunes on the leading column
      val li = tbl(s, dir, "lineitem").select(
        (col("l_partkey") % 1024).as("px"),
        (col("l_suppkey") % 1024).as("sy"),
        col("l_orderkey"), col("l_linenumber"))
      val (loX, hiX, loY, hiY) =
        (lit(100L), lit(199L), lit(300L), lit(399L))
      def stats(ordered: DataFrame) = DataLayout.skipStats2D(
        ordered, expr("(_rn - 1) div 200"), col("px"), col("sy"),
        loX, hiX, loY, hiY)
      val lex = stats(li.withColumn("_rn", row_number().over(
        Window.orderBy("px", "sy", "l_orderkey", "l_linenumber"))))
      val zord = stats(li
        .withColumn("zv", DataLayout.zValue2(col("px"), col("sy"), 10))
        .withColumn("_rn", row_number().over(
          Window.orderBy("zv", "l_orderkey", "l_linenumber"))))
      DataLayout.skipSummary(Seq("x_then_y" -> lex, "zorder" -> zord))
        .orderBy("layout")
    }),

    "q256_ltr_features" -> ((s, dir) => {
      // learning-to-rank feature extraction: the q98 BM25 top-20
      // candidates joined with dense (query cosine distance), prior
      // (quality score) and shape (length) features — the feature-join
      // step between first-stage retrieval and a reranker
      graft.plans.VectorExpressions.register(s)
      val d = tbl(s, dir, "documents")
      val q0 = Seq("spark", "join", "vector", "window")
      val cands = Retrieval.bm25(d, "doc_id", "text", q0, 20)
        .select(col("id").as("doc_id"), col("score").as("bm25"),
          col("n_matched"))
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val dense = e.select(col("vec_id").as("doc_id"),
        round(call_function("graft_cosine_distance", col("embedding"),
          array(qv.map(v => lit(v)): _*)), 6).as("cos_dist"))
      val prior = d.select(col("doc_id"),
        TF.qualityScore(col("text")).as("quality"),
        length(col("text")).as("text_len"))
      cands.join(prior, "doc_id")
        .join(dense, Seq("doc_id"), "left")
        .orderBy(col("bm25").desc, col("doc_id"))
    }),

    "q257_nextevent_eval" -> ((s, dir) => {
      // next-event prediction baseline with a TEMPORAL holdout: each
      // user's final transition is held out, the q187-style transition
      // counts train on everything else, prediction = argmax count from
      // the held-out prev state (ties → lexicographic) — the accuracy
      // floor any sequence model must beat
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val seq0 = events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("nxt", lead("event_type", 1).over(w))
        .withColumn("rnd", row_number().over(wd))
        .filter(col("nxt").isNotNull)
      val held = seq0.filter(col("rnd") === 2)
        .select(col("user_id"), col("event_type").as("prev"),
          col("nxt").as("actual"))
      val train = seq0.filter(col("rnd") =!= 2)
        .groupBy(col("event_type").as("prev"), col("nxt").as("cand"))
        .agg(count(lit(1)).as("cnt"))
      val pred = held.join(broadcast(train), Seq("prev"), "left")
        .withColumn("cand", coalesce(col("cand"), lit("")))
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .groupBy("user_id", "actual")
        .agg(min_by(col("cand"),
          struct((-col("cnt")).as("nc"), col("cand"))).as("pred"))
      pred.agg(count(lit(1)).as("n_users"),
        sum(when(col("pred") === col("actual"), 1L).otherwise(0L))
          .as("n_correct"),
        (sum(when(col("pred") === col("actual"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("accuracy"))
    }),

    "q258_policy_replay" -> ((s, dir) => {
      // counterfactual policy evaluation: π(user-segment) = the action
      // with the best mean cents BEFORE Jan 20; uniform-propensity IPS
      // replay of the post-cutoff log estimates its value per segment —
      // the offline gate before an online A/B (q226/q246's third leg)
      val ev = events(s, dir)
        .withColumn("ctx", col("user_id") % 4)
        .withColumn("cents",
          coalesce(round(col("value") * 100).cast("long"), lit(0L)))
      val cut = lit("2024-01-20").cast("timestamp")
      Evaluation.ipsPolicyEval(
          ev.filter(col("ts") < cut), ev.filter(col("ts") >= cut),
          "ctx", "event_type", "cents")
        .orderBy("ctx")
    }),

    "q259_embedding_qa" -> ((s, dir) => {
      // embedding-store QA per label: vector counts, zero-norm
      // degenerates, and the norm distribution (min/max/mean) — the
      // ingest gate before any ANN index build; each norm is a FIXED
      // left-fold sqrt(Σx²) (replayed by list_reduce), means decimal-sum
      val dsum18 = (c: Column) => sum(c.cast("decimal(38,18)")).cast("double")
      val n2 = expr("aggregate(embedding, cast(0.0 as double), " +
        "(a, x) -> a + cast(x as double) * cast(x as double))")
      val withNorm = tbl(s, dir, "embeddings")
        .select(col("label"), sqrt(n2).as("_norm"))
      withNorm.groupBy("label").agg(
          count(lit(1)).as("n_vectors"),
          sum(when(col("_norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
          round(min("_norm"), 6).as("min_norm"),
          round(max("_norm"), 6).as("max_norm"),
          round(dsum18(col("_norm")) / count(lit(1)), 6).as("mean_norm"))
        .orderBy("label")
    }),

    "q260_dim_variance" -> ((s, dir) =>
      // dead-dimension screen: per-dimension mean/variance from exact
      // decimal sums — near-constant dims flag wasted index bytes and
      // break PQ sub-space training (q124's input QA)
      tbl(s, dir, "embeddings")
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .withColumn("x", col("x").cast("double"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          round(sum(col("x").cast("decimal(38,18)")).cast("double") /
            count(lit(1)), 6).as("mean"),
          round((sum((col("x") * col("x")).cast("decimal(38,18)"))
              .cast("double") -
            sum(col("x").cast("decimal(38,18)")).cast("double") *
              sum(col("x").cast("decimal(38,18)")).cast("double") /
              count(lit(1))) / count(lit(1)), 6).as("variance"))
        .orderBy("dim")),

    "q261_gap_percentiles" -> ((s, dir) => {
      // inter-event gap percentiles (exact lower-rank p50/p90/p99 in
      // µs) — the empirical basis for the q27 session gap and the q248
      // watermark delay, instead of folklore 30-minute constants
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val g = events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn("prev", lag("ts_us", 1).over(w))
        .filter(col("prev").isNotNull)
        .select((col("ts_us") - col("prev")).as("gap_us"))
      val n = g.agg(count(lit(1)).as("n"))
      val ranked = g.withColumn("r",
        row_number().over(Window.orderBy("gap_us")).cast("long"))
      Seq(50, 90, 99).map { p =>
        ranked.crossJoin(broadcast(n))
          .filter(col("r") === greatest(lit(1L), expr(s"($p * n) div 100")))
          .select(lit(p).as("pct"), col("gap_us"), col("n").as("n_gaps"))
      }.reduce(_ unionByName _).orderBy("pct")
    }),

    "q262_backlog_curve" -> ((s, dir) => {
      // monthly order-backlog curve: an order is open from o_orderdate
      // until its last line ships; open-at-month-start = started in
      // earlier months − closed in earlier months, all integer cumsums
      // over the bounded month table (the q243 sweep at month grain)
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("start_d"))
      val closes = tbl(s, dir, "lineitem").groupBy("l_orderkey")
        .agg(max(to_date(col("l_shipdate"))).as("close_d"))
      val iv = o.join(closes, col("o_orderkey") === col("l_orderkey"))
      val sm = iv.groupBy(trunc(col("start_d"), "month").as("m"))
        .agg(count(lit(1)).as("n_started"))
      val cm = iv.groupBy(trunc(col("close_d"), "month").as("m"))
        .agg(count(lit(1)).as("n_closed"))
      val w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
      sm.select("m").unionByName(cm.select("m")).distinct()
        .join(sm, Seq("m"), "left").join(cm, Seq("m"), "left")
        .select(col("m"),
          coalesce(col("n_started"), lit(0L)).as("n_started"),
          coalesce(col("n_closed"), lit(0L)).as("n_closed"))
        .withColumn("open_at_month_start",
          coalesce(sum("n_started").over(w), lit(0L)) -
            coalesce(sum("n_closed").over(w), lit(0L)))
        .select(date_format(col("m"), "yyyy-MM").as("month"),
          col("n_started"), col("n_closed"), col("open_at_month_start"))
        .orderBy("month")
    }),

    "q263_abc_classes" -> ((s, dir) => {
      // ABC/Pareto inventory classes: parts ranked by revenue, class A
      // covers the first 80% of cumulative cents, B to 95%, C the tail —
      // all-integer threshold compares (cum·100 vs tot·80), one window
      val rev = tbl(s, dir, "lineitem").groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val tot = rev.agg(sum("cents").as("_tot"))
      val w = Window.orderBy(col("cents").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.crossJoin(broadcast(tot))
        .withColumn("_cum", sum("cents").over(w))
        .withColumn("cls",
          when(col("_cum") * 100 <= col("_tot") * 80, "A")
            .when(col("_cum") * 100 <= col("_tot") * 95, "B")
            .otherwise("C"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"), sum("cents").as("revenue_cents"),
          (sum("cents").cast("double") / max("_tot")).as("revenue_share"))
        .orderBy("cls")
    }),

    "q264_cohort_ltv" -> ((s, dir) => {
      // cohort LTV curve: cumulative purchase cents per signup-week
      // cohort by weeks-since-signup (the revenue twin of q107's
      // retention matrix); exact integer cumsums per cohort
      val ev = events(s, dir).select(col("user_id"), col("event_type"),
        col("value"),
        expr("cast(datediff(cast(ts as date), date'1970-01-01') div 7 " +
          "as int)").as("wk"))
      val cohort = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("wk") - col("cohort_week"))
          .as("week_offset"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val w = Window.partitionBy("cohort_week").orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum_cents", sum("cents").over(w))
        .orderBy("cohort_week", "week_offset")
    }),

    "q265_dup_payments" -> ((s, dir) => {
      // duplicate-payment flags: same user, same dollar amount, within
      // 24 h of the previous occurrence — one window over
      // (user, dollars), the classic sparse fraud rule
      val p = events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("cast(round(value * 100) as bigint) div 100").as("dollars"),
          unix_micros(col("ts")).as("tu"))
      val w = Window.partitionBy("user_id", "dollars")
        .orderBy(col("tu"), col("event_id"))
      p.withColumn("gap_us", col("tu") - lag("tu", 1).over(w))
        .filter(col("gap_us").isNotNull &&
          col("gap_us") <= 86400000000L)
        .select(col("user_id"), col("event_id"), col("dollars"),
          col("gap_us"))
        .orderBy("user_id", "event_id")
    }),

    "q266_rfm_segments" -> ((s, dir) => {
      // RFM segmentation: per purchasing user the recency / frequency /
      // monetary quintile codes (5 = best, exact ceil-rank arithmetic,
      // ties → user_id), rolled up per segment — the classic customer
      // grid, all-integer
      val p = events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("tu"),
          round(col("value") * 100).cast("long").as("cents"))
      val per = p.groupBy("user_id").agg(max("tu").as("last_tu"),
        count(lit(1)).as("freq"), sum("cents").as("monetary"))
      val n = per.agg(count(lit(1)).as("n"))
      val coded = per.crossJoin(broadcast(n))
        .withColumn("_r_r", row_number().over(
          Window.orderBy(col("last_tu"), col("user_id"))).cast("long"))
        .withColumn("_r_f", row_number().over(
          Window.orderBy(col("freq"), col("user_id"))).cast("long"))
        .withColumn("_r_m", row_number().over(
          Window.orderBy(col("monetary"), col("user_id"))).cast("long"))
        .select(col("monetary"),
          expr("(5 * _r_r + n - 1) div n").as("r_code"),
          expr("(5 * _r_f + n - 1) div n").as("f_code"),
          expr("(5 * _r_m + n - 1) div n").as("m_code"))
      coded.groupBy("r_code", "f_code", "m_code")
        .agg(count(lit(1)).as("n_users"),
          sum("monetary").as("cents"),
          (sum("monetary").cast("double") / count(lit(1)))
            .as("mean_cents"))
        .orderBy("r_code", "f_code", "m_code")
    }),

    "q267_cycle_time" -> ((s, dir) => {
      // order cycle-time percentiles per priority: orderdate → last
      // line shipped, exact lower-rank p50/p90 WITHIN each priority
      // (the q261 selection per group)
      val cyc = tbl(s, dir, "orders")
        .join(tbl(s, dir, "lineitem").groupBy("l_orderkey")
          .agg(max(to_date(col("l_shipdate"))).as("last_ship")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderpriority").as("priority"), col("o_orderkey"),
          datediff(col("last_ship"), to_date(col("o_orderdate")))
            .as("cycle_days"))
      val wg = Window.partitionBy("priority")
        .orderBy(col("cycle_days"), col("o_orderkey"))
      val ranked = cyc
        .withColumn("r", row_number().over(wg).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("priority")))
      Seq(50, 90).map { pq =>
        ranked.filter(col("r") ===
            greatest(lit(1L), expr(s"($pq * n) div 100")))
          .select(col("priority"), lit(pq).as("pct"), col("cycle_days"),
            col("n").as("n_orders"))
      }.reduce(_ unionByName _).orderBy("priority", "pct")
    }),

    "q268_dow_seasonality" -> ((s, dir) => {
      // day-of-week seasonality index: per ISO weekday the event volume
      // vs the all-days mean — index = n_dow · n_days / (total · d_days),
      // exact ints into one double division
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dow", weekday(col("day")) + 1)
      val tot = daily.agg(sum("n").as("_tn"), count(lit(1)).as("_td"))
      daily.groupBy("dow")
        .agg(sum("n").as("n_events"), count(lit(1)).as("n_days"))
        .crossJoin(broadcast(tot))
        .withColumn("index",
          (col("n_events") * col("_td")).cast("double") /
            (col("_tn") * col("n_days")))
        .select("dow", "n_events", "n_days", "index")
        .orderBy("dow")
    }),

    "q269_basket_lift" -> ((s, dir) => {
      // event-type co-occurrence lift within user-day baskets:
      // lift = n_ab·N / (n_a·n_b) over distinct (user, day, type) sets —
      // the unordered companion to q187's ordered transitions
      val basket = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"))
        .distinct()
      val nb = basket.select("user_id", "day").distinct()
        .agg(count(lit(1)).as("_N"))
      val single = basket.groupBy("event_type")
        .agg(count(lit(1)).as("n_one"))
      val pairs = basket.select(col("user_id"), col("day"),
          col("event_type").as("a"))
        .join(basket.select(col("user_id"), col("day"),
          col("event_type").as("b")), Seq("user_id", "day"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(single.select(col("event_type").as("a"),
          col("n_one").as("n_a"))), "a")
        .join(broadcast(single.select(col("event_type").as("b"),
          col("n_one").as("n_b"))), "b")
        .crossJoin(broadcast(nb))
        .withColumn("lift", (col("n_both") * col("_N")).cast("double") /
          (col("n_a") * col("n_b")))
        .select("a", "b", "n_both", "lift")
        .orderBy("a", "b")
    }),

    "q270_order_regularity" -> ((s, dir) => {
      // purchase-rhythm audit: coefficient of variation of a customer's
      // inter-order gaps (≥ 5 orders) — clumpy vs metronomic buyers;
      // exact gap sums, one fixed sqrt/division tree, 20 most regular
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      val gaps = tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"))
        .withColumn("gap", datediff(col("d"), lag("d", 1).over(w)))
        .filter(col("gap").isNotNull)
        .select(col("o_custkey"), col("gap").cast("long").as("gap"))
      gaps.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_gaps"), sum("gap").as("_sx"),
          sum(col("gap") * col("gap")).as("_sxx"))
        .filter(col("n_gaps") >= 4) // ≥5 orders
        .withColumn("mean_gap",
          col("_sx").cast("double") / col("n_gaps"))
        .withColumn("cv", round(
          sqrt((col("_sxx").cast("double") -
            col("_sx").cast("double") * col("_sx").cast("double") /
              col("n_gaps")) / col("n_gaps")) /
            (col("_sx").cast("double") / col("n_gaps")), 6))
        .select(col("o_custkey"), col("n_gaps"),
          round(col("mean_gap"), 6).as("mean_gap"), col("cv"))
        .orderBy(col("cv"), col("o_custkey")).limit(20)
    }),

    "q271_discount_elasticity" -> ((s, dir) =>
      // does a deeper discount move more units? exact-decimal Pearson
      // of (discount, quantity) per brand — the q111 machinery on the
      // lineitem ⋈ broadcast part join
      Stats.groupCorrelation(
          tbl(s, dir, "lineitem")
            .join(broadcast(tbl(s, dir, "part")
              .select(col("p_partkey"), col("p_brand"))),
              col("l_partkey") === col("p_partkey")),
          "p_brand", "l_discount", "l_quantity")
        .orderBy("p_brand")),

    "q272_capture_recapture" -> ((s, dir) => {
      // Lincoln–Petersen population estimate: users active in week 1 vs
      // week 2 as two "captures" — N̂ = n1·n2/m estimates the TOTAL user
      // base incl. never-seen users; exact counts, one double division
      val ev = events(s, dir).select(col("user_id"),
        expr("cast(datediff(cast(ts as date), date'1970-01-01') div 7 " +
          "as int)").as("wk"))
      val w0 = ev.agg(min("wk").as("_w0"))
      val tagged = ev.crossJoin(broadcast(w0))
      val s1 = tagged.filter(col("wk") === col("_w0"))
        .select("user_id").distinct()
      val s2 = tagged.filter(col("wk") === col("_w0") + 1)
        .select("user_id").distinct()
      val n1 = s1.agg(count(lit(1)).as("n1"))
      val n2 = s2.agg(count(lit(1)).as("n2"))
      val m = s1.join(s2, "user_id").agg(count(lit(1)).as("m"))
      n1.crossJoin(n2).crossJoin(m)
        .withColumn("n_hat", when(col("m") > 0,
          (col("n1") * col("n2")).cast("double") / col("m")))
    }),

    "q273_forward_fill" -> ((s, dir) => {
      // calendar-spine forward fill: a full day spine (sequence between
      // min and max day) left-joined to sparse daily purchase revenue,
      // gaps carried forward by last(ignoreNulls) — the LOCF gap-fill
      // every daily-reporting pipeline needs
      val daily = events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val span = events(s, dir).agg(
        to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
      val spine = span.select(
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("day"), "left")
        .withColumn("filled_cents",
          coalesce(last("cents", ignoreNulls = true).over(w), lit(0L)))
        .withColumn("is_observed", col("cents").isNotNull)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("cents"), col("filled_cents"), col("is_observed"))
        .orderBy("day")
    }),

    "q274_longest_streak" -> ((s, dir) => {
      // longest consecutive-day activity streak per user (gaps-and-
      // islands on the day grid): day − dense-rank is constant within a
      // run; top-20 streaks, ties → earliest start, then user
      val days = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days
        .withColumn("_rn", row_number().over(w))
        .withColumn("_isl", expr("date_sub(day, _rn)"))
        .groupBy("user_id", "_isl")
        .agg(count(lit(1)).as("streak_days"),
          min("day").as("streak_start"))
        .select(col("user_id"), col("streak_days"),
          date_format(col("streak_start"), "yyyy-MM-dd")
            .as("streak_start"))
        .orderBy(col("streak_days").desc, col("streak_start"),
          col("user_id"))
        .limit(20)
    }),

    "q275_assortativity" -> ((s, dir) => {
      // degree assortativity of the q101 kNN graph: exact-decimal
      // Pearson of (deg(src), deg(dst)) over undirected edge endpoints —
      // do hubs link to hubs? (negative on healthy kNN graphs: hubs
      // absorb low-degree spokes; complements q194's hubness histogram)
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val und = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
        .filter(col("id") =!= col("nbr_id"))
        .select(least(col("id"), col("nbr_id")).as("a"),
          greatest(col("id"), col("nbr_id")).as("b"))
        .distinct()
      val nbrs = und.select(col("a").as("v"), col("b").as("n"))
        .union(und.select(col("b").as("v"), col("a").as("n")))
      val deg = nbrs.groupBy("v").agg(count(lit(1)).as("deg"))
      val ends = nbrs
        .join(deg.select(col("v"), col("deg").as("dx")), "v")
        .join(deg.select(col("v").as("n"), col("deg").as("dy")), "n")
        .select(lit("knn").as("g"), col("dx"), col("dy"))
      Stats.groupCorrelation(ends, "g", "dx", "dy")
        .select(col("n"), col("corr").as("assortativity"))
    }),

    "q276_term_burstiness" -> ((s, dir) => {
      // Church–Gale term burstiness: cf/df — the mean occurrences per
      // CONTAINING doc; function words sit near 1, topical/template
      // terms burst; top-20 bursty terms at df ≥ 5 from the q97 index
      Retrieval.invertedIndex(tbl(s, dir, "documents"), "doc_id", "text")
        .filter(col("df") >= 5)
        .select(col("term"), col("df"), col("cf"),
          (col("cf").cast("double") / col("df")).as("burstiness"))
        .orderBy(col("burstiness").desc, col("term"))
        .limit(20)
    }),

    "q277_edge_embeddedness" -> ((s, dir) => {
      // edge embeddedness histogram of the q101 kNN graph: per edge the
      // common-neighbor count (0 = bridge, high = deeply embedded) — the
      // tie-strength signal that decides which near-dup edges to TRUST
      // when clustering; one shared-neighbor join scoped to edges
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val und = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
        .filter(col("id") =!= col("nbr_id"))
        .select(least(col("id"), col("nbr_id")).as("a"),
          greatest(col("id"), col("nbr_id")).as("b"))
        .distinct()
      val nbrs = und.select(col("a").as("v"), col("b").as("n"))
        .union(und.select(col("b").as("v"), col("a").as("n")))
      val cn = und
        .join(nbrs.select(col("v").as("a"), col("n").as("w1")), Seq("a"))
        .join(nbrs.select(col("v").as("b"), col("n").as("w2")), Seq("b"))
        .filter(col("w1") === col("w2") &&
          col("w1") =!= col("a") && col("w1") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cn"))
      und.join(cn, Seq("a", "b"), "left")
        .select(coalesce(col("cn"), lit(0L)).as("embeddedness"))
        .groupBy("embeddedness").agg(count(lit(1)).as("n_edges"))
        .orderBy("embeddedness")
    }),

    "q278_result_diversity" -> ((s, dir) => {
      // redundancy audit of a result list: mean pairwise cosine distance
      // of the q17 top-8 — the number MMR (q19) exists to raise; k·(k−1)/2
      // literal-free pairs over a broadcast-sized list, decimal-summed
      graft.plans.VectorExpressions.register(s)
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val top = Similarity.topK(e, "embedding", qv, 8, "COSINE", "vec_id")
        .select(col("vec_id"), col("embedding"))
      val pairs = top.select(col("vec_id").as("ida"),
          col("embedding").as("va"))
        .crossJoin(top.select(col("vec_id").as("idb"),
          col("embedding").as("vb")))
        .filter(col("ida") < col("idb"))
        .select(round(call_function("graft_cosine_distance", col("va"),
          col("vb")), 6).as("d"))
      pairs.agg(count(lit(1)).as("n_pairs"),
        round(sum(col("d").cast("decimal(38,18)")).cast("double") /
          count(lit(1)), 6).as("mean_pairwise_distance"))
    }),

    "q279_fill_rate" -> ((s, dir) =>
      // monthly fill rate: share of lines shipped within 30 days of the
      // order date — the fulfilment SLA ratio, exact integer counts
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_format(to_date(col("o_orderdate")), "yyyy-MM")
          .as("month"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))) <= 30, 1L).otherwise(0L))
            .as("n_within_30d"))
        .withColumn("fill_rate",
          col("n_within_30d").cast("double") / col("n_lines"))
        .orderBy("month"))
    ,

    "q280_error_wilson" -> ((s, dir) => {
      // hourly error-rate monitor with Wilson 95% bounds — the interval
      // that behaves at small n where ±1.96√(p̂q̂/n) fails; z is a fixed
      // literal, the whole bound is one deterministic double tree over
      // exact counts
      val z = 1.96
      val hourly = events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("errs"))
      val p = col("errs").cast("double") / col("n")
      val denom = lit(1.0) + lit(z * z) / col("n")
      val center = p + lit(z * z) / (lit(2.0) * col("n"))
      val margin = lit(z) * sqrt(
        (p * (lit(1.0) - p) + lit(z * z) / (lit(4.0) * col("n"))) /
          col("n"))
      // clamp at 0: the Wilson lower bound is mathematically >= 0, and
      // the clamp kills the -0.0-vs-+0.0 round() canonicalization split
      // between DuckDB and Spark when center-margin ~ -1e-17
      hourly
        .withColumn("err_rate", round(p, 6))
        .withColumn("wilson_lo",
          round(greatest(lit(0.0), (center - margin) / denom), 6))
        .withColumn("wilson_hi", round((center + margin) / denom, 6))
        .orderBy("hour")
    }),

    "q281_uplift_deciles" -> ((s, dir) => {
      // qini-lite uplift readout: users deciled by pre-period activity
      // (exact ceil-rank), per decile the treated-vs-control outcome
      // means and their difference — does the "treatment" arm help the
      // heavy or the light users? (q226/q246's segmentation leg)
      val ev = events(s, dir)
      val cut = lit("2024-01-20").cast("timestamp")
      val pre = ev.filter(col("event_type") === "view" && col("ts") < cut)
        .groupBy("user_id").agg(count(lit(1)).as("x"))
      val out = ev.filter(col("event_type") === "purchase" &&
          col("ts") >= cut)
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      val base = ev.select("user_id").distinct()
        .join(pre, Seq("user_id"), "left")
        .join(out, Seq("user_id"), "left")
        .select(col("user_id"), coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
        .withColumn("treated", Sketches.keyHash(col("user_id")) % 2 === 0)
      val n = base.agg(count(lit(1)).as("n"))
      base.crossJoin(broadcast(n))
        .withColumn("_r", row_number().over(
          Window.orderBy(col("x"), col("user_id"))).cast("long"))
        .withColumn("decile", expr("(10 * _r + n - 1) div n"))
        .groupBy("decile")
        .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("n_treated"),
          sum(when(!col("treated"), 1L).otherwise(0L)).as("n_control"),
          // a tiny-SF decile can be single-armed: NULL mean, not ÷0
          when(sum(when(col("treated"), 1L).otherwise(0L)) > 0,
            sum(when(col("treated"), col("y")).otherwise(0L)).cast("double")
              / sum(when(col("treated"), 1L).otherwise(0L)))
            .as("mean_treated"),
          when(sum(when(!col("treated"), 1L).otherwise(0L)) > 0,
            sum(when(!col("treated"), col("y")).otherwise(0L)).cast("double")
              / sum(when(!col("treated"), 1L).otherwise(0L)))
            .as("mean_control"))
        .withColumn("uplift", col("mean_treated") - col("mean_control"))
        .orderBy("decile")
    }),

    "q282_power_table" -> ((s, dir) => {
      // sample-size table for the purchase-cents metric: n per arm =
      // 2(z_α/2+z_β)²σ²/δ² at 95%/80% (fixed z literals) for a grid of
      // minimum detectable effects — σ² from exact per-user sums; the
      // "how long must the test run" planning readout
      val perUser = events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      val stats = perUser.agg(count(lit(1)).as("n"),
        sum("y").as("sy"), sum(col("y") * col("y")).as("syy"))
      val varY = (col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double") / col("n")) /
        col("n")
      val zsum2 = (1.959964 + 0.841621) * (1.959964 + 0.841621)
      Seq(500L, 1000L, 2000L, 5000L).map { mde =>
        stats.select(lit(mde).as("mde_cents"), col("n").as("n_users"),
          round(varY, 6).as("var_cents"),
          round(lit(2.0 * zsum2) * varY / lit((mde * mde).toDouble), 2)
            .as("n_per_arm"))
      }.reduce(_ unionByName _).orderBy("mde_cents")
    }),

    "q283_srm_check" -> ((s, dir) => {
      // sample-ratio-mismatch guardrail for the q226 hash split: χ²
      // against the expected 50/50 with the exact-int numerator
      // (2·n_a − n)² / n — a big χ² means the bucketing is broken and
      // every downstream readout is suspect
      val arms = events(s, dir).select("user_id").distinct()
        .withColumn("treated", Sketches.keyHash(col("user_id")) % 2 === 0)
      arms.agg(
          sum(when(col("treated"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("treated"), 1L).otherwise(0L)).as("n_b"))
        .withColumn("n", col("n_a") + col("n_b"))
        .withColumn("chi2", round(
          ((lit(2L) * col("n_a") - col("n")) *
            (lit(2L) * col("n_a") - col("n"))).cast("double") / col("n"),
          6))
        .withColumn("srm_suspect", col("chi2") > 3.841459)
        .select("n_a", "n_b", "n", "chi2", "srm_suspect")
    }),

    "q284_dau_mau" -> ((s, dir) => {
      // stickiness: mean daily active users over monthly active users
      // per calendar month — exact integer sums into one division
      val ev = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .withColumn("month", date_format(col("day"), "yyyy-MM"))
      val dau = ev.select("user_id", "day", "month").distinct()
        .groupBy("month", "day").agg(count(lit(1)).as("dau"))
        .groupBy("month").agg(sum("dau").as("dau_sum"),
          count(lit(1)).as("n_days"))
      val mau = ev.select("user_id", "month").distinct()
        .groupBy("month").agg(count(lit(1)).as("mau"))
      dau.join(mau, "month")
        .withColumn("stickiness",
          col("dau_sum").cast("double") / (col("n_days") * col("mau")))
        .orderBy("month")
    }),

    "q285_hhi_trend" -> ((s, dir) =>
      // supplier-concentration drift: monthly HHI of revenue shares —
      // Σ cents² / (Σ cents)², exact-int numerators per month; a rising
      // HHI means consolidation (q171's Gini, but trended)
      tbl(s, dir, "lineitem")
        .groupBy(date_format(to_date(col("l_shipdate")), "yyyy-MM")
          .as("month"), col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_suppliers"),
          // 128-bit-safe: share sums square past Long range at scale
          (sum(col("cents").cast("decimal(38,0)") *
              col("cents").cast("decimal(38,0)")).cast("double") /
            (sum("cents").cast("decimal(38,0)") *
              sum("cents").cast("decimal(38,0)")).cast("double"))
            .as("hhi"))
        .orderBy("month")),

    "q286_growth_accounting" -> ((s, dir) => {
      // weekly user growth accounting: new / retained / resurrected
      // active counts + churned-from-last-week — the canonical growth
      // state machine from first-week and previous-active-week lags
      val wk = expr("cast(datediff(cast(ts as date), date'1970-01-01') " +
        "div 7 as int)")
      val uw = events(s, dir).select(col("user_id"), wk.as("wk")).distinct()
      val w = Window.partitionBy("user_id").orderBy("wk")
      val tagged = uw
        .withColumn("first_wk", min("wk").over(
          Window.partitionBy("user_id")))
        .withColumn("prev_wk", lag("wk", 1).over(w))
        .withColumn("state",
          when(col("wk") === col("first_wk"), "new")
            .when(col("prev_wk") === col("wk") - 1, "retained")
            .otherwise("resurrected"))
      val active = tagged.groupBy("wk").agg(
        sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        count(lit(1)).as("n_active"))
      // churned out of week w = active in w-1 but not in w
      val churn = uw.select(col("user_id"), (col("wk") + 1).as("wk"))
        .join(uw, Seq("user_id", "wk"), "left_anti")
        .groupBy("wk").agg(count(lit(1)).as("n_churned"))
      active.join(churn, Seq("wk"), "left")
        .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
        .orderBy("wk")
    }),

    "q287_eb_shrinkage" -> ((s, dir) => {
      // empirical-Bayes shrunk hourly error rates: (errs + m·K)/(n + K)
      // with prior strength K = 20 pulls small-sample hours toward the
      // global mean m — the ranking-safe companion to q280's Wilson
      // bounds (raw rates over-rank tiny hours; shrunk rates don't)
      val hourly = events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("errs"))
      val glob = hourly.agg(sum("errs").as("_te"), sum("n").as("_tn"))
      hourly.crossJoin(broadcast(glob))
        .withColumn("raw_rate", round(col("errs").cast("double") /
          col("n"), 6))
        .withColumn("shrunk_rate", round(
          (col("errs").cast("double") +
            col("_te").cast("double") / col("_tn") * lit(20.0)) /
            (col("n").cast("double") + lit(20.0)), 6))
        .select("hour", "n", "errs", "raw_rate", "shrunk_rate")
        .orderBy("hour")
    }),

    "q288_load_factor" -> ((s, dir) =>
      // capacity planning: per day the peak-hour load vs the mean
      // hourly load (load factor = peak·24/total) — exact integers
      // into one division
      events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
        .groupBy("day")
        .agg(sum("n").as("n_events"), max("n").as("peak_hour_n"),
          count(lit(1)).as("n_hours"))
        .withColumn("load_factor",
          (col("peak_hour_n") * col("n_hours")).cast("double") /
            col("n_events"))
        .orderBy("day")),

    "q289_ratio_to_parent" -> ((s, dir) =>
      // ratio-to-parent: each nation's revenue share WITHIN its region
      // plus the region's share of the world — two window sums over the
      // q03-style broadcast-dim join, exact cents
      tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(tbl(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
        .withColumn("region_cents",
          sum("cents").over(Window.partitionBy("r_name")))
        .withColumn("world_cents", sum("cents").over(Window.partitionBy()))
        .select(col("r_name"), col("n_name"), col("cents"),
          (col("cents").cast("double") / col("region_cents"))
            .as("share_of_region"),
          (col("region_cents").cast("double") / col("world_cents"))
            .as("region_share_of_world"))
        .orderBy("r_name", "n_name")),

    "q290_prefix_completions" -> ((s, dir) =>
      // autocomplete table: top-3 completions per 2-char prefix by
      // collection frequency — the SECOND consumer of the native
      // graft_top_k bounded-heap aggregate (ties → term asc)
      graft.plans.TopKAggregate.topKRows(
          Retrieval.invertedIndex(tbl(s, dir, "documents"), "doc_id",
              "text")
            .filter(length(col("term")) >= 2)
            .withColumn("prefix", substring(col("term"), 1, 2)),
          Seq("prefix"),
          Seq((-col("cf")).as("ncf"), col("term").as("term")), Nil, k = 3)
        .select(col("prefix"), col("term"), (-col("ncf")).as("cf"))
        .orderBy(col("prefix"), col("cf").desc, col("term"))),

    "q291_brand_cross_sell" -> ((s, dir) => {
      // brand cross-sell lift over ORDER baskets (q269's shape on the
      // sales tables): distinct brands per order, pair lift =
      // n_ab·N/(n_a·n_b); top-20 lifted pairs
      val basket = tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand")).distinct()
      val nOrders = basket.select("ok").distinct()
        .agg(count(lit(1)).as("_N"))
      val single = basket.groupBy("p_brand").agg(count(lit(1)).as("n_one"))
      basket.select(col("ok"), col("p_brand").as("a"))
        .join(basket.select(col("ok"), col("p_brand").as("b")), "ok")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_both"))
        .join(broadcast(single.select(col("p_brand").as("a"),
          col("n_one").as("n_a"))), "a")
        .join(broadcast(single.select(col("p_brand").as("b"),
          col("n_one").as("n_b"))), "b")
        .crossJoin(broadcast(nOrders))
        .withColumn("lift", (col("n_both") * col("_N")).cast("double") /
          (col("n_a") * col("n_b")))
        .select("a", "b", "n_both", "lift")
        .orderBy(col("lift").desc, col("a"), col("b")).limit(20)
    }),

    "q292_freshness_sla" -> ((s, dir) => {
      // per-day p95 arrival lag (event time vs the arrival-order
      // high-water mark, the q248 lateness signal) — exact lower-rank
      // selection per day; the freshness-SLA dashboard number
      val w = Window.orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val late = events(s, dir)
        .withColumn("_ts_us", unix_micros(col("ts")))
        .withColumn("late_us", max("_ts_us").over(w) - col("_ts_us"))
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      val wd = Window.partitionBy("day").orderBy(col("late_us"),
        col("event_id"))
      late
        .withColumn("r", row_number().over(wd).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("day")))
        .filter(col("r") === greatest(lit(1L), expr("(95 * n) div 100")))
        .select(col("day"), col("late_us").as("p95_late_us"),
          col("n").as("n_events"))
        .orderBy("day")
    }),

    "q293_dup_label_agreement" -> ((s, dir) => {
      // near-dup edge quality: do q20's MinHash-LSH candidate pairs stay
      // within one source/lang? — the label-agreement rate that tells
      // you whether near-dups cross provenance boundaries (they should
      // rarely: high cross-source agreement hints template contamination)
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      val meta = d.select(col("doc_id"), col("source"), col("lang"))
      val withMeta = pairs
        .withColumn("base_a", pmod(col("doc_a"), lit(1000000L)))
        .withColumn("base_b", pmod(col("doc_b"), lit(1000000L)))
        .join(meta.select(col("doc_id").as("base_a"),
          col("source").as("src_a"), col("lang").as("lang_a")), "base_a")
        .join(meta.select(col("doc_id").as("base_b"),
          col("source").as("src_b"), col("lang").as("lang_b")), "base_b")
      withMeta.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("src_a") === col("src_b"), 1L).otherwise(0L))
          .as("n_same_source"),
        sum(when(col("lang_a") === col("lang_b"), 1L).otherwise(0L))
          .as("n_same_lang"),
        (sum(when(col("src_a") === col("src_b"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("source_agreement"),
        (sum(when(col("lang_a") === col("lang_b"), 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("lang_agreement"))
    }),

    "q294_vocab_overlap" -> ((s, dir) => {
      // source vocabulary overlap: Jaccard of each source pair's top-50
      // terms (by within-source cf, ties → term) — the lexical-overlap
      // matrix behind mixing decisions; top-50 via the native
      // graft_top_k heap, overlap via one term equi-join
      val tf = tbl(s, dir, "documents")
        .select(col("source"), explode(Retrieval.analyze(col("text")))
          .as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("cf"))
      val top = graft.plans.TopKAggregate.topKRows(tf, Seq("source"),
        Seq((-col("cf")).as("ncf"), col("term").as("term")), Nil, k = 50)
      // list sizes can be < k on small vocabularies — union from sizes
      val sizes = top.groupBy("source").agg(count(lit(1)).as("sz"))
      val a = top.select(col("source").as("src_a"), col("term"))
      val b = top.select(col("source").as("src_b"), col("term"))
      a.join(b, "term").filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sizes.select(col("source").as("src_a"),
          col("sz").as("_sa"))), "src_a")
        .join(broadcast(sizes.select(col("source").as("src_b"),
          col("sz").as("_sb"))), "src_b")
        .withColumn("jaccard", col("n_shared").cast("double") /
          (col("_sa") + col("_sb") - col("n_shared")))
        .select("src_a", "src_b", "n_shared", "jaccard")
        .orderBy("src_a", "src_b")
    }),

    "q296_bounce_rate" -> ((s, dir) =>
      // single-event-session share per day — the q27 sessions rolled to
      // the bounce metric; exact counts, one division
      streaming.EventStreams.sessionizeBatch(events(s, dir), 1800000L)
        .groupBy(date_format(col("session_start"), "yyyy-MM-dd")
          .as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L))
            .as("n_bounces"))
        .withColumn("bounce_rate",
          col("n_bounces").cast("double") / col("n_sessions"))
        .orderBy("day")),

    "q297_return_rate" -> ((s, dir) =>
      // return-rate by brand: share of lineitems flagged 'R', with the
      // returned revenue share — exact counts/cents, broadcast dim
      tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returned"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("cents"),
          sum(when(col("l_returnflag") === "R",
            round(col("l_extendedprice") * 100).cast("long"))
            .otherwise(0L)).as("returned_cents"))
        .withColumn("return_rate",
          col("n_returned").cast("double") / col("n_lines"))
        .withColumn("returned_value_share",
          col("returned_cents").cast("double") / col("cents"))
        .orderBy("p_brand")),

    "q295_aa_calibration" -> ((s, dir) => {
      // A/A calibration: the q226 Welch t under FOUR different hash
      // seeds of the same (null) data — |t| should hover small; a seed
      // tripping 1.96 on an A/A flags bucketing bias before any real
      // test is trusted
      val perUser = events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100).cast("long")).cast("long")
          .as("v100"))
      Seq(1000003L, 999983L, 1000033L, 1000037L).map { base =>
        Stats.welchTTest(
            perUser.withColumn("arm",
              Sketches.keyHash(col("user_id"), base) % 2 === 0),
            "arm", "v100")
          .select(lit(base).as("seed_base"), col("t_stat"),
            (abs(col("t_stat")) > 1.96).as("suspicious"))
      }.reduce(_ unionByName _).orderBy("seed_base")
    }),

    "q298_conversion_lag" -> ((s, dir) => {
      // view→purchase conversion-lag histogram in whole days: each
      // user's first view and first purchase at-or-after it (the q69
      // funnel's timing tail), bucketed by exact integer day gaps
      val ev = events(s, dir)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t_view"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("t_p"))
      v.join(p, "user_id").filter(col("t_p") >= col("t_view"))
        .groupBy("user_id").agg(min("t_view").as("tv"),
          min("t_p").as("tp"))
        .select(expr("(tp - tv) div 86400000000").as("days_to_convert"))
        .groupBy("days_to_convert").agg(count(lit(1)).as("n_users"))
        .orderBy("days_to_convert")
    }),

    "q299_vocab_exclusivity" -> ((s, dir) => {
      // per-source lexical exclusivity: how much of a source's
      // vocabulary appears NOWHERE else — the "does this source add
      // anything" mixing signal; one distinct + one df-across-sources
      // aggregate
      val st = tbl(s, dir, "documents")
        .select(col("source"), explode(Retrieval.analyze(col("text")))
          .as("term"))
        .distinct()
      val spread = st.groupBy("term")
        .agg(count(lit(1)).as("n_sources"))
      st.join(spread, "term")
        .groupBy("source")
        .agg(count(lit(1)).as("n_terms"),
          sum(when(col("n_sources") === 1, 1L).otherwise(0L))
            .as("n_exclusive"))
        .withColumn("exclusivity",
          col("n_exclusive").cast("double") / col("n_terms"))
        .orderBy("source")
    }),

    "q300_health_scorecard" -> ((s, dir) => {
      // one-glance data-health scorecard: the key audit numbers as
      // (metric, value) rows — the summary a pipeline run publishes
      val ev = events(s, dir)
      val docs = tbl(s, dir, "documents")
      val li = tbl(s, dir, "lineitem")
      val o = tbl(s, dir, "orders")
      def one(name: String, v: Column, df: DataFrame) =
        df.agg(v.cast("double").as("value"))
          .select(lit(name).as("metric"), col("value"))
      Seq(
        one("docs_total", count(lit(1)), docs),
        one("events_total", count(lit(1)), ev),
        one("users_distinct", countDistinct(col("user_id")), ev),
        one("error_event_share",
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .cast("double") / count(lit(1)), ev),
        one("orphan_lineitems", count(lit(1)),
          li.join(o, col("l_orderkey") === col("o_orderkey"),
            "left_anti")),
        one("purchase_cents_total",
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L)), ev)
      ).reduce(_ unionByName _).orderBy("metric")
    }),

    "q301_lorenz_curve" -> ((s, dir) => {
      // Lorenz points: cumulative revenue share at each supplier decile
      // (suppliers ascending by revenue) — the curve behind q171's Gini;
      // exact integer cumsums, shares as single divisions
      val rev = tbl(s, dir, "lineitem").groupBy("l_suppkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val n = rev.agg(count(lit(1)).as("n"), sum("cents").as("tot"))
      val ranked = rev.crossJoin(broadcast(n))
        .withColumn("r", row_number().over(
          Window.orderBy(col("cents"), col("l_suppkey"))).cast("long"))
        .withColumn("decile", expr("(10 * r + n - 1) div n"))
      ranked.groupBy("decile")
        .agg(count(lit(1)).as("n_suppliers"), sum("cents").as("cents"),
          max("tot").as("_tot"))
        .withColumn("cum_cents", sum("cents").over(
          Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("decile"), col("n_suppliers"), col("cents"),
          (col("cum_cents").cast("double") / col("_tot"))
            .as("cum_share"))
        .orderBy("decile")
    }),

    "q302_hist_intersection" -> ((s, dir) => {
      // source-pair similarity of doc-length distributions: histogram
      // intersection Σ min(p_a, p_b) over log2 length octaves — the
      // q163 buckets turned into a pairwise distribution-overlap matrix;
      // per-bucket mins of exact fractions, decimal-summed
      val d = tbl(s, dir, "documents")
        .select(col("source"),
          length(bin(greatest(length(col("text")), lit(1)))).as("octave"))
      val per = d.groupBy("source", "octave").agg(count(lit(1)).as("n"))
      val tot = d.groupBy("source").agg(count(lit(1)).as("nt"))
      val frac = per.join(broadcast(tot), "source")
        .select(col("source"), col("octave"),
          (col("n").cast("double") / col("nt")).as("p"))
      frac.select(col("source").as("src_a"), col("octave"),
          col("p").as("pa"))
        .join(frac.select(col("source").as("src_b"), col("octave"),
          col("p").as("pb")), "octave")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(round(sum(least(col("pa"), col("pb"))
          .cast("decimal(38,18)")).cast("double"), 6)
          .as("intersection"))
        .orderBy("src_a", "src_b")
    }),

    "q303_single_source_risk" -> ((s, dir) => {
      // supply-chain concentration: each part's top-supplier volume
      // share; parts ≥ 80% single-sourced are flagged — min_by argmax,
      // exact quantity sums
      val vol = tbl(s, dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      vol.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_suppliers"), sum("qty").as("total_qty"),
          max("qty").as("top_qty"),
          min_by(col("l_suppkey"),
            struct((-col("qty")).as("nq"), col("l_suppkey")))
            .as("top_suppkey"))
        .withColumn("top_share",
          col("top_qty").cast("double") / col("total_qty"))
        .withColumn("single_sourced", col("top_share") >= 0.8)
        .orderBy("l_partkey")
    }),

    "q304_fk_integrity_map" -> ((s, dir) => {
      // the full referential map in one pass: every FK edge's row count,
      // orphan count, and orphan rate — the whole-schema version of the
      // q44 orphan audit (a healthy warehouse shows all zeros)
      def edge(name: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String) =
        child.join(parent.select(col(pk)), col(ck) === col(pk),
            "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .crossJoin(broadcast(child.agg(count(lit(1)).as("n_rows"))))
          .select(lit(name).as("fk_edge"), col("n_rows"),
            col("n_orphans"),
            (col("n_orphans").cast("double") / col("n_rows"))
              .as("orphan_rate"))
      val li = tbl(s, dir, "lineitem"); val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer"); val su = tbl(s, dir, "supplier")
      val p = tbl(s, dir, "part"); val na = tbl(s, dir, "nation")
      Seq(
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"),
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer->nation", c, "c_nationkey", na, "n_nationkey"),
        edge("supplier->nation", su, "s_nationkey", na, "n_nationkey")
      ).reduce(_ unionByName _).orderBy("fk_edge")
    }),

    "q305_fold_stability" -> ((s, dir) => {
      // eval-fold stability: the mean quality score across 5 hash folds
      // and the between-fold variance of those means — a noisy metric
      // (high variance) means the eval split can't be trusted to rank
      // model variants; exact per-fold sums, q260's variance tree on the
      // fold means
      val folds = tbl(s, dir, "documents")
        .withColumn("fold", Sketches.keyHash(col("doc_id")) % 5)
        .withColumn("q", TF.qualityScore(col("text")))
      val per = folds.groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("q").cast("decimal(38,18)")).cast("double") /
            count(lit(1))).as("mean_q"))
      val spread = per.agg(
        count(lit(1)).as("n_folds"),
        round((sum((col("mean_q") * col("mean_q"))
            .cast("decimal(38,18)")).cast("double") -
          sum(col("mean_q").cast("decimal(38,18)")).cast("double") *
            sum(col("mean_q").cast("decimal(38,18)")).cast("double") /
            count(lit(1))) / count(lit(1)), 12).as("between_fold_var"))
      per.crossJoin(broadcast(spread))
        .select(col("fold"), col("n_docs"), round(col("mean_q"), 6)
          .as("mean_q"), col("between_fold_var"))
        .orderBy("fold")
    }),

    "q306_cell_balance" -> ((s, dir) => {
      // IVF cell-balance audit: per-cell counts plus the skew numbers
      // that set worst-case probe latency (max/mean ratio, exact-sum CV)
      // — an unbalanced codebook is the #1 reason IVF p99 blows up
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val sizes = Similarity.assignNearestCentroid(e, "embedding",
          "vec_id", centroids, "cid", "cv")
        .groupBy("centroid_id").agg(count(lit(1)).as("n_vectors"))
      val st = sizes.agg(count(lit(1)).as("_k"), sum("n_vectors").as("_n"),
        max("n_vectors").as("_mx"),
        sum(col("n_vectors") * col("n_vectors")).as("_sxx"))
      sizes.crossJoin(broadcast(st))
        .withColumn("share", col("n_vectors").cast("double") / col("_n"))
        .withColumn("max_over_mean",
          (col("_mx") * col("_k")).cast("double") / col("_n"))
        .withColumn("cv", round(
          sqrt((col("_sxx").cast("double") -
            col("_n").cast("double") * col("_n").cast("double") /
              col("_k")) / col("_k")) /
            (col("_n").cast("double") / col("_k")), 6))
        .select("centroid_id", "n_vectors", "share", "max_over_mean", "cv")
        .orderBy("centroid_id")
    }),

    "q307_probe_cost_curve" -> ((s, dir) => {
      // IVF probe-cost curve: for nprobe ∈ {1, 2, 4}, the fraction of
      // the corpus a query (vec 0) would scan — the latency half of the
      // q103 recall gate; centroid ranking is driver-free (window over
      // 8 rows), sizes join broadcast
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding",
          "vec_id", centroids, "cid", "cv")
      val sizes = assigned.groupBy("centroid_id")
        .agg(count(lit(1)).as("sz"))
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
      val ranked = centroids.crossJoin(broadcast(qv))
        .withColumn("d", VF.cosineDistance(col("cv"), col("qe")))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("d"), col("cid"))))
        .join(sizes, col("cid") === col("centroid_id"))
      val tot = sizes.agg(sum("sz").as("_n"))
      Seq(1, 2, 4).map { p =>
        ranked.filter(col("rk") <= p)
          .agg(sum("sz").as("n_scanned"))
          .crossJoin(broadcast(tot))
          .select(lit(p).as("nprobe"), col("n_scanned"),
            (col("n_scanned").cast("double") / col("_n"))
              .as("scan_fraction"))
      }.reduce(_ unionByName _).orderBy("nprobe")
    }),

    "q308_splithalf_topterms" -> ((s, dir) => {
      // split-half reliability of the "top-20 terms" list: docs split by
      // the keyHash parity, per-half top-20 by cf (ties → term), overlap
      // count — an unstable list means the ranking is noise
      val halves = tbl(s, dir, "documents")
        .withColumn("half", Sketches.keyHash(col("doc_id")) % 2)
        .select(col("half"), explode(Retrieval.analyze(col("text")))
          .as("term"))
        .groupBy("half", "term").agg(count(lit(1)).as("cf"))
      val top = graft.plans.TopKAggregate.topKRows(halves, Seq("half"),
        Seq((-col("cf")).as("ncf"), col("term").as("term")), Nil, k = 20)
      val a = top.filter(col("half") === 0).select("term")
      val b = top.filter(col("half") === 1).select("term")
      a.join(b, "term").agg(count(lit(1)).as("n_overlap"))
        .select(col("n_overlap"),
          (col("n_overlap").cast("double") / lit(20.0)).as("overlap_at_20"))
    }),

    "q309_cell_distortion" -> ((s, dir) => {
      // IVF distortion by cell: mean cosine distance of members to their
      // centroid (per-row distances rounded 6 dp on both engines, then
      // the exact-decimal mean) — which cells need a codebook re-train;
      // pairs with q306's balance audit
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .join(broadcast(centroids), col("centroid_id") === col("cid"))
        .withColumn("d",
          round(VF.cosineDistance(col("embedding"), col("cv")), 6))
        .groupBy("centroid_id")
        .agg(count(lit(1)).as("n_vectors"),
          round(sum(col("d").cast("decimal(38,18)")).cast("double") /
            count(lit(1)), 6).as("mean_distortion"),
          round(max("d"), 6).as("max_distortion"))
        .orderBy("centroid_id")
    }),

    "q310_decayed_popularity" -> ((s, dir) => {
      // recency-weighted popularity with EXACT half-life weights: a
      // week-old event counts half — weights are powers of two, so the
      // decayed score times 2^5 is an exact BIGINT (no float decay
      // drift between engines); per event type, newest-heavy ranking
      val ev = events(s, dir)
      val mx = ev.agg(max(expr(
        "cast(datediff(cast(ts as date), date'1970-01-01') div 7 as int)"))
        .as("_mw"))
      ev.select(col("event_type"), expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') div 7 " +
          "as int)").as("wk"))
        .crossJoin(broadcast(mx))
        .withColumn("age_wk", least(col("_mw") - col("wk"), lit(5)))
        .withColumn("w32", expr("shiftleft(1L, cast(5 - age_wk as int))"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("w32").as("decayed_x32"))
        .withColumn("decayed_score",
          col("decayed_x32").cast("double") / 32.0)
        .orderBy(col("decayed_x32").desc, col("event_type"))
    }),

    "q311_wcc_distributed" -> ((s, dir) => {
      // the 100 TB clustering path, force-gated: collectThreshold = 0
      // makes dedupClusters take the distributed hash-min label loop
      // (the driver union-find is only the small-graph shortcut), so the
      // oracle's recursive fixpoint gates the loop a cluster would
      // actually run on a billion-edge near-dup graph — same corpus,
      // same oracle as q56
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      Dedup.dedupClusters(pairs, "doc_a", "doc_b", edgePartitions = 8,
          collectThreshold = 0L)
        .select(col("id").as("doc_id"), col("cluster_rep"))
        .orderBy("doc_id")
    }),

    "q312_filtered_ann" -> ((s, dir) => {
      // metadata-filtered vector search (the serving-time "filtered
      // query"): IVF probe of 2 cells with a label predicate applied
      // INSIDE the probed cells (pre-filter semantics) — stored
      // partitionBy(centroid_id), the probe prunes partitions and the
      // predicate dies in the scan stage, so non-matching vectors never
      // reach the top-k heap
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding",
          "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("label"),
          col("centroid_id"))
      val cents = centroids.collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      Similarity.ivfSearch(assigned.filter(col("label") === 2),
          "embedding", "vec_id", cents, qv, 8, 2)
        .select(col("vec_id"), col("label"), col("centroid_id"),
          round(col("distance"), 6).as("distance"))
    }),

    "q313_query_likelihood" -> ((s, dir) =>
      // Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty),
      // the LM counterpart to q98's BM25: identical filtered-explode
      // shuffle shape, cf/C stats broadcast, exact-decimal score sum
      Retrieval.queryLikelihood(tbl(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "join", "vector", "window"), 20, mu = 1000.0)),

    "q314_rbo" -> ((s, dir) => {
      // rank-biased overlap (Webber et al. 2010) between the BM25 and
      // query-likelihood top-20 lists — the top-weighted "do two rankers
      // agree" monitor. p = 1/2, so every per-depth term is one division
      // (X_d/d) scaled by an exact power of two: bit-identical doubles
      // both engines, decimal-summed. Both lists are top-k frames, so
      // everything after retrieval is driver-scale
      val docs = tbl(s, dir, "documents")
      val terms = Seq("spark", "join", "vector", "window")
      val wr = Window.orderBy(col("score").desc, col("id").asc)
      val a = Retrieval.bm25(docs, "doc_id", "text", terms, 20)
        .select(col("id"), row_number().over(wr).as("ra"))
      val b = Retrieval.queryLikelihood(docs, "doc_id", "text", terms, 20)
        .select(col("id"), row_number().over(wr).as("rb"))
      val j = a.join(b, Seq("id"), "full").na.fill(999, Seq("ra", "rb"))
      val depths = s.range(1, 21).select(col("id").cast("int").as("d"))
      j.crossJoin(depths)
        .groupBy("d")
        .agg(sum(when(greatest(col("ra"), col("rb")) <= col("d"), 1L)
          .otherwise(0L)).as("x_d"))
        .agg(round(sum(((col("x_d").cast("double") / col("d")) /
            expr("shiftleft(1L, d)").cast("double"))
          .cast("decimal(27,15)")).cast("double"), 6).as("rbo"),
          (max(when(col("d") === 20, col("x_d"))).cast("double") / 20.0)
            .as("overlap_at_20"))
    }),

    "q315_t_closeness" -> ((s, dir) =>
      // t-closeness release audit over the q218 quasi-identifiers: a
      // class leaks when its source distribution diverges from the
      // corpus's even if it is large (k) and diverse (l) — exact-integer
      // total-variation distance, one division per class
      Governance.tClosenessAudit(
          tbl(s, dir, "documents")
            .withColumn("len_bucket", expr("n_chars div 100")),
          Seq("lang", "len_bucket"), "source", t = 0.4)
        .orderBy("lang", "len_bucket")),

    "q316_top_ngram_repetition" -> ((s, dir) =>
      // Gopher top-n-gram repetition gate (n = 2, 3, 4): fraction of
      // token characters claimed by the most frequent n-gram — the
      // boilerplate-loop kill signal q72's bigram stats only cover at
      // n = 2. Paper-shaped thresholds; integer counts, one division
      TextQuality.topNgramFractions(tbl(s, dir, "documents"), "doc_id",
          "text", Seq(2, 3, 4), Seq(0.20, 0.18, 0.16))
        .orderBy("doc_id")),

    "q317_dup_ngram_coverage" -> ((s, dir) => {
      // Gopher duplicated-n-gram coverage: the fraction of tokens inside
      // at least one REPEATED 6-gram, counting each token once (interval
      // union via a running-max window — overlapping spans would
      // overcount). Every third doc gets its first 8 tokens re-appended
      // as a known self-repetition; clean docs must report 0
      val d = tbl(s, dir, "documents")
      val corpus = d
        .withColumn("_t0", TextQuality.tokens(col("text")))
        .withColumn("text",
          when(col("doc_id") % 3 === 0 && size(col("_t0")) >= 8,
            concat(col("text"), lit(" "), concat_ws(" ", slice(col("_t0"), 1, 8))))
          .otherwise(col("text")))
        .select("doc_id", "text")
      TextQuality.dupNgramCoverage(corpus, "doc_id", "text", n = 6)
        .orderBy("doc_id")
    }),

    "q318_absorbing_conversion" -> ((s, dir) => {
      // 4-step conversion probability by value iteration over the q187
      // within-session transition matrix: P(reach 'purchase' in ≤ 4
      // moves) from every state — the funnel-free "how close is this
      // state to converting" summary. One corpus pass builds the counts;
      // the iteration runs on the tiny state space
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      val trans = events(s, dir)
        .select("user_id", "event_id", "ts", "event_type")
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("_gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("from_type").isNotNull && col("_gap") <= gapUs)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      GraphAnalytics.absorbingReach(trans, "from_type", "to_type", "n",
          target = "purchase", rounds = 4)
        .orderBy("state")
    }),

    "q319_linear_rerank" -> ((s, dir) => {
      // second-stage reranker over the q256 feature join: a fixed linear
      // model (the shape a trained LTR model serves as) rescores the
      // BM25 top-20; output carries both ranks so rank movement is
      // auditable. All feature weights literal, one round at the end
      graft.plans.VectorExpressions.register(s)
      val d = tbl(s, dir, "documents")
      val q0 = Seq("spark", "join", "vector", "window")
      val cands = Retrieval.bm25(d, "doc_id", "text", q0, 20)
        .select(col("id").as("doc_id"), col("score").as("bm25"))
      val e = tbl(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0).select("embedding")
        .head().getSeq[Float](0)
      val dense = e.select(col("vec_id").as("doc_id"),
        round(call_function("graft_cosine_distance", col("embedding"),
          array(qv.map(v => lit(v)): _*)), 6).as("cos_dist"))
      val prior = d.select(col("doc_id"),
        TF.qualityScore(col("text")).as("quality"),
        length(col("text")).as("text_len"))
      val feats = cands.join(prior, "doc_id")
        .join(dense, Seq("doc_id"), "left")
        .withColumn("cd", coalesce(col("cos_dist"), lit(1.0)))
      val scored = feats.withColumn("score2", round(
        lit(2.0) * col("bm25") - lit(3.0) * col("cd") +
          lit(5.0) * col("quality") - lit(0.001) * col("text_len"), 6))
      scored
        .withColumn("rank_before", row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))))
        .withColumn("rank_after", row_number().over(
          Window.orderBy(col("score2").desc, col("doc_id"))))
        .filter(col("rank_after") <= 10)
        .select(col("doc_id"), col("score2"), col("rank_after"),
          col("rank_before"), col("bm25"))
        .orderBy("rank_after")
    }),

    "q320_obf_monitor" -> ((s, dir) => {
      // peeking-safe weekly experiment monitor: cumulative Welch z per
      // calendar-week look against the O'Brien-Fleming-style boundary
      // z_α·√(K/k) — q226's null split read safely every week instead
      // of once. Exact-decimal cumulants; the weekly frame is bounded
      val ev = events(s, dir)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') div 7 as int)")
          .as("wk"),
          (Sketches.keyHash(col("user_id")) % 2 === 0).as("arm"),
          round(col("value") * 100).cast("long").as("v100"))
      Stats.obfMonitor(ev, "wk", "arm", "v100", zAlpha = 2.04)
        .orderBy("wk")
    }),

    "q321_label_noise" -> ((s, dir) => {
      // confident-learning label screen over the q101 kNN graph: per
      // vector, the share of its 3 nearest same-cell neighbors whose
      // label differs, plus the neighborhood majority — the relabel
      // worklist a pipeline reviews before training on the corpus
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding",
          "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      Evaluation.labelNoiseScreen(graph,
          e.select("vec_id", "label"), "vec_id", "label")
        .orderBy("id")
    }),

    "q322_qte" -> ((s, dir) => {
      // quantile treatment effects: exact p25/p50/p75/p90 of purchase
      // cents per hash arm and their per-quantile gap — does the
      // "treatment" move the median or only the tail the q226 mean sees?
      val ev = events(s, dir)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select((Sketches.keyHash(col("user_id")) % 2 === 0).as("arm"),
          round(col("value") * 100).cast("long").as("v100"))
      Stats.quantileTreatmentEffect(ev, "arm", "v100", Seq(25, 50, 75, 90))
        .orderBy("pct")
    }),

    "q323_did" -> ((s, dir) => {
      // difference-in-differences over the hash arms: pre/post split at
      // the midpoint week, per-cell exact-decimal means, DiD estimate —
      // the launch readout that cancels any level shift both arms share
      val ev = events(s, dir)
        .filter(col("event_type") === "purchase" && col("value").isNotNull)
        .select(expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') div 7 as int)")
          .as("wk"),
          (Sketches.keyHash(col("user_id")) % 2 === 0).as("arm"),
          round(col("value") * 100).cast("long").as("v100"))
      val b = ev.agg(min("wk").as("w0"), max("wk").as("w1"))
      val flagged = ev.crossJoin(broadcast(b))
        .withColumn("post", col("wk") >= expr("(w0 + w1 + 1) div 2"))
      Stats.diffInDiff(flagged, "arm", "post", "v100")
    }),

    "q324_impact_pruned" -> ((s, dir) => {
      // tiered-index audit: per-term postings cut to the 32 highest-tf
      // entries, BM25 over the survivors with full-corpus stats, each
      // pruned-top-20 row flagged by membership in the exact top-20 —
      // the quality price of bounding worst-case posting-list scans
      val d = tbl(s, dir, "documents")
      val terms = Seq("spark", "join", "vector", "window")
      val full = Retrieval.bm25(d, "doc_id", "text", terms, 20)
      val pruned = Retrieval.bm25ImpactPruned(d, "doc_id", "text", terms,
        20, keepPerTerm = 32)
      pruned
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("id").asc)).cast("int"))
        .join(full.select(col("id"), lit(true).as("in_full")),
          Seq("id"), "left")
        .select(col("rank"), col("id"), col("score"), col("n_matched"),
          coalesce(col("in_full"), lit(false)).as("in_full"))
        .orderBy("rank")
    }),

    "q325_agg_state_merge" -> ((s, dir) => {
      // incremental-view maintenance gate: purchase cents fold to two
      // per-batch algebraic states (split at the midpoint week), the
      // states MERGE — and the oracle recomputes from raw events, so
      // hash equality proves merge ≡ recompute: yesterday's corpus
      // never rescans, only the new batch aggregates
      val ev = events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr(
            "cast(datediff(cast(ts as date), date'1970-01-01') div 7 as int)")
            .as("wk"),
          round(col("value") * 100).cast("long").as("v100"))
      val b = ev.agg(min("wk").as("w0"), max("wk").as("w1"))
      val tagged = ev.crossJoin(broadcast(b))
        .withColumn("post", col("wk") >= expr("(w0 + w1 + 1) div 2"))
      val s1 = ChangeDetection.aggState(tagged.filter(!col("post")),
        Seq("event_type"), "v100")
      val s2 = ChangeDetection.aggState(tagged.filter(col("post")),
        Seq("event_type"), "v100")
      // the exact decimal sum crosses the compare as a STRING: DuckDB's
      // pandas bridge floats DECIMAL(38,0), strings stay exact any scale
      ChangeDetection.mergeAggStates(Seq(s1, s2), Seq("event_type"))
        .withColumn("sv", col("sv").cast("string"))
        .orderBy("event_type")
    }),

    "q326_flesch" -> ((s, dir) =>
      // Flesch reading-ease + FK grade per doc from exact word /
      // sentence / vowel-group-syllable counts — two map-side regex
      // scans, literal-coefficient arithmetic, zero shuffle
      TextQuality.fleschMetrics(tbl(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q327_jaccard_prefix_join" -> ((s, dir) => {
      // EXACT set-similarity self-join by prefix filtering (AllPairs /
      // PPJoin): candidates only where rarest-token prefixes collide,
      // then exact intersection verify — the oracle is the BRUTE-FORCE
      // all-pairs Jaccard, so hash equality PROVES the filter lossless
      val d = tbl(s, dir, "documents").filter(col("doc_id") < 60)
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 2000,
          expr("substring(text, 1, greatest(length(text) - 12, 1))")))
      Dedup.jaccardPrefixJoin(corpus, "doc_id", "text", 0.7)
        .orderBy("doc_a", "doc_b")
    }),

    "q328_jl_distortion" -> ((s, dir) => {
      // Johnson–Lindenstrauss audit: 64-dim vectors projected onto 8
      // seeded Gaussian planes (the sign-LSH hyperplanes), per-pair true
      // vs 1/sqrt(k)-rescaled projected euclidean distance and their
      // ratio — the measured (1±ε) that justifies searching in the
      // compressed space before the full-dimension re-rank
      val e = tbl(s, dir, "embeddings").filter(col("vec_id") < 40)
      Quantization.jlDistortionPairs(e, "vec_id", "embedding", 64, 8)
        .orderBy("a", "b")
    }),

    "q329_conformal" -> ((s, dir) => {
      // split conformal prediction on purchase values: train folds fit
      // the per-type mean, calibration folds take the ceil((n+1)·0.9)-th
      // smallest |residual| as qhat, test folds report achieved coverage
      // of ±qhat — a distribution-free interval from three hash folds
      val ev = events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("v100"))
      Stats.splitConformal(ev, "event_type", "event_id", "v100")
        .orderBy("event_type")
    }),

    "q330_edit_distance_join" -> ((s, dir) => {
      // LOSSLESS edit-distance self-join: positional q-gram count filter
      // (Gravano VLDB'01) generates candidates, levenshtein verifies —
      // the oracle is the unfiltered all-pairs join, so hash equality
      // proves the count+length filters drop no true pair
      val p = tbl(s, dir, "part").filter(col("p_partkey") < 300)
        .select(col("p_partkey").as("id"), col("p_name").as("name"))
      val corpus = p.union(p.select(col("id") + 10000,
        expr("concat(substring(name, 1, 4), 'z', substring(name, 6))")))
      Linkage.editDistanceJoin(corpus, "id", "name", maxDist = 2, q = 2)
        .orderBy("id_a", "id_b")
    }),

    "q331_rake_keywords" -> ((s, dir) =>
      // RAKE keyword extraction: stopword/punct-delimited phrase runs,
      // word score deg/freq over all phrase slots, phrase = decimal-exact
      // sum of word scores; global top-25 distinct phrases
      TextQuality.rakeKeywords(tbl(s, dir, "documents"), "doc_id", "text", 25)
        .orderBy("rank")),

    "q332_mutual_knn" -> ((s, dir) => {
      // mutual-kNN symmetrization of the q101 bucket-local graph: keep
      // only reciprocated edges — the HDBSCAN/SemDeDup neighborhood
      // evidence that survives density gaps one-sided kNN edges cross
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val g = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      GraphAnalytics.mutualEdges(g, "id", "nbr_id")
        .join(g.select(col("id").as("a"), col("nbr_id").as("b"),
          col("distance")), Seq("a", "b"))
        .select(col("a"), col("b"), round(col("distance"), 6).as("distance"))
        .orderBy("a", "b")
    }),

    "q333_cdc_chunks" -> ((s, dir) => {
      // content-defined chunking shift-resilience gate: each doc and a
      // prefix-inserted twin chunked by rolling-hash boundaries; the
      // shared-chunk fraction shows CDC re-synchronizing after the edit
      // where a fixed-window splitter would re-cut everything — the
      // re-embed-only-what-changed contract of incremental ingest
      val d = tbl(s, dir, "documents").filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val corpus = d.union(d.select(col("doc_id") + 3000,
        concat(lit("inserted preamble "), col("text"))))
      val ch = Chunker.contentDefinedChunks(corpus, "doc_id", "text", 8, 32)
      val a = ch.filter(col("doc_id") < 3000)
        .select(col("doc_id"), col("chunk")).distinct()
      val b = ch.filter(col("doc_id") >= 3000)
        .select((col("doc_id") - 3000).as("doc_id"), col("chunk")).distinct()
      val na = a.groupBy("doc_id").agg(count(lit(1)).as("n_chunks_orig"))
      val nb = b.groupBy("doc_id").agg(count(lit(1)).as("n_chunks_twin"))
      val sh = a.join(b, Seq("doc_id", "chunk"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      na.join(nb, Seq("doc_id"))
        .join(sh, Seq("doc_id"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .withColumn("shared_frac",
          col("n_shared").cast("double") / col("n_chunks_orig"))
        .orderBy("doc_id")
    }),

    "q334_hll_rollup" -> ((s, dir) => {
      // sketch-rollup mergeability gate: weekly per-type HLL register
      // shards max-merge up the hierarchy (type, then global) and the
      // oracle computes each level DIRECTLY from raw keys — equality
      // proves the persisted-shard merge path rescans nothing
      val ev = events(s, dir).withColumn("wk", expr(
        "cast(datediff(cast(ts as date), date'1970-01-01') div 7 as int)"))
      val leaf = Sketches.hllRegisters(ev, Seq("event_type", "wk"),
        "user_id", 5)
      val perType = Sketches.hllMergeEstimate(
        leaf.select(col("event_type"), col("b"), col("mx")), "event_type", 5)
      val global = Sketches.hllMergeEstimate(
        leaf.select(lit("ALL").as("key"), col("b"), col("mx")), "key", 5)
      val exT = ev.groupBy("event_type")
        .agg(countDistinct("user_id").as("n_exact"))
      val exG = ev.agg(countDistinct("user_id").as("n_exact"))
        .withColumn("key", lit("ALL"))
      perType.join(exT, "event_type")
        .select(lit("event_type").as("level"),
          col("event_type").as("key"), col("n_exact"), col("hll_est"))
        .unionByName(global.join(exG, "key")
          .select(lit("global").as("level"), col("key"), col("n_exact"),
            col("hll_est")))
        .orderBy("level", "key")
    }),

    "q335_target_encoding" -> ((s, dir) => {
      // leave-one-out target encoding of order priority by order value:
      // naive group mean (leaks the row's own target), LOO (sum minus
      // self), and m=20 global-mean-smoothed LOO — the categorical
      // feature transform a tabular training pipeline fits as two
      // broadcast-sized aggregates regardless of corpus size
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
          round(col("o_totalprice") * 100).cast("long").as("v100"))
      val g = o.groupBy("prio").agg(count(lit(1)).as("n"),
        sum(col("v100").cast("decimal(38,0)")).as("sv"))
      val glob = o.agg(count(lit(1)).as("ng"),
        sum(col("v100").cast("decimal(38,0)")).as("svg"))
      o.filter(col("o_orderkey") < 200)
        .join(broadcast(g), Seq("prio"))
        .crossJoin(broadcast(glob))
        .withColumn("mu", col("svg").cast("double") / col("ng"))
        .withColumn("enc_naive", col("sv").cast("double") / col("n"))
        .withColumn("enc_loo", when(col("n") > 1,
          (col("sv") - col("v100")).cast("double") / (col("n") - 1)))
        .withColumn("enc_smooth",
          ((col("sv") - col("v100")).cast("double") + lit(20.0) * col("mu")) /
            (col("n") - 1 + 20))
        .select(col("o_orderkey"), col("prio"), col("v100"),
          round(col("enc_naive"), 6).as("enc_naive"),
          round(col("enc_loo"), 6).as("enc_loo"),
          round(col("enc_smooth"), 6).as("enc_smooth"))
        .orderBy("o_orderkey")
    }),

    "q336_range_join" -> ((s, dir) => {
      // banded interval join: order-anchored promo windows × shipment
      // days as an EQUI-join on 16-day bands + exact BETWEEN — the
      // theta-join Catalyst would otherwise plan as a nested loop
      val iv = tbl(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
            .cast("long").as("lo"))
        .withColumn("hi", col("lo") + col("o_orderkey") % 30)
      val pts = tbl(s, dir, "lineitem").filter(col("l_orderkey") < 6000)
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
            .cast("long").as("p"))
      Joins.rangeJoin(pts, "p", iv, "lo", "hi", 16L)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_points"),
          min("p").as("first_day"), max("p").as("last_day"))
        .orderBy("o_orderkey")
    }),

    "q337_fellegi_sunter" -> ((s, dir) => {
      // Fellegi–Sunter log-likelihood linkage over nation-blocked
      // customer pairs: u from each field's value distribution, m=0.95
      // prior, per-field ln evidence summed in fixed order — positive
      // score = more likely a true match than a chance pairing
      val c = tbl(s, dir, "customer").filter(col("c_custkey") < 400)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          // +10^6 keeps the dividend positive: Spark div truncates toward
          // zero, DuckDB // floors — they only agree on non-negatives
          expr("(cast(round(c_acctbal * 100) as bigint) + 1000000) div 100000")
            .as("bal_bucket"),
          substring(col("c_name"), 1, 12).as("name_pfx"))
      val corpus = c.union(c.select(col("c_custkey") + 10000,
        col("c_nationkey"), col("c_mktsegment"),
        col("bal_bucket") + col("c_custkey") % 2, col("name_pfx")))
      Linkage.fellegiSunter(corpus, "c_custkey", "c_nationkey",
          Seq("c_mktsegment", "bal_bucket", "name_pfx"))
        .filter(col("score") > 0)
        .select(col("id_a"), col("id_b"), col("n_agree"),
          round(col("score"), 6).as("score"))
        .orderBy("id_a", "id_b")
    }),

    "q338_neyman" -> ((s, dir) =>
      // Neyman optimal allocation of a 1000-row sample budget across
      // event-type strata ∝ N_h·σ_h, largest-remainder integer rounding
      // — allocations sum to the budget exactly
      Sampling.neymanAllocation(
        events(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("v100")),
        "event_type", "v100", 1000L)
        .orderBy("stratum")),

    "q339_split_leakage" -> ((s, dir) => {
      // eval-integrity audit: near-dup clusters (q56's corpus) crossed
      // with a naive 80/20 hash split — any cluster with members on BOTH
      // sides leaks paraphrases of training docs into the eval; the fix
      // is splitting by cluster rep, and this query measures the blast
      // radius of not doing so
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      val clusters = Dedup.dedupClusters(pairs, "doc_a", "doc_b")
      Sampling.splitLeakageAudit(
          clusters.select(col("id"), col("cluster_rep")), "id", "cluster_rep")
        .orderBy("cluster_rep")
    }),

    "q340_psi_drift" -> ((s, dir) => {
      // population stability index of purchase-value distributions,
      // first-half vs second-half weeks per event type — the scorecard
      // drift gate (>0.2 = investigate) with add-one smoothing so empty
      // bins stay finite and replayable
      val ev = events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"),
          expr(
            "cast(datediff(cast(ts as date), date'1970-01-01') div 7 as int)")
            .as("wk"),
          round(col("value") * 100).cast("long").as("v100"))
      val b = ev.agg(min("wk").as("w0"), max("wk").as("w1"))
      val tagged = ev.crossJoin(broadcast(b))
        .withColumn("post", col("wk") >= expr("(w0 + w1 + 1) div 2"))
      Stats.psiDrift(tagged.filter(!col("post")), tagged.filter(col("post")),
          "event_type", "v100", binWidth = 5000L, nBins = 20)
        .orderBy("event_type")
    }),

    "q341_mad_outliers" -> ((s, dir) =>
      // robust outlier screen: exact per-type median and MAD, values
      // beyond 3·1.4826·MAD counted — the scale estimate a wild value
      // cannot inflate, run before trusting any mean/σ monitor
      Stats.madOutliers(events(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("v100")),
        "event_type", "v100")
        .orderBy("event_type")),

    "q342_overlap_join" -> ((s, dir) => {
      // interval × interval overlap join, banded: shipment in-transit
      // windows against order-anchored promo windows — each overlapping
      // pair found exactly once via the max-lo band-ownership rule
      val d92 = lit("1992-01-01").cast("date")
      val promo = tbl(s, dir, "orders").filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), d92).cast("long").as("p_lo"))
        .withColumn("p_hi", col("p_lo") + col("o_orderkey") % 14)
      val ship = tbl(s, dir, "lineitem").filter(col("l_orderkey") < 3000)
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(to_date(col("l_shipdate")), d92).cast("long").as("s_lo"))
        .withColumn("s_hi",
          col("s_lo") + (col("l_orderkey") + col("l_linenumber")) % 10)
      Joins.overlapJoin(ship, "s_lo", "s_hi", promo, "p_lo", "p_hi", 16L)
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_overlaps"),
          min("s_lo").as("first_lo"), max("s_hi").as("last_hi"))
        .orderBy("o_orderkey")
    }),

    "q343_prf_expansion" -> ((s, dir) => {
      // pseudo-relevance feedback (RM3-lite): base BM25 top-10 yields 3
      // expansion terms by in-set tf × idf, the expanded query re-ranks,
      // and each result is flagged by base-top-10 membership — the
      // recall lift mechanism of classic query expansion
      import s.implicits._
      val d = tbl(s, dir, "documents")
      val baseTerms = Seq("spark", "join")
      val base = Retrieval.bm25(d, "doc_id", "text", baseTerms, 10)
      val exp = Retrieval.prfExpandTerms(d, "doc_id", "text", baseTerms,
          10, 3)
        .select("term").as[String].collect().toSeq.sorted
      Retrieval.bm25(d, "doc_id", "text", baseTerms ++ exp, 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("id").asc)).cast("int"))
        .join(base.select(col("id"), lit(true).as("in_base")), Seq("id"),
          "left")
        .select(col("rank"), col("id"), col("score"), col("n_matched"),
          coalesce(col("in_base"), lit(false)).as("in_base"))
        .orderBy("rank")
    }),

    "q344_brier" -> ((s, dir) =>
      // Murphy decomposition of the Brier score: the quality score as a
      // probability that a doc is long-form — reliability (distance from
      // the diagonal), resolution (outcome separation), uncertainty
      Evaluation.brierDecomposition(
        tbl(s, dir, "documents").select(
          TF.qualityScore(col("text")).as("p"),
          (col("n_chars") >= 1000).as("o")),
        "p", "o", nBins = 10)),

    "q345_woe_iv" -> ((s, dir) =>
      // weight of evidence per quality-score bin + information value of
      // the whole feature — the credit-scoring answer to "does this
      // score separate long-form from short-form at all"
      Evaluation.weightOfEvidence(
        tbl(s, dir, "documents").select(
          TF.qualityScore(col("text")).as("p"),
          (col("n_chars") >= 1000).as("o")),
        "p", "o", nBins = 10)
        .orderBy("bin")),

    "q346_heaps_law" -> ((s, dir) =>
      // Heaps'-law vocabulary growth fit V(n) ≈ K·n^β over doc-order
      // checkpoints: β far from ~0.5 smells synthetic, templated, or
      // noisy vocab — a one-row corpus-health fingerprint
      NgramLm.heapsLawFit(tbl(s, dir, "documents"), "doc_id", "text")),

    "q347_clustering_coef" -> ((s, dir) => {
      // local clustering coefficient over the mutual-kNN graph: tight
      // near-dup cliques (coef → 1) vs hub-and-spoke neighborhoods
      // (coef → 0) — the topology signal behind SemDeDup-style pruning
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val g = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      GraphAnalytics.clusteringCoefficient(
          GraphAnalytics.mutualEdges(g, "id", "nbr_id"), "a", "b")
        .withColumn("coef", round(col("coef"), 6))
        .orderBy("id")
    }),

    "q348_modularity" -> ((s, dir) => {
      // Newman modularity of the IVF cell partition over the mutual-kNN
      // graph: does the partition the index prunes by actually hold the
      // neighbor-graph mass? Per-cell terms + the global Q on every row
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val g = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      GraphAnalytics.modularity(
          GraphAnalytics.mutualEdges(g, "id", "nbr_id"), "a", "b",
          assigned.select(col("vec_id"), col("centroid_id")),
          "vec_id", "centroid_id")
        .orderBy("c")
    }),

    "q349_transition_entropy" -> ((s, dir) => {
      // conditional next-event entropy of the q187 session transitions:
      // per from-state predictability (0 = deterministic funnel) and the
      // globally weighted H(next|current) — the information-theoretic
      // one-number summary of behavioral structure
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      val pairs = events(s, dir)
        .select("user_id", "event_id", "ts", "event_type")
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("_gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("from_type").isNotNull && col("_gap") <= gapUs)
        .select(col("from_type"), col("event_type").as("to_type"))
      Stats.conditionalEntropy(pairs, "from_type", "to_type")
        .orderBy("from_type")
    }),

    "q350_permutation_test" -> ((s, dir) =>
      // deterministic permutation test on per-event purchase values:
      // k=0 is the production A/B bucketing (q226's arms), k=1..64 are
      // hash re-labelings — an assumption-free p-value beside Welch
      Stats.permutationTest(events(s, dir).filter(col("value").isNotNull)
          .select(col("user_id"),
            round(col("value") * 100).cast("long").as("v100")),
        "user_id", "v100", nPerms = 64)),

    "q351_seasonal_residuals" -> ((s, dir) => {
      // STL-lite anomaly screen on daily event counts: centered 7-day
      // trend, day-of-week seasonal, residual z-flags — the monitor that
      // doesn't page every weekend like a raw z-score does
      val daily = events(s, dir)
        .select(expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') as long)")
          .as("day"))
        .groupBy("day").agg(count(lit(1)).as("n"))
      Stats.seasonalResiduals(daily, "day", "n").orderBy("day")
    }),

    "q352_k_anonymity" -> ((s, dir) => {
      // k-anonymity generalization ladder over customer quasi-
      // identifiers: each level drops the most specific column; release
      // at the first level whose smallest equivalence class reaches k=5
      val c = tbl(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("(cast(round(c_acctbal * 100) as bigint) + 1000000) div 100000")
            .as("bal_bucket"))
      Governance.kAnonymityLadder(c,
          Seq(Seq("c_nationkey", "c_mktsegment", "bal_bucket"),
            Seq("c_nationkey", "c_mktsegment"),
            Seq("c_mktsegment"), Seq()), k = 5)
        .orderBy("level")
    }),

    "q353_map_eval" -> ((s, dir) => {
      // mean average precision of the IVF probe against the exact
      // top-10 — the rank-sensitive gate beside q103's recall@k: equal
      // recall separates here by where the hits sit in the list
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val approx = Similarity.ivfSearchBatch(assigned, "embedding", "vec_id",
        centroids, "cid", "cv", queries, "qv", "qid", 10, 2)
      val exact = Similarity.topKBatch(e, "embedding", "vec_id",
        queries, "qv", "qid", 10)
      Evaluation.meanAveragePrecision(approx, exact, "query_id", "vec_id",
          "rank")
        .orderBy("query_id")
    }),

    "q354_davies_bouldin" -> ((s, dir) => {
      // Davies–Bouldin validity of the IVF partition: per-cell scatter
      // vs centroid separation — lower = tighter, better-separated
      // cells; the label-free number for choosing k / auditing drift
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding",
        "vec_id", centroids, "cid", "cv")
      Clustering.daviesBouldin(assigned, "centroid_id", "centroid_dist",
          centroids, "cid", "cv")
        .orderBy("cid")
    }),

    "q355_silhouette" -> ((s, dir) => {
      // simplified silhouette: own-centroid vs second-nearest-centroid
      // distance per point — the quadratic-free silhouette that still
      // separates interior points from boundary points, per cell
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      Clustering.simplifiedSilhouette(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .orderBy("cid")
    }),

    "q356_category_drift" -> ((s, dir) => {
      // enum-domain drift of part brands across the 1994/1995 shipment
      // split: named new/gone categories + the top-10 share shifts —
      // the audit that catches an upstream schema change before any
      // distribution test fires
      val li = tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), year(to_date(col("l_shipdate"))).as("yr"))
      Profiling.categoryDrift(li.filter(col("yr") <= 1994),
          li.filter(col("yr") >= 1995), "p_brand", topK = 10)
        .orderBy(col("shift").desc, col("cat"))
    }),

    "q357_changelog_apply" -> ((s, dir) => {
      // CDC catch-up: the whole event backlog compacts to final state in
      // ONE struct-max aggregate — last writer per user wins, a final
      // 'error' op tombstones the key — instead of replaying the log row
      // by row
      val log = events(s, dir).filter(col("user_id") < 300)
        .select(col("user_id"), col("event_id").as("version"),
          when(col("event_type") === "error", lit("delete"))
            .otherwise(lit("upsert")).as("op"),
          col("event_type"),
          coalesce(round(col("value") * 100).cast("long"), lit(0L))
            .as("v100"))
      ChangeDetection.applyChangelog(log, "user_id", "version", "op")
        .orderBy("user_id")
    }),

    "q358_rolling_corr" -> ((s, dir) => {
      // 14-day rolling Pearson of daily activity vs daily revenue — the
      // time-varying answer to q111's single corr: the weeks where the
      // relationship inverts are exactly what the average hides
      val daily = events(s, dir)
        .groupBy(expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') as long)")
          .as("day"))
        .agg(count(lit(1)).as("x"),
          coalesce(sum(round(col("value") * 100).cast("long")), lit(0L))
            .as("y"))
      Stats.rollingCorrelation(daily, "day", "x", "y", window = 14)
        .orderBy("day")
    }),

    "q359_order_reconciliation" -> ((s, dir) => {
      // double-entry close: order headers vs the sum of their line
      // amounts in exact cents — mismatch count, total drift, and the
      // top-20 worst deltas (headers with no lines reconcile against 0)
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("o_cents"))
      val li = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")) * 100).cast("long").as("line_cents"))
      Profiling.reconcileTotals(o, "o_orderkey", "o_cents",
          li, "l_orderkey", "line_cents", topK = 20)
        .orderBy("key")
    }),

    "q360_blocking_quality" -> ((s, dir) => {
      // blocking-scheme scorecard on a known-truth corpus: nation
      // blocking's reduction ratio vs its pairs completeness — half the
      // twins shift nation, so the block that saves the most work also
      // silently drops half the true matches
      val c = tbl(s, dir, "customer").filter(col("c_custkey") < 400)
        .select(col("c_custkey").as("id"), col("c_nationkey").as("nat"))
      val corpus = c.union(c.select(col("id") + 10000,
        pmod(col("nat") + col("id") % 2, lit(25))))
      val truth = c.select(col("id").as("a"), (col("id") + 10000).as("b"))
      val cand = corpus.select(col("nat"), col("id").as("a"))
        .join(corpus.select(col("nat"), col("id").as("b")), Seq("nat"))
        .filter(col("a") < col("b")).select("a", "b")
      val nRecords = 2L * c.count()
      Linkage.blockingQuality(cand, "a", "b", truth, "a", "b", nRecords)
    }),

    "q361_churn_sensitivity" -> ((s, dir) => {
      // churn-definition sensitivity: the churned-user share at 7/14/21/
      // 28-day inactivity thresholds — the curve that shows how much the
      // reported churn rate is an artifact of the chosen cutoff
      val ev = events(s, dir)
      val users = ev.groupBy("user_id")
        .agg(max(unix_micros(col("ts"))).as("last_us"))
      val mx = users.agg(max("last_us").as("max_us"))
      users.crossJoin(broadcast(mx))
        .withColumn("t_days", explode(expr("array(7L, 14L, 21L, 28L)")))
        .groupBy("t_days").agg(count(lit(1)).as("n_users"),
          sum(when(col("last_us") <
            col("max_us") - col("t_days") * 86400000000L, 1L).otherwise(0L))
            .as("n_churned"))
        .withColumn("churn_rate",
          round(col("n_churned").cast("double") / col("n_users"), 6))
        .orderBy("t_days")
    }),

    "q362_anisotropy" -> ((s, dir) =>
      // embedding-space anisotropy: ||mean vector|| vs mean norm — the
      // common-component audit that predicts crushed cosine contrast and
      // says whether all-but-the-top (q193) removal is needed pre-index
      Spectral.anisotropyAudit(tbl(s, dir, "embeddings"), "embedding", 64)),

    "q363_boilerplate_lines" -> ((s, dir) =>
      // per-doc boilerplate share: 12-token pseudo-lines appearing in
      // ≥3 distinct docs are template scaffolding; a doc that is MOSTLY
      // such lines should drop whole — the verdict global line dedup
      // doesn't give
      TextQuality.boilerplateLineShare(tbl(s, dir, "documents"),
          "doc_id", "text")
        .orderBy("id")),

    "q364_ngram_novelty" -> ((s, dir) =>
      // eval-split phrasing leakage: the share of the test fold's
      // distinct 4-grams never seen in the train fold — novelty near 0
      // means the eval re-tests memorized surface forms
      Dedup.ngramNovelty(tbl(s, dir, "documents"), "doc_id", "text",
        n = 4)),

    "q365_intrinsic_dim" -> ((s, dir) => {
      // two-NN intrinsic dimension over the cell-local kNN graph: is
      // the 64-dim embedding really 64-dimensional, or does it live on
      // a thin manifold where aggressive IVF/PQ configs are safe?
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding",
          "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val g = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      Similarity.intrinsicDimension(g, "id", "rank", "distance")
    }),

    "q366_ratio_metric" -> ((s, dir) => {
      // delta-method A/B inference for a RATIO metric (purchase revenue
      // per event, unit = user): the covariance correction a per-event
      // z-test silently drops; per-arm ratio/SE and the two-arm z
      val u = events(s, dir).groupBy("user_id").agg(
        coalesce(sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long"))), lit(0L)).as("x"),
        count(lit(1)).as("y"))
        .withColumn("arm", Sketches.keyHash(col("user_id")) % 2 === 0)
      Stats.ratioMetricDelta(u, "arm", "x", "y").orderBy("arm")
    }),

    "q367_mase_forecast" -> ((s, dir) =>
      // forecast-baseline gate on daily event counts: seasonal-naive
      // (lag 7) vs naive (lag 1) MAE — mase < 1 says the weekly cycle is
      // real signal a forecaster must model
      Stats.maseSeasonalNaive(events(s, dir)
          .groupBy(expr(
            "cast(datediff(cast(ts as date), date'1970-01-01') as long)")
            .as("day"))
          .agg(count(lit(1)).as("n")),
        "day", "n", season = 7)),

    "q368_funnel_ab" -> ((s, dir) => {
      // per-step funnel conversion under the production A/B bucketing:
      // pooled two-proportion z at view→click and click→purchase — the
      // step-level read a whole-funnel comparison smears away
      val u = events(s, dir).groupBy("user_id").agg(
        max(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
        max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("p"))
        .withColumn("arm", Sketches.keyHash(col("user_id")) % 2 === 0)
        .withColumn("s2",
          when(col("v") === 1 && col("c") === 1, 1L).otherwise(0L))
        .withColumn("s3",
          when(col("s2") === 1 && col("p") === 1, 1L).otherwise(0L))
      u.select(col("arm"), explode(array(
          struct(lit(2).as("step"), col("v").as("prev"), col("s2").as("conv")),
          struct(lit(3).as("step"), col("s2").as("prev"), col("s3").as("conv"))))
          .as("st"))
        .select(col("arm"), col("st.step").as("step"),
          col("st.prev").as("prev"), col("st.conv").as("conv"))
        .filter(col("prev") === 1)
        .groupBy("step").agg(
          sum(when(col("arm"), 1L).otherwise(0L)).as("n_t"),
          sum(when(col("arm"), col("conv")).otherwise(0L)).as("conv_t"),
          sum(when(!col("arm"), 1L).otherwise(0L)).as("n_c"),
          sum(when(!col("arm"), col("conv")).otherwise(0L)).as("conv_c"))
        .withColumn("p_t", col("conv_t").cast("double") / col("n_t"))
        .withColumn("p_c", col("conv_c").cast("double") / col("n_c"))
        .withColumn("pp", (col("conv_t") + col("conv_c")).cast("double") /
          (col("n_t") + col("n_c")))
        .withColumn("z", when(col("pp") > 0 && col("pp") < 1,
          (col("p_t") - col("p_c")) /
            sqrt((col("pp") * (lit(1.0) - col("pp"))) *
              (lit(1.0) / col("n_t") + lit(1.0) / col("n_c")))))
        .select(col("step"), col("n_t"), col("conv_t"), col("n_c"),
          col("conv_c"), round(col("p_t"), 6).as("p_t"),
          round(col("p_c"), 6).as("p_c"), round(col("z"), 6).as("z"))
        .orderBy("step")
    }),

    "q369_sentence_chunks" -> ((s, dir) =>
      // sentence-aware budget chunking: splits only at sentence
      // boundaries, ~60 tokens per chunk via the cumsum-div pack — every
      // chunk is quotable context, unlike the fixed-window splitter
      Chunker.sentenceChunks(
        tbl(s, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text", budgetTokens = 60)
        .orderBy("doc_id", "chunk_idx")),

    "q370_effective_sample_size" -> ((s, dir) => {
      // Kish effective sample size after near-dup clustering: (Σw)²/Σw²
      // over cluster sizes — the honest independent-example count the
      // raw row count overstates under duplication
      val d = tbl(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      val clusters = Dedup.dedupClusters(pairs, "doc_a", "doc_b")
      Dedup.effectiveSampleSize(clusters.select("cluster_rep"),
        "cluster_rep", 2L * d.count())
    }),

    "q371_access_coverage" -> ((s, dir) =>
      // LFU-ideal cache coverage of the event key space: the hit-rate
      // curve at 5/10/25/50 pinned keys — the knee is the capacity
      // answer, independent of any eviction policy
      Profiling.accessCoverage(events(s, dir)
          .filter(col("props").rlike("\"k\": \\d+"))
          .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1)
            .cast("int").as("k")),
        "k", Seq(5, 10, 25, 50))
        .orderBy("cache_size")),

    "q372_logrank" -> ((s, dir) => {
      // survival-aware A/B: log-rank test of user-lifetime curves under
      // the production hash arms — the censoring-correct replacement for
      // a mean-lifetime t-test (q251's life-table construction)
      val per = events(s, dir).groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      val gmax = per.agg(max("t1").as("gm"))
      val life = per.crossJoin(broadcast(gmax))
        .select(col("user_id"), expr("(t1 - t0) div 3600000000").as("t"),
          (col("t1") < col("gm") - lit(43200000000L)).as("observed"))
        .withColumn("arm", Sketches.keyHash(col("user_id")) % 2 === 0)
      Stats.logRank(life, "arm", "t", "observed")
    }),

    "q373_expected_steps" -> ((s, dir) => {
      // expected steps to purchase from each session state (value
      // iteration v ← 1 + Pv, 4-round horizon) — the "how far from
      // converting" companion to q318's reach probability
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      val p = events(s, dir)
        .select("user_id", "event_id", "ts", "event_type")
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("_gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("from_type").isNotNull && col("_gap") <= gapUs)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      GraphAnalytics.absorbingSteps(p, "from_type", "to_type", "n",
          "purchase", rounds = 4)
        .orderBy("state")
    }),

    "q374_charclass_entropy" -> ((s, dir) =>
      // tokenizer-free gibberish screen: Shannon entropy of per-doc
      // character-class bigram transitions — prose is regular, encoded
      // blobs and key-mash switch classes erratically
      TextQuality.charClassEntropy(tbl(s, dir, "documents"),
          "doc_id", "text")
        .orderBy("doc_id")),

    "q375_drift_auc" -> ((s, dir) => {
      // probabilistic-index drift effect size: the exact Mann-Whitney
      // AUC of purchase values labeled by half — P(post > pre), the
      // robust how-big companion to KS/PSI's is-there-drift
      val ev = events(s, dir).filter(col("value").isNotNull)
        .select(expr(
          "cast(datediff(cast(ts as date), date'1970-01-01') div 7 as int)")
          .as("wk"),
          round(col("value") * 100).cast("long").as("v100"))
      val b = ev.agg(min("wk").as("w0"), max("wk").as("w1"))
      val tagged = ev.crossJoin(broadcast(b))
        .withColumn("post", col("wk") >= expr("(w0 + w1 + 1) div 2"))
      Evaluation.aucByRankSum(tagged.select(col("v100"), col("post")),
        "v100", "post")
    }),

    "q376_simpsons_paradox" -> ((s, dir) => {
      // Simpson's-paradox audit: the aggregate discount→quantity
      // correlation sign vs every per-brand sign — when the segments
      // outvote the aggregate, the aggregate is the confounded number
      val j = tbl(s, dir, "lineitem")
        .join(broadcast(tbl(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      // ONE fact scan: per-brand decimal sufficient statistics; the
      // global statistics are the exact decimal re-sum of the per-brand
      // partials (decimal addition is associative), so the aggregate
      // correlation costs a ~25-row aggregate, not a second scan
      val d24 = (c: Column) => c.cast("decimal(24,6)")
      val x = col("l_discount"); val y = col("l_quantity")
      val st = j.groupBy("p_brand").agg(count(lit(1)).as("n"),
        sum(d24(x)).as("dsx"), sum(d24(y)).as("dsy"),
        sum(d24(x * x)).as("dsxx"), sum(d24(y * y)).as("dsyy"),
        sum(d24(x * y)).as("dsxy"))
      def corrOf(d: DataFrame): Column = {
        val n = col("n")
        val sx = col("dsx").cast("double"); val sy = col("dsy").cast("double")
        val sxx = col("dsxx").cast("double"); val syy = col("dsyy").cast("double")
        val sxy = col("dsxy").cast("double")
        round((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
      }
      val per = st.select(col("p_brand"), corrOf(st).as("corr"))
        .filter(col("corr").isNotNull && !isnan(col("corr")))
      val glob = st.agg(sum("n").as("n"), sum("dsx").as("dsx"),
          sum("dsy").as("dsy"), sum("dsxx").as("dsxx"),
          sum("dsyy").as("dsyy"), sum("dsxy").as("dsxy"))
      val globc = glob.select(corrOf(glob).as("global_corr"))
      per.crossJoin(broadcast(globc))
        .agg(max("global_corr").as("global_corr"),
          count(lit(1)).as("n_segments"),
          sum(when(signum(col("corr")) === signum(col("global_corr")), 1L)
            .otherwise(0L)).as("n_agree"),
          sum(when(signum(col("corr")) =!= signum(col("global_corr")), 1L)
            .otherwise(0L)).as("n_disagree"))
        .withColumn("paradox", col("n_disagree") > col("n_agree"))
    }),

    "q377_event_study" -> ((s, dir) => {
      // event study around month starts: mean daily volume at offsets
      // −3..+3 from each anchor vs the all-days baseline — the
      // descriptive launch-impact plot before any causal claim
      val daily = events(s, dir).select(to_date(col("ts")).as("d"))
        .groupBy("d").agg(count(lit(1)).as("n"))
        .withColumn("day",
          expr("cast(datediff(d, date'1970-01-01') as long)"))
      val anchors = daily.filter(dayofmonth(col("d")) === 1)
        .select(col("day").as("a"))
      val base = daily.agg(
        (sum(col("n").cast("decimal(38,0)")).cast("double") /
          count(lit(1))).as("baseline"))
      anchors.crossJoin(daily.select(col("day"), col("n")))
        .withColumn("off", col("day") - col("a"))
        .filter(col("off").between(-3, 3))
        .groupBy("off").agg(count(lit(1)).as("n_days"),
          (sum(col("n").cast("decimal(38,0)")).cast("double") /
            count(lit(1))).as("mean_n"))
        .crossJoin(broadcast(base))
        .select(col("off"), col("n_days"), round(col("mean_n"), 6)
          .as("mean_n"),
          round(col("mean_n") / col("baseline"), 6).as("lift"))
        .orderBy("off")
    }),

    "q378_graph_store" -> ((s, dir) => {
      // the persisted navigable-graph index end-to-end (the reference's
      // stored-HNSW behavior, vector_store.py:266-271): build the q119
      // NN-descent-refined kNN graph ONCE, persist it bucketed by node id
      // (GraphStore.write), then serve the q129 beam search FROM THE
      // STORE — each round's neighbor fetch is a partition-pruned point
      // lookup of the beam's buckets, so a standing corpus pays the
      // O(N·k·deg) build once and every session probe reads O(beam)
      // directories of a store three orders smaller than the corpus
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding", "vec_id",
          centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val base = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      graft.plans.VectorExpressions.register(s)
      val ring = e.select(col("vec_id").as("id"), col("embedding").as("_lv"))
        .join(e.select((col("vec_id") - 1).as("id"), col("vec_id").as("nbr_id"),
          col("embedding").as("_rv")), Seq("id"))
        .select(col("id"), col("nbr_id"),
          call_function("graft_cosine_distance", col("_lv"), col("_rv")).as("distance"))
      val seed = base.select(col("id"), col("nbr_id"), col("distance"))
        .unionByName(ring)
      val refined = Similarity.nnDescentRefine(seed, e, "embedding", "vec_id", 3)
      val root = sys.props("java.io.tmpdir") + s"/graft-graph-store-$tmpToken"
      store.GraphStore.write(refined, root, nBuckets = 16)
      store.GraphStore.beamSearch(s, root, nBuckets = 16, e, "embedding",
          "vec_id", queryId = 5L, entryIds = Seq(0L, 1L, 2L, 3L),
          beam = 8, iters = 2, k = 5)
        .select(col("rank"), col("vec_id"),
          round(col("distance"), 6).as("distance"))
        .orderBy("rank")
    }),

    "q379_ocr_roundtrip" -> ((s, dir) => {
      // deterministic OCR at corpus scale — the scanned-page half of deep
      // parse (S5, the reference's Docling do_ocr, document.py:192-222):
      // every document's first 40 chars are RENDERED to a real PNG page
      // with the fixed 5×7 font, decoded back through the JDK codec, and
      // template-matched to text again; `match` proves
      // ocr(render(text)) == normalize(text) on every row. Both codec
      // legs are map-side — the whole pipeline rides the scan stage
      val pages = operators.Multimodal.renderTextPages(
        tbl(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", chars = 40, cols = 20)
      val expected = regexp_replace(upper(substring(col("text"), 1, 40)),
        lit("[^A-Z0-9 ]"), lit(" "))
      operators.Multimodal.ocrColumn(pages, "page_png")
        .withColumn("ocr_flat",
          rtrim(regexp_replace(col("ocr_text"), lit("\n"), lit(""))))
        .select(col("doc_id"),
          length(rtrim(expected)).cast("int").as("n_chars"),
          col("ocr_flat").as("ocr_text"),
          (col("ocr_flat") === rtrim(expected)).as("match"))
        .orderBy("doc_id")
    }),

    "q380_ops_lifecycle" -> ((s, dir) => {
      // the ops lifecycle end-to-end, oracle-gating the spec-only residue
      // in ONE flow: bounded ZIP ingest (S11) → filename-alias compaction
      // (P8) → chunk + LangChain-shaped JSON sink/source round-trip (S7)
      // → job state machine with a reaped-stale archive (ST2) → divmod
      // question apportioning (A7) → identifier-validated view (P10) +
      // SELECT-only guard (G3) + result-set cap (R7). The fixture zips
      // are generated from the documents table, so every output column is
      // a pure SQL function of (doc_id, text) the oracle restates
      import java.util.zip.{ZipEntry, ZipOutputStream}
      val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft-ops-$tmpToken")
      val zipDir = new java.io.File(root, "zips"); zipDir.mkdirs()
      val docs = tbl(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      (0 until 4).foreach { a =>
        val zout = new ZipOutputStream(new java.io.FileOutputStream(
          new java.io.File(zipDir, s"batch$a.zip")))
        docs.filter { case (id, _) => id / 10 == a }.foreach { case (id, text) =>
          val name = if (id % 10 == 7) s"a very long name for doc $id.txt"
                     else s"doc$id.txt"
          zout.putNextEntry(new ZipEntry(name))
          zout.write(text.getBytes("UTF-8")); zout.closeEntry()
        }
        zout.close()
      }
      val entries = sources.ZipIngest.explodeArchives(s, zipDir.getAbsolutePath)
        .filter(col("ok"))
        .withColumn("doc_id",
          regexp_extract(col("entry_name"), "(\\d+)\\.txt$", 1).cast("long"))
        .withColumn("archive", expr("cast(doc_id div 10 as int)"))
        .withColumn("text", col("content").cast("string"))
      val aliasUdf = udf(store.VectorStore.filenameAlias _)
      val aliased = entries.withColumn("alias", aliasUdf(col("entry_name")))
      val chunks = Chunker.chunkWithIds(
          aliased.select(col("doc_id"), col("text")), "doc_id", "text", 200, 50)
        .select(col("chunk_id").as("id"), col("chunk").as("text"),
          map(lit("doc_id"), col("doc_id").cast("string")).as("metadata"))
      val cjPath = new java.io.File(root, "chunks").getAbsolutePath
      sources.ChunkJson.write(chunks, cjPath)
      val counts = sources.ChunkJson.read(s, cjPath)
        .withColumn("doc_id", col("metadata")("doc_id").cast("long"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      // ST2: queued→running→heartbeat→succeeded for archives 0-2; archive
      // 3 never heartbeats and is reaped to failed("stale")
      import streaming.JobTracker
      val jobs = (0 until 4).map { a =>
        val t0 = a * 1000L
        var j = JobTracker.Job(s"batch$a.zip", JobTracker.Queued, t0, t0)
        j = JobTracker.transition(j, JobTracker.Running, t0 + 1000)
        if (a != 3) {
          j = JobTracker.heartbeat(j, t0 + 30000)
          j = JobTracker.transition(j, JobTracker.Succeeded, t0 + 60000)
        }
        j
      }
      val reaped = JobTracker.reapStale(jobs, now = 400000L)
      import s.implicits._
      val jobsDf = reaped.map(j => (j.id, j.status.toString.toLowerCase,
          j.error.orNull)).toDF("job_id", "job_status", "job_error")
        .withColumn("archive",
          regexp_extract(col("job_id"), "(\\d+)", 1).cast("int"))
      val quotaDf = testbed.Testbed.apportion(25, 4).zipWithIndex
        .map { case (q, i) => (i, q) }.toDF("archive", "q_quota")
      val rollup = aliased.select(col("doc_id"), col("entry_name"),
          col("alias"), col("archive"))
        .join(counts, Seq("doc_id"), "left")
        .withColumn("n_chunks", coalesce(col("n_chunks"), lit(0L)))
        .join(broadcast(jobsDf.select("archive", "job_status", "job_error")),
          Seq("archive"))
        .join(broadcast(quotaDf), Seq("archive"))
      require(plans.SecureViews.isValidIdentifier("graft_ops_rollup"))
      rollup.createOrReplaceTempView("graft_ops_rollup")
      plans.SelectOnly.executeCapped(s,
        "SELECT doc_id, entry_name, alias, archive, n_chunks, job_status, " +
          "job_error, q_quota FROM graft_ops_rollup ORDER BY doc_id LIMIT 25",
        maxRows = 30)
    }),

    "q381_rag_combined" -> ((s, dir) => {
      // the flagship COMBINED chat route end-to-end with deterministic
      // slots (the reference's multi_tool.py:141-181 shape): classify →
      // vecsearch / nl2sql / BOTH branches → grade-gated answer →
      // synthesis, with per-step token-usage folding (A5) riding along.
      // Three questions hit the three classifier outcomes; every answer
      // string, doc count, and token total is restated by the oracle
      // from embeddings + documents alone — the L2-L7 slot plumbing,
      // route resolution, and usage fold are what is being gated
      import pipeline.RagPipeline
      import pipeline.RagPipeline.TokenUsage
      val e = tbl(s, dir, "embeddings")
      def storeOf(parity: Int) = e.filter(col("label") % 2 === parity)
        .select(col("vec_id").as("id"),
          concat(lit("vec-"), col("vec_id") % 50).as("text"), col("embedding"))
      val stores = Map("docs_even" -> storeOf(0), "docs_odd" -> storeOf(1))
      val vecMap = e.filter(col("vec_id").isin(3L, 7L))
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val embedFn: pipeline.Embedder.EmbedFn = texts => texts.map { t =>
        vecMap("\\d+".r.findFirstIn(t).map(_.toLong).getOrElse(3L))
      }
      def tok(t: String): Long = t.split("\\s+").count(_.nonEmpty).toLong
      tbl(s, dir, "documents").createOrReplaceTempView("graft_docs")
      val usages = scala.collection.mutable.ListBuffer.empty[TokenUsage]
      var label: String = null
      val slots = RagPipeline.Slots(
        classify = q => {
          usages += TokenUsage(tok(q), 1)
          label = if (q.startsWith("summarize")) "both"
                  else RagPipeline.Slots().classify(q)
          label
        },
        answer = (q, docs) => {
          val a = s"[$q] -> ${docs.size} docs"
          usages += TokenUsage(tok(q), tok(a)); a
        },
        synthesize = (q, sa, va) => {
          val out = s"$sa\n$va"
          usages += TokenUsage(tok(sa) + tok(va), tok(out)); out
        },
        grade = (_, d) => d.nonEmpty)
      val runSql: String => String = q => {
        val n = plans.SelectOnly.executeCapped(s,
          "SELECT count(*) AS n FROM graft_docs").head().getLong(0)
        val a = s"docs=$n"
        usages += TokenUsage(tok(q), tok(a)); a
      }
      val qs = Seq((0, "describe vec 3 design patterns"),
        (1, "how many documents total"), (2, "summarize vec 7 blend"))
      val rows = qs.map { case (qi, qtext) =>
        usages.clear(); label = null
        val res = RagPipeline.execute(s, stores, qtext, Nil, embedFn, runSql,
          cfg = RagPipeline.Config(gradeEnabled = true), slots = slots,
          vecSearchEnabled = true, nl2sqlEnabled = true)
        val u = TokenUsage.fold(usages.toSeq)
        (qi, label, res.route.toString.toLowerCase, res.docs.count(),
          u.prompt, u.completion, res.answer)
      }
      import s.implicits._
      rows.toDF("q_id", "label", "route", "n_docs", "prompt_tokens",
          "completion_tokens", "answer")
        .withColumn("q_id", col("q_id").cast("int"))
        .orderBy("q_id")
    }),

    "q382_graph_merge" -> ((s, dir) => {
      // incremental insert into the persisted graph index (the HNSW
      // insert shape): base graph on the even-id corpus is STORED, the
      // odd-id batch merges in — exact forward edges + reverse links,
      // touched lists re-trimmed to k, only O(batch·k) buckets swapped.
      // The oracle restates the merged adjacency exactly (old bucket-
      // local edges ∪ new↔NNk links, re-ranked), so hash equality proves
      // the store merge adds no semantics beyond the stated insert rule
      val e = tbl(s, dir, "embeddings")
      val old = e.filter(col("vec_id") % 2 === 0)
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(old, "embedding",
          "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      val root = sys.props("java.io.tmpdir") + s"/graft-graph-merge-$tmpToken"
      store.GraphStore.write(graph, root, nBuckets = 16)
      val batch = e.filter(col("vec_id") % 2 === 1 && col("vec_id") < 100)
      store.GraphStore.merge(s, root, nBuckets = 16, old, batch,
        "embedding", "vec_id", k = 3)
      s.read.parquet(root).filter(col("id") < 100)
        .select(col("id"), col("rank"), col("nbr_id"),
          round(col("distance"), 6).as("distance"))
        .orderBy("id", "rank")
    }),

    "q383_hits" -> ((s, dir) => {
      // HITS hubs & authorities over the supplier→part supply graph —
      // the mutual-reinforcement complement of PageRank: a hub supplier
      // ships many authoritative parts. Two L2-normalized sweeps, every
      // sum decimal-accumulated so all intermediates replay bit-for-bit
      val scored = GraphAnalytics.hits(
        tbl(s, dir, "lineitem").select(col("l_suppkey"), col("l_partkey")),
        "l_suppkey", "l_partkey", iters = 2)
      val w = Window.partitionBy("kind")
        .orderBy(col("score").desc, col("id").asc)
      scored.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 20)
        .select(col("kind"), col("rank"), col("id"),
          round(col("score"), 6).as("score"))
        .orderBy("kind", "rank")
    }),

    "q384_gini_stump" -> ((s, dir) => {
      // exact best-split decision stump: which threshold on the props.k
      // feature best separates purchases from the rest by Gini impurity
      // — all-integer arithmetic (no ln), every candidate scored, argmin
      // flagged; the primitive behind tree learners and binning audits
      val ev = events(s, dir).select(
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        (col("event_type") === "purchase").as("is_purchase"))
      Stats.giniStump(ev, "k", "is_purchase").orderBy("threshold")
    }),

    "q385_deep_ingest" -> ((s, dir) => {
      // deep parsing through the REAL loadCorpus path: a mixed corpus of
      // plain text files and rendered scanned-page PNGs, parsed with
      // deep = true — txt flows through the markdown structurer
      // (identity on these single-line lowercase docs), PNGs through the
      // fixed-font OCR; every text length is a pure SQL function of the
      // source document
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-deep-$tmpToken/corpus")
      root.mkdirs()
      tbl(s, dir, "documents").filter(col("doc_id") < 15)
        .select(col("doc_id"), col("text")).collect().foreach { r =>
          val (id, text) = (r.getLong(0), r.getString(1))
          java.nio.file.Files.write(
            new java.io.File(root, s"doc$id.txt").toPath,
            text.getBytes("UTF-8"))
          java.nio.file.Files.write(
            new java.io.File(root, s"scan$id.png").toPath,
            sources.Ocr.renderPagePng(text.take(20), cols = 20))
        }
      sources.DocumentSource.loadCorpus(s, root.getAbsolutePath, deep = true)
        .select(col("filename"), col("ext"), col("parse_ok"),
          length(col("text")).cast("int").as("text_len"))
        .orderBy("filename")
    }),

    "q386_extractive_summary" -> ((s, dir) => {
      // centroid extractive summarization: per doc, the two 12-token
      // pseudo-sentences whose hashed-bigram vectors are most cosine-
      // similar to the document centroid — n cancels in the cosine, so
      // the score is integer sums into two exact sqrts and one divide
      TextQuality.extractiveSummary(tbl(s, dir, "documents")
          .filter(col("doc_id") < 200), "doc_id", "text",
          lineTokens = 12, buckets = 64, topK = 2)
        .orderBy("doc_id", "rank")
    }),

    "q387_table_checksum" -> ((s, dir) => {
      // replica-equality checksum of lineitem keyed by its identity +
      // flag columns: order/partitioning-independent bucket digests plus
      // a root row — how two 100 TB copies compare without moving data
      Profiling.tableChecksum(tbl(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_returnflag", "l_linestatus"), buckets = 16)
    }),

    "q388_mcnemar" -> ((s, dir) => {
      // McNemar's paired test on the two quality gates (Gopher rules vs
      // the hashed-bigram classifier): the discordant counts b/c decide
      // whether the gates disagree systematically — χ² = (b−c)²/(b+c),
      // pure rational arithmetic over exact counts
      val d = tbl(s, dir, "documents")
      val paired = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), (col("margin") > 0).as("cls_pass"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
      paired.agg(count(lit(1)).as("n"),
          sum(when(col("quality_pass") && col("cls_pass"), 1L)
            .otherwise(0L)).as("n_both"),
          sum(when(col("quality_pass") && !col("cls_pass"), 1L)
            .otherwise(0L)).as("n_gopher_only"),
          sum(when(!col("quality_pass") && col("cls_pass"), 1L)
            .otherwise(0L)).as("n_cls_only"),
          sum(when(!col("quality_pass") && !col("cls_pass"), 1L)
            .otherwise(0L)).as("n_neither"))
        .withColumn("mcnemar_chi2",
          when(col("n_gopher_only") + col("n_cls_only") > 0, round(
            ((col("n_gopher_only") - col("n_cls_only")) *
             (col("n_gopher_only") - col("n_cls_only"))).cast("double") /
              (col("n_gopher_only") + col("n_cls_only")), 6)))
    }),

    "q389_isotonic" -> ((s, dir) => {
      // EXACT isotonic calibration of the q159 reliability diagram via
      // the closed max-min PAV form — no sequential pooling loop, fully
      // declarative over the 10-bin frame, so the non-decreasing
      // calibrated rate replays bit-for-bit in the oracle
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), col("margin"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
      val bins = Evaluation.calibrationBins(scored, "margin",
        "quality_pass", nBins = 10)
      Evaluation.isotonicFit(bins, "bin", "n", "n_pos")
        .select(col("bin"), col("n"), col("n_pos"), col("frac_pos"),
          round(col("iso"), 6).as("iso"))
        .orderBy("bin")
    }),

    "q390_ring_shard" -> ((s, dir) =>
      // consistent-hash ring with 8 vnodes/node: per current node, keys
      // resident and keys that move when a 5th node joins — expect ≈1/5
      // moving, all onto the newcomer (no peer-to-peer churn)
      DataLayout.ringMovement(tbl(s, dir, "documents").select(col("doc_id")),
          "doc_id", nNodes = 4, vnodes = 8)
        .orderBy("node")),

    "q391_pinball" -> ((s, dir) => {
      // quantile-forecast gate: the train fold's exact p90 of purchase
      // value per type, scored by pinball loss (τ=0.9) on the held-out
      // fold — integer loss sums, one final division
      val ev = events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast("long").as("v100"))
      Stats.pinballEval(ev, "event_type", "event_id", "v100")
        .orderBy("event_type")
    }),

    "q392_kneser_ney" -> ((s, dir) =>
      // KenLM's own smoothing, exact-replay: top-25 bigrams with MLE vs
      // interpolated-KN probability — discount D = n1/(n1+2n2) and the
      // continuation-unigram back-off, all from BIGINT corpus counts
      NgramLm.knSmoothedBigrams(tbl(s, dir, "documents"), "doc_id",
          "text", k = 25)
        .orderBy(col("c_bg").desc, col("ctx"), col("w2"))),

    "q393_good_turing" -> ((s, dir) =>
      // bigram count-of-counts: Turing r* re-estimates and the
      // unseen-mass bound p0 = N1/N the crawl-more decision reads
      NgramLm.goodTuringCounts(tbl(s, dir, "documents"), "doc_id", "text",
          maxR = 8)
        .orderBy("r")),

    "q394_holt" -> ((s, dir) =>
      // level+trend forecast of daily event volume per type: Holt
      // double-exponential fold, bit-identical left fold on both
      // engines (the q251 list_reduce discipline)
      Stats.holtSmoothing(
          events(s, dir).groupBy(col("event_type"),
              to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "day", "n_events")
        .orderBy("event_type")),

    "q395_page_hinkley" -> ((s, dir) =>
      // online drift monitor per event type: Page-Hinkley deviation
      // from the RUNNING mean (δ=0), alarm at λ=10 — the one-pass
      // complement of q252's whole-series CUSUM; decimal prefix sums
      Stats.pageHinkley(
          events(s, dir).groupBy(col("event_type"),
              to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "day", "n_events", delta = 0.0, lambda = 10.0)
        .orderBy("event_type")),

    "q396_encoding_audit" -> ((s, dir) =>
      // mojibake gate over a deterministically corrupted twin corpus:
      // every 3rd doc gets the classic UTF-8-as-Latin-1 ruins appended;
      // the audit must flag exactly those, by pure string-op counts
      TextQuality.encodingAudit(
          tbl(s, dir, "documents").select(col("doc_id"),
            when(col("doc_id") % 3 === 0,
              concat(col("text"), lit(" caffÃ¨ â€” naÃ¯ve Â»")))
              .otherwise(col("text")).as("text")),
          "doc_id", "text")
        .orderBy("doc_id")),

    "q397_jackknife" -> ((s, dir) =>
      // delete-one-stratum jackknife variance of the purchase/view
      // ratio over 10 user shards — the resampling-free error bar a
      // sharded pipeline gets from its own partial sums
      Stats.jackknifeRatio(
          events(s, dir).select(pmod(col("user_id"), lit(10L)).as("stratum"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("num"),
            when(col("event_type") === "view", 1L).otherwise(0L).as("den")),
          "stratum", "num", "den")
        .orderBy("stratum")),

    "q398_cvm_test" -> ((s, dir) =>
      // Cramér-von Mises two-sample drift: even/odd user arms over
      // event value cents per type — integrates the WHOLE ECDF gap
      // (KS sup misses mid-distribution shifts); exact decimal(38,0)
      // numerator, one final division
      Stats.cramerVonMises(
          events(s, dir).filter(col("value").isNotNull)
            .select(col("event_type"), (col("user_id") % 2 === 0).as("armA"),
              round(col("value") * 100).cast("long").as("v100")),
          "event_type", "armA", "v100")
        .orderBy("event_type")),

    "q399_cramers_v" -> ((s, dir) =>
      // pairwise categorical association over lineitem's 4 label
      // columns from ONE fact scan (joint cube, then 6 pairwise
      // rollups of the cube — never 6 fact scans)
      Profiling.cramersVMatrix(tbl(s, dir, "lineitem"),
          Seq("l_returnflag", "l_linestatus", "l_linenumber",
            "l_quantity"))
        .orderBy("col_a", "col_b")),

    "q400_segmented_trend" -> ((s, dir) =>
      // where does the TREND break: best single changepoint per event
      // type by two-segment OLS SSE from exact BIGINT prefix sums —
      // completes the changepoint triad (CUSUM level / PH online /
      // segmented trend)
      Stats.segmentedTrend(
          events(s, dir).groupBy(col("event_type"),
              to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "day", "n_events", minSeg = 5)
        .orderBy("event_type")),

    "q401_perm_by_group" -> ((s, dir) =>
      // one exact permutation p-value PER event type (the q350 chain,
      // grouped) — the raw material multiple-testing correction needs
      Stats.permutationTestPerGroup(
          events(s, dir).filter(col("value").isNotNull)
            .select(col("event_type"), col("user_id"),
              round(col("value") * 100).cast("long").as("v100")),
          "event_type", "user_id", "v100", nPerms = 64)
        .orderBy("event_type")),

    "q402_bh_fdr" -> ((s, dir) => {
      // Benjamini-Hochberg step-up at q = 1/4 over the q401 p-values —
      // the step-up condition in pure integer arithmetic
      val pt = Stats.permutationTestPerGroup(
          events(s, dir).filter(col("value").isNotNull)
            .select(col("event_type"), col("user_id"),
              round(col("value") * 100).cast("long").as("v100")),
          "event_type", "user_id", "v100", nPerms = 64)
        .select(col("event_type"), (col("n_extreme") + 1).as("p_num"),
          (col("n_perms") + 1).as("p_den"))
      Evaluation.bhFdr(pt, "event_type", "p_num", "p_den",
          qNum = 1L, qDen = 4L)
        .orderBy("rank")
    }),

    "q403_sigmoid_calibration" -> ((s, dir) => {
      // Platt-style parametric calibration of the q159 reliability
      // diagram with the ALGEBRAIC sigmoid (libm-free) — 12 unrolled
      // gradient steps, decimal-accumulated gradient sums
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), col("margin"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
      val bins = Evaluation.calibrationBins(scored, "margin",
          "quality_pass", nBins = 10)
        .select(((col("bin").cast("double") + lit(0.5)) / lit(10.0) -
          lit(0.5)).as("x"), col("n"), col("n_pos"))
      Evaluation.sigmoidCalibration(bins, "x", "n", "n_pos",
        iters = 12, step = 2.0)
    }),

    "q404_hilbert_skipping" -> ((s, dir) => {
      // q255 extended with the Hilbert layout: same 200-row files, same
      // box predicate — the Hilbert walk's no-diagonal-jump property
      // should prune at least as many files as Morton order
      val li = tbl(s, dir, "lineitem").select(
        (col("l_partkey") % 16).as("px"), (col("l_suppkey") % 16).as("sy"),
        col("l_orderkey"), col("l_linenumber"))
      val (loX, hiX, loY, hiY) = (lit(4L), lit(7L), lit(8L), lit(11L))
      def stats(ordered: DataFrame) = DataLayout.skipStats2D(
        ordered, expr("(_rn - 1) div 200"), col("px"), col("sy"),
        loX, hiX, loY, hiY)
      val lex = stats(li.withColumn("_rn", row_number().over(
        Window.orderBy("px", "sy", "l_orderkey", "l_linenumber"))))
      val zord = stats(li
        .withColumn("zv", DataLayout.zValue2(col("px"), col("sy"), 4))
        .withColumn("_rn", row_number().over(
          Window.orderBy("zv", "l_orderkey", "l_linenumber"))))
      val hilb = stats(li
        .withColumn("hv", DataLayout.hilbertValue2(col("px"), col("sy"), 4))
        .withColumn("_rn", row_number().over(
          Window.orderBy("hv", "l_orderkey", "l_linenumber"))))
      DataLayout.skipSummary(Seq("x_then_y" -> lex, "zorder" -> zord,
          "hilbert" -> hilb))
        .orderBy("layout")
    }),

    "q405_mixture_waterfill" -> ((s, dir) => {
      // the actual sampling plan behind a data-mixture card: closed-form
      // water-fill of a 600k-char budget over per-source availability
      // with rank² weights — heavy-weight sources saturate at sf0.1
      // (mixed case), small corpora take the all-saturated NULL-x* path
      val dom = tbl(s, dir, "documents")
        .groupBy(col("source").as("dom"))
        .agg(sum("n_chars").as("avail"))
        .withColumn("_rn", row_number().over(Window.orderBy("dom"))
          .cast("long"))
        .withColumn("w", col("_rn") * col("_rn"))
      Sampling.mixtureWaterfill(dom, "dom", "avail", "w",
          budget = 600000L)
        .orderBy("dom")
    }),

    "q406_doubly_robust" -> ((s, dir) => {
      // doubly-robust OPE of the greedy per-type arm policy on held-out
      // events: DM anchor + K·IPS correction — same replay as the IPS
      // operator, strictly lower variance
      val ev = events(s, dir).select(col("event_type").as("ctx"),
        pmod(col("user_id"), lit(3L)).as("act"),
        coalesce(round(col("value") * 100).cast("long"), lit(0L)).as("r"),
        col("event_id"))
      Evaluation.doublyRobustOpe(
          ev.filter(col("event_id") % 2 === 0),
          ev.filter(col("event_id") % 2 === 1), "ctx", "act", "r")
        .orderBy("ctx")
    }),

    "q407_ucb1_replay" -> ((s, dir) => {
      // UCB1 replay over 3 user-shard arms per event type: daily mean
      // reward (value cents / 10⁴), floor-log2 exploration bonus,
      // regret vs the best fixed arm — the fold runs map-side per type
      val byArm = events(s, dir).filter(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          pmod(col("user_id"), lit(3L)).as("arm"))
        .agg(sum(round(col("value") * 100).cast("long")).as("sv"),
          count(lit(1)).as("cnt"))
      val wide = byArm.groupBy("event_type", "day")
        .agg(
          sum(when(col("arm") === 0, col("sv"))).as("sv0"),
          sum(when(col("arm") === 0, col("cnt"))).as("c0"),
          sum(when(col("arm") === 1, col("sv"))).as("sv1"),
          sum(when(col("arm") === 1, col("cnt"))).as("c1"),
          sum(when(col("arm") === 2, col("sv"))).as("sv2"),
          sum(when(col("arm") === 2, col("cnt"))).as("c2"))
      def rw(sv: String, c: String): Column =
        when(col(c) > 0, col(sv).cast("double") / col(c) / lit(10000.0))
          .otherwise(lit(0.0))
      val rewards = wide.select(col("event_type"), col("day"),
        rw("sv0", "c0").as("r0"), rw("sv1", "c1").as("r1"),
        rw("sv2", "c2").as("r2"))
      Stats.ucb1Replay(rewards, "event_type", "day", "r0", "r1", "r2")
        .orderBy("event_type")
    }),

    "q408_ipf_rake" -> ((s, dir) =>
      // rake the (source × lang) corpus grid to uniform margins in 6
      // IPF rounds — the reweighting that balances both axes at once
      // while keeping the interaction structure
      Sampling.ipfRake(
          tbl(s, dir, "documents").groupBy("source", "lang")
            .agg(count(lit(1)).as("n")),
          "source", "lang", "n", iters = 6)
        .orderBy("source", "lang")),

    "q409_bpe_roundtrip" -> ((s, dir) => {
      // tokenizer integrity + compression curve: after k = 0..3 learned
      // merges, every word must reassemble losslessly from its tokens,
      // and tokens/word falls monotonically — the gate a tokenizer
      // change must pass before re-tokenizing a corpus
      val wc = operators.Bpe.wordCounts(tbl(s, dir, "documents"), "text")
      val merges = operators.Bpe.learnMerges(wc, iters = 3).orderBy("rank")
        .select("sym_a", "sym_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      (0 to 3).map { k =>
        operators.Bpe.applyMerges(wc, merges.take(k))
          .select(lit(k).as("n_merges"), col("word"), col("freq"),
            col("tokens"))
      }.reduce(_ unionByName _)
        .groupBy("n_merges")
        .agg(count(lit(1)).as("n_words"),
          sum(when(concat_ws("", col("tokens")) === col("word"), 1L)
            .otherwise(0L)).as("n_roundtrip_ok"),
          sum(col("freq") * size(col("tokens"))).as("total_tokens"),
          (sum(col("freq") * size(col("tokens"))).cast("double") /
            sum("freq")).as("tokens_per_word"))
        .orderBy("n_merges")
    }),

    "q410_sprt" -> ((s, dir) =>
      // Wald SPRT on the daily share of valued events per type,
      // H0 p=0.45 vs H1 p=0.55 at α=β=0.05 — the sequential monitor
      // that stops EARLY; log-constants baked as identical literals
      Stats.sprtBernoulli(
          events(s, dir).groupBy(col("event_type"),
              to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n"),
              sum(when(col("value").isNotNull, 1L).otherwise(0L)).as("k")),
          "event_type", "day", "n", "k",
          p0 = 0.45, p1 = 0.55, alpha = 0.05, beta = 0.05)
        .orderBy("event_type")),

    "q411_removal_attribution" -> ((s, dir) => {
      // Markov removal-effect attribution over the q318 session chain:
      // drop each channel, re-run the 4-step value iteration, read the
      // conversion drop against the first-touch distribution
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapUs = 30L * 60 * 1000000
      val ev = events(s, dir)
        .select("user_id", "event_id", "ts", "event_type")
      val trans = ev
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("_gap",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("from_type").isNotNull && col("_gap") <= gapUs)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val firsts = ev.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .groupBy(col("event_type").as("ftype"))
        .agg(count(lit(1)).as("fn"))
      GraphAnalytics.removalAttribution(trans, firsts, "from_type",
          "to_type", "n", "ftype", "fn", target = "purchase", rounds = 4,
          channels = Seq("click", "error", "signup", "view"))
        .orderBy("channel")
    }),

    "q412_calibration_error" -> ((s, dir) => {
      // ECE/MCE scoring of the classifier's probabilities — the
      // one-number companions to the q159 diagram and the q389/q403
      // calibration FITS
      val d = tbl(s, dir, "documents")
      val scored = TextQuality.classifierScore(d, "doc_id", "text")
        .select(col("doc_id"), (col("margin") + lit(0.5)).as("p"))
        .join(TextQuality.gopherMetrics(d, "doc_id", "text")
          .select(col("doc_id"), col("quality_pass")), Seq("doc_id"))
      Evaluation.expectedCalibrationError(scored, "p", "quality_pass",
          nBins = 10)
        .orderBy("bin")
    }),

    "q413_regression_discontinuity" -> ((s, dir) => {
      // sharp RD at activity = 33 (±12 bandwidth): two closed-form OLS
      // lines recentered at the cutoff, effect = intercept gap — the
      // placebo read on smooth synthetic data is ≈ 0, which is the
      // estimator working
      val ev = events(s, dir)
      val d0 = ev.select(col("user_id"), to_date(col("ts")).as("day"),
          col("value"))
        .crossJoin(broadcast(ev.agg(min(to_date(col("ts"))).as("_d0"))))
      val units = d0.groupBy("user_id")
        .agg(sum(when(datediff(col("day"), col("_d0")) < 15, 1L)
          .otherwise(0L)).as("x"),
          sum(when(datediff(col("day"), col("_d0")) >= 15,
            coalesce(round(col("value") * 100).cast("long"), lit(0L)))
            .otherwise(0L)).as("y"))
      Stats.regressionDiscontinuity(units, "x", "y", cutoff = 33L,
        bandwidth = 12L)
    }),

    "q414_caliper_match" -> ((s, dir) => {
      // observational ATT of early errors on later spend: treated =
      // users hitting ≥7 errors in the pre-period (≈ half), matched with
      // replacement to the nearest-activity control within ±2 events —
      // banded bucket join, no all-pairs
      val ev = events(s, dir)
      val d0 = ev.select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"), col("value"))
        .crossJoin(broadcast(ev.agg(min(to_date(col("ts"))).as("_d0"))))
      val units = d0.groupBy("user_id")
        .agg(sum(when(datediff(col("day"), col("_d0")) < 15, 1L)
          .otherwise(0L)).as("score"),
          (sum(when(datediff(col("day"), col("_d0")) < 15 &&
            col("event_type") === "error", 1L).otherwise(0L)) >= 7)
            .as("treated"),
          sum(when(datediff(col("day"), col("_d0")) >= 15,
            coalesce(round(col("value") * 100).cast("long"), lit(0L)))
            .otherwise(0L)).as("y"))
      Stats.caliperMatchAtt(units, "user_id", "treated", "score", "y",
        caliper = 2L)
    }),

    "q415_encoding_advisor" -> ((s, dir) =>
      // parquet-writer's-eye column audit: NDV/dictionary width and
      // natural-order RLE runs for 5 lineitem columns from ONE sort
      // pass — which columns dictionary-encode, which need a re-sort
      DataLayout.encodingAdvisor(tbl(s, dir, "lineitem"),
          Seq("l_orderkey", "l_linenumber"),
          Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
            "l_partkey"))
        .orderBy("col_name")),

    "q416_price_index" -> ((s, dir) => {
      // Laspeyres/Paasche/Fisher 1996→1997 over the common part basket
      // — the fixed-basket price-motion read a revenue decomposition
      // needs; unit prices from exact per-(year, part) cents/qty sums
      val li = tbl(s, dir, "lineitem")
        .join(tbl(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(year(col("o_orderdate")).cast("string").as("yr"),
          col("l_partkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          col("l_quantity").cast("long").as("qty"))
      Stats.priceIndices(li, "yr", "l_partkey", "cents", "qty",
        basePeriod = "1996", curPeriod = "1997")
    }),

    "q417_embedding_drift" -> ((s, dir) =>
      // did the embedding distribution move between snapshot halves:
      // cosine of the two mean vectors, L2 gap, top-8 shifted dims —
      // the re-embed sanity gate for a standing ANN index
      Spectral.snapshotDrift(tbl(s, dir, "embeddings")
          .withColumn("half", col("vec_id") % 2 === 0),
        "embedding", "half", topK = 8)),

    "q418_diameter_sweep" -> ((s, dir) => {
      // double-BFS eccentricity sweep of the (undirected) kNN graph:
      // sweep 2's ecc is a certified diameter lower bound — the
      // navigability read beside q228's expansion rates
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val edges = Similarity.knnGraph(
          Similarity.assignNearestCentroid(e, "embedding", "vec_id",
            centroids, "cid", "cv"), "embedding", "vec_id", k = 3)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      GraphAnalytics.eccentricitySweep(edges, "src", "dst",
        startId = 0L, maxHops = 8)
    }),

    "q419_wl_refinement" -> ((s, dir) => {
      // Weisfeiler-Lehman color curve of the kNN graph: 3 refinement
      // rounds from degree colors — the structural-diversity
      // fingerprint (stabilized classes ≈ the graph's symmetry partition)
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val edges = Similarity.knnGraph(
          Similarity.assignNearestCentroid(e, "embedding", "vec_id",
            centroids, "cid", "cv"), "embedding", "vec_id", k = 3)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      GraphAnalytics.wlRefinement(edges, "src", "dst", rounds = 3)
    }),

    "q420_match_transitivity" -> ((s, dir) => {
      // is ~0.8-Jaccard an equivalence relation in practice: wedge
      // closure ratio over the q20 LSH match edges — low closure means
      // dedup clusters are chains and verification is load-bearing
      val d = tbl(s, dir, "documents")
      // TWO truncation depths per doc so wedges exist by construction:
      // d ~ cut7 and cut7 ~ cut14 match; whether d ~ cut14 closes the
      // triangle is exactly what the audit measures
      val corpus = d.select(col("doc_id"), col("text"))
        .union(d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
        .union(d.select(col("doc_id") + 2000000,
          expr("substring(text, 1, greatest(length(text) - 14, 1))")))
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        shingleN = 5, numHashes = 64, bands = 8, threshold = 0.8)
      Dedup.matchTransitivityAudit(pairs, "doc_a", "doc_b")
    }),

    "q421_dh_stratify" -> ((s, dir) =>
      // Dalenius-Hodges cum-√f boundaries on order value cents (50
      // bins → 4 strata) — the boundary rule Neyman allocation (q338)
      // wants as input
      Sampling.dhStratify(
          tbl(s, dir, "orders").select(
            round(col("o_totalprice") * 100).cast("long").as("cents")),
          "cents", nBins = 50, nStrata = 4)
        .orderBy("stratum")),

    "q422_brandes" -> ((s, dir) => {
      // single-source Brandes dependency on the kNN graph: exact path
      // counts forward, dependency backprop by level — top-20 broker
      // nodes; sampled-pivot betweenness is this × K sources
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val edges = Similarity.knnGraph(
          Similarity.assignNearestCentroid(e, "embedding", "vec_id",
            centroids, "cid", "cv"), "embedding", "vec_id", k = 3)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      GraphAnalytics.brandesDependency(edges, "src", "dst",
        sourceId = 0L, maxDepth = 6, topK = 20)
    }),

    "q423_overdispersion" -> ((s, dir) =>
      // is daily volume Poisson: variance-to-mean ratio per event type
      // — VMR ≫ 1 invalidates Poisson alert thresholds
      Stats.overdispersionGate(
          events(s, dir).groupBy(col("event_type"),
              to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "n_events", threshold = 1.5)
        .orderBy("event_type")),

    "q424_two_pass_median" -> ((s, dir) =>
      // exact median of order cents WITHOUT a global sort: coarse
      // histogram locates the bucket, only that bucket rescans — the
      // 100 TB median plan (scan_frac shows the win)
      Stats.twoPassMedian(
          tbl(s, dir, "orders").select(
            round(col("o_totalprice") * 100).cast("long").as("cents")),
          "cents", coarseBins = 256)),

    "q425_rbo" -> ((s, dir) => {
      // how much did RRF fusion move the top-10: rank-biased overlap
      // (p=0.9) between the lexical BM25 ranking and the fused hybrid —
      // top-weighted, handles non-conjoint lists, coefficient literals
      val lex = Retrieval.bm25(tbl(s, dir, "documents"), "doc_id",
          "text", Seq("spark", "join", "vector", "window"), 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("id"), col("rank"))
      val e = tbl(s, dir, "embeddings")
      val dense = Similarity.topKBatch(e, "embedding", "vec_id",
          e.filter(col("vec_id") === 0).select(col("vec_id").as("qid"),
            col("embedding").as("qv")), "qv", "qid", 20)
        .select(col("vec_id").as("id"), col("rank"))
      val fused = Retrieval.rrfFuse(Seq(lex, dense), "id", 10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rrf_score").desc, col("id").asc)))
        .select(col("id"), col("rank"))
      Evaluation.rankBiasedOverlap(lex, fused, "id", "rank",
        depth = 10, p = 0.9)
    }),

    "q426_join_cardinality" -> ((s, dir) =>
      // System-R uniform-NDV estimates vs EXACT join cardinalities
      // (computed from key-level counts, never the join itself) — the
      // q-error readout that says which joins will surprise a planner
      Profiling.joinCardinalityQa(Seq(
          ("orders_customer", tbl(s, dir, "orders"), "o_custkey",
            tbl(s, dir, "customer"), "c_custkey"),
          ("lineitem_part", tbl(s, dir, "lineitem"), "l_partkey",
            tbl(s, dir, "part"), "p_partkey"),
          ("lineitem_orders", tbl(s, dir, "lineitem"), "l_orderkey",
            tbl(s, dir, "orders"), "o_orderkey")))
        .orderBy("join_label")),

    "q427_bloom_fpr" -> ((s, dir) => {
      // empirical Bloom false-positive rate on known non-members vs the
      // fill^k approximation — validates the q140 runtime-filter params
      val o = tbl(s, dir, "orders").select(col("o_orderkey"))
      Sketches.bloomFprAudit(
        o.filter(col("o_orderkey") % 7 === 0), "o_orderkey",
        o.filter(col("o_orderkey") % 7 =!= 0), "o_orderkey",
        mBits = 65536, kHashes = 3)
    }),

    "q428_sampled_betweenness" -> ((s, dir) => {
      // Brandes & Pich sampled betweenness: the q422 machinery averaged
      // over 3 pivots — the practical centrality estimator at scale
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val edges = Similarity.knnGraph(
          Similarity.assignNearestCentroid(e, "embedding", "vec_id",
            centroids, "cid", "cv"), "embedding", "vec_id", k = 3)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      GraphAnalytics.sampledBetweenness(edges, "src", "dst",
        sources = Seq(0L, 7L, 13L), maxDepth = 6, topK = 20)
    }),

    "q429_qq_shift" -> ((s, dir) => {
      // WHERE did the value distribution move: per-type decile table
      // pre vs post half — the quantile-resolved companion to q398's
      // scalar CvM verdict
      val ev = events(s, dir).filter(col("value").isNotNull)
      val base = ev.select(col("event_type"), col("event_id"),
          to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("v100"))
        .crossJoin(broadcast(ev.agg(min(to_date(col("ts"))).as("_d0"))))
        .withColumn("pre", datediff(col("day"), col("_d0")) < 15)
      Stats.qqShift(base, "event_type", "pre", "v100", "event_id")
        .orderBy("event_type", "decile")
    }),

    "q430_delta_encoding" -> ((s, dir) =>
      // DELTA_BINARY_PACKED audit: write-order-clustered l_orderkey
      // packs to a few bits/value, the random l_partkey pays full
      // width — the re-sort argument in numbers, one window pass
      DataLayout.deltaEncodingAudit(tbl(s, dir, "lineitem"),
          Seq("l_orderkey", "l_linenumber"),
          Seq("l_orderkey", "l_partkey", "l_suppkey"))
        .orderBy("col_name")),

    "q431_stratified_att" -> ((s, dir) => {
      // Cochran 5-stratum subclassification on the q414 design: the
      // within-stratum treated-control gaps weighted by the treated
      // distribution — matching's sibling, famously ~90% bias removal
      val ev = events(s, dir)
      val d0 = ev.select(col("user_id"), to_date(col("ts")).as("day"),
          col("event_type"), col("value"))
        .crossJoin(broadcast(ev.agg(min(to_date(col("ts"))).as("_d0"))))
      val units = d0.groupBy("user_id")
        .agg(sum(when(datediff(col("day"), col("_d0")) < 15, 1L)
          .otherwise(0L)).as("score"),
          (sum(when(datediff(col("day"), col("_d0")) < 15 &&
            col("event_type") === "error", 1L).otherwise(0L)) >= 7)
            .as("treated"),
          sum(when(datediff(col("day"), col("_d0")) >= 15,
            coalesce(round(col("value") * 100).cast("long"), lit(0L)))
            .otherwise(0L)).as("y"))
      Stats.stratifiedAtt(units, "user_id", "treated", "score", "y",
          nStrata = 5)
        .orderBy("stratum")
    }),

    "q432_mean_excess" -> ((s, dir) =>
      // tail diagnosis of purchase value: mean excess above the exact
      // p90/p95/p99 — increasing = heavy tail, flat = exponential
      Stats.meanExcessTable(
          events(s, dir).filter(col("value").isNotNull)
            .select(col("event_id"),
              round(col("value") * 100).cast("long").as("v100")),
          "event_id", "v100", pcts = Seq(90, 95, 99))
        .orderBy("pct")),

    "q433_zipf_by_source" -> ((s, dir) =>
      // which SOURCE is templated: per-source Zipf octave slope +
      // top-token share — the mixture designer's naturalness screen
      NgramLm.zipfSlopeBySource(tbl(s, dir, "documents"), "source",
          "text")
        .orderBy("source")),

    "q434_burrows_delta" -> ((s, dir) =>
      // stylometric source fingerprinting: Burrows' Delta over the 20
      // corpus function words — suspiciously close source pairs share
      // a generator even when their topics differ
      NgramLm.burrowsDelta(tbl(s, dir, "documents"), "source", "text",
        topK = 20, topPairs = 10)),

    "q435_frequent_paths" -> ((s, dir) =>
      // what users actually do: top-10 within-session event-type
      // triples — the multi-step funnel view the transition matrix
      // can't show
      Stats.frequentPaths(events(s, dir), "user_id", "ts", "event_id",
        "event_type", gapUs = 30L * 60 * 1000000, topK = 10)),

    "q436_acf" -> ((s, dir) =>
      // seasonality reader: exact-sum ACF of daily volume at lags 1..7
      // per event type — a weekly cycle peaks at lag 7
      Stats.acfTable(
          events(s, dir).groupBy(col("event_type"),
              expr("cast(datediff(cast(ts as date), date'1970-01-01') as long)")
                .as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "day", "n_events", maxLag = 7)
        .orderBy("event_type", "lag")),

    "q437_soundex_blocks" -> ((s, dir) =>
      // phonetic blocking for entity resolution: the corpus word
      // vocabulary (documents + part names/types) keyed by American
      // Soundex — same-sound different-spelling words land in one block
      Linkage.phoneticBlocks(
          tbl(s, dir, "documents")
            .select(explode(split(lower(col("text")), "[^a-z]+")).as("w"))
            .union(tbl(s, dir, "part")
              .select(explode(split(lower(col("p_name")), "[^a-z]+"))
                .as("w")))
            .union(tbl(s, dir, "part")
              .select(explode(split(lower(col("p_type")), "[^a-z]+"))
                .as("w"))),
          "w")
        .orderBy(col("n_words").desc, col("sdx"))),

    "q438_dice_typo_match" -> ((s, dir) => {
      // typo-tolerant matching with the NATIVE codegen'd bigram-Dice
      // scalar: deterministic 2nd-char-dropped corruptions of the part
      // vocabulary are matched back to it (first-letter blocking); the
      // verifier is a fused-loop expression, not an explode→group
      // sub-pipeline per pair
      val vocab = tbl(s, dir, "part")
        .select(explode(split(lower(col("p_name")), "[^a-z]+")).as("w"))
        .union(tbl(s, dir, "documents")
          .select(explode(split(lower(col("text")), "[^a-z]+")).as("w")))
        .filter(length(col("w")) >= 4).distinct()
      val variants = vocab.select(col("w").as("orig"),
        concat(substring(col("w"), 1, 1), expr("substring(w, 3)"))
          .as("typo"))
      Linkage.diceBestMatch(variants, "orig", "typo", vocab, "w")
        .withColumn("recovered", col("best_match") === col("l_id"))
        .select(col("l_id").as("orig"), col("lw").as("typo"),
          col("best_match"), col("dice"), col("recovered"))
        .orderBy("orig")
    }),

    "q439_nelson_aalen" -> ((s, dir) => {
      // cumulative-hazard companion of the q251 KM curve: same censored
      // per-user lifetimes, additive Ĥ(t) + Greenwood variance — the
      // churn-rate readout with its CI band ingredient
      val per = events(s, dir).groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      val gmax = per.agg(max("t1").as("gm"))
      val life = per.crossJoin(broadcast(gmax))
        .select(expr("(t1 - t0) div 3600000000").as("t"),
          (col("t1") < col("gm") - lit(43200000000L)).as("observed"))
      Stats.nelsonAalen(life, "t", "observed").orderBy("t")
    }),

    "q440_kruskal_wallis" -> ((s, dir) =>
      // k-sample nonparametric ANOVA: do the three return-flag arms
      // share a quantity distribution? Midranks exact as 2·rank ints,
      // tie-corrected H — heavy integer ties are the point here
      Stats.kruskalWallis(tbl(s, dir, "lineitem"), "l_returnflag",
        "l_quantity")),

    "q441_session_window" -> ((s, dir) => {
      // sessionization with Spark's NATIVE session_window (gap-merged
      // event-time windows, the streaming-ready form) — the oracle
      // replays it as the classic gaps-and-islands SQL; stats must agree
      val sess = events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_ev"),
          min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      sess.agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_singleton"),
        max("n_ev").as("max_events"),
        round(sum("n_ev").cast("double") / count(lit(1)), 6)
          .as("avg_events"),
        round(sum(col("t1") - col("t0")).cast("double") /
          count(lit(1)) / 1000000.0, 6).as("avg_duration_s"))
    }),

    "q442_brown_forsythe" -> ((s, dir) =>
      // variance-equality gate before pooled inference: Levene with
      // median centers over price cents by return flag — exact integer
      // deviations from histogram-read lower medians
      Stats.brownForsythe(
        tbl(s, dir, "lineitem")
          .withColumn("cents",
            round(col("l_extendedprice") * 100).cast("long")),
        "l_returnflag", "cents")),

    "q443_jensen_shannon" -> ((s, dir) =>
      // corpus-mix distance matrix: pairwise JSD (nats) between source
      // unigram distributions — near-zero pairs are collapsible
      // redundancy, the content companion of q434's style Delta
      NgramLm.jensenShannonBySource(tbl(s, dir, "documents"), "source",
          "text")
        .orderBy("sa", "sb")),

    "q444_longest_streaks" -> ((s, dir) =>
      // engagement gaps-and-islands: top-20 users by longest run of
      // consecutive active days (day − row_number constant on a run)
      Stats.longestStreaks(
        events(s, dir).withColumn("day",
          expr("cast(datediff(cast(ts as date), date'1970-01-01') as long)")),
        "user_id", "day", topK = 20)),

    "q445_rfm_segments" -> ((s, dir) =>
      // customer-base health grid: deterministic RFM quintile codes
      // (ntile over (metric, user) order) rolled up with segment size
      // and average spend
      Stats.rfmSegments(
          events(s, dir)
            .withColumn("day",
              expr("cast(datediff(cast(ts as date), date'1970-01-01') as long)"))
            .withColumn("cents", round(col("value") * 100).cast("long")),
          "user_id", "day", "cents")
        .orderBy("rfm_code")),

    "q446_hill_tail" -> ((s, dir) =>
      // Pareto-tail exponent of order totals from the top-500 order
      // statistics (TakeOrdered, no global sort) — α ≤ 2 would force
      // heavy-tail-aware sampling plans; completes the q432 EVT pair
      Stats.hillTailIndex(
        tbl(s, dir, "orders")
          .withColumn("cents",
            round(col("o_totalprice") * 100).cast("long")),
        "cents", "o_orderkey", k = 500)),

    "q447_weibull_fit" -> ((s, dir) => {
      // parametric close-out of the survival family (q251 KM, q439 NA,
      // logRank): Weibull shape/scale by median-rank regression over the
      // uncensored churn lifetimes — k < 1 reads as infant-mortality
      // churn, k > 1 as wear-out
      val per = events(s, dir).groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      val gmax = per.agg(max("t1").as("gm"))
      val life = per.crossJoin(broadcast(gmax))
        .select(expr("(t1 - t0) div 3600000000").as("t"),
          (col("t1") < col("gm") - lit(43200000000L)).as("observed"))
      Stats.weibullFit(life, "t", "observed")
    }),

    "q448_assortativity" -> ((s, dir) => {
      // global shape of the q101 kNN graph: degree assortativity over
      // the symmetrized edges — kNN graphs run disassortative (hub
      // prototypes absorb everyone's neighbor slots); completes the
      // modularity/clustering-coefficient trio
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(e, "embedding",
          "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      GraphAnalytics.assortativity(
        Similarity.knnGraph(assigned, "embedding", "vec_id", 3),
        "id", "nbr_id")
    }),

    "q449_entropy_rate" -> ((s, dir) =>
      // how scripted is user behavior? Markov entropy rate of the
      // event-type chain vs ln(k): predictability near 1 is a bot
      // signature — the single-number reduction of q187's matrix
      Stats.entropyRate(events(s, dir), "user_id", "ts", "event_id",
        "event_type")),

    "q450_partial_correlation" -> ((s, dir) =>
      // does quantity relate to price once discount is held fixed? One
      // fact scan → 9 exact moments → 3 Pearsons → r_xy·z; the
      // 3-variable confounder check beside q376's Simpson demo
      Stats.partialCorrelation(tbl(s, dir, "lineitem"), "l_quantity",
        "l_extendedprice", "l_discount")),

    "q451_residual_diagnostics" -> ((s, dir) =>
      // is yesterday's surprise informative? Durbin-Watson + runs test
      // on mean-centered daily volumes per event type — the i.i.d.
      // screen that decides whether q436's ACF even needs reading
      Stats.residualDiagnostics(
          events(s, dir).groupBy(col("event_type"),
              expr("cast(datediff(cast(ts as date), date'1970-01-01') as long)")
                .as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "day", "n_events")
        .orderBy("event_type")),

    "q452_anova_f" -> ((s, dir) =>
      // the parametric mean test beside q440's rank version: one
      // map-side-combinable scan of the fact, SSB/SSW from exact
      // decimal sums — does quantity differ by return flag in MEANS
      // (vs q440's distributions)?
      Stats.anovaF(tbl(s, dir, "lineitem"), "l_returnflag", "l_quantity")),

    "q453_wilcoxon_pairs" -> ((s, dir) => {
      // paired year-over-year shift: per part, 1996 vs 1997 shipped
      // quantity; signed-rank z on the exact integer differences — the
      // paired complement to q226's independent-arms Welch t
      val li = tbl(s, dir, "lineitem")
        .withColumn("yr", year(col("l_shipdate")))
        .filter(col("yr").isin(1996, 1997))
        .groupBy("l_partkey", "yr")
        .agg(sum(col("l_quantity").cast("long")).as("q"))
      val pairs = li.filter(col("yr") === 1996)
        .select(col("l_partkey"), col("q").as("q96"))
        .join(li.filter(col("yr") === 1997)
          .select(col("l_partkey"), col("q").as("q97")), Seq("l_partkey"))
        .withColumn("d", col("q97") - col("q96"))
      Stats.wilcoxonSignedRank(pairs, "d")
    }),

    "q454_friedman" -> ((s, dir) =>
      // repeated-measures rank test: every ship-month is a block, the
      // three return flags its treatments, monthly revenue cents the
      // response — do the flags keep a consistent revenue ORDER across
      // months? (Kendall's W = how consistent)
      Stats.friedman(
        tbl(s, dir, "lineitem")
          .groupBy(expr("year(l_shipdate) * 12 + month(l_shipdate)")
            .as("blk"), col("l_returnflag"))
          .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
            .as("cents")),
        "blk", "l_returnflag", "cents")),

    "q455_iv_wald" -> ((s, dir) => {
      // encouragement-design replay: parity of user_id is the (exogenous)
      // instrument, purchase count the self-selected treatment, total
      // spend cents the outcome — Wald LATE = reduced form / first
      // stage, with the weak-instrument F gate
      val ue = events(s, dir).groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("x"),
          sum(expr("cast(round(value * 100) as bigint)")).as("y"))
        .withColumn("z", pmod(col("user_id"), lit(2L)))
      Stats.ivWald(ue, "z", "x", "y")
    }),

    "q456_cochran_q" -> ((s, dir) => {
      // do the five event types reach the same share of users? One row
      // per user×type on the COMPLETE grid (x = reached), Cochran's Q
      // from exact BIGINT row/column totals — McNemar's k-way sibling
      val e = events(s, dir)
      val obs = e.groupBy("user_id", "event_type").agg(lit(1L).as("x"))
      val grid = e.select("user_id").distinct()
        .crossJoin(broadcast(e.select("event_type").distinct()))
        .join(obs, Seq("user_id", "event_type"), "left")
        .na.fill(0L, Seq("x"))
      Stats.cochranQ(grid, "user_id", "event_type", "x")
    }),

    "q457_effect_sizes" -> ((s, dir) =>
      // magnitude, not significance: pairwise Cohen's d / Hedges' g of
      // quantity across return flags — the readout that says whether
      // q452's F is worth acting on
      Stats.effectSizes(tbl(s, dir, "lineitem"), "l_returnflag",
        "l_quantity")),

    "q458_harmonic_centrality" -> ((s, dir) => {
      // exact harmonic + closeness centrality of 3 probe nodes on the
      // kNN graph (q418's edge set): all-pairs is off the table at
      // scale, but a few exact pivot rows read navigability directly
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val edges = Similarity.knnGraph(
          Similarity.assignNearestCentroid(e, "embedding", "vec_id",
            centroids, "cid", "cv"), "embedding", "vec_id", k = 3)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      GraphAnalytics.harmonicCentrality(edges, "src", "dst",
        seeds = Seq(0L, 1L, 2L), maxHops = 8)
    }),

    "q459_kendall_tau" -> ((s, dir) => {
      // do busy days run smaller tickets? τ-b of daily order count vs
      // average order value, with the average compared by
      // cross-multiplication — exact integers end to end, pairs bounded
      // by the calendar (days²), never the fact table
      val daily = tbl(s, dir, "orders")
        .groupBy(expr(
          "cast(datediff(cast(o_orderdate as date), date'1970-01-01') as long)")
          .as("day"))
        .agg(count(lit(1)).as("n_orders"),
          sum(expr("cast(round(o_totalprice * 100) as bigint)"))
            .as("cents"))
      Stats.kendallTauRatio(daily, "day", "n_orders", "cents", "n_orders")
    }),

    "q460_pacf" -> ((s, dir) =>
      // the AR-order reader on q436's ACF: Durbin-Levinson partial
      // autocorrelations at lags 1-3 of daily volume per event type —
      // does lag 2 carry signal once lag 1 is regressed out?
      Stats.pacf(
          events(s, dir).groupBy(col("event_type"),
              expr("cast(datediff(cast(ts as date), date'1970-01-01') as long)")
                .as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "day", "n_events")
        .orderBy("event_type")),

    "q461_holt_winters" -> ((s, dir) =>
      // q394's Holt plus the weekly seasonal correction: additive
      // Holt-Winters (m=7) folded bit-identically on both engines, the
      // seven seasonal slots carried as state fields / CTE columns
      Stats.holtWinters(
          events(s, dir).groupBy(col("event_type"),
              to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "day", "n_events")
        .orderBy("event_type")),

    "q462_mann_kendall" -> ((s, dir) =>
      // is daily volume drifting? Mann-Kendall S with tie-corrected
      // variance and continuity-corrected z — the significance gate for
      // q211's Theil-Sen slope, exact BIGINTs end to end
      Stats.mannKendall(
          events(s, dir).groupBy(col("event_type"),
              expr("cast(datediff(cast(ts as date), date'1970-01-01') as long)")
                .as("day"))
            .agg(count(lit(1)).as("n_events")),
          "event_type", "day", "n_events")
        .orderBy("event_type")),

    "q463_semantic_divergence" -> ((s, dir) => {
      // SEMANTIC source-mix matrix: each label's distribution over the
      // 8 IVF centroid cells (zero-shuffle map-side assignment), then
      // pairwise JSD — the embedding-space companion of q443's lexical
      // matrix; near-zero pairs cover the same semantic territory
      val e = tbl(s, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val cells = Similarity.assignNearestCentroid(e, "embedding",
          "vec_id", centroids, "cid", "cv")
        .groupBy(col("label"), col("centroid_id"))
        .agg(count(lit(1)).as("c"))
      NgramLm.jensenShannonCounts(cells, "label", "centroid_id", "c")
        .orderBy("sa", "sb")
    }),

    "q464_shard_median_bias" -> ((s, dir) =>
      // how wrong is median-of-shard-medians? Exact per-shard lower
      // medians off histograms, their median, vs the true exact median —
      // the measured bias that justifies q424's two-pass plan
      Profiling.shardMedianBias(
        tbl(s, dir, "orders").select(
          pmod(col("o_orderkey"), lit(8L)).as("shard"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "shard", "cents")),

    "q465_oov_rate" -> ((s, dir) =>
      // tokenizer-coverage audit: per source, the share of token
      // occurrences (and distinct types) outside the global top-1000
      // reference vocabulary — the "is this source linguistically alien"
      // gate before mixing it in
      TextQuality.oovRate(tbl(s, dir, "documents"), "source", "text",
        vocabSize = 1000)),

    "q466_goertzel_tone" -> ((s, dir) => {
      // tone detection through the REAL audio codec: every 3rd clip
      // carries a period-6 square-ish tone under pseudo-noise; the
      // fs/6 Goertzel bin (coefficient exactly 1 → pure integer filter)
      // flags them by Parseval share — beep/DTMF screening, map-side
      import s.implicits._
      val tonePat = Array(1000, 1000, 0, -1000, -1000, 0)
      val wavs = tbl(s, dir, "documents").select(col("doc_id"))
        .repartition(32).as[Long]
        .map { id =>
          val n = (128 + id % 64).toInt
          val samples = Array.tabulate(n) { i =>
            val noise = (((id * 31 + i * 17) % 4096) / 4 - 512).toInt
            val tone = if (id % 3 == 0) tonePat(i % 6) else 0
            (noise + tone).toShort
          }
          (id, graft.sources.BinaryMedia.encodeWavPcm16(samples, 8000))
        }.toDF("doc_id", "wav")
      Multimodal.goertzelTone(wavs, "doc_id", "wav")
        .select(col("doc_id"), col("n_samples"), col("s1"), col("s2"),
          col("p_tone"), col("energy"), col("tone_share"),
          (col("tone_share") > 0.05).as("is_tonal"))
        .orderBy("doc_id")
    }),

    "q467_image_gradients" -> ((s, dir) => {
      // sharpness/edge audit through the REAL image codec: integer
      // Sobel energy + variance-of-Laplacian per image (the classic
      // blur score a vision pipeline gates frames on), exact BIGITs
      // from decoded pixels, one fixed double tree per derived stat
      import s.implicits._
      val imgs = tbl(s, dir, "documents").select(col("doc_id"))
        .repartition(32).as[Long]
        .map { id =>
          val px = Array.tabulate(256)(i =>
            (((i % 16) * 7 + (i / 16) * 13 + id * 31) % 256).toInt)
          (id, graft.sources.BinaryMedia.encodeGrayPng(16, 16, px))
        }.toDF("doc_id", "img")
      Multimodal.imageGradientStats(imgs, "doc_id", "img")
        .select(col("doc_id"), col("n_interior"), col("edge_energy"),
          round(col("edge_energy").cast("double") / col("n_interior"), 6)
            .as("mean_grad_sq"),
          round((col("lap_sq").cast("double") -
            col("lap_sum").cast("double") * col("lap_sum") /
              col("n_interior")) / col("n_interior"), 6).as("lap_var"))
        .orderBy("doc_id")
    }),

    "q468_minhash_calibration" -> ((s, dir) => {
      // is 64 hashes enough? est−exact Jaccard over the LSH survivors:
      // bias / MAE / RMSE and the share within one hash-granule — the
      // signature-health gate before a corpus-scale re-signature
      val d = tbl(s, dir, "documents").filter(col("doc_id") < 300)
      val corpus = d.select(col("doc_id"), col("text")).union(
        d.select(col("doc_id") + 1000000,
          expr("substring(text, 1, greatest(length(text) - 7, 1))")))
      Dedup.minhashCalibration(corpus, "doc_id", "text", shingleN = 5,
        numHashes = 64, bands = 8, threshold = 0.5)
    }),

    "q469_string_encoding_audit" -> ((s, dir) =>
      // string storage advisor: raw vs dictionary vs front-coded bytes
      // per part column — prefix lengths via the monotone-indicator
      // count, windows only over the DICTIONARY, never the corpus
      Profiling.stringEncodingAudit(tbl(s, dir, "part"),
          Seq("p_brand", "p_name", "p_type"))
        .orderBy("col_name")),

    "q470_query_performance" -> ((s, dir) =>
      // retrieval triage: per query the BM25 top-10 score-list shape —
      // top-1 gap and clarity route flat/hard queries to a reranker,
      // confident ones return early
      Retrieval.queryPerformance(tbl(s, dir, "documents"), "doc_id",
        "text",
        Seq("q_agg" -> Seq("agg", "group", "sort"),
          "q_broad" -> Seq("data", "table"),
          "q_scan" -> Seq("scan", "filter"),
          "q_spark" -> Seq("spark", "join", "vector", "window")),
        k = 10)),

    "q471_competing_risks" -> ((s, dir) => {
      // which ending wins, and when: per user the FIRST purchase vs the
      // FIRST error ends the journey (neither → censored at last sight);
      // Aalen-Johansen CIF per cause — the estimator 1−KM-per-cause
      // over-counts, completing the q251/q439/q372 survival family
      val e = events(s, dir)
      val per = e.groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t1"))
      def firstOf(tpe: String, as: String) =
        e.filter(col("event_type") === tpe).groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as(as))
      val life = per
        .join(firstOf("purchase", "ta"), Seq("user_id"), "left")
        .join(firstOf("error", "tb"), Seq("user_id"), "left")
        .select(
          expr("""case when ta is not null and (tb is null or ta <= tb)
                 |  then (ta - t0) div 3600000000
                 |when tb is not null then (tb - t0) div 3600000000
                 |else (t1 - t0) div 3600000000 end"""
            .stripMargin.replaceAll("\n", " ")).as("t"),
          expr("""case when ta is not null and (tb is null or ta <= tb)
                 |  then 1 when tb is not null then 2 else 0 end"""
            .stripMargin.replaceAll("\n", " ")).as("cause"))
      Stats.competingRisks(life, "t", "cause")
    }),

    "q472_quantile_regression" -> ((s, dir) =>
      // τ ∈ {0.1, 0.5, 0.9} revenue-per-order-count envelope: exact
      // ×10-cleared pinball losses over a fixed slope grid; the 0.1/0.9
      // spread is daily heteroscedasticity made visible beside q211's
      // single Theil-Sen slope
      Stats.quantileRegressionGrid(
        tbl(s, dir, "orders")
          .groupBy(expr("cast(o_orderdate as date)").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(expr("cast(round(o_totalprice * 100) as bigint)"))
              .as("y")),
        "x", "y", grid = (0L to 20L).map(_ * 2500000L),
        taus10 = Seq(1, 5, 9))),

    "q473_blocklist_scan" -> ((s, dir) =>
      // C4-style bad-word gate tuning: per (source, pattern) the doc
      // hit share and total occurrences via the replace-and-measure
      // identity — exact integers, map-side explode, no regex
      Governance.blocklistScan(tbl(s, dir, "documents"), "source",
        "text", Seq("big", "error", "slow")))
  )

  // ======================================================================
  def oracleSql: Map[String, String] = {
    val chunkCorpus =
      """SELECT doc_id, text FROM documents WHERE doc_id < 50
        |UNION ALL
        |SELECT doc_id + 1000 AS doc_id, substring(text, 1, greatest(length(text) - 7, 1)) AS text
        |FROM documents WHERE doc_id < 50""".stripMargin
    val toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    // TF.qualityScore replay (shared by q25 and q183)
    val qualitySql =
      s"""round(
         |    least(CAST(len($toks) AS DOUBLE) / 20.0, 1.0) * 0.4
         |  + greatest(0.0, 1.0 - (
         |      (CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |        CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text) END)
         |    + (CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |        CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) END)
         |    ) * 2.0) * 0.3
         |  + least((CASE WHEN len($toks) = 0 THEN 0.0 ELSE
         |      CAST(len(list_filter(list_transform($toks, t -> lower(t)),
         |        t -> t IN ('the','and','of','to','in','is','that','for','with','are','was','this','it','on','be','as','by','at'))) AS DOUBLE)
         |      / len($toks) END) * 4.0, 1.0) * 0.3, 6)""".stripMargin
    val langMarkers = Seq(
      "en" -> Seq(" the ", " and ", " is ", " of "),
      "de" -> Seq(" der ", " und ", " die ", " ist "),
      "fr" -> Seq(" le ", " les ", " est ", " une "),
      "es" -> Seq(" el ", " los ", " es ", " una "),
      "it" -> Seq(" il ", " che ", " per ", " una "))
    val pad = "(' ' || lower(text) || ' ')"
    def hitsSql(markers: Seq[String]): String = markers.map { m =>
      s"CAST((length($pad) - length(replace($pad, '$m', ''))) / ${m.length} AS INT)"
    }.mkString("(", " + ", ")")
    val hitCols = langMarkers.map { case (l, ms) => s"${hitsSql(ms)} AS ${l}_hits" }
    val bestExpr = langMarkers.map(l => s"${l._1}_hits").mkString("greatest(", ", ", ")")
    val caseExpr = langMarkers.map { case (l, _) =>
      s"WHEN ${l}_hits = best AND best > 0 THEN '$l'"
    }.mkString("CASE ", " ", " ELSE 'und' END")

    Map(
      "q01_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
           |  ${dsumSql("l_quantity", 4)} AS sum_qty,
           |  ${dsumSql("l_extendedprice", 4)} AS sum_base_price,
           |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
           |  ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
           |  ${dsumSql("l_quantity", 4)} / COUNT(*) AS avg_qty,
           |  ${dsumSql("l_extendedprice", 4)} / COUNT(*) AS avg_price,
           |  COUNT(*) AS count_order
           |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "q09_orders_per_month" ->
        s"""SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
           |  ${dsumSql("o_totalprice", 4)} AS total,
           |  ${dsumSql("o_totalprice", 4)} / COUNT(*) AS avg_price
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

      "q15_file_rollup" ->
        """SELECT source, COUNT(*) AS n_docs, MAX(n_chars) AS max_chars,
          |  MIN(doc_id) AS first_doc, CAST(SUM(n_chars) AS BIGINT) AS total_chars
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,

      "q44_file_stats" ->
        """SELECT COALESCE(CASE WHEN doc_id % 10 = 0 THEN NULL ELSE source END,
          |    '__orphan__') AS filename,
          |  COUNT(*) AS n_chunks, MAX(n_chars) AS max_chars, MIN(doc_id) AS first_doc
          |FROM documents GROUP BY 1 ORDER BY filename""".stripMargin,

      "q02_trade_volume" ->
        s"""SELECT supp_nation, cust_nation, revenue, n_items FROM (
           |  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |    ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
           |    COUNT(*) AS n_items
           |  FROM lineitem
           |  JOIN orders ON l_orderkey = o_orderkey
           |  JOIN customer ON o_custkey = c_custkey
           |  JOIN nation cn ON c_nationkey = cn.n_nationkey
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation sn ON s_nationkey = sn.n_nationkey
           |  WHERE cn.n_name <> sn.n_name
           |  GROUP BY 1, 2)
           |ORDER BY revenue DESC, supp_nation, cust_nation
           |LIMIT 20""".stripMargin,

      "q49_cube" ->
        s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           |  COALESCE(l_linestatus, 'ALL') AS linestatus,
           |  COUNT(*) AS n, ${dsumSql("l_quantity", 4)} AS sum_qty
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY returnflag, linestatus""".stripMargin,

      "q50_pivot" ->
        """SELECT l_returnflag,
          |  COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'F'
          |    THEN CAST(l_quantity AS DECIMAL(24,4)) END) AS DOUBLE), 0.0) AS f_qty,
          |  COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'O'
          |    THEN CAST(l_quantity AS DECIMAL(24,4)) END) AS DOUBLE), 0.0) AS o_qty
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

      "q51_moving_avg" ->
        """SELECT o_custkey, o_orderkey,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,4))) OVER w AS DOUBLE)
          |    / COUNT(*) OVER w AS mov_avg3
          |FROM orders WHERE o_custkey < 200
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
          |ORDER BY o_custkey, o_orderkey""".stripMargin,

      "q52_below_avg_bigticket" ->
        s"""WITH pp AS (
           |  SELECT l_partkey AS p_key,
           |    ${dsumSql("l_quantity", 4)} / COUNT(*) AS avg_qty
           |  FROM lineitem GROUP BY 1)
           |SELECT ${dsumSql("l_extendedprice", 4)} AS below_avg_revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem JOIN pp ON l_partkey = p_key
           |WHERE l_quantity < 0.9 * avg_qty""".stripMargin,

      "q57_quantize_embeddings" ->
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |s AS (SELECT vec_id, v,
          |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
          |qz AS (SELECT vec_id, v, scale,
          |  CASE WHEN scale = 0 THEN list_transform(v, x -> CAST(0 AS INT))
          |       ELSE list_transform(v, x -> CAST(round(x / scale) AS INT)) END AS q
          |  FROM s)
          |SELECT vec_id, scale,
          |  CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS l1_q,
          |  list_max(list_transform(range(1, 65),
          |    i -> abs(v[CAST(i AS INT)] - q[CAST(i AS INT)] * scale))) AS max_err
          |FROM qz ORDER BY vec_id""".stripMargin,

      "q58_quantized_search" ->
        """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |s AS (SELECT vec_id, v,
          |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
          |d AS (SELECT vec_id,
          |  CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
          |       ELSE list_transform(v, x -> CAST(round(x / scale) AS INT) * scale) END AS demb
          |  FROM s),
          |qv AS (SELECT demb AS qv FROM d WHERE vec_id = 0)
          |SELECT d.vec_id,
          |  round(1.0 - list_cosine_similarity(d.demb, qv), 6) AS distance
          |FROM d, qv
          |ORDER BY 1.0 - list_cosine_similarity(d.demb, qv), d.vec_id
          |LIMIT 8""".stripMargin,

      "q54_ivf_search" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
          |c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |assign AS (
          |  SELECT vec_id, centroid_id FROM (
          |    SELECT e.vec_id, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |probes AS (SELECT cid FROM c, q ORDER BY list_distance(cv, qv), cid LIMIT 2)
          |SELECT e.vec_id, a.centroid_id,
          |  round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), 6) AS distance
          |FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, q
          |WHERE a.centroid_id IN (SELECT cid FROM probes)
          |ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), e.vec_id
          |LIMIT 8""".stripMargin,

      "q124_pq_search" -> pqOracleSql,
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

      // the q158 scored CTEs give the Gopher gate; block join on lang,
      // argmin by (len_diff, rejected_id) replayed as a QUALIFY window
      "q223_preference_pairs" ->
        s"""$scoredMarginCtes,
           |lab AS (SELECT s.doc_id, s.quality_pass, d.lang, d.n_chars
           |  FROM scored s JOIN documents d USING (doc_id)),
           |ch AS (SELECT lang, doc_id AS chosen_id, n_chars AS chosen_len
           |  FROM lab WHERE quality_pass),
           |rj AS (SELECT lang, doc_id AS rejected_id,
           |    n_chars AS rejected_len
           |  FROM lab WHERE NOT quality_pass),
           |p AS (SELECT ch.chosen_id, rj.rejected_id, ch.chosen_len,
           |    rj.rejected_len,
           |    abs(ch.chosen_len - rj.rejected_len) AS len_diff
           |  FROM ch JOIN rj ON ch.lang = rj.lang)
           |SELECT chosen_id, rejected_id, chosen_len, rejected_len,
           |  len_diff
           |FROM p
           |QUALIFY row_number() OVER (PARTITION BY chosen_id
           |  ORDER BY len_diff, rejected_id) = 1
           |ORDER BY chosen_id""".stripMargin,

      "q224_maxsim" -> maxSimOracleSql,

      "q225_attribution" ->
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |    event_type FROM events),
          |conv AS (SELECT user_id, event_id AS conv_id, epoch_us(ts) AS cts
          |  FROM e WHERE event_type = 'purchase'),
          |touch AS (SELECT user_id, event_id AS touch_id, epoch_us(ts) AS tts
          |  FROM e WHERE event_type = 'view'),
          |j AS (SELECT conv_id, touch_id, cts, tts
          |  FROM conv JOIN touch USING (user_id)
          |  WHERE tts < cts AND tts >= cts - 604800000000),
          |p AS (SELECT conv_id, (cts - tts) // 86400000000 AS lag_days,
          |    COUNT(*) OVER (PARTITION BY conv_id) AS n,
          |    row_number() OVER (PARTITION BY conv_id
          |      ORDER BY tts, touch_id) AS pos
          |  FROM j),
          |c AS (SELECT lag_days, 1000000 // n AS linear_mc,
          |    CASE WHEN n = 1 THEN 1000000
          |      WHEN pos = 1 OR pos = n THEN 400000
          |      ELSE 200000 // (n - 2) END AS position_mc
          |  FROM p)
          |SELECT lag_days, CAST(count(*) AS BIGINT) AS n_touches,
          |  CAST(SUM(linear_mc) AS BIGINT) AS linear_mcredit,
          |  CAST(SUM(position_mc) AS BIGINT) AS position_mcredit
          |FROM c GROUP BY lag_days ORDER BY lag_days""".stripMargin,

      // q98's scoring CTEs run twice: round-1 top-5 picks the expansion
      // terms (total tf desc, term), round 2 scores the joined term set
      "q227_prf_expansion" ->
        """WITH docs AS (SELECT doc_id AS id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |dl AS (SELECT id, len(t) AS dl, t FROM docs),
          |stats AS (SELECT COUNT(*) AS n_docs,
          |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
          |tf1 AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
          |    SELECT id, dl, unnest(t) AS term FROM dl)
          |  WHERE term IN ('spark', 'join', 'vector', 'window')
          |  GROUP BY id, dl, term),
          |dfq1 AS (SELECT term, COUNT(*) AS term_df FROM tf1 GROUP BY term),
          |sc1 AS (SELECT id,
          |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
          |      ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
          |      AS contrib
          |  FROM tf1 JOIN dfq1 USING (term), stats),
          |top5 AS (SELECT id,
          |    round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6)
          |      AS score
          |  FROM sc1 GROUP BY id ORDER BY score DESC, id LIMIT 5),
          |expt AS (SELECT term FROM (
          |    SELECT term, COUNT(*) AS cnt FROM (
          |      SELECT unnest(t) AS term FROM dl JOIN top5 USING (id))
          |    WHERE term NOT IN ('spark', 'join', 'vector', 'window')
          |    GROUP BY term)
          |  ORDER BY cnt DESC, term LIMIT 2),
          |t2 AS (SELECT unnest(['spark', 'join', 'vector', 'window']) AS term
          |  UNION ALL SELECT term FROM expt),
          |tf2 AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
          |    SELECT id, dl, unnest(t) AS term FROM dl) u
          |  JOIN t2 USING (term)
          |  GROUP BY id, dl, term),
          |dfq2 AS (SELECT term, COUNT(*) AS term_df FROM tf2 GROUP BY term),
          |sc2 AS (SELECT id,
          |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
          |      ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
          |      AS contrib
          |  FROM tf2 JOIN dfq2 USING (term), stats)
          |SELECT id,
          |  round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6)
          |    AS score,
          |  COUNT(*) AS n_matched
          |FROM sc2 GROUP BY id
          |ORDER BY score DESC, id LIMIT 10""".stripMargin,

      // the q101 edge CTEs; three frontier expansions with NOT-IN
      // visited sets
      "q228_khop" ->
        s"""$knnEdgesPrefixSql,
           |h1 AS (SELECT DISTINCT nbr_id AS node FROM g0 WHERE id = 0),
           |v1 AS (SELECT CAST(0 AS BIGINT) AS node UNION SELECT node FROM h1),
           |h2 AS (SELECT DISTINCT g0.nbr_id AS node
           |  FROM h1 JOIN g0 ON h1.node = g0.id
           |  WHERE g0.nbr_id NOT IN (SELECT node FROM v1)),
           |v2 AS (SELECT node FROM v1 UNION SELECT node FROM h2),
           |h3 AS (SELECT DISTINCT g0.nbr_id AS node
           |  FROM h2 JOIN g0 ON h2.node = g0.id
           |  WHERE g0.nbr_id NOT IN (SELECT node FROM v2))
           |SELECT CAST(1 AS INT) AS hop, CAST(count(*) AS BIGINT) AS n_nodes,
           |  min(node) AS min_id, max(node) AS max_id FROM h1
           |UNION ALL
           |SELECT CAST(2 AS INT), CAST(count(*) AS BIGINT), min(node),
           |  max(node) FROM h2
           |UNION ALL
           |SELECT CAST(3 AS INT), CAST(count(*) AS BIGINT), min(node),
           |  max(node) FROM h3
           |ORDER BY hop""".stripMargin,

      // per-dim decimal-exact means (q193 discipline), diff², decimal
      // re-accumulation across dims, sqrt+round once
      "q229_centroid_drift" ->
        """WITH dims AS (SELECT label, CAST(i AS INT) - 1 AS dim,
          |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
          |  FROM embeddings, unnest(range(1, 65)) AS u(i)),
          |per AS (SELECT label, dim,
          |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
          |    CAST(count(*) AS BIGINT) AS n
          |  FROM dims GROUP BY 1, 2),
          |perm AS (SELECT label, dim, sx / n AS mean, n FROM per),
          |gl AS (SELECT dim,
          |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*)
          |      AS gmean
          |  FROM dims GROUP BY dim),
          |d2 AS (SELECT label, n, (mean - gmean) * (mean - gmean) AS d2
          |  FROM perm JOIN gl USING (dim))
          |SELECT label, max(n) AS n_vectors,
          |  round(sqrt(CAST(SUM(CAST(d2 AS DECIMAL(38,18))) AS DOUBLE)), 6)
          |    AS drift
          |FROM d2 GROUP BY label ORDER BY label""".stripMargin,

      // REBUILD from all events — matching the Spark side's incremental
      // merge path proves merge(state, delta) ≡ rebuild
      "q230_scd2_merge" ->
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |    event_type FROM events WHERE user_id < 100)
          |SELECT user_id, event_type, ts AS valid_from,
          |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |    AS valid_to,
          |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |    IS NULL AS is_current
          |FROM e ORDER BY user_id, valid_from""".stripMargin,

      // the q227 CTE chain ranked twice; concordant/discordant pair
      // counts over the common ids, tau = (2C − P)/P
      "q231_rank_stability" ->
        """WITH docs AS (SELECT doc_id AS id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |dl AS (SELECT id, len(t) AS dl, t FROM docs),
          |stats AS (SELECT COUNT(*) AS n_docs,
          |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
          |tf1 AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
          |    SELECT id, dl, unnest(t) AS term FROM dl)
          |  WHERE term IN ('spark', 'join', 'vector', 'window')
          |  GROUP BY id, dl, term),
          |dfq1 AS (SELECT term, COUNT(*) AS term_df FROM tf1 GROUP BY term),
          |sc1 AS (SELECT id,
          |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
          |      ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
          |      AS contrib
          |  FROM tf1 JOIN dfq1 USING (term), stats),
          |s1 AS (SELECT id,
          |    round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6)
          |      AS score
          |  FROM sc1 GROUP BY id),
          |ra AS (SELECT id, row_number() OVER (ORDER BY score DESC, id)
          |    AS rka
          |  FROM (SELECT id, score FROM s1 ORDER BY score DESC, id LIMIT 10)),
          |top5 AS (SELECT id FROM s1 ORDER BY score DESC, id LIMIT 5),
          |expt AS (SELECT term FROM (
          |    SELECT term, COUNT(*) AS cnt FROM (
          |      SELECT unnest(t) AS term FROM dl JOIN top5 USING (id))
          |    WHERE term NOT IN ('spark', 'join', 'vector', 'window')
          |    GROUP BY term)
          |  ORDER BY cnt DESC, term LIMIT 2),
          |t2 AS (SELECT unnest(['spark', 'join', 'vector', 'window']) AS term
          |  UNION ALL SELECT term FROM expt),
          |tf2 AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
          |    SELECT id, dl, unnest(t) AS term FROM dl) u
          |  JOIN t2 USING (term)
          |  GROUP BY id, dl, term),
          |dfq2 AS (SELECT term, COUNT(*) AS term_df FROM tf2 GROUP BY term),
          |sc2 AS (SELECT id,
          |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
          |      ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
          |      AS contrib
          |  FROM tf2 JOIN dfq2 USING (term), stats),
          |rb AS (SELECT id, row_number() OVER (ORDER BY score DESC, id)
          |    AS rkb
          |  FROM (SELECT id,
          |      round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6)
          |        AS score
          |    FROM sc2 GROUP BY id ORDER BY score DESC, id LIMIT 10)),
          |cm AS (SELECT ra.id, rka, rkb FROM ra JOIN rb USING (id)),
          |pr AS (SELECT CASE WHEN (a.rka - b.rka) * (a.rkb - b.rkb) > 0
          |      THEN 1 ELSE 0 END AS conc
          |  FROM cm a JOIN cm b ON a.id < b.id),
          |pa AS (SELECT CAST(count(*) AS BIGINT) AS np,
          |    CAST(coalesce(SUM(conc), 0) AS BIGINT) AS c FROM pr),
          |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM cm)
          |SELECT n_common,
          |  CAST(n_common AS DOUBLE) / 10 AS overlap_at_k,
          |  c AS n_concordant, np - c AS n_discordant,
          |  CASE WHEN np > 0
          |    THEN CAST(2 * c - np AS DOUBLE) / np END AS tau
          |FROM nc, pa""".stripMargin,

      // row_number window replay of the bounded-heap aggregate —
      // identical quality replay as q25, DESC + doc_id tie-break
      "q232_topk_agg" ->
        s"""WITH d AS (SELECT source, doc_id, $qualitySql AS quality
           |  FROM documents),
           |r AS (SELECT source, doc_id, quality,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY quality DESC, doc_id) AS rn
           |  FROM d)
           |SELECT source, doc_id, quality FROM r WHERE rn <= 3
           |ORDER BY source, doc_id""".stripMargin,

      // 1-based window starts replayed with a range unnest; j+1 never
      // exceeds len(t) because range's stop is exclusive
      "q233_phrase_match" ->
        """WITH toks AS (SELECT doc_id AS id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '') AS t
          |  FROM documents),
          |st AS (SELECT id, j FROM toks, unnest(range(1, len(t))) AS r(j)
          |  WHERE t[j] = 'hash' AND t[j+1] = 'join')
          |SELECT id, count(*) AS n_occurrences,
          |  CAST(min(j) AS INT) AS first_pos
          |FROM st GROUP BY id ORDER BY id""".stripMargin,

      // identical running-max last-seen windows; covers require all
      // three terms seen at or before the current hit
      "q234_min_span" ->
        """WITH toks AS (SELECT doc_id AS id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '') AS t
          |  FROM documents),
          |hits AS (SELECT id, j AS pos, t[j] AS term
          |  FROM toks, unnest(range(1, len(t) + 1)) AS r(j)
          |  WHERE t[j] IN ('spark', 'vector', 'merge')),
          |wl AS (SELECT id, pos,
          |    max(CASE WHEN term = 'spark' THEN pos END)
          |      OVER (PARTITION BY id ORDER BY pos) AS l0,
          |    max(CASE WHEN term = 'vector' THEN pos END)
          |      OVER (PARTITION BY id ORDER BY pos) AS l1,
          |    max(CASE WHEN term = 'merge' THEN pos END)
          |      OVER (PARTITION BY id ORDER BY pos) AS l2
          |  FROM hits)
          |SELECT id, CAST(min(pos - least(l0, l1, l2) + 1) AS INT)
          |    AS min_span,
          |  count(*) AS n_covers
          |FROM wl
          |WHERE l0 IS NOT NULL AND l1 IS NOT NULL AND l2 IS NOT NULL
          |GROUP BY id ORDER BY id""".stripMargin,

      // bounded hit × hit self-join per doc; DuckDB list slice is
      // 1-based inclusive → [start : start+7] is the 8-token window
      "q235_snippet" ->
        """WITH toks AS (SELECT doc_id AS id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '') AS t
          |  FROM documents),
          |hits AS (SELECT id, j AS pos, t[j] AS term
          |  FROM toks, unnest(range(1, len(t) + 1)) AS r(j)
          |  WHERE t[j] IN ('spark', 'vector', 'merge')),
          |win AS (SELECT a.id, a.pos AS start,
          |    count(DISTINCT b.term) AS n_terms
          |  FROM hits a JOIN hits b ON a.id = b.id
          |    AND b.pos >= a.pos AND b.pos < a.pos + 8
          |  GROUP BY a.id, a.pos),
          |best AS (SELECT id, start, n_terms, row_number()
          |    OVER (PARTITION BY id ORDER BY n_terms DESC, start) AS rn
          |  FROM win)
          |SELECT b.id, CAST(b.start AS INT) AS start, b.n_terms,
          |  array_to_string(t[b.start : b.start + 7], ' ') AS snippet
          |FROM best b JOIN toks USING (id) WHERE rn = 1
          |ORDER BY id""".stripMargin,

      // the 3 MM rounds unrolled as CTE pairs (dN = decimal-summed
      // opponent denominators, sN = wins/dN); identical division trees
      "q236_bradley_terry" ->
        s"""WITH d AS (SELECT doc_id, lang, source, $qualitySql AS q
           |  FROM documents),
           |du AS (SELECT source, q,
           |    lead(doc_id) OVER w AS n_doc,
           |    lead(source) OVER w AS n_src,
           |    lead(q) OVER w AS n_q
           |  FROM d WINDOW w AS (PARTITION BY lang ORDER BY doc_id)),
           |pw AS (SELECT
           |    CASE WHEN q >= n_q THEN source ELSE n_src END AS win,
           |    CASE WHEN q >= n_q THEN n_src ELSE source END AS lose
           |  FROM du WHERE n_doc IS NOT NULL AND source <> n_src),
           |wn AS (SELECT win AS item, CAST(count(*) AS BIGINT) AS wins
           |  FROM pw GROUP BY 1),
           |mm AS (SELECT i, j, count(*) AS m FROM (
           |    SELECT win AS i, lose AS j FROM pw
           |    UNION ALL SELECT lose AS i, win AS j FROM pw)
           |  GROUP BY i, j),
           |it AS (SELECT DISTINCT i AS item FROM mm),
           |w0 AS (SELECT item, CAST(coalesce(wins, 0) AS BIGINT) AS wins
           |  FROM it LEFT JOIN wn USING (item)),
           |s0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS s FROM it),
           |d1 AS (SELECT mm.i, CAST(SUM(CAST(
           |      CAST(m AS DOUBLE) / (si.s + sj.s) AS DECIMAL(38,18)))
           |    AS DOUBLE) AS dd
           |  FROM mm JOIN s0 si ON mm.i = si.item
           |    JOIN s0 sj ON mm.j = sj.item GROUP BY mm.i),
           |s1 AS (SELECT w0.item, CAST(wins AS DOUBLE) / dd AS s
           |  FROM w0 JOIN d1 ON w0.item = d1.i),
           |d2 AS (SELECT mm.i, CAST(SUM(CAST(
           |      CAST(m AS DOUBLE) / (si.s + sj.s) AS DECIMAL(38,18)))
           |    AS DOUBLE) AS dd
           |  FROM mm JOIN s1 si ON mm.i = si.item
           |    JOIN s1 sj ON mm.j = sj.item GROUP BY mm.i),
           |s2 AS (SELECT w0.item, CAST(wins AS DOUBLE) / dd AS s
           |  FROM w0 JOIN d2 ON w0.item = d2.i),
           |d3 AS (SELECT mm.i, CAST(SUM(CAST(
           |      CAST(m AS DOUBLE) / (si.s + sj.s) AS DECIMAL(38,18)))
           |    AS DOUBLE) AS dd
           |  FROM mm JOIN s2 si ON mm.i = si.item
           |    JOIN s2 sj ON mm.j = sj.item GROUP BY mm.i),
           |s3 AS (SELECT w0.item, CAST(wins AS DOUBLE) / dd AS s
           |  FROM w0 JOIN d3 ON w0.item = d3.i),
           |tot AS (SELECT CAST(SUM(CAST(s AS DECIMAL(38,18))) AS DOUBLE)
           |    AS tot FROM s3),
           |gm AS (SELECT i AS item, CAST(SUM(m) AS BIGINT) AS n_duels
           |  FROM mm GROUP BY 1)
           |SELECT item, n_duels, wins, round(s / tot, 6) AS strength
           |FROM w0 JOIN s3 USING (item) JOIN gm USING (item), tot
           |ORDER BY item""".stripMargin,

      // the q127 synthetic PCM replayed arithmetically: 32-sample frame
      // energies (partial trailing frame dropped), islands by
      // frame − row_number
      "q237_audio_vad" ->
        """WITH sm AS (SELECT doc_id, i,
          |    ((doc_id * 31 + i * 17) % 4096) - 2048 AS v
          |  FROM documents, unnest(range(0, 128 + doc_id % 64)) t(i)),
          |fr AS (SELECT doc_id, i // 32 AS frame,
          |    CAST(SUM(v * v) AS BIGINT) AS energy
          |  FROM sm WHERE i // 32 < (128 + doc_id % 64) // 32
          |  GROUP BY doc_id, i // 32),
          |sp AS (SELECT doc_id, frame, energy,
          |    frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame)
          |      AS isl
          |  FROM fr WHERE energy >= 20000000)
          |SELECT doc_id AS id, CAST(min(frame) AS INT) AS start_frame,
          |  CAST(max(frame) AS INT) AS end_frame, count(*) AS n_frames,
          |  CAST(SUM(energy) AS BIGINT) AS energy
          |FROM sp GROUP BY doc_id, isl ORDER BY id, start_frame""".stripMargin,

      // integer-cents rendering gives the first digit; expectations are
      // the same 6 dp literals the Spark side embeds
      "q238_benford" ->
        """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
          |  FROM orders WHERE round(o_totalprice * 100) > 0),
          |d AS (SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS INT)
          |    AS digit FROM c),
          |n AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
          |t AS (SELECT SUM(n) AS tot FROM n),
          |e AS (SELECT digit, n,
          |    CAST(n AS DOUBLE) / tot AS share,
          |    CASE digit WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
          |      WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910
          |      WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
          |      WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
          |      WHEN 9 THEN 0.045757 ELSE 0.0 END AS expected_share
          |  FROM n, t)
          |SELECT digit, n, share, expected_share,
          |  abs(share - expected_share) AS abs_dev
          |FROM e ORDER BY digit""".stripMargin,

      // undirected q101 edges → shared-neighbor self-join; jaccard is a
      // single exact-int division; top-20 totally ordered
      "q239_link_prediction" ->
        s"""$knnEdgesPrefixSql,
           |u0 AS (SELECT DISTINCT least(id, nbr_id) AS a,
           |    greatest(id, nbr_id) AS b
           |  FROM g0 WHERE id <> nbr_id),
           |nb AS (SELECT a AS v, b AS n FROM u0
           |  UNION ALL SELECT b AS v, a AS n FROM u0),
           |dg2 AS (SELECT v, count(*) AS deg FROM nb GROUP BY v),
           |cn AS (SELECT x.v AS xa, y.v AS yb, count(*) AS n_common
           |  FROM nb x JOIN nb y ON x.n = y.n AND x.v < y.v
           |  GROUP BY x.v, y.v),
           |cand AS (SELECT xa, yb, n_common FROM cn
           |  WHERE NOT EXISTS (SELECT 1 FROM u0
           |    WHERE u0.a = cn.xa AND u0.b = cn.yb)),
           |j AS (SELECT xa AS node_a, yb AS node_b,
           |    CAST(n_common AS BIGINT) AS n_common,
           |    CAST(n_common AS DOUBLE) / (dx.deg + dy.deg - n_common)
           |      AS jaccard
           |  FROM cand JOIN dg2 dx ON cand.xa = dx.v
           |    JOIN dg2 dy ON cand.yb = dy.v)
           |SELECT node_a, node_b, n_common, jaccard FROM j
           |ORDER BY jaccard DESC, node_a, node_b LIMIT 20""".stripMargin,

      "q240_textrank" -> textRankOracleSql,

      // per-layout zone maps: min/max per file id, skippable when the
      // [min,max] misses the 1997 range entirely
      "q241_skip_audit" ->
        """WITH pr AS (SELECT CAST('1997-01-01' AS TIMESTAMP) AS lo,
          |    CAST('1997-12-31' AS TIMESTAMP) AS hi),
          |a AS (SELECT o_orderkey // 100 AS f, o_orderdate AS p
          |  FROM orders),
          |af AS (SELECT f, min(p) AS mn, max(p) AS mx, count(*) AS nr
          |  FROM a GROUP BY f),
          |s AS (SELECT (row_number() OVER (ORDER BY o_orderdate,
          |      o_orderkey) - 1) // 100 AS f, o_orderdate AS p
          |  FROM orders),
          |sf AS (SELECT f, min(p) AS mn, max(p) AS mx, count(*) AS nr
          |  FROM s GROUP BY f),
          |u AS (SELECT 'arrival' AS layout, mn, mx, nr FROM af
          |  UNION ALL SELECT 'date_sorted', mn, mx, nr FROM sf)
          |SELECT layout, count(*) AS n_files,
          |  CAST(SUM(CASE WHEN mx < lo OR mn > hi THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_skippable,
          |  CAST(SUM(CASE WHEN mx < lo OR mn > hi THEN nr ELSE 0 END)
          |    AS BIGINT) AS rows_skipped,
          |  CAST(SUM(CASE WHEN mx < lo OR mn > hi THEN 1 ELSE 0 END)
          |    AS DOUBLE) / count(*) AS file_skip_frac
          |FROM u, pr GROUP BY layout ORDER BY layout""".stripMargin,

      // within-source rank → ⌈100·r/m⌉ level → global value at rank
      // (lv·n)//100 — all integer arithmetic into a 100-row table
      "q242_quantile_norm" ->
        s"""WITH d AS (SELECT doc_id, source, $qualitySql AS q
           |  FROM documents),
           |rk AS (SELECT doc_id, source, q,
           |    row_number() OVER (PARTITION BY source ORDER BY q, doc_id)
           |      AS r,
           |    count(*) OVER (PARTITION BY source) AS m
           |  FROM d),
           |gl AS (SELECT q, row_number() OVER (ORDER BY q, doc_id) AS gr
           |  FROM d),
           |nn AS (SELECT count(*) AS n FROM d),
           |tb AS (SELECT x.lv, gl.q AS q_norm FROM (
           |    SELECT l.lv, greatest(1, (l.lv * n) // 100) AS grank
           |    FROM (SELECT unnest(range(1, 101)) AS lv) l, nn) x
           |  JOIN gl ON gl.gr = x.grank)
           |SELECT rk.doc_id, rk.source, rk.q AS quality, tb.q_norm
           |FROM rk JOIN tb
           |  ON tb.lv = (100 * rk.r + rk.m - 1) // rk.m
           |ORDER BY doc_id""".stripMargin,

      // the q27 session CTEs; +1 rows order before −1 at equal ts
      // (closed intervals), peak_at is the earliest max
      "q243_concurrency_peak" ->
        """WITH e AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
          |flagged AS (
          |  SELECT user_id, ts,
          |    CASE WHEN lag(ts) OVER w IS NULL
          |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
          |      THEN 1 ELSE 0 END AS new_session
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          |sx AS (
          |  SELECT user_id, ts,
          |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS session_id
          |  FROM flagged),
          |sess AS (SELECT MIN(ts) AS session_start, MAX(ts) AS session_end
          |  FROM sx GROUP BY user_id, session_id),
          |ev AS (SELECT session_start AS ts, 1 AS d FROM sess
          |  UNION ALL SELECT session_end, -1 FROM sess),
          |cum AS (SELECT ts, d, SUM(d) OVER (ORDER BY ts, d DESC
          |    ROWS UNBOUNDED PRECEDING) AS c FROM ev),
          |pk AS (SELECT CAST(max(c) AS BIGINT) AS peak_concurrent FROM cum),
          |pa AS (SELECT min(ts) AS peak_at FROM cum, pk
          |  WHERE c = peak_concurrent),
          |ns AS (SELECT count(*) AS n_sessions FROM sess)
          |SELECT n_sessions, peak_concurrent, peak_at
          |FROM ns, pk, pa""".stripMargin,

      // the q158 scored CTEs; ceil-rank deciles, HUGEINT window sums
      // cast back to BIGINT, lift = one exact-int double division
      "q244_lift_table" ->
        s"""$scoredMarginCtes,
           |tot AS (SELECT count(*) AS tn,
           |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END)
           |      AS BIGINT) AS tp
           |  FROM scored),
           |rk AS (SELECT doc_id, quality_pass,
           |    row_number() OVER (ORDER BY margin DESC, doc_id) AS r
           |  FROM scored),
           |bk AS (SELECT (10 * r + tn - 1) // tn AS bucket, quality_pass,
           |    tn, tp FROM rk, tot),
           |per AS (SELECT bucket, count(*) AS n,
           |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_pos,
           |    max(tn) AS tn, max(tp) AS tp
           |  FROM bk GROUP BY bucket),
           |cm AS (SELECT bucket, n, n_pos,
           |    CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
           |      AS BIGINT) AS cum_n,
           |    CAST(SUM(n_pos) OVER (ORDER BY bucket
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
           |    tn, tp FROM per)
           |SELECT bucket, n, n_pos, cum_n, cum_pos,
           |  CASE WHEN tp > 0 THEN CAST(cum_pos * tn AS DOUBLE)
           |    / (cum_n * tp) END AS cum_lift
           |FROM cm ORDER BY bucket""".stripMargin,

      // q11's chunk replay scored by query-term token counts; doc score
      // best + 0.2·(sum − best); arg-best chunk via a per-doc window
      "q245_passage_agg" ->
        """WITH ch AS (SELECT doc_id,
          |    CAST(doc_id AS VARCHAR) || '_' || CAST(s // 150 AS VARCHAR)
          |      AS chunk_id,
          |    substring(text, CAST(s AS INT) + 1, 200) AS chunk
          |  FROM documents, unnest(range(0, length(text), 150)) AS t(s)),
          |sc AS (SELECT doc_id, chunk_id,
          |    CAST(len(list_filter(
          |      list_filter(regexp_split_to_array(lower(chunk), '\s+'),
          |        x -> x <> ''),
          |      x -> x IN ('spark', 'join', 'merge'))) AS BIGINT) AS score
          |  FROM ch),
          |pos AS (SELECT * FROM sc WHERE score > 0),
          |rk AS (SELECT doc_id, chunk_id, score, row_number()
          |    OVER (PARTITION BY doc_id ORDER BY score DESC, chunk_id)
          |      AS rn
          |  FROM pos),
          |ag AS (SELECT doc_id, count(*) AS n_chunks,
          |    CAST(max(score) AS BIGINT) AS best_score,
          |    CAST(SUM(score) AS BIGINT) AS total_score
          |  FROM pos GROUP BY doc_id),
          |j AS (SELECT ag.doc_id, ag.n_chunks, ag.best_score,
          |    ag.total_score, rk.chunk_id AS best_chunk_id,
          |    CAST(ag.best_score AS DOUBLE) +
          |      0.2 * CAST(ag.total_score - ag.best_score AS DOUBLE)
          |      AS doc_score
          |  FROM ag JOIN rk ON ag.doc_id = rk.doc_id AND rk.rn = 1)
          |SELECT doc_id, n_chunks, best_score, total_score, best_chunk_id,
          |  doc_score
          |FROM j ORDER BY doc_score DESC, doc_id LIMIT 10""".stripMargin,

      // the q226 hash-arm chain over per-user (pre views, post cents);
      // θ and x̄ from one exact-sum row, identical adjustment trees
      "q246_cuped" ->
        """WITH uu AS (SELECT DISTINCT user_id FROM events),
          |px AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
          |  FROM events WHERE event_type = 'view'
          |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20'
          |  GROUP BY user_id),
          |py AS (SELECT user_id,
          |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          |  FROM events WHERE event_type = 'purchase'
          |    AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20'
          |  GROUP BY user_id),
          |base AS (SELECT uu.user_id, coalesce(x, 0) AS x,
          |    coalesce(y, 0) AS y
          |  FROM uu LEFT JOIN px USING (user_id)
          |    LEFT JOIN py USING (user_id)),
          |h0 AS (SELECT x, y, (user_id * 1000003) % 2147483647 AS h
          |  FROM base),
          |h1 AS (SELECT x, y, (xor(h, h >> 16) * 73244475) % 2147483647
          |    AS h FROM h0),
          |h2 AS (SELECT x, y, (xor(h, h >> 13) * 73244475) % 2147483647
          |    AS h FROM h1),
          |arm AS (SELECT x, y, h % 2 = 0 AS arm FROM h2),
          |g AS (SELECT count(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
          |    CAST(SUM(y) AS BIGINT) AS sy,
          |    CAST(SUM(x * x) AS BIGINT) AS sxx,
          |    CAST(SUM(x * y) AS BIGINT) AS sxy
          |  FROM arm),
          |th AS (SELECT CASE WHEN n * sxx - sx * sx <> 0
          |    THEN CAST(n * sxy - sx * sy AS DOUBLE)
          |      / CAST(n * sxx - sx * sx AS DOUBLE) ELSE 0.0 END AS theta,
          |    CAST(sx AS DOUBLE) / n AS xbar
          |  FROM g),
          |adj AS (SELECT arm, y,
          |    CAST(y AS DOUBLE) - theta * (CAST(x AS DOUBLE) - xbar)
          |      AS y_adj, theta
          |  FROM arm, th)
          |SELECT arm, count(*) AS n_users,
          |  CAST(SUM(y) AS DOUBLE) / count(*) AS mean_raw,
          |  CAST(SUM(CAST(y_adj AS DECIMAL(38,18))) AS DOUBLE) / count(*)
          |    AS mean_adj,
          |  max(theta) AS theta
          |FROM adj GROUP BY arm ORDER BY arm""".stripMargin,

      // q98's CTE chain with ×2 title weights folded into tf and dl
      // before the one saturation pass
      "q247_bm25f" ->
        """WITH docs AS (SELECT doc_id AS id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '') AS t
          |  FROM documents),
          |fl AS (SELECT id, t[1:5] AS title, t[6:] AS body FROM docs),
          |dl AS (SELECT id,
          |    CAST(2 * len(title) + len(body) AS BIGINT) AS dl,
          |    title, body FROM fl),
          |stats AS (SELECT COUNT(*) AS n_docs,
          |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
          |tfu AS (SELECT id, dl, term, 2 AS w FROM (
          |    SELECT id, dl, unnest(title) AS term FROM dl)
          |  WHERE term IN ('spark', 'join', 'vector', 'window')
          |  UNION ALL SELECT id, dl, term, 1 AS w FROM (
          |    SELECT id, dl, unnest(body) AS term FROM dl)
          |  WHERE term IN ('spark', 'join', 'vector', 'window')),
          |tf1 AS (SELECT id, dl, term, CAST(SUM(w) AS BIGINT) AS tf
          |  FROM tfu GROUP BY id, dl, term),
          |dfq AS (SELECT term, COUNT(*) AS term_df FROM tf1 GROUP BY term),
          |sc AS (SELECT id,
          |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
          |      ((tf * (1.2 + 1.0)) / (tf + 1.2 *
          |        (1.0 - 0.75 + 0.75 * dl / avgdl))) AS contrib
          |  FROM tf1 JOIN dfq USING (term), stats)
          |SELECT id,
          |  round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6)
          |    AS score,
          |  count(*) AS n_matched
          |FROM sc GROUP BY id ORDER BY score DESC, id LIMIT 10""".stripMargin,

      // arrival order = event_id; runmax − ts vs each candidate delay
      "q248_lateness_audit" ->
        """WITH e AS (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP))
          |    AS ts_us FROM events),
          |lm AS (SELECT ts_us, max(ts_us) OVER (ORDER BY event_id
          |    ROWS UNBOUNDED PRECEDING) - ts_us AS late_us FROM e),
          |d AS (SELECT CAST(unnest([60000, 600000, 3600000]) AS BIGINT)
          |    AS delay_ms)
          |SELECT delay_ms, count(*) AS n_events,
          |  CAST(SUM(CASE WHEN late_us > delay_ms * 1000 THEN 1 ELSE 0
          |    END) AS BIGINT) AS n_dropped,
          |  CAST(SUM(CASE WHEN late_us > delay_ms * 1000 THEN 1 ELSE 0
          |    END) AS DOUBLE) / count(*) AS dropped_frac
          |FROM lm, d GROUP BY delay_ms ORDER BY delay_ms""".stripMargin,

      // the q26 fingerprint fold on the group key, the q226 keyHash
      // chain, then pure-BIGINT CDF threshold compares
      "q249_dp_counts" ->
        """WITH c AS (SELECT source, lang, count(*) AS n,
          |    source || '|' || lang AS gk
          |  FROM documents GROUP BY source, lang),
          |fp AS (SELECT source, lang, n,
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(range(1, length(gk) + 1),
          |        i -> CAST(ord(substring(gk, CAST(i AS INT), 1))
          |          AS BIGINT))),
          |      (acc, ch) -> (acc * 31 + ch) % 1000000007) AS f
          |  FROM c),
          |h0 AS (SELECT source, lang, n, (f * 1000003) % 2147483647 AS h
          |  FROM fp),
          |h1 AS (SELECT source, lang, n,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT source, lang, n,
          |    (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1),
          |nz AS (SELECT source, lang, n, CAST(CASE
          |    WHEN h < 2803503 THEN -8 WHEN h < 8410510 THEN -7
          |    WHEN h < 19624524 THEN -6 WHEN h < 42052551 THEN -5
          |    WHEN h < 86908607 THEN -4 WHEN h < 176620717 THEN -3
          |    WHEN h < 356044938 THEN -2 WHEN h < 714893381 THEN -1
          |    WHEN h < 1432590265 THEN 0 WHEN h < 1791438708 THEN 1
          |    WHEN h < 1970862929 THEN 2 WHEN h < 2060575039 THEN 3
          |    WHEN h < 2105431095 THEN 4 WHEN h < 2127859122 THEN 5
          |    WHEN h < 2139073136 THEN 6 WHEN h < 2144680143 THEN 7
          |    ELSE 8 END AS BIGINT) AS noise
          |  FROM h2)
          |SELECT source, lang, n, noise,
          |  greatest(CAST(0 AS BIGINT), n + noise) AS noisy_n
          |FROM nz ORDER BY source, lang""".stripMargin,

      // rank by name, 3 offset equi-joins, exact levenshtein verify
      "q250_sorted_neighborhood" ->
        """WITH base AS (SELECT doc_id AS id, substring(text, 1, 40)
          |    AS name FROM documents
          |  UNION ALL SELECT doc_id + 1000000,
          |    substring(text, 1, 20) || substring(text, 23, 18)
          |  FROM documents WHERE doc_id % 5 = 0),
          |rk AS (SELECT id, name, row_number()
          |    OVER (ORDER BY name, id) AS r FROM base),
          |cand AS (SELECT a.id AS id_a, a.name AS name_a, b.id AS id_b,
          |    b.name AS name_b
          |  FROM rk a JOIN rk b ON b.r - a.r BETWEEN 1 AND 3)
          |SELECT id_a, id_b, name_a, name_b,
          |  CAST(levenshtein(name_a, name_b) AS INT) AS dist
          |FROM cand WHERE levenshtein(name_a, name_b) <= 3
          |ORDER BY id_a, id_b""".stripMargin,

      // suffix-sum at-risk counts; the survival product folds the SAME
      // ordered factor list (list_reduce over list(f ORDER BY u))
      "q251_kaplan_meier" ->
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
          |  FROM ar WHERE d > 0)
          |SELECT a.t, a.n_at_risk, a.n_events,
          |  list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
          |    list(CAST(b.f AS DOUBLE) ORDER BY b.t)), (x, y) -> x * y)
          |    AS survival
          |FROM st a JOIN st b ON b.t <= a.t
          |GROUP BY a.t, a.n_at_risk, a.n_events
          |ORDER BY a.t""".stripMargin,

      // scaled CUSUM: T·cum − t·total, all BIGINT; ties all flagged
      "q252_cusum" ->
        """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
          |  FROM events GROUP BY 1),
          |tt AS (SELECT count(*) AS T, CAST(SUM(n_events) AS BIGINT) AS S
          |  FROM d),
          |c AS (SELECT day, n_events,
          |    CAST(T * SUM(n_events) OVER (ORDER BY day
          |        ROWS UNBOUNDED PRECEDING)
          |      - row_number() OVER (ORDER BY day) * S AS BIGINT) AS cusum
          |  FROM d, tt),
          |m AS (SELECT max(abs(cusum)) AS mx FROM c)
          |SELECT strftime(day, '%Y-%m-%d') AS day, n_events, cusum,
          |  abs(cusum) = mx AS is_peak
          |FROM c, m ORDER BY day""".stripMargin,

      // 7 date-shifted self-joins of the daily frame into the q111
      // exact-decimal Pearson
      "q253_lagged_corr" ->
        """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
          |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS x,
          |    CAST(SUM(CASE WHEN event_type = 'purchase'
          |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
          |      AS BIGINT) AS y
          |  FROM events GROUP BY 1),
          |lg AS (SELECT CAST(unnest([-3, -2, -1, 0, 1, 2, 3]) AS INT)
          |    AS lag),
          |pr AS (SELECT lag, a.x AS x, b.y AS y
          |  FROM lg, daily a JOIN daily b ON b.day = a.day + lag),
          |st AS (SELECT lag, COUNT(*) AS n,
          |    CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(24,6))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(y * y AS DECIMAL(24,6))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(x * y AS DECIMAL(24,6))) AS DOUBLE) AS sxy
          |  FROM pr GROUP BY lag)
          |SELECT lag, n,
          |  round((n * sxy - sx * sy) /
          |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
          |    AS corr
          |FROM st ORDER BY lag""".stripMargin,

      // the q99 pseudo-line CTEs over the twinned corpus; winner =
      // row_number 1 over (line ORDER BY id, idx); reassembled text
      // pinned by the q26 fingerprint fold
      "q254_line_dedup" ->
        """WITH c AS (SELECT doc_id, text FROM documents
          |  UNION ALL SELECT doc_id + 1000000, text FROM documents
          |  WHERE doc_id % 3 = 0),
          |d AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')
          |      AS toks
          |  FROM c),
          |l AS (SELECT doc_id,
          |    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
          |    ELSE list_transform(
          |      range(0, CAST(floor((len(toks) - 1) / 12) AS BIGINT) + 1),
          |      i -> array_to_string(
          |        toks[CAST(i * 12 + 1 AS INT) : CAST(i * 12 + 12 AS INT)],
          |        ' '))
          |    END AS lines
          |  FROM d),
          |ex AS (SELECT doc_id AS id, i - 1 AS idx,
          |    lines[CAST(i AS INT)] AS line
          |  FROM l, unnest(range(1, len(lines) + 1)) AS r(i)),
          |wn AS (SELECT id, idx, line, row_number()
          |    OVER (PARTITION BY line ORDER BY id, idx) AS rn FROM ex),
          |per AS (SELECT id,
          |    CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_kept,
          |    CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_dropped,
          |    coalesce(array_to_string(list(line ORDER BY idx)
          |      FILTER (rn = 1), ' '), '') AS nt
          |  FROM wn GROUP BY id)
          |SELECT id, n_kept, n_dropped,
          |  list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(range(1, length(nt) + 1),
          |      i -> CAST(ord(substring(nt, CAST(i AS INT), 1)) AS BIGINT))),
          |    (acc, ch) -> (acc * 31 + ch) % 1000000007) AS new_fp
          |FROM per ORDER BY id""".stripMargin,

      // the q76 z-value fold; identical rank-cut files and 2-D zone-map
      // skip conditions for both layouts
      "q255_zorder_skipping" ->
        """WITH b AS (SELECT l_partkey % 1024 AS px, l_suppkey % 1024
          |    AS sy, l_orderkey, l_linenumber FROM lineitem),
          |lx AS (SELECT px, sy, (row_number() OVER (ORDER BY px, sy,
          |    l_orderkey, l_linenumber) - 1) // 200 AS f FROM b),
          |lf AS (SELECT f, min(px) AS xmn, max(px) AS xmx, min(sy)
          |    AS ymn, max(sy) AS ymx, count(*) AS nr FROM lx GROUP BY f),
          |zb AS (SELECT px, sy, l_orderkey, l_linenumber,
          |    list_sum(list_transform(range(0, 10),
          |      i -> (((px >> i) & 1) << (2*i)) +
          |        (((sy >> i) & 1) << (2*i+1)))) AS zv FROM b),
          |zx AS (SELECT px, sy, (row_number() OVER (ORDER BY zv,
          |    l_orderkey, l_linenumber) - 1) // 200 AS f FROM zb),
          |zf AS (SELECT f, min(px) AS xmn, max(px) AS xmx, min(sy)
          |    AS ymn, max(sy) AS ymx, count(*) AS nr FROM zx GROUP BY f),
          |u AS (SELECT 'x_then_y' AS layout, xmn, xmx, ymn, ymx, nr
          |    FROM lf
          |  UNION ALL SELECT 'zorder', xmn, xmx, ymn, ymx, nr FROM zf),
          |sk AS (SELECT layout, nr,
          |    xmx < 100 OR xmn > 199 OR ymx < 300 OR ymn > 399 AS s
          |  FROM u)
          |SELECT layout, count(*) AS n_files,
          |  CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_skippable,
          |  CAST(SUM(CASE WHEN s THEN nr ELSE 0 END) AS BIGINT)
          |    AS rows_skipped,
          |  CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
          |    AS file_skip_frac
          |FROM sk GROUP BY layout ORDER BY layout""".stripMargin,

      // the q98 candidate CTE joined to the q17 cosine replay and the
      // q25 quality replay — one row per candidate with all features
      "q256_ltr_features" ->
        s"""WITH cand AS ($bm25OracleSql),
           |qvx AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |dense AS (SELECT vec_id AS id,
           |    round(1.0 - list_cosine_similarity(
           |      CAST(embedding AS DOUBLE[]), qv), 6) AS cos_dist
           |  FROM embeddings, qvx),
           |pri AS (SELECT doc_id AS id, $qualitySql AS quality,
           |    CAST(length(text) AS INT) AS text_len FROM documents)
           |SELECT c.id AS doc_id, c.score AS bm25, c.n_matched,
           |  p.quality, p.text_len, d.cos_dist
           |FROM cand c JOIN pri p USING (id)
           |  LEFT JOIN dense d USING (id)
           |ORDER BY bm25 DESC, doc_id""".stripMargin,

      // identical two-window split; argmax via row_number over
      // (cnt DESC, cand); unseen prev states predict '' and miss
      "q257_nextevent_eval" ->
        """WITH e AS (SELECT user_id, event_id, event_type,
          |    CAST(ts AS TIMESTAMP) AS ts FROM events),
          |sq AS (SELECT user_id, event_type,
          |    lead(event_type) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS nxt,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts DESC, event_id DESC) AS rnd
          |  FROM e),
          |pr AS (SELECT user_id, event_type, nxt, rnd FROM sq
          |  WHERE nxt IS NOT NULL),
          |held AS (SELECT user_id, event_type AS prev, nxt AS actual
          |  FROM pr WHERE rnd = 2),
          |tr AS (SELECT event_type AS prev, nxt AS cand, count(*) AS cnt
          |  FROM pr WHERE rnd <> 2 GROUP BY 1, 2),
          |cd AS (SELECT h.user_id, h.actual,
          |    coalesce(t.cand, '') AS cand, coalesce(t.cnt, 0) AS cnt
          |  FROM held h LEFT JOIN tr t ON h.prev = t.prev),
          |pk AS (SELECT user_id, actual, cand, row_number()
          |    OVER (PARTITION BY user_id, actual
          |      ORDER BY cnt DESC, cand) AS rn
          |  FROM cd)
          |SELECT count(*) AS n_users,
          |  CAST(SUM(CASE WHEN cand = actual THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_correct,
          |  CAST(SUM(CASE WHEN cand = actual THEN 1 ELSE 0 END) AS DOUBLE)
          |    / count(*) AS accuracy
          |FROM pk WHERE rn = 1""".stripMargin,

      // policy = argmax mean train cents per ctx (row_number over
      // mean DESC, act); IPS = K·matched-cents / n_eval, exact ints
      "q258_policy_replay" ->
        """WITH e AS (SELECT user_id % 4 AS ctx, event_type AS act,
          |    coalesce(CAST(round(value * 100) AS BIGINT), 0) AS r,
          |    CAST(ts AS TIMESTAMP) AS ts
          |  FROM events),
          |tr AS (SELECT * FROM e WHERE ts < TIMESTAMP '2024-01-20'),
          |ev AS (SELECT * FROM e WHERE ts >= TIMESTAMP '2024-01-20'),
          |mn AS (SELECT ctx, act, CAST(SUM(r) AS DOUBLE) / count(*)
          |    AS m FROM tr GROUP BY ctx, act),
          |pol AS (SELECT ctx, act AS pi FROM (
          |    SELECT ctx, act, row_number() OVER (PARTITION BY ctx
          |      ORDER BY m DESC, act) AS rn FROM mn) WHERE rn = 1),
          |kk AS (SELECT count(DISTINCT act) AS K FROM tr)
          |SELECT ev.ctx, pol.pi, count(*) AS n_eval,
          |  CAST(SUM(CASE WHEN ev.act = pol.pi THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_matched,
          |  CAST(SUM(CASE WHEN ev.act = pol.pi THEN r ELSE 0 END)
          |    AS BIGINT) AS matched_cents,
          |  CAST(max(K) * SUM(CASE WHEN ev.act = pol.pi THEN r ELSE 0 END)
          |    AS DOUBLE) / count(*) AS ips_value
          |FROM ev JOIN pol ON ev.ctx = pol.ctx, kk
          |GROUP BY ev.ctx, pol.pi ORDER BY ev.ctx""".stripMargin,

      // per-row norms as the SAME left fold (list_reduce), means in
      // decimal
      "q259_embedding_qa" ->
        """WITH n AS (SELECT label,
          |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          |      list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
          |      (a, b) -> a + b)) AS nrm
          |  FROM embeddings)
          |SELECT label, count(*) AS n_vectors,
          |  CAST(SUM(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_zero,
          |  round(min(nrm), 6) AS min_norm,
          |  round(max(nrm), 6) AS max_norm,
          |  round(CAST(SUM(CAST(nrm AS DECIMAL(38,18))) AS DOUBLE)
          |    / count(*), 6) AS mean_norm
          |FROM n GROUP BY label ORDER BY label""".stripMargin,

      // identical (Sxx − Sx·Sx/n)/n parenthesization on decimal-exact
      // sums
      "q260_dim_variance" ->
        """WITH d AS (SELECT CAST(i - 1 AS INT) AS dim,
          |    CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) AS x
          |  FROM embeddings e,
          |    unnest(range(1, len(e.embedding) + 1)) AS r(i))
          |SELECT dim, count(*) AS n,
          |  round(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
          |    / count(*), 6) AS mean,
          |  round((CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE)
          |    - CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
          |      * CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE)
          |      / count(*)) / count(*), 6) AS variance
          |FROM d GROUP BY dim ORDER BY dim""".stripMargin,

      // identical lower-rank selection: value at rank
      // greatest(1, (p·n)//100) of the ascending gap order
      "q261_gap_percentiles" ->
        """WITH e AS (SELECT user_id, event_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
          |g AS (SELECT ts_us - lag(ts_us) OVER (PARTITION BY user_id
          |    ORDER BY ts_us, event_id) AS gap_us FROM e),
          |gg AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL),
          |nn AS (SELECT count(*) AS n FROM gg),
          |rk AS (SELECT gap_us, row_number() OVER (ORDER BY gap_us) AS r
          |  FROM gg),
          |pp AS (SELECT CAST(unnest([50, 90, 99]) AS INT) AS pct)
          |SELECT pct, gap_us, n AS n_gaps
          |FROM pp CROSS JOIN nn JOIN rk
          |  ON rk.r = greatest(1, (pct * n) // 100)
          |ORDER BY pct""".stripMargin,

      // month-truncated starts/closes, strict-prior cumsums
      "q262_backlog_curve" ->
        """WITH iv AS (SELECT o.o_orderkey,
          |    date_trunc('month', CAST(o.o_orderdate AS DATE)) AS sm,
          |    date_trunc('month', CAST(c.close_d AS DATE)) AS cm
          |  FROM orders o JOIN (SELECT l_orderkey,
          |      max(CAST(l_shipdate AS DATE)) AS close_d
          |    FROM lineitem GROUP BY l_orderkey) c
          |    ON o.o_orderkey = c.l_orderkey),
          |s AS (SELECT sm AS m, count(*) AS n_started FROM iv GROUP BY sm),
          |c AS (SELECT cm AS m, count(*) AS n_closed FROM iv GROUP BY cm),
          |mm AS (SELECT m FROM s UNION SELECT m FROM c),
          |j AS (SELECT mm.m, coalesce(n_started, 0) AS n_started,
          |    coalesce(n_closed, 0) AS n_closed
          |  FROM mm LEFT JOIN s USING (m) LEFT JOIN c USING (m))
          |SELECT strftime(m, '%Y-%m') AS month,
          |  CAST(n_started AS BIGINT) AS n_started,
          |  CAST(n_closed AS BIGINT) AS n_closed,
          |  CAST(coalesce(SUM(n_started) OVER (ORDER BY m
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    - coalesce(SUM(n_closed) OVER (ORDER BY m
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) AS open_at_month_start
          |FROM j ORDER BY month""".stripMargin,

      // revenue-ranked cumsum, integer threshold compares
      "q263_abc_classes" ->
        """WITH rev AS (SELECT l_partkey,
          |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
          |      AS BIGINT) AS cents
          |  FROM lineitem GROUP BY l_partkey),
          |tt AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot FROM rev),
          |cm AS (SELECT cents, CAST(SUM(cents) OVER (ORDER BY cents DESC,
          |      l_partkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |    tot
          |  FROM rev, tt),
          |cl AS (SELECT cents, tot, CASE
          |    WHEN cum * 100 <= tot * 80 THEN 'A'
          |    WHEN cum * 100 <= tot * 95 THEN 'B' ELSE 'C' END AS cls
          |  FROM cm)
          |SELECT cls, count(*) AS n_parts,
          |  CAST(SUM(cents) AS BIGINT) AS revenue_cents,
          |  CAST(SUM(cents) AS DOUBLE) / max(tot) AS revenue_share
          |FROM cl GROUP BY cls ORDER BY cls""".stripMargin,

      // the q107 week arithmetic; per-cohort integer cumsum
      "q264_cohort_ltv" ->
        """WITH e AS (SELECT user_id, event_type, value,
          |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
          |      - DATE '1970-01-01') // 7 AS INT) AS wk
          |  FROM events),
          |ch AS (SELECT user_id, min(wk) AS cohort_week FROM e
          |  GROUP BY user_id),
          |rv AS (SELECT cohort_week, wk - cohort_week AS week_offset,
          |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |      AS cents
          |  FROM e JOIN ch USING (user_id)
          |  WHERE event_type = 'purchase'
          |  GROUP BY cohort_week, wk - cohort_week)
          |SELECT cohort_week, week_offset, cents,
          |  CAST(SUM(cents) OVER (PARTITION BY cohort_week
          |    ORDER BY week_offset ROWS UNBOUNDED PRECEDING) AS BIGINT)
          |    AS cum_cents
          |FROM rv ORDER BY cohort_week, week_offset""".stripMargin,

      // same-user same-dollar within 24 h of the previous occurrence
      "q265_dup_payments" ->
        """WITH p AS (SELECT user_id, event_id,
          |    CAST(round(value * 100) AS BIGINT) // 100 AS dollars,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS tu
          |  FROM events WHERE event_type = 'purchase'),
          |l AS (SELECT user_id, event_id, dollars,
          |    tu - lag(tu) OVER (PARTITION BY user_id, dollars
          |      ORDER BY tu, event_id) AS gap_us
          |  FROM p)
          |SELECT user_id, event_id, dollars, gap_us
          |FROM l WHERE gap_us IS NOT NULL AND gap_us <= 86400000000
          |ORDER BY user_id, event_id""".stripMargin,

      // three ceil-rank quintile codes over purchasing users
      "q266_rfm_segments" ->
        """WITH p AS (SELECT user_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
          |    CAST(round(value * 100) AS BIGINT) AS cents
          |  FROM events WHERE event_type = 'purchase'),
          |per AS (SELECT user_id, max(tu) AS last_tu, count(*) AS freq,
          |    CAST(SUM(cents) AS BIGINT) AS monetary
          |  FROM p GROUP BY user_id),
          |nn AS (SELECT count(*) AS n FROM per),
          |cd AS (SELECT monetary,
          |    (5 * row_number() OVER (ORDER BY last_tu, user_id)
          |      + n - 1) // n AS r_code,
          |    (5 * row_number() OVER (ORDER BY freq, user_id)
          |      + n - 1) // n AS f_code,
          |    (5 * row_number() OVER (ORDER BY monetary, user_id)
          |      + n - 1) // n AS m_code
          |  FROM per, nn)
          |SELECT r_code, f_code, m_code, count(*) AS n_users,
          |  CAST(SUM(monetary) AS BIGINT) AS cents,
          |  CAST(SUM(monetary) AS DOUBLE) / count(*) AS mean_cents
          |FROM cd GROUP BY r_code, f_code, m_code
          |ORDER BY r_code, f_code, m_code""".stripMargin,

      // per-priority exact lower-rank p50/p90 of orderdate → last ship
      "q267_cycle_time" ->
        """WITH ls AS (SELECT l_orderkey,
          |    max(CAST(l_shipdate AS DATE)) AS last_ship
          |  FROM lineitem GROUP BY l_orderkey),
          |cy AS (SELECT o.o_orderpriority AS priority, o.o_orderkey,
          |    date_diff('day', CAST(o.o_orderdate AS DATE), last_ship)
          |      AS cycle_days
          |  FROM orders o JOIN ls ON o.o_orderkey = ls.l_orderkey),
          |rk AS (SELECT priority, cycle_days,
          |    row_number() OVER (PARTITION BY priority
          |      ORDER BY cycle_days, o_orderkey) AS r,
          |    count(*) OVER (PARTITION BY priority) AS n
          |  FROM cy),
          |pp AS (SELECT CAST(unnest([50, 90]) AS INT) AS pct)
          |SELECT priority, pct, CAST(cycle_days AS INT) AS cycle_days,
          |  n AS n_orders
          |FROM pp CROSS JOIN rk
          |WHERE rk.r = greatest(1, (pct * n) // 100)
          |ORDER BY priority, pct""".stripMargin,

      // isodow ≡ Spark weekday+1 (Monday 1 .. Sunday 7)
      "q268_dow_seasonality" ->
        """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
          |  FROM events GROUP BY 1),
          |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, count(*) AS td
          |  FROM d)
          |SELECT CAST(isodow(day) AS INT) AS dow,
          |  CAST(SUM(n) AS BIGINT) AS n_events, count(*) AS n_days,
          |  CAST(SUM(n) * td AS DOUBLE) / (tn * count(*)) AS index
          |FROM d, t GROUP BY isodow(day), tn, td
          |ORDER BY dow""".stripMargin,

      // distinct (user, day, type) baskets; lift = n_ab·N/(n_a·n_b)
      "q269_basket_lift" ->
        """WITH bk AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
          |    event_type FROM events),
          |nb AS (SELECT count(*) AS N FROM (
          |    SELECT DISTINCT user_id, day FROM bk)),
          |s1 AS (SELECT event_type, count(*) AS n_one FROM bk
          |  GROUP BY event_type),
          |pr AS (SELECT x.event_type AS a, y.event_type AS b,
          |    count(*) AS n_both
          |  FROM bk x JOIN bk y ON x.user_id = y.user_id
          |    AND x.day = y.day AND x.event_type < y.event_type
          |  GROUP BY 1, 2)
          |SELECT a, b, CAST(n_both AS BIGINT) AS n_both,
          |  CAST(n_both * N AS DOUBLE) / (sa.n_one * sb.n_one) AS lift
          |FROM pr JOIN s1 sa ON pr.a = sa.event_type
          |  JOIN s1 sb ON pr.b = sb.event_type, nb
          |ORDER BY a, b""".stripMargin,

      // identical sqrt/division tree on exact gap sums
      "q270_order_regularity" ->
        """WITH o AS (SELECT o_custkey, o_orderkey,
          |    CAST(o_orderdate AS DATE) AS d FROM orders),
          |g AS (SELECT o_custkey,
          |    date_diff('day', lag(d) OVER (PARTITION BY o_custkey
          |      ORDER BY d, o_orderkey), d) AS gap
          |  FROM o),
          |gg AS (SELECT o_custkey, CAST(gap AS BIGINT) AS gap FROM g
          |  WHERE gap IS NOT NULL),
          |ag AS (SELECT o_custkey, count(*) AS n_gaps,
          |    CAST(SUM(gap) AS BIGINT) AS sx,
          |    CAST(SUM(gap * gap) AS BIGINT) AS sxx
          |  FROM gg GROUP BY o_custkey)
          |SELECT o_custkey, n_gaps,
          |  round(CAST(sx AS DOUBLE) / n_gaps, 6) AS mean_gap,
          |  round(sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          |      * CAST(sx AS DOUBLE) / n_gaps) / n_gaps)
          |    / (CAST(sx AS DOUBLE) / n_gaps), 6) AS cv
          |FROM ag WHERE n_gaps >= 4
          |ORDER BY cv, o_custkey LIMIT 20""".stripMargin,

      // the q111 exact-decimal Pearson over lineitem ⋈ part brands
      "q271_discount_elasticity" ->
        """WITH j AS (SELECT p.p_brand, l.l_discount AS x,
          |    l.l_quantity AS y
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
          |st AS (SELECT p_brand, COUNT(*) AS n,
          |    CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(24,6))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(y * y AS DECIMAL(24,6))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(x * y AS DECIMAL(24,6))) AS DOUBLE) AS sxy
          |  FROM j GROUP BY p_brand)
          |SELECT p_brand, n,
          |  round((n * sxy - sx * sy) /
          |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
          |    AS corr
          |FROM st ORDER BY p_brand""".stripMargin,

      // two weekly captures, N̂ = n1·n2/m
      "q272_capture_recapture" ->
        """WITH e AS (SELECT user_id,
          |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
          |      - DATE '1970-01-01') // 7 AS INT) AS wk FROM events),
          |w0 AS (SELECT min(wk) AS w0 FROM e),
          |s1 AS (SELECT DISTINCT user_id FROM e, w0 WHERE wk = w0),
          |s2 AS (SELECT DISTINCT user_id FROM e, w0 WHERE wk = w0 + 1),
          |c1 AS (SELECT count(*) AS n1 FROM s1),
          |c2 AS (SELECT count(*) AS n2 FROM s2),
          |cm AS (SELECT count(*) AS m FROM s1 JOIN s2 USING (user_id))
          |SELECT n1, n2, m, CASE WHEN m > 0
          |  THEN CAST(n1 * n2 AS DOUBLE) / m END AS n_hat
          |FROM c1, c2, cm""".stripMargin,

      // generate_series spine + IGNORE NULLS last_value carry-forward
      "q273_forward_fill" ->
        """WITH d AS (SELECT CAST(ts AS DATE) AS day,
          |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |      AS cents
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
          |sp AS (SELECT min(CAST(ts AS DATE)) AS d0,
          |    max(CAST(ts AS DATE)) AS d1 FROM events),
          |spine AS (SELECT CAST(unnest(generate_series(d0, d1,
          |    INTERVAL 1 DAY)) AS DATE) AS day FROM sp),
          |j AS (SELECT spine.day, d.cents
          |  FROM spine LEFT JOIN d USING (day))
          |SELECT strftime(day, '%Y-%m-%d') AS day, cents,
          |  CAST(coalesce(last_value(cents IGNORE NULLS)
          |    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING), 0) AS BIGINT)
          |    AS filled_cents,
          |  cents IS NOT NULL AS is_observed
          |FROM j ORDER BY day""".stripMargin,

      // day − row_number is constant within a consecutive-day run
      "q274_longest_streak" ->
        """WITH dy AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
          |  FROM events),
          |r AS (SELECT user_id, day, row_number()
          |    OVER (PARTITION BY user_id ORDER BY day) AS rn FROM dy),
          |g AS (SELECT user_id, day - CAST(rn AS INT) AS isl, day FROM r),
          |a AS (SELECT user_id, count(*) AS streak_days,
          |    strftime(min(day), '%Y-%m-%d') AS streak_start
          |  FROM g GROUP BY user_id, isl)
          |SELECT user_id, streak_days, streak_start FROM a
          |ORDER BY streak_days DESC, streak_start, user_id
          |LIMIT 20""".stripMargin,

      // undirected q101 degrees on both endpoints into the q111 Pearson
      "q275_assortativity" ->
        s"""$knnEdgesPrefixSql,
           |u0 AS (SELECT DISTINCT least(id, nbr_id) AS a,
           |    greatest(id, nbr_id) AS b
           |  FROM g0 WHERE id <> nbr_id),
           |nb2 AS (SELECT a AS v, b AS n FROM u0
           |  UNION ALL SELECT b AS v, a AS n FROM u0),
           |dg3 AS (SELECT v, count(*) AS deg FROM nb2 GROUP BY v),
           |en AS (SELECT dx.deg AS x, dy.deg AS y
           |  FROM nb2 JOIN dg3 dx ON nb2.v = dx.v
           |    JOIN dg3 dy ON nb2.n = dy.v),
           |st AS (SELECT COUNT(*) AS n,
           |    CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) AS sx,
           |    CAST(SUM(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS sy,
           |    CAST(SUM(CAST(x * x AS DECIMAL(24,6))) AS DOUBLE) AS sxx,
           |    CAST(SUM(CAST(y * y AS DECIMAL(24,6))) AS DOUBLE) AS syy,
           |    CAST(SUM(CAST(x * y AS DECIMAL(24,6))) AS DOUBLE) AS sxy
           |  FROM en)
           |SELECT n, round((n * sxy - sx * sy) /
           |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
           |  AS assortativity
           |FROM st""".stripMargin,

      // tf per (term, doc) → df / cf; burstiness = cf/df
      "q276_term_burstiness" ->
        """WITH toks AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '') AS t
          |  FROM documents),
          |tf AS (SELECT term, doc_id, count(*) AS c FROM (
          |    SELECT doc_id, unnest(t) AS term FROM toks)
          |  GROUP BY term, doc_id),
          |ag AS (SELECT term, count(*) AS df,
          |    CAST(SUM(c) AS BIGINT) AS cf FROM tf GROUP BY term)
          |SELECT term, df, cf, CAST(cf AS DOUBLE) / df AS burstiness
          |FROM ag WHERE df >= 5
          |ORDER BY burstiness DESC, term LIMIT 20""".stripMargin,

      // common neighbors scoped to EDGES (bridges keep 0 via left join)
      "q277_edge_embeddedness" ->
        s"""$knnEdgesPrefixSql,
           |u0 AS (SELECT DISTINCT least(id, nbr_id) AS a,
           |    greatest(id, nbr_id) AS b
           |  FROM g0 WHERE id <> nbr_id),
           |nb2 AS (SELECT a AS v, b AS n FROM u0
           |  UNION ALL SELECT b AS v, a AS n FROM u0),
           |cn AS (SELECT u0.a, u0.b, count(*) AS cn
           |  FROM u0 JOIN nb2 x ON u0.a = x.v JOIN nb2 y ON u0.b = y.v
           |  WHERE x.n = y.n AND x.n <> u0.a AND x.n <> u0.b
           |  GROUP BY u0.a, u0.b),
           |e2 AS (SELECT CAST(coalesce(cn.cn, 0) AS BIGINT)
           |    AS embeddedness
           |  FROM u0 LEFT JOIN cn USING (a, b))
           |SELECT embeddedness, count(*) AS n_edges FROM e2
           |GROUP BY embeddedness ORDER BY embeddedness""".stripMargin,

      // the q17 top-8 paired a<b; per-pair distances rounded to 6 dp on
      // BOTH sides, then the exact-decimal mean
      "q278_result_diversity" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
          |  FROM embeddings WHERE vec_id = 0),
          |top AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          |  FROM embeddings, q
          |  ORDER BY 1.0 - list_cosine_similarity(
          |    CAST(embedding AS DOUBLE[]), qv), vec_id LIMIT 8),
          |pr AS (SELECT round(1.0 - list_cosine_similarity(a.v, b.v), 6)
          |    AS d
          |  FROM top a JOIN top b ON a.vec_id < b.vec_id)
          |SELECT count(*) AS n_pairs,
          |  round(CAST(SUM(CAST(d AS DECIMAL(38,18))) AS DOUBLE)
          |    / count(*), 6) AS mean_pairwise_distance
          |FROM pr""".stripMargin,

      // fulfilment SLA: lines shipped ≤ 30 days after order, per month
      "q279_fill_rate" ->
        """SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
          |  count(*) AS n_lines,
          |  CAST(SUM(CASE WHEN date_diff('day',
          |      CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
          |      <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30d,
          |  CAST(SUM(CASE WHEN date_diff('day',
          |      CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
          |      <= 30 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
          |    AS fill_rate
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY 1 ORDER BY month""".stripMargin,

      // identical Wilson tree with z = 1.96 literals on both sides
      "q280_error_wilson" ->
        """WITH h AS (SELECT strftime(CAST(ts AS TIMESTAMP),
          |      '%Y-%m-%d %H') AS hour,
          |    count(*) AS n,
          |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS errs
          |  FROM events GROUP BY 1)
          |SELECT hour, n, errs,
          |  round(CAST(errs AS DOUBLE) / n, 6) AS err_rate,
          |  round(greatest(0.0,
          |    ((CAST(errs AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n))
          |    - 1.96 * sqrt((CAST(errs AS DOUBLE) / n
          |        * (1.0 - CAST(errs AS DOUBLE) / n)
          |        + 1.96 * 1.96 / (4.0 * n)) / n))
          |    / (1.0 + 1.96 * 1.96 / n)), 6) AS wilson_lo,
          |  round(((CAST(errs AS DOUBLE) / n + 1.96 * 1.96 / (2.0 * n))
          |    + 1.96 * sqrt((CAST(errs AS DOUBLE) / n
          |        * (1.0 - CAST(errs AS DOUBLE) / n)
          |        + 1.96 * 1.96 / (4.0 * n)) / n))
          |    / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
          |FROM h ORDER BY hour""".stripMargin,

      // the q246 user frame deciled by pre-activity ceil-rank; per
      // decile treated/control means and their difference
      "q281_uplift_deciles" ->
        """WITH uu AS (SELECT DISTINCT user_id FROM events),
          |px AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
          |  FROM events WHERE event_type = 'view'
          |    AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20'
          |  GROUP BY user_id),
          |py AS (SELECT user_id,
          |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          |  FROM events WHERE event_type = 'purchase'
          |    AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-20'
          |  GROUP BY user_id),
          |base AS (SELECT uu.user_id, coalesce(x, 0) AS x,
          |    coalesce(y, 0) AS y
          |  FROM uu LEFT JOIN px USING (user_id)
          |    LEFT JOIN py USING (user_id)),
          |h0 AS (SELECT user_id, x, y,
          |    (user_id * 1000003) % 2147483647 AS h FROM base),
          |h1 AS (SELECT user_id, x, y,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT user_id, x, y,
          |    (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1),
          |arm AS (SELECT user_id, x, y, h % 2 = 0 AS treated FROM h2),
          |nn AS (SELECT count(*) AS n FROM arm),
          |dc AS (SELECT treated, y, (10 * row_number()
          |      OVER (ORDER BY x, user_id) + n - 1) // n AS decile
          |  FROM arm, nn),
          |ag AS (SELECT decile,
          |    CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_treated,
          |    CAST(SUM(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT)
          |      AS n_control,
          |    CASE WHEN SUM(CASE WHEN treated THEN 1 ELSE 0 END) > 0
          |      THEN CAST(SUM(CASE WHEN treated THEN y ELSE 0 END)
          |        AS DOUBLE) / SUM(CASE WHEN treated THEN 1 ELSE 0 END)
          |      END AS mean_treated,
          |    CASE WHEN SUM(CASE WHEN treated THEN 0 ELSE 1 END) > 0
          |      THEN CAST(SUM(CASE WHEN treated THEN 0 ELSE y END)
          |        AS DOUBLE) / SUM(CASE WHEN treated THEN 0 ELSE 1 END)
          |      END AS mean_control
          |  FROM dc GROUP BY decile)
          |SELECT decile, n_treated, n_control, mean_treated,
          |  mean_control, mean_treated - mean_control AS uplift
          |FROM ag ORDER BY decile""".stripMargin,

      // n/arm = 2(z_α/2+z_β)²σ²/δ², fixed z literals, σ² from exact sums
      "q282_power_table" ->
        """WITH pu AS (SELECT user_id,
          |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
          |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          |st AS (SELECT count(*) AS n, CAST(SUM(y) AS BIGINT) AS sy,
          |    CAST(SUM(y * y) AS BIGINT) AS syy FROM pu),
          |v AS (SELECT n, (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
          |    * CAST(sy AS DOUBLE) / n) / n AS var_y FROM st),
          |g AS (SELECT CAST(unnest([500, 1000, 2000, 5000]) AS BIGINT)
          |    AS mde_cents)
          |SELECT mde_cents, n AS n_users, round(var_y, 6) AS var_cents,
          |  round((2.0 * ((1.959964 + 0.841621) * (1.959964 + 0.841621)))
          |    * var_y / CAST(mde_cents * mde_cents AS DOUBLE), 2)
          |    AS n_per_arm
          |FROM g, v ORDER BY mde_cents""".stripMargin,

      // (2n_a − n)²/n against the 3.84 (df=1, 95%) literal
      "q283_srm_check" ->
        """WITH u AS (SELECT DISTINCT user_id FROM events),
          |h0 AS (SELECT (user_id * 1000003) % 2147483647 AS h FROM u),
          |h1 AS (SELECT (xor(h, h >> 16) * 73244475) % 2147483647 AS h
          |  FROM h0),
          |h2 AS (SELECT (xor(h, h >> 13) * 73244475) % 2147483647 AS h
          |  FROM h1),
          |a AS (SELECT
          |    CAST(SUM(CASE WHEN h % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_a,
          |    CAST(SUM(CASE WHEN h % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT)
          |      AS n_b
          |  FROM h2)
          |SELECT n_a, n_b, n_a + n_b AS n,
          |  round(CAST((2 * n_a - (n_a + n_b)) * (2 * n_a - (n_a + n_b))
          |    AS DOUBLE) / (n_a + n_b), 6) AS chi2,
          |  round(CAST((2 * n_a - (n_a + n_b)) * (2 * n_a - (n_a + n_b))
          |    AS DOUBLE) / (n_a + n_b), 6) > 3.841459 AS srm_suspect
          |FROM a""".stripMargin,

      // DAU mean over MAU per month, exact sums into one division
      "q284_dau_mau" ->
        """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
          |    strftime(CAST(ts AS DATE), '%Y-%m') AS month FROM events),
          |d AS (SELECT month, day, count(DISTINCT user_id) AS dau
          |  FROM ev GROUP BY month, day),
          |da AS (SELECT month, CAST(SUM(dau) AS BIGINT) AS dau_sum,
          |    count(*) AS n_days FROM d GROUP BY month),
          |m AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT)
          |    AS mau FROM ev GROUP BY month)
          |SELECT month, dau_sum, n_days, mau,
          |  CAST(dau_sum AS DOUBLE) / (n_days * mau) AS stickiness
          |FROM da JOIN m USING (month) ORDER BY month""".stripMargin,

      // HHI in 128-bit arithmetic (HUGEINT ≡ Spark's decimal(38,0))
      "q285_hhi_trend" ->
        """WITH r AS (SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m')
          |      AS month, l_suppkey,
          |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
          |      AS BIGINT) AS cents
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT month, count(*) AS n_suppliers,
          |  CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
          |    / CAST(SUM(CAST(cents AS HUGEINT))
          |      * SUM(CAST(cents AS HUGEINT)) AS DOUBLE) AS hhi
          |FROM r GROUP BY month ORDER BY month""".stripMargin,

      // first-week / previous-week lags drive the state machine;
      // churn(w) = active in w−1, absent in w
      "q286_growth_accounting" ->
        """WITH uw AS (SELECT DISTINCT user_id,
          |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
          |      - DATE '1970-01-01') // 7 AS INT) AS wk FROM events),
          |t AS (SELECT user_id, wk,
          |    min(wk) OVER (PARTITION BY user_id) AS first_wk,
          |    lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
          |  FROM uw),
          |st AS (SELECT wk, CASE WHEN wk = first_wk THEN 'new'
          |    WHEN prev_wk = wk - 1 THEN 'retained'
          |    ELSE 'resurrected' END AS state FROM t),
          |act AS (SELECT wk,
          |    CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_new,
          |    CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_retained,
          |    CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_resurrected,
          |    count(*) AS n_active
          |  FROM st GROUP BY wk),
          |ch AS (SELECT u1.wk + 1 AS wk, count(*) AS n_churned
          |  FROM uw u1 LEFT JOIN uw u2 ON u1.user_id = u2.user_id
          |    AND u2.wk = u1.wk + 1
          |  WHERE u2.user_id IS NULL GROUP BY u1.wk + 1)
          |SELECT act.wk, n_new, n_retained, n_resurrected, n_active,
          |  CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
          |FROM act LEFT JOIN ch USING (wk) ORDER BY wk""".stripMargin,

      // (errs + m·20)/(n + 20) with the global mean m — same tree
      "q287_eb_shrinkage" ->
        """WITH h AS (SELECT strftime(CAST(ts AS TIMESTAMP),
          |      '%Y-%m-%d %H') AS hour, count(*) AS n,
          |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |      AS BIGINT) AS errs
          |  FROM events GROUP BY 1),
          |g AS (SELECT CAST(SUM(errs) AS BIGINT) AS te,
          |    CAST(SUM(n) AS BIGINT) AS tn FROM h)
          |SELECT hour, n, errs,
          |  round(CAST(errs AS DOUBLE) / n, 6) AS raw_rate,
          |  round((CAST(errs AS DOUBLE) + CAST(te AS DOUBLE) / tn * 20.0)
          |    / (CAST(n AS DOUBLE) + 20.0), 6) AS shrunk_rate
          |FROM h, g ORDER BY hour""".stripMargin,

      // peak·hours/total per day
      "q288_load_factor" ->
        """WITH hh AS (SELECT strftime(CAST(ts AS TIMESTAMP),
          |      '%Y-%m-%d') AS day,
          |    hour(CAST(ts AS TIMESTAMP)) AS hr, count(*) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT day, CAST(SUM(n) AS BIGINT) AS n_events,
          |  CAST(max(n) AS BIGINT) AS peak_hour_n, count(*) AS n_hours,
          |  CAST(max(n) * count(*) AS DOUBLE) / SUM(n) AS load_factor
          |FROM hh GROUP BY day ORDER BY day""".stripMargin,

      // nation share within region, region share of world
      "q289_ratio_to_parent" ->
        """WITH j AS (SELECT r_name, n_name,
          |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
          |      AS BIGINT) AS cents
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |    JOIN customer ON o_custkey = c_custkey
          |    JOIN nation ON c_nationkey = n_nationkey
          |    JOIN region ON n_regionkey = r_regionkey
          |  GROUP BY r_name, n_name),
          |w AS (SELECT r_name, n_name, cents,
          |    CAST(SUM(cents) OVER (PARTITION BY r_name) AS BIGINT) AS rc,
          |    CAST(SUM(cents) OVER () AS BIGINT) AS wc FROM j)
          |SELECT r_name, n_name, cents,
          |  CAST(cents AS DOUBLE) / rc AS share_of_region,
          |  CAST(rc AS DOUBLE) / wc AS region_share_of_world
          |FROM w ORDER BY r_name, n_name""".stripMargin,

      // row_number replay of the bounded-heap top-3 per prefix
      "q290_prefix_completions" ->
        """WITH toks AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '') AS t
          |  FROM documents),
          |tf AS (SELECT term, doc_id, count(*) AS c FROM (
          |    SELECT doc_id, unnest(t) AS term FROM toks)
          |  GROUP BY term, doc_id),
          |ix AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cf FROM tf
          |  GROUP BY term),
          |fx AS (SELECT substring(term, 1, 2) AS prefix, term, cf
          |  FROM ix WHERE length(term) >= 2),
          |rk AS (SELECT prefix, term, cf, row_number()
          |    OVER (PARTITION BY prefix ORDER BY cf DESC, term) AS rn
          |  FROM fx)
          |SELECT prefix, term, cf FROM rk WHERE rn <= 3
          |ORDER BY prefix, cf DESC, term""".stripMargin,

      // distinct brands per order, q269's lift on the sales tables
      "q291_brand_cross_sell" ->
        """WITH bk AS (SELECT DISTINCT l_orderkey AS ok, p_brand
          |  FROM lineitem JOIN part ON l_partkey = p_partkey),
          |nb AS (SELECT count(*) AS N FROM (SELECT DISTINCT ok FROM bk)),
          |s1 AS (SELECT p_brand, count(*) AS n_one FROM bk
          |  GROUP BY p_brand),
          |pr AS (SELECT x.p_brand AS a, y.p_brand AS b, count(*)
          |    AS n_both
          |  FROM bk x JOIN bk y ON x.ok = y.ok AND x.p_brand < y.p_brand
          |  GROUP BY 1, 2)
          |SELECT a, b, CAST(n_both AS BIGINT) AS n_both,
          |  CAST(n_both * N AS DOUBLE) / (sa.n_one * sb.n_one) AS lift
          |FROM pr JOIN s1 sa ON pr.a = sa.p_brand
          |  JOIN s1 sb ON pr.b = sb.p_brand, nb
          |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin,

      // q248's high-water lateness, p95 lower-rank per day
      "q292_freshness_sla" ->
        """WITH e AS (SELECT event_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
          |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
          |  FROM events),
          |lm AS (SELECT day, event_id, max(ts_us) OVER (ORDER BY event_id
          |    ROWS UNBOUNDED PRECEDING) - ts_us AS late_us FROM e),
          |rk AS (SELECT day, late_us, row_number() OVER (PARTITION BY day
          |      ORDER BY late_us, event_id) AS r,
          |    count(*) OVER (PARTITION BY day) AS n
          |  FROM lm)
          |SELECT day, late_us AS p95_late_us, n AS n_events
          |FROM rk WHERE r = greatest(1, (95 * n) // 100)
          |ORDER BY day""".stripMargin,

      // the q20 pair CTEs joined back to base-doc provenance
      "q293_dup_label_agreement" ->
        s"""WITH $minhashPairCtes,
           |pp AS (SELECT doc_a % 1000000 AS ba, doc_b % 1000000 AS bb
           |  FROM pairs WHERE est_jaccard >= 0.8),
           |me AS (SELECT doc_id, source, lang FROM documents),
           |j AS (SELECT x.source AS sa, x.lang AS la, y.source AS sb,
           |    y.lang AS lb
           |  FROM pp JOIN me x ON pp.ba = x.doc_id
           |    JOIN me y ON pp.bb = y.doc_id)
           |SELECT count(*) AS n_pairs,
           |  CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_same_source,
           |  CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_same_lang,
           |  CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS DOUBLE)
           |    / count(*) AS source_agreement,
           |  CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS DOUBLE)
           |    / count(*) AS lang_agreement
           |FROM j""".stripMargin,

      // top-50 per source by (cf DESC, term) then one term join;
      // union sizes from the actual list lengths
      "q294_vocab_overlap" ->
        """WITH tf AS (SELECT source, term, count(*) AS cf FROM (
          |    SELECT source, unnest(list_filter(
          |      regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
          |      AS term
          |    FROM documents)
          |  GROUP BY source, term),
          |rk AS (SELECT source, term, row_number() OVER (
          |    PARTITION BY source ORDER BY cf DESC, term) AS rn FROM tf),
          |tp AS (SELECT source, term FROM rk WHERE rn <= 50),
          |sz AS (SELECT source, count(*) AS sz FROM tp GROUP BY source),
          |sh AS (SELECT a.source AS src_a, b.source AS src_b, count(*)
          |    AS n_shared
          |  FROM tp a JOIN tp b ON a.term = b.term
          |    AND a.source < b.source
          |  GROUP BY 1, 2)
          |SELECT src_a, src_b, n_shared,
          |  CAST(n_shared AS DOUBLE) / (za.sz + zb.sz - n_shared)
          |    AS jaccard
          |FROM sh JOIN sz za ON sh.src_a = za.source
          |  JOIN sz zb ON sh.src_b = zb.source
          |ORDER BY src_a, src_b""".stripMargin,

      // the q27 session CTEs rolled up to daily bounce share
      "q296_bounce_rate" ->
        """WITH e AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
          |flagged AS (
          |  SELECT user_id, ts,
          |    CASE WHEN lag(ts) OVER w IS NULL
          |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
          |      THEN 1 ELSE 0 END AS new_session
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          |sx AS (
          |  SELECT user_id, ts,
          |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS session_id
          |  FROM flagged),
          |sess AS (SELECT min(ts) AS session_start, count(*) AS ne
          |  FROM sx GROUP BY user_id, session_id),
          |d AS (SELECT strftime(session_start, '%Y-%m-%d') AS day, ne
          |  FROM sess)
          |SELECT day, count(*) AS n_sessions,
          |  CAST(SUM(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_bounces,
          |  CAST(SUM(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          |    / count(*) AS bounce_rate
          |FROM d GROUP BY day ORDER BY day""".stripMargin,

      // 'R' share of lines and of cents per brand
      "q297_return_rate" ->
        """SELECT p_brand, count(*) AS n_lines,
          |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_returned,
          |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
          |    AS BIGINT) AS cents,
          |  CAST(SUM(CASE WHEN l_returnflag = 'R'
          |    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
          |    ELSE 0 END) AS BIGINT) AS returned_cents,
          |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          |    AS DOUBLE) / count(*) AS return_rate,
          |  CAST(SUM(CASE WHEN l_returnflag = 'R'
          |    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
          |    ELSE 0 END) AS DOUBLE)
          |    / SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
          |    AS returned_value_share
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

      // the q226 Welch chain replayed under four seed bases
      "q295_aa_calibration" -> {
        val seeds = Seq(1000003L, 999983L, 1000033L, 1000037L)
        val chains = seeds.zipWithIndex.map { case (b, i) =>
          s"""h0$i AS (SELECT user_id, v100,
             |    (user_id * $b) % 2147483647 AS h FROM pu),
             |h1$i AS (SELECT v100,
             |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0$i),
             |h2$i AS (SELECT v100,
             |    (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1$i),
             |arm$i AS (SELECT v100, h % 2 = 0 AS arm FROM h2$i),
             |sa$i AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
             |    CAST(SUM(CAST(v100 AS DECIMAL(38,0))) AS DOUBLE) AS sv_a,
             |    CAST(SUM(CAST(v100 * v100 AS DECIMAL(38,0))) AS DOUBLE)
             |      AS svv_a
             |  FROM arm$i WHERE arm),
             |sb$i AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
             |    CAST(SUM(CAST(v100 AS DECIMAL(38,0))) AS DOUBLE) AS sv_b,
             |    CAST(SUM(CAST(v100 * v100 AS DECIMAL(38,0))) AS DOUBLE)
             |      AS svv_b
             |  FROM arm$i WHERE NOT arm),
             |t$i AS (SELECT CAST($b AS BIGINT) AS seed_base,
             |    CASE WHEN n_a >= 2 AND n_b >= 2 THEN
             |      (sv_a / n_a - sv_b / n_b)
             |      / sqrt(((svv_a - sv_a * sv_a / n_a) / (n_a - 1)) / n_a
             |        + ((svv_b - sv_b * sv_b / n_b) / (n_b - 1)) / n_b)
             |    END AS t_stat
             |  FROM sa$i, sb$i)""".stripMargin
        }.mkString(",\n")
        val union = seeds.indices
          .map(i => s"SELECT seed_base, t_stat FROM t$i")
          .mkString("\nUNION ALL ")
        s"""WITH pu AS (SELECT user_id,
           |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           |      AS v100
           |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
           |$chains
           |SELECT seed_base, t_stat, abs(t_stat) > 1.96 AS suspicious
           |FROM ($union)
           |ORDER BY seed_base""".stripMargin
      },

      // first view, first at-or-after purchase, whole-day gap buckets
      "q298_conversion_lag" ->
        """WITH v AS (SELECT user_id,
          |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS tv
          |  FROM events WHERE event_type = 'view' GROUP BY user_id),
          |p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tp
          |  FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT v.user_id, min(v.tv) AS tv, min(p.tp) AS tp
          |  FROM v JOIN p ON v.user_id = p.user_id AND p.tp >= v.tv
          |  GROUP BY v.user_id)
          |SELECT (tp - tv) // 86400000000 AS days_to_convert,
          |  count(*) AS n_users
          |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

      // distinct (source, term) spread; exclusive = seen in 1 source
      "q299_vocab_exclusivity" ->
        """WITH st AS (SELECT DISTINCT source, term FROM (
          |    SELECT source, unnest(list_filter(
          |      regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
          |      AS term
          |    FROM documents)),
          |sp AS (SELECT term, count(*) AS n_sources FROM st
          |  GROUP BY term)
          |SELECT source, count(*) AS n_terms,
          |  CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_exclusive,
          |  CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)
          |    AS DOUBLE) / count(*) AS exclusivity
          |FROM st JOIN sp USING (term) GROUP BY source
          |ORDER BY source""".stripMargin,

      // the publishable one-glance audit row set
      "q300_health_scorecard" ->
        """SELECT metric, value FROM (
          |  SELECT 'docs_total' AS metric, CAST(count(*) AS DOUBLE)
          |    AS value FROM documents
          |  UNION ALL SELECT 'events_total', CAST(count(*) AS DOUBLE)
          |    FROM events
          |  UNION ALL SELECT 'users_distinct',
          |    CAST(count(DISTINCT user_id) AS DOUBLE) FROM events
          |  UNION ALL SELECT 'error_event_share',
          |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |      AS DOUBLE) / count(*) FROM events
          |  UNION ALL SELECT 'orphan_lineitems',
          |    CAST(count(*) AS DOUBLE)
          |    FROM lineitem l LEFT JOIN orders o
          |      ON l.l_orderkey = o.o_orderkey
          |    WHERE o.o_orderkey IS NULL
          |  UNION ALL SELECT 'purchase_cents_total',
          |    CAST(SUM(CASE WHEN event_type = 'purchase'
          |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
          |      AS DOUBLE) FROM events)
          |ORDER BY metric""".stripMargin,

      // ascending-revenue ceil-rank deciles, cumulative share points
      "q301_lorenz_curve" ->
        """WITH rev AS (SELECT l_suppkey,
          |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
          |      AS BIGINT) AS cents
          |  FROM lineitem GROUP BY l_suppkey),
          |nn AS (SELECT count(*) AS n, CAST(SUM(cents) AS BIGINT) AS tot
          |  FROM rev),
          |rk AS (SELECT cents, tot, (10 * row_number()
          |    OVER (ORDER BY cents, l_suppkey) + n - 1) // n AS decile
          |  FROM rev, nn),
          |ag AS (SELECT decile, count(*) AS n_suppliers,
          |    CAST(SUM(cents) AS BIGINT) AS cents, max(tot) AS tot
          |  FROM rk GROUP BY decile)
          |SELECT decile, n_suppliers, cents,
          |  CAST(CAST(SUM(cents) OVER (ORDER BY decile
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE) / tot
          |    AS cum_share
          |FROM ag ORDER BY decile""".stripMargin,

      // per-source length-octave fractions, pairwise Σ min
      "q302_hist_intersection" ->
        """WITH d AS (SELECT source,
          |    CAST(length(bin(greatest(length(text), 1))) AS INT)
          |      AS octave
          |  FROM documents),
          |per AS (SELECT source, octave, count(*) AS n FROM d
          |  GROUP BY source, octave),
          |tt AS (SELECT source, count(*) AS nt FROM d GROUP BY source),
          |fr AS (SELECT per.source, octave,
          |    CAST(n AS DOUBLE) / nt AS p
          |  FROM per JOIN tt ON per.source = tt.source)
          |SELECT a.source AS src_a, b.source AS src_b,
          |  round(CAST(SUM(CAST(least(a.p, b.p) AS DECIMAL(38,18)))
          |    AS DOUBLE), 6) AS intersection
          |FROM fr a JOIN fr b ON a.octave = b.octave
          |  AND a.source < b.source
          |GROUP BY a.source, b.source ORDER BY src_a, src_b""".stripMargin,

      // per-part top-supplier share; arg-top via row_number
      "q303_single_source_risk" ->
        """WITH vol AS (SELECT l_partkey, l_suppkey,
          |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
          |  FROM lineitem GROUP BY l_partkey, l_suppkey),
          |rk AS (SELECT l_partkey, l_suppkey, qty, row_number()
          |    OVER (PARTITION BY l_partkey ORDER BY qty DESC, l_suppkey)
          |      AS rn
          |  FROM vol),
          |ag AS (SELECT l_partkey, count(*) AS n_suppliers,
          |    CAST(SUM(qty) AS BIGINT) AS total_qty,
          |    CAST(max(qty) AS BIGINT) AS top_qty
          |  FROM vol GROUP BY l_partkey)
          |SELECT ag.l_partkey, n_suppliers, total_qty, top_qty,
          |  rk.l_suppkey AS top_suppkey,
          |  CAST(top_qty AS DOUBLE) / total_qty AS top_share,
          |  CAST(top_qty AS DOUBLE) / total_qty >= 0.8 AS single_sourced
          |FROM ag JOIN rk ON ag.l_partkey = rk.l_partkey AND rk.rn = 1
          |ORDER BY ag.l_partkey""".stripMargin,

      // every FK edge's orphan audit unioned; all-zero orphans expected
      "q304_fk_integrity_map" ->
        """SELECT fk_edge, n_rows, n_orphans,
          |  CAST(n_orphans AS DOUBLE) / n_rows AS orphan_rate
          |FROM (
          |  SELECT 'lineitem->orders' AS fk_edge,
          |    (SELECT count(*) FROM lineitem) AS n_rows,
          |    (SELECT count(*) FROM lineitem l LEFT JOIN orders o
          |      ON l.l_orderkey = o.o_orderkey
          |      WHERE o.o_orderkey IS NULL) AS n_orphans
          |  UNION ALL SELECT 'lineitem->part',
          |    (SELECT count(*) FROM lineitem),
          |    (SELECT count(*) FROM lineitem l LEFT JOIN part p
          |      ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
          |  UNION ALL SELECT 'lineitem->supplier',
          |    (SELECT count(*) FROM lineitem),
          |    (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
          |      ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
          |  UNION ALL SELECT 'orders->customer',
          |    (SELECT count(*) FROM orders),
          |    (SELECT count(*) FROM orders o LEFT JOIN customer c
          |      ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
          |  UNION ALL SELECT 'customer->nation',
          |    (SELECT count(*) FROM customer),
          |    (SELECT count(*) FROM customer c LEFT JOIN nation n
          |      ON c.c_nationkey = n.n_nationkey
          |      WHERE n.n_nationkey IS NULL)
          |  UNION ALL SELECT 'supplier->nation',
          |    (SELECT count(*) FROM supplier),
          |    (SELECT count(*) FROM supplier s LEFT JOIN nation n
          |      ON s.s_nationkey = n.n_nationkey
          |      WHERE n.n_nationkey IS NULL))
          |ORDER BY fk_edge""".stripMargin,

      // 5 keyHash folds; fold means in decimal, q260's variance tree on
      // the 5 means, rounded 12
      "q305_fold_stability" ->
        """WITH h0 AS (SELECT doc_id, text,
          |    (doc_id * 1000003) % 2147483647 AS h FROM documents),
          |h1 AS (SELECT doc_id, text,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT doc_id, text,
          |    (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1),
          |f AS (SELECT h % 5 AS fold,
          |    QUALITY_EXPR AS q
          |  FROM h2),
          |per AS (SELECT fold, count(*) AS n_docs,
          |    CAST(SUM(CAST(q AS DECIMAL(38,18))) AS DOUBLE) / count(*)
          |      AS mean_q
          |  FROM f GROUP BY fold),
          |sp AS (SELECT count(*) AS n_folds,
          |    round((CAST(SUM(CAST(mean_q * mean_q AS DECIMAL(38,18)))
          |        AS DOUBLE)
          |      - CAST(SUM(CAST(mean_q AS DECIMAL(38,18))) AS DOUBLE)
          |        * CAST(SUM(CAST(mean_q AS DECIMAL(38,18))) AS DOUBLE)
          |        / count(*)) / count(*), 12) AS between_fold_var
          |  FROM per)
          |SELECT fold, n_docs, round(mean_q, 6) AS mean_q,
          |  between_fold_var
          |FROM per, sp ORDER BY fold""".stripMargin
          .replace("QUALITY_EXPR", qualitySql),

      // the q35 assignment CTEs; skew stats on one 8-row frame
      "q306_cell_balance" ->
        s"""$knnEdgesPrefixSql,
           |sz AS (SELECT centroid_id, count(*) AS n_vectors FROM a
           |  GROUP BY centroid_id),
           |st AS (SELECT count(*) AS k,
           |    CAST(SUM(n_vectors) AS BIGINT) AS n,
           |    CAST(max(n_vectors) AS BIGINT) AS mx,
           |    CAST(SUM(n_vectors * n_vectors) AS BIGINT) AS sxx
           |  FROM sz)
           |SELECT centroid_id, CAST(n_vectors AS BIGINT) AS n_vectors,
           |  CAST(n_vectors AS DOUBLE) / n AS share,
           |  CAST(mx * k AS DOUBLE) / n AS max_over_mean,
           |  round(sqrt((CAST(sxx AS DOUBLE)
           |      - CAST(n AS DOUBLE) * CAST(n AS DOUBLE) / k) / k)
           |    / (CAST(n AS DOUBLE) / k), 6) AS cv
           |FROM sz, st ORDER BY centroid_id""".stripMargin,

      // centroid ranking by query cosine; scanned = Σ sizes of the
      // nprobe nearest cells
      "q307_probe_cost_curve" ->
        s"""$knnEdgesPrefixSql,
           |sz AS (SELECT centroid_id, count(*) AS sz FROM a
           |  GROUP BY centroid_id),
           |qq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |rkc AS (SELECT c.cid, sz.sz, row_number() OVER (ORDER BY
           |    1.0 - list_cosine_similarity(c.cv, qv), c.cid) AS rk
           |  FROM c, qq JOIN sz ON c.cid = sz.centroid_id),
           |tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS n FROM sz),
           |pp AS (SELECT CAST(unnest([1, 2, 4]) AS INT) AS nprobe)
           |SELECT nprobe, CAST(SUM(sz) AS BIGINT) AS n_scanned,
           |  CAST(SUM(sz) AS DOUBLE) / max(n) AS scan_fraction
           |FROM pp, rkc, tot WHERE rkc.rk <= pp.nprobe
           |GROUP BY nprobe ORDER BY nprobe""".stripMargin,

      // keyHash-parity halves; per-half top-20 by (cf DESC, term)
      "q308_splithalf_topterms" ->
        """WITH h0 AS (SELECT doc_id, text,
          |    (doc_id * 1000003) % 2147483647 AS h FROM documents),
          |h1 AS (SELECT doc_id, text,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT doc_id, text,
          |    (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1),
          |f AS (SELECT h % 2 AS half,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '') AS t
          |  FROM h2),
          |tf AS (SELECT half, term, count(*) AS cf FROM (
          |    SELECT half, unnest(t) AS term FROM f)
          |  GROUP BY half, term),
          |rk AS (SELECT half, term, row_number() OVER (
          |    PARTITION BY half ORDER BY cf DESC, term) AS rn FROM tf),
          |tp AS (SELECT half, term FROM rk WHERE rn <= 20)
          |SELECT count(*) AS n_overlap,
          |  CAST(count(*) AS DOUBLE) / 20.0 AS overlap_at_20
          |FROM tp a JOIN tp b ON a.term = b.term
          |  AND a.half = 0 AND b.half = 1""".stripMargin,

      // member→centroid distances rounded 6 dp, exact-decimal means
      "q309_cell_distortion" ->
        s"""$knnEdgesPrefixSql,
           |dd AS (SELECT a.centroid_id,
           |    round(1.0 - list_cosine_similarity(
           |      CAST(a.embedding AS DOUBLE[]), c.cv), 6) AS d
           |  FROM a JOIN c ON a.centroid_id = c.cid)
           |SELECT centroid_id, count(*) AS n_vectors,
           |  round(CAST(SUM(CAST(d AS DECIMAL(38,18))) AS DOUBLE)
           |    / count(*), 6) AS mean_distortion,
           |  round(max(d), 6) AS max_distortion
           |FROM dd GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,

      // power-of-two half-life weights: ×32 keeps everything BIGINT
      "q310_decayed_popularity" ->
        """WITH e AS (SELECT event_type,
          |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
          |      - DATE '1970-01-01') // 7 AS INT) AS wk FROM events),
          |m AS (SELECT max(wk) AS mw FROM e),
          |w AS (SELECT event_type, least(mw - wk, 5) AS age_wk
          |  FROM e, m),
          |x AS (SELECT event_type, CAST(1 << (5 - age_wk) AS BIGINT)
          |    AS w32 FROM w)
          |SELECT event_type, count(*) AS n_events,
          |  CAST(SUM(w32) AS BIGINT) AS decayed_x32,
          |  CAST(SUM(w32) AS DOUBLE) / 32.0 AS decayed_score
          |FROM x GROUP BY event_type
          |ORDER BY decayed_x32 DESC, event_type""".stripMargin,

      // forced-distributed hash-min labels converge to the same fixpoint
      // as the union-find — byte-identical oracle to q56
      "q311_wcc_distributed" -> dedupClustersOracleSql,

      // q54's assign/probe replay with the label predicate applied to
      // the probed-cell scan (pre-filter semantics)
      "q312_filtered_ann" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
          |c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |assign AS (
          |  SELECT vec_id, centroid_id FROM (
          |    SELECT e.vec_id, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |probes AS (SELECT cid FROM c, q ORDER BY list_distance(cv, qv), cid LIMIT 2)
          |SELECT e.vec_id, e.label, a.centroid_id,
          |  round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), 6) AS distance
          |FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, q
          |WHERE a.centroid_id IN (SELECT cid FROM probes) AND e.label = 2
          |ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), e.vec_id
          |LIMIT 8""".stripMargin,

      // rank-equivalent Dirichlet QL over matched rows only: the zero-tf
      // smoothing mass folds into the dl-only term (× |q| = 4); same
      // decimal-sum + round-6 ln discipline as q98
      "q313_query_likelihood" -> queryLikelihoodOracleSql,

      // per-depth agreement X_d/d scaled by exact 2^-d — each term is one
      // correctly-rounded division times an exact power of two, so the
      // decimal sum matches bit-for-bit
      "q314_rbo" ->
        s"""WITH bm AS ($bm25OracleSql),
           |ql AS ($queryLikelihoodOracleSql),
           |ar AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS ra FROM bm),
           |br AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rb FROM ql),
           |j AS (SELECT COALESCE(ra, 999) AS ra, COALESCE(rb, 999) AS rb
           |  FROM ar FULL OUTER JOIN br USING (id)),
           |x AS (SELECT d, CAST(SUM(CASE WHEN greatest(ra, rb) <= d
           |      THEN 1 ELSE 0 END) AS BIGINT) AS x_d
           |  FROM j, unnest(range(1, 21)) AS u(d) GROUP BY d)
           |SELECT round(CAST(SUM(CAST((CAST(x_d AS DOUBLE) / d)
           |    / CAST(1 << d AS DOUBLE) AS DECIMAL(27,15))) AS DOUBLE), 6) AS rbo,
           |  CAST(MAX(CASE WHEN d = 20 THEN x_d END) AS DOUBLE) / 20.0
           |    AS overlap_at_20
           |FROM x""".stripMargin,

      // exact-integer TVD: Σ|n_cs·N − N_s·n_c| over HUGEINT (≡ the Spark
      // side's decimal(38,0) — count products overflow BIGINT at scale),
      // one double division per class
      "q315_t_closeness" ->
        """WITH cell AS (SELECT lang, n_chars // 100 AS len_bucket, source,
          |    CAST(count(*) AS BIGINT) AS n_cs
          |  FROM documents GROUP BY 1, 2, 3),
          |cls AS (SELECT lang, len_bucket, CAST(SUM(n_cs) AS BIGINT) AS n_c
          |  FROM cell GROUP BY 1, 2),
          |gl AS (SELECT source, CAST(SUM(n_cs) AS BIGINT) AS n_s
          |  FROM cell GROUP BY 1),
          |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot FROM gl),
          |grid AS (SELECT c.lang, c.len_bucket, c.n_c, g.source, g.n_s,
          |    COALESCE(x.n_cs, 0) AS n_cs, t.n_tot
          |  FROM cls c CROSS JOIN gl g CROSS JOIN tot t
          |  LEFT JOIN cell x ON x.lang = c.lang
          |    AND x.len_bucket = c.len_bucket AND x.source = g.source)
          |SELECT lang, len_bucket, MAX(n_c) AS class_size,
          |  (CAST(SUM(ABS(CAST(n_cs AS HUGEINT) * n_tot
          |      - CAST(n_s AS HUGEINT) * n_c)) AS DOUBLE)
          |    / CAST(MAX(CAST(n_c AS HUGEINT) * n_tot) AS DOUBLE)) / 2.0 AS tvd,
          |  (CAST(SUM(ABS(CAST(n_cs AS HUGEINT) * n_tot
          |      - CAST(n_s AS HUGEINT) * n_c)) AS DOUBLE)
          |    / CAST(MAX(CAST(n_c AS HUGEINT) * n_tot) AS DOUBLE)) / 2.0 > 0.4
          |    AS t_violation
          |FROM grid GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      // per-n top-gram via a (c DESC, g DESC) window ≡ Spark's
      // max(struct(c, g)); chars of a space-joined n-gram = length − (n−1)
      "q316_top_ngram_repetition" ->
        """WITH t AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |b AS (SELECT doc_id, length(array_to_string(t, '')) AS tc, t FROM t),
          |g2 AS (SELECT doc_id, tc, unnest(list_transform(range(1, len(t)),
          |    i -> array_to_string(t[CAST(i AS INT):CAST(i + 1 AS INT)], ' '))) AS g
          |  FROM b WHERE len(t) >= 2),
          |c2 AS (SELECT doc_id, tc, g, CAST(count(*) AS BIGINT) AS c
          |  FROM g2 GROUP BY 1, 2, 3),
          |s2 AS (SELECT doc_id, CAST(c * (length(g) - 1) AS DOUBLE) / tc AS f
          |  FROM c2 QUALIFY row_number() OVER (PARTITION BY doc_id
          |    ORDER BY c DESC, g DESC) = 1),
          |g3 AS (SELECT doc_id, tc, unnest(list_transform(range(1, len(t) - 1),
          |    i -> array_to_string(t[CAST(i AS INT):CAST(i + 2 AS INT)], ' '))) AS g
          |  FROM b WHERE len(t) >= 3),
          |c3 AS (SELECT doc_id, tc, g, CAST(count(*) AS BIGINT) AS c
          |  FROM g3 GROUP BY 1, 2, 3),
          |s3 AS (SELECT doc_id, CAST(c * (length(g) - 2) AS DOUBLE) / tc AS f
          |  FROM c3 QUALIFY row_number() OVER (PARTITION BY doc_id
          |    ORDER BY c DESC, g DESC) = 1),
          |g4 AS (SELECT doc_id, tc, unnest(list_transform(range(1, len(t) - 2),
          |    i -> array_to_string(t[CAST(i AS INT):CAST(i + 3 AS INT)], ' '))) AS g
          |  FROM b WHERE len(t) >= 4),
          |c4 AS (SELECT doc_id, tc, g, CAST(count(*) AS BIGINT) AS c
          |  FROM g4 GROUP BY 1, 2, 3),
          |s4 AS (SELECT doc_id, CAST(c * (length(g) - 3) AS DOUBLE) / tc AS f
          |  FROM c4 QUALIFY row_number() OVER (PARTITION BY doc_id
          |    ORDER BY c DESC, g DESC) = 1)
          |SELECT d.doc_id,
          |  COALESCE(s2.f, 0.0) AS top2_frac,
          |  COALESCE(s3.f, 0.0) AS top3_frac,
          |  COALESCE(s4.f, 0.0) AS top4_frac,
          |  COALESCE(s2.f, 0.0) <= 0.20 AND COALESCE(s3.f, 0.0) <= 0.18
          |    AND COALESCE(s4.f, 0.0) <= 0.16 AS rep_pass
          |FROM documents d
          |LEFT JOIN s2 ON d.doc_id = s2.doc_id
          |LEFT JOIN s3 ON d.doc_id = s3.doc_id
          |LEFT JOIN s4 ON d.doc_id = s4.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // duplicated-6-gram interval union: running-max-of-end window, per
      // -span new coverage = e − max(prev_max, pos−1) clamped at 0
      "q317_dup_ngram_coverage" ->
        """WITH t0 AS (SELECT doc_id, text,
          |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |c AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 AND len(t) >= 8
          |    THEN text || ' ' || array_to_string(t[1:8], ' ')
          |    ELSE text END AS text FROM t0),
          |t AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
          |  FROM c),
          |b AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, t FROM t),
          |o AS (SELECT doc_id, i AS pos,
          |    array_to_string(t[CAST(i AS INT):CAST(i + 5 AS INT)], ' ') AS g
          |  FROM b, unnest(range(1, len(t) - 4)) AS u(i)
          |  WHERE len(t) >= 6),
          |d AS (SELECT doc_id, pos, pos + 5 AS e FROM o
          |  QUALIFY count(*) OVER (PARTITION BY doc_id, g) > 1),
          |cov AS (SELECT doc_id, greatest(0, e - greatest(
          |    COALESCE(max(e) OVER (PARTITION BY doc_id ORDER BY pos
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
          |    pos - 1)) AS cv
          |  FROM d),
          |s AS (SELECT doc_id, CAST(SUM(cv) AS BIGINT) AS covered_tokens
          |  FROM cov GROUP BY 1)
          |SELECT b.doc_id, b.n_tokens,
          |  COALESCE(s.covered_tokens, 0) AS covered_tokens,
          |  CASE WHEN b.n_tokens = 0 THEN 0.0
          |    ELSE CAST(COALESCE(s.covered_tokens, 0) AS DOUBLE) / b.n_tokens
          |  END AS dup6_frac
          |FROM b LEFT JOIN s ON b.doc_id = s.doc_id
          |ORDER BY b.doc_id""".stripMargin,

      // q187's transition CTEs, then 4 unrolled value-iteration rounds:
      // per-edge p·v in double (identical trees), per-state decimal sum
      "q318_absorbing_conversion" ->
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |    event_type FROM events),
          |l AS (SELECT event_type,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS from_type,
          |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) AS gap_us
          |  FROM e),
          |p AS (SELECT from_type, event_type AS to_type,
          |    CAST(count(*) AS BIGINT) AS n FROM l
          |  WHERE from_type IS NOT NULL AND gap_us <= 1800000000 GROUP BY 1, 2),
          |m AS (SELECT from_type AS s, to_type AS t, n,
          |    SUM(n) OVER (PARTITION BY from_type) AS tot FROM p),
          |st AS (SELECT DISTINCT s FROM
          |  (SELECT s FROM m UNION ALL SELECT t FROM m)),
          |r0 AS (SELECT s, CASE WHEN s = 'purchase' THEN 1.0 ELSE 0.0 END
          |  AS v FROM st),
          |r1 AS (SELECT st.s, CASE WHEN st.s = 'purchase' THEN 1.0
          |    ELSE COALESCE(f.vn, 0.0) END AS v
          |  FROM st LEFT JOIN (SELECT m.s, CAST(SUM(CAST(
          |      (CAST(m.n AS DOUBLE) / m.tot) * v.v AS DECIMAL(27,15)))
          |      AS DOUBLE) AS vn
          |    FROM m JOIN r0 v ON m.t = v.s GROUP BY m.s) f ON st.s = f.s),
          |r2 AS (SELECT st.s, CASE WHEN st.s = 'purchase' THEN 1.0
          |    ELSE COALESCE(f.vn, 0.0) END AS v
          |  FROM st LEFT JOIN (SELECT m.s, CAST(SUM(CAST(
          |      (CAST(m.n AS DOUBLE) / m.tot) * v.v AS DECIMAL(27,15)))
          |      AS DOUBLE) AS vn
          |    FROM m JOIN r1 v ON m.t = v.s GROUP BY m.s) f ON st.s = f.s),
          |r3 AS (SELECT st.s, CASE WHEN st.s = 'purchase' THEN 1.0
          |    ELSE COALESCE(f.vn, 0.0) END AS v
          |  FROM st LEFT JOIN (SELECT m.s, CAST(SUM(CAST(
          |      (CAST(m.n AS DOUBLE) / m.tot) * v.v AS DECIMAL(27,15)))
          |      AS DOUBLE) AS vn
          |    FROM m JOIN r2 v ON m.t = v.s GROUP BY m.s) f ON st.s = f.s),
          |r4 AS (SELECT st.s, CASE WHEN st.s = 'purchase' THEN 1.0
          |    ELSE COALESCE(f.vn, 0.0) END AS v
          |  FROM st LEFT JOIN (SELECT m.s, CAST(SUM(CAST(
          |      (CAST(m.n AS DOUBLE) / m.tot) * v.v AS DECIMAL(27,15)))
          |      AS DOUBLE) AS vn
          |    FROM m JOIN r3 v ON m.t = v.s GROUP BY m.s) f ON st.s = f.s)
          |SELECT s AS state, round(v, 6) AS p_reach FROM r4
          |ORDER BY state""".stripMargin,

      // q256's feature CTEs → fixed linear weights → both rank windows;
      // ranks cast to INT for schema parity
      "q319_linear_rerank" ->
        s"""WITH cand AS ($bm25OracleSql),
           |qvx AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
           |  FROM embeddings WHERE vec_id = 0),
           |dense AS (SELECT vec_id AS id,
           |    round(1.0 - list_cosine_similarity(
           |      CAST(embedding AS DOUBLE[]), qv), 6) AS cos_dist
           |  FROM embeddings, qvx),
           |pri AS (SELECT doc_id AS id, $qualitySql AS quality,
           |    CAST(length(text) AS INT) AS text_len FROM documents),
           |f AS (SELECT c.id AS doc_id, c.score AS bm25, p.quality,
           |    p.text_len, COALESCE(d.cos_dist, 1.0) AS cd
           |  FROM cand c JOIN pri p USING (id) LEFT JOIN dense d USING (id)),
           |sc AS (SELECT doc_id, bm25, round(2.0 * bm25 - 3.0 * cd
           |    + 5.0 * quality - 0.001 * text_len, 6) AS score2 FROM f),
           |r AS (SELECT doc_id, score2, bm25,
           |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
           |      AS rank_before,
           |    CAST(row_number() OVER (ORDER BY score2 DESC, doc_id) AS INT)
           |      AS rank_after FROM sc)
           |SELECT doc_id, score2, rank_after, rank_before, bm25 FROM r
           |WHERE rank_after <= 10 ORDER BY rank_after""".stripMargin,

      // q226's hash-chain arm split read weekly: decimal cumulants
      // through an ordered window, Welch z vs the OBF boundary
      "q320_obf_monitor" ->
        """WITH pe AS (SELECT
          |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
          |      - DATE '1970-01-01') // 7 AS INT) AS wk,
          |    user_id, CAST(round(value * 100) AS BIGINT) AS v100
          |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
          |h0 AS (SELECT wk, v100, (user_id * 1000003) % 2147483647 AS h FROM pe),
          |h1 AS (SELECT wk, v100, (xor(h, h >> 16) * 73244475) % 2147483647 AS h
          |  FROM h0),
          |h2 AS (SELECT wk, v100, (xor(h, h >> 13) * 73244475) % 2147483647 AS h
          |  FROM h1),
          |a AS (SELECT wk, v100, h % 2 = 0 AS arm FROM h2),
          |wkl AS (SELECT wk,
          |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS wn_a,
          |    SUM(CASE WHEN arm THEN CAST(v100 AS DECIMAL(38,0))
          |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS wsv_a,
          |    SUM(CASE WHEN arm THEN CAST(v100 * v100 AS DECIMAL(38,0))
          |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS wsvv_a,
          |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS wn_b,
          |    SUM(CASE WHEN NOT arm THEN CAST(v100 AS DECIMAL(38,0))
          |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS wsv_b,
          |    SUM(CASE WHEN NOT arm THEN CAST(v100 * v100 AS DECIMAL(38,0))
          |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS wsvv_b
          |  FROM a GROUP BY wk),
          |c AS (SELECT wk,
          |    CAST(row_number() OVER (ORDER BY wk) AS INT) AS look,
          |    CAST(count(*) OVER () AS BIGINT) AS n_looks,
          |    CAST(SUM(wn_a) OVER w AS BIGINT) AS n_a,
          |    CAST(SUM(wn_b) OVER w AS BIGINT) AS n_b,
          |    CAST(SUM(wsv_a) OVER w AS DOUBLE) AS sv_a,
          |    CAST(SUM(wsvv_a) OVER w AS DOUBLE) AS svv_a,
          |    CAST(SUM(wsv_b) OVER w AS DOUBLE) AS sv_b,
          |    CAST(SUM(wsvv_b) OVER w AS DOUBLE) AS svv_b
          |  FROM wkl WINDOW w AS (ORDER BY wk
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          |zc AS (SELECT wk, look, n_looks, n_a, n_b,
          |    sv_a / n_a - sv_b / n_b AS diff,
          |    CASE WHEN n_a >= 2 AND n_b >= 2 THEN
          |      (sv_a / n_a - sv_b / n_b)
          |      / sqrt(((svv_a - sv_a * sv_a / n_a) / (n_a - 1)) / n_a
          |        + ((svv_b - sv_b * sv_b / n_b) / (n_b - 1)) / n_b)
          |    END AS z,
          |    2.04 * sqrt(CAST(n_looks AS DOUBLE) / look) AS bound
          |  FROM c)
          |SELECT wk, look, n_looks, n_a, n_b, diff, z, bound,
          |  CASE WHEN z IS NOT NULL THEN abs(z) > bound END AS crossed
          |FROM zc ORDER BY wk""".stripMargin,

      // q101's kNN graph replayed, then per-node neighbor label votes:
      // disagreement share + majority label, ties toward smaller label
      "q321_label_noise" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |p AS (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
          |    AND l.vec_id <> r.vec_id),
          |g AS (SELECT id, nbr_id FROM (SELECT id, nbr_id,
          |    row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rank
          |  FROM p) WHERE rank <= 3),
          |v AS (SELECT g.id, o.label, n.label AS nbr_label,
          |    CAST(count(*) AS BIGINT) AS n_votes
          |  FROM g JOIN embeddings o ON g.id = o.vec_id
          |    JOIN embeddings n ON g.nbr_id = n.vec_id
          |  GROUP BY 1, 2, 3),
          |rk AS (SELECT *, row_number() OVER (PARTITION BY id
          |    ORDER BY n_votes DESC, nbr_label) AS rk FROM v),
          |f AS (SELECT id, label,
          |    CAST(SUM(n_votes) AS BIGINT) AS n_nbrs,
          |    CAST(SUM(CASE WHEN nbr_label <> label THEN n_votes ELSE 0 END)
          |      AS BIGINT) AS n_disagree,
          |    max(CASE WHEN rk = 1 THEN nbr_label END) AS nbr_majority
          |  FROM rk GROUP BY id, label)
          |SELECT id, label, n_nbrs, n_disagree,
          |  CAST(n_disagree AS DOUBLE) / n_nbrs AS disagree_frac,
          |  nbr_majority,
          |  (CAST(n_disagree AS DOUBLE) / n_nbrs) > 0.5
          |    AND nbr_majority <> label AS flagged
          |FROM f ORDER BY id""".stripMargin,

      // per-arm exact lower-rank percentiles (the q261 estimator), the
      // q320 keyHash chain splitting arms; one row per percentile
      "q322_qte" ->
        """WITH pe AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
          |h0 AS (SELECT v, (user_id * 1000003) % 2147483647 AS h FROM pe),
          |h1 AS (SELECT v, (xor(h, h >> 16) * 73244475) % 2147483647 AS h
          |  FROM h0),
          |h2 AS (SELECT v, (xor(h, h >> 13) * 73244475) % 2147483647 AS h
          |  FROM h1),
          |a AS (SELECT v, h % 2 = 0 AS arm FROM h2),
          |rk AS (SELECT arm, v,
          |    row_number() OVER (PARTITION BY arm ORDER BY v) AS r,
          |    count(*) OVER (PARTITION BY arm) AS n FROM a),
          |pp AS (SELECT CAST(unnest([25, 50, 75, 90]) AS INT) AS pct)
          |SELECT pct,
          |  CAST(max(CASE WHEN arm THEN n END) AS BIGINT) AS n_a,
          |  CAST(max(CASE WHEN NOT arm THEN n END) AS BIGINT) AS n_b,
          |  max(CASE WHEN arm THEN v END) AS v_a,
          |  max(CASE WHEN NOT arm THEN v END) AS v_b,
          |  max(CASE WHEN arm THEN v END)
          |    - max(CASE WHEN NOT arm THEN v END) AS qte
          |FROM pp JOIN rk ON rk.r = greatest(1, (pct * n) // 100)
          |GROUP BY pct ORDER BY pct""".stripMargin,

      // midpoint-week pre/post split, per-cell decimal-exact means,
      // identical DiD expression tree
      "q323_did" ->
        """WITH pe AS (SELECT
          |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE)
          |      - DATE '1970-01-01') // 7 AS INT) AS wk,
          |    user_id, CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
          |h0 AS (SELECT wk, v, (user_id * 1000003) % 2147483647 AS h FROM pe),
          |h1 AS (SELECT wk, v, (xor(h, h >> 16) * 73244475) % 2147483647 AS h
          |  FROM h0),
          |h2 AS (SELECT wk, v, (xor(h, h >> 13) * 73244475) % 2147483647 AS h
          |  FROM h1),
          |a AS (SELECT wk, v, h % 2 = 0 AS arm FROM h2),
          |b AS (SELECT min(wk) AS w0, max(wk) AS w1 FROM a),
          |f AS (SELECT v, arm, wk >= (w0 + w1 + 1) // 2 AS post
          |  FROM a CROSS JOIN b),
          |sums AS (SELECT
          |    CAST(SUM(CASE WHEN arm AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
          |    CAST(SUM(CASE WHEN arm AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
          |    CAST(SUM(CASE WHEN NOT arm AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
          |    CAST(SUM(CASE WHEN NOT arm AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
          |    SUM(CASE WHEN arm AND NOT post THEN CAST(v AS DECIMAL(38,0))
          |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS sv_t_pre,
          |    SUM(CASE WHEN arm AND post THEN CAST(v AS DECIMAL(38,0))
          |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS sv_t_post,
          |    SUM(CASE WHEN NOT arm AND NOT post THEN CAST(v AS DECIMAL(38,0))
          |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS sv_c_pre,
          |    SUM(CASE WHEN NOT arm AND post THEN CAST(v AS DECIMAL(38,0))
          |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS sv_c_post
          |  FROM f),
          |m AS (SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
          |    CASE WHEN n_t_pre > 0 THEN CAST(sv_t_pre AS DOUBLE) / n_t_pre END AS mean_t_pre,
          |    CASE WHEN n_t_post > 0 THEN CAST(sv_t_post AS DOUBLE) / n_t_post END AS mean_t_post,
          |    CASE WHEN n_c_pre > 0 THEN CAST(sv_c_pre AS DOUBLE) / n_c_pre END AS mean_c_pre,
          |    CASE WHEN n_c_post > 0 THEN CAST(sv_c_post AS DOUBLE) / n_c_post END AS mean_c_post
          |  FROM sums)
          |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
          |  mean_t_pre, mean_t_post, mean_c_pre, mean_c_post,
          |  (mean_t_post - mean_t_pre) - (mean_c_post - mean_c_pre) AS did
          |FROM m""".stripMargin,

      // q98's BM25 CTEs with a per-term top-32-tf cut before scoring;
      // membership flag against the exact top-20 replayed inline
      "q324_impact_pruned" ->
        s"""WITH docs AS (SELECT doc_id AS id,
          |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS t
          |  FROM documents),
          |dl AS (SELECT id, len(t) AS dl, t FROM docs),
          |stats AS (SELECT COUNT(*) AS n_docs,
          |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
          |tf AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
          |    SELECT id, dl, unnest(t) AS term FROM dl)
          |  WHERE term IN ('spark', 'join', 'vector', 'window')
          |  GROUP BY id, dl, term),
          |dfq AS (SELECT term, COUNT(*) AS term_df FROM tf GROUP BY term),
          |kept AS (SELECT id, dl, term, tf FROM (
          |    SELECT *, row_number() OVER (PARTITION BY term
          |      ORDER BY tf DESC, id) AS ir FROM tf) WHERE ir <= 32),
          |scored AS (SELECT id,
          |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
          |      ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
          |      AS contrib
          |  FROM kept JOIN dfq USING (term), stats),
          |pr AS (SELECT id,
          |    round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6) AS score,
          |    COUNT(*) AS n_matched
          |  FROM scored GROUP BY id
          |  ORDER BY score DESC, id LIMIT 20),
          |fullk AS ($bm25OracleSql)
          |SELECT CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank,
          |  id, score, n_matched,
          |  id IN (SELECT id FROM fullk) AS in_full
          |FROM pr ORDER BY rank""".stripMargin,

      // full recompute from raw events — hash equality against the
      // Spark side's two-batch state merge proves merge ≡ recompute
      "q325_agg_state_merge" ->
        """WITH pe AS (SELECT event_type,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |    SUM(CAST(v AS DECIMAL(38,0))) AS sv,
          |    min(v) AS mn, max(v) AS mx
          |  FROM pe GROUP BY event_type)
          |SELECT event_type, n, CAST(sv AS VARCHAR) AS sv, mn, mx,
          |  CAST(sv AS DOUBLE) / n AS mean
          |FROM st ORDER BY event_type""".stripMargin,

      // exact word/sentence/vowel-group counts, literal-coefficient
      // Flesch expressions with identical association both engines
      "q326_flesch" ->
        """WITH m AS (SELECT doc_id,
          |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_words,
          |    greatest(CAST(1 AS BIGINT), CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
          |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
          |  FROM documents),
          |sc AS (SELECT doc_id, n_words, n_sentences, n_syllables,
          |    CASE WHEN n_words > 0 THEN round(206.835
          |      - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
          |      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) END AS ease,
          |    CASE WHEN n_words > 0 THEN round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
          |      + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59, 6) END AS grade
          |  FROM m)
          |SELECT doc_id, n_words, n_sentences, n_syllables, ease, grade,
          |  CASE WHEN ease IS NOT NULL THEN ease < 30.0 END AS hard
          |FROM sc ORDER BY doc_id""".stripMargin,

      // brute-force all-pairs word-set Jaccard — no prefix filter: hash
      // equality against the Spark side proves AllPairs candidate
      // generation lossless at threshold 0.7
      "q327_jaccard_prefix_join" ->
        """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 60
          |  UNION ALL
          |  SELECT doc_id + 2000, substring(text, 1, greatest(length(text) - 12, 1))
          |  FROM documents WHERE doc_id < 60),
          |toks AS (SELECT DISTINCT doc_id,
          |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '')) AS tok
          |  FROM corpus),
          |sizes AS (SELECT doc_id, COUNT(*) AS m FROM toks GROUP BY doc_id),
          |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          |  FROM toks a JOIN toks b USING (tok)
          |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
          |SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.m + sb.m - i) AS jaccard
          |FROM inter
          |JOIN sizes sa ON sa.doc_id = doc_a
          |JOIN sizes sb ON sb.doc_id = doc_b
          |WHERE CAST(i AS DOUBLE) / (sa.m + sb.m - i) >= 0.7
          |ORDER BY doc_a, doc_b""".stripMargin,

      "q328_jl_distortion" -> jlDistortionOracleSql,

      // the q305 hash chain on event_id splits 10 folds: <4 train mean,
      // 4-6 calibration order statistic, >=7 test coverage — identical
      // integer rank arithmetic and double residuals in both engines
      "q329_conformal" ->
        """WITH pe AS (SELECT event_type AS g, event_id AS id,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |h0 AS (SELECT g, id, v, (id * 1000003) % 2147483647 AS h FROM pe),
          |h1 AS (SELECT g, id, v,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT g, id, v,
          |    ((xor(h, h >> 13) * 73244475) % 2147483647) % 10 AS fold FROM h1),
          |tr AS (SELECT g,
          |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS yhat,
          |    count(*) AS n_train
          |  FROM h2 WHERE fold < 4 GROUP BY g),
          |ca AS (SELECT g, id, abs(CAST(v AS DOUBLE) - yhat) AS r
          |  FROM h2 JOIN tr USING (g) WHERE fold >= 4 AND fold < 7),
          |rk AS (SELECT g, r,
          |    row_number() OVER (PARTITION BY g ORDER BY r, id) AS rn,
          |    count(*) OVER (PARTITION BY g) AS n_calib FROM ca),
          |q AS (SELECT g, max(n_calib) AS n_calib,
          |    min(CASE WHEN rn = ((n_calib + 1) * 9 + 9) // 10 THEN r END)
          |      AS qhat
          |  FROM rk GROUP BY g),
          |te AS (SELECT g, yhat, n_train, abs(CAST(v AS DOUBLE) - yhat) AS r
          |  FROM h2 JOIN tr USING (g) WHERE fold >= 7)
          |SELECT g AS event_type, round(max(yhat), 6) AS yhat,
          |  max(n_train) AS n_train, max(n_calib) AS n_calib,
          |  round(max(qhat), 6) AS qhat, count(*) AS n_test,
          |  CASE WHEN max(qhat) IS NULL THEN NULL
          |    ELSE CAST(SUM(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
          |      / count(*) END AS coverage
          |FROM te JOIN q USING (g)
          |GROUP BY g ORDER BY event_type""".stripMargin,

      // unfiltered brute-force levenshtein all-pairs — hash equality
      // against the Spark side proves the q-gram count filter lossless
      "q330_edit_distance_join" ->
        """WITH p AS (SELECT p_partkey AS id, p_name AS name FROM part
          |  WHERE p_partkey < 300),
          |c0 AS (SELECT id, name FROM p
          |  UNION ALL SELECT id + 10000,
          |    concat(substring(name, 1, 4), 'z', substring(name, 6)) FROM p),
          |c AS (SELECT id, name FROM c0 WHERE length(name) >= 6)
          |SELECT a.id AS id_a, b.id AS id_b,
          |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
          |FROM c a JOIN c b ON a.id < b.id
          |WHERE levenshtein(a.name, b.name) <= 2
          |ORDER BY id_a, id_b""".stripMargin,

      // the same phrase segmentation / deg-over-freq chain; DuckDB's
      // 1-based positions shift grp by a constant, preserving islands
      "q331_rake_keywords" ->
        """WITH tk AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(
          |      regexp_replace(lower(text), '[^a-z0-9 ]+', ' # ', 'g'),
          |      '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |w0 AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
          |    t[CAST(i AS INT)] AS w
          |  FROM tk, unnest(range(1, len(t) + 1)) AS u(i)),
          |wv AS (SELECT doc_id, pos, w FROM w0 WHERE w <> '#'
          |  AND w NOT IN ('a','the','of','to','and','in','is','on','for','it')),
          |g AS (SELECT doc_id, pos, w,
          |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
          |      AS grp FROM wv),
          |pl AS (SELECT doc_id, grp, pos, w,
          |    count(*) OVER (PARTITION BY doc_id, grp) AS plen FROM g),
          |ws AS (SELECT w, count(*) AS freq, SUM(plen) AS deg
          |  FROM pl GROUP BY w),
          |sc AS (SELECT doc_id, grp,
          |    string_agg(w, ' ' ORDER BY pos) AS phrase,
          |    count(*) AS n_words,
          |    CAST(SUM(CAST(CAST(deg AS DOUBLE) / freq AS DECIMAL(38,18)))
          |      AS DOUBLE) AS score
          |  FROM pl JOIN ws USING (w) GROUP BY doc_id, grp),
          |ph AS (SELECT phrase, max(n_words) AS n_words,
          |    count(*) AS n_occurrences, max(score) AS score
          |  FROM sc GROUP BY phrase)
          |SELECT CAST(row_number() OVER (ORDER BY score DESC, phrase)
          |    AS INT) AS rank,
          |  phrase, n_words, n_occurrences, round(score, 6) AS score
          |FROM ph
          |QUALIFY rank <= 25
          |ORDER BY rank""".stripMargin,

      // the q101 cell-local graph CTEs; reciprocated edges via the
      // reversed self-join, distance from the candidate-pair frame
      "q332_mutual_knn" ->
        s"""$knnEdgesPrefixSql,
           |mu AS (SELECT x.id AS a, x.nbr_id AS b FROM g0 x JOIN g0 y
           |  ON x.id = y.nbr_id AND x.nbr_id = y.id WHERE x.id < x.nbr_id)
           |SELECT a, b, round(p.distance, 6) AS distance
           |FROM mu JOIN p ON p.id = a AND p.nbr_id = b
           |ORDER BY a, b""".stripMargin,

      "q333_cdc_chunks" -> cdcChunksOracleSql,

      // the q75 register chain computed DIRECTLY at each rollup level —
      // equality with the Spark shard-merge proves max-merge losslessness
      "q334_hll_rollup" ->
        s"""WITH ev AS (SELECT event_type, user_id AS key FROM events),
          |kh0 AS (SELECT event_type, key, (key * 1000003) % 2147483647 AS a0 FROM ev),
          |kh1 AS (SELECT event_type, key, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1 FROM kh0),
          |kh2 AS (SELECT event_type, key, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h FROM kh1),
          |br AS (SELECT event_type, key, h >> 26 AS b,
          |    CASE WHEN (h & 67108863) = 0 THEN 27
          |         ELSE 27 - length(bin(h & 67108863)) END AS rho FROM kh2),
          |mbt AS (SELECT event_type, b, MAX(rho) AS mx FROM br GROUP BY event_type, b),
          |hst AS (SELECT event_type,
          |    SUM(CAST(1 AS BIGINT) << CAST(27 - mx AS INT)) AS present,
          |    COUNT(*) AS nb FROM mbt GROUP BY event_type),
          |ext AS (SELECT event_type, COUNT(DISTINCT key) AS n_exact FROM ev GROUP BY event_type),
          |mbg AS (SELECT b, MAX(rho) AS mx FROM br GROUP BY b),
          |hsg AS (SELECT SUM(CAST(1 AS BIGINT) << CAST(27 - mx AS INT)) AS present,
          |    COUNT(*) AS nb FROM mbg),
          |exg AS (SELECT COUNT(DISTINCT key) AS n_exact FROM ev)
          |SELECT * FROM (
          |  SELECT 'event_type' AS level, ext.event_type AS key, n_exact,
          |    ${Sketches.hllFactor(5)} / CAST(present + (32 - nb) * 134217728 AS DOUBLE) AS hll_est
          |  FROM ext JOIN hst USING (event_type)
          |  UNION ALL
          |  SELECT 'global', 'ALL', exg.n_exact,
          |    ${Sketches.hllFactor(5)} / CAST(present + (32 - nb) * 134217728 AS DOUBLE)
          |  FROM exg, hsg)
          |ORDER BY level, key""".stripMargin,

      // identical two-aggregate encoding tree; LOO guarded null-safe in
      // both engines for singleton groups
      "q335_target_encoding" ->
        """WITH o AS (SELECT o_orderkey, o_orderpriority AS prio,
          |    CAST(round(o_totalprice * 100) AS BIGINT) AS v100 FROM orders),
          |g AS (SELECT prio, count(*) AS n,
          |    SUM(CAST(v100 AS DECIMAL(38,0))) AS sv FROM o GROUP BY prio),
          |gl AS (SELECT count(*) AS ng,
          |    SUM(CAST(v100 AS DECIMAL(38,0))) AS svg FROM o)
          |SELECT o_orderkey, prio, v100,
          |  round(CAST(sv AS DOUBLE) / n, 6) AS enc_naive,
          |  CASE WHEN n > 1
          |    THEN round(CAST(sv - v100 AS DOUBLE) / (n - 1), 6) END AS enc_loo,
          |  round((CAST(sv - v100 AS DOUBLE) + 20.0 * (CAST(svg AS DOUBLE) / ng))
          |    / (n - 1 + 20), 6) AS enc_smooth
          |FROM o JOIN g USING (prio), gl
          |WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin,

      // brute BETWEEN join — the banded equi-join must find exactly the
      // same (point, interval) matches
      "q336_range_join" ->
        """WITH iv AS (SELECT o_orderkey,
          |    CAST(date_diff('day', DATE '1992-01-01',
          |      CAST(o_orderdate AS DATE)) AS BIGINT) AS lo
          |  FROM orders WHERE o_orderkey < 500),
          |iv2 AS (SELECT o_orderkey, lo, lo + o_orderkey % 30 AS hi FROM iv),
          |pts AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
          |      CAST(l_shipdate AS DATE)) AS BIGINT) AS p
          |  FROM lineitem WHERE l_orderkey < 6000)
          |SELECT o_orderkey, count(*) AS n_points, min(p) AS first_day,
          |  max(p) AS last_day
          |FROM pts JOIN iv2 ON p >= lo AND p <= hi
          |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

      // u per field from value counts; weights as ARITHMETIC expressions
      // (1.0 - 0.95, not 0.05) so both engines compute identical doubles
      "q337_fellegi_sunter" ->
        """WITH c0 AS (SELECT c_custkey, c_nationkey, c_mktsegment,
          |    (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 100000
          |      AS bal_bucket,
          |    substring(c_name, 1, 12) AS name_pfx
          |  FROM customer WHERE c_custkey < 400),
          |corpus AS (SELECT * FROM c0
          |  UNION ALL SELECT c_custkey + 10000, c_nationkey, c_mktsegment,
          |    bal_bucket + c_custkey % 2, name_pfx FROM c0),
          |n AS (SELECT count(*) AS nn FROM corpus),
          |u1 AS (SELECT CAST(SUM(CAST(c*c AS DECIMAL(38,0))) AS DOUBLE)
          |    / (CAST(nn AS DOUBLE) * nn) AS u
          |  FROM (SELECT count(*) AS c FROM corpus GROUP BY c_mktsegment), n
          |  GROUP BY nn),
          |u2 AS (SELECT CAST(SUM(CAST(c*c AS DECIMAL(38,0))) AS DOUBLE)
          |    / (CAST(nn AS DOUBLE) * nn) AS u
          |  FROM (SELECT count(*) AS c FROM corpus GROUP BY bal_bucket), n
          |  GROUP BY nn),
          |u3 AS (SELECT CAST(SUM(CAST(c*c AS DECIMAL(38,0))) AS DOUBLE)
          |    / (CAST(nn AS DOUBLE) * nn) AS u
          |  FROM (SELECT count(*) AS c FROM corpus GROUP BY name_pfx), n
          |  GROUP BY nn),
          |pr AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
          |    (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END
          |     + CASE WHEN a.bal_bucket = b.bal_bucket THEN 1 ELSE 0 END
          |     + CASE WHEN a.name_pfx = b.name_pfx THEN 1 ELSE 0 END)
          |      AS n_agree,
          |    (CASE WHEN a.c_mktsegment = b.c_mktsegment
          |        THEN ln(0.95 / u1.u) ELSE ln((1.0 - 0.95) / (1.0 - u1.u)) END
          |     + CASE WHEN a.bal_bucket = b.bal_bucket
          |        THEN ln(0.95 / u2.u) ELSE ln((1.0 - 0.95) / (1.0 - u2.u)) END
          |     + CASE WHEN a.name_pfx = b.name_pfx
          |        THEN ln(0.95 / u3.u) ELSE ln((1.0 - 0.95) / (1.0 - u3.u)) END)
          |      AS score
          |  FROM corpus a JOIN corpus b ON a.c_nationkey = b.c_nationkey
          |    AND a.c_custkey < b.c_custkey, u1, u2, u3)
          |SELECT id_a, id_b, CAST(n_agree AS BIGINT) AS n_agree,
          |  round(score, 6) AS score
          |FROM pr WHERE score > 0 ORDER BY id_a, id_b""".stripMargin,

      // identical decimal variance tree, sqrt sigma, largest-remainder
      // integer split — allocations sum to exactly 1000
      "q338_neyman" ->
        """WITH pe AS (SELECT event_type AS stratum,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |per AS (SELECT stratum, count(*) AS n_h,
          |    SUM(CAST(v AS DECIMAL(38,0))) AS sv,
          |    SUM(CAST(v * v AS DECIMAL(38,0))) AS svv
          |  FROM pe GROUP BY stratum),
          |sg AS (SELECT stratum, n_h,
          |    sqrt((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)
          |      * CAST(sv AS DOUBLE) / n_h) / n_h) AS sigma
          |  FROM per),
          |w AS (SELECT stratum, n_h, sigma,
          |    CAST(n_h AS DOUBLE) * sigma AS w FROM sg),
          |tot AS (SELECT CAST(SUM(CAST(w AS DECIMAL(38,18))) AS DOUBLE)
          |    AS wt FROM w),
          |q AS (SELECT stratum, n_h, sigma,
          |    CASE WHEN wt > 0 THEN 1000.0 * w / wt ELSE 0.0 END AS quota
          |  FROM w, tot),
          |f AS (SELECT stratum, n_h, sigma, quota, floor(quota) AS base,
          |    quota - floor(quota) AS frac FROM q),
          |r AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS rem FROM f),
          |rk AS (SELECT f.*, row_number() OVER (ORDER BY frac DESC, stratum)
          |    AS rk FROM f)
          |SELECT stratum, n_h, round(sigma, 6) AS sigma,
          |  round(quota, 6) AS quota,
          |  CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
          |    AS n_alloc
          |FROM rk, r ORDER BY stratum""".stripMargin,

      "q339_split_leakage" -> splitLeakageOracleSql,

      // same midpoint week split as q325; Laplace-smoothed bin shares on
      // the full 20-bin grid of REF groups; decimal-accumulated term sum
      "q340_psi_drift" ->
        """WITH pe AS (SELECT event_type,
          |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
          |      AS wk,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |bnd AS (SELECT min(wk) AS w0, max(wk) AS w1 FROM pe),
          |t AS (SELECT event_type AS g, v,
          |    wk >= (w0 + w1 + 1) // 2 AS post FROM pe, bnd),
          |rb AS (SELECT g, least(greatest(v // 5000, 0), 19) AS bin,
          |    count(*) AS nr FROM t WHERE NOT post GROUP BY 1, 2),
          |cb AS (SELECT g, least(greatest(v // 5000, 0), 19) AS bin,
          |    count(*) AS nc FROM t WHERE post GROUP BY 1, 2),
          |grid AS (SELECT g, i AS bin
          |  FROM (SELECT DISTINCT g FROM t WHERE NOT post),
          |    unnest(range(0, 20)) AS u(i)),
          |nt AS (SELECT g, CAST(SUM(nr) AS BIGINT) AS n_ref FROM rb GROUP BY g),
          |nc2 AS (SELECT g, CAST(SUM(nc) AS BIGINT) AS n_cur FROM cb GROUP BY g),
          |fl AS (SELECT grid.g, grid.bin,
          |    CAST(COALESCE(nr, 0) + 1 AS DOUBLE) / (n_ref + 20) AS pr,
          |    CAST(COALESCE(nc, 0) + 1 AS DOUBLE) / (n_cur + 20) AS pc,
          |    n_ref, n_cur
          |  FROM grid
          |  LEFT JOIN rb USING (g, bin) LEFT JOIN cb USING (g, bin)
          |  JOIN nt USING (g) JOIN nc2 USING (g))
          |SELECT g AS event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
          |  round(CAST(SUM(CAST((pc - pr) * ln(pc / pr) AS DECIMAL(38,18)))
          |    AS DOUBLE), 6) AS psi,
          |  round(CAST(SUM(CAST((pc - pr) * ln(pc / pr) AS DECIMAL(38,18)))
          |    AS DOUBLE), 6) > 0.2 AS drifted
          |FROM fl GROUP BY g ORDER BY event_type""".stripMargin,

      // exact rank-⌈n/2⌉ medians for location and deviation; the outlier
      // threshold multiplies in the same (3.0·1.4826)·mad association
      "q341_mad_outliers" ->
        """WITH pe AS (SELECT event_type AS g,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |m AS (SELECT g, v AS med FROM (SELECT g, v,
          |      row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
          |      count(*) OVER (PARTITION BY g) AS n FROM pe)
          |  WHERE rn = (n + 1) // 2),
          |d AS (SELECT pe.g, v, med, abs(v - med) AS ad
          |  FROM pe JOIN m USING (g)),
          |md AS (SELECT g, ad AS mad FROM (SELECT g, ad,
          |      row_number() OVER (PARTITION BY g ORDER BY ad) AS rn,
          |      count(*) OVER (PARTITION BY g) AS n FROM d)
          |  WHERE rn = (n + 1) // 2)
          |SELECT d.g AS event_type, count(*) AS n, max(med) AS med,
          |  max(mad) AS mad,
          |  CAST(SUM(CASE WHEN CAST(ad AS DOUBLE) > (3.0 * 1.4826) * mad
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          |FROM d JOIN md USING (g) GROUP BY d.g ORDER BY event_type""".stripMargin,

      // brute overlap join — the banded max-lo-ownership join must find
      // each overlapping pair exactly once
      "q342_overlap_join" ->
        """WITH promo AS (SELECT o_orderkey,
          |    CAST(date_diff('day', DATE '1992-01-01',
          |      CAST(o_orderdate AS DATE)) AS BIGINT) AS p_lo
          |  FROM orders WHERE o_orderkey < 300),
          |p2 AS (SELECT o_orderkey, p_lo, p_lo + o_orderkey % 14 AS p_hi
          |  FROM promo),
          |s0 AS (SELECT CAST(date_diff('day', DATE '1992-01-01',
          |      CAST(l_shipdate AS DATE)) AS BIGINT) AS s_lo,
          |    (l_orderkey + l_linenumber) % 10 AS spn
          |  FROM lineitem WHERE l_orderkey < 3000),
          |ship AS (SELECT s_lo, s_lo + spn AS s_hi FROM s0)
          |SELECT o_orderkey, count(*) AS n_overlaps, min(s_lo) AS first_lo,
          |  max(s_hi) AS last_hi
          |FROM ship JOIN p2 ON s_lo <= p_hi AND p_lo <= s_hi
          |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

      // base top-10 → tf·idf expansion terms → expanded BM25, the whole
      // chain in SQL with the q98 scoring formula
      "q343_prf_expansion" ->
        """WITH docs AS (SELECT doc_id AS id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |dl AS (SELECT id, len(t) AS dl, t FROM docs),
          |stats AS (SELECT COUNT(*) AS n_docs,
          |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
          |alltf AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
          |    SELECT id, dl, unnest(t) AS term FROM dl)
          |  GROUP BY id, dl, term),
          |cdf AS (SELECT term, COUNT(*) AS term_df FROM alltf GROUP BY term),
          |btf AS (SELECT * FROM alltf WHERE term IN ('spark', 'join')),
          |bdf AS (SELECT term, COUNT(*) AS term_df FROM btf GROUP BY term),
          |bsc AS (SELECT id,
          |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
          |      ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
          |      AS contrib
          |  FROM btf JOIN bdf USING (term), stats),
          |base AS (SELECT id,
          |    round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6) AS score
          |  FROM bsc GROUP BY id ORDER BY score DESC, id LIMIT 10),
          |cand AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS tf_sum
          |  FROM alltf JOIN base USING (id)
          |  WHERE term NOT IN ('spark', 'join') GROUP BY term),
          |esc AS (SELECT term,
          |    CAST(tf_sum AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / term_df) AS s
          |  FROM cand JOIN cdf USING (term), stats),
          |expt AS (SELECT term FROM esc ORDER BY s DESC, term LIMIT 3),
          |etf AS (SELECT * FROM alltf WHERE term IN ('spark', 'join')
          |  OR term IN (SELECT term FROM expt)),
          |edf AS (SELECT term, COUNT(*) AS term_df FROM etf GROUP BY term),
          |esc2 AS (SELECT id,
          |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
          |      ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
          |      AS contrib
          |  FROM etf JOIN edf USING (term), stats),
          |res AS (SELECT id,
          |    round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6) AS score,
          |    COUNT(*) AS n_matched
          |  FROM esc2 GROUP BY id ORDER BY score DESC, id LIMIT 10)
          |SELECT CAST(row_number() OVER (ORDER BY score DESC, id) AS INT)
          |    AS rank,
          |  id, score, n_matched, id IN (SELECT id FROM base) AS in_base
          |FROM res ORDER BY rank""".stripMargin,

      // the Murphy decomposition tree with the shared quality replay;
      // base_rate squares UNROUNDED in resolution, as the Spark side does
      "q344_brier" ->
        s"""WITH d AS (SELECT $qualitySql AS p, n_chars >= 1000 AS o
          |  FROM documents),
          |r AS (SELECT p, CASE WHEN o THEN 1 ELSE 0 END AS o2,
          |    least(CAST(floor(p * 10) AS BIGINT), 9) AS bin FROM d),
          |b AS (SELECT bin, count(*) AS n_b,
          |    SUM(CAST(p AS DECIMAL(38,18))) AS sp,
          |    CAST(SUM(o2) AS BIGINT) AS so,
          |    SUM(CAST((p - o2) * (p - o2) AS DECIMAL(38,18))) AS sq
          |  FROM r GROUP BY bin),
          |bb AS (SELECT bin, n_b, so, sq,
          |    CAST(sp AS DOUBLE) / n_b AS pbar,
          |    CAST(so AS DOUBLE) / n_b AS obar FROM b),
          |f AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n,
          |    CAST(SUM(so) AS BIGINT) AS n_pos,
          |    CAST(SUM(sq) AS DOUBLE) AS sq2,
          |    CAST(SUM(CAST(n_b * (pbar - obar) * (pbar - obar)
          |      AS DECIMAL(38,18))) AS DOUBLE) AS rel,
          |    CAST(SUM(CAST(n_b * obar * obar AS DECIMAL(38,18)))
          |      AS DOUBLE) AS so2
          |  FROM bb)
          |SELECT n, n_pos,
          |  round(CAST(n_pos AS DOUBLE) / n, 6) AS base_rate,
          |  round(sq2 / n, 6) AS brier,
          |  round(rel / n, 6) AS reliability,
          |  round(so2 / n - (CAST(n_pos AS DOUBLE) / n)
          |    * (CAST(n_pos AS DOUBLE) / n), 6) AS resolution,
          |  round((CAST(n_pos AS DOUBLE) / n)
          |    * (1.0 - CAST(n_pos AS DOUBLE) / n), 6) AS uncertainty
          |FROM f""".stripMargin,

      // add-one-smoothed positive/negative shares per bin; the IV window
      // sum decimal-accumulates like the Spark side
      "q345_woe_iv" ->
        s"""WITH d AS (SELECT $qualitySql AS p, n_chars >= 1000 AS o
          |  FROM documents),
          |r AS (SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
          |    CASE WHEN o THEN 1 ELSE 0 END AS o2 FROM d),
          |b AS (SELECT bin, count(*) AS n_b, CAST(SUM(o2) AS BIGINT) AS n_pos
          |  FROM r GROUP BY bin),
          |b2 AS (SELECT bin, n_b, n_pos, n_b - n_pos AS n_neg FROM b),
          |t AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
          |    CAST(SUM(n_neg) AS BIGINT) AS tn, count(*) AS nb FROM b2),
          |w AS (SELECT bin, n_b, n_pos,
          |    CAST(n_pos + 1 AS DOUBLE) / (tp + nb) AS pp,
          |    CAST(n_neg + 1 AS DOUBLE) / (tn + nb) AS pn
          |  FROM b2, t),
          |w2 AS (SELECT bin, n_b, n_pos, pp, pn, ln(pp / pn) AS woe FROM w)
          |SELECT bin, n_b, n_pos, round(woe, 6) AS woe,
          |  round(CAST(SUM(CAST((pp - pn) * woe AS DECIMAL(38,18))) OVER ()
          |    AS DOUBLE), 6) AS iv
          |FROM w2 ORDER BY bin""".stripMargin,

      // cumulative tokens/vocab checkpoints from per-term first docs,
      // then the exact OLS slope on (ln n, ln V)
      "q346_heaps_law" ->
        """WITH toks AS (SELECT doc_id AS d,
          |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '')) AS term
          |  FROM documents),
          |pd AS (SELECT d, count(*) AS nt FROM toks GROUP BY d),
          |fd AS (SELECT d, count(*) AS nv FROM (
          |    SELECT term, min(d) AS d FROM toks GROUP BY term) GROUP BY d),
          |cp AS (SELECT pd.d,
          |    CAST(SUM(nt) OVER (ORDER BY pd.d) AS BIGINT) AS n,
          |    CAST(SUM(COALESCE(nv, 0)) OVER (ORDER BY pd.d) AS BIGINT) AS v
          |  FROM pd LEFT JOIN fd ON pd.d = fd.d),
          |xy AS (SELECT n, v, ln(CAST(n AS DOUBLE)) AS x,
          |    ln(CAST(v AS DOUBLE)) AS y FROM cp),
          |ag AS (SELECT count(*) AS n_points, max(n) AS n_total,
          |    max(v) AS v_total,
          |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx
          |  FROM xy),
          |bt AS (SELECT *, (sxy - sx * sy / n_points)
          |    / (sxx - sx * sx / n_points) AS beta FROM ag)
          |SELECT n_points, n_total, v_total, round(beta, 6) AS beta,
          |  round((sy - beta * sx) / n_points, 6) AS ln_k
          |FROM bt""".stripMargin,

      // the q332 mutual-edge CTEs; triangles in a<b<c orientation credit
      // all three corners
      "q347_clustering_coef" ->
        s"""$knnEdgesPrefixSql,
           |mu AS (SELECT x.id AS a, x.nbr_id AS b FROM g0 x JOIN g0 y
           |  ON x.id = y.nbr_id AND x.nbr_id = y.id WHERE x.id < x.nbr_id),
           |dg2 AS (SELECT u, count(*) AS degree FROM (
           |    SELECT a AS u FROM mu UNION ALL SELECT b FROM mu) GROUP BY u),
           |tr AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
           |  FROM mu e1 JOIN mu e2 ON e1.b = e2.a
           |  WHERE EXISTS (SELECT 1 FROM mu e3
           |    WHERE e3.a = e1.a AND e3.b = e2.b)),
           |tc AS (SELECT u, count(*) AS n_tri FROM (
           |    SELECT a AS u FROM tr UNION ALL SELECT b FROM tr
           |    UNION ALL SELECT c FROM tr) GROUP BY u)
           |SELECT dg2.u AS id, CAST(degree AS BIGINT) AS degree,
           |  CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_tri,
           |  CASE WHEN degree >= 2 THEN
           |    round(CAST(2 * COALESCE(n_tri, 0) AS DOUBLE)
           |      / (degree * (degree - 1)), 6) END AS coef
           |FROM dg2 LEFT JOIN tc ON dg2.u = tc.u
           |ORDER BY id""".stripMargin,

      // the q332 mutual edges labeled by the `a` assignment CTE; per-cell
      // modularity terms with the decimal-accumulated global Q
      "q348_modularity" ->
        s"""$knnEdgesPrefixSql,
           |mu AS (SELECT x.id AS a, x.nbr_id AS b FROM g0 x JOIN g0 y
           |  ON x.id = y.nbr_id AND x.nbr_id = y.id WHERE x.id < x.nbr_id),
           |cm AS (SELECT vec_id AS u, centroid_id AS c FROM a),
           |lab AS (SELECT e.a, e.b, x.c AS ca, y.c AS cb
           |  FROM mu e JOIN cm x ON e.a = x.u JOIN cm y ON e.b = y.u),
           |mt AS (SELECT count(*) AS m FROM lab),
           |wi AS (SELECT ca AS c, count(*) AS m_within FROM lab
           |  WHERE ca = cb GROUP BY ca),
           |ends AS (SELECT a AS u FROM mu UNION ALL SELECT b FROM mu),
           |dc AS (SELECT c, count(*) AS d_c FROM ends JOIN cm USING (u)
           |  GROUP BY c),
           |ncc AS (SELECT c, count(*) AS n_nodes FROM (
           |    SELECT DISTINCT u FROM ends) JOIN cm USING (u) GROUP BY c),
           |pc AS (SELECT ncc.c, n_nodes, COALESCE(m_within, 0) AS m_within,
           |    d_c,
           |    CAST(COALESCE(m_within, 0) AS DOUBLE) / m
           |      - (CAST(d_c AS DOUBLE) / (2 * m))
           |        * (CAST(d_c AS DOUBLE) / (2 * m)) AS term
           |  FROM ncc JOIN dc USING (c) LEFT JOIN wi ON wi.c = ncc.c, mt)
           |SELECT c, CAST(n_nodes AS BIGINT) AS n_nodes,
           |  CAST(m_within AS BIGINT) AS m_within, CAST(d_c AS BIGINT) AS d_c,
           |  round(term, 6) AS term,
           |  round(CAST(SUM(CAST(term AS DECIMAL(38,18))) OVER ()
           |    AS DOUBLE), 6) AS q
           |FROM pc ORDER BY c""".stripMargin,

      // q187's within-session pair CTE, then p·ln p per from-state and
      // the weighted global conditional entropy
      "q349_transition_entropy" ->
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |    event_type FROM events),
          |l AS (SELECT event_type,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS from_type,
          |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) AS gap_us
          |  FROM e),
          |p AS (SELECT from_type AS f, event_type AS t, count(*) AS n FROM l
          |  WHERE from_type IS NOT NULL AND gap_us <= 1800000000
          |  GROUP BY 1, 2),
          |pw AS (SELECT f, t, n, SUM(n) OVER (PARTITION BY f) AS nf FROM p),
          |tm AS (SELECT f, n, nf,
          |    (CAST(n AS DOUBLE) / nf) * ln(CAST(n AS DOUBLE) / nf) AS term
          |  FROM pw),
          |hp AS (SELECT f, CAST(max(nf) AS BIGINT) AS n_from,
          |    0.0 - CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE) AS h
          |  FROM tm GROUP BY f),
          |tt AS (SELECT CAST(SUM(n_from) AS BIGINT) AS nn FROM hp),
          |hw AS (SELECT f, n_from, h,
          |    (CAST(n_from AS DOUBLE) / nn) * h AS hw FROM hp, tt)
          |SELECT f AS from_type, n_from, round(h, 6) AS entropy,
          |  round(CAST(SUM(CAST(hw AS DECIMAL(38,18))) OVER ()
          |    AS DOUBLE), 6) AS h_cond
          |FROM hw ORDER BY from_type""".stripMargin,

      // the q305 hash chain, then 65 deterministic re-labelings:
      // arm_k = ((h0 + k·73244475) % p) % 2, k = 0 the production arms
      "q350_permutation_test" ->
        """WITH pe AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |h0 AS (SELECT v, (user_id * 1000003) % 2147483647 AS h FROM pe),
          |h1 AS (SELECT v, (xor(h, h >> 16) * 73244475) % 2147483647 AS h
          |  FROM h0),
          |h2 AS (SELECT v, (xor(h, h >> 13) * 73244475) % 2147483647 AS h
          |  FROM h1),
          |ex AS (SELECT v, i AS k,
          |    ((h + i * 73244475) % 2147483647) % 2 = 0 AS arm
          |  FROM h2, unnest(range(0, 65)) AS u(i)),
          |byk AS (SELECT k,
          |    SUM(CASE WHEN arm THEN CAST(v AS DECIMAL(38,0)) END) AS svt,
          |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS nt,
          |    SUM(CASE WHEN NOT arm THEN CAST(v AS DECIMAL(38,0)) END) AS svc,
          |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS nc
          |  FROM ex GROUP BY k),
          |d AS (SELECT k, CAST(svt AS DOUBLE) / nt - CAST(svc AS DOUBLE) / nc
          |    AS diff FROM byk),
          |o AS (SELECT diff AS d0 FROM d WHERE k = 0)
          |SELECT round(max(d0), 6) AS diff_obs,
          |  count(*) AS n_perms,
          |  CAST(SUM(CASE WHEN abs(diff) >= abs(d0) THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_extreme,
          |  round(CAST(SUM(CASE WHEN abs(diff) >= abs(d0) THEN 1 ELSE 0 END)
          |    + 1 AS DOUBLE) / (count(*) + 1), 6) AS p_value
          |FROM d, o WHERE k > 0""".stripMargin,

      // centered 7-day window trend (full windows only), DOW seasonal
      // means, residual sigma from decimal sums — the identical trees
      "q351_seasonal_residuals" ->
        """WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
          |      CAST(ts AS DATE)) AS BIGINT) AS day, count(*) AS n
          |  FROM events GROUP BY 1),
          |tr AS (SELECT day, CAST(n AS BIGINT) AS n,
          |    CASE WHEN count(*) OVER w = 7 THEN
          |      CAST(SUM(n) OVER w AS DOUBLE) / 7 END AS trend
          |  FROM daily
          |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
          |dt AS (SELECT day, n, trend, CAST(n AS DOUBLE) - trend AS detr,
          |    day % 7 AS dow FROM tr),
          |se AS (SELECT dow,
          |    CAST(SUM(CAST(detr AS DECIMAL(38,18))) AS DOUBLE) / count(*)
          |      AS seasonal
          |  FROM dt WHERE detr IS NOT NULL GROUP BY dow),
          |rs AS (SELECT day, n, trend, seasonal, detr - seasonal AS resid
          |  FROM dt LEFT JOIN se USING (dow)),
          |sg AS (SELECT sqrt((CAST(SUM(CAST(resid * resid AS DECIMAL(38,18)))
          |      AS DOUBLE)
          |    - CAST(SUM(CAST(resid AS DECIMAL(38,18))) AS DOUBLE)
          |      * CAST(SUM(CAST(resid AS DECIMAL(38,18))) AS DOUBLE)
          |      / count(*)) / count(*)) AS sigma
          |  FROM rs WHERE resid IS NOT NULL)
          |SELECT day, n, round(trend, 6) AS trend,
          |  round(seasonal, 6) AS seasonal, round(resid, 6) AS resid,
          |  CASE WHEN resid IS NOT NULL THEN abs(resid) > 2.0 * sigma END
          |    AS flag
          |FROM rs, sg ORDER BY day""".stripMargin,

      // four generalization levels over the same scan; the release rule
      // is the first level with min class size >= 5
      "q352_k_anonymity" ->
        """WITH c AS (SELECT c_nationkey, c_mktsegment,
          |    (CAST(round(c_acctbal * 100) AS BIGINT) + 1000000) // 100000
          |      AS bal_bucket
          |  FROM customer),
          |l0 AS (SELECT count(*) AS sz FROM c
          |  GROUP BY c_nationkey, c_mktsegment, bal_bucket),
          |l1 AS (SELECT count(*) AS sz FROM c
          |  GROUP BY c_nationkey, c_mktsegment),
          |l2 AS (SELECT count(*) AS sz FROM c GROUP BY c_mktsegment),
          |l3 AS (SELECT count(*) AS sz FROM c)
          |SELECT * FROM (
          |  SELECT 0 AS level, 'c_nationkey,c_mktsegment,bal_bucket' AS qi,
          |    count(*) AS n_groups, min(sz) AS min_group,
          |    CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
          |      AS n_below_k,
          |    round(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
          |      / SUM(sz), 6) AS share_below,
          |    min(sz) >= 5 AS meets_k FROM l0
          |  UNION ALL
          |  SELECT 1, 'c_nationkey,c_mktsegment', count(*), min(sz),
          |    CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT),
          |    round(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
          |      / SUM(sz), 6), min(sz) >= 5 FROM l1
          |  UNION ALL
          |  SELECT 2, 'c_mktsegment', count(*), min(sz),
          |    CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT),
          |    round(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
          |      / SUM(sz), 6), min(sz) >= 5 FROM l2
          |  UNION ALL
          |  SELECT 3, '(all)', count(*), min(sz),
          |    CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT),
          |    round(CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
          |      / SUM(sz), 6), min(sz) >= 5 FROM l3)
          |ORDER BY level""".stripMargin,

      // the q103 IVF/exact CTEs at k=10, then precision-at-hit-rank sums
      // and the decimal-exact MAP on every row
      "q353_map_eval" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
          |    CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv),
          |          c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          |  FROM embeddings WHERE vec_id < 5),
          |probe AS (SELECT query_id, qv, cid FROM (
          |    SELECT q.query_id, q.qv, c.cid,
          |      row_number() OVER (PARTITION BY q.query_id
          |        ORDER BY list_distance(qv, c.cv), c.cid) AS rn
          |    FROM q, c) WHERE rn <= 2),
          |approx AS (SELECT query_id, vec_id, rk AS r FROM (
          |    SELECT p.query_id, a.vec_id,
          |      row_number() OVER (PARTITION BY p.query_id
          |        ORDER BY 1.0 - list_cosine_similarity(
          |          CAST(a.embedding AS DOUBLE[]), p.qv), a.vec_id) AS rk
          |    FROM a JOIN probe p ON a.centroid_id = p.cid) WHERE rk <= 10),
          |exact AS (SELECT query_id, vec_id FROM (
          |    SELECT q.query_id, e.vec_id,
          |      row_number() OVER (PARTITION BY q.query_id
          |        ORDER BY 1.0 - list_cosine_similarity(
          |          CAST(e.embedding AS DOUBLE[]), q.qv), e.vec_id) AS rk
          |    FROM embeddings e, q) WHERE rk <= 10),
          |rc AS (SELECT query_id, count(*) AS n_rel FROM exact
          |  GROUP BY query_id),
          |h AS (SELECT ap.query_id, ap.r,
          |    CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
          |  FROM approx ap LEFT JOIN exact x USING (query_id, vec_id)),
          |cm AS (SELECT query_id, r, hit,
          |    SUM(hit) OVER (PARTITION BY query_id ORDER BY r) AS cum FROM h),
          |pr AS (SELECT query_id, hit,
          |    CASE WHEN hit = 1 THEN CAST(cum AS DOUBLE) / r END AS prec
          |  FROM cm),
          |apq AS (SELECT query_id,
          |    CAST(SUM(CAST(prec AS DECIMAL(38,18))) AS DOUBLE) AS sum_prec,
          |    CAST(SUM(hit) AS BIGINT) AS n_hit
          |  FROM pr GROUP BY query_id),
          |f AS (SELECT a2.query_id, n_rel, n_hit,
          |    COALESCE(sum_prec, 0.0) / n_rel AS ap
          |  FROM apq a2 JOIN rc USING (query_id)),
          |m AS (SELECT count(*) AS nq,
          |    CAST(SUM(CAST(ap AS DECIMAL(38,18))) AS DOUBLE) AS sap FROM f)
          |SELECT query_id, n_rel, n_hit, round(ap, 6) AS ap,
          |  round(sap / nq, 6) AS map
          |FROM f, m ORDER BY query_id""".stripMargin,

      // the q35 assignment with per-row rounded distances, k² centroid
      // separations, max-ratio per cell, decimal-mean DB
      "q354_davies_bouldin" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
          |    CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |asg AS (SELECT vec_id, centroid_id, round(centroid_dist, 6) AS d
          |  FROM (
          |    SELECT e.vec_id, c.cid AS centroid_id,
          |      list_distance(CAST(e.embedding AS DOUBLE[]), c.cv)
          |        AS centroid_dist,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv),
          |          c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |sg AS (SELECT centroid_id AS i, count(*) AS n,
          |    CAST(SUM(CAST(d AS DECIMAL(38,18))) AS DOUBLE) / count(*)
          |      AS sigma
          |  FROM asg GROUP BY centroid_id),
          |cd AS (SELECT x.cid AS i, y.cid AS j,
          |    round(list_distance(x.cv, y.cv), 6) AS dij
          |  FROM c x JOIN c y ON x.cid <> y.cid),
          |rj AS (SELECT cd.i, (si.sigma + sj.sigma) / dij AS rij
          |  FROM cd JOIN sg si ON si.i = cd.i JOIN sg sj ON sj.i = cd.j),
          |dbi AS (SELECT i, max(rij) AS db_i FROM rj GROUP BY i),
          |f AS (SELECT sg.i AS cid, n, sigma, db_i
          |  FROM sg JOIN dbi ON dbi.i = sg.i)
          |SELECT cid, CAST(n AS BIGINT) AS n, round(sigma, 6) AS sigma,
          |  round(db_i, 6) AS db_i,
          |  round(CAST(SUM(CAST(db_i AS DECIMAL(38,18))) OVER () AS DOUBLE)
          |    / count(*) OVER (), 6) AS db
          |FROM f ORDER BY cid""".stripMargin,

      // per-point rounded distances to every centroid, argmin a /
      // second-min b, decimal-mean s per cell and globally
      "q355_silhouette" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
          |    CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |d AS (SELECT e.vec_id AS id, c.cid,
          |    round(list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), 6)
          |      AS dist
          |  FROM embeddings e, c),
          |fs AS (SELECT id, dist AS a, cid AS own FROM (
          |    SELECT id, cid, dist, row_number() OVER (PARTITION BY id
          |      ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1),
          |sc AS (SELECT d.id, min(dist) AS b, max(a) AS a, max(own) AS own
          |  FROM d JOIN fs ON d.id = fs.id AND d.cid <> fs.own
          |  GROUP BY d.id),
          |sv AS (SELECT own, CASE WHEN greatest(a, b) > 0
          |    THEN (b - a) / greatest(a, b) ELSE 0.0 END AS s FROM sc),
          |pc AS (SELECT own AS cid, count(*) AS n,
          |    CAST(SUM(CAST(s AS DECIMAL(38,18))) AS DOUBLE) / count(*)
          |      AS mean_s
          |  FROM sv GROUP BY own),
          |g AS (SELECT CAST(SUM(CAST(s AS DECIMAL(38,18))) AS DOUBLE)
          |    / count(*) AS s_global FROM sv)
          |SELECT cid, CAST(n AS BIGINT) AS n, round(mean_s, 6) AS mean_s,
          |  round(s_global, 6) AS s_global
          |FROM pc, g ORDER BY cid""".stripMargin,

      // full-outer category join with slice totals; keep new/gone plus
      // the top-10 unrounded share shifts
      "q356_category_drift" ->
        """WITH li AS (SELECT p_brand, year(CAST(l_shipdate AS DATE)) AS yr
          |  FROM lineitem JOIN part ON l_partkey = p_partkey),
          |r AS (SELECT p_brand AS cat, count(*) AS n_ref FROM li
          |  WHERE yr <= 1994 GROUP BY 1),
          |c2 AS (SELECT p_brand AS cat, count(*) AS n_cur FROM li
          |  WHERE yr >= 1995 GROUP BY 1),
          |t AS (SELECT (SELECT CAST(SUM(n_ref) AS BIGINT) FROM r) AS tr,
          |    (SELECT CAST(SUM(n_cur) AS BIGINT) FROM c2) AS tc),
          |j AS (SELECT COALESCE(r.cat, c2.cat) AS cat, n_ref, n_cur
          |  FROM r FULL OUTER JOIN c2 ON r.cat = c2.cat),
          |j2 AS (SELECT cat,
          |    CASE WHEN n_ref IS NULL THEN 'new'
          |      WHEN n_cur IS NULL THEN 'gone' ELSE 'shared' END AS status,
          |    CAST(COALESCE(n_ref, 0) AS BIGINT) AS n_ref,
          |    CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur,
          |    CAST(COALESCE(n_ref, 0) AS DOUBLE) / tr AS share_ref,
          |    CAST(COALESCE(n_cur, 0) AS DOUBLE) / tc AS share_cur
          |  FROM j, t),
          |j3 AS (SELECT *, abs(share_cur - share_ref) AS shift FROM j2)
          |SELECT cat, status, n_ref, n_cur, round(share_ref, 6) AS share_ref,
          |  round(share_cur, 6) AS share_cur, round(shift, 6) AS shift
          |FROM j3
          |QUALIFY row_number() OVER (ORDER BY shift DESC, cat) <= 10
          |  OR status <> 'shared'
          |ORDER BY shift DESC, cat""".stripMargin,

      // last-writer-wins replay: the rn=1 by (version, op, payload) DESC
      // is exactly the struct-max ordering; delete ops tombstone
      "q357_changelog_apply" ->
        """WITH log AS (SELECT user_id, event_id AS version,
          |    CASE WHEN event_type = 'error' THEN 'delete'
          |      ELSE 'upsert' END AS op,
          |    event_type,
          |    COALESCE(CAST(round(value * 100) AS BIGINT), 0) AS v100
          |  FROM events WHERE user_id < 300),
          |last AS (SELECT user_id, version, op, event_type, v100 FROM (
          |    SELECT *, row_number() OVER (PARTITION BY user_id
          |      ORDER BY version DESC, op DESC, event_type DESC, v100 DESC)
          |      AS rn
          |    FROM log) WHERE rn = 1)
          |SELECT user_id, version, op, event_type, v100 FROM last
          |WHERE op <> 'delete' ORDER BY user_id""".stripMargin,

      // five decimal window sums over the trailing 14 days, the fixed
      // Pearson tree, full windows only
      "q358_rolling_corr" ->
        """WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
          |      CAST(ts AS DATE)) AS BIGINT) AS day,
          |    count(*) AS x,
          |    COALESCE(CAST(SUM(CAST(round(value * 100) AS BIGINT))
          |      AS BIGINT), 0) AS y
          |  FROM events GROUP BY 1),
          |wsum AS (SELECT day, CAST(x AS BIGINT) AS x, y,
          |    count(*) OVER w AS cnt,
          |    CAST(SUM(CAST(x AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * y AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sxy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(38,0))) OVER w AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(y * y AS DECIMAL(38,0))) OVER w AS DOUBLE) AS syy
          |  FROM daily
          |  WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
          |SELECT day, x, y,
          |  CASE WHEN (sxx - sx * sx / 14) > 0 AND (syy - sy * sy / 14) > 0
          |    THEN round((sxy - sx * sy / 14)
          |      / sqrt((sxx - sx * sx / 14) * (syy - sy * sy / 14)), 6)
          |  END AS corr
          |FROM wsum WHERE cnt = 14 ORDER BY day""".stripMargin,

      // exact-cents header-vs-lines close with the identical rounding
      // tree; summary rides every row, top-20 absolute deltas kept
      "q359_order_reconciliation" ->
        """WITH o AS (SELECT o_orderkey AS key,
          |    CAST(round(o_totalprice * 100) AS BIGINT) AS declared
          |  FROM orders),
          |li AS (SELECT l_orderkey AS key,
          |    CAST(round(l_extendedprice * (1.0 - l_discount)
          |      * (1.0 + l_tax) * 100) AS BIGINT) AS amt
          |  FROM lineitem),
          |cs AS (SELECT key, CAST(SUM(CAST(amt AS DECIMAL(38,0)))
          |    AS BIGINT) AS children FROM li GROUP BY key),
          |d AS (SELECT o.key, declared, COALESCE(children, 0) AS children,
          |    declared - COALESCE(children, 0) AS delta
          |  FROM o LEFT JOIN cs USING (key)),
          |s AS (SELECT count(*) AS n_parents,
          |    CAST(SUM(CASE WHEN delta <> 0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_mismatched,
          |    CAST(SUM(abs(delta)) AS BIGINT) AS total_abs_delta FROM d)
          |SELECT key, declared, children, delta, n_parents, n_mismatched,
          |  total_abs_delta
          |FROM d, s
          |QUALIFY row_number() OVER (ORDER BY abs(delta) DESC, key) <= 20
          |ORDER BY key""".stripMargin,

      // candidate/truth pair counts under nation blocking with the
      // shifted-twin corpus; RR against C(2n, 2)
      "q360_blocking_quality" ->
        """WITH c AS (SELECT c_custkey AS id, c_nationkey AS nat
          |  FROM customer WHERE c_custkey < 400),
          |corpus AS (SELECT id, nat FROM c
          |  UNION ALL SELECT id + 10000, (nat + id % 2) % 25 FROM c),
          |truth AS (SELECT id AS a, id + 10000 AS b FROM c),
          |cand AS (SELECT x.id AS a, y.id AS b FROM corpus x JOIN corpus y
          |  ON x.nat = y.nat AND x.id < y.id),
          |counts AS (SELECT
          |  (SELECT count(*) FROM cand) AS n_candidates,
          |  (SELECT count(*) FROM truth) AS n_true,
          |  (SELECT count(*) FROM cand JOIN truth USING (a, b)) AS n_found,
          |  (SELECT count(*) FROM corpus) AS nr)
          |SELECT n_candidates, n_true, n_found,
          |  round(1.0 - CAST(n_candidates AS DOUBLE) / (nr * (nr - 1) / 2), 6)
          |    AS reduction_ratio,
          |  round(CAST(n_found AS DOUBLE) / n_true, 6) AS pairs_completeness
          |FROM counts""".stripMargin,

      // last-activity per user vs the corpus high-water mark at four
      // inactivity cutoffs
      "q361_churn_sensitivity" ->
        """WITH u AS (SELECT user_id,
          |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
          |  FROM events GROUP BY user_id),
          |m AS (SELECT max(last_us) AS max_us FROM u),
          |t AS (SELECT CAST(i AS BIGINT) AS t_days
          |  FROM unnest([7, 14, 21, 28]) AS u2(i))
          |SELECT t_days, count(*) AS n_users,
          |  CAST(SUM(CASE WHEN last_us < max_us - t_days * 86400000000
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
          |  round(CAST(SUM(CASE WHEN last_us < max_us - t_days * 86400000000
          |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS churn_rate
          |FROM u, m, t GROUP BY t_days ORDER BY t_days""".stripMargin,

      // rounded per-row norms, 64 per-dim decimal means folded in dim
      // order for ||mu||, the same fixed trees for sd/cv/anisotropy
      "q362_anisotropy" ->
        """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |nr AS (SELECT v, round(sqrt(list_reduce(
          |    list_transform(range(1, 65),
          |      i -> v[CAST(i AS INT)] * v[CAST(i AS INT)]),
          |    (a, b) -> a + b)), 6) AS nrm FROM e),
          |s AS (SELECT count(*) AS n,
          |    CAST(SUM(CAST(nrm AS DECIMAL(38,18))) AS DOUBLE) AS s1,
          |    CAST(SUM(CAST(nrm * nrm AS DECIMAL(38,18))) AS DOUBLE) AS s2
          |  FROM nr),
          |md AS (SELECT i AS dim,
          |    CAST(SUM(CAST(v[CAST(i AS INT)] AS DECIMAL(38,18))) AS DOUBLE)
          |      AS m
          |  FROM e, unnest(range(1, 65)) AS u(i) GROUP BY i),
          |mu AS (SELECT sqrt(list_reduce(
          |    list_transform(list(m / n ORDER BY dim), x -> x * x),
          |    (a, b) -> a + b)) AS mu_norm
          |  FROM md, s GROUP BY n)
          |SELECT n, round(s1 / n, 6) AS mean_norm,
          |  round(sqrt((s2 - s1 * s1 / n) / n), 6) AS sd_norm,
          |  round(sqrt((s2 - s1 * s1 / n) / n) / (s1 / n), 6) AS cv_norm,
          |  round(mu_norm, 6) AS mu_norm,
          |  round(mu_norm / (s1 / n), 6) AS anisotropy
          |FROM s, mu""".stripMargin,

      // the q99 pseudo-line construction, per-doc distinct lines, cross-
      // doc line df, boilerplate share at df >= 3
      "q363_boilerplate_lines" ->
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
          |dl AS (SELECT DISTINCT doc_id AS id, line
          |  FROM l, unnest(lines) AS u(line)),
          |fr AS (SELECT line, count(*) AS line_df FROM dl GROUP BY line)
          |SELECT id, count(*) AS n_lines,
          |  CAST(SUM(CASE WHEN line_df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_boiler,
          |  round(CAST(SUM(CASE WHEN line_df >= 3 THEN 1 ELSE 0 END)
          |    AS DOUBLE) / count(*), 6) AS boiler_frac
          |FROM dl JOIN fr USING (line)
          |GROUP BY id ORDER BY id""".stripMargin,

      // the q305 fold chain, distinct word 4-grams per side, anti-join
      // novelty
      "q364_ngram_novelty" ->
        """WITH d AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(lower(text), '\s+'),
          |      x -> x <> '') AS t
          |  FROM documents),
          |h0 AS (SELECT doc_id, t, (doc_id * 1000003) % 2147483647 AS h FROM d),
          |h1 AS (SELECT doc_id, t,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT t,
          |    ((xor(h, h >> 13) * 73244475) % 2147483647) % 10 >= 8 AS tst
          |  FROM h1),
          |g AS (SELECT DISTINCT tst,
          |    array_to_string(t[CAST(i AS INT) : CAST(i + 3 AS INT)], ' ')
          |      AS gram
          |  FROM h2, unnest(range(1, len(t) - 2)) AS u(i)
          |  WHERE len(t) >= 4),
          |tr AS (SELECT DISTINCT gram FROM g WHERE NOT tst),
          |te AS (SELECT DISTINCT gram FROM g WHERE tst),
          |un AS (SELECT gram FROM te WHERE gram NOT IN (SELECT gram FROM tr))
          |SELECT (SELECT count(*) FROM tr) AS n_train_grams,
          |  (SELECT count(*) FROM te) AS n_test_grams,
          |  (SELECT count(*) FROM un) AS n_unseen,
          |  round(CAST((SELECT count(*) FROM un) AS DOUBLE)
          |    / (SELECT count(*) FROM te), 6) AS novelty""".stripMargin,

      // the q101 candidate-pair CTEs re-ranked to two NN distances per
      // point, ln(r2/r1) decimal-accumulated
      "q365_intrinsic_dim" ->
        s"""$knnEdgesPrefixSql,
           |rk2 AS (SELECT id, round(distance, 6) AS dd,
           |    row_number() OVER (PARTITION BY id
           |      ORDER BY distance, nbr_id) AS r
           |  FROM p),
           |rr AS (SELECT id,
           |    min(CASE WHEN r = 1 THEN dd END) AS r1,
           |    min(CASE WHEN r = 2 THEN dd END) AS r2
           |  FROM rk2 WHERE r <= 2 GROUP BY id),
           |lg AS (SELECT ln(r2 / r1) AS logmu FROM rr
           |  WHERE r1 > 0 AND r2 IS NOT NULL),
           |f AS (SELECT count(*) AS n_points,
           |    CAST(SUM(CAST(logmu AS DECIMAL(38,18))) AS DOUBLE) AS sl
           |  FROM lg)
           |SELECT n_points, round(sl, 6) AS sum_log,
           |  CASE WHEN sl > 0
           |    THEN round(CAST(n_points AS DOUBLE) / sl, 6) END AS id_est
           |FROM f""".stripMargin,

      // per-user (x, y) moments per hash arm, the delta-method variance
      // tree, and the pooled two-arm z — identical parenthesization
      "q366_ratio_metric" ->
        """WITH pe AS (SELECT user_id,
          |    COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
          |      THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT), 0)
          |      AS x,
          |    count(*) AS y
          |  FROM events GROUP BY user_id),
          |k0 AS (SELECT x, y, (user_id * 1000003) % 2147483647 AS h FROM pe),
          |k1 AS (SELECT x, y,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM k0),
          |k2 AS (SELECT x, y,
          |    ((xor(h, h >> 13) * 73244475) % 2147483647) % 2 = 0 AS arm
          |  FROM k1),
          |per AS (SELECT arm, count(*) AS n,
          |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
          |  FROM k2 GROUP BY arm),
          |dd AS (SELECT arm, n, sx / sy AS ratio, sy / n AS ybar,
          |    (sxx - sx * sx / n) / n AS vx,
          |    (syy - sy * sy / n) / n AS vy,
          |    (sxy - sx * sy / n) / n AS cxy FROM per),
          |se AS (SELECT arm, n, ratio,
          |    sqrt((vx - 2.0 * ratio * cxy + ratio * ratio * vy)
          |      / (n * (ybar * ybar))) AS se
          |  FROM dd),
          |zz AS (SELECT (max(CASE WHEN arm THEN ratio END)
          |    - max(CASE WHEN NOT arm THEN ratio END))
          |    / sqrt(max(CASE WHEN arm THEN se * se END)
          |      + max(CASE WHEN NOT arm THEN se * se END)) AS z
          |  FROM se)
          |SELECT arm, n, round(ratio, 6) AS ratio, round(se, 6) AS se,
          |  round(z, 6) AS z
          |FROM se, zz ORDER BY arm""".stripMargin,

      // row-based lags over the daily series; exact integer error sums
      "q367_mase_forecast" ->
        """WITH daily AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
          |      CAST(ts AS DATE)) AS BIGINT) AS day, count(*) AS n
          |  FROM events GROUP BY 1),
          |lg AS (SELECT day, CAST(n AS BIGINT) AS n,
          |    lag(n, 1) OVER (ORDER BY day) AS l1,
          |    lag(n, 7) OVER (ORDER BY day) AS ls
          |  FROM daily),
          |f AS (SELECT * FROM lg WHERE l1 IS NOT NULL AND ls IS NOT NULL)
          |SELECT count(*) AS n_days,
          |  round(CAST(SUM(abs(n - l1)) AS DOUBLE) / count(*), 6)
          |    AS mae_naive,
          |  round(CAST(SUM(abs(n - ls)) AS DOUBLE) / count(*), 6)
          |    AS mae_seasonal,
          |  CASE WHEN SUM(abs(n - l1)) > 0 THEN
          |    round(CAST(SUM(abs(n - ls)) AS DOUBLE) / SUM(abs(n - l1)), 6)
          |  END AS mase
          |FROM f""".stripMargin,

      // presence funnel per user, hash arms, pooled two-proportion z per
      // step transition
      "q368_funnel_ab" ->
        """WITH u AS (SELECT user_id,
          |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
          |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
          |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
          |  FROM events GROUP BY user_id),
          |k0 AS (SELECT v, c, p, (user_id * 1000003) % 2147483647 AS h
          |  FROM u),
          |k1 AS (SELECT v, c, p,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM k0),
          |k2 AS (SELECT v, c, p,
          |    ((xor(h, h >> 13) * 73244475) % 2147483647) % 2 = 0 AS arm
          |  FROM k1),
          |s AS (SELECT arm, v,
          |    CASE WHEN v = 1 AND c = 1 THEN 1 ELSE 0 END AS s2,
          |    CASE WHEN v = 1 AND c = 1 AND p = 1 THEN 1 ELSE 0 END AS s3
          |  FROM k2),
          |st AS (SELECT arm, 2 AS step, v AS prev, s2 AS conv FROM s
          |  UNION ALL SELECT arm, 3, s2, s3 FROM s),
          |g AS (SELECT step,
          |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
          |    CAST(SUM(CASE WHEN arm THEN conv ELSE 0 END) AS BIGINT)
          |      AS conv_t,
          |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_c,
          |    CAST(SUM(CASE WHEN NOT arm THEN conv ELSE 0 END) AS BIGINT)
          |      AS conv_c
          |  FROM st WHERE prev = 1 GROUP BY step),
          |w AS (SELECT *, CAST(conv_t AS DOUBLE) / n_t AS p_t,
          |    CAST(conv_c AS DOUBLE) / n_c AS p_c,
          |    CAST(conv_t + conv_c AS DOUBLE) / (n_t + n_c) AS pp FROM g)
          |SELECT step, n_t, conv_t, n_c, conv_c, round(p_t, 6) AS p_t,
          |  round(p_c, 6) AS p_c,
          |  CASE WHEN pp > 0 AND pp < 1 THEN round((p_t - p_c)
          |    / sqrt((pp * (1.0 - pp)) * (1.0 / n_t + 1.0 / n_c)), 6)
          |  END AS z
          |FROM w ORDER BY step""".stripMargin,

      // sentence split at [.!?]+ runs, token-cumsum packs of 60, ordered
      // re-join with '. ' — the q85 cumsum-div discipline
      "q369_sentence_chunks" ->
        """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
          |sents AS (SELECT doc_id, i AS pos, s[CAST(i AS INT)] AS sent
          |  FROM (SELECT doc_id,
          |      list_filter(regexp_split_to_array(text, '[.!?]+\s*'),
          |        x -> x <> '') AS s
          |    FROM d), unnest(range(1, len(s) + 1)) AS u(i)),
          |tk AS (SELECT doc_id, pos, sent,
          |    CAST(len(list_filter(regexp_split_to_array(sent, '\s+'),
          |      x -> x <> '')) AS BIGINT) AS nt
          |  FROM sents),
          |cumt AS (SELECT doc_id, pos, sent, nt,
          |    SUM(nt) OVER (PARTITION BY doc_id ORDER BY pos) AS cum
          |  FROM tk),
          |ch AS (SELECT doc_id, (cum - nt) // 60 AS pack, pos, sent, nt
          |  FROM cumt),
          |g AS (SELECT doc_id, pack, count(*) AS n_sentences,
          |    CAST(SUM(nt) AS BIGINT) AS n_tokens,
          |    string_agg(sent, '. ' ORDER BY pos) AS chunk
          |  FROM ch GROUP BY doc_id, pack)
          |SELECT doc_id, CAST(pack AS INT) AS chunk_idx, n_sentences,
          |  n_tokens, chunk
          |FROM g ORDER BY doc_id, chunk_idx""".stripMargin,

      // cluster-size moments from the recursive chain; singletons fill
      // the corpus to 2n with weight 1
      "q370_effective_sample_size" ->
        s"""WITH RECURSIVE $dedupClustersCtes,
           |sz AS (SELECT cluster_rep, count(*) AS w FROM clusters
           |  GROUP BY cluster_rep),
           |ag AS (SELECT count(*) AS n_clusters,
           |    CAST(SUM(w) AS BIGINT) AS n_clustered,
           |    CAST(SUM(CAST(w * w AS DECIMAL(38,0))) AS DOUBLE) AS sw2
           |  FROM sz),
           |cs AS (SELECT 2 * count(*) AS nn FROM documents)
           |SELECT n_clusters, n_clustered,
           |  CAST(nn - n_clustered AS BIGINT) AS n_singletons,
           |  round((CAST(nn AS DOUBLE) * nn) / (sw2 + (nn - n_clustered)), 6)
           |    AS n_eff,
           |  round(((CAST(nn AS DOUBLE) * nn) / (sw2 + (nn - n_clustered)))
           |    / nn, 6) AS eff_ratio
           |FROM ag, cs""".stripMargin,

      // key frequencies from the props regex, rank cut at each candidate
      // cache size
      "q371_access_coverage" ->
        """WITH a AS (SELECT CAST(regexp_extract(props, '"k": (\d+)', 1)
          |    AS INT) AS k
          |  FROM events WHERE regexp_matches(props, '"k": \d+')),
          |fr AS (SELECT k, count(*) AS f FROM a GROUP BY k),
          |rk AS (SELECT k, f, row_number() OVER (ORDER BY f DESC, k) AS rk
          |  FROM fr),
          |tot AS (SELECT CAST(SUM(f) AS BIGINT) AS total,
          |    count(*) AS n_keys FROM fr),
          |m AS (SELECT CAST(i AS INT) AS cache_size
          |  FROM unnest([5, 10, 25, 50]) AS u(i)),
          |cov AS (SELECT cache_size,
          |    CAST(SUM(CASE WHEN rk.rk <= cache_size THEN f ELSE 0 END)
          |      AS BIGINT) AS covered
          |  FROM rk, m GROUP BY cache_size)
          |SELECT cache_size, n_keys, covered, total,
          |  round(CAST(covered AS DOUBLE) / total, 6) AS hit_rate
          |FROM cov, tot ORDER BY cache_size""".stripMargin,

      // q251's life table + hash arms; at-risk from the full arm×time
      // grid reverse cumsum; hypergeometric O−E/V terms
      "q372_logrank" ->
        """WITH per AS (SELECT user_id,
          |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
          |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
          |  FROM events GROUP BY user_id),
          |gm AS (SELECT max(t1) AS g FROM per),
          |k0 AS (SELECT t0, t1, (user_id * 1000003) % 2147483647 AS h
          |  FROM per),
          |k1 AS (SELECT t0, t1,
          |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM k0),
          |k2 AS (SELECT t0, t1,
          |    ((xor(h, h >> 13) * 73244475) % 2147483647) % 2 = 0 AS arm
          |  FROM k1),
          |life AS (SELECT (t1 - t0) // 3600000000 AS t,
          |    t1 < g - 43200000000 AS obs, arm FROM k2, gm),
          |grid AS (SELECT t, arm
          |  FROM (SELECT DISTINCT t FROM life), (SELECT DISTINCT arm FROM life)),
          |pt0 AS (SELECT arm, t,
          |    CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END) AS BIGINT) AS d,
          |    count(*) AS leave
          |  FROM life GROUP BY arm, t),
          |pt AS (SELECT grid.arm, grid.t, COALESCE(d, 0) AS d,
          |    COALESCE(leave, 0) AS leave
          |  FROM grid LEFT JOIN pt0 ON grid.arm = pt0.arm AND grid.t = pt0.t),
          |rk AS (SELECT arm, t, d, SUM(leave) OVER (PARTITION BY arm
          |    ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS at_risk FROM pt),
          |bt AS (SELECT t,
          |    CAST(SUM(CASE WHEN arm THEN d ELSE 0 END) AS BIGINT) AS d1,
          |    CAST(SUM(d) AS BIGINT) AS dt,
          |    CAST(SUM(CASE WHEN arm THEN at_risk ELSE 0 END) AS BIGINT) AS n1,
          |    CAST(SUM(at_risk) AS BIGINT) AS nt
          |  FROM rk GROUP BY t),
          |ft AS (SELECT * FROM bt WHERE dt > 0 AND nt > 1),
          |tm AS (SELECT
          |    CAST(d1 AS DOUBLE) - CAST(dt AS DOUBLE) * n1 / nt AS ome,
          |    (CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / nt))
          |      * (1.0 - CAST(n1 AS DOUBLE) / nt)
          |      * (CAST(nt - dt AS DOUBLE) / (nt - 1)) AS v1
          |  FROM ft)
          |SELECT count(*) AS n_times,
          |  round(CAST(SUM(CAST(ome AS DECIMAL(38,18))) AS DOUBLE), 6)
          |    AS o_minus_e,
          |  round(CAST(SUM(CAST(v1 AS DECIMAL(38,18))) AS DOUBLE), 6)
          |    AS variance,
          |  CASE WHEN CAST(SUM(CAST(v1 AS DECIMAL(38,18))) AS DOUBLE) > 0
          |    THEN round(CAST(SUM(CAST(ome AS DECIMAL(38,18))) AS DOUBLE)
          |      / sqrt(CAST(SUM(CAST(v1 AS DECIMAL(38,18))) AS DOUBLE)), 6)
          |  END AS z
          |FROM tm""".stripMargin,

      // the q318 transition CTEs with the steps recursion: v0 = 0,
      // v ← 1 + Pv except at the absorbing target
      "q373_expected_steps" ->
        """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |    event_type FROM events),
          |l AS (SELECT event_type,
          |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |      AS from_type,
          |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id)) AS gap_us
          |  FROM e),
          |p AS (SELECT from_type, event_type AS to_type,
          |    CAST(count(*) AS BIGINT) AS n FROM l
          |  WHERE from_type IS NOT NULL AND gap_us <= 1800000000 GROUP BY 1, 2),
          |m AS (SELECT from_type AS s, to_type AS t, n,
          |    SUM(n) OVER (PARTITION BY from_type) AS tot FROM p),
          |st AS (SELECT DISTINCT s FROM
          |  (SELECT s FROM m UNION ALL SELECT t FROM m)),
          |r0 AS (SELECT s, 0.0 AS v FROM st),
          |r1 AS (SELECT st.s, CASE WHEN st.s = 'purchase' THEN 0.0
          |    ELSE 1.0 + COALESCE(f.vn, 0.0) END AS v
          |  FROM st LEFT JOIN (SELECT m.s, CAST(SUM(CAST(
          |      (CAST(m.n AS DOUBLE) / m.tot) * v.v AS DECIMAL(27,15)))
          |      AS DOUBLE) AS vn
          |    FROM m JOIN r0 v ON m.t = v.s GROUP BY m.s) f ON st.s = f.s),
          |r2 AS (SELECT st.s, CASE WHEN st.s = 'purchase' THEN 0.0
          |    ELSE 1.0 + COALESCE(f.vn, 0.0) END AS v
          |  FROM st LEFT JOIN (SELECT m.s, CAST(SUM(CAST(
          |      (CAST(m.n AS DOUBLE) / m.tot) * v.v AS DECIMAL(27,15)))
          |      AS DOUBLE) AS vn
          |    FROM m JOIN r1 v ON m.t = v.s GROUP BY m.s) f ON st.s = f.s),
          |r3 AS (SELECT st.s, CASE WHEN st.s = 'purchase' THEN 0.0
          |    ELSE 1.0 + COALESCE(f.vn, 0.0) END AS v
          |  FROM st LEFT JOIN (SELECT m.s, CAST(SUM(CAST(
          |      (CAST(m.n AS DOUBLE) / m.tot) * v.v AS DECIMAL(27,15)))
          |      AS DOUBLE) AS vn
          |    FROM m JOIN r2 v ON m.t = v.s GROUP BY m.s) f ON st.s = f.s),
          |r4 AS (SELECT st.s, CASE WHEN st.s = 'purchase' THEN 0.0
          |    ELSE 1.0 + COALESCE(f.vn, 0.0) END AS v
          |  FROM st LEFT JOIN (SELECT m.s, CAST(SUM(CAST(
          |      (CAST(m.n AS DOUBLE) / m.tot) * v.v AS DECIMAL(27,15)))
          |      AS DOUBLE) AS vn
          |    FROM m JOIN r3 v ON m.t = v.s GROUP BY m.s) f ON st.s = f.s)
          |SELECT s AS state, round(v, 6) AS exp_steps
          |FROM r4 ORDER BY state""".stripMargin,

      // per-char class codes (unicode == ascii on this corpus), lead
      // transitions, per-doc p·ln p entropy
      "q374_charclass_entropy" ->
        """WITH codes AS (SELECT doc_id,
          |    list_transform(range(1, length(text) + 1),
          |      i -> CAST(unicode(substring(text, CAST(i AS INT), 1)) AS BIGINT))
          |      AS cs
          |  FROM documents WHERE length(text) >= 2),
          |ch AS (SELECT doc_id, i AS pos, cs[CAST(i AS INT)] AS code
          |  FROM codes, unnest(range(1, len(cs) + 1)) AS u(i)),
          |cl AS (SELECT doc_id, pos,
          |    CASE WHEN code BETWEEN 97 AND 122 THEN 'l'
          |         WHEN code BETWEEN 65 AND 90 THEN 'u'
          |         WHEN code BETWEEN 48 AND 57 THEN 'd'
          |         WHEN code IN (32, 9, 10) THEN 's' ELSE 'p' END AS cl
          |  FROM ch),
          |tr AS (SELECT doc_id, cl,
          |    lead(cl) OVER (PARTITION BY doc_id ORDER BY pos) AS nx
          |  FROM cl),
          |ct AS (SELECT doc_id, cl, nx, count(*) AS n FROM tr
          |  WHERE nx IS NOT NULL GROUP BY 1, 2, 3),
          |ww AS (SELECT doc_id, n,
          |    SUM(n) OVER (PARTITION BY doc_id) AS tot FROM ct),
          |tm AS (SELECT doc_id, tot,
          |    (CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot) AS term
          |  FROM ww)
          |SELECT doc_id, CAST(max(tot) AS BIGINT) AS n_transitions,
          |  round(0.0 - CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE), 6)
          |    AS entropy
          |FROM tm GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      // the q158 doubled-BIGINT rank-sum with post as the label over the
      // q325 midpoint split
      "q375_drift_auc" ->
        """WITH pe AS (SELECT
          |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
          |      AS wk,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |bnd AS (SELECT min(wk) AS w0, max(wk) AS w1 FROM pe),
          |t AS (SELECT v, wk >= (w0 + w1 + 1) // 2 AS post FROM pe, bnd),
          |bys AS (SELECT v AS s,
          |    CAST(SUM(CASE WHEN post THEN 1 ELSE 0 END) AS BIGINT) AS np,
          |    CAST(SUM(CASE WHEN post THEN 0 ELSE 1 END) AS BIGINT) AS nn
          |  FROM t GROUP BY v),
          |cum AS (SELECT np, nn,
          |    coalesce(SUM(nn) OVER (ORDER BY s
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS cum_nn
          |  FROM bys)
          |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
          |  CAST(SUM(nn) AS BIGINT) AS n_neg,
          |  CAST(SUM(np * (2 * cum_nn + nn)) AS BIGINT) AS u2,
          |  CAST(SUM(np * (2 * cum_nn + nn)) AS DOUBLE)
          |    / (2 * SUM(np) * SUM(nn)) AS auc
          |FROM cum""".stripMargin,

      // the q271 Pearson CTE per brand and once globally; sign votes
      "q376_simpsons_paradox" ->
        """WITH j AS (SELECT p.p_brand, l.l_discount AS x,
          |    l.l_quantity AS y
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
          |st AS (SELECT p_brand, COUNT(*) AS n,
          |    CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(24,6))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(y * y AS DECIMAL(24,6))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(x * y AS DECIMAL(24,6))) AS DOUBLE) AS sxy
          |  FROM j GROUP BY p_brand),
          |per AS (SELECT p_brand,
          |    round((n * sxy - sx * sy) /
          |      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
          |      AS corr
          |  FROM st),
          |pf AS (SELECT corr FROM per
          |  WHERE corr IS NOT NULL AND NOT isnan(corr)),
          |gs AS (SELECT COUNT(*) AS n,
          |    CAST(SUM(CAST(x AS DECIMAL(24,6))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(24,6))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(y * y AS DECIMAL(24,6))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(x * y AS DECIMAL(24,6))) AS DOUBLE) AS sxy
          |  FROM j),
          |g AS (SELECT round((n * sxy - sx * sy) /
          |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
          |    AS global_corr FROM gs)
          |SELECT max(global_corr) AS global_corr, count(*) AS n_segments,
          |  CAST(SUM(CASE WHEN sign(corr) = sign(global_corr)
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
          |  CAST(SUM(CASE WHEN sign(corr) <> sign(global_corr)
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree,
          |  CAST(SUM(CASE WHEN sign(corr) <> sign(global_corr)
          |    THEN 1 ELSE 0 END) AS BIGINT)
          |    > CAST(SUM(CASE WHEN sign(corr) = sign(global_corr)
          |      THEN 1 ELSE 0 END) AS BIGINT) AS paradox
          |FROM pf, g""".stripMargin,

      // anchor days = month starts; offset means over the daily series
      // against the all-days baseline
      "q377_event_study" ->
        """WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
          |  FROM events GROUP BY 1),
          |dd AS (SELECT d, CAST(n AS BIGINT) AS n,
          |    CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS day
          |  FROM daily),
          |an AS (SELECT day AS a FROM dd WHERE day(d) = 1),
          |base AS (SELECT CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DOUBLE)
          |    / count(*) AS baseline FROM dd),
          |off AS (SELECT dd.day - an.a AS off, dd.n
          |  FROM an, dd WHERE dd.day - an.a BETWEEN -3 AND 3),
          |g AS (SELECT off, count(*) AS n_days,
          |    CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DOUBLE) / count(*)
          |      AS mean_n
          |  FROM off GROUP BY off)
          |SELECT off, n_days, round(mean_n, 6) AS mean_n,
          |  round(mean_n / baseline, 6) AS lift
          |FROM g, base ORDER BY off""".stripMargin,

      // the q119 refined-graph CTE prefix (bucket-local kNN + ring seed +
      // one NN-descent round) feeding the q129 beam-search replay — the
      // stored-graph probe must be indistinguishable from the in-query
      // path, so the oracle never sees the store
      "q378_graph_store" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |p AS (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
          |    AND l.vec_id <> r.vec_id),
          |g0 AS (SELECT id, nbr_id, distance FROM (
          |    SELECT id, nbr_id, distance,
          |      row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rk
          |    FROM p) WHERE rk <= 3),
          |seed AS (SELECT id, nbr_id FROM g0
          |  UNION ALL SELECT l.vec_id AS id, r.vec_id AS nbr_id
          |  FROM embeddings l JOIN embeddings r ON r.vec_id = l.vec_id + 1),
          |und AS (SELECT id, nbr_id FROM seed
          |  UNION SELECT nbr_id AS id, id AS nbr_id FROM seed),
          |nn AS (SELECT x.id, y.nbr_id FROM und x JOIN und y ON x.nbr_id = y.id
          |    WHERE x.id <> y.nbr_id
          |  UNION SELECT id, nbr_id FROM und),
          |sc AS (SELECT nn.id, nn.nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM nn JOIN embeddings l ON nn.id = l.vec_id
          |    JOIN embeddings r ON nn.nbr_id = r.vec_id),
          |g1 AS (SELECT id, nbr_id FROM (
          |    SELECT id, nbr_id,
          |      row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rk
          |    FROM sc) WHERE rk <= 3),
          |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT v AS qv FROM ev WHERE vec_id = 5),
          |b0 AS (SELECT vec_id AS cand,
          |    1.0 - list_cosine_similarity(v, qv) AS distance
          |  FROM ev, q WHERE vec_id IN (0, 1, 2, 3)
          |  ORDER BY distance, cand LIMIT 8),
          |x1 AS (SELECT DISTINCT cand FROM (
          |  SELECT g1.nbr_id AS cand FROM b0 JOIN g1 ON g1.id = b0.cand
          |  UNION ALL SELECT cand FROM b0)),
          |b1 AS (SELECT x1.cand, 1.0 - list_cosine_similarity(v, qv) AS distance
          |  FROM x1 JOIN ev ON ev.vec_id = x1.cand, q
          |  ORDER BY distance, cand LIMIT 8),
          |x2 AS (SELECT DISTINCT cand FROM (
          |  SELECT g1.nbr_id AS cand FROM b1 JOIN g1 ON g1.id = b1.cand
          |  UNION ALL SELECT cand FROM b1)),
          |b2 AS (SELECT x2.cand, 1.0 - list_cosine_similarity(v, qv) AS distance
          |  FROM x2 JOIN ev ON ev.vec_id = x2.cand, q
          |  ORDER BY distance, cand LIMIT 8)
          |SELECT CAST(row_number() OVER (ORDER BY distance, cand) AS INT) AS rank,
          |  CAST(cand AS BIGINT) AS vec_id, round(distance, 6) AS distance
          |FROM b2 ORDER BY rank LIMIT 5""".stripMargin,

      // the oracle never sees a pixel: it states the expected OCR output
      // as the SQL-expressible normalization (upper + non-[A-Z0-9 ]→space)
      // and asserts match on every row — hash equality proves the
      // render→encode→decode→segment→template-match loop is lossless
      "q379_ocr_roundtrip" ->
        """WITH n AS (SELECT doc_id,
          |    rtrim(regexp_replace(upper(substring(text, 1, 40)),
          |      '[^A-Z0-9 ]', ' ', 'g')) AS norm
          |  FROM documents)
          |SELECT doc_id, CAST(length(norm) AS INT) AS n_chars,
          |  norm AS ocr_text, true AS match
          |FROM n ORDER BY doc_id""".stripMargin,

      // every column restated as a pure SQL function of (doc_id, text):
      // entry names by the fixture rule, P8 alias via sha256, chunk count
      // by the q11 window formula, job outcome by the reap rule (archive
      // 3 never heartbeats), quota by divmod apportioning
      "q380_ops_lifecycle" ->
        """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
          |e AS (SELECT doc_id, text,
          |    CASE WHEN doc_id % 10 = 7
          |      THEN 'a very long name for doc ' || CAST(doc_id AS VARCHAR) || '.txt'
          |      ELSE 'doc' || CAST(doc_id AS VARCHAR) || '.txt' END AS entry_name,
          |    CAST(doc_id // 10 AS INT) AS archive
          |  FROM d),
          |al AS (SELECT *,
          |    upper(regexp_replace(entry_name, '\W', '_', 'g')) AS base
          |  FROM e),
          |r AS (SELECT doc_id, entry_name,
          |    CASE WHEN length(base) <= 20 THEN base
          |      ELSE substring(base, 1, 12) || '_' ||
          |        upper(substring(sha256(entry_name), 1, 8)) END AS alias,
          |    archive,
          |    CAST(CASE WHEN length(text) = 0 THEN 0
          |      ELSE (length(text) + 149) // 150 END AS BIGINT) AS n_chunks,
          |    CASE WHEN archive = 3 THEN 'failed' ELSE 'succeeded' END
          |      AS job_status,
          |    CASE WHEN archive = 3 THEN 'stale: heartbeat lost' END
          |      AS job_error,
          |    CAST(25 // 4 + CASE WHEN archive < 25 % 4 THEN 1 ELSE 0 END
          |      AS INT) AS q_quota
          |  FROM al)
          |SELECT doc_id, entry_name, alias, archive, n_chunks, job_status,
          |  job_error, q_quota
          |FROM r ORDER BY doc_id LIMIT 25""".stripMargin,

      // three questions, three classifier outcomes; doc counts replay the
      // q55 multistore pipeline (normalize 1−d/2, threshold .65, dedup
      // keep-max on md5(text), global top-8) for query vectors 3 and 7;
      // token totals are whitespace-token arithmetic over the literal
      // question/answer strings (count renders as ONE token either way)
      "q381_rag_combined" ->
        """WITH dc AS (SELECT count(*) AS d FROM documents),
          |q3 AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 3),
          |q7 AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 7),
          |s3 AS (SELECT vec_id AS id, 'vec-' || CAST(vec_id % 50 AS VARCHAR) AS text,
          |    1.0 - (1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)) / 2.0 AS score,
          |    row_number() OVER (PARTITION BY label % 2
          |      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), vec_id) AS rk
          |  FROM embeddings, q3),
          |n3 AS (SELECT count(*) AS n FROM (
          |  SELECT 1 FROM (SELECT *, row_number() OVER (
          |      PARTITION BY md5(text) ORDER BY score DESC, id) AS rn
          |    FROM s3 WHERE rk <= 8 AND score >= 0.65) WHERE rn = 1
          |  ORDER BY score DESC, id LIMIT 8)),
          |s7 AS (SELECT vec_id AS id, 'vec-' || CAST(vec_id % 50 AS VARCHAR) AS text,
          |    1.0 - (1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)) / 2.0 AS score,
          |    row_number() OVER (PARTITION BY label % 2
          |      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), vec_id) AS rk
          |  FROM embeddings, q7),
          |n7 AS (SELECT count(*) AS n FROM (
          |  SELECT 1 FROM (SELECT *, row_number() OVER (
          |      PARTITION BY md5(text) ORDER BY score DESC, id) AS rn
          |    FROM s7 WHERE rk <= 8 AND score >= 0.65) WHERE rn = 1
          |  ORDER BY score DESC, id LIMIT 8))
          |SELECT * FROM (
          |  SELECT 0 AS q_id, 'vecsearch' AS label, 'combined' AS route,
          |    CAST(n3.n AS BIGINT) AS n_docs, CAST(10 AS BIGINT) AS prompt_tokens,
          |    CAST(9 AS BIGINT) AS completion_tokens,
          |    '[describe vec 3 design patterns] -> ' || n3.n || ' docs' AS answer
          |  FROM n3
          |  UNION ALL SELECT 1, 'nl2sql', 'combined', 0, 8, 2, 'docs=' || d FROM dc
          |  UNION ALL SELECT 2, 'both', 'combined', CAST(n7.n AS BIGINT), 20, 17,
          |    'docs=' || d || chr(10) ||
          |    '[summarize vec 7 blend] -> ' || n7.n || ' docs'
          |  FROM n7, dc)
          |ORDER BY q_id""".stripMargin,

      // merged graph = re-rank of (even-corpus bucket-local kNN edges ∪
      // exact new→NN3 forward edges ∪ reverse links) per node, top-3 —
      // the insert rule the store merge must implement and nothing more
      "q382_graph_merge" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |o AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT o.vec_id, o.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY o.vec_id
          |        ORDER BY list_distance(CAST(o.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM o, c) WHERE rn = 1),
          |p AS (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
          |    AND l.vec_id <> r.vec_id),
          |g0 AS (SELECT id, nbr_id, distance FROM (
          |    SELECT id, nbr_id, distance,
          |      row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rk
          |    FROM p) WHERE rk <= 3),
          |nw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          |  FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < 100),
          |fw AS (SELECT id, nbr_id, distance FROM (
          |    SELECT nw.vec_id AS id, o.vec_id AS nbr_id,
          |      1.0 - list_cosine_similarity(CAST(o.embedding AS DOUBLE[]), nw.v)
          |        AS distance,
          |      row_number() OVER (PARTITION BY nw.vec_id
          |        ORDER BY 1.0 - list_cosine_similarity(CAST(o.embedding AS DOUBLE[]), nw.v),
          |          o.vec_id) AS rk
          |    FROM nw, o) WHERE rk <= 3),
          |rv AS (SELECT nbr_id AS id, id AS nbr_id, distance FROM fw),
          |allx AS (SELECT id, nbr_id, distance FROM g0
          |  UNION ALL SELECT id, nbr_id, distance FROM fw
          |  UNION ALL SELECT id, nbr_id, distance FROM rv),
          |rr AS (SELECT id, nbr_id, distance,
          |    row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rank
          |  FROM allx)
          |SELECT CAST(id AS BIGINT) AS id, CAST(rank AS INT) AS rank,
          |  CAST(nbr_id AS BIGINT) AS nbr_id, round(distance, 6) AS distance
          |FROM rr WHERE rank <= 3 AND id < 100 ORDER BY id, rank""".stripMargin,

      // two full HITS sweeps unrolled; every Σ decimal-accumulated and
      // every norm sqrt-of-decimal, matching the Spark tree exactly
      "q383_hits" ->
        """WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst
          |  FROM lineitem),
          |a1r AS (SELECT dst AS id,
          |    CAST(SUM(CAST(1.0 AS DECIMAL(38,18))) AS DOUBLE) AS a
          |  FROM e GROUP BY dst),
          |a1n AS (SELECT sqrt(CAST(SUM(CAST(a * a AS DECIMAL(38,18)))
          |    AS DOUBLE)) AS nrm FROM a1r),
          |a1 AS (SELECT id, a / nrm AS a FROM a1r, a1n),
          |h1r AS (SELECT e.src AS id,
          |    CAST(SUM(CAST(a AS DECIMAL(38,18))) AS DOUBLE) AS h
          |  FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src),
          |h1n AS (SELECT sqrt(CAST(SUM(CAST(h * h AS DECIMAL(38,18)))
          |    AS DOUBLE)) AS nrm FROM h1r),
          |h1 AS (SELECT id, h / nrm AS h FROM h1r, h1n),
          |a2r AS (SELECT e.dst AS id,
          |    CAST(SUM(CAST(h AS DECIMAL(38,18))) AS DOUBLE) AS a
          |  FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst),
          |a2n AS (SELECT sqrt(CAST(SUM(CAST(a * a AS DECIMAL(38,18)))
          |    AS DOUBLE)) AS nrm FROM a2r),
          |a2 AS (SELECT id, a / nrm AS a FROM a2r, a2n),
          |h2r AS (SELECT e.src AS id,
          |    CAST(SUM(CAST(a AS DECIMAL(38,18))) AS DOUBLE) AS h
          |  FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src),
          |h2n AS (SELECT sqrt(CAST(SUM(CAST(h * h AS DECIMAL(38,18)))
          |    AS DOUBLE)) AS nrm FROM h2r),
          |h2 AS (SELECT id, h / nrm AS h FROM h2r, h2n),
          |u AS (SELECT 'hub' AS kind, id, h AS score FROM h2
          |  UNION ALL SELECT 'authority', id, a FROM a2),
          |rk AS (SELECT kind, id, score, row_number() OVER (
          |    PARTITION BY kind ORDER BY score DESC, id) AS rn FROM u)
          |SELECT kind, CAST(rn AS INT) AS rank, CAST(id AS BIGINT) AS id,
          |  round(score, 6) AS score
          |FROM rk WHERE rn <= 20 ORDER BY kind, rank""".stripMargin,

      // the cumulative-count split table and the all-integer Gini tree;
      // argmin by (gini, threshold) exactly as the struct-min computes
      "q384_gini_stump" ->
        """WITH ev AS (SELECT
          |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS v,
          |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
          |  FROM events),
          |p AS (SELECT v, count(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
          |  FROM ev GROUP BY v),
          |c AS (SELECT v, n, pos,
          |    coalesce(SUM(n) OVER (ORDER BY v
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nl,
          |    coalesce(SUM(pos) OVER (ORDER BY v
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS posl
          |  FROM p),
          |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
          |    CAST(SUM(pos) AS BIGINT) AS post FROM p),
          |g AS (SELECT v, nl, posl, nl - posl AS negl, nt - nl AS nr,
          |    post - posl AS posr, (nt - nl) - (post - posl) AS negr, nt
          |  FROM c, t WHERE nl > 0 AND nt - nl > 0),
          |sc AS (SELECT v, nl, posl, nr, posr,
          |    (CAST(nl * nl - posl * posl - negl * negl AS DOUBLE) / nl
          |     + CAST(nr * nr - posr * posr - negr * negr AS DOUBLE) / nr)
          |      / nt AS gini
          |  FROM g),
          |b AS (SELECT min(gini) AS mg FROM sc),
          |b2 AS (SELECT min(v) AS bv FROM sc, b WHERE gini = mg)
          |SELECT v AS threshold, CAST(nl AS BIGINT) AS n_left,
          |  CAST(posl AS BIGINT) AS pos_left, CAST(nr AS BIGINT) AS n_right,
          |  CAST(posr AS BIGINT) AS pos_right, round(gini, 6) AS gini,
          |  v = bv AS is_best
          |FROM sc, b2 ORDER BY threshold""".stripMargin,

      // txt passes the markdown structurer unchanged (single-line
      // lowercase docs trigger no heading/bullet/table rule); png length
      // is the rtrim'd 20-char OCR normalization
      "q385_deep_ingest" ->
        """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 15),
          |t AS (SELECT 'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS filename,
          |    'txt' AS ext, true AS parse_ok,
          |    CAST(length(text) AS INT) AS text_len FROM d
          |  UNION ALL
          |  SELECT 'scan' || CAST(doc_id AS VARCHAR) || '.png', 'png', true,
          |    CAST(length(rtrim(regexp_replace(upper(substring(text, 1, 20)),
          |      '[^A-Z0-9 ]', ' ', 'g'))) AS INT)
          |  FROM d)
          |SELECT filename, ext, parse_ok, text_len FROM t
          |ORDER BY filename""".stripMargin,

      "q386_extractive_summary" -> extractiveSummaryOracleSql,

      // the base-31 char polyhash of the chr(31)-joined key tuple; bucket
      // digests are decimal-exact sums mod 1e9+7, root combines them
      "q387_table_checksum" ->
        """WITH r AS (SELECT
          |    CAST(l_orderkey AS VARCHAR) || chr(31) ||
          |    CAST(l_linenumber AS VARCHAR) || chr(31) ||
          |    CAST(l_partkey AS VARCHAR) || chr(31) ||
          |    CAST(l_suppkey AS VARCHAR) || chr(31) ||
          |    l_returnflag || chr(31) || l_linestatus AS s
          |  FROM lineitem),
          |fp AS (SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(range(1, length(s) + 1),
          |      i -> CAST(ord(substring(s, CAST(i AS INT), 1)) AS BIGINT))),
          |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp FROM r),
          |pb AS (SELECT CAST(fp % 16 AS INT) AS bucket,
          |    count(*) AS n_rows,
          |    CAST(CAST(SUM(CAST(fp AS DECIMAL(38,0))) AS HUGEINT)
          |      % 1000000007 AS BIGINT) AS digest
          |  FROM fp GROUP BY 1),
          |rt AS (SELECT -1 AS bucket, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
          |    CAST(CAST(SUM(CAST(digest AS DECIMAL(38,0))) AS HUGEINT)
          |      % 1000000007 AS BIGINT) AS digest FROM pb)
          |SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows, digest FROM pb
          |UNION ALL SELECT bucket, n_rows, digest FROM rt
          |ORDER BY bucket""".stripMargin,

      "q388_mcnemar" -> mcnemarOracleSql,

      "q389_isotonic" -> isotonicOracleSql,

      "q390_ring_shard" -> ringOracleSql,

      // train fold (even ids) exact ceil(0.9n)-th smallest per type, test
      // fold pays the x10 integer pinball sum, one final division
      "q391_pinball" ->
        """WITH pe AS (SELECT event_type AS g, event_id AS id,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |tr AS (SELECT g, id, v FROM pe WHERE id % 2 = 0),
          |rk AS (SELECT g, v,
          |    row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
          |    count(*) OVER (PARTITION BY g) AS n_train FROM tr),
          |q AS (SELECT g, max(n_train) AS n_train,
          |    min(CASE WHEN rn = (n_train * 9 + 9) // 10 THEN v END)
          |      AS qhat
          |  FROM rk GROUP BY g),
          |te AS (SELECT g, v FROM pe WHERE id % 2 = 1)
          |SELECT te.g AS event_type, max(q.n_train) AS n_train,
          |  max(q.qhat) AS qhat, count(*) AS n_test,
          |  CAST(CAST(SUM(CASE WHEN v >= qhat THEN 9 * (v - qhat)
          |    ELSE qhat - v END) AS BIGINT) AS DOUBLE)
          |    / (10 * count(*)) AS pinball
          |FROM te JOIN q USING (g)
          |GROUP BY te.g ORDER BY event_type""".stripMargin,

      // distinct-bigram table, two count windows, the interpolated-KN
      // formula as ONE identical double tree (D inlined both sides)
      "q392_kneser_ney" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |bgc AS (
          |  SELECT t[CAST(i AS INT)] AS ctx, t[CAST(i AS INT) + 1] AS w2,
          |    CAST(COUNT(*) AS BIGINT) AS c_bg
          |  FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
          |  WHERE len(t) >= 2 GROUP BY 1, 2),
          |win AS (
          |  SELECT ctx, w2, c_bg,
          |    CAST(SUM(c_bg) OVER (PARTITION BY ctx) AS BIGINT) AS c_ctx,
          |    CAST(COUNT(*) OVER (PARTITION BY ctx) AS BIGINT) AS n_follow,
          |    CAST(COUNT(*) OVER (PARTITION BY w2) AS BIGINT) AS n_prec
          |  FROM bgc),
          |g0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
          |    CAST(SUM(CASE WHEN c_bg = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          |    CAST(SUM(CASE WHEN c_bg = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          |  FROM bgc),
          |g AS (SELECT n_types,
          |    CASE WHEN n1 + 2 * n2 = 0 THEN CAST(0.0 AS DOUBLE)
          |      ELSE CAST(n1 AS DOUBLE) / (n1 + 2 * n2) END AS disc
          |  FROM g0)
          |SELECT ctx, w2, c_bg, c_ctx, n_follow, n_prec,
          |  disc AS discount,
          |  CAST(c_bg AS DOUBLE) / c_ctx AS p_mle,
          |  (CAST(c_bg AS DOUBLE) - disc) / c_ctx
          |    + disc * n_follow / c_ctx * n_prec / n_types AS p_kn
          |FROM win, g
          |ORDER BY c_bg DESC, ctx, w2 LIMIT 25""".stripMargin,

      // bigram count-of-counts ≤ 9, Turing r* via the r+1 self-join
      "q393_good_turing" ->
        """WITH toks AS (
          |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |tc AS (
          |  SELECT t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg,
          |    CAST(COUNT(*) AS BIGINT) AS c
          |  FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i)
          |  WHERE len(t) >= 2 GROUP BY 1),
          |nr AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_r
          |  FROM tc WHERE c <= 9 GROUP BY c),
          |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens FROM tc)
          |SELECT a.c AS r, a.n_r,
          |  CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_r_next,
          |  CASE WHEN b.n_r IS NOT NULL
          |    THEN CAST(a.c + 1 AS DOUBLE) * b.n_r / a.n_r END AS r_star,
          |  CAST(a.c * a.n_r AS DOUBLE) / n_tokens AS mass_r,
          |  CASE WHEN b.n_r IS NOT NULL
          |    THEN CAST(a.c + 1 AS DOUBLE) * b.n_r / a.n_r / n_tokens
          |  END AS p_gt
          |FROM nr a LEFT JOIN nr b ON b.c = a.c + 1, tot
          |WHERE a.c <= 8 ORDER BY r""".stripMargin,

      // the identical left fold replayed as a RECURSIVE CTE, one row
      // per (group, step) — NOT list_reduce: DuckDB 1.0's struct-state
      // lambda evaluates the new fields with in-place mutation visible
      // (the sse field reads the already-updated b), so a struct fold
      // is NOT the q251 scalar fold and silently diverges
      "q394_holt" ->
        """WITH RECURSIVE d AS (SELECT event_type, CAST(ts AS DATE) AS day,
          |    CAST(count(*) AS DOUBLE) AS y
          |  FROM events GROUP BY 1, 2),
          |r AS (SELECT event_type, row_number() OVER (
          |      PARTITION BY event_type ORDER BY day) AS t, y FROM d),
          |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs
          |  FROM r GROUP BY 1),
          |it AS (
          |  SELECT event_type, 1 AS t, y AS l, CAST(0.0 AS DOUBLE) AS b,
          |    CAST(0.0 AS DOUBLE) AS sse
          |  FROM r WHERE t = 1
          |  UNION ALL
          |  SELECT it.event_type, it.t + 1,
          |    0.5 * r.y + 0.5 * (it.l + it.b),
          |    0.25 * ((0.5 * r.y + 0.5 * (it.l + it.b)) - it.l)
          |      + 0.75 * it.b,
          |    it.sse + (r.y - (it.l + it.b)) * (r.y - (it.l + it.b))
          |  FROM it JOIN r ON r.event_type = it.event_type
          |    AND r.t = it.t + 1)
          |SELECT it.event_type, nn.n_obs, it.l AS level, it.b AS trend,
          |  it.l + it.b AS forecast_next,
          |  CASE WHEN nn.n_obs > 1 THEN it.sse / (nn.n_obs - 1) END AS mse
          |FROM it JOIN nn USING (event_type)
          |WHERE it.t = nn.n_obs ORDER BY event_type""".stripMargin,

      // running-mean deviations cast decimal(38,18) so the prefix sums
      // are exact; threshold compare on the double cast both sides
      "q395_page_hinkley" ->
        """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
          |    CAST(count(*) AS BIGINT) AS y
          |  FROM events GROUP BY 1, 2),
          |w AS (SELECT event_type, day, y,
          |    CAST(row_number() OVER (PARTITION BY event_type
          |      ORDER BY day) AS BIGINT) AS i,
          |    CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
          |  FROM d),
          |dv AS (SELECT event_type, i,
          |    CAST(CAST(y AS DOUBLE) - CAST(s AS DOUBLE) / i - 0.0
          |      AS DECIMAL(38,18)) AS dd
          |  FROM w),
          |m AS (SELECT event_type, i,
          |    SUM(dd) OVER (PARTITION BY event_type ORDER BY i
          |      ROWS UNBOUNDED PRECEDING) AS m
          |  FROM dv),
          |p AS (SELECT event_type, i,
          |    m - MIN(m) OVER (PARTITION BY event_type ORDER BY i
          |      ROWS UNBOUNDED PRECEDING) AS ph
          |  FROM m)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs,
          |  round(CAST(MAX(ph) AS DOUBLE), 6) AS peak_ph,
          |  CAST(SUM(CASE WHEN CAST(ph AS DOUBLE) > 10.0 THEN 1 ELSE 0
          |    END) AS BIGINT) AS n_alarms,
          |  MIN(CASE WHEN CAST(ph AS DOUBLE) > 10.0 THEN i END)
          |    AS first_alarm_t
          |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,

      // single-code-point signature counts via replace(); the one
      // regex is the portable printable-ASCII class (global flag!)
      "q396_encoding_audit" ->
        """WITH c AS (SELECT doc_id,
          |    CASE WHEN doc_id % 3 = 0
          |      THEN text || ' caffÃ¨ â€” naÃ¯ve Â»' ELSE text END AS text
          |  FROM documents),
          |a AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
          |    CAST(length(regexp_replace(text, '[ -~]', '', 'g'))
          |      AS BIGINT) AS n_non_print,
          |    CAST(length(text) - length(replace(text, '�', ''))
          |      AS BIGINT) AS n_replacement,
          |    CAST((length(text) - length(replace(text, 'Ã', ''))) +
          |      (length(text) - length(replace(text, 'Â', ''))) +
          |      (length(text) - length(replace(text, 'â', '')))
          |      AS BIGINT) AS n_mojibake
          |  FROM c)
          |SELECT doc_id, n_chars, n_non_print, n_replacement, n_mojibake,
          |  (n_replacement > 0 OR n_mojibake > 0) AS is_suspect
          |FROM a ORDER BY doc_id""".stripMargin,

      // leave-one-stratum ratios from exact BIGINT sums; the two
      // cross-stratum means decimal-accumulate then cast double
      "q397_jackknife" ->
        """WITH ev AS (SELECT user_id % 10 AS stratum,
          |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS num,
          |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS den
          |  FROM events),
          |per AS (SELECT stratum, CAST(SUM(num) AS BIGINT) AS num_h,
          |    CAST(SUM(den) AS BIGINT) AS den_h
          |  FROM ev GROUP BY 1),
          |t AS (SELECT CAST(SUM(num_h) AS BIGINT) AS tn,
          |    CAST(SUM(den_h) AS BIGINT) AS td,
          |    CAST(count(*) AS BIGINT) AS h FROM per),
          |loo AS (SELECT stratum, num_h, den_h, tn, td, h,
          |    CAST(tn - num_h AS DOUBLE) / (td - den_h) AS theta_loo
          |  FROM per, t),
          |tb AS (SELECT *, CAST(SUM(CAST(theta_loo AS DECIMAL(38,18)))
          |      OVER () AS DOUBLE) / h AS tbar
          |  FROM loo),
          |v AS (SELECT *, CAST(SUM(CAST((theta_loo - tbar) *
          |      (theta_loo - tbar) AS DECIMAL(38,18))) OVER () AS DOUBLE)
          |      * (h - 1) / h AS var_jack
          |  FROM tb)
          |SELECT stratum, num_h, den_h, theta_loo,
          |  CAST(tn AS DOUBLE) / td AS theta_hat,
          |  round(var_jack, 12) AS var_jack,
          |  round(sqrt(var_jack), 9) AS se_jack
          |FROM v ORDER BY stratum""".stripMargin,

      // HUGEINT ≡ decimal(38,0) exact numerator, one final division
      "q398_cvm_test" ->
        """WITH ev AS (SELECT event_type, user_id % 2 = 0 AS arma,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |bv AS (SELECT event_type, v,
          |    CAST(SUM(CASE WHEN arma THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          |    CAST(SUM(CASE WHEN arma THEN 0 ELSE 1 END) AS BIGINT) AS cb
          |  FROM ev GROUP BY 1, 2),
          |cum AS (SELECT event_type, v, ca, cb,
          |    CAST(SUM(ca) OVER (PARTITION BY event_type ORDER BY v
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cka,
          |    CAST(SUM(cb) OVER (PARTITION BY event_type ORDER BY v
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ckb,
          |    CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS n,
          |    CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS m
          |  FROM bv),
          |ag AS (SELECT event_type, max(n) AS n_a, max(m) AS n_b,
          |    SUM(CAST(ca + cb AS HUGEINT) *
          |      (CAST(cka AS HUGEINT) * m - CAST(ckb AS HUGEINT) * n) *
          |      (CAST(cka AS HUGEINT) * m - CAST(ckb AS HUGEINT) * n))
          |      AS num
          |  FROM cum GROUP BY 1),
          |tt AS (SELECT event_type, n_a, n_b,
          |    round(CAST(num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b *
          |      (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b))), 6) AS t_cvm
          |  FROM ag)
          |SELECT event_type, n_a, n_b, t_cvm, t_cvm > 0.461
          |  AS rejects_5pct
          |FROM tt ORDER BY event_type""".stripMargin,

      "q399_cramers_v" -> cramersVOracleSql,

      "q400_segmented_trend" -> segmentedTrendOracleSql,

      "q401_perm_by_group" ->
        s"""$permByGroupCtes
           |SELECT g AS event_type, diff_obs, n_perms, n_extreme, p_value
           |FROM pg ORDER BY event_type""".stripMargin,

      // step-up condition in pure integers: p_num·qDen·m ≤ rank·p_den·qNum
      "q402_bh_fdr" ->
        s"""$permByGroupCtes,
           |hyp AS (SELECT g, n_extreme + 1 AS p_num, n_perms + 1 AS p_den
           |  FROM pg),
           |rk AS (SELECT g, p_num, p_den,
           |    CAST(row_number() OVER (ORDER BY
           |      CAST(p_num AS DOUBLE) / p_den, g) AS BIGINT) AS rank,
           |    CAST(count(*) OVER () AS BIGINT) AS m
           |  FROM hyp),
           |ok AS (SELECT *, p_num * 4 * m <= rank * p_den * 1 AS pass
           |  FROM rk),
           |ks AS (SELECT *, coalesce(max(CASE WHEN pass THEN rank END)
           |      OVER (), 0) AS kstar
           |  FROM ok)
           |SELECT g AS event_type, p_num, p_den,
           |  round(CAST(p_num AS DOUBLE) / p_den, 6) AS p_value, rank,
           |  round(CAST(rank AS DOUBLE) * 1 / 4 / m, 6) AS bh_threshold,
           |  rank <= kstar AS is_discovery
           |FROM ks ORDER BY rank""".stripMargin,

      "q403_sigmoid_calibration" -> sigmoidCalibrationOracleSql,

      "q404_hilbert_skipping" -> hilbertSkippingOracleSql,

      // saturation order by avail/w, boundary via the exact integer
      // test, one double division for x*
      "q405_mixture_waterfill" ->
        """WITH dom AS (SELECT source AS dom,
          |    CAST(SUM(n_chars) AS BIGINT) AS avail
          |  FROM documents GROUP BY 1),
          |dw AS (SELECT dom, avail, rn * rn AS w FROM (
          |  SELECT dom, avail, CAST(row_number() OVER (ORDER BY dom)
          |    AS BIGINT) AS rn FROM dom)),
          |pre AS (SELECT dom, avail, w,
          |    CAST(row_number() OVER (ORDER BY CAST(avail AS DOUBLE) / w,
          |      dom) AS BIGINT) AS j,
          |    CAST(coalesce(SUM(avail) OVER (ORDER BY
          |      CAST(avail AS DOUBLE) / w, dom ROWS BETWEEN UNBOUNDED
          |      PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ap,
          |    CAST(coalesce(SUM(w) OVER (ORDER BY
          |      CAST(avail AS DOUBLE) / w, dom ROWS BETWEEN UNBOUNDED
          |      PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS wp,
          |    CAST(SUM(w) OVER () AS BIGINT) AS wtot
          |  FROM dw),
          |st AS (SELECT *, wtot - wp AS wrem,
          |    ap * w + (wtot - wp) * avail >= 600000 * w AS stop
          |  FROM pre),
          |bd AS (SELECT *, min(CASE WHEN stop THEN j END) OVER () AS bj
          |  FROM st),
          |bx AS (SELECT *,
          |    max(CASE WHEN j = bj THEN ap END) OVER () AS ba,
          |    max(CASE WHEN j = bj THEN wrem END) OVER () AS bw
          |  FROM bd),
          |fx AS (SELECT *, CASE WHEN bj IS NOT NULL
          |    THEN CAST(600000 - ba AS DOUBLE) / bw END AS x_star
          |  FROM bx)
          |SELECT dom, avail, w, (bj IS NULL OR j < bj) AS saturated,
          |  CASE WHEN bj IS NULL OR j < bj THEN CAST(avail AS DOUBLE)
          |    ELSE w * x_star END AS alloc, x_star
          |FROM fx ORDER BY dom""".stripMargin,

      "q407_ucb1_replay" -> ucb1OracleSql,

      "q408_ipf_rake" -> ipfRakeOracleSql,

      "q409_bpe_roundtrip" -> bpeRoundtripOracleSql,

      "q410_sprt" -> sprtOracleSql,

      // recentered per-side OLS from exact sums; effect = intercept gap
      "q413_regression_discontinuity" ->
        """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS dmin FROM events),
          |u AS (SELECT user_id,
          |    CAST(SUM(CASE WHEN date_diff('day', dmin, CAST(ts AS DATE))
          |      < 15 THEN 1 ELSE 0 END) AS BIGINT) AS x,
          |    CAST(SUM(CASE WHEN date_diff('day', dmin, CAST(ts AS DATE))
          |      >= 15 THEN coalesce(CAST(round(value * 100) AS BIGINT), 0)
          |      ELSE 0 END) AS BIGINT) AS y
          |  FROM events, d0 GROUP BY user_id),
          |b AS (SELECT x - 33 AS xc, y, x - 33 >= 0 AS side FROM u
          |  WHERE x - 33 >= -12 AND x - 33 < 12),
          |per AS (SELECT side, CAST(count(*) AS BIGINT) AS n,
          |    CAST(SUM(xc) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          |    SUM(CAST(xc AS HUGEINT) * xc) AS sxx,
          |    SUM(CAST(xc AS HUGEINT) * y) AS sxy
          |  FROM b GROUP BY side),
          |co AS (SELECT side, n,
          |    n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS den,
          |    sx, sy, sxy FROM per),
          |fit AS (SELECT side, n,
          |    CASE WHEN den <> 0 THEN (n * CAST(sxy AS DOUBLE) -
          |      CAST(sx AS DOUBLE) * sy) / den END AS slope,
          |    sx, sy, den FROM co),
          |fi AS (SELECT side, n, slope,
          |    CASE WHEN den <> 0
          |      THEN (sy - slope * sx) / n END AS icept
          |  FROM fit)
          |SELECT l.n AS n_left, r.n AS n_right,
          |  round(l.slope, 6) AS slope_left, round(r.slope, 6)
          |    AS slope_right,
          |  round(l.icept, 6) AS icept_left, round(r.icept, 6)
          |    AS icept_right,
          |  round(r.icept - l.icept, 6) AS rd_effect
          |FROM (SELECT * FROM fi WHERE NOT side) l,
          |  (SELECT * FROM fi WHERE side) r""".stripMargin,

      // banded bucket join (score div 2 ± 1), deterministic min-struct
      // match via the rank window, exact integer ATT sums
      "q414_caliper_match" ->
        """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS dmin FROM events),
          |u AS (SELECT user_id AS uid,
          |    CAST(SUM(CASE WHEN date_diff('day', dmin, CAST(ts AS DATE))
          |      < 15 THEN 1 ELSE 0 END) AS BIGINT) AS score,
          |    CAST(SUM(CASE WHEN date_diff('day', dmin, CAST(ts AS DATE))
          |      < 15 AND event_type = 'error' THEN 1 ELSE 0 END)
          |      AS BIGINT) >= 7 AS treated,
          |    CAST(SUM(CASE WHEN date_diff('day', dmin, CAST(ts AS DATE))
          |      >= 15 THEN coalesce(CAST(round(value * 100) AS BIGINT), 0)
          |      ELSE 0 END) AS BIGINT) AS y
          |  FROM events, d0 GROUP BY user_id),
          |ct AS (SELECT uid AS cid, score AS csc, y AS cy,
          |    score // 2 AS cb FROM u WHERE NOT treated),
          |tr AS (SELECT uid, score AS sc, y, score // 2 AS b FROM u
          |  WHERE treated),
          |tx AS (SELECT uid, sc, y, b + i AS cb
          |  FROM tr, unnest([-1, 0, 1]) AS t(i)),
          |cand AS (SELECT uid, sc, y, csc, cid, cy
          |  FROM tx JOIN ct USING (cb) WHERE abs(sc - csc) <= 2),
          |mt AS (SELECT uid, y, cy FROM (
          |    SELECT uid, y, cy, row_number() OVER (PARTITION BY uid
          |      ORDER BY abs(sc - csc), csc, cid) AS rn FROM cand)
          |  WHERE rn = 1),
          |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_treated FROM u
          |  WHERE treated)
          |SELECT n_treated, CAST(count(*) AS BIGINT) AS n_matched,
          |  round(CAST(SUM(y) AS DOUBLE) / count(*), 6) AS mean_treated,
          |  round(CAST(SUM(cy) AS DOUBLE) / count(*), 6)
          |    AS mean_matched_control,
          |  round(CAST(SUM(y - cy) AS DOUBLE) / count(*), 6) AS att
          |FROM mt, nt GROUP BY n_treated""".stripMargin,

      "q415_encoding_advisor" -> encodingAdvisorOracleSql,

      // per-(year, part) exact sums → unit prices → decimal-summed
      // cross products, one division per index
      "q416_price_index" ->
        """WITH li AS (SELECT
          |    CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS VARCHAR) AS yr,
          |    l_partkey AS item,
          |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
          |    CAST(l_quantity AS BIGINT) AS qty
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
          |per AS (SELECT yr, item, CAST(SUM(cents) AS BIGINT) AS v,
          |    CAST(SUM(qty) AS BIGINT) AS q
          |  FROM li GROUP BY 1, 2),
          |up AS (SELECT yr, item, CAST(v AS DOUBLE) / q AS up, q FROM per),
          |b AS (SELECT item, up AS p0, q AS q0 FROM up WHERE yr = '1996'),
          |c AS (SELECT item, up AS p1, q AS q1 FROM up WHERE yr = '1997'),
          |j AS (SELECT CAST(count(*) AS BIGINT) AS n_common_items,
          |    CAST(SUM(CAST(p1 * q0 AS DECIMAL(38,18))) AS DOUBLE) AS l1,
          |    CAST(SUM(CAST(p0 * q0 AS DECIMAL(38,18))) AS DOUBLE) AS l0,
          |    CAST(SUM(CAST(p1 * q1 AS DECIMAL(38,18))) AS DOUBLE) AS pp1,
          |    CAST(SUM(CAST(p0 * q1 AS DECIMAL(38,18))) AS DOUBLE) AS pp0
          |  FROM b JOIN c USING (item))
          |SELECT n_common_items, round(l1 / l0, 6) AS laspeyres,
          |  round(pp1 / pp0, 6) AS paasche,
          |  round(sqrt(l1 / l0 * (pp1 / pp0)), 6) AS fisher
          |FROM j""".stripMargin,

      // per-dim split means (decimal sums), cosine/L2 of the two mean
      // vectors as decimal window rollups, rank by |delta|
      "q417_embedding_drift" ->
        """WITH ex AS (SELECT vec_id % 2 = 0 AS h, CAST(i AS INT) AS dim,
          |    CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS x
          |  FROM embeddings, unnest(range(0, len(embedding))) AS u(i)),
          |bd AS (SELECT dim,
          |    CAST(SUM(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          |    CAST(SUM(CASE WHEN NOT h THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_b,
          |    CAST(SUM(CASE WHEN h THEN CAST(x AS DECIMAL(38,18)) END)
          |      AS DOUBLE) AS sa,
          |    CAST(SUM(CASE WHEN NOT h THEN CAST(x AS DECIMAL(38,18)) END)
          |      AS DOUBLE) AS sb
          |  FROM ex GROUP BY 1),
          |m AS (SELECT dim, n_a, n_b, sa / n_a AS mean_a, sb / n_b
          |    AS mean_b, sa / n_a - sb / n_b AS delta FROM bd),
          |g AS (SELECT *,
          |    CAST(SUM(CAST(mean_a * mean_b AS DECIMAL(38,18))) OVER ()
          |      AS DOUBLE) AS dot,
          |    CAST(SUM(CAST(mean_a * mean_a AS DECIMAL(38,18))) OVER ()
          |      AS DOUBLE) AS na2,
          |    CAST(SUM(CAST(mean_b * mean_b AS DECIMAL(38,18))) OVER ()
          |      AS DOUBLE) AS nb2,
          |    CAST(SUM(CAST(delta * delta AS DECIMAL(38,18))) OVER ()
          |      AS DOUBLE) AS gap2,
          |    CAST(row_number() OVER (ORDER BY abs(delta) DESC, dim)
          |      AS INT) AS rk
          |  FROM m)
          |SELECT rk AS rank, dim, n_a, n_b,
          |  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
          |  round(delta, 6) AS delta,
          |  round(dot / (sqrt(na2) * sqrt(nb2)), 9) AS cos_means,
          |  round(sqrt(gap2), 6) AS l2_gap
          |FROM g WHERE rk <= 8 ORDER BY rank""".stripMargin,

      "q418_diameter_sweep" -> diameterSweepOracleSql,

      "q419_wl_refinement" -> wlRefinementOracleSql,

      "q422_brandes" -> brandesOracleSql,

      "q425_rbo" -> rboOracleSql,

      "q426_join_cardinality" -> joinCardinalityOracleSql,

      "q427_bloom_fpr" -> bloomFprOracleSql,

      "q428_sampled_betweenness" -> sampledBetweennessOracleSql,

      // q414's unit CTE, rank-based equal strata, treated-weighted gaps
      "q431_stratified_att" ->
        """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS dmin FROM events),
          |u AS (SELECT user_id AS uid,
          |    CAST(SUM(CASE WHEN date_diff('day', dmin, CAST(ts AS DATE))
          |      < 15 THEN 1 ELSE 0 END) AS BIGINT) AS sc,
          |    CAST(SUM(CASE WHEN date_diff('day', dmin, CAST(ts AS DATE))
          |      < 15 AND event_type = 'error' THEN 1 ELSE 0 END)
          |      AS BIGINT) >= 7 AS tr,
          |    CAST(SUM(CASE WHEN date_diff('day', dmin, CAST(ts AS DATE))
          |      >= 15 THEN coalesce(CAST(round(value * 100) AS BIGINT), 0)
          |      ELSE 0 END) AS BIGINT) AS y
          |  FROM events, d0 GROUP BY user_id),
          |rk AS (SELECT uid, tr, y,
          |    CAST(row_number() OVER (ORDER BY sc, uid) AS BIGINT) AS rn,
          |    CAST(count(*) OVER () AS BIGINT) AS n FROM u),
          |st AS (SELECT CAST(((rn - 1) * 5) // n AS INT) AS stratum,
          |    tr, y FROM rk),
          |per AS (SELECT stratum,
          |    CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
          |    CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_c,
          |    CAST(SUM(CASE WHEN tr THEN y ELSE 0 END) AS BIGINT) AS s_t,
          |    CAST(SUM(CASE WHEN NOT tr THEN y ELSE 0 END) AS BIGINT)
          |      AS s_c
          |  FROM st GROUP BY stratum),
          |g AS (SELECT stratum, n_t, n_c,
          |    CASE WHEN n_t > 0 THEN CAST(s_t AS DOUBLE) / n_t END
          |      AS mean_t,
          |    CASE WHEN n_c > 0 THEN CAST(s_c AS DOUBLE) / n_c END
          |      AS mean_c
          |  FROM per),
          |gg AS (SELECT *, mean_t - mean_c AS gap FROM g),
          |ww AS (SELECT *,
          |    CAST(SUM(CASE WHEN gap IS NOT NULL THEN n_t ELSE 0 END)
          |      OVER () AS BIGINT) AS wt,
          |    CAST(SUM(CASE WHEN gap IS NOT NULL
          |      THEN CAST(n_t * gap AS DECIMAL(38,18)) END) OVER ()
          |      AS DOUBLE) AS wsum
          |  FROM gg)
          |SELECT stratum, n_t, n_c, round(mean_t, 6) AS mean_t,
          |  round(mean_c, 6) AS mean_c, round(gap, 6) AS gap,
          |  round(wsum / wt, 6) AS att_strat
          |FROM ww ORDER BY stratum""".stripMargin,

      // exact nearest-rank thresholds, integer excess sums
      "q432_mean_excess" ->
        """WITH v AS (SELECT event_id AS id,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events WHERE value IS NOT NULL),
          |rk AS (SELECT id, v, CAST(row_number() OVER (ORDER BY v, id)
          |      AS BIGINT) AS rn,
          |    CAST(count(*) OVER () AS BIGINT) AS n FROM v),
          |th AS (SELECT s.p, rk.v AS u, rk.n
          |  FROM (SELECT unnest([90, 95, 99]) AS p) s
          |  JOIN rk ON rk.rn = (s.p * rk.n + 99) // 100)
          |SELECT CAST(th.p AS INT) AS pct, th.u AS threshold,
          |  CAST(count(*) AS BIGINT) AS n_exceed,
          |  round(CAST(SUM(rk.v - th.u) AS DOUBLE) / count(*), 6)
          |    AS mean_excess,
          |  round(CAST(count(*) AS DOUBLE) / max(th.n), 6) AS exceed_frac
          |FROM th JOIN rk ON rk.v > th.u
          |GROUP BY th.p, th.u ORDER BY pct""".stripMargin,

      // top-20 corpus words, per-mille per-source frequencies with
      // genuine zeros, cross-source z-scores, pairwise mean |Δz|
      "q434_burrows_delta" ->
        """WITH toks AS (SELECT source AS src,
          |    unnest(list_filter(regexp_split_to_array(lower(text),
          |      '\s+'), x -> x <> '')) AS tok
          |  FROM documents),
          |tc AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS c
          |  FROM toks GROUP BY 1, 2),
          |vocab AS (SELECT tok FROM (SELECT tok,
          |      CAST(SUM(c) AS BIGINT) AS cf FROM tc GROUP BY tok)
          |  ORDER BY cf DESC, tok LIMIT 20),
          |tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS nt FROM tc
          |  GROUP BY src),
          |grid AS (SELECT tot.src, vocab.tok,
          |    CAST(coalesce(tc.c, 0) AS DOUBLE) * 1000.0 / tot.nt AS f
          |  FROM vocab CROSS JOIN tot
          |  LEFT JOIN tc ON tc.src = tot.src AND tc.tok = vocab.tok),
          |st AS (SELECT tok, CAST(count(*) AS BIGINT) AS ns,
          |    CAST(SUM(CAST(f AS DECIMAL(38,18))) AS DOUBLE) AS s1,
          |    CAST(SUM(CAST(f * f AS DECIMAL(38,18))) AS DOUBLE) AS s2
          |  FROM grid GROUP BY tok),
          |sm AS (SELECT tok, s1 / ns AS mu,
          |    sqrt(greatest(CAST(0.0 AS DOUBLE),
          |      (s2 - s1 * s1 / ns) / ns)) AS sd
          |  FROM st),
          |z AS (SELECT grid.src, grid.tok, (f - mu) / sd AS z
          |  FROM grid JOIN sm ON grid.tok = sm.tok WHERE sd > 0),
          |pr AS (SELECT a.src AS sa, b.src AS sb,
          |    CAST(count(*) AS BIGINT) AS n_words,
          |    CAST(SUM(CAST(abs(a.z - b.z) AS DECIMAL(38,18)))
          |      AS DOUBLE) / count(*) AS delta
          |  FROM z a JOIN z b ON a.tok = b.tok AND a.src < b.src
          |  GROUP BY 1, 2)
          |SELECT CAST(rk AS INT) AS rank, sa, sb, n_words,
          |  round(delta, 6) AS delta
          |FROM (SELECT *, row_number() OVER (ORDER BY delta, sa, sb)
          |    AS rk FROM pr)
          |WHERE rk <= 10 ORDER BY rank""".stripMargin,

      // lead-window triples within the session gap, count + share
      "q435_frequent_paths" ->
        """WITH e AS (SELECT user_id, event_id,
          |    CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
          |l AS (SELECT event_type,
          |    lead(event_type, 1) OVER w AS t1,
          |    lead(event_type, 2) OVER w AS t2,
          |    epoch_us(lead(ts, 1) OVER w) - epoch_us(ts) AS g1,
          |    epoch_us(lead(ts, 2) OVER w) - epoch_us(lead(ts, 1) OVER w)
          |      AS g2
          |  FROM e
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |p AS (SELECT event_type || '>' || t1 || '>' || t2 AS path
          |  FROM l WHERE t2 IS NOT NULL AND g1 <= 1800000000
          |    AND g2 <= 1800000000),
          |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p
          |  GROUP BY path),
          |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
          |SELECT CAST(rk AS INT) AS rank, path, n,
          |  round(CAST(n AS DOUBLE) / tot, 6) AS share
          |FROM (SELECT *, row_number() OVER (ORDER BY n DESC, path)
          |    AS rk FROM c, tt)
          |WHERE rk <= 10 ORDER BY rank""".stripMargin,

      // shifted self-join per lag, exact moments, closed-form Pearson
      "q436_acf" -> acfOracleSql,

      // full American-Soundex replay: translate → per-digit run collapse
      // (RE2 has no backreferences) → strip zeros → pad to 4
      "q437_soundex_blocks" -> soundexOracleSql,

      // bigram multiset intersection per candidate pair replays the
      // native expression: 2·Σ min(cnt) / (m+n), one double division
      "q438_dice_typo_match" ->
        """WITH v0 AS (
          |  SELECT unnest(list_filter(regexp_split_to_array(
          |      lower(p_name), '[^a-z]+'), x -> x <> '')) AS w FROM part
          |  UNION ALL
          |  SELECT unnest(list_filter(regexp_split_to_array(
          |      lower(text), '[^a-z]+'), x -> x <> '')) FROM documents),
          |vocab AS (SELECT DISTINCT w FROM v0 WHERE length(w) >= 4),
          |variants AS (SELECT w AS orig,
          |    substr(w, 1, 1) || substr(w, 3) AS typo FROM vocab),
          |cand AS (SELECT va.orig, va.typo, v.w
          |  FROM variants va JOIN vocab v
          |    ON substr(va.typo, 1, 1) = substr(v.w, 1, 1)),
          |tb AS (SELECT typo, unnest(list_transform(
          |    range(1, length(typo)),
          |    i -> substr(typo, CAST(i AS INT), 2))) AS g
          |  FROM (SELECT DISTINCT typo FROM variants) t),
          |tbc AS (SELECT typo, g, count(*) AS c FROM tb GROUP BY 1, 2),
          |wb AS (SELECT w, unnest(list_transform(range(1, length(w)),
          |    i -> substr(w, CAST(i AS INT), 2))) AS g FROM vocab),
          |wbc AS (SELECT w, g, count(*) AS c FROM wb GROUP BY 1, 2),
          |inter AS (SELECT t.typo, v.w,
          |    CAST(SUM(LEAST(t.c, v.c)) AS BIGINT) AS i
          |  FROM tbc t JOIN wbc v ON t.g = v.g GROUP BY 1, 2),
          |scored AS (SELECT c.orig, c.typo, c.w,
          |    2.0 * coalesce(i.i, 0) /
          |      (length(c.typo) - 1 + length(c.w) - 1) AS dice
          |  FROM cand c LEFT JOIN inter i
          |    ON i.typo = c.typo AND i.w = c.w),
          |best AS (SELECT *, row_number() OVER (PARTITION BY orig
          |    ORDER BY dice DESC, w) AS rk FROM scored)
          |SELECT orig, typo, w AS best_match, round(dice, 6) AS dice,
          |  (w = orig) AS recovered
          |FROM best WHERE rk = 1 ORDER BY orig""".stripMargin,

      // additive hazard over the q251 life table: decimal cumulative
      // sums of one-division step terms; NULL variance factor at n==d
      "q439_nelson_aalen" ->
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
          |st AS (SELECT t, n_at_risk, d,
          |    CAST(d AS DOUBLE) / n_at_risk AS h,
          |    CASE WHEN n_at_risk > d THEN
          |      CAST(d AS DOUBLE) / (n_at_risk * (n_at_risk - d)) END
          |      AS gv
          |  FROM ar WHERE d > 0)
          |SELECT t, n_at_risk, d AS n_events,
          |  round(CAST(SUM(CAST(h AS DECIMAL(38,18)))
          |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
          |      CURRENT ROW) AS DOUBLE), 6) AS cum_hazard,
          |  round(CAST(SUM(CAST(gv AS DECIMAL(38,18)))
          |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
          |      CURRENT ROW) AS DOUBLE), 6) AS greenwood_var
          |FROM st ORDER BY t""".stripMargin,

      // midranks as exact 2·rank ints over the value histogram; H and
      // its tie correction assembled from exact BIGINT/decimal moments
      "q440_kruskal_wallis" ->
        """WITH base AS (SELECT l_returnflag AS g,
          |    CAST(l_quantity AS BIGINT) AS v FROM lineitem),
          |pv AS (SELECT v, CAST(count(*) AS BIGINT) AS t FROM base
          |  GROUP BY v),
          |rk AS (SELECT v, t, 2 * CAST(coalesce(SUM(t) OVER (ORDER BY v
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |    AS BIGINT) + t + 1 AS r2 FROM pv),
          |gv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n_gv
          |  FROM base GROUP BY 1, 2),
          |gs AS (SELECT g, CAST(SUM(n_gv * r2) AS BIGINT) AS s2,
          |    CAST(SUM(n_gv) AS BIGINT) AS n_g
          |  FROM gv JOIN rk USING (v) GROUP BY g),
          |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS nn,
          |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie FROM pv),
          |terms AS (SELECT nn, tie,
          |    CAST(CAST(s2 AS DECIMAL(38,0)) * s2 AS DOUBLE) / 4.0 / n_g
          |      AS term
          |  FROM gs, tot),
          |ag AS (SELECT nn, tie, count(*) AS k,
          |    CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE) AS s
          |  FROM terms GROUP BY nn, tie),
          |hh AS (SELECT nn, tie, k,
          |    12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * s -
          |      3.0 * (CAST(nn AS DOUBLE) + 1) AS h,
          |    1.0 - CAST(tie AS DOUBLE) /
          |      (CAST(nn AS DOUBLE) * nn * nn - nn) AS c
          |  FROM ag)
          |SELECT nn AS n, k, k - 1 AS df, round(h, 6) AS h,
          |  CASE WHEN c > 0 THEN round(h / c, 6) END AS h_adj
          |FROM hh""".stripMargin,

      // gaps-and-islands replay of the native session_window: break at
      // gap >= 30 min, island id = cumulative break count
      "q441_session_window" ->
        """WITH e AS (SELECT user_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
          |l AS (SELECT user_id, us,
          |    lag(us) OVER (PARTITION BY user_id ORDER BY us) AS pus
          |  FROM e),
          |f AS (SELECT user_id, us, CASE WHEN pus IS NULL OR
          |      us - pus >= 1800000000 THEN 1 ELSE 0 END AS brk
          |  FROM l),
          |s AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id
          |    ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM f),
          |g AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_ev,
          |    min(us) AS t0, max(us) AS t1
          |  FROM s GROUP BY 1, 2)
          |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
          |  CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_singleton,
          |  max(n_ev) AS max_events,
          |  round(CAST(SUM(n_ev) AS DOUBLE) / count(*), 6) AS avg_events,
          |  round(CAST(SUM(t1 - t0) AS DOUBLE) / count(*) / 1000000.0, 6)
          |    AS avg_duration_s
          |FROM g""".stripMargin,

      // histogram-read lower medians, exact integer deviations, F from
      // the sum-of-squares identities
      "q442_brown_forsythe" ->
        """WITH base AS (SELECT l_returnflag AS g,
          |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v
          |  FROM lineitem),
          |hist AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
          |  FROM base GROUP BY 1, 2),
          |cums AS (SELECT g, v, c,
          |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n_g
          |  FROM hist),
          |med AS (SELECT g, min(v) AS m, max(n_g) AS n_g FROM cums
          |  WHERE cum >= (n_g + 1) // 2 GROUP BY g),
          |zt AS (SELECT h.g, max(med.n_g) AS n_g,
          |    CAST(SUM(h.c * abs(h.v - med.m)) AS BIGINT) AS sz,
          |    SUM(CAST(h.c AS DECIMAL(38,0)) * abs(h.v - med.m) *
          |      abs(h.v - med.m)) AS szz
          |  FROM hist h JOIN med ON h.g = med.g GROUP BY h.g),
          |parts AS (SELECT g, n_g, sz,
          |    CAST(CAST(sz AS DECIMAL(38,0)) * sz AS DOUBLE) / n_g
          |      AS between_t,
          |    CAST(szz AS DOUBLE) -
          |      CAST(CAST(sz AS DECIMAL(38,0)) * sz AS DOUBLE) / n_g
          |      AS within_t
          |  FROM zt),
          |ag AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n, count(*) AS k,
          |    CAST(SUM(CAST(between_t AS DECIMAL(38,18))) AS DOUBLE)
          |      AS b,
          |    CAST(SUM(CAST(within_t AS DECIMAL(38,18))) AS DOUBLE)
          |      AS w,
          |    CAST(SUM(sz) AS BIGINT) AS s_all
          |  FROM parts),
          |bs AS (SELECT n, k, b - CAST(CAST(s_all AS DECIMAL(38,0)) *
          |      s_all AS DOUBLE) / n AS bss, w
          |  FROM ag)
          |SELECT ag.n, ag.k, ag.k - 1 AS df1, ag.n - ag.k AS df2,
          |  CASE WHEN bs.w > 0 AND ag.k > 1 THEN
          |    round((bs.bss / (CAST(ag.k AS DOUBLE) - 1)) /
          |      (bs.w / (CAST(ag.n AS DOUBLE) - ag.k)), 6) END AS f
          |FROM ag, bs""".stripMargin,

      // directed KL-to-midpoint sums over each source's own vocabulary
      // (left join for the other count), symmetrized as (x+y)/2
      "q443_jensen_shannon" ->
        """WITH toks AS (SELECT source AS src,
          |    unnest(list_filter(regexp_split_to_array(lower(text),
          |      '\s+'), x -> x <> '')) AS tok
          |  FROM documents),
          |tc AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS c
          |  FROM toks GROUP BY 1, 2),
          |tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS nt FROM tc
          |  GROUP BY src),
          |a AS (SELECT tc.src AS sa, tok, c AS ca, nt AS na
          |  FROM tc JOIN tot ON tc.src = tot.src),
          |o1 AS (SELECT a.sa, bt.src AS sb, a.tok, a.ca, a.na,
          |    bc.c AS cb, bt.nt AS nb
          |  FROM a JOIN tot bt ON bt.src <> a.sa
          |  LEFT JOIN tc bc ON bc.src = bt.src AND bc.tok = a.tok),
          |terms AS (SELECT sa, sb,
          |    CAST(ca AS DOUBLE) / na AS pa,
          |    CAST(coalesce(cb, 0) AS DOUBLE) / nb AS qb
          |  FROM o1),
          |t AS (SELECT sa, sb,
          |    SUM(CAST(pa * ln(2.0 * pa / (pa + qb)) AS DECIMAL(38,18)))
          |      AS t,
          |    CAST(count(*) AS BIGINT) AS n_terms
          |  FROM terms GROUP BY 1, 2)
          |SELECT x.sa, x.sb, x.n_terms + y.n_terms AS n_terms,
          |  round((CAST(x.t AS DOUBLE) + CAST(y.t AS DOUBLE)) / 2.0, 6)
          |    AS jsd
          |FROM t x JOIN t y ON y.sa = x.sb AND y.sb = x.sa
          |WHERE x.sa < x.sb ORDER BY x.sa, x.sb""".stripMargin,

      // islands: day − row_number constant on consecutive-day runs
      "q444_longest_streaks" ->
        """WITH d AS (SELECT DISTINCT user_id,
          |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |      AS day
          |  FROM events),
          |i AS (SELECT user_id, day,
          |    day - row_number() OVER (PARTITION BY user_id
          |      ORDER BY day) AS grp
          |  FROM d),
          |runs AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
          |  FROM i GROUP BY 1, 2)
          |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
          |  max(len) AS longest_streak
          |FROM runs GROUP BY user_id
          |ORDER BY longest_streak DESC, user_id LIMIT 20""".stripMargin,

      // deterministic quintiles: ntile(5) over (metric, user) both
      // engines split ceil-first identically
      "q445_rfm_segments" ->
        """WITH per AS (SELECT user_id,
          |    max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)))
          |      AS last_day,
          |    CAST(count(*) AS BIGINT) AS freq,
          |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |      AS cents
          |  FROM events GROUP BY user_id),
          |gm AS (SELECT max(last_day) AS gd FROM per),
          |sc AS (SELECT user_id, freq, cents, gd - last_day AS recency
          |  FROM per, gm),
          |nt AS (SELECT cents,
          |    ntile(5) OVER (ORDER BY recency, user_id) AS r,
          |    ntile(5) OVER (ORDER BY freq DESC, user_id) AS f,
          |    ntile(5) OVER (ORDER BY cents DESC, user_id) AS m
          |  FROM sc)
          |SELECT CAST(r AS STRING) || CAST(f AS STRING) ||
          |    CAST(m AS STRING) AS rfm_code,
          |  CAST(count(*) AS BIGINT) AS n_entities,
          |  round(CAST(SUM(cents) AS DOUBLE) / count(*) / 100.0, 6)
          |    AS avg_value
          |FROM nt GROUP BY 1 ORDER BY rfm_code""".stripMargin,

      // top-(k+1) order statistics; decimal-accumulated log ratios
      "q446_hill_tail" ->
        """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
          |    AS v, o_orderkey AS tie FROM orders),
          |top AS (SELECT v, row_number() OVER (ORDER BY v DESC, tie)
          |    AS rk FROM v),
          |th AS (SELECT v AS xk FROM top WHERE rk = 501),
          |g AS (SELECT xk, CAST(count(*) AS BIGINT) AS k,
          |    CAST(SUM(CAST(ln(CAST(t.v AS DOUBLE)) -
          |      ln(CAST(xk AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE)
          |      AS s
          |  FROM top t, th WHERE t.rk <= 500 GROUP BY xk)
          |SELECT k, xk AS x_k, round(s / k, 6) AS gamma,
          |  CASE WHEN s > 0 THEN round(1.0 / (s / k), 6) END AS alpha
          |FROM g""".stripMargin,

      // q251's life table, observed-only, median ranks → ln/ln OLS
      "q447_weibull_fit" ->
        """WITH per AS (SELECT user_id,
          |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
          |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
          |  FROM events GROUP BY user_id),
          |gm AS (SELECT max(t1) AS gm FROM per),
          |life AS (SELECT (t1 - t0) // 3600000000 AS t,
          |    t1 < gm - 43200000000 AS observed FROM per, gm),
          |f AS (SELECT t FROM life WHERE observed AND t > 0),
          |r AS (SELECT t, row_number() OVER (ORDER BY t) AS i,
          |    count(*) OVER () AS n FROM f),
          |xy AS (SELECT n, ln(CAST(t AS DOUBLE)) AS x,
          |    ln(-ln(1.0 - (CAST(i AS DOUBLE) - 0.3) / (n + 0.4))) AS y
          |  FROM r),
          |m AS (SELECT n,
          |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(38,18))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy
          |  FROM xy GROUP BY n),
          |sl AS (SELECT n, sx, sy, sxx, syy, sxy,
          |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS shape
          |  FROM m)
          |SELECT CAST(n AS BIGINT) AS n_fail, round(shape, 6) AS shape,
          |  round(exp(-((sy - shape * sx) / n) / shape), 6) AS scale,
          |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
          |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
          |FROM sl""".stripMargin,

      // q101's kNN edges symmetrized; q111's decimal-moment Pearson
      // over endpoint degrees
      "q448_assortativity" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
          |    CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
          |          c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |p AS (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
          |    AND l.vec_id <> r.vec_id),
          |g0 AS (SELECT id, nbr_id FROM (
          |    SELECT id, nbr_id, row_number() OVER (PARTITION BY id
          |      ORDER BY distance, nbr_id) AS rk FROM p) WHERE rk <= 3),
          |und AS (SELECT id AS ea, nbr_id AS eb FROM g0
          |  UNION SELECT nbr_id, id FROM g0),
          |deg AS (SELECT ea, CAST(count(*) AS BIGINT) AS d FROM und
          |  GROUP BY ea),
          |j AS (SELECT und.ea, dx.d AS dx, dy.d AS dy FROM und
          |  JOIN deg dx ON und.ea = dx.ea
          |  JOIN deg dy ON und.eb = dy.ea),
          |st AS (SELECT CAST(count(DISTINCT ea) AS BIGINT) AS n_nodes,
          |    CAST(count(*) AS BIGINT) AS n_edges,
          |    CAST(SUM(CAST(dx AS DECIMAL(24,6))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(dy AS DECIMAL(24,6))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(dx * dx AS DECIMAL(24,6))) AS DOUBLE)
          |      AS sxx,
          |    CAST(SUM(CAST(dy * dy AS DECIMAL(24,6))) AS DOUBLE)
          |      AS syy,
          |    CAST(SUM(CAST(dx * dy AS DECIMAL(24,6))) AS DOUBLE)
          |      AS sxy
          |  FROM j)
          |SELECT n_nodes, n_edges,
          |  round((n_edges * sxy - sx * sy) /
          |    (sqrt(n_edges * sxx - sx * sx) *
          |     sqrt(n_edges * syy - sy * sy)), 12) AS assortativity
          |FROM st""".stripMargin,

      // per-user lead transitions → exact chain counts → decimal term
      // sums; H_max = ln(states)
      "q449_entropy_rate" ->
        """WITH e AS (SELECT user_id, event_id,
          |    CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
          |l AS (SELECT event_type AS s, lead(event_type, 1)
          |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
          |  FROM e),
          |tr AS (SELECT s, t, CAST(count(*) AS BIGINT) AS n_st FROM l
          |  WHERE t IS NOT NULL GROUP BY 1, 2),
          |ps AS (SELECT s, CAST(SUM(n_st) AS BIGINT) AS n_s FROM tr
          |  GROUP BY s),
          |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS nn,
          |    CAST(count(*) AS BIGINT) AS n_states FROM ps),
          |tm AS (SELECT nn, n_states,
          |    -(CAST(n_st AS DOUBLE) / nn) *
          |      ln(CAST(n_st AS DOUBLE) / n_s) AS term
          |  FROM tr JOIN ps USING (s), tot),
          |h AS (SELECT nn, n_states,
          |    CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DOUBLE) AS h
          |  FROM tm GROUP BY 1, 2)
          |SELECT nn AS n_transitions, n_states, round(h, 6) AS h_rate,
          |  round(ln(CAST(n_states AS DOUBLE)), 6) AS h_max,
          |  round(1.0 - h / ln(CAST(n_states AS DOUBLE)), 6)
          |    AS predictability
          |FROM h""".stripMargin,

      // one scan, nine decimal moments, three Pearsons, partial formula
      "q450_partial_correlation" ->
        """WITH m AS (SELECT COUNT(*) AS n,
          |    CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE)
          |      AS sx,
          |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6)))
          |      AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE)
          |      AS sz,
          |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6)))
          |      AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(l_extendedprice * l_extendedprice
          |      AS DECIMAL(24,6))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(24,6)))
          |      AS DOUBLE) AS szz,
          |    CAST(SUM(CAST(l_quantity * l_extendedprice
          |      AS DECIMAL(24,6))) AS DOUBLE) AS sxy,
          |    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(24,6)))
          |      AS DOUBLE) AS sxz,
          |    CAST(SUM(CAST(l_extendedprice * l_discount
          |      AS DECIMAL(24,6))) AS DOUBLE) AS syz
          |  FROM lineitem),
          |r AS (SELECT n,
          |    (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) *
          |      sqrt(n * syy - sy * sy)) AS rxy,
          |    (n * sxz - sx * sz) / (sqrt(n * sxx - sx * sx) *
          |      sqrt(n * szz - sz * sz)) AS rxz,
          |    (n * syz - sy * sz) / (sqrt(n * syy - sy * sy) *
          |      sqrt(n * szz - sz * sz)) AS ryz
          |  FROM m)
          |SELECT n, round(rxy, 12) AS r_xy, round(rxz, 12) AS r_xz,
          |  round(ryz, 12) AS r_yz,
          |  round((rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) *
          |    (1.0 - ryz * ryz)), 12) AS r_xy_given_z
          |FROM r""".stripMargin,

      // scaled-integer residuals n·x − S; exact quadratic forms; runs
      // moments as fixed double trees
      "q451_residual_diagnostics" ->
        """WITH d AS (SELECT event_type AS g,
          |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |      AS BIGINT) AS t,
          |    CAST(count(*) AS BIGINT) AS x
          |  FROM events GROUP BY 1, 2),
          |w AS (SELECT g, t, x,
          |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n,
          |    CAST(SUM(x) OVER (PARTITION BY g) AS BIGINT) AS s
          |  FROM d),
          |e AS (SELECT g, t, n, n * x - s AS e FROM w),
          |l AS (SELECT g, n AS nd, e,
          |    lag(e) OVER (PARTITION BY g ORDER BY t) AS pe,
          |    CASE WHEN e > 0 THEN 1 WHEN e < 0 THEN -1 END AS sgn,
          |    last_value(CASE WHEN e > 0 THEN 1 WHEN e < 0 THEN -1 END
          |        IGNORE NULLS)
          |      OVER (PARTITION BY g ORDER BY t
          |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |      AS psgn
          |  FROM e),
          |ag AS (SELECT g, max(nd) AS n_days,
          |    SUM(CASE WHEN pe IS NOT NULL THEN
          |      CAST(e - pe AS DECIMAL(38,0)) * (e - pe) END) AS sd2,
          |    SUM(CAST(e AS DECIMAL(38,0)) * e) AS se2,
          |    CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS a,
          |    CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS b,
          |    CAST(SUM(CASE WHEN sgn IS NOT NULL AND psgn IS NOT NULL
          |      AND sgn <> psgn THEN 1 ELSE 0 END) + 1 AS BIGINT)
          |      AS runs
          |  FROM l GROUP BY g),
          |z AS (SELECT *, 2.0 * a * b / (a + b) + 1 AS mu,
          |    (2.0 * a * b * (2.0 * a * b - a - b)) /
          |      (CAST(a + b AS DOUBLE) * (a + b) * (a + b - 1)) AS s2
          |  FROM ag)
          |SELECT g AS event_type, n_days, a AS n_pos, b AS n_neg, runs,
          |  CASE WHEN se2 > 0 THEN
          |    round(CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE), 6) END
          |    AS dw,
          |  CASE WHEN s2 > 0 THEN
          |    round((CAST(runs AS DOUBLE) - mu) / sqrt(s2), 6) END
          |    AS runs_z
          |FROM z ORDER BY event_type""".stripMargin,

      // exact decimal S_g/ΣS_g²/n_g moments, the sum-of-squares
      // identities, one double division per term
      "q452_anova_f" ->
        """WITH base AS (SELECT l_returnflag AS g,
          |    CAST(l_quantity AS BIGINT) AS v FROM lineitem),
          |gs AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g,
          |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_g,
          |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
          |      AS ss_g
          |  FROM base GROUP BY g),
          |ag AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
          |    CAST(count(*) AS BIGINT) AS k,
          |    CAST(SUM(s_g) AS DECIMAL(38,0)) AS s,
          |    CAST(SUM(ss_g) AS DOUBLE) AS ssq,
          |    CAST(SUM(CAST(CAST(CAST(s_g AS DECIMAL(38,0)) * s_g
          |        AS DOUBLE) / n_g AS DECIMAL(38,18))) AS DOUBLE) AS t_sum
          |  FROM gs),
          |fin AS (SELECT n, k,
          |    t_sum - CAST(CAST(s AS DECIMAL(38,0)) * s AS DOUBLE) / n
          |      AS ssb,
          |    ssq - t_sum AS ssw,
          |    ssq - CAST(CAST(s AS DECIMAL(38,0)) * s AS DOUBLE) / n
          |      AS sst
          |  FROM ag)
          |SELECT n, k, k - 1 AS df1, n - k AS df2,
          |  round(ssb, 6) AS ss_between, round(ssw, 6) AS ss_within,
          |  CASE WHEN ssw > 0 AND k > 1 THEN
          |    round((ssb / (k - 1)) / (ssw / (n - k)), 6) END AS f,
          |  CASE WHEN sst > 0 THEN round(ssb / sst, 6) END AS eta_sq
          |FROM fin""".stripMargin,

      // doubled-rank midranks over |d|, tie-corrected z from exact
      // BIGINT terms (×4-cleared variance)
      "q453_wilcoxon_pairs" ->
        """WITH li AS (SELECT l_partkey, year(l_shipdate) AS yr,
          |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
          |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
          |  GROUP BY 1, 2),
          |pr AS (SELECT b.q - a.q AS d
          |  FROM li a JOIN li b ON a.l_partkey = b.l_partkey
          |    AND a.yr = 1996 AND b.yr = 1997),
          |base AS (SELECT d, abs(d) AS ad FROM pr WHERE d <> 0),
          |pv AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
          |    CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS t_pos
          |  FROM base GROUP BY ad),
          |rk AS (SELECT ad, t, t_pos,
          |    2 * CAST(coalesce(SUM(t) OVER (ORDER BY ad
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |      AS BIGINT) + t + 1 AS r2
          |  FROM pv),
          |ag AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
          |    CAST(SUM(t_pos * r2) AS BIGINT) AS s2,
          |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie FROM rk)
          |SELECT n AS n_pairs, CAST(s2 AS DOUBLE) / 2.0 AS w_plus,
          |  CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - tie > 0 THEN
          |    round(CAST(s2 - n * (n + 1) // 2 AS DOUBLE) /
          |      sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tie AS DOUBLE)
          |        / 12.0), 6) END AS z
          |FROM ag""".stripMargin,

      // within-block midranks via rank()−1 (tie-deterministic), the
      // ×4-cleared tie-general chi-square, all-BIGINT until the final
      // divisions
      "q454_friedman" ->
        """WITH cells AS (SELECT
          |    year(l_shipdate) * 12 + month(l_shipdate) AS b,
          |    l_returnflag AS j,
          |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
          |      AS BIGINT) AS v
          |  FROM lineitem GROUP BY 1, 2),
          |kt AS (SELECT CAST(count(DISTINCT j) AS BIGINT) AS k
          |  FROM cells),
          |cb AS (SELECT b FROM cells GROUP BY b
          |  HAVING count(*) = (SELECT k FROM kt)),
          |rk AS (SELECT c.j,
          |    2 * (CAST(rank() OVER (PARTITION BY c.b ORDER BY c.v)
          |      AS BIGINT) - 1) +
          |      CAST(count(*) OVER (PARTITION BY c.b, c.v) AS BIGINT) + 1
          |      AS r2
          |  FROM cells c JOIN cb USING (b)),
          |pj AS (SELECT j, CAST(count(*) AS BIGINT) AS n,
          |    CAST(SUM(r2) AS BIGINT) AS rj2,
          |    CAST(SUM(r2 * r2) AS BIGINT) AS rsq2
          |  FROM rk GROUP BY j),
          |ag AS (SELECT max(n) AS n, (SELECT k FROM kt) AS k,
          |    CAST(SUM((rj2 - n * ((SELECT k FROM kt) + 1)) *
          |      (rj2 - n * ((SELECT k FROM kt) + 1))) AS BIGINT) AS num,
          |    CAST(SUM(rsq2) AS BIGINT) AS ssr2
          |  FROM pj),
          |fin AS (SELECT n, k, num,
          |    ssr2 - n * k * (k + 1) * (k + 1) AS den FROM ag)
          |SELECT n AS n_blocks, k, k - 1 AS df,
          |  CASE WHEN den > 0 THEN
          |    round(CAST((k - 1) * num AS DOUBLE) /
          |      CAST(den AS DOUBLE), 6) END AS chi2_f,
          |  CASE WHEN den > 0 THEN
          |    round(CAST((k - 1) * num AS DOUBLE) / CAST(den AS DOUBLE) /
          |      CAST(n * (k - 1) AS DOUBLE), 6) END AS kendall_w
          |FROM fin""".stripMargin,

      // per-arm exact decimal moments; Wald ratio and pooled-variance
      // first-stage F as fixed double trees
      "q455_iv_wald" ->
        """WITH ue AS (SELECT user_id,
          |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
          |      END) AS BIGINT) AS x,
          |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |      AS y,
          |    user_id % 2 AS z
          |  FROM events GROUP BY user_id),
          |side AS (SELECT z, CAST(count(*) AS BIGINT) AS n,
          |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx
          |  FROM ue GROUP BY z),
          |pr AS (SELECT a.n AS n_a, b.n AS n_b,
          |    a.sx / a.n - b.sx / b.n AS fs,
          |    a.sy / a.n - b.sy / b.n AS rf,
          |    ((a.sxx - a.sx * a.sx / a.n) + (b.sxx - b.sx * b.sx / b.n))
          |      / (a.n + b.n - 2) AS sp2
          |  FROM side a, side b WHERE a.z = 1 AND b.z = 0)
          |SELECT n_a AS n_encouraged, n_b AS n_control,
          |  round(fs, 6) AS first_stage, round(rf, 6) AS reduced_form,
          |  CASE WHEN fs <> 0 THEN round(rf / fs, 6) END AS beta_iv,
          |  CASE WHEN sp2 > 0 AND n_a + n_b > 2 THEN
          |    round((fs * fs) / (sp2 * (CAST(1 AS DOUBLE) / n_a +
          |      CAST(1 AS DOUBLE) / n_b)), 6) END AS first_stage_f
          |FROM pr""".stripMargin,

      // complete user×type grid; the k²-cleared all-BIGINT Q
      "q456_cochran_q" ->
        """WITH obs AS (SELECT user_id, event_type, 1 AS x FROM events
          |  GROUP BY 1, 2),
          |u AS (SELECT DISTINCT user_id FROM events),
          |t AS (SELECT DISTINCT event_type FROM events),
          |grid AS (SELECT u.user_id AS b, t.event_type AS j,
          |    CAST(coalesce(o.x, 0) AS BIGINT) AS x
          |  FROM u CROSS JOIN t LEFT JOIN obs o
          |    ON o.user_id = u.user_id AND o.event_type = t.event_type),
          |kt AS (SELECT CAST(count(DISTINCT j) AS BIGINT) AS k FROM grid),
          |rb AS (SELECT b, CAST(SUM(x) AS BIGINT) AS r FROM grid
          |  GROUP BY b),
          |tot AS (SELECT (SELECT k FROM kt) AS k,
          |    CAST(SUM(r) AS BIGINT) AS nn,
          |    CAST(SUM(r * r) AS BIGINT) AS rr,
          |    CAST(count(*) AS BIGINT) AS n_blocks,
          |    CAST(SUM(CASE WHEN r > 0 AND r < (SELECT k FROM kt)
          |      THEN 1 ELSE 0 END) AS BIGINT) AS n_informative
          |  FROM rb),
          |cj AS (SELECT j, CAST(SUM(x) AS BIGINT) AS c FROM grid
          |  GROUP BY j),
          |ag AS (SELECT k, nn, rr, n_blocks, n_informative,
          |    CAST(SUM((k * c - nn) * (k * c - nn)) AS BIGINT) AS num
          |  FROM cj, tot GROUP BY 1, 2, 3, 4, 5)
          |SELECT n_blocks, n_informative, k, k - 1 AS df,
          |  CASE WHEN k * (k * nn - rr) > 0 THEN
          |    round(CAST((k - 1) * num AS DOUBLE) /
          |      CAST(k * (k * nn - rr) AS DOUBLE), 6) END AS q
          |FROM ag""".stripMargin,

      // per-arm moments once; pairs on arm_a < arm_b; J is the rational
      // Hedges correction (no gamma), every tree fixed
      "q457_effect_sizes" ->
        """WITH gs AS (SELECT l_returnflag AS arm,
          |    CAST(count(*) AS BIGINT) AS n,
          |    CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0)))
          |      AS DOUBLE) AS sv,
          |    CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))
          |      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS svv
          |  FROM lineitem GROUP BY 1),
          |pr AS (SELECT a.arm AS arm_a, b.arm AS arm_b,
          |    a.n AS n_a, b.n AS n_b,
          |    a.sv / a.n AS m_a, b.sv / b.n AS m_b,
          |    (a.svv - a.sv * a.sv / a.n) / (a.n - 1) AS v_a,
          |    (b.svv - b.sv * b.sv / b.n) / (b.n - 1) AS v_b
          |  FROM gs a JOIN gs b ON a.arm < b.arm),
          |fin AS (SELECT arm_a, arm_b, n_a, n_b, m_a, m_b,
          |    ((n_a - 1) * v_a + (n_b - 1) * v_b) / (n_a + n_b - 2)
          |      AS sp2,
          |    CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE) /
          |      (CAST(4 AS DOUBLE) * (n_a + n_b - 2) - CAST(1 AS DOUBLE))
          |      AS j
          |  FROM pr)
          |SELECT arm_a, arm_b, n_a, n_b,
          |  round(m_a, 6) AS mean_a, round(m_b, 6) AS mean_b,
          |  CASE WHEN sp2 > 0 THEN
          |    round((m_a - m_b) / sqrt(sp2), 6) END AS cohen_d,
          |  CASE WHEN sp2 > 0 THEN
          |    round(j * ((m_a - m_b) / sqrt(sp2)), 6) END AS hedges_g
          |FROM fin ORDER BY arm_a, arm_b""".stripMargin,

      "q458_harmonic_centrality" -> harmonicCentralityOracleSql,

      // i < j day pairs; ratio comparisons by decimal cross-product,
      // every count an exact BIGINT
      "q459_kendall_tau" ->
        """WITH d AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
          |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
          |    CAST(count(*) AS BIGINT) AS x,
          |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
          |      AS BIGINT) AS sn
          |  FROM orders GROUP BY 1),
          |p AS (SELECT a.x - b.x AS dx,
          |    CAST(a.sn AS DECIMAL(38,0)) * b.x -
          |      CAST(b.sn AS DECIMAL(38,0)) * a.x AS cy
          |  FROM d a JOIN d b ON a.t < b.t),
          |ct AS (SELECT
          |    CAST(SUM(CASE WHEN (dx > 0 AND cy > 0) OR
          |      (dx < 0 AND cy < 0) THEN 1 ELSE 0 END) AS BIGINT) AS c,
          |    CAST(SUM(CASE WHEN (dx > 0 AND cy < 0) OR
          |      (dx < 0 AND cy > 0) THEN 1 ELSE 0 END) AS BIGINT) AS dd,
          |    CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n1,
          |    CAST(SUM(CASE WHEN cy = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n2
          |  FROM p),
          |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
          |SELECT n, n * (n - 1) // 2 AS n0, c AS concordant,
          |  dd AS discordant, n1 AS ties_x, n2 AS ties_y,
          |  CASE WHEN (n * (n - 1) // 2 - n1) * (n * (n - 1) // 2 - n2)
          |      > 0 THEN
          |    round(CAST(c - dd AS DOUBLE) /
          |      sqrt(CAST((n * (n - 1) // 2 - n1) *
          |        (n * (n - 1) // 2 - n2) AS DOUBLE)), 6) END AS tau_b
          |FROM nn, ct""".stripMargin,

      // integer centering e = n·x − S; ρ_k from decimal sums with one
      // double division; Durbin-Levinson as a fixed double tree
      "q460_pacf" ->
        """WITH dd AS (SELECT event_type AS g,
          |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |      AS BIGINT) AS t,
          |    CAST(count(*) AS BIGINT) AS v
          |  FROM events GROUP BY 1, 2),
          |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
          |    CAST(SUM(v) AS BIGINT) AS s FROM dd GROUP BY g),
          |e AS (SELECT dd.g, dd.t, tot.n, tot.n * dd.v - tot.s AS e
          |  FROM dd JOIN tot USING (g)),
          |c0 AS (SELECT g, max(n) AS n,
          |    CAST(SUM(CAST(e AS DECIMAL(38,0)) * e) AS DECIMAL(38,0))
          |      AS c0
          |  FROM e GROUP BY g),
          |c1 AS (SELECT a.g, CAST(SUM(CAST(a.e AS DECIMAL(38,0)) * b.e)
          |    AS DECIMAL(38,0)) AS c1
          |  FROM e a JOIN e b ON a.g = b.g AND b.t = a.t + 1 GROUP BY 1),
          |c2 AS (SELECT a.g, CAST(SUM(CAST(a.e AS DECIMAL(38,0)) * b.e)
          |    AS DECIMAL(38,0)) AS c2
          |  FROM e a JOIN e b ON a.g = b.g AND b.t = a.t + 2 GROUP BY 1),
          |c3 AS (SELECT a.g, CAST(SUM(CAST(a.e AS DECIMAL(38,0)) * b.e)
          |    AS DECIMAL(38,0)) AS c3
          |  FROM e a JOIN e b ON a.g = b.g AND b.t = a.t + 3 GROUP BY 1),
          |r AS (SELECT c0.g, c0.n,
          |    CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
          |    CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2,
          |    CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r3
          |  FROM c0 JOIN c1 USING (g) JOIN c2 USING (g) JOIN c3 USING (g)
          |  WHERE c0 > 0),
          |f AS (SELECT *, CASE WHEN 1e0 - r1 * r1 <> 0 THEN
          |    (r2 - r1 * r1) / (1e0 - r1 * r1) END AS p22 FROM r),
          |f2 AS (SELECT *, r1 * (1e0 - p22) AS p21 FROM f),
          |f3 AS (SELECT *, 1e0 - p21 * r1 - p22 * r2 AS p33den FROM f2)
          |SELECT g AS event_type, n AS n_periods,
          |  round(r1, 6) AS rho1, round(r2, 6) AS rho2,
          |  round(r3, 6) AS rho3, round(r1, 6) AS pacf1,
          |  round(p22, 6) AS pacf2,
          |  round(CASE WHEN p33den <> 0 THEN
          |    (r3 - p21 * r2 - p22 * r1) / p33den END, 6) AS pacf3
          |FROM f3 ORDER BY event_type""".stripMargin,

      "q461_holt_winters" -> holtWintersOracleSql,

      // i < j sign pairs; tie-corrected variance; all BIGINT until the
      // final /18 and the continuity-corrected z
      "q462_mann_kendall" ->
        """WITH d AS (SELECT event_type AS g,
          |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |      AS BIGINT) AS t,
          |    CAST(count(*) AS BIGINT) AS v
          |  FROM events GROUP BY 1, 2),
          |s AS (SELECT a.g, CAST(SUM(CASE WHEN b.v > a.v THEN 1
          |      WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
          |  FROM d a JOIN d b ON a.g = b.g AND a.t < b.t GROUP BY a.g),
          |tv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS tc FROM d
          |  GROUP BY 1, 2),
          |ti AS (SELECT g, CAST(SUM(tc) AS BIGINT) AS n,
          |    CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie
          |  FROM tv GROUP BY g),
          |f AS (SELECT s.g, ti.n, s.s_stat,
          |    ti.n * (ti.n - 1) * (2 * ti.n + 5) - ti.tie AS var18
          |  FROM s JOIN ti USING (g))
          |SELECT g AS event_type, n AS n_periods, s_stat,
          |  round(CAST(var18 AS DOUBLE) / 18.0, 6) AS var_s,
          |  round(CASE WHEN var18 > 0 THEN
          |    CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) /
          |        sqrt(CAST(var18 AS DOUBLE) / 18.0)
          |      WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) /
          |        sqrt(CAST(var18 AS DOUBLE) / 18.0)
          |      ELSE 0.0 END END, 6) AS z
          |FROM f ORDER BY event_type""".stripMargin,

      // q443's JS pipeline over centroid-cell counts; the assignment
      // replays as the q418 rn=1 argmin
      "q463_semantic_divergence" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
          |    CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |asn AS (SELECT label, centroid_id FROM (
          |    SELECT e.label, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
          |          c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |tc AS (SELECT label AS src, centroid_id AS tok,
          |    CAST(count(*) AS BIGINT) AS c
          |  FROM asn GROUP BY 1, 2),
          |tot AS (SELECT src, CAST(SUM(c) AS BIGINT) AS nt FROM tc
          |  GROUP BY src),
          |a AS (SELECT tc.src AS sa, tok, c AS ca, nt AS na
          |  FROM tc JOIN tot ON tc.src = tot.src),
          |o1 AS (SELECT a.sa, bt.src AS sb, a.tok, a.ca, a.na,
          |    bc.c AS cb, bt.nt AS nb
          |  FROM a JOIN tot bt ON bt.src <> a.sa
          |  LEFT JOIN tc bc ON bc.src = bt.src AND bc.tok = a.tok),
          |terms AS (SELECT sa, sb,
          |    CAST(ca AS DOUBLE) / na AS pa,
          |    CAST(coalesce(cb, 0) AS DOUBLE) / nb AS qb
          |  FROM o1),
          |t AS (SELECT sa, sb,
          |    SUM(CAST(pa * ln(2.0 * pa / (pa + qb)) AS DECIMAL(38,18)))
          |      AS t,
          |    CAST(count(*) AS BIGINT) AS n_terms
          |  FROM terms GROUP BY 1, 2)
          |SELECT x.sa, x.sb, x.n_terms + y.n_terms AS n_terms,
          |  round((CAST(x.t AS DOUBLE) + CAST(y.t AS DOUBLE)) / 2.0, 6)
          |    AS jsd
          |FROM t x JOIN t y ON y.sa = x.sb AND y.sb = x.sa
          |WHERE x.sa < x.sb ORDER BY x.sa, x.sb""".stripMargin,

      // exact lower medians off cumulative histograms at every level;
      // nothing row-sorted
      "q464_shard_median_bias" ->
        """WITH h AS (SELECT o_orderkey % 8 AS sh,
          |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
          |    CAST(count(*) AS BIGINT) AS c
          |  FROM orders GROUP BY 1, 2),
          |sm AS (SELECT sh, min(v) AS med FROM (
          |    SELECT sh, v,
          |      SUM(c) OVER (PARTITION BY sh ORDER BY v
          |        ROWS UNBOUNDED PRECEDING) AS cum,
          |      SUM(c) OVER (PARTITION BY sh) AS n_sh
          |    FROM h) WHERE cum >= (n_sh + 1) // 2 GROUP BY sh),
          |mm AS (SELECT min(med) AS med_of_meds,
          |    CAST(max(k) AS BIGINT) AS n_shards FROM (
          |    SELECT med,
          |      SUM(1) OVER (ORDER BY med ROWS UNBOUNDED PRECEDING) AS rk,
          |      count(*) OVER () AS k FROM sm)
          |  WHERE rk >= (k + 1) // 2),
          |g AS (SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM h GROUP BY v),
          |tm AS (SELECT min(v) AS true_median,
          |    CAST(max(n) AS BIGINT) AS n_rows FROM (
          |    SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
          |      AS cum, SUM(c) OVER () AS n FROM g)
          |  WHERE cum >= (n + 1) // 2)
          |SELECT n_rows, n_shards, med_of_meds, true_median,
          |  abs(med_of_meds - true_median) AS abs_err,
          |  CASE WHEN true_median <> 0 THEN
          |    round(CAST(abs(med_of_meds - true_median) AS DOUBLE) /
          |      true_median, 6) END AS rel_err
          |FROM mm, tm""".stripMargin,

      // deterministic top-1000 reference vocab (cf desc, tok asc);
      // occurrence- and type-level OOV per source
      "q465_oov_rate" ->
        """WITH toks AS (SELECT source AS src,
          |    unnest(list_filter(regexp_split_to_array(lower(text),
          |      '\s+'), x -> x <> '')) AS tok
          |  FROM documents),
          |tc AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS c
          |  FROM toks GROUP BY 1, 2),
          |vocab AS (SELECT tok FROM (SELECT tok,
          |      CAST(SUM(c) AS BIGINT) AS cf FROM tc GROUP BY tok)
          |  ORDER BY cf DESC, tok ASC LIMIT 1000),
          |j AS (SELECT tc.src, tc.c,
          |    v.tok IS NOT NULL AS in_vocab
          |  FROM tc LEFT JOIN vocab v USING (tok))
          |SELECT src AS source, CAST(SUM(c) AS BIGINT) AS n_tokens,
          |  CAST(SUM(CASE WHEN NOT in_vocab THEN c ELSE 0 END)
          |    AS BIGINT) AS n_oov,
          |  round(CAST(SUM(CASE WHEN NOT in_vocab THEN c ELSE 0 END)
          |    AS DOUBLE) / SUM(c), 6) AS oov_rate,
          |  CAST(count(*) AS BIGINT) AS n_types,
          |  CAST(SUM(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_oov_types,
          |  round(CAST(SUM(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END)
          |    AS DOUBLE) / count(*), 6) AS type_oov_rate
          |FROM j GROUP BY src ORDER BY src""".stripMargin,

      "q466_goertzel_tone" -> goertzelOracleSql,

      "q467_image_gradients" -> imageGradientsOracleSql,

      "q468_minhash_calibration" -> minhashCalibrationOracleSql,

      "q469_string_encoding_audit" ->
        Seq("p_brand", "p_name", "p_type").map(stringEncodingColSql)
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

      "q470_query_performance" -> qppOracleSql(
        Seq("q_agg" -> Seq("agg", "group", "sort"),
          "q_broad" -> Seq("data", "table"),
          "q_scan" -> Seq("scan", "filter"),
          "q_spark" -> Seq("spark", "join", "vector", "window")),
        k = 10),

      // Aalen-Johansen replay: any-event KM prefix product via the
      // q251 sorted list fold (sentinel factor keeps empty prefixes
      // out of null-land), decimal-cumsum CIFs
      "q471_competing_risks" ->
        """WITH per AS (SELECT user_id,
          |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
          |    max(epoch_us(CAST(ts AS TIMESTAMP))) AS t1
          |  FROM events GROUP BY user_id),
          |fa AS (SELECT user_id,
          |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS ta
          |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          |fb AS (SELECT user_id,
          |    min(epoch_us(CAST(ts AS TIMESTAMP))) AS tb
          |  FROM events WHERE event_type = 'error' GROUP BY user_id),
          |life AS (SELECT
          |    CASE WHEN ta IS NOT NULL AND (tb IS NULL OR ta <= tb)
          |      THEN (ta - t0) // 3600000000
          |    WHEN tb IS NOT NULL THEN (tb - t0) // 3600000000
          |    ELSE (t1 - t0) // 3600000000 END AS t,
          |    CASE WHEN ta IS NOT NULL AND (tb IS NULL OR ta <= tb)
          |      THEN 1 WHEN tb IS NOT NULL THEN 2 ELSE 0 END AS cause
          |  FROM per LEFT JOIN fa USING (user_id)
          |  LEFT JOIN fb USING (user_id)),
          |pt AS (SELECT CAST(t AS BIGINT) AS t, count(*) AS n_all,
          |    CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS d1,
          |    CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS d2
          |  FROM life GROUP BY 1),
          |tt AS (SELECT CAST(SUM(n_all) AS BIGINT) AS N FROM pt),
          |ar AS (SELECT t, d1, d2, N - CAST(coalesce(SUM(n_all)
          |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
          |        AND 1 PRECEDING), 0) AS BIGINT) AS n_at_risk
          |  FROM pt, tt),
          |st AS (SELECT t, n_at_risk, d1, d2,
          |    CAST(n_at_risk - d1 - d2 AS DOUBLE) / n_at_risk AS f
          |  FROM ar WHERE d1 + d2 > 0),
          |fx AS (SELECT t AS u, f FROM st
          |  UNION ALL SELECT -1, CAST(1.0 AS DOUBLE)),
          |sp AS (SELECT a.t, a.n_at_risk, a.d1, a.d2,
          |    list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
          |      list(CAST(b.f AS DOUBLE) ORDER BY b.u)),
          |      (x, y) -> x * y) AS s_prev
          |  FROM st a JOIN fx b ON b.u < a.t
          |  GROUP BY 1, 2, 3, 4),
          |tm AS (SELECT *, s_prev * d1 / n_at_risk AS term1,
          |    s_prev * d2 / n_at_risk AS term2 FROM sp)
          |SELECT t, n_at_risk, d1, d2, s_prev,
          |  round(CAST(SUM(CAST(term1 AS DECIMAL(38,18)))
          |    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE), 9)
          |    AS cif1,
          |  round(CAST(SUM(CAST(term2 AS DECIMAL(38,18)))
          |    OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE), 9)
          |    AS cif2
          |FROM tm ORDER BY t""".stripMargin,

      // exact ×10-cleared pinball losses per grid slope; argmin with
      // smaller-β tie-break
      "q472_quantile_regression" -> {
        val gridSql = (0L to 20L).map(_ * 2500000L).mkString("[", ", ", "]")
        def lossCol(t: Int) =
          s"""CAST(SUM(CASE WHEN r > 0 THEN $t * r
             |      ELSE ($t - 10) * r END) AS BIGINT) AS l$t"""
            .stripMargin
        def pick(t: Int) =
          s"""SELECT CAST(0.$t AS DOUBLE) AS tau, b AS beta,
             |  l$t AS loss10, n
             |FROM (SELECT *, row_number() OVER (ORDER BY l$t, b) AS rk
             |  FROM l) WHERE rk = 1""".stripMargin
        s"""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS x,
           |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
           |      AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |g AS (SELECT x, y, CAST(b AS BIGINT) AS b
           |  FROM d, unnest($gridSql) AS cb(b)),
           |r AS (SELECT b, y - b * x AS r FROM g),
           |l AS (SELECT b, CAST(count(*) AS BIGINT) AS n,
           |    ${Seq(1, 5, 9).map(lossCol).mkString(",\n    ")}
           |  FROM r GROUP BY b)
           |${Seq(1, 5, 9).map(pick).mkString("\nUNION ALL\n")}
           |ORDER BY tau""".stripMargin
      },

      // replace-and-measure occurrence counts; substring semantics
      "q473_blocklist_scan" ->
        """WITH x AS (SELECT source AS src, text AS t, p
          |  FROM documents, unnest(['big', 'error', 'slow']) AS pp(p)),
          |h AS (SELECT src, p,
          |    (length(t) - length(replace(t, p, ''))) // length(p)
          |      AS hits
          |  FROM x)
          |SELECT src, p, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_docs_hit,
          |  CAST(SUM(hits) AS BIGINT) AS total_hits,
          |  round(CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END)
          |    AS DOUBLE) / count(*), 6) AS doc_share
          |FROM h GROUP BY 1, 2 ORDER BY src, p""".stripMargin,

      // per-source octave profile, integer OLS of ilog2(types) on octave
      "q433_zipf_by_source" ->
        """WITH toks AS (SELECT source AS src,
          |    unnest(list_filter(regexp_split_to_array(lower(text),
          |      '\s+'), x -> x <> '')) AS tok
          |  FROM documents),
          |tc AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS c
          |  FROM toks GROUP BY 1, 2),
          |oc AS (SELECT src,
          |    CAST(length(bin(c)) - 1 AS BIGINT) AS o,
          |    CAST(count(*) AS BIGINT) AS types
          |  FROM tc GROUP BY 1, 2),
          |oy AS (SELECT src, o, types,
          |    CAST(length(bin(types)) - 1 AS BIGINT) AS y FROM oc),
          |fit AS (SELECT src, CAST(count(*) AS BIGINT) AS n_octaves,
          |    CAST(SUM(o) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          |    CAST(SUM(o * o) AS BIGINT) AS sxx,
          |    CAST(SUM(o * y) AS BIGINT) AS sxy
          |  FROM oy GROUP BY src),
          |sl AS (SELECT src, n_octaves,
          |    CASE WHEN n_octaves * sxx - sx * sx <> 0
          |      THEN CAST(n_octaves * sxy - sx * sy AS DOUBLE) /
          |        (n_octaves * sxx - sx * sx) END AS slope
          |  FROM fit),
          |tt AS (SELECT src, CAST(SUM(c) AS BIGINT) AS n_tokens,
          |    CAST(count(*) AS BIGINT) AS n_types,
          |    CAST(max(c) AS BIGINT) AS mx
          |  FROM tc GROUP BY src)
          |SELECT sl.src AS source, n_tokens, n_types, n_octaves,
          |  round(slope, 6) AS slope,
          |  round(CAST(mx AS DOUBLE) / n_tokens, 6) AS top_share
          |FROM sl JOIN tt ON sl.src = tt.src ORDER BY source""".stripMargin,

      // rank windows per (type, half), nearest-rank deciles via the
      // integer ceiling, pivoted to a shift table
      "q429_qq_shift" ->
        """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS dmin FROM events),
          |ev AS (SELECT event_type, event_id,
          |    date_diff('day', dmin, CAST(ts AS DATE)) < 15 AS pre,
          |    CAST(round(value * 100) AS BIGINT) AS v
          |  FROM events, d0 WHERE value IS NOT NULL),
          |rk AS (SELECT event_type, pre, v,
          |    CAST(row_number() OVER (PARTITION BY event_type, pre
          |      ORDER BY v, event_id) AS BIGINT) AS rn,
          |    CAST(count(*) OVER (PARTITION BY event_type, pre)
          |      AS BIGINT) AS n
          |  FROM ev),
          |dc AS (SELECT event_type, pre, v, CAST(d AS INT) AS decile
          |  FROM rk, unnest(range(1, 10)) AS u(d)
          |  WHERE rn = (d * n + 9) // 10)
          |SELECT event_type, decile,
          |  max(CASE WHEN pre THEN v END) AS v_pre,
          |  max(CASE WHEN NOT pre THEN v END) AS v_post,
          |  max(CASE WHEN NOT pre THEN v END) -
          |    max(CASE WHEN pre THEN v END) AS shift
          |FROM dc GROUP BY 1, 2 ORDER BY event_type, decile""".stripMargin,

      // one window pass, zigzag widths, integer sums
      "q430_delta_encoding" ->
        """WITH w AS (SELECT
          |    l_orderkey - lag(l_orderkey) OVER o AS d_ok,
          |    l_partkey - lag(l_partkey) OVER o AS d_pk,
          |    l_suppkey - lag(l_suppkey) OVER o AS d_sk
          |  FROM lineitem
          |  WINDOW o AS (ORDER BY l_orderkey, l_linenumber)),
          |a AS (SELECT CAST(count(*) + 1 AS BIGINT) AS n,
          |    CAST(SUM(CASE WHEN d_ok = 0 THEN 0
          |      ELSE length(bin(abs(d_ok) * 2)) END) AS BIGINT) AS sb_ok,
          |    CAST(SUM(CASE WHEN d_ok = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS z_ok,
          |    CAST(max(CASE WHEN d_ok = 0 THEN 0
          |      ELSE length(bin(abs(d_ok) * 2)) END) AS BIGINT) AS mx_ok,
          |    CAST(SUM(CASE WHEN d_pk = 0 THEN 0
          |      ELSE length(bin(abs(d_pk) * 2)) END) AS BIGINT) AS sb_pk,
          |    CAST(SUM(CASE WHEN d_pk = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS z_pk,
          |    CAST(max(CASE WHEN d_pk = 0 THEN 0
          |      ELSE length(bin(abs(d_pk) * 2)) END) AS BIGINT) AS mx_pk,
          |    CAST(SUM(CASE WHEN d_sk = 0 THEN 0
          |      ELSE length(bin(abs(d_sk) * 2)) END) AS BIGINT) AS sb_sk,
          |    CAST(SUM(CASE WHEN d_sk = 0 THEN 1 ELSE 0 END) AS BIGINT)
          |      AS z_sk,
          |    CAST(max(CASE WHEN d_sk = 0 THEN 0
          |      ELSE length(bin(abs(d_sk) * 2)) END) AS BIGINT) AS mx_sk
          |  FROM w WHERE d_ok IS NOT NULL)
          |SELECT 'l_orderkey' AS col_name, n,
          |  round(CAST(sb_ok AS DOUBLE) / (n - 1), 6) AS avg_delta_bits,
          |  round(CAST(z_ok AS DOUBLE) / (n - 1), 6) AS zero_delta_frac,
          |  mx_ok AS max_delta_bits FROM a
          |UNION ALL
          |SELECT 'l_partkey', n, round(CAST(sb_pk AS DOUBLE) / (n - 1), 6),
          |  round(CAST(z_pk AS DOUBLE) / (n - 1), 6), mx_pk FROM a
          |UNION ALL
          |SELECT 'l_suppkey', n, round(CAST(sb_sk AS DOUBLE) / (n - 1), 6),
          |  round(CAST(z_sk AS DOUBLE) / (n - 1), 6), mx_sk FROM a
          |ORDER BY col_name""".stripMargin,

      // exact BIGINT/HUGEINT moments, one division each
      "q423_overdispersion" ->
        """WITH d AS (SELECT event_type AS g, CAST(ts AS DATE) AS day,
          |    CAST(count(*) AS BIGINT) AS v
          |  FROM events GROUP BY 1, 2),
          |a AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
          |    CAST(SUM(v) AS BIGINT) AS s,
          |    SUM(CAST(v AS HUGEINT) * v) AS s2
          |  FROM d GROUP BY g),
          |f AS (SELECT g, n,
          |    CAST(s AS DOUBLE) / n AS mean_v,
          |    (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
          |      AS var_v
          |  FROM a WHERE n > 1 AND s > 0)
          |SELECT g AS event_type, n, round(mean_v, 6) AS mean_v,
          |  round(var_v, 6) AS var_v,
          |  round(var_v / mean_v, 6) AS vmr,
          |  var_v / mean_v > 1.5 AS overdispersed
          |FROM f ORDER BY event_type""".stripMargin,

      // coarse histogram → target bucket → rank-select within it
      "q424_two_pass_median" ->
        """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
          |    AS v FROM orders),
          |rng AS (SELECT min(v) AS mn, max(v) AS mx,
          |    CAST(count(*) AS BIGINT) AS nn FROM v),
          |b AS (SELECT v, least(255, ((v - mn) * 256) // (mx - mn + 1))
          |    AS bin FROM v, rng),
          |h AS (SELECT bin, CAST(count(*) AS BIGINT) AS f FROM b
          |  GROUP BY bin),
          |c AS (SELECT bin, f, CAST(SUM(f) OVER (ORDER BY bin
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |    nn, (nn + 1) // 2 AS k
          |  FROM h, rng),
          |t AS (SELECT bin AS tb, k - (cum - f) AS rk,
          |    f AS n_candidates, nn
          |  FROM c WHERE cum >= k ORDER BY bin LIMIT 1),
          |m AS (SELECT b.v, row_number() OVER (ORDER BY b.v) AS rn,
          |    t.tb, t.rk, t.n_candidates, t.nn
          |  FROM b JOIN t ON b.bin = t.tb)
          |SELECT nn AS n, tb AS coarse_bin, rk AS rank_in_bin,
          |  n_candidates, v AS median,
          |  round(CAST(n_candidates AS DOUBLE) / nn, 6) AS scan_frac
          |FROM m WHERE rn = rk""".stripMargin,

      "q420_match_transitivity" -> matchTransitivityOracleSql,

      // equal-width integer bins, √f, decimal cum, L equal cuts
      "q421_dh_stratify" ->
        """WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
          |    AS cents FROM orders),
          |rng AS (SELECT min(cents) AS mn, max(cents) AS mx FROM v),
          |bn AS (SELECT least(49, ((cents - mn) * 50) // (mx - mn + 1))
          |    AS bin, count(*) AS f, CAST(SUM(cents) AS BIGINT) AS sv
          |  FROM v, rng GROUP BY 1),
          |cw AS (SELECT bin, CAST(f AS BIGINT) AS f, sv,
          |    sqrt(CAST(f AS DOUBLE)) AS sqf FROM bn),
          |cx AS (SELECT bin, f, sv,
          |    CAST(coalesce(SUM(CAST(sqf AS DECIMAL(38,18)))
          |      OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND
          |        1 PRECEDING), 0) AS DOUBLE) AS cum_prev,
          |    CAST(SUM(CAST(sqf AS DECIMAL(38,18))) OVER () AS DOUBLE)
          |      AS total
          |  FROM cw),
          |st AS (SELECT CAST(least(3, CAST(floor(cum_prev * 4 / total)
          |      AS BIGINT)) AS INT) AS stratum, bin, f, sv FROM cx)
          |SELECT stratum, CAST(count(*) AS BIGINT) AS n_bins,
          |  min(bin) AS lo_bin, max(bin) AS hi_bin,
          |  CAST(SUM(f) AS BIGINT) AS n_rows,
          |  round(CAST(SUM(sv) AS DOUBLE) / SUM(f), 6) AS mean_v
          |FROM st GROUP BY stratum ORDER BY stratum""".stripMargin,

      "q411_removal_attribution" -> removalAttributionOracleSql,

      // the q159 scored CTEs shifted to probabilities, per-bin decimal
      // score sums, ECE/MCE as window rollups
      "q412_calibration_error" ->
        s"""$scoredMarginCtes,
           |pp AS (SELECT margin + 0.5 AS p, quality_pass FROM scored),
           |per AS (SELECT CAST(least(greatest(CAST(floor(p * 10) AS INT),
           |      0), 9) AS INT) AS bin,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_pos,
           |    CAST(SUM(CAST(p AS DECIMAL(38,18))) AS DOUBLE) AS ssum
           |  FROM pp GROUP BY 1),
           |gx AS (SELECT bin, n, n_pos, ssum / n AS p_bar,
           |    CAST(n_pos AS DOUBLE) / n AS rate,
           |    abs(ssum / n - CAST(n_pos AS DOUBLE) / n) AS gap
           |  FROM per),
           |wx AS (SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS nn,
           |    CAST(SUM(CAST(n * gap AS DECIMAL(38,18))) OVER ()
           |      AS DOUBLE) AS egap,
           |    MAX(gap) OVER () AS mce
           |  FROM gx)
           |SELECT bin, n, n_pos, round(p_bar, 6) AS p_bar,
           |  round(rate, 6) AS rate, round(gap, 6) AS gap,
           |  round(egap / nn, 6) AS ece, round(mce, 6) AS mce
           |FROM wx ORDER BY bin""".stripMargin,

      // Q-hat per (ctx, arm) from the even split, greedy policy, DR
      // terms decimal-accumulated on the odd split
      "q406_doubly_robust" ->
        """WITH ev AS (SELECT event_type AS ctx, user_id % 3 AS act,
          |    coalesce(CAST(round(value * 100) AS BIGINT), 0) AS r,
          |    event_id
          |  FROM events),
          |tr AS (SELECT * FROM ev WHERE event_id % 2 = 0),
          |te AS (SELECT * FROM ev WHERE event_id % 2 = 1),
          |q AS (SELECT ctx, act,
          |    CAST(SUM(r) AS DOUBLE) / count(*) AS qhat
          |  FROM tr GROUP BY 1, 2),
          |pol AS (SELECT ctx, act AS pi FROM (
          |    SELECT ctx, act, row_number() OVER (PARTITION BY ctx
          |      ORDER BY -qhat, act) AS rn FROM q) WHERE rn = 1),
          |qpi AS (SELECT pol.ctx, pol.pi, q.qhat AS q_pi
          |  FROM pol JOIN q ON pol.ctx = q.ctx AND pol.pi = q.act),
          |kk AS (SELECT CAST(COUNT(DISTINCT act) AS BIGINT) AS k FROM tr),
          |terms AS (SELECT te.ctx, qpi.pi, te.r, qpi.q_pi, k,
          |    CASE WHEN te.act = qpi.pi THEN 1 ELSE 0 END AS ind,
          |    qpi.q_pi + (k * CASE WHEN te.act = qpi.pi THEN 1 ELSE 0
          |      END) * (CAST(te.r AS DOUBLE) - coalesce(q.qhat, 0.0))
          |      AS dr
          |  FROM te JOIN qpi ON te.ctx = qpi.ctx
          |    LEFT JOIN q ON te.ctx = q.ctx AND te.act = q.act, kk)
          |SELECT ctx, pi, CAST(count(*) AS BIGINT) AS n_eval,
          |  CAST(SUM(ind) AS BIGINT) AS n_matched,
          |  max(q_pi) AS dm_value,
          |  CAST(max(k) * SUM(CASE WHEN ind = 1 THEN r ELSE 0 END)
          |    AS DOUBLE) / count(*) AS ips_value,
          |  round(CAST(SUM(CAST(dr AS DECIMAL(38,18))) AS DOUBLE)
          |    / count(*), 6) AS dr_value
          |FROM terms GROUP BY ctx, pi ORDER BY ctx""".stripMargin,

      // the q206/q212 keyHash chain on user_id splits the arms; Welch's
      // t over decimal-exact (n, Σv, Σv²) with the identical tree
      "q226_ab_test" ->
        """WITH pu AS (SELECT user_id,
          |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |      AS v100
          |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          |h0 AS (SELECT v100, (user_id * 1000003) % 2147483647 AS h FROM pu),
          |h1 AS (SELECT v100, (xor(h, h >> 16) * 73244475) % 2147483647 AS h
          |  FROM h0),
          |h2 AS (SELECT v100, (xor(h, h >> 13) * 73244475) % 2147483647 AS h
          |  FROM h1),
          |arm AS (SELECT v100, h % 2 = 0 AS arm FROM h2),
          |sa AS (SELECT CAST(count(*) AS BIGINT) AS n_a,
          |    CAST(SUM(CAST(v100 AS DECIMAL(38,0))) AS DOUBLE) AS sv_a,
          |    CAST(SUM(CAST(v100 * v100 AS DECIMAL(38,0))) AS DOUBLE) AS svv_a
          |  FROM arm WHERE arm),
          |sb AS (SELECT CAST(count(*) AS BIGINT) AS n_b,
          |    CAST(SUM(CAST(v100 AS DECIMAL(38,0))) AS DOUBLE) AS sv_b,
          |    CAST(SUM(CAST(v100 * v100 AS DECIMAL(38,0))) AS DOUBLE) AS svv_b
          |  FROM arm WHERE NOT arm)
          |SELECT n_a, n_b, sv_a / n_a AS mean_a, sv_b / n_b AS mean_b,
          |  sv_a / n_a - sv_b / n_b AS diff,
          |  CASE WHEN n_a >= 2 AND n_b >= 2 THEN
          |    (sv_a / n_a - sv_b / n_b)
          |    / sqrt(((svv_a - sv_a * sv_a / n_a) / (n_a - 1)) / n_a
          |      + ((svv_b - sv_b * sv_b / n_b) / (n_b - 1)) / n_b)
          |  END AS t_stat
          |FROM sa, sb""".stripMargin,

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
          |FROM top t JOIN nd USING (source) ORDER BY source""".stripMargin,

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

      // two Lloyd rounds replayed: window-argmin assignment (≡ the Spark
      // fold — sqrt is monotone, ties by cid), decimal-exact means,
      // list(m ORDER BY dim) rebuilds round-2 centroids
      "q123_kmeans" ->
        """WITH c0 AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a1 AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c0 c) WHERE rn = 1),
          |m1 AS (SELECT centroid_id AS cid, CAST(i AS INT) AS dim,
          |    CAST(SUM(CAST(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS DECIMAL(27,15))) AS DOUBLE)
          |      / COUNT(*) AS m
          |  FROM a1, unnest(range(0, 64)) AS t(i) GROUP BY centroid_id, i),
          |c1 AS (SELECT cid, list(m ORDER BY dim) AS cv FROM m1 GROUP BY cid),
          |a2 AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c1 c) WHERE rn = 1),
          |m2 AS (SELECT centroid_id AS cid, CAST(i AS INT) AS dim,
          |    CAST(SUM(CAST(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) AS DECIMAL(27,15))) AS DOUBLE)
          |      / COUNT(*) AS m
          |  FROM a2, unnest(range(0, 64)) AS t(i) GROUP BY centroid_id, i)
          |SELECT cid, dim, round(m, 6) AS mean FROM m2 ORDER BY cid, dim""".stripMargin,

      // identical to q104's full-corpus replay: the merged store must be
      // indistinguishable from an index built over ALL documents
      "q121_index_merge" ->
        """WITH toks AS (SELECT doc_id AS id,
          |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term
          |  FROM documents),
          |tf AS (SELECT term, id, COUNT(*) AS tf FROM toks GROUP BY term, id)
          |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
          |  CAST(SUM(id * tf) AS BIGINT) AS dot_check
          |FROM tf WHERE term IN ('spark', 'join', 'vector')
          |GROUP BY term ORDER BY term""".stripMargin,

      "q122_truncated_rerank" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 2),
          |short AS (
          |  SELECT vec_id, embedding,
          |    1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[])[1:32], qv[1:32]) AS coarse_dist
          |  FROM embeddings, q ORDER BY coarse_dist, vec_id LIMIT 50)
          |SELECT s.vec_id, round(s.coarse_dist, 6) AS coarse_dist,
          |  round(1.0 - list_cosine_similarity(CAST(s.embedding AS DOUBLE[]), qv), 6) AS distance
          |FROM short s, q
          |ORDER BY 1.0 - list_cosine_similarity(CAST(s.embedding AS DOUBLE[]), qv), s.vec_id
          |LIMIT 8""".stripMargin,

      // q54's assignment+probe replay with a different query vector — the
      // store write/read is Spark-side plumbing the oracle need not see
      // merged store ≡ full rebuild: same oracle shape as q120, computed
      // over ALL embeddings (query vec 2)
      "q132_ann_merge" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 2),
          |c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |assign AS (
          |  SELECT vec_id, centroid_id FROM (
          |    SELECT e.vec_id, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |probes AS (SELECT cid FROM c, q ORDER BY list_distance(cv, qv), cid LIMIT 2)
          |SELECT e.vec_id, a.centroid_id,
          |  round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), 6) AS distance
          |FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, q
          |WHERE a.centroid_id IN (SELECT cid FROM probes)
          |ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), e.vec_id
          |LIMIT 8""".stripMargin,

      "q120_ann_store" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 1),
          |c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |assign AS (
          |  SELECT vec_id, centroid_id FROM (
          |    SELECT e.vec_id, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |probes AS (SELECT cid FROM c, q ORDER BY list_distance(cv, qv), cid LIMIT 2)
          |SELECT e.vec_id, a.centroid_id,
          |  round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), 6) AS distance
          |FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id, q
          |WHERE a.centroid_id IN (SELECT cid FROM probes)
          |ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv), e.vec_id
          |LIMIT 8""".stripMargin,

      "q55_multistore_search" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
          |scored AS (
          |  SELECT CASE WHEN label % 2 = 0 THEN 'even' ELSE 'odd' END AS searched_table,
          |    vec_id AS id, 'vec-' || CAST(vec_id % 50 AS VARCHAR) AS text,
          |    1.0 - (1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)) / 2.0 AS score,
          |    row_number() OVER (PARTITION BY label % 2
          |      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), vec_id) AS rk
          |  FROM embeddings, q),
          |top AS (SELECT * FROM scored WHERE rk <= 8 AND score >= 0.55),
          |dedup AS (SELECT * FROM (
          |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY score DESC, id) AS rn
          |  FROM top) WHERE rn = 1)
          |SELECT searched_table, id, text, round(score, 6) AS score
          |FROM dedup ORDER BY score DESC, id LIMIT 8""".stripMargin,

      "q60_promo_revenue" ->
        s"""SELECT 100.0 * ${dsumSql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           |    / ${dsumSql("l_extendedprice * (1 - l_discount)")} AS promo_pct,
           |  COUNT(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,

      "q61_shipmode_priority" ->
        """SELECT l_linestatus,
          |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

      "q88_returned_custs" ->
        s"""SELECT c_custkey, c_name, c_acctbal, n_name,
           |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= TIMESTAMP '1996-01-01'
           |  AND o_orderdate < TIMESTAMP '1996-07-01'
           |GROUP BY c_custkey, c_name, c_acctbal, n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

      "q89_order_count_dist" ->
        """WITH cnt AS (
          |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
          |  FROM customer LEFT JOIN (
          |    SELECT * FROM orders WHERE o_orderstatus <> 'F') o
          |    ON c_custkey = o_custkey
          |  GROUP BY c_custkey)
          |SELECT c_count, COUNT(*) AS custdist FROM cnt
          |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

      "q90_big_orders" ->
        s"""WITH big AS (
           |  SELECT l_orderkey, ${dsumSql("l_quantity", 4)} AS sum_qty
           |  FROM lineitem GROUP BY l_orderkey
           |  HAVING ${dsumSql("l_quantity", 4)} > 350)
           |SELECT c_custkey, c_name, o_orderkey,
           |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
           |  o_totalprice, sum_qty
           |FROM orders
           |JOIN big ON o_orderkey = l_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,

      "q91_brand_disjunction" ->
        s"""SELECT ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           |       AND l_quantity BETWEEN 1 AND 21)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           |       AND l_quantity BETWEEN 10 AND 30)
           |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
           |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

      "q92_national_share" ->
        s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |  ${dsumSql("CASE WHEN sn.n_name = 'NATION_5' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           |    / ${dsumSql("l_extendedprice * (1 - l_discount)")} AS mkt_share,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |JOIN region ON cn.n_regionkey = r_regionkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |WHERE r_name = 'ASIA'
           |GROUP BY o_year ORDER BY o_year""".stripMargin,

      "q93_top_supplier" ->
        s"""WITH pers AS (
           |  SELECT l_suppkey,
           |    ${dsumSql("l_extendedprice * (1 - l_discount)")} AS total_revenue
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           |    AND l_shipdate < TIMESTAMP '1996-04-01'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_revenue
           |FROM pers JOIN supplier ON l_suppkey = s_suppkey
           |WHERE total_revenue = (SELECT max(total_revenue) FROM pers)
           |ORDER BY s_suppkey""".stripMargin,

      "q94_rich_idle_custs" ->
        s"""WITH avg_bal AS (
           |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE)
           |    / COUNT(*) AS a
           |  FROM customer WHERE c_acctbal > 0)
           |SELECT n_name AS nation, COUNT(*) AS n_custs,
           |  ${dsumSql("c_acctbal")} AS total_bal
           |FROM customer CROSS JOIN avg_bal
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE c_acctbal > a
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |    WHERE o_custkey = c_custkey
           |      AND o_orderdate >= TIMESTAMP '2000-01-01')
           |GROUP BY n_name ORDER BY nation""".stripMargin,

      "q53_percentiles" ->
        """SELECT l_returnflag,
          |  round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price,
          |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
          |  COUNT(*) AS n
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

      "q45_rollup" ->
        s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           |  COALESCE(l_linestatus, 'ALL') AS linestatus,
           |  COUNT(*) AS n, ${dsumSql("l_quantity", 4)} AS sum_qty
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY returnflag, linestatus""".stripMargin,

      "q34_distinct_counts" ->
        """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
          |  COUNT(DISTINCT l_suppkey) AS n_supps,
          |  COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem""".stripMargin,

      "q03_revenue_by_nation" ->
        s"""SELECT n_name AS nation,
           |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY nation""".stripMargin,

      "q43_revenue_by_region" ->
        s"""SELECT r_name AS region,
           |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
           |  COUNT(*) AS n_items, COUNT(DISTINCT c_custkey) AS n_customers
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           |GROUP BY r_name ORDER BY region""".stripMargin,

      "q04_order_priority" ->
        """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
          |WHERE EXISTS (SELECT 1 FROM lineitem
          |  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1997-01-01')
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

      "q05_customers_no_orders" ->
        """SELECT c_custkey, c_name, c_acctbal FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          |  AND o_orderdate >= TIMESTAMP '2000-01-01')
          |ORDER BY c_custkey""".stripMargin,

      "q10_brand_stats" ->
        s"""SELECT p_brand, COUNT(*) AS n_items,
           |  ${dsumSql("l_quantity", 4)} AS sum_qty,
           |  ${dsumSql("l_extendedprice", 4)} / COUNT(*) AS avg_price
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

      "q06_revenue_filter" ->
        s"""SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue,
           |  COUNT(*) AS n_items
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
           |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,

      "q11_chunk_documents" ->
        """SELECT doc_id, CAST(s // 150 AS INT) AS chunk_index, CAST(s AS INT) AS start_index,
          |  CAST(doc_id AS VARCHAR) || '_' || CAST(s // 150 AS VARCHAR) AS chunk_id,
          |  substring(text, CAST(s AS INT) + 1, 200) AS chunk
          |FROM documents, unnest(range(0, length(text), 150)) AS t(s)
          |ORDER BY doc_id, chunk_index""".stripMargin,

      "q70_bigram_counts" ->
        """WITH toks AS (
          |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |bg AS (
          |  SELECT t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bigram
          |  FROM toks, unnest(range(1, greatest(len(t), 1))) AS u(i))
          |SELECT bigram, COUNT(*) AS n FROM bg
          |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

      "q76_zorder_layout" ->
        """WITH xy AS (SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS sy FROM lineitem),
          |z AS (SELECT px, sy, list_sum(list_transform(range(0, 10),
          |    i -> (((px >> i) & 1) << (2*i)) + (((sy >> i) & 1) << (2*i+1)))) AS zv
          |  FROM xy)
          |SELECT CAST(zv // 16384 AS INT) AS bucket, COUNT(*) AS n_rows,
          |  MIN(px) AS min_x, MAX(px) AS max_x, MIN(sy) AS min_y, MAX(sy) AS max_y
          |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin,

      "q77_skew_profile" ->
        """WITH c AS (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey),
          |t AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total FROM c)
          |SELECT l_partkey, cnt, CAST(cnt * n_keys AS DOUBLE) / total AS ratio_to_mean
          |FROM c, t ORDER BY cnt DESC, l_partkey LIMIT 10""".stripMargin,

      "q78_tfidf_top_terms" ->
        """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
          |toks AS (SELECT doc_id,
          |    unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS term
          |  FROM d),
          |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
          |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
          |nd AS (SELECT COUNT(*) AS n_docs FROM d),
          |scored AS (SELECT doc_id, term, CAST(tf * n_docs AS DOUBLE) / df AS score
          |  FROM tf JOIN dfq USING (term), nd),
          |rk AS (SELECT doc_id, term, score,
          |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
          |  FROM scored)
          |SELECT doc_id, rank, term, score FROM rk
          |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

      "q81_record_linkage" -> {
        val b1 = graft.plans.HashExpressions.PolyBase1
        val winHash = "list_reduce(list_transform(range(i, i + 3), " +
          "j -> CAST(unicode(substring(name, CAST(j AS INT), 1)) AS BIGINT)), " +
          s"(a, c) -> (a * $b1 + c) % $HP)"
        s"""WITH lt AS (SELECT doc_id AS l_id, lang || '|' || source AS blk,
           |    substring(text, 1, 60) AS name FROM documents
           |  WHERE length(substring(text, 1, 60)) >= 3),
           |rt AS (SELECT doc_id + 1000000 AS r_id, lang || '|' || source AS blk,
           |    substring(text, 8, 60) AS name FROM documents
           |  WHERE length(substring(text, 8, 60)) >= 3),
           |lh AS (SELECT l_id, blk,
           |    list_distinct(list_transform(range(1, length(name) - 1), i -> $winHash)) AS h
           |  FROM lt),
           |rh AS (SELECT r_id, blk,
           |    list_distinct(list_transform(range(1, length(name) - 1), i -> $winHash)) AS h
           |  FROM rt),
           |cand AS (SELECT l_id, r_id,
           |    len(list_intersect(lh.h, rh.h)) AS inter,
           |    len(lh.h) AS la, len(rh.h) AS lb
           |  FROM lh JOIN rh USING (blk)),
           |sc AS (SELECT l_id, r_id,
           |    CAST(inter AS DOUBLE) / (la + lb - inter) AS jaccard FROM cand),
           |rk AS (SELECT l_id, r_id, jaccard,
           |    row_number() OVER (PARTITION BY l_id ORDER BY jaccard DESC, r_id) AS rn
           |  FROM sc WHERE jaccard >= 0.3)
           |SELECT l_id, r_id AS matched_id, jaccard FROM rk
           |WHERE rn = 1 ORDER BY l_id""".stripMargin
      },

      "q82_compaction_plan" ->
        """WITH c AS (SELECT l_shipdate, COUNT(*) AS cnt FROM lineitem GROUP BY l_shipdate),
          |p AS (SELECT l_shipdate, cnt,
          |    COALESCE(SUM(cnt) OVER (ORDER BY l_shipdate
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
          |  FROM c)
          |SELECT CAST(cum // 5000 AS INT) AS file_id, COUNT(*) AS n_keys,
          |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
          |  MIN(l_shipdate) AS min_key, MAX(l_shipdate) AS max_key
          |FROM p GROUP BY file_id ORDER BY file_id""".stripMargin,

      "q96_domain_cap" ->
        """WITH h0 AS (SELECT doc_id, (doc_id * 1000003) % 2147483647 AS h FROM documents),
          |h1 AS (SELECT doc_id, (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT doc_id, (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1),
          |rk AS (SELECT d.doc_id, d.source,
          |    ROW_NUMBER() OVER (PARTITION BY d.source ORDER BY h2.h, d.doc_id) AS rk
          |  FROM documents d JOIN h2 USING (doc_id))
          |SELECT doc_id, source FROM rk WHERE rk <= 20 ORDER BY doc_id""".stripMargin,

      "q83_domain_mix" ->
        """WITH c AS (SELECT lang, COUNT(*) AS n_domain FROM documents GROUP BY lang),
          |s AS (SELECT lang, n_domain,
          |    CAST(CASE lang WHEN 'en' THEN 0.4 ELSE 0.15 END AS DOUBLE) AS share
          |  FROM c),
          |t AS (SELECT MIN(CAST(n_domain AS DOUBLE) / share) AS tmax FROM s),
          |k AS (SELECT lang, n_domain,
          |    LEAST(CAST(1.0 AS DOUBLE), tmax * share / CAST(n_domain AS DOUBLE)) AS keep_frac
          |  FROM s, t),
          |h0 AS (SELECT doc_id, (doc_id * 1000003) % 2147483647 AS h FROM documents),
          |h1 AS (SELECT doc_id, (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT doc_id, (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1)
          |SELECT d.doc_id, d.lang, k.keep_frac, k.n_domain
          |FROM documents d JOIN k USING (lang) JOIN h2 USING (doc_id)
          |WHERE CAST(h2.h AS DOUBLE) / 2147483647 < k.keep_frac
          |ORDER BY d.doc_id""".stripMargin,

      "q86_temperature_mix" ->
        """WITH c AS (SELECT lang, COUNT(*) AS n_domain FROM documents GROUP BY lang),
          |m AS (SELECT MIN(n_domain) AS mn FROM c),
          |k AS (SELECT lang, n_domain,
          |    SQRT(CAST(mn AS DOUBLE) / CAST(n_domain AS DOUBLE)) AS keep_frac
          |  FROM c, m),
          |h0 AS (SELECT doc_id, (doc_id * 1000003) % 2147483647 AS h FROM documents),
          |h1 AS (SELECT doc_id, (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT doc_id, (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1)
          |SELECT d.doc_id, d.lang, k.keep_frac, k.n_domain
          |FROM documents d JOIN k USING (lang) JOIN h2 USING (doc_id)
          |WHERE CAST(h2.h AS DOUBLE) / 2147483647 < k.keep_frac
          |ORDER BY d.doc_id""".stripMargin,

      "q84_contamination" -> {
        val b1 = graft.plans.HashExpressions.PolyBase1
        def winHash(t: String, n: Int) =
          s"list_reduce(list_transform(range(i, i + $n), " +
            s"j -> CAST(unicode(substring($t, CAST(j AS INT), 1)) AS BIGINT)), " +
            s"(a, c) -> (a * $b1 + c) % $HP)"
        s"""WITH ev AS (SELECT doc_id AS eval_id, substring(text, 20, 200) AS t
           |    FROM documents WHERE doc_id % 250 = 0 AND length(substring(text, 20, 200)) >= 8),
           |evg AS (SELECT eval_id,
           |    unnest(list_distinct(list_transform(range(1, length(t) - 6), i -> ${winHash("t", 8)}))) AS gh
           |  FROM ev),
           |evsz AS (SELECT eval_id,
           |    CAST(len(list_distinct(list_transform(range(1, length(t) - 6), i -> ${winHash("t", 8)}))) AS BIGINT) AS eval_sz
           |  FROM ev),
           |tr AS (SELECT doc_id AS train_id, text AS t FROM documents WHERE length(text) >= 8),
           |trg AS (SELECT train_id,
           |    unnest(list_distinct(list_transform(range(1, length(t) - 6), i -> ${winHash("t", 8)}))) AS gh
           |  FROM tr),
           |inter AS (SELECT train_id, eval_id, COUNT(*) AS n
           |  FROM trg JOIN evg USING (gh) GROUP BY train_id, eval_id)
           |SELECT train_id, eval_id, CAST(n AS DOUBLE) / eval_sz AS contamination
           |FROM inter JOIN evsz USING (eval_id)
           |WHERE CAST(n AS DOUBLE) / eval_sz >= 0.4
           |ORDER BY train_id, eval_id""".stripMargin
      },

      "q85_pack_plan" ->
        """WITH t AS (SELECT doc_id, lang,
          |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS INT) AS tokens
          |  FROM documents),
          |nz AS (SELECT * FROM t WHERE tokens > 0),
          |p AS (SELECT doc_id, lang, tokens,
          |    COALESCE(SUM(tokens) OVER (PARTITION BY lang ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
          |  FROM nz)
          |SELECT doc_id, lang, tokens, CAST(s // 2000 AS INT) AS pack_id,
          |  ((s + tokens - 1) // 2000) > (s // 2000) AS spans_boundary
          |FROM p ORDER BY doc_id""".stripMargin,

      "q79_governed_view" ->
        """SELECT c_custkey,
          |  substring(c_name, 1, 9) || repeat('*', greatest(length(c_name) - 9, 0)) AS name_masked,
          |  floor(c_acctbal / 100) * 100 AS bal_band,
          |  c_mktsegment
          |FROM customer
          |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
          |ORDER BY c_custkey""".stripMargin,

      "q80_url_safety" ->
        """WITH u AS (SELECT doc_id,
          |  CASE WHEN doc_id % 7 = 0 THEN 'http://10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1/x'
          |       WHEN doc_id % 11 = 0 THEN 'file:///etc/passwd'
          |       WHEN doc_id % 13 = 0 THEN 'http://localhost/admin'
          |       WHEN doc_id % 5 = 0 THEN 'http://192.168.1.' || CAST(doc_id % 256 AS VARCHAR) || '/p'
          |       ELSE 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) END AS url
          |  FROM documents),
          |h AS (SELECT doc_id, url, regexp_extract(url, '^https?://([^/:]+)', 1) AS host FROM u)
          |SELECT doc_id, url,
          |  (regexp_matches(url, '^https?://')
          |   AND NOT host = 'localhost'
          |   AND NOT regexp_matches(host, '^127\.')
          |   AND NOT regexp_matches(host, '^10\.')
          |   AND NOT regexp_matches(host, '^192\.168\.')
          |   AND NOT regexp_matches(host, '^172\.(1[6-9]|2[0-9]|3[01])\.')
          |   AND NOT regexp_matches(host, '^169\.254\.')) AS is_safe
          |FROM h ORDER BY doc_id""".stripMargin,

      "q71_gopher_quality" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |m AS (
          |  SELECT doc_id,
          |    CAST(len(t) AS INT) AS n_words,
          |    CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mean_word_len,
          |    CAST(len(list_filter(t, x -> x IN ('a','the','of','to','and','in','is','on','for','it'))) AS DOUBLE) / len(t) AS stopword_frac,
          |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS unique_frac,
          |    CAST(list_max(list_transform(t, x -> length(x))) AS INT) AS max_word_len
          |  FROM toks)
          |SELECT doc_id, n_words, mean_word_len, stopword_frac, unique_frac, max_word_len,
          |  (n_words >= 30 AND mean_word_len BETWEEN 4.0 AND 5.0
          |   AND stopword_frac >= 0.03 AND unique_frac >= 0.35) AS quality_pass
          |FROM m ORDER BY doc_id""".stripMargin,

      "q72_bigram_repetition" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
          |  FROM documents),
          |bg AS (
          |  SELECT doc_id, t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] AS bg
          |  FROM toks, unnest(range(1, len(t))) AS u(i)
          |  WHERE len(t) >= 2),
          |per AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg)
          |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
          |  COUNT(*) AS distinct_bigrams,
          |  1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS dup_bigram_frac,
          |  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT) AS top_bigram_frac
          |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,

      "q73_pii_redact" ->
        """WITH aug AS (
          |  SELECT doc_id, text || ' contact doc' || CAST(doc_id AS VARCHAR)
          |    || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
          |    || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS text2
          |  FROM documents),
          |red AS (
          |  SELECT doc_id,
          |    CAST(len(regexp_extract_all(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
          |    CAST(len(regexp_extract_all(text2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
          |    regexp_replace(regexp_replace(text2,
          |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
          |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
          |  FROM aug)
          |SELECT doc_id, n_emails, n_ips,
          |  CAST(length(redacted) AS INT) AS redacted_len,
          |  right(redacted, 40) AS redacted_tail
          |FROM red ORDER BY doc_id""".stripMargin,

      "q65_stratified_sample" ->
        """SELECT doc_id, lang,
          |  CASE WHEN (doc_id * 999983) % 2147483647 % 100 < 80
          |    THEN 'train' ELSE 'eval' END AS split
          |FROM documents
          |WHERE (doc_id * 1000003) % 2147483647 % 100
          |  < (CASE WHEN lang = 'en' THEN 50 ELSE 10 END)
          |ORDER BY doc_id""".stripMargin,

      "q67_bloom_filter" ->
        """WITH build AS (
          |  SELECT DISTINCT l_orderkey AS key FROM lineitem WHERE l_quantity > 45),
          |probe AS (SELECT o_orderkey AS key FROM orders),
          |bh0 AS (SELECT key, (key * 1000003) % 2147483647 AS a0,
          |    (key * 999983) % 2147483647 AS b0 FROM build),
          |bh1 AS (SELECT key, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1,
          |    (xor(b0, b0 >> 16) * 73244475) % 2147483647 AS b1 FROM bh0),
          |bh2 AS (SELECT key, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h1,
          |    ((xor(b1, b1 >> 13) * 73244475) % 2147483647) | 1 AS h2 FROM bh1),
          |bits AS (SELECT DISTINCT (h1 + i * h2) % 131072 AS bit
          |  FROM bh2, unnest(range(0, 3)) AS t(i)),
          |ph0 AS (SELECT key, (key * 1000003) % 2147483647 AS a0,
          |    (key * 999983) % 2147483647 AS b0 FROM probe),
          |ph1 AS (SELECT key, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1,
          |    (xor(b0, b0 >> 16) * 73244475) % 2147483647 AS b1 FROM ph0),
          |ph2 AS (SELECT key, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h1,
          |    ((xor(b1, b1 >> 13) * 73244475) % 2147483647) | 1 AS h2 FROM ph1),
          |ppos AS (SELECT key, (h1 + i * h2) % 131072 AS bit
          |  FROM ph2, unnest(range(0, 3)) AS t(i)),
          |flagged AS (
          |  SELECT key FROM ppos JOIN bits USING (bit)
          |  GROUP BY key HAVING COUNT(*) = 3)
          |SELECT (SELECT COUNT(*) FROM build) AS n_build,
          |  (SELECT COUNT(*) FROM flagged) AS n_flagged,
          |  (SELECT COUNT(*) FROM flagged
          |   WHERE key NOT IN (SELECT key FROM build)) AS n_false_pos""".stripMargin,

      "q74_cms_heavy_hitters" -> cmsHeavyHittersOracleSql,
      // shard-merged CMS grid ≡ the single-pass grid (cells are linear
      // counts), so the merge query replays against the same oracle
      "q105_cms_merge" -> cmsHeavyHittersOracleSql,

      "q75_hll_distinct" ->
        s"""WITH ev AS (SELECT event_type, user_id AS key FROM events),
          |kh0 AS (SELECT event_type, (key * 1000003) % 2147483647 AS a0 FROM ev),
          |kh1 AS (SELECT event_type, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1 FROM kh0),
          |kh2 AS (SELECT event_type, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h FROM kh1),
          |br AS (SELECT event_type, h >> 26 AS b,
          |    CASE WHEN (h & 67108863) = 0 THEN 27
          |         ELSE 27 - length(bin(h & 67108863)) END AS rho FROM kh2),
          |mb AS (SELECT event_type, b, MAX(rho) AS mx FROM br GROUP BY event_type, b),
          |hs AS (SELECT event_type,
          |    SUM(CAST(1 AS BIGINT) << CAST(27 - mx AS INT)) AS present,
          |    COUNT(*) AS nb FROM mb GROUP BY event_type),
          |ex AS (SELECT event_type, COUNT(DISTINCT key) AS n_exact FROM ev GROUP BY event_type)
          |SELECT ex.event_type, n_exact,
          |  ${Sketches.hllFactor(5)} / CAST(present + (32 - nb) * 134217728 AS DOUBLE) AS hll_est
          |FROM ex JOIN hs USING (event_type) ORDER BY event_type""".stripMargin,

      "q66_kmv_distinct" ->
        """WITH h0 AS (SELECT DISTINCT (l_partkey * 1000003) % 2147483647 AS h FROM lineitem),
          |h1 AS (SELECT (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT DISTINCT (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1),
          |kmin AS (SELECT h FROM h2 ORDER BY h LIMIT 256)
          |SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
          |    ELSE 255.0 * 2147483647 / MAX(h) END AS estimate,
          |  COUNT(*) AS n_hashes
          |FROM kmin""".stripMargin,

      "q12_dedup_first" ->
        """SELECT doc_id, source, n_chars FROM (
          |  SELECT doc_id, source, n_chars,
          |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

      "q13_dedup_keepmax" ->
        """SELECT lang, doc_id, n_chars FROM (
          |  SELECT lang, doc_id, n_chars,
          |    row_number() OVER (PARTITION BY md5(lang) ORDER BY n_chars DESC, doc_id) AS rn
          |  FROM documents) WHERE rn = 1 ORDER BY lang""".stripMargin,

      "q16_score_normalize" ->
        """SELECT vec_id, CAST(vec_id % 100 AS DOUBLE) / 50.0 AS distance,
          |  1.0 - (CAST(vec_id % 100 AS DOUBLE) / 50.0) / 2.0 AS cosine_score,
          |  CAST(vec_id % 100 AS DOUBLE) / 50.0 AS dot_score,
          |  1.0 / (1.0 + CAST(vec_id % 100 AS DOUBLE) / 50.0) AS euclidean_score
          |FROM embeddings ORDER BY vec_id""".stripMargin,

      "q08_top3_orders_per_cust" ->
        """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    CAST(row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
          |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

      "q31_topk_global" ->
        """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
          |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,

      "q46_window_funcs" ->
        """SELECT o_custkey, o_orderkey,
          |  lag(o_totalprice, 1) OVER w AS prev_price,
          |  lead(o_totalprice, 1) OVER w AS next_price,
          |  CAST(ntile(4) OVER w AS INT) AS quartile,
          |  percent_rank() OVER w AS pct_rank,
          |  cume_dist() OVER w AS cume
          |FROM orders WHERE o_custkey < 100
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |ORDER BY o_custkey, o_orderkey""".stripMargin,

      "q47_string_funcs" ->
        """SELECT doc_id,
          |  upper(source) AS up,
          |  lpad(lang, 5, '_') AS padded,
          |  reverse(source) AS rev,
          |  substring(text, 3, 8) AS sub,
          |  replace(source, 'src', 'origin') AS repl,
          |  CAST(levenshtein(source, lang) AS INT) AS lev,
          |  CAST(strpos(text, 'spark') AS BIGINT) AS pos,
          |  repeat(lang, 3) AS rep,
          |  concat_ws('|', source, lang) AS joined,
          |  sha256(source) AS sha
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q48_date_funcs" ->
        """SELECT o_orderkey,
          |  CAST(year(o_orderdate) AS INT) AS y,
          |  CAST(quarter(o_orderdate) AS INT) AS q,
          |  CAST(month(o_orderdate) AS INT) AS m,
          |  CAST(dayofmonth(o_orderdate) AS INT) AS d,
          |  CAST(dayofweek(o_orderdate) AS INT) AS dow,
          |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
          |  strftime(CAST(last_day(o_orderdate) AS DATE), '%Y-%m-%d') AS month_end,
          |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
          |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
          |FROM orders WHERE o_orderkey < 2000
          |ORDER BY o_orderkey""".stripMargin,

      "q07_distinct_segments" ->
        "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

      "q30_union_except" ->
        """(SELECT doc_id FROM documents WHERE doc_id % 3 = 0
          | UNION SELECT doc_id FROM documents WHERE doc_id % 5 = 0)
          |EXCEPT SELECT doc_id FROM documents WHERE doc_id % 7 = 0
          |ORDER BY doc_id""".stripMargin,

      "q14_change_detection" ->
        """WITH cur AS (
          |  SELECT 'f' || CAST(doc_id AS VARCHAR) AS name,
          |    CASE WHEN doc_id % 7 = 0 THEN md5(text || 'X') ELSE md5(text) END AS cur_etag,
          |    CAST(doc_id % 11 AS VARCHAR) AS cur_mtime, 1 AS cur_present
          |  FROM documents WHERE doc_id % 5 <> 0),
          |proc AS (
          |  SELECT 'f' || CAST(doc_id AS VARCHAR) AS name,
          |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE md5(text) END AS proc_etag,
          |    CASE WHEN doc_id % 13 = 0 THEN NULL
          |         ELSE CAST(doc_id % 11 AS VARCHAR) END AS proc_mtime,
          |    1 AS proc_present
          |  FROM documents WHERE doc_id % 5 <> 4)
          |SELECT name,
          |  CASE WHEN cur_present IS NULL THEN 'deleted'
          |       WHEN proc_present IS NULL THEN 'new'
          |       WHEN proc_etag IS NULL AND proc_mtime IS NULL THEN 'unchanged'
          |       WHEN COALESCE(cur_etag <> proc_etag, FALSE)
          |         OR COALESCE(cur_mtime <> proc_mtime, FALSE) THEN 'modified'
          |       ELSE 'unchanged' END AS status
          |FROM cur FULL OUTER JOIN proc USING (name)
          |ORDER BY name""".stripMargin,

      "q27_sessionize" ->
        """WITH e AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
          |flagged AS (
          |  SELECT user_id, ts, value,
          |    CASE WHEN lag(ts) OVER w IS NULL
          |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1
          |      ELSE 0 END AS new_session
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          |sess AS (
          |  SELECT user_id, ts, value,
          |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS session_id
          |  FROM flagged)
          |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
          |  COUNT(*) AS n_events,
          |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
          |FROM sess GROUP BY user_id, session_id
          |ORDER BY user_id, session_start""".stripMargin,

      "q64_salted_join" ->
        s"""SELECT o_orderpriority, ${dsumSql("l_quantity", 4)} AS sum_qty,
           |  COUNT(*) AS n
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

      "q68_scd_intervals" ->
        """SELECT user_id, event_type,
          |  CAST(ts AS TIMESTAMP) AS valid_from,
          |  lead(CAST(ts AS TIMESTAMP), 1) OVER
          |    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to,
          |  lead(CAST(ts AS TIMESTAMP), 1) OVER
          |    (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL AS is_current
          |FROM events WHERE user_id < 100
          |ORDER BY user_id, valid_from""".stripMargin,

      "q69_funnel" ->
        """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
          |v AS (SELECT user_id, MIN(ts) AS tv FROM ev WHERE event_type = 'view' GROUP BY user_id),
          |c AS (SELECT e.user_id, MIN(e.ts) AS tc FROM ev e JOIN v ON e.user_id = v.user_id
          |  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY e.user_id),
          |p AS (SELECT e.user_id, MIN(e.ts) AS tp FROM ev e JOIN c ON e.user_id = c.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY e.user_id)
          |SELECT (SELECT COUNT(*) FROM v) AS n_view,
          |  (SELECT COUNT(*) FROM c) AS n_click_after_view,
          |  (SELECT COUNT(*) FROM p) AS n_purchase_after_click""".stripMargin,

      "q62_interval_join" ->
        """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
          |c AS (SELECT event_id, user_id, ts AS c_ts FROM ev WHERE event_type = 'click'),
          |v AS (SELECT user_id, ts AS v_ts FROM ev WHERE event_type = 'view')
          |SELECT c.event_id, COUNT(v.v_ts) AS n_views
          |FROM c LEFT JOIN v ON c.user_id = v.user_id
          |  AND v.v_ts >= c.c_ts - INTERVAL 10 MINUTE AND v.v_ts < c.c_ts
          |GROUP BY c.event_id ORDER BY c.event_id""".stripMargin,

      "q63_asof_join" ->
        """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
          |    event_type, value FROM events),
          |p AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase'),
          |c AS (SELECT user_id, ts, MAX(value) AS value FROM ev
          |  WHERE event_type = 'click' GROUP BY user_id, ts)
          |SELECT p.event_id, p.user_id, p.ts,
          |  c.ts AS click_ts, c.value AS click_value
          |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
          |ORDER BY p.event_id""".stripMargin,

      "q28_tumbling_window" ->
        s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
           |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q42_sliding_window" ->
        s"""WITH e AS (
           |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value FROM events),
           |expanded AS (
           |  SELECT make_timestamp((us // 900000000 - k) * 900000000) AS window_start,
           |    event_type, value
           |  FROM e, unnest(range(0, 4)) AS t(k))
           |SELECT window_start, event_type, COUNT(*) AS n,
           |  ${dsumSql("value")} AS sum_value
           |FROM expanded GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "q29_json_props" ->
        """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_val, COUNT(*) AS n
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      "q23_token_stats" ->
        s"""SELECT doc_id,
           |  CAST(len($toks) AS INT) AS tokens,
           |  CAST(list_sum(list_transform($toks,
           |    t -> 1 + CAST(floor((length(t) - 1) / 4) AS INT))) AS INT) AS subwords,
           |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
           |    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
           |      / length(text) END AS punct_ratio,
           |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
           |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
           |      / length(text) END AS digit_ratio,
           |  CASE WHEN len($toks) = 0 THEN 0.0 ELSE
           |    CAST(len(list_filter(list_transform($toks, t -> lower(t)),
           |      t -> t IN ('the','and','of','to','in','is','that','for','with','are','was','this','it','on','be','as','by','at'))) AS DOUBLE)
           |      / len($toks) END AS stopword_ratio
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q24_lang_id" ->
        s"""SELECT doc_id, $caseExpr AS lang_pred FROM (
           |  SELECT doc_id, ${langMarkers.map(l => s"${l._1}_hits").mkString(", ")},
           |    $bestExpr AS best
           |  FROM (SELECT doc_id, ${hitCols.mkString(", ")} FROM documents)
           |) ORDER BY doc_id""".stripMargin,

      "q25_quality_score" ->
        s"""SELECT doc_id, $qualitySql AS quality
           |FROM documents ORDER BY doc_id""".stripMargin,

      "q26_fingerprint" ->
        """SELECT doc_id,
          |  list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(range(1, length(text) + 1),
          |      i -> CAST(ord(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
          |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q22_ngram_jaccard" ->
        s"""WITH corpus AS ($chunkCorpus),
           |grams AS (
           |  SELECT DISTINCT doc_id, substring(text, CAST(s AS INT) + 1, 5) AS gram
           |  FROM corpus, unnest(range(0, length(text) - 4, 1)) AS t(s)
           |  WHERE length(text) >= 5),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
           |  FROM grams a JOIN grams b USING (gram)
           |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
           |SELECT doc_a, doc_b,
           |  CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
           |FROM inter
           |JOIN sizes sa ON sa.doc_id = doc_a
           |JOIN sizes sb ON sb.doc_id = doc_b
           |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.6
           |ORDER BY doc_a, doc_b""".stripMargin,

      "q17_cosine_topk" ->
        """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
          |SELECT vec_id, label,
          |  round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS distance
          |FROM embeddings, q
          |ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), vec_id
          |LIMIT 8""".stripMargin,

      "q18_knn_batch" ->
        """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          |  FROM embeddings WHERE vec_id < 5)
          |SELECT query_id, rank, vec_id, round(distance, 6) AS distance FROM (
          |  SELECT q.query_id, e.vec_id,
          |    1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS distance,
          |    CAST(row_number() OVER (PARTITION BY q.query_id
          |      ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
          |        e.vec_id) AS INT) AS rank
          |  FROM embeddings e, q)
          |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

      "q35_ivf_assign" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8)
          |SELECT vec_id, centroid_id, round(centroid_dist, 6) AS centroid_dist FROM (
          |  SELECT e.vec_id, c.cid AS centroid_id,
          |    list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) AS centroid_dist,
          |    row_number() OVER (PARTITION BY e.vec_id
          |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |  FROM embeddings e, c)
          |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

      "q37_testbed_eval" ->
        """WITH chunks AS (
          |  SELECT doc_id, CAST(s // 36 AS INT) AS ci,
          |    substring(text, CAST(s AS INT) + 1, 40) AS chunk
          |  FROM documents, unnest(range(0, length(text), 36)) AS t(s)),
          |elig AS (
          |  SELECT doc_id, ci, chunk,
          |    COUNT(*) OVER (PARTITION BY doc_id) AS nch
          |  FROM chunks),
          |ranked AS (
          |  SELECT doc_id, ci, chunk,
          |    row_number() OVER (PARTITION BY doc_id ORDER BY ci) AS rk
          |  FROM elig WHERE nch >= 5),
          |final AS (
          |  SELECT CAST(doc_id AS VARCHAR) AS topic,
          |    (least(length(chunk), 16) % 2 = 0) AS correct
          |  FROM ranked WHERE rk <= 2)
          |SELECT topic, COUNT(*) AS n,
          |  CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
          |  CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS correctness
          |FROM final GROUP BY topic ORDER BY topic""".stripMargin,

      "q38_nl2sql" ->
        """SELECT p_brand, count(*) AS n, max(p_retailprice) AS max_price
          |FROM part WHERE p_size >= 30 GROUP BY p_brand ORDER BY p_brand""".stripMargin,

      "q39_slugify" ->
        """SELECT doc_id,
          |  substring(regexp_replace(regexp_replace(lower(substring(text, 1, 50)),
          |    '[^a-z0-9]+', '-', 'g'), '^-|-$', '', 'g'), 1, 40) AS slug
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q40_webscrape_sections" ->
        """SELECT doc_id, section_index, title, content FROM (
          |  SELECT doc_id, 0 AS section_index, source AS title,
          |    trim(regexp_replace(substring(text, 1, 120), '\s+', ' ', 'g')) AS content
          |  FROM documents
          |  UNION ALL
          |  SELECT doc_id, 1, 'Details & more',
          |    trim(regexp_replace(substring(text, 121), '\s+', ' ', 'g'))
          |  FROM documents
          |  WHERE length(trim(regexp_replace(substring(text, 121), '\s+', ' ', 'g'))) > 0)
          |ORDER BY doc_id, section_index""".stripMargin,

      "q33_multimodal_features" ->
        """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
          |  sha256(text) AS sha256
          |FROM documents ORDER BY doc_id""".stripMargin,

      "q59_frame_sample" ->
        """SELECT doc_id, s AS frame_index, s * 100 AS frame_offset
          |FROM documents,
          |  unnest(range(0, greatest(CAST(ceil(length(text) / 100.0) AS BIGINT), 1))) AS t(s)
          |ORDER BY doc_id, frame_index""".stripMargin,

      // PNG is lossless: the oracle replays decode(encode(img)) == img
      // arithmetically — generator pixels → integer 2×2 pool → mean/aHash
      "q125_image_decode" ->
        """WITH blocks AS (
          |  SELECT doc_id, by * 8 + bx AS j,
          |    (  ((2*bx)   * 7 + (2*by)   * 13 + doc_id * 31) % 256
          |     + ((2*bx+1) * 7 + (2*by)   * 13 + doc_id * 31) % 256
          |     + ((2*bx)   * 7 + (2*by+1) * 13 + doc_id * 31) % 256
          |     + ((2*bx+1) * 7 + (2*by+1) * 13 + doc_id * 31) % 256) // 4 AS bv
          |  FROM documents, unnest(range(0, 8)) t1(bx), unnest(range(0, 8)) t2(by)),
          |m AS (SELECT doc_id, sum(bv) / 64.0 AS mean FROM blocks GROUP BY doc_id),
          |h AS (SELECT b.doc_id,
          |    sum(CASE WHEN b.j < 63 AND CAST(b.bv AS DOUBLE) > m.mean
          |      THEN (CAST(1 AS BIGINT) << CAST(b.j AS INT)) ELSE 0 END) AS ahash
          |  FROM blocks b JOIN m ON b.doc_id = m.doc_id GROUP BY b.doc_id)
          |SELECT m.doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
          |  round(m.mean, 6) AS mean_gray, CAST(h.ahash AS BIGINT) AS ahash
          |FROM m JOIN h ON m.doc_id = h.doc_id ORDER BY m.doc_id""".stripMargin,

      "q126_image_neardup" -> imageNearDupOracleSql,

      // q101's graph replayed, then the beam rounds unrolled: each round
      // is expand-neighbors ∪ beam → score vs the query → keep 8
      "q129_graph_search" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |p AS (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
          |    AND l.vec_id <> r.vec_id),
          |g AS (SELECT id, nbr_id FROM (
          |    SELECT id, nbr_id,
          |      row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rk
          |    FROM p) WHERE rk <= 3),
          |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          |q AS (SELECT v AS qv FROM ev WHERE vec_id = 5),
          |b0 AS (SELECT vec_id AS cand,
          |    1.0 - list_cosine_similarity(v, qv) AS distance
          |  FROM ev, q WHERE vec_id IN (0, 1, 2, 3)
          |  ORDER BY distance, cand LIMIT 8),
          |x1 AS (SELECT DISTINCT cand FROM (
          |  SELECT g.nbr_id AS cand FROM b0 JOIN g ON g.id = b0.cand
          |  UNION ALL SELECT cand FROM b0)),
          |b1 AS (SELECT x1.cand, 1.0 - list_cosine_similarity(v, qv) AS distance
          |  FROM x1 JOIN ev ON ev.vec_id = x1.cand, q
          |  ORDER BY distance, cand LIMIT 8),
          |x2 AS (SELECT DISTINCT cand FROM (
          |  SELECT g.nbr_id AS cand FROM b1 JOIN g ON g.id = b1.cand
          |  UNION ALL SELECT cand FROM b1)),
          |b2 AS (SELECT x2.cand, 1.0 - list_cosine_similarity(v, qv) AS distance
          |  FROM x2 JOIN ev ON ev.vec_id = x2.cand, q
          |  ORDER BY distance, cand LIMIT 8)
          |SELECT CAST(row_number() OVER (ORDER BY distance, cand) AS INT) AS rank,
          |  CAST(cand AS BIGINT) AS vec_id, round(distance, 6) AS distance
          |FROM b2 ORDER BY rank LIMIT 5""".stripMargin,

      "q130_bpe_merges" -> bpeOracleSql,

      "q133_bpe_encode" -> bpeEncodeOracleSql,

      "q134_dsir_select" -> dsirOracleSql,

      "q135_semantic_dedup" -> semanticDedupOracleSql,

      "q136_pagerank" -> pageRankOracleSql,

      "q137_ppr_expand" -> pprOracleSql,

      "q138_semantic_contamination" -> semanticContaminationOracleSql,

      "q139_label_propagation" -> labelPropagationOracleSql,

      // replays the q67 double-hash Bloom arithmetic over the urgent-dim
      // keys, then row-level fact pruning + the exact join counts
      "q140_bloom_join" ->
        """WITH dim AS (SELECT DISTINCT o_orderkey AS key FROM orders
          |  WHERE o_orderpriority = '1-URGENT'),
          |bh0 AS (SELECT key, (key * 1000003) % 2147483647 AS a0,
          |    (key * 999983) % 2147483647 AS b0 FROM dim),
          |bh1 AS (SELECT key, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1,
          |    (xor(b0, b0 >> 16) * 73244475) % 2147483647 AS b1 FROM bh0),
          |bh2 AS (SELECT key, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h1,
          |    ((xor(b1, b1 >> 13) * 73244475) % 2147483647) | 1 AS h2 FROM bh1),
          |bits AS (SELECT DISTINCT (h1 + i * h2) % 131072 AS bit
          |  FROM bh2, unnest(range(0, 3)) AS t(i)),
          |fk AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
          |ph0 AS (SELECT key, (key * 1000003) % 2147483647 AS a0,
          |    (key * 999983) % 2147483647 AS b0 FROM fk),
          |ph1 AS (SELECT key, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1,
          |    (xor(b0, b0 >> 16) * 73244475) % 2147483647 AS b1 FROM ph0),
          |ph2 AS (SELECT key, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h1,
          |    ((xor(b1, b1 >> 13) * 73244475) % 2147483647) | 1 AS h2 FROM ph1),
          |ppos AS (SELECT key, (h1 + i * h2) % 131072 AS bit
          |  FROM ph2, unnest(range(0, 3)) AS t(i)),
          |pass AS (SELECT key FROM ppos JOIN bits USING (bit)
          |  GROUP BY key HAVING COUNT(*) = 3),
          |stats AS (SELECT
          |  (SELECT COUNT(*) FROM lineitem) AS n_fact,
          |  (SELECT COUNT(*) FROM lineitem JOIN pass ON l_orderkey = key) AS n_pass,
          |  (SELECT COUNT(*) FROM lineitem JOIN dim ON l_orderkey = key) AS n_joined)
          |SELECT n_fact, n_pass, n_joined,
          |  n_pass - n_joined AS n_false_pass FROM stats""".stripMargin,

      // brute-force exact Jaccard over every shared-token pair — the
      // prefix-filtered algorithm must produce the IDENTICAL pair set
      // (completeness of the prefix bound is what's being gated)
      "q142_similarity_join" ->
        """WITH g AS (
          |  SELECT DISTINCT doc_id, substring(text, CAST(s AS INT) + 1, 5) AS tok
          |  FROM documents, unnest(range(0, length(text) - 4, 1)) AS t(s)
          |  WHERE length(text) >= 5 AND doc_id < 600
          |  UNION
          |  SELECT doc_id, text AS tok FROM documents
          |  WHERE length(text) < 5 AND doc_id < 600),
          |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
          |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          |    CAST(count(*) AS BIGINT) AS nc
          |  FROM g a JOIN g b ON a.tok = b.tok AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT doc_a, doc_b,
          |  CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) AS jaccard
          |FROM pr JOIN sz sa ON doc_a = sa.doc_id
          |  JOIN sz sb ON doc_b = sb.doc_id
          |WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.6
          |ORDER BY doc_a, doc_b""".stripMargin,

      "q143_lsh_recall" -> lshRecallOracleSql,

      "q144_local_supplier_volume" ->
        """SELECT n_name,
          |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
          |FROM lineitem, orders, supplier, customer, nation, region
          |WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
          |  AND o_custkey = c_custkey AND c_nationkey = s_nationkey
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

      "q145_waiting_suppliers" ->
        """SELECT s_name, count(*) AS numwait
          |FROM lineitem l1, orders, supplier
          |WHERE l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
          |  AND l1.l_suppkey = s_suppkey
          |  AND EXISTS (SELECT 1 FROM lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate >= l1.l_shipdate)
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

      // replays the sign-bit pack (list_reduce OR-fold), Hamming
      // shortlist, and exact-cosine rerank of q148
      "q148_bq_search" -> {
        // DuckDB range-checks 1<<63; the sign bit rides as its literal
        val pack = (v: String) =>
          s"list_reduce(list_transform(range(0, 64), i -> " +
            s"CASE WHEN $v[CAST(i AS INT) + 1] > 0 " +
            s"THEN (CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT) " +
            s"ELSE (CAST(1 AS BIGINT) << CAST(i AS INT)) END) " +
            s"ELSE CAST(0 AS BIGINT) END), (a, b) -> a | b)"
        s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv,
           |    ${pack("embedding")} AS qbq
           |  FROM embeddings WHERE vec_id = 2),
           |b AS (SELECT vec_id, embedding, ${pack("embedding")} AS bq
           |  FROM embeddings),
           |short AS (SELECT vec_id, embedding,
           |    CAST(bit_count(xor(bq, qbq)) AS INT) AS hamming
           |  FROM b, q ORDER BY hamming, vec_id LIMIT 50)
           |SELECT s.vec_id, s.hamming,
           |  round(1.0 - list_cosine_similarity(CAST(s.embedding AS DOUBLE[]), qv), 6) AS distance
           |FROM short s, q
           |ORDER BY 1.0 - list_cosine_similarity(CAST(s.embedding AS DOUBLE[]), qv), s.vec_id
           |LIMIT 8""".stripMargin
      },

      "q149_shipping_priority" ->
        s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
           |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue
           |FROM lineitem, orders, customer
           |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           |  AND c_mktsegment = 'BUILDING'
           |  AND o_orderdate < TIMESTAMP '1995-03-15'
           |  AND l_shipdate > TIMESTAMP '1995-03-15'
           |GROUP BY 1, 2, 3
           |ORDER BY revenue DESC, o_orderdate, l_orderkey
           |LIMIT 10""".stripMargin,

      // cos rides as 1 − (1 − cos): the SAME double-op sequence as the
      // Spark heap (distance-domain ordering, then back) — see
      // Similarity.marginMining
      "q150_margin_mining" ->
        """WITH s AS (SELECT vec_id AS sid, CAST(embedding AS DOUBLE[]) AS sv
          |  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 400),
          |t AS (SELECT vec_id AS tid, CAST(embedding AS DOUBLE[]) AS tv
          |  FROM embeddings WHERE vec_id % 2 = 1),
          |fwd0 AS (SELECT sid, tid,
          |    1.0 - list_cosine_similarity(sv, tv) AS dist FROM s, t),
          |fwd AS (SELECT sid, tid, 1.0 - dist AS cos,
          |    row_number() OVER (PARTITION BY sid ORDER BY dist, tid) AS rn
          |  FROM fwd0),
          |fk AS (SELECT * FROM fwd WHERE rn <= 4),
          |cand AS (SELECT DISTINCT tid FROM fk),
          |bwd0 AS (SELECT c.tid, s2.sid,
          |    1.0 - list_cosine_similarity(t2.tv, s2.sv) AS dist
          |  FROM cand c JOIN t t2 USING (tid), s s2),
          |bwd AS (SELECT tid, 1.0 - dist AS cos,
          |    row_number() OVER (PARTITION BY tid ORDER BY dist, sid) AS rn
          |  FROM bwd0),
          |fsum AS (SELECT sid, SUM(CAST(cos AS DECIMAL(30,12))) AS fs
          |  FROM fk GROUP BY sid),
          |bsum AS (SELECT tid, SUM(CAST(cos AS DECIMAL(30,12))) AS bs
          |  FROM bwd WHERE rn <= 4 GROUP BY tid),
          |scored AS (SELECT f.sid, f.tid, f.cos,
          |    (8.0 * f.cos) / CAST(fs + bs AS DOUBLE) AS margin
          |  FROM fk f JOIN fsum USING (sid) JOIN bsum USING (tid)),
          |best AS (SELECT *, row_number() OVER (PARTITION BY sid
          |    ORDER BY margin DESC, tid) AS brn FROM scored)
          |SELECT sid AS src_id, tid AS tgt_id, round(cos, 6) AS cosine,
          |  round(margin, 6) AS margin
          |FROM best WHERE brn = 1 AND margin > 1.0 ORDER BY src_id""".stripMargin,

      "q151_split_assign" -> splitAssignOracleSql,

      "q154_priority_sample" ->
        """WITH h0 AS (SELECT doc_id, (doc_id * 1000003) % 2147483647 AS h
          |  FROM documents),
          |h1 AS (SELECT doc_id, (xor(h, h >> 16) * 73244475) % 2147483647 AS h
          |  FROM h0),
          |h2 AS (SELECT doc_id, (xor(h, h >> 13) * 73244475) % 2147483647 AS h
          |  FROM h1),
          |p AS (SELECT d.doc_id, d.n_chars,
          |    (CAST(d.n_chars AS DOUBLE) * 2147483647) / CAST(h + 1 AS DOUBLE)
          |      AS priority
          |  FROM documents d JOIN h2 USING (doc_id)),
          |r AS (SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id)
          |    AS rn FROM p),
          |tau AS (SELECT priority AS tau FROM r WHERE rn = 101)
          |SELECT doc_id, n_chars, round(priority, 6) AS priority,
          |  round(greatest(CAST(n_chars AS DOUBLE), tau), 6) AS est_weight
          |FROM r, tau WHERE rn <= 100 ORDER BY doc_id""".stripMargin,

      "q155_dedup_report" -> dedupReportOracleSql,

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

      "q152_ewma_monitor" ->
        """WITH e AS (SELECT event_id, event_type,
          |    CAST(ts AS TIMESTAMP) AS ts, value FROM events),
          |w AS (SELECT event_type, event_id, value,
          |    list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
          |      ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING) AS hist
          |  FROM e),
          |f AS (SELECT event_type, event_id, value, hist,
          |    len(hist) AS L FROM w WHERE len(hist) >= 4),
          |g AS (SELECT event_type, event_id, value, L,
          |    CAST(list_reduce(list_transform(hist, (v, i) ->
          |        CAST(v / CAST(1 << (L - i + 1) AS DOUBLE) AS DECIMAL(38,18))),
          |      (a, x) -> a + x) AS DOUBLE)
          |      / (1.0 - 1.0 / CAST(1 << L AS DOUBLE)) AS ewma
          |  FROM f)
          |SELECT event_type, event_id, value, CAST(L AS INT) AS n_history,
          |  round(ewma, 6) AS ewma, round(value - ewma, 6) AS deviation
          |FROM g WHERE abs(value - ewma) > 120.0
          |ORDER BY event_type, event_id""".stripMargin,

      "q153_span_corruption" ->
        """WITH t AS (SELECT doc_id, CAST(len(list_filter(
          |    regexp_split_to_array(text, '\s+'), x -> x <> '')) AS INT)
          |      AS n_tokens
          |  FROM documents),
          |b AS (SELECT doc_id, n_tokens,
          |    CAST(n_tokens // 20 AS BIGINT) AS n_spans FROM t),
          |h0 AS (SELECT doc_id, ((doc_id * 31) * 1000003) % 2147483647 AS h
          |  FROM documents),
          |h1 AS (SELECT doc_id, (xor(h, h >> 16) * 73244475) % 2147483647 AS h
          |  FROM h0),
          |h2 AS (SELECT doc_id, (xor(h, h >> 13) * 73244475) % 2147483647 AS h
          |  FROM h1)
          |SELECT b.doc_id, b.n_tokens, n_spans,
          |  n_spans * 3 AS n_masked,
          |  n_tokens - n_spans * 3 + n_spans AS input_len,
          |  n_spans * 3 + n_spans AS target_len,
          |  CASE WHEN n_spans > 0 THEN h2.h % 18 END AS first_span_offset
          |FROM b JOIN h2 USING (doc_id) ORDER BY doc_id""".stripMargin,

      "q147_drift_chi2" ->
        """WITH r AS (SELECT source AS category, count(*) AS n_ref
          |  FROM documents WHERE doc_id % 3 = 0 GROUP BY 1),
          |c AS (SELECT source AS category, count(*) AS n_cur
          |  FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1),
          |j AS (SELECT coalesce(r.category, c.category) AS category,
          |    CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
          |    CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
          |  FROM r FULL JOIN c ON r.category = c.category),
          |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
          |    CAST(sum(n_cur) AS BIGINT) AS tc FROM j),
          |e AS (SELECT category, n_ref, n_cur,
          |    CASE WHEN n_ref > 0 THEN CAST(tc * n_ref AS DOUBLE) / tr END AS expected
          |  FROM j, t),
          |d AS (SELECT *, CAST(n_cur AS DOUBLE) - expected AS dd FROM e),
          |p AS (SELECT category, n_ref, n_cur, expected,
          |    (dd * dd) / expected AS contrib FROM d),
          |tot AS (SELECT CAST(NULL AS VARCHAR) AS category,
          |    CAST(sum(n_ref) AS BIGINT) AS n_ref,
          |    CAST(sum(n_cur) AS BIGINT) AS n_cur,
          |    CAST(NULL AS DOUBLE) AS expected,
          |    CAST(sum(CAST(contrib AS DECIMAL(32,10))) AS DOUBLE) AS contrib
          |  FROM p)
          |SELECT * FROM (SELECT * FROM p UNION ALL SELECT * FROM tot)
          |ORDER BY category NULLS LAST""".stripMargin,

      "q146_nation_profit" ->
        """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
          |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS revenue
          |FROM lineitem, part, orders, supplier, nation
          |WHERE l_partkey = p_partkey AND p_name LIKE '%red%'
          |  AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
          |  AND s_nationkey = n_nationkey
          |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

      // the q35 assignment, squared-distance inertia in exact decimal,
      // rollup total via UNION ALL (NULL cell id)
      "q141_cluster_quality" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
          |    CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a0 AS (SELECT e.vec_id, c.cid AS centroid_id,
          |    list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) AS centroid_dist,
          |    row_number() OVER (PARTITION BY e.vec_id
          |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |  FROM embeddings e, c),
          |a AS (SELECT vec_id, centroid_id, centroid_dist FROM a0 WHERE rn = 1),
          |grp AS (SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_points,
          |    CAST(sum(CAST(centroid_dist * centroid_dist AS DECIMAL(30,12))) AS DOUBLE) AS inertia
          |  FROM a GROUP BY centroid_id),
          |tot AS (SELECT CAST(NULL AS INT) AS centroid_id,
          |    CAST(count(*) AS BIGINT) AS n_points,
          |    CAST(sum(CAST(centroid_dist * centroid_dist AS DECIMAL(30,12))) AS DOUBLE) AS inertia
          |  FROM a)
          |SELECT * FROM (SELECT * FROM grp UNION ALL SELECT * FROM tot)
          |ORDER BY centroid_id NULLS LAST""".stripMargin,

      // q66's hash chain over q26's fingerprint; side sketches → union
      // k-min → membership counts, estimates replayed in the same op order
      "q131_kmv_overlap" ->
        """WITH fp AS (SELECT doc_id,
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(range(1, length(text) + 1),
          |        i -> CAST(ord(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
          |      (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
          |  FROM documents),
          |hs AS (SELECT doc_id, (xor(h1, h1 >> 13) * 73244475) % 2147483647 AS h FROM (
          |    SELECT doc_id, (xor(h0, h0 >> 16) * 73244475) % 2147483647 AS h1 FROM (
          |      SELECT doc_id, (fp * 1000003) % 2147483647 AS h0 FROM fp))),
          |ka AS (SELECT h FROM (SELECT DISTINCT h FROM hs WHERE doc_id < 350)
          |  ORDER BY h LIMIT 64),
          |kb AS (SELECT h FROM (SELECT DISTINCT h FROM hs WHERE doc_id >= 150)
          |  ORDER BY h LIMIT 64),
          |u AS (SELECT h, max(a) AS in_a, max(b) AS in_b FROM (
          |    SELECT h, 1 AS a, 0 AS b FROM ka
          |    UNION ALL SELECT h, 0 AS a, 1 AS b FROM kb) s
          |  GROUP BY h ORDER BY h LIMIT 64),
          |agg AS (SELECT count(*) AS n_union,
          |    CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
          |    max(h) AS hk FROM u)
          |SELECT n_union, n_both,
          |  round(CASE WHEN n_union < 64 THEN CAST(n_union AS DOUBLE)
          |    ELSE 63.0 * 2147483647 / hk END, 6) AS union_est,
          |  round(CAST(n_both AS DOUBLE) / n_union, 6) AS jaccard_est,
          |  round((CAST(n_both AS DOUBLE) / n_union) *
          |    (CASE WHEN n_union < 64 THEN CAST(n_union AS DOUBLE)
          |     ELSE 63.0 * 2147483647 / hk END), 6) AS intersection_est
          |FROM agg""".stripMargin,

      "q127_wav_decode" ->
        """WITH s AS (
          |  SELECT doc_id, ((doc_id * 31 + i * 17) % 4096) - 2048 AS v
          |  FROM documents, unnest(range(0, 128 + doc_id % 64)) t(i)),
          |a AS (SELECT doc_id, count(*) AS n, max(abs(v)) AS peak,
          |    round(CAST(sum(v * v) AS DOUBLE) / count(*), 6) AS mean_square
          |  FROM s GROUP BY doc_id)
          |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
          |  CAST(8000 AS INT) AS sample_rate, CAST(peak AS BIGINT) AS peak,
          |  mean_square
          |FROM a ORDER BY doc_id""".stripMargin,

      "q128_gif_frames" ->
        """WITH f AS (
          |  SELECT doc_id, fi
          |  FROM documents, unnest(range(0, 3 + doc_id % 5)) t(fi)
          |  WHERE doc_id < 1000 AND fi % 2 = 0),
          |p AS (SELECT doc_id, fi,
          |    sum(((i % 8) * 3 + (i // 8) * 5 + fi * 11 + doc_id * 7) % 256) AS s
          |  FROM f, unnest(range(0, 64)) t2(i) GROUP BY doc_id, fi)
          |SELECT doc_id, CAST(fi AS INT) AS frame_index,
          |  round(CAST(s AS DOUBLE) / 64.0, 6) AS frame_mean
          |FROM p ORDER BY doc_id, frame_index""".stripMargin,

      "q20_minhash_pairs" -> minhashOracleSql,
      "q56_dedup_clusters" -> dedupClustersOracleSql,
      "q21_simhash_pairs" -> simhashOracleSql,
      "q87_dup_spans" -> dupSpansOracleSql,
      "q95_rare_bigrams" -> rareBigramsOracleSql,
      "q100_classifier" -> classifierOracleSql,
      "q112_incremental_dedup" -> incrementalDedupOracleSql,
      "q113_phash_neardup" -> phashOracleSql,
      "q117_training_export" -> trainingExportOracleSql,

      "q116_epoch_mix" ->
        """WITH w AS (SELECT doc_id, lang,
          |    CASE lang WHEN 'en' THEN 2.5 WHEN 'de' THEN 1.0 WHEN 'fr' THEN 0.5
          |      ELSE 1.0 END AS wt
          |  FROM documents),
          |h0 AS (SELECT doc_id, (doc_id * 1000003) % 2147483647 AS h FROM documents),
          |h1 AS (SELECT doc_id, (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT doc_id, (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1),
          |n AS (SELECT w.doc_id, w.lang,
          |    CAST(floor(wt) AS BIGINT) +
          |      CASE WHEN CAST(h AS DOUBLE) / 2147483647 < wt - floor(wt)
          |        THEN 1 ELSE 0 END AS n
          |  FROM w JOIN h2 USING (doc_id))
          |SELECT doc_id, lang, epoch FROM n, unnest(range(0, n)) AS t(epoch)
          |WHERE n > 0 ORDER BY doc_id, epoch""".stripMargin,

      "q115_negative_samples" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, centroid_id FROM (
          |    SELECT e.vec_id, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |anch AS (SELECT vec_id AS anchor_id, centroid_id AS acell FROM a WHERE vec_id < 5),
          |pairs AS (SELECT anchor_id, t.vec_id AS cid
          |  FROM a t, anch
          |  WHERE t.vec_id <> anchor_id AND t.centroid_id <> acell),
          |h0 AS (SELECT anchor_id, cid,
          |    ((anchor_id * 100003 + cid) * 1000003) % 2147483647 AS h FROM pairs),
          |h1 AS (SELECT anchor_id, cid, (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM h0),
          |h2 AS (SELECT anchor_id, cid, (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM h1),
          |rk AS (SELECT anchor_id, cid, h,
          |    CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY h, cid) AS INT) AS rank
          |  FROM h2)
          |SELECT anchor_id, rank, cid AS neg_id, h AS pair_hash
          |FROM rk WHERE rank <= 4 ORDER BY anchor_id, rank""".stripMargin,

      "q114_url_canonical" ->
        """WITH base AS (SELECT doc_id,
          |    CAST(doc_id // 5 AS VARCHAR) AS g,
          |    CAST((doc_id // 5) % 7 AS VARCHAR) AS p
          |  FROM documents),
          |u AS (SELECT doc_id,
          |    CASE doc_id % 5
          |      WHEN 0 THEN 'https://SITE' || g || '.example.com/path' || p
          |      WHEN 1 THEN 'https://site' || g || '.example.com:443/path' || p || '?utm_source=x'
          |      WHEN 2 THEN 'https://site' || g || '.example.com/path' || p || '#frag'
          |      WHEN 3 THEN 'https://site' || g || '.example.com/path' || p || '?b=2&a=1'
          |      ELSE 'https://site' || g || '.example.com/path' || p || '?a=1&b=2&utm_campaign=z'
          |    END AS url FROM base),
          |parts AS (SELECT doc_id,
          |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
          |    lower(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1)) AS host,
          |    regexp_extract(url, '^[A-Za-z]+://[^/:?#]+:([0-9]+)', 1) AS port,
          |    regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS rawpath,
          |    regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS query FROM u),
          |canon AS (SELECT doc_id,
          |    scheme || '://' || host ||
          |    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
          |        AND NOT (scheme = 'https' AND port = '443')
          |      THEN ':' || port ELSE '' END ||
          |    CASE WHEN rawpath = '' THEN '/' ELSE rawpath END ||
          |    CASE WHEN len(list_filter(str_split(query, '&'), q ->
          |        q <> '' AND NOT starts_with(q, 'utm_')
          |        AND NOT starts_with(q, 'fbclid=') AND NOT starts_with(q, 'gclid='))) > 0
          |      THEN '?' || array_to_string(list_sort(list_filter(str_split(query, '&'), q ->
          |        q <> '' AND NOT starts_with(q, 'utm_')
          |        AND NOT starts_with(q, 'fbclid=') AND NOT starts_with(q, 'gclid='))), '&')
          |      ELSE '' END AS canonical_url
          |  FROM parts)
          |SELECT canonical_url, COUNT(*) AS n_variants, MIN(doc_id) AS min_doc
          |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,

      "q118_hourly_hll" ->
        s"""WITH ev AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
          |    user_id AS key FROM events),
          |kh0 AS (SELECT hr, (key * 1000003) % 2147483647 AS a0 FROM ev),
          |kh1 AS (SELECT hr, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1 FROM kh0),
          |kh2 AS (SELECT hr, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h FROM kh1),
          |br AS (SELECT hr, h >> 26 AS b,
          |    CASE WHEN (h & 67108863) = 0 THEN 27
          |         ELSE 27 - length(bin(h & 67108863)) END AS rho FROM kh2),
          |mb AS (SELECT hr, b, MAX(rho) AS mx FROM br GROUP BY hr, b),
          |hs AS (SELECT hr,
          |    SUM(CAST(1 AS BIGINT) << CAST(27 - mx AS INT)) AS present,
          |    COUNT(*) AS nb FROM mb GROUP BY hr),
          |ex AS (SELECT hr, COUNT(DISTINCT key) AS n_exact FROM ev GROUP BY hr)
          |SELECT ex.hr, ${Sketches.hllFactor(5)} / CAST(present + (32 - nb) * 134217728 AS DOUBLE) AS hll_est,
          |  n_exact
          |FROM ex JOIN hs USING (hr) ORDER BY hr""".stripMargin,

      // Same register replay as q75 (shard-merge collapses exactly to the
      // direct sketch because max is associative): reuse that arithmetic.
      "q102_hll_merge" ->
        s"""WITH ev AS (SELECT event_type, user_id AS key FROM events),
          |kh0 AS (SELECT event_type, (key * 1000003) % 2147483647 AS a0 FROM ev),
          |kh1 AS (SELECT event_type, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1 FROM kh0),
          |kh2 AS (SELECT event_type, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h FROM kh1),
          |br AS (SELECT event_type, h >> 26 AS b,
          |    CASE WHEN (h & 67108863) = 0 THEN 27
          |         ELSE 27 - length(bin(h & 67108863)) END AS rho FROM kh2),
          |mb AS (SELECT event_type, b, MAX(rho) AS mx FROM br GROUP BY event_type, b),
          |hs AS (SELECT event_type,
          |    SUM(CAST(1 AS BIGINT) << CAST(27 - mx AS INT)) AS present,
          |    COUNT(*) AS nb FROM mb GROUP BY event_type)
          |SELECT event_type,
          |  ${Sketches.hllFactor(5)} / CAST(present + (32 - nb) * 134217728 AS DOUBLE) AS hll_est
          |FROM hs ORDER BY event_type""".stripMargin,

      "q103_ann_recall" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          |  FROM embeddings WHERE vec_id < 5),
          |probe AS (SELECT query_id, qv, cid FROM (
          |    SELECT q.query_id, q.qv, c.cid,
          |      row_number() OVER (PARTITION BY q.query_id
          |        ORDER BY list_distance(qv, c.cv), c.cid) AS rn
          |    FROM q, c) WHERE rn <= 2),
          |approx AS (SELECT query_id, vec_id FROM (
          |    SELECT p.query_id, a.vec_id,
          |      row_number() OVER (PARTITION BY p.query_id
          |        ORDER BY 1.0 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), p.qv),
          |          a.vec_id) AS rk
          |    FROM a JOIN probe p ON a.centroid_id = p.cid) WHERE rk <= 3),
          |exact AS (SELECT query_id, vec_id FROM (
          |    SELECT q.query_id, e.vec_id,
          |      row_number() OVER (PARTITION BY q.query_id
          |        ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
          |          e.vec_id) AS rk
          |    FROM embeddings e, q) WHERE rk <= 3),
          |hits AS (SELECT x.query_id, COUNT(*) AS n_hit
          |  FROM exact x JOIN approx ap USING (query_id, vec_id)
          |  GROUP BY x.query_id)
          |SELECT qs.query_id, coalesce(h.n_hit, 0) AS n_hit,
          |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 3 AS recall
          |FROM (SELECT DISTINCT query_id FROM exact) qs
          |LEFT JOIN hits h USING (query_id) ORDER BY qs.query_id""".stripMargin,

      "q104_index_store" ->
        """WITH toks AS (SELECT doc_id AS id,
          |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term
          |  FROM documents),
          |tf AS (SELECT term, id, COUNT(*) AS tf FROM toks GROUP BY term, id)
          |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
          |  CAST(SUM(id * tf) AS BIGINT) AS dot_check
          |FROM tf WHERE term IN ('spark', 'join', 'vector')
          |GROUP BY term ORDER BY term""".stripMargin,

      "q97_inverted_index" ->
        """WITH toks AS (SELECT doc_id AS id,
          |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term
          |  FROM documents),
          |tf AS (SELECT term, id, COUNT(*) AS tf FROM toks GROUP BY term, id),
          |pos AS (SELECT term, id, tf,
          |    row_number() OVER (PARTITION BY term ORDER BY id) AS rn FROM tf)
          |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
          |  MIN(id) AS first_id, MAX(id) AS last_id,
          |  CAST(SUM(id * tf) AS BIGINT) AS dot_check,
          |  CAST(SUM(id * rn) AS BIGINT) AS ord_check
          |FROM pos GROUP BY term ORDER BY term""".stripMargin,

      "q98_bm25" -> bm25OracleSql,

      "q109_hybrid_rrf" ->
        s"""WITH lexbase AS ($bm25OracleSql),
          |lex AS (SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS INT) AS rank
          |  FROM lexbase),
          |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
          |dense AS (SELECT vec_id AS id, rank FROM (
          |    SELECT e.vec_id,
          |      CAST(row_number() OVER (ORDER BY
          |        1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv),
          |        e.vec_id) AS INT) AS rank
          |    FROM embeddings e, q) WHERE rank <= 20),
          |u AS (SELECT id, 1.0 / (60 + rank) AS contrib FROM lex
          |  UNION ALL SELECT id, 1.0 / (60 + rank) FROM dense)
          |SELECT id,
          |  CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE) AS rrf_score,
          |  COUNT(*) AS n_lists
          |FROM u GROUP BY id
          |ORDER BY rrf_score DESC, id LIMIT 10""".stripMargin,

      "q110_window_anomaly" ->
        """WITH ev AS (SELECT event_id, event_type, value FROM events),
          |st AS (SELECT event_type, COUNT(*) AS n,
          |    CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS s,
          |    CAST(SUM(CAST(value * value AS DECIMAL(24,6))) AS DOUBLE) AS ss
          |  FROM ev GROUP BY event_type)
          |SELECT event_id, event_type, value,
          |  (value - s / n) / sqrt((ss - s * s / n) / n) AS z
          |FROM ev JOIN st USING (event_type)
          |WHERE abs((value - s / n) / sqrt((ss - s * s / n) / n)) > 2.0
          |ORDER BY event_id""".stripMargin,

      "q111_group_corr" ->
        """WITH st AS (SELECT l_returnflag, COUNT(*) AS n,
          |    CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sx,
          |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sy,
          |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sxx,
          |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS syy,
          |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sxy
          |  FROM lineitem GROUP BY l_returnflag)
          |SELECT l_returnflag, n,
          |  round((n * sxy - sx * sy) /
          |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12) AS corr
          |FROM st ORDER BY l_returnflag""".stripMargin,

      "q107_retention" ->
        """WITH ev AS (SELECT DISTINCT user_id,
          |    CAST((CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01') // 7 AS INT) AS wk
          |  FROM events),
          |cohort AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id),
          |sizes AS (SELECT cohort_week, COUNT(*) AS cohort_n FROM cohort GROUP BY cohort_week),
          |m AS (SELECT c.cohort_week, e.wk, COUNT(*) AS n_users
          |  FROM ev e JOIN cohort c USING (user_id) GROUP BY c.cohort_week, e.wk)
          |SELECT m.cohort_week, m.wk - m.cohort_week AS week_offset, n_users,
          |  CAST(n_users AS DOUBLE) / cohort_n AS frac
          |FROM m JOIN sizes USING (cohort_week)
          |ORDER BY cohort_week, week_offset""".stripMargin,

      "q108_hist_quantiles" ->
        """WITH h AS (SELECT CAST(least(greatest(floor((l_quantity - 0.0) / 1.0), 0), 49) AS BIGINT) AS b,
          |    COUNT(*) AS c
          |  FROM lineitem GROUP BY b),
          |cum AS (SELECT b, c, CAST(SUM(c) OVER (ORDER BY b) AS BIGINT) AS cum FROM h),
          |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
          |qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
          |t AS (SELECT q, CAST(ceil(q * n) AS BIGINT) AS target FROM qs, n),
          |sel AS (SELECT q, target, b, c, cum,
          |    row_number() OVER (PARTITION BY q ORDER BY b) AS rn
          |  FROM t JOIN cum ON cum >= target)
          |SELECT q, 0.0 + 1.0 * (b + CAST(target - (cum - c) AS DOUBLE) / c) AS est
          |FROM sel WHERE rn = 1 ORDER BY q""".stripMargin,
      // index-served BM25 is arithmetic-identical to the scan path —
      // same oracle proves the persisted index serves the same scores
      "q106_index_bm25" -> bm25OracleSql,

      "q99_c4_lines" ->
        """WITH d AS (SELECT doc_id,
          |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
          |  FROM documents),
          |l AS (SELECT doc_id,
          |    CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
          |    ELSE list_transform(range(0, CAST(floor((len(toks) - 1) / 12) AS BIGINT) + 1),
          |      i -> array_to_string(toks[CAST(i * 12 + 1 AS INT) : CAST(i * 12 + 12 AS INT)], ' '))
          |    END AS lines
          |  FROM d),
          |k AS (SELECT doc_id, lines,
          |    list_filter(lines, (ln, i) ->
          |      len(list_filter(str_split(ln, ' '), w -> w <> '')) >= 5
          |      AND len(list_filter(['slow'], w -> list_contains(str_split(ln, ' '), w))) = 0
          |      AND list_position(lines, ln) = i) AS kept_lines
          |  FROM l)
          |SELECT doc_id, CAST(len(lines) AS INT) AS n_lines,
          |  CAST(len(kept_lines) AS INT) AS n_kept,
          |  len(kept_lines) >= 2 AS kept,
          |  CAST(length(coalesce(array_to_string(kept_lines, ' '), '')) AS INT) AS kept_len
          |FROM k ORDER BY doc_id""".stripMargin,

      "q101_knn_graph" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |p AS (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
          |    AND l.vec_id <> r.vec_id),
          |rk AS (SELECT id, nbr_id, distance,
          |    CAST(row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS INT) AS rank
          |  FROM p)
          |SELECT id, rank, nbr_id, round(distance, 6) AS distance
          |FROM rk WHERE rank <= 3 ORDER BY id, rank""".stripMargin,

      // q101's graph replayed, then one NN-descent round: undirected
      // expansion → neighbor-of-neighbor candidates → cosine re-rank →
      // recall@3 of base vs refined on the sampled nodes
      "q119_nn_descent" ->
        """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id < 8),
          |a AS (SELECT vec_id, embedding, centroid_id FROM (
          |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
          |      row_number() OVER (PARTITION BY e.vec_id
          |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
          |    FROM embeddings e, c) WHERE rn = 1),
          |p AS (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
          |    AND l.vec_id <> r.vec_id),
          |g0 AS (SELECT id, nbr_id, distance FROM (
          |    SELECT id, nbr_id, distance,
          |      row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rk
          |    FROM p) WHERE rk <= 3),
          |seed AS (SELECT id, nbr_id FROM g0
          |  UNION ALL SELECT l.vec_id AS id, r.vec_id AS nbr_id
          |  FROM embeddings l JOIN embeddings r ON r.vec_id = l.vec_id + 1),
          |und AS (SELECT id, nbr_id FROM seed
          |  UNION SELECT nbr_id AS id, id AS nbr_id FROM seed),
          |nn AS (SELECT x.id, y.nbr_id FROM und x JOIN und y ON x.nbr_id = y.id
          |    WHERE x.id <> y.nbr_id
          |  UNION SELECT id, nbr_id FROM und),
          |sc AS (SELECT nn.id, nn.nbr_id,
          |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
          |      CAST(r.embedding AS DOUBLE[])) AS distance
          |  FROM nn JOIN embeddings l ON nn.id = l.vec_id
          |    JOIN embeddings r ON nn.nbr_id = r.vec_id),
          |g1 AS (SELECT id, nbr_id FROM (
          |    SELECT id, nbr_id,
          |      row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rk
          |    FROM sc) WHERE rk <= 3),
          |q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
          |  FROM embeddings WHERE vec_id < 50),
          |ex AS (SELECT qid AS id, vec_id AS nbr_id FROM (
          |    SELECT q.qid, e.vec_id,
          |      row_number() OVER (PARTITION BY q.qid
          |        ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
          |          e.vec_id) AS rk
          |    FROM embeddings e, q WHERE e.vec_id <> q.qid) WHERE rk <= 3),
          |hb AS (SELECT ex.id, COUNT(*) AS n FROM ex
          |  JOIN (SELECT id, nbr_id FROM g0 WHERE id < 50) b USING (id, nbr_id)
          |  GROUP BY ex.id),
          |hr AS (SELECT ex.id, COUNT(*) AS n FROM ex
          |  JOIN (SELECT id, nbr_id FROM g1 WHERE id < 50) r USING (id, nbr_id)
          |  GROUP BY ex.id)
          |SELECT qs.id,
          |  CAST(coalesce(hb.n, 0) AS BIGINT) AS n_hit_base,
          |  CAST(coalesce(hb.n, 0) AS DOUBLE) / 3 AS recall_base,
          |  CAST(coalesce(hr.n, 0) AS BIGINT) AS n_hit_ref,
          |  CAST(coalesce(hr.n, 0) AS DOUBLE) / 3 AS recall_ref
          |FROM (SELECT DISTINCT id FROM ex) qs
          |LEFT JOIN hb USING (id) LEFT JOIN hr USING (id)
          |ORDER BY qs.id""".stripMargin,
      "q36_embedding_neardup" -> embeddingNearDupOracleSql,
      "q19_mmr" -> mmrOracleSql,
      "q32_embed_search" -> embedSearchOracleSql,

      // File-corpus ingest: the corpus q41 loads is generated from the
      // documents table plus constant files, so the expected parse
      // dispatch and text lengths are exactly derivable: txt/md parse
      // directly; real.pdf extracts "Hello from a real PDF" (21) via the
      // JDK Tj parser; report.docx extracts two paragraphs (35) via
      // zip+XML; binary.pdf has no text stream → "[pdf-no-text bytes=9]"
      // (21 chars); .bin is skipped.
      "q41_file_ingest" ->
        """SELECT 'doc' || CAST(doc_id AS VARCHAR) || '.txt' AS filename,
          |  'txt' AS ext, true AS parse_ok, CAST(length(text) AS INT) AS text_len,
          |  CAST(NULL AS VARCHAR) AS skip_reason
          |FROM documents WHERE doc_id < 20
          |UNION ALL SELECT 'readme.md', 'md', true, 8, NULL
          |UNION ALL SELECT 'binary.pdf', 'pdf', true, 21, NULL
          |UNION ALL SELECT 'real.pdf', 'pdf', true, 21, NULL
          |UNION ALL SELECT 'report.docx', 'docx', true, 35, NULL
          |UNION ALL SELECT 'table.xlsx', 'xlsx', true, 18, NULL
          |UNION ALL SELECT 'data.bin', 'bin', false, NULL, 'unsupported extension: bin'
          |ORDER BY filename""".stripMargin
    )
  }

  /** End-to-end RAG-slice oracle: chunk (200/50) → dedup-keep-min-id →
    * stub feature-hash embed → top-8 cosine with normalized score — the
    * identical pipeline embedSearch runs through the parquet store, replayed
    * in one SQL statement (the store write is a side effect; the oracle
    * checks the retrieval result). The query vector is the Scala stub's
    * output embedded as exact-double literals. */
  private def embedSearchOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val qv = pipeline.Embedder.stubEmbed(64)(Seq("spark join stream merge")).head
    val qvLits = qv.map(f => f.toDouble.toString).mkString("[", ", ", "]")
    val toks = "list_filter(regexp_split_to_array(lower(ctext), '\\W+'), x -> x <> '')"
    val tokHash = s"list_reduce(list_transform(range(1, length(t) + 1), " +
      s"j -> CAST(unicode(substring(t, CAST(j AS INT), 1)) AS BIGINT)), " +
      s"(a, c) -> (a * $b1 + c) % 2147483647)"
    val dist = s"1.0 - list_cosine_similarity(CAST(v AS DOUBLE[]), $qvLits)"
    s"""WITH chunks AS (
       |  SELECT CAST(doc_id AS VARCHAR) || '_' || CAST(s // 150 AS VARCHAR) AS id,
       |    substring(text, CAST(s AS INT) + 1, 200) AS ctext
       |  FROM documents, unnest(range(0, length(text), 150)) AS t(s)),
       |dedup AS (
       |  SELECT id, ctext FROM (
       |    SELECT id, ctext,
       |      row_number() OVER (PARTITION BY md5(ctext) ORDER BY id) AS rn
       |    FROM chunks) WHERE rn = 1),
       |hashed AS (
       |  SELECT id, ctext, list_transform($toks, t -> $tokHash) AS hs FROM dedup),
       |raws AS (
       |  SELECT id, ctext, list_transform(range(0, 64), b ->
       |      len(list_filter(hs, h -> h % 64 = b AND ((h >> 6) & 1) = 0))
       |    - len(list_filter(hs, h -> h % 64 = b AND ((h >> 6) & 1) = 1))) AS raw
       |  FROM hashed),
       |normed AS (
       |  SELECT id, ctext,
       |    sqrt(CAST(list_reduce(list_transform(raw, x -> x * x), (a, c) -> a + c) AS DOUBLE)) AS nrm,
       |    raw
       |  FROM raws),
       |emb AS (
       |  SELECT id, ctext,
       |    CASE WHEN nrm > 0
       |      THEN list_transform(raw, x -> CAST(CAST(x AS DOUBLE) / nrm AS FLOAT))
       |      ELSE list_transform(raw, x -> CAST(0.0 AS FLOAT)) END AS v
       |  FROM normed)
       |SELECT id, ctext AS text, round(1.0 - ($dist) / 2.0, 6) AS score
       |FROM emb
       |ORDER BY $dist, id
       |LIMIT 8""".stripMargin
  }

  /** Replays q203: the q32 chunk→stub-embed chain (no dedup) carrying
    * doc_id, then per-(doc, dim) DECIMAL(38,18) mean sums and the pooled
    * norm under one IEEE sqrt. */
  private def meanPoolOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val toks = "list_filter(regexp_split_to_array(lower(ctext), '\\W+'), x -> x <> '')"
    val tokHash = s"list_reduce(list_transform(range(1, length(t) + 1), " +
      s"j -> CAST(unicode(substring(t, CAST(j AS INT), 1)) AS BIGINT)), " +
      s"(a, c) -> (a * $b1 + c) % 2147483647)"
    s"""WITH chunks AS (
       |  SELECT doc_id, substring(text, CAST(s AS INT) + 1, 200) AS ctext
       |  FROM documents, unnest(range(0, length(text), 150)) AS t(s)),
       |hashed AS (
       |  SELECT doc_id, list_transform($toks, t -> $tokHash) AS hs FROM chunks),
       |raws AS (
       |  SELECT doc_id, list_transform(range(0, 64), b ->
       |      len(list_filter(hs, h -> h % 64 = b AND ((h >> 6) & 1) = 0))
       |    - len(list_filter(hs, h -> h % 64 = b AND ((h >> 6) & 1) = 1))) AS raw
       |  FROM hashed),
       |normed AS (
       |  SELECT doc_id,
       |    sqrt(CAST(list_reduce(list_transform(raw, x -> x * x), (a, c) -> a + c) AS DOUBLE)) AS nrm,
       |    raw
       |  FROM raws),
       |emb AS (
       |  SELECT doc_id,
       |    CASE WHEN nrm > 0
       |      THEN list_transform(raw, x -> CAST(CAST(x AS DOUBLE) / nrm AS FLOAT))
       |      ELSE list_transform(raw, x -> CAST(0.0 AS FLOAT)) END AS v
       |  FROM normed),
       |px AS (
       |  SELECT doc_id, CAST(i AS INT) AS dim,
       |    CAST(v[CAST(i AS INT) + 1] AS DOUBLE) AS x
       |  FROM emb, unnest(range(0, 64)) AS t(i)),
       |m AS (
       |  SELECT doc_id, dim, count(*) AS n,
       |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS s
       |  FROM px GROUP BY doc_id, dim)
       |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chunks,
       |  round(sqrt(CAST(SUM(CAST((s / n) * (s / n) AS DECIMAL(38,18))) AS DOUBLE)), 6)
       |    AS pool_norm
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** MMR oracle: the k=5 greedy selection unrolled into chained CTEs —
    * each step picks the argmax of λ·sim(q,d) − (1−λ)·max sim(d, selected)
    * over the remaining candidates, exactly like Similarity.mmr. The
    * driver-side cosine (dot / sqrt(na*nb), sequential left folds) is
    * replayed with explicit list_reduce folds so the doubles match
    * bit-for-bit. */
  private def mmrOracleSql: String = {
    def cosSql(a: String, b: String): String = {
      def f(p: String) =
        s"list_reduce(list_transform(range(1, 65), i -> $p), (x, y) -> x + y)"
      val dot = f(s"$a[CAST(i AS INT)] * $b[CAST(i AS INT)]")
      val na = f(s"$a[CAST(i AS INT)] * $a[CAST(i AS INT)]")
      val nb = f(s"$b[CAST(i AS INT)] * $b[CAST(i AS INT)]")
      s"CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 ELSE $dot / sqrt($na * $nb) END"
    }
    val k = 5
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
       |cand AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings, q
       |  ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), vec_id
       |  LIMIT 20),
       |scored AS MATERIALIZED (SELECT vec_id, v, ${cosSql("v", "qv")} AS rel FROM cand, q),
       |sel1 AS (SELECT vec_id, v, 0.5 * rel - 0.5 * 0.0 AS score
       |  FROM scored ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    for (n <- 2 to k) {
      val prevIds = (1 until n).map(i => s"SELECT vec_id FROM sel$i").mkString(" UNION ALL ")
      val prevSel = (1 until n).map(i => s"SELECT v FROM sel$i").mkString(" UNION ALL ")
      // join + group-by rather than a correlated scalar subquery: DuckDB
      // lambdas cannot capture correlated outer columns
      sb ++= s""",
         |rem$n AS (SELECT * FROM scored WHERE vec_id NOT IN ($prevIds)),
         |div$n AS (
         |  SELECT r.vec_id, max(${cosSql("r.v", "s.v")}) AS div
         |  FROM rem$n r CROSS JOIN ($prevSel) s GROUP BY r.vec_id),
         |sel$n AS (
         |  SELECT r.vec_id, r.v, 0.5 * r.rel - 0.5 * d.div AS score
         |  FROM rem$n r JOIN div$n d ON r.vec_id = d.vec_id
         |  ORDER BY score DESC, r.vec_id LIMIT 1)""".stripMargin
    }
    sb ++= (1 to k).map(n =>
        s"SELECT CAST($n AS INT) AS rank, vec_id, round(score, 6) AS mmr_score FROM sel$n")
      .mkString("\nSELECT rank, vec_id, mmr_score FROM (\n", "\nUNION ALL\n", "\n) ORDER BY rank")
    sb.toString
  }

  // ---- Generated oracles for the hash/LSH pipelines --------------------
  // The Spark side uses rolling-polynomial hashes and seeded constants
  // precisely so these oracles can replay the IDENTICAL arithmetic in
  // DuckDB: same shingle/token hashes, same permutations, same banding,
  // same pair expansion — an exact-match check of the whole LSH pipeline,
  // not just a row count.

  private val HP = 2147483647L // 2^31-1, mirrors HashExpressions.P
  // Band-bucket cap replayed in the oracle CTEs (QUALIFY) so the Spark
  // side's over-full-bucket drop can never cause a spurious mismatch.
  private val MaxBucket = operators.Dedup.DefaultMaxBucketSize

  /** DuckDB rolling polynomial over the chars of `s` — twin of
    * HashExpressions.shinglePolyEval / Dedup's aggregate(...) form.
    * (list_reduce starts from the first element; Spark's aggregate starts
    * from 0, and (0*B + c1) % p == c1, so the folds coincide.) */
  private def duckPoly(s: String, base: Long): String =
    s"list_reduce(list_transform(range(1, length($s) + 1), " +
      s"j -> CAST(unicode(substring($s, CAST(j AS INT), 1)) AS BIGINT)), " +
      s"(a, c) -> (a * $base + c) % $HP)"

  /** Full-corpus near-dup input: every document plus a 7-chars-shorter twin
    * (same construction as q20/q21's Spark side). */
  private val nearDupCorpus =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id,
      |  substring(text, 1, greatest(length(text) - 7, 1)) AS text
      |FROM documents""".stripMargin

  /** The corpus→signatures→bands→candidate-pairs CTE chain shared by the
    * minhash-pairs and cluster-dedup oracles. */
  private def minhashPairCtes: String = minhashPairCtesFor(nearDupCorpus)

  /** [[minhashPairCtes]] over an arbitrary corpus SELECT — the q143
    * recall gate runs the same signature/band replay on a bounded
    * slice. */
  private def minhashPairCtesFor(corpusSql: String): String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val (as, bs) = graft.plans.HashExpressions.minhashCoeffs(64)
    val winHash = "list_reduce(list_transform(range(i, i + 5), " +
      "j -> CAST(unicode(substring(text, CAST(j AS INT), 1)) AS BIGINT)), " +
      s"(a, c) -> (a * $b1 + c) % $HP)"
    val sig = (0 until 64)
      .map(k => s"list_min(list_transform(hashes, h -> (h * ${as(k)} + ${bs(k)}) % $HP))")
      .mkString("[", ",\n    ", "]")
    s"""corpus AS ($corpusSql),
       |hs AS (
       |  SELECT doc_id, CASE WHEN length(text) < 5
       |    THEN [${duckPoly("text", b1)}]
       |    ELSE list_distinct(list_transform(range(1, length(text) - 3), i -> $winHash))
       |    END AS hashes
       |  FROM corpus WHERE length(text) > 0),
       |sigs AS (SELECT doc_id, $sig AS sig FROM hs),
       |banded0 AS (
       |  SELECT doc_id, sig, b,
       |    list_reduce(list_transform(range(b * 8 + 1, b * 8 + 9), k -> sig[CAST(k AS INT)]),
       |      (a, v) -> (a * $b1 + v) % $HP) AS band_hash
       |  FROM sigs, unnest(range(0, 8)) AS t(b)),
       |banded AS (
       |  SELECT * FROM banded0
       |  QUALIFY COUNT(*) OVER (PARTITION BY b, band_hash) <= $MaxBucket),
       |pairs AS (
       |  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
       |    greatest(x.doc_id, y.doc_id) AS doc_b,
       |    list_count(list_filter(range(1, 65),
       |      i -> x.sig[CAST(i AS INT)] = y.sig[CAST(i AS INT)])) / 64.0 AS est_jaccard
       |  FROM banded x JOIN banded y
       |    ON x.b = y.b AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)""".stripMargin
  }

  private def minhashOracleSql: String =
    s"""WITH $minhashPairCtes
       |SELECT doc_a, doc_b, est_jaccard FROM pairs
       |WHERE est_jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin

  /** Replays q143: the q20 signature/band arithmetic AND the q142
    * brute-force exact Jaccard, both over the bounded near-dup corpus,
    * folded to the single recall/precision stats row. */
  private def lshRecallOracleSql: String = {
    val boundedCorpus =
      """SELECT doc_id, text FROM documents WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id,
        |  substring(text, 1, greatest(length(text) - 7, 1)) AS text
        |FROM documents WHERE doc_id < 300""".stripMargin
    s"""WITH ${minhashPairCtesFor(boundedCorpus)},
       |lsh AS (SELECT doc_a, doc_b FROM pairs WHERE est_jaccard >= 0.8),
       |g AS (
       |  SELECT DISTINCT doc_id, substring(text, CAST(s AS INT) + 1, 5) AS tok
       |  FROM corpus, unnest(range(0, length(text) - 4, 1)) AS t(s)
       |  WHERE length(text) >= 5
       |  UNION
       |  SELECT doc_id, text AS tok FROM corpus WHERE length(text) < 5),
       |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
       |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS nc
       |  FROM g a JOIN g b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |ex AS (SELECT doc_a, doc_b FROM pr
       |  JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
       |  WHERE CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) >= 0.8),
       |hit AS (SELECT ex.doc_a, ex.doc_b FROM ex JOIN lsh USING (doc_a, doc_b))
       |SELECT (SELECT count(*) FROM ex) AS n_exact,
       |  (SELECT count(*) FROM lsh) AS n_lsh,
       |  (SELECT count(*) FROM hit) AS n_hit,
       |  CAST((SELECT count(*) FROM hit) AS DOUBLE) /
       |    (SELECT count(*) FROM ex) AS recall,
       |  CAST((SELECT count(*) FROM hit) AS DOUBLE) /
       |    (SELECT count(*) FROM lsh) AS precision""".stripMargin
  }

  /** Incremental-dedup oracle: signatures/bands for the stored corpus and
    * the 50-doc new batch (same arithmetic as [[minhashPairCtes]]), joined
    * on the band bucket — no bucket cap, matching the probe operator. */
  private def incrementalDedupOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val (as, bs) = graft.plans.HashExpressions.minhashCoeffs(64)
    val winHash = "list_reduce(list_transform(range(i, i + 5), " +
      "j -> CAST(unicode(substring(text, CAST(j AS INT), 1)) AS BIGINT)), " +
      s"(a, c) -> (a * $b1 + c) % $HP)"
    val sig = (0 until 64)
      .map(k => s"list_min(list_transform(hashes, h -> (h * ${as(k)} + ${bs(k)}) % $HP))")
      .mkString("[", ",\n    ", "]")
    def side(src: String, p: String): String =
      s"""hs_$p AS (
         |  SELECT doc_id, CASE WHEN length(text) < 5
         |    THEN [${duckPoly("text", b1)}]
         |    ELSE list_distinct(list_transform(range(1, length(text) - 3), i -> $winHash))
         |    END AS hashes
         |  FROM $src WHERE length(text) > 0),
         |sigs_$p AS (SELECT doc_id, $sig AS sig FROM hs_$p),
         |banded_$p AS (
         |  SELECT doc_id, sig, b,
         |    list_reduce(list_transform(range(b * 8 + 1, b * 8 + 9), k -> sig[CAST(k AS INT)]),
         |      (a, v) -> (a * $b1 + v) % $HP) AS band_hash
         |  FROM sigs_$p, unnest(range(0, 8)) AS t(b))""".stripMargin
    s"""WITH newd AS (
       |  SELECT doc_id + 1000000 AS doc_id,
       |    substring(text, 1, greatest(length(text) - 7, 1)) AS text
       |  FROM documents WHERE doc_id < 50),
       |${side("documents", "st")},
       |${side("newd", "nw")}
       |, capped_st AS (
       |  SELECT doc_id, sig, b, band_hash FROM banded_st
       |  QUALIFY COUNT(*) OVER (PARTITION BY b, band_hash)
       |    <= ${graft.operators.Dedup.DefaultMaxBucketSize})
       |SELECT DISTINCT n.doc_id AS new_id, s.doc_id AS stored_id,
       |  list_count(list_filter(range(1, 65),
       |    i -> n.sig[CAST(i AS INT)] = s.sig[CAST(i AS INT)])) / 64.0 AS est_jaccard
       |FROM banded_nw n JOIN capped_st s
       |  ON n.b = s.b AND n.band_hash = s.band_hash
       |WHERE list_count(list_filter(range(1, 65),
       |    i -> n.sig[CAST(i AS INT)] = s.sig[CAST(i AS INT)])) / 64.0 >= 0.8
       |ORDER BY new_id, stored_id""".stripMargin
  }

  /** PQ oracle: replay encode (per-subspace struct-sort argmin over the
    * same seeded codebook literals, list_reduce first-element init ≡ the
    * Spark 0D fold) and ADC scoring (the query's distance table recomputed
    * from the same literals, summed left-to-right like the Spark
    * `aggregate(sequence(...))` fold). */
  /** Shared DuckDB replay of the PQ (64, m=4, ksub=4) arithmetic: per-
    * subspace squared-L2 vs the seeded codebook literals. Returns the
    * per-subspace distance on slice `s` vs centroid `c` of `vecExpr`. */
  private lazy val pqCb = operators.Quantization.pqCodebook(64, 4, 4)
  private def pqSliceDistSql(vecExpr: String, s: Int, c: Int): String = {
    val lits = pqCb(s)(c).mkString("[", ", ", "]")
    val x = s"CAST($vecExpr[CAST(${s * 16} + i AS INT)] AS DOUBLE)"
    s"list_reduce(list_transform(range(1, 17), i -> " +
      s"($x - ($lits)[CAST(i AS INT)]) * ($x - ($lits)[CAST(i AS INT)])), (a, v) -> a + v)"
  }
  /** `code0..code3 AS ...` select-list for PQ-encoding `vecExpr`. */
  private def pqCodeColsSql(vecExpr: String): String = {
    def codeExpr(s: Int): String = {
      val structs = (0 until 4)
        .map(c => s"struct_pack(d := ${pqSliceDistSql(vecExpr, s, c)}, c := $c)")
        .mkString(", ")
      s"((list_sort([$structs]))[1]).c"
    }
    (0 until 4).map(s => s"${codeExpr(s)} AS code$s").mkString(",\n    ")
  }
  /** ADC sum over `code0..code3` against the query's distance table. */
  private def pqAdcSql: String = {
    def tList(s: Int): String =
      (0 until 4).map(c => pqSliceDistSql("qv", s, c)).mkString("[", ", ", "]")
    (0 until 4).map(s => s"(${tList(s)})[code$s + 1]").mkString(" + ")
  }

  private def pqOracleSql: String = {
    val adc = pqAdcSql
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 3),
       |coded AS (SELECT e.vec_id,
       |    ${pqCodeColsSql("e.embedding")},
       |    qv
       |  FROM embeddings e, q)
       |SELECT vec_id, round($adc, 6) AS adc_dist
       |FROM coded ORDER BY $adc, vec_id LIMIT 10""".stripMargin
  }

  /** q180: q54's assign/probe CTEs composed with q124's code/ADC replay,
    * then the exact-cosine rerank of the ADC shortlist. */
  private def ivfpqOracleSql: String = {
    val adc = pqAdcSql
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 5),
       |c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |assign AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT e.vec_id, c.cid AS centroid_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
       |    FROM embeddings e, c) WHERE rn = 1),
       |probes AS (SELECT cid FROM c, q ORDER BY list_distance(cv, qv), cid LIMIT 2),
       |cell AS (
       |  SELECT e.vec_id, e.embedding, a.centroid_id FROM embeddings e
       |  JOIN assign a ON e.vec_id = a.vec_id
       |  WHERE a.centroid_id IN (SELECT cid FROM probes)),
       |coded AS (SELECT cell.vec_id, cell.centroid_id, cell.embedding,
       |    ${pqCodeColsSql("cell.embedding")},
       |    qv
       |  FROM cell, q),
       |short AS (SELECT vec_id, centroid_id, embedding, qv,
       |    round($adc, 6) AS adc_dist
       |  FROM coded ORDER BY $adc, vec_id LIMIT 12)
       |SELECT vec_id, centroid_id, adc_dist,
       |  round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS distance
       |FROM short
       |ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), vec_id
       |LIMIT 6""".stripMargin
  }

  /** Cluster-dedup oracle: transitive closure over the near-dup pairs via a
    * recursive CTE; each node's representative is the minimum doc_id
    * reachable in its component — exactly what iterative min-label
    * propagation converges to on the Spark side. */
  /** q151: the q56 cluster replay (same pair CTEs + transitive reach),
    * then split = keyHash_base999983(cluster rep) mod 10 over the FULL
    * corpus (singletons represent themselves), aggregated per split with
    * the global straddle audit. */
  private def splitAssignOracleSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs WHERE est_jaccard >= 0.8
       |  UNION
       |  SELECT doc_b AS s, doc_a AS d FROM pairs WHERE est_jaccard >= 0.8),
       |reach(s, d) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
       |labels AS (SELECT s AS doc_id, least(s, min(d)) AS rep
       |  FROM reach GROUP BY s),
       |j AS (SELECT c.doc_id, coalesce(l.rep, c.doc_id) AS rep,
       |    length(c.text) AS len
       |  FROM corpus c LEFT JOIN labels l USING (doc_id)),
       |sh0 AS (SELECT doc_id, rep, len, (rep * 999983) % 2147483647 AS h FROM j),
       |sh1 AS (SELECT doc_id, rep, len,
       |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM sh0),
       |sh2 AS (SELECT doc_id, rep, len,
       |    (xor(h, h >> 13) * 73244475) % 2147483647 AS h FROM sh1),
       |sp AS (SELECT doc_id, rep, len,
       |    CASE WHEN h % 10 < 8 THEN 'train'
       |         WHEN h % 10 = 8 THEN 'val' ELSE 'test' END AS split
       |  FROM sh2),
       |str AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_straddle FROM (
       |  SELECT rep FROM sp GROUP BY rep HAVING COUNT(DISTINCT split) > 1))
       |SELECT split, COUNT(*) AS n_docs,
       |  CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_clusters,
       |  CAST(SUM(len) AS BIGINT) AS n_chars, n_straddle
       |FROM sp, str GROUP BY split, n_straddle ORDER BY split""".stripMargin

  /** q155: the q56 cluster replay, then per-cluster size/chars with the
    * representative's chars via arg_min, histogrammed by cluster size. */
  private def dedupReportOracleSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs WHERE est_jaccard >= 0.8
       |  UNION
       |  SELECT doc_b AS s, doc_a AS d FROM pairs WHERE est_jaccard >= 0.8),
       |reach(s, d) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
       |labels AS (SELECT s AS doc_id, least(s, min(d)) AS rep
       |  FROM reach GROUP BY s),
       |j AS (SELECT c.doc_id, coalesce(l.rep, c.doc_id) AS rep,
       |    length(c.text) AS len
       |  FROM corpus c LEFT JOIN labels l USING (doc_id)),
       |pc AS (SELECT rep, COUNT(*) AS cluster_size,
       |    CAST(SUM(len) AS BIGINT) AS chars_total,
       |    CAST(arg_min(len, doc_id) AS BIGINT) AS chars_rep
       |  FROM j GROUP BY rep)
       |SELECT cluster_size, COUNT(*) AS n_clusters,
       |  CAST(SUM(chars_total) AS BIGINT) AS chars_total,
       |  CAST(SUM(chars_total - chars_rep) AS BIGINT) AS chars_savable
       |FROM pc GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** Shared CTE chain for q158/q159: the q100 classifier-margin replay
    * and the q71 Gopher gate, joined into `scored(doc_id, margin,
    * quality_pass)`. */
  private def scoredMarginCtes: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val b2 = graft.plans.HashExpressions.PolyBase2
    val mix = graft.plans.HashExpressions.Mix
    val tokenHash = s"(${duckPoly("t", b1)} * 2147483648 + ${duckPoly("t", b2)}) % $HP"
    s"""WITH ths AS (
       |  SELECT doc_id, list_transform(
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
       |    t -> $tokenHash) AS th
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    (th[CAST(i AS INT) + 1] * $b2 + th[CAST(i AS INT) + 2]) % $HP AS gh
       |  FROM ths, unnest(range(0, greatest(len(th) - 1, 0))) AS u(i)),
       |h0 AS (SELECT doc_id, (gh * $b1) % $HP AS h FROM grams),
       |h1 AS (SELECT doc_id, (xor(h, h >> 16) * $mix) % $HP AS h FROM h0),
       |h2 AS (SELECT doc_id, (xor(h, h >> 13) * $mix) % $HP AS h FROM h1),
       |cagg AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_feats,
       |    CAST(SUM(h % 1001 - 500) AS BIGINT) AS raw_margin
       |  FROM h2 GROUP BY doc_id),
       |marg AS (SELECT d.doc_id,
       |    CASE WHEN coalesce(a.n_feats, 0) = 0 THEN 0.0
       |      ELSE CAST(a.raw_margin AS DOUBLE) / (a.n_feats * 1000) END AS margin
       |  FROM documents d LEFT JOIN cagg a USING (doc_id)),
       |gt AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |gm AS (
       |  SELECT doc_id,
       |    CAST(len(t) AS INT) AS n_words,
       |    CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mean_word_len,
       |    CAST(len(list_filter(t, x -> x IN ('a','the','of','to','and','in','is','on','for','it'))) AS DOUBLE) / len(t) AS stopword_frac,
       |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS unique_frac
       |  FROM gt),
       |scored AS (SELECT m.doc_id, m.margin,
       |    (q.n_words >= 30 AND q.mean_word_len BETWEEN 4.0 AND 5.0
       |     AND q.stopword_frac >= 0.03 AND q.unique_frac >= 0.35) AS quality_pass
       |  FROM marg m JOIN gm q USING (doc_id))""".stripMargin
  }

  /** Replays q158: distinct-score tallies, cumulative negatives below,
    * doubled rank-sum `u2`, one final division. */
  private def classifierAucOracleSql: String =
    s"""$scoredMarginCtes,
       |bys AS (SELECT margin AS s,
       |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |    CAST(SUM(CASE WHEN quality_pass THEN 0 ELSE 1 END) AS BIGINT) AS nn
       |  FROM scored GROUP BY margin),
       |cum AS (SELECT np, nn,
       |    coalesce(SUM(nn) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_nn
       |  FROM bys)
       |SELECT CAST(SUM(np) AS BIGINT) AS n_pos, CAST(SUM(nn) AS BIGINT) AS n_neg,
       |  CAST(SUM(np * (2 * cum_nn + nn)) AS BIGINT) AS u2,
       |  CAST(SUM(np * (2 * cum_nn + nn)) AS DOUBLE) / (2 * SUM(np) * SUM(nn)) AS auc
       |FROM cum""".stripMargin

  /** Replays q159: the fixed [-0.5, 0.5] 10-bin float binning expression
    * verbatim, then per-bin integer tallies. */
  private def calibrationOracleSql: String =
    s"""$scoredMarginCtes
       |SELECT CAST(least(greatest(CAST(floor((margin + 0.5) * 10) AS INT), 0), 9) AS INT) AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS frac_pos,
       |  MIN(margin) AS min_score, MAX(margin) AS max_score
       |FROM scored GROUP BY 1 ORDER BY bin""".stripMargin

  /** Replays q160: the scramble-hash chain of `doc_id·131 + s` per
    * shard, argmax by (hash DESC, s), for 16 and 17 shards. */
  private def shardMovesOracleSql: String = {
    val mix = graft.plans.HashExpressions.Mix
    def assign(n: Int, name: String): String =
      s"""p$name AS (SELECT doc_id, CAST(s AS INT) AS s,
         |    ((CAST(doc_id AS BIGINT) * 131 + s) * 1000003) % $HP AS h
         |  FROM documents, unnest(range(0, $n)) AS r$name(s)),
         |q$name AS (SELECT doc_id, s, (xor(h, h >> 16) * $mix) % $HP AS h FROM p$name),
         |w$name AS (SELECT doc_id, s, (xor(h, h >> 13) * $mix) % $HP AS h FROM q$name),
         |a$name AS (SELECT doc_id, s AS shard FROM (
         |    SELECT doc_id, s,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s) AS rn
         |    FROM w$name) WHERE rn = 1)""".stripMargin
    s"""WITH ${assign(16, "c")},
       |${assign(17, "n")}
       |SELECT c.shard, CAST(COUNT(*) AS BIGINT) AS n_keys,
       |  CAST(SUM(CASE WHEN c.shard <> n.shard THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       |  CAST(SUM(CASE WHEN c.shard <> n.shard THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS moved_frac
       |FROM ac c JOIN an n USING (doc_id)
       |GROUP BY c.shard ORDER BY c.shard""".stripMargin
  }

  /** Replays q164: the q158 scored CTEs plus the q26 fingerprint with a
    * duplicate-count window, rolled up per source with a decimal-exact
    * margin mean. */
  private def domainReportOracleSql: String =
    s"""$scoredMarginCtes,
       |fp AS (SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(range(1, length(text) + 1),
       |        i -> CAST(ord(substring(text, CAST(i AS INT), 1)) AS BIGINT))),
       |      (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
       |  FROM documents),
       |fpn AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY fp) AS fpn FROM fp),
       |j AS (SELECT d.source, d.n_chars, s.margin, s.quality_pass, f.fpn
       |  FROM documents d JOIN scored s USING (doc_id) JOIN fpn f USING (doc_id))
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |  CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pass_rate,
       |  CAST(SUM(CASE WHEN fpn > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate,
       |  CAST(SUM(CAST(margin AS DECIMAL(24,6))) AS DOUBLE) / COUNT(*) AS mean_margin
       |FROM j GROUP BY source ORDER BY source""".stripMargin

  /** Replays q165: the near-dup corpus → per-char code points → k-gram
    * polynomial hashes (k=8) → min of each w=16 window → distinct
    * fingerprints → stop-fp cap (2..50 docs) → shared-fp pair counts.
    * Identical mod-p arithmetic to [[Winnowing.fingerprints]]; DuckDB's
    * first-element `list_reduce` init is made explicit with a prepended
    * 0 (0·31 + c₁ ≡ c₁). */
  private def winnowingOracleSql: String =
    s"""WITH corpus AS ($nearDupCorpus),
       |codes AS (
       |  SELECT doc_id, list_transform(range(1, length(text) + 1),
       |    i -> CAST(unicode(substring(text, CAST(i AS INT), 1)) AS BIGINT)) AS cs
       |  FROM corpus WHERE length(text) >= 23),
       |khash AS (
       |  SELECT doc_id, list_transform(range(1, len(cs) - 6),
       |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(cs, i, i + 7)),
       |      (acc, c) -> (acc * 31 + c) % 1000000007)) AS hs
       |  FROM codes),
       |fps AS (
       |  SELECT DISTINCT doc_id, fp
       |  FROM khash, unnest(list_distinct(list_transform(range(1, len(hs) - 14),
       |    t -> list_aggregate(list_slice(hs, t, t + 15), 'min')))) AS u(fp)),
       |bounded AS (
       |  SELECT doc_id, fp FROM fps
       |  QUALIFY COUNT(*) OVER (PARTITION BY fp) BETWEEN 2 AND 50)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM bounded x JOIN bounded y ON x.fp = y.fp AND x.doc_id < y.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= 4
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Replays q166: the q20 LSH pair CTEs, survivors joined back to their
    * texts and confirmed with DuckDB's own Levenshtein. */
  private def editVerifiedOracleSql: String =
    s"""WITH $minhashPairCtes,
       |ver AS (
       |  SELECT p.doc_a, p.doc_b, p.est_jaccard,
       |    CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
       |    1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
       |      / greatest(length(a.text), length(b.text)) AS edit_sim
       |  FROM pairs p
       |  JOIN corpus a ON p.doc_a = a.doc_id
       |  JOIN corpus b ON p.doc_b = b.doc_id
       |  WHERE p.est_jaccard >= 0.8)
       |SELECT doc_a, doc_b, est_jaccard, lev, edit_sim,
       |  edit_sim >= 0.9 AS verified
       |FROM ver ORDER BY doc_a, doc_b""".stripMargin

  /** Replays q167: the q103 IVF/exact CTE chain keeping ranks, then the
    * rational-discount DCG (L = lcm(1..3) = 6, gain 4−rank, integer
    * weight 6//r) and one final division. */
  private def ndcgOracleSql: String =
    """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings WHERE vec_id < 8),
      |a AS (SELECT vec_id, embedding, centroid_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
      |    FROM embeddings e, c) WHERE rn = 1),
      |q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      |  FROM embeddings WHERE vec_id < 5),
      |probe AS (SELECT query_id, qv, cid FROM (
      |    SELECT q.query_id, q.qv, c.cid,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_distance(qv, c.cv), c.cid) AS rn
      |    FROM q, c) WHERE rn <= 2),
      |approx AS (SELECT query_id, vec_id, rk FROM (
      |    SELECT p.query_id, a.vec_id,
      |      row_number() OVER (PARTITION BY p.query_id
      |        ORDER BY 1.0 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), p.qv),
      |          a.vec_id) AS rk
      |    FROM a JOIN probe p ON a.centroid_id = p.cid) WHERE rk <= 3),
      |exact AS (SELECT query_id, vec_id, rk FROM (
      |    SELECT q.query_id, e.vec_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv),
      |          e.vec_id) AS rk
      |    FROM embeddings e, q) WHERE rk <= 3),
      |rel AS (SELECT query_id, vec_id, CAST(4 - rk AS BIGINT) AS rel FROM exact),
      |dcg AS (SELECT ap.query_id,
      |    CAST(SUM(coalesce(r.rel, 0) * (6 // ap.rk)) AS BIGINT) AS dcg_num
      |  FROM approx ap LEFT JOIN rel r USING (query_id, vec_id)
      |  GROUP BY ap.query_id),
      |idcg AS (SELECT query_id,
      |    CAST(SUM(rel * (6 // (4 - rel))) AS BIGINT) AS idcg_num
      |  FROM rel GROUP BY query_id)
      |SELECT i.query_id, coalesce(d.dcg_num, 0) AS dcg_num, i.idcg_num,
      |  CAST(coalesce(d.dcg_num, 0) AS DOUBLE) / i.idcg_num AS ndcg
      |FROM idcg i LEFT JOIN dcg d USING (query_id) ORDER BY i.query_id""".stripMargin

  /** Replays q168: the q158 scored CTEs plus the classifier label
    * (raw_margin > 0, 0-feature docs labelled false via the left join),
    * folded to the 2×2 contingency table and the exact-integer κ. */
  private def raterKappaOracleSql: String = {
    val chance = "(n_both + n_a_only) * (n_both + n_b_only) + " +
      "(n_b_only + n_neither) * (n_a_only + n_neither)"
    s"""$scoredMarginCtes,
       |lbl AS (SELECT d.doc_id, coalesce(a.raw_margin, 0) > 0 AS label
       |  FROM documents d LEFT JOIN cagg a USING (doc_id)),
       |j AS (SELECT l.label, s.quality_pass
       |  FROM lbl l JOIN scored s USING (doc_id)),
       |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN label AND quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       |  CAST(SUM(CASE WHEN label AND NOT quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
       |  CAST(SUM(CASE WHEN NOT label AND quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only,
       |  CAST(SUM(CASE WHEN NOT label AND NOT quality_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
       |  FROM j)
       |SELECT n, n_both, n_a_only, n_b_only, n_neither,
       |  CAST(n_both + n_neither AS DOUBLE) / n AS po,
       |  CAST($chance AS DOUBLE) / (n * n) AS pe,
       |  CAST(n * (n_both + n_neither) - ($chance) AS DOUBLE)
       |    / (n * n - ($chance)) AS kappa
       |FROM agg""".stripMargin
  }

  /** Replays q169 for n = 1..3: token n-grams joined with spaces,
    * counted total and distinct per source. */
  private def distinctNgramsOracleSql: String = {
    val per = (1 to 3).map { n =>
      s"""SELECT source, CAST($n AS INT) AS n,
         |  CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct
         |FROM (SELECT source, unnest(list_transform(
         |    range(1, greatest(len(t) - ${n - 1}, 0) + 1),
         |    i -> array_to_string(list_slice(t, i, i + ${n - 1}), ' '))) AS g
         |  FROM toks)
         |GROUP BY source""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT source, list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |    x -> x <> '') AS t
       |  FROM documents)
       |SELECT source, n, n_total, n_distinct,
       |  CAST(n_distinct AS DOUBLE) / n_total AS distinct_ratio
       |FROM ($per)
       |ORDER BY source, n""".stripMargin
  }

  /** Replays q172: greedy k-center unrolled CTE-per-pick (the q19 MMR
    * oracle pattern), with the cosine fold replayed in the same
    * index order and √na·√nb denominator as CosineDistanceExpr. */
  private def kcenterOracleSql: String = {
    def fold(p: String) =
      s"list_reduce(list_transform(range(1, 65), i -> $p), (x, y) -> x + y)"
    def cosDist(a: String, b: String): String = {
      val dot = fold(s"$a[CAST(i AS INT)] * $b[CAST(i AS INT)]")
      val na = fold(s"$a[CAST(i AS INT)] * $a[CAST(i AS INT)]")
      val nb = fold(s"$b[CAST(i AS INT)] * $b[CAST(i AS INT)]")
      s"CASE WHEN sqrt($na) * sqrt($nb) = 0 THEN 1.0 " +
        s"ELSE 1.0 - $dot / (sqrt($na) * sqrt($nb)) END"
    }
    val k = 6
    val sb = new StringBuilder
    sb ++= """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sel1 AS (SELECT vec_id, v, 0.0 AS d FROM emb
      |  WHERE vec_id = (SELECT min(vec_id) FROM emb))""".stripMargin
    for (n <- 2 to k) {
      val prevIds = (1 until n).map(i => s"SELECT vec_id FROM sel$i").mkString(" UNION ALL ")
      val prevSel = (1 until n).map(i => s"SELECT v FROM sel$i").mkString(" UNION ALL ")
      sb ++= s""",
         |rem$n AS (SELECT * FROM emb WHERE vec_id NOT IN ($prevIds)),
         |d$n AS (SELECT r.vec_id, min(${cosDist("r.v", "s.v")}) AS d
         |  FROM rem$n r CROSS JOIN ($prevSel) s GROUP BY r.vec_id),
         |sel$n AS (SELECT r.vec_id, r.v, d.d
         |  FROM rem$n r JOIN d$n d ON r.vec_id = d.vec_id
         |  ORDER BY d.d DESC, r.vec_id LIMIT 1)""".stripMargin
    }
    sb ++= (1 to k).map(n =>
        s"SELECT CAST($n AS INT) AS sel_rank, vec_id, round(d, 6) AS dist FROM sel$n")
      .mkString("\nSELECT sel_rank, vec_id, dist FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY sel_rank")
    sb.toString
  }

  /** Replays q161: the q101 graph canonicalized to a < b, degree-sum
    * wedges, and the (a,b)⋈(b,c)⋈(a,c) triangle join. */
  private def knnTrianglesOracleSql: String =
    s"""$knnEdgesPrefixSql,
       |und AS (SELECT DISTINCT least(id, nbr_id) AS a, greatest(id, nbr_id) AS b
       |  FROM g0 WHERE id <> nbr_id),
       |degu AS (SELECT v, COUNT(*) AS deg FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
       |wt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |    CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM degu),
       |ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und),
       |tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
       |  FROM und e1 JOIN und e2 ON e1.b = e2.a
       |    JOIN und e3 ON e1.a = e3.a AND e2.b = e3.b)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       |  CAST(3 * n_triangles AS DOUBLE) / n_wedges AS transitivity
       |FROM wt, ec, tc""".stripMargin

  /** The q56/q311 recursive-clustering CTE chain ending in a
    * `clusters(doc_id, cluster_rep)` CTE, reusable by downstream
    * cluster-consuming oracles (q339). */
  private def dedupClustersCtes: String =
    s"""$minhashPairCtes,
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs WHERE est_jaccard >= 0.8
       |  UNION
       |  SELECT doc_b AS s, doc_a AS d FROM pairs WHERE est_jaccard >= 0.8),
       |reach(s, d) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
       |clusters AS (
       |  SELECT s AS doc_id, least(s, min(d)) AS cluster_rep
       |  FROM reach GROUP BY s)""".stripMargin

  private def dedupClustersOracleSql: String =
    s"""WITH RECURSIVE $dedupClustersCtes
       |SELECT doc_id, cluster_rep FROM clusters ORDER BY doc_id""".stripMargin

  /** Replays q339: the cluster chain, the q305 hash chain on doc_id for
    * the 10-bucket split (buckets 8-9 = test), per-cluster fold counts. */
  private def splitLeakageOracleSql: String =
    s"""WITH RECURSIVE $dedupClustersCtes,
       |l0 AS (SELECT doc_id, cluster_rep,
       |    (doc_id * 1000003) % 2147483647 AS h FROM clusters),
       |l1 AS (SELECT doc_id, cluster_rep,
       |    (xor(h, h >> 16) * 73244475) % 2147483647 AS h FROM l0),
       |l2 AS (SELECT doc_id, cluster_rep,
       |    ((xor(h, h >> 13) * 73244475) % 2147483647) % 10 AS fold FROM l1)
       |SELECT cluster_rep, count(*) AS n_members,
       |  CAST(SUM(CASE WHEN fold >= 8 THEN 0 ELSE 1 END) AS BIGINT) AS n_train,
       |  CAST(SUM(CASE WHEN fold >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       |  (SUM(CASE WHEN fold >= 8 THEN 0 ELSE 1 END) > 0
       |    AND SUM(CASE WHEN fold >= 8 THEN 1 ELSE 0 END) > 0) AS leaky
       |FROM l2 GROUP BY cluster_rep ORDER BY cluster_rep""".stripMargin

  /** [[minhashPairCtesFor]] with SUFFIXED CTE names so two corpora's
    * full signature→band→pair chains can coexist in one WITH clause
    * (q220 runs the old and new snapshots side by side). */
  private def minhashPairCtesSfx(corpusSql: String, sfx: String): String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val (as, bs) = graft.plans.HashExpressions.minhashCoeffs(64)
    val winHash = "list_reduce(list_transform(range(i, i + 5), " +
      "j -> CAST(unicode(substring(text, CAST(j AS INT), 1)) AS BIGINT)), " +
      s"(a, c) -> (a * $b1 + c) % $HP)"
    val sig = (0 until 64)
      .map(k => s"list_min(list_transform(hashes, h -> (h * ${as(k)} + ${bs(k)}) % $HP))")
      .mkString("[", ",\n    ", "]")
    s"""corpus_$sfx AS ($corpusSql),
       |hs_$sfx AS (
       |  SELECT doc_id, CASE WHEN length(text) < 5
       |    THEN [${duckPoly("text", b1)}]
       |    ELSE list_distinct(list_transform(range(1, length(text) - 3), i -> $winHash))
       |    END AS hashes
       |  FROM corpus_$sfx WHERE length(text) > 0),
       |sigs_$sfx AS (SELECT doc_id, $sig AS sig FROM hs_$sfx),
       |banded0_$sfx AS (
       |  SELECT doc_id, sig, b,
       |    list_reduce(list_transform(range(b * 8 + 1, b * 8 + 9), k -> sig[CAST(k AS INT)]),
       |      (a, v) -> (a * $b1 + v) % $HP) AS band_hash
       |  FROM sigs_$sfx, unnest(range(0, 8)) AS tb_$sfx(b)),
       |banded_$sfx AS (
       |  SELECT * FROM banded0_$sfx
       |  QUALIFY COUNT(*) OVER (PARTITION BY b, band_hash) <= $MaxBucket),
       |pairs_$sfx AS (
       |  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
       |    greatest(x.doc_id, y.doc_id) AS doc_b
       |  FROM banded_$sfx x JOIN banded_$sfx y
       |    ON x.b = y.b AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
       |  WHERE list_count(list_filter(range(1, 65),
       |      i -> x.sig[CAST(i AS INT)] = y.sig[CAST(i AS INT)])) / 64.0 >= 0.8),
       |edges_$sfx AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs_$sfx
       |  UNION
       |  SELECT doc_b AS s, doc_a AS d FROM pairs_$sfx),
       |reach_$sfx(s, d) AS (
       |  SELECT s, d FROM edges_$sfx
       |  UNION
       |  SELECT r.s, e.d FROM reach_$sfx r JOIN edges_$sfx e ON r.d = e.s),
       |cl_$sfx AS (SELECT s AS id, least(s, min(d)) AS cluster_rep
       |  FROM reach_$sfx GROUP BY s)""".stripMargin
  }

  /** Replays q220: old- and new-snapshot cluster chains side by side,
    * membership join (unclustered old members become their own singleton
    * rep), per-new-rep stats, then the split ≻ merged ≻ grown ≻ stable
    * classification exactly as [[operators.Dedup.clusterEvolution]]. */
  private def clusterEvolutionOracleSql: String = {
    val oldCorpus =
      """SELECT doc_id, text FROM documents WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id,
        |  substring(text, 1, greatest(length(text) - 7, 1)) AS text
        |FROM documents WHERE doc_id < 300""".stripMargin
    s"""WITH RECURSIVE ${minhashPairCtesSfx(oldCorpus, "o")},
       |${minhashPairCtesSfx(nearDupCorpus, "n")},
       |j AS (SELECT o.id, o.cluster_rep AS old_rep,
       |    coalesce(n.cluster_rep, o.id) AS new_rep
       |  FROM cl_o o LEFT JOIN cl_n n ON o.id = n.id),
       |rs AS (SELECT new_rep,
       |    CAST(count(DISTINCT old_rep) AS BIGINT) AS n_old_in_new,
       |    CAST(count(*) AS BIGINT) AS old_members_in_new
       |  FROM j GROUP BY new_rep),
       |ns AS (SELECT cluster_rep AS new_rep, CAST(count(*) AS BIGINT)
       |    AS new_size FROM cl_n GROUP BY 1),
       |t2 AS (SELECT t.old_rep, t.new_rep, rs.n_old_in_new,
       |    rs.old_members_in_new,
       |    coalesce(ns.new_size, rs.old_members_in_new) AS new_size
       |  FROM (SELECT DISTINCT old_rep, new_rep FROM j) t
       |  JOIN rs ON t.new_rep = rs.new_rep
       |  LEFT JOIN ns ON t.new_rep = ns.new_rep),
       |po AS (SELECT old_rep, CAST(count(*) AS BIGINT) AS n_members
       |  FROM j GROUP BY old_rep),
       |ag AS (SELECT old_rep, CAST(count(*) AS BIGINT) AS n_new_reps,
       |    CAST(max(n_old_in_new) AS BIGINT) AS max_old_in_new,
       |    CAST(SUM(new_size - old_members_in_new) AS BIGINT) AS n_joiners
       |  FROM t2 GROUP BY old_rep)
       |SELECT po.old_rep, po.n_members, ag.n_new_reps, ag.max_old_in_new,
       |  ag.n_joiners,
       |  CASE WHEN ag.n_new_reps > 1 THEN 'split'
       |    WHEN ag.max_old_in_new > 1 THEN 'merged'
       |    WHEN ag.n_joiners > 0 THEN 'grown'
       |    ELSE 'stable' END AS class
       |FROM po JOIN ag USING (old_rep) ORDER BY old_rep""".stripMargin
  }

  /** Replays q209: the q56 cluster CTEs, members joined back to their
    * base-document attributes (id mod 1e6), then survivorship — min id,
    * count, max kept length, and per-field mode with (count DESC, value)
    * tie-break, exactly [[operators.Linkage.goldenRecords]]' min_by
    * struct ordering. */
  private def goldenRecordOracleSql: String =
    s"""WITH RECURSIVE $minhashPairCtes,
       |edges AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs WHERE est_jaccard >= 0.8
       |  UNION
       |  SELECT doc_b AS s, doc_a AS d FROM pairs WHERE est_jaccard >= 0.8),
       |reach(s, d) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
       |cl AS (SELECT s AS id, least(s, min(d)) AS cluster_rep
       |  FROM reach GROUP BY s),
       |attrs AS (SELECT cl.cluster_rep, cl.id, d.lang, d.source,
       |    CAST(length(c.text) AS INT) AS nch
       |  FROM cl JOIN corpus c ON cl.id = c.doc_id
       |  JOIN documents d ON cl.id % 1000000 = d.doc_id),
       |base AS (SELECT cluster_rep AS cluster_id, min(id) AS canonical_id,
       |    CAST(count(*) AS BIGINT) AS n_members, max(nch) AS kept_chars
       |  FROM attrs GROUP BY cluster_rep),
       |mlc AS (SELECT cluster_rep, lang, count(*) AS c
       |  FROM attrs GROUP BY 1, 2),
       |ml AS (SELECT cluster_rep AS cluster_id, lang FROM mlc
       |  QUALIFY row_number() OVER (PARTITION BY cluster_rep
       |    ORDER BY c DESC, lang) = 1),
       |msc AS (SELECT cluster_rep, source, count(*) AS c
       |  FROM attrs GROUP BY 1, 2),
       |ms AS (SELECT cluster_rep AS cluster_id, source FROM msc
       |  QUALIFY row_number() OVER (PARTITION BY cluster_rep
       |    ORDER BY c DESC, source) = 1)
       |SELECT b.cluster_id, b.canonical_id, b.n_members, b.kept_chars,
       |  ml.lang, ms.source
       |FROM base b JOIN ml USING (cluster_id) JOIN ms USING (cluster_id)
       |ORDER BY cluster_id""".stripMargin

  /** Replays q210: the half-prefix corpus, full shared-token ordered-pair
    * counts (no prefix/length pruning — those only drop candidates the
    * verify would reject), containment = shared / |A|. */
  private def containmentOracleSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 400
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |    substring(text, 1, greatest(length(text) // 2, 5)) AS text
      |  FROM documents WHERE doc_id < 400),
      |g AS (
      |  SELECT DISTINCT doc_id, substring(text, CAST(s AS INT) + 1, 5) AS tok
      |  FROM corpus, unnest(range(0, length(text) - 4, 1)) AS t(s)
      |  WHERE length(text) >= 5
      |  UNION
      |  SELECT doc_id, text AS tok FROM corpus WHERE length(text) < 5),
      |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
      |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(count(*) AS BIGINT) AS nc
      |  FROM g a JOIN g b ON a.tok = b.tok AND a.doc_id <> b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, CAST(nc AS DOUBLE) / sa.n AS containment
      |FROM pr JOIN sz sa ON doc_a = sa.doc_id
      |WHERE CAST(nc AS DOUBLE) / sa.n >= 0.9
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Duplicated-span oracle: replay of [[operators.Dedup.dupSpans]] at
    * n = 8 — identical token two-polynomial hashes (reduced mod p), the
    * identical window fold, the same ≥2-occurrences gate, and the same
    * gaps-and-islands merge. list_reduce's first-element init equals the
    * Spark fold's (0*B + x1) % p == x1 (every th value is already < p). */
  private def dupSpansOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val b2 = graft.plans.HashExpressions.PolyBase2
    val tokenHash = s"(${duckPoly("t", b1)} * 2147483648 + ${duckPoly("t", b2)}) % $HP"
    s"""WITH corpus AS ($nearDupCorpus),
       |ths AS (
       |  SELECT doc_id, list_transform(
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
       |    t -> $tokenHash) AS th
       |  FROM corpus),
       |grams AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |    list_reduce(list_transform(range(CAST(i AS INT) + 1, CAST(i AS INT) + 9),
       |      j -> th[CAST(j AS INT)]), (a, c) -> (a * $b2 + c) % $HP) AS gh
       |  FROM ths, unnest(range(0, greatest(len(th) - 7, 0))) AS u(i)),
       |dpos AS (
       |  SELECT doc_id, pos FROM grams
       |  QUALIFY COUNT(*) OVER (PARTITION BY gh) >= 2),
       |isl AS (
       |  SELECT doc_id, pos,
       |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM dpos)
       |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end,
       |  MAX(pos) - MIN(pos) + 8 AS span_tokens, COUNT(*) AS n_grams
       |FROM isl GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin
  }

  /** Rare-bigram oracle: replay of TextQuality.rareBigramStats — same
    * token hashes as [[dupSpansOracleSql]], window size 2, corpus-count
    * window, per-doc integer rollup; rare_frac is one double division of
    * two exact integers on both sides. */
  private def rareBigramsOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val b2 = graft.plans.HashExpressions.PolyBase2
    val tokenHash = s"(${duckPoly("t", b1)} * 2147483648 + ${duckPoly("t", b2)}) % $HP"
    s"""WITH ths AS (
       |  SELECT doc_id, list_transform(
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
       |    t -> $tokenHash) AS th
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    (th[CAST(i AS INT) + 1] * $b2 + th[CAST(i AS INT) + 2]) % $HP AS gh
       |  FROM ths, unnest(range(0, greatest(len(th) - 1, 0))) AS u(i)),
       |cnt AS (
       |  SELECT doc_id, COUNT(*) OVER (PARTITION BY gh) AS c FROM grams)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       |  CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
       |    AS rare_frac,
       |  MIN(c) AS min_count
       |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** BM25 oracle (q98 scan path and q106 index-serving path — the scorer
    * is shared, so both produce bit-identical top-k). ln's last ulp is not
    * cross-engine safe: contributions sum in exact decimal, round(,6). */
  /** Dirichlet query-likelihood oracle (q313), shared with the q314 RBO
    * oracle's `ql` CTE — same decimal-sum + round-6 ln discipline as
    * [[bm25OracleSql]]. */
  private def queryLikelihoodOracleSql: String =
    """WITH docs AS (SELECT doc_id AS id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |dl AS (SELECT id, len(t) AS dl, t FROM docs),
      |stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS c_tokens FROM dl),
      |tf AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
      |    SELECT id, dl, unnest(t) AS term FROM dl)
      |  WHERE term IN ('spark', 'join', 'vector', 'window')
      |  GROUP BY id, dl, term),
      |cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
      |scored AS (SELECT id, dl,
      |    ln(1.0 + CAST(tf * c_tokens AS DOUBLE) / (1000.0 * cf)) AS contrib
      |  FROM tf JOIN cf USING (term), stats)
      |SELECT id,
      |  round(CAST(SUM(CAST(contrib AS DECIMAL(27,15)))
      |    + CAST(ln(1000.0 / (dl + 1000.0)) * 4 AS DECIMAL(27,15))
      |    AS DOUBLE), 6) AS score,
      |  COUNT(*) AS n_matched
      |FROM scored GROUP BY id, dl
      |ORDER BY score DESC, id LIMIT 20""".stripMargin

  private def bm25OracleSql: String =
    """WITH docs AS (SELECT doc_id AS id,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      |  FROM documents),
      |dl AS (SELECT id, len(t) AS dl, t FROM docs),
      |stats AS (SELECT COUNT(*) AS n_docs,
      |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      |tf AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
      |    SELECT id, dl, unnest(t) AS term FROM dl)
      |  WHERE term IN ('spark', 'join', 'vector', 'window')
      |  GROUP BY id, dl, term),
      |dfq AS (SELECT term, COUNT(*) AS term_df FROM tf GROUP BY term),
      |scored AS (SELECT id,
      |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
      |      ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
      |      AS contrib
      |  FROM tf JOIN dfq USING (term), stats)
      |SELECT id,
      |  round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE), 6) AS score,
      |  COUNT(*) AS n_matched
      |FROM scored GROUP BY id
      |ORDER BY score DESC, id LIMIT 20""".stripMargin

  /** Training-export oracle: the q117 composite replayed as one chained
    * CTE pipeline — Gopher gate (q71's expression), classifier gate
    * (q100's hash chain), keep-first dedup (q12's md5 window), per-source
    * hash cap (q96's scramble), per-lang packing cumsum (q85's window). */
  private def trainingExportOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val b2 = graft.plans.HashExpressions.PolyBase2
    val mix = graft.plans.HashExpressions.Mix
    val tokenHash = s"(${duckPoly("t", b1)} * 2147483648 + ${duckPoly("t", b2)}) % $HP"
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |gpass AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, CAST(len(t) AS INT) AS n_words,
       |      CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS mwl,
       |      CAST(len(list_filter(t, x -> x IN ('a','the','of','to','and','in','is','on','for','it'))) AS DOUBLE) / len(t) AS swf,
       |      CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS uf
       |    FROM toks)
       |  WHERE n_words >= 30 AND mwl BETWEEN 4.0 AND 5.0
       |    AND swf >= 0.03 AND uf >= 0.35),
       |ths AS (
       |  SELECT d.doc_id, list_transform(
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
       |    t -> $tokenHash) AS th
       |  FROM documents d JOIN gpass USING (doc_id)),
       |grams AS (
       |  SELECT doc_id,
       |    (th[CAST(i AS INT) + 1] * $b2 + th[CAST(i AS INT) + 2]) % $HP AS gh
       |  FROM ths, unnest(range(0, greatest(len(th) - 1, 0))) AS u(i)),
       |ch0 AS (SELECT doc_id, (gh * $b1) % $HP AS h FROM grams),
       |ch1 AS (SELECT doc_id, (xor(h, h >> 16) * $mix) % $HP AS h FROM ch0),
       |ch2 AS (SELECT doc_id, (xor(h, h >> 13) * $mix) % $HP AS h FROM ch1),
       |ckeep AS (
       |  SELECT doc_id FROM ch2 GROUP BY doc_id
       |  HAVING CAST(SUM(h % 1001 - 500) AS BIGINT) > 0),
       |dd AS (
       |  SELECT doc_id FROM (
       |    SELECT d.doc_id,
       |      row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id) AS rn
       |    FROM documents d JOIN ckeep USING (doc_id))
       |  WHERE rn = 1),
       |kh0 AS (SELECT doc_id, (doc_id * 1000003) % $HP AS h FROM documents JOIN dd USING (doc_id)),
       |kh1 AS (SELECT doc_id, (xor(h, h >> 16) * $mix) % $HP AS h FROM kh0),
       |kh2 AS (SELECT doc_id, (xor(h, h >> 13) * $mix) % $HP AS h FROM kh1),
       |capped AS (
       |  SELECT doc_id FROM (
       |    SELECT d.doc_id,
       |      row_number() OVER (PARTITION BY d.source ORDER BY kh2.h, d.doc_id) AS rk
       |    FROM documents d JOIN kh2 USING (doc_id))
       |  WHERE rk <= 20),
       |tok2 AS (
       |  SELECT d.doc_id, d.lang, d.source,
       |    CAST(len(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x <> '')) AS INT) AS tokens
       |  FROM documents d JOIN capped USING (doc_id)),
       |nz AS (SELECT * FROM tok2 WHERE tokens > 0),
       |p AS (SELECT doc_id, lang, source, tokens,
       |    COALESCE(SUM(tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
       |  FROM nz)
       |SELECT doc_id, lang, source, tokens, CAST(s // 2000 AS INT) AS pack_id,
       |  ((s + tokens - 1) // 2000) > (s // 2000) AS spans_boundary
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** CMS heavy-hitter oracle (q74 and its shard-merge twin q105 — the
    * merged grid is bit-identical to the single-pass one, so both replay
    * against the same SQL). */
  private def cmsHeavyHittersOracleSql: String =
    """WITH keys AS (SELECT l_partkey AS key FROM lineitem),
      |ch0 AS (SELECT key, (key * 1000003) % 2147483647 AS a0,
      |    (key * 999983) % 2147483647 AS b0 FROM keys),
      |ch1 AS (SELECT key, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1,
      |    (xor(b0, b0 >> 16) * 73244475) % 2147483647 AS b1 FROM ch0),
      |ch2 AS (SELECT key, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h1,
      |    ((xor(b1, b1 >> 13) * 73244475) % 2147483647) | 1 AS h2 FROM ch1),
      |cells AS (SELECT d, (h1 + d * h2) % 1024 AS pos, COUNT(*) AS c
      |  FROM ch2, unnest(range(0, 4)) AS t(d) GROUP BY d, pos),
      |top AS (SELECT key, COUNT(*) AS true_cnt FROM keys GROUP BY key
      |  ORDER BY true_cnt DESC, key LIMIT 10),
      |th0 AS (SELECT key, true_cnt, (key * 1000003) % 2147483647 AS a0,
      |    (key * 999983) % 2147483647 AS b0 FROM top),
      |th1 AS (SELECT key, true_cnt, (xor(a0, a0 >> 16) * 73244475) % 2147483647 AS a1,
      |    (xor(b0, b0 >> 16) * 73244475) % 2147483647 AS b1 FROM th0),
      |th2 AS (SELECT key, true_cnt, (xor(a1, a1 >> 13) * 73244475) % 2147483647 AS h1,
      |    ((xor(b1, b1 >> 13) * 73244475) % 2147483647) | 1 AS h2 FROM th1),
      |tpos AS (SELECT key, true_cnt, d, (h1 + d * h2) % 1024 AS pos
      |  FROM th2, unnest(range(0, 4)) AS t(d))
      |SELECT key, true_cnt, MIN(COALESCE(c, CAST(0 AS BIGINT))) AS cms_est
      |FROM tpos LEFT JOIN cells USING (d, pos)
      |GROUP BY key, true_cnt ORDER BY true_cnt DESC, key""".stripMargin

  /** Classifier oracle: replay of TextQuality.classifierScore — the same
    * positional bigram hashes as [[rareBigramsOracleSql]], then the shared
    * xorshift-multiply scramble (Sketches.keyHash) as weight source; every
    * number is integer arithmetic except the final margin division. */
  private def classifierOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val b2 = graft.plans.HashExpressions.PolyBase2
    val mix = graft.plans.HashExpressions.Mix
    val tokenHash = s"(${duckPoly("t", b1)} * 2147483648 + ${duckPoly("t", b2)}) % $HP"
    s"""WITH ths AS (
       |  SELECT doc_id, list_transform(
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
       |    t -> $tokenHash) AS th
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    (th[CAST(i AS INT) + 1] * $b2 + th[CAST(i AS INT) + 2]) % $HP AS gh
       |  FROM ths, unnest(range(0, greatest(len(th) - 1, 0))) AS u(i)),
       |h0 AS (SELECT doc_id, (gh * $b1) % $HP AS h FROM grams),
       |h1 AS (SELECT doc_id, (xor(h, h >> 16) * $mix) % $HP AS h FROM h0),
       |h2 AS (SELECT doc_id, (xor(h, h >> 13) * $mix) % $HP AS h FROM h1),
       |agg AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_feats,
       |    CAST(SUM(h % 1001 - 500) AS BIGINT) AS raw_margin
       |  FROM h2 GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(a.n_feats, 0) AS n_feats,
       |  CAST(coalesce(a.raw_margin, 0) AS BIGINT) AS raw_margin,
       |  CASE WHEN coalesce(a.n_feats, 0) = 0 THEN 0.0
       |    ELSE CAST(a.raw_margin AS DOUBLE) / (a.n_feats * 1000) END AS margin,
       |  coalesce(a.raw_margin, 0) > 0 AS label
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  private def simhashOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val b2 = graft.plans.HashExpressions.PolyBase2
    val toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    val tokenHash = s"${duckPoly("t", b1)} * 2147483648 + ${duckPoly("t", b2)}"
    s"""WITH corpus AS ($nearDupCorpus),
       |ths AS (
       |  SELECT doc_id, list_transform($toks, t -> $tokenHash) AS th
       |  FROM corpus WHERE length(text) > 0),
       |shs AS (
       |  SELECT doc_id, CAST(list_reduce(list_transform(range(0, 64), j ->
       |      CASE WHEN 2 * len(list_filter(th, h -> ((h >> CAST(j AS INT)) & 1) = 1)) > len(th)
       |        THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END),
       |    (a, v) -> a + v) AS BIGINT) AS sh
       |  FROM ths),
       |banded0 AS (
       |  SELECT doc_id, sh, b, (sh >> CAST(b * 16 AS INT)) & 65535 AS band_hash
       |  FROM shs, unnest(range(0, 4)) AS t(b)),
       |banded AS (
       |  SELECT * FROM banded0
       |  QUALIFY COUNT(*) OVER (PARTITION BY b, band_hash) <= $MaxBucket),
       |pairs AS (
       |  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
       |    greatest(x.doc_id, y.doc_id) AS doc_b,
       |    CAST(bit_count(xor(x.sh, y.sh)) AS INT) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.b = y.b AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Perceptual-hash oracle: replay of the stub decode (first-64-byte
    * pixels, double-divide-then-cast-FLOAT — verified exact for all 256
    * byte values), the double-fold mean, the aHash bit vote, and the
    * SimHash-style band/pair machinery. */
  private def phashOracleSql: String = {
    val px = "list_transform(range(1, 65), i -> CASE WHEN i <= length(text) " +
      "THEN CAST(CAST(unicode(substring(text, CAST(i AS INT), 1)) AS DOUBLE) / 255.0 AS FLOAT) " +
      "ELSE CAST(0.0 AS FLOAT) END)"
    s"""WITH ascii_docs AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE NOT regexp_matches(text, '[^\\x00-\\x7F]')),
       |corpus AS (
       |  SELECT doc_id, text FROM ascii_docs
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, 'X' || substring(text, 2) AS text
       |  FROM ascii_docs),
       |px AS (SELECT doc_id, $px AS pxl FROM corpus),
       |mh AS (SELECT doc_id, pxl,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(pxl, v -> CAST(v AS DOUBLE))), (a, b) -> a + b) / 64 AS m
       |  FROM px),
       |ah AS (SELECT doc_id, CAST(list_reduce(list_transform(range(1, 64), j ->
       |      CASE WHEN CAST(pxl[CAST(j AS INT)] AS DOUBLE) > m
       |        THEN (CAST(1 AS BIGINT) << CAST(j - 1 AS INT)) ELSE CAST(0 AS BIGINT) END),
       |    (a, v) -> a + v) AS BIGINT) AS sh
       |  FROM mh),
       |banded0 AS (
       |  SELECT doc_id, sh, b, (sh >> CAST(b * 16 AS INT)) & 65535 AS band_hash
       |  FROM ah, unnest(range(0, 4)) AS t(b)),
       |banded AS (
       |  SELECT * FROM banded0
       |  QUALIFY COUNT(*) OVER (PARTITION BY b, band_hash) <= $MaxBucket),
       |pairs AS (
       |  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
       |    greatest(x.doc_id, y.doc_id) AS doc_b,
       |    CAST(bit_count(xor(x.sh, y.sh)) AS INT) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.b = y.b AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Unrolls q130's BPE learn loop: per round, adjacent-pair counts over
    * the chr(31)-joined symbol strings, argmax with (count DESC, a, b)
    * ties, then a greedy leftmost-non-overlapping `replace` — identical
    * semantics in both engines. */
  /** Shared CTE prefix replaying `Bpe.wordCounts` + 3 `learnMerges` rounds:
    * defines `wc`, `w0`, and per-round `p{r}`/`b{r}`/`w{r}` — `w3` is the
    * fully-merged word table, `b1..b3` the learned merges. */
  private def bpePrefixSql: String = {
    val rounds = (1 to 3).map { r =>
      s"""p$r AS (SELECT sy[i] AS a, sy[i + 1] AS b,
         |    CAST(sum(freq) AS BIGINT) AS pair_count
         |  FROM (SELECT string_split(w, chr(31)) AS sy, freq FROM w${r - 1}) s,
         |    unnest(range(1, len(sy))) t(i)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT a, b, pair_count FROM p$r
         |  ORDER BY pair_count DESC, a, b LIMIT 1),
         |w$r AS (SELECT replace(w, a || chr(31) || b, a || b) AS w, freq
         |  FROM w${r - 1}, b$r)""".stripMargin
    }.mkString(",\n")
    s"""wc AS (SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
       |    FROM documents) u
       |  WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word),
       |w0 AS (SELECT array_to_string(string_split(word, ''), chr(31)) AS w, freq
       |  FROM wc),
       |$rounds""".stripMargin
  }

  /** Replays q205: the q130 learn chain (b1..b3) applied to a PER-LANG
    * word table, then the fertility rollup — tokens/word and
    * chars/token per language. */
  private def tokenizerFertilityOracleSql: String =
    s"""WITH $bpePrefixSql,
       |wl AS (SELECT lang, word, count(*) AS freq FROM (
       |    SELECT lang, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
       |    FROM documents) u
       |  WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY lang, word),
       |a0 AS (SELECT lang, word, freq,
       |    array_to_string(string_split(word, ''), chr(31)) AS w FROM wl),
       |a1 AS (SELECT lang, word, freq,
       |    replace(w, a || chr(31) || b, a || b) AS w FROM a0, b1),
       |a2 AS (SELECT lang, word, freq,
       |    replace(w, a || chr(31) || b, a || b) AS w FROM a1, b2),
       |a3 AS (SELECT lang, word, freq,
       |    replace(w, a || chr(31) || b, a || b) AS w FROM a2, b3),
       |f AS (SELECT lang, freq,
       |    CAST(len(string_split(w, chr(31))) AS INT) AS ntok,
       |    length(word) AS nchr
       |  FROM a3)
       |SELECT lang, CAST(SUM(freq) AS BIGINT) AS n_words,
       |  CAST(SUM(freq * ntok) AS BIGINT) AS n_tokens,
       |  CAST(SUM(freq * nchr) AS BIGINT) AS n_chars,
       |  CAST(SUM(freq * ntok) AS DOUBLE) / SUM(freq) AS tokens_per_word,
       |  CAST(SUM(freq * nchr) AS DOUBLE) / SUM(freq * ntok) AS chars_per_token
       |FROM f GROUP BY lang ORDER BY lang""".stripMargin

  private def bpeOracleSql: String = {
    val out = (1 to 3).map(r =>
      s"SELECT CAST($r AS INT) AS rank, a AS sym_a, b AS sym_b, pair_count FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH $bpePrefixSql
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** Replays q133: the merged word table `w3` IS `applyMerges(wc, merges)`
    * (the separator-joined symbol string is a bijection with the word — no
    * two words collapse), so tokenization is just splitting `w3.w`. */
  private def bpeEncodeOracleSql: String =
    s"""WITH $bpePrefixSql,
       |tok AS (SELECT unnest(string_split(w, chr(31))) AS token, w, freq
       |  FROM w3)
       |SELECT token, count(DISTINCT w) AS n_words,
       |  CAST(sum(freq) AS BIGINT) AS occurrences
       |FROM tok GROUP BY token
       |ORDER BY occurrences DESC, token LIMIT 20""".stripMargin

  /** Replays q134: the q100 classifier's gram-hash pipeline (ths→grams→
    * scramble) bucketed mod 64; fixed-point importance ratios
    * ((t+1)·10^6 // (r+1)) summed per doc as exact BIGINTs; top-25% by
    * (weight DESC, doc_id) with floor semantics — all integer arithmetic,
    * featureless docs kept at weight 0 via the LEFT JOIN. */
  private def dsirOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val b2 = graft.plans.HashExpressions.PolyBase2
    val mix = graft.plans.HashExpressions.Mix
    val tokenHash = s"(${duckPoly("t", b1)} * 2147483648 + ${duckPoly("t", b2)}) % $HP"
    s"""WITH ths AS (
       |  SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_t,
       |    list_transform(
       |      list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
       |      t -> $tokenHash) AS th
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, is_t,
       |    (th[CAST(i AS INT) + 1] * $b2 + th[CAST(i AS INT) + 2]) % $HP AS gh
       |  FROM ths, unnest(range(0, greatest(len(th) - 1, 0))) AS u(i)),
       |h0 AS (SELECT doc_id, is_t, (gh * $b1) % $HP AS h FROM grams),
       |h1 AS (SELECT doc_id, is_t, (xor(h, h >> 16) * $mix) % $HP AS h FROM h0),
       |h2 AS (SELECT doc_id, is_t, (xor(h, h >> 13) * $mix) % $HP AS h FROM h1),
       |bks AS (SELECT doc_id, is_t, h % 64 AS b FROM h2),
       |cnt AS (SELECT b, count(*) AS raw_cnt, sum(is_t) AS t_cnt
       |  FROM bks GROUP BY b),
       |rat AS (SELECT b,
       |    CAST(((t_cnt + 1) * 1000000) // (raw_cnt + 1) AS BIGINT) AS r
       |  FROM cnt),
       |dw AS (SELECT doc_id, CAST(count(*) AS INT) AS n_feats,
       |    CAST(sum(r) AS BIGINT) AS weight
       |  FROM bks JOIN rat USING (b) GROUP BY doc_id),
       |alldocs AS (SELECT d.doc_id, coalesce(dw.n_feats, 0) AS n_feats,
       |    CAST(coalesce(dw.weight, 0) AS BIGINT) AS weight
       |  FROM documents d LEFT JOIN dw USING (doc_id)),
       |rk AS (SELECT doc_id, n_feats, weight,
       |    CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS INT) AS rank,
       |    count(*) OVER () AS total
       |  FROM alldocs)
       |SELECT doc_id, n_feats, weight, rank,
       |  rank * 100 <= total * 25 AS selected
       |FROM rk ORDER BY doc_id""".stripMargin
  }

  /** Replays q386: 12-token pseudo-sentences, the DSIR hashed-bigram
    * bucket space, and the n-cancelled centroid cosine
    * Σcnt·sumcnt / (√Σcnt²·√Σsumcnt²). */
  private def extractiveSummaryOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    val b2 = graft.plans.HashExpressions.PolyBase2
    val mix = graft.plans.HashExpressions.Mix
    val tokenHash = s"(${duckPoly("t", b1)} * 2147483648 + ${duckPoly("t", b2)}) % $HP"
    s"""WITH tk AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents WHERE doc_id < 200),
       |ln AS (SELECT doc_id, CAST(i AS INT) AS line_idx,
       |    t[(CAST(i AS INT) * 12 + 1):(CAST(i AS INT) * 12 + 12)] AS lt
       |  FROM tk, unnest(range(0, CASE WHEN len(t) = 0 THEN 0
       |    ELSE (len(t) - 1) // 12 + 1 END)) AS u(i)),
       |th AS (SELECT doc_id, line_idx,
       |    list_transform(lt, t -> $tokenHash) AS hs FROM ln),
       |g AS (SELECT doc_id, line_idx,
       |    (hs[CAST(j AS INT)] * $b2 + hs[CAST(j AS INT) + 1]) % $HP AS gh
       |  FROM th, unnest(range(1, len(hs))) AS v(j)),
       |h0 AS (SELECT doc_id, line_idx, (gh * $b1) % $HP AS h FROM g),
       |h1 AS (SELECT doc_id, line_idx,
       |    (xor(h, h >> 16) * $mix) % $HP AS h FROM h0),
       |h2 AS (SELECT doc_id, line_idx,
       |    (xor(h, h >> 13) * $mix) % $HP AS h FROM h1),
       |bk AS (SELECT doc_id, line_idx, h % 64 AS b FROM h2),
       |sct AS (SELECT doc_id, line_idx, b, count(*) AS cnt
       |  FROM bk GROUP BY doc_id, line_idx, b),
       |ctr AS (SELECT doc_id, b, CAST(SUM(cnt) AS BIGINT) AS sumcnt
       |  FROM sct GROUP BY doc_id, b),
       |dt AS (SELECT s.doc_id, s.line_idx,
       |    CAST(SUM(s.cnt * c.sumcnt) AS BIGINT) AS dot,
       |    CAST(SUM(s.cnt * s.cnt) AS BIGINT) AS ss,
       |    CAST(SUM(s.cnt) AS BIGINT) AS n_grams
       |  FROM sct s JOIN ctr c USING (doc_id, b)
       |  GROUP BY s.doc_id, s.line_idx),
       |cs AS (SELECT doc_id, CAST(SUM(sumcnt * sumcnt) AS BIGINT) AS cc
       |  FROM ctr GROUP BY doc_id),
       |sc AS (SELECT dt.doc_id, dt.line_idx, dt.n_grams,
       |    CAST(dot AS DOUBLE) /
       |      (sqrt(CAST(ss AS DOUBLE)) * sqrt(CAST(cs.cc AS DOUBLE))) AS score
       |  FROM dt JOIN cs USING (doc_id) WHERE ss > 0 AND cs.cc > 0),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, line_idx) AS rank FROM sc),
       |txt AS (SELECT doc_id, line_idx, array_to_string(lt, ' ') AS line
       |  FROM ln)
       |SELECT r.doc_id, CAST(r.rank AS INT) AS rank, r.line_idx,
       |  r.n_grams, round(r.score, 6) AS score, t.line
       |FROM rk r JOIN txt t USING (doc_id, line_idx)
       |WHERE r.rank <= 2 ORDER BY doc_id, rank""".stripMargin
  }

  /** Replays q389: the q159 bin CTE, then iso(i) = max_{j≤i} min_{k≥i}
    * of the pooled rate over [j,k] — range sums as prefix-sum
    * differences, each avg ONE double division. */
  private def isotonicOracleSql: String =
    s"""$scoredMarginCtes,
       |bn AS (SELECT CAST(least(greatest(
       |      CAST(floor((margin + 0.5) * 10) AS INT), 0), 9) AS INT) AS bin,
       |    count(*) AS n,
       |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT)
       |      AS pos
       |  FROM scored GROUP BY 1),
       |cumt AS (SELECT bin, n, pos,
       |    SUM(n) OVER (ORDER BY bin) AS cn,
       |    SUM(pos) OVER (ORDER BY bin) AS cp FROM bn),
       |jx AS (SELECT bin AS j, cn - n AS cnj, cp - pos AS cpj FROM cumt),
       |kx AS (SELECT bin AS k, cn AS cnk, cp AS cpk FROM cumt),
       |rg AS (SELECT j, k,
       |    CAST(cpk - cpj AS DOUBLE) / (cnk - cnj) AS avg
       |  FROM jx JOIN kx ON j <= k),
       |mn AS (SELECT b.bin AS i, rg.j, min(avg) AS minavg
       |  FROM bn b JOIN rg ON rg.j <= b.bin AND b.bin <= rg.k
       |  GROUP BY b.bin, rg.j),
       |iso AS (SELECT i, max(minavg) AS iso FROM mn GROUP BY i)
       |SELECT b.bin, b.n, b.pos AS n_pos,
       |  CAST(b.pos AS DOUBLE) / b.n AS frac_pos, round(iso.iso, 6) AS iso
       |FROM bn b JOIN iso ON b.bin = iso.i ORDER BY bin""".stripMargin

  /** Replays q390: ring positions keyHash(node·131 + v), assignment by
    * min cyclic distance (tie → node id), for 4 and 5 nodes. */
  private def ringOracleSql: String = {
    val mix = graft.plans.HashExpressions.Mix
    val b1 = graft.plans.HashExpressions.PolyBase1
    def positions(n: Int, name: String): String =
      s"""${name}0 AS (SELECT m, ((m * 131 + v) * $b1) % $HP AS h
         |  FROM range(0, $n) t(m), range(0, 8) u(v)),
         |${name}1 AS (SELECT m, (xor(h, h >> 16) * $mix) % $HP AS h FROM ${name}0),
         |${name}p AS (SELECT m, (xor(h, h >> 13) * $mix) % $HP AS h FROM ${name}1)""".stripMargin
    def assign(posCte: String, name: String): String =
      s"""$name AS (SELECT doc_id, m AS node FROM (
         |    SELECT k.doc_id, p.m,
         |      row_number() OVER (PARTITION BY k.doc_id
         |        ORDER BY ((p.h - k.kp) % $HP + $HP) % $HP, p.m) AS rn
         |    FROM ks k, $posCte p) WHERE rn = 1)""".stripMargin
    s"""WITH k0 AS (SELECT doc_id, (doc_id * $b1) % $HP AS h FROM documents),
       |k1 AS (SELECT doc_id, (xor(h, h >> 16) * $mix) % $HP AS h FROM k0),
       |ks AS (SELECT doc_id, (xor(h, h >> 13) * $mix) % $HP AS kp FROM k1),
       |${positions(4, "pa")},
       |${positions(5, "pb")},
       |${assign("pap", "a4")},
       |${assign("pbp", "a5")}
       |SELECT CAST(a4.node AS INT) AS node,
       |  CAST(count(*) AS BIGINT) AS n_keys,
       |  CAST(SUM(CASE WHEN a4.node <> a5.node THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_moved,
       |  CAST(SUM(CASE WHEN a4.node <> a5.node THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) AS moved_frac
       |FROM a4 JOIN a5 USING (doc_id)
       |GROUP BY a4.node ORDER BY node""".stripMargin
  }

  /** Replays q399: ONE joint cube over the 4 label columns, then each
    * pair's contingency/margins/χ² derived from the cube; per-cell
    * n²/(r·c) doubles decimal-accumulate. */
  private def cramersVOracleSql: String = {
    val cols = Seq("l_returnflag" -> "a1", "l_linestatus" -> "a2",
      "l_linenumber" -> "a3", "l_quantity" -> "a4")
    def pairBlock(a: (String, String), b: (String, String)): String =
      s"""SELECT '${a._1}' AS col_a, '${b._1}' AS col_b, n, r, c,
         |  round(n * e, 6) AS chi2,
         |  CASE WHEN least(r - 1, c - 1) > 0
         |    THEN round(sqrt(e / least(r - 1, c - 1)), 6) END AS cramers_v
         |FROM (
         |  SELECT n, r, c,
         |    greatest(CAST(0.0 AS DOUBLE), s - 1.0) AS e
         |  FROM (
         |    SELECT CAST(SUM(n_ab) AS BIGINT) AS n,
         |      CAST(COUNT(DISTINCT x) AS BIGINT) AS r,
         |      CAST(COUNT(DISTINCT y) AS BIGINT) AS c,
         |      CAST(SUM(CAST(CAST(n_ab * n_ab AS DOUBLE) / (ra * cb)
         |        AS DECIMAL(38,18))) AS DOUBLE) AS s
         |    FROM (
         |      SELECT x, y, n_ab,
         |        CAST(SUM(n_ab) OVER (PARTITION BY x) AS BIGINT) AS ra,
         |        CAST(SUM(n_ab) OVER (PARTITION BY y) AS BIGINT) AS cb
         |      FROM (SELECT ${a._2} AS x, ${b._2} AS y,
         |          CAST(SUM(nn) AS BIGINT) AS n_ab
         |        FROM cube0 GROUP BY 1, 2))))""".stripMargin
    val blocks = (for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield pairBlock(cols(i), cols(j))).mkString("\nUNION ALL\n")
    s"""WITH cube0 AS (SELECT ${cols.map { case (c, al) => s"$c AS $al" }
        .mkString(", ")},
       |    CAST(count(*) AS BIGINT) AS nn
       |  FROM lineitem GROUP BY 1, 2, 3, 4)
       |$blocks
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** Shared CTE chain for q401/q402: the q350 deterministic permutation
    * machinery, grouped by event type; `pg` holds one row per group
    * with the exact (n_extreme, n_perms) rational p-value. */
  private def permByGroupCtes: String = {
    val mix = graft.plans.HashExpressions.Mix
    val b1 = graft.plans.HashExpressions.PolyBase1
    s"""WITH pe AS (SELECT event_type AS g, user_id,
       |    CAST(round(value * 100) AS BIGINT) AS v
       |  FROM events WHERE value IS NOT NULL),
       |h0 AS (SELECT g, v, (user_id * $b1) % $HP AS h FROM pe),
       |h1 AS (SELECT g, v, (xor(h, h >> 16) * $mix) % $HP AS h FROM h0),
       |h2 AS (SELECT g, v, (xor(h, h >> 13) * $mix) % $HP AS h FROM h1),
       |ex AS (SELECT g, v, i AS k,
       |    ((h + i * $mix) % $HP) % 2 = 0 AS arm
       |  FROM h2, unnest(range(0, 65)) AS u(i)),
       |byk AS (SELECT g, k,
       |    SUM(CASE WHEN arm THEN CAST(v AS DECIMAL(38,0)) END) AS svt,
       |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |    SUM(CASE WHEN NOT arm THEN CAST(v AS DECIMAL(38,0)) END) AS svc,
       |    CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS BIGINT) AS nc
       |  FROM ex GROUP BY g, k),
       |dd AS (SELECT g, k,
       |    CAST(svt AS DOUBLE) / nt - CAST(svc AS DOUBLE) / nc AS diff
       |  FROM byk WHERE nt > 0 AND nc > 0),
       |oo AS (SELECT g, diff AS d0 FROM dd WHERE k = 0),
       |pg AS (SELECT dd.g, round(max(d0), 6) AS diff_obs,
       |    count(*) AS n_perms,
       |    CAST(SUM(CASE WHEN abs(diff) >= abs(d0) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_extreme,
       |    round(CAST(SUM(CASE WHEN abs(diff) >= abs(d0) THEN 1 ELSE 0
       |      END) + 1 AS DOUBLE) / (count(*) + 1), 6) AS p_value
       |  FROM dd JOIN oo ON dd.g = oo.g WHERE k > 0 GROUP BY dd.g)"""
      .stripMargin
  }

  /** Replays q403: the q159 bin CTE → bin-midpoint frame, then 12
    * unrolled gradient steps; every step's sums decimal-accumulate and
    * the algebraic sigmoid keeps the tree libm-free. */
  private def sigmoidCalibrationOracleSql: String = {
    def sig(a: String, b: String): String =
      s"(0.5 + 0.5 * ($a * x + $b) / (1.0 + abs($a * x + $b)) - pi)"
    def ds(a: String, b: String): String =
      s"(0.5 / ((1.0 + abs($a * x + $b)) * (1.0 + abs($a * x + $b))))"
    def stepCte(k: Int): String = {
      val (a, b) = ("a", "b")
      s"""it$k AS (SELECT
         |  max(a) - 2.0 * (CAST(SUM(CAST(n * 2.0 * ${sig(a, b)} *
         |    ${ds(a, b)} * x AS DECIMAL(38,18))) AS DOUBLE) / SUM(n)) AS a,
         |  max(b) - 2.0 * (CAST(SUM(CAST(n * 2.0 * ${sig(a, b)} *
         |    ${ds(a, b)} AS DECIMAL(38,18))) AS DOUBLE) / SUM(n)) AS b
         |  FROM xb, it${k - 1})""".stripMargin
    }
    def mse(a: String, b: String): String =
      s"""round(CAST(SUM(CAST(n * ${sig(a, b)} * ${sig(a, b)}
         |    AS DECIMAL(38,18))) AS DOUBLE) / SUM(n), 9)""".stripMargin
    s"""$scoredMarginCtes,
       |bn AS (SELECT CAST(least(greatest(
       |      CAST(floor((margin + 0.5) * 10) AS INT), 0), 9) AS INT) AS bin,
       |    count(*) AS n,
       |    CAST(SUM(CASE WHEN quality_pass THEN 1 ELSE 0 END) AS BIGINT)
       |      AS pos
       |  FROM scored GROUP BY 1),
       |xb AS (SELECT (CAST(bin AS DOUBLE) + 0.5) / 10.0 - 0.5 AS x,
       |    CAST(n AS BIGINT) AS n, CAST(pos AS DOUBLE) / n AS pi
       |  FROM bn),
       |it0 AS (SELECT CAST(1.0 AS DOUBLE) AS a, CAST(0.0 AS DOUBLE) AS b),
       |${(1 to 12).map(stepCte).mkString(",\n")}
       |SELECT CAST(count(*) AS BIGINT) AS n_bins,
       |  CAST(SUM(n) AS BIGINT) AS n,
       |  round(max(a), 9) AS a, round(max(b), 9) AS b,
       |  ${mse("1.0", "0.0")} AS mse_before,
       |  ${mse("a", "b")} AS mse_after
       |FROM xb, it12""".stripMargin
  }

  /** Replays q404: the q255 skip audit plus the Hilbert layout — the
    * 4 rotation levels unrolled as chained SELECTs with per-step
    * column names (x3..x0) so no lateral-alias resolution ambiguity. */
  private def hilbertSkippingOracleSql: String = {
    def step(i: Int): String = {
      val s = 1L << i
      val p = i + 1
      val rx = s"(CASE WHEN (x$p & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (y$p & $s) > 0 THEN 1 ELSE 0 END)"
      s"""h$i AS (SELECT px, sy, l_orderkey, l_linenumber,
         |  d$p + ${s * s} * xor(3 * $rx, $ry) AS d$i,
         |  CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1
         |    THEN ${s - 1} - y$p ELSE y$p END ELSE x$p END AS x$i,
         |  CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1
         |    THEN ${s - 1} - x$p ELSE x$p END ELSE y$p END AS y$i
         |  FROM h$p)""".stripMargin
    }
    s"""WITH b AS (SELECT l_partkey % 16 AS px, l_suppkey % 16 AS sy,
       |    l_orderkey, l_linenumber FROM lineitem),
       |lx AS (SELECT px, sy, (row_number() OVER (ORDER BY px, sy,
       |    l_orderkey, l_linenumber) - 1) // 200 AS f FROM b),
       |lf AS (SELECT f, min(px) AS xmn, max(px) AS xmx, min(sy) AS ymn,
       |    max(sy) AS ymx, count(*) AS nr FROM lx GROUP BY f),
       |zb AS (SELECT px, sy, l_orderkey, l_linenumber,
       |    list_sum(list_transform(range(0, 4),
       |      i -> (((px >> i) & 1) << (2*i)) +
       |        (((sy >> i) & 1) << (2*i+1)))) AS zv FROM b),
       |zx AS (SELECT px, sy, (row_number() OVER (ORDER BY zv,
       |    l_orderkey, l_linenumber) - 1) // 200 AS f FROM zb),
       |zf AS (SELECT f, min(px) AS xmn, max(px) AS xmx, min(sy) AS ymn,
       |    max(sy) AS ymx, count(*) AS nr FROM zx GROUP BY f),
       |h4 AS (SELECT px, sy, l_orderkey, l_linenumber,
       |    CAST(0 AS BIGINT) AS d4, CAST(px AS BIGINT) AS x4,
       |    CAST(sy AS BIGINT) AS y4 FROM b),
       |${(3 to 0 by -1).map(step).mkString(",\n")},
       |hx AS (SELECT px, sy, (row_number() OVER (ORDER BY d0,
       |    l_orderkey, l_linenumber) - 1) // 200 AS f FROM h0),
       |hf AS (SELECT f, min(px) AS xmn, max(px) AS xmx, min(sy) AS ymn,
       |    max(sy) AS ymx, count(*) AS nr FROM hx GROUP BY f),
       |u AS (SELECT 'x_then_y' AS layout, xmn, xmx, ymn, ymx, nr FROM lf
       |  UNION ALL SELECT 'zorder', xmn, xmx, ymn, ymx, nr FROM zf
       |  UNION ALL SELECT 'hilbert', xmn, xmx, ymn, ymx, nr FROM hf),
       |sk AS (SELECT layout, nr,
       |    xmx < 4 OR xmn > 7 OR ymx < 8 OR ymn > 11 AS s
       |  FROM u)
       |SELECT layout, count(*) AS n_files,
       |  CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_skippable,
       |  CAST(SUM(CASE WHEN s THEN nr ELSE 0 END) AS BIGINT)
       |    AS rows_skipped,
       |  CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
       |    AS file_skip_frac
       |FROM sk GROUP BY layout ORDER BY layout""".stripMargin
  }

  /** Replays q407: the UCB1 fold as a recursive CTE — pick computed
    * once in a subquery per step (forced arms days 1-3, then argmax of
    * mean + sqrt(2·⌊log2 T⌋/n), ties to the smaller arm). */
  private def ucb1OracleSql: String = {
    def u(s: String, n: String): String =
      s"(it.$s / it.$n + sqrt(CAST(2.0 AS DOUBLE) * " +
        s"(length(bin(it.t)) - 1) / it.$n))"
    val pick =
      s"""CASE WHEN it.t + 1 = 2 THEN 1 WHEN it.t + 1 = 3 THEN 2
         |  WHEN ${u("s0", "n0")} >= ${u("s1", "n1")}
         |    AND ${u("s0", "n0")} >= ${u("s2", "n2")} THEN 0
         |  WHEN ${u("s1", "n1")} >= ${u("s2", "n2")} THEN 1
         |  ELSE 2 END""".stripMargin
    s"""WITH RECURSIVE pe AS (SELECT event_type AS g,
       |    CAST(ts AS DATE) AS day, user_id % 3 AS arm,
       |    CAST(round(value * 100) AS BIGINT) AS v
       |  FROM events WHERE value IS NOT NULL),
       |ba AS (SELECT g, day, arm, CAST(SUM(v) AS BIGINT) AS sv,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM pe GROUP BY 1, 2, 3),
       |wd AS (SELECT g, day,
       |    CAST(SUM(CASE WHEN arm = 0 THEN sv END) AS BIGINT) AS sv0,
       |    CAST(SUM(CASE WHEN arm = 0 THEN cnt END) AS BIGINT) AS c0,
       |    CAST(SUM(CASE WHEN arm = 1 THEN sv END) AS BIGINT) AS sv1,
       |    CAST(SUM(CASE WHEN arm = 1 THEN cnt END) AS BIGINT) AS c1,
       |    CAST(SUM(CASE WHEN arm = 2 THEN sv END) AS BIGINT) AS sv2,
       |    CAST(SUM(CASE WHEN arm = 2 THEN cnt END) AS BIGINT) AS c2
       |  FROM ba GROUP BY 1, 2),
       |rr AS (SELECT g,
       |    CAST(row_number() OVER (PARTITION BY g ORDER BY day)
       |      AS BIGINT) AS t,
       |    CASE WHEN c0 > 0 THEN CAST(sv0 AS DOUBLE) / c0 / 10000.0
       |      ELSE 0.0 END AS r0,
       |    CASE WHEN c1 > 0 THEN CAST(sv1 AS DOUBLE) / c1 / 10000.0
       |      ELSE 0.0 END AS r1,
       |    CASE WHEN c2 > 0 THEN CAST(sv2 AS DOUBLE) / c2 / 10000.0
       |      ELSE 0.0 END AS r2
       |  FROM wd),
       |tots AS (SELECT g, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(SUM(CAST(r0 AS DECIMAL(38,18))) AS DOUBLE) AS tot0,
       |    CAST(SUM(CAST(r1 AS DECIMAL(38,18))) AS DOUBLE) AS tot1,
       |    CAST(SUM(CAST(r2 AS DECIMAL(38,18))) AS DOUBLE) AS tot2
       |  FROM rr GROUP BY g),
       |it AS (
       |  SELECT g, CAST(1 AS BIGINT) AS t, CAST(1 AS BIGINT) AS n0,
       |    r0 AS s0, CAST(0 AS BIGINT) AS n1, CAST(0.0 AS DOUBLE) AS s1,
       |    CAST(0 AS BIGINT) AS n2, CAST(0.0 AS DOUBLE) AS s2, r0 AS cum
       |  FROM rr WHERE t = 1
       |  UNION ALL
       |  SELECT z.g, z.t + 1,
       |    z.n0 + CASE WHEN z.pick = 0 THEN 1 ELSE 0 END,
       |    z.s0 + CASE WHEN z.pick = 0 THEN z.r0 ELSE 0.0 END,
       |    z.n1 + CASE WHEN z.pick = 1 THEN 1 ELSE 0 END,
       |    z.s1 + CASE WHEN z.pick = 1 THEN z.r1 ELSE 0.0 END,
       |    z.n2 + CASE WHEN z.pick = 2 THEN 1 ELSE 0 END,
       |    z.s2 + CASE WHEN z.pick = 2 THEN z.r2 ELSE 0.0 END,
       |    z.cum + CASE WHEN z.pick = 0 THEN z.r0
       |      WHEN z.pick = 1 THEN z.r1 ELSE z.r2 END
       |  FROM (SELECT it.g, it.t, it.n0, it.s0, it.n1, it.s1, it.n2,
       |      it.s2, it.cum, rr.r0, rr.r1, rr.r2, $pick AS pick
       |    FROM it JOIN rr ON rr.g = it.g AND rr.t = it.t + 1) z)
       |SELECT it.g AS event_type, tots.n_days,
       |  it.n0 AS n_pulls_0, it.n1 AS n_pulls_1, it.n2 AS n_pulls_2,
       |  round(it.cum, 6) AS cum_reward,
       |  round(greatest(tot0, tot1, tot2), 6) AS best_fixed,
       |  round(greatest(tot0, tot1, tot2) - it.cum, 6) AS regret
       |FROM it JOIN tots ON it.g = tots.g
       |WHERE it.t = tots.n_days ORDER BY event_type""".stripMargin
  }

  /** Replays q418: the kNN edge prefix symmetrized, two bounded-walk
    * UNION recursions (dedup keeps them n·maxHops-sized; min depth =
    * BFS distance), farthest = (max d, min node). */
  private def diameterSweepOracleSql: String = {
    def walk(name: String, seed: String): String =
      s"""$name AS ($seed
         |  UNION
         |  SELECT und.b, $name.d + 1 FROM $name
         |  JOIN und ON und.a = $name.node WHERE $name.d < 8),
         |d_$name AS (SELECT node, CAST(min(d) AS INT) AS d FROM $name
         |  GROUP BY node),
         |s_$name AS (SELECT CAST(count(*) AS BIGINT) AS n_reached,
         |  max(d) AS ecc FROM d_$name),
         |f_$name AS (SELECT node FROM d_$name, s_$name WHERE d = ecc
         |  ORDER BY node LIMIT 1)""".stripMargin
    s"""${knnEdgesPrefixSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |und AS (SELECT id AS a, nbr_id AS b FROM g0
       |  UNION SELECT nbr_id, id FROM g0),
       |${walk("w1", "SELECT CAST(0 AS BIGINT) AS node, 0 AS d")},
       |${walk("w2", "SELECT node, 0 AS d FROM f_w1")}
       |SELECT CAST(1 AS INT) AS sweep, CAST(0 AS BIGINT) AS source,
       |  f_w1.node AS farthest, s_w1.ecc, s_w1.n_reached
       |FROM f_w1, s_w1
       |UNION ALL
       |SELECT CAST(2 AS INT), f_w1.node, f_w2.node, s_w2.ecc,
       |  s_w2.n_reached
       |FROM f_w1, f_w2, s_w2
       |ORDER BY sweep""".stripMargin
  }

  /** Replays q419: symmetrized kNN edges, degree colors, 3 WL rounds
    * via the scalar polynomial fold (list_reduce-safe), per-round
    * color-class curve. */
  private def wlRefinementOracleSql: String = {
    val b1 = graft.plans.HashExpressions.PolyBase1
    def round(r: Int): String =
      s"""c$r AS (SELECT z.id, list_reduce(list_prepend(o.color, z.ns),
         |    (a, x) -> (a * $b1 + x) % $HP) AS color
         |  FROM (SELECT und.a AS id, list(cp.color ORDER BY cp.color)
         |      AS ns
         |    FROM und JOIN c${r - 1} cp ON und.b = cp.id
         |    GROUP BY und.a) z
         |  JOIN c${r - 1} o ON z.id = o.id)""".stripMargin
    def summary(r: Int): String =
      s"""s$r AS (SELECT CAST($r AS INT) AS round,
         |  CAST(count(*) AS BIGINT) AS n_colors,
         |  CAST(max(n) AS BIGINT) AS largest_class,
         |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS singletons
         |  FROM (SELECT color, count(*) AS n FROM c$r GROUP BY color))"""
        .stripMargin
    s"""$knnEdgesPrefixSql,
       |und AS (SELECT id AS a, nbr_id AS b FROM g0
       |  UNION SELECT nbr_id, id FROM g0),
       |c0 AS (SELECT a AS id, CAST(count(*) AS BIGINT) AS color
       |  FROM und GROUP BY a),
       |${(1 to 3).map(round).mkString(",\n")},
       |${(0 to 3).map(summary).mkString(",\n")}
       |SELECT * FROM s0 UNION ALL SELECT * FROM s1
       |UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
       |ORDER BY round""".stripMargin
  }

  /** The q422/q428 Brandes CTE chain for one source, all CTE names
    * suffixed: forward BFS levels with exact σ path counts, then the
    * per-level dependency backprop. Ends with `allc$sfx` and
    * `info$sfx`. */
  private def brandesChainSql(sfx: String, source: Long,
                              maxD: Int): String = {
    def fwd(h: Int): String =
      s"""l$h$sfx AS MATERIALIZED (SELECT und.b AS node, $h AS dist,
         |    CAST(SUM(l${h - 1}$sfx.sigma) AS BIGINT) AS sigma
         |  FROM l${h - 1}$sfx JOIN und ON und.a = l${h - 1}$sfx.node
         |  WHERE und.b NOT IN (SELECT node FROM v${h - 1}$sfx)
         |  GROUP BY und.b),
         |v$h$sfx AS MATERIALIZED (SELECT node FROM v${h - 1}$sfx
         |  UNION SELECT node FROM l$h$sfx)""".stripMargin
    def bwd(h: Int): String =
      s"""d$h$sfx AS MATERIALIZED (SELECT lh.node,
         |    coalesce(f.dd, CAST(0.0 AS DOUBLE)) AS delta
         |  FROM (SELECT node, sigma FROM info$sfx WHERE dist = $h) lh
         |  LEFT JOIN (
         |    SELECT u.node, CAST(SUM(CAST(
         |        (CAST(u.sigma AS DOUBLE) / x.sv) * (1.0 + x.dv)
         |        AS DECIMAL(38,18))) AS DOUBLE) AS dd
         |    FROM (SELECT node, sigma FROM info$sfx WHERE dist = $h) u
         |    JOIN und ON und.a = u.node
         |    JOIN (SELECT i.node AS b, i.sigma AS sv, dd0.delta AS dv
         |        FROM info$sfx i JOIN d${h + 1}$sfx dd0
         |          ON i.node = dd0.node
         |        WHERE i.dist = ${h + 1}) x ON und.b = x.b
         |    GROUP BY u.node) f ON lh.node = f.node)""".stripMargin
    s"""l0$sfx AS MATERIALIZED (SELECT CAST($source AS BIGINT) AS node,
       |  0 AS dist, CAST(1 AS BIGINT) AS sigma),
       |v0$sfx AS (SELECT node FROM l0$sfx),
       |${(1 to maxD).map(fwd).mkString(",\n")},
       |info$sfx AS MATERIALIZED (${(0 to maxD)
        .map(h => s"SELECT * FROM l$h$sfx").mkString("\n  UNION ALL ")}),
       |d$maxD$sfx AS (SELECT node, CAST(0.0 AS DOUBLE) AS delta
       |  FROM l$maxD$sfx),
       |${((maxD - 1) to 0 by -1).map(bwd).mkString(",\n")},
       |allc$sfx AS (${(0 to maxD).map(h => s"SELECT * FROM d$h$sfx")
        .mkString("\n  UNION ALL ")})""".stripMargin
  }

  /** Replays q422: one Brandes chain from source 0, top-20 by δ. */
  private def brandesOracleSql: String =
    s"""$knnEdgesPrefixSql,
       |und AS MATERIALIZED (SELECT id AS a, nbr_id AS b FROM g0
       |  UNION SELECT nbr_id, id FROM g0),
       |${brandesChainSql("", 0L, 6)}
       |SELECT CAST(rk AS INT) AS rank, node, dist, sigma,
       |  round(delta, 6) AS delta
       |FROM (SELECT info.node, dist, sigma, delta,
       |    row_number() OVER (ORDER BY delta DESC, info.node) AS rk
       |  FROM info JOIN allc ON info.node = allc.node)
       |WHERE rk <= 20 ORDER BY rank""".stripMargin

  /** Replays q428: three Brandes chains, per-node decimal-mean over
    * the FIXED pivot count, top-20. */
  private def sampledBetweennessOracleSql: String = {
    val sources = Seq(0L, 7L, 13L)
    val chains = sources.zipWithIndex
      .map { case (s, i) => brandesChainSql(s"s$i", s, 6) }
      .mkString(",\n")
    val unionAll = sources.indices
      .map(i => s"SELECT node, delta FROM allcs$i")
      .mkString("\n  UNION ALL ")
    s"""$knnEdgesPrefixSql,
       |und AS MATERIALIZED (SELECT id AS a, nbr_id AS b FROM g0
       |  UNION SELECT nbr_id, id FROM g0),
       |$chains,
       |alls AS ($unionAll),
       |ag AS (SELECT node, CAST(count(*) AS BIGINT) AS n_sources_reached,
       |    CAST(SUM(CAST(delta AS DECIMAL(38,18))) AS DOUBLE) /
       |      ${sources.size} AS mean_delta
       |  FROM alls GROUP BY node)
       |SELECT CAST(rk AS INT) AS rank, node, n_sources_reached,
       |  round(mean_delta, 6) AS mean_delta
       |FROM (SELECT *, row_number() OVER (ORDER BY mean_delta DESC,
       |    node) AS rk FROM ag)
       |WHERE rk <= 20 ORDER BY rank""".stripMargin
  }

  /** Replays q425: the q109 lex/dense/fused chain, both top-10 ranks,
    * RBO via the same coefficient literals computed here. */
  private def rboOracleSql: String = {
    val depth = 10; val p = 0.9
    val coef = (1 to depth).map { m =>
      m -> (m to depth).map(d => (1 - p) * math.pow(p, d - 1) / d).sum
    }
    val cases = coef.map { case (m, c) =>
      s"WHEN $m THEN CAST($c AS DOUBLE)"
    }.mkString("\n    ")
    s"""WITH lexbase AS ($bm25OracleSql),
       |lex AS (SELECT id, CAST(row_number() OVER (ORDER BY score DESC,
       |    id) AS INT) AS rank FROM lexbase),
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
       |  WHERE vec_id = 0),
       |dense AS (SELECT vec_id AS id, rank FROM (
       |    SELECT e.vec_id,
       |      CAST(row_number() OVER (ORDER BY
       |        1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |          qv), e.vec_id) AS INT) AS rank
       |    FROM embeddings e, q) WHERE rank <= 20),
       |u AS (SELECT id, 1.0 / (60 + rank) AS contrib FROM lex
       |  UNION ALL SELECT id, 1.0 / (60 + rank) FROM dense),
       |fused AS (SELECT id,
       |    CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE)
       |      AS rrf_score
       |  FROM u GROUP BY id ORDER BY rrf_score DESC, id LIMIT 10),
       |l2 AS (SELECT id, CAST(row_number() OVER (ORDER BY rrf_score
       |    DESC, id) AS INT) AS rank FROM fused),
       |jm AS (SELECT CASE greatest(l1.rank, l2.rank)
       |    $cases
       |    END AS cc
       |  FROM (SELECT id, rank FROM lex WHERE rank <= $depth) l1
       |  JOIN (SELECT id, rank FROM l2 WHERE rank <= $depth) l2
       |    ON l1.id = l2.id)
       |SELECT CAST($depth AS INT) AS depth,
       |  CAST(count(*) AS BIGINT) AS n_common,
       |  round(CAST(coalesce(SUM(CAST(cc AS DECIMAL(38,18))),
       |    CAST(0 AS DECIMAL(38,18))) AS DOUBLE), 9) AS rbo_trunc,
       |  round(CAST(coalesce(SUM(CAST(cc AS DECIMAL(38,18))),
       |    CAST(0 AS DECIMAL(38,18))) AS DOUBLE) +
       |    CAST(${math.pow(p, depth)} AS DOUBLE), 9) AS rbo_max
       |FROM jm""".stripMargin
  }

  /** Replays q426: key-level count tables per side, exact cardinality
    * as Σ cntA·cntB, uniform-NDV estimate and q-error. */
  private def joinCardinalityOracleSql: String = {
    val joins = Seq(("orders_customer", "orders", "o_custkey",
      "customer", "c_custkey"),
      ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem_orders", "lineitem", "l_orderkey", "orders",
        "o_orderkey"))
    joins.map { case (label, ta, ka, tb, kb) =>
      s"""SELECT '$label' AS join_label, na, nb, ndva, ndvb,
         |  round(CAST(na AS DOUBLE) * nb / greatest(ndva, ndvb), 3)
         |    AS est_rows,
         |  CAST(actual AS BIGINT) AS actual_rows,
         |  round(CASE WHEN CAST(actual AS DOUBLE) > 0 THEN greatest(
         |    CAST(na AS DOUBLE) * nb / greatest(ndva, ndvb) /
         |      CAST(actual AS DOUBLE),
         |    CAST(actual AS DOUBLE) /
         |      (CAST(na AS DOUBLE) * nb / greatest(ndva, ndvb))) END, 6)
         |    AS q_error
         |FROM (
         |  SELECT CAST(SUM(cA) AS BIGINT) AS na,
         |    CAST(count(*) AS BIGINT) AS ndva
         |  FROM (SELECT $ka, count(*) AS cA FROM $ta GROUP BY $ka)),
         |  (SELECT CAST(SUM(cB) AS BIGINT) AS nb,
         |    CAST(count(*) AS BIGINT) AS ndvb
         |  FROM (SELECT $kb, count(*) AS cB FROM $tb GROUP BY $kb)),
         |  (SELECT coalesce(SUM(CAST(cA AS HUGEINT) * cB),
         |      CAST(0 AS HUGEINT)) AS actual
         |  FROM (SELECT $ka AS k, count(*) AS cA FROM $ta GROUP BY $ka) x
         |  JOIN (SELECT $kb AS k, count(*) AS cB FROM $tb GROUP BY $kb) y
         |    ON x.k = y.k)""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY join_label"
  }

  /** Replays q427: the scrambled-hash position family, distinct
    * position set, exploded probe join, all-k membership count. */
  private def bloomFprOracleSql: String = {
    val mix = graft.plans.HashExpressions.Mix
    val b1 = graft.plans.HashExpressions.PolyBase1
    val m = 65536; val k = 3
    def hashChain(src: String): String =
      s"""h0 AS (SELECT k, (k * $b1) % $HP AS h FROM $src),
         |h1 AS (SELECT k, (xor(h, h >> 16) * $mix) % $HP AS h FROM h0),
         |h2 AS (SELECT k, (xor(h, h >> 13) * $mix) % $HP AS h FROM h1)"""
        .stripMargin
    s"""WITH mem AS (SELECT DISTINCT o_orderkey AS k FROM orders
       |  WHERE o_orderkey % 7 = 0),
       |prb AS (SELECT DISTINCT o_orderkey AS k FROM orders
       |  WHERE o_orderkey % 7 <> 0),
       |allk AS (SELECT k FROM mem UNION ALL SELECT k FROM prb),
       |${hashChain("allk")},
       |pos AS (SELECT k, ((h + i * $mix) % $HP) % $m AS pos
       |  FROM h2, unnest(range(0, $k)) AS u(i)),
       |pset AS (SELECT DISTINCT pos FROM pos
       |  WHERE k IN (SELECT k FROM mem)),
       |bits AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM pset),
       |fp AS (SELECT CAST(count(*) AS BIGINT) AS n_false_pos FROM (
       |    SELECT p.k FROM pos p JOIN pset USING (pos)
       |    WHERE p.k IN (SELECT k FROM prb)
       |    GROUP BY p.k HAVING count(*) = $k)),
       |nm AS (SELECT CAST(count(*) AS BIGINT) AS n_members FROM mem),
       |np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM prb)
       |SELECT n_members, CAST($m AS INT) AS m_bits,
       |  CAST($k AS INT) AS k_hashes, bits_set,
       |  round(CAST(bits_set AS DOUBLE) / $m, 6) AS fill_ratio,
       |  n_probes, n_false_pos,
       |  round(CAST(n_false_pos AS DOUBLE) / n_probes, 6) AS fpr,
       |  round(CAST(bits_set AS DOUBLE) / $m *
       |    (CAST(bits_set AS DOUBLE) / $m) *
       |    (CAST(bits_set AS DOUBLE) / $m), 6) AS theo_fpr
       |FROM nm, bits, np, fp""".stripMargin
  }

  /** Replays q420: the q20 signature chain over the 3-variant corpus,
    * wedge join on the symmetrized adjacency, left-join closure. */
  private def matchTransitivityOracleSql: String = {
    val corpus3 =
      """SELECT doc_id, text FROM documents
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id,
        |  substring(text, 1, greatest(length(text) - 7, 1)) AS text
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 2000000 AS doc_id,
        |  substring(text, 1, greatest(length(text) - 14, 1)) AS text
        |FROM documents""".stripMargin
    s"""WITH ${minhashPairCtesFor(corpus3)},
       |e AS (SELECT DISTINCT doc_a AS lo, doc_b AS hi FROM pairs
       |  WHERE est_jaccard >= 0.8),
       |adj AS (SELECT lo AS m, hi AS x FROM e
       |  UNION ALL SELECT hi, lo FROM e),
       |wd AS (SELECT l.x AS x, r.x AS y FROM adj l JOIN adj r
       |  ON l.m = r.m WHERE l.x < r.x),
       |cl AS (SELECT wd.x, wd.y,
       |    CASE WHEN e.lo IS NOT NULL THEN 1 ELSE 0 END AS c
       |  FROM wd LEFT JOIN e ON wd.x = e.lo AND wd.y = e.hi),
       |wagg AS (SELECT CAST(count(*) AS BIGINT) AS n_wedges,
       |    CAST(coalesce(SUM(c), 0) AS BIGINT) AS n_closed FROM cl),
       |np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM e)
       |SELECT n_pairs, n_wedges, n_closed,
       |  n_wedges - n_closed AS n_violations,
       |  round(CASE WHEN n_wedges > 0
       |    THEN CAST(n_closed AS DOUBLE) / n_wedges END, 6)
       |    AS closure_ratio
       |FROM wagg, np""".stripMargin
  }

  /** Replays q437: American Soundex as a pure-SQL chain. The mapping
    * string is commons-codec's US English table (H/W excluded from the
    * tail BEFORE coding — the "non-separating" American rule, which is
    * what Spark's builtin implements; verified letter-for-letter against
    * `soundex()` over this corpus's whole vocabulary). Run collapse must
    * precede zero-stripping (vowels separate duplicate codes) and is
    * spelled per digit class because DuckDB's RE2 lacks backreferences. */
  private def soundexOracleSql: String = {
    val collapse = (0 to 6).foldLeft("codes") { (acc, d) =>
      s"regexp_replace($acc, '$d$d+', '$d', 'g')"
    }
    s"""WITH v AS (
       |  SELECT unnest(list_filter(regexp_split_to_array(
       |      lower(text), '[^a-z]+'), x -> x <> '')) AS w FROM documents
       |  UNION ALL
       |  SELECT unnest(list_filter(regexp_split_to_array(
       |      lower(p_name), '[^a-z]+'), x -> x <> '')) FROM part
       |  UNION ALL
       |  SELECT unnest(list_filter(regexp_split_to_array(
       |      lower(p_type), '[^a-z]+'), x -> x <> '')) FROM part),
       |w AS (SELECT DISTINCT w FROM v),
       |m AS (SELECT w, upper(substr(w, 1, 1)) AS f,
       |    translate(upper(substr(w, 1, 1)) ||
       |        translate(upper(substr(w, 2)), 'HW', ''),
       |      'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
       |      '01230120022455012623010202') AS codes
       |  FROM w),
       |c AS (SELECT w, f, $collapse AS coll FROM m),
       |k AS (SELECT w, substr(rpad(f ||
       |    replace(substr(coll, 2), '0', ''), 4, '0'), 1, 4) AS sdx
       |  FROM c)
       |SELECT sdx, CAST(count(DISTINCT w) AS BIGINT) AS n_words,
       |  string_agg(w, ',' ORDER BY w) AS members
       |FROM k GROUP BY sdx
       |ORDER BY n_words DESC, sdx""".stripMargin
  }

  /** Replays q436: per-lag shifted self-join over the daily frame,
    * exact moments into the closed-form Pearson. */
  private def acfOracleSql: String = {
    def block(lag: Int): String =
      s"""SELECT g AS event_type, CAST($lag AS INT) AS lag,
         |  n AS n_pairs,
         |  round(CASE WHEN nn * CAST(sxx AS DOUBLE) -
         |      CAST(sx AS DOUBLE) * sx > 0
         |    AND nn * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy > 0
         |    THEN (nn * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
         |      (sqrt(nn * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) *
         |       sqrt(nn * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
         |  END, 6) AS acf
         |FROM (SELECT a.g, CAST(count(*) AS BIGINT) AS n, count(*) AS nn,
         |    CAST(SUM(a.v) AS BIGINT) AS sx, CAST(SUM(b.v) AS BIGINT)
         |      AS sy,
         |    SUM(CAST(a.v AS HUGEINT) * a.v) AS sxx,
         |    SUM(CAST(b.v AS HUGEINT) * b.v) AS syy,
         |    SUM(CAST(a.v AS HUGEINT) * b.v) AS sxy
         |  FROM d a JOIN d b ON a.g = b.g AND b.t = a.t + $lag
         |  GROUP BY a.g) s
         |WHERE n > 2""".stripMargin
    s"""WITH d AS (SELECT event_type AS g,
       |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
       |      AS BIGINT) AS t,
       |    CAST(count(*) AS BIGINT) AS v
       |  FROM events GROUP BY 1, 2)
       |${(1 to 7).map(block).mkString("\nUNION ALL\n")}
       |ORDER BY event_type, lag""".stripMargin
  }

  /** Replays q415: one window pass computes all five columns' change
    * indicators; per-column stats unpivot via UNION ALL. */
  private def encodingAdvisorOracleSql: String = {
    val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate",
      "l_quantity", "l_partkey")
    val chg = cols.map { c =>
      s"""CASE WHEN lag($c) OVER o IS NULL OR lag($c) OVER o <> $c
         |      THEN 1 ELSE 0 END AS chg_$c""".stripMargin
    }.mkString(",\n    ")
    val ag = cols.map { c =>
      s"""CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv_$c,
         |    CAST(SUM(chg_$c) AS BIGINT) AS runs_$c""".stripMargin
    }.mkString(",\n    ")
    val rows = cols.map { c =>
      s"""SELECT '$c' AS col_name, n, ndv_$c AS ndv, runs_$c AS runs,
         |  CASE WHEN ndv_$c <= 1 THEN 0
         |    ELSE CAST(length(bin(ndv_$c - 1)) AS BIGINT) END AS dict_bits,
         |  round(CAST(n AS DOUBLE) / runs_$c, 6) AS avg_run_len,
         |  ndv_$c * 100 <= n AS dict_recommended
         |FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH w AS (SELECT ${cols.mkString(", ")},
       |    $chg
       |  FROM lineitem
       |  WINDOW o AS (ORDER BY l_orderkey, l_linenumber)),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    $ag
       |  FROM w)
       |$rows
       |ORDER BY col_name""".stripMargin
  }

  /** Replays q410: the SPRT log-constants are computed ONCE here in
    * Scala and embedded as round-trip double literals in BOTH engines
    * (the Spark side embeds the same values via lit) — the
    * data-dependent arithmetic is multiply/add only. */
  private def sprtOracleSql: String = {
    val l1 = math.log(0.55 / 0.45); val l0 = math.log(0.45 / 0.55)
    val a = math.log(0.95 / 0.05); val b = math.log(0.05 / 0.95)
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS k
       |  FROM events GROUP BY 1, 2),
       |c AS (SELECT event_type,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
       |      AS BIGINT) AS i,
       |    CAST(SUM(CAST(k * CAST($l1 AS DOUBLE) +
       |        (n - k) * CAST($l0 AS DOUBLE) AS DECIMAL(38,18)))
       |      OVER (PARTITION BY event_type ORDER BY day
       |        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS llr
       |  FROM d),
       |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |    round(arg_max(llr, i), 6) AS llr_final,
       |    min(CASE WHEN llr >= CAST($a AS DOUBLE) THEN i END) AS day_h1,
       |    min(CASE WHEN llr <= CAST($b AS DOUBLE) THEN i END) AS day_h0
       |  FROM c GROUP BY 1)
       |SELECT event_type, n_days, llr_final, day_h1, day_h0,
       |  CASE WHEN day_h1 IS NULL AND day_h0 IS NULL THEN 'continue'
       |    WHEN day_h0 IS NULL OR (day_h1 IS NOT NULL
       |      AND day_h1 < day_h0) THEN 'accept_h1'
       |    ELSE 'accept_h0' END AS decision
       |FROM g ORDER BY event_type""".stripMargin
  }

  /** Replays q411: the q318 transition/value-iteration chain once for
    * the baseline and once per removed channel (suffixed CTEs), each
    * conversion read against the first-touch distribution. */
  private def removalAttributionOracleSql: String = {
    val channels = Seq("click", "error", "signup", "view")
    def chain(sfx: String, where: String): String = {
      def r(k: Int, prev: String): String =
        s"""r$k$sfx AS (SELECT st.s, CASE WHEN st.s = 'purchase'
           |    THEN 1.0 ELSE COALESCE(f.vn, 0.0) END AS v
           |  FROM st LEFT JOIN (SELECT m$sfx.s, CAST(SUM(CAST(
           |      (CAST(m$sfx.n AS DOUBLE) / m$sfx.tot) * v.v
           |      AS DECIMAL(27,15))) AS DOUBLE) AS vn
           |    FROM m$sfx JOIN $prev v ON m$sfx.t = v.s
           |    GROUP BY m$sfx.s) f ON st.s = f.s)""".stripMargin
      // tot comes from m0 (unfiltered) — removal does NOT renormalize
      s"""m$sfx AS (SELECT * FROM m0$where),
         |r0$sfx AS (SELECT s, CASE WHEN s = 'purchase' THEN 1.0
         |  ELSE 0.0 END AS v FROM st),
         |${(1 to 4).map(k => r(k, s"r${k - 1}$sfx")).mkString(",\n")},
         |rr$sfx AS (SELECT s AS state, round(v, 6) AS v FROM r4$sfx),
         |cv$sfx AS (SELECT CAST(SUM(CAST(fn * coalesce(rr$sfx.v,
         |      CASE WHEN f0.ftype = 'purchase' THEN 1.0 ELSE 0.0 END)
         |      AS DECIMAL(38,18))) AS DOUBLE) / SUM(fn) AS p
         |  FROM f0 LEFT JOIN rr$sfx ON f0.ftype = rr$sfx.state)"""
        .stripMargin
    }
    val variants = chain("b", "") + ",\n" + channels.zipWithIndex.map {
      case (c, i) =>
        chain(s"x$i", s" WHERE s <> '$c' AND t <> '$c'")
    }.mkString(",\n")
    val union = channels.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS channel, p FROM cvx$i"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    event_type FROM events),
       |l AS (SELECT user_id, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts,
       |      event_id) AS from_type,
       |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id)) AS gap_us,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts,
       |      event_id) AS rn
       |  FROM e),
       |p AS (SELECT from_type, event_type AS to_type,
       |    CAST(count(*) AS BIGINT) AS n FROM l
       |  WHERE from_type IS NOT NULL AND gap_us <= 1800000000
       |  GROUP BY 1, 2),
       |f0 AS (SELECT event_type AS ftype, CAST(count(*) AS BIGINT) AS fn
       |  FROM l WHERE rn = 1 GROUP BY 1),
       |m0 AS (SELECT from_type AS s, to_type AS t, n,
       |    SUM(n) OVER (PARTITION BY from_type) AS tot FROM p),
       |st AS (SELECT DISTINCT s FROM
       |  (SELECT s FROM m0 UNION ALL SELECT t FROM m0)),
       |$variants,
       |u AS ($union),
       |ef AS (SELECT channel, u.p AS p_without, cvb.p AS p_base,
       |    CASE WHEN cvb.p > 0 THEN greatest(CAST(0.0 AS DOUBLE),
       |      1.0 - u.p / cvb.p) END AS effect
       |  FROM u, cvb),
       |tt AS (SELECT *, CAST(SUM(CAST(effect AS DECIMAL(38,18)))
       |      OVER () AS DOUBLE) AS tot
       |  FROM ef)
       |SELECT channel, round(p_base, 6) AS p_base,
       |  round(p_without, 6) AS p_without,
       |  round(effect, 6) AS removal_effect,
       |  round(CASE WHEN tot > 0 THEN effect / tot END, 6) AS attr_share
       |FROM tt ORDER BY channel""".stripMargin
  }

  /** Replays q408: 6 IPF rounds as chained CTEs, margin sums
    * decimal-accumulated per step. */
  private def ipfRakeOracleSql: String = {
    def rowStep(k: Int, from: String): String =
      s"""i${k}r AS (SELECT r, c, n, tr, tc,
         |    w * (tr / CAST(SUM(CAST(w AS DECIMAL(38,18)))
         |      OVER (PARTITION BY r) AS DOUBLE)) AS w
         |  FROM $from)""".stripMargin
    def colStep(k: Int): String =
      s"""i${k}c AS (SELECT r, c, n, tr, tc,
         |    w * (tc / CAST(SUM(CAST(w AS DECIMAL(38,18)))
         |      OVER (PARTITION BY c) AS DOUBLE)) AS w
         |  FROM i${k}r)""".stripMargin
    val steps = (1 to 6).map { k =>
      rowStep(k, if (k == 1) "i0" else s"i${k - 1}c") + ",\n" + colStep(k)
    }.mkString(",\n")
    s"""WITH cells AS (SELECT source AS r, lang AS c,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY 1, 2),
       |dims AS (SELECT CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
       |    CAST(COUNT(DISTINCT c) AS BIGINT) AS nc,
       |    CAST(SUM(n) AS BIGINT) AS nt FROM cells),
       |i0 AS (SELECT r, c, n, CAST(nt AS DOUBLE) / nr AS tr,
       |    CAST(nt AS DOUBLE) / nc AS tc, CAST(n AS DOUBLE) AS w
       |  FROM cells, dims),
       |$steps
       |SELECT r AS source, c AS lang, n, round(w, 6) AS weight,
       |  round(w / n, 6) AS rake_factor
       |FROM i6c ORDER BY source, lang""".stripMargin
  }

  /** Replays q409: the q130 learn chain, the k = 0..3 stage tables with
    * the word preserved, lossless-reassembly and tokens/word rollup. */
  private def bpeRoundtripOracleSql: String =
    s"""WITH $bpePrefixSql,
       |c0 AS (SELECT word, freq,
       |    array_to_string(string_split(word, ''), chr(31)) AS w FROM wc),
       |c1 AS (SELECT word, freq,
       |    replace(w, a || chr(31) || b, a || b) AS w FROM c0, b1),
       |c2 AS (SELECT word, freq,
       |    replace(w, a || chr(31) || b, a || b) AS w FROM c1, b2),
       |c3 AS (SELECT word, freq,
       |    replace(w, a || chr(31) || b, a || b) AS w FROM c2, b3),
       |m AS (SELECT 0 AS n_merges, word, freq, w FROM c0
       |  UNION ALL SELECT 1, word, freq, w FROM c1
       |  UNION ALL SELECT 2, word, freq, w FROM c2
       |  UNION ALL SELECT 3, word, freq, w FROM c3)
       |SELECT n_merges, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(SUM(CASE WHEN replace(w, chr(31), '') = word THEN 1
       |    ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
       |  CAST(SUM(freq * len(string_split(w, chr(31)))) AS BIGINT)
       |    AS total_tokens,
       |  CAST(SUM(freq * len(string_split(w, chr(31)))) AS DOUBLE)
       |    / SUM(freq) AS tokens_per_word
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  /** Replays q400: exact BIGINT prefix sums, the OLS SSE identity as
    * one double tree per side, rank by (sse_split, k). */
  private def segmentedTrendOracleSql: String = {
    def sse(n: String, sx: String, sy: String, sxx: String, sxy: String,
            syy: String): String =
      s"""greatest(CAST(0.0 AS DOUBLE),
         |  CASE WHEN CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) * ($sx) / ($n) > 0
         |    THEN CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) * ($sy) / ($n)
         |      - (CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * ($sy) / ($n))
         |        * (CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * ($sy) / ($n))
         |        / (CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) * ($sx) / ($n))
         |    ELSE CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) * ($sy) / ($n)
         |  END)""".stripMargin
    val left = sse("i", "sx", "sy", "sxx", "sxy", "syy")
    val right = sse("tn - i", "tsx - sx", "tsy - sy", "tsxx - sxx",
      "tsxy - sxy", "tsyy - syy")
    val single = sse("tn", "tsx", "tsy", "tsxx", "tsxy", "tsyy")
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events GROUP BY 1, 2),
       |p AS (SELECT event_type, CAST(row_number() OVER (
       |      PARTITION BY event_type ORDER BY day) AS BIGINT) AS i, y
       |  FROM d),
       |c AS (SELECT event_type, i,
       |    CAST(SUM(i) OVER w AS BIGINT) AS sx,
       |    CAST(SUM(y) OVER w AS BIGINT) AS sy,
       |    CAST(SUM(i * i) OVER w AS BIGINT) AS sxx,
       |    CAST(SUM(i * y) OVER w AS BIGINT) AS sxy,
       |    CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
       |    CAST(MAX(i) OVER wa AS BIGINT) AS tn,
       |    CAST(SUM(i) OVER wa AS BIGINT) AS tsx,
       |    CAST(SUM(y) OVER wa AS BIGINT) AS tsy,
       |    CAST(SUM(i * i) OVER wa AS BIGINT) AS tsxx,
       |    CAST(SUM(i * y) OVER wa AS BIGINT) AS tsxy,
       |    CAST(SUM(y * y) OVER wa AS BIGINT) AS tsyy
       |  FROM p
       |  WINDOW w AS (PARTITION BY event_type ORDER BY i
       |      ROWS UNBOUNDED PRECEDING),
       |    wa AS (PARTITION BY event_type)),
       |s AS (SELECT event_type, i, tn,
       |    $left AS sse_left,
       |    $right AS sse_right,
       |    $single AS sse_single
       |  FROM c WHERE i >= 5 AND i <= tn - 5),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
       |      ORDER BY sse_left + sse_right, i) AS rn
       |  FROM s)
       |SELECT event_type, tn AS n, i AS best_k,
       |  round(sse_left, 6) AS sse_left,
       |  round(sse_right, 6) AS sse_right,
       |  round(sse_single, 6) AS sse_single,
       |  round(CASE WHEN sse_single > 0 THEN greatest(CAST(0.0 AS DOUBLE),
       |    (sse_single - (sse_left + sse_right)) / sse_single) END, 6)
       |    AS drop_ratio
       |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin
  }

  /** Replays q388: the q158/q159 scored CTEs, gates paired per doc, the
    * discordant-count χ². */
  private def mcnemarOracleSql: String =
    s"""$scoredMarginCtes,
       |pc AS (SELECT doc_id, quality_pass, margin > 0 AS cls_pass
       |  FROM scored),
       |ag AS (SELECT count(*) AS n,
       |    CAST(SUM(CASE WHEN quality_pass AND cls_pass THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_both,
       |    CAST(SUM(CASE WHEN quality_pass AND NOT cls_pass THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_gopher_only,
       |    CAST(SUM(CASE WHEN NOT quality_pass AND cls_pass THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_cls_only,
       |    CAST(SUM(CASE WHEN NOT quality_pass AND NOT cls_pass THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_neither
       |  FROM pc)
       |SELECT n, n_both, n_gopher_only, n_cls_only, n_neither,
       |  CASE WHEN n_gopher_only + n_cls_only > 0 THEN
       |    round(CAST((n_gopher_only - n_cls_only) *
       |      (n_gopher_only - n_cls_only) AS DOUBLE)
       |      / (n_gopher_only + n_cls_only), 6) END AS mcnemar_chi2
       |FROM ag""".stripMargin

  /** Shared CTE prefix replaying the q101 kNN-graph build: `g0` is the
    * top-3-per-node edge list (id, nbr_id) over the 8-centroid map-side
    * assignment, plus `nodes`/`nn`/`dg` (node set, node count,
    * out-degrees) for the PageRank oracles. */
  private def knnEdgesPrefixSql: String =
    """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings WHERE vec_id < 8),
      |a AS (SELECT vec_id, embedding, centroid_id FROM (
      |    SELECT e.vec_id, e.embedding, c.cid AS centroid_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
      |    FROM embeddings e, c) WHERE rn = 1),
      |p AS (SELECT l.vec_id AS id, r.vec_id AS nbr_id,
      |    1.0 - list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
      |      CAST(r.embedding AS DOUBLE[])) AS distance
      |  FROM a l JOIN a r ON l.centroid_id = r.centroid_id
      |    AND l.vec_id <> r.vec_id),
      |g0 AS (SELECT id, nbr_id FROM (
      |    SELECT id, nbr_id,
      |      row_number() OVER (PARTITION BY id ORDER BY distance, nbr_id) AS rk
      |    FROM p) WHERE rk <= 3),
      |nodes AS (SELECT DISTINCT id FROM (
      |    SELECT id FROM g0 UNION ALL SELECT nbr_id FROM g0)),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |dg AS (SELECT id AS src, count(*) AS deg FROM g0 GROUP BY id)""".stripMargin

  /** Replays q458: one bounded-walk BFS chain per probe node on the
    * q418 kNN edge set, min-depth dedup, then the decimal-accumulated
    * harmonic sum and the within-component closeness. */
  private def harmonicCentralityOracleSql: String = {
    def walk(seed: Long): String =
      s"""w$seed AS (SELECT CAST($seed AS BIGINT) AS node, 0 AS d
         |  UNION
         |  SELECT und.b, w$seed.d + 1 FROM w$seed
         |  JOIN und ON und.a = w$seed.node WHERE w$seed.d < 8),
         |d_w$seed AS (SELECT node, CAST(min(d) AS INT) AS d FROM w$seed
         |  GROUP BY node),
         |a_w$seed AS (SELECT CAST(count(*) AS BIGINT) AS n_reached,
         |  max(d) AS ecc, CAST(SUM(d) AS BIGINT) AS sum_d,
         |  CAST(SUM(CAST(CAST(1 AS DOUBLE) / d AS DECIMAL(38,18)))
         |    AS DOUBLE) AS h
         |  FROM d_w$seed WHERE d > 0)""".stripMargin
    def row(seed: Long): String =
      s"""SELECT CAST($seed AS BIGINT) AS source, n_reached, ecc,
         |  round(h, 6) AS harmonic,
         |  CASE WHEN sum_d > 0 THEN
         |    round(CAST(n_reached AS DOUBLE) / sum_d, 6) END AS closeness
         |FROM a_w$seed""".stripMargin
    s"""${knnEdgesPrefixSql.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |und AS (SELECT id AS a, nbr_id AS b FROM g0
       |  UNION SELECT nbr_id, id FROM g0),
       |${Seq(0L, 1L, 2L).map(walk).mkString(",\n")}
       |${Seq(0L, 1L, 2L).map(row).mkString("\nUNION ALL\n")}
       |ORDER BY source""".stripMargin
  }

  /** Replays q461: the additive Holt-Winters fold as a recursive CTE
    * carrying (l, b, sse, s0..s6); every smoothing constant is dyadic
    * and every expression tree matches the Spark fold, so the replay is
    * bit-identical (the q394 discipline with seasonal state). */
  private def holtWintersOracleSql: String = {
    // position of the INCOMING row (index it.t + 1, 0-based) is it.t % 7
    val sold = "CASE it.t % 7 WHEN 0 THEN it.s0 WHEN 1 THEN it.s1 " +
      "WHEN 2 THEN it.s2 WHEN 3 THEN it.s3 WHEN 4 THEN it.s4 " +
      "WHEN 5 THEN it.s5 ELSE it.s6 END"
    val lp = s"0.5 * (r.y - ($sold)) + 0.5 * (it.l + it.b)"
    val sUpdCols = (0 until 7).map(k =>
      s"""    CASE WHEN it.t % 7 = $k THEN
         |      0.25 * (r.y - ($lp)) + 0.75 * ($sold)
         |      ELSE it.s$k END""".stripMargin).mkString(",\n")
    val sNext = "CASE nn.n_obs % 7 WHEN 0 THEN it.s0 WHEN 1 THEN it.s1 " +
      "WHEN 2 THEN it.s2 WHEN 3 THEN it.s3 WHEN 4 THEN it.s4 " +
      "WHEN 5 THEN it.s5 ELSE it.s6 END"
    s"""WITH RECURSIVE d AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(count(*) AS DOUBLE) AS y
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT event_type, row_number() OVER (
       |    PARTITION BY event_type ORDER BY day) AS t, y FROM d),
       |nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs
       |  FROM r GROUP BY 1),
       |it AS (
       |  SELECT event_type, 1 AS t, y AS l, CAST(0.0 AS DOUBLE) AS b,
       |    CAST(0.0 AS DOUBLE) AS sse,
       |    ${(0 until 7).map(k => s"CAST(0.0 AS DOUBLE) AS s$k")
                .mkString(", ")}
       |  FROM r WHERE t = 1
       |  UNION ALL
       |  SELECT it.event_type, it.t + 1,
       |    $lp,
       |    0.25 * (($lp) - it.l) + 0.75 * it.b,
       |    it.sse + (r.y - (it.l + it.b + ($sold)))
       |      * (r.y - (it.l + it.b + ($sold))),
       |$sUpdCols
       |  FROM it JOIN r ON r.event_type = it.event_type
       |    AND r.t = it.t + 1)
       |SELECT it.event_type, nn.n_obs, it.l AS level, it.b AS trend,
       |  $sNext AS s_next,
       |  it.l + it.b + ($sNext) AS forecast_next,
       |  greatest(it.s0, it.s1, it.s2, it.s3, it.s4, it.s5, it.s6) -
       |    least(it.s0, it.s1, it.s2, it.s3, it.s4, it.s5, it.s6)
       |    AS seas_amplitude,
       |  CASE WHEN nn.n_obs > 1 THEN it.sse / (nn.n_obs - 1) END AS mse
       |FROM it JOIN nn USING (event_type)
       |WHERE it.t = nn.n_obs ORDER BY event_type""".stripMargin
  }

  /** Replays q466: regenerate the PCM by formula, apply the period-6
    * Goertzel weights u = [1,1,0,−1,−1,0] as CASE lookups — all BIGINT. */
  private def goertzelOracleSql: String = {
    def u(e: String): String =
      s"CASE CAST(($e) % 6 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 1 " +
        "WHEN 2 THEN 0 WHEN 3 THEN -1 WHEN 4 THEN -1 ELSE 0 END"
    s"""WITH nn AS (SELECT doc_id, 128 + doc_id % 64 AS n FROM documents),
       |x AS (SELECT doc_id, n, CAST(i AS BIGINT) AS i,
       |    ((doc_id * 31 + i * 17) % 4096) // 4 - 512 +
       |      CASE WHEN doc_id % 3 = 0 THEN
       |        CASE CAST(i % 6 AS INT) WHEN 0 THEN 1000 WHEN 1 THEN 1000
       |          WHEN 2 THEN 0 WHEN 3 THEN -1000 WHEN 4 THEN -1000
       |          ELSE 0 END
       |      ELSE 0 END AS x
       |  FROM nn, unnest(range(0, n)) AS r(i)),
       |g AS (SELECT doc_id, CAST(max(n) AS BIGINT) AS n_samples,
       |    CAST(SUM(x * (${u("n - 1 - i")})) AS BIGINT) AS s1,
       |    CAST(SUM(CASE WHEN i <= n - 2 THEN
       |      x * (${u("n - 2 - i")}) ELSE 0 END) AS BIGINT) AS s2,
       |    CAST(SUM(x * x) AS BIGINT) AS energy
       |  FROM x GROUP BY doc_id),
       |fin AS (SELECT doc_id, n_samples, s1, s2,
       |    s1 * s1 + s2 * s2 - s1 * s2 AS p_tone, energy,
       |    CASE WHEN energy > 0 THEN
       |      round(CAST(s1 * s1 + s2 * s2 - s1 * s2 AS DOUBLE) /
       |        CAST(n_samples * energy AS DOUBLE), 6) END AS tone_share
       |  FROM g)
       |SELECT doc_id, n_samples, s1, s2, p_tone, energy, tone_share,
       |  tone_share > 0.05 AS is_tonal
       |FROM fin ORDER BY doc_id""".stripMargin
  }

  /** Replays q467: interior-pixel Sobel/Laplacian from the closed-form
    * pixel formula (PNG is lossless, so decoded pixels == the formula). */
  private def imageGradientsOracleSql: String = {
    def p(dx: Int, dy: Int): String = {
      def off(v: String, d: Int): String =
        if (d == 0) v else if (d > 0) s"($v + $d)" else s"($v - ${-d})"
      s"((${off("x", dx)} * 7 + ${off("y", dy)} * 13 + doc_id * 31) % 256)"
    }
    val gx = s"(${p(1, -1)} + 2 * ${p(1, 0)} + ${p(1, 1)}) - " +
      s"(${p(-1, -1)} + 2 * ${p(-1, 0)} + ${p(-1, 1)})"
    val gy = s"(${p(-1, 1)} + 2 * ${p(0, 1)} + ${p(1, 1)}) - " +
      s"(${p(-1, -1)} + 2 * ${p(0, -1)} + ${p(1, -1)})"
    val l = s"4 * ${p(0, 0)} - ${p(-1, 0)} - ${p(1, 0)} - " +
      s"${p(0, -1)} - ${p(0, 1)}"
    s"""WITH px AS (SELECT doc_id, CAST(x AS BIGINT) AS x,
       |    CAST(y AS BIGINT) AS y
       |  FROM documents, unnest(range(1, 15)) AS rx(x),
       |    unnest(range(1, 15)) AS ry(y)),
       |v AS (SELECT doc_id, $gx AS gx, $gy AS gy, $l AS l FROM px),
       |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_interior,
       |    CAST(SUM(gx * gx + gy * gy) AS BIGINT) AS ee,
       |    CAST(SUM(l) AS BIGINT) AS ls,
       |    CAST(SUM(l * l) AS BIGINT) AS lq
       |  FROM v GROUP BY doc_id)
       |SELECT doc_id, n_interior, ee AS edge_energy,
       |  round(CAST(ee AS DOUBLE) / n_interior, 6) AS mean_grad_sq,
       |  round((CAST(lq AS DOUBLE) - CAST(ls AS DOUBLE) * ls /
       |    n_interior) / n_interior, 6) AS lap_var
       |FROM a ORDER BY doc_id""".stripMargin
  }

  /** Replays q468: q20's signature/band replay for the estimates plus
    * q143's shared-gram exact Jaccard, err = est − exact with absent
    * exact coalesced to 0, folded to the calibration stats row. */
  private def minhashCalibrationOracleSql: String = {
    val boundedCorpus =
      """SELECT doc_id, text FROM documents WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id,
        |  substring(text, 1, greatest(length(text) - 7, 1)) AS text
        |FROM documents WHERE doc_id < 300""".stripMargin
    s"""WITH ${minhashPairCtesFor(boundedCorpus)},
       |lsh AS (SELECT doc_a, doc_b, est_jaccard FROM pairs
       |  WHERE est_jaccard >= 0.5),
       |g AS (
       |  SELECT DISTINCT doc_id, substring(text, CAST(s AS INT) + 1, 5) AS tok
       |  FROM corpus, unnest(range(0, length(text) - 4, 1)) AS t(s)
       |  WHERE length(text) >= 5
       |  UNION
       |  SELECT doc_id, text AS tok FROM corpus WHERE length(text) < 5),
       |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
       |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS nc
       |  FROM g a JOIN g b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |ej AS (SELECT doc_a, doc_b,
       |    CAST(nc AS DOUBLE) / (sa.n + sb.n - nc) AS jaccard
       |  FROM pr JOIN sz sa ON doc_a = sa.doc_id
       |  JOIN sz sb ON doc_b = sb.doc_id),
       |e AS (SELECT lsh.est_jaccard -
       |    coalesce(ej.jaccard, CAST(0 AS DOUBLE)) AS err
       |  FROM lsh LEFT JOIN ej USING (doc_a, doc_b))
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |  round(CAST(SUM(CAST(err AS DECIMAL(38,18))) AS DOUBLE)
       |    / count(*), 6) AS mean_err,
       |  round(CAST(SUM(CAST(abs(err) AS DECIMAL(38,18))) AS DOUBLE)
       |    / count(*), 6) AS mae,
       |  round(sqrt(CAST(SUM(CAST(err * err AS DECIMAL(38,18)))
       |    AS DOUBLE) / count(*)), 6) AS rmse,
       |  round(CAST(SUM(CASE WHEN abs(err) <= 0.015625 THEN 1 ELSE 0
       |    END) AS DOUBLE) / count(*), 6) AS share_within_granule
       |FROM e""".stripMargin
  }

  /** Replays q469 for one column: dictionary bytes + front-coding
    * savings, prefix length via the monotone-indicator list count. */
  private def stringEncodingColSql(c: String): String =
    s"""SELECT '$c' AS col_name, n, raw_bytes, ndv, dict_bytes,
       |  front_saved_bytes,
       |  round(CAST(dict_bytes AS DOUBLE) / raw_bytes, 6) AS dict_ratio,
       |  round(CAST(dict_bytes - front_saved_bytes AS DOUBLE)
       |    / dict_bytes, 6) AS front_ratio
       |FROM
       |  (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(length(v)) AS BIGINT) AS raw_bytes
       |  FROM (SELECT CAST($c AS VARCHAR) AS v FROM part
       |    WHERE $c IS NOT NULL)),
       |  (SELECT CAST(count(*) AS BIGINT) AS ndv,
       |    CAST(SUM(length(v)) AS BIGINT) AS dict_bytes,
       |    CAST(SUM(cp) AS BIGINT) AS front_saved_bytes
       |  FROM (SELECT v, CASE WHEN pv IS NULL OR
       |      least(length(v), length(pv)) < 1 THEN 0
       |    ELSE list_count(list_filter(
       |      range(1, least(length(v), length(pv)) + 1),
       |      k -> substring(v, 1, CAST(k AS INT))
       |        = substring(pv, 1, CAST(k AS INT)))) END AS cp
       |  FROM (SELECT v, lag(v) OVER (ORDER BY v) AS pv FROM
       |    (SELECT DISTINCT CAST($c AS VARCHAR) AS v FROM part
       |      WHERE $c IS NOT NULL))))""".stripMargin

  /** Replays q470: the q98 BM25 chain once per query (shared corpus
    * stats), LIMIT 10, then the per-query score-list shape stats. */
  private def qppOracleSql(queries: Seq[(String, Seq[String])],
                           k: Int): String = {
    def chain(sfx: String, terms: Seq[String]): String = {
      val inList = terms.map(t => s"'$t'").mkString(", ")
      s"""tf_$sfx AS (SELECT id, dl, term, COUNT(*) AS tf FROM (
         |    SELECT id, dl, unnest(t) AS term FROM dl)
         |  WHERE term IN ($inList)
         |  GROUP BY id, dl, term),
         |dfq_$sfx AS (SELECT term, COUNT(*) AS term_df FROM tf_$sfx
         |  GROUP BY term),
         |sc_$sfx AS (SELECT id,
         |    ln((n_docs - term_df + 0.5) / (term_df + 0.5) + 1.0) *
         |      ((tf * (1.2 + 1.0)) / (tf + 1.2 *
         |        (1.0 - 0.75 + 0.75 * dl / avgdl))) AS contrib
         |  FROM tf_$sfx JOIN dfq_$sfx USING (term), stats),
         |top_$sfx AS (SELECT score FROM (SELECT id,
         |    round(CAST(SUM(CAST(contrib AS DECIMAL(27,15))) AS DOUBLE),
         |      6) AS score
         |  FROM sc_$sfx GROUP BY id
         |  ORDER BY score DESC, id LIMIT $k)),
         |st_$sfx AS (SELECT '$sfx' AS query,
         |    CAST(count(*) AS BIGINT) AS n_hits,
         |    max(score) AS top1,
         |    max(CASE WHEN r = 2 THEN score END) AS top2,
         |    CAST(SUM(CAST(score AS DECIMAL(38,18))) AS DOUBLE) AS s,
         |    CAST(SUM(CAST(score * score AS DECIMAL(38,18))) AS DOUBLE)
         |      AS sq
         |  FROM (SELECT score, row_number() OVER (ORDER BY score DESC)
         |    AS r FROM top_$sfx))""".stripMargin
    }
    val union = queries.map { case (n, _) =>
      s"SELECT * FROM st_$n" }.mkString("\nUNION ALL\n")
    s"""WITH docs AS (SELECT doc_id AS id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x <> '') AS t
       |  FROM documents),
       |dl AS (SELECT id, len(t) AS dl, t FROM docs),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
       |${queries.map { case (n, ts) => chain(n, ts) }.mkString(",\n")}
       |SELECT query, n_hits, top1, top2,
       |  CASE WHEN top2 IS NOT NULL THEN round(top1 - top2, 6) END
       |    AS gap,
       |  round(s / n_hits, 6) AS mean_score,
       |  CASE WHEN (sq - s * s / n_hits) / n_hits > 0 THEN
       |    round(sqrt((sq - s * s / n_hits) / n_hits), 6) END
       |    AS sd_score,
       |  CASE WHEN (sq - s * s / n_hits) / n_hits > 0 THEN
       |    round((top1 - s / n_hits) /
       |      sqrt((sq - s * s / n_hits) / n_hits), 6) END AS clarity
       |FROM ($union) ORDER BY query""".stripMargin
  }

  /** One fixed-point power-iteration round per call: `s{r}` folds each
    * node's `pr div deg` share onto its out-neighbors (BIGINT sum, cast
    * back from DuckDB's HUGEINT), `r{r}` re-mixes with the teleport term
    * `newPr` — identical integer arithmetic to [[GraphAnalytics]]. */
  private def prRoundSql(r: Int, newPr: String): String =
    s"""s$r AS (SELECT g.nbr_id AS id, CAST(sum(r${r - 1}.pr // d.deg) AS BIGINT) AS insum
       |  FROM g0 g JOIN dg d ON g.id = d.src JOIN r${r - 1} ON g.id = r${r - 1}.id
       |  GROUP BY g.nbr_id),
       |r$r AS (SELECT b.id, b.base, CAST($newPr AS BIGINT) AS pr
       |  FROM b LEFT JOIN s$r s USING (id))""".stripMargin

  /** Replays q240: the word co-occurrence graph (distinct unordered
    * within-2 pairs → both directions over a row_number dictionary), then
    * the SAME three [[prRoundSql]] fixed-point rounds as q136. */
  private def textRankOracleSql: String = {
    val rounds = (1 to 3).map(r =>
      prRoundSql(r, "(15 * b.base) // 100 + (85 * coalesce(s.insum, 0)) // 100"))
      .mkString(",\n")
    s"""WITH toks AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x <> '') AS t
       |  FROM documents),
       |pos AS (SELECT doc_id, j AS pos, t[j] AS term
       |  FROM toks, unnest(range(1, len(t) + 1)) AS r(j)),
       |up AS (SELECT DISTINCT least(a.term, b.term) AS w1,
       |    greatest(a.term, b.term) AS w2
       |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
       |    AND b.pos > a.pos AND b.pos <= a.pos + 2
       |    AND a.term <> b.term),
       |dict AS (SELECT term,
       |    CAST(row_number() OVER (ORDER BY term) AS BIGINT) AS wid
       |  FROM (SELECT w1 AS term FROM up UNION SELECT w2 FROM up)),
       |g0 AS (SELECT d1.wid AS id, d2.wid AS nbr_id
       |  FROM up JOIN dict d1 ON up.w1 = d1.term
       |    JOIN dict d2 ON up.w2 = d2.term
       |  UNION ALL
       |  SELECT d2.wid AS id, d1.wid AS nbr_id
       |  FROM up JOIN dict d1 ON up.w1 = d1.term
       |    JOIN dict d2 ON up.w2 = d2.term),
       |nodes AS (SELECT DISTINCT id FROM (
       |    SELECT id FROM g0 UNION ALL SELECT nbr_id FROM g0)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |dg AS (SELECT id AS src, count(*) AS deg FROM g0 GROUP BY id),
       |b AS (SELECT id, CAST(1000000000000 // n AS BIGINT) AS base
       |  FROM nodes, nn),
       |r0 AS (SELECT id, base, base AS pr FROM b),
       |$rounds
       |SELECT d.term, pr,
       |  CAST(row_number() OVER (ORDER BY pr DESC, r3.id) AS INT) AS rk
       |FROM r3 JOIN dict d ON r3.id = d.wid ORDER BY rk""".stripMargin
  }

  /** Replays q192: the q101 kNN graph canonicalized to undirected a<b
    * edges, then 2 synchronous k=4 peel rounds — each round a degree
    * count over the surviving edges, a `deg >= 4` node filter, and an
    * edge filter to surviving endpoints; output is the last round's
    * survivors with that round's degree. */
  private def kCoreOracleSql: String = {
    def round(r: Int): String =
      s"""d$r AS (SELECT v, count(*) AS deg FROM (
         |    SELECT a AS v FROM u${r - 1} UNION ALL SELECT b FROM u${r - 1})
         |  GROUP BY v),
         |k$r AS (SELECT v, deg FROM d$r WHERE deg >= 4),
         |u$r AS (SELECT a, b FROM u${r - 1}
         |  WHERE a IN (SELECT v FROM k$r) AND b IN (SELECT v FROM k$r))""".stripMargin
    s"""$knnEdgesPrefixSql,
       |u0 AS (SELECT DISTINCT least(id, nbr_id) AS a, greatest(id, nbr_id) AS b
       |  FROM g0 WHERE id <> nbr_id),
       |${round(1)},
       |${round(2)}
       |SELECT v AS vec_id, CAST(deg AS BIGINT) AS deg
       |FROM k2 ORDER BY vec_id""".stripMargin
  }

  /** Replays q136: uniform fixed-point start mass, 3 rounds of
    * `(15·base)//100 + (85·insum)//100`, final rank ordered ties-to-id. */
  private def pageRankOracleSql: String = {
    val rounds = (1 to 3).map(r =>
      prRoundSql(r, "(15 * b.base) // 100 + (85 * coalesce(s.insum, 0)) // 100"))
      .mkString(",\n")
    s"""$knnEdgesPrefixSql,
       |b AS (SELECT id, CAST(1000000000000 // n AS BIGINT) AS base FROM nodes, nn),
       |r0 AS (SELECT id, base, base AS pr FROM b),
       |$rounds
       |SELECT id AS vec_id, pr,
       |  CAST(row_number() OVER (ORDER BY pr DESC, id) AS INT) AS rk
       |FROM r3 ORDER BY rk""".stripMargin
  }

  /** Replays q137: the 15% teleport mass split across the 5 seeds, then
    * 3 diffusion rounds `base + (85·insum)//100`; only reached nodes
    * (pr > 0) are returned. */
  private def pprOracleSql: String = {
    val rounds = (1 to 3).map(r =>
      prRoundSql(r, "b.base + (85 * coalesce(s.insum, 0)) // 100"))
      .mkString(",\n")
    s"""$knnEdgesPrefixSql,
       |seeds AS (SELECT DISTINCT vec_id AS id FROM embeddings WHERE vec_id < 5),
       |ns AS (SELECT count(*) AS ns FROM seeds),
       |b AS (SELECT n.id, CASE WHEN s.id IS NOT NULL
       |    THEN CAST(((15 * 1000000000000) // 100) // ns AS BIGINT)
       |    ELSE CAST(0 AS BIGINT) END AS base
       |  FROM nodes n LEFT JOIN seeds s ON n.id = s.id, ns),
       |r0 AS (SELECT id, base, base AS pr FROM b),
       |$rounds
       |SELECT id AS vec_id, base AS teleport, pr
       |FROM r3 WHERE pr > 0 ORDER BY vec_id""".stripMargin
  }

  /** Replays q138: the q135 assignment CTE keeps the vectors; train/eval
    * split by `vec_id % 17`, cell-scoped pairs at cosine ≥ 0.35 (the
    * `1.0 - (1.0 - sim)` double-rounding replay), per-train hit count +
    * exact max cosine + witness (highest cosine, ties to smaller eval
    * id); clean docs kept with zero hits. */
  private def semanticContaminationOracleSql: String =
    """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
      |    CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings WHERE vec_id < 8),
      |a0 AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
      |    c.cid AS centroid_id,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
      |  FROM embeddings e, c),
      |a AS (SELECT vec_id, v, centroid_id FROM a0 WHERE rn = 1),
      |t AS (SELECT * FROM a WHERE vec_id % 17 <> 3),
      |ev AS (SELECT * FROM a WHERE vec_id % 17 = 3),
      |h AS (SELECT t.vec_id AS id, ev.vec_id AS eid,
      |    1.0 - (1.0 - list_cosine_similarity(t.v, ev.v)) AS cos
      |  FROM t JOIN ev ON t.centroid_id = ev.centroid_id
      |  WHERE 1.0 - (1.0 - list_cosine_similarity(t.v, ev.v)) >= 0.35),
      |s AS (SELECT id, CAST(count(*) AS BIGINT) AS n_eval_hits,
      |    max(cos) AS max_cosine
      |  FROM h GROUP BY id),
      |w AS (SELECT id, eid FROM (
      |    SELECT id, eid,
      |      row_number() OVER (PARTITION BY id ORDER BY cos DESC, eid) AS rn
      |    FROM h) WHERE rn = 1)
      |SELECT t.vec_id, t.centroid_id,
      |  CAST(coalesce(s.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
      |  round(s.max_cosine, 6) AS max_cosine, w.eid AS witness_eid,
      |  s.id IS NOT NULL AS contaminated
      |FROM t LEFT JOIN s ON t.vec_id = s.id LEFT JOIN w ON t.vec_id = w.id
      |ORDER BY t.vec_id""".stripMargin

  /** Replays q139: the q101 graph, seed labels clamped, two synchronous
    * majority-vote rounds (count DESC, label ASC ties); a node with no
    * labeled in-neighbor keeps its previous label (or stays NULL). */
  private def labelPropagationOracleSql: String = {
    def round(r: Int): String =
      s"""v$r AS (SELECT g.nbr_id AS dst, l.label, count(*) AS n
         |  FROM g0 g JOIN l${r - 1} l ON g.id = l.id
         |  WHERE l.label IS NOT NULL GROUP BY g.nbr_id, l.label),
         |b$r AS (SELECT dst, label AS vote FROM (
         |    SELECT dst, label,
         |      row_number() OVER (PARTITION BY dst ORDER BY n DESC, label) AS rn
         |    FROM v$r) WHERE rn = 1),
         |l$r AS (SELECT l.id, l.seed,
         |    coalesce(l.seed, b.vote, l.label) AS label
         |  FROM l${r - 1} l LEFT JOIN b$r b ON l.id = b.dst)""".stripMargin
    s"""$knnEdgesPrefixSql,
       |seeds AS (SELECT DISTINCT vec_id AS id, CAST(label AS INT) AS seed
       |  FROM embeddings WHERE vec_id < 200),
       |l0 AS (SELECT n.id, s.seed, s.seed AS label
       |  FROM nodes n LEFT JOIN seeds s USING (id)),
       |${round(1)},
       |${round(2)}
       |SELECT id AS vec_id, label,
       |  CASE WHEN seed IS NOT NULL THEN 'seed'
       |    WHEN label IS NOT NULL THEN 'propagated'
       |    ELSE 'unlabeled' END AS origin
       |FROM l2 ORDER BY vec_id""".stripMargin
  }

  /** Replays q135: the q35 assignment CTE scopes pairs to cells; the
    * `1.0 - (1.0 - sim)` form replays Spark's cosine double rounding
    * (q36), and the loser of each >= 0.35 pair is the member closer to
    * its centroid (tie: larger id) — cap mirrored like the LSH oracles. */
  private def semanticDedupOracleSql: String =
    s"""WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
       |    CAST(embedding AS DOUBLE[]) AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |a0 AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
       |    c.cid AS centroid_id,
       |    list_distance(CAST(e.embedding AS DOUBLE[]), c.cv) AS centroid_dist,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.cv), c.cid) AS rn
       |  FROM embeddings e, c),
       |a AS (SELECT vec_id, v, centroid_id, centroid_dist FROM a0 WHERE rn = 1),
       |ac AS (SELECT * FROM a
       |  QUALIFY COUNT(*) OVER (PARTITION BY centroid_id) <= $MaxBucket),
       |losers AS (SELECT DISTINCT
       |    CASE WHEN x.centroid_dist < y.centroid_dist THEN x.vec_id
       |      WHEN x.centroid_dist > y.centroid_dist THEN y.vec_id
       |      ELSE greatest(x.vec_id, y.vec_id) END AS lid
       |  FROM ac x JOIN ac y
       |    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
       |  WHERE 1.0 - (1.0 - list_cosine_similarity(x.v, y.v)) >= 0.35)
       |SELECT a.vec_id, a.centroid_id,
       |  round(a.centroid_dist, 6) AS centroid_dist,
       |  l.lid IS NULL AS kept
       |FROM a LEFT JOIN losers l ON a.vec_id = l.lid
       |ORDER BY a.vec_id""".stripMargin

  /** Replays q126's full real-codec pipeline arithmetically: GIF is
    * lossless for gray, so generator pixels → integer 2×2 pool → aHash63 →
    * the same 4×16-band Hamming join as the q113 oracle. */
  private def imageNearDupOracleSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, i % 16 AS x, i // 16 AS y,
       |    ((((i % 16) * 7 + (i // 16) * 13 + (doc_id % 20) * 31) % 256
       |      + CASE WHEN (i % 16) = doc_id % 16 AND (i // 16) = (doc_id // 16) % 16
       |          THEN 1 + doc_id % 7 ELSE 0 END) % 256) AS v
       |  FROM documents, unnest(range(0, 256)) t(i) WHERE doc_id < 400),
       |blocks AS (
       |  SELECT doc_id, (y // 2) * 8 + (x // 2) AS j, sum(v) // 4 AS bv
       |  FROM px GROUP BY doc_id, (y // 2) * 8 + (x // 2)),
       |m AS (SELECT doc_id, sum(bv) / 64.0 AS mean FROM blocks GROUP BY doc_id),
       |h AS (SELECT b.doc_id,
       |    CAST(sum(CASE WHEN b.j < 63 AND CAST(b.bv AS DOUBLE) > m.mean
       |      THEN (CAST(1 AS BIGINT) << CAST(b.j AS INT)) ELSE 0 END) AS BIGINT) AS sh
       |  FROM blocks b JOIN m ON b.doc_id = m.doc_id GROUP BY b.doc_id),
       |banded0 AS (
       |  SELECT doc_id, sh, b, (sh >> CAST(b * 16 AS INT)) & 65535 AS band_hash
       |  FROM h, unnest(range(0, 4)) AS t(b)),
       |banded AS (
       |  SELECT * FROM banded0
       |  QUALIFY COUNT(*) OVER (PARTITION BY b, band_hash) <= $MaxBucket),
       |pairs AS (
       |  SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
       |    greatest(x.doc_id, y.doc_id) AS doc_b,
       |    CAST(bit_count(xor(x.sh, y.sh)) AS INT) AS hamming
       |  FROM banded x JOIN banded y
       |    ON x.b = y.b AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin

  /** Hyperplane sign-bit code of DOUBLE[] column `v`, replayed with
    * Spark's association: left fold in array order (list_reduce's
    * first-element init == aggregate's 0.0+p1). */
  private def hyperplaneBitsSql(v: String, nBits: Int): String = {
    val planes = operators.Similarity.hyperplanePlanes(64, nBits)
    planes.zipWithIndex.map { case (plane, b) =>
      val lits = plane.mkString("[", ", ", "]")
      s"CASE WHEN list_reduce(list_transform(range(1, 65), " +
        s"i -> $v[CAST(i AS INT)] * ($lits)[CAST(i AS INT)]), (a, c) -> a + c) >= 0 " +
        s"THEN ${1L << b} ELSE 0 END"
    }.mkString("(", "\n    + ", ")")
  }

  /** Replays q219: per declared (table, lhs, rhs) candidate, distinct
    * pairs → per-lhs rhs counts → class/violation/max rollup, unioned. */
  private def fdAuditOracleSql: String = {
    val cands = Seq(("orders", "o_orderkey", "o_custkey"),
      ("orders", "o_custkey", "o_orderpriority"),
      ("lineitem", "l_orderkey", "l_suppkey"),
      ("lineitem", "l_partkey", "l_suppkey"))
    cands.map { case (t, l, r) =>
      s"""SELECT '$l' AS lhs_col, '$r' AS rhs_col,
         |  CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating,
         |  CAST(MAX(nr) AS BIGINT) AS max_rhs_per_class,
         |  SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) = 0 AS holds
         |FROM (SELECT l, CAST(count(*) AS BIGINT) AS nr
         |  FROM (SELECT DISTINCT $l AS l, $r AS r FROM $t) GROUP BY l)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY lhs_col, rhs_col")
  }

  /** Replays q214: hyperplane sign-cells over the embedding corpus, core
    * cells at minPts = 10, components of the Hamming-1 core-cell graph
    * via a recursive reach (≤ 64 nodes), labels = least cell in the
    * component; isolated core cells label themselves; non-core cells are
    * NULL-cluster noise. */
  private def gridDbscanOracleSql: String = {
    val bits = hyperplaneBitsSql("v", 6)
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, CAST($bits AS BIGINT) AS cell FROM e),
       |cc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_pts
       |  FROM b GROUP BY cell),
       |core AS (SELECT cell FROM cc WHERE n_pts >= 10),
       |edges AS (SELECT a.cell AS s, b2.cell AS d
       |  FROM core a JOIN core b2 ON bit_count(xor(a.cell, b2.cell)) = 1),
       |reach(s, d) AS (
       |  SELECT s, d FROM edges
       |  UNION
       |  SELECT r.s, e2.d FROM reach r JOIN edges e2 ON r.d = e2.s),
       |lab AS (SELECT c.cell,
       |    least(c.cell, coalesce(m.md, c.cell)) AS cluster
       |  FROM core c LEFT JOIN
       |    (SELECT s, min(d) AS md FROM reach GROUP BY s) m ON c.cell = m.s)
       |SELECT b.vec_id AS id, b.cell, cc.n_pts,
       |  lab.cluster IS NOT NULL AS is_core, lab.cluster
       |FROM b JOIN cc USING (cell) LEFT JOIN lab ON b.cell = lab.cell
       |ORDER BY id""".stripMargin
  }

  /** Replays q224: the query row's sub-vectors come from the table (the
    * Spark side folds the same values in as literals — float→double is
    * exact, so the products coincide); 8×8 dots as fixed-order
    * list_reduce folds, Σ of per-query-slice maxima, top-10 by the
    * unrounded score. */
  private def maxSimOracleSql: String = {
    def dot(ds: Int, qs: Int): String =
      s"list_reduce(list_transform(range(1, 9), " +
        s"i -> v[${ds * 8} + CAST(i AS INT)] * qv[${qs * 8} + CAST(i AS INT)]), " +
        "(a, c) -> a + c)"
    val score = (0 until 8).map { qs =>
      "greatest(" + (0 until 8).map(ds => dot(ds, qs)).mkString(",\n      ") + ")"
    }.mkString("(", ")\n    + (", ")")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id = 0),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings)
       |SELECT vec_id, round(s, 6) AS maxsim FROM (
       |  SELECT vec_id, $score AS s
       |  FROM e, q ORDER BY s DESC, vec_id LIMIT 10)""".stripMargin
  }

  private def embeddingNearDupOracleSql: String = {
    val bits = hyperplaneBitsSql("v", 4)
    // 1.0 - (1.0 - sim) replays the Spark side's double rounding exactly
    val cosine = "1.0 - (1.0 - list_cosine_similarity(x.v, y.v))"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b0 AS (SELECT vec_id, v, $bits AS bucket FROM e),
       |b AS (SELECT * FROM b0
       |  QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= $MaxBucket)
       |SELECT least(x.vec_id, y.vec_id) AS doc_a,
       |  greatest(x.vec_id, y.vec_id) AS doc_b,
       |  round($cosine, 6) AS cosine
       |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |WHERE $cosine >= 0.25
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Replays q328: the 8 seeded Gaussian planes as literals (identical
    * to the Spark expression's), the same 0-seeded left-fold dot
    * products, true and 1/sqrt(8)-rescaled projected euclidean distances
    * rounded to 6 before the ratio. */
  private def jlDistortionOracleSql: String = {
    val planes = operators.Similarity.hyperplanePlanes(64, 8)
    val projs = planes.map { plane =>
      val lits = plane.mkString("[", ", ", "]")
      s"list_reduce(list_transform(range(1, 65), " +
        s"i -> v[CAST(i AS INT)] * ($lits)[CAST(i AS INT)]), (a, c) -> a + c)"
    }.mkString("list_value(\n    ", ",\n    ", ")")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE vec_id < 40),
       |p AS (SELECT vec_id, v, $projs AS pj FROM e),
       |pr AS (SELECT x.vec_id AS a, y.vec_id AS b,
       |    round(sqrt(list_reduce(list_transform(range(1, 65),
       |      i -> (x.v[CAST(i AS INT)] - y.v[CAST(i AS INT)])
       |        * (x.v[CAST(i AS INT)] - y.v[CAST(i AS INT)])),
       |      (acc, c) -> acc + c)), 6) AS d_true,
       |    round(sqrt(list_reduce(list_transform(range(1, 9),
       |      i -> (x.pj[CAST(i AS INT)] - y.pj[CAST(i AS INT)])
       |        * (x.pj[CAST(i AS INT)] - y.pj[CAST(i AS INT)])),
       |      (acc, c) -> acc + c) / 8), 6) AS d_proj
       |  FROM p x JOIN p y ON x.vec_id < y.vec_id)
       |SELECT a, b, d_true, d_proj,
       |  CASE WHEN d_true > 0 THEN round(d_proj / d_true, 6) END AS ratio
       |FROM pr ORDER BY a, b""".stripMargin
  }

  /** Replays q333: the winnowing per-step k-gram fold, cut positions
    * where hash % 32 = 0 (1-based i=2.. ⇔ Spark pos=1..), segments from
    * the prepended start list, then the shared-distinct-chunk audit. */
  private def cdcChunksOracleSql: String =
    """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 150
      |  UNION ALL SELECT doc_id + 3000, 'inserted preamble ' || text
      |  FROM documents WHERE doc_id < 150),
      |codes AS (SELECT doc_id, text, length(text) AS n,
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(unicode(substring(text, CAST(i AS INT), 1)) AS BIGINT)) AS cs
      |  FROM corpus WHERE length(text) >= 1),
      |khash AS (SELECT doc_id, text, n,
      |    list_transform(range(1, len(cs) - 6),
      |      i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(cs, i, i + 7)),
      |        (acc, c) -> (acc * 31 + c) % 1000000007)) AS hs
      |  FROM codes),
      |st AS (SELECT doc_id, text, n,
      |    list_prepend(CAST(1 AS BIGINT),
      |      list_filter(range(2, len(hs) + 1), i -> hs[CAST(i AS INT)] % 32 = 0)) AS ss
      |  FROM khash),
      |ch AS (SELECT doc_id,
      |    substring(text, CAST(ss[CAST(i AS INT)] AS INT),
      |      CAST(COALESCE(ss[CAST(i + 1 AS INT)], n + 1) - ss[CAST(i AS INT)] AS INT)) AS chunk
      |  FROM st, unnest(range(1, len(ss) + 1)) AS u(i)),
      |a AS (SELECT DISTINCT doc_id, chunk FROM ch WHERE doc_id < 3000),
      |b AS (SELECT DISTINCT doc_id - 3000 AS doc_id, chunk FROM ch
      |  WHERE doc_id >= 3000),
      |na AS (SELECT doc_id, count(*) AS n_chunks_orig FROM a GROUP BY doc_id),
      |nb AS (SELECT doc_id, count(*) AS n_chunks_twin FROM b GROUP BY doc_id),
      |sh AS (SELECT a.doc_id, count(*) AS n_shared
      |  FROM a JOIN b USING (doc_id, chunk) GROUP BY a.doc_id)
      |SELECT na.doc_id, n_chunks_orig, n_chunks_twin,
      |  COALESCE(n_shared, 0) AS n_shared,
      |  CAST(COALESCE(n_shared, 0) AS DOUBLE) / n_chunks_orig AS shared_frac
      |FROM na JOIN nb USING (doc_id) LEFT JOIN sh USING (doc_id)
      |ORDER BY doc_id""".stripMargin
}
