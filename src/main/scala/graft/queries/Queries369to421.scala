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

/** Query builders + DuckDB oracles q369-q421, split verbatim from
  * SparkEntry (see its scaladoc for the oracle-parity contract; NOTES.md
  * for the hash/decimal replay rules). */
private[graft] object Queries369to421 extends QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(


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
      // navigability read beside q228's expansion rates. Edges come from
      // the PERSISTED GraphStore (built once per session), not an inline
      // kNN rebuild — the standing-index discipline (VERDICT r6 #1)
      val edges = storedKnnGraph(s, dir)
        .select(col("id").as("src"), col("nbr_id").as("dst"))
      GraphAnalytics.eccentricitySweep(edges, "src", "dst",
        startId = 0L, maxHops = 8)
    }),


    "q419_wl_refinement" -> ((s, dir) => {
      // Weisfeiler-Lehman color curve of the kNN graph: 3 refinement
      // rounds from degree colors — the structural-diversity
      // fingerprint (stabilized classes ≈ the graph's symmetry partition)
      val edges = storedKnnGraph(s, dir)
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
        .orderBy("stratum"))
  )

  def oracleSql: Map[String, String] = Map(


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


      "q407_ucb1_replay" -> ucb1OracleSql,


      "q408_ipf_rake" -> ipfRakeOracleSql,


      "q409_bpe_roundtrip" -> bpeRoundtripOracleSql,


      "q410_sprt" -> sprtOracleSql,


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
          |FROM st GROUP BY stratum ORDER BY stratum""".stripMargin
  )
}
