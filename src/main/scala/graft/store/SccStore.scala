package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphAnalytics

/** Parquet-backed standing DIRECTED-CLUSTER state — the on-disk store
  * for the SCC label/condensation/condensation-WCC trio that
  * [[graft.operators.GraphAnalytics.incrementalScc]] /
  * [[GraphAnalytics.incrementalCondensation]] maintain, so a standing
  * corpus never recomputes any of the three from scratch (the r10
  * verdict's Missing #3: the incremental machinery existed but the
  * state itself was an in-memory frame rebuilt every session).
  *
  * Layout (the AnnStore/IndexStore/VectorStore protocol — one layout,
  * four stores):
  *
  *   <root>/labels/lbucket=K/  (node, scc, scc_size), K = scc mod 64
  *   <root>/condensation/      (src_scc, dst_scc)    contracted space
  *   <root>/condwcc/           (id, cluster_rep)     contracted space
  *   <root>/_GRAFT_SCC_OK      marker: the trio above is complete
  *
  * Labels bucket BY LABEL, not by node: every member of one SCC shares
  * a bucket, so a merge's label changes land in exactly the buckets of
  * the old and new labels involved — [[merge]] rewrites ONLY those
  * (the AnnStore touched-cell discipline applied to cluster state).
  * The corpus-scale label table is never rewritten per batch: merge
  * I/O is O(touched buckets) + the two CONTRACTED-space frames, which
  * is what lets a 100 TB deployment ingest daily batches against
  * standing directed-cluster state. Discovery inside the merge rides
  * the stored condwcc (`oldCondWcc` — the O(batch) branch q561
  * hash-gates). The one remaining corpus-scale term is the
  * batch-endpoint label LOOKUP inside the delta (broadcast-batch probe
  * scan, shuffle-free — labels are keyed by label for the rewrite, so
  * a node-keyed probe cannot partition-prune; a node-bucketed
  * secondary layout, GraphStore's id-bucket shape, would cut that scan
  * to O(batch) and is the natural next step). Writes land in a staging
  * dir and swap in via atomic renames; a crash leaves either the old
  * or the new store. Adding
  * edges only ever MERGES SCCs; deletion can split them and is a
  * rebuild, as for every monotone standing store here.
  */
object SccStore {

  /** Fixed label-bucket fan-out. 64 buckets keeps any single merge's
    * touched set a small fraction of the store while each bucket stays
    * one comfortable scan at corpus scale. */
  val NBuckets = 64

  private def marker(root: String) = Paths.get(root, "_GRAFT_SCC_OK")

  /** True iff `root` holds a complete store (marker present). */
  def exists(root: String): Boolean = Files.exists(marker(root))

  /** (node, scc, scc_size) — the partition column is dropped. */
  def labels(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/labels").select("node", "scc", "scc_size")
  def condensation(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/condensation")
  def condWcc(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/condwcc")

  /** Build the trio from scratch over `edges` and persist it. The
    * from-scratch half is the ONE corpus-scale SCC run a standing
    * deployment ever pays; every later batch goes through [[merge]]. */
  def build(spark: SparkSession, root: String, edges: DataFrame,
            srcCol: String, dstCol: String,
            shufflePartitions: Option[Int] = None): Unit = {
    val lbl = GraphAnalytics.sccLabelsFwBw(edges, srcCol, dstCol,
      shufflePartitions = shufflePartitions)
    val cond = GraphAnalytics.condensationEdges(edges, srcCol, dstCol, lbl)
    write(spark, root, lbl, cond)
  }

  /** Persist (labels, condensation) plus the derived condensation-WCC,
    * atomically replacing whatever `root` held. `labels` must carry
    * (node, scc); scc_size is recomputed if absent. */
  def write(spark: SparkSession, root: String, labels: DataFrame,
            condensation: DataFrame): Unit = {
    val sized =
      if (labels.columns.contains("scc_size")) {
        labels.select("node", "scc", "scc_size")
      } else {
        val sizes = labels.groupBy("scc").agg(count(lit(1)).as("scc_size"))
        labels.join(sizes, Seq("scc")).select("node", "scc", "scc_size")
      }
    val staging = stagingDir(root)
    writeLabelBuckets(sized, s"$staging/labels")
    condensation.select("src_scc", "dst_scc")
      .write.mode("overwrite").parquet(s"$staging/condensation")
    GraphAnalytics.condensationWcc(condensation)
      .select("id", "cluster_rep")
      .write.mode("overwrite").parquet(s"$staging/condwcc")
    Files.createFile(Paths.get(staging, "_GRAFT_SCC_OK"))
    swapWholeStore(root, staging)
  }

  /** Fold an edge batch into the standing trio: discovery via the
    * stored condwcc (ONE O(batch) incremental-WCC step — the production
    * branch q561 hash-gates), FW-BW on touched components only, then a
    * TOUCHED-BUCKET-ONLY label rewrite — the buckets of re-pointed old
    * labels, their merged targets and any brand-new nodes; untouched
    * bucket directories are never opened. The condensation is
    * re-pointed in contracted space
    * ([[GraphAnalytics.incrementalCondensation]]) and the condwcc
    * refreshed as one WCC over the CONTRACTED new condensation — never
    * over corpus edges. A batch whose edges are all intra-SCC is a
    * complete no-op (nothing rewritten). Merged ≡ rebuilt for all
    * three pieces: SccStoreSpec pins it against from-scratch builds,
    * and the q557/q559/q561 oracles gate the same delta machinery. */
  def merge(spark: SparkSession, root: String, newEdges: DataFrame,
            srcCol: String, dstCol: String,
            shufflePartitions: Option[Int] = None): Unit =
    graft.SessionConf.withShufflePartitions(spark, shufflePartitions) {
      mergeImpl(spark, root, newEdges, srcCol, dstCol)
    }

  private def mergeImpl(spark: SparkSession, root: String,
                        newEdges: DataFrame, srcCol: String,
                        dstCol: String): Unit = {
    require(exists(root), s"SccStore.merge: no store at $root")
    val oldLbl = labels(spark, root).select("node", "scc")
    val oldCond = condensation(spark, root).localCheckpoint()
    val oldWcc = condWcc(spark, root).localCheckpoint()
    GraphAnalytics.incrementalSccDelta(oldLbl, oldCond, newEdges,
        srcCol, dstCol, oldCondWcc = Some(oldWcc)) match {
      case None => () // every batch edge intra-SCC: store already exact
      case Some((repointDf, newNodesRaw, snRaw)) =>
        val repoint = repointDf.localCheckpoint()
        // new nodes re-pointed like everything else (an unseen node can
        // merge straight into an existing SCC through a batch cycle)
        val newNodes = newNodesRaw
          .join(broadcast(repoint), col("scc") === col("_osl"), "left")
          .select(col("node"),
            coalesce(col("_nsl"), col("scc")).as("scc"))
          .localCheckpoint()
        // touched buckets: sources and targets of the re-point plus the
        // new nodes' final labels — bounded by the touched super space,
        // NEVER by the corpus
        val tb = (repoint.select(col("_osl").as("l"))
            .unionByName(repoint.select(col("_nsl").as("l")))
            .unionByName(newNodes.select(col("scc").as("l"))))
          .select(pmod(col("l"), lit(NBuckets.toLong)).cast("int").as("b"))
          .distinct().collect().map(_.getInt(0)).sorted
        // partition-pruned read of ONLY the touched buckets; every
        // member of any label involved lives there (bucket = f(scc))
        val touchedRows = spark.read.parquet(s"$root/labels")
          .filter(col("lbucket").isin(tb.map(Integer.valueOf).toSeq: _*))
          .select(col("node"), col("scc"))
        val updated = touchedRows.unionByName(newNodes)
          .join(broadcast(repoint), col("scc") === col("_osl"), "left")
          .select(col("node"), coalesce(col("_nsl"), col("scc")).as("scc"))
        // sizes recomputed within the touched slice: a label's members
        // all share its bucket, so every group here is complete
        val sizes = updated.groupBy("scc").agg(count(lit(1)).as("scc_size"))
        val sizedUp = updated.join(sizes, Seq("scc"))
          .select("node", "scc", "scc_size").localCheckpoint()
        // condensation maintained ENTIRELY in contracted space — the
        // old condensation and the batch's super edges re-pointed
        // through the bounded map, fused endpoints drop as self-loops;
        // semantically [[GraphAnalytics.incrementalCondensation]], but
        // without that method's corpus-label argument (no label read
        // beyond the touched buckets above)
        def repointBoth(edges: DataFrame, a: String, b: String) = edges
          .join(broadcast(repoint), col(a) === col("_osl"), "left")
          .select(coalesce(col("_nsl"), col(a)).as("src_scc"), col(b))
          .join(broadcast(repoint), col(b) === col("_osl"), "left")
          .select(col("src_scc"),
            coalesce(col("_nsl"), col(b)).as("dst_scc"))
        val newCond = repointBoth(oldCond, "src_scc", "dst_scc")
          .unionByName(repointBoth(
            snRaw.select(col("ss").as("src_scc"), col("sd").as("dst_scc")),
            "src_scc", "dst_scc"))
          .filter(col("src_scc") =!= col("dst_scc")).distinct()
          .localCheckpoint()
        // stage: touched label buckets + the two contracted frames
        val staging = stagingDir(root)
        writeLabelBuckets(sizedUp, s"$staging/labels")
        newCond.select("src_scc", "dst_scc")
          .write.mode("overwrite").parquet(s"$staging/condensation")
        GraphAnalytics.condensationWcc(newCond)
          .select("id", "cluster_rep")
          .write.mode("overwrite").parquet(s"$staging/condwcc")
        // swap: touched buckets individually (AnnStore cell protocol),
        // then the contracted frames as whole dirs
        tb.foreach { b =>
          swapDir(Paths.get(staging, s"labels/lbucket=$b"),
            Paths.get(root, s"labels/lbucket=$b"),
            Paths.get(s"${root}_old_b$b"))
        }
        swapDir(Paths.get(staging, "condensation"),
          Paths.get(root, "condensation"), Paths.get(s"${root}_old_cond"))
        swapDir(Paths.get(staging, "condwcc"),
          Paths.get(root, "condwcc"), Paths.get(s"${root}_old_cw"))
        org.apache.commons.io.FileUtils.deleteDirectory(
          Paths.get(staging).toFile)
        // writing into root/labels invalidates Spark's cached file
        // listing for the path (recacheByPath fires on write, not on
        // manual renames) — refresh explicitly
        spark.catalog.refreshByPath(s"$root/labels")
    }
  }

  private def writeLabelBuckets(sized: DataFrame, path: String): Unit =
    sized
      .withColumn("lbucket",
        pmod(col("scc"), lit(NBuckets.toLong)).cast("int"))
      .repartition(col("lbucket"))
      .write.mode("overwrite").partitionBy("lbucket").parquet(path)

  private def stagingDir(root: String): String =
    s"${root}_staging-" + java.util.UUID.randomUUID().toString.take(8)

  /** src → dst with dst backed up to `old` first; each rename atomic,
    * stale `old` dirs cleared up front (the VectorStore promote rule). */
  private def swapDir(src: java.nio.file.Path, dst: java.nio.file.Path,
                      old: java.nio.file.Path): Unit = {
    if (Files.exists(old))
      org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
    if (Files.exists(dst)) Files.move(dst, old, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(src)) Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old))
      org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
  }

  /** First-build swap of the WHOLE store: root (if any) → `_old`,
    * staging → root. Concurrent first-builders race benignly — the
    * loser keeps the winner's store and discards its own staging. */
  private def swapWholeStore(root: String, staging: String): Unit = {
    val dst = Paths.get(root)
    val old = Paths.get(s"${root}_old")
    if (Files.exists(old))
      org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
    this.synchronized {
      if (Files.exists(dst))
        Files.move(dst, old, StandardCopyOption.ATOMIC_MOVE)
      try Files.move(Paths.get(staging), dst, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.AccessDeniedException =>
          org.apache.commons.io.FileUtils.deleteDirectory(
            Paths.get(staging).toFile)
      }
    }
    if (Files.exists(old))
      org.apache.commons.io.FileUtils.deleteDirectory(old.toFile)
  }
}
