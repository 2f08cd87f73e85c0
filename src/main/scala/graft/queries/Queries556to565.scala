package graft
package queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators._
import QueryHelpers._

/** Round-10 additions: the cell-scoped GraphStore merge (removing the
  * standing-store family's last O(corpus)-per-ingest term — the r9
  * verdict's Missing #2) and incremental SCC maintenance on the
  * standing flow-SCC frame (Missing #3). */
private[graft] object Queries556to565 extends QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q556_graph_merge_scoped" -> ((s, dir) => {
      // q382's incremental graph-index insert with the one
      // linear-in-corpus term REMOVED: forward-edge candidates come
      // from the IVF probe discipline (each batch node searches only
      // its nProbe=2 nearest of 8 cells — the cells an AnnStore probe
      // would read, partition-pruned on a stored corpus) instead of an
      // exact full-corpus scan. The oracle restates the merged
      // adjacency under the probed-cell candidate rule, so hash
      // equality proves the scoped merge adds no semantics beyond
      // "probe, link, reverse-link, re-trim" — the HNSW insert shape
      // at O(batch · probed cells) ingest cost (MergeProbe's graph leg
      // measures the flat line at ×8)
      val e = tbl(s, dir, "embeddings")
      val old = e.filter(col("vec_id") % 2 === 0)
      val centroids = e.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cv"))
      val assigned = Similarity.assignNearestCentroid(old, "embedding",
          "vec_id", centroids, "cid", "cv")
        .select(col("vec_id"), col("embedding"), col("centroid_id"))
      val graph = Similarity.knnGraph(assigned, "embedding", "vec_id", 3)
      val root = sys.props("java.io.tmpdir") +
        s"/graft-graph-merge-scoped-$tmpToken"
      store.GraphStore.write(graph, root, nBuckets = 16)
      val batch = e.filter(col("vec_id") % 2 === 1 && col("vec_id") < 100)
      store.GraphStore.mergeScoped(s, root, 16, assigned, centroids,
        "cid", "cv", nProbe = 2, batch, "embedding", "vec_id", k = 3)
      s.read.parquet(root).filter(col("id") < 100)
        .select(col("id"), col("rank"), col("nbr_id"),
          round(col("distance"), 6).as("distance"))
        .orderBy("id", "rank")
    }),

    "q557_incremental_scc" -> ((s, dir) => {
      // incremental SCC maintenance gated merged ≡ rebuilt: the flow
      // graph splits by order key into a standing OLD graph (7/8 of
      // the rows) and a NEW batch (1/8); old labels + condensation
      // edges are the standing state, the batch merges via the q554
      // super-node discipline (batch → super space, touched weak
      // components only, FW-BW on the touched sub-condensation,
      // broadcast re-point), and the result must hash-match q538's
      // definitional oracle on the UNION graph — three engine paths
      // (definitional q538, scalable q546, incremental q557), ONE
      // oracle. Labels stay canonical because an SCC label is its
      // min node, so the merged super-SCC's min IS the union's min
      val li = tbl(s, dir, "lineitem").filter(col("l_quantity") <= 1)
      def edgesOf(f: DataFrame) = f
        .select((col("l_partkey") % 512).as("src"),
          (col("l_suppkey") % 512).as("dst"))
      val oldE = edgesOf(li.filter(col("l_orderkey") % 8 =!= 0))
      val newE = edgesOf(li.filter(col("l_orderkey") % 8 === 0))
      val oldLabels = GraphAnalytics.sccLabelsFwBw(oldE, "src", "dst",
        shufflePartitions = Some(8))
      val oldCond = GraphAnalytics.condensationEdges(oldE, "src", "dst",
        oldLabels)
      GraphAnalytics.incrementalScc(oldLabels, oldCond, newE,
          "src", "dst", shufflePartitions = Some(8))
        .orderBy("node")
    })
  )

  def oracleSql: Map[String, String] = Map(

    // q382's merge oracle with the fw CTE scoped to each new node's
    // nProbe=2 nearest cells (the q103 probe-replay pattern): the
    // stored half (a/p/g0) and the landing half (rv/allx/rr) are
    // unchanged — only the candidate rule differs
    "q556_graph_merge_scoped" ->
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
        |pr AS (SELECT query_id, v, cid FROM (
        |    SELECT nw.vec_id AS query_id, nw.v, c.cid,
        |      row_number() OVER (PARTITION BY nw.vec_id
        |        ORDER BY list_distance(nw.v, c.cv), c.cid) AS rn
        |    FROM nw, c) WHERE rn <= 2),
        |fw AS (SELECT id, nbr_id, distance FROM (
        |    SELECT pr.query_id AS id, a.vec_id AS nbr_id,
        |      1.0 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), pr.v)
        |        AS distance,
        |      row_number() OVER (PARTITION BY pr.query_id
        |        ORDER BY 1.0 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), pr.v),
        |          a.vec_id) AS rk
        |    FROM pr JOIN a ON a.centroid_id = pr.cid) WHERE rk <= 3),
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

    // merged ≡ rebuilt: the incremental path rides q538/q546's
    // definitional oracle VERBATIM — the union graph IS the full flow
    // graph, so any deviation of the merge from a from-scratch SCC run
    // hash-fails here
    "q557_incremental_scc" -> Queries533to540.sccOracleSql
  )
}
