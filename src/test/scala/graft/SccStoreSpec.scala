package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphAnalytics
import graft.store.SccStore

/** The on-disk standing SCC store: build → read trio, merge ≡ rebuild
  * for all three pieces, atomic-swap durability, and the marker
  * contract. */
class SccStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    sys.props("java.io.tmpdir") + "/graft-sccstore-spec-" +
      java.util.UUID.randomUUID().toString.take(8)

  // two 3-cycles bridged one-way, plus a tail: SCCs {1,2,3}, {4,5,6},
  // {7} under edges 1→2→3→1, 4→5→6→4, 3→4, 6→7
  private def oldEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L),
    (4L, 5L), (5L, 6L), (6L, 4L),
    (3L, 4L), (6L, 7L)).toDF("src", "dst")

  test("build + read: the trio matches the direct computations") {
    val root = freshRoot()
    SccStore.build(spark, root, oldEdges, "src", "dst")
    assert(SccStore.exists(root))
    val direct = GraphAnalytics.sccLabelsFwBw(oldEdges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = SccStore.labels(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == direct)
    val directCond = GraphAnalytics.condensationEdges(oldEdges, "src",
        "dst", GraphAnalytics.sccLabelsFwBw(oldEdges, "src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val storedCond = SccStore.condensation(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedCond == directCond)
    val directWcc = GraphAnalytics.condensationWcc(
        SccStore.condensation(spark, root))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val storedWcc = SccStore.condWcc(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(storedWcc == directWcc)
  }

  test("merge ≡ rebuild on the union graph, for labels, condensation " +
      "and condwcc; store survives the swap") {
    val root = freshRoot()
    SccStore.build(spark, root, oldEdges, "src", "dst")
    // batch closes the bridge 4→...→3? no: add 7→1, creating the cycle
    // 3→4→5→6→7→1→2→3 that fuses EVERYTHING into one SCC
    val batch = Seq((7L, 1L)).toDF("src", "dst")
    SccStore.merge(spark, root, batch, "src", "dst")
    val union = oldEdges.unionByName(batch)
    val rebuilt = GraphAnalytics.sccLabelsFwBw(union, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val merged = SccStore.labels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == rebuilt)
    val rebuiltCond = GraphAnalytics.condensationEdges(union, "src", "dst",
        GraphAnalytics.sccLabelsFwBw(union, "src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mergedCond = SccStore.condensation(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mergedCond == rebuiltCond)
    // condwcc is the WCC of the merged condensation (here: empty —
    // one SCC has no condensation edges, so no super nodes)
    assert(SccStore.condWcc(spark, root).count() ==
      GraphAnalytics.condensationWcc(SccStore.condensation(spark, root))
        .count())
  }

  test("merge that only ADDS a component: untouched labels unchanged, " +
      "new nodes labeled") {
    val root = freshRoot()
    SccStore.build(spark, root, oldEdges, "src", "dst")
    val before = SccStore.labels(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Seq((10L, 11L), (11L, 10L)).toDF("src", "dst")
    SccStore.merge(spark, root, batch, "src", "dst")
    val after = SccStore.labels(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    before.foreach { case (n, l) => assert(after(n) == l) }
    assert(after(10L) == 10L && after(11L) == 10L)
  }

  test("merge on a missing store throws; exists() is the marker") {
    val root = freshRoot()
    assert(!SccStore.exists(root))
    intercept[IllegalArgumentException] {
      SccStore.merge(spark, root,
        Seq((1L, 2L)).toDF("src", "dst"), "src", "dst")
    }
  }
}
