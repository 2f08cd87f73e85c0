package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the query-registry machinery itself: `Map ++` silently
  * last-wins on a duplicate key, so a mis-numbered new query would shadow
  * an old one and the correctness gate would shrink by one without
  * failing anywhere — this spec (and the matching `require` at registry
  * init) makes that a hard failure with the offending keys named. */
class RegistrySpec extends AnyFunSuite {

  test("query keys are unique across modules") {
    val keys = graft.queries.QueryRegistry.modules.flatMap(_.queries.keys)
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate query keys across modules: $dups")
  }

  test("oracle keys are unique and every oracle has a query") {
    val modules = graft.queries.QueryRegistry.modules
    val okeys = modules.flatMap(_.oracleSql.keys)
    val dups = okeys.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate oracle keys across modules: $dups")
    val qkeys = modules.flatMap(_.queries.keys).toSet
    val orphans = okeys.filterNot(qkeys.contains).sorted
    assert(orphans.isEmpty, s"oracle keys without a query: $orphans")
  }

  test("registry maps materialize and sizes agree with the module sum") {
    val modules = graft.queries.QueryRegistry.modules
    assert(graft.queries.QueryRegistry.queries.size ==
      modules.map(_.queries.size).sum)
    assert(graft.queries.QueryRegistry.oracleSql.size ==
      modules.map(_.oracleSql.size).sum)
  }

  // --- standing-store consumer enforcement (QueryTags) ------------------
  //
  // The r7/r8 standing-store sweeps were verified by LINE OWNERSHIP in
  // the verdicts — prose that nothing enforced: a consumer silently
  // regressing to an inline rebuild would only show as bench drift.
  // These tests encode the audit: split each query module's SOURCE into
  // per-query blocks (first occurrence of each "qNNN_name" -> marker =
  // the builder; the oracleSql occurrence comes later and is skipped)
  // and assert (a) every tagged consumer references its store helper,
  // (b) no block outside QueryTags.machineryGates calls an inline
  // builder, (c) every machinery gate still does (so the tag list can't
  // rot), (d) every tag key exists in the registry (no typos).

  private lazy val queryBlocks: Map[String, String] = {
    val dir = new java.io.File("src/main/scala/graft/queries")
    val marker = """"(q\d+_[a-z0-9_]+)"\s*->""".r
    val blocks = scala.collection.mutable.LinkedHashMap[String, String]()
    dir.listFiles().filter(_.getName.startsWith("Queries")).sorted
      .foreach { f =>
        val text = java.nio.file.Files.readString(f.toPath)
        val ms = marker.findAllMatchIn(text).toSeq
        ms.zipWithIndex.foreach { case (m, i) =>
          val end = if (i + 1 < ms.size) ms(i + 1).start else text.length
          val key = m.group(1)
          if (!blocks.contains(key)) // builder block precedes its oracle
            blocks(key) = text.substring(m.start, end)
        }
      }
    blocks.toMap
  }

  test("QueryTags keys all exist in the registry") {
    import graft.queries.QueryTags._
    val known = graft.queries.QueryRegistry.queries.keySet
    val all = instruments ++ knnGraphConsumers ++ annStoreConsumers ++
      indexStoreConsumers ++ machineryGates
    val unknown = (all -- known).toSeq.sorted
    assert(unknown.isEmpty, s"QueryTags names unknown queries: $unknown")
  }

  test("every standing-store consumer references its store helper in source") {
    import graft.queries.QueryTags._
    def check(consumers: Set[String], helpers: Seq[String]): Unit =
      consumers.toSeq.sorted.foreach { q =>
        val block = queryBlocks.getOrElse(q,
          fail(s"no source block found for tagged consumer $q"))
        assert(helpers.exists(block.contains),
          s"$q is tagged as a standing-store consumer but its builder " +
            s"references none of ${helpers.mkString(", ")}")
      }
    check(knnGraphConsumers, Seq("storedKnnGraph")) // incl. ...Path
    check(annStoreConsumers, Seq("storedAssigned", "storedAnnPath"))
    check(indexStoreConsumers,
      Seq("storedBm25", "storedIndexPath", "storedIndexTerms"))
  }

  test("inline builders appear ONLY in machinery-gate blocks") {
    import graft.queries.QueryTags._
    val inlineBuilders =
      Seq("Similarity.knnGraph(", "assignNearestCentroid(",
        "invertedIndex(")
    val offenders = queryBlocks.collect {
      case (q, block) if !machineryGates(q) &&
        inlineBuilders.exists(block.contains) => q
    }.toSeq.sorted
    assert(offenders.isEmpty,
      "inline store-builder calls outside QueryTags.machineryGates " +
        s"(either re-point to the standing store or register the gate): " +
        offenders.mkString(", "))
    // the inverse: every registered machinery gate still builds inline,
    // so a stale tag can't silently grant an exemption
    val stale = machineryGates.toSeq.sorted.filterNot { q =>
      inlineBuilders.exists(queryBlocks.getOrElse(q, "").contains)
    }
    assert(stale.isEmpty,
      s"machinery gates with no inline builder call (stale tag): $stale")
  }
}
