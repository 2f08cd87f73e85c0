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
}
