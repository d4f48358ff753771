package graft

import org.scalatest.funsuite.AnyFunSuite

/** The discoverability catalog must stay TOTAL over the live registry
  * — the drift the reference's hand-maintained probe.py cannot catch. */
class ProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every registry entry maps to a described family") {
    val described = Probe.families.map(_.prefix).toSet
    val orphans = SparkEntry.queries.keys
      .filterNot(n => described.contains(Probe.familyOf(n)))
    assert(orphans.isEmpty, s"undescribed families: ${orphans.toSeq.sorted}")
  }

  test("every described family has at least one live entry") {
    val live = SparkEntry.queries.keys.map(Probe.familyOf).toSet
    val dead = Probe.families.map(_.prefix).filterNot(live.contains)
    assert(dead.isEmpty, s"families with no entries: $dead")
  }

  test("queryCatalog covers the registry one-to-one") {
    val rows = Probe.queryCatalog(spark).collect()
    assert(rows.length == SparkEntry.queries.size)
    assert(rows.map(_.getString(0)).toSet == SparkEntry.queries.keySet)
    // no entry renders with an unknown family description
    assert(rows.forall(_.getString(2) != "unknown"))
    // oracle coverage: the rows-only/dynamic gates are the exception
    val noSql = rows.filterNot(_.getBoolean(3)).map(_.getString(0))
    assert(noSql.length <= SparkEntry.queries.size / 10,
      s"too many entries without a SQL oracle: ${noSql.toSeq.sorted}")
  }

  test("data sources name the tables the loaders actually read") {
    val known = graft.util.Tables.names.toSet ++ Set("trades", "spot_ticks")
    Probe.dataSources.foreach(ds => assert(known.contains(ds.table), ds.table))
  }
}
