package graft

/** Driver-contract consistency: the driver compares `queries` results against
  * `oracleSql` by NAME, so a key present on one side only silently weakens the
  * round's correctness gate (an oracle with no query is dead weight; a query
  * with no oracle gets only a rows>0 check). Pin the two key sets to each
  * other and to the naming scheme the artifacts sort by.
  */
class SparkEntrySpec extends SparkSpec {

  test("every registered query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the qNN_snake_case scheme the artifacts sort by") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming query names: ${bad.toSeq.sorted}")
  }

  test("oracle SQL contains no obviously unrunnable fragment (empty or unbalanced quotes)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle SQL")
      assert(sql.count(_ == '\'') % 2 == 0, s"$name: unbalanced single quotes in oracle SQL")
    }
  }
}
