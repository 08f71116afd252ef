package graft

/** The driver contract itself: every registered query has an oracle and
  * vice versa (a key typo on either side silently downgrades a query to
  * rows-only / orphans an oracle), and the flagship entry returns rows.
  */
class EntryContractSpec extends SparkSpec {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("flagship entry returns rows on the smoke scale") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }
}
