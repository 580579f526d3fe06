package graft

/** Every declared query runs at sf0.001 and yields a sane result; queries
  * whose semantics guarantee non-emptiness at this scale must be non-empty.
  * (Oracle equivalence is the driver's DuckDB gate; tools/check_oracle.py
  * mirrors it for local dev.)
  */
class OperatorSmokeSpec extends SparkSpec {

  // Pair-finding / anti-join style queries may legitimately be empty at
  // tiny scale; everything else must produce rows.
  private val mayBeEmpty = Set("q_join_anti", "q_except")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key is a declared query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
