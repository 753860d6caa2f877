package graft

/** Driver-contract smoke: every declared query runs and returns rows at
  * sf0.001, and every oracle key maps to a real query.
  */
class SparkEntrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("oracleSql keys are a subset of queries keys") {
    SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet shouldBe empty
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      fn(spark, sfDir).count() should be > 0L
    }
  }
}
