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

  test("bench sf1 growth gate flags a planted quadratic and nothing else") {
    val base = Seq("q_lin" -> 1.0, "q_quad" -> 0.5, "q_tiny" -> 0.01,
      "q54_video" -> 1.0, "q_new" -> 0.0)
    val sf1 = Seq("q_lin" -> 2.0,      // 2x on 10x data: healthy
      "q_quad" -> 45.0,                // 90x: the planted quadratic
      "q_tiny" -> 0.09,                // 9x but sub-second: noise-exempt
      "q54_video" -> 9.0,              // 9x codec CPU: exempt by name
      "q_new" -> 3.0)                  // no/zero baseline: skipped
    val bad = Bench.growthViolations(base, sf1, maxGrowth = 8.0)
    bad.length shouldBe 1
    bad.head should startWith("q_quad")
    // Bench.main exits nonzero on exactly this list (after the JSON is
    // printed and written, so a violation never loses the numbers)
    Bench.growthViolations(base, sf1.filterNot(_._1 == "q_quad"), 8.0) shouldBe empty
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      fn(spark, sfDir).count() should be > 0L
    }
  }
}
