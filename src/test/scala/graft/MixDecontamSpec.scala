package graft

import org.apache.spark.sql.functions._

import graft.core.Tafra
import graft.operators.Dedup

/** Round-5 additions: fuzzy (MinHash) decontamination, quality-aware
  * dedup keep, and √n temperature-smoothed source mixing.
  */
class MixDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, words: String) = (id, words)

  test("decontaminateFuzzy flags near-copies of eval docs, passes clean ones") {
    val train = Seq(
      doc(1L, "alpha beta gamma delta epsilon zeta eta theta"),
      // near-copy of eval doc 100 (one word changed)
      doc(2L, "red orange yellow green blue indigo violet ultraviolet"),
      doc(3L, "totally unrelated content about spark plans and shuffles"),
      doc(4L, "x")). // too short to shingle → trivially clean
      toDF("doc_id", "text")
    val evalSet = Seq(
      doc(100L, "red orange yellow green blue indigo violet infrared"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminateFuzzy(train, evalSet, k = 16, minMatches = 4)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.getDouble(2), r.getBoolean(3))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)
    // the near-copy shares most shingles → high agreement, flagged
    out(2L)._3 shouldBe true
    out(2L)._1 shouldBe Some(100L)
    out(2L)._2 should be >= 0.25
    // clean docs: either no collisions at all or far below threshold
    out(1L)._3 shouldBe false
    out(3L)._3 shouldBe false
    out(4L) shouldBe ((None, 0.0, false))
  }

  test("decontaminateFuzzy identical doc scores est_sim 1.0") {
    val text = "one two three four five six seven eight nine ten"
    val train = Seq(doc(1L, text)).toDF("doc_id", "text")
    val evalSet = Seq(doc(9L, text)).toDF("doc_id", "text")
    val r = Dedup.decontaminateFuzzy(train, evalSet).collect().head
    r.getDouble(2) shouldBe 1.0
    r.getBoolean(3) shouldBe true
  }

  test("dedupKeepBest keeps the highest-quality member, ties to smallest id") {
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster {1,2,3}: max q=30 tie → id 2
      (7L, 5L)). // singleton keeps
      toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupKeepBest(docs, pairs, "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    out(1L) shouldBe ((1L, false))
    out(2L) shouldBe ((1L, true))
    out(3L) shouldBe ((1L, false))
    out(7L) shouldBe ((7L, true))
  }

  test("mixTemperature quotas follow sqrt(n) and kept sets nest with budget") {
    // src a: 4 docs, src b: 16 docs → weights 2:4 → of budget 9: 3 and 6
    val rows = (1 to 4).map(i => (i.toLong, "a")) ++
      (11 to 26).map(i => (i.toLong, "b"))
    val df = rows.toDF("doc_id", "source")
    val out = new Tafra(df).mixTemperature("source", 9L, Seq("doc_id"))
    val bySrc = out.df.groupBy("source")
      .agg(count(lit(1)).as("n"), first("quota").as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    bySrc("a") shouldBe ((3L, 3L))
    bySrc("b") shouldBe ((6L, 6L))
    // nesting: a larger budget keeps a superset
    val small = out.df.select("doc_id").as[Long].collect().toSet
    val big = new Tafra(df).mixTemperature("source", 15L, Seq("doc_id"))
      .df.select("doc_id").as[Long].collect().toSet
    small.subsetOf(big) shouldBe true
    big.size should be > small.size
  }

  test("mixTemperature with budget 0 keeps nothing; single source gets it all") {
    val df = (1 to 5).map(i => (i.toLong, "only")).toDF("doc_id", "source")
    new Tafra(df).mixTemperature("source", 0L, Seq("doc_id")).df.count() shouldBe 0
    new Tafra(df).mixTemperature("source", 5L, Seq("doc_id")).df.count() shouldBe 5
  }
}
