package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.Dedup

/** Round-5 additions: canonical URL normalization, line-level
  * boilerplate removal, and golden-record consolidation.
  */
class EntityWebSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalUrl normalizes case/port/www/fragment/tracking/order") {
    val cases = Seq(
      // scheme+host lowercase, www + default port stripped, path case kept
      ("HTTP://WWW.Example.COM:80/KeepCase/", "http://example.com/KeepCase"),
      // https default port; fragment dropped
      ("https://a.example.org:443/x#frag", "https://a.example.org/x"),
      // non-default port kept
      ("http://example.com:8080/p", "http://example.com:8080/p"),
      // tracking params dropped, survivors sorted
      ("http://e.com/p?z=2&utm_source=t&a=1&fbclid=f&gclid=g&ref=r",
        "http://e.com/p?a=1&z=2"),
      // all params tracking → no query at all
      ("http://e.com/p?utm_campaign=c", "http://e.com/p"),
      // root path trims to nothing; empty query survives as none
      ("http://e.com/", "http://e.com"),
      // utm only matches as a key prefix — values keep 'utm' text
      ("http://e.com/p?q=utm_source", "http://e.com/p?q=utm_source"))
    val out = cases.map(_._1).toDF("u")
      .select(T.canonicalUrl(col("u"))).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) => got shouldBe want }
  }

  test("stripBoilerplateLines drops source-frequent chrome, keeps order") {
    // source A: 4 docs, "FOOTER" in all 4, "HALF" in 2 (= 1/2, inclusive
    // threshold → stripped), unique content per doc.
    // source B: its own "FOOTER" appears once of 2 docs at 1/2 → stripped,
    // but A's footer text is unique in B → kept there.
    val docs = Seq(
      (1L, "A", "alpha\nFOOTER\nHALF\nz1"),
      (2L, "A", "beta\nFOOTER\nHALF\nz2"),
      (3L, "A", "gamma\nFOOTER\nz3"),
      (4L, "A", "delta\nFOOTER\nz4"),
      (5L, "B", "FOOTER\nepsilon"),
      (6L, "B", "zeta\neta")).toDF("doc_id", "source", "text")
    val out = Dedup.stripBoilerplateLines(docs, 1, 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    out(1L) shouldBe (2, "alpha\nz1")
    out(2L) shouldBe (2, "beta\nz2")
    out(3L) shouldBe (2, "gamma\nz3")
    out(4L) shouldBe (2, "delta\nz4")
    // B has 2 docs: FOOTER df=1 → 1*2 >= 2*1 → stripped there too;
    // epsilon/zeta/eta each df=1 → also at the inclusive 1/2 boundary!
    // With 2 docs per source EVERY line hits the threshold — doc 6
    // empties and drops from the output entirely (documented semantics).
    out.contains(5L) shouldBe false
    out.contains(6L) shouldBe false
  }

  test("stripBoilerplateLines is a no-op below the threshold") {
    val docs = Seq(
      (1L, "A", "a\nb"), (2L, "A", "c\nd"), (3L, "A", "e\nf"))
      .toDF("doc_id", "source", "text")
    // 2/3 threshold: every line df=1 < 2 → all kept
    val out = Dedup.stripBoilerplateLines(docs, 2, 3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    out shouldBe Map(1L -> "a\nb", 2L -> "c\nd", 3L -> "e\nf")
  }

  test("goldenRecords resolves per-attribute mode with ties to smallest") {
    val ents = Seq(
      // cluster {1,2,3}: name majority "ann", city tie b/a → "a", age mode 30
      (1L, "ann", "a", 30),
      (2L, "ann", "b", 30),
      (3L, "anm", "b", 31),
      // singleton passes through
      (9L, "solo", "q", 50)).toDF("id", "name", "city", "age")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.goldenRecords(ents, pairs, "id", "id_a", "id_b",
      Seq("name", "city", "age"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3), r.getString(4))).toMap
    out(1L) shouldBe (3L, "ann", "b", "30")
    out(9L) shouldBe (1L, "solo", "q", "50")
  }

  test("goldenRecords ignores nulls and ties whole-null attrs to null") {
    val ents = Seq(
      (1L, Some("x"), None: Option[String]),
      (2L, None, None),
      (3L, Some("y"), None)).toDF("id", "a", "b")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.goldenRecords(ents, pairs, "id", "id_a", "id_b", Seq("a", "b"))
      .collect()
    out.length shouldBe 1
    val r = out.head
    r.getLong(0) shouldBe 1L
    r.getLong(1) shouldBe 3L
    r.getString(2) shouldBe "x" // 1-1 tie x/y → smallest
    r.isNullAt(3) shouldBe true // no non-null value anywhere
  }

  test("goldenRecords refuses non-numeric ids instead of a silent NULL mega-cluster") {
    val ents = Seq(("u1", "x"), ("u2", "y")).toDF("id", "a")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b").limit(0)
    val ex = intercept[Exception] {
      Dedup.goldenRecords(ents, pairs, "id", "id_a", "id_b", Seq("a")).collect()
    }
    ex.getMessage should include("not numeric")
  }

  test("golden selection is a partial agg, not a per-cluster window") {
    val ents = Seq((1L, "x"), (2L, "y")).toDF("id", "a")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val p = Dedup.goldenRecords(ents, pairs, "id", "id_a", "id_b", Seq("a"))
      .queryExecution.executedPlan.toString
    p should include("partial_min")
    (p should not).include("Window")
  }
}
