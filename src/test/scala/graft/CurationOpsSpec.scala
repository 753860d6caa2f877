package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Similarity

/** Round-5 curation additions: blocklist census, leakage-safe k-fold,
  * ANN recall audit, and the k-means|| oversampling round — verified
  * against planted corpora and driver-side replications.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- blocklist census ----

  test("blocklistCensus counts case-insensitive substring occurrences, drops misses") {
    val docs = Seq(
      (1L, "Spark and SPARK and sparkles"),        // 3 hits incl. substring+case
      (2L, "a window dup here, window dupes there"), // phrase hits twice
      (3L, "nothing to see")
    ).toDF("doc_id", "text")
    val out = TextFunctions.blocklistCensus(docs, Seq("spark", "window dup", "zzz"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    out shouldBe Map((1L, "spark") -> 3, (2L, "window dup") -> 2)
  }

  test("blocklistCensus counts non-overlapping left-to-right like SQL replace") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TextFunctions.blocklistCensus(docs, Seq("aa"))
      .collect().map(r => r.getInt(2))
    out.toSeq shouldBe Seq(2)
  }

  // ---- k-fold ----

  test("kfoldByHash never splits a user across folds and populates every fold") {
    val df = SparkEntry.queries("q195_kfold")(spark, "/root/testdata/sf0.001")
    df.groupBy("user_id").agg(countDistinct("fold").as("nf"))
      .filter(col("nf") > 1).count() shouldBe 0
    df.select("fold").distinct().count() shouldBe 5
    df.agg(min("fold"), max("fold")).head match {
      case r => (r.getInt(0), r.getInt(1)) shouldBe (0, 4)
    }
  }

  // ---- ANN recall audit ----

  test("recallAudit reports perfect recall when every cell is probed") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.recallAudit(emb, emb.filter(col("vec_id") < 5),
        k = 5, ncells = 8, nprobe = 8)
      .collect()
    out.length shouldBe 5
    all(out.map(_.getDouble(2))) shouldBe 1.0
  }

  test("recallAudit hit counts are bounded by k and cover every query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.recallAudit(emb, emb.filter(col("vec_id") < 8), k = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.keySet shouldBe (0L until 8L).toSet
    all(out.values) should be <= 10
    all(out.values) should be >= 0
  }

  // ---- mergeable aggregate states ----

  test("mergeAggStates of any batch split equals the from-scratch state") {
    import graft.operators.Upsert
    val rnd = new scala.util.Random(41)
    val rows = (1 to 300).map(i =>
      (s"k${i % 7}", math.floor(rnd.nextDouble() * 2000 - 1000) / 8))
    val df = rows.toDF("k", "v")
    // sum_q is DECIMAL(38,0) (lifetime-exact, no long wrap) — read as BigDecimal
    val direct = Upsert.aggState(df, Seq("k"), "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toMap
    // three-way split by hash of the value, merged in two different orders
    val parts = (0 until 3).map(p => Upsert.aggState(
      df.filter(abs(hash(col("v"))) % 3 === p), Seq("k"), "v"))
    for (order <- Seq(parts, parts.reverse)) {
      val merged = Upsert.mergeAggStates(order, Seq("k")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toMap
      merged shouldBe direct
    }
  }

  test("applyAggDelta maintains n/sum_q bit-identical to a from-scratch recompute; bounds stay conservative") {
    import graft.operators.Upsert
    val rnd = new scala.util.Random(47)
    val base = (1 to 200).map(i => (s"k${i % 5}", math.floor(rnd.nextDouble() * 4000 - 2000) / 8))
    // deletes name actual base rows (the contract); inserts are fresh
    val dels = rnd.shuffle(base).take(60).map { case (k, v) => (k, v, "D") }
    val ins = (1 to 50).map(i => (s"k${i % 5}", math.floor(rnd.nextDouble() * 4000 - 2000) / 8, "I"))
    val state0 = Upsert.aggState(base.toDF("k", "v"), Seq("k"), "v")
    val maintained = Upsert.applyAggDelta(
        state0, (dels ++ ins).toDF("k", "v", "op"), Seq("k"), "v", "op")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toMap
    // post-delta corpus: base minus deleted multiset plus inserts
    val afterRows = dels.foldLeft(base.toBuffer) { case (buf, (k, v, _)) =>
      buf.remove(buf.indexOf((k, v))); buf }.toSeq ++ ins.map(t => (t._1, t._2))
    val exact = Upsert.aggState(afterRows.toDF("k", "v"), Seq("k"), "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4))).toMap
    maintained.keySet shouldBe exact.keySet
    for ((k, (n, sq, mn, mx)) <- maintained) {
      (n, sq) shouldBe ((exact(k)._1, exact(k)._2)) // abelian components: exact
      mn should be <= exact(k)._3                   // semilattice components: sound bounds
      mx should be >= exact(k)._4
    }
  }

  test("applyAggDelta drops a key whose rows are all deleted, and rejects unknown ops") {
    import graft.operators.Upsert
    val base = Seq(("gone", 3.5), ("stays", 1.0)).toDF("k", "v")
    val delta = Seq(("gone", 3.5, "D"), ("stays", 2.0, "I")).toDF("k", "v", "op")
    val out = Upsert.applyAggDelta(Upsert.aggState(base, Seq("k"), "v"),
        delta, Seq("k"), "v", "op")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("stays" -> 2L)
    val bad = Seq(("x", 1.0, "UPSERT")).toDF("k", "v", "op")
    val ex = intercept[Exception] {
      Upsert.applyAggDelta(Upsert.aggState(base, Seq("k"), "v"),
        bad, Seq("k"), "v", "op").collect()
    }
    ex.getMessage should include("op must be I or D")
  }

  test("mergeAggStates passes through keys absent from one side") {
    import graft.operators.Upsert
    val a = Seq(("x", 1.0), ("y", 2.0)).toDF("k", "v")
    val b = Seq(("y", 4.0), ("z", 8.0)).toDF("k", "v")
    val m = Upsert.mergeAggStates(
        Seq(Upsert.aggState(a, Seq("k"), "v"), Upsert.aggState(b, Seq("k"), "v")), Seq("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2).longValueExact())).toMap
    m shouldBe Map("x" -> (1L, 1000000L), "y" -> (2L, 6000000L), "z" -> (1L, 8000000L))
  }

  // ---- mergeable moments state ----

  test("momentsOf(mergeMomentsStates) is split-invariant and matches driver-exact statistics") {
    import graft.operators.Upsert
    val rnd = new scala.util.Random(43)
    val rows = (1 to 240).map(i => (s"k${i % 5}", math.floor(rnd.nextDouble() * 9000) / 16)) :+
      ("single", 7.25) // n=1 key: variance must be NULL, mean exact
    val df = rows.toDF("k", "v")
    val parts = (0 until 4).map(p => Upsert.momentsState(
      df.filter(abs(hash(col("v"))) % 4 === p), Seq("k"), "v"))
    val out = Upsert.momentsOf(Upsert.mergeMomentsStates(parts, Seq("k"))).collect()
      .map(r => r.getString(0) -> r).toMap
    for ((k, grp) <- rows.groupBy(_._1)) {
      val q = grp.map(v => math.floor(v._2 * 1e6 + 0.5).toLong)
      val n = q.size
      val sq = q.map(BigInt(_)).sum
      val sq2 = q.map(x => BigInt(x) * x).sum
      val r = out(k)
      r.getLong(1) shouldBe n.toLong
      r.getDouble(2) shouldBe (sq.toDouble / (n.toDouble * 1e6) * 1e9).round / 1e9
      if (n >= 2) {
        val num = (BigInt(n) * sq2 - sq * sq).toDouble
        val den = (n.toLong * (n - 1)).toDouble * 1e12
        r.getDouble(3) shouldBe math.floor(num / den * 1e9 + 0.5) / 1e9 +- 1e-12
        r.getDouble(4) shouldBe math.floor(math.sqrt(num / den) * 1e9 + 0.5) / 1e9 +- 1e-12
      } else { r.isNullAt(3) shouldBe true; r.isNullAt(4) shouldBe true }
    }
  }

  // ---- Fellegi-Sunter linkage ----

  test("scorePairs matches a brute-force likelihood-ratio reference on planted records") {
    import graft.operators.Linkage
    val recs = Seq(
      (1L, "b1", "alpha", 100.0), (2L, "b1", "alphb", 101.0), // agree both: +5
      (3L, "b1", "gamma", 500.0),                             // vs 1: name no, bal no: -5
      (4L, "b2", "delta", 10.0), (5L, "b2", "delte", 900.0),  // name yes, bal no: +1
      (6L, "b2", "zzzzz", 12.0),                              // vs 4: name no, bal yes: -1
      (7L, "b3", "omega", 1.0)                                // lone block: no pairs
    ).toDF("id", "blk", "name", "bal")
    val out = Linkage.scorePairs(recs, "id", Seq("blk"), Seq("name", "bal"),
      Seq(
        Linkage.LinkField("name", (a, b) => levenshtein(a, b, 1) >= 0, 3, -3),
        Linkage.LinkField("bal", (a, b) => abs(a - b) <= lit(50.0), 2, -2)),
      minScore = Int.MinValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getInt(3))).toMap
    out((1L, 2L)) shouldBe ("11", 5)
    out((1L, 3L)) shouldBe ("00", -5)
    out((2L, 3L)) shouldBe ("00", -5)
    out((4L, 5L)) shouldBe ("10", 1)
    out((4L, 6L)) shouldBe ("01", -1)
    out((5L, 6L)) shouldBe ("00", -5)
    out.size shouldBe 6
    // threshold filters map-side
    graft.operators.Linkage.scorePairs(recs, "id", Seq("blk"), Seq("name", "bal"),
      Seq(Linkage.LinkField("name", (a, b) => levenshtein(a, b, 1) >= 0, 3, -3)),
      minScore = 3).count() shouldBe 2
  }

  test("scoreNeighborPairs scores exactly the n*w sorted-neighborhood candidates") {
    import graft.operators.Linkage
    val recs = (1 to 30).map(i => (i.toLong, f"n$i%03d", i * 10.0)).toDF("id", "name", "bal")
    val out = Linkage.scoreNeighborPairs(recs, "id", "name",
        Seq("name", "bal"),
        Seq(
          Linkage.LinkField("name", (a, b) => levenshtein(a, b, 1) >= 0, 3, -3),
          Linkage.LinkField("bal", (a, b) => abs(a - b) <= lit(25.0), 2, -2)),
        minScore = Int.MinValue, w = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    // candidate set = each record with its 1..3 successors in name order — LINEAR n*w
    val expected = (for (i <- 1 to 30; j <- i + 1 to math.min(i + 3, 30)) yield (i.toLong, j.toLong)).toSet
    out.keySet shouldBe expected
    // adjacent: name lev<=1 (+3), bal diff 10 (+2) -> 5; distance-3: lev<=1 but bal diff 30 -> +3-2=1
    out((5L, 6L)) shouldBe 5
    out((5L, 8L)) shouldBe 1
  }

  test("scoreNeighborPairsMulti catches a duplicate the first sort key misses") {
    import graft.operators.Linkage
    // the planted pair agrees on email but their names sort to opposite
    // ends of the corpus — a single name-ordered pass can never put
    // them within w positions; the email pass makes them adjacent
    val filler = (10L to 80L).map(i => (i, s"m${i}name", s"m${i}@x$i.com"))
    val recs = (Seq(
      (1L, "aaaa dup", "same@dup.com"),
      (2L, "zzzz dup", "same@dup.com")) ++ filler)
      .toDF("id", "name", "email")
    val fields = Seq(Linkage.LinkField("email", (a, b) => a === b, 3, -3))
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val onePass = hits(Linkage.scoreNeighborPairs(recs, "id", "name",
      Seq("email"), fields, minScore = 1, w = 5))
    onePass should not contain ((1L, 2L))
    val multi = hits(Linkage.scoreNeighborPairsMulti(recs, "id",
      Seq("name", "email"), Seq("email"), fields, minScore = 1, w = 5))
    multi should contain((1L, 2L))
    // pass union is a superset of the single pass, and pairs are
    // deduped — no pair appears twice however many passes found it
    multi should contain allElementsOf onePass
    val all = Linkage.scoreNeighborPairsMulti(recs, "id",
      Seq("name", "email", "name"), Seq("email"), fields, minScore = -100, w = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    all.length shouldBe all.distinct.length
  }

  test("scorePairs refuses a quadratic runaway block loudly") {
    import graft.operators.Linkage
    val recs = (1 to 50).map(i => (i.toLong, "hot", s"n$i", 1.0)).toDF("id", "blk", "name", "bal")
    // the guard is fused into the plan (raise_error), so it fires on
    // the ACTION, wrapped in Spark's runtime exception
    val ex = intercept[Exception] {
      Linkage.scorePairs(recs, "id", Seq("blk"), Seq("name"),
        Seq(Linkage.LinkField("name", (a, b) => a === b, 1, -1)),
        minScore = 0, maxBlockRows = 10).count()
    }
    ex.getMessage should include("sorted-neighborhood")
  }

  // ---- k-means|| oversampling ----

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("kmeansOversample matches a driver-computed Bahmani round exactly") {
    val rnd = new scala.util.Random(23)
    val vecs = (1L to 80L).map(i => (i, Array.fill(6)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val l = 8
    val got = Similarity.kmeansOversample(df, ncells = 4, l = l)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet

    // driver replication with the operator's exact arithmetic
    val seeds = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(4).map(_._2)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val scored = vecs.map { case (id, v) =>
      val (mcos, cell) = seeds.zipWithIndex.map { case (s, c) => (cos(v, s), c) }
        .maxBy { case (c, cell) => (c, -cell) }
      val d = 1.0 - mcos
      (id, cell, math.floor(d * d * 1e12 + 0.5).toLong)
    }
    val cost = scored.map(_._3).sum.toDouble
    val want = scored.flatMap { case (id, cell, d2q) =>
      val frac = java.lang.Long.parseLong(md5hex(id.toString).take(15), 16).toDouble /
        1152921504606846976.0
      if (frac < l.toDouble * d2q.toDouble / cost) Some((id, cell, d2q.toDouble / 1e12))
      else None
    }.toSet
    got shouldBe want
    // seeds have d² = 0 and can never be re-picked; the round keeps some rows
    want.map(_._1).intersect(
      vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }.take(4).map(_._1).toSet
    ) shouldBe Set.empty
    want should not be empty
  }
}
