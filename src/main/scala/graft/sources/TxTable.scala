package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional snapshot layer over parquet — the
  * commit-protocol half the lakehouse family was missing around the
  * engine's existing MERGE (`Upsert.applyChanges`), diff
  * (`Upsert.diffSnapshots`), and OPTIMIZE halves (`Layout
  * .compactionPlan` / `zorderLayout`). Modeled on the public
  * Delta/Iceberg design (cf. Armbrust et al., "Delta Lake", VLDB'20):
  * the TABLE STATE is a tiny versioned manifest naming its data
  * files; readers resolve one manifest and read exactly those files;
  * writers add data files (distributed, conflict-free names) and then
  * publish atomically by creating the next manifest version.
  *
  * Layout:
  * {{{
  *   <table>/data/v<N>_<i>.parquet      # immutable, never rewritten
  *   <table>/_manifests/v<N>.json       # {"version":N,"op":...,"files":[...]}
  * }}}
  *
  * Why this shape survives 100 TB:
  *  - the data write is a plain distributed `df.write.parquet` — the
  *    driver only MOVES completed part files to their versioned names
  *    and writes one small JSON (Delta's own asymmetry: data plane
  *    distributed, metadata plane tiny);
  *  - readers never LIST the data directory (object-store listing over
  *    millions of files is the classic scale cliff) — the manifest IS
  *    the file list, so `readVersion` hands Spark an explicit path
  *    list and planning cost scales with the snapshot's file count;
  *  - snapshot isolation is structural: files are immutable and a
  *    manifest is immutable once created, so any reader of version N
  *    sees exactly version N forever — time travel is just "resolve an
  *    older manifest";
  *  - OPTIMISTIC CONCURRENCY rides the filesystem's atomic
  *    create-fails-if-exists: two writers racing to version N+1 —
  *    exactly one manifest creation wins; the loser's data files are
  *    orphans (vacuum's job) and it retries against the new head.
  *    On HDFS create(overwrite=false) is atomic; object stores need
  *    their conditional-put (documented, same contract Delta needs).
  *
  * Data-file names carry their target version (v<N>_<i>_<nonce>) so
  * snapshots stay externally addressable — the DuckDB oracle re-reads
  * a version by globbing `v<N>_*`, and an auditor can diff two
  * snapshots from the manifests alone. The per-commit nonce is what
  * keeps racing writers from colliding on a NAME before exactly one
  * of them wins the manifest race (Delta's GUID-name rule).
  */
object TxTable {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(table: String, v: Int) =
    new Path(s"$table/_manifests/v$v.json")

  /** Largest committed version, or 0 if the table doesn't exist yet. */
  def currentVersion(spark: SparkSession, table: String): Int = {
    val dir = new Path(s"$table/_manifests")
    val f = fs(spark, table)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  /** Data files of version `v`, as written in its manifest (relative
    * to the table root). Manifest format is engine-owned and flat, so
    * the parse is a plain split — no JSON library dependency.
    */
  def filesOf(spark: SparkSession, table: String, v: Int): Seq[String] = {
    require(v >= 1, s"versions start at 1, got $v")
    val p = manifestPath(table, v)
    val f = fs(spark, table)
    require(f.exists(p), s"TxTable: no version $v at $table")
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val files = "\"files\":\\[(.*?)\\]".r.findFirstMatchIn(txt)
      .getOrElse(sys.error(s"TxTable: malformed manifest $p")).group(1)
    if (files.isEmpty) Seq.empty
    else files.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  /** Commit `df` as the next version. `op = "append"` carries the
    * previous version's files forward plus the new ones; `op =
    * "overwrite"` starts the file list fresh (old files stay on disk
    * for time travel until vacuumed). Returns the committed version.
    *
    * Concurrency: the manifest is created with overwrite=false — if
    * another writer won the version race, this commit FAILS LOUDLY
    * with the competing version named (the caller re-reads and
    * retries; automatic rebase is deliberately out of scope for
    * append-only semantics it would silently reorder).
    */
  def commit(df: DataFrame, table: String, op: String = "append"): Int =
    commitAs(df, table, currentVersion(df.sparkSession, table) + 1, op)

  /** The version-pinned commit body — the race window lives between
    * the head read and the manifest create, so tests (and a future
    * retry loop) drive this directly with a chosen target version.
    */
  private[graft] def commitAs(df: DataFrame, table: String, v: Int, op: String): Int = {
    require(op == "append" || op == "overwrite", s"unknown op $op")
    val spark = df.sparkSession
    val f = fs(spark, table)
    // distributed data write to a WRITER-UNIQUE scratch dir (two
    // writers racing to the same version must not clobber each
    // other's in-flight part files — the nonce that de-collides the
    // final names has to cover the scratch too), then versioned
    // names — the move is a metadata op on HDFS-likes
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$table/_tmp_v${v}_$nonce")
    df.write.mode("overwrite").parquet(tmp.toString)
    val parts = f.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    f.mkdirs(new Path(s"$table/data"))
    val named = parts.zipWithIndex.map { case (p, i) =>
      val rel = s"data/v${v}_${i}_$nonce.parquet"
      require(f.rename(p, new Path(s"$table/$rel")), s"rename failed for $p")
      rel
    }.toSeq
    f.delete(tmp, true)
    val carried = if (op == "append" && v > 1) filesOf(spark, table, v - 1) else Seq.empty
    val all = carried ++ named
    val json = s"""{"version":$v,"op":"$op","n_files":${all.size},""" +
      s""""files":[${all.map("\"" + _ + "\"").mkString(",")}]}"""
    val mp = manifestPath(table, v)
    f.mkdirs(mp.getParent)
    def conflict(): Nothing =
      sys.error(s"TxTable: commit conflict — version $v at $table was " +
        "published by another writer; re-read and retry")
    if (f.getScheme == "file") {
      // Hadoop's LOCAL create(overwrite=false) is exists-then-create —
      // a TOCTOU window two racing writers really do hit (caught by
      // the 8-writer stress spec). The atomic local protocol: write
      // the manifest COMPLETE to a hidden temp, then claim the version
      // with a HARD LINK — link(2) fails EEXIST atomically and the
      // published file is whole from its first instant (no
      // partially-written manifest is ever visible).
      val dir = java.nio.file.Paths.get(mp.getParent.toUri.getPath)
      val tmpM = dir.resolve(s".v$v.$nonce.tmp")
      java.nio.file.Files.write(tmpM, json.getBytes("UTF-8"))
      try java.nio.file.Files.createLink(dir.resolve(mp.getName), tmpM)
      catch { case _: java.nio.file.FileAlreadyExistsException => conflict() }
      finally java.nio.file.Files.deleteIfExists(tmpM)
    } else {
      // HDFS-likes: create(overwrite=false) IS atomic there; object
      // stores need their conditional put (documented above)
      val out = try f.create(mp, false) catch {
        case _: java.io.IOException => conflict()
      }
      try out.write(json.getBytes("UTF-8")) finally out.close()
    }
    v
  }

  /** Snapshot read of version `v` — exactly its manifest's files, as
    * an explicit path list (no directory listing, no extra files).
    */
  def readVersion(spark: SparkSession, table: String, v: Int): DataFrame = {
    val files = filesOf(spark, table, v)
    require(files.nonEmpty, s"TxTable: version $v of $table is empty")
    spark.read.parquet(files.map(rel => s"$table/$rel"): _*)
  }

  /** Latest-snapshot read. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, currentVersion(spark, table))

  /** The version history as a DataFrame — (version, op, n_files). */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    (1 to currentVersion(spark, table)).map { v =>
      val p = manifestPath(table, v)
      val in = fs(spark, table).open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val op = "\"op\":\"(.*?)\"".r.findFirstMatchIn(txt).get.group(1)
      (v, op, filesOf(spark, table, v).size)
    }.toDF("version", "op", "n_files")
  }

  /** Drop the whole table (tests / rebuild-from-scratch pipelines). */
  def drop(spark: SparkSession, table: String): Unit = {
    val p = new Path(table)
    val f = fs(spark, table)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** Data files no manifest references (failed-commit orphans,
    * overwritten history after manifests are pruned) — the vacuum
    * candidate list. Listing here is maintenance-path-only by design;
    * the read path never lists.
    */
  def orphans(spark: SparkSession, table: String): Seq[String] = {
    val f = fs(spark, table)
    val dataDir = new Path(s"$table/data")
    if (!f.exists(dataDir)) return Seq.empty
    val referenced = (1 to currentVersion(spark, table))
      .flatMap(v => filesOf(spark, table, v)).toSet
    f.listStatus(dataDir).map(s => s"data/${s.getPath.getName}")
      .filterNot(referenced).sorted.toSeq
  }
}
