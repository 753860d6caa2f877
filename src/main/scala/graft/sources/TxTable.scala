package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
/** Atomic manifest publish — the ONE store-specific step in the commit
  * protocol (the "atomic rename / conditional put" point of the Delta
  * paper). An implementation must make the manifest visible
  * all-or-nothing (no reader may ever observe a partial manifest) and
  * return false IFF the version path already exists — i.e. another
  * writer won the version race. Everything else in the protocol
  * (scratch writes, versioned names, carried file lists, monotonic
  * timestamps) is store-agnostic and lives in [[TxTable.commitAs]].
  *
  * Shipped impls: [[LocalLinkCommitter]] (file:// — hard-link claim)
  * and [[AtomicCreateCommitter]] (HDFS-likes — create(overwrite =
  * false) is atomic there). An object store needs its conditional put
  * (S3 `If-None-Match: *`, GCS `ifGenerationMatch=0`); this seam is
  * where that impl plugs in without touching the protocol.
  */
private[graft] trait TxCommitter {
  /** @return true if this writer won version `mp`; false on conflict */
  def publish(f: FileSystem, mp: Path, json: String, nonce: String): Boolean
}

/** Hadoop's LOCAL create(overwrite=false) is exists-then-create — a
  * TOCTOU window two racing writers really do hit (caught by the
  * 8-writer stress spec). The atomic local protocol: write the
  * manifest COMPLETE to a hidden temp, then claim the version with a
  * HARD LINK — link(2) fails EEXIST atomically and the published file
  * is whole from its first instant.
  */
private[graft] object LocalLinkCommitter extends TxCommitter {
  def publish(f: FileSystem, mp: Path, json: String, nonce: String): Boolean = {
    val dir = java.nio.file.Paths.get(mp.getParent.toUri.getPath)
    val tmpM = dir.resolve(s".${mp.getName.stripSuffix(".json")}.$nonce.tmp")
    java.nio.file.Files.write(tmpM, json.getBytes("UTF-8"))
    try { java.nio.file.Files.createLink(dir.resolve(mp.getName), tmpM); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally java.nio.file.Files.deleteIfExists(tmpM)
  }
}

/** HDFS-likes: create(overwrite=false) IS an atomic namespace op. */
private[graft] object AtomicCreateCommitter extends TxCommitter {
  def publish(f: FileSystem, mp: Path, json: String, nonce: String): Boolean = {
    val out = try f.create(mp, false) catch {
      case _: java.io.IOException => return false
    }
    try out.write(json.getBytes("UTF-8")) finally out.close()
    true
  }
}

/** The object-store primitive the commit protocol needs — a WHOLE-
  * OBJECT conditional PUT that succeeds iff the key does not yet
  * exist. This is exactly the server-side contract of S3
  * `If-None-Match: *`, GCS `ifGenerationMatch=0`, and ABFS
  * `If-None-Match: *`: the object becomes visible atomically and
  * WHOLE (object stores have no partial-file state), and exactly one
  * of N racing writers gets the 200. A production deployment
  * implements this with the store's SDK; the protocol above it is
  * identical.
  */
trait ConditionalStore {
  /** @return true iff `key` did not exist and now holds `bytes` */
  def putIfAbsent(f: FileSystem, key: Path, bytes: Array[Byte]): Boolean
}

/** Local-FS emulation of the conditional put (this sandbox has no
  * object store): stage the bytes COMPLETE in a hidden sibling, then
  * claim the key with link(2) — EEXIST is the lost race, and the
  * published object is whole from its first instant, which is the
  * atomicity a real store provides server-side. The temp is removed
  * on both outcomes, so a lost race leaves NO manifest orphan.
  */
final class LocalEmulatedObjectStore extends ConditionalStore {
  def putIfAbsent(f: FileSystem, key: Path, bytes: Array[Byte]): Boolean = {
    val dir = java.nio.file.Paths.get(key.getParent.toUri.getPath)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, s".put_${key.getName}_", ".tmp")
    try {
      java.nio.file.Files.write(tmp, bytes)
      try { java.nio.file.Files.createLink(dir.resolve(key.getName), tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally { java.nio.file.Files.deleteIfExists(tmp); () }
  }
}

/** [[TxCommitter]] over any [[ConditionalStore]] — the object-store
  * commit path (the "atomic put-if-absent" point of the Delta paper,
  * §3.2): the manifest IS the whole object, so publish is ONE
  * conditional put and the version race resolves server-side. No
  * rename, no lease, no lock service; a lost CAS returns false and
  * the caller's conflict path takes over (retry / idempotent rescan).
  */
final class ObjectStoreCommitter(store: ConditionalStore) extends TxCommitter {
  def publish(f: FileSystem, mp: Path, json: String, nonce: String): Boolean =
    store.putIfAbsent(f, mp, json.getBytes("UTF-8"))
}

object TxTable {

  /** Test/extension hook: force a specific committer (e.g. a double
    * proving the conflict path, or a future object-store impl).
    */
  @volatile private[graft] var committerOverride: Option[TxCommitter] = None

  private def committerFor(f: FileSystem): TxCommitter =
    committerOverride.getOrElse(
      if (f.getScheme == "file") LocalLinkCommitter else AtomicCreateCommitter)

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(table: String, v: Int) =
    new Path(s"$table/_manifests/v$v.json")

  /** Resolve a manifest file entry to a readable path. Entries are
    * normally RELATIVE to the table root; a SHALLOW CLONE
    * ([[cloneShallow]]) records the source's files as ABSOLUTE paths
    * (leading '/'), which pass through unchanged — the zero-copy
    * borrow. Every physical read and file-size probe resolves through
    * here so clone snapshots read identically to owned ones.
    */
  private def dataPath(table: String, rel: String): String =
    if (rel.startsWith("/")) rel else s"$table/$rel"

  /** JSON string escape/unescape for manifest-embedded schema DDL —
    * engine-owned flat format, same minimal rules Verify uses.
    */
  private def jesc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c    => c.toString
  }

  private def junesc(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case c => b.append(c); i += 2
        }
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  /** Manifest stats/bloom fragments — ONE renderer for every manifest
    * writer (commitAs and restore), so the two can never drift.
    */
  private def statsJsonOf(stats: Seq[(String, String, Double, Double)]): String =
    if (stats.isEmpty) ""
    else "," + "\"stats\":[" + stats.map { case (fl, c, lo, hi) =>
      s"""{"f":"$fl","c":"$c","lo":$lo,"hi":$hi}"""
    }.mkString(",") + "]"

  private def bloomJsonOf(blooms: Seq[(String, String, Int, Int, String)]): String =
    if (blooms.isEmpty) ""
    else "," + "\"bloom\":[" + blooms.map { case (fl, c, m, k, b64) =>
      s"""{"f":"$fl","c":"$c","m":$m,"k":$k,"b":"$b64"}"""
    }.mkString(",") + "]"

  /** Per-file VALUE-SET skipping entries (file, physical column,
    * distinct values) — the partition-pruning equivalent for
    * low-cardinality categorical columns WITHOUT physical
    * partitioning: a file whose recorded value set misses the probe
    * value cannot contain it (exact, not probabilistic — the
    * categorical complement of the bloom index, which serves
    * high-cardinality keys). Values are PER-VALUE ESCAPED, then
    * U+001F-joined inside one flat string so the manifest grammar
    * stays nested-bracket-free. The per-value escape (backslash
    * doubled, U+001F to \\s, ']' to \\q) runs BEFORE the join, so a
    * data value containing the separator can never be mis-split at
    * parse time, and a ']' in a value can never truncate arraySpan's
    * bracket match — the "exact, no false positives either way"
    * claim holds for arbitrary values.
    */
  private def vsepEsc(v: String): String =
    v.replace("\\", "\\\\").replace("\u001f", "\\s").replace("]", "\\q")

  private def vsepUnesc(v: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < v.length) {
      if (v.charAt(i) == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case 's' => b.append('\u001f')
          case 'q' => b.append(']')
          case c   => b.append(c) // doubled backslash
        }
        i += 2
      } else { b.append(v.charAt(i)); i += 1 }
    }
    b.toString
  }

  private def vsetJsonOf(vsets: Seq[(String, String, Seq[String])]): String =
    if (vsets.isEmpty) ""
    else "," + "\"vset\":[" + vsets.map { case (fl, c, vs) =>
      s"""{"f":"$fl","c":"$c","v":"${jesc(vs.map(vsepEsc).mkString("\u001f"))}"}"""
    }.mkString(",") + "]"

  /** Files with more distinct values than this record no value set
    * (they are always kept — conservative, and the manifest stays
    * small). A range-/hash-clustered layout on the column keeps
    * per-file cardinality tiny, which is the point.
    */
  val VsetMaxValues: Int = 64

  /** Merge-on-read tombstone sidecars: (tombstone file, PHYSICAL key
    * column). Each sidecar holds (_gf = data-file name, _gk = key)
    * pairs the snapshot read anti-joins away.
    */
  private def tombJsonOf(tombs: Seq[(String, String)]): String =
    if (tombs.isEmpty) ""
    else "," + "\"tomb\":[" + tombs.map { case (fl, k) =>
      s"""{"f":"$fl","k":"$k"}"""
    }.mkString(",") + "]"

  /** Positional deletion-vector sidecars: each holds (_gf = data-file
    * name, _gp = row ordinal) pairs the snapshot read anti-joins away
    * — the Delta/Iceberg deletion-vector shape. Schema-independent
    * (no key column) and cheaper than the key form on wide string
    * keys: the read compares a long ordinal, never a key value.
    */
  private def posdJsonOf(posd: Seq[String]): String =
    if (posd.isEmpty) ""
    else "," + "\"posd\":[" + posd.map(fl => s"""{"f":"$fl"}""")
      .mkString(",") + "]"

  /** Per-file ROW COUNTS (the Delta `numRecords` shape): recorded at
    * commit when `countRows` is set, carried with their files like
    * skipping stats. With every live file counted — and every
    * outstanding positional deletion vector an exact (file, ordinal)
    * decrement — `SELECT COUNT(*)` answers from the MANIFEST alone
    * ([[metaCount]]): O(log) driver work on a 100 TB table, zero data
    * IO. Key-form tombstones make the count underivable (one key may
    * match many rows), so [[metaCount]] refuses loudly while any are
    * outstanding.
    */
  private def rowsJsonOf(rows: Seq[(String, Long)]): String =
    if (rows.isEmpty) ""
    else "," + "\"rows\":[" + rows.map { case (fl, n) =>
      s"""{"f":"$fl","n":$n}"""
    }.mkString(",") + "]"

  /** Column mapping (the Delta column-mapping / Iceberg field-id
    * shape, keyed by STABLE physical name instead of an id): each live
    * column's (logical name, physical name). Physical names never
    * change once any file is written — rename edits only the logical
    * side (metadata-only), drop removes the entry (old files project
    * through the mapping, the orphaned physical column is simply never
    * selected).
    */
  private def mapJsonOf(map: Option[Seq[(String, String)]]): String =
    map.fold("")(m => "," + "\"map\":[" + m.map { case (n, p) =>
      s"""{"n":"${jesc(n)}","p":"${jesc(p)}"}"""
    }.mkString(",") + "]")

  /** ONE manifest renderer for every writer (commitAs, restore, the
    * metadata-only rename/drop commits, merge-on-read delete) — the
    * grammar cannot drift between paths.
    */
  private def renderManifest(v: Int, op: String, ts: Long, txnJson: String,
                             evolved: Boolean, schemaDDL: Option[String],
                             files: Seq[String],
                             stats: Seq[(String, String, Double, Double)],
                             blooms: Seq[(String, String, Int, Int, String)],
                             tombs: Seq[(String, String)],
                             map: Option[Seq[(String, String)]],
                             vsets: Seq[(String, String, Seq[String])] = Nil,
                             part: Option[String] = None,
                             posd: Seq[String] = Nil,
                             rows: Seq[(String, Long)] = Nil): String = {
    val msJson = if (evolved) ""","ms":1""" else ""
    val partJson = part.fold("")(p => s""","part":"${jesc(p)}"""")
    val schemaJson = schemaDDL.map(d => s""""schema":"${jesc(d)}",""").getOrElse("")
    s"""{"version":$v,"op":"$op","commit_ms":$ts$txnJson$msJson$partJson,""" +
      schemaJson + s""""n_files":${files.size},""" +
      s""""files":[${files.map("\"" + _ + "\"").mkString(",")}]""" +
      statsJsonOf(stats) + bloomJsonOf(blooms) + tombJsonOf(tombs) +
      mapJsonOf(map) + vsetJsonOf(vsets) + posdJsonOf(posd) +
      rowsJsonOf(rows) + "}"
  }

  /** DELTA manifest renderer (the commits between checkpoints):
    * `base` names the parent whose resolved state the delta applies
    * to; `add`/`rm` are the file-list edits; stats/bloom/vset entries
    * cover the ADDED files only (removed files' entries drop during
    * reconstruction). Scalar fields and the tombstone list render in
    * full, exactly like the full form, so their accessors never need
    * the chain. Manifest bytes are O(files changed + tombs), never
    * O(table).
    */
  private def renderDeltaManifest(v: Int, op: String, ts: Long, txnJson: String,
                                  evolved: Boolean, schemaDDL: Option[String],
                                  base: Int, nFiles: Int,
                                  addFiles: Seq[String], rmFiles: Seq[String],
                                  addStats: Seq[(String, String, Double, Double)],
                                  addBlooms: Seq[(String, String, Int, Int, String)],
                                  tombs: Seq[(String, String)],
                                  map: Option[Seq[(String, String)]],
                                  addVsets: Seq[(String, String, Seq[String])],
                                  part: Option[String] = None,
                                  posd: Seq[String] = Nil,
                                  addRows: Seq[(String, Long)] = Nil): String = {
    val msJson = if (evolved) ""","ms":1""" else ""
    val partJson = part.fold("")(p => s""","part":"${jesc(p)}"""")
    val schemaJson = schemaDDL.map(d => s""""schema":"${jesc(d)}",""").getOrElse("")
    s"""{"version":$v,"op":"$op","commit_ms":$ts$txnJson$msJson$partJson,""" +
      schemaJson + s""""base":$base,"n_files":$nFiles,""" +
      s""""add":[${addFiles.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""rm":[${rmFiles.map("\"" + _ + "\"").mkString(",")}]""" +
      statsJsonOf(addStats) + bloomJsonOf(addBlooms) + tombJsonOf(tombs) +
      mapJsonOf(map) + vsetJsonOf(addVsets) + posdJsonOf(posd) +
      rowsJsonOf(addRows) + "}"
  }

  /** CAS-publish one rendered manifest; loud conflict on a lost race;
    * head pointer updated on the win.
    */
  private def publishOrConflict(f: FileSystem, table: String, v: Int,
                                json: String): Unit = {
    val mp = manifestPath(table, v)
    f.mkdirs(mp.getParent)
    if (!committerFor(f).publish(f, mp, json,
        java.util.UUID.randomUUID().toString.take(8)))
      sys.error(s"TxTable: commit conflict — version $v at $table was " +
        "published by another writer; re-read and retry")
    writeHeadHint(f, table, v)
  }

  /** Diagnostic counter of manifest-directory enumerations — the spec
    * instrument proving head discovery stays O(1) on the hot path
    * (every `read()` / CDC poll): after the head hint exists, reads
    * must not bump this.
    */
  @volatile private[graft] var manifestListings: Long = 0L

  /** Versions whose manifest still exists (contiguous from 1 until
    * `expireVersions` trims the head of history). Sorted ascending.
    *
    * A DIRECTORY LISTING — maintenance/history surface only (history,
    * readAsOf, txn rescans, vacuum/expire). The hot path
    * ([[currentVersion]]) resolves the head in O(1) via the published
    * head pointer and falls back here only when the pointer is missing
    * or torn.
    */
  def liveVersions(spark: SparkSession, table: String): Seq[Int] = {
    val dir = new Path(s"$table/_manifests")
    val f = fs(spark, table)
    if (!f.exists(dir)) Seq.empty
    else {
      manifestListings += 1
      f.listStatus(dir).map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
          n.stripPrefix("v").stripSuffix(".json").toInt }
        .sorted.toSeq
    }
  }

  /** O(1) head discovery (the Delta `_last_checkpoint` shape): every
    * successful publish writes a best-effort head POINTER at
    * `<table>/_head`; readers start from the hinted version and probe
    * FORWARD with exists() calls (a stale hint — crash between CAS and
    * pointer write, or two pointers racing out of order — costs a few
    * probes, never a wrong answer, because manifests are immutable and
    * versions contiguous at the head). A missing/torn pointer falls
    * back to one directory listing. Without this, every `read()` and
    * every CDC poll pays an O(versions) listing — the first thing that
    * melts at 10⁵ commits.
    */
  private def headPath(table: String) = new Path(s"$table/_head")

  private def readHeadHint(f: FileSystem, table: String): Int =
    try {
      val in = f.open(headPath(table))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => 0 }

  /** Best-effort — a committed publish must NEVER fail over its hint
    * (the probe-forward read heals any staleness).
    */
  private def writeHeadHint(f: FileSystem, table: String, v: Int): Unit =
    try {
      val out = f.create(headPath(table), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Largest committed version, or 0 if the table doesn't exist yet.
    * O(1 + staleness) via the head pointer; listing only as fallback.
    */
  def currentVersion(spark: SparkSession, table: String): Int = {
    val f = fs(spark, table)
    val hint = readHeadHint(f, table)
    if (hint >= 1 && f.exists(manifestPath(table, hint))) {
      var v = hint
      while (f.exists(manifestPath(table, v + 1))) v += 1
      v
    } else liveVersions(spark, table).foldLeft(0)(math.max)
  }

  /** MANIFEST DELTA-LOG (the Delta actions-log + checkpoint shape):
    * a commit that carries its parent's files forward writes a DELTA
    * manifest — `"base":<parent>`, the files it added/removed, and
    * skipping entries for the ADDED files only — so a 1-file append's
    * manifest bytes are O(delta), independent of the table's file
    * count; every [[CheckpointEvery]]-th version (and every
    * snapshot-replacing commit: overwrite/merge/full-compact/restore)
    * writes the self-contained FULL form, bounding every reader's
    * reconstruction walk. Per-manifest scalar fields (version, op,
    * commit_ms, txn, ms, schema, map) and the tombstone list (bounded
    * by deletes-since-OPTIMIZE, not by file count) render in full in
    * BOTH forms, so their accessors stay single-manifest text parses.
    */
  val CheckpointEvery: Int = 10

  /** One version's RESOLVED file-scale state: the reconstruction
    * target of the delta-log (checkpoint + suffix of deltas).
    */
  private[graft] final case class TxSnapshot(
      files: Seq[String],
      stats: Seq[(String, String, Double, Double)],
      blooms: Seq[(String, String, Int, Int, String)],
      vsets: Seq[(String, String, Seq[String])],
      tombs: Seq[(String, String)],
      posd: Seq[String],
      rows: Seq[(String, Long)] = Nil)

  /** Manifests are immutable once published, so resolved snapshots
    * cache safely; bounded (cleared wholesale past the cap — resolved
    * state rebuilds in ≤ [[CheckpointEvery]] manifest reads). [[drop]]
    * invalidates a table's entries (same path, new content).
    */
  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), TxSnapshot]()

  private def parseFileArray(txt: String, name: String): Seq[String] = {
    val span = arraySpan(txt, name)
    if (span.isEmpty) Seq.empty
    else span.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  private def parseStats(txt: String): Seq[(String, String, Double, Double)] =
    """\{"f":"([^"]*)","c":"([^"]*)","lo":([-0-9.eE]+),"hi":([-0-9.eE]+)\}""".r
      .findAllMatchIn(arraySpan(txt, "stats"))
      .map(m => (m.group(1), m.group(2), m.group(3).toDouble, m.group(4).toDouble))
      .toSeq

  private def parseBlooms(txt: String): Seq[(String, String, Int, Int, String)] =
    """\{"f":"([^"]*)","c":"([^"]*)","m":(\d+),"k":(\d+),"b":"([^"]*)"\}""".r
      .findAllMatchIn(arraySpan(txt, "bloom"))
      .map(m => (m.group(1), m.group(2), m.group(3).toInt, m.group(4).toInt,
        m.group(5))).toSeq

  private def parseVsets(txt: String): Seq[(String, String, Seq[String])] =
    """\{"f":"([^"]*)","c":"([^"]*)","v":"((?:[^"\\]|\\.)*)"\}""".r
      .findAllMatchIn(arraySpan(txt, "vset"))
      .map(m => (m.group(1), m.group(2),
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          junesc(m.group(3)).split('\u001f').map(vsepUnesc)): Seq[String])).toSeq

  private def parseTombs(txt: String): Seq[(String, String)] =
    """\{"f":"([^"]*)","k":"([^"]*)"\}""".r
      .findAllMatchIn(arraySpan(txt, "tomb"))
      .map(m => (m.group(1), m.group(2))).toSeq

  private def parseRows(txt: String): Seq[(String, Long)] =
    """\{"f":"([^"]*)","n":(\d+)\}""".r
      .findAllMatchIn(arraySpan(txt, "rows"))
      .map(m => (m.group(1), m.group(2).toLong)).toSeq

  private def parsePosd(txt: String): Seq[String] =
    """\{"f":"([^"]*)"\}""".r
      .findAllMatchIn(arraySpan(txt, "posd"))
      .map(_.group(1)).toSeq

  private def deltaBaseOf(txt: String): Option[Int] =
    "\"base\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)

  /** Resolve version `v`'s file-scale snapshot state: a full manifest
    * parses directly; a delta manifest applies (add, rm, added
    * skipping entries) over its parent's resolved state — entries for
    * removed files drop automatically, the tombstone list is this
    * manifest's own full render. Recursion depth ≤ [[CheckpointEvery]]
    * by the checkpoint cadence; resolved parents cache, so a poll loop
    * pays one small manifest read per new commit.
    */
  private[graft] def snapshotOf(spark: SparkSession, table: String,
                                v: Int): TxSnapshot = {
    require(v >= 1, s"versions start at 1, got $v")
    val key = (table, v)
    val hit = snapCache.get(key)
    if (hit != null) return hit
    val p = manifestPath(table, v)
    require(fs(spark, table).exists(p), s"TxTable: no version $v at $table")
    val txt = manifestText(spark, table, v)
    val snap = deltaBaseOf(txt) match {
      case None =>
        require(txt.contains("\"files\":["), s"TxTable: malformed manifest $p")
        TxSnapshot(parseFileArray(txt, "files"), parseStats(txt),
          parseBlooms(txt), parseVsets(txt), parseTombs(txt), parsePosd(txt),
          parseRows(txt))
      case Some(b) =>
        val parent = snapshotOf(spark, table, b)
        val rm = parseFileArray(txt, "rm").toSet
        TxSnapshot(
          parent.files.filterNot(rm) ++ parseFileArray(txt, "add"),
          parent.stats.filterNot(e => rm(e._1)) ++ parseStats(txt),
          parent.blooms.filterNot(e => rm(e._1)) ++ parseBlooms(txt),
          parent.vsets.filterNot(e => rm(e._1)) ++ parseVsets(txt),
          parseTombs(txt), parsePosd(txt),
          parent.rows.filterNot(e => rm(e._1)) ++ parseRows(txt))
    }
    if (snapCache.size > 512) snapCache.clear()
    snapCache.put(key, snap)
    snap
  }

  /** Data files of version `v`, as resolved from its manifest chain
    * (relative to the table root). Manifest format is engine-owned and
    * flat, so the parse is a plain split — no JSON library dependency.
    */
  def filesOf(spark: SparkSession, table: String, v: Int): Seq[String] =
    snapshotOf(spark, table, v).files

  /** Commit `df` as the next version. `op = "append"` carries the
    * previous version's files forward plus the new ones; `op =
    * "overwrite"` starts the file list fresh (old files stay on disk
    * for time travel until vacuumed). Returns the committed version.
    *
    * Concurrency: the manifest publish is a CAS. A PURE APPEND that
    * loses the race REBASES automatically — it has no read-set, so
    * landing after the competitor is semantically identical to landing
    * before; the staged data files are renamed to the new target (a
    * metadata op, no data rewrite) and the CAS retried against the new
    * head (the Delta conflict-resolution rule for AddFile-only
    * commits). Concurrent ingestion — N appenders — therefore all
    * land, each at its own version. Every other op (overwrite /
    * delete / evolve / merge) FAILS LOUDLY with the competing version
    * named: their output depends on the snapshot they read, so a
    * rebase must recompute (see [[mergeInto]]'s re-merge loop).
    */
  def commit(df: DataFrame, table: String, op: String = "append",
             statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
             maxAttempts: Int = 20, setCols: Seq[String] = Nil,
             partitionBy: Option[String] = None,
             countRows: Boolean = false,
             nullCols: Seq[String] = Nil): Int =
    commitAs(df, table, currentVersion(df.sparkSession, table) + 1, op, statsCols,
      bloomCols = bloomCols, rebaseAppend = op == "append",
      maxAttempts = maxAttempts, setCols = setCols, partitionBy = partitionBy,
      countRows = countRows, nullCols = nullCols)

  /** Bloom-index geometry (recorded per manifest entry so it can evolve
    * without breaking old tables): m bits / k hashes give ~1% FP at
    * ~400 distinct keys per file-column; the hash family is the
    * engine-portable md5-affine one, so the oracle (or any auditor)
    * recomputes every filter from the data alone.
    */
  val BloomM: Int = 4096
  val BloomK: Int = 3

  /** The version-pinned commit body — the race window lives between
    * the head read and the manifest create, so tests (and a future
    * retry loop) drive this directly with a chosen target version.
    */
  /** Normalized (name, type) schema fingerprint: order- and
    * nullability-insensitive (parquet resolves columns by name; a
    * reordered append round-trips losslessly), type-strict.
    */
  private def schemaKey(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
    s.fields.map(fd => (fd.name, fd.dataType.sql)).sortBy(_._1).toSeq

  private[graft] def commitAs(df: DataFrame, table: String, v: Int, op: String,
                              statsCols: Seq[String] = Nil,
                              carryFiles: Option[Seq[String]] = None,
                              txn: Option[(String, Long)] = None,
                              bloomCols: Seq[String] = Nil,
                              rebaseAppend: Boolean = false,
                              maxAttempts: Int = 5,
                              dfIsPhysical: Boolean = false,
                              setCols: Seq[String] = Nil,
                              partitionBy: Option[String] = None,
                              preNamed: Option[Seq[String]] = None,
                              countRows: Boolean = false,
                              nullCols: Seq[String] = Nil): Int = {
    require(op == "append" || op == "overwrite" || op == "compact" ||
      op == "delete" || op == "update" || op == "evolve" || op == "merge",
      s"unknown op $op")
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    val spark = df.sparkSession
    val f = fs(spark, table)
    // COLUMN MAPPING: ops that write ALONGSIDE the parent's files
    // (append/evolve, and the carry-file rewrites: copy-on-write
    // delete, incremental compaction) must store data under the
    // parent's PHYSICAL names — rename is metadata-only precisely
    // because physical names never change once a file is written.
    // Snapshot-REPLACING ops (overwrite / merge / full compact) reset
    // the mapping: their fresh files use logical names physically.
    val mapped = v > 1 && (op == "append" || op == "evolve" || carryFiles.isDefined)
    val parentMap: Option[Seq[(String, String)]] =
      if (mapped) colMapOf(spark, table, v - 1) else None
    val writeMap: Option[Seq[(String, String)]] =
      if (op == "evolve")
        // evolution under a mapping: new columns enter with physical =
        // logical (no file has written them under any other name)
        parentMap.map(m => m ++ df.schema.fieldNames
          .filterNot(n => m.exists(_._1 == n)).map(n => (n, n)))
      else parentMap
    // APPEND SCHEMA GATE: an append commit carries the parent's files
    // forward — an incompatible append would commit a snapshot that
    // silently reads with whichever footer is sampled (late-added
    // columns can vanish without an error). Refuse LOUDLY before any
    // distributed work. LOGICAL schemas compare: the manifest records
    // the snapshot's logical schema on every commit (O(1), no footer
    // IO); the footer fallback covers only pre-schema manifests.
    def appendGate(parentV: Int): Unit = if (op == "append" && parentV >= 1) {
      val parentSchema: Option[StructType] =
        manifestSchema(spark, table, parentV).orElse {
          val parentFiles = filesOf(spark, table, parentV)
          if (parentFiles.isEmpty) None
          else Some {
            if (msOf(spark, table, parentV))
              spark.read.option("mergeSchema", "true")
                .parquet(parentFiles.map(rel => dataPath(table, rel)): _*).schema
            else graft.core.ParquetFooters.schemaOf(spark, dataPath(table, parentFiles.head))
          }
        }
      parentSchema.foreach { parent =>
        require(schemaKey(parent) == schemaKey(df.schema),
          s"TxTable: append schema mismatch at $table v${parentV + 1} — parent snapshot has " +
          s"${schemaKey(parent).map(p => p._1 + ":" + p._2).mkString("[", ", ", "]")} but the " +
          s"appended frame has ${schemaKey(df.schema).map(p => p._1 + ":" + p._2).mkString("[", ", ", "]")}; " +
          "schema changes require commitEvolve (additive), renameColumn/dropColumn " +
          "(metadata-only), or op=\"overwrite\"")
      }
      ()
    }
    if (v > 1) appendGate(v - 1)
    // LOGICAL→PHYSICAL translation for the write (identity for
    // unmapped tables; skipped for frames already read raw from the
    // parent's files — CoW delete survivors, compaction rebins)
    val physDf = writeMap match {
      case Some(m) if !dfIsPhysical =>
        df.select(m.map { case (n, p) => col(n).as(p) }: _*)
      case _ => df
    }
    // the manifest records the LOGICAL snapshot schema — hidden layout
    // columns (path-derived, [[hiddenSpecOf]]) never enter it
    val logicalSchema0: StructType = StructType((writeMap match {
      case Some(m) if dfIsPhysical =>
        StructType(m.map { case (n, p) => df.schema(p).copy(name = n) })
      case _ => df.schema
    }).fields.filterNot(f => hiddenSpecOf(f.name).isDefined))
    // a carrying commit records the PARENT's field order (parquet
    // resolves by name, so order is representational — but physical
    // rewrites read through the hive layout surface the partition
    // column last, and the recorded schema must not drift with them);
    // columns new to this commit (evolve) append at the end
    val logicalSchema: StructType =
      if (!(carryFiles.isDefined || ((op == "append" || op == "evolve") && v > 1))
          || v <= 1) logicalSchema0
      else manifestSchema(spark, table, v - 1).map { ps =>
        StructType(
          ps.fieldNames.toSeq.flatMap(n => logicalSchema0.fields.find(_.name == n)) ++
          logicalSchema0.fields.filterNot(f => ps.fieldNames.contains(f.name)))
      }.getOrElse(logicalSchema0)
    val physStatsCols = statsCols.map(c => physOf(writeMap, c))
    val physBloomCols = bloomCols.map(c => physOf(writeMap, c))
    val physSetCols = setCols.map(c => physOf(writeMap, c))
    // null counts ride the stats array under '<col>#nulls' — '#' in a
    // tracked name would collide with that namespace
    require((physStatsCols ++ nullCols).forall(!_.contains("#")),
      "TxTable: statsCols/nullCols names may not contain '#'")
    val physNullCols = nullCols.map(c => physOf(writeMap, c))
    // PARTITIONED LAYOUT (the hive data/<col>=<val>/ shape): a commit
    // carrying parent files INHERITS the parent's partition column —
    // mixing partitioned and flat files under one basePath read is
    // unreadable, so a carrying commit may never change the layout
    // (an overwrite/merge/full-compact may, like the column mapping).
    val carrying = carryFiles.isDefined ||
      ((op == "append" || op == "evolve") && v > 1)
    val parentPart: Option[String] =
      if (carrying && v > 1) partColOf(spark, table, v - 1) else None
    val physPart: Option[String] =
      partitionBy.map(c => physOf(writeMap, c)).orElse(parentPart)
    if (carrying && v > 1) require(physPart == parentPart,
      s"TxTable: partition layout mismatch at $table v$v — parent layout is " +
      s"${parentPart.fold("unpartitioned")(c => s"partitioned by '$c'")} but this " +
      s"commit asked for ${physPart.fold("unpartitioned")(c => s"'$c'")}; layout " +
      "changes require op=\"overwrite\" (or a full compact)")
    physPart.foreach { pc =>
      require(!(physStatsCols ++ physBloomCols ++ physSetCols).contains(pc),
        s"TxTable: column '$pc' is the partition column — its value is in the " +
        "file path and partition pruning is already exact; drop it from " +
        "statsCols/bloomCols/setCols")
    }
    // distributed data write to a WRITER-UNIQUE scratch dir (two
    // writers racing to the same version must not clobber each
    // other's in-flight part files — the nonce that de-collides the
    // final names has to cover the scratch too), then versioned
    // names — the move is a metadata op on HDFS-likes
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$table/_tmp_v${v}_$nonce")
    // hidden layout: frames arriving WITHOUT the transform column
    // (user appends, full compact, merge results — all logical) derive
    // it here; raw rewrite frames already carry it from the path
    val physDfW = physPart match {
      case Some(pc) if hiddenSpecOf(pc).isDefined && !physDf.columns.contains(pc) =>
        physDf.withColumn(pc, hiddenColOf(pc))
      case _ => physDf
    }
    // WAP publish path: the data files were already written at stage
    // time ([[stageWap]]) — skip the distributed write and adopt them;
    // stats/blooms/vsets below recompute from their footers/contents,
    // and a rebase re-keys them to versioned names like any append.
    var named: Seq[String] = preNamed.getOrElse {
      physPart match {
        case Some(pc) => physDfW.write.mode("overwrite").partitionBy(pc)
          .parquet(tmp.toString)
        case None => physDfW.write.mode("overwrite").parquet(tmp.toString)
      }
      // partitioned writes nest part files one level down
      // (<col>=<val>/part-*); the versioned rename preserves the
      // partition directory so the manifest path IS the partition value
      val parts: Seq[(Path, String)] =
        if (physPart.isEmpty)
          f.listStatus(tmp).map(_.getPath)
            .filter(_.getName.startsWith("part-")).sortBy(_.getName)
            .map(p => (p, "data")).toSeq
        else
          f.listStatus(tmp).filter(_.isDirectory)
            .flatMap(d => f.listStatus(d.getPath).map(_.getPath)
              .filter(_.getName.startsWith("part-"))
              .map(p => (p, s"data/${d.getPath.getName}")))
            .sortBy { case (p, d) => (d, p.getName) }.toSeq
      f.mkdirs(new Path(s"$table/data"))
      val out = parts.zipWithIndex.map { case ((p, dir), i) =>
        val rel = s"$dir/v${v}_${i}_$nonce.parquet"
        f.mkdirs(new Path(s"$table/$dir"))
        require(f.rename(p, new Path(s"$table/$rel")), s"rename failed for $p")
        rel
      }.toSeq
      f.delete(tmp, true)
      out
    }
    // DATA-SKIPPING STATS (the Delta data-skipping shape: per-file
    // min/max recorded in the transaction log at commit time, so a
    // range read prunes FILES from the manifest alone — no footer
    // round-trips on the read path, which at 100 TB is millions of
    // them). Extracted here from the just-written parquet FOOTERS
    // (metadata-only reads, one per new file, driver-side like the
    // renames); numeric columns only — a min/max on floor-truncated
    // binary stats would prune wrongly. Append carries the parent's
    // stats forward with its files; files without stats are always
    // kept by the pruner (conservative by construction). Keyed by
    // INDEX into `named` so an append rebase re-keys by rename.
    val newStats: Seq[(Int, String, Double, Double)] =
      if (physStatsCols.isEmpty && physNullCols.isEmpty) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        val conf = spark.sparkContext.hadoopConfiguration
        named.zipWithIndex.flatMap { case (rel, idx) =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(s"$table/$rel"), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val blocks = r.getFooter.getBlocks.asScala.toSeq
            physStatsCols.flatMap { c =>
              val perBlock = blocks.map { b =>
                b.getColumns.asScala.find(_.getPath.toDotString == c)
                  .map(_.getStatistics)
                  .filter(s => s != null && s.hasNonNullValue)
                  .flatMap { s =>
                    (s.genericGetMin, s.genericGetMax) match {
                      case (lo: Number, hi: Number) =>
                        // BIGINT beyond 2^53 can round INWARD in the
                        // double convert (recorded lo above the true
                        // min), turning the documented-conservative
                        // pruner into a silent row loss — widen such
                        // stats OUTWARD one ulp so pruning stays safe
                        def safe(n: Number, up: Boolean): Double = {
                          val d = n.doubleValue()
                          n match {
                            case l: java.lang.Long
                              if l.longValue > (1L << 53) || l.longValue < -(1L << 53) =>
                              if (up) Math.nextUp(d) else Math.nextDown(d)
                            case _ => d
                          }
                        }
                        Some((safe(lo, up = false), safe(hi, up = true)))
                      case _ => None // non-numeric: no skipping stats
                    }
                  }
              }
              if (perBlock.nonEmpty && perBlock.forall(_.isDefined))
                Some((idx, c, perBlock.map(_.get._1).min, perBlock.map(_.get._2).max))
              else None
            } ++
            // NULL-COUNT entries (Delta's nullCount data-skipping
            // shape, works for ANY column type): the footer records
            // numNulls per block; a missing/-unknown count on any
            // block records nothing (kept conservatively). Riding the
            // stats array under '<col>#nulls' means the entries
            // carry/rebase/clone/restore/fast-forward with their
            // files through the machinery stats already have.
            physNullCols.flatMap { c =>
              val perBlock = blocks.map { b =>
                b.getColumns.asScala.find(_.getPath.toDotString == c)
                  .map(_.getStatistics)
                  .collect { case st if st != null && st.isNumNullsSet &&
                      st.getNumNulls >= 0 => st.getNumNulls }
              }
              if (perBlock.nonEmpty && perBlock.forall(_.isDefined)) {
                val n = perBlock.map(_.get).sum.toDouble
                Some((idx, c + "#nulls", n, n))
              } else None
            }
          } finally r.close()
        }
      }
    // PER-FILE BLOOM INDEX (the Delta bloom-filter-index shape): the
    // point-lookup complement of the min/max stats — on a column the
    // layout does NOT cluster (high-cardinality ids), every file's
    // [min,max] spans the domain and range pruning keeps everything;
    // a per-file bloom over the md5-affine portable family prunes by
    // MEMBERSHIP instead (no false negatives — a key's file is always
    // kept; false positives only cost extra reads). The build is ONE
    // distributed pass over the newly-written files only (the standard
    // index-build cost); blooms carry forward with their files like
    // stats. The bitset AGGREGATES EXECUTOR-SIDE — collect_set of bit
    // positions per file, partial-agg'd map-side — so the driver
    // receives newFiles rows (each ≤ m distinct bits), never
    // newFiles × m exploded rows: a 10⁵-file backfill commit collects
    // 10⁵ rows, the same scale class as the manifest's own file list.
    // Index-keyed like stats.
    val newBloom: Seq[(Int, String, Int, Int, String)] =
      if (physBloomCols.isEmpty || named.isEmpty) Seq.empty
      else {
        val idxOf = named.zipWithIndex.map { case (rel, i) =>
          rel.stripPrefix("data/") -> i }.toMap
        val paths = named.map(rel => s"$table/$rel")
        val pathsSchema = graft.core.ParquetFooters.schemaOf(spark, paths.head)
        physBloomCols.flatMap { c =>
          val base = spark.read.schema(pathsSchema).parquet(paths: _*)
            .select(input_file_name().as("_f"), col(c).cast("string").as("_v"))
            .filter(col("_v").isNotNull)
          val h = graft.functions.Hashing.portableHash(col("_v"))
          val bits = (0 until BloomK).map(j =>
            pmod(graft.functions.Hashing.affine(j, h), lit(BloomM.toLong)))
          base.select(col("_f"), explode(array(bits: _*)).as("_b"))
            .groupBy(col("_f")).agg(collect_set(col("_b")).as("_bits"))
            .collect()
            .map { r =>
              val bytes = new Array[Byte](BloomM / 8)
              r.getSeq[Long](1).foreach { bl =>
                val b = bl.toInt
                bytes(b >> 3) = (bytes(b >> 3) | (1 << (b & 7))).toByte
              }
              val fp = r.getString(0)
              val name = fp.substring(fp.lastIndexOf('/') + 1)
              (idxOf(name), c, BloomM, BloomK,
                java.util.Base64.getEncoder.encodeToString(bytes))
            }.toSeq
        }
      }
    // PER-FILE VALUE SETS (categorical file skipping): one distributed
    // distinct pass over the new files per declared column, bounded
    // collect (≤ nfiles × VsetMaxValues rows) — same scale class as
    // the bloom build. Files exceeding the cap record nothing (kept
    // conservatively); a value-clustered layout keeps sets tiny.
    val newVsets: Seq[(Int, String, Seq[String])] =
      if (physSetCols.isEmpty || named.isEmpty) Seq.empty
      else {
        val idxOf = named.zipWithIndex.map { case (rel, i) =>
          rel.stripPrefix("data/") -> i }.toMap
        val paths = named.map(rel => s"$table/$rel")
        val pathsSchema = graft.core.ParquetFooters.schemaOf(spark, paths.head)
        physSetCols.flatMap { c =>
          spark.read.schema(pathsSchema).parquet(paths: _*)
            .select(input_file_name().as("_f"), col(c).cast("string").as("_v"))
            .filter(col("_v").isNotNull).distinct().collect()
            .groupBy(_.getString(0)).toSeq.flatMap { case (fp, rows) =>
              val vs = rows.map(_.getString(1)).toSeq.sorted
              if (vs.isEmpty || vs.size > VsetMaxValues) None
              else Some((idxOf(fp.substring(fp.lastIndexOf('/') + 1)), c, vs))
            }
        }
      }
    // PER-FILE ROW COUNTS (Delta's numRecords): read from the
    // just-written footers like the skipping stats — metadata-only,
    // one footer per NEW file, driver-side. Carried files keep their
    // parent-recorded counts; [[metaCount]] then answers COUNT(*)
    // from the manifest alone. Index-keyed like stats.
    val newRows: Seq[(Int, Long)] =
      if (!countRows || named.isEmpty) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        val conf = spark.sparkContext.hadoopConfiguration
        named.zipWithIndex.map { case (rel, idx) =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(s"$table/$rel"), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try (idx, r.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
          finally r.close()
        }
      }
    val txnJson = txn.map { case (app, batch) =>
      s""","txn":{"app":"$app","batch":$batch}""" }.getOrElse("")
    // THE PUBLISH LOOP. Attempt 1 targets `v`; a pure append losing the
    // CAS rebases — re-reads the head, re-runs the schema gate against
    // the new parent, renames the staged files to the new target (a
    // driver-side metadata op; the distributed write is NOT redone —
    // the Delta rule: an AddFile-only commit is conflict-free), and
    // publishes again. Everything parent-derived (carried files/stats/
    // blooms/tombs, the ms flag, the monotonic timestamp) recomputes
    // per attempt.
    var target = v
    var attempt = 0
    var out = -1
    while (out < 0) {
      attempt += 1
      val parentFiles = if (target > 1) filesOf(spark, table, target - 1)
        else Seq.empty[String]
      // carryFiles overrides the default carry rule: a copy-on-write
      // op (delete) carries exactly the UNTOUCHED subset of the
      // parent's files — the caller decided which from manifest stats.
      val carried = carryFiles.getOrElse(
        if ((op == "append" || op == "evolve") && target > 1) parentFiles
        else Seq.empty)
      // schema-evolution flag: sticky from the first evolve commit on
      // (every later snapshot mixes footers, so every later read needs
      // mergeSchema), reset by an overwrite/compact (fresh uniform files)
      val evolved = op == "evolve" ||
        (carried.nonEmpty && target > 1 && msOf(spark, table, target - 1))
      // commit time, STRICTLY MONOTONIC over the parent (Delta's
      // timestamp-as-of contract: two commits landing in the same wall
      // millisecond must still resolve distinctly — max(now, parent+1))
      // Only the EXPECTED miss (parent manifest expired by
      // expireVersions) resets the baseline to epoch; anything else —
      // OOM, interrupts, a corrupt manifest — must propagate, not
      // silently zero the monotonicity floor.
      val parentMs = if (target > 1)
        try commitMsOf(spark, table, target - 1)
        catch { case _: java.io.FileNotFoundException => 0L }
      else 0L
      val ts = math.max(System.currentTimeMillis(), parentMs + 1L)
      val all = carried ++ named
      // DELTA vs CHECKPOINT: a snapshot-replacing commit (no carried
      // files) is its own natural checkpoint; a carrying commit writes
      // the full form only at the CheckpointEvery cadence and the
      // O(delta) form otherwise — a 1-file append to a 10⁶-file table
      // writes kilobytes, not the file list.
      val isCkpt = carried.isEmpty || target % CheckpointEvery == 0
      val json = if (isCkpt) {
        val carriedStats = if (carried.nonEmpty && target > 1)
          statsOf(spark, table, target - 1).filter(s => carried.contains(s._1))
        else Seq.empty
        val carriedBloom = if (carried.nonEmpty && target > 1)
          bloomEntries(spark, table, target - 1).filter(b => carried.contains(b._1))
        else Seq.empty
        val carriedVsets = if (carried.nonEmpty && target > 1)
          valueSetsOf(spark, table, target - 1).filter(s => carried.contains(s._1))
        else Seq.empty
        // merge-on-read tombstones ride their files: any commit
        // carrying parent files keeps the parent's tombs (they
        // reference carried file names); snapshot-replacing commits
        // shed them (the rewrite read them through readVersion /
        // tombFilter)
        val carriedTombs = if (carried.nonEmpty && target > 1)
          tombEntriesOf(spark, table, target - 1) else Seq.empty
        val carriedPosd = if (carried.nonEmpty && target > 1)
          posDeletesOf(spark, table, target - 1) else Seq.empty[String]
        val carriedRows = if (carried.nonEmpty && target > 1)
          rowCountsOf(spark, table, target - 1).filter(r => carried.contains(r._1))
        else Seq.empty
        renderManifest(target, op, ts, txnJson, evolved,
          Some(logicalSchema.toDDL), all,
          carriedStats ++ newStats.map { case (i, c, lo, hi) => (named(i), c, lo, hi) },
          carriedBloom ++ newBloom.map { case (i, c, m, k, b) => (named(i), c, m, k, b) },
          carriedTombs, writeMap,
          carriedVsets ++ newVsets.map { case (i, c, vs) => (named(i), c, vs) },
          physPart, carriedPosd,
          carriedRows ++ newRows.map { case (i, n) => (named(i), n) })
      } else {
        renderDeltaManifest(target, op, ts, txnJson, evolved,
          Some(logicalSchema.toDDL), target - 1, all.size,
          named, parentFiles.filterNot(carried.toSet),
          newStats.map { case (i, c, lo, hi) => (named(i), c, lo, hi) },
          newBloom.map { case (i, c, m, k, b) => (named(i), c, m, k, b) },
          tombEntriesOf(spark, table, target - 1), writeMap,
          newVsets.map { case (i, c, vs) => (named(i), c, vs) },
          physPart, posDeletesOf(spark, table, target - 1),
          newRows.map { case (i, n) => (named(i), n) })
      }
      val mp = manifestPath(table, target)
      f.mkdirs(mp.getParent)
      if (committerFor(f).publish(f, mp, json, nonce)) {
        writeHeadHint(f, table, target)
        out = target
      } else if (!(rebaseAppend && op == "append" && attempt < maxAttempts)) {
        sys.error(s"TxTable: commit conflict — version $target at $table was " +
          "published by another writer; re-read and retry")
      } else {
        val newTarget = currentVersion(spark, table) + 1
        // a concurrent rename/drop changed the column mapping under
        // us: the staged files carry stale physical names — refuse
        require(colMapOf(spark, table, newTarget - 1) == parentMap,
          s"TxTable: commit conflict at $table — a concurrent writer changed the " +
          "column mapping; the staged append carries stale physical names (retry)")
        appendGate(newTarget - 1)
        // a concurrent layout change under the staged files — refuse
        require(partColOf(spark, table, newTarget - 1) == parentPart,
          s"TxTable: commit conflict at $table — a concurrent writer changed the " +
          "partition layout; the staged append carries the old layout (retry)")
        if (newTarget != target) {
          named = named.zipWithIndex.map { case (rel, i) =>
            val dir = rel.substring(0, rel.lastIndexOf('/')) // keeps <col>=<val>
            val nrel = s"$dir/v${newTarget}_${i}_$nonce.parquet"
            require(f.rename(new Path(s"$table/$rel"), new Path(s"$table/$nrel")),
              s"TxTable: rebase rename failed for $rel")
            nrel
          }
          target = newTarget
        }
      }
    }
    out
  }

  /** Snapshot read of version `v` — exactly its manifest's files, as
    * an explicit path list (no directory listing, no extra files),
    * through the snapshot semantics: mergeSchema for evolved
    * snapshots, merge-on-read tombstone anti-join, logical projection
    * under a column mapping.
    */
  def readVersion(spark: SparkSession, table: String, v: Int): DataFrame = {
    val files = filesOf(spark, table, v)
    if (files.isEmpty) {
      // a legitimate empty snapshot (e.g. a delete-all) reads as an
      // empty frame with the schema the manifest recorded at commit
      // time (the Delta empty-snapshot semantics); only a pre-schema
      // manifest with no files is unreadable and refuses loudly
      val st = manifestSchema(spark, table, v).getOrElse(
        sys.error(s"TxTable: version $v of $table is empty and its manifest " +
          "records no schema (pre-schema manifest)"))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    }
    snapshotRead(spark, table, v, files)
  }

  /** Latest-snapshot read. */
  def read(spark: SparkSession, table: String): DataFrame =
    readVersion(spark, table, currentVersion(spark, table))

  /** The bracketed span of a top-level manifest array ("stats" /
    * "bloom" / "tomb"). Each entry grammar parses ONLY its own span:
    * with both stats and bloom present, an unscoped non-greedy match
    * starting in one array can swallow text into the other (the first
    * file's bloom silently lost, garbage re-rendered into every
    * carried manifest). Entry values never contain brackets (file
    * names, column identifiers, base64), so the first ']' closes the
    * array.
    */
  private def arraySpan(txt: String, name: String): String =
    ("\"" + name + "\":\\[(.*?)\\]").r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")

  /** Per-file data-skipping stats of version `v`'s snapshot: (file,
    * column, min, max), resolved through the delta-log. Empty for
    * commits made without `statsCols`.
    */
  def statsOf(spark: SparkSession, table: String, v: Int): Seq[(String, String, Double, Double)] =
    snapshotOf(spark, table, v).stats

  /** The file subset of version `v` a range predicate `lo ≤ col ≤ hi`
    * can touch, decided from the MANIFEST STATS ALONE (no footer
    * reads): a file is skipped only when its recorded [min, max] is
    * disjoint from [lo, hi]; files without stats for `col` are always
    * kept (conservative).
    */
  def prunedFiles(spark: SparkSession, table: String, v: Int,
                  colName: String, lo: Double, hi: Double): Seq[String] = {
    val phys = physOf(colMapOf(spark, table, v), colName)
    val byFile = statsOf(spark, table, v)
      .collect { case (fl, c, flo, fhi) if c == phys => fl -> (flo, fhi) }
      .toMap
    filesOf(spark, table, v).filter { fl =>
      byFile.get(fl).forall { case (flo, fhi) => !(fhi < lo || flo > hi) }
    }
  }

  /** Range read with manifest-level data skipping: reads ONLY the
    * files [[prunedFiles]] keeps, then applies the row filter. With a
    * range-clustered layout (repartitionByRange / z-order before
    * commit) this is the Delta data-skipping read: planning and IO
    * scale with the MATCHING file count, not the snapshot. Falls back
    * to the full file list when no file survives pruning is impossible
    * — an empty keep-set still reads one manifest file to preserve the
    * snapshot's schema (row-group stats prune its pages anyway).
    */
  def readWhere(spark: SparkSession, table: String, colName: String,
                lo: Double, hi: Double, version: Int = -1): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, table)
    val allFiles = filesOf(spark, table, v)
    if (allFiles.isEmpty) // empty snapshot: schema-preserving empty read
      return readVersion(spark, table, v)
        .filter(col(colName) >= lo && col(colName) <= hi)
    val kept = prunedFiles(spark, table, v, colName, lo, hi)
    val paths = if (kept.nonEmpty) kept else allFiles.take(1)
    snapshotRead(spark, table, v, paths)
      .filter(col(colName) >= lo && col(colName) <= hi)
  }

  /** Per-file bloom entries of version `v`: (file, column, m, k,
    * base64 bits). m/k ride each entry so the GEOMETRY can evolve —
    * readers derive probe bits from the entry's recorded values, never
    * the current constants (a raised BloomM must not index past an old
    * table's 512-byte bitset, and a lowered one must not silently
    * break the no-false-negative guarantee).
    */
  private[graft] def bloomEntries(spark: SparkSession, table: String,
                                  v: Int): Seq[(String, String, Int, Int, String)] =
    snapshotOf(spark, table, v).blooms

  /** Merge-on-read tombstone sidecars recorded in version `v`'s
    * manifest: (tombstone file, physical key column). Empty for
    * snapshots with no outstanding MoR deletes.
    */
  def tombEntriesOf(spark: SparkSession, table: String, v: Int): Seq[(String, String)] =
    snapshotOf(spark, table, v).tombs

  /** Positional deletion-vector sidecars of version `v`'s snapshot.
    * Empty for snapshots with no outstanding positional deletes.
    */
  def posDeletesOf(spark: SparkSession, table: String, v: Int): Seq[String] =
    snapshotOf(spark, table, v).posd

  /** Per-file value-set skipping entries of version `v`: (file,
    * physical column, distinct values). Empty for commits made without
    * `setCols` and for files exceeding [[VsetMaxValues]].
    */
  def valueSetsOf(spark: SparkSession, table: String,
                  v: Int): Seq[(String, String, Seq[String])] =
    snapshotOf(spark, table, v).vsets

  /** Per-file row counts of version `v`'s snapshot: (file, rows).
    * Present only for files written under `countRows = true` commits
    * (carried forward with their files, like skipping stats).
    */
  def rowCountsOf(spark: SparkSession, table: String, v: Int): Seq[(String, Long)] =
    snapshotOf(spark, table, v).rows

  /** METADATA-ONLY `COUNT(*)` (the Delta/Iceberg log-answered count):
    * sum of the manifest-recorded per-file row counts minus the
    * outstanding positional-deletion-vector pairs (each pair is
    * EXACTLY one row, so the adjustment is exact). ZERO data-file IO —
    * on a 10⁶-file table this is a manifest read, not a 100 TB scan.
    *
    * Refuses LOUDLY (rather than degrade to a scan silently) when the
    * count is underivable: a file without a recorded count (its commit
    * ran with `countRows = false`), or outstanding KEY-form tombstones
    * (one key may match any number of rows — only OPTIMIZE/compaction
    * folds them away). Callers fall back to `read(...).count()`.
    */
  def metaCount(spark: SparkSession, table: String, version: Int = -1): Long = {
    val v = if (version > 0) version else currentVersion(spark, table)
    metaFileCounts(spark, table, v).map(_._2).sum
  }

  /** [[metaCount]] grouped by partition value for a hive-partitioned
    * layout — `SELECT part, COUNT(*) GROUP BY part` answered from the
    * manifest alone (the partition value is IN the file path). Same
    * refusal rules as [[metaCount]].
    */
  def metaCountByPartition(spark: SparkSession, table: String,
                           version: Int = -1): Seq[(String, Long)] = {
    val v = if (version > 0) version else currentVersion(spark, table)
    val pc = partColOf(spark, table, v).getOrElse(
      sys.error(s"TxTable: $table v$v has no partitioned layout"))
    val prefix = s"data/${pc}="
    def valOf(rel: String): String = {
      val dir = rel.substring(0, rel.lastIndexOf('/'))
      require(dir.startsWith(prefix),
        s"TxTable: file $rel is outside the $pc= partition layout")
      dir.substring(prefix.length)
    }
    metaFileCounts(spark, table, v)
      .groupBy { case (rel, _) => valOf(rel) }
      .map { case (pv, fs) => (pv, fs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
  }

  /** Shared derivation of (file, live rows) from the manifest: recorded
    * count per file minus its deletion-vector pairs. One tiny parquet
    * read over the posd SIDECARS only (they are pair-sized, never
    * data-sized) when vectors are outstanding; zero reads otherwise.
    */
  private def metaFileCounts(spark: SparkSession, table: String,
                             v: Int): Seq[(String, Long)] = {
    val tombs = tombEntriesOf(spark, table, v)
    require(tombs.isEmpty,
      s"TxTable: $table v$v has ${tombs.size} outstanding key-form tombstone " +
      "sidecar(s) — a key may match any number of rows, so the metadata count " +
      "is underivable; OPTIMIZE (compact) folds them away, or count by scan")
    val files = filesOf(spark, table, v)
    val counts = rowCountsOf(spark, table, v).toMap
    val missing = files.filterNot(counts.contains)
    require(missing.isEmpty,
      s"TxTable: ${missing.size} of ${files.size} files at $table v$v have no " +
      s"recorded row count (first: ${missing.headOption.getOrElse("")}) — " +
      "commit with countRows = true to record them; falling back to a scan " +
      "is the caller's call, not a silent default")
    val posd = posDeletesOf(spark, table, v)
    val deleted: Map[String, Long] =
      if (posd.isEmpty) Map.empty
      else {
        val posPaths = posd.map(rel => dataPath(table, rel))
        spark.read
          .schema(graft.core.ParquetFooters.schemaOf(spark, posPaths.head))
          .parquet(posPaths: _*)
          .groupBy(col("_gf")).agg(count(lit(1)).as("_n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    files.map { rel =>
      val base = rel.substring(rel.lastIndexOf('/') + 1)
      rel -> (counts(rel) - deleted.getOrElse(base, 0L))
    }
  }

  /** The file subset of version `v` an equality probe `col = value`
    * can touch, decided from the manifest VALUE SETS alone: a file is
    * skipped only when its recorded distinct set misses the value —
    * EXACT pruning (no false positives either way) for categorical
    * columns, the manifest-level equivalent of Hive partition pruning
    * without physical partitioning. Files without an entry are always
    * kept (conservative).
    */
  def prunedFilesByValue(spark: SparkSession, table: String, v: Int,
                         colName: String, value: String): Seq[String] = {
    val phys = physOf(colMapOf(spark, table, v), colName)
    val byFile = valueSetsOf(spark, table, v)
      .collect { case (fl, c, vs) if c == phys => fl -> vs.toSet }.toMap
    filesOf(spark, table, v).filter(fl => byFile.get(fl).forall(_.contains(value)))
  }

  /** Categorical point read with value-set file skipping: reads ONLY
    * the files [[prunedFilesByValue]] keeps, then applies the exact
    * equality filter on the string rendering. With a layout clustered
    * on the column (repartition by it before commit) this is partition
    * pruning from the manifest alone — a per-category read touches the
    * category's files, not the snapshot.
    */
  def readWhereValue(spark: SparkSession, table: String, colName: String,
                     value: String, version: Int = -1): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, table)
    val kept = prunedFilesByValue(spark, table, v, colName, value)
    if (kept.isEmpty) // value set proved absence in every file
      return readVersion(spark, table, v).limit(0)
        .filter(col(colName).cast("string") === value)
    snapshotRead(spark, table, v, kept)
      .filter(col(colName).cast("string") === value)
  }

  /** Column mapping of version `v`'s snapshot — (logical, physical)
    * per live column, in schema order. None = identity (no rename/drop
    * ever happened, or a snapshot-replacing op reset it).
    */
  private[graft] def colMapOf(spark: SparkSession, table: String,
                              v: Int): Option[Seq[(String, String)]] = {
    val span = arraySpan(manifestText(spark, table, v), "map")
    if (span.isEmpty) None
    else Some("""\{"n":"((?:[^"\\]|\\.)*)","p":"((?:[^"\\]|\\.)*)"\}""".r
      .findAllMatchIn(span)
      .map(m => (junesc(m.group(1)), junesc(m.group(2)))).toSeq)
  }

  /** Physical name of a logical column under a mapping (identity when
    * unmapped). Data files, skipping stats, blooms, and tombstone keys
    * all live in PHYSICAL names; user-facing arguments are LOGICAL.
    */
  private def physOf(map: Option[Seq[(String, String)]], name: String): String =
    map.flatMap(_.collectFirst { case (n, p) if n == name => p }).getOrElse(name)

  /** The snapshot-semantics read every path shares: tombstone
    * anti-join (merge-on-read deletes, scoped per (file, key) so
    * appends are unaffected), then the logical projection (column
    * mapping). Tombstone sidecars are kilobyte-scale parquet — the
    * planner broadcasts them off file statistics; a table without
    * tombs/mapping pays exactly nothing here.
    */
  private def tombFilter(spark: SparkSession, table: String,
                         tombs: Seq[(String, String)], base: DataFrame): DataFrame =
    if (tombs.isEmpty) base
    else {
      val withF = base.withColumn("_graft_tomb_file",
        element_at(split(col("_metadata.file_path"), "/"), -1))
      tombs.groupBy(_._2).toSeq.sortBy(_._1).foldLeft(withF) {
        case (acc, (k, es)) =>
          val sidePaths = es.map(e => dataPath(table, e._1)).distinct
          val keys = spark.read
            .schema(graft.core.ParquetFooters.schemaOf(spark, sidePaths.head))
            .parquet(sidePaths: _*)
            .select(col("_gf").as("_graft_tf"), col("_gk").as("_graft_tk"))
          acc.join(keys, acc("_graft_tomb_file") === col("_graft_tf") &&
            acc(k) === col("_graft_tk"), "left_anti")
      }.drop("_graft_tomb_file")
    }

  /** PHYSICAL partition column of version `v`'s layout, if the
    * snapshot was committed with `partitionBy` (hive-style
    * `data/<col>=<val>/` directories). Scalar manifest field — a
    * single-manifest text parse, like op/schema/map.
    */
  def partColOf(spark: SparkSession, table: String, v: Int): Option[String] =
    "\"part\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(manifestText(spark, table, v))
      .map(m => junesc(m.group(1)))

  /** The raw per-file reader every physical path shares: mergeSchema
    * for evolved snapshots; for a PARTITIONED layout the hive
    * `basePath` so the partition column re-derives from the directory
    * names, cast back to the manifest schema's recorded type (path
    * inference alone is stringly). No tomb filter, no logical
    * projection — those layer on in [[snapshotRead]].
    */
  private def rawRead(spark: SparkSession, table: String, v: Int,
                      files: Seq[String]): DataFrame = {
    val ms = msOf(spark, table, v)
    val rd0 = if (ms) spark.read.option("mergeSchema", "true") else spark.read
    partColOf(spark, table, v) match {
      case None =>
        val paths = files.map(rel => dataPath(table, rel))
        // non-evolved snapshots are schema-uniform by the commit gate,
        // so a driver-side footer read replaces the inference job —
        // the same single-footer sample plain inference takes anyway
        val rd = if (ms || paths.isEmpty) rd0
                 else rd0.schema(graft.core.ParquetFooters.schemaOf(spark, paths.head))
        rd.parquet(paths: _*)
      case Some(pc) =>
        val logicalName = colMapOf(spark, table, v)
          .flatMap(_.collectFirst { case (n, p) if p == pc => n }).getOrElse(pc)
        val dt = manifestSchema(spark, table, v)
          .flatMap(st => st.fields.find(_.name == logicalName).map(_.dataType))
        val paths = files.map(rel => dataPath(table, rel))
        // fast path only when the partition column's manifest type is
        // known: the user schema appends pc LAST (matching Spark's
        // dataSchema ++ partition-column output order) so the explicit
        // schema read is column-for-column identical to inference
        val rd1 =
          if (ms || paths.isEmpty || dt.isEmpty) rd0
          else {
            val dataSch = graft.core.ParquetFooters.schemaOf(spark, paths.head)
            if (dataSch.fieldNames.contains(pc)) rd0
            else rd0.schema(org.apache.spark.sql.types.StructType(
              dataSch.fields :+ org.apache.spark.sql.types.StructField(pc, dt.get, true)))
          }
        val df = rd1.option("basePath", s"$table/data").parquet(paths: _*)
        dt.fold(df)(t => df.withColumn(pc, col(pc).cast(t)))
    }
  }

  /** Positional deletion-vector anti-join: drop every (file, row
    * ordinal) pair a posd sidecar records. The ordinal is parquet's
    * stable in-file row index (`_metadata.row_index`), so the filter
    * is schema-independent — no key column, a long-equality test per
    * row — and composes with any column mapping or evolution.
    */
  private def posFilter(spark: SparkSession, table: String,
                        posd: Seq[String], base: DataFrame): DataFrame =
    if (posd.isEmpty) base
    else {
      val posPaths = posd.map(rel => dataPath(table, rel))
      val pairs = spark.read
        .schema(graft.core.ParquetFooters.schemaOf(spark, posPaths.head))
        .parquet(posPaths: _*)
        .select(col("_gf").as("_graft_pf"), col("_gp").as("_graft_pp"))
      val withF = base
        .withColumn("_graft_pos_file",
          element_at(split(col("_metadata.file_path"), "/"), -1))
        .withColumn("_graft_pos_ri", col("_metadata.row_index"))
      withF.join(pairs, withF("_graft_pos_file") === col("_graft_pf") &&
          withF("_graft_pos_ri") === col("_graft_pp"), "left_anti")
        .drop("_graft_pos_file", "_graft_pos_ri")
    }

  /** BOTH merge-on-read filters of version `v` — key tombstones and
    * positional deletion vectors — over a raw per-file frame. Every
    * physical read (snapshot, delete candidates, compaction rewrites,
    * CDC inserts) goes through this so no path can resurrect deleted
    * rows in either form.
    */
  private def morFilter(spark: SparkSession, table: String, v: Int,
                        base: DataFrame): DataFrame =
    posFilter(spark, table, posDeletesOf(spark, table, v),
      tombFilter(spark, table, tombEntriesOf(spark, table, v), base))

  /** One snapshot read over an explicit subset of version `v`'s files:
    * mergeSchema for evolved snapshots, partition-column re-derivation
    * for partitioned layouts, tombstone + deletion-vector anti-joins,
    * logical projection. Shared by [[readVersion]] and the pruned
    * readers so no path can resurrect merge-on-read-deleted rows or
    * leak physical names.
    */
  private def snapshotRead(spark: SparkSession, table: String, v: Int,
                           files: Seq[String]): DataFrame = {
    val base = rawRead(spark, table, v, files)
    val unTombed = morFilter(spark, table, v, base)
    val mapped = colMapOf(spark, table, v).fold(unTombed)(m =>
      unTombed.select(m.map { case (n, p) => col(p).as(n) }: _*))
    // partitioned layout: conform column ORDER to the recorded schema
    // (path-derived partition columns surface last on a hive read)
    if (partColOf(spark, table, v).isEmpty) mapped
    else manifestSchema(spark, table, v).fold(mapped)(st =>
      mapped.select(st.fieldNames.filter(mapped.columns.contains)
        .map(col).toIndexedSeq: _*))
  }

  /** Driver-side mirror of the distributed bloom-bit derivation:
    * portable md5 base hash of the string rendering, k affine
    * variants mod m — byte-identical to the Column path and the
    * oracle SQL. Geometry comes from the manifest ENTRY, not the
    * current constants.
    */
  private[graft] def bloomBitsOf(value: String, m: Int, k: Int): Seq[Int] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes("UTF-8"))
    val prefix = java.lang.Long.parseLong(
      digest.take(4).map("%02x".format(_)).mkString, 16)
    val h = java.lang.Math.floorMod(prefix, graft.functions.Hashing.PortableP)
    (0 until k).map { j =>
      val a = graft.functions.Hashing.affineA(j)
      val b = graft.functions.Hashing.affineB(j)
      (java.lang.Math.floorMod(a * h + b, graft.functions.Hashing.PortableP) % m).toInt
    }.distinct
  }

  /** The file subset of version `v` a point lookup `col = value` can
    * touch, decided from the manifest BLOOMS alone: a file is skipped
    * only when its bloom for `col` misses at least one of the value's
    * bits (no false negatives — the filter never skips a file that
    * holds the key); files without a bloom for `col` are always kept.
    */
  def prunedFilesByKey(spark: SparkSession, table: String, v: Int,
                       colName: String, value: String): Seq[String] = {
    val phys = physOf(colMapOf(spark, table, v), colName)
    val byFile = bloomEntries(spark, table, v)
      .collect { case (fl, c, m, k, b64) if c == phys =>
        fl -> (m, k, java.util.Base64.getDecoder.decode(b64)) }
      .toMap
    filesOf(spark, table, v).filter { fl =>
      byFile.get(fl).forall { case (m, k, bytes) =>
        bloomBitsOf(value, m, k)
          .forall(b => (bytes(b >> 3) & (1 << (b & 7))) != 0)
      }
    }
  }

  /** Point-lookup read with bloom file skipping: reads ONLY the files
    * [[prunedFilesByKey]] keeps, then applies the exact equality
    * filter (on the string rendering — the same canonical form the
    * bloom hashed). The companion to [[readWhere]]'s range skipping
    * for columns the layout does NOT cluster: needle-in-100-TB id
    * lookups read the handful of files whose blooms admit the key.
    */
  def readWhereKey(spark: SparkSession, table: String, colName: String,
                   value: String, version: Int = -1): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, table)
    val kept = prunedFilesByKey(spark, table, v, colName, value)
    if (kept.isEmpty) // bloom proved absence in every file
      return readVersion(spark, table, v).limit(0)
        .filter(col(colName).cast("string") === value)
    snapshotRead(spark, table, v, kept)
      .filter(col(colName).cast("string") === value)
  }

  /** Row-level DELETE, copy-on-write (the Delta default path): files
    * whose manifest stats say they CANNOT contain `lo ≤ col ≤ hi`
    * are carried into the new version untouched (same relative
    * paths — zero IO, zero write amplification on them); only the
    * [[prunedFiles]] candidates are read, filtered to the survivors,
    * and rewritten. With a range-clustered layout the rewrite set is
    * the matching files, not the table — at 100 TB a point delete
    * rewrites megabytes. Old files stay for time travel until
    * vacuumed; `changes()` reads the version as remove+add of the
    * rewritten subset only.
    *
    * A delete whose range prunes to ZERO candidate files is a no-op
    * and commits nothing (Delta's behavior) — returns the current
    * version with 0 rewritten.
    *
    * @return (version, nRewrittenFiles, nCarriedFiles)
    */
  def deleteWhere(spark: SparkSession, table: String, colName: String,
                  lo: Double, hi: Double,
                  statsCols: Seq[String] = Nil): (Int, Int, Int) = {
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot delete from non-existent table $table")
    val all = filesOf(spark, table, v)
    val touch = prunedFiles(spark, table, v, colName, lo, hi)
    val untouched = all.filterNot(touch.toSet)
    if (touch.isEmpty) return (v, 0, all.size)
    val phys = physOf(colMapOf(spark, table, v), colName)
    // SQL DELETE semantics: rows where the predicate is NULL are KEPT
    // (a bare NOT(between) would silently drop null-keyed rows).
    // Evolved tables rewrite through mergeSchema so late-added columns
    // survive the rewrite. The candidate read applies existing MoR
    // tombstones — a rewrite gives rows NEW file names, which would
    // break the per-(file, key) tombstone scope and resurrect them.
    val survivors = morFilter(spark, table, v,
        rawRead(spark, table, v, touch))
      .filter(col(phys).isNull || !(col(phys) >= lo && col(phys) <= hi))
    val nv = commitAs(survivors, table, v + 1, "delete", statsCols,
      carryFiles = Some(untouched), dfIsPhysical = true)
    (nv, touch.size, untouched.size)
  }

  /** Row-level UPDATE, COPY-ON-WRITE (the Delta/Iceberg CoW UPDATE
    * shape): rewrite ONLY the files whose stats admit a predicate
    * match, applying `assign` to the matching rows and carrying every
    * other file by reference — a point update on a 100 TB table costs
    * one stats-pruned candidate rewrite, never a snapshot rewrite.
    * SQL UPDATE semantics: rows where the predicate is NULL keep their
    * original values; non-matching rows in rewritten files copy
    * through unchanged. The rewrite reads through the merge-on-read
    * filters (a rewritten row gets a NEW file name, which would
    * otherwise un-scope its tombstones) and commits as op "update" —
    * [[changes]] surfaces the churn as delete-of-candidates +
    * insert-of-rewrites (the Iceberg CDC rule for CoW updates).
    *
    * `assign` maps column names to replacement expressions evaluated
    * on the matched rows (referencing any column of the row).
    *
    * @return (version, nRewrittenFiles, nCarriedFiles) — version
    *         unchanged with 0 rewrites when no file can match
    */
  def updateWhere(spark: SparkSession, table: String, colName: String,
                  lo: Double, hi: Double, assign: Map[String, Column],
                  statsCols: Seq[String] = Nil): (Int, Int, Int) = {
    require(assign.nonEmpty, "updateWhere needs at least one assignment")
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot update non-existent table $table")
    val all = filesOf(spark, table, v)
    val touch = prunedFiles(spark, table, v, colName, lo, hi)
    val untouched = all.filterNot(touch.toSet)
    if (touch.isEmpty) return (v, 0, all.size)
    val map = colMapOf(spark, table, v)
    val phys = physOf(map, colName)
    require(!assign.contains(colName) || colName == colName, "")
    val pred = col(phys).isNotNull && col(phys) >= lo && col(phys) <= hi
    val base = morFilter(spark, table, v, rawRead(spark, table, v, touch))
    // assignment TARGETS are logical names resolved through the column
    // mapping; assignment EXPRESSIONS evaluate against the physical
    // rewrite frame (identical to logical for unmapped tables)
    val rewritten = assign.foldLeft(base) { case (d, (name, expr)) =>
      val p = physOf(map, name)
      require(base.columns.contains(p),
        s"TxTable: updateWhere target column '$name' not in $table")
      d.withColumn(p, when(pred, expr).otherwise(col(p)))
    }
    val nv = commitAs(rewritten, table, v + 1, "update", statsCols,
      carryFiles = Some(untouched), dfIsPhysical = true)
    (nv, touch.size, untouched.size)
  }

  /** Row-level DELETE, MERGE-ON-READ (the Delta deletion-vector shape
    * at (file, key) granularity): ZERO data files are rewritten — the
    * delete writes a tombstone SIDECAR of (data-file, key) pairs for
    * the rows the predicate matched, and every snapshot read
    * anti-joins the sidecar before projecting. The write-amplification
    * asymmetry vs [[deleteWhere]] (copy-on-write): a point delete on a
    * 100 TB table costs one stats-pruned candidate scan plus a
    * kilobyte-scale sidecar write; reads pay one broadcast anti-join
    * until OPTIMIZE folds the tombstones away ([[compact]] reads
    * through the MoR view and sheds the sidecars; [[compactSmall]]
    * applies them to whatever it rewrites and carries them for the
    * rest). Semantics match the CoW path: NULL-predicate rows are
    * kept; rows already tombstoned are not re-recorded (the candidate
    * scan reads through existing tombs); appends after the delete are
    * UNAFFECTED (tombstones are per-file, never a key blocklist). NULL
    * keys in matched rows refuse loudly in-plan — an unidentifiable
    * row cannot be tombstoned; use copy-on-write. `keyCol` must
    * identify rows within a file (a non-unique key deletes every
    * same-key row of the matched files).
    *
    * @return (version, nTombstonedPairs) — the current version with 0
    *         when no candidate row matches (Delta's no-op rule)
    */
  def deleteWhereMor(spark: SparkSession, table: String, colName: String,
                     lo: Double, hi: Double, keyCol: String): (Int, Long) = {
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot delete from non-existent table $table")
    val all = filesOf(spark, table, v)
    val map = colMapOf(spark, table, v)
    val phys = physOf(map, colName)
    val physKey = physOf(map, keyCol)
    val touch = prunedFiles(spark, table, v, colName, lo, hi)
    if (touch.isEmpty) return (v, 0L)
    val f = fs(spark, table)
    val matched = morFilter(spark, table, v,
        rawRead(spark, table, v, touch))
      .filter(col(phys) >= lo && col(phys) <= hi)
    val kt = matched.schema(physKey).dataType
    val guardedKey = when(col(physKey).isNotNull, col(physKey))
      .otherwise(raise_error(lit("TxTable.deleteWhereMor: NULL key in a matched " +
        "row — keyCol must identify every row; use deleteWhere (copy-on-write)"))
        .cast(kt))
    val keys = matched.select(
      element_at(split(col("_metadata.file_path"), "/"), -1).as("_gf"),
      guardedKey.as("_gk")).distinct()
    publishTombstonePairs(spark, table, v, physKey, keys, None)
  }

  /** Key-SET merge-on-read delete — the CDC-apply form of
    * [[deleteWhereMor]]: tombstone every row of the current snapshot
    * whose `keyCol` appears in `keys` (one column, same type). The
    * scan is BLOOM-ACCELERATED when the table indexes `keyCol` and the
    * batch is small (each key probes the per-file blooms driver-side —
    * a needle-batch delete reads the handful of admitting files, not
    * the snapshot); otherwise one semi-join pass over the snapshot,
    * the standard index-less CDC-apply cost. Naturally IDEMPOTENT:
    * already-tombstoned rows never re-match (the scan reads through
    * existing tombs), so a replayed delete batch is a no-op — and an
    * optional `txn` marker records (appId, batchId) in the manifest
    * for [[txnVersionOf]]-gated exactly-once composition (the
    * streaming mirror uses it to never re-tombstone rows a later
    * version re-inserted).
    *
    * @return (version, nTombstonedPairs) — current version with 0 on
    *         an empty match
    */
  /** The file subset of version `v` whose per-file bloom (on physical
    * column `physKey`) can contain ANY of `keys` — the shared
    * candidate-pruning step of the key-addressed writes
    * ([[deleteKeysMor]], [[appendUnique]]). Falls back to ALL files
    * when the column has no blooms or the probe exceeds the bounded
    * driver collect (big batches amortize a full semi-join scan
    * anyway). Probe strings are rendered by SPARK's cast-to-string —
    * the same rendering the executor-built blooms hashed (a
    * driver-side String.valueOf diverges for e.g. timestamps, and a
    * diverged probe is a bloom FALSE NEGATIVE: files wrongly pruned,
    * rows silently missed). NULL keys never match an equality join and
    * the blooms were built null-filtered — dropped from the probe.
    */
  private def bloomCandidateFiles(spark: SparkSession, table: String, v: Int,
                                  physKey: String, keys: DataFrame): Seq[String] = {
    val all = filesOf(spark, table, v)
    val blooms = bloomEntries(spark, table, v)
      .collect { case (fl, c, m, k, b64) if c == physKey =>
        fl -> (m, k, java.util.Base64.getDecoder.decode(b64)) }.toMap
    if (blooms.isEmpty) return all
    val probe = keys
      .select(keys.col(keys.columns.head).cast("string").as("_graft_pk"))
      .filter(col("_graft_pk").isNotNull)
      .limit(10001).collect()
    if (probe.length > 10000) all
    else {
      // hash each key ONCE per bloom geometry (md5 is the expensive
      // part — per-(file, key) hashing would be files × keys
      // digests); the per-file pass is then pure bit tests
      val bitsByGeom = blooms.values.map { case (m, k, _) => (m, k) }.toSet
        .map { g: (Int, Int) =>
          g -> probe.map(r => bloomBitsOf(r.getString(0), g._1, g._2)) }
        .toMap
      all.filter { fl =>
        blooms.get(fl).forall { case (m, k, bytes) =>
          bitsByGeom((m, k)).exists(_.forall(b =>
            (bytes(b >> 3) & (1 << (b & 7))) != 0))
        }
      }
    }
  }

  /** UNIQUE-KEY-ENFORCED APPEND (INSERT ... ON CONFLICT DO NOTHING /
    * the Delta "insert-only merge" idempotent-ingest shape): append
    * only the batch rows whose `keyCol` does not already exist in the
    * table; in-batch duplicates collapse to one row (first by key,
    * arbitrary deterministic within Spark's dropDuplicates). The
    * existence check is manifest-bloom-pruned: only files whose bloom
    * can contain a batch key are read, and only the KEY COLUMN of
    * those (column-pruned scan) — on a bloomed table a small batch
    * probes a handful of files, never the snapshot. Commits with
    * `countRows`/stat/bloom options like [[commit]]; returns (version,
    * rows actually inserted). A fully-duplicate batch is a NO-OP (no
    * commit — Delta's empty-transaction rule), returning (v, 0).
    */
  def appendUnique(df: DataFrame, table: String, keyCol: String,
                   statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
                   setCols: Seq[String] = Nil,
                   countRows: Boolean = false): (Int, Long) = {
    val spark = df.sparkSession
    val v = currentVersion(spark, table)
    val batch = df.dropDuplicates(keyCol)
    val fresh =
      if (v < 1) batch
      else {
        val physKey = physOf(colMapOf(spark, table, v), keyCol)
        val cand = bloomCandidateFiles(spark, table, v, physKey,
          batch.select(keyCol))
        if (cand.isEmpty) batch
        else {
          val existing = snapshotRead(spark, table, v, cand)
            .select(col(keyCol))
          batch.join(existing, Seq(keyCol), "left_anti")
        }
      }
    // the anti-join re-evaluates inside commit's write; a cheap
    // localCheckpoint would hide the no-op probe, so count once and
    // reuse the materialized frame for both the gate and the write
    val staged = fresh.localCheckpoint(true)
    val n = staged.count()
    if (n == 0L) return (math.max(v, 0), 0L)
    val nv = commit(staged, table, "append", statsCols = statsCols,
      bloomCols = bloomCols, setCols = setCols, countRows = countRows)
    (nv, n)
  }

  def deleteKeysMor(spark: SparkSession, table: String, keyCol: String,
                    keys: DataFrame,
                    txn: Option[(String, Long)] = None): (Int, Long) = {
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot delete from non-existent table $table")
    require(keys.columns.length == 1,
      s"TxTable.deleteKeysMor: keys must be a single-column frame, got " +
      keys.columns.mkString(", "))
    val map = colMapOf(spark, table, v)
    val physKey = physOf(map, keyCol)
    val candidates = bloomCandidateFiles(spark, table, v, physKey, keys)
    if (candidates.isEmpty) return (v, 0L)
    val cand = morFilter(spark, table, v,
      rawRead(spark, table, v, candidates))
    val dk = keys.toDF("_graft_dk").distinct()
    val matched = cand.join(dk, cand(physKey) === col("_graft_dk"), "left_semi")
    val pairs = matched.select(
      element_at(split(col("_metadata.file_path"), "/"), -1).as("_gf"),
      col(physKey).as("_gk")).distinct()
    publishTombstonePairs(spark, table, v, physKey, pairs, txn)
  }

  /** Shared sidecar-publish tail of the merge-on-read deletes: write
    * the (file, key) pairs as a tombstone sidecar, then publish a
    * manifest-only `mordelete` version carrying every data file,
    * stat, bloom, value set, mapping, and prior tomb verbatim.
    * Empty match → no commit (Delta's no-op rule).
    */
  private def publishTombstonePairs(spark: SparkSession, table: String, v: Int,
                                    physKey: String, pairs: DataFrame,
                                    txn: Option[(String, Long)]): (Int, Long) = {
    val f = fs(spark, table)
    val all = filesOf(spark, table, v)
    val map = colMapOf(spark, table, v)
    // sidecar write — versioned names ride the same vacuum protocol as
    // data files (in-flight skip covers a racing delete's sidecars)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$table/_tmp_v${v + 1}_$nonce")
    pairs.write.mode("overwrite").parquet(tmp.toString)
    val parts = f.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    f.mkdirs(new Path(s"$table/data"))
    val named = parts.zipWithIndex.map { case (p, i) =>
      val rel = s"data/v${v + 1}_t${i}_$nonce.parquet"
      require(f.rename(p, new Path(s"$table/$rel")), s"rename failed for $p")
      rel
    }.toSeq
    f.delete(tmp, true)
    val nDeleted = // exact from footers, no scan job (just-written files)
      if (named.isEmpty) 0L
      else graft.core.ParquetFooters.rowCount(spark, named.map(rel => s"$table/$rel"))
    if (nDeleted == 0L) { // no actual match: no-op
      named.foreach(rel => f.delete(new Path(s"$table/$rel"), false))
      return (v, 0L)
    }
    // manifest-only publish: every DATA file carries verbatim (the
    // "zero files rewritten" property an auditor checks), stats/blooms/
    // mapping/ms carry with them, tombs extend. O(delta) form between
    // checkpoints — the manifest edit is just the tomb extension.
    val tombs = tombEntriesOf(spark, table, v) ++ named.map(rel => (rel, physKey))
    val parentMs = try commitMsOf(spark, table, v)
      catch { case _: java.io.FileNotFoundException => 0L }
    val ts = math.max(System.currentTimeMillis(), parentMs + 1L)
    val schemaDDL = manifestSchema(spark, table, v).map(_.toDDL)
      .orElse(scala.util.Try(readVersion(spark, table, v).schema.toDDL).toOption)
    val txnJson = txn.map { case (app, batch) =>
      s""","txn":{"app":"$app","batch":$batch}""" }.getOrElse("")
    val json = if ((v + 1) % CheckpointEvery == 0)
      renderManifest(v + 1, "mordelete", ts, txnJson, msOf(spark, table, v),
        schemaDDL, all, statsOf(spark, table, v), bloomEntries(spark, table, v),
        tombs, map, valueSetsOf(spark, table, v), partColOf(spark, table, v),
        posDeletesOf(spark, table, v), rowCountsOf(spark, table, v))
    else
      renderDeltaManifest(v + 1, "mordelete", ts, txnJson, msOf(spark, table, v),
        schemaDDL, v, all.size, Seq.empty, Seq.empty, Seq.empty, Seq.empty,
        tombs, map, Seq.empty, partColOf(spark, table, v),
        posDeletesOf(spark, table, v))
    publishOrConflict(f, table, v + 1, json)
    (v + 1, nDeleted)
  }

  /** Row-level DELETE via POSITIONAL DELETION VECTORS (the
    * Delta/Iceberg deletion-vector shape): like [[deleteWhereMor]],
    * ZERO data files rewrite — but the sidecar records (data-file, row
    * ORDINAL) pairs instead of key values, so the form is
    * SCHEMA-INDEPENDENT (no key column required, NULL keys are fine,
    * composes with any mapping/evolution) and the read-side anti-join
    * compares a long ordinal instead of a possibly-wide key — the
    * cheap test on tables whose natural key is a wide string. Same
    * semantics otherwise: NULL-predicate rows kept, already-deleted
    * rows never re-recorded, appends unaffected, OPTIMIZE folds the
    * vectors away.
    *
    * @return (version, nDeletedRows) — the current version with 0 when
    *         no candidate row matches (Delta's no-op rule)
    */
  def deleteWherePos(spark: SparkSession, table: String, colName: String,
                     lo: Double, hi: Double): (Int, Long) = {
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot delete from non-existent table $table")
    val phys = physOf(colMapOf(spark, table, v), colName)
    val touch = prunedFiles(spark, table, v, colName, lo, hi)
    if (touch.isEmpty) return (v, 0L)
    val matched = morFilter(spark, table, v, rawRead(spark, table, v, touch))
      .filter(col(phys) >= lo && col(phys) <= hi)
    val pairs = matched.select(
      element_at(split(col("_metadata.file_path"), "/"), -1).as("_gf"),
      col("_metadata.row_index").as("_gp"))
    publishPosPairs(spark, table, v, pairs)
  }

  /** Sidecar-publish tail of the positional delete: write the (file,
    * ordinal) pairs as a deletion-vector sidecar, then publish a
    * manifest-only `posdelete` version carrying every data file, stat,
    * bloom, value set, mapping, tomb, and prior vector verbatim.
    * Empty match → no commit.
    */
  private def publishPosPairs(spark: SparkSession, table: String, v: Int,
                              pairs: DataFrame): (Int, Long) = {
    val f = fs(spark, table)
    val all = filesOf(spark, table, v)
    val map = colMapOf(spark, table, v)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$table/_tmp_v${v + 1}_$nonce")
    pairs.write.mode("overwrite").parquet(tmp.toString)
    val parts = f.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    f.mkdirs(new Path(s"$table/data"))
    val named = parts.zipWithIndex.map { case (p0, i) =>
      val rel = s"data/v${v + 1}_p${i}_$nonce.parquet"
      require(f.rename(p0, new Path(s"$table/$rel")), s"rename failed for $p0")
      rel
    }.toSeq
    f.delete(tmp, true)
    val nDeleted = // exact from footers, no scan job (just-written files)
      if (named.isEmpty) 0L
      else graft.core.ParquetFooters.rowCount(spark, named.map(rel => s"$table/$rel"))
    if (nDeleted == 0L) {
      named.foreach(rel => f.delete(new Path(s"$table/$rel"), false))
      return (v, 0L)
    }
    val posd = posDeletesOf(spark, table, v) ++ named
    val parentMs = try commitMsOf(spark, table, v)
      catch { case _: java.io.FileNotFoundException => 0L }
    val ts = math.max(System.currentTimeMillis(), parentMs + 1L)
    val schemaDDL = manifestSchema(spark, table, v).map(_.toDDL)
      .orElse(scala.util.Try(readVersion(spark, table, v).schema.toDDL).toOption)
    val json = if ((v + 1) % CheckpointEvery == 0)
      renderManifest(v + 1, "posdelete", ts, "", msOf(spark, table, v),
        schemaDDL, all, statsOf(spark, table, v), bloomEntries(spark, table, v),
        tombEntriesOf(spark, table, v), map, valueSetsOf(spark, table, v),
        partColOf(spark, table, v), posd, rowCountsOf(spark, table, v))
    else
      renderDeltaManifest(v + 1, "posdelete", ts, "", msOf(spark, table, v),
        schemaDDL, v, all.size, Seq.empty, Seq.empty, Seq.empty, Seq.empty,
        tombEntriesOf(spark, table, v), map, Seq.empty,
        partColOf(spark, table, v), posd)
    publishOrConflict(f, table, v + 1, json)
    (v + 1, nDeleted)
  }

  /** Metadata-only column RENAME (the Delta column-mapping rename):
    * publishes a new version whose manifest carries every file, stat,
    * bloom, and tombstone verbatim and only rewrites the (logical →
    * physical) mapping plus the recorded schema — ZERO data IO at any
    * table size. Old and new files both store the column under its
    * original PHYSICAL name; reads project physical → logical; later
    * appends write through the mapping, so file schemas never fork.
    */
  def renameColumn(spark: SparkSession, table: String, from: String,
                   to: String): Int = {
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot rename a column of non-existent table $table")
    val schema = manifestSchema(spark, table, v)
      .getOrElse(readVersion(spark, table, v).schema)
    require(schema.fieldNames.contains(from),
      s"TxTable: no column '$from' at $table v$v " +
      s"(have ${schema.fieldNames.mkString(", ")})")
    require(!schema.fieldNames.contains(to),
      s"TxTable: column '$to' already exists at $table v$v")
    val map0 = colMapOf(spark, table, v)
      .getOrElse(schema.fieldNames.toSeq.map(n => (n, n)))
    // a hidden layout's transform spec names its SOURCE column by
    // physical name baked into every partition directory — renaming
    // the source would desynchronize derive-on-append from the layout
    require(!partColOf(spark, table, v).flatMap(hiddenSpecOf)
        .exists(_._2 == physOf(Some(map0), from)),
      s"TxTable: column '$from' is the source of $table's hidden partition " +
      "layout — rewrite the layout (op=\"overwrite\" with a new partitionBy) first")
    metadataCommit(spark, table, "rename",
      StructType(schema.map(fd => if (fd.name == from) fd.copy(name = to) else fd)),
      map0.map { case (n, p) => (if (n == from) to else n, p) })
  }

  /** Metadata-only column DROP: the column leaves the mapping and the
    * recorded schema; its physical data stays in the immutable files
    * (reads never select it; time travel to pre-drop versions still
    * sees it; a later full [[compact]] physically sheds it). ZERO data
    * IO, like [[renameColumn]].
    */
  def dropColumn(spark: SparkSession, table: String, name: String): Int = {
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot drop a column of non-existent table $table")
    val schema = manifestSchema(spark, table, v)
      .getOrElse(readVersion(spark, table, v).schema)
    require(schema.fieldNames.contains(name),
      s"TxTable: no column '$name' at $table v$v " +
      s"(have ${schema.fieldNames.mkString(", ")})")
    require(schema.size >= 2, s"TxTable: cannot drop the last column of $table")
    val map0 = colMapOf(spark, table, v)
      .getOrElse(schema.fieldNames.toSeq.map(n => (n, n)))
    // an ACTIVE tombstone key is load-bearing: the snapshot read
    // anti-joins on it, so dropping it would break every read until
    // OPTIMIZE folds the tombs — refuse with the remedy named
    val phys = physOf(Some(map0), name)
    require(!tombEntriesOf(spark, table, v).exists(_._2 == phys),
      s"TxTable: column '$name' is an active merge-on-read tombstone key at " +
      s"$table v$v — run compact() (OPTIMIZE folds the tombstones) before dropping it")
    require(!partColOf(spark, table, v).flatMap(hiddenSpecOf).exists(_._2 == phys),
      s"TxTable: column '$name' is the source of $table's hidden partition " +
      "layout — rewrite the layout (op=\"overwrite\" with a new partitionBy) first")
    metadataCommit(spark, table, "drop",
      StructType(schema.filterNot(_.name == name)),
      map0.filterNot(_._1 == name))
  }

  /** Shared metadata-only publish for rename/drop: files, stats,
    * blooms, tombstones, and the ms flag carry verbatim from the head;
    * only the schema and mapping change. Rides the same CAS as every
    * commit — losing to a concurrent writer refuses loudly.
    */
  private def metadataCommit(spark: SparkSession, table: String, op: String,
                             schema1: StructType,
                             map1: Seq[(String, String)]): Int = {
    val v = currentVersion(spark, table)
    val f = fs(spark, table)
    val parentMs = try commitMsOf(spark, table, v)
      catch { case _: java.io.FileNotFoundException => 0L }
    val ts = math.max(System.currentTimeMillis(), parentMs + 1L)
    // O(delta) between checkpoints: the manifest edit is only the new
    // schema + mapping (scalar fields) — rename/drop on a 10⁶-file
    // table writes kilobytes
    val json = if ((v + 1) % CheckpointEvery == 0)
      renderManifest(v + 1, op, ts, "", msOf(spark, table, v),
        Some(schema1.toDDL), filesOf(spark, table, v), statsOf(spark, table, v),
        bloomEntries(spark, table, v), tombEntriesOf(spark, table, v), Some(map1),
        valueSetsOf(spark, table, v), partColOf(spark, table, v),
        posDeletesOf(spark, table, v), rowCountsOf(spark, table, v))
    else
      renderDeltaManifest(v + 1, op, ts, "", msOf(spark, table, v),
        Some(schema1.toDDL), v, filesOf(spark, table, v).size,
        Seq.empty, Seq.empty, Seq.empty, Seq.empty,
        tombEntriesOf(spark, table, v), Some(map1), Seq.empty,
        partColOf(spark, table, v), posDeletesOf(spark, table, v))
    publishOrConflict(f, table, v + 1, json)
    v + 1
  }

  /** Exactly-once commit for replayable writers (the Delta
    * `txnAppId`/`txnVersion` idempotence contract): a commit tagged
    * (appId, batchId) that already exists in a live manifest is NOT
    * re-applied — the streaming foreachBatch retry story, where the
    * engine re-delivers a batch after a crash between "data written"
    * and "offset recorded", and the second delivery must be a no-op.
    *
    * The txn scan reads live MANIFESTS only (bounded by the retention
    * policy — `expireVersions` keeps the scan short; a table retaining
    * N versions scans N small JSON files, no data IO). Two racing
    * writers of the SAME batch: one wins the version CAS, the loser's
    * conflict triggers ONE rescan that finds the winner's txn and
    * returns it as already-applied — never a double apply.
    *
    * @return (version, applied) — applied=false means the batch was
    *         already committed (by this call's rescan or an earlier run)
    */
  def commitIdempotent(df: DataFrame, table: String, appId: String,
                       batchId: Long, op: String = "append",
                       statsCols: Seq[String] = Nil,
                       bloomCols: Seq[String] = Nil): (Int, Boolean) = {
    require(appId.nonEmpty && !appId.exists(c => c == '"' || c == '\\' || c.isControl),
      s"TxTable: appId must be a plain identifier, got '$appId'")
    val spark = df.sparkSession
    def findApplied: Option[Int] = txnVersionOf(spark, table, appId, batchId)
    findApplied match {
      case Some(v) => (v, false)
      case None =>
        try {
          val nv = commitAs(df, table, currentVersion(spark, table) + 1, op,
            statsCols, txn = Some((appId, batchId)), bloomCols = bloomCols)
          (nv, true)
        } catch {
          case e: RuntimeException if e.getMessage != null &&
              e.getMessage.contains("commit conflict") =>
            // lost the version race — if the winner WAS this batch
            // (concurrent duplicate delivery), it's applied; anything
            // else is a genuine conflict for the caller's retry loop
            findApplied.map((_, false)).getOrElse(throw e)
        }
    }
  }

  /** The live version that recorded txn marker (appId, batchId), if
    * any — the public read side of [[commitIdempotent]]'s ledger. Lets
    * a composed pipeline gate NON-commit work (e.g. a merge-on-read
    * delete that must not re-run once its version's inserts landed) on
    * the same exactly-once record. Scans live manifests only
    * (retention-bounded, like the idempotence rescan).
    */
  def txnVersionOf(spark: SparkSession, table: String, appId: String,
                   batchId: Long): Option[Int] = {
    val marker = s""""txn":{"app":"$appId","batch":$batchId}"""
    liveVersions(spark, table).reverse
      .find(v => manifestText(spark, table, v).contains(marker))
  }

  /** RESTORE (the Delta RESTORE TABLE ... TO VERSION shape): publish a
    * NEW version whose file list is exactly version `toV`'s — a
    * zero-copy rollback (no data is read or written; the restored
    * snapshot references the same immutable files, which is why the
    * manifest design makes undo free). History is preserved: the bad
    * versions stay time-travelable until retention expires them, and
    * `changes()` reads the restore as delete-of-current +
    * insert-of-restored (a full snapshot replace — downstream
    * consumers converge to the rolled-back state).
    *
    * The publish rides the same committer CAS as any commit — a
    * concurrent writer winning the version race fails this restore
    * loudly (rolling back UNDER a live writer must be explicit, not
    * silently interleaved).
    *
    * @return the new (restored) version number
    */
  def restore(spark: SparkSession, table: String, toV: Int): Int = {
    val head = currentVersion(spark, table)
    require(toV >= 1, s"versions start at 1, got $toV")
    require(manifestPath(table, toV).getFileSystem(
        spark.sparkContext.hadoopConfiguration).exists(manifestPath(table, toV)),
      s"TxTable: cannot restore $table to expired/unknown version $toV")
    val v = head + 1
    val f = fs(spark, table)
    val parentMs = try commitMsOf(spark, table, head)
      catch { case _: java.io.FileNotFoundException => 0L }
    val ts = math.max(System.currentTimeMillis(), parentMs + 1L)
    // every manifest this layer writes records a schema (the commitAs
    // invariant) — a pre-schema target falls back to its snapshot read.
    // Stats, blooms, TOMBSTONES, and the COLUMN MAPPING restore with
    // their files: the restored snapshot must read bit-identically to
    // the target, merge-on-read deletes and renames included.
    val schemaDDL = manifestSchema(spark, table, toV)
      .orElse(scala.util.Try(readVersion(spark, table, toV).schema).toOption)
      .map(_.toDDL)
    val json = renderManifest(v, "restore", ts, "", msOf(spark, table, toV),
      schemaDDL, filesOf(spark, table, toV), statsOf(spark, table, toV),
      bloomEntries(spark, table, toV), tombEntriesOf(spark, table, toV),
      colMapOf(spark, table, toV), valueSetsOf(spark, table, toV),
      partColOf(spark, table, toV), posDeletesOf(spark, table, toV),
      rowCountsOf(spark, table, toV))
    publishOrConflict(f, table, v, json)
    v
  }

  /** SHALLOW CLONE (the Delta `CREATE TABLE ... SHALLOW CLONE` shape):
    * a METADATA-ONLY copy — `dst`'s v1 manifest records `src`'s
    * resolved snapshot (at `version`, default head) with every data
    * file referenced by ABSOLUTE path and every stat/bloom/value-set/
    * tombstone/deletion-vector/row-count/mapping entry carried
    * verbatim. ZERO data IO at any table size: cloning a 100 TB table
    * is one manifest write. The clone then evolves INDEPENDENTLY —
    * appends/deletes/compactions land in `dst`'s own directory and
    * never touch `src` (a compact progressively MATERIALIZES the clone
    * by rewriting borrowed files into owned ones); `src`'s later
    * commits are invisible to the clone (it pinned a snapshot). The
    * dev/test-branch and experiment-fork story.
    *
    * Caveats (Delta's own): VACUUM on `src` can delete files the clone
    * still references — retain `src` history while clones are live (or
    * compact the clone to materialize it). `dst`'s vacuum never
    * touches borrowed files (it only deletes under `dst`). Cloning a
    * hive-partitioned layout is refused: the partition column derives
    * from paths under `src/data`, which a foreign basePath read cannot
    * reproduce — compact `src` to a flat layout first.
    */
  def cloneShallow(spark: SparkSession, src: String, dst: String,
                   version: Int = -1): Int = {
    val v = if (version > 0) version else currentVersion(spark, src)
    require(v >= 1, s"TxTable: cannot clone non-existent table $src")
    require(currentVersion(spark, dst) == 0,
      s"TxTable: clone target $dst already exists — drop it first")
    require(partColOf(spark, src, v).isEmpty,
      s"TxTable: $src v$v has a hive-partitioned layout — a clone cannot " +
      "re-derive path partition values across table roots; compact to a " +
      "flat layout first")
    val snap = snapshotOf(spark, src, v)
    def abs(rel: String): String = dataPath(src, rel)
    val json = renderManifest(1, "clone", System.currentTimeMillis(), "",
      msOf(spark, src, v), manifestSchema(spark, src, v).map(_.toDDL),
      snap.files.map(abs),
      snap.stats.map(e => (abs(e._1), e._2, e._3, e._4)),
      snap.blooms.map(e => (abs(e._1), e._2, e._3, e._4, e._5)),
      snap.tombs.map(e => (abs(e._1), e._2)),
      colMapOf(spark, src, v),
      snap.vsets.map(e => (abs(e._1), e._2, e._3)),
      None,
      snap.posd.map(abs),
      snap.rows.map(e => (abs(e._1), e._2)))
    publishOrConflict(fs(spark, dst), dst, 1, json)
    1
  }

  /** Constraint-gated commit — the Delta CHECK-constraint / write-
    * audit-publish shape composed from the parts this engine already
    * has: run a declared [[graft.functions.Quality]] audit over the
    * frame and PUBLISH ONLY IF every check passes; a violation refuses
    * loudly with the failed verdicts named and the table head
    * untouched (nothing was committed — the scratch write never
    * happens). The audit is Quality's one-shared-scan pass, so the
    * price is one extra scan of the INPUT before the write (the
    * full WAP refinement — audit the written files, then publish —
    * belongs inside the committer when the input is too expensive to
    * scan twice; for a batch commit the one-scan audit is the
    * standard guard).
    *
    * @return the committed version
    */
  def commitChecked(df: DataFrame, table: String,
                    checks: Seq[graft.functions.Quality.Check],
                    op: String = "append", statsCols: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.{col, not}
    val failed = graft.functions.Quality.audit(df, checks)
      .filter(not(col("passed"))).collect() // ≤ |checks| rows
    require(failed.isEmpty,
      s"TxTable: commit to $table refused — ${failed.length} constraint(s) failed: " +
      failed.map(r => s"${r.getString(0)}(${r.getString(1)}) metric=${r.get(2)}")
        .mkString("; "))
    commit(df, table, op, statsCols)
  }

  // ------------------- WRITE-AUDIT-PUBLISH -------------------
  // The Iceberg WAP refinement of [[commitChecked]] for inputs too
  // expensive to scan twice: the data files land ONCE at stage time,
  // the audit runs over the WRITTEN files (not a second pass over the
  // input), and publish is a METADATA-ONLY append commit adopting
  // them — no data IO between audit verdict and table head. A staged
  // batch is invisible to every read until published; a failed audit
  // abandons it without the table ever having moved.

  private def stagedPath(table: String, wapId: String) =
    new Path(s"$table/_staged/$wapId.json")

  private def requireWapId(wapId: String): Unit =
    require(wapId.nonEmpty && wapId.forall(c =>
        c.isLetterOrDigit && c < 128 || c == '-' || c == '_'),
      s"TxTable: wapId must be [A-Za-z0-9_-]+, got '$wapId'")

  private def stagedText(f: FileSystem, table: String, wapId: String): String = {
    val sp = stagedPath(table, wapId)
    require(f.exists(sp), s"TxTable: no staged batch '$wapId' at $table")
    val in = f.open(sp)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Stage a batch for write-audit-publish: the frame writes to the
    * table's data directory under UNVERSIONED staged names
    * (`w_<wapId>_…`) recorded in `_staged/<wapId>.json` — referenced
    * by NO manifest, so every snapshot read, CDC poll, and time travel
    * is oblivious until [[publishWap]]. The schema gates against the
    * head HERE (loud before any audit work); partitioned or
    * column-mapped heads refuse (stage writes flat logical-named
    * files — those layouts commit directly). Returns the staged
    * relative paths (the audit surface, also via [[readWap]]).
    */
  /** Commit `nSlices` row-disjoint slices of one frame as `nSlices`
    * consecutive append versions with ONE distributed write. The
    * sequential shape — N× `commit(df.filter(slice === i).coalesce(1))`
    * — re-scans the input and schedules a full write job per version;
    * building an N-version history that way is N scans, N writes, and
    * N driver-side job launches for data one pass can produce. Here
    * the frame writes once into a scratch dir hive-partitioned by the
    * slice id (repartitioned so each slice lands in exactly one task →
    * exactly one data file per slice, the coalesce(1) shape), and each
    * version then ADOPTS its slice's file through the same
    * preNamed/WAP publish path `publishWap` uses: per-version rows,
    * file count, footer stats, and manifests are identical to the
    * sequential form — minus N−1 scans and write jobs.
    *
    * `sliceOf` must be an integer expression in [0, nSlices); rows are
    * partitioned by it EXACTLY (hive directory = slice value, no
    * hashing ambiguity). An empty slice commits as a zero-file append
    * (version exists, carries the parent's files). Fresh/unmapped/
    * unpartitioned tables only — the stageWap preconditions, and the
    * only shape history-building setups use.
    */
  def commitSlices(df: DataFrame, table: String, sliceOf: Column, nSlices: Int,
                   statsCols: Seq[String] = Nil,
                   payloadCols: Seq[String] = Nil): Seq[Int] = {
    require(nSlices >= 1, s"nSlices must be >= 1, got $nSlices")
    val spark = df.sparkSession
    val f = fs(spark, table)
    val v0 = currentVersion(spark, table)
    require(v0 < 1 || partColOf(spark, table, v0).isEmpty,
      s"TxTable: $table has a partitioned layout — commitSlices writes flat files")
    require(v0 < 1 || colMapOf(spark, table, v0).isEmpty,
      s"TxTable: $table is column-mapped — commitSlices writes logical names physically")
    // the slice expression may read columns that are NOT part of the
    // committed payload (e.g. slicing orders by priority while
    // committing only key+price): compute the slice first, then keep
    // payloadCols (all of df when empty)
    val keep = if (payloadCols.nonEmpty) payloadCols else df.columns.toSeq
    val payload = df.select(keep.map(col): _*)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$table/_tmp_s$nonce")
    df.withColumn("_slice", sliceOf.cast("int"))
      .select((keep :+ "_slice").map(col): _*)
      .repartition(nSlices, col("_slice"))
      .write.mode("overwrite").partitionBy("_slice").parquet(tmp.toString)
    f.mkdirs(new Path(s"$table/data"))
    val bySlice: Map[Int, Seq[Path]] =
      f.listStatus(tmp).filter(_.isDirectory).flatMap { d =>
        val sl = d.getPath.getName.stripPrefix("_slice=").toInt
        f.listStatus(d.getPath).map(_.getPath)
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
          .map(p => sl -> p)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val out = (0 until nSlices).map { i =>
      // adopted files take the standard v<version>_<i>_<nonce> names —
      // auditors (and the oracle) glob data files by that convention
      val v = currentVersion(spark, table) + 1
      val named = bySlice.getOrElse(i, Seq.empty).zipWithIndex.map { case (p, j) =>
        val rel = s"data/v${v}_${j}_$nonce.parquet"
        require(f.rename(p, new Path(s"$table/$rel")), s"rename failed for $p")
        rel
      }
      commitAs(payload, table, v, "append",
        statsCols = statsCols, preNamed = Some(named), dfIsPhysical = true)
    }
    f.delete(tmp, true)
    out
  }

  def stageWap(df: DataFrame, table: String, wapId: String): Seq[String] = {
    requireWapId(wapId)
    val spark = df.sparkSession
    val f = fs(spark, table)
    val v = currentVersion(spark, table)
    require(v < 1 || partColOf(spark, table, v).isEmpty,
      s"TxTable: $table has a partitioned layout — WAP staging writes flat " +
      "files; commit the batch directly")
    require(v < 1 || colMapOf(spark, table, v).isEmpty,
      s"TxTable: $table is column-mapped — WAP staging writes logical names " +
      "physically; commit the batch directly")
    if (v >= 1) manifestSchema(spark, table, v).foreach { parent =>
      require(schemaKey(parent) == schemaKey(df.schema),
        s"TxTable: staged schema mismatch at $table — head has " +
        s"${schemaKey(parent).map(p => p._1 + ":" + p._2).mkString("[", ", ", "]")} but the " +
        s"staged frame has ${schemaKey(df.schema).map(p => p._1 + ":" + p._2).mkString("[", ", ", "]")}")
    }
    require(!f.exists(stagedPath(table, wapId)),
      s"TxTable: batch '$wapId' is already staged at $table — publish or abandon it")
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(s"$table/_tmp_w${wapId}_$nonce")
    df.write.mode("overwrite").parquet(tmp.toString)
    f.mkdirs(new Path(s"$table/data"))
    val named = f.listStatus(tmp).map(_.getPath)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName).zipWithIndex
      .map { case (p, i) =>
        val rel = s"data/w_${wapId}_${i}_$nonce.parquet"
        require(f.rename(p, new Path(s"$table/$rel")), s"rename failed for $p")
        rel
      }.toSeq
    f.delete(tmp, true)
    val json = s"""{"wap":"${jesc(wapId)}",""" +
      s""""files":[${named.map("\"" + _ + "\"").mkString(",")}]}"""
    val out = f.create(stagedPath(table, wapId), false)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    named
  }

  /** The staged batch as a frame — the AUDIT surface: exactly the
    * files stage wrote, read back (what publish will adopt, not what
    * the caller remembers handing in).
    */
  def readWap(spark: SparkSession, table: String, wapId: String): DataFrame = {
    requireWapId(wapId)
    val files = parseFileArray(stagedText(fs(spark, table), table, wapId), "files")
    val paths = files.map(rel => s"$table/$rel")
    spark.read.schema(graft.core.ParquetFooters.schemaOf(spark, paths.head))
      .parquet(paths: _*)
  }

  /** Publish a staged batch: one append COMMIT whose data files are
    * the staged ones (adopted by reference — zero data IO; skipping
    * stats/blooms recompute from the staged footers/contents, the
    * metadata-scale cost every commit pays). Rides the full commit
    * machinery: schema gate against the CURRENT head (which may have
    * moved since stage), CAS + append rebase on conflicts (staged
    * files re-key to versioned names), and an exactly-once txn marker
    * (`_wap_<id>`) so a crash between CAS and staged-record cleanup
    * can never double-publish. Returns the published version.
    */
  def publishWap(spark: SparkSession, table: String, wapId: String,
                 statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
                 maxAttempts: Int = 20): Int = {
    requireWapId(wapId)
    val f = fs(spark, table)
    val appId = s"_wap_$wapId"
    txnVersionOf(spark, table, appId, 0L) match {
      case Some(v) => // already published; finish the cleanup half
        f.delete(stagedPath(table, wapId), false)
        v
      case None =>
        val add = parseFileArray(stagedText(f, table, wapId), "files")
        require(add.nonEmpty, s"TxTable: staged batch '$wapId' records no files")
        val head = currentVersion(spark, table)
        require(head < 1 || partColOf(spark, table, head).isEmpty,
          s"TxTable: $table gained a partitioned layout after staging — abandon '$wapId'")
        val addPaths = add.map(rel => s"$table/$rel")
        val df = spark.read
          .schema(graft.core.ParquetFooters.schemaOf(spark, addPaths.head))
          .parquet(addPaths: _*)
        val nv = commitAs(df, table, head + 1, "append",
          statsCols, txn = Some((appId, 0L)), bloomCols = bloomCols,
          rebaseAppend = true, maxAttempts = maxAttempts,
          dfIsPhysical = true, preNamed = Some(add))
        f.delete(stagedPath(table, wapId), false)
        nv
    }
  }

  /** Drop a staged batch that failed its audit: the staged record and
    * its files delete; the table never moved. Returns the removed
    * relative paths.
    */
  def abandonWap(spark: SparkSession, table: String, wapId: String): Seq[String] = {
    requireWapId(wapId)
    val f = fs(spark, table)
    val files = parseFileArray(stagedText(f, table, wapId), "files")
    files.foreach(rel => f.delete(new Path(s"$table/$rel"), false))
    f.delete(stagedPath(table, wapId), false)
    files
  }

  /** First-class transactional MERGE — the lakehouse MERGE INTO as an
    * API instead of a composition: apply a CDC feed (keyCol, seqCol,
    * opCol ∈ I/U/D + payload) onto the CURRENT snapshot via
    * [[graft.operators.Upsert.applyChanges]] and publish the result as
    * the next version (op "merge" — snapshot-replacing, so `changes()`
    * reads it as delete-of-parent + insert-of-result, like overwrite).
    *
    * Concurrency is the Delta MERGE retry semantics: losing the
    * version CAS means a concurrent writer changed the table between
    * this merge's read and its publish, so the already-computed frame
    * is STALE — the loser re-reads the new head and RE-MERGES (never
    * re-publishes stale bytes; that would silently drop the winner's
    * rows). The loop is bounded by `maxAttempts`, then fails loudly
    * with the competing version named.
    *
    * Scale shape per attempt: applyChanges is one feed-keyed window +
    * one key equi-join (feed broadcasts when small — the CDC norm),
    * the commit one distributed write; the retry recomputes only when
    * an actual conflict happened.
    *
    * @return (committed version, attempts used)
    */
  def mergeInto(spark: SparkSession, table: String, changes: DataFrame,
                keyCol: String, seqCol: String, opCol: String,
                statsCols: Seq[String] = Nil, maxAttempts: Int = 5): (Int, Int) = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    var out = -1
    while (out < 0) {
      attempt += 1
      val v = currentVersion(spark, table)
      require(v >= 1, s"TxTable: cannot merge into non-existent table $table")
      val merged = graft.operators.Upsert.applyChanges(
        readVersion(spark, table, v), changes, keyCol, seqCol, opCol)
      // a partitioned layout survives the snapshot-replacing merge
      // (same rule as the full compact: fresh files re-partition by
      // the logical column; the mapping resets)
      val partLogical = partColOf(spark, table, v).map { pc =>
        colMapOf(spark, table, v)
          .flatMap(_.collectFirst { case (n, p) if p == pc => n }).getOrElse(pc) }
      try out = commitAs(merged, table, v + 1, "merge", statsCols,
        partitionBy = partLogical)
      catch {
        case e: RuntimeException if e.getMessage != null &&
            e.getMessage.contains("commit conflict") && attempt < maxAttempts =>
          () // head moved — loop re-reads and re-merges
      }
    }
    (out, attempt)
  }

  /** Manifests are immutable once published (conditional-create
    * committer — a version file is never rewritten in place), so the
    * raw text caches safely; the scalar helpers below (op, ms, schema,
    * partCol, commitMs) each re-parse it, and a single snapshot read
    * consults several of them. Bounded like [[snapCache]]; [[drop]]
    * and version expiry invalidate the same way.
    */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  private def manifestText(spark: SparkSession, table: String, v: Int): String = {
    val key = (table, v)
    val hit = manifestCache.get(key)
    if (hit != null) return hit
    val in = fs(spark, table).open(manifestPath(table, v))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    if (manifestCache.size > 1024) manifestCache.clear()
    manifestCache.put(key, txt)
    txt
  }

  /** Whether version `v`'s snapshot requires a mergeSchema read
    * (sticky from the first `commitEvolve`; reset by overwrite).
    */
  private[graft] def msOf(spark: SparkSession, table: String, v: Int): Boolean =
    manifestText(spark, table, v).contains("\"ms\":1")

  /** Snapshot schema as recorded in version `v`'s manifest; None for
    * manifests written before the schema field existed.
    */
  private[graft] def manifestSchema(spark: SparkSession, table: String,
                                    v: Int): Option[org.apache.spark.sql.types.StructType] =
    "\"schema\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(manifestText(spark, table, v))
      .map(m => org.apache.spark.sql.types.StructType.fromDDL(junesc(m.group(1))))

  /** Additive schema evolution (the Delta `mergeSchema` append): the
    * new frame may ADD columns over the parent snapshot but must keep
    * every existing column at its exact type — drops and type changes
    * refuse loudly (they silently lose or corrupt data under a footer
    * union; an intentional rewrite goes through `overwrite`). The
    * committed snapshot mixes old and new footers; the manifest's
    * sticky `ms` flag routes every later read of this table through
    * mergeSchema, so rows from pre-evolution files surface the new
    * columns as NULL — exactly the SQL ALTER TABLE ADD COLUMN
    * semantics. Costs one footer read per file at plan time for
    * evolved tables only.
    */
  def commitEvolve(df: DataFrame, table: String,
                   statsCols: Seq[String] = Nil): Int = {
    val spark = df.sparkSession
    val v = currentVersion(spark, table)
    if (v == 0) return commitAs(df, table, 1, "append", statsCols)
    val parent = readVersion(spark, table, v).schema
    val newTypes = schemaKey(df.schema).toMap
    val missing = schemaKey(parent).filterNot { case (n, t) =>
      newTypes.get(n).contains(t) }
    require(missing.isEmpty,
      s"TxTable: commitEvolve at $table v${v + 1} is not additive — parent columns " +
      s"${missing.map(p => p._1 + ":" + p._2).mkString("[", ", ", "]")} are dropped or " +
      "retyped in the new frame; evolution may only ADD columns (use op=\"overwrite\" " +
      "for a rewrite)")
    commitAs(df, table, v + 1, "evolve", statsCols)
  }

  /** The op recorded in version `v`'s manifest. */
  def opOf(spark: SparkSession, table: String, v: Int): String =
    "\"op\":\"(.*?)\"".r.findFirstMatchIn(manifestText(spark, table, v))
      .getOrElse(sys.error(s"TxTable: malformed manifest v$v at $table")).group(1)

  /** Commit time (epoch ms) of version `v` — strictly increasing with
    * the version by the commit protocol. Pre-timestamp manifests read
    * as 0 (epoch) so an old table stays time-travelable to "ever".
    */
  def commitMsOf(spark: SparkSession, table: String, v: Int): Long =
    "\"commit_ms\":(\\d+)".r.findFirstMatchIn(manifestText(spark, table, v))
      .map(_.group(1).toLong).getOrElse(0L)

  /** Timestamp time travel (Delta's `timestampAsOf`): the snapshot the
    * table showed at `tsMs` — the LARGEST live version whose commit
    * time is ≤ tsMs. Strict commit-time monotonicity (enforced at
    * commit) makes the resolution unambiguous even for commits landing
    * in the same wall millisecond. Refuses loudly before the first
    * commit rather than returning an empty frame.
    */
  def readAsOf(spark: SparkSession, table: String, tsMs: Long): DataFrame = {
    val vs = liveVersions(spark, table)
    require(vs.nonEmpty, s"TxTable: no versions at $table")
    val at = vs.filter(v => commitMsOf(spark, table, v) <= tsMs)
    require(at.nonEmpty,
      s"TxTable: no version of $table existed at ts=$tsMs " +
      s"(earliest commit ${commitMsOf(spark, table, vs.min)})")
    readVersion(spark, table, at.max)
  }

  /** The version history as a DataFrame — (version, op, n_files).
    * Expired versions no longer appear.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    liveVersions(spark, table).map { v =>
      (v, opOf(spark, table, v), filesOf(spark, table, v).size)
    }.toDF("version", "op", "n_files")
  }

  /** Change-data read: every row inserted or deleted between versions
    * `fromV` (exclusive) and `toV` (inclusive), tagged with
    * (_change ∈ insert|delete, _version). `fromV = 0` replays the
    * table from its beginning.
    *
    * This is the incremental-consumption half of the snapshot layer
    * (Delta's CDF shape, derived instead of logged): a downstream
    * consumer keeps only its last-seen version number and each poll
    * costs ONLY the delta, never a snapshot rescan. The file-set
    * manifest makes that derivation exact and cheap:
    *  - an APPEND commit's inserts are precisely the files the
    *    manifest added over its parent — the read touches only those
    *    new files, so consuming a 100 TB table's hourly appends reads
    *    hourly volume, not 100 TB;
    *  - an OVERWRITE commit replaces the snapshot wholesale, so its
    *    changes are deletes of every parent file + inserts of every
    *    new file — the two snapshot reads are unavoidable without a
    *    row-level change log, and that cost sits exactly where the
    *    semantics put it (row-level MERGE deltas belong to
    *    `Upsert.diffSnapshots`, which this composes with).
    * Rows are NOT deduplicated across versions: a row appended at v2
    * and deleted by an overwrite at v3 appears twice, once per event —
    * that is what makes the stream replayable into any consumer.
    * COMPACT commits are skipped: they rewrite bytes, not rows (the
    * `dataChange=false` rule), so consumers never re-see a compacted
    * snapshot as churn.
    */
  def changes(spark: SparkSession, table: String, fromV: Int, toV: Int): DataFrame = {
    require(fromV >= 0 && toV > fromV, s"need 0 <= fromV < toV, got ($fromV, $toV)")
    require(toV <= currentVersion(spark, table), s"TxTable: no version $toV at $table")
    // each step's rows surface through the SNAPSHOT SEMANTICS of the
    // version where they are visible (inserts: v; deletes: v-1):
    // tombstone-filtered so merge-on-read-deleted rows neither
    // re-insert nor re-delete, and projected through that version's
    // column mapping so consumers always see logical names
    def projectVia(atV: Int)(dfr: DataFrame): DataFrame =
      colMapOf(spark, table, atV).fold(dfr) { m =>
        dfr.select(m.collect {
          case (n, p) if dfr.columns.contains(p) => col(p).as(n) }: _*)
      }
    def readFiles(files: Seq[String], atV: Int): Option[DataFrame] =
      if (files.isEmpty) None
      else Some(dropHidden(projectVia(atV)(morFilter(spark, table, atV,
        rawRead(spark, table, atV, files)))))
    val steps = ((fromV + 1) to toV).flatMap { v =>
      val prev = if (v == 1) Seq.empty else filesOf(spark, table, v - 1)
      val cur = filesOf(spark, table, v)
      opOf(spark, table, v) match {
        // byte rewrite / metadata-only: no row change (dataChange=false)
        case "compact" | "rename" | "drop" => Seq.empty
        // merge-on-read delete: the delta is exactly the NEW tombstone
        // (file, key) pairs resolved against the files they reference —
        // the read touches ONLY those files, never the snapshot
        case "posdelete" =>
          // the delta is exactly the NEW deletion-vector pairs,
          // resolved against the files they reference
          val newPosd = posDeletesOf(spark, table, v)
            .diff(posDeletesOf(spark, table, v - 1))
          if (newPosd.isEmpty) Seq.empty
          else {
            val posPaths = newPosd.map(rel => dataPath(table, rel))
            val pairs = spark.read
              .schema(graft.core.ParquetFooters.schemaOf(spark, posPaths.head))
              .parquet(posPaths: _*)
              .select(col("_gf").as("_graft_pf"), col("_gp").as("_graft_pp"))
            val touched = pairs.select("_graft_pf").distinct()
              .collect().map(_.getString(0)).toSeq // file NAMES: metadata-scale
            if (touched.isEmpty) Seq.empty
            else {
              val relOf = filesOf(spark, table, v)
                .map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
              val raw = rawRead(spark, table, v, touched.map(relOf))
                .withColumn("_graft_fn",
                  element_at(split(col("_metadata.file_path"), "/"), -1))
                .withColumn("_graft_ri", col("_metadata.row_index"))
              Seq(dropHidden(projectVia(v)(
                raw.join(pairs, raw("_graft_fn") === col("_graft_pf") &&
                  raw("_graft_ri") === col("_graft_pp"), "left_semi")
                  .drop("_graft_fn", "_graft_ri")))
                .withColumn("_change", lit("delete"))
                .withColumn("_version", lit(v)))
            }
          }
        case "mordelete" =>
          val newTombs = tombEntriesOf(spark, table, v)
            .diff(tombEntriesOf(spark, table, v - 1))
          newTombs.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (k, es) =>
            val sidePaths = es.map(e => dataPath(table, e._1)).distinct
            val keys = spark.read
              .schema(graft.core.ParquetFooters.schemaOf(spark, sidePaths.head))
              .parquet(sidePaths: _*)
              .select(col("_gf").as("_graft_tf"), col("_gk").as("_graft_tk"))
            val touched = keys.select("_graft_tf").distinct()
              .collect().map(_.getString(0)).toSeq // file NAMES: metadata-scale
            if (touched.isEmpty) None
            else {
              // resolve sidecar file NAMES to manifest-relative paths
              // (partitioned layouts nest files under <col>=<val>/)
              val relOf = filesOf(spark, table, v)
                .map(r => r.substring(r.lastIndexOf('/') + 1) -> r).toMap
              val raw = rawRead(spark, table, v, touched.map(relOf))
                .withColumn("_graft_fn",
                  element_at(split(col("_metadata.file_path"), "/"), -1))
              Some(dropHidden(projectVia(v)(
                raw.join(keys, raw("_graft_fn") === col("_graft_tf") &&
                  raw(k) === col("_graft_tk"), "left_semi").drop("_graft_fn")))
                .withColumn("_change", lit("delete"))
                .withColumn("_version", lit(v)))
            }
          }
        case op =>
          val (ins, del) =
            if (op == "append" || op == "evolve") (cur.diff(prev), Seq.empty[String])
            // copy-on-write delete/update: carried files are identical
            // in both snapshots — churn is exactly the rewritten subset
            // (delete-of-candidates + insert-of-survivors/rewrites)
            else if (op == "delete" || op == "update") (cur.diff(prev), prev.diff(cur))
            else (cur, prev) // overwrite/merge/restore: full snapshot replace
          readFiles(ins, v).map(
            _.withColumn("_change", lit("insert")).withColumn("_version", lit(v))) ++
            readFiles(del, v - 1).map(
              _.withColumn("_change", lit("delete")).withColumn("_version", lit(v)))
      }
    }
    if (steps.isEmpty) // e.g. a compact-only interval: a legitimate empty delta
      changesSchemaFrame(spark, table, toV)
    // allowMissingColumns: steps straddling a schema evolution differ
    // by the added columns — pre-evolution rows surface them as NULL
    // (no-op for uniform-schema tables)
    else steps.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def changesSchemaFrame(spark: SparkSession, table: String, v: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    readVersion(spark, table, v).limit(0)
      .withColumn("_change", lit("insert")).withColumn("_version", lit(v))
  }

  /** OPTIMIZE: rewrite the current snapshot into ~`targetBytes` files
    * and publish the result as the next version (op "compact" — a
    * content-preserving overwrite). Time travel to pre-compaction
    * versions still works (their files are immutable and untouched)
    * until `expireVersions` reclaims them.
    *
    * The rewrite is the standard small-file remedy at scale: the data
    * plane is one distributed read→repartition→write of the CURRENT
    * snapshot only (never history), and the file count is derived from
    * the manifest's own byte accounting, so a 100 TB table compacts in
    * snapshot-sized work with the usual exchange. Returns the new
    * version.
    */
  def compact(spark: SparkSession, table: String, targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: nothing to compact at $table")
    val f = fs(spark, table)
    val totalBytes = filesOf(spark, table, v)
      .map(rel => f.getFileStatus(new Path(dataPath(table, rel))).getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // a partitioned layout survives the full rewrite: the fresh files
    // re-partition by the LOGICAL column (the mapping resets, so
    // logical == physical afterwards — same rule as the column map)
    val partLogical = partColOf(spark, table, v).map { pc =>
      colMapOf(spark, table, v)
        .flatMap(_.collectFirst { case (n, p) if p == pc => n }).getOrElse(pc) }
    commitAs(readVersion(spark, table, v).repartition(nOut), table, v + 1,
      "compact", partitionBy = partLogical)
  }

  /** HIDDEN transform partitioning (Iceberg's "hidden partitioning"):
    * the layout column is DERIVED from a source column by a recorded
    * transform and never enters the logical schema — users write and
    * query the SOURCE column; the engine derives the layout value at
    * commit, prunes by transforming the probe, and drops the derived
    * column on read. The transform is encoded in the partition column
    * NAME (`_gpt-<kind>-<srcPhysicalCol>`), so it rides every existing
    * manifest / restore / compact / delta-log path with no new
    * manifest field. Supported kinds:
    *  - `bucket16`: first hex nibble of md5 of the source's string
    *    rendering — 16 buckets, engine-portable (the oracle and any
    *    auditor recompute it from the data alone);
    *  - `day`: yyyy-MM-dd of a timestamp — dir values sort
    *    lexicographically, so range pruning is a string between.
    * The spec names the PHYSICAL source column (physical names never
    * change once written — rename stays metadata-only), and
    * [[renameColumn]]/[[dropColumn]] refuse on the source of a live
    * hidden layout.
    */
  private[graft] val HiddenPrefix = "_gpt-"

  private[graft] def hiddenSpecOf(pc: String): Option[(String, String)] =
    if (!pc.startsWith(HiddenPrefix)) None
    else pc.stripPrefix(HiddenPrefix).split("-", 2) match {
      case Array(kind, src) if (kind == "bucket16" || kind == "day") && src.nonEmpty =>
        Some((kind, src))
      case _ => None
    }

  private def hiddenColOf(pc: String): Column = hiddenSpecOf(pc) match {
    case Some(("bucket16", src)) => substring(md5(col(src).cast("string")), 1, 1)
    case Some(("day", src)) => date_format(col(src), "yyyy-MM-dd")
    case _ => sys.error(s"TxTable: not a hidden partition column: $pc")
  }

  /** Driver-side mirror of the transform for point pruning: the
    * directory value a probe key lands in.
    */
  private[graft] def hiddenValueOf(pc: String, key: String): String =
    hiddenSpecOf(pc) match {
      case Some(("bucket16", _)) =>
        "%02x".format(java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8")).head & 0xff).take(1)
      case Some(("day", _)) => key.take(10)
      case _ => sys.error(s"TxTable: not a hidden partition column: $pc")
    }

  /** Drop any hidden layout columns a raw/hive read surfaced. */
  private def dropHidden(df: DataFrame): DataFrame = {
    val h = df.columns.filter(c => hiddenSpecOf(c).isDefined)
    if (h.isEmpty) df else df.drop(h.toIndexedSeq: _*)
  }

  /** HIDDEN-partition point read: files of the ONE partition the
    * probe key's transform lands in, selected from the manifest list
    * alone — the caller applies the exact source-column predicate on
    * the (1/N-sized) result. The bucket analogue of [[readPartition]]:
    * the user never sees or names the layout column.
    */
  def readHiddenPoint(spark: SparkSession, table: String, key: String,
                      version: Int = -1): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, table)
    val pc = partColOf(spark, table, v).getOrElse(
      sys.error(s"TxTable: $table v$v has no partitioned layout"))
    require(hiddenSpecOf(pc).isDefined,
      s"TxTable: $table is identity-partitioned — use readPartition")
    readPartition(spark, table, hiddenValueOf(pc, key), v)
  }

  /** PARTITION-RANGE read over the directory values, inclusive both
    * ends — dir values compare lexicographically (ISO days, hex
    * nibbles), so a day-partitioned time-range read plans exactly the
    * in-range partitions' files from the manifest alone.
    */
  def readPartitionRange(spark: SparkSession, table: String, lo: String,
                         hi: String, version: Int = -1): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, table)
    val pc = partColOf(spark, table, v).getOrElse(
      sys.error(s"TxTable: $table v$v has no partitioned layout"))
    val prefix = s"data/$pc="
    val mine = filesOf(spark, table, v).filter { rel =>
      rel.startsWith(prefix) && {
        val seg = rel.substring(prefix.length, rel.indexOf('/', prefix.length))
        val value = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(seg)
        value >= lo && value <= hi
      }
    }
    if (mine.isEmpty) readVersion(spark, table, v).limit(0)
    else snapshotRead(spark, table, v, mine)
  }

  /** Escaped hive directory segment for one partition value — the
    * exact escaping Spark's `partitionBy` writer used, so the manifest
    * path match is byte-exact for any value.
    */
  private def partDirOf(pc: String, value: String): String =
    s"data/$pc=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(value)

  /** PARTITION-PRUNED READ: exactly the named partition's files,
    * selected from the manifest file list alone (the hive partition-
    * pruning effect — a per-partition read plans and reads the
    * partition's files, never the snapshot). `value` matches the
    * partition column's STRING rendering (the directory name).
    */
  def readPartition(spark: SparkSession, table: String, value: String,
                    version: Int = -1): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, table)
    val pc = partColOf(spark, table, v).getOrElse(
      sys.error(s"TxTable: $table v$v has no partitioned layout — commit with " +
        "partitionBy, or use readWhereValue (value-set skipping)"))
    val dir = partDirOf(pc, value) + "/"
    val mine = filesOf(spark, table, v).filter(_.startsWith(dir))
    if (mine.isEmpty) readVersion(spark, table, v).limit(0)
    else snapshotRead(spark, table, v, mine)
  }

  /** PER-PARTITION OPTIMIZE: rewrite ONLY one partition's files into
    * ~`targetBytes` outputs; every other partition carries by
    * reference (zero IO). The scheduled maintenance unit for a
    * partitioned streaming-ingest table — each partition compacts on
    * its own cadence, and concurrent compaction of DISJOINT partitions
    * only conflicts at the (retry-able) version CAS, never on data.
    *
    * @return (version, nRewritten, nCarried) — version unchanged with
    *         nRewritten = 0 when the partition has fewer than 2 files
    */
  def compactPartition(spark: SparkSession, table: String, value: String,
                       targetBytes: Long = 128L << 20): (Int, Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: nothing to compact at $table")
    val pc = partColOf(spark, table, v).getOrElse(
      sys.error(s"TxTable: $table v$v has no partitioned layout"))
    val dir = partDirOf(pc, value) + "/"
    val (mine, others) = filesOf(spark, table, v).partition(_.startsWith(dir))
    if (mine.size < 2) return (v, 0, others.size)
    val f = fs(spark, table)
    val bytes = mine.map(rel => f.getFileStatus(new Path(dataPath(table, rel))).getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val packed = morFilter(spark, table, v,
        rawRead(spark, table, v, mine))
      .repartition(nOut)
    val nv = commitAs(packed, table, v + 1, "compact",
      carryFiles = Some(others), dfIsPhysical = true)
    (nv, mine.size, others.size)
  }

  /** Incremental OPTIMIZE (the real Delta semantic — [[compact]] is
    * the full-snapshot rewrite): ONLY files under `minBytes` are read
    * and re-binned into ~`targetBytes` outputs; everything already
    * well-sized carries by reference. This is what runs on a schedule
    * against a streaming-ingested table: each micro-batch commit left
    * a small file, and the nightly OPTIMIZE must not rewrite the
    * terabytes that are already fine. Content-preserving op "compact"
    * (dataChange=false — `changes()` skips it); carried files keep
    * their skipping stats; evolved tables rewrite through mergeSchema.
    *
    * @return (version, nRewritten, nCarried) — version unchanged with
    *         nRewritten = 0 when fewer than 2 small files exist (a
    *         single small file gains nothing; Delta's no-op rule)
    */
  def compactSmall(spark: SparkSession, table: String, minBytes: Long,
                   targetBytes: Long = 128L << 20,
                   statsCols: Seq[String] = Nil): (Int, Int, Int) = {
    require(minBytes > 0 && targetBytes > 0,
      s"minBytes/targetBytes must be positive, got ($minBytes, $targetBytes)")
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: nothing to compact at $table")
    val f = fs(spark, table)
    val sized = filesOf(spark, table, v)
      .map(rel => rel -> f.getFileStatus(new Path(dataPath(table, rel))).getLen)
    val (small, big) = sized.partition(_._2 < minBytes)
    if (small.size < 2) return (v, 0, sized.size)
    val smallBytes = small.map(_._2).sum
    val nOut = math.max(1L, (smallBytes + targetBytes - 1) / targetBytes).toInt
    // the rewrite APPLIES merge-on-read tombstones (rebinned rows get
    // new file names, outside the per-file tombstone scope); tombs for
    // the carried files ride the carry rule in commitAs
    val packed = morFilter(spark, table, v,
        rawRead(spark, table, v, small.map(_._1)))
      .repartition(nOut)
    val nv = commitAs(packed, table, v + 1, "compact", statsCols,
      carryFiles = Some(big.map(_._1)), dfIsPhysical = true)
    (nv, small.size, big.size)
  }

  /** Drop the whole table (tests / rebuild-from-scratch pipelines).
    * Invalidates the table's cached snapshots — the same path may be
    * recreated with new content at the same version numbers.
    */
  def drop(spark: SparkSession, table: String): Unit = {
    val p = new Path(table)
    val f = fs(spark, table)
    if (f.exists(p)) f.delete(p, true)
    // the recursive delete also removes NESTED table roots (branch
    // lines under _refs_branch/<name>) — their snapshots must leave
    // the cache too, or a re-created branch at the same path resolves
    // to the dropped generation's file list (stale-cache read of
    // files that no longer exist)
    val pfx = table + "/"
    snapCache.keySet.removeIf(k => k._1 == table || k._1.startsWith(pfx))
    manifestCache.keySet.removeIf(k => k._1 == table || k._1.startsWith(pfx))
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
    // tombstone sidecars are referenced files too — vacuuming a live
    // sidecar would resurrect its deleted rows; WAP-staged files are
    // referenced by their staged record until published or abandoned
    val stagedDir = new Path(s"$table/_staged")
    val staged: Seq[String] =
      if (!f.exists(stagedDir)) Seq.empty
      else f.listStatus(stagedDir).toSeq.filter(_.getPath.getName.endsWith(".json"))
        .flatMap { st =>
          val wapId = st.getPath.getName.stripSuffix(".json")
          scala.util.Try(parseFileArray(stagedText(f, table, wapId), "files"))
            .getOrElse(Seq.empty)
        }
    val referenced = (liveVersions(spark, table)
      .flatMap(v => filesOf(spark, table, v) ++
        tombEntriesOf(spark, table, v).map(_._1) ++
        posDeletesOf(spark, table, v)) ++ staged).toSet
    // one level of partition directories (data/<col>=<val>/file)
    f.listStatus(dataDir).toSeq.flatMap { st =>
      if (st.isDirectory)
        f.listStatus(st.getPath).toSeq
          .map(c => s"data/${st.getPath.getName}/${c.getPath.getName}")
      else Seq(s"data/${st.getPath.getName}")
    }.filterNot(referenced).sorted
  }

  /** Target version encoded in a data-file name (`v<N>_<i>_<nonce>`),
    * None for files the commit protocol didn't name.
    */
  private def fileVersion(name: String): Option[Int] =
    "^v(\\d+)_".r.findFirstMatchIn(name).map(_.group(1).toInt)

  /** Delete orphan data files (failed/lost-race commits, pruned
    * history) — the standing maintenance job. Returns the deleted
    * relative paths.
    *
    * An unreferenced file is NOT proof of a dead file: `commitAs`
    * renames data files into `data/` BEFORE publishing the manifest,
    * so every in-flight commit's files are momentarily orphans by the
    * listing's lights — an unguarded vacuum racing a commit would
    * delete files whose manifest is about to publish, corrupting that
    * version unreadably. Two independent guards close the window
    * (Delta's retention-window idea, plus what our versioned names
    * make possible):
    *  - IN-FLIGHT SKIP: a file whose encoded target version exceeds
    *    the current head belongs to a commit that hasn't published
    *    yet — never touched, regardless of age. (If that writer
    *    crashed, its files are reclaimed as soon as a later commit
    *    advances the head past their version.)
    *  - AGE GATE: only files at least `minAgeMs` old are deleted
    *    (default 24 h), covering clock-skewed stores and the loser of
    *    a same-version race whose files carry version ≤ head. Pass 0
    *    only when no commit can be concurrently in flight.
    */
  def vacuum(spark: SparkSession, table: String,
             minAgeMs: Long = 24L * 3600 * 1000): Seq[String] = {
    require(minAgeMs >= 0, s"minAgeMs must be >= 0, got $minAgeMs")
    val f = fs(spark, table)
    val head = currentVersion(spark, table)
    val now = System.currentTimeMillis()
    val dead = orphans(spark, table).filter { rel =>
      val inFlight =
        fileVersion(rel.substring(rel.lastIndexOf('/') + 1)).exists(_ > head)
      !inFlight && (try {
        now - f.getFileStatus(new Path(s"$table/$rel")).getModificationTime >= minAgeMs
      } catch { case _: java.io.FileNotFoundException => false }) // a racing vacuum got it
    }
    dead.foreach(rel => f.delete(new Path(s"$table/$rel"), false))
    dead
  }

  /** Expire history: drop every manifest older than the newest
    * `keepLast` versions, then delete data files only the dropped
    * manifests referenced. Time travel to expired versions fails
    * loudly afterwards (their manifests are gone); the kept versions
    * are untouched — their files are immutable and still fully
    * referenced. This is the retention half vacuum alone can't do:
    * after an overwrite/compact, the replaced snapshot's bytes are
    * reclaimable only once its manifest is out of the retention
    * window. Returns (expired manifests, deleted data files).
    */
  def expireVersions(spark: SparkSession, table: String, keepLast: Int): (Seq[Int], Seq[String]) = {
    require(keepLast >= 1, s"must keep at least the current version, got $keepLast")
    val f = fs(spark, table)
    val live = liveVersions(spark, table)
    val head = live.foldLeft(0)(math.max)
    val cut = head - keepLast // expire live versions <= cut
    // CHECKPOINT BOUNDARY: a delta manifest reconstructs through its
    // contiguous parent chain down to its base checkpoint — expiring
    // any link of a KEPT version's chain would strand that version
    // unreadably. The oldest kept version's chain floor bounds what
    // may expire; the CheckpointEvery cadence keeps the extra
    // retention under one checkpoint interval of (small) manifests.
    def chainFloorOf(v: Int): Int = {
      var cur = v
      var base = deltaBaseOf(manifestText(spark, table, cur))
      while (base.isDefined) { cur = base.get
        base = deltaBaseOf(manifestText(spark, table, cur)) }
      cur
    }
    val floor = live.filter(_ > cut).minOption.fold(head)(chainFloorOf)
    // REF PROTECTION: versions pinned by a tag or serving as a branch
    // base stay readable (and keep their files below) however old —
    // expiring a tagged release or a live branch's borrowed base is
    // the silent-data-loss shape refs exist to prevent. A pinned
    // version that is itself a delta keeps its chain via chainFloorOf.
    val pinned = refsOf(spark, table).map(_._3).toSet
    val pinnedFloor = pinned.map(chainFloorOf).minOption.getOrElse(Int.MaxValue)
    val (expire, keep) = live.partition(v =>
      v <= cut && v < floor && v < pinnedFloor && !pinned.contains(v))
    if (expire.isEmpty) return (Seq.empty, Seq.empty)
    val keptFiles = keep.flatMap(v => filesOf(spark, table, v) ++
      tombEntriesOf(spark, table, v).map(_._1) ++
      posDeletesOf(spark, table, v)).toSet
    val deadFiles = expire.flatMap(v => filesOf(spark, table, v) ++
      tombEntriesOf(spark, table, v).map(_._1) ++
      posDeletesOf(spark, table, v))
      .distinct.filterNot(keptFiles).sorted
    // Order matters for crash safety: drop manifests FIRST so no
    // reader can resolve a version whose files are mid-delete; a crash
    // between the two phases leaves orphans, which vacuum reclaims.
    expire.foreach { v =>
      f.delete(manifestPath(table, v), false)
      snapCache.remove((table, v)) // expired versions must fail loudly
      manifestCache.remove((table, v))
    }
    deadFiles.foreach(rel => f.delete(new Path(s"$table/$rel"), false))
    (expire, deadFiles)
  }

  // ------------------------------------------------------------------
  // Named refs: TAGS and BRANCHES (the Iceberg refs surface).
  // A ref is a tiny JSON file under $table/_refs/<name>.json published
  // through the SAME conditional-create committer as manifests, so ref
  // creation is atomic and race-safe on every store the table itself
  // supports. A TAG pins a version immutably (releases, eval
  // snapshots, "the corpus we trained v3 on"); a BRANCH forks an
  // independent commit line from a pinned base via the shallow-clone
  // machinery (zero data IO at any size) and can later FAST-FORWARD
  // back onto main when main has not advanced. Both ref kinds protect
  // their pinned version from [[expireVersions]].
  // ------------------------------------------------------------------

  private def refsDir(table: String) = new Path(s"$table/_refs")
  private def refPath(table: String, name: String) =
    new Path(s"$table/_refs/$name.json")

  private def requireRefName(name: String): Unit =
    require(name.nonEmpty &&
        name.forall(c => c.isLetterOrDigit || c == '-' || c == '_'),
      s"TxTable: ref name must be [A-Za-z0-9_-]+, got '$name'")

  /** The independent commit line a branch ref names. Lives INSIDE the
    * table directory (one blast radius for drop/backup) but outside
    * data/ and _manifests/, so the main line's vacuum, orphan
    * accounting, and version expiry never see branch files.
    */
  private[graft] def branchRoot(table: String, name: String): String =
    s"$table/_refs_branch/$name"

  /** Pin `version` (default: the current head) under an immutable
    * named tag. Refuses an existing name — a tag that can move is a
    * branch; drop and re-create to re-point deliberately.
    */
  def createTag(spark: SparkSession, table: String, name: String,
                version: Int = -1): Int = {
    requireRefName(name)
    val v = if (version > 0) version else currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot tag non-existent table $table")
    val f = fs(spark, table)
    require(f.exists(manifestPath(table, v)),
      s"TxTable: cannot tag expired/unknown version $v at $table")
    f.mkdirs(refsDir(table))
    if (!committerFor(f).publish(f, refPath(table, name),
        s"""{"kind":"tag","v":$v}""",
        java.util.UUID.randomUUID().toString.take(8)))
      sys.error(s"TxTable: ref '$name' already exists at $table — " +
        "refs are immutable; dropRef first to re-point deliberately")
    v
  }

  /** All refs of the table as (name, kind, pinned version). */
  def refsOf(spark: SparkSession, table: String): Seq[(String, String, Int)] = {
    val f = fs(spark, table)
    val d = refsDir(table)
    if (!f.exists(d)) return Seq.empty
    val re = """\{"kind":"(tag|branch)","v":(\d+)\}""".r
    f.listStatus(d).toSeq.filter(_.getPath.getName.endsWith(".json"))
      .flatMap { st =>
        val txt = {
          val in = f.open(st.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        }
        re.findFirstMatchIn(txt).map(m =>
          (st.getPath.getName.stripSuffix(".json"), m.group(1),
            m.group(2).toInt))
      }.sortBy(_._1)
  }

  /** (kind, pinned version) of one ref; loud on a missing name. */
  def refOf(spark: SparkSession, table: String,
            name: String): (String, Int) = {
    requireRefName(name)
    refsOf(spark, table).collectFirst { case (n, k, v) if n == name => (k, v) }
      .getOrElse(sys.error(s"TxTable: no ref '$name' at $table"))
  }

  /** Snapshot read of a ref: a tag reads its pinned main version; a
    * branch reads the branch line's current head.
    */
  def readRef(spark: SparkSession, table: String, name: String): DataFrame =
    refOf(spark, table, name) match {
      case ("tag", v) => readVersion(spark, table, v)
      case ("branch", _) => read(spark, branchRoot(table, name))
      case (k, _) => sys.error(s"TxTable: unknown ref kind '$k'")
    }

  /** Drop a ref (and a branch ref's entire commit line). The pinned
    * main version loses its expiry protection, nothing else.
    */
  def dropRef(spark: SparkSession, table: String, name: String): Unit = {
    requireRefName(name)
    val f = fs(spark, table)
    refsOf(spark, table).find(_._1 == name).foreach { case (_, kind, _) =>
      if (kind == "branch") drop(spark, branchRoot(table, name))
      f.delete(refPath(table, name), false)
    }
  }

  /** Fork an independent commit line from `version` (default head).
    * The branch's v1 is a SHALLOW CLONE of the base snapshot —
    * zero data IO — and its later commits land under the branch root,
    * invisible to main; main's later commits are invisible to the
    * branch (it pinned its base). The ref records the base version,
    * which [[expireVersions]] then protects (the branch borrows the
    * base's files). Commit to the branch through [[branchPath]] with
    * the normal table API — a branch IS a table.
    */
  def createBranch(spark: SparkSession, table: String, name: String,
                   version: Int = -1): Int = {
    requireRefName(name)
    val v = if (version > 0) version else currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot branch non-existent table $table")
    val root = branchRoot(table, name)
    // a crash between clone and ref publish leaves an orphan branch
    // dir with no ref — clear it so the retry isn't stuck on the
    // clone's fresh-target requirement
    if (refsOf(spark, table).forall(_._1 != name) &&
        currentVersion(spark, root) > 0)
      drop(spark, root)
    cloneShallow(spark, table, root, v)
    val f = fs(spark, table)
    f.mkdirs(refsDir(table))
    if (!committerFor(f).publish(f, refPath(table, name),
        s"""{"kind":"branch","v":$v}""",
        java.util.UUID.randomUUID().toString.take(8))) {
      drop(spark, root)
      sys.error(s"TxTable: ref '$name' already exists at $table")
    }
    v
  }

  /** The branch line's table root, for committing with the normal
    * API; loud when the ref is missing or names a tag.
    */
  def branchPath(spark: SparkSession, table: String, name: String): String = {
    val (kind, _) = refOf(spark, table, name)
    require(kind == "branch", s"TxTable: ref '$name' is a $kind, not a branch")
    branchRoot(table, name)
  }

  /** Publish the branch's current snapshot onto main as ONE commit —
    * Iceberg's fast-forward: legal only while main still sits at the
    * branch's base version (no divergence; a diverged main needs a
    * real merge, which this deliberately refuses rather than guesses).
    * Zero data IO: files the branch borrowed from main re-relativize
    * into main's own manifest; files the branch wrote itself are
    * borrowed by absolute path (main's compact later materializes
    * them, exactly the clone contract). Stats, blooms, value sets,
    * tombstones, deletion vectors, row counts, and the column mapping
    * carry with their files, so the fast-forwarded snapshot reads
    * bit-identically to the branch head.
    */
  def fastForward(spark: SparkSession, table: String, name: String): Int = {
    val (kind, baseV) = refOf(spark, table, name)
    require(kind == "branch", s"TxTable: ref '$name' is a $kind, not a branch")
    val head = currentVersion(spark, table)
    require(head == baseV,
      s"TxTable: cannot fast-forward '$name' — $table advanced v$baseV -> " +
      s"v$head since the branch was cut; merge the lines explicitly")
    val br = branchRoot(table, name)
    val bv = currentVersion(spark, br)
    val snap = snapshotOf(spark, br, bv)
    val prefix = s"$table/"
    def back(pth: String): String =
      if (pth.startsWith(prefix)) pth.substring(prefix.length)
      else if (pth.startsWith("/")) pth
      else s"$br/$pth"
    val v = head + 1
    val parentMs = try commitMsOf(spark, table, head)
      catch { case _: java.io.FileNotFoundException => 0L }
    val ts = math.max(System.currentTimeMillis(), parentMs + 1L)
    val schemaDDL = manifestSchema(spark, br, bv)
      .orElse(scala.util.Try(read(spark, br).schema).toOption)
      .map(_.toDDL)
    val json = renderManifest(v, "fast_forward", ts, "", msOf(spark, br, bv),
      schemaDDL,
      snap.files.map(back),
      snap.stats.map(e => (back(e._1), e._2, e._3, e._4)),
      snap.blooms.map(e => (back(e._1), e._2, e._3, e._4, e._5)),
      snap.tombs.map(e => (back(e._1), e._2)),
      colMapOf(spark, br, bv),
      snap.vsets.map(e => (back(e._1), e._2, e._3)),
      None,
      snap.posd.map(back),
      snap.rows.map(e => (back(e._1), e._2)))
    publishOrConflict(fs(spark, table), table, v, json)
    v
  }

  /** Per-file null counts of `colName` at version `v` (entries ride
    * the stats array under '<col>#nulls'); files committed without
    * null tracking are absent.
    */
  def nullCountsOf(spark: SparkSession, table: String, v: Int,
                   colName: String): Map[String, Long] = {
    val key = physOf(colMapOf(spark, table, v), colName) + "#nulls"
    statsOf(spark, table, v)
      .collect { case (fl, c, lo, _) if c == key => fl -> lo.toLong }.toMap
  }

  /** NULL-predicate file skipping (Delta's nullCount stats): for
    * IS NULL, a file recording ZERO nulls cannot match; for
    * IS NOT NULL, a file whose null count equals its recorded row
    * count is all-null and cannot match (positional deletes only
    * remove rows, so both prunes stay conservative). Files without a
    * recorded count (or, for the all-null test, without a row count)
    * are always kept.
    */
  def prunedFilesByNull(spark: SparkSession, table: String, v: Int,
                        colName: String, wantNull: Boolean): Seq[String] = {
    val nulls = nullCountsOf(spark, table, v, colName)
    val rows = rowCountsOf(spark, table, v).toMap
    filesOf(spark, table, v).filter { fl =>
      nulls.get(fl) match {
        case None => true
        case Some(n) =>
          if (wantNull) n > 0
          else rows.get(fl).forall(rc => n < rc)
      }
    }
  }

  /** IS [NOT] NULL read with null-count file skipping: reads only the
    * files [[prunedFilesByNull]] keeps, then applies the exact
    * predicate. On a corpus where missing values cluster by file
    * (staged backfills, per-source ingests) the completeness audit
    * reads the incomplete files, not the snapshot.
    */
  def readWhereNull(spark: SparkSession, table: String, colName: String,
                    wantNull: Boolean, version: Int = -1): DataFrame = {
    val v = if (version > 0) version else currentVersion(spark, table)
    val kept = prunedFilesByNull(spark, table, v, colName, wantNull)
    val pred = if (wantNull) col(colName).isNull else col(colName).isNotNull
    if (kept.isEmpty)
      return readVersion(spark, table, v).limit(0).filter(pred)
    snapshotRead(spark, table, v, kept).filter(pred)
  }

  /** Atomic single-partition overwrite (Delta's `replaceWhere` on a
    * partition predicate): replace EXACTLY the named hive partition's
    * files with `df`'s content in one commit — the nightly
    * re-materialization / backfill-one-day shape, where rewriting the
    * snapshot (or deleting then appending in two commits, with a
    * readable half-state between) is wrong at any size. Every other
    * partition's files carry BY REFERENCE with their stats; rows of
    * `df` outside the partition refuse loudly BEFORE any write
    * (Delta's replaceWhere constraint — a silently mis-routed row
    * would duplicate under another partition's dir while its old
    * version lives on).
    *
    * @return the committed version
    */
  def overwritePartition(spark: SparkSession, table: String, df: DataFrame,
                         value: String, statsCols: Seq[String] = Nil,
                         countRows: Boolean = false): Int = {
    val v = currentVersion(spark, table)
    require(v >= 1, s"TxTable: cannot replace a partition of non-existent $table")
    val pc = partColOf(spark, table, v).getOrElse(sys.error(
      s"TxTable: $table is not hive-partitioned — overwritePartition needs " +
      "a partitionBy layout; use op=\"overwrite\" for a full replace"))
    require(hiddenSpecOf(pc).isEmpty,
      s"TxTable: $table uses the hidden transform layout '$pc' — hidden " +
      "partition values are path-derived; replace through the key surface")
    // the partition column is stored under its PHYSICAL name; the
    // caller's frame speaks logical names
    val logicalPc = colMapOf(spark, table, v)
      .flatMap(_.collectFirst { case (n, p) if p == pc => n }).getOrElse(pc)
    val bad = df.filter(col(logicalPc).isNull ||
      col(logicalPc).cast("string") =!= value).count()
    require(bad == 0L, s"TxTable: overwritePartition($value): $bad rows " +
      s"violate $logicalPc = '$value' — replaceWhere writes exactly one partition")
    val dir = partDirOf(pc, value)
    val keep = filesOf(spark, table, v).filterNot(_.startsWith(dir + "/"))
    commitAs(df, table, v + 1, "update", statsCols,
      carryFiles = Some(keep), countRows = countRows)
  }
}
