package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-file ingest via Spark's `binaryFile` source (SURVEY.md §2 #63)
  * — the entry point for multimodal corpora that land as OBJECTS
  * (images, audio, scraped payloads) rather than rows: one row per
  * file with (path, modificationTime, length, content BINARY), read
  * distributed (files are split across tasks, never driver-listed one
  * by one beyond the initial listing Spark already parallelizes).
  *
  * This is the missing first hop in front of [[graft.operators.Multimodal]]:
  * object store → binaryFile scan → (id, bytes) frame → codec batches.
  * `pathGlobFilter` prunes at LISTING time (non-matching objects are
  * never opened); `ingest` normalizes to the (file_name, n_bytes,
  * content) shape the downstream decode operators key on, with the
  * content hash computed executor-side so dedup against a standing
  * corpus can run without ever re-shipping payload bytes.
  *
  * Zero-byte objects: Spark's file scan builds NO split for a 0-length
  * file, so empty objects never appear as rows (unlike e.g. DuckDB's
  * read_blob, which lists them). [[materializeText]] therefore skips
  * empty texts — an empty payload has nothing to ingest, and skipping
  * keeps cross-engine listings identical.
  */
object BinaryDir {

  def read(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)

  /** Normalized ingest projection: stable file identity (basename —
    * bucket/prefix noise dropped), size, and the md5 content address.
    * Column-pruned: selecting only these from a binaryFile scan still
    * reads content (for the hash) but drops it before any shuffle.
    */
  def ingest(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    read(spark, dir, glob)
      .select(
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("length").as("n_bytes"),
        md5(col("content")).as("content_md5"))

  /** Materialize a text column as one raw file per row — the test/demo
    * writer for [[ingest]] (production corpora arrive from the object
    * store already shaped like this). Runs as a foreachPartition file
    * writer: every task writes its own rows, nothing is collected to
    * the driver. Deterministic: file name and bytes derive only from
    * the row.
    */
  def materializeText(df: DataFrame, dir: String,
                      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val p = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(p)
    // idempotent re-materialization: stale files from a previous run
    // (other scale factor → other doc ids) must not leak into the scan
    java.nio.file.Files.list(p).filter(_.getFileName.toString.matches("doc_.*\\.txt"))
      .forEach(f => java.nio.file.Files.delete(f))
    df.select(col(idCol).cast("string"), col(textCol))
      .filter(col(textCol).isNotNull && org.apache.spark.sql.functions.length(col(textCol)) > 0)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"doc_${r.getString(0)}.txt"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
  }
}
