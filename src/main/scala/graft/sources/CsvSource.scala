package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tafra

/** CSV source with reference-style dtype guessing
  * (/root/reference/tafra/csvreader.py: promotion int → float → bool →
  * date → str over `guess_rows`).
  *
  * Spark-first: `inferSchema` samples distributed (every executor reads
  * its split) instead of the reference's driver-side first-N-rows scan,
  * so the guess holds on files far larger than memory.
  */
object CsvSource {
  def read(spark: SparkSession, path: String,
           header: Boolean = true, inferSchema: Boolean = true): Tafra = {
    val df: DataFrame = spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      // reference promotes unparseable ints to float then str; Spark's
      // permissive mode + type widening does the analogous promotion
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)
    Tafra(df)
  }

  def write(t: Tafra, path: String): Unit =
    t.df.write.mode("overwrite").option("header", "true").csv(path)
}
