package graft
import org.apache.spark.sql.SparkSession
object DumpQ extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  for (name <- args) {
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").coalesce(1)
      .write.mode("overwrite").parquet(s"/tmp/graft_verify/$name")
    println(s"dumped $name")
  }
  spark.stop()
}
