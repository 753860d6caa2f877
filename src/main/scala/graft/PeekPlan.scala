package graft
import org.apache.spark.sql.SparkSession
object PeekPlan extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  for (name <- args) {
    println(s"===== $name =====")
    println(SparkEntry.queries(name)(spark, sys.env.getOrElse("PEEK_DIR", "/root/testdata/sf0.001")).queryExecution.executedPlan.toString.take(sys.env.getOrElse("PEEK_LEN","3000").toInt))
  }
  spark.stop()
}
