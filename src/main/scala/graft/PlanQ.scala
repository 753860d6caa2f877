package graft
import org.apache.spark.sql.SparkSession
object PlanQ extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = args.head
  for (name <- args.tail) {
    val df = SparkEntry.queries(name)(spark, dir)
    df.count()  // let AQE finalize
    println(s"=== $name @ $dir ===")
    println(df.queryExecution.executedPlan.toString.take(4000))
  }
  spark.stop()
}
