package graft
import org.apache.spark.sql.SparkSession
object TimeQ extends App {
  private val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
  val spark = SparkSession.builder().master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = args.head
  for (name <- args.tail; pass <- 1 to 3) {
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).count()
    println(f"$name pass$pass ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
  }
  spark.stop()
}
