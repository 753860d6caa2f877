package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: split per-query wall into (build+analyze+optimize+physical
  * plan) vs (execution) for the named queries — is the long tail of
  * sub-second queries dominated by driver-side planning or by task
  * execution? Mirrors Bench's session config.
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    val names = args.tail
    for (pass <- 1 to 3; name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      println(f"$name%-32s pass$pass plan ${(t1 - t0) / 1e9}%6.3f s  exec ${(t2 - t1) / 1e9}%6.3f s")
    }
    spark.stop()
  }
}
