package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only plan/profile scratch. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    import spark.implicits._
    // breakdown: raw stream drain vs typed encode vs full sessionize
    val path = s"$dir/events.parquet"
    for (i <- 1 to 2) {
      time(s"stream_drain_$i") {
        val s = streaming.Events.readStream(spark, path)
        val name = "probe_drain" + i
        val q = s.writeStream.outputMode("append").format("memory").queryName(name).start()
        q.processAllAvailable(); q.stop()
        spark.table(name).count()
      }
      time(s"typed_groups_nostate_$i") {
        val s = streaming.Events.readStream(spark, path)
          .withWatermark("ts", "10 minutes")
          .select(col("user_id"), unix_micros(col("ts")).as("tus"), col("ts"))
          .as[streaming.Events.UserEvent]
          .groupByKey(_.user_id)
          .flatMapGroups((uid: Long, it: Iterator[streaming.Events.UserEvent]) =>
            Iterator.single((uid, it.size)))
        val name = "probe_typed" + i
        val q = s.writeStream.outputMode("append").format("memory").queryName(name).start()
        q.processAllAvailable(); q.stop()
        spark.table(name).count()
      }
      time(s"sessionize_$i")(streaming.Events.sessionize(spark, path).count())
    }
    spark.stop()
  }
}
