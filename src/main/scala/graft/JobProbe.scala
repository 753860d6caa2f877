package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Dev-only: per-JOB attribution for one query — job id, wall, task
  * count, task time and the driver call site, so a jobs==stages
  * overhead-bound query (the tx/stream family signature) can be broken
  * down action by action.
  *
  * Usage: JobProbe <sfDir> <query...>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("graft.graph.localEdgeGate",
        sys.env.getOrElse("GRAFT_LOCAL_EDGE_GATE", "2000000"))
      .config("graft.stream.statePartitions",
        sys.env.getOrElse("GRAFT_STREAM_PARTS", "8"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    case class J(var t0: Long = 0, var t1: Long = 0, var tasks: Int = 0,
                 var taskMs: Long = 0, var site: String = "", var stageName: String = "")
    val js = TrieMap.empty[Int, J]
    val stageToJob = TrieMap.empty[Int, Int]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val rec = J(t0 = j.time,
          site = Option(j.properties.getProperty("callSite.short")).getOrElse("?"))
        js.put(j.jobId, rec)
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        js.get(j.jobId).foreach(_.t1 = j.time); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stageToJob.get(s.stageInfo.stageId).flatMap(js.get).foreach { r =>
          r.stageName = s.stageInfo.name.take(90)
        }
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        stageToJob.get(t.stageId).flatMap(js.get).foreach { r =>
          r.tasks += 1
          if (t.taskMetrics != null) r.taskMs += t.taskMetrics.executorRunTime
        }
        ()
      }
    })
    for (name <- args.drop(1)) {
      try SparkEntry.queries(name)(spark, dir).count()
      catch { case e: Throwable => println(s"$name WARM-FAIL: ${e.getMessage}") }
      js.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"== $name  wall $wall%.2f s  jobs ${js.size}")
      var prevEnd = 0L
      js.toSeq.sortBy(_._1).foreach { case (id, j) =>
        val gap = if (prevEnd > 0) j.t0 - prevEnd else 0L
        prevEnd = math.max(prevEnd, j.t1)
        println(f"  job $id%3d  ${j.t1 - j.t0}%5d ms  gap $gap%5d ms  tasks ${j.tasks}%4d  taskTime ${j.taskMs}%6d ms  ${j.site}  | ${j.stageName}")
      }
    }
    spark.stop()
  }
}
