package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only: per-query resource profile — jobs, stages, tasks, task
  * time, shuffle bytes, spill — plus the formatted plan dumped to a
  * file. The measurement pass of the optimization guide §1: where
  * does each query's wall actually go (many tiny jobs? one fat
  * shuffle? straggler stages?).
  *
  * Usage: ProfileQ <sfDir> <outDir> <query...>
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // dev knob: pin the small-graph gate (e.g. "0" reproduces the
    // distributed "before" plans after the local path landed)
    sys.env.get("GRAFT_LOCAL_GATE").foreach(v =>
      spark.conf.set("graft.graph.localEdgeGate", v))
    val dir = args(0)
    val outDir = args(1)
    new java.io.File(outDir).mkdirs()
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val spill = new AtomicLong
    val gcMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled)
        }
        ()
      }
    })
    for (name <- args.drop(2)) {
      // warm pass (JIT+cache), then measured pass
      try SparkEntry.queries(name)(spark, dir).count()
      catch { case e: Throwable => println(s"$name WARM-FAIL: ${e.getMessage}") }
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      shuffleRead.set(0); shuffleWrite.set(0); spill.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      println(f"$name%-32s wall $wall%6.2f s  jobs ${jobs.get}%3d  stages ${stages.get}%3d  " +
        f"tasks ${tasks.get}%5d  taskTime ${taskTimeMs.get / 1000.0}%7.1f s  gc ${gcMs.get / 1000.0}%5.1f s  " +
        f"shufR ${shuffleRead.get / 1e6}%8.1f MB  shufW ${shuffleWrite.get / 1e6}%8.1f MB  spill ${spill.get / 1e6}%6.1f MB")
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      catch { case e: Throwable => println(s"$name PLAN-FAIL: ${e.getMessage}") }
    }
    spark.stop()
  }
}
