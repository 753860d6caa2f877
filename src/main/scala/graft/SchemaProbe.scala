package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Dev-only: count jobs for a parquet read with vs without an explicit
  * schema, to confirm footer inference is a Spark job we can elide.
  */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = args(0)
    val n = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { n.incrementAndGet(); () }
    })
    // warm FS caches
    val sch = spark.read.parquet(path).schema
    Thread.sleep(300); n.set(0)
    val t0 = System.nanoTime()
    spark.read.parquet(path).count()
    Thread.sleep(300)
    println(f"no-schema: jobs ${n.get}  wall ${(System.nanoTime()-t0)/1e6}%.0f ms")
    n.set(0)
    val t1 = System.nanoTime()
    spark.read.schema(sch).parquet(path).count()
    Thread.sleep(300)
    println(f"with-schema: jobs ${n.get}  wall ${(System.nanoTime()-t1)/1e6}%.0f ms")
    // driver-side footer read cost
    val t2 = System.nanoTime()
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val first = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet")).head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      conf, first.getPath, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val conv = new org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter()
    val st = conv.convert(footer.getFileMetaData.getSchema)
    println(f"driver-footer: ${(System.nanoTime()-t2)/1e6}%.0f ms  match=${st == sch}  $st")
    spark.stop()
  }
}
