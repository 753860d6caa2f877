package graft
/** Dev-only: print oracleSql entries (for the local DuckDB loop). */
object PrintOracle extends App {
  args.foreach { n =>
    println("-----8<----- " + n)
    println(SparkEntry.oracleSql(n))
  }
}
