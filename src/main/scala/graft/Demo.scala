package graft

import org.apache.spark.sql.SparkSession

/** CLI smoke entry: runs the flagship pipeline exactly as the driver's
  * smoke check does (SparkEntry.entry on sf0.001) and prints the row
  * count plus a sample of emitted edges. */
object Demo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = SparkEntry.entry(spark)
    val n = edges.count()
    println(s"[demo] flagship KG edges on sf0.001: $n rows")
    edges.show(20, truncate = false)
    if (args.contains("--explain")) edges.explain("formatted")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
