package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: does a pure CPU-bound Spark job scale with local[N] on
  * this box? Used to separate environment limits from pipeline limits. */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8").toInt
    val rows = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.range(1000000L).select(sum(length(md5(col("id").cast("string"))))).head()
    val t0 = System.nanoTime()
    spark.range(rows).repartition(cores * 2)
      .select(sum(length(sha2(concat(md5(col("id").cast("string")), lit("x")), 256))))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"probe":"cpu","cores":$cores,"rows":$rows,"sec":$sec%.2f,"rows_per_sec":${rows / sec}%.0f}""")
    spark.stop()
  }
}
