package graft.kg

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites (guide: one session per
  * suite; sharing across suites is fine since config is identical). */
object SparkSessionFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the spark-submit path: functions injected via extensions, no code
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
