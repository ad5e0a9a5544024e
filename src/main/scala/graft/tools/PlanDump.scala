package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` physical plans of declared queries to
  * files (the round-8 plan-evidence deliverable: plans/r08/<q>_<tag>.txt).
  * Session config mirrors Bench (local[$SPARK_GRAFT_CPUS], AQE on,
  * shuffle.partitions = cpus) so the dumped plan is the plan the bench
  * actually runs — modulo AQE's runtime re-optimization, which `explain`
  * shows as the initial plan.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> [query ...]
  *        (no query names = every declared query)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = if (args.length > 2) args.drop(2).toSeq
      else graft.Queries.all.keys.toSeq.sorted
    names.foreach { name =>
      graft.Queries.all.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            // capture the formatted plan string (same text explain prints)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), plan)
            System.err.println(s"[plandump] wrote $name ($tag)")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
        case None => System.err.println(s"[plandump] unknown query: $name")
      }
    }
    spark.stop()
  }
}
