package graft.tools

import graft.kg.GraftConfig
import graft.kg.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Replicates the frozen bench's KG-pipeline keys (same corpus prep, same
  * action, same median-of-3 protocol) without running the whole bench
  * body — the fast iteration loop for pipeline-side changes. Numbers here
  * are cited as iteration evidence only; graft.Bench stays authoritative.
  *
  * Usage: runMain graft.tools.PipeBench [exact|lsh|e2e|all]
  */
object PipeBench {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipe-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def timed3(name: String)(f: => Unit): Unit = {
      val xs = (1 to 3).map(_ => time(f))
      System.err.println(f"[pipe] $name: med ${xs.sorted.apply(1)}%.3f " +
        s"iters ${xs.map(x => f"$x%.3f").mkString(",")}")
    }
    val corpus = graft.SparkEntry.syntheticCorpus(spark, sfDir).cache()
    corpus.count()
    if (which == "exact" || which == "all")
      timed3("kg_pipeline_exact") {
        new Pipeline(GraftConfig(linkMode = "exact")).run(corpus).edges.count(); ()
      }
    if (which == "lsh" || which == "all")
      timed3("kg_pipeline_lsh") {
        val r = new Pipeline(GraftConfig(linkMode = "lsh")).run(corpus)
        r.canonicalEdges.count()
        r.cleanup()
      }
    if (which == "e2e" || which == "all") {
      val big = graft.kg.fixtures.CorpusGen
        .generateDistributed(spark, 4200, 240, seed = 42L)
        .repartition(cpus.toInt * 4).cache()
      big.count()
      timed3("kg_pipeline_1m_e2e") {
        new Pipeline(GraftConfig(linkMode = "exact")).run(big).edges.count(); ()
      }
      val planned = new Pipeline(GraftConfig(linkMode = "exact")).run(big).edges
      timed3("kg_throughput_1m_exec") { planned.count(); () }
    }
    spark.stop()
  }
}
