package graft

import graft.kg.GraftConfig
import graft.kg.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Two-parallelism scaling benchmark (north rule: throughput scaling
  * efficiency ≥ 0.8 between N and 4N executors; no real cluster in this
  * sandbox, so cores stand in for executors — the same job and input run
  * at `local[N]` and `local[4N]`, per BASELINE.md's measurement plan).
  *
  * Usage: runMain graft.ScalingBench [N] [repos] [filesPerRepo]
  * Prints one JSON line and appends a row to BENCH/BASELINE.md when
  * invoked with `--write-md`.
  */
object ScalingBench {

  private def runAt(cores: Int, repos: Int, files: Int): (Long, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark
      .createDataset(kg.fixtures.CorpusGen.generate(repos, files, seed = 42L).rows)
      .repartition(cores * 2)
      .cache()
    val nDocs = corpus.count() // input materialized outside the timed span
    // warm-up: JIT + codegen on a tiny slice so both runs pay equal warmup
    new Pipeline(GraftConfig(linkMode = "exact")).run(corpus.limit(50)).edges.count()
    val t0 = System.nanoTime()
    new Pipeline(GraftConfig(linkMode = "exact")).run(corpus).edges.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (nDocs, sec)
  }

  def main(args: Array[String]): Unit = {
    val n = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(8)
    val repos = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPOS", "300").toInt
    val files = sys.env.getOrElse("SPARK_GRAFT_SCALE_FILES", "60").toInt

    val (docs1, secN) = runAt(n, repos, files)
    val (_, sec4N) = runAt(4 * n, repos, files)
    val thrN = docs1 / secN
    val thr4N = docs1 / sec4N
    val eff = (thr4N / thrN) / 4.0
    val json =
      s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio",""" +
        s""""docs":$docs1,"cores_n":$n,"cores_4n":${4 * n},""" +
        s""""sec_n":${f"$secN%.2f"},"sec_4n":${f"$sec4N%.2f"},""" +
        s""""files_per_sec_n":${f"$thrN%.1f"},"files_per_sec_4n":${f"$thr4N%.1f"}}"""
    println(json)
    if (args.contains("--write-md")) {
      val md =
        s"""# BENCH — measured scaling (graft.ScalingBench)
           |
           |Same job (full KG pipeline, exact link mode), same input
           |(deterministic corpus, $docs1 docs), run at `local[$n]` and
           |`local[${4 * n}]` — cores stand in for executors per BASELINE.md.
           |
           || parallelism | wall sec | files/sec |
           || --- | --- | --- |
           || local[$n] | ${f"$secN%.2f"} | ${f"$thrN%.1f"} |
           || local[${4 * n}] | ${f"$sec4N%.2f"} | ${f"$thr4N%.1f"} |
           |
           |**Scaling efficiency** = (thr_4N / thr_N) / 4 = **${f"$eff%.3f"}**
           |(target ≥ 0.8).
           |
           |Raw: `$json`
           |""".stripMargin
      val dir = new java.io.File("BENCH")
      dir.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH/BASELINE.md"), md)
    }
  }
}
