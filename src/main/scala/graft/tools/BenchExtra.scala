package graft.tools

import org.apache.spark.sql.SparkSession

/** Auxiliary benchmark main (round 8): times individual declared queries
  * with the SAME session config and action as `graft.Bench` (count(),
  * median of 3), without running the full frozen bench body — the
  * fast-iteration loop of guide §1. `noop=` mode instead times a
  * `format("noop")` write (guide §1.4: computes every column, isolates
  * the computation from count()'s column pruning).
  *
  * Bench.scala itself is frozen this round; numbers from this tool are
  * cited in OPTIMIZATION_r08.md as isolation evidence only — the
  * authoritative per-key numbers remain graft.Bench's.
  *
  * Usage: runMain graft.tools.BenchExtra [noop] <query> [query ...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val noop = args.headOption.contains("noop")
    val names = (if (noop) args.drop(1) else args).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val results = names.flatMap { name =>
      graft.Queries.all.get(name).map { fn =>
        spark.sparkContext.setJobDescription(s"bench-extra: $name")
        val xs = (1 to 3).map { _ =>
          time {
            val df = fn(spark, sfDir)
            if (noop) df.write.format("noop").mode("overwrite").save()
            else { df.count(); () }
          }
        }
        System.err.println(
          f"[bench-extra] $name: med ${med(xs)}%.3f iters ${xs.map(x => f"$x%.3f").mkString(",")}")
        name -> (med(xs), xs)
      }
    }
    val qs = results.map { case (k, (m, _)) => "\"" + k + "\":" + f"$m%.3f" }
      .mkString("{", ",", "}")
    val iters = results.map { case (k, (_, xs)) =>
      "\"" + k + "\":[" + xs.map(x => f"$x%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    println(s"""{"metric":"bench_extra","noop":$noop,"queries":$qs,"iters":$iters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
