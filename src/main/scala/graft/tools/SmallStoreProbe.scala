package graft.tools

import graft.kg.GraftConfig
import graft.kg.pipeline.ParquetTableIO
import org.apache.spark.sql.SparkSession

/** Repeat-run latency probe of the FACADE query paths over the small
  * (sf-corpus) store — the store Bench's un-warmed small-store block
  * times. Separates first-call cost (Catalyst planning + index file
  * listing + codegen) from steady-state latency, to decide whether the
  * small-store bench numbers are engine or warm-up.
  *
  * Usage: runMain graft.tools.SmallStoreProbe [sfDir] [cores]
  */
object SmallStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cores = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-small-store-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = graft.SparkEntry.syntheticCorpus(spark, sfDir).cache()
    corpus.count()
    val storeRoot = java.nio.file.Files
      .createTempDirectory("graft_small_probe").toString
    val rag = new graft.kg.GraphRag(spark, new ParquetTableIO(storeRoot),
      GraftConfig(linkMode = "lsh", linkThreshold = 0.85))
    rag.ingest(corpus)

    val q = "utils imports module parseTree"
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to 5) {
      val e = time { rag.query(q, includeTriplets = false).chunks.count(); () }
      val a = time {
        rag.query(q, includeTriplets = false, vectorMode = "ann").chunks.count(); ()
      }
      val r = time {
        rag.query("What does Utils use?", includeTriplets = true)
          .triplets.foreach(_.count()); ()
      }
      println(f"[probe] run $i exact=$e%.3f ann=$a%.3f rel=$r%.3f")
    }
    try {
      val fs = new org.apache.hadoop.fs.Path(storeRoot).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(storeRoot), true); ()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
