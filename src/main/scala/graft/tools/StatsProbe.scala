package graft.tools

import graft.kg.pipeline.ParquetTableIO
import org.apache.spark.sql.SparkSession

/** Measurement tool: per-table cost of the two ingest-stats strategies
  * on an existing store — (a) a Spark `count()` job, (b) the
  * metadata-only [[ParquetTableIO.rowCount]] (pooled parquet-footer
  * record-count sums, the Iceberg-manifest analogue).
  *
  * Measurement history, recorded because the first cut got it wrong
  * twice: (1) a SERIAL footer pass shipped unmeasured and doubled
  * per-batch ingest wall time; (2) the first probe run then showed even
  * POOLED footers losing 43 s to count()'s 5.6 s on the sliver-heavy
  * vector index — but 33.5 s of that was `listFiles(recursive = true)`
  * resolving block locations per file, not footer reads. With a plain
  * `listStatus` walk (GraphTableIO.walkDataFiles) the same table
  * measures ~8.5 s footers vs ~13.5 s count(), and the whole 13-table
  * store 9.6 s vs 24.5 s — footers win everywhere, and both collapse
  * to ~1 s once appendNew's sliver compaction bounds files-per-dir.
  *
  * Usage: runMain graft.tools.StatsProbe <storeRoot> [cores]
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val cores = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-stats-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val io = new ParquetTableIO(root)
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables = hfs.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .sorted
    def dataFiles(t: String): Int = {
      var n = 0
      val stack = scala.collection.mutable.Stack(
        new org.apache.hadoop.fs.Path(s"$root/$t"))
      while (stack.nonEmpty) {
        hfs.listStatus(stack.pop()).foreach { s =>
          val nm = s.getPath.getName
          if (!nm.startsWith("_") && !nm.startsWith(".")) {
            if (s.isDirectory) stack.push(s.getPath) else n += 1
          }
        }
      }
      n
    }
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // one throwaway job so the FIRST table's count() does not absorb the
    // session's first-job scheduling/codegen warm-up
    spark.range(8).count()
    var (jobTot, metaTot) = (0.0, 0.0)
    tables.foreach { t =>
      val (c1, s1) = time(io.read(spark, t).count())
      val (c2, s2) = time(io.rowCount(spark, t))
      require(c1 == c2, s"$t: count() $c1 != rowCount $c2")
      jobTot += s1; metaTot += s2
      println(f"[stats] $t%-28s rows=$c1%9d files=${dataFiles(t)}%6d  " +
        f"count()=$s1%6.2f s  rowCount=$s2%6.2f s")
    }
    println(f"[stats] TOTAL count()=$jobTot%.2f s  rowCount=$metaTot%.2f s")
    spark.stop()
  }
}
