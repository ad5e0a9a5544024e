package graft.tools

import graft.kg.GraftConfig
import graft.kg.pipeline.{GraphTableIO, ParquetTableIO, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-table, per-operation physical-read attribution of ONE incremental
  * batch against a grown store (VERDICT r6 tasks #3/#4): seeds a store
  * with several full-size batches, then ingests one SMALL (sub-bucket)
  * batch through a delegating IO that snapshots the task input/output
  * byte counters around every table call — so each MERGE/append/read leg
  * of the batch gets its own read/write bytes, comparable against the
  * table's total size (the "touched fraction").
  *
  * This is the direct evidence for (a) whether the bucket-selective
  * MERGE's reads scale with the touched buckets rather than the table,
  * and (b) where the remaining O(store)/batch read floor lives
  * (appendNew anti-joins, compaction passes, band-index probe).
  *
  * Usage: runMain graft.tools.BatchReadProbe [seedBatches] [seedRepos]
  *        [smallRepos] [filesPerRepo] [cores] [numBuckets]
  */
object BatchReadProbe {
  final class ByteLedger(spark: SparkSession) {
    private val bytesIn = new java.util.concurrent.atomic.AtomicLong
    private val bytesOut = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytesIn.addAndGet(m.inputMetrics.bytesRead)
          bytesOut.addAndGet(m.outputMetrics.bytesWritten); ()
        }
      }
    })
    /** Poll until the async listener bus goes quiet, then return
      * cumulative (read, written). */
    def drained(): (Long, Long) = {
      var last = (-1L, -1L)
      var cur = (bytesIn.get, bytesOut.get)
      while (cur != last) { Thread.sleep(200); last = cur; cur = (bytesIn.get, bytesOut.get) }
      cur
    }
  }

  /** Delegating IO attributing read/write bytes to each table call. */
  final class AttributingIO(inner: GraphTableIO, ledger: ByteLedger)
      extends GraphTableIO {
    val legs = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double, Double)]
    private def leg[T](op: String, table: String)(f: => T): T = {
      val (in0, out0) = ledger.drained()
      val r = f
      val (in1, out1) = ledger.drained()
      legs += ((op, table, (in1 - in0) / 1e6, (out1 - out0) / 1e6))
      r
    }
    def exists(spark: SparkSession, table: String): Boolean =
      inner.exists(spark, table)
    def read(spark: SparkSession, table: String): DataFrame =
      inner.read(spark, table)
    def merge(spark: SparkSession, table: String, delta: DataFrame,
        keys: Seq[String], partitionCols: Seq[String]): Unit =
      leg("merge", table)(inner.merge(spark, table, delta, keys, partitionCols))
    def overwrite(spark: SparkSession, table: String, df: DataFrame,
        partitionCols: Seq[String]): Unit =
      leg("overwrite", table)(inner.overwrite(spark, table, df, partitionCols))
    def overwritePartitions(spark: SparkSession, table: String, df: DataFrame,
        partitionCol: String, partitions: Seq[Int]): Unit =
      leg("overwriteParts", table)(
        inner.overwritePartitions(spark, table, df, partitionCol, partitions))
    override def appendNew(spark: SparkSession, table: String, delta: DataFrame,
        keys: Seq[String], partitionCols: Seq[String]): Unit =
      leg("appendNew", table)(
        inner.appendNew(spark, table, delta, keys, partitionCols))
    override def rowCount(spark: SparkSession, table: String): Long =
      inner.rowCount(spark, table)
    override def snapshotFp(spark: SparkSession, table: String): String =
      inner.snapshotFp(spark, table)
    override def withWriterLock[T](spark: SparkSession)(f: => T): T =
      inner.withWriterLock(spark)(f)
    override def setFlag(spark: SparkSession, name: String): Unit =
      inner.setFlag(spark, name)
    override def clearFlag(spark: SparkSession, name: String): Unit =
      inner.clearFlag(spark, name)
    override def flagSet(spark: SparkSession, name: String): Boolean =
      inner.flagSet(spark, name)
    override def putMeta(spark: SparkSession, name: String, value: String): Unit =
      inner.putMeta(spark, name, value)
    override def getMeta(spark: SparkSession, name: String): Option[String] =
      inner.getMeta(spark, name)
    override def clearMeta(spark: SparkSession, name: String): Unit =
      inner.clearMeta(spark, name)
  }

  def main(args: Array[String]): Unit = {
    val nums = args.filter(_.forall(_.isDigit)).map(_.toInt)
    val seedBatches = nums.lift(0).getOrElse(4)
    val seedRepos = nums.lift(1).getOrElse(120)
    val smallRepos = nums.lift(2).getOrElse(5)
    val files = nums.lift(3).getOrElse(40)
    val cores = nums.lift(4).getOrElse(8)
    val numBuckets = nums.lift(5).getOrElse(256)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-batch-read-probe")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ledger = new ByteLedger(spark)

    val root = java.nio.file.Files.createTempDirectory("graft_readprobe").toString
    val inner = new ParquetTableIO(root)
    val cfg = GraftConfig(linkMode = "lsh", linkThreshold = 0.85,
      numBuckets = numBuckets)
    // seed the store with full-size batches (the grown-store state)
    (0 until seedBatches).foreach { b =>
      val corpus = graft.kg.fixtures.CorpusGen
        .generateDistributed(spark, seedRepos, files, seed = 42L,
          repoOffset = 1 + b * seedRepos)
        .repartition(cores).cache()
      corpus.count()
      new Pipeline(cfg).materialize(corpus, inner)
      corpus.unpersist(blocking = false)
      System.err.println(s"[readprobe] seeded batch $b")
    }
    // table sizes before the probed batch (touched-fraction denominator)
    def du(dir: java.io.File): Long =
      if (dir.isFile) dir.length()
      else Option(dir.listFiles()).map(_.map(du).sum).getOrElse(0L)
    val sizes = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("_"))
      .map(f => f.getName -> du(f) / 1e6).toMap

    // ONE small batch, every table call attributed
    val io = new AttributingIO(inner, ledger)
    val small = graft.kg.fixtures.CorpusGen
      .generateDistributed(spark, smallRepos, files, seed = 42L,
        repoOffset = 1 + seedBatches * seedRepos)
      .repartition(cores).cache()
    val nSmall = small.count()
    val (inB0, _) = ledger.drained()
    val t0 = System.nanoTime()
    new Pipeline(cfg).materialize(small, io)
    val sec = (System.nanoTime() - t0) / 1e9
    val (inB1, _) = ledger.drained()

    val legsJson = io.legs.map { case (op, t, r, w) =>
      s"""{"op":"$op","table":"$t","read_mb":${f"$r%.2f"},""" +
        s""""write_mb":${f"$w%.2f"},""" +
        s""""table_mb":${f"${sizes.getOrElse(t, 0.0)}%.2f"},""" +
        s""""touched_frac":${
          val d = sizes.getOrElse(t, 0.0)
          if (d > 0.01) f"${r / d}%.3f" else "null"}}"""
    }.mkString("[", ",", "]")
    val totRead = io.legs.map(_._3).sum
    println(
      s"""{"metric":"batch_read_attribution","seed_batches":$seedBatches,""" +
        s""""seed_docs_per_batch":${seedRepos * files},""" +
        s""""small_batch_docs":$nSmall,"num_buckets":$numBuckets,""" +
        s""""small_batch_sec":${f"$sec%.1f"},""" +
        s""""batch_total_read_mb":${f"${(inB1 - inB0) / 1e6}%.1f"},""" +
        // reads NOT inside a table write call: the linking probe's
        // band-index scan, checkpoint fingerprints, stats reads
        s""""unattributed_read_mb":${f"${(inB1 - inB0) / 1e6 - totRead}%.1f"},""" +
        s""""total_attributed_read_mb":${f"$totRead%.1f"},""" +
        s""""store_total_mb":${f"${sizes.values.sum}%.1f"},""" +
        s""""legs":$legsJson}""")
    try {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
