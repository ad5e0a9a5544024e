package graft.tools

import graft.kg.GraftConfig
import graft.kg.pipeline.{GraphTableIO, ParquetTableIO}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-IO-call wall-time decomposition of the bench's 250k-doc store
  * build (`kg_ingest_250k_store`): wraps ParquetTableIO in a timing
  * delegate so every merge/append/overwrite/read/meta call of ONE
  * materialize is attributed (guide §1 — measure before touching the
  * ingest path). The residual (wall − sum of IO spans) is pipeline
  * compute + driver planning.
  *
  * Usage: runMain graft.tools.IngestProbe [repos] [files] [cores] [keepRoot]
  *        (keepRoot: build into this path and do NOT delete it — for
  *        feeding QueryProbe an actual bench-shaped store)
  */
object IngestProbe {
  final class TimingIO(inner: ParquetTableIO) extends GraphTableIO {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    private def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val v = f
      spans += ((label, (System.nanoTime() - t0) / 1e9))
      v
    }
    def exists(s: SparkSession, table: String) =
      t(s"exists:$table")(inner.exists(s, table))
    def read(s: SparkSession, table: String) =
      t(s"read:$table")(inner.read(s, table))
    def merge(s: SparkSession, table: String, d: DataFrame,
        keys: Seq[String], p: Seq[String]) =
      t(s"merge:$table")(inner.merge(s, table, d, keys, p))
    def overwrite(s: SparkSession, table: String, df: DataFrame, p: Seq[String]) =
      t(s"overwrite:$table")(inner.overwrite(s, table, df, p))
    def overwritePartitions(s: SparkSession, table: String, df: DataFrame,
        pc: String, ps: Seq[Int]) =
      t(s"overwriteParts:$table")(inner.overwritePartitions(s, table, df, pc, ps))
    override def appendNew(s: SparkSession, table: String, d: DataFrame,
        keys: Seq[String], p: Seq[String]) =
      t(s"appendNew:$table")(inner.appendNew(s, table, d, keys, p))
    override def rowCount(s: SparkSession, table: String) =
      t(s"rowCount:$table")(inner.rowCount(s, table))
    override def snapshotFp(s: SparkSession, table: String) =
      t(s"snapshotFp:$table")(inner.snapshotFp(s, table))
    override def withWriterLock[T](s: SparkSession)(f: => T): T =
      inner.withWriterLock(s)(f)
    override def setFlag(s: SparkSession, n: String) = inner.setFlag(s, n)
    override def clearFlag(s: SparkSession, n: String) = inner.clearFlag(s, n)
    override def flagSet(s: SparkSession, n: String) =
      t(s"flagSet:$n")(inner.flagSet(s, n))
    override def putMeta(s: SparkSession, n: String, v: String) = inner.putMeta(s, n, v)
    override def getMeta(s: SparkSession, n: String) = inner.getMeta(s, n)
    override def clearMeta(s: SparkSession, n: String) = inner.clearMeta(s, n)
  }

  def main(args: Array[String]): Unit = {
    val repos = args.lift(0).map(_.toInt).getOrElse(1050)
    val files = args.lift(1).map(_.toInt).getOrElse(240)
    val cores = args.lift(2).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-ingest-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.kg.fixtures.CorpusGen
      .generateDistributed(spark, repos, files, seed = 42L)
      .repartition(cores.toInt * 4).cache()
    corpus.count()
    val keepRoot = args.lift(3)
    val root = keepRoot.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ingest_probe").toString)
    val io = new TimingIO(new ParquetTableIO(root))
    val rag = new graft.kg.GraphRag(spark, io, GraftConfig(linkMode = "exact"))
    val t0 = System.nanoTime()
    rag.ingest(corpus)
    val wall = (System.nanoTime() - t0) / 1e9
    val bySpan = io.spans.toSeq
    bySpan.filter(_._2 >= 0.05).foreach { case (l, s) =>
      System.err.println(f"[ingest] $l: $s%.2f s")
    }
    System.err.println(
      f"[ingest] wall $wall%.2f s; IO spans total ${bySpan.map(_._2).sum}%.2f s; " +
        f"residual (pipeline compute inside spans double-counts reads) n/a")
    // store size
    def du(p: java.io.File): Long =
      if (p.isFile) p.length
      else Option(p.listFiles).map(_.map(du).sum).getOrElse(0L)
    System.err.println(f"[ingest] store bytes: ${du(new java.io.File(root)) / 1e6}%.0f MB")
    if (keepRoot.isEmpty) {
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
    } else System.err.println(s"[ingest] store kept at $root")
    spark.stop()
  }
}
