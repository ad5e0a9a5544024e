package graft.tools

import graft.kg.retrieve.VectorIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: the vec-index layout row build, explode form vs
  * 4-way-union form, over synthetic unit vectors — isolates the
  * generator-evaluation cost question before trusting either shape in
  * the ingest path. noop sink (guide §1.4).
  *
  * Usage: runMain graft.tools.LayoutProbe [rows] [cores]
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.lift(0).map(_.toInt).getOrElse(100000)
    val cores = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = new graft.kg.embed.HashEmbedder()
    val embeddings = spark.range(rows)
      .select(concat(lit("c"), col("id")).as("chunkId"), col("id"))
      .as[(String, Long)]
      .mapPartitions(it => it.map { case (c, i) => (c, emb.embed("row " + i)) })
      .toDF("chunkId", "vec")
      .persist()
    embeddings.count()
    val thr = VectorIndex.zeroThresholds
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        System.err.println(f"[layout] $label iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // current (explode) form
    time("explode")(VectorIndex.layout(embeddings, emb.dim, thr))
    // legacy union form, reconstructed inline
    val union = (0 until VectorIndex.NumTables).map { l =>
      embeddings.select(col("chunkId"), col("vec"),
        lit(l).as("l"),
        VectorIndex.bucketExpr(col("vec"), emb.dim, l, thr).as("vbucket"))
    }.reduce(_ unionByName _)
    time("union")(union)
    spark.stop()
  }
}
