package graft.tools

import graft.kg.{Chunk, ChunkEmbedding, GraftConfig}
import graft.kg.embed.HashEmbedder
import graft.kg.pipeline.ParquetTableIO
import graft.kg.retrieve.Retrieval
import org.apache.spark.sql.SparkSession

/** Component-level latency decomposition of the query paths over an
  * existing store (the bench big-store): times the term search, exact
  * vector search, ANN vector search, and both hybrid compositions
  * separately — median of 5 after a warm-up each — to locate where an
  * end-to-end gap actually lives before optimizing anything.
  *
  * Usage: runMain graft.tools.QueryProbe <storeRoot> [cores]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val cores = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-query-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val io = new ParquetTableIO(root)
    // prune with the STORE's persisted bucket count, not the engine
    // default — a probe at the wrong count silently drops rows
    val retrieval = new Retrieval(new HashEmbedder(), GraftConfig(
      numBuckets = graft.kg.pipeline.Pipeline
        .resolveNumBuckets(spark, io, GraftConfig())))
    val q = "utils imports module parseTree"
    def chunksDs = io.read(spark, "chunks").as[Chunk]
    val thr = graft.kg.retrieve.VectorIndex.readThresholds(spark, io).get

    def med5(label: String)(f: => Unit): Unit = {
      f // warm-up
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-28s median ${ts(2)}%.3f  all [${ts.map(t => f"$t%.2f").mkString(", ")}]")
    }

    med5("term_search") {
      retrieval.termSearch(io.read(spark, "terms"), chunksDs, q).count(); ()
    }
    med5("vector_exact") {
      retrieval.vectorSearch(
        io.read(spark, "chunk_embeddings").as[ChunkEmbedding], chunksDs, q).count(); ()
    }
    Seq("16m", "32m", "64m").foreach { mpb =>
      med5(s"vector_exact_$mpb") {
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        try retrieval.vectorSearch(
          io.read(spark, "chunk_embeddings").as[ChunkEmbedding], chunksDs, q).count()
        finally spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        ()
      }
      med5(s"term_search_$mpb") {
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        try retrieval.termSearch(io.read(spark, "terms"), chunksDs, q).count()
        finally spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        ()
      }
    }
    med5("vector_ann") {
      retrieval.vectorSearchAnn(
        io.read(spark, "chunk_vec_index"), chunksDs, q, thresholds = thr).count(); ()
    }
    // sub-steps of the ann plan, to locate overhead
    locally {
      import org.apache.spark.sql.functions._
      import graft.kg.retrieve.VectorIndex
      val emb = new HashEmbedder()
      val qv = emb.embedQuery(q)
      val pairs = VectorIndex.queryBuckets(qv, thresholds = thr)
      val pred = pairs.groupBy(_._1).map { case (l, bs) =>
        col("l") === lit(l) && col("vbucket").isin(bs.map(_._2).distinct: _*)
      }.reduce(_ || _)
      med5("read_handle_vec_index") {
        io.read(spark, "chunk_vec_index"); ()
      }
      med5("read_handle_highthreshold") {
        spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
        try io.read(spark, "chunk_vec_index")
        finally spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
        ()
      }
      val vecSchema = io.read(spark, "chunk_vec_index").schema
      med5("read_handle_explicit_schema") {
        spark.read.schema(vecSchema)
          .option("basePath", root + "/chunk_vec_index")
          .parquet(root + "/chunk_vec_index"); ()
      }
      med5("read_handle_schema_and_threshold") {
        spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "100000")
        try spark.read.schema(vecSchema)
          .option("basePath", root + "/chunk_vec_index")
          .parquet(root + "/chunk_vec_index")
        finally spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
        ()
      }
      val vecHandle = io.read(spark, "chunk_vec_index")
      med5("ann_scan_count_cachedhandle") {
        vecHandle.filter(pred).count(); ()
      }
      med5("ann_scan_count") {
        io.read(spark, "chunk_vec_index").filter(pred).count(); ()
      }
      med5("ann_scan_score_top") {
        io.read(spark, "chunk_vec_index").filter(pred)
          .select(col("chunkId"),
            graft.functions.VectorFunctions.dot_product(col("vec"), typedLit(qv)).as("score"))
          .orderBy(col("score").desc, col("chunkId"))
          .limit(40).collect(); ()
      }
    }
    val rag = new graft.kg.GraphRag(spark, io, GraftConfig(linkMode = "exact"))
    med5("hybrid_exact") {
      rag.query(q, includeTriplets = false).chunks.count(); ()
    }
    med5("hybrid_ann") {
      rag.query(q, includeTriplets = false, vectorMode = "ann").chunks.count(); ()
    }
    // FRESH-FACADE cold ANN queries (no handle cache): the cold-key shape
    // of the bench — each iteration builds a new facade and times its
    // first query (single-shot by nature; all iterations printed)
    (1 to 3).foreach { i =>
      val fresh = new graft.kg.GraphRag(spark, new ParquetTableIO(root),
        GraftConfig(linkMode = "exact"))
      val t0 = System.nanoTime()
      fresh.query(q, includeTriplets = false, vectorMode = "ann").chunks.count()
      println(f"fresh_facade_ann_$i%-15s        ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
