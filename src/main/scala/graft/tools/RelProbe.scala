package graft.tools

import graft.kg.GraftConfig
import graft.kg.embed.HashEmbedder
import graft.kg.pipeline.{ParquetTableIO, Pipeline}
import graft.kg.retrieve.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition of the big-store relationship-lookup latency (VERDICT
  * r6 "What's wrong #1": `kg_query_big_warm_relationship_indexed`
  * measured ~3.0 s tight on the r6 binary vs 1.43 s on r5 — suspected
  * cause: the exact-mode canonical skip routes the query onto the
  * `edge_entity_index` fallback instead of the canonical index).
  *
  * Builds the bench's exact 250k-doc store (or reuses `storeRoot` when
  * its tables already exist), then times, separately:
  * the facade query (bench shape), the direct indexed lookup, the bare
  * bucket-pruned scan, the exists-probe chain — and finally
  * materializes the identity canonical tables the r5 binary would have
  * written and times the canonical route on the SAME store for an A/B.
  *
  * Usage: runMain graft.tools.RelProbe <storeRoot> [cores]
  */
object RelProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val cores = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-rel-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val io = new ParquetTableIO(root)
    if (!io.exists(spark, "edges")) {
      println(s"[relprobe] building 250k exact store at $root ...")
      val corpus = graft.kg.fixtures.CorpusGen
        .generateDistributed(spark, 1050, 240, seed = 42L)
        .repartition(cores.toInt * 4).cache()
      corpus.count()
      val rag = new graft.kg.GraphRag(spark, io, GraftConfig(linkMode = "exact"))
      val t0 = System.nanoTime()
      rag.ingest(corpus)
      println(f"[relprobe] ingest ${(System.nanoTime() - t0) / 1e9}%.1f s")
      corpus.unpersist(blocking = false)
    }

    val nb = Pipeline.resolveNumBuckets(spark, io, GraftConfig())
    val retrieval = new Retrieval(new HashEmbedder(),
      GraftConfig(numBuckets = nb))
    val q = "What does Utils use?"

    def med5(label: String)(f: => Unit): Unit = {
      f // warm-up
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-34s median ${ts(2)}%.3f  all [${ts.map(t => f"$t%.2f").mkString(", ")}]")
    }

    // physical shape of the two index tables
    def describeTable(t: String): Unit = if (io.exists(spark, t)) {
      val hfs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      var files = 0; var bytes = 0L
      val stack = scala.collection.mutable.Stack(
        new org.apache.hadoop.fs.Path(s"$root/$t"))
      while (stack.nonEmpty) hfs.listStatus(stack.pop()).foreach { s =>
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (s.isDirectory) stack.push(s.getPath)
          else { files += 1; bytes += s.getLen }
        }
      }
      println(f"[relprobe] $t%-30s files=$files%5d bytes=${bytes / 1e6}%.1f MB rows=${io.rowCount(spark, t)}")
    } else println(s"[relprobe] $t ABSENT")

    describeTable("edge_entity_index")
    describeTable("canonical_edge_entity_index")
    describeTable("canonical_map")

    med5("exists_chain_x3") {
      io.exists(spark, "canonical_edge_entity_index")
      io.exists(spark, "edge_entity_index")
      io.exists(spark, "canonical_map"); ()
    }

    val rag = new graft.kg.GraphRag(spark, io, GraftConfig(linkMode = "exact"))
    med5("facade_query_construct_only") {
      rag.query(q, includeTriplets = true); ()
    }
    med5("facade_query_triplets") {
      rag.query(q, includeTriplets = true).triplets.foreach(_.count()); ()
    }
    med5("facade_query_hybrid_chunks") {
      rag.query(q, includeTriplets = false).chunks.count(); ()
    }

    val eei = io.read(spark, "edge_entity_index")
    med5("rel_indexed_direct") {
      retrieval.relationshipSearchIndexed(eei, q).count(); ()
    }
    med5("rel_indexed_fresh_handle") {
      retrieval.relationshipSearchIndexed(
        io.read(spark, "edge_entity_index"), q).count(); ()
    }

    // bare pruned scan: the physical cost floor of the lookup
    val ents = Seq("what", "utils")
    val bs = ents.map(e =>
      org.apache.spark.sql.catalyst.expressions.Pmod(
        new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(Seq(
          org.apache.spark.sql.catalyst.expressions.Literal(e))),
        org.apache.spark.sql.catalyst.expressions.Literal(nb))
        .eval(null).asInstanceOf[Int]).distinct
    med5("pruned_scan_count") {
      eei.filter(col("ebucket").isin(bs: _*) && col("entity").isin(ents: _*))
        .count(); ()
    }
    med5("pruned_scan_nofilter_count") {
      eei.filter(col("ebucket").isin(bs: _*)).count(); ()
    }

    // A/B: materialize the identity canonical tables the r5 binary wrote
    // for an exact store, and time the canonical route on the same data
    if (!io.exists(spark, "canonical_edge_entity_index")) {
      println("[relprobe] materializing identity canonical tables for A/B ...")
      io.overwrite(spark, "canonical_edge_entity_index",
        Pipeline.canonicalIndexRows(io.read(spark, "edges"), nb), Seq("ebucket"))
      io.overwrite(spark, "canonical_map",
        Pipeline.canonicalMapLayout(
          io.read(spark, "edges").select(col("subj").as("name"),
            col("subj").as("canonicalName")).limit(0), nb),
        Seq("cbucket"))
    }
    describeTable("canonical_edge_entity_index")
    val cei = io.read(spark, "canonical_edge_entity_index")
    val cmap = io.read(spark, "canonical_map")
    med5("rel_canonical_direct") {
      retrieval.relationshipSearchCanonical(cei, cmap, q).count(); ()
    }
    val rag2 = new graft.kg.GraphRag(spark, io, GraftConfig(linkMode = "exact"))
    med5("facade_query_triplets_canon") {
      rag2.query(q, includeTriplets = true).triplets.foreach(_.count()); ()
    }
    spark.stop()
  }
}
