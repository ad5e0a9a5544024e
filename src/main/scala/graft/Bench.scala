package graft

import graft.kg.GraftConfig
import graft.kg.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Headliners = the full KG pipeline (both link modes) plus the heaviest
  * operator families (joins/dedup/similarity/text); the cheap
  * oracle-parity queries are correctness-gated by Verify, not timed here.
  * Also reports `kg_files_per_sec` (the north-rule throughput metric).
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q01_groupagg", "q03_context_range_join", "q11_dedup_merge",
    "q13_tokenize_explode", "q15_stopword_filter", "q21_token_count",
    "q22_quality_score", "q26_minhash_sig", "q27_minhash_jaccard",
    "q28_simhash", "q29_embed_cosine_dup", "q30_knn_bruteforce",
    "q31_ann_lsh_bucketed", "q32_multimodal_decode")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // KG pipeline, exact mode (stock reference semantics): the north-rule
    // throughput measurement — rows in / wall sec.
    val corpus = SparkEntry.syntheticCorpus(spark, sfDir).cache()
    val nDocs = corpus.count() // materialize input outside the timed run
    var kgEdges = 0L
    val kgExactSec = time {
      kgEdges = new Pipeline(GraftConfig(linkMode = "exact")).run(corpus).edges.count()
    }
    results += "kg_pipeline_exact" -> kgExactSec
    val kgLshSec = time {
      val r = new Pipeline(GraftConfig(linkMode = "lsh")).run(corpus)
      r.canonicalEdges.count()
      r.cleanup()
    }
    results += "kg_pipeline_lsh" -> kgLshSec

    // North-rule throughput at a non-planning-dominated size: the sf
    // corpus is ~2k docs, so its wall time is ~the 6 s Catalyst planning
    // constant and round-over-round deltas would track the planner, not
    // the engine. Throughput is therefore measured plan-once/execute-many
    // (the ScalingBench protocol — one plan, hours of execution in
    // production) on a 1M-doc corpus; median of 3 after a warm-up.
    val big = kg.fixtures.CorpusGen.generateDistributed(spark, 4200, 240, seed = 42L)
      .repartition(cpus.toInt * 4).cache()
    val bigDocs = big.count()
    // END-TO-END 1M-doc run (fresh plan + full execution): the headline
    // kg_files_per_sec denominator, comparable across rounds — planning,
    // chunk/extract chain and edge dedup all included. The plan-once
    // figure below is reported under its own clearly-named key so the two
    // protocols can never be conflated. MEDIAN OF 3 fresh-plan runs with
    // every iteration published (`kg_pipeline_1m_e2e_all`): the round-4
    // headline was a single-iteration number, and one CPU-steal burst
    // defined the round's throughput (a 7× spread against the fresh-JVM
    // ScalingBench medians) — the median + transparency makes the
    // headline unspoofable by one bad window.
    val e2eRuns = (1 to 3).map(_ => time {
      new Pipeline(GraftConfig(linkMode = "exact")).run(big).edges.count()
    })
    val bigE2eSec = e2eRuns.sorted.apply(1)
    results += "kg_pipeline_1m_e2e" -> bigE2eSec
    // plan-once / execute-many (the ScalingBench protocol — one plan,
    // hours of execution in production): median of 3 on a single built
    // plan, JIT-warm from the end-to-end run above
    val bigPlanned = new Pipeline(GraftConfig(linkMode = "exact")).run(big).edges
    val bigRuns = (1 to 3).map(_ => time(bigPlanned.count())).sorted
    val bigSec = bigRuns(1)
    results += "kg_throughput_1m_exec" -> bigSec
    big.unpersist(blocking = false)

    // Query-side latency over a MATERIALIZED store (the pruned layouts'
    // payoff surface): one ingest, then the facade's retrieval paths —
    // hybrid with exact vector scan, hybrid with the ANN sketch index,
    // and the entity-indexed relationship lookup.
    {
      val storeRoot = java.nio.file.Files
        .createTempDirectory("graft_bench_store").toString
      val cfg = GraftConfig(linkMode = "lsh", linkThreshold = 0.85)
      val rag = new graft.kg.GraphRag(spark,
        new graft.kg.pipeline.ParquetTableIO(storeRoot), cfg)
      rag.ingest(corpus)
      val q = "utils imports module parseTree"
      results += "kg_query_hybrid_exact" -> time {
        rag.query(q, includeTriplets = false).chunks.count()
      }
      results += "kg_query_hybrid_ann" -> time {
        rag.query(q, includeTriplets = false, vectorMode = "ann").chunks.count()
      }
      results += "kg_query_relationship_indexed" -> time {
        rag.query("What does Utils use?", includeTriplets = true)
          .triplets.foreach(_.count())
      }
      // Warm steady-state latency for the same three paths (median of 3,
      // the cold calls above served as warm-up): the cold keys keep their
      // historical protocol (first call, planning + index listing +
      // codegen included — SmallStoreProbe measured ~80% of the cold ANN
      // number to be those one-time costs); these keys report what a
      // resident query service pays per call.
      def med3s(f: => Unit): Double = (1 to 3).map(_ => time(f)).sorted.apply(1)
      results += "kg_query_warm_hybrid_exact" -> med3s {
        rag.query(q, includeTriplets = false).chunks.count()
      }
      results += "kg_query_warm_hybrid_ann" -> med3s {
        rag.query(q, includeTriplets = false, vectorMode = "ann").chunks.count()
      }
      results += "kg_query_warm_relationship_indexed" -> med3s {
        rag.query("What does Utils use?", includeTriplets = true)
          .triplets.foreach(_.count())
      }
    }

    // The same three queries at a NON-planning-bound store (VERDICT r3
    // #6): the sf store holds ~2k chunks, so its query wall time is
    // Catalyst planning, not scanning — the pruned layouts' latency win
    // only shows where the scan dominates. One ~250k-doc store is
    // materialized (exact link mode — linking does not affect these
    // query paths), then each path is timed as median-of-3 after one
    // codegen warm-up run.
    {
      val storeRoot = java.nio.file.Files
        .createTempDirectory("graft_bench_bigstore").toString
      val bigCorpus = kg.fixtures.CorpusGen
        .generateDistributed(spark, 1050, 240, seed = 42L)
        .repartition(cpus.toInt * 4).cache()
      bigCorpus.count() // input materialized outside the timed span
      val rag = new graft.kg.GraphRag(spark,
        new graft.kg.pipeline.ParquetTableIO(storeRoot),
        GraftConfig(linkMode = "exact"))
      val ingestSec = time { rag.ingest(bigCorpus) }
      results += "kg_ingest_250k_store" -> ingestSec
      bigCorpus.unpersist(blocking = false)
      // keys carry the protocol in the name (median-of-3 AFTER one
      // warm-up call = warm steady-state, same as the small store's
      // kg_query_warm_* family). r4 names were kg_query_big_* — renamed,
      // recorded under "renamed_keys" in the JSON for cross-round joins.
      def med3(f: => Unit): Double = { f; (1 to 3).map(_ => time(f)).sorted.apply(1) }
      val q = "utils imports module parseTree"
      results += "kg_query_big_warm_hybrid_exact" -> med3 {
        rag.query(q, includeTriplets = false).chunks.count()
      }
      results += "kg_query_big_warm_hybrid_ann" -> med3 {
        rag.query(q, includeTriplets = false, vectorMode = "ann").chunks.count()
      }
      results += "kg_query_big_warm_relationship_indexed" -> med3 {
        rag.query("What does Utils use?", includeTriplets = true)
          .triplets.foreach(_.count())
      }
      // the multi-GB temp store must not accumulate across bench runs
      try {
        val fs = new org.apache.hadoop.fs.Path(storeRoot).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(storeRoot), true)
      } catch { case _: Throwable => () }
    }

    // a failed headline query must be visible in the JSON, not just a
    // stderr note — otherwise broken queries publish plausible numbers
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    headline.foreach { name =>
      Queries.all.get(name).foreach { fn =>
        val sec = time {
          try fn(spark, sfDir).count()
          catch { case e: Throwable =>
            failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}") }
        }
        results += name -> sec
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // "total" keeps its cross-round meaning: the ONE-TIME store-build key
    // (a ~250k-doc ingest, not a query) is reported per-key but excluded
    // from the sum — folding it in made r4's total incomparable with r3's
    val totalExcludes = Set("kg_ingest_250k_store")
    val total = results.collect {
      case (k, v) if !totalExcludes.contains(k) => v
    }.sum
    // headline kg_files_per_sec = END-TO-END (fresh plan + execution) on
    // the 1M-doc corpus — comparable with prior rounds' end-to-end figure;
    // the plan-once execution throughput gets its own key
    // (kg_exec_files_per_sec) and the sf-corpus number stays under its
    // planning-bound label for continuity
    val filesPerSec = if (bigE2eSec > 0) bigDocs / bigE2eSec else 0.0
    val execFilesPerSec = if (bigSec > 0) bigDocs / bigSec else 0.0
    val filesPerSecSf = if (kgExactSec > 0) nDocs / kgExactSec else 0.0
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","kg_docs":$nDocs,"kg_edges":$kgEdges,""" +
        s""""kg_throughput_docs":$bigDocs,""" +
        s""""kg_files_per_sec":${f"$filesPerSec%.1f"},""" +
        s""""kg_pipeline_1m_e2e_all":[${e2eRuns.map(x => f"$x%.3f").mkString(",")}],""" +
        s""""kg_exec_files_per_sec":${f"$execFilesPerSec%.1f"},""" +
        s""""kg_files_per_sec_sf_plan_bound":${f"$filesPerSecSf%.1f"},""" +
        s""""total_excludes":["kg_ingest_250k_store"],""" +
        s""""renamed_keys":{"kg_query_big_hybrid_exact":"kg_query_big_warm_hybrid_exact",""" +
        s""""kg_query_big_hybrid_ann":"kg_query_big_warm_hybrid_ann",""" +
        s""""kg_query_big_relationship_indexed":"kg_query_big_warm_relationship_indexed"},""" +
        s""""failed":$failedJson}"""
    // stdout (unprefixed via build.sbt outputStrategy) AND a file copy,
    // so the harness can parse the result either way. A failed write must
    // be LOUD — a silently stale result.json would publish a previous
    // round's numbers as this round's.
    println(json)
    try {
      val dir = java.nio.file.Paths.get("BENCH")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("result.json"), json)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARNING: BENCH/result.json not written " +
        s"(cwd=${System.getProperty("user.dir")}): ${e.getMessage} — " +
        "treat any existing result.json as STALE; the stdout JSON line is authoritative")
    }
    spark.stop()
  }
}
