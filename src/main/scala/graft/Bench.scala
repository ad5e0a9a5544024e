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
  *
  * Measurement protocol (the sandbox shows 10-15% bursty CPU steal;
  * single-shot timings fluctuate 2-4×):
  *  - EVERY per-key number is a median of 3 iterations, and every
  *    iteration is published under `"iters"` — no key can be defined by
  *    one steal burst, and a reader can always see the spread (round 5
  *    committed a 21× artifact on a single-shot key; round 4 on the
  *    single-shot headline).
  *  - Cross-window guard, PER KEY and total: if any key with a
  *    substantial stored median (≥ 1 s in the previous round) regresses
  *    >2×, or the total does, the whole body reruns once in a second
  *    window and the window with fewer violations (tie → lower total)
  *    is kept WHOLE — one internally consistent measurement, never a
  *    per-key best-of-both composite. Both totals, the tripped keys and
  *    the kept window are published under `"window_guard"`.
  *  - VM-epoch calibration: two fixed single-threaded workloads (2M MD5
  *    digests, 200 MB file write+read) published under `"calibration"` —
  *    cross-SESSION absolute-latency comparisons are dominated by the
  *    sandbox VM's epoch (round 7 measured the same binary 2-3× apart
  *    across sessions with tight iterations), and the calibration gives
  *    readers a normalization denominator.
  *  - One-time store builds (`kg_ingest_250k_store`) stay single-shot
  *    per window (building a second store per window just to median it
  *    would double the bench for its least noise-prone key — it is
  *    I/O-bound and long enough to average steal out) but participate
  *    in the window guard like everything else.
  */
object Bench {

  val headline: Seq[String] = Seq(
    "q01_groupagg", "q03_context_range_join", "q11_dedup_merge",
    "q13_tokenize_explode", "q15_stopword_filter", "q21_token_count",
    "q22_quality_score", "q26_minhash_sig", "q27_minhash_jaccard",
    "q28_simhash", "q29_embed_cosine_dup", "q30_knn_bruteforce",
    "q31_ann_lsh_bucketed", "q32_multimodal_decode")

  final case class Window(
      results: scala.collection.mutable.LinkedHashMap[String, Double],
      iters: scala.collection.mutable.LinkedHashMap[String, Seq[Double]],
      failed: Seq[String],
      kgEdges: Long,
      e2eAll: Seq[Double],
      e2eSec: Double,
      execSec: Double) {
    def total(excludes: Set[String]): Double =
      results.collect { case (k, v) if !excludes.contains(k) => v }.sum
  }

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
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // VM-EPOCH CALIBRATION, published with every result: round 7 found
    // the same binary measuring the same store 2-3× apart across
    // sandbox sessions with TIGHT iterations — steal-burst heuristics
    // cannot catch a whole-VM slowdown. Two fixed single-threaded
    // workloads (2M MD5 digests; 200 MB buffered file write+read in the
    // bench's tmp dir) give any cross-round reader a normalization
    // denominator. Median of 3 each.
    val calibration: (Double, Double) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      var sink = 0L
      def cpuOnce(): Double = time {
        var i = 0
        while (i < 2000000) {
          sink ^= md.digest(java.nio.ByteBuffer.allocate(8)
            .putLong(i.toLong).array())(0)
          i += 1
        }
      }
      def ioOnce(): Double = {
        val f = java.nio.file.Files.createTempFile("graft_cal", ".bin")
        val buf = new Array[Byte](1 << 20)
        java.util.Arrays.fill(buf, 0x5a.toByte)
        val sec = time {
          val out = java.nio.file.Files.newOutputStream(f)
          try (0 until 200).foreach(_ => out.write(buf)) finally out.close()
          val in = java.nio.file.Files.newInputStream(f)
          val rb = new Array[Byte](1 << 20)
          try { var n = 0; while ({ n = in.read(rb); n > 0 }) sink ^= rb(0) }
          finally in.close()
        }
        java.nio.file.Files.delete(f)
        sec
      }
      val c = med((1 to 3).map(_ => cpuOnce()))
      val i = med((1 to 3).map(_ => ioOnce()))
      if (sink == Long.MinValue) System.err.println("") // keep sink live
      (c, i)
    }

    // input corpora prepared ONCE, outside every timed span
    val corpus = SparkEntry.syntheticCorpus(spark, sfDir).cache()
    val nDocs = corpus.count()
    val big = kg.fixtures.CorpusGen.generateDistributed(spark, 4200, 240, seed = 42L)
      .repartition(cpus.toInt * 4).cache()
    val bigDocs = big.count()

    def measureWindow(): Window = {
      val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val iters = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
      val failed = scala.collection.mutable.ArrayBuffer.empty[String]
      def timed3(name: String)(f: => Unit): Double = {
        val xs = (1 to 3).map(_ => time(f))
        iters(name) = xs
        val m = med(xs)
        results += name -> m
        m
      }

      // KG pipeline, exact mode (stock reference semantics): the north-rule
      // throughput measurement — rows in / wall sec.
      var kgEdges = 0L
      timed3("kg_pipeline_exact") {
        kgEdges = new Pipeline(GraftConfig(linkMode = "exact")).run(corpus).edges.count()
      }
      timed3("kg_pipeline_lsh") {
        val r = new Pipeline(GraftConfig(linkMode = "lsh")).run(corpus)
        r.canonicalEdges.count()
        r.cleanup()
      }

      // North-rule throughput at a non-planning-dominated size: the sf
      // corpus is ~2k docs, so its wall time is ~the 6 s Catalyst planning
      // constant and round-over-round deltas would track the planner, not
      // the engine. END-TO-END 1M-doc runs (fresh plan + full execution):
      // the headline kg_files_per_sec denominator; median of 3 fresh-plan
      // runs, every iteration published.
      val e2eAll = (1 to 3).map(_ => time {
        new Pipeline(GraftConfig(linkMode = "exact")).run(big).edges.count()
      })
      iters("kg_pipeline_1m_e2e") = e2eAll
      val e2eSec = med(e2eAll)
      results += "kg_pipeline_1m_e2e" -> e2eSec
      // plan-once / execute-many (the ScalingBench protocol — one plan,
      // hours of execution in production): median of 3 on a single built
      // plan, JIT-warm from the end-to-end runs above
      val bigPlanned = new Pipeline(GraftConfig(linkMode = "exact")).run(big).edges
      val execSec = timed3("kg_throughput_1m_exec") { bigPlanned.count(); () }

      // Query-side latency over a MATERIALIZED store (the pruned layouts'
      // payoff surface): one ingest, then the facade's retrieval paths.
      // COLD keys (first call: planning + listing + codegen) stay
      // single-shot by definition — their steady-state counterparts are
      // the median-protected kg_query_warm_* keys.
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
        // warm steady-state latency (the cold calls above were the
        // warm-up): what a resident query service pays per call
        timed3("kg_query_warm_hybrid_exact") {
          rag.query(q, includeTriplets = false).chunks.count()
        }
        timed3("kg_query_warm_hybrid_ann") {
          rag.query(q, includeTriplets = false, vectorMode = "ann").chunks.count()
        }
        timed3("kg_query_warm_relationship_indexed") {
          rag.query("What does Utils use?", includeTriplets = true)
            .triplets.foreach(_.count())
        }
      }

      // The same three queries at a NON-planning-bound store (VERDICT r3
      // #6): the sf store holds ~2k chunks, so its query wall time is
      // Catalyst planning, not scanning. One ~250k-doc store is
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
        results += "kg_ingest_250k_store" -> time { rag.ingest(bigCorpus) }
        bigCorpus.unpersist(blocking = false)
        val q = "utils imports module parseTree"
        def warm3(name: String)(f: => Unit): Unit = { f; timed3(name)(f); () }
        warm3("kg_query_big_warm_hybrid_exact") {
          rag.query(q, includeTriplets = false).chunks.count()
        }
        warm3("kg_query_big_warm_hybrid_ann") {
          rag.query(q, includeTriplets = false, vectorMode = "ann").chunks.count()
        }
        warm3("kg_query_big_warm_relationship_indexed") {
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

      // operator micro-queries: median-of-3, iterations published. A
      // failed query must be visible in the JSON, not just a stderr
      // note — otherwise broken queries publish plausible numbers.
      headline.foreach { name =>
        Queries.all.get(name).foreach { fn =>
          timed3(name) {
            try fn(spark, sfDir).count()
            catch { case e: Throwable =>
              if (!failed.contains(name)) failed += name
              System.err.println(s"[bench] $name failed: ${e.getMessage}") }
          }
        }
      }
      Window(results, iters, failed.toSeq, kgEdges, e2eAll, e2eSec, execSec)
    }

    val totalExcludes = Set("kg_ingest_250k_store")
    // previous stored round, read BEFORE this run overwrites the file —
    // the cross-window guard's reference points. The guard is PER-KEY as
    // well as total: round 6's total-only trigger let a window whose e2e
    // median was a 2.7× steal artifact ship because the TOTAL stayed
    // under 2× — any substantial key (previous median ≥ 1 s) regressing
    // >2× now trips a rerun.
    val (prevTotal: Option[Double], prevKeys: Map[String, Double]) = try {
      val p = java.nio.file.Paths.get("BENCH/result.json")
      if (!java.nio.file.Files.exists(p)) (None, Map.empty[String, Double])
      else {
        val text = java.nio.file.Files.readString(p)
        // guard only against a SAME-SF previous result: a verify drive at
        // sf0.01 must not become the reference the sf0.1 round trips on
        val sameSf = """"sf":"([^"]+)"""".r.findFirstMatchIn(text)
          .exists(_.group(1) == sfDir)
        if (!sameSf) (None, Map.empty[String, Double])
        else {
          val t = """"metric":"total","value":([0-9.]+)""".r
            .findFirstMatchIn(text).map(_.group(1).toDouble)
          val ks = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(text)
            .map(_.group(1)).getOrElse("")
          val kvs = """"([A-Za-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(ks)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
          (t, kvs)
        }
      }
    } catch { case _: Throwable => (None, Map.empty[String, Double]) }

    // keys the guard watches: substantial previous medians only — a 0.2 s
    // micro key doubling on scheduler jitter must not burn a full rerun
    def trippedKeys(win: Window): Seq[String] =
      win.results.collect {
        case (k, v) if prevKeys.get(k).exists(p => p >= 1.0 && v > 2 * p) => k
      }.toSeq
    def guardViolations(win: Window): Int =
      trippedKeys(win).size +
        (if (prevTotal.exists(p => win.total(totalExcludes) > 2 * p)) 1 else 0)

    val w1 = measureWindow()
    val v1 = guardViolations(w1)
    val (w, windowGuardJson) =
      if (v1 == 0)
        (w1, prevTotal.map(p =>
          s"""{"triggered":false,"prev_total":${f"$p%.3f"}}""")
          .getOrElse("""{"triggered":false}"""))
      else {
        // a steal-heavy window: rerun the whole body once and keep the
        // window with fewer guard violations (tie → lower total) WHOLE —
        // an internally consistent single measurement, never a per-key
        // best-of-both composite that no window actually produced. Both
        // totals and the tripped keys are published.
        System.err.println(s"[bench] window guard: " +
          s"${trippedKeys(w1).mkString(",")} regressed >2x vs stored " +
          "round (or total did) — rerunning in a second window")
        val w2 = measureWindow()
        val v2 = guardViolations(w2)
        val keep =
          if (v2 < v1) w2
          else if (v1 < v2) w1
          else if (w2.total(totalExcludes) < w1.total(totalExcludes)) w2
          else w1
        (keep,
          s"""{"triggered":true,"prev_total":${
            prevTotal.map(p => f"$p%.3f").getOrElse("null")},""" +
            s""""tripped_keys":[${trippedKeys(w1).map("\"" + _ + "\"")
              .mkString(",")}],""" +
            s""""window1_total":${f"${w1.total(totalExcludes)}%.3f"},""" +
            s""""window2_total":${f"${w2.total(totalExcludes)}%.3f"},""" +
            s""""kept_window":${if (keep eq w2) 2 else 1}}""")
      }

    big.unpersist(blocking = false)
    val total = w.total(totalExcludes)
    // headline kg_files_per_sec = END-TO-END (fresh plan + execution) on
    // the 1M-doc corpus — comparable with prior rounds' end-to-end figure;
    // the plan-once execution throughput gets its own key
    // (kg_exec_files_per_sec) and the sf-corpus number stays under its
    // planning-bound label for continuity
    val filesPerSec = if (w.e2eSec > 0) bigDocs / w.e2eSec else 0.0
    val execFilesPerSec = if (w.execSec > 0) bigDocs / w.execSec else 0.0
    val kgExactSec = w.results("kg_pipeline_exact")
    val filesPerSecSf = if (kgExactSec > 0) nDocs / kgExactSec else 0.0
    val qs = w.results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val itersJson = w.iters.map { case (k, xs) =>
      "\"" + k + "\":[" + xs.map(x => f"$x%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val failedJson = w.failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","kg_docs":$nDocs,"kg_edges":${w.kgEdges},""" +
        s""""kg_throughput_docs":$bigDocs,""" +
        s""""kg_files_per_sec":${f"$filesPerSec%.1f"},""" +
        s""""kg_pipeline_1m_e2e_all":[${w.e2eAll.map(x => f"$x%.3f").mkString(",")}],""" +
        s""""kg_exec_files_per_sec":${f"$execFilesPerSec%.1f"},""" +
        s""""kg_files_per_sec_sf_plan_bound":${f"$filesPerSecSf%.1f"},""" +
        s""""iters":$itersJson,""" +
        s""""calibration":{"md5_2m_sec":${f"${calibration._1}%.3f"},""" +
        s""""file_200mb_rw_sec":${f"${calibration._2}%.3f"}},""" +
        s""""window_guard":$windowGuardJson,""" +
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
