package graft.tools

import graft.SparkEntry
import graft.kg.GraftConfig
import graft.kg.pipeline.Pipeline
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Diagnostic: decompose one full lsh pipeline run into Spark-job spans vs
  * driver-serial gaps (planning, probe collect, union-find, scheduling).
  * The gaps are the serial tail S of the T(c) = P/c + S scaling model in
  * BENCH/BASELINE.md — this main exists to measure S's composition, not
  * for the driver contract.
  *
  * Usage: runMain graft.tools.ProfileBench <cores> [repos] [files] [exact|lsh]
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val nums = args.filter(_.forall(_.isDigit)).map(_.toInt)
    val mode = args.find(a => a == "lsh" || a == "exact" || a == "cc").getOrElse("lsh")
    val cores = nums.headOption.getOrElse(32)
    val repos = nums.lift(1).getOrElse(4200)
    val files = nums.lift(2).getOrElse(240)

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-profile-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = graft.kg.fixtures.CorpusGen
      .generateDistributed(spark, repos, files, seed = 42L)
      .repartition(cores * 4).cache()
    val nDocs = corpus.count()

    val starts = mutable.Map.empty[Int, Long]
    val spans = mutable.ArrayBuffer.empty[(Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.synchronized { starts(js.jobId) = js.time }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.synchronized {
          spans += ((je.jobId, starts.getOrElse(je.jobId, je.time), je.time))
        }
    })

    val cfg =
      if (mode == "lsh" || mode == "cc")
        GraftConfig(linkMode = "lsh", linkThreshold = 0.85, saltedCanonicalJoin = true)
      else GraftConfig(linkMode = "exact")

    if (mode == "cc") {
      // dissect the linking/CC stages stepwise (mirrors Pipeline.run's lsh
      // branch) to locate the serial stall the job timeline shows
      import graft.kg.stages.{Ingest, Link, Triples => TriplesStage}
      def t[A](label: String)(f: => A): A = {
        val a = System.nanoTime(); val v = f
        System.err.println(f"[cc] $label: ${(System.nanoTime() - a) / 1e9}%.2f s")
        v
      }
      val docs = Ingest.docs(corpus)
      val chunks = Ingest.chunks(docs, cfg.maxTokensPerChunk)
      val triples = TriplesStage.triples(chunks, new graft.kg.extract.RuleSVOExtractor())
        .persist()
      t("triples count")(triples.count())
      val mentions = Link.mentions(triples)
      t("mentions count")(mentions.count())
      val mentionVecs = Link.mentionEmbeddings(mentions, new graft.kg.embed.HashEmbedder())
      val aliases = Link.lshAliases(mentionVecs, cfg.linkThreshold, cfg.linkTopK,
        maxBucket = cfg.lshMaxBucket)
      val distinctEdges = aliases.select($"a".as("u"), $"b".as("v"))
        .where($"u" =!= $"v").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nEdges = t("distinctEdges full count (parallel)")(distinctEdges.count())
      System.err.println(s"[cc] alias edges = $nEdges")
      val head = t("limit(131073).collect() on cached edges")(
        distinctEdges.limit(131073).collect())
      System.err.println(s"[cc] head rows = ${head.length}")
      val cc = t("connectedComponents end-to-end")(
        graft.kg.stages.Canonicalize.connectedComponents(aliases))
      t("cc count")(cc.count())
      spark.stop()
      return
    }

    // warm-up run (JIT, codegen caches) — drop its jobs
    { val r = new Pipeline(cfg).run(corpus)
      if (mode == "lsh") r.canonicalEdges.count() else r.edges.count()
      r.cleanup() }
    Thread.sleep(2000) // let async listener events drain before clearing
    starts.synchronized { spans.clear() }

    val t0 = System.nanoTime()
    val r = new Pipeline(cfg).run(corpus) // lsh: eager probe + CC inside
    val t1 = System.nanoTime()
    val n = if (mode == "lsh") r.canonicalEdges.count() else r.edges.count()
    val t2 = System.nanoTime()
    r.cleanup()
    Thread.sleep(2000) // drain listener events

    def s(ns: Long) = ns / 1e9
    println(f"[profile] mode=$mode cores=$cores docs=$nDocs edges=$n")
    println(f"[profile] run() span (plan + eager probe/CC): ${s(t1 - t0)}%.2f s")
    println(f"[profile] count() span (final job):           ${s(t2 - t1)}%.2f s")
    val sorted = starts.synchronized { spans.sortBy(_._2).toVector }
    val wall0 = t0 / 1000000 // listener times are epoch ms; report relative
    val base = sorted.headOption.map(_._2).getOrElse(0L)
    var covered = 0L
    var cursor = 0L
    sorted.foreach { case (id, st, en) =>
      val gapMs = st - (base + cursor)
      println(f"[profile] job $id%3d start=+${(st - base) / 1000.0}%7.2f s " +
        f"dur=${(en - st) / 1000.0}%7.2f s gapBefore=${math.max(gapMs, 0) / 1000.0}%6.2f s")
      cursor = math.max(cursor, en - base)
      covered += (en - st)
    }
    val totalMs = (t2 - t0) / 1000000
    println(f"[profile] wall=${totalMs / 1000.0}%.2f s, in-job=${covered / 1000.0}%.2f s, " +
      f"driver-serial (gaps+planning)=${(totalMs - covered) / 1000.0}%.2f s")
    val _ = wall0
    spark.stop()
  }
}
