package graft.kg.fixtures

import graft.kg.CorpusRow

import java.security.MessageDigest
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

/** Deterministic synthetic source-code-fact corpus (FIXTURES.md §1).
  *
  * Generates the Iceberg-shaped corpus table `(repo, path, commit, lang,
  * content)` from a fixed seed, with NO external data, together with the
  * ground-truth triple set each document's sentences encode. Templates are
  * chosen so the extractor spec (SURVEY.md §7.5) and the ground truth agree
  * by construction — the truth set is derived from the FACTS, not by
  * running the extractor, making the e2e P/R harness an independent check.
  *
  * Shape knobs from FIXTURES.md: controlled alias clusters
  * (`utilLib`/`UtilLib`/`util lib`) exercising lowercasing, exact-match and
  * ≥0.96-cosine linking, and CC canonicalization; hub entities (`main`,
  * `utils`) across many repos (skew); one mega-repo with 10× the files of
  * the median repo (mega-repo skew).
  */
object CorpusGen {

  final case class Generated(
      rows: Vector[CorpusRow],
      /** ground truth: distinct (lower(subj), lower(pred), lower(obj)) */
      truth: Set[(String, String, String)])

  private val prefixes = Vector(
    "util", "parse", "data", "graph", "node", "edge", "index", "query",
    "merge", "sort", "scan", "hash", "join", "read", "write", "cache",
    "token", "chunk", "link", "store", "shard", "batch", "plan", "exec")
  private val suffixes = Vector(
    "Lib", "Tree", "Frame", "Set", "Map", "List", "Engine", "Service",
    "Worker", "Helper", "Manager", "Buffer", "Builder", "Runner", "Handler")
  private val hubs = Vector("main", "utils")
  private val langs = Vector("scala", "java", "py", "go", "rs")

  /** Alias variants of an identifier: case variant (lowercase-identical →
    * exact-match link) and a space-split variant (near-dup → cosine link). */
  private def aliasVariants(id: String): Vector[String] = {
    val cap = id.head.toUpper + id.tail
    val spaced = id.flatMap(c => if (c.isUpper) " " + c.toLower else c.toString)
    Vector(id, cap, spaced)
  }

  // noise vocabulary — deliberately free of extractor lexicon phrases
  private val noiseWords = Vector(
    "quick", "brown", "fox", "jumped", "above", "lazy", "dog", "river",
    "stone", "cloud", "mountain", "forest", "breeze", "evening", "lantern")

  private def sha1Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  private val entities: Vector[String] =
    (for (p <- prefixes; s <- suffixes) yield p + s).toVector

  private def pickEntity(rnd: Random): String = {
    val r = rnd.nextInt(100)
    if (r < 8) hubs(rnd.nextInt(hubs.size)) // hub skew
    else {
      val base = entities(rnd.nextInt(entities.size))
      if (r < 20) { // alias cluster member
        val vs = aliasVariants(base)
        vs(rnd.nextInt(vs.size))
      } else base
    }
  }

  // (template, predicate-as-extracted) — object/subject are bare ids so
  // the extractor's tokens-before/after-phrase == the ids verbatim.
  private def factSentence(rnd: Random): (String, (String, String, String)) = {
    val a = pickEntity(rnd); val b = pickEntity(rnd)
    val t = rnd.nextInt(6)
    val (sent, pred) = t match {
      case 0 => (s"$a imports module $b.", "imports module")
      case 1 => (s"$a is defined in file $b.", "is defined in file")
      case 2 => (s"$a calls function $b.", "calls function")
      case 3 => (s"$a extends class $b.", "extends class")
      case 4 => (s"$a depends on $b.", "depends on")
      case _ => (s"$a uses $b.", "uses")
    }
    // sentences start with a capital so the splitter's boundary rule
    // (terminator + whitespace + capital) fires; lowered truth unchanged
    (sent.capitalize, (a.toLowerCase, pred, b.toLowerCase))
  }

  private def noiseSentence(rnd: Random): String = {
    val n = 5 + rnd.nextInt(8)
    val ws = Vector.fill(n)(noiseWords(rnd.nextInt(noiseWords.size)))
    ws.mkString(" ").capitalize + "."
  }

  /** All rows of one repo, drawing from `rnd` in the fixed template order
    * (the draw sequence is part of the corpus spec — both generators below
    * share it). Truth triples are appended to `truth` when supplied. */
  private def repoRows(
      rnd: Random,
      r: Int,
      filesPerRepo: Int,
      truth: scala.collection.mutable.Set[(String, String, String)]): Seq[CorpusRow] = {
    val repo = f"org/repo$r%03d"
    // mega-repo skew: repo 0 gets 10× the files
    val nFiles = if (r == 0) filesPerRepo * 10 else filesPerRepo
    (0 until nFiles).map { f =>
      val lang = langs(rnd.nextInt(langs.size))
      val path = f"src/pkg$f%04d.$lang"
      val nSents = 3 + rnd.nextInt(8)
      val sents = (0 until nSents).map { _ =>
        if (rnd.nextInt(100) < 70) {
          val (s, tr) = factSentence(rnd)
          if (truth != null) truth += tr
          s
        } else noiseSentence(rnd)
      }
      CorpusRow(repo, path, sha1Hex(repo + path).padTo(40, '0'),
        lang, sents.mkString(" "))
    }
  }

  def generate(repos: Int, filesPerRepo: Int, seed: Long = 42L): Generated = {
    val rnd = new Random(seed)
    val rows = ArrayBuffer.empty[CorpusRow]
    val truth = scala.collection.mutable.Set.empty[(String, String, String)]
    for (r <- 0 until repos) rows ++= repoRows(rnd, r, filesPerRepo, truth)
    Generated(rows.toVector, truth.toSet)
  }

  /** Distributed corpus generation for the bench/scaling harnesses: the
    * plan leaf is a `Range` (a few bytes), NOT a driver-side
    * `LocalRelation`. A 1M-row `spark.createDataset(localSeq)` embeds the
    * million-element row vector in the logical plan, and every Catalyst
    * analysis/check pass downstream then remaps that vector once per
    * Dataset construction — profiled at ~50 s of driver-serial time per
    * 1M-doc lsh pipeline run (the dominant term of the round-2 scaling
    * model's S ≈ 62 s "serial tail", which was the HARNESS, not the
    * engine). It also ships ~13 MB tasks and pins the corpus on the
    * driver heap; a real 100 TB job reads from storage, which is exactly
    * what a Range→flatMap leaf models.
    *
    * Rows are deterministic via per-repo seeding (`seed` mixed with the
    * repo index), independent of partitioning/order — NOT byte-identical
    * to [[generate]]'s single-sequential-RNG stream, which the sf-scale
    * oracle corpora keep using unchanged. */
  def generateDistributed(
      spark: org.apache.spark.sql.SparkSession,
      repos: Int,
      filesPerRepo: Int,
      seed: Long = 42L,
      repoOffset: Int = 0): org.apache.spark.sql.Dataset[CorpusRow] = {
    import spark.implicits._
    spark.range(0, repos.toLong)
      .flatMap { r0 =>
        // repoOffset slices the same deterministic corpus space into
        // DISJOINT repo ranges — the incremental bench ingests
        // [offset, offset+repos) per batch, so batches never collide on
        // docIds while still sharing the global entity vocabulary
        val r = r0 + repoOffset
        val mixed = seed ^ (r * 0x9E3779B97F4A7C15L) // splitmix64 increment
        repoRows(new Random(mixed), r.toInt, filesPerRepo, truth = null)
      }
  }
}
