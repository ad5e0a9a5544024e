package graft.tools

import graft.kg.GraftConfig
import graft.kg.pipeline.Pipeline
import graft.kg.fixtures.CorpusGen
import graft.kg.stages.Link
import org.apache.spark.sql.SparkSession

/** Blocking-recall study for the entity-linking stage (VERDICT r3 #8):
  * of the GROUND-TRUTH alias pairs the corpus generator planted
  * (CorpusGen aliasVariants — lowercased, each base id yields the pair
  * {"utillib", "util lib"}), what fraction does each stage of
  * [[Link.lshAliases]] keep?
  *
  *  - blocked: the pair shares at least one MinHash band value (the
  *    band equi-join would produce it as a candidate) — the only stage
  *    that can silently lose a pair at scale, since everything after it
  *    is an exact computation on the candidate;
  *  - linked: the pair survives the full stage (Jaccard cap + cosine ≥
  *    threshold + top-K) in an actual pipeline run.
  *
  * The banding math is computed driver-side with the same md5 spec the
  * engine uses, so "blocked" is exact, not sampled.
  *
  * Usage: runMain graft.tools.LinkRecall [repos] [filesPerRepo]
  */
object LinkRecall {

  /** Band minhash of a name — the Link.lshAliases spec, straight-line:
    * char-3-gram shingles of "" + lower(name) + "", band b's
    * signature = min over shingles g of md5("<b>|" + g). */
  private def bandSigs(name: String, numBands: Int): Vector[String] = {
    val s = "" + name.toLowerCase + ""
    val shingles =
      if (s.length < 3) Vector(s)
      else (0 to s.length - 3).map(i => s.substring(i, i + 3)).distinct.toVector
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String): String =
      md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    (0 until numBands).map { b =>
      shingles.map(g => md5hex(s"$b|$g")).min
    }.toVector
  }

  def main(args: Array[String]): Unit = {
    val repos = args.lift(0).map(_.toInt).getOrElse(30)
    val files = args.lift(1).map(_.toInt).getOrElse(70)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-link-recall")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = spark.createDataset(CorpusGen.generate(repos, files, seed = 42L).rows)
    val cfg = GraftConfig(linkMode = "lsh", linkThreshold = 0.85)
    val run = new Pipeline(cfg).run(corpus)
    val mentions = run.mentionVecs.select("name").as[String].collect().toSet

    // ground truth: a planted cluster is {id.toLowerCase, spacedVariant}
    // (the case variant collapses into the former under lowercasing); a
    // pair is in scope when BOTH variants actually occur as mentions
    val truePairs = mentions.flatMap { m =>
      if (!m.contains(' ')) None
      else {
        val collapsed = m.replace(" ", "")
        if (mentions.contains(collapsed) && collapsed != m) Some((collapsed, m))
        else None
      }
    }
    println(s"mentions=${mentions.size} planted-alias pairs in scope=${truePairs.size}")

    val numBands = 8
    val blocked = truePairs.filter { case (a, b) =>
      bandSigs(a, numBands).zip(bandSigs(b, numBands)).exists(p => p._1 == p._2)
    }
    val aliasPairs = run.aliases.collect()
      .map(p => Set(p.a, p.b)).toSet
    val linked = truePairs.filter { case (a, b) => aliasPairs.contains(Set(a, b)) }
    run.cleanup()

    def pct(n: Int) = f"${100.0 * n / math.max(1, truePairs.size)}%.1f%%"
    println(s"blocked by >=1 of $numBands bands: ${blocked.size}/${truePairs.size} (${pct(blocked.size)})")
    println(s"linked end-to-end (jaccard+cosine+topK): ${linked.size}/${truePairs.size} (${pct(linked.size)})")
    val lostAtBlocking = truePairs -- blocked
    val lostAfter = blocked -- linked
    if (lostAtBlocking.nonEmpty)
      println(s"lost at blocking (sample): ${lostAtBlocking.take(5).mkString(", ")}")
    if (lostAfter.nonEmpty)
      println(s"blocked but not linked (sample): ${lostAfter.take(5).mkString(", ")}")
    spark.stop()
  }
}
