package graft.tools

import graft.kg.GraftConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-stage decomposition of the batch LSH linking join (guide §1):
  * times each intermediate of Link.lshAliases separately — signatures,
  * bucket-cap window, candidate self-join, Jaccard filter, cosine
  * re-score, top-K — so the 10 s "linking" block from ProfileBench cc
  * mode can be attributed to an operator before touching anything.
  *
  * Usage: runMain graft.tools.LshProbe [cores] [repos] [files]
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val nums = args.filter(_.forall(_.isDigit)).map(_.toInt)
    val cores = nums.headOption.getOrElse(32)
    val repos = nums.lift(1).getOrElse(60)
    val files = nums.lift(2).getOrElse(30)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = GraftConfig(linkMode = "lsh", linkThreshold = 0.85)
    val corpus = graft.kg.fixtures.CorpusGen
      .generateDistributed(spark, repos, files, seed = 42L)
      .repartition(cores).cache()
    corpus.count()
    def t[A](label: String)(f: => A): A = {
      val a = System.nanoTime(); val v = f
      System.err.println(f"[lsh] $label: ${(System.nanoTime() - a) / 1e9}%.2f s")
      v
    }
    import graft.kg.stages.{Ingest, Link, Triples => TS}
    val docs = Ingest.docs(corpus)
    val chunks = Ingest.chunks(docs, cfg.maxTokensPerChunk)
    val triples = TS.triples(chunks, new graft.kg.extract.RuleSVOExtractor()).persist()
    t("triples count")(triples.count())
    val mentions = Link.mentions(triples).persist()
    t("mentions distinct count")(mentions.count())
    val emb = new graft.kg.embed.HashEmbedder()
    val mentionVecs = Link.mentionEmbeddings(mentions, emb).persist()
    t("mentionVecs count")(mentionVecs.count())
    // re-create lshAliases' internals stepwise (same exprs)
    val withSh = mentionVecs
      .withColumn("s0", concat(lit(""), lower($"name"), lit("")))
      .withColumn("sh", expr(
        """CASE WHEN length(s0) < 3 THEN array(s0)
           ELSE array_distinct(transform(sequence(0, length(s0) - 3),
                                         i -> substring(s0, i + 1, 3))) END"""))
      .drop("s0")
    val sigs = withSh
      .select($"name", $"vec", $"sh",
        explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("mh",
        expr("array_min(transform(sh, g -> md5(concat(cast(band AS string), '|', g))))"))
      .persist()
    t("sigs count")(sigs.count())
    val pruned = sigs
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy($"band", $"mh")))
      .filter($"bsz" <= 256)
      .drop("bsz")
      .persist()
    t("pruned count")(pruned.count())
    val pairs = pruned.as("x").join(pruned.as("y"),
        col("x.band") === col("y.band") && col("x.mh") === col("y.mh") &&
          col("x.name") < col("y.name"))
      .select(
        col("x.name").as("a"), col("x.vec").as("va"), col("x.sh").as("sha"),
        col("y.name").as("b"), col("y.vec").as("vb"), col("y.sh").as("shb"))
      .dropDuplicates("a", "b")
      .persist()
    t("pairs (cand) count")(pairs.count())
    System.err.println(s"[lsh] pair rows = ${pairs.count()}")
    val scored = pairs
      .withColumn("inter", size(array_intersect($"sha", $"shb")).cast("double"))
      .withColumn("jd",
        lit(1.0) - $"inter" /
          (size($"sha").cast("double") + size($"shb").cast("double") - $"inter"))
      .filter($"jd" <= 0.7)
      .withColumn("score", graft.functions.VectorFunctions.dot_product($"va", $"vb"))
      .filter($"score" >= cfg.linkThreshold)
      .select($"a", $"b", $"score")
      .persist()
    t("scored count")(scored.count())
    val sym = scored.unionByName(
      scored.select($"b".as("a"), $"a".as("b"), $"score"))
    val w = Window.partitionBy($"a").orderBy($"score".desc, $"b")
    val top = sym.withColumn("rn", row_number().over(w))
      .filter($"rn" <= cfg.linkTopK)
      .select($"a", $"b", $"score")
    t("topK count")(top.count())
    // and the un-decomposed original for reference
    val full = Link.lshAliases(Link.mentionEmbeddings(Link.mentions(triples), emb),
      cfg.linkThreshold, cfg.linkTopK, maxBucket = cfg.lshMaxBucket)
    t("lshAliases end-to-end count (cold plan)")(full.count())
    t("lshAliases end-to-end count (warm plan)")(full.count())
    spark.stop()
  }
}
