package graft.kg.stages

import graft.kg._
import graft.kg.embed.Embedder
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity linking (reference `core/triplets.py:252-343`).
  *
  * The reference queries a Neo4j vector index per mention (top-10
  * neighbors, cosine ≥ 0.96) with an exact lowercase-match union — but the
  * index is never actually created, so the stock behavior degrades to
  * exact match only (SURVEY.md §1.2). We implement both:
  *
  *  - `exactAliases` — J2: lowercase equality. After lowercasing, exact
  *    match is the identity on the mention set, so it adds no alias pairs;
  *    it exists to make the stock linking semantics explicit.
  *
  *  - `lshAliases` — J1 as a scale-path replacement for per-row ANN: the
  *    distinct mention strings are MinHash-LSH blocked on char-3-gram
  *    sets (`approxSimilarityJoin`), then candidate pairs are re-scored
  *    with EXACT cosine over the hash embeddings and kept at
  *    `cosine ≥ threshold`, capped at top-`linkTopK` per probe
  *    (`row_number` window — reference's top-10, `triplets.py:257`).
  *
  * Scale notes: linking joins DISTINCT mentions (embed-once,
  * SURVEY.md §4.2 — the reference re-embeds per triplet occurrence); the
  * LSH join is a blocked join, never a cross product; skewed hub mentions
  * are identical strings and thus collapse in the distinct step BEFORE the
  * join, so hub skew never reaches the shuffle.
  */
object Link {

  /** Distinct lowercased mentions with their roles. Role priority for the
    * vertex `triplet_part` property is resolved in [[Materialize]]. */
  def mentions(triples: Dataset[Triple]): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    triples
      .select(
        explode(array(
          struct(lower($"subj").as("name"), lit("subject").as("role")),
          struct(lower($"pred").as("name"), lit("predicate").as("role")),
          struct(lower($"obj").as("name"), lit("object").as("role")))).as("m"))
      .select($"m.name", $"m.role")
      .distinct()
  }

  /** Embed each distinct mention name exactly once (vs the reference's
    * 3 embeds per triplet occurrence, `triplets.py:234-236`). */
  def mentionEmbeddings(mentionNames: DataFrame, embedder: Embedder): DataFrame = {
    val spark = mentionNames.sparkSession
    import spark.implicits._
    mentionNames.select($"name").distinct().as[String]
      .mapPartitions { it => it.map(n => (n, embedder.embedPassage(n))) }
      .toDF("name", "vec")
  }

  /** J2 exact-match linking: identity on lowercased names → no pairs. */
  def exactAliases(spark: org.apache.spark.sql.SparkSession): Dataset[AliasPair] = {
    import spark.implicits._
    spark.emptyDataset[AliasPair]
  }

  /** Char-3-gram shingles of a name (matching the hash-embedder's feature
    * space so LSH blocking and cosine re-scoring agree), as a native
    * higher-order expression over an `s0` sentinel-wrapped column — stays
    * inside WholeStageCodegen instead of deserializing every name through
    * a Scala UDF closure. */
  private def shinglesExpr: org.apache.spark.sql.Column =
    expr(
      """CASE WHEN length(s0) < 3 THEN array(s0)
         ELSE array_distinct(transform(sequence(0, length(s0) - 3),
                                       i -> substring(s0, i + 1, 3))) END""")

  /** J1: MinHash-LSH blocking + exact-cosine re-score ≥ threshold,
    * top-`linkTopK` per probe. Returns symmetric alias pairs (a ≠ b). */
  def lshAliases(
      mentionVecs: DataFrame, // (name, vec: Array[Float])
      threshold: Double,
      linkTopK: Int,
      jaccardDistanceCap: Double = 0.7,
      numHashTables: Int = 5): Dataset[AliasPair] = {
    val spark = mentionVecs.sparkSession
    import spark.implicits._

    val withShingles = mentionVecs
      .withColumn("s0", concat(lit("\u0001"), lower($"name"), lit("\u0002")))
      .withColumn("sh", shinglesExpr)
      .drop("s0")
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(withShingles)
      // MinHashLSH requires ≥1 non-zero entry; shingles are never empty
      .select($"name", $"vec", $"features")

    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(feats)
    val pairs = model
      .approxSimilarityJoin(feats, feats, jaccardDistanceCap, "jaccardDist")
      .select(
        col("datasetA.name").as("a"), col("datasetA.vec").as("va"),
        col("datasetB.name").as("b"), col("datasetB.vec").as("vb"))
      .filter($"a" < $"b") // dedupe symmetric pairs + drop self-pairs

    // EXACT re-score with the native codegen'd dot_product expression
    // (vectors are unit-L2, so dot == cosine): the hottest loop of the
    // linking stage stays columnar instead of deserializing two 768-float
    // arrays per candidate pair through a UDF
    val scored = pairs
      .withColumn("score", graft.functions.VectorFunctions.dot_product($"va", $"vb"))
      .filter($"score" >= threshold)
      .select($"a", $"b", $"score")

    // top-K per probe, both directions (reference caps neighbors per probe)
    val sym = scored.unionByName(
      scored.select($"b".as("a"), $"a".as("b"), $"score"))
    val w = Window.partitionBy($"a").orderBy($"score".desc, $"b")
    sym.withColumn("rn", row_number().over(w))
      .filter($"rn" <= linkTopK)
      .select($"a", $"b", $"score")
      .as[AliasPair]
  }
}
