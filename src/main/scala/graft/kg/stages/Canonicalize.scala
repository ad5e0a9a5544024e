package graft.kg.stages

import graft.kg._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Canonicalization of aliased mentions via connected components
  * (SURVEY.md §2.6 J4).
  *
  * The reference's J4 "canonicalization" is a per-triplet cross-product of
  * alias sets (`triplets.py:371-398`). The rebuild replaces it with a
  * proper global merge: alias pairs from [[Link]] form an undirected
  * graph; each component's canonical name is its lexicographic minimum.
  *
  * Algorithm: iterative min-label propagation on DataFrames (the
  * DataFrame-native equivalent of large-star/small-star — Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Alias
  * components are tiny (the top-10-per-probe cap bounds degree, like the
  * reference's cap bounds its cross-product at 11³), so convergence is a
  * handful of iterations; each iteration `localCheckpoint`s to truncate
  * lineage (SURVEY.md §7.6.5).
  */
object Canonicalize {

  /** name → canonicalName for every name appearing in `aliases`; names
    * with no alias edges are their own canonical (identity is implicit —
    * [[apply]] only materializes non-identity mappings). */
  def connectedComponents(
      aliases: Dataset[AliasPair],
      maxIterations: Int = 25): Dataset[CanonicalMapping] = {
    val spark = aliases.sparkSession
    import spark.implicits._

    // symmetric edge list (a,b) + (b,a), distinct
    val edges = aliases.select($"a", $"b")
      .unionByName(aliases.select($"b".as("a"), $"a".as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // labels: every vertex starts as its own canonical
    var labels = edges.select($"a".as("name")).distinct()
      .withColumn("label", $"name")
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // candidate label per vertex = min(own label, min of neighbor labels)
      val neighborMin = edges
        .join(labels.withColumnRenamed("name", "b"), Seq("b"))
        .groupBy($"a".as("name"))
        .agg(min($"label").as("nlabel"))
      val next = labels
        .join(neighborMin, Seq("name"), "left")
        .select($"name",
          least($"label", coalesce($"nlabel", $"label")).as("label"))
        .localCheckpoint() // truncate lineage per iteration
      val changed = next.as("n").join(labels.as("o"), Seq("name"))
        .filter($"n.label" =!= $"o.label").limit(1).count() > 0
      labels = next
      converged = !changed
      iter += 1
    }
    edges.unpersist()
    labels.select($"name", $"label".as("canonicalName")).as[CanonicalMapping]
  }

  /** Full canonical map over a mention set: identity for unlinked names. */
  def canonicalMap(
      mentionNames: DataFrame, // (name)
      aliases: Dataset[AliasPair]): Dataset[CanonicalMapping] = {
    val spark = mentionNames.sparkSession
    import spark.implicits._
    val cc = connectedComponents(aliases)
    mentionNames.select($"name").distinct()
      .join(cc, Seq("name"), "left")
      .select($"name", coalesce($"canonicalName", $"name").as("canonicalName"))
      .as[CanonicalMapping]
  }
}
