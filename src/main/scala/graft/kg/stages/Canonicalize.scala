package graft.kg.stages

import graft.kg._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Canonicalization of aliased mentions via connected components
  * (SURVEY.md §2.6 J4).
  *
  * The reference's J4 "canonicalization" is a per-triplet cross-product of
  * alias sets (`triplets.py:371-398`). The rebuild replaces it with a
  * proper global merge: alias pairs from [[Link]] form an undirected
  * graph; each component's canonical name is its minimum (lexicographic).
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR on DataFrames (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
  * O(log d) rounds, supernode-safe: large-star splits high-degree nodes'
  * neighborhoods instead of funneling them through one reducer). Each
  * round `localCheckpoint`s to truncate lineage (SURVEY.md §7.6.5).
  * Alias components here are small (top-10-per-probe cap bounds degree),
  * but the algorithm is chosen for the 10^12-file regime where hub
  * entities produce components with millions of members.
  */
object Canonicalize {

  /** One large-star round: for every node u (over symmetric edges),
    * m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u) with v > u. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy(col("u"))
      .agg(collect_set(col("v")).as("ns"))
      .select(col("u"), least(col("u"), array_min(col("ns"))).as("m"), col("ns"))
      .select(explode(expr("filter(ns, x -> x > u)")).as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: orient edges parent-ward (u = max, v = min);
    * for every u, m = min(smaller-neighbors ∪ {u}); emit (v, m) for each
    * smaller neighbor v plus (u, m). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
    oriented.groupBy(col("u"))
      .agg(collect_set(col("v")).as("ns"))
      .select(col("u"), array_min(col("ns")).as("m"), col("ns"))
      .select(col("u"), col("m"),
        explode(concat(col("ns"), array(col("u")))).as("n"))
      .select(col("n").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** name → canonicalName for every name appearing in `aliases`
    * (non-identity mappings only appear for linked names; [[canonicalMap]]
    * adds the identity rows). */
  def connectedComponents(
      aliases: Dataset[AliasPair],
      maxIterations: Int = 30): Dataset[CanonicalMapping] = {
    val spark = aliases.sparkSession
    import spark.implicits._

    // per-iteration lineage barrier: localCheckpoint (executor-memory) by
    // default; if the session has a reliable checkpoint dir configured
    // (spark.sparkContext.setCheckpointDir), use a storage-backed
    // checkpoint instead — at real cluster scale an executor loss would
    // otherwise force recomputing the whole iteration chain.
    def barrier(df: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    var edges = barrier(
      aliases.select(col("a").as("u"), col("b").as("v"))
        .where(col("u") =!= col("v"))
        .distinct())

    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIterations) {
      val next = barrier(smallStar(largeStar(edges)))
      // fixpoint: symmetric difference empty — ONE action per iteration
      // (union of both exceptAll sides under a single limit-1 scan)
      converged = next.exceptAll(edges)
        .union(edges.exceptAll(next))
        .isEmpty
      edges = next
      iter += 1
    }
    // at fixpoint every edge is (node, componentMin)
    edges.select(col("u").as("name"), col("v").as("canonicalName"))
      .groupBy(col("name")).agg(min(col("canonicalName")).as("canonicalName"))
      .as[CanonicalMapping]
  }

  /** Full canonical map over a mention set: identity for unlinked names.
    * The CC output holds only the LINKED names (a small subset of the
    * mention vocabulary — alias clusters are rare relative to distinct
    * mentions), so it is broadcast: the plan is a single-pass
    * BroadcastHashJoin over the mention set instead of a sort-merge join
    * with two shuffles (seen in the kg_canonical_lsh plan audit). */
  def canonicalMap(
      mentionNames: DataFrame, // (name)
      aliases: Dataset[AliasPair]): Dataset[CanonicalMapping] = {
    val spark = mentionNames.sparkSession
    import spark.implicits._
    val cc = connectedComponents(aliases)
    mentionNames.select(col("name")).distinct()
      .join(broadcast(cc.toDF()), Seq("name"), "left")
      .select(col("name"), coalesce(col("canonicalName"), col("name")).as("canonicalName"))
      .as[CanonicalMapping]
  }
}
