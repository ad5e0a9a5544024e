package graft

import graft.kg.GraftConfig
import graft.kg.pipeline.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry of operator-level queries (SURVEY.md §2 inventory + the
  * training-data ops) and their DuckDB oracle SQL. Query families live in
  * `graft.ops.*`; the KG-pipeline family runs over the synthesized corpus
  * and is checked against the INDEPENDENT expected-set oracle
  * ([[graft.kg.oracle.KgOracle]]) in addition to the ScalaTest P/R
  * harness.
  */
object Queries {

  /** One shared pipeline Result per (sfDir, mode): the 7 exact-mode kg_*
    * queries and the lsh query each used to rebuild (and re-plan) the full
    * DAG — verification-cost only, but 7× the pipeline at sf0.01. The
    * memoized Result persists its chunks/triples stages so every query's
    * action reuses the expensive chunk/extract work instead of recomputing
    * the lineage from the corpus scan. */
  private val kgCache = scala.collection.concurrent.TrieMap
    .empty[(Int, String, String),
      (java.lang.ref.WeakReference[SparkSession], Pipeline#Result)]

  private def kgResult(s: SparkSession, dir: String, mode: String): Pipeline#Result = {
    // keyed by SESSION identity too: a cached Result holds Datasets bound
    // to the session that built it — reusing them after a session restart
    // (same JVM, e.g. sequential harness phases) would throw instead of
    // rebuilding. Entries whose session is GONE (collected or stopped)
    // are evicted — but never a LIVE foreign session's: two sessions may
    // interleave kg_* evaluations, and tearing down the other's cached
    // Result mid-use would silently force full recomputation (or worse).
    // The weak reference also defuses identityHashCode collisions across
    // restarts: a collided entry's dead session is detected, not served.
    kgCache.foreach { case (k, (ref, _)) =>
      val sess = ref.get()
      if (sess == null || sess.sparkContext.isStopped)
        kgCache.remove(k).foreach { case (_, r) =>
          try { r.chunks.unpersist(blocking = false)
                r.triples.unpersist(blocking = false)
                r.cleanup() }
          catch { case _: Throwable => () } // stopped session: nothing to free
        }
    }
    kgCache.getOrElseUpdate((System.identityHashCode(s), dir, mode), {
      val cfg =
        if (mode == "lsh") GraftConfig(linkMode = "lsh", linkThreshold = 0.85)
        else GraftConfig(linkMode = mode)
      val r = new Pipeline(cfg).run(SparkEntry.syntheticCorpus(s, dir))
      r.chunks.persist()
      r.triples.persist()
      (new java.lang.ref.WeakReference(s), r)
    })._2
  }

  private val kgDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "kg_edges" -> ((s: SparkSession, dir: String) =>
      kgResult(s, dir, "exact").edges.toDF().orderBy("subj", "pred", "obj")),
    "kg_vertices" -> ((s: SparkSession, dir: String) =>
      kgResult(s, dir, "exact").vertices.toDF()
        .select(col("name"), col("canonicalName"), col("tripletPart"))
        .orderBy("name")),
    "kg_chunks" -> ((s: SparkSession, dir: String) =>
      kgResult(s, dir, "exact").chunks.toDF().orderBy("chunkId")),
    "kg_terms" -> ((s: SparkSession, dir: String) =>
      kgResult(s, dir, "exact").terms.toDF()
        .groupBy("chunkId", "text", "termType")
        .agg(count(lit(1)).as("tf")) // materialized-table shape (MERGE key + tf)
        .orderBy("chunkId", "termType", "text")),
    // query-side retrieval over the built graph (rows-only; the score
    // specs are covered by oracles q04-q07/q20 and RetrievalSuite)
    "kg_hybrid_search" -> ((s: SparkSession, dir: String) => {
      val r = kgResult(s, dir, "exact")
      new graft.kg.retrieve.Retrieval(new graft.kg.embed.HashEmbedder())
        .hybridSearch(r.terms.toDF(), r.chunks, r.chunkEmbeddings,
          "utils imports module parseTree")
    }),
    "kg_context_search" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val r = kgResult(s, dir, "exact")
      val retrieval = new graft.kg.retrieve.Retrieval(new graft.kg.embed.HashEmbedder())
      val hits = retrieval.termSearch(r.terms.toDF(), r.chunks, "parseTree utils")
        .select(col("chunkId"), col("score"))
      retrieval.withContext(hits, r.chunks)
    }),
    "kg_relationship_search" -> ((s: SparkSession, dir: String) => {
      val r = kgResult(s, dir, "exact")
      new graft.kg.retrieve.Retrieval(new graft.kg.embed.HashEmbedder())
        .relationshipSearch(r.edges.toDF(), "What does Utils use?")
    }),
    "kg_vector_ann" -> ((s: SparkSession, dir: String) => {
      // ANN vector search over the in-flight sign-sketch layout with
      // per-plane MEDIAN thresholds (the balanced-bucket default) —
      // checked against the independent straight-line KgOracle.vectorAnn
      // spec, which recomputes the medians with the same interpolation
      val r = kgResult(s, dir, "exact")
      val emb = new graft.kg.embed.HashEmbedder()
      val thr = graft.kg.retrieve.VectorIndex.computeThresholds(
        r.chunkEmbeddings.toDF(), emb.dim)
      val idx = graft.kg.retrieve.VectorIndex.layout(
        r.chunkEmbeddings.toDF(), emb.dim, thr)
      new graft.kg.retrieve.Retrieval(emb)
        .vectorSearchAnn(idx, r.chunks, "utils imports module parseTree",
          thresholds = thr)
    }),
    "kg_canonical_lsh" -> ((s: SparkSession, dir: String) => {
      // the reference's 0.96 cosine threshold is calibrated to E5
      // embeddings (triplets.py:260); the deterministic hash embedder
      // needs its own calibration — 0.85 puts true alias variants
      // ("util lib"/"utillib") above and unrelated names below
      val r = kgResult(s, dir, "lsh")
      r.canonical.toDF().filter(col("name") =!= col("canonicalName"))
        .orderBy("name")
    }),
    // the full canonical edge set under lsh linking (what compaction
    // materializes), against the straight-line KgOracle reimplementation
    "kg_canonical_edges" -> ((s: SparkSession, dir: String) => {
      val r = kgResult(s, dir, "lsh")
      r.canonicalEdges.toDF().orderBy("subj", "pred", "obj")
    }),
    // the facade's canonical relationship lookup: query-entity surface
    // forms canonicalized through the map, entity-bucket-pruned lookup
    // over the canonical edge index (GraphRag.query's triplet default)
    "kg_relationship_search_canonical" -> ((s: SparkSession, dir: String) => {
      val r = kgResult(s, dir, "lsh")
      val idx = graft.kg.pipeline.Pipeline.entityIndexRows(r.canonicalEdges.toDF())
      val cmap = r.canonical.toDF().filter(col("name") =!= col("canonicalName"))
      new graft.kg.retrieve.Retrieval(new graft.kg.embed.HashEmbedder())
        .relationshipSearchCanonical(idx, cmap,
          graft.kg.oracle.KgOracle.canonicalRelQuery)
    }))

  def all: Map[String, (SparkSession, String) => DataFrame] =
    kgDefs ++ ops.Relational.defs ++ ops.TextOps.defs ++ ops.DedupOps.defs ++
      ops.SimilarityOps.defs ++ ops.Multimodal.defs ++ ops.StreamingOps.defs

  def oracles: Map[String, String] =
    ops.Relational.oracles ++ ops.TextOps.oracles ++ ops.DedupOps.oracles ++
      ops.SimilarityOps.oracles ++ ops.Multimodal.oracles ++
      ops.StreamingOps.oracles ++ kg.oracle.KgOracle.oracles
}
