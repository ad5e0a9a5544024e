package graft.kg.stages

import graft.kg._
import graft.kg.textspec.NGrams
import org.apache.spark.sql.Dataset

/** Term (n-gram) extraction stage (reference `core/nlp_graph.py:35-58`,
  * sink semantics `nlp_graph.py:60-104`).
  *
  * Unigrams = normalized tokens minus stopwords; bigrams/trigrams over the
  * UNfiltered token stream; duplicates kept here (matching the reference's
  * lists) and removed only at materialization ([[Materialize]]), matching
  * Neo4j MERGE set semantics (SURVEY.md §2.9 U4).
  *
  * Scale: pure per-row flatMap, no shuffle; the dedup shuffle happens once
  * at materialize on the (chunkId, text, termType) key.
  */
object Terms {

  def terms(chunks: Dataset[Chunk], removeStopwords: Boolean = true): Dataset[Term] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.flatMap { c =>
      val (uni, bi, tri) = NGrams.extract(c.text, removeStopwords)
      uni.map(Term(c.chunkId, _, "unigram")) ++
        bi.map(Term(c.chunkId, _, "bigram")) ++
        tri.map(Term(c.chunkId, _, "trigram"))
    }
  }

  /** The materialized terms-table shape — (chunkId, text, termType, tf) —
    * computed INSIDE the per-chunk flatMap (r8, guide §2.3 "aggregate
    * before you shuffle", taken to its limit: the MERGE key starts with
    * chunkId and a chunkId's occurrences all live in its one input row,
    * so the tf aggregation is chunk-local and needs NO exchange at all).
    * Replaces materialize's former `groupBy(chunkId, text, termType)
    * .count()` over every occurrence row — a full shuffle of the largest
    * in-flight frame of the ingest (measured 17.3 s of the 83 s 250k-doc
    * store build) whose partial-aggregate output was already final
    * because the grouping key is partition-local. Row set identical for
    * any corpus without duplicate chunkIds in ONE batch (duplicates
    * collapse first-wins at the MERGE, same as every other table). */
  def termsWithTf(chunks: Dataset[Chunk],
      removeStopwords: Boolean = true): org.apache.spark.sql.DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.flatMap { c =>
      val (uni, bi, tri) = NGrams.extract(c.text, removeStopwords)
      def counted(xs: Seq[String], t: String): Iterator[(String, String, String, Long)] =
        xs.groupBy(identity).iterator.map { case (x, g) =>
          (c.chunkId, x, t, g.size.toLong)
        }
      counted(uni, "unigram") ++ counted(bi, "bigram") ++ counted(tri, "trigram")
    }.toDF("chunkId", "text", "termType", "tf")
  }
}
