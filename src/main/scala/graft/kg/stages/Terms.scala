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
}
