package graft.kg.textspec

/** N-gram extraction spec (reference `core/nlp_graph.py:35-58`).
  *
  * Semantics pinned from the reference:
  *   - tokens = normalized tokens ([[Tokens.normalize]]).
  *   - unigrams = tokens minus stopwords (stopwords removed from
  *     UNIGRAMS ONLY, `nlp_graph.py:48-51`).
  *   - bigrams/trigrams are built over the UNfiltered normalized token
  *     stream (`nlp_graph.py:54-55`), space-joined.
  *   - duplicates are KEPT in the lists; set semantics are restored only
  *     by the MERGE-idempotent sink (SURVEY.md §2.9 U4).
  */
object NGrams {

  def ngrams(tokens: Seq[String], n: Int): Vector[String] =
    if (tokens.size < n) Vector.empty
    else tokens.sliding(n).map(_.mkString(" ")).toVector

  /** (unigrams, bigrams, trigrams) for a chunk text. */
  def extract(text: String, removeStopwords: Boolean = true)
      : (Vector[String], Vector[String], Vector[String]) = {
    val tokens = Tokens.normalize(text)
    val unigrams =
      if (removeStopwords) tokens.filterNot(Stopwords.english.contains)
      else tokens
    (unigrams, ngrams(tokens, 2), ngrams(tokens, 3))
  }
}
