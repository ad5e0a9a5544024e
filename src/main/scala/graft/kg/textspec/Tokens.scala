package graft.kg.textspec

import scala.collection.mutable.ArrayBuffer

/** Deterministic tokenizer spec (SURVEY.md §7.5).
  *
  * Stands in for `nltk.word_tokenize` (reference `core/ingest.py:86`,
  * `core/nlp_graph.py:45`). Spec:
  *
  *   - A word token is a maximal run of `[A-Za-z0-9_]`.
  *   - Any other non-whitespace character is a single-character token
  *     (punctuation survives tokenization, like NLTK, and is then removed
  *     by the isalnum filter — reference `nlp_graph.py:45`).
  *
  * `normalize` reproduces `[w.lower() for w in word_tokenize(text) if
  * w.isalnum()]`: Python `str.isalnum` is false for `_` and for empty
  * strings, true for letter/digit-only tokens.
  */
object Tokens {

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_' || c.isLetterOrDigit

  def tokenize(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text(i)
      if (c.isWhitespace) i += 1
      else if (isWordChar(c)) {
        var j = i + 1
        while (j < n && isWordChar(text(j))) j += 1
        out += text.substring(i, j)
        i = j
      } else {
        out += c.toString
        i += 1
      }
    }
    out.toVector
  }

  /** Python `str.isalnum` semantics: non-empty, all letter-or-digit. */
  def isAlnum(t: String): Boolean = t.nonEmpty && t.forall(_.isLetterOrDigit)

  /** `[w.lower() for w in word_tokenize(text) if w.isalnum()]`
    * (reference `core/nlp_graph.py:45`). */
  def normalize(text: String): Vector[String] =
    tokenize(text).filter(isAlnum).map(_.toLowerCase)

  /** Token count for the chunk budget (reference `core/ingest.py:86`:
    * `len(nltk.word_tokenize(sent))` — punctuation counts). Allocation-free
    * state machine equal to `tokenize(text).size` (hot path: runs per
    * sentence AND per chunk in the greedy chunker). */
  def count(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    var n = 0
    var i = 0
    val len = text.length
    var inWord = false
    while (i < len) {
      val c = text(i)
      if (c.isWhitespace) inWord = false
      else if (isWordChar(c)) {
        if (!inWord) { n += 1; inWord = true }
      } else { n += 1; inWord = false } // single-char punct token
      i += 1
    }
    n
  }
}
