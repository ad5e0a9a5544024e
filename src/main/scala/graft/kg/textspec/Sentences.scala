package graft.kg.textspec

import scala.collection.mutable.ArrayBuffer

/** Deterministic sentence-splitting spec (SURVEY.md §7.5).
  *
  * Stands in for `nltk.sent_tokenize` (reference `core/ingest.py:80`,
  * `core/triplets.py:419`). The reference's punkt model is not
  * bit-reproducible offline, so we own a written spec:
  *
  *   - A sentence boundary is a run of terminators `[.!?]` (optionally
  *     followed by closing quotes/brackets `"')]`), followed by
  *     whitespace, followed by an upper-case letter, digit, or opening
  *     quote/bracket.
  *   - A terminator preceded by a known abbreviation (case-insensitive,
  *     e.g. "Dr", "e.g") or by a single letter (initials like "J.") is
  *     NOT a boundary.
  *   - A blank line (two or more newlines) is always a boundary.
  *   - Sentences are emitted verbatim (trimmed); empty sentences dropped.
  *
  * Pure function, zero Spark deps — unit-testable and usable from both
  * the pipeline and the independent oracle.
  */
object Sentences {

  private val Abbreviations: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc",
    "e.g", "i.e", "fig", "al", "inc", "ltd", "co", "corp", "no", "dept",
    "est", "approx", "min", "max", "vol", "pp", "ed", "eds", "cf")

  private def isTerminator(c: Char): Boolean = c == '.' || c == '!' || c == '?'
  private def isCloser(c: Char): Boolean =
    c == '"' || c == '\'' || c == ')' || c == ']' || c == '”' || c == '’'
  private def isOpener(c: Char): Boolean =
    c == '"' || c == '\'' || c == '(' || c == '[' || c == '“' || c == '‘'

  /** The word immediately preceding position `i` (exclusive), lowercased,
    * without a trailing period run. */
  private def precedingWord(text: String, i: Int): String = {
    var end = i
    var start = end
    while (start > 0 && !text(start - 1).isWhitespace) start -= 1
    val w = text.substring(start, end)
    w.stripSuffix(".").toLowerCase
  }

  def split(text: String): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var sentStart = 0
    var i = 0

    def emit(endExclusive: Int): Unit = {
      val s = text.substring(sentStart, endExclusive).trim
      if (s.nonEmpty) out += s
    }

    while (i < n) {
      val c = text(i)
      if (c == '\n') {
        // blank line (>= 2 newlines, whitespace between allowed) = hard boundary
        var j = i + 1
        var newlines = 1
        while (j < n && text(j).isWhitespace) {
          if (text(j) == '\n') newlines += 1
          j += 1
        }
        if (newlines >= 2) {
          emit(i)
          sentStart = j
          i = j
        } else i += 1
      } else if (isTerminator(c)) {
        // consume the terminator run and any closers
        var j = i
        while (j < n && isTerminator(text(j))) j += 1
        var k = j
        while (k < n && isCloser(text(k))) k += 1
        val isEllipsisOrMulti = (j - i) > 1
        val prev = if (c == '.' && !isEllipsisOrMulti) precedingWord(text, i) else ""
        val abbrev = c == '.' && !isEllipsisOrMulti &&
          (Abbreviations.contains(prev) || (prev.length == 1 && prev.head.isLetter))
        // boundary iff followed by whitespace + capital/digit/opener, or EOT
        if (!abbrev) {
          if (k >= n) {
            emit(k)
            sentStart = k
            i = k
          } else {
            var m = k
            while (m < n && (text(m) == ' ' || text(m) == '\t')) m += 1
            val followedByNewline = m < n && text(m) == '\n'
            val startsNew = m < n && m > k &&
              (text(m).isUpper || text(m).isDigit || isOpener(text(m)))
            if (startsNew || followedByNewline) {
              emit(k)
              sentStart = m
              i = m
            } else i = k
          }
        } else i = k
      } else i += 1
    }
    if (sentStart < n) emit(n)
    out.toVector
  }
}
