package graft.kg.textspec

import scala.collection.mutable.ArrayBuffer

/** Parser for triplet-model output strings (reference
  * `core/triplets.py:152-205`), reproducing both branches:
  *
  *  P8 marker branch — output contains `<triplet>`: split on `<triplet>`,
  *  per non-blank segment take text before `</triplet>` (if present),
  *  strip `<pad>`, and if both `<relation>` and `<object>` markers are
  *  present take subj = before `<relation>`, rel = between `<relation>`
  *  and the FIRST `<object>`, obj = between the first and second
  *  `<object>` (Python `split("<object>")[1]`); all three trimmed and
  *  required non-empty.
  *
  *  P9 heuristic branch — no `<triplet>` marker: strip `<pad>`/`</s>`,
  *  trim, split on 2+ whitespace; accept iff exactly 3 parts.
  */
object TripletParse {

  /** Split on a literal delimiter, keeping trailing empties (Python
    * `str.split` semantics). */
  private def splitLit(s: String, delim: String): Array[String] =
    s.split(java.util.regex.Pattern.quote(delim), -1)

  def parse(modelOutput: String): Vector[(String, String, String)] = {
    if (modelOutput == null) return Vector.empty
    if (modelOutput.contains("<triplet>")) {
      val out = ArrayBuffer.empty[(String, String, String)]
      splitLit(modelOutput, "<triplet>").foreach { segment =>
        if (segment.trim.nonEmpty) {
          val withEnd =
            if (segment.contains("</triplet>")) splitLit(segment, "</triplet>")(0)
            else segment
          val content = withEnd.replace("<pad>", "")
          if (content.contains("<relation>") && content.contains("<object>")) {
            val subj = splitLit(content, "<relation>")(0).trim
            val afterRel = splitLit(content, "<relation>")(1)
            val rel = splitLit(afterRel, "<object>")(0).trim
            val objParts = splitLit(content, "<object>")
            val obj = objParts(1).trim
            if (subj.nonEmpty && rel.nonEmpty && obj.nonEmpty)
              out += ((subj, rel, obj))
          }
        }
      }
      out.toVector
    } else {
      val cleaned = modelOutput.replace("<pad>", "").replace("</s>", "").trim
      val parts = cleaned.split("""\s{2,}""")
      if (parts.length == 3) {
        val subj = parts(0).trim
        val rel = parts(1).trim
        val obj = parts(2).trim
        if (subj.nonEmpty && rel.nonEmpty && obj.nonEmpty)
          Vector((subj, rel, obj))
        else Vector.empty
      } else Vector.empty
    }
  }

  /** Relation sanitizer (reference `core/triplets.py:207-218`) — defined
    * and exported but never applied inside the reference pipeline (dead
    * code, SURVEY.md §1.2); implemented for API parity only. */
  def sanitizeRelation(rel: String): String =
    rel.replaceAll("[^0-9a-zA-Z_ ]", "").replace(' ', '_').toUpperCase
}
