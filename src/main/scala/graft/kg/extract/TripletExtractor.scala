package graft.kg.extract

import graft.kg.textspec.{Tokens, TripletParse}

/** Triple-extraction stage interface (reference `core/triplets.py:134-150`:
  * per-sentence T5 seq2seq generate, `max_length=64`, decoded WITH special
  * tokens so the `<triplet>` markers survive). A real model plugs in behind
  * this trait inside a `mapPartitions`-batched stage; the sandbox default
  * is the deterministic [[RuleSVOExtractor]] (SURVEY.md §7.5).
  *
  * `generate` returns the raw model-output STRING (marker format), which is
  * then parsed by [[graft.kg.textspec.TripletParse]] — so the reference's
  * parse logic (P8/P9) is exercised verbatim on every sentence.
  */
trait TripletExtractor extends Serializable {
  /** Simulate `tokenizer.decode(model.generate(sentence))`. */
  def generate(sentence: String): String

  final def extract(sentence: String): Vector[(String, String, String)] =
    TripletParse.parse(generate(sentence))
}

/** Deterministic rule-based SVO extractor over a pinned predicate-phrase
  * lexicon (extractor spec, SURVEY.md §7.5).
  *
  * Spec:
  *   - Tokenize the sentence ([[Tokens.tokenize]]); drop trailing
  *     punctuation tokens.
  *   - Scan left-to-right for the EARLIEST occurrence of any lexicon
  *     phrase (matched on lowercased tokens); at a given position prefer
  *     the LONGEST matching phrase.
  *   - subject = tokens before the phrase (joined " "), predicate = the
  *     matched phrase (as written in the lexicon), object = tokens after
  *     (joined " ", trailing punctuation stripped).
  *   - Both subject and object must be non-empty, and the subject must
  *     contain at least one alphanumeric token; otherwise no triple.
  *   - Output is formatted exactly like the T5 marker format
  *     (`<pad><triplet> s <relation> p <object> o</triplet></s>`) so the
  *     marker parser is the production path.
  */
final class RuleSVOExtractor extends TripletExtractor {

  /** Predicate phrase lexicon; token sequences, lowercased. Order within
    * the scan is by position then phrase length (longest wins). */
  private val phrases: Vector[Vector[String]] =
    RuleSVOExtractor.lexicon.map(_.split(' ').toVector).sortBy(-_.length)

  private val maxPhraseLen = phrases.map(_.length).max

  private def isPunct(t: String) = !Tokens.isAlnum(t) && !t.contains('_')

  def generate(sentence: String): String = {
    val raw = Tokens.tokenize(sentence)
    // drop trailing punctuation tokens
    var end = raw.length
    while (end > 0 && isPunct(raw(end - 1))) end -= 1
    val toks = raw.take(end)
    val lower = toks.map(_.toLowerCase)

    var found: Option[(Int, Int, String)] = None // (startIdx, phraseLen, predText)
    var i = 1 // subject must be non-empty → phrase cannot start at 0
    while (i < toks.length && found.isEmpty) {
      var best: Option[Vector[String]] = None
      val remaining = toks.length - i
      phrases.foreach { p =>
        if (best.isEmpty && p.length <= math.min(remaining, maxPhraseLen)) {
          var ok = true
          var k = 0
          while (ok && k < p.length) {
            if (lower(i + k) != p(k)) ok = false
            k += 1
          }
          // object must remain non-empty after the phrase
          if (ok && i + p.length < toks.length) best = Some(p)
        }
      }
      best.foreach(p => found = Some((i, p.length, p.mkString(" "))))
      i += 1
    }

    found match {
      case Some((start, plen, pred)) =>
        val subj = toks.slice(0, start).mkString(" ")
        val obj = toks.slice(start + plen, toks.length).mkString(" ")
        val subjHasWord = toks.slice(0, start).exists(t => Tokens.isAlnum(t) || t.contains('_'))
        val objHasWord = toks.slice(start + plen, toks.length)
          .exists(t => Tokens.isAlnum(t) || t.contains('_'))
        if (subjHasWord && objHasWord)
          s"<pad><triplet> $subj <relation> $pred <object> $obj</triplet></s>"
        else "<pad></s>"
      case None => "<pad></s>"
    }
  }
}

/** Spec DATA shared with the independent oracle (graft.kg.oracle): the
  * lexicon is a pinned constant, not logic — sharing it means a typo
  * cannot silently diverge the two implementations, while the SCAN logic
  * remains independently implemented on both sides. */
object RuleSVOExtractor {
  val lexicon: Vector[String] = Vector(
    "is defined in file", "is defined in", "is declared in",
    "imports module", "imports package", "imports",
    "calls function", "calls method", "calls",
    "extends class", "extends", "inherits from",
    "implements interface", "implements",
    "depends on", "depends upon",
    "returns", "instantiates", "overrides", "invokes", "exports",
    "belongs to", "refers to", "is part of", "is based on",
    "is a", "is an", "was a", "was an", "has", "uses", "contains",
    "created", "wrote", "directed", "produced", "is", "was", "are", "were")
}
