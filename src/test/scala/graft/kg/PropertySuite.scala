package graft.kg

import graft.kg.embed.{Embedder, HashEmbedder}
import graft.kg.stages.Ingest
import graft.kg.textspec._
import org.scalacheck.{Gen, Prop, Properties, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2.2) via scalacheck directly
  * (no scalatestplus bridge in the offline cache — properties run inside
  * a funsuite test and assert Passed). */
class PropertySuite extends AnyFunSuite {

  private def check(name: String, prop: Prop, minSuccessful: Int = 200): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val sentence: Gen[String] =
    Gen.chooseNum(2, 12).flatMap(n => Gen.listOfN(n, word))
      .map(ws => ws.mkString(" ").capitalize + ".")
  private val doc: Gen[String] =
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, sentence)).map(_.mkString(" "))

  test("chunker invariants: concat restores text, budget respected, dense indices") {
    check("chunker", Prop.forAll(doc, Gen.chooseNum(5, 60)) { (d: String, mt: Int) =>
      val chunks = Ingest.chunkDoc("d", d, mt)
      val restores = chunks.map(_.text).mkString(" ") == d
      val dense = chunks.map(_.index) == chunks.indices.toVector
      // any over-budget chunk must be a single oversized sentence
      val budget = chunks.forall(c =>
        c.nTokens <= mt || Sentences.split(c.text).size == 1)
      val ids = chunks.zipWithIndex.forall { case (c, i) => c.chunkId == s"d_chunk$i" }
      restores && dense && budget && ids
    })
  }

  test("ngram law: |ngrams(n)| == max(0, tokens - n + 1)") {
    check("ngrams", Prop.forAll(Gen.listOf(word), Gen.chooseNum(1, 4)) {
      (toks: List[String], n: Int) =>
        NGrams.ngrams(toks, n).size == math.max(0, toks.size - n + 1)
    })
  }

  test("tokenizer: normalize output is lowercase alnum, subset of tokenize") {
    check("tokens", Prop.forAll(doc) { (d: String) =>
      val norm = Tokens.normalize(d)
      norm.forall(t => t.nonEmpty && t.forall(c => c.isLetterOrDigit && !c.isUpper))
    })
  }

  test("token count fast path equals tokenize(text).size on arbitrary strings") {
    check("count", Prop.forAll(Gen.asciiPrintableStr) { (s: String) =>
      Tokens.count(s) == Tokens.tokenize(s).size
    })
  }

  test("dedup idempotence: distinct∘distinct == distinct (MERGE law)") {
    check("dedup", Prop.forAll(Gen.listOf(Gen.zip(word, word, word))) {
      (ts: List[(String, String, String)]) =>
        val once = ts.distinct
        once.distinct == once
    })
  }

  test("embedder: unit norm or zero; cosine symmetric and bounded") {
    val emb = new HashEmbedder(128)
    check("embed", Prop.forAll(word, word) { (a: String, b: String) =>
      val va = emb.embed(a); val vb = emb.embed(b)
      val n = math.sqrt(Embedder.dot(va, va))
      val normOk = math.abs(n - 1.0) < 1e-4 || n == 0.0
      val c1 = Embedder.dot(va, vb); val c2 = Embedder.dot(vb, va)
      normOk && math.abs(c1 - c2) < 1e-9 && c1 <= 1.0 + 1e-6 && c1 >= -1.0 - 1e-6
    }, minSuccessful = 100)
  }

  test("triplet parse: round-trips the marker format the extractor emits") {
    val idGen = Gen.chooseNum(1, 3)
      .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    check("parse", Prop.forAll(idGen, idGen, idGen) { (s: String, p: String, o: String) =>
      val out = TripletParse.parse(
        s"<pad><triplet> $s <relation> $p <object> $o</triplet></s>")
      out == Vector((s, p, o))
    })
  }

  test("sentence splitter: every emitted sentence is non-empty and trimmed") {
    check("sentences", Prop.forAll(doc) { (d: String) =>
      val ss = Sentences.split(d)
      ss.forall(s => s.nonEmpty && s == s.trim)
    })
  }
}
