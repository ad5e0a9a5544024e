package graft.kg

import graft.kg.extract.RuleSVOExtractor
import graft.kg.oracle.KgOracle
import graft.kg.stages.Ingest
import graft.kg.textspec.{Sentences, Tokens}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The independent straight-line oracle (`graft.kg.oracle.KgOracle`) must
  * agree with the pipeline's spec implementations on ARBITRARY inputs —
  * not just the deterministic corpus the driver compare runs on. Each
  * spec function is implemented twice (oracle vs textspec/stages); these
  * properties catch divergence the moment either side drifts, which is
  * what makes the kg_* expected-set oracle trustworthy evidence. */
class KgOracleSuite extends AnyFunSuite {

  private def check(name: String, prop: Prop, minSuccessful: Int = 300): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  // text shaped like the corpus plus adversarial punctuation/abbreviation
  // noise — the regimes where two sentence-splitter implementations drift
  private val word: Gen[String] = Gen.oneOf(
    Gen.chooseNum(1, 9).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString)),
    Gen.oneOf("e.g", "Dr", "utilLib", "util_lib", "a", "3.14", "x2", "--", "(so)", "it's"))
  private val sentence: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    ws <- Gen.listOfN(n, word)
    term <- Gen.oneOf(".", "!", "?", "...", ".)", "")
  } yield ws.mkString(" ").capitalize + term
  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ss <- Gen.listOfN(n, sentence)
    sep <- Gen.oneOf(" ", "  ", "\n", "\n\n")
  } yield ss.mkString(sep)
  private val anyText: Gen[String] = Gen.oneOf(doc, Gen.asciiPrintableStr)

  test("oracle tokenizer == pipeline tokenizer on arbitrary strings") {
    check("tokenize", Prop.forAll(anyText) { s =>
      KgOracle.tokenize(s) == Tokens.tokenize(s) &&
        KgOracle.tokenCount(s) == Tokens.count(s) &&
        KgOracle.normalize(s) == Tokens.normalize(s)
    })
  }

  test("oracle sentence splitter == pipeline splitter on arbitrary docs") {
    check("sentences", Prop.forAll(anyText) { s =>
      KgOracle.splitSentences(s) == Sentences.split(s)
    })
  }

  test("oracle chunker == pipeline chunker across budgets") {
    check("chunker", Prop.forAll(doc, Gen.chooseNum(5, 220)) { (d, budget) =>
      KgOracle.chunkTexts(d, budget) ==
        Ingest.chunkDoc("d", d, budget).map(_.text)
    })
  }

  test("oracle SVO scan == pipeline extractor (incl. the marker round-trip)") {
    val extractor = new RuleSVOExtractor()
    check("svo", Prop.forAll(sentence) { s =>
      KgOracle.extractSVO(s) == extractor.extract(s).headOption
    })
  }
}
