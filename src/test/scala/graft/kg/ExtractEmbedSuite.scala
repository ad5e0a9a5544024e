package graft.kg

import graft.kg.embed.{Embedder, HashEmbedder}
import graft.kg.extract.RuleSVOExtractor
import graft.kg.stages.Ingest
import org.scalatest.funsuite.AnyFunSuite

class ExtractEmbedSuite extends AnyFunSuite {

  val ex = new RuleSVOExtractor

  // --- RuleSVOExtractor (T1/T2 spec) ---

  test("extracts SVO with longest phrase at earliest position") {
    assert(ex.extract("UtilLib imports module parseTree.") ==
      Vector(("UtilLib", "imports module", "parseTree")))
    assert(ex.extract("Main is defined in file coreScala.") ==
      Vector(("Main", "is defined in file", "coreScala")))
  }

  test("multi-token subjects and objects") {
    assert(ex.extract("Util lib depends on parse tree.") ==
      Vector(("Util lib", "depends on", "parse tree")))
  }

  test("no lexicon phrase → no triple") {
    assert(ex.extract("Quick brown fox jumped over fence.").isEmpty)
  }

  test("phrase at sentence start or end → no triple (empty subj/obj)") {
    assert(ex.extract("Imports module beta.").isEmpty)
    assert(ex.extract("Alpha imports.").isEmpty)
    // longest phrase has no object → falls back to shorter phrase
    assert(ex.extract("Alpha imports module.") ==
      Vector(("Alpha", "imports", "module")))
  }

  test("earliest phrase wins over later ones") {
    assert(ex.extract("Alpha uses beta extends class gamma.") ==
      Vector(("Alpha", "uses", "beta extends class gamma")))
  }

  test("output goes through the marker format (P8 exercised)") {
    val raw = ex.generate("Alpha calls function beta.")
    assert(raw.contains("<triplet>") && raw.contains("<relation>") &&
      raw.contains("<object>"))
  }

  // --- HashEmbedder (M1/M2 spec) ---

  val emb = new HashEmbedder(768)

  test("deterministic, unit-norm, dim-correct") {
    val a = emb.embed("utilLib")
    val b = emb.embed("utilLib")
    assert(a.toSeq == b.toSeq)
    assert(a.length == 768)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("case-insensitive (lowercased spec) → exact aliases get cosine 1.0") {
    assert(Embedder.dot(emb.embed("UtilLib"), emb.embed("utillib")) > 0.999)
  }

  test("near-duplicates score high, unrelated score low") {
    val near = Embedder.dot(emb.embedPassage("the util lib module"),
      emb.embedPassage("the util lib modules"))
    val far = Embedder.dot(emb.embedPassage("the util lib module"),
      emb.embedPassage("completely different words here"))
    assert(near > 0.8, s"near=$near")
    assert(far < 0.5, s"far=$far")
  }

  test("passage/query prefixes change the vector (P11)") {
    val p = emb.embedPassage("alpha")
    val q = emb.embedQuery("alpha")
    assert(Embedder.dot(p, q) < 0.999)
  }

  test("degenerate input → zero vector (common.py:92-98 analogue)") {
    assert(emb.embed("").forall(_ == 0f))
  }

  // --- Chunker (C1/C2 spec, ingest.py:65-101) ---

  test("greedy chunker packs sentences and flushes on budget") {
    // each sentence = 4 tokens ("Alpha uses beta .")
    val content = "Alpha uses beta. Gamma uses delta. Eps uses zeta."
    val chunks = Ingest.chunkDoc("d", content, maxTokens = 8)
    assert(chunks.map(_.text) == Vector(
      "Alpha uses beta. Gamma uses delta.", "Eps uses zeta."))
    assert(chunks.map(_.chunkId) == Vector("d_chunk0", "d_chunk1"))
    assert(chunks.map(_.index) == Vector(0, 1))
  }

  test("single oversized sentence becomes its own chunk (never split)") {
    val long = ("word " * 50).trim + "."
    val chunks = Ingest.chunkDoc("d", long, maxTokens = 10)
    assert(chunks.size == 1)
    assert(chunks.head.nTokens > 10)
  }

  test("chunk concatenation restores the sentence sequence (invariant)") {
    val content = "Alpha uses beta. Gamma uses delta. Eps uses zeta. More uses here."
    for (mt <- Seq(4, 8, 12, 200)) {
      val chunks = Ingest.chunkDoc("d", content, mt)
      assert(chunks.map(_.text).mkString(" ") == content)
      assert(chunks.map(_.index) == chunks.indices.toVector)
    }
  }
}
