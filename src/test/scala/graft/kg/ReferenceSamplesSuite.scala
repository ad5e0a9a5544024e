package graft.kg

import graft.kg.pipeline.Pipeline
import graft.kg.stages.{Ingest, Terms}
import graft.kg.textspec.{Sentences, Tokens}
import org.scalatest.funsuite.AnyFunSuite

/** Spec-level goldens on the reference repo's own sample corpus
  * (FIXTURES.md §2: escaflowne/lensman/robotech.txt, used in the
  * reference README examples). Checks chunk-id naming (`cli/main.py:128`,
  * `ingest.py:145`), both chunk-budget defaults (200 code / 50 sample
  * .env), and that the term/triple stages run end-to-end on real prose. */
class ReferenceSamplesSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private val sampleDir = "/root/reference"
  private val names = Seq("escaflowne", "lensman", "robotech")

  private def available = new java.io.File(s"$sampleDir/escaflowne.txt").exists

  lazy val corpus = {
    val s = spark; import s.implicits._
    val rows = names.map { n =>
      val text = new String(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$sampleDir/$n.txt")), "UTF-8")
      // doc_id = basename minus extension (cli/main.py:128); wrapped into
      // the corpus shape per FIXTURES.md §2
      CorpusRow("reference/samples", s"$n.txt", "0" * 40, "txt", text)
    }
    spark.createDataset(rows)
  }

  test("chunking both defaults: 50-token chunks nest inside 200-token packing") {
    assume(available)
    val s = spark; import s.implicits._
    val docs = Ingest.docs(corpus)
    for (mt <- Seq(50, 200)) {
      val chunks = Ingest.chunks(docs, mt).collect()
      assert(chunks.nonEmpty)
      chunks.groupBy(_.docId).foreach { case (_, cs) =>
        assert(cs.map(_.index).sorted.toSeq == cs.indices.toSeq)
        // concatenating restores the sentence stream
        val doc = docs.filter(_.docId == cs.head.docId).head()
        assert(cs.sortBy(_.index).map(_.text).mkString(" ") ==
          Sentences.split(doc.content).mkString(" "))
      }
      chunks.filter(_.nTokens > mt).foreach { c =>
        assert(Sentences.split(c.text).size == 1)
      }
    }
  }

  test("chunk ids follow {docId}_chunk{i}") {
    assume(available)
    val s = spark; import s.implicits._
    val chunks = Ingest.chunks(Ingest.docs(corpus), 200).collect()
    chunks.foreach(c => assert(c.chunkId == s"${c.docId}_chunk${c.index}"))
  }

  test("terms on real prose: unigrams stopword-free, ngrams over full stream") {
    assume(available)
    val s = spark; import s.implicits._
    val chunks = Ingest.chunks(Ingest.docs(corpus), 200)
    val terms = Terms.terms(chunks).collect()
    val uni = terms.filter(_.termType == "unigram").map(_.text)
    assert(uni.nonEmpty)
    assert(uni.forall(t => !graft.kg.textspec.Stopwords.english.contains(t)))
    val bi = terms.filter(_.termType == "bigram").map(_.text)
    assert(bi.exists(b => b.split(' ').exists(
      graft.kg.textspec.Stopwords.english.contains)),
      "bigrams must be built over the UNfiltered token stream")
  }

  test("full pipeline runs on real prose and emits lowercased triples") {
    assume(available)
    val s = spark; import s.implicits._
    val edges = new Pipeline(GraftConfig(linkMode = "exact")).run(corpus)
      .edges.collect()
    // prose sentences contain copulas ("is", "was") from the extractor
    // lexicon, so some triples must come out, all lowercased
    assert(edges.nonEmpty)
    edges.foreach { e =>
      assert(e.subj == e.subj.toLowerCase)
      assert(e.pred == e.pred.toLowerCase)
      assert(e.obj == e.obj.toLowerCase)
    }
  }
}
