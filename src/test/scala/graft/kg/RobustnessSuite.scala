package graft.kg

import graft.kg.pipeline.Pipeline
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input hardening: the pipeline must not throw on empty /
  * whitespace / punctuation-only / very long / unicode content. */
class RobustnessSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def runOn(rows: Seq[CorpusRow]) = {
    val s = spark; import s.implicits._
    new Pipeline(GraftConfig(linkMode = "exact"))
      .run(spark.createDataset(rows))
  }

  test("empty corpus → empty outputs, no exception") {
    val r = runOn(Seq.empty)
    assert(r.edges.count() == 0)
    assert(r.vertices.count() == 0)
    assert(r.terms.count() == 0)
  }

  test("empty / whitespace / punctuation-only content") {
    val rows = Seq(
      CorpusRow("r", "empty", "c", "txt", ""),
      CorpusRow("r", "blank", "c", "txt", "   \n\n  \t"),
      CorpusRow("r", "punct", "c", "txt", "... !!! ??? ,,,"),
      CorpusRow("r", "one", "c", "txt", "Word"))
    val r = runOn(rows)
    assert(r.edges.count() == 0) // nothing extractable
    assert(r.chunks.count() >= 1) // "Word" and punct become chunks
    assert(r.docs.count() == 4) // all rows survive with sha256
    assert(r.docs.collect().forall(_.contentSha256 != null))
  }

  test("unicode and long single-sentence content") {
    val rows = Seq(
      CorpusRow("r", "uni", "c", "txt",
        "Ünïcodé tokens — emoji 😀 and CJK 中文 words. Alpha uses beta."),
      CorpusRow("r", "long", "c", "txt", ("word " * 5000).trim + "."))
    val r = runOn(rows)
    // the extractable sentence still yields its triple
    val edges = r.edges.collect().map(e => (e.subj, e.pred, e.obj)).toSet
    assert(edges.contains(("alpha", "uses", "beta")))
    // the 5000-word sentence becomes one oversized chunk, not a crash
    val big = r.chunks.filter(_.docId.contains("long")).collect()
    assert(big.length == 1 && big.head.nTokens > 200)
  }

  test("duplicate rows in the corpus dedupe at MERGE keys") {
    val row = CorpusRow("r", "dup", "c", "txt", "Alpha uses beta.")
    val r = runOn(Seq(row, row, row))
    assert(r.edges.count() == 1)
    assert(r.chunks.toDF().dropDuplicates("chunkId").count() == 1)
  }
}
