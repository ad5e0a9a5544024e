package graft.kg

import graft.kg.fixtures.CorpusGen
import graft.kg.pipeline.Pipeline
import graft.kg.sources.BinaryIngest
import graft.kg.sources.BinaryIngest.{BinaryCorpusRow, StubPdfDecoder}
import org.scalatest.funsuite.AnyFunSuite

/** S2 binary/PDF source: (path, binary) rows flow through the decode
  * stage into the SAME chunk→extract pipeline, producing the identical
  * edge set as the text-corpus path over the same content. */
class BinaryIngestSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  test("stub decoder round-trips the fake page format") {
    val pages = Seq("Page one text. More of it.", "Page two.", "")
    val payload = BinaryIngest.fakePdfPayload(pages)
    assert(StubPdfDecoder.decode("x.pdf", payload) == pages.mkString(""))
  }

  test("binary corpus decodes and produces the same KG as the text corpus") {
    val s = spark; import s.implicits._
    val gen = CorpusGen.generate(repos = 3, filesPerRepo = 4, seed = 11L)
    // split each content into fake "pages" at sentence boundaries — the
    // concatenation must reproduce the original content byte-for-byte
    val binaryRows = gen.rows.map { r =>
      val mid = r.content.length / 2
      val pages = Seq(r.content.substring(0, mid), r.content.substring(mid))
      BinaryCorpusRow(r.repo, r.path, r.commit, r.lang,
        BinaryIngest.fakePdfPayload(pages))
    }
    val decoded = BinaryIngest.corpus(spark.createDataset(binaryRows), StubPdfDecoder)
    // per-row invariant holds through the decode stage (paths repeat
    // across repos — key by (repo, path))
    val decodedContents = decoded.collect().map(r => ((r.repo, r.path), r.content)).toMap
    gen.rows.foreach(r => assert(decodedContents((r.repo, r.path)) == r.content))
    // and the full pipeline over the decoded corpus equals the text path
    val viaBinary = new Pipeline(GraftConfig(linkMode = "exact"))
      .run(decoded).edges.collect().toSet
    val viaText = new Pipeline(GraftConfig(linkMode = "exact"))
      .run(spark.createDataset(gen.rows)).edges.collect().toSet
    assert(viaBinary == viaText)
    assert(viaBinary.nonEmpty)
  }
}
