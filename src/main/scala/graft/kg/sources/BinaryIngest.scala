package graft.kg.sources

import graft.kg.CorpusRow
import org.apache.spark.sql.Dataset

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** S2 binary/PDF source (reference `core/ingest.py:38-63`: PyMuPDF
  * page-loop, `text += page.get_text()` — a per-file decode step in front
  * of the same chunker).
  *
  * The decode itself is behind [[ContentDecoder]]; a real PDF library
  * would plug in here (none ships in this container — see
  * [[StubPdfDecoder]], the honest stand-in à la
  * `graft.ops.Multimodal.StubDecoder`). The Spark-side plumbing — binary
  * payload column, one decoder init per partition, flow into the
  * unchanged chunk→extract pipeline — is real and tested.
  */
object BinaryIngest {

  /** A corpus row whose content is still an un-decoded binary payload
    * (e.g. a PDF blob) — the Iceberg-shaped input with `content: binary`
    * instead of `content: string`. */
  final case class BinaryCorpusRow(
      repo: String,
      path: String,
      commit: String,
      lang: String,
      payload: Array[Byte])

  /** Per-file binary → text decode (reference `load_pdf`). Implementations
    * must be Serializable: one instance is initialized per PARTITION
    * inside `mapPartitions` (codec/model init amortized, like the
    * reference's single PyMuPDF import — not per row). */
  trait ContentDecoder extends Serializable {
    def decode(path: String, payload: Array[Byte]): String
  }

  /** STUB decoder (no PDF lib in this container): decodes the
    * deterministic fake format of [[fakePdfPayload]] — a page count plus
    * length-prefixed UTF-8 page texts — and concatenates pages exactly
    * like the reference's `text += page.get_text()` loop. A real
    * implementation replaces ONLY this class; everything downstream
    * (chunker, extractor, linker) is format-agnostic. */
  object StubPdfDecoder extends ContentDecoder {
    def decode(path: String, payload: Array[Byte]): String = {
      val bb = ByteBuffer.wrap(payload)
      val magic = bb.getInt()
      require(magic == Magic, s"not a fake-PDF payload: $path")
      val nPages = bb.getInt()
      val sb = new StringBuilder
      var i = 0
      while (i < nPages) {
        val len = bb.getInt()
        val bytes = new Array[Byte](len)
        bb.get(bytes)
        sb.append(new String(bytes, StandardCharsets.UTF_8))
        i += 1
      }
      sb.toString
    }
  }

  private val Magic = 0x46504446 // "FPDF"

  /** Deterministic fake "PDF": page count + length-prefixed UTF-8 pages.
    * Test fixture for the stub decoder. */
  def fakePdfPayload(pages: Seq[String]): Array[Byte] = {
    val encoded = pages.map(_.getBytes(StandardCharsets.UTF_8))
    val bb = ByteBuffer.allocate(8 + encoded.map(_.length + 4).sum)
    bb.putInt(Magic).putInt(pages.size)
    encoded.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  /** Binary rows → text corpus rows via a per-partition-initialized
    * decoder (mapPartitions batch stage, NO shuffle) — the decoded rows
    * feed the unchanged `Ingest.docs → chunks → ...` pipeline. */
  def corpus(rows: Dataset[BinaryCorpusRow], decoder: ContentDecoder): Dataset[CorpusRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      val d = decoder // one decoder per partition (real impl: init codec here)
      it.map(r => CorpusRow(r.repo, r.path, r.commit, r.lang, d.decode(r.path, r.payload)))
    }
  }
}
