package graft.kg.stages

import graft.kg._
import graft.kg.embed.Embedder
import graft.kg.textspec.{Sentences, Tokens}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion stages (reference `core/ingest.py`): corpus scan → docs →
  * greedy sentence-packed chunks → chunk embeddings.
  *
  * Scale notes: `content` arrives whole per corpus row, so the
  * order-dependent greedy chunker (reference `ingest.py:65-101`) is a
  * per-row `flatMap` — NO shuffle, no groupBy. A 10^12-file corpus is wide
  * (many files), not deep (files fit in a task), so per-row chunking
  * parallelizes perfectly. The only repartition is `repartitionByRange`
  * on (repo, path) to co-locate repos without hot-spotting mega-repos
  * (north rule / SURVEY.md §4.4), applied by the pipeline driver when
  * reading, not here.
  */
object Ingest {

  /** Corpus rows → docs. `docId = repo:path@commit`; the per-row invariant
    * `sha2(content, 256)` is computed natively by Catalyst (codegen'd,
    * stays inside WholeStageCodegen). */
  def docs(corpus: Dataset[CorpusRow]): Dataset[Doc] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .withColumn("docId", concat($"repo", lit(":"), $"path", lit("@"), $"commit"))
      .withColumn("contentSha256", sha2($"content", 256))
      .as[Doc]
  }

  /** Greedy sentence-packing chunker (reference `ingest.py:65-101`):
    * walk sentences in order; flush when adding the next sentence would
    * exceed `maxTokens` and the current chunk is non-empty; join chunk
    * sentences with " ". A single oversized sentence becomes its own
    * chunk (never split). chunkId/index per `ingest.py:144-150`. */
  def chunkDoc(docId: String, content: String, maxTokens: Int): Vector[Chunk] = {
    val sents = Sentences.split(content)
    if (sents.isEmpty) return Vector.empty
    val chunks = Vector.newBuilder[Vector[String]]
    var current = Vector.newBuilder[String]
    var currentLen = 0
    var currentEmpty = true
    sents.foreach { sent =>
      val nTok = Tokens.count(sent)
      if (currentLen + nTok > maxTokens && !currentEmpty) {
        chunks += current.result()
        current = Vector.newBuilder[String]
        currentLen = 0
        currentEmpty = true
      }
      current += sent
      currentLen += nTok
      currentEmpty = false
    }
    if (!currentEmpty) chunks += current.result()
    chunks.result().zipWithIndex.map { case (ss, i) =>
      val text = ss.mkString(" ")
      Chunk(docId, s"${docId}_chunk$i", i, text, Tokens.count(text))
    }
  }

  /** Docs → chunks: per-row flatMap (no shuffle — see object doc).
    * `counter` (optional) counts emitted chunks without adding a plan
    * node — an observe node here would break object-space fusion with the
    * downstream extraction stage (see [[graft.kg.pipeline.Metrics]]). */
  def chunks(docs: Dataset[Doc], maxTokens: Int,
      counter: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[Chunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { d =>
      val cs = chunkDoc(d.docId, d.content, maxTokens)
      counter.foreach(_.add(cs.size))
      cs
    }
  }

  /** Chunks → embeddings, `mapPartitions`-batched with one embedder init
    * per partition (replacing the reference's per-call model invocation,
    * `ingest.py:103-124`; E5 "passage: " prefix per `common.py:70-82`). */
  def chunkEmbeddings(chunks: Dataset[Chunk], embedder: Embedder)
      : Dataset[ChunkEmbedding] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.mapPartitions { it =>
      it.map(c => ChunkEmbedding(c.chunkId, c.docId, embedder.embedPassage(c.text)))
    }
  }
}
