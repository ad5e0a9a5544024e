package graft.kg

import graft.kg.fixtures.CorpusGen
import graft.kg.pipeline.ParquetTableIO
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingest (GraphRag.ingestStream) must be indistinguishable
  * from sequential batch ingest: same micro-batch boundaries → same
  * graph-table state, including cross-batch incremental linking and the
  * canonical compaction pass. One code path, two drivers.
  */
class StreamingIngestSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def tables = Seq("chunks", "chunk_embeddings", "chunk_vec_index",
    "chunk_vec_meta", "terms", "edges", "edge_entity_index",
    "canonical_edges", "canonical_edge_entity_index", "canonical_map",
    "vertices", "aliases", "lsh_band_index")

  private def tableState(io: ParquetTableIO): Map[String, Set[String]] =
    tables.map { t =>
      val df = io.read(spark, t)
      // canonical row rendering: columns in name order, rows as a set
      val cols = df.columns.sorted.toSeq
      t -> df.selectExpr(cols.map(c => s"cast(`$c` as string)"): _*)
        .collect().map(_.mkString("|")).toSet
    }.toMap

  test("streaming ingest == sequential batch ingest across micro-batches") {
    val s = spark; import s.implicits._
    val cfg = GraftConfig(linkMode = "lsh", linkThreshold = 0.85)

    // one corpus, deterministically split into two batches by repo
    val gen = CorpusGen.generate(repos = 6, filesPerRepo = 4, seed = 21L)
    val batch1 = gen.rows.filter(_.repo < "org/repo003")
    val batch2 = gen.rows.filter(_.repo >= "org/repo003")
    assert(batch1.nonEmpty && batch2.nonEmpty)

    // reference: the existing batch API, two sequential ingests
    val batchRoot = java.nio.file.Files
      .createTempDirectory("graft_stream_batch").toString
    val batchRag = new GraphRag(spark, new ParquetTableIO(batchRoot), cfg)
    batchRag.ingest(spark.createDataset(batch1))
    batchRag.ingest(spark.createDataset(batch2))

    // streaming: the same two batches as micro-batches of one query
    val streamRoot = java.nio.file.Files
      .createTempDirectory("graft_stream_stream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt").toString
    val streamRag = new GraphRag(spark, new ParquetTableIO(streamRoot), cfg)
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[CorpusRow]
    val q = streamRag.ingestStream(source.toDS(), ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      source.addData(batch1)
      q.processAllAvailable()
      source.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val batchState = tableState(new ParquetTableIO(batchRoot))
    val streamState = tableState(new ParquetTableIO(streamRoot))
    tables.foreach { t =>
      assert(streamState(t) == batchState(t),
        s"table $t diverged between streaming and batch ingest")
      assert(streamState(t).nonEmpty, s"table $t empty")
    }

    // and the streamed store answers queries like the batch store
    val bq = batchRag.query("utilLib", topK = 5)
    val sq2 = streamRag.query("utilLib", topK = 5)
    assert(sq2.chunks.collect().map(_.toString).sorted.toSeq ==
      bq.chunks.collect().map(_.toString).sorted.toSeq)
  }

  test("streaming ingest resumes from the checkpoint across query restarts") {
    val s = spark; import s.implicits._
    val cfg = GraftConfig(linkMode = "lsh", linkThreshold = 0.85)
    val gen = CorpusGen.generate(repos = 4, filesPerRepo = 3, seed = 31L)
    val batch1 = gen.rows.filter(_.repo < "org/repo002")
    val batch2 = gen.rows.filter(_.repo >= "org/repo002")

    val batchRoot = java.nio.file.Files
      .createTempDirectory("graft_restart_batch").toString
    val batchRag = new GraphRag(spark, new ParquetTableIO(batchRoot), cfg)
    batchRag.ingest(spark.createDataset(batch1))
    batchRag.ingest(spark.createDataset(batch2))

    val streamRoot = java.nio.file.Files
      .createTempDirectory("graft_restart_stream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_restart_ckpt").toString
    val streamRag = new GraphRag(spark, new ParquetTableIO(streamRoot), cfg)
    implicit val sqlCtx = s.sqlContext
    val source = MemoryStream[CorpusRow]
    // first query lifetime: batch 1 only, then STOP
    val q1 = streamRag.ingestStream(source.toDS(), ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try { source.addData(batch1); q1.processAllAvailable() } finally q1.stop()
    // restart from the same checkpoint: offsets resume, batch 1 is NOT
    // re-delivered (and would be a harmless idempotent MERGE if it were)
    val q2 = streamRag.ingestStream(source.toDS(), ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try { source.addData(batch2); q2.processAllAvailable() } finally q2.stop()

    val batchState = tableState(new ParquetTableIO(batchRoot))
    val streamState = tableState(new ParquetTableIO(streamRoot))
    tables.foreach { t =>
      assert(streamState(t) == batchState(t),
        s"table $t diverged after checkpoint restart")
    }
  }
}
