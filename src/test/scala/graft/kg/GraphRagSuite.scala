package graft.kg

import graft.kg.fixtures.CorpusGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference CLI lifecycle (§3.1-3.3) through the facade:
  * process → query (hybrid+triplets) → query --with-context → stats →
  * process again (idempotent) → reset. */
class GraphRagSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  lazy val gen = CorpusGen.generate(repos = 4, filesPerRepo = 5, seed = 11L)
  lazy val engine = {
    val root = java.nio.file.Files.createTempDirectory("graftrag").toString
    GraphRag(spark, root)
  }
  lazy val corpus = {
    val s = spark; import s.implicits._
    spark.createDataset(gen.rows)
  }

  test("process → query returns scored chunks and triplets") {
    val counts = engine.ingest(corpus)
    assert(counts("edges") > 0 && counts("chunks") > 0 && counts("terms") > 0)

    val subj = gen.truth.map(_._1).find(!_.contains(' ')).get
    val res = engine.query(s"Tell me about ${subj.capitalize}")
    val hits = res.chunks.collect()
    assert(hits.nonEmpty, "hybrid query returned no chunks")
    assert(hits.forall(r => !r.isNullAt(r.fieldIndex("score"))))
    val trips = res.triplets.get.collect()
    assert(trips.nonEmpty, "no triplets for a known entity")
    trips.foreach { r =>
      assert(r.getAs[String]("subj") == subj || r.getAs[String]("obj") == subj)
    }
  }

  test("query --with-context expands around graph hits") {
    val subj = gen.truth.map(_._1).find(!_.contains(' ')).get
    val res = engine.query(subj, withContext = true, includeTriplets = false)
    val rows = res.chunks.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Boolean]("is_match")))
    assert(res.triplets.isEmpty)
  }

  test("query with idfWeighting ranks via tf·ln(N/df) over the stored tables") {
    val subj = gen.truth.map(_._1).find(!_.contains(' ')).get
    val q = s"Tell me about ${subj.capitalize}"
    val idf = engine.query(q, idfWeighting = true, includeTriplets = false)
      .chunks.collect()
    assert(idf.nonEmpty, "idf-weighted hybrid query returned no chunks")
    assert(idf.forall { r =>
      val sc = r.getAs[Double]("score"); sc >= 0.0 && sc <= 1.0
    })
    // the context path also accepts the weighting flag
    val ctx = engine.query(subj, withContext = true, includeTriplets = false,
      idfWeighting = true).chunks.collect()
    assert(ctx.nonEmpty)
  }

  test("re-ingest is idempotent; stats stable; reset truncates") {
    val before = engine.stats()
    engine.ingest(corpus)
    val after = engine.stats()
    assert(before == after, "re-ingest changed table contents")
    engine.reset()
    assert(engine.stats().values.forall(_ == 0L))
  }
}
