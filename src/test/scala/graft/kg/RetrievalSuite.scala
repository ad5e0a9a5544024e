package graft.kg

import graft.kg.embed.HashEmbedder
import graft.kg.fixtures.CorpusGen
import graft.kg.pipeline.Pipeline
import graft.kg.retrieve.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  lazy val gen = CorpusGen.generate(repos = 4, filesPerRepo = 5, seed = 7L)
  lazy val result = {
    val s = spark; import s.implicits._
    // small chunk budget → multi-chunk docs, so context expansion is real
    new Pipeline(GraftConfig(linkMode = "exact", maxTokensPerChunk = 20))
      .run(spark.createDataset(gen.rows))
  }
  lazy val retrieval = new Retrieval(new HashEmbedder())

  test("term search returns chunks containing the query terms, TF-ranked") {
    val s = spark; import s.implicits._
    // pick a known subject from the truth set as the query
    val q = gen.truth.head._1
    val hits = retrieval.termSearch(result.terms.toDF(), result.chunks, q)
    val rows = hits.collect()
    assert(rows.nonEmpty)
    // every hit chunk's text must actually contain a query token
    val qToks = graft.kg.textspec.Tokens.normalize(q).toSet
    rows.foreach { r =>
      val text = r.getAs[String]("text").toLowerCase
      assert(qToks.exists(text.contains), s"chunk without term: $text")
    }
    // scores are descending
    val scores = rows.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("IDF-weighted term search ranks rare terms above common ones") {
    val s = spark; import s.implicits._
    // c1 has the ubiquitous term twice; c2 has the rare term once —
    // TF ranks c1 first, IDF must rank c2 first
    val chunks = spark.createDataset(Seq(
      Chunk("d", "d_chunk0", 0, "common common", 2),
      Chunk("d", "d_chunk1", 1, "rareword common", 2),
      Chunk("d", "d_chunk2", 2, "common filler", 2),
      Chunk("d", "d_chunk3", 3, "common filler", 2)))
    val terms = Seq(
      ("d_chunk0", "common", "unigram"), ("d_chunk0", "common", "unigram"),
      ("d_chunk1", "rareword", "unigram"), ("d_chunk1", "common", "unigram"),
      ("d_chunk2", "common", "unigram"), ("d_chunk3", "common", "unigram"))
      .toDF("chunkId", "text", "termType")
    val tfTop = retrieval.termSearch(terms, chunks, "rareword common").collect()
    val idfTop = retrieval.termSearchIdf(terms, chunks, "rareword common").collect()
    assert(tfTop.head.getAs[String]("chunkId") == "d_chunk0", "TF favors frequency")
    assert(idfTop.head.getAs[String]("chunkId") == "d_chunk1", "IDF favors rarity")
    // IDF scores: c1 = 1*ln(4/4) + 1*ln(4/1) = ln 4; c0 = 2*ln(4/4) = 0
    assert(math.abs(idfTop.head.getAs[Double]("score") - math.log(4.0)) < 1e-9)
  }

  test("BM25 saturates term frequency where raw TF does not") {
    val s = spark; import s.implicits._
    // c0 stuffs the common term ×8; c1 matches BOTH query terms once.
    // TF ranks c0 first (8 > 2); BM25's k1 saturation caps the stuffed
    // term near (k1+1)·idf while two distinct matched terms add two
    // idf contributions — c1 must win.
    val chunks = spark.createDataset(Seq(
      Chunk("d", "d_chunk0", 0, "spam " * 8, 8),
      Chunk("d", "d_chunk1", 1, "spam rareword other five six seven eight", 8),
      Chunk("d", "d_chunk2", 2, "filler words here padding five six seven", 8),
      Chunk("d", "d_chunk3", 3, "filler words here padding five six seven", 8)))
    val terms = (Seq.fill(8)(("d_chunk0", "spam", "unigram")) ++ Seq(
      ("d_chunk1", "spam", "unigram"), ("d_chunk1", "rareword", "unigram")))
      .toDF("chunkId", "text", "termType")
    val tfTop = retrieval.termSearch(terms, chunks, "spam rareword").collect()
    val bm25Top = retrieval.termSearchBm25(terms, chunks, "spam rareword").collect()
    assert(tfTop.head.getAs[String]("chunkId") == "d_chunk0", "TF favors stuffing")
    assert(bm25Top.head.getAs[String]("chunkId") == "d_chunk1",
      s"BM25 must favor term diversity: ${bm25Top.toSeq}")
    // hand-computed score for c1 (tf=1 both terms, dl=8=avgdl → len norm 1):
    // per term: ln(1+(4-df+0.5)/(df+0.5)) · (1·2.2)/(1+1.2); df(spam)=2, df(rare)=1
    val expected = (math.log(1 + 2.5 / 2.5) + math.log(1 + 3.5 / 1.5)) * 2.2 / 2.2
    assert(math.abs(bm25Top.head.getAs[Double]("score") - expected) < 1e-9)
  }

  test("schema-evolved store: null tf rows score as tf=1, never NULL") {
    val s = spark; import s.implicits._
    val chunks = spark.createDataset(Seq(
      Chunk("d", "d_chunk0", 0, "legacy rareword text", 3),
      Chunk("d", "d_chunk1", 1, "fresh rareword text", 3),
      // padding chunks keep df < N so the IDF weight stays positive
      Chunk("d", "d_chunk2", 2, "unrelated filler text", 3),
      Chunk("d", "d_chunk3", 3, "unrelated filler text", 3)))
    // a store written pre-tf then merged with an evolved delta: old rows
    // have tf = null (unionByName null-fill), new rows carry counts
    val terms = Seq(
      ("d_chunk0", "rareword", "unigram", None: Option[Long]),
      ("d_chunk1", "rareword", "unigram", Some(2L)))
      .toDF("chunkId", "text", "termType", "tf")
    for (hits <- Seq(
        retrieval.termSearch(terms, chunks, "rareword"),
        retrieval.termSearchIdf(terms, chunks, "rareword"),
        retrieval.termSearchBm25(terms, chunks, "rareword"))) {
      val rows = hits.collect()
      assert(rows.map(_.getAs[String]("chunkId")).toSet ==
        Set("d_chunk0", "d_chunk1"), s"legacy chunk dropped: ${rows.toSeq}")
      rows.foreach { r =>
        assert(!r.isNullAt(r.fieldIndex("score")), s"NULL score: $r")
      }
      // the null-tf row counts as tf >= 1 → ranks below tf=2, not last
      val by = rows.map(r => r.getAs[String]("chunkId") -> r.getAs[Double]("score")).toMap
      assert(by("d_chunk1") > by("d_chunk0") && by("d_chunk0") > 0.0)
    }
  }

  test("vector search: a chunk's own text embeds closest to itself") {
    val s = spark; import s.implicits._
    val someChunk = result.chunks.head()
    val hits = retrieval
      .vectorSearch(result.chunkEmbeddings, result.chunks, someChunk.text, 5)
      .collect()
    assert(hits.nonEmpty)
    // NOTE: query prefix ("query: ") differs from passage prefix, so
    // cosine < 1.0, but the identical text must still win.
    assert(hits.head.getAs[String]("chunkId") == someChunk.chunkId)
  }

  test("ann defaults hit mean recall@10 >= 0.8 over a query sample") {
    val s = spark; import s.implicits._
    // the default (L=4 tables, r=1 multi-probe) was chosen from the
    // AnnSweep recall/read-amplification table in BENCH/BASELINE.md
    // (measured 0.92-0.95 mean recall across corpus sizes); this pins the
    // property the default promises — over a SAMPLE of queries, not the
    // single-query spot check in GraphRagSuite (one query's recall
    // legitimately ranges 0.5-1.0 at these settings)
    val emb = new graft.kg.embed.HashEmbedder()
    val thr = graft.kg.retrieve.VectorIndex.computeThresholds(
      result.chunkEmbeddings.toDF(), emb.dim)
    val idx = graft.kg.retrieve.VectorIndex.layout(
      result.chunkEmbeddings.toDF(), emb.dim, thr)
    val texts = result.chunks.orderBy("chunkId").collect().map(_.text)
    val queries = texts.indices.by(math.max(1, texts.length / 12)).take(12)
      .map(texts)
    val recalls = queries.map { q =>
      val exact = retrieval.vectorSearch(result.chunkEmbeddings, result.chunks, q)
        .select("chunkId").collect().map(_.getString(0)).toSet
      val ann = retrieval.vectorSearchAnn(idx, result.chunks, q, thresholds = thr)
        .select("chunkId").collect().map(_.getString(0)).toSet
      (ann intersect exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@10 over ${recalls.size} queries: $mean%.3f")
    assert(mean >= 0.8, s"mean ANN recall $mean < 0.8 (recalls=$recalls)")
  }

  test("vector search plan is columnar: no UDF / object-deserialize stage") {
    val s = spark; import s.implicits._
    // materialize the tables so the scan side has no typed-stage lineage —
    // the production path reads them from the graph store the same way
    val tmp = java.nio.file.Files.createTempDirectory("graftvecplan").toString
    result.chunkEmbeddings.write.mode("overwrite").parquet(s"$tmp/emb")
    result.chunks.write.mode("overwrite").parquet(s"$tmp/chunks")
    val emb = spark.read.parquet(s"$tmp/emb").as[ChunkEmbedding]
    val chunks = spark.read.parquet(s"$tmp/chunks").as[Chunk]
    val scored = retrieval.vectorSearch(emb, chunks, "anything", 5)
    val plan = scored.queryExecution.executedPlan.toString
    // the scoring must be the native dot_product expression over the
    // parquet scan — no typed .map (DeserializeToObject/MapElements), no
    // Scala UDF anywhere in the query
    assert(!plan.contains("DeserializeToObject"), s"object stage in plan:\n$plan")
    assert(!plan.contains("MapElements"), s"typed map in plan:\n$plan")
    assert(!plan.contains("UDF("), s"UDF in plan:\n$plan")
    assert(plan.toLowerCase.contains("dotproduct("),
      s"native dot_product missing from plan:\n$plan")
    assert(scored.collect().nonEmpty)
  }

  test("lsh alias re-score plan uses native expressions, not UDFs") {
    val s = spark; import s.implicits._
    val names = Seq("util lib", "utillib", "utility lib", "alphabeta")
    val vecs = stages.Link.mentionEmbeddings(names.toDF("name"), new HashEmbedder())
    val aliases = stages.Link.lshAliases(vecs, threshold = 0.8, linkTopK = 10)
    val plan = aliases.queryExecution.executedPlan.toString.toLowerCase
    // the MinHashLSH blocking itself is Spark ML (UDF-based internally);
    // assert OUR stages are native: shingles via transform(...) and the
    // re-score via dot_product (prints as "dotproduct(" in the plan)
    assert(plan.contains("dotproduct("),
      s"native re-score missing from plan:\n$plan")
    assert(plan.contains("array_distinct(transform("),
      s"higher-order shingle expr missing from plan:\n$plan")
  }

  test("stopword-only query: term search empty, hybrid falls back to vector side") {
    val empty = retrieval.termSearch(result.terms.toDF(), result.chunks, "the is of")
    assert(empty.count() == 0)
    assert(empty.columns.toSet == Set("chunkId", "score", "text"))
    // hybrid must still work (graph side contributes nothing)
    val hits = retrieval.hybridSearch(result.terms.toDF(), result.chunks,
      result.chunkEmbeddings, "the is of").collect()
    assert(hits.nonEmpty, "vector side should still return chunks")
  }

  test("hybrid merge is bounded by weights and normalization") {
    val q = gen.truth.head._1
    val hits = retrieval.hybridSearch(result.terms.toDF(), result.chunks,
      result.chunkEmbeddings, q).collect()
    assert(hits.nonEmpty)
    hits.foreach { r =>
      val sc = r.getAs[Double]("score")
      assert(sc >= 0.0 && sc <= 1.0)
    }
  }

  test("context expansion returns ±contextSize neighbors, matches first") {
    val s = spark; import s.implicits._
    // find a doc with >= 2 chunks to make context meaningful
    val multi = result.chunks.toDF().groupBy($"docId").count()
      .filter($"count" >= 2).limit(1).collect()
    assume(multi.nonEmpty, "corpus produced no multi-chunk docs")
    val docId = multi.head.getString(0)
    val center = result.chunks.filter(_.docId == docId).head()
    val hits = Seq((center.chunkId, 1.0)).toDF("chunkId", "score")
    val ctx = retrieval.withContext(hits, result.chunks, 2).collect()
    assert(ctx.exists(r => r.getAs[Boolean]("is_match")))
    assert(ctx.forall(r => r.getAs[String]("docId") == docId))
    assert(ctx.forall(r =>
      math.abs(r.getAs[Int]("index") - center.index) <= 2))
    // matches first (O4 ordering)
    assert(ctx.head.getAs[Boolean]("is_match"))
  }

  test("relationship search finds edges for a capitalized query entity") {
    // single-token subject (the P7 regex only captures one-word runs of
    // a capitalized word per phrase)
    val subj = gen.truth.map(_._1).find(s => !s.contains(' ')).get
    val query = s"What about ${subj.capitalize}?"
    val edges = retrieval.relationshipSearch(result.edges.toDF(), query)
    val rows = edges.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("subj") == subj || r.getAs[String]("obj") == subj)
    }
  }
}
