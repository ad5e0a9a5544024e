package graft.kg.pipeline

import graft.kg._
import graft.kg.embed.{Embedder, HashEmbedder}
import graft.kg.extract.{RuleSVOExtractor, TripletExtractor}
import graft.kg.stages._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end KG-construction pipeline (reference `graphrag process`,
  * SURVEY.md §3.1), as ONE lazy Catalyst DAG:
  *
  *   corpus scan → repartitionByRange(repo, path) → docs (sha256) →
  *   chunks (per-row greedy pack, no shuffle) → {embeddings, terms,
  *   triples} (mapPartitions / flatMap, no shuffle) → distinct mentions →
  *   linking (exact | MinHash-LSH + cosine) → connected-components
  *   canonicalization → vertex/edge dedup-MERGE materialization.
  *
  * The reference executes this as ~10⁴ per-row DB round trips
  * (SURVEY.md §4.2); here the only shuffles are the mention `distinct`,
  * the LSH join (lsh mode only), CC iterations (lsh mode only), and the
  * final MERGE-key dedups.
  */
final class Pipeline(
    config: GraftConfig = GraftConfig(),
    embedder: Embedder = new HashEmbedder(),
    extractor: TripletExtractor = new RuleSVOExtractor()) extends Serializable {

  final case class Result(
      docs: Dataset[Doc],
      chunks: Dataset[Chunk],
      chunkEmbeddings: Dataset[ChunkEmbedding],
      terms: Dataset[Term],
      triples: Dataset[Triple],
      mentionVecs: DataFrame,
      aliases: Dataset[AliasPair],
      canonical: Dataset[CanonicalMapping],
      edges: Dataset[RelatesToEdge],
      canonicalEdges: Dataset[RelatesToEdge],
      vertices: Dataset[EntityVertex])

  /** Build the full lazy DAG from a corpus Dataset. Nothing executes until
    * an action / materialization. */
  def run(corpus: Dataset[CorpusRow]): Result = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val ckpt = new Checkpoint(spark, config.checkpointDir.getOrElse(""),
      enabled = config.checkpointDir.isDefined)
    // input fingerprint for resume: config knobs that change stage output.
    // At scale this would be the Iceberg snapshot id of the corpus table.
    val fp = s"mt=${config.maxTokensPerChunk};link=${config.linkMode};" +
      s"thr=${config.linkThreshold};topk=${config.linkTopK}"

    val docs = Ingest.docs(corpus)

    val chunks = ckpt.stage("chunks", "v1", fp) {
      Metrics.observeRows(
        Ingest.chunks(docs, config.maxTokensPerChunk).toDF(), "chunks")
    }.as[Chunk]

    val embeddings = Ingest.chunkEmbeddings(chunks, embedder)
    val terms = Terms.terms(chunks, config.removeStopwords)

    val triples = ckpt.stage("triples", "v1", fp) {
      Metrics.observeRows(Triples.triples(chunks, extractor).toDF(), "triples")
    }.as[Triple]

    val mentions = Link.mentions(triples)
    val mentionVecs = Link.mentionEmbeddings(mentions, embedder)

    val aliases: Dataset[AliasPair] = config.linkMode match {
      case "lsh" =>
        ckpt.stage("aliases", "v1", fp) {
          Link.lshAliases(mentionVecs, config.linkThreshold, config.linkTopK).toDF()
        }.as[AliasPair]
      case _ => Link.exactAliases(spark) // stock reference behavior
    }

    val canonical = Canonicalize.canonicalMap(mentions, aliases)
    val edges = Materialize.edges(triples)
    val canonEdges = Materialize.canonicalEdges(edges, canonical)
    val vertices = Materialize.vertices(triples, mentionVecs, canonical)

    Result(docs, chunks, embeddings, terms, triples, mentionVecs, aliases,
      canonical, edges, canonEdges, vertices)
  }

  /** Materialize the graph into MERGE-semantics tables (SURVEY.md §7.4):
    * idempotent — re-running over the same corpus leaves the tables
    * unchanged (Neo4j-MERGE parity, U4). Returns per-table row counts
    * (the stage counters of the north rule's lineage+metrics requirement). */
  def materialize(corpus: Dataset[CorpusRow], io: GraphTableIO): Map[String, Long] = {
    val spark = corpus.sparkSession
    val r = run(corpus)
    io.merge(spark, "chunks", r.chunks.toDF(), Seq("chunkId"))
    io.merge(spark, "chunk_embeddings", r.chunkEmbeddings.toDF(), Seq("chunkId"))
    io.merge(spark, "terms",
      r.terms.toDF().dropDuplicates("chunkId", "text", "termType"),
      Seq("chunkId", "text", "termType"))
    io.merge(spark, "edges", r.edges.toDF(), Seq("subj", "pred", "obj"))
    io.merge(spark, "canonical_edges", r.canonicalEdges.toDF(),
      Seq("subj", "pred", "obj"))
    io.merge(spark, "vertices", r.vertices.toDF(), Seq("name"))
    io.merge(spark, "aliases", r.aliases.toDF(), Seq("a", "b"))
    val tableCounts = Seq("chunks", "chunk_embeddings", "terms", "edges",
      "canonical_edges", "vertices", "aliases")
      .map(t => t -> io.read(spark, t).count()).toMap
    // fold in the observed in-flight stage counters (Metrics piggyback on
    // the actions above — no extra job)
    tableCounts ++ Metrics.snapshot.map { case (k, v) => s"observed_$k" -> v }
  }
}
