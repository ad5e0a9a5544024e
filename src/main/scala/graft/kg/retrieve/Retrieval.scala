package graft.kg.retrieve

import graft.kg._
import graft.kg.embed.Embedder
import graft.kg.pipeline.Pipeline
import graft.kg.textspec.{Stopwords, Tokens}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-side retrieval (reference `core/retrieval.py`), re-expressed as
  * single DataFrame programs over the materialized tables instead of
  * per-hit DB round trips (SURVEY.md §3.2/§3.3).
  *
  * Score specs (SURVEY.md §7.5): term relevance = per-(term, chunk) TF
  * summed per chunk (replacing opaque Lucene BM25 — operator shape
  * reproduced); vector score = cosine on unit hash embeddings.
  */
final class Retrieval(embedder: Embedder, config: GraftConfig = GraftConfig())
    extends Serializable {

  /** Bucket id of a literal string under the store layout's
    * `pmod(hash(x), numBuckets)` — the SAME Catalyst expression every
    * writer used, constant-folded DRIVER-SIDE (`Expression.eval` over a
    * literal tree: no plan, no LocalRelation, no job scheduling). The
    * bucket count comes from `config.numBuckets`, which the facade
    * resolves from the STORE's persisted `num_buckets` metadata — a
    * reader must prune with the writer's count, not the engine default. */
  private def bucketOfLit(v: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
    // Murmur3Hash(seed = 42) + Pmod — the exact expressions `hash`/`pmod`
    // plan; evaluated eagerly on the literal tree
    Pmod(new Murmur3Hash(Seq(Literal(v))), Literal(config.numBuckets))
      .eval(null).asInstanceOf[Int]
  }

  private def bucketsOfLits(vs: Seq[String]): Seq[Int] =
    vs.map(bucketOfLit).distinct

  /** TF aggregation over a terms frame: in-flight terms carry one row per
    * occurrence (count them); the materialized table is deduped on the
    * MERGE key with an explicit `tf` multiplicity column (sum it) — same
    * TF score either way. A store created by an older engine version has
    * its pre-existing rows null-filled on `tf` by the schema-evolution
    * MERGE (see [[graft.kg.pipeline.GraphTableIO]]) — a deduped row
    * represents tf ≥ 1, so nulls score as 1 instead of poisoning the sum
    * to NULL (which would rank old-store chunks last with null scores). */
  private def tfScore(terms: DataFrame): org.apache.spark.sql.Column =
    if (terms.columns.contains("tf"))
      sum(coalesce(col("tf"), lit(1L))).cast("double")
    else count(lit(1)).cast("double")

  /** Partition-prune a MATERIALIZED terms table by the query's term-hash
    * buckets: the store lays terms out under
    * `tbucket = pmod(hash(text), NumBuckets)` dirs (see
    * [[Pipeline.materialize]]), and the bucket ids of a literal term list
    * fold at plan time — the scan then reads ≤ |query terms| of the
    * NumBuckets directories. The `isNull` arm keeps rows a pre-tbucket
    * engine version wrote (schema evolution null-fills them into the
    * default partition — pruning is an optimization, never a filter).
    * In-flight frames (no tbucket column) pass through untouched. */
  private def pruneTermBuckets(terms: DataFrame, qTerms: Seq[String]): DataFrame =
    if (!terms.columns.contains("tbucket")) terms
    else {
      // bucket ids via the SAME Murmur3 `hash` expression the writer
      // used, constant-folded driver-side (bucketOfLit — no job)
      val buckets = bucketsOfLits(qTerms)
      terms.filter(col("tbucket").isin(buckets: _*) || col("tbucket").isNull)
    }

  /** A1 term search: query terms → term-edge equi-join → SUM per chunk →
    * top-k (`retrieval.py:193-229`). `terms` = (chunkId, text, termType);
    * the query-term list is tiny → broadcast. */
  def termSearch(terms: DataFrame, chunks: Dataset[Chunk], query: String,
      topK: Int = config.topK): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val qTerms = Tokens.normalize(query).filterNot(Stopwords.english.contains).distinct
    if (qTerms.isEmpty) // full result schema, zero rows
      return chunks.toDF().select($"chunkId", lit(0.0).as("score"), $"text").limit(0)
    val tfCol = tfScore(terms)
    pruneTermBuckets(terms, qTerms)
      .filter($"termType" === "unigram" && $"text".isin(qTerms: _*))
      .groupBy($"chunkId")
      .agg(tfCol.as("score"))
      .join(chunks.toDF().select($"chunkId", $"text"), Seq("chunkId"))
      .orderBy($"score".desc, $"chunkId")
      .limit(topK)
  }

  /** A1 variant: DF-weighted term relevance. The reference ranks term
    * search with Lucene fulltext scores (`retrieval.py:204-218`); raw TF
    * ([[termSearch]]) is the documented spec substitution — this option
    * adds the IDF weight a Lucene-like ranking carries:
    * score(chunk) = Σ_t tf(t, chunk) · ln(N / df(t)), N = chunk count,
    * df = chunks containing t. All partial-aggregable + two broadcast
    * scalars — no extra shuffles beyond [[termSearch]]'s. */
  def termSearchIdf(terms: DataFrame, chunks: Dataset[Chunk], query: String,
      topK: Int = config.topK): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val qTerms = Tokens.normalize(query).filterNot(Stopwords.english.contains).distinct
    if (qTerms.isEmpty)
      return chunks.toDF().select($"chunkId", lit(0.0).as("score"), $"text").limit(0)
    val tfCol = tfScore(terms)
    val hits = pruneTermBuckets(terms, qTerms)
      .filter($"termType" === "unigram" && $"text".isin(qTerms: _*))
    val tf = hits.groupBy($"chunkId", $"text").agg(tfCol.as("tf"))
    val dfreq = tf.groupBy($"text")
      .agg(count(lit(1)).cast("double").as("df")) // tf rows are distinct (chunk, term)
    val n = chunks.toDF().agg(count(lit(1)).cast("double").as("n_chunks"))
    tf.join(broadcast(dfreq), Seq("text"))
      .crossJoin(broadcast(n))
      .select($"chunkId", ($"tf" * log($"n_chunks" / $"df")).as("w"))
      .groupBy($"chunkId").agg(sum($"w").as("score"))
      .join(chunks.toDF().select($"chunkId", $"text"), Seq("chunkId"))
      .orderBy($"score".desc, $"chunkId")
      .limit(topK)
  }

  /** A1 variant: full BM25 ranking (Robertson/Sparck-Jones IDF + tf
    * saturation k1 + length normalization b) — the closest shape to the
    * Lucene fulltext score the reference delegates to
    * (`retrieval.py:204-218`). score(chunk) =
    * Σ_t ln(1 + (N-df+0.5)/(df+0.5)) · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)),
    * dl = chunk token count, avgdl its mean. All partial-aggregable plus
    * two broadcast scalars — no extra shuffles beyond [[termSearchIdf]]. */
  def termSearchBm25(terms: DataFrame, chunks: Dataset[Chunk], query: String,
      topK: Int = config.topK, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val qTerms = Tokens.normalize(query).filterNot(Stopwords.english.contains).distinct
    if (qTerms.isEmpty)
      return chunks.toDF().select($"chunkId", lit(0.0).as("score"), $"text").limit(0)
    val hits = pruneTermBuckets(terms, qTerms)
      .filter($"termType" === "unigram" && $"text".isin(qTerms: _*))
    val tf = hits.groupBy($"chunkId", $"text").agg(tfScore(terms).as("tf"))
    val dfreq = tf.groupBy($"text")
      .agg(count(lit(1)).cast("double").as("df")) // tf rows are distinct (chunk, term)
    val stats = chunks.toDF().agg(count(lit(1)).cast("double").as("n_chunks"),
      avg($"nTokens").as("avgdl"))
    tf.join(broadcast(dfreq), Seq("text"))
      .join(chunks.toDF().select($"chunkId", $"nTokens".cast("double").as("dl")),
        Seq("chunkId"))
      .crossJoin(broadcast(stats))
      .select($"chunkId",
        (log(lit(1.0) + ($"n_chunks" - $"df" + 0.5) / ($"df" + 0.5)) *
          ($"tf" * (k1 + 1.0)) /
          ($"tf" + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / $"avgdl"))).as("w"))
      .groupBy($"chunkId").agg(sum($"w").as("score"))
      .join(chunks.toDF().select($"chunkId", $"text"), Seq("chunkId"))
      .orderBy($"score".desc, $"chunkId")
      .limit(topK)
  }

  /** O1 vector search: embed the query ("query: " prefix,
    * `retrieval.py:93`), brute-force cosine over chunk embeddings,
    * TakeOrderedAndProject top-k (`retrieval.py:107-161`). The query
    * vector is a plan-time literal (broadcast with the codegen'd task
    * binary) scored by the native dot_product expression — the scan stays
    * columnar inside WholeStageCodegen instead of deserializing a
    * ChunkEmbedding object per row; on unit vectors dot == cosine. */
  def vectorSearch(embeddings: Dataset[ChunkEmbedding], chunks: Dataset[Chunk],
      query: String, topK: Int = config.topK): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val qv = embedder.embedQuery(query)
    val scored = embeddings.toDF().select($"chunkId",
      graft.functions.VectorFunctions.dot_product($"vec", typedLit(qv)).as("score"))
    // top-k BEFORE the text join: TakeOrderedAndProject on the scored
    // scan, then a topK-row broadcast join — joining first would shuffle
    // the full chunk table per query (Catalyst cannot push a limit
    // through an inner join)
    scored
      .orderBy($"score".desc, $"chunkId")
      .limit(topK)
      .join(chunks.toDF().select($"chunkId", $"text"), Seq("chunkId"))
      .orderBy($"score".desc, $"chunkId")
  }

  /** O1 vector search, ANN scale path: the query's LSH sign-sketch
    * probe plan (query-directed multi-probe, computed driver-side —
    * [[VectorIndex.queryBuckets]]) becomes a LITERAL disjunction over the
    * `(l, vbucket)` PARTITION columns of the `chunk_vec_index` layout —
    * the scan partition-prunes to L·probesPerTable of the L·2^K
    * directories instead of reading every chunk vector
    * ([[vectorSearch]] is the exact full-scan baseline; the reference's
    * Qdrant search is itself approximate HNSW, `retrieval.py:107-161`).
    * Candidates are re-scored with the EXACT native dot product, so
    * precision is 1.0 — only recall is approximate (mean recall@10 vs
    * read amplification measured in BENCH/BASELINE.md; defaults hit
    * ~0.93 at ~0.8× the rows of the exact scan). */
  def vectorSearchAnn(vecIndex: DataFrame, chunks: Dataset[Chunk],
      query: String, topK: Int = config.topK,
      probesPerTable: Int = VectorIndex.DefaultProbes,
      thresholds: Array[Double] = VectorIndex.zeroThresholds): DataFrame = {
    val qv = embedder.embedQuery(query)
    val pairs = VectorIndex.queryBuckets(qv, probesPerTable, thresholds)
    // one isin per table instead of L·P equality disjuncts — the same
    // partition pruning, a fraction of the predicate nodes to plan
    val pred = pairs.groupBy(_._1).map { case (l, bs) =>
      col("l") === lit(l) && col("vbucket").isin(bs.map(_._2).distinct: _*)
    }.reduce(_ || _)
    vecIndex.filter(pred)
      // score FIRST (map-only over the pruned scan), dedup after: a chunk
      // colliding with the query in several tables carries the same score
      // everywhere, and deduping on (chunkId, score) shuffles two narrow
      // columns instead of the full embedding payload; the text join runs
      // on the topK rows only (see vectorSearch)
      .select(col("chunkId"),
        graft.functions.VectorFunctions.dot_product(col("vec"), typedLit(qv))
          .as("score"))
      // a chunk appears at most once per table with an IDENTICAL score,
      // so the K-th distinct chunk ranks within the top K·L rows —
      // TakeOrdered(K·L) first, then dedup the ≤ K·L survivors: the
      // dedup exchange moves dozens of rows instead of the full pruned
      // candidate set
      .orderBy(col("score").desc, col("chunkId"))
      .limit(topK * VectorIndex.NumTables)
      .dropDuplicates("chunkId")
      .orderBy(col("score").desc, col("chunkId"))
      .limit(topK)
      .join(chunks.toDF().select(col("chunkId"), col("text")), Seq("chunkId"))
      .orderBy(col("score").desc, col("chunkId"))
  }

  /** A3 min-max normalization with all-equal → 1.0
    * (`retrieval.py:550-569`), over a (chunkId, score, text) frame.
    * Global min/max via partial-aggregable `agg` + broadcast crossJoin
    * (SURVEY.md §2.7) — an empty `Window.partitionBy()` would plan a
    * single-partition exchange, the classic scale-killer if this is ever
    * reused on a large frame. */
  def minMaxNormalize(results: DataFrame): DataFrame = {
    val stats = results.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
    results.crossJoin(broadcast(stats))
      .withColumn("score",
        when(col("mx") === col("mn"), lit(1.0))
          .otherwise((col("score") - col("mn")) / (col("mx") - col("mn"))))
      .drop("mn", "mx")
  }

  /** A4 weighted hybrid merge (`retrieval.py:574-605`): full-outer on
    * chunkId, missing side 0.0, w*vec + (1-w)*graph, top-k.
    * `termHits` overrides the graph side (e.g. the IDF-weighted ranking
    * from [[termSearchIdf]]); default = TF [[termSearch]]. */
  def hybridSearch(terms: DataFrame, chunks: Dataset[Chunk],
      embeddings: Dataset[ChunkEmbedding], query: String,
      topK: Int = config.topK, vectorWeight: Double = config.vectorWeight,
      termHits: Option[DataFrame] = None,
      vectorHits: Option[DataFrame] = None): DataFrame = {
    // pin each topK-row hit frame before composing: min-max normalize
    // consumes its input through TWO branches (the min/max agg and the
    // re-scored projection) and the merge join adds more — Catalyst does
    // not dedupe common subtrees across branches, so without the pin
    // every branch re-executes the full search subtree (measured ~2× the
    // query latency at a 250k-chunk store). LAZY checkpoint (eager =
    // false): the topK rows materialize on the FIRST action and are
    // shared by every later branch — an eager one would execute both
    // searches at query-construction time, which callers that only
    // consume the triplets side would pay for nothing.
    val v = minMaxNormalize(
      vectorHits.getOrElse(vectorSearch(embeddings, chunks, query, topK))
        .localCheckpoint(eager = false)).as("v")
    val g = minMaxNormalize(
      termHits.getOrElse(termSearch(terms, chunks, query, topK))
        .localCheckpoint(eager = false)).as("g")
    v.select(col("chunkId"), col("score").as("vscore"), col("text").as("vtext"))
      .join(g.select(col("chunkId"), col("score").as("gscore"), col("text").as("gtext")),
        Seq("chunkId"), "full_outer")
      .select(col("chunkId"),
        (coalesce(col("vscore"), lit(0.0)) * vectorWeight +
          coalesce(col("gscore"), lit(0.0)) * (1.0 - vectorWeight)).as("score"),
        coalesce(col("vtext"), col("gtext")).as("text"))
      .orderBy(col("score").desc, col("chunkId"))
      .limit(topK)
  }

  /** §3.3 context expansion: the reference walks ±contextSize hops with
    * 2·N bolt round trips per hit (`retrieval.py:373-467`); here it is a
    * single range self-join on (docId, |Δindex| ≤ contextSize), with U2
    * first-wins dedup (match score > context 0.0) and O4 matches-first
    * ordering. `hits` = (chunkId, score). */
  def withContext(hits: DataFrame, chunks: Dataset[Chunk],
      contextSize: Int = config.contextSize): DataFrame = {
    val c = chunks.toDF()
    val hitChunks = hits
      .join(c, Seq("chunkId"))
      .select(col("chunkId").as("hitId"), col("docId").as("hitDoc"),
        col("index").as("hitIdx"), col("score"))
    hitChunks
      .join(c, col("docId") === col("hitDoc") &&
        abs(col("index") - col("hitIdx")) <= contextSize)
      .select(col("chunkId"), col("text"), col("index"), col("docId"),
        when(col("chunkId") === col("hitId"), col("score")).otherwise(lit(0.0))
          .as("score"),
        (col("chunkId") === col("hitId")).as("is_match"))
      // U2: a chunk reachable from several hits keeps its best score
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("chunkId")).orderBy(col("score").desc)))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("score").desc, col("docId"), col("index"))
  }

  /** Entity search (reference `retrieval.py:231-263`): queries
    * `MENTIONS_ENTITY` relationships — which NOTHING in the reference
    * ever creates (SURVEY.md §1.2 dead schema element), so the reference
    * always returns 0 rows. Reproduced faithfully: there is no
    * mentions-entity table, so the result is structurally empty. Kept so
    * a reference user finds the same API with the same (degenerate)
    * behavior rather than a silent omission. */
  def entitySearch(chunks: Dataset[Chunk], query: String,
      topK: Int = config.topK): DataFrame = {
    chunks.toDF()
      .select(col("chunkId"), col("text"), lit(0.0).as("score"))
      .limit(0)
  }

  /** Relationship (triplet) lookup per query entity
    * (`retrieval.py:265-314,607-637`): capitalized-phrase entity
    * candidates (P7 regex), per-entity edge filter, O5 per-entity and
    * global top-k caps. `edges` = RelatesToEdge table. */
  def relationshipSearch(edges: DataFrame, query: String,
      topK: Int = config.topK): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val entities = queryEntities(query)
    if (entities.isEmpty) return edges.limit(0)
    edges
      .withColumn("entity",
        explode(filter(typedLit(entities),
          e => e === $"subj" || e === $"obj")))
      .transform(capPerEntity(_, topK, entities.size))
  }

  /** P7 capitalized-phrase entity candidates of a query. */
  private def queryEntities(query: String): Seq[String] =
    "[A-Z][a-z]+(?:\\s+[A-Z][a-z]+)*".r
      .findAllIn(query).map(_.toLowerCase).toSeq.distinct

  /** O5 caps shared by both relationship-lookup paths: per-entity top-k by
    * (subj, pred, obj), then the reference's global topK·entities cap. */
  private def capPerEntity(hits: DataFrame, topK: Int, nEntities: Int): DataFrame = {
    val perEntity = Window.partitionBy(col("entity"))
      .orderBy(col("subj"), col("pred"), col("obj"))
    hits
      .withColumn("rn", row_number().over(perEntity))
      .filter(col("rn") <= topK).drop("rn")
      .orderBy(col("entity"), col("subj"), col("pred"), col("obj"))
      .limit(topK * math.max(nEntities, 1))
  }

  /** [[relationshipSearch]] routed through the entity-bucketed secondary
    * edge layout (`edge_entity_index`, written at materialize: one row per
    * (entity ∈ {subj, obj}, edge), partitioned by
    * `ebucket = pmod(hash(entity), NumBuckets)`).
    *
    * The scan-based path reads the FULL edge table per query — edges are
    * bucketed by pred hash only, so a by-entity filter prunes nothing and
    * at 100× every query pays a full scan (the reference's lookup is
    * per-entity indexed, `retrieval.py:265-314`). Here the query entities'
    * bucket ids are computed driver-side ([[bucketOfLit]] — the writer's
    * own Murmur3 `hash` expression constant-folded, no job) and pushed as
    * a LITERAL `ebucket IN (...)` predicate, so the parquet scan
    * partition-prunes to ≤ |entities| of the store's bucket directories
    * before the row-level entity filter. */
  def relationshipSearchIndexed(edgeIndex: DataFrame, query: String,
      topK: Int = config.topK): DataFrame = {
    val spark = edgeIndex.sparkSession
    import spark.implicits._
    val entities = queryEntities(query)
    val resultCols =
      Seq($"subj", $"pred", $"obj", $"label", $"sourceChunkId", $"entity")
    if (entities.isEmpty) return edgeIndex.select(resultCols: _*).limit(0)
    val buckets = bucketsOfLits(entities)
    edgeIndex
      .filter($"ebucket".isin(buckets: _*) && $"entity".isin(entities: _*))
      .select(resultCols: _*)
      .transform(capPerEntity(_, topK, entities.size))
  }

  /** [[relationshipSearch]] with the reference's ALIAS semantics over the
    * CANONICAL graph: each query entity's surface form is first mapped
    * through the store's `canonical_map` (the CC output of similarity
    * linking), and the lookup runs against the entity-bucketed layout of
    * `canonical_edges` — so a query naming ANY alias of a merged entity
    * finds the whole merged component's relationships, the reachability
    * the reference's alias cross-product MERGEs give its per-entity
    * lookup (`triplets.py:371-398`, `retrieval.py:265-314`). The returned
    * `entity` column keeps the QUERY's surface form (what the user asked
    * about); subj/obj are canonical names.
    *
    * Scale shape: the canonical-map probe collects ≤ |query entities|
    * rows from a cbucket-partition-pruned scan of the non-identity map
    * (a map written by a pre-layout engine passes through unpruned), and
    * the edge lookup partition-prunes on the canonical entities' ebucket
    * ids exactly like [[relationshipSearchIndexed]] — per-query I/O is
    * bounded by |entities| bucket directories of each table, never a
    * full scan of either. */
  def relationshipSearchCanonical(canonEdgeIndex: DataFrame,
      canonMap: DataFrame, query: String,
      topK: Int = config.topK): DataFrame = {
    val spark = canonEdgeIndex.sparkSession
    import spark.implicits._
    val entities = queryEntities(query)
    val resultCols =
      Seq($"subj", $"pred", $"obj", $"label", $"sourceChunkId", $"entity")
    if (entities.isEmpty) return canonEdgeIndex.select(resultCols: _*).limit(0)
    // surface form → canonical name (identity when unlinked); the isNull
    // arm keeps rows a pre-cbucket engine version wrote. The map probe's
    // collect is the lookup's ONE job — every bucket id folds driver-side
    val mapPruned =
      if (!canonMap.columns.contains("cbucket")) canonMap
      else {
        val bs = bucketsOfLits(entities)
        canonMap.filter($"cbucket".isin(bs: _*) || $"cbucket".isNull)
      }
    val canonOf = mapPruned.filter($"name".isin(entities: _*))
      .select("name", "canonicalName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val pairs = entities.map(e => (e, canonOf.getOrElse(e, e)))
    val canonEnts = pairs.map(_._2).distinct
    // tiny (surface, canonical) frame re-attaches the surface form the
    // user queried by — two aliases of one component each get the full
    // merged edge set under their own entity value
    val surf = broadcast(spark.createDataset(pairs).toDF("qentity", "entity"))
    canonEdgeIndex
      .filter($"ebucket".isin(bucketsOfLits(canonEnts): _*) &&
        $"entity".isin(canonEnts: _*))
      .join(surf, Seq("entity"))
      .select($"subj", $"pred", $"obj", $"label", $"sourceChunkId",
        $"qentity".as("entity"))
      .transform(capPerEntity(_, topK, entities.size))
  }
}
