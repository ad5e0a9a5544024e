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
object Pipeline {
  /** Hash-bucket count of the physical table layouts (sbucket/nbucket/
    * ebucket — Iceberg `bucket(N, col)` analogue, SURVEY.md §4.4). Shared
    * with the query side so entity-bucket pruning computes the same
    * bucket ids the writer laid down. */
  val NumBuckets = 32

  /** Entity-bucketed secondary layout rows of an edge frame: one row per
    * (entity ∈ {subj, obj}, edge), `ebucket = pmod(hash(entity), N)` —
    * the per-entity-lookup index shape shared by `edge_entity_index`
    * (base edges) and `canonical_edge_entity_index` (canonical edges).
    * Deduped on the index key: a self-edge (subj == obj after
    * canonicalization) explodes into two identical rows. */
  def entityIndexRows(edges: org.apache.spark.sql.DataFrame,
      numBuckets: Int = NumBuckets): org.apache.spark.sql.DataFrame =
    edges
      .select(explode(array(col("subj"), col("obj"))).as("entity"),
        col("subj"), col("pred"), col("obj"), col("label"), col("sourceChunkId"))
      .dropDuplicates("entity", "subj", "pred", "obj")
      .withColumn("ebucket", pmod(hash(col("entity")), lit(numBuckets)))

  /** [[entityIndexRows]] plus each row's SOURCE-edge primary-layout
    * bucket (`sbucket = hash(subj)`) — the canonical index carries it so
    * delta compaction can drop a rebuilt sbucket's index rows with a
    * partition-pruned FILTER and re-derive them from the rebuilt content,
    * instead of set-differencing the old vs new bucket content (two
    * shuffles over O(bucket) rows per batch, measured dominant in the
    * round-5 incremental series). */
  def canonicalIndexRows(edges: org.apache.spark.sql.DataFrame,
      numBuckets: Int = NumBuckets): org.apache.spark.sql.DataFrame =
    entityIndexRows(edges, numBuckets)
      .withColumn("sbucket", pmod(hash(col("subj")), lit(numBuckets)))

  /** canonical_map rows under the name-hash-bucketed layout (`cbucket`):
    * the query side canonicalizes its few surface-form entities with a
    * partition-pruned probe instead of scanning the whole linked-name
    * map (see [[graft.kg.retrieve.Retrieval.relationshipSearchCanonical]]). */
  def canonicalMapLayout(map: org.apache.spark.sql.DataFrame,
      numBuckets: Int = NumBuckets): org.apache.spark.sql.DataFrame =
    map.withColumn("cbucket", pmod(hash(col("name")), lit(numBuckets)))

  /** The store's authoritative bucket count: its persisted `num_buckets`
    * layout metadata when present; a store that pre-exists WITHOUT the
    * metadata was written by a pre-knob engine at the historical
    * [[NumBuckets]] (checked against EVERY table a crashed first batch
    * could have left, not just `edges` — a store whose only table is
    * `chunks` was still laid down at 32); only a genuinely fresh store
    * adopts the config knob. The store always wins over the knob —
    * readers and writers resolving from one durable source is what
    * makes mixing two bucket counts in one store impossible. A backend
    * whose metadata is a no-op (default `putMeta`) resolves to the
    * engine default ALWAYS — the knob silently varying per batch on
    * such a backend would mix layouts; materialize detects the no-op by
    * re-reading after the stamp and pins [[NumBuckets]]. */
  def resolveNumBuckets(spark: org.apache.spark.sql.SparkSession,
      io: GraphTableIO, config: GraftConfig): Int =
    io.getMeta(spark, "num_buckets").map { v =>
      // fail LOUDLY on a corrupt stamp — a silent fallback would resolve
      // a different count than the writer used and mix bucket layouts
      try v.trim.toInt
      catch { case e: NumberFormatException =>
        throw new IllegalStateException(
          s"corrupt num_buckets layout metadata ('${v.trim}') — refusing " +
            "to guess a bucket count: a wrong fallback would prune with " +
            "bucket ids the store was not written under. Restore or " +
            "remove the _meta_num_buckets sidecar to recover.", e)
      }
    }.getOrElse(
      // rowCount distinguishes a pre-knob store (rows laid down at 32)
      // from a RESET one (tables exist but empty — any count is
      // consistent with zero rows, so the knob may apply). Metadata-only
      // (footers) and paid only while the meta is absent: the first
      // materialize stamps it and this branch never runs again.
      if (Seq("chunks", "terms", "edges", "vertices", "chunk_embeddings")
            .exists(t => io.exists(spark, t) && io.rowCount(spark, t) > 0))
        NumBuckets
      else config.numBuckets)
}

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
      vertices: Dataset[EntityVertex],
      /** Release caches the run pinned (lsh mode persists the triples
        * stage — see [[run]]); call after the result is fully consumed. */
      cleanup: () => Unit = () => ())

  /** Build the full lazy DAG from a corpus Dataset. Nothing executes until
    * an action / materialization.
    *
    * @param existingVertices prior graph state `(name, vec)` for
    *   INCREMENTAL ingestion: new mentions are similarity-linked against
    *   the existing entity set (the reference's de-facto cross-document
    *   behavior — every `process_triplet` call queries the graph built so
    *   far, `triplets.py:252-343`), so canonical components span batches.
    */
  def run(corpus: Dataset[CorpusRow],
      existingVertices: Option[DataFrame] = None,
      existingBandIndex: Option[DataFrame] = None,
      storeSnapshotFp: Option[String] = None): Result = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val ckpt = new Checkpoint(spark, config.checkpointDir.getOrElse(""),
      enabled = config.checkpointDir.isDefined)

    // mega-repo skew defense: range-split (repo, path) so a 10×-sized
    // repo spreads over many tasks instead of hashing onto one
    val balanced =
      if (config.rangePartitionOnIngest)
        graft.ops.Skew.rangePartitionCorpus(corpus.toDF()).as[CorpusRow]
      else corpus

    val docs = Ingest.docs(balanced)

    // input fingerprint for resume: config knobs that change stage output
    // PLUS corpus identity — a checkpoint from a different corpus must
    // never be silently reused. Identity = row count + order-independent
    // sum of per-row crc32(contentSha256) (one cheap action, only when
    // checkpointing is on; at scale = the Iceberg snapshot id instead).
    def identityFp(df: DataFrame, c: org.apache.spark.sql.Column): String =
      if (!config.checkpointDir.isDefined) ""
      else {
        val r = df.agg(count(lit(1)), sum(crc32(c))).head
        s"${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}"
      }
    val fp = s"mt=${config.maxTokensPerChunk};link=${config.linkMode};" +
      s"thr=${config.linkThreshold};topk=${config.linkTopK}" +
      s";corpus=${identityFp(docs.toDF(), col("contentSha256"))}"

    val chunks = ckpt.stage("chunks", "v1", fp) {
      Ingest.chunks(docs, config.maxTokensPerChunk,
        Some(Metrics.accumulator(spark, "chunks"))).toDF()
    }.as[Chunk]

    val embeddings = Ingest.chunkEmbeddings(chunks, embedder)
    val terms = Terms.terms(chunks, config.removeStopwords)

    val triplesRaw = ckpt.stage("triples", "v1", fp) {
      Metrics.observeRows(Triples.triples(chunks, extractor).toDF(), "triples")
    }.as[Triple]

    // lsh mode executes EAGERLY mid-build (the CC size probe drives the
    // linking DAG) and the final materialization then consumes triples
    // through two more branches (edge build + mention/canonical map) —
    // without a cache the chunk/extract chain executes three times per
    // run. Exact mode stays one fully-lazy DAG (nothing executes twice,
    // so pinning storage there would be pure overhead).
    val triples =
      if (config.linkMode == "lsh")
        triplesRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else triplesRaw
    val cleanup: () => Unit =
      if (config.linkMode == "lsh") () => { triples.unpersist(blocking = false); () }
      else () => ()

    val mentions = Link.mentions(triples)
    val mentionVecs = Link.mentionEmbeddings(mentions, embedder)
    // incremental mode: the linkable universe = new mentions ∪ existing
    // entity names (exact duplicates collapse — names are the MERGE key)
    val linkUniverse = existingVertices match {
      case Some(ev) =>
        mentionVecs.unionByName(ev.select($"name", $"vec")).dropDuplicates("name")
      case None => mentionVecs
    }

    val aliasesLazy: Dataset[AliasPair] = config.linkMode match {
      case "lsh" =>
        // the aliases stage ALSO depends on the prior graph state in
        // incremental mode — fold a vertices-snapshot marker into its
        // fingerprint (but not into chunks/triples, which don't)
        // prior-state identity: prefer the store's snapshot fingerprint
        // (O(metadata) — the Iceberg-snapshot-id analogue, supplied by
        // materialize) over scanning the cumulative vertex/index tables
        // per batch, which is the one remaining O(history) action the
        // resume path would otherwise pay at every incremental ingest
        val evFp = storeSnapshotFp.map(s => s";store=$s").getOrElse(
          existingVertices
            .map(ev => s";ev=${identityFp(ev, col("name"))}").getOrElse("") +
            existingBandIndex
              .map(bi => s";bi=${identityFp(bi, col("name"))}").getOrElse("")) +
          s";mb=${config.lshMaxBucket}" // cap changes the alias output
        ckpt.stage("aliases", "v1", fp + evFp) {
          (existingVertices, existingBandIndex) match {
            case (Some(_), Some(idx)) =>
              // INCREMENTAL linking: probe the stored band index with
              // the batch's signatures — per-batch linking compute
              // scales with the batch, not the cumulative mention
              // universe (re-signing + self-joining the universe every
              // batch was the last O(history) stage of the ingest path).
              // Old-side vectors are recomputed inline (pure function of
              // the name), so the batch reads NO vertex rows at all.
              Link.lshAliasesIncremental(
                mentions.select($"name").distinct(), idx, embedder,
                config.linkThreshold, config.linkTopK,
                maxBucket = config.lshMaxBucket,
                broadcastSmall = !config.saltedCanonicalJoin).toDF()
            case _ =>
              // fresh store, or a legacy store with no stored index yet
              // (materialize backfills it this batch): one full-universe
              // self-join
              Link.lshAliases(linkUniverse, config.linkThreshold,
                config.linkTopK, maxBucket = config.lshMaxBucket).toDF()
          }
        }.as[AliasPair]
      case _ => Link.exactAliases(spark) // stock reference behavior
    }
    // the LEGACY link path (incremental store predating the band index)
    // scans the LIVE vertices file listing lazily, and the later
    // bucket-selective vertices merge DELETES those listed files; a
    // persist is not durable enough (block loss → silent recompute over
    // the stale listing → FileNotFoundException mid-materialize). Cut
    // the lineage eagerly before any table swap. Checkpoint-enabled runs
    // already re-read the stage's own parquet (no live dependency);
    // the band-index path reads only append-only tables (listings stay
    // valid by construction) — neither needs this.
    val aliases: Dataset[AliasPair] =
      if (existingVertices.isDefined && existingBandIndex.isEmpty &&
          config.checkpointDir.isEmpty)
        aliasesLazy.localCheckpoint(true)
      else aliasesLazy

    // when the user signals the mention vocabulary outgrows broadcast
    // (saltedCanonicalJoin), the CC map joins without a broadcast hint too
    val canonical = Canonicalize.canonicalMap(mentions, aliases,
      broadcastCC = !config.saltedCanonicalJoin)
    val edges = Materialize.edges(triples)
    val canonEdges =
      Materialize.canonicalEdges(edges, canonical, salted = config.saltedCanonicalJoin)
    val vertices = Materialize.vertices(triples, mentionVecs, canonical,
      broadcastCanon = !config.saltedCanonicalJoin)

    Result(docs, chunks, embeddings, terms, triples, mentionVecs, aliases,
      canonical, edges, canonEdges, vertices, cleanup)
  }

  /** Materialize the graph into MERGE-semantics tables (SURVEY.md §7.4):
    * idempotent — re-running over the same corpus leaves the tables
    * unchanged (Neo4j-MERGE parity, U4). Returns per-table row counts
    * (the stage counters of the north rule's lineage+metrics requirement).
    *
    * Failure contract: every table write is an idempotent MERGE, so a
    * FAILED batch is safe to retry as-is. A batch that crashes mid-way
    * leaves the canonical tables inconsistent with the merged base tables
    * until the next successful batch: the `batch_inflight` marker set
    * below survives the crash and forces that batch to run ONE full
    * canonical rebuild (derived entirely from the cumulative base
    * tables), healing the gap regardless of which write the crash
    * interrupted. Production mapping: an Iceberg snapshot commit makes
    * the whole batch atomic and the marker unnecessary.
    *
    * Concurrency contract: single writer. The store's writer lock
    * ([[GraphTableIO.withWriterLock]]) makes a second concurrent
    * materialize fail fast instead of corrupting the non-transactional
    * table swaps (production: Iceberg optimistic commit). */
  def materialize(corpus: Dataset[CorpusRow], io: GraphTableIO): Map[String, Long] =
    io.withWriterLock(corpus.sparkSession) { materializeLocked(corpus, io) }

  private def materializeLocked(
      corpus: Dataset[CorpusRow], io: GraphTableIO): Map[String, Long] = {
    val spark = corpus.sparkSession
    // crash detection (see the scaladoc): a marker left by a batch that
    // began but never completed forces one full canonical rebuild now
    val priorIncomplete = io.flagSet(spark, "batch_inflight")
    io.setFlag(spark, "batch_inflight")
    // incremental gating + legacy-path link universe. NO snapshot of
    // the vertex table is taken on the band-index path: it never reads
    // vertex rows — linking probes the stored band index and embeds
    // candidates inline — so per-batch vertices I/O is zero, not
    // O(store). The legacy full-join path (store predating the band
    // index) DOES scan this frame; run() eagerly cuts its lineage
    // (aliases localCheckpoint) before any table swap, because the
    // bucket-selective vertices merge deletes the files this listing
    // names — a lazy recompute after the swap would FileNotFound.
    // captured BEFORE this batch's merges: "store pre-existed" signals
    // for the band-index reconcile below (after the vertices merge,
    // io.exists(vertices) is true even for a genuinely fresh store)
    val verticesPreexisted = io.exists(spark, "vertices")
    val existing =
      if (config.linkMode == "lsh" && verticesPreexisted)
        Some(io.read(spark, "vertices"))
      else None
    // no snapshot needed: the index is append-only (appendNew), and the
    // incremental linking probe MATERIALIZES its scans of this frame
    // eagerly (localCheckpoint in lshAliasesIncremental) — so even the
    // sliver compaction that may replace sub-bound index files at this
    // batch's own append can't invalidate a lazy plan later.
    // Shingle-convention versioning: an index signed under a pre-v2
    // convention (no `band_index_v2` flag) must NOT be probed with v2
    // batch signatures — the md5 band minhashes differ for every name,
    // so every probe would miss. Treat it as absent this batch (one
    // legacy full-universe link) and rebuild it wholesale below.
    val bandIndexStored = io.exists(spark, "lsh_band_index")
    val bandIndexPreV2 = bandIndexStored && !io.flagSet(spark, "band_index_v2")
    val bandIndex =
      if (existing.isDefined && bandIndexStored && !bandIndexPreV2)
        Some(io.read(spark, "lsh_band_index"))
      else None
    // prior-state identity for the resume fingerprint, from storage
    // metadata (Iceberg snapshot id analogue) — never from table rows
    val storeFp = {
      val v = io.snapshotFp(spark, "vertices")
      val bi = io.snapshotFp(spark, "lsh_band_index")
      if (v.isEmpty && bi.isEmpty) None else Some(s"v=$v;bi=$bi")
    }
    val r = run(corpus, existing, bandIndex, storeFp)
    // authoritative bucket count for every bucketed write below: the
    // store's durable `num_buckets` metadata (stamped now, under the
    // writer lease, if absent) — never the raw config knob on an
    // existing store (Pipeline.resolveNumBuckets). If the backend's
    // metadata is a no-op (stamp doesn't read back), pin the engine
    // default: a knob that silently varied per batch would mix bucket
    // counts in one store with wrong query pruning.
    val nb = {
      val resolved = Pipeline.resolveNumBuckets(spark, io, config)
      if (io.getMeta(spark, "num_buckets").isDefined) resolved
      else {
        io.putMeta(spark, "num_buckets", resolved.toString)
        if (io.getMeta(spark, "num_buckets").isDefined) resolved
        else Pipeline.NumBuckets
      }
    }
    // the merges below consume chunks through three branches (chunks,
    // embeddings, terms) and triples through four more (edges, entity
    // index, canonical edges, vertices) — pin both for the duration of
    // the materialization so the chunk→extract chain executes once, not
    // once per sink. run() itself stays fully lazy in exact mode (the
    // plan-once benchmarks must measure the real chain); lsh mode already
    // pinned triples for its eager linking probe.
    import org.apache.spark.storage.StorageLevel
    def pin(df: Dataset[_]): Boolean =
      if (df.storageLevel == StorageLevel.NONE) {
        df.persist(StorageLevel.MEMORY_AND_DISK); true
      } else false
    val pinnedChunks = pin(r.chunks)
    val pinnedTriples = pin(r.triples)
    // aliases are consumed twice on incremental batches (the table MERGE
    // + the delta compaction's CC seed) — without the pin the second
    // consumption re-executes the LSH linking join
    val pinnedAliases = pin(r.aliases)
    // embeddings are deliberately NOT pinned (guide §5): they feed four
    // consumers (table append, computeThresholds, the vec-index layout,
    // the staleness probe), but at dim=768 the cache is ~1 GB at the
    // 250k-doc build and measured as pure memory-pressure loss — stacked
    // on merge()'s own pin of the 4×-row vec-index delta it tipped the
    // 8 GB local JVM into eviction churn (vec-index write 18.7 s →
    // 435 s). Instead, the FRESH-store index build below reads the
    // just-written chunk_embeddings table (rebuildIndexWholesale), so
    // the in-flight embed pipeline runs once per batch for the table
    // append; only steady-state incremental batches re-embed per layout
    // leg, over batch-sized frames off the pinned chunks cache.
    // edges ARE pinned: narrow rows (strings, no vectors — O(10 MB) at
    // this scale), consumed by the edges MERGE, pred_index, the entity
    // index, and (lsh batches) delta compaction's discovery — each
    // re-ran the (subj,pred,obj) dedup shuffle over the triples cache
    // unpinned
    val pinnedEdges = pin(r.edges)
    // physical layout (SURVEY.md §4.4): edges bucketed by SUBJECT hash,
    // vertices by name hash — partition-parallel MERGE and pruning;
    // production = Iceberg bucket(N, col) transforms. The subject is the
    // one diverse axis an edge has: predicates come from a closed
    // relation lexicon (~10 distinct values), so a pred-hash layout
    // (rounds 4-6) concentrated the whole table into ~|lexicon| dirs and
    // EVERY batch touched every one of them — the round-7 BatchReadProbe
    // measured the bucket-selective merge rewriting the full edges table
    // (3.25 of 3.27 MB) and delta compaction rebuilding the full
    // canonical pair (12.3 of 12.3 MB) on a 40-doc batch. Subject-hash
    // buckets spread with the entity universe, so touched buckets scale
    // with the batch.
    val edgesPart = r.edges.toDF()
      .withColumn("sbucket", pmod(hash(col("subj")), lit(nb)))
    val verticesPart = r.vertices.toDF()
      .withColumn("nbucket", pmod(hash(col("name")), lit(nb)))
    // chunks / embeddings / terms / the steady-state vec index hold rows
    // that are PURE FUNCTIONS of their keys under a fixed pipeline config
    // (chunkId determines its text; text determines embeddings, terms
    // and — under the frozen thresholds — vec-index buckets), so they
    // take the APPEND-ONLY write path: per-batch write I/O is O(batch),
    // not O(store) (the round-4 store-bound-ingest finding; the same
    // measured lesson as the band index — a full-table rewrite per batch
    // swamps the compute win). First-wins collision semantics == the
    // reference's Neo4j `MERGE ... ON CREATE SET`. A config change that
    // redefines the key→row function (chunk size, stopwords) requires a
    // reset, exactly as it does for the reference. appendNew falls back
    // to the schema-evolving full MERGE on stores whose layout or column
    // set predates the current engine.
    io.appendNew(spark, "chunks", r.chunks.toDF(), Seq("chunkId"))
    io.appendNew(spark, "chunk_embeddings", r.chunkEmbeddings.toDF(), Seq("chunkId"))
    // ANN scale path for O1 vector search: LSH sign-sketch layout of the
    // chunk embeddings under l=<table>/vbucket=<bucket> partition dirs
    // (Retrieval.vectorSearchAnn prunes to the query's probe buckets
    // instead of scanning every vector; see retrieve/VectorIndex.scala).
    // Per-plane MEDIAN thresholds balance bucket occupancy (hot-bucket
    // row amplification otherwise defeats the pruning — VectorIndex doc);
    // computed on the FIRST index build, persisted in the chunk_vec_meta
    // sidecar, and FROZEN for later incremental merges — re-thresholding
    // would invalidate the partitions already laid down (an index REBUILD
    // recomputes them).
    import graft.kg.retrieve.VectorIndex
    def writeVecMeta(t: Array[Double]): Unit =
      io.overwrite(spark, "chunk_vec_meta",
        spark.createDataFrame(t.zipWithIndex.map { case (th, i) => (i, th) }.toSeq)
          .toDF("pid", "threshold"))
    val storedVecMeta: Option[Array[Double]] =
      VectorIndex.readThresholds(spark, io)
    // GEOMETRY UPGRADE / legacy migration: rebuild the index wholesale
    // from the cumulative embeddings table (already merged above), under
    // fresh medians. Order matters for crash safety: the INDEX swaps
    // first, the sidecar last — a crash in between leaves {new index, no
    // or stale sidecar}, which the detectors below treat as another
    // upgrade (idempotent rebuild); sidecar-first would leave a
    // matching-length sidecar over an old-geometry index, silently
    // defeating the detector.
    def rebuildIndexWholesale(): Unit = {
      val t = VectorIndex.computeThresholds(
        io.read(spark, "chunk_embeddings"), embedder.dim)
      io.overwrite(spark, "chunk_vec_index",
        VectorIndex.layout(io.read(spark, "chunk_embeddings"),
          embedder.dim, t),
        Seq("l", "vbucket"))
      writeVecMeta(t)
    }
    storedVecMeta match {
      case Some(t) if t.length == VectorIndex.NumPlanes =>
        // staleness probe before committing to the frozen geometry: a
        // statistically meaningful batch whose projections land
        // lopsidedly against the frozen median cuts signals a shifted
        // embedding distribution — occupancy would re-skew and silently
        // erode the row-pruning win, so the index rebuilds wholesale
        // under fresh cumulative medians instead (policy constants and
        // rationale: VectorIndex.StaleSkewBound)
        val skew = VectorIndex.occupancySkew(
          r.chunkEmbeddings.toDF(), embedder.dim, t)
        if (skew.exists(_ > VectorIndex.StaleSkewBound)) rebuildIndexWholesale()
        else
          // steady state: APPEND the batch under the frozen thresholds
          // (bucket is a pure function of the key while they are frozen —
          // the largest table of the store never rewrites on ingest)
          io.appendNew(spark, "chunk_vec_index",
            VectorIndex.layout(r.chunkEmbeddings.toDF(), embedder.dim, t),
            Seq("chunkId", "l"), Seq("l", "vbucket"))
      case Some(_) =>
        // the stored sidecar was written under a different (L·K) layout —
        // merging new rows bucketed under the current geometry into the
        // old directories would corrupt the index
        rebuildIndexWholesale()
      case None if io.exists(spark, "chunk_vec_index") =>
        // a PRE-EXISTING index with NO sidecar: laid down by a legacy
        // engine whose geometry is UNKNOWABLE from the dirs alone (the
        // raw-sign era used a different K and plane numbering) — pinning
        // zero thresholds here would mix two incompatible layouts in one
        // table and silently lose recall on every pre-upgrade row,
        // permanently. Treat it exactly like the sidecar-mismatch case.
        // (GraphRag queries fall back to the exact scan until this
        // migration runs — an index without a sidecar is never probed.)
        rebuildIndexWholesale()
      case None =>
        // genuinely fresh store: the cumulative embeddings table was
        // merged just above and equals the batch, so the wholesale
        // rebuild (thresholds + layout FROM THE STORED TABLE) produces
        // the identical index — and reads cheap parquet scans instead of
        // re-running the in-flight embed pipeline once for the medians
        // and once per layout table (r8, guide §1/§2.3: 5 recomputed
        // embed passes of the 250k-doc batch eliminated; IngestProbe
        // attribution in OPTIMIZATION_r08.md)
        rebuildIndexWholesale()
    }
    // terms dedup on the MERGE key but KEEP the in-flight multiplicity as
    // a tf column — termSearch's documented score is TF summed per chunk,
    // which a bare dropDuplicates would silently turn into presence-count.
    // Partitioned by text-hash bucket (the inverted-index analogue of the
    // entity index below): term search filters on a literal term list, so
    // the scan partition-prunes to ≤ |query terms| of the NumBuckets dirs
    // instead of reading the full terms table — at 100× the terms table is
    // the largest table in the store and an unpruned per-query scan of it
    // would dominate query latency.
    // tf computed chunk-locally inside the flatMap (Terms.termsWithTf):
    // the former groupBy over every occurrence row shuffled the largest
    // in-flight frame of the batch to compute an aggregate whose key
    // starts with chunkId — final after map-side partial aggregation by
    // construction (measured 17.3 s of the 83 s 250k-doc build, r8)
    io.appendNew(spark, "terms",
      Terms.termsWithTf(r.chunks, config.removeStopwords)
        .withColumn("tbucket", pmod(hash(col("text")), lit(nb))),
      Seq("chunkId", "text", "termType"), Seq("tbucket"))
    val edgesPreexisted = io.exists(spark, "edges")
    // one-time layout migration: a store written under the pred-hash
    // era carries pbucket dirs — re-lay it under sbucket once (merge's
    // schema-evolution fallback would null-fill the new partition column
    // instead, stranding old rows in a default partition)
    if (edgesPreexisted &&
        !io.read(spark, "edges").columns.contains("sbucket"))
      io.overwrite(spark, "edges",
        io.read(spark, "edges")
          .select("subj", "pred", "obj", "label", "sourceChunkId")
          .withColumn("sbucket", pmod(hash(col("subj")), lit(nb))),
        Seq("sbucket"))
    io.merge(spark, "edges", edgesPart, Seq("subj", "pred", "obj"), Seq("sbucket"))
    // pred → subject-bucket registry: one row per DISTINCT (pred,
    // sbucket) pair ever stored — O(|pred lexicon| × touched buckets)
    // rows, pure functions of the edge set, append-only. Delta
    // compaction's discovery pass locates edges whose PREDICATE is a
    // changed name through this registry (the subject-hash layout and
    // the subj/obj entity index cannot prune a by-pred probe); without
    // it a changed name that occurs as a predicate would force a full
    // edge scan. pibucket partitions the registry by pred hash so the
    // probe prunes to the changed names' buckets.
    if ((edgesPreexisted && !io.exists(spark, "pred_index")) ||
        priorIncomplete)
      io.overwrite(spark, "pred_index",
        io.read(spark, "edges").select(col("pred"), col("sbucket"))
          .distinct()
          .withColumn("pibucket", pmod(hash(col("pred")), lit(nb))),
        Seq("pibucket"))
    else
      io.appendNew(spark, "pred_index",
        edgesPart.select(col("pred"), col("sbucket")).distinct()
          .withColumn("pibucket", pmod(hash(col("pred")), lit(nb))),
        Seq("pred", "sbucket"), Seq("pibucket"))
    // entity-bucketed SECONDARY edge layout: one row per (entity ∈ {subj,
    // obj}, edge), partitioned by entity hash bucket, so the per-entity
    // relationship lookup (retrieval.py:265-314 is an indexed lookup, not
    // a scan) partition-prunes instead of scanning every edge — the
    // subject-hash primary layout prunes only subject-side lookups; an
    // object-side probe needs this index.
    // Edges are immutable keyed rows, so exploding only the DELTA keeps
    // the index complete under MERGE accumulation — valid only while
    // every prior batch did the same. Two cases where the stored index
    // cannot be trusted to cover the merged edge set, healed by one
    // wholesale rebuild from the just-merged table (the band-index
    // re-sign pattern above): a legacy store whose edges predate the
    // index, and a predecessor that died between its edges merge and its
    // index merge (batch_inflight still set — the retry contract re-runs
    // the batch, but an operator that skips it instead must not leave
    // invisible edges). The index's completeness is CANONICAL-state-
    // bearing, not just query-bearing: delta compaction's affected-edge
    // pass reads it instead of scanning every base edge.
    if ((edgesPreexisted && !io.exists(spark, "edge_entity_index")) ||
        priorIncomplete)
      io.overwrite(spark, "edge_entity_index",
        Pipeline.entityIndexRows(io.read(spark, "edges"), nb),
        Seq("ebucket"))
    else
      io.merge(spark, "edge_entity_index",
        Pipeline.entityIndexRows(r.edges.toDF(), nb),
        Seq("entity", "subj", "pred", "obj"), Seq("ebucket"))
    // canonical rows are NEVER merged from the batch-local map on
    // incremental batches: the batch's linking runs over its own alias
    // universe, and universe growth can EVICT pairs (top-K per probe,
    // band-bucket cap) that the cumulative aliases table still holds — so
    // the batch-local canonical image can disagree with the cumulative
    // map at names whose stored mapping did not change, which a
    // map-DIFF-driven delta compaction would never revisit. Instead the
    // compaction (full or delta) derives ALL canonical state from the
    // cumulative base edges + cumulative alias map; the invariant after
    // every batch is canonical_edges == canonicalEdges(edges,
    // canonical_map), which the delta path maintains bucket-wise.
    // the fresh fast path (batch-local == cumulative by definition) is
    // only valid when no crashed batch left partial state behind — a
    // prior incomplete batch may have merged base rows whose canonical
    // image the batch-local map knows nothing about
    val freshFastPath = existing.isEmpty && !priorIncomplete
    // EXACT-mode stores never materialize the canonical tables: exact
    // linking produces no alias pairs, so the canonical map is the
    // identity and canonical_edges / canonical_edge_entity_index would
    // be byte-duplicates of the base tables — paying the store's largest
    // index twice in write I/O and storage on every batch for zero query
    // value (the facade's fallback chain serves base tables,
    // GraphRag.query). A later lsh batch over such a store finds no
    // canonical_map and backfills everything with one full compaction.
    // Gated on the static link mode, not map emptiness — an lsh batch
    // that happens to link nothing still maintains its canonical tables.
    val identityMode = config.linkMode == "exact"
    if (freshFastPath && !identityMode) {
      val canonEdgesPart = r.canonicalEdges.toDF()
        .withColumn("sbucket", pmod(hash(col("subj")), lit(nb)))
      io.merge(spark, "canonical_edges", canonEdgesPart,
        Seq("subj", "pred", "obj"), Seq("sbucket"))
      // the QUERY-side layout of the canonical graph: the facade's
      // triplet lookup canonicalizes its entities and partition-prunes
      // this index — without it the linking/CC/compaction output would
      // be invisible to `graphrag query` (the reference's alias
      // cross-product makes merged relationships reachable from ANY
      // alias surface form, triplets.py:371-398 / retrieval.py:265-314)
      io.merge(spark, "canonical_edge_entity_index",
        Pipeline.canonicalIndexRows(r.canonicalEdges.toDF(), nb),
        Seq("entity", "subj", "pred", "obj"), Seq("ebucket"))
    }
    io.merge(spark, "vertices", verticesPart, Seq("name"), Seq("nbucket"))
    io.merge(spark, "aliases", r.aliases.toDF(), Seq("a", "b"))
    // band-index maintenance: signatures are pure functions of the name,
    // so the table is APPEND-ONLY — new names' rows are physically
    // appended (O(batch) write, no table rewrite; GraphTableIO.appendNew).
    // A legacy store (pre-index) gets a one-time backfill of the prior
    // vertex names, after which every later batch probes instead of
    // re-signing the universe. An EXACT batch over a store that HAS the
    // index must maintain it too: its names enter the cumulative mention
    // universe, and a later lsh batch links against the index alone — an
    // unsigned name would be invisible to incremental linking FOREVER
    // (the aliases it should have formed are never derived, so not even
    // a full compaction could recover them).
    if (config.linkMode == "lsh" || bandIndexStored) {
      val batchSigs = graft.kg.stages.Link
        .bandSignatures(r.mentionVecs.select(col("name")))
      // re-sign the FULL vertex-name universe (not just the batch) when
      // the stored index cannot be trusted to cover it: absent (legacy
      // store), pre-v2 (about to be replaced wholesale — its rows carry
      // the wrong minhashes for every name), or a crashed predecessor (a
      // batch that died between its vertices merge and its index append
      // leaves names the incremental probe would otherwise never see
      // again; appendNew makes the reconcile idempotent, O(missing))
      val sigs =
        if ((!bandIndexStored || bandIndexPreV2 || priorIncomplete) &&
            verticesPreexisted)
          batchSigs.unionByName(graft.kg.stages.Link
            .bandSignatures(io.read(spark, "vertices").select(col("name"))))
        else batchSigs
      // a pre-v2 index must be REPLACED, not appended into: its rows
      // share (name, band) keys with the v2 signatures but carry
      // old-convention minhashes, and appendNew's first-wins semantics
      // would keep exactly the wrong rows (one-time migration rewrite)
      if (bandIndexPreV2)
        io.overwrite(spark, "lsh_band_index",
          sigs.dropDuplicates("name", "band"))
      else io.appendNew(spark, "lsh_band_index", sigs, Seq("name", "band"))
      io.setFlag(spark, "band_index_v2") // convention stamp (idempotent)
    }
    if (identityMode && !io.exists(spark, "canonical_edges")) {
      // exact-mode store with no canonical tables (see identityMode
      // above): the canonical image IS the base image — nothing to
      // create, maintain, or heal.
    } else if (identityMode) {
      // exact batch over a store that HAS canonical tables (an lsh
      // past, or an older engine's identity duplicates): fold the
      // batch's base edges into the canonical state under the STORED
      // cumulative map — never the fresh path, which would overwrite
      // canonical_map with this batch's (empty) map and orphan the
      // batch's edges from the canonical image
      if (config.fullCompaction || priorIncomplete ||
          !io.exists(spark, "canonical_map")) compact(spark, io, nb)
      else compactDelta(spark, io, r.edges, r.aliases, nb)
    } else if (freshFastPath) {
      // the canonical-map table (CC output: LINKED names only, name →
      // canonicalName) seeds the next batch's delta compaction and
      // canonicalizes query entities (cbucket-pruned probe)
      io.overwrite(spark, "canonical_map",
        Pipeline.canonicalMapLayout(
          r.canonical.toDF().filter(col("name") =!= col("canonicalName")), nb),
        Seq("cbucket"))
    } else if (config.fullCompaction || priorIncomplete) compact(spark, io, nb)
    else compactDelta(spark, io, r.edges, r.aliases, nb)
    // aliases lifecycle: the table's only consumer is connected
    // components (full-compaction fallback; the delta path seeds from
    // canonical_map instead), for which any SPANNING structure of the
    // same components is equivalent — so compact the append-only pair
    // log down to the canonical star edges, bounding its size at
    // O(linked names) instead of O(every pair ever derived)
    if (config.pruneAliases && io.exists(spark, "canonical_map") &&
        io.exists(spark, "aliases"))
      io.overwrite(spark, "aliases", io.read(spark, "canonical_map")
        .select(col("canonicalName").as("a"), col("name").as("b"),
          lit(1.0).as("score")))
    io.clearFlag(spark, "batch_inflight")
    if (pinnedChunks) r.chunks.unpersist(blocking = false)
    if (pinnedTriples) r.triples.unpersist(blocking = false)
    if (pinnedAliases) r.aliases.unpersist(blocking = false)
    if (pinnedEdges) r.edges.unpersist(blocking = false)
    r.cleanup()
    val tableCounts = Seq("chunks", "chunk_embeddings", "chunk_vec_index",
      "terms", "edges", "edge_entity_index", "pred_index", "canonical_edges",
      "canonical_edge_entity_index", "vertices", "aliases", "lsh_band_index")
      .filter(io.exists(spark, _)) // lsh_band_index is lsh-mode-only
      // metadata-only counts (parquet footer sums — the Iceberg manifest
      // record_count analogue): no per-table count() job per batch.
      // Measured 2.5× cheaper across the store by graft.tools.StatsProbe
      .map {
        // the vector index is 1,024 leaf dirs bounded at ~SliverThreshold
        // files each, so even the footer pass pays ~8k metadata reads
        // (~19 s measured — the largest per-batch stats term). Its
        // cardinality is an exact invariant instead: VectorIndex.layout
        // emits one row per (table, embedded chunk) under any installed
        // geometry, and both write paths key on (chunkId, l) — so
        // |index| == NumTables × |chunk_embeddings|, the stat an Iceberg
        // manifest would hand over for free.
        case t @ "chunk_vec_index" =>
          t -> graft.kg.retrieve.VectorIndex.NumTables *
            io.rowCount(spark, "chunk_embeddings")
        case t => t -> io.rowCount(spark, t)
      }.toMap
    // fold in the observed in-flight stage counters (Metrics piggyback on
    // the actions above — no extra job)
    tableCounts ++ Metrics.snapshot.map { case (k, v) => s"observed_$k" -> v }
  }

  /** Retroactive canonicalization across incremental batches (the pinned
    * semantics): when batch N's linking merges an entity with a prior
    * batch's, previously materialized rows still carry the old canonical
    * name — the reference shares this eventual-inconsistency (its MERGE
    * upserts never rewrite history). Here `canonical_edges` is DERIVED
    * state: after every incremental batch it is rebuilt from the
    * cumulative base edge set under the canonical map of the CUMULATIVE
    * alias set (so components spanning batches — even transitively, batch
    * 3 linking A–B after batch 1 linked B–C — resolve to one canonical
    * name), and `vertices.canonicalName` is refreshed under the same map.
    * At 10^12-file scale this is the periodic compaction job; a read-time
    * remap view is the cheaper alternative when batches are frequent. */
  // nb REQUIRED: a call site defaulting to the engine constant on a
  // store persisted at another count would rewrite the canonical tables
  // under the wrong layout with no compile-time or runtime signal
  private def compact(spark: SparkSession, io: GraphTableIO,
      nb: Int): Unit = {
    import spark.implicits._
    val allAliases = io.read(spark, "aliases").as[AliasPair]
    val baseEdges = io.read(spark, "edges")
      .select("subj", "pred", "obj", "label", "sourceChunkId").as[RelatesToEdge]
    val names = baseEdges.toDF()
      .select(explode(array(col("subj"), col("pred"), col("obj"))).as("name"))
    val canonAll = Canonicalize.canonicalMap(names, allAliases,
      broadcastCC = !config.saltedCanonicalJoin)
    val compacted = Materialize
      .canonicalEdges(baseEdges, canonAll, salted = config.saltedCanonicalJoin)
      .toDF().withColumn("sbucket", pmod(hash(col("subj")), lit(nb)))
    io.overwrite(spark, "canonical_edges", compacted, Seq("sbucket"))
    // the entity-bucketed query layout of the canonical graph is derived
    // state of canonical_edges — rebuilt wholesale with it (reading the
    // just-swapped table back, so the CC solve above is not re-executed)
    io.overwrite(spark, "canonical_edge_entity_index",
      Pipeline.canonicalIndexRows(io.read(spark, "canonical_edges")
        .select("subj", "pred", "obj", "label", "sourceChunkId"), nb),
      Seq("ebucket"))
    // vertices keep their mention-level identity (name is the MERGE key);
    // only the canonicalName pointer is remapped — same broadcast/plain
    // join regime as the vertex build
    val canonSide =
      if (config.saltedCanonicalJoin) canonAll.toDF()
      else broadcast(canonAll.toDF())
    val refreshed = io.read(spark, "vertices")
      .drop("canonicalName")
      .join(canonSide, Seq("name"), "left")
      .select(col("name"),
        coalesce(col("canonicalName"), col("name")).as("canonicalName"),
        col("vec"), col("tripletPart"), col("nbucket"))
    io.overwrite(spark, "vertices", refreshed, Seq("nbucket"))
    io.overwrite(spark, "canonical_map",
      Pipeline.canonicalMapLayout(
        canonAll.toDF().filter(col("name") =!= col("canonicalName")), nb),
      Seq("cbucket"))
  }

  /** Partition-selective compaction — the 10^12-scale form of [[compact]].
    *
    * A full rebuild remaps and REWRITES every canonical edge and vertex
    * after every incremental batch, even though a batch's linking usually
    * merges only a handful of components with prior state. Delta
    * compaction computes the new canonical map INCREMENTALLY — a seeded
    * CC over {prior-map star edges of the touched components ∪ the
    * batch's alias pairs} ([[graft.kg.stages.Canonicalize.incrementalComponents]]),
    * so the per-batch linking compute scales with the batch and the
    * components it touches, never with cumulative alias history — and
    * then touches only what the resulting map diff reaches:
    *
    *  1. Affected names = names whose canonical mapping differs under the
    *     map diff (the merged components) ∪ every name of the BATCH's own
    *     base edges. The batch's names are included because its canonical
    *     rows are not merged from the batch-local map at all — the
    *     batch's linking ran over its own alias universe, and universe
    *     growth can evict pairs (top-K per probe, band-bucket cap) that
    *     the cumulative alias graph still holds, so the batch-local image
    *     may disagree with the cumulative map at names the diff never
    *     flags. All canonical state is derived HERE, from cumulative
    *     base edges + cumulative map.
    *  2. Affected canonical-edge PARTITIONS = sbuckets (canonical-SUBJECT
    *     hash — the diverse axis; the pred lexicon is closed and would
    *     degenerate to every-bucket-every-batch) of the old and new
    *     canonical subject images of (a) the batch's edges (subjects in
    *     hand — no scan), (b) prior edges touching a CHANGED name in
    *     subj/obj position (entity-bucket-pruned edge_entity_index), and
    *     (c) prior edges whose predicate is a changed name (pred_index
    *     registry → their subject buckets). Those buckets are rebuilt
    *     exactly (from every base edge whose new canonical subj lands
    *     there — affected or not, so surviving rows are regenerated,
    *     stale images vanish, and cross-bucket moves land) and swapped in
    *     via [[GraphTableIO.overwritePartitions]]; every other partition
    *     is untouched on storage — sound because an untouched bucket's
    *     content is the canonical image of edges none of whose names
    *     changed mapping, hence identical under both maps.
    *  3. Affected vertex partitions = nbuckets of the affected names;
    *     only those rewrite, with EVERY row's canonicalName pointer
    *     regenerated from the new map (the batch's vertex merge wrote
    *     batch-local pointers, corrected here wholesale).
    *
    * Invariant after every batch: canonical_edges ==
    * Materialize.canonicalEdges(edges, canonical_map) and
    * vertices.canonicalName == canonical_map image — the same state the
    * full rebuild produces, maintained bucket-wise by induction.
    *
    * Cost: broadcast-join map-only passes, each PARTITION-PRUNED to the
    * buckets the batch's names / the map diff reach (discovery reads the
    * changed names' entity buckets of `edge_entity_index`, their
    * pred_index buckets, and the pred-hit subject buckets of `edges`;
    * the rebuild reads the affected buckets plus the raw-subject buckets
    * mapping into them) + a shuffle/write of ONLY the affected partition
    * subset — vs the full rebuild's global shuffle + full-table rewrite;
    * both read and write volume are bounded by the batch size plus the
    * merged components' reach, never the store. Equivalence with
    * [[compact]] is asserted table-for-table in CompactionSuite
    * (broadcast and salted configs). */
  private def compactDelta(spark: SparkSession, io: GraphTableIO,
      batchEdges: Dataset[RelatesToEdge],
      batchAliases: Dataset[AliasPair],
      nb: Int): Unit = {
    import spark.implicits._
    // no stored canonical map (a store written before the table existed):
    // the delta path cannot locate prior batches' STALE rows — their
    // partitions are derived from the OLD canonical image of each
    // affected subject, and without the old map that image is
    // unknowable (approximating it with the raw name misses rows whose
    // old canonical was a different name hashing to a different bucket).
    // Recover with one full rebuild, which also seeds canonical_map.
    // Same one-full-rebuild recovery for a canonical table laid down by
    // the pred-hash era (pre-sbucket): its partitions are not addressable
    // under the subject-hash discovery below; compact() re-lays it.
    if (!io.exists(spark, "canonical_map") ||
        (io.exists(spark, "canonical_edges") &&
          !io.read(spark, "canonical_edges").columns.contains("sbucket"))) {
      compact(spark, io, nb); return
    }
    // join-strategy governance: ALL the map-side (and batch-derived-set)
    // joins below broadcast by default; under saltedCanonicalJoin — the
    // regime where the linked-name set outgrows executor memory — every
    // one of them falls back to a planner-chosen shuffle join, the same
    // trade canonicalEdges / canonicalMap / vertices already make. The
    // delta-compaction path is exactly where the map is biggest, so a
    // forced broadcast here would OOM first.
    def hinted(df: DataFrame): DataFrame =
      if (config.saltedCanonicalJoin) df else broadcast(df)
    // SATURATION PRE-GATE (r8): the batch's OWN edge names are a lower
    // bound on the affected-name set, and they are in hand before any
    // incremental-CC or discovery work — if they alone reach more than
    // deltaSaturationFraction of the bucket space, the delta machinery
    // below (seeded CC solve, map diff, per-leg discovery) cannot beat
    // the full rebuild, so route there before paying any of it (the r8
    // gated series still showed ~4 s/batch of pre-gate CC machinery at
    // the 160-doc/nb=256 saturation point with only the post-CC gate).
    // One count job over the pinned batch edges; both paths produce
    // identical state (CompactionSuite gate-crossing test).
    val batchNameBuckets = batchEdges.toDF()
      .select(explode(array($"subj", $"pred", $"obj")).as("name"))
      .select(pmod(hash($"name"), lit(nb)).as("b")).distinct().count()
    if (batchNameBuckets > config.deltaSaturationFraction * nb) {
      compact(spark, io, nb); return
    }
    val oldCC = io.read(spark, "canonical_map").select($"name", $"canonicalName")
    // SEEDED incremental CC: solve over {touched-component star edges ∪
    // batch alias pairs} — O(batch + touched members), not O(alias
    // history); untouched components are copied verbatim. The result is
    // provably identical to CC over the cumulative alias table (see
    // Canonicalize.incrementalComponents), which CompactionSuite asserts
    // table-for-table against the full rebuild. localCheckpoint pins the
    // new map (consumed several times below, and canonical_map is
    // overwritten under its own scan otherwise).
    val inc = Canonicalize.incrementalComponents(oldCC, batchAliases, hinted)
    val newCC = inc.newMap.localCheckpoint()
    // affected = map-diff names ∪ the batch's own edge names (whose
    // canonical rows are created by this rebuild — see the Scaladoc)
    val affectedNames = inc.changed
      .unionByName(batchEdges.toDF()
        .select(explode(array($"subj", $"pred", $"obj")).as("name")))
      .distinct()
      .localCheckpoint()
    // SATURATION GATE (r8, VERDICT r7 wrong-#1): when the batch's
    // affected names already reach most of the bucket space, every
    // "selective" pass below degenerates to ~the whole table and the
    // delta machinery's discovery (entity-index probes, pred_index leg)
    // and exact-diff anti-joins are paid ON TOP of a full-size rebuild —
    // the 160-doc/nb=256 series measured the delta path reading 57 MB vs
    // the full rebuild's 41 MB per batch for identical write volume.
    // The affected-name bucket count is computable from the pinned
    // O(batch) frame BEFORE any store read, so gating here routes a
    // saturated batch to the existing full-rebuild branch at ~zero extra
    // cost. Both paths produce identical state (CompactionSuite
    // equivalences, incl. the gate-crossing test), so the gate is purely
    // a plan choice.
    val affectedBucketCount = affectedNames
      .select(pmod(hash($"name"), lit(nb)).as("b")).distinct().count()
    if (affectedBucketCount > config.deltaSaturationFraction * nb) {
      compact(spark, io, nb); return
    }
    if (!affectedNames.isEmpty) {
      // ---- affected-bucket discovery (canonical_edges is bucketed by
      // CANONICAL-SUBJECT hash). A stored canonical row's location is
      // hash(canonical image of its base edge's raw subj); its content is
      // the full canonical image of the edge. The buckets needing a
      // rebuild are the old+new subj-image buckets of every base edge
      // whose canonical image can differ between the two maps or that
      // the batch created:
      //  a. the BATCH's edges — their canonical rows are produced by
      //     this rebuild (the merge wrote only base rows), and a
      //     re-merged pre-existing key may have a stale row at its OLD
      //     subj-image bucket. Their subjects are in hand — no store
      //     scan.
      //  b. prior edges touching a CHANGED name in subj or obj position
      //     — found in edge_entity_index pruned to the changed names'
      //     entity buckets (the index is complete w.r.t. the merged
      //     edges by the heal at the merge site).
      //  c. prior edges whose PREDICATE is a changed name — the one
      //     position neither the subject layout nor the entity index
      //     covers; located through the tiny pred_index registry
      //     (pred → sbuckets holding it), pruned by the changed names'
      //     pred-hash buckets.
      // Every leg reads only buckets the batch's names / the map diff
      // reach, so the per-batch read scales with the batch, not the
      // store — under the pred-hash layout these passes were full-table
      // scans AND selected every occupied bucket at the reference
      // corpus's ~10-pred lexicon (round-7 BatchReadProbe: full
      // canonical-pair rewrite every batch).
      val changedNames = inc.changed.localCheckpoint()
      val changedMark = hinted(changedNames)
      val changedBuckets = changedNames
        .select(pmod(hash($"name"), lit(nb)).as("b"))
        .distinct().as[Int].collect().toSeq
      val batchSubjs = batchEdges.toDF().select($"subj")
      val entityLegSubjs =
        if (changedBuckets.isEmpty) batchSubjs.limit(0)
        else io.read(spark, "edge_entity_index")
          .filter($"ebucket".isin(changedBuckets: _*))
          .join(changedMark.select($"name".as("entity")),
            Seq("entity"), "left_semi")
          .select($"subj")
      val predLegSubjs =
        if (changedBuckets.isEmpty) batchSubjs.limit(0)
        else {
          val predSbuckets = io.read(spark, "pred_index")
            .filter($"pibucket".isin(changedBuckets: _*))
            .join(changedMark.select($"name".as("pred")),
              Seq("pred"), "left_semi")
            .select($"sbucket").distinct().as[Int].collect().toSeq
          if (predSbuckets.isEmpty) batchSubjs.limit(0)
          else io.read(spark, "edges")
            .filter($"sbucket".isin(predSbuckets: _*))
            .join(changedMark.select($"name".as("pred")),
              Seq("pred"), "left_semi")
            .select($"subj")
        }
      val discSubjs = batchSubjs.unionByName(entityLegSubjs)
        .unionByName(predLegSubjs).distinct()
      // affected target partitions: old AND new canonical images of the
      // discovered subjects decide where stale rows live / new rows land
      val oldMapS = hinted(oldCC.select($"name".as("subj"), $"canonicalName".as("oc")))
      val newMapS = hinted(newCC.select($"name".as("subj"), $"canonicalName".as("nc")))
      val buckets = discSubjs
        .join(oldMapS, Seq("subj"), "left").join(newMapS, Seq("subj"), "left")
        .select(explode(array(
          pmod(hash(coalesce($"oc", $"subj")), lit(nb)),
          pmod(hash(coalesce($"nc", $"subj")), lit(nb)))).as("b"))
        .distinct().as[Int].collect().toSeq // ≤ NumBuckets values
      // rebuild source, PARTITION-PRUNED: every base edge whose NEW
      // canonical subj lands in an affected bucket. Such an edge's RAW
      // subj either has no map row (canonical == raw, so its primary
      // partition is itself an affected bucket) or maps through newCC —
      // and the raw-subj buckets of the map rows whose canonical image
      // hashes into `buckets` are another ≤ NumBuckets-value aggregate
      // over the pinned map. The canonical-bucket filter below keeps
      // exactness; the pruning can only remove rows that filter would
      // drop anyway.
      val mappedRaw = newCC
        .filter(pmod(hash($"canonicalName"), lit(nb)).isin(buckets: _*))
        .select(pmod(hash($"name"), lit(nb)).as("b"))
        .distinct().as[Int].collect().toSeq
      val readBuckets = (buckets ++ mappedRaw).distinct
      val rebuildSource = io.read(spark, "edges")
        .filter($"sbucket".isin(readBuckets: _*))
        .select("subj", "pred", "obj", "label", "sourceChunkId")
        .join(newMapS, Seq("subj"), "left")
        .filter(pmod(hash(coalesce($"nc", $"subj")), lit(nb))
          .isin(buckets: _*))
        .drop("nc").as[RelatesToEdge]
      // identity-complete the map for exactly the rebuild subset's names
      // (canonicalEdges' salted path requires identity rows present)
      val names = rebuildSource.toDF()
        .select(explode(array($"subj", $"pred", $"obj")).as("name")).distinct()
      val canonForRebuild = names
        .join(newCC.select($"name", $"canonicalName"), Seq("name"), "left")
        .select($"name", coalesce($"canonicalName", $"name").as("canonicalName"))
        .as[CanonicalMapping]
      // the rebuilt buckets' OLD content, pinned BEFORE the swap deletes
      // those dirs — the index maintenance below diffs against it. A
      // partition-pruned read: O(rebuilt buckets' content), which under
      // the subject-hash layout is O(batch reach), never the store.
      val oldContent = io.read(spark, "canonical_edges")
        .filter($"sbucket".isin(buckets: _*))
        .select("subj", "pred", "obj", "label", "sourceChunkId")
        .localCheckpoint()
      val newContent = Materialize
        .canonicalEdges(rebuildSource, canonForRebuild,
          salted = config.saltedCanonicalJoin)
        .toDF().withColumn("sbucket", pmod(hash($"subj"), lit(nb)))
        .localCheckpoint() // pinned: consumed by the write AND the index
      io.overwritePartitions(spark, "canonical_edges", newContent,
        "sbucket", buckets)
      // canonical_edge_entity_index maintenance, EXACT-DIFF: most of a
      // rebuilt sbucket's rows are regenerated IDENTICALLY (only edges
      // touching an affected name change image), so rewriting every
      // ebucket the rebuilt content reaches — the round-4..7 diff-free
      // design — amplified the index write to ~the full table whenever
      // the rebuilt rows' entities saturated the bucket space (round-7
      // BatchReadProbe: 9.3 of 9.3 MB for a 10-doc batch at 256
      // buckets). Diffing old vs new index images of the rebuilt buckets
      // costs two anti-joins over O(batch reach) rows — cheap under the
      // subject-hash layout where the rebuilt content is small (the
      // round-4 measurement that ruled diffing out was over the pred
      // layout's full-table rebuilds) — and shrinks the rewrite to the
      // ebuckets of rows that ACTUALLY changed: O(batch reach) dirs.
      // Production analogue: Iceberg equality deletes (merge-on-read).
      // Invariant: index == canonicalIndexRows(canonical_edges),
      // asserted in CanonicalQuerySuite.
      val preUpgrade = !io.exists(spark, "canonical_edge_entity_index") ||
        !io.read(spark, "canonical_edge_entity_index")
          .columns.contains("sbucket")
      if (preUpgrade) {
        // store written before the index existed (round-4 engine) or
        // before rows carried the source-edge bucket column (including
        // the pred-hash era's pbucket): one-time wholesale backfill
        // from the just-swapped table
        io.overwrite(spark, "canonical_edge_entity_index",
          Pipeline.canonicalIndexRows(io.read(spark, "canonical_edges")
            .select("subj", "pred", "obj", "label", "sourceChunkId"), nb),
          Seq("ebucket"))
      } else {
        val rowCols = Seq("entity", "subj", "pred", "obj", "label",
          "sourceChunkId")
        val oldIdx = Pipeline.canonicalIndexRows(oldContent, nb)
        val newIdx = Pipeline.canonicalIndexRows(
          newContent.select("subj", "pred", "obj", "label", "sourceChunkId"),
          nb)
        // rows are unique in rowCols within each side (content is keyed
        // on (subj,pred,obj)), and a diff row cannot collide with an
        // untouched bucket's row (same subj ⇒ same sbucket ⇒ that bucket
        // was rebuilt), so drop/add is an exact set update
        val dropRows = oldIdx.join(hinted(newIdx), rowCols, "left_anti")
          .localCheckpoint()
        val addRows = newIdx.join(hinted(oldIdx), rowCols, "left_anti")
          .localCheckpoint()
        val ebuckets = (dropRows.select($"ebucket")
          .unionByName(addRows.select($"ebucket"))
          .distinct().as[Int].collect().toSeq)
        if (ebuckets.nonEmpty) {
          val carried = io.read(spark, "canonical_edge_entity_index")
            .filter($"ebucket".isin(ebuckets: _*)) // partition-pruned
            .join(hinted(dropRows.select(rowCols.map(col): _*)),
              rowCols, "left_anti")
            .select("entity", "subj", "pred", "obj", "label",
              "sourceChunkId", "ebucket", "sbucket")
          io.overwritePartitions(spark, "canonical_edge_entity_index",
            carried.unionByName(addRows), "ebucket", ebuckets)
        } // empty diff: the rebuild regenerated identical images — the
          // index is untouched on storage
      }
      // vertex pointer refresh: only partitions holding an affected name;
      // EVERY row in them gets its pointer regenerated from the new map
      // (idempotent for unaffected rows — their image is unchanged there)
      val nbuckets = affectedNames
        .select(pmod(hash($"name"), lit(nb)).as("b"))
        .distinct().as[Int].collect().toSeq
      val refreshed = io.read(spark, "vertices")
        .filter($"nbucket".isin(nbuckets: _*)) // partition-pruned read
        .drop("canonicalName")
        .join(hinted(newCC.select($"name", $"canonicalName".as("cn"))),
          Seq("name"), "left")
        .select($"name", coalesce($"cn", $"name").as("canonicalName"),
          $"vec", $"tripletPart", $"nbucket")
      io.overwritePartitions(spark, "vertices", refreshed, "nbucket", nbuckets)
    }
    io.overwrite(spark, "canonical_map",
      Pipeline.canonicalMapLayout(newCC.select($"name", $"canonicalName"), nb),
      Seq("cbucket"))
  }
}
