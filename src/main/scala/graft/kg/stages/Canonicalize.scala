package graft.kg.stages

import graft.kg._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Canonicalization of aliased mentions via connected components
  * (SURVEY.md §2.6 J4).
  *
  * The reference's J4 "canonicalization" is a per-triplet cross-product of
  * alias sets (`triplets.py:371-398`). The rebuild replaces it with a
  * proper global merge: alias pairs from [[Link]] form an undirected
  * graph; each component's canonical name is its minimum (lexicographic).
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR on DataFrames (Kiveris
  * et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
  * O(log d) rounds, supernode-safe: large-star splits high-degree nodes'
  * neighborhoods instead of funneling them through one reducer). Each
  * round `localCheckpoint`s to truncate lineage (SURVEY.md §7.6.5).
  * Alias components here are small (top-10-per-probe cap bounds degree),
  * but the algorithm is chosen for the 10^12-file regime where hub
  * entities produce components with millions of members.
  */
object Canonicalize {

  /** One large-star round: for every node u (over symmetric edges),
    * m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u) with v > u. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy(col("u"))
      .agg(collect_set(col("v")).as("ns"))
      .select(col("u"), least(col("u"), array_min(col("ns"))).as("m"), col("ns"))
      .select(explode(expr("filter(ns, x -> x > u)")).as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: orient edges parent-ward (u = max, v = min);
    * for every u, m = min(smaller-neighbors ∪ {u}); emit (v, m) for each
    * smaller neighbor v plus (u, m). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
    oriented.groupBy(col("u"))
      .agg(collect_set(col("v")).as("ns"))
      .select(col("u"), array_min(col("ns")).as("m"), col("ns"))
      .select(col("u"), col("m"),
        explode(concat(col("ns"), array(col("u")))).as("n"))
      .select(col("n").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** name → canonicalName for every name appearing in `aliases`
    * (non-identity mappings only appear for linked names; [[canonicalMap]]
    * adds the identity rows).
    *
    * Size-adaptive: an alias graph at or under `localSolveThreshold`
    * edges is solved by driver-side union-find in ONE collect — the
    * iterative large-star/small-star loop costs O(iterations)
    * driver-synchronous job rounds, which is pure fixed overhead when the
    * graph is small (alias clusters are rare relative to mentions; the
    * round-1 measurement showed ~40 s/run of star-loop serial tail on a
    * SMALL alias graph). Above the threshold — the hub-entity regime the
    * star algorithm exists for — the distributed loop runs unchanged.
    *
    * Threshold calibration (round-3 measurement): the 1M-doc bench corpus
    * produces only ~700 alias edges, so the local solve there is
    * sub-millisecond — the threshold exists purely to bound the DRIVER
    * cost when the alias graph is genuinely large. 2^17 edges caps the
    * probe collect at ~tens of MB of string pairs and the union-find at
    * well under a second; anything bigger runs the distributed star loop,
    * where the work shrinks with cores instead of serializing on the
    * driver. */
  def connectedComponents(
      aliases: Dataset[AliasPair],
      maxIterations: Int = 30,
      localSolveThreshold: Long = 1L << 17): Dataset[CanonicalMapping] = {
    val spark = aliases.sparkSession
    import spark.implicits._

    // per-iteration lineage barrier: localCheckpoint (executor-memory) by
    // default; if the session has a reliable checkpoint dir configured
    // (spark.sparkContext.setCheckpointDir), use a storage-backed
    // checkpoint instead — at real cluster scale an executor loss would
    // otherwise force recomputing the whole iteration chain. Superseded
    // iterations' checkpoint files are deleted as the loop advances
    // (Spark only auto-cleans them with referenceTracking.cleanCheckpoints,
    // which is off by default — without this, every run would leave
    // O(iterations) full edge-set copies on storage).
    import org.apache.hadoop.fs.Path
    val ckptBase = spark.sparkContext.getCheckpointDir.map(new Path(_))
    val reliable = ckptBase.isDefined
    def ckptFs = ckptBase.get.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the rdd-N dirs a barrier writes are identified by diffing the
    // session checkpoint dir around the (eager) checkpoint call — the
    // Dataset API exposes no handle to the internal checkpointed RDD.
    // Assumes no concurrent checkpoints in this session (the CC loop is
    // driver-serial).
    def children(): Set[String] = ckptBase match {
      case Some(p) if ckptFs.exists(p) =>
        ckptFs.listStatus(p).map(_.getPath.getName).toSet
      case _ => Set.empty
    }
    def barrierTracked(df: DataFrame): (DataFrame, Set[String]) =
      if (!reliable) (df.localCheckpoint(), Set.empty)
      else {
        val before = children()
        val out = df.checkpoint() // eager: files exist on return
        (out, children() -- before)
      }
    def dropCheckpointDirs(dirs: Set[String]): Unit =
      dirs.foreach(d => ckptFs.delete(new Path(ckptBase.get, d), true))

    val distinctEdges = aliases.select(col("a").as("u"), col("b").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      // persisted across the size probe AND the first barrier: the probe's
      // limit+collect executes the full upstream linking-join DAG (the most
      // expensive stage of the lsh pipeline) — without the persist, the
      // distributed path's first checkpoint would re-execute it from
      // scratch, paying the linking join twice exactly in the regime (big
      // alias graph) where it hurts most. Caching materializes whole
      // partitions, so partitions the probe touched are reused verbatim.
      .persist(StorageLevel.MEMORY_AND_DISK)

    // cheap size probe: take threshold+1 rows; under the cap → local solve
    val head = distinctEdges.limit((localSolveThreshold + 1).toInt).collect()
    if (head.length <= localSolveThreshold) {
      val parent = mutable.Map.empty[String, String]
      // iterative find (walk to root, second pass compresses): union-by-min
      // can build O(n) parent chains on adversarial edge orders (e.g. long
      // near-duplicate version chains), which would blow the JVM stack in
      // a recursive find at the 2^20-edge threshold
      def find(x: String): String = {
        var r = x
        while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
        var c = x
        while (c != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      head.foreach { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = head.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
      val mapping = nodes.groupBy(find).toSeq.flatMap { case (_, ns) =>
        val m = ns.min
        ns.collect { case n if n != m => CanonicalMapping(n, m) }
      }
      distinctEdges.unpersist(blocking = false) // fully consumed by the probe
      return spark.createDataset(mapping)
    }

    var (edges, edgesCkpt) = barrierTracked(distinctEdges)
    // the first barrier materialized a checkpoint copy — the cache is dead
    distinctEdges.unpersist(blocking = false)

    // cheap order-independent edge-set signature: (count, xor of row
    // hashes) — a single-pass partial-aggregable scan of the just-
    // checkpointed set (no shuffle, no join). bit_xor instead of sum:
    // overflow-free under ANSI mode, and the sets are distinct so xor
    // never self-cancels a duplicate. Used as a convergence FAST-PATH:
    // unequal signatures prove non-convergence outright; equal signatures
    // (possible 2^-64 collision) are CONFIRMED by the exact symmetric-
    // difference scan — which therefore runs once per CC solve (at the
    // fixpoint) instead of once per iteration.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var edgesSig = signature(edges)
    var converged = edgesSig._1 == 0L
    var iter = 0
    while (!converged && iter < maxIterations) {
      // TWO large/small-star rounds per lineage barrier: the star rounds
      // are cheap wide transforms, the barrier (checkpoint write + driver
      // round trip) is the per-iteration fixed cost — unrolling halves the
      // barrier count; at the fixpoint an extra round is the identity, so
      // overshooting by one round never changes the result
      val (next, nextCkpt) =
        barrierTracked(smallStar(largeStar(smallStar(largeStar(edges)))))
      val nextSig = signature(next)
      converged = nextSig == edgesSig &&
        next.exceptAll(edges).union(edges.exceptAll(next)).isEmpty
      dropCheckpointDirs(edgesCkpt) // `next` is materialized; prior copy dead
      edges = next
      edgesCkpt = nextCkpt
      edgesSig = nextSig
      iter += 1
    }
    // the FINAL iteration's checkpoint stays: `edges` feeds the lazy
    // canonical-name aggregation below
    // at fixpoint every edge is (node, componentMin)
    edges.select(col("u").as("name"), col("v").as("canonicalName"))
      .groupBy(col("name")).agg(min(col("canonicalName")).as("canonicalName"))
      .as[CanonicalMapping]
  }

  /** Result of an incremental CC solve: the new canonical map (all
    * non-identity rows), the names whose mapping changed vs the old map,
    * and (for observability/tests) the seed edge set the solve actually
    * ran over — O(batch + touched-component members), not O(history). */
  final case class IncrementalCC(
      newMap: DataFrame, // (name, canonicalName), non-identity
      changed: DataFrame, // (name)
      seed: Dataset[AliasPair])

  /** Incremental connected components over a growing alias graph — the
    * per-batch form of [[connectedComponents]] (reference anchor: the
    * reference links each triplet against cumulative graph state
    * incrementally, `triplets.py:252-343`, never a global recompute).
    *
    * `oldMap` is the CC output over the cumulative alias set as of the
    * previous batch (non-identity rows only); `newPairs` are the batch's
    * alias pairs. A canonical map is a SPANNING structure of its
    * components — every member reaches the component min through one star
    * edge — so CC over {oldMap-as-edges ∪ newPairs} has exactly the
    * connectivity (and mins) of CC over the full cumulative pair set, and
    * only components TOUCHED by a new pair can change. The solve
    * therefore runs over O(batch + touched-component members) edges
    * instead of O(alias history), and the O(history) full-outer map diff
    * is unnecessary: names outside the touched components are copied
    * verbatim, hence unchanged by construction.
    *
    *  1. touched canonicals = old canonical of every name in `newPairs`
    *     (identity for names the old map doesn't hold);
    *  2. seed = star edges of the touched components ∪ `newPairs`;
    *  3. newMap = CC(seed) ∪ untouched old rows; changed = diff of the
    *     touched rows vs CC(seed) — both O(touched), small.
    *
    * The old-map scans stay map-only when `smallHint = broadcast` (the
    * probe sets are batch-bounded); pass identity for the regime where
    * even batch-derived sets should not be broadcast — the joins then
    * fall to planner-chosen shuffles, the same trade every other
    * canonical-map join makes under `saltedCanonicalJoin`. */
  def incrementalComponents(
      oldMap: DataFrame, // (name, canonicalName), non-identity rows
      newPairs: Dataset[AliasPair],
      smallHint: DataFrame => DataFrame = broadcast): IncrementalCC = {
    val spark = oldMap.sparkSession
    import spark.implicits._
    val old = oldMap.select(col("name"), col("canonicalName"))
    val pairs = newPairs.select(col("a"), col("b")).where(col("a") =!= col("b"))
    // pinned: each is consumed by 2-3 downstream joins, and re-running
    // `pairs` would re-execute the batch's linking DAG
    val batchNames = pairs.select(explode(array(col("a"), col("b"))).as("name"))
      .distinct().localCheckpoint() // O(batch)
    val hit = old.join(smallHint(batchNames), Seq("name"), "left_semi")
      .localCheckpoint() // O(batch): old rows of the batch's names
    val touchedCanon = hit.select(col("canonicalName").as("c"))
      .unionByName(batchNames.join(hit.select(col("name")), Seq("name"), "left_anti")
        .select(col("name").as("c"))) // unmapped batch names: canonical = self
      .distinct().localCheckpoint() // O(batch) component ids
    val touchedKey = touchedCanon.select(col("c").as("canonicalName"))
    val touchedRows = old
      .join(smallHint(touchedKey), Seq("canonicalName"), "left_semi")
      .localCheckpoint() // O(touched-component members)
    val seed = touchedRows
      .select(col("canonicalName").as("a"), col("name").as("b"),
        lit(1.0).as("score")).as[AliasPair]
      .unionByName(pairs.withColumn("score", lit(1.0)).as[AliasPair])
    val solved = connectedComponents(seed).toDF().localCheckpoint()
    val untouched = old
      .join(smallHint(touchedKey), Seq("canonicalName"), "left_anti")
      .select(col("name"), col("canonicalName"))
    val newMap = untouched.unionByName(solved.select(col("name"), col("canonicalName")))
    val changed = touchedRows.select(col("name"), col("canonicalName").as("oldC"))
      .join(solved.select(col("name"), col("canonicalName").as("newC")),
        Seq("name"), "full_outer")
      .filter(!(coalesce(col("oldC"), col("name")) <=> coalesce(col("newC"), col("name"))))
      .select(col("name"))
    IncrementalCC(newMap, changed, seed)
  }

  /** Full canonical map over a mention set: identity for unlinked names.
    * The CC output holds only the LINKED names (a small subset of the
    * mention vocabulary — alias clusters are rare relative to distinct
    * mentions), so by default it is broadcast: the plan is a single-pass
    * BroadcastHashJoin over the mention set instead of a sort-merge join
    * with two shuffles (seen in the kg_canonical_lsh plan audit).
    * `broadcastCC = false` falls back to a planner-chosen shuffle join
    * for the regime where linked names themselves outgrow broadcast
    * (same regime as [[Materialize.canonicalEdges]]'s salted join). */
  def canonicalMap(
      mentionNames: DataFrame, // (name)
      aliases: Dataset[AliasPair],
      broadcastCC: Boolean = true): Dataset[CanonicalMapping] = {
    val spark = mentionNames.sparkSession
    import spark.implicits._
    val cc = connectedComponents(aliases).toDF()
    val ccSide = if (broadcastCC) broadcast(cc) else cc
    mentionNames.select(col("name")).distinct()
      .join(ccSide, Seq("name"), "left")
      .select(col("name"), coalesce(col("canonicalName"), col("name")).as("canonicalName"))
      .as[CanonicalMapping]
  }
}
