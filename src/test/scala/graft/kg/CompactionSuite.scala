package graft.kg

import graft.kg.pipeline.{ParquetTableIO, Pipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Delta (partition-selective) compaction must be observationally
  * identical to the full rebuild — same canonical_edges / vertices /
  * canonical_map state after every batch sequence — while physically
  * rewriting only the partitions the canonical-map diff reaches.
  */
class CompactionSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def row(path: String, content: String) =
    CorpusRow("r", path, "c0", "scala", content)

  // three batches: batch 2 links "batch engine" to batch 1's
  // "batchengine"; batch 3 links "parse tree" to batch 1's "parsetree"
  // (a SECOND component merging two batches later) and adds fresh
  // unlinked facts
  private val batches = Seq(
    Seq(row("a.scala", "BatchEngine imports module parseTree. StoreMap uses dataTree."),
      row("b.scala", "ParseTree depends on mergeLib.")),
    Seq(row("c.scala", "Batch engine calls function sortTree.")),
    Seq(row("d.scala", "Parse tree extends class mainLib. IndexSet uses scanList.")))

  private def ingest(cfg: GraftConfig): ParquetTableIO = {
    val s = spark; import s.implicits._
    val io = new ParquetTableIO(
      java.nio.file.Files.createTempDirectory("graftcompact").toString)
    batches.foreach { b =>
      new Pipeline(cfg).materialize(spark.createDataset(b), io)
    }
    io
  }

  private def state(io: ParquetTableIO, table: String): Set[String] = {
    val df = io.read(spark, table)
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols.map(c => s"cast(`$c` as string)"): _*)
      .collect().map(_.mkString("|")).toSet
  }

  test("delta compaction == full rebuild across merging batches") {
    val base = GraftConfig(linkMode = "lsh", linkThreshold = 0.7)
    val delta = ingest(base) // fullCompaction = false (default)
    val full = ingest(base.copy(fullCompaction = true))
    Seq("canonical_edges", "vertices", "canonical_map").foreach { t =>
      assert(state(delta, t) == state(full, t),
        s"table $t diverged between delta and full compaction")
      assert(state(delta, t).nonEmpty, s"table $t empty")
    }
    // the merges actually happened: batch-1 rows surface under the merged
    // canonical names in BOTH stores
    Seq(delta, full).foreach { io =>
      val subjs = io.read(spark, "canonical_edges")
        .select("subj").collect().map(_.getString(0)).toSet
      assert(subjs.contains("batch engine") && !subjs.contains("batchengine"))
      assert(subjs.contains("parse tree") && !subjs.contains("parsetree"))
    }
    // the read-time remap view (base edges ∘ current canonical_map at
    // scan time) equals the materialized canonical_edges table
    Seq(delta, full).foreach { io =>
      val rag = new GraphRag(spark, io, base)
      val view = rag.canonicalEdgesView()
      val cols = view.columns.sorted.toSeq
      val viewSet = view.selectExpr(cols.map(c => s"cast(`$c` as string)"): _*)
        .collect().map(_.mkString("|")).toSet
      val tableSet = io.read(spark, "canonical_edges")
        .select("subj", "pred", "obj", "label", "sourceChunkId")
        .selectExpr(cols.map(c => s"cast(`$c` as string)"): _*)
        .collect().map(_.mkString("|")).toSet
      assert(viewSet == tableSet, "read-time canonical view != compacted table")
    }
  }

  test("delta == full compaction under the salted-join config too") {
    // the 10^12-scale regime: no broadcast of the canonical map anywhere —
    // compactDelta's rebuild must identity-complete the map for the
    // salted path (which drops unmatched rows where broadcast coalesces)
    val cfg = GraftConfig(linkMode = "lsh", linkThreshold = 0.7,
      saltedCanonicalJoin = true)
    val delta = ingest(cfg)
    val full = ingest(cfg.copy(fullCompaction = true))
    Seq("canonical_edges", "vertices", "canonical_map").foreach { t =>
      assert(state(delta, t) == state(full, t), s"$t diverged (salted)")
      assert(state(delta, t).nonEmpty)
    }
  }

  test("delta compaction recovers a store with no canonical_map (pre-upgrade)") {
    val s = spark; import s.implicits._
    val cfg = GraftConfig(linkMode = "lsh", linkThreshold = 0.7)
    val root = java.nio.file.Files.createTempDirectory("graftnomap").toString
    val io = new ParquetTableIO(root)
    new Pipeline(cfg).materialize(spark.createDataset(batches.head), io)
    // simulate a store written before the canonical_map table existed
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/canonical_map"), true)
    assert(!io.exists(spark, "canonical_map"))
    // the next incremental batch detects the missing map, falls back to
    // ONE full rebuild (stale prior rows are unlocatable without the old
    // map), re-seeds canonical_map, and later batches go back to delta
    batches.tail.foreach(b =>
      new Pipeline(cfg).materialize(spark.createDataset(b), io))
    val full = ingest(cfg.copy(fullCompaction = true))
    Seq("canonical_edges", "vertices", "canonical_map").foreach { t =>
      assert(state(io, t) == state(full, t),
        s"table $t diverged recovering from a mapless store")
    }
  }

  test("overwritePartitions swaps only the listed partitions on storage") {
    val s = spark; import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graftparts").toString
    val io = new ParquetTableIO(root)
    val df = (0 until 40).map(i => (s"k$i", i % 4)).toDF("k", "pb")
    io.overwrite(spark, "t", df, Seq("pb"))

    def files(b: Int): Set[(String, Long)] = {
      val d = new java.io.File(s"$root/t/pb=$b")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val before = (0 until 4).map(files)

    // replace partition 1, truncate partition 2 (listed, absent from df)
    val repl = Seq(("x1", 1), ("x2", 1)).toDF("k", "pb")
    io.overwritePartitions(spark, "t", repl, "pb", Seq(1, 2))

    val t = io.read(spark, "t")
    assert(t.filter(col("pb") === 1).select("k").collect()
      .map(_.getString(0)).toSet == Set("x1", "x2"))
    assert(t.filter(col("pb") === 2).count() == 0, "listed partition not truncated")
    assert(t.filter(col("pb") === 0).count() == 10)
    assert(t.filter(col("pb") === 3).count() == 10)
    // partitions 0 and 3 are PHYSICALLY untouched — same files, same mtime
    assert(files(0) == before(0), "unlisted partition 0 was rewritten")
    assert(files(3) == before(3), "unlisted partition 3 was rewritten")
    assert(files(1) != before(1))
  }
}
