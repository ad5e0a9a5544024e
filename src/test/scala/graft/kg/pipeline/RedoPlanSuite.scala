package graft.kg.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The compaction redo-plan executor's failure contract:
  * `FileSystem.rename` reports failure by RETURNING FALSE as well as by
  * throwing — treating false as success would let the plan's later rm
  * ops delete the only copy of the staged rows (silent row loss inside
  * the crash-safety path). A false return must abort the replay. */
class RedoPlanSuite extends AnyFunSuite {
  lazy val spark = graft.kg.SparkSessionFixture.spark

  private def localFs(renameResult: Boolean) = {
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def rename(src: org.apache.hadoop.fs.Path,
          dst: org.apache.hadoop.fs.Path): Boolean =
        renameResult && super.rename(src, dst)
    }
    fs.initialize(new java.net.URI("file:///"),
      new org.apache.hadoop.conf.Configuration())
    fs
  }

  test("executePlan aborts on rename-returned-false, before any rm runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_redoplan")
    val src = dir.resolve("staged.parquet")
    java.nio.file.Files.writeString(src, "rows")
    val dst = dir.resolve("live.parquet")
    val io = new ParquetTableIO(dir.toString)
    val e = intercept[java.io.IOException] {
      io.executePlan(localFs(renameResult = false), Seq(
        ("mv", src.toString, dst.toString),
        ("rm", src.toString, "")))
    }
    assert(e.getMessage.contains("returned false"))
    // the rm after the failed mv never ran: the staged rows survive
    assert(java.nio.file.Files.exists(src))
    assert(!java.nio.file.Files.exists(dst))
  }

  test("executePlan replays an already-applied mv idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_redoplan2")
    val src = dir.resolve("staged.parquet") // absent: mv already ran
    val dst = dir.resolve("live.parquet")
    java.nio.file.Files.writeString(dst, "rows")
    val sliver = dir.resolve("sliver.parquet")
    java.nio.file.Files.writeString(sliver, "old")
    val io = new ParquetTableIO(dir.toString)
    io.executePlan(localFs(renameResult = true), Seq(
      ("mv", src.toString, dst.toString),
      ("rm", sliver.toString, "")))
    assert(java.nio.file.Files.exists(dst))
    assert(!java.nio.file.Files.exists(sliver))
  }
}
