package graft.kg

import graft.kg.stages.Canonicalize
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Large-star/small-star CC vs a brute-force union-find oracle on random
  * graphs (SURVEY.md §5.2.2 "CC correctness vs brute-force on small
  * random graphs"). */
class ConnectedComponentsSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark

  private def bruteForce(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    edges.foreach { case (a, b) => union(a, b) }
    // canonical = min of component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min
      ns.map(_ -> m)
    }.toMap
  }

  private def checkGraph(edges: Seq[(String, String)], label: String): Unit = {
    val s = spark; import s.implicits._
    val aliases = spark.createDataset(edges.map { case (a, b) => AliasPair(a, b, 1.0) })
    val expected = bruteForce(edges)
    // exercise BOTH paths: the driver-side union-find fast path (default
    // threshold) and the distributed star loop (threshold 0 forces it)
    for ((threshold, path) <- Seq((1L << 20, "local"), (0L, "distributed"))) {
      val got = Canonicalize
        .connectedComponents(aliases, localSolveThreshold = threshold)
        .collect().map(c => c.name -> c.canonicalName).toMap
      // connectedComponents omits identity rows for component minima
      val gotFull = expected.keys.map(n => n -> got.getOrElse(n, n)).toMap
      assert(gotFull == expected, s"$label ($path path): CC mismatch")
    }
  }

  test("random graphs match brute-force union-find") {
    val rnd = new Random(123)
    for (trial <- 1 to 6) {
      val n = 5 + rnd.nextInt(30)
      val nEdges = 1 + rnd.nextInt(2 * n)
      val edges = (1 to nEdges).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) checkGraph(edges, s"trial$trial(n=$n,e=${edges.size})")
    }
  }

  test("supernode star graph collapses to one component") {
    val edges = (1 to 60).map(i => ("hub", f"leaf$i%03d"))
    checkGraph(edges, "star")
  }

  test("long chain (worst diameter) converges") {
    val edges = (0 until 40).map(i => (f"c$i%03d", f"c${i + 1}%03d"))
    checkGraph(edges, "chain")
  }

  test("two disjoint cliques stay separate") {
    val a = for (i <- 0 until 5; j <- i + 1 until 5) yield (s"a$i", s"a$j")
    val b = for (i <- 0 until 4; j <- i + 1 until 4) yield (s"b$i", s"b$j")
    checkGraph(a ++ b, "cliques")
  }

  test("upstream alias DAG computes each edge once across probe + barrier") {
    val s = spark; import s.implicits._
    // instrument the alias source: the accumulator counts every time a row
    // is COMPUTED (not read from cache). The size probe executes the
    // upstream DAG; without the persist in connectedComponents, the
    // distributed path's first checkpoint would execute it a second time.
    val acc = spark.sparkContext.longAccumulator("aliasEvals")
    val base = spark.createDataset((1 to 100).map(i => AliasPair(s"n$i", s"n${i + 1}", 1.0)))
    val tracked = base.mapPartitions { it => it.map { p => acc.add(1); p } }
    // threshold 10 < 100 edges → forces the distributed star loop
    val cc = Canonicalize.connectedComponents(tracked, localSolveThreshold = 10)
    cc.count()
    assert(acc.value == 100,
      s"alias DAG executed ${acc.value / 100.0}x — expected exactly once")
  }

  test("reliable-checkpoint barrier: same result with a storage-backed dir") {
    val dir = java.nio.file.Files.createTempDirectory("graftccckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val s = spark; import s.implicits._
      val edges = (0 until 20).map(i => (f"c$i%03d", f"c${i + 1}%03d"))
      val aliases = spark.createDataset(edges.map { case (a, b) => AliasPair(a, b, 1.0) })
      // threshold 0 forces the distributed loop (the barrier under test)
      val got = Canonicalize
        .connectedComponents(aliases, localSolveThreshold = 0L)
        .collect().map(c => c.name -> c.canonicalName).toMap
      val expected = bruteForce(edges)
      assert(expected.keys.forall(n => got.getOrElse(n, n) == expected(n)))
      // the barrier must have written to the reliable dir, and superseded
      // iterations' files must have been cleaned: only the final
      // iteration's rdd-N dir survives
      val base = java.nio.file.Paths.get(dir)
      val wrote = java.nio.file.Files.walk(base)
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "no reliable checkpoint files written")
      val rddDirs = java.nio.file.Files.walk(base)
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      assert(rddDirs == 1, s"superseded checkpoints not cleaned: $rddDirs rdd dirs remain")
    } finally {
      // restore the default (local) barrier for the other suites
      org.apache.spark.sql.graftbridge.Bridge.clearCheckpointDir(spark.sparkContext)
    }
  }
}
