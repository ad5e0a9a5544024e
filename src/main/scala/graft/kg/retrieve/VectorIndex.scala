package graft.kg.retrieve

import graft.functions.VectorFunctions.dot_product
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LSH sign-sketch layout for the chunk-embedding table — the ANN scale
  * path of O1 vector search.
  *
  * The reference's vector search is Qdrant HNSW (approximate) over chunk
  * embeddings (`retrieval.py:107-161`, `utils/common.py:100-132`);
  * [[Retrieval.vectorSearch]] reproduces the semantics as an EXACT scan
  * (the correctness baseline), which reads every chunk vector per query —
  * untenable at 10^12 chunks. This index is the scale path: random-
  * hyperplane sign sketches (Charikar'02, the same md5-derived
  * deterministic planes as the oracled q31 ANN operator,
  * `graft/ops/SimilarityOps.scala:26`) laid out as PARTITION directories
  * `l=<table>/vbucket=<bucket>`, so a query reads L·(1+probes) of the
  * L·2^K partitions — bounded, scan-free lookup with exact re-scoring.
  *
  * L tables × K bits: a near neighbor collides with the query in ANY of
  * the L tables; multi-probing (flipping one sketch bit — the buckets a
  * borderline plane projection lands in) trades read amplification for
  * recall without growing the stored index.
  */
object VectorIndex {
  /** L hash tables: each chunk is stored once per table. */
  val NumTables = 4
  /** K sign bits per table → 2^K = 64 buckets per table. */
  val BitsPerTable = 6

  /** ±1 hyperplane weights for plane `pid`, md5-derived per dimension —
    * the deterministic, engine-portable spec shared with q31
    * (`SimilarityOps.planeWeights`): weight = +1 iff the first hex digit
    * of md5("<pid>_<i>") is odd. Float (not double) to match the stored
    * embedding element type, keeping the native dot_product codegen on
    * the float fast path. */
  def planeWeights(pid: Int, dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val firstByte = md.digest(s"${pid}_$i".getBytes("UTF-8"))(0)
      if ((((firstByte >> 4) & 0xf) % 2) == 1) 1.0f else -1.0f
    }
  }

  /** Sign-sketch bucket of `vCol` for hash table `table`: bit p set iff
    * dot(v, plane_{table·K+p}) > 0. The plane weights are plan-time
    * literals; the projection is the native codegen'd dot_product —
    * computed in one narrow pass, no shuffle. */
  def bucketExpr(vCol: Column, dim: Int, table: Int): Column =
    (0 until BitsPerTable).map { p =>
      val pid = table * BitsPerTable + p
      when(dot_product(vCol, typedLit(planeWeights(pid, dim))) > 0,
        lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Index rows for an embeddings frame `(chunkId, vec)`: one row per
    * (chunk, table) with its bucket — L× the input, written under
    * `l=<table>/vbucket=<bucket>` partition dirs by the materializer. */
  def layout(embeddings: DataFrame, dim: Int): DataFrame =
    (0 until NumTables).map { l =>
      embeddings.select(col("chunkId"), col("vec"),
        lit(l).as("l"), bucketExpr(col("vec"), dim, l).as("vbucket"))
    }.reduce(_ unionByName _)

  /** Driver-side sketch of a query vector: the (table, bucket) pairs to
    * read — every bucket within Hamming distance `probeRadius` of the
    * query's sketch in each table (Σ_{d≤r} C(K,d) buckets per table; at
    * the defaults r=1, K=6 that is 7 of the 64). The standard multi-probe
    * recall lever: raising r trades read amplification for recall without
    * growing the stored index. */
  def queryBuckets(qv: Array[Float], probeRadius: Int = 1): Seq[(Int, Int)] = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val masks = (0 until (1 << BitsPerTable))
      .filter(m => Integer.bitCount(m) <= probeRadius)
    (0 until NumTables).flatMap { l =>
      val base = (0 until BitsPerTable).map { p =>
        if (dot(qv, planeWeights(l * BitsPerTable + p, qv.length)) > 0) 1 << p else 0
      }.sum
      masks.map(m => (l, base ^ m))
    }
  }
}
