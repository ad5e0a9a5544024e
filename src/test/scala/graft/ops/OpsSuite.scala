package graft.ops

import graft.kg.SparkSessionFixture
import org.scalatest.funsuite.AnyFunSuite

/** Sanity + quality checks for the rows-only (non-oracle) operators; the
  * oracle-checked ones are validated by the driver's DuckDB compare (and
  * locally by tools/compare_oracle.py). */
class OpsSuite extends AnyFunSuite {
  lazy val spark = SparkSessionFixture.spark
  val dir = "/root/testdata/sf0.001"

  test("LSH-bucketed ANN recalls a usable fraction of brute-force top-5") {
    val brute = SimilarityOps.defs("q30_knn_bruteforce")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = SimilarityOps.defs("q31_ann_lsh_bucketed")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ann.nonEmpty, "ANN returned nothing")
    val recall = (ann intersect brute).size.toDouble / brute.size
    info(s"ANN bucket recall vs brute top-5: $recall (ann=${ann.size})")
    // 6 tables × 4 sign-planes on 64-d random data: sign sketches
    // correlate with cosine, so real neighbors should survive blocking
    assert(recall >= 0.2, s"recall $recall < 0.2")
  }

  test("minhash-banded jaccard candidates are genuinely similar") {
    val rows = DedupOps.defs("q27_minhash_jaccard")(spark, dir).collect()
    assert(rows.nonEmpty, "no candidate pairs found at sf0.001")
    // banding on two minhash signatures should only surface high-overlap
    // docs in this vocab-limited corpus
    val jacs = rows.map(_.getAs[Double]("jaccard"))
    assert(jacs.forall(j => j >= 0.0 && j <= 1.0))
    assert(jacs.max > 0.8, s"expected at least one near-dup, max=${jacs.max}")
  }

  test("simhash of identical texts is identical, different texts differ") {
    val s = spark; import s.implicits._
    val out = DedupOps.defs("q28_simhash")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 500)
    assert(out.values.toSet.size > 1, "simhash degenerate: all equal")
  }

  test("multimodal stub decode produces typed features per row") {
    val rows = Multimodal.defs("q32_multimodal_decode")(spark, dir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 80)
      assert(Set("image", "audio").contains(r.getAs[String]("media_type")))
      assert(!r.isNullAt(r.fieldIndex("mean_feature")))
    }
  }

  test("every oracle key has a matching query (driver contract)") {
    val qs = graft.Queries.all.keySet
    val missing = graft.Queries.oracles.keySet -- qs
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
