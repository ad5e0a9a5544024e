package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table: brute-force cosine
  * top-k (the correctness baseline, with a DuckDB oracle) and an
  * LSH-bucketed approximate variant (the scale path — rows-only check;
  * its recall vs the brute baseline is asserted in SimilarityOpsSuite).
  */
object SimilarityOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def asDouble(c: String) =
    expr(s"transform($c, x -> CAST(x AS DOUBLE))")


  /** Deterministic sign-sketch bucket: for hyperplane k (0..nPlanes-1),
    * pseudo-random ±1 weights per dimension derived from (k, dim index)
    * via integer hashing — portable and shuffle-free. */
  private def signBucketExpr(vCol: String, nPlanes: Int,
      planeOffset: Int = 0): org.apache.spark.sql.Column = {
    // weight(plane, i) = ±1 from spark hash(plane, i) — portable, no state
    val planes = (0 until nPlanes).map { p =>
      val pid = planeOffset + p
      s"""(CASE WHEN aggregate(zip_with($vCol, sequence(0, size($vCol) - 1),
              (x, i) -> x * (CAST((hash($pid, i) & 2) AS DOUBLE) - 1.0)),
            0D, (acc, z) -> acc + z) > 0 THEN ${1L << p} ELSE 0 END)"""
    }
    expr(planes.mkString("(", " + ", ")"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] =
    knnDefs ++ featureDefs

  private val knnDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 per probe (probes = vec_id < 5). The
    // probe side is tiny → broadcast; ranks only (fp-order safe).
    "q30_knn_bruteforce" -> ((s, dir) => {
      import graft.functions.VectorFunctions.cosine_sim
      val e = t(s, dir, "embeddings").select(col("vec_id"), asDouble("embedding").as("v"))
        .repartition(s.sparkContext.defaultParallelism)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      broadcast(probes).join(e, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine_sim(col("qv"), col("v")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN (random-hyperplane sign sketch): L hash tables of
    // k planes each; a candidate matches a probe in ANY table — the
    // 100TB-scale path where a full scan per probe is impossible.
    // Rows-only (approximate by construction; recall vs the brute
    // baseline asserted in OpsSuite).
    "q31_ann_lsh_bucketed" -> ((s, dir) => {
      import graft.functions.VectorFunctions.cosine_sim
      val L = 6; val k = 4
      val e0 = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble("embedding").as("v"))
        .repartition(s.sparkContext.defaultParallelism)
      val e = (0 until L).foldLeft(e0) { (df, tbl) =>
        df.withColumn(s"b$tbl", signBucketExpr("v", k, planeOffset = tbl * k))
      }
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id") +: col("v").as("qv") +:
          (0 until L).map(tbl => col(s"b$tbl").as(s"qb$tbl")): _*)
      // candidate set = UNION over tables of bucket equi-joins (each a
      // broadcast hash join on the bucket key — blocked, never a scan)
      val candidates = (0 until L).map { tbl =>
        broadcast(probes.select(col("query_id"), col("qv"), col(s"qb$tbl").as("qb")))
          .join(e.select(col("vec_id"), col("v"), col(s"b$tbl").as("qb")), Seq("qb"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
      }.reduce(_ unionByName _)
        .dropDuplicates("query_id", "vec_id")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      candidates
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine_sim(col("qv"), col("v")).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }))

  /** Embedding feature ops for a training-data pipeline: L2
    * normalization and int8 quantization. Outputs are scalar digests
    * (sum/min/max per vector) so the oracle hash-compare avoids
    * engine-specific array stringification. */
  private val featureDefs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_embed_normalize" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble("embedding").as("v"))
        .withColumn("nrm", sqrt(expr(
          "aggregate(v, 0D, (acc, x) -> acc + x * x)")))
        .select(col("vec_id"),
          expr("transform(v, x -> x / nrm)").as("n"))
        .select(col("vec_id"),
          round(expr("aggregate(n, 0D, (acc, x) -> acc + x)"), 6).as("sum_n"),
          round(expr("array_min(n)"), 6).as("min_n"),
          round(expr("array_max(n)"), 6).as("max_n"))
        .orderBy(col("vec_id"))
    }),
    "q37_embed_quantize_int8" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), expr(
          """transform(embedding,
             x -> CAST(greatest(least(round(CAST(x AS DOUBLE) * 127), 127D), -127D) AS BIGINT))""")
          .as("q"))
        .select(col("vec_id"),
          expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("sum_q"),
          expr("array_min(q)").as("min_q"),
          expr("array_max(q)").as("max_q"))
        .orderBy(col("vec_id"))
    }))

  def oracles: Map[String, String] = Map(
    "q36_embed_normalize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
               FROM e)
         SELECT vec_id,
           round(list_sum(nv), 6) AS sum_n,
           round(list_min(nv), 6) AS min_n,
           round(list_max(nv), 6) AS max_n
         FROM n ORDER BY vec_id""",
    "q37_embed_quantize_int8" ->
      """WITH q AS (SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> CAST(greatest(least(round(x * 127), 127), -127) AS BIGINT)) AS qv
           FROM embeddings)
         SELECT vec_id,
           CAST(list_sum(qv) AS BIGINT) AS sum_q,
           list_min(qv) AS min_q, list_max(qv) AS max_q
         FROM q ORDER BY vec_id""",
    "q30_knn_bruteforce" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         scored AS (
           SELECT p.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_dot_product(p.v, e.v) /
               (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
           FROM e p JOIN e ON p.vec_id < 5 AND e.vec_id <> p.vec_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id FROM ranked
         WHERE rank <= 5 ORDER BY query_id, rank""")
}
