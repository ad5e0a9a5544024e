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


  /** ±1 hyperplane weights for plane `pid`, derived from md5 per
    * dimension — ENGINE-PORTABLE (the q28 SimHash trick): DuckDB
    * reproduces the identical weights from `md5(pid || '_' || i)`, so the
    * whole LSH-ANN path is hash-checkable by the oracle. Weight = +1 when
    * the first hex digit of md5 is odd, −1 otherwise. */
  private def planeWeights(pid: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val firstByte = md.digest(s"${pid}_$i".getBytes("UTF-8"))(0)
      if ((((firstByte >> 4) & 0xf) % 2) == 1) 1.0 else -1.0
    }
  }

  /** Deterministic sign-sketch bucket: for hyperplane k (0..nPlanes-1),
    * the md5-derived ±1 weight vector is a plan-time literal and the
    * projection is the native codegen'd dot_product — shuffle-free. */
  private def signBucketExpr(vCol: String, dim: Int, nPlanes: Int,
      planeOffset: Int = 0): org.apache.spark.sql.Column = {
    import graft.functions.VectorFunctions.dot_product
    (0 until nPlanes).map { p =>
      val pid = planeOffset + p
      when(dot_product(col(vCol), typedLit(planeWeights(pid, dim))) > 0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
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
    // Fully oracled: the md5-derived planes make DuckDB reproduce the
    // bucketing exactly; recall vs the brute baseline is ALSO asserted
    // in OpsSuite.
    "q31_ann_lsh_bucketed" -> ((s, dir) => {
      import graft.functions.VectorFunctions.cosine_sim
      val L = 6; val k = 4
      // plan-time dimension probe on the RAW scan (no repartition in the
      // probe's lineage — the old shape paid the shuffle just to read one
      // row); an empty table has no dimension (and trivially no
      // neighbors) — produce the empty result instead of crashing on
      // head() (no `return`: this is a lambda)
      val raw = t(s, dir, "embeddings")
        .select(col("vec_id"), asDouble("embedding").as("v"))
      val dimRow = raw.select(size(col("v"))).take(1)
      if (dimRow.isEmpty)
        raw.select(col("vec_id").as("query_id"),
          lit(1).as("rank"), col("vec_id").as("neighbor_id")).limit(0)
      else {
        val dim = dimRow(0).getInt(0)
        // r8 rewrite (guide §2.4 — remove shuffles outright): ONE exploded
        // (tbl, bucket) row set per side and ONE broadcast equi-join on
        // (tbl, qb), instead of L per-table joins unioned (the old plan
        // re-ran the scan+repartition exchange and built a separate
        // broadcast per table — 6 broadcast builds, 12 scan legs). A pair
        // colliding in ANY table still survives exactly once via the same
        // dropDuplicates; candidate set, scores and ranks are identical.
        def withTableBuckets(df: org.apache.spark.sql.DataFrame) =
          df.select(col("vec_id"), col("v"),
            explode(array((0 until L).map { tbl =>
              struct(lit(tbl).as("tbl"),
                signBucketExpr("v", dim, k, planeOffset = tbl * k).as("qb"))
            }: _*)).as("tb"))
            .select(col("vec_id"), col("v"), col("tb.tbl").as("tbl"),
              col("tb.qb").as("qb"))
        // probe side: vec_id < 5 pushes down to the parquet scan — the
        // broadcast build reads row groups, not the shuffled table
        val probes = withTableBuckets(raw.filter(col("vec_id") < 5))
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("tbl"), col("qb"))
        // candidate side: single scan, spread across cores (single-file
        // parquet = one input partition otherwise)
        val candidates = broadcast(probes)
          .join(withTableBuckets(
            raw.repartition(s.sparkContext.defaultParallelism)),
            Seq("tbl", "qb"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
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
      }
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
    // reproduces the md5-derived sign-plane bucketing bit-for-bit:
    // weight(p,i) = +1 iff first hex digit of md5(p_'_'_i) is odd;
    // bucket(tbl) = Σ 2^(p%4) over planes with dot(v, w_p) > 0;
    // candidates = bucket equality in ANY of the 6 tables
    "q31_ann_lsh_bucketed" ->
      """WITH dims AS (SELECT len(embedding) AS d FROM embeddings LIMIT 1),
         w AS (
           SELECT p,
             list_transform(range(0, (SELECT d FROM dims)), i ->
               CASE WHEN (strpos('0123456789abcdef',
                          substr(md5(p::VARCHAR || '_' || i::VARCHAR), 1, 1)) - 1) % 2 = 1
                    THEN 1.0 ELSE -1.0 END) AS wv
           FROM range(0, 24) t(p)),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         bits AS (
           SELECT e.vec_id, CAST(w.p // 4 AS INT) AS tbl,
             CASE WHEN list_dot_product(e.v, w.wv) > 0
                  THEN CAST(1 << CAST(w.p % 4 AS INT) AS BIGINT) ELSE 0 END AS bit
           FROM e CROSS JOIN w),
         buckets AS (
           SELECT vec_id, tbl, CAST(sum(bit) AS BIGINT) AS b
           FROM bits GROUP BY vec_id, tbl),
         cand AS (
           SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
           FROM buckets p JOIN buckets c ON p.tbl = c.tbl AND p.b = c.b
           WHERE p.vec_id < 5 AND c.vec_id <> p.vec_id),
         scored AS (
           SELECT cand.query_id, cand.neighbor_id,
             list_dot_product(pe.v, ne.v) /
               (sqrt(list_dot_product(pe.v, pe.v)) * sqrt(list_dot_product(ne.v, ne.v))) AS cos
           FROM cand JOIN e pe ON pe.vec_id = cand.query_id
                     JOIN e ne ON ne.vec_id = cand.neighbor_id),
         ranked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
         ORDER BY query_id, rank""",
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
