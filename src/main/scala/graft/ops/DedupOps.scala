package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over the
  * `documents` table: exact (hash-groupBy), MinHash banding, n-gram
  * Jaccard, SimHash, and embedding-cosine near-dup — the first four with
  * DuckDB oracles (md5-based signatures are engine-portable), the
  * MLlib-LSH variant rows-only.
  *
  * Scale notes: every variant is blocked — candidate pairs come from
  * signature equality (shuffle on the signature key), never from a global
  * cross join; the pairwise re-score joins only within blocks.
  */
object DedupOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** doc_id + token-bigram shingles. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
        .as("sh"))

  /** Two-band MinHash signature per doc: min(md5('a'|sh)), min(md5('b'|sh)).
    *
    * Deliberately KEPT as explode → groupBy → min (r8, guide §7.2 lesson):
    * the "obvious" shuffle-free form — `array_min(transform(sh, md5(...)))`
    * over a per-row shingle array — measured 10× SLOWER when consumed by
    * q27's self-join: the join's inferred `IsNotNull(mh_a)` constraint is
    * pushed below the projection, duplicating the ENTIRE minhash
    * expression into a Filter where `split(text)` is inlined into the
    * bigram lambda — O(tokens²) work per document, per band, per side
    * (measured 11.2 s vs 1.1 s at sf0.1). The aggregate blocks that
    * pushdown, and the explode's shuffle is negligible anyway: groupBy-min
    * partial-aggregates map-side, so only one (doc, min) row per band
    * crosses the exchange. */
  private def minhashSig(s: SparkSession, dir: String): DataFrame =
    shingled(s, dir)
      .groupBy(col("doc_id"))
      .agg(min(md5(concat(lit("a|"), col("sh")))).as("mh_a"),
        min(md5(concat(lit("b|"), col("sh")))).as("mh_b"))

  /** Banded candidate pairs re-scored at exact token-set Jaccard —
    * (a, b, jaccard), a < b. Shared by q27 (the pair listing) and q40
    * (cluster representative selection over the pair graph).
    *
    * r8 rewrite (guide §2.3 "shuffle fewer bytes" / §2.4): a doc's
    * DISTINCT token set is a per-row `array_distinct` — no (doc, token)
    * explode, no global distinct shuffle. |A ∩ B| for a candidate pair is
    * `size(array_intersect)` computed after joining the (small) candidate
    * list against the per-doc token sets, so the exploded token table
    * never crosses an exchange (previous shape: distinct over every
    * (doc, token) pair + two wide joins + a groupBy — 5 exchanges carrying
    * token rows). Integer intersection/size arithmetic is unchanged, so
    * the jaccard doubles are bit-identical. */
  private def minhashJaccard(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSig(s, dir)
    val cands = sig.as("x").join(sig.as("y"),
        col("x.mh_a") === col("y.mh_a") && col("x.mh_b") === col("y.mh_b") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val toksets = t(s, dir, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts"))
    cands
      .join(toksets.select(col("doc_id").as("a"), col("ts").as("ta")), Seq("a"))
      .join(toksets.select(col("doc_id").as("b"), col("ts").as("tb")), Seq("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
        size(col("ta")).cast("long").as("sza"),
        size(col("tb")).cast("long").as("szb"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter"))).as("jaccard"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on content hash, keep min doc_id.
    "q25_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy(col("keep_id"))
    }),

    // MinHash signatures (shingle → minhash; band key = both mins).
    "q26_minhash_sig" -> ((s, dir) =>
      minhashSig(s, dir).orderBy(col("doc_id"))),

    // MinHash-banded candidate pairs + exact n-gram Jaccard re-score:
    // docs sharing BOTH minhash bands are candidates; Jaccard over
    // distinct token sets via a blocked join (no cross product).
    "q27_minhash_jaccard" -> ((s, dir) =>
      minhashJaccard(s, dir).orderBy(col("a"), col("b"))),

    // Duplicate-CLUSTER representative selection — the step after pair
    // generation in a production dedup: connected components over the
    // jaccard ≥ 0.8 pair graph (reusing the KG engine's large-star/
    // small-star CC, size-adaptive), representative = lexicographic min
    // of the component (ids compared AS STRINGS — the same ordering the
    // recursive-CTE oracle uses). Every doc gets an assignment; keeping
    // rows where doc_id-as-string == rep is the dedup'd corpus.
    "q40_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      val pairs = minhashJaccard(s, dir).filter(col("jaccard") >= 0.8)
      val aliases = pairs.select(col("a").cast("string").as("a"),
        col("b").cast("string").as("b"), col("jaccard").as("score"))
        .as[graft.kg.AliasPair]
      val cc = graft.kg.stages.Canonicalize.connectedComponents(aliases).toDF()
      t(s, dir, "documents").select(col("doc_id"))
        .join(cc.select(col("name").as("docstr"), col("canonicalName")),
          col("doc_id").cast("string") === col("docstr"), "left")
        .select(col("doc_id"),
          coalesce(col("canonicalName"), col("doc_id").cast("string")).as("rep"))
        .orderBy(col("doc_id"))
    }),

    // SimHash (32-bit, md5-derived → engine-portable): per token take the
    // first 8 md5 hex chars as an unsigned 32-bit value; per bit j the doc
    // accumulates +1/-1; simhash bit j = sign. Exact integer arithmetic.
    "q28_simhash" -> ((s, dir) => {
      val bits = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"),
          conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
        .select(col("doc_id"), col("h"), explode(expr("sequence(0, 31)")).as("j"))
        .select(col("doc_id"), col("j"),
          expr("(shiftrightunsigned(h, CAST(j AS INT)) & 1) * 2 - 1").as("contrib"))
      bits.groupBy(col("doc_id"), col("j"))
        .agg(sum(col("contrib")).as("acc"))
        .select(col("doc_id"),
          expr("CASE WHEN acc > 0 THEN shiftleft(1L, CAST(j AS INT)) ELSE 0L END")
            .as("bitval"))
        .groupBy(col("doc_id")).agg(sum(col("bitval")).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // Embedding-cosine near-dup pairs over the embeddings table
    // (brute within-block; at this dim/scale a full pairwise is the
    // baseline — the LSH-bucketed scale path is q31). Cosine is the
    // native Catalyst expression [[graft.functions.CosineSimilarity]]
    // (codegen'd loop, no per-pair array allocation; same sequential
    // summation order as DuckDB's list_dot_product).
    "q29_embed_cosine_dup" -> ((s, dir) => {
      import graft.functions.VectorFunctions.cosine_sim
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      // single-file parquet = ONE input partition; the nested-loop join
      // inherits it and runs all O(n²) pairs on one core — spread the
      // stream side across the cluster first (the broadcast side stays)
      val x = e.repartition(s.sparkContext.defaultParallelism)
      x.as("x").join(broadcast(e).as("y"), col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          cosine_sim(col("x.v"), col("y.v")).as("cos"))
        .filter(col("cos") >= 0.5)
        .select(col("a"), col("b"), round(col("cos"), 5).as("cos_r"))
        .orderBy(col("a"), col("b"))
    }))

  def oracles: Map[String, String] = Map(
    "q25_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY keep_id""",
    "q26_minhash_sig" ->
      """SELECT doc_id,
         min(md5('a|' || sh)) AS mh_a, min(md5('b|' || sh)) AS mh_b
         FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i+1])) AS sh
               FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
               WHERE len(toks) >= 2)
         GROUP BY 1 ORDER BY doc_id""",
    "q27_minhash_jaccard" ->
      """WITH sig AS (
           SELECT doc_id, min(md5('a|' || sh)) AS mh_a, min(md5('b|' || sh)) AS mh_b
           FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS sh
                 FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
                 WHERE len(toks) >= 2)
           GROUP BY 1),
         cands AS (
           SELECT x.doc_id AS a, y.doc_id AS b FROM sig x JOIN sig y
           ON x.mh_a = y.mh_a AND x.mh_b = y.mh_b AND x.doc_id < y.doc_id),
         toks AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
         inter AS (
           SELECT c.a, c.b, count(*) AS inter FROM cands c
           JOIN toks ta ON ta.doc_id = c.a
           JOIN toks tb ON tb.doc_id = c.b AND tb.tok = ta.tok
           GROUP BY 1, 2)
         SELECT c.a, c.b,
           CAST(coalesce(i.inter, 0) AS DOUBLE) /
             (sa.sz + sb.sz - coalesce(i.inter, 0)) AS jaccard
         FROM cands c
         LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
         JOIN sizes sa ON sa.doc_id = c.a
         JOIN sizes sb ON sb.doc_id = c.b
         ORDER BY 1, 2""",
    // transitive closure by recursive CTE over the symmetrized jaccard
    // ≥ 0.8 pair graph; representative = least(self, min reachable) —
    // ids compared AS VARCHAR, matching the engine's string-keyed CC
    "q40_dedup_clusters" ->
      """WITH RECURSIVE sig AS (
           SELECT doc_id, min(md5('a|' || sh)) AS mh_a, min(md5('b|' || sh)) AS mh_b
           FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS sh
                 FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
                 WHERE len(toks) >= 2)
           GROUP BY 1),
         cands AS (
           SELECT x.doc_id AS a, y.doc_id AS b FROM sig x JOIN sig y
           ON x.mh_a = y.mh_a AND x.mh_b = y.mh_b AND x.doc_id < y.doc_id),
         toks AS (
           SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
         inter AS (
           SELECT c.a, c.b, count(*) AS inter FROM cands c
           JOIN toks ta ON ta.doc_id = c.a
           JOIN toks tb ON tb.doc_id = c.b AND tb.tok = ta.tok
           GROUP BY 1, 2),
         dup AS (
           SELECT CAST(c.a AS VARCHAR) AS a, CAST(c.b AS VARCHAR) AS b
           FROM cands c
           LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
           JOIN sizes sa ON sa.doc_id = c.a
           JOIN sizes sb ON sb.doc_id = c.b
           WHERE CAST(coalesce(i.inter, 0) AS DOUBLE) /
                 (sa.sz + sb.sz - coalesce(i.inter, 0)) >= 0.8),
         e AS (SELECT a, b FROM dup UNION SELECT b, a FROM dup),
         reach(a, b) AS (
           SELECT a, b FROM e
           UNION
           SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
         rep AS (SELECT a AS d, least(a, min(b)) AS rep FROM reach GROUP BY a)
         SELECT doc.doc_id, coalesce(rep.rep, CAST(doc.doc_id AS VARCHAR)) AS rep
         FROM documents doc
         LEFT JOIN rep ON CAST(doc.doc_id AS VARCHAR) = rep.d
         ORDER BY doc.doc_id""",
    "q28_simhash" ->
      """WITH h AS (
           SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
         bits AS (
           SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS acc
           FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS j)
           GROUP BY 1, 2)
         SELECT doc_id,
           CAST(sum(CASE WHEN acc > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
         FROM bits GROUP BY 1 ORDER BY doc_id""",
    "q29_embed_cosine_dup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         SELECT x.vec_id AS a, y.vec_id AS b,
           round(list_dot_product(x.v, y.v) /
             (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 5)
             AS cos_r
         FROM e x JOIN e y ON x.vec_id < y.vec_id
         WHERE list_dot_product(x.v, y.v) /
             (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) >= 0.5
         ORDER BY a, b""")
}
