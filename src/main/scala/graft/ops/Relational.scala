package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator checks (SURVEY.md §2.6-§2.10) over the driver's
  * TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Float determinism rules (oracle hash-compares values): multi-row
  * floating sums are made exact by scaling 2-decimal money to integer
  * cents before summing; single-pass arithmetic (division, weighted sum)
  * is bit-identical across engines and left unrounded. Every query has a
  * total ORDER BY so row order is deterministic in both engines.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A5-style grouped aggregation (TPC-H Q1 shape). Exact: quantities
    // are whole-valued doubles; money summed as integer cents.
    "q01_groupagg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // C3 chunk chaining as lead/lag windows (ingest.py:162-177 analogue).
    "q02_window_chain" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          coalesce(lag(col("o_orderkey"), 1).over(w), lit(-1L)).as("prev_key"),
          coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Context expansion ±2 as a range self-join (retrieval.py:373-467
    // N+1 hop loop → one join; SURVEY.md §2.10).
    "q03_context_range_join" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val r = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rn"))
      val a = r.as("a"); val b = r.as("b")
      a.join(b, col("a.o_custkey") === col("b.o_custkey") &&
          abs(col("a.rn") - col("b.rn")) <= 2)
        .groupBy(col("a.o_custkey").as("o_custkey"),
          col("a.o_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("ctx_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // O1-O3 global top-k (TakeOrderedAndProject physical op).
    "q04_topk_global" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // O5/O6 top-k per group via row_number window.
    "q05_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy(col("c_nationkey"), col("rk"))
    }),

    // A3 min-max normalization with the all-equal → 1.0 rule
    // (retrieval.py:550-569).
    "q06_minmax_norm" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          min(col("c_acctbal")).over(w).as("mn"),
          max(col("c_acctbal")).over(w).as("mx"),
          col("c_acctbal"))
        .select(col("c_custkey"), col("c_mktsegment"),
          when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("c_acctbal") - col("mn")) / (col("mx") - col("mn")))
            .as("norm_bal"))
        .orderBy(col("c_custkey"))
    }),

    // A4 weighted hybrid merge: full-outer on key, missing side 0.0,
    // 0.5*vec + 0.5*graph (retrieval.py:574-601).
    "q07_hybrid_merge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val v = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey")).agg(count(lit(1)).cast("double").as("score_v"))
      val g = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey")).agg(max(col("o_totalprice")).as("score_g"))
      v.join(g, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("score_v"), lit(0.0)) * 0.5 +
            coalesce(col("score_g"), lit(0.0)) * 0.5).as("hybrid"))
        .orderBy(col("o_custkey"))
    }),

    // J5 exists semi-join (retrieval.py:336-341).
    "q08_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // NOT EXISTS anti-join.
    "q09_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J2 exact lowercase-match equi-join (triplets.py:316-343 analogue);
    // nation is a broadcast dim.
    "q10_exact_match_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), lower(col("n_name")).as("nation_name"))
        .orderBy(col("c_custkey"))
    }),

    // U4 MERGE-idempotence dedup on a composite key.
    "q11_dedup_merge" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .dropDuplicates("l_orderkey", "l_partkey", "l_suppkey")
        .orderBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    }),

    // Per-group top-k via the custom bounded-heap TypedImperativeAggregate
    // (graft.functions.TopKByScore) — O(k) task state instead of a window
    // sort; result equals the row_number formulation (the oracle).
    "q34_topk_aggregate" -> ((s, dir) => {
      import graft.functions.TopKByScore.topk_by_score
      t(s, dir, "customer")
        .select(col("c_nationkey"),
          col("c_acctbal"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("cust"))
        .groupBy(col("c_nationkey"))
        .agg(topk_by_score(col("c_acctbal"), col("cust"), 3).as("t"))
        .select(col("c_nationkey"), posexplode(col("t")).as(Seq("pos", "r")))
        .select(col("c_nationkey"), (col("pos") + 1).as("rk"),
          col("r.score").as("c_acctbal"), col("r.payload").as("cust"))
        .orderBy(col("c_nationkey"), col("rk"))
    }),

    // A2/U1 union + max-score dedup (retrieval.py:347-361).
    "q12_union_max_dedup" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey")).agg(count(lit(1)).cast("double").as("score"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).cast("double").as("score"))
      a.unionByName(b)
        .groupBy(col("o_custkey")).agg(max(col("score")).as("score"))
        .orderBy(col("o_custkey"))
    }))

  def oracles: Map[String, String] = Map(
    "q01_groupagg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
         count(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_window_chain" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS od,
         coalesce(lag(o_orderkey) OVER w, -1) AS prev_key,
         coalesce(lead(o_orderkey) OVER w, -1) AS next_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q03_context_range_join" ->
      """WITH r AS (
           SELECT o_custkey, o_orderkey,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS rn
           FROM orders)
         SELECT a.o_custkey, a.o_orderkey, count(*) AS ctx_n
         FROM r a JOIN r b
           ON a.o_custkey = b.o_custkey AND abs(a.rn - b.rn) <= 2
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q04_topk_global" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q05_topk_per_group" ->
      """SELECT * FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
                  row_number() OVER (PARTITION BY c_nationkey
                                     ORDER BY c_acctbal DESC, c_custkey) AS rk
           FROM customer) WHERE rk <= 3 ORDER BY c_nationkey, rk""",
    "q06_minmax_norm" ->
      """SELECT c_custkey, c_mktsegment,
         CASE WHEN mx = mn THEN 1.0
              ELSE (c_acctbal - mn) / (mx - mn) END AS norm_bal
         FROM (SELECT c_custkey, c_mktsegment, c_acctbal,
                      min(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
                      max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
               FROM customer)
         ORDER BY c_custkey""",
    "q07_hybrid_merge" ->
      """WITH v AS (SELECT o_custkey, CAST(count(*) AS DOUBLE) AS score_v
                    FROM orders WHERE o_orderstatus = 'O' GROUP BY 1),
              g AS (SELECT o_custkey, max(o_totalprice) AS score_g
                    FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
         SELECT coalesce(v.o_custkey, g.o_custkey) AS o_custkey,
                coalesce(score_v, 0.0) * 0.5 + coalesce(score_g, 0.0) * 0.5 AS hybrid
         FROM v FULL OUTER JOIN g ON v.o_custkey = g.o_custkey
         ORDER BY o_custkey""",
    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q10_exact_match_join" ->
      """SELECT c_custkey, lower(n_name) AS nation_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_custkey""",
    "q11_dedup_merge" ->
      """SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem
         ORDER BY 1, 2, 3""",
    "q34_topk_aggregate" ->
      """SELECT c_nationkey, rk, c_acctbal, cust FROM (
           SELECT c_nationkey, c_acctbal,
                  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS cust,
                  row_number() OVER (PARTITION BY c_nationkey
                    ORDER BY c_acctbal DESC,
                             lpad(CAST(c_custkey AS VARCHAR), 10, '0')) AS rk
           FROM customer)
         WHERE rk <= 3 ORDER BY c_nationkey, rk""",
    "q12_union_max_dedup" ->
      """WITH u AS (
           SELECT o_custkey, CAST(count(*) AS DOUBLE) AS score FROM orders
           WHERE o_orderstatus = 'O' GROUP BY 1
           UNION ALL
           SELECT o_custkey, CAST(count(*) AS DOUBLE) AS score FROM orders
           WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
         SELECT o_custkey, max(score) AS score FROM u
         GROUP BY 1 ORDER BY 1""")
}
