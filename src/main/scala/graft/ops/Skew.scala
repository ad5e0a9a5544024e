package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (north rule: mega-repos, hub entities).
  *
  * Three layers of defense, used across the engine:
  *  1. `repartitionByRange(repo, path)` on ingest — co-locates a repo's
  *     files while RANGE-splitting mega-repos across partitions (a hash
  *     partition on repo would put a 10×-sized repo on one task).
  *  2. AQE skew-join splitting — enabled in every session builder
  *     (`spark.sql.adaptive.skewJoin.enabled` defaults on with AQE).
  *  3. Explicit salting for hot keys in shuffle joins where the build
  *     side is replicable — [[saltedEquiJoin]] below: the probe side gets
  *     `salt = pmod(hash(row-unique), S)`, the build side is exploded
  *     ×S, and the join key becomes (key, salt), spreading a hub key
  *     over S reducers.
  */
object Skew {

  /** Equi-join `left` (large, possibly hub-skewed keys) with `right`
    * (small enough to replicate ×`salt` but too big / unwanted to
    * broadcast) on `key`, spreading each key over `salt` partitions.
    * Inner join semantics; result equals `left.join(right, key)`. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Range-repartition an Iceberg-shaped corpus on (repo, path) —
    * defense 1 above. `partitions` defaults to 4× parallelism so AQE
    * can coalesce but mega-repos still split. */
  def rangePartitionCorpus(df: DataFrame, partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism * 4
    df.repartitionByRange(n, col("repo"), col("path"))
  }
}
