package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of operator-level queries (SURVEY.md §2 inventory) and their
  * DuckDB oracle SQL. Split out of SparkEntry so query families can live
  * in focused files. */
object Queries {

  def all: Map[String, (SparkSession, String) => DataFrame] =
    Map("kg_edges" -> ((s: SparkSession, dir: String) => {
      new graft.kg.pipeline.Pipeline(graft.kg.GraftConfig(linkMode = "exact"))
        .run(SparkEntry.syntheticCorpus(s, dir)).edges.toDF()
        .orderBy("subj", "pred", "obj")
    }))

  def oracles: Map[String, String] = Map()
}
